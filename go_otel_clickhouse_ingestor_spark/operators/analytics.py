"""Event-funnel and cohort analytics — the queries the reference's
sink tables exist to serve (README.md "events analytics"; the events
table mirrors A2's generated stream landed by A11's sink).

Both queries are pure relational compositions (filtered aggregations +
joins on user_id), so they inherit the engine's scale properties:
partial+final aggs, broadcastable intermediate results, no windows
without partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-stage ordered funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first click.  Each
    stage is a filtered min-agg on user_id joined to the previous
    stage — the ordering constraint rides the join predicate, so the
    whole funnel is three partial+final aggs sharing one shuffle key,
    no per-user event sorting or windowing."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT epoch_us(c.cohort_week)::BIGINT AS cohort_week_us,
           date_diff('week', c.cohort_week, date_trunc('week', e.ts))::BIGINT AS offset_weeks,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted distinct in each subsequent activity week.  The cohort
    table is users-sized (≪ events) so its join back to events
    broadcasts; the matrix is (weeks × weeks) — tiny at any SF."""
    ev = table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            (
                F.floor(
                    F.datediff(
                        F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                    )
                    / 7
                )
            ).cast("long").alias("offset_weeks"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )
