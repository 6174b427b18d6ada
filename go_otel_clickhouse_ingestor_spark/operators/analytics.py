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


@query(
    "events_top_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_top_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user (the "what do users do next" sequence-mining primitive).
    One window shuffle partitioned by user_id (well-distributed keys),
    then a hash agg on the tiny type×type matrix; ordering ties break
    on event_id so the lag is deterministic."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_rolling_dau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    expanded AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY)) AS obs_day,
             user_id, day
      FROM du
    )
    SELECT epoch_us(obs_day)::BIGINT AS day_us,
           count(DISTINCT CASE WHEN day = obs_day THEN user_id END) AS dau,
           count(DISTINCT user_id) AS active_7d
    FROM expanded
    GROUP BY 1
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day distinct active users.  Rolling COUNT
    DISTINCT can't ride a window frame, and the naive day×activity
    range join is O(days × rows); instead each (day, user) pair
    explodes into the ≤7 observation days it contributes to — a
    bounded 7× map-side expansion followed by one distinct-agg shuffle,
    which is the formulation that survives a 1000-executor corpus."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    expanded = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("obs_day"),
        "user_id",
        "day",
    )
    return (
        expanded.groupBy(F.unix_micros("obs_day").alias("day_us"))
        .agg(
            F.count_distinct(
                F.when(F.col("day") == F.col("obs_day"), F.col("user_id"))
            ).cast("long").alias("dau"),
            F.count_distinct("user_id").cast("long").alias("active_7d"),
        )
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)             AS n_users,
           count(DISTINCT date_trunc('day', ts)) AS n_days,
           count(*)                            AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) over different columns in one
    aggregation — plans through Spark's Expand operator (each input row
    fans out once per distinct-column group, then two-level agg), the
    one-pass alternative to self-joining per distinct column."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count_distinct(F.date_trunc("day", F.col("ts"))).cast("long").alias(
            "n_days"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, value,
             count(*)                       OVER w AS n,
             cast(sum(cast(value AS DECIMAL(14,4)))          OVER w AS DOUBLE) AS s,
             cast(sum(cast(value AS DECIMAL(14,4))
                      * cast(value AS DECIMAL(14,4)))        OVER w AS DOUBLE) AS ss
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           round((value - (s / n))
                 / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12), 4) AS z,
           (abs((value - (s / n))
                / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12)) > 2.0) AS is_anomaly
    FROM f WHERE n >= 5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: each event's z-score against
    its user's trailing 21-event frame, flagged at |z| > 2 — the
    streaming-adjacent outlier primitive of a metrics pipeline (the
    batch twin of a stateful detector).  The frame's mean/std come from
    exact-DECIMAL windowed sums (count / Σx / Σx²): sliding-window
    float accumulation is engine-specific (subtract-on-evict vs rescan
    re-associate the additions), so the sufficient statistics must be
    exact before the one double-precision closed form.  The n >= 5
    guard drops cold-start frames where std is noise.  Scale: one
    shuffle on user_id, O(frame) state during the sorted scan."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, Window.currentRow)
    )
    dec = "cast(value as decimal(14,4))"
    f = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.expr(f"sum({dec})").over(w).cast("double").alias("s"),
        F.expr(f"sum({dec} * {dec})").over(w).cast("double").alias("ss"),
    )
    z = F.expr(
        "round((value - (s / n)) / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12), 4)"
    )
    flag = F.expr(
        "abs((value - (s / n)) / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12)) > 2.0"
    )
    return (
        f.filter(F.col("n") >= 5)
        .select("event_id", "user_id", z.alias("z"), flag.alias("is_anomaly"))
    )


@query(
    "events_pareto_users",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             cast(sum(cast(value AS DECIMAL(14,4))) AS DOUBLE) AS user_value
      FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, user_id, user_value,
             row_number() OVER w AS rk,
             cast(sum(cast(user_value AS DECIMAL(18,4))) OVER (
               PARTITION BY event_type ORDER BY user_value DESC, user_id
               ROWS UNBOUNDED PRECEDING) AS DOUBLE)           AS cum_value,
             cast(sum(cast(user_value AS DECIMAL(18,4))) OVER (
               PARTITION BY event_type) AS DOUBLE)            AS tot_value,
             count(*) OVER (PARTITION BY event_type)          AS n_users
      FROM per_user
      WINDOW w AS (PARTITION BY event_type ORDER BY user_value DESC, user_id)
    )
    SELECT event_type,
           min(rk)                      AS top_users_for_half,
           max(n_users)                 AS n_users,
           round(min(rk) / cast(max(n_users) AS DOUBLE), 4) AS user_fraction
    FROM ranked
    WHERE cum_value >= tot_value / 2
    GROUP BY event_type
    """,
)
def events_pareto_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: per event type, how few top users account
    for half the total value — the 80/20 diagnostic every usage
    pipeline reports.  Users rank per type (partitioned window, never
    global) with a deterministic value-then-id order; the running and
    total sums go through DECIMAL so cumulative float drift can't move
    the crossing row; the answer is min(rank) past the half-total
    line.  Scale: one agg shuffle to per-user rows, one window shuffle
    on event_type; output is O(event types)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.expr("cast(sum(cast(value as decimal(14,4))) as double)").alias(
            "user_value"
        )
    )
    order = [F.col("user_value").desc(), F.col("user_id").asc()]
    w = Window.partitionBy("event_type").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("event_type")
    dv = F.expr("cast(user_value as decimal(18,4))")
    ranked = per_user.select(
        "event_type",
        F.row_number().over(w).alias("rk"),
        F.sum(dv).over(wrun).cast("double").alias("cum_value"),
        F.sum(dv).over(wall).cast("double").alias("tot_value"),
        F.count(F.lit(1)).over(wall).alias("n_users"),
    )
    return (
        ranked.filter(F.col("cum_value") >= F.col("tot_value") / 2)
        .groupBy("event_type")
        .agg(
            F.min("rk").cast("long").alias("top_users_for_half"),
            F.max("n_users").alias("n_users"),
            F.round(
                F.min("rk") / F.max("n_users").cast("double"), 4
            ).alias("user_fraction"),
        )
    )
