"""Window functions: ranking, analytic, row/range frames.

The headline query, ``win_rank_latest_per_key``, is the windowed form
of the reference's ReplacingMergeTree latest-row-wins contract (A16 —
README.md:121, version columns ``_lsn``/``_ts`` in
``internal/model/cdc.go:33-41``): row_number over (key ORDER BY version
DESC) = 1.

Scale note: a window over PARTITION BY k costs one shuffle on k plus a
per-partition sort.  Skewed keys are the risk at 100 TB — prefer the
max_by aggregate form (relational.agg_argmax_latest) when only the
top-1 row is needed; the full window form is for when every row needs
its rank/frame value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table


@query(
    "win_rank_latest_per_key",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts)::BIGINT AS ts_us, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def win_rank_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — A16's latest-per-key as a ranked window
    (row_number over version DESC, tie-broken on event_id = 1)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
    )


@query(
    "win_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile of customers by balance within nation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value_seen,
           last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user ordered by event time.  Frames for
    first/last are written explicitly (ROWS UNBOUNDED PRECEDING..CURRENT
    ROW) so both engines agree — default frames for last_value are a
    classic cross-engine trap."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_value_seen"),
        F.last("value").over(wf).alias("running_last"),
    )


@query(
    "win_frame_rows",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_sum3
    FROM events
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving sum/avg over a ROWS frame (2 preceding .. current)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.avg("value").over(w), 6).alias("moving_avg3"),
        F.round(F.sum("value").over(w), 4).alias("moving_sum3"),
    )


@query(
    "win_frame_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: 30-day trailing spend per customer.
    Ordered on epoch seconds (a numeric) so the range frame is portable
    across engines; 2592000 s = 30 days."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )
