"""Skew mitigation patterns, demonstrated as oracle-checked queries.

At 100 TB the failure mode of a shuffled join/agg is a hot key: one
partition gets the whale key's rows and the stage runs at the speed of
that one task.  Two standing mitigations exist in this engine:

1. AQE skew-join splitting, enabled session-wide
   (``session.py`` — ``spark.sql.adaptive.skewJoin.enabled``), which
   splits oversized partitions at runtime; and
2. explicit **salting**, shown here, for when the skew is known ahead
   of time or the join type defeats AQE (e.g. bucketed sides).

The salted join's RESULT is identical to the plain join — only the
physical key distribution changes — so the plain join is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

#: Salt fan-out: each dimension row is replicated SALT ways; each fact
#: row picks one replica.  Hot fact keys spread across SALT partitions.
SALT = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)             AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join: the dimension side is exploded ``SALT``
    ways with a salt column, each fact row deterministically picks one
    replica (hash of its unique id), and the join key becomes
    (user_id, salt) — a whale user's events now land in up to SALT
    partitions instead of one.

    Trade-off being demonstrated: the dim side grows SALT×, so this is
    for skewed-fact⋈small-dim shapes; for dim tables small enough to
    broadcast, ``broadcast()`` (join_broadcast) dominates and salting
    is unnecessary.  Result is provably identical to the unsalted join
    (the oracle runs the plain form)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    salted_fact = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
    )
    return (
        salted_fact.join(
            salted_dim,
            (salted_fact.user_id == salted_dim.c_custkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT c.c_nationkey,
           count(*)                                                AS n_events,
           cast(round(sum(cast(e.value AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_nationkey
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime key pre-filter (the manual form of Spark's runtime
    Bloom-filter join, SPARK-32268): before the shuffle join, the
    filtered dim's DISTINCT join keys are broadcast and applied to the
    fact as a left-semi probe — fact rows that cannot match never enter
    the shuffle.  With a selective dim predicate (one mktsegment ≈ 20%
    here; a tenant or date slice in production) the shuffle moves 5×
    fewer fact bytes in exchange for one map-side hash probe.

    The pattern matters at 100 TB when the dim is too WIDE to broadcast
    whole (the real join still shuffles both sides) but its filtered
    KEY SET is tiny; when keys outgrow an exact broadcast, swap the
    semi probe for an actual Bloom filter (might-contain, false
    positives re-checked by the join itself — correctness never depends
    on the filter).  Result is provably identical to the plain join
    (the oracle runs the unfiltered form)."""
    ev = table(spark, sf_dir, "events").select("user_id", "value")
    dim = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    dim_f = dim.filter(F.col("c_mktsegment") == "BUILDING")
    keys = dim_f.select("c_custkey").distinct()
    pruned = ev.join(
        F.broadcast(keys), ev.user_id == keys.c_custkey, "left_semi"
    )
    return (
        pruned.join(dim_f, pruned.user_id == dim_f.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "cast(round(sum(cast(value as decimal(14,4))), 2) as double)"
            ).alias("total_value"),
        )
    )


@query(
    "agg_skew_two_phase",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)                          AS n_users,
           count(*)                                         AS n_events,
           cast(round(sum(cast(value AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot GROUP BY keys: phase 1
    aggregates on (key, salt) — the whale key's rows split across SALT
    reducers — phase 2 merges the SALT partials per key.  COUNT and SUM
    re-merge trivially; COUNT(DISTINCT user_id) is made mergeable by
    salting on ``hash(user_id)`` so each distinct user lands in exactly
    one salt bucket and the final count is a plain SUM of bucket
    distincts — the standard trick that also underlies Spark's own
    partial distinct Expand.  Result provably equals the direct
    aggregation (the oracle).  At 100 TB this is how a 'GROUP BY
    event_type' with 5 keys survives: without salting, five reducers
    do all the work; AQE can split skewed JOIN partitions but not a
    skewed agg key — this rewrite is the standing fix."""
    ev = table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn(
            "salt", F.pmod(F.xxhash64("user_id"), F.lit(SALT)).cast("int")
        )
        .groupBy("event_type", "salt")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,4)")).alias("v"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("u").alias("n_users"),
        F.sum("n").alias("n_events"),
        F.expr("cast(round(sum(v), 2) as double)").alias("total_value"),
    )
