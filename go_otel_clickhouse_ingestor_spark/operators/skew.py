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
