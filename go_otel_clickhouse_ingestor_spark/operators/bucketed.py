"""Write-time bucketing: the co-located-join strategy for repeated
fact⋈fact joins at scale.

A customer⋈orders join normally shuffles BOTH sides on the key every
run.  Bucketing pays that shuffle ONCE at write time — both tables are
hash-bucketed (and sorted) by the join key into the same bucket count
— after which every join/aggregation on that key plans with ZERO
exchanges: each task reads matching bucket files from both sides.
This is the standing layout for a 100 TB warehouse's hot join keys;
``tests/test_plans.py`` asserts the exchange-free plan with broadcast
disabled.

The bucketed copies are materialized once per (catalog, sf_dir) into
an external-path table under ``/tmp`` (the fixture parquet itself is
read-only); first invocation pays the one-time write, later ones reuse
it — exactly the amortization bucketing gives in production.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

#: Bucket count — matches on both sides so the join is bucket-aligned.
N_BUCKETS = 8


def _bucketed_table(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Get-or-create the bucketed copy of a fixture table."""
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"bkt_{name}_{suffix}"
    if spark.catalog.tableExists(tbl):
        # The catalog entry can outlive or diverge from the tmp files
        # (DROP TABLE keeps external paths; a partially deleted dir
        # still returns rows).  A .first() probe misses that, so
        # validate the full row count against the source — for parquet
        # this is a footer-metadata scan, cheap even at warehouse
        # scale relative to the rebuild it guards.
        try:
            if spark.table(tbl).count() == table(spark, sf_dir, name).count():
                return spark.table(tbl)
        except Exception:
            pass
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        table(spark, sf_dir, name)
        .write.mode("overwrite")
        .option("path", f"/tmp/spark_graft_bucketed/{tbl}")
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .saveAsTable(tbl)
    )
    return spark.table(tbl)


@query(
    "join_bucketed",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey)        AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-aligned customer⋈orders join + aggregation on the bucket
    key.  Both scans deliver the join distribution directly from the
    file layout, and the post-join data is already distributed by
    c_custkey, so the groupBy adds no exchange either — the whole plan
    runs shuffle-free (asserted by the plan tests with broadcast
    disabled).  Results are layout-independent: the plain join is the
    oracle."""
    c = _bucketed_table(spark, sf_dir, "customer", "c_custkey").select("c_custkey")
    o = _bucketed_table(spark, sf_dir, "orders", "o_custkey").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )
