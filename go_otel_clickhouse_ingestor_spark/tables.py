"""Parquet table catalog over the driver fixtures (TESTDATA.md).

All batch operators take ``(spark, sf_dir)`` and read these tables.
Reads are plain ``spark.read.parquet`` so Catalyst owns predicate
pushdown, column pruning, and partition coalescing; no caching here —
each query stays a pure, independently-optimizable plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every fixture table the driver generates (TESTDATA.md / FIXTURES.md §A).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table as a DataFrame.

    ``events.ts`` has shipped as two physical types across fixture
    generations: nanosecond parquet timestamps (unrepresentable in
    Spark — read as raw nanos via ``nanosAsLong`` and floor-divided to
    µs) and plain ``timestamp[us]`` (read as TIMESTAMP_NTZ).  We sniff
    the decoded type and normalize both to a µs TimestampType; the
    session timezone is pinned to UTC (session.py), so the NTZ→LTZ cast
    is face-value identity.  Queries that *output* event time expose
    ``unix_micros(ts)`` (BIGINT) so the DuckDB oracle (``epoch_us(ts)``)
    sees bit-identical values despite the engines' native precisions.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "bigint"):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
