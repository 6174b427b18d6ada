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

    ``events.ts`` is a nanosecond parquet timestamp, which Spark cannot
    represent (TimestampType is microsecond): we read it as raw nanos
    (``nanosAsLong``) and floor-divide to a µs TimestampType.  Queries
    that *output* event time expose ``unix_micros(ts)`` (BIGINT) so the
    DuckDB oracle (``epoch_us(ts)``) sees bit-identical values despite
    the engines' different native precisions.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
