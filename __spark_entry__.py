"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``go_otel_clickhouse_ingestor_spark/``;
this module only adapts its registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_otel_clickhouse_ingestor_spark import registry  # noqa: E402
from go_otel_clickhouse_ingestor_spark.session import apply_runtime_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shaped pricing-summary aggregation over lineitem — scan,
    filter (pushed to parquet), projection, partial+final hash agg.
    """
    apply_runtime_conf(spark)
    from go_otel_clickhouse_ingestor_spark.operators.relational import agg_groupby

    return agg_groupby(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin per query (omitted for rows-only ops)."""
    return registry.oracle_sql()
