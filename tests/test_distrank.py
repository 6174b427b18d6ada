"""Unit tests for ``operators.distrank.two_phase_row_number`` — the
shared two-phase distributed rank that replaced the engine's three
single-reducer windows.

Each equivalence test checks the two-phase result bit-for-bit against
the monolithic ``row_number()`` window it replaces, over data crafted
to exercise the parts that can go wrong: ties spanning bucket
boundaries, skewed key mass, multiple groups, and both bucketing paths
(caller-supplied monotone expression AND the sampled-quantile
Bucketizer default, which previously shipped with zero coverage).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_otel_clickhouse_ingestor_spark.operators.distrank import (
    two_phase_row_number,
)
from pyspark.sql.window import Window


def _reference_rank(df, part_cols, order_cols, out_col):
    w = (
        Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
    ).orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w).cast("long"))


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_explicit_bucket_matches_window(spark):
    # Skewed counts + a tie plateau (x=1 for half the keys) spanning
    # several buckets of the caller-supplied monotone expression.
    data = [(k % 3, k, 1 if k < 50 else k) for k in range(100)]
    df = spark.createDataFrame(data, "g int, k long, x long")
    bucket = F.col("x") * 8 + (F.col("k") % 8)  # monotone in (x, k)? no —
    # (k % 8) is NOT monotone in k; use an equal-width range instead.
    bucket = F.col("x") * 8 + (F.col("k") / F.lit(13)).cast("long")
    got = two_phase_row_number(df, ["g"], ["x", "k"], "rk", bucket=bucket)
    want = _reference_rank(df, ["g"], ["x", "k"], "rk")
    assert _rows(got, ["g", "k", "rk"]) == _rows(want, ["g", "k", "rk"])


def test_explicit_bucket_no_partition(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "k long, x long"
    )
    bucket = F.col("x")  # coarse: whole tie-groups share one bucket
    got = two_phase_row_number(df, [], ["x", "k"], "rk", bucket=bucket)
    want = _reference_rank(df, [], ["x", "k"], "rk")
    assert _rows(got, ["k", "rk"]) == _rows(want, ["k", "rk"])


def test_quantile_bucket_matches_window(spark):
    # Default path: sampled-quantile Bucketizer on the first order col.
    # Heavy value skew (80% of rows share x=5) so quantile splits
    # collapse — dedup of splits must keep the Bucketizer legal and the
    # result must still match the plain window exactly.
    data = [(i, 5 if i % 5 else i % 40) for i in range(500)]
    df = spark.createDataFrame(data, "k long, x long")
    got = two_phase_row_number(df, [], ["x", "k"], "rk", n_buckets=16)
    want = _reference_rank(df, [], ["x", "k"], "rk")
    assert _rows(got, ["k", "rk"]) == _rows(want, ["k", "rk"])


def test_quantile_bucket_grouped(spark):
    data = [(i % 4, i, float(i % 11)) for i in range(300)]
    df = spark.createDataFrame(data, "g int, k long, x double")
    got = two_phase_row_number(df, ["g"], ["x", "k"], "rk", n_buckets=8)
    want = _reference_rank(df, ["g"], ["x", "k"], "rk")
    assert _rows(got, ["g", "k", "rk"]) == _rows(want, ["g", "k", "rk"])


def test_null_bucket_raises_not_drops(spark):
    # A NULL from the caller's bucket expression must raise loudly —
    # the inner offset join would otherwise silently lose the row.
    df = spark.createDataFrame(
        [(1, 1), (2, None)], "k long, x long"
    )
    bucket = F.col("x")  # NULL for k=2
    out = two_phase_row_number(df, [], ["x", "k"], "rk", bucket=bucket)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NULL bucket" in str(ei.value)


def test_quantile_path_null_key_raises(spark):
    # Bucketizer runs with handleInvalid="error": a NULL order key on
    # the default path is a precondition violation, not a silent
    # last-bucket assignment (Spark windows order NULLS FIRST, so a
    # keep-bucket would skew every subsequent rank).
    df = spark.createDataFrame([(1, 1.0), (2, None)], "k long, x double")
    out = two_phase_row_number(df, [], ["x", "k"], "rk", n_buckets=4)
    with pytest.raises(Exception):
        out.collect()
