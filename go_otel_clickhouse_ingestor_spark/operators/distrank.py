"""Two-phase distributed rank — ``row_number()`` without the funnel.

``row_number() OVER (PARTITION BY g ORDER BY k)`` is the classic Spark
scale trap: the window moves EVERY row of a group through ONE task, so
an unpartitioned (or coarsely partitioned) rank caps throughput at a
single core no matter how many executors exist.  Three registered
queries carried that shape (``pipeline_epoch_shuffle``,
``events_gini_concentration``, ``events_decile_migration``); this
module is the shared fix.

The standard two-phase construction (the same idea as Spark's own
range-partitioned sort, reused for rank):

1. **Bucket** every row by a deterministic integer that is MONOTONE
   non-decreasing in the order key — either a caller-supplied
   expression (e.g. a hex-prefix of an md5 sort key, already uniform)
   or sampled ``approxQuantile`` boundaries on the leading order
   column applied via a broadcast ``Bucketizer`` (rank-based, so value
   skew cannot collapse buckets; the ``write_zordered`` recipe).
2. **Count** rows per (group, bucket) — a tiny frame, |groups|×B rows.
3. **Prefix-offset** that tiny frame with an ordinary window
   (partition = group, order = bucket): offset(g, b) = rows of g in
   buckets < b.  The window runs over B rows per group, not N.
4. **Local rank + offset**: ``row_number`` partitioned by
   (group, bucket) — max window-partition size ≈ N/B — plus the
   broadcast-joined offset.

Output is bit-identical to the single-window form for any total order
(ties within the order key resolve inside one bucket, exactly as the
monolithic window would resolve them).  Cost: one extra tiny agg + one
broadcast join; the big side shuffles ONCE, on (group, bucket), in
partitions of ~N/B rows instead of N/|groups|.

At 100 TB: pass ``n_buckets`` ≈ total cores (or leave the default of
``spark.sql.shuffle.partitions``); driver state stays at B-1 doubles
per quantile sketch and |groups|×B offset rows — both trivially
broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["two_phase_row_number"]

_BUCKET = "__tpr_bucket"
_OFFSET = "__tpr_offset"


def _quantile_bucket(
    df: DataFrame, order_col: str, n_buckets: int
) -> tuple[DataFrame, str]:
    """Attach a bucket id from sampled quantile boundaries of
    ``order_col`` (cast to double).  Rank-based bucketing: skewed
    values cannot collapse more than their own mass into one bucket.
    Rows with equal ``order_col`` always land in the same bucket
    (Bucketizer splits are half-open), preserving monotonicity.
    NULL/NaN keys violate the total-order precondition and raise
    (``handleInvalid="error"``) — a "keep" bucket would sort them
    LAST while Spark's window orders NULLS FIRST, silently skewing
    every rank after the first null."""
    from pyspark.ml.feature import Bucketizer

    tmp = df.withColumn("__tpr_key", F.col(order_col).cast("double"))
    qs = tmp.stat.approxQuantile(
        "__tpr_key",
        [i / n_buckets for i in range(1, n_buckets)],
        1.0 / (4 * n_buckets),
    )
    splits = [float("-inf"), *sorted(set(qs)), float("inf")]
    if len(splits) < 3:
        # empty input: approxQuantile returns [] and Bucketizer needs
        # >= 3 split points — a single constant bucket ranks the zero
        # rows correctly and keeps the plan valid
        return tmp.withColumn(_BUCKET, F.lit(0)).drop("__tpr_key"), _BUCKET
    buck = Bucketizer(
        splits=splits,
        inputCol="__tpr_key",
        outputCol="__tpr_q",
        handleInvalid="error",
    )
    out = (
        buck.transform(tmp)
        .withColumn(_BUCKET, F.col("__tpr_q").cast("int"))
        .drop("__tpr_key", "__tpr_q")
    )
    return out, _BUCKET


def two_phase_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    out_col: str,
    bucket: Column | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY part_cols ORDER BY
    order_cols)`` as ``out_col`` (LongType, 1-based), computed without
    any single-reducer window.

    ``bucket``: optional integer Column MONOTONE non-decreasing in the
    order-key tuple (e.g. a hex-prefix range of an md5 sort key).
    When omitted, buckets come from sampled quantiles of the FIRST
    order column, which must be numeric and non-null.  Order keys must
    be non-null either way (callers here rank counts / md5 hashes —
    both total).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))

    if bucket is not None:
        bucketed = df.withColumn(_BUCKET, bucket.cast("long"))
    else:
        bucketed, _ = _quantile_bucket(df, order_cols[0], n_buckets)

    # A NULL bucket would vanish through the inner offset join below —
    # a precondition violation (null order key / null bucket expr) must
    # raise, not silently drop rows.  The guard is fused into the bucket
    # value itself so column pruning can never elide it.
    bucketed = bucketed.withColumn(
        _BUCKET,
        F.when(
            F.col(_BUCKET).isNull(),
            F.raise_error(
                F.lit(
                    "two_phase_row_number: NULL bucket (order keys and any "
                    "caller-supplied bucket expression must be non-null)"
                )
            ).cast("long"),
        ).otherwise(F.col(_BUCKET)),
    )

    keys = [*part_cols, _BUCKET]
    counts = bucketed.groupBy(*keys).agg(F.count(F.lit(1)).alias("__tpr_n"))
    # bounded: the offsets window runs over the bucket-COUNT frame (one
    # row per bucket), never the data frame — bucket count is the
    # caller-fixed fan-out, not a data-growing domain.
    w_off = (
        Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
    ).orderBy(_BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        *keys,
        F.coalesce(F.sum("__tpr_n").over(w_off), F.lit(0)).alias(_OFFSET),
    )
    w_local = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        bucketed.join(F.broadcast(offsets), keys)
        .withColumn(
            out_col,
            (F.row_number().over(w_local) + F.col(_OFFSET)).cast("long"),
        )
        .drop(_BUCKET, _OFFSET)
    )
