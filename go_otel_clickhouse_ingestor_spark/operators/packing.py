"""Sequence packing — batching documents into fixed token-budget bins
for LLM training.

The reference (a pure OTel→ClickHouse ingestor, cmd/root.go +
internal/ingestion) has no notion of this; it's a north-star
training-pipeline extension (BASELINE.json): after curation, documents
must be grouped into ~context-window-sized bins so the trainer reads
fixed-cost batches.

Two production-honest properties drive the design:

- **Contiguous-fill packing, not bin packing.**  Optimal bin packing is
  NP-hard and inherently sequential; the streaming-friendly industry
  shape is: shard the corpus, order each shard deterministically, and
  cut bins wherever the running token total crosses the budget.  A
  document may straddle a boundary (its bin is where it STARTS), so a
  bin can overflow by at most one document — the trainer either truncates
  or wraps, both standard.  This keeps the whole operator one window
  over a pre-shuffled shard: no driver loop, no iterative state.
- **Per-shard windows, not a global window.**  The running sum is
  partitioned by ``source`` (the natural corpus shard), so at 100 TB
  each shard's cumsum runs inside its own task tree — the same shape as
  ``pipeline_budget_sharded``, never the single-partition global window.

Fully SQL-expressible, so the DuckDB oracle checks exact bin
assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table
from .text import tokens

#: Token budget per packed training sequence (context-window sized).
SEQ_BUDGET = 2048


@query(
    "pack_sequences_bins",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> ''))::BIGINT AS n_tokens
      FROM documents
    ),
    runs AS (
      SELECT source, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM toks
    )
    SELECT source, doc_id, n_tokens,
           (cum_before // {SEQ_BUDGET})::BIGINT AS bin,
           cum_before::BIGINT AS bin_offset_base
    FROM runs
    """,
)
def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to a training bin: per-source running token
    total, bin = which SEQ_BUDGET stripe the document STARTS in.

    One shuffle (the window's hash partitioning on ``source``), then a
    per-shard sort + running sum — all JVM codegen.  ``bin_offset_base``
    (the running total before this doc) is emitted so a downstream
    writer can compute intra-bin offsets without re-running the window."""
    d = table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(cum_before / SEQ_BUDGET).cast("long").alias("bin"),
        cum_before.cast("long").alias("bin_offset_base"),
    )
