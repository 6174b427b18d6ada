"""UDF surface (SURVEY §2.B): the three Python extension points the
engine supports, each demonstrated by an oracle-checked query.

- scalar ``pandas_udf``      — Arrow-batched vectorized scalar fn
- grouped-agg ``pandas_udf`` — UDAF over a group's column batches
- ``applyInPandas``          — grouped-map transform (full group in,
                               full group out)

The reference has no UDF framework (Go structs end to end); this is
the engine capability a training-data pipeline needs when a kernel
genuinely isn't expressible in built-ins.  Everything here that COULD
be a built-in expression deliberately stays a UDF — these queries
exist to differentially test the Python boundary itself (Arrow
round-trip, grouping semantics, null handling), with the equivalent
SQL as the oracle.

Scale notes: all three run Arrow-batched (10-100× over row-at-a-time
``udf``); scalar UDFs add zero shuffles, grouped forms shuffle once on
the group key like any aggregation.  The perf cliff vs JVM expressions
is real and documented — hot paths elsewhere in this repo never use
Python (enforced by tests/test_plans.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import table


# NOTE: the @pandas_udf wrappers are built INSIDE the query functions:
# the decorator parses its DDL return type against the active session,
# and Python workers re-import this module when unpickling the plain
# grouped-map kernel — module-level construction would crash them.


def _sigmoid_kernel(v: pd.Series) -> pd.Series:
    """Vectorized scalar kernel: sigmoid over one Arrow batch."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-v))


@query(
    "udf_scalar_vectorized",
    oracle="""
    SELECT event_id, round(1.0 / (1.0 + exp(-(value / 100.0))), 6) AS squashed
    FROM events
    """,
)
def udf_scalar_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: numpy sigmoid over Arrow batches.  The plan
    shows ArrowEvalPython fused into the projection — no shuffle, the
    batch size is the Arrow batch knob, and the same math in SQL is the
    oracle."""
    ev = table(spark, sf_dir, "events")
    sigmoid = pandas_udf(_sigmoid_kernel, "double")
    return ev.select(
        "event_id",
        F.round(sigmoid(F.col("value") / 100.0), 6).alias("squashed"),
    )


def _wavg_kernel(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-agg kernel: quantity-weighted mean price."""
    denom = qty.sum()
    return float((price * qty).sum() / denom) if denom else float("nan")


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): weighted mean per group.
    Plans as a real aggregation — shuffle on the group key, the UDAF
    runs once per group over Arrow column batches."""
    li = table(spark, sf_dir, "lineitem")
    wavg = pandas_udf(_wavg_kernel, "double")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: z-score each event within its group (ddof=1
    to match SQL ``stddev_samp``)."""
    sd = pdf["value"].std(ddof=1)
    z = (pdf["value"] - pdf["value"].mean()) / sd if sd and sd == sd else pdf["value"] * 0.0
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(4)}
    )


@query(
    "udf_group_normalize",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    """,
)
def udf_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-group z-score normalization (the
    canonical per-user feature normalize of a training pipeline).  One
    shuffle on the group key; each group materializes as ONE pandas
    frame on one executor, so the real scale constraint is bounded ROWS
    PER GROUP, not bounded group count — a high-cardinality key like
    user_id (many small groups) is the safe shape; a 5-value key like
    event_type would funnel the whole corpus into 5 executor-sized
    frames and OOM at 100 TB.  When even per-key rows are unbounded,
    use the window-function form (this query's oracle) instead."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _zscore_group, "event_id long, user_id long, z double"
    )


def _zscore_group_arrow(t):
    """Arrow-native grouped-map kernel: same z-score semantics as
    ``_zscore_group`` but straight from the Arrow record batch into
    numpy — no per-group pandas DataFrame construction."""
    import numpy as np
    import pyarrow as pa

    v = t.column("value").to_numpy()
    mean = v.mean()
    sd = v.std(ddof=1)
    z = (v - mean) / sd if sd == sd and sd else np.zeros_like(v)
    return pa.table(
        {
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "z": pa.array(np.round(z, 4)),
        }
    )


@query(
    "udf_group_normalize_arrow",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    """,
)
def udf_group_normalize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` grouped-map: identical semantics to
    ``udf_group_normalize`` (same oracle) on Spark 4's Arrow-native
    grouped-map API.  Measured at sf0.1 (1500 groups × ~67 rows): the
    pandas form costs 2.6 s with an IDENTITY kernel — the per-group
    pandas DataFrame construction IS the cost, and
    ``arrow.maxRecordsPerBatch`` doesn't move it (probed 10k→1M, flat;
    SCALING.md round-5 table) — while this Arrow form runs the same
    z-score in 0.64 s.  When per-group Python is genuinely needed at
    scale, this is the API to reach for; when the kernel is expressible
    as window functions, that form (this query's oracle, 0.1 s) wins
    outright."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInArrow(
        _zscore_group_arrow, "event_id long, user_id long, z double"
    )


@query(
    "udtf_word_expand",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, word, count(*)::INT AS n
    FROM toks GROUP BY doc_id, word
    """,
)
def udtf_word_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) — the 1→N row
    expansion member of the UDF family (scalar pandas / grouped-agg /
    grouped-map / mapInPandas are covered by the udf_* queries): each
    document LATERAL-joins to its per-word counts computed in Python.
    Arrow-optimized (``pythonUDTF.arrow.enabled``) so the exchange with
    the Python worker is batched, not pickled row-at-a-time — the plan
    shows ArrowEvalPythonUDTF and keeps the repo's R=0 invariant.
    Fenced to 50 docs: word counting belongs in codegen expressions
    (text_repetition_gopher is the scale path); the UDTF exists for
    logic that genuinely needs per-row Python with variable fan-out."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="word string, n int")
    class WordCount:
        def eval(self, text: str):
            from collections import Counter

            for w, c in Counter((text or "").lower().split()).items():
                yield w, c

    spark.udtf.register("word_expand", WordCount)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        """
        SELECT t.doc_id, wc.word, wc.n
        FROM udtf_docs_in t, LATERAL word_expand(t.text) wc
        """
    )


def _iter_score_kernel(batches):
    """Iterator-form scalar kernel: per-task init runs ONCE (here a
    trivial 'model' constant; in production a tokenizer, ONNX session,
    or compiled regex set), then every Arrow batch reuses it."""
    import numpy as np

    bias = 7.0  # stand-in for an expensively-constructed artifact
    for values in batches:
        yield 1.0 / (1.0 + np.exp(-(values + bias) / 100.0))


@query(
    "udf_scalar_iter",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value + 7.0) / 100.0)), 6) AS score
    FROM events
    """,
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``) — the API shape for Python stages with
    expensive per-task initialization: the generator body before the
    first ``yield`` runs once per task, then streams Arrow batches
    through the prepared state.  The elementwise form
    (udf_scalar_vectorized) re-enters the kernel per batch with no
    init hook; at 100 TB the difference is loading a model/tokenizer
    32,000× (once per batch) vs 1,000× (once per task).  Same
    ArrowEvalPython plan node, no shuffle; math mirrored exactly in
    the SQL oracle."""
    from typing import Iterator

    ev = table(spark, sf_dir, "events")

    def _score(batches):
        return _iter_score_kernel(batches)

    # the module uses postponed annotation evaluation, which turns the
    # Iterator[pd.Series] hints pandas_udf sniffs for into unresolvable
    # strings — attach real annotation objects instead
    _score.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    score = pandas_udf(_score, "double")

    return ev.select(
        "event_id", F.round(score(F.col("value")), 6).alias("score")
    )


@query(
    "udtf_ngram_expand_poly",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents WHERE doc_id < 50
    ),
    idx AS (
      SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
      FROM toks WHERE len(ts) >= 3
    )
    SELECT doc_id, ts[i] AS g1, ts[i + 1] AS g2, ts[i + 2] AS g3
    FROM idx
    """,
)
def udtf_ngram_expand_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is not declared — it is COMPUTED at plan time from the
    constant width argument (g1..gN columns for ``ngram_expand(text,
    N)``), the table-function equivalent of a generic library operator
    that adapts its shape per call site.  This is the capability the
    static ``udtf_word_expand`` can't show: one registration serves
    every width, and Catalyst sees the exact per-call schema (column
    pruning and downstream resolution work as if it were hand-typed).
    Arrow-batched like its sibling (ArrowEvalPythonUDTF, R=0
    invariant).  Fenced to 50 docs: shingling at corpus scale belongs
    in codegen (gram_hashes is the scale path); the UDTF exists for
    fan-outs whose SHAPE itself is parameterized."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    class NgramExpand:
        @staticmethod
        def analyze(text, n):
            from pyspark.sql.types import (
                StringType,
                StructField,
                StructType,
            )
            from pyspark.sql.udtf import AnalyzeResult

            width = int(n.value)
            return AnalyzeResult(
                schema=StructType(
                    [
                        StructField(f"g{i + 1}", StringType())
                        for i in range(width)
                    ]
                )
            )

        def eval(self, text, n):
            toks = (text or "").lower().split()
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    spark.udtf.register("ngram_expand_poly", udtf(NgramExpand))
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_poly_docs_in")
    return spark.sql(
        """
        SELECT t.doc_id, g.*
        FROM udtf_poly_docs_in t, LATERAL ngram_expand_poly(t.text, 3) g
        """
    )
