"""Query registry: the single source of truth behind ``__spark_entry__``.

Each operator module registers its queries at import time via the
:func:`query` decorator.  A registered query is a callable
``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
SQL-expressible, a DuckDB oracle SQL string the driver runs
side-by-side (row-count + schema + order-insensitive value-hash).

Conventions that keep the differential check meaningful:

- every computed column is aliased identically in Spark and SQL;
- float aggregates are rounded (``round(x, N)``) on BOTH sides so
  summation-order ULP differences between engines can't flip the hash;
- ordered results (sorts, top-k) materialize their position into a
  ``rn`` column, because the driver's hash is order-insensitive.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

#: Driver-evidence rotation.  The driver writes at most 50 CORRECTNESS
#: entries per round, taken in registry order; queries listed here are
#: emitted FIRST (in this order) so each round's window covers the
#: queries with the least driver-anchored evidence.  Round 4: first the
#: 16 queries that FAILED in r3 (the events.ts fixture-schema change —
#: fixed in tables.py, all re-verified locally), then every query never
#: driver-sampled (r3's window reached priority slot 50; slots 51+ and
#: later additions spilled).  5 of the 55 needing evidence spill to
#: round 5 (tail positions).  Rotate per round until every query has a
#: driver-green row in some CORRECTNESS_r*.json.
_DRIVER_PRIORITY: list[str] = [
    # failed r3 on the events.ts schema change — re-show green first
    "win_rank_latest_per_key", "win_analytic", "win_frame_rows",
    "udf_scalar_vectorized", "udf_group_normalize",
    "sub_in", "sub_scalar", "fn_map", "fn_json",
    "agg_stats", "join_skew_salted",
    "sub_exists_correlated", "sub_not_exists",
    "win_session_gaps", "agg_windowed_time", "source_orc_roundtrip",
    # never driver-sampled (past r3's 50-entry window)
    "fn_array", "join_range_bucketed",
    "events_funnel", "events_retention_cohort", "source_partitioned_pruning",
    "sample_weighted_hash", "text_tfidf_top_terms",
    "fn_bitwise", "fn_hash_portable", "reshape_unpivot", "agg_histogram_bins",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q17", "tpch_q19", "tpch_q22",
    "events_top_transitions", "events_rolling_dau", "agg_distinct_multi",
    "win_ignore_nulls", "join_null_safe", "agg_linear_regression",
    "agg_bool_countif",
    "decontaminate_ngram_overlap", "dedup_incremental_corpus",
    "pipeline_outlier_iqr", "text_repetition_gopher", "text_pii_scrub",
    "cdc_scd2_intervals", "sql_recursive_cte",
    # spillover to round 5 (still evidence-less after r4's 50 slots)
    "agg_heavy_hitters_topk", "source_cdc_feed_translate", "udtf_word_expand",
    "join_shuffle_hash_hint", "sim_ann_pq",
    # round-4 additions (rotate in round 5)
    "graph_pagerank", "pack_sequences_bins", "agg_percentile_exact",
    "join_asof_tolerance", "events_resample_interpolate",
    "cluster_kmeans_assign", "dedup_semantic", "text_trigram_lm_score",
    "set_intersect_all", "set_except_all", "stat_crosstab", "sub_lateral",
    "pipeline_curriculum_phases", "agg_hll_sketch_union", "corpus_build_e2e",
    "fn_variant", "tpch_q21",
]


def _ordered(names: dict[str, Query]) -> dict[str, Query]:
    """Registry order = priority list first, then registration order."""
    out: dict[str, Query] = {}
    for n in _DRIVER_PRIORITY:
        if n in names:
            out[n] = names[n]
    for n, q in names.items():
        if n not in out:
            out[n] = q
    return out


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering ``fn`` under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    # Imports are side-effecting by design: each module registers its
    # queries at import time.
    from .operators import (  # noqa: F401
        analytics,
        bucketed,
        cdc,
        clustering,
        dedup,
        formats,
        graph,
        multimodal,
        packing,
        pipeline,
        relational,
        sampling,
        scalar_fns,
        similarity,
        skew,
        text,
        tpch,
        udfs,
        windows,
    )

    return _ordered(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
