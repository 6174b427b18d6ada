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
#: queries with the least driver-anchored evidence.  Round 9 rotation:
#: the cumulative driver-green union of CORRECTNESS_r1–r8 is 288 names —
#: ALL of them are deleted from this list (the 50 round-8 window names
#: were removed at the top of round 9) so the 50-slot window samples
#: exactly the 50 queries that have never had a driver row: the 39
#: remaining oracle-backed names (every one passes the local
#: differential in tools/check_oracle.py) followed by the 11 rows-only
#: names (no DuckDB oracle by design — sketches/ANN/clustering/codecs;
#: the driver records them running clean with stable row counts).  The
#: round-9 oracle-backed additions enter the window ahead of rows-only
#: slots (hash evidence outranks clean-run evidence), displacing some
#: rows-only names to round 10; after r10's window, every registered
#: query has driver evidence.  ``tools/verify_round.py`` fails loudly if
#: any name at the head of this list is already green in a
#: CORRECTNESS_r*.json.
_DRIVER_PRIORITY: list[str] = [
    # round-9 window part 1: the last 39 oracle-backed queries with no
    # driver row
    "stat_mutual_information", "graph_jaccard_link_prediction",
    "events_seasonal_decompose", "source_parquet_footer_stats",
    "orders_skyline_pareto", "fn_aes_roundtrip", "pipeline_epoch_shuffle",
    "multimodal_contrastive_pairs", "events_hysteresis_alerts",
    "events_histogram_quantile", "udtf_ngram_expand_poly",
    "events_conversion_latency_curve", "text_code_detect",
    "stat_runs_test", "win_session_window_tvf", "stat_kendall_tau",
    "graph_degree_assortativity", "text_term_burstiness",
    "events_markov_stationary", "events_survival_km",
    "agg_weighted_median", "events_interval_union_coverage",
    "text_vocab_coverage_curve",
    "events_poisson_dispersion", "text_js_divergence_sources",
    "stat_association_measures", "events_max_concurrency",
    "events_top_paths", "orders_xyz_class", "events_bot_score",
    "events_dead_air_gaps", "orders_price_dispersion",
    "events_correlated_anomalies", "orders_revenue_share_hierarchy",
    "dq_cross_table_reconciliation", "events_seasonal_anomaly",
    "events_gini_concentration", "events_decile_migration",
    "text_lang_confusion",
    # round-9 window part 2: eleven of the twelve oracle-backed round-9
    # additions (hash-verifiable evidence outranks rows-only slots —
    # the verify_round rotation rule); with the 39-name backlog they
    # fill the 50-slot window exactly, so every displaced rows-only
    # name and the 12th addition wait in the staged section below.
    "events_sequence_regex_match", "events_exp_histogram",
    "events_log_templates", "source_otlp_spans_parse",
    "agg_count_min_estimate", "events_token_bucket_admission",
    "graph_tree_depth_pointer_doubling", "agg_hll_portable",
    "dq_k_anonymity", "events_label_cardinality_audit",
    "text_keyword_rake",
    # staged for round 10 (positions 51+ — outside this round's window):
    # the 12th round-9 oracle addition (the 39-name backlog + 11
    # additions fill the 50 slots exactly), the rows-only names the
    # additions displaced, then the rest — after r10's window, every
    # registered query has driver evidence.
    "emb_mutual_knn_graph", "events_p99_of_user_p95",
    "sim_ann_pq", "dedup_near_e2e",
    "dedup_semantic", "cluster_kmeans_assign", "emb_mmr_rerank",
    "emb_pca_top_component", "events_lttb_downsample", "multimodal_resize",
    "text_bpe_tokenize", "text_compression_ratio", "agg_hll_sketch_union",
    "text_bpe_train", "text_bpe_tokenize_trained",
    "multimodal_decode_codecs", "multimodal_resize_codecs",
    "multimodal_audio_features_codecs",
]

#: Names appended here by round-5 modules land right after the backlog
#: in the driver window.  Kept as a mutation hook so operator modules
#: can self-register their priority at import time.


def driver_priority_append(name: str) -> None:
    """Add ``name`` to the driver-evidence window (idempotent)."""
    if name not in _DRIVER_PRIORITY:
        _DRIVER_PRIORITY.append(name)


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
        dataquality,
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
