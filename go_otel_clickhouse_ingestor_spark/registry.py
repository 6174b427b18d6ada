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
#: queries with the least driver-anchored evidence.  Round 5: the 18
#: oracle-backed queries that have never had a driver row (cumulative
#: union of CORRECTNESS_r1–r4 = 130 green; these 18 are the remainder —
#: all pass the local differential in tools/check_oracle.py), followed
#: by round-5 additions.  Rows-only queries (no DuckDB oracle) are kept
#: OUT of this list: they would burn window slots as ``no_oracle``.
#: Rotate per round until every oracle-backed query has a driver-green
#: row in some CORRECTNESS_r*.json.
_DRIVER_PRIORITY: list[str] = [
    # never driver-sampled after r4 (local-oracle-green, need driver rows)
    "agg_heavy_hitters_topk", "agg_percentile_exact", "corpus_build_e2e",
    "events_resample_interpolate", "fn_variant", "graph_pagerank",
    "join_asof_tolerance", "join_shuffle_hash_hint", "pack_sequences_bins",
    "pipeline_curriculum_phases", "set_except_all", "set_intersect_all",
    "source_cdc_feed_translate", "stat_crosstab", "sub_lateral",
    "text_trigram_lm_score", "tpch_q21", "udtf_word_expand",
    # round-5 additions (appended as they are implemented)
    "udf_group_normalize_arrow",
    "tpch_q2", "tpch_q11", "tpch_q16", "tpch_q20",
    "fn_url", "fn_array_setops", "fn_regexp",
    "sub_quantified", "stat_corr_matrix",
    "win_pct_change", "events_anomaly_zscore",
    "pipeline_mix_weights", "text_html_strip", "text_oov_rate",
    "dedup_exact_keep_best", "graph_degree_stats",
    "emb_norm_stats", "emb_label_centroids",
    "agg_skewness_kurtosis", "events_pareto_users",
    "dedup_fuzzy_edit_distance",
    # round-5b additions (the 51st+ names overflow the 50-slot window
    # and lead the round-6 rotation instead)
    "agg_string_agg_ordered", "agg_bit_aggregates",
    "join_interval_overlap", "stat_chi2_independence",
    "stat_welch_ttest", "events_ewma", "text_readability",
    "stat_entropy_gini", "win_cumulative_distinct", "emb_quantize_int8",
    "agg_geometric_harmonic",
    "events_streaks", "orders_rfm_segments", "stat_ks_binned",
    "win_moving_median", "fn_try_safe",
    "fn_higher_order", "join_asof_nearest", "agg_median_mad",
    "dedup_ngram_containment", "text_zipf_fit", "stat_autocorr_lag",
    "events_window_funnel", "cdc_pointintime_join", "source_text_logparse",
    "events_sequence_match", "text_char_trigram_entropy", "agg_grouping_id",
    "events_attribution_last_touch", "orders_market_basket",
    "orders_cohort_ltv", "events_churn_weekly", "events_top_movers",
    "dedup_cross_source", "events_user_overlap", "sample_quantile_bucketize",
    "fn_time_bucket", "agg_weighted_stats", "events_heatmap_dow_hour",
    # round-5d additions
    "orders_backlog_daily", "graph_triangle_count", "graph_bfs_reachability",
    "agg_bitmap_distinct", "stat_benford", "stat_mannwhitney_binned",
    "events_interarrival_stats", "text_collocations_pmi",
    # round-5e additions
    "decontaminate_exact_substring", "events_stickiness_dau_mau",
    "agg_summap_props", "fn_mask_redact", "emb_pairwise_distance_hist",
    "multimodal_audio_frames",
    # round-5f additions
    "source_xml_roundtrip", "source_binaryfile_ingest", "fn_str_to_map",
    "events_rate_limit_burst", "sub_in_multicol", "join_mark_existence",
    # round-5g additions
    "dedup_paragraph_corpus", "text_dup_line_fraction",
    "events_changepoint_cusum", "fn_datetime_tz", "cdc_schema_drift",
    "emb_dim_variance", "join_dynamic_partition_pruning",
    "join_bloom_prefilter", "events_forecast_holt",
    "reshape_nest_unnest", "udf_scalar_iter",
    "decontaminate_aho_corasick", "orders_abc_class",
    "source_json_corrupt_records", "agg_skew_two_phase",
    "dq_expectations_audit", "agg_product_compound",
    "sql_pivot_dynamic_values", "text_feature_hashing",
    "orders_ship_latency", "cdc_merge_upsert", "stat_bootstrap_ci",
    "sample_balanced_classes", "events_slo_burn_rate",
    "events_apdex_score", "events_sli_availability",
    "events_histogram_otel_buckets", "events_exemplar_per_bucket",
    "events_peak_detection", "fn_printf", "events_counter_rate_resets",
    "source_multiline_logs", "events_new_vs_returning",
    "text_vocab_growth_heaps", "events_max_drawdown",
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
