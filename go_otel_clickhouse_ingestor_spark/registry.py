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
#: queries with the least driver-anchored evidence.  Round 7 rotation:
#: the cumulative driver-green union of CORRECTNESS_r1–r6 is 180 names —
#: ALL of them are deleted from this list so the 50-slot window samples
#: only the 84 oracle-backed queries that have never had a driver row
#: (every one passes the local differential in tools/check_oracle.py).
#: The first 50 fill the round-7 window; the remaining 34 plus any
#: net-new round-7 queries lead round 8.  Rows-only queries (no DuckDB
#: oracle) are kept OUT of this list: they would burn window slots as
#: ``no_oracle``.  ``tools/verify_round.py`` fails loudly if any name at
#: the head of this list is already green in a CORRECTNESS_r*.json.
_DRIVER_PRIORITY: list[str] = [
    # round-7 window: 50 oracle-backed queries with no driver row yet
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
    "orders_backlog_daily", "graph_triangle_count", "graph_bfs_reachability",
    "agg_bitmap_distinct", "stat_benford", "stat_mannwhitney_binned",
    "events_interarrival_stats", "text_collocations_pmi",
    "decontaminate_exact_substring", "events_stickiness_dau_mau",
    "agg_summap_props", "fn_mask_redact", "emb_pairwise_distance_hist",
    "multimodal_audio_frames",
    "source_xml_roundtrip", "source_binaryfile_ingest", "fn_str_to_map",
    "events_rate_limit_burst", "sub_in_multicol", "join_mark_existence",
    "dedup_paragraph_corpus",
    # staged for round 8 (the 34 remaining never-driver-sampled names;
    # net-new round-7 queries are appended after these)
    "text_dup_line_fraction",
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
    # round-7 additions
    "graph_label_propagation", "stat_dft_power", "emb_label_outliers",
    "sub_not_in_null_semantics", "dedup_repeated_passages",
    "pipeline_temperature_sampling", "pipeline_quality_classifier_lr",
    "stat_spearman_trend", "stat_anova_f", "stat_psi_drift",
    "text_unicode_normalize", "multimodal_byte_entropy",
    "agg_table_checksum", "dq_snapshot_diff",
    "emb_matryoshka_recall", "graph_k_core",
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
