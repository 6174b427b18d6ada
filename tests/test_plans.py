"""Physical-plan assertions: the scale properties the docstrings claim
must be visible in `.explain` output — pushdown reaching the parquet
scan, dimensions broadcast, whole-stage codegen on the hot paths, and
top-k not globally sorting."""

from __future__ import annotations

import pytest

from go_otel_clickhouse_ingestor_spark.plans import audit, executed_plan, formatted_plan
from go_otel_clickhouse_ingestor_spark.registry import load_all

REGISTRY = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    return formatted_plan(REGISTRY[name].fn(spark, sf_dir))


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_filter_pushdown")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual" in plan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_project")
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_extendedprice" not in rs[0], "scan must not read unused columns"


def test_dimensions_broadcast_in_star_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_multiway_star")
    assert "BroadcastHashJoin" in plan


def test_semi_anti_plan_as_semi_joins(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in _plan(spark, sf_dir, "join_anti")


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_limit")
    assert "TakeOrderedAndProject" in plan, "global top-k must not full-sort"


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_groupby")
    assert plan.count("HashAggregate") >= 2, "expect partial + final hash agg"


def test_whole_stage_codegen_on_hot_paths(spark, sf_dir):
    """With AQE on, `explain` of an unexecuted plan prints
    `AdaptiveSparkPlan isFinalPlan=false` with no codegen spans, so run
    the query first and assert on the *executed* plan."""
    for name in ("agg_groupby", "fn_math", "text_quality_score"):
        executed = executed_plan(REGISTRY[name].fn(spark, sf_dir))
        # "*(n)" prefixes are the codegen stage markers in the simple
        # plan string (the word WholeStageCodegen only appears in the
        # formatted explain, which AQE hides pre-execution; shuffle-free
        # plans never get the AdaptiveSparkPlan wrapper at all).
        assert "*(" in executed, f"{name}: no WholeStageCodegen stage"


#: Oracle-checked queries whose kernel is a DESIGNATED Arrow slow path
#: (no JVM builtin exists for the semantics).  Row-at-a-time is still
#: banned everywhere — these may only appear as ArrowEvalPython, which
#: test_unicode_normalize_is_arrow_batched pins.
_ARROW_SLOW_PATH_ALLOWLIST = frozenset({
    # Spark has no Unicode-normalization builtin (char() is mod-256);
    # the NFC kernel is a vectorized pandas UDF by design.
    "text_unicode_normalize",
})


@pytest.mark.slow
def test_no_python_udfs_in_oracle_queries(spark, sf_dir):
    """Everything oracle-checked must stay JVM-side (BatchEvalPython /
    ArrowEvalPython in a plan means a Python UDF snuck in) — except the
    ``udf_*``/``udtf_*`` families, which exist to test the Python
    boundary itself, and the explicit Arrow slow-path allowlist.
    BatchEvalPython (row-at-a-time) is banned with NO exceptions."""
    for name, q in REGISTRY.items():
        if q.oracle is None or name.startswith(("udf_", "udtf_")):
            continue
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time UDF"
        if name in _ARROW_SLOW_PATH_ALLOWLIST:
            continue
        assert "EvalPython" not in plan, f"{name} uses a Python UDF"


def test_audit_summary_flags_scale_properties(spark, sf_dir):
    """The audit() API itself: pushdown + pruning visible for the scan
    query, broadcasts counted for the star join, cross join stays a
    broadcast nested loop (never a shuffled cartesian)."""
    a = audit(REGISTRY["scan_filter_pushdown"].fn(spark, sf_dir))
    assert a["pushed_filters"] and a["read_schemas"]
    assert a["python_row_at_a_time"] == 0

    star = audit(REGISTRY["join_multiway_star"].fn(spark, sf_dir))
    assert star["broadcast_joins"] >= 2

    cross = audit(REGISTRY["join_cross"].fn(spark, sf_dir))
    assert cross["broadcast_joins"] >= 1 and cross["shuffle_exchanges"] == 0


def test_salted_join_distributes_on_salt(spark, sf_dir):
    """join_skew_salted must shuffle on (key, salt) — the whole point —
    visible as both columns in the hashpartitioning clause."""
    plan = _plan(spark, sf_dir, "join_skew_salted")
    assert "salt" in plan and "user_id" in plan


def test_udf_queries_are_arrow_not_row_at_a_time(spark, sf_dir):
    """The UDF-surface queries must run Arrow-batched (ArrowEvalPython /
    FlatMapGroupsInPandas / AggregateInPandas), never row-at-a-time
    BatchEvalPython."""
    for name in ("udf_scalar_vectorized", "udf_grouped_agg", "udf_group_normalize"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-at-a-time"
        assert any(
            marker in plan
            for marker in (
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
                "AggregateInPandas",
                "ArrowAggregatePython",  # Spark 4.x name for pandas UDAF
            )
        ), f"{name}: no Arrow-batched Python node in plan"


def test_bucketed_join_plans_shuffle_free(spark, sf_dir):
    """join_bucketed: with broadcast disabled, the bucketed layout must
    satisfy both the join and the aggregation distribution — zero
    Exchange nodes anywhere in the plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["join_bucketed"].fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tpch_q10_take_ordered_no_global_window(spark, sf_dir):
    """q10 (like q3) must cut to top-20 via TakeOrderedAndProject and
    rank only the survivors — never a partition-less WindowExec over
    the full aggregate."""
    a = audit(REGISTRY["tpch_q10"].fn(spark, sf_dir))
    assert a["take_ordered"]
    q4 = audit(REGISTRY["tpch_q4"].fn(spark, sf_dir))
    assert q4["python_row_at_a_time"] == 0


def test_tpch_q5_broadcasts_dimensions(spark, sf_dir):
    """The 6-way join must broadcast supplier/nation/region — only the
    customer⋈orders⋈lineitem spine may shuffle."""
    a = audit(REGISTRY["tpch_q5"].fn(spark, sf_dir))
    assert a["broadcast_joins"] >= 3


def test_subquery_decorrelation(spark, sf_dir):
    """EXISTS / NOT EXISTS must decorrelate to semi/anti hash joins,
    not nested-loop re-execution."""
    ex = _plan(spark, sf_dir, "sub_exists_correlated")
    assert "LeftSemi" in ex
    ne = _plan(spark, sf_dir, "sub_not_exists")
    assert "LeftAnti" in ne


def test_session_gaps_single_shuffle(spark, sf_dir):
    """Sessionization: both windows + the rollup agg share ONE shuffle
    on user_id (Catalyst reuses the partitioning); a second exchange
    would mean the plan re-shuffles between the window and the agg."""
    a = audit(REGISTRY["win_session_gaps"].fn(spark, sf_dir))
    assert a["shuffle_exchanges"] <= 1
    assert a["python_row_at_a_time"] == 0


def test_shingle_profile_no_explode_no_shuffle(spark, sf_dir):
    """The shingle profile is per-row HOF work: zero exchanges, zero
    Python, no row blow-up (no Generate/explode node)."""
    df = REGISTRY["text_shingle_profile"].fn(spark, sf_dir)
    a = audit(df)
    assert a["shuffle_exchanges"] == 0
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0
    assert "Generate" not in df._jdf.queryExecution().executedPlan().toString()


def test_range_bucketed_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as a hash/sort-merge EQUI join
    on the bucket key with the range predicate as residual — never a
    BroadcastNestedLoopJoin scanning every (row, window) pair."""
    plan = _plan(spark, sf_dir, "join_range_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    a = audit(REGISTRY["join_range_bucketed"].fn(spark, sf_dir))
    assert a["broadcast_joins"] + a["sort_merge_joins"] >= 1


def test_partitioned_source_prunes_partitions(spark, sf_dir):
    """The event_type filter must become PartitionFilters on the scan
    (directory-level pruning), not a post-scan Filter over all rows."""
    df = REGISTRY["source_partitioned_pruning"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]


def test_shuffle_hash_hint_forces_shuffled_hash_join(spark, sf_dir):
    """join_shuffle_hash_hint must plan a ShuffledHashJoin, not SMJ or
    broadcast — otherwise the hint surface is silently broken."""
    from go_otel_clickhouse_ingestor_spark.operators.relational import (
        join_shuffle_hash_hint,
    )

    df = join_shuffle_hash_hint(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_udtf_is_arrow_evaluated(spark, sf_dir):
    """udtf_word_expand must go through ArrowEvalPythonUDTF (batched),
    never pickled row-at-a-time evaluation."""
    from go_otel_clickhouse_ingestor_spark.operators.udfs import udtf_word_expand
    from go_otel_clickhouse_ingestor_spark.plans import audit

    df = udtf_word_expand(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert audit(df)["python_row_at_a_time"] == 0


def test_sharded_pipelines_have_no_global_windows(spark, sf_dir):
    """The sharded curation/packing plans must never funnel through a
    partition-less window (the r2-verdict scale wart, now guarded
    statically).  pipeline_corpus_filter is the DOCUMENTED exception:
    its final global budget cut is the point of that query, with
    pipeline_budget_sharded as the scale path."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    for name in (
        "pack_sequences_bins",
        "pipeline_budget_sharded",
        "pipeline_curriculum_phases",
        "corpus_build_e2e",
    ):
        assert global_windows(REGISTRY[name].fn(spark, sf_dir)) == 0, name
    # tpch_q3/q10 rank only their TakeOrdered survivors (<= k rows), so
    # their single global window is bounded by construction — covered by
    # their own take_ordered assertions, not this zero-window guard.
    assert global_windows(REGISTRY["pipeline_corpus_filter"].fn(spark, sf_dir)) == 1


def test_round5_partitioned_windows_stay_partitioned(spark, sf_dir):
    """Round-5 window/mixture operators must keep every Window keyed —
    the same zero-global-window guard the sharded pipelines carry."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    for name in (
        "pipeline_mix_weights",
        "dedup_exact_keep_best",
        "events_anomaly_zscore",
        "win_pct_change",
    ):
        assert global_windows(REGISTRY[name].fn(spark, sf_dir)) == 0, name


def test_sub_quantified_broadcasts_the_aggregate(spark, sf_dir):
    """The decorrelated ALL/ANY aggregate is O(nations) and must reach
    supplier as a broadcast, never a sort-merge shuffle."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["sub_quantified"].fn(spark, sf_dir))
    assert a["broadcast_joins"] >= 1
    assert a["sort_merge_joins"] == 0
    assert a["python_row_at_a_time"] == 0


def test_text_oov_rate_vocab_is_bounded_broadcast(spark, sf_dir):
    """The vocabulary cut must plan as TakeOrderedAndProject (bounded
    1000 rows, no global sort) and probe back via broadcast join."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    df = REGISTRY["text_oov_rate"].fn(spark, sf_dir)
    a = audit(df)
    assert a["take_ordered"], "vocab LIMIT should be TakeOrderedAndProject"
    assert a["broadcast_joins"] >= 1
    assert a["python_row_at_a_time"] == 0


def test_tpch_q2_topk_is_take_ordered(spark, sf_dir):
    """q2's top-100 must plan as TakeOrderedAndProject; its only global
    window ranks the <=100 survivors (bounded by construction, the
    tpch_q3 convention)."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["tpch_q2"].fn(spark, sf_dir))
    assert a["take_ordered"]
    assert a["python_row_at_a_time"] == 0


def test_join_interval_overlap_is_hash_not_theta(spark, sf_dir):
    """The interval-overlap semantics must plan as an equi-join on the
    hour bucket with the hot side broadcast — never a cartesian/BNLJ
    range join (the formulation that dies at 100 TB)."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    df = REGISTRY["join_interval_overlap"].fn(spark, sf_dir)
    a = audit(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the hot-hour probe must be a broadcast HASH join on the bucket;
    # the only nested-loop allowed is the 1-row threshold broadcast
    assert a["broadcast_joins"] >= 1
    assert "CartesianProduct" not in plan


def test_join_asof_nearest_has_no_join_operator(spark, sf_dir):
    """Nearest as-of rides ONE windowed pass over the user-ordered
    stream: the plan must contain zero join operators and all windows
    must be keyed on user_id."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    df = REGISTRY["join_asof_nearest"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "nearest as-of must not plan a join"
    assert global_windows(df) == 0


def test_text_zipf_fit_vocab_cut_is_take_ordered(spark, sf_dir):
    """The top-500 vocabulary cut must be TakeOrderedAndProject — a
    bounded top-k, not a global sort of the corpus vocabulary."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["text_zipf_fit"].fn(spark, sf_dir))
    assert a["take_ordered"], "vocab LIMIT should be TakeOrderedAndProject"
    assert a["python_row_at_a_time"] == 0


def test_round5b_windows_all_keyed(spark, sf_dir):
    """Round-5b per-entity operators must keep every window partitioned
    (the day-grain cumulative/median/KS windows are separately
    documented as calendar-bounded)."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    for name in (
        "events_streaks",
        "events_ewma",
        "agg_string_agg_ordered",
        "win_moving_median",
    ):
        assert global_windows(REGISTRY[name].fn(spark, sf_dir)) == 0, name


def test_market_basket_pair_join_is_order_keyed(spark, sf_dir):
    """The basket pair join must key on l_orderkey (pair volume bounded
    by C(items,2) per order) — no cartesian, margins broadcast."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    df = REGISTRY["orders_market_basket"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    a = audit(df)
    assert "CartesianProduct" not in plan
    assert a["broadcast_joins"] >= 2
    assert a["python_row_at_a_time"] == 0


def test_attribution_window_is_user_keyed(spark, sf_dir):
    """Last-touch attribution must run its backward frame per user —
    zero global windows, zero joins."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    df = REGISTRY["events_attribution_last_touch"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert global_windows(df) == 0
    assert "Join" not in plan


def test_triangle_count_joins_are_equi_keyed(spark, sf_dir):
    """Triangle enumeration must stay equi-keyed (orderkey for edges,
    src for wedges, (y, z) for closure) — no cartesian anywhere, no
    Python."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    df = REGISTRY["graph_triangle_count"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    a = audit(df)
    assert "CartesianProduct" not in plan
    assert a["python_row_at_a_time"] == 0


def test_backlog_sweep_has_one_day_grain_window_no_join_after_span(spark, sf_dir):
    """The backlog sweep's running sum is the ONE documented day-grain
    global window; the span build is the only join (orders⋈lineitem) —
    no day×span theta join may appear (that's the oracle's job)."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    df = REGISTRY["orders_backlog_daily"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert global_windows(df) == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_per_user_round5_windows_are_keyed(spark, sf_dir):
    """Inter-arrival gaps and burst detection must keep their windows
    user-partitioned — zero global windows."""
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    for name in ("events_interarrival_stats", "events_rate_limit_burst"):
        assert global_windows(REGISTRY[name].fn(spark, sf_dir)) == 0, name


def test_collocations_topk_is_take_ordered(spark, sf_dir):
    """The PMI top-20 cut must be TakeOrderedAndProject over the scored
    survivors, never a global sort of the bigram table."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["text_collocations_pmi"].fn(spark, sf_dir))
    assert a["take_ordered"]
    assert a["python_row_at_a_time"] == 0


def test_exact_substring_probe_side_is_broadcast(spark, sf_dir):
    """The eval-probe scan must broadcast the (bounded) probe set and
    stream the corpus — a shuffled or cartesian plan would move the
    corpus instead."""
    df = REGISTRY["decontaminate_exact_substring"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_audio_frames_is_map_only(spark, sf_dir):
    """Frame windowing is a transformation stage: scan → project →
    sequence explode, ZERO shuffles."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["multimodal_audio_frames"].fn(spark, sf_dir))
    assert a["shuffle_exchanges"] == 0
    assert a["python_row_at_a_time"] == 0


def test_mask_and_strtomap_are_map_only(spark, sf_dir):
    """The scalar-function queries stay shuffle-free projections."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    for name in ("fn_mask_redact", "fn_str_to_map"):
        a = audit(REGISTRY[name].fn(spark, sf_dir))
        assert a["shuffle_exchanges"] == 0, name
        assert a["python_row_at_a_time"] == 0, name


def test_dpp_partition_filter_is_dynamic(spark, sf_dir):
    """join_dynamic_partition_pruning: the partitioned fact scan must
    carry a runtime dynamicpruning expression on the partition column —
    no literal partition predicate exists in the query."""
    df = REGISTRY["join_dynamic_partition_pruning"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "dynamicpruning" in plan, "DPP did not fire on the partitioned scan"
    assert "PartitionFilters" in plan


def test_bloom_prefilter_semi_probe_is_broadcast(spark, sf_dir):
    """join_bloom_prefilter: the key pre-filter must be a BROADCAST
    left-semi probe (map-side, before the shuffle join) — if it ever
    plans as a shuffled semi join the pattern costs a shuffle instead
    of saving one."""
    plan = _plan(spark, sf_dir, "join_bloom_prefilter")
    import re

    semi = [
        ln
        for ln in plan.splitlines()
        if "LeftSemi" in ln
    ]
    assert semi, "expected a left-semi probe in the plan"
    assert any("Broadcast" in ln for ln in semi), semi


def test_paragraph_dedup_window_is_hash_keyed(spark, sf_dir):
    """dedup_paragraph_corpus: the keep-first window partitions by the
    segment digest (never global) — the measured-faster form (the
    min-winners aggregate + survivor join alternative re-shuffles the
    exploded corpus and probed 2.3x slower at 10x)."""
    plan = _plan(spark, sf_dir, "dedup_paragraph_corpus")
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    assert "row_number" in plan and "Window" in plan
    assert "md5" in plan  # the digest the window partitions on
    assert global_windows(REGISTRY["dedup_paragraph_corpus"].fn(spark, sf_dir)) == 0


def test_cusum_heavy_lifting_is_partial_agg(spark, sf_dir):
    """events_changepoint_cusum: the only unpartitioned windows run at
    DAY grain (calendar-bounded by construction); the per-event work is
    a partial-aggregated groupBy."""
    plan = _plan(spark, sf_dir, "events_changepoint_cusum")
    from go_otel_clickhouse_ingestor_spark.plans.audit import global_windows

    assert "HashAggregate" in plan
    # day-grain global windows are the documented exception here: the
    # series is bounded by the calendar, not the data volume.
    assert global_windows(
        REGISTRY["events_changepoint_cusum"].fn(spark, sf_dir)
    ) <= 2


def test_dim_variance_is_single_agg_shuffle(spark, sf_dir):
    """emb_dim_variance: one aggregate over the exploded pairs; the
    ranking window runs over 64 rows (dim-bounded)."""
    plan = _plan(spark, sf_dir, "emb_dim_variance")
    assert "Generate" in plan  # posexplode stays JVM-side
    assert "HashAggregate" in plan


def test_byte_entropy_is_arrow_map_only(spark, sf_dir):
    """multimodal_byte_entropy: scan → mapInArrow, ZERO shuffles, and
    the parquet scan is pruned to (doc_id, text) only."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    df = REGISTRY["multimodal_byte_entropy"].fn(spark, sf_dir)
    a = audit(df)
    assert a["shuffle_exchanges"] == 0
    assert a["python_row_at_a_time"] == 0
    assert any("doc_id" in s and "text" in s for s in a["read_schemas"])
    plan = _plan(spark, sf_dir, "multimodal_byte_entropy")
    assert "MapInArrow" in plan  # Arrow-native stage, not pandas


def test_spearman_windows_share_one_shuffle(spark, sf_dir):
    """stat_spearman_trend: both rank windows and the moment agg all
    key on event_type — Catalyst reuses a single exchange."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["stat_spearman_trend"].fn(spark, sf_dir))
    assert a["shuffle_exchanges"] == 1
    assert a["python_row_at_a_time"] == 0


def test_unicode_normalize_is_arrow_batched(spark, sf_dir):
    """text_unicode_normalize: the NFC kernel is the designated slow
    path and must run Arrow-batched, never row-at-a-time."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["text_unicode_normalize"].fn(spark, sf_dir))
    assert a["python_arrow"] >= 1
    assert a["python_row_at_a_time"] == 0
    assert a["shuffle_exchanges"] == 1  # only the final lang agg


def test_round7_new_ops_shuffle_budget(spark, sf_dir):
    """The round-7 additions keep their documented shuffle budgets:
    session TVF and interval union are ONE user-keyed exchange (three
    stacked windows / one session agg over the same sort); the
    checksum is one partial-agg exchange; weighted median pays two
    (value-domain regroup + flag window)."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    budgets = {
        "win_session_window_tvf": 1,
        "events_interval_union_coverage": 1,
        "agg_table_checksum": 1,
        "agg_weighted_median": 2,
    }
    for name, budget in budgets.items():
        a = audit(REGISTRY[name].fn(spark, sf_dir))
        assert a["shuffle_exchanges"] <= budget, (name, a["shuffle_exchanges"])
        assert a["python_row_at_a_time"] == 0, name


def test_checksum_scan_reads_all_columns_once(spark, sf_dir):
    """agg_table_checksum reads the full row exactly once — one scan,
    no joins, no sort anywhere in the plan."""
    from go_otel_clickhouse_ingestor_spark.plans import audit

    a = audit(REGISTRY["agg_table_checksum"].fn(spark, sf_dir))
    assert len(a["read_schemas"]) == 1
    assert a["sort_merge_joins"] == 0
    assert a["broadcast_joins"] == 0


def test_round14_flagship_plan_properties(spark, sf_dir):
    """The round-14 flagships' audited scale properties, pinned:

    - croston: dims broadcast, zero sort-merge joins, zero Python —
      the fold is a JVM aggregate expression;
    - mann-kendall: all assembly joins broadcast (bounded type-keyed
      sides), zero sort-merge joins, zero Python;
    - matrix profile: zero Python anywhere (pair math is JVM array
      expressions on bounded frames);
    - incremental near-dup: the batch side broadcasts into the corpus
      band index (the corpus is never shuffled for candidates);
    - adaptive IVF: top-k rerank is TakeOrderedAndProject-or-window,
      zero row-at-a-time Python."""
    a = audit(REGISTRY["orders_croston_demand"].fn(spark, sf_dir))
    assert a["broadcast_joins"] >= 1 and a["sort_merge_joins"] == 0
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["stat_mann_kendall"].fn(spark, sf_dir))
    assert a["broadcast_joins"] >= 3 and a["sort_merge_joins"] == 0
    assert a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["events_matrix_profile"].fn(spark, sf_dir))
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["dedup_near_incremental"].fn(spark, sf_dir))
    # candidate probe + both exact-verify gram joins broadcast the
    # LSH-bounded side; NOTHING sort-merges (a SMJ here would mean a
    # corpus- or batch-sized shuffle crept back in — ADVICE r14)
    assert a["broadcast_joins"] >= 3
    assert a["sort_merge_joins"] == 0
    assert a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["sim_ann_ivf"].fn(spark, sf_dir))
    assert a["python_row_at_a_time"] == 0


def test_round15_flagship_plan_properties(spark, sf_dir):
    """Round-15 flagships' audited scale properties, pinned:

    - IVFPQ: the ADC scan is the ONLY Arrow stage in the prepared plan
      (the offline code-packing pass hides behind the materialized
      assignment cache); since the r15 optimization round the Q-row
      query table is PERSISTED, so its TakeOrdered corpus scan runs
      once instead of once per consumer (collect, probe ranking,
      rerank) — the old pin asserted TakeOrdered presence, which held
      incidentally through the re-derivations; the real invariants
      are: nothing sort-merges, the bounded sides broadcast, zero
      row-at-a-time Python."""
    a = audit(REGISTRY["sim_ann_ivfpq"].fn(spark, sf_dir))
    assert a["python_arrow"] <= 1
    assert a["python_row_at_a_time"] == 0
    assert a["sort_merge_joins"] == 0
    assert a["broadcast_joins"] >= 2  # probe centroids + rerank queries


def test_round15_additions_plan_properties(spark, sf_dir):
    """The later round-15 additions' scale properties, pinned:

    - persisted ANN index: the serving path broadcasts the saved
      centroids and the query set, reads postings/floats by join —
      zero sort-merge joins, zero row-at-a-time Python;
    - AQP estimate: two partial-agg branches over one scan shape and
      a 6-row join — no window, no sort-merge join on the big side
      (Catalyst may choose either join for the tiny grouped sides, so
      only Python-free-ness and agg count are pinned);
    - multi-touch attribution: window-only (no joins at all except
      the final tiny union), zero Python;
    - FD profiling: nothing but partial-agg'd aggregates — zero
      joins, zero windows on row-expanded inputs, zero Python;
    - rolling slope: one window pass, zero Python."""
    a = audit(REGISTRY["sim_ann_index_lake"].fn(spark, sf_dir))
    assert a["sort_merge_joins"] == 0
    assert a["python_row_at_a_time"] == 0
    assert a["broadcast_joins"] >= 2

    a = audit(REGISTRY["sample_estimate_ci"].fn(spark, sf_dir))
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["events_attribution_multi_touch"].fn(spark, sf_dir))
    assert a["sort_merge_joins"] == 0
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["dq_functional_dependencies"].fn(spark, sf_dir))
    assert a["sort_merge_joins"] == 0 and a["broadcast_joins"] == 0
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0

    a = audit(REGISTRY["events_rolling_slope"].fn(spark, sf_dir))
    assert a["sort_merge_joins"] == 0
    assert a["python_arrow"] == 0 and a["python_row_at_a_time"] == 0
