"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed via a count()-style terminal action plus a full
materialization (collect of aggregated / limited results stays small;
wide results use a count to avoid driver OOM while still forcing the
full plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_otel_clickhouse_ingestor_spark.operators.dedup import release_persisted
from go_otel_clickhouse_ingestor_spark.registry import load_all
from go_otel_clickhouse_ingestor_spark.session import get_spark

#: Headline set: one per operator family, weighted toward the
#: shuffle/join/window-heavy plans that dominate at scale.
HEADLINE = [
    "tpch_q1",
    "tpch_q5",
    "agg_groupby",
    "join_multiway_star",
    "join_asof",
    "agg_count_distinct",
    "win_rank_latest_per_key",
    "win_frame_rows",
    "topk_per_group",
    "cdc_current_state",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_ann_lsh",
    "fn_json",
    "text_quality_score",
    "join_skew_salted",
    "pipeline_corpus_filter",
    "udf_group_normalize",
    # round-3 flagships
    "dedup_cluster_cc",
    "text_tfidf_top_terms",
    "sim_ann_pq",
    "events_funnel",
    "join_range_bucketed",
    "win_session_gaps",
    # round-3b flagships
    "tpch_q9",
    "tpch_q13",
    "tpch_q17",
    "decontaminate_ngram_overlap",
    "events_rolling_dau",
    "agg_linear_regression",
    # round-4 flagships
    "graph_pagerank",
    "pack_sequences_bins",
    "cluster_kmeans_assign",
    "dedup_semantic",
    "events_resample_interpolate",
    "text_trigram_lm_score",
    "corpus_build_e2e",
    # round-5 flagships
    "tpch_q2",
    "udf_group_normalize_arrow",
    "events_anomaly_zscore",
    "text_oov_rate",
    "dedup_exact_keep_best",
    "pipeline_mix_weights",
    # round-5b flagships
    "join_interval_overlap",
    "events_ewma",
    "emb_quantize_int8",
    # round-5d/5e flagships
    "graph_triangle_count",
    "orders_backlog_daily",
    "text_collocations_pmi",
    # the automaton form is the many-probe scale path (0.63x at 10x
    # probes where the locate-join form measured 22x — SCALING.md);
    # the locate form stays registered for the oracle differential
    "decontaminate_aho_corasick",
    "agg_bitmap_distinct",
    "emb_pairwise_distance_hist",
    # round-5g flagships
    "dedup_paragraph_corpus",
    "text_bpe_tokenize",
    "join_dynamic_partition_pruning",
    "events_forecast_holt",
    # round-7 flagships
    "multimodal_byte_entropy",
    "agg_table_checksum",
    "dq_snapshot_diff",
    "graph_k_core",
    "emb_matryoshka_recall",
    "orders_skyline_pareto",
    "pipeline_epoch_shuffle",
    # round-9 flagships: the reworked distributed-rank decile shape,
    # the limit-before-rank vocab curve, and the lazy in-task BPE trainer
    "events_decile_migration",
    "text_vocab_coverage_curve",
    "text_bpe_train",
    # round-9 observability flagships: OTLP envelope parse and the
    # log-depth pointer-doubling tree walk
    "source_otlp_spans_parse",
    "graph_tree_depth_pointer_doubling",
    # round-10 flagships: the trace-tree pair (co-partitioned
    # self-join rollup + log-factor critical path), the 1-bit
    # quantization recall kernel, and two cheap map-linear faces
    "spans_self_time_rollup",
    "spans_critical_path",
    "emb_binary_quantize_recall",
    "fn_ip",
    "dq_freshness_completeness",
    # round-11 flagships: DSIR importance selection, the Apdex grid,
    # and the prefix-filtered edit-distance entity matcher (the LSH
    # link-prediction face is probed in SCALING.md instead — it is the
    # sparse-regime path and this fixture is its dense worst case)
    "pipeline_dsir_select",
    "spans_apdex",
    "dedup_fuzzy_levenshtein",
    "dq_drift_ks",
    "dq_drift_psi",
    "dq_benford_first_digit",
    # round-12 flagships: the spanmetrics RED grid + tail-sampling
    # decision pass, the ROUGE-2 eval join, the codec roundtrip audit,
    # and the mergeable t-digest (star-contraction CC is probed in
    # SCALING.md instead — its cost is round-trip latency on a
    # fixed-size fixture graph, not data volume, so a bench row would
    # measure the scheduler, not the operator)
    "spans_red_metrics",
    "spans_tail_sampling",
    "text_rouge2_overlap",
    "source_compression_codecs",
    "agg_tdigest_quantile",
    "emb_diag_mahalanobis_outliers",
    "agg_theta_sketch_setops",
    "events_series_znorm_topk",
    "events_series_dtw",
    # round-13 flagships: the LB_Keogh-pruned DTW search (prune-regime
    # evidence lives in SCALING.md's dtw_topk probe), market-basket
    # lift, seasonal anomalies, and lead-lag cross-correlation
    "events_series_dtw_topk",
    "orders_basket_lift",
    "events_dow_anomalies_by_type",
    "events_series_crosscorr",
    # round-14 flagships: the fleet-curve matrix profile (motif/discord
    # primitive; bounded-pair math after one day-keyed agg), the
    # now-oracle-backed LTTB downsampler, and the Mann-Kendall trend
    # significance test beside Theil-Sen's slope
    "events_matrix_profile",
    "events_lttb_downsample",
    "stat_mann_kendall",
    # round-14: the incremental near-dup probe and the re-celled IVF
    # (its fixed-cell predecessor collapsed at the 100x probe; the
    # bench row guards the adaptive version's constant stays sane)
    "dedup_near_incremental",
    "sim_ann_ivf",
    "orders_croston_demand",
    # round-15 flagships: the composed FAISS-shaped IVFPQ (codes-only
    # scan, exact rerank of the ADC shortlist)
    "sim_ann_ivfpq",
    # round-15: the near-dup decontamination tier (eval bands broadcast
    # against the maintained training band index)
    "decontaminate_near_lsh",
    # round-15: the persisted IVFPQ lake index (serving path: saved
    # centroids/postings, no rebuild), the AQP estimate with CLT error
    # bars, the EOQ/safety-stock inventory policy layer, join-free
    # multi-touch attribution, FD profiling, and the rolling OLS trend
    "sim_ann_index_lake",
    # round-16 (r15 verdict ask #1): the index BUILD half as its own
    # timed row — sim_ann_index_lake's row is the serving path only,
    # this one rebuilds from the parquet inputs every invocation
    "sim_ann_index_build",
    "sample_estimate_ci",
    "orders_eoq_safety_stock",
    "events_attribution_multi_touch",
    "dq_functional_dependencies",
    "events_rolling_slope",
]


def _calibrate(queries_now: dict[str, float], reps: int, sf_dir: str) -> dict:
    """Replay the PREVIOUS round's committed tree from a git worktree on
    this box, in this same process lifetime, and report the box-drift
    ratio.  Rounds 10 and 11 both burned diagnosis time hand-replaying
    the prior commit to separate real regressions from host drift (the
    box has measured 1.37× slower than at a prior recording —
    SCALING.md "Round-11 bench A/B"); this automates that instrument.

    The prior recording is ``git show <commit>:BENCH_SUMMARY.json`` at
    the latest driver artifact commit (the commit that ADDED the
    newest ``BENCH_r{N}.json`` — the driver writes BENCH_SUMMARY in
    the same run it records).  The replay runs the common headline
    subset via the worktree's own bench.py with the same rep count.

    ``calibration_ratio`` = (prev tree replayed now) / (prev tree as
    recorded): >1 means the box is slower than at recording time, so a
    same-factor rise in THIS round's numbers is host drift, not a
    regression."""
    import glob as _glob
    import re
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        # only plain BENCH_r{N}.json count as round recordings — the
        # driver also writes variants like BENCH_r15_c8.json (the
        # low-core leg), which must not crash the round scan
        matches = [
            re.search(r"BENCH_r(\d+)\.json$", p)
            for p in _glob.glob(os.path.join(repo, "BENCH_r*.json"))
        ]
        rounds = sorted(int(m.group(1)) for m in matches if m)
        if not rounds:
            return {"skipped": "no prior BENCH_r*.json"}
        prev_n = rounds[-1]
        commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--diff-filter=A",
             "--", f"BENCH_r{prev_n}.json"],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not commit:
            # BENCH_r{N}.json exists on disk but was never committed (the
            # driver writes it after the builder's last commit): there is
            # no prior tree to replay.  The r15 c8 leg crashed here with
            # `git worktree add … ''` — guard instead of erroring.
            return {"skipped": f"BENCH_r{prev_n}.json has no adding commit"}
        prev = json.loads(
            subprocess.run(
                ["git", "show", f"{commit}:BENCH_SUMMARY.json"],
                cwd=repo, capture_output=True, text=True, check=True,
            ).stdout
        )
        common = [n for n in queries_now if n in prev.get("queries", {})]
        if not common:
            return {"skipped": f"no common queries with round {prev_n}"}
        wt = tempfile.mkdtemp(prefix="bench_calib_")
        subprocess.run(
            ["git", "worktree", "add", "--detach", "--force", wt, commit],
            cwd=repo, capture_output=True, text=True, check=True,
        )
        try:
            env = {
                **os.environ,
                "SPARK_GRAFT_BENCH_QUERIES": ",".join(common),
                "SPARK_GRAFT_BENCH_REPS": str(reps),
                "SPARK_GRAFT_BENCH_CALIBRATE": "0",  # no recursion
                "SPARK_GRAFT_SF_DIR": sf_dir,
            }
            out = subprocess.run(
                [sys.executable, os.path.join(wt, "bench.py")],
                cwd=wt, env=env, capture_output=True, text=True, timeout=2700,
            )
            replay = json.loads(out.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo, capture_output=True, text=True,
            )
        prev_rec = sum(prev["queries"][n] for n in common)
        replay_now = sum(replay["queries"].get(n, 0.0) for n in common)
        return {
            "prev_round": prev_n,
            "prev_commit": commit[:12],
            "common_n": len(common),
            "prev_recorded_sec": round(prev_rec, 3),
            "prev_replay_sec": round(replay_now, 3),
            "calibration_ratio": round(replay_now / prev_rec, 4) if prev_rec else None,
        }
    except Exception as exc:  # noqa: BLE001 - calibration must never fail the bench
        return {"error": f"{type(exc).__name__}: {exc}"}


def _concurrent_sweep(
    spark,
    reg,
    headline: list[str],
    sf_dir: str,
    reps: int,
    workers: int,
    warmup: bool = True,
) -> dict:
    """Concurrency pilot (VERDICT r13 ask #6): run the whole headline
    set per rep through a thread pool sharing ONE session, and time the
    SWEEP WALL instead of per-query latencies.  The isolated protocol's
    total is Σ(min per query) — it charges every query its full
    scheduler+plan+action round-trip and leaves the cluster idle in
    every gap; a multi-tenant deployment overlaps those gaps, and
    local[32] has the same property (most headline queries cannot
    saturate 32 cores alone).  Caveats: per-query numbers under
    contention are meaningless (only the wall is reported), and the
    /tmp fixture caches must be warm (two threads cold-writing the
    same cache dir would race) — the warm-up pass below guarantees it.
    """
    from concurrent.futures import ThreadPoolExecutor

    names = [n for n in headline if reg.get(n) is not None]
    if warmup:
        for name in names:  # serial warm-up: fixture caches + plan cache
            reg[name].fn(spark, sf_dir).count()
    walls = []
    for _ in range(reps):
        release_persisted()
        spark.catalog.clearCache()
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(lambda n: reg[n].fn(spark, sf_dir).count(), names))
        walls.append(round(time.time() - t0, 3))
    return {
        "mode": "concurrent",
        "workers": workers,
        "n_queries": len(names),
        "sweep_walls_sec": sorted(walls),
        "sweep_wall_min_sec": min(walls),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Optional set override (comma-separated names): lets A/B experiments
    # time EXACTLY a prior round's set in the same session/conf — the
    # instrument for the r4→r6 "uniform regression" diagnosis.
    override = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    headline = [n.strip() for n in override.split(",") if n.strip()] if override else HEADLINE
    load_start = os.getloadavg()[0]  # before the JVM spins up 32 threads
    spark = get_spark("bench")
    reg = load_all()
    # warm the JVM + parquet footers with a trivial action, and the
    # Python worker pool with a tiny pandas-UDF pass (otherwise the
    # first Arrow-batched query pays the fork/startup cost)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    # Shared-box timing noise is ±2× on single runs (r2 verdict item 8):
    # run each query REPS times and report the min (the least-interfered
    # run — the real cost of the plan) plus the median for context.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # Measured per-query SESSION FLOOR (r12 verdict ask #5): every timed
    # query pays a fixed scheduler+plan+action round-trip that dominates
    # sub-0.5 s rows (several 10x probes read sub-1x for exactly this
    # reason).  Two floors, timed with the identical rep protocol, are
    # recorded in the summary so ratios can be read NET of them:
    # - floor_jvm_sec:   a minimal JVM-only action (range(1).count())
    # - floor_arrow_sec: a minimal Arrow-batched Python pass (the extra
    #   fixed cost any mapInPandas/applyInPandas query pays per action)
    def _floor(action) -> float:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            action()
            samples.append(time.time() - t0)
        return round(min(samples), 3)

    floor_jvm = _floor(lambda: spark.range(1).count())
    floor_arrow = _floor(
        lambda: spark.range(32).mapInPandas(lambda it: it, "id long").count()
    )
    # Opt-in concurrency pilot: SPARK_GRAFT_BENCH_MODE=concurrent runs
    # the sweep through a shared-session thread pool and prints ONLY the
    # pilot JSON (it is an experiment harness, not the driver protocol).
    if os.environ.get("SPARK_GRAFT_BENCH_MODE") == "concurrent":
        workers = int(os.environ.get("SPARK_GRAFT_BENCH_WORKERS", "8"))
        pilot = _concurrent_sweep(spark, reg, headline, sf_dir, reps, workers)
        pilot.update({"sf": sf_dir, "floor_jvm_sec": floor_jvm})
        spark.stop()
        print(json.dumps(pilot, separators=(",", ":")), flush=True)
        return
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in headline:
        q = reg.get(name)
        if q is None:
            continue
        samples = []
        for _ in range(reps):
            # drop persisted intermediates so every rep pays the full
            # cold-plan cost — min-of-N must measure the plan, not the
            # cache left by the previous rep
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            n = df.count()
            samples.append(round(time.time() - t0, 3))
        samples.sort()
        timings[name] = samples[0]
        medians[name] = samples[len(samples) // 2]
        print(f"# {name}: {n} rows, min {samples[0]:.2f}s of {samples}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # shared-box context: the r4->r6 "regression" turned out to be
        # host noise (SCALING.md round-7 diagnosis); record the pre-run
        # load so cross-round comparisons can be sanity-checked
        "load1_start": round(load_start, 2),
        # fixed per-action costs in THIS session (see _floor above):
        # read sub-second query rows net of these
        "floor_jvm_sec": floor_jvm,
        "floor_arrow_sec": floor_arrow,
    }
    # Permanent dual bench row (VERDICT r14 #6): the shared-session
    # 8-worker sweep wall beside the isolated total.  The isolated
    # protocol charges every query its full scheduler+plan round-trip
    # with the cluster idle in each gap; the concurrent wall is the
    # multi-tenant throughput face, and round-over-round drift in THIS
    # number is the regression signal the per-plan protocol cannot
    # see.  The isolated loop above already warmed every fixture cache
    # and plan, so the sweep skips its serial warm-up pass.  Opt out
    # with SPARK_GRAFT_BENCH_CONCURRENT=0.
    if os.environ.get("SPARK_GRAFT_BENCH_CONCURRENT", "1") != "0":
        workers = int(os.environ.get("SPARK_GRAFT_BENCH_WORKERS", "8"))
        sweep = _concurrent_sweep(
            spark, reg, headline, sf_dir, reps=1, workers=workers, warmup=False
        )
        summary["concurrent_x8_wall_sec"] = sweep["sweep_wall_min_sec"]
        summary["concurrent_workers"] = workers
    spark.stop()
    # Box-drift calibration: replay the previous round's tree (same box,
    # same session window) AFTER our own JVM is gone, so the two runs
    # don't contend.  Keyed LAST in the dict so the driver's tail-2000
    # capture of the stdout line keeps it even when the queries map is
    # truncated.  Opt out with SPARK_GRAFT_BENCH_CALIBRATE=0.
    if os.environ.get("SPARK_GRAFT_BENCH_CALIBRATE", "1") != "0":
        summary["calibration"] = _calibrate(timings, reps, sf_dir)
    # Full detail (incl. medians) goes to a file; the stdout summary line
    # stays compact and is printed LAST, after spark.stop(), so no JVM
    # shutdown chatter can follow it and the driver's tail capture can't
    # truncate it (BENCH_r04.json had "parsed": null for that reason).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SUMMARY.json"),
        "w",
    ) as fh:
        json.dump({**summary, "queries_median": medians}, fh)
    sys.stderr.flush()
    print(json.dumps(summary, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
