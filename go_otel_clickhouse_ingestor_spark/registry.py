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
#: queries with the least driver-anchored evidence.  Round 10 rotation:
#: the cumulative driver-green union of CORRECTNESS_r1–r9 is 338 names —
#: ALL of them are deleted from this list (the 50 round-9 window names
#: were removed at the top of round 10) so the window leads with the 18
#: queries that have never had a driver row: 2 oracle-backed round-9
#: additions (both pass the local differential in
#: tools/check_oracle.py) followed by 16 rows-only names (no DuckDB
#: oracle by design — sketches/ANN/clustering/codecs; the driver
#: records them running clean with stable row counts).  After this
#: window samples, every registered query has driver evidence; new
#: round-10 queries append behind the backlog via
#: :func:`driver_priority_append` and fill the remaining 32 slots.
#: ``tools/verify_round.py`` fails loudly if any name at the head of
#: this list is already green in a CORRECTNESS_r*.json.
_DRIVER_PRIORITY: list[str] = [
    # round-10 window part 1: the last 2 oracle-backed queries with no
    # driver row (displaced from round 9's exactly-full window)
    "emb_mutual_knn_graph", "events_p99_of_user_p95",
    # round-10 window part 1b: this round's oracle-backed additions
    # (hash evidence outranks rows-only slots — the ordering rule
    # test_registry enforces)
    "spans_self_time_rollup", "spans_service_dependency",
    "spans_critical_path", "fn_ip", "fn_geo_cell",
    "emb_binary_quantize_recall", "dq_freshness_completeness",
    "events_holt_winters", "pipeline_dataset_card",
    "graph_hits_scores", "stat_theil_sen_trend", "stat_cross_correlation",
    "fn_unit_format", "fn_uuid_deterministic", "dq_null_profile",
    "orders_herfindahl_concentration", "events_ab_srm_check",
    "orders_abc_xyz_matrix", "spans_exemplar_slow_traces",
    "text_dedup_line_level",
    # round-10 window part 2: the 16 rows-only names with no driver row
    "sim_ann_pq", "dedup_near_e2e",
    "dedup_semantic", "cluster_kmeans_assign", "emb_mmr_rerank",
    "emb_pca_top_component", "events_lttb_downsample", "multimodal_resize",
    "text_bpe_tokenize", "text_compression_ratio", "agg_hll_sketch_union",
    "text_bpe_train", "text_bpe_tokenize_trained",
    "multimodal_decode_codecs", "multimodal_resize_codecs",
    "multimodal_audio_features_codecs",
    # round-10 rows-only additions (real-BMP perceptual-hash dedup,
    # real-WAV energy VAD)
    "multimodal_phash_near_dup", "multimodal_wav_vad",
    # round-10 additions land here via driver_priority_append(), filling
    # the window's remaining 32 slots in registration order.
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
        traces,
        udfs,
        windows,
    )

    return _ordered(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
