"""Streaming trace assembly — the online face of the spans family.

The reference EMITS spans about itself (A15,
``internal/tracing/tracing.go``) but never assembles them; every
tracing backend that stores its output runs exactly this operator
online: spans of one trace arrive interleaved across micro-batches,
are buffered per trace key in the state store, and the trace is
CLOSED — assembled, enriched (self-time, depth), emitted downstream,
state dropped — when no span has arrived for a trace-timeout, driven
by the event-time watermark.  The batch twins live in
``operators/traces.py`` (``spans_self_time_rollup``,
``spans_exemplar_slow_traces``); the two-batch equivalence test
(``tests/test_streaming_spans.py``) pins that a trace split across
micro-batch boundaries assembles to byte-identical rows.

Design (the ``streaming/windows.py`` discipline):

- **State** is per-trace parallel arrays (idx, dur_us, service) plus
  the max event-time seen — bounded by the per-trace span count,
  which is session-bounded (the ``operators/traces.py`` scale note),
  NOT traffic-sized; the state store partitions by trace key exactly
  like any keyed agg.
- **Trace timeout** is an ``EventTimeTimeout``: each batch re-arms
  the timeout at (max span event-time in the trace + gap); when the
  watermark passes it, the trace is assembled and emitted ONCE
  (append-like), and the state is removed — abandoned traces cannot
  grow the store.
- **Assembly** computes, per span, the heap-layout tree enrichment of
  the batch twin: ``depth = bit_length(idx) - 1`` (closed form, no
  recursive traversal), ``self_us = max(0, dur - Σ direct children)``
  with the same clamp.  Duplicate (at-least-once) span deliveries
  dedup on idx, keeping the first — re-delivery cannot double-count
  a child into its parent's subtraction.
- **Downstream aggregations** (the service rollup grid, the
  slow-trace exemplars) are ordinary stateless expressions over the
  emitted assembled-span rows — chaining a second stateful agg after
  ``applyInPandasWithState`` inside ONE query is restricted by Spark
  (stateful-after-stateful needs append-mode watermark propagation
  this operator's output does not carry), so production composes via
  an intermediate sink (the lake / foreachBatch pattern used by
  ``cdc_stream.py``), and the helpers below give the exact
  expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Assembled-span output: one row per span of a CLOSED trace.
ASSEMBLED_SCHEMA = (
    "trace_id long, idx long, service string, dur_us long, "
    "self_us long, depth long, n_spans long"
)
#: Per-trace buffered state: parallel span arrays + max event-time ms.
_STATE_SCHEMA = (
    "idxs array<long>, durs array<long>, svcs array<string>, max_ts_ms long"
)

#: Default trace timeout: a trace with no new span for this long is
#: closed.  Tracing backends run 30 s – 5 min; the tests drive it
#: explicitly via the watermark, so the default only documents intent.
DEFAULT_TRACE_GAP_MS = 300_000


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "trace_id": pd.Series(dtype="int64"),
            "idx": pd.Series(dtype="int64"),
            "service": pd.Series(dtype="object"),
            "dur_us": pd.Series(dtype="int64"),
            "self_us": pd.Series(dtype="int64"),
            "depth": pd.Series(dtype="int64"),
            "n_spans": pd.Series(dtype="int64"),
        }
    )


def _assemble_trace(
    trace_id: int, idxs: list, durs: list, svcs: list
) -> pd.DataFrame:
    """Enrich one closed trace: dedup on idx (first delivery wins),
    direct-child duration sums, clamped self-time, closed-form depth."""
    seen: dict[int, tuple[int, str]] = {}
    for i, d, s in zip(idxs, durs, svcs):
        seen.setdefault(int(i), (int(d), s))
    child: dict[int, int] = {}
    for i, (d, _) in seen.items():
        if i > 1:
            child[i // 2] = child.get(i // 2, 0) + d
    n = len(seen)
    order = sorted(seen)
    return pd.DataFrame(
        {
            "trace_id": [trace_id] * n,
            "idx": order,
            "service": [seen[i][1] for i in order],
            "dur_us": [seen[i][0] for i in order],
            "self_us": [
                max(0, seen[i][0] - child.get(i, 0)) for i in order
            ],
            "depth": [i.bit_length() - 1 for i in order],
            "n_spans": [n] * n,
        }
    )


def _make_fold(gap_ms: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            idxs, durs, svcs, _ = state.get
            state.remove()
            yield _assemble_trace(int(key[0]), idxs, durs, svcs)
            return
        if state.exists:
            s_idxs, s_durs, s_svcs, max_ts = state.get
            idxs, durs, svcs = list(s_idxs), list(s_durs), list(s_svcs)
        else:
            idxs, durs, svcs, max_ts = [], [], [], 0
        for pdf in pdfs:
            if len(pdf) == 0:  # empty-batch guard (the stateful.py rule)
                continue
            idxs.extend(int(x) for x in pdf["idx"])
            durs.extend(int(x) for x in pdf["dur_us"])
            svcs.extend(str(x) for x in pdf["service"])
            batch_max = int(pdf["ts"].max().value // 1_000_000)
            max_ts = max(max_ts, batch_max)
        state.update((idxs, durs, svcs, max_ts))
        state.setTimeoutTimestamp(max_ts + gap_ms)
        yield _empty_out()

    return fold


def trace_assembly_stream(
    spans: DataFrame,
    gap_ms: int = DEFAULT_TRACE_GAP_MS,
    watermark_delay: str = "1 second",
) -> DataFrame:
    """Per-trace assembly with a trace-timeout watermark.

    ``spans``: a stream shaped
    ``(trace_id long, idx long, service string, dur_us long,
    ts timestamp)`` — the wire shape of the reference's self-emitted
    spans after ``source_otlp_spans_parse``.  Returns the assembled
    per-span rows (``ASSEMBLED_SCHEMA``) of every trace the watermark
    has closed: AT MOST ONCE PER CLOSED SESSION, not exactly once per
    trace — a span arriving after its trace's event-time timeout fired
    but still above the watermark re-creates state under the same
    trace_id and later emits a SECOND partial trace (standard
    session-window semantics; the r11 advisor called out the earlier
    'exactly once' overclaim).  Downstream re-aggregations that merge
    on trace_id (e.g. ``self_time_rollup``) must therefore either
    tolerate split traces (sum/count merge cleanly; avg-of-avgs does
    not) or read the assembled lake with a last-writer-wins upsert
    keyed on (trace_id, idx) — the idx-dedup already makes per-span
    rows safe to re-merge.
    """
    return (
        spans.withWatermark("ts", watermark_delay)
        .groupBy("trace_id")
        .applyInPandasWithState(
            _make_fold(gap_ms),
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def self_time_rollup(assembled: DataFrame) -> DataFrame:
    """The ``spans_self_time_rollup`` aggregation over assembled spans
    — identical expressions to the batch twin's final agg, a
    service-domain-bounded grid (stateless; run per micro-batch via
    foreachBatch or over the assembled lake table)."""
    return assembled.groupBy("service").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.when(F.col("idx") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_roots"),
        F.sum("dur_us").cast("long").alias("total_dur_us"),
        F.sum("self_us").cast("long").alias("total_self_us"),
        F.max("depth").alias("max_depth"),
    )


def slow_trace_exemplars(assembled: DataFrame, k: int = 20) -> DataFrame:
    """The ``spans_exemplar_slow_traces`` navigation layer over
    assembled spans: per-trace rollup + deterministic slowest-span
    argmax (duration desc, heap index asc), top-k by total time.
    TakeOrderedAndProject — the global sort never materializes."""
    per_trace = assembled.groupBy("trace_id").agg(
        F.max("n_spans").alias("n_spans"),
        F.sum("dur_us").cast("long").alias("total_us"),
        F.max("dur_us").cast("long").alias("max_span_us"),
        F.min(F.when(F.col("idx") == 1, F.col("service"))).alias(
            "root_service"
        ),
        F.min(
            F.struct(
                (-F.col("dur_us")).alias("neg_dur"),
                F.col("idx"),
                F.col("service"),
            )
        )["service"].alias("slowest_service"),
    )
    return (
        per_trace.orderBy(F.col("total_us").desc(), F.col("trace_id"))
        .limit(k)
        .select(
            "trace_id",
            "root_service",
            "slowest_service",
            "n_spans",
            "total_us",
            "max_span_us",
        )
    )


def trace_totals_windowed(
    spans: DataFrame, gap: str = "5 minutes", delay: str = "10 minutes"
) -> DataFrame:
    """Per-trace mergeable totals over SESSION windows — the stateful
    half of the streaming tail sampler.  Input is a flat span stream
    carrying ``(trace_id, ts, dur_us, is_error)`` (the
    ``operators/traces.py::_span_flat`` shape — what an OTLP receiver
    emits per span without waiting for tree assembly).

    A trace's session closes when no span has arrived for ``gap``
    (event time) — the tail sampler's trace-complete condition, the
    same one ``trace_assembly_stream`` expresses with an explicit
    state-store timeout; here it is a plain session-window agg because
    the DECISION only needs three mergeable counters per trace (count,
    Σ duration, Σ errors), never the span buffer.  State: one
    3-counter cell per OPEN trace, closed by the watermark — bounded
    by open-trace count, not traffic."""
    return (
        spans.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("win"), "trace_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("dur_us").cast("long").alias("total_us"),
            F.sum("is_error").cast("long").alias("n_errors"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "trace_id",
            "n_spans",
            "total_us",
            "n_errors",
        )
    )


def tail_sampling_decide(per_trace: DataFrame) -> DataFrame:
    """The stateless policy half of the streaming tail sampler: the
    IDENTICAL keep/drop + attribution expressions as the batch
    ``spans_tail_sampling`` query — literally the same
    ``tail_keep_condition``/``tail_policy_column`` helpers, so the two
    faces cannot drift (error ≻ latency ≻ deterministic prime-modulus
    probabilistic, reproducible across replicas without
    coordination), applied to closed per-trace totals.  Run it per
    micro-batch via foreachBatch, or over the lake table
    ``trace_totals_windowed`` sinks to — either way it touches only
    per-trace rows, never raw spans."""
    from ..operators.traces import tail_keep_condition, tail_policy_column

    kept = per_trace.filter(tail_keep_condition())
    return kept.withColumn("policy", tail_policy_column())
