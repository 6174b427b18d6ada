"""Streaming latency quantiles: a mergeable t-digest as a stateful
per-(window, service) aggregate — the APM-standard p50/p95/p99 monitor.

``spans_red_metrics`` (and its windowed streaming face) publish RATE
and ERRORS exactly plus DURATION as fixed cumulative histogram buckets
— quantiles at whatever resolution the bucket grid allows.  The
industry-standard duration panel interpolates quantiles from a
MERGEABLE sketch instead, and the engine already proves the sketch
half (``operators/sketches.py``: δ-bounded centroid lists, 2%-of-range
accuracy, merge invariance — pytest-gated).  This module is the
missing streaming face: fold per-trigger partial digests into the
state store per (service, window), emit interpolated quantiles once
when the watermark closes the window.

Design (the ``spans_stream.py`` state discipline):

- **Key** = (service, win_start, win_end): the window bounds are
  derived columns of the event time, so the state store partitions by
  exactly the grid the dashboard reads.
- **State** is ONE digest per key — ``(n, means[], weights[])``,
  δ-bounded (≤ ~2δ centroids) regardless of traffic, the property
  that makes the sketch safe to hold per open window.  Each trigger
  folds the batch's raw durations into the digest via the SAME
  ``_compress`` kernel the batch query uses; arrival order cannot
  change the accuracy contract because compression is
  multiset-deterministic (sorts by mean) and merge-invariant
  (tests/test_sketches.py::test_tdigest_merge_invariance).
- **Close** is an ``EventTimeTimeout`` armed at window end: when the
  watermark passes it, the digest interpolates q ∈ {.5, .9, .95, .99}
  (the batch ``_QS`` grid) and the state is removed — one emission per
  (service, window), append semantics, state bounded by open-window ×
  service count, never stream lifetime.

The two-trigger pytest (tests/test_streaming_latency.py) feeds every
(service, window) group across BOTH triggers and pins the streamed
estimates inside the SAME 2%-of-range band as the batch
``agg_tdigest_quantile`` contract, against exact numpy quantiles over
the identical rows.

Reference scope: the Go ingestor (711 LoC) emits span durations and
never aggregates them; this face is the engine-native
``quantileTDigest``-over-windows its downstream ClickHouse deployment
would run (internal/ingestion/clickhouse.go:109 feeds the traces
table such a panel reads).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _QS, _compress, _quantile

#: One row per probed quantile per closed (service, window).
QUANTILE_SCHEMA = (
    "service string, win_start timestamp, win_end timestamp, "
    "q_ppm long, estimate double, n long, n_centroids long"
)

#: Per-key digest state: value count + centroid arrays.
_STATE_SCHEMA = "n long, means array<double>, weights array<double>"


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "service": pd.Series(dtype="object"),
            "win_start": pd.Series(dtype="datetime64[us]"),
            "win_end": pd.Series(dtype="datetime64[us]"),
            "q_ppm": pd.Series(dtype="int64"),
            "estimate": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64"),
            "n_centroids": pd.Series(dtype="int64"),
        }
    )


def _emit(key: tuple, n: int, means: np.ndarray, weights: np.ndarray) -> pd.DataFrame:
    service, win_start, win_end = key
    return pd.DataFrame(
        {
            "service": [service] * len(_QS),
            "win_start": [win_start] * len(_QS),
            "win_end": [win_end] * len(_QS),
            "q_ppm": list(_QS),
            "estimate": [_quantile(means, weights, q / 1e6) for q in _QS],
            "n": [n] * len(_QS),
            "n_centroids": [int(means.size)] * len(_QS),
        }
    )


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        n, means, weights = state.get
        state.remove()
        # n == 0 means every row for this key had a null dur_us — the
        # digest is empty and the estimates would be NaN.  Suppress the
        # emission instead of publishing a meaningless grid row
        # (ADVICE r13, low).
        if int(n) > 0:
            yield _emit(key, int(n), np.asarray(means), np.asarray(weights))
        else:
            yield _empty_out()
        return
    if state.exists:
        n, s_means, s_weights = state.get
        means = np.asarray(s_means, dtype=np.float64)
        weights = np.asarray(s_weights, dtype=np.float64)
        n = int(n)
    else:
        n, means, weights = 0, np.empty(0), np.empty(0)
    for pdf in pdfs:
        if len(pdf) == 0:  # empty-batch guard (the stateful.py rule)
            continue
        v = pdf["dur_us"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            continue
        n += v.size
        means, weights = _compress(
            np.concatenate([means, v]), np.concatenate([weights, np.ones(v.size)])
        )
    state.update((n, means.tolist(), weights.tolist()))
    # close at window end: the watermark passing it means the window
    # is final.  Spark does NOT auto-drop below-watermark rows for
    # arbitrary stateful ops, so a trigger can deliver rows of a
    # window the watermark already passed — folding them is the right
    # call (the digest stays complete), but the timeout must then be
    # armed just past the CURRENT watermark (arming in the past is an
    # error); the next watermark advance closes the window.  Same
    # at-most-once-per-session caveat as trace_assembly_stream: rows
    # arriving after the close re-create state and emit a second
    # partial grid row — downstream merges re-compress digests of the
    # same (service, window) safely (merge invariance).
    win_end_ms = int(pd.Timestamp(key[2]).value // 1_000_000)
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(win_end_ms, wm + 1))
    yield _empty_out()


def latency_quantiles_stream(
    spans: DataFrame, width: str = "1 hour", delay: str = "10 minutes"
) -> DataFrame:
    """Per-(service, window) p50/p90/p95/p99 from a stateful mergeable
    t-digest.  ``spans``: a stream shaped
    ``(service string, dur_us long, ts timestamp)`` — the flat span
    shape the RED-metrics faces consume.  Returns one row per probed
    quantile per CLOSED window (``QUANTILE_SCHEMA``), append-mode."""
    keyed = spans.withWatermark("ts", delay).select(
        "service",
        "dur_us",
        "ts",
        F.window("ts", width).getField("start").alias("win_start"),
        F.window("ts", width).getField("end").alias("win_end"),
    )
    return keyed.groupBy("service", "win_start", "win_end").applyInPandasWithState(
        _fold,
        outputStructType=QUANTILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
