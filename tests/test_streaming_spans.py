"""Streaming trace assembly vs the batch spans family.

The trace-timeout state machine (``streaming/spans_stream.py``) must
reproduce the batch span-tree queries ROW FOR ROW when every trace is
split across TWO micro-batch boundaries: the carried state (buffered
spans surviving the trigger boundary, the re-armed event-time timeout)
is what these tests pin.  Watermark mechanics drive the close: two
sentinel batches push the watermark past every real trace's timeout,
so all real traces emit exactly once; the sentinel trace itself never
closes and is excluded — which also pins that an OPEN trace emits
nothing.
"""

from __future__ import annotations

import pytest

import json
import os
import uuid

from pyspark.sql import functions as F

_BASE = "2024-01-01 00:00:00"
_GAP_MS = 60_000


def _assembled(spark, sf_dir, tmp_path):
    """Run the assembly stream over the sf span tree, every trace split
    across two triggers, and return the assembled rows (sentinel
    excluded) as a batch DataFrame."""
    from go_otel_clickhouse_ingestor_spark.operators.traces import _span_tree
    from go_otel_clickhouse_ingestor_spark.streaming.spans_stream import (
        trace_assembly_stream,
    )

    spans = _span_tree(spark, sf_dir).collect()
    assert len(spans) >= 8
    rows = [
        {
            "trace_id": r.user_id,
            "idx": r.idx,
            "service": r.service,
            "dur_us": r.dur_us,
            "ts": f"2024-01-01 00:00:{r.idx % 50:02d}",
        }
        for r in spans
    ]
    # split by heap index so EVERY multi-span trace straddles the
    # trigger boundary (not just half the traces)
    cut = max(r["idx"] for r in rows) // 2 or 1
    batches = [
        [r for r in rows if r["idx"] <= cut],
        [r for r in rows if r["idx"] > cut],
        [{"trace_id": -1, "idx": 1, "service": "s", "dur_us": 1,
          "ts": "2024-01-03 00:00:00"}],
        [{"trace_id": -1, "idx": 2, "service": "s", "dur_us": 1,
          "ts": "2024-01-04 00:00:00"}],
    ]
    d = tmp_path / "span_feed"
    d.mkdir()
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            "trace_id long, idx long, service string, dur_us long, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"spans_{uuid.uuid4().hex[:8]}"
    q = (
        trace_assembly_stream(stream, gap_ms=_GAP_MS)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.table(name).filter(F.col("trace_id") >= 0)
    assert out.count() > 0, "watermark never closed any trace"
    return out


@pytest.mark.slow
def test_assembly_stream_feeds_batch_twins(spark, sf_dir, tmp_path):
    from go_otel_clickhouse_ingestor_spark.operators.traces import (
        spans_exemplar_slow_traces,
        spans_self_time_rollup,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.spans_stream import (
        self_time_rollup,
        slow_trace_exemplars,
    )

    assembled = _assembled(spark, sf_dir, tmp_path).cache()

    # each trace emitted exactly once, fully assembled
    per_trace = assembled.groupBy("trace_id").agg(
        F.count(F.lit(1)).alias("n_rows"), F.max("n_spans").alias("n_spans")
    )
    bad = per_trace.filter(F.col("n_rows") != F.col("n_spans")).count()
    assert bad == 0

    # face 1: the per-service self-time grid
    want = {
        r.service: (r.n_spans, r.n_roots, r.total_dur_us, r.total_self_us,
                    r.max_depth)
        for r in spans_self_time_rollup(spark, sf_dir).collect()
    }
    got = {
        r.service: (r.n_spans, r.n_roots, r.total_dur_us, r.total_self_us,
                    r.max_depth)
        for r in self_time_rollup(assembled).collect()
    }
    assert got == want

    # face 2: the slow-trace exemplars (same top-20, same argmaxes)
    want_top = [
        (r.trace_id, r.root_service, r.slowest_service, r.n_spans,
         r.total_us, r.max_span_us)
        for r in sorted(
            spans_exemplar_slow_traces(spark, sf_dir).collect(),
            key=lambda r: r.rn,
        )
    ]
    got_top = [
        (r.trace_id, r.root_service, r.slowest_service, r.n_spans,
         r.total_us, r.max_span_us)
        for r in sorted(
            slow_trace_exemplars(assembled).collect(),
            key=lambda r: (-r.total_us, r.trace_id),
        )
    ]
    assert got_top == want_top


@pytest.mark.slow
def test_duplicate_delivery_dedups_on_idx(spark, tmp_path):
    """At-least-once re-delivery of the same span (same trace, same
    idx) must not double-count it into the parent's child subtraction
    — first delivery wins."""
    from go_otel_clickhouse_ingestor_spark.streaming.spans_stream import (
        trace_assembly_stream,
    )

    rows = [
        {"trace_id": 7, "idx": 1, "service": "a", "dur_us": 100,
         "ts": "2024-01-01 00:00:01"},
        {"trace_id": 7, "idx": 2, "service": "b", "dur_us": 30,
         "ts": "2024-01-01 00:00:02"},
    ]
    batches = [
        rows,
        [dict(rows[1], dur_us=999)],  # duplicate idx 2, different dur
        [{"trace_id": -1, "idx": 1, "service": "s", "dur_us": 1,
          "ts": "2024-01-03 00:00:00"}],
        [{"trace_id": -1, "idx": 2, "service": "s", "dur_us": 1,
          "ts": "2024-01-04 00:00:00"}],
    ]
    d = tmp_path / "dup_feed"
    d.mkdir()
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "trace_id long, idx long, service string, dur_us long, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"dup_{uuid.uuid4().hex[:8]}"
    q = (
        trace_assembly_stream(stream, gap_ms=_GAP_MS)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r.idx: (r.service, r.dur_us, r.self_us, r.depth, r.n_spans)
        for r in spark.table(name).filter(F.col("trace_id") == 7).collect()
    }
    assert got == {
        1: ("a", 100, 70, 0, 2),   # self = 100 - 30, NOT 100 - 999
        2: ("b", 30, 30, 1, 2),
    }


def test_apdex_windowed_merges_to_batch_grid(spark, sf_dir, tmp_path):
    """Summing apdex_windowed's per-window bucket counts over all
    windows and re-deriving the ppm index must reproduce the batch
    spans_apdex grid exactly (the mergeability contract) — with the
    span feed split across two triggers."""
    from go_otel_clickhouse_ingestor_spark.operators.traces import (
        _span_tree,
        spans_apdex,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.windows import (
        apdex_windowed,
    )

    spans = _span_tree(spark, sf_dir).collect()
    rows = [
        {
            "service": r.service,
            "dur_us": r.dur_us,
            # spread across two calendar days so >1 window exists
            "ts": f"2024-01-{1 + r.idx % 2:02d} 00:00:{r.idx % 50:02d}",
        }
        for r in spans
    ]
    half = len(rows) // 2
    d = tmp_path / "apdex_feed"
    d.mkdir()
    for i, batch in enumerate((rows[:half], rows[half:])):
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("service string, dur_us long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"apdex_{uuid.uuid4().hex[:8]}"
    q = (
        apdex_windowed(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got_counts: dict = {}
    n_windows = set()
    for r in spark.table(name).collect():
        n_windows.add(r.win_start)
        c = got_counts.setdefault(r.service, [0, 0, 0])
        c[0] += r.n_satisfied
        c[1] += r.n_tolerating
        c[2] += r.n_frustrated
    assert len(n_windows) >= 2, "feed produced only one window"
    got = {
        s: (
            sat + tol + fru,
            sat,
            tol,
            fru,
            (sat * 1_000_000 + tol * 500_000) // (sat + tol + fru),
        )
        for s, (sat, tol, fru) in got_counts.items()
    }
    want = {
        r.service: (
            r.n_spans,
            r.n_satisfied,
            r.n_tolerating,
            r.n_frustrated,
            r.apdex_ppm,
        )
        for r in spans_apdex(spark, sf_dir).collect()
    }
    assert got == want


@pytest.mark.slow
def test_streaming_tail_sampling_matches_batch(spark, sf_dir, tmp_path):
    """trace_totals_windowed + tail_sampling_decide over a real
    two-trigger feed of the fixture's flat span stream reproduces the
    batch spans_tail_sampling decision set EXACTLY — trace ids,
    mergeable totals, and policy attribution.  One session per trace
    (gap wider than the fixture's calendar), traces split across the
    trigger boundary, sentinels push the watermark past the close."""
    import json as _json
    import os as _os
    import uuid as _uuid

    from go_otel_clickhouse_ingestor_spark.operators.traces import (
        spans_tail_sampling,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.spans_stream import (
        tail_sampling_decide,
        trace_totals_windowed,
    )
    from go_otel_clickhouse_ingestor_spark.tables import table

    # flat span rows with their event times (the _span_flat shape plus
    # ts; the synthesis mirrors _span_flat's integer arithmetic —
    # spans_tail_sampling's oracle CTE pins that twin relationship)
    src = table(spark, sf_dir, "events")
    rows = [
        {
            "trace_id": r.user_id,
            "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "dur_us": int(abs(round(r.value * 1000))) * 1000,
            "is_error": 1 if (r.event_type == "error" and r.value > 300) else 0,
        }
        for r in src.select("user_id", "ts", "value", "event_type").collect()
    ]
    assert len(rows) >= 4
    cut = len(rows) // 2
    batches = [
        rows[:cut],
        rows[cut:],
        [{"trace_id": -1, "ts": "2200-01-01 00:00:00.000000",
          "dur_us": 0, "is_error": 0}],
        [{"trace_id": -2, "ts": "2200-01-02 00:00:00.000000",
          "dur_us": 0, "is_error": 0}],
    ]
    d = tmp_path / "tail_feed"
    d.mkdir()
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(_json.dumps(r) for r in batch))
        _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "trace_id long, ts timestamp, dur_us long, is_error long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"tail_{_uuid.uuid4().hex[:8]}"
    q = (
        trace_totals_windowed(stream, gap="3650 days", delay="1 second")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    closed = spark.table(name).filter(F.col("trace_id") >= 0)
    # one session per trace: the whole fixture sits inside one gap
    assert closed.count() == closed.select("trace_id").distinct().count()
    got = {
        (r.trace_id, r.n_spans, r.total_us, r.n_errors, r.policy)
        for r in tail_sampling_decide(closed).collect()
    }
    want = {
        (r.trace_id, r.n_spans, r.total_us, r.n_errors, r.policy)
        for r in spans_tail_sampling(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


@pytest.mark.slow
def test_red_metrics_windowed_merges_to_batch_grid(spark, sf_dir, tmp_path):
    """red_metrics_windowed over a real two-trigger feed, with a width
    that splits the fixture into MULTIPLE windows: summing every
    window's counts per (service, span_name) and re-deriving err_ppm
    reproduces the batch spans_red_metrics grid exactly — the
    mergeable-counts contract (cumulative le buckets merge by
    addition, which is why the OTel wire shape is cumulative)."""
    import json as _json
    import os as _os
    import uuid as _uuid

    from go_otel_clickhouse_ingestor_spark.operators.traces import (
        spans_red_metrics,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.windows import (
        red_metrics_windowed,
    )
    from go_otel_clickhouse_ingestor_spark.tables import table

    src = table(spark, sf_dir, "events")
    rows = [
        {
            "service": f"svc-{r.event_id % 5}",
            "span_name": r.event_type,
            "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "dur_us": int(abs(round(r.value * 1000))) * 1000,
            "is_error": 1 if (r.event_type == "error" and r.value > 300) else 0,
        }
        for r in src.select(
            "event_id", "user_id", "ts", "value", "event_type"
        ).collect()
    ]
    cut = len(rows) // 2
    batches = [
        rows[:cut],
        rows[cut:],
        [{"service": "zz", "span_name": "zz",
          "ts": "2200-01-01 00:00:00.000000", "dur_us": 0, "is_error": 0}],
        [{"service": "zz", "span_name": "zz",
          "ts": "2200-01-02 00:00:00.000000", "dur_us": 0, "is_error": 0}],
    ]
    d = tmp_path / "red_feed"
    d.mkdir()
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(_json.dumps(r) for r in batch))
        _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "service string, span_name string, ts timestamp, "
            "dur_us long, is_error long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"red_{_uuid.uuid4().hex[:8]}"
    q = (
        red_metrics_windowed(stream, width="30 days", delay="1 second")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.table(name).filter(F.col("service") != "zz")
    # the fixture's calendar must actually split across windows for the
    # merge step to be meaningful
    assert out.select("win_start").distinct().count() >= 2
    from go_otel_clickhouse_ingestor_spark.operators.traces import (
        _RED_BOUNDS_US,
    )

    bucket_cols = [f"le_{b // 1_000_000}s" for b in _RED_BOUNDS_US]
    merged = (
        out.groupBy("service", "span_name")
        .agg(
            F.sum("n_calls").cast("long").alias("n_calls"),
            F.sum("n_errors").cast("long").alias("n_errors"),
            F.sum("total_dur_us").cast("long").alias("total_dur_us"),
            *[F.sum(c).cast("long").alias(c) for c in bucket_cols],
        )
        .withColumn(
            "err_ppm",
            F.expr("n_errors * 1000000 div n_calls").cast("long"),
        )
    )
    cols = ["service", "span_name", "n_calls", "n_errors", "err_ppm",
            "total_dur_us", *bucket_cols]
    got = {tuple(r[c] for c in cols) for r in merged.collect()}
    want = {
        tuple(r[c] for c in cols)
        for r in spans_red_metrics(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0
