"""Streaming drift gates vs the batch twins.

The windowed drift faces (``streaming/drift_stream.py``) must
reproduce the batch ``dq_drift_ks`` / ``dq_drift_psi`` answers EXACTLY
when the current population arrives as a real two-trigger stream: the
reference plays the batch twins' first calendar half, the streamed
window plays the second, and the mergeable-counts contract says the
re-derived statistics are bit-identical (integer ppm for KS, 1e-6
rounded floats for PSI).  The feed discipline is
``test_streaming_spans.py``'s: file source, ``maxFilesPerTrigger=1``
so the window's counts are assembled across a genuine trigger
boundary, two sentinel batches to push the watermark past the window
close, sentinel rows excluded by window.
"""

from __future__ import annotations

import pytest

import json
import os
import uuid

from pyspark.sql import functions as F

#: One tumbling window wide enough to hold the whole fixture: epoch
#: alignment puts every 2024 event in the same 3650-day window while
#: the 2200-era sentinels land in a later one.
_WIDTH = "3650 days"


def _halves(spark, sf_dir):
    """Split events with the batch twins' exact boundary:
    2·unix_micros(ts) < min+max over the WHOLE table."""
    from go_otel_clickhouse_ingestor_spark.tables import table

    ev = table(spark, sf_dir, "events").select("ts", "value")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    tagged = ev.join(F.broadcast(b)).select(
        "ts",
        "value",
        (2 * F.unix_micros("ts") < F.col("t0") + F.col("t1")).alias("first"),
    )
    return tagged.filter("first").drop("first"), tagged.filter("NOT first").drop(
        "first"
    )


def _stream_window_bins(spark, second, tmp_path):
    """Feed the second half through drift_bins_windowed across two real
    triggers and return the closed window's bin grid as a batch frame."""
    from go_otel_clickhouse_ingestor_spark.streaming.drift_stream import (
        drift_bins_windowed,
    )

    rows = [
        {"value": r.value, "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f")}
        for r in second.collect()
    ]
    assert len(rows) >= 4
    cut = len(rows) // 2
    batches = [
        rows[:cut],
        rows[cut:],
        [{"value": 1.0, "ts": "2200-01-01 00:00:00.000000"}],
        [{"value": 1.0, "ts": "2200-01-02 00:00:00.000000"}],
    ]
    d = tmp_path / "drift_feed"
    d.mkdir()
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"drift_{uuid.uuid4().hex[:8]}"
    q = (
        drift_bins_windowed(stream, width=_WIDTH, delay="1 second")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.table(name).filter(F.year("win_start") < 2100)
    assert out.count() > 0, "watermark never closed the drift window"
    # exactly one real window: the whole 2024 fixture is inside it
    assert out.select("win_start").distinct().count() == 1
    return out


def test_windowed_bins_merge_to_batch_grid(spark, sf_dir, tmp_path):
    """The stateful half alone: per-window bin counts summed across the
    (single) window equal the batch second-half bin counts — the
    mergeable-counts contract."""
    from go_otel_clickhouse_ingestor_spark.streaming.drift_stream import (
        reference_bins,
    )

    first, second = _halves(spark, sf_dir)
    got = {
        (r.bin, r.n)
        for r in _stream_window_bins(spark, second, tmp_path).collect()
    }
    want = {
        (r.bin, r.n_ref) for r in reference_bins(second).collect()
    }
    assert got == want


@pytest.mark.slow
def test_streaming_ks_equals_batch(spark, sf_dir, tmp_path):
    """ks_vs_reference over the streamed window reproduces the batch
    dq_drift_ks row bit-for-bit (integer ppm, bin/total counts)."""
    from go_otel_clickhouse_ingestor_spark.operators.dataquality import (
        dq_drift_ks,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.drift_stream import (
        ks_vs_reference,
        reference_bins,
    )

    first, second = _halves(spark, sf_dir)
    cur = _stream_window_bins(spark, second, tmp_path)
    got = ks_vs_reference(cur, reference_bins(first)).collect()
    assert len(got) == 1
    g = got[0]
    want = dq_drift_ks(spark, sf_dir).collect()[0]
    assert (g.ks_ppm, g.n_bins, g.n_first, g.n_second) == (
        want.ks_ppm,
        want.n_bins,
        want.n_first,
        want.n_second,
    )


@pytest.mark.slow
def test_streaming_psi_equals_batch(spark, sf_dir, tmp_path):
    """psi_vs_reference over the streamed window reproduces the batch
    dq_drift_psi per-bin grid exactly (counts and 1e-6 rounded
    contributions)."""
    from go_otel_clickhouse_ingestor_spark.operators.dataquality import (
        dq_drift_psi,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.drift_stream import (
        psi_vs_reference,
        reference_bins,
    )

    first, second = _halves(spark, sf_dir)
    cur = _stream_window_bins(spark, second, tmp_path)
    got = {
        r.bin: (r.n1, r.n2, r.psi_contrib)
        for r in psi_vs_reference(cur, reference_bins(first)).collect()
    }
    want = {
        r.bin: (r.n1, r.n2, r.psi_contrib)
        for r in dq_drift_psi(spark, sf_dir).collect()
    }
    assert got == want
