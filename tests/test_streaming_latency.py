"""Streaming per-(service, window) latency quantiles
(``streaming/latency_stream.py``) vs the batch t-digest.

The contract (VERDICT r12 ask #3): a two-trigger feed where EVERY
(service, window) group straddles the trigger boundary must yield
streamed quantiles that (a) sit inside the proven 2%-of-range band
around the exact numpy quantiles of the identical rows, and (b) agree
with the batch ``agg_tdigest_quantile`` over the same rows within the
same band — the state-store digest and the batch digest are the same
sketch, so neither face may drift from the other by more than twice
the accuracy contract.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pytest

from go_otel_clickhouse_ingestor_spark.operators import sketches as S

_WIN1 = ("2024-01-01 10:00:00", "2024-01-01 11:00:00")
_WIN2 = ("2024-01-01 11:00:00", "2024-01-01 12:00:00")


def _durations(seed: int, n: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return np.round(rs.lognormal(mean=10.0, sigma=1.0, size=n)).astype(np.int64)


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    """Run the quantile stream over three (service, window) groups,
    each split across two triggers, and return the emitted rows."""
    from go_otel_clickhouse_ingestor_spark.streaming.latency_stream import (
        latency_quantiles_stream,
    )

    groups = {
        ("api", _WIN1): _durations(3, 4000),
        ("db", _WIN1): _durations(5, 3000),
        ("api", _WIN2): _durations(7, 2500),
    }
    rows = []
    for (svc, (w0, _w1)), durs in groups.items():
        base = pd.Timestamp(w0)
        for i, d in enumerate(durs):
            # spread event times across the hour, deterministic
            ts = base + pd.Timedelta(seconds=int(i) % 3600)
            rows.append(
                {"service": svc, "dur_us": int(d), "ts": ts.isoformat(sep=" ")}
            )
    # a key fed ONLY null durations: state is created (n=0) and its
    # window closes, but the empty digest must be suppressed, not
    # emitted as NaN rows (ADVICE r13)
    for i in range(8):
        rows.append(
            {
                "service": "nullonly",
                "dur_us": None,
                "ts": (pd.Timestamp(_WIN1[0]) + pd.Timedelta(seconds=i)).isoformat(
                    sep=" "
                ),
            }
        )
    # interleave so every group straddles the trigger boundary
    batches = [rows[::2], rows[1::2]]
    # sentinels: push the watermark past every real window's end (the
    # sentinel window itself never closes and is excluded)
    batches.append(
        [{"service": "zz", "dur_us": 1, "ts": "2024-01-02 00:00:00"}]
    )
    batches.append(
        [{"service": "zz", "dur_us": 1, "ts": "2024-01-03 00:00:00"}]
    )
    d = tmp_path_factory.mktemp("latency_feed")
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("service string, dur_us long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"latq_{uuid.uuid4().hex[:8]}"
    q = (
        latency_quantiles_stream(stream, width="1 hour", delay="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = [r.asDict() for r in spark.table(name).collect()]
    return groups, out


@pytest.mark.slow
def test_stream_quantiles_within_band_of_exact(streamed):
    """Each closed (service, window) emits all probed quantiles within
    2% of the value range of the exact quantile over its own rows."""
    groups, out = streamed
    emitted = {}
    for r in out:
        key = (r["service"], r["win_start"].strftime("%Y-%m-%d %H:%M:%S"))
        emitted.setdefault(key, {})[r["q_ppm"]] = r
    # the FIRST sentinel's window closes (the second sentinel's
    # watermark passes it) — but the final sentinel window, which
    # nothing ever passes, must stay open and emit NOTHING
    assert ("zz", "2024-01-03 00:00:00") not in emitted, "open window emitted"
    # the all-null key's window DID close — emission must be suppressed
    assert not any(svc == "nullonly" for svc, _ in emitted), "empty digest emitted"
    for (svc, (w0, _w1)), durs in groups.items():
        got = emitted[(svc, w0)]
        assert set(got) == set(S._QS), (svc, w0)
        rng = float(durs.max() - durs.min())
        for q_ppm, r in got.items():
            exact = float(np.quantile(durs.astype(np.float64), q_ppm / 1e6))
            assert abs(r["estimate"] - exact) <= 0.02 * rng, (svc, w0, q_ppm)
            assert r["n"] == durs.size
            assert 0 < r["n_centroids"] <= 2 * S._DELTA


@pytest.mark.slow
def test_stream_quantiles_agree_with_batch_face(streamed, spark, tmp_path):
    """The streamed digest and the batch ``agg_tdigest_quantile`` over
    the SAME rows agree within twice the single-face accuracy band
    (each face is within 2%-of-range of exact, so their gap is ≤ 4%;
    measured gaps are far smaller — asserted at 2% since both digests
    see the identical multiset)."""
    groups, out = streamed
    durs = groups[("api", _WIN1)]
    d = tmp_path / "batch_sf"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": np.arange(durs.size, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01 10:00:00"),
            "user_id": np.zeros(durs.size, dtype=np.int64),
            "event_type": "span",
            "value": durs.astype(np.float64),
            "props": "{}",
        }
    ).to_parquet(d / "events.parquet")
    batch = {
        r["q_ppm"]: r["estimate"]
        for r in S.agg_tdigest_quantile(spark, str(d)).collect()
    }
    stream_rows = {
        r["q_ppm"]: r["estimate"]
        for r in out
        if r["service"] == "api"
        and r["win_start"].strftime("%Y-%m-%d %H:%M:%S") == _WIN1[0]
    }
    rng = float(durs.max() - durs.min())
    for q_ppm in S._QS:
        assert abs(stream_rows[q_ppm] - batch[q_ppm]) <= 0.02 * rng, q_ppm
