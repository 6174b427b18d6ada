"""Streaming windowed funnel (``streaming/funnel_stream.py``) vs the
batch ``events_window_funnel`` over the identical rows.

The contract: a multi-trigger feed where every user's steps straddle
trigger boundaries — including a user whose funnel-anchoring view
arrives in a LATER batch than a step it re-bases — must yield a
streamed per-user depth census equal to the batch query's join-chain
answer.  That re-basing user is the reason the operator buffers
instead of folding: a "current stage" fold would have discarded the
click that the earlier view retroactively admits.
"""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd
import pytest

from go_otel_clickhouse_ingestor_spark.operators.analytics import (
    events_window_funnel,
)

_T0 = pd.Timestamp("2024-04-01 00:00:00")


def _rows():
    h = pd.Timedelta(hours=1)

    def r(uid, etype, hours):
        return {
            "user_id": uid,
            "event_type": etype,
            "ts": (_T0 + hours * h).isoformat(sep=" "),
        }

    return [
        # u1: full funnel inside the window, steps split across triggers
        r(1, "view", 0), r(1, "click", 2), r(1, "purchase", 5),
        # u2: click only past the 24 h horizon -> depth 1
        r(2, "view", 0), r(2, "click", 25),
        # u3: purchase BEFORE the first valid click -> depth 2
        r(3, "view", 0), r(3, "purchase", 1), r(3, "click", 3),
        # u4: the re-basing case — the click arrives before any view in
        # event time order below, and the ANCHORING view (hour 0) is
        # deliberately placed in a later trigger by the interleave:
        # with t1 re-based to hour 0 the click at hour 1 is admissible
        r(4, "click", 1), r(4, "view", 2), r(4, "view", 0),
        # u5: never views -> no funnel, no emission
        r(5, "click", 1), r(5, "purchase", 2),
        # u6: click exactly at the horizon boundary (t1 + 24 h) counts
        r(6, "view", 0), r(6, "click", 24),
    ]


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    from go_otel_clickhouse_ingestor_spark.streaming.funnel_stream import (
        window_funnel_stream,
    )

    rows = _rows()
    # interleave so every user straddles the trigger boundary; u4's
    # hour-0 view lands in the SECOND batch by construction
    batches = [rows[::2], rows[1::2]]
    # sentinels: a non-step type advances the watermark past every
    # user's t1 + 24 h without touching funnel state
    batches.append(
        [{"user_id": 99, "event_type": "noise", "ts": "2024-04-05 00:00:00"}]
    )
    batches.append(
        [{"user_id": 99, "event_type": "noise", "ts": "2024-04-09 00:00:00"}]
    )
    d = tmp_path_factory.mktemp("funnel_feed")
    for i, batch in enumerate(batches):
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(x) for x in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        window_funnel_stream(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return {r.user_id: r.asDict() for r in spark.table(name).collect()}


@pytest.mark.slow
def test_stream_funnel_depths_per_user(streamed):
    """Exact per-user depths, incl. the re-based and boundary cases."""
    got = {u: r["depth"] for u, r in streamed.items()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 2, 6: 2}, got
    # every t1 is the user's EARLIEST view, even when it arrived late
    t0us = int(_T0.value // 1_000)
    assert streamed[4]["t1_us"] == t0us
    assert streamed[1]["t1_us"] == t0us


@pytest.mark.slow
def test_stream_funnel_census_equals_batch_twin(streamed, spark, tmp_path):
    """The streamed depth census equals events_window_funnel over the
    same rows written as a batch events table."""
    rows = _rows()
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["event_id"] = range(1, len(pdf) + 1)
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    d = tmp_path / "funnel_sf"
    d.mkdir()
    pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]].to_parquet(
        d / "events.parquet"
    )
    batch = {
        r.depth: r.n_users
        for r in events_window_funnel(spark, str(d)).collect()
    }
    census: dict[int, int] = {}
    for r in streamed.values():
        census[r["depth"]] = census.get(r["depth"], 0) + 1
    assert census == batch, (census, batch)


class _FakeState:
    """Minimal GroupState stand-in for unit-driving _fold."""

    def __init__(self, value=None, wm_ms=0):
        self._v = value
        self._wm = wm_ms
        self.hasTimedOut = False
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True
        self._v = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def test_viewless_key_state_is_pruned_below_watermark():
    """A chatty key that never produces a 'view' must not grow state
    without bound: buffered clicks/purchases at or before the
    watermark can never satisfy t1 < step for any future on-time view,
    so each fold drops them (ADVICE r14 — before the fix the buffer
    grew with stream lifetime because pruning only ran once t1 was
    set, while the timeout was re-armed every batch)."""
    from go_otel_clickhouse_ingestor_spark.streaming.funnel_stream import _fold

    wm_ms = 10_000_000  # watermark at 10,000 s
    wm_us = wm_ms * 1_000
    state = _FakeState(
        value=(-1, [wm_us - 5, wm_us - 1, wm_us], [wm_us - 2]), wm_ms=wm_ms
    )
    batch = pd.DataFrame(
        {
            # one more below-watermark straggler, one live click
            "ts_us": [wm_us - 3, wm_us + 7],
            "event_type": ["purchase", "click"],
        }
    )
    list(_fold((99,), iter([batch]), state))
    t1, clicks, purchases = state._v
    assert t1 == -1
    assert list(clicks) == [wm_us + 7], clicks
    assert list(purchases) == [], purchases

    # and a key WITH a view keeps its in-horizon buffer untouched
    from go_otel_clickhouse_ingestor_spark.streaming.funnel_stream import (
        HORIZON_US,
    )

    t1_us = wm_us - 100
    state2 = _FakeState(value=(t1_us, [t1_us + 50], []), wm_ms=wm_ms)
    list(_fold((7,), iter([pd.DataFrame({"ts_us": [t1_us + HORIZON_US + 1], "event_type": ["click"]})]), state2))
    _, clicks2, _ = state2._v
    assert list(clicks2) == [t1_us + 50], clicks2
