"""Streaming windowed funnel: per-user view → click → purchase depth,
finalized when the watermark passes the user's funnel horizon — the
online face of ``events_window_funnel`` (ClickHouse ``windowFunnel``
semantics: every later step within ``HORIZON`` of the FIRST step, each
strictly after the previous; users counted by the deepest step).

Why a buffered state machine instead of a fold: funnel progress is NOT
a monotone fold under out-of-order arrival.  A later-arriving EARLIER
view re-bases t1, which can both admit clicks that looked too early
and kill clicks that now fall past the (earlier-ending) horizon —
so any design that folds events into "current stage" as they arrive
silently diverges from the batch answer on reordered input.  Exact
semantics need the user's candidate step events kept until the funnel
window is closed, then one deterministic evaluation:

- **Key** = user_id.  **State** = (t1: min view time seen, plus the
  buffered click/purchase times still alive).  Events with
  ``ts > t1 + HORIZON`` are dead permanently (t1 only decreases, so
  the window end only moves earlier) and are pruned at every fold;
  events at or before t1 are retained because a still-earlier view
  may re-base t1 below them.  State is therefore bounded by one
  user's events within one funnel horizon — rate × horizon, never
  stream lifetime (the ``latency_stream`` bound argument).
- **Close** is an ``EventTimeTimeout`` armed just past
  max(t1 + HORIZON, current watermark): when the watermark passes it
  the buffer is evaluated exactly like the batch query's join chain
  (t2 = min click in (t1, t1+H]; depth 3 iff a purchase in (t2, t1+H])
  and the state is removed — one emission per funnel-started user,
  append semantics.  Users who never produce a ``view`` cannot start
  a funnel: their buffered steps age out on the same timeout and emit
  nothing, matching the batch query's s1 anchor.
- Same at-most-once caveat as the sibling stateful faces: Spark does
  not drop below-watermark rows for arbitrary stateful ops, so a
  straggler arriving after the close re-creates state and can emit a
  second row for the user; downstream dedup on user_id is idempotent
  because the re-evaluation sees only the straggler.

The multi-trigger pytest (tests/test_streaming_funnel.py) splits every
user's steps across trigger boundaries — including a user whose
re-basing earlier view arrives in a LATER batch — and pins the
streamed depth census equal to the batch ``events_window_funnel`` over
the identical rows.

Reference scope: the Go ingestor (711 LoC) generates exactly these
event shapes (internal/generator/generator.go:10's action set) and
never aggregates them; this is the engine-native online form of the
windowFunnel its ClickHouse sink dialect ships.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Funnel step window, microseconds (the batch query's 24 h).
HORIZON_US = 24 * 3600 * 1_000_000

#: One row per finalized funnel-started user.
FUNNEL_SCHEMA = "user_id long, t1_us long, depth long"

#: Per-user state: earliest view + still-alive later-step candidates.
_STATE_SCHEMA = "t1 long, clicks array<long>, purchases array<long>"

_STEPS = ("view", "click", "purchase")


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "t1_us": pd.Series(dtype="int64"),
            "depth": pd.Series(dtype="int64"),
        }
    )


def _depth(t1: int, clicks: list[int], purchases: list[int]) -> int:
    """The batch join chain evaluated on one user's buffer: exact."""
    end = t1 + HORIZON_US
    live_clicks = [c for c in clicks if t1 < c <= end]
    if not live_clicks:
        return 1
    t2 = min(live_clicks)
    if any(t2 < p <= end for p in purchases):
        return 3
    return 2


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        t1, clicks, purchases = state.get
        state.remove()
        if t1 is not None and int(t1) >= 0:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "t1_us": [int(t1)],
                    "depth": [_depth(int(t1), list(clicks), list(purchases))],
                }
            )
        else:
            yield _empty_out()
        return
    if state.exists:
        t1, clicks, purchases = state.get
        t1 = None if t1 is None or int(t1) < 0 else int(t1)
        clicks, purchases = list(clicks), list(purchases)
    else:
        t1, clicks, purchases = None, [], []
    for pdf in pdfs:
        if len(pdf) == 0:  # empty-batch guard (the stateful.py rule)
            continue
        for ts_us, etype in zip(
            pdf["ts_us"].astype("int64"), pdf["event_type"]
        ):
            ts_us = int(ts_us)
            if etype == "view":
                t1 = ts_us if t1 is None else min(t1, ts_us)
            elif etype == "click":
                clicks.append(ts_us)
            elif etype == "purchase":
                purchases.append(ts_us)
    wm = state.getCurrentWatermarkMs()
    if t1 is not None:
        # prune permanently-dead candidates: t1 only decreases, so the
        # horizon end only moves earlier — anything past it stays past
        end = t1 + HORIZON_US
        clicks = [c for c in clicks if c <= end]
        purchases = [p for p in purchases if p <= end]
        close_ms = end // 1_000 + 1
    else:
        # no view yet: steps at or before the watermark can never count
        # — any future on-time view has t1 >= wm, and depth needs
        # t1 < step strictly — so drop them; without this a chatty
        # view-less key re-arms its timeout every batch and its buffer
        # grows with stream lifetime instead of rate × horizon
        # (ADVICE r14).  The remainder ages out one horizon past the
        # watermark, silently (no funnel ever started).
        wm_us = wm * 1_000
        clicks = [c for c in clicks if c > wm_us]
        purchases = [p for p in purchases if p > wm_us]
        close_ms = wm + HORIZON_US // 1_000
    state.update((-1 if t1 is None else t1, clicks, purchases))
    state.setTimeoutTimestamp(max(close_ms, wm + 1))
    yield _empty_out()


def window_funnel_stream(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Per-user funnel depth over a stream shaped
    ``(user_id long, event_type string, ts timestamp)``.  Returns one
    ``FUNNEL_SCHEMA`` row per funnel-started user once the watermark
    closes the user's 24 h window, append-mode."""
    # No pre-state filter on event_type: a micro-batch whose rows were
    # ALL filtered out gives the stateful operator zero input, and
    # Spark then skips the whole state pass — armed timeouts never
    # fire and closed funnels never emit (observed: the timeout sweep
    # runs only when the operator receives ≥ 1 input row that batch).
    # Non-step rows are ignored inside the fold instead; a key created
    # only by non-step rows ages out silently on its cleanup timeout.
    keyed = events.withWatermark("ts", delay).select(
        "user_id",
        "event_type",
        "ts",  # the watermarked column must survive into the stateful op
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
