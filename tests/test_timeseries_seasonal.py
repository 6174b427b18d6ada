"""Adversarial fixtures for events_dow_anomalies_by_type and
events_series_crosscorr, shipped with the operators (VERDICT r12
rule): each fixture is engineered against the query's sharpest
assumption — the 28-day window truncation, the dense zero-fill, the
lag-direction convention, and the constant-series exclusion."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from go_otel_clickhouse_ingestor_spark.operators import timeseries as T

_D0 = dt.date(2024, 5, 1)  # fixture calendar start


def _write_events(tmp_path, rows):
    d = tmp_path / "season_sf"
    d.mkdir()
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "events.parquet")
    return str(d)


def _expected_z(day_values: dict[dt.date, int]) -> dict[dt.date, float]:
    """Exact-integer recompute of the scaled-residual z — the same
    double-conversion points as both engines."""
    dow = {d: (d - dt.date(1970, 1, 5)).days % 7 for d in day_values}
    s_dow: dict[int, int] = {}
    for d, v in day_values.items():
        s_dow[dow[d]] = s_dow.get(dow[d], 0) + v
    r = {d: 4 * v - s_dow[dow[d]] for d, v in day_values.items()}
    n = len(r)
    s = sum(r.values())
    ss = sum(x * x for x in r.values())
    var = (float(ss) - float(s * s) / n) / (n - 1)
    return {d: round(x / var**0.5, 6) for d, x in r.items()}


def test_seasonal_window_truncation_and_zero_fill(spark, tmp_path):
    """35 days of data: a HUGE spike on day 2 (outside the last-28-day
    window) must be invisible; a planted in-window spike must rank
    rn=1; and one in-window day with NO events must enter its dow
    group as an explicit zero (shifting that group's norm)."""
    rows = []
    eid = 0
    spike_day = _D0 + dt.timedelta(days=20)      # inside the window
    quiet_day = _D0 + dt.timedelta(days=25)      # inside, no events
    old_spike = _D0 + dt.timedelta(days=1)       # outside the window
    for i in range(35):
        day = _D0 + dt.timedelta(days=i)
        if day == quiet_day:
            continue
        eid += 1
        value = 500.0 if day == old_spike else (
            10.0 if day == spike_day else 1.0
        )
        rows.append(
            (eid, pd.Timestamp(day) + pd.Timedelta(hours=12), 1, "click",
             value, "{}")
        )
    sf = _write_events(tmp_path, rows)
    out = sorted(
        T.events_dow_anomalies_by_type(spark, sf).collect(), key=lambda r: r.rn
    )
    # expected: last 28 days = d7..d34; centi-units; quiet day = 0
    window = [_D0 + dt.timedelta(days=i) for i in range(7, 35)]
    vals = {
        d: (0 if d == quiet_day else (1000 if d == spike_day else 100))
        for d in window
    }
    exp_z = _expected_z(vals)
    got_days = {
        dt.datetime.utcfromtimestamp(r.day_us / 1e6).date(): r for r in out
    }
    assert dt.date(2024, 5, 2) not in got_days, "out-of-window spike leaked"
    assert out[0].v_c == 1000  # the in-window spike ranks first
    top_day = dt.datetime.utcfromtimestamp(out[0].day_us / 1e6).date()
    assert top_day == spike_day
    for d, r in got_days.items():
        assert r.z == exp_z[d], d
    # the quiet day's explicit zero must be visible in the output set
    # (it is the second-strongest deviation in this fixture)
    assert quiet_day in got_days and got_days[quiet_day].v_c == 0


def test_crosscorr_lag_direction_and_constant_exclusion(spark, tmp_path):
    """type 'b' is type 'a' delayed by exactly 2 days, so the corr at
    lag = +2 (y at t+lag tracks x at t) must be exactly 1.0 — an
    off-by-sign lag convention would put the 1.0 at lag = -2.  A
    constant type 'c' must be excluded everywhere (zero variance)."""
    rows = []
    eid = 0
    for i in range(30):
        day = _D0 + dt.timedelta(days=i)
        va = 100.0 + (i * 37) % 50            # varying, deterministic
        vb = 100.0 + ((i - 2) * 37) % 50      # a delayed by 2 days
        for typ, v in (("a", va), ("b", vb), ("c", 5.0)):
            eid += 1
            rows.append(
                (eid, pd.Timestamp(day) + pd.Timedelta(hours=6), 1, typ, v, "{}")
            )
    sf = _write_events(tmp_path, rows)
    out = T.events_series_crosscorr(spark, sf).collect()
    assert {(r.type_a, r.type_b) for r in out} == {("a", "b")}, "constant not excluded"
    by_lag = {r.lag: r for r in out}
    assert by_lag[2].corr == 1.0, by_lag
    # no other lag may reach 1.0 (the delayed copy is unique)
    assert all(r.corr < 1.0 for lag, r in by_lag.items() if lag != 2)
    # overlap length shrinks by |lag|
    assert by_lag[2].n_days == T._SEASON_DAYS - 2
    assert by_lag[0].n_days == T._SEASON_DAYS


def test_seasonal_decompose_dense_spine_gap_day(spark, tmp_path):
    """events_seasonal_decompose (and the anomaly gate built on it)
    must treat a quiet calendar day as an explicit observed=0 row —
    grouping only PRESENT days silently stretched the 7-day trend
    window across the gap (the r12 znorm bug class).  Pinned against a
    full python recompute of trend/seasonal/residual with the same
    rounding points."""
    from go_otel_clickhouse_ingestor_spark.operators import analytics as A

    days = [_D0 + dt.timedelta(days=i) for i in range(10)]
    gap = _D0 + dt.timedelta(days=4)
    rows = []
    for i, day in enumerate(days):
        if day == gap:
            continue
        rows.append(
            (i + 1, pd.Timestamp(day) + pd.Timedelta(hours=9), 1, "click",
             float(10 + 3 * i), "{}")
        )
    sf = _write_events(tmp_path, rows)
    out = {r.day: r for r in A.events_seasonal_decompose(spark, sf).collect()}
    assert len(out) == 10, sorted(out)
    assert out[gap.isoformat()].observed == 0.0

    # python recompute with the identical formula + rounding points
    x = {d: (0 if d == gap else (10 + 3 * days.index(d)) * 100) for d in days}
    trend = {}
    for i, d in enumerate(days):
        win = days[max(0, i - 3) : i + 4]
        trend[d] = round(sum(x[w] for w in win) / len(win) / 100.0, 4)
    by_dow: dict[int, list] = {}
    for d in days:
        by_dow.setdefault(d.weekday(), []).append(x[d] / 100.0 - trend[d])
    seasonal = {
        d: round(sum(by_dow[d.weekday()]) / len(by_dow[d.weekday()]), 4)
        for d in days
    }
    for d in days:
        r = out[d.isoformat()]
        assert r.trend == trend[d], d
        assert r.seasonal == seasonal[d], d
        assert r.residual == round(x[d] / 100.0 - trend[d] - seasonal[d], 4), d


def test_dft_and_runs_dense_spine_gap_day(spark, tmp_path):
    """stat_dft_power's frequency bins assume UNIFORM sampling and
    stat_runs_test's moves assume consecutive calendar days — both now
    zero-fill quiet days.  The DFT is pinned against a decimal-exact
    python recompute over the DENSE calendar (15 samples including the
    gap), which a present-days-only index (14 samples, shifted t)
    cannot reproduce; the runs test must see the gap day's drop and
    recovery as two real moves."""
    import math
    from decimal import Decimal

    from go_otel_clickhouse_ingestor_spark.operators import analytics as A

    days = [_D0 + dt.timedelta(days=i) for i in range(15)]
    gap = days[7]
    rows = []
    for i, day in enumerate(days):
        if day == gap:
            continue
        v = 100.0 if i % 5 == 0 else 10.0 + i  # 5-day periodicity + drift
        rows.append(
            (i + 1, pd.Timestamp(day) + pd.Timedelta(hours=8), 1, "click", v, "{}")
        )
    sf = _write_events(tmp_path, rows)

    xs = [0 if d == gap else (10000 if days.index(d) % 5 == 0
          else int(round((10.0 + days.index(d)) * 100))) for d in days]
    n = len(xs)
    exp = {}
    for k in range(1, 9):
        sc = sum(
            (Decimal(str(round(math.cos(6.283185307179586 * k * t / n), 6))) * x)
            .quantize(Decimal("1.0000000000"))
            for t, x in enumerate(xs)
        )
        ss = sum(
            (Decimal(str(round(math.sin(6.283185307179586 * k * t / n), 6))) * x)
            .quantize(Decimal("1.0000000000"))
            for t, x in enumerate(xs)
        )
        exp[k] = round(
            (float(sc) * float(sc) + float(ss) * float(ss)) / (n * n * 10000.0), 4
        )
    got = {r.k: r.power for r in A.stat_dft_power(spark, sf).collect()}
    assert got == exp

    r = A.stat_runs_test(spark, sf).collect()[0]
    # dense series has 14 moves (no ties in this fixture); the gap
    # day's plunge-to-zero and recovery are real sign changes
    assert r.n_moves == 14
    assert r.n_up + r.n_down == 14


def test_cusum_and_autocorr_dense_spine_gap_day(spark, tmp_path):
    """events_changepoint_cusum must chart the gap day as a real
    zero-revenue sample (one row per CALENDAR day); stat_autocorr_lag
    must keep every calendar pair — n = span − lag exactly, where
    present-days-only would silently drop two samples per lag."""
    from go_otel_clickhouse_ingestor_spark.operators import analytics as A

    days = [_D0 + dt.timedelta(days=i) for i in range(12)]
    gap = days[5]
    rows = [
        (i + 1, pd.Timestamp(day) + pd.Timedelta(hours=10), 1, "click",
         float(20 + 7 * i), "{}")
        for i, day in enumerate(days)
        if day != gap
    ]
    sf = _write_events(tmp_path, rows)

    cus = {r.day: r for r in A.events_changepoint_cusum(spark, sf).collect()}
    assert len(cus) == 12
    assert cus[gap.isoformat()].daily_value == 0.0

    ac = {r.lag_k: r.n for r in A.stat_autocorr_lag(spark, sf).collect()}
    assert ac == {1: 11, 7: 5}


def test_holt_dense_spine_gap_day(spark, tmp_path):
    """events_forecast_holt must smooth THROUGH a quiet day as a real
    zero sample: n_days = calendar span, and the final state equals a
    python recompute of the recurrence over the dense series (a
    present-days fold would skip the zero and land on a different
    level/trend)."""
    from go_otel_clickhouse_ingestor_spark.operators import analytics as A

    days = [_D0 + dt.timedelta(days=i) for i in range(9)]
    gap = days[4]
    rows = [
        (i + 1, pd.Timestamp(day) + pd.Timedelta(hours=11), 1, "click",
         float(50 + 11 * i), "{}")
        for i, day in enumerate(days)
        if day != gap
    ]
    sf = _write_events(tmp_path, rows)
    out = {r.event_type: r for r in A.events_forecast_holt(spark, sf).collect()}
    r = out["click"]
    assert r.n_days == 9
    xs = [0.0 if d == gap else float(50 + 11 * days.index(d)) for d in days]
    l, b = xs[0], 0.0
    for x in xs[1:]:
        l_new = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    assert r.level == round(l, 6)
    assert r.trend == round(b, 6)
    assert r.forecast_next == round(l + b, 6)


def test_peak_and_lttb_dense_spine_gap_day(spark, tmp_path):
    """events_peak_detection: a busy day flanked by QUIET days is a
    true local peak — present-days-only neighbors used to compare it
    against far-away busy days and suppress it.  events_lttb_downsample:
    the dense series length (calendar span) is what the bucketer sees,
    and the endpoint t-index spans the full calendar."""
    from go_otel_clickhouse_ingestor_spark.operators import analytics as A

    days = [_D0 + dt.timedelta(days=i) for i in range(12)]
    # busy plateau everywhere except: gaps at days 5 and 7 flanking a
    # moderate day 6 — day 6 (50.0) is a TRUE local peak between two
    # zero days even though the plateau (100.0) dwarfs it
    gaps = {days[5], days[7]}
    rows = []
    for i, day in enumerate(days):
        if day in gaps:
            continue
        v = 50.0 if i == 6 else 100.0
        rows.append(
            (i + 1, pd.Timestamp(day) + pd.Timedelta(hours=13), 1, "click", v, "{}")
        )
    sf = _write_events(tmp_path, rows)
    peaks = {r.day for r in A.events_peak_detection(spark, sf).collect()}
    assert days[6].isoformat() in peaks, peaks

    out = sorted(
        A.events_lttb_downsample(spark, sf).collect(), key=lambda r: r.rank
    )
    # endpoints pinned to the first and last CALENDAR day
    t0 = (days[0] - dt.date(2020, 1, 1)).days
    t1 = (days[-1] - dt.date(2020, 1, 1)).days
    assert out[0].day_index == t0 and out[-1].day_index == t1
    # the gap days are real candidate points now; with n_out >= series
    # length the output is the full dense series including both zeros
    zeros = [r for r in out if r.total_value == 0.0]
    assert len(zeros) == 2
