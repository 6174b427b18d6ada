"""Property gates for the DTW refinement (operators/timeseries.py) —
the contracts the rows-only driver check can't see."""

from __future__ import annotations

import numpy as np

from go_otel_clickhouse_ingestor_spark.operators import timeseries as T


def _series(spark, sf_dir):
    """Aligned (z, zr) per user, collected once for the numpy twins."""
    from pyspark.sql import functions as F

    rows = (
        T._user_z(spark, sf_dir)
        .join(F.broadcast(T._ref_z(spark, sf_dir)), "day")
        .select("user_id", "day", "z", "zr")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.day, r.z, r.zr))
    out = {}
    for u, triples in by_user.items():
        triples.sort()
        out[u] = (
            np.array([t[1] for t in triples]),
            np.array([t[2] for t in triples]),
        )
    return out


def test_dtw_query_matches_numpy_twin(spark, sf_dir):
    """The registered applyInPandas kernel reproduces a driver-side
    numpy recomputation for EVERY user — both the banded DTW and the
    diagonal L1 column."""
    got = {
        r.user_id: (r.n_days, r.dtw, r.l1_diag)
        for r in T.events_series_dtw(spark, sf_dir).collect()
    }
    series = _series(spark, sf_dir)
    assert set(got) == set(series) and len(got) > 0
    for u, (a, b) in series.items():
        n, dtw, l1 = got[u]
        assert n == len(a) == len(b)
        assert dtw == round(T.dtw_band(a, b, T._DTW_BAND), 6)
        assert l1 == round(float(np.abs(a - b).sum()), 6)


def test_dtw_band_zero_is_diagonal_l1():
    """Sharp edge: W=0 confines the path to the diagonal, so the DP
    must equal Σ|a_i − b_i| EXACTLY (same float operations)."""
    rs = np.random.RandomState(3)
    a, b = rs.randn(60), rs.randn(60)
    assert T.dtw_band(a, b, 0) == float(np.abs(a - b).sum())


def test_dtw_monotone_in_band_and_bounded_by_l1():
    """A wider band only ADDS admissible warping paths, so the
    distance is monotonically non-increasing in W, and every banded
    DTW is ≤ the W=0 diagonal."""
    rs = np.random.RandomState(11)
    a, b = rs.randn(60), np.roll(rs.randn(60), 2)
    d = [T.dtw_band(a, b, w) for w in (0, 1, 3, 7)]
    assert d[0] >= d[1] >= d[2] >= d[3] >= 0.0


def test_dtw_aligns_phase_shift_euclidean_cannot():
    """The reason the refinement exists: for a pure 2-day phase shift
    of the same curve, DTW with band ≥ 2 nearly vanishes while the
    diagonal L1 stays large."""
    t = np.linspace(0, 6 * np.pi, 60)
    a = np.sin(t)
    b = np.roll(a, 2)
    l1 = float(np.abs(a - b).sum())
    dtw = T.dtw_band(a, b, 3)
    assert dtw < 0.25 * l1


def test_znorm_topk_is_scale_and_offset_invariant():
    """z-normalization's defining property, pinned on the kernel the
    query derives from: scaling/offsetting a series does not change
    its z-scores (up to rounding)."""
    rs = np.random.RandomState(5)
    v = rs.randn(30) * 7 + 100
    z1 = (v - v.mean()) / v.std(ddof=1)
    w = v * 31.0 - 4.5
    z2 = (w - w.mean()) / w.std(ddof=1)
    assert np.allclose(z1, z2)


def test_dtw_batch_kernel_equals_scalar():
    """dtw_band_batch row-for-row equals the scalar dtw_band — the
    vectorized production kernel and the reference kernel are the
    same function."""
    rs = np.random.RandomState(17)
    A = rs.randn(40, 30)
    B = rs.randn(40, 30)
    got = T.dtw_band_batch(A, B, T._DTW_BAND)
    for i in range(A.shape[0]):
        assert got[i] == T.dtw_band(A[i], B[i], T._DTW_BAND)


def test_dtw_ea_kernel_exact_or_provably_over_tau():
    """Early-abandoning kernel contract (VERDICT r13 ask #2): for any
    τ, completed series return EXACTLY the full kernel's distance;
    abandoned series (dtw=inf) provably exceed τ under the full
    kernel; rows_run counts abandonment honestly (== n iff completed);
    and a τ below every distance abandons everything at the grid's
    first rows while τ=inf degenerates to the full kernel."""
    rs = np.random.RandomState(29)
    A = rs.randn(60, 30)
    B = rs.randn(60, 30)
    full = T.dtw_band_batch(A, B, T._DTW_BAND)
    for q in (0.1, 0.5, 0.9):
        tau = float(np.quantile(full, q))
        got, rows_run = T.dtw_band_batch_ea(A, B, T._DTW_BAND, tau)
        fin = np.isfinite(got)
        assert np.array_equal(got[fin], full[fin]), q
        assert (full[~fin] > tau).all(), q
        assert (rows_run[fin] == A.shape[1]).all(), q
        assert (rows_run[~fin] < A.shape[1]).all(), q
        # everything at or below τ must complete (row-min ≤ dtw ≤ τ)
        assert fin[full <= tau].all(), q
    all_done, _ = T.dtw_band_batch_ea(A, B, T._DTW_BAND, float("inf"))
    assert np.array_equal(all_done, full)
    none_done, rr = T.dtw_band_batch_ea(A, B, T._DTW_BAND, -1.0)
    assert not np.isfinite(none_done).any() and (rr == 1).all()


def _lb_np(a, b, w):
    """Driver-side LB_Keogh twin: Σ max(a_i − max(env), min(env) − a_i, 0)
    over the ±w envelope of b."""
    n = len(a)
    s = 0.0
    for i in range(n):
        seg = b[max(0, i - w) : min(n - 1, i + w) + 1]
        s += max(a[i] - seg.max(), seg.min() - a[i], 0.0)
    return s


def test_dtw_bounds_sandwich_and_match_numpy(spark, sf_dir):
    """The relational bounds (a) reproduce their numpy twins per user
    and (b) sandwich the banded DTW — lb ≤ dtw ≤ ub, the admissibility
    property the pruned search's correctness rests on."""
    seqs = T._aligned_seqs(spark, sf_dir)
    got = {r.user_id: (r.lb, r.ub) for r in T._dtw_bounds(seqs).collect()}
    series = _series(spark, sf_dir)
    assert set(got) == set(series) and len(got) > 0
    for u, (a, b) in series.items():
        lb, ub = got[u]
        assert abs(lb - _lb_np(a, b, T._DTW_BAND)) < 1e-9, u
        assert abs(ub - float(np.abs(a - b).sum())) < 1e-9, u
        dtw = T.dtw_band(a, b, T._DTW_BAND)
        assert lb - 1e-9 <= dtw <= ub + 1e-9, u
        assert lb >= 0.0


def test_dtw_topk_equals_exhaustive_ranking(spark, sf_dir):
    """The pruned search returns EXACTLY the exhaustive DTW top-k —
    same users, same distances, same rank order."""
    exhaustive = sorted(
        ((r.dtw, r.user_id) for r in T.events_series_dtw(spark, sf_dir).collect())
    )[: T._DTW_TOPK]
    got = sorted(
        T.events_series_dtw_topk(spark, sf_dir).collect(), key=lambda r: r.rn
    )
    assert [(r.dtw, r.user_id) for r in got] == exhaustive
    assert [r.rn for r in got] == list(range(1, len(got) + 1))
    for r in got:
        assert r.lb <= r.dtw + 1e-6  # rounded lb still below the distance


def test_dtw_topk_survives_lb_dtw_rank_disagreement(spark, tmp_path, monkeypatch):
    """Adversarial fixture shipped WITH the operator (VERDICT r12 rule):
    a seeded random fleet where the LB_Keogh ordering DISAGREES with
    the true DTW ordering inside the top-k boundary — a search that
    trusted the bound as a ranking (instead of as a prune) would return
    the wrong set; the query must still equal the exhaustive top-k."""
    import pandas as pd

    rs = np.random.RandomState(23)
    n_users, n_days = 8, 14
    recs = []
    eid = 0
    for u in range(n_users):
        for d in range(n_days):
            eid += 1
            recs.append(
                (
                    eid,
                    pd.Timestamp("2024-03-01") + pd.Timedelta(days=d),
                    u,
                    "click",
                    float(abs(rs.randn()) * 50 + 1),
                    "{}",
                )
            )
    df = pd.DataFrame(
        recs,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "adv_sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")

    k = 3
    monkeypatch.setattr(T, "_DTW_TOPK", k)
    dtw_rank = sorted(
        (r.dtw, r.user_id) for r in T.events_series_dtw(spark, str(d)).collect()
    )
    lb_rank = sorted(
        (r.lb, r.user_id)
        for r in T._dtw_bounds(T._aligned_seqs(spark, str(d))).collect()
    )
    top_by_dtw = {u for _, u in dtw_rank[:k]}
    top_by_lb = {u for _, u in lb_rank[:k]}
    # the fixture genuinely creates the disagreement the test is about
    assert top_by_dtw != top_by_lb, (dtw_rank, lb_rank)
    got = sorted(
        T.events_series_dtw_topk(spark, str(d)).collect(), key=lambda r: r.rn
    )
    assert [(r.dtw, r.user_id) for r in got] == dtw_rank[:k]


def test_square_sums_exact_past_int64(spark, tmp_path):
    """ss = Σ v_c² runs as exact DECIMAL(38,0): a fleet whose daily
    centi-unit totals are ~4e9 pushes Σv² to ~4.8e19 — past the int64
    edge where the previous int64 square-sum wrapped SILENTLY with
    ansi off (ADVICE r12, medium) while the DuckDB oracle promoted to
    HUGEINT.  Pinned against an exact-integer recompute that converts
    to double at the same points both engines now do."""
    import pandas as pd

    d = tmp_path / "big_sf"
    d.mkdir()
    days = ["2024-05-01", "2024-05-02", "2024-05-03"]
    vals = [4.0e7, 4.4e7, 3.6e7]  # centi-units: 4e9 / 4.4e9 / 3.6e9 per day
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime([f"{dd} 10:00" for dd in days]),
            "user_id": [7, 7, 7],
            "event_type": ["click"] * 3,
            "value": vals,
            "props": ["{}"] * 3,
        }
    )
    rows.to_parquet(d / "events.parquet")
    v = [int(round(x * 100)) for x in vals]
    n, s = len(v), sum(v)
    ss = sum(x * x for x in v)  # python int: exact
    assert ss > 2**63 - 1  # the fixture genuinely crosses the int64 edge
    var = (float(ss) - float(s * s) / n) / (n - 1)
    mu = s / n
    exp = {dd: round((float(x) - mu) / var**0.5, 6) for dd, x in zip(days, v)}
    got = {r.day.isoformat(): r.zr for r in T._ref_z(spark, str(d)).collect()}
    assert got == exp
    # the single user IS the fleet here, so the user series must agree
    uz = {r.day.isoformat(): r.z for r in T._user_z(spark, str(d)).collect()}
    assert uz == exp


def test_dense_spine_includes_empty_calendar_days(spark, tmp_path):
    """A quiet calendar day must appear as an explicit zero in BOTH the
    user series and the fleet reference (the oracle sums over the
    zero-filled spine; grouping raw events by day would drop the day
    and shift every z-score) — pinned on a 3-day fixture whose middle
    day has no events."""
    import pandas as pd

    d = tmp_path / "gap_sf"
    d.mkdir()
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2024-05-01 10:00", "2024-05-01 11:00",
                 "2024-05-03 10:00", "2024-05-03 12:00"]
            ),
            "user_id": [7, 8, 7, 8],
            "event_type": ["click", "view", "click", "view"],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}"] * 4,
        }
    )
    rows.to_parquet(d / "events.parquet")
    ref = {r.day.isoformat(): r.zr for r in T._ref_z(spark, str(d)).collect()}
    assert set(ref) == {"2024-05-01", "2024-05-02", "2024-05-03"}
    # totals 300, 0, 700 (centi-units): the gap day is the minimum
    assert ref["2024-05-02"] == min(ref.values())
    uz = T._user_z(spark, str(d)).collect()
    per_user = {}
    for r in uz:
        per_user.setdefault(r.user_id, set()).add(r.day.isoformat())
    assert per_user == {
        7: {"2024-05-01", "2024-05-02", "2024-05-03"},
        8: {"2024-05-01", "2024-05-02", "2024-05-03"},
    }


def _mp_brute(v: np.ndarray, m: int, excl: int):
    """Brute-force z-normalized matrix profile twin (numpy, float64):
    same sufficient-statistic formula as both engines."""
    n = len(v)
    ps = list(range(n - m + 1))
    res = {}
    stats = {}
    for p in ps:
        w = v[p : p + m].astype(np.float64)
        sx = float(w.sum())
        sxx = float((w * w).sum())
        stats[p] = (sx, m * sxx - sx * sx)
    for p in ps:
        sxp, denp = stats[p]
        if denp <= 0:
            continue
        best = None
        for q in ps:
            sxq, denq = stats[q]
            if abs(p - q) < excl or denq <= 0:
                continue
            sxy = float((v[p : p + m] * v[q : q + m]).sum())
            corr = (m * sxy - sxp * sxq) / np.sqrt(denp * denq)
            d = float(np.sqrt(max(2.0 * m * (1.0 - corr), 0.0)))
            if best is None or (d, q) < best:
                best = (d, q)
        res[p] = best
    return res


def test_matrix_profile_motif_discord_and_numpy_twin(spark, tmp_path):
    """Planted fixture: weeks 0, 1 and 3 share an identical shape, so
    the week-aligned windows 0/7/21 are mutual nearest neighbors at
    profile ≈ 0 (motif); week 2 is a monotone ramp no other week
    resembles, so its aligned window (pos 14) carries the largest
    profile among the aligned windows (discord).  NOT asserted: that a
    spike week is the global discord — a single spike slides through
    m overlapping windows and makes them mutually similar one-hot
    shapes, the classic matrix-profile gotcha this fixture's smooth
    ramp avoids.  Every emitted row must equal the numpy brute-force
    twin's distance and neighbor choice."""
    import pandas as pd

    # 28 days: weeks 0..3; weeks 0, 1, 3 identical; week 2 a ramp
    base = [100, 120, 140, 130, 110, 90, 80]
    vals = base + base + [20, 60, 100, 140, 180, 220, 260] + base
    recs = []
    for d, v in enumerate(vals):
        recs.append(
            (
                d + 1,
                pd.Timestamp("2024-07-01") + pd.Timedelta(days=d),
                1,
                "click",
                float(v),
                "{}",
            )
        )
    df = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "mp_sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")

    got = {
        r.pos: (r.nn_pos, r.nn_dist)
        for r in T.events_matrix_profile(spark, str(d)).collect()
    }
    v = np.array([x * 100 for x in vals], dtype=np.float64)  # centi-units
    ref = _mp_brute(v, T._MP_M, T._MP_EXCL)
    assert set(got) == set(ref)
    for p, (dist, q) in ref.items():
        assert got[p][0] == q, (p, got[p], (q, dist))
        assert abs(got[p][1] - dist) < 1e-6, (p, got[p], (q, dist))
    # motif: the three identical week-aligned windows are each other's
    # nearest neighbors at ~0 (0's NN must be one of 7/21, etc.)
    assert got[0][0] in (7, 21) and got[0][1] < 1e-6
    assert got[7][0] in (0, 21) and got[7][1] < 1e-6
    assert got[21][0] in (0, 7) and got[21][1] < 1e-6
    # discord: the ramp week's aligned window has the largest profile
    # among the week-aligned windows
    assert got[14][1] > max(got[0][1], got[7][1], got[21][1])
    assert got[14][1] > 1.0


def test_mann_kendall_planted_trends(spark, tmp_path):
    """Planted fixture: a strictly increasing type (S = n(n-1)/2,
    trend 'up'), a strictly decreasing one ('down'), and an all-tied
    one (S = 0, var18 fully consumed by the tie term, 'no-trend') —
    each z hand-computed from the exact formula."""
    import math

    import pandas as pd

    from go_otel_clickhouse_ingestor_spark.operators.analytics import (
        stat_mann_kendall,
    )

    n = 12
    recs, eid = [], 0
    for d in range(n):
        for etype, v in (
            ("up", 10.0 + d),
            ("down", 50.0 - 2 * d),
            ("flat", 7.0),
        ):
            eid += 1
            recs.append(
                (
                    eid,
                    pd.Timestamp("2024-02-01") + pd.Timedelta(days=d),
                    1,
                    etype,
                    v,
                    "{}",
                )
            )
    df = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "mk_sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = {r.event_type: r.asDict() for r in stat_mann_kendall(spark, str(d)).collect()}

    s_max = n * (n - 1) // 2
    var18 = n * (n - 1) * (2 * n + 5)  # no ties in the monotone series
    z_up = (s_max - 1) / math.sqrt(var18 / 18.0)
    assert got["up"]["s_stat"] == s_max and got["up"]["trend"] == "up"
    assert abs(got["up"]["z"] - round(z_up, 6)) < 1e-9
    assert got["down"]["s_stat"] == -s_max and got["down"]["trend"] == "down"
    assert abs(got["down"]["z"] + round(z_up, 6)) < 1e-9
    # all-tied: one tie group of size n consumes the whole variance
    assert got["flat"]["s_stat"] == 0
    assert got["flat"]["var18"] == var18 - n * (n - 1) * (2 * n + 5) == 0
    assert got["flat"]["z"] == 0.0 and got["flat"]["trend"] == "no-trend"


def test_croston_planted_and_sequential_twin(spark, tmp_path):
    """Croston fold contract: a perfectly regular part (demand q every
    3 days) converges to z = q, p = 3, forecast = q/3 exactly; an
    irregular part must equal a sequential Python recomputation of the
    same α=0.5 recursion; single-demand-day parts are excluded."""
    import pandas as pd

    from go_otel_clickhouse_ingestor_spark.operators.analytics import (
        orders_croston_demand,
    )

    base = pd.Timestamp("1995-01-01")
    orders, lines = [], []
    ok = 0

    def add(pk, day, qty):
        nonlocal ok
        ok += 1
        orders.append((ok, base + pd.Timedelta(days=day)))
        lines.append((ok, pk, float(qty)))

    for i in range(12):  # part 1: regular, every 3 days, q=6
        add(1, 3 * i, 6)
    irregular = [(0, 4), (2, 9), (7, 1), (8, 12), (20, 3)]
    for d, q in irregular:  # part 2: irregular
        add(2, d, q)
    add(3, 5, 9)  # part 3: single demand day -> excluded

    d = tmp_path / "croston_sf"
    d.mkdir()
    odf = pd.DataFrame(orders, columns=["o_orderkey", "o_orderdate"])
    # microsecond precision: pandas defaults to nanos, which Spark's
    # vectorized parquet reader rejects (the tables.py sniff gotcha)
    odf["o_orderdate"] = odf["o_orderdate"].astype("datetime64[us]")
    odf.to_parquet(d / "orders.parquet")
    pd.DataFrame(lines, columns=["l_orderkey", "l_partkey", "l_quantity"]).to_parquet(
        d / "lineitem.parquet"
    )
    got = {r.partkey: r.asDict() for r in orders_croston_demand(spark, str(d)).collect()}

    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_demand_days"] == 12
    assert r1["demand_level"] == 6.0
    assert r1["mean_interval_days"] == 3.0
    assert r1["forecast_per_day"] == 2.0
    # sequential twin for the irregular part
    z, p, prev = float(irregular[0][1]), float(irregular[1][0] - irregular[0][0]), irregular[0][0]
    for day, q in irregular[1:]:
        z = 0.5 * q + 0.5 * z
        p = 0.5 * (day - prev) + 0.5 * p
        prev = day
    r2 = got[2]
    assert r2["n_demand_days"] == len(irregular)
    assert r2["demand_level"] == round(z, 6)
    assert r2["mean_interval_days"] == round(p, 6)
    assert r2["forecast_per_day"] == round(z / p, 6)
