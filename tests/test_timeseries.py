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
