"""Accuracy + mergeability contract for the t-digest sketch
(operators/sketches.py) — the guarantees the rows-only driver check
can't see."""

from __future__ import annotations

import numpy as np
import pytest

from go_otel_clickhouse_ingestor_spark.operators import sketches as S


@pytest.fixture(scope="module")
def values(duck):
    return (
        duck.execute("SELECT value FROM events WHERE value IS NOT NULL")
        .fetchdf()["value"]
        .to_numpy(dtype=np.float64)
    )


def test_tdigest_accuracy_vs_exact(spark, sf_dir, values):
    """Every probed quantile lands within 2% of the value RANGE of the
    exact quantile — the documented accuracy contract."""
    rows = {
        r["q_ppm"]: r
        for r in S.agg_tdigest_quantile(spark, sf_dir).collect()
    }
    rng = values.max() - values.min()
    assert rng > 0
    for q_ppm in S._QS:
        exact = float(np.quantile(values, q_ppm / 1e6))
        est = rows[q_ppm]["estimate"]
        assert abs(est - exact) <= 0.02 * rng, (
            f"q={q_ppm}ppm: est {est} vs exact {exact} (range {rng})"
        )
        assert rows[q_ppm]["n"] == values.size


def test_tdigest_centroid_count_bounded(spark, sf_dir):
    """The digest is BOUNDED: centroid count never exceeds ~2δ, no
    matter the input volume — the property that makes the partial
    state safe to shuffle."""
    for r in S.agg_tdigest_quantile(spark, sf_dir).collect():
        assert 0 < r["n_centroids"] <= 2 * S._DELTA


def test_tdigest_merge_invariance(values):
    """digest(A ⊎ B) ≈ merge(digest(A), digest(B)): re-compressing two
    partial digests answers quantiles within the same 2%-of-range band
    as one digest over the whole stream — the rollup-safety property
    (cross-day / cross-window merges rely on it)."""
    rng = values.max() - values.min()
    half = values.size // 2
    parts = []
    for chunk in (values[:half], values[half:]):
        m, w = S._compress(chunk, np.ones(chunk.size))
        parts.append((m, w))
    m, w = S._compress(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
    )
    whole_m, whole_w = S._compress(values, np.ones(values.size))
    assert w.sum() == values.size
    for q in (0.5, 0.9, 0.95, 0.99):
        merged = S._quantile(m, w, q)
        whole = S._quantile(whole_m, whole_w, q)
        exact = float(np.quantile(values, q))
        assert abs(merged - exact) <= 0.02 * rng
        assert abs(merged - whole) <= 0.02 * rng


def test_tdigest_weight_conservation():
    """Compression conserves total weight and stays inside the input
    hull (means are convex combinations)."""
    rs = np.random.RandomState(7)
    v = rs.lognormal(0.0, 1.5, size=20_000)
    m, w = S._compress(v, np.ones(v.size))
    assert np.isclose(w.sum(), v.size)
    assert v.min() <= m.min() and m.max() <= v.max()
    assert m.size <= 2 * S._DELTA


def test_theta_sketch_accuracy_on_large_domain(spark):
    """KMV estimates within 5·RSE (RSE = 1/√(K−2)) on sets big enough
    to be firmly in the estimation regime, including the θ-cut
    intersection."""
    n = 60_000
    a = spark.range(0, n).selectExpr("id as b")                 # [0, 60k)
    b = spark.range(n // 3, n + n // 3).selectExpr("id as b")   # overlap 2/3
    sk_a = S._kmv_collect(a, "b")
    sk_b = S._kmv_collect(b, "b")
    rse = 1.0 / (S._THETA_K - 2) ** 0.5
    assert abs(S.kmv_estimate(sk_a) - n) <= 5 * rse * n
    assert abs(S.kmv_estimate(sk_b) - n) <= 5 * rse * n
    u = S.kmv_estimate(S.kmv_union(sk_a, sk_b))
    assert abs(u - (n + n // 3)) <= 5 * rse * (n + n // 3)
    i = S.theta_intersect_estimate(sk_a, sk_b)
    # intersection RSE is worse than the unions' (fewer effective
    # samples below θ) — allow 8·RSE
    assert abs(i - (n - n // 3)) <= 8 * rse * n


def test_theta_sketch_merge_is_lossless(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) EXACTLY — the
    mergeability contract that makes per-partition / per-day sketches
    safe to roll up (hash sets are deterministic, so equality is
    list equality, not approximation)."""
    a = spark.range(0, 20_000).selectExpr("id as b")
    b = spark.range(10_000, 30_000).selectExpr("id as b")
    u = spark.range(0, 30_000).selectExpr("id as b")
    merged = S.kmv_union(S._kmv_collect(a, "b"), S._kmv_collect(b, "b"))
    direct = S._kmv_collect(u, "b")
    assert merged == direct


def test_theta_registry_query_exact_in_small_regime(spark, sf_dir):
    """At sf0.001 every set is smaller than K, so θ=1 and est == exact
    on every row — the sketch degrades to exact counting, which is the
    correct small-set behavior.  When SPARK_GRAFT_TEST_SF_DIR points
    the suite at a bigger fixture (sf0.01+) some sets enter the
    estimation regime (size ≥ K); those rows get the 8·RSE band
    instead of hard equality (ADVICE r12, low; band widened to match
    the enforced assertion — ADVICE r13, low)."""
    rse = 1.0 / (S._THETA_K - 2) ** 0.5
    for r in S.agg_theta_sketch_setops(spark, sf_dir).collect():
        if r.exact < S._THETA_K:
            assert r.est == r.exact, r
        else:
            # 8·RSE: set-op rows (θ-cut intersections/differences) have
            # fewer effective samples than plain unions, same allowance
            # as test_theta_sketch_accuracy_on_large_domain
            assert abs(r.est - r.exact) <= 8 * rse * r.exact, r
