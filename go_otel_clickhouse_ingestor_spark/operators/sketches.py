"""Mergeable quantile sketch: a t-digest over the events value stream.

``agg_approx_quantile`` already exposes Spark's built-in
Greenwald-Khanna ``approx_percentile``; what that hides is the shape a
100 TB pipeline actually needs from a quantile sketch: a BOUNDED,
MERGEABLE partial state that map tasks emit and any later stage (or a
streaming window, or a cross-day rollup) can fold together without
touching raw data again.  That is Dunning's merging t-digest
(Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests", 2019): a centroid list whose size is bounded by the
compression δ regardless of input volume, merged by concatenating and
re-compressing — associative, commutative, and ~δ·16 bytes on the
wire.

Pipeline shape (the honest 100 TB plan):

- **partial**: ``mapInPandas`` folds each Arrow batch into one digest
  row ``(n, means[], weights[])`` — the shuffle carries one δ-bounded
  row per input partition, never values;
- **merge**: a single-group ``applyInPandas`` concatenates the ≤
  #partitions partial rows and re-compresses once — bounded input
  (partitions × δ centroids), the same fold a tree aggregation would
  do in log rounds if #partitions itself ever became large;
- **query**: quantiles interpolate between centroid midpoints.

No oracle: the sketch is approximate by construction (DuckDB has no
t-digest; its ``approx_quantile`` is a different estimator), so the
driver records a rows-only check and the accuracy contract lives in
pytest: |est − exact| ≤ 2% of the value range at every probed q, plus
the merge-invariance property (digest of concat == concat of digests
re-compressed) that makes the sketch safe to roll up.

Reference scope note: the reference ingestor (711 LoC Go) ships raw
rows with no aggregation; sketches are the downstream ClickHouse
deployment's territory (``quantileTDigest`` is ClickHouse's own
built-in t-digest — this module is the engine-native equivalent of
exactly that function).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

#: Compression: max k-units per centroid chain; centroid count is
#: bounded by ~2δ.  δ=100 gives ≲0.5% rank error at the tails —
#: ClickHouse's quantileTDigest default ballpark.
_DELTA = 100

#: Probed quantiles, in exact ppm so the output column is integral.
_QS = (500_000, 900_000, 950_000, 990_000)

_PARTIAL_SCHEMA = "n long, means array<double>, weights array<double>"


def _k1(q: float, delta: int = _DELTA) -> float:
    """The k1 scale function: δ·(asin(2q−1)/π + ½) — tail-biased
    centroid budget (centroids shrink toward q→0 and q→1, which is
    where quantile queries care)."""
    return delta * (math.asin(2.0 * q - 1.0) / math.pi + 0.5)


def _compress(means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge a (mean, weight) multiset into ≤ ~2δ centroids: sort by
    mean, then greedily fuse neighbors while the fused centroid spans
    ≤ 1 k-unit (the merging-digest invariant)."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    cum = 0.0  # weight strictly before the current centroid
    for m, w in zip(means[1:], weights[1:]):
        q0 = cum / total
        q2 = (cum + cur_w + w) / total
        if _k1(q2) - _k1(q0) <= 1.0:
            # fuse: weighted mean update keeps the centroid exact
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Midpoint-interpolated quantile over a compressed digest."""
    if means.size == 0:
        return float("nan")
    if means.size == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    # cumulative weight at each centroid's MIDPOINT
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    span = cum[i + 1] - cum[i]
    frac = (target - cum[i]) / span if span > 0 else 0.0
    return float(means[i] + frac * (means[i + 1] - means[i]))


def tdigest_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: fold ALL of one partition's batches into a
    single digest row — the partial state one map task contributes."""
    means = np.empty(0)
    weights = np.empty(0)
    n = 0
    for pdf in batches:
        v = pdf["v"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            continue
        n += v.size
        means, weights = _compress(
            np.concatenate([means, v]),
            np.concatenate([weights, np.ones(v.size)]),
        )
    if n:
        yield pd.DataFrame(
            {"n": [n], "means": [means.tolist()], "weights": [weights.tolist()]}
        )


def tdigest_merge_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas stage: concat ≤ #partitions partial digests,
    re-compress ONCE, emit the probed quantiles.  Input is bounded:
    partitions × ~2δ centroids."""
    means = np.concatenate([np.asarray(m) for m in pdf["means"]])
    weights = np.concatenate([np.asarray(w) for w in pdf["weights"]])
    means, weights = _compress(means, weights)
    n = int(pdf["n"].sum())
    return pd.DataFrame(
        {
            "q_ppm": list(_QS),
            "estimate": [_quantile(means, weights, q / 1e6) for q in _QS],
            "n": [n] * len(_QS),
            "n_centroids": [int(means.size)] * len(_QS),
        }
    )


@query("agg_tdigest_quantile")
def agg_tdigest_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution quantiles of the events value stream via a
    MERGEABLE t-digest — the sketch ClickHouse exposes as
    ``quantileTDigest`` and a 100 TB pipeline uses wherever a quantile
    must be rolled up across partitions/days/windows without a
    second pass over raw data.  Two Arrow stages: ``mapInPandas``
    emits ONE δ-bounded digest row per input partition (the shuffle
    never carries values), then a single-group ``applyInPandas``
    folds the ≤ #partitions partials and interpolates q ∈
    {.5, .9, .95, .99}.  The single merge task's input is bounded
    (#partitions × ~2δ centroids ≈ a few hundred rows — the same
    bounded-final-fold shape as agg_hll_sketch_union); if partition
    counts ever made it wide, the same merge composes as a tree.
    Rows-only by design: DuckDB has no t-digest (its approx_quantile
    is a different estimator) — the 2%-of-range accuracy contract and
    the merge-invariance property are pytest-gated instead
    (tests/test_sketches.py)."""
    ev = table(spark, sf_dir, "events").select(F.col("value").alias("v"))
    partials = ev.mapInPandas(tdigest_partial, schema=_PARTIAL_SCHEMA)
    # bounded: one group of <= #partitions digest rows (each <= ~2δ
    # centroids) — the final fold, never data-sized
    return partials.groupBy(F.lit(1).alias("g")).applyInPandas(
        tdigest_merge_quantiles,
        schema="q_ppm long, estimate double, n long, n_centroids long",
    )


#: KMV/theta sketch size: the K smallest hash values of a set.  RSE ≈
#: 1/√(K−2) ≈ 6.3% at K=256 — ClickHouse's uniqTheta ballpark at its
#: small end; the pytest gate uses 5·RSE.  K=256 keeps the fixture
#: sets (≈1k–100k distinct) firmly in the ESTIMATION regime at sf0.01+
#: while staying exact (θ=1 path) on tiny inputs.
_THETA_K = 256

#: Hash domain: xxhash64 folded into [0, 2^61) so the normalized value
#: h/2^61 is uniform in [0,1) with exact integer arithmetic until the
#: final division.
_THETA_DOM = 1 << 61


def _kmv_collect(df: DataFrame, col: str) -> list[int]:
    """The K smallest distinct hashes of ``df[col]`` — the KMV sketch,
    computed as a plain distinct + TakeOrdered(K): the scan is the
    only data-sized work, the result is K integers."""
    rows = (
        df.select(F.pmod(F.xxhash64(col), F.lit(_THETA_DOM)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(_THETA_K)
        .collect()  # bounded: K = _THETA_K rows of one long each
    )
    return [r["h"] for r in rows]


def kmv_union(*sketches: list[int]) -> list[int]:
    """Merge KMV sketches: union the hash sets, keep the K smallest —
    associative, commutative, lossless w.r.t. the union's own sketch
    (sketch(A ∪ B) == merge(sketch(A), sketch(B)), exactly — the
    pytest-pinned mergeability property)."""
    merged = sorted(set().union(*sketches))
    return merged[:_THETA_K]


def kmv_estimate(sketch: list[int]) -> float:
    """Distinct-count estimate: (K−1)/θ with θ = Kth smallest
    normalized hash; exact count when the set had < K members."""
    if len(sketch) < _THETA_K:
        return float(len(sketch))
    theta = sketch[-1] / _THETA_DOM
    return (_THETA_K - 1) / theta


def theta_intersect_estimate(a: list[int], b: list[int]) -> float:
    """Theta-sketch intersection: cut both sketches at θ = min(θa, θb)
    (each is then a uniform θ-sample of its set), count common hashes
    below θ, scale by 1/θ."""
    full = max(len(a), len(b)) >= _THETA_K
    if not full:
        # both exact: the hash sets ARE the sets
        return float(len(set(a) & set(b)))
    theta_h = min(a[-1] if len(a) == _THETA_K else _THETA_DOM,
                  b[-1] if len(b) == _THETA_K else _THETA_DOM)
    common = len({h for h in a if h < theta_h} & {h for h in b if h < theta_h})
    return common / (theta_h / _THETA_DOM)


@query("agg_theta_sketch_setops")
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation cardinality estimates from MERGEABLE theta/KMV
    sketches — the engine-native ``uniqTheta`` (ClickHouse) /
    DataSketches idiom, and the piece the HLL family deliberately
    lacks: HLL unions but cannot INTERSECT, while audience-overlap
    questions ("users in segment A ∩ B", "event buckets hit by both
    clicks and views") are intersections by definition.  Sets here:
    the event-id decade buckets (event_id div 10) touched by 'click'
    vs 'view' events — overlapping, SF-scaled domains.  Each sketch is
    the K smallest distinct hashes (computed as distinct +
    TakeOrdered(K) — the scan is the only data-sized work); union
    merges losslessly (pytest-pinned: merge(sketch A, sketch B) ==
    sketch(A ∪ B) exactly), intersection cuts both at θ = min(θa, θb)
    and rescales.  Output carries est AND exact side by side (exact
    via plain count_distinct — affordable here, the sketch exists for
    where it is not).  Rows-only: the estimates hinge on xxhash64,
    which DuckDB lacks; the accuracy contract (|est−exact| ≤ 5·RSE)
    and mergeability live in tests/test_sketches.py.  At 100 TB the
    driver never holds more than 3K longs; everything data-sized is a
    distinct + top-K."""
    ev = table(spark, sf_dir, "events")
    bucket = (F.col("event_id") / F.lit(10)).cast("long")

    def side(evt: str) -> DataFrame:
        return ev.filter(F.col("event_type") == evt).select(
            bucket.alias("b")
        )

    a_df, b_df = side("click"), side("view")
    sk_a = _kmv_collect(a_df, "b")
    sk_b = _kmv_collect(b_df, "b")
    sk_u = kmv_union(sk_a, sk_b)
    est = {
        "A": kmv_estimate(sk_a),
        "B": kmv_estimate(sk_b),
        "A_union_B": kmv_estimate(sk_u),
        "A_intersect_B": theta_intersect_estimate(sk_a, sk_b),
    }
    est["A_minus_B"] = max(0.0, est["A"] - est["A_intersect_B"])
    # exact twins: ONE bucket-grouped membership pass yields all five
    # counts (four separate distinct/intersect jobs paid three extra
    # corpus scans for values derivable from has_a/has_b flags)
    flags = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(bucket.alias("b"))
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("ha"),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("hb"),
        )
    )
    row = flags.agg(
        F.sum("ha").alias("a"),
        F.sum("hb").alias("b"),
        F.sum(F.col("ha") * F.col("hb")).alias("i"),
        F.count(F.lit(1)).alias("u"),
    ).collect()[0]  # bounded: single aggregate row (four scalars)
    exact = {
        "A": int(row["a"] or 0),
        "B": int(row["b"] or 0),
        "A_union_B": int(row["u"] or 0),
        "A_intersect_B": int(row["i"] or 0),
    }
    exact["A_minus_B"] = exact["A"] - exact["A_intersect_B"]
    rows = [
        (op, int(round(est[op])), int(exact[op]))
        for op in ("A", "B", "A_union_B", "A_intersect_B", "A_minus_B")
    ]
    return spark.createDataFrame(
        rows, "set_op string, est long, exact long"
    )
