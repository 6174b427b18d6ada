"""Property-based checks of the closed-form rewrites the engine uses in
place of sequential recursions — pure Python, no Spark session: the
identities must hold for ANY series, not just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=300, deadline=None)
def test_cusum_prefix_rewrite_equals_recursion(zs):
    """events_changepoint_cusum's set-based form — S⁺_t = C_t − min(0,
    running-min C) with C_t = Σ(z_i − k) — must equal the textbook
    recursion S⁺_t = max(0, S⁺_{t−1} + z_t − k) for every integer
    series (the engine runs it in integer micro-units, so integers ARE
    the real domain).  Same for the negative side."""
    k = 500000
    # recursion
    s_pos, s_neg = 0, 0
    want = []
    for z in zs:
        s_pos = max(0, s_pos + z - k)
        s_neg = max(0, s_neg - z - k)  # mirrored chart
        want.append((s_pos, s_neg))
    # closed form
    c_pos = c_neg = 0
    min_c = max_d = 0
    got = []
    for z in zs:
        c_pos += z - k
        c_neg += z + k
        min_c = min(min_c, c_pos)
        max_d = max(max_d, c_neg)
        got.append((c_pos - min(min_c, 0), max(max_d, 0) - c_neg))
    assert got == want


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=24))
@settings(max_examples=500, deadline=None)
def test_bpe_greedy_equals_rank_exhaustive(word):
    """For the frozen BPE_MERGES table (each compound's parts produced
    at strictly lower ranks), the greedy lowest-rank-first loop must
    equal the rank-exhaustive application for EVERY word — the
    property that makes the independent test reference valid."""
    from go_otel_clickhouse_ingestor_spark.operators.text import (
        BPE_MERGES,
        bpe_encode,
    )

    parts = list(word)
    for a, b in BPE_MERGES:
        out = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    assert bpe_encode(word) == parts
    # reassembly invariant: concatenation is the original word
    assert "".join(bpe_encode(word)) == word


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # group
            st.integers(min_value=-50, max_value=50),  # order key (many ties)
        ),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=25),            # bucket width
)
@settings(max_examples=300, deadline=None)
def test_two_phase_rank_identity(rows, width):
    """distrank.two_phase_row_number's construction — bucket by ANY
    monotone non-decreasing function of the order key, rank locally
    within (group, bucket), add the per-(group, bucket) prefix offset —
    must equal the monolithic row_number for every input, including tie
    runs spanning bucket boundaries.  (Ties here share a bucket because
    the bucket is a function OF the key — the precondition the Spark
    operator documents.)  Pure-Python twin of the algebra;
    tests/test_distrank.py drives the real Spark operator."""
    # reference: global rank per group, stable by input position
    want: dict = {}
    for g in {g for g, _ in rows}:
        ordered = sorted(
            (i for i, (gg, _) in enumerate(rows) if gg == g),
            key=lambda i: (rows[i][1], i),
        )
        for rk, i in enumerate(ordered, start=1):
            want[i] = rk
    # two-phase: bucket = key // width (monotone in key)
    from collections import defaultdict

    got: dict = {}
    for g in {g for g, _ in rows}:
        members = [i for i, (gg, _) in enumerate(rows) if gg == g]
        counts: defaultdict = defaultdict(int)
        for i in members:
            counts[rows[i][1] // width] += 1
        offset = {}
        run = 0
        for b in sorted(counts):
            offset[b] = run
            run += counts[b]
        by_bucket: defaultdict = defaultdict(list)
        for i in members:
            by_bucket[rows[i][1] // width].append(i)
        for b, idxs in by_bucket.items():
            idxs.sort(key=lambda i: (rows[i][1], i))
            for local, i in enumerate(idxs, start=1):
                got[i] = offset[b] + local
    assert got == want
