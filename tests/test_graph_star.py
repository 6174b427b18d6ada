"""Property gates for alternating star contraction
(operators/graph.py: star_contraction) — correctness on adversarial
shapes plus the round-budget contract ADVICE r12 flagged: the
fingerprint-equality check needs one iteration PAST the fixpoint, so a
graph converging exactly on the final budgeted round must still return
(the verification-only pass is not charged)."""

from __future__ import annotations

import pytest

from go_otel_clickhouse_ingestor_spark.operators import graph as G


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.label for r in G.star_contraction(df).collect()}


def _canon_components(labels: dict[int, int]) -> set[frozenset[int]]:
    by_label: dict[int, set[int]] = {}
    for node, lab in labels.items():
        by_label.setdefault(lab, set()).add(node)
        by_label.setdefault(lab, set()).add(lab)
    return {frozenset(v) for v in by_label.values()}


def test_star_chain_components(spark):
    """A 21-node chain (diameter 20) plus a separate triangle: labels
    must map every non-root node to its component minimum."""
    chain = [(i, i + 1) for i in range(100, 120)]
    tri = [(500, 501), (501, 502), (502, 500)]
    labels = _labels(spark, chain + tri)
    assert _canon_components(labels) == {
        frozenset(range(100, 121)),
        frozenset({500, 501, 502}),
    }
    assert all(lab == 100 for n, lab in labels.items() if 100 <= n <= 120 and n != 100)


@pytest.mark.slow  # runs the contraction loop 3x to measure + pin the budget (~14 s): full tier
def test_star_converges_on_final_budgeted_round(spark, monkeypatch):
    """The budget counts fingerprint-ADVANCING rounds only: with the
    cap pinned to exactly the number of advancing rounds a chain
    needs, the free verification iteration still observes the fixpoint
    and returns instead of raising (ADVICE r12, low)."""
    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "src long, dst long")

    # measure how many advancing 2-round iterations this graph needs
    calls = {"n": 0}
    orig = G._edge_fingerprint

    def counting(edges):
        calls["n"] += 1
        return orig(edges)

    monkeypatch.setattr(G, "_edge_fingerprint", counting)
    G.star_contraction(df)
    # calls = 1 initial + advancing iterations + 1 verification
    advancing = calls["n"] - 2
    assert advancing >= 1
    monkeypatch.setattr(G, "_edge_fingerprint", orig)

    monkeypatch.setattr(G, "_STAR_MAX_ROUNDS", 2 * advancing)
    labels = {r.node: r.label for r in G.star_contraction(df).collect()}
    assert set(labels.values()) == {0}

    # one advancing round fewer must raise (the budget is still real)
    if advancing > 1:
        monkeypatch.setattr(G, "_STAR_MAX_ROUNDS", 2 * (advancing - 1))
        with pytest.raises(RuntimeError, match="did not converge"):
            G.star_contraction(df)


def test_star_single_edge_and_self_loop(spark):
    """Degenerate inputs: one edge converges immediately; self-loops
    are stripped before the first round."""
    labels = _labels(spark, [(7, 3), (9, 9)])
    assert labels == {7: 3}
