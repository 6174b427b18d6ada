"""Adversarial fixture for orders_basket_lift, shipped with the
operator (the VERDICT r12 rule): a planted perfect pair, frequent
items that never co-occur, and a mega-basket clique that the basket
cap must drop WHOLE — without the cap its C(257,2) pairs (each with
huge lift) would flood the top-k."""

from __future__ import annotations

import pandas as pd

from go_otel_clickhouse_ingestor_spark.operators import relational as R


def test_basket_lift_planted_pair_and_cap(spark, tmp_path):
    orders: list[tuple[int, int]] = []
    lines: list[tuple[int, int]] = []

    def add(basket: int, items: list[int]) -> None:
        orders.append((basket, basket))
        lines.extend((basket, it) for it in items)

    # planted pair: items 101/102 co-occur in exactly 6 baskets
    for c in range(1, 7):
        add(c, [101, 102])
    # filler: 10 frequent items (sup 8 each) that NEVER co-occur —
    # must pass the frequent-item prune yet produce zero pairs
    for i in range(10):
        for b in range(8):
            add(1000 + 8 * i + b, [200 + i])
    # mega-basket clique: 257 items (> _BASKET_CAP = 256), each in the
    # same 5 baskets — every item is frequent (sup 5 = minsup) and
    # every pair has support 5, but the cap must drop the baskets whole
    big = list(range(300, 300 + R._BASKET_CAP + 1))
    for c in range(2000, 2005):
        add(c, big)

    d = tmp_path / "basket_sf"
    d.mkdir()
    pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]).to_parquet(
        d / "orders.parquet"
    )
    pd.DataFrame(lines, columns=["l_orderkey", "l_partkey"]).to_parquet(
        d / "lineitem.parquet"
    )

    out = R.orders_basket_lift(spark, str(d)).collect()
    n_baskets = 6 + 80 + 5
    assert [(r.item_a, r.item_b) for r in out] == [(101, 102)], [
        (r.item_a, r.item_b) for r in out
    ]
    r = out[0]
    assert r.pair_sup == 6 and r.sup_a == 6 and r.sup_b == 6
    assert r.confidence == 1.0
    assert r.lift == round(6.0 * n_baskets / 36, 6)
    assert r.rn == 1


def test_basket_lift_cap_boundary_kept(spark, tmp_path):
    """A basket with EXACTLY _BASKET_CAP frequent items is kept (the
    cap is inclusive) — its pairs surface."""
    orders: list[tuple[int, int]] = []
    lines: list[tuple[int, int]] = []

    def add(basket: int, items: list[int]) -> None:
        orders.append((basket, basket))
        lines.extend((basket, it) for it in items)

    exact = list(range(500, 500 + R._BASKET_CAP))
    for c in range(1, 6):  # 5 baskets -> every item/pair at minsup
        add(c, exact)
    d = tmp_path / "cap_sf"
    d.mkdir()
    pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]).to_parquet(
        d / "orders.parquet"
    )
    pd.DataFrame(lines, columns=["l_orderkey", "l_partkey"]).to_parquet(
        d / "lineitem.parquet"
    )
    out = R.orders_basket_lift(spark, str(d)).collect()
    assert len(out) == R._BASKET_TOPK  # pairs survived the cap
    assert all(r.pair_sup == 5 for r in out)
