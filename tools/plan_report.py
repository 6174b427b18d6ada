"""Audit every registered query's physical plan and write PLANS.md.

Runs ``plans.audit`` on each query at the given sf_dir and tabulates
the scale-relevant properties: pushed filters, broadcast/sort-merge
join counts, shuffle exchange counts, Python nodes (Arrow vs
row-at-a-time), top-k shape.  The table is the evidence for "the plan
you'd want, not the first one that passed" — regressions show up as a
diff in PLANS.md.

Usage: python tools/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from go_otel_clickhouse_ingestor_spark.plans import audit
    from go_otel_clickhouse_ingestor_spark.registry import load_all
    from go_otel_clickhouse_ingestor_spark.session import get_spark

    spark = get_spark("plan-report")
    reg = load_all()

    print("# Physical-plan audit\n")
    print(f"`tools/plan_report.py` over every registered query at `{sf_dir}`.")
    print("Columns: pushed = filters reaching the parquet scan; bcast/smj =")
    print("broadcast / sort-merge join counts; xchg = shuffle exchanges;")
    print("py = Python nodes (A=Arrow-batched, R=row-at-a-time — R must stay 0).\n")
    print("| query | pushed | bcast | smj | xchg | py | top-k |")
    print("|---|---|---|---|---|---|---|")
    for name in sorted(reg):
        try:
            a = audit(reg[name].fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover
            print(f"| {name} | ERROR: {type(exc).__name__} | | | | | |")
            continue
        py = f"A{a['python_arrow']}" + (
            f" R{a['python_row_at_a_time']}" if a["python_row_at_a_time"] else ""
        )
        print(
            f"| {name} | {len(a['pushed_filters'])} | {a['broadcast_joins']} "
            f"| {a['sort_merge_joins']} | {a['shuffle_exchanges']} | {py} "
            f"| {'TOP' if a['take_ordered'] else ''} |"
        )


if __name__ == "__main__":
    main()
