"""Optimization-round probe: isolated noop-sink timing + plan capture.

Times each named query with the noop sink (guide §1.4 — computes every
column of every row, no driver collect, no sink cost) min-of-N, and
optionally writes ``.explain("formatted")`` to a plans directory so
before/after plan shapes are committed evidence.

This is the optimization-loop instrument, NOT the driver protocol:
bench.py keeps its historical count()-action methodology for
round-over-round comparability.

Usage:
  python tools/opt_probe.py [--sf DIR] [--reps N] [--plans DIR]
                            [--suffix before|after] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--suffix", default="probe")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from go_otel_clickhouse_ingestor_spark.operators.dedup import release_persisted
    from go_otel_clickhouse_ingestor_spark.registry import load_all
    from go_otel_clickhouse_ingestor_spark.session import get_spark

    spark = get_spark("opt-probe")
    reg = load_all()
    # session warm-up: JVM action + Arrow worker pool (same as bench.py)
    spark.read.parquet(f"{args.sf}/region.parquet").count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, float] = {}
    for name in args.queries:
        q = reg.get(name)
        if q is None:
            print(f"# {name}: NOT REGISTERED", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = q.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        for _ in range(args.reps):
            release_persisted()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            df = q.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        samples.sort()
        out[name] = samples[0]
        print(f"# {name}: min {samples[0]:.3f}s of {samples}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
