"""Local oracle-differential harness, mirroring the driver's t2 check.

Runs every registered query's Spark plan AND its DuckDB oracle SQL on
the same parquet tables, then compares row count, schema (column
names), and an order-insensitive value comparison.  Because we don't
know the driver's exact hash canonicalization, this harness is
*stricter where it can be*: it sorts columns by name, sorts rows, and
compares values exactly (floats reported with max-abs-diff on
mismatch so ULP noise is distinguishable from logic bugs).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

# Bootstrap: make the engine package importable when run from a clean
# shell (``python tools/check_oracle.py ...``) with no PYTHONPATH —
# same one-liner as plan_report.py.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from go_otel_clickhouse_ingestor_spark.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, (list, np.ndarray)):
            return tuple(np.asarray(v).tolist())
        return v

    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(cell)
        elif str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == np.float32:
            out[c] = out[c].astype("float64").round(4)
    if not len(out):  # .agg on an empty frame yields a frame, not a Series
        return out.reset_index(drop=True)
    key = out.map(lambda v: str(v)).agg("|".join, axis=1)
    return out.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            problems.append(f"dtype[{c}] spark={sv.dtype} duck={dv.dtype}")
        try:
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                a = sv.to_numpy(dtype="float64")
                b = dv.to_numpy(dtype="float64")
                both_nan = np.isnan(a) & np.isnan(b)
                neq = ~both_nan & ~(a == b)
                if neq.any():
                    mad = np.nanmax(np.abs(a[neq] - b[neq]))
                    problems.append(f"values[{c}]: {neq.sum()} diffs, maxabs={mad:.3e}")
            else:
                neq = ~(sv.astype(str) == dv.astype(str))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    problems.append(
                        f"values[{c}]: {int(neq.sum())} diffs, first at row {i}: "
                        f"spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
                    )
        except Exception as exc:  # noqa: BLE001
            problems.append(f"compare[{c}] failed: {exc}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from go_otel_clickhouse_ingestor_spark.registry import load_all
    from go_otel_clickhouse_ingestor_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    reg = load_all()
    failed = []
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(q.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")
    n_run = len([n for n in reg if not only or n in only])
    print(f"\n{n_run - len(failed)}/{n_run} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
