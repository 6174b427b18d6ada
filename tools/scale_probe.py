"""Scale probe: do the linear-path operators actually scale linearly?

Builds N×-scaled copies of the sf0.1 ``documents`` table in /tmp and
times the dedup/text operators at 1× and N×.  A linear operator's
time ratio should track the data ratio (minus fixed session overhead);
anything superlinear is a scale bug the bench at one size can't see.

Corpus construction: each copy's text goes through a per-copy
character rotation (``translate``), so within-copy duplicate structure
(the planted near-dups) is preserved copy by copy while cross-copy
texts share no shingles — the workload SHAPE stays constant as N
grows, which is what makes the ratio meaningful.  (Naive union would
give every doc N exact twins and blow the pair stages up
quadratically by construction.)

Usage: python tools/scale_probe.py [N] [ops...]   (default N=4)
Prints one JSON line: {"n": N, "ops": {op: {"t1": s, "tN": s,
"ratio": tN/t1, "rows1": r, "rowsN": r}}}.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DEFAULT_OPS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "doc_fingerprint",
    "text_quality_score",
    "text_token_count",
    "pipeline_corpus_filter",
    "pipeline_budget_sharded",
    "dedup_url_canonical",
    "text_shingle_profile",
    "text_chunk_overlap",
    "decontaminate_ngram_overlap",
    "dedup_incremental_corpus",
    "text_repetition_gopher",
    "text_pii_scrub",
]

BASE_SF = "/root/testdata/sf0.1"
SCALE_ROOT = "/tmp/spark_graft_scale"


def build_scaled(spark, n: int) -> str:
    """Materialize an n×-scaled documents table; reuse if present."""
    out = f"{SCALE_ROOT}/x{n}"
    if os.path.exists(f"{out}/documents.parquet/_SUCCESS"):
        return out
    base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    letters = string.ascii_lowercase
    copies = []
    for k in range(n):
        rot = letters[k % 26 :] + letters[: k % 26]
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.translate("text", letters, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(max(n, 4)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ops = sys.argv[2:] or DEFAULT_OPS

    from go_otel_clickhouse_ingestor_spark.registry import load_all
    from go_otel_clickhouse_ingestor_spark.session import get_spark

    spark = get_spark("scale-probe")
    reg = load_all()
    scaled = build_scaled(spark, n)
    # 1x goes through the same construction so both sides compare like
    # with like (repartitioned parquet, translated text pipeline)
    base = build_scaled(spark, 1)
    spark.read.parquet(f"{base}/documents.parquet").count()  # warm
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    results = {}
    for name in ops:
        q = reg[name]
        t0 = time.time()
        r1 = q.fn(spark, base).count()
        t1 = time.time() - t0
        t0 = time.time()
        rn = q.fn(spark, scaled).count()
        tn = time.time() - t0
        results[name] = {
            "t1": round(t1, 2),
            "tN": round(tn, 2),
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
            "rows1": r1,
            "rowsN": rn,
        }
        print(f"# {name}: {t1:.2f}s @1x ({r1} rows) -> {tn:.2f}s @{n}x ({rn} rows)",
              file=sys.stderr)

    print(json.dumps({"n": n, "ops": results}))


if __name__ == "__main__":
    main()
