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


def _union_copies(copies):
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    return df


def build_scaled(spark, n: int) -> str:
    """Materialize n×-scaled documents/embeddings/orders/lineitem
    tables (each lazily, reused if present).

    - documents: per-copy character rotation (see module docstring).
    - embeddings: per-copy cyclic rotation of the vector's coordinates
      — preserves norms and within-copy pairwise dots (workload shape
      constant per copy) while decorrelating cross-copy vectors.
    - orders/lineitem: per-copy key offsets, so the customer↔supplier
      trade graph becomes n disjoint copies — node and edge counts
      scale by exactly n with per-copy structure unchanged.
    """
    out = f"{SCALE_ROOT}/x{n}"
    letters = string.ascii_lowercase
    if not os.path.exists(f"{out}/documents.parquet/_SUCCESS"):
        base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
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
        _union_copies(copies).repartition(max(n, 4)).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )
    if not os.path.exists(f"{out}/embeddings.parquet/_SUCCESS"):
        base = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
        dim = len(base.select("embedding").first()[0])
        copies = []
        for k in range(n):
            r = k % dim
            rot = (
                F.concat(
                    F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
                )
                if r
                else F.col("embedding")
            )
            copies.append(
                base.select(
                    (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                    rot.alias("embedding"),
                    "label",
                )
            )
        _union_copies(copies).repartition(max(n, 4)).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )
    if not os.path.exists(f"{out}/events.parquet/_SUCCESS"):
        # per-copy user_id/event_id offsets with timestamps unchanged:
        # the user population (sessions, EWMA series) scales by n with
        # per-user series shape constant, while the calendar — and so
        # the hot-hour / day-grain side of interval joins — stays fixed,
        # which is exactly the 100 TB shape (more traffic, same clock).
        base = spark.read.parquet(f"{BASE_SF}/events.parquet")
        copies = []
        for k in range(n):
            copies.append(
                base.withColumn(
                    "user_id", F.col("user_id") + F.lit(k * 10_000_000)
                ).withColumn("event_id", F.col("event_id") + F.lit(k * 1_000_000_000))
            )
        _union_copies(copies).repartition(max(n, 4)).write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )
    for tbl, keys in (
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey", "l_suppkey"]),
        # customer offsets match the events user_id offsets, so the
        # fact⋈dim join population scales by n with per-copy join
        # selectivity unchanged
        ("customer", ["c_custkey"]),
        # supplier offsets match lineitem's l_suppkey offsets; the
        # nation key is NOT offset (a fixed country domain at any
        # scale), so per-nation rollups aggregate n× suppliers each
        ("supplier", ["s_suppkey"]),
    ):
        if os.path.exists(f"{out}/{tbl}.parquet/_SUCCESS"):
            continue
        base = spark.read.parquet(f"{BASE_SF}/{tbl}.parquet")
        copies = []
        for k in range(n):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(k * 10_000_000))
            copies.append(c)
        _union_copies(copies).repartition(max(n, 4)).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
    # fixed-domain dimensions: copied unscaled (a 100 TB warehouse
    # still has 25 nations)
    for tbl in ("nation", "region", "part"):
        if not os.path.exists(f"{out}/{tbl}.parquet/_SUCCESS"):
            spark.read.parquet(f"{BASE_SF}/{tbl}.parquet").write.mode(
                "overwrite"
            ).parquet(f"{out}/{tbl}.parquet")
    return out


def sem_cell_stats(spark, sf_dir: str) -> dict:
    """SemDeDup blocking diagnostics at this scale: the chosen K, the
    max/mean cell size, and the intra-cell candidate-pair volume
    Σ|cell|·(|cell|-1)/2 — the quantity that must grow ~linearly with N
    for the blocking to hold at 100 TB (r4 verdict: fixed K made it
    quadratic)."""
    from go_otel_clickhouse_ingestor_spark.operators.clustering import kmeans, sem_k
    from go_otel_clickhouse_ingestor_spark.tables import table

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    k = sem_k(n)
    assigned, _ = kmeans(spark, e, k=k, iters=2)
    sizes = [r.c for r in assigned.groupBy("cell").agg(F.count("*").alias("c")).collect()]
    return {
        "n": n,
        "k": k,
        "max_cell": max(sizes),
        "mean_cell": round(sum(sizes) / len(sizes), 1),
        "candidate_pairs": sum(c * (c - 1) // 2 for c in sizes),
    }


def distrank_stats(spark, sf_dir: str) -> dict:
    """Two-phase-rank funnel diagnostics: the MAX rows any local-rank
    window task carries for the two ``two_phase_row_number`` consumers
    (claim to demonstrate: ≈ N/B, never a whole partition), plus the
    distinct-volume domain the gini closed form aggregates over.

    Mirrors the bucket expressions at ``operators/pipeline.py``
    (pipeline_epoch_shuffle: md5-prefix range bucket) and
    ``operators/analytics.py`` (events_decile_migration: composite
    exact-volume × 32-way user_id-range bucket) — keep in sync."""
    from go_otel_clickhouse_ingestor_spark.operators.pipeline import (
        _SHUFFLE_EPOCHS,
        _SHUFFLE_SEED,
    )
    from go_otel_clickhouse_ingestor_spark.tables import table

    out: dict = {}

    # pipeline_epoch_shuffle: (epoch, md5-prefix-bucket) task rows
    d = table(spark, sf_dir, "documents").select("doc_id")
    n_docs = d.count()
    epochs = spark.createDataFrame([(e,) for e in _SHUFFLE_EPOCHS], "epoch long")
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        F.md5(
            F.concat_ws(
                ":", F.lit(_SHUFFLE_SEED), F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    n_b = 32
    bucket = F.expr(f"int(conv(substring(h, 1, 4), 16, 10)) * {n_b} div 65536")
    sizes = (
        keyed.withColumn("b", bucket)
        .groupBy("epoch", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.avg("c").alias("mean"))
        .first()
    )
    out["epoch_shuffle"] = {
        "rows_per_epoch": n_docs,
        "max_task_rows": sizes.mx,
        "mean_task_rows": round(sizes.mean, 1),
    }

    # events_decile_migration: (half, x*32 + user_id-range) task rows
    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    halves = (
        ev.join(F.broadcast(b))
        .select(
            "user_id",
            F.when(2 * F.unix_micros("ts") < F.col("t0") + F.col("t1"), 1)
            .otherwise(2)
            .alias("half"),
        )
        .groupBy("user_id", "half")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    n_sub = 32
    lo, width = int(lo), (int(hi) - int(lo)) // n_sub + 1
    sub = F.floor(
        (F.col("user_id").cast("decimal(38,0)") - F.lit(str(lo)).cast("decimal(38,0)"))
        / F.lit(str(width)).cast("decimal(38,0)")
    ).cast("long")
    n_users = halves.count()
    sizes = (
        halves.withColumn("b", F.col("x") * n_sub + sub)
        .groupBy("half", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.avg("c").alias("mean"))
        .first()
    )
    out["decile_migration"] = {
        "ranked_rows": n_users,
        "max_task_rows": sizes.mx,
        "mean_task_rows": round(sizes.mean, 1),
    }

    # events_gini_concentration: closed form has NO rank; the frame it
    # aggregates is the distinct per-user volume domain
    vols = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("v"))
    out["gini"] = {
        "users": vols.count(),
        "distinct_volume_domain": vols.select("v").distinct().count(),
    }
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
        if name == "sem_cells":
            # blocking diagnostic, not a registry query
            results[name] = {
                "at1": sem_cell_stats(spark, base),
                "atN": sem_cell_stats(spark, scaled),
            }
            print(f"# sem_cells: {results[name]}", file=sys.stderr)
            continue
        if name == "distrank_stats":
            # two-phase-rank funnel diagnostic, not a registry query
            results[name] = {
                "at1": distrank_stats(spark, base),
                "atN": distrank_stats(spark, scaled),
            }
            print(f"# distrank_stats: {results[name]}", file=sys.stderr)
            continue
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
