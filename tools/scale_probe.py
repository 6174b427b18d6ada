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


def build_perm_scaled(spark, n: int) -> str:
    """N×-scaled documents with NON-ALIASING per-copy substitution
    ciphers — the 100×-capable variant of ``build_scaled``'s rotation
    rule (SCALING.md Round 13 caveat: rotations alias at N > 26, so
    copies k and k+26 share text verbatim and similarity ops gain
    fabricated cross-copy duplicates).  Each copy applies a seeded
    Fisher-Yates permutation of [a-z0-9] via ``translate`` — within-
    copy duplicate structure is preserved exactly (translate is a
    bijection on the alphabet), while two independent random
    permutations agree on ~1 symbol on average, so cross-copy shingle
    sharing is measure-zero at any N.  Digits are permuted too
    (rotation left them fixed, so all-digit shingles aliased across
    every copy even at N ≤ 26)."""
    import random

    out = f"{SCALE_ROOT}/perm_x{n}"
    if not os.path.exists(f"{out}/documents.parquet/_SUCCESS"):
        alpha = string.ascii_lowercase + string.digits
        base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
        copies = []
        for k in range(n):
            sym = list(alpha)
            random.Random(10_000 + k).shuffle(sym)
            copies.append(
                base.select(
                    (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                    F.translate("text", alpha, "".join(sym)).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        _union_copies(copies).repartition(max(n // 2, 8)).write.mode(
            "overwrite"
        ).parquet(f"{out}/documents.parquet")
    if not os.path.exists(f"{out}/embeddings.parquet/_SUCCESS"):
        # embeddings analogue of the cipher rule: a per-copy seeded ±1
        # SIGN MASK — elementwise sign flips preserve norms and every
        # within-copy dot exactly (workload shape constant per copy),
        # while cross-copy dots become random-sign sums ≈ 0; 2^dim
        # masks, so no aliasing at any realistic N (the coordinate
        # ROTATION rule of build_scaled aliases at N > dim)
        base = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
        dim = len(base.select("embedding").first()[0])
        # masks as a joined TABLE, not n union branches of 64-element
        # literal arrays — the literal-branch form sent Catalyst into a
        # multi-minute single-threaded optimization spin at n=100
        masks = []
        for k in range(n):
            rng = random.Random(20_000 + k)
            masks.append((k, [rng.choice((1.0, -1.0)) for _ in range(dim)]))
        mdf = spark.createDataFrame(masks, "k long, mask array<double>")
        (
            base.crossJoin(F.broadcast(mdf))
            .select(
                (F.col("vec_id") + F.col("k") * 10_000_000).alias("vec_id"),
                F.zip_with(
                    "embedding",
                    "mask",
                    lambda x, m: (x * m).cast("float"),  # keep base dtype
                ).alias("embedding"),
                "label",
            )
            .repartition(max(n // 2, 8))
            .write.mode("overwrite")
            .parquet(f"{out}/embeddings.parquet")
        )
    return out


def linear100_probe(spark, n: int, ops: list[str]) -> dict:
    """The 100× scaling point (VERDICT r13 ask #3): time document-path
    ops at 1× (the raw sf0.1 fixture) and at n× on the permutation-
    scaled corpus, reporting per-unit ratios.  Sub-linear per unit
    (ratio ≪ n) is the pass bar for a linear-path operator."""
    from go_otel_clickhouse_ingestor_spark.registry import load_all

    reg = load_all()
    big = build_perm_scaled(spark, n)
    out = {}
    for op in ops:
        q = reg[op]
        t0 = time.time()
        r1 = q.fn(spark, BASE_SF).count()
        t1 = time.time() - t0
        t0 = time.time()
        rn = q.fn(spark, big).count()
        tn = time.time() - t0
        out[op] = {
            "t1": round(t1, 2),
            "tN": round(tn, 2),
            "ratio": round(tn / t1, 2) if t1 else None,
            "per_unit": round(tn / t1 / n, 4) if t1 else None,
            "rows1": r1,
            "rowsN": rn,
        }
        print(f"# linear100 {op}: {out[op]}", file=sys.stderr)
    return out


def near_index_probe_scale(spark, n: int) -> dict:
    """O(batch) probe-cost evidence for the MAINTAINED near-dup index
    (round-15): build the parquet band/gram index from copy 0's corpus
    split (1×) and from all N copies' corpus splits (N×), then probe
    the SAME fixed batch (copy 0's doc_id % 10 >= 8 slice) against
    each.  The batch is constant and keeps its real planted near-dups
    in copy 0 (substitution ciphers make cross-copy matches
    measure-zero), so decisions stay comparable while the index grows
    N× — a probe wall that stays ~flat is the maintained-index
    contract measured, not asserted."""
    from pyspark.sql import functions as F

    from go_otel_clickhouse_ingestor_spark.operators.dedup import (
        _near_sigs,
        materialized,
        near_index_probe,
        near_index_write,
    )

    big = build_perm_scaled(spark, n)
    docs = spark.read.parquet(f"{big}/documents.parquet")
    batch = docs.filter(
        (F.col("doc_id") < 10_000_000) & (F.col("doc_id") % 10 >= 8)
    )
    out: dict = {}
    for tag, corpus in (
        ("1x", docs.filter((F.col("doc_id") < 10_000_000) & (F.col("doc_id") % 10 < 8))),
        (f"{n}x", docs.filter(F.col("doc_id") % 10 < 8)),
    ):
        path = f"{SCALE_ROOT}/near_index_{tag}"
        t0 = time.time()
        near_index_write(materialized(_near_sigs(corpus)), path)
        t_build = time.time() - t0
        t0 = time.time()
        dec, _sig = near_index_probe(spark, path, batch)
        n_matched = dec.filter(~F.col("is_new")).count()
        t_probe = time.time() - t0
        out[tag] = {
            "build_s": round(t_build, 2),
            "probe_s": round(t_probe, 2),
            "n_matched": n_matched,
        }
        print(f"# near_index {tag}: {out[tag]}", file=sys.stderr)
    out["probe_ratio"] = (
        round(out[f"{n}x"]["probe_s"] / out["1x"]["probe_s"], 2)
        if out["1x"]["probe_s"]
        else None
    )
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


def build_zipf_skewed(spark) -> str:
    """Materialize a deliberately Zipf-skewed events/customer fixture.

    The uniform fixtures under /root/testdata can't exercise the skew
    claims (join_skew_salted, agg_skew_two_phase, AQE skew-join): their
    per-user volumes are flat, so salted and plain keys distribute the
    same.  Here event→user assignment follows a Zipf(≈1) law via the
    deterministic inverse-CDF ``user = ceil(N^u)`` with ``u`` a hashed
    uniform — P(rank r) ∝ 1/r, no RNG state (the epoch-shuffle rule) —
    so the hottest user owns ~ln2/lnN of ALL events (~7.5% of 4M here:
    one shuffle partition would carry ~300k rows while the median
    carries ~1k — the 100 TB whale-tenant shape)."""
    out = f"{SCALE_ROOT}/zipf_skew"
    n_events, n_users = 4_000_000, 10_000
    if not os.path.exists(f"{out}/events.parquet/_SUCCESS"):
        u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double")
             + F.lit(0.5)) / F.lit(1_000_000.0)
        ev = spark.range(n_events).select(
            F.col("id").alias("event_id"),
            F.ceil(F.pow(F.lit(float(n_users)), u)).cast("long").alias("user_id"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).cast("double")
             / 100.0).alias("value"),
        )
        ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")
    if not os.path.exists(f"{out}/customer.parquet/_SUCCESS"):
        c = spark.range(1, n_users + 1).select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("SEG"), (F.col("id") % 5).cast("string")).alias(
                "c_mktsegment"
            ),
            (F.col("id") % 25).cast("int").alias("c_nationkey"),
        )
        c.repartition(4).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    return out


def skew_stress(spark) -> dict:
    """Skew-stress measurements on the Zipf fixture: per-shuffle-key
    task-max-rows for plain vs salted keys, wall time for the plain vs
    salted join with AQE skew-split on/off, and the direct vs two-phase
    skewed agg — the numbers behind SCALING.md's skew section.

    The dim side is forced OFF broadcast (autoBroadcastJoinThreshold
    -1) for the join runs: at 100 TB the dim is too wide to broadcast
    and the join is a shuffle — exactly the regime AQE skew-split and
    salting exist for."""
    from go_otel_clickhouse_ingestor_spark.operators.skew import SALT

    sf = build_zipf_skewed(spark)
    ev = spark.read.parquet(f"{sf}/events.parquet")
    dim = spark.read.parquet(f"{sf}/customer.parquet")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out: dict = {"n_events": ev.count(), "n_users": dim.count(), "shuffle_partitions": parts}

    # 1) task-max-rows: rows landing in each hash-shuffle partition for
    #    the plain key vs the salted key (the exact distribution the
    #    join's big side shuffles with)
    def max_median(df, *cols):
        sizes = (
            df.groupBy(F.pmod(F.hash(*cols), F.lit(parts)).alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        r = sizes.agg(
            F.max("c").alias("mx"),
            F.expr("percentile_approx(c, 0.5)").alias("med"),
        ).first()
        return {"max_task_rows": r.mx, "median_task_rows": r.med}

    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
    )
    out["plain_key"] = max_median(ev, "user_id")
    out["salted_key"] = max_median(salted, "user_id", "salt")
    hot = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c")).first()[0]
    )
    out["hottest_user_rows"] = hot

    def timed(fn):
        t0 = time.time()
        v = fn()
        return round(time.time() - t0, 2), v

    agg = lambda j: j.groupBy("c_mktsegment").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("tv"),
    )

    def plain_join():
        j = ev.join(dim, ev.user_id == dim.c_custkey)
        return sorted(map(tuple, agg(j).collect()))

    def salted_join():
        sd = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
        )
        j = salted.join(
            sd,
            (salted.user_id == sd.c_custkey) & (salted.salt == sd.salt),
        )
        return sorted(map(tuple, agg(j).collect()))

    # 2) joins, broadcast off (the wide-dim regime); AQE skew split
    #    off vs on (thresholds lowered so the ~300k-row whale partition
    #    clears the split bar at this fixture size)
    with_conf = spark.conf
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with_conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t, base_res = timed(plain_join)
        out["join_plain_aqe_skew_off_s"] = t
        with_conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        with_conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        with_conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        with_conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        t, res = timed(plain_join)
        out["join_plain_aqe_skew_on_s"] = t
        assert res == base_res, "AQE changed the join result"
        t, res = timed(salted_join)
        out["join_salted_s"] = t
        assert res == base_res, "salting changed the join result"
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        ):
            with_conf.unset(k)
        with_conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # 3) skewed GROUP BY: direct vs two-phase salted (5 hot keys; AQE
    #    cannot split an agg key — the rewrite is the only fix)
    seg = ev.join(dim, ev.user_id == dim.c_custkey).select(
        "c_mktsegment", "user_id", "value"
    ).persist()
    seg.count()
    def direct_agg():
        return sorted(map(tuple, seg.groupBy("c_mktsegment").agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
        ).collect()))
    def two_phase():
        p1 = seg.withColumn(
            "salt", F.pmod(F.xxhash64("user_id"), F.lit(SALT)).cast("int")
        ).groupBy("c_mktsegment", "salt").agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
        )
        return sorted(map(tuple, p1.groupBy("c_mktsegment").agg(
            F.sum("u").alias("u"), F.sum("n").alias("n")
        ).collect()))
    t, d = timed(direct_agg)
    out["agg_direct_s"] = t
    t, tp = timed(two_phase)
    out["agg_two_phase_s"] = t
    assert d == tp, "two-phase agg drifted from direct"
    seg.unpersist()
    return out


#: lp_sparse fixture shape: 100 planted near-identical supplier pairs
#: (7 shared + 1 own cold customer + 1 Zipf-hot customer each → true
#: top-k Jaccard ≈ 7/11) on top of an otherwise overlap-free sparse
#: graph whose only shared customers are the 1000 Zipf-hot ids.
_LP_PLANTED = 100
_LP_COLD = 7  # shared-cold customers per supplier (the similarity signal)
_LP_HOT_RANKS = 1_000


def build_lp_sparse(spark, n_sup: int) -> str:
    """Materialize the sparse Zipf-pivot bipartite edge list the exact
    wedge join is WRONG for: per-supplier customer sets are tiny
    (9 edges), so the graph is sparse and LSH signatures are cheap,
    but customer-pivot degrees follow a Zipf law — the hottest
    customer touches ~10% of ALL suppliers (ln2/ln1000 of edges), so
    the wedge generator's Σd² grows QUADRATICALLY with supplier count
    while edges (and the LSH path) grow linearly.  That is the sparse
    billion-node regime the banded path exists for: almost all wedge
    pairs share only a hot customer (Jaccard ≈ 1/17 — never top-k),
    yet the exact form must materialize and aggregate every one of
    them.  All ids are hash-derived (no RNG state); cold customers
    live in a 2^40 space so cross-supplier collisions are negligible,
    hot customers are NEGATIVE ids so the two populations stay
    disjoint."""
    out = f"{SCALE_ROOT}/lp_sparse_{n_sup}"
    if not os.path.exists(f"{out}/half.parquet/_SUCCESS"):
        sup = spark.range(n_sup).select(F.col("id").alias("supp"))
        # planted pairs: suppliers (2i, 2i+1) for i < _LP_PLANTED share
        # their 7 cold customers via a common group key
        group = F.when(
            F.col("supp") < 2 * _LP_PLANTED, F.col("supp") - F.col("supp") % 2
        ).otherwise(F.col("supp"))
        cold = (
            sup.withColumn("grp", group)
            .select(
                "supp",
                "grp",
                F.explode(F.sequence(F.lit(0), F.lit(_LP_COLD))).alias("i"),
            )
            .select(
                "supp",
                F.when(
                    F.col("i") < _LP_COLD,
                    F.pmod(F.xxhash64("grp", "i"), F.lit(1 << 40)),
                )
                .otherwise(
                    # the own-cold customer: keyed on supp (not grp), so
                    # planted partners differ in exactly this edge
                    F.pmod(F.xxhash64("supp", F.lit(1_000_003)), F.lit(1 << 40))
                )
                .alias("cust"),
            )
        )
        # one Zipf-hot customer per supplier: inverse-CDF rank =
        # ceil(K^u), P(rank r) ∝ ln((r+1)/r) — the skew-probe rule
        u = (
            F.pmod(F.xxhash64("supp", F.lit(7)), F.lit(1_000_000)).cast("double")
            + F.lit(0.5)
        ) / F.lit(1_000_000.0)
        hot = sup.select(
            "supp",
            (-F.ceil(F.pow(F.lit(float(_LP_HOT_RANKS)), u))).cast("long").alias("cust"),
        )
        edges = cold.select("cust", "supp").unionByName(hot.select("cust", "supp")).distinct()
        edges.repartition(32).write.mode("overwrite").parquet(f"{out}/half.parquet")
    return out


def lp_sparse_probe(spark, n: int) -> dict:
    """Banded-LSH vs exact-wedge link prediction on the sparse
    Zipf-pivot fixture at 1× and n× supplier count: wall time, the
    analytic wedge-pair count Σd·(d-1)/2 (the exact path's intermediate
    cardinality) vs the LSH candidate count, and top-20 recall of the
    banded path against the exact twin at BOTH scales — the round-11
    verdict's missing sparse-regime crossover evidence."""
    from go_otel_clickhouse_ingestor_spark.operators.graph import (
        lp_exact_core,
        lp_lsh_core,
    )

    base_sup = 10_000
    out: dict = {"base_suppliers": base_sup, "n": n}
    for tag, n_sup in (("at1", base_sup), ("atN", base_sup * n)):
        sf = build_lp_sparse(spark, n_sup)
        half = spark.read.parquet(f"{sf}/half.parquet")
        half.count()  # warm: parquet footers + page cache
        stats = {}
        # analytic intermediate cardinalities (cheap aggregates, not
        # timed): what each path must materialize before scoring
        deg = half.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
        stats["edges"] = half.count()
        stats["wedge_pairs"] = int(
            deg.agg(
                F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long")
            ).first()[0]
        )
        half_str = half.select(
            F.concat(F.lit("c"), F.col("cust")).alias("cust"),
            F.concat(F.lit("s"), F.col("supp")).alias("supp"),
        )
        t0 = time.time()
        exact = [
            (r.node_a, r.node_b) for r in lp_exact_core(half_str).collect()
        ]
        stats["t_exact_wedge"] = round(time.time() - t0, 2)
        t0 = time.time()
        lsh = [
            (r.node_a, r.node_b) for r in lp_lsh_core(half).collect()
        ]
        stats["t_lsh_banded"] = round(time.time() - t0, 2)
        stats["recall_top20"] = round(
            len(set(exact) & set(lsh)) / max(len(exact), 1), 3
        )
        stats["speedup_lsh"] = round(
            stats["t_exact_wedge"] / stats["t_lsh_banded"], 2
        )
        out[tag] = stats
        print(f"# lp_sparse {tag} (n_sup={n_sup}): {stats}", file=sys.stderr)
    return out


def build_cc_chain(spark, n_nodes: int, diameter: int) -> str:
    """Materialize a pure-chain CC fixture with CONTROLLED diameter:
    chain edges k→k+1 broken at multiples of (diameter+1), so every
    component is exactly a path of that diameter.  The controlled
    knob is the point: star contraction's round count depends on
    log(diameter), label propagation's on diameter itself — the probe
    sweeps diameter at fixed volume AND volume at fixed diameter to
    separate the two effects.  (The registered query's fixture adds
    shortcut edges for oracle richness; here the diameter must be
    exact.)"""
    out = f"{SCALE_ROOT}/cc_chain_{n_nodes}_d{diameter}"
    if not os.path.exists(f"{out}/edges.parquet/_SUCCESS"):
        ids = spark.range(1, n_nodes + 1).select(F.col("id"))
        chain = ids.filter(
            (F.col("id") % (diameter + 1) != 0) & (F.col("id") < n_nodes)
        ).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        chain.repartition(32).write.mode("overwrite").parquet(
            f"{out}/edges.parquet"
        )
    return out


def _cc_one(spark, n_nodes: int, diameter: int, run_labelprop: bool) -> dict:
    from go_otel_clickhouse_ingestor_spark.operators import graph as G

    sf = build_cc_chain(spark, n_nodes, diameter)
    edges = spark.read.parquet(f"{sf}/edges.parquet")
    edges.count()  # warm
    stats = {"nodes": n_nodes, "diameter": diameter, "edges": edges.count()}
    t0 = time.time()
    star = G.star_contraction(edges)
    star_fp = star.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("s"),
    ).first()
    stats["t_star"] = round(time.time() - t0, 2)
    if run_labelprop:
        nodes = spark.range(1, n_nodes + 1).select(F.col("id").alias("node"))
        # label prop's production cap assumes shallow near-dup graphs;
        # the probe raises it so the diameter cost is MEASURED, not
        # errored (the cap firing at 25 rounds on diameter 400 is
        # itself the point)
        saved = G._MAX_ITERS
        G._MAX_ITERS = diameter  # 4 hops/round: diameter/4 + slack
        try:
            t0 = time.time()
            lp = G.connected_components(nodes, edges)
            lp_fp = lp.filter(F.col("node") != F.col("label")).agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("s"),
            ).first()
            stats["t_labelprop"] = round(time.time() - t0, 2)
        finally:
            G._MAX_ITERS = saved
        stats["maps_agree"] = (star_fp["c"], str(star_fp["s"])) == (
            lp_fp["c"],
            str(lp_fp["s"]),
        )
        stats["speedup_star"] = round(stats["t_labelprop"] / stats["t_star"], 2)
    return stats


def cc_lp_probe(spark, n: int, diameter: int = 12) -> dict:
    """Volume scaling point for the r16 ``connected_components`` (semi-
    join condensation + partition-local union-find): chain components of
    FIXED shallow diameter (the near-dup regime) at 200k and 200k×n
    nodes.  The claim under test: per-round state is bounded by the
    pair graph and the round count tracks the (fixed) component
    diameter, not the volume — so per-unit cost must stay ≈ flat.
    Star-contraction's multiset checksum cross-checks the labels at
    both sizes."""
    from go_otel_clickhouse_ingestor_spark.operators import graph as G

    base_nodes = 200_000
    out: dict = {"base_nodes": base_nodes, "n": n, "diameter": diameter}
    for key, nodes_n in (("at1", base_nodes), ("atN", base_nodes * n)):
        sf = build_cc_chain(spark, nodes_n, diameter)
        edges = spark.read.parquet(f"{sf}/edges.parquet")
        edges.count()  # warm
        nodes = spark.range(1, nodes_n + 1).select(F.col("id").alias("node"))
        t0 = time.time()
        lp = G.connected_components(nodes, edges)
        lp_fp = lp.filter(F.col("node") != F.col("label")).agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("s"),
        ).first()
        dt = round(time.time() - t0, 2)
        star_fp = G.star_contraction(edges).filter(
            F.col("node") != F.col("label")
        ).agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("s"),
        ).first()
        out[key] = {
            "nodes": nodes_n,
            "t_labelprop": dt,
            "maps_agree": (lp_fp["c"], str(lp_fp["s"]))
            == (star_fp["c"], str(star_fp["s"])),
        }
        print(f"# cc_lp {key}: {out[key]}", file=sys.stderr)
    out["ratio"] = round(out["atN"]["t_labelprop"] / out["at1"]["t_labelprop"], 2)
    out["per_unit"] = round(out["ratio"] / n, 4)
    return out


def cc_star_probe(spark, n: int) -> dict:
    """Star contraction vs min-label propagation on controlled-diameter
    chain graphs: (a) diameter sweep 40 → 400 at fixed volume — label
    prop's wall time must track diameter while star's tracks its log;
    (b) volume sweep 1× → n× at fixed diameter 400 — star's ratio must
    track data, not rounds.  Component maps are cross-checked by
    multiset checksum wherever both run.  The evidence row for
    graph_connected_components_star's claim that diameter-bound
    propagation loses on chain-y graphs."""
    base_nodes = 200_000
    out: dict = {"base_nodes": base_nodes, "n": n}
    out["d40_at1"] = _cc_one(spark, base_nodes, 40, run_labelprop=True)
    out["d400_at1"] = _cc_one(spark, base_nodes, 400, run_labelprop=True)
    out["d400_atN"] = _cc_one(spark, base_nodes * n, 400, run_labelprop=False)
    out["d400_atN"]["ratio_star"] = round(
        out["d400_atN"]["t_star"] / out["d400_at1"]["t_star"], 2
    )
    for k in ("d40_at1", "d400_at1", "d400_atN"):
        print(f"# cc_star {k}: {out[k]}", file=sys.stderr)
    return out


def dtw_topk_stats(spark, sf_dir: str) -> dict:
    """LB_Keogh prune-funnel diagnostic for events_series_dtw_topk:
    how many users does the bound + seed-threshold eliminate before
    any DP runs?  (The probe re-executes the search's bound/seed
    stages standalone so the survivor count is observable — the query
    itself never materializes it.)"""
    from pyspark.sql import functions as F

    from go_otel_clickhouse_ingestor_spark.operators import timeseries as T

    t0 = time.time()
    seqs = T._aligned_seqs(spark, sf_dir).localCheckpoint(eager=True)
    bounds = T._dtw_bounds(seqs).localCheckpoint(eager=True)
    total = bounds.count()
    seed = bounds.orderBy("ub", "user_id").limit(T._DTW_TOPK).select("user_id")
    seed_dtw = seed.join(seqs, "user_id").mapInPandas(
        T._dtw_map, schema="user_id long, n_days long, dtw double, l1_diag double"
    )
    tau = seed_dtw.agg(F.max("dtw")).collect()[0][0]
    surv_ids = bounds.filter(F.col("lb") <= tau + T._LB_EPS).select("user_id")
    survivors = surv_ids.count()
    # early-abandoning measurement (VERDICT r13 ask #2): run the EA
    # kernel over the survivors and aggregate per-batch abandonment
    # stats distributed — never collecting the series themselves
    import numpy as np
    import pandas as pd

    def ea_stats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["za"]])
            B = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["zb"]])
            dtw, rows_run = T.dtw_band_batch_ea(A, B, T._DTW_BAND, float(tau))
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "abandoned": [int((~np.isfinite(dtw)).sum())],
                    "rows_run": [int(rows_run.sum())],
                    "rows_full": [len(pdf) * A.shape[1]],
                }
            )

    ea = {"n": 0, "abandoned": 0, "rows_run": 0, "rows_full": 0}
    if tau is not None:
        agg = (
            surv_ids.join(seqs, "user_id")
            .mapInPandas(
                ea_stats,
                schema="n long, abandoned long, rows_run long, rows_full long",
            )
            .agg(
                F.sum("n"), F.sum("abandoned"), F.sum("rows_run"), F.sum("rows_full")
            )
            .collect()[0]
        )
        ea = dict(zip(("n", "abandoned", "rows_run", "rows_full"), agg))
    return {
        "users": total,
        "survivors": survivors,
        "prune_rate": round(1.0 - survivors / total, 4) if total else None,
        "tau": round(tau, 4) if tau is not None else None,
        "abandon_rate": round(ea["abandoned"] / ea["n"], 4) if ea["n"] else None,
        "dp_rows_saved": (
            round(1.0 - ea["rows_run"] / ea["rows_full"], 4) if ea["rows_full"] else None
        ),
        "t_funnel": round(time.time() - t0, 2),
    }


def build_dtw_planted(spark, n: int) -> str:
    """The planted-match regime the UCR-style pruned search exists
    for: 2000·n users over a 30-day calendar — 5% 'trackers' whose
    daily series follows a 15-day fleet seasonality with small noise
    (close matches: small DTW to the fleet curve) and 95% noise users
    (uniform daily values, no shape).  The fleet total is
    tracker-dominated in SHAPE (noise users' fluctuations average out
    at √N), so τ lands near the trackers' tiny distances and the
    envelope bound can actually cut.  All noise is hash-derived —
    deterministic fixture, no RNG."""
    out = f"{SCALE_ROOT}/dtw_planted_x{n}"
    if os.path.exists(f"{out}/events.parquet/_SUCCESS"):
        return out
    n_users, days = 2000 * n, 30
    grid = (
        spark.range(n_users)
        .selectExpr("id as user_id")
        .crossJoin(spark.range(days).selectExpr("id as d"))
    )
    ev = grid.selectExpr(
        "user_id * 100 + d as event_id",
        "timestamp'2024-06-01 12:00:00' + make_interval(0,0,0,cast(d as int),0,0,0) as ts",
        "user_id",
        "'click' as event_type",
        # hash-uniform u in [0,1)
        "(pmod(xxhash64(user_id, d), 1000000) / 1000000.0d) as u",
        "d",
    ).selectExpr(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        """case when user_id % 20 = 0
             then 1000.0d * (2.0d + sin(2.0d * pi() * d / 15.0d)) + 10.0d * (u - 0.5d)
             else 2000.0d + 2000.0d * (u - 0.5d)
           end as value""",
        "'{}' as props",
    )
    ev.repartition(max(n, 4)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    return out


def dtw_topk_probe(spark, n: int) -> dict:
    """Both regimes of the pruned DTW search, timed at 1× and n× users
    (calendar fixed — the 100 TB shape):

    - ``noise``: the standard scaled events fixture, where NO user
      genuinely tracks the fleet curve — τ is necessarily large, the
      envelope bound prunes ~0%, and the value of the probe is showing
      the search never does worse than the exhaustive scan.
    - ``planted``: the seasonality fixture with real close matches —
      the regime the optimization exists for; prune rate should be
      high and grow none worse with scale."""
    from go_otel_clickhouse_ingestor_spark.registry import load_all

    reg = load_all()
    out = {}
    for regime, builder in (("noise", build_scaled), ("planted", build_dtw_planted)):
        r = {}
        for tag, sf in (("at1", builder(spark, 1)), (f"at{n}", builder(spark, n))):
            t0 = time.time()
            rows = reg["events_series_dtw_topk"].fn(spark, sf).count()
            tq = time.time() - t0
            stats = dtw_topk_stats(spark, sf)
            stats["t_query"] = round(tq, 2)
            stats["rows"] = rows
            r[tag] = stats
            print(f"# dtw_topk {regime} {tag}: {stats}", file=sys.stderr)
        if r["at1"]["t_query"]:
            r["ratio"] = round(r[f"at{n}"]["t_query"] / r["at1"]["t_query"], 2)
        out[regime] = r
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "dtw_topk":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        print(json.dumps({"dtw_topk": dtw_topk_probe(get_spark("dtw-topk-probe"), n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "cc_lp":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        spark = get_spark("scale-probe")
        spark.range(32).mapInPandas(lambda it: it, "id long").count()
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        print(json.dumps({"cc_lp": cc_lp_probe(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "cc_star":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        spark = get_spark("scale-probe")
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        print(json.dumps({"cc_star": cc_star_probe(spark, n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "lp_sparse":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        print(json.dumps({"lp_sparse": lp_sparse_probe(get_spark("lp-sparse-probe"), n)}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        print(json.dumps({"skew": skew_stress(get_spark("skew-probe"))}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "near_index":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        spark = get_spark("near-index-probe")
        print(json.dumps({"near_index": {"n": n, **near_index_probe_scale(spark, n)}}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "linear100":
        from go_otel_clickhouse_ingestor_spark.session import get_spark

        n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        ops = sys.argv[3:] or ["dedup_near_e2e", "dedup_minhash_lsh", "text_quality_score"]
        spark = get_spark("linear100-probe")
        spark.range(32).mapInPandas(lambda it: it, "id long").count()
        print(json.dumps({"linear100": {"n": n, "ops": linear100_probe(spark, n, ops)}}))
        return
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
