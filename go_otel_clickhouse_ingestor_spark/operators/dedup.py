"""Deduplication operators for training-data pipelines (BASELINE.json
north-star): exact, MinHash-LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Scale design (100 TB):

- **exact**: groupBy on the md5 fingerprint (not the raw text!) so the
  shuffle carries 16-byte keys, and the keeper is min(doc_id) via
  ``min_by`` — one partial-aggregated shuffle, no window sort.
- **MinHash-LSH**: the linear-scale path for near-dup — signatures are
  computed map-side, candidate pairs only materialize inside an LSH
  band bucket (shuffle keyed on (band, bucket-hash)).  Never a
  cross join.
- **n-gram Jaccard**: the *exact* verifier. Shingle-explode + same-key
  join; fenced to intra-``source`` blocking here — at scale you run it
  only on LSH candidate pairs.
- **SimHash**: 64-bit signature via xxhash64 token hashes folded with
  bit arithmetic — all JVM expressions; near-dups are signature pairs
  within Hamming distance k (bit_count(a XOR b)).
- **embedding cosine**: blocked by ``label`` (stand-in for a coarse
  ANN bucket); exact cosine within the block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import query
from ..tables import table


def fast_tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text, codegen-friendly.

    Equivalent to :func:`..text.tokens` (trim + split never produces
    empty tokens on non-empty text) but avoids the interpreted
    higher-order ``filter`` lambda — measurably faster in the shingle
    hot path.  Empty/whitespace-only text yields ``[""]``, which the
    callers drop via their ``size(grams) > 0`` filters."""
    return F.split(F.trim(F.lower(text)), "\\s+")


#: Bounded LRU of persisted intermediates: each distinct logical plan
#: (per sf_dir × per query) would otherwise hold a session-lifetime
#: cache entry — unbounded growth in long sessions / bench loops.
_PERSISTED: list[DataFrame] = []
_PERSISTED_CAP = 8


def materialized(df: DataFrame) -> DataFrame:
    """Persist a multiply-consumed intermediate (MEMORY_AND_DISK).

    Spark re-evaluates a DataFrame subtree once per consumer branch —
    a self-joining LSH pipeline would tokenize + shingle the corpus
    3-4×.  At 100 TB this intermediate is a materialized signature
    table (checkpoint / persisted dataset); at test scale a persist
    gives the same single-evaluation semantics.  Spark dedupes cache
    entries by logical plan, so repeated query invocations reuse one
    entry rather than piling up copies — but DISTINCT plans (another
    sf_dir, another query) each add one, so entries are tracked in a
    small FIFO and evicted beyond ``_PERSISTED_CAP``: old entries have
    been consumed by the time a new query persists its own
    intermediates.  ``release_persisted()`` drops everything eagerly
    (bench/test teardown)."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    while len(_PERSISTED) > _PERSISTED_CAP:
        _PERSISTED.pop(0).unpersist(blocking=False)
    return df


#: SparkContext broadcasts created per query invocation (centroid
#: blocks, collected query sets).  Tracked like ``_PERSISTED`` so
#: repeated bench invocations don't accumulate broadcast blocks until
#: the ContextCleaner happens to GC them (r15 ADVICE).  ``unpersist``
#: (not ``destroy``): a re-counted plan that still references one
#: simply re-ships it from the driver.
_BROADCASTS: list = []


def tracked_broadcast(spark, value):
    """``sparkContext.broadcast`` with release via ``release_persisted``."""
    bc = spark.sparkContext.broadcast(value)
    _BROADCASTS.append(bc)
    while len(_BROADCASTS) > _PERSISTED_CAP:
        _BROADCASTS.pop(0).unpersist(blocking=False)
    return bc


def release_persisted() -> None:
    """Eagerly unpersist every intermediate still tracked."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=False)
    while _BROADCASTS:
        _BROADCASTS.pop().unpersist(blocking=False)


def gram_hashes(
    d: DataFrame, keep: tuple[str, ...] = (), distinct: bool = True
) -> DataFrame:
    """64-bit-hashed 3-gram shingles: one row per (doc_id, gram hash),
    plus any ``keep`` passthrough columns; per-doc distinct by default.

    Pass ``distinct=False`` when the consumer is duplicate-insensitive
    — MinHash is (a repeated gram cannot change a min), and
    ``collect_set`` dedupes on its own — to skip a whole corpus-sized
    shuffle.

    Deliberately lambda-free: an earlier formulation built shingles
    with ``transform``/``element_at`` LAMBDAS, which Spark evaluates
    *interpreted* (outside whole-stage codegen) and re-inlines per
    consumer — it dominated the dedup bench.  This form explodes the
    token INDEX sequence and slices with plain ``element_at(ts, i)``
    column indexing (codegen, no lambda) — the text_trigram_lm_score
    substring trick applied to word shingles.  A window-``lead``
    formulation sat in between (r15 optimization round): correct and
    codegen, but its ``partitionBy(doc_id) orderBy(pos)`` SHUFFLED AND
    SORTED the whole token stream before a single gram existed —
    measured as ~70% of dedup_ngram_jaccard's runtime at sf0.1, and a
    corpus-sized exchange at 100 TB.  This form builds grams entirely
    map-side (guide §2.4).

    Scale: zero shuffles here; the only exchange is the consumer's own
    (the per-doc distinct below when ``distinct=True``).  fast_tokens
    on non-empty trimmed text never yields empty tokens; the
    whitespace-only edge case yields [""], which ``size >= 3`` drops
    exactly as the old ``t != ''`` filter did."""
    out = (
        d.select("doc_id", *keep, fast_tokens(F.col("text")).alias("ts"))
        .filter(F.size("ts") >= 3)
        .select(
            "doc_id",
            *keep,
            "ts",
            F.explode(F.sequence(F.lit(1), F.size("ts") - 2)).alias("i"),
        )
        .select(
            "doc_id",
            *keep,
            F.xxhash64(
                F.concat_ws(
                    " ",
                    F.element_at("ts", F.col("i")),
                    F.element_at("ts", F.col("i") + 1),
                    F.element_at("ts", F.col("i") + 2),
                )
            ).alias("gh"),
        )
    )
    return out.dropDuplicates(["doc_id", "gh"]) if distinct else out


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one keeper (min doc_id) per normalized-text
    fingerprint.  The groupBy key is the 16-byte md5, not the document
    body, so at 100 TB the shuffle moves ~32 B/row instead of ~2 KB."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
    return (
        d.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in range(1, greatest(len(toks) - 1, 1))]) AS grams
      FROM tok
    ),
    e AS (SELECT doc_id, source, unnest(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM e a JOIN e b ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(grams) AS sz FROM sh)
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 6) AS jaccard
    FROM inter
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (≥ 0.3), blocked by
    ``source``.  This is the exact verifier the MinHash path
    approximates; at scale it runs only on LSH candidate pairs, here it
    runs on source-blocked pairs so it stays oracle-checkable."""
    d = table(spark, sf_dir, "documents")
    # Hashed-gram rows (64-bit xxhash64 of the gram string): joining on
    # 8-byte hashes instead of gram text moves ~4× less shuffle data
    # and collisions are negligible, so counts — and thus the Jaccard
    # values the oracle checks — are identical.  Persisted because the
    # self-join + size lookup consume it three times.
    e = materialized(gram_hashes(d, keep=("source",)))
    a = e.alias("a")
    b = e.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    jac = F.col("n_common") / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
    return (
        inter.join(sz.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sz.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.3)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


#: MinHash signature length and banding: 24 hashes = 12 bands × 2 rows.
#: AND-OR banding: a pair is a candidate iff BOTH hashes of at least one
#: band agree.  P(candidate | jaccard j) = 1-(1-j²)^12 — 0.97 at j=0.5,
#: 0.9995 at j=0.7, yet only ~10⁻³ at the j≈0.01 of unrelated docs.
_MINHASH_K = 24
_MINHASH_BANDS = 12


@query("dedup_minhash_lsh")  # rows-only: xxhash64 hash family is engine-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs — the linear-scale path, as pure
    DataFrame expressions (no ml.feature pipeline):

    1. signature: 24 minhashes per doc, ``min(xxhash64(gram, i))`` per
       hash function i — one partial-aggregated groupBy(doc_id), all
       map-side combinable.
    2. candidates: explode 12 two-hash bands, self-join on exact band
       value — the shuffle keys on (band, v1, v2); pairs only
       materialize inside a bucket, never an unblocked self-join.
    3. verify: exact Jaccard via ``array_intersect`` on the 64-bit
       hashed-shingle sets of candidate pairs only (collision odds at
       64 bits are negligible); keep pairs ≥ 0.3.

    100 TB story: stages 1-2 are linear in corpus size; stage 3 is
    linear in *candidates* (LSH-bounded).  This replaces an earlier
    ``approxSimilarityJoin`` formulation whose per-candidate sparse
    keyDistance over 2^18-dim vectors dominated the whole bench (~70 s
    at sf0.1); this plan runs in seconds.  Tests assert recall ≥ 0.8
    against the exact ``dedup_ngram_jaccard`` pairs."""
    d = table(spark, sf_dir, "documents")
    # Hashed-gram rows (16 bytes each): the K minhashes derive from the
    # 8-byte gram hash (cheap fixed-width re-hash, not K string
    # hashes), and the same rows feed the exact verify stage.
    # distinct=False: duplicate grams can't change a min, and the
    # verify's collect_set dedupes — skips one corpus-sized shuffle.
    g = materialized(gram_hashes(d, distinct=False))
    mins = materialized(
        g.groupBy("doc_id").agg(
            F.collect_set("gh").alias("ghs"),
            *[
                F.min(F.xxhash64("gh", F.lit(i))).alias(f"m{i}")
                for i in range(_MINHASH_K)
            ],
        )
    )
    bands = mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.col(f"m{2 * j}").alias("v1"),
                        F.col(f"m{2 * j + 1}").alias("v2"),
                    )
                    for j in range(_MINHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "bv.band", "bv.v1", "bv.v2")
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.v1") == F.col("y.v1"))
            & (F.col("x.v2") == F.col("y.v2"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ga = mins.select(F.col("doc_id").alias("doc_a"), F.col("ghs").alias("grams_a"))
    gb = mins.select(F.col("doc_id").alias("doc_b"), F.col("ghs").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    jac = inter / union
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .filter(jac >= 0.3)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard_sim"))
    )


#: Band-bucket population cap: a (band, value) bucket with more members
#: than this is dropped from candidate generation.  Mega-buckets come
#: from boilerplate (digit/punctuation-heavy bodies whose token sets
#: repeat corpus-wide) and contribute B²/2 candidate pairs each — the
#: superlinear FP floor the r2 scale probe measured (12.7× candidates at
#: 10× docs).  With the cap the 10× ratio drops to ~9× (SCALING.md).
#: The bucket-count table is bounded by the band value space
#: (4 × 2^16 ≈ 262k rows max), so the filter side always broadcasts.
_SIMHASH_BUCKET_CAP = 128


@query("dedup_simhash")  # rows-only: xxhash64 is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup candidate pairs within Hamming distance
    12, entirely in JVM expressions: per-token xxhash64, per-bit
    weighted vote via explode + sum, signature reassembly with
    shiftleft/bitwise-or, pair filter with bit_count(a ^ b).

    Scale: signature computation is a map + one groupBy(doc_id); the
    pair stage is banded LSH — 4 bands of 16 bits, candidates must
    agree exactly on at least one band (shuffle keys on (band, value),
    never an unblocked self-join), with over-populated buckets dropped
    (``_SIMHASH_BUCKET_CAP``) so boilerplate band values can't go
    quadratic."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(fast_tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "").withColumn("h", F.xxhash64("t"))
    # per-bit vote (+1 set / -1 clear) as an Arrow sufficient-statistic
    # kernel: each batch unpacks its token hashes into a (rows, 64) bit
    # matrix with one vectorized shift and emits per-doc PARTIAL votes
    # (doc_id, pos, v) — 64 rows per doc per batch.  The old form ran a
    # 64-column unrolled JVM aggregate over the exploded token stream;
    # the wide generated aggregate (not the explode) was the stage cost
    # — the same finding as the k-means argmin (guide §4.2).  Votes are
    # integer sums, so the kernel is exact and merge-order-proof; token
    # hashing stays in the JVM (engine hash = xxhash64, unchanged).
    def _vote_batches(batches):
        import numpy as np
        import pandas as pd

        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy().astype(np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            docs, inv = np.unique(pdf["doc_id"].to_numpy(), return_inverse=True)
            set_cnt = np.zeros((len(docs), 64), dtype=np.int64)
            np.add.at(set_cnt, inv, bits)
            n = np.bincount(inv, minlength=len(docs)).astype(np.int64)
            v = 2 * set_cnt - n[:, None]
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(docs, 64),
                    "pos": np.tile(np.arange(64, dtype=np.int32), len(docs)),
                    "v": v.ravel(),
                }
            )

    partial = tok.select("doc_id", "h").mapInPandas(
        _vote_batches, "doc_id long, pos int, v long"
    )
    # two tiny partial-agg'd shuffles (docs×64 rows, then docs rows)
    # reassemble the signature: bit pos is set iff the total vote > 0
    sigs = (
        partial.groupBy("doc_id", "pos")
        .agg(F.sum("v").alias("v"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") > 0,
                    F.expr("shiftleft(cast(1 as bigint), pos)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    # consumed 3× (bucket census + both self-join sides): persist so the
    # 64-vote signature pipeline runs once.
    bands = materialized(bands)
    hot = (
        bands.groupBy("band", "val")
        .count()
        .filter(F.col("count") > _SIMHASH_BUCKET_CAP)
        .select("band", "val")
    )
    bands = bands.join(F.broadcast(hot), ["band", "val"], "left_anti")
    a, b_ = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= 12)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 5) AS cos_sim
    FROM e a
    JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb)
                / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 5) >= 0.3
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.3) blocked by
    ``label`` — the coarse-bucket (IVF-style) pattern: exact cosine
    runs only inside a bucket, so the join shuffles on the bucket key
    and never goes quadratic across the corpus.

    The cosine is pure JVM expression work (no UDF), UNROLLED to the
    data's width (``similarity.dot``): a flat 64-term multiply-add
    chain stays inside whole-stage codegen, where the old
    ``aggregate``/``zip_with`` fold ran interpreted per element — that
    interpretation was ~90% of this query's runtime at sf0.1.  The
    addition order (left-associative, same as DuckDB's
    ``list_dot_product``) is unchanged, so the rounded value is
    cross-engine stable.  Each vector's norm is still computed ONCE
    before the join."""
    from .similarity import dot as vec_dot, embedding_dim

    raw = table(spark, sf_dir, "embeddings")
    dim = embedding_dim(raw)
    e = raw.withColumn(
        "nrm", F.sqrt(vec_dot(F.col("embedding"), F.col("embedding"), dim))
    )
    # Fan the probe side out to the session parallelism: the fixture is
    # ONE parquet file -> one input split, and a broadcast join
    # preserves input partitioning, so without this every pair cosine
    # runs in a single task (measured 6× slower at sf0.1).  At real
    # scale many input splits make this a no-op-cost rebalance.
    a = e.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = e.alias("b")
    sdot = vec_dot(F.col("a.embedding"), F.col("b.embedding"), dim)
    cos = F.round(sdot / (F.col("a.nrm") * F.col("b.nrm")), 5)
    scored = (
        a.join(
            F.broadcast(b),
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cos_sim"),
        )
    )
    # The materialization is an OPTIMIZER BARRIER, not just a cache:
    # without it Catalyst pushes `cos_sim >= 0.3` down into the
    # broadcast join as a residual condition, where the 64-term cosine
    # is evaluated per probed pair outside whole-stage codegen AND
    # recomputed by the projection above — measured 10× slower at
    # sf0.1.  Scoring in the projection and filtering the (ids, score)
    # table keeps the join condition trivial; the scored candidate
    # list is also exactly what downstream cluster resolution
    # (dedup_cluster_cc) re-consumes.
    return materialized(scored).filter(F.col("cos_sim") >= 0.3)


#: URL canonicalization pipeline, written once as (pattern, replacement)
#: steps applied in order on a lowercased URL: strip scheme, strip a
#: leading www., strip query + fragment, strip trailing slashes.
_URL_CANON_STEPS = [
    ("^https?://", ""),
    ("^www\\.", ""),
    ("[?#].*$", ""),
    ("/+$", ""),
]


@query(
    "dedup_url_canonical",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
             || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END)
             || 'Example.COM/' || source || '/doc/' || cast(doc_id % 200 AS VARCHAR)
             || (CASE doc_id % 3 WHEN 0 THEN '/?utm_source=feed&ref=x'
                                 WHEN 1 THEN '#section-2' ELSE '' END) AS url
      FROM documents
    ), canon AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url), '^https?://', ''), '^www\\.', ''),
               '[?#].*$', ''), '/+$', '') AS canonical_url
      FROM urls
    )
    SELECT canonical_url,
           count(*) AS n_variants,
           min(doc_id) AS keeper_doc_id
    FROM canon
    GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the crawl-pipeline step before any
    content hashing: scheme/case/www/query-string/fragment/trailing-slash
    variants of one resource collapse to a canonical key, keeping the
    lowest doc_id per group.

    The fixtures carry no URL column, so a deterministic URL is derived
    from (doc_id, source) with the variant classes injected — both
    engines build the identical raw string, so the oracle checks the
    canonicalizer, not the synthesis.  Scale: canonicalization is
    chained codegen regexes (map-only); the dedup is one partial+final
    hash agg on the canonical key — same shape as dedup_exact, the key
    is ~60 bytes instead of 16."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "https://").otherwise("HTTP://"),
        F.when(F.col("doc_id") % 5 == 0, "WWW.").otherwise(""),
        F.lit("Example.COM/"),
        F.col("source"),
        F.lit("/doc/"),
        (F.col("doc_id") % 200).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, "/?utm_source=feed&ref=x")
        .when(F.col("doc_id") % 3 == 1, "#section-2")
        .otherwise(""),
    )
    canon = F.lower(raw)
    for pat, repl in _URL_CANON_STEPS:
        canon = F.regexp_replace(canon, pat, repl)
    return (
        d.select(canon.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@query(
    "dedup_incremental_corpus",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ),
    base AS (SELECT fingerprint FROM fp WHERE doc_id % 10 < 8)
    SELECT f.doc_id, f.fingerprint
    FROM fp f
    WHERE f.doc_id % 10 >= 8
      AND NOT EXISTS (SELECT 1 FROM base b WHERE b.fingerprint = f.fingerprint)
    """,
)
def dedup_incremental_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW ingest batch against an existing
    corpus (doc_id % 10 splits stand in for corpus/batch): keep only
    new documents whose whitespace-normalized md5 fingerprint is absent
    from the corpus — a left-anti join on 16-byte keys.  At 100 TB the
    corpus side is a materialized fingerprint table (never re-reads
    document text) and the anti join shuffles only the new batch's
    fingerprints: incremental cost is O(batch), not O(corpus)."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
    fps = d.select("doc_id", fp.alias("fingerprint"))
    base = fps.filter(F.col("doc_id") % 10 < 8).select(
        F.col("fingerprint").alias("base_fp")
    )
    return (
        fps.filter(F.col("doc_id") % 10 >= 8)
        .join(base, F.col("fingerprint") == F.col("base_fp"), "left_anti")
    )


def _near_sigs(df: DataFrame) -> DataFrame:
    """MinHash signature + gram-set table for the near-dup index:
    (doc_id, ghs, m0..m{K-1}) — one partial-aggregated groupBy over the
    batch's hashed grams, O(batch)."""
    g = gram_hashes(df, distinct=False)
    return g.groupBy("doc_id").agg(
        F.collect_set("gh").alias("ghs"),
        *[
            F.min(F.xxhash64("gh", F.lit(i))).alias(f"m{i}")
            for i in range(_MINHASH_K)
        ],
    )


def _near_bands(sig: DataFrame) -> DataFrame:
    """LSH band rows (doc_id, band, v1, v2) from a signature table."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.col(f"m{2 * j}").alias("v1"),
                        F.col(f"m{2 * j + 1}").alias("v2"),
                    )
                    for j in range(_MINHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "bv.band", "bv.v1", "bv.v2")


def _near_probe(
    corpus_bands: DataFrame, corpus_grams: DataFrame, batch_sig: DataFrame
) -> DataFrame:
    """Probe a signatured batch against a corpus band/gram index and
    emit one decision row per batch doc: its best corpus match
    (Jaccard ≥ 0.3, ties to the smallest corpus id) or is_new = true.
    Shared by ``dedup_near_incremental`` (in-query index from the
    fixture split) and the MAINTAINED parquet index
    (``near_index_probe``); the scale contract — batch bands
    broadcast, corpus scanned map-side, verify joins broadcast the
    LSH-bounded side — lives here once."""
    probe = _near_bands(batch_sig).select(
        F.col("doc_id").alias("batch_doc"), "band", "v1", "v2"
    )
    # broadcast the BATCH bands: the corpus index is the big side and
    # is probed map-side — zero corpus shuffle
    cand = (
        corpus_bands.join(F.broadcast(probe), ["band", "v1", "v2"])
        .select(F.col("doc_id").alias("corpus_doc"), "batch_doc")
        .distinct()
    )
    ga = corpus_grams.select(
        F.col("doc_id").alias("corpus_doc"), F.col("ghs").alias("grams_c")
    )
    gb = batch_sig.select(
        F.col("doc_id").alias("batch_doc"), F.col("ghs").alias("grams_b")
    )
    inter = F.size(F.array_intersect("grams_c", "grams_b"))
    jac = inter / (F.size("grams_c") + F.size("grams_b") - inter)
    # exact-verify without EVER shuffling a corpus- or batch-sized
    # side (ADVICE r14: the unhinted join let Catalyst sort-merge the
    # corpus gram table): (1) the LSH-bounded pair set broadcasts into
    # the corpus gram table, which is scanned map-side — this is the
    # "fetch the touched postings" step, pairs are two longs each;
    # (2) the surviving (pair + grams_c) rows — LSH-bounded COUNT, and
    # the only gram sets carried are the touched corpus docs' —
    # broadcast into the batch gram table, scanned map-side likewise.
    # At an ingest-batch size where the touched gram sets outgrow the
    # broadcast budget, stage (2) degrades to a shuffle of two
    # O(batch) sides — still never O(corpus).
    cva = ga.join(F.broadcast(cand), "corpus_doc")
    verified = (
        gb.join(F.broadcast(cva), "batch_doc")
        .filter(jac >= 0.3)
        .select("batch_doc", "corpus_doc", F.round(jac, 6).alias("jaccard_sim"))
    )
    from pyspark.sql.window import Window

    # bounded: ranks each batch doc's verified matches (LSH-bounded)
    wr = Window.partitionBy("batch_doc").orderBy(
        F.col("jaccard_sim").desc(), F.col("corpus_doc")
    )
    best = verified.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") == 1
    )
    return (
        batch_sig.select(F.col("doc_id").alias("batch_doc"))
        # the match table is ≤ one 3-scalar row per MATCHED batch doc
        # (LSH-bounded) — broadcast it so the emission join scans the
        # batch map-side instead of sort-merging two batch-sized sides
        .join(
            F.broadcast(best.select("batch_doc", "corpus_doc", "jaccard_sim")),
            "batch_doc",
            "left",
        )
        .select(
            F.col("batch_doc").alias("doc_id"),
            F.col("corpus_doc").alias("matched_doc"),
            "jaccard_sim",
            F.col("corpus_doc").isNull().alias("is_new"),
        )
    )


def near_index_write(sig: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a signatured document set into the MAINTAINED near-dup
    index at ``path``: ``bands/`` (doc_id, band, v1, v2) partitioned
    for map-side probes, and ``grams/`` (doc_id, ghs).  With
    ``mode="append"`` this is the per-ingest maintenance step — after
    batch N's decisions are taken, its bands/grams APPEND to the index
    (two O(batch) parquet writes; the corpus is never re-signatured or
    rewritten), and batch N+1 probes the updated index (VERDICT r14
    #3).  At 100 TB the same two tables live in the lake and the
    append is a partition add."""
    _near_bands(sig).write.mode(mode).parquet(f"{path}/bands")
    sig.select("doc_id", "ghs").write.mode(mode).parquet(f"{path}/grams")


def near_index_probe(
    spark: SparkSession, path: str, batch: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Probe a raw (doc_id, text, ...) ingest batch against the
    maintained index at ``path``.  Returns ``(decisions, batch_sig)``
    — one decision row per batch doc (``_near_probe``'s contract), and
    the batch's signature table so the caller can
    ``near_index_write(batch_sig, path, mode="append")`` AFTER acting
    on the decisions.  Incremental cost is O(batch): only the batch is
    signatured; the index is scanned (never shuffled) by the broadcast
    band probe and the broadcast-bounded verify."""
    batch_sig = materialized(_near_sigs(batch))
    return (
        _near_probe(
            spark.read.parquet(f"{path}/bands"),
            spark.read.parquet(f"{path}/grams"),
            batch_sig,
        ),
        batch_sig,
    )


@query("dedup_near_incremental")  # rows-only: xxhash64 band index is engine-specific
def dedup_near_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup of a new ingest batch against an existing
    corpus — ``dedup_incremental_corpus``'s md5 anti-join catches only
    byte-identical re-ingests; this is the fuzzy tier the same pipeline
    runs next (re-crawls with boilerplate drift, truncation, tracking
    params): probe the batch's MinHash LSH bands against the CORPUS
    BAND INDEX, exact-verify only the bucket collisions, and emit one
    row per batch doc — its best corpus match (Jaccard ≥ 0.3, ties to
    the smallest corpus id) or ``is_new = true``.

    The incremental-cost contract, stage by stage: the corpus band
    index (band, v1, v2 → doc_id) and gram sets are MAINTAINED tables
    at 100 TB (built here in-query from the doc_id % 10 < 8 split that
    stands in for the corpus); per ingest the engine (1) signatures
    only the batch (O(batch) grams), (2) BROADCASTS the batch's bands
    and probes the corpus index map-side — the corpus-sized side is
    scanned, never shuffled, (3) exact-verifies candidate pairs only
    (LSH-bounded), joining gram sets for just the touched corpus docs.
    Nothing anywhere costs O(corpus) shuffle.

    Rows-only (the xxhash64 band family is engine-specific, the
    dedup_minhash_lsh rule); the pytest gate recomputes the EXACT
    batch×corpus 3-gram-Jaccard best matches in DuckDB and asserts the
    LSH-fed decisions land the identical match set on the fixture's
    planted near-dups — measured end-to-end recall 1.0, the
    dedup_near_e2e evidence standard.  Since round 15 the index really
    IS maintained: ``near_index_write``/``near_index_probe`` persist
    bands+grams as appendable parquet and the two-batch pytest proves
    batch N+1's decisions against the batch-N-updated index; this
    query keeps the in-query split form so the driver can check it
    without filesystem state, through the same ``_near_probe``."""
    d = table(spark, sf_dir, "documents")
    corpus_sig = materialized(_near_sigs(d.filter(F.col("doc_id") % 10 < 8)))
    batch_sig = materialized(_near_sigs(d.filter(F.col("doc_id") % 10 >= 8)))
    return _near_probe(
        _near_bands(corpus_sig),
        corpus_sig.select("doc_id", "ghs"),
        batch_sig,
    )


@query(
    "dedup_exact_keep_best",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, n_chars, lang, md5(text) AS content_hash
      FROM documents
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY content_hash
                                ORDER BY n_chars DESC, doc_id ASC) AS rk,
             count(*)     OVER (PARTITION BY content_hash)         AS n_copies
      FROM hashed
    )
    SELECT content_hash, n_copies, doc_id AS keeper_doc_id,
           n_chars AS keeper_n_chars, lang AS keeper_lang
    FROM ranked WHERE rk = 1
    """,
)
def dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with QUALITY-AWARE survivor selection: identical
    texts collapse to one row, keeping the longest copy (ties to the
    lowest doc_id) instead of ``dedup_exact``'s min-id rule — the
    curation policy real pipelines use, where duplicates differ in
    truncation and you keep the fullest.  One window over the content
    hash (partitioned — never global); at 100 TB this is the same
    single-shuffle shape as dedup_exact with the survivor policy as
    the window order, and extending the policy (quality score, source
    priority) only changes the ORDER BY."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    h = d.select("doc_id", "n_chars", "lang", F.md5("text").alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("content_hash")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") == 1)
        .select(
            "content_hash",
            "n_copies",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("n_chars").alias("keeper_n_chars"),
            F.col("lang").alias("keeper_lang"),
        )
    )


@query(
    "dedup_fuzzy_edit_distance",
    oracle="""
    WITH blocked AS (
      SELECT doc_id, lang, lower(substr(text, 1, 16)) AS blk,
             lower(substr(text, 1, 64)) AS head
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head)::BIGINT AS edit_dist
    FROM blocked a
    JOIN blocked b ON a.blk = b.blk AND a.lang = b.lang
                   AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 8
    """,
)
def dedup_fuzzy_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection — the third similarity measure
    in the near-dup family (set overlap: minhash/jaccard; bitwise:
    simhash; here: character edits, which catches small in-place
    corruptions the others miss).  Blocking keeps it non-quadratic:
    candidates must share (language, first-16-chars) — the prefix
    block plays the role of MinHash's band buckets — and the O(n²)
    levenshtein kernel runs only on 64-char heads of blocked pairs.
    At 100 TB the block key is the shuffle key (one co-partitioned
    self-join) and bucket sizes are bounded by prefix diversity; the
    same cap-and-verify escape as dedup_simhash applies if a prefix
    mega-bucket appears."""
    d = table(spark, sf_dir, "documents")
    blocked = d.select(
        "doc_id",
        "lang",
        F.lower(F.substring("text", 1, 16)).alias("blk"),
        F.lower(F.substring("text", 1, 64)).alias("head"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return materialized(
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("long").alias("edit_dist"),
        )
    ).filter(F.col("edit_dist") <= 8)


@query(
    "dedup_ngram_containment",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in range(1, greatest(len(toks) - 1, 1))]) AS grams
      FROM tok
    ),
    e AS (SELECT doc_id, source, unnest(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM e a JOIN e b ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(grams) AS sz FROM sh)
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / least(sa.sz, sb.sz), 6) AS containment
    FROM inter
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / least(sa.sz, sb.sz) >= 0.6
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT near-dup pairs (|A∩B| / min(|A|,|B|) ≥ 0.6)
    — the subset-duplication detector Jaccard structurally misses: a
    short doc quoted whole inside a long one scores near 1.0 here but
    can sit far below any usable Jaccard threshold because the union
    is dominated by the longer side.  (Broder's containment measure —
    the boilerplate/quotation case every LLM corpus hits.)  Same
    hashed-gram blocked self-join as dedup_ngram_jaccard — only the
    denominator changes — so the 100 TB story is identical: gram-
    blocked, never all-pairs, shuffle keyed on 8-byte gram hashes."""
    d = table(spark, sf_dir, "documents")
    e = materialized(gram_hashes(d, keep=("source",)))
    a = e.alias("a")
    b = e.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cont = F.col("n_common") / F.least(F.col("sa.sz"), F.col("sb.sz"))
    return (
        inter.join(sz.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sz.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(cont >= 0.6)
        .select("doc_a", "doc_b", "n_common", F.round(cont, 6).alias("containment"))
    )


@query(
    "dedup_cross_source",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS th FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.source AS source_a, b.source AS source_b
    FROM h a JOIN h b
      ON a.th = b.th AND a.doc_id < b.doc_id AND a.source <> b.source
    """,
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact duplicates: the same text appearing under
    DIFFERENT corpus sources — the cross-dump contamination check
    (CommonCrawl snapshot N ∩ snapshot N+1, or web ∩ curated) that
    per-source dedup passes structurally miss.  Content-hash self-join
    keyed on the digest (md5 here because the pair must match the
    oracle's digest; the scale path is xxhash64 as in dedup_exact)
    with the cross-source constraint as a residual — shuffle keyed on
    the hash, never all-pairs."""
    d = table(spark, sf_dir, "documents")
    h = materialized(d.select("doc_id", "source", F.md5("text").alias("th")))
    a = h.alias("a")
    b = h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.th") == F.col("b.th"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
    )


#: Tokens per dedup "paragraph" segment — the fixture corpus has no
#: newline structure, so the paragraph unit is a deterministic
#: fixed-width token window (real corpora split on '\n\n' instead; the
#: plan below is segmentation-agnostic).
SEGMENT_TOKENS = 12


@query(
    "dedup_paragraph_corpus",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    seg AS (
      SELECT doc_id,
             [ {{'i': i - 1,
                 's': array_to_string(
                        toks[((i-1)*{SEGMENT_TOKENS}+1):((i-1)*{SEGMENT_TOKENS}+{SEGMENT_TOKENS})], ' ')}}
               for i in range(1, cast(ceil(len(toks)/{SEGMENT_TOKENS}.0) AS BIGINT) + 1) ] AS segs
      FROM tok WHERE len(toks) > 0
    ),
    ex AS (SELECT doc_id, unnest(segs) AS u FROM seg),
    e AS (SELECT doc_id, u.i AS seg_idx, u.s AS seg FROM ex),
    k AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY md5(seg)
                                ORDER BY doc_id, seg_idx) AS rk
      FROM e
    )
    SELECT doc_id,
           count(*)::BIGINT                            AS n_segments,
           sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                      FILTER (WHERE rk = 1), '')       AS cleaned_text
    FROM k GROUP BY doc_id
    """,
)
def dedup_paragraph_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma/RefinedWeb-style paragraph-level corpus dedup: every doc is
    split into deterministic 12-token segments, a segment is kept only
    at its FIRST corpus-wide occurrence (ordered by doc_id, then
    position — so in-doc repeats dedup too), and each doc is
    reassembled from its surviving segments in order.

    Scale design: the keep-first decision is a window over
    ``md5(segment)`` — shuffle keyed on the 16-byte digest, occurrence
    lists per digest bounded by duplicate multiplicity, nothing ever
    all-pairs.  The winners-table alternative (min-struct aggregate +
    survivor join) was measured 2.3x slower at 10x — see the inline
    comment.  Reassembly is array_sort(collect_list(struct)) per doc —
    grouped by doc_id, bounded by document length."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
    segs = F.expr(
        f"transform(sequence(0, cast(ceil(size(toks)/{SEGMENT_TOKENS}.0) as int) - 1),"
        f" i -> array_join(slice(toks, i*{SEGMENT_TOKENS}+1, {SEGMENT_TOKENS}), ' '))"
    )
    e = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", F.posexplode(segs).alias("seg_idx", "seg"))
    )
    # Keep-first as a digest-keyed ranking window.  The alternative —
    # a min(struct(doc_id, seg_idx)) winners table joined back — was
    # implemented and MEASURED 2.3x slower at 10x corpus (scale_probe):
    # the survivor join re-shuffles the full exploded corpus on top of
    # the winners aggregate's own exchange, while the window pays ONE
    # corpus shuffle plus a per-digest sort bounded by duplicate
    # multiplicity (tiny).  Partial aggregation only wins when the
    # decision doesn't need to flow back to every occurrence.
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5("seg")).orderBy("doc_id", "seg_idx")
    k = e.withColumn("rk", F.row_number().over(w))
    return k.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum((F.col("rk") == 1).cast("int")).cast("long").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "  case when rk = 1 then struct(seg_idx, seg) end)), x -> x.seg)"
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )


@query("dedup_near_e2e")  # rows-only: LSH candidate recall is engine-specific
def dedup_near_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole near-dup pipeline as ONE composition — the shape a
    production corpus actually runs: MinHash-LSH candidates (banded,
    never all-pairs) → exact-Jaccard verification (already fused into
    dedup_minhash_lsh's output contract) → connected components over
    the verified pairs → per-doc cluster assignment with the smallest
    doc_id as keeper.  Output: every document with its cluster keeper,
    cluster size, and survivor flag.

    Rows-only by design (LSH candidate generation is seed/engine-
    specific), but the pytest gate is stronger than a hash: it
    recomputes the EXACT pipeline (corpus-wide n-gram Jaccard ≥ 0.3 +
    components in DuckDB) and asserts the LSH-fed composition lands
    the identical survivor set on the fixture corpus — i.e. measured
    end-to-end recall 1.0 on real (planted) near-dups, not just
    per-stage gates.  Scale: every stage is the documented linear
    path — banded LSH, pair-bounded verify, O(edges)-per-round CC."""
    from pyspark.sql.window import Window

    from .graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    nodes = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node")
    )
    comp = connected_components(nodes, edges)
    size = F.count(F.lit(1)).over(Window.partitionBy("label"))
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("keeper_doc_id"),
        size.cast("long").alias("cluster_size"),
        (F.col("node") == F.col("label")).alias("is_survivor"),
    )


@query(
    "dedup_repeated_passages",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     || ' ' || toks[i+3] || ' ' || toks[i+4]
                     for i in range(1, greatest(len(toks) - 3, 1))]) AS gram
      FROM tok
    ),
    rep AS (
      SELECT gram,
             count(DISTINCT doc_id) AS n_docs,
             count(*)               AS n_occ
      FROM sh GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT gram, n_docs, n_occ, rn FROM (
      SELECT gram, n_docs, n_occ,
             row_number() OVER (ORDER BY n_docs DESC, n_occ DESC,
                                gram ASC) AS rn
      FROM rep) t
    WHERE rn <= 50
    """,
)
def dedup_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally repeated passages: 5-token word sequences occurring in
    two or more DISTINCT documents, ranked by spread — the corpus-wide
    repeated-substring census behind Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), which removes
    verbatim passages (boilerplate, licenses, navigation chrome) that
    pairwise document dedup never sees because the hosting documents
    aren't similar ENOUGH overall.  The suffix-array construction in
    the paper is a single-machine algorithm; the relational form —
    shingle, group by gram, count distinct docs — is its shuffle-native
    equivalent at fixed n, and at 100 TB the gram hash partitions
    perfectly (the same explode + keyed-agg shape as text_tfidf).
    Spark side builds shingles with codegen HOFs (transform over
    sequence — no Python), counts ride one gram-keyed shuffle with
    map-side partial aggregation, and only grams seen in ≥2 docs
    survive to the (bounded) top-50 ranking."""
    from pyspark.sql.window import Window

    from .text import tokens

    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    grams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
                F.element_at(toks, i + 4),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(grams).alias("gram"))
    rep = (
        sh.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    w = Window.orderBy(
        F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("gram").asc()
    )
    return (
        rep.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 50)
        .select("gram", "n_docs", "n_occ", "rn")
    )


#: Fuzzy entity-match parameters: max edit distance accepted by the
#: verify, and the prefix-filter width — each string joins on its
#: (2·d_max + 1) globally-RAREST bigrams, so a candidate pair must
#: share a rare gram (the PPJoin/prefix-filtering idea: sort the
#: signature set by global frequency and index only the prefix; the
#: frequent grams — shared by half the catalog — never generate
#: pairs).
_FUZZY_D = 2
_FUZZY_PREFIX = 2 * _FUZZY_D + 1


@query(
    "dedup_fuzzy_levenshtein",
    oracle=f"""
    WITH cat AS (
      SELECT min(p_partkey) AS p_partkey, p_name FROM part GROUP BY p_name
    ),
    probe AS (
      SELECT p_partkey AS probe_key,
             substr(p_name, 1, (p_partkey % greatest(length(p_name) - 2, 1)) + 1)
             || substr(p_name, (p_partkey % greatest(length(p_name) - 2, 1)) + 3)
               AS probe_name
      FROM cat
    ),
    cg AS (
      SELECT DISTINCT p_partkey, gram FROM (
        SELECT p_partkey,
               unnest([substr(p_name, x, 2)
                       for x in range(1, length(p_name))]) AS gram
        FROM cat)
    ),
    df AS (SELECT gram, count(*) AS df FROM cg GROUP BY gram),
    cpfx AS (
      SELECT p_partkey, gram FROM (
        SELECT cg.p_partkey, cg.gram,
               row_number() OVER (PARTITION BY cg.p_partkey
                                  ORDER BY df.df, cg.gram) AS rn
        FROM cg JOIN df USING (gram))
      WHERE rn <= {_FUZZY_PREFIX}
    ),
    pg AS (
      SELECT DISTINCT probe_key, gram FROM (
        SELECT probe_key,
               unnest([substr(probe_name, x, 2)
                       for x in range(1, length(probe_name))]) AS gram
        FROM probe)
    ),
    ppfx AS (
      SELECT probe_key, gram FROM (
        SELECT pg.probe_key, pg.gram,
               row_number() OVER (PARTITION BY pg.probe_key
                                  ORDER BY coalesce(df.df, 0), pg.gram) AS rn
        FROM pg LEFT JOIN df USING (gram))
      WHERE rn <= {_FUZZY_PREFIX}
    ),
    cand AS (
      SELECT DISTINCT probe_key, p_partkey AS match_key
      FROM ppfx JOIN cpfx USING (gram)
    )
    SELECT probe_key, match_key,
           cast(levenshtein(pr.probe_name, c.p_name) AS BIGINT) AS dist
    FROM cand
    JOIN probe pr USING (probe_key)
    JOIN cat c ON c.p_partkey = match_key
    WHERE levenshtein(pr.probe_name, c.p_name) <= {_FUZZY_D}
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching by prefix-filtered edit distance — the
    dirty-catalog reconciliation primitive (match OCR'd / typo'd names
    back to a master catalog) and the edit-distance member of the
    set-similarity-join family (MinHash banding covers token sets;
    this covers CHARACTER-level noise).  A deterministic dirty probe
    set is derived in-query (each part name with one character
    deleted at a key-derived position — the planted-near-dup fixture
    rule, so every probe has a distance-1 true match), then matched
    back WITHOUT the quadratic all-pairs scan via PREFIX FILTERING
    (Chaudhuri et al. / PPJoin): rank each string's distinct bigrams
    by GLOBAL document frequency and index only the (2·d_max+1)
    rarest — frequent grams shared by half the catalog never generate
    candidates, so bucket sizes track gram rarity, not catalog size —
    and verify candidates with exact ``levenshtein`` (identical
    classic DP in Spark and DuckDB; probed).  Scale shape: two
    tokenize-explode passes, gram-keyed joins on RARE grams only, the
    per-string rank window partitioned by key (strings are
    length-bounded, so ≤ ~40 grams per partition), levenshtein only
    on candidates.  Emits every verified (probe, match, dist ≤
    {_FUZZY_D}) pair."""
    # ENTITY master: one row per distinct name (stable key = min
    # partkey) — matching against raw rows would multiply every probe
    # by the name's copy count (the sf0.1 fixture holds 64 distinct
    # names x up to 347 copies: 9.5M row-level pairs vs ~64 entity
    # matches), and an entity resolver matches entities, not rows
    p = (
        table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select("p_partkey", "p_name")
    )
    # dirty probe: delete the character at key-derived position
    # pmod(key, len-2)+2 (never first/last) — dist(probe, source) = 1.
    # The modulus is clamped to ≥1 (both engines): names of length ≤2
    # would otherwise divide by zero and silently NULL out of the
    # planted probe set (r11 advisor; harmless on TPC-H names but a
    # latent trap for short catalogs)
    probe = p.select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(
            F.expr(
                "substring(p_name, 1, pmod(p_partkey, greatest(length(p_name) - 2, 1)) + 1)"
            ),
            F.expr(
                "substring(p_name, pmod(p_partkey, greatest(length(p_name) - 2, 1)) + 3)"
            ),
        ).alias("probe_name"),
    )
    def grams(df: DataFrame, key: str, name: str) -> DataFrame:
        return (
            df.select(
                key,
                F.explode(
                    F.sequence(F.lit(1), F.length(name) - 1)
                ).alias("i"),
                F.col(name),
            )
            .select(key, F.expr(f"substring({name}, i, 2)").alias("gram"))
            .distinct()
        )

    from pyspark.sql.window import Window

    cg = grams(p, "p_partkey", "p_name")
    dfreq = cg.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    # per-string rank window: partitioned by the string key — ≤ ~40
    # grams per partition (length-bounded), never catalog-sized
    wc = Window.partitionBy("p_partkey").orderBy("df", "gram")
    cpfx = (
        cg.join(dfreq, "gram")
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= _FUZZY_PREFIX)
        .select("p_partkey", "gram")
    )
    pg = grams(probe, "probe_key", "probe_name")
    wp = Window.partitionBy("probe_key").orderBy("df", "gram")
    ppfx = (
        pg.join(dfreq, "gram", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _FUZZY_PREFIX)
        .select("probe_key", "gram")
    )
    cand = (
        ppfx.join(cpfx, "gram")
        .select("probe_key", F.col("p_partkey").alias("match_key"))
        .distinct()
    )
    return (
        cand.join(probe, "probe_key")
        .join(
            p.select(F.col("p_partkey").alias("match_key"), "p_name"),
            "match_key",
        )
        .withColumn(
            "dist", F.levenshtein("probe_name", "p_name").cast("long")
        )
        .filter(F.col("dist") <= _FUZZY_D)
        .select("probe_key", "match_key", "dist")
    )
