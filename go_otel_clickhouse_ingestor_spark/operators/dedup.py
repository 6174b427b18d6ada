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

from ..registry import query
from ..tables import table
from .text import tokens


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array (JVM-side).

    ``sequence`` is guarded: Spark's sequence(1, 0) counts *down*, so
    short documents must produce an explicit empty array."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


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
    sh = d.select(
        "doc_id", "source", shingles(tokens(F.col("text"))).alias("grams")
    )
    e = sh.select("doc_id", "source", F.explode("grams").alias("g"))
    a = e.alias("a")
    b = e.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz = sh.select("doc_id", F.size("grams").alias("sz"))
    jac = F.col("n_common") / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
    return (
        inter.join(sz.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sz.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.3)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


@query("dedup_minhash_lsh")  # rows-only: LSH hash family is engine-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates — the linear-scale path
    (shingle → HashingTF sparse vector → MinHash signature → banded
    join inside ``approxSimilarityJoin``).  Seeded, so deterministic
    per engine; rows-only check because the hash family is Spark's.

    100 TB story: signatures are map-side; the only shuffle keys on
    LSH bucket ids, so cost is O(candidates), not O(n²).  Tests assert
    recall against the exact ``dedup_ngram_jaccard`` pairs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", shingles(tokens(F.col("text"))).alias("grams")
    ).filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.7, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
    )


@query("dedup_simhash")  # rows-only: xxhash64 is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup candidate pairs within Hamming distance
    12, entirely in JVM expressions: per-token xxhash64, per-bit
    weighted vote via explode + sum, signature reassembly with
    shiftleft/bitwise-or, pair filter with bit_count(a ^ b).

    Scale: signature computation is a map + one groupBy(doc_id); the
    pair stage is banded LSH — 4 bands of 16 bits, candidates must
    agree exactly on at least one band (shuffle keys on (band, value),
    never an unblocked self-join)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    # per-bit vote: +1 when bit set, -1 otherwise; bit b of the
    # signature is 1 iff the vote is positive
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, b))
    sigs = votes.select("doc_id", sig.alias("simhash"))
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

    The cosine is pure JVM ``aggregate``/``zip_with`` over the float
    arrays (no UDF); both engines iterate the arrays in order, so the
    rounded value is cross-engine stable."""
    e = table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    dot = F.zip_with(
        F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x.cast("double") * y
    )
    sdot = F.aggregate(dot, F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(f"{side}.embedding"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v,
        )
    )
    cos = F.round(sdot / (norm("a") * norm("b")), 5)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )
