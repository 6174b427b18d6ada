"""Deterministic sampling & split assignment — training-pipeline
primitives.

A 100 TB corpus job can't use ``df.sample()`` for anything that must
be reproducible across engines, re-runs, or backfills: Spark's sampler
is partition-order-dependent (rerun after a repartition → different
rows).  The portable pattern is HASH-based selection — a bit-stable
hash of a stable key, mod N — which is:

- deterministic (same key → same bucket, any engine, any partitioning),
- uniform (md5 bits are unbiased),
- map-only (no shuffle, no state, scales linearly),
- and oracle-checkable, since DuckDB computes the identical md5.

The same trick assigns held-out splits: the split of a document never
changes when the corpus grows — only hash-bucket membership decides,
not position — which is exactly what train/val/test contamination
control needs.  (Spark's own ``sample``/``randomSplit`` stay the right
tool for one-off approximate sampling; these queries are the
reproducible path.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


def hash_bucket(key: Column, n: int) -> Column:
    """Stable bucket in [0, n): first 8 hex chars of md5(key), mod n.
    32 bits of hash for bucket counts ≤ ~1e6; bit-identical in any
    engine with md5 (DuckDB twin: ``conv``-free hex parse)."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n


#: DuckDB twin of hash_bucket: both engines parse the same 8-char hex
#: slice as a number (Spark via conv(x,16,10), DuckDB via 0x literal).
_DUCK_BUCKET = "('0x' || substring(md5({key}), 1, 8))::BIGINT % {n}"


def _duck_bucket(key: str, n: int) -> str:
    return _DUCK_BUCKET.format(key=key, n=n)


@query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {_duck_bucket("cast(doc_id AS VARCHAR)", 100)} < 10
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% sample: md5-bucket(doc_id) < 10 of 100.
    Map-only — the predicate is pure codegen, no shuffle, and the
    sampled set is stable under repartition/rerun/corpus growth
    (unlike ``df.sample``, which is partition-order-dependent)."""
    d = table(spark, sf_dir, "documents")
    return d.filter(hash_bucket(F.col("doc_id").cast("string"), 100) < 10).select(
        "doc_id", "source", "n_chars"
    )


@query(
    "split_train_val_test",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_duck_bucket("cast(doc_id AS VARCHAR)", 100)} AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment by hash bucket.  A document's
    split NEVER changes as the corpus grows (membership is a pure
    function of its id), which is the contamination-control property
    position-based splits lack."""
    d = table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id").cast("string"), 100)
    return d.select(
        "doc_id",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias(
            "split"
        ),
    )


@query(
    "sample_stratified_per_group",
    oracle=f"""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                ORDER BY {_duck_bucket("cast(doc_id AS VARCHAR)", 1000000)}, doc_id) AS rn
      FROM documents) t
    WHERE rn <= 20
    """,
)
def sample_stratified_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: 20 docs per language, chosen by
    hash order (a reproducible shuffle) — per-group quota sampling with
    none of ``sampleBy``'s row-count variance.  One shuffle on the
    stratum key; rank-and-filter keeps ≤20 rows per stratum."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    order = hash_bucket(F.col("doc_id").cast("string"), 1_000_000)
    w = Window.partitionBy("lang").orderBy(order.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


@query(
    "sample_weighted_hash",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, n_chars,
             least(n_chars, 800) / 800.0 AS keep_p,
             ({_duck_bucket("cast(doc_id AS VARCHAR)", 1000000)}) / 1000000.0 AS u
      FROM documents
    )
    SELECT doc_id, n_chars, round(keep_p, 6) AS keep_p
    FROM q WHERE u < keep_p
    """,
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: each doc keeps with
    probability proportional to its (length-derived) weight, decided by
    comparing its hash-uniform u ∈ [0,1) against the weight — the
    map-only, rerun-stable form of weighted subsampling (quality-
    weighted corpus thinning).  Same md5-bucket machinery as the
    uniform sample; the weight just moves the threshold per row."""
    d = table(spark, sf_dir, "documents")
    keep_p = F.least(F.col("n_chars"), F.lit(800)) / 800.0
    u = hash_bucket(F.col("doc_id").cast("string"), 1_000_000) / 1_000_000.0
    return (
        d.filter(u < keep_p)
        .select("doc_id", "n_chars", F.round(keep_p, 6).alias("keep_p"))
    )


@query(
    "sample_quantile_bucketize",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS q
      FROM events
    ),
    binned AS (
      SELECT (CASE WHEN value > q[9] THEN 9 WHEN value > q[8] THEN 8
                   WHEN value > q[7] THEN 7 WHEN value > q[6] THEN 6
                   WHEN value > q[5] THEN 5 WHEN value > q[4] THEN 4
                   WHEN value > q[3] THEN 3 WHEN value > q[2] THEN 2
                   WHEN value > q[1] THEN 1 ELSE 0 END) AS bucket,
             value
      FROM events CROSS JOIN cuts
    )
    SELECT bucket, count(*) AS n,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM binned GROUP BY bucket
    """,
)
def sample_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile bucketizer (Spark ML's QuantileDiscretizer
    semantics, declaratively): exact decile cut points computed once
    over the corpus, broadcast, every row bucketed by threshold
    comparison — the feature-preprocessing primitive for models and
    for importance-stratified sampling.  Both engines interpolate
    percentile_cont on identical doubles (bit-identical cuts), the
    bucket CASE uses strict > consistently, and output is 10 bins with
    near-equal counts (the equi-depth property).  One pass for cuts,
    one map-only pass to bucket, one tiny agg."""
    ev = table(spark, sf_dir, "events")
    cuts = ev.agg(
        F.expr(
            "percentile(value, array(0.1, 0.2, 0.3, 0.4, 0.5,"
            " 0.6, 0.7, 0.8, 0.9))"
        ).alias("q")
    )
    binned = ev.join(F.broadcast(cuts)).select(
        F.when(F.col("value") > F.col("q")[8], 9)
        .when(F.col("value") > F.col("q")[7], 8)
        .when(F.col("value") > F.col("q")[6], 7)
        .when(F.col("value") > F.col("q")[5], 6)
        .when(F.col("value") > F.col("q")[4], 5)
        .when(F.col("value") > F.col("q")[3], 4)
        .when(F.col("value") > F.col("q")[2], 3)
        .when(F.col("value") > F.col("q")[1], 2)
        .when(F.col("value") > F.col("q")[0], 1)
        .otherwise(0)
        .alias("bucket"),
        "value",
    )
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
      SELECT min(cnt) AS quota FROM (
        SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
    ),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM ranked r, sized s
    WHERE r.rk <= s.quota
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every class (lang) keeps exactly
    ``min(class size)`` rows — the classic training-set rebalance when
    one class dwarfs the rest.  Selection is a per-class window ranked
    by ``md5(doc_id)`` — a deterministic shuffle, so the sample is
    rerun-stable, addition-stable for existing docs, and needs no
    global sort; the quota is a 1-row broadcast.  At 100 TB the
    per-class windows are the cost — each class sorts its own
    partition slice (hash-keyed, parallel across classes); for classes
    too large to sort, swap rank-by-hash for hash-threshold sampling
    (sample_hash_deterministic) at quota/size rate, trading exact
    counts for a scan-only plan."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    quota = d.groupBy("lang").count().agg(F.min("count").alias("quota"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.join(F.broadcast(quota))
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang")
    )


_CI_RATE = 10  # of 100: the 10% estimation sample
_CI_Z = 1.96  # normal 95% two-sided critical value


@query(
    "sample_estimate_ci",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             cast(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             {_duck_bucket(
                 "cast(l_orderkey AS VARCHAR) || '-' || cast(l_linenumber AS VARCHAR)",
                 100,
             )} AS bucket
      FROM lineitem
    ),
    est AS (
      SELECT l_returnflag, l_linestatus,
             count(*)::BIGINT AS n_sample,
             sum(price_c)::BIGINT AS s_c,
             sum(cast(price_c AS HUGEINT) * price_c) AS ss_c
      FROM c WHERE bucket < {_CI_RATE} GROUP BY 1, 2
    ),
    tru AS (
      SELECT l_returnflag, l_linestatus,
             count(*)::BIGINT AS n_true,
             sum(price_c)::BIGINT AS ts_c
      FROM c GROUP BY 1, 2
    )
    SELECT e.l_returnflag, e.l_linestatus, e.n_sample, t.n_true,
           round(cast(e.s_c AS DOUBLE) / e.n_sample / 100.0, 6) AS est_mean,
           round({_CI_Z} * sqrt(((cast(e.ss_c AS DOUBLE)
                    - cast(e.s_c AS DOUBLE) * cast(e.s_c AS DOUBLE) / e.n_sample)
                   / (e.n_sample - 1)) / e.n_sample) / 100.0, 6) AS ci_half,
           round(cast(t.ts_c AS DOUBLE) / t.n_true / 100.0, 6) AS true_mean,
           abs(cast(t.ts_c AS DOUBLE) / t.n_true
               - cast(e.s_c AS DOUBLE) / e.n_sample)
             <= {_CI_Z} * sqrt(((cast(e.ss_c AS DOUBLE)
                    - cast(e.s_c AS DOUBLE) * cast(e.s_c AS DOUBLE) / e.n_sample)
                   / (e.n_sample - 1)) / e.n_sample) AS covered
    FROM est e JOIN tru t
      ON t.l_returnflag = e.l_returnflag AND t.l_linestatus = e.l_linestatus
    WHERE e.n_sample >= 2
    """,
)
def sample_estimate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with ERROR BARS — the BlinkDB
    contract (Agarwal et al., EuroSys 2013): answer a group-by mean
    from a 10% deterministic hash sample and attach a CLT 95%
    confidence interval, then AUDIT the estimate against the exact
    full-scan answer (est, ±half-width, truth, covered) — the audit
    a production AQP tier runs offline to validate its error model.

    Cross-engine exactness discipline: prices become exact BIGINT
    cents; per-group sufficient statistics (n, Σx, Σx²) accumulate as
    BIGINT/DECIMAL(38,0) — order-free — and every float derives from
    those integers through the same closed formula in both engines
    (sqrt is IEEE exact-rounded, so identical inputs give identical
    doubles; the coverage comparison uses the same unrounded values on
    both sides).  The sample predicate is the md5-bucket rule shared
    with ``sample_hash_deterministic`` — membership is a pure function
    of (orderkey, linenumber), so the estimate is rerun- and
    partition-order-stable, unlike ``TABLESAMPLE``.

    Scale: the sample scan is map-only (hash predicate, no shuffle);
    both aggregations are partial-agg'd sums of scalars — the full
    true-mean scan exists only because the AUDIT needs ground truth;
    the serving path is the sample branch alone, 10× less IO with a
    stated ±error."""
    li = table(spark, sf_dir, "lineitem")
    price_c = F.expr("cast(round(l_extendedprice * 100) as bigint)")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    c = li.select(
        "l_returnflag",
        "l_linestatus",
        price_c.alias("price_c"),
        hash_bucket(key, 100).alias("bucket"),
    )
    est = (
        c.filter(F.col("bucket") < _CI_RATE)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.sum("price_c").alias("s_c"),
            F.sum(F.col("price_c").cast("decimal(38,0)") * F.col("price_c")).alias(
                "ss_c"
            ),
        )
        .filter(F.col("n_sample") >= 2)
    )
    tru = c.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_true"), F.sum("price_c").alias("ts_c")
    )
    s_d = F.col("s_c").cast("double")
    ss_d = F.col("ss_c").cast("double")
    n_d = F.col("n_sample")
    var = ((ss_d - s_d * s_d / n_d) / (n_d - 1)) / n_d
    half = _CI_Z * F.sqrt(var)
    est_mean_raw = s_d / n_d
    true_mean_raw = F.col("ts_c").cast("double") / F.col("n_true")
    return est.join(tru, ["l_returnflag", "l_linestatus"]).select(
        "l_returnflag",
        "l_linestatus",
        "n_sample",
        "n_true",
        F.round(est_mean_raw / 100.0, 6).alias("est_mean"),
        F.round(half / 100.0, 6).alias("ci_half"),
        F.round(true_mean_raw / 100.0, 6).alias("true_mean"),
        (F.abs(true_mean_raw - est_mean_raw) <= half).alias("covered"),
    )
