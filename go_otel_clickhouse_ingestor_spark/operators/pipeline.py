"""Composed corpus-curation pipeline — the end-to-end shape a
training-data run actually executes, as one oracle-checked plan.

Stages (each individually tested elsewhere, here composed):
exact dedup (keeper per fingerprint, ``dedup.py``) → language filter →
quality filter (``text.py`` score) → token counting → cumulative token
budget cut.

Scale notes: dedup/filter/score are map + one window over the
fingerprint; the BUDGET stage uses a global ordered window (single
partition!) which is fine for the final cut of an already-filtered
corpus but would bottleneck as a mid-pipeline op — at 100 TB you
either budget per shard (partition the window) or binary-search a
doc_id cutoff from an approximate cumulative-token quantile instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table
from .text import _PUNCT_RE, tokens

#: Quality floor and token budget for the final corpus cut.
QUALITY_MIN = 0.5
TOKEN_BUDGET = 20_000


@query(
    "pipeline_corpus_filter",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, text, n_chars,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ),
    keep AS (
      SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keeper FROM fp
    ),
    en AS (SELECT * FROM keep WHERE doc_id = keeper AND lang = 'en'),
    q AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
             round(0.4 * (least(n_chars, 500) / 500.0)
                 + 0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(n_chars, 1))
                 - 0.1 * (len(regexp_extract_all(text, '{_PUNCT_RE}')) / greatest(n_chars, 1)), 6) AS quality
      FROM en
    ),
    flt AS (SELECT * FROM q WHERE quality >= {QUALITY_MIN}),
    cum AS (
      SELECT doc_id, n_tokens, quality,
             (sum(n_tokens) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
      FROM flt
    )
    SELECT doc_id, n_tokens, quality, cum_tokens
    FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def pipeline_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup → lang filter → quality filter → token budget, one plan.
    Catalyst fuses the map stages into a single codegen span; the only
    shuffles are the fingerprint window and the budget cumsum.  The
    budget cumsum is the DISTRIBUTED two-phase form (sort_multi_key's
    pattern): range-partition on doc_id, per-partition local running
    sum (window partitioned by ``spark_partition_id`` — fully
    parallel), then add each partition's token offset computed over
    the npartitions-row totals table and broadcast back.  The r12
    window gate caught the previous single-task global
    ``Window.orderBy(doc_id)`` form — it was passing the old gate via
    the 'bounded' substring inside ``unboundedPreceding``, and a
    corpus-sized cumsum through ONE task is exactly the class the
    gate exists for."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
    keep = d.withColumn("fingerprint", fp).withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy("fingerprint"))
    )
    en = keep.filter((F.col("doc_id") == F.col("keeper")) & (F.col("lang") == "en"))

    n_chars = F.col("n_chars")
    len_norm = F.least(n_chars, F.lit(500)) / 500.0
    punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_RE), F.lit(0))) / F.greatest(
        n_chars, F.lit(1)
    )
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    q = en.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(0.4 * len_norm + 0.5 * alpha - 0.1 * punct, 6).alias("quality"),
    ).filter(F.col("quality") >= QUALITY_MIN)

    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = q.repartitionByRange(npart, F.col("doc_id")).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lcum",
        F.sum("n_tokens").over(Window.partitionBy("_pid").orderBy("doc_id")),
    )
    offs = (
        local.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                # bounded: npartitions-row totals table, never corpus-sized
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            (F.col("_off") + F.col("_lcum")).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
    )


#: Per-shard token budget for the partitioned budget cut.
TOKEN_BUDGET_PER_SHARD = 2_000


@query(
    "pipeline_budget_sharded",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, source, text, n_chars,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ),
    keep AS (
      SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keeper FROM fp
    ),
    en AS (SELECT * FROM keep WHERE doc_id = keeper AND lang = 'en'),
    q AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
             round(0.4 * (least(n_chars, 500) / 500.0)
                 + 0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(n_chars, 1))
                 - 0.1 * (len(regexp_extract_all(text, '{_PUNCT_RE}')) / greatest(n_chars, 1)), 6) AS quality
      FROM en
    ),
    flt AS (SELECT * FROM q WHERE quality >= {QUALITY_MIN}),
    cum AS (
      SELECT doc_id, source, n_tokens, quality,
             (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
      FROM flt
    )
    SELECT doc_id, source, n_tokens, quality, cum_tokens
    FROM cum WHERE cum_tokens <= {TOKEN_BUDGET_PER_SHARD}
    """,
)
def pipeline_budget_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for the token-budget cut
    (``pipeline_corpus_filter``'s docstring names it): the budget is
    allocated PER SOURCE SHARD, so the cumulative window partitions on
    ``source`` — parallel across shards, no single-partition global
    window anywhere in the plan.  This is also the semantics real
    corpus curation usually wants (per-domain/source caps control
    source mixing; a single global budget lets one source crowd out
    the rest)."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
    keep = d.withColumn("fingerprint", fp).withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy("fingerprint"))
    )
    en = keep.filter((F.col("doc_id") == F.col("keeper")) & (F.col("lang") == "en"))

    n_chars = F.col("n_chars")
    len_norm = F.least(n_chars, F.lit(500)) / 500.0
    punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_RE), F.lit(0))) / F.greatest(
        n_chars, F.lit(1)
    )
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    q = en.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(0.4 * len_norm + 0.5 * alpha - 0.1 * punct, 6).alias("quality"),
    ).filter(F.col("quality") >= QUALITY_MIN)

    budget_w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return q.withColumn("cum_tokens", F.sum("n_tokens").over(budget_w)).filter(
        F.col("cum_tokens") <= TOKEN_BUDGET_PER_SHARD
    )


@query(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+3], ' ')
                            for i in range(1, greatest(len(t) - 2, 1))]) AS gs
      FROM toks
    ),
    e AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    ev AS (SELECT DISTINCT g FROM e WHERE doc_id % 20 = 0)
    SELECT e.doc_id, count(*) AS n_shared_grams
    FROM e JOIN ev USING (g)
    WHERE e.doc_id % 20 <> 0
    GROUP BY e.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    4-token gram with the held-out eval split (doc_id % 20 == 0 stands
    in for the eval set).  The eval gram set is eval-corpus-sized —
    tiny relative to training data — so it BROADCASTS and the check is
    a map-side hash probe per training gram: no shuffle of the
    training corpus at all, which is what makes overlap-decontam
    feasible at 100 TB.  Spark joins 8-byte xxhash64 gram keys (the
    oracle joins gram text; counts, not hashes, are compared)."""
    d = table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower(F.col("text"))), "\\s+")
    grams = F.array_distinct(
        F.expr(
            "transform(sequence(0, size(t) - 4),"
            " i -> xxhash64(concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3])))"
        )
    )
    e = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 4)
        .select("doc_id", F.explode(grams).alias("gh"))
    )
    ev = e.filter(F.col("doc_id") % 20 == 0).select("gh").distinct()
    return (
        e.filter(F.col("doc_id") % 20 != 0)
        .join(F.broadcast(ev), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


@query(
    "pipeline_outlier_iqr",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, round(e.value, 4) AS value
    FROM events e JOIN b USING (event_type)
    WHERE e.value < b.q1 - 1.5 * (b.q3 - b.q1)
       OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
    """,
)
def pipeline_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier extraction: per-group exact quartiles →
    1.5×IQR bounds → filter.  The bounds table is one row per group, a
    broadcast back onto the fact scan (same two-pass shape as any
    "aggregate then filter by group statistic" quality rule); both
    engines compute the identical interpolated quantile and fence
    arithmetic, so row membership can't drift."""
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .filter(
            (F.col("value") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("value") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        )
        .select("event_id", "event_type", F.round("value", 4).alias("value"))
    )


@query(
    "pipeline_curriculum_phases",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             round(0.4 * (least(n_chars, 500) / 500.0)
                 + 0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(n_chars, 1))
                 - 0.1 * (len(regexp_extract_all(text, '{_PUNCT_RE}')) / greatest(n_chars, 1)), 6) AS quality
      FROM documents
    )
    SELECT doc_id, source, quality,
           ntile(4) OVER (PARTITION BY source ORDER BY quality, doc_id)::BIGINT AS phase
    FROM q
    """,
)
def pipeline_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: split each source shard into 4 quality
    quartiles (phase 1 = lowest-quality quarter, trained first; phase 4
    = highest, trained last — the easy-to-hard curriculum schedule).

    ``ntile`` runs PER SOURCE — the same sharded-window discipline as
    ``pipeline_budget_sharded``: a global quality ranking would funnel
    the corpus through one partition, while per-shard quartiles keep
    the window parallel and are what a curriculum actually wants when
    sources differ systematically in style.  Deterministic via the
    (quality, doc_id) tiebreak."""
    from .text import text_quality_score

    q = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        d.join(q, "doc_id")
        .select(
            "doc_id",
            "source",
            "quality",
            F.ntile(4).over(w).cast("long").alias("phase"),
        )
    )


@query(
    "corpus_build_e2e",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, text, n_chars,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ),
    keep AS (
      SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keeper FROM fp
    ),
    q AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
             round(0.4 * (least(n_chars, 500) / 500.0)
                 + 0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(n_chars, 1))
                 - 0.1 * (len(regexp_extract_all(text, '{_PUNCT_RE}')) / greatest(n_chars, 1)), 6) AS quality
      FROM keep WHERE doc_id = keeper
    ),
    flt AS (SELECT * FROM q WHERE quality >= {QUALITY_MIN}),
    cur AS (
      SELECT *, ntile(4) OVER (PARTITION BY source ORDER BY quality, doc_id)::BIGINT AS phase
      FROM flt
    ),
    packed AS (
      SELECT doc_id, source, n_tokens, quality, phase,
             coalesce(sum(n_tokens) OVER (PARTITION BY source, phase ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM cur
    )
    SELECT doc_id, source, phase, n_tokens, quality,
           (cum_before // 2048)::BIGINT AS bin
    FROM packed
    """,
)
def corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-corpus build as ONE declarative plan:
    exact dedup (fingerprint keeper) → quality score + floor →
    per-source curriculum quartiles → sequence packing into 2048-token
    bins per (source, phase) — what a real run submits as a single
    job so Catalyst fuses every map stage and schedules the four
    window shuffles back-to-back.

    Scale audit of the shuffles: fingerprint window (hash-partitioned
    on the 16-byte digest), then THREE windows that all key on
    ``source`` (quality ntile, then (source, phase) packing — the
    second reuses the first's partitioning modulo the phase subkey).
    Nothing global, nothing single-partition; every stage inherits the
    shard parallelism.  The per-stage twins (dedup_exact,
    text_quality_score, pipeline_curriculum_phases,
    pack_sequences_bins) are each oracle-checked alone; this query
    checks their COMPOSITION, where stage-boundary bugs (dropped
    columns, filter ordering, tie-break drift) actually live."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
    keep = (
        d.withColumn("fingerprint", fp)
        .withColumn(
            "keeper", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("keeper"))
    )

    n_chars = F.col("n_chars")
    len_norm = F.least(n_chars, F.lit(500)) / 500.0
    punct = F.size(
        F.regexp_extract_all("text", F.lit(_PUNCT_RE), F.lit(0))
    ) / F.greatest(n_chars, F.lit(1))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    q = keep.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(0.4 * len_norm + 0.5 * alpha - 0.1 * punct, 6).alias("quality"),
    ).filter(F.col("quality") >= QUALITY_MIN)

    cur = q.withColumn(
        "phase",
        F.ntile(4)
        .over(Window.partitionBy("source").orderBy("quality", "doc_id"))
        .cast("long"),
    )
    pack_w = (
        Window.partitionBy("source", "phase")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(pack_w), F.lit(0))
    return cur.select(
        "doc_id",
        "source",
        "phase",
        "n_tokens",
        "quality",
        F.floor(cum_before / 2048).cast("long").alias("bin"),
    )


@query(
    "pipeline_mix_weights",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 4
                  WHEN source IN ('src5','src6','src7','src8','src9') THEN 2
                  ELSE 1 END AS weight
      FROM documents
    ),
    wt AS (
      SELECT sum(w) AS wtot FROM (SELECT DISTINCT source, weight AS w FROM weighted) t
    ),
    runs AS (
      SELECT w.doc_id, w.source, w.n_chars, w.weight,
             floor((200000.0 * w.weight) / wt.wtot) AS quota_chars,
             sum(w.n_chars) OVER (PARTITION BY w.source
                                  ORDER BY w.doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_chars
      FROM weighted w CROSS JOIN wt
    )
    SELECT source,
           max(weight)::BIGINT                                    AS weight,
           count(*)                                               AS n_docs,
           sum(n_chars)::BIGINT                                   AS total_chars,
           max(quota_chars)::BIGINT                               AS quota_chars,
           count(*) FILTER (WHERE cum_chars <= quota_chars)       AS n_sampled,
           sum(n_chars) FILTER (WHERE cum_chars <= quota_chars)::BIGINT AS sampled_chars
    FROM runs
    GROUP BY source
    """,
)
def pipeline_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning: each source gets a char budget
    proportional to its configured mix weight (web-ish sources
    upweighted 4×/2×), and docs fill the quota greedily in
    deterministic doc_id order — the per-source running-sum cut of
    ``pipeline_budget_sharded``, but with per-shard budgets derived
    from a weight table instead of one global number.  Emits the
    per-source audit row (docs/chars available, quota, docs/chars
    actually sampled) a mixture run logs before materializing.  Scale:
    the running sum partitions by source (never global), the weight
    table is a literal broadcast, one source-keyed shuffle total."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    weight = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 4)
        .when(F.col("source").isin("src5", "src6", "src7", "src8", "src9"), 2)
        .otherwise(1)
    )
    weighted = d.select("doc_id", "source", "n_chars", weight.alias("weight"))
    wsum = (
        weighted.select("source", "weight")
        .distinct()
        .agg(F.sum("weight").alias("wtot"))
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = (
        weighted.crossJoin(F.broadcast(wsum))
        .withColumn(
            "quota_chars",
            F.floor((F.lit(200000.0) * F.col("weight")) / F.col("wtot")),
        )
        .withColumn("cum_chars", F.sum("n_chars").over(w))
    )
    fits = F.col("cum_chars") <= F.col("quota_chars")
    return runs.groupBy("source").agg(
        F.max("weight").cast("long").alias("weight"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.max("quota_chars").cast("long").alias("quota_chars"),
        F.count_if(fits).alias("n_sampled"),
        F.sum(F.when(fits, F.col("n_chars"))).cast("long").alias("sampled_chars"),
    )


@query(
    "decontaminate_exact_substring",
    oracle="""
    WITH probes AS (
      SELECT DISTINCT lower(substr(text, 10, 48)) AS probe
      FROM documents
      WHERE doc_id % 13 = 0 AND length(text) >= 57
    ),
    train AS (SELECT doc_id, lower(text) AS lt FROM documents
              WHERE doc_id % 13 <> 0 AND text IS NOT NULL)
    SELECT t.doc_id, count(*) AS n_probe_hits
    FROM train t JOIN probes p ON position(p.probe IN t.lt) > 0
    GROUP BY t.doc_id
    """,
)
def decontaminate_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-substring benchmark decontamination: training documents
    that contain any 48-char probe lifted verbatim from the held-out
    split (doc_id % 13 — the same deterministic split both engines
    derive), with per-doc hit counts.  The exact-match complement of
    ``decontaminate_ngram_overlap``: n-gram overlap catches paraphrase
    contamination but tokenization differences can miss byte-identical
    passages; this catches them by construction.

    Scale shape: the probe set is eval-sized (bounded, broadcast), the
    corpus side is one map-only pass — each doc is scanned against the
    probe list JVM-side (``locate``), no shuffle until the per-doc
    count.  At a 100 TB corpus with a large eval suite you'd compile
    the probes into one Aho-Corasick automaton in a ``mapInPandas``
    stage (one text scan for ALL probes) or pre-gate with the n-gram
    bloom pass; the broadcast-nested-loop form here IS the exact
    semantics that automaton must reproduce."""
    d = table(spark, sf_dir, "documents")
    probes = (
        d.filter((F.col("doc_id") % 13 == 0) & (F.length("text") >= 57))
        .select(F.lower(F.substring("text", 10, 48)).alias("probe"))
        .distinct()
    )
    train = d.filter(
        (F.col("doc_id") % 13 != 0) & F.col("text").isNotNull()
    ).select("doc_id", F.lower(F.col("text")).alias("lt"))
    hits = train.join(
        F.broadcast(probes), F.expr("locate(probe, lt) > 0")
    )
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_probe_hits"))


def _aho_build(probes: list) ->  tuple[list, list, list]:
    """Aho-Corasick automaton over ``probes``: returns (goto, fail,
    out) — goto[i] is a char→state dict, out[i] the set of probe ids
    recognized at state i (output links pre-propagated through the
    fail chain, so matching never walks fail links)."""
    from collections import deque

    goto: list[dict] = [{}]
    out: list[set] = [set()]
    for pid, p in enumerate(probes):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append(set())
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].add(pid)
    fail = [0] * len(goto)
    dq = deque(goto[0].values())
    while dq:
        s = dq.popleft()
        for ch, t in goto[s].items():
            dq.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t] |= out[fail[t]]
    return goto, fail, out


def _aho_scan_iter(probes: list):
    """mapInPandas factory: builds the automaton ONCE per task (the
    iterator-UDF init pattern), then streams documents through it."""

    def run(batches):
        import pandas as pd

        goto, fail, out = _aho_build(probes)

        def n_hits(text: str) -> int:
            found: set = set()
            s = 0
            for ch in text:
                while s and ch not in goto[s]:
                    s = fail[s]
                s = goto[s].get(ch, 0)
                if out[s]:
                    found |= out[s]
            return len(found)

        for pdf in batches:
            n = pdf["lt"].map(n_hits)
            res = pd.DataFrame({"doc_id": pdf["doc_id"], "n_probe_hits": n})
            yield res[res["n_probe_hits"] > 0]

    return run


@query(
    "decontaminate_aho_corasick",
    oracle="""
    WITH probes AS (
      SELECT DISTINCT lower(substr(text, 10, 48)) AS probe
      FROM documents
      WHERE doc_id % 13 = 0 AND length(text) >= 57
    ),
    train AS (SELECT doc_id, lower(text) AS lt FROM documents
              WHERE doc_id % 13 <> 0 AND text IS NOT NULL)
    SELECT t.doc_id, count(*) AS n_probe_hits
    FROM train t JOIN probes p ON position(p.probe IN t.lt) > 0
    GROUP BY t.doc_id
    """,
)
def decontaminate_aho_corasick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MANY-PROBE scale path of ``decontaminate_exact_substring``,
    implemented for real: all eval probes compiled into one
    Aho-Corasick automaton, each training doc scanned ONCE for every
    probe simultaneously (O(text + matches) per doc, independent of
    probe count) inside an Arrow-batched ``mapInPandas`` stage with
    per-task automaton construction.  Same oracle, same output as the
    broadcast-nested-loop form — two physical designs, one semantics:
    the JVM ``locate`` join is O(text × probes) and wins for small
    eval suites; the automaton wins once probe count × corpus size
    crosses the crossover (SCALING.md measured the join form going
    quadratic when probes scale with the corpus).  The probe list is
    collected to the driver (eval-suite-sized by constraint — the same
    bound that lets the join form broadcast) and ships to tasks inside
    the closure."""
    d = table(spark, sf_dir, "documents")
    probes = [
        r.probe
        for r in (
            d.filter((F.col("doc_id") % 13 == 0) & (F.length("text") >= 57))
            .select(F.lower(F.substring("text", 10, 48)).alias("probe"))
            .distinct()
            .collect()
        )
    ]
    train = d.filter(
        (F.col("doc_id") % 13 != 0) & F.col("text").isNotNull()
    ).select("doc_id", F.lower(F.col("text")).alias("lt"))
    return train.mapInPandas(
        _aho_scan_iter(probes), "doc_id long, n_probe_hits long"
    )


@query("decontaminate_near_lsh")  # rows-only: xxhash64 band family is engine-specific
def decontaminate_near_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUPLICATE decontamination — the top tier of the ladder
    after any-shared-gram overlap (``decontaminate_ngram_overlap``)
    and exact-substring probes (``decontaminate_exact_substring`` /
    ``_aho_corasick``): flag training documents whose WHOLE-DOCUMENT
    3-gram Jaccard against any eval doc (doc_id % 20 == 0, the
    ngram_overlap split) reaches 0.3 — the paraphrased-or-truncated
    eval-copy class that shares-a-gram flags with no precision and
    substring probes miss entirely.  Published practice (the GPT-3 §5
    / Llama decontamination appendices) runs exactly this MinHash
    tier against eval suites before training.

    Same machinery and scale contract as the maintained near-dup
    index (``dedup._near_sigs``/``_near_bands``): the EVAL side is the
    small one, so its bands broadcast and the TRAINING band table —
    the maintained index at 100 TB — is scanned map-side; the exact
    verify broadcasts the LSH-bounded pair set into the training gram
    table, then the surviving (pair + train grams) rows into the eval
    gram table.  Nothing shuffles O(training corpus).  Emission is
    per TRAINING doc (the side you act on): best-matching eval doc
    (jaccard desc, eval_doc asc), its jaccard, and how many eval docs
    it matched.

    Rows-only (xxhash64 bands, the dedup_minhash_lsh rule); the
    pytest gate recomputes the exact train×eval Jaccard matches in
    DuckDB and requires the LSH-fed decisions to land the identical
    flag set on the fixture's planted near-dups."""
    from .dedup import _near_bands, _near_sigs, materialized

    d = table(spark, sf_dir, "documents")
    train_sig = materialized(_near_sigs(d.filter(F.col("doc_id") % 20 != 0)))
    eval_sig = materialized(_near_sigs(d.filter(F.col("doc_id") % 20 == 0)))
    probe = _near_bands(eval_sig).select(
        F.col("doc_id").alias("eval_doc"), "band", "v1", "v2"
    )
    cand = (
        _near_bands(train_sig)
        .join(F.broadcast(probe), ["band", "v1", "v2"])
        .select(F.col("doc_id").alias("train_doc"), "eval_doc")
        .distinct()
    )
    ga = train_sig.select(
        F.col("doc_id").alias("train_doc"), F.col("ghs").alias("grams_t")
    )
    gb = eval_sig.select(
        F.col("doc_id").alias("eval_doc"), F.col("ghs").alias("grams_e")
    )
    inter = F.size(F.array_intersect("grams_t", "grams_e"))
    jac = inter / (F.size("grams_t") + F.size("grams_e") - inter)
    cva = ga.join(F.broadcast(cand), "train_doc")
    verified = (
        gb.join(F.broadcast(cva), "eval_doc")
        .filter(jac >= 0.3)
        .select("train_doc", "eval_doc", F.round(jac, 6).alias("jaccard_sim"))
    )
    return (
        verified.groupBy(F.col("train_doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_matches"),
            F.max(F.struct("jaccard_sim", (-F.col("eval_doc")).alias("neg")))
            .alias("best"),
        )
        .select(
            "doc_id",
            (-F.col("best.neg")).cast("long").alias("matched_eval_doc"),
            F.col("best.jaccard_sim").alias("jaccard_sim"),
            "n_eval_matches",
        )
    )


#: Temperature for source-rebalancing (mT5/XLM-R convention α≈0.7:
#: upsample the tail without letting the head starve it out).
_TEMP_ALPHA = 0.7


@query(
    "pipeline_temperature_sampling",
    oracle=f"""
    WITH per_source AS (
      SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(n_chars)::DOUBLE AS tot_chars, sum(n_docs) AS tot_docs
      FROM per_source
    ),
    w AS (
      SELECT source, n_docs, n_chars,
             round(n_chars / tot_chars, 6) AS p_raw,
             cast(round(pow(n_chars / tot_chars, {_TEMP_ALPHA}), 6)
                  AS DECIMAL(18,6)) AS w_temp,
             tot_docs
      FROM per_source CROSS JOIN tot
    ),
    z AS (SELECT sum(w_temp) AS z FROM w)
    SELECT source, n_docs, n_chars, p_raw,
           cast(w_temp AS DOUBLE) AS w_temp,
           round(cast(w_temp AS DOUBLE) / cast(z AS DOUBLE), 6) AS share_temp,
           round(cast(w_temp AS DOUBLE) / cast(z AS DOUBLE) / p_raw, 4)
             AS boost,
           cast(floor(cast(w_temp AS DOUBLE) / cast(z AS DOUBLE) * tot_docs)
                AS BIGINT) AS planned_docs
    FROM w CROSS JOIN z
    """,
)
def pipeline_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the mT5/XLM-R rebalance):
    each source's raw char share p is flattened to p^α (α=0.7) and
    renormalized, so low-resource sources are upsampled and dominant
    ones damped — the standard alternative to the hand-set weight
    table in ``pipeline_mix_weights``.  Emits the per-source planning
    row (raw share, tempered weight, tempered share, boost factor,
    planned docs).  Portability: p^α goes through round(6) BEFORE the
    renormalizing sum (pow is libm, ±1 ULP across engines) and the sum
    itself rides DECIMAL so the normalizer is fold-order-proof.
    Scale: one source-keyed agg; everything after is a handful of
    source rows on a broadcast."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = per.agg(
        F.sum("n_chars").cast("double").alias("tot_chars"),
        F.sum("n_docs").alias("tot_docs"),
    )
    w = per.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(F.col("n_chars") / F.col("tot_chars"), 6).alias("p_raw"),
        F.round(F.pow(F.col("n_chars") / F.col("tot_chars"), _TEMP_ALPHA), 6)
        .cast("decimal(18,6)")
        .alias("w_temp"),
        "tot_docs",
    )
    z = w.agg(F.sum("w_temp").alias("z"))
    share = F.col("w_temp").cast("double") / F.col("z").cast("double")
    return w.join(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_chars",
        "p_raw",
        F.col("w_temp").cast("double").alias("w_temp"),
        F.round(share, 6).alias("share_temp"),
        F.round(share / F.col("p_raw"), 4).alias("boost"),
        F.floor(share * F.col("tot_docs")).cast("long").alias("planned_docs"),
    )


@query(
    "pipeline_quality_classifier_lr",
    oracle="""
    WITH feat AS (
      SELECT source,
             round(ln(1 + n_chars), 6) AS f_len,
             round(len(list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t IN ('the','and','of','to','in')))
                   / greatest(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                              t -> t <> '')), 1), 6) AS f_stop,
             round(length(regexp_replace(lower(text), '\\s+', '', 'g'))
                   / greatest(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                              t -> t <> '')), 1), 6) AS f_wlen,
             round(len(list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> regexp_matches(t, '[0-9]')))
                   / greatest(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                              t -> t <> '')), 1), 6) AS f_digit
      FROM documents
    ),
    scored AS (
      SELECT source,
             round(-2.0 + 0.55 * f_len + 2.0 * f_stop
                   - 0.15 * f_wlen - 1.2 * f_digit, 6) AS z
      FROM feat
    )
    SELECT source,
           count(*) AS n_docs,
           sum(CASE WHEN z >= 0 THEN 1 ELSE 0 END)::BIGINT AS n_keep,
           round(sum(CASE WHEN z >= 0 THEN 1 ELSE 0 END)
                 / cast(count(*) AS DOUBLE), 6) AS keep_rate,
           round(cast(sum(cast(round(1.0 / (1.0 + exp(-z)), 6)
                               AS DECIMAL(14,6))) AS DOUBLE)
                 / count(*), 6) AS mean_score
    FROM scored GROUP BY source
    """,
)
def pipeline_quality_classifier_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a fixed-weight logistic scorer
    over cheap text features (log length, stopword rate, mean word
    length, digit-token rate) — the relational skeleton of the
    fasttext/CCNet-style quality classifier every production corpus
    runs after heuristic filters (the weights here are frozen
    literals; production swaps in trained ones, the plan is
    identical).  Keep/drop uses the ROUNDED logit against 0 (not the
    sigmoid against 0.5) so the decision never sits on a libm
    boundary; the sigmoid is round(6)-quantized per doc and summed
    through DECIMAL for the per-source mean.  Features are built from
    the same tokenization contract as text_tokenize_stats (lower,
    split \\s+, drop empties) — pure codegen HOFs, one source-keyed
    agg, no Python."""
    from .text import tokens

    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    nt = F.greatest(F.size(toks), F.lit(1))
    stop = F.array(*[F.lit(t) for t in ("the", "and", "of", "to", "in")])
    f_len = F.round(F.log(F.lit(1) + F.col("n_chars")), 6)
    f_stop = F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))) / nt, 6
    )
    f_wlen = F.round(
        F.length(F.regexp_replace(F.lower(F.col("text")), "\\s+", "")) / nt, 6
    )
    f_digit = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[0-9]"))) / nt, 6
    )
    z = F.round(
        F.lit(-2.0)
        + F.lit(0.55) * f_len
        + F.lit(2.0) * f_stop
        - F.lit(0.15) * f_wlen
        - F.lit(1.2) * f_digit,
        6,
    )
    scored = d.select("source", z.alias("z"))
    keep = F.when(F.col("z") >= 0, 1).otherwise(0)
    score6 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep).alias("n_keep"),
        F.round(F.sum(keep) / F.count(F.lit(1)).cast("double"), 6).alias(
            "keep_rate"
        ),
        F.round(
            F.sum(score6.cast("decimal(14,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
    )


#: Epochs materialized by the deterministic shuffle plan.
_SHUFFLE_EPOCHS = (0, 1)
_SHUFFLE_SEED = "graft-r7"


@query(
    "pipeline_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest([{', '.join(str(e) for e in _SHUFFLE_EPOCHS)}])
               AS epoch),
    keyed AS (
      SELECT e.epoch, d.doc_id,
             md5('{_SHUFFLE_SEED}:' || e.epoch || ':' || d.doc_id) AS h
      FROM documents d CROSS JOIN e
    )
    SELECT epoch::BIGINT AS epoch,
           row_number() OVER (PARTITION BY epoch ORDER BY h) AS position,
           doc_id
    FROM keyed
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-seeded global shuffle — the training
    dataloader's ordering contract: every worker, resumption, and
    re-run of epoch N sees the SAME permutation (md5(seed:epoch:id)
    rank), and different epochs see independent ones, with no RNG
    state to checkpoint.  This is how large-scale runs shuffle 100 TB:
    a hash rank materialized with the data (or computed on the fly),
    never a driver-held permutation array.  The per-epoch position is
    a two-phase distributed rank (``distrank.two_phase_row_number``):
    the md5 sort key is already uniform, so its leading 16 bits ARE
    the range bucketing — rows rank locally within (epoch, bucket)
    windows of ~N/B rows and add a broadcast per-bucket prefix offset.
    No task ever carries a whole epoch (the r7 single-reducer window
    this replaces).  Epochs fan out via a tiny broadcast spine."""
    from .distrank import two_phase_row_number

    d = table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.createDataFrame(
        [(e,) for e in _SHUFFLE_EPOCHS], "epoch long"
    )
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(
                ":", F.lit(_SHUFFLE_SEED), F.col("epoch").cast("string"),
                F.col("doc_id").cast("string")
            )
        ).alias("h"),
    )
    n_b = 32
    bucket = F.expr(
        f"int(conv(substring(h, 1, 4), 16, 10)) * {n_b} div 65536"
    )
    ranked = two_phase_row_number(
        keyed, ["epoch"], ["h"], "position", bucket=bucket, n_buckets=n_b
    )
    return ranked.select("epoch", "position", "doc_id")


@query(
    "pipeline_dataset_card",
    oracle="""
    WITH d AS (
      SELECT source, lang, n_chars,
             coalesce(len(list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> '')), 0)
               AS n_tokens,
             (text IS NULL OR length(trim(text)) = 0) AS is_empty
      FROM documents
    ),
    tot AS (SELECT cast(count(*) AS BIGINT) AS n_total,
                   cast(sum(n_tokens) AS BIGINT) AS tok_total FROM d),
    lang_rank AS (
      SELECT source, lang, count(*) AS c,
             row_number() OVER (PARTITION BY source
                                ORDER BY count(*) DESC, lang) AS rn
      FROM d WHERE lang IS NOT NULL GROUP BY source, lang
    ),
    per_source AS (
      SELECT source,
             cast(count(*) AS BIGINT)                    AS n_docs,
             cast(sum(n_chars) AS BIGINT)                AS total_chars,
             cast(sum(n_tokens) AS BIGINT)               AS total_tokens,
             cast(count(DISTINCT lang) AS BIGINT)        AS n_langs,
             cast(sum(CASE WHEN is_empty THEN 1 ELSE 0 END)
                  AS BIGINT)                             AS n_empty
      FROM d GROUP BY source
    )
    SELECT p.source, p.n_docs, p.total_chars, p.total_tokens, p.n_langs,
           p.n_empty,
           lr.lang                                        AS top_lang,
           (1000000 * p.n_docs) // t.n_total              AS docs_share_ppm,
           (1000000 * p.total_tokens) // t.tok_total      AS token_share_ppm
    FROM per_source p
    JOIN lang_rank lr ON lr.source = p.source AND lr.rn = 1
    CROSS JOIN tot t
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card generation — the per-source summary table every
    released training corpus ships (the "data statement": volume,
    token counts, language makeup, share of mixture, junk rate) and
    every curation run re-derives before changing mixture weights
    (pipeline_mix_weights decides; THIS is the evidence table it reads
    from).  Per source: docs, chars, whitespace tokens, distinct
    languages, dominant language (count-then-lexicographic
    deterministic mode), empty/null-document count, and exact ppm
    shares of corpus docs and tokens via floor division.  Plan: one
    map-linear token-count projection, one partial-agged source
    groupBy (source domain ≈ 20), a source×lang grid window for the
    mode, and a 1-row total broadcast — nothing downstream of the
    scan is corpus-sized."""
    from .text import tokens

    d = table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.coalesce(F.size(tokens(F.col("text"))), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        (
            F.col("text").isNull() | (F.length(F.trim("text")) == 0)
        ).alias("is_empty"),
    )
    tot = F.broadcast(
        d.agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("n_tokens").cast("long").alias("tok_total"),
        )
    )
    wlr = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("lang")
    )
    lang_rank = (
        d.filter(F.col("lang").isNotNull())
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(wlr))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum(F.when(F.col("is_empty"), 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
    )
    return (
        per_source.join(F.broadcast(lang_rank), "source")
        .crossJoin(tot)
        .select(
            "source",
            "n_docs",
            "total_chars",
            "total_tokens",
            "n_langs",
            "n_empty",
            "top_lang",
            F.expr("(1000000 * n_docs) div n_total").alias("docs_share_ppm"),
            F.expr("(1000000 * total_tokens) div tok_total").alias(
                "token_share_ppm"
            ),
        )
    )


#: DSIR selection parameters: hashed-unigram feature space (the
#: text_feature_hashing bucket contract, md5-prefix mod B — a FIXED
#: domain at any corpus size), the target domain proxy, and the report
#: depth.
_DSIR_BUCKETS = 1024
_DSIR_TARGET = "src0"
_DSIR_TOPK = 100


@query(
    "pipeline_dsir_select",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                t -> t <> '')) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (
      SELECT doc_id, source,
             cast(('0x' || substr(md5(t), 1, 8))::BIGINT % {_DSIR_BUCKETS}
                  AS BIGINT) AS bucket
      FROM tok
    ),
    tgt AS (SELECT bucket, count(*) AS nt FROM b
            WHERE source = '{_DSIR_TARGET}' GROUP BY bucket),
    pool AS (SELECT bucket, count(*) AS nq FROM b
             WHERE source <> '{_DSIR_TARGET}' GROUP BY bucket),
    tt AS (SELECT sum(nt) AS t FROM tgt),
    tq AS (SELECT sum(nq) AS t FROM pool),
    pdoc AS (
      SELECT doc_id, source, bucket, count(*) AS cnt
      FROM b WHERE source <> '{_DSIR_TARGET}' GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT doc_id, source,
             cast(sum(cnt) AS BIGINT) AS n_tokens,
             round(sum(cnt * (ln(coalesce(nt, 0) + 1) - ln(nq + 1)))
                   + sum(cnt) * (ln(tq.t + {_DSIR_BUCKETS})
                                 - ln(tt.t + {_DSIR_BUCKETS})), 6)
               AS dsir_score
      FROM pdoc LEFT JOIN tgt USING (bucket) JOIN pool USING (bucket), tt, tq
      GROUP BY doc_id, source, tt.t, tq.t
    )
    SELECT doc_id, source, n_tokens, dsir_score, cast(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (ORDER BY dsir_score DESC, doc_id)
                    AS rn
          FROM scored) x
    WHERE rn <= {_DSIR_TOPK}
    """,
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (the DSIR recipe, Xie
    et al. 2023): score every candidate-pool document by how much its
    hashed-unigram profile looks like the TARGET domain rather than
    the pool — score(doc) = Σ_b c_b·(ln p̂_t(b) − ln q̂(b)) with add-1
    smoothing over the FIXED {_DSIR_BUCKETS}-bucket hashed feature
    space (the text_feature_hashing contract: md5-prefix buckets, no
    vocabulary state, bit-portable across engines) — then keep the
    top-{_DSIR_TOPK}.  This is the importance-weighting step every
    production pretraining-mix pipeline runs to up-sample
    target-domain-like web data; target here is the '{_DSIR_TARGET}'
    source, pool is everything else.  Scale shape: tokenize-explode →
    one (doc, bucket)-keyed partial agg (map-side combine absorbs
    repeats); both distribution tables are ≤{_DSIR_BUCKETS} rows by
    construction (bounded feature domain — hashing, not vocabulary),
    so their joins broadcast at any corpus size; totals are 1-row
    broadcasts; final top-k is a TakeOrdered.  The log-ratio sum is
    rounded at 1e-6 AFTER summation and the rank orders by the
    ROUNDED score (ties → doc_id), so both engines rank
    identically."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
    e = d.select("doc_id", "source", F.explode(toks).alias("t"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long"),
        F.lit(_DSIR_BUCKETS),
    ).cast("long")
    b = e.select("doc_id", "source", bucket.alias("bucket"))
    is_target = F.col("source") == _DSIR_TARGET
    tgt = (
        b.filter(is_target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    pool = (
        b.filter(~is_target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("nq"))
    )
    tt = tgt.agg(F.sum("nt").alias("tt"))
    tq = pool.agg(F.sum("nq").alias("tq"))
    pdoc = (
        b.filter(~is_target)
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # bounded domain: hashed feature space, fixed B buckets at any
    # corpus size — both distribution tables broadcast safely
    joined = (
        pdoc.join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(pool), "bucket")
        .join(F.broadcast(tt))
        .join(F.broadcast(tq))
    )
    scored = joined.groupBy("doc_id", "source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.round(
            F.sum(
                F.col("cnt")
                * (
                    F.log(F.coalesce(F.col("nt"), F.lit(0)) + 1)
                    - F.log(F.col("nq") + 1)
                )
            )
            + F.sum("cnt")
            * (
                F.log(F.max("tq") + _DSIR_BUCKETS)
                - F.log(F.max("tt") + _DSIR_BUCKETS)
            ),
            6,
        ).alias("dsir_score"),
    )
    top = scored.orderBy(F.col("dsir_score").desc(), F.col("doc_id")).limit(
        _DSIR_TOPK
    )
    # bounded: window ranks the top-k limit output only
    w = Window.orderBy(F.col("dsir_score").desc(), F.col("doc_id"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))
