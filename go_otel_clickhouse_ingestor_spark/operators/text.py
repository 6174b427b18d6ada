"""Text analysis for large-scale training-data pipelines.

The reference is a pure ingestor with no text processing; these are
the north-star extensions (BASELINE.json) a 100 TB document pipeline
needs: language ID, quality scoring, token counting, fingerprinting.

Everything here is built-in JVM expressions (split / filter /
regexp_extract_all / md5 / aggregate) — no Python in the hot path, so
the per-document cost is whole-stage-codegen cheap and the only
shuffle anywhere is the explicit groupBy in the aggregate views.

Determinism contract: every function is a pure expression implemented
identically in the DuckDB oracle, so outputs (including the heuristic
language guess) hash-match across engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

#: Stopword marker sets per language for the n-gram/token heuristic.
#: Tiny on purpose: broadcast as literals into the expression tree.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "las", "que", "de", "un"),
}

_PUNCT_RE = "[.,!?;:]"
_WORD_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Non-empty whitespace tokens of lowercased text."""
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens fall in a marker set (JVM array ops)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def _marker_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return (
        "len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''),"
        f" t -> list_contains([{lst}], t)))::BIGINT"
    )


@query(
    "text_tokenize_stats",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
           length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_nonspace_chars,
           round(length(regexp_replace(text, '\\s', '', 'g'))
                 / greatest(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')), 1), 6)
             AS avg_token_len,
           n_chars
    FROM documents
    """,
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tokenization stats: token count, non-space chars,
    mean token length.  Pure map-side projection — scales linearly,
    zero shuffles."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    nonspace = F.length(F.regexp_replace("text", "\\s", ""))
    n_toks = F.size(toks)
    return d.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        nonspace.cast("long").alias("n_nonspace_chars"),
        F.round(nonspace / F.greatest(n_toks, F.lit(1)), 6).alias("avg_token_len"),
        "n_chars",
    )


def _lang_pred_sql() -> str:
    s = {k: _marker_sql(v) for k, v in LANG_MARKERS.items()}
    return f"""
    SELECT doc_id,
           {s['en']} AS s_en, {s['de']} AS s_de, {s['fr']} AS s_fr, {s['es']} AS s_es,
           CASE
             WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} AND {s['en']} >= {s['es']} THEN 'en'
             WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['es']} THEN 'de'
             WHEN {s['fr']} >= {s['es']} THEN 'fr'
             ELSE 'es'
           END AS lang_pred,
           lang AS lang_label
    FROM documents
    """


@query("text_lang_id", oracle=_lang_pred_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-marker counting — the classic cheap
    n-gram heuristic (fasttext-free).  Deterministic argmax with a
    fixed preference order (en > de > fr > es) so ties are stable.

    The fixture texts are synthetic word soup, so ``lang_pred`` is not
    expected to equal ``lang_label``; the differential check asserts
    the *function*, not model accuracy."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    s = {k: marker_count(toks, v) for k, v in LANG_MARKERS.items()}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        s["en"].alias("s_en"),
        s["de"].alias("s_de"),
        s["fr"].alias("s_fr"),
        s["es"].alias("s_es"),
        pred.alias("lang_pred"),
        F.col("lang").alias("lang_label"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           round(least(n_chars, 500) / 500.0, 6) AS len_norm,
           round(len(regexp_extract_all(text, '{_PUNCT_RE}')) / greatest(n_chars, 1), 6) AS punct_ratio,
           round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(n_chars, 1), 6) AS alpha_ratio,
           round(0.4 * (least(n_chars, 500) / 500.0)
               + 0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(n_chars, 1))
               - 0.1 * (len(regexp_extract_all(text, '{_PUNCT_RE}')) / greatest(n_chars, 1)), 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation, alphabetic ratio,
    punctuation penalty — the usual pre-training corpus filter features,
    combined into one bounded score."""
    d = table(spark, sf_dir, "documents")
    n_chars = F.col("n_chars")
    len_norm = F.least(n_chars, F.lit(500)) / 500.0
    punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_RE), F.lit(0))) / F.greatest(
        n_chars, F.lit(1)
    )
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    return d.select(
        "doc_id",
        F.round(len_norm, 6).alias("len_norm"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(0.4 * len_norm + 0.5 * alpha - 0.1 * punct, 6).alias("quality"),
    )


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{_WORD_RE}'))::BIGINT AS n_bpe_ish,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_ws,
           ceil(n_chars / 4.0)::BIGINT AS n_chars_div4
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: a BPE-ish regex (letters / digits /
    punctuation pieces), whitespace tokens, and the chars/4 rule of
    thumb — the cost estimators a data pipeline runs before training."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe_ish"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_chars_div4"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           count(*) OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_same
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized md5 document fingerprint + per-fingerprint
    multiplicity — the exact-dedup key.  md5 (not xxhash64) because it
    is bit-stable across every engine, so downstream systems can join
    on it."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))))
    from pyspark.sql.window import Window

    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count(F.lit(1)).over(Window.partitionBy(fp)).alias("n_same"),
    )


@query(
    "text_shingle_profile",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             len(t)::BIGINT AS n_tokens,
             list_transform(range(len(t) - 2),
                            i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS shingles
      FROM toks
      WHERE len(t) >= 3
    )
    SELECT doc_id, n_tokens,
           len(shingles)::BIGINT AS n_shingles,
           len(list_distinct(shingles))::BIGINT AS n_distinct,
           round(len(list_distinct(shingles)) / len(shingles)::DOUBLE, 6) AS distinct_ratio
    FROM sh
    """,
)
def text_shingle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-token shingle profile: shingle count, distinct
    shingle count, and the distinct ratio (≈1 − internal repetitiveness
    — the standard boilerplate/spam signal, and the exact shingle set
    MinHash sketches).  All array higher-order functions on the JVM:
    ``transform`` over an index ``sequence`` builds shingles with zero
    explode — no row blow-up, no shuffle; per-doc cost is linear in
    token count."""
    d = table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower(F.col("text"))), "\\s+")
    # Spark [] indexing is 0-based (DuckDB list indexing is 1-based);
    # both sides enumerate i = 0 .. len-3 over the same token list.
    shingles = F.expr(
        "transform(sequence(0, size(t) - 3),"
        " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
    )
    return (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            shingles.alias("sh"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("sh").cast("long").alias("n_shingles"),
            F.size(F.array_distinct("sh")).cast("long").alias("n_distinct"),
            F.round(
                F.size(F.array_distinct("sh"))
                / F.size("sh").cast("double"),
                6,
            ).alias("distinct_ratio"),
        )
    )


#: Chunking geometry: window of _CHUNK tokens advancing by _STRIDE
#: (_CHUNK - _STRIDE tokens of overlap between neighbors).
_CHUNK = 50
_STRIDE = 40


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents WHERE text IS NOT NULL
    ), starts AS (
      SELECT doc_id, t, len(t)::BIGINT AS n_tokens,
             unnest(range(0, len(t), {_STRIDE})) AS s
      FROM toks
    )
    SELECT doc_id,
           (s / {_STRIDE})::BIGINT AS chunk_id,
           least({_CHUNK}, n_tokens - s)::BIGINT AS n_chunk_tokens,
           array_to_string(t[s+1 : s+{_CHUNK}], ' ') AS chunk_text
    FROM starts
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    of an embedding/training pipeline: {_CHUNK}-token chunks advancing
    by {_STRIDE} (10-token overlap so no span is split across a chunk
    boundary unseen).

    Shape: tokenization + start-offset ``sequence`` + one ``explode``
    — the only row expansion is the output chunks themselves (≈
    n_tokens/stride rows per doc), all JVM HOFs, zero shuffles, linear
    in corpus size.  The overlap factor (here 1.25×) is the storage
    amplification a planner must budget at 100 TB."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = F.split(F.trim(F.lower(F.col("text"))), "\\s+")
    return (
        d.select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            "t",
            F.size("t").cast("long").alias("n_tokens"),
            F.explode(F.expr(f"sequence(0, size(t) - 1, {_STRIDE})")).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / _STRIDE).cast("long").alias("chunk_id"),
            F.least(F.lit(_CHUNK), F.col("n_tokens") - F.col("s"))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.concat_ws(" ", F.expr(f"slice(t, s + 1, {_CHUNK})")).alias("chunk_text"),
        )
    )


#: TF-IDF top-terms-per-doc: terms per doc capped to this many.
_TFIDF_TOP = 3


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents WHERE doc_id < 200
    ),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored) t
    WHERE rn <= {_TFIDF_TOP}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-{_TFIDF_TOP} terms per document (fenced to 200
    docs so the oracle's token explosion stays fixture-sized; the plan
    is corpus-scale).  Cost shape: one explode → (doc, term) agg →
    document-frequency agg → term-keyed shuffle join BACK →
    per-doc top-k window.  The df table grows with the vocabulary
    (Heaps' law: unbounded in the corpus), so it must NOT be forced
    broadcast — both sides of the join are term-keyed, so the shuffle
    join is co-partitioned and never reshuffles the token stream
    twice; idf uses the natural log of n_docs/df with a deterministic
    term tie-break."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = tf.select(F.count_distinct("doc_id").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        # no broadcast hint: df_t is vocabulary-sized (unbounded under
        # Heaps' law at corpus scale); tf and df_t are both term-keyed,
        # so Catalyst plans a co-partitioned shuffle join, and AQE may
        # still broadcast it when the runtime size fits the threshold.
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOP)
        .select("doc_id", "term", "tf", "tfidf")
    )


@query(
    "text_repetition_gopher",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    agg AS (
      SELECT doc_id, sum(c) AS total, max(c) AS top_c,
             sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS rep_c
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id, total::BIGINT AS n_tokens,
           round(top_c / total::DOUBLE, 6) AS top_word_ratio,
           round(rep_c / total::DOUBLE, 6) AS repeated_token_ratio
    FROM agg
    """,
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals in the style of the Gopher/MassiveText
    filtering rules (Rae et al. 2021, public): per document, the
    fraction of tokens taken by the single most frequent word and the
    fraction of tokens whose word occurs ≥2 times.  Explode → two
    cascaded aggs, both keyed by doc_id so the second agg is
    shuffle-free (same partitioning); per-doc cost linear in tokens."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), "\\s+")).alias("w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top_c"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("rep_c"),
    )
    return agg.select(
        "doc_id",
        F.col("total").cast("long").alias("n_tokens"),
        F.round(F.col("top_c") / F.col("total").cast("double"), 6).alias(
            "top_word_ratio"
        ),
        F.round(F.col("rep_c") / F.col("total").cast("double"), 6).alias(
            "repeated_token_ratio"
        ),
    )


#: PII patterns (lowercase text): deliberately simple expressions that
#: parse identically under Java regex (Spark) and RE2 (DuckDB).
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-[0-9]{3}-[0-9]+"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN lower(text) || ' contact user' || doc_id ||
                       '@example.com or +1-555-0' || doc_id || ' now'
                  ELSE lower(text) END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}'))::BIGINT AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_fp
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email/phone spans (the fixture
    corpus is synthetic word-salad, so PII is injected deterministically
    into every 5th document — the scrub path is exercised on real
    matches, not vacuous zeros).  Pure codegen regexp expressions,
    zero shuffles, map-linear; the output carries the scrubbed text's
    md5 so the oracle verifies the REDACTED CONTENT, not just counts."""
    d = table(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lower("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0"),
            F.col("doc_id").cast("string"),
            F.lit(" now"),
        ),
    ).otherwise(F.lower("text"))
    aug = d.select("doc_id", t.alias("t"))
    return aug.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("scrubbed_fp"),
    )


@query(
    "text_trigram_lm_score",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(t) - 1),
                                   i -> substring(t, i, 3))) AS gram
      FROM norm WHERE length(t) >= 3
    ),
    freq AS (SELECT gram, count(*)::DOUBLE AS n FROM grams GROUP BY gram),
    tot AS (SELECT sum(n) AS total FROM freq)
    SELECT g.doc_id,
           count(*)::BIGINT AS n_grams,
           round(avg(log2(f.n / (SELECT total FROM tot))), 4) AS avg_logp
    FROM grams g JOIN freq f USING (gram)
    GROUP BY g.doc_id
    """,
)
def text_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-model scoring — the cheap perplexity
    proxy curation pipelines use to rank fluency before an expensive
    model-based filter: score(doc) = mean log2 P(gram) under the
    corpus's own trigram distribution (low = out-of-distribution /
    gibberish).

    Two-pass plan: (1) explode trigrams and count gram frequencies —
    one shuffle over the gram key with map-side partial counts; (2)
    join the exploded grams back to the frequency table and average per
    doc.  The gram table is corpus-vocabulary-sized (bounded: ≤ ~60³
    distinct char trigrams of normalized text), so at 100 TB pass 2's
    probe side broadcasts and only the per-doc average shuffles — the
    same broadcast-df shape as text_tfidf_top_terms.  All codegen:
    trigram extraction is sequence+transform+substring, no Python."""
    norm = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")).alias("t"),
    )
    # explode the INDEX sequence and slice with a plain substring
    # expression — a transform(...) lambda would extract every gram
    # inside an interpreted HOF (the same cliff gram_hashes documents);
    # this form keeps the per-gram work in whole-stage codegen
    grams = (
        norm.filter(F.length("t") >= 3)
        .select("doc_id", "t", F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"))
        .select("doc_id", F.expr("substring(t, i, 3)").alias("gram"))
    )
    from .dedup import materialized

    # ONE explode pass: collapse the gram stream to per-(doc, gram)
    # multiplicities first — docs are partition-local, so the partial
    # aggregate reduces each doc's grams map-side and the shuffle ships
    # (doc, distinct-gram) rows instead of every gram instance.  The
    # old two-pass form re-derived the normalize+explode for the probe
    # side (two full corpus explodes); freq and the per-doc score both
    # fold from this one persisted table now (guide §2.3/§2.4).
    dg = materialized(
        grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    )
    # bounded domain: char trigrams of normalized text — ≤ ~60^3
    # distinct keys regardless of corpus size, so the broadcast build is
    # fixed-size at 100 TB (unlike word vocabularies, which are
    # Heaps-unbounded).
    freq = materialized(
        dg.groupBy("gram").agg(F.sum("c").cast("double").alias("n"))
    )
    total_row = freq.agg(F.sum("n")).first()[0]
    if total_row is None:  # empty corpus: no gram mass, no scores
        return spark.createDataFrame(
            [], "doc_id bigint, n_grams bigint, avg_logp double"
        )
    total = float(total_row)
    # instance-weighted mean == the oracle's avg over exploded grams
    # (Σ c·log2(p) / Σ c); double partial-sum order differs either way
    # and the 1e-4 rounding absorbs it, as with every avg in the repo
    return (
        dg.join(F.broadcast(freq), "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(
                F.sum(F.col("c") * F.log2(F.col("n") / F.lit(total)))
                / F.sum("c"),
                4,
            ).alias("avg_logp"),
        )
    )


@query(
    "text_html_strip",
    oracle="""
    WITH wrapped AS (
      SELECT doc_id,
             '<!DOCTYPE html><p class="doc" id="d' || cast(doc_id AS VARCHAR)
             || '">' || replace(replace(text, ' and ', ' &amp; '),
                                ' of ', ' &lt;of&gt; ')
             || '</p><br/><a href="/d/' || cast(doc_id AS VARCHAR) || '">x</a>'
               AS html
      FROM documents
    )
    SELECT doc_id,
           substr(replace(replace(replace(replace(replace(
             regexp_replace(html, '<[^>]*>', '', 'g'),
             '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), 1, 120)                                AS clean_head,
           len(regexp_extract_all(html, '<[^>]*>'))::BIGINT         AS n_tags,
           length(regexp_replace(html, '<[^>]*>', '', 'g'))::BIGINT AS clean_len
    FROM wrapped
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML strip + entity decode — the first transform applied to any
    crawled corpus (the reference's pipelines ingest JSON, but a web
    corpus arrives as markup).  The fixtures carry plain text, so both
    engines wrap each doc in identical deterministic markup (tags with
    attributes, entities injected into the body) and the oracle checks
    the STRIPPER: tag regex removal, the 5-entity decode chain, and
    the tag census.  Order matters — ``&amp;`` decodes LAST in real
    strippers to avoid double-decoding, but this op intentionally
    mirrors one fixed chain in both engines.  Scale: chained codegen
    regex/replace, map-only, no shuffle."""
    d = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<!DOCTYPE html><p class="doc" id="d'),
        F.col("doc_id").cast("string"),
        F.lit('">'),
        F.regexp_replace(
            F.regexp_replace("text", " and ", " &amp; "), " of ", " &lt;of&gt; "
        ),
        F.lit('</p><br/><a href="/d/'),
        F.col("doc_id").cast("string"),
        F.lit('">x</a>'),
    )
    w = d.select("doc_id", html.alias("html"))
    stripped = F.regexp_replace("html", "<[^>]*>", "")
    decoded = stripped
    for ent, ch in (
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return w.select(
        "doc_id",
        F.substring(decoded, 1, 120).alias("clean_head"),
        F.size(F.expr("regexp_extract_all(html, '<[^>]*>', 0)"))
        .cast("long")
        .alias("n_tags"),
        F.length(stripped).cast("long").alias("clean_len"),
    )


@query(
    "text_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM toks GROUP BY w
        ORDER BY c DESC, w ASC LIMIT 1000
      ) t
    )
    SELECT toks.doc_id,
           count(*)                                   AS n_tokens,
           count(*) FILTER (WHERE vocab.w IS NULL)    AS n_oov,
           round(count(*) FILTER (WHERE vocab.w IS NULL)
                 / cast(count(*) AS DOUBLE), 4)       AS oov_rate
    FROM toks LEFT JOIN vocab ON toks.w = vocab.w
    GROUP BY toks.doc_id
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the corpus' top-1000-word
    vocabulary (frequency desc, word asc — a deterministic cut), then
    score every document's out-of-vocabulary token rate against it —
    the standard pre-tokenizer audit before committing a vocab to a
    training run.  Two-phase shape that matters at 100 TB: the vocab
    aggregate produces a BOUNDED table (1000 rows) regardless of corpus
    size, which broadcasts back for a shuffle-free membership probe
    (the decontaminate_ngram_overlap pattern); per-doc aggregation
    shuffles on doc_id once."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(1000)
        .select(F.col("w").alias("vw"))
    )
    joined = toks.join(F.broadcast(vocab), toks.w == F.col("vw"), "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_if(F.col("vw").isNull()).alias("n_oov"),
        F.round(
            F.count_if(F.col("vw").isNull()) / F.count(F.lit(1)).cast("double"), 4
        ).alias("oov_rate"),
    )


# ------------------------------------------------- round-5b additions

@query(
    "text_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z]+'))            AS words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))  AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))     AS syllables
      FROM documents
    )
    SELECT doc_id, words, sentences, syllables,
           round(206.835 - 1.015 * (words / cast(sentences AS DOUBLE))
                 - 84.6 * (syllables / cast(words AS DOUBLE)), 4)  AS flesch
    FROM m
    WHERE words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with the standard cheap
    proxies: words = latin-letter runs, sentences = terminal-punct
    runs (floored at 1), syllables = vowel-group count (the classic
    vowel-cluster approximation — no dictionary needed).  All three
    counters are regexp_extract_all sizes, identical character classes
    in Spark's Java regex and DuckDB's RE2 (plain classes, no
    dialect-divergent constructs).  Pure per-row codegen — no shuffle,
    no Python — so at 100 TB this is a map-only pass that pipelines
    with any downstream quality filter."""
    d = table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '[A-Za-z]+', 0))")
        .cast("long")
        .alias("words"),
        F.expr("greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))")
        .cast("long")
        .alias("sentences"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
        .cast("long")
        .alias("syllables"),
    )
    return m.filter(F.col("words") > 0).select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("words") / F.col("sentences").cast("double"))
            - 84.6 * (F.col("syllables") / F.col("words").cast("double")),
            4,
        ).alias("flesch"),
    )


@query(
    "stat_entropy_gini",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)
    SELECT c.source,
           cast(max(t.tot) AS BIGINT)                                AS n_docs,
           count(*)                                                  AS n_langs,
           round(-sum((c.n / cast(t.tot AS DOUBLE))
                      * ln(c.n / cast(t.tot AS DOUBLE))), 6)         AS entropy,
           round(1 - sum((c.n / cast(t.tot AS DOUBLE))
                         * (c.n / cast(t.tot AS DOUBLE))), 6)        AS gini
    FROM c JOIN t ON c.source = t.source
    GROUP BY c.source
    """,
)
def stat_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix diversity per corpus source: Shannon entropy and
    Gini impurity of the language distribution — the two standard
    "is this slice monoculture?" metrics a mixture-planning pipeline
    reads before setting sampling weights (cf. pipeline_mix_weights).
    Counts are exact; the p·ln p sum runs over ≤|langs| cells per
    source so round(6) is far beyond association noise.  Plan: one
    (source, lang) agg over the corpus, then margin agg + broadcast
    join over the already-tiny cell table — documents scanned once."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    c = c.persist()
    t = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source")
        .agg(
            F.max("tot").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(F.lit(1) - F.sum(p * p), 6).alias("gini"),
        )
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS w
      FROM documents
    ),
    counts AS (SELECT w, count(*) AS n FROM words GROUP BY w),
    top AS (
      SELECT w, n FROM counts ORDER BY n DESC, w ASC LIMIT 500
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, w ASC) AS rnk FROM top
    ),
    pts AS (
      SELECT ln(rnk) AS x, ln(n) AS y FROM ranked
    ),
    s AS (
      SELECT count(*) AS m,
             cast(sum(cast(x AS DECIMAL(20,12))) AS DOUBLE)     AS sx,
             cast(sum(cast(y AS DECIMAL(20,12))) AS DOUBLE)     AS sy,
             cast(sum(cast(x * y AS DECIMAL(24,12))) AS DOUBLE) AS sxy,
             cast(sum(cast(x * x AS DECIMAL(24,12))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT m AS n_points,
           round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)      AS zipf_slope,
           round((sy - ((m * sxy - sx * sy) / (m * sxx - sx * sx))
                  * sx) / m, 6)                                     AS intercept
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS slope of
    ln(frequency) against ln(rank) for the top-500 words — natural
    text runs near slope −1, and a corpus that doesn't is synthetic,
    templated, or spam-heavy (the distribution-level health check next
    to the per-doc quality scores).  The vocabulary cut is a bounded
    top-k (TakeOrderedAndProject, count desc / word asc total order —
    ties at the boundary can't diverge between engines), ranking runs
    over exactly 500 rows, and the OLS moments go through DECIMAL.
    Scale: word counting is the only corpus-sized stage (one agg);
    everything after is 500 rows."""
    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")
        ).alias("w")
    )
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(500)
    )
    from pyspark.sql.window import Window

    ranked = top.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("w").asc()))
        .alias("rnk"),
    )
    pts = ranked.select(
        F.log(F.col("rnk").cast("double")).alias("x"), F.log("n").alias("y")
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.expr("cast(sum(cast(x as decimal(20,12))) as double)").alias("sx"),
        F.expr("cast(sum(cast(y as decimal(20,12))) as double)").alias("sy"),
        F.expr("cast(sum(cast(x * y as decimal(24,12))) as double)").alias("sxy"),
        F.expr("cast(sum(cast(x * x as decimal(24,12))) as double)").alias("sxx"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("m").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("m"), 6).alias(
            "intercept"
        ),
    )


@query(
    "text_char_trigram_entropy",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             unnest([substring(lower(text), i, 3)
                     for i in range(1, greatest(len(text) - 1, 1))]) AS gram
      FROM documents
    ),
    c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
    t AS (SELECT doc_id, sum(n) AS tot, count(*) AS n_distinct
          FROM c GROUP BY doc_id)
    SELECT c.doc_id,
           cast(max(t.tot) AS BIGINT)      AS n_grams,
           max(t.n_distinct)               AS n_distinct,
           round(-sum((c.n / cast(t.tot AS DOUBLE))
                      * ln(c.n / cast(t.tot AS DOUBLE))), 6) AS entropy
    FROM c JOIN t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id
    """,
)
def text_char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-trigram Shannon entropy — the
    compression-ratio proxy for gibberish and boilerplate (natural
    prose sits in a narrow entropy band; keyboard mash and repeated
    templates fall out both sides — the Gopher-style distribution
    filter at character granularity).  Grams come from codegen
    substring slicing (the text_trigram_lm_score kernel, no
    interpreted HOF), counted per (doc, gram), then folded to per-doc
    entropy; the p·ln p sum runs over each doc's own gram table so
    round(6) clears association noise.  Scale: explode → two keyed
    aggs — linear in corpus characters, shuffle keyed on (doc, gram
    hash)."""
    d = table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 1)),"
                " i -> substring(lower(text), i, 3))"
            )
        ).alias("gram"),
    )
    c = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("doc_id").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.join(t, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("tot").cast("long").alias("n_grams"),
            F.max("n_distinct").alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


def _compress_iter(batches):
    import zlib

    import pandas as pd

    for pdf in batches:
        if not len(pdf):
            continue
        raw = pdf["text"].str.encode("utf-8")
        comp_len = raw.map(lambda b: len(zlib.compress(b, 6)))
        raw_len = raw.map(len)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "raw_bytes": raw_len.astype("int64"),
                "compressed_bytes": comp_len.astype("int64"),
                "ratio": (comp_len / raw_len).round(6),
            }
        )
        yield out


@query("text_compression_ratio")  # rows-only: zlib backend is engine-specific
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the information-density
    quality signal the big web-corpus pipelines (RefinedWeb, Dolma)
    filter on: templated/repeated text compresses far below natural
    prose, random noise barely compresses at all.  zlib level 6 is
    deterministic for a given input, so the op is rerun-stable, but
    the byte counts are library-specific → rows-only with a pytest
    gate (determinism + the repetition ordering invariant).  Arrow-
    batched mapInPandas; map-only, no shuffle — the 100 TB cost is one
    decompression-speed-bound pass."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", "text").mapInPandas(
        _compress_iter,
        "doc_id long, raw_bytes long, compressed_bytes long, ratio double",
    )


@query(
    "text_collocations_pmi",
    oracle="""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    bi AS (
      SELECT u.p[1] AS w1, u.p[2] AS w2
      FROM toks, unnest(list_zip(t, t[2:])) AS u(p)
      WHERE u.p[2] IS NOT NULL
    ),
    bc AS (SELECT w1, w2, count(*) AS n_ab FROM bi GROUP BY 1, 2),
    uni AS (SELECT unnest(t) AS w FROM toks),
    uc AS (SELECT w, count(*) AS n_w FROM uni GROUP BY 1),
    tot AS (SELECT (SELECT count(*) FROM bi) AS tb,
                   (SELECT count(*) FROM uni) AS tu),
    scored AS (
      SELECT w1, w2, n_ab,
             round(ln(n_ab * cast(tu AS DOUBLE) * tu
                      / (cast(tb AS DOUBLE) * a.n_w * b.n_w)), 6) AS pmi
      FROM bc JOIN uc a ON bc.w1 = a.w
              JOIN uc b ON bc.w2 = b.w
              CROSS JOIN tot
      WHERE n_ab >= 5
    )
    SELECT w1, w2, n_ab, pmi,
           row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
    FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information —
    phrase mining ("machine learning", "new york") for tokenizer vocab
    curation and boilerplate detection.  PMI = ln(P(ab) / P(a)P(b))
    from three corpus-sized aggregates (bigram counts, unigram counts,
    two scalar totals), each a single keyed agg with map-side combine;
    the unigram table joins back onto the ≥5-support bigram survivors
    (a vocabulary-bounded table, broadcastable at any corpus size) and
    the final top-k is a 20-row TakeOrderedAndProject on the rounded
    score with a (w1, w2) tie-break — rank materialized into ``rn``
    because the driver hash is order-insensitive.  Bigrams come from a
    codegen transform over the token array (t[i-1], t[i]) — no Python,
    one explode."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')").alias("t")
    )
    from .dedup import materialized

    toks = materialized(toks)
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = materialized(bi)
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab")).filter(
        F.col("n_ab") >= 5
    )
    uni = toks.select(F.explode("t").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    tot = bi.agg(F.count(F.lit(1)).alias("tb")).join(
        uni.agg(F.count(F.lit(1)).alias("tu"))
    )
    a = uc.select(F.col("w").alias("w1"), F.col("n_w").alias("na"))
    b = uc.select(F.col("w").alias("w2"), F.col("n_w").alias("nb"))
    scored = (
        bc.join(a, "w1")
        .join(b, "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("tu").cast("double")
                    * F.col("tu")
                    / (F.col("tb").cast("double") * F.col("na") * F.col("nb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(20)
    from pyspark.sql.window import Window

    return top.select(
        "w1",
        "w2",
        "n_ab",
        "pmi",
        F.row_number()
        .over(
            Window.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        )
        .cast("long")
        .alias("rn"),
    )


@query(
    "text_dup_line_fraction",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    seg AS (
      SELECT doc_id,
             [ array_to_string(toks[((i-1)*12+1):((i-1)*12+12)], ' ')
               for i in range(1, cast(ceil(len(toks)/12.0) AS BIGINT) + 1) ] AS segs
      FROM tok WHERE len(toks) > 0
    ),
    e AS (SELECT doc_id, unnest(segs) AS seg FROM seg),
    g AS (
      SELECT doc_id, seg, count(*) AS cnt, len(seg) AS chars
      FROM e GROUP BY doc_id, seg
    )
    SELECT doc_id,
           sum(cnt)::BIGINT                                    AS n_segments,
           round(sum(cnt - 1) * 1.0 / sum(cnt), 6)             AS dup_seg_frac,
           round(sum((cnt - 1) * chars) * 1.0
                 / sum(cnt * chars), 6)                        AS dup_char_frac
    FROM g GROUP BY doc_id
    """,
)
def text_dup_line_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-paragraph metrics per document (Rae et al.
    2021, arXiv:2112.11446 §A1.1 quality filters): the fraction of a
    doc's segments that are repeats of an earlier identical segment in
    the SAME doc, by count and by character mass.  Gopher drops docs
    with high duplicate-line/paragraph fractions — boilerplate,
    scraped nav bars, template spam.  Segments are the deterministic
    12-token windows of :func:`dedup_paragraph_corpus` (real corpora
    split on newlines; the metric is segmentation-agnostic).

    Scale: two partial-aggregated shuffles, both keyed by doc_id (the
    (doc_id, segment-hash) pre-aggregation collapses repeats before
    the per-doc rollup) — map-linear, no windows, no joins."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
    segs = F.expr(
        "transform(sequence(0, cast(ceil(size(toks)/12.0) as int) - 1),"
        " i -> array_join(slice(toks, i*12+1, 12), ' '))"
    )
    g = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", F.explode(segs).alias("seg"))
        .groupBy("doc_id", "seg")
        .agg(F.count(F.lit(1)).alias("cnt"), F.length(F.first("seg")).alias("chars"))
    )
    return g.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_segments"),
        F.round(
            F.sum(F.col("cnt") - 1) / F.sum("cnt"), 6
        ).alias("dup_seg_frac"),
        F.round(
            F.sum((F.col("cnt") - 1) * F.col("chars"))
            / F.sum(F.col("cnt") * F.col("chars")),
            6,
        ).alias("dup_char_frac"),
    )


#: Fixed BPE merge table (rank = list position): the most common
#: English letter-pair merges, frozen so tokenization is a pure
#: deterministic function of the text.  A production pipeline loads
#: trained merges (GPT-2 BPE, SentencePiece) into the same structure.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("e", "r"), ("a", "t"), ("s", "t"), ("e", "n"),
    ("o", "r"), ("an", "d"), ("in", "g"), ("t", "o"), ("o", "u"),
    ("e", "d"), ("i", "s"), ("a", "r"), ("o", "f"), ("e", "s"),
    ("a", "l"), ("c", "h"), ("s", "h"), ("l", "e"), ("w", "h"),
    ("u", "n"), ("at", "e"), ("s", "e"), ("er", "s"), ("m", "e"),
    ("w", "a"), ("i", "t"), ("p", "a"), ("r", "o"), ("c", "o"),
    ("k", "e"), ("m", "a"), ("d", "e"), ("l", "o"), ("wh", "e"),
]

_BPE_RANKS = {pair: i for i, pair in enumerate(BPE_MERGES)}


def bpe_encode_with(word: str, ranks: dict) -> list[str]:
    """Greedy lowest-rank-first BPE of one word over an arbitrary
    pair→rank table — the exact merge loop of the GPT-2 encoder
    (public reference: openai/gpt-2 encoder.py).  ``ranks`` is either
    the frozen ``_BPE_RANKS`` or a table learned by
    ``train_bpe_merges`` — the drop-in slot the tokenize op
    documents."""
    parts = list(word)
    while len(parts) > 1:
        pairs = {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}
        ranked = [(p, ranks[p]) for p in pairs if p in ranks]
        if not ranked:
            break
        best = min(ranked, key=lambda x: x[1])[0]
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and (parts[i], parts[i + 1]) == best:
                out.append(parts[i] + parts[i + 1])
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def bpe_encode(word: str) -> list[str]:
    """``bpe_encode_with`` over the frozen ``BPE_MERGES`` table."""
    return bpe_encode_with(word, _BPE_RANKS)


def _bpe_iter_with(ranks: dict):
    """Arrow-batch BPE token counting over an arbitrary merge table,
    with a per-task word cache (Zipf makes the hit rate extreme)."""

    def run(batches):
        import pandas as pd

        cache: dict[str, int] = {}

        def count(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(bpe_encode_with(word, ranks))
                cache[word] = n
            return n

        for pdf in batches:
            words = pdf["text"].str.lower().str.split()
            n_ws = words.map(len)
            n_bpe = words.map(lambda ws: sum(count(w) for w in ws))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens_ws": n_ws.astype("int64"),
                    "n_tokens_bpe": n_bpe.astype("int64"),
                    "bpe_per_word": (n_bpe / n_ws.clip(lower=1)).round(4),
                }
            )

    return run


def _bpe_iter(batches):
    """Frozen-table BPE counting (back-compat name for the pytest
    fixtures); the trained-table twin builds the same stage from
    ``_bpe_iter_with(learned ranks)``."""
    yield from _bpe_iter_with(_BPE_RANKS)(batches)


@query("text_bpe_tokenize")  # rows-only: BPE is not expressible in SQL
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword (BPE) token counting — the unit every training-data
    budget, packing bin, and curriculum phase in this engine is
    denominated in when the downstream consumer is an LLM (the
    whitespace/regex counters in text_token_count are the cheap JVM
    proxy; this is the faithful one).  Greedy lowest-rank merge loop
    per word over a frozen merge table, run as Arrow-batched
    ``mapInPandas`` with a per-task word→length cache (Zipf makes the
    cache hit rate extreme: a few thousand distinct words cover almost
    all tokens).  Map-only, no shuffle; at 100 TB this is an
    embarrassingly parallel CPU pass, and a real tokenizer (tiktoken,
    HF tokenizers) drops into the same stage signature unchanged.
    Rows-only: no SQL twin can express the merge loop — the pytest
    gate checks hand-computed merges, an independent reference
    implementation, determinism, and the ws ≤ bpe ≤ chars bounds."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", "text").mapInPandas(
        _bpe_iter,
        "doc_id long, n_tokens_ws long, n_tokens_bpe long, bpe_per_word double",
    )


#: BPE training knobs: cap the word table the merge loop sees (Zipf
#: coverage argument — the same one text_vocab_coverage_curve measures:
#: the top-k words carry almost all token mass, so merges learned on
#: them transfer; HF/SentencePiece trainers sample for the same
#: reason), and the number of merges to learn.
_BPE_TRAIN_VOCAB_CAP = 10_000
_BPE_TRAIN_N_MERGES = 200


def train_bpe_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from (word, count) pairs — the
    byte-pair-encoding training loop of Sennrich et al. 2016
    ("Neural Machine Translation of Rare Words with Subword Units",
    public reference: rsennrich/subword-nmt learn_bpe.py), with the
    incremental pair-count maintenance that makes it O(total symbol
    updates) instead of a full recount per merge.  Deterministic: ties
    on count break to the lexicographically smallest pair."""
    from collections import Counter, defaultdict

    seqs = [list(w) for w, _ in word_counts]
    counts = [c for _, c in word_counts]
    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> word ids (may go stale)
    for i, (seq, c) in enumerate(zip(seqs, counts)):
        for p in zip(seq, seq[1:]):
            pair_counts[p] += c
            where[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        top = max(c for _, c in live)
        best = min(p for p, c in live if c == top)
        merges.append(best)
        for i in list(where[best]):
            seq, c = seqs[i], counts[i]
            if best not in set(zip(seq, seq[1:])):  # stale index entry
                continue
            for p in zip(seq, seq[1:]):
                pair_counts[p] -= c
            new: list[str] = []
            j = 0
            while j < len(seq):
                if j < len(seq) - 1 and (seq[j], seq[j + 1]) == best:
                    new.append(seq[j] + seq[j + 1])
                    j += 2
                else:
                    new.append(seq[j])
                    j += 1
            seqs[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += c
                where[p].add(i)
        del pair_counts[best]
    return merges


def _top_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-capped (word, count) frame for BPE training: one word-count
    shuffle over the corpus, then ``orderBy(count desc, word).limit``
    — TakeOrderedAndProject, so the only full-corpus work is the
    partial-aggregated count; the merge loop's input is bounded by the
    cap no matter the corpus size."""
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return wc.orderBy(F.col("n").desc(), F.col("w")).limit(_BPE_TRAIN_VOCAB_CAP)


def _train_iter(batches):
    """Run the merge-learning loop inside ONE executor task over the
    (already top-k-capped) word table.  The result is independent of
    word order (pair counts are commutative sums; ties break
    lexicographically), so however Arrow chunks the partition the
    merges come out identical."""
    import pandas as pd

    chunks = list(batches)
    if not chunks:  # empty/fully-filtered corpus: empty merge table
        yield pd.DataFrame(columns=["rank", "left", "right", "merged"])
        return
    rows = pd.concat(chunks)
    merges = train_bpe_merges(
        list(zip(rows["w"], rows["n"].astype(int))), _BPE_TRAIN_N_MERGES
    )
    yield pd.DataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        columns=["rank", "left", "right", "merged"],
    )


#: per-process memo: sf_dir -> learned ranks (training is deterministic,
#: so recomputation is pure waste within one session)
_BPE_TRAINED: dict[str, dict] = {}


def _trained_ranks(spark: SparkSession, sf_dir: str) -> dict:
    ranks = _BPE_TRAINED.get(sf_dir)
    if ranks is None:
        merges = text_bpe_train(spark, sf_dir).collect()
        ranks = {(r.left, r.right): r.rank for r in merges}
        _BPE_TRAINED[sf_dir] = ranks
    return ranks


@query("text_bpe_train")  # rows-only: iterative argmax loop, no SQL twin
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a BPE merge table FROM the corpus (Sennrich 2016) — the
    trained-vocabulary half of the tokenizer slot ``text_bpe_tokenize``
    documents.  Distribution split: the corpus-scale work is ONE
    word-count shuffle (partial-aggregated) + a TakeOrderedAndProject
    top-k; the merge-learning loop runs INSIDE one executor task
    (``mapInPandas`` over the single capped partition — the driver
    never materializes the word table), bounded by cap × avg word
    length, INDEPENDENT of corpus size (the standard trainer shape: HF
    tokenizers / SentencePiece also learn from a capped/sampled word
    table).  Deterministic: count ties break lexicographically.
    Fully lazy — the whole pipeline is one auditable plan (scan →
    partial agg → TOP → Arrow train task).  Output: (rank, left,
    right, merged) — loadable straight into ``bpe_encode_with``.  The
    pytest gate proves the incremental trainer identical to a naive
    full-recount reference and checks the learned table actually
    compresses the corpus it was trained on."""
    top = _top_word_counts(spark, sf_dir)
    return top.coalesce(1).mapInPandas(
        _train_iter, "rank long, left string, right string, merged string"
    )


@query("text_bpe_tokenize_trained")  # rows-only: merge loop, no SQL twin
def text_bpe_tokenize_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_bpe_tokenize`` with the CORPUS-TRAINED merge table — the
    documented drop-in made real: identical stage signature and output
    schema, only the broadcast rank table changes.  The pytest gate
    checks the trained table tokenizes the training corpus into no
    more subwords than the frozen English table (it learned this
    corpus's actual pair statistics) while every per-row bound
    (ws ≤ bpe ≤ chars) still holds."""
    ranks = _trained_ranks(spark, sf_dir)
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", "text").mapInPandas(
        _bpe_iter_with(ranks),
        "doc_id long, n_tokens_ws long, n_tokens_bpe long, bpe_per_word double",
    )


@query(
    "text_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    e AS (SELECT doc_id, unnest(toks) AS t FROM tok),
    b AS (
      SELECT doc_id,
             cast(('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS BIGINT)
               AS bucket
      FROM e
    )
    SELECT doc_id, bucket, count(*)::BIGINT AS cnt
    FROM b GROUP BY doc_id, bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF): tokens mapped to a fixed
    1024-bucket feature space by hashing — no vocabulary pass, no
    dictionary state, which is why it is THE bag-of-words featurizer
    at corpus scale (a vocabulary join needs a second pass and a
    broadcast that grows with the corpus; the hash needs neither, at
    the cost of collisions the downstream model absorbs).  The bucket
    is the first 8 hex chars of md5 mod 1024 — bit-portable across
    engines (Spark's own HashingTF uses murmur3, which DuckDB lacks;
    the CONTRACT is any fixed hash, so the oracle-checkable one is
    used).  Output is the sparse (doc, bucket, count) triple layout —
    exactly what a downstream trainer ingests.  Scale: explode +
    one partial-aggregated shuffle keyed (doc_id, bucket); map-side
    combine collapses repeats before the wire."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
    e = d.select("doc_id", F.explode(toks).alias("t"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long"), F.lit(1024)
    ).cast("long")
    return (
        e.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


@query(
    "text_vocab_growth_heaps",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               t -> t <> '')) AS t
      FROM documents
    ),
    bucketed AS (SELECT doc_id // 50 AS bucket, t FROM tok),
    first_seen AS (
      SELECT t, min(bucket) AS first_bucket FROM bucketed GROUP BY t
    ),
    per_bucket AS (
      SELECT bucket, count(*) AS n_tokens FROM bucketed GROUP BY bucket
    ),
    vocab_per_bucket AS (
      SELECT first_bucket AS bucket, count(*) AS n_new_types
      FROM first_seen GROUP BY first_bucket
    )
    SELECT p.bucket,
           cast(sum(p.n_tokens) OVER w AS BIGINT)                 AS tokens_cum,
           cast(sum(coalesce(v.n_new_types, 0)) OVER w AS BIGINT) AS vocab_cum,
           round(ln(sum(coalesce(v.n_new_types, 0)) OVER w)
                 / ln(sum(p.n_tokens) OVER w), 6)                 AS heaps_beta
    FROM per_bucket p LEFT JOIN vocab_per_bucket v USING (bucket)
    WINDOW w AS (ORDER BY p.bucket ROWS UNBOUNDED PRECEDING)
    """,
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct word
    types vs cumulative tokens at 50-doc checkpoints, plus the running
    Heaps exponent ln V / ln N (healthy natural-language corpora sit
    near β ≈ 0.5; duplicated or templated corpora flatten early — a
    corpus-level health check that complements per-doc dedup).  The
    cumulative-distinct problem is solved with the FIRST-SEEN trick
    (min bucket per type — one agg, no distinct-per-prefix rescans),
    so the plan is two partial aggs + a 10-row windowed rollup;
    checkpoint grain keeps the ordered window bounded regardless of
    corpus size."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
    tok = d.select(
        (F.col("doc_id") / 50).cast("long").alias("bucket"),
        F.explode(toks).alias("t"),
    )
    per_bucket = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    vocab = (
        tok.groupBy("t")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    j = per_bucket.join(vocab, "bucket", "left").select(
        "bucket",
        F.sum("n_tokens").over(w).alias("tc"),
        F.sum(F.coalesce("n_new_types", F.lit(0))).over(w).alias("vc"),
    )
    return j.select(
        "bucket",
        F.col("tc").cast("long").alias("tokens_cum"),
        F.col("vc").cast("long").alias("vocab_cum"),
        F.round(F.log("vc") / F.log("tc"), 6).alias("heaps_beta"),
    )


@query(
    "text_unicode_normalize",
    oracle="""
    WITH aug AS (
      SELECT lang,
             text || 'e' || chr(769)                  AS raw,
             nfc_normalize(text || 'e' || chr(769))   AS nfc,
             nfc_normalize(text) = text               AS raw_is_nfc
      FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           count(*)                                          AS n_docs,
           cast(sum(CASE WHEN length(raw) > length(nfc)
                    THEN 1 ELSE 0 END) AS BIGINT)            AS n_composed,
           cast(sum(length(raw) - length(nfc)) AS BIGINT)    AS sum_len_delta,
           cast(sum(CASE WHEN raw_is_nfc THEN 1 ELSE 0 END) AS BIGINT) AS raw_already_nfc
    FROM aug GROUP BY lang
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization over the corpus — the canonicalization
    step every multilingual training pipeline runs before dedup (the
    same logical text can arrive precomposed U+00E9 or decomposed
    e+U+0301 and must hash identically).  Spark has no NFC builtin, so
    this is the designated Arrow-batched slow path: a vectorized
    pandas UDF over ``unicodedata.normalize`` (utf8proc and Python both
    implement UAX #15, so the oracle's ``nfc_normalize`` agrees
    exactly).  The fixtures are ASCII (already NFC), so the query
    appends a decomposed ``e`` + COMBINING ACUTE (U+0301) to every doc
    to force real composition work — each doc shrinks by exactly one
    code point under NFC, giving the differential a non-trivial
    signal.  Plan: scan → Arrow batch UDF → partial+final agg on lang;
    the UDF is length-preserving-ish string work, linear in corpus
    bytes, no shuffle before the final tiny agg."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t))

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    aug = d.select(
        "lang",
        F.concat(F.col("text"), F.lit("e\u0301")).alias("raw"),
        (nfc(F.col("text")) == F.col("text")).alias("raw_is_nfc"),
    ).withColumn("nfc", nfc(F.col("raw")))
    return aug.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.length("raw") > F.length("nfc"), 1).otherwise(0)
        ).alias("n_composed"),
        F.sum(F.length("raw") - F.length("nfc")).cast("long").alias("sum_len_delta"),
        F.sum(F.when(F.col("raw_is_nfc"), 1).otherwise(0)).alias("raw_already_nfc"),
    )


#: Code-detection thresholds (per-mille of characters / lines).
_CODE_SYMBOL_MILLE = 30   # >= 3.0% code-ish symbol chars
_CODE_INDENT_MILLE = 200  # >= 20% of lines start indented


@query(
    "text_code_detect",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text,
                 '[{{}}()\\[\\];=<>_]', '', 'g'))              AS n_sym,
             len(string_split(text, chr(10)))                  AS n_lines,
             len(list_filter(string_split(text, chr(10)),
                 x -> x LIKE ' %' OR x LIKE chr(9) || '%'))    AS n_indent
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, lang,
           cast(n_sym AS BIGINT)                         AS n_sym,
           cast(n_lines AS BIGINT)                       AS n_lines,
           cast(n_indent AS BIGINT)                      AS n_indent,
           (1000 * n_sym >= {_CODE_SYMBOL_MILLE} * n_chars
            OR 1000 * n_indent >= {_CODE_INDENT_MILLE} * n_lines)
             AS looks_like_code
    FROM feats
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection from cheap structural features — the
    pretraining-corpus router that decides whether a document goes to
    the code pipeline (different dedup, different quality gates) or
    the text one: code-ish symbol density ({{}}()[];=<>_) and the
    indented-line ratio, thresholded.  Both features and both
    thresholds are EXACT INTEGER comparisons in per-mille space
    (1000·count >= threshold·total — the multiply-out rule; no
    division, no float anywhere).  Plan: pure codegen regexp/split
    projections, no shuffle — map-linear in corpus bytes like every
    text_* scorer."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_sym = F.length("text") - F.length(
        F.regexp_replace("text", r"[{}()\[\];=<>_]", "")
    )
    lines = F.split(F.col("text"), "\n", -1)
    n_lines = F.size(lines)
    n_indent = F.size(
        F.filter(
            lines,
            lambda x: x.startswith(" ") | x.startswith("\t"),
        )
    )
    feats = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        n_sym.cast("long").alias("n_sym"),
        n_lines.cast("long").alias("n_lines"),
        n_indent.cast("long").alias("n_indent"),
    )
    return feats.select(
        "doc_id",
        "lang",
        "n_sym",
        "n_lines",
        "n_indent",
        (
            (1000 * F.col("n_sym") >= _CODE_SYMBOL_MILLE * F.col("n_chars"))
            | (1000 * F.col("n_indent") >= _CODE_INDENT_MILLE * F.col("n_lines"))
        ).alias("looks_like_code"),
    )


#: Burstiness report depth (top terms by corpus frequency).
_BURST_TOPK = 20


@query(
    "text_term_burstiness",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    per_doc AS (
      SELECT term, doc_id, count(*) AS c FROM toks GROUP BY term, doc_id
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    stats AS (
      SELECT term,
             count(*)                         AS df,
             sum(c)                           AS cf,
             sum(cast(c AS HUGEINT) * c)      AS sum_c2
      FROM per_doc GROUP BY term
    ),
    top AS (
      SELECT s.*, n.n_docs,
             row_number() OVER (ORDER BY cf DESC, term ASC) AS rn
      FROM stats s CROSS JOIN n
    )
    SELECT term,
           cast(df AS BIGINT)  AS df,
           cast(cf AS BIGINT)  AS cf,
           cast(rn AS BIGINT)  AS rn,
           cast((1000000 * (n_docs * sum_c2 - cast(cf AS HUGEINT) * cf))
                // (cast(n_docs AS HUGEINT) * cf) AS BIGINT) AS vmr_micro
    FROM top WHERE rn <= {_BURST_TOPK}
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness for the top-{_BURST_TOPK} corpus terms: the
    variance-to-mean ratio (VMR) of per-document counts over ALL
    documents — the corpus-linguistics dispersion statistic that
    separates topical terms (bursty, VMR ≫ 1: absent mostly, heavy
    where present) from function words (VMR ≈ 1, Poisson-like), which
    is why df/cf ratios alone mis-rank stopwords for TF-IDF-style
    weighting (text_tfidf_top_terms gets the complementary view).
    VMR = (N·Σc² − cf²)/(N·cf) is emitted in exact integer micro-units
    via integer floor-division — cf values hit power-of-ten shapes
    where round() ties split engines (the portability ladder rule 3).
    Plan: tokenize-explode → (term, doc) partial agg → term agg —
    the standard two-shuffle term-statistics shape, linear in corpus
    tokens; top-k is a TakeOrdered."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    n_docs = d.count()
    stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("cf"),
        F.sum(F.col("c").cast("decimal(20,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("sum_c2"),
    )
    from pyspark.sql.window import Window

    # Take the top-k FIRST (TakeOrderedAndProject: per-partition top-k,
    # one tiny merge task), then rank within the k-row frame — the old
    # row_number-then-filter form funneled the Heaps-unbounded vocab
    # through ONE window task (the class verify_round now gates).
    top = stats.orderBy(F.col("cf").desc(), F.col("term").asc()).limit(
        _BURST_TOPK
    )
    # bounded: window ranks the <= _BURST_TOPK limit output only
    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    top = top.withColumn("rn", F.row_number().over(w))
    top = top.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
        F.col("rn").cast("long").alias("rn"),
        (F.lit(n_docs).cast("decimal(38,0)") * F.col("sum_c2")
         - F.col("cf").cast("decimal(38,0)") * F.col("cf")).alias("num"),
        (F.lit(n_docs).cast("decimal(38,0)") * F.col("cf")).alias("den"),
    )
    return top.select(
        "term",
        "df",
        "cf",
        "rn",
        F.expr("cast((1000000 * num) div den as bigint)").alias("vmr_micro"),
    )


#: Vocabulary-size checkpoints for the coverage curve.
_VOCAB_CHECKPOINTS = (100, 1000, 10000)


@query(
    "text_vocab_coverage_curve",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS rk,
             sum(n) OVER () AS total
      FROM tf
    ),
    cum AS (
      SELECT rk, total,
             sum(n) OVER (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cum_n
      FROM ranked
    ),
    cp AS (SELECT cast(unnest([{', '.join(str(c) for c in _VOCAB_CHECKPOINTS)}])
                  AS BIGINT) AS vocab_size)
    SELECT cp.vocab_size,
           cast(max(CASE WHEN cum.rk <= cp.vocab_size
                         THEN cum.cum_n END) AS BIGINT) AS covered_tokens,
           cast(max(cum.total) AS BIGINT)               AS total_tokens,
           cast((1000 * max(CASE WHEN cum.rk <= cp.vocab_size
                                 THEN cum.cum_n END))
                // max(cum.total) AS BIGINT)            AS coverage_mille
    FROM cp CROSS JOIN cum
    GROUP BY cp.vocab_size
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens
    the top-N most frequent terms cover, at N = 100 / 1k / 10k — THE
    design curve for tokenizer vocabulary sizing (where the curve
    flattens is where a bigger vocab stops paying for its embedding
    rows; text_vocab_growth_heaps measures the dual — how vocab grows
    with corpus).  Coverage is emitted in exact integer per-mille via
    floor division (the multiply-out rule; token totals hit clean
    power shapes).  Plan: token explode → term partial agg →
    ``orderBy(n desc, term).limit(max_checkpoint)`` compiles to
    TakeOrderedAndProject (per-partition top-k merged on one tiny
    task) BEFORE any window runs, so the rank + cumulative sum only
    ever see ≤ max(_VOCAB_CHECKPOINTS) rows — at 100 TB the term
    vocabulary is Heaps-law-huge and an unlimited rank would drag
    billions of distinct terms through one window task.  The corpus
    token total is a separate 1-row aggregate broadcast-crossJoined
    back (not a full-frame window over the vocab)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    # Coverage only probes rk <= max checkpoint, so take the top-k terms
    # FIRST (TakeOrderedAndProject: per-partition top-k, one tiny merge
    # task) and rank/cumsum within those <=10k rows only.  The corpus
    # token total must still count EVERY term, so it is a 1-row
    # aggregate joined back — never a full-frame window over the vocab.
    top = tf.orderBy(F.col("n").desc(), F.col("term").asc()).limit(
        max(_VOCAB_CHECKPOINTS)
    )
    total = tf.agg(F.sum("n").alias("total"))
    # bounded: windows rank/cumsum the <=max-checkpoint limit output only
    wr = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    ranked = top.select("n", F.row_number().over(wr).alias("rk"))
    wc = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select(
        "rk", F.sum("n").over(wc).alias("cum_n")
    ).crossJoin(F.broadcast(total))
    cp = spark.createDataFrame(
        [(c,) for c in _VOCAB_CHECKPOINTS], "vocab_size long"
    )
    j = F.broadcast(cp).crossJoin(cum)
    agg = j.groupBy("vocab_size").agg(
        F.max(
            F.when(F.col("rk") <= F.col("vocab_size"), F.col("cum_n"))
        ).alias("covered"),
        F.max("total").alias("total"),
    )
    return agg.select(
        "vocab_size",
        F.col("covered").cast("long").alias("covered_tokens"),
        F.col("total").cast("long").alias("total_tokens"),
        F.expr("cast((1000 * covered) div total as bigint)").alias(
            "coverage_mille"
        ),
    )


@query(
    "text_js_divergence_sources",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    sc AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
    corp AS (SELECT term, sum(c) AS cc FROM sc GROUP BY term),
    vocab AS (SELECT count(*) AS v, sum(cc) AS nn FROM corp),
    srcn AS (SELECT source, sum(c) AS ns FROM sc GROUP BY source),
    spine AS (
      SELECT s.source, t.term, t.cc, s2.ns, v.v, v.nn,
             coalesce(sc.c, 0) AS c
      FROM (SELECT DISTINCT source FROM sc) s
      CROSS JOIN corp t
      CROSS JOIN vocab v
      JOIN srcn s2 ON s.source = s2.source
      LEFT JOIN sc ON sc.source = s.source AND sc.term = t.term
    ),
    probs AS (
      SELECT source,
             (c + 0.5)  / (ns + v / 2.0) AS p,
             (cc + 0.5) / (nn + v / 2.0) AS q
      FROM spine
    ),
    js AS (
      SELECT source,
             round(sum(0.5 * p * log2(p / ((p + q) / 2))
                       + 0.5 * q * log2(q / ((p + q) / 2))), 6) AS js_bits
      FROM probs GROUP BY source
    )
    SELECT source, js_bits,
           cast(row_number() OVER (ORDER BY js_bits DESC, source)
                AS BIGINT) AS divergence_rank
    FROM js
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence (bits) between each source's term
    distribution and the corpus-wide one — the distribution-shift
    score mixture design runs before reweighting sources
    (pipeline_mix_weights decides proportions; THIS says which sources
    are actually off-distribution, symmetric and bounded unlike raw
    KL).  Add-half smoothing on a materialized vocab×source spine
    keeps every probability positive (JS of absent terms stays
    finite); the log-laden sum rounds safely at 6.  Plan: token
    explode → (source, term) partial agg, then every downstream stage
    lives in vocab×|sources| space — corpus size only touches the
    first agg; the spine join keys on term with the 20-row source
    side broadcast."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    sc = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    sc = sc.persist()
    corp = sc.groupBy("term").agg(F.sum("c").alias("cc"))
    vocab = corp.agg(
        F.count(F.lit(1)).alias("v"), F.sum("cc").alias("nn")
    )
    srcn = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    sources = sc.select("source").distinct()
    spine = (
        corp.crossJoin(F.broadcast(sources))
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(srcn), "source")
        .join(sc, ["source", "term"], "left")
        .select(
            "source",
            "cc",
            "ns",
            "v",
            "nn",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    p = (F.col("c") + 0.5) / (F.col("ns") + F.col("v") / 2.0)
    q = (F.col("cc") + 0.5) / (F.col("nn") + F.col("v") / 2.0)
    m = (p + q) / 2
    js = spine.groupBy("source").agg(
        F.round(
            F.sum(0.5 * p * F.log2(p / m) + 0.5 * q * F.log2(q / m)), 6
        ).alias("js_bits")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("js_bits").desc(), F.col("source"))
    return js.select(
        "source",
        "js_bits",
        F.row_number().over(w).cast("long").alias("divergence_rank"),
    )


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS ({_lang_pred_sql()}),
    cells AS (
      SELECT lang_label, lang_pred, count(*) AS n
      FROM pred GROUP BY 1, 2
    ),
    truth AS (SELECT lang_label, sum(n) AS n_true FROM cells GROUP BY 1),
    hyp AS (SELECT lang_pred, sum(n) AS n_pred FROM cells GROUP BY 1)
    SELECT c.lang_label, c.lang_pred,
           cast(c.n AS BIGINT) AS n,
           cast((1000000 * c.n) // t.n_true AS BIGINT) AS recall_micro,
           cast((1000000 * c.n) // h.n_pred AS BIGINT) AS precision_micro
    FROM cells c
    JOIN truth t ON c.lang_label = t.lang_label
    JOIN hyp h   ON c.lang_pred = h.lang_pred
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a first-class operator: the confusion
    matrix of the stopword-marker language identifier
    (``text_lang_id``) against the corpus's ground-truth labels, with
    per-cell recall (share of the TRUE class) and precision (share of
    the PREDICTED class) — the eval loop every heuristic/model filter
    in a training pipeline needs before its output is trusted, run
    entirely inside the engine (no collect, no sklearn).  Diagonal
    cells carry the per-class recall/precision; off-diagonal cells
    name the confusion pairs.  Rates ride exact integer micro-units
    via floor division (the share rule).  Plan: the lang_id scoring
    scan (codegen marker counts) feeds one |langs|²-bounded cell agg;
    margins join broadcast."""
    pred = text_lang_id(spark, sf_dir).select("lang_label", "lang_pred")
    cells = pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    cells = cells.persist()
    truth = cells.groupBy("lang_label").agg(F.sum("n").alias("n_true"))
    hyp = cells.groupBy("lang_pred").agg(F.sum("n").alias("n_pred"))
    return (
        cells.join(F.broadcast(truth), "lang_label")
        .join(F.broadcast(hyp), "lang_pred")
        .select(
            "lang_label",
            "lang_pred",
            F.col("n").cast("long").alias("n"),
            F.expr("cast((1000000 * n) div n_true as bigint)").alias(
                "recall_micro"
            ),
            F.expr("cast((1000000 * n) div n_pred as bigint)").alias(
                "precision_micro"
            ),
        )
    )


#: RAKE stopword delimiters (the fixture vocabulary's function words)
#: and report depth.
_RAKE_STOPS = ("a", "the")
_RAKE_TOPK = 20


@query(
    "text_keyword_rake",
    oracle=f"""
    WITH padded AS (
      SELECT ' ' || replace(lower(text), ' ', '  ') || ' ' AS t
      FROM documents WHERE length(text) > 0
    ),
    cut AS (
      SELECT regexp_replace(t, ' ({'|'.join(_RAKE_STOPS)}) ', '|', 'g') AS t
      FROM padded
    ),
    phrases AS (
      SELECT row_number() OVER () AS occ_id,
             trim(replace(p, '  ', ' ')) AS phrase
      FROM cut, unnest(string_split(t, '|')) AS u(p)
      WHERE trim(replace(p, '  ', ' ')) <> ''
    ),
    pw AS (
      SELECT occ_id, phrase,
             len(string_split(phrase, ' ')) AS plen,
             unnest(string_split(phrase, ' ')) AS w
      FROM phrases
    ),
    ws AS (
      SELECT w,
             count(*)  AS freq,
             sum(plen) AS deg
      FROM pw GROUP BY w
    ),
    wscore AS (SELECT w, (1000000 * deg) // freq AS score_micro FROM ws),
    pscore AS (
      SELECT pw.phrase,
             sum(wscore.score_micro) AS occ_score
      FROM pw JOIN wscore ON pw.w = wscore.w
      GROUP BY pw.phrase, pw.occ_id
    ),
    agg AS (
      SELECT phrase,
             cast(count(*) AS BIGINT) AS n_occurrences,
             cast(max(occ_score) AS BIGINT) AS score_micro
      FROM pscore GROUP BY phrase
    )
    SELECT phrase, n_occurrences, score_micro,
           cast(row_number() OVER (ORDER BY score_micro DESC, phrase)
                AS BIGINT) AS rn
    FROM agg
    ORDER BY rn LIMIT {_RAKE_TOPK}
    """,
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents") — the classic unsupervised
    keyphrase miner: split text into candidate phrases at stopword
    delimiters, score each word by degree/frequency (degree = summed
    length of the phrases it occurs in — words that travel in long
    phrases beat loners), and score a phrase as the sum of its word
    scores.  Scores are exact integer micro-units via per-word floor
    division BEFORE the phrase sum (the portability ladder: one
    deterministic rounding point, identical in both engines), and the
    phrase split uses the double-space trick — pad every space, then
    every ' stopword ' owns its delimiters even when stopwords run
    consecutively — so Spark and DuckDB carve byte-identical phrases
    with one regexp_replace each.  Plan: two scan-linear explodes
    (phrase, word) into a word-stat partial agg, a co-partitioned
    word-keyed shuffle join back (the word-score table is
    Heaps-unbounded, so no forced broadcast — AQE may still pick one
    when the vocab fits at runtime), a phrase agg, and a
    ``orderBy().limit({_RAKE_TOPK})`` TakeOrderedAndProject BEFORE the
    rank window (the vocab-coverage discipline: the distinct-phrase
    domain is Heaps-huge at 100 TB; the window must only ever see
    {_RAKE_TOPK} rows)."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    stops = "|".join(_RAKE_STOPS)
    cut = d.select(
        F.regexp_replace(
            F.concat(
                F.lit(" "),
                F.replace(F.lower("text"), F.lit(" "), F.lit("  ")),
                F.lit(" "),
            ),
            f" ({stops}) ",
            "|",
        ).alias("t")
    )
    phrases = (
        cut.select(F.explode(F.split("t", r"\|")).alias("p"))
        .select(
            F.trim(F.replace(F.col("p"), F.lit("  "), F.lit(" "))).alias(
                "phrase"
            )
        )
        .filter(F.col("phrase") != "")
    )
    # one row per phrase OCCURRENCE (id tags each occurrence so a
    # repeated word inside one phrase counts per instance, per RAKE)
    occ = phrases.select(
        F.monotonically_increasing_id().alias("occ_id"), "phrase"
    )
    pw = occ.select(
        "occ_id",
        "phrase",
        F.size(F.split("phrase", " ")).alias("plen"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    ws = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    wscore = ws.select(
        "w", F.expr("(1000000 * deg) div freq").alias("score_micro")
    )
    pscore = (
        # no broadcast hint: wscore has one row per distinct corpus
        # word (Heaps-unbounded); pw and wscore are both word-keyed, so
        # the shuffle join is co-partitioned — AQE can still choose a
        # broadcast at runtime when the vocab actually fits.
        pw.join(wscore, "w")
        .groupBy("occ_id", "phrase")
        .agg(F.sum("score_micro").alias("occ_score"))
    )
    agg = pscore.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("occ_score").cast("long").alias("score_micro"),
    )
    top = agg.orderBy(F.col("score_micro").desc(), F.col("phrase")).limit(
        _RAKE_TOPK
    )
    from pyspark.sql.window import Window as _W

    wr = _W.orderBy(F.col("score_micro").desc(), F.col("phrase"))
    return top.select(
        "phrase",
        "n_occurrences",
        "score_micro",
        F.row_number().over(wr).cast("long").alias("rn"),
    )



@query(
    "text_dedup_line_level",
    oracle="""
    WITH lines AS (
      SELECT doc_id, trim(l) AS line
      FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
            FROM documents)
      WHERE trim(l) <> ''
    ),
    freq AS (
      SELECT line, count(DISTINCT doc_id) AS n_docs
      FROM lines GROUP BY line
    )
    SELECT l.doc_id,
           cast(count(*) AS BIGINT) AS n_lines,
           cast(sum(CASE WHEN f.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           cast((1000000 * sum(CASE WHEN f.n_docs >= 3 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS boilerplate_ppm
    FROM lines l JOIN freq f ON f.line = l.line
    GROUP BY l.doc_id
    """,
)
def text_dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level LINE dedup audit — the C4 rule (Raffel et al. 2020:
    discard any line occurring more than once in the corpus; the
    single most effective boilerplate filter in the C4 ablations) in
    its audit form: a trimmed non-empty line appearing in ≥3 distinct
    documents is boilerplate (nav bars, cookie banners, licence
    footers), and each document reports its line count, boilerplate
    line count, and exact-ppm boilerplate rate — the per-doc removal
    plan the curation pass executes.  Sits between
    text_dup_line_fraction (WITHIN-doc repetition) and
    dedup_repeated_passages (5-token passages): the unit here is the
    whole line, corpus-wide.  Plan: one explode → line-keyed distinct
    agg (Heaps-bounded like any text key — NO broadcast hint, the
    round-10 gate's rule: the join back is line-keyed on both sides,
    co-partitioned) → per-doc agg.  All counts exact integers."""
    d = table(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        F.explode(F.split("text", "\n")).alias("l"),
    ).select("doc_id", F.trim("l").alias("line")).filter(F.col("line") != "")
    freq = lines.groupBy("line").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        lines.join(freq, "line")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("n_docs") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_boilerplate",
            F.expr("(1000000 * n_boilerplate) div n_lines").alias(
                "boilerplate_ppm"
            ),
        )
    )


@query(
    "text_rouge2_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    bi AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(t)),
                                          i -> t[i] || ' ' || t[i + 1]))
               AS bg
      FROM toks
    ),
    pairs AS (
      SELECT c.doc_id AS cand_id, r.doc_id AS ref_id, c.lang,
             len(c.bg)::BIGINT AS n_cand_bigrams,
             len(r.bg)::BIGINT AS n_ref_bigrams,
             len(list_intersect(c.bg, r.bg))::BIGINT AS n_overlap
      FROM bi c JOIN bi r
        ON r.doc_id = c.doc_id + 1 AND r.lang = c.lang
    )
    SELECT cand_id, ref_id, lang,
           n_cand_bigrams, n_ref_bigrams, n_overlap,
           n_overlap * 1000000 // n_ref_bigrams  AS rouge2_recall_ppm,
           n_overlap * 1000000 // n_cand_bigrams AS rouge2_precision_ppm,
           2 * n_overlap * 1000000
             // (n_cand_bigrams + n_ref_bigrams) AS dice_ppm
    FROM pairs
    WHERE n_ref_bigrams > 0 AND n_cand_bigrams > 0
    """,
)
def text_rouge2_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 overlap between candidate/reference document pairs —
    the n-gram eval primitive an LLM data pipeline runs at scale
    (summarization eval, paraphrase mining, train/eval leakage triage
    beyond exact decontamination): distinct-bigram recall, precision,
    and Dice (the set-F1) in exact integer ppm.  The pair table is
    each doc joined to its doc_id+1 successor WITHIN the same lang —
    an equi-join on the id key, NOT a lang-partitioned window (5
    partitions of corpus/5 rows each would serialize the corpus
    through 5 tasks at 100 TB; the id join shuffles on a high-card
    key).  In production the pair table arrives as (cand, ref) ids
    and this query's shape is unchanged: tokenize map-side, build the
    distinct-bigram set per doc once (array, not exploded rows — a
    doc's bigram set rides as one value through the single pair
    shuffle), intersect per pair with array_intersect.  Zero-bigram
    docs (len < 2 tokens) are filtered on BOTH sides of both engines
    (the ppm divisors).  Scale: linear scan + one id-keyed join;
    per-row cost bounded by document length; no window, no all-pairs
    blow-up (pairing is 1:1 by construction)."""
    from .dedup import materialized

    d = table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')")
    # materialized: the bigram-set table feeds BOTH join branches, and
    # without the barrier Catalyst pushes the ppm-divisor filters below
    # the projection, re-inlining tokenize+bigrams ~4x per row into the
    # scan filter (measured 11s -> 2s at sf0.1) — the LSH signature-
    # table discipline
    bi = materialized(d.select("doc_id", "lang", toks.alias("t")).select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.expr(
                "case when size(t) >= 2 then "
                "transform(sequence(0, size(t) - 2), "
                "i -> concat(t[i], ' ', t[i + 1])) "
                "else cast(array() as array<string>) end"
            )
        ).alias("bg"),
    ))
    cand = bi.select(
        F.col("doc_id").alias("cand_id"),
        F.col("lang"),
        F.col("bg").alias("cbg"),
    )
    ref = bi.select(
        F.col("doc_id").alias("ref_id"),
        F.col("lang").alias("r_lang"),
        F.col("bg").alias("rbg"),
    )
    pairs = cand.join(
        ref,
        (F.col("ref_id") == F.col("cand_id") + 1)
        & (F.col("r_lang") == F.col("lang")),
    ).select(
        "cand_id",
        "ref_id",
        "lang",
        F.size("cbg").cast("long").alias("n_cand_bigrams"),
        F.size("rbg").cast("long").alias("n_ref_bigrams"),
        F.size(F.array_intersect("cbg", "rbg")).cast("long").alias("n_overlap"),
    )
    return pairs.filter(
        (F.col("n_ref_bigrams") > 0) & (F.col("n_cand_bigrams") > 0)
    ).select(
        "cand_id",
        "ref_id",
        "lang",
        "n_cand_bigrams",
        "n_ref_bigrams",
        "n_overlap",
        F.expr("n_overlap * 1000000 div n_ref_bigrams").alias(
            "rouge2_recall_ppm"
        ),
        F.expr("n_overlap * 1000000 div n_cand_bigrams").alias(
            "rouge2_precision_ppm"
        ),
        F.expr(
            "2 * n_overlap * 1000000 div (n_cand_bigrams + n_ref_bigrams)"
        ).alias("dice_ppm"),
    )
