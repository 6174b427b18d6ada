"""Scalar function surface: string / date / math / array / map / json.

Each query exercises a function family in a projection, mirroring the
scalar work the reference does imperatively in Go:

- ``fn_string``  — A2's ``"user-" + uuid`` concat (``internal/generator/generator.go:21-23``)
- ``fn_date``    — A10's μs→timestamp + ``"yyyy-MM-dd HH:mm:ss"`` formatting
  (``internal/ingestion/cdc.go:106-109``, ``clickhouse.go:77,84,112``)
- ``fn_map``     — A9's op→enum map (``internal/ingestion/cdc.go:145-156``)
- ``fn_json``    — A4's JSON decode (``internal/ingestion/cdc.go:87-98``)

All of these are built-in JVM expressions inside whole-stage codegen —
no Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           'user-' || lower(c_name)                     AS user_tag,
           upper(c_mktsegment)                          AS seg_upper,
           substring(c_name, 10, 9)                     AS cust_num,
           trim('  ' || c_name || ' ')                  AS trimmed,
           (c_name LIKE '%7%')                          AS has_seven,
           regexp_extract(c_name, '([0-9]+)', 1)        AS digits,
           string_split(c_name, '#')[1]                 AS name_prefix,
           length(c_name)::BIGINT                       AS name_len
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: concat (A2's user-id shape), case mapping,
    substring, trim, LIKE, regexp_extract, split, length."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.lit("user-"), F.lower("c_name")).alias("user_tag"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.col("c_name").like("%7%").alias("has_seven"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.element_at(F.split("c_name", "#"), 1).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')  AS order_ts_s,
           year(o_orderdate)::BIGINT                   AS yr,
           month(o_orderdate)::BIGINT                  AS mon,
           day(o_orderdate)::BIGINT                    AS dom,
           date_trunc('month', o_orderdate)            AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)::BIGINT AS days_since,
           o_orderdate + INTERVAL 30 DAY               AS due_date,
           epoch_ms(o_orderdate)::BIGINT               AS epoch_ms
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions.  ``order_ts_s`` is exactly the reference's
    sink wire format: UTC ``"yyyy-MM-dd HH:mm:ss"``, second precision
    (A10, ``internal/ingestion/clickhouse.go:77,84,112``)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts_s"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        # o_orderdate is TIMESTAMP_NTZ from parquet; in a UTC session the
        # NTZ->LTZ cast is the identity instant, so unix_millis is exact.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).cast("long").alias("epoch_ms"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           cast(round(cast(l_extendedprice AS DECIMAL(12,2))
                      * (1 - cast(l_discount AS DECIMAL(4,2)))
                      * (1 + cast(l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS charge,
           round(l_quantity / 7.0, 2)       AS qty_sevenths,
           floor(l_extendedprice)::BIGINT   AS price_floor,
           ceil(l_extendedprice)::BIGINT    AS price_ceil,
           round(abs(l_discount - 0.05), 6) AS disc_dev,
           round(power(l_quantity, 2), 2)   AS qty_sq,
           round(sqrt(l_extendedprice), 6)  AS price_sqrt,
           (l_orderkey % 7)::BIGINT         AS key_mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions incl. the TPC-H charge expression
    price*(1-disc)*(1+tax)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Exact decimal product: the 6-decimal charge value hits .005
        # round-ties that double arithmetic resolves differently per engine.
        F.expr(
            "cast(round(cast(l_extendedprice as decimal(12,2))"
            " * (1 - cast(l_discount as decimal(4,2)))"
            " * (1 + cast(l_tax as decimal(4,2))), 2) as double)"
        ).alias("charge"),
        F.round(F.col("l_quantity") / 7.0, 2).alias("qty_sevenths"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)::BIGINT            AS dim,
           embedding[1]                      AS first_val,
           list_max(embedding)               AS max_val,
           list_sort(embedding)[1]           AS small1,
           list_sort(embedding)[2]           AS small2,
           list_sort(embedding)[3]           AS small3,
           list_contains(embedding, embedding[1]) AS has_first
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column (size, index access,
    max, sort+slice, contains).

    The sorted-slice result is projected as three scalar columns rather
    than a raw ``array<double>`` — array cells are unhashable in the
    order-insensitive value-hash comparison, so arrays stay inside the
    plan and scalars cross the query boundary."""
    e = table(spark, sf_dir, "embeddings")
    sorted3 = F.slice(F.sort_array("embedding"), 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.array_max("embedding").alias("max_val"),
        F.element_at(sorted3, 1).alias("small1"),
        F.element_at(sorted3, 2).alias("small2"),
        F.element_at(sorted3, 3).alias("small3"),
        F.array_contains("embedding", F.element_at("embedding", 1)).alias("has_first"),
    )


@query(
    "fn_array_explode",
    oracle="""
    SELECT vec_id, unnest(embedding) AS val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest of an array column (UDTF-shaped lateral view)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.explode("embedding").alias("val"))


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           (CASE lower(event_type)
              WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
              WHEN 'signup' THEN 4 WHEN 'error' THEN 5 ELSE 0 END)::BIGINT AS type_code
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map literal + element_at — the reference's op→enum scalar map
    (A9, ``internal/ingestion/cdc.go:145-156``) as a map lookup with a
    coalesced 0 default.  Oracle uses the equivalent CASE form."""
    ev = table(spark, sf_dir, "events")
    codes = F.create_map(
        F.lit("click"), F.lit(1),
        F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(3),
        F.lit("signup"), F.lit(4),
        F.lit("error"), F.lit(5),
    )
    return ev.select(
        "event_id",
        F.coalesce(F.element_at(codes, F.lower("event_type")), F.lit(0))
        .cast("long")
        .alias("type_code"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::BIGINT      AS k_val,
           json_extract_string(props, '$.k')       AS k_str,
           json_valid(props)                       AS is_valid
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the stringly-typed ``events.props`` column —
    the batch face of A4's JSON decode (``internal/ingestion/cdc.go:87-98``):
    ``from_json`` for the typed path, ``get_json_object`` for ad-hoc
    extraction."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k long").getField("k").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k long").isNotNull().alias("is_valid"),
    )


@query(
    "fn_string2",
    oracle="""
    SELECT c_custkey,
           lpad(cast(c_custkey AS VARCHAR), 10, '0')        AS key_padded,
           rpad(c_mktsegment, 12, '.')                      AS seg_padded,
           translate(c_name, '#0', '-O')                    AS translated,
           replace(c_name, 'Customer', 'Cust')              AS replaced,
           reverse(c_mktsegment)                            AS seg_rev,
           repeat('=', (c_custkey % 4)::INT)                AS bar,
           levenshtein(c_mktsegment, 'BUILDING')::BIGINT    AS seg_dist,
           instr(c_name, '#')::BIGINT                       AS hash_pos,
           left(c_name, 8)                                  AS name_l8,
           right(c_name, 3)                                 AS name_r3,
           ascii(c_mktsegment)::BIGINT                      AS seg_ascii,
           starts_with(c_mktsegment, 'B')                   AS is_b,
           contains(c_name, '42')                           AS has_42
    FROM customer
    """,
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: padding, translate/replace, reverse,
    repeat, edit distance, position, left/right slices, ascii,
    prefix/containment predicates.  All JVM codegen expressions."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.translate("c_name", "#0", "-O").alias("translated"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.lit("="), (F.col("c_custkey") % 4).cast("int")).alias("bar"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias("seg_dist"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.expr("left(c_name, 8)").alias("name_l8"),
        F.expr("right(c_name, 3)").alias("name_r3"),
        F.ascii("c_mktsegment").cast("long").alias("seg_ascii"),
        F.col("c_mktsegment").startswith("B").alias("is_b"),
        F.col("c_name").contains("42").alias("has_42"),
    )


@query(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 45 DAY                 AS due_45d,
           o_orderdate + INTERVAL 3 MONTH                AS plus_3m,
           last_day(o_orderdate::DATE)::TIMESTAMP        AS month_end,
           quarter(o_orderdate)::BIGINT                  AS qtr,
           weekofyear(o_orderdate)::BIGINT               AS iso_week,
           (dayofweek(o_orderdate) + 1)::BIGINT          AS dow_sun1,
           dayofyear(o_orderdate)::BIGINT                AS doy,
           date_trunc('week', o_orderdate)               AS week_start,
           date_diff('day', o_orderdate,
                     TIMESTAMP '2000-01-01')::BIGINT     AS days_to_y2k,
           make_date(year(o_orderdate)::INT,
                     month(o_orderdate)::INT, 1)::TIMESTAMP AS month_first
    FROM orders
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval / calendar arithmetic: day+month interval adds,
    last_day, quarter, ISO week, day-of-week (aligned to Spark's
    Sunday=1 by shifting DuckDB's Sunday=0), day-of-year, week trunc
    (both engines truncate to Monday), date difference, make_date."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias("due_45d"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_sun1"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1))
        .cast("timestamp")
        .alias("month_first"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0)                          AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0)          AS disc_defaulted,
           greatest(l_quantity, l_discount * 100)           AS biggest,
           least(l_tax, l_discount)                         AS smallest,
           if(l_quantity > 25, 'bulk', 'small')             AS size_class,
           CASE WHEN l_returnflag = 'R' THEN l_extendedprice
                ELSE 0.0 END                                AS returned_price
    FROM lineitem
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar functions: nullif, coalesce-with-default
    (the NVL/IFNULL shape), greatest/least, if(), CASE — the reference's
    null-default coalescing (A7) expressed through every conditional
    primitive."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_defaulted"
        ),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("biggest"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("smallest"),
        F.when(F.col("l_quantity") > 25, "bulk").otherwise("small").alias("size_class"),
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
        .otherwise(0.0)
        .alias("returned_price"),
    )


@query(
    "fn_sequence",
    oracle="""
    SELECT n_nationkey, unnest(range(1, (n_nationkey % 5) + 2))::BIGINT AS i
    FROM nation
    """,
)
def fn_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence generation + lateral explode: each nation fans out to
    1..(key%5)+1 rows.  Spark ``sequence(1, n)`` is inclusive =
    DuckDB ``range(1, n+1)`` exclusive-stop."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.explode(F.sequence(F.lit(1), (F.col("n_nationkey") % 5) + 1)).alias("i"),
    ).select("n_nationkey", F.col("i").cast("long").alias("i"))


@query(
    "fn_array_posexplode",
    oracle="""
    SELECT vec_id,
           (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
           unnest(embedding) AS val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def fn_array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: unnest WITH position (0-based, Spark's convention;
    DuckDB's 1-based generate_subscripts shifted to match)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id", F.col("pos").cast("long").alias("pos"), "val"
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT e_id,
           xor(e_id, 255::BIGINT)      AS xored,
           (e_id << 3)                 AS shl,
           (e_id >> 2)                 AS shr,
           (e_id & 1023)               AS low10,
           (e_id | 4096)               AS with_bit12,
           bit_count(e_id)::BIGINT     AS popcount,
           (~e_id)                     AS inverted
    FROM (SELECT event_id AS e_id FROM events)
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family — the primitive layer under every
    signature/banding operator in this repo (simhash bands, ANN
    Hamming screens, code packing)."""
    ev = table(spark, sf_dir, "events").select(F.col("event_id").alias("e_id"))
    return ev.select(
        "e_id",
        F.col("e_id").bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftleft("e_id", 3).alias("shl"),
        F.shiftright("e_id", 2).alias("shr"),
        F.col("e_id").bitwiseAND(F.lit(1023)).alias("low10"),
        F.col("e_id").bitwiseOR(F.lit(4096)).alias("with_bit12"),
        F.bit_count("e_id").cast("long").alias("popcount"),
        F.bitwise_not("e_id").alias("inverted"),
    )


@query(
    "fn_hash_portable",
    oracle="""
    SELECT doc_id,
           md5(text)                       AS text_md5,
           sha256(text)                    AS text_sha256,
           md5(source || ':' || cast(doc_id AS VARCHAR)) AS key_md5
    FROM documents
    """,
)
def fn_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-stable cross-engine hash functions (md5/sha256) — the
    content-addressing layer (dedup fingerprints, sampling buckets,
    cache keys).  Engine-specific hashes (xxhash64) are faster but stay
    INSIDE a single engine's plans; anything persisted or compared
    across systems uses these."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat_ws(":", "source", F.col("doc_id").cast("string"))).alias(
            "key_md5"
        ),
    )


@query(
    "fn_variant",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"meta":{"type":"' || event_type || '","uid":' || user_id
               || '},"vals":[' || cast(round(value * 1000) AS BIGINT)
               || ',' || (event_id % 7) || ']}' AS js
      FROM events
    )
    SELECT event_id,
           json_extract_string(js, '$.meta.type')    AS mtype,
           json_extract(js, '$.meta.uid')::BIGINT    AS uid,
           json_extract(js, '$.vals[0]')::BIGINT     AS v0,
           json_extract(js, '$.vals[1]')::BIGINT     AS v1
    FROM j
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type: ``parse_json`` into the binary
    semi-structured encoding, then typed path extraction with
    ``variant_get`` / the ``v:path`` shorthand — the modern replacement
    for stringly get_json_object when a column holds heterogeneous
    JSON: parsed ONCE into a shredded binary (no re-parse per
    extraction), with per-path typed access.  The document is
    synthesized deterministically from event columns (integers only —
    float-to-string formatting differs across engines) so the DuckDB
    twin checks the same extractions via json_extract."""
    ev = table(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","uid":'),
        F.col("user_id").cast("string"),
        F.lit('},"vals":['),
        F.round(F.col("value") * 1000).cast("long").cast("string"),
        F.lit(","),
        (F.col("event_id") % 7).cast("string"),
        F.lit("]}"),
    )
    v = ev.select("event_id", F.parse_json(js).alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.meta.type', 'string')").alias("mtype"),
        F.expr("variant_get(v, '$.meta.uid', 'long')").alias("uid"),
        F.expr("variant_get(v, '$.vals[0]', 'long')").alias("v0"),
        F.expr("cast(v:vals[1] as long)").alias("v1"),
    )


@query(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://'
             || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
             || 'example.com/' || source || '/doc/' || cast(doc_id % 200 AS VARCHAR)
             || (CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&ref=x'
                                 WHEN 1 THEN '#section-2' ELSE '' END) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1)            AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)     AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           nullif(regexp_extract(url, '\\?([^#]*)', 1), '')  AS query,
           nullif(regexp_extract(url, '#(.*)$', 1), '')      AS fragment,
           nullif(regexp_extract(url, 'utm_source=([^&#]*)', 1), '') AS utm_source
    FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-component extraction via Spark's ``parse_url`` — the
    structured sibling of ``dedup_url_canonical``'s regex
    canonicalizer.  The fixtures carry no URL column, so both engines
    synthesize the identical deterministic URL from (doc_id, source)
    (the dedup_url_canonical convention) and the oracle re-derives each
    component with plain regexes — checking that parse_url's
    PROTOCOL/HOST/PATH/QUERY/REF/QUERY:key semantics agree with their
    regex definitions, nulls included (parse_url yields NULL for an
    absent component; the oracle nullifs its empty match to the same).
    Scale: pure codegen string expressions, map-only, no shuffle."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "https").otherwise("http"),
        F.lit("://"),
        F.when(F.col("doc_id") % 5 == 0, "www.").otherwise(""),
        F.lit("example.com/"),
        F.col("source"),
        F.lit("/doc/"),
        (F.col("doc_id") % 200).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, "?utm_source=feed&ref=x")
        .when(F.col("doc_id") % 3 == 1, "#section-2")
        .otherwise(""),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.expr("parse_url(url, 'PROTOCOL')").alias("proto"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
        F.expr("parse_url(url, 'QUERY', 'utm_source')").alias("utm_source"),
    )


@query(
    "fn_array_setops",
    oracle="""
    WITH pair AS (
      SELECT doc_id,
             [doc_id % 5, doc_id % 7, doc_id % 3, doc_id % 11]  AS a,
             [doc_id % 3, doc_id % 4, doc_id % 11, doc_id % 13] AS b
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(list_cat(a, b))), ','), '') AS union_str,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> list_contains(b, x)))), ','), '')        AS intersect_str,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ','), '')    AS except_str,
           len(list_distinct(list_cat(a, b)))::BIGINT                     AS n_union,
           list_has_any(a, b)                                             AS overlaps
    FROM pair
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except / overlap) over
    deterministic small-int arrays derived from doc_id.  Spark's
    array_union/array_intersect/array_except deduplicate with
    first-occurrence order and DuckDB's list combinators make no order
    promise, so results are SORTED and serialized to strings before
    they cross the comparison boundary (the fn_array convention: arrays
    stay inside the plan).  Scale: codegen array expressions, map-only."""
    d = table(spark, sf_dir, "documents")
    a = F.array(
        (F.col("doc_id") % 5),
        (F.col("doc_id") % 7),
        (F.col("doc_id") % 3),
        (F.col("doc_id") % 11),
    )
    b = F.array(
        (F.col("doc_id") % 3),
        (F.col("doc_id") % 4),
        (F.col("doc_id") % 11),
        (F.col("doc_id") % 13),
    )
    p = d.select("doc_id", a.alias("a"), b.alias("b"))
    return p.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_union("a", "b")), ",").alias("union_str"),
        F.array_join(F.sort_array(F.array_intersect("a", "b")), ",").alias(
            "intersect_str"
        ),
        F.array_join(F.sort_array(F.array_except("a", "b")), ",").alias("except_str"),
        F.size(F.array_union("a", "b")).cast("long").alias("n_union"),
        F.arrays_overlap("a", "b").alias("overlaps"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{6,})', 1)                     AS first_long,
           len(regexp_extract_all(text, '[a-z]+'))::BIGINT            AS n_lower_runs,
           regexp_replace(substr(text, 1, 80), '[0-9]+', '#', 'g')    AS masked_head,
           regexp_matches(text, '(the|and|of) ')                      AS has_stopword,
           regexp_extract(text, '([a-z]+)[.!?]\\s*$', 1)              AS last_word
    FROM documents
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family over real document text: first capture,
    extract-all count, global replace, boolean match, anchored capture.
    Patterns stay inside the RE2 ∩ java.util.regex common subset
    (character classes, alternation, anchors, bounded repetition — no
    backrefs/lookaround) so both engines compile identical semantics.
    Scale: codegen regex expressions, map-only; the substr bound on the
    replace keeps the masked column narrow."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{6,})", 1).alias("first_long"),
        F.size(F.expr(r"regexp_extract_all(text, '([a-z]+)', 1)"))
        .cast("long")
        .alias("n_lower_runs"),
        F.regexp_replace(F.substring("text", 1, 80), r"[0-9]+", "#").alias(
            "masked_head"
        ),
        F.col("text").rlike(r"(the|and|of) ").alias("has_stopword"),
        F.regexp_extract("text", r"([a-z]+)[.!?]\s*$", 1).alias("last_word"),
    )


@query(
    "fn_try_safe",
    oracle="""
    WITH dirty AS (
      SELECT event_id, value,
             cast(props::JSON ->> 'k' AS BIGINT) AS k,
             CASE WHEN event_id % 3 = 0 THEN cast(event_id AS VARCHAR)
                  WHEN event_id % 3 = 1 THEN 'x' || cast(event_id AS VARCHAR)
                  ELSE '' END AS s
      FROM events
    )
    SELECT count(*)                                         AS n,
           count(try_cast(s AS BIGINT))                     AS n_int_ok,
           count(try_cast(s AS DOUBLE))                     AS n_dbl_ok,
           count(*) - count(value / nullif(k - 29, 0))      AS n_div_null,
           cast(sum(try_cast(s AS BIGINT)) AS BIGINT)       AS sum_ok,
           round(cast(sum(cast(value / nullif(k - 29, 0)
                     AS DECIMAL(28,12))) AS DOUBLE), 4)     AS sum_ratio
    FROM dirty
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (TRY_CAST / TRY_DIVIDE — the
    ANSI-mode answer to dirty data that must not kill a 100 TB job):
    a deterministic third of the rows carries a parseable integer
    string, a third a poisoned 'x'-prefixed one, a third empty, plus a
    division whose denominator hits zero on real rows (k=29 exists in
    the fixture).  Spark's try_divide returns NULL exactly where the
    oracle's nullif-guarded division does; counts of successful parses
    are exact integers, the surviving-ratio sum goes through DECIMAL.
    Map-only pass, one 1-row aggregate — no shuffle beyond the final
    combine."""
    ev = table(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_id").cast("string"))
        .when(F.col("event_id") % 3 == 1, F.concat(F.lit("x"), F.col("event_id").cast("string")))
        .otherwise(F.lit(""))
        .alias("s"),
    )
    return dirty.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.expr("try_cast(s as bigint)")).alias("n_int_ok"),
        F.count(F.expr("try_cast(s as double)")).alias("n_dbl_ok"),
        (F.count(F.lit(1)) - F.count(F.expr("try_divide(value, k - 29)"))).alias(
            "n_div_null"
        ),
        F.sum(F.expr("try_cast(s as bigint)")).cast("long").alias("sum_ok"),
        F.expr(
            "round(cast(sum(cast(try_divide(value, k - 29)"
            " as decimal(28,12))) as double), 4)"
        ).alias("sum_ratio"),
    )


@query(
    "fn_higher_order",
    oracle="""
    WITH arr AS (
      SELECT l_orderkey,
             list(l_quantity      ORDER BY l_linenumber) AS qs,
             list(l_extendedprice ORDER BY l_linenumber) AS ps
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(qs)                                                AS n_lines,
           cast(round(list_sum(list_transform(qs,
                 q -> cast(q * 2 AS DECIMAL(18,4)))), 2)
                AS DOUBLE)                                        AS sum_doubled,
           cast(len(list_filter(qs, q -> q > 25)) AS BIGINT)      AS n_big,
           cast(len(list_filter(qs, q -> q > 45)) > 0
                AS BOOLEAN)                                       AS any_huge,
           cast(len(list_filter(qs, q -> NOT (q > 0))) = 0
                AS BOOLEAN)                                       AS all_pos,
           cast(round(list_sum(list_transform(list_zip(qs, ps),
                 s -> cast(s[1] * s[2] AS DECIMAL(24,6)))), 2)
                AS DOUBLE)                                        AS gross
    FROM arr
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function family — transform / filter /
    exists / forall / zip_with / aggregate, the lambda calculus of
    ClickHouse's arrayMap/arrayFilter/arrayExists/arrayAll/
    arrayZip+arraySum — exercised over each order's line vectors
    (quantities and prices collected in linenumber order, so both
    engines fold identical arrays).  Per-element products are exact
    IEEE doubles cast to DECIMAL before summing (fold-order-proof);
    exists/forall are stated via filter sizes in the oracle because
    DuckDB spells them list_filter, while Spark uses its native
    exists()/forall().  Everything is codegen lambdas inside one
    per-order agg — no Python, no extra shuffle beyond the group
    key."""
    li = table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(l_linenumber, l_quantity,"
            " l_extendedprice))), s -> s.l_quantity)"
        ).alias("qs"),
        F.expr(
            "transform(array_sort(collect_list(struct(l_linenumber, l_quantity,"
            " l_extendedprice))), s -> s.l_extendedprice)"
        ).alias("ps"),
    )
    return arr.select(
        "l_orderkey",
        F.size("qs").cast("long").alias("n_lines"),
        F.expr(
            "cast(round(aggregate(transform(qs, q -> cast(q * 2 as decimal(18,4))),"
            " cast(0 as decimal(28,4)), (a, x) -> cast(a + x as decimal(28,4))), 2)"
            " as double)"
        ).alias("sum_doubled"),
        F.expr("cast(size(filter(qs, q -> q > 25)) as bigint)").alias("n_big"),
        F.expr("exists(qs, q -> q > 45)").alias("any_huge"),
        F.expr("forall(qs, q -> q > 0)").alias("all_pos"),
        F.expr(
            "cast(round(aggregate(zip_with(qs, ps,"
            " (q, p) -> cast(q * p as decimal(24,6))),"
            " cast(0 as decimal(30,6)), (a, x) -> cast(a + x as decimal(30,6))), 2)"
            " as double)"
        ).alias("gross"),
    )


@query(
    "fn_time_bucket",
    oracle="""
    SELECT (epoch_us(ts) - (epoch_us(ts) % 900000000))       AS bucket_15m_us,
           (epoch_us(ts) - ((epoch_us(ts) - 300000000)
                            % 900000000) - 300000000)        AS bucket_15m_offset_us,
           count(*)                                          AS n,
           cast(count(DISTINCT user_id) AS BIGINT)           AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-width time bucketing (ClickHouse toStartOfInterval /
    TimescaleDB time_bucket): floor to 15-minute buckets, plus the
    offset-origin variant (bucket boundaries shifted +5 min — the
    billing-period alignment case date_trunc can't express).  Exact
    integer microsecond arithmetic on epoch_us — no timezone or
    rounding semantics to diverge; grouping on the bucket is the
    standard time-series rollup shuffle."""
    ev = table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = 900_000_000
    off = 300_000_000
    return (
        ev.groupBy(
            (F.col("us") - (F.col("us") % w)).alias("bucket_15m_us"),
            (F.col("us") - ((F.col("us") - off) % w) - off).alias(
                "bucket_15m_offset_us"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


@query(
    "fn_mask_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g')                               AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(
             c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g')                               AS segment_masked,
           regexp_replace(c_name, '[0-9]', '*', 'g')          AS name_digits_starred
    FROM customer
    """,
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking function family (`mask()` — Spark 3.4+): the
    column-level redaction used when analytics schemas must ship
    without raw identifiers (the governance sibling of
    ``text_pii_scrub``'s regex scrubbing).  Default masking maps
    upper→'X', lower→'x', digit→'n'; the third column shows the
    per-class override form (digits→'*', letters kept).  Map-only
    codegen, no shuffle; the oracle re-derives the same masking with
    explicit regexp chains (fixture identifiers are ASCII, where
    `mask()`'s Unicode character classes and the oracle's [A-Z]
    ranges agree)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_mktsegment)").alias("segment_masked"),
        F.expr("mask(c_name, NULL, NULL, '*', NULL)").alias(
            "name_digits_starred"
        ),
    )


@query(
    "fn_str_to_map",
    oracle="""
    SELECT event_id,
           event_type                    AS t_val,
           cast(user_id AS VARCHAR)      AS u_val,
           cast(3 AS BIGINT)             AS n_keys,
           'k,t,u'                       AS keys_sorted
    FROM events
    """,
)
def fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``str_to_map`` parsing of k=v;k=v attribute strings — the
    format logging agents and legacy feeds emit (the reference's
    JSON-attributes sibling in flat-text form).  The query SYNTHESIZES
    the wire string from typed columns, parses it back with
    ``str_to_map``, and projects lookups + the sorted key census out
    of the map — hash-matching the oracle's direct column values
    proves parse ∘ format = identity.  All map construction and
    access is codegen (map functions), map-typed data never crosses
    the comparison boundary (lookups and a canonical key join do)."""
    ev = table(spark, sf_dir, "events")
    wire = ev.select(
        "event_id",
        F.concat(
            F.lit("t="), F.col("event_type"),
            F.lit(";u="), F.col("user_id"),
            F.lit(";k="), F.get_json_object("props", "$.k"),
        ).alias("s"),
    )
    m = wire.select(
        "event_id", F.expr("str_to_map(s, ';', '=')").alias("m")
    )
    return m.select(
        "event_id",
        F.element_at("m", "t").alias("t_val"),
        F.element_at("m", "u").alias("u_val"),
        F.size("m").cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
    )


@query(
    "fn_datetime_tz",
    oracle="""
    WITH s AS (
      SELECT event_id, ts, ts + INTERVAL 69 DAY AS ts2 FROM events
    ),
    conv AS (
      SELECT event_id, ts, ts2,
             timezone('America/New_York', timezone('UTC', ts))  AS ny,
             timezone('Asia/Kolkata',     timezone('UTC', ts))  AS kolkata,
             timezone('America/New_York', timezone('UTC', ts2)) AS ny2
      FROM s
    )
    SELECT event_id,
           strftime(ny,      '%Y-%m-%d %H:%M:%S') AS ny_wall,
           strftime(kolkata, '%Y-%m-%d %H:%M:%S') AS kolkata_wall,
           hour(ny)::BIGINT                       AS ny_hour,
           cast(floor((epoch(ny) - epoch(ts)) / 60) AS BIGINT)   AS ny_offset_min,
           cast(floor((epoch(kolkata) - epoch(ts)) / 60) AS BIGINT) AS kolkata_offset_min,
           strftime(ny2, '%Y-%m-%d %H:%M:%S')     AS ny_wall_dst,
           cast(floor((epoch(ny2) - epoch(ts2)) / 60) AS BIGINT) AS ny_offset_min_dst
    FROM conv
    """,
)
def fn_datetime_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-timezone datetime family: ``from_utc_timestamp`` into an
    IANA zone (America/New_York: whole-hour offset + DST rules;
    Asia/Kolkata: the +05:30 half-hour case), wall-clock formatting,
    hour extraction, and the UTC-offset-in-minutes probe.  The fixture
    month (Jan 2024) sits entirely in EST, so a +69-day shifted copy of
    each timestamp straddles the 2024-03-10 US spring-forward (the shift
    lands Jan-1 events ON the transition day) — the
    ``_dst`` columns flip from −300 to −240 minutes, proving real IANA
    rule evaluation rather than a fixed offset.  All map-only codegen
    expressions; the oracle derives the same instants via DuckDB's ICU
    timezone() dual (session-timezone-independent on both engines:
    Spark runs UTC per session.py, the oracle pins UTC via the inner
    timezone('UTC', ts) cast)."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        F.col("ts"),
        F.col("ts") + F.expr("INTERVAL 69 DAYS").alias("i"),
    ).toDF("event_id", "ts", "ts2")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    kolkata = F.from_utc_timestamp("ts", "Asia/Kolkata")
    ny2 = F.from_utc_timestamp("ts2", "America/New_York")
    off = lambda wall, base: (
        (F.to_unix_timestamp(wall) - F.to_unix_timestamp(base)) / 60
    ).cast("long")
    return s.select(
        "event_id",
        F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_wall"),
        F.date_format(kolkata, "yyyy-MM-dd HH:mm:ss").alias("kolkata_wall"),
        F.hour(ny).cast("long").alias("ny_hour"),
        off(ny, F.col("ts")).alias("ny_offset_min"),
        off(kolkata, F.col("ts")).alias("kolkata_offset_min"),
        F.date_format(ny2, "yyyy-MM-dd HH:mm:ss").alias("ny_wall_dst"),
        off(ny2, F.col("ts2")).alias("ny_offset_min_dst"),
    )


@query(
    "fn_printf",
    oracle="""
    SELECT event_id,
           printf('%08d', event_id)                         AS padded_id,
           printf('%.2f', value)                            AS money,
           printf('%s=%d @ %.4f', event_type, user_id, value) AS composed,
           printf('%x', user_id)                            AS hex_user
    FROM events
    """,
)
def fn_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (``format_string``): zero-padded ids,
    fixed-decimal money, composed label strings, hex rendering — the
    wire/display formatting family (the reference serializes its
    ClickHouse rows through Go's fmt, clickhouse.go:113-124; these are
    the same verbs).  %.2f/%.4f format the shortest-round double —
    both engines use the same C-style semantics so the strings match
    byte-for-byte.  Map-only codegen."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.format_string("%08d", "event_id").alias("padded_id"),
        F.format_string("%.2f", "value").alias("money"),
        F.format_string(
            "%s=%d @ %.4f", "event_type", "user_id", "value"
        ).alias("composed"),
        F.format_string("%x", "user_id").alias("hex_user"),
    )


#: Demo key for the AES round-trip (16 bytes = AES-128).  A real
#: deployment injects this from a KMS; the query's point is the
#: engine surface (encrypt/decrypt stay JVM-side, never a Python UDF),
#: not key management.
_AES_KEY = "0123456789abcdef"


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id, text AS text_roundtrip, octet_length(encode(text)) AS n_plain
    FROM documents
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip: ``aes_encrypt`` →
    ``aes_decrypt`` on the document text recovers the plaintext
    exactly — the governance primitive for PII columns at rest
    (encrypt on ingest, decrypt under an authorized session), next to
    masking (fn_mask_redact) and hashing (fn_hash_portable) in the
    privacy toolbox.  The oracle IS the identity: a hash match proves
    the cipher round-trip is lossless byte-for-byte.  ECB mode keeps
    the demo deterministic; the production note is GCM + per-column
    data keys, same API shape.  Plan: both ciphers are JVM intrinsics
    inside whole-stage codegen — no shuffle, no Python."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'),"
            f" '{_AES_KEY}', 'ECB') as string)"
        ).alias("text_roundtrip"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_plain"),
    )


@query(
    "fn_ip",
    oracle="""
    WITH n AS (
      SELECT event_id,
             ('0x' || substring(md5(cast(event_id AS VARCHAR)), 1, 8))::BIGINT
               AS ip_num
      FROM events
    )
    SELECT event_id,
           ip_num,
           cast((ip_num >> 24) & 255 AS VARCHAR) || '.' ||
           cast((ip_num >> 16) & 255 AS VARCHAR) || '.' ||
           cast((ip_num >>  8) & 255 AS VARCHAR) || '.' ||
           cast( ip_num        & 255 AS VARCHAR)        AS ip,
           (((ip_num >> 24) & 255) = 10
             OR (((ip_num >> 24) & 255) = 172
                 AND ((ip_num >> 16) & 255) BETWEEN 16 AND 31)
             OR (((ip_num >> 24) & 255) = 192
                 AND ((ip_num >> 16) & 255) = 168))     AS is_private,
           ip_num >> 8                                   AS subnet24,
           cast((ip_num >> 24) & 255 AS VARCHAR) || '.' ||
           cast((ip_num >> 16) & 255 AS VARCHAR) || '.' ||
           cast((ip_num >>  8) & 255 AS VARCHAR) || '.0/24' AS cidr24
    FROM n
    """,
)
def fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address functions — ClickHouse's IPv4NumToString /
    IPv4StringToNum / isIPAddressInRange family, which observability
    schemas lean on constantly (client IPs on every event row) and
    Spark has no builtins for: numeric⇄dotted-quad conversion, RFC-1918
    private-range classification (10/8, 172.16/12, 192.168/16), and the
    /24 subnet key both as a numeric group key (``ip_num >> 8`` — what
    a top-talkers agg groups on) and CIDR display form.  Addresses are
    synthesized portably (md5 of the event id → first 8 hex chars →
    uint32), and every derivation is integer shift/mask arithmetic
    inside whole-stage codegen — byte-identical in both engines, no
    Python, no shuffle (pure map over the scan)."""
    ev = table(spark, sf_dir, "events")
    n = ev.select(
        "event_id",
        F.expr(
            "cast(conv(substring(md5(cast(event_id as string)), 1, 8),"
            " 16, 10) as bigint)"
        ).alias("ip_num"),
    )
    o = [F.expr(f"(ip_num >> {s}) & 255") for s in (24, 16, 8, 0)]
    return n.select(
        "event_id",
        "ip_num",
        F.concat_ws(
            ".", *[x.cast("string") for x in o]
        ).alias("ip"),
        (
            (o[0] == 10)
            | ((o[0] == 172) & o[1].between(16, 31))
            | ((o[0] == 192) & (o[1] == 168))
        ).alias("is_private"),
        F.expr("ip_num >> 8").alias("subnet24"),
        F.concat(
            o[0].cast("string"), F.lit("."),
            o[1].cast("string"), F.lit("."),
            o[2].cast("string"), F.lit(".0/24"),
        ).alias("cidr24"),
    )


#: fn_geo_cell reference point (lat/lon in integer micro-degrees) and
#: the analysis bounding box (a ~10°×10° window around it).
_GEO_LAT0_U = 37_774_900
_GEO_LON0_U = -122_419_400
_GEO_BBOX = (32_000_000, 42_000_000, -127_000_000, -117_000_000)


@query(
    "fn_geo_cell",
    oracle=f"""
    WITH n AS (
      SELECT event_id,
             ('0x' || substring(md5(cast(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 180000001 - 90000000  AS lat_u,
             ('0x' || substring(md5(cast(event_id AS VARCHAR)), 9, 8))::BIGINT
               % 360000001 - 180000000 AS lon_u
      FROM events
    )
    SELECT event_id, lat_u, lon_u,
           cast(floor(sqrt(cast(
                 (lat_u - ({_GEO_LAT0_U})) * (lat_u - ({_GEO_LAT0_U}))
               + (lon_u - ({_GEO_LON0_U})) * (lon_u - ({_GEO_LON0_U}))
             AS DOUBLE))) AS BIGINT)                      AS grid_dist_u,
           cast((lat_u + 90000000) // 1000000 AS VARCHAR) || ':' ||
           cast((lon_u + 180000000) // 1000000 AS VARCHAR) AS cell_1deg,
           (lat_u BETWEEN {_GEO_BBOX[0]} AND {_GEO_BBOX[1]}
            AND lon_u BETWEEN {_GEO_BBOX[2]} AND {_GEO_BBOX[3]}) AS in_bbox
    FROM n
    """,
)
def fn_geo_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial grid functions — the ClickHouse geoToH3/pointInPolygon
    class of per-row geo primitives, in the portable-exactness subset:
    micro-degree integer coordinates (synthesized portably from md5
    halves), planar grid distance to a reference point via IEEE double
    sqrt (cast, sqrt, and floor are all correctly-rounded IEEE-754
    operations, so the result is bit-identical across engines — the one
    libm-free way to get a distance; great-circle trig would diverge in
    the last ulp), a 1°×1° cell id for spatial grouping (coordinates
    shifted non-negative BEFORE the floor division — negative integer
    division rounds differently across engines), and a bounding-box
    membership flag.  Pure map-linear codegen over the scan; the cell
    id is the group key a density/top-cells agg would shuffle on."""
    ev = table(spark, sf_dir, "events")
    n = ev.select(
        "event_id",
        F.expr(
            "cast(conv(substring(md5(cast(event_id as string)), 1, 8),"
            " 16, 10) as bigint) % 180000001 - 90000000"
        ).alias("lat_u"),
        F.expr(
            "cast(conv(substring(md5(cast(event_id as string)), 9, 8),"
            " 16, 10) as bigint) % 360000001 - 180000000"
        ).alias("lon_u"),
    )
    return n.select(
        "event_id",
        "lat_u",
        "lon_u",
        F.expr(
            f"cast(floor(sqrt(cast("
            f"(lat_u - ({_GEO_LAT0_U})) * (lat_u - ({_GEO_LAT0_U}))"
            f" + (lon_u - ({_GEO_LON0_U})) * (lon_u - ({_GEO_LON0_U}))"
            f" as double))) as bigint)"
        ).alias("grid_dist_u"),
        F.concat(
            F.expr("cast((lat_u + 90000000) div 1000000 as string)"),
            F.lit(":"),
            F.expr("cast((lon_u + 180000000) div 1000000 as string)"),
        ).alias("cell_1deg"),
        (
            F.col("lat_u").between(_GEO_BBOX[0], _GEO_BBOX[1])
            & F.col("lon_u").between(_GEO_BBOX[2], _GEO_BBOX[3])
        ).alias("in_bbox"),
    )


@query(
    "fn_unit_format",
    oracle="""
    WITH v AS (
      SELECT event_id,
             abs(cast(round(value * 1000000) AS BIGINT)) AS n_bytes,
             abs(cast(round(value * 1000) AS BIGINT))    AS n_seconds
      FROM events
    )
    SELECT event_id, n_bytes, n_seconds,
           CASE
             WHEN n_bytes >= 1073741824 THEN
               cast(n_bytes // 1073741824 AS VARCHAR) || '.' ||
               cast((n_bytes % 1073741824) * 100 // 1073741824 AS VARCHAR)
               || ' GiB'
             WHEN n_bytes >= 1048576 THEN
               cast(n_bytes // 1048576 AS VARCHAR) || '.' ||
               cast((n_bytes % 1048576) * 100 // 1048576 AS VARCHAR)
               || ' MiB'
             WHEN n_bytes >= 1024 THEN
               cast(n_bytes // 1024 AS VARCHAR) || '.' ||
               cast((n_bytes % 1024) * 100 // 1024 AS VARCHAR) || ' KiB'
             ELSE cast(n_bytes AS VARCHAR) || ' B'
           END AS bytes_readable,
           cast(n_seconds // 3600 AS VARCHAR) || 'h' ||
           cast((n_seconds % 3600) // 60 AS VARCHAR) || 'm' ||
           cast(n_seconds % 60 AS VARCHAR) || 's' AS duration_readable
    FROM v
    """,
)
def fn_unit_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-readable unit formatting — ClickHouse's
    formatReadableSize / formatReadableTimeDelta parity, which Spark
    has no builtin for and every ops report reaches for: bytes to the
    largest binary unit with TWO exact decimal digits (the fraction is
    integer arithmetic — ``rem * 100 // unit`` — never a float
    format, so both engines emit byte-identical strings, including the
    truncation direction), and seconds to h/m/s fields via pure
    integer div/mod.  Map-linear codegen over the scan; no shuffle."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        F.expr("abs(cast(round(value * 1000000) as bigint))").alias("n_bytes"),
        F.expr("abs(cast(round(value * 1000) as bigint))").alias("n_seconds"),
    )

    def unit(n: str, size: int, label: str) -> str:
        return (
            f"concat(cast({n} div {size} as string), '.', "
            f"cast(({n} % {size}) * 100 div {size} as string), ' {label}')"
        )

    return v.select(
        "event_id",
        "n_bytes",
        "n_seconds",
        F.expr(
            "CASE "
            f"WHEN n_bytes >= 1073741824 THEN {unit('n_bytes', 1073741824, 'GiB')} "
            f"WHEN n_bytes >= 1048576 THEN {unit('n_bytes', 1048576, 'MiB')} "
            f"WHEN n_bytes >= 1024 THEN {unit('n_bytes', 1024, 'KiB')} "
            "ELSE concat(cast(n_bytes as string), ' B') END"
        ).alias("bytes_readable"),
        F.expr(
            "concat(cast(n_seconds div 3600 as string), 'h', "
            "cast((n_seconds % 3600) div 60 as string), 'm', "
            "cast(n_seconds % 60 as string), 's')"
        ).alias("duration_readable"),
    )


@query(
    "fn_uuid_deterministic",
    oracle="""
    WITH h AS (
      SELECT event_id,
             md5('evt:' || cast(event_id AS VARCHAR)) AS hx
      FROM events
    )
    SELECT event_id,
           substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-' ||
           '5' || substring(hx, 14, 3) || '-' ||
           CASE cast(('0x' || substring(hx, 17, 1))::BIGINT % 4 AS VARCHAR)
             WHEN '0' THEN '8' WHEN '1' THEN '9'
             WHEN '2' THEN 'a' ELSE 'b' END
           || substring(hx, 18, 3) || '-' || substring(hx, 21, 12)
             AS uuid5,
           cast(('0x' || substring(hx, 1, 15))::BIGINT AS BIGINT)
             AS shard_key
    FROM h
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based UUIDs (RFC-4122 version-5 LAYOUT over
    an md5 name hash) — the idempotent-id primitive replacing the
    reference's random ``uuid.New()`` per generated event
    (``internal/generator/generator.go``): random ids make replays
    produce NEW rows; name-based ids make the same logical event hash
    to the same id on every replay, which is what lets the at-least-
    once sink (A13) dedupe.  Version nibble pinned to 5, variant
    nibble folded into 8/9/a/b per the RFC bit layout, all by string
    arithmetic on the md5 hex — byte-identical across engines — plus
    a 60-bit shard key from the leading hex (the id a partitioner
    would route on).  Map-linear codegen; no shuffle."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        "event_id",
        F.md5(F.concat(F.lit("evt:"), F.col("event_id").cast("string"))).alias(
            "hx"
        ),
    )
    variant = (
        "CASE cast(conv(substring(hx, 17, 1), 16, 10) as bigint) % 4 "
        "WHEN 0 THEN '8' WHEN 1 THEN '9' WHEN 2 THEN 'a' ELSE 'b' END"
    )
    return h.select(
        "event_id",
        F.expr(
            "concat(substring(hx, 1, 8), '-', substring(hx, 9, 4), '-', "
            f"'5', substring(hx, 14, 3), '-', {variant}, "
            "substring(hx, 18, 3), '-', substring(hx, 21, 12))"
        ).alias("uuid5"),
        F.expr(
            "cast(conv(substring(hx, 1, 15), 16, 10) as bigint)"
        ).alias("shard_key"),
    )
