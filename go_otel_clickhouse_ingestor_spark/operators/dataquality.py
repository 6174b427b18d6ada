"""Declarative data-quality expectations (Great-Expectations-style,
Spark-native).

A deployment replacing the reference needs the audit the reference
never had: its ClickHouse tables accepted whatever the ingestor wrote
(at-least-once, no constraints — README.md's MergeTree tables declare
no uniqueness and ClickHouse doesn't enforce FKs).  This module makes
the implied contract explicit and checkable: each expectation compiles
to a conditional aggregate or an anti-join, the whole suite runs as a
handful of partial-aggregated passes, and the result is a small
violations table a scheduler can gate promotion on (write-audit-
publish).

Scale shape: all single-table expectations over one table FUSE into
ONE map-side conditional aggregation (one scan, one 1-row shuffle per
table); referential integrity is a broadcast-or-shuffle anti-join
counted, never materialized.  Nothing here is row-expanded — the audit
costs one pass per table regardless of how many column expectations
are declared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

#: The declared contract for the TPC-H-ish fixture warehouse.  Each
#: entry: (check_name, table, violation_predicate_sql) — a row
#: violates the expectation when the predicate is TRUE.
ROW_EXPECTATIONS: list[tuple[str, str, str]] = [
    ("orders_custkey_not_null", "orders", "o_custkey IS NULL"),
    ("orders_status_accepted", "orders", "o_orderstatus NOT IN ('O','F','P')"),
    ("orders_totalprice_positive", "orders", "o_totalprice <= 0"),
    ("orders_date_in_span", "orders",
     "o_orderdate < TIMESTAMP '1990-01-01' OR o_orderdate >= TIMESTAMP '2005-01-01'"),
    ("lineitem_quantity_range", "lineitem",
     "l_quantity < 1 OR l_quantity > 50"),
    ("lineitem_discount_range", "lineitem",
     "l_discount < 0 OR l_discount > 0.1"),
    ("events_value_not_null", "events", "value IS NULL"),
    ("events_type_accepted", "events",
     "event_type NOT IN ('click','view','purchase','signup','error')"),
]


@query(
    "dq_expectations_audit",
    oracle="""
    SELECT 'orders_custkey_not_null' AS check_name,
           count(*) AS n_checked,
           cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_status_accepted', count(*),
           cast(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_positive', count(*),
           cast(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_date_in_span', count(*),
           cast(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                      OR o_orderdate >= TIMESTAMP '2005-01-01'
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_quantity_range', count(*),
           cast(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range', count(*),
           cast(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events_value_not_null', count(*),
           cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_type_accepted', count(*),
           cast(sum(CASE WHEN event_type NOT IN
                 ('click','view','purchase','signup','error')
               THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders_orderkey_unique', count(*),
           cast(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_orderkey_ref_integrity', count(*),
           cast(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def dq_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the declared expectation suite, one result row per check:
    (check_name, n_checked, n_violations).  Row expectations against
    the same table fuse into a single conditional aggregation (one
    scan per table); uniqueness is count-vs-distinct; referential
    integrity counts unmatched probe rows through a left join.  Gate
    pattern: promote the batch only when every n_violations = 0
    (write-audit-publish); quarantine queries are the same predicates
    un-aggregated."""
    by_table: dict[str, list[tuple[str, str]]] = {}
    for name, tbl, pred in ROW_EXPECTATIONS:
        by_table.setdefault(tbl, []).append((name, pred))

    parts: list[DataFrame] = []
    for tbl, checks in by_table.items():
        t = table(spark, sf_dir, tbl)
        agg = t.agg(
            F.count(F.lit(1)).alias("n_checked"),
            *[
                F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(name)
                for name, pred in checks
            ],
        )
        for name, _ in checks:
            parts.append(
                agg.select(
                    F.lit(name).alias("check_name"),
                    "n_checked",
                    F.col(name).alias("n_violations"),
                )
            )

    o = table(spark, sf_dir, "orders")
    parts.append(
        o.agg(
            F.lit("orders_orderkey_unique").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
                "n_violations"
            ),
        ).select("check_name", "n_checked", "n_violations")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = o.select("o_orderkey")
    joined = li.join(keys, li.l_orderkey == keys.o_orderkey, "left")
    parts.append(
        joined.agg(
            F.lit("lineitem_orderkey_ref_integrity").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_violations"),
        ).select("check_name", "n_checked", "n_violations")
    )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: Deterministic drift rules for the simulated "tomorrow" snapshot of
#: orders — modular-arithmetic selections so both engines derive the
#: identical snapshot without any shared state.
_DIFF_UPDATED_MOD = 97   # keys with o_orderkey % 97 == 0 get repriced
_DIFF_DELETED_MOD = 101  # keys with o_orderkey % 101 == 0 disappear
_DIFF_INSERTED_MOD = 103 # keys % 103 == 0 spawn a new -key row


@query(
    "dq_snapshot_diff",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                           cast(round(o_totalprice * 100) AS BIGINT),
                           epoch_us(o_orderdate), o_orderpriority)) AS rh
      FROM orders
    ),
    b_base AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                           cast(round((CASE WHEN o_orderkey % {_DIFF_UPDATED_MOD} = 0
                                            THEN o_totalprice + 1
                                            ELSE o_totalprice END) * 100) AS BIGINT),
                           epoch_us(o_orderdate), o_orderpriority)) AS rh
      FROM orders WHERE o_orderkey % {_DIFF_DELETED_MOD} <> 0
    ),
    b_ins AS (
      SELECT -o_orderkey AS k, o_orderpriority AS pri,
             md5(concat_ws('|', -o_orderkey, o_custkey, o_orderstatus,
                           cast(round(o_totalprice * 100) AS BIGINT),
                           epoch_us(o_orderdate), o_orderpriority)) AS rh
      FROM orders WHERE o_orderkey % {_DIFF_INSERTED_MOD} = 0
    ),
    b AS (SELECT * FROM b_base UNION ALL SELECT * FROM b_ins),
    d AS (
      SELECT coalesce(a.pri, b.pri) AS pri,
             CASE WHEN a.k IS NULL            THEN 'inserted'
                  WHEN b.k IS NULL            THEN 'deleted'
                  WHEN a.rh <> b.rh           THEN 'changed'
                  ELSE 'unchanged' END        AS state
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT pri                                              AS o_orderpriority,
           cast(sum(CASE WHEN state = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           cast(sum(CASE WHEN state = 'changed'   THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           cast(sum(CASE WHEN state = 'deleted'   THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
           cast(sum(CASE WHEN state = 'inserted'  THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
    FROM d GROUP BY pri
    """,
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two table versions by key with a
    row-content hash — the write-audit-publish companion every
    migration and every incremental-sync pipeline runs ("what changed
    between yesterday's copy and today's?").  Snapshot B is derived
    from A by three deterministic modular rules (reprice, delete,
    insert) so the expected diff is exactly computable on both
    engines.  The mechanics are the production shape: canonical row
    serialization (ints / centi-units / epoch-micros — the
    agg_table_checksum rule) → md5 → FULL OUTER join on the key →
    4-way state classification → per-group counts.  Plan: one shuffle
    on the key for each side into a single sort-merge/hash join, then
    a tiny agg; at 100 TB the join is the floor cost of any key-level
    reconciliation, and AQE picks the join strategy per side size."""
    o = table(spark, sf_dir, "orders")

    def rowhash(key_col, price_expr):
        return F.md5(
            F.concat_ws(
                "|",
                key_col.cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.round(price_expr * 100).cast("long").cast("string"),
                F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("string"),
                F.col("o_orderpriority"),
            )
        )

    a = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        rowhash(F.col("o_orderkey"), F.col("o_totalprice")).alias("rh"),
    )
    repriced = F.when(
        F.col("o_orderkey") % _DIFF_UPDATED_MOD == 0, F.col("o_totalprice") + 1
    ).otherwise(F.col("o_totalprice"))
    b_base = o.filter(F.col("o_orderkey") % _DIFF_DELETED_MOD != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        rowhash(F.col("o_orderkey"), repriced).alias("rh"),
    )
    b_ins = o.filter(F.col("o_orderkey") % _DIFF_INSERTED_MOD == 0).select(
        (-F.col("o_orderkey")).alias("k"),
        F.col("o_orderpriority").alias("pri"),
        rowhash(-F.col("o_orderkey"), F.col("o_totalprice")).alias("rh"),
    )
    b = b_base.unionAll(b_ins)
    j = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    state = (
        F.when(F.col("a.k").isNull(), "inserted")
        .when(F.col("b.k").isNull(), "deleted")
        .when(F.col("a.rh") != F.col("b.rh"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce(F.col("a.pri"), F.col("b.pri")).alias("o_orderpriority"),
            state.alias("state"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("state") == "unchanged", 1).otherwise(0)).alias("n_unchanged"),
            F.sum(F.when(F.col("state") == "changed", 1).otherwise(0)).alias("n_changed"),
            F.sum(F.when(F.col("state") == "deleted", 1).otherwise(0)).alias("n_deleted"),
            F.sum(F.when(F.col("state") == "inserted", 1).otherwise(0)).alias("n_inserted"),
        )
    )


#: Reconciliation delta buckets (abs centi-delta upper bounds; the
#: last bucket is open-ended).
_RECON_BUCKETS = (0, 100, 10000, 1000000)


@query(
    "dq_cross_table_reconciliation",
    oracle="""
    WITH calc AS (
      SELECT l_orderkey,
             cast(round(sum(cast(l_extendedprice AS DECIMAL(12,2))
                            * (1 - cast(l_discount AS DECIMAL(4,2)))
                            * (1 + cast(l_tax AS DECIMAL(4,2)))) * 100
                        ) AS BIGINT) AS calc_c
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderkey,
             cast(round(o.o_totalprice * 100) AS BIGINT) AS head_c,
             calc.calc_c
      FROM orders o LEFT JOIN calc ON o.o_orderkey = calc.l_orderkey
    ),
    bucketed AS (
      SELECT CASE
               WHEN calc_c IS NULL               THEN 'no_lineitems'
               WHEN abs(head_c - calc_c) = 0     THEN 'exact'
               WHEN abs(head_c - calc_c) <= 100  THEN 'within_1_unit'
               WHEN abs(head_c - calc_c) <= 10000 THEN 'within_100'
               WHEN abs(head_c - calc_c) <= 1000000 THEN 'within_10k'
               ELSE 'beyond_10k' END AS bucket,
             abs(coalesce(head_c - calc_c, 0)) AS adelta
      FROM joined
    )
    SELECT bucket,
           cast(count(*) AS BIGINT)     AS n_orders,
           cast(max(adelta) AS BIGINT)  AS max_abs_delta_c
    FROM bucketed GROUP BY bucket
    """,
)
def dq_cross_table_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table MEASURE reconciliation: does the order header's
    total match the sum its lineitems imply (the TPC-H
    ``Σ extprice·(1−disc)·(1+tax)`` invariant)?  The audit the
    row-level expectations (dq_expectations_audit) and the key-level
    diff (dq_snapshot_diff) both skip — header/detail drift is THE
    classic silent corruption in denormalized warehouses, and on this
    fixture the census honestly reports the invariant does NOT hold
    (headers are generated independently) plus 27 header-only orders.
    All deltas are exact centi-integers (the tpch money discipline:
    DECIMAL before round), bucketed by magnitude so the report is
    bounded and trend-able.  Plan: one lineitem partial agg on
    orderkey, one left join to headers, a 6-row census."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    money = (
        "cast(l_extendedprice as decimal(12,2))"
        " * (1 - cast(l_discount as decimal(4,2)))"
        " * (1 + cast(l_tax as decimal(4,2)))"
    )
    calc = li.groupBy("l_orderkey").agg(
        F.expr(f"cast(round(sum({money}) * 100) as bigint)").alias("calc_c")
    )
    joined = o.select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("head_c"),
    ).join(calc, o.o_orderkey == calc.l_orderkey, "left")
    adelta = F.abs(F.coalesce(F.col("head_c") - F.col("calc_c"), F.lit(0)))
    bucket = (
        F.when(F.col("calc_c").isNull(), "no_lineitems")
        .when(adelta == 0, "exact")
        .when(adelta <= 100, "within_1_unit")
        .when(adelta <= 10000, "within_100")
        .when(adelta <= 1000000, "within_10k")
        .otherwise("beyond_10k")
    )
    return (
        joined.select(bucket.alias("bucket"), adelta.alias("adelta"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max("adelta").cast("long").alias("max_abs_delta_c"),
        )
    )


#: k-anonymity threshold: classes smaller than this are re-identifiable.
_KANON_K = 5


@query(
    "dq_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey,
             c_mktsegment,
             cast(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             count(*) AS n_rows
      FROM customer
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT sum(n_rows) AS total, min(n_rows) AS k_min FROM classes)
    SELECT c_nationkey,
           c_mktsegment,
           bal_band,
           cast(n_rows AS BIGINT)          AS n_rows,
           (n_rows < {_KANON_K})           AS at_risk,
           cast(t.k_min AS BIGINT)         AS k_min,
           cast((SELECT sum(n_rows) FROM classes WHERE n_rows < {_KANON_K})
                AS BIGINT)                 AS rows_at_risk,
           cast(t.total AS BIGINT)         AS total_rows
    FROM classes CROSS JOIN tot t
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy gate a
    training-data release runs BEFORE export (Sweeney 2002: a record
    is re-identifiable when its quasi-identifier combination is shared
    by fewer than k rows; the famous result is that zip+birthdate+sex
    singles out most of a population).  Quasi-identifier tuple here:
    (nation, market segment, account-balance band); every equivalence
    class is reported with its size, an ``at_risk`` flag (n < {_KANON_K}),
    and the dataset-level audit numbers every row carries — the
    minimum k actually achieved, the total row mass in at-risk classes
    (the quantity a suppress-or-generalize pass must remove), and the
    population.  Plan: one partial-agged groupBy over the scan into a
    class grid bounded by the quasi-identifier domain (nations ×
    segments × bands — thousands of cells at any data scale), then two
    broadcast 1-row aggregates joined back; the 100 TB cost is the one
    scan, exactly like every dq_* audit."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = classes.agg(
        F.sum("n_rows").alias("total"), F.min("n_rows").alias("k_min")
    )
    risk = classes.filter(F.col("n_rows") < _KANON_K).agg(
        F.sum("n_rows").alias("rows_at_risk")
    )
    return (
        classes.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(risk))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") < _KANON_K).alias("at_risk"),
            F.col("k_min").cast("long").alias("k_min"),
            F.col("rows_at_risk").cast("long").alias("rows_at_risk"),
            F.col("total").cast("long").alias("total_rows"),
        )
    )


@query(
    "dq_freshness_completeness",
    oracle="""
    WITH g AS (
      SELECT max(epoch_us(ts)) AS max_us,
             count(DISTINCT cast(ts AS DATE)) AS n_days_total
      FROM events
    ),
    per_type AS (
      SELECT event_type,
             max(epoch_us(ts))                 AS last_us,
             count(DISTINCT cast(ts AS DATE))  AS n_days_present,
             cast(count(*) AS BIGINT)          AS n_rows
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           last_us,
           g.max_us - last_us                        AS freshness_lag_us,
           cast(n_days_present AS BIGINT)            AS n_days_present,
           cast(g.n_days_total AS BIGINT)            AS n_days_total,
           cast(g.n_days_total - n_days_present
                AS BIGINT)                           AS n_days_missing,
           (1000000 * n_days_present) // g.n_days_total
                                                     AS completeness_ppm,
           n_rows
    FROM per_type, g
    """,
)
def dq_freshness_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness + completeness audit per event type — the two
    pipeline-health numbers every warehouse monitor pages on (is data
    ARRIVING: lag of the stream's newest row behind the table's global
    watermark; is data COMPLETE: how many calendar days in the table's
    span does the stream actually cover), the scheduled-check
    counterpart of dq_expectations_audit's row-content contract.  The
    reference ships at-least-once with no such audit (SURVEY §0) —
    this is the query its operators would have needed the first time a
    consumer lagged silently.  All exact integers: epoch-micro lags,
    distinct-day counts, ppm completeness via floor division.  Plan:
    one partial-agged groupBy over the scan (the distinct-day count
    expands to a two-phase agg on a bounded type×day grid) plus a
    1-row global broadcast — no row-expanded stage anywhere."""
    ev = table(spark, sf_dir, "events")
    g = F.broadcast(
        ev.agg(
            F.max(F.unix_micros("ts")).alias("max_us"),
            F.count_distinct(F.to_date("ts")).alias("n_days_total"),
        )
    )
    per_type = ev.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count_distinct(F.to_date("ts")).alias("n_days_present"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return per_type.crossJoin(g).select(
        "event_type",
        "last_us",
        (F.col("max_us") - F.col("last_us")).alias("freshness_lag_us"),
        F.col("n_days_present").cast("long").alias("n_days_present"),
        F.col("n_days_total").cast("long").alias("n_days_total"),
        (F.col("n_days_total") - F.col("n_days_present"))
        .cast("long")
        .alias("n_days_missing"),
        F.expr("(1000000 * n_days_present) div n_days_total").alias(
            "completeness_ppm"
        ),
        "n_rows",
    )


@query(
    "dq_null_profile",
    oracle="""
    WITH ev AS (
      SELECT 'events' AS tbl, col, n_rows, n_null, n_distinct
      FROM (
        SELECT 'event_type' AS col, count(*) AS n_rows,
               count(*) - count(event_type) AS n_null,
               count(DISTINCT event_type) AS n_distinct FROM events
        UNION ALL
        SELECT 'user_id', count(*), count(*) - count(user_id),
               count(DISTINCT user_id) FROM events
        UNION ALL
        SELECT 'value', count(*), count(*) - count(value),
               count(DISTINCT value) FROM events
        UNION ALL
        SELECT 'props', count(*), count(*) - count(props),
               count(DISTINCT props) FROM events
      )
    ),
    dc AS (
      SELECT 'documents' AS tbl, col, n_rows, n_null, n_distinct
      FROM (
        SELECT 'text' AS col, count(*) AS n_rows,
               count(*) - count(text) AS n_null,
               count(DISTINCT text) AS n_distinct FROM documents
        UNION ALL
        SELECT 'lang', count(*), count(*) - count(lang),
               count(DISTINCT lang) FROM documents
        UNION ALL
        SELECT 'source', count(*), count(*) - count(source),
               count(DISTINCT source) FROM documents
      )
    )
    SELECT tbl, col,
           cast(n_rows AS BIGINT)     AS n_rows,
           cast(n_null AS BIGINT)     AS n_null,
           cast(n_distinct AS BIGINT) AS n_distinct,
           (1000000 * n_null) // n_rows AS null_ppm,
           (1000000 * n_distinct) // n_rows AS distinct_ppm
    FROM (SELECT * FROM ev UNION ALL SELECT * FROM dc)
    """,
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the null/cardinality summary every warehouse
    profiler (dbt source freshness tests, Deequ analyzers) computes
    before trusting a new feed: per (table, column), row count, null
    count, EXACT distinct count, and ppm null/distinct rates via floor
    division.  The profile is the input to the audits downstream of it
    (a column going 100% null or collapsing to one distinct value is
    the classic silent-upstream-change signature that
    dq_expectations_audit's fixed contract can't catch).  Plan: ONE
    pass per table — all per-column null counts fuse into a single
    partial agg, and Spark expands the multi-column exact DISTINCTs
    via expand+two-phase agg (the events_label_cardinality_audit
    shape); output is columns×tables-bounded."""
    ev = table(spark, sf_dir, "events")
    dc = table(spark, sf_dir, "documents")

    def profile(df: DataFrame, tbl: str, cols: list) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for c in cols:
            aggs.append(
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"null_{c}")
            )
            aggs.append(F.count_distinct(c).cast("long").alias(f"dist_{c}"))
        one = df.agg(*aggs)
        parts = None
        for c in cols:
            row = one.select(
                F.lit(tbl).alias("tbl"),
                F.lit(c).alias("col"),
                "n_rows",
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
            )
            parts = row if parts is None else parts.unionAll(row)
        return parts

    prof = profile(ev, "events", ["event_type", "user_id", "value", "props"]).unionAll(
        profile(dc, "documents", ["text", "lang", "source"])
    )
    return prof.select(
        "tbl",
        "col",
        "n_rows",
        "n_null",
        "n_distinct",
        F.expr("(1000000 * n_null) div n_rows").alias("null_ppm"),
        F.expr("(1000000 * n_distinct) div n_rows").alias("distinct_ppm"),
    )


#: Two-sample KS drift grid: value domain binned to a FIXED grid of
#: centi-unit cells so the CDF sweep runs over a bounded domain (the
#: exact KS over raw distinct values needs a global ordered cumsum —
#: a data-growing single-task window, the class verify_round gates;
#: on binned data the discrete KS is exact for the binned measure).
_KS_BIN_C = 100  # bin width in value centi-units


@query(
    "dq_drift_ks",
    oracle=f"""
    WITH halves AS (
      SELECT CASE WHEN 2 * epoch_us(ts) <
                  (SELECT min(epoch_us(ts)) + max(epoch_us(ts)) FROM events)
             THEN 1 ELSE 2 END AS half,
             cast(round(value * 100) AS BIGINT) // {_KS_BIN_C} AS bin
      FROM events
    ),
    g AS (
      SELECT bin,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS n2
      FROM halves GROUP BY bin
    ),
    t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM g),
    cdf AS (
      SELECT bin,
             sum(n1) OVER (ORDER BY bin) AS c1,
             sum(n2) OVER (ORDER BY bin) AS c2
      FROM g
    )
    SELECT cast(max(abs(c1 * t.t2 - c2 * t.t1)
                    // greatest(t.t1 * t.t2 // 1000000, 1)) AS BIGINT)
             AS ks_ppm,
           cast(count(*) AS BIGINT)       AS n_bins,
           cast(max(t.t1) AS BIGINT)      AS n_first,
           cast(max(t.t2) AS BIGINT)      AS n_second
    FROM cdf, t
    """,
)
def dq_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift check between the first and
    second calendar halves of the event stream — THE distribution-drift
    gate a data-quality layer runs on every refresh (PSI's
    nonparametric sibling: max CDF gap, sensitive anywhere in the
    distribution, no binning assumptions beyond the fixed grid).  The
    statistic is exact integer ppm over the binned measure: the gap
    |F1−F2| is cross-multiplied (c1·t2 − c2·t1) so no float division
    happens before the single final floor-division — bit-identical
    across engines (the events_slo_burn_rate discipline).  Scale
    shape: one map-side-combined pass into the bounded bin grid
    (fixed {_KS_BIN_C}-centi-unit cells — value-range-bounded, NOT
    data-growing), the CDF sweep is a window over that bounded grid
    only, and the totals are 1-row aggregates."""
    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    halves = ev.join(F.broadcast(b)).select(
        F.when(
            2 * F.unix_micros("ts") < F.col("t0") + F.col("t1"), 1
        )
        .otherwise(2)
        .alias("half"),
        F.expr(f"cast(round(value * 100) as bigint) div {_KS_BIN_C}").alias(
            "bin"
        ),
    )
    g = halves.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("n2"),
    )
    t = g.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    from pyspark.sql.window import Window

    # bounded: the CDF window sweeps the fixed centi-unit bin grid
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = g.select(
        "bin",
        F.sum("n1").over(wc).alias("c1"),
        F.sum("n2").over(wc).alias("c2"),
    ).join(F.broadcast(t))
    return cdf.agg(
        F.expr(
            "cast(max(abs(c1 * t2 - c2 * t1)"
            " div greatest((t1 * t2) div 1000000, 1)) as bigint)"
        ).alias("ks_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.max("t1").cast("long").alias("n_first"),
        F.max("t2").cast("long").alias("n_second"),
    )


#: Benford expected first-digit mass in exact ppm (floor(log-law ppm):
#: ppm_d = round(1e6 * log10(1 + 1/d)) — the canonical table, pinned
#: as integers so both engines compare against the SAME constants).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@query(
    "dq_benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT substr(cast(cast(round(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1)::BIGINT AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n) AS tot FROM g),
    e AS (SELECT * FROM (VALUES
      {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_PPM.items()))})
      AS v(digit, exp_ppm))
    SELECT cast(e.digit AS BIGINT) AS digit,
           cast(coalesce(g.n, 0) AS BIGINT)                    AS n,
           cast((1000000 * coalesce(g.n, 0)) // t.tot AS BIGINT) AS obs_ppm,
           cast(e.exp_ppm AS BIGINT)                           AS exp_ppm,
           cast(abs((1000000 * coalesce(g.n, 0)) // t.tot - e.exp_ppm)
                AS BIGINT)                                     AS dev_ppm
    FROM e LEFT JOIN g USING (digit), t
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic forensic data-quality screen (fabricated or truncated
    monetary columns drift from the log-law digit distribution; real
    multiplicative totals follow it).  Emits the 9-row digit grid
    with observed vs expected mass in exact integer ppm (the expected
    table is pinned as integer constants so both engines compare the
    same values; deviations are integer ppm — no float anywhere).
    Scale: first digit via string head of the exact centi-unit
    integer (no float log10), one map-side-combined pass into a
    9-row grid, 1-row total broadcast."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.expr(
            "cast(substring(cast(cast(round(o_totalprice * 100) as bigint)"
            " as string), 1, 1) as bigint)"
        ).alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = g.agg(F.sum("n").alias("tot"))
    e = spark.createDataFrame(
        sorted(_BENFORD_PPM.items()), "digit long, exp_ppm long"
    )
    return (
        e.join(g, "digit", "left")
        .join(F.broadcast(t))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("(1000000 * coalesce(n, 0)) div tot")
            .cast("long")
            .alias("obs_ppm"),
            F.col("exp_ppm").cast("long"),
            F.expr(
                "cast(abs((1000000 * coalesce(n, 0)) div tot - exp_ppm)"
                " as bigint)"
            ).alias("dev_ppm"),
        )
    )


@query(
    "dq_drift_psi",
    oracle=f"""
    WITH halves AS (
      SELECT CASE WHEN 2 * epoch_us(ts) <
                  (SELECT min(epoch_us(ts)) + max(epoch_us(ts)) FROM events)
             THEN 1 ELSE 2 END AS half,
             cast(round(value * 100) AS BIGINT) // {_KS_BIN_C} AS bin
      FROM events
    ),
    g AS (
      SELECT bin,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS n2
      FROM halves GROUP BY bin
    ),
    t AS (SELECT sum(n1) AS t1, sum(n2) AS t2, count(*) AS b FROM g)
    SELECT bin,
           cast(n1 AS BIGINT) AS n1,
           cast(n2 AS BIGINT) AS n2,
           round(((n1 + 1) / cast(t.t1 + t.b AS DOUBLE)
                  - (n2 + 1) / cast(t.t2 + t.b AS DOUBLE))
                 * ln(((n1 + 1) * (t.t2 + t.b))
                      / cast((n2 + 1) * (t.t1 + t.b) AS DOUBLE)),
                 6) AS psi_contrib
    FROM g, t
    """,
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift grid between the first and
    second calendar halves — THE industry drift metric (credit-risk
    monitoring's standard; 0.1/0.25 action thresholds), complementing
    ``dq_drift_ks``: KS reports the worst single point of CDF
    divergence, PSI reports where the mass moved, bin by bin —
    emitted as the per-bin contribution grid so the dashboard shows
    WHICH value range drifted (the fleet PSI is the grid's sum).
    Add-1 smoothing over the observed bin count keeps empty-side bins
    finite; the log ratio is formed as one cross-multiplied quotient
    so both engines evaluate the identical float expression, rounded
    at 1e-6 (the tfidf ladder rule).  Scale shape: the same ONE
    map-side-combined pass into the fixed centi-unit bin grid as
    dq_drift_ks, then a 1-row totals broadcast onto the bounded
    grid."""
    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    halves = ev.join(F.broadcast(b)).select(
        F.when(
            2 * F.unix_micros("ts") < F.col("t0") + F.col("t1"), 1
        )
        .otherwise(2)
        .alias("half"),
        F.expr(f"cast(round(value * 100) as bigint) div {_KS_BIN_C}").alias(
            "bin"
        ),
    )
    g = halves.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("n2"),
    )
    t = g.agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        F.count(F.lit(1)).alias("b"),
    )
    return g.join(F.broadcast(t)).select(
        "bin",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(
            (
                (F.col("n1") + 1) / (F.col("t1") + F.col("b")).cast("double")
                - (F.col("n2") + 1) / (F.col("t2") + F.col("b")).cast("double")
            )
            * F.log(
                ((F.col("n1") + 1) * (F.col("t2") + F.col("b")))
                / ((F.col("n2") + 1) * (F.col("t1") + F.col("b"))).cast(
                    "double"
                )
            ),
            6,
        ).alias("psi_contrib"),
    )


#: Candidate FD pairs to profile: (table, lhs, rhs).  Discovery over
#: every column pair is quadratic in width; a profiler shortlists
#: pairs (here: the keys and low-cardinality attributes a migration
#: actually asks about, including two exact-by-construction FDs as
#: positive controls).
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_suppkey", "l_linestatus"),
)


@query(
    "dq_functional_dependencies",
    oracle="""
    WITH pairs AS (
      SELECT 'orders' AS tbl, 'o_orderkey' AS lhs, 'o_orderstatus' AS rhs,
             cast(o_orderkey AS VARCHAR) AS a, cast(o_orderstatus AS VARCHAR) AS b
      FROM orders
      UNION ALL
      SELECT 'orders', 'o_custkey', 'o_orderpriority',
             cast(o_custkey AS VARCHAR), cast(o_orderpriority AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'l_orderkey', 'l_returnflag',
             cast(l_orderkey AS VARCHAR), cast(l_returnflag AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_partkey', 'l_suppkey',
             cast(l_partkey AS VARCHAR), cast(l_suppkey AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_suppkey', 'l_linestatus',
             cast(l_suppkey AS VARCHAR), cast(l_linestatus AS VARCHAR)
      FROM lineitem
    ),
    g AS (
      SELECT tbl, lhs, rhs, a, b, count(*)::BIGINT AS c
      FROM pairs GROUP BY 1, 2, 3, 4, 5
    ),
    m AS (
      SELECT tbl, lhs, rhs, a, max(c)::BIGINT AS mx, sum(c)::BIGINT AS tot
      FROM g GROUP BY 1, 2, 3, 4
    )
    SELECT tbl, lhs, rhs,
           sum(tot)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_lhs_distinct,
           sum(mx)::BIGINT AS n_kept,
           (sum(mx) = sum(tot)) AS fd_holds,
           round(cast(sum(mx) AS DOUBLE) / sum(tot), 6) AS confidence
    FROM m GROUP BY 1, 2, 3
    """,
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency PROFILING (the TANE/Metanome
    primitive, g3-style error): for each shortlisted column pair
    A→B, the fraction of rows kept after forcing each A-group to its
    modal B — confidence 1.0 means the FD holds exactly (the two key
    pairs are positive controls; the attribute pairs measure how far
    the fixture is from dependency).  This is the discovery audit a
    migration runs before declaring constraints the source system
    (the reference's ClickHouse tables declare none) never enforced.

    Exactness: counts all the way — the only float is the final
    ratio of two BIGINTs, identically divided and rounded both
    engines.  Scale: per pair, two partial-aggregated groupBys (the
    (A,B) agg reduces map-side; the per-A max reduces again) and a
    3-row final agg — one scan per source table feeding all its
    pairs, nothing row-expanded, the candidate list is the bounded
    driver-side dimension."""
    # ONE aggregation chain for all candidate pairs (the oracle's own
    # shape): tag each pair's (a, b) stream with its (tbl, lhs, rhs)
    # literals, union, and run a single groupBy pipeline.  The previous
    # per-pair form built 5 independent 3-stage agg chains (15 stages,
    # 5 scheduler round-trips); this is 3 partial-agg'd shuffles total
    # with the same integer arithmetic (guide §1.2 — fewer passes).
    # The candidate tag rides the two corpus-sized exchanges as ONE
    # small int (r16, guide §2.3 narrower types): the (tbl, lhs, rhs)
    # literal strings are ~30 bytes of constant per row — they decode
    # from the tag AFTER the final 5-row aggregate via a pure-JVM CASE
    # (not a createDataFrame local relation, which plans as a
    # pickled-RDD scan with its own Python-runner stage).
    parts = []
    for i, (tbl, lhs, rhs) in enumerate(_FD_CANDIDATES):
        t = table(spark, sf_dir, tbl)
        parts.append(
            t.select(
                F.lit(i).alias("p"),
                F.col(lhs).cast("string").alias("a"),
                F.col(rhs).cast("string").alias("b"),
            )
        )
    pairs = parts[0]
    for pdf in parts[1:]:
        pairs = pairs.unionByName(pdf)
    g = pairs.groupBy("p", "a", "b").agg(F.count(F.lit(1)).alias("c"))
    m = g.groupBy("p", "a").agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
    fin = m.groupBy("p").agg(
        F.sum("tot").alias("n_rows"),
        F.count(F.lit(1)).alias("n_lhs_distinct"),
        F.sum("mx").alias("n_kept"),
        (F.sum("mx") == F.sum("tot")).alias("fd_holds"),
        F.round(F.sum("mx").cast("double") / F.sum("tot"), 6).alias("confidence"),
    )

    def _decode(pos: int) -> F.Column:
        col = None
        for i, cand in enumerate(_FD_CANDIDATES):
            col = (
                F.when(F.col("p") == i, F.lit(cand[pos]))
                if col is None
                else col.when(F.col("p") == i, F.lit(cand[pos]))
            )
        return col

    return fin.select(
        _decode(0).alias("tbl"),
        _decode(1).alias("lhs"),
        _decode(2).alias("rhs"),
        "n_rows",
        "n_lhs_distinct",
        "n_kept",
        "fd_holds",
        "confidence",
    )
