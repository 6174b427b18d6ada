"""Classic TPC-H-shaped benchmark queries over the driver fixtures.

The operator inventory (SURVEY §2.B) covers each relational operator
in isolation; these four put them together in the canonical analytics
shapes an end user actually runs — pricing summary (Q1), shipping
priority (Q3), forecast revenue (Q6), large-volume customers (Q18).
All money arithmetic goes through exact DECIMAL before the final
round: double partial-sum order differs between engines and flips
.005 ties (the repo-wide convention, see relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

#: Exact decimal money expressions (shared Spark/DuckDB shapes).
_DISC_PRICE = (
    "cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(4,2)))"
)
_CHARGE = f"{_DISC_PRICE} * (1 + cast(l_tax as decimal(4,2)))"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                     AS sum_qty,
           round(sum(l_extendedprice), 2)                AS sum_base_price,
           cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE)  AS sum_disc_price,
           cast(round(sum({_CHARGE}), 2) AS DOUBLE)      AS sum_charge,
           round(avg(l_quantity), 4)                     AS avg_qty,
           round(avg(l_extendedprice), 4)                AS avg_price,
           round(avg(l_discount), 6)                     AS avg_disc,
           count(*)                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one wide partial+final hash agg over the
    fact table — the canonical scan-dominated aggregation."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.expr(f"cast(round(sum({_DISC_PRICE}), 2) as double)").alias("sum_disc_price"),
        F.expr(f"cast(round(sum({_CHARGE}), 2) as double)").alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority,
           row_number() OVER (ORDER BY sum({_DISC_PRICE}) DESC, l.l_orderkey) AS rn
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    QUALIFY rn <= 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: selective dim filter → two fact joins →
    agg → top-10.  The top-10 cut is ``orderBy().limit(10)`` — plans as
    TakeOrderedAndProject (each partition keeps 10 rows, no global
    sort/shuffle) — and only the 10 survivors are ranked, so no
    partition-less WindowExec ever sees the full aggregate (the r2
    verdict's scale wart).  Exact decimal sums + orderkey tie-break
    keep the ordering deterministic for the order-insensitive hash."""
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"sum({_DISC_PRICE})").alias("_rev"))
    )
    top = agg.orderBy(F.col("_rev").desc(), F.col("l_orderkey").asc()).limit(10)
    w = Window.orderBy(F.col("_rev").desc(), F.col("l_orderkey").asc())
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .select(
            "l_orderkey",
            F.expr("cast(round(_rev, 2) as double)").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
            "rn",
        )
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT cast(round(sum(cast(l_extendedprice AS DECIMAL(12,2))
                          * cast(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: pure filter + global agg; every predicate
    must reach the parquet scan (the pushdown benchmark)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "cast(round(sum(cast(l_extendedprice as decimal(12,2))"
                " * cast(l_discount as decimal(4,2))), 2) as double)"
            ).alias("revenue")
        )
    )


@query(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 212
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: self-referencing semi-join (orders
    whose lineitems exceed a quantity threshold) feeding a 3-way join +
    re-aggregation — the classic agg-then-join-back shape."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 212)
        .select("l_orderkey")
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey_b"),
               F.col("o_orderkey") == F.col("o_orderkey_b"), "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking, adapted to the fixture schema: the
    driver's lineitem has no commit/receipt dates, so the EXISTS
    predicate is "shipped more than 45 days after ordering" (same
    correlated-EXISTS-with-inequality shape).  Plans as a left-semi
    join on orderkey with the date inequality as a residual — one
    shuffle, no row duplication before the agg."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name, cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: the 6-way join.  supplier/nation/region
    are dimension-sized at every SF (fixed 25 nations / 5 regions;
    suppliers scale but stay ~1e4× smaller than lineitem), so all three
    broadcast — the only shuffles are customer⋈orders⋈lineitem on their
    keys.  The c_nationkey = s_nationkey equality ("local supplier")
    rides as a residual on the broadcast supplier join."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"), "left_semi")
        .groupBy("n_name")
        .agg(F.expr(f"cast(round(sum({_DISC_PRICE}), 2) as double)").alias("revenue"))
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name,
           row_number() OVER (ORDER BY sum({_DISC_PRICE}) DESC, c.c_custkey) AS rn
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    QUALIFY rn <= 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by returned
    revenue in a quarter.  Same top-k discipline as q3: aggregate,
    ``orderBy().limit(20)`` (TakeOrderedAndProject — each partition
    keeps 20), then rank only the 20 survivors; nation broadcasts."""
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(f"sum({_DISC_PRICE})").alias("_rev"))
    )
    top = agg.orderBy(F.col("_rev").desc(), F.col("c_custkey").asc()).limit(20)
    w = Window.orderBy(F.col("_rev").desc(), F.col("c_custkey").asc())
    return top.withColumn("rn", F.row_number().over(w).cast("long")).select(
        "c_custkey",
        "c_name",
        F.expr("cast(round(_rev, 2) as double)").alias("revenue"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "n_name",
        "rn",
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_linestatus = 'F'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority, adapted: the fixture lineitem has no
    l_shipmode, so finished-status lineitems group by l_returnflag and
    the conditional counts split orders into high/low priority — the
    same join + conditional-aggregation shape.  Both filters reach the
    lineitem scan; the orders side prunes to two columns."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linestatus") == "F")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
