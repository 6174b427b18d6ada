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

#: Derived partsupp: the fixtures ship no partsupp table, so q2/q11/
#: q16/q20 (like the q7-q9 adaptations) reconstruct one from lineitem —
#: supply cost as the cheapest observed unit price truncated to cents
#: (``floor(x*100)/100``: pure IEEE ops that are bit-identical across
#: engines, where ``round(x, 2)``'s half-tie semantics differ — Spark
#: HALF_UP vs DuckDB's nearest-double, observed flipping 4382.105 one
#: cent apart), availqty as the total shipped quantity (integral
#: doubles; exact under fp addition, cast back to BIGINT).
_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(floor(l_extendedprice / l_quantity * 100) / 100) AS ps_supplycost,
             cast(round(sum(l_quantity), 0) AS BIGINT)   AS ps_availqty
      FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _ps(li: DataFrame) -> DataFrame:
    """Spark twin of ``_PS_SQL`` (derived partsupp from lineitem)."""
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        (
            F.min(
                F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100) / 100
            ).alias("ps_supplycost")
        ),
        F.round(F.sum("l_quantity"), 0).cast("long").alias("ps_availqty"),
    )


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
    # bounded: window ranks the 10-row limit output only
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
    # bounded: window ranks the 20-row limit output only
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
    "tpch_q7",
    oracle=f"""
    SELECT shipping.supp_nation, shipping.cust_nation, shipping.l_year,
           cast(round(sum(shipping.volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             cast(year(l.l_shipdate) AS BIGINT) AS l_year,
             {_DISC_PRICE} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY shipping.supp_nation, shipping.cust_nation, shipping.l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping: bilateral trade between two nations by year.
    Both nation dims broadcast (25 rows); the nation-pair disjunction
    rides on the joined row.  Supplier (100×SF rows) broadcasts too, so
    the only shuffles are lineitem⋈orders⋈customer on their keys —
    the fact tables never reshuffle for the dims."""
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.expr(f"cast(round(sum({_DISC_PRICE}), 2) as double)").alias("revenue"))
    )


@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           cast(round(
             cast(round(sum(CASE WHEN supp_nation = 'NATION_5'
                                 THEN volume ELSE 0 END), 2) AS DOUBLE)
             / cast(round(sum(volume), 2) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT cast(year(o.o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE} AS volume,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: one supplier nation's fraction of a
    region's volume per year — the conditional-numerator / total-
    denominator ratio computed in a single aggregation pass (no
    self-join).  part/supplier/nation/region all broadcast; the ratio
    divides two exact-decimal sums rounded identically on both sides so
    the quotient is bit-stable."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(
            F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"), "left_semi"
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", F.expr(_DISC_PRICE))
        .groupBy("o_year")
        .agg(
            F.expr(
                "cast(round("
                " cast(round(sum(CASE WHEN supp_nation = 'NATION_5'"
                "                 THEN volume ELSE 0 END), 2) as double)"
                " / cast(round(sum(volume), 2) as double), 6) as double)"
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           cast(year(o.o_orderdate) AS BIGINT) AS o_year,
           cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit, adapted: the fixture has no partsupp/
    ps_supplycost, so profit is the discounted price (same join tree +
    substring part filter + nation×year rollup shape as the original).
    part filters by LIKE before its semi-join; part/supplier/nation
    broadcast, lineitem⋈orders is the only big shuffle."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(_DISC_PRICE).alias("_profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.expr("cast(round(sum(_profit), 2) as double)").alias("sum_profit"))
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: LEFT OUTER join with the
    filter INSIDE the join condition (customers with zero qualifying
    orders must survive with count 0 — a WHERE would drop them), then
    an aggregation of an aggregation.  The second agg's input is one
    row per customer, so the two shuffles shrink geometrically."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                              "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q14",
    oracle=f"""
    SELECT cast(round(100.00
             * cast(round(sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN {_DISC_PRICE} ELSE 0 END), 2) AS DOUBLE)
             / cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE), 4) AS DOUBLE)
           AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: promo share of one month's revenue.  The
    date filter prunes lineitem at the scan; part broadcasts (it is
    needed as an inner join carrying p_type, not a semi-join); one
    global conditional aggregation, ratio of exact-decimal sums."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                "cast(round(100.00"
                f" * cast(round(sum(CASE WHEN p_type = 'PROMO'"
                f"                 THEN {_DISC_PRICE} ELSE 0 END), 2) as double)"
                f" / cast(round(sum({_DISC_PRICE}), 2) as double), 4) as double)"
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_DISC_PRICE}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           cast(round(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: a reused aggregate (the revenue view feeds
    both the scalar MAX and the final join) — Spark computes it once
    per branch but the branches share the shuffle files via exchange
    reuse.  The max is a 1-row broadcast; revenue sums are exact
    decimal so the equality can't miss on float noise."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(f"sum({_DISC_PRICE})").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.expr("cast(round(total_rev, 2) as double)").alias("total_revenue"),
        )
    )


@query(
    "tpch_q17",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pk,
             sum(cast(l_quantity AS DECIMAL(12,2))) AS sq,
             count(*) AS cq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT cast(round(sum(cast(l.l_extendedprice AS DECIMAL(12,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size <= 10
      AND cast(l.l_quantity AS DECIMAL(12,2)) * 5 * pq.cq < pq.sq
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: the correlated per-part AVG
    subquery decorrelated into a grouped aggregate joined back to the
    fact.  The threshold ``qty < 0.2 * avg(qty)`` is multiplied out to
    ``5 * qty * count < sum`` over exact decimals — no double division
    whose last-ULP could flip row membership between engines.  The
    per-part aggregate is semi-joined down to the ~dozens of branded
    parts BEFORE the fact join, so both join sides broadcast."""
    li = table(spark, sf_dir, "lineitem")
    pfilt = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    pq = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.expr("sum(cast(l_quantity as decimal(12,2)))").alias("sq"),
            F.count(F.lit(1)).alias("cq"),
        )
        .join(F.broadcast(pfilt), F.col("pk") == F.col("p_partkey"), "left_semi")
    )
    return (
        li.join(F.broadcast(pq), F.col("l_partkey") == F.col("pk"))
        .filter(F.expr("cast(l_quantity as decimal(12,2)) * 5 * cq < sq"))
        .agg(
            F.expr(
                "cast(round(sum(cast(l_extendedprice as decimal(12,2))) / 7.0, 2)"
                " as double)"
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT cast(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: the canonical disjunctive-predicate
    query.  The brand/size disjuncts reference only part and the
    quantity bound ``BETWEEN 1 AND 30`` is implied by the OR of the
    three ranges, so both are applied as scan-level prefilters (part
    prunes to 3 brands, lineitem to the quantity envelope) before the
    broadcast join evaluates the exact disjunction as its residual."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    # Scan-level envelopes implied by the disjunction (Catalyst doesn't
    # derive these from an OR across tables; stating them is free).
    p = p.filter(
        F.col("p_brand").isin("Brand#2", "Brand#13", "Brand#24")
        & (F.col("p_size") <= 15)
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    disj = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), (F.col("l_partkey") == F.col("p_partkey")) & disj)
        .agg(F.expr(f"cast(round(sum({_DISC_PRICE}), 2) as double)").alias("revenue"))
    )


@query(
    "tpch_q22",
    oracle="""
    WITH stats AS (
      SELECT sum(cast(c_acctbal AS DECIMAL(12,2))) AS sbal, count(*) AS cbal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, count(*) AS numcust,
           cast(round(sum(cast(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN stats
    WHERE cast(c.c_acctbal AS DECIMAL(12,2)) * stats.cbal > stats.sbal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity, adapted: rich-but-lapsed customers
    (above-average positive balance, no orders since 2000) per nation —
    the fixture has no phone prefix, and every customer has *some*
    order, so the inactivity predicate is date-bounded to keep the
    result non-empty.  The global average threshold is a 1-row
    broadcast cross join, compared multiplied-out over exact decimals
    (``bal * count > sum``); the no-recent-orders predicate is a
    left-anti join whose date filter reaches the orders scan; nation
    broadcasts."""
    c = table(spark, sf_dir, "customer")
    stats = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.expr("sum(cast(c_acctbal as decimal(12,2)))").alias("sbal"),
            F.count(F.lit(1)).alias("cbal"),
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = table(spark, sf_dir, "nation")
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.expr("cast(c_acctbal as decimal(12,2)) * cbal > sbal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(
                "cast(round(sum(cast(c_acctbal as decimal(12,2))), 2) as double)"
            ).alias("totacctbal"),
        )
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


@query(
    "tpch_q21",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    ordstats AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM lo GROUP BY l_orderkey
    ),
    qual AS (
      SELECT lo.l_suppkey
      FROM lo JOIN ordstats USING (l_orderkey)
      WHERE lo.late AND ordstats.n_supp >= 2 AND ordstats.n_late_supp = 1
    ),
    counted AS (
      SELECT s.s_name, count(*) AS numwait
      FROM qual JOIN supplier s ON qual.l_suppkey = s.s_suppkey
      GROUP BY s.s_name
    )
    SELECT s_name, numwait,
           row_number() OVER (ORDER BY numwait DESC, s_name) AS rn
    FROM counted
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers-who-kept-waiting, adapted like q4: "late" is
    l_shipdate > o_orderdate + 45 days (no commit/receipt dates in the
    fixture).  The classic double-correlated EXISTS / NOT EXISTS is
    decorrelated BY HAND into one per-order aggregate — n_supp ≥ 2
    replaces the EXISTS (another supplier in the order), n_late_supp = 1
    replaces the NOT EXISTS (no OTHER late supplier, given this row is
    late) — so the whole query is two shuffles on orderkey (join + agg,
    sharing partitioning) plus the small supplier broadcast, instead of
    two more self-joins of lineitem.  Top-100 cut via
    TakeOrderedAndProject; rn materialized for the order-insensitive
    hash."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o.select("o_orderkey", "o_orderdate"),
                 li.l_orderkey == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias(
            "late"
        ),
    )
    ordstats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    qual = (
        lo.filter(F.col("late"))
        .join(ordstats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    counted = (
        qual.join(F.broadcast(s), qual.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    from pyspark.sql.window import Window

    top = counted.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(100)
    # bounded: window ranks the 100-row limit output only
    w = Window.orderBy(F.col("numwait").desc(), F.col("s_name"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


@query(
    "tpch_q2",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    euro AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ),
    cheapest AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM euro GROUP BY ps_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost, rn
    FROM (
      SELECT euro.s_acctbal, euro.s_name, euro.n_name,
             p.p_partkey, p.p_name, euro.ps_supplycost AS cost,
             row_number() OVER (ORDER BY euro.s_acctbal DESC, euro.n_name,
                                euro.s_name, euro.ps_partkey) AS rn
      FROM euro
      JOIN cheapest ch ON ch.ps_partkey = euro.ps_partkey
                      AND euro.ps_supplycost = ch.min_cost
      JOIN part p ON p.p_partkey = euro.ps_partkey
      WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    ) t
    WHERE rn <= 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (adapted: derived partsupp, p_type
    equality instead of LIKE %BRASS — the fixture's p_type is a flat
    6-value enum).  The classic correlated MIN subquery is decorrelated
    into a per-part aggregate over the region-scoped supplier pool and
    joined back on cost equality — both sides compute the SAME
    element-wise-rounded min, so the equality is exact.  Scale shape:
    supplier/nation/region broadcast (tiny dims), the derived-partsupp
    aggregate is the only fact shuffle, the min-cost aggregate re-uses
    its partitioning, and the final top-100 is
    orderBy().limit() -> TakeOrderedAndProject, never a global-window
    funnel."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    euro = (
        _ps(li)
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    cheapest = euro.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    hit = (
        euro.join(
            cheapest,
            (euro.ps_partkey == cheapest.ps_partkey)
            & (euro.ps_supplycost == cheapest.min_cost),
        )
        .drop(cheapest.ps_partkey)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
    )
    order = [
        F.col("s_acctbal").desc(),
        F.col("n_name").asc(),
        F.col("s_name").asc(),
        F.col("ps_partkey").asc(),
    ]
    top = hit.orderBy(*order).limit(100)
    # bounded: window ranks the 100-row limit output only
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_supplycost").alias("cost"), "rn",
        )
    )


@query(
    "tpch_q11",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    scoped AS (
      SELECT ps.ps_partkey,
             cast(ps.ps_supplycost AS DECIMAL(12,2)) * ps.ps_availqty AS val
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
                     AND n.n_name = 'NATION_7'
    ),
    sums AS (SELECT ps_partkey, sum(val) AS sval FROM scoped GROUP BY ps_partkey),
    tot  AS (SELECT sum(val) AS t FROM scoped)
    SELECT ps_partkey, cast(round(sval, 2) AS DOUBLE) AS value
    FROM sums CROSS JOIN tot
    WHERE sval * 1000 > t
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (adapted: derived partsupp, fixture nation
    name): per-part inventory value for one nation's suppliers, kept
    only when above 0.1% of that nation's total.  The global-total
    scalar is a 1-row broadcast cross join and the HAVING threshold is
    multiplied out over exact decimals (``sval * 1000 > t``) — the
    q17/q22 convention, so row membership can't flip on a double's last
    ULP.  One fact shuffle (the partsupp aggregate), the per-part and
    global sums reuse it; nation/supplier broadcast."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    scoped = (
        _ps(li)
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            F.expr("cast(ps_supplycost as decimal(12,2)) * ps_availqty").alias("val"),
        )
    )
    sums = scoped.groupBy("ps_partkey").agg(F.sum("val").alias("sval"))
    tot = scoped.agg(F.sum("val").alias("t"))
    return (
        sums.crossJoin(F.broadcast(tot))
        .filter(F.expr("sval * 1000 > t"))
        .select(
            "ps_partkey", F.expr("cast(round(sval, 2) as double)").alias("value")
        )
    )


@query(
    "tpch_q16",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#15'
      AND p.p_type  <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship (adapted: derived partsupp; the
    fixture has no s_comment, so the classic complaints exclusion is
    dropped).  COUNT(DISTINCT supplier) per (brand, type, size) bucket
    over the negated-predicate part scan — brand/type/size filters push
    to the part scan, part broadcasts into the derived-partsupp
    aggregate, and the distinct count is the standard two-phase
    partial/final expand."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        _ps(li)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             cast(round(sum(l_quantity), 0) AS BIGINT) AS qty97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           cast(round(s.s_acctbal, 2) AS DOUBLE) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'small%'
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 2 * sh.qty97
    )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion (adapted: derived partsupp — stock
    is total shipped quantity, so the classic ``availqty > 0.5 *
    year_qty`` is re-tuned to ``availqty > 2 * qty97``, which over the
    fixture's ~7-year shipping span selects (part, supplier) pairs
    whose 1997 volume under-indexes their stock; both sides are exact
    BIGINTs so the comparison can't tie on float noise).  Shape:
    part-name filter pushes to the part scan and broadcasts; the
    derived-partsupp and 1997-shipment aggregates share the same
    (partkey, suppkey) shuffle key; the supplier membership test is a
    left-semi join."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 0).cast("long").alias("qty97"))
    )
    keep = (
        _ps(li)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty97"))
        .select("ps_suppkey")
    )
    return (
        s.join(keep, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select(
            "s_suppkey",
            "s_name",
            F.expr("cast(round(s_acctbal, 2) as double)").alias("s_acctbal"),
        )
    )
