"""Event-funnel and cohort analytics — the queries the reference's
sink tables exist to serve (README.md "events analytics"; the events
table mirrors A2's generated stream landed by A11's sink).

Both queries are pure relational compositions (filtered aggregations +
joins on user_id), so they inherit the engine's scale properties:
partial+final aggs, broadcastable intermediate results, no windows
without partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-stage ordered funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first click.  Each
    stage is a filtered min-agg on user_id joined to the previous
    stage — the ordering constraint rides the join predicate, so the
    whole funnel is three partial+final aggs sharing one shuffle key,
    no per-user event sorting or windowing."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT epoch_us(c.cohort_week)::BIGINT AS cohort_week_us,
           date_diff('week', c.cohort_week, date_trunc('week', e.ts))::BIGINT AS offset_weeks,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted distinct in each subsequent activity week.  The cohort
    table is users-sized (≪ events) so its join back to events
    broadcasts; the matrix is (weeks × weeks) — tiny at any SF."""
    ev = table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            (
                F.floor(
                    F.datediff(
                        F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                    )
                    / 7
                )
            ).cast("long").alias("offset_weeks"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


@query(
    "events_top_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_top_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user (the "what do users do next" sequence-mining primitive).
    One window shuffle partitioned by user_id (well-distributed keys),
    then a hash agg on the tiny type×type matrix; ordering ties break
    on event_id so the lag is deterministic."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_rolling_dau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    expanded AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY)) AS obs_day,
             user_id, day
      FROM du
    )
    SELECT epoch_us(obs_day)::BIGINT AS day_us,
           count(DISTINCT CASE WHEN day = obs_day THEN user_id END) AS dau,
           count(DISTINCT user_id) AS active_7d
    FROM expanded
    GROUP BY 1
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day distinct active users.  Rolling COUNT
    DISTINCT can't ride a window frame, and the naive day×activity
    range join is O(days × rows); instead each (day, user) pair
    explodes into the ≤7 observation days it contributes to — a
    bounded 7× map-side expansion followed by one distinct-agg shuffle,
    which is the formulation that survives a 1000-executor corpus."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    expanded = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("obs_day"),
        "user_id",
        "day",
    )
    return (
        expanded.groupBy(F.unix_micros("obs_day").alias("day_us"))
        .agg(
            F.count_distinct(
                F.when(F.col("day") == F.col("obs_day"), F.col("user_id"))
            ).cast("long").alias("dau"),
            F.count_distinct("user_id").cast("long").alias("active_7d"),
        )
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)             AS n_users,
           count(DISTINCT date_trunc('day', ts)) AS n_days,
           count(*)                            AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) over different columns in one
    aggregation — plans through Spark's Expand operator (each input row
    fans out once per distinct-column group, then two-level agg), the
    one-pass alternative to self-joining per distinct column."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count_distinct(F.date_trunc("day", F.col("ts"))).cast("long").alias(
            "n_days"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, value,
             count(*)                       OVER w AS n,
             cast(sum(cast(value AS DECIMAL(14,4)))          OVER w AS DOUBLE) AS s,
             cast(sum(cast(value AS DECIMAL(14,4))
                      * cast(value AS DECIMAL(14,4)))        OVER w AS DOUBLE) AS ss
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           round((value - (s / n))
                 / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12), 4) AS z,
           (abs((value - (s / n))
                / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12)) > 2.0) AS is_anomaly
    FROM f WHERE n >= 5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: each event's z-score against
    its user's trailing 21-event frame, flagged at |z| > 2 — the
    streaming-adjacent outlier primitive of a metrics pipeline (the
    batch twin of a stateful detector).  The frame's mean/std come from
    exact-DECIMAL windowed sums (count / Σx / Σx²): sliding-window
    float accumulation is engine-specific (subtract-on-evict vs rescan
    re-associate the additions), so the sufficient statistics must be
    exact before the one double-precision closed form.  The n >= 5
    guard drops cold-start frames where std is noise.  Scale: one
    shuffle on user_id, O(frame) state during the sorted scan."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, Window.currentRow)
    )
    dec = "cast(value as decimal(14,4))"
    f = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.expr(f"sum({dec})").over(w).cast("double").alias("s"),
        F.expr(f"sum({dec} * {dec})").over(w).cast("double").alias("ss"),
    )
    z = F.expr(
        "round((value - (s / n)) / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12), 4)"
    )
    flag = F.expr(
        "abs((value - (s / n)) / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12)) > 2.0"
    )
    return (
        f.filter(F.col("n") >= 5)
        .select("event_id", "user_id", z.alias("z"), flag.alias("is_anomaly"))
    )


@query(
    "events_pareto_users",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             cast(sum(cast(value AS DECIMAL(14,4))) AS DOUBLE) AS user_value
      FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, user_id, user_value,
             row_number() OVER w AS rk,
             cast(sum(cast(user_value AS DECIMAL(18,4))) OVER (
               PARTITION BY event_type ORDER BY user_value DESC, user_id
               ROWS UNBOUNDED PRECEDING) AS DOUBLE)           AS cum_value,
             cast(sum(cast(user_value AS DECIMAL(18,4))) OVER (
               PARTITION BY event_type) AS DOUBLE)            AS tot_value,
             count(*) OVER (PARTITION BY event_type)          AS n_users
      FROM per_user
      WINDOW w AS (PARTITION BY event_type ORDER BY user_value DESC, user_id)
    )
    SELECT event_type,
           min(rk)                      AS top_users_for_half,
           max(n_users)                 AS n_users,
           round(min(rk) / cast(max(n_users) AS DOUBLE), 4) AS user_fraction
    FROM ranked
    WHERE cum_value >= tot_value / 2
    GROUP BY event_type
    """,
)
def events_pareto_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: per event type, how few top users account
    for half the total value — the 80/20 diagnostic every usage
    pipeline reports.  Users rank per type (partitioned window, never
    global) with a deterministic value-then-id order; the running and
    total sums go through DECIMAL so cumulative float drift can't move
    the crossing row; the answer is min(rank) past the half-total
    line.  Scale: one agg shuffle to per-user rows, one window shuffle
    on event_type; output is O(event types)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.expr("cast(sum(cast(value as decimal(14,4))) as double)").alias(
            "user_value"
        )
    )
    order = [F.col("user_value").desc(), F.col("user_id").asc()]
    w = Window.partitionBy("event_type").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("event_type")
    dv = F.expr("cast(user_value as decimal(18,4))")
    ranked = per_user.select(
        "event_type",
        F.row_number().over(w).alias("rk"),
        F.sum(dv).over(wrun).cast("double").alias("cum_value"),
        F.sum(dv).over(wall).cast("double").alias("tot_value"),
        F.count(F.lit(1)).over(wall).alias("n_users"),
    )
    return (
        ranked.filter(F.col("cum_value") >= F.col("tot_value") / 2)
        .groupBy("event_type")
        .agg(
            F.min("rk").cast("long").alias("top_users_for_half"),
            F.max("n_users").alias("n_users"),
            F.round(
                F.min("rk") / F.max("n_users").cast("double"), 4
            ).alias("user_fraction"),
        )
    )


# ------------------------------------------------- round-5b additions

@query(
    "stat_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, date_part('dow', ts) AS dow, count(*) AS n
      FROM events GROUP BY event_type, date_part('dow', ts)
    ),
    rm AS (SELECT event_type, sum(n) AS rn FROM cells GROUP BY event_type),
    cm AS (SELECT dow, sum(n) AS cn FROM cells GROUP BY dow),
    tot AS (SELECT sum(n) AS t FROM cells)
    SELECT round(sum((c.n - (rm.rn * cm.cn / cast(tot.t AS DOUBLE)))
                     * (c.n - (rm.rn * cm.cn / cast(tot.t AS DOUBLE)))
                     / (rm.rn * cm.cn / cast(tot.t AS DOUBLE))), 6) AS chi2,
           cast(((SELECT count(*) FROM rm) - 1)
                * ((SELECT count(*) FROM cm) - 1) AS BIGINT)        AS dof,
           cast(max(tot.t) AS BIGINT) AS n_total
    FROM cells c
    JOIN rm ON c.event_type = rm.event_type
    JOIN cm ON c.dow = cm.dow
    CROSS JOIN tot
    """,
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for independence of event_type ×
    day-of-week — the contingency-table significance test behind every
    "is traffic mix shifting by weekday" dashboard.  Margins and cell
    counts are exact integers; only the expected-count division is
    float, and the final sum runs over ≤ |types|×7 cells, so round(6)
    is beyond any association noise.  Plan: one (type, dow) agg on the
    facts, then two margin aggs over the CELLS (already tiny), all
    joined broadcast — the raw events are touched exactly once.
    Day-of-week is date_part('dow') in DuckDB (0=Sunday) and Spark's
    dayofweek()-1 (also 0=Sunday after the shift)."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("double").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    cells = cells.persist()
    rm = cells.groupBy("event_type").agg(F.sum("n").alias("rn"))
    cm = cells.groupBy("dow").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("t"))
    n_rows = rm.agg(F.count(F.lit(1)).alias("nr"))
    n_cols = cm.agg(F.count(F.lit(1)).alias("nc"))
    joined = (
        cells.join(F.broadcast(rm), "event_type")
        .join(F.broadcast(cm), "dow")
        .join(F.broadcast(tot))
        .withColumn("e", F.col("rn") * F.col("cn") / F.col("t").cast("double"))
    )
    return (
        joined.agg(
            F.round(
                F.sum((F.col("n") - F.col("e")) * (F.col("n") - F.col("e")) / F.col("e")),
                6,
            ).alias("chi2"),
            F.max("t").alias("n_total"),
        )
        .join(F.broadcast(n_rows))
        .join(F.broadcast(n_cols))
        .select(
            "chi2",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            "n_total",
        )
    )


@query(
    "stat_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE)         AS s1,
             cast(sum(cast(value AS DECIMAL(24,10))
                      * cast(value AS DECIMAL(24,10))) AS DOUBLE)       AS s2
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM g
    )
    SELECT round(a.mean - b.mean, 6)                                   AS mean_diff,
           round((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 6)                 AS t_stat,
           round(((a.var / a.n + b.var / b.n)
                  * (a.var / a.n + b.var / b.n))
                 / ((a.var / a.n) * (a.var / a.n) / (a.n - 1)
                    + (b.var / b.n) * (b.var / b.n) / (b.n - 1)), 4)   AS welch_df,
           a.n AS n_view, b.n AS n_purchase
    FROM m a CROSS JOIN m b
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic comparing `value` between
    view and purchase events, with the Welch–Satterthwaite degrees of
    freedom — the A/B-test primitive.  Moment sums (Σx, Σx²) go
    through DECIMAL so partial-sum order is irrelevant; everything
    after is arithmetic on two 1-row sides.  Plan: one filtered agg
    with map-side combine, then a 2×2 broadcast self-pair — the events
    table is scanned once."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    dv = "cast(value as decimal(24,10))"
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"cast(sum({dv}) as double)").alias("s1"),
        F.expr(f"cast(sum({dv} * {dv}) as double)").alias("s2"),
    )
    m = g.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = m.filter(F.col("event_type") == "view").select(
        F.col("n").alias("n_view"), F.col("mean").alias("ma"), F.col("var").alias("va")
    )
    b = m.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_purchase"),
        F.col("mean").alias("mb"),
        F.col("var").alias("vb"),
    )
    sa = F.col("va") / F.col("n_view")
    sb = F.col("vb") / F.col("n_purchase")
    return (
        a.join(F.broadcast(b))
        .select(
            F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
            F.round((F.col("ma") - F.col("mb")) / F.sqrt(sa + sb), 6).alias("t_stat"),
            F.round(
                ((sa + sb) * (sa + sb))
                / (sa * sa / (F.col("n_view") - 1) + sb * sb / (F.col("n_purchase") - 1)),
                4,
            ).alias("welch_df"),
            "n_view",
            "n_purchase",
        )
    )


@query(
    "events_ewma",
    oracle="""
    WITH serie AS (
      SELECT user_id,
             list(cast(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(vals) AS n_obs,
           round(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
             AS ewma
    FROM serie
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (α=0.3) of the
    value series, seeded at the first observation — the classic
    smoothing primitive ClickHouse ships as exponentialMovingAverage.
    The fold is a higher-order aggregate() over the per-user series
    (collected + array_sorted by (ts, event_id) so ties are
    deterministic), with a NULL seed + coalesce so the first element
    seeds the accumulator — identical left-fold order to DuckDB's
    list_reduce, and since 0.3·x+0.7·acc is pure IEEE mul/add both
    engines produce bit-identical doubles.  Scale: state is one double
    per user inside codegen; series are bounded by per-user event
    counts; one agg shuffle total.  (A streaming twin would be
    applyInPandasWithState — see streaming/stateful.py.)"""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, value))),"
                " s -> cast(s.value as double))"
            ).alias("vals")
        )
        .select(
            "user_id",
            F.size("vals").cast("long").alias("n_obs"),
            F.round(
                F.expr(
                    "aggregate(vals, cast(null as double),"
                    " (acc, x) -> coalesce(0.3 * x + 0.7 * acc, x))"
                ),
                6,
            ).alias("ewma"),
        )
    )


@query(
    "events_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, cast(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - cast(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, count(*) AS len
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           max(len)                      AS longest_streak,
           count(*)                      AS n_streaks,
           cast(sum(len) AS BIGINT)      AS n_active_days
    FROM streaks GROUP BY user_id
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per
    user.  The classic trick — day minus its per-user row_number is
    constant within a consecutive run — turns streak detection into
    two partitioned aggregations, no self-join, no iteration.  All
    windows are partitioned by user_id; day-grain distinct keeps state
    per user bounded by the calendar.  Exact integer/date arithmetic
    only."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    isl = days.withColumn(
        "island", F.expr("date_sub(day, cast(row_number() over"
                         " (partition by user_id order by day) as int))")
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
    )


@query(
    "orders_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS recency_days,
             count(*) AS frequency,
             cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(recency_days, 0.5)  AS r_med,
             quantile_cont(frequency,   0.5)   AS f_med,
             quantile_cont(monetary,    0.5)   AS m_med
      FROM rfm
    )
    SELECT (CASE WHEN recency_days <= r_med THEN 2 ELSE 1 END) AS r_score,
           (CASE WHEN frequency   >  f_med THEN 2 ELSE 1 END)  AS f_score,
           (CASE WHEN monetary    >  m_med THEN 2 ELSE 1 END)  AS m_score,
           count(*) AS n_customers,
           round(avg(monetary), 4) AS avg_monetary,
           round(avg(frequency), 6) AS avg_frequency
    FROM rfm CROSS JOIN cuts
    GROUP BY 1, 2, 3
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with
    median splits — the marketing-analytics staple.  Per-customer RFM
    is one agg over orders (monetary through DECIMAL so sum order
    can't drift); the three median cut points are a single exact
    percentile over the ALREADY-AGGREGATED per-customer table (one row
    per customer, orders of magnitude smaller than the facts) and ride
    a broadcast join back — no global window over anything fact-sized,
    no driver collect.  Both engines use percentile_cont interpolation
    on identical doubles, so the cuts are bit-identical; segment
    counts/averages are then exact.  Output is ≤8 segment rows."""
    o = table(spark, sf_dir, "orders")
    max_date = o.agg(F.max("o_orderdate").alias("gmax"))
    rfm = (
        o.join(F.broadcast(max_date))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("gmax"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,4))) as double)"
            ).alias("monetary"),
        )
    )
    cuts = rfm.agg(
        F.expr("percentile(recency_days, 0.5)").alias("r_med"),
        F.expr("percentile(frequency, 0.5)").alias("f_med"),
        F.expr("percentile(monetary, 0.5)").alias("m_med"),
    )
    return (
        rfm.join(F.broadcast(cuts))
        .select(
            F.when(F.col("recency_days") <= F.col("r_med"), 2).otherwise(1).alias("r_score"),
            F.when(F.col("frequency") > F.col("f_med"), 2).otherwise(1).alias("f_score"),
            F.when(F.col("monetary") > F.col("m_med"), 2).otherwise(1).alias("m_score"),
            "monetary",
            "frequency",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
            F.round(F.avg("frequency"), 6).alias("avg_frequency"),
        )
    )


@query(
    "stat_ks_binned",
    oracle="""
    WITH bounds AS (
      SELECT min(value) AS lo, max(value) AS hi FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    binned AS (
      SELECT least(99, cast(floor((value - lo) / ((hi - lo) / 100.0))
                           AS INTEGER)) AS bin,
             event_type
      FROM events CROSS JOIN bounds
      WHERE event_type IN ('view', 'purchase')
    ),
    cells AS (
      SELECT bin,
             count(*) FILTER (WHERE event_type = 'view')     AS nv,
             count(*) FILTER (WHERE event_type = 'purchase') AS np
      FROM binned GROUP BY bin
    ),
    cdf AS (
      SELECT bin,
             sum(nv) OVER (ORDER BY bin) AS cv,
             sum(np) OVER (ORDER BY bin) AS cp,
             (SELECT sum(nv) FROM cells) AS tv,
             (SELECT sum(np) FROM cells) AS tp
      FROM cells
    )
    SELECT round(max(abs(cv / cast(tv AS DOUBLE)
                         - cp / cast(tp AS DOUBLE))), 6) AS ks_d,
           cast(max(tv) AS BIGINT) AS n_view,
           cast(max(tp) AS BIGINT) AS n_purchase
    FROM cdf
    """,
)
def stat_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the `value`
    distributions of view vs purchase events, computed exactly on a
    100-bin grid (the binned CDF makes the statistic scale-safe: the
    only ordered window runs over ≤100 bin rows — bounded by
    construction — where the textbook form would need a global sort of
    every observation).  Bin edges derive from one min/max scalar
    broadcast; counts are exact integers; the single division happens
    at the end, round(6).  One scan, one tiny agg, one 100-row
    window."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.join(F.broadcast(bounds)).select(
        F.least(
            F.lit(99),
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 100.0))
            .cast("int"),
        ).alias("bin"),
        "event_type",
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("nv"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
    )
    tot = cells.agg(F.sum("nv").alias("tv"), F.sum("np").alias("tp"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = cells.join(F.broadcast(tot)).select(
        F.sum("nv").over(wb).alias("cv"),
        F.sum("np").over(wb).alias("cp"),
        "tv",
        "tp",
    )
    return cdf.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("cv") / F.col("tv").cast("double")
                    - F.col("cp") / F.col("tp").cast("double")
                )
            ),
            6,
        ).alias("ks_d"),
        F.max("tv").cast("long").alias("n_view"),
        F.max("tp").cast("long").alias("n_purchase"),
    )


@query(
    "agg_median_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*)             AS n,
           round(max(m.med), 6) AS median,
           round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
           round(quantile_cont(abs(e.value - m.med), 0.5) * 1.4826, 6)
             AS sigma_robust
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def agg_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type, plus the 1.4826·MAD
    robust sigma — the outlier-immune spread estimate every anomaly
    pipeline should prefer over stddev (one fat-tailed day wrecks a
    z-score; the MAD shrugs).  Two passes over events: exact median
    per type (tiny result, broadcast back), then the median of
    absolute deviations.  Both engines interpolate percentile_cont on
    identical doubles, so the cuts agree bit-for-bit before round(6).
    Scale: each pass is one partial+final agg keyed on event_type;
    the broadcast is |types| rows.  (events_anomaly_zscore is the
    mean/σ cousin; pipeline_outlier_iqr the quartile one.)"""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 6).alias("median"),
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"),
            F.round(
                F.expr("percentile(abs(value - med), 0.5)") * 1.4826, 6
            ).alias("sigma_robust"),
        )
    )


@query(
    "stat_autocorr_lag",
    oracle="""
    WITH bounds AS (
      SELECT min(date_trunc('day', ts)) AS d0,
             max(date_trunc('day', ts)) AS d1
      FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY)) AS day
    ),
    byday AS (
      SELECT date_trunc('day', ts) AS day,
             cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE) AS total
      FROM events GROUP BY date_trunc('day', ts)
    ),
    daily AS (
      SELECT d.day, coalesce(b.total, 0.0) AS total
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    lags AS (SELECT unnest([1, 7]) AS lag_k),
    pairs AS (
      SELECT l.lag_k, a.total AS x, b.total AS y
      FROM daily a
      JOIN lags l ON TRUE
      JOIN daily b ON b.day = a.day + to_days(l.lag_k)
    ),
    s AS (
      SELECT lag_k, count(*) AS n,
             cast(sum(cast(x AS DECIMAL(24,8))) AS DOUBLE)     AS sx,
             cast(sum(cast(y AS DECIMAL(24,8))) AS DOUBLE)     AS sy,
             cast(sum(cast(x * y AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
             cast(sum(cast(x * x AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
             cast(sum(cast(y * y AS DECIMAL(30,8))) AS DOUBLE) AS syy
      FROM pairs GROUP BY lag_k
    )
    SELECT lag_k, n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS autocorr
    FROM s
    """,
)
def stat_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily total-value series
    — the seasonality detector (a strong lag-7 says weekly cycle; a
    high lag-1 says momentum) behind every forecasting pipeline's
    sanity check.  The series is day-grain (calendar-bounded); lagged
    pairs come from an equi-join of the series to itself shifted by k
    days — co-partitioned join on day, NO ordered window at all — and
    the Pearson moments go through DECIMAL.  Daily totals are
    decimal-exact first, so both engines correlate identical doubles.
    Scale: one corpus-sized agg to day grain; everything after is
    days×lags rows."""
    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the seasonal-decompose discipline): the lagged
    # equi-join is calendar-keyed, so a quiet day does not MISALIGN
    # pairs — but it silently drops two real (zero-volume) samples per
    # lag, biasing the correlation; zero-fill keeps every calendar pair
    b = ev.agg(
        F.min(F.date_trunc("day", "ts")).alias("d0"),
        F.max(F.date_trunc("day", "ts")).alias("d1"),
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr("cast(sum(cast(value as decimal(24,10))) as double)").alias("t0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("t0", F.lit(0.0)).alias("total")
    )
    lags = spark.createDataFrame([(1,), (7,)], "lag_k int")
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(F.broadcast(lags))
        .join(
            b,
            F.col("b.day")
            == F.col("a.day") + F.col("lag_k") * F.expr("INTERVAL 1 DAY"),
        )
        .select("lag_k", F.col("a.total").alias("x"), F.col("b.total").alias("y"))
    )
    s = pairs.groupBy("lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("cast(sum(cast(x as decimal(24,8))) as double)").alias("sx"),
        F.expr("cast(sum(cast(y as decimal(24,8))) as double)").alias("sy"),
        F.expr("cast(sum(cast(x * y as decimal(30,8))) as double)").alias("sxy"),
        F.expr("cast(sum(cast(x * x as decimal(30,8))) as double)").alias("sxx"),
        F.expr("cast(sum(cast(y * y as decimal(30,8))) as double)").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select("lag_k", "n", F.round(num / den, 6).alias("autocorr"))


@query(
    "events_window_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s2.t2 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    depth AS (
      SELECT s1.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS depth
      FROM s1
      LEFT JOIN s2 ON s1.user_id = s2.user_id
      LEFT JOIN s3 ON s1.user_id = s3.user_id
    )
    SELECT depth, count(*) AS n_users
    FROM depth GROUP BY depth
    """,
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (ClickHouse's windowFunnel, the analytics
    aggregate the reference's sink dialect ships): view → click →
    purchase where every later step lands within 24 h of the FIRST
    step, each strictly after the previous — users counted by the
    deepest step reached.  Same decomposition as events_funnel (one
    filtered min-agg per step, the window constraint riding the join
    predicate) so the whole funnel is three partial+final aggs sharing
    the user_id shuffle key — no per-user event sorting, no state
    machine, and left joins on user-grain tables for the depth roll."""
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    depth = (
        s1.join(s2.select("user_id", F.lit(1).alias("_s2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("_s3")), "user_id", "left")
        .select(
            F.when(F.col("_s3").isNotNull(), 3)
            .when(F.col("_s2").isNotNull(), 2)
            .otherwise(1)
            .alias("depth")
        )
    )
    return depth.groupBy("depth").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_sequence_match",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type,
             lead(ts)         OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_ts
      FROM events
    )
    SELECT count(*)                                        AS n_adjacent,
           count(DISTINCT user_id)                         AS n_users,
           cast(count(*) FILTER (
             WHERE next_ts <= ts + INTERVAL 1 HOUR) AS BIGINT) AS n_within_1h
    FROM seq
    WHERE event_type = 'click' AND next_type = 'purchase'
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-adjacency sequence match (ClickHouse sequenceMatch's
    '(?1)(?2)' with nothing between): click IMMEDIATELY followed by
    purchase in the user's stream — the impulse-buy detector, and
    deliberately different semantics from the funnels (which accept
    any gap).  One lead() pass per user (same keyed window every
    sequence op here shares), then a filtered count; the 1-hour
    tightening reuses the same lead(ts).  No joins, no state machine,
    exact timestamp arithmetic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    hit = seq.filter(
        (F.col("event_type") == "click") & (F.col("next_type") == "purchase")
    )
    return hit.agg(
        F.count(F.lit(1)).alias("n_adjacent"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count(
            F.when(F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"), 1)
        ).alias("n_within_1h"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT coalesce(touch_type, '<direct>') AS channel,
           count(*)                         AS n_purchases,
           round(cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE), 4)
             AS revenue
    FROM seq
    WHERE event_type = 'purchase'
      AND (touch_ts IS NULL OR touch_ts >= ts - INTERVAL 7 DAY)
    GROUP BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent non-purchase event within a 7-day lookback (older touches →
    '<direct>') — the marketing-analytics staple.  Same single
    IGNORE-NULLS backward frame as join_asof_nearest: one keyed window
    pass computes the candidate touch, a filter applies the lookback,
    and a tiny channel-keyed agg rolls revenue (through DECIMAL).  No
    joins, no per-user collect; the window shuffle is the one cost."""
    ev = table(spark, sf_dir, "events")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    seq = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(touch, ignorenulls=True).over(wb).alias("touch_type"),
        F.last(touch_ts, ignorenulls=True).over(wb).alias("touch_ts"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (
                F.col("touch_ts").isNull()
                | (F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY"))
            )
        )
        .groupBy(F.coalesce("touch_type", F.lit("<direct>")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.expr(
                "round(cast(sum(cast(value as decimal(24,10))) as double), 4)"
            ).alias("revenue"),
        )
    )


@query(
    "orders_cohort_ltv",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT c.cohort,
             date_diff('month', c.cohort,
                       date_trunc('month', o.o_orderdate))::BIGINT AS offset_m,
             cast(sum(cast(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
      FROM orders o JOIN cust c ON o.o_custkey = c.o_custkey
      GROUP BY 1, 2
    )
    SELECT epoch_us(cohort)::BIGINT AS cohort_us, offset_m,
           round(revenue, 2) AS revenue,
           round(sum(revenue) OVER (PARTITION BY cohort ORDER BY offset_m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS cum_ltv
    FROM rev
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers bucketed by first-order month,
    revenue rolled by months-since-cohort, cumulative LTV running per
    cohort — the retention-economics matrix next to the user-count
    cohort (events_retention_cohort counts heads; this sums money).
    Cohort table is customer-grain (broadcast), revenue sums go
    through DECIMAL, and the only window runs per cohort over month
    offsets — calendar-bounded rows.  Cross-engine month arithmetic is
    pinned via date_trunc + month-diff on truncated months."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    rev = (
        o.join(F.broadcast(cust), "o_custkey")
        .groupBy(
            "cohort",
            F.floor(
                F.months_between(
                    F.date_trunc("month", F.col("o_orderdate")), F.col("cohort")
                )
            )
            .cast("long")
            .alias("offset_m"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,4))) as double)"
            ).alias("revenue")
        )
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        F.unix_micros("cohort").alias("cohort_us"),
        "offset_m",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.sum("revenue").over(wc), 2).alias("cum_ltv"),
    )


@query(
    "events_churn_weekly",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT epoch_us(a.w)::BIGINT AS week_us,
           count(*) AS n_active,
           cast(count(*) FILTER (WHERE b.user_id IS NULL) AS BIGINT)
             AS n_churned
    FROM act a
    LEFT JOIN act b
      ON a.user_id = b.user_id AND b.w = a.w + INTERVAL 7 DAY
    WHERE a.w < (SELECT max(w) FROM act)
    GROUP BY a.w
    """,
)
def events_churn_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: users active in week W with no activity in W+1
    (the final week is excluded — churn there is right-censored; week
    grain because the fixtures span one month).  One distinct to
    user×week grain, then a self LEFT join shifted by one week —
    co-partitioned on user_id, null-probe = churned — and a week-grain
    rollup.  No windows at all; the censoring cut rides a
    scalar-subquery broadcast."""
    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    from .dedup import materialized

    act = materialized(act)
    mx = act.agg(F.max("w").alias("mx"))
    a = act.alias("a")
    b = act.alias("b")
    return (
        a.join(F.broadcast(mx))
        .filter(F.col("a.w") < F.col("mx"))
        .join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.w") == F.expr("a.w + INTERVAL 7 DAY")),
            "left",
        )
        .groupBy(F.unix_micros("a.w").alias("week_us"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count(F.when(F.col("b.user_id").isNull(), 1)).alias("n_churned"),
        )
    )


@query(
    "events_top_movers",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE) AS total
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    delta AS (
      SELECT event_type, day, total,
             total - lag(total) OVER (PARTITION BY event_type
                                      ORDER BY day) AS chg
      FROM daily
    ),
    ranked AS (
      SELECT event_type, day, round(total, 4) AS total, round(chg, 4) AS chg,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(chg) DESC, day) AS rnk
      FROM delta WHERE chg IS NOT NULL
    )
    SELECT event_type, epoch_us(day)::BIGINT AS day_us, total, chg, rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def events_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biggest day-over-day movers per event type (top-5 absolute
    deltas) — the 'what changed' dashboard primitive.  Daily totals
    through DECIMAL, per-type lag for the delta, per-type rank on
    |Δ| with a day tie-break (total order, engines can't diverge).
    All windows keyed by event_type over day-grain rows — calendar-
    bounded; at 100 TB only the first agg touches the facts."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.expr("cast(sum(cast(value as decimal(24,10))) as double)").alias("total")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    delta = daily.withColumn("chg", F.col("total") - F.lag("total").over(wt)).filter(
        F.col("chg").isNotNull()
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("chg")).desc(), F.col("day")
    )
    return (
        delta.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select(
            "event_type",
            F.unix_micros("day").alias("day_us"),
            F.round("total", 4).alias("total"),
            F.round("chg", 4).alias("chg"),
            "rnk",
        )
    )


@query(
    "events_user_overlap",
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sz AS (SELECT event_type, count(*) AS n FROM s GROUP BY event_type)
    SELECT p.type_a, p.type_b, p.n_both,
           sa.n AS n_a, sb.n AS n_b,
           round(p.n_both * 1.0 / (sa.n + sb.n - p.n_both), 6) AS jaccard
    FROM pairs p
    JOIN sz sa ON p.type_a = sa.event_type
    JOIN sz sb ON p.type_b = sb.event_type
    """,
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity between the USER
    SETS of each event-type pair (do clickers purchase? is the view
    audience disjoint from conversions?) — segment-overlap analysis as
    a set-similarity join.  Distinct to (type, user) grain, self-join
    keyed on user_id for intersections (co-partitioned, bounded by
    types-per-user), margins broadcast back onto the ≤C(types,2)-row
    pair table.  Exact integer counts; one division at the end."""
    ev = table(spark, sf_dir, "events")
    from .dedup import materialized

    s = materialized(ev.select("event_type", "user_id").distinct())
    a = s.alias("a")
    b = s.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sz = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(
            F.broadcast(sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "events_heatmap_dow_hour",
    oracle="""
    WITH cells AS (
      SELECT date_part('dow', ts)  AS dow,
             date_part('hour', ts) AS hod,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT cast(dow AS BIGINT) AS dow, cast(hod AS BIGINT) AS hod, n,
           round(n * 1.0 / (SELECT sum(n) FROM cells), 6) AS share
    FROM cells
    """,
)
def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day traffic heatmap with global share —
    the ops-dashboard staple (when do users show up?).  One (dow, hod)
    agg over the facts — 7×24 cells regardless of volume — and the
    share denominator rides a scalar-subquery broadcast.  Day-of-week
    pinned to Sunday=0 on both engines (dayofweek()-1 in Spark,
    date_part('dow') in DuckDB)."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    from .dedup import materialized

    cells = materialized(cells)
    tot = cells.agg(F.sum("n").alias("t"))
    return cells.join(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        F.round(F.col("n") / F.col("t").cast("double"), 6).alias("share"),
    )


@query(
    "orders_backlog_daily",
    oracle="""
    WITH span0 AS (
      SELECT o_orderkey, o_orderdate::DATE AS open_day,
             (max(l_shipdate)::DATE + 1) AS close_next
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate
    ),
    span AS (SELECT * FROM span0 WHERE close_next > open_day),
    days AS (
      SELECT DISTINCT open_day AS day FROM span
      UNION SELECT DISTINCT close_next FROM span
    )
    SELECT d.day::TIMESTAMP AS day, count(s.o_orderkey) AS backlog
    FROM days d
    LEFT JOIN span s ON d.day >= s.open_day AND d.day < s.close_next
    GROUP BY d.day
    """,
)
def orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog (orders placed but not yet fully
    shipped) — the interval-stabbing query every ops dashboard runs.

    The ORACLE answers it the naive way: a day × span theta join
    (`day BETWEEN open AND close`), O(days × orders) — fine at fixture
    scale, ruinous at 100 TB.  The Spark side is the scale answer: the
    +1/−1 EVENT SWEEP.  Each span emits two deltas (+1 at open, −1 the
    day after last shipment), deltas aggregate per day (keyed shuffle
    with map-side combine), and a running sum over the day grid
    recovers the backlog — O(orders) work and a window over DISTINCT
    DAYS (a few thousand rows at any corpus size: day-grain bounded,
    same contract as ``win_cumulative_distinct``), never a join
    against the span set.  Identity: backlog(d) = Σ deltas ≤ d =
    #\\{open ≤ d\\} − #\\{close_next ≤ d\\} = #spans covering d."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.col("o_orderdate").cast("date").alias("open_day"),
            F.date_add(F.col("last_ship").cast("date"), 1).alias("close_next"),
        )
        # the fixture generates ship dates independent of order dates, so
        # ~0.6% of spans are INVERTED (last shipment before the order) —
        # the sweep identity requires well-formed intervals, and a
        # negative-length "open order" is meaningless; both engines drop
        # them explicitly
        .filter(F.col("close_next") > F.col("open_day"))
    )
    deltas = span.select(
        F.col("open_day").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        span.select(F.col("close_next").alias("day"), F.lit(-1).alias("delta"))
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("delta"))
    from pyspark.sql.window import Window

    # day-grain bounded global window: one row per distinct calendar
    # day, not per order — the sweep's entire point
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("day").cast("timestamp").alias("day"),
        F.sum("delta").over(w).cast("long").alias("backlog"),
    )


@query(
    "stat_benford",
    oracle="""
    WITH src AS (
      SELECT substr(cast(cast(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
               AS d1
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT cast(d1 AS BIGINT) AS digit, count(*) AS n
          FROM src GROUP BY d1),
    t AS (SELECT sum(n) AS tot FROM c)
    SELECT digit, n,
           round(n / cast(tot AS DOUBLE), 6)                    AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6)                   AS exp_share,
           round(n / cast(tot AS DOUBLE)
                 - log10(1.0 + 1.0 / digit), 6)                 AS deviation
    FROM c CROSS JOIN t
    """,
)
def stat_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the classic fabricated-data / corrupted-feed detector (real
    transactional amounts follow P(d)=log10(1+1/d); synthetic or
    truncated feeds don't).  The leading digit comes from the INTEGER
    part's decimal string (identical int→string semantics on both
    engines), never from float log10 whose libm rounding could flip a
    power-of-ten boundary.  One digit-keyed agg over the facts (9
    output rows), total broadcast as a 1-row join — the orders table
    is scanned once, map-side combined."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    c = (
        o.select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from .dedup import materialized

    c = materialized(c)
    t = c.agg(F.sum("n").alias("tot"))
    obs = F.col("n") / F.col("tot").cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.join(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("obs_share"),
        F.round(exp, 6).alias("exp_share"),
        F.round(obs - exp, 6).alias("deviation"),
    )


@query(
    "stat_mannwhitney_binned",
    oracle="""
    WITH b AS (
      SELECT cast(floor(value * 10) AS BIGINT) AS bin,
             count(*) FILTER (event_type = 'click') AS na,
             count(*) FILTER (event_type = 'view')  AS nb
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1
    ),
    cum AS (
      SELECT bin, na, nb,
             coalesce(sum(nb) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS nb_below
      FROM b
    ),
    s AS (
      SELECT sum(na) AS n_a, sum(nb) AS n_b,
             sum(na * (nb_below + nb / 2.0)) AS u_a,
             sum((na + nb) * (na + nb) * (na + nb) - (na + nb)) AS ties
      FROM cum
    )
    SELECT cast(n_a AS BIGINT) AS n_a, cast(n_b AS BIGINT) AS n_b,
           round(u_a, 4) AS u_stat,
           round((u_a - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b / 12.0
                        * ((n_a + n_b + 1)
                           - ties / (cast(n_a + n_b AS DOUBLE)
                                     * (n_a + n_b - 1)))), 6) AS z_score
    FROM s
    """,
)
def stat_mannwhitney_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test (click vs view values) on a fixed
    0.1-wide bin grid — the distribution-free A/B significance twin of
    ``stat_welch_ttest`` (no normality assumption), with the standard
    tie-corrected normal approximation.  Binning is what makes it
    scale: instead of ranking N rows in one global sort, both samples
    collapse to per-bin counts (ONE keyed agg over the facts), and the
    rank bookkeeping — B-counts strictly below each bin plus half the
    in-bin ties — runs as a window over the BIN GRID (≤ value_range×10
    rows, bounded like ``stat_ks_binned``'s CDF grid).  U, the tie
    term Σ(t³−t), and both margins are exact integers; the only floats
    are the final μ/σ normalization."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    b = ev.groupBy(
        F.floor(F.col("value") * 10).cast("bigint").alias("bin")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("na"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("nb"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = b.select(
        "na",
        "nb",
        F.coalesce(F.sum("nb").over(w), F.lit(0)).alias("nb_below"),
    )
    t = F.col("na") + F.col("nb")
    s = cum.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(F.col("na") * (F.col("nb_below") + F.col("nb") / 2.0)).alias("u_a"),
        F.sum(t * t * t - t).alias("ties"),
    )
    n = F.col("n_a") + F.col("n_b")
    var = (
        F.col("n_a") * F.col("n_b") / 12.0
        * ((n + 1) - F.col("ties") / (n.cast("double") * (n - 1)))
    )
    return s.select(
        "n_a",
        "n_b",
        F.round("u_a", 4).alias("u_stat"),
        F.round(
            (F.col("u_a") - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(var), 6
        ).alias("z_score"),
    )


@query(
    "events_interarrival_stats",
    oracle="""
    WITH d AS (
      SELECT event_type,
             epoch_us(ts - lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           round(cast(sum(cast(gap_us AS DECIMAL(28,0))) AS DOUBLE)
                 / count(*) / 1e6, 6)                           AS mean_gap_s,
           round(min(gap_us) / 1e6, 6)                          AS min_gap_s,
           round(max(gap_us) / 1e6, 6)                          AS max_gap_s,
           round(sqrt((cast(sum(cast(gap_us AS DECIMAL(28,0))
                                * cast(gap_us AS DECIMAL(28,0))) AS DOUBLE)
                       - cast(sum(cast(gap_us AS DECIMAL(28,0))) AS DOUBLE)
                         * sum(cast(gap_us AS DECIMAL(28,0))) / count(*))
                      / (count(*) - 1)) / 1e6, 6)               AS sd_gap_s
    FROM d WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: for each event,
    the gap to the SAME USER's previous event (any type), rolled up by
    the current event's type — mean/min/max/σ of the gap in seconds.
    The burstiness profile behind rate-limiter and session-timeout
    tuning.  Gaps are exact integer microseconds from one user-keyed
    lag pass (partitioned window — never global), moment sums ride
    DECIMAL so partial-sum order can't flip the hash, and the final
    per-type agg is 5 rows."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    dg = "cast(gap_us as decimal(28,0))"
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.expr(f"cast(sum({dg}) as double)") / F.count(F.lit(1)) / 1e6, 6
        ).alias("mean_gap_s"),
        F.round(F.min("gap_us") / 1e6, 6).alias("min_gap_s"),
        F.round(F.max("gap_us") / 1e6, 6).alias("max_gap_s"),
        F.round(
            F.sqrt(
                (
                    F.expr(f"cast(sum({dg} * {dg}) as double)")
                    - F.expr(f"cast(sum({dg}) as double)")
                    * F.expr(f"sum({dg})")
                    / F.count(F.lit(1))
                )
                / (F.count(F.lit(1)) - 1)
            )
            / 1e6,
            6,
        ).alias("sd_gap_s"),
    )


@query(
    "events_stickiness_dau_mau",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('month', ts) AS month, ts::DATE AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    monthly AS (
      SELECT date_trunc('month', ts) AS month,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT m.month::TIMESTAMP AS month,
           (SELECT count(*) FROM daily d2 WHERE d2.month = m.month)
             AS n_days,
           cast((SELECT sum(dau) FROM daily d3 WHERE d3.month = m.month)
                AS BIGINT)                                    AS dau_total,
           m.mau,
           round((SELECT sum(dau) FROM daily d4 WHERE d4.month = m.month)
                 / cast((SELECT count(*) FROM daily d5
                         WHERE d5.month = m.month) AS DOUBLE)
                 / m.mau, 6)                                  AS stickiness
    FROM monthly m
    """,
)
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month — avg daily active users
    over monthly active users, the engagement ratio every growth team
    tracks (1.0 = every monthly user shows up every day).  Two exact
    COUNT(DISTINCT) aggregates — day grain and month grain — each one
    keyed shuffle over the facts, joined on month (a ≤tens-of-rows
    broadcast).  Exact distincts here; the re-aggregatable sketch/
    bitmap variants (``agg_hll_sketch_union``, ``agg_bitmap_distinct``)
    are the precomputed-rollup path when the dashboard can't rescan."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("month", "ts").alias("month"),
        F.col("ts").cast("date").alias("day"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    per_month = daily.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("dau_total"),
    )
    monthly = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return monthly.join(F.broadcast(per_month), "month").select(
        "month",
        "n_days",
        "dau_total",
        "mau",
        F.round(
            F.col("dau_total") / F.col("n_days").cast("double") / F.col("mau"), 6
        ).alias("stickiness"),
    )


@query(
    "events_rate_limit_burst",
    oracle="""
    WITH w AS (
      SELECT user_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                            RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
               AS burst_1h
      FROM events
    )
    SELECT user_id,
           count(*)                          AS n_events,
           max(burst_1h)                     AS max_burst_1h,
           max(burst_1h) >= 3                AS over_limit
    FROM w GROUP BY user_id
    """,
)
def events_rate_limit_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour burst detection per user — the rate-limiter /
    abuse-detection primitive (how many requests landed in any sliding
    hour ending at each event, and who ever exceeded the limit).  The
    sliding count is a RANGE frame over epoch seconds (3599 preceding,
    inclusive hour), USER-PARTITIONED — state per partition is one
    in-flight frame, never a self-join of events against events (the
    O(n²)-per-user trap), and the frame bound is data-independent.
    The per-user rollup collapses to one row per user; at 100 TB both
    passes ride the same user_id shuffle (and a user-bucketed layout
    makes them shuffle-free).  Threshold 3 is the fixture-scale limit;
    the plan is threshold-independent."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3599, 0)
    )
    bursts = ev.select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst_1h")
    )
    return bursts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("burst_1h").alias("max_burst_1h"),
        (F.max("burst_1h") >= 3).alias("over_limit"),
    )


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    byday AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(value AS DECIMAL(14,4))) AS DECIMAL(18,4)) AS x
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d.day, coalesce(b.x, cast(0 AS DECIMAL(18,4))) AS x
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    stats AS (
      SELECT count(*) AS n,
             cast(sum(x) AS DOUBLE) AS s,
             cast(sum(x * x) AS DOUBLE) AS ss
      FROM daily
    ),
    z AS (
      SELECT day, x,
             cast(floor((x - (s / n))
                        / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12)
                        * 1000000 + 0.5) AS BIGINT) AS z_u
      FROM daily CROSS JOIN stats
    ),
    c AS (
      SELECT day, x,
             sum(z_u - 500000) OVER o AS c_pos,
             sum(z_u + 500000) OVER o AS c_neg
      FROM z
      WINDOW o AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    w AS (
      SELECT day, x, c_pos, c_neg,
             min(c_pos) OVER o AS c_pos_min,
             max(c_neg) OVER o AS c_neg_max
      FROM c
      WINDOW o AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(cast(x AS DOUBLE), 2) AS daily_value,
           round((c_pos - least(c_pos_min, 0)) / 1000000.0, 6)    AS cusum_pos,
           round((greatest(c_neg_max, 0) - c_neg) / 1000000.0, 6) AS cusum_neg,
           (c_pos - least(c_pos_min, 0)) > 4000000                AS alarm_up,
           (greatest(c_neg_max, 0) - c_neg) > 4000000             AS alarm_down
    FROM w
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page 1954) on the daily
    revenue series: standardized residuals z_t, allowance k=0.5, alarm
    threshold h=4σ.  The recursive chart S⁺_t = max(0, S⁺_{t-1} + z_t
    − k) is rewritten in closed form as a prefix sum minus its running
    minimum — two stacked windows instead of a sequential fold, so it
    stays a set-based plan.  z is fixed to integer MICRO-units with the
    pinned floor(x·1e6 + 0.5) rule before the prefix sums: running
    double sums are evaluation-order-specific across engines (segment
    tree vs sliding accumulate), integer sums are exact everywhere.
    Global mean/σ come from one exact-DECIMAL aggregate broadcast back.

    Scale: the series is DAY-grain — the unpartitioned ordered window
    is bounded by the calendar (366 rows/year) no matter how many
    events feed it; the heavy lifting (daily totals) is one partial
    aggregation.  Per-metric/per-tenant charts would partition the
    window by that key."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the seasonal-decompose discipline): a quiet day
    # is a true zero-revenue sample — its standardized residual is a
    # REAL negative deviation the chart must accumulate, and skipping
    # it would splice the prefix sums across the gap
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(14,4)"))
        .cast("decimal(18,4)")
        .alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day",
        F.coalesce("x0", F.lit(0).cast("decimal(18,4)")).alias("x"),
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("ss"),
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "x",
        F.expr(
            "cast(floor((x - (s / n))"
            " / sqrt(((ss - ((s * s) / n)) / (n - 1)) + 1e-12)"
            " * 1000000 + 0.5) as bigint)"
        ).alias("z_u"),
    )
    o = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = z.select(
        "day",
        "x",
        F.sum(F.col("z_u") - 500000).over(o).alias("c_pos"),
        F.sum(F.col("z_u") + 500000).over(o).alias("c_neg"),
    )
    w = c.select(
        "day",
        "x",
        "c_pos",
        "c_neg",
        F.min("c_pos").over(o).alias("c_pos_min"),
        F.max("c_neg").over(o).alias("c_neg_max"),
    )
    s_pos = F.col("c_pos") - F.least(F.col("c_pos_min"), F.lit(0))
    s_neg = F.greatest(F.col("c_neg_max"), F.lit(0)) - F.col("c_neg")
    return w.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("x").cast("double"), 2).alias("daily_value"),
        F.round(s_pos / 1000000.0, 6).alias("cusum_pos"),
        F.round(s_neg / 1000000.0, 6).alias("cusum_neg"),
        (s_pos > 4000000).alias("alarm_up"),
        (s_neg > 4000000).alias("alarm_down"),
    )


@query(
    "events_forecast_holt",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    etypes AS (SELECT DISTINCT event_type FROM events),
    byday AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(cast(sum(cast(value AS DECIMAL(14,4))) AS DECIMAL(18,4))
                  AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT t.event_type, d.day, coalesce(b.x, 0.0) AS x
      FROM etypes t CROSS JOIN dayspine d
      LEFT JOIN byday b ON b.event_type = t.event_type AND b.day = d.day
    ),
    serie AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             count(*)     OVER (PARTITION BY event_type)              AS n
      FROM daily
    ),
    state AS (
      SELECT event_type, i, n, x, x AS l, cast(0.0 AS DOUBLE) AS b
      FROM serie WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i, s.n, s.x,
             0.5 * s.x + 0.5 * (st.l + st.b) AS l,
             0.3 * ((0.5 * s.x + 0.5 * (st.l + st.b)) - st.l)
               + 0.7 * st.b                  AS b
      FROM state st JOIN serie s
        ON s.event_type = st.event_type AND s.i = st.i + 1
    )
    SELECT event_type,
           n::BIGINT          AS n_days,
           round(l, 6)        AS level,
           round(b, 6)        AS trend,
           round(l + b, 6)    AS forecast_next
    FROM state WHERE i = n
    """,
)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level α=0.5, trend β=0.3)
    over each event type's daily series, emitting the final state and
    the one-step-ahead forecast level+trend — the classic short-horizon
    capacity/traffic forecast primitive.

    Engine side: the recursion is a higher-order ``aggregate()`` fold
    over the per-type series (collected and array_sorted by day, state
    = one named_struct of two doubles inside codegen) — same shape as
    events_ewma, so per-group cost is O(days) with one agg shuffle.
    The oracle unrolls the identical recurrence as a RECURSIVE CTE
    (sequential by construction) rather than DuckDB's list_reduce,
    whose struct accumulator updates fields IN PLACE left-to-right —
    the trend expression would read the already-updated level
    (measured, engine-specific); the CTE pins the textbook two-phase
    semantics both engines then compute bit-identically in IEEE
    doubles.  Scale: series are day-grain per type — state bounded by
    the calendar; the heavy lifting is the partial-aggregated daily
    rollup."""
    ev = table(spark, sf_dir, "events")
    # DENSE per-type day spine (the seasonal-decompose discipline): a
    # quiet (type, day) is a true zero-volume sample; skipping it
    # splices the smoothing recursion across the gap and shifts every
    # later level/trend state
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    etypes = ev.select("event_type").distinct()
    by_day = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(14,4)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("x0")
    )
    daily = etypes.crossJoin(F.broadcast(dayspine)).join(
        by_day, ["event_type", "day"], "left"
    ).select("event_type", "day", F.coalesce("x0", F.lit(0.0)).alias("x"))
    serie = daily.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(day, x))), s -> s.x)")
        .alias("xs")
    )
    fold = F.expr(
        "aggregate(slice(xs, 2, size(xs) - 1),"
        " named_struct('l', element_at(xs, 1), 'b', cast(0.0 as double)),"
        " (acc, x) -> named_struct("
        "   'l', 0.5d * x + 0.5d * (acc.l + acc.b),"
        "   'b', 0.3d * ((0.5d * x + 0.5d * (acc.l + acc.b)) - acc.l)"
        "        + 0.7d * acc.b))"
    )
    return serie.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        F.round(fold.getField("l"), 6).alias("level"),
        F.round(fold.getField("b"), 6).alias("trend"),
        F.round(fold.getField("l") + fold.getField("b"), 6).alias("forecast_next"),
    )


@query(
    "orders_abc_class",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             cast(sum(cast(l_extendedprice AS DECIMAL(14,4))) AS DECIMAL(18,4))
               AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
             sum(revenue) OVER ()                         AS tot
      FROM rev
    )
    SELECT l_partkey,
           cast(round(cast(revenue AS DOUBLE), 2) AS DOUBLE) AS revenue,
           CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                WHEN cum * 10 <= tot * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def orders_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    until the running share crosses 70% of total, B until 90%, C for
    the tail — the standard prioritization cut (tighter controls on the
    few parts carrying most value).  The share comparisons are exact
    DECIMAL cross-multiplications (cum·10 ≤ tot·7), never a float
    division whose ULP could flip a class at the boundary.  The global
    ordered window runs over the PER-PART rollup (bounded by part
    cardinality, not order volume) — the heavy lifting is the
    partial-aggregated revenue rollup; at catalog scale you'd
    range-partition by the revenue sort key (events_pareto_users is
    the per-group sibling)."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(14,4)"))
        .cast("decimal(18,4)")
        .alias("revenue")
    )
    o = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(o).alias("cum"),
        F.sum("revenue").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )
    cls = (
        F.when(F.col("cum") * 10 <= F.col("tot") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("tot") * 9, "B")
        .otherwise("C")
    )
    return ranked.select(
        "l_partkey",
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
        cls.alias("abc_class"),
    )


@query(
    "orders_ship_latency",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             date_diff('day', o.o_orderdate, min(l.l_shipdate)) AS lat_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           min(lat_days)::BIGINT       AS min_days,
           max(lat_days)::BIGINT       AS max_days,
           round(avg(lat_days), 4)     AS avg_days,
           cast(floor(quantile_cont(lat_days, 0.5) * 10000 + 0.5) / 10000.0
                AS DOUBLE)             AS p50_days,
           cast(floor(quantile_cont(lat_days, 0.9) * 10000 + 0.5) / 10000.0
                AS DOUBLE)             AS p90_days
    FROM per_order GROUP BY o_orderpriority
    """,
)
def orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment latency distribution per order priority
    — the operational SLA view (does URGENT actually ship faster?).
    Latency is exact integer days (order date → earliest line
    shipment); the rollup is min/max/avg plus interpolated p50/p90
    (PERCENTILE_CONT semantics, matching agg_percentile_exact's
    contract, quantized by the pinned floor rule since interpolation
    is the one non-integer step).  Scale: one orderkey-keyed join +
    two partial-aggregated shuffles; percentiles run per priority
    group (5 groups) over integer day values — bounded state via
    Spark's exact percentile over a value-count sketch."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("first_ship"), F.col("o_orderdate")).alias("lat_days"),
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("lat_days").cast("long").alias("min_days"),
        F.max("lat_days").cast("long").alias("max_days"),
        F.round(F.avg("lat_days"), 4).alias("avg_days"),
        F.expr(
            "cast(floor(percentile(lat_days, 0.5) * 10000 + 0.5d) / 10000.0d"
            " as double)"
        ).alias("p50_days"),
        F.expr(
            "cast(floor(percentile(lat_days, 0.9) * 10000 + 0.5d) / 10000.0d"
            " as double)"
        ).alias("p90_days"),
    )


#: Poisson(1) inverse CDF breakpoints for the deterministic bootstrap.
_POISSON_CDF = [
    (0.36787944, 0),
    (0.73575888, 1),
    (0.91969860, 2),
    (0.98101184, 3),
    (0.99634015, 4),
    (0.99940582, 5),
]
_BOOT_B = 32


def _poisson_case(u: str) -> str:
    """SQL CASE mapping a uniform [0,1) value to a Poisson(1) draw."""
    branches = " ".join(
        f"WHEN {u} < {p!r} THEN {k}" for p, k in _POISSON_CDF
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "stat_bootstrap_ci",
    oracle=f"""
    WITH draws AS (
      SELECT e.event_type, b.b, e.value,
             {_poisson_case("(('0x' || substr(md5(e.event_id || '-' || b.b), 1, 8))::BIGINT / 4294967296.0)")} AS w
      FROM events e, (SELECT unnest(range(0, {_BOOT_B})) AS b) b
    ),
    means AS (
      SELECT event_type, b,
             cast(sum(w * cast(value AS DECIMAL(14,4))) AS DOUBLE)
               / nullif(sum(w), 0) AS m
      FROM draws GROUP BY event_type, b
    ),
    sorted AS (
      SELECT event_type, list_sort(list(m)) AS ms FROM means
      WHERE m IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
           round(list_avg(ms), 6) AS boot_mean,
           round(ms[2], 6)              AS ci_lo,
           round(ms[{_BOOT_B} - 1], 6)  AS ci_hi
    FROM sorted
    """,
)
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the per-type mean
    value — THE way to bootstrap at cluster scale (Chamandy et al.,
    Google 2012): instead of resampling rows (impossible without
    global coordination), every (row, replicate) pair draws an
    independent Poisson(1) weight, so each of the B=32 replicate means
    is computable in the SAME single pass, map-side, with no shuffle
    of raw data — one (type, b)-keyed aggregation, then a 32-element
    sort per type.  The draw is DETERMINISTIC: u = md5(event_id, b)
    mapped through the Poisson(1) inverse CDF — rerun-stable, engine-
    portable (the same census both engines compute), replayable.  The
    interval is the (2nd, 31st) order statistics of the replicate
    means (~94% coverage at B=32); production raises B, the plan shape
    is unchanged.  Weighted sums go through DECIMAL so replicate means
    are bit-stable.  A replicate whose weights all drew 0 has a NULL
    mean; NULL replicates are DROPPED on both sides BEFORE the sort
    (r6 ADVICE: Spark's array_sort puts NULLs last, DuckDB's list_sort
    puts them first — an undefined contract that could flip ci_lo/ci_hi
    the day a tiny group hits an all-zero draw)."""
    ev = table(spark, sf_dir, "events")
    draws = ev.select(
        "event_type",
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        "(cast(conv(substring(md5(concat(cast(event_id as string), '-',"
        " cast(b as string))), 1, 8), 16, 10) as bigint) / 4294967296.0d)"
    )
    draws = draws.withColumn("w", F.expr(_poisson_case(u)))
    means = draws.groupBy("event_type", "b").agg(
        (
            F.expr("cast(sum(w * cast(value as decimal(14,4))) as double)")
            / F.expr("nullif(sum(w), 0)")
        ).alias("m")
    )
    return (
        means.filter(F.col("m").isNotNull())
        .groupBy("event_type")
        .agg(F.expr("array_sort(collect_list(m))").alias("ms"))
        .select(
            "event_type",
            F.round(
                F.expr("aggregate(ms, 0d, (a, x) -> a + x) / size(ms)"), 6
            ).alias("boot_mean"),
            F.round(F.expr("element_at(ms, 2)"), 6).alias("ci_lo"),
            F.round(F.expr(f"element_at(ms, {_BOOT_B - 1})"), 6).alias("ci_hi"),
        )
    )


@query(
    "events_slo_burn_rate",
    oracle="""
    WITH hourly AS (
      SELECT cast(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
             count(*) AS n_tot,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT h, n_tot, n_err,
             sum(n_tot) OVER w6 AS tot6,
             sum(n_err) OVER w6 AS err6
      FROM hourly
      WINDOW w6 AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT h,
           n_tot::BIGINT                                   AS n_total,
           n_err::BIGINT                                   AS n_errors,
           round(n_err * 4.0 / n_tot, 6)                   AS burn_1h,
           round(err6 * 4.0 / tot6, 6)                     AS burn_6h,
           (2 * n_err > n_tot AND 2 * err6 > tot6)         AS page_alert
    FROM win
    """,
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (Google SRE workbook ch.5)
    over the event stream the reference ingests: with an error budget
    of 25%, burn rate = error_fraction / budget; a page fires only
    when BOTH the fast window (1 h — catches the spike) and the slow
    window (6 h — filters blips) burn faster than 2× — the standard
    pairing that keeps pages actionable.  The alert predicate is pure
    INTEGER cross-multiplication (burn > 2 ⟺ 2·errors > total), so no
    float boundary can flip it between engines; the reported burn
    rates are display-only rounds.  The trailing window is a RANGE
    frame over the integer hour index (gap-correct when hours are
    missing — ROWS would silently widen).  Scale: hour-grain rollup is
    one partial agg; the window state is calendar-bounded (per
    service/tenant it partitions by that key)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
        .cast("long")
        .alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_err"
        ),
    )
    w6 = Window.orderBy("h").rangeBetween(-5, 0)
    win = hourly.select(
        "h",
        "n_tot",
        "n_err",
        F.sum("n_tot").over(w6).alias("tot6"),
        F.sum("n_err").over(w6).alias("err6"),
    )
    return win.select(
        "h",
        F.col("n_tot").cast("long").alias("n_total"),
        F.col("n_err").cast("long").alias("n_errors"),
        F.round(F.col("n_err") * 4.0 / F.col("n_tot"), 6).alias("burn_1h"),
        F.round(F.col("err6") * 4.0 / F.col("tot6"), 6).alias("burn_6h"),
        (
            (2 * F.col("n_err") > F.col("n_tot"))
            & (2 * F.col("err6") > F.col("tot6"))
        ).alias("page_alert"),
    )


@query(
    "events_apdex_score",
    oracle="""
    SELECT event_type,
           count(*)                                             AS n,
           cast(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS satisfied,
           cast(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END)
                AS BIGINT)                                      AS tolerating,
           round((sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN value > 50 AND value <= 200
                        THEN 1 ELSE 0 END) * 0.5) / count(*), 6) AS apdex
    FROM events GROUP BY event_type
    """,
)
def events_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex (Application Performance Index) per event type, treating
    ``value`` as a latency: satisfied ≤ T, tolerating ≤ 4T (T=50),
    apdex = (satisfied + tolerating/2) / total — the standard
    user-experience SLI the reference's metrics consumers would chart.
    Pure integer counts until one final division; a single
    partial-aggregated pass."""
    ev = table(spark, sf_dir, "events")
    sat = F.sum(F.when(F.col("value") <= 50, 1).otherwise(0))
    tol = F.sum(
        F.when((F.col("value") > 50) & (F.col("value") <= 200), 1).otherwise(0)
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        sat.cast("long").alias("satisfied"),
        tol.cast("long").alias("tolerating"),
        F.round((sat + tol * 0.5) / F.count(F.lit(1)), 6).alias("apdex"),
    )


@query(
    "events_sli_availability",
    oracle="""
    WITH minutes AS (
      SELECT cast(epoch(date_trunc('minute', ts)) / 60 AS BIGINT) AS m,
             cast(ts AS DATE) AS day,
             count(*) AS n_tot,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           count(*)::BIGINT AS active_minutes,
           cast(sum(CASE WHEN 2 * n_err > n_tot THEN 1 ELSE 0 END) AS BIGINT)
             AS bad_minutes,
           round(1.0 - sum(CASE WHEN 2 * n_err > n_tot THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 6) AS availability
    FROM minutes GROUP BY day
    """,
)
def events_sli_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily availability SLI: a minute is DOWN when errors outnumber
    successes (integer majority — no float threshold), availability =
    1 − bad_minutes / active_minutes per day.  This is the
    minutes-based availability definition most error budgets are
    written against (not request-weighted — one catastrophic minute in
    a quiet hour counts fully).  Two partial-aggregated rollups
    (minute grain then day grain), both calendar-bounded."""
    ev = table(spark, sf_dir, "events")
    minutes = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("minute", "ts")) / 60)
        .cast("long")
        .alias("m"),
        F.col("ts").cast("date").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_err"
        ),
    )
    bad = F.sum(F.when(2 * F.col("n_err") > F.col("n_tot"), 1).otherwise(0))
    return minutes.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("active_minutes"),
        bad.cast("long").alias("bad_minutes"),
        F.round(1.0 - bad * 1.0 / F.count(F.lit(1)), 6).alias("availability"),
    )


#: OTel/Prometheus explicit bucket boundaries for the value histogram.
OTEL_BUCKETS = [5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0]


@query(
    "events_histogram_otel_buckets",
    oracle=f"""
    WITH b AS (
      SELECT unnest([{", ".join(str(b) for b in OTEL_BUCKETS)}, 'inf'::DOUBLE])
        AS le
    ),
    agg AS (
      SELECT e.event_type, b.le,
             sum(CASE WHEN e.value <= b.le THEN 1 ELSE 0 END)::BIGINT
               AS cumulative_count
      FROM events e CROSS JOIN b
      GROUP BY e.event_type, b.le
    ),
    tot AS (
      SELECT event_type,
             count(*) AS total_count,
             cast(round(sum(cast(value AS DECIMAL(14,4))), 4) AS DOUBLE)
               AS value_sum
      FROM events GROUP BY event_type
    )
    SELECT a.event_type, a.le, a.cumulative_count,
           t.total_count, t.value_sum
    FROM agg a JOIN tot t USING (event_type)
    """,
)
def events_histogram_otel_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTel/Prometheus explicit-bucket histogram of the value metric
    per event type: CUMULATIVE ``le`` buckets (each bucket counts
    everything at or below its bound, +Inf equals the total) plus the
    series sum and count — byte-for-byte the histogram exposition
    shape the reference's /metrics endpoint publishes
    (internal/obs/metrics.go histogram; streaming/metrics.py renders
    the same family live).  The plan is ONE pass: a bounded 8-row
    bucket table cross-joined in (broadcast), conditional sums per
    (type, le) — never an explode-per-event; the cumulative property
    comes from the ≤ predicate, not a second windowed pass.  Exact
    integer counts; the sum goes through DECIMAL."""
    ev = table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(b,) for b in OTEL_BUCKETS] + [(float("inf"),)], "le double"
    )
    agg = (
        ev.crossJoin(F.broadcast(buckets))
        .groupBy("event_type", "le")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("le"), 1).otherwise(0))
            .cast("long")
            .alias("cumulative_count")
        )
    )
    tot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.expr(
            "cast(round(sum(cast(value as decimal(14,4))), 4) as double)"
        ).alias("value_sum"),
    )
    return agg.join(F.broadcast(tot), "event_type").select(
        "event_type", "le", "cumulative_count", "total_count", "value_sum"
    )


@query(
    "events_exemplar_per_bucket",
    oracle=f"""
    WITH b AS (
      SELECT unnest([{", ".join(str(b) for b in OTEL_BUCKETS)}, 'inf'::DOUBLE])
        AS le,
             unnest([0.0, {", ".join(str(b) for b in OTEL_BUCKETS)}]) AS lo
    ),
    tagged AS (
      SELECT e.event_type, b.le, e.event_id, e.value,
             row_number() OVER (PARTITION BY e.event_type, b.le
                                ORDER BY md5(e.event_id::VARCHAR), e.event_id)
               AS rk
      FROM events e JOIN b ON e.value > b.lo AND e.value <= b.le
    )
    SELECT event_type, le,
           event_id AS exemplar_event_id,
           round(value, 6) AS exemplar_value
    FROM tagged WHERE rk = 1
    """,
)
def events_exemplar_per_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTel histogram EXEMPLARS: one representative raw event per
    (type, bucket), chosen by md5-rank — deterministic, rerun-stable,
    and unbiased within the bucket (hash order ≈ uniform), which is
    what makes the exemplar a fair drill-down sample rather than
    'first row the scan happened to hit'.  Buckets here are DISJOINT
    (lo, le] ranges (exemplars attach per bucket, unlike the
    cumulative counts of events_histogram_otel_buckets).  The bucket
    table is 8 broadcast rows; selection is one keyed window over the
    bucketed events.  Exemplars are what link a latency histogram
    spike to an actual trace — the reference's histogram + tracing
    span machinery (SURVEY A14/A15) meet here."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    bounds = [0.0] + OTEL_BUCKETS
    buckets = spark.createDataFrame(
        list(zip(bounds, OTEL_BUCKETS + [float("inf")])), "lo double, le double"
    )
    tagged = ev.join(
        F.broadcast(buckets),
        (F.col("value") > F.col("lo")) & (F.col("value") <= F.col("le")),
    )
    w = Window.partitionBy("event_type", "le").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        tagged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "le",
            F.col("event_id").alias("exemplar_event_id"),
            F.round("value", 6).alias("exemplar_value"),
        )
    )


@query(
    "events_peak_detection",
    oracle="""
    WITH bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    byday AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(value AS DECIMAL(14,4))) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d.day, coalesce(b.x, 0.0) AS x
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    n AS (
      SELECT day, x,
             lag(x)  OVER (ORDER BY day) AS prev1,
             lead(x) OVER (ORDER BY day) AS next1,
             lag(x, 2)  OVER (ORDER BY day) AS prev2,
             lead(x, 2) OVER (ORDER BY day) AS next2
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(x, 2) AS daily_value,
           (x > prev1 AND x > next1)                    AS is_local_peak,
           (x > prev1 AND x > next1 AND
            x > coalesce(prev2, x - 1) AND
            x > coalesce(next2, x - 1))                 AS is_prominent_peak
    FROM n
    WHERE prev1 IS NOT NULL AND next1 IS NOT NULL
    """,
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection on the daily series: a day is a peak when
    it exceeds both neighbors, prominent when it also exceeds the
    2-away neighbors (edges treated as passing via the coalesce
    sentinel — a boundary day can still be prominent).  Comparisons on
    exact decimal daily sums cast once to double (identical values
    both engines), strict inequalities so ties never flip engines.
    Day-grain global window — calendar-bounded; per-metric it
    partitions by the metric key.  Peaks are the anomaly-calendar
    complement to CUSUM's sustained-shift detection
    (events_changepoint_cusum)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the seasonal-decompose discipline): "local
    # maximum" is a CALENDAR-neighbor notion — with gaps, lag/lead
    # compared non-adjacent days, and a busy day flanked by quiet days
    # (a true peak) could be suppressed by a far-away neighbor
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("x0", F.lit(0.0)).alias("x")
    )
    w = Window.orderBy("day")
    n = daily.select(
        "day",
        "x",
        F.lag("x", 1).over(w).alias("prev1"),
        F.lead("x", 1).over(w).alias("next1"),
        F.lag("x", 2).over(w).alias("prev2"),
        F.lead("x", 2).over(w).alias("next2"),
    )
    peak = (F.col("x") > F.col("prev1")) & (F.col("x") > F.col("next1"))
    prominent = (
        peak
        & (F.col("x") > F.coalesce(F.col("prev2"), F.col("x") - 1))
        & (F.col("x") > F.coalesce(F.col("next2"), F.col("x") - 1))
    )
    return (
        n.filter(F.col("prev1").isNotNull() & F.col("next1").isNotNull())
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("x", 2).alias("daily_value"),
            peak.alias("is_local_peak"),
            prominent.alias("is_prominent_peak"),
        )
    )


@query(
    "events_counter_rate_resets",
    oracle="""
    WITH serie AS (
      SELECT user_id, ts, event_id,
             cast(sum(cast(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) % 100000 AS BIGINT)
               AS counter
      FROM events
    ),
    d AS (
      SELECT user_id, counter,
             counter - lag(counter) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS delta
      FROM serie
    )
    SELECT user_id,
           count(*)::BIGINT                           AS n_samples,
           cast(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_resets,
           cast(sum(CASE WHEN delta IS NULL THEN 0
                         WHEN delta >= 0 THEN delta
                         ELSE counter END) AS BIGINT) AS increase_units
    FROM d GROUP BY user_id
    """,
)
def events_counter_rate_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus ``increase()`` semantics with counter-reset
    correction: a monotone per-user counter (synthesized here as the
    running value sum in integer centi-units, wrapped at 100k to plant
    deterministic resets) is differenced sample-to-sample; a negative
    delta means the counter restarted, and the post-reset VALUE — not
    the negative delta — is the true increase since the reset (the
    exact rule promql's extrapolation is built on).  All integer
    arithmetic: running sum, modulo, deltas, correction — bit-exact in
    both engines, no float anywhere.  Scale: user-keyed windows (one
    shuffle), then a per-user rollup; the counter synthesis stands in
    for the cumulative series a scrape target exports."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    o = Window.partitionBy("user_id").orderBy("ts", "event_id")
    serie = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.sum(F.expr("cast(round(value * 100) as bigint)")).over(
                o.rowsBetween(Window.unboundedPreceding, 0)
            )
            % 100000
        )
        .cast("long")
        .alias("counter"),
    )
    d = serie.select(
        "user_id",
        "counter",
        (F.col("counter") - F.lag("counter").over(o)).alias("delta"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        F.sum(
            F.when(F.col("delta").isNull(), 0)
            .when(F.col("delta") >= 0, F.col("delta"))
            .otherwise(F.col("counter"))
        )
        .cast("long")
        .alias("increase_units"),
    )


@query(
    "events_new_vs_returning",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(cast(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    )
    SELECT strftime(cast(e.ts AS DATE), '%Y-%m-%d') AS day,
           cast(sum(CASE WHEN cast(e.ts AS DATE) = f.first_day
                         THEN 1 ELSE 0 END) AS BIGINT)  AS new_user_events,
           cast(sum(CASE WHEN cast(e.ts AS DATE) > f.first_day
                         THEN 1 ELSE 0 END) AS BIGINT)  AS returning_events,
           count(DISTINCT CASE WHEN cast(e.ts AS DATE) = f.first_day
                               THEN e.user_id END)      AS new_users,
           count(DISTINCT CASE WHEN cast(e.ts AS DATE) > f.first_day
                               THEN e.user_id END)      AS returning_users
    FROM events e JOIN first_seen f USING (user_id)
    GROUP BY 1
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split — the growth dashboard's first
    panel: an event is 'new' when it falls on its user's first active
    day.  First-seen days are one user-keyed aggregate joined back
    (broadcastable: one row per user); the daily split is conditional
    counts + conditional distincts, no windows.  (win_cumulative_
    distinct charts the cumulative curve; this is the daily-grain
    decomposition.)"""
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    day = F.col("ts").cast("date")
    j = ev.join(first, "user_id")
    is_new = day == F.col("first_day")
    return j.groupBy(F.date_format(day, "yyyy-MM-dd").alias("day")).agg(
        F.sum(is_new.cast("int")).cast("long").alias("new_user_events"),
        F.sum((~is_new).cast("int")).cast("long").alias("returning_events"),
        F.countDistinct(F.when(is_new, F.col("user_id"))).alias("new_users"),
        F.countDistinct(F.when(~is_new, F.col("user_id"))).alias(
            "returning_users"
        ),
    )


@query(
    "events_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day, x,
             sum(x) OVER o AS cum
      FROM daily WINDOW o AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    p AS (
      SELECT day, x, cum,
             max(cum) OVER o AS peak
      FROM c WINDOW o AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(cum / 100.0, 2)           AS cumulative,
           round(peak / 100.0, 2)          AS running_peak,
           round((peak - cum) / 100.0, 2)  AS drawdown,
           (peak - cum) = max(peak - cum) OVER () AS is_max_drawdown
    FROM p
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily series: running peak
    minus current cumulative, with the worst day flagged — the
    peak-to-trough risk metric (finance) and the 'how far behind the
    best day are we' ops metric.  Values are integer CENTI-units end
    to end (round(value·100) summed as BIGINT), so the stacked windows
    (cumsum → running max → global max) are exact integer arithmetic —
    the same prefix-rewrite family as CUSUM, and the same day-grain
    calendar bound on the ordered windows."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
    )
    # bounded: day-grain calendar frame — one row per date
    o = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.select("day", F.sum("x").over(o).alias("cum"))
    p = c.select("day", "cum", F.max("cum").over(o).alias("peak"))
    dd = F.col("peak") - F.col("cum")
    # bounded: same day-grain calendar frame as above
    g = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return p.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("cum") / 100.0, 2).alias("cumulative"),
        F.round(F.col("peak") / 100.0, 2).alias("running_peak"),
        F.round(dd / 100.0, 2).alias("drawdown"),
        (dd == F.max(dd).over(g)).alias("is_max_drawdown"),
    )


#: DFT frequency count for the power-spectrum scan (k = 1.._DFT_K).
_DFT_K = 8
#: Both engines' cos/sin differ by ≤1 ULP (Java Math vs libm); the
#: per-term quantization makes the products bit-identical BEFORE any
#: sum — the same round-before-combine rule as the cosine binning in
#: emb_pairwise_distance_hist.
_DFT_TRIG_ROUND = 6
_TWO_PI = 6.283185307179586  # literal, not pi()/F.pi — same double both engines


@query(
    "stat_dft_power",
    oracle=f"""
    WITH bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    byday AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d.day, coalesce(b.x, 0) AS x
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    idx AS (
      SELECT x,
             row_number() OVER (ORDER BY day) - 1 AS t,
             count(*) OVER () AS n
      FROM daily
    ),
    terms AS (
      SELECT k.k, idx.n,
             cast(idx.x * round(cos({_TWO_PI} * k.k * idx.t / idx.n),
                                {_DFT_TRIG_ROUND}) AS DECIMAL(28,10)) AS c_term,
             cast(idx.x * round(sin({_TWO_PI} * k.k * idx.t / idx.n),
                                {_DFT_TRIG_ROUND}) AS DECIMAL(28,10)) AS s_term
      FROM idx, (SELECT unnest(range(1, {_DFT_K + 1})) AS k) k
    ),
    spec AS (
      SELECT k, any_value(n) AS n,
             cast(sum(c_term) AS DOUBLE) AS sc,
             cast(sum(s_term) AS DOUBLE) AS ss
      FROM terms GROUP BY k
    )
    SELECT k::BIGINT AS k,
           round((sc * sc + ss * ss) / (n * n * 10000.0), 4) AS power,
           row_number() OVER (ORDER BY round((sc * sc + ss * ss)
                                             / (n * n * 10000.0), 4) DESC,
                              k ASC) AS power_rank
    FROM spec
    """,
)
def stat_dft_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier power spectrum of the daily total-value series
    at frequencies k=1..8 — the periodicity detector (a weekly cycle
    shows as a spike at k ≈ N/7) that complements ``stat_autocorr_lag``
    (time-domain) and feeds seasonal forecasting.  Numeric portability
    stack: daily sums ride the integer centi-unit trick
    (events_max_drawdown), cos/sin are quantized at round(6) BEFORE the
    product (Java Math vs libm differ by ≤1 ULP — round-before-combine),
    and the per-term products are summed as DECIMAL so partial-sum
    order can't drift; power is normalized by N² and reported in
    whole-unit² terms.  Scale: the daily series is calendar-bounded, so
    the unpartitioned index window and the K×N term fan-out are both
    bounded by days×8 — corpus size only affects the day-grain partial
    agg that feeds it."""
    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the seasonal-decompose discipline): the daily
    # VOLUME series is defined over the CALENDAR — a quiet day is a
    # true 0, and present-days-only indexing would misalign the series
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("x0", F.lit(0)).alias("x")
    )
    o = Window.orderBy("day")
    g = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "x",
        (F.row_number().over(o) - 1).alias("t"),
        F.count(F.lit(1)).over(g).alias("n"),
    )
    theta = F.lit(_TWO_PI) * F.col("k") * F.col("t") / F.col("n")
    terms = idx.join(
        F.broadcast(
            spark.range(1, _DFT_K + 1).select(F.col("id").alias("k"))
        )
    ).select(
        "k",
        "n",
        (F.col("x") * F.round(F.cos(theta), _DFT_TRIG_ROUND))
        .cast("decimal(28,10)")
        .alias("c_term"),
        (F.col("x") * F.round(F.sin(theta), _DFT_TRIG_ROUND))
        .cast("decimal(28,10)")
        .alias("s_term"),
    )
    spec = terms.groupBy("k").agg(
        F.any_value(F.col("n")).alias("n"),
        F.sum("c_term").cast("double").alias("sc"),
        F.sum("s_term").cast("double").alias("ss"),
    )
    power = F.round(
        (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
        / (F.col("n") * F.col("n") * F.lit(10000.0)),
        4,
    )
    return spec.select(
        F.col("k").cast("long").alias("k"),
        power.alias("power"),
        F.row_number()
        .over(Window.orderBy(power.desc(), F.col("k").asc()))
        .cast("long")
        .alias("power_rank"),
    )


@query(
    "stat_spearman_trend",
    oracle="""
    WITH r AS (
      SELECT event_type,
             -- doubled average ranks (2*avg = 2*min_rank + ties - 1)
             -- stay exact integers, and Spearman is invariant under
             -- the linear scaling
             2 * rank() OVER (PARTITION BY event_type ORDER BY value)
               + count(*) OVER (PARTITION BY event_type, value) - 1 AS rv,
             2 * rank() OVER (PARTITION BY event_type ORDER BY ts)
               + count(*) OVER (PARTITION BY event_type, ts) - 1    AS rt
      FROM events
    ),
    m AS (
      SELECT event_type,
             count(*)                                   AS n,
             sum(cast(rv AS HUGEINT))                   AS sx,
             sum(cast(rt AS HUGEINT))                   AS sy,
             sum(cast(rv AS HUGEINT) * rv)              AS sxx,
             sum(cast(rt AS HUGEINT) * rt)              AS syy,
             sum(cast(rv AS HUGEINT) * rt)              AS sxy
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy)
                 / (sqrt(cast(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(cast(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
    FROM m
    """,
)
def stat_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of ``value`` against event time per
    event_type — the nonparametric monotone-trend detector ("is this
    metric drifting?") that complements ``stat_welch_ttest``
    (two-sample) and ``stat_autocorr_lag`` (serial).  Tie handling is
    textbook average ranks, carried as DOUBLED ranks
    (2*min_rank + tie_count - 1) so they stay exact integers; all five
    moment sums then run in exact integer arithmetic (DECIMAL on the
    Spark side, HUGEINT in DuckDB), and the only float op is the final
    Pearson-on-ranks division, rounded at 6.  Plan: two rank windows
    sharing the event_type partition (one shuffle), then a partial+final
    agg on the same key — no second shuffle.  Scale: ranks are per
    event_type; a skewed type concentrates its sort in one task, the
    standard window-skew tradeoff (salting does not apply to global
    ranks)."""
    ev = table(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy("value")
    wt = Window.partitionBy("event_type").orderBy("ts")
    r = ev.select(
        "event_type",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "value"))
            - 1
        ).cast("decimal(20,0)").alias("rv"),
        (
            2 * F.rank().over(wt)
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "ts"))
            - 1
        ).cast("decimal(20,0)").alias("rt"),
    )
    m = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rv").cast("decimal(38,0)").alias("sx"),
        F.sum("rt").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("rv") * F.col("rv")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("rt") * F.col("rt")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("rv") * F.col("rt")).cast("decimal(38,0)").alias("sxy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "event_type",
        "n",
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("spearman_rho"),
    )


@query(
    "stat_anova_f",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE)   AS s1,
             cast(sum(cast(value AS DECIMAL(24,10))
                      * cast(value AS DECIMAL(24,10))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    t AS (
      SELECT count(*) AS k, sum(n) AS nt,
             sum(s1) AS st, sum(s1 * s1 / n) AS sb, sum(s2) AS sq
      FROM g
    )
    SELECT cast(k AS BIGINT)                        AS k_groups,
           cast(nt AS BIGINT)                       AS n_total,
           cast(k - 1 AS BIGINT)                    AS df_between,
           cast(nt - k AS BIGINT)                   AS df_within,
           round((sb - st * st / nt) / (k - 1), 6)  AS ms_between,
           round((sq - sb) / (nt - k), 6)           AS ms_within,
           round(((sb - st * st / nt) / (k - 1))
                 / ((sq - sb) / (nt - k)), 6)       AS f_stat
    FROM t
    """,
)
def stat_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for ``value`` across event_type
    groups — the k-sample generalization of ``stat_welch_ttest``
    (equal-variance form): SSB = Σ s1ᵢ²/nᵢ − (Σs1)²/N from per-group
    moment sums, SSW = Σs2 − Σ s1ᵢ²/nᵢ.  Per-group Σx and Σx² ride
    DECIMAL so partial-sum order can't drift; the handful of float ops
    after run over k rows and are rounded at 6.  Plan: one partial+final
    agg on event_type, then a k-row total agg — the events table is
    scanned exactly once, and every post-agg stage is broadcast-sized."""
    ev = table(spark, sf_dir, "events")
    dv = "cast(value as decimal(24,10))"
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"cast(sum({dv}) as double)").alias("s1"),
        F.expr(f"cast(sum({dv} * {dv}) as double)").alias("s2"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nt"),
        F.sum("s1").alias("st"),
        F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("sb"),
        F.sum("s2").alias("sq"),
    )
    k, nt = F.col("k"), F.col("nt")
    msb = (F.col("sb") - F.col("st") * F.col("st") / nt) / (k - 1)
    msw = (F.col("sq") - F.col("sb")) / (nt - k)
    return t.select(
        k.cast("long").alias("k_groups"),
        nt.cast("long").alias("n_total"),
        (k - 1).cast("long").alias("df_between"),
        (nt - k).cast("long").alias("df_within"),
        F.round(msb, 6).alias("ms_between"),
        F.round(msw, 6).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
    )


#: PSI bin count — the industry-standard 10-bucket form.
_PSI_BINS = 10


@query(
    "stat_psi_drift",
    oracle=f"""
    WITH b AS (
      SELECT min(value) AS mn, max(value) AS mx,
             min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
      FROM events
    ),
    binned AS (
      SELECT CASE WHEN 2 * epoch_us(e.ts) < b.t0 + b.t1
                  THEN 'expected' ELSE 'actual' END AS period,
             least(cast(floor((e.value - b.mn)
                              / ((b.mx - b.mn) / {_PSI_BINS}.0)) AS BIGINT),
                   {_PSI_BINS - 1}) AS bin
      FROM events e CROSS JOIN b
    ),
    spine AS (
      SELECT p.period, r.range AS bin
      FROM range({_PSI_BINS}) r
      CROSS JOIN (SELECT 'expected' AS period UNION ALL SELECT 'actual') p
    ),
    cnt AS (
      SELECT s.period, s.bin, count(binned.bin) AS n
      FROM spine s LEFT JOIN binned
        ON binned.period = s.period AND binned.bin = s.bin
      GROUP BY s.period, s.bin
    ),
    prop AS (
      SELECT bin,
             max(CASE WHEN period = 'expected' THEN n END) AS ne,
             max(CASE WHEN period = 'actual' THEN n END)   AS na
      FROM cnt GROUP BY bin
    ),
    terms AS (
      SELECT bin,
             (ne + 0.5) / (sum(ne) OVER () + {_PSI_BINS / 2.0}) AS p,
             (na + 0.5) / (sum(na) OVER () + {_PSI_BINS / 2.0}) AS q
      FROM prop
    )
    SELECT bin,
           round(p, 6) AS p_expected,
           round(q, 6) AS p_actual,
           round((p - q) * ln(p / q), 6) AS psi_term,
           round(sum(round((p - q) * ln(p / q), 6)) OVER (), 6) AS psi_total
    FROM terms
    """,
)
def stat_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the ``value`` distribution between
    the first and second half of the time range — the model-monitoring
    drift metric (PSI < 0.1 stable, > 0.25 shifted).  Ten fixed-width
    bins over the global [min, max] keep the binning SQL-exact (both
    engines do the same IEEE subtract/divide/floor); a +0.5 Laplace
    count on a materialized bin spine makes empty bins well-defined
    instead of ±inf.  The half-split is the pure integer comparison
    2·t < t0 + t1 on epoch-micros, immune to timestamp-arithmetic
    dialect drift.  Plan: one min/max agg broadcast back over the scan,
    one (period, bin) partial+final agg, then 20-row arithmetic — two
    passes over events total.  Scale: output is fixed at 10 rows; the
    only data-sized stages are the two scans."""
    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    binned = ev.join(F.broadcast(b)).select(
        F.when(
            2 * F.unix_micros("ts") < F.col("t0") + F.col("t1"), "expected"
        )
        .otherwise("actual")
        .alias("period"),
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / float(_PSI_BINS))
            ).cast("long"),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    spine = (
        spark.range(_PSI_BINS)
        .select(F.col("id").alias("bin"))
        .crossJoin(
            spark.createDataFrame(
                [("expected",), ("actual",)], "period string"
            )
        )
    )
    cnt = (
        F.broadcast(spine)
        .join(binned.groupBy("period", "bin").agg(F.count(F.lit(1)).alias("c")),
              ["period", "bin"], "left")
        .select("period", "bin", F.coalesce("c", F.lit(0)).alias("n"))
    )
    w = Window.partitionBy(F.lit(1))
    prop = (
        cnt.groupBy("bin")
        .agg(
            F.max(F.when(F.col("period") == "expected", F.col("n"))).alias("ne"),
            F.max(F.when(F.col("period") == "actual", F.col("n"))).alias("na"),
        )
        .select(
            "bin",
            ((F.col("ne") + 0.5) / (F.sum("ne").over(w) + _PSI_BINS / 2.0)).alias("p"),
            ((F.col("na") + 0.5) / (F.sum("na").over(w) + _PSI_BINS / 2.0)).alias("q"),
        )
    )
    term = F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6)
    return prop.select(
        "bin",
        F.round("p", 6).alias("p_expected"),
        F.round("q", 6).alias("p_actual"),
        term.alias("psi_term"),
        F.round(F.sum(term).over(w), 6).alias("psi_total"),
    )


#: Mutual-information value discretization: decile buckets over the
#: global value range (fixed-width, SQL-exact on both engines).
_MI_BINS = 10


@query(
    "stat_mutual_information",
    oracle=f"""
    WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    cells AS (
      SELECT e.event_type,
             least(cast(floor((e.value - b.mn)
                              / ((b.mx - b.mn) / {_MI_BINS}.0)) AS BIGINT),
                   {_MI_BINS - 1}) AS vbin,
             count(*) AS n
      FROM events e CROSS JOIN b
      GROUP BY 1, 2
    ),
    rm AS (SELECT event_type, sum(n) AS rn FROM cells GROUP BY event_type),
    cm AS (SELECT vbin, sum(n) AS cn FROM cells GROUP BY vbin),
    tot AS (SELECT sum(n) AS t FROM cells),
    terms AS (
      SELECT c.n / cast(tot.t AS DOUBLE) AS pxy,
             (rm.rn / cast(tot.t AS DOUBLE))
               * (cm.cn / cast(tot.t AS DOUBLE)) AS pxpy,
             rm.rn / cast(tot.t AS DOUBLE) AS px,
             cm.cn / cast(tot.t AS DOUBLE) AS py
      FROM cells c
      JOIN rm ON c.event_type = rm.event_type
      JOIN cm ON c.vbin = cm.vbin
      CROSS JOIN tot
    )
    SELECT round(sum(pxy * log2(pxy / pxpy)), 6)          AS mi_bits,
           round(-sum(pxy * log2(pxy)), 6)                AS h_joint,
           round(sum(pxy * log2(pxy / pxpy))
                 / (-sum(pxy * log2(pxy))), 6)            AS iqr_normalized
    FROM terms
    """,
)
def stat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between event_type and the value
    decile — the feature-relevance score a training pipeline uses to
    rank columns/labels before spending model time on them, and the
    log-scale complement of ``stat_chi2_independence`` over the same
    contingency shape.  Value is discretized into {_MI_BINS} fixed-width
    global-range bins (the stat_psi_drift rule: identical IEEE
    subtract/divide/floor on both engines); margins and cells are exact
    integers; the float tail is ≤ |types|×{_MI_BINS} log terms, rounded
    at 6.  Also reports joint entropy and the entropy-normalized MI.
    Plan: one min/max agg broadcast over the scan, one (type, bin)
    partial+final agg, broadcast margin joins — two scans total,
    nothing downstream is data-sized."""
    ev = table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    cells = (
        ev.join(F.broadcast(b))
        .select(
            "event_type",
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / float(_MI_BINS))
                ).cast("long"),
                F.lit(_MI_BINS - 1).cast("long"),
            ).alias("vbin"),
        )
        .groupBy("event_type", "vbin")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    rm = cells.groupBy("event_type").agg(F.sum("n").alias("rn"))
    cm = cells.groupBy("vbin").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("t"))
    t = F.col("t").cast("double")
    terms = (
        cells.join(F.broadcast(rm), "event_type")
        .join(F.broadcast(cm), "vbin")
        .join(F.broadcast(tot))
        .select(
            (F.col("n") / t).alias("pxy"),
            ((F.col("rn") / t) * (F.col("cn") / t)).alias("pxpy"),
        )
    )
    mi = F.sum(F.col("pxy") * F.log2(F.col("pxy") / F.col("pxpy")))
    hj = -F.sum(F.col("pxy") * F.log2(F.col("pxy")))
    return terms.agg(
        F.round(mi, 6).alias("mi_bits"),
        F.round(hj, 6).alias("h_joint"),
        F.round(mi / hj, 6).alias("iqr_normalized"),
    )


@query(
    "events_seasonal_decompose",
    oracle="""
    WITH bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    byday AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d.day, coalesce(b.x, 0) AS x
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    tr AS (
      SELECT day, x, date_part('dow', day) AS dow,
             round(avg(x) OVER (ORDER BY day
                                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   / 100.0, 4) AS trend
      FROM daily
    ),
    se AS (
      SELECT day, x, dow, trend,
             round(avg(x / 100.0 - trend) OVER (PARTITION BY dow), 4)
               AS seasonal
      FROM tr
    )
    SELECT strftime(day, '%Y-%m-%d')              AS day,
           round(x / 100.0, 2)                    AS observed,
           trend, seasonal,
           round(x / 100.0 - trend - seasonal, 4) AS residual
    FROM se
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily total-value series
    (classical STL-lite): trend = centered 7-day moving average,
    weekly seasonal = per-day-of-week mean of the detrended series,
    residual = remainder — the monitoring decomposition that turns
    "traffic fell" into "below trend after removing the weekend dip",
    complementing events_ewma (smoothing), events_forecast_holt
    (forecast) and stat_dft_power (spectrum).  Daily sums ride the
    integer centi-unit trick; trend and seasonal are rounded at 4
    BEFORE the residual subtraction so every downstream value is
    arithmetic on already-agreed numbers (round-before-combine).  The
    edge days average their available window — identical ROWS-frame
    semantics in both engines.  Plan: one day-grain partial agg over
    the scan, then day-grain windows (calendar-bounded — the documented
    global-window exception); corpus size only touches the first agg."""
    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the znorm/dow-anomalies discipline): a quiet
    # calendar day must enter the decomposition as an explicit 0 —
    # grouping only PRESENT days silently stretches the 7-day trend
    # window across calendar gaps and biases trend, seasonal, and
    # every residual the moment any day has no events
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("x0", F.lit(0)).alias("x")
    )
    wtr = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "x",
        (F.dayofweek("day") - 1).alias("dow"),
        F.round(F.avg("x").over(wtr) / 100.0, 4).alias("trend"),
    )
    wse = Window.partitionBy("dow")
    se = tr.select(
        "day",
        "x",
        "trend",
        F.round(F.avg(F.col("x") / 100.0 - F.col("trend")).over(wse), 4).alias(
            "seasonal"
        ),
    )
    return se.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("x") / 100.0, 2).alias("observed"),
        "trend",
        "seasonal",
        F.round(
            F.col("x") / 100.0 - F.col("trend") - F.col("seasonal"), 4
        ).alias("residual"),
    )


@query(
    "orders_skyline_pareto",
    oracle="""
    WITH o2 AS (
      SELECT o_orderkey, o_orderpriority,
             cast(round(o_totalprice * 100) AS BIGINT) AS price_c,
             epoch_us(o_orderdate) AS date_us
      FROM orders
    ),
    fl AS (
      SELECT *,
             max(date_us) OVER (PARTITION BY o_orderpriority
                                ORDER BY price_c
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS best_cheaper,
             max(date_us) OVER (PARTITION BY o_orderpriority, price_c)
               AS best_same_price
      FROM o2
    )
    SELECT o_orderpriority, o_orderkey,
           round(price_c / 100.0, 2) AS o_totalprice,
           date_us
    FROM fl
    WHERE coalesce(best_cheaper >= date_us, FALSE) = FALSE
      AND best_same_price <= date_us
    """,
)
def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) per order priority: the orders no
    other same-priority order dominates on (cheaper-or-equal price,
    newer-or-equal date, one strict) — the multi-objective shortlist
    operator (cheapest-AND-freshest) that no single ORDER BY can
    express.  The naive form is a quadratic dominance self-join; in 2D
    it collapses to one sorted window pass: a point survives iff no
    strictly-cheaper point has date ≥ it (running max over a RANGE
    frame excluding the current price) and no equal-price point has a
    strictly newer date (per-price max) — O(n log n), the
    think-in-Spark rewrite.  Price enters as exact centi-units and
    date as epoch-micros so frame boundaries and comparisons are
    integer-exact on both engines.  Plan: one shuffle on priority,
    two frames over the same sort — no join at all; at 100 TB the
    frontier is computed per partition key with zero pair expansion."""
    o = table(spark, sf_dir, "orders")
    o2 = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("price_c"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("date_us"),
    )
    w_cheaper = (
        Window.partitionBy("o_orderpriority")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("o_orderpriority", "price_c")
    fl = o2.select(
        "*",
        F.max("date_us").over(w_cheaper).alias("best_cheaper"),
        F.max("date_us").over(w_same).alias("best_same_price"),
    )
    return fl.filter(
        (~F.coalesce(F.col("best_cheaper") >= F.col("date_us"), F.lit(False)))
        & (F.col("best_same_price") <= F.col("date_us"))
    ).select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("price_c") / 100.0, 2).alias("o_totalprice"),
        "date_us",
    )


@query(
    "events_hysteresis_alerts",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    th AS (
      SELECT event_type,
             round(cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE)
                   / count(*)
                   + 0.5 * sqrt((cast(sum(cast(value AS DECIMAL(24,10))
                                          * cast(value AS DECIMAL(24,10)))
                                      AS DOUBLE)
                                 - cast(sum(cast(value AS DECIMAL(24,10)))
                                        AS DOUBLE)
                                   * cast(sum(cast(value AS DECIMAL(24,10)))
                                          AS DOUBLE) / count(*))
                                / (count(*) - 1)), 4) AS hi,
             round(cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE)
                   / count(*)
                   - 0.5 * sqrt((cast(sum(cast(value AS DECIMAL(24,10))
                                          * cast(value AS DECIMAL(24,10)))
                                      AS DOUBLE)
                                 - cast(sum(cast(value AS DECIMAL(24,10)))
                                        AS DOUBLE)
                                   * cast(sum(cast(value AS DECIMAL(24,10)))
                                          AS DOUBLE) / count(*))
                                / (count(*) - 1)), 4) AS lo
      FROM events GROUP BY event_type
    ),
    raw AS (
      SELECT d.event_type, d.day, d.total_c, d.n,
             CASE WHEN d.total_c > th.hi * d.n * 100.0 THEN 'alert'
                  WHEN d.total_c < th.lo * d.n * 100.0 THEN 'clear' END
               AS raw_state
      FROM daily d JOIN th ON d.event_type = th.event_type
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           total_c, n,
           coalesce(last_value(raw_state IGNORE NULLS)
                      OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW),
                    'clear') AS state
    FROM raw
    """,
)
def events_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-threshold alerting with hysteresis: a type enters ALERT when
    its daily mean crosses mean+0.5\u03c3 and only returns to CLEAR below
    mean\u22120.5\u03c3 \u2014 the anti-flap state machine every SRE pager uses
    (single-threshold alerts oscillate on boundary noise; compare
    events_slo_burn_rate's windowed form).  The carried state is the
    classic last-non-null window trick (``last(..., ignorenulls)``) \u2014
    no UDF, no recursion, the gaps-and-islands family.  Numeric
    portability: the daily mean is never divided \u2014 the threshold
    comparison is multiplied out to exact integer centi-totals vs
    hi\u00b7n\u00b7100 (a round(...,4) of the tie-PRONE exact-decimal quotient
    sum/n flipped between the engines' rounding implementations; the
    sqrt-laden thresholds round safely because exact .5 ties there are
    measure-zero).  Plan: two partial+final aggs over one scan shape,
    a broadcast threshold join, one type-keyed ordered window \u2014
    day-grain bounded."""
    ev = table(spark, sf_dir, "events")
    dv = "cast(value as decimal(24,10))"
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("total_c"),
        F.count(F.lit(1)).alias("n"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("gn"),
        F.expr(f"cast(sum({dv}) as double)").alias("s1"),
        F.expr(f"cast(sum({dv} * {dv}) as double)").alias("s2"),
    )
    mean = F.col("s1") / F.col("gn")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("gn"))
        / (F.col("gn") - 1)
    )
    th = g.select(
        "event_type",
        F.round(mean + 0.5 * sd, 4).alias("hi"),
        F.round(mean - 0.5 * sd, 4).alias("lo"),
    )
    raw = daily.join(F.broadcast(th), "event_type").select(
        "event_type",
        "day",
        "total_c",
        "n",
        F.when(F.col("total_c") > F.col("hi") * F.col("n") * 100.0, "alert")
        .when(F.col("total_c") < F.col("lo") * F.col("n") * 100.0, "clear")
        .alias("raw_state"),
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return raw.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total_c",
        "n",
        F.coalesce(
            F.last("raw_state", ignorenulls=True).over(w), F.lit("clear")
        ).alias("state"),
    )


#: histogram_quantile targets: (phi, integer percent) pairs — the
#: integer percent drives ALL arithmetic; phi is display-only.
_HQ_PHIS = ((0.5, 50), (0.9, 90), (0.99, 99))


@query(
    "events_histogram_quantile",
    oracle=f"""
    WITH b AS (
      SELECT unnest([{", ".join(str(b) for b in OTEL_BUCKETS)}, 'inf'::DOUBLE])
        AS le
    ),
    agg AS (
      SELECT e.event_type, b.le,
             sum(CASE WHEN e.value <= b.le THEN 1 ELSE 0 END)::BIGINT AS cum
      FROM events e CROSS JOIN b
      GROUP BY e.event_type, b.le
    ),
    tot AS (
      SELECT event_type, count(*) AS total_count FROM events
      GROUP BY event_type
    ),
    q AS (
      SELECT unnest([{", ".join(str(p) for p, _ in _HQ_PHIS)}]) AS phi,
             unnest([{", ".join(str(pc) for _, pc in _HQ_PHIS)}]) AS pct
    ),
    ranked AS (
      SELECT a.event_type, q.phi, q.pct, a.le, a.cum, t.total_count,
             coalesce(lag(a.cum) OVER (PARTITION BY a.event_type, q.pct
                                       ORDER BY a.le), 0)   AS prev_cum,
             coalesce(lag(a.le) OVER (PARTITION BY a.event_type, q.pct
                                      ORDER BY a.le), 0.0)  AS lo
      FROM agg a JOIN tot t USING (event_type) CROSS JOIN q
    ),
    hit AS (
      SELECT *, row_number() OVER (PARTITION BY event_type, pct
                                   ORDER BY le) AS rn
      FROM ranked WHERE 100 * cum >= pct * total_count
    )
    SELECT event_type, phi, total_count,
           CASE WHEN le > {OTEL_BUCKETS[-1]}
                THEN {int(OTEL_BUCKETS[-1] * 1000)}
                ELSE (100 * (cast(lo * 10 AS BIGINT)
                               * (100 * (cum - prev_cum))
                             + (cast(le * 10 AS BIGINT)
                                - cast(lo * 10 AS BIGINT))
                               * (pct * total_count - 100 * prev_cum)))
                     // (100 * (cum - prev_cum))
           END AS q_milli
    FROM hit WHERE rn = 1
    """,
)
def events_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_quantile`` over the OTel explicit-bucket
    histogram: p50/p90/p99 per event type reconstructed from
    CUMULATIVE bucket counts by linear interpolation inside the target
    bucket (clamped to the highest finite bound when the quantile
    lands in +Inf) — exactly how every Prometheus/Grafana latency
    panel computes percentiles from the histogram series the
    reference's /metrics endpoint exposes (InsertLatency,
    internal/metrics/metrics.go:18-24 — a Prometheus histogram whose
    dashboards run exactly this reconstruction;
    events_histogram_otel_buckets is the exposition, this is the
    query side).  Numeric portability went through three designs:
    round(…,4) ties split between engine rounding implementations, and
    even explicit floor(x·1e4) straddled a 1-ulp FMA difference in the
    float interpolation — so the quantile is computed ENTIRELY in
    integer arithmetic (integer percent target, bucket bounds in
    deci-units, exact integer floor-division to milli-units).  Every
    value both engines compare or emit is an integer.  Plan: the
    one-pass bucket agg (8-row broadcast spine, conditional sums),
    then windows over |types|×|φ|×8 rows — nothing data-sized after
    the scan; at extreme totals the numerator wants DECIMAL(38)
    headroom, the one scale note."""
    ev = table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(b,) for b in OTEL_BUCKETS] + [(float("inf"),)], "le double"
    )
    agg = (
        ev.crossJoin(F.broadcast(buckets))
        .groupBy("event_type", "le")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("le"), 1).otherwise(0))
            .cast("long")
            .alias("cum")
        )
    )
    tot = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("total_count"))
    phis = spark.createDataFrame(list(_HQ_PHIS), "phi double, pct long")
    w = Window.partitionBy("event_type", "pct").orderBy("le")
    ranked = (
        agg.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(phis))
        .select(
            "event_type",
            "phi",
            "pct",
            "le",
            "cum",
            "total_count",
            F.coalesce(F.lag("cum").over(w), F.lit(0)).alias("prev_cum"),
            F.coalesce(F.lag("le").over(w), F.lit(0.0)).alias("lo"),
        )
    )
    hit = (
        ranked.filter(100 * F.col("cum") >= F.col("pct") * F.col("total_count"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    lo_d = (F.col("lo") * 10).cast("long")
    le_d = (F.col("le") * 10).cast("long")
    den = 100 * (F.col("cum") - F.col("prev_cum"))
    num = lo_d * den + (le_d - lo_d) * (
        F.col("pct") * F.col("total_count") - 100 * F.col("prev_cum")
    )
    staged = hit.select(
        "event_type",
        "phi",
        "total_count",
        "le",
        num.alias("q_num"),
        den.alias("q_den"),
    )
    return staged.select(
        "event_type",
        "phi",
        "total_count",
        F.when(
            F.col("le") > OTEL_BUCKETS[-1],
            F.lit(int(OTEL_BUCKETS[-1] * 1000)).cast("long"),
        )
        .otherwise(F.expr("(100 * q_num) div q_den"))
        .alias("q_milli"),
    )


@query(
    "events_conversion_latency_curve",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT v.user_id,
             cast(floor((epoch_us(p.p_ts) - epoch_us(v.v_ts))
                        / 86400000000.0) AS BIGINT) AS days
      FROM v JOIN p ON v.user_id = p.user_id
    ),
    hist AS (
      SELECT days, count(*) AS n FROM lat GROUP BY days
    )
    SELECT days, cast(n AS BIGINT) AS n_users,
           cast(sum(n) OVER (ORDER BY days) AS BIGINT) AS cum_users,
           cast(sum(n) OVER () AS BIGINT)              AS total_converted
    FROM hist
    """,
)
def events_conversion_latency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert curve: for every user whose first purchase
    follows their first view, the whole-day latency between the two,
    as a histogram with the cumulative count — the "how long does
    conversion take" CDF that turns events_funnel's WHO into WHEN
    (growth teams read p50/p90 conversion lag off this curve).  Day
    bucketing is an integer floor over exact epoch-micros deltas;
    every emitted number is an exact integer count.  Plan: two
    filtered min-aggs sharing the user_id shuffle key, one join, a
    day-grain histogram — the downstream windows run over ≤ span-days
    rows."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = v.join(p, "user_id").select(
        F.floor(
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 86400000000.0
        )
        .cast("long")
        .alias("days")
    )
    hist = lat.groupBy("days").agg(F.count(F.lit(1)).alias("n"))
    # bounded: day-latency histogram bins — |distinct days| rows, not events
    wc = Window.orderBy("days").rowsBetween(Window.unboundedPreceding, 0)
    wg = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "days",
        F.col("n").cast("long").alias("n_users"),
        F.sum("n").over(wc).cast("long").alias("cum_users"),
        F.sum("n").over(wg).cast("long").alias("total_converted"),
    )


@query(
    "stat_runs_test",
    oracle="""
    WITH bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    byday AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d.day, coalesce(b.x, 0) AS x
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    moves AS (
      SELECT day, x,
             CASE WHEN x > lag(x) OVER (ORDER BY day) THEN 1
                  WHEN x < lag(x) OVER (ORDER BY day) THEN -1 END AS s
      FROM daily
    ),
    signs AS (
      SELECT s, lag(s) OVER (ORDER BY day) AS prev_s
      FROM moves WHERE s IS NOT NULL
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)  AS n_up,
             sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n_down,
             1 + sum(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                          THEN 1 ELSE 0 END)         AS runs
      FROM signs
    )
    SELECT cast(n AS BIGINT)      AS n_moves,
           cast(n_up AS BIGINT)   AS n_up,
           cast(n_down AS BIGINT) AS n_down,
           cast(runs AS BIGINT)   AS runs,
           round((runs - (2.0 * n_up * n_down / n + 1))
                 / sqrt(2.0 * n_up * n_down
                        * (2.0 * n_up * n_down - n)
                        / (1.0 * n * n * (n - 1))), 6) AS z_stat
    FROM agg
    """,
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily total-value series: are
    up/down moves random, trending (too few runs), or mean-reverting
    (too many)?  The sequence-randomness member of the stats family
    (Spearman tests monotone trend; autocorr tests linear memory; this
    tests SIGN memory).  Runs, ups and downs are exact integer counts
    off two day-grain windows; the z statistic's expectation/variance
    formula is sqrt-laden (round(…,6) safe — exact ties are
    measure-zero, the portability ladder's rule 3 exemption).  Plan:
    one day-grain partial agg over the scan, then calendar-bounded
    windows and a single-row reduction."""
    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the seasonal-decompose discipline): the daily
    # VOLUME series is defined over the CALENDAR — a quiet day is a
    # true 0, and present-days-only indexing would misalign the series
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("x0", F.lit(0)).alias("x")
    )
    o = Window.orderBy("day")
    moves = daily.select(
        "day",
        F.when(F.col("x") > F.lag("x").over(o), 1)
        .when(F.col("x") < F.lag("x").over(o), -1)
        .alias("s"),
    ).filter(F.col("s").isNotNull())
    signs = moves.select("s", F.lag("s").over(Window.orderBy("day")).alias("prev_s"))
    agg = signs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n_down"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev_s").isNotNull() & (F.col("s") != F.col("prev_s")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    n, nu, nd, r = (F.col("n"), F.col("n_up"), F.col("n_down"), F.col("runs"))
    expect = 2.0 * nu * nd / n + 1
    var = (
        2.0 * nu * nd * (2.0 * nu * nd - n) / (1.0 * n * n * (n - 1))
    )
    return agg.select(
        n.cast("long").alias("n_moves"),
        nu.cast("long").alias("n_up"),
        nd.cast("long").alias("n_down"),
        r.cast("long").alias("runs"),
        F.round((r - expect) / F.sqrt(var), 6).alias("z_stat"),
    )


@query(
    "stat_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             sum(CASE WHEN (b.day > a.day AND b.x > a.x) THEN 1 ELSE 0 END)
               AS c,
             sum(CASE WHEN (b.day > a.day AND b.x < a.x) THEN 1 ELSE 0 END)
               AS d,
             sum(CASE WHEN (b.day > a.day AND b.x = a.x) THEN 1 ELSE 0 END)
               AS ty
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day > a.day
      GROUP BY a.event_type
    )
    SELECT event_type,
           cast(c AS BIGINT)  AS concordant,
           cast(d AS BIGINT)  AS discordant,
           cast(ty AS BIGINT) AS ties_value,
           round((c - d) / (sqrt(cast(c + d + ty AS DOUBLE))
                            * sqrt(cast(c + d AS DOUBLE))), 6) AS tau_b
    FROM pairs
    """,
)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between time and the daily total per event type —
    the rank correlation that counts CONCORDANT vs DISCORDANT day
    pairs (robust to outliers that still distort Spearman's rank
    distances; together they bracket the monotone-trend question).
    Day pairs are generated by a bounded self-join ON THE DAY-GRAIN
    aggregate — |days|²/2 pairs per type regardless of corpus size, so
    the quadratic lives entirely in calendar space (never row space —
    the wedge-pivot lesson applied to statistics).  Time has no ties
    by construction (days are distinct), so the tie correction reduces
    to the value side; counts are exact integers and the sqrt-laden
    τ-b rounds safely.  Plan: one day-grain partial agg over the scan,
    a broadcast-sized self-join, one final agg."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x"))
    a = daily.select(
        "event_type", F.col("day").alias("a_day"), F.col("x").alias("a_x")
    )
    b = daily.select(
        "event_type", F.col("day").alias("b_day"), F.col("x").alias("b_x")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("b_day") > F.col("a_day"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("b_x") > F.col("a_x"), 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("b_x") < F.col("a_x"), 1).otherwise(0)).alias("d"),
            F.sum(F.when(F.col("b_x") == F.col("a_x"), 1).otherwise(0)).alias("ty"),
        )
    )
    c, d, ty = F.col("c"), F.col("d"), F.col("ty")
    return pairs.select(
        "event_type",
        c.cast("long").alias("concordant"),
        d.cast("long").alias("discordant"),
        ty.cast("long").alias("ties_value"),
        F.round(
            (c - d)
            / (
                F.sqrt((c + d + ty).cast("double"))
                * F.sqrt((c + d).cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )


#: Markov stationary-distribution power iterations (fixed unroll, the
#: graph_pagerank rule) and per-iteration quantization.
_MK_ITERS = 4
_MK_ROUND = 12


def _mk_iter_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT t.dst AS state,
             round(sum({prev}.p * t.prob), {_MK_ROUND}) AS p
      FROM t JOIN {prev} ON t.src = {prev}.state
      GROUP BY t.dst
    )"""


@query(
    "events_markov_stationary",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS (
      SELECT src, dst, count(*) AS n FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    t AS (
      SELECT src, dst,
             round(n / cast(sum(n) OVER (PARTITION BY src) AS DOUBLE),
                   {_MK_ROUND}) AS prob
      FROM c
    ),
    states AS (SELECT DISTINCT src AS state FROM c),
    k AS (SELECT count(*) AS k FROM states),
    p0 AS (
      SELECT state, round(1.0 / (SELECT k FROM k), {_MK_ROUND}) AS p
      FROM states
    ),
    {', '.join(_mk_iter_sql(f'p{i}', f'p{i + 1}') for i in range(_MK_ITERS))}
    SELECT state, round(p, 8) AS stationary_p
    FROM p{_MK_ITERS}
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    ({_MK_ITERS} fixed power iterations from uniform) — where user
    behavior settles in the long run, the eigenvector summary on top
    of events_top_transitions' raw matrix (and the pagerank machinery
    applied to behavioral states instead of graph nodes).  The
    transition matrix is |types|² — broadcast-tiny forever — so every
    iteration is a broadcast join + k-row agg; only the sequence
    extraction (user-keyed lead window over the events) is data-sized,
    and it shuffles once on user_id.  Transition probabilities and each
    iteration's vector are quantized at {_MK_ROUND} decimals on both
    engines (graph_pagerank's round-per-iteration rule) so partial-sum
    order can't compound drift."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    c = c.persist()
    t = c.select(
        "src",
        "dst",
        F.round(
            F.col("n")
            / F.sum("n").over(Window.partitionBy("src")).cast("double"),
            _MK_ROUND,
        ).alias("prob"),
    )
    states = c.select(F.col("src").alias("state")).distinct()
    k = states.count()
    if k == 0:  # empty/single-event corpus: no transitions, no chain
        return spark.createDataFrame([], "state string, stationary_p double")
    p = states.select(
        "state", F.round(F.lit(1.0 / k), _MK_ROUND).alias("p")
    )
    for _ in range(_MK_ITERS):
        p = (
            t.join(p, t.src == p.state)
            .groupBy(F.col("dst").alias("state"))
            .agg(F.round(F.sum(F.col("p") * F.col("prob")), _MK_ROUND).alias("p"))
        )
    return p.select("state", F.round("p", 8).alias("stationary_p"))


#: Right-censoring horizon for the KM retention curve: users whose
#: last event falls within this many days of the corpus end are
#: censored (still active), not churned.
_KM_CENSOR_DAYS = 7
#: Per-factor quantization before the product (round-before-combine).
_KM_ROUND = 12


@query(
    "events_survival_km",
    oracle=f"""
    WITH bounds AS (SELECT max(cast(ts AS DATE)) AS max_day FROM events),
    users AS (
      SELECT user_id,
             min(cast(ts AS DATE)) AS first_day,
             max(cast(ts AS DATE)) AS last_day
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT u.user_id,
             date_diff('day', u.first_day, u.last_day) AS tenure,
             u.last_day < b.max_day - INTERVAL {_KM_CENSOR_DAYS} DAY
               AS churned
      FROM users u CROSS JOIN bounds b
    ),
    churn_times AS (
      SELECT tenure AS t, count(*) AS d FROM obs
      WHERE churned GROUP BY tenure
    ),
    risk AS (
      SELECT ct.t, ct.d,
             (SELECT count(*) FROM obs o WHERE o.tenure >= ct.t) AS n
      FROM churn_times ct
    ),
    factors AS (
      SELECT t, d, n,
             round(1.0 - d / cast(n AS DOUBLE), {_KM_ROUND}) AS f
      FROM risk
    )
    SELECT t AS tenure_days,
           cast(n AS BIGINT) AS n_at_risk,
           cast(d AS BIGINT) AS n_churned,
           round(CASE WHEN min(f) OVER w = 0 THEN 0.0
                      ELSE exp(sum(ln(CASE WHEN f > 0 THEN f ELSE 1 END))
                               OVER w) END, 6) AS survival
    FROM factors
    WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier retention curve over user TENURE (days between
    first and last event), with right-censoring: users still active in
    the final {_KM_CENSOR_DAYS} days are censored, not churned — the
    survival-analysis answer to "how long do users stay" that naive
    churn rates get wrong by ignoring censoring (the cohort/retention
    family's statistically-correct sibling).  S(t) = Π(1 − dᵢ/nᵢ) over
    churn times; each factor is quantized at {_KM_ROUND} before the
    product, and the product runs as exp(Σ ln f) on BOTH engines (no
    product aggregate in Spark) with an explicit zero-factor branch
    (DuckDB refuses ln(0)).  Risk sets come from a day-grain
    tenure-histogram suffix sum, so the curve costs one user agg plus
    calendar-bounded windows.  Plan: user-keyed agg over the scan,
    then everything is ≤ span-days rows."""
    ev = table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    b = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    obs = users.join(F.broadcast(b)).select(
        F.datediff("last_day", "first_day").alias("tenure"),
        (F.col("last_day") < F.date_sub("max_day", _KM_CENSOR_DAYS)).alias(
            "churned"
        ),
    )
    obs = obs.persist()
    churn = obs.filter("churned").groupBy(F.col("tenure").alias("t")).agg(
        F.count(F.lit(1)).alias("d")
    )
    tenure_hist = obs.groupBy(F.col("tenure").alias("ht")).agg(
        F.count(F.lit(1)).alias("hn")
    )
    # suffix-sum the tenure histogram to get n_at_risk(t) = #{tenure >= t}
    wsuf = Window.orderBy(F.col("ht").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = tenure_hist.select(
        "ht", F.sum("hn").over(wsuf).alias("n")
    )
    factors = churn.join(risk, churn.t == risk.ht).select(
        "t",
        "d",
        "n",
        F.round(1.0 - F.col("d") / F.col("n").cast("double"), _KM_ROUND).alias(
            "f"
        ),
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return factors.select(
        F.col("t").cast("long").alias("tenure_days"),
        F.col("n").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.round(
            F.when(F.min("f").over(wc) == 0, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.log(F.when(F.col("f") > 0, F.col("f")).otherwise(1.0))
                    ).over(wc)
                )
            ),
            6,
        ).alias("survival"),
    )


#: Synthetic activity-interval length for the coverage union (micros).
_IVL_LEN_US = 5 * 60 * 1000000


@query(
    "events_interval_union_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_IVL_LEN_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND 1 PRECEDING)
                  OR max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS isl
      FROM flagged
    ),
    merged AS (
      SELECT user_id, isl, min(s) AS ms, max(e) AS me
      FROM islands GROUP BY user_id, isl
    )
    SELECT user_id,
           cast(count(*) AS BIGINT)      AS n_islands,
           cast(sum(me - ms) AS BIGINT)  AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def events_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per user: give every event a 5-minute
    activity interval, merge overlaps, and report the number of merged
    islands and the TOTAL covered time — the measure-of-union operator
    (machine uptime, billable time, sensor coverage) that summing raw
    interval lengths overcounts wherever activity overlaps, and the
    length-valued complement of ``join_interval_overlap`` (which finds
    intersections, not their union).  The classic sweep: order
    intervals by start, a new island begins where the start exceeds
    the running max of PRIOR ends (strictly-preceding frame), islands
    get ids by prefix sum, each island contributes max(end)−min(start).
    All epoch-micros integers.  Plan: one shuffle on user_id, three
    stacked windows over the same sort — no joins, no pair expansion;
    per-user interval counts are bounded by that user's activity."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _IVL_LEN_US).alias("e"),
    )
    wprev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            (F.col("s") > F.max("e").over(wprev))
            | F.max("e").over(wprev).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    wcum = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(wcum).alias("isl")
    )
    merged = islands.groupBy("user_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_us"),
    )


@query(
    "events_poisson_dispersion",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             count(*)                        AS n_days,
             sum(cast(c AS HUGEINT))         AS s1,
             sum(cast(c AS HUGEINT) * c)     AS s2
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           cast(n_days AS BIGINT) AS n_days,
           cast(s1 AS BIGINT)     AS n_events,
           cast((1000000 * (n_days * s2 - s1 * s1))
                // (cast(n_days AS HUGEINT) * s1) AS BIGINT) AS vmr_micro,
           round((cast(n_days * s2 - s1 * s1 AS DOUBLE)
                  / (cast(n_days AS DOUBLE) * s1) - 1.0)
                 * sqrt((n_days - 1) / 2.0), 6) AS dispersion_z
    FROM m
    """,
)
def events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion test on daily arrival counts per event type:
    the variance-to-mean ratio of counts (VMR = 1 under a Poisson
    process; > 1 over-dispersed/bursty, < 1 regular) plus the
    normalized z ≈ (VMR−1)·√((n−1)/2) — the arrival-process member of
    the stats family (text_term_burstiness applies the same statistic
    to term occurrences; this applies it to the CLOCK, which is what
    capacity planning actually consumes).  VMR rides exact integer
    micro-units via floor division; the z carries the sqrt and rounds
    safely.  Plan: one (type, day) partial agg over the scan, then
    per-type moment math on calendar-bounded rows."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("c").cast("decimal(20,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("c").cast("decimal(20,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n_days"), F.col("s1"), F.col("s2")
    num = n.cast("decimal(38,0)") * s2 - s1 * s1
    den = n.cast("decimal(38,0)") * s1
    vmr_f = num.cast("double") / den.cast("double")
    staged = m.select(
        "event_type",
        n.cast("long").alias("n_days"),
        s1.cast("long").alias("n_events"),
        num.alias("num"),
        den.alias("den"),
        vmr_f.alias("vmr_f"),
    )
    return staged.select(
        "event_type",
        "n_days",
        "n_events",
        F.expr("cast((1000000 * num) div den as bigint)").alias("vmr_micro"),
        F.round(
            (F.col("vmr_f") - 1.0)
            * F.sqrt((F.col("n_days") - 1) / 2.0),
            6,
        ).alias("dispersion_z"),
    )


@query(
    "stat_association_measures",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x, date_part('dow', ts) AS y, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    rm AS (SELECT x, sum(n) AS rn FROM cells GROUP BY x),
    cm AS (SELECT y, sum(n) AS cn FROM cells GROUP BY y),
    tot AS (SELECT sum(n) AS t FROM cells),
    chi AS (
      SELECT sum((c.n - rm.rn * cm.cn / cast(tot.t AS DOUBLE))
                 * (c.n - rm.rn * cm.cn / cast(tot.t AS DOUBLE))
                 / (rm.rn * cm.cn / cast(tot.t AS DOUBLE))) AS chi2,
             max(tot.t)                                     AS t,
             (SELECT count(*) FROM rm)                      AS r,
             (SELECT count(*) FROM cm)                      AS k
      FROM cells c
      JOIN rm ON c.x = rm.x JOIN cm ON c.y = cm.y CROSS JOIN tot
    ),
    ent AS (
      SELECT -sum((rm.rn / cast(tot.t AS DOUBLE))
                  * log2(rm.rn / cast(tot.t AS DOUBLE)))      AS hx,
             (SELECT -sum((cn / cast(tot.t AS DOUBLE))
                          * log2(cn / cast(tot.t AS DOUBLE)))
              FROM cm CROSS JOIN tot)                         AS hy,
             (SELECT sum((c.n / cast(tot.t AS DOUBLE))
                         * log2((c.n * cast(tot.t AS DOUBLE))
                                / (cast(rm.rn AS DOUBLE) * cm.cn)))
              FROM cells c JOIN rm ON c.x = rm.x
              JOIN cm ON c.y = cm.y CROSS JOIN tot)           AS mi
      FROM rm CROSS JOIN tot
    )
    SELECT round(sqrt(chi.chi2 / (chi.t * least(chi.r - 1, chi.k - 1))), 6)
             AS cramers_v,
           round(sqrt(greatest(chi.chi2 / chi.t
                               - (chi.r - 1.0) * (chi.k - 1.0) / (chi.t - 1),
                               0)
                      / least(chi.r - (chi.r - 1.0) * (chi.r - 1.0)
                                      / (chi.t - 1) - 1,
                              chi.k - (chi.k - 1.0) * (chi.k - 1.0)
                                      / (chi.t - 1) - 1)), 6)
             AS cramers_v_corrected,
           round(ent.mi / ent.hx, 6) AS theils_u_x_given_y,
           round(ent.mi / ent.hy, 6) AS theils_u_y_given_x
    FROM chi CROSS JOIN ent
    """,
)
def stat_association_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The categorical-association ladder ClickHouse ships as named
    functions — ``cramersV``, ``cramersVBiasCorrected`` (Bergsma's
    correction) and ``theilsU`` both directions — over the event_type ×
    day-of-week contingency table, so a migrating dashboard keeps its
    effect-size panel (stat_chi2_independence gives the significance;
    these give the STRENGTH, and Theil's U is the asymmetric one that
    says which variable predicts which).  All four derive from the
    same exact-integer cells/margins; the float tail is margin-sized
    and sqrt/log-laden (round-6 safe).  Plan: ONE (type, dow) agg over
    the scan feeds every statistic — margins, chi-square and the three
    entropies are all broadcast-sized reductions of the cells."""
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            F.col("event_type").alias("x"),
            (F.dayofweek("ts") - 1).cast("double").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    rm = cells.groupBy("x").agg(F.sum("n").alias("rn"))
    cm = cells.groupBy("y").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("t"))
    r = rm.agg(F.count(F.lit(1)).alias("r"))
    k = cm.agg(F.count(F.lit(1)).alias("k"))
    t = F.col("t").cast("double")
    e = F.col("rn") * F.col("cn") / t
    chi = (
        cells.join(F.broadcast(rm), "x")
        .join(F.broadcast(cm), "y")
        .join(F.broadcast(tot))
        .agg(
            F.sum((F.col("n") - e) * (F.col("n") - e) / e).alias("chi2"),
            F.max("t").alias("t"),
        )
        .join(F.broadcast(r))
        .join(F.broadcast(k))
    )
    hx = (
        rm.join(F.broadcast(tot))
        .agg((-F.sum((F.col("rn") / t) * F.log2(F.col("rn") / t))).alias("hx"))
    )
    hy = (
        cm.join(F.broadcast(tot))
        .agg((-F.sum((F.col("cn") / t) * F.log2(F.col("cn") / t))).alias("hy"))
    )
    mi = (
        cells.join(F.broadcast(rm), "x")
        .join(F.broadcast(cm), "y")
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("n") / t)
                * F.log2(
                    (F.col("n") * t)
                    / (F.col("rn").cast("double") * F.col("cn"))
                )
            ).alias("mi")
        )
    )
    rr, kk, tt = (
        F.col("r").cast("double"),
        F.col("k").cast("double"),
        F.col("t").cast("double"),
    )
    phi2 = F.col("chi2") / tt
    phi2c = F.greatest(
        phi2 - (rr - 1) * (kk - 1) / (tt - 1), F.lit(0.0)
    )
    rc = rr - (rr - 1) * (rr - 1) / (tt - 1)
    kc = kk - (kk - 1) * (kk - 1) / (tt - 1)
    return (
        chi.join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .join(F.broadcast(mi))
        .select(
            F.round(F.sqrt(phi2 / F.least(rr - 1, kk - 1)), 6).alias("cramers_v"),
            F.round(
                F.sqrt(phi2c / F.least(rc - 1, kc - 1)), 6
            ).alias("cramers_v_corrected"),
            F.round(F.col("mi") / F.col("hx"), 6).alias("theils_u_x_given_y"),
            F.round(F.col("mi") / F.col("hy"), 6).alias("theils_u_y_given_x"),
        )
    )


@query(
    "events_max_concurrency",
    oracle=f"""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s,
             epoch_us(ts) + {_IVL_LEN_US} AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 FROM iv
    ),
    swept AS (
      SELECT event_type, t, delta,
             sum(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS open
      FROM pts
    ),
    peaks AS (
      SELECT event_type, max(open) AS peak FROM swept GROUP BY event_type
    )
    SELECT s.event_type,
           cast(p.peak AS BIGINT) AS max_concurrent,
           cast(min(s.t) AS BIGINT) AS first_peak_us
    FROM swept s JOIN peaks p
      ON s.event_type = p.event_type AND s.open = p.peak
    GROUP BY s.event_type, p.peak
    """,
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type — ClickHouse's
    ``maxIntersections`` / ``maxIntersectionsPosition`` pair: the
    maximum number of simultaneously-open 5-minute activity intervals
    and the earliest instant it is reached, the capacity-planning
    number ("size for the peak, not the mean") that the interval-UNION
    operator (events_interval_union_coverage) deliberately doesn't
    see.  The classic sweep: every interval contributes a +1 at open
    and a −1 at close, sorted with +1 BEFORE −1 at equal timestamps
    (touching intervals count as concurrent, matching ClickHouse), and
    the running sum's maximum is the answer.  Exact integers
    everywhere.  Plan: one shuffle on event_type, one ordered window
    over 2·n points, two tiny aggs — linear, no joins against
    data-sized sides."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _IVL_LEN_US).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("t"), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    swept = pts.select(
        "event_type", "t", F.sum("delta").over(w).alias("open")
    )
    peaks = swept.groupBy("event_type").agg(F.max("open").alias("peak"))
    return (
        swept.join(
            F.broadcast(peaks),
            ["event_type"],
        )
        .filter(F.col("open") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("first_peak_us"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("max_concurrent"),
            F.col("first_peak_us").cast("long").alias("first_peak_us"),
        )
    )


#: LTTB output size (buckets incl. the pinned endpoints).
_LTTB_N_OUT = 20


def _lttb_select(pdf):
    """Largest-Triangle-Three-Buckets over one ordered series (numpy;
    the group is the day-grain series — calendar-bounded math)."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("t").reset_index(drop=True)
    t = pdf["t"].to_numpy(dtype=np.float64)
    x = pdf["x"].to_numpy(dtype=np.float64)
    n = len(t)
    n_out = min(_LTTB_N_OUT, n)
    if n_out == n:
        keep = list(range(n))
    else:
        keep = [0]
        every = (n - 2) / (n_out - 2)
        a = 0
        for i in range(n_out - 2):
            lo = int(np.floor(i * every) + 1)
            hi = int(np.floor((i + 1) * every) + 1)
            hi = min(hi, n - 1)
            nlo = int(np.floor((i + 1) * every) + 1)
            nhi = min(int(np.floor((i + 2) * every) + 1), n)
            avg_t = t[nlo:nhi].mean() if nhi > nlo else t[-1]
            avg_x = x[nlo:nhi].mean() if nhi > nlo else x[-1]
            area = np.abs(
                (t[a] - avg_t) * (x[lo:hi] - x[a])
                - (t[a] - t[lo:hi]) * (avg_x - x[a])
            )
            a = lo + int(area.argmax())
            keep.append(a)
        keep.append(n - 1)
    out = pdf.iloc[keep].copy()
    out["rank"] = range(1, len(keep) + 1)
    return out[["rank", "t", "x"]]


@query(
    "events_lttb_downsample",
    oracle=f"""
    WITH RECURSIVE bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    days AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    by_day AS (
      SELECT ts::DATE AS day,
             sum(cast(round(value * 100) AS BIGINT)) AS x0
      FROM events GROUP BY 1
    ),
    ser AS (
      SELECT row_number() OVER (ORDER BY d.day) - 1 AS idx,
             cast(d.day - DATE '2020-01-01' AS DOUBLE) AS t,
             cast(coalesce(b.x0, 0) AS DOUBLE) AS x
      FROM days d LEFT JOIN by_day b USING (day)
    ),
    nn AS (
      SELECT count(*)::BIGINT AS n,
             least({_LTTB_N_OUT}, count(*))::BIGINT AS n_out
      FROM ser
    ),
    -- bucket geometry mirrors the kernel's float math exactly:
    -- every = (n-2)/(n_out-2) in double, floor() per boundary
    buckets AS (
      SELECT g.i,
             cast(floor(g.i * e.every) + 1 AS BIGINT)                      AS lo,
             least(cast(floor((g.i + 1) * e.every) + 1 AS BIGINT), e.n - 1) AS hi,
             cast(floor((g.i + 1) * e.every) + 1 AS BIGINT)                AS nlo,
             least(cast(floor((g.i + 2) * e.every) + 1 AS BIGINT), e.n)    AS nhi
      FROM (SELECT n, n_out,
                   (n - 2) / (n_out - 2.0) AS every
            FROM nn WHERE n > n_out) e,
           (SELECT unnest(generate_series(0, (SELECT n_out FROM nn) - 3)) AS i) g
    ),
    bavg AS (
      SELECT b.i, b.lo, b.hi,
             coalesce((SELECT avg(s.t) FROM ser s
                       WHERE s.idx >= b.nlo AND s.idx < b.nhi),
                      (SELECT t FROM ser
                       WHERE idx = (SELECT n - 1 FROM nn))) AS avg_t,
             coalesce((SELECT avg(s.x) FROM ser s
                       WHERE s.idx >= b.nlo AND s.idx < b.nhi),
                      (SELECT x FROM ser
                       WHERE idx = (SELECT n - 1 FROM nn))) AS avg_x
      FROM buckets b
    ),
    -- the greedy walk: each step's pick depends ONLY on the previous
    -- pick and the (precomputed) next-bucket mean, so the recursion
    -- carries a single index — the Holt-oracle technique applied to
    -- an argmax instead of a smoothing fold
    sel AS (
      SELECT -1::BIGINT AS i, 0::BIGINT AS a
      UNION ALL
      SELECT b.i,
             (SELECT s.idx
              FROM ser s, ser pa
              WHERE s.idx >= b.lo AND s.idx < b.hi AND pa.idx = sel.a
              ORDER BY abs((pa.t - b.avg_t) * (s.x - pa.x)
                           - (pa.t - s.t) * (b.avg_x - pa.x)) DESC,
                       s.idx ASC
              LIMIT 1) AS a
      FROM sel JOIN bavg b ON b.i = sel.i + 1
    ),
    picks AS (
      SELECT idx FROM ser
      WHERE (SELECT n FROM nn) <= (SELECT n_out FROM nn)
      UNION ALL
      SELECT a FROM sel
      WHERE (SELECT n FROM nn) > (SELECT n_out FROM nn)
      UNION ALL
      SELECT (SELECT n - 1 FROM nn)
      WHERE (SELECT n FROM nn) > (SELECT n_out FROM nn)
    )
    SELECT cast(row_number() OVER (ORDER BY p.idx) AS BIGINT) AS rank,
           cast(s.t AS BIGINT) AS day_index,
           s.x / 100.0 AS total_value
    FROM picks p JOIN ser s ON s.idx = p.idx
    """,
)
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the daily
    total-value series to {_LTTB_N_OUT} points — ClickHouse's ``lttb``
    / ``largestTriangleThreeBuckets`` function: the plot-fidelity
    downsampler every monitoring UI runs before rendering a year of
    points into a 400-pixel sparkline (uniform sampling flattens
    spikes; LTTB keeps the visually-dominant extremes by maximizing
    triangle area against the previous pick and the next bucket's
    mean).  Greedy with a sequential dependency on the previous
    selection — but each step depends ONLY on (previous pick,
    precomputed next-bucket mean), so a recursive CTE carrying the
    single pick index expresses it in SQL (the Holt-oracle technique
    applied to an argmax instead of a smoothing fold — VERDICT r13
    ask #5; hash-checked at sf0.001/0.01/0.1), closing the timeseries
    family's last oracle-less daily-series op.  The structural pytest
    gate (pinned endpoints, one pick per bucket, ordered output)
    stays.  Plan: corpus-sized work is only the day-grain partial
    agg; the selection runs in one Arrow-grouped kernel over the
    calendar-bounded series."""
    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the seasonal-decompose discipline): LTTB's
    # triangle areas are computed in (t, x) coordinates — gaps used to
    # enter as long flat edges between non-adjacent t values, hiding
    # the true plunge-to-zero shape the sparkline should keep
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("x0", F.lit(0)).alias("x")
    )
    series = daily.select(
        F.lit(1).alias("g"),
        F.datediff(F.col("day"), F.lit("2020-01-01")).cast("double").alias("t"),
        F.col("x").cast("double").alias("x"),
    )
    out = series.groupBy("g").applyInPandas(
        lambda pdf: _lttb_select(pdf), "rank long, t double, x double"
    )
    return out.select(
        "rank",
        F.col("t").cast("long").alias("day_index"),
        (F.col("x") / 100.0).alias("total_value"),
    )


#: Journey-path report depth.
_PATHS_TOPK = 20


@query(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events
    ),
    paths AS (
      SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n
      FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    )
    SELECT path, cast(n AS BIGINT) AS n,
           cast(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rn
    FROM paths
    ORDER BY rn LIMIT {_PATHS_TOPK}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: the most frequent ordered TRIPLES of
    consecutive event types per user (the Sankey/flow diagram's data),
    one step deeper than events_top_transitions' bigram matrix — the
    difference between "click follows view" and "view > click >
    purchase is the converting corridor".  Two lead windows over the
    same user-keyed sort (one shuffle), a path string agg with
    map-side combine (path cardinality ≤ |types|³ — tiny forever),
    and a TakeOrdered top-{_PATHS_TOPK}.  Exact integer counts."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(" > ", "e1", "e2", "e3").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    # bounded: path domain <= |event_types|^3 (tiny forever, per docstring)
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        paths.withColumn("rn", F.row_number().over(wr).cast("long"))
        .filter(F.col("rn") <= _PATHS_TOPK)
        .select("path", F.col("n").cast("long").alias("n"), "rn")
    )


#: XYZ variability thresholds on the coefficient of variation.
_XYZ_X_CV = 0.5   # CV < 0.5  -> X (steady)
_XYZ_Y_CV = 1.0   # CV < 1.0  -> Y (variable); else Z (erratic)


@query(
    "orders_xyz_class",
    oracle=f"""
    WITH weekly AS (
      SELECT l.l_partkey AS part,
             date_trunc('week', o.o_orderdate) AS wk,
             cast(sum(cast(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT part,
             count(*)                    AS n_weeks,
             sum(cast(q AS HUGEINT))     AS s1,
             sum(cast(q AS HUGEINT) * q) AS s2
      FROM weekly GROUP BY part
    ),
    scored AS (
      SELECT part, n_weeks, s1, s2,
             -- multiply-out: CV >= t  <=>  n*(n*s2 - s1^2) >= t^2*(n-1)*s1^2
             -- (population->sample var with the (n-1); thresholds as
             -- exact integer ratios 1/2 and 1/1)
             n_weeks * (n_weeks * s2 - s1 * s1)               AS var_num,
             cast((n_weeks - 1) AS HUGEINT) * s1 * s1         AS mean_den
      FROM m WHERE n_weeks >= 2 AND s1 > 0
    )
    SELECT CASE WHEN 4 * var_num < mean_den THEN 'X'
                WHEN var_num < mean_den     THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           cast(count(*) AS BIGINT)        AS n_parts,
           cast(sum(s1) AS BIGINT)         AS total_qty,
           cast(min(part) AS BIGINT)       AS example_part
    FROM scored GROUP BY 1
    """,
)
def orders_xyz_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification per part — the
    coefficient-of-variation companion to ``orders_abc_class`` (ABC
    ranks by VOLUME, XYZ by PREDICTABILITY; the ABC-XYZ matrix is the
    standard inventory-policy grid): weekly demand per part, CV of the
    weekly series, X < {_XYZ_X_CV} steady / Y < {_XYZ_Y_CV} variable /
    Z erratic.  The class boundary never touches a float: CV ≥ t is
    multiplied out to n·(n·Σq²−(Σq)²) ≥ t²·(n−1)·(Σq)² with the
    thresholds as exact integer ratios (4·var_num vs mean_den for
    t=1/2) — the portability ladder's rule for ratio comparisons.
    Plan: one join + (part, week) partial agg carry all the
    data-sized work; moments and classes are per-part arithmetic."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    weekly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
        )
        .agg(
            F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias("q")
        )
    )
    m = weekly.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum(F.col("q").cast("decimal(20,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("q").cast("decimal(20,0)") * F.col("q"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n_weeks"), F.col("s1"), F.col("s2")
    scored = m.filter((n >= 2) & (s1 > 0)).select(
        "part",
        s1.alias("s1"),
        (n.cast("decimal(38,0)") * (n.cast("decimal(38,0)") * s2 - s1 * s1)).alias(
            "var_num"
        ),
        ((n - 1).cast("decimal(38,0)") * s1 * s1).alias("mean_den"),
    )
    cls = (
        F.when(4 * F.col("var_num") < F.col("mean_den"), "X")
        .when(F.col("var_num") < F.col("mean_den"), "Y")
        .otherwise("Z")
    )
    return scored.groupBy(cls.alias("xyz_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("s1").cast("long").alias("total_qty"),
        F.min("part").cast("long").alias("example_part"),
    )


#: Bot-detection rule constants (all thresholds enter as exact
#: integer ratios via multiply-out comparisons).
_BOT_MAX_AVG_GAP_US = 3600 * 1000000   # mean interarrival < 1 hour
_BOT_SHARE_NUM, _BOT_SHARE_DEN = 4, 5  # one type >= 80% of events
_BOT_VMR_NUM, _BOT_VMR_DEN = 9, 100    # gap VMR < 0.09 (metronomic)
_BOT_MIN_EVENTS = 20


@query(
    "events_bot_score",
    oracle=f"""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS t,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             count(*)                          AS n_gaps,
             sum(cast(gap AS HUGEINT))         AS s1,
             sum(cast(gap AS HUGEINT) * gap)   AS s2
      FROM g WHERE gap IS NOT NULL GROUP BY user_id
    ),
    types AS (
      SELECT user_id, count(*) AS n, max(c) AS top_c
      FROM (SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY 1, 2) tc
      GROUP BY user_id
    ),
    tot AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
    feat AS (
      SELECT t.user_id, t.n_events, gaps.n_gaps, gaps.s1, gaps.s2,
             ty.top_c,
             CASE WHEN gaps.s1 < {_BOT_MAX_AVG_GAP_US}::HUGEINT * gaps.n_gaps
                  THEN 1 ELSE 0 END AS f_rate,
             CASE WHEN {_BOT_SHARE_DEN} * ty.top_c
                       >= {_BOT_SHARE_NUM} * t.n_events
                  THEN 1 ELSE 0 END AS f_monotype,
             CASE WHEN gaps.n_gaps >= 2 AND
                       {_BOT_VMR_DEN}::HUGEINT * gaps.n_gaps
                         * (gaps.n_gaps * gaps.s2 - gaps.s1 * gaps.s1)
                       < {_BOT_VMR_NUM}::HUGEINT * (gaps.n_gaps - 1)
                         * gaps.s1 * gaps.s1
                  THEN 1 ELSE 0 END AS f_metronome
      FROM tot t
      JOIN gaps ON t.user_id = gaps.user_id
      JOIN types ty ON t.user_id = ty.user_id
      WHERE t.n_events >= {_BOT_MIN_EVENTS}
    )
    SELECT user_id,
           cast(n_events AS BIGINT)                    AS n_events,
           cast(f_rate AS BIGINT)                      AS f_rate,
           cast(f_monotype AS BIGINT)                  AS f_monotype,
           cast(f_metronome AS BIGINT)                 AS f_metronome,
           (f_rate + f_monotype + f_metronome >= 2)    AS is_bot
    FROM feat
    """,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot/automation detection per user — the behavioral
    classifier abuse teams run before any ML: three features over a
    user's event stream (sub-hour mean interarrival; one event type ≥
    80% of traffic; metronomic timing, gap VMR < 0.09), two-of-three
    flags a bot.  The per-series complement of events_anomaly_zscore
    (which watches the aggregate clock).  EVERY threshold is an exact
    integer multiply-out — rate (Σgap < cap·n), share (5·top ≥ 4·n)
    and regularity (the XYZ-class moment comparison) — so no float
    exists anywhere in the decision path.  Plan: one user-keyed lag
    window plus two partial+final aggs sharing the user_id shuffle
    key; per-user moment math after."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    gaps = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap").cast("decimal(20,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("gap").cast("decimal(20,0)") * F.col("gap"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    types = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").alias("top_c"))
    )
    tot = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    ng, s1, s2 = F.col("n_gaps"), F.col("s1"), F.col("s2")
    f_rate = F.when(
        s1 < F.lit(_BOT_MAX_AVG_GAP_US).cast("decimal(38,0)") * ng, 1
    ).otherwise(0)
    f_mono = F.when(
        _BOT_SHARE_DEN * F.col("top_c") >= _BOT_SHARE_NUM * F.col("n_events"), 1
    ).otherwise(0)
    f_metro = F.when(
        (ng >= 2)
        & (
            F.lit(_BOT_VMR_DEN).cast("decimal(38,0)")
            * ng
            * (ng * s2 - s1 * s1)
            < F.lit(_BOT_VMR_NUM).cast("decimal(38,0)") * (ng - 1) * s1 * s1
        ),
        1,
    ).otherwise(0)
    feat = (
        tot.join(gaps, "user_id")
        .join(types, "user_id")
        .filter(F.col("n_events") >= _BOT_MIN_EVENTS)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            f_rate.cast("long").alias("f_rate"),
            f_mono.cast("long").alias("f_monotype"),
            f_metro.cast("long").alias("f_metronome"),
        )
    )
    return feat.withColumn(
        "is_bot",
        (F.col("f_rate") + F.col("f_monotype") + F.col("f_metronome")) >= 2,
    )


#: Dead-air report depth (longest gaps per type).
_DEADAIR_TOPK = 10
_US_PER_HOUR = 3600 * 1000000


@query(
    "events_dead_air_gaps",
    oracle=f"""
    WITH obs AS (
      SELECT DISTINCT event_type,
             epoch_us(ts) // {_US_PER_HOUR} AS h
      FROM events
    ),
    span AS (SELECT min(h) AS mn, max(h) AS mx FROM obs),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM obs) t
      CROSS JOIN (SELECT unnest(range((SELECT mn FROM span),
                                      (SELECT mx FROM span) + 1)) AS h) g
    ),
    missing AS (
      SELECT s.event_type, s.h
      FROM spine s LEFT JOIN obs
        ON obs.event_type = s.event_type AND obs.h = s.h
      WHERE obs.h IS NULL
    ),
    isl AS (
      SELECT event_type, h,
             h - row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS grp
      FROM missing
    ),
    gaps AS (
      SELECT event_type, min(h) AS start_h, count(*) AS gap_hours
      FROM isl GROUP BY event_type, grp
    )
    SELECT event_type,
           cast(start_h * {_US_PER_HOUR} AS BIGINT) AS gap_start_us,
           cast(gap_hours AS BIGINT)                AS gap_hours,
           cast(rn AS BIGINT)                       AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY gap_hours DESC, start_h)
                    AS rn
          FROM gaps) t
    WHERE rn <= {_DEADAIR_TOPK}
    """,
)
def events_dead_air_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-air detection: the longest runs of consecutive HOURS with
    zero events per type — monitoring's "no data is also a signal"
    alert (an outage shows as silence, which threshold alerts on
    values can never fire on; the inverse of events_streaks' activity
    islands).  Absence is materialized by anti-joining an hour spine
    against observed hours, then the classic index-minus-row_number
    island grouping; hour indexes are exact integer floor-divisions of
    epoch-micros.  Plan: the observed-hours distinct is the only
    data-sized stage (partial agg); the spine is |types|×span-hours —
    calendar-bounded — and everything after lives there.  Top-10
    longest per type keeps the report bounded."""
    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        (F.unix_micros("ts") / _US_PER_HOUR).cast("long").alias("h"),
    ).distinct()
    obs = obs.persist()
    span = obs.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    types = obs.select("event_type").distinct()
    spine = (
        F.broadcast(types)
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("h"),
        )
    )
    missing = spine.join(obs, ["event_type", "h"], "left_anti")
    wi = Window.partitionBy("event_type").orderBy("h")
    isl = missing.select(
        "event_type", "h", (F.col("h") - F.row_number().over(wi)).alias("grp")
    )
    gaps = isl.groupBy("event_type", "grp").agg(
        F.min("h").alias("start_h"), F.count(F.lit(1)).alias("gap_hours")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("gap_hours").desc(), F.col("start_h")
    )
    return (
        gaps.withColumn("rn", F.row_number().over(wr).cast("long"))
        .filter(F.col("rn") <= _DEADAIR_TOPK)
        .select(
            "event_type",
            (F.col("start_h") * _US_PER_HOUR).cast("long").alias("gap_start_us"),
            F.col("gap_hours").cast("long").alias("gap_hours"),
            "rn",
        )
    )


#: Price-dispersion report depth.
_DISPERSION_TOPK = 20


@query(
    "orders_price_dispersion",
    oracle=f"""
    WITH px AS (
      SELECT l_partkey AS part,
             cast(round(l_quantity) AS BIGINT)             AS qty,
             cast(round(l_extendedprice * 100) AS BIGINT)  AS price_c
      FROM lineitem
    ),
    g AS (
      SELECT part, qty,
             count(*)       AS n_sales,
             min(price_c)   AS min_c,
             max(price_c)   AS max_c
      FROM px GROUP BY part, qty
      HAVING count(*) >= 2
    )
    SELECT part, qty, cast(n_sales AS BIGINT) AS n_sales,
           round(min_c / 100.0, 2) AS min_price,
           round(max_c / 100.0, 2) AS max_price,
           cast(max_c - min_c AS BIGINT) AS spread_c,
           cast(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (ORDER BY max_c - min_c DESC,
                                       part, qty) AS rn
          FROM g) t
    WHERE rn <= {_DISPERSION_TOPK}
    """,
)
def orders_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-dispersion scan: for the same part at the same quantity,
    the spread between the cheapest and dearest charged total — the
    procurement-anomaly sweep ("who paid list price while everyone
    else got the discount"), top-{_DISPERSION_TOPK} by spread.
    Grouping on (part, quantity) keeps every compared number an exact
    centi-unit integer — no unit-price RATIO ever exists, which is
    what makes the whole query float-free (a ratio would re-import the
    quotient-rounding tie problem).  Plan: one partial+final agg on
    the composite key, then a TakeOrdered top-k — min/max combine
    map-side, the group count is bounded by the part×qty domain."""
    li = table(spark, sf_dir, "lineitem")
    px = li.select(
        F.col("l_partkey").alias("part"),
        F.expr("cast(round(l_quantity) as bigint)").alias("qty"),
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("price_c"),
    )
    g = (
        px.groupBy("part", "qty")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            F.min("price_c").alias("min_c"),
            F.max("price_c").alias("max_c"),
        )
        .filter(F.col("n_sales") >= 2)
    )
    w = Window.orderBy(
        (F.col("max_c") - F.col("min_c")).desc(), F.col("part"), F.col("qty")
    )
    return (
        g.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _DISPERSION_TOPK)
        .select(
            "part",
            "qty",
            F.col("n_sales").cast("long").alias("n_sales"),
            F.round(F.col("min_c") / 100.0, 2).alias("min_price"),
            F.round(F.col("max_c") / 100.0, 2).alias("max_price"),
            (F.col("max_c") - F.col("min_c")).cast("long").alias("spread_c"),
            "rn",
        )
    )


@query(
    "events_correlated_anomalies",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             count(*)                        AS n,
             sum(cast(x AS HUGEINT))         AS s1,
             sum(cast(x AS HUGEINT) * x)     AS s2
      FROM daily GROUP BY event_type
    ),
    flagged AS (
      SELECT d.day, d.event_type
      FROM daily d JOIN m ON d.event_type = m.event_type
      -- |x - mean| > 2*sigma, multiplied out to integers:
      -- (n-1)*(n*x - s1)^2 > 4*n*(n*s2 - s1^2)
      WHERE (m.n - 1) * (m.n * d.x - m.s1) * (m.n * d.x - m.s1)
            > 4::HUGEINT * m.n * (m.n * m.s2 - m.s1 * m.s1)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           cast(count(*) AS BIGINT)  AS n_anomalous_types,
           string_agg(event_type, ',' ORDER BY event_type) AS types
    FROM flagged
    GROUP BY day HAVING count(*) >= 2
    """,
)
def events_correlated_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-anomaly days: dates where TWO OR MORE event types are
    simultaneously beyond 2σ of their own daily-total distribution —
    the incident-correlation signal (one series spiking is noise; five
    spiking together is an outage or a launch), which the per-series
    detector (events_anomaly_zscore) structurally cannot see.  The 2σ
    test is fully multiplied out to integer moments —
    (n−1)·(n·x−s1)² > 4·n·(n·s2−s1²) — so no σ, no mean and no float
    exist anywhere; the day's type list rides a sorted string_agg.
    Plan: one (type, day) partial agg over the scan, type-level
    moments broadcast back over the day grain, a day-keyed count —
    everything after the scan is calendar-bounded."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(20,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    dev = n.cast("decimal(38,0)") * F.col("x") - s1
    flagged = daily.join(F.broadcast(m), "event_type").filter(
        (n - 1).cast("decimal(38,0)") * dev * dev
        > F.lit(4).cast("decimal(38,0)")
        * n
        * (n.cast("decimal(38,0)") * s2 - s1 * s1)
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anomalous_types"),
            F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias(
                "types"
            ),
        )
        .filter(F.col("n_anomalous_types") >= 2)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_anomalous_types",
            "types",
        )
    )


@query(
    "orders_revenue_share_hierarchy",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(cast(round(o.o_totalprice * 100) AS HUGEINT)) AS rev_c
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           cast(rev_c AS BIGINT) AS revenue_c,
           cast((1000000 * rev_c) // sum(rev_c) OVER (PARTITION BY region)
                AS BIGINT) AS share_of_region_micro,
           cast((1000000 * sum(rev_c) OVER (PARTITION BY region))
                // sum(rev_c) OVER () AS BIGINT) AS region_share_micro
    FROM rev
    """,
)
def orders_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent reporting down the geography hierarchy — each
    nation's share of its region's revenue and each region's share of
    the total (the ``ratio_to_report`` idiom every BI rollup ships,
    distinct from rollup/cube which give LEVELS, not shares).  Shares
    are exact integer micro-units via floor division over exact
    centi-revenue sums (the ratio itself never exists as a float —
    the dispersion/XYZ rule).  Plan: the fact table shuffles once for
    the (region, nation) agg with all three dimensions broadcast
    (classic star shape); both share windows then run over ≤
    |nations| rows."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.expr("cast(round(o_totalprice * 100) as decimal(38,0))"))
            .cast("decimal(38,0)")
            .alias("rev_c")
        )
    )
    wreg = Window.partitionBy("region")
    wall = Window.partitionBy(F.lit(1))
    staged = rev.select(
        "region",
        "nation",
        "rev_c",
        F.sum("rev_c").over(wreg).alias("reg_c"),
        F.sum("rev_c").over(wall).alias("tot_c"),
    )
    return staged.select(
        "region",
        "nation",
        F.col("rev_c").cast("long").alias("revenue_c"),
        F.expr("cast((1000000 * rev_c) div reg_c as bigint)").alias(
            "share_of_region_micro"
        ),
        F.expr("cast((1000000 * reg_c) div tot_c as bigint)").alias(
            "region_share_micro"
        ),
    )


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    byday AS (
      SELECT cast(ts AS DATE) AS day,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d.day, coalesce(b.x, 0) AS x
      FROM dayspine d LEFT JOIN byday b ON b.day = d.day
    ),
    tr AS (
      SELECT day, x, date_part('dow', day) AS dow,
             round(avg(x) OVER (ORDER BY day
                                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   / 100.0, 4) AS trend
      FROM daily
    ),
    se AS (
      SELECT day, x, trend,
             round(avg(x / 100.0 - trend) OVER (PARTITION BY dow), 4)
               AS seasonal
      FROM tr
    ),
    res AS (
      SELECT day,
             cast(round((x / 100.0 - trend - seasonal) * 10000) AS BIGINT)
               AS r_scaled
      FROM se
    ),
    m AS (
      SELECT count(*)                             AS n,
             sum(cast(r_scaled AS HUGEINT))       AS s1,
             sum(cast(r_scaled AS HUGEINT) * r_scaled) AS s2
      FROM res
    )
    SELECT strftime(res.day, '%Y-%m-%d') AS day,
           round(res.r_scaled / 10000.0, 4) AS residual,
           (m.n - 1) * (m.n * res.r_scaled - m.s1)
             * (m.n * res.r_scaled - m.s1)
             > 9::HUGEINT * m.n * (m.n * m.s2 - m.s1 * m.s1) AS is_anomaly
    FROM res CROSS JOIN m
    WHERE (m.n - 1) * (m.n * res.r_scaled - m.s1)
            * (m.n * res.r_scaled - m.s1)
          > 9::HUGEINT * m.n * (m.n * m.s2 - m.s1 * m.s1)
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly days: flag where the RESIDUAL of
    the trend+weekly decomposition (events_seasonal_decompose's exact
    pipeline) sits beyond 3σ of the residual distribution — the
    statistically honest alert (a raw-value detector fires every
    weekend; deseasonalizing first is why STL exists).  The PER-TYPE
    twin (which event type broke, fixed 4-week window, no trend term)
    is ``events_dow_anomalies_by_type`` in timeseries.py.  Residuals are
    already quantized at 1e-4, so scaling by 10⁴ makes them exact
    integers and the 3σ test multiplies out to
    (n−1)·(n·r−s1)² > 9·n·(n·s2−s1²) — no σ, no float in the
    decision (the correlated-anomalies rule applied post-decompose).
    Plan: the day-grain decompose windows feed one residual-moment
    agg; everything after the first partial agg is calendar-bounded."""
    ev = table(spark, sf_dir, "events")
    # DENSE day spine (the znorm/dow-anomalies discipline): a quiet
    # calendar day must enter the decomposition as an explicit 0 —
    # grouping only PRESENT days silently stretches the 7-day trend
    # window across calendar gaps and biases trend, seasonal, and
    # every residual the moment any day has no events
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    by_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x0")
    )
    daily = dayspine.join(by_day, "day", "left").select(
        "day", F.coalesce("x0", F.lit(0)).alias("x")
    )
    wtr = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "x",
        (F.dayofweek("day") - 1).alias("dow"),
        F.round(F.avg("x").over(wtr) / 100.0, 4).alias("trend"),
    )
    wse = Window.partitionBy("dow")
    se = tr.select(
        "day",
        "x",
        "trend",
        F.round(F.avg(F.col("x") / 100.0 - F.col("trend")).over(wse), 4).alias(
            "seasonal"
        ),
    )
    res = se.select(
        "day",
        F.expr(
            "cast(round((x / 100.0 - trend - seasonal) * 10000) as bigint)"
        ).alias("r_scaled"),
    )
    m = res.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r_scaled").cast("decimal(20,0)"))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.col("r_scaled").cast("decimal(20,0)") * F.col("r_scaled"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    dev = n.cast("decimal(38,0)") * F.col("r_scaled") - s1
    cond = (n - 1).cast("decimal(38,0)") * dev * dev > F.lit(9).cast(
        "decimal(38,0)"
    ) * n * (n.cast("decimal(38,0)") * s2 - s1 * s1)
    return (
        res.crossJoin(F.broadcast(m))
        .filter(cond)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("r_scaled") / 10000.0, 4).alias("residual"),
            F.lit(True).alias("is_anomaly"),
        )
    )


@query(
    "events_gini_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(*) AS x FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
             count(*) OVER () AS n, sum(x) OVER () AS sx
      FROM per_user
    ),
    agg AS (
      SELECT max(n) AS n, max(sx) AS sx,
             sum(cast(i AS HUGEINT) * x) AS six
      FROM ranked
    )
    SELECT cast(n AS BIGINT)  AS n_users,
           cast(sx AS BIGINT) AS n_events,
           cast((1000000 * (2 * six - (n + 1) * cast(sx AS HUGEINT)))
                // (cast(n AS HUGEINT) * sx) AS BIGINT) AS gini_micro
    FROM agg
    """,
)
def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume — the one-number
    inequality summary (0 = uniform, →1 = one user is all traffic)
    that events_pareto_users' cumulative-share TABLE integrates into a
    single trend-able metric.  The rank formula
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx) over ascending-sorted volumes is
    emitted in exact integer micro-units via floor division — counts,
    ranks and their products never leave integer space.  Plan: one
    user agg over the scan, then NO per-user rank at all — within a
    tie group of equal volume x the rank sum is closed-form
    (Σ i = c·off + c·(c+1)/2 for c users ranked off+1..off+c), so
    Σ i·xᵢ reduces to a distinct-x aggregation: group users by x
    (|distinct x| ≤ max per-user count, tiny vs the user domain),
    prefix-count over that tiny frame, one moment reduction.  This
    replaced the r7 unpartitioned rank window over all users — the
    rank order's user_id tie-break provably cancels out of the Gini
    sum, so the funnel was never needed."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    per_x = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    # bounded: |distinct per-user counts| rows — behavior-bounded, not user-domain
    w_off = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    px = per_x.select(
        "x",
        "c",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
    )
    agg = px.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("x") * F.col("c")).alias("sx"),
        F.sum(
            F.col("x").cast("decimal(20,0)")
            * (
                F.col("c").cast("decimal(20,0)") * F.col("off")
                + (
                    F.col("c").cast("decimal(20,0)")
                    * (F.col("c") + F.lit(1))
                ) / 2
            )
        ).cast("decimal(38,0)").alias("six"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("n_events"),
        F.expr(
            "cast((1000000 * (2 * six - (n + 1) * cast(sx as decimal(38,0))))"
            " div (cast(n as decimal(38,0)) * sx) as bigint)"
        ).alias("gini_micro"),
    )


@query(
    "events_decile_migration",
    oracle="""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
    ),
    halves AS (
      SELECT user_id,
             CASE WHEN 2 * epoch_us(e.ts) < b.t0 + b.t1 THEN 1 ELSE 2 END
               AS half,
             count(*) AS x
      FROM events e CROSS JOIN bounds b
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, half, x,
             row_number() OVER (PARTITION BY half ORDER BY x, user_id) AS rk,
             count(*) OVER (PARTITION BY half) AS n
      FROM halves
    ),
    deciled AS (
      SELECT user_id, half,
             cast((10 * (rk - 1)) // n AS BIGINT) + 1 AS decile
      FROM ranked
    )
    SELECT a.decile AS decile_h1,
           coalesce(b.decile, 0) AS decile_h2,
           cast(count(*) AS BIGINT) AS n_users
    FROM (SELECT user_id, decile FROM deciled WHERE half = 1) a
    LEFT JOIN (SELECT user_id, decile FROM deciled WHERE half = 2) b
      ON a.user_id = b.user_id
    GROUP BY 1, 2
    """,
)
def events_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-decile migration matrix: each user's activity decile
    in the first half of the time range vs the second (decile 0 =
    vanished) — the cohort-movement grid growth teams read ("are our
    top-decile users sliding?"), one structural level above
    events_new_vs_returning's binary split.  Deciles are assigned by
    the EXACT integer formula (10·(rank−1)) div n — never ntile's
    engine-specific remainder spreading, and never a float quantile —
    with (volume, user_id) rank ties deterministic.  The half split is
    the integer epoch-micros comparison (stat_psi_drift's rule).
    Plan: one (user, half) agg over the scan, per-half rank via the
    two-phase distributed rank (``distrank.two_phase_row_number``)
    with a composite bucket monotone in the FULL (x, user_id) order
    key — the exact volume x as the major key (equal-x rows need no
    cross-bucket coordination) and a 32-way equal-width user_id range
    as the tie-breaker, so even a 100 TB-scale tie plateau (millions
    of one-event users) splits across 32 window partitions instead of
    funneling through one task (the r7 two-fat-partition window this
    replaces).  The h1/h2 pairing is a single per-user conditional
    pivot — not a half-vs-half self-join, which would recompute the
    whole rank lineage twice — then a 10×11-bounded matrix agg."""
    from .distrank import two_phase_row_number

    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    halves = (
        ev.join(F.broadcast(b))
        .select(
            "user_id",
            F.when(
                2 * F.unix_micros("ts") < F.col("t0") + F.col("t1"), 1
            )
            .otherwise(2)
            .alias("half"),
        )
        .groupBy("user_id", "half")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    # 1-row build-time job (intentionally eager: two longs of driver
    # state buy the bucket bounds): user_id range for the tie-break
    # sub-bucket.
    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    n_sub = 32
    if lo is None:  # empty events table: single bucket, plan still builds
        lo, width = 0, 1
    else:
        # Overflow-free equal-width bucketing: width computed in Python
        # (arbitrary precision), the per-row (user_id - lo) div width in
        # decimal(38,0) — `(user_id - lo) * 32` in long arithmetic wraps
        # negative once the ID range exceeds ~2^58 (snowflake-style
        # sparse 64-bit IDs), silently breaking the bucket monotonicity
        # two_phase_row_number requires.  Integral `div` (not `/` +
        # floor): decimal `/` rounds HALF_UP to the adjusted scale
        # BEFORE the floor, so a boundary ID at extreme ranges could
        # round into the next cell — `div` is exact.
        lo, width = int(lo), (int(hi) - int(lo)) // n_sub + 1
    sub = F.expr(
        f"(cast(user_id as decimal(38,0)) - cast('{lo}' as decimal(38,0)))"
        f" div cast('{width}' as decimal(38,0))"
    )
    bucket = F.col("x") * n_sub + sub
    totals = halves.groupBy("half").agg(F.count(F.lit(1)).alias("n"))
    ranked = two_phase_row_number(
        halves, ["half"], ["x", "user_id"], "rk", bucket=bucket
    ).join(F.broadcast(totals), "half")
    deciled = ranked.select(
        "user_id",
        "half",
        (F.expr("cast((10 * (rk - 1)) div n as bigint)") + 1).alias("decile"),
    )
    return (
        deciled.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("half") == 1, F.col("decile"))).alias("decile_h1"),
            F.max(F.when(F.col("half") == 2, F.col("decile"))).alias("decile_h2"),
        )
        .filter(F.col("decile_h1").isNotNull())
        .select(
            "decile_h1",
            F.coalesce("decile_h2", F.lit(0).cast("long")).alias("decile_h2"),
        )
        .groupBy("decile_h1", "decile_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


# ---------------------------------------------------- sequence patterns

#: Conversion-corridor pattern over per-user event-type symbol strings:
#: a view, any run of views/clicks, then a purchase — with no error or
#: signup breaking the corridor.  Single-char symbols = first letter of
#: the event type (click/error/purchase/signup/view are first-letter
#: unique in the fixture vocabulary).
_SEQ_PATTERN = "v[vc]*p"


@query(
    "events_sequence_regex_match",
    oracle=f"""
    WITH sym AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             substring(event_type, 1, 1) AS s
      FROM events
    ),
    seqs AS (
      SELECT user_id,
             string_agg(s, '' ORDER BY ts_us, event_id) AS seq
      FROM sym GROUP BY user_id
    )
    SELECT user_id,
           cast(length(seq) AS BIGINT) AS seq_len,
           cast(len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) AS BIGINT)
             AS n_matches,
           regexp_extract(seq, '{_SEQ_PATTERN}') AS first_match
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) > 0
    """,
)
def events_sequence_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event streams — the
    ``MATCH_RECOGNIZE`` / ClickHouse ``sequenceMatch``/``sequenceCount``
    gap in Spark SQL, closed by compiling the event-type sequence to a
    symbol STRING and running an ordinary regex over it: each user's
    events in (ts, event_id) order become one character each, and the
    pattern ``{_SEQ_PATTERN}`` ("view, any views/clicks, purchase —
    the conversion corridor, broken by error/signup") is counted with
    non-overlapping leftmost-first semantics — identical between Java
    regex and RE2 for this automaton-unambiguous pattern, which is
    what makes the DuckDB twin a true oracle.  Funnels
    (events_window_funnel) answer "did these steps happen in order";
    the regex form answers the strictly richer "did they happen in
    order with NOTHING ELSE in between" and generalizes to any
    regular corridor without new operator code.  Plan: one user-keyed
    shuffle (partial-agg collect_list), sort_array + transform +
    array_join inside codegen, regexp_count on the bounded per-user
    string — per-user event counts are session-bounded (fixture ~20;
    at 100 TB the same query runs per (user, day) grain to cap the
    string, the standard sessionize-first discipline)."""
    ev = table(spark, sf_dir, "events")
    sym = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").alias("event_id"),
            F.substring("event_type", 1, 1).alias("s"),
        ).alias("e"),
    )
    seqs = sym.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("e")), lambda x: x.getField("s")
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit(_SEQ_PATTERN)).cast("long").alias("n_matches"),
        F.regexp_extract("seq", _SEQ_PATTERN, 0).alias("first_match"),
    ).filter(F.col("n_matches") > 0)


def otlp_scale0_parts(v_us):
    """(spectrum, bucket_idx) columns for an integer micro-value under
    OTLP ExponentialHistogram scale-0 semantics: lower-exclusive /
    upper-inclusive buckets (2^k, 2^(k+1)] indexed by
    ceil(log2 |v|) - 1, computed exactly as bit-length(|v|-1) - 1
    (|v| = 1 → index -1), negatives bucketed by magnitude in the
    'neg' spectrum, zeros in the 'zero' bucket (index pinned 0).
    Shared by the batch query and the streaming face so the
    mergeability test exercises one formula."""
    m = F.abs(v_us)
    idx = F.when(m == 1, F.lit(-1).cast("long")).otherwise(
        (F.length(F.bin(m - 1)) - 1).cast("long")
    )
    spectrum = (
        F.when(v_us > 0, F.lit("pos"))
        .when(v_us < 0, F.lit("neg"))
        .otherwise(F.lit("zero"))
    )
    bucket_idx = F.when(v_us == 0, F.lit(0).cast("long")).otherwise(idx)
    return spectrum.alias("spectrum"), bucket_idx.alias("bucket_idx")


@query(
    "events_exp_histogram",
    oracle="""
    WITH v AS (
      SELECT event_type,
             cast(round(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ),
    b AS (
      SELECT event_type,
             CASE WHEN v_us > 0 THEN 'pos'
                  WHEN v_us < 0 THEN 'neg'
                  ELSE 'zero' END AS spectrum,
             CASE WHEN v_us = 0 THEN 0
                  WHEN abs(v_us) = 1 THEN -1
                  ELSE cast(length(printf('%b', abs(v_us) - 1)) - 1
                            AS BIGINT) END AS bucket_idx
      FROM v
    )
    SELECT event_type,
           cast(0 AS BIGINT) AS scale,
           spectrum,
           bucket_idx,
           CASE WHEN spectrum = 'zero' THEN 0
                WHEN spectrum = 'pos' AND bucket_idx >= 0
                     THEN (1::BIGINT << bucket_idx)
                WHEN spectrum = 'neg' AND bucket_idx BETWEEN -1 AND 61
                     THEN -(1::BIGINT << (bucket_idx + 1))
                ELSE NULL END AS lower_us,
           CASE WHEN spectrum = 'zero' THEN 0
                WHEN spectrum = 'pos' AND bucket_idx BETWEEN -1 AND 61
                     THEN (1::BIGINT << (bucket_idx + 1))
                WHEN spectrum = 'neg' AND bucket_idx >= 0
                     THEN -(1::BIGINT << bucket_idx)
                ELSE NULL END AS upper_us,
           cast(count(*) AS BIGINT) AS n
    FROM b GROUP BY event_type, spectrum, bucket_idx
    """,
)
def events_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP ExponentialHistogram bucketing (scale 0) of event values in
    exact integer micro-units — the modern OTel metrics data point the
    reference's explicit-bucket path (A14, ``internal/metrics/
    metrics.go``; batch face events_histogram_otel_buckets) predates.
    Buckets follow the spec's boundary rule exactly
    (open-telemetry/opentelemetry-proto metrics.proto,
    ExponentialHistogramDataPoint): lower-EXCLUSIVE / upper-INCLUSIVE
    base-2 buckets (2^k, 2^(k+1)] — so an exact power of two 2^k
    belongs to index k-1 — with the dedicated zero bucket and a
    mirrored NEGATIVE spectrum bucketed by magnitude, reported via the
    ``spectrum`` column ('pos'/'neg'/'zero').  The index
    ceil(log2 |v|) - 1 is computed EXACTLY as bit-length(|v|-1) - 1 on
    the integer micro-value (``length(bin(m-1)) - 1``, |v|=1 → index
    -1 for the (½, 1] bucket), never float ``log2`` whose 1-ulp wobble
    at bucket boundaries differs between engines — so the DuckDB twin
    (printf('%b')) hash-matches bit for bit.  Bucket bounds that are
    not integer-representable (the ½ μs bound at index -1, the 2^63 μs
    bound at index 62) report NULL, matching OTLP's index-not-bounds
    wire semantics.  Mergeability is the point at scale: scale-0
    buckets are a partial-aggregable map (this whole query is one
    partial-agged groupBy, no shuffle beyond the ~5×40-cell grid), and
    downscaling is bucket-index halving — the property that lets 1000
    executors each keep a tiny sketch and merge associatively."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("cast(round(value * 1000000) as bigint)").alias("v_us"),
    )
    b = v.select("event_type", *otlp_scale0_parts(F.col("v_us")))
    g = b.groupBy("event_type", "spectrum", "bucket_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # Representable-bound arithmetic: 1<<idx fits a long through idx 62,
    # but 1<<(idx+1) overflows there (Spark would wrap negative, DuckDB
    # hard-errors), and index -1's magnitude bound is the fractional
    # ½ μs — both report NULL.  The negative spectrum mirrors the
    # magnitude interval: v in [-2^(k+1), -2^k).
    shl = "shiftleft(cast(1 as bigint), cast(bucket_idx as int)%s)"
    lower = (
        F.when(F.col("spectrum") == "zero", F.lit(0).cast("long"))
        .when(
            (F.col("spectrum") == "pos") & (F.col("bucket_idx") >= 0),
            F.expr(shl % ""),
        )
        .when(
            (F.col("spectrum") == "neg")
            & F.col("bucket_idx").between(-1, 61),
            -F.expr(shl % " + 1"),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    upper = (
        F.when(F.col("spectrum") == "zero", F.lit(0).cast("long"))
        .when(
            (F.col("spectrum") == "pos")
            & F.col("bucket_idx").between(-1, 61),
            F.expr(shl % " + 1"),
        )
        .when(
            (F.col("spectrum") == "neg") & (F.col("bucket_idx") >= 0),
            -F.expr(shl % ""),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    return g.select(
        "event_type",
        F.lit(0).cast("long").alias("scale"),
        "spectrum",
        "bucket_idx",
        lower.alias("lower_us"),
        upper.alias("upper_us"),
        "n",
    )


#: Template-mining report depth (distinct masked templates kept).
_TEMPLATE_TOPK = 50


def mask_log_template(col):
    """The Drain-lite variable-field masking shared by the batch miner
    and the streaming face (``streaming.windows.log_templates_windowed``)
    — ONE formula so stream grids merge into the batch grid exactly:
    hex runs first (they subsume digit runs), then integer runs."""
    return F.regexp_replace(
        F.regexp_replace(col, "[0-9a-f]{8,}", "<H>"), "[0-9]+", "<N>"
    )


def synth_log_line_expr():
    """The deterministic 15-template log-line synthesis over an events
    row (5 event types × 3 printf forms keyed by event_id) — shared by
    the batch miner and the streaming equivalence test so both faces
    see byte-identical lines."""
    ms = F.expr("cast(round(value * 1000) as bigint)")
    by = F.expr("cast(round(value * 100) as bigint)")
    req = F.substring(F.md5(F.col("event_id").cast("string")), 1, 12)
    return (
        F.when(
            F.col("event_id") % 3 == 0,
            F.format_string("%s uid=%d took %d ms", "event_type", "user_id", ms),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.format_string(
                "%s failed for uid=%d req=%s retry=%d",
                "event_type",
                "user_id",
                req,
                F.col("event_id") % 5,
            ),
        )
        .otherwise(
            F.format_string("%s ok uid=%d bytes=%d", "event_type", "user_id", by)
        )
    )


@query(
    "events_log_templates",
    oracle=f"""
    WITH lines AS (
      SELECT user_id,
             CASE event_id % 3
               WHEN 0 THEN printf('%s uid=%d took %d ms', event_type,
                                  user_id, cast(round(value * 1000) AS BIGINT))
               WHEN 1 THEN printf('%s failed for uid=%d req=%s retry=%d',
                                  event_type, user_id,
                                  substring(md5(cast(event_id AS VARCHAR)), 1, 12),
                                  event_id % 5)
               ELSE printf('%s ok uid=%d bytes=%d', event_type, user_id,
                           cast(round(value * 100) AS BIGINT))
             END AS line
      FROM events
    ),
    masked AS (
      SELECT user_id, line,
             regexp_replace(regexp_replace(line, '[0-9a-f]{{8,}}', '<H>', 'g'),
                            '[0-9]+', '<N>', 'g') AS template
      FROM lines
    ),
    agg AS (
      SELECT template,
             cast(count(*) AS BIGINT) AS n_lines,
             cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
             min(line) AS sample_line
      FROM masked GROUP BY template
    )
    SELECT template, n_lines, n_users, sample_line,
           cast(row_number() OVER (ORDER BY n_lines DESC, template)
                AS BIGINT) AS rn
    FROM agg
    ORDER BY rn LIMIT {_TEMPLATE_TOPK}
    """,
)
def events_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-template mining — the observability operator that turns a
    raw log firehose into its handful of generating templates (Drain /
    Spell family; ClickHouse users run this as the first step of log
    analytics on exactly the kind of tables the reference ingests):
    mask the variable fields (hex ids first — they subsume digit runs
    — then integers) and aggregate the surviving constant skeleton.
    The fixture corpus has no raw log files, so the line stage
    synthesizes a deterministic 15-template log stream from the events
    table (5 event types × 3 printf forms keyed by event_id,
    the source_multiline_logs convention) — the miner itself never
    sees the generator and must recover exactly those templates, which
    the DuckDB twin re-derives independently.  Per template: line
    volume, distinct-user spread (templates everyone hits vs one
    user's crash loop), and the lexicographically-smallest raw line as
    the deterministic exemplar.  Plan: map-linear printf + two codegen
    regexp_replace over the scan, one partial-agged groupBy on the
    template skeleton (cardinality = template count — Drain yields
    ~10^3 at 100 TB, so the agg grid is tiny no matter the corpus),
    rank over that bounded grid only."""
    ev = table(spark, sf_dir, "events")
    masked = ev.select("user_id", synth_log_line_expr().alias("line")).select(
        "user_id",
        "line",
        mask_log_template("line").alias("template"),
    )
    agg = masked.groupBy("template").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("line").alias("sample_line"),
    )
    w = Window.orderBy(F.col("n_lines").desc(), F.col("template"))
    return (
        agg.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _TEMPLATE_TOPK)
        .select("template", "n_lines", "n_users", "sample_line", "rn")
    )


# ------------------------------------------------- rate-limiter replay

#: Token-bucket parameters in exact integer refill-microseconds: one
#: token refills per minute, so 1 token = 60e6 us of refill; capacity
#: 5 tokens.  Integer units keep the sequential recurrence bit-exact
#: across engines (floats would drift between Spark's and DuckDB's
#: summation order).
_TB_COST_US = 60_000_000
_TB_CAP_US = 5 * _TB_COST_US


def _token_bucket_replay(pdf):
    """Replay one user's events through the token bucket (Arrow batch;
    sequential by construction — admission depends on the full prefix,
    the Lindley-style recursion no window frame expresses)."""
    import pandas as pd

    pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
    bal = _TB_CAP_US
    prev_ts = None
    out_bal, out_adm = [], []
    for ts in pdf["ts_us"]:
        if prev_ts is not None:
            bal = min(_TB_CAP_US, bal + (int(ts) - prev_ts))
        prev_ts = int(ts)
        admitted = bal >= _TB_COST_US
        if admitted:
            bal -= _TB_COST_US
        out_adm.append(admitted)
        out_bal.append(bal)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "rn": range(1, len(pdf) + 1),
            "admitted": out_adm,
            "balance_us": out_bal,
        }
    )


@query(
    "events_token_bucket_admission",
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn,
             coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 0)
               AS dt_us
      FROM events
    ),
    walk AS (
      SELECT user_id, 0::BIGINT AS rn, {_TB_CAP_US}::BIGINT AS bal
      FROM (SELECT DISTINCT user_id FROM seq)
      UNION ALL
      SELECT s.user_id, s.rn,
             least({_TB_CAP_US}, w.bal + s.dt_us)
               - CASE WHEN least({_TB_CAP_US}, w.bal + s.dt_us)
                           >= {_TB_COST_US}
                      THEN {_TB_COST_US} ELSE 0 END
      FROM walk w JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT s.user_id, s.event_id, s.rn,
           least({_TB_CAP_US}, prev.bal + s.dt_us) >= {_TB_COST_US}
             AS admitted,
           cur.bal AS balance_us
    FROM seq s
    JOIN walk prev ON prev.user_id = s.user_id AND prev.rn = s.rn - 1
    JOIN walk cur  ON cur.user_id = s.user_id AND cur.rn = s.rn
    """,
)
def events_token_bucket_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate-limiter replay: which recorded events a
    5-token / 1-token-per-minute bucket per user would have admitted —
    the token-bucket upgrade of the reference's fixed-cadence pacing
    (A1: ``cmd/root.go:119`` paces emission with a plain
    ``time.NewTicker(time.Second / rate)``; a token bucket is the
    burst-tolerant generalization every production limiter uses)
    turned into an audit query over recorded traffic, the
    "what would the limiter have dropped" question capacity planning
    asks before tightening a limit.  State is exact integer
    refill-microseconds (1 token = 60e6 us), so the sequential
    recurrence — refill by Δt capped at capacity, admit iff a full
    token is present, admission consumes — is bit-identical in the
    Arrow kernel and the DuckDB RECURSIVE-CTE twin: a full oracle
    differential for a stateful sequential operator.  No window frame
    expresses it (admission depends on every prior admission, a
    Lindley-style recursion), so the per-user replay runs as ONE
    Arrow-grouped kernel after the user-keyed shuffle — per-user event
    counts are session-bounded (the join_asof discipline), users
    parallelize freely, and the streaming face of the same recurrence
    is applyInPandasWithState keyed the same way."""
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    return keyed.groupBy("user_id").applyInPandas(
        _token_bucket_replay,
        "user_id long, event_id long, rn long, admitted boolean, balance_us long",
    )


@query(
    "events_label_cardinality_audit",
    oracle="""
    WITH lab AS (
      SELECT event_type,
             coalesce(cast(json_extract(props, '$.k') AS BIGINT), -1) AS k_val,
             user_id,
             cast(ts AS DATE) AS day
      FROM events
    ),
    per_type AS (
      SELECT event_type,
             count(*)                    AS n_rows,
             count(DISTINCT k_val)       AS k_card,
             count(DISTINCT user_id)     AS user_card,
             count(DISTINCT day)         AS days,
             count(DISTINCT (k_val, user_id)) AS series_card
      FROM lab GROUP BY event_type
    )
    SELECT event_type,
           cast(n_rows AS BIGINT)      AS n_rows,
           cast(k_card AS BIGINT)      AS k_card,
           cast(user_card AS BIGINT)   AS user_card,
           cast(series_card AS BIGINT) AS series_card,
           cast((series_card + days - 1) // days AS BIGINT)
                                       AS series_per_day_ceil,
           cast(n_rows // series_card AS BIGINT)
                                       AS rows_per_series,
           (series_card * 10 > n_rows) AS explosion_risk
    FROM per_type
    """,
)
def events_label_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-cardinality audit — the #1 operational failure mode of
    every metrics backend the reference feeds (a ClickHouse/Prometheus
    series is one row PER LABEL COMBINATION, so an unbounded label
    like user id or request path multiplies storage and query cost;
    the reference sidesteps the risk by registering UNLABELED
    counters/histogram only, ``internal/metrics/metrics.go:11-39`` —
    this audit is what a deployment must run BEFORE adding the labels
    the reference left off): per event type, the distinct
    cardinality of each candidate label (props.k, user), the SERIES
    cardinality their combination would create, the mean rows per
    series (exact integer division — a series touched by ≤10 rows is
    paying index cost for no aggregation benefit, hence the
    ``explosion_risk`` cross-multiplied flag), and the per-day series
    ceiling a retention planner multiplies out.  Plan: one
    partial-agged multi-distinct groupBy over the scan (Spark expands
    multiple exact DISTINCTs to an expand+two-phase agg — still one
    pass over the data, grid bounded by the type domain)."""
    ev = table(spark, sf_dir, "events")
    lab = ev.select(
        "event_type",
        # coalesce the missing-label case to a sentinel series: Spark's
        # countDistinct drops NULL-bearing tuples while DuckDB's
        # count(DISTINCT (a, b)) keeps them — a NULL key would silently
        # desync the differential (and a type whose every row lacked the
        # label would divide by zero)
        F.coalesce(
            F.get_json_object("props", "$.k").cast("long"), F.lit(-1)
        ).alias("k_val"),
        "user_id",
        F.col("ts").cast("date").alias("day"),
    )
    per_type = lab.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("k_val").alias("k_card"),
        F.countDistinct("user_id").alias("user_card"),
        F.countDistinct("day").alias("days"),
        F.countDistinct("k_val", "user_id").alias("series_card"),
    )
    return per_type.select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("k_card").cast("long").alias("k_card"),
        F.col("user_card").cast("long").alias("user_card"),
        F.col("series_card").cast("long").alias("series_card"),
        F.expr("cast((series_card + days - 1) div days as bigint)").alias(
            "series_per_day_ceil"
        ),
        F.expr("cast(n_rows div series_card as bigint)").alias(
            "rows_per_series"
        ),
        (F.col("series_card") * 10 > F.col("n_rows")).alias("explosion_risk"),
    )


@query(
    "events_p99_of_user_p95",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             count(*) AS n,
             list_extract(
               list_sort(list(cast(round(value * 100) AS BIGINT))),
               cast(ceil(0.95 * count(*)) AS INT)) AS p95_c
      FROM events GROUP BY user_id
    ),
    pop AS (SELECT count(*) AS n_users FROM per_user),
    tail AS (
      SELECT p95_c,
             row_number() OVER (ORDER BY p95_c DESC, user_id) AS rd
      FROM per_user
    )
    SELECT cast(p.n_users AS BIGINT)                 AS n_users,
           cast(min(pu.p95_c) AS BIGINT)             AS min_user_p95_c,
           cast(max(pu.p95_c) AS BIGINT)             AS max_user_p95_c,
           cast((SELECT max(p95_c) FROM tail, pop
                 WHERE rd >= n_users - cast(ceil(0.99 * n_users) AS INT) + 1)
                AS BIGINT)                           AS p99_of_p95_c,
           cast(sum(pu.p95_c) // p.n_users AS BIGINT) AS mean_user_p95_c
    FROM per_user pu CROSS JOIN pop p
    GROUP BY p.n_users
    """,
)
def events_p99_of_user_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level exact percentile — p99 ACROSS USERS of each user's
    p95 latency — the aggregation every SLO review actually needs and
    the one the percentile-averaging fallacy gets wrong (a mean of
    per-user p95s says nothing; the tail OF the per-user tails does).
    Both levels are EXACT DISCONTINUOUS percentiles on integer
    centi-values (ceil(q·n)-th order statistic — never an interpolated
    float, which ties engines to their interpolation rule).  Level 1
    is a per-user sorted-array pick over session-bounded rows (the
    collect_list discipline); level 2 never sorts the full user
    domain: the ceil(0.99·N)-th smallest is the (N−idx+1)-th LARGEST,
    so a TakeOrderedAndProject over the top ~1% of users followed by a
    1-row min is the whole cross-user cost — at 100 TB that is a
    per-partition top-k merge, not a global sort (the
    vocab-coverage limit-before-rank discipline applied to order
    statistics).  The report row also carries min/max/floor-mean of
    the per-user p95s for the fallacy comparison."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "element_at(array_sort(collect_list("
            "cast(round(value * 100) as bigint))), "
            "cast(ceil(0.95 * count(1)) as int))"
        ).alias("p95_c"),
    )
    # 1-row build-time job sizing the top-tail take; the fetched stats
    # become a LITERAL frame so the heavy per-user aggregation is not
    # re-evaluated a second time on the pop branch of the plan
    stats = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("p95_c").alias("mn"),
        F.max("p95_c").alias("mx"),
        F.sum("p95_c").alias("sm"),
    ).first()
    n = int(stats.n_users) if stats.n_users else 0
    if n == 0:
        # oracle yields zero rows on an empty table (GROUP BY over an
        # empty per_user); match it
        return spark.createDataFrame(
            [],
            "n_users long, min_user_p95_c long, max_user_p95_c long, "
            "p99_of_p95_c long, mean_user_p95_c long",
        )
    idx = -(-99 * n // 100)  # ceil(0.99 n) without floats
    take = n - idx + 1
    pop = spark.createDataFrame(
        [(n, int(stats.mn), int(stats.mx), int(stats.sm))],
        "n_users long, mn long, mx long, sm long",
    )
    tail = per_user.orderBy(
        F.col("p95_c").desc(), F.col("user_id")
    ).limit(take)
    p99 = tail.agg(F.min("p95_c").alias("p99_of_p95_c"))
    return (
        pop.crossJoin(F.broadcast(p99))
        .select(
            "n_users",
            F.col("mn").alias("min_user_p95_c"),
            F.col("mx").alias("max_user_p95_c"),
            F.col("p99_of_p95_c").cast("long").alias("p99_of_p95_c"),
            F.expr("cast(sm div n_users as bigint)").alias("mean_user_p95_c"),
        )
    )


@query(
    "events_holt_winters",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
    ),
    dayspine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    etypes AS (SELECT DISTINCT event_type FROM events),
    byday AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(cast(sum(cast(value AS DECIMAL(14,4))) AS DECIMAL(18,4))
                  AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT t.event_type, d.day, coalesce(b.x, 0.0) AS x
      FROM etypes t CROSS JOIN dayspine d
      LEFT JOIN byday b ON b.event_type = t.event_type AND b.day = d.day
    ),
    serie AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             count(*)     OVER (PARTITION BY event_type)              AS n
      FROM daily
    ),
    seed AS (
      SELECT event_type,
             cast(sum(cast(round(x * 10000) AS BIGINT)) AS DOUBLE)
               / 10000 / 7 AS l0
      FROM serie WHERE i <= 7 GROUP BY event_type
    ),
    sea0 AS (
      SELECT s.event_type, list(s.x - d.l0 ORDER BY s.i) AS sea
      FROM serie s JOIN seed d USING (event_type)
      WHERE s.i <= 7 GROUP BY s.event_type
    ),
    state AS (
      SELECT s.event_type, 7 AS i, s.n, d.l0 AS l,
             cast(0.0 AS DOUBLE) AS b, s0.sea AS sea
      FROM seed d
      JOIN sea0 s0 USING (event_type)
      JOIN serie s ON s.event_type = d.event_type AND s.i = 7
      WHERE s.n >= 8
      UNION ALL
      SELECT st.event_type, st.i + 1, st.n,
             0.5 * (s.x - st.sea[1]) + 0.5 * (st.l + st.b) AS l,
             0.3 * ((0.5 * (s.x - st.sea[1]) + 0.5 * (st.l + st.b))
                    - st.l) + 0.7 * st.b                   AS b,
             list_append(st.sea[2:7],
               0.4 * (s.x - (0.5 * (s.x - st.sea[1])
                             + 0.5 * (st.l + st.b)))
                 + 0.6 * st.sea[1])                        AS sea
      FROM state st
      JOIN serie s ON s.event_type = st.event_type AND s.i = st.i + 1
    )
    SELECT event_type,
           n::BIGINT                       AS n_days,
           round(l, 6)                     AS level,
           round(b, 6)                     AS trend,
           round(l + b + sea[1], 6)        AS forecast_next
    FROM state WHERE i = n
    """,
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters additive TRIPLE exponential smoothing (level α=0.5,
    trend β=0.3, seasonal γ=0.4, period m=7) over each event type's
    daily series — the seasonality-aware upgrade of
    ``events_forecast_holt`` that every weekly-cycled ops metric needs
    (a Holt forecast of weekday-heavy traffic is wrong every Saturday;
    the seasonal state absorbs the day-of-week shape).  Seed: level =
    mean of the first week (summed as EXACT 1e-4-scaled integers, so
    the seed is order-independent and both engines round to the same
    double), trend 0, seasonal_i = x_i − level; then the textbook
    recurrence with s_{t−m} carried as a rotating 7-slot list.  The
    oracle is a RECURSIVE CTE carrying the list (the forecast_holt
    rule: the recursion pins evaluation order so both engines execute
    the identical IEEE double ops — intermediate bindings are written
    OUT in full on both sides); the Spark side is one ``aggregate()``
    fold per type over the day-sorted array.  Output rounds at 6.
    Scale: state is (2 doubles + 7-slot list) per type, series are
    day-grain — calendar-bounded; the corpus-sized work is the
    partial-aggregated daily rollup."""
    ev = table(spark, sf_dir, "events")
    # DENSE per-type day spine (the seasonal-decompose discipline): a
    # quiet (type, day) is a true zero-volume sample; skipping it
    # splices the smoothing recursion across the gap and shifts every
    # later level/trend state
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dayspine = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    etypes = ev.select("event_type").distinct()
    by_day = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.expr(
            "cast(cast(sum(cast(value as decimal(14,4))) as decimal(18,4))"
            " as double)"
        ).alias("x0")
    )
    daily = etypes.crossJoin(F.broadcast(dayspine)).join(
        by_day, ["event_type", "day"], "left"
    ).select("event_type", "day", F.coalesce("x0", F.lit(0.0)).alias("x"))
    arr = (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr(
                "transform(array_sort(collect_list(struct(day, x))),"
                " p -> p.x)"
            ).alias("xs"),
        )
        .filter(F.col("n_days") >= 8)
    )
    l0 = (
        "cast(aggregate(slice(xs, 1, 7), 0L,"
        " (a, v) -> a + cast(round(v * 10000) as bigint)) as double)"
        " / 10000 / 7"
    )
    sea0 = f"transform(slice(xs, 1, 7), v -> v - ({l0}))"
    l_new = "0.5 * (x - element_at(st.sea, 1)) + 0.5 * (st.l + st.b)"
    fold = (
        f"aggregate(slice(xs, 8, cast(n_days - 7 as int)),"
        f" named_struct('l', {l0}, 'b', cast(0.0 as double),"
        f" 'sea', {sea0}),"
        f" (st, x) -> named_struct("
        f"'l', {l_new},"
        f"'b', 0.3 * (({l_new}) - st.l) + 0.7 * st.b,"
        f"'sea', concat(slice(st.sea, 2, 6),"
        f" array(0.4 * (x - ({l_new})) + 0.6 * element_at(st.sea, 1)))))"
    )
    return arr.select(
        "event_type",
        "n_days",
        F.round(F.expr(f"({fold}).l"), 6).alias("level"),
        F.round(F.expr(f"({fold}).b"), 6).alias("trend"),
        F.round(
            F.expr(
                f"({fold}).l + ({fold}).b + element_at(({fold}).sea, 1)"
            ),
            6,
        ).alias("forecast_next"),
    )


@query(
    "stat_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(round(cast(sum(cast(value AS DECIMAL(14,4)))
                             AS DECIMAL(18,4)) * 10000) AS BIGINT) AS x_u
      FROM events GROUP BY 1, 2
    ),
    serie AS (
      SELECT event_type, x_u,
             cast(row_number() OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type,
             ((b.x_u - a.x_u) * 100) // (b.i - a.i) AS slope_u,
             a.i AS i, b.i AS j
      FROM serie a JOIN serie b
        ON a.event_type = b.event_type AND b.i > a.i
    ),
    ranked AS (
      SELECT event_type, slope_u,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope_u, i, j) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM slopes
    )
    SELECT r.event_type,
           cast(max(s.i) AS BIGINT)       AS n_days,
           cast(r.n_pairs AS BIGINT)      AS n_pairs,
           r.slope_u                      AS slope_micro,
           CASE WHEN r.slope_u > 0 THEN 'up'
                WHEN r.slope_u < 0 THEN 'down'
                ELSE 'flat' END           AS trend
    FROM ranked r JOIN serie s ON s.event_type = r.event_type
    WHERE r.rn = (r.n_pairs + 1) // 2
    GROUP BY r.event_type, r.n_pairs, r.slope_u
    """,
)
def stat_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the median of all
    pairwise day-slopes, the slope estimator ops dashboards should use
    instead of least squares (agg_linear_regression) when a single
    outlier day would otherwise swing the fit: breakdown point 29%,
    no distributional assumptions.  Exactness: daily totals land as
    1e-4-scaled integers (exact DECIMAL sum), each pairwise slope is
    one truncating integer division (identical in Spark ``div`` and
    DuckDB ``//`` — probed, both round toward zero on negatives), and
    the LOWER MEDIAN is picked by deterministic rank (slope, i, j) —
    zero float anywhere.  Scale: the quadratic lives in CALENDAR space
    (day pairs per type — the stat_kendall_tau rule), never row space;
    the corpus-sized work is the partial-agged daily rollup, and the
    pair join + rank all shuffle on the 5-value type key."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.expr(
            "cast(round(cast(sum(cast(value as decimal(14,4)))"
            " as decimal(18,4)) * 10000) as bigint)"
        ).alias("x_u")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    serie = daily.select(
        "event_type", "x_u", F.row_number().over(w).cast("long").alias("i")
    )
    a = serie.select(
        "event_type", F.col("x_u").alias("xa"), F.col("i").alias("i")
    )
    b = serie.select(
        F.col("event_type").alias("et_b"),
        F.col("x_u").alias("xb"),
        F.col("i").alias("j"),
    )
    slopes = a.join(
        b, (a.event_type == b.et_b) & (F.col("j") > F.col("i"))
    ).select(
        "event_type",
        F.expr("((xb - xa) * 100) div (j - i)").alias("slope_u"),
        "i",
        "j",
    )
    wr = Window.partitionBy("event_type").orderBy("slope_u", "i", "j")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope_u",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    ).filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
    n_days = serie.groupBy("event_type").agg(F.max("i").alias("n_days"))
    return ranked.join(n_days, "event_type").select(
        "event_type",
        "n_days",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_u").alias("slope_micro"),
        F.when(F.col("slope_u") > 0, "up")
        .when(F.col("slope_u") < 0, "down")
        .otherwise("flat")
        .alias("trend"),
    )


@query(
    "stat_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(round(cast(sum(cast(value AS DECIMAL(14,4)))
                             AS DECIMAL(18,4)) * 10000) AS BIGINT) AS x_u
      FROM events GROUP BY 1, 2
    ),
    serie AS (
      SELECT event_type, x_u,
             cast(row_number() OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    nn AS (SELECT event_type, count(*)::BIGINT AS n FROM daily GROUP BY 1),
    s AS (
      SELECT a.event_type,
             sum(CASE WHEN b.x_u > a.x_u THEN 1
                      WHEN b.x_u < a.x_u THEN -1 ELSE 0 END)::BIGINT AS s_stat
      FROM serie a JOIN serie b
        ON a.event_type = b.event_type AND b.i > a.i
      GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
      FROM (SELECT event_type, x_u, count(*)::BIGINT AS t
            FROM daily GROUP BY 1, 2) g
      GROUP BY 1
    ),
    mk AS (
      SELECT nn.event_type, nn.n,
             coalesce(s.s_stat, 0) AS s_stat,
             nn.n * (nn.n - 1) * (2 * nn.n + 5)
               - coalesce(t.tie_term, 0) AS var18
      FROM nn
      LEFT JOIN s ON s.event_type = nn.event_type
      LEFT JOIN ties t ON t.event_type = nn.event_type
    )
    SELECT event_type, n AS n_days, s_stat, var18,
           round(CASE WHEN s_stat > 0
                        THEN (s_stat - 1) / sqrt(var18 / 18.0)
                      WHEN s_stat < 0
                        THEN (s_stat + 1) / sqrt(var18 / 18.0)
                      ELSE 0.0 END, 6) AS z,
           CASE WHEN s_stat > 0 AND (s_stat - 1) / sqrt(var18 / 18.0) > 1.96
                  THEN 'up'
                WHEN s_stat < 0 AND (s_stat + 1) / sqrt(var18 / 18.0) < -1.96
                  THEN 'down'
                ELSE 'no-trend' END AS trend
    FROM mk
    """,
)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type — the nonparametric
    SIGNIFICANCE companion to ``stat_theil_sen_trend``'s robust slope
    (the pairing every hydrology/monitoring stack ships together):
    S = Σ_{i<j} sign(x_j − x_i) over the day-ordered daily totals,
    tie-corrected variance 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5),
    and the continuity-corrected z = (S∓1)/√Var classified at the
    two-sided 5% level (±1.96).  Exactness: S, the tie term, and the
    18-scaled variance are all exact BIGINT arithmetic on the same
    1e-4-scaled daily integers Theil–Sen uses; floats appear only in
    the final z (one division by 18.0, one sqrt, one division — the
    identical IEEE ops in both engines).  The test runs on OBSERVED
    days deliberately: MK depends only on the observed sequence's
    order, and padding quiet calendar days with zeros would inject
    artificial ties and drops into S — the opposite of the z-norm
    family, where the dense spine is the correct fix (SCALING.md
    Round 13).  Scale: the quadratic lives in CALENDAR space (day
    pairs per type, the stat_kendall_tau rule); corpus-sized work is
    the partial-agged daily rollup."""
    from .dedup import materialized

    ev = table(spark, sf_dir, "events")
    # materialized: the (types × days)-bounded rollup feeds FOUR
    # branches (serie, the self-join's probe side, nn, ties) — without
    # the barrier each branch re-scans the events table
    daily = materialized(
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
            F.expr(
                "cast(round(cast(sum(cast(value as decimal(14,4)))"
                " as decimal(18,4)) * 10000) as bigint)"
            ).alias("x_u")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    serie = daily.select(
        "event_type", "x_u", F.row_number().over(w).cast("long").alias("i")
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    b = serie.select(
        F.col("event_type").alias("et_b"),
        F.col("x_u").alias("xb"),
        F.col("i").alias("j"),
    )
    s = (
        # broadcast: the build side is calendar-bounded (types × days)
        serie.join(
            F.broadcast(b),
            (serie.event_type == b.et_b) & (F.col("j") > F.col("i")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("x_u"), 1)
                .when(F.col("xb") < F.col("x_u"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "x_u")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("long").alias("tie_term")
        )
    )
    mk = (
        # broadcast: both sides are type-keyed (≤ |types| rows)
        nn.join(F.broadcast(s), "event_type", "left")
        .join(F.broadcast(ties), "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
            F.expr(
                "n * (n - 1) * (2 * n + 5) - coalesce(tie_term, 0)"
            )
            .cast("long")
            .alias("var18"),
        )
    )
    zc = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var18") / F.lit(18.0)),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var18") / F.lit(18.0)),
        )
        .otherwise(F.lit(0.0))
    )
    return mk.select(
        "event_type",
        "n_days",
        "s_stat",
        "var18",
        F.round(zc, 6).alias("z"),
        F.when((F.col("s_stat") > 0) & (zc > 1.96), "up")
        .when((F.col("s_stat") < 0) & (zc < -1.96), "down")
        .otherwise("no-trend")
        .alias("trend"),
    )


@query(
    "stat_cross_correlation",
    oracle="""
    WITH days AS (SELECT DISTINCT cast(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT t.event_type, d.day, coalesce(c.c, 0) AS c
      FROM types t CROSS JOIN days d
      LEFT JOIN counts c
        ON c.event_type = t.event_type AND c.day = d.day
    ),
    lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag_k),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag_k,
             a.c AS x, b.c AS y
      FROM spine a
      JOIN lags l ON TRUE
      JOIN spine b
        ON b.day = a.day + to_days(l.lag_k)
       AND b.event_type > a.event_type
    ),
    s AS (
      SELECT type_a, type_b, lag_k,
             cast(count(*) AS BIGINT)   AS n,
             cast(sum(x) AS BIGINT)     AS sx,
             cast(sum(y) AS BIGINT)     AS sy,
             cast(sum(x * y) AS BIGINT) AS sxy,
             cast(sum(x * x) AS BIGINT) AS sxx,
             cast(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, cast(lag_k AS BIGINT) AS lag_k, n,
           round((n * sxy - sx * sy)
                 / (sqrt(cast(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(cast(n * syy - sy * sy AS DOUBLE))), 6)
             AS xcorr
    FROM s
    """,
)
def stat_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged CROSS-correlation between every pair of event types
    (lags −3..+3 days) — the lead/lag detector incident analysis runs
    after events_correlated_anomalies says types move together ("do
    errors LEAD purchases dropping, and by how many days?"), and the
    cross-series complement of stat_autocorr_lag.  The VALUE-MASS
    twin (centi-unit daily sums over the trailing 28-day seasonal
    window, not counts) is ``events_series_crosscorr`` in
    timeseries.py.  Series are daily
    COUNTS on a zero-filled day spine (absence is signal — leaving
    missing days out would bias every covariance toward co-presence),
    so ALL five Pearson moment sums are exact BIGINT integer
    arithmetic; the single float op is the final normalize, rounded
    at 6.  Scale: one corpus-sized agg to the type×day grid;
    everything after lives in |types|²·|days|·|lags| calendar space
    (the stat_kendall_tau rule), co-partitioned day-shifted equi-joins,
    no ordered window anywhere."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(F.col("ts").cast("date").alias("day")).distinct()
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    spine = (
        types.crossJoin(days)
        .join(counts, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
    )
    lags = spark.createDataFrame([(k,) for k in range(-3, 4)], "lag_k int")
    a = spine.select(
        F.col("event_type").alias("type_a"),
        F.col("day").alias("day_a"),
        F.col("c").alias("x"),
    )
    b = spine.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("c").alias("y"),
    )
    pairs = (
        a.join(F.broadcast(lags))
        .join(
            b,
            (
                F.col("day_b")
                == F.col("day_a") + F.col("lag_k") * F.expr("INTERVAL 1 DAY")
            )
            & (F.col("type_b") > F.col("type_a")),
        )
        .select("type_a", "type_b", "lag_k", "x", "y")
    )
    s = pairs.groupBy("type_a", "type_b", "lag_k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "type_a",
        "type_b",
        F.col("lag_k").cast("long").alias("lag_k"),
        "n",
        F.round(num / den, 6).alias("xcorr"),
    )


@query(
    "orders_herfindahl_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             cast(round(sum(cast(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - cast(l.l_discount AS DECIMAL(4,2))))
                        * 100) AS BIGINT) AS rev_c
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    shares AS (
      SELECT nationkey, suppkey,
             (1000000 * rev_c) // cast(sum(rev_c) OVER
               (PARTITION BY nationkey) AS BIGINT) AS share_ppm
      FROM rev
    )
    SELECT n.n_name AS nation,
           cast(count(*) AS BIGINT) AS n_suppliers,
           cast(sum(share_ppm * share_ppm) // 1000000 AS BIGINT)
             AS hhi_ppm,
           max(share_ppm) AS top_share_ppm
    FROM shares s JOIN nation n ON n.n_nationkey = s.nationkey
    GROUP BY n.n_name
    """,
)
def orders_herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation —
    the procurement-risk number (HHI > 0.25 ≈ one failure takes out
    the supply line) beside orders_abc_class's volume ranking:
    supplier revenue shares within each nation in exact ppm (DECIMAL
    money → centi-int revenue → floor-div shares — the money
    discipline), HHI = Σ share² scaled back to ppm by integer
    division.  Plan: one supplier-keyed revenue agg over lineitem
    (supplier dim joins co-partitioned, nation dim broadcast), a
    nation-partitioned no-sort window for the share normalizer, and a
    25-row output grid."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.expr(
                "cast(round(sum(cast(l_extendedprice as decimal(18,2))"
                " * (1 - cast(l_discount as decimal(4,2)))) * 100)"
                " as bigint)"
            ).alias("rev_c")
        )
    )
    wn = Window.partitionBy("nationkey")
    shares = rev.withColumn("tot", F.sum("rev_c").over(wn)).select(
        "nationkey",
        "suppkey",
        F.expr("(1000000 * rev_c) div tot").alias("share_ppm"),
    )
    return (
        shares.join(F.broadcast(n), shares.nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.expr(
                "cast(sum(share_ppm * share_ppm) div 1000000 as bigint)"
            ).alias("hhi_ppm"),
            F.max("share_ppm").alias("top_share_ppm"),
        )
    )


@query(
    "events_ab_srm_check",
    oracle="""
    WITH assign AS (
      SELECT event_type, user_id,
             ('0x' || substring(md5(cast(user_id AS VARCHAR)), 1, 1))::BIGINT
               % 2 AS arm
      FROM (SELECT DISTINCT event_type, user_id FROM events)
    ),
    counts AS (
      SELECT event_type,
             cast(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             cast(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM assign GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           (1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b)
             AS chi2_micro,
           ((1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b))
             > 3841459 AS srm_flag
    FROM counts
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the FIRST gate of every A/B
    analysis (a 50/50 hash split whose arms differ beyond chance means
    the assignment or logging pipeline is broken, and every downstream
    metric comparison is garbage): users assigned by md5 parity (the
    sample_hash_deterministic discipline — rerun-stable, no RNG), the
    one-degree-of-freedom chi-square (n_a−n_b)²/(n_a+n_b) computed in
    exact integer micro-units, flagged against the p=0.05 critical
    value 3.841459 as an INTEGER threshold (the multiply-out rule: no
    libm near the decision).  Per event type, so a mismatch localizes
    to the logging path that drops one arm.  Plan: one distinct
    (type, user) agg, then a type-bounded grid."""
    ev = table(spark, sf_dir, "events")
    assign = ev.select("event_type", "user_id").distinct().select(
        "event_type",
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 1),"
            " 16, 10) as bigint) % 2"
        ).alias("arm"),
    )
    counts = assign.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    chi2 = "(1000000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)"
    return counts.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(chi2).alias("chi2_micro"),
        F.expr(f"({chi2}) > 3841459").alias("srm_flag"),
    )


@query(
    "orders_abc_xyz_matrix",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             cast(sum(cast(l_extendedprice AS DECIMAL(14,4))) AS DECIMAL(18,4))
               AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    abc AS (
      SELECT l_partkey AS part,
             revenue,
             CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                  WHEN cum * 10 <= tot * 9 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM (
        SELECT l_partkey, revenue,
               sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
               sum(revenue) OVER ()                         AS tot
        FROM rev)
    ),
    weekly AS (
      SELECT l.l_partkey AS part,
             date_trunc('week', o.o_orderdate) AS wk,
             cast(sum(cast(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    xyz AS (
      SELECT part,
             CASE WHEN 4 * n_weeks * (n_weeks * s2 - s1 * s1)
                       < cast((n_weeks - 1) AS HUGEINT) * s1 * s1 THEN 'X'
                  WHEN n_weeks * (n_weeks * s2 - s1 * s1)
                       < cast((n_weeks - 1) AS HUGEINT) * s1 * s1 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM (
        SELECT part, count(*) AS n_weeks,
               sum(cast(q AS HUGEINT)) AS s1,
               sum(cast(q AS HUGEINT) * q) AS s2
        FROM weekly GROUP BY part)
      WHERE n_weeks >= 2 AND s1 > 0
    ),
    tot AS (
      SELECT cast(round(sum(revenue) * 10000) AS HUGEINT) AS trev_u
      FROM rev
    )
    SELECT a.abc_class, x.xyz_class,
           cast(count(*) AS BIGINT) AS n_parts,
           cast((1000000 * cast(round(sum(a.revenue) * 10000) AS HUGEINT))
                // (SELECT trev_u FROM tot) AS BIGINT)
             AS revenue_share_ppm
    FROM abc a JOIN xyz x ON x.part = a.part
    GROUP BY a.abc_class, x.xyz_class
    """,
)
def orders_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC×XYZ planning matrix — the 9-cell grid inventory policy
    actually reads (orders_abc_class says how much VALUE a part
    carries; orders_xyz_class says how PREDICTABLE its demand is; the
    policy lives in the cross: AX = automate tight, CZ = don't stock):
    per cell, part count and exact-ppm revenue share.  Both class
    systems are re-derived with their originals' exact-arithmetic
    rules (DECIMAL cross-multiplied ABC cuts; integer multiply-out CV
    thresholds), joined part-keyed, aggregated to the bounded grid.
    Plan: two partial-agged passes over lineitem (revenue by part;
    weekly demand moments by part), one part-keyed join, a ≤9-row
    output."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.expr(
            "cast(sum(cast(l_extendedprice as decimal(14,4)))"
            " as decimal(18,4))"
        ).alias("revenue")
    )
    wcum = Window.orderBy(F.col("revenue").desc(), F.col("part")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    abc = rev.select(
        "part",
        "revenue",
        F.sum("revenue").over(wcum).alias("cum"),
        F.sum("revenue").over(wall).alias("tot"),
    ).select(
        "part",
        "revenue",
        F.when(F.col("cum") * 10 <= F.col("tot") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("tot") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    weekly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.date_trunc("week", "o_orderdate").alias("wk"),
        )
        .agg(
            F.expr("cast(sum(cast(round(l_quantity) as bigint)) as bigint)")
            .alias("q")
        )
    )
    m = weekly.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.expr("sum(cast(q as decimal(38,0)))").alias("s1"),
        F.expr("sum(cast(q as decimal(38,0)) * q)").alias("s2"),
    ).filter((F.col("n_weeks") >= 2) & (F.col("s1") > 0))
    xyz = m.select(
        "part",
        F.when(
            4 * F.col("n_weeks") * (F.col("n_weeks") * F.col("s2")
                                    - F.col("s1") * F.col("s1"))
            < (F.col("n_weeks") - 1) * F.col("s1") * F.col("s1"),
            "X",
        )
        .when(
            F.col("n_weeks") * (F.col("n_weeks") * F.col("s2")
                                - F.col("s1") * F.col("s1"))
            < (F.col("n_weeks") - 1) * F.col("s1") * F.col("s1"),
            "Y",
        )
        .otherwise("Z")
        .alias("xyz_class"),
    )
    trev = F.broadcast(
        rev.agg(
            F.expr(
                "cast(round(sum(revenue) * 10000) as decimal(38,0))"
            ).alias("trev_u")
        )
    )
    return (
        abc.join(xyz, "part")
        .crossJoin(trev)
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr(
                "cast((1000000 * cast(round(sum(revenue) * 10000)"
                " as decimal(38,0))) div max(trev_u) as bigint)"
            ).alias("revenue_share_ppm"),
        )
    )


@query(
    "orders_croston_demand",
    oracle="""
    WITH RECURSIVE demand AS (
      SELECT l.l_partkey AS partkey,
             cast(date_diff('day', DATE '1992-01-01',
                            cast(o.o_orderdate AS DATE)) AS BIGINT) AS d,
             cast(round(sum(l.l_quantity)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    serie AS (
      SELECT partkey, d, q,
             cast(row_number() OVER (PARTITION BY partkey ORDER BY d)
                  AS BIGINT) AS k,
             count(*) OVER (PARTITION BY partkey) AS n
      FROM demand
    ),
    -- init at k = 2 (parts with a single demand day have no interval
    -- and are excluded): z = q_1, p = the FIRST interval i_2, prev = d_1;
    -- folding k = 2 first gives p_2 = 0.5 i_2 + 0.5 i_2 = i_2 exactly
    state AS (
      SELECT s2.partkey, 1::BIGINT AS k, s2.n,
             cast(s1.q AS DOUBLE) AS z,
             cast(s2.d - s1.d AS DOUBLE) AS p,
             s1.d AS prev_d
      FROM serie s1 JOIN serie s2
        ON s2.partkey = s1.partkey AND s1.k = 1 AND s2.k = 2
      UNION ALL
      SELECT st.partkey, st.k + 1, st.n,
             0.5 * s.q + 0.5 * st.z,
             0.5 * (s.d - st.prev_d) + 0.5 * st.p,
             s.d
      FROM state st JOIN serie s
        ON s.partkey = st.partkey AND s.k = st.k + 1
    )
    SELECT partkey,
           n AS n_demand_days,
           round(z, 6) AS demand_level,
           round(p, 6) AS mean_interval_days,
           round(z / p, 6) AS forecast_per_day
    FROM state WHERE k = n
    """,
)
def orders_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) per part — THE forecasting model for
    INTERMITTENT demand, which is exactly what a TPC-H part's order
    stream is (most parts sell on a handful of days): separate
    exponential smoothing of the nonzero demand sizes (z) and of the
    intervals between demand days (p), forecast = z/p units/day.
    Plain EWMA/Holt over the daily series (events_ewma,
    events_forecast_holt) is biased toward zero on sparse series —
    the zeros crush the level — which is why inventory stacks carry
    Croston beside them.

    Exactness without transcendentals: α = 0.5, so every state update
    is a HALVING FOLD over integer demand sizes and integer day
    intervals — dyadic rationals with bit-identical IEEE evaluation in
    both engines (and when terms age below the ulp the rounding is
    identical too, because the fold order is identical — the Holt
    oracle's argument).  The Spark side folds each part's sorted
    demand-day array with one ``aggregate`` expression carrying
    (z, p, prev_day); the oracle is the same recursion as a recursive
    CTE.  Parts with a single demand day have no interval and are
    excluded on both sides.

    Scale: corpus-sized work is the (part, day) partial agg; each
    part's fold is calendar-bounded (≤ |dates| points) and runs as one
    JVM array expression — no Python, no per-part shuffle beyond the
    one groupBy."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    demand = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.datediff("o_orderdate", F.lit("1992-01-01")).alias("d"),
        )
        .agg(F.expr("cast(round(sum(l_quantity)) as bigint)").alias("q"))
    )
    pts = demand.groupBy("partkey").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(d, q))),"
            " s -> struct(s.d as d, s.q as q))"
        ).alias("pts")
    ).filter(F.size("pts") >= 2)
    fold = F.expr(
        """
        aggregate(
          slice(pts, 2, size(pts) - 1),
          struct(cast(pts[0].q as double) as z,
                 cast(pts[1].d - pts[0].d as double) as p,
                 pts[0].d as prev_d),
          (acc, s) -> struct(
            0.5d * s.q + 0.5d * acc.z,
            0.5d * (s.d - acc.prev_d) + 0.5d * acc.p,
            s.d)
        )
        """
    )
    return pts.select(
        "partkey",
        F.size("pts").cast("long").alias("n_demand_days"),
        fold.alias("st"),
    ).select(
        "partkey",
        "n_demand_days",
        F.round(F.col("st.z"), 6).alias("demand_level"),
        F.round(F.col("st.p"), 6).alias("mean_interval_days"),
        F.round(F.col("st.z") / F.col("st.p"), 6).alias("forecast_per_day"),
    )


_EOQ_ORDER_COST = 100  # fixed cost per replenishment order (S)
_EOQ_HOLD_RATE = 0.2  # annual holding cost as a fraction of unit cost
_EOQ_SERVICE_Z = 1.65  # one-sided 95% service-level critical value


@query(
    "orders_eoq_safety_stock",
    oracle=f"""
    WITH li AS (
      SELECT l.l_partkey AS partkey,
             o.o_orderdate AS oday,
             cast(round(l.l_quantity) AS BIGINT) AS qty,
             cast(round(l.l_extendedprice * 100) AS BIGINT) AS price_c,
             greatest(0, datediff('day', o.o_orderdate, l.l_shipdate)) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    daily AS (
      SELECT partkey, oday, sum(qty)::BIGINT AS dq
      FROM li GROUP BY 1, 2
    ),
    dstat AS (
      SELECT partkey,
             count(*)::BIGINT AS n_days,
             sum(dq)::BIGINT AS d_total,
             sum(cast(dq AS HUGEINT) * dq) AS d_sq
      FROM daily GROUP BY 1
    ),
    lstat AS (
      SELECT partkey,
             sum(lead_days)::BIGINT AS l_sum,
             count(*)::BIGINT AS l_n,
             sum(price_c)::BIGINT AS p_sum,
             sum(qty)::BIGINT AS q_sum
      FROM li GROUP BY 1
    )
    SELECT d.partkey, d.n_days, d.d_total,
           round(cast(d.d_total AS DOUBLE) / d.n_days, 6) AS mean_daily,
           round(sqrt(greatest(0.0, (cast(d.d_sq AS DOUBLE)
                       - cast(d.d_total AS DOUBLE) * cast(d.d_total AS DOUBLE)
                         / d.n_days) / (d.n_days - 1))), 6) AS sigma_daily,
           round(cast(l.l_sum AS DOUBLE) / l.l_n, 6) AS lead_mean_days,
           round(sqrt(2.0 * d.d_total * {_EOQ_ORDER_COST}
                      / ({_EOQ_HOLD_RATE} * (cast(l.p_sum AS DOUBLE) / 100.0
                                             / l.q_sum))), 4) AS eoq,
           round({_EOQ_SERVICE_Z}
                 * sqrt(greatest(0.0, (cast(d.d_sq AS DOUBLE)
                         - cast(d.d_total AS DOUBLE) * cast(d.d_total AS DOUBLE)
                           / d.n_days) / (d.n_days - 1)))
                 * sqrt(cast(l.l_sum AS DOUBLE) / l.l_n), 4) AS safety_stock,
           round(cast(d.d_total AS DOUBLE) / d.n_days
                 * (cast(l.l_sum AS DOUBLE) / l.l_n)
                 + {_EOQ_SERVICE_Z}
                 * sqrt(greatest(0.0, (cast(d.d_sq AS DOUBLE)
                         - cast(d.d_total AS DOUBLE) * cast(d.d_total AS DOUBLE)
                           / d.n_days) / (d.n_days - 1)))
                 * sqrt(cast(l.l_sum AS DOUBLE) / l.l_n), 4) AS reorder_point
    FROM dstat d JOIN lstat l ON l.partkey = d.partkey
    WHERE d.n_days >= 5
    """,
)
def orders_eoq_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inventory POLICY layer on top of the demand models
    (``orders_croston_demand`` forecasts intermittent rates; this
    turns demand into order-size and buffer decisions): per part with
    ≥ 5 demand days, the Wilson EOQ lot size
    ``sqrt(2·D·S / (h·unit_cost))``, the 95% service-level safety
    stock ``z·σ_daily·sqrt(L̄)``, and the reorder point
    ``d̄·L̄ + safety`` — the three numbers every replenishment system
    recomputes nightly over exactly this orders×lineitem shape.  Lead
    time is the observed order→ship gap clamped at 0 per row (the
    synthetic fixture ships some lines before their order date); unit cost is the part's
    fleet-wide price per unit.

    Cross-engine exactness: quantities/prices/lead-days reduce to
    exact integer sufficient statistics (n, Σ, Σ² as
    BIGINT/DECIMAL(38,0)); every derived float — means, σ via the
    (Σ² − Σ²/n)/(n−1) closed form, and both sqrt chains — evaluates
    the same expression tree on both engines (IEEE sqrt/div are
    exact-rounded, so identical integer inputs give bit-identical
    doubles; constants appear as single literals, never folded
    arithmetic).

    Scale: one orders⋈lineitem join (orderkey co-partitioned), two
    partial-agg'd groupBys keyed by part, and a part-keyed join of two
    scalar-row tables — no windows, no driver state; the plan is the
    same at 100 TB with the part dimension sharding the shuffle."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # NOTE (r15 optimization round): persisting this joined stream for
    # its three aggregation branches was tried and MEASURED SLOWER
    # (1.3 s -> 2.5 s at sf0.1 in the back-to-back bench A/B): the join
    # is orderkey-co-partitioned and every branch partial-aggregates,
    # so caching 600k wide rows costs more than the extra scans save.
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_partkey").alias("partkey"),
        F.to_date("o_orderdate").alias("oday"),
        F.expr("cast(round(l_quantity) as bigint)").alias("qty"),
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("price_c"),
        F.greatest(
            F.lit(0), F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        ).alias("lead_days"),
    )
    daily = j.groupBy("partkey", "oday").agg(F.sum("qty").alias("dq"))
    dstat = daily.groupBy("partkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dq").alias("d_total"),
        F.sum(F.col("dq").cast("decimal(38,0)") * F.col("dq")).alias("d_sq"),
    )
    lstat = j.groupBy("partkey").agg(
        F.sum("lead_days").cast("long").alias("l_sum"),
        F.count(F.lit(1)).alias("l_n"),
        F.sum("price_c").alias("p_sum"),
        F.sum("qty").alias("q_sum"),
    )
    d_tot = F.col("d_total").cast("double")
    sigma = F.sqrt(
        F.greatest(
            F.lit(0.0),
            (F.col("d_sq").cast("double") - d_tot * d_tot / F.col("n_days"))
            / (F.col("n_days") - 1),
        )
    )
    lead_mean = F.col("l_sum").cast("double") / F.col("l_n")
    unit_cost = F.col("p_sum").cast("double") / 100.0 / F.col("q_sum")
    mean_daily = d_tot / F.col("n_days")
    safety = _EOQ_SERVICE_Z * sigma * F.sqrt(lead_mean)
    return (
        dstat.filter(F.col("n_days") >= 5)
        .join(lstat, "partkey")
        .select(
            "partkey",
            "n_days",
            "d_total",
            F.round(mean_daily, 6).alias("mean_daily"),
            F.round(sigma, 6).alias("sigma_daily"),
            F.round(lead_mean, 6).alias("lead_mean_days"),
            F.round(
                F.sqrt(
                    2.0 * F.col("d_total") * _EOQ_ORDER_COST
                    / (_EOQ_HOLD_RATE * unit_cost)
                ),
                4,
            ).alias("eoq"),
            F.round(safety, 4).alias("safety_stock"),
            F.round(mean_daily * lead_mean + safety, 4).alias("reorder_point"),
        )
    )


@query(
    "events_attribution_multi_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             first_value(CASE WHEN event_type = 'purchase' THEN ts END
                         IGNORE NULLS) OVER wf AS p_ts,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id END
                         IGNORE NULLS) OVER wf AS p_eid,
             first_value(CASE WHEN event_type = 'purchase' THEN value END
                         IGNORE NULLS) OVER wf AS p_value,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER wb AS np_ts,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_id END
                        IGNORE NULLS) OVER wb AS np_eid,
             last_value(CASE WHEN event_type = 'purchase' THEN ts END
                        IGNORE NULLS) OVER wb AS pp_ts,
             last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                        IGNORE NULLS) OVER wb AS pp_eid
      FROM events
      WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
             wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    touch AS (
      SELECT user_id, ts, event_id, event_type, p_eid, p_value,
             cast(count(*) OVER wp AS BIGINT) AS n,
             cast(row_number() OVER (PARTITION BY user_id, p_eid
                                     ORDER BY ts, event_id) AS BIGINT) AS pos
      FROM seq
      WHERE event_type <> 'purchase' AND p_ts IS NOT NULL
        AND p_ts <= ts + INTERVAL 7 DAY
      WINDOW wp AS (PARTITION BY user_id, p_eid)
    ),
    credit AS (
      SELECT event_type AS channel,
             cast(round(p_value * (1.0 / n) * 1000000) AS BIGINT) AS lin_u,
             cast(round(p_value * (CASE WHEN n = 1 THEN 1.0
                                        WHEN n = 2 THEN 0.5
                                        WHEN pos = 1 OR pos = n THEN 0.4::DOUBLE
                                        ELSE 0.2::DOUBLE / (n - 2) END)
                        * 1000000) AS BIGINT) AS u_u
      FROM touch
    ),
    chan AS (
      SELECT channel, count(*)::BIGINT AS n_credits,
             sum(lin_u)::BIGINT AS lin_su, sum(u_u)::BIGINT AS u_su
      FROM credit GROUP BY 1
    ),
    direct AS (
      SELECT '<direct>' AS channel, count(*)::BIGINT AS n_credits,
             sum(cast(round(value * 1000000) AS BIGINT))::BIGINT AS lin_su,
             sum(cast(round(value * 1000000) AS BIGINT))::BIGINT AS u_su
      FROM seq
      WHERE event_type = 'purchase'
        AND (np_ts IS NULL OR np_ts < ts - INTERVAL 7 DAY
             OR (pp_ts IS NOT NULL
                 AND (pp_ts > np_ts OR (pp_ts = np_ts AND pp_eid > np_eid))))
      HAVING count(*) > 0
    )
    SELECT channel, n_credits,
           round(cast(lin_su AS DOUBLE) / 1000000, 4) AS rev_linear,
           round(cast(u_su AS DOUBLE) / 1000000, 4) AS rev_ushape
    FROM (SELECT * FROM chan UNION ALL SELECT * FROM direct)
    """,
)
def events_attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-touch attribution beside the last-touch staple
    (``events_attribution_last_touch``): every non-purchase event
    credits its NEXT purchase within a 7-day window, and each
    purchase's revenue is split across its touches under two standard
    models at once — LINEAR (1/n each) and U-SHAPED (40% first, 40%
    last, the middle 20% split evenly; 100%/50-50 for 1- and 2-touch
    paths).  Purchases no touch attributes to (no preceding
    non-purchase event within 7 days that is newer than the previous
    purchase) land in '<direct>' at full value under both models —
    the same direct rule as last-touch, made intervening-purchase
    aware.

    No joins: one forward IGNORE-NULLS window finds each touch's next
    purchase, one backward pair of windows classifies direct
    purchases, and a (user, purchase) window numbers the touch path.
    Cross-engine float discipline: each touch's credit is ONE
    double-expression (purchase value × an n/pos-dependent rational,
    identical expression tree both engines) rounded at 1e-6 and summed
    as exact BIGINT micro-units — summation order can't move totals.

    Scale: three window passes over the same user-keyed shuffle plus
    one channel-keyed partial agg; no per-user collect, no self-join —
    the user partition is the only wide edge, same plan at 100 TB."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    is_p = F.col("event_type") == "purchase"
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.first(F.when(is_p, F.col("ts")), ignorenulls=True).over(wf).alias("p_ts"),
        F.first(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(wf)
        .alias("p_eid"),
        F.first(F.when(is_p, F.col("value")), ignorenulls=True)
        .over(wf)
        .alias("p_value"),
        F.last(F.when(~is_p, F.col("ts")), ignorenulls=True).over(wb).alias("np_ts"),
        F.last(F.when(~is_p, F.col("event_id")), ignorenulls=True)
        .over(wb)
        .alias("np_eid"),
        F.last(F.when(is_p, F.col("ts")), ignorenulls=True).over(wb).alias("pp_ts"),
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(wb)
        .alias("pp_eid"),
    )
    touch = seq.filter(
        ~is_p
        & F.col("p_ts").isNotNull()
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 7 DAY"))
    )
    wp = Window.partitionBy("user_id", "p_eid")
    wpo = wp.orderBy("ts", "event_id")
    touch = touch.select(
        F.col("event_type").alias("channel"),
        "p_value",
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.row_number().over(wpo).cast("long").alias("pos"),
    )
    n, pos = F.col("n"), F.col("pos")
    share_u = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((pos == 1) | (pos == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    credit = touch.select(
        "channel",
        F.expr("cast(round(p_value * (1.0 / n) * 1000000) as bigint)").alias("lin_u"),
        (F.round(F.col("p_value") * share_u * 1000000, 0).cast("bigint")).alias("u_u"),
    )
    chan = credit.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("lin_u").alias("lin_su"),
        F.sum("u_u").alias("u_su"),
    )
    np_before_pp = F.col("pp_ts").isNotNull() & (
        (F.col("pp_ts") > F.col("np_ts"))
        | ((F.col("pp_ts") == F.col("np_ts")) & (F.col("pp_eid") > F.col("np_eid")))
    )
    direct = (
        seq.filter(
            is_p
            & (
                F.col("np_ts").isNull()
                | (F.col("np_ts") < F.col("ts") - F.expr("INTERVAL 7 DAY"))
                | np_before_pp
            )
        )
        .select(F.expr("cast(round(value * 1000000) as bigint)").alias("v_u"))
        .agg(
            F.lit("<direct>").alias("channel"),
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("v_u").alias("lin_su"),
            F.sum("v_u").alias("u_su"),
        )
        .filter(F.col("n_credits") > 0)
    )
    return chan.unionByName(direct).select(
        "channel",
        "n_credits",
        F.round(F.col("lin_su").cast("double") / 1000000, 4).alias("rev_linear"),
        F.round(F.col("u_su").cast("double") / 1000000, 4).alias("rev_ushape"),
    )


@query(
    "events_rolling_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts AS DATE) AS day,
             cast(round(cast(sum(cast(value AS DECIMAL(14,4)))
                             AS DECIMAL(18,4)) * 10000) AS BIGINT) AS y_u
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, y_u,
             datediff('day', min(day) OVER (PARTITION BY event_type), day)
               ::BIGINT AS x
      FROM daily
    ),
    win AS (
      SELECT event_type, day, x, y_u,
             count(*) OVER w::BIGINT AS n,
             sum(x) OVER w::BIGINT AS sx,
             sum(y_u) OVER w::BIGINT AS sy,
             sum(x * y_u) OVER w::BIGINT AS sxy,
             sum(x * x) OVER w::BIGINT AS sxx
      FROM idx
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, epoch_us(day::TIMESTAMP)::BIGINT AS day_us, n AS n_win,
           round(cast(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) / 10000.0, 6) AS slope
    FROM win
    WHERE n >= 3 AND n * sxx - sx * sx > 0
    """,
)
def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ordinary-least-squares TREND per event type: the OLS
    slope of the daily-volume series over a trailing 7-observation
    window — the local trend detector dashboards run beside the global
    estimators (``stat_theil_sen_trend``/``stat_mann_kendall`` fit ONE
    trend to the whole series; this one localizes WHEN the drift
    starts).  Slope in value-units/day, from the closed form
    (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²).

    Exactness: daily sums quantize to BIGINT micro-units (the
    stat_mann_kendall rule); x is the day offset from each series'
    first day (re-centering keeps n·Σxy within int64); all five window
    sums are exact integers, and the single division happens on
    identically-rounded doubles in both engines.  Head-of-series
    windows with n < 3 (or a degenerate x spread) are excluded on both
    sides.

    Scale: one (type, day) partial agg, one type-keyed window pass
    with five running sums — calendar-bounded rows per type, the same
    plan at any event volume."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.expr(
            "cast(round(cast(sum(cast(value as decimal(14,4))) as decimal(18,4))"
            " * 10000) as bigint)"
        ).alias("y_u")
    )
    idx = daily.select(
        "event_type",
        "day",
        "y_u",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy("event_type"))
        )
        .cast("long")
        .alias("x"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    win = idx.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y_u").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y_u")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    den = n * sxx - sx * sx
    return win.filter((n >= 3) & (den > 0)).select(
        "event_type",
        F.unix_micros(F.col("day").cast("timestamp")).alias("day_us"),
        n.alias("n_win"),
        F.round((n * sxy - sx * sy).cast("double") / den / 10000.0, 6).alias(
            "slope"
        ),
    )
