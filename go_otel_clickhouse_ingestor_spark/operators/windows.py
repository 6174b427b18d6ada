"""Window functions: ranking, analytic, row/range frames.

The headline query, ``win_rank_latest_per_key``, is the windowed form
of the reference's ReplacingMergeTree latest-row-wins contract (A16 —
README.md:121, version columns ``_lsn``/``_ts`` in
``internal/model/cdc.go:33-41``): row_number over (key ORDER BY version
DESC) = 1.

Scale note: a window over PARTITION BY k costs one shuffle on k plus a
per-partition sort.  Skewed keys are the risk at 100 TB — prefer the
max_by aggregate form (relational.agg_argmax_latest) when only the
top-1 row is needed; the full window form is for when every row needs
its rank/frame value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table


@query(
    "win_rank_latest_per_key",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts)::BIGINT AS ts_us, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def win_rank_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — A16's latest-per-key as a ranked window
    (row_number over version DESC, tie-broken on event_id = 1)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
    )


@query(
    "win_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile of customers by balance within nation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value_seen,
           last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user ordered by event time.  Frames for
    first/last are written explicitly (ROWS UNBOUNDED PRECEDING..CURRENT
    ROW) so both engines agree — default frames for last_value are a
    classic cross-engine trap."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_value_seen"),
        F.last("value").over(wf).alias("running_last"),
    )


@query(
    "win_frame_rows",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_sum3
    FROM events
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving sum/avg over a ROWS frame (2 preceding .. current)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.avg("value").over(w), 6).alias("moving_avg3"),
        F.round(F.sum("value").over(w), 4).alias("moving_sum3"),
    )


@query(
    "win_frame_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: 30-day trailing spend per customer.
    Ordered on epoch seconds (a numeric) so the range frame is portable
    across engines; 2592000 s = 30 days."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist,
           ntile(10)            OVER w AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile
    deciles of customers by balance within nation.  The c_custkey
    tie-break makes the ordering total, so both engines agree exactly
    (percent_rank over ties is otherwise engine-dependent)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


#: Session gap: a new session starts after this much user inactivity.
_SESSION_GAP_US = 4 * 3600 * 1_000_000


@query(
    "win_session_gaps",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, epoch_us(ts)::BIGINT AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
                  OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts_us,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx::BIGINT AS session_idx,
           count(*) AS n_events,
           min(ts_us) AS session_start_us,
           max(ts_us) AS session_end_us
    FROM numbered
    GROUP BY user_id, session_idx
    """,
)
def win_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch twin of the streaming
    session window): lag() flags a session break after 4 h of user
    inactivity, a running sum numbers sessions, then one groupBy rolls
    each session up.  Cost shape: both windows and the final agg share
    the single shuffle on user_id — Catalyst reuses the partitioning,
    so sessionizing 100 TB of events is one shuffle + per-key sorts,
    never a self-join on time ranges."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    prev = F.lag("ts_us").over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(prev.isNull() | (F.col("ts_us") - prev > _SESSION_GAP_US), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("new_sess").over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


@query(
    "agg_windowed_time",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS bucket_us,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_windowed_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time aggregation — the batch face of the
    streaming tumbling window (streaming/windows.py runs the same
    shape with a watermark).  ``F.window`` is a plain grouping
    expression: one partial+final hash agg, same cost as any groupBy;
    the bucket count is bounded by time-range/1h so the final agg is
    tiny at any SF."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "win_ignore_nulls",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type IN ('error', 'view') THEN NULL
                  ELSE round(value, 2) END AS val_n
      FROM events
    )
    SELECT event_id, user_id, val_n,
           last_value(val_n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS filled_prev,
           first_value(val_n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS filled_next
    FROM g
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytic frames — the gap-fill primitive: carry the
    last non-null observation forward (LOCF) and the next one backward
    per key.  Nulls are synthesized from event_type (the fixture has
    none) so both directions exercise real gaps.  Same single
    user-partitioned window shuffle as any analytic; the ignore-nulls
    scan is per-frame, no extra exchange."""
    ev = table(spark, sf_dir, "events")
    g = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_type").isin("error", "view"), F.lit(None)
        ).otherwise(F.round("value", 2)).alias("val_n"),
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    nxt = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return g.select(
        "event_id",
        "user_id",
        "val_n",
        F.last("val_n", ignorenulls=True).over(prev).alias("filled_prev"),
        F.first("val_n", ignorenulls=True).over(nxt).alias("filled_next"),
    )


#: Resample grid step: one hour, in microseconds.
_RESAMPLE_STEP_US = 3_600_000_000


@query(
    "events_resample_interpolate",
    oracle=f"""
    WITH sel AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE user_id % 20 = 0
    ),
    bounds AS (
      SELECT user_id, min(ts_us) AS t0, max(ts_us) AS t1
      FROM sel GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(range(t0, t1 + 1, {_RESAMPLE_STEP_US})) AS ts_us
      FROM bounds
    ),
    u AS (
      SELECT user_id, ts_us, value, 1 AS is_obs FROM sel
      UNION ALL
      SELECT user_id, ts_us, NULL, 0 FROM grid
    ),
    w AS (
      SELECT user_id, ts_us, is_obs,
             last_value(CASE WHEN is_obs = 1 THEN ts_us END IGNORE NULLS) OVER lookback AS prev_ts,
             last_value(CASE WHEN is_obs = 1 THEN value END IGNORE NULLS) OVER lookback AS prev_val,
             first_value(CASE WHEN is_obs = 1 THEN ts_us END IGNORE NULLS) OVER lookahead AS next_ts,
             first_value(CASE WHEN is_obs = 1 THEN value END IGNORE NULLS) OVER lookahead AS next_val
      FROM u
      WINDOW
        lookback AS (PARTITION BY user_id ORDER BY ts_us, is_obs DESC, value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        lookahead AS (PARTITION BY user_id ORDER BY ts_us, is_obs DESC, value
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, ts_us AS grid_ts_us,
           round(CASE
             WHEN prev_ts IS NULL THEN NULL
             WHEN next_ts IS NULL OR next_ts = prev_ts THEN prev_val
             ELSE prev_val + (next_val - prev_val)
                             * (ts_us - prev_ts) / (next_ts - prev_ts)
           END, 4) AS value_interp
    FROM w WHERE is_obs = 0
    """,
)
def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling onto a fixed hourly grid with linear
    interpolation between the surrounding observations (LOCF past the
    last one) — the gap-fill a metrics pipeline runs before joining
    irregular series.

    Plan shape: the grid is GENERATED per key (sequence + explode from
    each user's min/max — no calendar table shuffle-joined in), then
    observations and grid points are unioned and a single user-
    partitioned window pass computes both bracketing neighbors via
    IGNORE NULLS frames — two logical windows over one sort, one
    shuffle total.  Observations sort before grid points at the same
    timestamp (is_obs DESC), so an exactly-aligned sample interpolates
    to itself.  At 100 TB the grid is O(keys × horizon/step), decoupled
    from event volume, and the window shuffles on user_id exactly like
    every other per-key analytic here."""
    sel = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
    )
    grid = (
        sel.groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("t0", "t1", F.lit(_RESAMPLE_STEP_US))
            ).alias("ts_us"),
        )
    )
    u = sel.withColumn("is_obs", F.lit(1)).unionByName(
        grid.select(
            "user_id", "ts_us", F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_obs"),
        )
    )
    order = Window.partitionBy("user_id").orderBy(
        "ts_us", F.col("is_obs").desc(), "value"
    )
    lookback = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lookahead = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_ts = F.when(F.col("is_obs") == 1, F.col("ts_us"))
    obs_val = F.when(F.col("is_obs") == 1, F.col("value"))
    w = u.select(
        "user_id",
        "ts_us",
        "is_obs",
        F.last(obs_ts, ignorenulls=True).over(lookback).alias("prev_ts"),
        F.last(obs_val, ignorenulls=True).over(lookback).alias("prev_val"),
        F.first(obs_ts, ignorenulls=True).over(lookahead).alias("next_ts"),
        F.first(obs_val, ignorenulls=True).over(lookahead).alias("next_val"),
    )
    interp = (
        F.when(F.col("prev_ts").isNull(), F.lit(None))
        .when(
            F.col("next_ts").isNull() | (F.col("next_ts") == F.col("prev_ts")),
            F.col("prev_val"),
        )
        .otherwise(
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val"))
            * (F.col("ts_us") - F.col("prev_ts"))
            / (F.col("next_ts") - F.col("prev_ts"))
        )
    )
    return (
        w.filter(F.col("is_obs") == 0)
        .select(
            "user_id",
            F.col("ts_us").alias("grid_ts_us"),
            F.round(interp, 4).alias("value_interp"),
        )
    )


@query(
    "win_pct_change",
    oracle="""
    SELECT event_id, user_id,
           round((value - lag(value) OVER w) / lag(value) OVER w, 6) AS pct_change,
           round(value - lag(value) OVER w, 6)                       AS diff,
           coalesce(value > lag(value) OVER w, FALSE)                AS increased
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key percent change — the time-series delta primitive (lag
    within user ordered by event time).  First event per user yields
    NULL deltas (SQL lag semantics); the boolean is coalesced to FALSE
    because null-bool serialization differs between engines (None vs
    NaN) where null floats agree.  Element-wise IEEE arithmetic on
    two scalars is engine-deterministic, so only round-for-display is
    needed.  Scale: one shuffle on user_id; the frame is a single
    previous row, O(1) state per partition during the sort-based
    window scan."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round((F.col("value") - prev) / prev, 6).alias("pct_change"),
        F.round(F.col("value") - prev, 6).alias("diff"),
        F.coalesce(F.col("value") > prev, F.lit(False)).alias("increased"),
    )


@query(
    "win_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    daily AS (
      SELECT date_trunc('day', ts) AS day,
             count(*) FILTER (WHERE rn = 1) AS n_new,
             count(*)                       AS n_events
      FROM firsts GROUP BY date_trunc('day', ts)
    )
    SELECT day, n_events, n_new,
           cast(sum(n_new) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count by day — the growth-curve query
    (COUNT(DISTINCT) OVER is unsupported in every engine's window
    frame, so the portable plan is the first-seen-flag trick):
    row_number per user marks each user's first event, daily
    aggregation counts the flags, and a running SUM over days yields
    the cumulative distinct total.  The only global window runs over
    DAY-GRAIN rows — bounded by the calendar (≤ a few thousand rows
    for a decade), never by data volume, the same bounded-by-
    construction exemption as pipeline_corpus_filter's final cut.
    Heavy lifting (per-user ranking, daily agg) is fully partitioned."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w))
    daily = firsts.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_new"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "n_events",
        "n_new",
        F.sum("n_new").over(wd).alias("cum_users"),
    )


@query(
    "win_moving_median",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             cast(sum(cast(value AS DECIMAL(24,10))) AS DOUBLE) AS revenue
      FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day,
           round(revenue, 6) AS revenue,
           round(quantile_disc(revenue, 0.5)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS med7
    FROM daily
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling median of daily revenue per event type —
    the robust-smoothing twin of the rolling mean (medians shrug off
    the spike days that wreck an EWMA).  No engine supports a median
    window frame portably, so the plan collects the ≤7-row frame with
    collect_list OVER, sorts it, and indexes the LOWER median at
    ceil(n/2) — exactly DuckDB's quantile_disc(0.5) window semantics,
    pinned explicitly so even-sized warm-up frames can't diverge on
    interpolation.  Daily sums go through DECIMAL first, so both
    engines feed identical doubles into identical frames.  Windows are
    partitioned by event_type over day-grain rows (calendar-bounded);
    the constant 7-row frame keeps per-row state O(1)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.expr(
            "cast(sum(cast(value as decimal(24,10))) as double)"
        ).alias("revenue")
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("revenue").over(wf))
    return daily.select(
        "event_type",
        "day",
        F.round("revenue", 6).alias("revenue"),
        F.round(
            F.element_at(frame, F.ceil(F.size(frame) / 2).cast("int")), 6
        ).alias("med7"),
    )


#: Session gap for the built-in session_window TVF face.
_SW_GAP_MIN = 30


@query(
    "win_session_window_tvf",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts)
                       > {_SW_GAP_MIN} * 60 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(epoch_us(ts))                    AS session_start_us,
           max(epoch_us(ts))
             + {_SW_GAP_MIN} * 60 * 1000000     AS session_end_us,
           count(*)                             AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def win_session_window_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN ``session_window`` aggregation (Spark's session
    TVF, usable in batch AND streaming) with a {_SW_GAP_MIN}-minute
    gap — the engine-native face of what ``win_session_gaps`` builds
    by hand with gaps-and-islands windows.  Worth both forms: the
    manual form composes with arbitrary window logic; the TVF form is
    ONE partial-aggregable operator (no ordered window pass at all —
    Spark merges overlapping session fragments in the agg), carries
    straight into Structured Streaming with watermark-based eviction,
    and is what a migrating ClickHouse user should reach for first.
    The oracle reproduces the session semantics via the classic
    flag+cumsum rewrite; session_end follows Spark's definition
    (last event + gap).  All outputs are exact integers
    (epoch-micros, counts)."""
    ev = table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), f"{_SW_GAP_MIN} minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
