"""Trace-tree analytics over OTel-shaped span trees.

The reference is an OTel ingestor that EMITS spans about itself (A15,
``internal/tracing/tracing.go``: generateEvent / insertToClickHouse
spans per message) but never analyzes them — the queries its span
tables exist for live downstream.  This module supplies the two core
trace-table queries every tracing backend ships: per-service self-time
rollup (where does wall time actually go, after subtracting child
spans — the flame-graph aggregation) and the service dependency graph
(who calls whom, how often, how slow — the service-map edge table).

The fixture corpus has no span landing zone, so both queries derive a
deterministic span TREE from the events table (the
``source_otlp_spans_parse`` discipline: synthesis is explicit integer
arithmetic, byte-identical in both engines): each user's events in
(ts, event_id) order become spans 1..n of one trace, and span i's
parent is span i//2 — the binary-heap layout, which makes the tree
shape exact and the DEPTH a closed form (bit_length(i) - 1) instead of
a recursive traversal.  That closed form is the scale trick: depth and
parent attribution need no iterative joins, so the whole analysis is
one user-keyed window + one co-partitioned self-join, linear in spans.

Scale shape (100 TB): spans shuffle once on trace key (user_id); the
parent join is key-aligned on the same shuffle (no second exchange of
the big side); outputs are service-domain-bounded grids (5 rows / ≤25
edges).  Per-trace span counts are session-bounded (the join_asof
discipline), so no window partition is ever traffic-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table

#: Shared DuckDB CTE deriving the deterministic span tree (kept as one
#: string so both oracles parse the identical synthesis).
_SPANS_CTE = """
    spans AS (
      SELECT user_id,
             event_id,
             cast(row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS BIGINT) AS idx,
             abs(cast(round(value * 1000) AS BIGINT)) * 1000 AS dur_us,
             'svc-' || cast(event_id % 5 AS VARCHAR) AS service
      FROM events
    )
"""


def _span_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic heap-layout span tree from the events table:
    trace = user, span order = (ts, event_id), parent(i) = i // 2,
    duration = |value| in exact micro units, service = event_id % 5."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            (
                F.abs(F.expr("cast(round(value * 1000) as bigint)")) * 1000
            ).alias("dur_us"),
            F.concat(
                F.lit("svc-"), (F.col("event_id") % 5).cast("string")
            ).alias("service"),
        )
        .withColumn("idx", F.row_number().over(w).cast("long"))
        .drop("ts_us")
    )


@query(
    "spans_self_time_rollup",
    oracle=f"""
    WITH {_SPANS_CTE},
    child AS (
      SELECT user_id, idx // 2 AS pidx, sum(dur_us) AS child_us
      FROM spans WHERE idx > 1
      GROUP BY user_id, idx // 2
    ),
    per_span AS (
      SELECT s.service,
             s.idx,
             s.dur_us,
             greatest(0, s.dur_us - coalesce(c.child_us, 0)) AS self_us,
             cast(length(printf('%b', s.idx)) - 1 AS BIGINT) AS depth
      FROM spans s
      LEFT JOIN child c ON c.user_id = s.user_id AND c.pidx = s.idx
    )
    SELECT service,
           cast(count(*) AS BIGINT)                          AS n_spans,
           cast(sum(CASE WHEN idx = 1 THEN 1 ELSE 0 END)
                AS BIGINT)                                   AS n_roots,
           cast(sum(dur_us) AS BIGINT)                       AS total_dur_us,
           cast(sum(self_us) AS BIGINT)                      AS total_self_us,
           max(depth)                                        AS max_depth
    FROM per_span GROUP BY service
    """,
)
def spans_self_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service SELF-TIME rollup — the flame-graph aggregation every
    tracing backend runs over span tables like the ones the reference's
    self-tracing feeds (A15, ``internal/tracing/tracing.go``): a span's
    self time is its duration minus its direct children's durations
    (clamped at 0 — clock skew makes child sums exceed parents in real
    traces too), so summing self time per service says where wall time
    is actually SPENT, which total duration double-counts at every
    level of the tree.  Depth is the heap closed form bit_length(idx)−1
    — exact integer bit arithmetic (the events_exp_histogram
    discipline), no recursive traversal.  Plan: one user-keyed window
    to index spans, one co-partitioned self-aggregate join (child sums
    group on the SAME user key — no extra exchange of the span
    stream), then a 5-row service agg.  All integers; no float
    anywhere."""
    s = _span_tree(spark, sf_dir)
    child = (
        s.filter(F.col("idx") > 1)
        .groupBy("user_id", F.expr("idx div 2").alias("pidx"))
        .agg(F.sum("dur_us").alias("child_us"))
    )
    per_span = (
        s.join(
            child,
            (s.user_id == child.user_id) & (child.pidx == s.idx),
            "left",
        )
        .select(
            "service",
            "idx",
            "dur_us",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("dur_us") - F.coalesce("child_us", F.lit(0)),
            ).alias("self_us"),
            (F.length(F.bin("idx")) - 1).cast("long").alias("depth"),
        )
    )
    return per_span.groupBy("service").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.when(F.col("idx") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_roots"),
        F.sum("dur_us").cast("long").alias("total_dur_us"),
        F.sum("self_us").cast("long").alias("total_self_us"),
        F.max("depth").alias("max_depth"),
    )


@query(
    "spans_service_dependency",
    oracle=f"""
    WITH {_SPANS_CTE}
    SELECT p.service AS parent_service,
           s.service AS child_service,
           cast(count(*) AS BIGINT)                 AS n_calls,
           cast(count(DISTINCT s.user_id) AS BIGINT) AS n_traces,
           cast(sum(s.dur_us) AS BIGINT)            AS total_child_dur_us
    FROM spans s
    JOIN spans p ON p.user_id = s.user_id AND p.idx = s.idx // 2
    WHERE s.idx > 1
    GROUP BY p.service, s.service
    """,
)
def spans_service_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service dependency graph from parent→child span edges — the
    service-map table (Jaeger/Tempo's dependency view; ClickHouse
    deployments materialize exactly this from the span table the
    reference-shaped ingestor feeds): per (calling service, called
    service) edge, call count, distinct traces touched, and total time
    spent in the callee.  Plan: the parent lookup is a self-join
    key-aligned on the trace key (both sides come out of the same
    user-keyed shuffle — Catalyst reuses the exchange), and the output
    is the ≤|services|² edge grid (25 cells), so nothing downstream of
    the scan is traffic-sized.  The distinct-trace count rides the
    same grid agg (Spark expands it to a two-phase distinct — still
    one pass)."""
    s = _span_tree(spark, sf_dir)
    child = s.filter(F.col("idx") > 1).select(
        "user_id",
        F.expr("idx div 2").alias("pidx"),
        F.col("service").alias("child_service"),
        "dur_us",
    )
    parent = s.select(
        F.col("user_id").alias("p_user_id"),
        F.col("idx").alias("p_idx"),
        F.col("service").alias("parent_service"),
    )
    edges = child.join(
        parent,
        (child.user_id == parent.p_user_id) & (child.pidx == parent.p_idx),
    )
    return edges.groupBy("parent_service", "child_service").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.count_distinct("user_id").cast("long").alias("n_traces"),
        F.sum("dur_us").cast("long").alias("total_child_dur_us"),
    )


@query(
    "spans_critical_path",
    oracle=f"""
    WITH {_SPANS_CTE},
    sized AS (
      SELECT s.*, count(*) OVER (PARTITION BY user_id) AS n_spans
      FROM spans s
    ),
    leaves AS (
      SELECT user_id, idx AS leaf_idx, n_spans
      FROM sized WHERE 2 * idx > n_spans
    ),
    anc AS (
      SELECT l.user_id, l.leaf_idx,
             l.leaf_idx >> cast(j.j AS BIGINT) AS anc_idx
      FROM leaves l,
           LATERAL (SELECT unnest(range(0,
             cast(length(printf('%b', l.leaf_idx)) AS BIGINT))) AS j) j
    ),
    paths AS (
      SELECT a.user_id, a.leaf_idx,
             cast(sum(s.dur_us) AS BIGINT) AS path_us,
             cast(count(*) AS BIGINT)      AS path_len
      FROM anc a JOIN spans s
        ON s.user_id = a.user_id AND s.idx = a.anc_idx
      GROUP BY a.user_id, a.leaf_idx
    ),
    best AS (
      SELECT user_id, leaf_idx, path_us, path_len,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY path_us DESC, leaf_idx) AS rn
      FROM paths
    )
    SELECT b.user_id AS trace_id,
           cast(max(s.n_spans) AS BIGINT)  AS n_spans,
           cast((SELECT count(*) FROM leaves l
                 WHERE l.user_id = b.user_id) AS BIGINT) AS n_leaves,
           max(CASE WHEN b.rn = 1 THEN b.path_us END)  AS critical_us,
           max(CASE WHEN b.rn = 1 THEN b.path_len END) AS critical_depth,
           max(CASE WHEN b.rn = 1 THEN b.leaf_idx END) AS critical_leaf_idx
    FROM best b JOIN sized s ON s.user_id = b.user_id
    GROUP BY b.user_id
    """,
)
def spans_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trace CRITICAL PATH — the longest root-to-leaf duration sum,
    the number a trace viewer prints first (the path that bounds how
    fast the request could possibly have been; optimizing any span off
    it changes nothing).  General span DAGs need an iterative
    longest-path pass; the heap layout makes every ancestor chain a
    CLOSED FORM (leaf >> j for j = 0..bit_length−1), so the whole
    computation is one log-factor explode + one co-partitioned
    self-join — linear×log in spans with NO recursion, the same
    bit-arithmetic trick as the depth column in
    ``spans_self_time_rollup``.  Ties break to the lowest leaf index
    (deterministic).  Plan: spans shuffle once on the trace key; the
    ancestor join and both windows reuse that partitioning; output is
    one row per trace."""
    from ..operators.dedup import materialized

    s = _span_tree(spark, sf_dir)
    w = Window.partitionBy("user_id")
    # sized is consumed by THREE branches (leaf set, ancestor-join
    # probe, per-trace span count): persist it so the events scan and
    # the two user_id windows run once, not per branch (the span-tree
    # derivation was ~2/3 of this query's runtime at sf0.1)
    sized = materialized(
        s.withColumn("n_spans", F.count(F.lit(1)).over(w).cast("long"))
    )
    s = sized.select("user_id", "idx", "dur_us")
    leaves = sized.filter(2 * F.col("idx") > F.col("n_spans")).select(
        "user_id", F.col("idx").alias("leaf_idx"), "n_spans"
    )
    anc = leaves.select(
        "user_id",
        "leaf_idx",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.length(F.bin("leaf_idx")) - 1).cast("long"),
            )
        ).alias("j"),
    ).select(
        "user_id", "leaf_idx", F.expr("leaf_idx >> j").alias("anc_idx")
    )
    paths = (
        anc.join(
            s.select("user_id", "idx", "dur_us").withColumnRenamed(
                "user_id", "s_user_id"
            ),
            (anc.user_id == F.col("s_user_id"))
            & (anc.anc_idx == F.col("idx")),
        )
        .groupBy("user_id", "leaf_idx")
        .agg(
            F.sum("dur_us").cast("long").alias("path_us"),
            F.count(F.lit(1)).cast("long").alias("path_len"),
        )
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("path_us").desc(), F.col("leaf_idx")
    )
    best = paths.withColumn("rn", F.row_number().over(wb))
    n_leaves = leaves.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_leaves")
    )
    n_spans = sized.groupBy("user_id").agg(
        F.max("n_spans").alias("n_spans")
    )
    return (
        best.filter(F.col("rn") == 1)
        .join(n_leaves, "user_id")
        .join(n_spans, "user_id")
        .select(
            F.col("user_id").alias("trace_id"),
            "n_spans",
            "n_leaves",
            F.col("path_us").alias("critical_us"),
            F.col("path_len").alias("critical_depth"),
            F.col("leaf_idx").alias("critical_leaf_idx"),
        )
    )


@query(
    "spans_exemplar_slow_traces",
    oracle=f"""
    WITH {_SPANS_CTE},
    per_trace AS (
      SELECT s.user_id AS trace_id,
             cast(count(*) AS BIGINT)      AS n_spans,
             cast(sum(s.dur_us) AS BIGINT) AS total_us,
             cast(max(s.dur_us) AS BIGINT) AS max_span_us,
             min(CASE WHEN s.idx = 1 THEN s.service END) AS root_service
      FROM spans s GROUP BY s.user_id
    ),
    slowest AS (
      SELECT user_id AS trace_id, service AS slowest_service
      FROM (
        SELECT user_id, service,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY dur_us DESC, idx) AS rn
        FROM spans) t
      WHERE rn = 1
    )
    SELECT p.trace_id, p.root_service, sl.slowest_service,
           p.n_spans, p.total_us, p.max_span_us,
           cast(row_number() OVER (ORDER BY p.total_us DESC, p.trace_id)
                AS BIGINT) AS rn
    FROM per_trace p JOIN slowest sl ON sl.trace_id = p.trace_id
    ORDER BY rn LIMIT 20
    """,
)
def spans_exemplar_slow_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slow-trace exemplars — the "show me the 20 worst traces" query
    every trace UI opens with, and the navigation layer above the
    aggregates (``spans_self_time_rollup`` says WHERE time goes
    fleet-wide; this says WHICH traces to open): per trace, total span
    time, the single largest span, the root's service, and the
    service owning the slowest span (deterministic argmax: duration
    desc, heap index asc).  Plan: one trace-keyed agg + one
    trace-keyed argmax window on the SAME shuffle, then
    ``orderBy().limit(20)`` — TakeOrderedAndProject, so the global
    sort never materializes (the vocab-coverage discipline); the rank
    window runs over 20 rows only."""
    s = _span_tree(spark, sf_dir)
    per_trace = s.groupBy(F.col("user_id").alias("trace_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("dur_us").cast("long").alias("total_us"),
        F.max("dur_us").cast("long").alias("max_span_us"),
        F.min(F.when(F.col("idx") == 1, F.col("service"))).alias(
            "root_service"
        ),
    )
    wsl = Window.partitionBy("user_id").orderBy(
        F.col("dur_us").desc(), F.col("idx")
    )
    slowest = (
        s.withColumn("rn", F.row_number().over(wsl))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("trace_id"),
            F.col("service").alias("slowest_service"),
        )
    )
    top = (
        per_trace.join(slowest, "trace_id")
        .orderBy(F.col("total_us").desc(), F.col("trace_id"))
        .limit(20)
    )
    # bounded: window ranks the 20-row limit output only
    wr = Window.orderBy(F.col("total_us").desc(), F.col("trace_id"))
    return top.select(
        "trace_id",
        "root_service",
        "slowest_service",
        "n_spans",
        "total_us",
        "max_span_us",
        F.row_number().over(wr).cast("long").alias("rn"),
    )


#: Apdex satisfied threshold in exact micro-units (tolerating = 4T,
#: the Apdex standard's fixed multiplier).
_APDEX_T_US = 25_000


@query(
    "spans_apdex",
    oracle=f"""
    WITH {_SPANS_CTE}
    SELECT service,
           cast(count(*) AS BIGINT) AS n_spans,
           cast(sum(CASE WHEN dur_us <= {_APDEX_T_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_satisfied,
           cast(sum(CASE WHEN dur_us > {_APDEX_T_US}
                          AND dur_us <= {4 * _APDEX_T_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tolerating,
           cast(sum(CASE WHEN dur_us > {4 * _APDEX_T_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_frustrated,
           cast((sum(CASE WHEN dur_us <= {_APDEX_T_US} THEN 1 ELSE 0 END)
                   * 1000000
                 + sum(CASE WHEN dur_us > {_APDEX_T_US}
                             AND dur_us <= {4 * _APDEX_T_US}
                            THEN 1 ELSE 0 END) * 500000)
                // count(*) AS BIGINT) AS apdex_ppm
    FROM spans GROUP BY service
    """,
)
def spans_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service Apdex over the SPAN table — the trace-side sibling
    of ``events_apdex_score`` (which scores event values per type in
    rounded float): here the subject is span durations per SERVICE,
    the output carries the three bucket COUNTS (the mergeable state
    the windowed streaming face re-aggregates — ``apdex_windowed``),
    and the index is exact integer ppm.  Spans are bucketed
    satisfied (≤T), tolerating (≤4T — the standard's fixed
    multiplier), frustrated (>4T), and the index is
    (satisfied + tolerating/2) / total — emitted in exact integer ppm
    via integer floor-division (the events_slo_burn_rate discipline:
    no float boundary can flip a bucket between engines, T compares
    in exact micro-units).  The satisfaction-weighted cousin of the
    self-time rollup: that says where time GOES, this says how users
    EXPERIENCE it.  Plan: one map-side-combined pass over the span
    stream into the 5-row service grid — no joins, no windows;
    trivially the same plan at 100 TB."""
    s = _span_tree(spark, sf_dir)
    sat = F.when(F.col("dur_us") <= _APDEX_T_US, 1).otherwise(0)
    tol = F.when(
        (F.col("dur_us") > _APDEX_T_US)
        & (F.col("dur_us") <= 4 * _APDEX_T_US),
        1,
    ).otherwise(0)
    fru = F.when(F.col("dur_us") > 4 * _APDEX_T_US, 1).otherwise(0)
    return s.groupBy("service").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(sat).cast("long").alias("n_satisfied"),
        F.sum(tol).cast("long").alias("n_tolerating"),
        F.sum(fru).cast("long").alias("n_frustrated"),
        F.expr(
            f"(sum(case when dur_us <= {_APDEX_T_US} then 1 else 0 end)"
            f" * 1000000"
            f" + sum(case when dur_us > {_APDEX_T_US}"
            f" and dur_us <= {4 * _APDEX_T_US} then 1 else 0 end)"
            f" * 500000) div count(*)"
        )
        .cast("long")
        .alias("apdex_ppm"),
    )


#: The RED/tail-sampling faces need span STATUS and NAME, which the
#: heap-tree synthesis above doesn't carry.  Same discipline — explicit
#: integer arithmetic, byte-identical in both engines: span name is the
#: event type verbatim, and a span is ERROR iff it is an 'error' event
#: whose value exceeds 300 (the severity tail — rare by construction,
#: like real 5xx spans; `event_type = 'error'` alone marks ~20% of the
#: fixture, which would make every trace error-sampled).
_SPANS_FLAT_CTE = """
    spans AS (
      SELECT user_id,
             event_type AS span_name,
             'svc-' || cast(event_id % 5 AS VARCHAR) AS service,
             abs(cast(round(value * 1000) AS BIGINT)) * 1000 AS dur_us,
             CASE WHEN event_type = 'error' AND value > 300
                  THEN 1 ELSE 0 END AS is_error
      FROM events
    )
"""

#: Cumulative duration-histogram boundaries (µs) for the RED metrics —
#: the OTel spanmetrics connector's explicit-bounds histogram, sized to
#: the fixture's duration range (durations are |value|·10⁶ µs with
#: value ∈ ~[0, 330], so the bounds sit at the 30/60/120/240-second
#: marks; the +inf bucket is n_calls itself and is not emitted).
_RED_BOUNDS_US = (30_000_000, 60_000_000, 120_000_000, 240_000_000)

#: Tail-sampling policy constants: latency policy fires above the
#: fixture's ~p85 per-trace total (per-trace totals concentrate around
#: 3.3e9 µs at every SF because spans-per-trace is SF-invariant);
#: probabilistic policy keeps ~10% of traces via a multiplicative hash
#: into a PRIME modulus, exact BIGINT in both engines (no float, no
#: engine hash).  The prime matters: a plain (id·c) % 100 is a unit
#: multiplication mod 100 — a residue PERMUTATION, so any structured
#: id space (per-tenant blocks, stride-100 allocators) samples at 0%
#: or 100%; reducing mod 1,000,003 first breaks stride alignment with
#: the keep threshold.  No overflow: ids stay below ~1e10, the product
#: below ~2.7e19/2⁶³... bounded by 1e10·2654435761 ≈ 2.7e19 — that
#: DOES overflow int64, so the multiplier is reduced mod the prime
#: first in the expression: (id % P) · (c % P) ≤ (1e6)² ≈ 1e12.
_TAIL_LAT_US = 3_800_000_000
_TAIL_PROB_MULT = 2_654_435_761
_TAIL_PROB_PRIME = 1_000_003
_TAIL_PROB_MOD = 100
_TAIL_PROB_KEEP = 10

#: The probabilistic-residue expression, shared verbatim by the batch
#: query, its SQL oracle, and the streaming face (one string so the
#: three cannot drift).
_TAIL_PROB_SQL = (
    f"((trace_id % {_TAIL_PROB_PRIME})"
    f" * ({_TAIL_PROB_MULT} % {_TAIL_PROB_PRIME}))"
    f" % {_TAIL_PROB_PRIME} % {_TAIL_PROB_MOD} < {_TAIL_PROB_KEEP}"
)


def tail_keep_condition():
    """The tailsampling keep/drop predicate over per-trace totals
    (n_errors, total_us, trace_id) — THE policy, used by both the
    batch query and the streaming face so the two cannot diverge."""
    return (
        (F.col("n_errors") > 0)
        | (F.col("total_us") > _TAIL_LAT_US)
        | F.expr(_TAIL_PROB_SQL)
    )


def tail_policy_column():
    """Policy attribution with the processor's precedence
    (error ≻ latency ≻ probabilistic) — shared like
    :func:`tail_keep_condition`."""
    return (
        F.when(F.col("n_errors") > 0, "error")
        .when(F.col("total_us") > _TAIL_LAT_US, "latency")
        .otherwise("probabilistic")
    )


def _span_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat (un-treed) span stream: service, span name, duration,
    error flag — the Spark twin of ``_SPANS_FLAT_CTE``."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        F.col("event_type").alias("span_name"),
        F.concat(
            F.lit("svc-"), (F.col("event_id") % 5).cast("string")
        ).alias("service"),
        (
            F.abs(F.expr("cast(round(value * 1000) as bigint)")) * 1000
        ).alias("dur_us"),
        F.when(
            (F.col("event_type") == "error") & (F.col("value") > 300), 1
        )
        .otherwise(0)
        .alias("is_error"),
    )


@query(
    "spans_red_metrics",
    oracle=f"""
    WITH {_SPANS_FLAT_CTE}
    SELECT service,
           span_name,
           cast(count(*) AS BIGINT)        AS n_calls,
           cast(sum(is_error) AS BIGINT)   AS n_errors,
           cast(sum(is_error) * 1000000 // count(*) AS BIGINT) AS err_ppm,
           cast(sum(dur_us) AS BIGINT)     AS total_dur_us,
           {', '.join(
               f'''cast(sum(CASE WHEN dur_us <= {b} THEN 1 ELSE 0 END)
                AS BIGINT) AS le_{b // 1_000_000}s'''
               for b in _RED_BOUNDS_US
           )}
    FROM spans GROUP BY service, span_name
    """,
)
def spans_red_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RED metrics per (service, span name) — the OTel collector's
    spanmetrics connector, the component a reference-shaped ingestor
    deployment turns on next (spans flow to ClickHouse; the metrics
    dashboards want Rate/Errors/Duration per operation without a
    second instrumentation pass): call count, error count, exact
    integer error-ppm, total duration, and a CUMULATIVE
    explicit-bounds duration histogram (le_30s ⊆ le_60s ⊆ …, the OTel
    histogram wire shape — the +inf bucket equals n_calls and is
    elided).  Every output is a sum/count, i.e. the mergeable-counts
    contract the windowed streaming faces re-aggregate
    (``apdex_windowed`` discipline), which is exactly why the real
    connector emits cumulative buckets: merging windows is addition.
    Plan: ONE map-side-combined pass over the span scan into the
    ≤|services|×|span names| grid (25 rows) — no join, no window, no
    shuffle wider than the grid; the same plan at 100 TB, where the
    scan is the floor."""
    s = _span_flat(spark, sf_dir)
    buckets = [
        F.sum(F.when(F.col("dur_us") <= b, 1).otherwise(0))
        .cast("long")
        .alias(f"le_{b // 1_000_000}s")
        for b in _RED_BOUNDS_US
    ]
    return s.groupBy("service", "span_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.sum("is_error").cast("long").alias("n_errors"),
        F.expr("sum(is_error) * 1000000 div count(*)")
        .cast("long")
        .alias("err_ppm"),
        F.sum("dur_us").cast("long").alias("total_dur_us"),
        *buckets,
    )


@query(
    "spans_tail_sampling",
    oracle=f"""
    WITH {_SPANS_FLAT_CTE},
    per_trace AS (
      SELECT user_id AS trace_id,
             cast(count(*) AS BIGINT)      AS n_spans,
             cast(sum(dur_us) AS BIGINT)   AS total_us,
             cast(sum(is_error) AS BIGINT) AS n_errors
      FROM spans GROUP BY user_id
    )
    SELECT trace_id, n_spans, total_us, n_errors,
           CASE WHEN n_errors > 0 THEN 'error'
                WHEN total_us > {_TAIL_LAT_US} THEN 'latency'
                ELSE 'probabilistic' END AS policy
    FROM per_trace
    WHERE n_errors > 0
       OR total_us > {_TAIL_LAT_US}
       OR {_TAIL_PROB_SQL}
    """,
)
def spans_tail_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-based sampling — the OTel collector's tailsampling
    processor, the decision layer between an ingestor like the
    reference and the span store (keep the interesting 10–20%, drop
    the rest AFTER seeing the whole trace — head sampling can't know a
    trace will error at span 40): a trace is kept if ANY span errored
    (error policy), OR its total duration crosses the latency
    threshold, OR it wins the probabilistic residue (a deterministic
    multiplicative hash of the trace id into a prime modulus — the
    real processor hashes the trace id for the same reason: the
    decision must be reproducible across collector replicas without
    coordination; the prime reduction keeps structured id spaces from
    aliasing the keep threshold).  Policy attribution uses
    the processor's precedence (error ≻ latency ≻ probabilistic).
    Plan: one trace-keyed partial agg (counts/sums only — mergeable,
    so at 100 TB this runs as the streaming trace-assembly face's
    downstream), one residual filter; output is the kept-trace set.
    No window, no join; the scan and one grid-bounded-per-trace
    shuffle are the whole cost."""
    s = _span_flat(spark, sf_dir)
    per_trace = s.groupBy(F.col("user_id").alias("trace_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("dur_us").cast("long").alias("total_us"),
        F.sum("is_error").cast("long").alias("n_errors"),
    )
    kept = per_trace.filter(tail_keep_condition())
    return kept.select(
        "trace_id",
        "n_spans",
        "total_us",
        "n_errors",
        tail_policy_column().alias("policy"),
    )
