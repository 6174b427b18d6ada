"""Streaming drift monitoring: the windowed faces of ``dq_drift_ks``
and ``dq_drift_psi``.

Drift detection is DEPLOYED as a monitor, not a batch audit: the gate
fires when the live distribution walks away from a pinned reference
window, per trigger, not at end of day.  The design splits the
operator the way every production monitor does:

- the 24/7 STATEFUL half (:func:`drift_bins_windowed`) reduces the
  raw stream to per-(window, bin) counts on the SAME fixed
  centi-unit grid as the batch twins
  (``operators/dataquality.py::_KS_BIN_C``).  Mergeability is the
  contract (the ``apdex_windowed`` / exp-histogram discipline): bin
  COUNTS are partial-aggregable, so re-aggregating window grids by
  addition and re-deriving the statistic reproduces the batch answer
  exactly — ``tests/test_streaming_drift.py`` pins bit-equality
  against both batch queries through a real two-trigger feed.  State
  is one counter per (window, bin): the grid is value-range-bounded
  (fixed-width cells over the value domain), NOT data-growing, and
  the watermark bounds the window count.

- the STATELESS scoring half (:func:`ks_vs_reference`,
  :func:`psi_vs_reference`) joins each closed window's grid against a
  fixed reference distribution (:func:`reference_bins` over the
  pinned reference corpus — a bounded static frame, broadcast) and
  evaluates the IDENTICAL expressions as the batch twins: KS as exact
  integer ppm with the cross-multiplied CDF gap, PSI as the add-1
  smoothed per-bin contribution grid rounded at 1e-6.  Run it inside
  ``foreachBatch`` over the assembled window table, or on the lake
  table the windowed stream sinks to — either way it touches only
  bounded grids (|bins| × |open windows| rows), never the raw stream.

The reference (Go OTel ingestor) has no drift surface — this face
exists because the SURVEY's derived query family treats monitoring
gates as first-class streaming citizens (reference: clickhouse.go:74
feeds the events table these gates watch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dataquality import _KS_BIN_C

#: The binning expression — ONE formula shared with the batch twins so
#: streaming grids merge into the batch grid exactly.
_BIN_EXPR = f"cast(round(value * 100) as bigint) div {_KS_BIN_C}"


def drift_bins_windowed(
    events: DataFrame, width: str = "1 day", delay: str = "10 minutes"
) -> DataFrame:
    """Per-(window, bin) event counts on the fixed centi-unit grid —
    the stateful streaming half of the drift gates.  Emits
    ``(win_start, win_end, bin, n)``; counts merge by addition."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(
            F.window("ts", width).alias("win"),
            F.expr(_BIN_EXPR).alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "bin",
            "n",
        )
    )


def reference_bins(reference_events: DataFrame) -> DataFrame:
    """The pinned reference distribution: bin counts of the reference
    corpus on the same grid.  Bounded (|bins| rows) and static — the
    scoring joins broadcast it."""
    return (
        reference_events.select(F.expr(_BIN_EXPR).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    )


def _window_grid(cur_bins: DataFrame, ref: DataFrame) -> DataFrame:
    """Union bin grid per window: every bin present in the reference
    OR in the window's observed counts, zero-filled on the absent
    side — the same grid the batch twins group into (bins carrying
    mass on either side).  Shaped as a union + one merge groupBy
    rather than a full-outer join: cheaper (no outer shuffle join —
    the merge is map-side combined over bounded grids) and immune to
    the self-join reference conflict of re-joining a frame against
    its own distinct projection."""
    wins = cur_bins.select("win_start", "win_end").distinct()
    ref_rows = wins.crossJoin(F.broadcast(ref)).select(
        "win_start",
        "win_end",
        "bin",
        F.col("n_ref"),
        F.lit(0).cast("long").alias("n_cur"),
    )
    cur_rows = cur_bins.select(
        "win_start",
        "win_end",
        "bin",
        F.lit(0).cast("long").alias("n_ref"),
        F.col("n").cast("long").alias("n_cur"),
    )
    return (
        ref_rows.unionByName(cur_rows)
        .groupBy("win_start", "win_end", "bin")
        .agg(
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
        )
    )


def ks_vs_reference(cur_bins: DataFrame, ref: DataFrame) -> DataFrame:
    """Per-window two-sample KS against the fixed reference — the
    streaming face of ``dq_drift_ks`` (reference plays the first
    half, each window plays the second).  Exact integer ppm via the
    identical cross-multiplied expression; emits one row per window:
    ``(win_start, win_end, ks_ppm, n_bins, n_first, n_second)``
    matching the batch column names so dashboards swap freely."""
    from pyspark.sql.window import Window

    g = _window_grid(cur_bins, ref)
    # bounded: both windows sweep the fixed centi-unit bin grid per
    # drift window, never raw events.  Totals ride the same window
    # pass as the CDF (full-frame spec) instead of a groupBy+re-join —
    # one shuffle, and no self-join of g against its own aggregate
    # (which trips Spark's conflicting-reference check on streaming
    # memory-table lineage).
    wc = (
        Window.partitionBy("win_start", "win_end")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("win_start", "win_end").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = g.select(
        "win_start",
        "win_end",
        "bin",
        F.sum("n_ref").over(wc).alias("c1"),
        F.sum("n_cur").over(wc).alias("c2"),
        F.sum("n_ref").over(wt).alias("t1"),
        F.sum("n_cur").over(wt).alias("t2"),
    )
    return cdf.groupBy("win_start", "win_end").agg(
        F.expr(
            "cast(max(abs(c1 * t2 - c2 * t1)"
            " div greatest((t1 * t2) div 1000000, 1)) as bigint)"
        ).alias("ks_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.max("t1").cast("long").alias("n_first"),
        F.max("t2").cast("long").alias("n_second"),
    )


def psi_vs_reference(cur_bins: DataFrame, ref: DataFrame) -> DataFrame:
    """Per-window PSI contribution grid against the fixed reference —
    the streaming face of ``dq_drift_psi``.  Identical add-1 smoothed
    float expression rounded at 1e-6; emits
    ``(win_start, win_end, bin, n1, n2, psi_contrib)`` per union-grid
    bin (n1 = reference, n2 = window), so summing ``psi_contrib`` per
    window gives the fleet PSI and the per-bin rows show WHERE the
    mass moved."""
    from pyspark.sql.window import Window

    g = _window_grid(cur_bins, ref)
    # bounded: full-frame window over the fixed bin grid per drift
    # window (same no-self-join rationale as ks_vs_reference)
    wt = Window.partitionBy("win_start", "win_end").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = g.select(
        "win_start",
        "win_end",
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wt).alias("t1"),
        F.sum("n_cur").over(wt).alias("t2"),
        F.count(F.lit(1)).over(wt).alias("b"),
    )
    return g.select(
        "win_start",
        "win_end",
        "bin",
        F.col("n_ref").alias("n1"),
        F.col("n_cur").alias("n2"),
        F.round(
            (
                (F.col("n_ref") + 1) / (F.col("t1") + F.col("b")).cast("double")
                - (F.col("n_cur") + 1) / (F.col("t2") + F.col("b")).cast("double")
            )
            * F.log(
                ((F.col("n_ref") + 1) * (F.col("t2") + F.col("b")))
                / ((F.col("n_cur") + 1) * (F.col("t1") + F.col("b"))).cast(
                    "double"
                )
            ),
            6,
        ).alias("psi_contrib"),
    )
