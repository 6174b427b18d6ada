"""Physical-plan audits: programmatic access to the plan properties
this engine treats as correctness-of-scale — pushdown reaching the
scan, small sides broadcast, Python kept off hot paths, codegen spans.

The reference has no planner (straight-line Go, SURVEY §4); here the
planner IS the performance story, so the audit is a first-class API:
``tests/test_plans.py`` asserts these properties per query, and a user
can call :func:`audit` on any DataFrame to see whether their plan
would survive a 100× scale-up (a scan reading every column for a
2-column projection, a missing broadcast, or a BatchEvalPython node in
a hot path all show up here).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output as a string.  NOTE: with AQE on,
    un-executed plans print ``AdaptiveSparkPlan isFinalPlan=false`` and
    hide codegen stages — use :func:`executed_plan` for those."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """Materialize the DataFrame and return its FINAL physical plan
    (AQE re-planning applied).  Runs the query — use on test-scale
    inputs."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (empty list = nothing
    pushed — for a filtering query that usually means a bug)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning check: a scan
    listing columns the query never touches reads wasted bytes."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def _walk_physical(node):
    """Depth-first traversal of a physical plan via py4j, NOT
    descending into cached subtrees: an ``InMemoryTableScan``'s cached
    plan is served from the cache, not re-executed, so counting its
    operators misrepresents what actually runs — an iterative query
    that persists each round (HITS, k-means, label propagation) nests
    every prior round's plan textually and a string count explodes
    exponentially with iterations (the round-11 HITS row printed 721
    phantom broadcasts).  AQE wrappers are transparent: descend into
    ``initialPlan``."""
    name = node.getClass().getSimpleName()
    yield node
    if name.startswith("InMemoryTableScan"):
        return
    if name.startswith("AdaptiveSparkPlan"):
        yield from _walk_physical(node.initialPlan())
        return
    children = node.children()
    for i in range(children.size()):
        yield from _walk_physical(children.apply(i))


def audit(df: DataFrame) -> dict:
    """One-call plan summary with the scale-relevant facts.  Operator
    counts traverse the physical plan itself (see
    :func:`_walk_physical` for the cached-subtree rule); the
    text-based fallback covers plans the JVM walk cannot reach."""
    plan = formatted_plan(df)
    out = {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "adaptive": "AdaptiveSparkPlan" in plan,
    }
    try:
        # executedPlan = prepared plan (EnsureRequirements applied, so
        # Exchange nodes exist); preparing does NOT run the query — AQE
        # wraps it un-finalized and _walk_physical descends initialPlan
        names = [
            n.getClass().getSimpleName()
            for n in _walk_physical(df._jdf.queryExecution().executedPlan())
        ]
        out.update(
            broadcast_joins=sum(
                n.startswith(("BroadcastHashJoin", "BroadcastNestedLoopJoin"))
                for n in names
            ),
            shuffle_exchanges=sum(
                n.startswith("ShuffleExchange") for n in names
            ),
            sort_merge_joins=sum(n.startswith("SortMergeJoin") for n in names),
            python_row_at_a_time=sum(
                n.startswith("BatchEvalPython") for n in names
            ),
            python_arrow=sum(
                n.startswith(
                    (
                        "ArrowEvalPython",
                        "FlatMapGroupsInPandas",
                        "ArrowAggregatePython",
                        "MapInPandas",
                        "PythonMapInArrow",
                        "MapInArrow",
                    )
                )
                for n in names
            ),
            take_ordered=out["take_ordered"]
            or any(n.startswith("TakeOrderedAndProject") for n in names),
        )
    except Exception:  # pragma: no cover - defensive py4j fallback
        out.update(
            broadcast_joins=plan.count("BroadcastHashJoin")
            + plan.count("BroadcastNestedLoopJoin"),
            shuffle_exchanges=len(re.findall(r"\(\d+\) Exchange\b", plan)),
            sort_merge_joins=plan.count("SortMergeJoin"),
            python_row_at_a_time=plan.count("BatchEvalPython"),
            python_arrow=plan.count("ArrowEvalPython")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("ArrowAggregatePython")
            + plan.count("MapInPandas"),
        )
    return out


def _walk_logical(node):
    """Depth-first traversal of a Catalyst logical plan via py4j."""
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_logical(children.apply(i))


def global_windows(df: DataFrame) -> int:
    """Count partition-less (global) Window operators — the
    single-partition funnel WindowExec warns about at runtime, surfaced
    statically.  Traverses the optimized logical plan through the JVM
    and checks each Window node's ``partitionSpec().isEmpty()`` — the
    plan's own structure, not its printed form, so plan-format changes
    or window expressions that happen to embed ``' ASC'`` in nested
    brackets can't silently turn this guard into a no-op (the failure
    mode of the earlier toString-regex version)."""
    opt = df._jdf.queryExecution().optimizedPlan()
    return sum(
        1
        for node in _walk_logical(opt)
        if node.getClass().getSimpleName() == "Window"
        and node.partitionSpec().isEmpty()
    )
