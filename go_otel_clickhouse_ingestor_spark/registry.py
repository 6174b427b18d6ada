"""Query registry: the single source of truth behind ``__spark_entry__``.

Each operator module registers its queries at import time via the
:func:`query` decorator.  A registered query is a callable
``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
SQL-expressible, a DuckDB oracle SQL string the driver runs
side-by-side (row-count + schema + order-insensitive value-hash).

Conventions that keep the differential check meaningful:

- every computed column is aliased identically in Spark and SQL;
- float aggregates are rounded (``round(x, N)``) on BOTH sides so
  summation-order ULP differences between engines can't flip the hash;
- ordered results (sorts, top-k) materialize their position into a
  ``rn`` column, because the driver's hash is order-insensitive.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering ``fn`` under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    # Imports are side-effecting by design: each module registers its
    # queries at import time.
    from .operators import (  # noqa: F401
        bucketed,
        cdc,
        dedup,
        formats,
        multimodal,
        pipeline,
        relational,
        scalar_fns,
        similarity,
        skew,
        text,
        tpch,
        udfs,
        windows,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
