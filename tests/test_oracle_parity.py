"""Oracle-differential parity: every registered query with a DuckDB
oracle must hash-match it (the local mirror of the driver's t2 gate,
SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from go_otel_clickhouse_ingestor_spark.registry import load_all

from conftest import SF_DIR

#: Full-registry sweep (~385 queries x Spark+DuckDB) -- the exhaustive
#: tier; the PR tier relies on tools/check_oracle.py spot checks plus
#: the driver differential.
pytestmark = pytest.mark.slow

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from check_oracle import compare

    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        # rows-only contract: must at least run and return a stable schema
        assert spark_pdf is not None
        assert len(spark_pdf.columns) > 0
        return
    duck_pdf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name} vs oracle at {SF_DIR}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_doc():
    for name, q in REGISTRY.items():
        assert q.doc.strip(), f"{name} has no docstring"


@pytest.mark.slow
def test_pagerank_parity_at_sf01(spark):
    """r15 ADVICE: pagerank's long re-keying relies on the designed
    per-iteration round(12) absorbing partial-sum order — probabilistic,
    not guaranteed — so pin a LARGER-sf parity case (sf0.1: 16k nodes,
    1.2M edges) in the slow tier to catch a future boundary-straddling
    sum that sf0.001's 500 nodes would miss."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from check_oracle import compare, duck_connection

    sf = "/root/testdata/sf0.1"
    q = REGISTRY["graph_pagerank"]
    spark_pdf = q.fn(spark, sf).toPandas()
    duck_pdf = duck_connection(sf).execute(q.oracle).fetchdf()
    assert not compare("graph_pagerank", spark_pdf, duck_pdf)
