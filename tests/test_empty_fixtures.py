"""Degenerate-input sweep for the round-9 queries: every one must
BUILD and EXECUTE against empty fixture tables (the r8-advice failure
class — eager plan-build aggregates reading None, pd.concat on an
empty iterator, division by an absent total).  Correctness on real
data is the oracle differential's job; this pins the empty corner it
cannot reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_otel_clickhouse_ingestor_spark.registry import load_all
from go_otel_clickhouse_ingestor_spark.tables import table

#: Wide parametrized sweep over degenerate inputs -- full tier only.
pytestmark = pytest.mark.slow

#: The round-9 additions (oracle-backed + their streaming-adjacent
#: batch faces); all read events/documents/embeddings/customer.
ROUND9 = [
    "events_sequence_regex_match",
    "events_exp_histogram",
    "events_log_templates",
    "source_otlp_spans_parse",
    "agg_count_min_estimate",
    "events_token_bucket_admission",
    "graph_tree_depth_pointer_doubling",
    "agg_hll_portable",
    "dq_k_anonymity",
    "events_label_cardinality_audit",
    "text_keyword_rake",
    "emb_mutual_knn_graph",
    "events_p99_of_user_p95",
    "text_bpe_train",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """A fixture dir whose tables have the right schemas and ZERO rows."""
    root = tmp_path_factory.mktemp("empty_sf")
    schemas = {
        "events": (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ),
        "documents": (
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ),
        "embeddings": "vec_id long, embedding array<float>, label int",
        "customer": (
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string"
        ),
        "orders": (
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string"
        ),
        "lineitem": (
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp"
        ),
        "part": (
            "p_partkey long, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double"
        ),
        "supplier": "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        "nation": "n_nationkey int, n_name string, n_regionkey int",
        "region": "r_regionkey int, r_name string",
    }
    for name, schema in schemas.items():
        spark.createDataFrame([], schema).write.parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", ROUND9)
def test_round9_query_survives_empty_tables(name, spark, empty_sf):
    reg = load_all()
    df = reg[name].fn(spark, empty_sf)
    assert df.count() == 0


def test_every_registered_query_survives_empty_tables(spark, empty_sf):
    """Full-registry smoke: all queries execute on zero-row tables.
    One test (not parametrized) so the sweep shares a single fixture
    write and adds minutes, not tens of minutes, to the suite."""
    reg = load_all()
    fails = []
    for name, q in sorted(reg.items()):
        try:
            q.fn(spark, empty_sf).count()
        except Exception as exc:  # noqa: BLE001 - collect, report once
            fails.append((name, str(exc).split("\n")[0][:100]))
    assert fails == []


@pytest.fixture(scope="module")
def nullish_sf(spark, sf_dir, tmp_path_factory):
    """The real fixture with ~10% NULLs injected into the nullable
    value columns (events.value/props, documents.text/lang) — keys and
    join columns stay intact.  Out-of-contract data for the oracle
    hashes, but no query may CRASH on it: a null document is skipped
    or nulled through, never a kernel error."""
    root = tmp_path_factory.mktemp("nullish_sf")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.when(F.col("event_id") % 10 == 3, None)
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("event_id") % 10 == 7, None)
        .otherwise(F.col("props"))
        .alias("props"),
    )
    ev.write.parquet(str(root / "events.parquet"))
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 3, None)
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(F.col("doc_id") % 10 == 7, None)
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
        "n_chars",
    )
    d.write.parquet(str(root / "documents.parquet"))
    import os
    import shutil

    for t in (
        "embeddings customer supplier part orders lineitem nation region"
    ).split():
        src, dst = f"{sf_dir}/{t}.parquet", str(root / f"{t}.parquet")
        # driver fixtures are single parquet FILES; lake layouts are dirs
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    return str(root)


def test_every_registered_query_survives_null_values(spark, nullish_sf):
    """Full-registry smoke on the null-bearing fixture: execution only
    (value agreement on out-of-contract data is not asserted)."""
    reg = load_all()
    fails = []
    for name, q in sorted(reg.items()):
        try:
            q.fn(spark, nullish_sf).count()
        except Exception as exc:  # noqa: BLE001 - collect, report once
            fails.append((name, str(exc).split("\n")[0][:100]))
    assert fails == []
