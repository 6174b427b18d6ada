"""A11 second-dialect matrix: the production ``jdbc_foreach_batch``
path against a SECOND embedded JDBC engine (DuckDB) with different
type binding than Derby — exercising URL dispatch, driver loading,
table routing, and the A10 second-precision timestamp wire contract
across dialects (reference: ``internal/ingestion/clickhouse.go:19-132``;
ClickHouse's own wire remains environmental, SURVEY §7).

Derby ships inside Spark's own jars, so its live test runs in the
shared session (``test_streaming.py``).  A DuckDB JDBC driver cannot
be injected into an already-running JVM's driver classloader, so this
test launches a fresh single-use SparkSession in a subprocess with the
jar on ``spark.driver.extraClassPath``/``spark.jars``.  The jar is
discovered from local artifact caches by public Maven coordinates
(``org/duckdb/duckdb_jdbc``) — if none is present the test skips with
the environmental-ceiling note, exactly like the Kafka broker leg.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JAR_GLOBS = [
    "~/.cache/coursier/**/duckdb_jdbc-*.jar",
    "~/.m2/repository/**/duckdb_jdbc-*.jar",
    "~/.ivy2/cache/**/duckdb_jdbc-*.jar",
]


def _find_duckdb_jar() -> str | None:
    for pat in _JAR_GLOBS:
        hits = sorted(glob.glob(os.path.expanduser(pat), recursive=True))
        if hits:
            return hits[-1]
    return None


_SUBPROCESS_SCRIPT = r"""
import sys

repo, jar, workdir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

# Dialect note (the real finding this test exists to record): Spark
# 4.1's JdbcUtils.tableExists only treats the probe-query failure as
# "table missing" when the dialect classifies the SQLException by
# SQLState (isObjectNotFoundException); duckdb_jdbc 1.0 raises
# SQLState-less exceptions, so Spark's append-mode auto-CREATE cannot
# engage and the probe error propagates.  The target table must
# pre-exist — which also mirrors the reference deployment, where the
# ClickHouse tables are created by DDL ahead of the ingestor
# (clickhouse.go inserts into existing tables).
import duckdb

_DUCK_TYPES = {"long": "BIGINT", "string": "VARCHAR", "integer": "INTEGER",
               "double": "DOUBLE", "boolean": "BOOLEAN"}

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("jdbc-dialect-duckdb")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.jars", jar)
    .config("spark.driver.extraClassPath", jar)
    .config("spark.executor.extraClassPath", jar)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import json

from go_otel_clickhouse_ingestor_spark.operators.cdc import (
    parse_envelope,
    translate_envelope,
)
from go_otel_clickhouse_ingestor_spark.sources.fixtures import (
    CDC_MESSAGES,
    cdc_messages_df,
)
from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import translate_stream
from go_otel_clickhouse_ingestor_spark.streaming.sinks import (
    JdbcSinkConfig,
    clickhouse_shape,
    jdbc_foreach_batch,
)

cfg = JdbcSinkConfig(
    url=f"jdbc:duckdb:{workdir}/dialect.duckdb",
    table="users_cur",
    database="main",  # DuckDB's default schema; A12 routing -> main.users_cur
    batchsize=100,
    # single writer partition: an embedded file DB serializes writers
    options={"driver": "org.duckdb.DuckDBDriver", "numPartitions": "1"},
)
assert cfg.qualified_table() == "main.users_cur"

# Pre-create the target with the sink-edge schema (see dialect note).
_probe = clickhouse_shape(translate_envelope(parse_envelope(cdc_messages_df(spark))))
cols_ddl = ", ".join(
    f'"{f.name}" {_DUCK_TYPES[f.dataType.typeName()]}' for f in _probe.schema.fields
)
con = duckdb.connect(f"{workdir}/dialect.duckdb")
con.execute(f"CREATE TABLE main.users_cur ({cols_ddl})")
con.close()

rows = [
    {"msg_id": m, "key": k, "value": v} for m, k, v in CDC_MESSAGES
]
src = f"{workdir}/msgs"
import pathlib

pathlib.Path(src).mkdir()
pathlib.Path(src, "a.jsonl").write_text(
    "\n".join(json.dumps(r) for r in rows)
)
stream = (
    spark.readStream.schema("msg_id long, key string, value string").json(src)
)
q = (
    translate_stream(stream)
    .writeStream.foreachBatch(jdbc_foreach_batch(cfg))
    .option("checkpointLocation", f"{workdir}/ckpt")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(120)

back = spark.read.jdbc(cfg.url, cfg.qualified_table(), properties=cfg.properties())
want_df = _probe
assert sorted(back.columns) == sorted(want_df.columns), (
    back.columns, want_df.columns)
cols = sorted(back.columns)
# duckdb_jdbc 1.0 reports BIGINT columns with isSigned=false, so Spark
# reads them back as decimal(20,0) — the Long edge ClickHouse's UInt64
# has too.  Compare values numerically (Python Decimal == int) after
# casting nothing: tuple equality handles Decimal vs int per element.
got = sorted(tuple(r) for r in back.select(*cols).collect())
want = sorted(tuple(r) for r in want_df.select(*cols).collect())
assert len(got) == len(want) > 0, (len(got), len(want))
for g, w in zip(got, want):
    assert g == w, (g, w)

# A10 on the wire, DuckDB dialect: second-precision string timestamps
ts = [r._ts for r in back.select("_ts").collect() if r._ts is not None]
assert ts and all(len(t) == 19 and t[4] == "-" for t in ts), ts[:3]

# dialect type binding: id is a 64-bit integer on the DuckDB side;
# Spark surfaces it as long OR decimal(20,0) (unsigned metadata edge)
id_field = [f for f in back.schema.fields if f.name == "id"][0]
assert id_field.dataType.typeName() in ("long", "bigint", "decimal"), id_field
con = duckdb.connect(f"{workdir}/dialect.duckdb", read_only=True)
duck_type = dict(
    (r[0], r[1])
    for r in con.execute(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = 'users_cur'"
    ).fetchall()
)
con.close()
assert duck_type["id"] == "BIGINT" and duck_type["_ts"] == "VARCHAR", duck_type

print("DIALECT_OK", len(got))
spark.stop()
"""


@pytest.mark.slow  # live-JDBC e2e (~15 s): full tier; PR tier keeps the contract-level sink tests
def test_jdbc_sink_live_roundtrip_duckdb_dialect(tmp_path):
    jar = _find_duckdb_jar()
    if jar is None:
        pytest.skip(
            "no duckdb_jdbc jar in local artifact caches — second-dialect "
            "leg is environmental (same ceiling class as the Kafka broker)"
        )
    r = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_SCRIPT, REPO, jar, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=280,
        cwd=REPO,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout[-3000:]}\nstderr:\n{r.stderr[-3000:]}"
    assert "DIALECT_OK" in r.stdout
