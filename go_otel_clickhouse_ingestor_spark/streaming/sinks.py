"""Sinks — the reference's ClickHouse HTTP JSONEachRow sink (A11/A12)
as micro-batched JDBC, plus a parquet sink for tests.

Reference behavior being replaced: one synchronous HTTP POST *per
row*, new http.Client per call, non-200 -> error, basic auth only when
both user and pass are set (``internal/ingestion/clickhouse.go:19-132``).
The Spark sink batches thousands of rows per JDBC round trip and
retries failed micro-batches from the checkpoint — strictly stronger
delivery than the reference's log-and-drop (``cdc.go:76-80``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JdbcSinkConfig:
    """Connection config mirroring the reference's flag/env table
    (``internal/ingestion/config.go:14-25``, ``cmd/root.go:62-78``)."""

    url: str  # e.g. jdbc:clickhouse://host:8123/events_db
    table: str  # e.g. events  /  app.users_cur (clickhouse.go:100-110)
    user: str | None = None
    password: str | None = None
    batchsize: int = 10_000
    database: str = "appdb"  # default db, cmd/root.go:75
    options: dict[str, str] = field(default_factory=dict)

    def qualified_table(self) -> str:
        """A12 table routing: an unqualified table name gets the
        configured database prefix, a qualified one is used verbatim —
        mirroring ``InsertCDCUser``'s db/table defaulting
        (``clickhouse.go:100-110``, defaults ``cmd/root.go:75-76``)."""
        return self.table if "." in self.table else f"{self.database}.{self.table}"

    def properties(self) -> dict[str, str]:
        props = {"batchsize": str(self.batchsize), **self.options}
        # clickhouse.go:48-50: auth header only when BOTH are set
        if self.user and self.password:
            props["user"] = self.user
            props["password"] = self.password
        return props


def clickhouse_shape(df: DataFrame) -> DataFrame:
    """Format timestamp columns the way the reference serializes them:
    UTC ``"yyyy-MM-dd HH:mm:ss"``, second precision (A10,
    ``clickhouse.go:77,84,112``).  Applied at the sink edge only —
    native TimestampType everywhere else."""
    out = df
    for f_ in df.schema.fields:
        if f_.dataType.typeName().startswith("timestamp"):
            out = out.withColumn(
                f_.name, F.date_format(f_.name, "yyyy-MM-dd HH:mm:ss")
            )
    return out


def jdbc_foreach_batch(cfg: JdbcSinkConfig, tracer=None):
    """foreachBatch writer: micro-batch append via JDBC.  A failed
    batch raises -> Structured Streaming retries from the checkpoint
    (at-least-once; the target table's ReplacingMergeTree contract
    dedups, README.md:121).  With a ``tracer``, each write is wrapped
    in a ``clickhouse.post`` span (A15, ``clickhouse.go:28``)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        def write():
            clickhouse_shape(batch_df).write.mode("append").jdbc(
                cfg.url, cfg.qualified_table(), properties=cfg.properties()
            )

        _traced_write(tracer, write, batch_df, batch_id, cfg.qualified_table())

    return apply


def parquet_foreach_batch(path: str, tracer=None):
    """Test/demo sink: append micro-batches to a parquet directory
    (stands in for the JDBC sink where no database exists)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        def write():
            clickhouse_shape(batch_df).write.mode("append").parquet(path)

        _traced_write(tracer, write, batch_df, batch_id, path)

    return apply


def _traced_write(tracer, write, batch_df: DataFrame, batch_id: int, target: str) -> None:
    if tracer is None:
        write()
        return
    from .tracing import SPAN_CLICKHOUSE_POST

    with tracer.span(SPAN_CLICKHOUSE_POST, batch_id=batch_id, table=target):
        write()
