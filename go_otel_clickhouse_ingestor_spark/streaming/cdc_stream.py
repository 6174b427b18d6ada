"""Streaming CDC pipeline — the reference's second mode (A3-A13).

Reference: a Kafka consumer-group loop reads Debezium envelopes one
message at a time (``internal/ingestion/cdc.go:25-85``), translates,
and POSTs row-by-row to ClickHouse; a failed insert is *lost* (offset
already committed).

Spark translation: ``readStream.format("kafka")`` → the exact same
column-expression translation the batch path uses
(``operators/cdc.py`` — one codebase, two execution modes) →
``foreachBatch`` sink with checkpointing.  Delivery is therefore
at-least-once with batch retry — strictly stronger than the
reference's drop-on-error.

The Kafka source itself needs brokers, so tests exercise the pipeline
through a file/memory source with the same (key, value) schema; the
``kafka_cdc_stream`` wiring is the production entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import parse_envelope, translate_envelope


def translate_stream(kafka_shaped: DataFrame) -> DataFrame:
    """(msg_id, key string, value string) stream -> users_cur rows.
    Pure column expressions — runs identically in batch and streaming
    (same whole-stage-codegen plan, no state)."""
    return translate_envelope(parse_envelope(kafka_shaped))


def kafka_cdc_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Production wiring: Kafka source -> users_cur stream.

    Spark's Kafka source replaces the reference's consumer group
    (``cdc.go:36-43``): offsets live in the checkpoint (not Kafka),
    partitions fan out across executors, and maxOffsetsPerTrigger is
    the backpressure knob the Go loop lacked."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    shaped = raw.select(
        F.col("offset").alias("msg_id"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    return translate_stream(shaped)


def upsert_foreach_batch(state_dir: str):
    """A16 online: a foreachBatch MERGE that maintains the current-state
    table (latest ``_lsn`` per id, soft deletes retained as versions).

    Demo implementation over plain parquet: read-modify-write of the
    state directory per micro-batch.  On a real deployment this is a
    Delta/Iceberg ``MERGE INTO`` (transactional, partition-pruned);
    plain parquet is used here because the container has no lake-format
    jars — the batch logic (union + latest-wins recompute) is identical.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from ..operators.cdc import current_state

        try:
            existing = spark.read.parquet(state_dir + "/versions")
        except Exception:  # first batch: no state yet
            existing = None
        versions = (
            existing.unionByName(batch_df) if existing is not None else batch_df
        )
        # two-step write: stage then swap would be atomic on a real lake
        # format; parquet overwrite is fine for the demo sink.
        versions.cache()
        versions.count()
        versions.write.mode("overwrite").parquet(state_dir + "/versions_next")
        spark.read.parquet(state_dir + "/versions_next").write.mode("overwrite").parquet(
            state_dir + "/versions"
        )
        current_state(spark.read.parquet(state_dir + "/versions")).write.mode(
            "overwrite"
        ).parquet(state_dir + "/current")
        versions.unpersist()

    return apply
