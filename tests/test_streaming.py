"""Streaming parity tests (SURVEY.md §5.4): file-source streams with
availableNow triggers, memory sinks, and batch equivalence checks.

These pin the semantics the driver can't oracle-check: the synthetic
generator (A1/A2), the streaming CDC translation (A3-A13), windowed
aggregation, watermark dedup, the foreachBatch upsert (A16 online),
and the metrics listener (A14).
"""

from __future__ import annotations

import json
import time
import uuid

import pytest
from pyspark.sql import functions as F


def _write_jsonl(spark, tmp_path, rows, name):
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


def _run_available_now(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _run_complete(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def events_stream(spark, sf_dir, tmp_path):
    """The events fixture replayed as a file-source stream (ts as
    timestamp via unix_micros round-trip)."""
    from go_otel_clickhouse_ingestor_spark.tables import table

    ev = table(spark, sf_dir, "events").limit(500)
    rows = [
        {
            "event_id": r.event_id,
            "ts_us": r.ts_us,
            "user_id": r.user_id,
            "event_type": r.event_type,
            "value": r.value,
        }
        for r in ev.select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type", "value"
        ).collect()
    ]
    path = _write_jsonl(spark, tmp_path, rows, "events_stream")
    schema = "event_id long, ts_us long, user_id long, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .json(path)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )


def test_synthetic_generator_batch_shape(spark):
    """A2: wire shape of the generated event (generator.go:10-23)."""
    from go_otel_clickhouse_ingestor_spark.streaming.synthetic import (
        ACTIONS,
        synthetic_events_batch,
    )

    rows = synthetic_events_batch(spark, 200).collect()
    assert len(rows) == 200
    assert all(r.user_id.startswith("user-") for r in rows)
    assert all(len(r.user_id) == len("user-") + 36 for r in rows)  # uuid4
    assert {r.action for r in rows} <= set(ACTIONS)
    assert {r.payload for r in rows} == {"example-payload"}


def test_synthetic_rate_stream_runs(spark):
    """A1: the rate source stands in for the ticker; one micro-batch
    must produce rows with the A2 schema."""
    from go_otel_clickhouse_ingestor_spark.streaming.synthetic import synthetic_events

    name = f"synth_{uuid.uuid4().hex[:8]}"
    q = (
        synthetic_events(spark, rate=50)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(f"SELECT * FROM {name}").count() > 0:
                break
            time.sleep(0.5)
        out = spark.sql(f"SELECT * FROM {name}")
        assert out.count() > 0
        assert set(out.columns) == {"timestamp", "user_id", "action", "payload"}
    finally:
        q.stop()


def test_cdc_stream_matches_batch(spark, tmp_path):
    """A3-A10 streaming == batch: the same translation expressions over
    a file-source stream produce exactly the batch rows."""
    from go_otel_clickhouse_ingestor_spark.operators.cdc import (
        parse_envelope,
        translate_envelope,
    )
    from go_otel_clickhouse_ingestor_spark.sources.fixtures import (
        CDC_MESSAGES,
        cdc_messages_df,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import translate_stream

    rows = [{"msg_id": m, "key": k, "value": v} for m, k, v in CDC_MESSAGES]
    path = _write_jsonl(spark, tmp_path, rows, "cdc_stream")
    stream = spark.readStream.schema("msg_id long, key string, value string").json(path)
    name = f"cdc_{uuid.uuid4().hex[:8]}"
    _run_available_now(translate_stream(stream), name)

    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {
        tuple(r)
        for r in translate_envelope(parse_envelope(cdc_messages_df(spark))).collect()
    }
    assert got == want and len(got) == 8


def test_tumbling_window_matches_batch(spark, events_stream, sf_dir):
    """Windowed streaming aggregation equals the batch groupBy(window)."""
    from go_otel_clickhouse_ingestor_spark.streaming.windows import tumbling_counts
    from go_otel_clickhouse_ingestor_spark.tables import table

    name = f"tumb_{uuid.uuid4().hex[:8]}"
    _run_complete(tumbling_counts(events_stream), name)
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}

    ev = table(spark, sf_dir, "events").limit(500)
    want = {tuple(r) for r in tumbling_counts(ev).collect()}
    assert got == want and len(got) > 0


def test_session_window_runs(spark, events_stream):
    from go_otel_clickhouse_ingestor_spark.streaming.windows import session_counts

    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_complete(session_counts(events_stream), name)
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() > 0
    assert out.filter(F.col("win_end") < F.col("win_start")).count() == 0


@pytest.mark.slow
def test_session_window_merges_across_triggers_out_of_order(spark, tmp_path):
    """Session semantics under real out-of-order multi-batch arrival:

    - trigger 1: user 1 at t=0 and t=8min — with a 5-min gap these open
      as TWO separate sessions in the state store;
    - trigger 2: user 1 at t=4min arrives LATE (but inside the 10-min
      watermark) and bridges them — the store must MERGE the two open
      sessions into one [0, 13min) session; plus user 2 at t=30min;
    - trigger 3: user 2 at t=60min pushes the watermark to 50min, which
      closes and emits the merged user-1 session and user-2's [30,35)
      session, while the t=60min session stays open (not emitted).

    Append mode: only watermark-closed sessions reach the sink, so the
    output proves merge + eviction, not just windowing."""
    import os as _os

    from go_otel_clickhouse_ingestor_spark.streaming.windows import session_counts

    t0 = 1_700_000_000_000_000  # µs
    mins = 60 * 1_000_000

    def ev(eid, t_min, uid):
        return {
            "event_id": eid,
            "ts_us": t0 + int(t_min * mins),
            "user_id": uid,
            "event_type": "click",
            "value": 1.0,
        }

    d = tmp_path / "sess_stream"
    d.mkdir()
    batches = [
        [ev(1, 0, 1), ev(2, 8, 1)],
        [ev(3, 4, 1), ev(4, 30, 2)],  # t=4 late: bridges 0 and 8
        [ev(5, 60, 2)],  # watermark -> 50min: evict closed sessions
    ]
    for i, rows in enumerate(batches):
        p = d / f"{chr(97 + i)}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        # file source orders by mtime; force the trigger order explicitly
        _os.utime(p, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )
    name = f"sessooo_{uuid.uuid4().hex[:8]}"
    q = (
        session_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 data triggers, saw {n_batches}"

    got = {
        (r.user_id, r.win_start.isoformat(), r.win_end.isoformat(), r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    from datetime import datetime, timezone

    def iso(t_min):
        return (
            datetime.fromtimestamp(
                (t0 + int(t_min * mins)) / 1e6, tz=timezone.utc
            )
            .replace(tzinfo=None)
            .isoformat()
        )

    want = {
        # merged: 0 + 4 + 8 within 5-min gaps -> one session [0, 13)
        (1, iso(0), iso(13), 3),
        # user 2's first session closed by the 50-min watermark
        (2, iso(30), iso(35), 1),
    }
    assert got == want, f"got {got}"


def test_streaming_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicated event_ids collapse."""
    from go_otel_clickhouse_ingestor_spark.streaming.windows import dedup_events

    base = [
        {"event_id": i % 10, "ts_us": 1_700_000_000_000_000 + i * 1_000_000, "user_id": 1,
         "event_type": "click", "value": 1.0}
        for i in range(30)
    ]
    path = _write_jsonl(spark, tmp_path, base, "dup_stream")
    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string, value double"
        )
        .json(path)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    _run_available_now(dedup_events(stream), name)
    out = spark.sql(f"SELECT event_id FROM {name}")
    assert out.count() == 10
    assert out.distinct().count() == 10


@pytest.mark.slow
def test_foreach_batch_upsert_matches_current_state(spark, tmp_path):
    """A16 online: the foreachBatch MERGE converges to the batch
    current_state view."""
    from go_otel_clickhouse_ingestor_spark.operators.cdc import (
        current_state,
        parse_envelope,
        translate_envelope,
    )
    from go_otel_clickhouse_ingestor_spark.sources.fixtures import (
        CDC_MESSAGES,
        cdc_messages_df,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        translate_stream,
        upsert_foreach_batch,
    )

    rows = [{"msg_id": m, "key": k, "value": v} for m, k, v in CDC_MESSAGES]
    path = _write_jsonl(spark, tmp_path, rows, "cdc_upsert")
    state_dir = str(tmp_path / "state")
    stream = spark.readStream.schema("msg_id long, key string, value string").json(path)
    q = (
        translate_stream(stream)
        .writeStream.foreachBatch(upsert_foreach_batch(state_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.read.parquet(state_dir + "/current")
        .select("id", "name", "email", "_op", "_lsn", "_ts")
        .collect()
    }
    want = {
        tuple(r)
        for r in current_state(
            translate_envelope(parse_envelope(cdc_messages_df(spark)))
        ).collect()
    }
    assert got == want and len(got) == 2  # ids 3 (Bo) and 9 (Di) survive


def test_upsert_incremental_rewrites_only_touched_buckets(spark, tmp_path):
    """The bucketed state MERGE must leave untouched buckets' files
    alone: batch 2 touches one id, so every versions partition outside
    that id's bucket keeps its exact file set and mtimes."""
    import glob
    import os

    from go_otel_clickhouse_ingestor_spark.operators.cdc import (
        current_state,
        parse_envelope,
        translate_envelope,
    )
    from go_otel_clickhouse_ingestor_spark.sources.fixtures import cdc_messages_df
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        N_STATE_BUCKETS,
        upsert_foreach_batch,
    )

    all_rows = translate_envelope(parse_envelope(cdc_messages_df(spark)))
    split_id = 3
    state = str(tmp_path / "state")
    apply_batch = upsert_foreach_batch(state)
    apply_batch(all_rows.filter(F.col("id") != split_id), 0)

    def snapshot():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(state + "/versions/bucket=*/*.parquet")
        }

    before = snapshot()
    apply_batch(all_rows.filter(F.col("id") == split_id), 1)
    after = snapshot()

    split_bucket = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(split_id).cast("long")), F.lit(N_STATE_BUCKETS)).alias("b"))
        .first()
        .b
    )
    untouched = {p for p in before if f"{os.sep}bucket={split_bucket}{os.sep}" not in p}
    assert untouched, "fixture should span more than one bucket"
    assert all(p in after and after[p] == before[p] for p in untouched), (
        "untouched buckets were rewritten"
    )
    touched_after = {p for p in after if f"{os.sep}bucket={split_bucket}{os.sep}" in p}
    assert touched_after, "the touched bucket should have been written"

    got = {
        tuple(r)
        for r in spark.read.parquet(state + "/current")
        .select("id", "name", "email", "_op", "_lsn", "_ts")
        .collect()
    }
    want = {tuple(r) for r in current_state(all_rows).collect()}
    assert got == want


def test_stream_static_enrich(spark, events_stream):
    from go_otel_clickhouse_ingestor_spark.streaming.windows import enrich_with_users

    users = spark.createDataFrame(
        [(1, "Ada", "ada@example.com"), (2, "Bo", "bo@example.com")],
        "id long, name string, email string",
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    _run_available_now(enrich_with_users(events_stream, users), name)
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() == 500
    assert "name" in out.columns


def test_metrics_listener(spark, events_stream):
    """A14: the listener accumulates the four reference series and
    renders Prometheus text exposition."""
    from go_otel_clickhouse_ingestor_spark.streaming.metrics import (
        IngestionMetricsListener,
    )

    listener = IngestionMetricsListener()
    spark.streams.addListener(listener)
    try:
        name = f"met_{uuid.uuid4().hex[:8]}"
        _run_available_now(events_stream.select("event_id"), name)
        deadline = time.time() + 30
        while time.time() < deadline and listener.generated_events_total == 0:
            time.sleep(0.5)
        assert listener.generated_events_total >= 500
        text = listener.render()
        assert "ingestion_generated_events_total" in text
        assert 'le="10.0"' in text or 'le="+Inf"' in text
    finally:
        spark.streams.removeListener(listener)


def test_clickhouse_shape_second_truncation(spark):
    """A10: the sink edge serializes timestamps as second-precision
    strings (clickhouse.go:77,84,112)."""
    from go_otel_clickhouse_ingestor_spark.streaming.sinks import clickhouse_shape

    df = spark.createDataFrame(
        [(1,)], "id long"
    ).select("id", F.timestamp_micros(F.lit(1_700_000_000_123_456)).alias("_ts"))
    row = clickhouse_shape(df).collect()[0]
    assert row._ts == "2023-11-14 22:13:20"


def test_jdbc_sink_config_auth_rule():
    """A11: basic auth only when BOTH user and password are set
    (clickhouse.go:48-50)."""
    from go_otel_clickhouse_ingestor_spark.streaming.sinks import JdbcSinkConfig

    assert "user" not in JdbcSinkConfig(url="u", table="t", user="a").properties()
    props = JdbcSinkConfig(url="u", table="t", user="a", password="b").properties()
    assert props["user"] == "a" and props["password"] == "b"


def test_jdbc_sink_table_routing():
    """A12: unqualified tables get the configured db prefix, qualified
    ones pass through (clickhouse.go:100-110, cmd/root.go:75-76)."""
    from go_otel_clickhouse_ingestor_spark.streaming.sinks import JdbcSinkConfig

    assert JdbcSinkConfig(url="u", table="users_cur").qualified_table() == "appdb.users_cur"
    assert JdbcSinkConfig(url="u", table="app.users_cur").qualified_table() == "app.users_cur"
    assert (
        JdbcSinkConfig(url="u", table="users_cur", database="other").qualified_table()
        == "other.users_cur"
    )


def test_jdbc_sink_live_roundtrip_embedded_derby(spark, tmp_path):
    """A11 LIVE: the exact ``jdbc_foreach_batch`` path executes a real
    JDBC write — streaming CDC messages micro-batched into an embedded
    Derby database (the JDBC engine Spark ships in its own jars; no
    ClickHouse exists in the harness, clickhouse.go:19-132) — and a
    real JDBC read gets the rows back byte-identical to the batch
    translation, timestamps serialized at second precision (A10).
    This upgrades A11 from shape-only unit tests to a harness-runnable
    write+read against a live JDBC endpoint: URL dispatch, driver
    loading, table routing (A12 qualified name -> Derby SCHEMA.TABLE),
    batchsize property, and append-table creation all execute for
    real."""
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

    db = str(tmp_path / "derbydb")
    cfg = JdbcSinkConfig(
        url=f"jdbc:derby:{db};create=true",
        table="users_cur",  # unqualified -> appdb.users_cur (A12)
        batchsize=100,
        options={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )

    rows = [{"msg_id": m, "key": k, "value": v} for m, k, v in CDC_MESSAGES]
    path = _write_jsonl(spark, tmp_path, rows, "cdc_jdbc")
    stream = spark.readStream.schema("msg_id long, key string, value string").json(path)
    q = (
        translate_stream(stream)
        .writeStream.foreachBatch(jdbc_foreach_batch(cfg))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.jdbc(
        cfg.url, cfg.qualified_table(), properties=cfg.properties()
    )
    want_df = clickhouse_shape(
        translate_envelope(parse_envelope(cdc_messages_df(spark)))
    )
    assert sorted(back.columns) == sorted(want_df.columns)
    cols = sorted(back.columns)
    got = sorted(tuple(r) for r in back.select(*cols).collect())
    want = sorted(tuple(r) for r in want_df.select(*cols).collect())
    assert got == want and len(got) > 0
    # A10 on the wire: the _ts column landed as a second-precision string
    ts = [r for r in back.select("_ts").collect() if r._ts is not None]
    assert ts and all(len(r._ts) == 19 and r._ts[4] == "-" for r in ts)


@pytest.mark.slow
def test_stateful_running_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user totals must carry state across
    micro-batches (two files, one per trigger) and converge to the
    batch groupBy."""
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        user_running_totals,
    )

    half1 = [{"user_id": i % 5, "value": float(i)} for i in range(20)]
    half2 = [{"user_id": i % 5, "value": float(i)} for i in range(20, 40)]
    d = tmp_path / "stateful_stream"
    d.mkdir()
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in half1))
    (d / "b.json").write_text("\n".join(json.dumps(r) for r in half2))

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql(f"SELECT * FROM {name}")
    # update mode emits one row per user per batch; the final row per
    # user (max n_events) must equal the batch aggregate over all rows
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    want = {
        uid: (8, float(sum(i for i in range(40) if i % 5 == uid)))
        for uid in range(5)
    }
    assert final == want
    # statefulness: more output rows than users proves multi-batch emission
    assert out.count() > 5


@pytest.mark.slow
def test_stream_stream_join_matches_batch(spark, events_stream, sf_dir):
    """Stream-stream interval join == the same join expressed in batch
    over the same 500 events."""
    from go_otel_clickhouse_ingestor_spark.streaming.windows import (
        stream_stream_click_purchase_join,
    )
    from go_otel_clickhouse_ingestor_spark.tables import table

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    # the fixture's events span ~14 days, so a wide horizon is needed
    # for the fixture to actually contain click->purchase pairs
    _run_available_now(
        stream_stream_click_purchase_join(events_stream, events_stream, "1 day"), name
    )
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}

    ev = table(spark, sf_dir, "events").limit(500)
    want = {tuple(r) for r in stream_stream_click_purchase_join(ev, ev, "1 day").collect()}
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_upsert_replaying_same_batch_is_idempotent(spark, tmp_path):
    """At-least-once replay: applying the identical micro-batch twice
    must leave versions AND current byte-for-byte identical (the dedup
    inside the MERGE absorbs the retry)."""
    from go_otel_clickhouse_ingestor_spark.operators.cdc import (
        parse_envelope,
        translate_envelope,
    )
    from go_otel_clickhouse_ingestor_spark.sources.fixtures import cdc_messages_df
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        upsert_foreach_batch,
    )

    rows = translate_envelope(parse_envelope(cdc_messages_df(spark)))
    state = str(tmp_path / "state")
    apply_batch = upsert_foreach_batch(state)
    apply_batch(rows, 0)
    versions_once = {tuple(r) for r in spark.read.parquet(state + "/versions").collect()}
    current_once = {tuple(r) for r in spark.read.parquet(state + "/current").collect()}
    apply_batch(rows, 0)  # the retry
    assert {tuple(r) for r in spark.read.parquet(state + "/versions").collect()} == versions_once
    assert {tuple(r) for r in spark.read.parquet(state + "/current").collect()} == current_once


def test_kafka_wiring_shape_and_options(spark):
    """The Kafka source wiring, exercised without a broker (r2 verdict
    item 6): (a) the option map is exactly what production passes to
    ``readStream.format("kafka")``; (b) a frame with the Kafka source's
    fixed schema flows through the SAME projection + translation the
    file/memory-source tests cover, producing the users_cur schema.
    Drift in either the options or the (key,value,offset) projection
    fails here."""
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        KAFKA_SOURCE_SCHEMA,
        kafka_source_options,
        shape_kafka_raw,
        translate_stream,
    )

    opts = kafka_source_options("broker1:9092,broker2:9092", "cdc.users",
                                starting_offsets="earliest",
                                max_offsets_per_trigger=10_000)
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "cdc.users",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "10000",
    }

    env = json.dumps(
        {
            "op": "c",
            "after": {"id": 7, "name": "n7", "email": "e7@x", "updated_at": 1_700_000_000_000_000},
            "ts_ms": 1_700_000_000_123,
            "lsn": 42,
        }
    )
    raw = spark.createDataFrame(
        [
            (
                b"7",
                env.encode(),
                "cdc.users",
                0,
                1234,
                None,
                0,
            )
        ],
        KAFKA_SOURCE_SCHEMA,
    )
    shaped = shape_kafka_raw(raw)
    assert [f.simpleString() for f in shaped.schema.fields] == [
        "msg_id:bigint",
        "key:string",
        "value:string",
    ]
    out = translate_stream(shaped)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].id == 7 and rows[0].name == "n7"


def test_kafka_production_entry_reaches_source_resolution(spark, tmp_path):
    """A3 live-shaped: drive the PRODUCTION entry (``kafka_cdc_stream``)
    as far as this harness physically allows.  With a broker configured
    (``SPARK_GRAFT_KAFKA_BROKERS``) and the kafka connector on the
    classpath, it runs a real availableNow read through the full
    translation.  Without them (this sandbox ships neither the
    spark-sql-kafka jar nor a broker), the call must fail at exactly
    Spark's data-source resolution step with the missing-package error
    — proving the production wiring (option map, stream construction,
    projection chain) executes through Spark's API right up to the
    environmental boundary, rather than being import-checked only."""
    import os

    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        kafka_cdc_stream,
    )

    brokers = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")
    if brokers:
        out = kafka_cdc_stream(
            spark, brokers, "cdc.users", starting_offsets="earliest"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("kafka_live")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("kafka_live").columns == [
            "id", "name", "email", "_op", "_lsn", "_ts",
        ]
        return
    with pytest.raises(Exception) as exc:
        kafka_cdc_stream(spark, "localhost:9092", "cdc.users")
    msg = str(exc.value)
    assert "kafka" in msg.lower() and (
        "Failed to find data source" in msg or "FAILED_TO_LOAD" in msg.upper()
    ), f"expected the missing-connector resolution error, got: {msg[:300]}"


@pytest.mark.slow
def test_stream_stream_left_outer_emits_unmatched(spark, events_stream, sf_dir):
    """LEFT OUTER stream-stream join: matched rows equal the inner
    join; unmatched clicks surface with null purchase columns once the
    watermark has passed their horizon (end-of-stream closes it for
    every click except possibly the stream tail)."""
    from go_otel_clickhouse_ingestor_spark.streaming.windows import (
        stream_stream_click_purchase_join,
    )
    from go_otel_clickhouse_ingestor_spark.tables import table

    name = f"ssjo_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        stream_stream_click_purchase_join(
            events_stream, events_stream, "1 day", how="left_outer"
        ),
        name,
    )
    got = spark.sql(f"SELECT * FROM {name}")
    got_matched = {tuple(r) for r in got.filter("purchase_id IS NOT NULL").collect()}
    got_unmatched = {r.click_id for r in got.filter("purchase_id IS NULL").collect()}

    ev = table(spark, sf_dir, "events").limit(500)
    want = stream_stream_click_purchase_join(ev, ev, "1 day", how="left_outer")
    want_matched = {tuple(r) for r in want.filter("purchase_id IS NOT NULL").collect()}
    want_unmatched = {r.click_id for r in want.filter("purchase_id IS NULL").collect()}

    assert got_matched == want_matched and len(got_matched) > 0
    # outer rows: everything the final watermark closed must be there,
    # and nothing that the batch form doesn't also consider unmatched
    assert got_unmatched <= want_unmatched
    assert len(got_unmatched) > 0


def test_matview_incremental_equals_batch_rollup(spark, events_stream, sf_dir, tmp_path):
    """Streaming the fixture through the materialized-view maintainer
    must leave the view identical to the one-shot batch rollup of the
    same events."""
    from go_otel_clickhouse_ingestor_spark.streaming.matview import (
        hourly_rollup,
        matview_foreach_batch,
    )
    from go_otel_clickhouse_ingestor_spark.tables import table

    view_dir = str(tmp_path / "matview")
    q = (
        events_stream.writeStream.foreachBatch(matview_foreach_batch(view_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.event_type, r.bucket_us): (r.n, round(r.total_value, 6))
        for r in spark.read.parquet(view_dir).collect()
    }
    want = {
        (r.event_type, r.bucket_us): (r.n, round(r.total_value, 6))
        for r in hourly_rollup(table(spark, sf_dir, "events").limit(500)).collect()
    }
    assert got == want and len(got) > 0

    # incremental path: two further batches combined into the SAME view
    # must equal the batch rollup over all 1500 events
    ev = table(spark, sf_dir, "events")
    # same unordered-limit chain as the fixture, so the three slices
    # tile the exact rows the stream already delivered plus two more
    b2 = ev.limit(1000).exceptAll(ev.limit(500))
    b3 = ev.limit(1500).exceptAll(ev.limit(1000))
    apply_batch = matview_foreach_batch(view_dir)
    apply_batch(b2, 1)
    apply_batch(b3, 2)
    got2 = {
        (r.event_type, r.bucket_us): (r.n, round(r.total_value, 6))
        for r in spark.read.parquet(view_dir).collect()
    }
    want2 = {
        (r.event_type, r.bucket_us): (r.n, round(r.total_value, 6))
        for r in hourly_rollup(ev.limit(1500)).collect()
    }
    assert got2 == want2 and len(got2) > len(got)


# ---------------------------------------------------------------- cdc_feed


def test_cdc_feed_batch_contract(spark):
    """The custom Python DataSource emits the exact Kafka source schema
    and the documented offset range, partition-parallel."""
    from go_otel_clickhouse_ingestor_spark.sources.cdc_feed import (
        CDC_FEED_SCHEMA,
        register,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        KAFKA_SOURCE_SCHEMA,
    )

    assert CDC_FEED_SCHEMA == KAFKA_SOURCE_SCHEMA  # contract lockstep
    register(spark)
    df = (
        spark.read.format("cdc_feed")
        .option("rows", 39)
        .option("partitions", 4)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 39
    assert sorted(r.offset for r in rows) == list(range(39))
    assert {r.partition for r in rows} == {0, 1, 2, 3}
    assert all(r.topic == "pg.app.users" and r.timestampType == 0 for r in rows)


def test_cdc_feed_stream_availablenow(spark):
    """Streaming read drains to max_offset in batch_size micro-batches
    and the unmodified CDC pipeline consumes it."""
    from go_otel_clickhouse_ingestor_spark.sources.cdc_feed import register
    from go_otel_clickhouse_ingestor_spark.streaming.cdc_stream import (
        shape_kafka_raw,
        translate_stream,
    )

    register(spark)
    raw = (
        spark.readStream.format("cdc_feed")
        .option("batch_size", 17)
        .option("max_offset", 52)
        .load()
    )
    name = f"cdc_feed_{uuid.uuid4().hex[:8]}"
    q = (
        translate_stream(shape_kafka_raw(raw))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # 52 offsets, every 13th (12, 25, 38, 51) corrupt and dropped
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) c FROM {name}").first().c >= 48:
                break
            time.sleep(0.5)
        out = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    assert len(out) == 48
    # double-encoded offsets survive the fallback parse
    assert {r.msg_id for r in out} >= {6, 20, 27, 34}


@pytest.mark.slow
def test_tws_running_totals_accumulate_across_batches(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 StatefulProcessor): same
    semantics as the applyInPandasWithState twin — per-user totals carry
    across micro-batches on the RocksDB state store and converge to the
    batch aggregate.

    The TWS runtime speaks protobuf between the JVM and the Python
    state server; in containers without ``google.protobuf`` the query
    can't start, so the runnable coverage degrades to the wiring
    assertions in test_tws_unrunnable_still_builds below."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf for its state protocol",
    )
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        user_running_totals_tws,
    )

    half1 = [{"user_id": i % 5, "value": float(i)} for i in range(20)]
    half2 = [{"user_id": i % 5, "value": float(i)} for i in range(20, 40)]
    d = tmp_path / "tws_stream"
    d.mkdir()
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in half1))
    (d / "b.json").write_text("\n".join(json.dumps(r) for r in half2))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            user_running_totals_tws(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        out = spark.sql(f"SELECT * FROM {name}")
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        final = {
            r.user_id: (r.n_events, r.total_value)
            for r in out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }
        want = {
            uid: (8, float(sum(i for i in range(40) if i % 5 == uid)))
            for uid in range(5)
        }
        assert final == want
        assert out.count() > 5
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_unrunnable_still_builds(spark):
    """Even without protobuf (which query START needs), the
    transformWithStateInPandas plan must BUILD: correct output schema
    and the TransformWithStateInPandas node in the analyzed plan — so
    drift in the processor/schema wiring fails here, not only on a
    protobuf-equipped cluster."""
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        user_running_totals_tws,
    )

    stream = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "cast(value AS double) AS value"
    )
    out = user_running_totals_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
    ]
    # the analyzed-plan node is TransformWithStateInPySpark in Spark 4.1
    assert (
        "transformwithstateinpyspark"
        in out._jdf.queryExecution().analyzed().toString().lower()
    )


def test_jsonl_sink_two_phase_commit(spark, sf_dir, tmp_path):
    """jsonl_sink DataSource writer: nothing visible but final part
    files + _SUCCESS manifest after commit, no temp residue, manifest
    row count exact, and a lossless JSON round-trip."""
    import glob
    import os

    from go_otel_clickhouse_ingestor_spark.sources import jsonl_sink
    from go_otel_clickhouse_ingestor_spark.tables import table

    jsonl_sink.register(spark)
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .repartition(4)
    )
    out = str(tmp_path / "jsonl_out")
    d.write.format("jsonl_sink").mode("append").option("path", out).save()

    assert not glob.glob(f"{out}/.tmp-*"), "temp files must not survive commit"
    manifest = json.loads(open(os.path.join(out, "_SUCCESS")).read())
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/part-*.jsonl"))
    assert sorted(manifest["files"]) == parts and len(parts) == 4
    assert manifest["rows"] == d.count()

    back = spark.read.schema("doc_id long, lang string, source string, n_chars long").json(
        f"{out}/part-*.jsonl"
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in d.collect()}


def test_jsonl_sink_save_modes_and_orphan_sweep(spark, sf_dir, tmp_path):
    """Save-mode semantics: overwrite clears every prior part file (a
    smaller second job must not leave stale high-numbered parts a
    part-glob reader would see); append offsets numbering past existing
    parts and folds the prior manifest; orphaned .tmp-* files from dead
    task attempts are swept at commit."""
    import glob
    import os

    from go_otel_clickhouse_ingestor_spark.sources import jsonl_sink
    from go_otel_clickhouse_ingestor_spark.tables import table

    jsonl_sink.register(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = str(tmp_path / "jsonl_modes")

    docs.repartition(4).write.format("jsonl_sink").mode("append").option(
        "path", out
    ).save()
    # simulate a task attempt that died mid-write (no commit message)
    orphan = os.path.join(out, ".tmp-deadbeef.jsonl")
    open(orphan, "w").write('{"doc_id": -1}\n')

    # overwrite with FEWER partitions: stale part-00002/3 must vanish
    docs.limit(10).repartition(2).write.format("jsonl_sink").mode(
        "overwrite"
    ).option("path", out).save()
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/part-*.jsonl"))
    assert parts == ["part-00000.jsonl", "part-00001.jsonl"]
    assert not os.path.exists(orphan), "orphaned temp must be swept at commit"
    manifest = json.loads(open(os.path.join(out, "_SUCCESS")).read())
    assert sorted(manifest["files"]) == parts and manifest["rows"] == 10
    back = spark.read.schema("doc_id long, n_chars long").json(f"{out}/part-*.jsonl")
    assert back.count() == 10

    # append on top: numbering continues, manifest folds both jobs
    docs.limit(5).repartition(2).write.format("jsonl_sink").mode("append").option(
        "path", out
    ).save()
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/part-*.jsonl"))
    assert parts == [f"part-0000{i}.jsonl" for i in range(4)]
    manifest = json.loads(open(os.path.join(out, "_SUCCESS")).read())
    assert sorted(manifest["files"]) == parts and manifest["rows"] == 15


def test_stateful_ewma_matches_sequential_fold(spark, tmp_path):
    """Streaming EWMA (applyInPandasWithState) must fold across
    micro-batches to exactly the sequential α=0.3 fold over the
    time-ordered series — the stateful twin of the batch events_ewma
    query."""
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import user_ewma

    rows = [
        {
            "user_id": i % 3,
            "ts": f"2026-01-01T00:{i:02d}:00.000Z",
            "event_id": i,
            "value": float((i * 7) % 11),
        }
        for i in range(30)
    ]
    d = tmp_path / "ewma_stream"
    d.mkdir()
    # two triggers, split at the time midpoint (in-order feed)
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in rows[:15]))
    (d / "b.json").write_text("\n".join(json.dumps(r) for r in rows[15:]))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        user_ewma(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql(f"SELECT * FROM {name}")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_obs").desc())
    final = {
        r.user_id: (r.n_obs, r.ewma)
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    want = {}
    for uid in range(3):
        vals = [r["value"] for r in rows if r["user_id"] == uid]
        acc = None
        for v in vals:
            acc = v if acc is None else 0.3 * v + 0.7 * acc
        want[uid] = (len(vals), round(acc, 6))
    assert final == want
    # statefulness across triggers: more emitted rows than users
    assert out.count() > 3


def test_session_window_dynamic_gap_per_event_type(spark, tmp_path):
    """Per-row gap expressions: a purchase holds its session open for
    30 minutes while clicks get 5 — so the SAME arrival times merge
    for a purchasing user and split for a clicking one.

    - user 1: purchase t=0 (horizon 30min), click t=20min — the click
      lands inside the purchase's horizon -> ONE session [0, 30min)
      (end = max(0+30, 20+5)), n=2;
    - user 2: click t=0, click t=20min — 5-min horizons don't touch ->
      TWO sessions [0,5) and [20,25);
    - user 3: click t=60min pushes the watermark to 50min, closing and
      emitting all of the above (its own session stays open)."""
    import os as _os

    from go_otel_clickhouse_ingestor_spark.streaming.windows import (
        session_counts_dynamic_gap,
    )

    t0 = 1_700_000_000_000_000  # µs
    mins = 60 * 1_000_000

    def ev(eid, t_min, uid, etype):
        return {
            "event_id": eid,
            "ts_us": t0 + int(t_min * mins),
            "user_id": uid,
            "event_type": etype,
            "value": 1.0,
        }

    d = tmp_path / "dyn_sess"
    d.mkdir()
    batches = [
        [ev(1, 0, 1, "purchase"), ev(2, 0, 2, "click")],
        [ev(3, 20, 1, "click"), ev(4, 20, 2, "click")],
        [ev(5, 60, 3, "click")],
    ]
    for i, rows in enumerate(batches):
        p = d / f"{chr(97 + i)}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        _os.utime(p, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )
    name = f"dynsess_{uuid.uuid4().hex[:8]}"
    q = (
        session_counts_dynamic_gap(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = sorted(
        (r.user_id, (r.win_end.timestamp() - r.win_start.timestamp()) / 60.0, r.n_events)
        for r in rows
    )
    assert (1, 30.0, 2) in got, f"purchase horizon should merge u1: {got}"
    u2 = [x for x in got if x[0] == 2]
    assert u2 == [(2, 5.0, 1), (2, 5.0, 1)], (
        f"click horizons must split u2 into two 5-min sessions: {got}"
    )
    assert not any(u == 3 for (u, _, _) in got), "u3's session is still open"


def test_state_ttl_expires_idle_keys_on_watermark(spark, tmp_path):
    """Event-time state TTL: a key idle past STATE_TTL_MS of EVENT time
    must emit one final 'expired' row and drop its state when the
    watermark crosses its timeout — deterministic replay-safe eviction,
    no wall clock involved.

    - batch 1: user 1 at t=0 -> 'active', timer armed at 10min;
    - batch 2: user 2 at t=30min -> watermark (after batch) = 29min;
    - batch 3: user 2 at t=40min -> processing starts with watermark
      29min > 10min, so user 1's timer fires: 'expired' row."""
    import os as _os

    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        user_running_totals_ttl,
    )

    t0 = 1_700_000_000_000_000
    mins = 60 * 1_000_000

    def ev(eid, t_min, uid, val):
        return {
            "event_id": eid,
            "ts_us": t0 + int(t_min * mins),
            "user_id": uid,
            "event_type": "click",
            "value": val,
        }

    d = tmp_path / "ttl_stream"
    d.mkdir()
    batches = [
        [ev(1, 0, 1, 5.0)],
        [ev(2, 30, 2, 1.0)],
        [ev(3, 40, 2, 2.0)],
    ]
    for i, rows in enumerate(batches):
        p = d / f"{chr(97 + i)}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        _os.utime(p, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )
    name = f"ttl_{uuid.uuid4().hex[:8]}"
    q = (
        user_running_totals_ttl(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    tagged = {(r.user_id, r.status, r.n_events, r.total_value) for r in rows}
    assert (1, "active", 1, 5.0) in tagged, tagged
    assert (1, "expired", 1, 5.0) in tagged, f"user 1 never expired: {tagged}"
    assert (2, "active", 2, 3.0) in tagged, tagged
    # expiry removed the state: no further user-1 rows after the final one
    assert sum(1 for r in rows if r.user_id == 1) == 2


def test_stateful_holt_matches_sequential_fold(spark, tmp_path):
    """Streaming Holt (applyInPandasWithState) must fold daily totals
    across micro-batches to exactly the sequential α=0.5/β=0.3
    recurrence — the stateful twin of the batch events_forecast_holt
    query."""
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        type_holt_forecast,
    )

    rows = [
        {
            "event_type": t,
            "day": f"2026-01-{d:02d}",
            "x": float((d * 13 + len(t) * 7) % 29 + 1),
        }
        for t in ("click", "view")
        for d in range(1, 13)
    ]
    d = tmp_path / "holt_stream"
    d.mkdir()
    # three triggers of four days each, in day order per type; the file
    # source orders by modification time, so pin strictly increasing
    # mtimes (same-second writes tie-break arbitrarily — measured)
    import os as _os
    import time as _time

    base = _time.time() - 60
    for i in range(3):
        chunk = [r for r in rows if (int(r["day"][-2:]) - 1) // 4 == i]
        p = d / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in chunk))
        _os.utime(p, (base + 10 * i, base + 10 * i))

    stream = (
        spark.readStream.schema("event_type string, day date, x double")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    name = f"holt_{uuid.uuid4().hex[:8]}"
    q = (
        type_holt_forecast(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql(f"SELECT * FROM {name}")
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy(F.col("n_days").desc())
    final = {
        r.event_type: (r.n_days, r.level, r.trend, r.forecast_next)
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    want = {}
    for t in ("click", "view"):
        xs = [r["x"] for r in rows if r["event_type"] == t]
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (level + trend)
            trend = 0.3 * (nl - level) + 0.7 * trend
            level = nl
        want[t] = (
            len(xs),
            round(level, 6),
            round(trend, 6),
            round(level + trend, 6),
        )
    assert final == want
    # state persisted across all three triggers
    assert out.count() > 2


def test_tws_token_bucket_and_cusum_build(spark):
    """The round-10 TWS faces (token bucket, CUSUM) must BUILD even
    without protobuf (which only query START needs): right output
    schema, streaming plan, and the TransformWithState node analyzed —
    wiring drift fails here, not only on a protobuf-equipped cluster."""
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        series_cusum_stream_tws,
        token_bucket_stream_tws,
    )

    events = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id",
        "value AS event_id",
        "timestamp AS ts",
    )
    tb = token_bucket_stream_tws(events)
    assert tb.isStreaming
    assert [f.name for f in tb.schema.fields] == [
        "user_id", "event_id", "rn", "admitted", "balance_us",
    ]
    assert (
        "transformwithstateinpyspark"
        in tb._jdf.queryExecution().analyzed().toString().lower()
    )

    daily = spark.readStream.format("rate").load().selectExpr(
        "cast(value AS string) AS series",
        "cast(timestamp AS string) AS day",
        "cast(value AS double) AS x",
    )
    cs = series_cusum_stream_tws(daily, mu=10.0, sigma=2.0)
    assert cs.isStreaming
    assert [f.name for f in cs.schema.fields] == [
        "series", "day", "cusum_pos", "cusum_neg", "alarm_up", "alarm_down",
    ]
    assert (
        "transformwithstateinpyspark"
        in cs._jdf.queryExecution().analyzed().toString().lower()
    )


def test_tws_token_bucket_matches_batch(spark, sf_dir, tmp_path):
    """Runnable TWS equivalence (protobuf-gated like the running-totals
    twin): token_bucket_stream_tws across two ordered micro-batches ==
    the batch events_token_bucket_admission replay on the same rows."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf for its state protocol",
    )
    from go_otel_clickhouse_ingestor_spark.operators.analytics import (
        events_token_bucket_admission,
    )
    from go_otel_clickhouse_ingestor_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        token_bucket_stream_tws,
    )

    from go_otel_clickhouse_ingestor_spark.tables import table

    ev = (
        table(spark, sf_dir, "events")
        .orderBy("user_id", "ts", "event_id")
        .limit(2000)
        .collect()
    )
    # per-user event-time split: first half of each user's events in
    # batch 1 — the ordered-feed contract the AIPWS twin documents
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    rows1, rows2 = [], []
    for urows in by_user.values():
        mid = len(urows) // 2
        rows1 += urows[:mid]
        rows2 += urows[mid:]
    d = tmp_path / "twstb_stream"
    d.mkdir()
    for fname, chunk in (("a.json", rows1), ("b.json", rows2)):
        (d / fname).write_text(
            "\n".join(
                json.dumps(
                    {
                        "user_id": r.user_id,
                        "event_id": r.event_id,
                        "ts": r.ts.isoformat(sep=" "),
                    }
                )
                for r in chunk
            )
        )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema("user_id long, event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        name = f"twstb_{uuid.uuid4().hex[:8]}"
        q = (
            token_bucket_stream_tws(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.event_id: (r.rn, r.admitted, r.balance_us)
            for r in spark.table(name).collect()
        }
        # the 2000-row window holds each included user's EARLIEST events
        # (sorted by user, ts, id), and the replay recurrence is
        # prefix-deterministic — a user's rn/admitted/balance on their
        # first k events doesn't depend on later ones — so every common
        # event_id must agree with the full-table batch replay exactly
        eids = {r.event_id for r in ev}
        want = {
            r.event_id: (r.rn, r.admitted, r.balance_us)
            for r in events_token_bucket_admission(spark, sf_dir).collect()
            if r.event_id in eids
        }
        common = set(got) & set(want)
        assert len(common) > 100
        mismatches = {e: (got[e], want[e]) for e in common if got[e] != want[e]}
        assert not mismatches, dict(list(mismatches.items())[:5])
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_cdc_feed_partitioned_stream_reader(spark, tmp_path):
    """cdc_feed_part (partition-planned DataSourceStreamReader, the
    broker-scale rung): per-partition offset map, executor-side reads,
    disjoint partition streams whose union is the single-stream corpus,
    and offsets surviving a checkpointed restart with no duplicates."""
    import json as _json

    from go_otel_clickhouse_ingestor_spark.sources.cdc_feed import (
        envelope_at,
        register,
    )

    register(spark)
    ckpt = str(tmp_path / "cdc_part_ckpt")
    sink = str(tmp_path / "cdc_part_sink")

    def run_once(available):
        before = set()
        import glob as _g
        import os as _os

        if _os.path.isdir(sink):
            before = {
                _os.path.basename(p)
                for p in _g.glob(_os.path.join(sink, "*.parquet"))
            }
        raw = (
            spark.readStream.format("cdc_feed_part")
            .option("partitions", 3)
            .option("available", available)
            .load()
        )
        q = (
            raw.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        new = [
            p
            for p in _g.glob(_os.path.join(sink, "*.parquet"))
            if _os.path.basename(p) not in before
        ]
        return spark.read.parquet(*new).collect() if new else []

    # produce-then-drain: 20 offsets/partition arrived, drain them
    first = run_once(available=20)
    assert len(first) == 3 * 20
    assert {r.partition for r in first} == {0, 1, 2}
    # 20 more arrive; the restart resumes from the CHECKPOINTED start
    # and drains only the new ones — no dupes
    second = run_once(available=40)
    assert len(second) == 3 * 20
    seen_first = {(r.partition, r.offset) for r in first}
    seen_second = {(r.partition, r.offset) for r in second}
    assert not (seen_first & seen_second), "duplicate offsets after restart"
    assert seen_first | seen_second == {
        (p, o) for p in range(3) for o in range(40)
    }
    # content contract: partition p offset i carries the deterministic
    # envelope at global index i*3+p — disjoint, union = the corpus
    for r in first + second:
        want_key, want_val = envelope_at(r.offset * 3 + r.partition)
        assert bytes(r.key) == want_key and bytes(r.value) == want_val
