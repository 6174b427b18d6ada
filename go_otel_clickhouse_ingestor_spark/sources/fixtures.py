"""Debezium CDC fixture messages (FIXTURES.md §B2).

One (msg_id, key, value) triple per branch of the reference's CDC
translation (``internal/ingestion/cdc.go:87-156``):

- direct JSON / stringified (double-encoded) JSON / corrupt payload
  (``tryUnmarshalEnvelope``, cdc.go:87-98)
- c / u / d ops, unknown op, case-sensitive op match (cdc.go:113-142)
- missing ``after`` for c/u → dropped (cdc.go:115-118)
- delete id from ``before`` vs Kafka-key fallback vs unparseable key
  (cdc.go:125-134)
- null lsn / ts_us → 0 / epoch defaults (cdc.go:101-109)

The same constants feed BOTH the Spark DataFrame and the DuckDB oracle
VALUES literal, so the differential check runs the full translation in
two engines over identical bytes.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _env(op, after=None, before=None, lsn=None, ts_us=None):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {"lsn": lsn, "ts_us": ts_us, "schema": "app", "table": "users"},
            "op": op,
            "ts_us": ts_us,
        },
        separators=(", ", ": "),
    )


def _user(uid, name, email):
    return {"id": uid, "name": name, "email": email}


#: (msg_id, kafka_key, kafka_value) — append-only; msg_id is the Kafka
#: offset stand-in and the deterministic sort key.
CDC_MESSAGES: list[tuple[int, str, str]] = [
    # 1: create (cdc.go:113-123)
    (1, '{"id": 1}', _env("c", after=_user(1, "Ada", "ada@example.com"), lsn=1001, ts_us=1755086400000000)),
    # 2: update
    (2, '{"id": 1}', _env("u", after=_user(1, "Ada L.", "ada@newmail.com"), before=_user(1, "Ada", "ada@example.com"), lsn=1002, ts_us=1755086401000000)),
    # 3: delete with before.id (cdc.go:127-128)
    (3, '{"id": 1}', _env("d", before=_user(1, "", ""), lsn=1003, ts_us=1755086402000000)),
    # 4: delete, before null -> id from Kafka key (cdc.go:130-133)
    (4, '{"id": 2}', _env("d", lsn=1004, ts_us=1755086403000000)),
    # 5: stringified (double-encoded) envelope (cdc.go:92-97)
    (5, '{"id": 3}', json.dumps(_env("c", after=_user(3, "Bo", "bo@example.com"), lsn=1005, ts_us=1755086404000000))),
    # 6: corrupt payload -> dropped (cdc.go:63-67)
    (6, '{"id": 4}', "not-json-at-all{{{"),
    # 7: unknown op -> dropped (cdc.go:139-141)
    (7, '{"id": 5}', _env("r", after=_user(5, "Cy", "cy@example.com"), lsn=1006, ts_us=1755086405000000)),
    # 8: update with missing after -> dropped (cdc.go:115-118)
    (8, '{"id": 6}', _env("u", lsn=1007, ts_us=1755086406000000)),
    # 9: create with null lsn/ts_us -> defaults 0/epoch (cdc.go:101-109)
    (9, '{"id": 9}', _env("c", after=_user(9, "Di", "di@example.com"))),
    # 10: uppercase op -> dropped (translate's switch is case-sensitive,
    #     cdc.go:113; only opToEnum lowercases, cdc.go:146)
    (10, '{"id": 7}', _env("C", after=_user(7, "Ed", "ed@example.com"), lsn=1008, ts_us=1755086407000000)),
    # 11: delete with before.id=0 -> key fallback (cdc.go:127 checks != 0)
    (11, '{"id": 11}', _env("d", before=_user(0, "", ""), lsn=1009, ts_us=1755086408000000)),
    # 12: delete, before null, corrupt key -> id stays 0 (cdc.go:131)
    (12, "corrupt-key{{{", _env("d", lsn=1010, ts_us=1755086409000000)),
]


def cdc_messages_df(spark: SparkSession) -> DataFrame:
    """The fixture messages as a kafka-shaped DataFrame
    (msg_id, key string, value string)."""
    return spark.createDataFrame(CDC_MESSAGES, "msg_id long, key string, value string")


def messages_values_sql(messages: list[tuple[int, str, str]]) -> str:
    """Any (msg_id, key, value) corpus as a DuckDB VALUES literal:
    ``(VALUES (msg_id, key, value), ...) AS raw(msg_id, key, value)``."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n      ".join(f"({m}, {q(k)}, {q(v)})" for m, k, v in messages)
    return f"(VALUES {rows}) AS raw(msg_id, key, value)"


def cdc_messages_values_sql() -> str:
    """The fixture corpus as a DuckDB VALUES literal."""
    return messages_values_sql(CDC_MESSAGES)


def _env_v2(op, after=None, before=None, lsn=None, ts_us=None):
    """Generation-2 envelope: ``after.phone`` column added upstream and
    a ``source.version`` tag — the additive schema drift a long-lived
    CDC consumer must absorb without redeploy."""
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {
                "lsn": lsn,
                "ts_us": ts_us,
                "schema": "app",
                "table": "users",
                "version": "2.1",
            },
            "op": op,
            "ts_us": ts_us,
        },
        separators=(", ", ": "),
    )


def _user_v2(uid, name, email, phone):
    u = {"id": uid, "name": name, "email": email}
    if phone is not None:
        u["phone"] = phone
    return u


#: Generation-2 messages (appended after the v1 corpus; msg_id keeps
#: ascending so offset order == arrival order across the drift).
CDC_MESSAGES_V2: list[tuple[int, str, str]] = [
    # 101: v2 create with the new phone column
    (101, '{"id": 20}', _env_v2("c", after=_user_v2(20, "Fay", "fay@example.com", "+1-555-0100"), lsn=2001, ts_us=1755090000000000)),
    # 102: v2 update, phone changed
    (102, '{"id": 20}', _env_v2("u", after=_user_v2(20, "Fay", "fay@example.com", "+1-555-0199"), before=_user_v2(20, "Fay", "fay@example.com", "+1-555-0100"), lsn=2002, ts_us=1755090001000000)),
    # 103: v2 create where the OPTIONAL new column is absent (nullable
    #      drift, not just tagged presence)
    (103, '{"id": 21}', _env_v2("c", after=_user_v2(21, "Gil", "gil@example.com", None), lsn=2003, ts_us=1755090002000000)),
    # 104: v2 delete
    (104, '{"id": 20}', _env_v2("d", before=_user_v2(20, "Fay", "fay@example.com", "+1-555-0199"), lsn=2004, ts_us=1755090003000000)),
    # 105: v2 stringified (double-encoding survives the drift)
    (105, '{"id": 22}', json.dumps(_env_v2("c", after=_user_v2(22, "Hal", "hal@example.com", "+1-555-0122"), lsn=2005, ts_us=1755090004000000))),
]


def cdc_messages_all() -> list[tuple[int, str, str]]:
    """v1 + v2 corpus, offset order."""
    return CDC_MESSAGES + CDC_MESSAGES_V2


def cdc_messages_all_df(spark: SparkSession) -> DataFrame:
    """The mixed-generation corpus as a kafka-shaped DataFrame."""
    return spark.createDataFrame(
        cdc_messages_all(), "msg_id long, key string, value string"
    )


def cdc_messages_all_values_sql() -> str:
    """The mixed-generation corpus as a DuckDB VALUES literal."""
    return messages_values_sql(cdc_messages_all())
