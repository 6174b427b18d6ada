"""Property-based differential test of the CDC translation.

The fixtures in ``sources/fixtures.py`` replay the reference's
branches one by one; this file closes the gaps BETWEEN the fixtures:
hypothesis generates arbitrary envelopes (missing fields, empty
structs, stringified payloads, corrupt bytes, unknown ops, key-only
deletes) and compares the Spark column-expression pipeline against an
independent pure-Python implementation of the Go semantics
(``internal/ingestion/cdc.go:87-156``).

Kept within the documented contract: ids are non-negative int64 (the
UInt64>2^63 overflow caveat is SURVEY §1.2), and ``before``/``after``
are objects or null, as Debezium emits them.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# ------------------------------------------------- python reference


def ref_translate(msg_id: int, key: str | None, value: str):
    """Pure-Python mirror of tryUnmarshalEnvelope + translateEnvelopeToRow."""
    env = None
    try:
        env = json.loads(value)
        if isinstance(env, str):  # double-encoded payload (cdc.go:92-97)
            env = json.loads(env)
    except (json.JSONDecodeError, TypeError):
        return None
    if not isinstance(env, dict):
        return None

    op = env.get("op")
    before, after = env.get("before"), env.get("after")
    source = env.get("source") or {}

    if op in ("c", "u"):
        if not isinstance(after, dict):
            return None  # cdc.go:115-118: c/u without after drops
        row_id = after.get("id") or 0
        name = after.get("name") or ""
        email = after.get("email") or ""
        is_deleted, op_enum = 0, (1 if op == "c" else 2)
    elif op == "d":
        bid = (before.get("id") if isinstance(before, dict) else None) or 0
        if bid != 0:
            row_id = bid
        else:  # delete-key fallback (cdc.go:130-133)
            try:
                k = json.loads(key)
                kid = k.get("id") if isinstance(k, dict) else None
                # Go unmarshals the key into struct{ID uint64}: a
                # non-integer id fails the decode -> zero value
                row_id = kid if isinstance(kid, int) and not isinstance(kid, bool) else 0
            except (json.JSONDecodeError, TypeError):
                row_id = 0
        name, email, is_deleted, op_enum = "", "", 1, 3
    else:
        return None  # unknown op drops (case-sensitive switch)

    lsn = source.get("lsn") or 0
    ts_us = env.get("ts_us") or 0
    return (msg_id, row_id, name, email, is_deleted, op_enum, lsn, ts_us)


# ------------------------------------------------------- strategies

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=8
)
_user = st.one_of(
    st.none(),
    st.fixed_dictionaries(
        {},
        optional={
            "id": st.integers(0, 2**31),
            "name": _text,
            "email": _text,
        },
    ),
)
_envelope = st.fixed_dictionaries(
    {},
    optional={
        "before": _user,
        "after": _user,
        "op": st.sampled_from(["c", "u", "d", "r", "C", "D", "x", ""]),
        "ts_us": st.integers(0, 2**45),
        "source": st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {},
                optional={
                    "lsn": st.integers(0, 2**45),
                    "ts_us": st.integers(0, 2**45),
                    "schema": _text,
                    "table": _text,
                },
            ),
        ),
    },
)


@st.composite
def _message(draw):
    env = draw(_envelope)
    encoding = draw(st.sampled_from(["direct", "stringified", "corrupt", "nonobject"]))
    if encoding == "direct":
        value = json.dumps(env)
    elif encoding == "stringified":
        value = json.dumps(json.dumps(env))
    elif encoding == "nonobject":
        value = draw(st.sampled_from(["42", "[1,2]", '"just a string"', "null"]))
    else:
        value = draw(st.sampled_from(["{not json", "", "\x00\x01", "{\"op\": "]))
    key = draw(
        st.one_of(
            st.none(),
            st.builds(lambda i: json.dumps({"id": i}), st.integers(0, 2**31)),
            st.sampled_from(["{broken", "[]", '{"id": "nan"}', ""]),
        )
    )
    return key, value


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_message(), min_size=1, max_size=40))
def test_translation_matches_python_reference(spark, msgs):
    from go_otel_clickhouse_ingestor_spark.operators.cdc import (
        parse_envelope,
        translate_envelope,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(msgs)],
        "msg_id long, key string, value string",
    )
    got = {
        tuple(r)
        for r in translate_envelope(parse_envelope(df))
        .select(
            "msg_id",
            "id",
            "name",
            "email",
            "is_deleted",
            "_op",
            "_lsn",
            F.unix_micros("_ts").alias("ts_us"),
        )
        .collect()
    }
    want = {
        row
        for i, (k, v) in enumerate(msgs)
        if (row := ref_translate(i, k, v)) is not None
    }
    assert got == want
