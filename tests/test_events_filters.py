"""Event-stream filters (T2/T3), composite pks, skew utils, dead letters."""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from synch_spark.config import Engine, TableSpec
from synch_spark.events import (
    RAW_EVENT_SCHEMA,
    filter_dml,
    filter_tables,
    parse_values,
    split_updates,
)
from synch_spark.operators.cdc_apply import apply_cdc_batch, read_current_state
from synch_spark.operators.skew import salted_count, salted_sum
from synch_spark.sources.table import ParquetTable


def _raw(spark, rows):
    data = [
        (sch, tbl, a, json.dumps(b) if b else None, json.dumps(af) if af else None, us)
        for (sch, tbl, a, b, af, us) in rows
    ]
    return spark.createDataFrame(data, RAW_EVENT_SCHEMA)


def test_filter_dml_skip_delete_tables(spark):
    # filter on RAW events, then split — reference order (mysql.py:190-212)
    raw = _raw(spark, [
        ("db", "keep", "delete", {"id": 1}, None, 100),
        ("db", "skip", "delete", {"id": 1}, None, 100),
        ("db", "skip", "update", {"id": 1}, {"id": 1}, 100),
        ("db", "skip", "insert", None, {"id": 2}, 100),
    ])
    out = split_updates(filter_dml(raw, skip_delete_tables=("db.skip",)))
    kept = [(r["table"], r["action"], r["action_seq"]) for r in out.collect()]
    assert ("keep", "delete", 1) in kept  # other table unaffected
    # standalone delete on db.skip gone; its update's delete-half remains
    assert kept.count(("skip", "delete", 1)) == 1
    assert ("skip", "insert", 2) in kept


def test_filter_dml_skip_update_tables(spark):
    raw = _raw(spark, [
        ("db", "skip", "update", {"id": 1, "v": "a"}, {"id": 1, "v": "b"}, 100),
        ("db", "skip", "insert", None, {"id": 2}, 100),
    ])
    out = split_updates(filter_dml(raw, skip_update_tables=("db.skip",)))
    kept = [(r["action"], r["action_seq"]) for r in out.collect()]
    assert kept == [("insert", 2)]  # both update halves suppressed


def test_filter_tables(spark):
    ev = split_updates(_raw(spark, [
        ("a", "t1", "insert", None, {"id": 1}, 100),
        ("b", "t1", "insert", None, {"id": 1}, 100),
        ("a", "t2", "insert", None, {"id": 1}, 100),
    ]))
    out = filter_tables(ev, only_schemas=("a",), only_tables=("t1",))
    assert [(r["schema"], r["table"]) for r in out.collect()] == [("a", "t1")]


COMPOSITE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("id2", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_composite_pk_cdc(spark, tmp_path):
    """F2 fixture shape: tuple pk (id, id2) — the reference's special-cased
    composite-delete path (merge_tree.py:19-31) must fall out naturally."""
    spec = TableSpec(schema="db", table="c", pk=("id", "id2"), engine=Engine.MERGE_TREE)
    t = ParquetTable(spark, str(tmp_path / "c"))
    mk = lambda a, b, af, us: ("db", "c", a, b, af, us)  # noqa: E731
    ev1 = split_updates(_raw(spark, [
        mk("insert", None, {"id": 1, "id2": "a", "amount": 1.0}, 100),
        mk("insert", None, {"id": 1, "id2": "b", "amount": 2.0}, 100),
        mk("insert", None, {"id": 2, "id2": "a", "amount": 3.0}, 100),
    ]))
    apply_cdc_batch(t, parse_values(ev1, COMPOSITE_SCHEMA), spec)
    ev2 = split_updates(_raw(spark, [
        mk("delete", {"id": 1, "id2": "a", "amount": 1.0}, None, 200),
        mk("update", {"id": 1, "id2": "b", "amount": 2.0}, {"id": 1, "id2": "b", "amount": 9.0}, 200),
    ]))
    apply_cdc_batch(t, parse_values(ev2, COMPOSITE_SCHEMA), spec)
    got = {(r["id"], r["id2"]): r["amount"] for r in read_current_state(t, spec).collect()}
    assert got == {(1, "b"): 9.0, (2, "a"): 3.0}


def test_salted_aggregates_match_plain(spark, tables):
    ev = tables["events"]
    plain = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n")).collect()}
    salted = {r["user_id"]: r["n"] for r in salted_count(ev, ["user_id"]).collect()}
    assert salted == plain
    plain_s = {r["user_id"]: round(r["s"], 6) for r in ev.groupBy("user_id").agg(F.sum("value").alias("s")).collect()}
    salted_s = {r["user_id"]: round(r["sum_value"], 6) for r in salted_sum(ev, ["user_id"], "value").collect()}
    assert salted_s == plain_s


def test_dead_letter_capture(spark, tmp_path):
    from synch_spark.config import SyncConfig
    from synch_spark.streaming.pipeline import CdcPipeline

    cfg = SyncConfig()
    cfg.add_table(TableSpec(schema="db", table="t", pk=("id",)))
    vs = T.StructType([T.StructField("id", T.LongType())])
    pipe = CdcPipeline(
        spark=spark, cfg=cfg, warehouse=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ck"), value_schemas={"db.t": vs},
    )
    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    with open(events_dir / "b.json", "w") as f:
        f.write(json.dumps({"schema": "db", "table": "t", "action": "insert",
                            "before": None, "after": json.dumps({"id": 1}),
                            "event_unixtime": 1}) + "\n")
        f.write('{"garbage: true\n')
    q = pipe.start_file_stream(str(events_dir), available_now=True)
    q.awaitTermination(120)
    assert ParquetTable(spark, f"{pipe.warehouse}/db/t").read().count() == 1
    dead = ParquetTable(spark, f"{pipe.warehouse}/_synch_dead_letter").read()
    assert dead.count() == 1


def test_debezium_decode_parity(spark):
    """A realistic Debezium envelope stream decodes into EXACTLY the
    rows the native raw-event path produces for the same changes —
    through the full T1 split + typed parse. Covers both
    schemas.enable settings, ts_us vs ts_ms precedence, snapshot 'r'
    ops, and tombstone/heartbeat dropping."""
    import json as _json

    from pyspark.sql import types as T

    from synch_spark.events import (
        RAW_EVENT_SCHEMA,
        debezium_to_raw,
        parse_values,
        split_updates,
    )

    def envelope(op, before, after, ts_ms, wrapped=True, ts_us=None):
        src = {"db": "db", "table": "t", "ts_ms": ts_ms}
        if ts_us is not None:
            src["ts_us"] = ts_us
        payload = {"op": op, "before": before, "after": after,
                   "source": src, "ts_ms": ts_ms + 5}  # envelope ts differs
        return _json.dumps({"payload": payload} if wrapped else payload)

    values = [
        envelope("c", None, {"id": 1, "v": "a"}, 1000),
        envelope("r", None, {"id": 2, "v": "b"}, 2000, wrapped=False),
        envelope("u", {"id": 1, "v": "a"}, {"id": 1, "v": "z"}, 3000,
                 ts_us=3000123),
        envelope("d", {"id": 2, "v": "b"}, None, 4000),
        '{"payload": null}',          # tombstone
        '{"op": null, "ts_ms": 1}',   # heartbeat-ish
    ]
    dbz = debezium_to_raw(
        spark.createDataFrame([(v,) for v in values], "value string")
    )
    # the same changes through the engine's native raw-event form
    native_rows = [
        ("db", "t", "insert", None, '{"id": 1, "v": "a"}', 1000000),
        ("db", "t", "insert", None, '{"id": 2, "v": "b"}', 2000000),
        ("db", "t", "update", '{"id": 1, "v": "a"}', '{"id": 1, "v": "z"}',
         3000123),
        ("db", "t", "delete", '{"id": 2, "v": "b"}', None, 4000000),
    ]
    native = spark.createDataFrame(native_rows, RAW_EVENT_SCHEMA)

    vschema = T.StructType([T.StructField("id", T.LongType()),
                            T.StructField("v", T.StringType())])

    def final(raw):
        return sorted(
            map(tuple, parse_values(split_updates(raw), vschema).collect())
        )

    got, want = final(dbz), final(native)
    assert got == want
    assert len(got) == 5  # c + r + (u -> delete+insert) + d
    # microsecond precision: ts_us wins over ts_ms*1000
    assert {r[3] for r in got} == {1000000, 2000000, 3000123, 4000000}


def test_debezium_precise_mode_types(spark):
    """Debezium DEFAULT connector config ships logical types encoded:
    decimal.handling.mode=precise -> DECIMAL as base64 of the big-endian
    two's-complement unscaled int; time.precision.mode=adaptive ->
    DATE as epoch days, DATETIME as epoch millis or micros. The typed
    parse with debezium_types=True must decode all of them to EXACTLY
    the values a string-mode connector (README-recommended config)
    produces — the reference's canonical table is
    test(id int PK, amount decimal(10,2)) (/root/reference/conftest.py:
    24-33), so a real migration hits this immediately."""
    import base64 as _b64
    import datetime as _dt
    import json as _json
    from decimal import Decimal

    from pyspark.sql import types as T

    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates

    def unscaled_b64(unscaled: int) -> str:
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return _b64.b64encode(unscaled.to_bytes(nbytes, "big", signed=True)).decode()

    # (id, amount, d, ts): precise/adaptive wire values vs string-mode
    cases = [
        (1, 12345, "123.45", 19492, "2023-05-15", 1684144800123,
         "2023-05-15 10:00:00.123"),                      # DATETIME(3) = millis
        (2, -65, "-0.65", 0, "1970-01-01", 1684144800123456,
         "2023-05-15 10:00:00.123456"),                   # DATETIME(6) = micros
        (3, 9999999999, "99999999.99", -365, "1969-01-01", 0, "1970-01-01 00:00:00"),
        (4, None, None, None, None, None, None),          # null row
    ]

    def raw(rows):
        data = [("db", "t", "insert", None, _json.dumps(
            {"id": i, "amount": a, "d": d, "ts": ts}), 1000)
            for i, a, d, ts in rows]
        return spark.createDataFrame(data, RAW_EVENT_SCHEMA)

    precise = raw([(i, None if u is None else unscaled_b64(u), d_days, ts_int)
                   for i, u, _, d_days, _, ts_int, _ in cases])
    stringm = raw([(i, a_str, d_str, ts_str)
                   for i, _, a_str, _, d_str, _, ts_str in cases])

    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DecimalType(10, 2)),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
    ])

    def final(r):
        return sorted(map(tuple, parse_values(
            split_updates(r), vschema, debezium_types=True).collect()))

    got, want = final(precise), final(stringm)
    assert got == want, f"precise-mode decode diverged:\n{got}\nvs\n{want}"
    by_id = {r[5]: r for r in got}  # schema,table,action,ts,seq, id, amount, d, ts
    assert by_id[1][6] == Decimal("123.45")
    assert by_id[2][6] == Decimal("-0.65")
    assert by_id[3][6] == Decimal("99999999.99")
    assert by_id[1][7] == _dt.date(2023, 5, 15)
    assert by_id[3][7] == _dt.date(1969, 1, 1)
    assert by_id[1][8] == _dt.datetime(2023, 5, 15, 10, 0, 0, 123000)
    assert by_id[2][8] == _dt.datetime(2023, 5, 15, 10, 0, 0, 123456)
    assert all(v is None for v in by_id[4][6:9])
    # the native (non-debezium) parse path is byte-identical for plain JSON
    nat = sorted(map(tuple, parse_values(
        split_updates(stringm), vschema).collect()))
    assert nat == want
    # >8-byte unscaled (precision > 18) decodes to NULL — documented
    # boundary; README mandates decimal.handling.mode=string for those
    wide = raw([(9, unscaled_b64(10**20), None, None)])
    w = parse_values(split_updates(wide), vschema, debezium_types=True).collect()
    assert w[0]["amount"] is None


def test_debezium_precise_wide_decimals_two_limb(spark):
    """Precise-mode DECIMAL beyond 8 unscaled bytes (precision up to
    38): the two-limb decode must round-trip EXACTLY, including
    negatives (two's-complement identity per limb — no 2^128 term that
    would overflow decimal(38)) and values at the 1/8/9/16-byte
    boundaries. >16 bytes cannot encode a legal DECIMAL(38) minimally
    and decodes NULL."""
    import base64 as _b64
    import json as _json
    from decimal import Decimal

    from pyspark.sql import types as T

    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates

    def b64(unscaled: int) -> str:
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return _b64.b64encode(unscaled.to_bytes(nbytes, "big", signed=True)).decode()

    unscaled_vals = [
        0, 1, -1, 127, -128, 255, -256,                      # 1-2 bytes
        2**63 - 1, -(2**63), 2**63, -(2**63) - 1,            # 8/9-byte boundary
        2**64 - 1, 2**64, -(2**64),                          # limb boundary
        10**19, -(10**19), 10**25 + 7, -(10**25 + 7),        # mid-range wide
        10**38 - 1, -(10**38 - 1),                           # 16-byte extremes
        2**119, -(2**119),                                   # minimal-16-byte edge
    ]
    scale = 4
    rows = [("db", "t", "insert", None,
             _json.dumps({"id": i, "amount": b64(u)}), 1000)
            for i, u in enumerate(unscaled_vals)]
    raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DecimalType(38, scale)),
    ])
    got = {r["id"]: r["amount"] for r in parse_values(
        split_updates(raw), vschema, debezium_types=True).collect()}
    for i, u in enumerate(unscaled_vals):
        # string construction, not division/scaleb: both apply the
        # default 28-digit context and would corrupt the reference
        want = Decimal(f"{u}E-{scale}")
        assert got[i] == want, f"unscaled {u}: got {got[i]}, want {want}"
    # scale-0 path too (no division branch)
    vschema0 = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DecimalType(38, 0)),
    ])
    got0 = {r["id"]: r["amount"] for r in parse_values(
        split_updates(raw), vschema0, debezium_types=True).collect()}
    for i, u in enumerate(unscaled_vals):
        assert got0[i] == Decimal(u)
    # 17-byte payload -> NULL (not a legal minimal DECIMAL(38) encoding)
    over = spark.createDataFrame(
        [("db", "t", "insert", None, _json.dumps(
            {"id": 0, "amount": _b64.b64encode(b"\x01" + b"\x00" * 16).decode()}),
          1000)], RAW_EVENT_SCHEMA)
    w = parse_values(split_updates(over), vschema, debezium_types=True).collect()
    assert w[0]["amount"] is None


def test_debezium_precise_padded_encodings_decode(spark):
    """Non-minimal (fixed-width / zero- or sign-extended) precise-mode
    encodings must decode identically to the minimal form on BOTH the
    narrow (<=18) and wide decimal paths — producers other than
    Debezium may pad."""
    import base64 as _b64
    import json as _json
    from decimal import Decimal

    from pyspark.sql import types as T

    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates

    def b64pad(u: int, width: int) -> str:
        return _b64.b64encode(u.to_bytes(width, "big", signed=True)).decode()

    cases = [  # (unscaled, padded width)
        (12345, 9), (12345, 16), (-532611, 9), (-532611, 16),
        (0, 16), (-1, 16), (2**53, 12),
    ]
    rows = [("db", "t", "insert", None,
             _json.dumps({"id": i, "amount": b64pad(u, w)}), 1000)
            for i, (u, w) in enumerate(cases)]
    raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    for prec in (10, 19):
        vschema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DecimalType(max(prec, 19), 2)
                          if prec > 18 else T.DecimalType(18, 2)),
        ])
        got = {r["id"]: r["amount"] for r in parse_values(
            split_updates(raw), vschema, debezium_types=True,
            decimal_mode="precise").collect()}
        for i, (u, _w) in enumerate(cases):
            want = Decimal(u).scaleb(-2)
            assert got[i] == want, f"prec={prec} unscaled={u}: {got[i]}"

def test_debezium_precise_decimal_overflow_window_nulls(spark):
    """Magnitudes just past 10^38 whose 16-byte payload has every
    digit-power table entry individually legal (top nibble <= 4): the
    fold's PARTIAL SUM is what overflows, and under ANSI a plain add
    would kill the micro-batch before any outer try_cast ran. try_add
    nulls it instead — the over-precision-payload -> NULL contract."""
    import base64 as _b64
    import json as _json

    from pyspark.sql import types as T

    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates

    def b64(unscaled: int) -> str:
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return _b64.b64encode(
            unscaled.to_bytes(nbytes, "big", signed=True)).decode()

    bad = [10**38, -(10**38), 10**38 + 12345, int(1.05e38)]
    good = 10**38 - 1
    rows = [("db", "t", "insert", None,
             _json.dumps({"id": i, "amount": b64(u)}), 1000)
            for i, u in enumerate(bad + [good])]
    raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DecimalType(38, 0)),
    ])
    got = {r["id"]: r["amount"] for r in parse_values(
        split_updates(raw), vschema, debezium_types=True).collect()}
    for i in range(len(bad)):
        assert got[i] is None, f"unscaled {bad[i]} must NULL, got {got[i]}"
    from decimal import Decimal
    assert got[len(bad)] == Decimal(good), "legal extreme must still decode"

def test_debezium_to_raw_poison_timestamp_drops_not_raises(spark):
    """A malformed ts_ms (non-numeric / object) must drop through the
    null filter — a plain cast would ANSI-kill the batch and crash-loop
    the checkpoint on one poison record."""
    import json as _json

    from synch_spark.events import debezium_to_raw

    rows = [
        (_json.dumps({"payload": {"op": "c", "ts_ms": "n/a",
                                  "source": {"db": "d", "table": "t"},
                                  "after": {"id": 1}}}),),
        (_json.dumps({"payload": {"op": "c", "ts_ms": 1700000000000,
                                  "source": {"db": "d", "table": "t"},
                                  "after": {"id": 2}}}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = debezium_to_raw(df, "value").collect()
    assert len(got) == 1
    import json as _j
    assert _j.loads(got[0]["after"])["id"] == 2


def test_wal2json_fallback_stamps_are_ordered(spark):
    """Without include-timestamp every event used to get ONE frozen
    fallback stamp — two updates to the same pk tied and last-wins
    picked arbitrarily. Stamps must ascend in file order."""
    import json as _json

    from synch_spark.events import wal2json_to_raw

    def line(v):
        return _json.dumps({"change": [{
            "kind": "update", "schema": "db", "table": "t",
            "columnnames": ["id", "v"], "columnvalues": ["1", str(v)],
            "oldkeys": {"keynames": ["id"], "keyvalues": ["1"]}}]})

    df = spark.createDataFrame([(line(1),), (line(2),)], "value string") \
        .coalesce(1)
    got = wal2json_to_raw(df, fallback_unixtime_us=10**15).orderBy(
        "event_unixtime").collect()
    assert len(got) == 2
    s0, s1 = got[0]["event_unixtime"], got[1]["event_unixtime"]
    assert s0 != s1, "fallback stamps tied: last-wins is arbitrary"
    assert s0 < s1
    import json as _j
    assert _j.loads(got[1]["after"])["v"] == "2", "file order not preserved"


def test_parse_values_rejects_string_plus_debezium(spark):
    import pytest as _pt
    from pyspark.sql import types as T

    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values

    df = spark.createDataFrame([], RAW_EVENT_SCHEMA)
    vschema = T.StructType([T.StructField("id", T.LongType())])
    with _pt.raises(ValueError, match="mutually exclusive"):
        parse_values(df, vschema, debezium_types=True, string_values=True)


def test_precise_mode_overprecision_and_empty_payloads_null(spark):
    """In precise mode the bytes are authoritative: an over-precision
    payload whose base64 text happens to be all digits must decode NULL
    — never fall through to the numeric read of its TEXT. An empty
    string must decode NULL, not a fabricated 0."""
    import base64 as _b64
    import json as _json

    from pyspark.sql import types as T

    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates

    # 9-byte payload whose 12-char base64 is all digits
    payload = _b64.b64decode("123456789012")
    assert len(payload) == 9
    b64 = _b64.b64encode(payload).decode()
    assert b64 == "123456789012" and b64.isdigit()
    rows = [("db", "t", "insert", None,
             _json.dumps({"id": 0, "amount": b64}), 1000),
            ("db", "t", "insert", None,
             _json.dumps({"id": 1, "amount": ""}), 1000),
            ("db", "t", "insert", None,  # genuinely non-base64: plain read
             _json.dumps({"id": 2, "amount": "12.5"}), 1000)]
    raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DecimalType(18, 2)),  # 9 bytes >> 18 digits
    ])
    got = {r["id"]: r["amount"] for r in parse_values(
        split_updates(raw), vschema, debezium_types=True,
        decimal_mode="precise").collect()}
    assert got[0] is None, f"base64 text misread as number: {got[0]}"
    assert got[1] is None, f"empty payload fabricated a value: {got[1]}"
    from decimal import Decimal
    assert got[2] == Decimal("12.50")


def test_raw_from_kafka_values_formats(spark):
    """The Kafka value decode matrix: this engine's raw JSON, Debezium
    envelopes, and bare wal2json payloads (a pg_recvlogical/slot-to-
    Kafka bridge) all land in RAW_EVENT_SCHEMA through one pure helper
    — testable without the connector jar."""
    import json as _json

    from synch_spark.streaming.pipeline import raw_from_kafka_values

    raw_val = _json.dumps({
        "schema": "db", "table": "t", "action": "insert", "before": None,
        "after": _json.dumps({"id": 1}), "event_unixtime": 42})
    df = spark.createDataFrame([(raw_val,)], "value string")
    got = raw_from_kafka_values(df, "raw").collect()[0]
    assert (got["schema"], got["action"], got["event_unixtime"]) == (
        "db", "insert", 42)

    w2j = _json.dumps({
        "action": "I", "schema": "db", "table": "t",
        "timestamp": "2024-01-01 00:00:01.000000+00",
        "columns": [{"name": "id", "value": 1}]})
    got = raw_from_kafka_values(
        spark.createDataFrame([(w2j,)], "value string"), "wal2json"
    ).collect()[0]
    assert got["action"] == "insert"
    assert _json.loads(got["after"]) == {"id": "1"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="value_format"):
        raw_from_kafka_values(df, "avro")
