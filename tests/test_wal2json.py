"""wal2json envelope decode (S6 offline path) and the replay-wal CLI."""

from __future__ import annotations

import json

from synch_spark.events import wal2json_to_raw


def _payload(*changes, timestamp=None):
    p = {"change": list(changes)}
    if timestamp:
        p["timestamp"] = timestamp
    return json.dumps(p)


def _ins(tbl="test", **cols):
    return {"kind": "insert", "schema": "public", "table": tbl,
            "columnnames": list(cols), "columnvalues": list(cols.values())}


def test_wal2json_decode_kinds(spark):
    """insert/update/delete map to the reference's event dicts
    (reader/postgres.py:87-126): insert/update carry the zipped column
    object, delete carries oldkeys; update's before is the replica-
    identity key image (what a pk change needs to delete the right
    row)."""
    lines = [
        _payload(_ins(id=1, amount="10.50", name="a"),
                 timestamp="2024-03-01 12:00:00.123456+00"),
        _payload({"kind": "update", "schema": "public", "table": "test",
                  "columnnames": ["id", "amount", "name"],
                  "columnvalues": [1, "11.00", "a2"],
                  "oldkeys": {"keynames": ["id"], "keyvalues": [1]}},
                 timestamp="2024-03-01 12:00:01+00"),
        _payload({"kind": "delete", "schema": "public", "table": "test",
                  "oldkeys": {"keynames": ["id"], "keyvalues": [1]}},
                 timestamp="2024-03-01 12:00:02+00"),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    out = wal2json_to_raw(df).orderBy("event_unixtime").collect()
    assert [r["action"] for r in out] == ["insert", "update", "delete"]
    ins, upd, dele = out
    assert json.loads(ins["after"]) == {"id": "1", "amount": "10.50", "name": "a"}
    assert ins["before"] is None
    assert ins["event_unixtime"] == 1709294400123456
    assert json.loads(upd["before"]) == {"id": "1"}
    assert json.loads(upd["after"])["amount"] == "11.00"
    assert dele["after"] is None and json.loads(dele["before"]) == {"id": "1"}
    assert all(r["schema"] == "public" and r["table"] == "test" for r in out)


def test_wal2json_multi_change_and_fallback_time(spark):
    """One transaction payload = many changes (explode), and a payload
    without include-timestamp falls back to the supplied stamp PLUS a
    monotone per-event sequence — a frozen constant would tie every
    no-timestamp event and last-wins would pick arbitrarily."""
    df = spark.createDataFrame(
        [(_payload(_ins(id=1), _ins(id=2), _ins(tbl="other", id=3)),)],
        "value string")
    out = wal2json_to_raw(df, fallback_unixtime_us=42).orderBy(
        "event_unixtime").collect()
    assert len(out) == 3
    stamps = [r["event_unixtime"] for r in out]
    assert all(s >= 42 for s in stamps)
    assert len(set(stamps)) == 3, "fallback stamps must not tie"
    assert stamps == sorted(stamps)
    # intra-transaction order preserved: id=1 before id=2 before id=3
    assert [r["table"] for r in out] == ["test", "test", "other"]


def test_wal2json_typed_apply(spark):
    """String-encoded wire values parse into typed columns through the
    normal parse_values path (numbers, decimals, timestamps)."""
    from pyspark.sql import types as T

    from synch_spark.events import parse_values, split_updates

    df = spark.createDataFrame(
        [(_payload(_ins(id=7, amount="12.34", ts="2024-01-01 00:00:00")),)],
        "value string")
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DecimalType(10, 2)),
        T.StructField("ts", T.TimestampType()),
    ])
    row = parse_values(
        split_updates(wal2json_to_raw(df, fallback_unixtime_us=1)), vschema,
        string_values=True,
    ).collect()[0]
    assert (row["id"], str(row["amount"])) == (7, "12.34")
    assert row["ts"].year == 2024


def test_cli_replay_wal_to_consume(spark, tmp_path):
    """CLI e2e: replay-wal decodes a pg_recvlogical dump into the spool
    and consume applies it — the PG analog of replay-binlog."""
    import yaml
    from pyspark.sql import types as T

    from synch_spark.cli import main

    dump = "\n".join([
        _payload(_ins(id=1, name="a"), _ins(id=2, name="b"),
                 timestamp="2024-03-01 00:00:00+00"),
        _payload({"kind": "update", "schema": "public", "table": "test",
                  "columnnames": ["id", "name"], "columnvalues": [2, "b2"],
                  "oldkeys": {"keynames": ["id"], "keyvalues": [2]}},
                 timestamp="2024-03-01 00:00:01+00"),
        _payload({"kind": "delete", "schema": "public", "table": "test",
                  "oldkeys": {"keynames": ["id"], "keyvalues": [1]}},
                 timestamp="2024-03-01 00:00:02+00"),
    ])
    d = tmp_path / "wal"
    d.mkdir()
    (d / "changes.jsonl").write_text(dump + "\n")
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "public", "tables": [
            {"table": "test", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "events_dir": str(tmp_path / "events"),
            "value_schemas": {"public.test": vschema.jsonValue()},
            "value_parse": "string",
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "replay-wal", "--path", str(d)]) == 0
    assert main(["--config", str(p), "consume", "--available-now"]) == 0

    from synch_spark.sources.table import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "wh" / "public" / "test"))
    rows = sorted((r["id"], r["name"]) for r in t.read().collect())
    assert rows == [(2, "b2")]


def test_wal2json_format_version_2(spark):
    """wal2json format-version 2 emits one message PER ROW ({"action":
    "I|U|D", "columns": [{name,type,value}], "identity": [...]}) with
    B/C transaction framing — the form `pg_recvlogical -o
    format-version=2` produces. The decoder auto-detects per line, so
    mixed v1/v2 spools (a mid-stream plugin upgrade) decode correctly."""
    v2 = [
        json.dumps({"action": "B"}),
        json.dumps({"action": "I", "schema": "public", "table": "test",
                    "timestamp": "2024-03-01 12:00:00.123456+00",
                    "columns": [
                        {"name": "id", "type": "integer", "value": 1},
                        {"name": "amount", "type": "numeric", "value": "10.50"},
                        {"name": "name", "type": "text", "value": "a"}]}),
        json.dumps({"action": "U", "schema": "public", "table": "test",
                    "timestamp": "2024-03-01 12:00:01+00",
                    "columns": [
                        {"name": "id", "type": "integer", "value": 1},
                        {"name": "amount", "type": "numeric", "value": "11.00"},
                        {"name": "name", "type": "text", "value": "a2"}],
                    "identity": [
                        {"name": "id", "type": "integer", "value": 1}]}),
        json.dumps({"action": "D", "schema": "public", "table": "test",
                    "timestamp": "2024-03-01 12:00:02+00",
                    "identity": [
                        {"name": "id", "type": "integer", "value": 1}]}),
        json.dumps({"action": "C"}),
    ]
    # plus one v1 transaction payload in the same spool
    v1 = _payload(_ins(id=9, amount="1.00", name="z"),
                  timestamp="2024-03-01 11:00:00+00")
    df = spark.createDataFrame([(x,) for x in v2 + [v1]], "value string")
    out = wal2json_to_raw(df).orderBy("event_unixtime").collect()
    assert [r["action"] for r in out] == ["insert", "insert", "update", "delete"]
    mixed_v1, ins, upd, dele = out
    assert json.loads(mixed_v1["after"])["id"] == "9"  # v1 line decoded too
    assert json.loads(ins["after"]) == {"id": "1", "amount": "10.50", "name": "a"}
    assert ins["event_unixtime"] == 1709294400123456
    assert json.loads(upd["before"]) == {"id": "1"}
    assert json.loads(upd["after"])["amount"] == "11.00"
    assert dele["after"] is None and json.loads(dele["before"]) == {"id": "1"}


def test_cli_replay_wal_pgoutput_frames_to_consume(spark, tmp_path):
    """CLI e2e: replay-wal --plugin pgoutput replays a binary frame
    archive distributed (one file per task, exact Begin commit
    timestamps) into the spool, and consume applies it — the pgoutput
    analog of the wal2json path above. --follow with pgoutput is
    refused (frame files are not safely cuttable mid-write)."""
    import yaml
    from pyspark.sql import types as T

    from synch_spark.cli import main
    from synch_spark.sources.pgoutput import write_pgoutput_frames
    from tests.test_pgoutput import (
        enc_begin,
        enc_commit,
        enc_delete,
        enc_insert,
        enc_relation,
        enc_update,
    )

    rel = enc_relation(16501, "public", "test",
                       [(1, "id", 20, -1), (0, "name", 25, -1)])
    ts0 = 1_709_251_200_000_000  # 2024-03-01T00:00:00Z
    d = tmp_path / "wal"
    d.mkdir()
    write_pgoutput_frames(str(d / "round.000001.pgo"), [
        rel, enc_begin(ts0),
        enc_insert(16501, ["1", "a"]),
        enc_insert(16501, ["2", "b"]),
        enc_commit()])
    write_pgoutput_frames(str(d / "round.000002.pgo"), [
        rel, enc_begin(ts0 + 1_000_000),
        enc_update(16501, ["2", "b2"], old=["2", None], old_kind=b"K"),
        enc_commit(),
        enc_begin(ts0 + 2_000_000),
        enc_delete(16501, ["1", None]),
        enc_commit()])
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "public", "tables": [
            {"table": "test", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "events_dir": str(tmp_path / "events"),
            "value_schemas": {"public.test": vschema.jsonValue()},
            "value_parse": "string",
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "replay-wal", "--path", str(d),
                 "--plugin", "pgoutput"]) == 0
    assert main(["--config", str(p), "consume", "--available-now"]) == 0

    from synch_spark.sources.table import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "wh" / "public" / "test"))
    rows = sorted((r["id"], r["name"]) for r in t.read().collect())
    assert rows == [(2, "b2")]

    assert main(["--config", str(p), "replay-wal", "--path", str(d),
                 "--plugin", "pgoutput", "--follow"]) == 2


def test_wal2json_truncate_maps_to_ddl_barrier(spark):
    """wal2json truncate (v1 kind:"truncate", v2 action:"T") maps to
    the repo's DDL-barrier convention — action "query" with
    after={"query": "TRUNCATE schema.table"} — the same shape a binlog
    QUERY event and a pgoutput Truncate message produce, so the
    streaming barrier empties the target on all three sources."""
    import json as _json

    from synch_spark.events import wal2json_to_raw

    v1 = _json.dumps({"change": [
        {"kind": "truncate", "schema": "public", "table": "t"}]})
    v2 = _json.dumps({"action": "T", "schema": "public", "table": "t"})
    got = wal2json_to_raw(
        spark.createDataFrame([(v1,), (v2,)], "value string")).collect()
    assert len(got) == 2
    for r in got:
        assert r["action"] == "query" and r["before"] is None
        assert _json.loads(r["after"])["query"] == "TRUNCATE public.t"


def test_cli_replay_wal_pgoutput_parallel_archive(spark, tmp_path, capsys):
    """An archive written by a PG 16 parallel-streaming tail carries
    WIDENED (v4) Stream Abort frames: without the flag the replay
    misparses at the abort; with --streaming-parallel (or the same
    config the tail used) it decodes and the aborted subtransaction's
    rows are excised."""
    import json as _json

    import yaml

    from synch_spark.cli import main
    from synch_spark.sources.pgoutput import write_pgoutput_frames
    from tests.test_pgoutput import (
        enc_insert,
        enc_relation,
        enc_stream_abort_v4,
        enc_stream_commit,
        enc_stream_start,
        enc_stream_stop,
        _xid_prefixed,
    )

    rel = enc_relation(16601, "public", "t", [(1, "id", 20, -1)])
    ts0 = 1_709_251_200_000_000
    d = tmp_path / "wal"
    d.mkdir()
    write_pgoutput_frames(str(d / "round.000001.pgo"), [
        rel,
        enc_stream_start(700),
        _xid_prefixed(enc_insert(16601, ["1"]), 700),
        _xid_prefixed(enc_insert(16601, ["2"]), 701),  # subxact
        enc_stream_stop(),
        enc_stream_abort_v4(700, subxid=701),          # v4 width
        enc_stream_commit(700, ts0)])
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "public", "tables": [
            {"table": "t", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "events_dir": str(tmp_path / "events"),
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "replay-wal", "--plugin", "pgoutput",
                 "--path", str(d), "--streaming-parallel"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["wal_replay_events"] == 1, \
        "subxact 701 aborted; only xid-700's row survives"
    # the same archive decoded WITHOUT the flag misparses LOUDLY (the
    # 16 extra abort bytes read as a bogus message type) — never a
    # silent wrong answer
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown pgoutput message"):
        main(["--config", str(p), "replay-wal", "--plugin", "pgoutput",
              "--path", str(d)])
