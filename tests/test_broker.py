"""Broker boundary (broker.py): distributed spool write + Kafka producer
contract (B1/B3, ref synch/broker/kafka.py:21-33)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from synch_spark.broker import (
    EVENT_COLUMNS,
    kafka_payload,
    produce_to_kafka,
    write_event_spool,
)
from synch_spark.events import RAW_EVENT_SCHEMA


def _events(spark, n=50, npart=4):
    return (
        spark.range(n)
        .repartition(npart)
        .select(
            F.lit("db").alias("schema"),
            F.lit("t").alias("table"),
            F.lit("insert").alias("action"),
            F.lit(None).cast("string").alias("before"),
            F.to_json(F.struct(F.col("id"))).alias("after"),
            (F.lit(1_000_000) + F.col("id")).alias("event_unixtime"),
        )
    )


def test_spool_write_is_distributed_and_consumer_readable(spark, tmp_path):
    """Multi-partition frame -> multiple spool files, atomic-renamed into
    events_dir; reading them back through RAW_EVENT_SCHEMA recovers every
    event. No staging residue, no driver-side row materialization."""
    events_dir = str(tmp_path / "events")
    nfiles = write_event_spool(_events(spark, 50, 4), events_dir, "db.t.123")
    assert nfiles >= 2, "a multi-partition frame must spool to multiple files"
    names = sorted(os.listdir(events_dir))
    assert all(n.startswith("db.t.123.") and n.endswith(".json") for n in names)
    assert not any(n.startswith("_staging") for n in names)

    back = spark.read.schema(RAW_EVENT_SCHEMA).json(events_dir)
    assert back.count() == 50
    row = back.orderBy("event_unixtime").first()
    assert row["action"] == "insert" and json.loads(row["after"])["id"] == 0
    assert row["before"] is None


def test_spool_write_empty_frame(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    nfiles = write_event_spool(_events(spark, 50, 4).limit(0), events_dir, "db.t.9")
    assert nfiles == 0
    assert not [n for n in os.listdir(events_dir) if n.endswith(".json")]


def test_kafka_payload_contract(spark):
    """Reference parity: topic {prefix}.{schema}, key = schema name,
    value = full event JSON parseable back through RAW_EVENT_SCHEMA."""
    pay = kafka_payload(_events(spark, 3, 1), queue_prefix="synch")
    assert pay.columns == ["key", "value", "topic"]
    rows = pay.collect()
    assert {r["topic"] for r in rows} == {"synch.db"}
    assert {r["key"] for r in rows} == {"db"}
    v = json.loads(rows[0]["value"])
    assert set(v) <= set(EVENT_COLUMNS)
    assert v["schema"] == "db" and v["table"] == "t" and v["action"] == "insert"
    parsed = (
        spark.createDataFrame([(r["value"],) for r in rows], "value string")
        .select(F.from_json("value", RAW_EVENT_SCHEMA).alias("e"))
        .select("e.*")
    )
    assert parsed.count() == 3 and parsed.first()["event_unixtime"] is not None


def test_produce_to_kafka_reports_missing_connector(spark):
    """This container ships no kafka connector jar: the produce path must
    fail with an actionable message, not a raw classpath stack."""
    with pytest.raises(RuntimeError, match="spark-sql-kafka connector"):
        produce_to_kafka(_events(spark, 2, 1), "localhost:9092")

@pytest.mark.slow
def test_spool_never_overwrites_consumed_paths(spark, tmp_path):
    """FileStreamSource dedups processed files BY PATH: os.replace onto
    an existing spool file makes its new content invisible forever. An
    identical re-run skips (idempotent); different content publishes
    under a fresh unique path the consumer WILL pick up."""
    import glob

    from synch_spark.broker import write_event_spool

    ev = tmp_path / "events"
    df1 = spark.createDataFrame(
        [("db", "t", "insert", None, '{"id": 1}', 100)],
        "schema string, table string, action string, before string, "
        "after string, event_unixtime long").coalesce(1)
    n1 = write_event_spool(df1, str(ev), "replay.batch")
    assert n1 == 1
    files1 = set(glob.glob(str(ev / "*.json")))
    # identical re-run: no new file, nothing clobbered
    assert write_event_spool(df1, str(ev), "replay.batch") == 0
    assert set(glob.glob(str(ev / "*.json"))) == files1
    # changed content, same basename: a NEW path appears
    df2 = spark.createDataFrame(
        [("db", "t", "insert", None, '{"id": 2}', 200)],
        df1.schema).coalesce(1)
    n2 = write_event_spool(df2, str(ev), "replay.batch")
    assert n2 == 1
    files2 = set(glob.glob(str(ev / "*.json")))
    assert files1 < files2 and len(files2) == 2
    # the original file's bytes are untouched; the new path has the
    # new content
    old = next(iter(files1))
    assert "id\\\": 1" in open(old).read()
    assert any("id\\\": 2" in open(f).read() for f in files2 - files1)


def test_spool_multipart_rerun_is_idempotent(spark, tmp_path):
    """Multi-part batches: an identical re-run must skip EVERY part —
    the skip path has to advance the part index, or part k of the
    re-run compares against the wrong existing file and republishes
    already-consumed data under a fresh path (duplicates downstream)."""
    import glob

    from synch_spark.broker import write_event_spool

    ev = tmp_path / "events"
    rows = [("db", "t", "insert", None, f'{{"id": {i}}}', 100 + i)
            for i in range(8)]
    df = spark.createDataFrame(
        rows, "schema string, table string, action string, before string, "
        "after string, event_unixtime long").repartition(4)
    n1 = write_event_spool(df, str(ev), "multi.batch")
    assert n1 >= 2, "fixture must actually be multi-part"
    files1 = sorted(glob.glob(str(ev / "*.json")))
    assert write_event_spool(df, str(ev), "multi.batch") == 0
    assert sorted(glob.glob(str(ev / "*.json"))) == files1, \
        "identical multi-part re-run republished a part"
