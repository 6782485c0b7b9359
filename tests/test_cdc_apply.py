"""CDC apply correctness: replay synthetic event streams (FIXTURES F3/F4)
through apply_cdc_batch and assert final table state, mirroring the
reference's end-to-end ETL tests (/root/reference/tests/test_etl.py:10-36)
with parquet fixtures instead of live DBs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F, types as T

from synch_spark.config import Engine, TableSpec
from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates
from synch_spark.operators.cdc_apply import apply_cdc_batch, compact_batch, read_current_state
from synch_spark.sources.table import ParquetTable

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.StringType()),
    ]
)


def _raw(spark, rows):
    """rows: list of (action, before_dict|None, after_dict|None, us)."""
    data = [
        ("db", "sync_test", a, json.dumps(b) if b else None, json.dumps(af) if af else None, us)
        for (a, b, af, us) in rows
    ]
    return spark.createDataFrame(data, RAW_EVENT_SCHEMA)


def _typed(spark, rows):
    return parse_values(split_updates(_raw(spark, rows)), VALUE_SCHEMA)


def spec(engine=Engine.REPLACING_MERGE_TREE):
    return TableSpec(schema="db", table="sync_test", pk=("id",), engine=engine)


def test_update_split(spark):
    ev = split_updates(_raw(spark, [("update", {"id": 1, "amount": "1"}, {"id": 1, "amount": "2"}, 100)]))
    got = [(r["action"], r["action_seq"], r["event_unixtime"]) for r in ev.collect()]
    assert sorted(got) == [("delete", 1, 100), ("insert", 2, 100)]


def test_compact_last_wins(spark):
    # same pk touched 3x in one batch: final = last by (time, seq)
    ev = _typed(
        spark,
        [
            ("insert", None, {"id": 1, "amount": "1"}, 100),
            ("update", {"id": 1, "amount": "1"}, {"id": 1, "amount": "2"}, 200),
            ("update", {"id": 1, "amount": "2"}, {"id": 1, "amount": "3"}, 300),
        ],
    )
    net = compact_batch(ev, ("id",)).collect()
    assert len(net) == 1
    assert net[0]["action"] == "insert" and net[0]["amount"] == "3"


def test_merge_tree_delete_then_reinsert(spark, tmp_path):
    """Delete+reinsert of the same pk in one batch nets to the reinserted row
    (delete-before-insert flush order, continuous.py:122-135)."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    s = spec(Engine.MERGE_TREE)
    apply_cdc_batch(t, _typed(spark, [
        ("insert", None, {"id": 1, "amount": "10"}, 100),
        ("insert", None, {"id": 2, "amount": "20"}, 100),
    ]), s)
    apply_cdc_batch(t, _typed(spark, [
        ("delete", {"id": 1, "amount": "10"}, None, 200),
        ("insert", None, {"id": 1, "amount": "11"}, 300),
        ("delete", {"id": 2, "amount": "20"}, None, 300),
    ]), s)
    rows = {r["id"]: r["amount"] for r in read_current_state(t, s).collect()}
    assert rows == {1: "11"}


def test_replacing_upsert(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    s = spec()
    apply_cdc_batch(t, _typed(spark, [("insert", None, {"id": 1, "amount": "1"}, 100)]), s)
    apply_cdc_batch(t, _typed(spark, [
        ("update", {"id": 1, "amount": "1"}, {"id": 1, "amount": "9"}, 200),
        ("insert", None, {"id": 2, "amount": "2"}, 200),
    ]), s)
    rows = {r["id"]: r["amount"] for r in read_current_state(t, s).collect()}
    assert rows == {1: "9", 2: "2"}


def test_collapsing_append_and_view(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    s = spec(Engine.COLLAPSING_MERGE_TREE)
    apply_cdc_batch(t, _typed(spark, [
        ("insert", None, {"id": 1, "amount": "1"}, 100),
        ("insert", None, {"id": 2, "amount": "2"}, 100),
        ("update", {"id": 1, "amount": "1"}, {"id": 1, "amount": "5"}, 200),
        ("delete", {"id": 2, "amount": "2"}, None, 300),
    ]), s)
    # physical storage is append-only: 1 + 2(update) + 1 + 1 = 5 signed rows
    assert t.read().count() == 5
    rows = {r["id"]: r["amount"] for r in read_current_state(t, s).collect()}
    assert rows == {1: "5"}


def test_no_pk_appends_inserts_only(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    s = TableSpec(schema="db", table="sync_test", pk=(), engine=Engine.MERGE_TREE)
    apply_cdc_batch(t, _typed(spark, [
        ("insert", None, {"id": 1, "amount": "1"}, 100),
        ("delete", {"id": 1, "amount": "1"}, None, 200),
    ]), s)
    assert t.read().count() == 1  # delete skipped without a pk
