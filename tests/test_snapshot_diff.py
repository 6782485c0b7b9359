"""Snapshot-diff CDC source: diff -> events -> apply == new snapshot."""

from __future__ import annotations

from pyspark.sql import types as T

from synch_spark.config import Engine, TableSpec
from synch_spark.events import parse_values, split_updates
from synch_spark.operators.cdc_apply import apply_cdc_batch, read_current_state
from synch_spark.sources.snapshot_diff import diff_snapshots
from synch_spark.sources.table import ParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("name", T.StringType()),
    ]
)


def test_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")], SCHEMA
    )
    new = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 9.0, "b"), (4, 4.0, "d")], SCHEMA
    )
    ev = diff_snapshots(old, new, ("id",), "db", "t", 100)
    got = {r["action"] for r in ev.collect()}
    assert got == {"insert", "delete", "update"}
    by_action = {r["action"]: r for r in ev.collect()}
    assert '"id":4' in by_action["insert"]["after"].replace(" ", "")
    assert '"id":3' in by_action["delete"]["before"].replace(" ", "")
    assert '"amount":9.0' in by_action["update"]["after"].replace(" ", "")
    assert ev.count() == 3  # unchanged row 1 emits nothing


from hypothesis import HealthCheck, given, settings, strategies as st
import pytest

table_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=12),  # pk space forces overlap
    st.tuples(st.integers(0, 99), st.sampled_from(["a", "b", "c"])),
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_map=table_strategy, new_map=table_strategy)
@pytest.mark.slow
def test_diff_apply_closure_property(spark, tmp_path_factory, old_map, new_map):
    """For ARBITRARY old/new states: apply(diff(old,new)) over old == new."""
    to_rows = lambda m: [(k, float(v[0]), v[1]) for k, v in m.items()]  # noqa: E731
    old = spark.createDataFrame(to_rows(old_map) or [(0, 0.0, "z")], SCHEMA)
    new = spark.createDataFrame(to_rows(new_map) or [(0, 0.0, "z")], SCHEMA)
    table = ParquetTable(spark, str(tmp_path_factory.mktemp("sdp")))
    table.overwrite(old)
    spec = TableSpec(schema="db", table="t", pk=("id",), engine=Engine.REPLACING_MERGE_TREE)
    ev = diff_snapshots(old, new, ("id",), "db", "t", 100)
    if ev.limit(1).count() > 0:
        apply_cdc_batch(table, parse_values(split_updates(ev), SCHEMA), spec)
    got = {(r["id"], r["amount"], r["name"]) for r in read_current_state(table, spec).collect()}
    want = {(r["id"], r["amount"], r["name"]) for r in new.collect()}
    assert got == want


def test_diff_then_apply_reproduces_target(spark, tmp_path):
    """The CDC closure property: apply(diff(old, new)) over old == new."""
    old = spark.createDataFrame(
        [(i, float(i), f"n{i}") for i in range(1, 50)], SCHEMA
    )
    new = spark.createDataFrame(
        [(i, float(i) * (2 if i % 7 == 0 else 1), f"n{i}")
         for i in range(1, 50) if i % 11 != 0]
        + [(100, 1.5, "brand-new")],
        SCHEMA,
    )
    spec = TableSpec(schema="db", table="t", pk=("id",), engine=Engine.REPLACING_MERGE_TREE)
    table = ParquetTable(spark, str(tmp_path / "t"))
    table.overwrite(old)
    events = diff_snapshots(old, new, ("id",), "db", "t", 100)
    typed = parse_values(split_updates(events), SCHEMA)
    apply_cdc_batch(table, typed, spec)
    got = {(r["id"], r["amount"], r["name"]) for r in read_current_state(table, spec).collect()}
    want = {(r["id"], r["amount"], r["name"]) for r in new.collect()}
    assert got == want
