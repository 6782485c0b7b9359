"""Property-based CDC correctness: arbitrary event sequences applied through
the distributed engine must equal a trivially-correct sequential replay.

This is the strongest guard on the hard parts called out in SURVEY §7:
(event_unixtime, action_seq) ordering, update-split pairs, in-batch
last-wins dedup, delete-before-insert netting, and multi-batch merges.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from synch_spark.config import Engine, TableSpec
from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates
from synch_spark.operators.cdc_apply import apply_cdc_batch, read_current_state
from synch_spark.sources.table import ParquetTable

VALUE_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("amount", T.LongType())]
)

# small pk space forces heavy key collision; amounts distinguish versions
event_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=1, max_value=5),  # pk
        st.integers(min_value=0, max_value=999),  # amount
    ),
    min_size=1,
    max_size=30,
)


def sequential_replay(events):
    """Ground truth: the reference's single-threaded consumer semantics."""
    state: dict[int, int] = {}
    for action, pk, amount in events:
        if action == "delete":
            state.pop(pk, None)
        else:  # insert or update both upsert the after-image
            state[pk] = amount
    return state


def run_engine(spark, tmpdir, events, batch_splits):
    spec = TableSpec(schema="db", table="p", pk=("id",), engine=Engine.REPLACING_MERGE_TREE)
    table = ParquetTable(spark, tmpdir)
    batches = []
    prev = 0
    for cut in sorted(batch_splits) + [len(events)]:
        if cut > prev:
            batches.append(events[prev:cut])
            prev = cut
    us = 0
    for batch in batches:
        rows = []
        for action, pk, amount in batch:
            us += 1
            img = json.dumps({"id": pk, "amount": amount})
            rows.append(("db", "p", action, img, img, us))
        raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
        typed = parse_values(split_updates(raw), VALUE_SCHEMA)
        apply_cdc_batch(table, typed, spec)
    out = read_current_state(table, spec).select("id", "amount").collect()
    return {r["id"]: r["amount"] for r in out}


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=event_strategy,
    batch_splits=st.lists(st.integers(min_value=1, max_value=29), max_size=3),
)
@pytest.mark.slow
def test_cdc_apply_matches_sequential_replay(spark, tmp_path_factory, events, batch_splits):
    tmpdir = str(tmp_path_factory.mktemp("cdcprop"))
    expected = sequential_replay(events)
    got = run_engine(spark, tmpdir, events, batch_splits)
    assert got == expected


def make_valid(events):
    """Constrain to OLTP-legal sequences: insert only when absent,
    update/delete only when present (what a binlog actually emits — and
    what CollapsingMergeTree's sign bookkeeping requires)."""
    state, out = set(), []
    for action, pk, amount in events:
        if pk not in state:
            out.append(("insert", pk, amount))
            state.add(pk)
        elif action == "delete":
            out.append(("delete", pk, amount))
            state.discard(pk)
        else:
            out.append(("update", pk, amount))
    return out


def run_engine_with(spark, tmpdir, engine, events, batch_splits):
    spec = TableSpec(schema="db", table="p", pk=("id",), engine=engine)
    table = ParquetTable(spark, tmpdir)
    batches, prev = [], 0
    for cut in sorted(batch_splits) + [len(events)]:
        if cut > prev:
            batches.append(events[prev:cut])
            prev = cut
    us = 0
    for batch in batches:
        rows = []
        for action, pk, amount in batch:
            us += 1
            img = json.dumps({"id": pk, "amount": amount})
            rows.append(("db", "p", action, img, img, us))
        raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
        apply_cdc_batch(table, parse_values(split_updates(raw), VALUE_SCHEMA), spec)
    out = read_current_state(table, spec).select("id", "amount").collect()
    return {r["id"]: r["amount"] for r in out}


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=event_strategy,
    batch_splits=st.lists(st.integers(min_value=1, max_value=29), max_size=2),
)
@pytest.mark.slow
def test_all_engines_agree_on_valid_sequences(spark, tmp_path_factory, events, batch_splits):
    """The SAME legal change stream through MergeTree (physical deletes),
    Replacing (LWW dedup), and Collapsing (sign cancellation) must yield
    the same table state — the §2.7 semantics are interchangeable views
    of one history."""
    valid = make_valid(events)
    expected = sequential_replay(valid)
    for engine in (
        Engine.MERGE_TREE,
        Engine.REPLACING_MERGE_TREE,
        Engine.COLLAPSING_MERGE_TREE,
        Engine.VERSIONED_COLLAPSING_MERGE_TREE,
    ):
        tmpdir = str(tmp_path_factory.mktemp(f"eng_{engine.value}"))
        got = run_engine_with(spark, tmpdir, engine, valid, batch_splits)
        assert got == expected, f"{engine} diverged"


# --- composite-pk property --------------------------------------------------
COMPOSITE_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("id2", T.StringType()),
        T.StructField("amount", T.LongType()),
    ]
)

# small (id, id2) space forces collisions on BOTH key parts — the paths
# SURVEY §7 calls out as hard (tuple pk in dedup window, delete netting,
# merge key equality) must treat the tuple atomically, never id alone
composite_event_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=1, max_value=3),  # id
        st.sampled_from(["a", "b"]),  # id2
        st.integers(min_value=0, max_value=999),  # amount
    ),
    min_size=1,
    max_size=30,
)


def sequential_replay_composite(events):
    state = {}
    for action, pk1, pk2, amount in events:
        if action == "delete":
            state.pop((pk1, pk2), None)
        else:
            state[(pk1, pk2)] = amount
    return state


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=composite_event_strategy,
    batch_splits=st.lists(st.integers(min_value=1, max_value=29), max_size=3),
)
@pytest.mark.slow
def test_composite_pk_matches_sequential_replay(
    spark, tmp_path_factory, events, batch_splits
):
    tmpdir = str(tmp_path_factory.mktemp("cdccomp"))
    spec = TableSpec(
        schema="db", table="p", pk=("id", "id2"), engine=Engine.REPLACING_MERGE_TREE
    )
    table = ParquetTable(spark, tmpdir)
    batches, prev = [], 0
    for cut in sorted(batch_splits) + [len(events)]:
        if cut > prev:
            batches.append(events[prev:cut])
            prev = cut
    us = 0
    for batch in batches:
        rows = []
        for action, pk1, pk2, amount in batch:
            us += 1
            img = json.dumps({"id": pk1, "id2": pk2, "amount": amount})
            rows.append(("db", "p", action, img, img, us))
        raw = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
        typed = parse_values(split_updates(raw), COMPOSITE_VALUE_SCHEMA)
        apply_cdc_batch(table, typed, spec)
    out = read_current_state(table, spec).select("id", "id2", "amount").collect()
    got = {(r["id"], r["id2"]): r["amount"] for r in out}
    assert got == sequential_replay_composite(events)
