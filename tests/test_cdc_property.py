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
def test_cdc_apply_matches_sequential_replay(spark, tmp_path_factory, events, batch_splits):
    tmpdir = str(tmp_path_factory.mktemp("cdcprop"))
    expected = sequential_replay(events)
    got = run_engine(spark, tmpdir, events, batch_splits)
    assert got == expected
