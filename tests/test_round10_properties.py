"""Round-10 property tests: the out-of-band wire-order invariant
(random update sequences sharing commit timestamps must resolve to the
wire-LAST image through decode → split → parse → compact) and the
commit primitive's single-winner guarantee under real thread races."""
from __future__ import annotations

import json
import threading

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# a modest example budget: each example runs a Spark job
_spark_prop = settings(max_examples=12, deadline=None,
                       suppress_health_check=[HealthCheck.too_slow])

# sequences of (pk, value) updates; several pks, enough updates that
# same-pk collisions are common
_updates = st.lists(
    st.tuples(st.integers(min_value=1, max_value=4),
              st.integers(min_value=0, max_value=999)),
    min_size=1, max_size=30)
# how many wal2json payload lines to split the sequence across
_n_lines = st.integers(min_value=1, max_value=5)


@pytest.mark.slow
@_spark_prop
@given(updates=_updates, n_lines=_n_lines, data=st.data())
def test_wire_order_last_wins_property(spark, updates, n_lines, data):
    """Split a random update sequence across wal2json v1 payloads that
    ALL share one commit timestamp (the worst tie case), with Kafka
    offsets carrying line order. Whatever the split, compaction must
    keep each pk's wire-LAST value — the invariant the old
    pmod(offset,1000) tiebreak violated at wrap/restart boundaries."""
    from pyspark.sql import types as T

    from synch_spark.events import parse_values, split_updates, wal2json_to_raw
    from synch_spark.operators.cdc_apply import compact_batch

    # random split points over the sequence
    cuts = sorted(data.draw(
        st.lists(st.integers(min_value=0, max_value=len(updates)),
                 min_size=n_lines - 1, max_size=n_lines - 1),
        label="cuts"))
    chunks, lo = [], 0
    for c in cuts + [len(updates)]:
        chunks.append(updates[lo:c])
        lo = c
    lines = []
    base_offset = data.draw(st.integers(min_value=0, max_value=10**12),
                            label="base_offset")
    for i, chunk in enumerate(chunks):
        payload = {"change": [
            {"kind": "update", "schema": "db", "table": "t",
             "columnnames": ["id", "x"], "columnvalues": [str(k), str(v)],
             "oldkeys": {"keynames": ["id"], "keyvalues": [str(k)]}}
            for k, v in chunk
        ], "timestamp": "2024-03-01 12:00:00.123456+00"}
        lines.append((json.dumps(payload), base_offset + i))
    df = spark.createDataFrame(lines, "value string, offset long")
    raw = wal2json_to_raw(df, subsecond_tiebreak=True, order_col="offset")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("x", T.LongType())])
    typed = parse_values(split_updates(raw), schema, string_values=True)
    net = {r["id"]: (r["x"], r["action"])
           for r in compact_batch(typed, ("id",)).collect()}
    expect = {}
    for k, v in updates:
        expect[k] = v
    assert {k: x for k, (x, _a) in net.items()} == expect
    assert all(a == "insert" for _x, a in net.values())


@pytest.mark.slow
@given(n_threads=st.integers(min_value=2, max_value=12),
       committer_kind=st.sampled_from(["posix", "object-store"]))
@settings(max_examples=20, deadline=None)
def test_committer_single_winner_under_races(tmp_path_factory, n_threads,
                                             committer_kind):
    """N threads race publish() for the same version: exactly one wins,
    every loser raises, and the surviving bytes are the winner's —
    under both the POSIX and the conditional-put committer."""
    from synch_spark.sources.committer import (
        AlreadyCommitted,
        LocalObjectStore,
        ObjectStoreCommitter,
        PosixCommitter,
    )

    tmp = tmp_path_factory.mktemp("race")
    path = str(tmp / "_v" / "v=0.json")
    make = (PosixCommitter if committer_kind == "posix"
            else lambda: ObjectStoreCommitter(LocalObjectStore()))
    results: list = [None] * n_threads
    barrier = threading.Barrier(n_threads)

    def run(i):
        c = make()
        barrier.wait()
        try:
            c.publish(path, f"writer-{i}".encode())
            results[i] = "won"
        except AlreadyCommitted:
            results[i] = "lost"

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1
    winner = results.index("won")
    with open(path, "rb") as f:
        assert f.read() == f"writer-{winner}".encode()
    # no temp litter
    assert [n for n in (tmp / "_v").iterdir()
            if n.name != "v=0.json"] == []
