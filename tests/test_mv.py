"""Incremental materialized-view maintenance (operators.mv).

The contract: folding CDC chunks into the view one at a time reaches
exactly the state a one-shot aggregate over all events computes, for ANY
split of the stream — signed count/sum deltas are commutative and
associative, and fully-deleted groups vanish rather than linger as
zeros (SummingMergeTree-collapse semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from synch_spark.operators import mv

def _sign():
    return F.when(F.col("action") == "delete", F.lit(-1)).otherwise(F.lit(1))


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, action=a, v=float(v)) for k, a, v in rows],
        "k string, action string, v double",
    )


def _maintain(spark, rows, n_chunks):
    view = None
    size = max(1, (len(rows) + n_chunks - 1) // n_chunks)
    for i in range(0, len(rows), size):
        batch = _events(spark, rows[i : i + size])
        delta = mv.delta_aggregate(batch, ["k"], ["v"], _sign())
        view = mv.merge_delta(view, delta, ["k"], ["v"])
    return {
        r["k"]: (r["n"], float(r["v_sum"]))
        for r in mv.read_view(view, ["v"]).collect()
    }


ROWS = [
    ("a", "insert", 10.0),
    ("a", "insert", 5.0),
    ("b", "insert", 7.0),
    ("a", "delete", 10.0),
    ("c", "insert", 1.0),
    ("c", "delete", 1.0),
    ("b", "insert", 3.0),
]


@pytest.mark.parametrize("n_chunks", [1, 2, 3, 7])
def test_chunked_equals_batch(spark, n_chunks):
    got = _maintain(spark, ROWS, n_chunks)
    # one-shot truth: a nets to 1 row / 5.0, b to 2 rows / 10.0, c cancels
    assert got == {"a": (1, 5.0), "b": (2, 10.0)}


def test_fully_deleted_group_dropped(spark):
    rows = [("x", "insert", 2.0), ("x", "delete", 2.0)]
    view = mv.merge_delta(
        None, mv.delta_aggregate(_events(spark, rows), ["k"], ["v"], _sign()), ["k"], ["v"]
    )
    assert view.count() == 0


def test_update_as_delete_insert_pair(spark):
    # the T1 update-split arrives as delete(old)+insert(new): net count
    # stays, sum moves by the difference
    base = [("u", "insert", 100.0)]
    upd = [("u", "delete", 100.0), ("u", "insert", 42.0)]
    got = _maintain(spark, base + upd, 2)
    assert got == {"u": (1, 42.0)}
