"""run_guarded_sync: the pending-marker crash guard shared by the
persisted index family, plus the VectorIndex netted-replay e2e.
"""

from __future__ import annotations

import json
import os

import pytest


def _guard(tmp_path):
    from synch_spark.operators.index_sync import run_guarded_sync

    return run_guarded_sync, str(tmp_path / "_feed_cursor.json")


def test_fresh_sync_builds_and_cursors(tmp_path):
    run, path = _guard(tmp_path)
    calls = []
    v = run(path, 7, lambda: calls.append("build"),
            lambda a, b: calls.append(("apply", a, b)))
    assert v == 7 and calls == ["build"]
    assert json.load(open(path))["version"] == 7
    assert not os.path.exists(path + ".pending")


def test_incremental_then_noop(tmp_path):
    run, path = _guard(tmp_path)
    run(path, 1, lambda: None, lambda a, b: None)
    calls = []
    run(path, 5, lambda: calls.append("build"),
        lambda a, b: calls.append(("apply", a, b)))
    assert calls == [("apply", 1, 5)]
    calls.clear()
    run(path, 5, lambda: calls.append("build"),
        lambda a, b: calls.append("apply"))
    assert calls == []  # same version, clean marker: no-op


def test_retention_lapse_falls_back_to_build(tmp_path):
    run, path = _guard(tmp_path)
    run(path, 1, lambda: None, lambda a, b: None)
    calls = []

    def apply(a, b):
        raise FileNotFoundError("feed gone")

    run(path, 9, lambda: calls.append("build"), apply)
    assert calls == ["build"]
    assert not os.path.exists(path + ".pending")


def test_crash_inside_window_forces_rebuild_even_at_same_version(tmp_path):
    """Crash anywhere inside the mutation window (mid-apply, or after
    the state commit but before the cursor write) leaves the pending
    marker; the NEXT sync must rebuild — even when the version did not
    advance, and even though a feed apply would normally be chosen."""
    run, path = _guard(tmp_path)
    run(path, 3, lambda: None, lambda a, b: None)

    def crashing_apply(a, b):
        raise RuntimeError("died mid-apply")

    with pytest.raises(RuntimeError):
        run(path, 4, lambda: None, crashing_apply)
    assert os.path.exists(path + ".pending")
    # source did not even advance since the crash: still rebuild
    calls = []
    run(path, 4, lambda: calls.append("build"),
        lambda a, b: calls.append("apply"))
    assert calls == ["build"]
    assert not os.path.exists(path + ".pending")
    # and the window is closed again afterwards
    calls.clear()
    run(path, 4, lambda: calls.append("build"),
        lambda a, b: calls.append("apply"))
    assert calls == []


def test_force_rebuild_flag(tmp_path):
    run, path = _guard(tmp_path)
    run(path, 2, lambda: None, lambda a, b: None)
    calls = []
    run(path, 2, lambda: calls.append("build"),
        lambda a, b: calls.append("apply"), force_rebuild=True)
    assert calls == ["build"]


@pytest.mark.slow
def test_vector_index_crashed_sync_then_revert_rebuilds(spark, tmp_path,
                                                        monkeypatch):
    """VectorIndex netted-replay e2e: the merge COMMITS, the 'crash'
    hits before the cursor write, the source row reverts — the
    endpoint feed nets the row out, so only the pending-marker rebuild
    restores assignment parity with a fresh build."""
    import numpy as np
    from pyspark.sql import functions as F

    from synch_spark.config import Engine, TableSpec
    from synch_spark.operators.cdc_apply import apply_cdc_batch
    from synch_spark.operators.vector_index import VectorIndex
    from synch_spark.sources.table import ParquetTable

    rng = np.random.default_rng(21)
    rows = [(i, [float(np.float32(x)) for x in rng.normal(size=4)])
            for i in range(40)]
    src = ParquetTable(spark, str(tmp_path / "src"), retain=8)
    src.overwrite(spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"))

    idx = VectorIndex(spark, str(tmp_path / "vidx"), num_centroids=4)
    idx.sync_from(src)

    spec = TableSpec(schema="db", table="emb", pk=("vec_id",),
                     engine=Engine.REPLACING_MERGE_TREE)

    def batch(vec, ts):
        return spark.createDataFrame(
            [("insert", 0, vec)],
            "action string, vec_id long, embedding array<float>",
        ).withColumn("event_unixtime", F.lit(ts).cast("long")) \
         .withColumn("action_seq", F.lit(0)) \
         .withColumn("schema", F.lit("db")).withColumn("table", F.lit("emb"))

    orig_vec = rows[0][1]
    moved = [float(np.float32(x)) for x in rng.normal(size=4) * 5]
    apply_cdc_batch(src, batch(moved, 10), spec,
                    value_columns=["vec_id", "embedding"])

    # crash AFTER the apply's merge commit, BEFORE the cursor write:
    # wrap apply_changes to complete its work then die
    orig_apply = VectorIndex.apply_changes
    state = {"boom": True}

    def apply_then_die(self, *a, **kw):
        orig_apply(self, *a, **kw)
        if state["boom"]:
            raise RuntimeError("crash before cursor write")

    monkeypatch.setattr(VectorIndex, "apply_changes", apply_then_die)
    with pytest.raises(RuntimeError, match="before cursor write"):
        idx.sync_from(src)
    state["boom"] = False
    # committed state says vec 0 = moved; source reverts -> feed nets out
    apply_cdc_batch(src, batch(orig_vec, 20), spec,
                    value_columns=["vec_id", "embedding"])
    idx.sync_from(src)  # pending marker -> full rebuild

    got = {(r["id"], tuple(round(x, 6) for x in r["v"]))
           for r in idx.assignments.read().select("id", "v").collect()}
    fresh = VectorIndex(spark, str(tmp_path / "vfresh"), num_centroids=4)
    fresh.build(src.read())
    want = {(r["id"], tuple(round(x, 6) for x in r["v"]))
            for r in fresh.assignments.read().select("id", "v").collect()}
    assert got == want, "netted replay left the reverted vector stale"
