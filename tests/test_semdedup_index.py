"""SemDedupIndex: incremental maintenance must converge to exactly the
one-shot semantic_dedup state, through inserts, updates (including
cluster moves), deletes, and the table-change-feed sync path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vec(rng, base, noise=0.02):
    return [float(np.float32(x)) for x in base + rng.normal(scale=noise,
                                                            size=len(base))]


@pytest.fixture()
def corpus(spark):
    rng = np.random.default_rng(11)
    axes = np.eye(4)  # 4 well-separated directions
    rows = []
    vid = 0
    for ax in axes:
        for _ in range(6):  # 6 near-copies per direction
            rows.append((vid, _vec(rng, ax * 3.0)))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(c, [float(x * 3.0) for x in axes[c]]) for c in range(4)],
        "cid int, cvec array<float>")
    return df, cents, rng


def _one_shot(df, cents, thr):
    from synch_spark.operators.similarity import semantic_dedup

    return {tuple(r) for r in semantic_dedup(df, cents, thr).collect()}


def _kept(idx):
    return {tuple(r) for r in idx.read_kept().collect()}


THR = 0.9


@pytest.mark.slow
def test_insert_update_delete_converge_to_one_shot(spark, tmp_path, corpus):
    from synch_spark.operators.semdedup_index import SemDedupIndex

    df, cents, rng = corpus
    idx = SemDedupIndex(spark, str(tmp_path / "idx"), threshold=THR)
    idx.build(df.filter(F.col("vec_id") < 12), cents)

    # 1) inserts: the second half
    idx.apply_changes(df.filter(F.col("vec_id") >= 12).withColumn(
        "_change_type", F.lit("insert")))
    assert _kept(idx) == _one_shot(df, cents, THR)

    # 2) update that MOVES a vector to another centroid block: vec 0
    #    (axis 0) re-embeds near axis 3
    moved = [float(np.float32(x)) for x in
             np.array([0.0, 0.0, 0.0, 3.0]) + rng.normal(scale=0.02, size=4)]
    upd = spark.createDataFrame(
        [(0, moved, "update_postimage")],
        "vec_id long, embedding array<float>, _change_type string")
    idx.apply_changes(upd)
    df2 = (df.filter(F.col("vec_id") != 0)
           .unionByName(spark.createDataFrame(
               [(0, moved)], "vec_id long, embedding array<float>")))
    assert _kept(idx) == _one_shot(df2, cents, THR)

    # 3) delete the current representative of a block: the keep-best
    #    must re-elect inside that block only
    some_kept = sorted(r[0] for r in idx.read_kept().collect())[0]
    dele = spark.createDataFrame(
        [(some_kept, None, "delete")],
        "vec_id long, embedding array<float>, _change_type string")
    idx.apply_changes(dele)
    df3 = df2.filter(F.col("vec_id") != some_kept)
    assert _kept(idx) == _one_shot(df3, cents, THR)

    # 4) update to a NON-FINITE embedding behaves as a delete (one-shot
    #    drops such vectors at the door)
    bad = spark.createDataFrame(
        [(5, [float("nan"), 0.0, 0.0, 0.0], "update_postimage")],
        "vec_id long, embedding array<float>, _change_type string")
    idx.apply_changes(bad)
    df4 = df3.filter(F.col("vec_id") != 5)
    assert _kept(idx) == _one_shot(df4, cents, THR)


@pytest.mark.slow
def test_sync_retention_lapse_rebuilds_from_stored_centroids(
        spark, tmp_path, corpus):
    """An index that lags past the source's retention window cannot
    read the change feed — sync_from must fall back to a FULL rebuild
    using the STORED centroid set (the index's fixed parameter), and
    land on the one-shot state of the current source."""
    from synch_spark.operators.semdedup_index import SemDedupIndex
    from synch_spark.sources.table import ParquetTable

    df, cents, rng = corpus
    src = ParquetTable(spark, str(tmp_path / "src"), retain=2)
    src.overwrite(df.filter(F.col("vec_id") < 8))

    idx = SemDedupIndex(spark, str(tmp_path / "idx"), threshold=THR)
    idx.centroids.overwrite(cents)
    idx.sync_from(src)

    # churn the source far past retain=2 so the cursor's version is
    # physically gone, then vacuum-by-overwrite: each overwrite is a
    # new version; old diff files age out
    for k in (12, 16, 20, 24):
        src.overwrite(df.filter(F.col("vec_id") < k))
    from unittest import mock

    from synch_spark.operators.semdedup_index import SemDedupIndex as S

    with mock.patch.object(S, "build", wraps=idx.build) as spy:
        v = idx.sync_from(src)  # change feed unavailable -> full rebuild
        assert spy.called, "expected the retention-lapse REBUILD branch"
    assert v == src.current_version()
    assert _kept(idx) == _one_shot(df.filter(F.col("vec_id") < 24),
                                   cents, THR)


@pytest.mark.slow
def test_crash_between_merges_replay_heals_old_block(spark, tmp_path,
                                                     corpus, monkeypatch):
    """Crash-replay hole: a sync dying BETWEEN the assignments merge
    and the kept re-collapse loses the pre-merge block locations — on
    replay a block-moving update reads back under its NEW cid only, so
    without the durable touched-intent the OLD block never re-collapses
    and a member suppressed by the departed representative stays
    suppressed forever. The intent must make replay converge to the
    one-shot state."""
    from synch_spark.operators.semdedup_index import SemDedupIndex

    df, cents, rng = corpus
    idx = SemDedupIndex(spark, str(tmp_path / "idx"), threshold=THR)
    idx.build(df, cents)

    # the current representative of block 0 moves to block 3
    rep0 = sorted(r["vec_id"] for r in idx.read_kept()
                  .filter(F.col("cid") == 0).collect())[0]
    moved = [float(np.float32(x)) for x in
             np.array([0.0, 0.0, 0.0, 3.0]) + rng.normal(scale=0.02, size=4)]
    upd = spark.createDataFrame(
        [(rep0, moved, "update_postimage")],
        "vec_id long, embedding array<float>, _change_type string")

    # crash injection: die on the SECOND (kept) merge only
    orig_merge = SemDedupIndex._merge
    state = {"calls": 0}

    def dying_merge(self, table, name, *a, **kw):
        state["calls"] += 1
        if name == "kept" and state["boom"]:
            raise RuntimeError("injected crash between merges")
        return orig_merge(self, table, name, *a, **kw)

    monkeypatch.setattr(SemDedupIndex, "_merge", dying_merge)
    state["boom"] = True
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.apply_changes(upd)
    # replay the SAME feed (the sync cursor was never advanced)
    state["boom"] = False
    idx.apply_changes(upd)

    df2 = (df.filter(F.col("vec_id") != rep0)
           .unionByName(spark.createDataFrame(
               [(rep0, moved)], "vec_id long, embedding array<float>")))
    assert _kept(idx) == _one_shot(df2, cents, THR), \
        "old block not re-collapsed after crash replay"
    import os
    assert not os.path.exists(idx._intent_path())


@pytest.mark.slow
def test_crashed_sync_then_source_revert_takes_full_rebuild(
        spark, tmp_path, corpus, monkeypatch):
    """The netted-replay hole: a sync crashes mid-apply (assignments
    merged, kept not), then the SOURCE row reverts before the retry —
    the endpoint change feed changes(last, cur') nets the row out
    entirely, so feed-replay can never heal the half-committed
    assignment. With a pending intent, the cursor path must take the
    FULL REBUILD and converge to the reverted source's one-shot."""
    from unittest import mock

    from synch_spark.config import Engine, TableSpec
    from synch_spark.operators.cdc_apply import apply_cdc_batch
    from synch_spark.operators.semdedup_index import SemDedupIndex
    from synch_spark.sources.table import ParquetTable

    df, cents, rng = corpus
    base = df.filter(F.col("vec_id") < 12)
    src = ParquetTable(spark, str(tmp_path / "src"), retain=8)
    src.overwrite(base)
    idx = SemDedupIndex(spark, str(tmp_path / "idx"), threshold=THR)
    idx.centroids.overwrite(cents)
    idx.sync_from(src)

    spec = TableSpec(schema="db", table="emb", pk=("vec_id",),
                     engine=Engine.REPLACING_MERGE_TREE)
    orig_vec = list(base.filter(F.col("vec_id") == 0).first()["embedding"])
    moved = [float(np.float32(x)) for x in
             np.array([0.0, 0.0, 0.0, 3.0]) + rng.normal(scale=0.02, size=4)]

    def batch(vec, ts):
        return spark.createDataFrame(
            [(0, vec, "insert")],
            "vec_id long, embedding array<float>, action string",
        ).withColumnRenamed("action", "_a").selectExpr(
            "_a as action", "vec_id", "embedding") \
         .withColumn("event_unixtime", F.lit(ts).cast("long")) \
         .withColumn("action_seq", F.lit(0)) \
         .withColumn("schema", F.lit("db")).withColumn("table", F.lit("emb"))

    apply_cdc_batch(src, batch(moved, 10), spec,
                    value_columns=["vec_id", "embedding"])

    orig_merge = SemDedupIndex._merge
    state = {"boom": True}

    def dying_merge(self, table, name, *a, **kw):
        if name == "kept" and state["boom"]:
            raise RuntimeError("injected crash mid-apply")
        return orig_merge(self, table, name, *a, **kw)

    monkeypatch.setattr(SemDedupIndex, "_merge", dying_merge)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.sync_from(src)  # crashes: assignments merged, kept not
    state["boom"] = False

    # the source REVERTS before the retry: the endpoint feed nets out
    apply_cdc_batch(src, batch(orig_vec, 20), spec,
                    value_columns=["vec_id", "embedding"])
    with mock.patch.object(SemDedupIndex, "build",
                           wraps=idx.build) as spy:
        idx.sync_from(src)
        assert spy.called, "pending intent must force the rebuild path"
    assert _kept(idx) == _one_shot(base, cents, THR)
    import os
    assert not os.path.exists(idx._intent_path())


@pytest.mark.slow
def test_sync_from_change_feed(spark, tmp_path, corpus):
    """Cursor-driven sync against a CDC-maintained ParquetTable: build
    at v0, mutate the source (insert + update + delete), sync — the
    kept store matches a one-shot over the final state; a second sync
    with no changes is a no-op."""
    from synch_spark.config import Engine, TableSpec
    from synch_spark.operators.cdc_apply import apply_cdc_batch
    from synch_spark.operators.semdedup_index import SemDedupIndex
    from synch_spark.sources.table import ParquetTable

    df, cents, rng = corpus
    src = ParquetTable(spark, str(tmp_path / "src"), retain=4)
    src.overwrite(df.filter(F.col("vec_id") < 20))

    idx = SemDedupIndex(spark, str(tmp_path / "idx"), threshold=THR)
    idx.centroids.overwrite(cents)
    v = idx.sync_from(src)  # first sync: full build
    assert v == src.current_version()
    assert _kept(idx) == _one_shot(df.filter(F.col("vec_id") < 20),
                                   cents, THR)

    # mutate: insert the last 4 vectors + re-embed vec 1 + drop vec 2
    moved = [float(np.float32(x)) for x in
             np.array([0.0, 3.0, 0.0, 0.0]) + rng.normal(scale=0.02, size=4)]
    spec = TableSpec(schema="db", table="emb", pk=("vec_id",),
                     engine=Engine.REPLACING_MERGE_TREE)
    ins = [(int(r["vec_id"]), list(r["embedding"]), "insert")
           for r in df.filter(F.col("vec_id") >= 20).collect()]
    batch = spark.createDataFrame(
        ins + [(1, moved, "insert"), (2, None, "delete")],
        "vec_id long, embedding array<float>, action string",
    ).withColumn("event_unixtime", F.lit(1).cast("long")) \
     .withColumn("action_seq", F.lit(0)) \
     .withColumn("schema", F.lit("db")).withColumn("table", F.lit("emb"))
    apply_cdc_batch(src, batch, spec, value_columns=["vec_id", "embedding"])
    idx.sync_from(src)
    final = (df.filter(F.col("vec_id") != 1)
             .unionByName(spark.createDataFrame(
                 [(1, moved)], "vec_id long, embedding array<float>"))
             .filter(F.col("vec_id") != 2))
    assert _kept(idx) == _one_shot(final, cents, THR)
    # idempotent: nothing changed, cursor short-circuits
    v2 = idx.sync_from(src)
    assert v2 == src.current_version()
