"""Round-7 ADVICE regressions.

1. Epoch idempotence markers must outlive log retention (bounded
   recent-epochs list carried in every commit entry).
2. A successful MV sync must durably promote its cursor — not rely on
   the token's commit staying in the retained/epoch window.
3. extract_features must tolerate non-UTF-8 (binary) media payloads.
4. _restore_evolved_schema must not drop user columns that merely start
   with an underscore.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from synch_spark.sources.table import ParquetTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, amount double")


# --- 1. epoch survives retention -------------------------------------------
@pytest.mark.slow
def test_epoch_marker_survives_log_retention(spark, tmp_path):
    """retain=2, but a marker must stay visible arbitrarily many commits
    later (bounded by _EPOCH_KEEP): a micro-batch with several DDL
    barriers appends one epoch-stamped segment per barrier; after a
    crash late in the batch the EARLIEST segment's entry has rotated
    out, yet its replay must still no-op."""
    t = ParquetTable(spark, str(tmp_path / "t"), retain=2)
    t.overwrite(_df(spark, [(1, 1.0)]))
    t.append(_df(spark, [(2, 2.0)]), epoch="seg:0")  # earliest segment
    t.append(_df(spark, [(3, 3.0)]), epoch="seg:1")
    t.append(_df(spark, [(4, 4.0)]), epoch="seg:2")
    # precondition: seg:0's OWN entry must actually be gone from the
    # retained window — only the carried eps list can testify for it
    assert all(t._entry(v).get("epoch") != "seg:0" for v in t.versions()), \
        "fixture too shallow: the stamped entry is still retained"
    assert t._epoch_applied("seg:0"), "marker rotated out with its entry"
    before = t.read().count()
    t.append(_df(spark, [(2, 2.0)]), epoch="seg:0")  # the crash replay
    assert t.read().count() == before, "replayed segment re-applied"


def test_epoch_list_carried_through_unstamped_commits(spark, tmp_path):
    """Plain (no-epoch) commits must carry the list forward unchanged —
    otherwise one ordinary overwrite after an epoch append drops every
    marker the moment the stamped entry leaves the window."""
    t = ParquetTable(spark, str(tmp_path / "t"), retain=2)
    t.overwrite(_df(spark, [(1, 1.0)]))
    t.append(_df(spark, [(2, 2.0)]), epoch="only")
    for i in range(4):  # plain commits, no epochs
        t.append(_df(spark, [(10 + i, 0.5)]))
    assert t._epoch_applied("only")


def test_epoch_list_is_bounded(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), retain=2)
    t._EPOCH_KEEP = 3  # instance override for a fast test
    t.overwrite(_df(spark, [(1, 1.0)]))
    for i in range(5):
        t.append(_df(spark, [(i, 1.0)]), epoch=f"e:{i}")
    head = t._entry(t.current_version())
    assert len(head["eps"]) == 3
    assert head["eps"] == ["e:2", "e:3", "e:4"]
    assert not t._epoch_applied("e:0"), "cap not enforced"
    assert t._epoch_applied("e:4")


# --- 2. MV sync promotion ----------------------------------------------------
@pytest.mark.slow
def test_mv_sync_promotes_doc_durably(spark, tmp_path):
    """After a SUCCESSFUL sync the doc must be promoted (prev==pending,
    token cleared) so _last_synced never regresses even if the token's
    epoch marker later rotates out of the state table's bounded list —
    a regression would re-apply the already-folded feed interval and
    the signed fold double-counts silently."""
    from synch_spark.operators.mv import MaterializedView

    src = ParquetTable(spark, str(tmp_path / "src"), retain=6)
    src.overwrite(_df(spark, [(1, 10.0), (2, 20.0)]))
    view = MaterializedView.create(
        spark, str(tmp_path / "mv"), "db.t", group_cols=["k"],
        sum_cols=["amount"])
    view.refresh_from_changes(src, pk="k")
    src.append(_df(spark, [(3, 30.0)]))
    cur = view.refresh_from_changes(src, pk="k")
    doc = view._sync_doc()
    assert doc["token"] is None and doc["prev"] == doc["pending"] == cur, \
        f"sync doc not promoted: {doc}"
    # worst case: the epoch list rotates completely between syncs
    view.table._EPOCH_KEEP = 1
    batch = spark.createDataFrame(
        [("insert", 9, 90.0)], "action string, k long, amount double")
    view.refresh_from_batch(batch, epoch="fold:a")
    view.refresh_from_batch(
        spark.createDataFrame([("insert", 8, 80.0)],
                              "action string, k long, amount double"),
        epoch="fold:b")
    assert view._last_synced() == cur, "cursor regressed after token rotation"
    view.refresh_from_changes(src, pk="k")  # no new source commits: no-op
    got = {r["k"]: float(r["amount_delta"]) for r in view.table.read().collect()}
    assert got[3] == 30.0 and got[1] == 10.0, f"feed double-applied: {got}"


# --- 3. binary media payloads ------------------------------------------------
def test_extract_features_non_utf8_payload(spark):
    from synch_spark.operators.multimodal import extract_features

    rows = [
        (1, bytearray(b"\xff\xfe\x00\x89PNG"), {"width": 4, "height": 2}),
        (2, bytearray("café".encode()), {"width": 1, "height": 1}),
        (3, None, {"width": 1, "height": 1}),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", T.StructType([
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
            ])),
        ]))
    out = {r["id"]: r["checksum"] for r in extract_features(df).collect()}
    assert out[1] == sum(b"\xff\xfe\x00\x89PNG") % (1 << 31)  # byte-sum fallback
    assert out[2] == sum(map(ord, "café")) % (1 << 31)  # code points, not bytes
    assert out[3] == 0


# --- 4. user columns starting with "_" ---------------------------------------
def test_restore_schema_keeps_underscore_user_column(spark, tmp_path):
    from synch_spark.config import SyncConfig, TableSpec
    from synch_spark.streaming.pipeline import CdcPipeline

    spec = TableSpec(schema="db", table="t", pk=("id",))
    cfg = SyncConfig()
    cfg.add_table(spec)
    declared = T.StructType([T.StructField("id", T.LongType())])
    pipe = CdcPipeline(
        spark=spark, cfg=cfg, warehouse=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        value_schemas={"db.t": declared})
    stored = spark.createDataFrame(
        [(1, "ok", 5)], "id long, _status string, _sgen long")
    pipe.table_for(spec).overwrite(stored)
    pipe._restore_evolved_schema(spec)
    names = [f.name for f in pipe.value_schemas["db.t"].fields]
    assert "_status" in names, "user column _status dropped on restore"
    assert "_sgen" not in names and "_event_unixtime" not in names


# --- round-7 review sweep regressions ----------------------------------------
def test_config_accepts_reference_camelcase_engines():
    """The reference's synch.yaml writes 'ReplacingMergeTree' etc.
    (synch/enums.py); a carried-over config must parse unchanged, and
    engine_settings must survive into the spec."""
    from synch_spark.config import Engine, config_from_dict

    raw = {
        "core": {},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "a", "pk": ["id"],
             "clickhouse_engine": "CollapsingMergeTree",
             "engine_settings": "index_granularity=4096"},
            {"table": "b", "pk": ["id"],
             "clickhouse_engine": "replacing_merge_tree"},
        ]}]}],
    }
    cfg = config_from_dict(raw)
    assert cfg.tables["db.a"].engine is Engine.COLLAPSING_MERGE_TREE
    assert cfg.tables["db.a"].engine_settings == "index_granularity=4096"
    assert cfg.tables["db.b"].engine is Engine.REPLACING_MERGE_TREE


def test_etl_full_collapsing_bootstrap_survives_cdc(spark, tmp_path):
    """etl_full on a collapsing spec must stamp the snapshot as +1
    inserts: without sign/_event_unixtime the first signed CDC append
    makes a mixed-schema table whose initially-loaded keys read as
    sign=NULL and vanish from the collapsed state."""
    from pyspark.sql import functions as F

    from synch_spark.config import Engine, TableSpec
    from synch_spark.operators.cdc_apply import apply_cdc_batch, read_current_state
    from synch_spark.pipeline import etl_full

    spec = TableSpec(schema="db", table="t", pk=("id",),
                     engine=Engine.COLLAPSING_MERGE_TREE)
    t = ParquetTable(spark, str(tmp_path / "t"), retain=4)
    src = spark.createDataFrame([(1, 10.0), (2, 20.0)],
                                "id long, amount double")
    assert etl_full(src, t, spec)
    batch = spark.createDataFrame(
        [("insert", 3, 30.0, 5)],
        "action string, id long, amount double, event_unixtime long",
    ).withColumn("action_seq", F.lit(0)) \
     .withColumn("schema", F.lit("db")).withColumn("table", F.lit("t"))
    apply_cdc_batch(t, batch, spec, value_columns=["id", "amount"])
    got = {r["id"]: r["amount"] for r in read_current_state(t, spec).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0}, \
        f"initial snapshot vanished from the collapsed state: {got}"


def test_point_lookup_accepts_generator_keys(spark, tmp_path):
    from synch_spark.sources.bloom import point_lookup

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(i, i * 10.0) for i in range(50)],
                                      "id long, v double"))
    rows = point_lookup(t, "id", (k for k in [3, 7])).collect()
    assert {r["id"] for r in rows} == {3, 7}
