"""Round-12 advice/verdict regressions outside the Kafka wire suite."""

from __future__ import annotations


def test_dead_letter_legacy_long_epoch_migrated(spark, tmp_path):
    """ADVICE r11: _epoch changed long -> string in round 11; a
    _synch_dead_letter table CREATED by an older version still holds
    LONG parquet columns, and appending string files into it would mix
    column types in one table and break every later read. The first
    append into a legacy-typed table migrates it in place (cast to
    string), then appends."""
    from pyspark.sql import types as T

    from synch_spark.config import SyncConfig, TableSpec
    from synch_spark.sources.table import ParquetTable
    from synch_spark.streaming.pipeline import CdcPipeline

    wh = str(tmp_path / "wh")
    # a legacy table: the pre-round-11 shape with a LONG _epoch
    legacy = spark.createDataFrame(
        [("db", "t", None, None, '{"x": 0}', 1, 3)],
        "schema string, table string, action string, before string, "
        "after string, event_unixtime long, _epoch long")
    ParquetTable(spark, f"{wh}/_synch_dead_letter").overwrite(legacy)
    assert dict(ParquetTable(spark, f"{wh}/_synch_dead_letter")
                .read().dtypes)["_epoch"] == "bigint"

    cfg = SyncConfig()
    cfg.add_table(TableSpec(schema="db", table="t", pk=("id",)))
    vs = T.StructType([T.StructField("id", T.LongType())])
    pipe = CdcPipeline(
        spark=spark, cfg=cfg, warehouse=wh,
        checkpoint_dir=str(tmp_path / "ck"), value_schemas={"db.t": vs},
    )
    bad = spark.createDataFrame(
        [("db", "t", None, None, '{"x": 1}', 2)],
        "schema string, table string, action string, before string, "
        "after string, event_unixtime long")
    pipe.apply_batch(bad, "kafka-socket:t/0:0-1")

    dead = ParquetTable(spark, f"{wh}/_synch_dead_letter").read()
    # both generations readable from ONE table, epochs value-preserved
    assert dead.count() == 2
    assert dict(dead.dtypes)["_epoch"] == "string"
    assert {r["_epoch"] for r in dead.collect()} == \
        {"3", "kafka-socket:t/0:0-1"}

    # second append: no re-migration needed, still consistent
    pipe.apply_batch(bad, 9)
    dead = ParquetTable(spark, f"{wh}/_synch_dead_letter").read()
    assert dead.count() == 3
    assert {r["_epoch"] for r in dead.collect()} == \
        {"3", "kafka-socket:t/0:0-1", "9"}


def test_mat_multiref_gate_branch_invariant(spark, monkeypatch):
    """Round-12 optimization: q91/q92's compact multiply-consumed
    aggregates go through the size-adaptive materialize-once gate
    (_mat_multiref). On the tiny fixture the gate leaves the plan alone
    (re-scanning 2 MB beats a block-manager round trip); forcing it ON
    must change only the plan, never the rows — and the checkpointed
    plan must stop re-scanning the base parquet."""
    from synch_spark.plans import advanced

    sf = "/root/testdata/sf0.001"
    plain_q91 = advanced.q91_gapfill_ffill(spark, sf)
    plain_q92 = advanced.q92_cohort_retention(spark, sf)
    # fixture scans as fewer splits than cores -> gate must be off
    assert "localCheckpoint" not in plain_q91._jdf.queryExecution().analyzed().toString()
    rows91, rows92 = plain_q91.collect(), plain_q92.collect()

    monkeypatch.setattr(advanced, "_scan_splits", lambda *a: 10**9)
    mat_q91 = advanced.q91_gapfill_ffill(spark, sf)
    mat_q92 = advanced.q92_cohort_retention(spark, sf)
    # gate on: the visible executed plan reads the materialized
    # aggregate, not a second parquet scan
    assert "ExistingRDD" in mat_q91._jdf.queryExecution().executedPlan().toString()
    assert mat_q91.collect() == rows91
    assert mat_q92.collect() == rows92


def test_pin_sort_input_branch_invariant(spark, monkeypatch):
    """Round-12 optimization: a final global sort's range exchange
    executes its child fragment twice (bounds sampling + shuffle), so
    per-row-expensive sort inputs are lazily checkpointed via
    relational._pin. The pin must change only the pass count, never the
    rows OR their order; with the pin the executed plan reads the
    materialized fragment (ExistingRDD) below the range exchange."""
    from synch_spark.plans import dataops, relational

    sf = "/root/testdata/sf0.001"
    for fn in (dataops.q41_winnow_fingerprints,
               dataops.q133_pgoutput_decode):
        monkeypatch.setattr(relational, "_PIN_SORT", False)
        plain = fn(spark, sf)
        assert "localCheckpoint" not in \
            plain._jdf.queryExecution().analyzed().toString()
        rows_plain = plain.collect()

        monkeypatch.setattr(relational, "_PIN_SORT", True)
        pinned = fn(spark, sf)
        assert "ExistingRDD" in \
            pinned._jdf.queryExecution().executedPlan().toString()
        # identical rows in the identical global order
        assert pinned.collect() == rows_plain
