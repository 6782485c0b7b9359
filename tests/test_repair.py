"""Backfill repair: drifted replica + fresh snapshot -> parity restored."""

from __future__ import annotations

from pyspark.sql import functions as F

from synch_spark.config import TableSpec
from synch_spark.pipeline import check, etl_full, repair
from synch_spark.session import read_table
from synch_spark.sources.table import ParquetTable
import pytest


def test_repair_restores_parity(spark, tmp_path):
    source = read_table(spark, "/root/testdata/sf0.001", "customer")
    spec = TableSpec(schema="db", table="customer", pk=("c_custkey",))
    table = ParquetTable(spark, str(tmp_path / "t"))
    etl_full(source, table, spec)

    # inject drift: drop some rows, corrupt one balance
    drifted = (
        table.read()
        .filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") == 1, F.lit(-1.0)).otherwise(F.col("c_acctbal")),
        )
    )
    table.overwrite(drifted)
    assert not check(source, table, checksum=True).ok

    n = repair(source, table, spec)
    assert n > 0
    assert check(source, table, checksum=True).ok

    # idempotent: repairing a healthy table applies nothing
    assert repair(source, table, spec) == 0


def test_etl_skip_flags(spark, tmp_path):
    """Reference semantics (etl.py:28-35,68-72): auto_full_etl=False
    skips UNCONDITIONALLY (even --renew); no pk skips unless --renew;
    an existing table never re-ETLs without --renew (a plain `etl` run
    for one new table must not overwrite every existing table)."""
    source = read_table(spark, "/root/testdata/sf0.001", "region")
    t = ParquetTable(spark, str(tmp_path / "r"))
    no_pk = TableSpec(schema="db", table="region", pk=())
    assert etl_full(source, t, no_pk) is False  # no pk -> skipped
    assert etl_full(source, t, no_pk, renew=True) is True  # renew forces
    t2 = ParquetTable(spark, str(tmp_path / "r2"))
    off = TableSpec(schema="db", table="region", pk=("r_regionkey",),
                    auto_full_etl=False)
    assert etl_full(source, t2, off) is False  # opted out: never bulk-load
    assert etl_full(source, t2, off, renew=True) is False  # even with renew
    spec = TableSpec(schema="db", table="region", pk=("r_regionkey",))
    assert etl_full(source, t2, spec) is True  # not exists yet -> runs
    v = t2.current_version()
    assert etl_full(source, t2, spec) is False  # exists -> skip w/o renew
    assert t2.current_version() == v, "plain etl re-snapshotted an existing table"
    assert etl_full(source, t2, spec, renew=True) is True  # renew forces


@pytest.mark.slow
def test_backfill_missing_fills_holes_not_clobbers(spark, tmp_path):
    """Chunked backfill inserts absent keys only: rows the CDC stream
    already wrote (possibly newer than the snapshot) keep their values;
    rerunning is a no-op (resumable/idempotent)."""
    from synch_spark.pipeline import backfill_missing

    source = read_table(spark, "/root/testdata/sf0.001", "customer")
    spec = TableSpec(schema="db", table="customer", pk=("c_custkey",))
    table = ParquetTable(spark, str(tmp_path / "bf"))
    # initial partial load: only a third of the rows landed
    etl_full(source.filter(F.col("c_custkey") % 3 == 0), table, spec)
    # the CDC stream then updated key 3 to a NEWER value than the snapshot
    newer = table.read().withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 3, F.lit(9999.5)).otherwise(F.col("c_acctbal")),
    )
    table.overwrite(newer)

    added = backfill_missing(source, table, spec, num_chunks=3)
    assert added == source.count() - source.filter(F.col("c_custkey") % 3 == 0).count()
    assert table.read().count() == source.count()
    # CDC-written value survives the backfill (snapshot had the old value)
    got = table.read().filter(F.col("c_custkey") == 3).collect()[0]["c_acctbal"]
    assert got == 9999.5
    # idempotent rerun
    assert backfill_missing(source, table, spec, num_chunks=3) == 0


def test_backfill_skips_collapsing_tombstones(spark, tmp_path):
    """On a collapsing engine a CDC delete leaves ±sign tombstone rows, so
    the deleted key physically 'exists' — backfill must NOT resurrect it."""
    import json

    from pyspark.sql import types as T

    from synch_spark.config import Engine
    from synch_spark.events import RAW_EVENT_SCHEMA, parse_values, split_updates
    from synch_spark.operators.cdc_apply import apply_cdc_batch, read_current_state
    from synch_spark.pipeline import backfill_missing

    vschema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    spec = TableSpec(
        schema="db", table="t", pk=("id",), engine=Engine.COLLAPSING_MERGE_TREE
    )
    table = ParquetTable(spark, str(tmp_path / "ct"))
    mk = lambda a, bf, af, us: (  # noqa: E731
        "db", "t", a,
        json.dumps(bf) if bf else None,
        json.dumps(af) if af else None, us,
    )
    ev = split_updates(
        spark.createDataFrame(
            [
                mk("insert", None, {"id": 1, "v": "a"}, 100),
                mk("delete", {"id": 1, "v": "a"}, None, 200),
            ],
            RAW_EVENT_SCHEMA,
        )
    )
    apply_cdc_batch(table, parse_values(ev, vschema), spec)
    assert read_current_state(table, spec).count() == 0  # deleted

    # stale snapshot still contains id=1 (taken before the delete) + a new id=2
    snapshot = spark.createDataFrame([(1, "a"), (2, "b")], vschema)
    added = backfill_missing(snapshot, table, spec, num_chunks=2)
    assert added == 1  # only id=2; the tombstoned id=1 is not resurrected
    state = {r["id"]: r["v"] for r in read_current_state(table, spec).collect()}
    assert state == {2: "b"}

def test_check_reports_column_drift(spark, tmp_path):
    """A target missing a source column must FAIL the checksum check and
    name the drift — not silently checksum the intersection."""
    source = read_table(spark, "/root/testdata/sf0.001", "region")
    spec = TableSpec(schema="db", table="region", pk=("r_regionkey",))
    t = ParquetTable(spark, str(tmp_path / "cd"))
    etl_full(source.drop("r_name"), t, spec)  # target lacks a column
    res = check(source, t, checksum=True)
    assert res.source_count == res.target_count
    assert res.ok is False
    assert res.column_drift == ["r_name"]


def test_snapshot_jdbc_rejects_partition_without_bounds(spark):
    import pytest as _pt

    from synch_spark.pipeline import snapshot_jdbc

    with _pt.raises(ValueError, match="lower_bound"):
        snapshot_jdbc(spark, "jdbc:derby:memory:x", "t",
                      partition_column="id")
