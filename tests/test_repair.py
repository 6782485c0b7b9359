"""Backfill repair: drifted replica + fresh snapshot -> parity restored."""

from __future__ import annotations

from pyspark.sql import functions as F

from synch_spark.config import TableSpec
from synch_spark.pipeline import check, etl_full, repair
from synch_spark.session import read_table
from synch_spark.sources.table import ParquetTable


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
    source = read_table(spark, "/root/testdata/sf0.001", "region")
    t = ParquetTable(spark, str(tmp_path / "r"))
    no_pk = TableSpec(schema="db", table="region", pk=())
    assert etl_full(source, t, no_pk) is False  # no pk -> skipped
    spec = TableSpec(schema="db", table="region", pk=("r_regionkey",), auto_full_etl=False)
    assert etl_full(source, t, spec) is True  # not exists yet -> runs
    assert etl_full(source, t, spec) is False  # exists + auto off -> skipped
    assert etl_full(source, t, spec, renew=True) is True  # renew forces
