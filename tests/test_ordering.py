"""operators.ordering: distributed global row_number / ntile must be
bit-identical to the single-partition window versions."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from synch_spark.operators.ordering import global_ntile, global_row_number


@pytest.fixture(scope="module")
def spark():
    from synch_spark.session import get_spark

    return get_spark("test-ordering", cpus=8)


def _data(spark, n=5000):
    # deliberately skewed + tied keys plus a unique tiebreaker
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )


def test_global_row_number_matches_window(spark):
    df = _data(spark)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, ["h", "id"], small_bytes=0).select("id", "rn").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("h", "id"))
        ).select("id", "rn").collect()
    }
    assert got == want


def test_global_row_number_desc_order(spark):
    df = _data(spark, 999)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, [F.col("k").desc(), "id"], small_bytes=0)
        .select("id", "rn")
        .collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("k").desc(), "id"))
        ).select("id", "rn").collect()
    }
    assert got == want


@pytest.mark.parametrize("n,buckets", [(5000, 10), (97, 10), (1003, 7), (4, 10)])
def test_global_ntile_matches_window(spark, n, buckets):
    df = _data(spark, n)
    got = {
        r["id"]: r["bucket"]
        for r in global_ntile(df, ["h", "id"], buckets, small_bytes=0).select("id", "bucket").collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(buckets).over(Window.orderBy("h", "id"))
        ).select("id", "b").collect()
    }
    assert got == want


def test_no_single_partition_window_in_plan(spark):
    """The point of the operator: above the small-input cutoff, the
    physical plan must not contain a partition-less Window (which Spark
    executes on one task)."""
    df = _data(spark)
    plan = (
        global_row_number(df, ["h", "id"], small_bytes=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_small_input_takes_window_path_and_matches(spark):
    # default cutoff: a tiny input must take the one-stage window path
    df = _data(spark, 500).repartition(1)
    gdf = global_row_number(df, ["h", "id"])
    assert "Window" in gdf._jdf.queryExecution().executedPlan().toString()
    got = {r["id"]: r["rn"] for r in gdf.select("id", "rn").collect()}
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("h", "id"))
        ).select("id", "rn").collect()
    }
    assert got == want
