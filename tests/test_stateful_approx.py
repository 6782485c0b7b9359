"""Stateful streaming operator + approximate-sketch accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from synch_spark.session import read_table


def test_streaming_first_per_key_matches_batch(spark):
    from synch_spark.plans.advanced import q35_streaming_first_per_key

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: r["first_ts"]
        for r in q35_streaming_first_per_key(spark, sf).collect()
    }
    ev = read_table(spark, sf, "events")
    expected = {
        r["user_id"]: r["first_ts"]
        for r in ev.groupBy("user_id").agg(F.min("ts").alias("first_ts")).collect()
    }
    assert got == expected


def test_approx_sketches_within_bounds(spark):
    li = read_table(spark, "/root/testdata/sf0.01", "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_partkey").alias("a"),
        F.percentile_approx("l_extendedprice", 0.5).alias("m"),
    ).collect()[0]
    exact = li.agg(
        F.countDistinct("l_partkey").alias("e"),
        F.percentile("l_extendedprice", 0.5).alias("m"),
    ).collect()[0]
    assert abs(approx["a"] - exact["e"]) / exact["e"] < 0.05  # HLL default rsd 5%
    assert abs(approx["m"] - exact["m"]) / exact["m"] < 0.05


def test_range_join_symmetric_window(spark):
    """A pair exactly at the gap boundary is included; beyond is not."""
    import datetime as dt

    from synch_spark.operators.rangejoin import time_range_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (1, 2, base + dt.timedelta(seconds=60)),   # exactly at gap
        (1, 3, base + dt.timedelta(seconds=121)),  # 61s from 2: beyond gap
    ]
    df = spark.createDataFrame(rows, ["u", "event_id", "ts"])
    left = df.select("u", F.col("event_id").alias("a"), F.col("ts").alias("ta"))
    right = df.select(
        F.col("u").alias("u2"), F.col("event_id").alias("b"), F.col("ts").alias("tb")
    )
    out = time_range_join(
        left, right, "ta", "tb", 60,
        extra_cond=(F.col("u") == F.col("u2")) & (F.col("a") < F.col("b")),
    )
    pairs = {(r["a"], r["b"]) for r in out.select("a", "b").distinct().collect()}
    assert pairs == {(1, 2)}  # 60s inclusive; 61s excluded
