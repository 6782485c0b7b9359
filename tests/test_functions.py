"""The public column-function library: every export importable and the
hash/numeric primitives behaviorally correct."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row, functions as F

import synch_spark.functions as fn


def test_all_exports_resolve():
    for name in fn.__all__:
        assert getattr(fn, name) is not None


def test_sign_of(spark):
    df = spark.createDataFrame(
        [("insert",), ("update",), ("delete",)], ["action"]
    ).select(fn.sign_of("action").alias("s"))
    assert [r["s"] for r in df.collect()] == [1, 1, -1]


def test_null_safe_row_hash_sees_null_position(spark):
    # (NULL, 'x') and ('x', NULL) must hash differently — the trap the
    # raw xxhash64(col, col) form falls into.
    df = spark.createDataFrame(
        [Row(a=None, b="x"), Row(a="x", b=None)], "a string, b string"
    ).select(fn.null_safe_row_hash(["a", "b"]).alias("h"))
    h1, h2 = [r["h"] for r in df.collect()]
    assert h1 != h2


def test_null_safe_row_hash_projection_order_invariant(spark):
    one = spark.createDataFrame([Row(a="p", b="q")]).select(
        fn.null_safe_row_hash(["a", "b"]).alias("h")
    )
    two = spark.createDataFrame([Row(b="q", a="p")]).select(
        fn.null_safe_row_hash(["b", "a"]).alias("h")
    )
    assert one.first()["h"] == two.first()["h"]


def test_checksum_agg_order_insensitive_and_value_sensitive(spark):
    rows = [Row(k=i, v=f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows)
    b = spark.createDataFrame(list(reversed(rows))).repartition(7)
    ck = lambda df: df.agg(fn.checksum_agg(df.columns).alias("c")).first()["c"]
    assert ck(a) == ck(b)
    mutated = spark.createDataFrame(rows[:-1] + [Row(k=99, v="OTHER")])
    assert ck(a) != ck(mutated)


def test_decimal_sum_and_net_price_exact(spark):
    df = spark.createDataFrame(
        [(10.10, 0.05), (20.20, 0.10)], ["price", "disc"]
    )
    got = df.agg(
        fn.decimal_sum("price").alias("s"),
        F.sum(fn.net_price("price", "disc")).alias("rev"),
    ).first()
    assert got["s"] == Decimal("30.30")
    # 10.10*0.95 + 20.20*0.90 = 9.5950 + 18.1800 exactly
    assert got["rev"] == Decimal("27.7750")


def test_text_functions_smoke(spark):
    df = spark.createDataFrame([("the quick brown fox",)], ["text"])
    row = df.select(
        fn.token_count("text").alias("tc"),
        fn.char_count("text").alias("cc"),
        fn.stopword_ratio("text").alias("sr"),
        fn.fingerprint("text").alias("fp"),
    ).first()
    assert row["tc"] == 4
    assert row["cc"] == 19
    assert 0.0 < row["sr"] <= 1.0
    assert row["fp"] is not None
