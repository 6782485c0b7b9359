"""Incremental LSH dedup index: build, check, ingest across batches."""

from __future__ import annotations

import pytest

from synch_spark.operators.dedup_index import DedupIndex

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A2 = "the quick brown fox jumps over the lazy dog again and again tonight"  # near-dup
DOC_B = "spark engines compact parquet tables with versioned atomic swaps always"
DOC_C = "completely unrelated text about databases and distributed query planning"


@pytest.fixture()
def index(spark, tmp_path):
    return DedupIndex(spark, str(tmp_path / "idx"))


def test_build_then_check(spark, index):
    corpus = spark.createDataFrame([(1, DOC_A), (2, DOC_B)], ["doc_id", "text"])
    index.build(corpus)
    batch = spark.createDataFrame([(10, DOC_A2), (11, DOC_C)], ["doc_id", "text"])
    dups = {(r["new_id"], r["dup_of"]) for r in index.check(batch).collect()}
    assert (10, 1) in dups  # near-dup of indexed doc found
    assert not any(r[0] == 11 for r in dups)  # novel doc clean


def test_ingest_filters_and_indexes(spark, index):
    corpus = spark.createDataFrame([(1, DOC_A)], ["doc_id", "text"])
    index.build(corpus)
    batch = spark.createDataFrame(
        [(10, DOC_A2), (11, DOC_C), (12, DOC_C)], ["doc_id", "text"]
    )
    admitted = {r["doc_id"] for r in index.ingest(batch).collect()}
    assert admitted == {11}  # 10 dups the index; 12 dups 11 in-batch (11 kept)
    # the admitted doc is now indexed: a later twin is caught
    batch2 = spark.createDataFrame([(20, DOC_C)], ["doc_id", "text"])
    dups2 = {(r["new_id"], r["dup_of"]) for r in index.check(batch2).collect()}
    assert (20, 11) in dups2


def test_check_on_empty_index(spark, index):
    batch = spark.createDataFrame([(1, DOC_A), (2, DOC_A)], ["doc_id", "text"])
    dups = {(r["new_id"], r["dup_of"]) for r in index.check(batch).collect()}
    assert dups == {(2, 1)}  # in-batch exact dup, no index yet
