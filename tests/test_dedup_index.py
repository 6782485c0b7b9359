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


@pytest.mark.slow
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


@pytest.mark.slow
def test_signature_store_persists_and_rescoring_filters(spark, index):
    corpus = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C)], ["doc_id", "text"]
    )
    index.build(corpus)
    # one signature row per (doc, seed)
    assert index.signatures.count() == 3 * index.num_hashes
    # rescore a known near-dup pair vs a known unrelated pair — only from
    # stored signatures, no text access
    pairs = spark.createDataFrame(
        [(10, 1), (10, 2)], ["new_id", "dup_of"]
    )
    batch = spark.createDataFrame([(10, DOC_A2)], ["doc_id", "text"])
    extra = __import__(
        "synch_spark.operators.dedup_index", fromlist=["build_signatures"]
    ).build_signatures(batch, "text", "doc_id")
    est = {
        (r["new_id"], r["dup_of"]): r["est_jaccard"]
        for r in index.estimate_jaccard(pairs, extra_sig=extra).collect()
    }
    assert est[(10, 1)] > est[(10, 2)]
    assert est[(10, 1)] >= 0.5
    # threshold check keeps the near-dup, drops nothing real
    refined = index.check(batch, min_est_jaccard=0.5)
    got = {(r["new_id"], r["dup_of"]) for r in refined.collect()}
    assert (10, 1) in got
    assert all(r["est_jaccard"] >= 0.5 for r in refined.collect())


def test_add_appends_both_tables(spark, index):
    index.build(spark.createDataFrame([(1, DOC_A)], ["doc_id", "text"]))
    index.add(spark.createDataFrame([(2, DOC_B)], ["doc_id", "text"]))
    assert index.signatures.count() == 2 * index.num_hashes
    sig_ids = {r["id"] for r in index.signatures.read().select("id").distinct().collect()}
    bucket_ids = {r["id"] for r in index.table.read().select("id").distinct().collect()}
    assert sig_ids == bucket_ids == {1, 2}


def test_check_on_empty_index(spark, index):
    batch = spark.createDataFrame([(1, DOC_A), (2, DOC_A)], ["doc_id", "text"])
    dups = {(r["new_id"], r["dup_of"]) for r in index.check(batch).collect()}
    assert dups == {(2, 1)}  # in-batch exact dup, no index yet


@pytest.mark.slow
def test_leakage_safe_split_repairs_pair_leakage(spark):
    """After cluster-aware assignment, NO near-dup pair straddles the
    split (the q96 audit's repair); singletons still split ~train_frac."""
    from pyspark.sql import functions as F

    from synch_spark.operators import dedup

    # token-disjoint singletons: unigram Jaccard between any two is 0,
    # so the clustering must leave them out of every cluster
    rows = [
        (i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h")
        for i in range(40)
    ]
    # two near-dup families the clustering will connect
    rows += [(100, "a b c d e f g h"), (101, "a b c d e f g x"),
             (102, "a b c d e f g y"), (200, "p q r s t u v w"),
             (201, "p q r s t u v z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_pairs(docs, "text", "doc_id", threshold=0.5, n=1)
    clusters = dedup.cluster_duplicates(pairs)
    out = dedup.leakage_safe_split(docs, clusters)
    split = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(split) == 45
    leaking = [
        (r["a"], r["b"]) for r in pairs.collect()
        if split[r["a"]] != split[r["b"]]
    ]
    assert leaking == []
    # family members share one assignment
    assert len({split[i] for i in (100, 101, 102)}) == 1
    assert len({split[i] for i in (200, 201)}) == 1
    # both labels actually occur across the corpus
    assert set(split.values()) == {"train", "val"}
    # singletons must keep their per-doc CONTENT-hash assignment (the
    # repair never reshuffles untouched documents), and cluster members
    # must take their representative's content-hash assignment
    plain = {
        r["doc_id"]: r["split"]
        for r in docs.withColumn(
            "split", dedup.content_split(F.col("text"))
        ).collect()
    }
    clustered_ids = {r["id"] for r in clusters.collect()}
    for i, s in split.items():
        if i not in clustered_ids:
            assert s == plain[i], f"singleton {i} moved"
    # members take the CONTENT-level representative's assignment: the
    # member text with the smallest md5 within the cluster
    import hashlib

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    cluster_of = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    members_by_cluster: dict = {}
    for i, c in cluster_of.items():
        members_by_cluster.setdefault(c, []).append(i)
    for c, members in members_by_cluster.items():
        key_text = min(
            (texts[i] for i in members),
            key=lambda t: hashlib.md5(t.encode()).hexdigest(),
        )
        for i in members:
            assert split[i] == plain[
                [j for j in members if texts[j] == key_text][0]
            ], f"member {i} != its content representative"


def test_leakage_safe_split_survives_missing_representative(spark):
    """An id-keyed representative lookup silently degraded every member
    to per-doc hashing when the min-id member's row was absent from df;
    the content-level key must keep the remaining members co-located."""
    from pyspark.sql import functions as F

    from synch_spark.operators import dedup

    rows = [(100, "a b c d e f g h"), (101, "a b c d e f g x"),
            (102, "a b c d e f g y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_pairs(docs, "text", "doc_id", threshold=0.5, n=1)
    clusters = dedup.cluster_duplicates(pairs)
    assert {r["cluster_id"] for r in clusters.collect()} == {100}
    # drop the min-id representative's row from the corpus being split
    out = dedup.leakage_safe_split(docs.filter(F.col("doc_id") != 100), clusters)
    split = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len({split[101], split[102]}) == 1, "members must still co-locate"


@pytest.mark.slow
def test_remove_unindexes_both_stores(spark, index):
    """remove(): a taken-down doc stops matching its near-dup and its
    rows leave BOTH stores; the remaining corpus is untouched."""
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C)], "doc_id long, text string")
    index.build(docs)
    probe = spark.createDataFrame([(10, DOC_A2)], "doc_id long, text string")
    assert {(r["new_id"], r["dup_of"])
            for r in index.check(probe).collect()} == {(10, 1)}

    index.remove(spark.createDataFrame([(1,)], "doc_id long"))
    assert index.check(probe).count() == 0, "removed doc still matches"
    assert index.table.read().filter("id = 1").count() == 0
    assert index.signatures.read().filter("id = 1").count() == 0
    assert index.table.read().filter("id = 2").count() == index.bands
    assert index.signatures.read().filter("id = 2").count() == index.num_hashes
    # re-adding after removal re-admits (takedown is not a tombstone)
    admitted = index.ingest(spark.createDataFrame(
        [(1, DOC_A)], "doc_id long, text string"))
    assert admitted.count() == 1


@pytest.mark.slow
def test_apply_changes_update_reshingles_and_is_idempotent(spark, index):
    """An update postimage replaces the doc's signature and bucket rows
    in place (same row counts, new content), and replaying the feed is
    a no-op."""
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B)], "doc_id long, text string")
    index.build(docs)
    n_sig = index.signatures.count()
    n_buck = index.table.count()
    feed = spark.createDataFrame(
        [(1, DOC_C, "update_postimage")],
        "doc_id long, text string, _change_type string")
    index.apply_changes(feed)
    index.apply_changes(feed)  # at-least-once replay
    assert index.signatures.count() == n_sig
    assert index.table.count() == n_buck
    # doc 1 now matches DOC_C's near-identical text, not DOC_A's
    probe_a = spark.createDataFrame([(10, DOC_A2)], "doc_id long, text string")
    assert index.check(probe_a).count() == 0
    probe_c = spark.createDataFrame([(11, DOC_C)], "doc_id long, text string")
    assert {(r["new_id"], r["dup_of"])
            for r in index.check(probe_c).collect()} == {(11, 1)}


@pytest.mark.slow
def test_sync_from_change_feed(spark, index, tmp_path):
    """Index follows a CDC-maintained documents table end-to-end:
    initial sync builds, a merge batch (delete + update) syncs
    incrementally, a no-change sync commits nothing."""
    from pyspark.sql import functions as F

    from synch_spark.config import Engine, TableSpec
    from synch_spark.operators.cdc_apply import apply_cdc_batch
    from synch_spark.sources.table import ParquetTable

    spec = TableSpec(schema="db", table="docs", pk=("doc_id",),
                     engine=Engine.REPLACING_MERGE_TREE)
    t = ParquetTable(spark, str(tmp_path / "docs"), retain=4)
    t.overwrite(spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C)], "doc_id long, text string"))
    assert index.sync_from(t) == t.current_version()
    probe = spark.createDataFrame([(10, DOC_A2)], "doc_id long, text string")
    assert index.check(probe).count() == 1

    batch = spark.createDataFrame(
        [("delete", 1, None, 1), ("insert", 2, DOC_A, 2)],
        "action string, doc_id long, text string, event_unixtime long",
    ).withColumn("action_seq", F.lit(0)) \
     .withColumn("schema", F.lit("db")).withColumn("table", F.lit("docs"))
    apply_cdc_batch(t, batch, spec, value_columns=["doc_id", "text"])
    index.sync_from(t)
    got = {(r["new_id"], r["dup_of"]) for r in index.check(probe).collect()}
    assert got == {(10, 2)}, "sync missed the delete or the update"
    sv, bv = index.signatures.current_version(), index.table.current_version()
    index.sync_from(t)  # no-op
    assert (index.signatures.current_version(),
            index.table.current_version()) == (sv, bv)


@pytest.mark.slow
def test_apply_changes_per_commit_feed_delete_then_reinsert(spark, index):
    """Per-commit feed with delete@N then re-insert@N+1 of the same doc:
    the apply collapses to the latest change, so the doc stays indexed
    (and insert-then-delete stays gone)."""
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B)], "doc_id long, text string")
    index.build(docs)
    feed = spark.createDataFrame(
        [(1, None, "delete", 1), (1, DOC_A, "insert", 2),
         (2, DOC_B, "insert", 1), (2, None, "delete", 2)],
        "doc_id long, text string, _change_type string, _commit_version long")
    index.apply_changes(feed)
    assert index.signatures.read().filter("id = 1").count() == index.num_hashes
    assert index.signatures.read().filter("id = 2").count() == 0
    assert index.table.read().filter("id = 2").count() == 0
    probe = spark.createDataFrame([(10, DOC_A2)], "doc_id long, text string")
    assert index.check(probe).count() == 1

def test_remove_clears_trailing_band_with_nondivisible_config(spark, tmp_path):
    """num_hashes=10, bands=4 -> buckets_of_signatures emits band ids
    0..4 (seed//2); a remove that expanded only range(bands) left the
    (id, band=4) row live, so a taken-down doc kept suppressing its
    near-dups forever."""
    from synch_spark.operators.dedup_index import DedupIndex, n_band_ids

    assert n_band_ids(10, 4) == 5
    assert n_band_ids(8, 4) == 4
    idx = DedupIndex(spark, str(tmp_path / "idx"), num_hashes=10, bands=4)
    docs = spark.createDataFrame([(1, DOC_A), (2, DOC_B)],
                                 "doc_id long, text string")
    idx.build(docs)
    assert idx.table.read().filter("id = 1").count() == 5  # 5 real bands
    idx.remove(spark.createDataFrame([(1,)], "doc_id long"))
    assert idx.table.read().filter("id = 1").count() == 0, \
        "trailing band row survived the remove"
    assert idx.signatures.read().filter("id = 1").count() == 0


def test_band_config_validation(spark, tmp_path):
    import pytest as _pt

    from synch_spark.operators.dedup_index import DedupIndex

    with _pt.raises(ValueError, match="bands"):
        DedupIndex(spark, str(tmp_path / "bad"), num_hashes=4, bands=8)


def test_estimate_jaccard_prefers_batch_signatures(spark, index):
    """A checked batch that re-submits an INDEXED id with changed text:
    the batch signatures must replace the stored ones for that id, not
    union with them (mixed old/new rows dilute the estimate)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1, DOC_A), (2, DOC_B)],
                                 "doc_id long, text string")
    index.build(docs)
    # id 1 re-submitted with id 2's text: signature agreement vs id 2
    # must be EXACTLY 1.0 (identical text), not diluted by the stored
    # old signatures of id 1
    resub = spark.createDataFrame([(1, DOC_B)], "doc_id long, text string")
    extra = index._sig(resub, "text", "doc_id")
    pairs = spark.createDataFrame([(1, 2)], "new_id long, dup_of long")
    got = index.estimate_jaccard(pairs, extra_sig=extra).collect()
    assert len(got) == 1 and got[0]["est_jaccard"] == 1.0, got
