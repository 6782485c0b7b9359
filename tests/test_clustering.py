"""Connected-components dedup clustering vs a driver-side union-find oracle."""

from __future__ import annotations


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node -> min of its component
    return {x: find(x) for x in list(parent)}


def test_cluster_duplicates_matches_union_find(spark):
    from synch_spark.operators.dedup import cluster_duplicates

    pairs = [
        (1, 2), (2, 3),          # chain -> cluster 1
        (10, 11),                 # pair -> cluster 10
        (20, 21), (22, 21), (23, 20),  # star/chain -> cluster 20
        (30, 40), (40, 50), (50, 60), (60, 70),  # long chain (diameter test)
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    expected = _union_find(pairs)
    # small graph -> local union-find path
    got = {r["id"]: r["cluster_id"] for r in cluster_duplicates(df).collect()}
    assert got == expected
    # threshold 0 forces the distributed label-propagation path
    got_dist = {
        r["id"]: r["cluster_id"]
        for r in cluster_duplicates(df, local_threshold=0).collect()
    }
    assert got_dist == expected


def test_dedup_by_clusters_keeps_representatives(spark):
    from synch_spark.operators.dedup import dedup_by_clusters

    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 10, 11, 99]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["a", "b"])
    kept = {r["doc_id"] for r in dedup_by_clusters(docs, pairs, "doc_id").collect()}
    assert kept == {1, 10, 99}  # min-id reps + untouched doc


def test_wide_lsh_matches_narrow_form_nondivisible(spark):
    """num_hashes % bands != 0: the wide one-shuffle form must emit the
    SAME candidate pairs as the narrow per-seed form, including the
    remainder band built from the leftover seeds."""
    from pyspark.sql import functions as F

    from synch_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 7} jumps over dog {i % 5}")
         for i in range(60)],
        "doc_id long, text string",
    )
    wide = {tuple(r) for r in lsh_candidate_pairs(
        docs, "text", "doc_id", num_hashes=10, bands=4, shingle_n=2
    ).collect()}

    # narrow reference: per-seed signatures -> band = seed // rpb
    rpb = 10 // 4
    sig = minhash_signatures(shingles(docs, "text", "doc_id", 2), 10)
    buckets = (
        sig.withColumn("band", (F.col("seed") / rpb).cast("int"))
        .groupBy("id", "band")
        .agg(F.concat_ws("|", F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "h"))),
            lambda x: x["h"])).alias("bucket"))
    )
    a = buckets.select(F.col("id").alias("a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("b"), "band", "bucket")
    narrow = {
        tuple(r) for r in a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b")).select("a", "b").distinct().collect()
    }
    assert wide == narrow and narrow  # non-empty and identical
