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
