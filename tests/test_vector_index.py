"""Persisted IVF vector index: exactness at full probe, recall at partial
probe, incremental add, and partition-pruned bucket reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from synch_spark.operators.similarity import cosine_topk
from synch_spark.operators.vector_index import VectorIndex
from synch_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


def test_full_probe_equals_exact(spark, tmp_path):
    emb = _emb(spark)
    idx = VectorIndex(spark, str(tmp_path / "ivf"), num_centroids=8)
    idx.build(emb)
    probes = emb.filter(F.col("vec_id") < 5)
    got = idx.search(probes, k=5, nprobe=8)
    want = cosine_topk(emb, probes, k=5)
    as_set = lambda df: {
        (r["probe_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)


def test_partial_probe_recall(spark, tmp_path):
    emb = _emb(spark)
    idx = VectorIndex(spark, str(tmp_path / "ivf"), num_centroids=8)
    idx.build(emb)
    probes = emb.filter(F.col("vec_id") < 10)
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in idx.search(probes, k=5, nprobe=4).collect()
    }
    want = {
        (r["probe_id"], r["neighbor_id"])
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall  # random embeddings; half the buckets probed


def test_incremental_add_is_searchable(spark, tmp_path):
    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = VectorIndex(spark, str(tmp_path / "ivf"), num_centroids=8)
    idx.build(old)
    idx.add(new)
    probes = emb.filter(F.col("vec_id") < 3)
    res = idx.search(probes, k=50, nprobe=8)
    found = {r["neighbor_id"] for r in res.collect()}
    assert any(n % 2 == 1 for n in found)  # added vectors are reachable
    n_old, n_new = old.count(), new.count()
    assert idx.assignments.count() == n_old + n_new


def test_refined_build_full_probe_is_exact(spark, tmp_path):
    """k-means refinement changes the bucketing, never the full-probe
    answer: probing every bucket + exact rescore is bucket-agnostic."""
    emb = _emb(spark)
    idx = VectorIndex(spark, str(tmp_path / "ivf"), num_centroids=8)
    idx.build(emb, refine_iters=2)
    n_cents = idx.centroids.count()
    assert 1 <= n_cents <= 8
    # refined centroids keep the corpus dimensionality
    dim = len(emb.select("embedding").first()[0])
    cdim = idx.centroids.read().select(F.size("cvec").alias("d")).distinct().collect()
    assert [r["d"] for r in cdim] == [dim]
    # every vector is still indexed exactly once
    assert idx.assignments.count() == emb.count()
    probes = emb.filter(F.col("vec_id") < 5)
    got = idx.search(probes, k=5, nprobe=n_cents)
    want = cosine_topk(emb, probes, k=5)
    as_set = lambda df: {
        (r["probe_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)


def test_quantized_search_matches_float_path(spark, tmp_path):
    """int8-ranked index search at full probe: high recall vs the exact
    operator, identical cosines on shared pairs (rescore is float), and
    the ranking scan reads the int8 column, not the float vectors."""
    emb = _emb(spark)
    idx = VectorIndex(spark, str(tmp_path / "ivf"), num_centroids=8)
    idx.build(emb)
    assert "_q" in idx.assignments.read().columns
    n_cents = idx.centroids.count()
    probes = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, probes, k=5)
    quant = idx.search(probes, k=5, nprobe=n_cents, quantized=True)
    e = {(r["probe_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    q = {(r["probe_id"], r["neighbor_id"]): r["cosine"] for r in quant.collect()}
    shared = set(e) & set(q)
    assert len(shared) / len(e) >= 0.9
    assert all(e[p] == q[p] for p in shared)


def test_search_reads_only_probed_buckets(spark, tmp_path):
    """The index read must partition-prune to the probed cids."""
    emb = _emb(spark)
    idx = VectorIndex(spark, str(tmp_path / "ivf"), num_centroids=8)
    idx.build(emb)
    pruned = idx.assignments.read().filter(F.col("_cid").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cid" in plan
    assert pruned.select("_cid").distinct().count() <= 2
