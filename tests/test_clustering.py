"""Connected-components dedup clustering vs a driver-side union-find oracle."""

from __future__ import annotations
import pytest


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


@pytest.mark.slow
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


def test_lsh_bucket_size_cap_bounds_degenerate_buckets(spark):
    """Skew guard: 60 identical (boilerplate) docs all land in the same
    LSH buckets — uncapped that is one 60-element bucket row expanding to
    ~1770 pairs per band. With max_bucket_size below 60 the bucket is
    dropped (bounded output, observed drop count measured in the same
    job); with the cap above 60 every pair survives unchanged."""
    from pyspark.sql import Observation

    from synch_spark.operators.dedup import lsh_candidate_pairs

    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(60)]
    rows += [(100, "a genuinely different document about spark execution"),
             (101, "a genuinely different document about spark execution")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    obs = Observation("lsh-cap")
    capped = lsh_candidate_pairs(docs, "text", "doc_id", 8, 4, 3,
                                 max_bucket_size=32, observation=obs)
    got = {tuple(r) for r in capped.collect()}
    # the mega-bucket's 1770 pairs are gone; the honest near-dup remains
    assert got == {(100, 101)}
    from synch_spark.operators.dedup import observed_dropped_buckets
    assert observed_dropped_buckets(obs) >= 1
    # cap above the bucket size: byte-identical to the uncapped plan
    uncapped = {tuple(r) for r in lsh_candidate_pairs(
        docs, "text", "doc_id", 8, 4, 3).collect()}
    above = {tuple(r) for r in lsh_candidate_pairs(
        docs, "text", "doc_id", 8, 4, 3, max_bucket_size=100).collect()}
    assert above == uncapped
    assert (100, 101) in uncapped and len(uncapped) > 1000


def test_gram_max_df_bounds_hot_gram_fanout(spark):
    """max_df drops ubiquitous grams before the inverted-index
    self-join: a stop-gram present in every one of 80 docs would alone
    key an 80^2 join; with max_df=10 the join fans out only over the
    rare grams, and pairs sharing nothing BUT the stop-gram disappear.
    With the cap off, results are exact (the oracle-parity default)."""
    from synch_spark.operators.dedup import jaccard_pairs

    # every doc contains the hot token; docs pair up via a rare token
    rows = [(i, f"hot rare{i // 2}") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = jaccard_pairs(docs, "text", "doc_id", threshold=0.5, n=1,
                           max_df=10)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    # exactly the rare-token partners (2i, 2i+1); jaccard over the
    # filtered vocabulary is 1.0 for them
    assert got == {(2 * i, 2 * i + 1) for i in range(40)}
    # uncapped: same 40 true pairs at threshold 0.5 — but computed over
    # the full vocabulary (hot gram included), jaccard 1/3 pairs pruned
    full = jaccard_pairs(docs, "text", "doc_id", threshold=0.5, n=1)
    assert {(r["a"], r["b"]) for r in full.collect()} == got


def test_gram_max_df_auto_default(spark, monkeypatch):
    """The default max_df="auto" derives the cap from corpus size
    (max(floor, frac*n_docs)): inert on a corpus where no gram exceeds
    the floor (identical to max_df=None), active on a ubiquitous gram
    once the floor drops below its document frequency — the graded
    q20/q104 plan IS the 100 TB plan, not an uncapped variant."""
    from synch_spark.operators import dedup
    from synch_spark.operators.dedup import jaccard_pairs

    rows = [(i, f"hot rare{i // 2}") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # floor 1000 >> any fixture df: auto must equal the exact (None) run
    auto = {(r["a"], r["b"]) for r in jaccard_pairs(
        docs, "text", "doc_id", threshold=0.3, n=1).collect()}
    exact = {(r["a"], r["b"]) for r in jaccard_pairs(
        docs, "text", "doc_id", threshold=0.3, n=1, max_df=None).collect()}
    assert auto == exact and len(auto) > 40  # hot-gram pairs included

    # tighten the floor below the hot gram's df=80: auto now drops it
    monkeypatch.setattr(dedup, "_AUTO_MAX_DF_FLOOR", 10)
    capped = {(r["a"], r["b"]) for r in jaccard_pairs(
        docs, "text", "doc_id", threshold=0.3, n=1).collect()}
    assert capped == {(2 * i, 2 * i + 1) for i in range(40)}

def test_gram_max_df_auto_cross_engine_when_cap_binds(spark, monkeypatch):
    """The graded q20 oracle MIRRORS the operator's auto df-cap, so the
    two engines stay hash-equal even at a scale where the cap BINDS
    (the fixture never exercises that: max 3-gram df ~7 vs floor 1000).
    Tighten the floor on both sides over a synthetic corpus with a
    ubiquitous 3-gram block: the hot grams alone push non-twin pairs to
    jaccard 0.6 uncapped, and the capped run drops them — Spark and
    DuckDB must agree on the CAPPED result, and that result must differ
    from the uncapped one (i.e. the cap demonstrably bound)."""
    import duckdb
    import pandas as pd

    from synch_spark.operators import dedup
    from synch_spark.operators.dedup import jaccard_pairs
    from synch_spark.plans import dataops

    # 12 docs sharing a 5-token hot prefix (3 hot grams, df=12 each,
    # plus one unique-tail gram) + 4 twin pairs of identical rare text
    rows = [(i, f"h1 h2 h3 h4 h5 u{i}") for i in range(12)]
    rows += [(base + j, f"r{base}a r{base}b r{base}c r{base}d")
             for base in (100, 110, 120, 130) for j in (0, 1)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)

    monkeypatch.setattr(dedup, "_AUTO_MAX_DF_FLOOR", 5)
    capped = {(r["a"], r["b"], round(r["jaccard"], 9))
              for r in jaccard_pairs(
                  docs, "text", "doc_id", threshold=0.6, n=3,
                  probe_filter=lambda a: a % 10 == 0).collect()}
    uncapped = {(r["a"], r["b"], round(r["jaccard"], 9))
                for r in jaccard_pairs(
                    docs, "text", "doc_id", threshold=0.6, n=3,
                    probe_filter=lambda a: a % 10 == 0,
                    max_df=None).collect()}

    # the graded oracle with the SAME tightened floor
    sql = dataops.Q20_SQL.replace("GREATEST(1000,", "GREATEST(5,")
    assert sql != dataops.Q20_SQL, "floor placeholder moved; fix the test"
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {(a, b, round(j, 9)) for a, b, j in
              con.execute(sql).fetchall()}
    con.close()

    want_twins = {(b, b + 1, 1.0) for b in (100, 110, 120, 130)}
    assert capped == oracle == want_twins
    # the hot-gram pairs existed uncapped — the cap demonstrably bound
    assert capped < uncapped and (0, 1, 0.6) in uncapped


def test_gram_max_df_auto_absolute_ceiling_binds(spark, monkeypatch):
    """The auto cap has an ABSOLUTE ceiling (_AUTO_MAX_DF_CEIL), not
    just the fractional term: frac*n scales linearly with the corpus,
    so at 10^10 docs one stop-gram's posting list would hit 10^7 ids in
    a single collect_list buffer and cap^2 = 10^14 generated pairs.
    Tighten the CEILING below the hot gram's df while the FLOOR stays
    at its default 1000 (which alone would keep the hot gram): the
    ceiling must win, the hot pairs must drop, and the mirrored DuckDB
    oracle with the same tightened ceiling must agree hash-exactly."""
    import duckdb
    import pandas as pd

    from synch_spark.operators import dedup
    from synch_spark.operators.dedup import jaccard_pairs
    from synch_spark.plans import dataops

    # same corpus shape as the floor test: 12 docs share 3 hot 3-grams
    # (df=12) + 4 twin pairs of unique rare text
    rows = [(i, f"h1 h2 h3 h4 h5 u{i}") for i in range(12)]
    rows += [(base + j, f"r{base}a r{base}b r{base}c r{base}d")
             for base in (100, 110, 120, 130) for j in (0, 1)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)

    assert dedup._AUTO_MAX_DF_FLOOR == 1000  # floor alone keeps df=12
    monkeypatch.setattr(dedup, "_AUTO_MAX_DF_CEIL", 5)
    capped = {(r["a"], r["b"], round(r["jaccard"], 9))
              for r in jaccard_pairs(
                  docs, "text", "doc_id", threshold=0.6, n=3,
                  probe_filter=lambda a: a % 10 == 0).collect()}
    uncapped = {(r["a"], r["b"], round(r["jaccard"], 9))
                for r in jaccard_pairs(
                    docs, "text", "doc_id", threshold=0.6, n=3,
                    probe_filter=lambda a: a % 10 == 0,
                    max_df=None).collect()}

    # the graded oracle with the SAME tightened ceiling
    sql = dataops.Q20_SQL.replace("           100000) AS cap",
                                  "           5) AS cap")
    assert sql != dataops.Q20_SQL, "ceil placeholder moved; fix the test"
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {(a, b, round(j, 9)) for a, b, j in
              con.execute(sql).fetchall()}
    con.close()

    want_twins = {(b, b + 1, 1.0) for b in (100, 110, 120, 130)}
    assert capped == oracle == want_twins
    # uncapped keeps the hot pairs — the CEILING (not the floor) bound
    assert capped < uncapped and (0, 1, 0.6) in uncapped


def test_keep_best_representative_scores_ties_and_singletons(spark):
    """keep_best_representative keeps the highest-scoring doc per
    cluster (ties -> lowest id), labels singletons with their own id,
    and annotates cluster_size."""
    from synch_spark.operators.dedup import keep_best_representative

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50),        # cluster {1,2,3}: 2 and 3 tie
         (10, 7), (11, 9),                 # cluster {10,11}: 11 wins
         (99, 1)],                         # singleton
        ["doc_id", "score"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["a", "b"])
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["score"])
           for r in keep_best_representative(
               docs, pairs, "doc_id", "score").collect()}
    assert got == {
        2: (1, 3, 50),    # highest score, tie broken by lower id vs 3
        11: (10, 2, 9),
        99: (99, 1, 1),   # singleton is its own cluster
    }

def test_exact_span_contamination_anchor_and_boundaries(spark):
    """Exact-span confirm semantics: full token-sequence containment
    only — a shared anchor gram without the full span must NOT flag
    (the q68-style over-flagging this operator exists to avoid), token
    boundaries are guarded (no mid-token matches), spans match at doc
    start/end, and sub-anchor probes drop."""
    from synch_spark.operators.dedup import exact_span_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),   # contains probe A fully
         (2, "alpha beta gamma zeta"),            # anchor only -> no flag
         (3, "x y z alpha beta gamma delta"),     # probe A at doc END
         (4, "prealpha beta gamma delta blah"),   # boundary: 'prealpha' != 'alpha'
         (5, "unrelated text entirely here")],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame(
        [(100, "alpha beta gamma delta"),  # 4 tokens, anchor = first 3
         (101, "y z"),                     # < anchor_n -> dropped
         (102, "unrelated text entirely here")],  # whole-doc span
        ["probe_id", "span"],
    )
    got = {(r["doc_id"], r["probe_id"])
           for r in exact_span_contamination(
               docs, probes, "doc_id", "text", "probe_id", "span",
               anchor_n=3).collect()}
    assert got == {(1, 100), (3, 100), (5, 102)}, got


def test_cluster_local_gate_is_byte_aware(spark):
    """Wide string ids must take the distributed path even when the edge
    COUNT is under the local threshold — 2M edges of 100-char ids is
    hundreds of MB of driver heap. Both paths agree on the labels."""
    from synch_spark.operators.dedup import cluster_duplicates

    wide = "x" * 200
    pairs = spark.createDataFrame(
        [(f"{wide}{i}", f"{wide}{i + 1}") for i in range(0, 40, 2)],
        ["a", "b"],
    )
    # byte gate trips (40 edges x ~800 chars > 16KB): distributed path
    dist = {(r["id"], r["cluster_id"]) for r in cluster_duplicates(
        pairs, local_bytes=16 << 10).collect()}
    local = {(r["id"], r["cluster_id"]) for r in cluster_duplicates(
        pairs).collect()}
    assert dist == local and len(dist) == 40
