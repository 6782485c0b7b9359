"""Round-9 property tests: the Avro binary codec and the partial-JSON
diff reconstruction, each pinned against an INDEPENDENT implementation
(the spec-built test encoders), so a shared bug cannot self-certify."""
from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from hypothesis import HealthCheck, example, given, settings, strategies as st

from synch_spark.sources import avro_codec as A
from synch_spark.sources import binlog_file as B
from tests.binlog_builder import BinlogBuilder, JsonDiffs
from tests.test_avro_codec import ENVELOPE, _ref_encode
import pytest

_slow = settings(max_examples=60, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


# --------------------------------------------------------------------------
# Avro: envelope-shaped random values — independent encode, package
# decode AND package encode byte-parity
# --------------------------------------------------------------------------
_status = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12)
_price = st.decimals(min_value=Decimal("-999999.99"),
                     max_value=Decimal("999999.99"), places=2,
                     allow_nan=False, allow_infinity=False)
_value = st.fixed_dictionaries({
    "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "price": _price,
    "status": _status,
})
_envelope = st.fixed_dictionaries({
    "before": st.none() | _value,
    "after": st.none() | _value,
    "source": st.fixed_dictionaries({
        "db": st.text(max_size=8), "table": st.text(max_size=8),
        "ts_ms": st.integers(min_value=-(2**62), max_value=2**62),
    }),
    "op": st.sampled_from(["c", "r", "u", "d", "m"]),
    "ts_ms": st.none() | st.integers(min_value=0, max_value=2**62),
})


@_slow
@given(env=_envelope)
# the round-9 falsifying draw: unscaled -128 = -2^7 sits exactly on the
# two's-complement byte boundary, where a non-minimal encoder emits
# \xff\x80 instead of the canonical single byte \x80
@example(env={
    "before": None,
    "after": {"id": -(2**63), "price": Decimal("-1.28"), "status": ""},
    "source": {"db": "", "table": "", "ts_ms": 0},
    "op": "c", "ts_ms": None,
})
@example(env={
    "before": {"id": 0, "price": Decimal("-327.68"), "status": ""},
    "after": None,
    "source": {"db": "", "table": "", "ts_ms": 0},
    "op": "d", "ts_ms": None,
})
def test_avro_envelope_roundtrip_property(env):
    parsed = A.parse_schema(ENVELOPE)
    blob = _ref_encode(env, ENVELOPE)
    assert A.avro_decode(blob, parsed) == env
    assert A.avro_encode(env, parsed) == blob
    framed = A.confluent_frame(7, blob)
    sid, payload = A.confluent_unframe(framed)
    assert sid == 7 and payload == blob


@_slow
@given(v=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_long_zigzag_property(v):
    blob = _ref_encode(v, "long")
    assert A.avro_decode(blob, '"long"') == v
    assert A.avro_encode(v, '"long"') == blob


# --------------------------------------------------------------------------
# partial JSON: random documents + diffs derived from them — builder
# (independent encoder) -> decoder reconstruction equals direct
# test-side mutation
# --------------------------------------------------------------------------
_scalar = (st.none() | st.booleans()
           | st.integers(min_value=-(2**31), max_value=2**31 - 1)
           | st.text(max_size=6))
_doc = st.dictionaries(
    st.text(min_size=1, max_size=5).filter(
        lambda s: '"' not in s and "\\" not in s
        and "." not in s and "[" not in s and "]" not in s),
    _scalar | st.lists(_scalar, max_size=4)
    | st.dictionaries(st.text(min_size=1, max_size=4).filter(
        lambda s: '"' not in s and "\\" not in s
        and "." not in s and "[" not in s), _scalar, max_size=3),
    min_size=1, max_size=5)


@_slow
@given(doc=_doc, data=st.data())
def test_partial_json_diff_reconstruction_property(doc, data):
    """Pick random existing members for REPLACE/REMOVE and fresh keys
    for INSERT; the decoder's reconstruction from the builder's
    independent byte encoding must equal the mutation applied directly
    to a Python copy."""
    import copy

    expected = copy.deepcopy(doc)
    diffs: list = []
    keys = sorted(doc)
    # REPLACE an existing top-level member
    k = data.draw(st.sampled_from(keys), label="replace_key")
    nv = data.draw(_scalar, label="replace_val")
    diffs.append((0, f"$.{k}", nv))
    expected[k] = nv
    # INSERT a fresh member
    fresh = data.draw(
        st.text(min_size=1, max_size=5).filter(
            lambda s: s not in doc and '"' not in s and "\\" not in s
            and "." not in s and "[" not in s and "]" not in s),
        label="fresh_key")
    iv = data.draw(_scalar, label="insert_val")
    diffs.append((1, f"$.{fresh}", iv))
    expected[fresh] = iv
    # REMOVE another existing member (possibly the replaced one)
    rk = data.draw(st.sampled_from(keys), label="remove_key")
    diffs.append((2, f"$.{rk}", None))
    expected.pop(rk, None)

    b = BinlogBuilder()
    b.table_map(11, "db", "j",
                [("id", B.T_LONG, 0), ("doc", B.T_JSON, 4)],
                names_tlv=True)
    b.partial_update(11, ((1, doc), (1, JsonDiffs(diffs))))
    (ev,) = list(B.iter_binlog_events(b.bytes()))
    assert json.loads(ev["after"])["doc"] == expected
    assert json.loads(ev["before"])["doc"] == doc


@_slow
@given(days=st.integers(min_value=-100_000, max_value=100_000),
       us=st.integers(min_value=0, max_value=86_399_999_999))
def test_avro_temporal_logicals_property(days, us):
    d = dt.date(1970, 1, 1) + dt.timedelta(days=days)
    t = (dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)).time()
    ts = dt.datetime(1970, 1, 1) + dt.timedelta(days=days, microseconds=us)
    for value, schema in (
            (d, {"type": "int", "logicalType": "date"}),
            (t, {"type": "long", "logicalType": "time-micros"}),
            (ts, {"type": "long", "logicalType": "timestamp-micros"}),
            (ts.replace(microsecond=us % 1000 * 1000),
             {"type": "long", "logicalType": "timestamp-millis"})):
        blob = _ref_encode(value, schema)
        assert A.avro_decode(blob, schema) == value, (value, schema)
        assert A.avro_encode(value, schema) == blob, (value, schema)


# --------------------------------------------------------------------------
# numeric-stack review regression tests (round-9 sweep)
# --------------------------------------------------------------------------
def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantized_topk_drops_nonfinite_instead_of_crashing(spark):
    """One NaN/Inf vector previously CAST_OVERFLOWed inside the int8
    quantization under ANSI and killed the whole query; it must drop at
    the door like every other top-k operator."""
    from synch_spark.operators.similarity import cosine_topk_quantized

    nan = float("nan")
    corpus = _emb_df(spark, [(1, [1.0, 0.0]), (2, [0.9, 0.1]),
                             (3, [nan, 1.0])])
    probes = _emb_df(spark, [(10, [1.0, 0.0]), (11, [float("inf"), 0.0])])
    got = cosine_topk_quantized(corpus, probes, k=2).collect()
    assert {r["probe_id"] for r in got} == {10}
    assert {r["neighbor_id"] for r in got} == {1, 2}


def test_assign_to_centroids_survives_nonfinite_centroid(spark):
    """A NaN centroid column poisoned R.max into NaN and the candidate
    mask ALL-FALSE — every vector silently dropped (an index sync then
    reads that as mass deletion). Valid vectors must assign to the
    finite centroids."""
    from synch_spark.operators.similarity import assign_to_centroids

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [float("nan"), 1.0])],
        "cid int, cvec array<float>")
    vecs = _emb_df(spark, [(1, [1.0, 0.1]), (2, [0.5, 0.5]),
                           (3, [0.0, 1.0])])
    got = assign_to_centroids(vecs, cents).collect()
    assert {r["_id"] for r in got} == {1, 2, 3}
    assert all(r["cid"] == 0 for r in got), \
        "everything assigns to the only finite centroid"


def test_assign_to_centroids_empty_set_is_loud(spark):
    from synch_spark.operators.similarity import assign_to_centroids

    import pytest

    cents = spark.createDataFrame([], "cid int, cvec array<float>")
    with pytest.raises(ValueError, match="empty centroid set"):
        assign_to_centroids(_emb_df(spark, [(1, [1.0, 0.0])]), cents)


def test_hyperplane_signature_plane_count_validated(spark):
    """64 planes overflowed the signed-long fold under ANSI; negative
    counts silently computed a wrong-width signature via the descending
    sequence — both are config errors and must say so."""
    import pytest

    from synch_spark.operators.similarity import hyperplane_signature

    df = _emb_df(spark, [(1, [1.0, 0.0])])
    for bad in (64, -1, 100):
        with pytest.raises(ValueError, match="0..63"):
            hyperplane_signature(df, "embedding", num_planes=bad)
    # 63 (the max that fits) works
    assert hyperplane_signature(df, "embedding", num_planes=63).count() == 1


@pytest.mark.slow
def test_vector_index_nonfinite_hygiene(spark, tmp_path):
    """VectorIndex was the one similarity consumer missing the finite
    door filter: build/add skip garbage vectors instead of wedging on
    CAST_OVERFLOW; a non-finite POSTIMAGE removes the id's stale entry
    (skipping it would leave the old vector searchable); garbage probes
    drop from search."""
    from synch_spark.operators.vector_index import VectorIndex

    nan = float("nan")
    idx = VectorIndex(spark, str(tmp_path / "vidx"), num_centroids=2)
    idx.build(_emb_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]),
                              (3, [nan, nan])]))
    stored = {r["id"] for r in idx.assignments.read().collect()}
    assert stored == {1, 2}, "garbage vector must not be indexed"
    idx.add(_emb_df(spark, [(4, [0.5, 0.5]), (5, [float("inf"), 1.0])]))
    stored = {r["id"] for r in idx.assignments.read().collect()}
    assert stored == {1, 2, 4}
    # update postimage turns non-finite: the stale entry must LEAVE
    feed = spark.createDataFrame(
        [(1, [nan, 1.0], "update_postimage")],
        "vec_id long, embedding array<float>, _change_type string")
    idx.apply_changes(feed)
    stored = {r["id"] for r in idx.assignments.read().collect()}
    assert stored == {2, 4}, "non-finite postimage = remove from index"
    probes = _emb_df(spark, [(10, [1.0, 0.0]), (11, [nan, 0.0])])
    got = idx.search(probes, k=1, nprobe=2)
    assert {r["probe_id"] for r in got.collect()} == {10}


@pytest.mark.slow
def test_vector_index_same_id_insert_and_delete_deterministic(spark,
                                                              tmp_path):
    """A caller-built feed (no _commit_version) carrying BOTH a delete
    and an insert for one id previously tied at (event_unixtime=0,
    action_seq=0) and resolved by shuffle order; the tiebreak is now
    pinned delete-then-insert — the insert survives, every run."""
    from synch_spark.operators.vector_index import VectorIndex

    for attempt in range(3):
        root = tmp_path / f"vidx{attempt}"
        idx = VectorIndex(spark, str(root), num_centroids=2)
        idx.build(_emb_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])]))
        feed = spark.createDataFrame(
            [(1, None, "delete"), (1, [0.9, 0.1], "insert")],
            "vec_id long, embedding array<float>, _change_type string")
        idx.apply_changes(feed)
        rows = {r["id"]: r for r in idx.assignments.read().collect()}
        assert 1 in rows, "insert must win the in-feed tie on every run"
        assert [round(x, 3) for x in rows[1]["v"]] == [0.9, 0.1]


# --------------------------------------------------------------------------
# dedup-stack review regression tests (round-9 sweep)
# --------------------------------------------------------------------------
LONG_A = "the quick brown fox jumps over the lazy dog again and again"
LONG_B = "the quick brown fox jumps over the lazy dog again and AGAIN!"


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_dedup_index_short_postimage_removes_stale_rows(spark, tmp_path):
    """An update whose new text has fewer than shingle_n tokens emits
    ZERO new signature/bucket rows — without paired deletes the OLD
    rows stayed live forever and the index kept matching text that no
    longer exists."""
    from synch_spark.operators.dedup_index import DedupIndex

    idx = DedupIndex(spark, str(tmp_path / "dix"))
    idx.build(_docs_df(spark, [(1, LONG_A), (2, "unrelated words entirely here")]))
    # doc 1's text shrinks below shingle_n
    feed = spark.createDataFrame([(1, "x", "update_postimage")],
                                 "doc_id long, text string, _change_type string")
    idx.apply_changes(feed)
    assert idx.table.read().filter("id = 1").count() == 0, \
        "stale bucket rows must leave with the shrunk text"
    assert idx.signatures.read().filter(
        "id = 1 AND seed >= 0").count() == 0
    # a new doc resembling the OLD text must NOT be flagged against 1
    dups = idx.check(_docs_df(spark, [(9, LONG_B)])).collect()
    assert all(r["dup_of"] != 1 for r in dups)


@pytest.mark.slow
def test_dedup_index_infeed_delete_insert_deterministic(spark, tmp_path):
    """A caller-built feed with BOTH a delete and an insert for one id
    previously tied at (0,0) stamps and resolved by shuffle order; the
    insert must now win on every run."""
    from synch_spark.operators.dedup_index import DedupIndex

    for attempt in range(3):
        idx = DedupIndex(spark, str(tmp_path / f"dix{attempt}"))
        idx.build(_docs_df(spark, [(1, LONG_A)]))
        feed = spark.createDataFrame(
            [(1, None, "delete"), (1, LONG_B, "insert")],
            "doc_id long, text string, _change_type string")
        idx.apply_changes(feed)
        sig = idx.signatures.read().filter("id = 1 AND seed >= 0")
        assert sig.count() == idx.num_hashes, \
            "insert must win the in-feed tie on every run"
        assert idx.table.read().filter("id = 1").count() > 0


def test_dedup_index_parameter_drift_is_loud(spark, tmp_path):
    """Reopening an index with different LSH parameters silently
    disabled dedup (bucket keys never match) — it must refuse."""
    import pytest

    from synch_spark.operators.dedup_index import DedupIndex

    root = str(tmp_path / "dix")
    DedupIndex(spark, root, num_hashes=16, bands=4).build(
        _docs_df(spark, [(1, LONG_A)]))
    reopened = DedupIndex(spark, root, num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="parameter mismatch"):
        reopened.check(_docs_df(spark, [(2, LONG_B)]))
    # same parameters reopen fine
    ok = DedupIndex(spark, root, num_hashes=16, bands=4)
    assert ok.check(_docs_df(spark, [(2, LONG_B)])).count() > 0


@pytest.mark.slow
def test_dedup_index_short_doc_redelivery_is_noop(spark, tmp_path):
    """Docs below shingle_n produce no bucket rows, so the old
    bucket-derived known-set re-admitted them on every at-least-once
    redelivery; the signature-store marker must make redelivery a
    no-op."""
    from synch_spark.operators.dedup_index import DedupIndex

    idx = DedupIndex(spark, str(tmp_path / "dix"))
    batch = _docs_df(spark, [(1, LONG_A), (2, "hi there")])
    first = idx.ingest(batch)
    assert {r["doc_id"] for r in first.collect()} == {1, 2}
    again = idx.ingest(batch)  # crash-redelivery of the SAME batch
    assert again.count() == 0, "redelivery is a no-op, not a re-admit"
    # a removed short doc can be re-ingested (marker rows expand into
    # the delete too)
    idx.remove(spark.createDataFrame([(2,)], "doc_id long"))
    third = idx.ingest(_docs_df(spark, [(2, "hi there")]))
    assert {r["doc_id"] for r in third.collect()} == {2}


@pytest.mark.slow
def test_dedup_index_check_caps_hot_buckets(spark, tmp_path):
    """A degenerate bucket over the cap must drop from candidate
    generation (both in-batch and vs-index) instead of fanning out
    quadratically — the lsh_candidate_pairs contract, now shared by
    the persisted index."""
    from synch_spark.operators.dedup_index import DedupIndex

    idx = DedupIndex(spark, str(tmp_path / "dix"))
    same = [(i, LONG_A) for i in range(1, 7)]  # 6 identical docs
    idx.build(_docs_df(spark, same))
    batch = _docs_df(spark, [(100, LONG_A), (101, LONG_A)])
    # cap below the INDEX bucket population: vs-index candidates
    # vanish; the batch's own 2-member bucket is under the cap, so the
    # in-batch pair legitimately survives
    capped = idx.check(batch, max_bucket_size=3).collect()
    assert {(r["new_id"], r["dup_of"]) for r in capped} == {(101, 100)}
    # in-batch cap engages too when the batch itself is degenerate
    big_batch = _docs_df(spark, [(200 + i, LONG_A) for i in range(6)])
    assert idx.check(big_batch, max_bucket_size=3).count() == 0
    # default cap: full candidates
    assert idx.check(batch).count() > 2


def test_lsh_candidate_pairs_band_config_validated(spark):
    import pytest

    from synch_spark.operators.dedup import lsh_candidate_pairs

    df = _docs_df(spark, [(1, LONG_A)])
    with pytest.raises(ValueError, match="bands must satisfy"):
        lsh_candidate_pairs(df, "text", "doc_id", num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="bands must satisfy"):
        lsh_candidate_pairs(df, "text", "doc_id", num_hashes=8, bands=0)


@pytest.mark.slow
def test_cluster_duplicates_nonconvergence_is_loud(spark):
    """A component whose diameter exceeds the propagation budget must
    raise instead of silently splitting one cluster into several."""
    import pytest

    from synch_spark.operators.dedup import cluster_duplicates

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_duplicates(chain, max_iters=2, local_threshold=0)
    # ample budget converges to ONE cluster
    labels = cluster_duplicates(chain, max_iters=40, local_threshold=0)
    assert labels.select("cluster_id").distinct().count() == 1


def test_duplicate_stats_counts_null_text_group(spark):
    from synch_spark.operators.dedup import duplicate_stats

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a"), (4, "a")],
        "doc_id long, text string")
    row = duplicate_stats(df, "text").collect()[0]
    assert row["n_docs"] == 4
    assert row["n_unique"] == 2, "null text is ONE content group"
