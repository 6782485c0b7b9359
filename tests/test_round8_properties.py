"""Round-8 property pins: the int8-quantized GEMM prefilter must be
LOSSLESS — its data-derived margin admits every true pair, so the
decimal rescore (which defines the output) sees the same survivors the
float64 prefilter saw.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
import pytest


def _exact_cosines(V: np.ndarray) -> np.ndarray:
    """Float64 reference cosines (error ~1e-15, far inside the
    prefilter's 1e-6 band around the threshold)."""
    norms = np.sqrt(np.einsum("ij,ij->i", V, V))
    N = V / norms[:, None]
    return N @ N.T


_elem = st.floats(min_value=-100.0, max_value=100.0,
                  allow_nan=False, allow_infinity=False, width=32)


@st.composite
def _block(draw):
    d = draw(st.integers(4, 16))
    vec = st.lists(_elem, min_size=d, max_size=d).filter(
        lambda v: any(x != 0 for x in v))
    return draw(st.lists(vec, min_size=2, max_size=12))


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_block(), st.floats(min_value=0.0, max_value=0.999))
@pytest.mark.slow
def test_quantized_prefilter_admits_every_true_pair(vecs, thr):
    """For random blocks and thresholds, every pair whose TRUE cosine
    clears the threshold is admitted by the quantized candidate kernel
    — the provable-margin contract that keeps q126/q47 hashes
    byte-identical to the float64 prefilter era."""
    from synch_spark.operators.similarity import _candidate_pairs_quantized

    V = np.array(vecs, dtype=np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", V, V))
    gi, gj, _ = _candidate_pairs_quantized(V, norms, thr)
    got = set(zip(gi, gj))
    S = _exact_cosines(V)
    n = len(vecs)
    true_pairs = {(i, j) for i in range(n) for j in range(i + 1, n)
                  # stay 1e-9 clear of the float64 reference's own error
                  if S[i, j] >= thr + 1e-9}
    missed = true_pairs - got
    assert not missed, f"quantized prefilter lost true pairs: {missed}"


def test_quantized_margin_is_tight_enough_to_prune():
    """The margin must also actually PRUNE (a margin of 2 admits
    everything and the 'prefilter' is a no-op): on a spread-out block
    with threshold 0.9, far-apart pairs stay out."""
    from synch_spark.operators.similarity import _candidate_pairs_quantized

    rng = np.random.default_rng(7)
    V = rng.normal(size=(64, 64))
    norms = np.sqrt(np.einsum("ij,ij->i", V, V))
    i, j, _ = _candidate_pairs_quantized(V, norms, 0.9)
    n_pairs = 64 * 63 // 2
    assert len(i) < n_pairs * 0.05, \
        "margin admits nearly everything — prefilter does no work"


def test_pair_ids_fast_path_matches_full_rescore(spark):
    """semantic_dedup's pairs-only fast path must emit EXACTLY the
    pair set of the full decimal-rescore operator — including a pair
    sitting exactly ON the threshold (inside the 1e-6 adjudication
    band, where only the decimal cosine may decide)."""
    from synch_spark.operators.similarity import (
        _near_dup_pair_ids,
        embedding_near_dups_exact,
    )

    rng = np.random.default_rng(3)
    rows = [(0, [0.0, 2.0, 1.0]), (1, [1.0, 2.0, 0.0])]  # cos == 0.8 exact
    vid = 2
    base = rng.normal(size=(4, 3))
    for b in base:
        for _ in range(3):
            v = b + rng.normal(scale=0.03, size=3)
            rows.append((vid, [float(np.float32(x)) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for thr in (0.8, 0.95):
        fast = {(r["a"], r["b"]) for r in _near_dup_pair_ids(
            df, thr, "embedding", "vec_id", None).collect()}
        full = {(r["a"], r["b"]) for r in embedding_near_dups_exact(
            df, thr).collect()}
        assert fast == full
        if thr == 0.8:
            assert (0, 1) in fast, "threshold-exact pair must be admitted"


def test_probe_similarity_pairs_edges_and_parity(spark):
    """probe_similarity_pairs: GEMM-kernel candidates + decimal rescore
    match a driver-side decimal brute force; zero-norm probes and
    corpus vectors (undefined cosine) and an empty probe set all
    behave — no crash, no spurious hits."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from synch_spark.operators.similarity import probe_similarity_pairs

    rng = np.random.default_rng(9)
    cvecs = {i: [float(np.float32(x)) for x in rng.normal(size=4)]
             for i in range(20)}
    cvecs[20] = [0.0, 0.0, 0.0, 0.0]          # zero corpus vector
    pvecs = {100: cvecs[3], 101: [0.0] * 4,    # probe 101 is zero-norm
             102: [float(-x) for x in cvecs[7]],
             103: None,                        # NULL probe: dropped
             104: [1.0, 2.0]}                  # ragged probe: dropped
    corpus = spark.createDataFrame(list(cvecs.items()),
                                   "vec_id long, embedding array<float>")
    probes = spark.createDataFrame(list(pvecs.items()),
                                   "probe_id long, embedding array<float>")
    thr = 0.5
    got = {(r["vec_id"], r["probe_id"]): r["cosine"]
           for r in probe_similarity_pairs(corpus, probes, thr).collect()}

    q12 = Decimal("1e-12")

    def dot_dec(u, w):
        return float(sum((Decimal(x * y).quantize(q12, ROUND_HALF_UP)
                          for x, y in zip(u, w)), Decimal(0)))

    want = {}
    for cid, cv in cvecs.items():
        for pid, pv in pvecs.items():
            if pv is None or len(pv) != 4:
                continue  # NULL / ragged probes: undefined, dropped
            nu, nv = dot_dec(cv, cv), dot_dec(pv, pv)
            if nu <= 0 or nv <= 0:
                continue
            cos = dot_dec(cv, pv) / math.sqrt(nu * nv)
            if cos >= thr:
                want[(cid, pid)] = cos
    assert set(got) == set(want) and (3, 100) in got
    for k in want:
        assert abs(got[k] - want[k]) < 1e-14
    assert not any(pid in (101, 103, 104) for _, pid in got)
    # empty probe set: empty result, correct schema
    empty = probe_similarity_pairs(corpus, probes.limit(0), thr)
    assert empty.count() == 0
    assert empty.columns == ["vec_id", "probe_id", "cosine"]


def test_near_dups_exact_output_matches_decimal_brute_force(spark):
    """Operator-level pin: embedding_near_dups_exact's OUTPUT (pairs
    AND cosine values) equals a driver-side brute force using the same
    one-rounding cosine the decimal rescore computes — the prefilter
    swap must be invisible in results."""
    from synch_spark.operators.similarity import embedding_near_dups_exact

    rng = np.random.default_rng(42)
    base = rng.normal(size=(6, 8))
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # 3 noisy copies of each: plenty of true pairs
            v = b + rng.normal(scale=0.05, size=8)
            rows.append((vid, [float(np.float32(x)) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    thr = 0.98
    got = {(r["a"], r["b"]): r["cosine"]
           for r in embedding_near_dups_exact(df, thr).collect()}

    # mirror _decimal_rescore exactly: each double product quantized to
    # 12 dp HALF_UP (Spark's cast-to-decimal rounding), exact decimal
    # sum, then ONE double division by sqrt(pn * cn)
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")

    def dot_dec(u, w):
        tot = Decimal(0)
        for x, y in zip(u, w):
            tot += Decimal(x * y).quantize(q12, ROUND_HALF_UP)
        return float(tot)

    vecs = {i: v for i, v in rows}
    want = {}
    for a in vecs:
        for b in vecs:
            if a >= b:
                continue
            u, w = vecs[a], vecs[b]
            c = dot_dec(u, w) / math.sqrt(dot_dec(u, u) * dot_dec(w, w))
            if c >= thr:
                want[(a, b)] = c
    assert set(got) == set(want)
    for k in want:
        assert got[k] is not None and abs(got[k] - want[k]) < 1e-14
