"""Property tests for the round-7 operators against driver-side
reference implementations — semantics pinned beyond the fixed fixture.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings, strategies as st
import pytest


# --- remove_duplicated_spans vs a direct Python implementation -------------
def _ref_span_removal(docs: dict[int, list[str]], w: int):
    """Reference: windows keyed by token tuple; every occurrence except
    the min-(doc_id, pos) of a repeated window is a duplicate; tokens
    covered by any duplicate window are cut."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for did in sorted(docs):
        toks = docs[did]
        for pos in range(1, len(toks) - w + 2):
            occ.setdefault(tuple(toks[pos - 1:pos - 1 + w]), []).append(
                (did, pos))
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for places in occ.values():
        if len(places) < 2:
            continue
        for did, pos in sorted(places)[1:]:
            removed[did].update(range(pos, pos + w))
    out = {}
    for did, toks in docs.items():
        kept = [t for i, t in enumerate(toks, 1) if i not in removed[did]]
        out[did] = (" ".join(kept), len(toks), len(removed[did]))
    return out


_word = st.sampled_from(["aa", "bb", "cc", "dd"])  # tiny alphabet: dups likely


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(_word, min_size=0, max_size=12),
                min_size=1, max_size=6), st.integers(2, 4))
@pytest.mark.slow
def test_remove_duplicated_spans_matches_reference(spark, doc_lists, w):
    from synch_spark.plans.hygiene import remove_duplicated_spans

    docs = {i: toks for i, toks in enumerate(doc_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_duplicated_spans(df, span_w=w).collect()}
    assert got == _ref_span_removal(docs, w)


# --- semantic_dedup vs a direct Python implementation -----------------------
def _cos(u, v):
    """Mirror the operator's evaluation order exactly
    (similarity.py:_decimal_rescore): the dot and squared norms are
    exact (decimal fold there, exact small floats here), and the one
    and only rounding is the final d / sqrt(nu2 * nv2) division.
    The naive d / (sqrt(nu2) * sqrt(nv2)) takes TWO sqrt roundings and
    disagrees at exact threshold boundaries — e.g. u=[0,2,1],
    v=[1,2,0]: true cosine 4/sqrt(25) = 0.8 exactly, but
    4/(sqrt(5)*sqrt(5)) = 0.7999999999999998 < 0.8."""
    d = sum(x * y for x, y in zip(u, v))
    nu2, nv2 = sum(x * x for x in u), sum(x * x for x in v)
    return d / math.sqrt(nu2 * nv2) if nu2 > 0 and nv2 > 0 else None


def _ref_semantic_dedup(vecs: dict[int, list[float]],
                        cents: dict[int, list[float]], t: float):
    assign = {}
    for vid, v in vecs.items():
        best = max(sorted(cents),
                   key=lambda c: ((_cos(v, cents[c])
                                   if _cos(v, cents[c]) is not None
                                   else -2), -c))
        assign[vid] = best
    # union-find over within-cluster eps pairs
    parent = {v: v for v in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if assign[a] != assign[b]:
                continue
            c = _cos(vecs[a], vecs[b])
            if c is not None and c >= t:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for v in ids:
        clusters.setdefault(find(v), []).append(v)
    kept = set()

    def _keep_key(m):
        # NOT `_cos(...) or -2`: a legitimate cosine of exactly 0.0 is
        # falsy and `or` would demote it below every negative cosine.
        c = _cos(vecs[m], cents[assign[m]])
        return (c if c is not None else -2, -m)

    for members in clusters.values():
        kept.add(max(members, key=_keep_key))
    return kept


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@example(raw_vecs=[[0.0, 0.0, 1.0], [0.0, 2.0, 1.0], [1.0, 2.0, 0.0]])
@example(raw_vecs=[[0.0, 2.0, 0.0], [0.0, 1.0, -1.0], [0.0, 0.0, 0.0],
                   [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, -3.0, -3.0],
                   [0.0, -2.0, -1.0]])  # keep-best csim == exactly 0.0
@given(st.lists(
    st.lists(st.integers(-3, 3).map(float), min_size=3, max_size=3),
    min_size=3, max_size=10))
@pytest.mark.slow
def test_semantic_dedup_matches_reference(spark, raw_vecs):
    from pyspark.sql import functions as F

    from synch_spark.operators.similarity import semantic_dedup

    # drop all-zero vectors up front (undefined cosine is a separate
    # contract already covered by _finite_vec / NULL-csim tests)
    vecs = {i: v for i, v in enumerate(raw_vecs) if any(x != 0 for x in v)}
    if len(vecs) < 2:
        return
    cents = {c: vecs[vid] for c, vid in enumerate(sorted(vecs)[:2])}
    t = 0.8
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")
    cdf = spark.createDataFrame(
        [(c, v) for c, v in cents.items()],
        "cid int, cvec array<float>")
    got = {r["vec_id"] for r in semantic_dedup(df, cdf, threshold=t).collect()}
    # float32 round-trip: recompute the reference on the EXACT float32
    # values Spark used
    import numpy as np
    vecs32 = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}
    cents32 = {c: [float(np.float32(x)) for x in v] for c, v in cents.items()}
    assert got == _ref_semantic_dedup(vecs32, cents32, t)
