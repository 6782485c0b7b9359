"""Property pins for the two new wire codecs: pgoutput message decode
round-trips arbitrary rows through an independent in-test encoder, and
GTID-set algebra (parse/format/encode/add) is closed under arbitrary
interval soups.
"""

from __future__ import annotations

import json
import uuid

from hypothesis import given, settings, strategies as st

from synch_spark.sources import pgoutput as po
from synch_spark.sources.binlog_socket import (
    add_gtid,
    encode_gtid_set,
    format_gtid_set,
    parse_gtid_set,
)
from tests.test_binlog_socket import _decode_gtid_set, _in_gtid_set
from tests.test_pgoutput import (
    enc_begin,
    enc_commit,
    enc_delete,
    enc_insert,
    enc_relation,
    enc_update,
)

# -- pgoutput round-trip -------------------------------------------------------

# PG text-format values: any unicode text without NULs (the wire length-
# prefixes, so no delimiter constraints) or lone surrogates (PG server
# encodings are valid UTF-8 — surrogates cannot appear), or SQL NULL
_val = st.one_of(
    st.none(),
    st.text(alphabet=st.characters(blacklist_characters="\x00",
                                   blacklist_categories=("Cs",)),
            max_size=30),
)
_colname = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1,
                   max_size=12)


@st.composite
def _table_and_rows(draw):
    ncols = draw(st.integers(1, 6))
    names = draw(st.lists(_colname, min_size=ncols, max_size=ncols,
                          unique=True))
    nkeys = draw(st.integers(1, ncols))
    cols = [(1 if i < nkeys else 0, n, 25, -1)
            for i, n in enumerate(names)]
    rows = draw(st.lists(
        st.lists(_val, min_size=ncols, max_size=ncols), min_size=1,
        max_size=8))
    return cols, rows


@given(_table_and_rows(), st.integers(0, 2**40))
@settings(max_examples=150, deadline=None)
def test_pgoutput_insert_roundtrip(table_rows, ts_off):
    """encode(rows) → decode == rows, with the Begin commit time
    stamped on every event (including pre-2000/negative PG times)."""
    cols, rows = table_rows
    ts = 700_000_000_000_000 + ts_off  # straddles the PG epoch
    payloads = [enc_relation(77, "s", "t", cols), enc_begin(ts)]
    payloads += [enc_insert(77, r) for r in rows]
    payloads += [enc_commit()]
    evs = list(po.iter_pgoutput_changes(payloads))
    assert len(evs) == len(rows)
    names = [c[1] for c in cols]
    for ev, row in zip(evs, rows):
        assert ev["action"] == "insert" and ev["before"] is None
        assert json.loads(ev["after"]) == dict(zip(names, row))
        assert ev["event_unixtime"] == ts


@given(_table_and_rows())
@settings(max_examples=100, deadline=None)
def test_pgoutput_update_delete_roundtrip(table_rows):
    """Updates with full old rows and key-image deletes recover the
    exact images; K-tuple placeholders never leak into before."""
    cols, rows = table_rows
    names = [c[1] for c in cols]
    keys = [c[1] for c in cols if c[0] & 1]
    payloads = [enc_relation(78, "s", "t", cols)]
    for r in rows:
        payloads.append(enc_update(78, r, old=r, old_kind=b"O"))
        key_tuple = [v if c[0] & 1 else None for c, v in zip(cols, r)]
        payloads.append(enc_delete(78, key_tuple, kind=b"K"))
    evs = list(po.iter_pgoutput_changes(payloads))
    assert len(evs) == 2 * len(rows)
    for i, r in enumerate(rows):
        up, de = evs[2 * i], evs[2 * i + 1]
        img = dict(zip(names, r))
        assert up["action"] == "update"
        assert json.loads(up["after"]) == img
        assert json.loads(up["before"]) == img
        assert de["action"] == "delete" and de["after"] is None
        assert json.loads(de["before"]) == {k: img[k] for k in keys}


@given(_table_and_rows(), st.integers(1, 7))
@settings(max_examples=60, deadline=None)
def test_pgoutput_concat_split_equivalence(table_rows, split_at):
    """The SAME messages decode identically whether they arrive as one
    concatenated blob or as per-message payloads (the live XLogData
    shape) — the self-delimiting-grammar guarantee the distributed
    payload decode relies on."""
    cols, rows = table_rows
    msgs = [enc_relation(79, "s", "t", cols), enc_begin(1_700_000_000_000_000)]
    msgs += [enc_insert(79, r) for r in rows]
    msgs += [enc_commit()]
    one_blob = list(po.iter_pgoutput_changes([b"".join(msgs)]))
    per_msg = list(po.iter_pgoutput_changes(msgs))
    k = min(split_at, len(msgs) - 1)
    mixed = list(po.iter_pgoutput_changes(
        [b"".join(msgs[:k]), b"".join(msgs[k:])]))
    assert one_blob == per_msg == mixed


# -- GTID set algebra ----------------------------------------------------------

_SIDS = [str(uuid.UUID(int=i + 1)) for i in range(3)]
_gnos = st.lists(
    st.tuples(st.integers(0, 2), st.integers(1, 200)), min_size=0,
    max_size=30)


@given(_gnos)
@settings(max_examples=200, deadline=None)
def test_gtid_add_matches_membership(pairs):
    """Building a set GTID-by-GTID yields normalized disjoint intervals
    whose membership is exactly the inserted multiset."""
    gs: dict = {}
    for sid_i, gno in pairs:
        add_gtid(gs, _SIDS[sid_i], gno)
    inserted = {(s, g) for s, g in ((_SIDS[i], g) for i, g in pairs)}
    for sid, ivs in gs.items():
        # normalized: sorted, disjoint, non-adjacent
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 + 1 < a2
        assert all(a <= b for a, b in ivs)
    for i in range(3):
        for g in range(1, 201):
            assert _in_gtid_set(gs, _SIDS[i], g) == ((_SIDS[i], g) in inserted)


@given(_gnos)
@settings(max_examples=150, deadline=None)
def test_gtid_text_and_wire_roundtrip(pairs):
    gs: dict = {}
    for sid_i, gno in pairs:
        add_gtid(gs, _SIDS[sid_i], gno)
    assert parse_gtid_set(format_gtid_set(gs)) == gs
    assert _decode_gtid_set(encode_gtid_set(gs)) == gs
