"""Round-9 property tests: the Avro binary codec and the partial-JSON
diff reconstruction, each pinned against an INDEPENDENT implementation
(the spec-built test encoders), so a shared bug cannot self-certify."""
from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from hypothesis import HealthCheck, given, settings, strategies as st

from synch_spark.sources import avro_codec as A
from synch_spark.sources import binlog_file as B
from tests.binlog_builder import BinlogBuilder, JsonDiffs
from tests.test_avro_codec import ENVELOPE, _ref_encode

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
