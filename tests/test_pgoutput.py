"""pgoutput binary decode: byte-level pins against an independent
in-test encoder (the decoder is never used to build its own fixtures),
ordered/driver decode semantics, the distributed frame-file and
payload-blob paths, and the typed parse downstream.

Wire shapes follow the PostgreSQL "Logical Streaming Replication
Protocol" docs (protocol version 1)."""

import json
import struct

import pytest

from synch_spark.sources import pgoutput as po

PG_EPOCH_US = po.PG_EPOCH_US


# -- independent encoder ------------------------------------------------------

def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def enc_relation(rid: int, ns: str, name: str, cols, replident: str = "d") -> bytes:
    """cols: list of (flags, name, oid, typmod)."""
    out = b"R" + struct.pack("!I", rid) + _cstr(ns) + _cstr(name)
    out += replident.encode() + struct.pack("!H", len(cols))
    for flags, cname, oid, typmod in cols:
        out += bytes([flags]) + _cstr(cname) + struct.pack("!Ii", oid, typmod)
    return out


def enc_tuple(vals) -> bytes:
    """vals: list of None | ('u',) | str | ('b', bytes)."""
    out = struct.pack("!H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        elif v == ("u",):
            out += b"u"
        elif isinstance(v, tuple) and v[0] == "b":
            out += b"b" + struct.pack("!I", len(v[1])) + v[1]
        else:
            b = v.encode()
            out += b"t" + struct.pack("!I", len(b)) + b
    return out


def enc_begin(unix_ts_us: int, xid: int = 7, lsn: int = 0) -> bytes:
    # commit ts is signed int64 (negative for pre-2000 commit times)
    return b"B" + struct.pack("!QqI", lsn, unix_ts_us - PG_EPOCH_US, xid)


def enc_commit(lsn: int = 0, ts_pg: int = 0) -> bytes:
    return b"C" + struct.pack("!BQQQ", 0, lsn, lsn, ts_pg)


def enc_insert(rid: int, vals) -> bytes:
    return b"I" + struct.pack("!I", rid) + b"N" + enc_tuple(vals)


def enc_update(rid: int, new, old=None, old_kind: bytes = b"O") -> bytes:
    out = b"U" + struct.pack("!I", rid)
    if old is not None:
        out += old_kind + enc_tuple(old)
    return out + b"N" + enc_tuple(new)


def enc_delete(rid: int, old, kind: bytes = b"K") -> bytes:
    return b"D" + struct.pack("!I", rid) + kind + enc_tuple(old)


def enc_truncate(rids, options: int = 0) -> bytes:
    out = b"T" + struct.pack("!IB", len(rids), options)
    for r in rids:
        out += struct.pack("!I", r)
    return out


def enc_origin(name: str, lsn: int = 0) -> bytes:
    return b"O" + struct.pack("!Q", lsn) + _cstr(name)


def enc_message(prefix: str, data: bytes) -> bytes:
    return (b"M" + struct.pack("!BQ", 0, 0) + _cstr(prefix)
            + struct.pack("!I", len(data)) + data)


def enc_type(oid: int, ns: str, name: str) -> bytes:
    return b"Y" + struct.pack("!I", oid) + _cstr(ns) + _cstr(name)


ORDERS_REL = enc_relation(16385, "db", "orders", [
    (1, "id", 20, -1), (0, "price", 1700, -1), (0, "status", 25, -1)])

TS = 1_600_000_000_000_000  # 2020-09-13T12:26:40Z in unix µs


def drain(payloads, **kw):
    return list(po.iter_pgoutput_changes(payloads, **kw))


# -- ordered decode pins ------------------------------------------------------

def test_insert_decodes_with_begin_timestamp():
    evs = drain([ORDERS_REL, enc_begin(TS),
                 enc_insert(16385, ["1", "10.50", "O"]), enc_commit()])
    assert len(evs) == 1
    e = evs[0]
    assert (e["schema"], e["table"], e["action"]) == ("db", "orders", "insert")
    assert e["before"] is None
    assert json.loads(e["after"]) == {"id": "1", "price": "10.50", "status": "O"}
    assert e["event_unixtime"] == TS


def test_wire_seq_carries_within_transaction_order():
    """Every row of a transaction shares the commit timestamp, so two
    updates to one pk tie on (event_unixtime, action_seq); wire_seq=True
    attaches a monotone emission counter (events.WIRE_SEQ_COL) so
    last-wins keeps the transaction's LAST image. Default decode keeps
    the plain 6-key contract."""
    blob = (ORDERS_REL + enc_begin(TS)
            + enc_update(16385, ["1", "2", "A"])
            + enc_update(16385, ["1", "3", "B"])
            + enc_commit())
    evs = drain([blob], wire_seq=True)
    assert [e["_wire_seq"] for e in evs] == [0, 1]
    assert all(e["event_unixtime"] == TS for e in evs)
    last = max(evs, key=lambda e: e["_wire_seq"])
    assert json.loads(last["after"])["status"] == "B"
    plain = drain([blob])
    assert all("_wire_seq" not in e for e in plain)


def test_wire_seq_streamed_transaction_preserves_arrival_order():
    """Streamed chunks buffer until Stream Commit; the counter must
    reflect within-transaction arrival order at emission."""
    payloads = [
        ORDERS_REL,
        enc_stream_start(77, first=True),
        _xid_prefixed(enc_update(16385, ["1", "2", "A"]), 77),
        _xid_prefixed(enc_update(16385, ["1", "3", "B"]), 77),
        enc_stream_stop(),
        enc_stream_commit(77, TS),
    ]
    evs = drain(payloads, wire_seq=True)
    assert [e["_wire_seq"] for e in evs] == [0, 1]
    assert [json.loads(e["after"])["status"] for e in evs] == ["A", "B"]
    assert all(e["event_unixtime"] == TS for e in evs)


def test_concatenated_transaction_in_one_payload():
    blob = (ORDERS_REL + enc_begin(TS) + enc_insert(16385, ["1", "2", "A"])
            + enc_insert(16385, ["2", None, "B"]) + enc_commit())
    evs = drain([blob])
    assert [json.loads(e["after"])["id"] for e in evs] == ["1", "2"]
    assert json.loads(evs[1]["after"])["price"] is None
    assert all(e["event_unixtime"] == TS for e in evs)


def test_pre_2000_commit_time_is_signed_not_wrapped():
    ts_1995 = 800_000_000_000_000  # 1995-05-09, BEFORE the PG epoch
    evs = drain([ORDERS_REL, enc_begin(ts_1995),
                 enc_insert(16385, ["1", "2", "A"])])
    assert evs[0]["event_unixtime"] == ts_1995


def test_commit_resets_tx_timestamp():
    evs = drain([ORDERS_REL, enc_begin(TS), enc_insert(16385, ["1", "2", "A"]),
                 enc_commit(), enc_insert(16385, ["9", "9", "Z"])],
                fallback_unixtime_us=1000)
    assert evs[0]["event_unixtime"] == TS
    assert evs[1]["event_unixtime"] == 1001  # fallback + seq, not stale TS


def test_update_with_full_old_row():
    evs = drain([ORDERS_REL, enc_update(
        16385, ["1", "11.00", "F"], old=["1", "10.50", "O"], old_kind=b"O")])
    e = evs[0]
    assert e["action"] == "update"
    assert json.loads(e["before"]) == {"id": "1", "price": "10.50", "status": "O"}
    assert json.loads(e["after"]) == {"id": "1", "price": "11.00", "status": "F"}


def test_update_with_key_old_tuple():
    evs = drain([ORDERS_REL, enc_update(
        16385, ["2", "5.00", "F"], old=["1", None, None], old_kind=b"K")])
    e = evs[0]
    # K-tuple non-key nulls are placeholders, not values: the before
    # image is exactly the replica-identity columns (wal2json oldkeys)
    assert json.loads(e["before"]) == {"id": "1"}
    assert json.loads(e["after"])["id"] == "2"


def test_update_without_old_synthesizes_key_image_from_flags():
    evs = drain([ORDERS_REL, enc_update(16385, ["3", "7.00", "P"])])
    # id is the only flags&1 column → the key image
    assert json.loads(evs[0]["before"]) == {"id": "3"}


def test_unchanged_toast_substitutes_from_full_old_row():
    evs = drain([ORDERS_REL, enc_update(
        16385, ["1", ("u",), "F"], old=["1", "10.50", "O"], old_kind=b"O")])
    assert json.loads(evs[0]["after"])["price"] == "10.50"


def test_unchanged_toast_without_old_is_omitted():
    evs = drain([ORDERS_REL, enc_update(16385, ["1", ("u",), "F"])])
    after = json.loads(evs[0]["after"])
    assert "price" not in after
    assert after == {"id": "1", "status": "F"}


def test_delete_key_tuple():
    evs = drain([ORDERS_REL, enc_delete(16385, ["4", None, None])])
    e = evs[0]
    assert e["action"] == "delete" and e["after"] is None
    assert json.loads(e["before"])["id"] == "4"


def test_truncate_emits_query_action():
    evs = drain([ORDERS_REL, enc_truncate([16385])])
    e = evs[0]
    assert e["action"] == "query"
    assert json.loads(e["after"])["query"] == "TRUNCATE db.orders"


def test_origin_message_type_are_skipped():
    evs = drain([ORDERS_REL, enc_origin("up1"), enc_type(90001, "db", "mood"),
                 enc_message("px", b"\x01\x02"),
                 enc_insert(16385, ["1", "2", "A"])])
    assert len(evs) == 1 and evs[0]["action"] == "insert"


def test_relation_resend_mid_stream_applies_new_schema():
    rel2 = enc_relation(16385, "db", "orders",
                        [(1, "id", 20, -1), (0, "note", 25, -1)])
    evs = drain([ORDERS_REL, enc_insert(16385, ["1", "2", "A"]),
                 rel2, enc_insert(16385, ["2", "hello"])])
    assert json.loads(evs[0]["after"]) == {"id": "1", "price": "2", "status": "A"}
    assert json.loads(evs[1]["after"]) == {"id": "2", "note": "hello"}


def test_binary_datum_surfaces_as_bytea_hex_text():
    evs = drain([ORDERS_REL, enc_insert(16385, ["1", ("b", b"\xde\xad"), "A"])])
    assert json.loads(evs[0]["after"])["price"] == "\\xdead"


def test_unknown_relation_raises():
    with pytest.raises(po.PgoutputError, match="unknown relation id"):
        drain([enc_insert(99, ["1"])])


def test_unknown_message_type_raises():
    with pytest.raises(po.PgoutputError, match="unknown pgoutput message"):
        drain([ORDERS_REL, b"Q\x00\x00"])


def test_arity_mismatch_raises():
    with pytest.raises(po.PgoutputError, match="arity"):
        drain([ORDERS_REL, enc_insert(16385, ["1", "2"])])


# -- frame files ---------------------------------------------------------------

def test_frame_roundtrip(tmp_path):
    payloads = [ORDERS_REL, enc_begin(TS), enc_insert(16385, ["1", "2", "A"])]
    p = str(tmp_path / "round0.pgo")
    assert po.write_pgoutput_frames(p, payloads) == 3
    with open(p, "rb") as f:
        back = list(po.read_pgoutput_frames(f.read()))
    assert back == payloads


def test_frame_bad_magic_raises(tmp_path):
    with pytest.raises(po.PgoutputError, match="magic"):
        list(po.read_pgoutput_frames(b"NOPE" + b"\x00" * 8))


# -- Spark paths ----------------------------------------------------------------

def test_files_to_raw_matches_driver_decode(spark, tmp_path):
    payloads = [ORDERS_REL, enc_begin(TS)]
    payloads += [enc_insert(16385, [str(i), f"{i}.00", "O"]) for i in range(50)]
    payloads += [enc_commit(),
                 enc_begin(TS + 5),
                 enc_update(16385, ["7", "99.00", "F"],
                            old=["7", "7.00", "O"], old_kind=b"O"),
                 enc_delete(16385, ["8", None, None]),
                 enc_commit()]
    f1 = str(tmp_path / "seg.000001.pgo")
    po.write_pgoutput_frames(f1, payloads)

    got = po.pgoutput_files_to_raw(spark, f1).collect()
    want = drain(payloads)
    key = lambda e: (e["event_unixtime"], e["action"],
                     e["after"] or "", e["before"] or "")
    got_t = sorted((r["event_unixtime"], r["action"],
                    r["after"] or "", r["before"] or "") for r in got)
    want_t = sorted(key(e) for e in want)
    assert got_t == want_t
    assert len(got) == 52


def test_payload_blobs_decode_distributed_with_broadcast_registry(spark):
    # one metadata row + N self-timestamped transaction blobs
    rows = [(bytearray(ORDERS_REL),)]
    for i in range(40):
        blob = (enc_begin(TS + i) + enc_insert(16385, [str(i), "1.00", "O"])
                + enc_commit())
        rows.append((bytearray(blob),))
    df = spark.createDataFrame(rows, "value binary")
    out = po.pgoutput_payloads_to_raw(spark, df).collect()
    assert len(out) == 40
    by_id = {json.loads(r["after"])["id"]: r for r in out}
    assert by_id["5"]["event_unixtime"] == TS + 5  # exact Begin ts per blob


def test_payload_blob_without_begin_gets_fallback_sequence(spark):
    rows = [(bytearray(ORDERS_REL),),
            (bytearray(enc_insert(16385, ["1", "1.00", "O"])),)]
    df = spark.createDataFrame(rows, "value binary")
    out = po.pgoutput_payloads_to_raw(spark, df,
                                      fallback_unixtime_us=5_000_000).collect()
    assert len(out) == 1
    assert out[0]["event_unixtime"] >= 5_000_000  # banded synthetic, not 0


def test_conflicting_relation_redefinition_raises(spark):
    rel2 = enc_relation(16385, "db", "orders",
                        [(1, "id", 20, -1), (0, "note", 25, -1)])
    df = spark.createDataFrame(
        [(bytearray(ORDERS_REL),), (bytearray(rel2),)], "value binary")
    with pytest.raises(po.PgoutputError, match="redefined"):
        po.pgoutput_payloads_to_raw(spark, df)


def test_typed_parse_downstream(spark):
    """decode → split_updates → parse_values(string_values=True): the
    shared typed path the wal2json oracles pin, fed by pgoutput."""
    from pyspark.sql import types as T

    from synch_spark.events import parse_values, split_updates

    payloads = [ORDERS_REL, enc_begin(TS),
                enc_insert(16385, ["1", "10.50", "O"]),
                enc_update(16385, ["1", "11.25", "F"],
                           old=["1", "10.50", "O"], old_kind=b"O"),
                enc_commit()]
    rows = [(bytearray(b"".join(payloads)),)]
    df = spark.createDataFrame(rows, "value binary")
    raw = po.pgoutput_payloads_to_raw(spark, df)
    vschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DecimalType(15, 2)),
        T.StructField("status", T.StringType()),
    ])
    typed = parse_values(split_updates(raw), vschema, string_values=True)
    got = {(r["id"], str(r["price"]), r["status"], r["action"])
           for r in typed.collect()}
    assert (1, "10.50", "O", "insert") in got
    assert (1, "11.25", "F", "insert") in got  # update's insert half
    assert any(a == "delete" for _, _, _, a in got)


# -- review-sweep regressions ---------------------------------------------------

def test_truncated_frame_file_is_loud(tmp_path):
    """A crash mid-write leaves a frame shorter than its declared
    length — that must raise, never silently drop the tail."""
    payloads = [ORDERS_REL, enc_insert(16385, ["1", "2", "A"])]
    p = str(tmp_path / "torn.pgo")
    po.write_pgoutput_frames(p, payloads)
    whole = open(p, "rb").read()
    with pytest.raises(po.PgoutputError, match="truncated"):
        list(po.read_pgoutput_frames(whole[:-3]))  # torn payload
    with pytest.raises(po.PgoutputError, match="frame length"):
        list(po.read_pgoutput_frames(whole + b"\x00\x01"))  # torn length word


def test_fallback_sequence_monotone_across_payload_rows(spark):
    """Begin-less payload rows in ONE partition must get DISTINCT,
    monotone fallback timestamps — per-payload counter restarts would
    stamp every row identically and invert last-wins downstream."""
    rows = [(bytearray(ORDERS_REL),)]
    rows += [(bytearray(enc_insert(16385, [str(i), "1.00", "O"])),)
             for i in range(20)]
    df = spark.createDataFrame(rows, "value binary").coalesce(1)
    out = po.pgoutput_payloads_to_raw(spark, df,
                                      fallback_unixtime_us=10_000_000).collect()
    ts = [r["event_unixtime"] for r in out]
    assert len(set(ts)) == len(ts), "fallback timestamps must be distinct"


def test_begin_does_not_leak_across_payload_rows(spark):
    """Distributed decode: a Begin in one payload row must not stamp a
    Begin-less row that happens to follow it in partition order — row
    order between payloads is arbitrary, so inheriting the open
    transaction would be nondeterministic."""
    ts = 1_600_000_000_000_000
    rows = [(bytearray(ORDERS_REL),),
            (bytearray(enc_begin(ts) + enc_insert(16385, ["1", "1", "A"])),),
            (bytearray(enc_insert(16385, ["2", "2", "B"])),)]  # no Begin
    df = spark.createDataFrame(rows, "value binary").coalesce(1)
    out = {json.loads(r["after"])["id"]: r["event_unixtime"]
           for r in po.pgoutput_payloads_to_raw(spark, df).collect()}
    assert out["1"] == ts
    assert out["2"] != ts, "Begin leaked into a foreign payload row"


# -- protocol v2: streamed in-progress transactions ------------------------------

def enc_stream_start(xid: int, first: bool = True) -> bytes:
    return b"S" + struct.pack("!IB", xid, 1 if first else 0)


def enc_stream_stop() -> bytes:
    return b"E"


def enc_stream_commit(xid: int, unix_ts_us: int) -> bytes:
    return b"c" + struct.pack("!IBQQq", xid, 0, 0, 0,
                              unix_ts_us - PG_EPOCH_US)


def enc_stream_abort(xid: int, subxid: int | None = None) -> bytes:
    return b"A" + struct.pack("!II", xid, subxid if subxid is not None
                              else xid)


def _xid_prefixed(msg: bytes, xid: int) -> bytes:
    """Inside S..E segments data messages carry xid after the type byte."""
    return msg[:1] + struct.pack("!I", xid) + msg[1:]


def test_streamed_transaction_emits_at_commit_with_commit_time():
    """Chunks buffer across segments and only surface at Stream Commit,
    stamped with ITS commit time — never the fallback sequence."""
    payloads = [ORDERS_REL,
                enc_stream_start(501),
                _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 501),
                enc_stream_stop(),
                # a plain (non-streamed) txn between segments
                enc_begin(TS), enc_insert(16385, ["9", "9", "Z"]),
                enc_commit(),
                enc_stream_start(501, first=False),
                _xid_prefixed(enc_insert(16385, ["2", "2", "B"]), 501),
                enc_stream_stop(),
                enc_stream_commit(501, TS + 5)]
    evs = drain(payloads)
    got = [(json.loads(e["after"])["id"], e["event_unixtime"]) for e in evs]
    # the interleaved plain txn emits FIRST (it committed first)
    assert got == [("9", TS), ("1", TS + 5), ("2", TS + 5)]


def test_streamed_abort_discards_everything():
    payloads = [ORDERS_REL,
                enc_stream_start(502),
                _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 502),
                enc_stream_stop(),
                enc_stream_abort(502),
                enc_begin(TS), enc_insert(16385, ["9", "9", "Z"]),
                enc_commit()]
    evs = drain(payloads)
    assert [json.loads(e["after"])["id"] for e in evs] == ["9"]


def test_streamed_subtransaction_abort_excises_only_its_rows():
    """ROLLBACK TO SAVEPOINT inside a streamed transaction: only the
    subtransaction's rows vanish; the rest commit."""
    payloads = [ORDERS_REL,
                enc_stream_start(503),
                _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 503),
                _xid_prefixed(enc_insert(16385, ["2", "2", "B"]), 504),  # subxact
                _xid_prefixed(enc_insert(16385, ["3", "3", "C"]), 503),
                enc_stream_stop(),
                enc_stream_abort(503, subxid=504),
                enc_stream_commit(503, TS)]
    evs = drain(payloads)
    assert [json.loads(e["after"])["id"] for e in evs] == ["1", "3"]


def test_streamed_relation_inside_segment_registers():
    """A Relation message inside a segment (xid-prefixed) must register
    — PG sends it there for tables first touched mid-stream."""
    rel2 = enc_relation(16999, "db", "extra",
                        [(1, "k", 20, -1)])
    payloads = [enc_stream_start(505),
                _xid_prefixed(rel2, 505),
                _xid_prefixed(enc_insert(16999, ["7"]), 505),
                enc_stream_stop(),
                enc_stream_commit(505, TS)]
    evs = drain(payloads)
    assert [(e["table"], json.loads(e["after"])["k"]) for e in evs] == [
        ("extra", "7")]


def test_streamed_chunks_survive_payload_boundaries_in_ordered_mode():
    """The live tail hands each message as its own payload; segments
    and buffers must carry across payloads when per_payload_tx=False."""
    payloads = [ORDERS_REL, enc_stream_start(506),
                _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 506),
                enc_stream_stop(), enc_stream_commit(506, TS)]
    evs = drain(payloads)  # one message per payload, like XLogData
    assert len(evs) == 1 and evs[0]["event_unixtime"] == TS


def test_uncommitted_stream_drops_at_end_without_emitting():
    payloads = [ORDERS_REL, enc_stream_start(507),
                _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 507),
                enc_stream_stop()]
    assert drain(payloads) == []


def test_distributed_path_refuses_cross_payload_stream(spark):
    """per_payload_tx mode (arbitrary row order) cannot associate
    segments across rows — a dangling stream raises toward the ordered
    decode instead of silently mis-buffering."""
    rows = [(bytearray(ORDERS_REL),),
            (bytearray(enc_stream_start(508)
                       + _xid_prefixed(enc_insert(16385, ["1", "1", "A"]),
                                       508)),),
            (bytearray(enc_insert(16385, ["2", "2", "B"])),)]
    df = spark.createDataFrame(rows, "value binary").coalesce(1)
    import py4j.protocol
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        po.pgoutput_payloads_to_raw(spark, df).collect()


def test_self_contained_stream_in_one_blob_decodes_distributed(spark):
    """A whole S..c sequence inside ONE payload blob is fine on the
    distributed path — the refusal is only for streams SPANNING rows."""
    blob = (ORDERS_REL + enc_stream_start(509)
            + _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 509)
            + enc_stream_stop() + enc_stream_commit(509, TS))
    df = spark.createDataFrame([(bytearray(blob),)], "value binary")
    out = po.pgoutput_payloads_to_raw(spark, df).collect()
    assert len(out) == 1 and out[0]["event_unixtime"] == TS


def test_distributed_path_refuses_dangling_stream_in_last_row(spark):
    """Same refusal when the dangling stream sits in the task's LAST
    payload row (no next row triggers the boundary check)."""
    rows = [(bytearray(ORDERS_REL),),
            (bytearray(enc_stream_start(510)
                       + _xid_prefixed(enc_insert(16385, ["1", "1", "A"]),
                                       510)),)]
    df = spark.createDataFrame(rows, "value binary").coalesce(1)
    import py4j.protocol
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        po.pgoutput_payloads_to_raw(spark, df).collect()


def test_payloads_to_raw_with_explicit_registry_skips_collect(spark):
    """A caller that already holds the registry skips the Relation
    collect pass — the payload frame is scanned once. Data must decode
    identically, and a frame with NO R payload at all still works."""
    rows = [(bytearray(enc_begin(TS) + enc_insert(16385, ["1", "1.00", "O"])
                       + enc_commit()),)]
    df = spark.createDataFrame(rows, "value binary")
    registry = {16385: po.Relation(16385, "db", "orders", "d",
                                   [(1, "id", 20, -1), (0, "price", 1700, -1),
                                    (0, "status", 25, -1)])}
    out = po.pgoutput_payloads_to_raw(spark, df, relations=registry).collect()
    assert len(out) == 1
    assert json.loads(out[0]["after"]) == {"id": "1", "price": "1.00",
                                           "status": "O"}
    assert out[0]["event_unixtime"] == TS
    # tuple form (Relation.to_tuple) is accepted too
    out2 = po.pgoutput_payloads_to_raw(
        spark, df,
        relations={16385: registry[16385].to_tuple()}).collect()
    assert out2[0]["after"] == out[0]["after"]


# -- protocol v3: two-phase (prepared) transactions -------------------------------

def enc_begin_prepare(xid: int, gid: str) -> bytes:
    return (b"b" + struct.pack("!QQqI", 0, 0, 0, xid)
            + gid.encode() + b"\x00")


def enc_prepare(xid: int, gid: str) -> bytes:
    return (b"P" + struct.pack("!BQQqI", 0, 0, 0, 0, xid)
            + gid.encode() + b"\x00")


def enc_commit_prepared(xid: int, gid: str, unix_ts_us: int) -> bytes:
    return (b"K" + struct.pack("!BQQqI", 0, 0, 0,
                               unix_ts_us - PG_EPOCH_US, xid)
            + gid.encode() + b"\x00")


def enc_rollback_prepared(xid: int, gid: str) -> bytes:
    return (b"r" + struct.pack("!BQQqqI", 0, 0, 0, 0, 0, xid)
            + gid.encode() + b"\x00")


def enc_stream_prepare(xid: int, gid: str) -> bytes:
    return (b"p" + struct.pack("!BQQqI", 0, 0, 0, 0, xid)
            + gid.encode() + b"\x00")


def test_prepared_transaction_emits_at_commit_prepared():
    """b..P parks the rows under the gid; other transactions flow in
    between; K emits the park stamped with ITS commit time."""
    payloads = [ORDERS_REL,
                enc_begin_prepare(601, "gid-1"),
                enc_insert(16385, ["1", "1", "A"]),
                enc_prepare(601, "gid-1"),
                # an ordinary txn between prepare and commit-prepared
                enc_begin(TS), enc_insert(16385, ["9", "9", "Z"]),
                enc_commit(),
                enc_commit_prepared(601, "gid-1", TS + 7)]
    evs = drain(payloads)
    got = [(json.loads(e["after"])["id"], e["event_unixtime"]) for e in evs]
    assert got == [("9", TS), ("1", TS + 7)]


def test_rollback_prepared_discards():
    payloads = [ORDERS_REL,
                enc_begin_prepare(602, "gid-2"),
                enc_insert(16385, ["1", "1", "A"]),
                enc_prepare(602, "gid-2"),
                enc_rollback_prepared(602, "gid-2"),
                enc_begin(TS), enc_insert(16385, ["9", "9", "Z"]),
                enc_commit()]
    assert [json.loads(e["after"])["id"] for e in drain(payloads)] == ["9"]


def test_stream_prepare_parks_streamed_transaction():
    """A big prepared transaction streams in segments and parks at
    Stream Prepare; Commit Prepared then releases it."""
    payloads = [ORDERS_REL,
                enc_stream_start(603),
                _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 603),
                enc_stream_stop(),
                enc_stream_prepare(603, "gid-3"),
                enc_commit_prepared(603, "gid-3", TS + 9)]
    evs = drain(payloads)
    assert [(json.loads(e["after"])["id"], e["event_unixtime"])
            for e in evs] == [("1", TS + 9)]


def test_undecided_prepared_drops_at_stream_end():
    payloads = [ORDERS_REL,
                enc_begin_prepare(604, "gid-4"),
                enc_insert(16385, ["1", "1", "A"]),
                enc_prepare(604, "gid-4")]
    assert drain(payloads) == []


def test_distributed_path_refuses_cross_payload_prepare(spark):
    rows = [(bytearray(ORDERS_REL),),
            (bytearray(enc_begin_prepare(605, "gid-5")
                       + enc_insert(16385, ["1", "1", "A"])
                       + enc_prepare(605, "gid-5")),)]
    df = spark.createDataFrame(rows, "value binary").coalesce(1)
    import py4j.protocol
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        po.pgoutput_payloads_to_raw(spark, df).collect()


# -- second review-sweep regressions ----------------------------------------------

def test_state_out_flags_undecided_prepare():
    """The live tail must know a round ended with an undecided
    streamed/prepared transaction: confirming past the PREPARE would
    lose it (PG later sends only Commit Prepared, never the changes)."""
    state: dict = {}
    evs = list(po.iter_pgoutput_changes(
        [ORDERS_REL, enc_begin_prepare(701, "g"),
         enc_insert(16385, ["1", "1", "A"]), enc_prepare(701, "g")],
        state_out=state))
    assert evs == [] and state["undecided"] is True
    state = {}
    list(po.iter_pgoutput_changes(
        [ORDERS_REL, enc_begin(TS), enc_insert(16385, ["1", "1", "A"]),
         enc_commit()], state_out=state))
    assert state["undecided"] is False
    # an open stream segment (round idled mid-segment) also flags
    state = {}
    list(po.iter_pgoutput_changes(
        [ORDERS_REL, enc_stream_start(702),
         _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 702)],
        state_out=state))
    assert state["undecided"] is True


def test_archive_decode_errors_on_cut_transaction(spark, tmp_path):
    """A static frame archive cut mid-transaction (segments in file N,
    commit in file N+1 → different tasks) must RAISE — there is no
    slot to replay an archive, so a drop would be silent loss."""
    f1 = str(tmp_path / "cut.000001.pgo")
    po.write_pgoutput_frames(f1, [
        ORDERS_REL, enc_stream_start(703),
        _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 703),
        enc_stream_stop()])
    import py4j.protocol
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        po.pgoutput_files_to_raw(spark, f1).collect()


def test_fallback_seq_cap_stays_inside_band():
    """Past the cap the sequence must stop advancing (ties at the cap)
    rather than spill into the next partition's band."""
    payloads = [ORDERS_REL] + [enc_insert(16385, [str(i), "1", "A"])
                               for i in range(30)]
    evs = list(po.iter_pgoutput_changes(
        payloads, fallback_unixtime_us=0, sub_base=0, seq_cap=10))
    ts = [e["event_unixtime"] for e in evs]
    assert max(ts) == 10 and ts[:10] == list(range(1, 11))


def test_proto_version_validation_at_subscribe():
    """Protocol 1-4 subscribe; 5 refuses (unknown wire shapes would
    misparse into a wedged every-round failure); streaming 'parallel'
    without proto_version 4 refuses — the invalid pairing PG itself
    rejects, surfaced as an actionable config error."""
    from synch_spark.sources.wal_socket import WalProtocolError, WalSocketClient

    cli = WalSocketClient("127.0.0.1", 1, "u", "p")

    sent = []

    class _FakeSock:
        def sendall(self, data):
            sent.append(bytes(data))
            raise OSError("stop after validation passed")

    cli.sock = _FakeSock()
    with pytest.raises(WalProtocolError, match="proto_version"):
        cli.start_replication("s", options={"proto_version": "5"},
                              plugin="pgoutput")
    assert not sent, "must refuse before sending"
    with pytest.raises(WalProtocolError, match="parallel"):
        cli.start_replication("s", options={"proto_version": "2",
                                            "streaming": "parallel"},
                              plugin="pgoutput")
    assert not sent
    # v4 + parallel passes validation (the OSError proves the START
    # message was actually being sent)
    with pytest.raises(OSError, match="stop after validation"):
        cli.start_replication("s", options={"proto_version": "4",
                                            "streaming": "parallel"},
                              plugin="pgoutput")
    assert sent and b"proto_version" in sent[0]
    cli.sock = None


def test_frozen_registry_refuses_mid_blob_redefinition(spark):
    """Distributed decode with a mid-blob Relation REDEFINITION (same
    arity, renamed columns — invisible to the leading-R collect pass):
    rows of that relation in other blobs would zip to the wrong column
    names under arbitrary row order, so the task must refuse toward
    the ordered decode instead of corrupting silently."""
    rel_renamed = enc_relation(16385, "db", "orders", [
        (1, "key", 20, -1), (0, "cost", 1700, -1), (0, "flag", 25, -1)])
    rows = [(bytearray(ORDERS_REL),),
            (bytearray(enc_begin(TS) + rel_renamed
                       + enc_insert(16385, ["1", "2", "A"]) + enc_commit()),),
            (bytearray(enc_insert(16385, ["9", "9", "Z"])),)]
    df = spark.createDataFrame(rows, "value binary").coalesce(1)
    import py4j.protocol
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        po.pgoutput_payloads_to_raw(spark, df).collect()
    # an IDENTICAL mid-blob re-send (the server's normal per-session
    # re-announce) stays fine
    rows_ok = [(bytearray(ORDERS_REL),),
               (bytearray(enc_begin(TS) + ORDERS_REL
                          + enc_insert(16385, ["1", "2", "A"])
                          + enc_commit()),)]
    df = spark.createDataFrame(rows_ok, "value binary")
    assert len(po.pgoutput_payloads_to_raw(spark, df).collect()) == 1


def enc_stream_abort_v4(xid: int, subxid: int | None = None,
                        abort_lsn: int = 0x1234, abort_ts_pg: int = 99) -> bytes:
    """Protocol-v4 (streaming 'parallel') Stream Abort: the v2 shape
    plus abort LSN and abort timestamp."""
    return enc_stream_abort(xid, subxid) + struct.pack(
        "!Qq", abort_lsn, abort_ts_pg)


def test_streamed_abort_v4_width_parallel_mode():
    """PG 16 parallel streaming (proto_version 4): Stream Abort carries
    16 extra bytes. With streaming_parallel=True the decoder must
    consume exactly that width — the NEXT message in the same
    concatenated blob decodes cleanly — and still excise the right
    rows; subtransaction aborts too."""
    blob = (ORDERS_REL
            + enc_stream_start(601)
            + _xid_prefixed(enc_insert(16385, ["1", "1", "A"]), 601)
            + _xid_prefixed(enc_insert(16385, ["2", "2", "B"]), 602)
            + enc_stream_stop()
            + enc_stream_abort_v4(601, subxid=602)   # excise subxact only
            + enc_stream_commit(601, TS)
            # messages AFTER the widened abort prove width handling
            + enc_begin(TS + 7) + enc_insert(16385, ["9", "9", "Z"])
            + enc_commit())
    evs = drain([blob], streaming_parallel=True)
    assert [(json.loads(e["after"])["id"], e["event_unixtime"])
            for e in evs] == [("1", TS), ("9", TS + 7)]
    # whole-transaction abort, v4 width
    blob2 = (ORDERS_REL
             + enc_stream_start(603)
             + _xid_prefixed(enc_insert(16385, ["5", "5", "E"]), 603)
             + enc_stream_stop()
             + enc_stream_abort_v4(603)
             + enc_begin(TS) + enc_insert(16385, ["6", "6", "F"])
             + enc_commit())
    evs = drain([blob2], streaming_parallel=True)
    assert [json.loads(e["after"])["id"] for e in evs] == ["6"]
    # and the v2 shape stays the default: same logical stream, narrow
    # abort, streaming_parallel left False
    blob3 = (ORDERS_REL
             + enc_stream_start(604)
             + _xid_prefixed(enc_insert(16385, ["7", "7", "G"]), 604)
             + enc_stream_stop()
             + enc_stream_abort(604)
             + enc_begin(TS) + enc_insert(16385, ["8", "8", "H"])
             + enc_commit())
    evs = drain([blob3])
    assert [json.loads(e["after"])["id"] for e in evs] == ["8"]
