"""Kafka wire client (sources/kafka_socket.py) against the in-process
fake broker (tests/kafka_fake.py) — VERDICT r10 item 6: the last
contract-only boundary now runs over real sockets, like the binlog and
walsender tails. The fake parses requests and checks batch CRCs with
its own independent implementation, so a client framing bug cannot
self-validate."""

from __future__ import annotations

import pytest

from synch_spark.sources.kafka_socket import (
    KafkaSocketClient,
    KafkaWireError,
    crc32c,
    decode_record_batches,
    decode_record_batches_ex,
    encode_record_batch,
)
from tests.kafka_fake import FakeKafkaBroker, crc32c_bitwise


@pytest.fixture()
def broker():
    srv = FakeKafkaBroker()
    srv.start()
    yield srv
    srv.stop()


def _client(srv) -> KafkaSocketClient:
    return KafkaSocketClient("127.0.0.1", srv.port)


# -- codec ------------------------------------------------------------------
def test_crc32c_known_answer_and_independence():
    # iSCSI/RFC 3720 known-answer vector
    assert crc32c(b"123456789") == 0xE3069283
    # table-driven client impl == bitwise fake impl on arbitrary bytes
    for blob in (b"", b"\x00" * 64, bytes(range(256)), b"kafka" * 99):
        assert crc32c(blob) == crc32c_bitwise(blob)


def test_record_batch_roundtrip_nulls_offsets_truncation():
    recs = [(b"k1", b"v1"), (None, b"v2"), (b"k3", None)]
    batch = encode_record_batch(recs, base_timestamp_ms=1234, base_offset=17)
    assert batch[16] == 2  # magic v2 at its documented position
    got = decode_record_batches(batch)
    assert got == [(17, b"k1", b"v1"), (18, None, b"v2"), (19, b"k3", None)]
    b2 = encode_record_batch([(b"a", b"b")], base_offset=20)
    assert decode_record_batches(batch + b2)[-1] == (20, b"a", b"b")
    # a truncated trailing batch (mid-segment fetch) is skipped, never a crash
    assert decode_record_batches(batch + b2[:10]) == got


def test_record_batch_crc_is_checked():
    batch = bytearray(encode_record_batch([(b"k", b"v")]))
    batch[-1] ^= 0xFF  # flip a payload bit
    with pytest.raises(KafkaWireError, match="CRC32C"):
        decode_record_batches(bytes(batch))


# -- wire APIs ----------------------------------------------------------------
def test_api_versions_metadata_create(broker):
    with _client(broker) as c:
        vers = c.api_versions()
        assert 0 in vers and 1 in vers and 19 in vers
        assert c.create_topic("synch.db", num_partitions=2) is True
        assert c.create_topic("synch.db") is False  # idempotent
        md = c.metadata(["synch.db", "ghost"])
        assert sorted(md["topics"]["synch.db"]["partitions"]) == [0, 1]
        assert md["topics"]["ghost"]["error"] == 3
        assert md["brokers"][0][2] == broker.port


def test_produce_fetch_roundtrip_with_broker_side_crc(broker):
    with _client(broker) as c:
        c.create_topic("t")
        base0 = c.produce("t", 0, [(b"k%d" % i, b"v%d" % i)
                                   for i in range(3)])
        base1 = c.produce("t", 0, [(None, b"v3")])
        assert (base0, base1) == (0, 3)  # broker assigns contiguous offsets
        assert broker.produce_crc_checked == 2  # independent CRC ran
        hw, recs, _nxt = c.fetch("t", 0, 0)
        assert hw == 4
        assert [(o, v) for o, _k, v in recs] == [
            (0, b"v0"), (1, b"v1"), (2, b"v2"), (3, b"v3")]
        # seek: fetch from a mid-log offset returns only the tail
        hw, tail, _nxt = c.fetch("t", 0, 2)
        assert [o for o, _k, _v in tail] == [2, 3]


def test_produce_unknown_topic_and_corrupt_batch(broker):
    with _client(broker) as c:
        with pytest.raises(KafkaWireError, match="error 3"):
            c.produce("ghost", 0, [(b"k", b"v")])
        c.create_topic("t")
        # hand the broker a corrupted batch: it must reject with
        # CORRUPT_MESSAGE (46), proving ITS crc check is real too
        import struct

        bad = bytearray(encode_record_batch([(b"k", b"v")]))
        bad[-1] ^= 0xFF
        body = (struct.pack(">h", -1)  # null transactional_id
                + struct.pack(">hi", 1, 1000)
                + struct.pack(">i", 1) + b"\x00\x01t"
                + struct.pack(">i", 1) + struct.pack(">i", 0)
                + struct.pack(">i", len(bad)) + bytes(bad))
        r = c._request(0, 3, body)
        r.i32(), r.string(), r.i32(), r.i32()
        assert r.i16() == 46  # CORRUPT_MESSAGE


# -- end-to-end through the broker boundary -----------------------------------
def test_produce_consume_e2e_events_roundtrip(spark, broker):
    """The full B1->B4 loop over real sockets: an event frame ->
    kafka_payload contract -> wire produce (driver-side, reference's
    single-threaded loop shape) -> assign+seek wire consume ->
    RAW_EVENT_WIRE_SCHEMA parse == the original events, wire_seq
    included (order survives the broker hop)."""
    from pyspark.sql import functions as F

    from synch_spark.broker import (
        consume_from_kafka_socket,
        ensure_topic,
        produce_to_kafka_socket,
    )
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA

    events = spark.createDataFrame(
        [("db", "t", "insert", None, '{"id": 1, "x": "a"}', 1000, 7),
         ("db", "t", "update", '{"id": 1}', '{"id": 1, "x": "b"}', 1000, 8),
         ("db2", "u", "delete", '{"id": 9}', None, 2000, 9)],
        RAW_EVENT_WIRE_SCHEMA,
    )
    bs = f"127.0.0.1:{broker.port}"
    ensure_topic(bs, "synch.db")
    ensure_topic(bs, "synch.db2")
    assert produce_to_kafka_socket(events, bs) == 3

    df1, next1 = consume_from_kafka_socket(spark, bs, "synch.db")
    df2, next2 = consume_from_kafka_socket(spark, bs, "synch.db2")
    assert (next1, next2) == (2, 1)
    parsed = (
        df1.union(df2)
        .select(F.from_json("value", RAW_EVENT_WIRE_SCHEMA).alias("e"))
        .select("e.*")
    )
    got = sorted(tuple(r) for r in parsed.collect())
    want = sorted(tuple(r) for r in events.collect())
    assert got == want
    # keys carry the schema (consumer-group partitioning contract)
    assert {r["key"] for r in df1.collect()} == {"db"}

    # resume from the persisted cursor: nothing new -> empty frame,
    # cursor unchanged (the durable-cursor discipline)
    df3, next3 = consume_from_kafka_socket(spark, bs, "synch.db",
                                           offset=next1)
    assert df3.count() == 0 and next3 == next1


def test_produce_batching_respects_batch_size(broker, spark):
    from synch_spark.broker import ensure_topic, produce_to_kafka_socket
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA

    rows = [("db", "t", "insert", None, '{"id": %d}' % i, i, i)
            for i in range(25)]
    events = spark.createDataFrame(rows, RAW_EVENT_WIRE_SCHEMA)
    bs = f"127.0.0.1:{broker.port}"
    ensure_topic(bs, "synch.db")
    assert produce_to_kafka_socket(events, bs, batch_size=10) == 25
    # 10 + 10 + 5 -> three wire batches, all CRC-verified by the broker
    assert broker.produce_crc_checked == 3
    assert broker.log_end[("synch.db", 0)] == 25


def test_cli_produce_kafka_socket_transport_e2e(tmp_path, capsys, spark,
                                                broker):
    """`produce --once --sink kafka` with spark.kafka.transport: socket:
    the snapshot-diff poller's change batch rides the stdlib wire
    producer to a real (fake) broker socket — no connector jar, no
    kafka-python — and a wire consume reads the events back."""
    import yaml
    from pyspark.sql import functions as F

    from synch_spark.broker import consume_from_kafka_socket
    from synch_spark.cli import main
    from synch_spark.events import RAW_EVENT_SCHEMA
    from synch_spark.session import read_table

    src_path = str(tmp_path / "src.parquet")
    read_table(spark, "/root/testdata/sf0.001", "region") \
        .write.parquet(src_path)
    bs = f"127.0.0.1:{broker.port}"
    broker.topics["synch.db"] = 1  # pre-provisioned topic
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "region", "pk": ["r_regionkey"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "source_format": "parquet",
            "sources": {"db.region": src_path},
            "kafka": {"bootstrap_servers": bs, "transport": "socket"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "produce", "--once",
                 "--sink", "kafka"]) == 0

    df, nxt = consume_from_kafka_socket(spark, bs, "synch.db")
    assert nxt == 5  # the 5 regions arrived as inserts
    parsed = (df.select(F.from_json("value", RAW_EVENT_SCHEMA).alias("e"))
              .select("e.*"))
    rows = parsed.collect()
    assert len(rows) == 5
    assert {r["action"] for r in rows} == {"insert"}
    assert {r["table"] for r in rows} == {"region"}


@pytest.mark.slow
def test_cli_socket_cdc_loop_produce_consume_check(tmp_path, capsys, spark,
                                                   broker):
    """The FULL CDC loop over the wire transport, no connector jar:
    produce (snapshot diff -> socket produce) -> consume
    (--available-now socket fetch -> apply_batch) -> check parity;
    then mutate the source and loop again — the binlog-free e2e the
    spool path has always had, now through a real broker socket with
    durable per-partition offset cursors."""
    import json as _json

    import yaml
    from pyspark.sql import functions as F

    from synch_spark.cli import main
    from synch_spark.session import read_table

    src_path = str(tmp_path / "src.parquet")
    read_table(spark, "/root/testdata/sf0.001", "region") \
        .write.parquet(src_path)
    bs = f"127.0.0.1:{broker.port}"
    broker.topics["synch.db"] = 1
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "region", "pk": ["r_regionkey"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "source_format": "parquet",
            "sources": {"db.region": src_path},
            "value_schemas": {
                "db.region": spark.read.parquet(src_path).schema.jsonValue()
            },
            "kafka": {"bootstrap_servers": bs, "transport": "socket",
                      "topic": "synch.db"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "produce", "--once",
                 "--sink", "kafka"]) == 0
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    assert main(["--config", str(p), "check", "--checksum"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True and out["check"]["db.region"]["target"] == 5
    # the durable cursor advanced past the 5 inserts
    cur = _json.loads(
        (tmp_path / "wh" / "_kafka_socket_offsets.json").read_text())
    assert cur == {"synch.db/0": 5}

    # mutate: rename region 0, drop region 4 -> update + delete events
    cur_df = spark.read.parquet(src_path)
    mutated = cur_df.filter(F.col("r_regionkey") != 4).withColumn(
        "r_name",
        F.when(F.col("r_regionkey") == 0,
               F.lit("RENAMED")).otherwise(F.col("r_name")))
    mutated.write.mode("overwrite").parquet(src_path + ".v2")
    cfg["spark"]["sources"]["db.region"] = src_path + ".v2"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "produce", "--once",
                 "--sink", "kafka"]) == 0
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    assert main(["--config", str(p), "check", "--checksum"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True and out["check"]["db.region"]["target"] == 4

    # replay tolerance: wind the cursor back and re-consume — the
    # idempotent merge converges to the same state (at-least-once)
    (tmp_path / "wh" / "_kafka_socket_offsets.json").write_text(
        _json.dumps({"synch.db/0": 0}))
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    assert main(["--config", str(p), "check", "--checksum"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True and out["check"]["db.region"]["target"] == 4


def test_cli_socket_consume_unknown_topic_is_loud(tmp_path, spark, broker):
    import yaml

    from synch_spark.cli import main

    cfg = {
        "core": {"insert_num": 10, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "region", "pk": ["r_regionkey"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sources": {},
            "value_schemas": {"db.region": {"type": "struct", "fields": [
                {"name": "r_regionkey", "type": "long",
                 "nullable": True, "metadata": {}}]}},
            "kafka": {"bootstrap_servers": f"127.0.0.1:{broker.port}",
                      "transport": "socket", "topic": "ghost"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    with pytest.raises(SystemExit, match="ghost"):
        main(["--config", str(p), "consume", "--available-now"])


def test_list_offsets_and_out_of_range_reseek(spark, broker):
    """ListOffsets earliest/latest, and the retention story: a cursor
    that fell off the retained log raises the TYPED out-of-range error
    at the client layer, and consume_from_kafka_socket reseeks to
    earliest LOUDLY (the lost range is printed) instead of crashing or
    silently skipping."""
    from synch_spark.broker import consume_from_kafka_socket
    from synch_spark.sources.kafka_socket import KafkaOffsetOutOfRange

    with _client(broker) as c:
        c.create_topic("t")
        for i in range(10):
            c.produce("t", 0, [(b"k", b"v%d" % i)])
        assert c.list_offsets("t", 0, -2) == 0
        assert c.list_offsets("t", 0, -1) == 10
        broker.truncate_before("t", 0, 6)
        assert c.list_offsets("t", 0, -2) == 6
        with pytest.raises(KafkaOffsetOutOfRange):
            c.fetch("t", 0, 2)  # below the retained start
        # still valid offsets fetch fine
        hw, recs, _nxt = c.fetch("t", 0, 7)
        assert hw == 10 and [o for o, _k, _v in recs] == [7, 8, 9]

    # the consume loop reseeks: cursor 2 -> earliest 6, returns 6..9
    df, nxt = consume_from_kafka_socket(
        spark, f"127.0.0.1:{broker.port}", "t", offset=2)
    assert nxt == 10
    assert [r["offset"] for r in df.orderBy("offset").collect()] == \
        [6, 7, 8, 9]


@pytest.mark.slow
def test_polling_consume_restart_epoch_no_collision(tmp_path, capsys, spark,
                                                    broker):
    """Restart-collision regression (found round 11): the polling
    consume loops used a PROCESS-LOCAL epoch counter restarting at 0,
    while a table's idempotence markers survive the last 64 commits —
    after a restart, the first new batch of a NON-idempotent applier
    (collapsing sign-append here) collided with the previous run's
    "epoch 0" marker and was silently dropped, its offset still
    committed: data loss. Epochs are now content-bound (the applied
    offset range), so run 2's new data never collides while a genuine
    replay of the same range still dedupes."""
    import json as _json

    import yaml

    from synch_spark.broker import produce_to_kafka_socket
    from synch_spark.cli import main
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA
    from synch_spark.sources.table import ParquetTable

    bs = f"127.0.0.1:{broker.port}"
    broker.topics["synch.db"] = 1
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["k"],
             "clickhouse_engine": "collapsing_merge_tree"}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sources": {},
            "value_schemas": {"db.t": {"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {}}]}},
            "kafka": {"bootstrap_servers": bs, "transport": "socket",
                      "topic": "synch.db"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))

    def ship(k, ts):
        ev = spark.createDataFrame(
            [("db", "t", "insert", None,
              _json.dumps({"k": k, "v": float(k)}), ts, 0)],
            RAW_EVENT_WIRE_SCHEMA)
        assert produce_to_kafka_socket(ev, bs) == 1

    # run 1: one batch (offsets 0-1) applies the k=1 sign-append
    ship(1, 1000)
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    # run 2 — a FRESH process-local loop: new data at offsets 1-2
    ship(2, 2000)
    assert main(["--config", str(p), "consume", "--available-now"]) == 0

    rows = {(r["k"], r["sign"])
            for r in ParquetTable(spark, str(tmp_path / "wh/db/t"))
            .read().select("k", "sign").collect()}
    # the old counter scheme dropped run 2's batch (epoch-0 marker
    # collision): k=2 would be missing here
    assert rows == {(1, 1), (2, 1)}


def test_record_batch_codec_property():
    """Hypothesis: encode->decode is the identity for ANY record list
    (null/empty/large keys+values, any base offset/timestamp), any
    concatenation of batches decodes in order, and ANY truncation of
    the byte stream either decodes a prefix of whole batches or raises
    the CRC error — never crashes, never yields wrong records."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blob = st.one_of(st.none(), st.binary(max_size=64))
    rec = st.tuples(blob, blob)

    @settings(max_examples=50, deadline=None)
    @given(
        batches=st.lists(st.lists(rec, min_size=1, max_size=8),
                         min_size=1, max_size=4),
        base=st.integers(min_value=0, max_value=1 << 40),
        ts=st.integers(min_value=0, max_value=1 << 45),
        data=st.data(),
    )
    def prop(batches, base, ts, data):
        wire = b""
        want = []
        off = base
        for recs in batches:
            wire += encode_record_batch(recs, base_timestamp_ms=ts,
                                        base_offset=off)
            want += [(off + i, k, v) for i, (k, v) in enumerate(recs)]
            off += len(recs)
        assert decode_record_batches(wire) == want
        # arbitrary truncation: prefix-of-whole-batches or a loud error
        cut = data.draw(st.integers(min_value=0, max_value=len(wire)))
        try:
            got = decode_record_batches(wire[:cut])
        except KafkaWireError:
            return  # acceptable: a torn batch that still passed the
                    # length gate must fail CRC, not return garbage
        assert got == want[:len(got)]

    prop()


def test_produce_acks_zero_rejected(broker):
    with _client(broker) as c:
        c.create_topic("t")
        with pytest.raises(ValueError, match="acks=0"):
            c.produce("t", 0, [(b"k", b"v")], acks=0)


def test_distributed_wire_read_multi_partition(spark, broker):
    """read_kafka_socket_distributed: one executor task per partition
    over the wire protocol (the connector batch source's shape without
    the jar). Offset ranges pin at PLAN time, so rows produced after
    the call never leak into the bounded snapshot even though tasks
    fetch lazily; start_offsets resume from a cursor."""
    from synch_spark.broker import read_kafka_socket_distributed

    with _client(broker) as c:
        c.create_topic("bulk", num_partitions=3)
        for p in range(3):
            c.produce("bulk", p, [(b"k", b"p%d-%d" % (p, i))
                                  for i in range(4)])

    df, ends = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "bulk")
    assert ends == {0: 4, 1: 4, 2: 4}

    # append AFTER planning, BEFORE execution: must not appear
    with _client(broker) as c:
        c.produce("bulk", 1, [(b"k", b"late")])
    rows = df.collect()
    assert len(rows) == 12
    got = {(r["partition"], r["offset"], r["value"]) for r in rows}
    assert (1, 4, "late") not in got
    assert (2, 3, "p2-3") in got and (0, 0, "p0-0") in got
    # the fetch ran distributed: 3 planned ranges -> 3 input partitions
    assert df.rdd.getNumPartitions() == 3

    # resume: start from the previous end offsets -> only the late row
    df2, ends2 = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "bulk", start_offsets=ends)
    assert ends2 == {0: 4, 1: 5, 2: 4}
    assert [(r["partition"], r["offset"], r["value"])
            for r in df2.collect()] == [(1, 4, "late")]

    # empty range (nothing new): zero-row frame, same cursor back
    df3, ends3 = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "bulk", start_offsets=ends2)
    assert df3.count() == 0 and ends3 == ends2


def test_distributed_wire_read_feeds_raw_decode(spark, broker):
    """The distributed frame plugs straight into raw_from_kafka_values
    (value + offset columns) — wire order rides the offset like the
    connector path."""
    from pyspark.sql import functions as F

    from synch_spark.broker import (
        ensure_topic,
        produce_to_kafka_socket,
        read_kafka_socket_distributed,
    )
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA
    from synch_spark.streaming.pipeline import raw_from_kafka_values

    events = spark.createDataFrame(
        [("db", "t", "insert", None, '{"id": %d}' % i, 1000 + i, i)
         for i in range(6)], RAW_EVENT_WIRE_SCHEMA)
    bs = f"127.0.0.1:{broker.port}"
    ensure_topic(bs, "synch.db")
    produce_to_kafka_socket(events, bs)
    df, _ends = read_kafka_socket_distributed(spark, bs, "synch.db")
    decoded = raw_from_kafka_values(df, "raw")
    assert decoded.count() == 6
    ids = sorted(F.get_json_object(r["after"], "$.id") is not None
                 for r in decoded.collect())
    assert all(ids) and len(ids) == 6


@pytest.mark.slow
def test_socket_consume_bounded_batches_insert_num(tmp_path, capsys, spark,
                                                   broker):
    """Flush-policy parity: a deep backlog drains as insert_num-bounded
    batches (the maxOffsetsPerTrigger analog), the offset cursor
    advancing per batch — one giant apply would lose the whole
    backlog's progress on a late failure. --available-now exits only
    once a pass moves nothing, so the target still ends complete."""
    import json as _json

    import yaml

    from synch_spark.broker import produce_to_kafka_socket
    from synch_spark.cli import main
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA
    from synch_spark.sources.table import ParquetTable

    bs = f"127.0.0.1:{broker.port}"
    broker.topics["synch.db"] = 1
    events = spark.createDataFrame(
        [("db", "t", "insert", None, _json.dumps({"k": i, "v": float(i)}),
          1000 + i, i) for i in range(25)],
        RAW_EVENT_WIRE_SCHEMA)
    assert produce_to_kafka_socket(events, bs) == 25

    cfg = {
        "core": {"insert_num": 10, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["k"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sources": {},
            "value_schemas": {"db.t": {"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {}}]}},
            "kafka": {"bootstrap_servers": bs, "transport": "socket",
                      "topic": "synch.db"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    # all 25 applied, via 3 bounded batches (10+10+5): the table took
    # one committed version per batch
    t = ParquetTable(spark, str(tmp_path / "wh/db/t"))
    assert t.read().count() == 25
    cur = _json.loads(
        (tmp_path / "wh" / "_kafka_socket_offsets.json").read_text())
    assert cur == {"synch.db/0": 25}


# -- round-11 review regressions ----------------------------------------------
def _control_batch(records):
    """A transaction-marker batch: attributes bit 0x20 set, CRC
    recomputed — what an EOS producer's commit/abort marker looks like
    on the wire."""
    import struct

    b = bytearray(encode_record_batch(records))
    attrs = struct.unpack_from(">h", b, 21)[0] | 0x20
    struct.pack_into(">h", b, 21, attrs)
    struct.pack_into(">I", b, 17, crc32c(bytes(b[21:])))
    return bytes(b)


def test_control_batches_never_surface_as_data(broker):
    """Review r11: a transactional producer's control batches (commit/
    abort markers) are protocol bookkeeping; decoding them as data
    dead-letters one bogus row per transaction. The decoder skips
    attribute-bit-0x20 batches; data around them still decodes."""
    ctl = _control_batch([(b"\x00\x00\x00\x01", b"\x00\x00")])
    data = encode_record_batch([(b"k", b"v")], base_offset=1)
    assert decode_record_batches(ctl + data) == [(1, b"k", b"v")]

    # through the broker: interleave a control batch in the log
    with _client(broker) as c:
        c.create_topic("tx")
        c.produce("tx", 0, [(b"k0", b"v0")])
        with broker.lock:  # a committed transaction's marker lands
            import struct as _s

            stored = _s.pack(">q", 1) + ctl[8:]
            broker.logs[("tx", 0)].append(stored)
            broker.log_end[("tx", 0)] = 2
        c.produce("tx", 0, [(b"k2", b"v2")])
        hw, recs, _nxt = c.fetch("tx", 0, 0)
        assert hw == 3
        assert [(o, v) for o, _k, v in recs] == [(0, b"v0"), (2, b"v2")]


def test_distributed_read_clamps_truncated_cursor(spark, broker, capsys):
    """Review r11: a start cursor below the retained log start used to
    make every executor fetch fail (a permanent stall on restart since
    the plan reproduced the same offsets). The plan now clamps up to
    earliest LOUDLY."""
    from synch_spark.broker import read_kafka_socket_distributed

    with _client(broker) as c:
        c.create_topic("ret")
        for i in range(10):
            c.produce("ret", 0, [(b"k", b"v%d" % i)])
    broker.truncate_before("ret", 0, 6)
    df, ends = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "ret", start_offsets={0: 2})
    assert ends == {0: 10}
    assert [r["offset"] for r in df.orderBy("offset").collect()] == \
        [6, 7, 8, 9]
    assert "fell off the retained log" in capsys.readouterr().err


def test_distributed_read_routes_to_partition_leader(spark):
    """Review r11: a multi-broker cluster answers Fetch only on each
    partition's LEADER (error 6 elsewhere); the plan must route every
    range to its leader from the metadata it already fetched, not pin
    everything to the first bootstrap host."""
    from synch_spark.broker import read_kafka_socket_distributed

    a, b = FakeKafkaBroker(node_id=0), FakeKafkaBroker(node_id=1)
    a.start(), b.start()
    try:
        for srv in (a, b):
            srv.topics["t2"] = 2
        # partition 0 led by A, partition 1 led by B — both brokers
        # agree on the layout (same metadata from either)
        layout = {("t2", 0): 0, ("t2", 1): 1}
        a.partition_leaders.update(layout)
        b.partition_leaders.update(layout)
        a.peers = [(1, "127.0.0.1", b.port)]
        b.peers = [(0, "127.0.0.1", a.port)]
        with KafkaSocketClient("127.0.0.1", a.port) as c:
            assert c.produce("t2", 0, [(b"k", b"pa")]) == 0
        with KafkaSocketClient("127.0.0.1", b.port) as c:
            assert c.produce("t2", 1, [(b"k", b"pb")]) == 0

        # bootstrap = A only; partition 1's fetch must reach B
        df, ends = read_kafka_socket_distributed(
            spark, f"127.0.0.1:{a.port}", "t2")
        got = {(r["partition"], r["value"]) for r in df.collect()}
        assert got == {(0, "pa"), (1, "pb")} and ends == {0: 1, 1: 1}
        # and the wrong-broker produce is loudly NOT_LEADER
        with KafkaSocketClient("127.0.0.1", a.port) as c:
            with pytest.raises(KafkaWireError, match="error 6"):
                c.produce("t2", 1, [(b"k", b"x")])
    finally:
        a.stop(), b.stop()


def test_produce_avro_socket_transport_rejected(tmp_path, spark, broker):
    """Review r11: produce_format=debezium-avro + transport=socket used
    to silently route to the connector writer (opaque ClassNotFound in
    the jar-less environment that chose socket transport); now a clear
    config rejection, mirroring the consume side."""
    import yaml

    from synch_spark.cli import main
    from synch_spark.session import read_table

    src_path = str(tmp_path / "src.parquet")
    read_table(spark, "/root/testdata/sf0.001", "region") \
        .write.parquet(src_path)
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "region", "pk": ["r_regionkey"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "source_format": "parquet",
            "sources": {"db.region": src_path},
            "value_schemas": {
                "db.region": spark.read.parquet(src_path).schema.jsonValue()},
            "kafka": {"bootstrap_servers": f"127.0.0.1:{broker.port}",
                      "transport": "socket",
                      "produce_format": "debezium-avro",
                      "produce_schema_ids": {"db.region": 7}},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    broker.topics["synch.db"] = 1
    with pytest.raises(SystemExit, match="socket"):
        main(["--config", str(p), "produce", "--once", "--sink", "kafka"])


def test_socket_produce_routes_to_topic_leader(spark):
    """produce_to_kafka_socket routes each topic's batch to its
    partition leader (a multi-broker cluster rejects Produce on a
    non-leader with error 6): topic synch.db led by broker B while the
    bootstrap list names only A."""
    from synch_spark.broker import produce_to_kafka_socket
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA

    a, b = FakeKafkaBroker(node_id=0), FakeKafkaBroker(node_id=1)
    a.start(), b.start()
    try:
        for srv in (a, b):
            srv.topics["synch.db"] = 1
            srv.partition_leaders[("synch.db", 0)] = 1  # B leads
        a.peers = [(1, "127.0.0.1", b.port)]
        b.peers = [(0, "127.0.0.1", a.port)]
        events = spark.createDataFrame(
            [("db", "t", "insert", None, '{"id": 1}', 1000, 0)],
            RAW_EVENT_WIRE_SCHEMA)
        assert produce_to_kafka_socket(
            events, f"127.0.0.1:{a.port}") == 1
        assert b.log_end.get(("synch.db", 0)) == 1  # landed on the leader
        assert ("synch.db", 0) not in a.log_end
    finally:
        a.stop(), b.stop()


# -- round-12: progress contract, compression, leader-routed consume ----------
def test_decode_ex_next_offset_advances_past_control():
    """decode_record_batches_ex returns the next fetch offset implied by
    every COMPLETE batch — control batches included, so a consume loop
    never stalls refetching a transaction marker (ADVICE r11)."""
    data = encode_record_batch([(b"k", b"v")], base_offset=0)
    ctl = _control_batch([(b"\x00\x00\x00\x01", b"\x00\x00")])
    ctl = struct_replace_base(ctl, 1)
    recs, nxt = decode_record_batches_ex(data + ctl)
    assert recs == [(0, b"k", b"v")] and nxt == 2
    # control-only buffer: no data, but the cursor still moves
    recs, nxt = decode_record_batches_ex(ctl)
    assert recs == [] and nxt == 2
    # empty buffer: nothing to go on
    assert decode_record_batches_ex(b"") == ([], None)


def struct_replace_base(batch: bytes, base: int) -> bytes:
    import struct

    return struct.pack(">q", base) + batch[8:]


def test_consume_no_stall_on_control_only_log(spark, broker):
    """ADVICE r11 (low): a topic fed by an EOS producer can present a
    control-batch-only window; the consume loop must advance its cursor
    past the markers, not refetch the same offset for max_rounds and
    return an unchanged cursor."""
    from synch_spark.broker import consume_from_kafka_socket

    with _client(broker) as c:
        c.create_topic("eos")
    broker.append_control("eos", 0)
    broker.append_control("eos", 0)
    df, nxt = consume_from_kafka_socket(
        spark, f"127.0.0.1:{broker.port}", "eos", max_rounds=5)
    assert df.count() == 0 and nxt == 2
    # data then trailing markers: data surfaces, cursor passes the tail
    with _client(broker) as c:
        c.produce("eos", 0, [(b"k", b"v")])
    broker.append_control("eos", 0)
    df, nxt = consume_from_kafka_socket(
        spark, f"127.0.0.1:{broker.port}", "eos", offset=2, max_rounds=5)
    assert [r["value"] for r in df.collect()] == ["v"] and nxt == 4


def test_consume_routes_to_partition_leader(spark):
    """VERDICT r11 #3: consume_from_kafka_socket resolves the partition
    leader via Metadata (the producer's pattern) instead of fetching on
    the first bootstrap host — which a multi-broker cluster answers
    with error 6 (NOT_LEADER)."""
    from synch_spark.broker import consume_from_kafka_socket

    a, b = FakeKafkaBroker(node_id=0), FakeKafkaBroker(node_id=1)
    a.start(), b.start()
    try:
        for srv in (a, b):
            srv.topics["led"] = 1
            srv.partition_leaders[("led", 0)] = 1   # B leads
        a.peers = [(1, "127.0.0.1", b.port)]
        b.peers = [(0, "127.0.0.1", a.port)]
        with KafkaSocketClient("127.0.0.1", b.port) as c:
            c.produce("led", 0, [(b"k", b"on-leader")])
        # bootstrap names only A; the fetch must land on B
        df, nxt = consume_from_kafka_socket(
            spark, f"127.0.0.1:{a.port}", "led")
        assert [r["value"] for r in df.collect()] == ["on-leader"]
        assert nxt == 1
        # bootstrap-only broker (single node) still works
        df2, nxt2 = consume_from_kafka_socket(
            spark, f"127.0.0.1:{b.port}", "led")
        assert nxt2 == 1 and df2.count() == 1
    finally:
        a.stop(), b.stop()


def test_distributed_read_trailing_control_batches(spark, broker):
    """ADVICE r11 (medium): a pinned [lo, hi) range whose tail is
    control batches used to break out early while the driver persisted
    hi as the committed cursor — the remainder silently skipped. The
    task now advances past the markers and completes the range."""
    from synch_spark.broker import read_kafka_socket_distributed

    with _client(broker) as c:
        c.create_topic("txr")
        c.produce("txr", 0, [(b"k", b"d0")])
    broker.append_control("txr", 0)
    broker.append_control("txr", 0)
    df, ends = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "txr")
    assert ends == {0: 3}
    assert [(r["offset"], r["value"]) for r in df.collect()] == [(0, "d0")]


def test_fetch_progress_escalates_max_bytes(broker):
    """A broker response truncated below one complete batch (oversized
    batch vs max_bytes) escalates max_bytes instead of treating the
    empty decode as end-of-log — the silent-skip path the r11 advice
    flagged."""
    with _client(broker) as c:
        c.create_topic("big")
        c.produce("big", 0, [(b"k", b"v" * 2000)])
        c.produce("big", 0, [(b"k", b"tail")])
        broker.strict_max_bytes = True
        broker.fetch_max_bytes.clear()
        hw, recs, nxt = c.fetch_progress("big", 0, 0, max_bytes=64)
        assert hw == 2 and nxt >= 1
        # the escalated budget surfaces the oversized batch (and possibly
        # the small trailer too, once the doubled budget fits both)
        assert [o for o, _k, _v in recs][0] == 0
        # the wire saw a doubling max_bytes ladder, not a single try
        assert len(broker.fetch_max_bytes) > 1
        assert broker.fetch_max_bytes[-1] > broker.fetch_max_bytes[0]
        # and the cap is a loud refusal, never a silent skip
        with pytest.raises(KafkaWireError, match="no complete"):
            c.fetch_progress("big", 0, 0, max_bytes=16, max_bytes_cap=32)


def test_compressed_batch_roundtrip_gzip(broker):
    """VERDICT r11 #2: gzip-compressed batches (stdlib zlib) decode
    event-for-event identical to their uncompressed twins, through the
    fake broker (whose CRC check covers the compressed bytes, exactly
    like a real broker's)."""
    recs = [(b"k%d" % i, b"payload-%d" % i) for i in range(50)]
    plain = decode_record_batches(encode_record_batch(recs))
    gz = encode_record_batch(recs, compression="gzip")
    assert len(gz) < len(encode_record_batch(recs))  # actually compressed
    assert decode_record_batches(gz) == plain

    with _client(broker) as c:
        c.create_topic("gz")
        c.produce("gz", 0, recs, compression="gzip")
        hw, got, _n = c.fetch("gz", 0, 0)
        assert hw == 50
        assert [(o, k, v) for o, k, v in got] == [
            (i, k, v) for i, (k, v) in enumerate(recs)]
    assert broker.produce_crc_checked >= 1


def test_compressed_batch_zstd_and_refusals():
    """zstd rides a lazy import (absent in this container -> loud,
    remediation-bearing refusal); snappy/lz4 are loud refusals naming
    the codec and the producer-side fix."""
    import struct

    try:
        import zstandard  # noqa: F401
        have_zstd = True
    except ImportError:
        have_zstd = False
    recs = [(b"k", b"v" * 100)]
    if have_zstd:
        z = encode_record_batch(recs, compression="zstd")
        assert decode_record_batches(z) == decode_record_batches(
            encode_record_batch(recs))
    else:
        with pytest.raises(KafkaWireError, match="zstandard"):
            encode_record_batch(recs, compression="zstd")
        # a zstd batch from elsewhere: decode refuses with remediation
        fake = bytearray(encode_record_batch(recs))
        attrs = struct.unpack_from(">h", fake, 21)[0] | 4
        struct.pack_into(">h", fake, 21, attrs)
        struct.pack_into(">I", fake, 17, crc32c(bytes(fake[21:])))
        with pytest.raises(KafkaWireError, match="compression.type"):
            decode_record_batches(bytes(fake))
    for codec, name in ((2, "snappy"), (3, "lz4")):
        bad = bytearray(encode_record_batch(recs))
        attrs = struct.unpack_from(">h", bad, 21)[0] | codec
        struct.pack_into(">h", bad, 21, attrs)
        struct.pack_into(">I", bad, 17, crc32c(bytes(bad[21:])))
        with pytest.raises(KafkaWireError, match=name):
            decode_record_batches(bytes(bad))
    with pytest.raises(ValueError, match="unsupported compression"):
        encode_record_batch(recs, compression="snappy")


def test_distributed_read_chunked_fetch_rounds(spark, broker):
    """VERDICT r11 #4: one large offset range drains as MULTIPLE fetch
    rounds, each yielded as its own Arrow batch — per-task memory is
    O(fetch chunk), not O(range). Observed on the wire: the single
    planned range issues several Fetch requests under a small
    fetch_max_bytes."""
    from synch_spark.broker import read_kafka_socket_distributed

    with _client(broker) as c:
        c.create_topic("bulkc")
        for i in range(10):
            c.produce("bulkc", 0, [(b"k", b"v%02d-" % i + b"x" * 400)])
    broker.fetch_max_bytes.clear()
    df, ends = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "bulkc",
        fetch_max_bytes=1024)
    rows = df.collect()
    assert ends == {0: 10} and len(rows) == 10
    assert sorted(r["offset"] for r in rows) == list(range(10))
    # ~500-byte batches against a 1 KiB fetch budget -> >= 4 wire rounds
    fetches = [b for b in broker.fetch_max_bytes if b == 1024]
    assert len(fetches) >= 4


def test_crc32c_vectorized_equivalence_and_speed():
    """VERDICT r11 #5: crc32c is numpy-vectorized (slicing-by-8 word
    remainders + log2 GF(2) shift-folds) above a small threshold, with
    the pure loop as the tail/fallback path. Equivalence across sizes
    spanning the threshold, word alignment, and fold-tree padding; the
    RFC 3720 pins stay in test_crc32c_known_answer_and_independence.
    Throughput: >= 3x the pure loop at 1 MB (measured ~16x here; the
    soft bound keeps the assert robust under CI contention)."""
    import os
    import random
    import time

    from synch_spark.sources.kafka_socket import _crc32c_pure

    rnd = random.Random(13)
    for size in (0, 1, 7, 8, 9, 255, 256, 257, 263, 264, 511, 513,
                 4096, 4101, 65536, 100001):
        blob = bytes(rnd.getrandbits(8) for _ in range(size))
        assert crc32c(blob) == _crc32c_pure(blob) ^ 0xFFFFFFFF, size
    blob = os.urandom(1 << 20)
    crc32c(blob)  # warm the fold tables outside the timed section
    t0 = time.perf_counter()
    fast = crc32c(blob)
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    slow = _crc32c_pure(blob) ^ 0xFFFFFFFF
    t_pure = time.perf_counter() - t0
    assert fast == slow
    assert t_pure / t_vec >= 3.0, (t_pure, t_vec)


def test_socket_consume_debezium_avro_via_registry(tmp_path, spark, broker):
    """VERDICT r11 #8: the socket transport consumes Confluent-framed
    Debezium-AVRO topics too — the distributed wire read returns BINARY
    values and the executor-side registry fetch decodes them (the exact
    plumbing the connector stream uses, q135-pinned). Previously a
    config rejection; the jar-less path now covers the full value
    format matrix."""
    import http.server
    import json as _json
    import threading
    from decimal import Decimal

    import yaml

    import synch_spark.sources.avro_codec as A
    from synch_spark.cli import main
    from synch_spark.sources.table import ParquetTable
    from tests.test_avro_codec import ENVELOPE

    hits = []

    class _Registry(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if self.path == "/schemas/ids/7":
                body = _json.dumps(
                    {"schema": _json.dumps(ENVELOPE)}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    reg = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Registry)
    threading.Thread(target=reg.serve_forever, daemon=True).start()
    parsed = A.parse_schema(ENVELOPE)

    def frame(op, image):
        env = {"before": image if op == "d" else None,
               "after": None if op == "d" else image,
               "source": {"db": "db", "table": "orders", "ts_ms": 1000},
               "op": op, "ts_ms": None}
        return A.confluent_frame(7, A.avro_encode(env, parsed))

    rows = [frame("c", {"id": i, "price": Decimal("9.99"),
                        "status": "O"}) for i in (1, 2, 3)]
    rows.append(frame("d", {"id": 2, "price": Decimal("9.99"),
                            "status": "O"}))
    with _client(broker) as c:
        c.create_topic("dbz.db.orders")
        c.produce("dbz.db.orders", 0, [(None, f) for f in rows])

    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "orders", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sources": {},
            "value_schemas": {"db.orders": {"type": "struct", "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "price", "type": "decimal(15,2)",
                 "nullable": True, "metadata": {}},
                {"name": "status", "type": "string", "nullable": True,
                 "metadata": {}}]}},
            "kafka": {
                "bootstrap_servers": f"127.0.0.1:{broker.port}",
                "transport": "socket", "topic": "dbz.db.orders",
                "value_format": "debezium-avro",
                "avro_schema_registry":
                    f"http://127.0.0.1:{reg.server_port}"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    try:
        assert main(["--config", str(p), "consume",
                     "--available-now"]) == 0
        got = {(r["id"], str(r["price"]), r["status"])
               for r in ParquetTable(
                   spark, str(tmp_path / "wh/db/orders")).read().collect()}
        # 3 inserts, 1 delete -> ids 1 and 3 survive, typed decode exact
        assert got == {(1, "9.99", "O"), (3, "9.99", "O")}
        assert any(h == "/schemas/ids/7" for h in hits)
        cur = _json.loads(
            (tmp_path / "wh" / "_kafka_socket_offsets.json").read_text())
        assert cur == {"dbz.db.orders/0": 4}
        # missing config stays a loud rejection
        bad = dict(cfg)
        bad["spark"] = dict(cfg["spark"])
        bad["spark"]["kafka"] = {
            k: v for k, v in cfg["spark"]["kafka"].items()
            if k != "avro_schema_registry"}
        p.write_text(yaml.dump(bad))
        with pytest.raises(SystemExit, match="avro_schema"):
            main(["--config", str(p), "consume", "--available-now"])
    finally:
        reg.shutdown()


@pytest.mark.slow
def test_socket_consume_survives_broker_restart(tmp_path, capsys, spark):
    """VERDICT r11 #7: the socket consume loop is supervised like the
    binlog/walsender tails — a dead/restarting broker costs backoff
    retries, not a consumer crash. The drain starts with the broker
    DOWN, backs off loudly, and completes from the durable offsets doc
    once a broker holding the retained log comes back (resume cursor
    pre-seeded at 5: only events 5.. apply)."""
    import json as _json
    import threading
    import time
    import yaml

    from synch_spark.broker import produce_to_kafka_socket
    from synch_spark.cli import main
    from synch_spark.events import RAW_EVENT_WIRE_SCHEMA
    from synch_spark.sources.table import ParquetTable

    a = FakeKafkaBroker()
    a.start()
    a.topics["synch.db"] = 1
    events = spark.createDataFrame(
        [("db", "t", "insert", None,
          _json.dumps({"k": i, "v": float(i)}), 1000 + i, i)
         for i in range(25)], RAW_EVENT_WIRE_SCHEMA)
    assert produce_to_kafka_socket(
        events, f"127.0.0.1:{a.port}") == 25
    port = a.port
    a.stop()
    time.sleep(0.3)

    wh = tmp_path / "wh"
    wh.mkdir()
    (wh / "_kafka_socket_offsets.json").write_text(
        _json.dumps({"synch.db/0": 5}))
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["k"]}]}]}],
        "spark": {
            "warehouse": str(wh),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sources": {},
            "value_schemas": {"db.t": {"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {}}]}},
            "kafka": {"bootstrap_servers": f"127.0.0.1:{port}",
                      "transport": "socket", "topic": "synch.db",
                      "reconnect_base_s": 0.2, "reconnect_max_s": 1.0,
                      "reconnect_max_tries": 100},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))

    revived = []

    def revive():
        time.sleep(1.2)
        b = FakeKafkaBroker(port=port)
        # the restarted broker retained its log (real logs are on disk)
        b.topics.update(a.topics)
        b.logs.update(a.logs)
        b.log_end.update(a.log_end)
        b.log_start.update(a.log_start)
        b.start()
        revived.append(b)

    threading.Thread(target=revive, daemon=True).start()
    try:
        assert main(["--config", str(p), "consume",
                     "--available-now"]) == 0
    finally:
        if revived:
            revived[0].stop()
    # backoff was LOUD, and the drain resumed from the cursor
    assert "transient failure" in capsys.readouterr().err
    rows = sorted(r["k"] for r in ParquetTable(
        spark, str(wh / "db" / "t")).read().collect())
    assert rows == list(range(5, 25))
    cur = _json.loads((wh / "_kafka_socket_offsets.json").read_text())
    assert cur == {"synch.db/0": 25}


def test_cli_produce_socket_compression_gzip(tmp_path, spark, broker):
    """spark.kafka.compression: gzip — the socket producer writes
    gzip-compressed record batches (verified from the stored wire
    bytes) and the consume loop decodes them event-for-event."""
    import json as _json
    import struct

    import yaml

    from synch_spark.cli import main
    from synch_spark.sources.table import ParquetTable

    src_path = str(tmp_path / "src.parquet")
    from synch_spark.session import read_table

    read_table(spark, "/root/testdata/sf0.001", "region") \
        .write.parquet(src_path)
    bs = f"127.0.0.1:{broker.port}"
    broker.topics["synch.db"] = 1
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "region", "pk": ["r_regionkey"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "source_format": "parquet",
            "sources": {"db.region": src_path},
            "value_schemas": {
                "db.region": spark.read.parquet(src_path).schema.jsonValue()},
            "kafka": {"bootstrap_servers": bs, "transport": "socket",
                      "topic": "synch.db", "compression": "gzip"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "produce", "--once",
                 "--sink", "kafka"]) == 0
    # the stored wire batch really is gzip (attr codec bits == 1) and
    # passed the broker's independent CRC over the compressed bytes
    stored = broker.logs[("synch.db", 0)][0]
    assert struct.unpack_from(">h", stored, 21)[0] & 0x07 == 1
    assert broker.produce_crc_checked == 1
    # and the consume loop decodes it transparently
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    t = ParquetTable(spark, str(tmp_path / "wh" / "db" / "region"))
    assert t.read().count() == 5
    cur = _json.loads(
        (tmp_path / "wh" / "_kafka_socket_offsets.json").read_text())
    assert cur == {"synch.db/0": 5}


def test_decode_ex_property_mixed_batches():
    """Hypothesis over random mixes of data / control / gzip batches:
    decode_record_batches_ex returns exactly the data records, and
    next_off always equals the end of the LAST complete batch —
    control and compressed alike (the progress contract every consume
    loop now builds on). Truncation can only lose whole trailing
    batches, shrinking next_off consistently with the records kept."""
    import struct as _s

    from hypothesis import given, settings
    from hypothesis import strategies as st

    blob = st.one_of(st.none(), st.binary(max_size=16))
    rec = st.tuples(blob, blob)
    batch = st.tuples(
        st.lists(rec, min_size=1, max_size=5),
        st.sampled_from(["data", "control", "gzip"]))

    def mk(recs, kind, base):
        if kind == "gzip":
            return encode_record_batch(recs, base_offset=base,
                                       compression="gzip")
        b = bytearray(encode_record_batch(recs, base_offset=base))
        if kind == "control":
            attrs = _s.unpack_from(">h", b, 21)[0] | 0x20
            _s.pack_into(">h", b, 21, attrs)
            _s.pack_into(">I", b, 17, crc32c(bytes(b[21:])))
        return bytes(b)

    @settings(max_examples=60, deadline=None)
    @given(batches=st.lists(batch, min_size=1, max_size=5),
           base=st.integers(min_value=0, max_value=1 << 40),
           data=st.data())
    def prop(batches, base, data):
        wire = b""
        want = []
        off = base
        ends = []
        for recs, kind in batches:
            wire += mk(recs, kind, off)
            if kind != "control":
                want += [(off + i, k, v)
                         for i, (k, v) in enumerate(recs)]
            off += len(recs)
            ends.append(off)
        got, nxt = decode_record_batches_ex(wire)
        assert got == want and nxt == max(ends)
        cut = data.draw(st.integers(min_value=0, max_value=len(wire)))
        try:
            got2, nxt2 = decode_record_batches_ex(wire[:cut])
        except KafkaWireError:
            return  # torn batch that passed the length gate fails CRC
        assert got2 == want[:len(got2)]
        assert nxt2 is None or nxt2 in ends

    prop()


def test_crc32c_rfc3720_full_vector_table():
    """The complete RFC 3720 B.4 known-answer table (not just the
    '123456789' classic) — pins BOTH the pure loop and the vectorized
    path (the 32-byte vectors exercise the word path once the
    threshold is lowered by composing them into larger buffers)."""
    from synch_spark.sources.kafka_socket import _crc32c_pure

    vectors = [
        (b"\x00" * 32, 0x8A9136AA),
        (b"\xff" * 32, 0x62A8AB43),
        (bytes(range(32)), 0x46DD794E),
        (bytes(range(31, -1, -1)), 0x113FDB5C),
    ]
    for blob, want in vectors:
        assert crc32c(blob) == want, blob.hex()
        assert _crc32c_pure(blob) ^ 0xFFFFFFFF == want
        # composed form drives the numpy path over the same content
        big = blob * 64
        assert crc32c(big) == _crc32c_pure(big) ^ 0xFFFFFFFF


# -- read_committed isolation (KIP-98 consumer side) --------------------------
def test_read_committed_filters_aborted_transactions(broker):
    """A rolled-back EOS transaction's records must NOT surface as
    data under read_committed — they are phantom rows no upstream
    commit ever produced. Interleaved producers: P1 aborts, P2
    commits; read_committed returns only P2's records (plus plain
    batches), read_uncommitted (the default, kafka-python parity)
    returns everything."""
    with _client(broker) as c:
        c.create_topic("tx")
        c.produce("tx", 0, [(b"k", b"plain-0")])          # offset 0
    broker.append_txn_batch("tx", 0, [(b"k", b"p1-a")], producer_id=7)
    broker.append_txn_batch("tx", 0, [(b"k", b"p2-a")], producer_id=9)
    broker.append_txn_batch("tx", 0, [(b"k", b"p1-b")], producer_id=7)
    broker.append_txn_marker("tx", 0, 7, commit=False)    # P1 ABORTS
    broker.append_txn_marker("tx", 0, 9, commit=True)     # P2 commits
    with _client(broker) as c:
        c.produce("tx", 0, [(b"k", b"plain-1")])          # offset 6

    with _client(broker) as c:
        hw, recs, nxt = c.fetch_progress("tx", 0, 0,
                                         isolation="read_committed")
        assert hw == 7 and nxt == 7
        assert [v for _o, _k, v in recs] == [b"plain-0", b"p2-a",
                                             b"plain-1"]
        # default isolation still surfaces the aborted rows
        _hw, all_recs, _n = c.fetch_progress("tx", 0, 0)
        assert [v for _o, _k, v in all_recs] == [
            b"plain-0", b"p1-a", b"p2-a", b"p1-b", b"plain-1"]


def test_read_committed_second_txn_of_aborting_producer_survives(broker):
    """The aborted window CLOSES at the abort marker: the same
    producer's NEXT (committed) transaction must survive — the reason
    brokers only report aborted txns overlapping the fetched range."""
    with _client(broker) as c:
        c.create_topic("tx2")
    broker.append_txn_batch("tx2", 0, [(b"k", b"dead")], producer_id=5)
    broker.append_txn_marker("tx2", 0, 5, commit=False)
    broker.append_txn_batch("tx2", 0, [(b"k", b"alive")], producer_id=5)
    broker.append_txn_marker("tx2", 0, 5, commit=True)
    with _client(broker) as c:
        _hw, recs, nxt = c.fetch_progress("tx2", 0, 0,
                                          isolation="read_committed")
        assert [v for _o, _k, v in recs] == [b"alive"] and nxt == 4
        # and fetching from PAST the aborted txn works standalone
        _hw, tail, _n = c.fetch_progress("tx2", 0, 2,
                                         isolation="read_committed")
        assert [v for _o, _k, v in tail] == [b"alive"]


def test_read_committed_stops_at_lso_without_spinning(broker):
    """An OPEN transaction holds the last stable offset down: a
    read_committed consume sees only decided data, exits cleanly at
    the LSO (no escalation spin, no phantom reads), and picks up the
    rest once the transaction ends."""
    with _client(broker) as c:
        c.create_topic("open")
        c.produce("open", 0, [(b"k", b"ok-0")])
    broker.append_txn_batch("open", 0, [(b"k", b"undecided")],
                            producer_id=3)
    with _client(broker) as c:
        hw, recs, nxt = c.fetch_progress("open", 0, 0,
                                         isolation="read_committed")
        assert hw == 1                       # LSO, not the real hw (2)
        assert [v for _o, _k, v in recs] == [b"ok-0"] and nxt == 1
        # cursor parked at the LSO: the next poll is a clean no-op
        hw2, recs2, nxt2 = c.fetch_progress("open", 0, 1,
                                            isolation="read_committed")
        assert hw2 == 1 and recs2 == [] and nxt2 == 1
    broker.append_txn_marker("open", 0, 3, commit=True)
    with _client(broker) as c:
        hw3, recs3, nxt3 = c.fetch_progress("open", 0, 1,
                                            isolation="read_committed")
        assert hw3 == 3 and [v for _o, _k, v in recs3] == [b"undecided"]
        assert nxt3 == 3


def test_distributed_read_read_committed_clamps_to_lso(spark, broker):
    """The distributed wire read under read_committed: the plan clamps
    pinned ends to the LSO (a range pinned past it would stall every
    task on undecided data), aborted records never reach the frame,
    and the committed cursor resumes cleanly after the txn decides."""
    from synch_spark.broker import read_kafka_socket_distributed

    with _client(broker) as c:
        c.create_topic("dtx")
        c.produce("dtx", 0, [(b"k", b"d0")])
    broker.append_txn_batch("dtx", 0, [(b"k", b"rolled-back")],
                            producer_id=11)
    broker.append_txn_marker("dtx", 0, 11, commit=False)
    with _client(broker) as c:
        c.produce("dtx", 0, [(b"k", b"d3")])
    broker.append_txn_batch("dtx", 0, [(b"k", b"pending")],
                            producer_id=12)

    df, ends = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "dtx",
        isolation="read_committed")
    assert ends == {0: 4}                    # LSO: open txn at 4 excluded
    assert [(r["offset"], r["value"]) for r in
            df.orderBy("offset").collect()] == [(0, "d0"), (3, "d3")]

    broker.append_txn_marker("dtx", 0, 12, commit=True)
    df2, ends2 = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "dtx", start_offsets=ends,
        isolation="read_committed")
    assert ends2 == {0: 6}
    assert [(r["offset"], r["value"]) for r in df2.collect()] == \
        [(4, "pending")]


def test_cli_consume_isolation_read_committed(tmp_path, spark, broker):
    """spark.kafka.isolation: read_committed end-to-end: the applied
    table contains no phantom rows from the aborted transaction, and
    the cursor still covers the full log (markers included)."""
    import json as _json

    import yaml

    from synch_spark.cli import main
    from synch_spark.sources.table import ParquetTable

    bs = f"127.0.0.1:{broker.port}"
    broker.topics["synch.db"] = 1

    def ev(k):
        return (None, _json.dumps(
            {"schema": "db", "table": "t", "action": "insert",
             "before": None, "after": _json.dumps({"k": k}),
             "event_unixtime": 1000 + k}).encode())

    with _client(broker) as c:
        c.produce("synch.db", 0, [ev(0)])
    broker.append_txn_batch("synch.db", 0, [ev(666)], producer_id=4)
    broker.append_txn_marker("synch.db", 0, 4, commit=False)
    with _client(broker) as c:
        c.produce("synch.db", 0, [ev(1)])

    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["k"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sources": {},
            "value_schemas": {"db.t": {"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}}]}},
            "kafka": {"bootstrap_servers": bs, "transport": "socket",
                      "topic": "synch.db",
                      "isolation": "read_committed"},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "consume", "--available-now"]) == 0
    rows = sorted(r["k"] for r in ParquetTable(
        spark, str(tmp_path / "wh/db/t")).read().collect())
    assert rows == [0, 1]                     # 666 never applied
    cur = _json.loads(
        (tmp_path / "wh" / "_kafka_socket_offsets.json").read_text())
    assert cur == {"synch.db/0": 4}
    # a bad isolation value is a config error, not a retry loop
    cfg["spark"]["kafka"]["isolation"] = "exactly_once"
    p.write_text(yaml.dump(cfg))
    with pytest.raises(SystemExit, match="isolation"):
        main(["--config", str(p), "consume", "--available-now"])


def test_plan_time_offset_discovery_is_batched(spark, broker):
    """Plan-time offset discovery costs O(leaders) wire round trips,
    not O(partitions): one ListOffsets request covers every partition
    of a leader (earliest), one more the latests, one batched probe
    fetch the LSOs — a 10k-partition topic must not pay 20-30k RTTs
    before the first task launches."""
    from synch_spark.broker import read_kafka_socket_distributed

    with _client(broker) as c:
        c.create_topic("wide", num_partitions=6)
        for p in range(6):
            c.produce("wide", p, [(b"k", b"v%d" % p)])
    broker.api_requests.clear()
    df, ends = read_kafka_socket_distributed(
        spark, f"127.0.0.1:{broker.port}", "wide",
        isolation="read_committed")
    assert ends == {p: 1 for p in range(6)}
    assert df.count() == 6
    # driver-side planning: 1 metadata + 1 earliest + 1 latest +
    # 1 LSO probe = 2 ListOffsets and at most 1 plan-time Fetch beyond
    # the 6 executor-task fetches
    lo_reqs = [a for a, _v in broker.api_requests if a == 2]
    assert len(lo_reqs) == 2
    fetches = [a for a, _v in broker.api_requests if a == 1]
    assert len(fetches) <= 1 + 6
