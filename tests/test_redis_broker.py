"""Redis Streams broker adapter: contract tests against an in-memory
fake client (no server in this container) pinning the reference's
XADD/XREAD/offset-hash semantics (synch/broker/redis.py:15-62)."""

from __future__ import annotations

import pytest

from synch_spark.redis_broker import RedisStreamBroker


class FakeRedis:
    """Minimal XADD/XREAD/HSET/HGET with real-redis-shaped replies:
    bytes keys/values, '<ms>-<seq>' ids, approximate MAXLEN trim."""

    def __init__(self):
        self.streams: dict[str, list[tuple[str, dict]]] = {}
        self.hashes: dict[str, dict[str, str]] = {}
        self._seq = 0

    def xadd(self, key, fields, maxlen=None):
        self._seq += 1
        msg_id = f"{1000 + self._seq}-0"
        entries = self.streams.setdefault(key, [])
        entries.append((msg_id, {b"msg": str(fields["msg"]).encode()}))
        if maxlen is not None and len(entries) > maxlen:
            del entries[: len(entries) - maxlen]
        return msg_id.encode()

    @staticmethod
    def _after(entry_id, last):
        def parse(s):
            ms, _, seq = s.partition("-")
            return (int(ms), int(seq or 0))

        return parse(entry_id) > parse(last if "-" in last else f"{last}-0")

    def xread(self, streams, count=None, block=None):
        out = []
        for key, last in streams.items():
            hits = [e for e in self.streams.get(key, ())
                    if self._after(e[0], str(last))]
            if count is not None:
                hits = hits[:count]
            if hits:
                out.append((key.encode(), [(i.encode(), f) for i, f in hits]))
        return out

    def hset(self, key, field, value):
        self.hashes.setdefault(key, {})[field] = str(value)

    def hget(self, key, field):
        v = self.hashes.get(key, {}).get(field)
        return None if v is None else v.encode()


def _broker():
    return RedisStreamBroker(FakeRedis(), prefix="synch", alias="a1")


def test_stream_and_offset_key_shapes():
    b = _broker()
    assert b._queue("db") == "synch:a1:db"
    assert b._offset_key() == "synch:a1:last_msg_id"


def test_send_read_commit_resume_cycle():
    b = _broker()
    events = [
        {"schema": "db", "table": "t", "action": "insert", "before": None,
         "after": '{"id": %d}' % i, "event_unixtime": 1000 + i}
        for i in range(5)
    ]
    for e in events:
        b.send("db", e)
    got = b.read("db")
    assert [m["after"] for _id, m in got] == [e["after"] for e in events]
    # uncommitted: a re-read REPLAYS everything (at-least-once)
    assert len(b.read("db")) == 5
    # commit high-water, then only later messages arrive
    b.commit("db", got[2][0])
    tail = b.read("db")
    assert [m["event_unixtime"] for _id, m in tail] == [1003, 1004]
    b.commit("db", got[-1][0])
    assert b.read("db") == []
    # a new broker instance (fresh process) resumes from the hash
    b2 = RedisStreamBroker(b.client, prefix="synch", alias="a1")
    assert b2.read("db") == []
    b.send("db", events[0])
    assert len(b2.read("db")) == 1


def test_streams_are_per_schema():
    b = _broker()
    b.send("db1", {"schema": "db1", "table": "t", "action": "insert",
                   "before": None, "after": "{}", "event_unixtime": 1})
    b.send("db2", {"schema": "db2", "table": "t", "action": "delete",
                   "before": "{}", "after": None, "event_unixtime": 2})
    assert len(b.read("db1")) == 1 and len(b.read("db2")) == 1
    assert b.read("db1")[0][1]["action"] == "insert"
    assert b.read("db2")[0][1]["action"] == "delete"


def test_maxlen_caps_queue():
    b = RedisStreamBroker(FakeRedis(), queue_max_len=3)
    for i in range(10):
        b.send("db", {"schema": "db", "table": "t", "action": "insert",
                      "before": None, "after": str(i), "event_unixtime": i})
    got = b.read("db")
    assert [m["after"] for _id, m in got] == ["7", "8", "9"]


def test_produce_and_raw_frame_roundtrip(spark):
    from synch_spark.events import (
        RAW_EVENT_SCHEMA,
        RAW_EVENT_WIRE_SCHEMA,
        parse_values,
        split_updates,
    )
    from pyspark.sql import types as T

    b = _broker()
    raw = spark.createDataFrame(
        [("db", "t", "update", '{"id": 1, "v": "a"}', '{"id": 1, "v": "b"}', 5),
         ("db", "t", "insert", None, '{"id": 2, "v": "c"}', 6)],
        RAW_EVENT_SCHEMA,
    )
    assert b.produce(raw) == 2
    frame, high = b.read_raw_frame(spark, "db")
    # consume parses the WIRE schema (optional _wire_seq, null when the
    # producer had none) so wire order survives the broker hop
    assert high is not None and frame.schema == RAW_EVENT_WIRE_SCHEMA
    assert frame.filter(frame._wire_seq.isNotNull()).count() == 0
    vschema = T.StructType([T.StructField("id", T.LongType()),
                            T.StructField("v", T.StringType())])
    # modulo the optional (all-null here) wire-seq column, the broker
    # hop is transparent to the pipeline
    rows = sorted(map(tuple, parse_values(
        split_updates(frame.drop("_wire_seq")), vschema).collect()))
    native = sorted(map(tuple, parse_values(split_updates(raw), vschema).collect()))
    assert rows == native
    b.commit("db", high)
    empty, none_id = b.read_raw_frame(spark, "db")
    assert empty.count() == 0 and none_id is None


def test_real_client_import_guard():
    from synch_spark.redis_broker import redis_client

    try:
        import redis  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="redis"):
            redis_client("redis://localhost:6379/0")
    else:
        pytest.skip("redis package present; guard path not reachable")


class FakeSentinel:
    """redis.sentinel.Sentinel-shaped resolver: records the sentinel
    host list and hands out distinct master/replica handles over one
    shared FakeRedis store (a replica sees the master's writes, as a
    synced Redis replica would)."""

    last_instance = None

    def __init__(self, sentinels):
        self.sentinels = list(sentinels)
        self.store = FakeRedis()
        self.calls: list[tuple[str, dict]] = []
        FakeSentinel.last_instance = self

    def _handle(self, role, **kwargs):
        self.calls.append((role, kwargs))
        store = self.store

        class Handle:
            def __init__(self, writable):
                self.writable = writable

            def xadd(self, *a, **kw):
                assert self.writable, "XADD must go to the master"
                return store.xadd(*a, **kw)

            def hset(self, *a, **kw):
                assert self.writable, "HSET commit must go to the master"
                return store.hset(*a, **kw)

            def xread(self, *a, **kw):
                return store.xread(*a, **kw)

            def hget(self, *a, **kw):
                return store.hget(*a, **kw)

        return Handle(role == "master")

    def master_for(self, service_name, **kwargs):
        return self._handle("master", service_name=service_name, **kwargs)

    def slave_for(self, service_name, **kwargs):
        return self._handle("slave", service_name=service_name, **kwargs)


def test_sentinel_master_replica_split():
    """The reference's HA topology (redis_mixin.py:15-45): sentinel
    hosts resolve to a master (XADD/HSET) and a replica (XREAD/HGET);
    the full produce -> read -> commit -> resume cycle works across the
    split pair, and the service/password kwargs reach both resolves."""
    from synch_spark.redis_broker import RedisStreamBroker, redis_sentinel_clients

    master, replica = redis_sentinel_clients(
        ["s1:26379", "s2:26380"], "mymaster", password="pw",
        sentinel_factory=FakeSentinel,
    )
    sent = FakeSentinel.last_instance
    assert sent.sentinels == [("s1", 26379), ("s2", 26380)]
    assert [c[0] for c in sent.calls] == ["master", "slave"]
    for _, kw in sent.calls:
        assert kw == {"service_name": "mymaster", "password": "pw"}

    b = RedisStreamBroker(master, prefix="synch", alias="ha",
                          read_client=replica)
    ev = {"schema": "db", "table": "t", "action": "insert", "before": None,
          "after": '{"id": 1}', "event_unixtime": 1}
    b.send("db", ev)
    b.send("db", dict(ev, after='{"id": 2}'))
    got = b.read("db")
    assert [m["after"] for _i, m in got] == ['{"id": 1}', '{"id": 2}']
    b.commit("db", got[0][0])  # commit only the first
    assert [m["after"] for _i, m in b.read("db")] == ['{"id": 2}']


def test_sentinel_clients_parse_tuple_hosts():
    from synch_spark.redis_broker import redis_sentinel_clients

    redis_sentinel_clients([("h", 26379)], "m", sentinel_factory=FakeSentinel)
    assert FakeSentinel.last_instance.sentinels == [("h", 26379)]

def test_sentinel_hosts_accept_bare_hostnames():
    """A sentinel_hosts entry without ':port' gets the standard sentinel
    default 26379 instead of an IndexError."""
    from synch_spark.redis_broker import redis_sentinel_clients

    seen = {}

    class FakeSentinel:
        def __init__(self, sentinels):
            seen["pairs"] = sentinels

        def master_for(self, service_name, **kw):
            return "m"

        def slave_for(self, service_name, **kw):
            return "s"

    m, s = redis_sentinel_clients(
        ["sentinel1", "sentinel2:5000", ("sentinel3", 7000)], "mymaster",
        sentinel_factory=FakeSentinel)
    assert seen["pairs"] == [("sentinel1", 26379), ("sentinel2", 5000),
                             ("sentinel3", 7000)]
    assert (m, s) == ("m", "s")
