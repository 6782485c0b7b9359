"""Redis Streams broker adapter (B1/B2 variant) — the reference's
out-of-box default broker, re-expressed against this engine's event
frames.

Contract parity with /root/reference/synch/broker/redis.py:15-62:

- stream key  ``{prefix}:{alias}:{schema}`` (one stream per source
  schema), XADD with a single ``msg`` field holding the event JSON,
  capped with MAXLEN (approximate trim);
- consume = XREAD from the last committed id; the committed offset
  lives in hash ``{prefix}:{alias}:last_msg_id`` field ``schema``
  (commit = HSET) — at-least-once delivery, replays converge through
  the idempotent merge exactly like the Kafka/file paths;
- payload JSON is RAW_EVENT_SCHEMA-shaped (same columns the Kafka
  payload and file spool carry), so everything downstream of decode is
  shared.

Scale note: Redis Streams is a single-node fan-in — the reference used
it as the zero-dependency default, and this adapter keeps that role
(dev/small deployments, driver-side produce like the reference's own
single-threaded loop). The 100 TB path is Kafka (distributed
``format("kafka")`` produce/consume); both sides share the payload
contract, so switching brokers is a config change.

The ``redis`` package is import-guarded: any object exposing
xadd/xread/hget/hset works (tests inject an in-memory fake; production
passes ``redis.Redis.from_url(...)``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from synch_spark.broker import EVENT_COLUMNS, WIRE_SEQ_COL


def redis_client(url: str):
    """Real client factory, import-guarded with an actionable error."""
    try:
        import redis  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "the redis broker needs the redis package (pip install redis); "
            "use the kafka or file-spool broker otherwise"
        ) from e
    return redis.Redis.from_url(url)


def redis_sentinel_clients(
    sentinel_hosts, sentinel_master: str, password: str | None = None,
    sentinel_factory=None,
):
    """(master, replica) client pair resolved through Redis Sentinel —
    the reference's HA topology (/root/reference/synch/redis_mixin.py:
    15-45: master_for for writes, slave_for for reads). ``sentinel_hosts``
    is a list of ``host:port`` strings (or (host, port) pairs).
    ``sentinel_factory`` injects a fake Sentinel class for contract
    tests; production resolves redis.sentinel.Sentinel."""
    if sentinel_factory is None:
        try:
            from redis.sentinel import Sentinel as sentinel_factory  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "redis sentinel support needs the redis package "
                "(pip install redis)"
            ) from e
    def _pair(h):
        if isinstance(h, (tuple, list)):
            return (h[0], int(h[1]))
        host, _, port = h.rpartition(":")
        if not host:  # bare hostname: the standard sentinel port
            return (port, 26379)
        return (host, int(port))

    pairs = [_pair(h) for h in sentinel_hosts]
    sent = sentinel_factory(sentinels=pairs)
    kwargs = {"service_name": sentinel_master}
    if password is not None:
        kwargs["password"] = password
    return sent.master_for(**kwargs), sent.slave_for(**kwargs)


class RedisStreamBroker:
    def __init__(self, client, prefix: str = "synch", alias: str = "default",
                 queue_max_len: int = 200_000, read_client=None):
        """``client`` serves writes (XADD produce, HSET commit).
        ``read_client`` — when given, XREAD/HGET go there instead: the
        Sentinel replica-ok split the reference runs (redis_mixin.py
        master/slave; pass the pair from redis_sentinel_clients). A
        stale replica offset only re-reads already-applied events,
        which the idempotent merge converges — the same at-least-once
        contract as every other source here (and as the reference,
        which also reads its positions from the slave)."""
        self.client = client
        self.read_client = read_client if read_client is not None else client
        self.prefix = prefix
        self.alias = alias
        self.queue_max_len = queue_max_len

    # -- keys (reference redis.py:16,52) ----------------------------------
    def _queue(self, schema: str) -> str:
        return f"{self.prefix}:{self.alias}:{schema}"

    def _offset_key(self) -> str:
        return f"{self.prefix}:{self.alias}:last_msg_id"

    # -- produce (B1) ------------------------------------------------------
    def send(self, schema: str, msg: dict) -> None:
        self.client.xadd(
            self._queue(schema), {"msg": json.dumps(msg)},
            maxlen=self.queue_max_len,
        )

    def produce(self, events: DataFrame) -> int:
        """XADD every event of a frame, keyed by its own schema column.
        Driver-side iteration on purpose — matching the reference's
        single-threaded produce loop; Redis Streams has no partitioned
        produce to distribute over (see module docstring)."""
        n = 0
        cols = EVENT_COLUMNS + ([WIRE_SEQ_COL]
                                if WIRE_SEQ_COL in events.columns else [])
        for row in events.select(*cols).toLocalIterator():
            d = row.asDict()
            self.send(d["schema"], d)
            n += 1
        return n

    # -- consume (B2) ------------------------------------------------------
    def last_committed(self, schema: str) -> str:
        raw = self.read_client.hget(self._offset_key(), schema)
        if raw is None:
            return "0"
        return raw.decode() if isinstance(raw, (bytes, bytearray)) else str(raw)

    def read(self, schema: str, count: int | None = None,
             block_ms: int | None = None) -> list[tuple[str, dict]]:
        """[(msg_id, event dict)] after the last committed offset.
        Does NOT advance the committed offset — call commit(schema,
        last_id) once the batch is durably applied (the checkpoint-
        then-advance order every other source here uses)."""
        res = self.read_client.xread(
            {self._queue(schema): self.last_committed(schema)},
            count=count, block=block_ms,
        )
        out: list[tuple[str, dict]] = []
        if not res:
            return out
        for _key, entries in res:
            for msg_id, fields in entries:
                mid = (msg_id.decode()
                       if isinstance(msg_id, (bytes, bytearray)) else str(msg_id))
                payload = fields.get(b"msg", fields.get("msg"))
                if isinstance(payload, (bytes, bytearray)):
                    payload = payload.decode()
                out.append((mid, json.loads(payload)))
        return out

    def commit(self, schema: str, msg_id: str) -> None:
        self.client.hset(self._offset_key(), schema, msg_id)

    def read_raw_frame(self, spark: SparkSession, schema: str,
                       count: int | None = None):
        """One consume step as a RAW_EVENT_SCHEMA DataFrame plus the
        high-water msg id to commit after apply — plugs straight into
        the shared decode/split/merge pipeline."""
        from synch_spark.events import RAW_EVENT_WIRE_SCHEMA

        msgs = self.read(schema, count=count)
        if not msgs:
            return spark.createDataFrame([], RAW_EVENT_WIRE_SCHEMA), None
        names = [f.name for f in RAW_EVENT_WIRE_SCHEMA.fields]
        rows = [tuple(m.get(c) for c in names) for _id, m in msgs]
        return spark.createDataFrame(rows, RAW_EVENT_WIRE_SCHEMA), msgs[-1][0]
