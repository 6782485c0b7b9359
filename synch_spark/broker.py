"""Broker boundary: producers that move change events out of the engine.

Parity targets (B1/B3): the reference's Kafka broker produces each
event to topic ``{queue_prefix}.{schema}`` keyed by the schema name
(/root/reference/synch/broker/kafka.py:21-33), and its Redis broker
LPUSHes the same payload (/root/reference/synch/broker/redis.py:15-23).
Here both sides are Spark jobs:

- ``kafka_writer`` configures a distributed ``format("kafka")`` batch
  write of an event frame — every executor produces its partition of
  events directly to the brokers; the driver never materializes a row.
  The builder is separated from ``.save()`` so environments without the
  spark-sql-kafka connector jar (this container) can still contract-test
  the exact options/columns, and ``cli produce --sink kafka`` fails with
  an actionable message instead of a stack.
- ``write_event_spool`` is the file form the test/e2e consumer reads:
  a distributed partitioned JSON write into a ``_``-prefixed staging dir
  (invisible to Spark file listings), then O(#files) driver renames into
  the consumer's events_dir. Replaces the round-1 ``toPandas()`` spool,
  which streamed the entire first-round snapshot through driver memory.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from synch_spark.events import WIRE_SEQ_COL

#: columns every producer payload carries (events.RAW_EVENT_SCHEMA order);
#: the optional events.WIRE_SEQ_COL rides along when the frame has it, so
#: wire order survives the broker hop (the consumer parses with
#: RAW_EVENT_WIRE_SCHEMA — payloads without the field read null)
EVENT_COLUMNS = ["schema", "table", "action", "before", "after", "event_unixtime"]


def kafka_payload(events: DataFrame, queue_prefix: str = "synch") -> DataFrame:
    """The (key, value, topic) frame a Kafka batch write produces.

    Topic/key parity with the reference broker: one topic per source
    schema (``{queue_prefix}.{schema}``), messages keyed by the schema
    name so a consumer group partitions by source database. ``value`` is
    the full event JSON — exactly what RAW_EVENT_SCHEMA parses back.
    Split out from the writer so the mapping is testable without the
    connector jar.
    """
    cols = EVENT_COLUMNS + ([WIRE_SEQ_COL] if WIRE_SEQ_COL in events.columns
                            else [])
    return events.select(
        F.col("schema").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
        F.concat(F.lit(queue_prefix + "."), F.col("schema")).alias("topic"),
    )


def kafka_avro_payload(
    events: DataFrame,
    value_schemas: dict,
    schema_ids: dict,
    queue_prefix: str = "synch",
) -> DataFrame:
    """RAW_EVENT_SCHEMA events -> Confluent-framed **Debezium-Avro**
    Kafka rows (key string, value binary, topic string) — the producer
    complement of ``value_format="debezium-avro"``, for publishing this
    engine's CDC into a bus whose consumers expect the production
    Debezium wire shape instead of our JSON.

    ``value_schemas``: {"db.table": StructType} (the same map consume
    uses for typed parsing); ``schema_ids``: {"db.table": registry id}
    — whatever ids the registry assigned the per-table envelope
    schemas (register ``debezium_envelope_schema(...)`` once, out of
    band). Topics follow the Debezium convention
    ``<prefix>.<db>.<table>``; key = the JSON pk-bearing image's text
    (consumers partition per table by key hash). 'query' (DDL) events
    are dropped — Debezium routes DDL via its schema-history topic,
    not the data topics. Encode runs Arrow-batched on executors; the
    parsed envelope schemas ride the closure."""
    import json as _json

    from synch_spark.sources.avro_codec import (
        avro_encode,
        coerce_json_to_avro,
        confluent_frame,
        debezium_envelope_schema,
        parse_schema,
    )

    parsed = {}
    for qualified, struct in value_schemas.items():
        db, table = qualified.split(".", 1)
        if qualified not in schema_ids:
            raise ValueError(
                f"no schema id for {qualified!r} — register its envelope "
                "schema and pass {table: id}")
        parsed[qualified] = (int(schema_ids[qualified]),
                             parse_schema(debezium_envelope_schema(
                                 struct, db, table)))
    _OP = {"insert": "c", "update": "u", "delete": "d"}

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                qualified = f"{r.schema}.{r.table}"
                entry = parsed.get(qualified)
                op = _OP.get(r.action)
                if entry is None or op is None:  # untyped table / DDL
                    continue
                sid, (root, names) = entry
                value_node = None
                for f in root["fields"]:
                    if f["name"] == "before":
                        value_node = f["type"]
                env = {
                    "before": coerce_json_to_avro(
                        _json.loads(r.before), value_node, names)
                    if r.before is not None else None,
                    "after": coerce_json_to_avro(
                        _json.loads(r.after), value_node, names)
                    if r.after is not None else None,
                    "source": {"db": r.schema, "table": r.table,
                               "ts_ms": int(r.event_unixtime) // 1000,
                               "ts_us": int(r.event_unixtime)},
                    "op": op, "ts_ms": None,
                }
                frame = confluent_frame(
                    sid, avro_encode(env, (root, names)))
                rows.append((r.after or r.before, frame,
                             f"{queue_prefix}.{r.schema}.{r.table}"))
            yield pd.DataFrame(rows, columns=["key", "value", "topic"])

    return events.mapInPandas(encode, "key string, value binary, topic string")


def kafka_writer_options(bootstrap_servers: str,
                         security_options: dict | None = None
                         ) -> dict[str, str]:
    """The exact option map the connector writers configure — pure, so
    the contract (bootstrap + kafka.* security client configs) is
    testable without the jar, like kafka_source_options."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    opts.update(security_options or {})
    return opts


def kafka_writer(
    events: DataFrame,
    bootstrap_servers: str,
    queue_prefix: str = "synch",
    security_options: dict | None = None,
):
    """Configured (not yet executed) Kafka batch writer for an event
    frame. Call ``.save()`` to produce; requires the
    spark-sql-kafka-0-10 connector on the classpath.
    ``security_options``: kafka.* client configs (see
    streaming.pipeline.kafka_security_options)."""
    w = kafka_payload(events, queue_prefix).write.format("kafka")
    for k, v in kafka_writer_options(bootstrap_servers,
                                     security_options).items():
        w = w.option(k, v)
    return w


def kafka_writer_raw(payload: DataFrame, bootstrap_servers: str,
                     security_options: dict | None = None):
    """Kafka batch writer for an ALREADY-SHAPED payload frame (key,
    value, topic) — the debezium-avro produce path, whose value is
    binary, not the engine's JSON."""
    w = payload.write.format("kafka")
    for k, v in kafka_writer_options(bootstrap_servers,
                                     security_options).items():
        w = w.option(k, v)
    return w


def produce_to_kafka_socket(
    events: DataFrame, bootstrap_servers: str, queue_prefix: str = "synch",
    partition: int = 0, batch_size: int = 500,
    security: dict | None = None,
    compression: str = "none",
) -> int:
    """Driver-side wire produce (sources.kafka_socket) — the
    reference's single-threaded KafkaProducer loop
    (/root/reference/synch/broker/kafka.py:34-44) without kafka-python:
    ``kafka_payload``'s exact (key, value, topic) contract, one
    message-format-v2 record batch per ``batch_size`` rows, acks=1
    (the reference producer's default). Deliberately NOT the bulk
    path: at 100 TB produce through ``kafka_writer`` (the distributed
    connector, one task per partition); this is the CDC tail shape —
    a driver already holds the (small) per-round change batch, exactly
    like the redis producer's toLocalIterator loop. Returns the number
    of events produced. ``security``: KafkaSocketClient security kwargs
    (ssl_mode/ssl_ca/sasl_*), applied to EVERY connection — bootstrap
    and leaders alike (see KafkaSocketClient.security_from_config).
    ``compression``: none | gzip | zstd — batch-level wire compression
    (a CDC tail shipping JSON over a WAN compresses ~10x; the consume
    side decodes all three)."""
    from synch_spark.sources.kafka_socket import KafkaSocketClient

    payload = kafka_payload(events, queue_prefix)
    sec = security or {}
    n = 0
    first = bootstrap_servers.split(",")[0].strip()
    bhost, _, bport = first.partition(":")
    fallback = (bhost, int(bport or 9092))
    # leader routing (a multi-broker cluster accepts Produce only on
    # each partition's leader): one Metadata round trip per new topic,
    # one cached connection per leader. Single-broker clusters resolve
    # every topic to the same (bootstrap) connection.
    conns: dict[tuple, KafkaSocketClient] = {}
    topic_leader: dict[str, tuple] = {}

    def conn_for(topic: str) -> KafkaSocketClient:
        if topic not in topic_leader:
            boot = conns.get(fallback)
            if boot is None:
                boot = conns[fallback] = KafkaSocketClient(
                    *fallback, **sec).connect()
            md = boot.metadata([topic])
            info = md["topics"].get(topic) or {"partitions": {}}
            node = {b[0]: (b[1], b[2]) for b in md["brokers"]}
            pinfo = info["partitions"].get(partition)
            topic_leader[topic] = (node.get(pinfo["leader"], fallback)
                                   if pinfo else fallback)
        addr = topic_leader[topic]
        cli = conns.get(addr)
        if cli is None:
            cli = conns[addr] = KafkaSocketClient(*addr, **sec).connect()
        return cli

    buf: dict[str, list] = {}
    try:
        def flush(topic: str):
            nonlocal n
            recs = buf.pop(topic, [])
            if recs:
                conn_for(topic).produce(topic, partition, recs,
                                        compression=compression)
                n += len(recs)

        for row in payload.toLocalIterator():
            buf.setdefault(row["topic"], []).append(
                (row["key"].encode("utf-8"), row["value"].encode("utf-8")))
            if len(buf[row["topic"]]) >= batch_size:
                flush(row["topic"])
        for topic in list(buf):
            flush(topic)
    finally:
        for cli in conns.values():
            cli.close()
    return n


def consume_from_kafka_socket(
    spark: SparkSession, bootstrap_servers: str, topic: str,
    partition: int = 0, offset: int = 0, max_rounds: int = 100,
    security: dict | None = None,
    isolation: str = "read_uncommitted",
):
    """Assign+seek wire consume (B4 parity: the reference pins a
    partition and seeks, synch/broker/kafka.py:40-61): fetch from an
    explicit offset until the high watermark, return (DataFrame of
    (key, value, offset), next_offset). The caller persists
    next_offset as its durable cursor — same discipline as the
    binlog/LSN cursors. Driver-side by design; the distributed consume
    is ``read_kafka_socket_distributed`` / the spark-sql-kafka source.

    Fetches are routed to the partition's LEADER (one Metadata call on
    the bootstrap host): a multi-broker cluster answers Fetch only on
    the leader (error 6 elsewhere) — the producer and the distributed
    read route the same way. Advance uses ``fetch_progress``, so a
    control-batch-only response (EOS/transactional producer markers)
    moves the cursor instead of stalling the loop for all
    ``max_rounds``. ``isolation="read_committed"`` additionally drops
    records from ABORTED transactions and stops at the last stable
    offset (KIP-98) — without it a rolled-back EOS transaction's rows
    surface as phantom data."""
    import sys

    from synch_spark.sources.kafka_socket import (
        KafkaOffsetOutOfRange,
        KafkaSocketClient,
    )

    sec = security or {}
    first = bootstrap_servers.split(",")[0].strip()
    bhost, _, bport = first.partition(":")
    leader = (bhost, int(bport or 9092))
    with KafkaSocketClient(*leader, **sec) as boot:
        md = boot.metadata([topic])
        info = md["topics"].get(topic)
        if info and not info["error"]:
            node = {b[0]: (b[1], b[2]) for b in md["brokers"]}
            pinfo = info["partitions"].get(partition)
            if pinfo:
                leader = node.get(pinfo["leader"], leader)
    rows: list = []
    with KafkaSocketClient(*leader, **sec) as c:
        cur = offset
        for _ in range(max_rounds):
            try:
                hw, recs, nxt = c.fetch_progress(topic, partition, cur,
                                                 isolation=isolation)
            except KafkaOffsetOutOfRange:
                # retention truncated past the cursor: reseek to the
                # log start — LOUDLY, the skipped range is data the
                # consumer never saw (the operator sized retention too
                # short for the consume cadence)
                earliest = c.list_offsets(topic, partition, -2)
                print(f"kafka {topic}/{partition}: cursor {cur} fell off "
                      f"the retained log; reseeking to earliest "
                      f"{earliest} ({earliest - cur} offsets lost)",
                      file=sys.stderr)
                cur = earliest
                continue
            for off, k, v in recs:
                rows.append((k.decode() if k is not None else None,
                             v.decode() if v is not None else None, off))
            cur = nxt
            if cur >= hw:
                break
    df = spark.createDataFrame(
        rows or [], "key string, value string, offset long")
    return df, cur


def produce_to_kafka(
    events: DataFrame, bootstrap_servers: str, queue_prefix: str = "synch",
    security_options: dict | None = None,
) -> None:
    """Execute the Kafka produce; raise a clear error when the connector
    jar is absent (the baked-in pyspark ships without it)."""
    try:
        kafka_writer(events, bootstrap_servers, queue_prefix,
                     security_options).save()
    except Exception as e:  # noqa: BLE001 — translate the classpath failure
        if "kafka" in str(e).lower() and (
            "Failed to find" in str(e) or "ClassNotFound" in str(e)
        ):
            raise RuntimeError(
                "spark-sql-kafka connector not on the classpath; launch with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
                "or use the file spool sink"
            ) from e
        raise


def ensure_topic(
    bootstrap_servers: str,
    topic: str,
    num_partitions: int = 1,
    replication_factor: int = 1,
    security: dict | None = None,
) -> bool:
    """B5: idempotent topic provisioning (ref synch/broker/kafka.py:66-73
    — KafkaAdminClient.create_topics, TopicAlreadyExists swallowed).
    Speaks the Kafka wire protocol directly (sources.kafka_socket
    CreateTopics v0) — pure stdlib, no kafka-python needed. When
    kafka-python IS installed, it is preferred for its richer broker
    compatibility negotiation; behavior is identical. Returns True when
    the topic was created, False when it already existed; an
    unreachable broker raises the socket error loudly."""
    try:
        from kafka.admin import KafkaAdminClient, NewTopic
        from kafka.errors import TopicAlreadyExistsError
    except ImportError:
        from synch_spark.sources.kafka_socket import KafkaSocketClient

        with KafkaSocketClient.from_bootstrap(bootstrap_servers,
                                              **(security or {})) as c:
            return c.create_topic(topic, num_partitions=num_partitions,
                                  replication_factor=replication_factor)
    client = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
    try:
        client.create_topics(
            [NewTopic(topic, num_partitions=num_partitions,
                      replication_factor=replication_factor)]
        )
        return True
    except TopicAlreadyExistsError:
        return False
    finally:
        client.close()


def write_event_spool(
    events: DataFrame, events_dir: str, basename: str
) -> int:
    """Distributed newline-JSON spool write for the file-stream consumer.

    Executors write part files into ``events_dir/_staging.<basename>``
    (``_`` prefix: Spark file listings — including the consumer's
    readStream — ignore it), then the driver renames each part into
    ``events_dir`` as ``<basename>.<i>.json``. Renames are atomic, so
    the consumer sees only whole files; driver cost is O(#part files)
    metadata, never O(rows).

    Re-run contract (same ``basename``): recovery from a mid-batch
    failure assumes a rerun regenerates byte-identical part files in
    the same sorted order — true for every producer in this repo (file
    decoders and socket drains are deterministic given the same cursor).
    A caller feeding a NONDETERMINISTIC frame (e.g. an unordered
    sample, or a shuffle whose partitioning varies run-to-run) gets
    at-least-once instead: changed bytes publish under fresh unique
    names and already-consumed parts may be republished — safe only
    because downstream applies are idempotent merges. Such callers
    should impose an order (repartition + sortWithinPartitions on the
    event key) before spooling, or use unique basenames per attempt;
    it is not imposed here because it would add a shuffle to every
    spool write on the hot path to fix a producer class that does not
    currently exist.

    Returns the number of spool files created (0 for an empty frame).
    """
    os.makedirs(events_dir, exist_ok=True)
    staging = os.path.join(events_dir, f"_staging.{basename}")
    cols = EVENT_COLUMNS + ([WIRE_SEQ_COL] if WIRE_SEQ_COL in events.columns
                            else [])
    events.select(*cols).write.mode("overwrite").json(staging)
    i = 0
    published = 0
    try:
        for f in sorted(os.listdir(staging)):
            if f.startswith("part-") and ".json" in f and os.path.getsize(
                os.path.join(staging, f)
            ):
                dst = os.path.join(events_dir, f"{basename}.{i}.json")
                if os.path.exists(dst):
                    # NEVER os.replace an existing spool file: the
                    # file-stream consumer dedups processed files BY
                    # PATH, so overwritten content would silently never
                    # be consumed (deterministic replay basenames hit
                    # this on re-runs). Identical bytes = an idempotent
                    # re-run: skip — but STILL advance the index, or
                    # every later part of a multi-part re-run compares
                    # against the wrong existing file and republishes
                    # already-consumed data. Different bytes = new
                    # data: publish under a fresh unique path the
                    # consumer WILL read.
                    src = os.path.join(staging, f)
                    if _same_content(src, dst):
                        i += 1
                        continue
                    dst = os.path.join(
                        events_dir,
                        f"{basename}.{i}.{uuid.uuid4().hex[:8]}.json",
                    )
                    os.replace(src, dst)
                    i += 1
                    published += 1
                    continue
                os.replace(os.path.join(staging, f), dst)
                i += 1
                published += 1
    except BaseException:
        # a rename failed MID-BATCH: earlier parts are already visible
        # to the consumer — deleting the unpublished remainder (old
        # behavior) would strand a partial batch with no way to finish
        # it. Keep the staging dir: a retry with the SAME basename
        # skips the already-published identical parts and publishes the
        # rest, completing the batch exactly once.
        raise
    else:
        shutil.rmtree(staging, ignore_errors=True)
    return published


def _same_content(a: str, b: str) -> bool:
    import filecmp

    try:
        return filecmp.cmp(a, b, shallow=False)
    except OSError:
        return False


def read_kafka_socket_distributed(
    spark: SparkSession, bootstrap_servers: str, topic: str,
    start_offsets: dict[int, int] | None = None,
    end_offsets: dict[int, int] | None = None,
    max_per_partition: int | None = None,
    binary_values: bool = False,
    fetch_max_bytes: int = 1 << 20,
    security: dict | None = None,
    isolation: str = "read_uncommitted",
):
    """DISTRIBUTED bounded wire read: one executor task per
    topic-partition, each opening its own socket to the broker and
    fetching its [start, end) offset range — the spark-sql-kafka batch
    source's shape (one task per partition, offset-range bounded)
    rebuilt on the stdlib protocol client, for jar-less backfills of a
    whole topic. The driver does only metadata + ListOffsets planning
    (no data bytes cross it); record batches decode inside the tasks
    via Arrow-batched mapInPandas. Offset ranges are pinned AT PLAN
    TIME (earliest..latest unless given), so the read is a consistent
    bounded snapshot even while producers keep appending — re-running
    the plan re-fetches the same rows.

    Returns (DataFrame[partition int, offset long, key string,
    value string], end_offsets dict) — feed the frame to
    raw_from_kafka_values and persist end_offsets as the resume
    cursor. ``binary_values=True`` keeps ``value`` as raw bytes
    (BinaryType) instead of decoding UTF-8 — the shape the
    Confluent-framed Avro decode needs (the connector source's value
    column is binary too)."""
    from pyspark.sql import types as T

    from synch_spark.sources.kafka_socket import KafkaSocketClient

    import sys

    sec = security or {}
    with KafkaSocketClient.from_bootstrap(bootstrap_servers, **sec) as c:
        md = c.metadata([topic])
        info = md["topics"].get(topic)
        if info is None or info["error"]:
            raise ValueError(f"kafka topic {topic!r} does not exist")
        pids = sorted(info["partitions"])
        # partition -> its LEADER's (host, port): a multi-broker
        # cluster answers Fetch only on the leader (error 6 elsewhere);
        # the metadata response carries exactly this routing table
        node = {b[0]: (b[1], b[2]) for b in md["brokers"]}
        first = bootstrap_servers.split(",")[0].strip()
        bhost, _, bport = first.partition(":")
        fallback = (bhost, int(bport or 9092))
        leaders = {
            p: node.get(info["partitions"][p]["leader"], fallback)
            for p in pids
        }
    starts = dict(start_offsets or {})
    ends = dict(end_offsets or {})
    by_leader: dict[tuple, list[int]] = {}
    for p in pids:
        by_leader.setdefault(leaders[p], []).append(p)
    # offset planning per LEADER connection: like Fetch, ListOffsets is
    # answered only by each partition's leader on a multi-broker cluster
    # plan-time offset discovery is BATCHED per leader connection —
    # O(leaders) round trips, not O(partitions): a 10k-partition topic
    # must not pay 20-30k RTTs before the first task launches
    for (lhost, lport), plist in by_leader.items():
        with KafkaSocketClient(lhost, lport, **sec) as lc:
            earliests = lc.list_offsets_many(topic, plist, -2)
            for p in plist:
                earliest = earliests[p]
                if p not in starts:
                    starts[p] = earliest
                elif starts[p] < earliest:
                    # retention truncated past the caller's cursor:
                    # clamp up LOUDLY (the lost range is data the
                    # consumer never saw) instead of letting every
                    # executor fetch fail — a restart would otherwise
                    # replay the identical plan and stall forever
                    print(f"kafka {topic}/{p}: cursor {starts[p]} fell "
                          f"off the retained log; reseeking to earliest "
                          f"{earliest} ({earliest - starts[p]} offsets "
                          "lost)", file=sys.stderr)
                    starts[p] = earliest
            need_latest = [p for p in plist if p not in ends]
            latests = lc.list_offsets_many(topic, need_latest, -1)
            for p in need_latest:
                ends[p] = latests[p]
            if isolation == "read_committed":
                # clamp the pinned ends to the LAST STABLE OFFSET:
                # ListOffsets v1 knows only the hw, and a range pinned
                # past the LSO would make every task stall on undecided
                # (open-transaction) data — one batched probe fetch per
                # leader learns them all
                probe = [p for p in plist if ends[p] > starts[p]]
                lsos = lc.last_stable_offsets(topic, probe, starts)
                for p in probe:
                    ends[p] = min(ends[p], max(lsos[p], starts[p]))
            for p in plist:
                if max_per_partition is not None:
                    ends[p] = min(ends[p], starts[p] + max_per_partition)
    ranges = [(p, starts[p], ends[p]) for p in pids if ends[p] > starts[p]]
    out_schema = T.StructType([
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("value",
                      T.BinaryType() if binary_values else T.StringType()),
    ])
    if not ranges:
        return spark.createDataFrame([], out_schema), ends

    def fetch_ranges(batches):
        import pandas as pd

        from synch_spark.sources.kafka_socket import (
            KafkaOffsetOutOfRange,
            KafkaSocketClient as _C,
        )

        cols = ["partition", "offset", "key", "value"]
        for pdf in batches:
            for _, r in pdf.iterrows():
                pid, lo, hi = int(r["p"]), int(r["lo"]), int(r["hi"])
                host, port = str(r["host"]), int(r["port"])
                with _C(host, port, **sec) as cli:
                    cur = lo
                    while cur < hi:
                        try:
                            hw, recs, nxt = cli.fetch_progress(
                                topic, pid, cur, max_bytes=fetch_max_bytes,
                                isolation=isolation)
                        except KafkaOffsetOutOfRange:
                            # retention moved past the pinned start
                            # mid-read: surface loudly — a silent skip
                            # here would be an unbounded, invisible gap
                            # in a backfill
                            raise RuntimeError(
                                f"kafka {topic}/{pid}: retention "
                                f"truncated past pinned offset {cur} "
                                "mid-backfill; restart from a fresh "
                                "ListOffsets plan") from None
                        if nxt <= cur:
                            # the pinned [lo, hi) range extends past the
                            # log (hw shrank: topic recreated?) — the
                            # driver will persist hi as the committed
                            # cursor, so skipping the remainder silently
                            # would be invisible data loss
                            raise RuntimeError(
                                f"kafka {topic}/{pid}: no forward "
                                f"progress at offset {cur} (hw {hw}, "
                                f"pinned end {hi}) — refusing to skip "
                                "the remainder of the pinned range; "
                                "restart from a fresh ListOffsets plan")
                        # one DataFrame PER FETCH ROUND: per-task memory
                        # stays O(fetch chunk), not O(range) — a whole-
                        # partition backfill must not materialize the
                        # partition in one Python list (verdict r11 #2)
                        rows = [
                            (pid, off,
                             k.decode() if k is not None else None,
                             (v if binary_values
                              else v.decode()) if v is not None else None)
                            for off, k, v in recs if off < hi]
                        if rows:
                            yield pd.DataFrame(rows, columns=cols)
                        cur = nxt

    plan = spark.createDataFrame(
        [(p, lo, hi, leaders[p][0], leaders[p][1])
         for p, lo, hi in ranges],
        "p int, lo long, hi long, host string, port int"
    ).repartition(len(ranges), "p")
    return plan.mapInPandas(fetch_ranges, out_schema), ends
