"""Measured CDC consumer throughput vs the reference's ceiling.

The reference's consumer is a single-threaded row loop flushing
``insert_num=20000`` events per ``insert_interval=60`` s
(/root/reference/synch.yaml:3-4,
/root/reference/synch/replication/continuous.py:96-100) — an implied
sustained ceiling of ~333 events/s regardless of hardware, because one
Python process applies row dicts one at a time.

This tool measures the rebuild's equivalent number end-to-end on the
SAME workload shape: a pk-keyed table bootstrapped by snapshot, then a
spool of insert/update/delete events consumed through the production
path (file-spool stream -> foreachBatch -> compact_batch ->
merge/CoW-commit into the manifest-log store), several micro-batches,
checkpointed. Wall time covers the full drain including every commit.

Usage: python tools/bench_cdc_throughput.py [n_events] [n_batches]
Prints one JSON line:
  {"metric": "cdc_apply_events_per_s", "value": ..., "events": N,
   "wall_s": ..., "micro_batches": B, "reference_events_per_s": 333}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F, types as T

    from synch_spark.config import Engine, SyncConfig, TableSpec
    from synch_spark.session import get_spark
    from synch_spark.sources.table import ParquetTable
    from synch_spark.streaming.pipeline import CdcPipeline

    spark = get_spark("cdc-throughput")
    root = tempfile.mkdtemp(prefix="synch-cdc-bench-")
    try:
        warehouse = os.path.join(root, "wh")
        events_dir = os.path.join(root, "events")
        n_keys = max(1000, n_events // 4)

        # -- bootstrap: snapshot of the initial table state ---------------
        spec = TableSpec(schema="db", table="t", pk=("id",),
                         engine=Engine.MERGE_TREE)
        table = ParquetTable(spark, f"{warehouse}/db/t")
        base = spark.range(n_keys).select(
            F.col("id"),
            (F.col("id") % 97).cast("double").alias("amount"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
        )
        table.overwrite(base)

        # -- the event spool: the reference's insert/update/delete mix ----
        # (delete_num:insert_num defaults aside, CDC traffic is mostly
        # updates to recent keys with a tail of inserts and deletes).
        # Deterministic column algebra — no Python row loop on our side.
        ev = spark.range(n_events).select(
            F.col("id").alias("seq"),
            (F.col("id") % n_keys).alias("key"),
            (F.col("id") % 10).alias("bucket"),
        )
        payload = F.to_json(F.struct(
            F.col("key").alias("id"),
            ((F.col("seq") % 9973).cast("double") / 100).alias("amount"),
            F.concat(F.lit("name-"), F.col("key")).alias("name"),
        ))
        raw = ev.select(
            F.lit("db").alias("schema"),
            F.lit("t").alias("table"),
            F.when(F.col("bucket") < 6, F.lit("insert"))
            .when(F.col("bucket") < 9, F.lit("update"))
            .otherwise(F.lit("delete")).alias("action"),
            F.when(F.col("bucket") >= 6, payload).alias("before"),
            F.when(F.col("bucket") < 9, payload).alias("after"),
            (F.lit(1_700_000_000_000_000) + F.col("seq")).alias("event_unixtime"),
        )
        # one spool subdir per micro-batch; maxFilesPerTrigger=files/batch
        files_per_batch = 4
        os.makedirs(events_dir, exist_ok=True)
        raw.repartition(n_batches * files_per_batch).write.mode("overwrite").json(
            os.path.join(events_dir)
        )

        cfg = SyncConfig()
        cfg.add_table(spec)
        pipe = CdcPipeline(
            spark=spark, cfg=cfg, warehouse=warehouse,
            checkpoint_dir=os.path.join(root, "ckpt"),
            value_schemas={"db.t": T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("amount", T.DoubleType()),
                T.StructField("name", T.StringType()),
            ])},
        )

        t0 = time.perf_counter()
        q = pipe.start_file_stream(
            events_dir, available_now=True,
            max_files_per_trigger=files_per_batch,
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None

        final_rows = table.read().count()
        payload_out = {
            "metric": "cdc_apply_events_per_s",
            "value": round(n_events / wall, 1),
            "events": n_events,
            "wall_s": round(wall, 2),
            "micro_batches": batches,
            "final_rows": final_rows,
            "reference_events_per_s": 333,
            "speedup_vs_reference": round(n_events / wall / 333.0, 1),
        }
        print(json.dumps(payload_out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def binlog_decode_bench(n_files: int = 16, rows_per_file: int = 20_000) -> dict:
    """Measured distributed binlog-file decode rate.

    The reference tails the binlog with python-mysql-replication in ONE
    Python process (/root/reference/synch/reader/mysql.py:128-153) — its
    decode rate is a single core's. ``binlog_files_to_raw`` decodes a
    rotated archive with one task per file (binaryFile + mapInPandas),
    so the rate scales with cores/executors. Files are synthesized by
    the spec-built test encoder (tests.binlog_builder — independent of
    the decoder under test).

    Run: python tools/bench_cdc_throughput.py binlog [n_files] [rows/file]
    """
    import tempfile as _tf

    from pyspark.sql import functions as F

    from synch_spark.session import get_spark
    from synch_spark.sources import binlog_file as B
    from tests.binlog_builder import BinlogBuilder

    spark = get_spark("binlog-decode-bench")
    root = _tf.mkdtemp(prefix="synch-binlog-bench-")
    try:
        cols = [("id", B.T_LONG, 0), ("amount", B.T_NEWDECIMAL, (10 << 8) | 2),
                ("name", B.T_VARCHAR, 64)]
        # one template file, replicated with distinct names: decode cost
        # is per-byte, identical across copies; build cost stays O(rows)
        b = BinlogBuilder()
        b.table_map(7, "db", "t", cols, names_tlv=True)
        batch = 500
        for base in range(0, rows_per_file, batch):
            b.insert(7, *[(base + i, "12.34", f"n{base + i}")
                          for i in range(min(batch, rows_per_file - base))])
        blob = b.bytes()
        for f in range(n_files):
            with open(os.path.join(root, f"binlog.{f + 1:06d}"), "wb") as fh:
                fh.write(blob)

        t0 = time.perf_counter()
        n = B.binlog_files_to_raw(spark, root).count()
        wall = time.perf_counter() - t0
        out = {
            "metric": "binlog_decode_events_per_s",
            "value": round(n / wall, 1),
            "events": n,
            "files": n_files,
            "wall_s": round(wall, 2),
        }
        print(json.dumps(out))
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def change_feed_bench(n_rows: int = 2_000_000, n_changed: int = 20_000,
                      n_files: int = 64) -> dict:
    """Measured change-feed cost on a big table after a small merge —
    the consumer-side scale claim, quantified: producing the feed must
    read O(files the merge touched), never the table.

    Builds an ``n_rows`` pk-clustered table across ``n_files`` files,
    merges one batch touching ``n_changed`` clustered keys, then times
    ``changes(v0, pk)`` end-to-end and reports the rows/s of feed
    production plus exactly how many of the table's files the plan
    read (``inputFiles``) — the number that stays flat as the table
    grows 1000x.

    Run: python tools/bench_cdc_throughput.py feed [rows] [changed] [files]
    """
    import tempfile as _tf

    from pyspark.sql import functions as F

    from synch_spark.config import Engine, TableSpec
    from synch_spark.operators.cdc_apply import apply_cdc_batch
    from synch_spark.session import get_spark
    from synch_spark.sources.table import ParquetTable

    spark = get_spark("change-feed-bench")
    root = _tf.mkdtemp(prefix="synch-feed-bench-")
    try:
        spec = TableSpec(schema="db", table="t", pk=("id",),
                         engine=Engine.REPLACING_MERGE_TREE)
        table = ParquetTable(spark, os.path.join(root, "t"), retain=3)
        table.overwrite(
            spark.range(n_rows).select(
                F.col("id"),
                (F.col("id") % 97).cast("double").alias("amount"),
                F.concat(F.lit("name-"), F.col("id")).alias("name"),
            ).repartitionByRange(n_files, "id")
        )
        v0 = table.current_version()
        total_files = len(table.snapshot().files)

        # a clustered update run + a delete tail: the realistic merge
        # shape (hot recent keys), touching a bounded key range
        upd = spark.range(n_changed).select(
            F.lit("db").alias("schema"), F.lit("t").alias("table"),
            F.when(F.col("id") % 10 < 9, F.lit("insert"))
            .otherwise(F.lit("delete")).alias("action"),
            F.col("id").alias("id"),
            F.lit(-1.0).alias("amount"),
            F.concat(F.lit("upd-"), F.col("id")).alias("name"),
            (F.lit(1_700_000_000_000_000) + F.col("id")).alias("event_unixtime"),
            F.lit(0).alias("action_seq"),
        )
        apply_cdc_batch(table, upd, spec,
                        value_columns=["id", "amount", "name"])

        t0 = time.perf_counter()
        feed = table.changes(v0, pk="id")
        n_feed = feed.count()
        wall = time.perf_counter() - t0
        files_read = len(set(feed.inputFiles()))
        out = {
            "metric": "change_feed_rows_per_s",
            "value": round(n_feed / wall, 1),
            "feed_rows": n_feed,
            "wall_s": round(wall, 2),
            "table_rows": n_rows,
            "table_files": total_files,
            "files_read": files_read,
        }
        print(json.dumps(out))
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "binlog":
        binlog_decode_bench(
            int(sys.argv[2]) if len(sys.argv) > 2 else 16,
            int(sys.argv[3]) if len(sys.argv) > 3 else 20_000,
        )
    elif len(sys.argv) > 1 and sys.argv[1] == "feed":
        change_feed_bench(
            int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 20_000,
            int(sys.argv[4]) if len(sys.argv) > 4 else 64,
        )
    else:
        main()
