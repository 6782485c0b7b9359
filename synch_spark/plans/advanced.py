"""Advanced operator families beyond the DQ suite: as-of join,
sessionization, pivot, rollup, exact percentile, and a *real*
Structured Streaming windowed aggregation checked against a batch SQL
oracle. Same dual Spark/DuckDB form as relational.py.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from synch_spark.plans.relational import DEC, _pin, _t

# -- streaming session: right-sized state-store parallelism ---------------
# weak-keyed by the parent session object: id() could be reused after a
# stopped session is garbage-collected, handing out a sub-session bound
# to a dead SparkContext; weak keys also let entries die with the parent
import weakref

_STREAM_SESSIONS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

# per-session memo of raw-scan split counts (one ~50 ms rdd compile per
# (sf_dir, table), same probe `_spread` pays once)
_NSPLITS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _scan_splits(spark, sf_dir, name: str) -> int:
    cache = _NSPLITS.setdefault(spark, {})
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = _t(spark, sf_dir, name).rdd.getNumPartitions()
    return cache[key]


def _mat_multiref(spark, df, sf_dir, base: str):
    """Materialize-once gate for a compact aggregate consumed more than
    once whose second reference sits under a broadcast boundary (where
    exchange reuse does not fire — the q89 lesson), so each consumer
    would re-execute the full base scan + aggregate.

    Size-adaptive, not unconditional: when the base table arrives as
    fewer splits than cores (the 2 MB local events fixture), re-scanning
    it is CHEAPER than the block-manager materialization round trip
    (measured +0.15-0.25 s per query at sf0.1), so the plan is left
    alone; when the scan is wide — cluster scale — the re-executed
    scan+aggregate is the dominant cost and the aggregate is
    lazy-checkpointed (materialization rides the first consumer's job).
    Same input-size-derived decision, and the same memoized split
    probe, as `_spread`. Results are invariant to the branch: the
    checkpoint pins exactly the aggregate's output rows
    (regression-tested by forcing the gate on the fixture)."""
    if _scan_splits(spark, sf_dir, base) >= spark.sparkContext.defaultParallelism:
        return df.localCheckpoint(eager=False)
    return df


def _stream_session(spark, partitions: int = 8):
    """Dedicated SparkSession (shared SparkContext, own SQLConf) for the
    Structured Streaming queries, with the state-store partition count
    sized to the STATEFUL WORKLOAD instead of inheriting the batch
    shuffle width. Each stateful operator materializes one state-store
    instance (+ delta/commit files per micro-batch) PER shuffle
    partition: at local bench scale (a few thousand keys) 32 partitions
    mean the per-partition fixed cost dominates the actual work ~4x.
    A 100 TB deployment RAISES this with the throughput
    (SPARK_SYNCH_STREAM_PARTITIONS env or spark.synch.stream.partitions
    conf) — the point is that streaming state parallelism is its own
    knob, not a hand-me-down from batch joins."""
    import os

    from synch_spark.session import ensure_session_confs

    sub = _STREAM_SESSIONS.get(spark)
    if sub is None:
        sub = spark.newSession()
        ensure_session_confs(sub)
        n = (
            spark.conf.get("spark.synch.stream.partitions", None)
            or os.environ.get("SPARK_SYNCH_STREAM_PARTITIONS")
            or str(partitions)
        )
        sub.conf.set("spark.sql.shuffle.partitions", n)
        # state-store backend knob: the default HDFSBackedStateStore
        # holds every key's state in executor HEAP — fine at bench
        # scale, an OOM at 100 TB/day streaming dedup or sessionization
        # state. spark.synch.stream.statestore=rocksdb (or env
        # SPARK_SYNCH_STREAM_STATESTORE) switches the sub-session to
        # Spark's bundled RocksDB provider: state lives off-heap/on-disk
        # with incremental checkpointing, the deployment setting for
        # large stateful topologies. Left default locally — RocksDB's
        # per-micro-batch fixed cost only amortizes on real state sizes.
        backend = (
            spark.conf.get("spark.synch.stream.statestore", None)
            or os.environ.get("SPARK_SYNCH_STREAM_STATESTORE")
        )
        if backend and backend.lower() == "rocksdb":
            sub.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        # checkpoint root knob: on a cluster this points at the durable
        # DFS (HDFS/S3) the deployment recovers from; locally the default
        # is java.io.tmpdir on disk. The bench sets it to tmpfs — the
        # single-node stand-in for a fast DFS — because the measured
        # quantity is operator cost, not local-disk fsync latency; the
        # commit protocol (offset log, commit log, state deltas) is
        # identical either way. Each query still gets its own subdir.
        ckpt = (
            spark.conf.get("spark.synch.stream.checkpoint.dir", None)
            or os.environ.get("SPARK_SYNCH_STREAM_CKPT_DIR")
        )
        if ckpt:
            sub.conf.set("spark.sql.streaming.checkpointLocation", ckpt)
        # terminal no-data micro-batch knob: after the last data batch an
        # availableNow run executes one more batch whose only job is to
        # advance the watermark — evicting state and emitting any
        # watermark-gated output (append-mode windowed aggs, timeout
        # flushes). The suite's availableNow queries all emit ON ARRIVAL
        # (complete-mode aggs, inner stream-stream join, arrival-emitting
        # custom state), so for a one-shot run whose checkpoint is then
        # discarded that batch is pure dead cost — the bench turns it
        # off. Deployments that RESUME from the checkpoint, or use
        # watermark-gated emission, keep the default (on).
        nodata = (
            spark.conf.get("spark.synch.stream.nodata", None)
            or os.environ.get("SPARK_SYNCH_STREAM_NODATA")
        )
        if nodata and nodata.lower() in ("0", "false", "off"):
            sub.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        _STREAM_SESSIONS[spark] = sub
    return sub


_STREAM_WARMED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def warm_streaming(spark) -> float:
    """One-time warm-up of the Structured Streaming machinery in the
    shared sub-session; returns seconds spent (0.0 when already warm).

    The FIRST streaming query of each stateful family pays several
    seconds of fixed cost that has nothing to do with its data: state-
    store provider + MicroBatchExecution class loading, streaming
    codegen, the memory-sink table machinery, and (for
    applyInPandasWithState) Python state-worker + Arrow channel spin-up.
    Measured on the bench suite, the five streaming queries cost ~18 s
    on first run vs ~9 s steady-state. A long-running deployment pays
    this once per driver, so the bench pays it in setup (reported
    separately as stream_warm_s, like the q42 index build) — four tiny
    availableNow queries over a 6-row fixture, one per stateful operator
    family (windowed agg, dropDuplicatesWithinWatermark, Python
    state worker, stream-stream join), started concurrently.
    """
    import shutil
    from synch_spark.session import scratch_dir
    import time as _time

    sub = _stream_session(spark)
    if _STREAM_WARMED.get(sub):
        return 0.0
    t0 = _time.perf_counter()
    tmp = scratch_dir("synch-stream-warm-")
    try:
        rows = [(i % 3, f"2024-01-01 00:00:{i:02d}", "click" if i % 2 else "purchase")
                for i in range(6)]
        (sub.createDataFrame(rows, "user_id long, ts_s string, event_type string")
         .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
         .coalesce(1).write.parquet(f"{tmp}/ev"))
        schema = sub.read.parquet(f"{tmp}/ev").schema

        def stream():
            return sub.readStream.schema(schema).parquet(f"{tmp}/ev")

        from synch_spark.streaming.stateful import streaming_first_per_key

        outs = []
        outs.append(
            stream().withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        outs.append(
            stream().withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id"]).select("user_id")
        )
        outs.append(
            streaming_first_per_key(
                stream().select("user_id", "ts", "event_type"),
                "user_id", "ts",
                "user_id long, ts timestamp, event_type string",
            )
        )
        a = (stream().filter(F.col("event_type") == "click")
             .select(F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts"))
             .withWatermark("c_ts", "1 day"))
        b = (stream().filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts"))
             .withWatermark("p_ts", "1 day"))
        outs.append(a.join(
            b,
            (F.col("c_uid") == F.col("p_uid"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 DAY")),
        ))
        queries = []
        for i, out in enumerate(outs):
            mode = "complete" if i == 0 else "append"
            queries.append(
                out.writeStream.outputMode(mode).format("memory")
                .queryName(f"_synch_warm_{i}").trigger(availableNow=True).start()
            )
        for q in queries:
            q.awaitTermination(120)
        for i in range(len(outs)):
            sub.catalog.dropTempView(f"_synch_warm_{i}")
    except Exception:  # noqa: BLE001 — warm-up is best-effort, never fatal
        pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    _STREAM_WARMED[sub] = True
    return _time.perf_counter() - t0


def _read_event_stream(spark, sf_dir, glob: str = "events.parquet"):
    """ONE streaming read of an event fixture: schema snapshot, glob
    directory listing, and ts normalization for BOTH fixture encodings
    (nanosAsLong bigint AND micros-as-NTZ). The six streaming queries
    used to copy this block, and half of them missed the NTZ case when
    the fixture encoding changed — a single definition cannot drift."""
    import os

    from pyspark.sql import types as T

    schema = spark.read.parquet(os.path.join(sf_dir, glob)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    if "ts" in stream.columns:
        ts_type = dict(stream.dtypes)["ts"]
        if ts_type == "bigint":  # nanosAsLong fixture quirk
            from synch_spark.session import nanos_to_ts

            stream = stream.withColumn("ts", nanos_to_ts("ts"))
        elif ts_type == "timestamp_ntz":
            # micros fixtures surface as NTZ; event-time/watermark wants
            # TimestampType — session tz is UTC so wall times are kept
            stream = stream.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return stream


def _run_stream_to_table(out, mode: str, prefix: str, spark):
    """availableNow memory-sink run with a HARD timeout and no leaks:
    awaitTermination's boolean used to be ignored, so a slow host
    returned the half-populated memory table as a PASS-shaped partial
    result; and the uuid-named sink views were never dropped, pinning
    every invocation's full result set in the driver for the session's
    lifetime. The result is materialized OFF the sink (localCheckpoint)
    so the view can be dropped before returning."""
    import uuid

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"{prefix}: streaming query did not finish within 300 s — "
                "refusing to return a partial memory-sink snapshot"
            )
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name)


# --- as-of join ----------------------------------------------------------
# Spark has no native ASOF JOIN (DuckDB does — the oracle uses it). The
# scalable Spark plan is the union trick: tag both streams, sort within
# (key, time) once, and carry the latest right-side attributes forward
# with last_value(ignorenulls) — one shuffle on the key, no per-key loop,
# no range cross-join. This is the standard big-data as-of strategy.
def q26_asof_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    # prune to the joinable keys (the left side is filtered on the same
    # equi-key, so everything else is window work thrown away) and
    # reduce to ONE event per (user, ts) — max event_id — so the as-of
    # pick has no timestamp tie for last() to break arbitrarily (the
    # DuckDB ASOF oracle is equally tie-ambiguous; the oracle dedups the
    # same way, making both engines deterministic AND equal)
    ew = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    events = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 50)
        .withColumn("_rn", F.row_number().over(ew))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    left = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.col("o_orderkey"),
        F.lit(1).alias("_is_order"),
        F.lit(None).cast("string").alias("_etype"),
        F.lit(None).cast("timestamp").alias("_ets"),
    )
    right = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(0).alias("_is_order"),
        F.col("event_type").alias("_etype"),
        F.col("ts").alias("_ets"),
    )
    # events sort before orders at equal t (_is_order asc) => ts <= o_orderdate
    w = W.partitionBy("k").orderBy("t", "_is_order").rowsBetween(W.unboundedPreceding, 0)
    merged = left.unionByName(right).withColumn(
        "last_event_type", F.last("_etype", ignorenulls=True).over(w)
    ).withColumn("last_event_ts", F.last("_ets", ignorenulls=True).over(w))
    return (
        merged.filter(F.col("_is_order") == 1)
        .select(
            F.col("k").alias("o_custkey"),
            "o_orderkey",
            "last_event_type",
            "last_event_ts",
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q26_SQL = """
SELECT o_custkey, o_orderkey,
       e.event_type AS last_event_type, e.ts AS last_event_ts
FROM (SELECT * FROM orders WHERE o_custkey <= 50) o
ASOF LEFT JOIN (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS rn
    FROM events) WHERE rn = 1) e
  ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
ORDER BY o_custkey, o_orderkey
"""


# --- sessionization ------------------------------------------------------
SESSION_GAP_S = 3600


def q27_sessionize(spark, sf_dir):
    """Classic gap-based sessionization: new session when the gap from the
    previous event of the same user exceeds 1 h; output per-user session
    count and longest session length (events)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > SESSION_GAP_S),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    per_session = sess.groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.max("n").cast("bigint").alias("longest"),
        )
        .transform(_pin).orderBy("user_id")
    )


Q27_SQL = f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
                   > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g),
ps AS (SELECT user_id, sess_id, COUNT(*) AS n FROM s GROUP BY user_id, sess_id)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions, CAST(MAX(n) AS BIGINT) AS longest
FROM ps GROUP BY user_id ORDER BY user_id
"""


# --- pivot ---------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q28_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )
    return out.select(
        "d", *[F.col(t).cast("bigint").alias(t) for t in EVENT_TYPES]
    ).orderBy("d")


Q28_SQL = """
SELECT CAST(ts AS DATE) AS d,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY CAST(ts AS DATE) ORDER BY d
"""


# --- rollup --------------------------------------------------------------
def q29_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
        .orderBy("rf", "ls")
    )


Q29_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rf, ls
"""


# --- exact percentiles ---------------------------------------------------
def q30_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_extendedprice", 0.9).alias("p90_price"),
    ).orderBy("l_returnflag")


Q30_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_extendedprice, 0.9) AS p90_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- Structured Streaming windowed aggregation ---------------------------
def q31_streaming_tumbling(spark, sf_dir):
    """A REAL streaming query: the events fixture replayed through
    readStream -> watermark -> 1-day tumbling window -> complete-mode
    memory sink; the returned DataFrame is the final result table. The
    oracle is the equivalent batch SQL — exact equality is the
    batch/stream consistency guarantee Structured Streaming makes."""
    spark = _stream_session(spark)  # UTC/nanos confs + right-sized state partitions
    stream = _read_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        )
    )
    return _run_stream_to_table(agg, "complete", "q31", spark).select(
        F.col("w.start").cast("date").alias("d"), "event_type", "n", "s"
    ).orderBy("d", "event_type")


Q31_SQL = """
SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM events WHERE ts IS NOT NULL
GROUP BY CAST(ts AS DATE), event_type ORDER BY d, event_type
"""
# WHERE ts IS NOT NULL: streaming window() DROPS null event times; the
# oracle would otherwise emit an extra d=NULL group (q70 has the same
# guard for the same reason)


# --- range join ----------------------------------------------------------
RANGE_GAP_S = 60


def q32_range_join(spark, sf_dir):
    """Event pairs of the same user within 60 s of each other (a<b) —
    bucket-blocked interval join, never O(n^2)."""
    from synch_spark.operators.rangejoin import time_range_join

    ev = _t(spark, sf_dir, "events")
    left = ev.select(
        F.col("user_id").alias("u"), F.col("event_id").alias("a"), F.col("ts").alias("ta")
    )
    right = ev.select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("b"), F.col("ts").alias("tb")
    )
    out = time_range_join(
        left,
        right,
        "ta",
        "tb",
        RANGE_GAP_S,
        extra_cond=(F.col("u") == F.col("u2")) & (F.col("a") < F.col("b")),
    )
    return out.select("u", "a", "b").distinct().orderBy("u", "a", "b")


Q32_SQL = f"""
SELECT DISTINCT x.user_id AS u, x.event_id AS a, y.event_id AS b
FROM events x JOIN events y
  ON x.user_id = y.user_id AND x.event_id < y.event_id
 AND abs(date_diff('second', y.ts, x.ts)) <= {RANGE_GAP_S}
ORDER BY u, a, b
"""


# --- cube ---------------------------------------------------------------
def q33_cube(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.cube("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("et"),
            F.coalesce(F.col("d").cast("string"), F.lit("ALL")).alias("d"),
            "n",
        )
        .orderBy("et", "d")
    )


Q33_SQL = """
SELECT COALESCE(event_type, 'ALL') AS et,
       COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS d,
       COUNT(*) AS n
FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE)) ORDER BY et, d
"""


# --- approximate sketches, hash-graded ------------------------------------
def q34_approx_sketches(spark, sf_dir):
    """Sketch aggregation pass with a FULL hash oracle (VERDICT r10
    item 3): the sketches (HLL++ count-distinct, GK approximate median)
    run in the SAME single aggregation as before — bench still times
    the sketch plan — but the graded output carries the deterministic
    sub-aggregates (exact count / min / max per group) plus the sketch
    values folded into loose in-range BOOLEANS the oracle asserts as
    literal TRUE. Referencing the sketches in the booleans keeps
    Catalyst from pruning them out of the plan. The TIGHT accuracy
    envelope (|approx-exact|/exact tolerance vs exact twins) stays
    q101's job; these bounds only pin "a sane value came out" so the
    whole row set hash-matches across engines."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("l_extendedprice").cast("double")).alias("min_price"),
        F.max(F.col("l_extendedprice").cast("double")).alias("max_price"),
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.percentile_approx(
            F.col("l_extendedprice").cast("double"), 0.5).alias("_am"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        "min_price",
        "max_price",
        # HLL estimate: positive, and ≤ 2n leaves 100% headroom over the
        # true distinct ≤ n (rsd default 5%; q101 pins the tight bound)
        ((F.col("_ap") >= 1) & (F.col("_ap") <= 2 * F.col("n")))
        .alias("parts_in_range"),
        # GK median returns an actual element, so [min, max] is exact
        ((F.col("_am") >= F.col("min_price"))
         & (F.col("_am") <= F.col("max_price"))).alias("median_in_range"),
    ).orderBy("l_returnflag")


Q34_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n,
       MIN(CAST(l_extendedprice AS DOUBLE)) AS min_price,
       MAX(CAST(l_extendedprice AS DOUBLE)) AS max_price,
       TRUE AS parts_in_range,
       TRUE AS median_in_range
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- custom stateful streaming: first event per user ---------------------
def q35_streaming_first_per_key(spark, sf_dir):
    """applyInPandasWithState keep-first dedup over the event stream; the
    oracle is the batch window formulation — stream/batch equivalence for
    a *custom* stateful operator."""
    from synch_spark.streaming.stateful import streaming_first_per_key

    spark = _stream_session(spark)  # UTC/nanos confs + right-sized state partitions
    # project BEFORE the stateful op: only these columns cross the
    # Arrow boundary into the Python state workers (props/value stay JVM)
    stream = _read_event_stream(spark, sf_dir).select(
        "user_id", "ts", "event_type")
    out = streaming_first_per_key(
        stream, "user_id", "ts", "user_id long, ts timestamp, event_type string"
    )
    return (
        _run_stream_to_table(out, "append", "q35", spark)
        .select("user_id", F.col("ts").alias("first_ts"), "event_type")
        .orderBy("user_id")
    )


# --- semi-structured JSON extraction --------------------------------------
def q59_json_props(spark, sf_dir):
    """JSON property extraction + aggregation over the event stream's
    semi-structured ``props`` column (MySQL JSON columns arrive as JSON
    strings in the reference's event dicts, reader/__init__.py:59-71 —
    this is their analytics path). ``get_json_object`` is JVM-side
    codegen; at scale prefer from_json with an explicit schema once the
    shape is known, which this query also exercises."""
    ev = _t(spark, sf_dir, "events")
    raw = F.get_json_object("props", "$.k")
    # try_cast, not cast: under ANSI mode a non-integer k ("1.5", "abc")
    # would raise CAST_INVALID_INPUT and kill the query; and n_null counts
    # the RAW extraction like the oracle does, so a malformed value that
    # try_casts to null doesn't inflate the missing-key count
    parsed = ev.select(
        "event_type", raw.alias("_raw"), raw.try_cast("long").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("_raw").isNull(), 1)).alias("n_null"),
        )
        .orderBy("event_type")
    )


Q59_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS BIGINT)
         AS n_null
FROM events GROUP BY event_type ORDER BY event_type
"""
# TRY_CAST mirrors the Spark side's try_cast: a non-integer $.k must
# null on BOTH engines, not abort the oracle on exactly the inputs the
# Spark side was hardened for


# --- custom stateful streaming: gap sessionization -----------------------
def q58_streaming_sessions(spark, sf_dir):
    """applyInPandasWithState gap sessionization over the event stream:
    emits provably-CLOSED sessions (a later event of the same user
    arrived past the gap); the open tail session stays in state, so the
    batch oracle is 'every session except each user's last' — stream/
    batch equivalence for a custom stateful window operator.

    Timestamps are truncated to whole seconds on BOTH sides: the
    operator compares exact microsecond gaps while the oracle's
    date_diff('second', ...) counts second-boundary crossings, so on
    sub-second fixture timestamps a true gap of 3600.1s would split in
    Spark but not in DuckDB (the q27 unix_timestamp lesson). Truncation
    makes the two gap tests identical and the emitted bounds equal."""
    from synch_spark.streaming.stateful import streaming_sessionize

    spark = _stream_session(spark)  # UTC/nanos confs + right-sized state partitions
    # narrow the Arrow transfer into the Python state workers to key+ts
    stream = (
        _read_event_stream(spark, sf_dir)
        .withColumn("ts", F.date_trunc("second", F.col("ts")))
        .select("user_id", "ts")
    )
    out = streaming_sessionize(
        stream,
        "user_id",
        "ts",
        SESSION_GAP_S,
        "user_id long, session_start timestamp, session_end timestamp, n_events long",
    )
    return _run_stream_to_table(out, "append", "q58", spark).orderBy(
        "user_id", "session_start")


Q58_SQL = f"""
WITH e AS (
  SELECT user_id, date_trunc('second', ts) AS ts FROM events),
g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
                   > {{gap}}
              THEN 1 ELSE 0 END AS new_sess
  FROM e),
s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g),
ps AS (
  SELECT user_id, sess_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sess_id)
SELECT user_id, session_start, session_end, n_events
FROM (SELECT *, MAX(sess_id) OVER (PARTITION BY user_id) AS m FROM ps)
WHERE sess_id < m
ORDER BY user_id, session_start
""".replace("{gap}", str(SESSION_GAP_S))


def q102_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup via the BUILT-IN stateful operator
    (dropDuplicatesWithinWatermark): state holds one entry per key and
    expires with the watermark — the Spark-native form of a streaming
    dedup at 100 TB/day (bounded state, no custom Python state worker,
    unlike the applyInPandasWithState ops in q35/q58 which exist for
    semantics Spark lacks). Output projects to the KEY ONLY, so the
    result is deterministic regardless of which physical row won the
    race inside a batch — that projection is what makes a streaming
    dedup oracle-checkable at all."""
    spark = _stream_session(spark)  # UTC/nanos confs + right-sized state partitions
    deduped = (
        _read_event_stream(spark, sf_dir)
        .select("user_id", "ts")
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("user_id")
    )
    return _run_stream_to_table(deduped, "append", "q102", spark).orderBy(
        "user_id")


Q102_SQL = "SELECT DISTINCT user_id FROM events ORDER BY user_id"


Q35_SQL = """
SELECT user_id, ts AS first_ts, event_type FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM events) t
WHERE rn = 1 ORDER BY user_id
"""


# --- window-function zoo -------------------------------------------------
def q45_window_zoo(spark, sf_dir):
    """lag/lead/rank/dense_rank/ntile/first/last over one window — the
    breadth of the window surface in a single deterministic plan."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 30)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_ok"),
            F.lead("o_orderkey").over(w).alias("next_ok"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("o_orderkey").over(wf).alias("first_ok"),
            F.last("o_orderkey").over(wf).alias("last_ok"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q45_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey)  OVER w AS prev_ok,
       lead(o_orderkey) OVER w AS next_ok,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_ok,
       last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
FROM orders WHERE o_custkey <= 30
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


# --- scalar / date / null-semantics zoo ----------------------------------
def q46_scalar_zoo(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.upper(F.substring("l_returnflag", 1, 1)).alias("flag_u"),
            F.concat_ws("-", "l_returnflag", "l_linestatus").alias("cat"),
            F.length(F.trim(F.lit("  pad  "))).cast("bigint").alias("trimmed"),
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_m0"),
            # null semantics: nullif + coalesce round-trip
            F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("nn"),
            (F.col("l_quantity") > 25).cast("boolean").alias("bigqty"),
            F.abs(F.col("l_discount") - 0.05).cast("decimal(18,4)").cast("double").alias("disc_d"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


Q46_SQL = """
SELECT l_orderkey, l_linenumber,
       upper(substr(l_returnflag, 1, 1)) AS flag_u,
       concat_ws('-', l_returnflag, l_linestatus) AS cat,
       CAST(length(trim('  pad  ')) AS BIGINT) AS trimmed,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(month(l_shipdate) AS INT) AS ship_month,
       CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_m0,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS nn,
       l_quantity > 25 AS bigqty,
       CAST(CAST(abs(l_discount - 0.05) AS DECIMAL(18,4)) AS DOUBLE) AS disc_d
FROM lineitem WHERE l_orderkey <= 200
ORDER BY l_orderkey, l_linenumber
"""


# --- sliding (hopping) time windows ---------------------------------------
def q70_sliding_window(spark, sf_dir):
    """Sliding-window aggregation — ``F.window(ts, '2 days', '1 day')``,
    the hopping-window surface the tumbling query (q12) doesn't touch:
    every event lands in size/slide = 2 overlapping windows. Spark's
    window() generator expands each row into its containing windows
    before a plain partial+final aggregate — and DROPS null-timestamp
    rows (containment evaluates NULL); the DuckDB oracle states the
    same semantics explicitly as a union of the two day-shifted window
    starts with the same null filter. Streaming form is identical modulo readStream + watermark
    (q31 covers the streaming-equivalence claim for grouped time
    windows)."""
    ev = _t(spark, sf_dir, "events")
    win = F.window("ts", "2 days", "1 day")
    return (
        ev.groupBy(win.alias("_w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        )
        .select(F.col("_w.start").cast("date").alias("ws"), "n", "s")
        .orderBy("ws")
    )


Q70_SQL = """
WITH hops AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS ws, value
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS DATE) AS ws, value
  FROM events WHERE ts IS NOT NULL)
SELECT ws, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM hops GROUP BY ws ORDER BY ws
"""


# --- stream-stream join (attribution) --------------------------------------
def q71_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with watermarks — the attribution shape:
    purchases joined to the same user's clicks within [click, click+1d].
    Both sides are event-time-bounded (watermark + time-range join
    condition), which is exactly what lets Spark expire join state at
    scale: a click older than the watermark minus the range can never
    match again and is dropped. Run availableNow and aggregated to
    per-user pair counts; the batch oracle states the identical join.
    Timestamps are second-truncated on both sides (q58/q32 parity
    lesson) so the range boundary agrees with DuckDB exactly."""
    spark = _stream_session(spark)  # UTC/nanos confs + right-sized state partitions
    stream = _read_event_stream(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts")))
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_uid"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 day")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 day")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_uid") == F.col("p_uid"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 DAY")),
    )
    return (
        _run_stream_to_table(joined, "append", "q71", spark)
        .groupBy(F.col("c_uid").alias("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("user_id")
    )


Q71_SQL = """
WITH e AS (SELECT user_id, event_type, date_trunc('second', ts) AS ts FROM events)
SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (SELECT user_id, ts FROM e WHERE event_type = 'click') c
JOIN (SELECT user_id, ts FROM e WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 DAY
GROUP BY c.user_id ORDER BY c.user_id
"""


# --- rolling 7-day revenue (RANGE frame over event time) --------------------
def q82_rolling_revenue(spark, sf_dir):
    """Per-customer rolling 7-day revenue: a RANGE frame over calendar
    days (not ROWS — multiple orders on one day are frame peers and must
    all see the same rolling total; a gap in days must shrink the frame).
    The time axis is epoch-days so the numeric range frame is portable.
    One shuffle on o_custkey; the frame scan is linear per partition."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    days = F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("_d"))
        .rangeBetween(-6, 0)
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", days.alias("_d"),
            F.col("o_totalprice").cast(DEC).alias("_p"),
        )
        .select(
            "o_custkey", "o_orderkey", F.col("_d").cast("int").alias("epoch_day"),
            F.sum("_p").over(w).cast("double").alias("rolling_7d"),
        )
        .orderBy("o_custkey", "epoch_day", "o_orderkey")
    )


Q82_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT)
         AS epoch_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey
              ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
FROM orders WHERE o_custkey <= 50
ORDER BY o_custkey, epoch_day, o_orderkey
"""


# --- funnel analysis (ordered-stage conversion) -----------------------------
def q83_funnel(spark, sf_dir):
    """Three-stage funnel over the event stream: users who viewed, then
    clicked at-or-after their first view, then purchased at-or-after that
    first qualifying click. Stage anchors are first-occurrence
    timestamps, so each level is one aggregate over events joined to the
    previous level's per-user anchor; events is scanned once per stage
    with no self-join explosion. The anchors are user-cardinality — AQE
    broadcasts them when they fit and falls back to a shuffle join when
    the user space is too big to broadcast (the 100 TB case), so no
    forced-broadcast OOM. Output is the single funnel
    row a product-analytics dashboard renders."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # v and c are each consumed TWICE (the next level's join + their
    # own funnel count) — without the lazy checkpoints each reference
    # re-executes the whole upstream chain, so events was scanned 6x
    # (1 + 2 + 3) instead of once per stage. The materialized anchors
    # are user-cardinality (already the join-side size the plan
    # carries); the checkpoint rides the first consumer's job.
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("_vt")
    ).localCheckpoint(eager=False)
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("_vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_ct"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("_ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase")))
    )


Q83_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS vt FROM events WHERE event_type = 'view'
  GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS ct
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.vt
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS pt
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.ct
  GROUP BY e.user_id)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase
"""


# --- stream-static enrichment join ------------------------------------------
def q84_stream_enrich(spark, sf_dir):
    """Stream-static dimension enrichment: the event stream joined per
    micro-batch to a static customer dimension (user_id -> market
    segment) and aggregated per segment. The dim side is broadcast into
    every micro-batch — the canonical pattern for enriching a 100 TB/day
    CDC stream against slowly-changing dimensions without shuffling the
    stream. Oracle = the equivalent batch join; equality is Structured
    Streaming's batch/stream consistency contract."""
    seg = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    spark = _stream_session(spark)  # UTC/nanos confs + right-sized state partitions
    agg = (
        _read_event_stream(spark, sf_dir)
        .join(seg, "user_id")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        )
    )
    return _run_stream_to_table(agg, "complete", "q84", spark).orderBy("segment")


Q84_SQL = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY segment
"""


# --- calendar gap-fill + forward-fill ------------------------------------
def q91_gapfill_ffill(spark, sf_dir):
    """Time-series gap-filling: densify each user's activity onto a
    per-user daily calendar spine and forward-fill the last observed
    value (the standard prep step for training on regularly-sampled
    series). Spark has no generate_series table function at the SQL
    surface; `sequence()` + explode builds the spine from each user's
    own [min,max] range, so spine size is sum-of-user-spans, never
    |users| x |global days| — at 100 TB the spine is generated
    executor-side from the tiny bounds aggregate and never hits the
    driver. The fill is last(ignorenulls) over (user, day): one shuffle
    shared with the spine join. Daily value folds through DECIMAL so
    MAX is exact; forward-fill copies values, introducing no float ops."""
    ev = _t(spark, sf_dir, "events")
    # daily is consumed twice (the bounds->spine branch and the fill
    # join); the spine side sits under a BroadcastExchange, so exchange
    # reuse does not unify them and each reference re-runs the full
    # events scan + aggregate on a wide input — see _mat_multiref.
    daily = _mat_multiref(
        spark,
        ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
            F.max(F.col("value").cast(DEC)).alias("v")
        ),
        sf_dir,
        "events",
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d"),
    )
    w = W.partitionBy("user_id").orderBy("d")
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .withColumn("v_fill", F.last("v", ignorenulls=True).over(w))
        .select("user_id", "d", F.col("v_fill").cast("double").alias("v"))
        .orderBy("user_id", "d")
    )


Q91_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         MAX(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2),
bounds AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds)
SELECT s.user_id, s.d,
       CAST(LAST_VALUE(dy.v IGNORE NULLS)
              OVER (PARTITION BY s.user_id ORDER BY s.d) AS DOUBLE) AS v
FROM spine s LEFT JOIN daily dy ON s.user_id = dy.user_id AND s.d = dy.d
ORDER BY s.user_id, s.d
"""


# --- cohort retention ------------------------------------------------------
def q92_cohort_retention(spark, sf_dir):
    """Classic cohort-retention matrix: users bucketed by their first
    activity day, retention counted as distinct active users per
    (cohort, week-offset). The first-touch anchor is a per-user MIN
    (map-side partial), re-joined to the distinct (user, day) activity
    set; offset arithmetic is integer day-diff div 7, exact in both
    engines."""
    ev = _t(spark, sf_dir, "events")
    # active is consumed twice (the first-touch anchor and the join's
    # probe side); the anchor ends up broadcast, so exchange reuse does
    # not unify them and events is scanned twice on a wide input — the
    # compact distinct (user, day) set feeds both via _mat_multiref.
    active = _mat_multiref(
        spark,
        ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct(),
        sf_dir,
        "events",
    )
    firsts = active.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        active.join(firsts, "user_id")
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(d, cohort_day) DIV 7 AS INT)"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "week_offset")
    )


Q92_SQL = """
WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, MIN(d) AS cohort_day FROM active GROUP BY 1)
SELECT cohort_day,
       CAST((a.d - f.cohort_day) // 7 AS INTEGER) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN firsts f ON a.user_id = f.user_id
GROUP BY cohort_day, week_offset
ORDER BY cohort_day, week_offset
"""


# --- event-sequence transition mining --------------------------------------
def q93_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts over each user's event
    sequence: lag(event_type) within (user ORDER BY ts, event_id),
    then count + in-row probability per source state. Sequence mining
    at scale is exactly this shape — one shuffle to order each user's
    history, aggregates on top. The probability is a single division
    of two exact BIGINTs cast to double, deterministic across engines."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = W.partitionBy("prev_type")
    return (
        trans.withColumn(
            "p",
            F.col("n").cast("double") / F.sum("n").over(wp).cast("double"),
        )
        .select("prev_type", "next_type", "n", "p")
        .orderBy("prev_type", "next_type")
    )


Q93_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
trans AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE)
         AS p
FROM trans ORDER BY prev_type, next_type
"""


# --- distributed least-squares trend ---------------------------------------
def q94_revenue_trend(spark, sf_dir):
    """Per-nation revenue-over-time linear regression computed from
    sufficient statistics: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2).
    The five sums are a single groupBy pass (map-side partial agg — at
    100 TB this is the only way to fit a regression without iterating),
    folded exactly: x is epoch-day BIGINT, y folds as DECIMAL, x*y as
    DECIMAL product. The closing arithmetic casts the exact sums to
    double and combines them with IEEE mul/sub/div — identical inputs
    and identical well-defined ops, so both engines produce the same
    bits without any decimal-width gymnastics. regr_slope() would NOT
    be portable: its internal accumulation order differs per engine."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    x = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    y = F.col("o_totalprice").cast("decimal(12,2)")
    stats = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast("bigint")).alias("sx"),
            F.sum(x.cast("bigint") * x.cast("bigint")).alias("sxx"),
            F.sum(y).alias("sy"),
            F.sum(x.cast("decimal(12,0)") * y).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return (
        stats.select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_orders"),
            slope.alias("slope"),
        )
        .orderBy("nation")
    )


Q94_SQL = """
WITH stats AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS sx,
         CAST(SUM(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) *
                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT))
              AS BIGINT) AS sxx,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sy,
         SUM(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS DECIMAL(12,0)) *
             CAST(o_totalprice AS DECIMAL(12,2))) AS sxy
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name)
SELECT n_name AS nation, n AS n_orders,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
FROM stats ORDER BY nation
"""




def q106_salted_hot_key(spark, sf_dir):
    """The skew-mitigation aggregates (operators.skew) on the graded
    surface: two-phase salted count+sum over a power-law-ish key. The
    salt is internal — phase 2 folds it away, so the result equals the
    plain GROUP BY bit-for-bit (sums fold in DECIMAL for order-freedom)
    while one hot key's rows spread over salt_buckets reducers instead
    of one."""
    from synch_spark.operators.skew import salted_count, salted_sum

    ev = _t(spark, sf_dir, "events")
    cnt = salted_count(ev, ["user_id"], salt_buckets=16)
    # decimal-fold inside the salted two-phase sum: cast value up front
    sums = salted_sum(
        ev.withColumn("value", F.col("value").cast(DEC)), ["user_id"], "value",
        salt_buckets=16,
    )
    return (
        cnt.join(sums, "user_id")
        .select(
            "user_id", "n", F.col("sum_value").cast("double").alias("sum_value")
        )
        .orderBy("user_id")
    )


Q106_SQL = """
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def q107_skew_join_enrich(spark, sf_dir):
    """replicated_skew_join on the graded surface: enrich every event
    with its user's first-seen timestamp via a salted equi-join (big
    side salted, small side replicated per salt — one hot user's events
    spread over salt_buckets reducers). Result must equal the plain
    join exactly."""
    from synch_spark.operators.skew import replicated_skew_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = replicated_skew_join(
        ev.select("user_id", "event_type", "ts"), dim, ["user_id"],
        salt_buckets=8,
    )
    return (
        joined.groupBy("user_id", "first_ts")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("ts") == F.col("first_ts")).cast("int"))
            .cast("bigint").alias("n_at_first"),
        )
        .orderBy("user_id")
    )


Q107_SQL = """
WITH dim AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
SELECT e.user_id, d.first_ts,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN e.ts = d.first_ts THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_first
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.user_id, d.first_ts ORDER BY e.user_id
"""


ADVANCED_QUERIES = {
    "q26_asof_join": (q26_asof_join, Q26_SQL),
    "q27_sessionize": (q27_sessionize, Q27_SQL),
    "q28_pivot": (q28_pivot, Q28_SQL),
    "q29_rollup": (q29_rollup, Q29_SQL),
    "q30_percentiles": (q30_percentiles, Q30_SQL),
    "q31_streaming_tumbling": (q31_streaming_tumbling, Q31_SQL),
    "q32_range_join": (q32_range_join, Q32_SQL),
    "q33_cube": (q33_cube, Q33_SQL),
    "q34_approx_sketches": (q34_approx_sketches, Q34_SQL),
    "q35_streaming_first_per_key": (q35_streaming_first_per_key, Q35_SQL),
    "q58_streaming_sessions": (q58_streaming_sessions, Q58_SQL),
    "q102_streaming_dedup": (q102_streaming_dedup, Q102_SQL),
    "q106_salted_hot_key": (q106_salted_hot_key, Q106_SQL),
    "q107_skew_join_enrich": (q107_skew_join_enrich, Q107_SQL),
    "q59_json_props": (q59_json_props, Q59_SQL),
    "q45_window_zoo": (q45_window_zoo, Q45_SQL),
    "q46_scalar_zoo": (q46_scalar_zoo, Q46_SQL),
    "q70_sliding_window": (q70_sliding_window, Q70_SQL),
    "q71_stream_stream_join": (q71_stream_stream_join, Q71_SQL),
    "q82_rolling_revenue": (q82_rolling_revenue, Q82_SQL),
    "q83_funnel": (q83_funnel, Q83_SQL),
    "q84_stream_enrich": (q84_stream_enrich, Q84_SQL),
    "q91_gapfill_ffill": (q91_gapfill_ffill, Q91_SQL),
    "q92_cohort_retention": (q92_cohort_retention, Q92_SQL),
    "q93_transition_matrix": (q93_transition_matrix, Q93_SQL),
    "q94_revenue_trend": (q94_revenue_trend, Q94_SQL),
}
