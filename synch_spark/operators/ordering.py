"""Scalable global ordering primitives.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
entire input to ONE partition (Spark warns `No Partition Defined for
Window operation`) — a non-starter at 100 TB. These helpers compute the
same total ordering distributively:

1. ``repartitionByRange`` on the sort keys — Spark samples the keys and
   builds balanced range bounds, so the sort is spread over N partitions;
2. ``sortWithinPartitions`` — partition-local sort, no further shuffle;
3. ``monotonically_increasing_id()`` — encodes ``(partition_id << 33) +
   local_row_index`` on the *sorted* rows, giving each row its exact
   in-partition position with zero additional shuffle;
4. one tiny per-partition-count aggregate (collected to the driver,
   |partitions| rows) turns local positions into exact global ranks.

The result is bit-identical to the single-partition window (the sort
keys must totally order the rows — pass a tiebreaker column), with
wall-clock bounded by the largest range bucket instead of |input|.

Reference parity note: the reference system (synch) has no ordering
operators at all — ordering there is ClickHouse's job (SURVEY §2.8);
these exist for the Spark-native analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTITION_SHIFT = 33  # monotonically_increasing_id puts pid in bits 33+
_SMALL_INPUT_BYTES = 256 << 20  # <= 256MB: a one-task window sort is cheaper


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's planning-time sizeInBytes for the frame; 2^63-ish
    (i.e. 'assume big') when statistics are unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — any py4j hiccup: take the safe path
        return 1 << 62


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    rn_col: str = "rn",
    num_partitions: int | None = None,
    small_bytes: int = _SMALL_INPUT_BYTES,
) -> DataFrame:
    """Add exact 1-based global ``rn_col`` ordered by ``order_cols``.

    ``order_cols`` must be a total order (include a unique tiebreaker);
    otherwise ties land in sampled-range order, which is still *a*
    row_number but not deterministic across runs.

    Size-adaptive (the AQE-broadcast idea): when Catalyst's planning-time
    size estimate says the input fits one task (<= ``_SMALL_INPUT_BYTES``),
    the plain window wins — one stage instead of the distributed path's
    four. The estimate is the optimizer statistic (file sizes for scans,
    propagated through projections), so no extra job runs to decide;
    if it's unavailable, assume big — the distributed path is always
    correct, just slower on tiny inputs.
    """
    if _estimated_bytes(df) <= small_bytes:
        from pyspark.sql import Window

        return df.withColumn(
            rn_col,
            F.row_number().over(Window.orderBy(*order_cols)).cast("bigint"),
        )
    return _distributed_row_number(df, order_cols, rn_col, num_partitions)[0]


def _distributed_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    rn_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """The distributed rank; returns ``(ranked_frame, total_rows)``.

    ``total_rows`` comes free from the per-partition counts the rank
    already collects — callers that also need COUNT(*) of the ranked
    frame (global_ntile's bucket boundaries) must NOT run a separate
    count job over it."""
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(nparts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    with_mid = ordered.withColumn("_mid", F.monotonically_increasing_id()).withColumn(
        "_pid", F.shiftright("_mid", _PARTITION_SHIFT)
    )
    # materialize ONCE (local checkpoint): the per-partition counts
    # job and the main job must see the same partition layout
    # (repartitionByRange samples -> nondeterministic bounds across
    # recomputes). Lazy: the counts collect right below is always the
    # first consumer, so materialization rides that job instead of
    # paying a dedicated job + scheduler barrier; every later consumer
    # reads the pinned blocks. Checkpoint blocks are freed by the
    # ContextCleaner when the returned frame is garbage collected —
    # unlike session-held .persist() entries, which would pin a full
    # input copy per call for the session's lifetime.
    with_mid = with_mid.localCheckpoint(eager=False)
    counts = (
        with_mid.groupBy("_pid").count().orderBy("_pid").collect()
    )  # |partitions| rows — driver-safe at any data scale
    rows, acc = [], 0
    for row in counts:
        rows.append((row["_pid"], acc))
        acc += row["count"]
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(rows or [(0, 0)], "_pid bigint, _off bigint")
    local_pos = F.col("_mid") - F.shiftleft("_pid", _PARTITION_SHIFT)
    ranked = (
        with_mid.join(F.broadcast(offsets_df), "_pid", "left")
        .withColumn(
            rn_col,
            (F.coalesce(F.col("_off"), F.lit(0)) + local_pos + F.lit(1)).cast("bigint"),
        )
        .drop("_mid", "_pid", "_off")
    )
    return ranked, acc


def global_ntile(
    df: DataFrame,
    order_cols: list[Column | str],
    n: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
    small_bytes: int = _SMALL_INPUT_BYTES,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` without the
    single-partition window: global_row_number + the closed-form NTILE
    bucket function. NTILE semantics (SQL standard, matched by Spark and
    DuckDB): with N rows, ``r = N mod n`` leading buckets get
    ``ceil(N/n)`` rows, the rest get ``floor(N/n)``.

    Like the tiebreaker requirement on ``order_cols``, the input plan
    must be DETERMINISTIC on the small-input (plain window) path: the
    bucket boundaries come from a count of the ranked frame, and a
    later consumer re-executes that same lazy plan — sampling / LIMIT /
    non-deterministic filters can disagree between the two runs. On the
    distributed path the ranked frame is checkpoint-materialized, so the
    count is pinned to the exact rows the ranks were computed from.
    """
    if _estimated_bytes(df) <= small_bytes:
        ranked = global_row_number(
            df, order_cols, rn_col="_gnt_rn", small_bytes=small_bytes
        )
        # count the RANKED frame, not the input (a separate df.count()
        # would re-execute the input plan — wrong boundaries if that
        # plan is non-deterministic)
        total = ranked.count()
    else:
        # distributed path: the rank's per-partition counts already sum
        # to COUNT(*) of the checkpoint-pinned frame — consistent with
        # the ranks by construction, and no re-scan job
        ranked, total = _distributed_row_number(
            df, order_cols, "_gnt_rn", num_partitions
        )
    q, r = divmod(total, n)
    big = q + 1  # size of the first r buckets
    cutoff = r * big  # rows 1..cutoff live in the big buckets
    rn = F.col("_gnt_rn")
    if q == 0:
        # fewer rows than buckets: bucket == rn
        bucket = rn
    else:
        # integer ceil-div (DIV): exact at any rn magnitude, no double rounding
        bucket = F.when(
            rn <= F.lit(cutoff),
            F.expr(f"(_gnt_rn + {big - 1}) DIV {big}"),
        ).otherwise(F.lit(r) + F.expr(f"(_gnt_rn - {cutoff} + {q - 1}) DIV {q}"))
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("_gnt_rn")
