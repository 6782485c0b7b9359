"""Range join: pairs within a time/value distance, bucket-blocked.

Spark has no native range join (DuckDB's inequality join is the oracle).
The scalable plan: quantize the range key into buckets of width = the
range bound, equi-join on bucket (each left row probes its own and the
adjacent bucket), then apply the exact predicate. Candidate cost is
O(rows per bucket^2 * buckets) instead of O(n^2) — the standard
interval-join strategy (same shape Flink/interval joins use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_s: int,
    extra_cond=None,
) -> DataFrame:
    """All (left, right) pairs within ``max_gap_s`` WHOLE SECONDS:
    the gap test is |floor(left_ts) - floor(right_ts)| <= max_gap_s on
    second-truncated timestamps (unix_timestamp drops sub-second
    precision). Whole-second semantics are deliberate, not an
    accident: they are what a SQL oracle's date_diff('second', ...)
    computes, so stream and batch agree exactly (the q27/q58 lesson) —
    but callers with sub-second data should know a pair can be up to
    max_gap_s + 0.999s apart by exact wall time.

    Bucket width = max_gap_s: a match can only live in the same or an
    adjacent bucket of the left row, so each left row is exploded into 3
    bucket probes and joined by equality. ``max_gap_s`` must be >= 1
    (a zero width would divide the bucket key by zero); for
    "same truncated second" pass 1 with an extra equality condition.
    """
    if max_gap_s < 1:
        raise ValueError(
            f"time_range_join: max_gap_s must be >= 1 second "
            f"(got {max_gap_s}); whole-second bucketing cannot express "
            "a sub-second gap"
        )
    for side, name in ((left, "left"), (right, "right")):
        if "_b" in side.columns:
            raise ValueError(
                f"time_range_join: {name} input already has a '_b' "
                "column — rename it; '_b' is the internal bucket key"
            )
    lb = (F.unix_timestamp(F.col(left_ts)) / max_gap_s).cast("long")
    l = left.withColumn(
        "_b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r = right.withColumn("_b", (F.unix_timestamp(F.col(right_ts)) / max_gap_s).cast("long"))
    joined = l.join(r, "_b").where(
        F.abs(F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts)))
        <= max_gap_s
    )
    if extra_cond is not None:
        joined = joined.where(extra_cond)
    return joined.drop("_b")
