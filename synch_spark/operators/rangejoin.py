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
    """All (left, right) pairs with |left_ts - right_ts| <= max_gap_s.

    Bucket width = max_gap_s: a match can only live in the same or an
    adjacent bucket of the left row, so each left row is exploded into 3
    bucket probes and joined by equality.
    """
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
