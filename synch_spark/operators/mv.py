"""Incremental materialized-view maintenance under CDC.

The reference outsources aggregate maintenance to ClickHouse's
Summing/AggregatingMergeTree family (siblings of the engines it creates,
`/root/reference/synch/enums.py:14-18`): deltas are appended and the
engine folds them at merge/read time. Here the same contract is native:
an aggregate view (group keys -> count + sums) is maintained from CDC
event batches WITHOUT recomputing over the base table — each batch
contributes signed deltas (+1/insert, -1/delete; updates arrive already
split by the event IR), and merging a delta into the view is one
groupBy over (view ∪ delta), which Spark executes with map-side partial
aggregation and a shuffle proportional to |delta| + |affected groups|,
not the base table size. At 100 TB of base data with a bounded group
space this is the only affordable refresh strategy.

Distributive aggregates only (count, sum — min/max are NOT incrementally
maintainable under deletes without keeping per-group multisets; avg
derives as sum/count at read time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEC = "decimal(18,2)"


def delta_aggregate(
    batch: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    sign: Column,
) -> DataFrame:
    """Collapse one CDC batch into signed per-group deltas.

    `sign` is +1 for inserts and -1 for deletes (the T6 annotation,
    reference `synch/writer/collapsing_merge_tree.py:47-56`). Output
    schema: group_cols + n_delta + <c>_delta for each sum column.
    """
    aggs = [F.sum(sign).cast("bigint").alias("n_delta")] + [
        F.sum(F.col(c).cast(DEC) * sign.cast(DEC)).alias(f"{c}_delta")
        for c in sum_cols
    ]
    return batch.groupBy(*group_cols).agg(*aggs)


def merge_delta(
    view: DataFrame | None,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Fold a delta frame into the current view state (view may be None
    on first refresh). Groups whose net count reaches 0 are dropped —
    fully-deleted keys must not linger as zero rows (the analog of a
    collapsed pair vanishing at ClickHouse merge time)."""
    if view is not None:
        delta = view.unionByName(delta)
    merged = delta.groupBy(*group_cols).agg(
        F.sum("n_delta").cast("bigint").alias("n_delta"),
        *[F.sum(f"{c}_delta").alias(f"{c}_delta") for c in sum_cols],
    )
    return merged.filter(F.col("n_delta") != 0)


def read_view(view: DataFrame, sum_cols: list[str]) -> DataFrame:
    """Read-time projection: expose count and sums under stable names
    (n, <c>_sum). Derived averages belong here, not in the state."""
    return view.select(
        *[c for c in view.columns if not (c == "n_delta" or c.endswith("_delta"))],
        F.col("n_delta").alias("n"),
        *[F.col(f"{c}_delta").alias(f"{c}_sum") for c in sum_cols],
    )
