"""MergeTree-family read semantics, implemented natively.

The reference outsources these to ClickHouse background merges + FINAL
reads (engines created in /root/reference/synch/writer/*.py, enum
/root/reference/synch/enums.py:14-18). Spark has no background merge, so
the semantics are *views*: pure DataFrame transforms applied at read
time (or eagerly at compaction time). SURVEY §2.7 Q1-Q4.

Scale notes: the window dedup shuffles once on the pk — at 100 TB that
is a single hash-partitioned exchange, skew-safe under AQE; when the
target table is bucketed by pk the exchange disappears entirely. The
collapsing aggregate is a partial-agg (map-side combine) groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from synch_spark.config import Engine, TableSpec


def replacing_view(
    df: DataFrame,
    pk: tuple[str, ...],
    version_column: str | None = None,
    tiebreakers: tuple[str, ...] = (),
) -> DataFrame:
    """Q2 ReplacingMergeTree: last-writer-wins per pk.

    Keeps the row with max(version) per pk (ClickHouse FINAL done
    eagerly); ``tiebreakers`` break version ties (e.g. event_unixtime,
    action_seq). Reference DDL: /root/reference/synch/writer/
    replacing_merge_tree.py:10-41.
    """
    order = []
    if version_column:
        order.append(F.col(version_column).desc())
    order += [F.col(c).desc() for c in tiebreakers]
    if not order:  # no version column: arbitrary-but-deterministic last
        order = [F.monotonically_increasing_id().desc()]
    w = W.partitionBy(*pk).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def collapsing_view(
    df: DataFrame,
    pk: tuple[str, ...],
    sign_column: str = "sign",
    version_column: str | None = None,
    order_column: str | None = None,
) -> DataFrame:
    """Q3/Q4 CollapsingMergeTree current-state view.

    +1/-1 rows with equal key cancel; surviving state = keys with net
    sign > 0, attributes from the latest +1 row. With ``version_column``
    (VersionedCollapsing) cancellation is per (pk, version) — same
    grouping with version folded into the latest-row ordering.
    Reference: /root/reference/synch/writer/collapsing_merge_tree.py:9-58,
    versioned_collapsing_merge_tree.py:10-31.
    """
    net = df.groupBy(*pk).agg(F.sum(sign_column).alias("_net")).filter(F.col("_net") > 0)
    order = []
    if version_column:
        order.append(F.col(version_column).desc())
    if order_column:
        order.append(F.col(order_column).desc())
    order.append(F.monotonically_increasing_id().desc())
    w = W.partitionBy(*pk).orderBy(*order)
    latest_pos = (
        df.filter(F.col(sign_column) > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # both sides are already hash-partitioned by pk; join is co-located
    return latest_pos.join(net.select(*pk), list(pk), "left_semi")


def collapse_aggregate(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    sign_column: str = "sign",
) -> DataFrame:
    """Q3 collapse-aware aggregation: sum(x*sign) / sum(sign) as count.

    The ClickHouse idiom for aggregating a collapsing table without
    FINAL — correct under pending cancellations, and in Spark a single
    partial-aggregated groupBy (no window, no join).
    """
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(value_col) * F.col(sign_column)).alias(f"sum_{value_col}"),
        F.sum(sign_column).alias("net_count"),
    )


def engine_view(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Dispatch to the read-semantics view for the table's engine."""
    if spec.engine == Engine.MERGE_TREE:
        return df  # plain table; deletes were applied physically
    if spec.engine == Engine.REPLACING_MERGE_TREE:
        version = spec.version_column if spec.version_column in df.columns else None
        tie = tuple(c for c in ("event_unixtime", "action_seq") if c in df.columns)
        return replacing_view(df, spec.pk, version, tie)
    if spec.engine == Engine.COLLAPSING_MERGE_TREE:
        return collapsing_view(df, spec.pk, spec.sign_column)
    if spec.engine == Engine.VERSIONED_COLLAPSING_MERGE_TREE:
        version = spec.version_column if spec.version_column in df.columns else None
        return collapsing_view(df, spec.pk, spec.sign_column, version)
    raise ValueError(f"unknown engine {spec.engine}")
