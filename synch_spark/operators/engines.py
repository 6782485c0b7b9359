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
    # final fallback must be genuinely deterministic: there is no
    # "latest" without a version, but the SAME query must return the
    # SAME survivor across runs, task retries, and AQE re-partitions —
    # monotonically_increasing_id depends on partition layout and would
    # not. to_json of the non-pk values is value-determined and handles
    # every type (maps are not directly orderable).
    order.append(_value_order(df, pk))
    w = W.partitionBy(*pk).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _value_order(df: DataFrame, pk: tuple[str, ...]):
    rest = [c for c in df.columns if c not in pk]
    if not rest:
        return F.lit(0)  # pk-only rows are identical: any winner is fine
    return F.to_json(F.struct(*[F.col(c) for c in rest])).desc()


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
    order.append(_value_order(df, pk))  # deterministic final tiebreak
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
    """Dispatch to the read-semantics view for the table's engine.

    Matches read_current_state exactly for every engine (it delegates
    here): the collapsing branches order by the stored
    ``_event_unixtime`` arrival column when present — without it, two
    entry points claiming the same semantics would disagree on which
    pending +1 row survives — and drop the internal sign/order columns
    from the result."""
    if spec.engine == Engine.MERGE_TREE:
        return df  # plain table; deletes were applied physically
    if spec.engine == Engine.REPLACING_MERGE_TREE:
        version = spec.version_column if spec.version_column in df.columns else None
        return replacing_view(df, spec.pk, version)
    if spec.engine in (Engine.COLLAPSING_MERGE_TREE,
                       Engine.VERSIONED_COLLAPSING_MERGE_TREE):
        version = (spec.version_column
                   if spec.engine == Engine.VERSIONED_COLLAPSING_MERGE_TREE
                   and spec.version_column in df.columns else None)
        order = ("_event_unixtime" if "_event_unixtime" in df.columns
                 else None)
        out = collapsing_view(df, spec.pk, spec.sign_column, version,
                              order_column=order)
        drop = [c for c in (spec.sign_column, "_event_unixtime")
                if c in out.columns]
        return out.drop(*drop)
    raise ValueError(f"unknown engine {spec.engine}")
