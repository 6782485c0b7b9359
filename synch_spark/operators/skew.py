"""Skew mitigation utilities for hot keys.

AQE's skew-join splitting handles most cases at runtime; explicit
salting is for the aggregations/windows AQE can't split (e.g. the CDC
compaction window when one pk dominates a batch, or a groupBy on a
power-law key). Pattern: two-phase aggregate over a salted key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _guard_salt(*dfs: DataFrame) -> None:
    """'_salt' is the internal working column of every operator here; a
    caller whose input already carries one (e.g. an upstream salting
    stage that never dropped it) would have it silently overwritten by
    rand() and then removed from the output — data loss. Refuse."""
    for df in dfs:
        if "_salt" in df.columns:
            raise ValueError(
                "input already has a '_salt' column — rename or drop it; "
                "'_salt' is reserved by the skew operators"
            )


def salted_count(df: DataFrame, key_cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """groupBy(key).count() resilient to hot keys: phase 1 aggregates
    (key, salt) partitions, phase 2 combines the (tiny) per-salt partials.
    The heavy shuffle carries at most ``salt_buckets`` rows per hot key
    per phase-1 reducer instead of all its rows on one reducer."""
    _guard_salt(df)
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return phase1.groupBy(*key_cols).agg(F.sum("_c").cast("bigint").alias("n"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, salt_buckets: int = 16
) -> DataFrame:
    _guard_salt(df)
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(F.sum(value_col).alias("_s"))
    return phase1.groupBy(*key_cols).agg(F.sum("_s").alias(f"sum_{value_col}"))


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys when the small side is too large
    to broadcast and AQE's skew splitting doesn't apply (e.g. the skewed
    side feeds a window, or the join is inside a cached subtree).

    The big side gets a random salt in [0, salt_buckets); the small side
    is REPLICATED once per salt value (explode of a literal range — rows
    multiply by salt_buckets, which is why the small side must be the
    small one); the join key becomes (key..., salt), so one hot key's
    rows spread over ``salt_buckets`` reducers instead of one. Result
    set is identical to the unsalted join.

    Supports 'inner' and 'left' (left-outer preserves exactly one copy
    of unmatched big rows because each big row carries ONE salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"replicated_skew_join supports inner/left, got {how}")
    _guard_salt(big, small)
    b = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")
