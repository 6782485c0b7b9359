"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in synch_spark/plans/; this module only assembles
the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# robust against being imported by file path from a different cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-family
    grouped aggregation (DQ7) over the replicated lineitem table."""
    from synch_spark.plans.relational import q07_groupby_agg

    return q07_groupby_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from synch_spark.plans import registry

    return {name: fn for name, (fn, _sql) in registry.ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from synch_spark.plans import registry

    return {
        name: sql for name, (_fn, sql) in registry.ALL_QUERIES.items() if sql is not None
    }
