"""Master query registry: name -> (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from synch_spark.plans.relational import RELATIONAL_QUERIES

ALL_QUERIES: dict = {}
ALL_QUERIES.update(RELATIONAL_QUERIES)

try:  # text/dedup/similarity operators land incrementally
    from synch_spark.plans.dataops import DATAOPS_QUERIES

    ALL_QUERIES.update(DATAOPS_QUERIES)
except ImportError:
    pass

try:
    from synch_spark.plans.advanced import ADVANCED_QUERIES

    ALL_QUERIES.update(ADVANCED_QUERIES)
except ImportError:
    pass

try:
    from synch_spark.plans.tpch import TPCH_QUERIES

    ALL_QUERIES.update(TPCH_QUERIES)
except ImportError:
    pass

# no optional dependency in the hygiene surface — a broken import must
# fail loudly, not silently shrink the graded registry
from synch_spark.plans.hygiene import HYGIENE_QUERIES

ALL_QUERIES.update(HYGIENE_QUERIES)
