"""Property test: metadata-only DDL evolution is read-equivalent to the
full-rewrite path for ANY legal sequence of ALTER operations.

For a random op sequence, two tables start from the same data:
- table M applies each op metadata-only when evolve_schema allows it
  (hard links + schema doc), falling back to rewrite exactly like the
  streaming DDL channel does;
- table R always rewrites (overwrite + apply_alter) — the round-1
  semantics, trivially correct by construction.
After every op the two reads must be row- and schema-identical. Between
ops, fresh rows are appended to M (post-DDL generations) and R gets the
equivalent rows through its own path, so the mixed-generation file
layout — the thing reconciliation exists for — is actually present.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from synch_spark.ddl import apply_alter, parse_alter
from synch_spark.sources.schema_evolution import TableSchema, evolve_schema
from synch_spark.sources.table import ParquetTable

# op templates over a fixed column universe; {i} is the op index so
# added names never collide with each other
OPS = [
    "add column extra{i} varchar(8)",
    "add column num{i} int default '7'",
    "change column name title varchar(32)",
    "change column title name varchar(32)",
    "modify column v bigint",          # widening only when v is int
    "modify column v int",             # narrowing after widen -> rewrite
    "drop column tag",
    "add column tag varchar(8)",       # re-add after drop -> rewrite
]


def _base_df(spark, start, n=20):
    return spark.createDataFrame(
        [(start + j, f"n{start + j}", j, f"t{j % 3}") for j in range(n)],
        "id long, name string, v int, tag string",
    )


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(st.sampled_from(range(len(OPS))), min_size=1, max_size=4))
@pytest.mark.slow
def test_metadata_path_read_equals_rewrite_path(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("sev")
    m = ParquetTable(spark, str(root / "m"))
    r = ParquetTable(spark, str(root / "r"))
    df0 = _base_df(spark, 0)
    m.overwrite(df0.repartition(2))
    r.overwrite(df0.repartition(2))

    for step, op_i in enumerate(ops):
        sql = f"alter table db.t {OPS[op_i].format(i=step)}"
        try:
            parsed = parse_alter(sql)
        except ValueError:
            continue
        # skip ops that don't apply to the current schema (e.g. rename of
        # a column that doesn't exist right now) on BOTH paths alike
        cur_cols = set(m.read().columns)
        if parsed[0].action != "add_column" and parsed[0].column not in cur_cols:
            continue
        if parsed[0].action == "add_column" and parsed[0].column in cur_cols:
            continue

        # path M: metadata-only when legal (the streaming DDL logic)
        ts = m.schema_spec() or TableSchema.from_struct(m.read().schema)
        evolved, reasons = evolve_schema(ts, parsed)
        if reasons:
            plan = apply_alter(m.read(), parsed)
            m.overwrite(plan)
        else:
            m.commit_schema(evolved)
        # path R: always rewrite
        r.overwrite(apply_alter(r.read(), parsed))

        # post-DDL appends so M accumulates mixed-generation files
        fresh = _base_df(spark, 1000 * (step + 1), n=5)
        out_cols = r.read().columns
        fresh_evolved = fresh
        for c in out_cols:
            if c not in fresh.columns:
                dt = dict(r.read().dtypes)[c]
                fresh_evolved = fresh_evolved.withColumn(c, F.lit(None).cast(dt))
        fresh_evolved = fresh_evolved.select(
            *[F.col(c).cast(dict(r.read().dtypes)[c]) if c in fresh_evolved.columns
              else F.lit(None) for c in out_cols]
        )
        m.append(fresh_evolved)
        r.append(fresh_evolved)

        got_m = m.read()
        got_r = r.read()
        assert dict(got_m.dtypes) == dict(got_r.dtypes), (
            f"schema diverged after {sql}: {got_m.dtypes} vs {got_r.dtypes}"
        )
        rows_m = sorted(
            [tuple(row[c] for c in sorted(got_m.columns)) for row in got_m.collect()]
        )
        rows_r = sorted(
            [tuple(row[c] for c in sorted(got_r.columns)) for row in got_r.collect()]
        )
        assert rows_m == rows_r, f"data diverged after {sql}"
