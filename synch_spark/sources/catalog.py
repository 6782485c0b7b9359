"""Primary-key discovery from source catalogs (S7).

Parity: the reference asks the source database for each table's pk at
producer startup — MySQL via information_schema
(/root/reference/synch/reader/mysql.py:60-73) and Postgres via
pg_index/pg_attribute (/root/reference/synch/reader/postgres.py:59-66).
Two reference bugs are fixed rather than mirrored:

- MySQL composite pks come back in *catalog* order there (no ORDER BY);
  here the query orders by ORDINAL_POSITION, so a composite key's
  column order matches the table definition.
- Postgres `ret[0][0]` silently truncates a composite pk to its first
  column; here every index column is returned, ordered by its position
  in ``indkey``.

Split for testability: ``pk_query`` builds the dialect SQL (pure), the
shared ``pk_from_catalog`` extracts the ordered tuple from ANY frame
shaped like the catalog result — the JDBC path feeds it the pushed-down
query result, tests feed it a parquet-backed fixture. ``resolve_pks``
applies discovery to a SyncConfig with explicit-config precedence
(a configured ``pk:`` always wins, matching the reference where config
does not override discovery only because it has no such key at all).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from synch_spark.config import SyncConfig


def pk_query(dialect: str, schema: str, table: str) -> str:
    """Dialect catalog query returning (column_name, ordinal_position)
    rows for the table's primary key, ordered by key position."""
    if "'" in schema + table or "\\" in schema + table:
        raise ValueError(f"invalid identifier: {schema}.{table}")
    if dialect == "mysql":
        # KEY_COLUMN_USAGE carries the key ORDER; the reference's
        # COLUMNS/COLUMN_KEY='PRI' query loses it for composite pks
        return (
            "SELECT COLUMN_NAME AS column_name, "
            "ORDINAL_POSITION AS ordinal_position "
            "FROM information_schema.KEY_COLUMN_USAGE "
            f"WHERE TABLE_SCHEMA = '{schema}' AND TABLE_NAME = '{table}' "
            "AND CONSTRAINT_NAME = 'PRIMARY' ORDER BY ORDINAL_POSITION"
        )
    if dialect == "postgres":
        # a.attnum = ANY(indkey) alone loses the key order; array_position
        # over indkey recovers it (ref postgres.py:59-66 also truncates
        # composites via ret[0][0]).
        # - <= indnkeyatts: PRIMARY KEY ... INCLUDE (payload) stores the
        #   covering columns in indkey too — they are NOT key columns,
        #   and treating them as pk makes every payload update look like
        #   a key change (old row never superseded).
        # - to_regclass + quoted identifiers: '%s.%s'::regclass folds
        #   case (breaking "Orders") and ERRORS on a missing table;
        #   to_regclass('"s"."t"') resolves exactly and returns NULL
        #   (no rows -> the documented empty-pk path) when absent.
        return (
            "SELECT a.attname AS column_name, "
            "array_position(i.indkey, a.attnum) AS ordinal_position "
            "FROM pg_index i "
            "JOIN pg_attribute a ON a.attrelid = i.indrelid "
            "AND a.attnum = ANY (i.indkey) "
            f"WHERE i.indrelid = to_regclass('\"{schema}\".\"{table}\"') "
            "AND i.indisprimary "
            "AND array_position(i.indkey, a.attnum) <= i.indnkeyatts "
            "ORDER BY ordinal_position"
        )
    raise ValueError(f"unsupported dialect: {dialect!r}")


def pk_from_catalog(catalog: DataFrame) -> tuple[str, ...]:
    """Ordered pk tuple from a (column_name, ordinal_position) frame.
    Empty tuple when the table has no primary key (the engine then runs
    the no-pk path: append-only inserts, ref etl.py:33-35)."""
    rows = catalog.select("column_name", "ordinal_position").collect()
    rows.sort(key=lambda r: r["ordinal_position"])
    return tuple(r["column_name"] for r in rows)


def discover_pk(
    spark: SparkSession,
    url: str,
    dialect: str,
    schema: str,
    table: str,
    **jdbc_options,
) -> tuple[str, ...]:
    """Live JDBC discovery: push the catalog query to the source (a
    handful of rows — runs as a single tiny task) and extract the tuple."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", pk_query(dialect, schema, table))
    )
    for k, v in jdbc_options.items():
        reader = reader.option(k, v)
    return pk_from_catalog(reader.load())


def resolve_pks(
    cfg: SyncConfig,
    discover: Callable[[str, str], tuple[str, ...]],
) -> dict[str, tuple[str, ...]]:
    """Fill every TableSpec with an empty pk via ``discover(schema,
    table)``; an explicitly configured pk is never overridden. Returns
    {qualified_name: discovered_pk} for the tables that were filled."""
    filled: dict[str, tuple[str, ...]] = {}
    for name, spec in cfg.tables.items():
        if spec.has_pk:
            continue
        pk = tuple(discover(spec.schema, spec.table))
        if pk:
            spec.pk = pk
            filled[name] = pk
    return filled
