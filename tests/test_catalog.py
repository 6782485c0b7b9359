"""pk discovery (S7, sources.catalog) against a parquet-backed catalog
fixture — the container has no live MySQL/PG, so the shared extraction
path is driven by a frame shaped exactly like the catalog query result."""

from __future__ import annotations

import pytest

from synch_spark.config import SyncConfig, TableSpec
from synch_spark.sources.catalog import pk_from_catalog, pk_query, resolve_pks


def _catalog(spark, rows):
    return spark.createDataFrame(rows, "column_name string, ordinal_position int")


def test_single_pk(spark):
    assert pk_from_catalog(_catalog(spark, [("id", 1)])) == ("id",)


def test_composite_pk_preserves_key_order(spark):
    """The fix over the reference: composite keys come back in KEY order,
    not catalog/first-column order (ref mysql.py:60-73 has no ORDER BY;
    ref postgres.py:66 truncates to ret[0][0])."""
    cat = _catalog(spark, [("region", 2), ("order_id", 1), ("line", 3)])
    assert pk_from_catalog(cat) == ("order_id", "region", "line")


def test_missing_pk_is_empty(spark):
    assert pk_from_catalog(_catalog(spark, [])) == ()


def test_pk_query_dialects():
    q = pk_query("mysql", "db", "orders")
    assert "KEY_COLUMN_USAGE" in q and "ORDER BY ORDINAL_POSITION" in q
    assert "'db'" in q and "'orders'" in q
    q = pk_query("postgres", "db", "orders")
    assert "pg_index" in q and "indisprimary" in q and "array_position" in q
    with pytest.raises(ValueError):
        pk_query("oracle", "db", "t")
    with pytest.raises(ValueError):
        pk_query("mysql", "db", "t'; drop table x --")


def test_resolve_pks_config_precedence(spark):
    """Explicit config pk wins; empty-pk tables are filled; tables the
    catalog reports pk-less stay on the no-pk (append-only) path."""
    cfg = SyncConfig()
    cfg.add_table(TableSpec(schema="db", table="a", pk=("cfg_id",)))
    cfg.add_table(TableSpec(schema="db", table="b"))
    cfg.add_table(TableSpec(schema="db", table="c"))
    catalog = {
        ("db", "a"): ("discovered_id",),
        ("db", "b"): ("x", "y"),
        ("db", "c"): (),
    }
    filled = resolve_pks(cfg, lambda s, t: catalog[(s, t)])
    assert cfg.tables["db.a"].pk == ("cfg_id",)  # config wins
    assert cfg.tables["db.b"].pk == ("x", "y")
    assert cfg.tables["db.c"].pk == ()
    assert filled == {"db.b": ("x", "y")}
