"""Configuration model: table specs, engine enums, YAML-compatible settings.

Parity: the reference declares replicated tables in `synch.yaml`
(/root/reference/synch.yaml:22-75, accessors
/root/reference/synch/settings.py:33-95) with per-table metadata
`clickhouse_engine, sign_column, version_column, partition_by,
engine_settings, skip_decimal, auto_full_etl`, and global skip lists
`skip_dmls, skip_delete_tables, skip_update_tables`. We keep the same
shape as plain dataclasses; the engine enum mirrors
/root/reference/synch/enums.py:14-18.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any

#: Canonical name of the per-event wire-order column. Defined HERE (the
#: one stdlib-only module every layer already depends on) so both the
#: Spark side (events.py re-exports it) and the pure-Python protocol
#: decoders (pgoutput.py) share ONE definition — a rename can never
#: silently de-synchronize a stray string literal. Semantics are
#: documented at events.WIRE_SEQ_COL, the public access point.
WIRE_SEQ_COL = "_wire_seq"


class Engine(str, enum.Enum):
    """Target-table merge semantics (ClickHouse MergeTree family, natively ours)."""

    MERGE_TREE = "merge_tree"
    REPLACING_MERGE_TREE = "replacing_merge_tree"  # reference default
    COLLAPSING_MERGE_TREE = "collapsing_merge_tree"
    VERSIONED_COLLAPSING_MERGE_TREE = "versioned_collapsing_merge_tree"


class BrokerType(str, enum.Enum):
    REDIS = "redis"  # reference-only; we map both onto file/kafka streams
    KAFKA = "kafka"


class SourceDatabase(str, enum.Enum):
    MYSQL = "mysql"
    POSTGRES = "postgres"


@dataclass
class TableSpec:
    """Everything the engine needs to know about one replicated table.

    Parity: per-table YAML block /root/reference/synch.yaml:43-57 plus the
    discovered primary key (/root/reference/synch/reader/__init__.py:43-45 —
    pk may be absent, single, or composite).
    """

    schema: str
    table: str
    pk: tuple[str, ...] = ()
    engine: Engine = Engine.REPLACING_MERGE_TREE
    sign_column: str = "sign"
    version_column: str = "version"
    partition_by: str | None = None  # column name; date cols partition by yyyyMM
    engine_settings: str | None = None
    auto_full_etl: bool = True
    skip_decimal: bool = False  # reference wart; native DecimalType makes it a no-op
    retain: int = 2  # time-travel window in versions (ParquetTable retain)

    @property
    def qualified_name(self) -> str:
        return f"{self.schema}.{self.table}"

    @property
    def has_pk(self) -> bool:
        return len(self.pk) > 0


@dataclass
class SyncConfig:
    """Global knobs mirroring the reference's `core` + skip lists.

    insert_num/insert_interval (/root/reference/synch.yaml:3-4) map to
    Structured Streaming maxOffsetsPerTrigger / ProcessingTime trigger.
    """

    insert_num: int = 20000
    insert_interval_s: int = 60
    skip_dmls: tuple[str, ...] = ()  # subset of {"delete", "update"}
    skip_delete_tables: tuple[str, ...] = ()  # "schema.table" names
    skip_update_tables: tuple[str, ...] = ()
    tables: dict[str, TableSpec] = field(default_factory=dict)

    def add_table(self, spec: TableSpec) -> None:
        self.tables[spec.qualified_name] = spec


# the reference's synch.yaml writes CamelCase engine names
# (synch/enums.py ClickHouseEngine: 'ReplacingMergeTree', ...); this
# repo's snake_case values are the Engine enum's own. A carried-over
# config must parse without edits, so both dialects are accepted.
_ENGINE_ALIASES = {
    "MergeTree": Engine.MERGE_TREE,
    "ReplacingMergeTree": Engine.REPLACING_MERGE_TREE,
    "CollapsingMergeTree": Engine.COLLAPSING_MERGE_TREE,
    "VersionedCollapsingMergeTree": Engine.VERSIONED_COLLAPSING_MERGE_TREE,
}


def _engine(value: str) -> Engine:
    return _ENGINE_ALIASES.get(value) or Engine(value)


def config_from_dict(raw: dict[str, Any]) -> SyncConfig:
    """Build SyncConfig from a synch.yaml-shaped dict (YAML already parsed)."""
    core = raw.get("core", {})
    cfg = SyncConfig(
        insert_num=int(core.get("insert_num", 20000)),
        insert_interval_s=int(core.get("insert_interval", 60)),
        skip_dmls=tuple(core.get("skip_dmls", []) or []),
        skip_delete_tables=tuple(core.get("skip_delete_tables", []) or []),
        skip_update_tables=tuple(core.get("skip_update_tables", []) or []),
    )
    for source in raw.get("source_dbs", []) or []:
        for db in source.get("databases", []) or []:
            schema = db.get("database")
            for tbl in db.get("tables", []) or []:
                cfg.add_table(
                    TableSpec(
                        schema=schema,
                        table=tbl["table"],
                        pk=tuple(tbl.get("pk", []) or []),
                        engine=_engine(tbl.get("clickhouse_engine",
                                               "replacing_merge_tree")),
                        sign_column=tbl.get("sign_column", "sign"),
                        version_column=tbl.get("version_column", "version"),
                        engine_settings=tbl.get("engine_settings"),
                        partition_by=tbl.get("partition_by"),
                        auto_full_etl=bool(tbl.get("auto_full_etl", True)),
                        skip_decimal=bool(tbl.get("skip_decimal", False)),
                        retain=int(tbl.get("retain", 2)),
                    )
                )
    return cfg
