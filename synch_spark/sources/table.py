"""Versioned parquet table store — the engine's managed target table.

The reference writes into ClickHouse over TCP
(/root/reference/synch/writer/__init__.py:21-53). Our target is a
lakehouse-style parquet table with atomic version swap: each commit
writes a new ``v=<n>`` directory and flips a tiny ``_CURRENT`` pointer
file. That gives us what MERGE needs without Delta jars:

- readers never see partial writes (they resolve _CURRENT first);
- read-modify-write (anti-join + union overwrite) never clobbers the
  data it is reading (new version dir != old);
- append mode reuses the current dir (pure-insert fast path).

Scale notes: at 100 TB the overwrite path must not rewrite the full
table per micro-batch — ``overwrite_cow`` scopes rewrites to affected
partitions only (copy-on-write per partition, the Delta/Hudi CoW
strategy): the new version directory receives freshly-written files for
touched partitions and *hard links* to every untouched partition's
files, so an N-partition table with k touched partitions pays O(k)
write + O(N) metadata, not O(N) data rewrite. File-level (sub-partition)
min/max key pruning is the remaining lever, noted in PERF.md.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` using hard links (copy on EXDEV)."""
    os.makedirs(dst, exist_ok=True)
    for entry in os.scandir(src):
        d = os.path.join(dst, entry.name)
        if entry.is_dir():
            _link_tree(entry.path, d)
        else:
            try:
                os.link(entry.path, d)
            except OSError:
                shutil.copy2(entry.path, d)


def _partition_dir_value(dirname: str) -> str | None:
    """Decode ``col=escaped_value`` (Hive-style %XX escaping) -> value str."""
    raw = dirname.split("=", 1)[1]
    return None if raw == _HIVE_NULL else unquote(raw)


class ParquetTable:
    """A named, versioned parquet table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------
    def current_version(self) -> int:
        ptr = os.path.join(self.root, _CURRENT)
        if not os.path.exists(ptr):
            return -1
        with open(ptr) as f:
            return int(f.read().strip())

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"v={v}")

    def _commit(self, v: int) -> None:
        ptr = os.path.join(self.root, _CURRENT)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, ptr)  # atomic on POSIX
        # GC all but the previous version (kept for in-flight readers)
        for name in os.listdir(self.root):
            if name.startswith("v=") and int(name[2:]) < v - 1:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    @property
    def exists(self) -> bool:
        return self.current_version() >= 0

    # -- IO ------------------------------------------------------------------
    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        return self.spark.read.parquet(self._version_dir(v))

    def overwrite(self, df: DataFrame, partition_by: str | None = None) -> None:
        v = self.current_version() + 1
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(self._version_dir(v))
        self._commit(v)

    def overwrite_cow(
        self, df: DataFrame, partition_by: str, touched_values: list
    ) -> None:
        """Partition-level copy-on-write commit.

        ``df`` holds the complete new content of the *touched* partitions
        only (``touched_values`` — raw values, ``None`` for the Hive null
        partition). It is written as version v+1; every current-version
        partition directory whose value is NOT touched is hard-linked
        into v+1 unchanged. A touched partition that ends up with zero
        rows is naturally dropped (not written, not linked) — that is
        how a partition emptied by deletes disappears.

        This is the Delta/Hudi CoW strategy the reference outsources to
        ClickHouse background merges: at 100 TB a micro-batch touching k
        of N date partitions rewrites O(k) data, never O(N).
        """
        v_old = self.current_version()
        if v_old < 0:
            self.overwrite(df, partition_by)
            return
        v_new = v_old + 1
        new_dir = self._version_dir(v_new)
        df.write.mode("overwrite").partitionBy(partition_by).parquet(new_dir)
        touched = {None if v is None else str(v) for v in touched_values}
        prefix = f"{partition_by}="
        old_dir = self._version_dir(v_old)
        for name in os.listdir(old_dir):
            if not name.startswith(prefix):
                continue
            if _partition_dir_value(name) in touched:
                continue
            _link_tree(os.path.join(old_dir, name), os.path.join(new_dir, name))
        self._commit(v_new)

    def append(self, df: DataFrame, partition_by: str | None = None) -> None:
        """Pure-insert fast path: append files into the current version dir.

        Parquet appends are additive files — safe for concurrent readers
        of the same version. Used by the collapsing engines' append-only
        write strategy (/root/reference/synch/writer/
        collapsing_merge_tree.py:37-58 — never deletes, only appends).
        """
        v = self.current_version()
        if v < 0:
            self.overwrite(df, partition_by)
            return
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(self._version_dir(v))

    def count(self) -> int:
        return self.read().count()
