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

from pyspark.sql import DataFrame, SparkSession, functions as F

from synch_spark.sources import schema_evolution as se

_CURRENT = "_CURRENT"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this writer's read and commit."""


def commit_with_retry(txn, retries: int = 5, backoff_s: float = 0.05):
    """Run a read-modify-write transaction with optimistic-concurrency
    retry: ``txn`` must RE-READ the table(s) it merges into on every
    attempt (read inside the callable, not captured outside), so a retry
    merges against the winner's version instead of replaying a stale
    plan. Exponential backoff with jitter de-synchronizes herds of
    writers; after ``retries`` losses the last ConcurrentWriteError
    propagates.

    This is the multi-writer story: each host stages its own files
    (``_staging_dir`` is per-writer), promotion is an atomic rename, and
    losers rebuild from the new current version — serializable commits
    without a lock service, the Delta/Hudi optimistic pattern. Assumes a
    rename-coherent shared filesystem; an object-store backend would
    swap the rename for a conditional put of ``_CURRENT``.
    """
    import random
    import time

    attempt = 0
    while True:
        try:
            return txn()
        except ConcurrentWriteError:
            if attempt >= retries:
                raise
            time.sleep(backoff_s * (2**attempt) * (0.5 + random.random()))
            attempt += 1


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


# physical types whose footer min/max are exact values. BYTE_ARRAY
# (strings/binary) is excluded on purpose: parquet writers may TRUNCATE
# string statistics, and a truncated max is a *prefix* that understates
# the true max — pruning on it could skip a file that does contain a
# batch key (lost update). Numeric/temporal stats are always exact.
_EXACT_STAT_TYPES = {"INT32", "INT64", "INT96", "FLOAT", "DOUBLE", "BOOLEAN"}


def file_key_range(path: str, column: str):
    """(min, max) of ``column`` across the parquet file's row groups from
    footer statistics only — no data pages read. None when stats are
    absent or not provably exact (then the file must be treated as a
    rewrite candidate)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    try:
        idx = md.schema.names.index(column)
    except ValueError:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        col = md.row_group(rg).column(idx)
        st = col.statistics
        if (
            st is None
            or not st.has_min_max
            or col.physical_type not in _EXACT_STAT_TYPES
        ):
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` along a Z-order (Morton) curve over ``cols`` so
    parquet footer min/max stats become selective on EVERY listed column
    at once — single-column ``cluster_by`` gives perfect skipping on one
    key and none on the others; Z-order trades a little per-column
    tightness for usable ranges on all of them (the Delta OPTIMIZE
    ZORDER strategy).

    Each column is linearly scaled to ``bits`` bits using its global
    min/max (one tiny stats aggregate), the scaled values are
    bit-interleaved (``functions.interleave_bits``), and rows are
    range-partitioned + sorted by the key. The key column is dropped —
    the layout, and the per-file stats it induces, are the product.
    Linear scaling assumes roughly uniform keys; heavily skewed domains
    would want a rank-based normalization (ntile) instead.
    """
    from pyspark.sql import functions as F

    from synch_spark.functions import interleave_bits

    # the interleaved key must fit a signed long (interleave_bits raises
    # past 63 bit positions) — clamp per-column resolution for wide column
    # sets rather than fail; resolution loss only coarsens the curve
    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    top = float(2**bits - 1)
    scaled = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        span = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
        scaled.append(
            F.round((F.col(c).cast("double") - F.lit(mn or 0.0)) / F.lit(span) * top)
            .cast("long")
        )
    # materialize scaled values as attributes before interleaving: each is
    # referenced ``bits`` times, and attributes (unlike inline expression
    # trees) are computed once per row
    keyed = df
    names = []
    for i, expr in enumerate(scaled):
        names.append(f"_zs_{i}")
        keyed = keyed.withColumn(names[-1], expr)
    keyed = keyed.withColumn(
        "_z", interleave_bits([F.col(n) for n in names], bits)
    ).drop(*names)
    parts = [num_files] if num_files else []
    return (
        keyed.repartitionByRange(*parts, "_z").sortWithinPartitions("_z").drop("_z")
    )


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

    def _staging_dir(self) -> str:
        import uuid

        return os.path.join(self.root, f".staging-{uuid.uuid4().hex[:12]}")

    def _commit(self, v: int, staging: str | None = None) -> None:
        """Optimistic-concurrency commit (Delta-style): the writer built
        version ``v`` from base ``v - 1``. Writes are prepared in a
        per-writer staging dir and promoted with an atomic rename — if a
        competing writer already promoted ``v=<n>`` the rename fails, so
        a lost-update race cannot happen silently; the loser's staging
        dir is discarded and the caller re-reads and re-merges."""
        base = self.current_version()
        if base != v - 1:
            if staging:
                shutil.rmtree(staging, ignore_errors=True)
            raise ConcurrentWriteError(
                f"table {self.root}: version {base} was committed while this "
                f"writer prepared {v} from base {v - 1}; retry the merge"
            )
        if staging:
            try:
                os.rename(staging, self._version_dir(v))
            except OSError as e:
                shutil.rmtree(staging, ignore_errors=True)
                raise ConcurrentWriteError(
                    f"table {self.root}: version dir v={v} already promoted "
                    f"by a concurrent writer; retry the merge"
                ) from e
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
    def versions(self) -> list[int]:
        """Version numbers still on disk, ascending. The commit GC keeps
        the previous version alongside the current one (for in-flight
        readers), so this is typically ``[v-1, v]`` — a bounded
        time-travel window, the Delta ``VERSION AS OF`` shape without
        unbounded log retention."""
        return sorted(
            int(name[2:])
            for name in os.listdir(self.root)
            if name.startswith("v=") and os.path.isdir(os.path.join(self.root, name))
        )

    def _resolve_version(self, version: int | None) -> int:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        if version is not None:
            if version not in self.versions():
                raise FileNotFoundError(
                    f"table {self.root}: version {version} not retained "
                    f"(have {self.versions()})"
                )
            v = version
        return v

    def schema_spec(self, version: int | None = None) -> "se.TableSchema | None":
        """The logical-schema document committed with the given (default
        current) version, or None when the version's physical schema IS
        the logical schema (no metadata-only DDL in its lineage)."""
        if self.current_version() < 0:
            return None
        return se.load_schema(self._version_dir(self._resolve_version(version)))

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of the current version, or time-travel to a
        retained earlier ``version`` (raises if already GC'd). Every
        read pins one immutable version directory — readers never see a
        torn write, and a concurrent commit doesn't change rows under a
        running query.

        When the version carries a schema document (metadata-only DDL,
        sources.schema_evolution) the read reconciles heterogeneous
        physical files against it — renamed/added/dropped columns
        resolve without any file having been rewritten."""
        v = self._resolve_version(version)
        vdir = self._version_dir(v)
        spec = se.load_schema(vdir)
        if spec is None:
            return self.spark.read.parquet(vdir)
        return spec.reconciled_read(self.spark, vdir)

    def read_files(self, paths: list[str], version: int | None = None) -> DataFrame:
        """Read a subset of the given version's data files (merge-pruning
        path) with the SAME logical schema as ``read()`` — including
        partition-dir columns (basePath) and schema reconciliation."""
        v = self._resolve_version(version)
        vdir = self._version_dir(v)
        spec = se.load_schema(vdir)
        if spec is None:
            return self.spark.read.option("basePath", vdir).parquet(*paths)
        return spec.reconciled_read(self.spark, paths, base_path=vdir)

    def commit_schema(self, ts: "se.TableSchema") -> None:
        """Metadata-only DDL commit: a new version whose data files are
        hard links to every current file, plus the evolved schema
        document. O(files) metadata, zero bytes of data rewritten —
        the ClickHouse/Delta ALTER cost model (ref synch/convert.py:
        123-130 translates ALTERs; ClickHouse applies them as metadata
        mutations)."""
        v_old = self.current_version()
        if v_old < 0:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        staging = self._staging_dir()
        _link_tree(self._version_dir(v_old), staging)
        # the link tree carried the OLD schema doc; replace (or drop) it
        se.save_schema(staging, ts)
        self._commit(v_old + 1, staging)

    def _stamp_gen(self, df: DataFrame, spec: "se.TableSchema | None") -> DataFrame:
        """Writes into a schema-carrying version stamp the hidden _sgen
        generation column so default-bearing ADDs stay row-exact (a
        post-DDL explicit NULL is distinguishable from a pre-DDL row)."""
        if spec is not None and spec.needs_gen:
            return df.withColumn(se.GEN_COL, F.lit(spec.gen).cast("long"))
        return df

    def overwrite(
        self,
        df: DataFrame,
        partition_by: str | None = None,
        cluster_by: tuple[str, ...] | None = None,
        expected_base: int | None = None,
    ) -> None:
        """``cluster_by`` range-partitions + sorts rows on the given key
        before writing, so every data file covers a narrow, mostly
        disjoint pk range — that is what makes footer min/max stats
        selective and file-level merge pruning effective (Z-order-lite;
        use it for initial loads and compaction).

        ``expected_base`` anchors a read-modify-write: pass the version
        you READ, and the commit fails with ConcurrentWriteError if any
        other writer has committed since — without it the version is
        sampled here, so a competing commit between your read and this
        call would be silently overwritten (lost update). Use with
        ``commit_with_retry``."""
        base = self.current_version() if expected_base is None else expected_base
        v = base + 1
        if cluster_by:
            cols = ([partition_by] if partition_by else []) + list(cluster_by)
            df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        staging = self._staging_dir()
        writer.parquet(staging)
        self._commit(v, staging)

    def partition_files(
        self, partition_by: str, values: list | None = None
    ) -> dict[str, list[str]]:
        """Data files of the current version for the given partition
        values (or every partition when ``values`` is None):
        {partition_dirname: [absolute file paths]}."""
        v = self.current_version()
        if v < 0:
            return {}
        vdir = self._version_dir(v)
        wanted = (
            None if values is None else {None if x is None else str(x) for x in values}
        )
        out: dict[str, list[str]] = {}
        prefix = f"{partition_by}="
        for name in sorted(os.listdir(vdir)):
            if not name.startswith(prefix):
                continue
            if wanted is not None and _partition_dir_value(name) not in wanted:
                continue
            d = os.path.join(vdir, name)
            out[name] = [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
        return out

    def overwrite_cow(
        self,
        df: DataFrame,
        partition_by: str,
        touched_values: list,
        file_links: dict[str, list[str]] | None = None,
    ) -> None:
        """Partition-level copy-on-write commit.

        ``df`` holds the complete new content of the *touched* partitions
        only (``touched_values`` — raw values, ``None`` for the Hive null
        partition). It is written as version v+1; every current-version
        partition directory whose value is NOT touched is hard-linked
        into v+1 unchanged. A touched partition that ends up with zero
        rows is naturally dropped (not written, not linked) — that is
        how a partition emptied by deletes disappears.

        ``file_links`` ({partition_dirname: [old file paths]}) carries
        file-level data skipping one step further: inside a *touched*
        partition, files whose pk min/max stats prove they hold no
        touched key are hard-linked unchanged next to the freshly
        written files (names are uuid-unique, no collisions). ``df``
        must then contain only the rewritten remainder of the partition.

        This is the Delta/Hudi CoW strategy the reference outsources to
        ClickHouse background merges: at 100 TB a micro-batch touching k
        of N date partitions rewrites O(k files) of data, never O(N).
        """
        v_old = self.current_version()
        if v_old < 0:
            self.overwrite(df, partition_by)
            return
        v_new = v_old + 1
        new_dir = self._staging_dir()
        # hard-linked files keep their (possibly pre-DDL) physical schema,
        # so the schema document must ride into the new version too
        spec = se.load_schema(self._version_dir(v_old))
        df = self._stamp_gen(df, spec)
        df.write.mode("overwrite").partitionBy(partition_by).parquet(new_dir)
        se.save_schema(new_dir, spec)
        touched = {None if v is None else str(v) for v in touched_values}
        prefix = f"{partition_by}="
        old_dir = self._version_dir(v_old)
        for name in os.listdir(old_dir):
            if not name.startswith(prefix):
                continue
            if _partition_dir_value(name) in touched:
                continue
            _link_tree(os.path.join(old_dir, name), os.path.join(new_dir, name))
        for dirname, files in (file_links or {}).items():
            dst = os.path.join(new_dir, dirname)
            os.makedirs(dst, exist_ok=True)
            for f in files:
                try:
                    os.link(f, os.path.join(dst, os.path.basename(f)))
                except OSError:
                    shutil.copy2(f, os.path.join(dst, os.path.basename(f)))
        self._commit(v_new, staging=new_dir)

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
        df = self._stamp_gen(df, se.load_schema(self._version_dir(v)))
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(self._version_dir(v))

    def vacuum(self, staging_ttl_s: float = 3600.0) -> int:
        """Remove crash debris: ``.staging-*`` dirs older than the TTL
        (a writer that died mid-prepare leaves its staging dir behind —
        invisible to readers via the dot prefix, but disk it holds is
        never reclaimed otherwise) and any version dir older than the
        retained previous one that a partial GC left behind. Returns the
        number of directories removed.

        NOT wired into automatic maintenance on purpose: liveness is
        judged by the staging dir's mtime, and a prepare that outlasts
        the TTL (a very large initial load) would be reclaimed from
        under the live writer. Run it explicitly (cli `optimize
        --vacuum`) in windows without long-running loads, or raise the
        TTL above the longest expected prepare."""
        import time

        removed = 0
        cutoff = time.time() - staging_ttl_s
        current = self.current_version()
        for name in os.listdir(self.root):
            path = os.path.join(self.root, name)
            if name.startswith(".staging-") and os.path.isdir(path):
                if os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
                    removed += 1
            elif name.startswith("v=") and os.path.isdir(path):
                if current >= 0 and int(name[2:]) < current - 1:
                    shutil.rmtree(path, ignore_errors=True)
                    removed += 1
        return removed

    def count(self) -> int:
        return self.read().count()

    def file_stats(self) -> dict:
        """Current-version layout health from the filesystem only (no
        data read): file count, total/min/max/median file bytes, and
        partition count. The compaction trigger signal — many small
        files mean task-scheduling and footer overhead dominate scans;
        feed this into an 'optimize when median_bytes < target/4' policy
        instead of compacting on a timer."""
        import statistics

        v = self.current_version()
        if v < 0:
            return {"files": 0, "partitions": 0, "total_bytes": 0}
        vdir = self._version_dir(v)
        sizes, partitions = [], 0
        for dirpath, dirnames, filenames in os.walk(vdir):
            if dirpath != vdir and any(f.endswith(".parquet") for f in filenames):
                partitions += 1
            sizes.extend(
                os.path.getsize(os.path.join(dirpath, f))
                for f in filenames
                if f.endswith(".parquet")
            )
        if not sizes:
            return {"files": 0, "partitions": partitions, "total_bytes": 0}
        return {
            "files": len(sizes),
            "partitions": partitions,
            "total_bytes": sum(sizes),
            "min_bytes": min(sizes),
            "max_bytes": max(sizes),
            "median_bytes": int(statistics.median(sizes)),
        }
