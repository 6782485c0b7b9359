"""Commit-cost guarantees of the manifest-log store (sources.table).

The 100 TB requirement: a micro-batch merge touching k of N files must
pay O(k) filesystem operations — pool-file renames for the new files
plus one log-entry publish — never O(N) anything. The previous design
hard-linked every untouched file into each new version dir (O(N) link()
calls per commit, impossible on object storage); these tests pin the
replacement's cost model by COUNTING the python-level file ops a commit
performs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from synch_spark.config import Engine, TableSpec
from synch_spark.operators.cdc_apply import apply_cdc_batch
from synch_spark.sources.table import ParquetTable


@pytest.fixture(scope="module")
def spark():
    from synch_spark.session import get_spark

    return get_spark("test-commit-cost", cpus=8)


class _OpCounter:
    """Counts os-level file ops issued from python during a block.
    Spark's JVM writes the staged data files; everything the store
    itself does (promote, publish, GC) goes through these."""

    def __init__(self, monkeypatch, root):
        self.root = root
        self.counts = {"link": 0, "rename": 0, "remove": 0, "replace": 0}
        for name in list(self.counts):
            orig = getattr(os, name)

            def wrapper(*a, _n=name, _o=orig, **kw):
                if a and isinstance(a[0], str) and a[0].startswith(self.root):
                    self.counts[_n] += 1
                return _o(*a, **kw)

            monkeypatch.setattr(os, name, wrapper)

    def total(self):
        return sum(self.counts.values())


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "action string, k long, p string, v double, event_unixtime long"
    ).withColumn("action_seq", F.lit(0)).withColumn("schema", F.lit("db")) \
     .withColumn("table", F.lit("t"))


def test_cow_merge_is_o_touched_not_o_table(spark, tmp_path, monkeypatch):
    """Merge touching ONE key of a 20-partition / ~40-file table: the
    commit must perform a file-op count bounded by the touched set
    (< 20), provably independent of the 40-file table size — and the
    next version's manifest must name the untouched files without a
    single filesystem operation on them."""
    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by="p")
    t = ParquetTable(spark, str(tmp_path / "t"))
    # key ranges disjoint across partitions (p = k // 100), so footer
    # min/max stats alone prove the untouched 19 partitions hold no
    # batch key — the manifest carries them with zero file ops
    rows = [(k, f"p{k // 100}", float(k)) for k in range(2000)]
    t.overwrite(
        spark.createDataFrame(rows, "k long, p string, v double").repartition(2),
        "p",
    )
    n_files = len(t.snapshot().files)
    assert n_files >= 40  # 20 partitions x 2 tasks

    before = set(t.snapshot().files)
    ctr = _OpCounter(monkeypatch, str(tmp_path / "t"))
    batch = _events(spark, [("insert", 707, "p7", -1.0, 10)])
    apply_cdc_batch(t, batch, spec, value_columns=["k", "p", "v"])
    after = set(t.snapshot().files)

    # correctness: state merged, untouched files carried by name
    assert {r["v"] for r in t.read().filter("k = 707").collect()} == {-1.0}
    assert len(before & after) >= n_files - 2  # only p=p7's files replaced

    # cost: promote renames ≤ files written for ONE partition (+_CURRENT
    # hint replace), one log-entry link, GC of expired files — all far
    # below the table's file count, none proportional to it
    assert ctr.counts["link"] == 1, f"log publish must be the only link: {ctr.counts}"
    assert ctr.counts["rename"] <= 4, f"promote renames not O(touched): {ctr.counts}"
    assert ctr.total() < 20, f"commit did {ctr.counts} ops on a {n_files}-file table"


def test_metadata_ddl_commit_is_o1(spark, tmp_path, monkeypatch):
    """commit_schema on a many-file table: zero data-file operations —
    one log-entry publish (tmp write + link + unlink) and the pointer
    hint. The old design hard-linked all N files."""
    from synch_spark.ddl import parse_alter
    from synch_spark.sources.schema_evolution import TableSchema, evolve_schema

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") % 20).cast("string").alias("p"),
            F.lit(1.0).alias("v"),
        ).repartition(2),
        "p",
    )
    n_files = len(t.snapshot().files)
    assert n_files >= 40
    ts, reasons = evolve_schema(
        TableSchema.from_struct(t.read().schema),
        parse_alter("alter table db.t add column tag varchar(8)"),
    )
    assert reasons == []
    ctr = _OpCounter(monkeypatch, str(tmp_path / "t"))
    t.commit_schema(ts)
    assert ctr.counts["link"] == 1 and ctr.counts["rename"] == 0
    assert ctr.total() <= 4, f"metadata DDL not O(1): {ctr.counts}"
    assert t.read().columns == ["k", "v", "p", "tag"]


def test_version_gc_frees_only_expired_files(spark, tmp_path):
    """Pool-file GC at commit N deletes exactly the files removed when
    going N-2 -> N-1 (the expired version's private files); files shared
    with retained versions survive."""
    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by="p")
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame(
        [(k, f"p{k % 4}", float(k)) for k in range(400)],
        "k long, p string, v double").coalesce(1), "p")
    v0_files = set(t.snapshot().files)
    # v1: rewrite partition p1
    apply_cdc_batch(t, _events(spark, [("insert", 1, "p1", -1.0, 10)]),
                    spec, value_columns=["k", "p", "v"])
    v1_files = set(t.snapshot().files)
    replaced = v0_files - v1_files  # p1's old file(s)
    assert replaced
    for rel in replaced:  # still on disk: v0 is retained for readers
        assert os.path.exists(t._abs(rel))
    # v2 commit expires v0 -> exactly the replaced files are deleted
    apply_cdc_batch(t, _events(spark, [("insert", 2, "p2", -2.0, 11)]),
                    spec, value_columns=["k", "p", "v"])
    for rel in replaced:
        assert not os.path.exists(t._abs(rel)), f"{rel} should be GC'd"
    for rel in v1_files & set(t.snapshot().files):  # carried files survive
        assert os.path.exists(t._abs(rel))
    assert t.read().count() == 400


def test_no_hard_link_dependence(spark, tmp_path, monkeypatch):
    """The whole write path works when os.link is unavailable for DATA
    files (object-storage semantics) — only the log-entry publish uses
    an exclusive create, which maps to a conditional put."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    real_link = os.link

    def guarded(src, dst, **kw):
        assert "/_v/" in dst.replace(os.sep, "/"), (
            f"hard link outside the log publish: {src} -> {dst}"
        )
        return real_link(src, dst, **kw)

    monkeypatch.setattr(os, "link", guarded)
    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by="p")
    t.overwrite(spark.createDataFrame(
        [(k, f"p{k % 3}", float(k)) for k in range(300)],
        "k long, p string, v double"), "p")
    apply_cdc_batch(t, _events(spark, [("insert", 5, "p2", -5.0, 10)]),
                    spec, value_columns=["k", "p", "v"])
    t.append(spark.createDataFrame([(900, "p0", 9.0)], "k long, p string, v double"), "p")
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[5] == -5.0 and got[900] == 9.0 and len(got) == 301


def test_vacuum_reclaims_crash_debris(spark, tmp_path):
    """A writer that dies mid-prepare leaves (a) a .staging dir, (b)
    pooled-but-never-published data files, (c) a _v temp entry. vacuum
    reclaims all three after the TTL and never touches live pool files
    or the previous retained version."""
    import json
    import time

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.overwrite(spark.createDataFrame([(2, "b")], "k long, v string"))
    live_before = {rel: t._abs(rel) for v in t.versions()
                   for rel in t.snapshot(v).files}
    # (a) dead staging dir
    os.makedirs(os.path.join(t.root, ".staging-deadbeef"))
    # (b) orphan pool file (promoted, commit never published)
    orphan = os.path.join(t._data, "orphan-123.parquet")
    open(orphan, "wb").write(b"x")
    # (c) torn log temp
    tmp_entry = os.path.join(t._mdir, ".tmp-deadbeef.json")
    json.dump({}, open(tmp_entry, "w"))
    old = time.time() - 7200
    for p in (os.path.join(t.root, ".staging-deadbeef"), orphan, tmp_entry):
        os.utime(p, (old, old))
    removed = t.vacuum(staging_ttl_s=3600)
    assert removed == 3
    assert not os.path.exists(orphan) and not os.path.exists(tmp_entry)
    assert not os.path.exists(os.path.join(t.root, ".staging-deadbeef"))
    for rel, path in live_before.items():
        assert os.path.exists(path), f"live file {rel} vacuumed"
    assert [r["v"] for r in t.read().collect()] == ["b"]
    assert t.read(version=t.current_version() - 1).collect()[0]["v"] == "a"


def test_unpartitioned_merge_is_file_level_cow(spark, tmp_path, monkeypatch):
    """The round-3 verdict's last O(table)-per-batch path: a merge into
    an UNPARTITIONED pk-keyed table must rewrite only the files whose
    footer min/max intersect the batch keys — not the whole table.
    40 pk-clustered files, a batch touching keys inside 2 of them:
    >= 38 files must carry over by name, and the commit's file-op count
    must stay bounded by the touched set."""
    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by=None)
    t = ParquetTable(spark, str(tmp_path / "t"))
    # explicit range partitioning gives each of the 40 files a tight,
    # disjoint pk range — the layout compaction produces in production
    # (cluster_by would re-repartition and AQE-coalesce this tiny df)
    t.overwrite(
        spark.range(4000).select(F.col("id").alias("k"),
                                 (F.col("id") % 7).cast("string").alias("p"),
                                 F.col("id").cast("double").alias("v"))
        .repartitionByRange(40, "k")
    )
    n_files = len(t.snapshot().files)
    assert n_files >= 35

    before = set(t.snapshot().files)
    ctr = _OpCounter(monkeypatch, str(tmp_path / "t"))
    # keys 5 and 3777 live in two different files (update + delete)
    batch = _events(spark, [("insert", 5, "px", -1.0, 10),
                            ("delete", 3777, "px", 0.0, 10)])
    apply_cdc_batch(t, batch, spec, value_columns=["k", "p", "v"])
    after = set(t.snapshot().files)

    # correctness: merged state
    assert {r["v"] for r in t.read().filter("k = 5").collect()} == {-1.0}
    assert t.read().filter("k = 3777").count() == 0
    assert t.read().count() == 3999
    # CoW: only the two intersecting files replaced, rest carried by name
    assert len(before & after) >= n_files - 2, (
        f"carried {len(before & after)} of {n_files} files — merge "
        f"rewrote the table instead of the touched files"
    )
    assert ctr.counts["link"] == 1, f"log publish must be the only link: {ctr.counts}"
    assert ctr.total() < 25, f"commit did {ctr.counts} ops on a {n_files}-file table"


def test_unpartitioned_merge_delete_only_noop(spark, tmp_path):
    """A batch of deletes whose keys provably miss every file commits
    nothing at all (no version bump), and a delete that hits commits a
    delta entry removing just that file."""
    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by=None)
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.range(1000).select(F.col("id").alias("k"), F.lit("a").alias("p"),
                                 F.lit(1.0).alias("v"))
        .repartitionByRange(10, "k")
    )
    v0 = t.current_version()
    apply_cdc_batch(t, _events(spark, [("delete", 99999, "a", 0.0, 5)]),
                    spec, value_columns=["k", "p", "v"])
    assert t.current_version() == v0, "provable-miss delete must not commit"
    apply_cdc_batch(t, _events(spark, [("delete", 500, "a", 0.0, 6)]),
                    spec, value_columns=["k", "p", "v"])
    assert t.current_version() == v0 + 1
    assert t.read().count() == 999


def test_commit_latency_flat_between_checkpoints_at_10k_files(spark, tmp_path):
    """Checkpoint-entry scaling, measured: with 10^4 live files in the
    manifest, delta commits between checkpoints must stay O(1) — entry
    bytes independent of the table's file count — and the every-10th
    ckpt entry is the only O(live files) artifact (Delta-equivalent),
    itself bounded. Pins the design claim with numbers instead of prose:
    byte sizes are asserted exactly (deterministic); wall-clock gets a
    loose sanity ceiling since the VM is noisy."""
    import json
    import time

    from synch_spark.sources.table import CKPT_EVERY

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    # synthetic 10^4-file checkpoint (commit-path cost depends only on
    # the log, not on the data files' existence)
    snap = t.snapshot()
    big = {f"synth-{i:05d}.parquet": {} for i in range(10_000)}
    v = t.current_version() + 1
    t._write_entry(t._make_entry(v, big, [], snap, force_ckpt=True))
    base_files = len(t.snapshot().files)
    assert base_files >= 10_000

    delta_bytes, ckpt_bytes, delta_s, ckpt_s = [], [], [], []
    for _ in range(2 * CKPT_EVERY + 2):
        base = t.current_version()
        snap = t.snapshot(base)
        t0 = time.perf_counter()
        entry = t._make_entry(base + 1, {f"d-{base}.parquet": {}}, [], snap)
        t._write_entry(entry)
        dt = time.perf_counter() - t0
        size = os.path.getsize(t._manifest_path(base + 1))
        (ckpt_bytes if entry["type"] == "ckpt" else delta_bytes).append(size)
        (ckpt_s if entry["type"] == "ckpt" else delta_s).append(dt)
    assert ckpt_bytes and delta_bytes
    # O(1) deltas: a few hundred bytes against a ~10^4-file table —
    # three orders of magnitude below the ckpt entry
    assert max(delta_bytes) < 1_000, f"delta entry not O(1): {max(delta_bytes)}B"
    assert min(ckpt_bytes) > 100_000  # the O(live files) artifact, every 10th
    assert max(ckpt_bytes) < 5_000_000  # ...and bounded (~35B/file)
    delta_s.sort()
    assert delta_s[len(delta_s) // 2] < 0.05, f"delta publish slow: {delta_s}"
    assert max(ckpt_s) < 2.0, f"ckpt publish unbounded: {ckpt_s}"
    # reads stay correct through the synthetic chain
    assert len(t.snapshot().files) == base_files + len(delta_bytes) + len(ckpt_bytes)


@pytest.mark.slow
def test_unpartitioned_merge_bloom_refines_overlapping_ranges(spark, tmp_path):
    """The unpartitioned CoW path consults Bloom sidecars exactly like
    the partitioned one: two files with fully OVERLAPPING pk min/max
    (interleaved even/odd keys) are both range-hits for any batch key,
    but the bloom proves the odd-keyed file holds no even key — one
    file rewrites, the other carries by name."""
    from synch_spark.sources.bloom import build_file_blooms
    from synch_spark.sources.manifest import refresh_manifest

    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by=None)
    t = ParquetTable(spark, str(tmp_path / "t"))
    evens = spark.createDataFrame([(k, "a", 1.0) for k in range(0, 2000, 2)],
                                  "k long, p string, v double").coalesce(1)
    odds = spark.createDataFrame([(k, "a", 1.0) for k in range(1, 2000, 2)],
                                 "k long, p string, v double").coalesce(1)
    t.overwrite(evens)
    t.append(odds)
    assert len(t.snapshot().files) == 2
    build_file_blooms(t, "k")
    refresh_manifest(t, "k")

    before = set(t.snapshot().files)
    apply_cdc_batch(t, _events(spark, [("insert", 500, "a", -1.0, 10)]),
                    spec, value_columns=["k", "p", "v"])
    after = set(t.snapshot().files)
    carried = before & after
    # the odd-keyed file survived by name despite its range covering 500
    assert len(carried) == 1, f"bloom did not refine: carried {carried}"
    assert t.read().filter("k = 500").collect()[0]["v"] == -1.0
    assert t.read().count() == 2000

def test_merge_rewrite_adds_o_touched_files_not_splinters(spark, tmp_path):
    """A merge rewriting k files must ADD O(k) files — not one splinter
    per shuffle partition. Without the rewrite-width coalesce a 1-file
    merge on a 64-file table added ~33 files per micro-batch, compounding
    into small-file sprawl (and inflating every change feed's read set)."""
    spec = TableSpec(schema="db", table="t", pk=("k",),
                     engine=Engine.REPLACING_MERGE_TREE, partition_by=None)
    t = ParquetTable(spark, str(tmp_path / "t"), retain=3)
    t.overwrite(
        spark.range(64_000).select(F.col("k" if False else "id").alias("k"),
                                   F.lit("a").alias("p"),
                                   F.col("id").cast("double").alias("v"))
        .repartitionByRange(64, "k")
    )
    v0 = t.current_version()
    # 2000 clustered keys -> 2-3 intersecting files
    batch = _events(spark, [("insert", k, "px", -1.0, 10)
                            for k in range(1000, 3000, 1)])
    apply_cdc_batch(t, batch, spec, value_columns=["k", "p", "v"])
    added = set(t.snapshot().files) - set(t.snapshot(v0).files)
    removed = set(t.snapshot(v0).files) - set(t.snapshot().files)
    assert 1 <= len(removed) <= 4, sorted(removed)
    assert len(added) <= len(removed) + 1, (
        f"merge added {len(added)} files for a {len(removed)}-file rewrite"
    )
    assert t.read().filter("v = -1.0").count() == 2000
