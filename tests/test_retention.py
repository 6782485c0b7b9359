"""Configurable time-travel retention window (ParquetTable retain=N):
versions() span, historical reads, data-file GC at the window edge,
and log-entry floor across checkpoint rollover."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from synch_spark.sources.table import ParquetTable


def _commit_n(spark, t, n, start=0):
    """n overwrite commits, version k holding rows [0, 100+k)."""
    for k in range(start, start + n):
        t.overwrite(spark.range(100 + k).select(F.col("id").alias("k")))


def test_default_window_is_two(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    _commit_n(spark, t, 5)
    assert t.versions() == [3, 4]
    assert t.read(3).count() == 103
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.read(2)


def test_retain_widens_window(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), retain=4)
    _commit_n(spark, t, 6)
    assert t.versions() == [2, 3, 4, 5]
    for v in t.versions():
        assert t.read(v).count() == 100 + v
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.read(1)


def test_gc_frees_files_leaving_window(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), retain=3)
    _commit_n(spark, t, 6)

    def pool_files():
        out = set()
        for dirpath, _d, names in os.walk(os.path.join(str(tmp_path / "t"), "data")):
            out.update(os.path.join(dirpath, n) for n in names)
        return out

    live = set()
    for v in t.versions():
        live.update(os.path.join(str(tmp_path / "t"), "data", r)
                    for r in t.snapshot(v).files)
    on_disk = pool_files()
    # every retained file present; nothing outside the retained set
    # survives (each overwrite fully replaces the file set, so expired
    # versions' files must be gone)
    assert live <= on_disk
    assert on_disk == live


def test_retention_across_checkpoint_rollover(spark, tmp_path):
    # enough commits to cross the periodic checkpoint; the log-entry
    # floor must keep the replay chain for the OLDEST retained version
    t = ParquetTable(spark, str(tmp_path / "t"), retain=5)
    _commit_n(spark, t, 13)
    assert t.versions() == [8, 9, 10, 11, 12]
    for v in t.versions():
        assert t.read(v).count() == 100 + v


def test_retain_minimum_clamped(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), retain=1)
    assert t.retain == 2
    _commit_n(spark, t, 3)
    assert t.versions() == [1, 2]


def test_retain_parsed_from_yaml_config():
    from synch_spark.config import config_from_dict

    cfg = config_from_dict({
        "source_dbs": [{
            "databases": [{
                "database": "db",
                "tables": [
                    {"table": "a", "pk": ["k"], "retain": 6},
                    {"table": "b", "pk": ["k"]},
                ],
            }],
        }],
    })
    assert cfg.tables["db.a"].retain == 6
    assert cfg.tables["db.b"].retain == 2


def test_reopen_with_larger_retain_keeps_previous_window(spark, tmp_path):
    # write with the default window, reopen with a larger one: the
    # missing deeper entries must not trick the GC into deleting the
    # entries the old window still serves
    t = ParquetTable(spark, str(tmp_path / "t"))
    _commit_n(spark, t, 5)
    assert t.versions() == [3, 4]
    t2 = ParquetTable(spark, str(tmp_path / "t"), retain=4)
    _commit_n(spark, t2, 1, start=5)  # one more commit triggers GC
    # window grows forward from here; v4 (previous) must survive
    assert 4 in t2.versions() and 5 in t2.versions()
    assert t2.read(4).count() == 104


def test_history_metadata(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), retain=3)
    _commit_n(spark, t, 1)  # overwrite -> full-file-set ckpt entry
    for _ in range(2):      # appends -> delta entries
        t.append(spark.range(10).select(F.col("id").alias("k")))
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[0]["type"] == "ckpt" and h[1]["type"] == "delta"
    for e in h:
        assert e["n_files"] >= 1 and e["total_bytes"] > 0
        assert e["n_added"] >= 1
    # checkpoints always embed a schema; only deltas carry the flag
    assert h[0]["schema_change"] is None
    assert h[1]["schema_change"] is False
    assert h[0]["committed_at"] <= h[2]["committed_at"]


def test_cli_history(tmp_path, capsys, spark):
    import json

    import yaml

    from synch_spark.cli import main
    from synch_spark.session import read_table

    src_path = str(tmp_path / "src.parquet")
    read_table(spark, "/root/testdata/sf0.001", "region").write.parquet(src_path)
    cfg = {
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "region", "pk": ["r_regionkey"], "retain": 3}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "source_format": "parquet",
            "sources": {"db.region": src_path},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "etl"]) == 0
    capsys.readouterr()
    assert main(["--config", str(p), "history"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    h = out["history"]["db.region"]
    assert len(h) >= 1 and h[-1]["n_files"] >= 1


@pytest.mark.slow
def test_retention_invariants_property(spark, tmp_path):
    """Hypothesis: any sequence of overwrite/append commits under any
    retain window keeps (a) every listed version readable with the
    right row count, (b) every retained snapshot's files on disk,
    (c) no stray data files outside the retained union."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    counter = [0]

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(
        retain=st.integers(2, 5),
        ops=st.lists(st.tuples(st.sampled_from(["overwrite", "append"]),
                               st.integers(1, 30)), min_size=3, max_size=8),
    )
    def run(retain, ops):
        counter[0] += 1
        root = str(tmp_path / f"t{counter[0]}")
        t = ParquetTable(spark, root, retain=retain)
        expected = {}  # version -> rowcount
        total = 0
        for op, n in ops:
            if op == "overwrite":
                t.overwrite(spark.range(n).select(F.col("id").alias("k")))
                total = n
            else:
                t.append(spark.range(n).select(F.col("id").alias("k")))
                total += n
            expected[t.current_version()] = total
        vs = t.versions()
        assert vs[-1] == t.current_version()
        assert len(vs) <= retain
        live = set()
        for v in vs:
            assert t.read(v).count() == expected[v]
            live.update(t.snapshot(v).files)
        on_disk = set()
        data = os.path.join(root, "data")
        for dirpath, _d, names in os.walk(data):
            for n_ in names:
                on_disk.add(os.path.relpath(os.path.join(dirpath, n_), data)
                            .replace(os.sep, "/"))
        assert live <= on_disk
        assert on_disk == live

    run()
