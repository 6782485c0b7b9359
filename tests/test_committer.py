"""Contract tests for the pluggable manifest-log commit primitive
(sources/committer.py): one suite over every implementation, a
race-injecting fake object store proving the conditional put is a
SINGLE atomic primitive (not exists-then-put), and a full table
lifecycle (commit / GC / restore / losing race) running through the
object-store committer."""
from __future__ import annotations

import os

import pytest

from synch_spark.sources.committer import (
    AlreadyCommitted,
    LocalObjectStore,
    ObjectStoreCommitter,
    PosixCommitter,
    PreconditionFailed,
)

COMMITTERS = [
    ("posix", lambda: PosixCommitter()),
    ("object-store", lambda: ObjectStoreCommitter(LocalObjectStore())),
]


@pytest.mark.parametrize("kind,make", COMMITTERS, ids=[k for k, _ in COMMITTERS])
def test_publish_creates_exact_payload(tmp_path, kind, make):
    path = str(tmp_path / "_v" / "v=0.json")
    make().publish(path, b'{"v": 0}')
    with open(path, "rb") as f:
        assert f.read() == b'{"v": 0}'
    # no temp litter next to the entry
    leftovers = [n for n in os.listdir(tmp_path / "_v") if n != "v=0.json"]
    assert leftovers == []


@pytest.mark.parametrize("kind,make", COMMITTERS, ids=[k for k, _ in COMMITTERS])
def test_second_publish_loses_and_leaves_winner_intact(tmp_path, kind, make):
    path = str(tmp_path / "_v" / "v=7.json")
    c = make()
    c.publish(path, b"winner")
    with pytest.raises(AlreadyCommitted):
        c.publish(path, b"loser")
    with open(path, "rb") as f:
        assert f.read() == b"winner", "the loser must not clobber the winner"


def test_local_object_store_conditional_put_semantics(tmp_path):
    store = LocalObjectStore()
    key = str(tmp_path / "k")
    store.put_if_none_match(key, b"a")
    with pytest.raises(PreconditionFailed):
        store.put_if_none_match(key, b"b")
    with open(key, "rb") as f:
        assert f.read() == b"a"


class _RacingStore:
    """Fake object store that injects a competitor's successful put for
    the same key IMMEDIATELY BEFORE delegating each conditional put —
    the worst-case race window. A committer that pre-checks existence
    and then puts unconditionally would clobber the competitor; one
    built on the conditional primitive must surface the conflict."""

    def __init__(self):
        self.inner = LocalObjectStore()
        self.injected: list[str] = []

    def put_if_none_match(self, key: str, body: bytes) -> None:
        self.inner.put_if_none_match(key, b"competitor")
        self.injected.append(key)
        self.inner.put_if_none_match(key, body)


def test_injected_race_always_loses_cleanly(tmp_path):
    store = _RacingStore()
    c = ObjectStoreCommitter(store)
    path = str(tmp_path / "_v" / "v=3.json")
    with pytest.raises(AlreadyCommitted):
        c.publish(path, b"mine")
    assert store.injected == [path]
    with open(path, "rb") as f:
        assert f.read() == b"competitor"


# --------------------------------------------------------------------------
# full manifest-log lifecycle through the object-store committer: the
# same commit / losing-race / GC / restore behavior the POSIX default
# gives, with every log publish going through conditional puts
# --------------------------------------------------------------------------
def _table(spark, root, **kw):
    from synch_spark.sources.table import ParquetTable

    return ParquetTable(
        spark, str(root),
        committer=ObjectStoreCommitter(LocalObjectStore()), **kw)


def test_table_lifecycle_under_object_store_committer(spark, tmp_path):
    from synch_spark.sources.table import ConcurrentWriteError

    t = _table(spark, tmp_path / "t", retain=2)
    df = spark.range(5).withColumnRenamed("id", "k")
    t.overwrite(df, expected_base=-1)
    t.append(spark.range(5, 8).withColumnRenamed("id", "k"))
    assert t.current_version() == 1
    assert t.read().count() == 8

    # losing race: a second handle commits version 2 first; this
    # handle's pinned-base overwrite must fail with ConcurrentWriteError
    other = _table(spark, tmp_path / "t")
    base = t.current_version()
    other.overwrite(spark.range(3).withColumnRenamed("id", "k"),
                    expected_base=base)
    with pytest.raises(ConcurrentWriteError):
        t.overwrite(spark.range(9).withColumnRenamed("id", "k"),
                    expected_base=base)
    assert t.read().count() == 3  # the winner's state

    # restore: back to the pre-overwrite contents as a NEW version
    v_before = t.current_version()
    t.restore(v_before - 1)
    assert t.current_version() == v_before + 1
    assert t.read().count() == 8

    # GC: keep committing and verify expired versions become unreadable
    # while current stays intact (remove-list GC ran through the
    # committer-published entries)
    for i in range(4):
        t.overwrite(spark.range(i + 1).withColumnRenamed("id", "k"))
    assert t.read().count() == 4
    old = t.current_version() - t.retain
    with pytest.raises(Exception):
        t.read(version=max(0, old - 1)).count()


def test_table_default_committer_is_posix(spark, tmp_path):
    from synch_spark.sources.table import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "d"))
    assert isinstance(t.committer, PosixCommitter)
