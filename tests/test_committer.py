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


# --------------------------------------------------------------------------
# GCS / Azure conditional-put committers (VERDICT r10 item 4): same
# contract suite, run against an in-process HTTP fake speaking each
# store's REAL wire protocol (the fake-walsender discipline applied to
# object storage) — genuine atomic conditional semantics plus a
# worst-case race-injection window.
# --------------------------------------------------------------------------
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit

from synch_spark.sources.committer import azure_committer, gcs_committer

BUCKET = "tbl-bucket"
CONTAINER = "tables"


class _FakeStoreHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # noqa: D102 - silence request logging
        pass

    def _reply(self, code: int, body: bytes = b"{}"):
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _conditional_put(self, key: str, body: bytes, conflict: int):
        srv = self.server
        with srv.lock:
            if srv.race_inject and key not in srv.store:
                srv.store[key] = b"competitor"
                srv.injected.append(key)
            if key in srv.store:
                self._reply(conflict, b'{"error": "exists"}')
                return
            srv.store[key] = body
        self._reply(200)

    def do_POST(self):  # GCS JSON-API simple upload
        srv = self.server
        parts = urlsplit(self.path)
        q = parse_qs(parts.query)
        srv.auth_seen.append(self.headers.get("Authorization"))
        if (parts.path != f"/upload/storage/v1/b/{BUCKET}/o"
                or q.get("uploadType") != ["media"]):
            self._reply(400, b'{"error": "bad path"}')
            return
        if q.get("ifGenerationMatch") != ["0"]:
            # an UNCONDITIONAL upload reaching the fake means the
            # committer lost its create-only precondition — fail loudly
            self._reply(400, b'{"error": "missing ifGenerationMatch=0"}')
            return
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self._conditional_put(q["name"][0], body, conflict=412)

    def do_PUT(self):  # Azure Put Blob
        srv = self.server
        parts = urlsplit(self.path)
        srv.auth_seen.append(self.headers.get("Authorization"))
        srv.sas_seen.append(parts.query)
        if self.headers.get("If-None-Match") != "*":
            self._reply(400, b"missing If-None-Match: *")
            return
        if self.headers.get("x-ms-blob-type") != "BlockBlob":
            self._reply(400, b"missing x-ms-blob-type")
            return
        key = unquote(parts.path.lstrip("/"))
        if not key.startswith(f"{CONTAINER}/"):
            self._reply(404, b"no such container")
            return
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self._conditional_put(key[len(CONTAINER) + 1:], body,
                              conflict=409)


@pytest.fixture()
def fake_store():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeStoreHandler)
    srv.store = {}
    srv.lock = threading.Lock()
    srv.race_inject = False
    srv.injected = []
    srv.auth_seen = []
    srv.sas_seen = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _cloud_committers(srv, tmp_path):
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    strip = str(tmp_path)
    return [
        ("gcs", gcs_committer(BUCKET, prefix_to_strip=strip,
                              token_provider=lambda: "tok-123",
                              base_url=base)),
        ("azure", azure_committer("acct", CONTAINER, prefix_to_strip=strip,
                                  sas="sv=2021&sig=abc", base_url=base)),
    ]


def test_cloud_publish_creates_exact_payload(fake_store, tmp_path):
    for kind, c in _cloud_committers(fake_store, tmp_path):
        fake_store.store.clear()
        path = str(tmp_path / "_v" / f"v={kind}.json")
        c.publish(path, b'{"v": 1}')
        assert fake_store.store == {f"_v/v={kind}.json": b'{"v": 1}'}, kind


def test_cloud_second_publish_loses_and_leaves_winner(fake_store, tmp_path):
    for kind, c in _cloud_committers(fake_store, tmp_path):
        fake_store.store.clear()
        path = str(tmp_path / "_v" / "v=7.json")
        c.publish(path, b"winner")
        with pytest.raises(AlreadyCommitted):
            c.publish(path, b"loser")
        assert fake_store.store["_v/v=7.json"] == b"winner", kind


def test_cloud_injected_race_always_loses_cleanly(fake_store, tmp_path):
    for kind, c in _cloud_committers(fake_store, tmp_path):
        fake_store.store.clear()
        fake_store.injected.clear()
        fake_store.race_inject = True
        path = str(tmp_path / "_v" / "v=3.json")
        with pytest.raises(AlreadyCommitted):
            c.publish(path, b"mine")
        assert fake_store.injected == ["_v/v=3.json"], kind
        assert fake_store.store["_v/v=3.json"] == b"competitor", kind
        fake_store.race_inject = False


def test_cloud_auth_rides_every_request(fake_store, tmp_path):
    gcs = _cloud_committers(fake_store, tmp_path)[0][1]
    gcs.publish(str(tmp_path / "a"), b"x")
    assert fake_store.auth_seen[-1] == "Bearer tok-123"
    az = _cloud_committers(fake_store, tmp_path)[1][1]
    az.publish(str(tmp_path / "b"), b"y")
    assert "sig=abc" in fake_store.sas_seen[-1]


def test_cloud_non_conflict_error_is_loud(fake_store, tmp_path):
    # wrong bucket -> fake answers 400 -> RuntimeError, NOT a silent
    # AlreadyCommitted (a misconfigured bucket must not read as a
    # lost race)
    base = f"http://127.0.0.1:{fake_store.server_address[1]}"
    bad = gcs_committer("wrong-bucket", prefix_to_strip=str(tmp_path),
                        base_url=base)
    with pytest.raises(RuntimeError, match="HTTP 400"):
        bad.publish(str(tmp_path / "x"), b"p")


def test_table_lifecycle_under_gcs_committer(spark, tmp_path, fake_store):
    """The full manifest-log lifecycle (commit / losing race / read)
    with every log publish going over the GCS wire protocol — data
    files stay local (the store's reads are unconditional), the
    CONDITIONAL primitive is what the cloud provides."""
    from synch_spark.sources.table import ConcurrentWriteError, ParquetTable

    class _MirrorClient:
        """GCS conditional put that ALSO materializes the entry
        locally so the table's readers (which read the filesystem)
        see what the bucket accepted — the shape of a gcsfuse/mounted
        warehouse, where the mount serves reads and the conditional
        put guards commits."""

        def __init__(self, inner):
            self.inner = inner

        def put_if_none_match(self, key, body):
            self.inner.client.put_if_none_match(key, body)
            LocalObjectStore().put_if_none_match(key, body)

    base = f"http://127.0.0.1:{fake_store.server_address[1]}"
    gcs = gcs_committer(BUCKET, base_url=base)
    committer = ObjectStoreCommitter(_MirrorClient(gcs))

    t = ParquetTable(spark, str(tmp_path / "t"), committer=committer)
    df = spark.range(5).withColumnRenamed("id", "k")
    t.overwrite(df, expected_base=-1)
    assert t.read().count() == 5
    other = ParquetTable(spark, str(tmp_path / "t"), committer=committer)
    base_v = t.current_version()
    other.overwrite(spark.range(3).withColumnRenamed("id", "k"),
                    expected_base=base_v)
    with pytest.raises(ConcurrentWriteError):
        t.overwrite(spark.range(9).withColumnRenamed("id", "k"),
                    expected_base=base_v)
    assert t.read().count() == 3
    # every published version went over the GCS wire exactly once
    assert sorted(k for k in fake_store.store) == sorted(
        k for k in fake_store.store if k.endswith(".json"))
    assert len(fake_store.store) == t.current_version() + 1


def test_committer_from_config_kinds(tmp_path):
    from synch_spark.sources.committer import committer_from_config

    assert committer_from_config(None) is None
    assert isinstance(committer_from_config({}), type(None))
    assert isinstance(committer_from_config({"kind": "posix"}),
                      PosixCommitter)
    c = committer_from_config({"kind": "local-object-store"})
    assert isinstance(c, ObjectStoreCommitter)
    g = committer_from_config({"kind": "gcs", "bucket": "b",
                               "base_url": "http://x"})
    assert isinstance(g, ObjectStoreCommitter)
    a = committer_from_config({"kind": "azure", "account": "a",
                               "container": "c"})
    assert isinstance(a, ObjectStoreCommitter)
    with pytest.raises(ValueError, match="unknown committer kind"):
        committer_from_config({"kind": "ftp"})


def test_cli_load_installs_and_resets_default_committer(tmp_path):
    import yaml

    from synch_spark.cli import _load
    from synch_spark.sources.committer import default_committer

    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump({
        "core": {}, "source_dbs": [],
        "spark": {"committer": {"kind": "local-object-store"}}}))
    _load(str(p))
    assert isinstance(default_committer(), ObjectStoreCommitter)
    # and ParquetTable picks it up without an explicit arg — config
    # reaches every construction site through the process default
    from synch_spark.sources.table import ParquetTable

    class _S:  # ParquetTable only stores the session at __init__
        pass

    t = ParquetTable(_S(), str(tmp_path / "t"))
    assert isinstance(t.committer, ObjectStoreCommitter)

    p2 = tmp_path / "plain.yaml"
    p2.write_text(yaml.dump({"core": {}, "source_dbs": [], "spark": {}}))
    _load(str(p2))
    assert isinstance(default_committer(), PosixCommitter)

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.dump({
        "core": {}, "source_dbs": [],
        "spark": {"committer": {"kind": "ftp"}}}))
    with pytest.raises(SystemExit) as ei:
        _load(str(bad))
    assert ei.value.code == 2


def test_azure_sas_never_leaks_into_errors(fake_store, tmp_path):
    base = f"http://127.0.0.1:{fake_store.server_address[1]}"
    az = azure_committer("acct", "wrong-container",
                         prefix_to_strip=str(tmp_path),
                         sas="sv=2021&sig=SECRETSIG", base_url=base)
    with pytest.raises(RuntimeError) as ei:
        az.publish(str(tmp_path / "x"), b"p")  # 404 -> loud RuntimeError
    assert "SECRETSIG" not in str(ei.value)
    assert "<sas redacted>" in str(ei.value)
