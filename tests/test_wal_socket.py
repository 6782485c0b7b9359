"""Logical-replication socket client vs an in-process fake Postgres.

The fake speaks the documented frontend/backend protocol: startup with
replication=database, MD5 or SCRAM-SHA-256 auth, START_REPLICATION on
a slot, CopyBothResponse, XLogData payloads carrying wal2json v2
lines, a reply-requested keepalive, and reads back the standby status
update that confirms the flush LSN (the slot-advance contract).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import socket
import struct
import threading

import pytest

from synch_spark.sources.wal_socket import (
    WalProtocolError,
    WalSocketClient,
    _md5_password,
)

USER, PASSWORD, DB, SLOT = "repl", "walpass", "appdb", "synch_slot"

V2_LINES = [
    json.dumps({"action": "B"}),
    json.dumps({"action": "I", "schema": "db", "table": "t",
                "timestamp": "2024-01-01 00:00:01.000000+00",
                "columns": [{"name": "id", "type": "integer", "value": 1},
                            {"name": "name", "type": "text",
                             "value": "alice"}]}),
    json.dumps({"action": "U", "schema": "db", "table": "t",
                "timestamp": "2024-01-01 00:00:02.000000+00",
                "columns": [{"name": "id", "type": "integer", "value": 1},
                            {"name": "name", "type": "text",
                             "value": "alicia"}],
                "identity": [{"name": "id", "type": "integer", "value": 1}]}),
    json.dumps({"action": "C"}),
]


class FakePgServer(threading.Thread):
    def __init__(self, auth: str = "md5", tls_ctx=None,
                 keepalive: bool = True, tear_mid_message: bool = False,
                 payloads: list | None = None, port: int = 0,
                 rounds_payloads: list | None = None):
        super().__init__(daemon=True)
        self.auth = auth
        #: override the streamed XLogData payloads (bytes); defaults to
        #: the wal2json V2_LINES — a pgoutput fake passes binary messages
        self.payloads = payloads
        #: per-CONNECTION payload lists: each dial pops the next round
        #: (a real walsender streams new WAL each drain round); LSNs
        #: advance across connections like real WAL positions do.
        #: Exhausted → idle rounds (keepalive only).
        self.rounds_payloads = rounds_payloads
        self.next_lsn = 0x16B3A50
        self.tls_ctx = tls_ctx
        self.tls_used = False
        self.keepalive = keepalive
        self.tear_mid_message = tear_mid_message
        self.srv = socket.create_server(("127.0.0.1", port))
        self.port = self.srv.getsockname()[1]
        self.stop_evt = threading.Event()
        self.start_replication_sql: list[str] = []
        self.create_slot_sql: list[str] = []
        self.status_updates: list[tuple[int, int, int]] = []

    @staticmethod
    def _send(conn, t: bytes, body: bytes):
        conn.sendall(t + struct.pack("!I", len(body) + 4) + body)

    @staticmethod
    def _read(f):
        head = f.read(5)
        if len(head) < 5:
            return None, None
        n = struct.unpack("!I", head[1:])[0] - 4
        return head[:1], f.read(n)

    def run(self):
        while not self.stop_evt.is_set():
            try:
                self.srv.settimeout(0.2)
                conn, _ = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                self._serve(conn)
            except Exception:  # noqa: BLE001 — one bad session, keep serving
                pass
            finally:
                conn.close()

    def _auth_md5(self, conn, f) -> bool:
        salt = b"\x01\x02\x03\x04"
        self._send(conn, b"R", struct.pack("!I", 5) + salt)
        t, body = self._read(f)
        return (t == b"p"
                and body.rstrip(b"\x00") == _md5_password(USER, PASSWORD, salt))

    def _auth_scram(self, conn, f) -> bool:
        self._send(conn, b"R", struct.pack("!I", 10) + b"SCRAM-SHA-256\x00\x00")
        t, body = self._read(f)
        if t != b"p":
            return False
        nul = body.index(b"\x00")
        ln = struct.unpack("!I", body[nul + 1:nul + 5])[0]
        client_first = body[nul + 5:nul + 5 + ln].decode()
        client_first_bare = client_first.split(",", 2)[2]
        client_nonce = dict(p.split("=", 1)
                            for p in client_first_bare.split(","))["r"]
        salt, it = b"saltsalt", 4096
        nonce = client_nonce + "srv"
        server_first = (f"r={nonce},s={base64.b64encode(salt).decode()},"
                        f"i={it}")
        self._send(conn, b"R", struct.pack("!I", 11) + server_first.encode())
        t, body = self._read(f)
        client_final = body.decode()
        without_proof, proof_b64 = client_final.rsplit(",p=", 1)
        salted = hashlib.pbkdf2_hmac("sha256", PASSWORD.encode(), salt, it)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored = hashlib.sha256(client_key).digest()
        auth_msg = ",".join([client_first_bare, server_first,
                             without_proof]).encode()
        sig = hmac.new(stored, auth_msg, hashlib.sha256).digest()
        want = bytes(a ^ b for a, b in zip(client_key, sig))
        if base64.b64decode(proof_b64) != want:
            return False
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        v = base64.b64encode(
            hmac.new(server_key, auth_msg, hashlib.sha256).digest()).decode()
        self._send(conn, b"R", struct.pack("!I", 12) + f"v={v}".encode())
        return True

    def _serve(self, conn):
        f = conn.makefile("rb")
        head = f.read(4)
        n = struct.unpack("!I", head)[0] - 4
        startup = f.read(n)
        if struct.unpack("!I", startup[:4])[0] == 80877103:  # SSLRequest
            if self.tls_ctx is None:
                conn.sendall(b"N")
            else:
                conn.sendall(b"S")
                conn = self.tls_ctx.wrap_socket(conn, server_side=True)
                f = conn.makefile("rb")
                self.tls_used = True
            head = f.read(4)
            n = struct.unpack("!I", head)[0] - 4
            startup = f.read(n)
        params = startup[4:].split(b"\x00")
        kv = dict(zip(params[::2], params[1::2]))
        assert kv.get(b"replication") == b"database", "not a walsender session"
        ok = (self._auth_md5(conn, f) if self.auth == "md5"
              else self._auth_scram(conn, f))
        if not ok:
            self._send(conn, b"E", b"SFATAL\x00C28P01\x00Mauth failed\x00\x00")
            return
        self._send(conn, b"R", struct.pack("!I", 0))       # AuthenticationOk
        self._send(conn, b"Z", b"I")                        # ReadyForQuery
        while True:
            t, body = self._read(f)
            if t != b"Q":
                return
            sql = body.rstrip(b"\x00").decode()
            if sql.startswith("CREATE_REPLICATION_SLOT"):
                self.create_slot_sql.append(sql)
                if len(self.create_slot_sql) > 1:  # already exists
                    self._send(conn, b"E",
                               b"SERROR\x00C42710\x00Mslot exists\x00\x00")
                else:
                    self._send(conn, b"C", b"CREATE_REPLICATION_SLOT\x00")
                self._send(conn, b"Z", b"I")
                continue
            break
        self.start_replication_sql.append(sql)
        self._send(conn, b"W", b"\x00\x00\x00")             # CopyBothResponse
        if self.rounds_payloads is not None:
            stream = (self.rounds_payloads.pop(0)
                      if self.rounds_payloads else [])
        else:
            stream = (self.payloads if self.payloads is not None
                      else [ln.encode() for ln in V2_LINES])
        lsn = self.next_lsn
        for i, payload in enumerate(stream):
            xl = b"w" + struct.pack("!QQQ", lsn + i * 8, lsn + i * 8 + 8, 0)
            self._send(conn, b"d", xl + payload)
        self.next_lsn = lsn + len(stream) * 8
        if self.tear_mid_message:
            # claim a 100-byte CopyData then hang up after 3 bytes —
            # a walsender crash mid-message, NOT an orderly end
            conn.sendall(b"d" + struct.pack("!I", 104) + b"w\x00\x00")
            conn.close()
            return
        if self.keepalive:
            # reply-requested keepalive, then collect status updates
            self._send(conn, b"d",
                       b"k" + struct.pack("!QQB", lsn + 64, 0, 1))
        conn.settimeout(60.0)  # the CLI's first Spark job sits between acks
        while True:
            t, body = self._read(f)
            if t is None:
                return
            if t == b"d" and body[:1] == b"r":
                rcv, fl, ap, _ts, _rq = struct.unpack("!QQQQB", body[1:])
                self.status_updates.append((rcv, fl, ap))


@pytest.fixture(params=["md5", "scram"])
def pg(request):
    srv = FakePgServer(auth=request.param)
    srv.start()
    yield srv
    srv.stop_evt.set()
    srv.srv.close()


def test_wal_socket_streams_and_acks(pg):
    cli = WalSocketClient("127.0.0.1", pg.port, USER, PASSWORD, database=DB)
    cli.connect()
    cli.start_replication(SLOT)
    lines = [p.decode() for p in cli.poll_payloads(idle_timeout=1.0)]
    assert lines == V2_LINES
    assert cli.received_lsn >= 0x16B3A50
    # flush-confirm after "sink write"
    cli.flushed_lsn = cli.received_lsn
    cli.ack()
    import time
    time.sleep(0.3)
    cli.close()
    assert pg.status_updates, "no standby status update reached the server"
    assert pg.status_updates[-1][1] == cli.flushed_lsn
    sql = pg.start_replication_sql[-1]
    assert f'SLOT "{SLOT}" LOGICAL' in sql and "format-version" in sql


def test_wal_socket_bad_password(pg):
    cli = WalSocketClient("127.0.0.1", pg.port, USER, "nope", database=DB)
    with pytest.raises(WalProtocolError):
        cli.connect()
    cli.close()


def test_cli_produce_pg_socket_spool(tmp_path, capsys, spark):
    """`produce --source pg-socket`: stream the slot into the spool
    boundary; payloads decode through the SAME wal2json path as
    replay-wal (v2 framing lines drop out; update carries the identity
    preimage)."""
    import yaml

    from synch_spark.cli import main

    srv = FakePgServer(auth="md5")
    srv.start()
    try:
        ev_dir = tmp_path / "events"
        cfg = {
            "core": {"insert_num": 1000, "insert_interval": 1},
            "source_dbs": [{"databases": [{"database": "db", "tables": [
                {"table": "t", "pk": ["id"]}]}]}],
            "spark": {
                "warehouse": str(tmp_path / "wh"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "events_dir": str(ev_dir),
                "sources": {},
                "pg_socket": {"host": "127.0.0.1", "port": srv.port,
                              "user": USER, "password": PASSWORD,
                              "database": DB, "slot": SLOT,
                              "idle_timeout": 1.0},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "pg-socket", "--once"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["events"] == 2 and out["flushed_lsn"] > 0
        got = (spark.read.schema(
            "schema string, table string, action string, before string, "
            "after string, event_unixtime long")
            .json(str(ev_dir)).orderBy("event_unixtime").collect())
        assert [r["action"] for r in got] == ["insert", "update"]
        assert json.loads(got[1]["before"]) == {"id": "1"}
        assert json.loads(got[1]["after"])["name"] == "alicia"
        import time as _t
        deadline = _t.time() + 5
        while _t.time() < deadline and (
                not srv.status_updates
                or srv.status_updates[-1][1] != out["flushed_lsn"]):
            _t.sleep(0.05)
        assert srv.status_updates and \
            srv.status_updates[-1][1] == out["flushed_lsn"]
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def _with_server(srv, fn):
    srv.start()
    try:
        return fn(srv)
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_wal_socket_tls(tmp_path):
    """sslmode=require: SSLRequest before startup, 'S' answer, wrapped
    channel, then the normal auth + CopyBoth stream inside it."""
    from tests.wire_tls import server_tls_context

    def run(srv):
        cli = WalSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                              database=DB, ssl_mode="require")
        cli.connect()
        cli.start_replication(SLOT)
        lines = [p.decode() for p in cli.poll_payloads(idle_timeout=1.0)]
        cli.close()
        assert lines == V2_LINES and srv.tls_used

    _with_server(FakePgServer(auth="md5",
                              tls_ctx=server_tls_context(tmp_path)), run)


def test_wal_socket_tls_refused_is_loud():
    """Server answers 'N' to SSLRequest: with a non-disable ssl_mode
    the client must fail, never silently downgrade to cleartext."""
    def run(srv):
        cli = WalSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                              database=DB, ssl_mode="require")
        with pytest.raises(WalProtocolError, match="refused TLS"):
            cli.connect()
        cli.close()

    _with_server(FakePgServer(auth="md5"), run)


def test_received_lsn_tracks_walend_not_datastart():
    """Without the trailing keepalive, the flush confirm must still
    pass the LAST record's walEnd — confirming only dataStart leaves
    the slot short of the commit record and the final transaction
    replays on every drain round forever."""
    def run(srv):
        cli = WalSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                              database=DB)
        cli.connect()
        cli.start_replication(SLOT)
        lines = [p.decode() for p in cli.poll_payloads(idle_timeout=1.0)]
        cli.close()
        assert lines == V2_LINES
        last_start = 0x16B3A50 + (len(V2_LINES) - 1) * 8
        assert cli.received_lsn == last_start + 8, \
            "received_lsn stopped at dataStart, not walEnd"
        assert not cli.torn

    _with_server(FakePgServer(auth="md5", keepalive=False), run)


def test_torn_read_sets_flag_not_clean_round():
    """A walsender dying mid-message must be distinguishable from an
    idle round: payloads before the tear still arrive, but ``torn``
    is set so the caller skips the flush ack."""
    def run(srv):
        cli = WalSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                              database=DB)
        cli.connect()
        cli.start_replication(SLOT)
        lines = [p.decode() for p in cli.poll_payloads(idle_timeout=2.0)]
        cli.close()
        assert lines == V2_LINES, "pre-tear payloads must still be yielded"
        assert cli.torn, "mid-message close must flag the round as torn"

    _with_server(FakePgServer(auth="md5", tear_mid_message=True), run)


def test_create_slot_reference_parity(pg):
    """First create returns True; re-create hits duplicate_object
    (42710) and returns False — the reference's DuplicateObject-pass
    semantics — while any later START_REPLICATION still works."""
    cli = WalSocketClient("127.0.0.1", pg.port, USER, PASSWORD, database=DB)
    cli.connect()
    assert cli.create_slot(SLOT) is True
    assert cli.create_slot(SLOT) is False
    cli.start_replication(SLOT)
    lines = [p.decode() for p in cli.poll_payloads(idle_timeout=1.0)]
    assert lines == V2_LINES
    cli.close()
    assert len(pg.create_slot_sql) == 2
    assert 'LOGICAL wal2json' in pg.create_slot_sql[0]


def _pgoutput_payloads():
    """A pgoutput session stream built with the independent encoder
    from test_pgoutput (Relation → Begin → I/U → Commit), mirroring
    what V2_LINES carries in wal2json form."""
    from tests.test_pgoutput import (
        enc_begin,
        enc_commit,
        enc_insert,
        enc_relation,
        enc_update,
    )

    rel = enc_relation(16401, "db", "t",
                       [(1, "id", 23, -1), (0, "name", 25, -1)])
    ts = 1_704_067_201_000_000  # 2024-01-01T00:00:01Z
    return [rel, enc_begin(ts),
            enc_insert(16401, ["1", "alice"]),
            enc_update(16401, ["1", "alicia"], old=["1", None],
                       old_kind=b"K"),
            enc_commit()]


def test_start_replication_pgoutput_options(pg):
    """plugin=pgoutput must send protocol parameters (proto_version,
    publication_names), NOT wal2json knobs the walsender would reject."""
    cli = WalSocketClient("127.0.0.1", pg.port, USER, PASSWORD, database=DB)
    cli.connect()
    cli.start_replication(SLOT, plugin="pgoutput")
    list(cli.poll_payloads(idle_timeout=1.0))
    cli.close()
    sql = pg.start_replication_sql[-1]
    assert "proto_version" in sql and f"publication_names" in sql
    assert "format-version" not in sql


def test_cli_produce_pg_socket_pgoutput(tmp_path, capsys, spark):
    """`produce --source pg-socket` with plugin=pgoutput: the binary
    message stream decodes driver-side (exact Begin commit timestamps)
    into the same spool boundary the wal2json path fills, and the slot
    is created with the pgoutput plugin."""
    import yaml

    from synch_spark.cli import main

    srv = FakePgServer(auth="md5", payloads=_pgoutput_payloads())
    srv.start()
    try:
        ev_dir = tmp_path / "events"
        cfg = {
            "core": {"insert_num": 1000, "insert_interval": 1},
            "source_dbs": [{"databases": [{"database": "db", "tables": [
                {"table": "t", "pk": ["id"]}]}]}],
            "spark": {
                "warehouse": str(tmp_path / "wh"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "events_dir": str(ev_dir),
                "sources": {},
                "pg_socket": {"host": "127.0.0.1", "port": srv.port,
                              "user": USER, "password": PASSWORD,
                              "database": DB, "slot": SLOT,
                              "plugin": "pgoutput",
                              "idle_timeout": 1.0},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "pg-socket", "--once"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["events"] == 2 and out["flushed_lsn"] > 0
        got = (spark.read.schema(
            "schema string, table string, action string, before string, "
            "after string, event_unixtime long")
            .json(str(ev_dir)).orderBy("event_unixtime", "action").collect())
        assert [r["action"] for r in got] == ["insert", "update"]
        # exact Begin commit time, not a consume-side fallback
        assert got[0]["event_unixtime"] == 1_704_067_201_000_000
        assert json.loads(got[1]["before"]) == {"id": "1"}
        assert json.loads(got[1]["after"])["name"] == "alicia"
        assert 'LOGICAL pgoutput' in srv.create_slot_sql[0]
        assert "proto_version" in srv.start_replication_sql[-1]
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_cli_pg_socket_pgoutput_archives_decided_rounds(tmp_path, capsys,
                                                        spark):
    """archive_dir: a decided round's raw payloads land as a frame
    file whose distributed replay (pgoutput_files_to_raw) reproduces
    the round's events — the wire-level audit trail."""
    import json as _json

    import yaml

    from synch_spark.cli import main
    from synch_spark.sources.pgoutput import pgoutput_files_to_raw

    srv = FakePgServer(auth="md5", payloads=_pgoutput_payloads())
    srv.start()
    try:
        arch = tmp_path / "archive"
        cfg = {
            "core": {"insert_num": 1000, "insert_interval": 1},
            "source_dbs": [{"databases": [{"database": "db", "tables": [
                {"table": "t", "pk": ["id"]}]}]}],
            "spark": {
                "warehouse": str(tmp_path / "wh"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "events_dir": str(tmp_path / "events"),
                "sources": {},
                "pg_socket": {"host": "127.0.0.1", "port": srv.port,
                              "user": USER, "password": PASSWORD,
                              "database": DB, "slot": SLOT,
                              "plugin": "pgoutput",
                              "archive_dir": str(arch),
                              "idle_timeout": 1.0},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "pg-socket", "--once"]) == 0
        files = sorted(arch.glob("round.*.pgo"))
        assert len(files) == 1
        back = pgoutput_files_to_raw(spark, str(files[0])).collect()
        acts = sorted((r["action"], _json.loads(r["after"] or "{}").get("name"))
                      for r in back)
        assert acts == [("insert", "alice"), ("update", "alicia")]
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_cli_pg_socket_wire_seq_continuity_across_rounds(tmp_path, capsys,
                                                         spark):
    """VERDICT r10 item 2: two transactions committing in the SAME
    microsecond that land in DIFFERENT drain rounds must still resolve
    in wire order. The live tail rebases each round's wire counter on
    the round's first XLogData LSN (packed lsn<<16 | pos), so the
    round-2 update to pk=1 — sharing round 1's commit timestamp —
    carries a strictly greater wire seq and last-wins keeps it, where
    the old per-round enumerate restarted at 0 and left the tie
    arbitrary."""
    import json as _json

    import yaml

    from tests.test_pgoutput import (
        enc_begin,
        enc_commit,
        enc_insert,
        enc_relation,
        enc_update,
    )

    from synch_spark.cli import main
    from synch_spark.events import (
        RAW_EVENT_WIRE_SCHEMA,
        parse_values,
        split_updates,
    )
    from synch_spark.operators.cdc_apply import compact_batch

    rel = enc_relation(16401, "db", "t",
                       [(1, "id", 23, -1), (0, "name", 25, -1)])
    ts = 1_704_067_201_000_000  # both rounds commit in THIS microsecond
    r1 = [rel, enc_begin(ts),
          enc_insert(16401, ["1", "a"]),
          enc_update(16401, ["1", "v1"], old=["1", None], old_kind=b"K"),
          enc_commit()]
    r2 = [rel, enc_begin(ts),  # same stamp, later round
          enc_update(16401, ["1", "v2"], old=["1", None], old_kind=b"K"),
          enc_commit()]

    srv = FakePgServer(auth="md5", rounds_payloads=[r1, r2])
    srv.start()
    try:
        ev_dir = tmp_path / "events"
        cfg = {
            "core": {"insert_num": 1000, "insert_interval": 0},
            "source_dbs": [{"databases": [{"database": "db", "tables": [
                {"table": "t", "pk": ["id"]}]}]}],
            "spark": {
                "warehouse": str(tmp_path / "wh"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "events_dir": str(ev_dir),
                "sources": {},
                "pg_socket": {"host": "127.0.0.1", "port": srv.port,
                              "user": USER, "password": PASSWORD,
                              "database": DB, "slot": SLOT,
                              "plugin": "pgoutput",
                              "idle_timeout": 1.0},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "pg-socket", "--rounds", "2"]) == 0
        lines = [_json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()[-2:]]
        assert [d["events"] for d in lines] == [2, 1]
        # round 2 streamed at HIGHER LSNs -> strictly higher flush point
        assert lines[1]["flushed_lsn"] > lines[0]["flushed_lsn"]

        raw = spark.read.schema(RAW_EVENT_WIRE_SCHEMA).json(str(ev_dir))
        rows = raw.orderBy("_wire_seq").collect()
        assert len(rows) == 3
        # all three share the commit microsecond (the tie under test)
        assert {r["event_unixtime"] for r in rows} == {ts}
        seqs = [r["_wire_seq"] for r in rows]
        v2_seq = next(r["_wire_seq"] for r in rows
                      if _json.loads(r["after"])["name"] == "v2")
        # the cross-round rebase: round 2's seq dominates BOTH round-1
        # seqs (the old per-round enumerate gave it 0 < round 1's 1)
        assert v2_seq == max(seqs) and seqs[0] < seqs[1] < seqs[2]

        # end-to-end last-wins through the shared apply pipeline
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField("id", T.LongType()),
                               T.StructField("name", T.StringType())])
        typed = parse_values(split_updates(raw), schema, string_values=True)
        net = compact_batch(typed, ("id",)).collect()
        assert len(net) == 1 and net[0]["name"] == "v2"
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_cli_produce_pg_socket_follow_redials(tmp_path, capsys, spark):
    """`produce --follow` on the pg tail: the server is DOWN at start;
    the supervised loop backs off on connection-refused, a delayed
    restart brings the port up, and the round then streams normally —
    the slot (server-side confirmed LSN) is the resume cursor, so no
    client state is needed across the re-dial."""
    import threading
    import time as _time

    import yaml

    from synch_spark.cli import main

    # bind-then-close to reserve a port number the delayed server reuses
    probe = socket.create_server(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    ev_dir = tmp_path / "events"
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(tmp_path / "wh"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "events_dir": str(ev_dir),
            "sources": {},
            "pg_socket": {"host": "127.0.0.1", "port": port,
                          "user": USER, "password": PASSWORD,
                          "database": DB, "slot": SLOT,
                          "idle_timeout": 1.0,
                          "reconnect_base_s": 0.1,
                          "reconnect_max_s": 0.5},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    started = {}

    def start_late():
        _time.sleep(0.6)
        started["srv"] = FakePgServer(auth="md5", port=port)
        started["srv"].start()

    t = threading.Thread(target=start_late, daemon=True)
    t.start()
    try:
        assert main(["--config", str(p), "produce",
                     "--source", "pg-socket", "--once", "--follow"]) == 0
        t.join()
        cap = capsys.readouterr()
        assert "re-dialing" in cap.err
        out = json.loads(cap.out.strip().splitlines()[-1])
        assert out["events"] == 2 and out["flushed_lsn"] > 0
    finally:
        t.join()
        if "srv" in started:
            started["srv"].stop_evt.set()
            started["srv"].srv.close()


def test_cli_produce_pg_socket_follow_config_error_is_fatal(tmp_path,
                                                            capsys):
    """--follow must NOT retry a deterministic client-side config
    rejection (streaming 'parallel' without proto_version 4): the
    supervised loop exits 2 immediately instead of burying the
    actionable error under an infinite backoff."""
    import yaml

    from synch_spark.cli import main

    srv = FakePgServer(auth="md5")
    srv.start()
    try:
        cfg = {
            "core": {"insert_num": 1000, "insert_interval": 1},
            "source_dbs": [{"databases": [{"database": "db", "tables": [
                {"table": "t", "pk": ["id"]}]}]}],
            "spark": {
                "warehouse": str(tmp_path / "wh"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "events_dir": str(tmp_path / "events"),
                "sources": {},
                "pg_socket": {"host": "127.0.0.1", "port": srv.port,
                              "user": USER, "password": PASSWORD,
                              "database": DB, "slot": SLOT,
                              "options": {"proto_version": "2",
                                          "streaming": "parallel"},
                              "plugin": "pgoutput",
                              "reconnect_base_s": 0.05},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "pg-socket", "--once", "--follow"]) == 2
        cap = capsys.readouterr()
        assert "config error" in cap.err and "parallel" in cap.err
        assert "re-dialing" not in cap.err
    finally:
        srv.stop_evt.set()
        srv.srv.close()
