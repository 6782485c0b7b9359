"""MariaDB flavor of the live binlog tail: ed25519 auth (pinned to RFC
8032 vectors — an independent oracle for the vendored signer), the
domain-server-seq GTID position dialect, and the @slave_connect_state
dump protocol, e2e against a fake MariaDB master (the MySQL paths'
FakeMysqlServer pattern). Reference anchor: the reference's reader
inherits MariaDB support from python-mysql-replication
(/root/reference/synch/reader/mysql.py:128-153)."""
from __future__ import annotations

import binascii
import socket
import struct
import threading

import pytest

from synch_spark.sources import binlog_file as B
from synch_spark.sources import ed25519 as E
from synch_spark.sources.binlog_socket import (
    BinlogProtocolError,
    BinlogSocketClient,
    format_mariadb_gtid_pos,
    parse_mariadb_gtid_pos,
    stream_raw_events,
)
from tests.binlog_builder import BinlogBuilder

USER, PASSWORD = "repl", "mariapass"
NONCE = bytes(range(200, 232))  # 32 deterministic ed25519 nonce bytes


# --------------------------------------------------------------------------
# the signer, pinned against RFC 8032's published vectors (MariaDB's
# scheme = RFC 8032 with SHA-512(password) as the expanded secret, so a
# 32-byte password equal to an RFC seed must reproduce the RFC signature)
# --------------------------------------------------------------------------
def test_rfc8032_vectors():
    u = binascii.unhexlify
    vecs = [
        ("9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60",
         "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
         "",
         "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
         "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b"),
        ("4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb",
         "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
         "72",
         "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
         "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00"),
        ("c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7",
         "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
         "af82",
         "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
         "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a"),
    ]
    for seed, pub, msg, sig in vecs:
        seed, pub, msg, sig = u(seed), u(pub), u(msg), u(sig)
        assert E.public_key(seed) == pub
        assert E.sign(seed, msg) == sig
        assert E.verify(pub, msg, sig)
        assert not E.verify(pub, msg + b"x", sig)
        # RFC seed as a MariaDB "password": identical signature
        assert E.sign_expanded(E._sha512(seed), msg) == sig


def test_mariadb_token_verifies_under_account_key():
    pub = E.mariadb_ed25519_public_key(PASSWORD)
    tok = E.mariadb_ed25519_token(PASSWORD, NONCE)
    assert len(tok) == 64 and E.verify(pub, NONCE, tok)
    assert not E.verify(pub, NONCE, E.mariadb_ed25519_token("wrong", NONCE))


def test_mariadb_gtid_pos_text_roundtrip():
    pos = parse_mariadb_gtid_pos(" 0-1-42, 1-3-7 ")
    assert pos == {0: (1, 42), 1: (3, 7)}
    assert format_mariadb_gtid_pos(pos) == "0-1-42,1-3-7"
    assert parse_mariadb_gtid_pos("") == {}
    # last wins per domain (gtid_slave_pos semantics)
    assert parse_mariadb_gtid_pos("0-1-5,0-2-9") == {0: (2, 9)}
    for bad in ("0-1", "0-1-2-3", "a-1-2", "0-1--2"):
        with pytest.raises(BinlogProtocolError):
            parse_mariadb_gtid_pos(bad)


# --------------------------------------------------------------------------
# fake MariaDB master: ed25519 auth switch + @slave_connect_state dump
# --------------------------------------------------------------------------
def _fixture() -> bytes:
    b = BinlogBuilder(server_version="10.11.6-MariaDB")
    cols = [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)]
    b.mariadb_gtid(0, 1)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.insert(9, (1, "alice"), (2, "bob"))
    b.xid(1)
    b.mariadb_gtid(0, 2)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.update(9, ((1, "alice"), (1, "alicia")))
    b.xid(2)
    return b.bytes()


def _split_events(data: bytes) -> list[tuple[int, bytes]]:
    out, p = [], 4
    while p + 19 <= len(data):
        size = int.from_bytes(data[p + 9:p + 13], "little")
        out.append((p, data[p:p + size]))
        p += size
    return out


class FakeMariadbServer(threading.Thread):
    """One-connection-at-a-time MariaDB master: every account uses the
    ed25519 plugin (AuthSwitchRequest after the v10 handshake), and
    COM_BINLOG_DUMP serves the transactions AFTER the position the
    client announced via SET @slave_connect_state — MariaDB's
    auto-position protocol. ``torn_after_gtid``: drop the connection
    right after serving that many transactions' GTID headers plus the
    NEXT gtid event (simulating a mid-transaction cut)."""

    def __init__(self, binlog_bytes: bytes, torn: bool = False,
                 cut_after: int | None = None):
        super().__init__(daemon=True)
        self.binlog = binlog_bytes
        self.torn = torn
        #: cut the connection (no EOF) after serving this many event
        #: packets — the torn-point sweep knob
        self.cut_after = cut_after
        self.pub = E.mariadb_ed25519_public_key(PASSWORD)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.queries: list[str] = []
        self.connect_states: list[str] = []
        self.stop_evt = threading.Event()

    @staticmethod
    def _send(conn, seq, payload):
        conn.sendall(len(payload).to_bytes(3, "little")
                     + bytes([seq % 256]) + payload)

    @staticmethod
    def _recv(f):
        head = f.read(4)
        if len(head) < 4:
            return None, None
        n = int.from_bytes(head[:3], "little")
        return head[3], f.read(n)

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
            finally:
                try:
                    conn.close()
                except OSError:
                    pass

    def _serve(self, conn):
        f = conn.makefile("rb")
        scramble20 = bytes(range(1, 21))
        hs = bytes([10]) + b"5.5.5-10.11.6-MariaDB-log\x00"
        hs += struct.pack("<I", 42)
        hs += scramble20[:8] + b"\x00"
        hs += struct.pack("<H", 0xFFFF)
        hs += bytes([33]) + struct.pack("<H", 2)
        hs += struct.pack("<H", 0xFFFF)
        hs += bytes([21]) + bytes(10)
        hs += scramble20[8:] + b"\x00"
        hs += b"mysql_native_password\x00"
        self._send(conn, 0, hs)
        seq, resp = self._recv(f)
        if resp is None:
            return
        # the account's plugin is ed25519 regardless of what the client
        # offered: AuthSwitchRequest with a fresh 32-byte nonce
        self._send(conn, seq + 1, b"\xfe" + b"client_ed25519\x00" + NONCE)
        seq, sig = self._recv(f)
        if sig is None or not E.verify(self.pub, NONCE, bytes(sig)):
            self._send(conn, seq + 1,
                       b"\xff" + struct.pack("<H", 1045) + b"#28000denied")
            return
        self._send(conn, seq + 1, b"\x00\x00\x00\x02\x00\x00\x00")
        state = ""
        while True:
            _seq, cmd = self._recv(f)
            if cmd is None:
                return
            if cmd[0] == 0x03:  # COM_QUERY
                q = cmd[1:].decode("utf-8", "replace")
                self.queries.append(q)
                if "@slave_connect_state" in q:
                    state = q.split("'", 2)[1]
                    self.connect_states.append(state)
                self._send(conn, 1, b"\x00\x00\x00\x02\x00\x00\x00")
                continue
            if cmd[0] == 0x12:  # COM_BINLOG_DUMP (MariaDB GTID mode)
                try:
                    pos = {d: sq for d, (_s, sq) in
                           parse_mariadb_gtid_pos(state).items()}
                except BinlogProtocolError:
                    pos = {}
                events = _split_events(self.binlog)
                fde = next(e for _, e in events
                           if e[4] == B.EV_FORMAT_DESCRIPTION)
                seq = 1
                self._send(conn, seq, b"\x00" + fde)
                seq += 1
                groups, cur, grp = [], None, []
                for _s, ev in events:
                    if ev[4] == B.EV_FORMAT_DESCRIPTION:
                        continue
                    if ev[4] == B.EV_MARIADB_GTID:
                        if grp:
                            groups.append((cur, grp))
                        body = ev[19:]
                        cur = (int.from_bytes(body[8:12], "little"),
                               int.from_bytes(body[:8], "little"))
                        grp = [ev]
                    else:
                        grp.append(ev)
                if grp:
                    groups.append((cur, grp))
                served = 0
                sent = 0
                for g, evs in groups:
                    if g is not None and g[1] <= pos.get(g[0], 0):
                        continue
                    if self.torn and served == 1:
                        # serve the NEXT transaction's GTID header only,
                        # then cut — a torn mid-transaction stream
                        self._send(conn, seq, b"\x00" + evs[0])
                        return  # no EOF: connection drops
                    for ev in evs:
                        self._send(conn, seq, b"\x00" + ev)
                        seq += 1
                        sent += 1
                        if self.cut_after is not None \
                                and sent >= self.cut_after:
                            return  # torn-point sweep: cut, no EOF
                    served += 1
                self._send(conn, seq, b"\xfe\x00\x00\x02\x00")
                return


@pytest.fixture()
def maria():
    srv = FakeMariadbServer(_fixture())
    srv.start()
    yield srv
    srv.stop_evt.set()
    srv.srv.close()


def _client(srv) -> BinlogSocketClient:
    return BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD)


def test_mariadb_gtid_resume_e2e(maria):
    """Round 1 from the empty position streams both transactions and
    advances mariadb_gtid_pos to 0-1-2; round 2 hands that position
    back (via @slave_connect_state) and receives nothing new."""
    c1 = _client(maria)
    evs = list(stream_raw_events(c1, "", 4, gtid_set="", flavor="mariadb"))
    c1.close()
    assert [e["action"] for e in evs] == ["insert", "insert", "update"]
    assert c1.mariadb_gtid_pos == {0: (1, 2)}
    assert "SET @mariadb_slave_capability = 4" in maria.queries
    assert maria.connect_states[-1] == ""

    cursor = format_mariadb_gtid_pos(c1.mariadb_gtid_pos)
    assert cursor == "0-1-2"
    c2 = _client(maria)
    evs2 = list(stream_raw_events(c2, "", 4, gtid_set=cursor,
                                  flavor="mariadb"))
    c2.close()
    assert evs2 == []
    assert maria.connect_states[-1] == "0-1-2"
    assert c2.mariadb_gtid_pos == {0: (1, 2)}  # unchanged, still durable


def test_mariadb_partial_resume_serves_only_newer(maria):
    """Position 0-1-1: transaction 1 is skipped server-side, only the
    update transaction streams, and the cursor lands on 0-1-2."""
    c = _client(maria)
    evs = list(stream_raw_events(c, "", 4, gtid_set="0-1-1",
                                 flavor="mariadb"))
    c.close()
    assert [e["action"] for e in evs] == ["update"]
    assert c.mariadb_gtid_pos == {0: (1, 2)}


def test_mariadb_ed25519_bad_password_is_loud(maria):
    c = BinlogSocketClient("127.0.0.1", maria.port, USER, "wrongpass")
    with pytest.raises(BinlogProtocolError, match="auth failed"):
        c.connect()


def test_mariadb_torn_mid_transaction_keeps_inflight_out():
    """The connection dies after transaction 1 completed and
    transaction 2's GTID header arrived: the cursor must hold 0-1-1
    (tx 1 proven complete by tx 2's header) and NOT 0-1-2 — the next
    dump replays the torn transaction."""
    srv = FakeMariadbServer(_fixture(), torn=True)
    srv.start()
    try:
        c = _client(srv)
        evs = []
        with pytest.raises((BinlogProtocolError, OSError)):
            for e in stream_raw_events(c, "", 4, gtid_set="",
                                       flavor="mariadb"):
                evs.append(e)
        assert c.mariadb_gtid_pos == {0: (1, 1)}
        assert c._pending_mariadb == (0, 1, 2)  # in-flight, NOT durable
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def _multi_domain_fixture() -> bytes:
    """Two GTID domains interleaved (parallel replication streams):
    domain 0 carries two transactions, domain 1 one."""
    b = BinlogBuilder(server_version="10.11.6-MariaDB")
    cols = [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)]
    b.mariadb_gtid(0, 1)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.insert(9, (1, "alice"))
    b.xid(1)
    b.mariadb_gtid(1, 5)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.insert(9, (2, "bob"))
    b.xid(2)
    b.mariadb_gtid(0, 2)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.update(9, ((1, "alice"), (1, "alicia")))
    b.xid(3)
    return b.bytes()


def test_mariadb_multi_domain_cursor_tracks_per_domain():
    srv = FakeMariadbServer(_multi_domain_fixture())
    srv.start()
    try:
        c = _client(srv)
        evs = list(stream_raw_events(c, "", 4, gtid_set="",
                                     flavor="mariadb"))
        c.close()
        assert len(evs) == 3
        assert c.mariadb_gtid_pos == {0: (1, 2), 1: (1, 5)}
        assert format_mariadb_gtid_pos(c.mariadb_gtid_pos) == "0-1-2,1-1-5"
        # resume skips everything
        c2 = _client(srv)
        assert list(stream_raw_events(c2, "", 4, gtid_set="0-1-2,1-1-5",
                                      flavor="mariadb")) == []
        c2.close()
        # partial: only domain 0 caught up -> domain 1's tx replays
        c3 = _client(srv)
        evs3 = list(stream_raw_events(c3, "", 4, gtid_set="0-1-2",
                                      flavor="mariadb"))
        c3.close()
        assert len(evs3) == 1 and evs3[0]["action"] == "insert"
        assert c3.mariadb_gtid_pos == {0: (1, 2), 1: (1, 5)}
    finally:
        srv.stop_evt.set()
        srv.srv.close()


@pytest.mark.parametrize("cut_after", list(range(1, 12)))
def test_mariadb_torn_point_sweep_never_cursors_inflight(cut_after):
    """Cut the stream after EVERY possible event position: whatever the
    tear point, the durable cursor must contain exactly the
    transactions whose COMPLETION was proven (a successor GTID arrived)
    — never the in-flight one, never a later one. The invariant that
    makes at-least-once resume safe at any crash point."""
    data = _multi_domain_fixture()
    # transaction completion proofs in stream order: tx(0,1) proven at
    # event 5 (tx2's GTID), tx(1,5) proven at event 9 (tx3's GTID);
    # tx(0,2) is only proven by clean EOF, which a cut never delivers.
    srv = FakeMariadbServer(data, cut_after=cut_after)
    srv.start()
    try:
        c = _client(srv)
        try:
            for _ in stream_raw_events(c, "", 4, gtid_set="",
                                       flavor="mariadb"):
                pass
        except (BinlogProtocolError, OSError):
            pass
        expect: dict = {}
        if cut_after >= 5:
            expect[0] = (1, 1)
        if cut_after >= 9:
            expect[1] = (1, 5)
        assert c.mariadb_gtid_pos == expect, f"cut_after={cut_after}"
        c.close()
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_cli_produce_mariadb_flavor_auto_position(tmp_path, capsys, spark):
    """flavor: mariadb end-to-end through the CLI: round 1 streams both
    transactions and persists the domain-server-seq cursor; round 2 (a
    fresh connection) resumes by it and receives nothing."""
    import json
    import yaml

    from synch_spark.cli import main

    srv = FakeMariadbServer(_fixture())
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
                "mysql_socket": {"host": "127.0.0.1", "port": srv.port,
                                 "user": USER, "password": PASSWORD,
                                 "flavor": "mariadb",
                                 "auto_position": True, "gtid_set": ""},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["events"] == 3  # 2 row-inserts + 1 update
        assert out1["cursor"]["gtid_set"] == "0-1-2"
        cur = json.loads((tmp_path / "wh" /
                          "_binlog_socket_cursor.json").read_text())
        assert cur["gtid_set"] == "0-1-2"
        # round 2: fresh connection resumes by the persisted position
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["events"] == 0
        assert out2["cursor"]["gtid_set"] == "0-1-2"
        assert srv.connect_states[-1] == "0-1-2"
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_offline_decoder_handles_mariadb_event_shapes():
    """A MariaDB binlog mixes v1 row events with MariaDB-only types
    (GTID 0xA2, ANNOTATE_ROWS 0xA0); the shared v4 decoder must skip
    what it doesn't consume and decode the rows — the same bytes the
    socket tail archives replay through this path."""
    b = BinlogBuilder(server_version="10.11.6-MariaDB")
    cols = [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)]
    b.mariadb_gtid(0, 1)
    b._event(0xA0, b"INSERT INTO t VALUES (1,'alice')")  # ANNOTATE_ROWS
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.insert_v1(9, (1, "alice"))
    b.xid(1)
    b.mariadb_gtid(0, 2)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.delete(9, (1, "alice"))
    b.xid(2)
    evs = list(B.iter_binlog_events(b.bytes()))
    assert [e["action"] for e in evs] == ["insert", "delete"]
    import json as _json

    assert _json.loads(evs[0]["after"]) == {"id": 1, "name": "alice"}


def test_mariadb_flavor_rejects_unknown(tmp_path, capsys):
    import yaml

    from synch_spark.cli import main

    cfg = {
        "core": {}, "source_dbs": [],
        "spark": {"warehouse": str(tmp_path / "wh"),
                  "checkpoint_dir": str(tmp_path / "c"),
                  "events_dir": str(tmp_path / "e"), "sources": {},
                  "mysql_socket": {"host": "h", "user": "u",
                                   "flavor": "percona"}},
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "produce",
                 "--source", "mysql-socket", "--once"]) == 2
    assert "mariadb" in capsys.readouterr().err
