"""COM_BINLOG_DUMP socket client vs an in-process fake MySQL server.

The sandbox blocks a real mysqld, not sockets: the fake server speaks
the documented wire protocol (handshake v10, mysql_native_password
auth, COM_QUERY OK, COM_BINLOG_DUMP with file+pos resume, event
packets, EOF) and streams events built by the SAME BinlogBuilder the
decoder pins use — so client-side decode parity is checked against
``iter_binlog_events`` over identical bytes.
"""

from __future__ import annotations

import hashlib
import socket
import ssl
import struct
import threading

import pytest

from synch_spark.sources import binlog_file as B
from synch_spark.sources.binlog_socket import (
    BinlogProtocolError,
    BinlogSocketClient,
    stream_raw_events,
)
from tests.binlog_builder import BinlogBuilder

USER, PASSWORD = "repl", "replpass"
SCRAMBLE = bytes(range(1, 21))  # 20 deterministic bytes


def _expected_token() -> bytes:
    p1 = hashlib.sha1(PASSWORD.encode()).digest()
    p2 = hashlib.sha1(p1).digest()
    mix = hashlib.sha1(SCRAMBLE + p2).digest()
    return bytes(a ^ b for a, b in zip(p1, mix))


def _split_events(file_bytes: bytes) -> list[tuple[int, bytes]]:
    """(start_offset, event_bytes) pairs from a binlog FILE image."""
    out, p = [], 4
    while p + 19 <= len(file_bytes):
        size = int.from_bytes(file_bytes[p + 9:p + 13], "little")
        out.append((p, file_bytes[p:p + size]))
        p += size
    return out


def _decode_gtid_set(b: bytes) -> dict:
    """Independent (test-side) decode of Gtid_set::encode — never the
    production encoder reading its own bytes."""
    import uuid as _uuid

    (n,) = struct.unpack_from("<Q", b, 0)
    p = 8
    out: dict = {}
    for _ in range(n):
        sid = str(_uuid.UUID(bytes=b[p:p + 16])); p += 16
        (ni,) = struct.unpack_from("<Q", b, p); p += 8
        ivs = []
        for _ in range(ni):
            a, e = struct.unpack_from("<QQ", b, p); p += 16
            ivs.append((a, e - 1))  # wire end is exclusive
        out[sid] = ivs
    return out


def _in_gtid_set(gs: dict, sid: str, gno: int) -> bool:
    return any(a <= gno <= b for a, b in gs.get(sid, []))


class FakeMysqlServer(threading.Thread):
    """One-connection-at-a-time replication master.

    ``auth_plugin`` selects what the handshake advertises;
    ``sha2_full`` forces caching_sha2's full-auth path (cache miss) —
    cleartext-password-over-TLS when the session upgraded, else the
    RSA public-key exchange. ``tls_ctx`` arms the CLIENT_SSL upgrade."""

    def __init__(self, binlog_bytes: bytes, filename: str = "binlog.000007",
                 auth_plugin: str = "mysql_native_password",
                 sha2_full: bool = False, tls_ctx=None,
                 switch_to: str | None = None, port: int = 0):
        super().__init__(daemon=True)
        self.binlog = binlog_bytes
        self.filename = filename
        self.auth_plugin = auth_plugin
        self.sha2_full = sha2_full
        self.tls_ctx = tls_ctx
        self.switch_to = switch_to  # per-account plugin != advertised
        self.tls_used = False
        self.full_auth_path: list[str] = []
        self.srv = socket.create_server(("127.0.0.1", port))
        self.port = self.srv.getsockname()[1]
        self.dump_requests: list[tuple[str, int, int]] = []
        #: (fname, pos, flags, decoded gtid set) per COM_BINLOG_DUMP_GTID
        self.gtid_requests: list[tuple] = []
        self.stop_evt = threading.Event()

    # -- packet helpers ----------------------------------------------------
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
            except ssl.SSLError:
                pass  # a must-fail TLS test aborts the handshake; the
                #       client-side assertion is the test, not this thread
            finally:
                try:
                    conn.close()
                except OSError:
                    pass

    def _serve(self, conn):
        f = conn.makefile("rb")
        # handshake v10
        hs = bytes([10]) + b"8.0.36-fake\x00"
        hs += struct.pack("<I", 42)                       # connection id
        hs += SCRAMBLE[:8] + b"\x00"
        hs += struct.pack("<H", 0xFFFF)                   # cap low
        hs += bytes([33]) + struct.pack("<H", 2)          # charset, status
        hs += struct.pack("<H", 0xFFFF)                   # cap high
        hs += bytes([21]) + bytes(10)                     # auth len, reserved
        hs += SCRAMBLE[8:] + b"\x00"
        hs += self.auth_plugin.encode() + b"\x00"
        self._send(conn, 0, hs)
        seq, resp = self._recv(f)
        if resp is None:
            return
        caps = struct.unpack_from("<I", resp, 0)[0]
        if caps & 0x800 and len(resp) == 32:              # SSLRequest
            if self.tls_ctx is None:
                return  # client asked for TLS we can't speak
            conn = self.tls_ctx.wrap_socket(conn, server_side=True)
            f = conn.makefile("rb")
            self.tls_used = True
            seq, resp = self._recv(f)
            if resp is None:
                return
        # HandshakeResponse41: caps(4) max(4) charset(1) 23x user\0 ...
        p = 32
        nul = resp.index(b"\x00", p)
        user = resp[p:nul].decode()
        p = nul + 1
        tok_len = resp[p]
        token = resp[p + 1:p + 1 + tok_len]
        if self.switch_to is not None:
            # the account's plugin differs from the advertised one:
            # AuthSwitchRequest with a FRESH scramble — the client must
            # recompute its token for the switched plugin/nonce
            from synch_spark.sources.binlog_socket import (
                _caching_sha2_scramble,
                _native_password,
            )

            scram2 = bytes(range(101, 121))
            self._send(conn, seq + 1,
                       b"\xfe" + self.switch_to.encode() + b"\x00"
                       + scram2 + b"\x00")
            seq, token = self._recv(f)
            want = (_caching_sha2_scramble(scram2, PASSWORD)
                    if self.switch_to == "caching_sha2_password"
                    else _native_password(scram2, PASSWORD))
            ok = user == USER and bytes(token) == want
            if ok and self.switch_to == "caching_sha2_password":
                self._send(conn, seq + 1, b"\x01\x03")  # fast-auth ok
                seq += 1
        elif self.auth_plugin == "caching_sha2_password":
            from synch_spark.sources.binlog_socket import (
                _caching_sha2_scramble,
            )
            want = _caching_sha2_scramble(SCRAMBLE, PASSWORD)
            ok = user == USER and token == want
            if ok and self.sha2_full:
                self._send(conn, seq + 1, b"\x01\x04")    # full auth
                seq, more = self._recv(f)
                if more == b"\x02":                       # pubkey request
                    from tests.wire_tls import rsa_keypair, rsa_oaep_decrypt

                    priv, pem = rsa_keypair()
                    self._send(conn, seq + 1, b"\x01" + pem)
                    seq, enc = self._recv(f)
                    plain = rsa_oaep_decrypt(priv, bytes(enc))
                    pw = bytes(b ^ SCRAMBLE[i % 20]
                               for i, b in enumerate(plain))
                    ok = pw == PASSWORD.encode() + b"\x00"
                    self.full_auth_path.append("rsa")
                else:                                     # cleartext in TLS
                    ok = (self.tls_used
                          and more == PASSWORD.encode() + b"\x00")
                    self.full_auth_path.append("tls-cleartext")
            elif ok:
                self._send(conn, seq + 1, b"\x01\x03")    # fast-auth ok
                seq += 1
        else:
            ok = user == USER and token == _expected_token()
        if not ok:
            self._send(conn, seq + 1,
                       b"\xff" + struct.pack("<H", 1045) + b"#28000denied")
            return
        self._send(conn, seq + 1, b"\x00\x00\x00\x02\x00\x00\x00")  # OK
        # session commands until COM_BINLOG_DUMP
        while True:
            _seq, cmd = self._recv(f)
            if cmd is None:
                return
            if cmd[0] == 0x03:  # COM_QUERY
                self._send(conn, 1, b"\x00\x00\x00\x02\x00\x00\x00")
                continue
            if cmd[0] == 0x1E:  # COM_BINLOG_DUMP_GTID (auto-position)
                flags, _sid = struct.unpack_from("<HI", cmd, 1)
                (fname_len,) = struct.unpack_from("<I", cmd, 7)
                fname = cmd[11:11 + fname_len].decode()
                p = 11 + fname_len
                (pos,) = struct.unpack_from("<Q", cmd, p); p += 8
                (dsize,) = struct.unpack_from("<I", cmd, p); p += 4
                gs = _decode_gtid_set(cmd[p:p + dsize])
                self.gtid_requests.append((fname, pos, flags, gs))
                events = _split_events(self.binlog)
                fde = next(e for _, e in events
                           if e[4] == B.EV_FORMAT_DESCRIPTION)
                seq = 1
                self._send(conn, seq, b"\x00" + fde)
                seq += 1
                # group the fixture into GTID-prefixed transactions and
                # serve only those NOT in the client's executed set —
                # the master-side auto-position skip semantics
                cur_gtid, group = None, []
                groups: list[tuple] = []
                for _start, ev in events:
                    if ev[4] == B.EV_FORMAT_DESCRIPTION:
                        continue
                    if ev[4] == 0x21:  # GTID event starts a transaction
                        if group:
                            groups.append((cur_gtid, group))
                        import uuid as _u
                        cur_gtid = (str(_u.UUID(bytes=ev[20:36])),
                                    int.from_bytes(ev[36:44], "little"))
                        group = [ev]
                    else:
                        group.append(ev)
                if group:
                    groups.append((cur_gtid, group))
                for g, evs in groups:
                    if g is not None and _in_gtid_set(gs, *g):
                        continue
                    for ev in evs:
                        self._send(conn, seq, b"\x00" + ev)
                        seq += 1
                self._send(conn, seq, b"\xfe\x00\x00\x02\x00")  # EOF
                return
            if cmd[0] == 0x12:  # COM_BINLOG_DUMP
                pos, flags, sid = struct.unpack_from("<IHI", cmd, 1)
                fname = cmd[11:].decode()
                self.dump_requests.append((fname, pos, flags))
                events = _split_events(self.binlog)
                fde = next(e for _, e in events
                           if e[4] == B.EV_FORMAT_DESCRIPTION)
                seq = 1
                # artificial ROTATE announces the served file — and is
                # CRC32-checksummed like a real 8.0 master's would be
                # (the fixture FDE declares CRC32; the client must not
                # read the trailer as filename bytes)
                import zlib

                rot_body = struct.pack("<Q", max(4, pos)) \
                    + self.filename.encode()
                rot = struct.pack("<IBIII", 0, 0x04, 1,
                                  19 + len(rot_body) + 4, 0) \
                    + struct.pack("<H", 0x20) + rot_body
                rot += zlib.crc32(rot).to_bytes(4, "little")
                self._send(conn, seq, b"\x00" + rot)
                seq += 1
                self._send(conn, seq, b"\x00" + fde)
                seq += 1
                for start, ev in events:
                    if ev[4] == B.EV_FORMAT_DESCRIPTION or start < pos:
                        continue
                    self._send(conn, seq, b"\x00" + ev)
                    seq += 1
                self._send(conn, seq, b"\xfe\x00\x00\x02\x00")  # EOF
                return


def _fixture_binlog() -> tuple[bytes, BinlogBuilder]:
    b = BinlogBuilder()
    b.table_map(9, "db", "t",
                [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                names_tlv=True)
    b.insert(9, (1, "alice"), (2, "bob"))
    b.table_map(9, "db", "t",
                [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                names_tlv=True)
    b.update(9, ((1, "alice"), (1, "alicia")))
    b.query("db", "ALTER TABLE t ADD COLUMN note VARCHAR(10)")
    b.table_map(9, "db", "t",
                [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                names_tlv=True)
    b.delete(9, (2, "bob"))
    return b.bytes(), b


@pytest.fixture()
def server():
    data, _ = _fixture_binlog()
    srv = FakeMysqlServer(data)
    srv.start()
    yield srv
    srv.stop_evt.set()
    srv.srv.close()


def test_socket_dump_matches_file_decoder(server):
    """Events received over the socket decode to EXACTLY what the file
    decoder produces from the same bytes (chunked at txn boundaries)."""
    data, _ = _fixture_binlog()
    want = list(B.iter_binlog_events(data))
    cli = BinlogSocketClient("127.0.0.1", server.port, USER, PASSWORD,
                             server_id=99)
    got = list(stream_raw_events(cli, "binlog.000007", 4))
    cli.close()
    strip = lambda evs: [  # noqa: E731
        {k: v for k, v in e.items() if k != "event_unixtime"} for e in evs]
    assert strip(got) == strip(want) and len(got) == 5  # 2 ins, 2 upd, 1 del... + ddl
    # within-stream order survives: stamps strictly increase
    stamps = [e["event_unixtime"] for e in got]
    assert stamps == sorted(stamps)


def test_socket_dump_resume_from_pos(server):
    """Resuming from a mid-file (file, pos) cursor replays ONLY events
    at/after pos — the crash-resume contract."""
    data, _ = _fixture_binlog()
    events = _split_events(data)
    # resume from the QUERY (DDL) event's start offset
    ddl_start = next(s for s, e in events if e[4] == B.EV_QUERY)
    cli = BinlogSocketClient("127.0.0.1", server.port, USER, PASSWORD,
                             server_id=99)
    positions = []
    got = list(stream_raw_events(
        cli, "binlog.000007", ddl_start,
        on_position=lambda f, p: positions.append((f, p))))
    cli.close()
    actions = [(e["table"], e["action"]) for e in got]
    assert actions == [("t", "query"), ("t", "delete")]
    assert server.dump_requests[-1][:2] == ("binlog.000007", ddl_start)
    # cursor advanced to the end of the served file
    assert positions and positions[-1][0] == "binlog.000007"
    assert positions[-1][1] == len(data)


def test_socket_auth_failure_is_loud(server):
    cli = BinlogSocketClient("127.0.0.1", server.port, USER, "wrongpass",
                             server_id=99)
    with pytest.raises(BinlogProtocolError, match="auth failed"):
        cli.connect()


def test_cli_produce_mysql_socket_spool_and_resume(tmp_path, capsys, spark):
    """`produce --source mysql-socket`: connect to the (fake) master,
    stream the binlog into the spool boundary, checkpoint the (file,
    pos) cursor; a second round resumes PAST everything served and
    emits nothing. The spooled events then flow through the standard
    consume/normalize path (same RAW_EVENT_SCHEMA contract every other
    producer uses)."""
    import json as _json
    import os

    import yaml

    from synch_spark.cli import main

    data, _ = _fixture_binlog()
    srv = FakeMysqlServer(data)
    srv.start()
    try:
        wh = tmp_path / "wh"
        ev_dir = tmp_path / "events"
        cfg = {
            "core": {"insert_num": 1000, "insert_interval": 1},
            "source_dbs": [{"databases": [{"database": "db", "tables": [
                {"table": "t", "pk": ["id"]}]}]}],
            "spark": {
                "warehouse": str(wh),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "events_dir": str(ev_dir),
                "sources": {},
                "mysql_socket": {
                    "host": "127.0.0.1", "port": srv.port,
                    "user": USER, "password": PASSWORD,
                    "server_id": 123, "file": "binlog.000007", "pos": 4,
                },
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        os.makedirs(wh, exist_ok=True)
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["events"] == 5
        assert out["cursor"] == {"file": "binlog.000007", "pos": len(data)}
        # spooled events read back through the normalize path
        got = (spark.read.schema(
            "schema string, table string, action string, before string, "
            "after string, event_unixtime long")
            .json(str(ev_dir)).orderBy("event_unixtime").collect())
        assert [r["action"] for r in got] == [
            "insert", "insert", "update", "query", "delete"]
        assert _json.loads(got[0]["after"]) == {"id": 1, "name": "alice"}
        # round 2: cursor is at EOF — the dump from there serves nothing
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["events"] == 0, "resume re-served already-emitted events"
        assert srv.dump_requests[-1][:2] == ("binlog.000007", len(data))
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_read_packet_reassembles_16mb_split():
    """MySQL splits payloads at 16 MiB - 1: a 0xFFFFFF-length packet
    means continuation. A LONGBLOB row event must reassemble, not
    desync the stream at that position forever."""
    import io

    from synch_spark.sources.binlog_socket import _Conn

    big = bytes(0xFFFFFF)  # exactly the split threshold
    tail = b"tail!"
    wire = (len(big).to_bytes(3, "little") + b"\x00" + big
            + len(tail).to_bytes(3, "little") + b"\x01" + tail)
    conn = _Conn.__new__(_Conn)
    conn.f = io.BytesIO(wire)
    conn.seq = 0
    got = conn.read_packet()
    assert got == big + tail and len(got) == 0xFFFFFF + 5


def _drain_all(server, **client_kw):
    data, _ = _fixture_binlog()
    want = list(B.iter_binlog_events(data))
    cli = BinlogSocketClient("127.0.0.1", server.port, USER, PASSWORD,
                             server_id=99, **client_kw)
    got = list(stream_raw_events(cli, "binlog.000007", 4))
    cli.close()
    strip = lambda evs: [  # noqa: E731
        {k: v for k, v in e.items() if k != "event_unixtime"} for e in evs]
    assert strip(got) == strip(want) and len(got) == 5
    return cli


@pytest.fixture()
def _srv_factory():
    servers = []

    def make(**kw):
        data, _ = _fixture_binlog()
        srv = FakeMysqlServer(data, **kw)
        srv.start()
        servers.append(srv)
        return srv

    yield make
    for srv in servers:
        srv.stop_evt.set()
        srv.srv.close()


def test_caching_sha2_fast_path(_srv_factory):
    """Stock MySQL 8.0 advertising caching_sha2_password with a warm
    auth cache: the SHA256 scramble alone authenticates (0x01 0x03
    then OK), no TLS and no RSA round-trip needed."""
    srv = _srv_factory(auth_plugin="caching_sha2_password")
    _drain_all(srv)
    assert srv.full_auth_path == [] and not srv.tls_used


def test_caching_sha2_full_auth_rsa_over_cleartext(_srv_factory):
    """Cache miss on a cleartext connection: the client requests the
    server's RSA public key and sends password XOR nonce under
    RSA-OAEP — the documented sha256_password_public_key exchange."""
    srv = _srv_factory(auth_plugin="caching_sha2_password", sha2_full=True)
    _drain_all(srv)
    assert srv.full_auth_path == ["rsa"] and not srv.tls_used


def test_caching_sha2_full_auth_rsa_bad_password(_srv_factory):
    srv = _srv_factory(auth_plugin="caching_sha2_password", sha2_full=True)
    cli = BinlogSocketClient("127.0.0.1", srv.port, USER, "wrongpass",
                             server_id=99)
    with pytest.raises(BinlogProtocolError, match="auth failed"):
        cli.connect()
    cli.close()


def test_caching_sha2_full_auth_over_tls(tmp_path, _srv_factory):
    """Cache miss on a TLS session: the cleartext password travels
    inside the channel (what libmysqlclient does under --ssl-mode) —
    no RSA exchange."""
    from tests.wire_tls import server_tls_context

    srv = _srv_factory(auth_plugin="caching_sha2_password", sha2_full=True,
                       tls_ctx=server_tls_context(tmp_path))
    _drain_all(srv, ssl_mode="require")
    assert srv.tls_used and srv.full_auth_path == ["tls-cleartext"]


def test_native_password_over_tls(tmp_path, _srv_factory):
    """CLIENT_SSL upgrade with the classic plugin: SSLRequest packet,
    wrap, handshake response inside the channel, then a normal dump."""
    from tests.wire_tls import server_tls_context

    srv = _srv_factory(tls_ctx=server_tls_context(tmp_path))
    _drain_all(srv, ssl_mode="require")
    assert srv.tls_used


def test_tls_demanded_but_not_offered(_srv_factory):
    """ssl_mode=require against a server with no CLIENT_SSL capability
    must refuse loudly, never silently downgrade to cleartext."""
    srv = _srv_factory()
    # strip CLIENT_SSL from the advertised caps by monkeypatching the
    # handshake would complicate the fake; instead exercise the client
    # guard directly against the advertised-caps check
    from synch_spark.sources import binlog_socket as BS

    cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                             server_id=99, ssl_mode="require")
    orig = BS._parse_handshake

    def no_ssl_caps(pkt):
        scr, plug, caps = orig(pkt)
        return scr, plug, caps & ~BS._CLIENT_SSL

    BS._parse_handshake = no_ssl_caps
    try:
        with pytest.raises(BinlogProtocolError, match="does not offer TLS"):
            cli.connect()
    finally:
        BS._parse_handshake = orig
        cli.close()


def test_auth_switch_to_caching_sha2(_srv_factory):
    """Advertised native_password but the ACCOUNT uses caching_sha2
    (per-account plugin mismatch): AuthSwitchRequest carries a fresh
    nonce, and the client must answer with the caching_sha2 scramble
    over THAT nonce — then the fast path completes."""
    srv = _srv_factory(switch_to="caching_sha2_password")
    _drain_all(srv)


def test_auth_switch_back_to_native(_srv_factory):
    """The symmetric switch: advertised caching_sha2, account on
    native_password."""
    srv = _srv_factory(auth_plugin="caching_sha2_password",
                       switch_to="mysql_native_password")
    _drain_all(srv)


def test_tls_verify_full_against_ca(tmp_path, _srv_factory):
    """ssl_mode=verify-full with the server cert as ssl_ca: chain AND
    hostname (IP SAN) verification both pass; and verify-full WITHOUT
    the right CA fails the handshake instead of proceeding."""
    import ssl as _ssl

    from tests.wire_tls import server_tls_context

    srv = _srv_factory(tls_ctx=server_tls_context(tmp_path))
    _drain_all(srv, ssl_mode="verify-full", ssl_ca=f"{tmp_path}/srv.crt")
    assert srv.tls_used
    cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                             server_id=99, ssl_mode="verify-full")
    with pytest.raises((_ssl.SSLError, BinlogProtocolError)):
        cli.connect()  # system trust store does not contain our CA
    cli.close()


def test_rsa_oaep_roundtrip_and_pem_parse():
    """Client-side pure-stdlib OAEP encrypt decrypts server-side with
    the real OAEP(SHA-1) padding — the two ends agree bit-for-bit."""
    from synch_spark.sources.binlog_socket import (
        _rsa_oaep_encrypt,
        _rsa_pub_from_pem,
    )
    from tests.wire_tls import rsa_keypair, rsa_oaep_decrypt

    priv, pem = rsa_keypair()
    n, e = _rsa_pub_from_pem(pem)
    assert e == 65537 and n.bit_length() == 2048
    msg = b"secret\x00xor'd payload"
    assert rsa_oaep_decrypt(priv, _rsa_oaep_encrypt(pem, msg)) == msg


def test_restamp_monotone_across_many_chunks(server):
    """>100 transactions in one second must stamp monotonically (the
    continuous counter, not a wrapping band). Simulated by feeding the
    decoder many single-event chunks through the same stream."""
    data, _ = _fixture_binlog()
    cli = BinlogSocketClient("127.0.0.1", server.port, USER, PASSWORD,
                             server_id=99)
    got = list(stream_raw_events(cli, "binlog.000007", 4))
    cli.close()
    stamps = [e["event_unixtime"] for e in got]
    assert stamps == sorted(stamps) and len(set(stamps)) == len(stamps), \
        "stamps must be strictly increasing across chunk boundaries"


# -- GTID auto-position (COM_BINLOG_DUMP_GTID) --------------------------------

SID1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _gtid_fixture_binlog() -> bytes:
    b = BinlogBuilder()
    cols = [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)]
    b.gtid(SID1, 1)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.insert(9, (1, "alice"))
    b.xid(1)
    b.gtid(SID1, 2)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.insert(9, (2, "bob"))
    b.xid(2)
    b.gtid(SID1, 3)
    b.table_map(9, "db", "t", cols, names_tlv=True)
    b.delete(9, (1, "alice"))
    b.xid(3)
    return b.bytes()


def test_gtid_set_text_roundtrip_and_merge():
    from synch_spark.sources.binlog_socket import (
        add_gtid, format_gtid_set, parse_gtid_set,
    )

    gs = parse_gtid_set(f"{SID1}:1-5:9, {SID1.upper()}:7")
    # same UUID in different case folds into one entry; 5,7 stay split
    # until 6 bridges them
    assert gs == {SID1: [(1, 5), (7, 7), (9, 9)]}
    add_gtid(gs, SID1, 6)
    assert gs[SID1] == [(1, 7), (9, 9)]
    assert format_gtid_set(gs) == f"{SID1}:1-7:9"
    assert parse_gtid_set(format_gtid_set(gs)) == gs
    assert parse_gtid_set("") == {}


def test_gtid_wire_encoding_roundtrip():
    from synch_spark.sources.binlog_socket import encode_gtid_set, parse_gtid_set

    gs = parse_gtid_set(f"{SID1}:1-5:9")
    assert _decode_gtid_set(encode_gtid_set(gs)) == gs


def test_gtid_dump_from_empty_set_streams_all_and_tracks_executed():
    srv = FakeMysqlServer(_gtid_fixture_binlog())
    srv.start()
    try:
        cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                                 server_id=99)
        got = list(stream_raw_events(cli, "", 4, gtid_set=""))
        from synch_spark.sources.binlog_socket import format_gtid_set
        executed = format_gtid_set(cli.gtid_executed)
        cli.close()
        assert [(e["action"], e["after"] or e["before"]) for e in got] == [
            ("insert", '{"id": 1, "name": "alice"}'),
            ("insert", '{"id": 2, "name": "bob"}'),
            ("delete", '{"id": 1, "name": "alice"}'),
        ]
        assert executed == f"{SID1}:1-3"
        fname, pos, flags, gs = srv.gtid_requests[-1]
        assert fname == "" and pos == 4 and flags & 0x04 and gs == {}
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_gtid_dump_resume_skips_executed_transactions():
    srv = FakeMysqlServer(_gtid_fixture_binlog())
    srv.start()
    try:
        cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                                 server_id=99)
        got = list(stream_raw_events(cli, "", 4, gtid_set=f"{SID1}:1-2"))
        from synch_spark.sources.binlog_socket import format_gtid_set
        executed = format_gtid_set(cli.gtid_executed)
        cli.close()
        # only transaction 3 (the delete) is new
        assert [(e["action"]) for e in got] == ["delete"]
        assert executed == f"{SID1}:1-3"
        gs = srv.gtid_requests[-1][3]
        assert gs == {SID1: [(1, 2)]}
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_cli_produce_mysql_socket_auto_position(tmp_path, capsys, spark):
    """auto_position: true — the GTID set is the durable cursor: round
    1 streams everything and persists the executed set; round 2 (a new
    process/connection) hands that set back and receives nothing."""
    import json
    import yaml

    from synch_spark.cli import main

    srv = FakeMysqlServer(_gtid_fixture_binlog())
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
                "mysql_socket": {"host": "127.0.0.1", "port": srv.port,
                                 "user": USER, "password": PASSWORD,
                                 "auto_position": True, "gtid_set": ""},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["events"] == 3
        assert out1["cursor"]["gtid_set"] == f"{SID1}:1-3"
        cur = json.loads((tmp_path / "wh" /
                          "_binlog_socket_cursor.json").read_text())
        assert cur["gtid_set"] == f"{SID1}:1-3"
        # round 2: the persisted set goes back to the server; nothing new
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["events"] == 0
        assert out2["cursor"]["gtid_set"] == f"{SID1}:1-3"
        assert srv.gtid_requests[-1][3] == {SID1: [(1, 3)]}
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_parse_gtid_set_malformed_raises_protocol_error():
    """Malformed components raise BinlogProtocolError (what the CLI
    round loop catches), never bare ValueError from uuid/int."""
    from synch_spark.sources.binlog_socket import parse_gtid_set

    for bad in ("3e11fa47:1-5", f"{SID1}:1-x", f"{SID1}:", "nonsense"):
        with pytest.raises(BinlogProtocolError, match="bad GTID set"):
            parse_gtid_set(bad)


def test_cli_refuses_gtid_cursor_downgrade(tmp_path, capsys):
    """Removing auto_position after GTID-mode rounds must refuse: the
    GTID cursor's file may be '' and an empty-filename dump would
    re-stream the entire history as duplicates."""
    import json
    import yaml

    from synch_spark.cli import main

    wh = tmp_path / "wh"
    wh.mkdir()
    (wh / "_binlog_socket_cursor.json").write_text(
        json.dumps({"file": "", "pos": 4, "gtid_set": f"{SID1}:1-3"}))
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(wh),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "events_dir": str(tmp_path / "events"),
            "sources": {},
            "mysql_socket": {"host": "127.0.0.1", "port": 1,
                             "user": USER, "password": PASSWORD},
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    assert main(["--config", str(p), "produce",
                 "--source", "mysql-socket", "--once"]) == 2
    assert "auto_position" in capsys.readouterr().err


def test_gtid_torn_mid_transaction_keeps_inflight_out_of_cursor():
    """The commit-safety claim: a server dying mid-transaction must
    leave that transaction's GTID OUT of gtid_executed — persisting the
    set after such a round would otherwise skip the half-streamed
    transaction forever. (A GTID merges only when its successor GTID
    event or a clean EOF proves the transaction streamed whole.)"""
    full = _gtid_fixture_binlog()
    events = _split_events(full)
    # keep everything up to and including txn 2's XID, then txn 3's
    # GTID + table_map but NOT its row event or any EOF — then hang up
    kept, xids_seen, after_gtid3 = [], 0, 0
    for _start, ev in events:
        kept.append(ev)
        if ev[4] == 0x10:
            xids_seen += 1
        if xids_seen == 2 and ev[4] == 0x21:
            after_gtid3 += 1
        if xids_seen == 2 and after_gtid3 and ev[4] == B.EV_TABLE_MAP:
            break

    # rebuild a binlog holding only the kept events (FDE included)
    torn = full[:4]
    torn += b"".join(ev for _s, ev in events if ev[4] == B.EV_FORMAT_DESCRIPTION)
    torn += b"".join(ev for ev in kept if ev[4] != B.EV_FORMAT_DESCRIPTION)

    class NoEofServer(FakeMysqlServer):
        """Serves the torn fixture and closes WITHOUT the EOF packet."""

        def _serve(self, conn):
            # run the parent's full handshake/auth/dump path but
            # intercept _send: the dump's final EOF packet becomes a
            # hard close — a master crash mid-stream
            orig_send = FakeMysqlServer._send

            def send(conn2, seq, payload):
                if payload[:1] == b"\xfe" and len(payload) == 5:
                    conn2.close()  # die instead of clean EOF
                    return
                orig_send(conn2, seq, payload)

            self._send = send  # type: ignore[method-assign]
            try:
                FakeMysqlServer._serve(self, conn)
            except OSError:
                pass

    srv = NoEofServer(torn)
    srv.start()
    try:
        cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                                 server_id=99)
        with pytest.raises(BinlogProtocolError):
            list(cli.dump_events_gtid(""))
        from synch_spark.sources.binlog_socket import format_gtid_set
        # txns 1-2 fully streamed (proven by successor GTIDs); txn 3's
        # GTID stays pending — never merged without its proof
        assert format_gtid_set(cli.gtid_executed) == f"{SID1}:1-2"
        cli.close()
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_cli_mysql_socket_archives_rounds_as_pseudo_binlog(tmp_path, capsys,
                                                           spark):
    """archive_dir: a round's raw events (FDE included) land as a
    pseudo-binlog whose distributed replay (binlog_files_to_raw)
    reproduces the round's decoded events — the MySQL-side wire audit
    trail, symmetric with the pgoutput frame archive."""
    import json
    import yaml

    from synch_spark.cli import main
    from synch_spark.sources.binlog_file import binlog_files_to_raw

    data, _ = _fixture_binlog()
    srv = FakeMysqlServer(data)
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
                "mysql_socket": {"host": "127.0.0.1", "port": srv.port,
                                 "user": USER, "password": PASSWORD,
                                 "file": "binlog.000007", "pos": 4,
                                 "archive_dir": str(arch)},
            },
        }
        p = tmp_path / "synch.yaml"
        p.write_text(yaml.dump(cfg))
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["events"] == 5
        files = sorted(arch.glob("round.*.bin"))
        assert len(files) == 1
        back = binlog_files_to_raw(spark, str(files[0])).collect()
        acts = sorted((r["action"], r["table"]) for r in back
                      if r["action"] != "query")
        assert acts == [("delete", "t"), ("insert", "t"), ("insert", "t"),
                        ("update", "t")]
    finally:
        srv.stop_evt.set()
        srv.srv.close()


def test_restamp_counter_carries_across_rounds():
    """Two drain rounds inside one wall-clock second must CONTINUE the
    sub-microsecond sequence (stamp_state carried by the caller), not
    both restart at 0 — a pk updated in both rounds would otherwise
    have round N's stamp beat round N+1's under last-write-wins."""
    data, _ = _fixture_binlog()

    def run_round(state):
        srv = FakeMysqlServer(data)
        srv.start()
        try:
            cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                                     server_id=99)
            evs = list(stream_raw_events(cli, "binlog.000007", 4,
                                         stamp_state=state))
            cli.close()
            return [e["event_unixtime"] for e in evs]
        finally:
            srv.stop_evt.set()
            srv.srv.close()

    state: dict = {}
    t1 = run_round(state)
    t2 = run_round(state)
    # the fixture's events share one header second: round 2's stamps
    # must all be strictly greater than round 1's
    assert max(t1) < min(t2), (t1, t2)
    # and without carried state the collision the test exists for happens
    fresh1, fresh2 = run_round({}), run_round({})
    assert max(fresh1) >= min(fresh2)


def test_reversed_gtid_interval_is_refused():
    from synch_spark.sources.binlog_socket import parse_gtid_set

    with pytest.raises(BinlogProtocolError, match="reversed"):
        parse_gtid_set(f"{SID1}:5-1")


def test_connection_reset_mid_dump_is_a_clean_protocol_error():
    """A server that hard-closes mid-packet must surface through the
    protocol-error type the CLI round loop catches (plus OSError for
    resets below the framing layer) — never an unhandled traceback."""
    class DieMidPacket(FakeMysqlServer):
        def _serve(self, conn):
            orig_send = FakeMysqlServer._send

            def send(conn2, seq, payload):
                if payload[:1] == b"\x00" and len(payload) > 30:
                    # claim a packet then close inside it
                    conn2.sendall(len(payload).to_bytes(3, "little")
                                  + bytes([seq % 256]) + payload[:5])
                    conn2.close()
                    raise OSError("died")
                orig_send(conn2, seq, payload)

            self._send = send  # type: ignore[method-assign]
            try:
                FakeMysqlServer._serve(self, conn)
            except OSError:
                pass

    data, _ = _fixture_binlog()
    srv = DieMidPacket(data)
    srv.start()
    try:
        cli = BinlogSocketClient("127.0.0.1", srv.port, USER, PASSWORD,
                                 server_id=99)
        with pytest.raises((BinlogProtocolError, OSError)):
            list(stream_raw_events(cli, "binlog.000007", 4))
        cli.close()
    finally:
        srv.stop_evt.set()
        srv.srv.close()


@pytest.mark.slow
def test_cli_produce_mysql_socket_follow_reconnects(tmp_path, capsys, spark):
    """`produce --follow`: the master dies after the first round; a
    supervised second invocation finds the port refused, re-dials with
    backoff until a restarted master (same port, longer binlog) is up,
    and resumes from the persisted cursor — only the NEW events emit,
    nothing the first round already served."""
    import json as _json
    import os
    import threading
    import time as _time

    import yaml

    from synch_spark.cli import main

    data1, _ = _fixture_binlog()
    # the restarted master's binlog: identical prefix (the builder is
    # deterministic), two more rows appended after the old EOF
    b2 = BinlogBuilder()
    b2.table_map(9, "db", "t",
                 [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                 names_tlv=True)
    b2.insert(9, (1, "alice"), (2, "bob"))
    b2.table_map(9, "db", "t",
                 [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                 names_tlv=True)
    b2.update(9, ((1, "alice"), (1, "alicia")))
    b2.query("db", "ALTER TABLE t ADD COLUMN note VARCHAR(10)")
    b2.table_map(9, "db", "t",
                 [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                 names_tlv=True)
    b2.delete(9, (2, "bob"))
    data_mid = b2.bytes()
    assert data_mid == data1, "prefix must match or the cursor is junk"
    b2.table_map(9, "db", "t",
                 [("id", B.T_LONG, 0), ("name", B.T_VARCHAR, 64)],
                 names_tlv=True)
    b2.insert(9, (7, "gina"), (8, "hugo"))
    data2 = b2.bytes()

    srv1 = FakeMysqlServer(data1)
    srv1.start()
    port = srv1.port
    wh = tmp_path / "wh"
    ev_dir = tmp_path / "events"
    cfg = {
        "core": {"insert_num": 1000, "insert_interval": 1},
        "source_dbs": [{"databases": [{"database": "db", "tables": [
            {"table": "t", "pk": ["id"]}]}]}],
        "spark": {
            "warehouse": str(wh),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "events_dir": str(ev_dir),
            "sources": {},
            "mysql_socket": {
                "host": "127.0.0.1", "port": port,
                "user": USER, "password": PASSWORD,
                "server_id": 123, "file": "binlog.000007", "pos": 4,
                "reconnect_base_s": 0.1, "reconnect_max_s": 0.5,
            },
        },
    }
    p = tmp_path / "synch.yaml"
    p.write_text(yaml.dump(cfg))
    os.makedirs(wh, exist_ok=True)
    srv2 = None
    try:
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once"]) == 0
        out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["events"] == 5
        # kill the master
        srv1.stop_evt.set()
        srv1.srv.close()
        srv1.join(timeout=5)

        restarted = {}

        def restart():
            _time.sleep(0.6)
            restarted["srv"] = FakeMysqlServer(data2, port=port)
            restarted["srv"].start()

        t = threading.Thread(target=restart, daemon=True)
        t.start()
        # supervised round: dials a dead port, backs off, then resumes
        assert main(["--config", str(p), "produce",
                     "--source", "mysql-socket", "--once",
                     "--follow"]) == 0
        t.join()
        srv2 = restarted["srv"]
        cap = capsys.readouterr()
        assert "re-dialing" in cap.err
        out2 = _json.loads(cap.out.strip().splitlines()[-1])
        assert out2["events"] == 2, "resume must emit only the new rows"
        assert out2["cursor"] == {"file": "binlog.000007", "pos": len(data2)}
        # the resumed dump asked for the OLD cursor, not the beginning
        assert srv2.dump_requests[-1][:2] == ("binlog.000007", len(data1))
        got = (spark.read.schema(
            "schema string, table string, action string, before string, "
            "after string, event_unixtime long")
            .json(str(ev_dir)).collect())
        assert len(got) == 7, "no duplicates across the reconnect"
    finally:
        srv1.stop_evt.set()
        srv1.srv.close()
        if srv2 is not None:
            srv2.stop_evt.set()
            srv2.srv.close()
