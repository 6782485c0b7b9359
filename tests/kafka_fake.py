"""In-process fake Kafka broker — the fake-MySQL-master / fake-walsender
discipline applied to the one remaining contract-only boundary.

Speaks the REAL wire protocol over real sockets: ApiVersions v0,
Metadata v1, CreateTopics v0, Produce v3 (message-format-v2 record
batches), Fetch v4. Request parsing and the batch CRC check are
implemented INDEPENDENTLY here (bitwise CRC32C, no table, no reuse of
the client's codec) so a client-side framing bug cannot self-validate.

Semantics implemented the way a real single broker behaves:

- Produce validates magic=2 and the batch CRC32C, ASSIGNS the base
  offset (rewriting the baseOffset field — legal, it sits outside the
  CRC, and exactly what brokers do on append), and appends the wire
  bytes to the partition log.
- Fetch returns the stored wire batches containing offsets >= the
  fetch offset plus the high watermark; unknown topic/partition ->
  error code 3 (UNKNOWN_TOPIC_OR_PARTITION).
- CreateTopics is idempotent: second create -> error 36
  (TOPIC_ALREADY_EXISTS), matching the reference's swallow
  (synch/broker/kafka.py:66-73).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket
import struct
import threading


def crc32c_bitwise(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


class _R:
    def __init__(self, buf: bytes):
        self.b, self.p = buf, 0

    def take(self, n):
        v = self.b[self.p:self.p + n]
        self.p += n
        return v

    def i8(self):
        return struct.unpack(">b", self.take(1))[0]

    def i16(self):
        return struct.unpack(">h", self.take(2))[0]

    def i32(self):
        return struct.unpack(">i", self.take(4))[0]

    def i64(self):
        return struct.unpack(">q", self.take(8))[0]

    def string(self):
        n = self.i16()
        return None if n < 0 else self.take(n).decode()

    def nbytes(self):
        n = self.i32()
        return None if n < 0 else self.take(n)


def _s(v: str | None) -> bytes:
    if v is None:
        return struct.pack(">h", -1)
    b = v.encode()
    return struct.pack(">h", len(b)) + b


class _ScramServer:
    """Server side of RFC 5802, implemented INDEPENDENTLY of the
    client's sources/scram.py (the broker-side-CRC discipline): the
    server recovers the client key from proof XOR signature and checks
    its hash against the stored key it derived itself."""

    def __init__(self, password: str, hash_name: str):
        self.password = password.encode()
        self.h = hash_name
        self.salt = os.urandom(12)
        self.iters = 4096

    def first(self, client_first: bytes) -> bytes:
        gs2, _, bare = client_first.decode().partition(",,")
        assert gs2 == "n", f"unexpected gs2 header {gs2!r}"
        self.client_first_bare = bare
        attrs = dict(p.split("=", 1) for p in bare.split(","))
        self.username = attrs["n"].replace("=2C", ",").replace("=3D", "=")
        self.snonce = attrs["r"] + base64.b64encode(os.urandom(9)).decode()
        self.server_first = (
            f"r={self.snonce},s={base64.b64encode(self.salt).decode()},"
            f"i={self.iters}")
        return self.server_first.encode()

    def final(self, client_final: bytes) -> bytes | None:
        """server-final message, or None on a bad proof."""
        text = client_final.decode()
        attrs = dict(p.split("=", 1) for p in text.split(","))
        if attrs["r"] != self.snonce:
            return None
        without_proof = text[:text.rindex(",p=")]
        salted = hashlib.pbkdf2_hmac(self.h, self.password,
                                     self.salt, self.iters)
        client_key = hmac.new(salted, b"Client Key", self.h).digest()
        stored = hashlib.new(self.h, client_key).digest()
        auth_msg = ",".join([self.client_first_bare, self.server_first,
                             without_proof]).encode()
        sig = hmac.new(stored, auth_msg, self.h).digest()
        recovered = bytes(a ^ b
                          for a, b in zip(base64.b64decode(attrs["p"]), sig))
        if hashlib.new(self.h, recovered).digest() != stored:
            return None
        server_key = hmac.new(salted, b"Server Key", self.h).digest()
        server_sig = hmac.new(server_key, auth_msg, self.h).digest()
        return b"v=" + base64.b64encode(server_sig)


class FakeKafkaBroker(threading.Thread):
    def __init__(self, port: int = 0, node_id: int = 0, tls_ctx=None,
                 sasl_users: dict[str, str] | None = None,
                 sasl_mechanisms: tuple[str, ...] = (
                     "PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512")):
        super().__init__(daemon=True)
        self.srv = socket.create_server(("127.0.0.1", port))
        self.port = self.srv.getsockname()[1]
        self.node_id = node_id
        #: TLS-from-byte-0 listener when set (like a real SSL listener)
        self.tls_ctx = tls_ctx
        #: {username: password}; set -> EVERY connection must SASL-auth
        #: before any other API (real brokers kill unauthenticated
        #: requests on a SASL listener)
        self.sasl_users = sasl_users
        self.sasl_mechanisms = sasl_mechanisms
        self.authed_users: list[str] = []
        self.auth_failures = 0
        self.stop_evt = threading.Event()
        self.lock = threading.Lock()
        #: topic -> num_partitions
        self.topics: dict[str, int] = {}
        #: (topic, partition) -> [wire batch bytes]; offsets assigned
        self.logs: dict[tuple[str, int], list[bytes]] = {}
        self.log_end: dict[tuple[str, int], int] = {}
        #: first retained offset (retention truncation moves it up)
        self.log_start: dict[tuple[str, int], int] = {}
        #: transactional bookkeeping: open txns {(topic,pid):
        #: {producer_id: first_offset}}; decided aborts [(producer_id,
        #: first_offset, marker_offset)]
        self.open_txn: dict[tuple, dict[int, int]] = {}
        self.aborted_txns: dict[tuple, list[tuple[int, int, int]]] = {}
        #: observability for asserts
        self.produce_crc_checked = 0
        self.api_requests: list[tuple[int, int]] = []
        self.fetch_max_bytes: list[int] = []
        #: True -> truncate the fetch record_set at max_bytes EXACTLY
        #: (possibly mid-batch, zero complete batches in the response) —
        #: the pathological shape the client's max_bytes escalation
        #: exists for. False (default) -> real v3+ behavior: the first
        #: batch returns whole even when it alone exceeds max_bytes.
        self.strict_max_bytes = False
        #: multi-broker simulation: extra (node_id, host, port) rows in
        #: Metadata, and per-(topic, partition) leader overrides — a
        #: Produce/Fetch landing on a non-leader answers error 6
        #: (NOT_LEADER_FOR_PARTITION), like a real cluster
        self.peers: list[tuple[int, str, int]] = []
        self.partition_leaders: dict[tuple[str, int], int] = {}

    # -- lifecycle ----------------------------------------------------------
    def run(self):
        while not self.stop_evt.is_set():
            try:
                self.srv.settimeout(0.2)
                conn, _ = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def stop(self):
        self.stop_evt.set()
        self.srv.close()

    def _serve(self, conn):
        try:
            if self.tls_ctx is not None:
                try:
                    conn = self.tls_ctx.wrap_socket(conn, server_side=True)
                except (OSError, ValueError):
                    return  # a must-fail TLS test aborts the handshake
            f = conn.makefile("rb")
            #: per-connection SASL state: {"authed": bool, "scram": srv}
            state = {"authed": self.sasl_users is None, "scram": None}
            while True:
                head = f.read(4)
                if len(head) < 4:
                    return
                n = struct.unpack(">i", head)[0]
                req = _R(f.read(n))
                api, ver, corr = req.i16(), req.i16(), req.i32()
                req.string()  # client_id
                self.api_requests.append((api, ver))
                if not state["authed"] and api not in (17, 18, 36):
                    return  # real SASL listeners kill the connection
                body = self._dispatch(api, ver, req, state)
                msg = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(msg)) + msg)
                if state.pop("close", False):
                    return  # auth failure: error response sent, then cut
        except OSError:
            pass
        except (struct.error, IndexError, UnicodeDecodeError):
            return  # non-Kafka bytes (e.g. a TLS ClientHello hitting a
            #         plaintext listener): kill the connection quietly,
            #         like a real broker's frame-parse failure
        finally:
            conn.close()

    # -- API handlers ---------------------------------------------------------
    def _dispatch(self, api: int, ver: int, req: _R,
                  state: dict | None = None) -> bytes:
        state = state if state is not None else {"authed": True,
                                                 "scram": None}
        if api == 18:                          # ApiVersions v0
            rows = [(0, 0, 3), (1, 0, 4), (2, 0, 1), (3, 0, 1),
                    (17, 0, 1), (18, 0, 0), (19, 0, 0), (36, 0, 0)]
            return (struct.pack(">hi", 0, len(rows))
                    + b"".join(struct.pack(">hhh", *r) for r in rows))
        if api == 17:                          # SaslHandshake v1
            mech = req.string()
            offered = (b"".join(_s(m) for m in self.sasl_mechanisms))
            if self.sasl_users is None or mech not in self.sasl_mechanisms:
                err = 33                       # UNSUPPORTED_SASL_MECHANISM
            else:
                err = 0
                state["mech"] = mech
            return (struct.pack(">h", err)
                    + struct.pack(">i", len(self.sasl_mechanisms))
                    + offered)
        if api == 36:                          # SaslAuthenticate v0
            token = req.nbytes() or b""
            ok, resp = self._sasl_step(state, token)
            if not ok:
                self.auth_failures += 1
                state["close"] = True
                return (struct.pack(">h", 58)  # SASL_AUTHENTICATION_FAILED
                        + _s("Authentication failed: invalid credentials")
                        + struct.pack(">i", -1))
            return struct.pack(">h", 0) + _s(None) + (
                struct.pack(">i", len(resp)) + resp if resp is not None
                else struct.pack(">i", -1))
        if api == 3:                           # Metadata v1
            n = req.i32()
            names = (list(self.topics) if n < 0
                     else [req.string() for _ in range(n)])
            brokers = ([(self.node_id, "127.0.0.1", self.port)]
                       + list(self.peers))
            out = struct.pack(">i", len(brokers))
            for nid, host, port in brokers:
                out += (struct.pack(">i", nid) + _s(host)
                        + struct.pack(">i", port) + _s(None))
            out += struct.pack(">i", self.node_id)   # controller
            out += struct.pack(">i", len(names))
            for t in names:
                if t in self.topics:
                    parts = self.topics[t]
                    out += struct.pack(">h", 0) + _s(t) + b"\x00"
                    out += struct.pack(">i", parts)
                    for p in range(parts):
                        leader = self.partition_leaders.get(
                            (t, p), self.node_id)
                        out += struct.pack(">hii", 0, p, leader)
                        out += struct.pack(">ii", 1, leader)  # replicas
                        out += struct.pack(">ii", 1, leader)  # isr
                else:
                    out += struct.pack(">h", 3) + _s(t) + b"\x00"
                    out += struct.pack(">i", 0)
            return out
        if api == 19:                          # CreateTopics v0
            n = req.i32()
            resp = struct.pack(">i", n)
            for _ in range(n):
                name = req.string()
                parts, _rf = req.i32(), req.i16()
                for _ in range(req.i32()):     # assignments
                    req.i32()
                    for _ in range(req.i32()):
                        req.i32()
                for _ in range(req.i32()):     # configs
                    req.string(), req.string()
                with self.lock:
                    if name in self.topics:
                        err = 36
                    else:
                        self.topics[name] = max(parts, 1)
                        err = 0
                resp += _s(name) + struct.pack(">h", err)
            req.i32()                          # timeout_ms
            return resp
        if api == 0:                           # Produce v3
            req.string()                       # transactional_id
            req.i16(), req.i32()               # acks, timeout
            n_topics = req.i32()
            resp_topics = b""
            for _ in range(n_topics):
                topic = req.string()
                n_parts = req.i32()
                part_resps = b""
                for _ in range(n_parts):
                    pid = req.i32()
                    batch = req.nbytes() or b""
                    err, base = self._append(topic, pid, batch)
                    part_resps += struct.pack(">ihqq", pid, err, base, -1)
                resp_topics += (_s(topic) + struct.pack(">i", n_parts)
                                + part_resps)
            return (struct.pack(">i", n_topics) + resp_topics
                    + struct.pack(">i", 0))    # throttle
        if api == 2:                           # ListOffsets v1
            req.i32()                          # replica_id
            n_topics = req.i32()
            body = b""
            for _ in range(n_topics):
                topic = req.string()
                n_parts = req.i32()
                parts = b""
                for _ in range(n_parts):
                    pid, ts = req.i32(), req.i64()
                    with self.lock:
                        if topic not in self.topics:
                            parts += struct.pack(">ihqq", pid, 3, -1, -1)
                            continue
                        if self.partition_leaders.get(
                                (topic, pid), self.node_id) != self.node_id:
                            # leader-only API, like Fetch/Produce
                            parts += struct.pack(">ihqq", pid, 6, -1, -1)
                            continue
                        if ts == -2:           # earliest
                            off = self.log_start.get((topic, pid), 0)
                        else:                  # latest
                            off = self.log_end.get((topic, pid), 0)
                    parts += struct.pack(">ihqq", pid, 0, -1, off)
                body += _s(topic) + struct.pack(">i", n_parts) + parts
            return struct.pack(">i", n_topics) + body
        if api == 1:                           # Fetch v4
            req.i32(), req.i32(), req.i32(), req.i32()  # replica/wait/min/max
            iso = req.i8()                     # isolation level
            n_topics = req.i32()
            body = b""
            for _ in range(n_topics):
                topic = req.string()
                n_parts = req.i32()
                parts = b""
                for _ in range(n_parts):
                    pid, off, maxb = req.i32(), req.i64(), req.i32()
                    self.fetch_max_bytes.append(maxb)
                    parts += self._fetch_one(topic, pid, off, maxb, iso)
                body += _s(topic) + struct.pack(">i", n_parts) + parts
            return (struct.pack(">i", 0)       # throttle
                    + struct.pack(">i", n_topics) + body)
        raise AssertionError(f"fake broker: unsupported api {api} v{ver}")

    # -- SASL -----------------------------------------------------------------
    def _sasl_step(self, state: dict, token: bytes):
        """One SaslAuthenticate token → (ok, server_response|None)."""
        mech = state.get("mech")
        if mech is None or self.sasl_users is None:
            return False, None
        if mech == "PLAIN":
            parts = token.split(b"\x00")
            if len(parts) != 3:
                return False, None
            _authzid, user, pwd = (p.decode() for p in parts)
            if self.sasl_users.get(user) != pwd:
                return False, None
            state["authed"] = True
            self.authed_users.append(user)
            return True, None
        # SCRAM-SHA-256 / SCRAM-SHA-512
        hname = "sha256" if mech.endswith("256") else "sha512"
        if state.get("scram") is None:
            try:
                srv = _ScramServer("", hname)
                first = srv.first(token)
            except (AssertionError, KeyError, ValueError,
                    UnicodeDecodeError):
                return False, None
            user = srv.username
            if user not in self.sasl_users:
                return False, None
            srv.password = self.sasl_users[user].encode()
            state["scram"] = srv
            return True, first
        srv = state["scram"]
        try:
            final = srv.final(token)
        except (KeyError, ValueError, UnicodeDecodeError):
            final = None
        if final is None:
            return False, None
        state["authed"] = True
        self.authed_users.append(srv.username)
        return True, final

    # -- log ------------------------------------------------------------------
    def _append(self, topic: str, pid: int, batch: bytes) -> tuple[int, int]:
        with self.lock:
            if topic not in self.topics or pid >= self.topics[topic]:
                return 3, -1                   # UNKNOWN_TOPIC_OR_PARTITION
            if self.partition_leaders.get((topic, pid),
                                          self.node_id) != self.node_id:
                return 6, -1                   # NOT_LEADER_FOR_PARTITION
            if len(batch) < 61 or batch[16] != 2:
                return 87, -1                  # INVALID_RECORD
            # independent CRC check: crc field covers bytes after it
            crc = struct.unpack_from(">I", batch, 17)[0]
            if crc32c_bitwise(batch[21:]) != crc:
                return 46, -1                  # CORRUPT_MESSAGE
            self.produce_crc_checked += 1
            count = struct.unpack_from(">i", batch, 57)[0]
            key = (topic, pid)
            base = self.log_end.get(key, 0)
            # assign the base offset like a real append (outside the CRC)
            stored = struct.pack(">q", base) + batch[8:]
            self.logs.setdefault(key, []).append(stored)
            self.log_end[key] = base + count
            return 0, base

    def truncate_before(self, topic: str, pid: int, offset: int) -> None:
        """Retention truncation: drop whole batches ending before
        ``offset`` and advance the log start — the broker-side event a
        too-slow consumer's cursor falls victim to."""
        with self.lock:
            key = (topic, pid)
            kept = []
            for b in self.logs.get(key, []):
                base = struct.unpack(">q", b[:8])[0]
                count = struct.unpack_from(">i", b, 57)[0]
                if base + count > offset:
                    kept.append(b)
            self.logs[key] = kept
            self.log_start[key] = offset

    def _fetch_one(self, topic: str, pid: int, offset: int,
                   maxb: int = 1 << 20, iso: int = 0) -> bytes:
        with self.lock:
            if topic not in self.topics or pid >= self.topics[topic]:
                return struct.pack(">ihqqi", pid, 3, -1, -1, 0) + \
                    struct.pack(">i", -1)
            if self.partition_leaders.get((topic, pid),
                                          self.node_id) != self.node_id:
                return (struct.pack(">ihqqi", pid, 6, -1, -1, 0)
                        + struct.pack(">i", -1))
            hw = self.log_end.get((topic, pid), 0)
            lso = self._lso(topic, pid)
            if (offset < self.log_start.get((topic, pid), 0)
                    or offset > hw):
                return (struct.pack(">ihqq", pid, 1, hw, lso)  # out of range
                        + struct.pack(">i", 0) + struct.pack(">i", -1))
            out = b""
            lo_base = None
            end = offset
            for b in self.logs.get((topic, pid), []):
                base = struct.unpack(">q", b[:8])[0]
                count = struct.unpack_from(">i", b, 57)[0]
                if base + count <= offset:
                    continue
                if iso == 1 and base >= lso:
                    break  # read_committed never sees undecided data
                if out and len(out) + len(b) > maxb:
                    break  # later batches wait for the next fetch
                out += b
                lo_base = base if lo_base is None else lo_base
                end = base + count
            if self.strict_max_bytes:
                out = out[:maxb]   # may tear the first batch mid-bytes
            # aborted-transactions list (read_committed only), limited
            # to txns OVERLAPPING the returned range [lo_base, end) —
            # a txn entirely before it would leave its producer stuck
            # in the client's aborted set (its marker is not in the
            # response), wrongly dropping that producer's later
            # committed batches
            ab = b""
            n_ab = 0
            if iso == 1 and lo_base is not None:
                for prod, first, marker in self.aborted_txns.get(
                        (topic, pid), []):
                    if first < end and marker >= lo_base:
                        ab += struct.pack(">qq", prod, first)
                        n_ab += 1
            return (struct.pack(">ihqq", pid, 0, hw, lso)
                    + struct.pack(">i", n_ab) + ab
                    + struct.pack(">i", len(out)) + out)

    def append_control(self, topic: str, pid: int) -> int:
        """Append a transaction-marker (CONTROL) batch occupying one
        offset — what an EOS producer's commit/abort marker looks like
        in the log. Returns its assigned offset."""
        from synch_spark.sources.kafka_socket import encode_record_batch

        b = bytearray(encode_record_batch(
            [(b"\x00\x00\x00\x01", b"\x00\x00")]))
        attrs = struct.unpack_from(">h", b, 21)[0] | 0x20
        struct.pack_into(">h", b, 21, attrs)
        struct.pack_into(">I", b, 17, crc32c_bitwise(bytes(b[21:])))
        err, base = self._append(topic, pid, bytes(b))
        assert err == 0, f"append_control: broker error {err}"
        return base

    # -- transactional fixtures ----------------------------------------------
    #: wire offsets within a stored batch: attributes at 21 (payload 0),
    #: producerId at 43 (payload 22), crc at 17 covering bytes 21..
    def _patch_txn(self, b: bytearray, producer_id: int,
                   extra_attrs: int) -> bytes:
        attrs = struct.unpack_from(">h", b, 21)[0] | extra_attrs
        struct.pack_into(">h", b, 21, attrs)
        struct.pack_into(">q", b, 43, producer_id)
        struct.pack_into(">I", b, 17, crc32c_bitwise(bytes(b[21:])))
        return bytes(b)

    def append_txn_batch(self, topic: str, pid: int, records,
                         producer_id: int) -> int:
        """Append a TRANSACTIONAL data batch (attrs bit 0x10, real
        producerId) — the shape an EOS producer writes between
        beginTransaction and commit/abort. Returns the base offset."""
        from synch_spark.sources.kafka_socket import encode_record_batch

        b = bytearray(encode_record_batch(records))
        err, base = self._append(
            topic, pid, self._patch_txn(b, producer_id, 0x10))
        assert err == 0, f"append_txn_batch: broker error {err}"
        with self.lock:
            self.open_txn.setdefault((topic, pid), {}).setdefault(
                producer_id, base)
        return base

    def append_txn_marker(self, topic: str, pid: int, producer_id: int,
                          commit: bool) -> int:
        """End producer_id's open transaction with a COMMIT or ABORT
        control marker; an abort lands the txn in the partition's
        aborted list (what read_committed fetches report)."""
        from synch_spark.sources.kafka_socket import encode_record_batch

        ctype = b"\x00\x01" if commit else b"\x00\x00"
        b = bytearray(encode_record_batch([(b"\x00\x00" + ctype,
                                            b"\x00\x00")]))
        err, marker = self._append(
            topic, pid, self._patch_txn(b, producer_id, 0x30))
        assert err == 0, f"append_txn_marker: broker error {err}"
        with self.lock:
            first = self.open_txn.get((topic, pid), {}).pop(
                producer_id, None)
            if not commit and first is not None:
                self.aborted_txns.setdefault((topic, pid), []).append(
                    (producer_id, first, marker))
        return marker

    def _lso(self, topic: str, pid: int) -> int:
        """Last stable offset: everything below it is decided — the
        min first-offset of still-open transactions, else the hw."""
        hw = self.log_end.get((topic, pid), 0)
        open_firsts = list(self.open_txn.get((topic, pid), {}).values())
        return min(open_firsts) if open_firsts else hw
