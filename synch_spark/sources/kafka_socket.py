"""Kafka wire-protocol client — pure stdlib, driver-side.

The reference's broker layer is kafka-python
(/root/reference/synch/broker/kafka.py:21-73: a KafkaProducer created
per process, a single-threaded produce loop, KafkaAdminClient topic
provisioning, and a consumer that ASSIGNS one partition and seeks).
Neither kafka-python nor the spark-sql-kafka connector jar is baked
into this container, so — the same move the MySQL binlog and PG
walsender tails made — this module speaks the documented Kafka protocol
(KIP-98 record batch v2, classic non-flexible request versions) over a
plain socket:

- ``Metadata`` v1 (api 3), ``ApiVersions`` v0 (api 18) — discovery.
- ``CreateTopics`` v0 (api 19) — B5 topic provisioning.
- ``Produce`` v3 (api 0) — message-format-v2 record batches, acks=1.
- ``Fetch`` v4 (api 1) — the assign+seek consume shape (B4): no group
  protocol, the caller owns offsets (this engine's durable cursors).

Scale posture: this is a DRIVER-SIDE tail/bootstrap client, parity
with the reference's own single-threaded loop — NOT the 100 TB bulk
path. Bulk produce/consume belongs to the spark-sql-kafka connector
(distributed, one task per partition), which `broker.kafka_writer`
already targets; this client exists so topic provisioning and the
socket produce/consume contract run, tested, without that jar.

Record batch v2 layout (Kafka protocol guide, "Messagesets"):

    baseOffset int64 | batchLength int32 | partitionLeaderEpoch int32 |
    magic int8 (=2) | crc uint32 (CRC32C of everything past this
    field) | attributes int16 | lastOffsetDelta int32 |
    baseTimestamp int64 | maxTimestamp int64 | producerId int64 |
    producerEpoch int16 | baseSequence int32 | recordCount int32 |
    records (each varint-length-framed, zigzag varints inside)

CRC32C (Castagnoli, reflected poly 0x82F63B78) is NOT zlib.crc32 —
implemented table-driven below; a wrong CRC is rejected by real
brokers, so the codec pins it in tests.
"""

from __future__ import annotations

import socket
import struct

__all__ = [
    "KafkaWireError",
    "KafkaSocketClient",
    "crc32c",
    "encode_record_batch",
    "decode_record_batches",
    "decode_record_batches_ex",
    "decode_record_batches_committed",
]


class KafkaWireError(RuntimeError):
    """Protocol-level failure: unexpected frame, error code, bad CRC."""


class KafkaOffsetOutOfRange(KafkaWireError):
    """Fetch offset outside the log (error 1): the broker's retention
    truncated past the consumer's cursor. Typed so a consume loop can
    deliberately reseek (list_offsets earliest) instead of treating it
    as a generic wire failure — silent data loss must be a visible,
    explicit decision."""


# -- CRC32C (Castagnoli) ----------------------------------------------------
def _crc32c_table():
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_CRC32C_TABLE = _crc32c_table()


def _crc32c_pure(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """Table-driven byte loop (pure stdlib): the fallback when numpy is
    absent, the tail path for unaligned bytes, and the reference the
    vectorized path is tested against. Returns the RUNNING register
    (caller applies the final xor)."""
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


# Vectorized path (VERDICT r11 #5): the pure-Python loop runs ~5 MB/s,
# and on the jar-less distributed backfill EVERY task CRC-checks every
# fetched batch — decode throughput was capped far below the socket.
# CRC is GF(2)-linear in (init, message), which makes it parallelizable:
#
#   raw(M, init) = raw(M, 0) ^ shift_{|M|}(init)          (linearity)
#   raw(A || B, 0) = shift_{|B|}(raw(A, 0)) ^ raw(B, 0)   (concatenation)
#
# where raw() is the register update WITHOUT init/xorout and shift_L()
# is the linear map "process L zero bytes". So: compute each 8-byte
# word's raw remainder independently (8 numpy table gathers across ALL
# words at once — slicing-by-8, every word in parallel), then fold
# pairs log2(n) times with per-level constant shift tables (4 gathers
# per fold). ~2n total table lookups, all vectorized. The RFC 3720
# known-answer pins in tests gate both paths.
_NP = None            # numpy module (probed once)
_WORD_TABLES = None   # (8, 256) uint32: U[j][b] = raw of b at word pos j
_FOLD_TABLES: list = []   # level k: (4, 256) uint32 tables for shift by
#                           8 * 2**k bytes
import threading as _threading  # noqa: E402 — stdlib, for the table lock

#: guards lazy table construction: crc32c runs on DRIVER THREADS too
#: (the concurrent bench, supervised consume loops), and an unguarded
#: list append could land a fold level at the wrong index — silently
#: wrong CRCs for every later large buffer
_TABLE_LOCK = _threading.Lock()


def _shift_zero_bytes(v: int, n: int) -> int:
    for _ in range(n):
        v = _CRC32C_TABLE[v & 0xFF] ^ (v >> 8)
    return v


def _np_setup():
    global _NP, _WORD_TABLES
    import numpy as np

    with _TABLE_LOCK:
        if _NP is not None:        # another thread won the race
            return
        _np_setup_locked(np)


def _np_setup_locked(np):
    global _NP, _WORD_TABLES
    # U[7][b] = raw([b]) = table[b]; U[j] = shift1(U[j+1]) — byte j is
    # followed by (7-j) more bytes within its word
    u = np.empty((8, 256), dtype=np.uint32)
    u[7] = np.array(_CRC32C_TABLE, dtype=np.uint32)
    tbl = u[7]
    for j in range(6, -1, -1):
        u[j] = tbl[u[j + 1] & 0xFF] ^ (u[j + 1] >> np.uint32(8))
    # level 0: shift by 8 bytes, from the scalar zero-byte walk
    f0 = np.empty((4, 256), dtype=np.uint32)
    for k in range(4):
        for b in range(256):
            f0[k, b] = _shift_zero_bytes(b << (8 * k), 8)
    _FOLD_TABLES.append(f0)
    _WORD_TABLES = u
    _NP = np   # published LAST: the unlocked fast path in crc32c keys
    #            on _NP, so every table must be in place before it flips


def _apply_shift(tables, vals):
    """shift_L applied elementwise: 4 table gathers on the crc bytes."""
    return (tables[0][vals & 0xFF]
            ^ tables[1][(vals >> _NP.uint32(8)) & 0xFF]
            ^ tables[2][(vals >> _NP.uint32(16)) & 0xFF]
            ^ tables[3][vals >> _NP.uint32(24)])


def _fold_table(level: int):
    """Tables for shift by 8 * 2**level bytes; built by composing the
    previous level with itself (shift_2L = shift_L ∘ shift_L)."""
    if len(_FOLD_TABLES) <= level:
        with _TABLE_LOCK:
            while len(_FOLD_TABLES) <= level:
                prev = _FOLD_TABLES[-1]
                nxt = _NP.empty((4, 256), dtype=_NP.uint32)
                for k in range(4):
                    base = (_NP.arange(256, dtype=_NP.uint32)
                            << _NP.uint32(8 * k))
                    nxt[k] = _apply_shift(prev, _apply_shift(prev, base))
                _FOLD_TABLES.append(nxt)
    return _FOLD_TABLES[level]


def crc32c(data: bytes) -> int:
    n = len(data)
    if n < 256 or _NP is False:
        return _crc32c_pure(data) ^ 0xFFFFFFFF
    if _NP is None:
        try:
            _np_setup()
        except ImportError:
            globals()["_NP"] = False
            return _crc32c_pure(data) ^ 0xFFFFFFFF
    np = _NP
    m8 = (n // 8) * 8
    words = np.frombuffer(data, dtype=np.uint8, count=m8).reshape(-1, 8)
    r = _WORD_TABLES[0][words[:, 0]]
    for j in range(1, 8):
        r = r ^ _WORD_TABLES[j][words[:, j]]
    # pad with zero-remainders at the FRONT to a power of two: leading
    # zero bytes have raw() == 0 and change nothing
    w = len(r)
    levels = (w - 1).bit_length()
    size = 1 << levels
    if size != w:
        r = np.concatenate([np.zeros(size - w, dtype=np.uint32), r])
    for lev in range(levels):
        tabs = _fold_table(lev)   # right half is 8 * 2**lev bytes long
        r = _apply_shift(tabs, r[0::2]) ^ r[1::2]
    raw_prefix = int(r[0])
    # fold the 0xFFFFFFFF init through the aligned prefix:
    # raw(prefix, init) = raw(prefix, 0) ^ shift_{m8}(init)
    c = 0xFFFFFFFF
    nwords = m8 // 8
    lev = 0
    while nwords:
        if nwords & 1:
            tabs = _fold_table(lev)
            c = int(tabs[0][c & 0xFF] ^ tabs[1][(c >> 8) & 0xFF]
                    ^ tabs[2][(c >> 16) & 0xFF] ^ tabs[3][c >> 24])
        nwords >>= 1
        lev += 1
    c ^= raw_prefix
    return _crc32c_pure(data[m8:], c) ^ 0xFFFFFFFF


# -- primitive codecs --------------------------------------------------------
def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _bytes32(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _zigzag(n: int) -> bytes:
    """Signed varint (zigzag), the record-internal integer encoding."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        if u & ~0x7F:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        else:
            out.append(u)
            return bytes(out)


def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    shift, u = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _vbytes(b: bytes | None) -> bytes:
    if b is None:
        return _zigzag(-1)
    return _zigzag(len(b)) + b


class _Reader:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) < n:
            raise KafkaWireError(
                f"short read: wanted {n}, have {len(b)} at {self.pos}")
        self.pos += n
        return b

    def i8(self):
        return struct.unpack(">b", self.take(1))[0]

    def i16(self):
        return struct.unpack(">h", self.take(2))[0]

    def i32(self):
        return struct.unpack(">i", self.take(4))[0]

    def i64(self):
        return struct.unpack(">q", self.take(8))[0]

    def u32(self):
        return struct.unpack(">I", self.take(4))[0]

    def string(self):
        n = self.i16()
        return None if n < 0 else self.take(n).decode("utf-8")

    def nbytes(self):
        n = self.i32()
        return None if n < 0 else self.take(n)


# -- record batch v2 codec ---------------------------------------------------
def encode_record_batch(records, base_timestamp_ms: int = 0,
                        base_offset: int = 0,
                        compression: str = "none") -> bytes:
    """``records``: [(key: bytes|None, value: bytes|None)] → one
    message-format-v2 batch (no producer id — the shape kafka-python's
    default producer writes). ``compression``: "none" | "gzip" (stdlib
    zlib) | "zstd" (lazy ``zstandard`` import, the binlog
    TRANSACTION_PAYLOAD precedent) — the records section compresses as
    one unit per the spec; the 61-byte header stays uncompressed."""
    recs = bytearray()
    for i, (k, v) in enumerate(records):
        body = b"\x00"                       # record attributes
        body += _zigzag(0)                   # timestampDelta
        body += _zigzag(i)                   # offsetDelta
        body += _vbytes(k) + _vbytes(v)
        body += _zigzag(0)                   # header count
        recs += _zigzag(len(body)) + body
    rec_bytes = bytes(recs)
    if compression == "none":
        codec = _CODEC_NONE
    elif compression == "gzip":
        import gzip as _gzip

        codec, rec_bytes = _CODEC_GZIP, _gzip.compress(rec_bytes)
    elif compression == "zstd":
        try:
            import zstandard
        except ImportError:
            raise KafkaWireError(
                "compression='zstd' needs the zstandard package "
                "(pip install zstandard) — use 'gzip' or 'none'"
            ) from None
        codec, rec_bytes = _CODEC_ZSTD, (
            zstandard.ZstdCompressor().compress(rec_bytes))
    else:
        raise ValueError(
            f"unsupported compression {compression!r} "
            "(none | gzip | zstd)")
    n = len(records)
    head = struct.pack(
        ">hiqqqhii",
        codec,                               # attributes: codec bits
        n - 1,                               # lastOffsetDelta
        base_timestamp_ms, base_timestamp_ms,
        -1, -1, -1,                          # producerId/Epoch/baseSeq
        n,
    )
    crc_payload = head + rec_bytes
    after_len = struct.pack(">ibI", -1, 2, crc32c(crc_payload)) + crc_payload
    return struct.pack(">qi", base_offset, len(after_len)) + after_len


def decode_record_batches(buf: bytes) -> list[tuple[int, bytes | None,
                                                    bytes | None]]:
    """A fetch response's record_set (possibly several concatenated
    batches, possibly a truncated trailing one — brokers send whole
    log segments' worth) → [(offset, key, value)]. CRC-checked."""
    return decode_record_batches_ex(buf)[0]


def _iter_complete_batches(buf: bytes):
    """CRC-checked walk over the COMPLETE batches in a fetch
    record_set: yields (base_offset, payload) where payload is the
    post-CRC region (attributes h(0) lastOffsetDelta i(2) firstTs q(6)
    maxTs q(14) producerId q(22) producerEpoch h(30) baseSequence
    i(32) recordCount i(36) records(40...)). A truncated trailing
    batch is dropped per the broker contract."""
    pos = 0
    while pos + 12 <= len(buf):
        base_offset, batch_len = struct.unpack_from(">qi", buf, pos)
        if pos + 12 + batch_len > len(buf):
            break  # truncated trailing batch: broker contract, skip
        body = buf[pos + 12:pos + 12 + batch_len]
        pos += 12 + batch_len
        magic = body[4]
        if magic != 2:
            raise KafkaWireError(f"unsupported message magic {magic}")
        crc = struct.unpack_from(">I", body, 5)[0]
        payload = body[9:]
        if crc32c(payload) != crc:
            raise KafkaWireError(
                f"record batch CRC32C mismatch at base offset {base_offset}")
        yield base_offset, payload


def _parse_records(payload: bytes, base_offset: int, out: list) -> None:
    """Append the batch's (offset, key, value) records to ``out``."""
    attrs, = struct.unpack_from(">h", payload, 0)
    count, = struct.unpack_from(">i", payload, 36)
    recdata = _decompress_records(attrs & 0x07, payload[40:],
                                  base_offset)
    rp = 0
    for _ in range(count):
        rec_len, rp = _read_zigzag(recdata, rp)
        rec_end = rp + rec_len
        rp += 1                                   # attributes
        _, rp = _read_zigzag(recdata, rp)          # timestampDelta
        off_delta, rp = _read_zigzag(recdata, rp)
        klen, rp = _read_zigzag(recdata, rp)
        key = None if klen < 0 else recdata[rp:rp + klen]
        rp += max(klen, 0)
        vlen, rp = _read_zigzag(recdata, rp)
        val = None if vlen < 0 else recdata[rp:rp + vlen]
        rp = rec_end                               # skip headers
        out.append((base_offset + off_delta, key, val))


#: batch attribute bits beyond the codec (Kafka protocol guide)
_ATTR_TRANSACTIONAL, _ATTR_CONTROL = 0x10, 0x20
#: control record types (key: version int16, type int16)
_CTRL_ABORT, _CTRL_COMMIT = 0, 1


def _control_type(payload: bytes) -> int | None:
    """The control-record type of a CONTROL batch (its single record's
    key is [version int16, type int16]): 0 = ABORT, 1 = COMMIT. None
    for an unparseable/empty marker (treated as unknown, never
    crashes the data path)."""
    try:
        recdata = payload[40:]
        _len, rp = _read_zigzag(recdata, 0)
        rp += 1                                   # record attributes
        _, rp = _read_zigzag(recdata, rp)          # timestampDelta
        _, rp = _read_zigzag(recdata, rp)          # offsetDelta
        klen, rp = _read_zigzag(recdata, rp)
        if klen < 4:
            return None
        _version, ctype = struct.unpack_from(">hh", recdata, rp)
        return ctype
    except (IndexError, struct.error):
        return None


def decode_record_batches_ex(buf: bytes) -> tuple[
        list[tuple[int, bytes | None, bytes | None]], int | None]:
    """Like :func:`decode_record_batches`, but also returns the NEXT
    fetch offset implied by the COMPLETE batches in the buffer
    (``max(baseOffset + lastOffsetDelta + 1)``), or ``None`` when no
    complete batch decoded. The next offset advances past CONTROL
    batches (transaction markers) too — a consume loop that only
    tracked data-record offsets stalls forever on a control-batch-only
    response from an EOS producer, refetching the same offset."""
    return decode_record_batches_committed(buf, None)


def decode_record_batches_committed(
    buf: bytes,
    aborted: "list[tuple[int, int]] | None",
) -> tuple[list[tuple[int, bytes | None, bytes | None]], int | None]:
    """Decode with KIP-98 consumer-side aborted-transaction filtering.

    ``aborted``: the fetch response's aborted-transactions list
    [(producer_id, first_offset)] — ``None`` means read_uncommitted
    (no filtering; every data record surfaces). With a list (possibly
    empty), transactional batches whose producer has an aborted
    transaction covering them are DROPPED, exactly like the Java
    consumer: walking batches in offset order, a producer enters the
    aborted set once the batch offset reaches its first_offset, and
    leaves it at its ABORT control marker. Without this, a rolled-back
    EOS transaction's records surface as data — phantom rows in a CDC
    apply that no ClickHouse/JDBC target ever saw committed upstream.
    next_off accounting is identical to
    :func:`decode_record_batches_ex` (dropped batches still advance
    the cursor)."""
    out: list = []
    next_off: int | None = None
    pending = sorted(aborted or [], key=lambda ab: ab[1])
    aborted_producers: set[int] = set()
    i = 0
    for base_offset, payload in _iter_complete_batches(buf):
        attrs, = struct.unpack_from(">h", payload, 0)
        last_delta, = struct.unpack_from(">i", payload, 2)
        batch_next = base_offset + last_delta + 1
        next_off = batch_next if next_off is None else max(next_off,
                                                           batch_next)
        producer_id, = struct.unpack_from(">q", payload, 22)
        while i < len(pending) and base_offset >= pending[i][1]:
            aborted_producers.add(pending[i][0])
            i += 1
        if attrs & _ATTR_CONTROL:
            # transaction marker: ends this producer's aborted window
            # on ABORT; never surfaces as data either way
            if (aborted is not None
                    and _control_type(payload) == _CTRL_ABORT):
                aborted_producers.discard(producer_id)
            continue
        if (aborted is not None and attrs & _ATTR_TRANSACTIONAL
                and producer_id in aborted_producers):
            continue  # rolled-back transactional data: drop pre-decode
        _parse_records(payload, base_offset, out)
    return out, next_off


#: batch attribute codec ids (Kafka protocol guide)
_CODEC_NONE, _CODEC_GZIP, _CODEC_SNAPPY, _CODEC_LZ4, _CODEC_ZSTD = range(5)


def _decompress_records(codec: int, data: bytes, base_offset: int) -> bytes:
    """The records section of a batch, decompressed per the attribute
    codec bits. gzip is stdlib zlib; zstd rides the same lazy-import
    the binlog TRANSACTION_PAYLOAD decode uses (sources/binlog_file.py);
    snappy/lz4 are loud refusals naming the codec AND the producer-side
    remediation — a compressing producer is a config choice the
    operator can change."""
    if codec == _CODEC_NONE:
        return data
    if codec == _CODEC_GZIP:
        import zlib

        # wbits=47: auto-detect the gzip wrapper java GZIPOutputStream
        # writes (also accepts a bare zlib stream)
        return zlib.decompress(data, 47)
    if codec == _CODEC_ZSTD:
        try:
            import zstandard
        except ImportError:
            raise KafkaWireError(
                f"record batch at offset {base_offset} is zstd-compressed "
                "and no zstd codec is installed — pip install zstandard, "
                "or set compression.type=gzip|none on the producer"
            ) from None
        # decompressobj: Kafka zstd frames omit the content-size header,
        # which the one-shot decompress() API refuses
        return zstandard.ZstdDecompressor().decompressobj().decompress(data)
    name = {_CODEC_SNAPPY: "snappy", _CODEC_LZ4: "lz4"}.get(
        codec, f"codec {codec}")
    raise KafkaWireError(
        f"record batch at offset {base_offset} is {name}-compressed, "
        "which this client does not decode — set compression.type="
        "gzip|zstd|none on the producer (or consume through the "
        "spark-sql-kafka connector)")


# -- the client ---------------------------------------------------------------
_API_PRODUCE, _API_FETCH, _API_LIST_OFFSETS, _API_METADATA = 0, 1, 2, 3
_API_SASL_HANDSHAKE = 17
_API_API_VERSIONS, _API_CREATE_TOPICS = 18, 19
_API_SASL_AUTHENTICATE = 36
_ERR_OFFSET_OUT_OF_RANGE = 1
_ERR_TOPIC_EXISTS = 36
_ERR_UNSUPPORTED_SASL_MECHANISM = 33
_ERR_SASL_AUTHENTICATION_FAILED = 58


class KafkaSocketClient:
    """One broker connection, request/response in lockstep (the client
    sends one in-flight request — the reference's producer behaves the
    same with max_in_flight left at default for this workload size).

    Security (round 12 — real managed clusters are SASL_SSL almost
    universally, and the MySQL/PG tails already carry full auth+TLS):

    - ``ssl_mode``: the shared sources.tls policy vocabulary
      (disable | require | verify-ca | verify-full). Kafka TLS is
      TLS-from-byte-0 (no in-protocol STARTTLS), so any non-disable
      mode wraps the socket before the first request; a plaintext
      listener fails the handshake LOUDLY (there is no downgrade).
    - ``sasl_mechanism``: PLAIN | SCRAM-SHA-256 | SCRAM-SHA-512
      (SaslHandshake v1 + SaslAuthenticate v0; SCRAM via the shared
      sources.scram client — stdlib hmac/hashlib). A broker that does
      not offer the configured mechanism is a loud refusal naming what
      it DOES offer — never a silent downgrade.
    - PLAIN sends the password in the clear inside the channel, so it
      is REFUSED without TLS unless ``allow_plain_without_tls=True``
      (the SASL_PLAINTEXT escape hatch for trusted networks) — the
      cleartext-only-over-TLS discipline the MySQL caching_sha2 path
      follows.
    """

    def __init__(self, host: str, port: int = 9092,
                 client_id: str = "synch-spark", timeout: float = 10.0,
                 ssl_mode: str = "disable", ssl_ca: str | None = None,
                 sasl_mechanism: str | None = None,
                 sasl_username: str | None = None,
                 sasl_password: str | None = None,
                 allow_plain_without_tls: bool = False):
        self.host, self.port = host, int(port)
        self.client_id = client_id
        self.timeout = timeout
        self.ssl_mode = ssl_mode or "disable"
        self.ssl_ca = ssl_ca
        self.sasl_mechanism = sasl_mechanism
        self.sasl_username = sasl_username
        self.sasl_password = sasl_password
        self.allow_plain_without_tls = bool(allow_plain_without_tls)
        if sasl_mechanism is not None:
            if sasl_mechanism not in ("PLAIN", "SCRAM-SHA-256",
                                      "SCRAM-SHA-512"):
                raise ValueError(
                    f"unsupported sasl_mechanism {sasl_mechanism!r} "
                    "(PLAIN | SCRAM-SHA-256 | SCRAM-SHA-512)")
            if sasl_username is None or sasl_password is None:
                raise ValueError(
                    f"sasl_mechanism={sasl_mechanism} needs sasl_username "
                    "and sasl_password")
            if (sasl_mechanism == "PLAIN" and self.ssl_mode == "disable"
                    and not self.allow_plain_without_tls):
                raise ValueError(
                    "SASL PLAIN over a plaintext connection sends the "
                    "password in the clear — use SCRAM-SHA-256/512, set "
                    "ssl_mode (require | verify-ca | verify-full), or "
                    "explicitly opt in with allow_plain_without_tls for "
                    "a trusted network (SASL_PLAINTEXT)")
        self.sock: socket.socket | None = None
        self._corr = 0

    @classmethod
    def from_bootstrap(cls, bootstrap_servers: str, **kw):
        """First host:port of a bootstrap list (single-connection
        client; metadata redirects are not followed — fine against a
        single broker or a LB address)."""
        first = bootstrap_servers.split(",")[0].strip()
        host, _, port = first.partition(":")
        return cls(host, int(port or 9092), **kw)

    @staticmethod
    def security_from_config(kconf: dict) -> dict:
        """spark.kafka.{ssl_mode, ssl_ca, sasl_mechanism, sasl_username,
        sasl_password, allow_plain_without_tls} → constructor kwargs.
        Unset keys fall back to the defaults (plaintext, no auth)."""
        return {
            "ssl_mode": kconf.get("ssl_mode", "disable"),
            "ssl_ca": kconf.get("ssl_ca"),
            "sasl_mechanism": kconf.get("sasl_mechanism"),
            "sasl_username": kconf.get("sasl_username"),
            "sasl_password": kconf.get("sasl_password"),
            "allow_plain_without_tls": bool(
                kconf.get("allow_plain_without_tls", False)),
        }

    def connect(self) -> "KafkaSocketClient":
        self.sock = socket.create_connection((self.host, self.port),
                                             timeout=self.timeout)
        if self.ssl_mode != "disable":
            from synch_spark.sources.tls import make_ssl_context

            ctx = make_ssl_context(self.ssl_mode, self.ssl_ca)
            self.sock = ctx.wrap_socket(self.sock,
                                        server_hostname=self.host)
        if self.sasl_mechanism is not None:
            self._sasl_authenticate()
        return self

    def _sasl_authenticate(self) -> None:
        """SaslHandshake v1 (mechanism negotiation) + SaslAuthenticate
        v0 token exchange. Handshake v1 = auth tokens travel inside
        SaslAuthenticate requests (the modern framing every broker
        since 1.0 speaks), not as raw post-handshake frames."""
        r = self._request(_API_SASL_HANDSHAKE, 1,
                         _str(self.sasl_mechanism))
        err = r.i16()
        offered = [r.string() for _ in range(r.i32())]
        if err == _ERR_UNSUPPORTED_SASL_MECHANISM:
            # downgrade refusal: switching mechanisms silently would
            # e.g. turn a SCRAM config into PLAIN password disclosure
            raise KafkaWireError(
                f"broker does not support SASL mechanism "
                f"{self.sasl_mechanism}; it offers {offered} — fix "
                "sasl_mechanism (no silent downgrade)")
        if err:
            raise KafkaWireError(f"SaslHandshake error {err}")
        if self.sasl_mechanism == "PLAIN":
            token = (b"\x00" + self.sasl_username.encode("utf-8")
                     + b"\x00" + self.sasl_password.encode("utf-8"))
            self._sasl_round(token)
            return
        from synch_spark.sources.scram import ScramClient

        hash_name = ("sha256" if self.sasl_mechanism.endswith("256")
                     else "sha512")
        sc = ScramClient(self.sasl_username, self.sasl_password,
                         hash_name, error_cls=KafkaWireError)
        server_first = self._sasl_round(sc.first_message())
        server_final = self._sasl_round(sc.final_message(server_first))
        sc.verify_final(server_final)

    def _sasl_round(self, token: bytes) -> bytes:
        r = self._request(_API_SASL_AUTHENTICATE, 0, _bytes32(token))
        err = r.i16()
        msg = r.string()
        auth = r.nbytes()
        if err:
            # the broker's message carries no secrets; ours must not
            # either (no username/password in the error text)
            raise KafkaWireError(
                f"SASL authentication failed (error {err}"
                + (f": {msg}" if msg else "") + ")")
        return auth or b""

    def close(self) -> None:
        if self.sock is not None:
            self.sock.close()
            self.sock = None

    def __enter__(self):
        return self.connect()

    def __exit__(self, *exc):
        self.close()

    def _request(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        assert self.sock is not None, "connect() first"
        self._corr += 1
        header = (struct.pack(">hhi", api_key, api_version, self._corr)
                  + _str(self.client_id))
        msg = header + body
        self.sock.sendall(struct.pack(">i", len(msg)) + msg)
        raw = self._read_frame()
        r = _Reader(raw)
        corr = r.i32()
        if corr != self._corr:
            raise KafkaWireError(
                f"correlation id mismatch: sent {self._corr}, got {corr}")
        return r

    def _read_frame(self) -> bytes:
        assert self.sock is not None
        head = self._exactly(4)
        n = struct.unpack(">i", head)[0]
        return self._exactly(n)

    def _exactly(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise KafkaWireError("broker closed the connection")
            buf += chunk
        return buf

    # -- APIs ---------------------------------------------------------------
    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._request(_API_API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise KafkaWireError(f"ApiVersions error {err}")
        out = {}
        for _ in range(r.i32()):
            k, lo, hi = r.i16(), r.i16(), r.i16()
            out[k] = (lo, hi)
        return out

    def metadata(self, topics: list[str] | None = None) -> dict:
        body = struct.pack(">i", -1) if topics is None else (
            struct.pack(">i", len(topics)) + b"".join(_str(t) for t in topics))
        r = self._request(_API_METADATA, 1, body)
        brokers = [(r.i32(), r.string(), r.i32(), r.string())
                   for _ in range(r.i32())]
        controller = r.i32()
        tops: dict = {}
        for _ in range(r.i32()):
            terr, name, _internal = r.i16(), r.string(), r.i8()
            parts = {}
            for _ in range(r.i32()):
                perr, pid, leader = r.i16(), r.i32(), r.i32()
                replicas = [r.i32() for _ in range(r.i32())]
                isr = [r.i32() for _ in range(r.i32())]
                parts[pid] = {"error": perr, "leader": leader,
                              "replicas": replicas, "isr": isr}
            tops[name] = {"error": terr, "partitions": parts}
        return {"brokers": brokers, "controller": controller,
                "topics": tops}

    def create_topic(self, topic: str, num_partitions: int = 1,
                     replication_factor: int = 1,
                     timeout_ms: int = 10_000) -> bool:
        """True = created, False = already existed (the reference's
        TopicAlreadyExists-swallow, synch/broker/kafka.py:66-73);
        anything else raises."""
        body = (struct.pack(">i", 1) + _str(topic)
                + struct.pack(">ih", num_partitions, replication_factor)
                + struct.pack(">i", 0)      # no manual assignments
                + struct.pack(">i", 0)      # no configs
                + struct.pack(">i", timeout_ms))
        r = self._request(_API_CREATE_TOPICS, 0, body)
        n = r.i32()
        for _ in range(n):
            name, err = r.string(), r.i16()
            if name != topic:
                continue
            if err == 0:
                return True
            if err == _ERR_TOPIC_EXISTS:
                return False
            raise KafkaWireError(f"CreateTopics({topic}) error {err}")
        raise KafkaWireError(f"CreateTopics response missing {topic!r}")

    def produce(self, topic: str, partition: int,
                records, acks: int = 1,
                timeout_ms: int = 10_000,
                base_timestamp_ms: int = 0,
                compression: str = "none") -> int:
        """Produce one record batch; returns the broker-assigned base
        offset. ``records``: [(key bytes|None, value bytes|None)].
        acks=1 (leader ack) — the reference's producer default.
        acks=0 is rejected: the broker sends NO Produce response for
        it, which would deadlock this lockstep request/response client
        (and fire-and-forget produce has no place in a CDC tail)."""
        if acks == 0:
            raise ValueError("acks=0 (no broker response) is not "
                             "supported by the lockstep wire client; "
                             "use acks=1 or -1")
        batch = encode_record_batch(records, base_timestamp_ms,
                                    compression=compression)
        body = (_str(None)                      # transactional_id
                + struct.pack(">hi", acks, timeout_ms)
                + struct.pack(">i", 1) + _str(topic)
                + struct.pack(">i", 1) + struct.pack(">i", partition)
                + _bytes32(batch))
        r = self._request(_API_PRODUCE, 3, body)
        for _ in range(r.i32()):
            tname = r.string()
            for _ in range(r.i32()):
                pid, err, base_off = r.i32(), r.i16(), r.i64()
                r.i64()                          # log_append_time
                if tname == topic and pid == partition:
                    if err:
                        raise KafkaWireError(
                            f"Produce({topic}/{partition}) error {err}")
                    return base_off
        raise KafkaWireError("Produce response missing the partition")

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20, max_wait_ms: int = 500,
              isolation: str = "read_uncommitted"
              ) -> tuple[int, list[tuple[int, bytes | None, bytes | None]],
                         int | None]:
        """Assign+seek consume (B4): fetch from an explicit offset,
        return (high_watermark, [(offset, key, value)], next_offset).
        No consumer group — offsets are the caller's durable cursor,
        exactly like the binlog/LSN cursors every other tail keeps.
        ``next_offset`` is the advance implied by every COMPLETE batch
        in the response (control batches included — see
        :func:`decode_record_batches_ex`), or None when the response
        held no complete batch; loops should prefer
        :func:`fetch_progress`, which turns that contract into
        guaranteed forward motion.

        ``isolation="read_committed"``: KIP-98 transactional consume —
        the returned watermark is the LAST STABLE OFFSET (records past
        it belong to still-open transactions), and records from
        ABORTED transactions are filtered out via the response's
        aborted-transactions list (see
        :func:`decode_record_batches_committed`). The default
        read_uncommitted surfaces everything, matching kafka-python's
        default and the reference's consumer."""
        if isolation not in ("read_uncommitted", "read_committed"):
            raise ValueError(
                f"unsupported isolation {isolation!r} "
                "(read_uncommitted | read_committed)")
        committed = isolation == "read_committed"
        body = (struct.pack(">iiii", -1, max_wait_ms, 1, max_bytes)
                + struct.pack(">b", 1 if committed else 0)
                + struct.pack(">i", 1) + _str(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", partition, offset, max_bytes))
        r = self._request(_API_FETCH, 4, body)
        r.i32()                                  # throttle_time_ms
        for _ in range(r.i32()):
            tname = r.string()
            for _ in range(r.i32()):
                pid, err, hw = r.i32(), r.i16(), r.i64()
                lso = r.i64()                    # last_stable_offset
                n_aborted = r.i32()
                aborted = [(r.i64(), r.i64())
                           for _ in range(max(n_aborted, 0))]
                record_set = r.nbytes() or b""
                if tname == topic and pid == partition:
                    if err == _ERR_OFFSET_OUT_OF_RANGE:
                        raise KafkaOffsetOutOfRange(
                            f"Fetch({topic}/{partition}@{offset}): offset "
                            "outside the log (retention truncated past "
                            "the cursor)")
                    if err:
                        raise KafkaWireError(
                            f"Fetch({topic}/{partition}@{offset}) error {err}")
                    if committed:
                        all_recs, next_off = decode_record_batches_committed(
                            record_set, aborted)
                        # records at/past the LSO belong to OPEN
                        # transactions: not yet decided, must not
                        # surface (the Java consumer buffers them; a
                        # cursor-driven tail re-fetches once decided)
                        eff_hw = lso if 0 <= lso <= hw else hw
                        recs = [x for x in all_recs
                                if offset <= x[0] < eff_hw]
                        if next_off is not None:
                            next_off = min(next_off, eff_hw)
                        return eff_hw, recs, next_off
                    all_recs, next_off = decode_record_batches_ex(record_set)
                    recs = [x for x in all_recs if x[0] >= offset]
                    return hw, recs, next_off
        raise KafkaWireError("Fetch response missing the partition")

    def fetch_progress(self, topic: str, partition: int, offset: int,
                       max_bytes: int = 1 << 20, max_wait_ms: int = 500,
                       max_bytes_cap: int = 1 << 26,
                       isolation: str = "read_uncommitted"
                       ) -> tuple[int, list, int]:
        """Fetch with GUARANTEED forward motion — the primitive every
        consume loop should build on (found by the round-11 advice: a
        loop that only advances on data records stalls on control-batch
        responses, and one that breaks out silently skips the rest of
        its pinned range):

        - data records → cursor past the last one AND past any control
          batches the response carried;
        - control-batches-only → cursor past them (no stall on
          EOS/transactional producers);
        - nothing complete with the cursor AT the high watermark →
          (hw, [], offset): genuine end of log;
        - nothing complete BELOW the high watermark → the single next
          batch is larger than ``max_bytes`` (broker truncated the
          response): double max_bytes up to ``max_bytes_cap``, then
          raise — NEVER silently skip (silent data loss must be an
          explicit, visible decision).

        Returns (high_watermark, records, next_cursor) with
        ``next_cursor > offset`` whenever anything below the high
        watermark existed."""
        mb = max_bytes
        while True:
            hw, recs, next_off = self.fetch(topic, partition, offset,
                                            max_bytes=mb,
                                            max_wait_ms=max_wait_ms,
                                            isolation=isolation)
            cur = offset
            if recs:
                cur = recs[-1][0] + 1
            if next_off is not None and next_off > cur:
                cur = next_off                  # past trailing control batches
            if cur > offset or offset >= hw:
                return hw, recs, cur
            if mb >= max_bytes_cap:
                raise KafkaWireError(
                    f"Fetch({topic}/{partition}@{offset}): no complete "
                    f"record batch fits in max_bytes={mb} (cap "
                    f"{max_bytes_cap}) while the high watermark is {hw} "
                    "— a single batch larger than the cap; raise "
                    "max_bytes_cap or re-produce with smaller batches")
            mb = min(mb * 2, max_bytes_cap)

    def list_offsets(self, topic: str, partition: int,
                     timestamp: int = -2) -> int:
        """ListOffsets v1: the log boundary offsets — timestamp -2 =
        earliest (log start after retention), -1 = latest (next offset
        to be assigned = high watermark). The reseek primitive for a
        cursor that fell off the retained log."""
        return self.list_offsets_many(topic, [partition],
                                      timestamp)[partition]

    def list_offsets_many(self, topic: str, partitions, timestamp: int = -2
                          ) -> dict[int, int]:
        """Batched ListOffsets: ALL of this leader's partitions in one
        request — offset planning for a 10k-partition topic must cost
        O(leaders) round trips, not O(partitions) (the wire protocol
        batches natively; issuing per-partition requests threw that
        away)."""
        partitions = list(partitions)
        if not partitions:
            return {}
        body = (struct.pack(">i", -1)            # replica_id
                + struct.pack(">i", 1) + _str(topic)
                + struct.pack(">i", len(partitions))
                + b"".join(struct.pack(">iq", p, timestamp)
                           for p in partitions))
        r = self._request(_API_LIST_OFFSETS, 1, body)
        out: dict[int, int] = {}
        for _ in range(r.i32()):
            tname = r.string()
            for _ in range(r.i32()):
                pid, err, _ts, off = r.i32(), r.i16(), r.i64(), r.i64()
                if tname != topic:
                    continue
                if err:
                    raise KafkaWireError(
                        f"ListOffsets({topic}/{pid}) error {err}")
                out[pid] = off
        missing = set(partitions) - set(out)
        if missing:
            raise KafkaWireError(
                f"ListOffsets response missing partitions {sorted(missing)}")
        return out

    def last_stable_offsets(self, topic: str, partitions,
                            offsets: dict[int, int]) -> dict[int, int]:
        """Each partition's LAST STABLE OFFSET via ONE read_committed
        Fetch over all of this leader's partitions (tiny max_bytes,
        zero wait — the record bytes are discarded; only the LSO field
        matters). The committed-mode end-planning primitive:
        ListOffsets v1 knows only the high watermark. A partition whose
        probe offset fell out of range reports its high watermark
        (planning clamps starts before probing, so this only covers
        races)."""
        partitions = list(partitions)
        if not partitions:
            return {}
        body = (struct.pack(">iiii", -1, 0, 1, 64)
                + struct.pack(">b", 1)           # isolation: read_committed
                + struct.pack(">i", 1) + _str(topic)
                + struct.pack(">i", len(partitions))
                + b"".join(struct.pack(">iqi", p, offsets.get(p, 0), 64)
                           for p in partitions))
        r = self._request(_API_FETCH, 4, body)
        r.i32()                                  # throttle_time_ms
        out: dict[int, int] = {}
        for _ in range(r.i32()):
            tname = r.string()
            for _ in range(r.i32()):
                pid, err, hw = r.i32(), r.i16(), r.i64()
                lso = r.i64()
                for _ in range(max(r.i32(), 0)):  # aborted txns
                    r.i64(), r.i64()
                r.nbytes()                       # record_set: discarded
                if tname != topic:
                    continue
                if err == _ERR_OFFSET_OUT_OF_RANGE:
                    out[pid] = hw
                    continue
                if err:
                    raise KafkaWireError(
                        f"Fetch-LSO({topic}/{pid}) error {err}")
                out[pid] = lso if 0 <= lso <= hw else hw
        missing = set(partitions) - set(out)
        if missing:
            raise KafkaWireError(
                f"Fetch-LSO response missing partitions {sorted(missing)}")
        return out
