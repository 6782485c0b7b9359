"""Test-only MySQL binlog v4 byte builder.

Constructs binlog files byte-for-byte per the published event layout
(https://dev.mysql.com/doc/dev/mysql-server/latest/, binary log event
format) so the offline decoder in synch_spark/sources/binlog_file.py
can be pinned against the documented encoding — every field offset,
bitmap convention, packed-BCD DECIMAL group, and the CRC32 trailer —
without a MySQL server in the container. The builder is deliberately
independent code (an encoder written from the spec), so a decoder bug
only passes if the builder makes the *mirror-image* mistake on the
same documented field.
"""

from __future__ import annotations

import struct
import zlib
from decimal import Decimal

from synch_spark.sources import binlog_file as B

SERVER_ID = 1


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


class JsonDiffs(list):
    """Marks an after-image JSON value as a partial diff sequence:
    a list of (op, path, value) where op is 0=REPLACE / 1=INSERT /
    2=REMOVE (value ignored for REMOVE)."""


class BinlogBuilder:
    def __init__(self, server_version: str = "8.0.36", checksum: bool = True,
                 timestamp: int = 1_700_000_000):
        self.checksum = checksum
        self.ts = timestamp
        self.out = bytearray(B.MAGIC)
        self._fde(server_version)

    # --- low-level -------------------------------------------------------
    def _event(self, etype: int, body: bytes) -> None:
        crc_len = 4 if self.checksum else 0
        size = 19 + len(body) + crc_len
        header = struct.pack("<IBIII H".replace(" ", ""), self.ts, etype,
                             SERVER_ID, size, len(self.out) + size, 0)
        ev = header + body
        if self.checksum:
            ev += zlib.crc32(ev).to_bytes(4, "little")
        self.out += ev

    def _fde(self, server_version: str) -> None:
        body = struct.pack("<H", 4)
        body += server_version.encode().ljust(50, b"\x00")
        body += struct.pack("<I", self.ts)
        body += bytes([19])  # common header length
        body += bytes(40)  # post-header length array (unused by the parser)
        if self.checksum:
            body += bytes([1])  # BINLOG_CHECKSUM_ALG_CRC32
        elif B._version_ge(server_version, (5, 6, 1)):
            body += bytes([0])  # alg byte present but OFF
        if B._version_ge(server_version, (5, 6, 1)) and not self.checksum:
            # 5.6+ writes the alg byte and a 4-byte FDE checksum field
            # even when the algorithm is OFF
            body += bytes(4)
        self._event(B.EV_FORMAT_DESCRIPTION, body)

    # --- events ----------------------------------------------------------
    def table_map(self, table_id: int, db: str, table: str, columns,
                  names_tlv: bool = False, unsigned: tuple[int, ...] = (),
                  enum_strs: dict | None = None,
                  set_strs: dict | None = None,
                  extra_tlvs: bytes = b"") -> None:
        """columns: list of (name, type_code, meta). ``unsigned`` lists
        column indices flagged UNSIGNED via the SIGNEDNESS TLV.
        ``extra_tlvs`` is appended raw after the builder-encoded TLVs so
        tests can pin the wire layout with hand-written bytes."""
        body = table_id.to_bytes(6, "little") + struct.pack("<H", 1)
        body += bytes([len(db)]) + db.encode() + b"\x00"
        body += bytes([len(table)]) + table.encode() + b"\x00"
        body += _lenenc(len(columns))
        body += bytes(t for _, t, _ in columns)
        meta = bytearray()
        for _, t, m in columns:
            if t in (B.T_VARCHAR, B.T_VAR_STRING):
                meta += int(m).to_bytes(2, "little")
            elif t in (B.T_STRING, B.T_NEWDECIMAL, B.T_BIT):
                meta += int(m).to_bytes(2, "big")
            elif t in (B.T_BLOB, B.T_TINY_BLOB, B.T_MEDIUM_BLOB, B.T_LONG_BLOB,
                       B.T_FLOAT, B.T_DOUBLE, B.T_TIMESTAMP2, B.T_DATETIME2,
                       B.T_TIME2, B.T_JSON, B.T_GEOMETRY):
                meta += bytes([m])
        body += _lenenc(len(meta)) + bytes(meta)
        body += bytes((len(columns) + 7) // 8)  # null-allowed bitmap
        if names_tlv:
            val = b"".join(
                _lenenc(len(n.encode())) + n.encode() for n, _, _ in columns
            )
            body += bytes([4]) + _lenenc(len(val)) + val  # COLUMN_NAME
        if enum_strs or set_strs:
            # binlog_row_metadata=FULL member strings: one group per
            # SET (resp. ENUM) column in column order; per rows_event.h
            # SET_STR_VALUE=5, ENUM_STR_VALUE=6
            for ttype, real, groups in ((5, B.T_SET, set_strs or {}),
                                        (6, B.T_ENUM, enum_strs or {})):
                targets = [i for i, (_, t, m) in enumerate(columns)
                           if t == B.T_STRING and (m >> 8) == real]
                if not any(i in groups for i in targets):
                    continue
                val = b""
                for i in targets:
                    labs = groups.get(i, [])
                    val += _lenenc(len(labs))
                    for lab in labs:
                        val += _lenenc(len(lab.encode())) + lab.encode()
                body += bytes([ttype]) + _lenenc(len(val)) + val
        if unsigned:
            numeric = [i for i, (_, t, _) in enumerate(columns)
                       if t in (B.T_TINY, B.T_SHORT, B.T_INT24, B.T_LONG,
                                B.T_LONGLONG, B.T_FLOAT, B.T_DOUBLE,
                                B.T_NEWDECIMAL, B.T_DECIMAL)]
            bm = bytearray((len(numeric) + 7) // 8)
            for k, i in enumerate(numeric):
                if i in unsigned:
                    bm[k // 8] |= 0x80 >> (k % 8)  # MSB-first
            body += bytes([1]) + _lenenc(len(bm)) + bytes(bm)  # SIGNEDNESS
        body += extra_tlvs
        self._event(B.EV_TABLE_MAP, body)
        self._columns = columns

    def _rows_body(self, table_id: int, etype: int, images) -> bytes:
        ncols = len(self._columns)
        bm_len = (ncols + 7) // 8
        present = bytes([0xFF] * bm_len)
        body = table_id.to_bytes(6, "little") + struct.pack("<H", 1)
        if etype in B._ROWS_V2:
            body += struct.pack("<H", 2)  # extra_data_len (just itself)
        body += _lenenc(ncols) + present
        if etype in B._ROWS_UPDATE:
            body += present
        for image in images:
            body += self._image(image)
        return body

    def _image(self, values) -> bytes:
        ncols = len(self._columns)
        null_bm = bytearray((ncols + 7) // 8)
        payload = bytearray()
        for i, ((_, t, m), v) in enumerate(zip(self._columns, values)):
            if v is None:
                null_bm[i // 8] |= 1 << (i % 8)
                continue
            payload += _enc_value(t, m, v)
        return bytes(null_bm) + bytes(payload)

    def insert(self, table_id: int, *rows) -> None:
        self._event(B.EV_WRITE_ROWS_V2,
                    self._rows_body(table_id, B.EV_WRITE_ROWS_V2, rows))

    def delete(self, table_id: int, *rows) -> None:
        self._event(B.EV_DELETE_ROWS_V2,
                    self._rows_body(table_id, B.EV_DELETE_ROWS_V2, rows))

    def update(self, table_id: int, *pairs) -> None:
        """pairs: (before_values, after_values) tuples."""
        flat = [img for pair in pairs for img in pair]
        self._event(B.EV_UPDATE_ROWS_V2,
                    self._rows_body(table_id, B.EV_UPDATE_ROWS_V2, flat))

    def insert_v1(self, table_id: int, *rows) -> None:
        self._event(B.EV_WRITE_ROWS_V1,
                    self._rows_body(table_id, B.EV_WRITE_ROWS_V1, rows))

    def partial_update(self, table_id: int, *pairs,
                       force_options: int | None = None) -> None:
        """PARTIAL_UPDATE_ROWS_EVENT (0x27, WL#2955): ``pairs`` are
        (before_values, after_values); an after value wrapped in
        :class:`JsonDiffs` encodes as a partial JSON diff sequence
        instead of a full JSONB document. ``force_options`` overrides
        the value_options byte (e.g. 0 = the full-image form the server
        emits when diffs wouldn't be smaller)."""
        ncols = len(self._columns)
        bm_len = (ncols + 7) // 8
        present = bytes([0xFF] * bm_len)
        body = table_id.to_bytes(6, "little") + struct.pack("<H", 1)
        body += struct.pack("<H", 2)  # extra_data_len (just itself)
        body += _lenenc(ncols) + present + present
        json_cols = [i for i, (_, t, _m) in enumerate(self._columns)
                     if t == B.T_JSON]
        for before, after in pairs:
            body += self._image(before)
            any_partial = any(isinstance(v, JsonDiffs) for v in after)
            opts = force_options if force_options is not None \
                else (1 if any_partial else 0)
            body += _lenenc(opts)
            if opts & 1:
                pbits = bytearray((len(json_cols) + 7) // 8)
                for k, ci in enumerate(json_cols):
                    if isinstance(after[ci], JsonDiffs):
                        pbits[k // 8] |= 1 << (k % 8)
                body += bytes(pbits)
            null_bm = bytearray(bm_len)
            payload = bytearray()
            for i, ((_, t, m), v) in enumerate(zip(self._columns, after)):
                if v is None:
                    null_bm[i // 8] |= 1 << (i % 8)
                    continue
                if isinstance(v, JsonDiffs):
                    seq = bytearray()
                    for op, path, val in v:
                        seq += bytes([op]) + _lenenc(len(path.encode()))
                        seq += path.encode()
                        if op != 2:  # REMOVE carries no value
                            jb = jsonb_encode(val)
                            seq += _lenenc(len(jb)) + jb
                    payload += len(seq).to_bytes(m or 4, "little") + seq
                else:
                    payload += _enc_value(t, m, v)
            body += bytes(null_bm) + bytes(payload)
        self._event(B.EV_PARTIAL_UPDATE_ROWS, body)

    def query(self, db: str, sql: str) -> None:
        body = struct.pack("<IIBHH", 7, 0, len(db), 0, 0)
        body += db.encode() + b"\x00" + sql.encode()
        self._event(B.EV_QUERY, body)

    def gtid(self, sid: str, gno: int) -> None:
        """GTID_LOG_EVENT (0x21): flags(1) + SID(16) + GNO(8 LE)."""
        import uuid as _uuid

        body = b"\x01" + _uuid.UUID(sid).bytes + gno.to_bytes(8, "little")
        self._event(0x21, body)

    def xid(self, xid: int = 1) -> None:
        """XID_EVENT (0x10): the transaction commit marker."""
        self._event(0x10, struct.pack("<Q", xid))

    def mariadb_gtid(self, domain: int, seq: int, flags: int = 0) -> None:
        """MariaDB GTID_EVENT (0xA2): seq(8 LE) + domain(4 LE) +
        flags2(1); the server_id rides in the event header (the
        builder's SERVER_ID), completing the domain-server-seq triple."""
        body = (seq.to_bytes(8, "little") + domain.to_bytes(4, "little")
                + bytes([flags]))
        self._event(0xA2, body)

    def transaction_payload(self, build_inner, comp_type: int = 255,
                            with_size: bool = True,
                            uncompressed_size: int | None = None,
                            raw_payload: bytes | None = None) -> None:
        """TRANSACTION_PAYLOAD_EVENT (0x28): wrap the events that
        ``build_inner(b)`` emits on a scratch builder into one
        compressed-transaction envelope (TLV header per the 8.0 wire
        format; inner events are written WITHOUT per-event checksums,
        as the server does). ``raw_payload`` overrides the payload
        bytes for adversarial shapes."""
        if raw_payload is None:
            inner = BinlogBuilder(checksum=False, timestamp=self.ts)
            prefix = len(inner.out)  # magic + FDE are NOT in a payload
            build_inner(inner)
            payload = bytes(inner.out[prefix:])
            if comp_type == 0:
                import zstandard

                if uncompressed_size is None:
                    uncompressed_size = len(payload)
                payload = zstandard.ZstdCompressor().compress(payload)
        else:
            payload = raw_payload
        body = _lenenc(2) + _lenenc(len(_lenenc(comp_type))) \
            + _lenenc(comp_type)
        if uncompressed_size is not None:
            body += _lenenc(3) + _lenenc(len(_lenenc(uncompressed_size))) \
                + _lenenc(uncompressed_size)
        if with_size:
            body += _lenenc(1) + _lenenc(len(_lenenc(len(payload)))) \
                + _lenenc(len(payload))
        body += _lenenc(0)  # header end mark
        self._event(0x28, body + payload)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _enc_value(t: int, m: int, v) -> bytes:
    if t == B.T_TINY:
        return (v & 0xFF).to_bytes(1, "little")
    if t == B.T_SHORT:
        return (v & 0xFFFF).to_bytes(2, "little")
    if t == B.T_INT24:
        return (v & 0xFFFFFF).to_bytes(3, "little")
    if t == B.T_LONG:
        return (v & 0xFFFFFFFF).to_bytes(4, "little")
    if t == B.T_LONGLONG:
        return (v & (1 << 64) - 1).to_bytes(8, "little")
    if t == B.T_YEAR:
        return bytes([v - 1900 if v else 0])
    if t == B.T_FLOAT:
        return struct.pack("<f", v)
    if t == B.T_DOUBLE:
        return struct.pack("<d", v)
    if t in (B.T_VARCHAR, B.T_VAR_STRING):
        raw = v.encode() if isinstance(v, str) else bytes(v)
        pre = len(raw).to_bytes(2, "little") if m > 255 else bytes([len(raw)])
        return pre + raw
    if t in (B.T_BLOB, B.T_GEOMETRY):
        raw = v.encode() if isinstance(v, str) else bytes(v)
        return len(raw).to_bytes(m, "little") + raw
    if t == B.T_NEWDECIMAL:
        return _enc_decimal(Decimal(v), m >> 8, m & 0xFF)
    if t == B.T_DATE:
        y, mo, d = (int(x) for x in str(v).split("-"))
        return ((y << 9) | (mo << 5) | d).to_bytes(3, "little")
    if t == B.T_DATETIME2:
        return _enc_datetime2(str(v), m)
    if t == B.T_TIME2:
        # one signed fixed-point over 3+frac bytes, offset-binary
        nb = (m + 1) // 2
        text = str(v)
        neg = text.startswith("-")
        hms, _, frac = text.lstrip("-").partition(".")
        h, mi, s = (int(x) for x in hms.split(":"))
        micros = int(frac.ljust(6, "0")[:6]) if frac else 0
        packed = ((h << 12) | (mi << 6) | s) << (8 * nb)
        if nb:
            packed += micros // 10 ** (6 - 2 * nb)
        if neg:
            packed = -packed
        return (packed + (0x800000 << (8 * nb))).to_bytes(3 + nb, "big")
    if t == B.T_BIT:
        bits = (m & 0xFF) * 8 + (m >> 8)
        return int(v).to_bytes((bits + 7) // 8, "big")
    if t == B.T_STRING:
        real, ml = m >> 8, m & 0xFF
        if real in (B.T_ENUM, B.T_SET):
            return int(v).to_bytes(ml, "little")
        raw = v.encode() if isinstance(v, str) else bytes(v)
        pre = len(raw).to_bytes(2, "little") if ml > 255 else bytes([len(raw)])
        return pre + raw
    if t == B.T_JSON:
        blob = v if isinstance(v, (bytes, bytearray)) else jsonb_encode(v)
        return len(blob).to_bytes(m or 4, "little") + bytes(blob)
    raise NotImplementedError(f"builder: type 0x{t:02x}")


def _enc_decimal(v: Decimal, prec: int, scale: int) -> bytes:
    import decimal as _d

    neg = v < 0
    with _d.localcontext() as ctx:
        ctx.prec = 65  # MySQL's max; default 28 overflows DECIMAL(30+)
        q = abs(v).quantize(Decimal(1).scaleb(-scale) if scale else Decimal(1))
    text = f"{q:f}"
    ip, _, fp = text.partition(".")
    fp = fp.ljust(scale, "0")[:scale]
    intg = prec - scale
    ip = ip.zfill(intg)
    d2b = B._DIGITS_TO_BYTES
    intg0, intg_rem = divmod(intg, 9)
    frac0, frac_rem = divmod(scale, 9)
    buf = bytearray()
    pos = 0
    if intg_rem:
        buf += int(ip[:intg_rem] or "0").to_bytes(d2b[intg_rem], "big")
        pos = intg_rem
    for _ in range(intg0):
        buf += int(ip[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    pos = 0
    for _ in range(frac0):
        buf += int(fp[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    if frac_rem:
        buf += int(fp[pos : pos + frac_rem] or "0").to_bytes(d2b[frac_rem], "big")
    buf[0] |= 0x80  # positive marker
    if neg:
        buf = bytearray(b ^ 0xFF for b in buf)
    return bytes(buf)


def _enc_datetime2(text: str, fsp: int) -> bytes:
    date_part, _, time_part = text.partition(" ")
    y, mo, d = (int(x) for x in date_part.split("-"))
    hms, _, frac = time_part.partition(".")
    h, mi, s = (int(x) for x in hms.split(":"))
    micros = int(frac.ljust(6, "0")) if frac else 0
    ip = ((y * 13 + mo) << 22) | (d << 17) | (h << 12) | (mi << 6) | s
    out = (ip + 0x8000000000).to_bytes(5, "big")
    nb = (fsp + 1) // 2
    if nb:
        out += (micros // 10 ** (6 - 2 * nb)).to_bytes(nb, "big")
    return out


# --- independent binary-JSON encoder (json_binary.h, for T_JSON tests) ---
def _jsonb_varint_enc(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _jsonb_val(v, large: bool):
    if v is None:
        return 0x04, b"\x00"
    if v is True:
        return 0x04, b"\x01"
    if v is False:
        return 0x04, b"\x02"
    if isinstance(v, int):
        if -(2**15) <= v < 2**15:
            return 0x05, v.to_bytes(2, "little", signed=True)
        if -(2**31) <= v < 2**31:
            return 0x07, v.to_bytes(4, "little", signed=True)
        if -(2**63) <= v < 2**63:
            return 0x09, v.to_bytes(8, "little", signed=True)
        return 0x0A, v.to_bytes(8, "little")
    if isinstance(v, float):
        return 0x0B, struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode()
        return 0x0C, _jsonb_varint_enc(len(raw)) + raw
    if isinstance(v, Decimal):
        digits = v.as_tuple()
        scale = max(0, -digits.exponent)
        prec = max(len(digits.digits), scale)
        pl = bytes([prec, scale]) + _enc_decimal(v, prec, scale)
        return 0x0F, bytes([B.T_NEWDECIMAL]) + _jsonb_varint_enc(len(pl)) + pl
    if isinstance(v, (list, dict)):
        return _jsonb_container(v, large)
    raise NotImplementedError(f"jsonb encoder: {type(v)}")


def _jsonb_container(v, large: bool):
    w = 4 if large else 2
    obj = isinstance(v, dict)
    items = list(v.items()) if obj else [(None, x) for x in v]
    n = len(items)
    header = 2 * w + (n * (w + 2) if obj else 0) + n * (1 + w)
    keys_blob = b"".join(k.encode() for k, _ in items) if obj else b""
    key_entries = bytearray()
    if obj:
        off = header
        for k, _ in items:
            kb = k.encode()
            key_entries += off.to_bytes(w, "little")
            key_entries += len(kb).to_bytes(2, "little")
            off += len(kb)
    inline_ok = {0x04, 0x05, 0x06} | ({0x07, 0x08} if large else set())
    vstart = header + len(keys_blob)
    value_entries = bytearray()
    vals_blob = bytearray()
    for _, x in items:
        t, payload = _jsonb_val(x, large)
        if t in inline_ok and len(payload) <= w:
            value_entries += bytes([t]) + payload.ljust(w, b"\x00")
        else:
            off = vstart + len(vals_blob)
            value_entries += bytes([t]) + off.to_bytes(w, "little")
            vals_blob += payload
    body = bytearray()
    body += n.to_bytes(w, "little")
    body += (header + len(keys_blob) + len(vals_blob)).to_bytes(w, "little")
    body += key_entries + value_entries + keys_blob + vals_blob
    t = ((0x01 if obj else 0x03) if large else (0x00 if obj else 0x02))
    return t, bytes(body)


def jsonb_encode(v, large: bool = False) -> bytes:
    """Whole binary-JSON document: type byte + payload."""
    t, payload = _jsonb_val(v, large)
    return bytes([t]) + payload
