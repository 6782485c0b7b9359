"""Pure-stdlib Ed25519 (RFC 8032) — sign/verify + the MariaDB
``client_ed25519`` auth token.

Why vendored: MariaDB accounts created with the ``ed25519`` auth plugin
answer the replication handshake with an Ed25519 signature of the
server's nonce, keyed by SHA-512(password) — the scheme the reference's
reader inherits from PyMySQL when tailing MariaDB
(/root/reference/synch/reader/mysql.py:128-153 via
python-mysql-replication). No crypto package is baked into this
container, and one signature per connection makes performance
irrelevant, so a compact big-int implementation is the right tool.

The MariaDB variant differs from RFC 8032 only in WHERE the 64-byte
expanded secret comes from: RFC expands a 32-byte random seed through
SHA-512; MariaDB uses SHA-512(password) directly. With a 32-byte
password equal to an RFC test seed the two produce identical
signatures, which is how tests/test_mariadb_socket.py pins this module
against the RFC's published vectors (an independent oracle).

Signing is deterministic (no RNG) per RFC 8032, so there's no nonce
hazard. Not constant-time — fine for a CLIENT proving knowledge of its
own password, unusable as a server-side verifier of untrusted traffic.
"""

from __future__ import annotations

import hashlib

_P = 2**255 - 19
_L = 2**252 + 27742317777372353535851937790883648493
_D = (-121665 * pow(121666, _P - 2, _P)) % _P
_SQRT_M1 = pow(2, (_P - 1) // 4, _P)  # sqrt(-1) mod p


def _sha512(b: bytes) -> bytes:
    return hashlib.sha512(b).digest()


def _inv(x: int) -> int:
    return pow(x, _P - 2, _P)


# extended homogeneous coordinates (X, Y, Z, T) with x=X/Z, y=Y/Z, T=XY/Z
def _add(p, q):
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % _P
    b = (y1 + x1) * (y2 + x2) % _P
    c = 2 * t1 * t2 * _D % _P
    d = 2 * z1 * z2 % _P
    e, f, g, h = b - a, d - c, d + c, b + a
    return (e * f % _P, g * h % _P, f * g % _P, e * h % _P)


def _mul(s: int, p):
    q = (0, 1, 1, 0)  # neutral element
    while s:
        if s & 1:
            q = _add(q, p)
        p = _add(p, p)
        s >>= 1
    return q


def _recover_x(y: int, sign: int) -> int:
    if y >= _P:
        raise ValueError("point y out of range")
    x2 = (y * y - 1) * _inv(_D * y * y + 1) % _P
    if x2 == 0:
        if sign:
            raise ValueError("invalid point")
        return 0
    x = pow(x2, (_P + 3) // 8, _P)
    if (x * x - x2) % _P:
        x = x * _SQRT_M1 % _P
    if (x * x - x2) % _P:
        raise ValueError("not a square: invalid point")
    if (x & 1) != sign:
        x = _P - x
    return x


_GY = 4 * _inv(5) % _P
_GX = _recover_x(_GY, 0)
_G = (_GX, _GY, 1, _GX * _GY % _P)


def _compress(p) -> bytes:
    x, y, z, _t = p
    zi = _inv(z)
    x, y = x * zi % _P, y * zi % _P
    return ((y | ((x & 1) << 255)).to_bytes(32, "little"))


def _decompress(b: bytes):
    if len(b) != 32:
        raise ValueError("point must be 32 bytes")
    n = int.from_bytes(b, "little")
    sign = n >> 255
    y = n & ((1 << 255) - 1)
    x = _recover_x(y, sign)
    return (x, y, 1, x * y % _P)


def _clamp(h32: bytes) -> int:
    a = int.from_bytes(h32, "little")
    return (a & ((1 << 254) - 8)) | (1 << 254)


def sign_expanded(h64: bytes, msg: bytes) -> bytes:
    """RFC 8032 signature from an already-expanded 64-byte secret
    (``SHA-512(seed)`` in the RFC, ``SHA-512(password)`` in MariaDB)."""
    if len(h64) != 64:
        raise ValueError("expanded secret must be 64 bytes")
    a = _clamp(h64[:32])
    prefix = h64[32:]
    pub = _compress(_mul(a, _G))
    r = int.from_bytes(_sha512(prefix + msg), "little") % _L
    big_r = _compress(_mul(r, _G))
    k = int.from_bytes(_sha512(big_r + pub + msg), "little") % _L
    s = (r + k * a) % _L
    return big_r + s.to_bytes(32, "little")


def sign(seed: bytes, msg: bytes) -> bytes:
    """RFC 8032 Ed25519 sign with a 32-byte seed secret key."""
    return sign_expanded(_sha512(seed), msg)


def public_key(seed: bytes) -> bytes:
    return public_key_expanded(_sha512(seed))


def public_key_expanded(h64: bytes) -> bytes:
    return _compress(_mul(_clamp(h64[:32]), _G))


def verify(pub: bytes, msg: bytes, sig: bytes) -> bool:
    """RFC 8032 verify — used by tests and the fake MariaDB master; the
    production client only signs."""
    if len(sig) != 64:
        return False
    try:
        a_pt = _decompress(pub)
        r_pt = _decompress(sig[:32])
    except ValueError:
        return False
    s = int.from_bytes(sig[32:], "little")
    if s >= _L:
        return False
    k = int.from_bytes(_sha512(sig[:32] + pub + msg), "little") % _L
    left = _mul(s, _G)
    right = _add(r_pt, _mul(k, a_pt))
    # compare affine coordinates: X1/Z1 == X2/Z2 etc.
    x1, y1, z1, _ = left
    x2, y2, z2, _ = right
    return (x1 * z2 - x2 * z1) % _P == 0 and (y1 * z2 - y2 * z1) % _P == 0


def mariadb_ed25519_token(password: str, scramble: bytes) -> bytes:
    """The ``client_ed25519`` auth response: Ed25519 signature of the
    server's nonce under the SHA-512(password) expanded secret."""
    return sign_expanded(_sha512(password.encode("utf-8")), scramble)


def mariadb_ed25519_public_key(password: str) -> bytes:
    """What the server stores for an ed25519 account (``PASSWORD()`` of
    the plugin is base64 of this) — the fake master's verify key."""
    return public_key_expanded(_sha512(password.encode("utf-8")))
