"""RFC 5802/7677 SCRAM client, hash-parameterized — pure stdlib.

Shared by the Postgres walsender tail (SCRAM-SHA-256 with the empty
username libpq sends — PG authenticates the startup-message user) and
the Kafka SASL path (SCRAM-SHA-256 / SCRAM-SHA-512 with the username
carried in-band, the mechanisms AWS MSK / Confluent Cloud clusters
actually require). The math is hmac/hashlib only — the same stdlib-only
discipline as the MySQL caching_sha2 client. Channel binding is not
negotiated (gs2 header ``n,,``), matching libpq and the Java Kafka
client's default SCRAM configuration.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os

__all__ = ["ScramClient", "saslname"]


def saslname(name: str) -> str:
    """RFC 5802 saslname escaping for the ``n=`` attribute: ``=`` and
    ``,`` are the only reserved characters."""
    return name.replace("=", "=3D").replace(",", "=2C")


class ScramClient:
    """Three-legged SCRAM exchange: ``first_message()`` →
    (server-first) → ``final_message()`` → (server-final) →
    ``verify_final()``. ``error_cls`` lets each wire client surface
    failures in its own exception vocabulary (WalProtocolError,
    KafkaWireError) without wrapping at every call site."""

    def __init__(self, username: str, password: str,
                 hash_name: str = "sha256",
                 error_cls: type[Exception] = ValueError,
                 nonce: str | None = None):
        if hash_name not in ("sha256", "sha512"):
            raise ValueError(f"unsupported SCRAM hash {hash_name!r}")
        self.hash_name = hash_name
        self.password = password.encode()
        self.error_cls = error_cls
        # nonce injection exists ONLY so tests can pin the exchange to
        # the RFC 7677 published example values; production always
        # takes the os.urandom path
        self.nonce = nonce or base64.b64encode(os.urandom(18)).decode()
        self.client_first_bare = f"n={saslname(username)},r={self.nonce}"
        self._server_sig: bytes | None = None

    def first_message(self) -> bytes:
        return ("n,," + self.client_first_bare).encode()

    def final_message(self, server_first: bytes) -> bytes:
        parts = dict(p.split("=", 1)
                     for p in server_first.decode().split(","))
        r, s, i = parts["r"], parts["s"], int(parts["i"])
        if not r.startswith(self.nonce):
            raise self.error_cls("SCRAM server nonce mismatch")
        h = self.hash_name
        salted = hashlib.pbkdf2_hmac(h, self.password,
                                     base64.b64decode(s), i)
        client_key = hmac.new(salted, b"Client Key", h).digest()
        stored = hashlib.new(h, client_key).digest()
        without_proof = f"c={base64.b64encode(b'n,,').decode()},r={r}"
        auth_msg = ",".join([self.client_first_bare,
                             server_first.decode(), without_proof]).encode()
        sig = hmac.new(stored, auth_msg, h).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        server_key = hmac.new(salted, b"Server Key", h).digest()
        self._server_sig = hmac.new(server_key, auth_msg, h).digest()
        return (without_proof
                + ",p=" + base64.b64encode(proof).decode()).encode()

    def verify_final(self, server_final: bytes) -> None:
        """The mutual-auth leg: a server that cannot produce the
        signature does not know the password (or a MITM rewrote the
        exchange) — never optional."""
        parts = dict(p.split("=", 1)
                     for p in server_final.decode().split(","))
        if self._server_sig is None or not hmac.compare_digest(
                base64.b64decode(parts["v"]), self._server_sig):
            raise self.error_cls("SCRAM server signature mismatch")
