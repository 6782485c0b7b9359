"""Test-side crypto fixtures for the wire-protocol socket clients.

The PRODUCTION clients are pure stdlib (hashlib + ssl + pow); only the
fake servers need key generation and RSA-OAEP decryption, so the
``cryptography`` dependency stays confined to tests.
"""

from __future__ import annotations

import datetime
import ssl

from cryptography import x509
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import padding, rsa
from cryptography.x509.oid import NameOID

_KEY_CACHE: dict = {}


def rsa_keypair():
    """(private_key, SPKI PEM bytes) — the shape MySQL's
    caching_sha2 public-key exchange hands to the client."""
    if "rsa" not in _KEY_CACHE:
        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        pem = key.public_key().public_bytes(
            serialization.Encoding.PEM,
            serialization.PublicFormat.SubjectPublicKeyInfo)
        _KEY_CACHE["rsa"] = (key, pem)
    return _KEY_CACHE["rsa"]


def rsa_oaep_decrypt(priv, blob: bytes) -> bytes:
    """Server-side RSA_PKCS1_OAEP_PADDING decrypt (SHA-1/MGF1-SHA-1),
    matching what mysqld applies to the full-auth password blob."""
    return priv.decrypt(blob, padding.OAEP(
        mgf=padding.MGF1(algorithm=hashes.SHA1()),
        algorithm=hashes.SHA1(), label=None))


def server_tls_context(tmpdir) -> ssl.SSLContext:
    """Self-signed server context for the fake masters. The cert
    carries an IP SAN for 127.0.0.1 (modern ssl ignores the CN
    fallback), so ``verify-full`` against the written ``srv.crt`` as
    ssl_ca also passes; ``require`` ignores it entirely."""
    import ipaddress

    key, _ = rsa_keypair()
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key()).serial_number(1)
        .not_valid_before(datetime.datetime(2020, 1, 1))
        .not_valid_after(datetime.datetime(2099, 1, 1))
        .add_extension(x509.SubjectAlternativeName([
            x509.IPAddress(ipaddress.IPv4Address("127.0.0.1")),
            x509.DNSName("localhost"),
        ]), critical=False)
        .sign(key, hashes.SHA256()))
    cert_p = f"{tmpdir}/srv.crt"
    key_p = f"{tmpdir}/srv.key"
    with open(cert_p, "wb") as fh:
        fh.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_p, "wb") as fh:
        fh.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption()))
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_p, key_p)
    return ctx
