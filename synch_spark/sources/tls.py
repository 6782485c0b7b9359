"""Shared client-side TLS policy for the wire-protocol CDC clients.

Both socket tails (MySQL COM_BINLOG_DUMP, Postgres START_REPLICATION)
negotiate TLS the same way libpq/libmysqlclient do — an in-protocol
STARTTLS upgrade, not TLS-from-byte-0 — so the context policy lives
here once. Modes mirror libpq's sslmode vocabulary (the reference's
users configure managed Postgres/MySQL with exactly these words):

- ``disable``      — plaintext (the default; existing behavior).
- ``require``      — encrypt, no certificate verification (libpq
                     ``sslmode=require``; what RDS quickstarts use).
- ``verify-ca``    — verify the chain against ``ssl_ca``; skip
                     hostname matching.
- ``verify-full``  — verify chain AND hostname.
"""

from __future__ import annotations

import ssl

_MODES = ("disable", "require", "verify-ca", "verify-full")


def make_ssl_context(ssl_mode: str, ssl_ca: str | None = None) -> ssl.SSLContext:
    """Build the client context for a non-``disable`` mode."""
    if ssl_mode not in _MODES:
        raise ValueError(
            f"unsupported ssl_mode {ssl_mode!r}; expected one of {_MODES}")
    if ssl_mode == "disable":
        raise ValueError("make_ssl_context called with ssl_mode=disable")
    if ssl_mode == "require":
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        return ctx
    ctx = ssl.create_default_context(cafile=ssl_ca)
    if ssl_mode == "verify-ca":
        ctx.check_hostname = False
    return ctx
