"""Pluggable commit primitive for the manifest log.

The ONE operation the manifest-log store needs from its storage layer
to be safe under concurrent writers is an atomic *publish-if-absent* of
a small immutable object (the version's log entry): two writers racing
to ``_v/v=<n>.json`` must resolve to exactly one winner, with the loser
told so. Everything else the store does (immutable data-file puts,
reads, GC deletes) is unconditional.

On POSIX that primitive is hard-link-from-temp (``os.link`` fails with
EEXIST if the name is taken, and the linked file carries the COMPLETE
payload — no reader ever sees a partial entry). On object storage it is
a conditional put: S3 ``PutObject`` with ``If-None-Match: *`` (native
since 2024-08), GCS ``x-goog-if-generation-match: 0``, Azure
``If-None-Match: *`` — a single all-or-nothing request, so content
atomicity is inherent. At the 100 TB target the store runs on object
storage, which is why the primitive is extracted here instead of being
an ``os.link`` call inside the table: ``ParquetTable(committer=...)``
swaps the mechanism without touching any commit/GC/restore logic.

Parity note: the reference has no commit protocol at all — it trusts
ClickHouse's server-side atomicity (/root/reference/synch/writer/
__init__.py:21-53). This module is the replacement for that server.

Contract (tests/test_committer.py runs the same suite over every
implementation, including a race-injecting fake object store):

- ``publish(path, payload)`` atomically creates ``path`` with exactly
  ``payload`` iff nothing exists there, else raises
  :class:`AlreadyCommitted` and leaves the existing object untouched.
- The check and the create are ONE atomic primitive — an implementation
  that does exists()-then-put loses an injected race and fails the
  contract suite.
- A raised :class:`AlreadyCommitted` guarantees the caller's payload is
  NOT visible at ``path``.
"""

from __future__ import annotations

import os
import uuid


class AlreadyCommitted(Exception):
    """``publish`` lost the race: the path already holds an object."""


class PreconditionFailed(Exception):
    """Object-store client: a conditional put's precondition failed
    (HTTP 412 — the key already exists)."""


class PosixCommitter:
    """Publish via write-temp + hard-link: ``os.link`` to the final name
    is atomic and fails with EEXIST when the version is taken, and the
    payload is complete before the name exists. The default for local
    and NFS-like roots."""

    def publish(self, path: str, payload: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:12]}.json")
        with open(tmp, "wb") as f:
            f.write(payload)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise AlreadyCommitted(path) from None
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass


class ObjectStoreCommitter:
    """Publish via a SINGLE conditional put — never exists()-then-put,
    which loses the race in the window between the two calls. ``client``
    supplies ``put_if_none_match(key, body)`` raising
    :class:`PreconditionFailed` when the key exists; the object store's
    whole-object put semantics make content atomicity inherent.

    ``key_for`` maps the store's local path to the client's key space
    (identity by default — the in-process store uses real paths; an S3
    client strips a mount prefix into a bucket key).
    """

    def __init__(self, client, key_for=None):
        self.client = client
        self._key_for = key_for or (lambda p: p)

    def publish(self, path: str, payload: bytes) -> None:
        try:
            self.client.put_if_none_match(self._key_for(path), payload)
        except PreconditionFailed:
            raise AlreadyCommitted(path) from None


class LocalObjectStore:
    """In-process object-store client over the local filesystem — the
    reference implementation of the ``put_if_none_match`` client
    contract and the test double for :class:`ObjectStoreCommitter`.
    Keys ARE paths, so a table committed through it stays readable by
    every POSIX read path. The conditional put is genuinely atomic
    (tmp + link, the same kernel primitive S3's If-None-Match emulates
    server-side), so race-injection tests exercise real semantics."""

    def put_if_none_match(self, key: str, body: bytes) -> None:
        d = os.path.dirname(key)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".put-{uuid.uuid4().hex[:12]}")
        with open(tmp, "wb") as f:
            f.write(body)
        try:
            os.link(tmp, key)
        except FileExistsError:
            raise PreconditionFailed(key) from None
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass


def s3_committer(bucket: str, prefix_to_strip: str = ""):
    """S3-backed committer: ``PutObject`` with ``If-None-Match: "*"``
    (supported natively by S3 since 2024-08 and by most S3-compatible
    stores). Import-gated: boto3 is not baked into this container, so
    construction fails with an actionable message instead of an
    ImportError mid-commit. ``prefix_to_strip`` removes the local mount
    prefix from paths before they become bucket keys."""
    try:
        import boto3
        from botocore.exceptions import ClientError
    except ImportError as e:  # pragma: no cover - env without boto3
        raise RuntimeError(
            "s3_committer needs boto3 (pip install boto3) — or use "
            "PosixCommitter / ObjectStoreCommitter(LocalObjectStore()) "
            "for filesystem roots") from e

    s3 = boto3.client("s3")

    class _S3Client:
        def put_if_none_match(self, key: str, body: bytes) -> None:
            if prefix_to_strip and key.startswith(prefix_to_strip):
                key = key[len(prefix_to_strip):].lstrip("/")
            try:
                s3.put_object(Bucket=bucket, Key=key, Body=body,
                              IfNoneMatch="*")
            except ClientError as e:  # pragma: no cover - needs live S3
                code = e.response.get("Error", {}).get("Code", "")
                status = (e.response.get("ResponseMetadata", {})
                          .get("HTTPStatusCode"))
                if code == "PreconditionFailed" or status in (409, 412):
                    raise PreconditionFailed(key) from e
                raise

    return ObjectStoreCommitter(_S3Client())
