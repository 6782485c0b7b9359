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


def _strip(key: str, prefix: str) -> str:
    if prefix and key.startswith(prefix):
        key = key[len(prefix):].lstrip("/")
    return key


def _http_request(url: str, body: bytes, headers: dict, method: str,
                  timeout: float, disp_url: str | None = None) -> None:
    """One conditional-put HTTP round trip. 409/412 → PreconditionFailed
    (the key exists — both codes appear in the wild: GCS ifGenerationMatch
    failures are 412, Azure Put Blob with If-None-Match:* answers 409
    BlobAlreadyExists); anything else non-2xx raises with the response
    body so a misconfigured bucket/auth fails loudly at commit time,
    never silently. ``disp_url`` is what error messages show — the
    Azure client passes a SAS-redacted form so the signature never
    leaks into logs/exceptions."""
    import urllib.error
    import urllib.request

    shown = disp_url or url
    req = urllib.request.Request(url, data=body, headers=dict(headers),
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()
    except urllib.error.HTTPError as e:
        if e.code in (409, 412):
            raise PreconditionFailed(shown) from e
        detail = b""
        try:
            detail = e.read()[:500]
        except OSError:
            pass
        raise RuntimeError(
            f"conditional put failed: HTTP {e.code} {shown} {detail!r}"
        ) from e


def gcs_committer(bucket: str, prefix_to_strip: str = "",
                  token_provider=None,
                  base_url: str = "https://storage.googleapis.com",
                  timeout: float = 10.0):
    """GCS-backed committer: JSON-API media upload with
    ``ifGenerationMatch=0`` — the create-only precondition (a 412 means
    an object generation already exists at the name). Pure stdlib HTTP
    (no google-cloud-storage dependency in this container);
    ``token_provider`` is a zero-arg callable returning a fresh OAuth2
    bearer token (on GCE/GKE, read it from the metadata server).
    ``base_url`` is overridable so the contract suite can run against
    an in-process fake speaking the same protocol."""
    from urllib.parse import quote

    class _GcsClient:
        def put_if_none_match(self, key: str, body: bytes) -> None:
            k = quote(_strip(key, prefix_to_strip), safe="")
            url = (f"{base_url}/upload/storage/v1/b/{bucket}/o"
                   f"?uploadType=media&name={k}&ifGenerationMatch=0")
            headers = {"Content-Type": "application/octet-stream"}
            if token_provider is not None:
                headers["Authorization"] = f"Bearer {token_provider()}"
            # JSON-API simple upload is a POST; the precondition rides
            # in the query string, so it is still ONE atomic request
            _http_request(url, body, headers, "POST", timeout)

    return ObjectStoreCommitter(_GcsClient())


def azure_committer(account: str, container: str, prefix_to_strip: str = "",
                    sas: str | None = None, token_provider=None,
                    base_url: str | None = None, timeout: float = 10.0):
    """Azure-Blob-backed committer: ``Put Blob`` with
    ``If-None-Match: *`` (a 409 BlobAlreadyExists / 412 means the name
    is taken). Pure stdlib HTTP; auth is either a SAS query string
    (``sas``) appended to the URL or a zero-arg ``token_provider``
    returning an AAD bearer token. ``base_url`` (default
    ``https://{account}.blob.core.windows.net``) is overridable for the
    in-process fake in the contract suite."""
    from urllib.parse import quote

    if base_url is None:
        base_url = f"https://{account}.blob.core.windows.net"

    class _AzureClient:
        def put_if_none_match(self, key: str, body: bytes) -> None:
            k = quote(_strip(key, prefix_to_strip))
            url = disp = f"{base_url}/{container}/{k}"
            if sas:
                url += "?" + sas.lstrip("?")
                disp += "?<sas redacted>"  # the sig is a credential
            headers = {
                "x-ms-blob-type": "BlockBlob",
                "x-ms-version": "2021-08-06",
                "If-None-Match": "*",
                "Content-Type": "application/octet-stream",
            }
            if token_provider is not None:
                headers["Authorization"] = f"Bearer {token_provider()}"
            _http_request(url, body, headers, "PUT", timeout,
                          disp_url=disp)

    return ObjectStoreCommitter(_AzureClient())


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


# --------------------------------------------------------------------------
# config plumbing: `spark.committer` in synch.yaml selects the commit
# primitive for EVERY ParquetTable the process opens (cli._load installs
# it; ParquetTable's default resolution consults it). Explicit
# `ParquetTable(committer=...)` always wins over the process default.
# --------------------------------------------------------------------------
_DEFAULT_COMMITTER = None


def set_default_committer(committer) -> None:
    """Install the process-wide default committer (None resets to the
    POSIX hard-link primitive)."""
    global _DEFAULT_COMMITTER
    _DEFAULT_COMMITTER = committer


def default_committer():
    """The process default: whatever set_default_committer installed,
    else a PosixCommitter."""
    return _DEFAULT_COMMITTER or PosixCommitter()


def _token_provider_from_config(spec) -> "object | None":
    """Bearer-token provider from config: ``token`` (a static bearer —
    short-lived; fine for jobs, wrong for daemons) or ``token_url`` (a
    metadata-server endpoint returning ``{"access_token": ...}`` — the
    GCE/GKE and Azure IMDS pattern; fetched fresh per commit, so
    rotation is free). ``token_headers`` rides along (GCE needs
    ``Metadata-Flavor: Google``, the default; Azure IMDS needs
    ``Metadata: true``)."""
    tok = spec.get("token")
    if tok:
        return lambda: str(tok)
    url = spec.get("token_url")
    if not url:
        return None
    headers = dict(spec.get("token_headers")
                   or {"Metadata-Flavor": "Google"})

    def fetch():
        import json as _json
        import urllib.request

        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=10) as r:
            doc = _json.loads(r.read().decode("utf-8"))
        return doc["access_token"]

    return fetch


def committer_from_config(spec) -> "object | None":
    """Build a committer from a `spark.committer` config block:

    .. code-block:: yaml

        spark:
          committer:
            kind: gcs            # posix | local-object-store | s3 | gcs | azure
            bucket: my-bucket    # s3 / gcs
            account: myacct      # azure
            container: tables    # azure
            prefix_to_strip: /mnt/warehouse

    Returns None for an absent block (caller keeps the POSIX default).
    Unknown kinds raise at CONFIG time — a typo must not silently fall
    back to hard-links on a mount that doesn't support them."""
    if not spec:
        return None
    kind = str(spec.get("kind", "posix")).lower().replace("_", "-")
    if kind == "posix":
        return PosixCommitter()
    if kind == "local-object-store":
        return ObjectStoreCommitter(LocalObjectStore())
    strip = spec.get("prefix_to_strip", "")
    if kind == "s3":
        return s3_committer(spec["bucket"], prefix_to_strip=strip)
    if kind == "gcs":
        return gcs_committer(
            spec["bucket"], prefix_to_strip=strip,
            token_provider=_token_provider_from_config(spec),
            base_url=spec.get("base_url", "https://storage.googleapis.com"),
            timeout=float(spec.get("timeout", 10.0)))
    if kind == "azure":
        return azure_committer(
            spec["account"], spec["container"], prefix_to_strip=strip,
            sas=spec.get("sas"),
            token_provider=_token_provider_from_config(spec),
            base_url=spec.get("base_url"),
            timeout=float(spec.get("timeout", 10.0)))
    raise ValueError(f"unknown committer kind: {kind!r}")
