"""Per-version stats manifest: one JSON read per merge instead of an
O(files) parquet-footer storm.

``_classify_files`` (the merge's metadata-only write-set discovery)
needs the leading-pk min/max of EVERY current file on EVERY micro-batch.
Reading each file's footer is fine at test scale but at 100 TB it is
thousands of small opens per batch — the dominant driver-side cost of a
merge. File ranges are IMMUTABLE (files never change, hard links keep
the relpath), so they belong in a manifest carried forward across
versions, exactly like Delta's per-file stats in the transaction log:

- ``v=N/_manifest.json`` maps version-relative path -> {"lo", "hi"}
  (``null`` when the file has no provably-exact stats — string pks,
  statless writers; the merge then treats it by bloom/conservative
  rules, same as a footer miss).
- ``refresh_manifest`` carries the previous manifest's entries for
  files still present and footer-reads ONLY the new files (whose
  footers are page-cache-hot right after the write). Run where bloom
  maintenance already runs: per micro-batch and at compaction.
- Readers fall back to the footer for any file missing from the
  manifest, so a stale/absent manifest only costs speed, never
  correctness.

JSON-safety: exact-stat types (_EXACT_STAT_TYPES) are numeric/boolean
only, so lo/hi round-trip losslessly (ints stay ints; floats are
binary64 either side).
"""

from __future__ import annotations

import json
import os

MANIFEST_FILE = "_manifest.json"


def _manifest_path(version_dir: str) -> str:
    return os.path.join(version_dir, MANIFEST_FILE)


def load_manifest(version_dir: str, column: str) -> dict | None:
    """{relpath: (lo, hi) | None} for the given stats column, or None
    when absent / built for a different column."""
    p = _manifest_path(version_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            doc = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn write: fall back to footers
    if doc.get("column") != column:
        return None
    return {
        rel: (None if rng is None else (rng[0], rng[1]))
        for rel, rng in doc["files"].items()
    }


def refresh_manifest(table, column: str) -> int:
    """(Re)build the current version's manifest, reusing the retained
    previous version's entries for files that persist (immutable, keyed
    by relpath) and footer-reading only the new ones. Returns the number
    of files that needed a footer read. Written atomically; concurrent
    refreshes converge (same inputs, same output)."""
    from synch_spark.sources.table import file_key_range

    v = table.current_version()
    if v < 0:
        return 0
    vdir = table._version_dir(v)
    prev: dict = {}
    for pv in table.versions():
        if pv < v:
            prev.update(load_manifest(table._version_dir(pv), column) or {})
    prev.update(load_manifest(vdir, column) or {})  # idempotent re-run

    files: dict[str, tuple | None] = {}
    fresh = 0
    for dirpath, _dirs, names in os.walk(vdir):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, vdir)
            if rel in prev:
                files[rel] = prev[rel]
                continue
            try:
                files[rel] = file_key_range(path, column)
            except Exception:  # noqa: BLE001 — unreadable footer: statless
                files[rel] = None
            fresh += 1
    tmp = _manifest_path(vdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "column": column,
                "files": {
                    rel: (None if rng is None else [rng[0], rng[1]])
                    for rel, rng in files.items()
                },
            },
            f,
        )
    os.replace(tmp, _manifest_path(vdir))
    return fresh
