"""Per-file Bloom-filter index for the versioned parquet store.

Footer min/max stats (file_key_range) prune a file only when the batch's
keys miss its [lo, hi] range entirely. Files with INTERLEAVED keys —
unclustered appends, overlapping compaction outputs — have wide ranges
that overlap every batch, so min/max proves nothing and the CoW merge
rewrites them for no reason. A Bloom filter answers the sharper
question "could ANY of these keys be in this file?" with no false
negatives, cutting rewrites to files that (almost certainly) hold a
touched key. This is Delta's bloom-filter-index / Hudi's bloom-index
idea, rebuilt on the same sidecar-file principle.

Design constraints that make it cheap:

- Data files are uuid-named and IMMUTABLE; hard-linked copies keep the
  basename across versions. Sidecars are therefore keyed by basename in
  one flat `<root>/_bloom/` dir — no version bookkeeping, links carry
  their bloom for free, and a sidecar is write-once like its file.
- Missing sidecar = no pruning claim (falls back to min/max semantics);
  stale sidecars for deleted files are inert garbage removed with old
  versions.
- Double hashing (Kirsch-Mitzenmacher): bit_i = (h1 + i*h2) mod m with
  h1/h2 from one blake2b digest — k probes from one hash evaluation.

The build here reads each file's key column via pyarrow on the driver —
right for maintenance jobs at this repo's scale; a production cluster
builds the same artifact inside the write job (per-partition
mapInPandas emitting (basename, bits)) with identical on-disk format.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

import numpy as np

FPP_BITS_PER_KEY = 10  # ~1% false-positive rate at k=7
NUM_HASHES = 7


def _hashes(value) -> tuple[int, int]:
    """(h1, h2) for a key value; type-stable via repr of the canonical
    python value (int/str/bytes) so build and probe agree."""
    if isinstance(value, bytes):
        raw = b"b:" + value
    elif isinstance(value, int):
        raw = b"i:" + str(value).encode()
    else:
        raw = b"s:" + str(value).encode()
    d = hashlib.blake2b(raw, digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _bloom_dir(root: str) -> str:
    return os.path.join(root, "_bloom")


def _sidecar(root: str, basename: str) -> str:
    return os.path.join(_bloom_dir(root), basename + ".bloom.json")


def build_file_blooms(table, column: str) -> int:
    """Create sidecars for every current-version data file that lacks
    one. Returns the number of sidecars written. Idempotent; safe to run
    after every commit or only from maintenance (optimize)."""
    import pyarrow.parquet as pq

    os.makedirs(_bloom_dir(table.root), exist_ok=True)
    built = 0
    vdir = table._version_dir(table.current_version())
    for dirpath, _dirs, files in os.walk(vdir):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            out = _sidecar(table.root, name)
            if os.path.exists(out):
                continue
            path = os.path.join(dirpath, name)
            col = pq.read_table(path, columns=[column]).column(0)
            values = [v for v in col.to_pylist() if v is not None]
            n = max(len(values), 1)
            m = int(n * FPP_BITS_PER_KEY) + 8
            bits = np.zeros((m + 7) // 8, dtype=np.uint8)
            for v in values:
                h1, h2 = _hashes(v)
                for i in range(NUM_HASHES):
                    b = (h1 + i * h2) % m
                    bits[b >> 3] |= 1 << (b & 7)
            tmp = out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"column": column, "m": m, "k": NUM_HASHES,
                     "bits": base64.b64encode(bits.tobytes()).decode()},
                    f,
                )
            os.replace(tmp, out)
            built += 1
    return built


def load_bloom(root: str, basename: str, column: str):
    """(m, k, bits ndarray) or None when absent/for a different column."""
    path = _sidecar(root, basename)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        spec = json.load(f)
    if spec.get("column") != column:
        return None
    bits = np.frombuffer(base64.b64decode(spec["bits"]), dtype=np.uint8)
    return spec["m"], spec["k"], bits


def might_contain_any(bloom, keys) -> bool:
    """True unless the bloom PROVES none of ``keys`` is in the file.
    No false negatives: a True may be spurious (~FPP per key), a False
    is definitive."""
    m, k, bits = bloom
    for v in keys:
        h1, h2 = _hashes(v)
        for i in range(k):
            b = (h1 + i * h2) % m
            if not (bits[b >> 3] >> (b & 7)) & 1:
                break
        else:
            return True
    return False


def prune_files(table, column: str, keys) -> list[str] | None:
    """Current-version data files that might hold any of ``keys`` in
    ``column``, by footer min/max refined with Bloom sidecars — no data
    pages read. None when pruning can't prove anything for some file
    (missing/unorderable stats AND no bloom): callers must then scan
    normally. An empty list is a proof that NO file holds any key."""
    import bisect

    from synch_spark.sources.table import file_key_range

    sk = sorted(keys)
    if not sk or any(k is None for k in sk):
        return None
    out: list[str] = []
    vdir = table._version_dir(table.current_version())
    for dirpath, _dirs, files in os.walk(vdir):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, name)
            bl = load_bloom(table.root, name, column)
            try:
                rng = file_key_range(path, column)
            except Exception:  # unreadable footer: treat as statless
                rng = None
            if rng is None:
                if bl is None:
                    return None  # this file is unprovable either way
                if might_contain_any(bl, sk):
                    out.append(path)
                continue
            try:
                i = bisect.bisect_left(sk, rng[0])
                j = bisect.bisect_right(sk, rng[1])
            except TypeError:
                return None  # stats don't order against the key type
            if j <= i:
                continue  # outside every key: range alone proves absence
            if bl is not None and not might_contain_any(bl, sk[i:j]):
                continue  # bloom proves absence despite range overlap
            out.append(path)
    return out


def point_lookup(table, column: str, keys) -> "object":
    """Read only the files that might contain ``keys`` (stats+bloom
    pruned), then apply the exact filter. The 100 TB needle path: a
    pk-clustered + bloomed table answers a handful-of-keys lookup by
    opening a handful of files instead of scanning the table. Falls
    back to a full-scan filter when pruning can't prove coverage."""
    from pyspark.sql import functions as F

    current = table.read()
    files = prune_files(table, column, list(keys))
    flt = F.col(column).isin(list(keys))
    if files is None:
        return current.filter(flt)
    if not files:
        return current.limit(0)
    vdir = table._version_dir(table.current_version())
    spark = current.sparkSession
    return (
        spark.read.option("basePath", vdir).parquet(*files)
        .select(*current.columns)
        .filter(flt)
    )
