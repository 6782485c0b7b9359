"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

North-star extension. The container has no image/audio codecs, so the
*decode* kernels are stubbed (deterministic fake or NotImplementedError),
but everything Spark-side is real and tested: the schema convention, the
Arrow-batched mapInPandas pipeline shape, partition sizing, and the
feature-extraction contract.

Schema convention for a media column ``m``:
    m:        binary            (opaque payload)
    m_meta:   struct<format:string, width:int, height:int,
                     duration_ms:int, codec:string>

At 100 TB the payloads dominate: keep them in their own parquet column
chunk (columnar pruning means metadata-only queries never touch bytes),
size partitions by `spark.sql.files.maxPartitionBytes`, and run decode
as mapInPandas so each Arrow batch amortizes Python crossing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)


def attach_fake_media(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of a text column,
    metadata derived from its length. Stands in for real image bytes so
    the plumbing (binary column + typed meta) is exercised end-to-end."""
    payload = F.encode(F.col(payload_col), "utf-8")
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        (F.length(payload_col) % 640 + 1).cast("int").alias("width"),
        (F.length(payload_col) % 480 + 1).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
        F.lit("none").alias("codec"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


try:  # optional dependency: the full-codec image library
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # Pillow absent: the vendored PNG decoder below
    _PILImage = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> (channels, PIL-compatible mode string)
_PNG_MODES = {0: (1, "L"), 2: (3, "RGB"), 4: (2, "LA"), 6: (4, "RGBA")}


def has_image_codec() -> bool:
    """True when decode_image can decode SOMETHING real: always at
    least the vendored PNG path; Pillow widens it to every format."""
    return True


def _decode_png_pure(payload: bytes):
    """Vendored minimal PNG decoder — pure stdlib (zlib + struct), no
    Pillow: 8-bit greyscale/LA/RGB/RGBA, non-interlaced, all five
    scanline filters (None/Sub/Up/Average/Paeth per the PNG spec §9).
    Exists so codec-less containers still run the REAL-decode pipeline
    end-to-end on the most common training-data image format; palette,
    16-bit, and interlaced PNGs (and every non-PNG format) still need
    Pillow. Returns (width, height, mode, ndarray) exactly like the
    Pillow branch."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG and Pillow is not installed")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("truncated PNG")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_MODES:
        raise NotImplementedError(
            f"PNG variant (depth={depth}, colortype={ctype}, "
            f"interlace={interlace}) needs Pillow")
    ch, mode = _PNG_MODES[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("corrupt PNG scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        f, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(
            np.int32)
        if f == 0:                       # None
            cur = line
        elif f == 2:                     # Up
            cur = (line + prev) & 0xFF
        else:                            # Sub / Average / Paeth: per-pixel
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:               # Sub
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:             # Average
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                elif f == 4:             # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    cur[x] = (line[x] + pr) & 0xFF
                else:
                    raise NotImplementedError(f"PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)
    return w, h, mode, arr


def decode_image(payload: bytes) -> "object":
    """Real decode kernel: Pillow when installed, else the vendored
    pure-stdlib PNG decoder (8-bit non-interlaced PNGs — the common
    training-data case); anything past both raises.

    The Arrow pipeline around it (schema, batching, partition sizing)
    is identical either way — q105 oracle-gates the kernel boundary, so
    swapping the fake for this is a drop-in. Returns (width, height,
    mode, pixel ndarray)."""
    if _PILImage is None:
        return _decode_png_pure(bytes(payload))
    import io

    import numpy as np

    img = _PILImage.open(io.BytesIO(payload))
    return img.width, img.height, img.mode, np.asarray(img)


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL-codec feature extraction (width/height/channels/mean pixel)
    through the same mapInPandas shape as extract_features. Pillow when
    installed; PNG payloads decode through the vendored pure decoder
    either way."""
    cols = df.select(F.col(id_col).alias("id"), "media")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, chs, means = [], [], [], []
            for payload in pdf["media"]:
                w, h, _mode, arr = decode_image(bytes(payload))
                ws.append(w)
                hs.append(h)
                chs.append(1 if arr.ndim == 2 else arr.shape[2])
                means.append(float(np.asarray(arr, dtype=np.float64).mean()))
            yield pd.DataFrame(
                {"id": pdf["id"],
                 "width": pd.array(ws, dtype="int32"),
                 "height": pd.array(hs, dtype="int32"),
                 "channels": pd.array(chs, dtype="int32"),
                 "mean_pixel": pd.array(means, dtype="float64")}
            )

    return cols.mapInPandas(
        kernel, "id long, width int, height int, channels int, mean_pixel double"
    )


FEATURE_SCHEMA = "id long, n_bytes long, checksum long, aspect double"


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over (media, media_meta).

    The features here are deterministic byte statistics (length, additive
    checksum, aspect ratio) — a stand-in with the exact pipeline shape of
    a real embed/resize kernel: mapInPandas over columnar batches, one
    output row per input row, schema declared up front.
    """
    cols = df.select(
        F.col(id_col).alias("id"), "media", F.col("media_meta.width").alias("w"),
        F.col("media_meta.height").alias("h"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]

            def cksum(b) -> int:
                # CODE-POINT sum, not byte sum: the oracle computes
                # SUM(unicode(ch)) per character, and the two diverge on
                # any multibyte text ('café': bytes 662 vs code points
                # 531) — the ASCII fixture only passed by luck. NULL /
                # empty payloads contribute 0. Payloads that are NOT
                # valid UTF-8 (genuinely binary blobs in the media
                # column) fall back to the plain byte sum instead of
                # failing the whole Arrow batch with UnicodeDecodeError.
                if b is None:
                    return 0
                raw = bytes(b)
                try:
                    return sum(map(ord, raw.decode("utf-8"))) % (1 << 31)
                except UnicodeDecodeError:
                    return sum(raw) % (1 << 31)

            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(
                        lambda b: 0 if b is None else len(b)).astype("int64"),
                    "checksum": payloads.map(cksum).astype("int64"),
                    "aspect": (pdf["w"] / pdf["h"]).astype("float64"),
                }
            )

    return cols.mapInPandas(kernel, FEATURE_SCHEMA)


HISTO_SCHEMA = "id long, bucket int, n long"


def char_histogram(df: DataFrame, id_col: str = "doc_id", buckets: int = 16) -> DataFrame:
    """Decode + featurize with a FULL correctness gate: the payload is
    utf-8-decoded inside the Arrow kernel and bucketed by code point
    (``unicode % buckets``) — one output row per (doc, non-empty
    bucket). Character-level (not byte-level) on purpose: multibyte
    scripts (the zh docs) would diverge from any SQL oracle at byte
    granularity, while code points are computable in both engines, so
    this kernel's output hash-matches DuckDB exactly (q105) — the one
    multimodal path whose PYTHON side is oracle-checked, not just
    shape-tested."""
    cols = df.select(F.col(id_col).alias("id"), "media")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, bks, ns = [], [], []
            for i, payload in zip(pdf["id"], pdf["media"]):
                cps = np.fromiter(
                    (ord(c) for c in bytes(payload).decode("utf-8")), dtype=np.int64
                )
                counts = np.bincount(cps % buckets, minlength=buckets)
                nz = np.nonzero(counts)[0]
                ids.extend([i] * len(nz))
                bks.extend(nz.tolist())
                ns.extend(counts[nz].tolist())
            yield pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"),
                 "bucket": pd.array(bks, dtype="int32"),
                 "n": pd.array(ns, dtype="int64")}
            )

    return cols.mapInPandas(kernel, HISTO_SCHEMA)


def resize_media(df: DataFrame, target: int, id_col: str = "doc_id") -> DataFrame:
    """Resize-kernel plumbing: nearest-neighbor subsample of the payload
    to ``target`` elements (the 1-D stand-in for an image thumbnail),
    emitted as a new binary column with updated metadata. Deterministic:
    element j of the output is input element floor(j*n/target). The
    real pattern is all here — binary in, binary out, meta rewrite,
    Arrow batching — only the pixel math is fake (no codecs in this
    container; swap the kernel body when PIL/ffmpeg exist)."""
    cols = df.select(F.col(id_col).alias("id"), "media", "media_meta")

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_TYPE),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            outs, widths = [], []
            for payload in pdf["media"]:
                # NULL/empty payloads pass through honestly: NULL stays
                # NULL (bytes(None) used to TypeError the whole job) and
                # an empty payload's metadata says width=0 — advertising
                # `target` elements over 0 bytes lies to every consumer
                if payload is None:
                    outs.append(None)
                    widths.append(0)
                    continue
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(buf) == 0:
                    outs.append(b"")
                    widths.append(0)
                    continue
                idx = (np.arange(target, dtype=np.int64) * len(buf)) // target
                outs.append(buf[idx].tobytes())
                widths.append(target)
            meta = pd.DataFrame(
                {
                    "format": ["fake/resized"] * len(pdf),
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array([1] * len(pdf), dtype="int32"),
                    "duration_ms": pd.array([0] * len(pdf), dtype="int32"),
                    "codec": ["none"] * len(pdf),
                }
            )
            yield pd.DataFrame(
                {"id": pdf["id"], "media": outs,
                 "media_meta": meta.to_dict("records")}
            )

    return cols.mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    frame timestamp. Decode is stubbed; the explode-by-timestamp plumbing
    (row multiplication before the expensive kernel) is the real pattern."""
    stamps = F.sequence(
        F.lit(0), F.greatest(F.col("media_meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return df.withColumn("frame_ms", F.explode(stamps))
