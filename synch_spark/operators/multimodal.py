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


try:  # optional dependency: the real image codec
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # codecs absent (this container): fake path only
    _PILImage = None


def has_image_codec() -> bool:
    return _PILImage is not None


def decode_image(payload: bytes) -> "object":
    """Real decode kernel: Pillow when installed, else raises.

    The Arrow pipeline around it (schema, batching, partition sizing)
    is identical either way — q105 oracle-gates the kernel boundary, so
    swapping the fake for this is a drop-in. Returns (width, height,
    mode, pixel ndarray)."""
    if _PILImage is None:
        raise NotImplementedError(
            "image codecs not available in this environment (pip install "
            "Pillow to enable; the deterministic fake path stays oracle-"
            "gated either way)"
        )
    import io

    import numpy as np

    img = _PILImage.open(io.BytesIO(payload))
    return img.width, img.height, img.mode, np.asarray(img)


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL-codec feature extraction (width/height/channels/mean pixel)
    through the same mapInPandas shape as extract_features. Requires
    Pillow; gate call sites with has_image_codec()."""
    if _PILImage is None:
        raise NotImplementedError("Pillow not installed")
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
