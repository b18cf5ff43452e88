"""Multimodal column plumbing (SURVEY.md M7): treat image/audio/video
as opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codec libraries, but the simple
uncompressed raster formats need none: ``decode_image`` is a real
pure-numpy decoder for PPM (P6), PGM (P5) and uncompressed 8/24/32-bit
BMP — enough to exercise the full decode path on real bytes. Payloads
in any other format fall back to ``decode_image_stub``, which raises
``NotImplementedError`` unless ``fake=True`` (deterministic fake
decode, dimensions/pixel-mean derived from the payload bytes).
Everything Spark-side — schemas, batch iteration, partitioning, UDF
signatures — is identical either way; swapping in Pillow/librosa later
only widens the recognized-format set.

Scale posture: payloads stay in executor memory one Arrow batch at a
time (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
size); no payload ever reaches the driver. Feature extraction is a
narrow map — at 100 TB it parallelizes per input split with no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_mean", T.DoubleType()),
    ]
)


def _decode_pnm(payload: bytes) -> dict | None:
    """PPM (P6, 3-channel) / PGM (P5, 1-channel) binary rasters: ASCII
    header ``magic width height maxval`` with ``#`` comments, then one
    whitespace byte, then big-endian samples."""
    if payload[:2] not in (b"P5", b"P6"):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    # header tokenizer: whitespace-separated ints, '#' starts a comment
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                return None
            fields.append(int(tok))
            pos = end
    if len(fields) < 3 or pos >= len(payload):
        return None
    width, height, maxval = fields
    pos += 1  # the single whitespace byte after maxval
    bytes_per = 1 if maxval < 256 else 2
    need = width * height * channels * bytes_per
    if maxval <= 0 or len(payload) - pos < need:
        return None
    dt = np.uint8 if bytes_per == 1 else np.dtype(">u2")
    px = np.frombuffer(payload, dtype=dt, count=width * height * channels,
                       offset=pos)
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": height,
        "channels": channels,
        "pixel_mean": float(px.mean()) if px.size else 0.0,
    }


def _decode_bmp(payload: bytes) -> dict | None:
    """Uncompressed (BI_RGB) 8/24/32-bit BMP: little-endian header,
    4-byte-aligned row stride, bottom-up unless height < 0."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if (
        compression != 0
        or planes != 1
        or bpp not in (8, 24, 32)
        or width <= 0
        or height == 0
    ):
        return None
    rows = abs(height)
    channels = bpp // 8
    stride = (width * channels + 3) & ~3
    if len(payload) - data_off < stride * rows:
        return None
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * rows, offset=data_off
    ).reshape(rows, stride)
    px = raw[:, : width * channels]  # drop the per-row alignment pad
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": rows,
        "channels": channels,
        "pixel_mean": float(px.mean()) if px.size else 0.0,
    }


def decode_image(payload: bytes) -> dict | None:
    """Real decode for the codec-free raster formats (PPM/PGM/BMP).
    Returns the IMAGE_META dict, or None when the payload is not a
    recognized format — callers fall back to ``decode_image_stub``."""
    if not payload:
        return None
    try:
        return _decode_pnm(payload) or _decode_bmp(payload)
    except (ValueError, struct.error):
        return None


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Decode kernel stub. Real implementation would use Pillow; the
    deterministic fake derives metadata from the bytes themselves."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + n % 576,
        "height": 64 + (n * 7) % 448,
        "channels": 3,
        "pixel_mean": (sum(payload[:256]) / min(n, 256)) if n else 0.0,
    }


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def _decode_pixels(payload: bytes) -> tuple | None:
    """(H, W, C) uint8 numpy array for recognized rasters, else None.
    8-bit only (the resize path's input contract)."""
    meta = decode_image(payload)
    if meta is None:
        return None
    w, h, c = meta["width"], meta["height"], meta["channels"]
    if payload[:2] == b"P6" or payload[:2] == b"P5":
        # re-tokenize to find the data offset (same walk as _decode_pnm)
        pos, fields = 2, []
        while len(fields) < 3:
            ch = payload[pos : pos + 1]
            if ch == b"#":
                pos = payload.find(b"\n", pos) + 1
            elif ch.isspace():
                pos += 1
            else:
                end = pos
                while not payload[end : end + 1].isspace():
                    end += 1
                fields.append(int(payload[pos:end]))
                pos = end
        pos += 1
        if fields[2] >= 256:
            return None  # 16-bit samples: not supported by resize
        arr = np.frombuffer(payload, np.uint8, count=w * h * c, offset=pos)
        return arr.reshape(h, w, c)
    # BMP: bottom-up rows, stride-padded
    data_off = struct.unpack_from("<I", payload, 10)[0]
    height_signed = struct.unpack_from("<i", payload, 22)[0]
    stride = (w * c + 3) & ~3
    raw = np.frombuffer(
        payload, np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * c].reshape(h, w, c)
    return raw[::-1] if height_signed > 0 else raw


def resize_nearest(payload: bytes, out_w: int, out_h: int) -> dict | None:
    """Nearest-neighbor resize for recognized 8-bit rasters — the
    standard pre-embedding normalization step, pure numpy (integer
    index maps, no interpolation arithmetic, so results are exactly
    reproducible). Returns RESIZED row fields sans doc_id, or None
    for unrecognized payloads."""
    px = _decode_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    out = px[yi][:, xi]
    return {
        "width": out_w,
        "height": out_h,
        "channels": c,
        "pixels": out.tobytes(),
    }


def resize_images(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas resize stage: recognized rasters are decoded and
    nearest-neighbor-resized to (out_w, out_h); unrecognized payloads
    are dropped (a training pipeline routes them to a dead-letter
    side output instead — same plumbing, different sink). Narrow
    per-batch map; payloads never shuffle and never hit the driver."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                r = resize_nearest(p, out_w, out_h)
                if r is not None:
                    rows.append({"doc_id": i, **r})
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "pixels"],
            )

    return df.select(id_col, "payload").mapInPandas(op, RESIZED_SCHEMA)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (stand-in for real
    image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_image_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    plumbing for a decode stage. Arrow-batched; one pandas frame per
    batch, never a whole partition in memory as Python objects."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real decode when the payload is a recognized raster
            # format, deterministic fake otherwise — one schema both
            # ways, so mixed-format corpora work batch-by-batch
            metas = [
                decode_image(p) or decode_image_stub(p, fake=True)
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(op, IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled offset of each
    payload (video-frame analog). Pure JVM-side (explode over a
    sequence), no UDF."""
    n = F.length(F.col("payload"))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return df.select(
        id_col,
        F.explode(offsets).alias("frame_offset"),
        F.substring(
            F.col("payload").cast("string"), F.lit(1), F.lit(8)
        ).alias("frame_prefix"),
    )
