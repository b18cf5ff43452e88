"""Multimodal column plumbing (SURVEY.md M7): treat image/audio/video
as opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codec libraries, but the common web
and archive formats need none — ``decode_image`` is a real pure-
numpy/stdlib decoder for:

- PPM (P6) / PGM (P5) binary rasters;
- uncompressed 8/24/32-bit BMP;
- non-interlaced 8-bit PNG (stdlib ``zlib`` + the five scanline
  filters reconstructed in numpy; lossless ``encode_png`` writer too);
- JPEG, baseline AND progressive (the from-scratch ITU-T T.81
  implementation in ``operators/jpeg.py``: arbitrary canonical
  Huffman tables, restart markers, h/v sampling in {1,2}, SOF2
  spectral selection + successive approximation; plus sequential and
  progressive encoders);
- GIF87a/89a (``operators/gif.py``: variable-width LZW, interlace,
  local/global palettes; plus a fixture encoder with real LZW);
- baseline TIFF (both byte orders, strip OR tile layout, LZW /
  PackBits / no compression, horizontal predictor; plus
  ``encode_tiff``);
- RIFF/WAVE audio (``decode_wav``: 8/16-bit PCM, G.711, IMA ADPCM;
  exact integer RMS);
- FLAC (``operators/flac.py``: from-scratch spec decoder — fixed +
  LPC prediction, Rice residuals, stereo decorrelation, MD5-verified).

Payloads in any other format (video containers, MP3/AAC,
12-bit/lossless/hierarchical JPEG) are rejected cleanly and fall
back to ``decode_image_stub``, which raises
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # palette (3) handled via PLTE


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters over ``h`` scanlines of
    ``stride`` bytes (filter byte already split off into raw[:, 0]).
    ``bpp`` is the filter distance in BYTES per pixel — the spec
    filters bytes, so 16-bit samples use 2x the 8-bit distance."""
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        f, line = int(filters[y]), lines[y]
        prev = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: wrapping cumsum within each byte lane
            lanes = line.reshape(-1, bpp).astype(np.uint32)
            out[y] = (
                np.cumsum(lanes, axis=0, dtype=np.uint32) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 add wraps mod 256 natively
            out[y] = line + prev
        elif f == 3:  # Average (sequential: needs reconstructed left)
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential)
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else cc
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError("bad PNG filter")
    return out


# Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_pixels(payload: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 array for an 8-bit-depth PNG (color types
    gray/RGB/gray+alpha/RGBA, interlace none or Adam7), else None.
    Needs only stdlib ``zlib``: concatenate the IDAT chunks, inflate,
    then undo the per-scanline filter (None/Sub/Up/Average/Paeth) —
    for Adam7, per pass sub-image, scattered into the frame on the
    pass grid. Palette images resolve through PLTE to RGB (so numeric
    features act on colors, never on raw indices); sub-byte palette
    depths are rejected.

    Filters Sub and Up vectorize fully (a wrapping cumsum per channel
    lane / a wrapping row add); Average and Paeth are sequential by
    definition (each byte depends on the reconstructed left neighbor)
    and fall back to a per-byte loop on the rows that use them."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat, plte = len(_PNG_SIG), None, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        if pos + 12 + ln > len(payload):
            return None
        if typ == b"IHDR":
            ihdr = payload[pos + 8 : pos + 8 + ln]
        elif typ == b"PLTE":
            plte = payload[pos + 8 : pos + 8 + ln]
        elif typ == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + ln])
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat:
        return None
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if ctype == 3:
        # palette: indices resolve through PLTE to RGB (8-bit depth;
        # sub-byte palette depths stay rejected)
        if plte is None or len(plte) % 3 or depth != 8:
            return None
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = _png_pixels_channels(payload, w, h, 1, interlace, idat)
        if idx is None or int(idx.max(initial=0)) >= len(pal):
            return None
        return pal[idx[..., 0]]
    c = _PNG_CHANNELS.get(ctype)
    if (
        c is None
        or depth not in (8, 16)
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
        or w <= 0
        or h <= 0
    ):
        return None
    return _png_pixels_channels(payload, w, h, c, interlace, idat, depth)


def _png_pixels_channels(
    payload: bytes,
    w: int,
    h: int,
    c: int,
    interlace: int,
    idat: list,
    depth: int = 8,
) -> np.ndarray | None:
    """Inflate + unfilter the IDAT stream into (H, W, C) uint8.
    16-bit samples (big-endian) are filtered at 2-byte distance per
    the spec, then downsampled to their high byte — the 8-bit feature
    contract every downstream consumer assumes."""
    import zlib

    bps = depth // 8
    bpp = c * bps

    def to8(block: np.ndarray, ph: int, pw: int) -> np.ndarray:
        if bps == 1:
            return block.reshape(ph, pw, c)
        wide = np.frombuffer(block.tobytes(), dtype=">u2")
        return (wide >> 8).astype(np.uint8).reshape(ph, pw, c)

    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    try:
        if interlace == 0:
            stride = w * bpp
            if len(raw) < h * (stride + 1):
                return None
            grid = np.frombuffer(
                raw, np.uint8, count=h * (stride + 1)
            ).reshape(h, stride + 1)
            return to8(_png_unfilter(grid, h, stride, bpp), h, w)
        # Adam7: 7 independently-filtered sub-images on the pass grid
        out = np.zeros((h, w, c), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if len(raw) - pos < need:
                return None
            grid = np.frombuffer(
                raw, np.uint8, count=need, offset=pos
            ).reshape(ph, stride + 1)
            out[y0::dy, x0::dx] = to8(
                _png_unfilter(grid, ph, stride, bpp), ph, pw
            )
            pos += need
        return out
    except ValueError:
        # corrupt scanline filter code (a bit flip reaches here past
        # the zlib CRC only because decompress tolerates truncated
        # tails): reject, never raise — found by the r7 fuzz soak
        return None


def _decode_png(payload: bytes) -> dict | None:
    """IMAGE_META dict for a supported PNG, else None."""
    px = _png_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def _decode_qoi_meta(payload: bytes) -> dict | None:
    """IMAGE_META dict for a QOI payload, else None."""
    from .qoi import decode_qoi

    px = decode_qoi(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def _decode_jpeg_meta(payload: bytes) -> dict | None:
    """IMAGE_META dict for a JPEG (or 8-bit JPEG-LS), else None —
    EXIF-orientation normalized, so width/height describe the
    upright image."""
    from .jpegls import decode_jpegls, is_jpegls

    if is_jpegls(payload):
        px = decode_jpegls(payload)
        if px is None or px.dtype != np.uint8:
            return None
    else:
        from .jpeg import decode_jpeg_oriented

        px = decode_jpeg_oriented(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def encode_png(pixels, interlace: bool = False) -> bytes:
    """Write an 8-bit PNG (gray/gray+alpha/RGB/RGBA) from an
    (H, W[, C]) uint8 array — stdlib ``zlib`` only, filter 0 on every
    scanline, optionally Adam7-interlaced (sub-images written in pass
    order). Round-trips exactly through ``_png_pixels``; used for
    fixtures and as the lossless leg of the write path."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, int(interlace))
    if not interlace:
        scanlines = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.extend(b"\x00" + row.tobytes() for row in sub)
        scanlines = b"".join(parts)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def _decode_gif_meta(payload: bytes) -> dict | None:
    """IMAGE_META dict for a GIF (first frame), else None."""
    from .gif import decode_gif

    px = decode_gif(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def _decode_ico_meta(payload: bytes) -> dict | None:
    px = _decode_ico_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def _decode_tga_meta(payload: bytes) -> dict | None:
    px = _decode_tga_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def decode_image(payload: bytes) -> dict | None:
    """Real decode for the formats needing no external codec
    (PPM/PGM/BMP/PNG/baseline+progressive+arithmetic JPEG/GIF/
    baseline TIFF/QOI/ICO/TGA). Returns the
    IMAGE_META dict, or None when the payload is not a recognized
    format — callers fall back to ``decode_image_stub``."""
    if not payload:
        return None
    try:
        return (
            _decode_pnm(payload)
            or _decode_bmp(payload)
            or _decode_png(payload)
            or _decode_jpeg_meta(payload)
            or _decode_gif_meta(payload)
            or _decode_tiff_meta(payload)
            or _decode_qoi_meta(payload)
            or _decode_ico_meta(payload)
            or _decode_tga_meta(payload)
        )
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
    if payload.startswith(_PNG_SIG):
        return _png_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegls import decode_jpegls, is_jpegls

        if is_jpegls(payload):
            # JPEG-LS (SOF55 precedes the first scan); 8-bit only
            px = decode_jpegls(payload)
            return px if px is not None and px.dtype == np.uint8 else None
        from .jpeg import decode_jpeg_oriented

        return decode_jpeg_oriented(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    if payload[:2] in (b"II", b"MM"):
        return _decode_tiff_pixels(payload)
    if payload[:4] == b"qoif":
        from .qoi import decode_qoi

        return decode_qoi(payload)
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        ico = _decode_ico_pixels(payload)
        if ico is not None:
            return ico
        # fall through: a type-2 TGA header collides with the CUR magic
    tga = _decode_tga_pixels(payload)
    if tga is not None:
        return tga
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
    # BMP: bottom-up rows, stride-padded, channels stored BGR(A),
    # and 8-bit files are palettized (BGRA color table after the DIB
    # header) — normalize all of it to top-down RGB here
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    height_signed = struct.unpack_from("<i", payload, 22)[0]
    stride = (w * c + 3) & ~3
    raw = np.frombuffer(
        payload, np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * c].reshape(h, w, c)
    px = raw[::-1] if height_signed > 0 else raw
    if c == 1:  # 8-bit palettized: indices -> RGB via the color table
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(
            payload, np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRA -> RGB
        if int(px.max(initial=0)) >= n_colors:
            return None
        return pal[px[..., 0]]
    if c == 3:
        return px[..., [2, 1, 0]]  # BGR -> RGB
    return px[..., [2, 1, 0, 3]]  # BGRA -> RGBA


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


# ------------------------------------------------------------ transcode

def transcode_image(
    payload: bytes, out_w: int, out_h: int, quality: int = 90
) -> bytes | None:
    """Normalize any recognized raster (PPM/PGM/BMP/PNG/JPEG) to a
    ``quality``-quality baseline JPEG at (out_w, out_h) — the standard
    image-normalization stage ahead of embedding/training. Returns the
    re-encoded bytes, or None for unrecognized payloads."""
    from .jpeg import encode_jpeg

    px = _decode_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    out = px[yi][:, xi]
    if c == 2:  # gray+alpha -> gray
        out = out[..., :1]
    elif c == 4:  # RGBA -> RGB (alpha dropped; no compositing target)
        out = out[..., :3]
    return encode_jpeg(out, quality=quality)


TRANSCODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def transcode_images(
    df: DataFrame, out_w: int, out_h: int, quality: int = 90,
    id_col: str = "doc_id",
) -> DataFrame:
    """mapInPandas transcode stage: every recognized raster is decoded,
    resized, and re-encoded as baseline JPEG; unrecognized payloads are
    dropped (dead-letter sink in a real pipeline). Narrow Arrow-batched
    map — payloads never shuffle, never reach the driver, and the
    output column is bounded by the target dimensions regardless of
    input size (the property that makes the downstream shuffle or
    write predictable at 100 TB)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                out = transcode_image(p, out_w, out_h, quality)
                if out is not None:
                    rows.append(
                        {
                            "doc_id": i,
                            "n_bytes_in": len(p),
                            "n_bytes_out": len(out),
                            "payload": out,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes_in", "n_bytes_out", "payload"],
            )

    return df.select(id_col, "payload").mapInPandas(op, TRANSCODED_SCHEMA)


# ------------------------------------------------------------ audio

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
    ]
)


_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)


def _ima_adpcm_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble & 7]))
    return pred, index


def _ima_adpcm_decode(data: bytes, channels: int, block_align: int):
    """IMA/DVI ADPCM (WAVE format 0x11, the multimedia-standard 4-bit
    coder): per-block 4-byte channel headers (predictor + step index)
    followed by interleaved 4-byte channel words, two samples per
    byte, low nibble first. Returns interleaved int16 samples."""
    if block_align < 4 * channels or channels not in (1, 2):
        return None
    out: list[list[int]] = [[] for _ in range(channels)]
    for bstart in range(0, len(data) - 4 * channels + 1, block_align):
        block = data[bstart : bstart + block_align]
        preds, idxs = [], []
        for c in range(channels):
            pred = struct.unpack_from("<h", block, 4 * c)[0]
            idx = block[4 * c + 2]
            if idx > 88:
                return None
            preds.append(pred)
            idxs.append(idx)
            out[c].append(pred)  # header predictor IS sample 0
        pos = 4 * channels
        # body: per channel, alternating 4-byte (8-nibble) words
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                word = block[pos : pos + 4]
                for byte in word:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_adpcm_step(
                            nib, preds[c], idxs[c]
                        )
                        out[c].append(preds[c])
                pos += 4
    n = min(len(c) for c in out)
    if n == 0:
        return None
    arr = np.array([c[:n] for c in out], dtype=np.int16)
    return arr.T.reshape(-1)


def _ima_adpcm_encode(samples, channels: int, samples_per_block: int = 505):
    """IMA ADPCM fixture encoder, exact inverse stepping of the
    decoder. ``samples``: interleaved int16. Returns (data,
    block_align)."""
    x = np.asarray(samples, np.int64).reshape(-1, channels)
    spb = samples_per_block | 1  # header sample + even nibble count
    words_per_ch = (spb - 1 + 7) // 8
    block_align = 4 * channels + 4 * words_per_ch * channels
    out = bytearray()
    idxs = [0] * channels
    for bstart in range(0, len(x), spb):
        blk = x[bstart : bstart + spb]
        if len(blk) == 0:
            break
        preds = []
        for c in range(channels):
            # seed the step index from the block's typical delta so
            # the quantizer doesn't spend half the block adapting up
            # from step 7 (the classic ADPCM cold-start artifact)
            if len(blk) > 1:
                d = float(np.mean(np.abs(np.diff(blk[:, c]))))
                idxs[c] = int(
                    np.argmin([abs(s - d) for s in _IMA_STEP_TABLE])
                )
            p = int(blk[0, c])
            out += struct.pack("<hBB", p, idxs[c], 0)
            preds.append(p)
        nibs: list[list[int]] = [[] for _ in range(channels)]
        for c in range(channels):
            for i in range(1, spb):
                s = int(blk[i, c]) if i < len(blk) else preds[c]
                step = _IMA_STEP_TABLE[idxs[c]]
                diff = s - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                preds[c], idxs[c] = _ima_adpcm_step(nib, preds[c], idxs[c])
                nibs[c].append(nib)
            while len(nibs[c]) % 8:
                nibs[c].append(0)
        for w in range(words_per_ch):
            for c in range(channels):
                chunk = nibs[c][w * 8 : w * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(chunk[k] | (chunk[k + 1] << 4))
    return bytes(out), block_align


def _wav_samples(payload: bytes):
    """(rate, channels, interleaved float64 samples in [-1, 1]) for an
    audio payload — RIFF/WAVE linear PCM (8/16-bit) or G.711
    mu-law/A-law, or (r7) FLAC via the from-scratch spec decoder
    (``operators/flac.py``) — else None. The ONE place audio sample
    decoding lives; metadata, spectral, and fingerprint paths all
    read through it."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        d = decode_flac(payload)
        if d is None:
            return None
        scale = float(1 << (d["bits"] - 1))
        return (
            d["sample_rate"],
            d["channels"],
            d["samples"].astype(np.float64).reshape(-1) / scale,
        )
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, channels, rate, _brate, balign, bits = fmt
    ok = (
        (audio_fmt == 1 and bits in (8, 16))
        or (audio_fmt in (6, 7) and bits == 8)  # A-law / mu-law (G.711)
        or (audio_fmt == 0x11 and bits == 4)  # IMA ADPCM
    )
    if not ok or channels == 0 or rate == 0:
        return None
    if audio_fmt == 0x11:
        pcm = _ima_adpcm_decode(data, channels, balign)
        if pcm is None:
            return None
        return rate, channels, pcm.astype(np.float64) / 32768.0
    if audio_fmt == 7:  # mu-law: 8-bit companded -> linear
        u = ~np.frombuffer(data, np.uint8)
        sign = np.where(u & 0x80, -1.0, 1.0)
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        lin = ((mant.astype(np.int32) << 3) + 0x84 << exp) - 0x84
        samples = sign * lin / 32768.0
    elif audio_fmt == 6:  # A-law
        a = np.frombuffer(data, np.uint8) ^ 0x55
        sign = np.where(a & 0x80, -1.0, 1.0)
        exp = (a >> 4) & 0x07
        mant = (a & 0x0F).astype(np.int32)
        lin = np.where(
            exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1)
        )
        samples = sign * lin / 32768.0
    elif bits == 8:  # unsigned, offset-binary
        samples = np.frombuffer(data, np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    else:
        n16 = len(data) // 2
        samples = np.frombuffer(data, "<i2", count=n16).astype(np.float64)
        samples /= 32768.0
    return rate, channels, samples


def decode_wav(payload: bytes) -> dict | None:
    """Audio decode — RIFF/WAVE (linear PCM 8/16-bit, G.711
    mu-law/A-law) or FLAC (``operators/flac.py``) — the audio analog
    of the raster decoders, stdlib-only. Returns
    metadata plus an exact integer RMS (amplitude normalized to
    [-1, 1], scaled to milli-units) or None for non-WAV payloads and
    unsupported encodings (callers fall back to the stub)."""
    r = _wav_samples(payload)
    if r is None:
        return None
    rate, channels, samples = r
    n_frames = samples.size // channels
    if n_frames == 0:
        return None
    samples = samples[: n_frames * channels]
    rms = float(np.sqrt(np.mean(samples * samples)))
    return {
        "n_bytes": len(payload),
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n_frames,
        "duration_ms": n_frames * 1000 // rate,
        "rms_milli": int(rms * 1000),
    }


def extract_audio_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas audio feature extraction: WAV payloads get a real
    PCM decode (rate/channels/duration/RMS); anything else yields a
    null-feature row (dead-letter marker) with the byte count intact.
    Same narrow Arrow-batched shape as the image path."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                meta = decode_wav(p)
                if meta is None:
                    meta = {
                        "n_bytes": len(p),
                        "sample_rate": None,
                        "channels": None,
                        "n_samples": None,
                        "duration_ms": None,
                        "rms_milli": None,
                    }
                rows.append({"doc_id": i, **meta})
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "channels",
                    "n_samples", "duration_ms", "rms_milli",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, AUDIO_META_SCHEMA)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes | None:
    """TIFF-variant LZW: MSB-first bit packing and the EARLY-CHANGE
    width rule (width bumps one code sooner than GIF's) — the two
    documented differences from GIF LZW. 8-bit native codes, CLEAR=256,
    EOI=257."""
    clear, eoi = 256, 257
    width = 9
    dictionary: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                return bytes(out[:expect]) if len(out) >= expect else None
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == clear:
            dictionary = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(dictionary):
                return None
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            if len(dictionary) < 4096:
                dictionary.append(prev + entry[:1])
        elif code == len(dictionary) and len(dictionary) < 4096:
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # EARLY CHANGE: bump when the NEXT append would not fit
        if len(dictionary) + 1 == (1 << width) and width < 12:
            width += 1
    return bytes(out[:expect]) if len(out) >= expect else None


def _decode_tiff_pixels(payload: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 for a baseline TIFF: both byte orders, 8-bit
    samples, strip OR tile layout (TIFF 6.0 section 15: full
    TileWidth x TileLength tiles, edge tiles padded, assembled then
    cropped), compression none (1), LZW (5) or PackBits (32773),
    photometric grayscale (incl. white-is-zero) or RGB. Anything else
    (JPEG-in-TIFF, 16-bit, planar) returns None — the deliberate
    boundary between "stdlib-decodable" and "needs a codec".
    """
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        return None
    if ifd_off + 2 > len(payload):
        return None
    n_tags = struct.unpack_from(bo + "H", payload, ifd_off)[0]
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            return None
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        tags[tag] = (typ, cnt, payload[off + 8 : off + 12])

    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}

    def values(tag: int, default=None):
        if tag not in tags:
            return default
        typ, cnt, inline = tags[tag]
        unit = sizes.get(typ)
        if unit is None:
            return default
        total = unit * cnt
        raw = (
            inline[:total]
            if total <= 4
            else payload[
                struct.unpack_from(bo + "I", inline)[0] :
            ][:total]
        )
        if len(raw) < total:
            return default
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            return default
        return list(struct.unpack(bo + fmt * cnt, raw))

    w = (values(256) or [0])[0]
    h = (values(257) or [0])[0]
    bits = values(258, [8])
    compression = (values(259) or [1])[0]
    photometric = (values(262) or [1])[0]
    offsets = values(273)
    spp = (values(277) or [1])[0]
    rows_per_strip = (values(278) or [h])[0] or h
    counts = values(279)
    planar = (values(284) or [1])[0]
    predictor = (values(317) or [1])[0]
    tile_w = (values(322) or [0])[0]
    tile_h = (values(323) or [0])[0]
    tile_offsets = values(324)
    tile_counts = values(325)
    tiled = tile_offsets is not None and tile_counts is not None
    if tiled:
        # TIFF 6.0: tile dimensions must be multiples of 16
        if tile_w <= 0 or tile_h <= 0 or tile_w % 16 or tile_h % 16:
            return None
        offsets, counts = tile_offsets, tile_counts
    if (
        not w
        or not h
        or offsets is None
        or counts is None
        or any(b != 8 for b in bits)
        or compression not in (1, 5, 32773)
        or photometric not in (0, 1, 2)
        or spp not in (1, 3)
        or planar != 1
        or predictor not in (1, 2)
    ):
        return None

    def unpackbits(raw: bytes, expect: int) -> bytes | None:
        out = bytearray()
        i = 0
        while i < len(raw) and len(out) < expect:
            n = raw[i]
            i += 1
            if n < 128:
                out += raw[i : i + n + 1]
                i += n + 1
            elif n > 128:
                if i >= len(raw):
                    return None
                out += raw[i : i + 1] * (257 - n)
                i += 1
            # n == 128: no-op
        return bytes(out[:expect]) if len(out) >= expect else None

    def segment(off: int, cnt: int, nrows: int, ncols: int):
        """Decompress one strip/tile into an (nrows, ncols, spp)
        array, undoing the horizontal predictor per row."""
        expect = nrows * ncols * spp
        raw = payload[off : off + cnt]
        if compression == 1:
            data = raw[:expect]
        elif compression == 5:
            data = _tiff_lzw_decode(raw, expect)
        else:
            data = unpackbits(raw, expect)
        if data is None or len(data) < expect:
            return None
        seg = np.frombuffer(data, np.uint8, expect).reshape(
            nrows, ncols, spp
        )
        if predictor == 2:  # horizontal differencing: undo by cumsum
            seg = np.cumsum(
                seg.astype(np.uint32), axis=1, dtype=np.uint32
            ).astype(np.uint8)
        return seg

    if tiled:
        across = (w + tile_w - 1) // tile_w
        down = (h + tile_h - 1) // tile_h
        if len(offsets) < across * down or len(counts) < across * down:
            return None
        px = np.zeros((down * tile_h, across * tile_w, spp), np.uint8)
        for ti, (off, cnt) in enumerate(
            zip(offsets[: across * down], counts[: across * down])
        ):
            tile = segment(off, cnt, tile_h, tile_w)
            if tile is None:
                return None
            ty, tx = divmod(ti, across)
            px[
                ty * tile_h : (ty + 1) * tile_h,
                tx * tile_w : (tx + 1) * tile_w,
            ] = tile
        px = px[:h, :w]
    else:
        rows = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            if nrows <= 0:
                break
            strip = segment(off, cnt, nrows, w)
            if strip is None:
                return None
            rows.append(strip)
        px = np.concatenate(rows, axis=0)
        if px.shape[0] != h:
            return None
    if photometric == 0:  # white-is-zero grayscale
        px = 255 - px
    return px


def _decode_tiff_meta(payload: bytes) -> dict | None:
    px = _decode_tiff_pixels(payload)
    if px is None:
        return None
    h, w, c = px.shape
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "channels": c,
        "pixel_mean": float(px.mean()),
    }


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (fixture/writer leg): MSB-first,
    early-change width rule mirrored against `_tiff_lzw_decode`'s
    lagging table."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    dic = {bytes([i]): i for i in range(256)}
    next_code = 258
    dec_len = 258
    emitted = 0
    emit(clear)

    def emit_data(code: int) -> None:
        nonlocal width, dec_len, emitted
        emit(code)
        emitted += 1
        if emitted >= 2 and dec_len < 4096:
            dec_len += 1
            if dec_len + 1 == (1 << width) and width < 12:
                width += 1

    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in dic:
            w = wc
            continue
        emit_data(dic[w])
        if next_code < 4096:
            dic[wc] = next_code
            next_code += 1
        w = bytes([ch])
    if w:
        emit_data(dic[w])
    emit(eoi)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        # repeat run
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i:
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        # literal run up to next repeat
        j = i
        while (
            j + 1 < len(data)
            and not (j + 2 < len(data) and data[j + 1] == data[j + 2])
            and j - i < 127
        ):
            j += 1
        out += bytes([j - i]) + data[i : j + 1]
        i = j + 1
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    big_endian: bool = False,
    packbits: bool = False,
    lzw: bool = False,
    predictor: bool = False,
    tiled: bool = False,
    tile_size: tuple[int, int] = (16, 16),
) -> bytes:
    """Minimal baseline TIFF writer for fixtures: 8-bit gray or RGB;
    compression none, PackBits, or LZW (optionally with the
    horizontal-differencing predictor); either byte order; single
    strip or TIFF 6.0 tile layout (``tiled=True``: full
    TileWidth x TileLength tiles, 16-multiples, edges zero-padded,
    each tile predicted + compressed independently)."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    bo = ">" if big_endian else "<"

    def pack(arr: np.ndarray) -> bytes:
        if predictor:
            diffed = arr.astype(np.int16)
            diffed[:, 1:] = diffed[:, 1:] - diffed[:, :-1]
            data = (diffed & 0xFF).astype(np.uint8).tobytes()
        else:
            data = arr.tobytes()
        if lzw:
            data = _tiff_lzw_encode(data)
        if packbits:
            data = _tiff_packbits_encode(data)
        return data

    if tiled:
        tw, th = tile_size
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        padded = np.zeros((down * th, across * tw, c), np.uint8)
        padded[:h, :w] = px
        blobs = [
            pack(padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw])
            for ty in range(down)
            for tx in range(across)
        ]
    else:
        blobs = [pack(px)]

    shorts = lambda vs: struct.pack(bo + "H" * len(vs), *vs)  # noqa: E731
    longs = lambda vs: struct.pack(bo + "I" * len(vs), *vs)  # noqa: E731

    comp_code = 5 if lzw else (32773 if packbits else 1)
    entries: list[list] = []  # [tag, type, count, packed-values bytes]
    entries.append([256, 3, 1, shorts([w])])
    entries.append([257, 3, 1, shorts([h])])
    entries.append([258, 3, c, shorts([8] * c)])
    entries.append([259, 3, 1, shorts([comp_code])])
    entries.append([262, 3, 1, shorts([2 if c == 3 else 1])])
    entries.append([277, 3, 1, shorts([c])])
    if predictor:
        entries.append([317, 3, 1, shorts([2])])
    if tiled:
        entries.append([322, 3, 1, shorts([tw])])
        entries.append([323, 3, 1, shorts([th])])
        off_entry = [324, 4, len(blobs), b""]  # filled after layout
        entries.append(off_entry)
        entries.append([325, 4, len(blobs), longs([len(b) for b in blobs])])
    else:
        off_entry = [273, 4, 1, b""]
        entries.append(off_entry)
        entries.append([278, 3, 1, shorts([h])])
        entries.append([279, 4, 1, longs([len(blobs[0])])])
    entries.sort(key=lambda e: e[0])

    # layout: header(8) | IFD | overflow value area | segment data.
    # Two passes because segment offsets depend on the overflow size;
    # size the offsets entry with a placeholder BEFORE summing.
    off_entry[3] = longs([0] * len(blobs))
    header = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow = sum(len(e[3]) for e in entries if len(e[3]) > 4)
    data_off = header + ifd_size + overflow
    offs, o = [], data_off
    for b in blobs:
        offs.append(o)
        o += len(b)
    off_entry[3] = longs(offs)

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", len(entries))
    ext = bytearray()
    ext_off = header + ifd_size
    for t, typ, cnt, vb in entries:
        out += struct.pack(bo + "HHI", t, typ, cnt)
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += struct.pack(bo + "I", ext_off + len(ext))
            ext += vb
    out += b"\x00\x00\x00\x00"  # next IFD
    out += ext
    for b in blobs:
        out += b
    return bytes(out)


# ------------------------------------------------- tar shards (WebDataset)

TAR_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("sample_key", T.StringType()),
        T.StructField("member_ext", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def iter_tar_members(payload: bytes):
    """Yield (name, bytes) for regular files in an (optionally
    gzip-compressed) tar archive — the WebDataset shard layout, where
    one training sample is the group of members sharing a basename
    stem (``000123.jpg`` + ``000123.json`` + ``000123.txt``).
    Stdlib ``tarfile`` over a memory buffer; bad archives yield
    nothing rather than raising."""
    import io
    import tarfile
    import zlib

    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                f = tf.extractfile(m)
                if f is None:
                    continue
                yield m.name, f.read()
    except (tarfile.TarError, EOFError, OSError, ValueError,
            NotImplementedError, zlib.error):
        return


def explode_tar_shards(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas shard exploder: each input row holds one tar shard
    as a binary payload; output is one row per member file with the
    WebDataset sample key (basename stem) and extension split out, so
    a downstream ``groupBy(shard_id, sample_key)`` reassembles
    samples.

    Scale posture: shards (the unit real pipelines move — 100 MB to
    1 GB each) are processed one Arrow batch at a time inside the
    task that read them; members never route through the driver, and
    the sample-reassembly groupBy shuffles at most one shard's members
    per key because sample keys are shard-local. At 100 TB this is
    the standard read path: splits = shards, decode = narrow map."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf[id_col], pdf["payload"]):
                for name, data in iter_tar_members(p):
                    base = name.rsplit("/", 1)[-1]
                    stem, dot, ext = base.partition(".")
                    rows.append(
                        {
                            "shard_id": sid,
                            "sample_key": stem,
                            "member_ext": ext if dot else "",
                            "n_bytes": len(data),
                            "payload": data,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard_id", "sample_key", "member_ext", "n_bytes",
                    "payload",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, TAR_MEMBER_SCHEMA)


def build_tar_shard(members: list[tuple[str, bytes]], gzipped: bool = False) -> bytes:
    """Write a tar shard from (name, bytes) pairs — fixture writer and
    the inverse of ``explode_tar_shards`` for re-sharding pipelines."""
    import io
    import tarfile

    buf = io.BytesIO()
    mode = "w:gz" if gzipped else "w"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # deterministic output
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("dominant_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("rms_milli", T.LongType()),
    ]
)


def wav_spectral_features(payload: bytes) -> dict | None:
    """Frequency-domain features for a PCM WAV via numpy rfft: the
    dominant frequency (peak magnitude bin, DC excluded) and the
    spectral centroid — the audio-quality screens (silence, hum,
    clipping artifacts) a speech corpus runs before transcription.
    Multi-channel audio is averaged to mono first."""
    meta = decode_wav(payload)
    if meta is None:
        return None
    _rate, channels, x = _wav_samples(payload)
    n = (x.size // channels) * channels
    mono = x[:n].reshape(-1, channels).mean(axis=1)
    if mono.size < 4:
        return None
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(mono.size, d=1.0 / meta["sample_rate"])
    mag = spec.copy()
    mag[0] = 0.0  # DC is offset, not pitch
    dom = float(freqs[int(np.argmax(mag))])
    total = float(mag.sum())
    centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
    return {
        "sample_rate": meta["sample_rate"],
        "n_samples": meta["n_samples"],
        "dominant_hz": dom,
        "spectral_centroid_hz": centroid,
        "rms_milli": meta["rms_milli"],
    }


def extract_audio_spectral(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas spectral-feature stage over WAV payloads; non-WAV
    rows are dropped (dead-letter in a real pipeline). Narrow map,
    FFT cost linear in samples per payload."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                f = wav_spectral_features(p)
                if f is not None:
                    rows.append({"doc_id": i, **f})
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "dominant_hz",
                    "spectral_centroid_hz", "rms_milli",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, AUDIO_SPECTRAL_SCHEMA)


def _bmff_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO BMFF boxes in a
    range, handling 64-bit largesize and size-0 (to-end) boxes."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


def _bmff_find(data: bytes, start: int, end: int, path: list[bytes]):
    """Walk a box path like [b"mdia", b"minf", b"stbl"]; yields the
    (start, end) of every box matching the full path."""
    if not path:
        yield start, end
        return
    for typ, a, b in _bmff_boxes(data, start, end):
        if typ == path[0]:
            yield from _bmff_find(data, a, b, path[1:])


def probe_mp4(payload: bytes) -> dict | None:
    """ISO BMFF (MP4/MOV) structural probe — real box-tree parsing,
    no codec: brand, movie duration from ``mvhd``, track count, and
    the first video track's pixel dimensions from ``tkhd``. This is
    the video-corpus stats pass (length distribution, resolution mix,
    corrupt-file screen) that needs no frame decoding; actual frame
    decode stays behind the injectable-codec gate."""
    if len(payload) < 8:
        return None
    boxes = _bmff_boxes
    top = {t: (a, b) for t, a, b in boxes(payload, 0, len(payload))}
    if b"ftyp" not in top or b"moov" not in top:
        return None
    fa, fb = top[b"ftyp"]
    brand = payload[fa : fa + 4].decode("latin-1")
    ma, mb = top[b"moov"]
    duration_ms = None
    n_tracks = 0
    width = height = None
    for typ, a, b in boxes(payload, ma, mb):
        if typ == b"mvhd" and b - a >= 20:
            ver = payload[a]
            if ver == 1 and b - a >= 28:
                scale = int.from_bytes(payload[a + 20 : a + 24], "big")
                dur = int.from_bytes(payload[a + 24 : a + 32], "big")
            else:
                scale = int.from_bytes(payload[a + 12 : a + 16], "big")
                dur = int.from_bytes(payload[a + 16 : a + 20], "big")
            if scale:
                duration_ms = dur * 1000 // scale
        elif typ == b"trak":
            n_tracks += 1
            for t2, a2, b2 in boxes(payload, a, b):
                if t2 == b"tkhd" and b2 - a2 >= 84:
                    # width/height: last 8 bytes, 16.16 fixed point
                    w_fx = int.from_bytes(payload[b2 - 8 : b2 - 4], "big")
                    h_fx = int.from_bytes(payload[b2 - 4 : b2], "big")
                    if w_fx and h_fx and width is None:
                        width, height = w_fx >> 16, h_fx >> 16
    if duration_ms is None and n_tracks == 0:
        return None
    return {
        "brand": brand,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def mp4_sample_table(payload: bytes) -> list[dict] | None:
    """Per-sample (frame) byte ranges and decode timestamps for the
    first track of an ISO BMFF file, from the REAL sample tables
    (stsz sizes, stsc sample-to-chunk runs, stco/co64 chunk offsets,
    stts time deltas, mdhd timescale) — the access-unit index every
    player seeks with, derived without any codec. Frame BYTES are then
    one slice per sample; only entropy decoding of the codec payload
    itself stays behind the injectable-codec gate."""
    if len(payload) < 8:
        return None
    tracks = list(
        _bmff_find(payload, 0, len(payload), [b"moov", b"trak"])
    )
    if not tracks:
        return None
    ta, tb = tracks[0]
    timescale = 0
    for a, b in _bmff_find(payload, ta, tb, [b"mdia", b"mdhd"]):
        ver = payload[a]
        timescale = int.from_bytes(
            payload[a + (20 if ver == 1 else 12) :][:4], "big"
        )
    stbl = next(
        iter(_bmff_find(payload, ta, tb, [b"mdia", b"minf", b"stbl"])),
        None,
    )
    if stbl is None or timescale == 0:
        return None
    sa, sb = stbl
    sizes = offsets = stsc = stts = None
    co64 = False
    for typ, a, b in _bmff_boxes(payload, sa, sb):
        body = payload[a:b]
        # every `count` below is attacker-controlled 32-bit data: a
        # corrupt table must reject, not allocate count-sized lists
        # (a flipped bit once turned `[x] * count` into a 4-billion-
        # entry allocation — an effective hang, found by the fuzz
        # soak). Entry counts are clamped to what the box body
        # actually contains; the body-less uniform-stsz count is
        # validated later against the file-backed chunk tables.
        if typ == b"stsz" and len(body) >= 12:
            uniform = int.from_bytes(body[4:8], "big")
            count = int.from_bytes(body[8:12], "big")
            if uniform:
                uniform_count = count
                sizes = "uniform"  # expanded after validation below
            else:
                if count > (len(body) - 12) // 4:
                    return None
                sizes = [
                    int.from_bytes(body[12 + 4 * i : 16 + 4 * i], "big")
                    for i in range(count)
                ]
        elif typ in (b"stco", b"co64") and len(body) >= 8:
            co64 = typ == b"co64"
            unit = 8 if co64 else 4
            count = int.from_bytes(body[4:8], "big")
            if count > (len(body) - 8) // unit:
                return None
            offsets = [
                int.from_bytes(
                    body[8 + unit * i : 8 + unit * (i + 1)], "big"
                )
                for i in range(count)
            ]
        elif typ == b"stsc" and len(body) >= 8:
            count = int.from_bytes(body[4:8], "big")
            if count > (len(body) - 8) // 12:
                return None
            stsc = [
                tuple(
                    int.from_bytes(
                        body[8 + 12 * i + 4 * j : 12 + 12 * i + 4 * j],
                        "big",
                    )
                    for j in range(3)
                )
                for i in range(count)
            ]
        elif typ == b"stts" and len(body) >= 8:
            count = int.from_bytes(body[4:8], "big")
            if count > (len(body) - 8) // 8:
                return None
            stts = [
                (
                    int.from_bytes(body[8 + 8 * i : 12 + 8 * i], "big"),
                    int.from_bytes(body[12 + 8 * i : 16 + 8 * i], "big"),
                )
                for i in range(count)
            ]
    if not sizes or not offsets or not stsc or not stts:
        return None
    if sizes == "uniform":
        # no per-sample body backs a uniform stsz: bound its count by
        # the file-backed tables (total stts entries cap the sample
        # count; a sample needs at least one byte in the file)
        cap = min(
            sum(n for n, _d in stts), len(payload), 1 << 24
        )
        if uniform_count > cap:
            return None
        sizes = [uniform] * uniform_count
    # expand stsc runs into samples-per-chunk for every chunk
    spc = []
    for i, (first, n, _sdi) in enumerate(stsc):
        last = (
            stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
        )
        # run bounds are table data too: clamp to the chunk count,
        # cap each chunk's samples at the total sample count, and
        # never let overlapping corrupt runs grow spc past one entry
        # per chunk (its semantic size)
        last = min(last, len(offsets))
        if first < 1 or last < first or n > len(sizes):
            continue
        spc.extend([n] * min(last - first + 1, len(offsets) - len(spc)))
        if len(spc) >= len(offsets):
            break
    # expand stts into per-sample deltas (never more than samples)
    deltas = []
    for n, d in stts:
        deltas.extend([d] * min(n, len(sizes) - len(deltas)))
        if len(deltas) >= len(sizes):
            break
    out = []
    si = 0
    t = 0
    for ci, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= len(sizes):
                break
            out.append(
                {
                    "sample_idx": si,
                    "offset": off,
                    "n_bytes": sizes[si],
                    "dts_ms": t * 1000 // timescale,
                }
            )
            off += sizes[si]
            t += deltas[si] if si < len(deltas) else 0
            si += 1
    return out if out else None


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("dts_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        # codec-dispatch context from the container headers: raw DIB
        # frames carry no magic bytes, so the decode side needs the
        # strf-declared codec + geometry travelling WITH the frame
        T.StructField("codec", T.StringType()),
        T.StructField("frame_width", T.LongType()),
        T.StructField("frame_height", T.LongType()),
        T.StructField("frame_bpp", T.LongType()),
    ]
)


def extract_video_frames(
    df: DataFrame, every_n: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas frame extraction over MP4 **and AVI** payloads:
    every ``every_n``-th access unit is sliced out with its decode
    timestamp — MP4 via the real sample-table byte ranges
    (``mp4_sample_table``), AVI via the movi chunk walk
    (``operators/avi.py:iter_avi_frames``). Each frame carries the
    container-declared codec + geometry so the decode side can
    dispatch: MJPEG-in-AVI frames are complete baseline JPEGs,
    rawvideo-in-AVI frames are BI_RGB DIBs, ``raw ``-in-MP4 samples
    are packed top-down RGB, and ``avc1`` (H.264-in-MP4) samples are
    re-prefixed into SELF-CONTAINED Annex B access units (SPS/PPS
    from the avcC record + start codes — the mp4-to-annexb filter),
    decodable by the from-scratch intra decoder (``operators/
    h264.py``). All four paths feed ``decode_video_frame_stats``.
    Unrecognized payloads are dropped."""
    from . import avi as _avi
    from .h264 import avcc_to_annexb as _to_annexb

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                if _avi.is_avi(p):
                    meta = _avi.avi_meta(p) or {}
                    us = meta.get("us_per_frame", 0)
                    codec = meta.get("compression") or meta.get("handler", "")
                    for idx, fb in _avi.iter_avi_frames(p):
                        if idx % every_n:
                            continue
                        rows.append(
                            {
                                "doc_id": i,
                                "sample_idx": idx,
                                "dts_ms": idx * us // 1000,
                                "n_bytes": len(fb),
                                "frame_bytes": fb,
                                "codec": codec,
                                "frame_width": meta.get("width", 0),
                                "frame_height": meta.get("height", 0),
                                "frame_bpp": meta.get("bpp", 0),
                            }
                        )
                    continue
                table = mp4_sample_table(p)
                if table is None:
                    continue
                cfg = mp4_video_config(p) or {}
                avcc = cfg.get("avcc")
                for s in table[::every_n]:
                    fb = p[s["offset"] : s["offset"] + s["n_bytes"]]
                    if avcc is not None:
                        fb = _to_annexb(fb, avcc) or fb
                    rows.append(
                        {
                            "doc_id": i,
                            "sample_idx": s["sample_idx"],
                            "dts_ms": s["dts_ms"],
                            "n_bytes": s["n_bytes"],
                            "frame_bytes": fb,
                            "codec": cfg.get("codec") or "h264",
                            "frame_width": cfg.get("width", 0),
                            "frame_height": cfg.get("height", 0),
                            "frame_bpp": cfg.get("depth", 0),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_idx", "dts_ms", "n_bytes",
                    "frame_bytes", "codec", "frame_width",
                    "frame_height", "frame_bpp",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, VIDEO_FRAME_SCHEMA)


def mp4_video_config(payload: bytes) -> dict | None:
    """{codec, width, height, depth} from the first track's stsd
    sample description (ISO 14496-12 VisualSampleEntry: format fourcc
    at entry offset 4, width/height at 32/34, depth at 82). The
    QuickTime/MP4 ``raw `` format is uncompressed packed RGB in
    top-down row order — fully decodable without a codec, reported
    here as ``rgb24`` to distinguish it from AVI's bottom-up BI_RGB
    DIB form. Returns None when no stsd is present (older fixtures /
    truncated files)."""
    if len(payload) < 8:
        return None
    tracks = list(_bmff_find(payload, 0, len(payload), [b"moov", b"trak"]))
    if not tracks:
        return None
    ta, tb = tracks[0]
    stbl = next(
        iter(_bmff_find(payload, ta, tb, [b"mdia", b"minf", b"stbl"])), None
    )
    if stbl is None:
        return None
    for typ, a, b in _bmff_boxes(payload, stbl[0], stbl[1]):
        if typ != b"stsd" or b - a < 8 + 86:
            continue
        entry = payload[a + 8 : b]  # first sample entry
        if len(entry) < 86:
            return None
        fourcc = entry[4:8].decode("latin-1")
        width = int.from_bytes(entry[32:34], "big")
        height = int.from_bytes(entry[34:36], "big")
        depth = int.from_bytes(entry[82:84], "big")
        codec = "rgb24" if fourcc == "raw " and depth == 24 else (
            fourcc.strip("\x00 ")
        )
        out = {
            "codec": codec,
            "width": width,
            "height": height,
            "depth": depth,
        }
        # avc1 entries carry the decoder config as an avcC child box
        # (ISO 14496-15); the demux side needs it to re-prefix samples
        # into self-contained Annex B access units
        i = 86  # 8 box header + 78 VisualSampleEntry fixed part
        while i + 8 <= len(entry):
            ln = int.from_bytes(entry[i : i + 4], "big")
            if ln < 8 or i + ln > len(entry):
                break
            if entry[i + 4 : i + 8] == b"avcC":
                out["avcc"] = entry[i + 8 : i + ln]
                break
            i += ln
        return out
    return None


def build_mp4_raw(frames_rgb: list, width: int, height: int, fps: int = 10) -> bytes:
    """Fixture writer / re-container tool: pack (h, w, 3) uint8 RGB
    numpy frames into an ISO BMFF file with REAL sample tables (stsz/
    stco/stsc/stts/mdhd) and an stsd ``raw `` VisualSampleEntry —
    uncompressed packed RGB top-down, the QuickTime rawvideo form."""
    return _mux_mp4(
        [f.tobytes() for f in frames_rgb], width, height, fps, b"raw ", b""
    )


def build_mp4_avc(
    samples: list[bytes], avcc: bytes, width: int, height: int,
    fps: int = 10,
) -> bytes:
    """Mux AVCC length-prefixed H.264 access units (e.g. from
    ``h264.annexb_to_avcc``) into ISO BMFF with an ``avc1``
    VisualSampleEntry carrying the AVCDecoderConfigurationRecord as
    its avcC child box (ISO 14496-15) — the standard H.264-in-MP4
    form every real demuxer expects."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    return _mux_mp4(samples, width, height, fps, b"avc1", box(b"avcC", avcc))


def _mux_mp4(
    samples: list[bytes], width: int, height: int, fps: int,
    fourcc: bytes, entry_children: bytes,
) -> bytes:
    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    i32 = lambda v: int(v).to_bytes(4, "big")  # noqa: E731
    i16 = lambda v: int(v).to_bytes(2, "big")  # noqa: E731

    frames = samples
    ftyp = box(b"ftyp", b"isom" + i32(0) + b"isomiso2")
    mdat_start = len(ftyp) + 8
    mdat = box(b"mdat", b"".join(frames))

    # one chunk per frame keeps stsc trivial and offsets exact
    offs, off = [], mdat_start
    for f in frames:
        offs.append(off)
        off += len(f)
    stsz = box(
        b"stsz",
        bytes(4) + i32(0) + i32(len(frames))
        + b"".join(i32(len(f)) for f in frames),
    )
    stco = box(b"stco", bytes(4) + i32(len(offs)) + b"".join(map(i32, offs)))
    stsc = box(b"stsc", bytes(4) + i32(1) + i32(1) + i32(1) + i32(1))
    scale = 1000
    delta = scale // max(fps, 1)
    stts = box(b"stts", bytes(4) + i32(1) + i32(len(frames)) + i32(delta))
    entry = (
        fourcc + bytes(6) + i16(1)  # format, reserved, data_ref_idx
        + bytes(16)                   # pre_defined / reserved
        + i16(width) + i16(height)
        + i32(0x00480000) * 2         # 72 dpi horiz/vert
        + bytes(4) + i16(1)           # reserved, frame_count
        + bytes(32)                   # compressorname
        + i16(24) + i16(0xFFFF)       # depth, pre_defined(-1)
        + entry_children
    )
    stsd = box(b"stsd", bytes(4) + i32(1) + box(fourcc, entry[4:]))
    # NOTE: sample-entry boxes carry their own size+fourcc header; the
    # helper prepends them, so pass the body after the fourcc
    stbl = box(b"stbl", stsd + stsz + stco + stsc + stts)
    mdhd = box(
        b"mdhd", bytes(4) + bytes(8) + i32(scale)
        + i32(delta * len(frames)) + bytes(4)
    )
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + minf)
    # version-0 tkhd body: 4 version/flags + 20 times/track_id +
    # 12 reserved/layer/volume = 36, identity matrix at 40..76,
    # then 16.16 width/height at 76..84 (84-byte body total)
    matrix = (
        i32(0x00010000) + i32(0) + i32(0)
        + i32(0) + i32(0x00010000) + i32(0)
        + i32(0) + i32(0) + i32(0x40000000)
    )
    tkhd = box(
        b"tkhd", bytes(40) + matrix
        + (width << 16).to_bytes(4, "big")
        + (height << 16).to_bytes(4, "big")
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(
        b"mvhd", bytes(4) + bytes(8) + i32(scale)
        + i32(delta * len(frames)) + bytes(80)
    )
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def decode_mp4_raw_frame(fb: bytes, width: int, height: int):
    """Packed top-down RGB ``raw `` sample bytes -> (h, w, 3) uint8,
    or None when the buffer doesn't hold a full frame."""
    if width <= 0 or height <= 0 or len(fb) < width * height * 3:
        return None
    return (
        np.frombuffer(fb[: width * height * 3], dtype=np.uint8)
        .reshape(height, width, 3)
        .copy()
    )


VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("dts_ms", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("pixel_crc32", T.LongType()),
    ]
)


def decode_video_frame_stats(frames: DataFrame) -> DataFrame:
    """REAL per-frame decode over ``extract_video_frames`` output,
    dispatched on the container-declared codec: MJPEG frames run
    through the from-scratch baseline JPEG decoder, AVI rawvideo
    frames through the BI_RGB DIB unpacker (``operators/avi.py:
    decode_dib_frame``), MP4 ``raw `` samples through the packed-RGB
    unpacker, ``avc1`` access units through the from-scratch H.264
    intra decoder (``operators/h264.py``) — each comes back as
    (width, height, crc32 of the decoded RGB pixel buffer), the
    exact-pixel signature downstream dedup / fingerprint stages key
    on. Frames that are none of these (or H.264 shapes the decoder
    rejects: CABAC, P/B, deblocking-required) are dropped, making
    the decoded-vs-demuxed boundary explicit.

    Scale posture: narrow Arrow-batched map, numpy-vectorized IDCT /
    upsampling inside; frame payloads never shuffle."""
    import zlib as _zlib

    from .avi import decode_dib_frame
    from .h264 import decode_h264_annexb
    from .jpeg import decode_jpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, si, dts, fb, codec, fw, fh, bpp in zip(
                pdf["doc_id"], pdf["sample_idx"], pdf["dts_ms"],
                pdf["frame_bytes"], pdf["codec"], pdf["frame_width"],
                pdf["frame_height"], pdf["frame_bpp"],
            ):
                if fb[:2] == b"\xff\xd8":
                    px = decode_jpeg(fb)
                elif codec == "raw":  # AVI BI_RGB: BGR, bottom-up, strided
                    px = decode_dib_frame(fb, int(fw), int(fh), int(bpp))
                elif codec == "rgb24":  # MP4 'raw ': packed RGB, top-down
                    px = decode_mp4_raw_frame(fb, int(fw), int(fh))
                elif codec == "avc1":  # H.264: self-contained Annex B
                    pics = decode_h264_annexb(bytes(fb))
                    px = pics[0] if pics else None
                else:
                    px = None
                if px is None:
                    continue
                rows.append(
                    {
                        "doc_id": i,
                        "sample_idx": si,
                        "dts_ms": dts,
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "pixel_crc32": _zlib.crc32(px.tobytes()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_idx", "dts_ms", "width", "height",
                    "pixel_crc32",
                ],
            )

    return frames.select(
        "doc_id", "sample_idx", "dts_ms", "frame_bytes", "codec",
        "frame_width", "frame_height", "frame_bpp",
    ).mapInPandas(op, VIDEO_FRAME_STATS_SCHEMA)


def mp4_avc_full_annexb(payload: bytes) -> bytes | None:
    """Convert the WHOLE avc1 track of an MP4 payload into one
    self-contained Annex B stream: every sample's NALs in decode
    order, each access unit carrying the avcC record's SPS/PPS
    (repeated parameter sets are legal and our decoder re-parses
    them). This is the GOP form ``h264.decode_h264_annexb`` consumes,
    where a P picture finds its reference in the immediately
    preceding decoded picture — a shape the per-sample
    ``avcc_to_annexb`` + single-frame decode cannot express."""
    st = mp4_avc_annexb_with_table(payload)
    return None if st is None else st[0]


def mp4_avc_annexb_with_table(
    payload: bytes,
) -> tuple[bytes, list[dict]] | None:
    """``mp4_avc_full_annexb`` plus the sample table it was built
    from, so GOP decoders can map decoded picture index -> sample
    timing without re-walking the ISO BMFF boxes."""
    from .h264 import avcc_to_annexb

    table = mp4_sample_table(payload)
    cfg = mp4_video_config(payload)
    if table is None or cfg is None or cfg.get("avcc") is None:
        return None
    avcc = cfg["avcc"]
    parts: list[bytes] = []
    for s in table:
        fb = payload[s["offset"] : s["offset"] + s["n_bytes"]]
        ab = avcc_to_annexb(fb, avcc)
        if ab is None:
            return None
        parts.append(ab)
    return b"".join(parts), table


def decode_video_gop_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """GOP-aware H.264-in-MP4 decode: whole video payloads map to one
    Annex B stream each (``mp4_avc_full_annexb``) and decode
    SEQUENTIALLY through the reference chain — IDR then P pictures
    predicting from the previous decoded (post-deblock) picture. One
    output row per decoded frame: (doc_id, sample_idx, dts_ms, width,
    height, pixel_crc32), same shape as ``decode_video_frame_stats``.

    Scale posture: video decode is inherently sequential WITHIN a GOP
    (each P frame needs its predecessor), so the unit of parallelism
    is the video, not the frame — one Arrow-batched ``mapInPandas``
    row per video, payloads never shuffle, and a 100 TB corpus of
    millions of clips parallelizes across them."""
    import zlib as _zlib

    from .h264 import decode_h264_annexb

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                st = mp4_avc_annexb_with_table(bytes(p))
                if st is None:
                    continue
                stream, table = st
                pics = decode_h264_annexb(stream)
                if pics is None:
                    continue
                if len(pics) != len(table):
                    # decoded-picture count disagreeing with the
                    # container's sample table means a desynced or
                    # corrupt stream — skip the video rather than
                    # emit frames with fabricated timing
                    continue
                for si, px in enumerate(pics):
                    dts = table[si]["dts_ms"]
                    rows.append(
                        {
                            "doc_id": i,
                            "sample_idx": si,
                            "dts_ms": dts,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "pixel_crc32": _zlib.crc32(px.tobytes()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_idx", "dts_ms", "width", "height",
                    "pixel_crc32",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(
        op, VIDEO_FRAME_STATS_SCHEMA
    )


def perceptual_hash(payload: bytes) -> int | None:
    """64-bit pHash of any recognized raster: decode -> grayscale ->
    32x32 nearest resize -> 2D DCT -> top-left 8x8 low-frequency block
    -> median threshold. Robust to re-encoding, resizing, and mild
    edits — the visual analog of SimHash, and the standard key for
    image dedup in multimodal corpora. Returns None for unrecognized
    payloads."""
    px = _decode_pixels(payload)
    if px is None:
        return None
    return phash_pixels(px)


# Fixed-point 32-point DCT-II basis for pHash (scale 2^13) — exact
# int64 arithmetic so the hash is bit-identical on every host of a
# heterogeneous executor fleet (same rationale as jpeg._MI).
_PHASH_N = 32
_PHASH_BI = np.round(
    np.where(
        np.arange(_PHASH_N)[:, None] == 0, 1 / np.sqrt(2), 1.0
    )
    * np.cos(
        (2 * np.arange(_PHASH_N)[None, :] + 1)
        * np.arange(_PHASH_N)[:, None]
        * np.pi
        / (2 * _PHASH_N)
    )
    * (1 << 13)
).astype(np.int64)


def phash_pixels(px: np.ndarray) -> int:
    """64-bit pHash of an already-decoded (H, W, C) raster — the
    pixel-level core of ``perceptual_hash``, exposed so decoded VIDEO
    frames (H.264/MJPEG/raw paths) can be fingerprinted for visual
    near-dup detection without a re-encode round trip."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h < 32 or w < 32:  # tiny inputs: nearest-upsample first so the
        # bucket means below are over non-empty buckets
        gray = gray[(np.arange(32) * h) // 32][:, (np.arange(32) * w) // 32]
        h = w = 32
    # box-filter downsample to 32x32 (bucket means): averaging makes
    # the hash stable under re-encode noise where nearest sampling
    # flips near-threshold bits
    yb = (np.arange(32) * h) // 32
    xb = (np.arange(32) * w) // 32
    rows = np.add.reduceat(gray, yb, axis=0)
    rcnt = np.diff(np.append(yb, h))[:, None]
    cols = np.add.reduceat(rows / rcnt, xb, axis=1)
    ccnt = np.diff(np.append(xb, w))[None, :]
    small = cols / ccnt
    # 32x32 DCT-II in fixed point: float ``@`` is a BLAS reduction
    # whose rounding is CPU-dispatch-dependent, so a coefficient
    # sitting next to the median could flip a hash bit between hosts
    # (the jpeg12 id-50 class — see operators/jpeg.py:_MI). Bucket
    # means are snapped to 1/256 grid elementwise (deterministic),
    # then the DCT runs as exact int64 matmul: |small|<=255*256=2^16,
    # basis<=2^13, stage-2 partials <= 32*2^34*2^13 = 2^52.
    d = _PHASH_BI @ np.rint(small * 256.0).astype(np.int64) @ _PHASH_BI.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])  # skip DC: it is just mean brightness
    bits = block > med
    bits[0] = False
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def image_hashes(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas pHash stage; unrecognized payloads drop out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                hv = perceptual_hash(p)
                if hv is not None:
                    # store as signed 64-bit for Spark LongType
                    rows.append(
                        {"doc_id": i,
                         "phash": hv - (1 << 64) if hv >= 1 << 63 else hv}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return df.select(id_col, "payload").mapInPandas(op, PHASH_SCHEMA)


def image_near_duplicates(
    df: DataFrame, max_hamming: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Visually-near-duplicate image pairs: pHash + pigeonhole block
    join over 4x16-bit blocks. For ``max_hamming`` <= 3 the pigeonhole
    guarantee is exact (3 differing bits cannot touch all 4 blocks);
    above that recall is the standard SimHash-block bound (a pair is
    missed only when every block takes a hit — vanishingly unlikely
    for visually-near images, whose differing bits cluster in the
    high-frequency positions). The join stays collision-sized, never
    all-pairs; the Hamming filter on candidates is one codegen'd
    bit_count(xor).

    Scale posture: identical to the SimHash text path — hash compute
    is a narrow Arrow stage over payloads; pairing shuffles only
    16-bit block collisions."""
    return hamming_near_duplicates(
        image_hashes(df, id_col), "phash", max_hamming, id_col="doc_id"
    )


def hamming_near_duplicates(
    hashes: DataFrame,
    hash_col: str,
    max_hamming: int,
    n_blocks: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate (i, j, hamming) pairs over ANY 64-bit hash
    column by pigeonhole block join — the one pairing API behind the
    image/audio/video fingerprints (and the same shape the text
    SimHash path uses). Exact recall for ``max_hamming`` < n_blocks;
    collision-sized join always; the Hamming filter is one codegen'd
    bit_count(xor)."""
    width = 64 // n_blocks
    mask = (1 << width) - 1
    blocks = hashes.select(
        F.col(id_col),
        F.col(hash_col).alias("_h"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(hash_col), k * width)
                    .bitwiseAND(F.lit(mask))
                    for k in range(n_blocks)
                ]
            )
        ).alias("block", "block_val"),
    )
    left = blocks.select(
        F.col(id_col).alias("i"), F.col("_h").alias("hi"),
        "block", "block_val",
    )
    right = blocks.select(
        F.col(id_col).alias("j"), F.col("_h").alias("hj"),
        "block", "block_val",
    )
    return (
        left.join(right, ["block", "block_val"])
        .where(F.col("i") < F.col("j"))
        .select(
            "i", "j",
            F.bit_count(
                F.col("hi").bitwiseXOR(F.col("hj"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def audio_fingerprint(payload: bytes) -> int | None:
    """64-bit audio fingerprint for PCM WAV: 8 equal time segments x
    9 log-spaced frequency bands; bit(s, b) = energy(s, b) >
    energy(s, b+1) — the band-energy-DIFFERENCE coding of the classic
    Haitsma-Kalker scheme, invariant to volume scaling and robust to
    re-quantization. The audio leg of the cross-modal dedup family
    (pHash for images, MinHash/SimHash for text); pair via the same
    pigeonhole block join as `image_near_duplicates`."""
    meta = decode_wav(payload)
    if meta is None or meta["n_samples"] < 64:
        return None
    _rate, ch, x = _wav_samples(payload)
    n = (x.size // ch) * ch
    mono = x[:n].reshape(-1, ch).mean(axis=1)

    seg_len = mono.size // 8
    out = 0
    for s in range(8):
        seg = mono[s * seg_len : (s + 1) * seg_len]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        # 10 log-spaced band edges from bin 1 to Nyquist -> 9 bands
        edges = np.unique(
            np.geomspace(1, len(spec) - 1, 10).astype(int)
        )
        while len(edges) < 10:  # tiny segments: pad edges linearly,
            # clamped into the spectrum (reduceat raises on an index
            # == len(spec); repeated final edges are legal and yield
            # single-bin bands)
            edges = np.append(edges, min(edges[-1] + 1, len(spec) - 1))
        e = np.add.reduceat(spec, edges[:-1])[:9]
        for b in range(8):
            out = (out << 1) | int(e[b] > e[b + 1])
    return out


def video_fingerprint(payload: bytes) -> int | None:
    """64-bit structural fingerprint for MP4: md5-fold of the frame-
    SIZE sequence (quantized to 6 bits each) plus duration bucket —
    identical re-muxes and byte-trimmed copies of the same encode
    collide, different encodes don't. This is the container-level
    dedup signal (content-level visual dedup needs frame decode, which
    stays behind the codec gate); at corpus scale it removes the exact
    re-upload class, which dominates."""
    import hashlib

    table = mp4_sample_table(payload)
    if table is None:
        return None
    meta = probe_mp4(payload) or {}
    sizes = bytes(min(63, s["n_bytes"] >> 6) for s in table[:4096])
    dur = (meta.get("duration_ms") or 0) // 1000
    digest = hashlib.md5(sizes + b"|" + str(dur).encode()).digest()
    return int.from_bytes(digest[:8], "big") >> 1  # non-negative 63-bit


# ------------------------------------------------------------ pdf text

def extract_pdf_text(payload: bytes) -> str | None:
    """Text from simple (unencrypted, standard-encoding) PDFs: every
    content stream is located by its ``stream``/``endstream`` framing,
    FlateDecode'd with stdlib zlib where marked, and the text-showing
    operators parsed from BT/ET blocks — ``(...) Tj``, ``(...) '``,
    and ``[(..) n (..)] TJ`` arrays, with the standard escape
    sequences and balanced-parens handling. TD/Td/T* start new lines.
    Covers the generated-report class of PDFs (the bulk of crawled
    PDFs that contain extractable text at all); scanned/encrypted/
    CID-font documents return None or partial text and belong to an
    OCR stage. Returns None when the payload is not a PDF."""
    import re
    import zlib

    if not payload.startswith(b"%PDF-"):
        return None
    chunks = []
    for m in re.finditer(rb"stream\r?\n", payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        raw = payload[start:end].rstrip(b"\r\n")
        # the object's dict precedes 'stream'; check it for Flate
        head = payload[max(0, m.start() - 300) : m.start()]
        if b"FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        chunks.append(raw)
    out: list[str] = []
    for data in chunks:
        for bt in re.finditer(rb"BT(.*?)ET", data, re.S):
            block = bt.group(1)
            line: list[str] = []
            i = 0
            n = len(block)
            while i < n:
                c = block[i]
                if c == 0x28:  # '(' literal string
                    j = i + 1
                    depth = 1
                    s = bytearray()
                    while j < n and depth:
                        b = block[j]
                        if b == 0x5C and j + 1 < n:  # backslash escape
                            nxt = block[j + 1]
                            esc = {0x6E: 10, 0x72: 13, 0x74: 9,
                                   0x28: 40, 0x29: 41, 0x5C: 92}
                            s.append(esc.get(nxt, nxt))
                            j += 2
                            continue
                        if b == 0x28:
                            depth += 1
                        elif b == 0x29:
                            depth -= 1
                            if depth == 0:
                                j += 1
                                break
                        s.append(b)
                        j += 1
                    line.append(s.decode("latin-1"))
                    i = j
                    continue
                if block[i : i + 2] in (b"TD", b"Td", b"T*") or (
                    c == 0x27
                ):  # newline operators (and ' shows text on next line)
                    if line:
                        out.append("".join(line))
                        line = []
                i += 1
            if line:
                out.append("".join(line))
    return "\n".join(out)  # "" for a PDF with no extractable text


def build_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Minimal one-page PDF writer for fixtures: Helvetica text lines
    in one (optionally FlateDecode'd) content stream. Structurally
    valid (xref + trailer), accepted by standard viewers."""
    import zlib

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
        b"(%s) Tj 0 -14 Td" % esc(t).encode("latin-1") for t in lines
    ) + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, xref)
    )
    return bytes(out)


def extract_docx_text(payload: bytes) -> str | None:
    """Text from a DOCX (OOXML) payload: stdlib zipfile to
    ``word/document.xml``, paragraphs (``</w:p>``) to newlines, tags
    stripped, the five standard XML entities decoded. Returns None
    for non-zip / non-DOCX payloads."""
    import io
    import re
    import zipfile

    import zlib

    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            xml = zf.read("word/document.xml").decode("utf-8", "replace")
    except (
        zipfile.BadZipFile,
        KeyError,
        OSError,
        zlib.error,
        EOFError,
        ValueError,
        NotImplementedError,
    ):
        return None
    xml = re.sub(r"</w:p>", "\n", xml)
    text = re.sub(r"<[^>]+>", "", xml)
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'")]:
        text = text.replace(ent, ch)
    return re.sub(r"\n{2,}", "\n", text).strip()


def build_docx(paragraphs: list[str]) -> bytes:
    """Minimal DOCX writer for fixtures (content types + document
    part; accepted by Word-compatible readers)."""
    import io
    import zipfile

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    body = "".join(
        f"<w:p><w:r><w:t>{esc(p)}</w:t></w:r></w:p>" for p in paragraphs
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + body
        + "</w:body></w:document>"
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
        'document.main+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()


DOC_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("doc_format", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def extract_document_text(payload: bytes) -> tuple[str, str] | None:
    """(format, text) for any recognized document payload — the single
    dispatch a corpus ingest calls: PDF and DOCX route to their real
    extractors; HTML-looking bytes are tagged for the JVM-side
    `operators/text.py:html_to_text` (returned RAW here — stripping
    belongs in the codegen'd column path, not per-row Python); valid
    UTF-8 passes through as plain text. None = binary junk."""
    if payload.startswith(b"%PDF-"):
        t = extract_pdf_text(payload)
        return ("pdf", t) if t is not None else None
    if payload[:2] == b"PK":
        t = extract_docx_text(payload)
        if t is not None:
            return ("docx", t)
        ch = extract_epub_html(payload)
        if ch:
            # raw XHTML joined; strip JVM-side like the html branch
            return ("epub", "\n".join(html for _n, html in ch))
        return None
    head = payload[:256].lstrip().lower()
    if head.startswith((b"<!doctype html", b"<html")):
        try:
            return ("html", payload.decode("utf-8", "strict"))
        except UnicodeDecodeError:
            return ("html", payload.decode("latin-1"))
    try:
        return ("text", payload.decode("utf-8", "strict"))
    except UnicodeDecodeError:
        return None


def extract_document_texts(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas document-text stage over mixed payloads; binary
    junk drops out. Downstream: `where(doc_format = 'html')` rows go
    through `html_to_text` JVM-side, everything else is ready for the
    quality/dedup surface."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                r = extract_document_text(p)
                if r is not None:
                    rows.append(
                        {"doc_id": i, "doc_format": r[0], "text": r[1]}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "doc_format", "text"])

    return df.select(id_col, "payload").mapInPandas(op, DOC_TEXT_SCHEMA)


def _decode_ico_pixels(payload: bytes) -> np.ndarray | None:
    """Largest image from an ICO/CUR container: each directory entry
    points at either a complete PNG (modern favicons) or a header-less
    BMP (BITMAPINFOHEADER with DOUBLED height covering the XOR pixel
    block plus the 1-bit AND mask). Reuses the PNG decoder; the BMP
    branch handles the 32/24-bit uncompressed forms favicons use."""
    if len(payload) < 6 or payload[:4] not in (
        b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"
    ):
        return None
    n = struct.unpack_from("<H", payload, 4)[0]
    if n == 0 or len(payload) < 6 + 16 * n:
        return None
    best = None
    for k in range(n):
        off = 6 + 16 * k
        w, h = payload[off], payload[off + 1]
        w, h = w or 256, h or 256
        size, data_off = struct.unpack_from("<II", payload, off + 8)
        if data_off + size > len(payload):
            continue
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, data_off, size)
    if best is None:
        return None
    w, h, data_off, size = best
    blob = payload[data_off : data_off + size]
    if blob.startswith(_PNG_SIG):
        return _png_pixels(blob)
    if len(blob) < 40:
        return None
    hdr_size, bw, bh2 = struct.unpack_from("<Iii", blob, 0)
    planes, bpp = struct.unpack_from("<HH", blob, 12)
    compression = struct.unpack_from("<I", blob, 16)[0]
    if hdr_size != 40 or compression != 0 or bpp not in (24, 32):
        return None
    bh = abs(bh2) // 2  # doubled height: XOR block + AND mask
    c = bpp // 8
    stride = (bw * c + 3) & ~3
    if 40 + stride * bh > len(blob):
        return None
    raw = np.frombuffer(
        blob, np.uint8, count=stride * bh, offset=40
    ).reshape(bh, stride)[:, : bw * c].reshape(bh, bw, c)
    px = raw[::-1]  # bottom-up
    order = [2, 1, 0] if c == 3 else [2, 1, 0, 3]
    return px[..., order]


def extract_epub_html(payload: bytes) -> list[tuple[str, str]] | None:
    """(spine-ordered-ish name, raw XHTML) chapters from an EPUB — a
    zip whose mimetype member says ``application/epub+zip``. Raw HTML
    is returned for the JVM-side `html_to_text` stripper (same
    contract as the document router's html branch: per-row Python only
    locates content, the stripping stays codegen'd)."""
    import io
    import zipfile

    import zlib

    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            names = zf.namelist()
            if "mimetype" in names:
                if b"epub" not in zf.read("mimetype"):
                    return None
            elif not any(n.endswith(".opf") for n in names):
                return None
            out = []
            for n in sorted(names):
                if n.lower().endswith((".xhtml", ".html", ".htm")):
                    out.append(
                        (n, zf.read(n).decode("utf-8", "replace"))
                    )
            return out
    except (
        zipfile.BadZipFile,
        OSError,
        zlib.error,
        EOFError,
        ValueError,
        NotImplementedError,
    ):
        return None


def _decode_tga_pixels(payload: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 for a TGA: types 1/2 (palette/truecolor raw)
    and 9/10 (RLE), 8-bit palette indices or 24/32-bit BGR(A)
    pixels, bottom-up or top-down origin. TGA has no magic number, so
    this is only dispatched for payloads nothing else claimed AND
    whose header fields validate strictly."""
    if len(payload) < 18:
        return None
    id_len = payload[0]
    cmap_type = payload[1]
    img_type = payload[2]
    cm_start, cm_len = struct.unpack_from("<HH", payload, 3)
    cm_bits = payload[7]
    w, h = struct.unpack_from("<HH", payload, 12)
    bpp = payload[16]
    desc = payload[17]
    if img_type not in (1, 2, 9, 10) or cmap_type not in (0, 1):
        return None
    if w == 0 or h == 0 or w > 16384 or h > 16384:
        return None
    paletted = img_type in (1, 9)
    if paletted:
        if cmap_type != 1 or bpp != 8 or cm_bits not in (24, 32):
            return None
    elif bpp not in (24, 32):
        return None
    pos = 18 + id_len
    pal = None
    if cmap_type == 1:
        entry = cm_bits // 8
        need = cm_len * entry
        if pos + need > len(payload):
            return None
        raw_pal = np.frombuffer(
            payload, np.uint8, count=need, offset=pos
        ).reshape(cm_len, entry)
        pal = raw_pal[:, [2, 1, 0]]  # BGR(A) -> RGB
        pos += need
    c = 1 if paletted else bpp // 8
    n_px = w * h
    if img_type in (1, 2):  # raw
        need = n_px * c
        if pos + need > len(payload):
            return None
        flat = np.frombuffer(payload, np.uint8, count=need, offset=pos)
    else:  # RLE packets
        out = bytearray()
        limit = n_px * c
        while len(out) < limit and pos < len(payload):
            hdr = payload[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                px = payload[pos : pos + c]
                if len(px) < c:
                    return None
                out += px * count
                pos += c
            else:  # literal packet
                take = count * c
                chunk = payload[pos : pos + take]
                if len(chunk) < take:
                    return None
                out += chunk
                pos += take
        if len(out) < limit:
            return None
        flat = np.frombuffer(bytes(out[:limit]), np.uint8)
    grid = flat.reshape(h, w, c)
    if not desc & 0x20:  # bit 5 clear: bottom-up origin
        grid = grid[::-1]
    if paletted:
        idx = grid[..., 0]
        if int(idx.max(initial=0)) >= (cm_start + len(pal)):
            return None
        return pal[idx - cm_start]
    order = [2, 1, 0] if c == 3 else [2, 1, 0, 3]
    return grid[..., order]
