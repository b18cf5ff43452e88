"""AVI (RIFF) container mux/demux for MJPEG and rawvideo — the
decoded video paths.

Implements the public AVI RIFF form (Microsoft "AVI RIFF File
Reference"): ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' 00dc...) idx1)``. Two fully-decodable codecs:

- Motion-JPEG (``MJPG`` fourcc, ``00dc`` chunks): one complete
  baseline JPEG per chunk; frame DECODE reuses the repo's
  from-scratch ITU T.81 decoder (``operators/jpeg.py:decode_jpeg``).
- rawvideo (``DIB `` handler, ``biCompression=0`` BI_RGB, ``00db``
  chunks): uncompressed device-independent bitmaps — 24-bit BGR,
  bottom-up rows, 4-byte-aligned stride, per the Windows
  BITMAPINFOHEADER spec (``decode_dib_frame``).

No codec stub on either path, unlike H.264-in-MP4 where only demux
is real (``operators/multimodal.py:mp4_sample_table``).

Scale posture: one AVI payload is one row; demux is a linear chunk
walk over that row's bytes and frame decode is per-frame numpy work —
all inside Arrow-batched ``mapInPandas`` tasks, payloads never shuffle
or reach the driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for RIFF chunks in
    [pos, end); tolerant of truncation (stops instead of raising)."""
    while pos + 8 <= end:
        fcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            return
        yield fcc, body, body + size
        pos = body + size + (size & 1)  # chunks are word-aligned


def build_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Serialize JPEG-per-frame bytes into a standard MJPEG AVI
    (avih + one 'vids'/'MJPG' stream + movi + idx1). Fixture writer
    for the decode path and a re-container tool for frame shards."""
    return _build_avi(
        frames, width, height, fps,
        handler=b"MJPG",
        compression=struct.unpack("<I", b"MJPG")[0],
        chunk_id=b"00dc",
    )


def dib_stride(width: int, bpp: int = 24) -> int:
    """DIB rows are padded to 4-byte boundaries (BITMAPINFOHEADER)."""
    return ((width * (bpp // 8) + 3) // 4) * 4


def encode_dib_frame(rgb) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed BI_RGB DIB frame bytes:
    BGR channel order, bottom-up row order, 4-byte-aligned stride."""
    import numpy as np

    h, w = rgb.shape[:2]
    stride = dib_stride(w)
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    return out.tobytes()


def decode_dib_frame(fb: bytes, width: int, height: int, bpp: int = 24):
    """Uncompressed BI_RGB DIB frame bytes -> (h, w, 3) uint8 RGB
    (top-down), or None when the buffer doesn't hold a full frame or
    the depth isn't the 24-bit form rawvideo AVIs use."""
    import numpy as np

    if bpp != 24 or width <= 0 or height <= 0:
        return None
    stride = dib_stride(width, bpp)
    if len(fb) < stride * height:
        return None
    rows = np.frombuffer(fb[: stride * height], dtype=np.uint8).reshape(
        height, stride
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()


def build_avi_rawvideo(
    frames_rgb: list, width: int, height: int, fps: int = 10
) -> bytes:
    """Serialize (h, w, 3) uint8 RGB numpy frames into an uncompressed
    rawvideo AVI: 'DIB ' handler, ``biCompression=0`` (BI_RGB), 24-bit
    bottom-up DIB frames in ``00db`` chunks — the standard form
    ffmpeg's ``-c:v rawvideo`` emits for AVI."""
    return _build_avi(
        [encode_dib_frame(f) for f in frames_rgb],
        width, height, fps,
        handler=b"DIB ",
        compression=0,
        chunk_id=b"00db",
    )


def _build_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int,
    handler: bytes,
    compression: int,
    chunk_id: bytes,
) -> bytes:
    us_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<14I",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack(
            "<10I4H",
            0, 0, 0, 1, fps, 0, len(frames), max_bytes, 0xFFFFFFFF, 0,
            0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, width, height, 1, 24,
        compression,
        dib_stride(width) * height, 0, 0, 0, 0,
    )

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += chunk_id + struct.pack("<3I", 0x10, len(movi_body), len(f))
        movi_body += chunk(chunk_id, f)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def avi_meta(payload: bytes) -> dict | None:
    """{width, height, n_frames, us_per_frame, handler, bpp,
    compression} from the AVI main + stream headers; None when the
    payload isn't a parseable AVI. ``compression`` is the strf
    ``biCompression`` fourcc as text, with BI_RGB (0) reported as
    ``"raw"`` — the codec-dispatch key for the decode side."""
    if not is_avi(payload) or len(payload) < 12:
        return None
    meta = None
    handler = ""
    bpp = 0
    compression = ""
    seen_vids = False
    for fcc, a, b in _chunks(payload, 12, len(payload)):
        if fcc != b"LIST" or payload[a : a + 4] != b"hdrl":
            continue
        for f2, c, d in _chunks(payload, a + 4, b):
            if f2 == b"avih" and d - c >= 40:
                us, _mb, _pad, _fl, n, _ini, _ns, _sb, w, h = (
                    struct.unpack_from("<10I", payload, c)
                )
                meta = {
                    "width": w,
                    "height": h,
                    "n_frames": n,
                    "us_per_frame": us,
                }
            elif f2 == b"LIST" and payload[c : c + 4] == b"strl":
                seen_vids = False
                for f3, e, g in _chunks(payload, c + 4, d):
                    if f3 == b"strh" and g - e >= 8:
                        seen_vids = payload[e : e + 4] == b"vids"
                        if seen_vids:
                            handler = (
                                payload[e + 4 : e + 8]
                                .decode("latin-1")
                                .strip("\x00 ")
                            )
                    elif f3 == b"strf" and g - e >= 20 and seen_vids:
                        # BITMAPINFOHEADER: biBitCount @14, biCompression @16
                        (bpp,) = struct.unpack_from("<H", payload, e + 14)
                        (comp,) = struct.unpack_from("<I", payload, e + 16)
                        compression = (
                            "raw"
                            if comp == 0
                            else struct.pack("<I", comp)
                            .decode("latin-1")
                            .strip("\x00 ")
                        )
    if meta is None:
        return None
    meta["handler"] = handler
    meta["bpp"] = bpp
    meta["compression"] = compression
    return meta


def iter_avi_frames(payload: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_idx, frame_bytes) for every video chunk (``##dc``
    compressed / ``##db`` uncompressed) in the movi list. Malformed or
    truncated data ends iteration rather than raising."""
    if not is_avi(payload):
        return
    idx = 0
    for fcc, a, b in _chunks(payload, 12, len(payload)):
        if fcc != b"LIST" or payload[a : a + 4] != b"movi":
            continue
        for f2, c, d in _chunks(payload, a + 4, b):
            if f2[2:4] in (b"dc", b"db") and f2[:2].isdigit():
                yield idx, payload[c:d]
                idx += 1
