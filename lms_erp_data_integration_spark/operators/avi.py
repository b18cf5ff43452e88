"""AVI (RIFF) container mux/demux for MJPEG video — the decoded
video path.

Implements the public AVI RIFF form (Microsoft "AVI RIFF File
Reference"): ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' 00dc...) idx1)``. Motion-JPEG stores one complete baseline
JPEG image per ``00dc`` chunk, so frame DECODE reuses the repo's
from-scratch ITU T.81 decoder (``operators/jpeg.py:decode_jpeg``) —
no codec stub on this path, unlike H.264-in-MP4 where only demux is
real (``operators/multimodal.py:mp4_sample_table``).

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
    us_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<14I",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0, 1, fps, 0, len(frames), max_bytes, 0xFFFFFFFF, 0,
            0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, width, height, 1, 24,
        struct.unpack("<I", b"MJPG")[0],
        width * height * 3, 0, 0, 0, 0,
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
        idx += b"00dc" + struct.pack("<3I", 0x10, len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def avi_meta(payload: bytes) -> dict | None:
    """{width, height, n_frames, us_per_frame, handler} from the AVI
    main + stream headers; None when the payload isn't a parseable
    AVI."""
    if not is_avi(payload) or len(payload) < 12:
        return None
    meta = None
    handler = ""
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
                for f3, e, g in _chunks(payload, c + 4, d):
                    if f3 == b"strh" and g - e >= 8:
                        if payload[e : e + 4] == b"vids":
                            handler = (
                                payload[e + 4 : e + 8]
                                .decode("latin-1")
                                .strip("\x00 ")
                            )
    if meta is None:
        return None
    meta["handler"] = handler
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
