"""QOI ("Quite OK Image") codec in pure numpy + stdlib.

Implements the complete public QOI specification (qoiformat.org,
qoi-specification.pdf, 2022): the 14-byte header (magic ``qoif``,
big-endian width/height, channels 3/4, colorspace byte), all six
chunk ops — QOI_OP_RGB (0xFE), QOI_OP_RGBA (0xFF), QOI_OP_INDEX
(2-bit tag 00 + hash-table index), QOI_OP_DIFF (tag 01, per-channel
-2..1 deltas), QOI_OP_LUMA (tag 10, green delta -32..31 with
red/blue deltas -8..7 relative to it), QOI_OP_RUN (tag 11, run
1..62; 63/64 are the RGB/RGBA tags) — the 64-entry rolling color
index keyed by (3r + 5g + 7b + 11a) mod 64, and the 8-byte end
marker (seven 0x00 then 0x01).

Same deployment posture as the rest of the codec family: per-payload
CPU work inside Arrow-batched ``mapInPandas`` stages
(``operators/multimodal.py``) — a narrow map with no shuffle, so at
100 TB it scales with input splits. Decode is a per-chunk Python
walk bounded by the payload byte count; encode vectorizes nothing
(QOI is inherently sequential) but payloads in the gate are small
fixtures.

Reference parity note: the reference repo has no image layer at all
(its 440-line surface is pandas/canvasapi ETL); this module exists
for the multimodal training-data pipeline the build brief requires.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode an (H, W, 3) or (H, W, 4) uint8 array to QOI bytes,
    preferring ops in the spec's natural order (run, index, diff,
    luma, rgb/rgba) — the same choices the reference encoder makes,
    so output is byte-identical to qoi.h for the same input."""
    px = np.asarray(pixels)
    if px.ndim != 3 or px.shape[2] not in (3, 4) or px.dtype != np.uint8:
        raise ValueError("expected (H, W, 3|4) uint8")
    h, w, nc = px.shape
    out = bytearray(_MAGIC)
    out += struct.pack(">IIBB", w, h, nc, colorspace)

    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = px.reshape(-1, nc)
    for row in flat:
        r, g, b = int(row[0]), int(row[1]), int(row[2])
        a = int(row[3]) if nc == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = _hash(r, g, b, a)
        if index[ih] == (r, g, b, a):
            out.append(ih)
        else:
            index[ih] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg = dr - dg
                db_dg = db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr_dg <= 7
                    and -8 <= db_dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes([0xFE, r, g, b])
            else:
                out += bytes([0xFF, r, g, b, a])
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(payload: bytes) -> np.ndarray | None:
    """Decode QOI bytes to an (H, W, 3|4) uint8 array, or None for
    non-QOI / malformed payloads (truncated streams, bad header
    fields, missing end marker bytes are all rejected cleanly —
    the decoder never raises on foreign input)."""
    if len(payload) < 14 + len(_END) or payload[:4] != _MAGIC:
        return None
    w, h, nc, colorspace = struct.unpack_from(">IIBB", payload, 4)
    if nc not in (3, 4) or colorspace > 1 or w == 0 or h == 0:
        return None
    if w * h > 1 << 26:  # bound claimed dimensions before allocating
        return None
    n = w * h
    out = np.empty((n, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(payload) - len(_END)
    if payload[end:] != _END:
        return None
    i = 0
    while i < n:
        if pos >= end:
            return None
        b1 = payload[pos]
        pos += 1
        if b1 == 0xFE:  # QOI_OP_RGB
            if pos + 3 > end:
                return None
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif b1 == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > end:
                return None
            r, g, b, a = (
                payload[pos],
                payload[pos + 1],
                payload[pos + 2],
                payload[pos + 3],
            )
            pos += 4
        elif b1 >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = index[b1]
        elif b1 >> 6 == 1:  # QOI_OP_DIFF
            r = (r + ((b1 >> 4) & 3) - 2) % 256
            g = (g + ((b1 >> 2) & 3) - 2) % 256
            b = (b + (b1 & 3) - 2) % 256
        elif b1 >> 6 == 2:  # QOI_OP_LUMA
            if pos + 1 > end:
                return None
            dg = (b1 & 0x3F) - 32
            b2 = payload[pos]
            pos += 1
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b2 & 0xF) - 8) % 256
        else:  # QOI_OP_RUN
            run = (b1 & 0x3F) + 1
            if i + run > n:
                return None
            out[i : i + run] = (r, g, b, a)
            i += run
            # qoi.h writes the index slot after EVERY chunk, runs
            # included — visible when a run is the first chunk
            index[_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    return out[:, :nc].reshape(h, w, nc).copy()
