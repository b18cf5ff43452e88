"""GIF87a/GIF89a decode in pure Python/numpy — no external codec.

Implements the public GIF specification: logical screen descriptor,
global/local color tables, extension blocks, sub-block framing,
variable-width LSB-first LZW with CLEAR/END codes and the deferred
dictionary-growth rule, and the 4-pass interlace ordering. Returns the
FIRST frame as (H, W, 3) uint8 — for feature extraction a later frame
adds nothing; ``gif_frame_count`` walks the block structure for the
animation pre-flight without any LZW decode.

Also ships a minimal spec-compliant encoder for round-trip fixtures:
it emits a CLEAR code before every pixel code so the dictionary never
grows (a classic valid-but-uncompressed LZW stream any decoder
accepts), with optional interlacing.

Like the JPEG/PNG/WAV kernels this is per-payload CPU work inside
Arrow-batched ``mapInPandas`` stages — a narrow map that scales with
input splits and never shuffles payloads.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain; returns (payload, pos after the
    0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("unterminated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(data) - pos < n:
            raise ValueError("truncated sub-block")
        pos += n


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> list[int]:
    """Variable-width LSB-first GIF LZW."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                # some encoders omit the END code; accept if complete
                if len(out) >= n_pixels:
                    return out[:n_pixels]
                raise ValueError("LZW stream exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            if len(dictionary) < 4096:  # 12-bit dictionary cap
                dictionary.append(prev + entry[:1])
        elif code == len(dictionary) and len(dictionary) < 4096:  # KwKwK
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError("invalid LZW code")
        out.extend(entry)
        prev = entry
        # width grows when the dictionary fills the current code space,
        # capped at 12 bits per spec
        if len(dictionary) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            return out[:n_pixels]
    return out[:n_pixels]


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(payload: bytes) -> np.ndarray | None:
    """First frame of a GIF as (H, W, 3) uint8, else None."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        return _decode_gif_inner(payload)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_gif_inner(data: bytes) -> np.ndarray | None:
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return None
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            _, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:  # image descriptor expected
            return None
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if w == 0 or h == 0:
            return None
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            return None
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            return None
        lzw, pos = _read_subblocks(data, pos)
        idx = np.array(_lzw_decode(mcs, lzw, w * h), np.int64)
        if idx.size != w * h or int(idx.max(initial=0)) >= len(ct):
            return None
        grid = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            ordered = np.empty_like(grid)
            ordered[np.array(rows)] = grid
            grid = ordered
        return ct[grid]  # palette lookup -> (h, w, 3)
    return None


def _lzw_encode_bits(mcs: int, seq, emit) -> None:
    """Real LZW compression. The code width must follow the DECODER's
    table, which appends one entry per data code processed starting
    with the second — one code BEHIND this encoder's own assignments —
    so the width bump is driven by a simulated decoder table length
    (``dec_len``), not by ``next_code``. (The 9 real-world GIFs in the
    test suite pin the decoder's post-append ``len == 2^width`` rule;
    this mirrors it.)"""
    clear = 1 << mcs
    end = clear + 1
    dictionary = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    dec_len = end + 1  # decoder's table length (clear-table state)
    emitted = 0
    emit(clear, width)

    def emit_data(code: int) -> None:
        nonlocal width, dec_len, emitted
        emit(code, width)
        emitted += 1
        if emitted >= 2 and dec_len < 4096:
            dec_len += 1  # decoder appends after processing this code
            if dec_len == (1 << width) and width < 12:
                width += 1

    w = b""
    for c in seq:
        wc = w + bytes([int(c)])
        if wc in dictionary:
            w = wc
            continue
        emit_data(dictionary[w])
        if next_code < 4096:
            dictionary[wc] = next_code
            next_code += 1
        w = bytes([int(c)])
    if w:
        emit_data(dictionary[w])
    emit(end, width)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    compress: bool = True,
) -> bytes:
    """Minimal GIF89a encoder for fixtures: one frame, global color
    table, optional interlacing. ``compress=True`` runs real LZW
    (exercises the decoder's dictionary growth and width changes);
    ``compress=False`` emits CLEAR before every pixel code — a valid
    zero-compression stream any decoder accepts."""
    idx = np.asarray(indices)
    pal = np.asarray(palette, np.uint8)
    h, w = idx.shape
    n = len(pal)
    bits = max(2, int(n - 1).bit_length())
    size_field = bits - 1
    full = 1 << bits
    mcs = bits
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    table = np.zeros((full, 3), np.uint8)
    table[:n] = pal
    out += table.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    out += bytes([mcs])

    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        seq = idx[np.array(rows)].ravel()
    else:
        seq = idx.ravel()

    acc = 0
    nbits = 0
    body = bytearray()

    def emit(code: int, w_: int = 0) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w_ or width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    if compress:
        _lzw_encode_bits(mcs, seq, emit)
    else:
        for v in seq:
            emit(clear)
            emit(int(v))
        emit(end)
    if nbits:
        body.append(acc & 0xFF)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_frame_count(payload: bytes) -> int | None:
    """Number of frames (image descriptors) in a GIF — the animation
    pre-flight, walked from block structure only (no LZW decode: each
    frame's data sub-blocks are length-skipped)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        flags = payload[10]
        pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
        frames = 0
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:
                break
            if b == 0x21:
                pos += 2
                _, pos = _read_subblocks(payload, pos)
            elif b == 0x2C:
                iflags = payload[pos + 9]
                pos += 10
                if iflags & 0x80:
                    pos += 3 * (2 << (iflags & 0x07))
                pos += 1  # LZW min code size
                _, pos = _read_subblocks(payload, pos)
                frames += 1
            else:
                return None
        return frames
    except (IndexError, ValueError):
        return None
