"""JPEG codec in pure numpy + stdlib — no external codec.

Implements the public ITU-T T.81 sequential DCT processes (Huffman and
arithmetic entropy coding) plus progressive Huffman:

- ``decode_jpeg``: markers (SOI/APPn/COM/DQT/DHT/DAC/SOF0/1/2/9/DRI/
  SOS/EOI), canonical Huffman tables as encoders actually write them,
  entropy-coded-segment byte unstuffing and RSTn restart handling,
  dequantize + inverse zigzag, matrix IDCT, chroma upsampling for any
  h/v sampling factors in {1, 2} (4:4:4, 4:2:2, 4:4:0, 4:2:0), and
  JFIF YCbCr -> RGB. SOF9 (sequential DCT, ARITHMETIC coding) decodes
  through the QM-coder (``operators/qm.py``) with the T.81 F.1.4.4.1
  statistical model: DC difference conditioning on the previous diff
  classified by the DAC-declared (L, U) bounds, AC contexts indexed by
  coefficient position with the Kx low/high split, and the fixed ~0.5
  state for AC signs. SOF10 (PROGRESSIVE DCT, arithmetic) runs the
  same statistical model per scan under the Annex-G spectral-selection
  / successive-approximation rules: DC refinement bits and newly-
  significant AC signs on the fixed state, AC refinement corrections
  on the position context + 2, EOB decisions only past the previous
  stage's end-of-block index. Returns an (H, W, C) uint8 array, or
  None for anything outside these processes (12-bit precision,
  hierarchical, arithmetic lossless), so callers can fall back.
- ``encode_jpeg``: baseline encoder used for test fixtures and the
  write path — standard Annex-K quantization tables with the libjpeg
  quality scaling, 4:4:4 or 4:2:0, optional restart intervals. It
  emits flat canonical Huffman tables (12 x 4-bit DC codes, 256 x
  9-bit AC codes) — spec-valid and decodable by ANY baseline decoder,
  trading some compression for zero table-construction risk.
- ``encode_jpeg_arith``: the SOF9 twin — identical DCT/quantization
  path, QM-coded entropy layer with DAC conditioning, same subsample/
  restart options. Exercises the arithmetic decode path end-to-end.
- ``encode_jpeg_lossless`` / ``decode_jpeg_lossless16``: the LOSSLESS
  process (T.81 SOF3/H.1): spatial predictors 1-7, point transform,
  Huffman-coded modulo-2^16 differences, precision 2-16 — bit-exact
  round-trips; precision <= 8 also decodes through the ordinary
  ``decode_jpeg`` 8-bit path and pixel dispatcher.

Everything here is per-payload CPU work invoked from Arrow-batched
``mapInPandas`` stages (`operators/multimodal.py`) — a narrow map with
no shuffle, so at 100 TB it scales with input splits exactly like the
raster decoders. The pixel loops that matter (IDCT, upsample, color
convert) are numpy-vectorized per block/plane; only the Huffman bit
walk is per-symbol Python, bounded by the entropy-coded byte count.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- shared

_ZIGZAG = []  # (row, col) in zigzag order, derived not hardcoded
for _s in range(15):
    _rng = range(_s, -1, -1) if _s % 2 == 0 else range(0, _s + 1)
    for _r in _rng:
        _c = _s - _r
        if _r < 8 and _c < 8:
            _ZIGZAG.append((_r, _c))
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# 8x8 DCT-II basis: M[u, x] = a(u)/2 * cos((2x+1) u pi / 16)
_M = np.zeros((8, 8))
for _u in range(8):
    _a = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = _a / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Fixed-point integer DCT basis (scale 2^13), used for BOTH the FDCT
# and the IDCT. A float64 ``@`` is a SIMD/FMA-dependent reduction: the
# same stream decoded on different CPU generations can differ by one
# ulp, and np.round / astype turns that into a different coefficient
# or pixel whenever a value sits on a rounding boundary (the
# llm_decode_pixel_checksums id-50 CRC flip the r8 driver caught, and
# again between r11/r12 hosts). int64 matmul is exact and associative
# — bit-identical on every executor of a heterogeneous fleet — the
# same reproducibility argument as libjpeg's islow integer DCT.
# Overflow bound (decode, hostile input): |coef*q| < 2^31, basis
# < 2^12, so stage-2 partials < 8 * 2^45 * 2^12 = 2^61 < 2^63.
_DCT_SHIFT = 13
_MI = np.round(_M * (1 << _DCT_SHIFT)).astype(np.int64)

# Annex K quantization tables (natural row-major order)
_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> scaled table clipped to
    [1, 255] (baseline requires 8-bit table entries)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment.

    Table-driven: ``peek16``/``skip`` let Huffman decoding resolve one
    symbol per table lookup instead of one dict probe per bit — the
    decode hot loop's cost is one int shift + one list index per
    symbol. Reads past the real stream surface as EOFError only when
    CONSUMED bits exceed the stream (peeking into virtual 1-padding is
    legal — encoders pad the final byte with 1s)."""

    __slots__ = ("data", "nbytes", "acc", "nbits", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.nbytes = len(data)
        self.acc = 0
        self.nbits = 0
        self.pos = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < self.nbytes else 0xFF
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        if (self.pos << 3) - self.nbits > (self.nbytes << 3):
            raise EOFError

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)


class _HuffTable:
    """Canonical Huffman table compiled to a 65536-entry peek table:
    entry i = (symbol, code length) for the 16-bit window i; length 0
    marks an invalid prefix."""

    __slots__ = ("sym", "length")

    def __init__(self, bits: list[int], vals: bytes):
        sym = [0] * 65536
        length = [0] * 65536
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                start = code << (16 - ln)
                span = 1 << (16 - ln)
                sym[start : start + span] = [vals[k]] * span
                length[start : start + span] = [ln] * span
                code += 1
                k += 1
            code <<= 1
        self.sym = sym
        self.length = length


def _build_huffman(bits: list[int], vals: bytes) -> _HuffTable:
    return _HuffTable(bits, vals)


def _huff_decode(reader: _BitReader, table: _HuffTable) -> int:
    w = reader.peek16()
    ln = table.length[w]
    if ln == 0:
        raise ValueError("invalid Huffman code")
    reader.skip(ln)
    return table.sym[w]


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the raw ``size``-bit magnitude to its signed
    value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_ecs(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded data at ``start`` into restart segments
    with 0xFF00 unstuffed; returns (segments, index of the terminating
    marker's 0xFF)."""
    segs, out, i = [], bytearray(), start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else None
        if nxt == 0x00:
            out.append(0xFF)
            i += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(out))
            out = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(out))
    return segs, i


_DECODE_ERRORS = (
    ValueError,
    EOFError,
    IndexError,
    KeyError,
    OverflowError,
    struct.error,
    ZeroDivisionError,
)


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline-sequential, extended-sequential (Huffman),
    PROGRESSIVE (SOF2: spectral selection + successive approximation),
    sequential-ARITHMETIC (SOF9, QM-coded), or LOSSLESS (SOF3, spatial
    prediction, precision <= 8) JPEG to (H, W, C) uint8 (C = 1
    grayscale or 3 RGB). Returns None for non-JPEG payloads and the
    processes outside the 8-bit raster contract (12-bit DCT — use
    ``decode_jpeg12`` — deep lossless — use
    ``decode_jpeg_lossless16`` — arithmetic lossless,
    hierarchical)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        out = _decode_jpeg_inner(payload)
    except _DECODE_ERRORS:
        return None
    if out is not None and out.dtype != np.uint8:
        return None  # deep precision: not an 8-bit raster
    return out


def decode_jpeg12(payload: bytes) -> np.ndarray | None:
    """Decode a 12-bit-precision DCT JPEG (T.81 extended sequential
    SOF1 or progressive SOF2 — the medical/DICOM transfer syntaxes)
    to an (H, W, C) uint16 array in 0..4095. Returns None for 8-bit
    streams (use ``decode_jpeg``) and lossless frames (use
    ``decode_jpeg_lossless16``; an SOF3 marker cannot occur inside
    entropy data, so the presence check is exact)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    if b"\xff\xc3" in payload:
        return None
    try:
        out = _decode_jpeg_inner(payload)
    except _DECODE_ERRORS:
        return None
    if out is None or out.dtype == np.uint8:
        return None
    return out


def decode_jpeg_lossless16(payload: bytes) -> np.ndarray | None:
    """Decode a lossless (SOF3) JPEG of ANY precision 2-16 to an
    (H, W, C) uint16 array — the deep-precision entry the 8-bit pixel
    dispatcher cannot expose (DNG-style raw sensor payloads are the
    classic use). Returns None for non-lossless frames (an SOF3
    marker cannot occur inside entropy data — 0xFF bytes there are
    stuffed — so the presence check is exact on well-formed
    streams)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    if b"\xff\xc3" not in payload:
        return None
    try:
        out = _decode_jpeg_inner(payload)
    except _DECODE_ERRORS:
        return None
    if out is None:
        return None
    return out.astype(np.uint16) if out.dtype == np.uint8 else out


def _decode_jpeg_inner(data: bytes) -> np.ndarray | None:
    """Marker walk + scan accumulation. All entropy decoding lands in
    per-component ZIGZAG-ordered coefficient grids; reconstruction
    (dequantize, inverse zigzag, batched matrix IDCT, upsample, color
    convert) happens once at the end — the architecture progressive
    JPEG requires, which sequential JPEG is just the 1-scan case of."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    dc_cond: dict[int, tuple[int, int]] = {}  # tb -> (L, U)
    ac_cond: dict[int, int] = {}  # tb -> Kx
    frame = None
    coefs: list[np.ndarray] | None = None
    restart_interval = 0
    saw_scan = False
    adobe_transform = None
    i = 2
    while i + 2 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            # hierarchical / arithmetic-lossless processes
            return None
        if i + 4 > len(data):
            return None
        seg_len = struct.unpack_from(">H", data, i + 2)[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                t = np.zeros((8, 8), np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, vals
                )
                p += 17 + n
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            p = 0
            while p + 2 <= len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                if tc == 0:
                    # DC: U in the high nibble, L in the low nibble
                    dc_cond[tb] = (seg[p + 1] & 0x0F, seg[p + 1] >> 4)
                else:
                    ac_cond[tb] = seg[p + 1]  # Kx
                p += 2
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA, 0xC3):
            # SOF0/1 seq, SOF2 prog, SOF9 seq-arith, SOF10 prog-arith,
            # SOF3 lossless
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            lossless = marker == 0xC3
            if lossless:
                prec_ok = 2 <= prec <= 16
            elif marker in (0xC1, 0xC2):
                # extended sequential / progressive Huffman: 8 or 12
                prec_ok = prec in (8, 12)
            else:
                # baseline is 8-bit by definition; the arithmetic
                # statistical model here is sized for 8-bit magnitudes
                prec_ok = prec == 8
            if not prec_ok or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if lossless:
                # spatial prediction over full-resolution sample
                # planes; subsampled lossless is out of scope, and the
                # per-sample decode loop bounds claimed dimensions
                if not all(c["h"] == c["v"] == 1 for c in comps):
                    return None
                if h * w > 1 << 26:
                    return None
                frame = {
                    "h": h, "w": w, "prec": prec, "comps": comps,
                    "progressive": False, "arith": False,
                    "lossless": True,
                }
                coefs = [
                    np.zeros((h, w), np.uint16) for _ in comps
                ]
                i += 2 + seg_len
                continue
            if not all(
                1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps
            ):
                return None
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["cw"] = -(-(w * c["h"]) // hmax)
                c["ch"] = -(-(h * c["v"]) // vmax)
                c["nbw"] = -(-c["cw"] // 8)
                c["nbh"] = -(-c["ch"] // 8)
            frame = {
                "h": h, "w": w, "comps": comps, "hmax": hmax,
                "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
                "prec": prec,
                "progressive": marker in (0xC2, 0xCA),
                "arith": marker in (0xC9, 0xCA),
            }
            coefs = [
                np.zeros((c["bh"], c["bw"], 64), np.int32) for c in comps
            ]
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11] if len(seg) >= 12 else None
        elif marker == 0xDA:  # SOS
            if frame is None or coefs is None:
                return None
            ns = seg[0]
            scan = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(
                    (
                        k
                        for k, c in enumerate(frame["comps"])
                        if c["id"] == cs
                    ),
                    None,
                )
                if ci is None:
                    return None
                scan.append((ci, tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if frame.get("lossless"):
                # Ss = predictor selector, Al = point transform (H.1)
                if not 1 <= ss <= 7 or al >= frame["prec"]:
                    raise ValueError("bad lossless scan params")
                if restart_interval:
                    # restart-interval prediction reset semantics are
                    # out of scope; reject rather than mis-decode
                    return None
                segs, end = _split_ecs(data, i + 2 + seg_len)
                _run_scan_lossless(
                    frame, coefs, scan, ss, al, huff_dc, segs[0]
                )
                saw_scan = True
                i = end
                continue
            if frame["progressive"]:
                if ss > 0 and ns != 1:
                    raise ValueError("progressive AC scan must be 1-comp")
                if se > 63 or ss > se:
                    raise ValueError("bad spectral band")
                if ss == 0 and se != 0:
                    # B.2.3: a progressive DC scan is exactly Ss=Se=0
                    raise ValueError("progressive DC scan must have Se=0")
            else:
                ss, se, ah, al = 0, 63, 0, 0  # sequential: full band
            segs, end = _split_ecs(data, i + 2 + seg_len)
            if frame.get("arith"):
                _run_scan_arith(
                    frame, coefs, scan, dc_cond, ac_cond,
                    restart_interval, segs, (ss, se, ah, al),
                )
            else:
                _run_scan(
                    frame, coefs, scan, (ss, se, ah, al), huff_dc,
                    huff_ac, restart_interval, segs,
                )
            saw_scan = True
            i = end
            continue
        # all other markers (APPn, COM): skip
        i += 2 + seg_len
    if frame is None or coefs is None or not saw_scan:
        return None
    if frame.get("lossless"):
        # no DCT, no quantization, no color transform: stack the
        # reconstructed sample planes (already << Pt, masked to P
        # bits by the scan decoder)
        out = np.stack(coefs, axis=-1)
        if frame["prec"] <= 8:
            return out.astype(np.uint8)
        return out  # uint16; reachable via decode_jpeg_lossless16
    ids = tuple(c["id"] for c in frame["comps"])
    # 3-component data is YCbCr UNLESS Adobe APP14 says transform=0 or
    # the component ids literally spell 'R','G','B' (both public
    # conventions for RGB-in-JPEG)
    frame["rgb_direct"] = len(ids) == 3 and (
        adobe_transform == 0 or ids == (0x52, 0x47, 0x42)
    )
    return _reconstruct(frame, coefs, qt)


def _run_scan(
    frame: dict,
    coefs: list[np.ndarray],
    scan: list,
    band: tuple[int, int, int, int],
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    segs: list[bytes],
) -> None:
    """Decode one scan's entropy data into the coefficient grids.
    Interleaved scans walk MCUs (h x v blocks per component);
    single-component scans walk the component's own block grid. RSTn
    boundaries reset the bit reader, DC predictors, and the EOB run."""
    ss, se, ah, al = band
    comps = frame["comps"]
    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = [0] * len(comps)
    eob = [0]
    interleaved = len(scan) > 1

    def maybe_restart(unit: int) -> _BitReader:
        nonlocal seg_idx, preds
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            preds[:] = [0] * len(comps)
            eob[0] = 0
            return _BitReader(segs[seg_idx])
        return reader

    seq_fast = (ss, se, ah, al) == (0, 63, 0, 0)
    if interleaved:
        unit = 0
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                reader = maybe_restart(unit)
                for ci, td, ta in scan:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by,
                                            mx * c["h"] + bx]
                            if seq_fast:
                                preds[ci] = _decode_block_seq(
                                    reader, blk, huff_dc[td],
                                    huff_ac[ta], preds[ci],
                                )
                            else:
                                _decode_block_into(
                                    reader, blk, huff_dc.get(td),
                                    huff_ac.get(ta), ss, se, ah, al,
                                    preds, ci, eob,
                                )
                unit += 1
    else:
        ci, td, ta = scan[0]
        c = comps[ci]
        unit = 0
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                reader = maybe_restart(unit)
                blk = coefs[ci][by, bx]
                if seq_fast:
                    preds[ci] = _decode_block_seq(
                        reader, blk, huff_dc[td], huff_ac[ta], preds[ci]
                    )
                else:
                    _decode_block_into(
                        reader, blk, huff_dc.get(td), huff_ac.get(ta),
                        ss, se, ah, al, preds, ci, eob,
                    )
                unit += 1


def _run_scan_arith(
    frame: dict,
    coefs: list[np.ndarray],
    scan: list,
    dc_cond: dict,
    ac_cond: dict,
    restart_interval: int,
    segs: list[bytes],
    band: tuple = (0, 63, 0, 0),
) -> None:
    """DCT scan with ARITHMETIC entropy coding (T.81 F.2 sequential
    SOF9; Annex G progressive SOF10 when ``band`` selects a spectral
    band / successive-approximation stage): QM-decode
    (``operators/qm.py``) under the F.1.4.4.1 statistical model.
    Statistics areas are per destination table — 64 DC contexts
    (5 prior-diff conditioning categories x {zero, sign, pos-mag,
    neg-mag}, magnitude categories X1.. at offset 20, mantissa bits
    at +14) and 256 AC contexts (3 per coefficient position:
    end-of-block, zero/nonzero, magnitude; shared X2.. areas at
    189/217 split by the DAC Kx parameter; mantissa at +14). AC signs
    use the non-adaptive fixed ~0.5 state. Progressive stages (G.2):
    DC-first codes point-transformed diffs with the sequential DC
    model; DC-refinement is one fixed-state bit per block; AC-first
    is the sequential AC model over Ss..Se with values scaled by
    2^Al; AC-refinement codes correction bits on context+2 for
    already-significant positions, newly-significant values on
    context+1 with a fixed-state sign, and EOB decisions only past
    the previous stage's end-of-block index. A restart marker
    re-initializes the coder, the statistics, the DC predictors, and
    the conditioning state (F.2.1.3.1)."""
    from .qm import FIXED_BIN, QMDecoder

    ss, se, ah, al = band
    comps = frame["comps"]
    interleaved = len(scan) > 1
    tbls = {}
    for _, td, ta in scan:
        tbls[("dc", td)] = bytearray(64)
        tbls[("ac", ta)] = bytearray(256)
    fixed = bytearray([FIXED_BIN])
    preds = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    dec = QMDecoder(segs[0], stuffed=False)
    seg_idx = 0

    def maybe_restart(unit: int) -> QMDecoder:
        nonlocal seg_idx, dec
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            for st in tbls.values():
                st[:] = bytes(len(st))
            fixed[0] = FIXED_BIN
            preds[:] = [0] * len(comps)
            dc_ctx[:] = [0] * len(comps)
            dec = QMDecoder(segs[seg_idx], stuffed=False)
        return dec

    def decode_block(blk, ci: int, td: int, ta: int) -> None:
        if ss == 0:
            if ah == 0:  # DC first (or sequential)
                dst = tbls[("dc", td)]
                low, up = dc_cond.get(td, (0, 1))
                # DC difference (F.2.4.1)
                st = dc_ctx[ci]
                if dec.decode(dst, st):
                    sign = dec.decode(dst, st + 1)
                    st += 2 + sign
                    m = dec.decode(dst, st)
                    if m:
                        st = 20  # X1
                        while dec.decode(dst, st):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError("DC magnitude overflow")
                            st += 1
                    # F.1.4.4.1.2: conditioning for the NEXT diff
                    if m < (1 << low) >> 1:
                        dc_ctx[ci] = 0
                    elif m > (1 << up) >> 1:
                        dc_ctx[ci] = 12 + sign * 4
                    else:
                        dc_ctx[ci] = 4 + sign * 4
                    v = m
                    st += 14  # mantissa bits
                    while m := m >> 1:
                        if dec.decode(dst, st):
                            v |= m
                    v += 1
                    preds[ci] += -v if sign else v
                else:
                    dc_ctx[ci] = 0
                blk[0] = preds[ci] << al
            else:  # DC refinement: one fixed-state bit (G.2)
                if dec.decode(fixed, 0):
                    blk[0] |= 1 << al
            k0 = 1
        else:
            k0 = ss
        if se < k0:
            return
        ast = tbls[("ac", ta)]
        kx = ac_cond.get(ta, 5)
        if ah == 0:
            # AC first / sequential (F.2.4.2, band Ss..Se, scale 2^Al)
            k = k0
            while k <= se:
                st = 3 * (k - 1)
                if dec.decode(ast, st):
                    break  # end of block
                while dec.decode(ast, st + 1) == 0:
                    st += 3
                    k += 1
                    if k > se:
                        raise ValueError("AC run past band end")
                sign = dec.decode(fixed, 0)
                st += 2
                m = dec.decode(ast, st)
                if m:
                    if dec.decode(ast, st):
                        m <<= 1
                        st = 189 if k <= kx else 217  # X2 (low/high)
                        while dec.decode(ast, st):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError("AC magnitude overflow")
                            st += 1
                v = m
                st += 14  # mantissa bits
                while m := m >> 1:
                    if dec.decode(ast, st):
                        v |= m
                v += 1
                blk[k] = (-v if sign else v) << al
                k += 1
        else:
            # AC refinement (G.2): EOB decisions only past the
            # previous stage's end-of-block index
            p1 = 1 << al
            kex = 0
            for kk in range(se, 0, -1):
                if blk[kk]:
                    kex = kk
                    break
            k = k0
            while k <= se:
                st = 3 * (k - 1)
                if k > kex and dec.decode(ast, st):
                    break  # end of block
                while True:
                    if blk[k]:  # already significant: correction bit
                        if dec.decode(ast, st + 2):
                            blk[k] += p1 if blk[k] >= 0 else -p1
                        break
                    if dec.decode(ast, st + 1):  # newly significant
                        blk[k] = -p1 if dec.decode(fixed, 0) else p1
                        break
                    st += 3
                    k += 1
                    if k > se:
                        raise ValueError("AC refine run past band end")
                k += 1

    if interleaved:
        unit = 0
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                maybe_restart(unit)
                for ci, td, ta in scan:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                coefs[ci][my * c["v"] + by,
                                          mx * c["h"] + bx],
                                ci, td, ta,
                            )
                unit += 1
    else:
        ci, td, ta = scan[0]
        c = comps[ci]
        unit = 0
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                maybe_restart(unit)
                decode_block(coefs[ci][by, bx], ci, td, ta)
                unit += 1


def _lossless_predict(
    plane: np.ndarray, r: int, c: int, sel: int, default: int
) -> int:
    """T.81 H.1.2.1 sample prediction: neighbors Ra (left), Rb
    (above), Rc (above-left); the first sample uses the midpoint
    default, the rest of the first row predictor 1, the first column
    predictor 2, everything else the scan-selected predictor 1-7."""
    if r == 0 and c == 0:
        return default
    if r == 0:
        return int(plane[0, c - 1])
    if c == 0:
        return int(plane[r - 1, 0])
    ra = int(plane[r, c - 1])
    rb = int(plane[r - 1, c])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    rc = int(plane[r - 1, c - 1])
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel == 7


def _lossless_diff(reader: _BitReader, tab: _HuffTable) -> int:
    """One Huffman-coded lossless difference: SSSS category 0-16,
    category 16 meaning 32768 with no extra bits (H.1.2.2)."""
    w = reader.peek16()
    ln = tab.length[w]
    if ln == 0:
        raise ValueError("invalid Huffman code")
    reader.skip(ln)
    s = tab.sym[w]
    if s == 0:
        return 0
    if s == 16:
        return 32768
    if s > 16:
        raise ValueError("bad lossless category")
    v = reader.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _run_scan_lossless(
    frame: dict,
    planes: list[np.ndarray],
    scan: list,
    predictor: int,
    pt: int,
    huff_dc: dict,
    seg: bytes,
) -> None:
    """Lossless (SOF3) scan decode (T.81 H.2): per-sample spatial
    prediction + Huffman-coded modulo-2^16 differences, written into
    full-resolution uint16 planes already shifted by the point
    transform and masked to the declared precision. Interleaved scans
    walk sample positions row-major taking one sample per component
    (all components are 1x1 here); single-component scans walk the
    plane alone."""
    prec = frame["prec"]
    default = 1 << (prec - pt - 1)
    mask = (1 << prec) - 1
    reader = _BitReader(seg)
    h, w = frame["h"], frame["w"]
    members = [(ci, huff_dc[td]) for ci, td, _ in scan]
    # reconstruct in shifted (>> pt) domain, then apply << pt once
    for r in range(h):
        for c in range(w):
            for ci, tab in members:
                plane = planes[ci]
                px = _lossless_predict(plane, r, c, predictor, default)
                d = _lossless_diff(reader, tab)
                plane[r, c] = (px + d) & 0xFFFF
    for ci, _ in members:
        planes[ci][:] = (
            (planes[ci].astype(np.uint32) & (mask >> pt)) << pt
        ).astype(np.uint16)


def _decode_block_seq(
    reader: _BitReader,
    blk: np.ndarray,
    dc_tab: _HuffTable,
    ac_tab: _HuffTable,
    pred: int,
) -> int:
    """Sequential-scan fast path (ss=0, se=63, ah=al=0): the whole
    block decodes into a local list with the bit buffer manipulated
    inline, then lands in the coefficient grid with ONE vectorized
    assignment — the hot loop has no numpy scalar writes and no
    per-bit calls. Semantically identical to the general path."""
    coeffs = [0] * 64
    data, nbytes = reader.data, reader.nbytes
    acc, nbits, pos = reader.acc, reader.nbits, reader.pos
    dc_len, dc_sym = dc_tab.length, dc_tab.sym
    ac_len, ac_sym = ac_tab.length, ac_tab.sym

    def bail() -> None:
        reader.acc, reader.nbits, reader.pos = acc, nbits, pos
        if (pos << 3) - nbits > (nbytes << 3):
            raise EOFError

    # DC
    while nbits < 16:
        acc = ((acc << 8) | (data[pos] if pos < nbytes else 0xFF)) & 0xFFFFFFFFFF
        pos += 1
        nbits += 8
    w = (acc >> (nbits - 16)) & 0xFFFF
    ln = dc_len[w]
    if ln == 0:
        bail()
        raise ValueError("invalid Huffman code")
    nbits -= ln
    size = dc_sym[w]
    if size > 15:  # corrupt table: no legal DC category exceeds 15
        bail()
        raise ValueError("bad DC size")
    if size:
        while nbits < size:
            acc = ((acc << 8) | (data[pos] if pos < nbytes else 0xFF)) & 0xFFFFFFFFFF
            pos += 1
            nbits += 8
        v = (acc >> (nbits - size)) & ((1 << size) - 1)
        nbits -= size
        pred += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
    coeffs[0] = pred
    # AC
    k = 1
    while k < 64:
        while nbits < 16:
            acc = ((acc << 8) | (data[pos] if pos < nbytes else 0xFF)) & 0xFFFFFFFFFF
            pos += 1
            nbits += 8
        w = (acc >> (nbits - 16)) & 0xFFFF
        ln = ac_len[w]
        if ln == 0:
            bail()
            raise ValueError("invalid Huffman code")
        nbits -= ln
        rs = ac_sym[w]
        size = rs & 0xF
        if size == 0:
            if rs == 0xF0:
                k += 16
                continue
            break  # EOB (eob-run extension impossible: r<15,s=0 => r=0 here
            # because sequential encoders only emit 0x00; a progressive
            # stream never routes through this fast path)
        k += rs >> 4
        if k > 63:
            bail()
            raise ValueError("AC run past band end")
        while nbits < size:
            acc = ((acc << 8) | (data[pos] if pos < nbytes else 0xFF)) & 0xFFFFFFFFFF
            pos += 1
            nbits += 8
        v = (acc >> (nbits - size)) & ((1 << size) - 1)
        nbits -= size
        coeffs[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        k += 1
    bail()
    blk[:] = coeffs
    return pred


def _decode_block_into(
    reader: _BitReader,
    blk: np.ndarray,
    dc_tab: dict | None,
    ac_tab: dict | None,
    ss: int,
    se: int,
    ah: int,
    al: int,
    preds: list[int],
    ci: int,
    eob: list[int],
) -> None:
    """One block of one scan, accumulated into ``blk`` (64 zigzag-order
    int32 coefficients). Handles all four progressive scan kinds; a
    sequential scan is the (ss=0, se=63, ah=al=0) case."""
    if ss == 0:
        if ah == 0:  # DC first (or sequential)
            if dc_tab is None:
                raise ValueError("scan references undefined DC table")
            size = _huff_decode(reader, dc_tab)
            if size > 15:
                raise ValueError("bad DC size")
            diff = _extend(reader.read_bits(size), size) if size else 0
            preds[ci] += diff
            blk[0] = preds[ci] << al
        else:  # DC refinement: one bit
            if reader.read_bit():
                blk[0] |= 1 << al
        k0 = 1
    else:
        k0 = ss
    if se < k0:
        return
    if ah == 0:  # AC first / sequential
        if ac_tab is None:
            raise ValueError("scan references undefined AC table")
        if eob[0] > 0:
            eob[0] -= 1
            return
        k = k0
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                eob[0] = (1 << run) - 1
                if run:
                    eob[0] += reader.read_bits(run)
                break
            k += run
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.read_bits(size), size) << al
            k += 1
    else:
        if ac_tab is None:
            raise ValueError("scan references undefined AC table")
        _refine_ac(reader, blk, k0, se, al, ac_tab, eob)


def _refine_ac(
    reader: _BitReader,
    blk: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_tab: dict,
    eob: list[int],
) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3, the shape
    every decoder implements): newly-significant coefficients carry a
    sign bit; already-nonzero coefficients in the band consume one
    correction bit each as the scan passes over them — including
    inside EOB runs."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            run, size = rs >> 4, rs & 0xF
            newval = 0
            if size:
                # size is always 1 in a refinement scan
                newval = p1 if reader.read_bit() else m1
            elif run != 15:
                eob[0] = 1 << run
                if run:
                    eob[0] += reader.read_bits(run)
                break
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eob[0] > 0:
        while k <= se:
            if blk[k] != 0 and reader.read_bit() and (int(blk[k]) & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eob[0] -= 1


def _reconstruct(
    frame: dict, coefs: list[np.ndarray], qt: dict
) -> np.ndarray:
    """Dequantize + inverse zigzag + batched matrix IDCT per component,
    then upsample chroma and color-convert (JFIF YCbCr). 12-bit
    frames level-shift by 2048 and emit uint16 in 0..4095."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    prec = frame.get("prec", 8)
    mid = float(1 << (prec - 1))
    top = float((1 << prec) - 1)
    dt = np.uint8 if prec == 8 else np.uint16
    out_planes = []
    for c, arr in zip(frame["comps"], coefs):
        q = qt[c["tq"]]
        bh, bw = arr.shape[:2]
        nat = np.zeros((bh, bw, 8, 8), np.int64)
        nat[:, :, _ZZ_ROWS, _ZZ_COLS] = arr
        # fixed-point IDCT: exact int64 matmul (bit-identical across
        # hosts — float matmul is a SIMD/FMA-dependent reduction; the
        # r8 driver flip on llm_decode_pixel_checksums id 50 was one
        # coefficient landing on such a boundary), then ONE
        # deterministic int->float conversion and a power-of-two scale
        px = (_MI.T @ (nat * q) @ _MI).astype(np.float64) / float(
            1 << (2 * _DCT_SHIFT)
        )
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = plane[: c["ch"], : c["cw"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])

    # np.rint before the int cast: sample reconstruction rounds to
    # nearest (astype would truncate — a latent bug the float DCT's
    # luck masked on exact-DC blocks). Elementwise, so deterministic.
    if len(out_planes) == 1:
        y = np.clip(np.rint(out_planes[0] + mid), 0, top)
        return y.astype(dt)[..., None]
    if frame.get("rgb_direct"):
        rgb = np.stack([p + mid for p in out_planes], axis=-1)
        return np.clip(np.rint(rgb), 0, top).astype(dt)
    y, cb, cr = (p + mid for p in out_planes)
    cb -= mid
    cr -= mid
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, top).astype(dt)


# ---------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


# Flat canonical tables: DC symbols 0..11 at 4 bits; the 162 legal
# baseline AC symbols (EOB, ZRL, and (run 0..15, size 1..10)) at 8
# bits. Kraft-valid (12/16, 162/256), never the all-ones code,
# trivially correct — a DHT length count is one byte, so a flat table
# cannot exceed 255 symbols per length.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8
_AC_VALS = bytes(_AC_SYMBOLS)
_DC_CODES = {sym: (4, code) for code, sym in enumerate(range(12))}
_AC_CODES = {sym: (8, code) for code, sym in enumerate(_AC_SYMBOLS)}

# 12-bit flat tables: DC SSSS 0..15 at 5 bits (16/32 Kraft), the 226
# legal extended-precision AC symbols (EOB, ZRL, (run, size 1..14))
# at 8 bits (226/256 Kraft, all-ones unused)
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = bytes(range(16))
_AC12_SYMBOLS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_AC12_BITS = [0] * 7 + [len(_AC12_SYMBOLS)] + [0] * 8
_AC12_VALS = bytes(_AC12_SYMBOLS)
_DC12_CODES = {sym: (5, code) for code, sym in enumerate(range(16))}
_AC12_CODES = {sym: (8, code) for code, sym in enumerate(_AC12_SYMBOLS)}


def _csize(v: int) -> int:
    """Bit category of a signed coefficient (T.81 CSIZE)."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    writer: _BitWriter, block: np.ndarray, pred: int
) -> int:
    """FDCT'd + quantized 8x8 block -> entropy-coded bits."""
    zz = block[_ZZ_ROWS, _ZZ_COLS].copy()
    # baseline AC magnitudes cap at size 10 (|v| <= 1023); only
    # reachable at extreme quality with pathological inputs
    np.clip(zz[1:], -1023, 1023, out=zz[1:])
    diff = int(zz[0]) - pred
    size = _csize(diff)
    length, code = _DC_CODES[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 2) if last_nz.size else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_CODES[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _csize(v)
        length, code = _AC_CODES[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if end < 64:
        length, code = _AC_CODES[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a plane to 8-multiples by edge replication and return
    (by, bx, 8, 8) blocks of FDCT input (level-shifted float)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(
        plane.astype(np.float64) - 128.0,
        ((0, ph - h), (0, pw - w)),
        mode="edge",
    )
    return padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Vectorized FDCT + quantize over a (by, bx, 8, 8) stack.

    Fixed-point: ``f`` is the true DCT scaled by 2^(2*_DCT_SHIFT) in
    exact int64 (blocks are level-shifted integers), and the quantizer
    divides by ``qtab`` on that rational with round-half-away — no
    float reduction anywhere, so the coefficients are bit-identical on
    every host."""
    # np.rint is elementwise (deterministic); color-converted planes
    # carry fractional samples, 8/12-bit gray planes are already exact
    f = _MI @ np.rint(blocks).astype(np.int64) @ _MI.T
    d = qtab.astype(np.int64) << (2 * _DCT_SHIFT)
    return np.where(
        f >= 0, (2 * f + d) // (2 * d), -((-2 * f + d) // (2 * d))
    )


def _color_planes(
    px: np.ndarray, gray: bool, rgb: bool, subsample: bool
) -> list[np.ndarray]:
    """RGB -> per-component sample planes (YCbCr with optional 4:2:0
    chroma decimation, passthrough for grayscale / RGB-in-JPEG)."""
    h, w = px.shape[:2]
    if gray:
        return [px[..., 0].astype(np.float64)]
    if rgb:
        if subsample:
            raise ValueError("rgb mode is 4:4:4 only")
        return [px[..., k].astype(np.float64) for k in range(3)]
    r, g, b = (px[..., k].astype(np.float64) for k in range(3))
    y_plane = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    return [y_plane, cb, cr]


def _quantized_grids(
    planes: list[np.ndarray],
    gray: bool,
    rgb: bool,
    subsample: bool,
    qt_l: np.ndarray,
    qt_c: np.ndarray,
) -> tuple[list, int, int]:
    """FDCT + quantize each plane into (blocks, h, v) grids plus the
    MCU geometry — shared by the Huffman and arithmetic encoders."""
    if gray or rgb or not subsample:
        grids = [
            (
                _fdct_quant(
                    _plane_blocks(p),
                    qt_l if (i == 0 or rgb) else qt_c,
                ),
                1,
                1,
            )
            for i, p in enumerate(planes)
        ]
        return grids, grids[0][0].shape[0], grids[0][0].shape[1]
    yb = _fdct_quant(_plane_blocks(planes[0]), qt_l)
    # pad Y block grid to even counts for 2x2 MCUs
    by, bx = yb.shape[:2]
    pby, pbx = -(-by // 2) * 2, -(-bx // 2) * 2
    if (pby, pbx) != (by, bx):
        yb = np.pad(
            yb, ((0, pby - by), (0, pbx - bx), (0, 0), (0, 0)),
            mode="edge",
        )
    cbb = _fdct_quant(_plane_blocks(planes[1]), qt_c)
    crb = _fdct_quant(_plane_blocks(planes[2]), qt_c)
    return [(yb, 2, 2), (cbb, 1, 1), (crb, 1, 1)], cbb.shape[0], cbb.shape[1]


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    rgb: bool = False,
) -> bytes:
    """Baseline JPEG encode of an (H, W) / (H, W, 1) grayscale or
    (H, W, 3) RGB uint8 array. ``subsample=True`` writes 4:2:0 chroma;
    ``restart_interval`` > 0 emits DRI + RSTn markers (exercises the
    decoder's restart path). Output is spec-compliant baseline JPEG
    decodable by any conformant decoder."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    gray = nc == 1

    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    planes = _color_planes(px, gray, rgb, subsample)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    if rgb:  # Adobe APP14, transform = 0 (no color transform)
        adobe = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
        out += b"\xff\xee" + struct.pack(">H", 2 + len(adobe)) + adobe
    # DQT (zigzag order)
    for tq, tab in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zz = tab[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + zz
    # SOF0
    if gray:
        comp_spec = bytes([1, 0x11, 0])
    elif rgb:  # component ids spell R,G,B; all on the luma table
        comp_spec = bytes([0x52, 0x11, 0, 0x47, 0x11, 0, 0x42, 0x11, 0])
    else:
        ch = 0x22 if subsample else 0x11
        comp_spec = bytes([1, ch, 0, 2, 0x11, 1, 3, 0x11, 1])
    nf = 1 if gray else 3
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
        + comp_spec
    )
    # DHT: DC0/AC0 (+ DC1/AC1 for chroma)
    tables = [(0, 0, _DC_BITS, _DC_VALS), (1, 0, _AC_BITS, _AC_VALS)]
    if not gray:
        tables += [(0, 1, _DC_BITS, _DC_VALS), (1, 1, _AC_BITS, _AC_VALS)]
    for tc, th, bits, vals in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    elif rgb:
        sos = bytes([3, 0x52, 0x00, 0x47, 0x00, 0x42, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded data, interleaved MCUs
    writer = _BitWriter()
    grids, mcus_y, mcus_x = _quantized_grids(
        planes, gray, rgb, subsample, qt_l, qt_c
    )
    preds = [0] * len(grids)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                out += bytes(writer.out)
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                preds = [0] * len(grids)
            for gi, (blocks, gh, gv) in enumerate(grids):
                for by_ in range(gv):
                    for bx_ in range(gh):
                        blk = blocks[my * gv + by_, mx * gh + bx_]
                        preds[gi] = _encode_block(writer, blk, preds[gi])
            mcu += 1
    writer.flush()
    out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _arith_enc_dc(
    enc, dst: bytearray, dc_ctx: list, ci: int, diff: int,
    low: int, up: int,
) -> None:
    """QM-encode one DC difference (F.1.4.1 / Figure F.4)."""
    st = dc_ctx[ci]
    if diff == 0:
        enc.encode(dst, st, 0)
        dc_ctx[ci] = 0
        return
    enc.encode(dst, st, 1)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(dst, st + 1, sign)
    st += 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(dst, st, 1)  # magnitude > 1
        m = 1
        v2 = v
        st = 20  # X1
        while v2 := v2 >> 1:
            enc.encode(dst, st, 1)
            m <<= 1
            st += 1
    enc.encode(dst, st, 0)
    if m < (1 << low) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        dc_ctx[ci] = 12 + sign * 4
    else:
        dc_ctx[ci] = 4 + sign * 4
    st += 14  # mantissa bits
    while m := m >> 1:
        enc.encode(dst, st, 1 if m & v else 0)


def _arith_enc_ac_first(
    enc, ast: bytearray, fixed: bytearray, zz: np.ndarray,
    ss: int, se: int, al: int, kx: int,
) -> None:
    """QM-encode AC coefficients over band Ss..Se at point transform
    Al (Figure F.5; the sequential scan is the (1, 63, 0) case)."""
    ke = 0
    for kk in range(se, ss - 1, -1):
        if abs(int(zz[kk])) >> al:
            ke = kk
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ast, st, 0)  # not end-of-block
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(ast, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ast, st + 1, 1)
        v0 = int(zz[k])
        v = abs(v0) >> al
        enc.encode(fixed, 0, 1 if v0 < 0 else 0)
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(ast, st, 1)  # magnitude > 1
            m = 1
            v2 = v
            if v2 := v2 >> 1:
                enc.encode(ast, st, 1)  # magnitude > 2
                m <<= 1
                st = 189 if k <= kx else 217  # X2 (low/high)
                while v2 := v2 >> 1:
                    enc.encode(ast, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(ast, st, 0)
        st += 14  # mantissa bits
        while m := m >> 1:
            enc.encode(ast, st, 1 if m & v else 0)
        k += 1
    if k <= se:
        enc.encode(ast, 3 * (k - 1), 1)  # end-of-block


def _arith_enc_ac_refine(
    enc, ast: bytearray, fixed: bytearray, zz: np.ndarray,
    ss: int, se: int, al: int,
) -> None:
    """QM-encode one AC successive-approximation refinement band
    (G.2): correction bits on context+2 for already-significant
    positions, newly-significant values on context+1 with a
    fixed-state sign, EOB decisions only past the previous stage's
    end-of-block index."""
    ke = 0
    for kk in range(se, ss - 1, -1):
        if abs(int(zz[kk])) >> al:
            ke = kk
            break
    kex = 0
    for kk in range(ke, 0, -1):
        if abs(int(zz[kk])) >> (al + 1):
            kex = kk
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ast, st, 0)  # not end-of-block yet
        while True:
            v = int(zz[k])
            mag = abs(v) >> al
            if abs(v) >> (al + 1):  # already significant
                enc.encode(ast, st + 2, mag & 1)
                break
            if mag:  # newly significant
                enc.encode(ast, st + 1, 1)
                enc.encode(fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(ast, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(ast, 3 * (k - 1), 1)  # end-of-block


def _arith_encode_block(
    enc,
    blk: np.ndarray,
    dst: bytearray,
    ast: bytearray,
    fixed: bytearray,
    ci: int,
    preds: list,
    dc_ctx: list,
    low: int,
    up: int,
    kx: int,
) -> None:
    """QM-encode one quantized 8x8 block under the T.81 F.1.4
    statistical model — the exact mirror of the decode side in
    ``_run_scan_arith``."""
    blk = blk[_ZZ_ROWS, _ZZ_COLS]
    diff = int(blk[0]) - preds[ci]
    preds[ci] = int(blk[0])
    _arith_enc_dc(enc, dst, dc_ctx, ci, diff, low, up)
    _arith_enc_ac_first(enc, ast, fixed, blk, 1, 63, 0, kx)


def encode_jpeg_arith(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    rgb: bool = False,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
) -> bytes:
    """Sequential DCT JPEG with ARITHMETIC entropy coding (T.81 SOF9):
    the exact DCT/quantization path of ``encode_jpeg`` with the
    Huffman layer swapped for the QM-coder under the F.1.4.4.1
    statistical model. Emits a DAC segment declaring the DC (L, U)
    conditioning bounds and the AC Kx split (spec defaults 0/1/5
    unless overridden), so the decoder's DAC parser is exercised.
    ``restart_interval`` resets the coder + statistics at RSTn
    boundaries (F.1.4.1.1)."""
    from .qm import FIXED_BIN, QMEncoder

    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    gray = nc == 1
    low, up = dc_cond

    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    planes = _color_planes(px, gray, rgb, subsample)

    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    if rgb:  # Adobe APP14, transform = 0 (no color transform)
        adobe = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
        out += b"\xff\xee" + struct.pack(">H", 2 + len(adobe)) + adobe
    for tq, tab in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zz = tab[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + zz
    # SOF9: sequential DCT, arithmetic coding
    if gray:
        comp_spec = bytes([1, 0x11, 0])
    elif rgb:
        comp_spec = bytes([0x52, 0x11, 0, 0x47, 0x11, 0, 0x42, 0x11, 0])
    else:
        ch = 0x22 if subsample else 0x11
        comp_spec = bytes([1, ch, 0, 2, 0x11, 1, 3, 0x11, 1])
    nf = 1 if gray else 3
    out += (
        b"\xff\xc9"
        + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
        + comp_spec
    )
    # DAC: DC conditioning (U high nibble, L low) + AC Kx, table 0
    # (+ table 1 for chroma)
    dac = bytes([0x00, (up << 4) | low, 0x10, ac_kx])
    if not gray:
        dac += bytes([0x01, (up << 4) | low, 0x11, ac_kx])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    elif rgb:
        sos = bytes([3, 0x52, 0x00, 0x47, 0x00, 0x42, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    grids, mcus_y, mcus_x = _quantized_grids(
        planes, gray, rgb, subsample, qt_l, qt_c
    )
    n_tbl = 1 if (gray or rgb) else 2

    def fresh_state():
        return (
            QMEncoder(),
            [bytearray(64) for _ in range(n_tbl)],
            [bytearray(256) for _ in range(n_tbl)],
            bytearray([FIXED_BIN]),
        )

    enc, dsts, asts, fixed = fresh_state()
    preds = [0] * len(grids)
    dc_ctx = [0] * len(grids)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += enc.flush()
                out += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                )
                enc, dsts, asts, fixed = fresh_state()
                preds = [0] * len(grids)
                dc_ctx = [0] * len(grids)
            for gi, (blocks, gh, gv) in enumerate(grids):
                tb = 0 if (gi == 0 or rgb) else 1
                for by_ in range(gv):
                    for bx_ in range(gh):
                        blk = blocks[my * gv + by_, mx * gh + bx_]
                        _arith_encode_block(
                            enc, blk, dsts[tb], asts[tb], fixed,
                            gi, preds, dc_ctx, low, up, ac_kx,
                        )
            mcu += 1
    out += enc.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# flat canonical table for the 17 lossless difference categories
# (SSSS 0..16) at 5 bits each — Kraft-valid (17/32), never all-ones
_LL_BITS = [0, 0, 0, 0, 17] + [0] * 11
_LL_VALS = bytes(range(17))
_LL_CODES = {sym: (5, sym) for sym in range(17)}


def encode_jpeg_lossless(
    pixels: np.ndarray,
    predictor: int = 4,
    point_transform: int = 0,
    precision: int | None = None,
) -> bytes:
    """LOSSLESS JPEG encode (T.81 process 14, SOF3): spatial
    prediction (selector 1-7), optional point transform, and
    Huffman-coded modulo-2^16 differences over a flat 17-category
    table. Accepts (H, W[, C]) uint8 (precision 8) or uint16 with an
    explicit ``precision`` 2-16; components are coded independently
    with NO color transform (the raw/RGB convention lossless JPEG is
    actually used with — DNG et al.), interleaved in one scan.
    Decodes bit-exactly: decode_jpeg / decode_jpeg_lossless16 return
    ``(pixels >> Pt) << Pt`` — the identity when Pt = 0."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    if precision is None:
        precision = 8 if px.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("precision out of range")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor out of range")
    if not 0 <= point_transform < precision:
        raise ValueError("point transform out of range")
    if int(px.max(initial=0)) >= 1 << precision:
        raise ValueError("samples exceed declared precision")

    out = bytearray(b"\xff\xd8")  # SOI
    if nc == 1:
        comp_spec = bytes([1, 0x11, 0])
    else:  # ids spell R,G,B: no color transform, matches the decoder
        comp_spec = bytes([0x52, 0x11, 0, 0x47, 0x11, 0, 0x42, 0x11, 0])
    out += (
        b"\xff\xc3"
        + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
        + comp_spec
    )
    body = bytes([0x00]) + bytes(_LL_BITS) + _LL_VALS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if nc == 1:
        sos = bytes([1, 1, 0x00, predictor, 0, point_transform])
    else:
        sos = bytes(
            [3, 0x52, 0x00, 0x47, 0x00, 0x42, 0x00,
             predictor, 0, point_transform]
        )
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    shifted = (px.astype(np.int64) >> point_transform)
    default = 1 << (precision - point_transform - 1)
    writer = _BitWriter()
    planes = [shifted[..., k] for k in range(nc)]
    for r in range(h):
        for c in range(w):
            for plane in planes:
                pred = _lossless_predict(plane, r, c, predictor, default)
                d = ((int(plane[r, c]) - pred + 32768) & 0xFFFF) - 32768
                if d == 0:
                    s = 0
                elif d == -32768:
                    s = 16
                else:
                    s = _csize(d)
                length, code = _LL_CODES[s]
                writer.write(code, length)
                if 0 < s < 16:
                    writer.write(d if d > 0 else d + (1 << s) - 1, s)
    writer.flush()
    out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _emit_scan_header(out: bytearray, comps: list, band) -> None:
    ss, se, ah, al = band
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _encode_dc_scan(out, grids, al, refine):
    """Interleaved DC scan over all components: first pass codes the
    point-transformed diffs, refinement appends one bit per block."""
    writer = _BitWriter()
    preds = [0] * len(grids)
    mcus_y = min(g.shape[0] // gv for g, gh, gv in grids)
    mcus_x = min(g.shape[1] // gh for g, gh, gv in grids)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for gi, (blocks, gh, gv) in enumerate(grids):
                for by in range(gv):
                    for bx in range(gh):
                        dc = int(blocks[my * gv + by, mx * gh + bx][0, 0])
                        if refine:
                            writer.write((dc >> al) & 1, 1)
                            continue
                        v = dc >> al  # arithmetic shift per T.81 DC
                        diff = v - preds[gi]
                        preds[gi] = v
                        size = _csize(diff)
                        ln, code = _DC_CODES[size]
                        writer.write(code, ln)
                        if size:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << size) - 1,
                                size,
                            )
    writer.flush()
    out += bytes(writer.out)


def _encode_ac_scan(out, blocks, nbh, nbw, ss, se, al, refine):
    """Single-component AC scan (per-block EOB runs of 1)."""
    writer = _BitWriter()
    for by in range(nbh):
        for bx in range(nbw):
            zz = blocks[by, bx][_ZZ_ROWS, _ZZ_COLS]
            if not refine:
                run = 0
                wrote = False
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    mag = abs(v) >> al  # AC point transform truncates
                    if mag == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = _AC_CODES[0xF0]
                        writer.write(code, ln)
                        run -= 16
                    size = _csize(mag)
                    ln, code = _AC_CODES[(run << 4) | size]
                    writer.write(code, ln)
                    coded = mag if v >= 0 else -mag
                    writer.write(
                        coded if coded >= 0 else coded + (1 << size) - 1,
                        size,
                    )
                    run = 0
                    wrote = True
                if run or not wrote:
                    ln, code = _AC_CODES[0x00]  # EOB (run of 1)
                    writer.write(code, ln)
            else:
                # position-ordered event queue since the last symbol:
                # None = zero-history position, 0/1 = a correction bit.
                # The decoder reads correction bits interleaved INSIDE
                # each ZRL's 16-zero skip and each (run,1)'s run-zero
                # skip, so the queue must be split at those boundaries
                # in position order, never flushed wholesale.
                queue: list[int | None] = []
                ended_at_se = False
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    mag = abs(v) >> al
                    hist = abs(v) >> (al + 1)
                    if hist:  # already significant: correction bit
                        queue.append(mag & 1)
                        ended_at_se = False
                    elif mag:  # newly significant: (run,1) + sign
                        while sum(1 for q in queue if q is None) > 15:
                            ln, code = _AC_CODES[0xF0]
                            writer.write(code, ln)
                            zeros = 0
                            while zeros < 16:
                                item = queue.pop(0)
                                if item is None:
                                    zeros += 1
                                else:
                                    writer.write(item, 1)
                        run = sum(1 for q in queue if q is None)
                        ln, code = _AC_CODES[(run << 4) | 1]
                        writer.write(code, ln)
                        writer.write(1 if v > 0 else 0, 1)
                        for item in queue:
                            if item is not None:
                                writer.write(item, 1)
                        queue = []
                        ended_at_se = k == se
                    else:
                        queue.append(None)
                        ended_at_se = False
                if not ended_at_se:
                    # the decoder walks past se without reading an EOB
                    # when the band's last symbol sits exactly at se
                    ln, code = _AC_CODES[0x00]  # EOB, then corrections
                    writer.write(code, ln)
                    for item in queue:
                        if item is not None:
                            writer.write(item, 1)
    writer.flush()
    out += bytes(writer.out)


def _prog_grids(
    px: np.ndarray, gray: bool, quality: int, subsample: bool
):
    """Quantized coefficient grids + per-component AC-scan block dims
    for a progressive encode (shared by the SOF2 and SOF10 twins)."""
    h, w = px.shape[:2]
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    if gray:
        planes = [px[..., 0].astype(np.float64)]
    else:
        r, g, b = (px[..., k].astype(np.float64) for k in range(3))
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [yp, cb, cr]

    # quantized coefficient grids + per-component AC-scan block dims
    if gray or not subsample:
        grids = [
            (_fdct_quant(_plane_blocks(p), qt_l if i == 0 else qt_c), 1, 1)
            for i, p in enumerate(planes)
        ]
        ac_dims = [(g.shape[0], g.shape[1]) for g, _, _ in grids]
    else:
        yb = _fdct_quant(_plane_blocks(planes[0]), qt_l)
        nbh_y, nbw_y = yb.shape[:2]
        pby, pbx = -(-nbh_y // 2) * 2, -(-nbw_y // 2) * 2
        if (pby, pbx) != (nbh_y, nbw_y):
            yb = np.pad(
                yb, ((0, pby - nbh_y), (0, pbx - nbw_y), (0, 0), (0, 0)),
                mode="edge",
            )
        cbb = _fdct_quant(_plane_blocks(planes[1]), qt_c)
        crb = _fdct_quant(_plane_blocks(planes[2]), qt_c)
        grids = [(yb, 2, 2), (cbb, 1, 1), (crb, 1, 1)]
        ac_dims = [(nbh_y, nbw_y), cbb.shape[:2], crb.shape[:2]]
    return qt_l, qt_c, grids, ac_dims


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Progressive (SOF2) encode: DC-first at Al=1, per-component AC
    first scans over two spectral bands at Al=1, then DC and AC
    refinement scans down to Al=0 — the canonical web-JPEG scan
    script shape. Exists to round-trip-test the progressive decoder
    with fixtures any conformant decoder also accepts."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    gray = nc == 1
    qt_l, qt_c, grids, ac_dims = _prog_grids(px, gray, quality, subsample)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tq, tab in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zzt = tab[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + zzt
    if gray:
        comp_spec = bytes([1, 0x11, 0])
    else:
        chh = 0x22 if subsample else 0x11
        comp_spec = bytes([1, chh, 0, 2, 0x11, 1, 3, 0x11, 1])
    nf = 1 if gray else 3
    out += (
        b"\xff\xc2"  # SOF2: progressive
        + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
        + comp_spec
    )
    tables = [(0, 0, _DC_BITS, _DC_VALS), (1, 0, _AC_BITS, _AC_VALS)]
    if not gray:
        tables += [(0, 1, _DC_BITS, _DC_VALS), (1, 1, _AC_BITS, _AC_VALS)]
    for tc, th, bits, vals in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    ids = [1] if gray else [1, 2, 3]
    tds = [0] if gray else [0, 1, 1]
    all_dc = [(ids[i], tds[i], tds[i]) for i in range(nf)]

    # scan script: DC first @Al=1; AC first per comp (two bands for
    # comp 0) @Al=1; DC refine; AC refine mirrors the first scans
    _emit_scan_header(out, all_dc, (0, 0, 0, 1))
    _encode_dc_scan(out, grids, 1, refine=False)
    ac_script = []
    for i in range(nf):
        bands = [(1, 5), (6, 63)] if i == 0 else [(1, 63)]
        for ss, se in bands:
            ac_script.append((i, ss, se))
    for i, ss, se in ac_script:
        _emit_scan_header(out, [(ids[i], tds[i], tds[i])], (ss, se, 0, 1))
        nbh, nbw = ac_dims[i]
        _encode_ac_scan(out, grids[i][0], nbh, nbw, ss, se, 1, refine=False)
    _emit_scan_header(out, all_dc, (0, 0, 1, 0))
    _encode_dc_scan(out, grids, 0, refine=True)
    for i, ss, se in ac_script:
        _emit_scan_header(out, [(ids[i], tds[i], tds[i])], (ss, se, 1, 0))
        nbh, nbw = ac_dims[i]
        _encode_ac_scan(out, grids[i][0], nbh, nbw, ss, se, 0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
) -> bytes:
    """PROGRESSIVE JPEG with ARITHMETIC entropy coding (T.81 SOF10):
    the exact scan script of ``encode_jpeg_progressive`` (DC first at
    Al=1, per-component AC first scans, DC and AC refinement down to
    Al=0) with the Huffman layer swapped for the QM-coder under the
    Annex-G statistical model. Each scan carries its own coder and
    freshly-zeroed statistics areas, as the spec requires. Emits a
    DAC segment so the decoder's conditioning parser is exercised."""
    from .qm import FIXED_BIN, QMEncoder

    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    gray = nc == 1
    low, up = dc_cond
    qt_l, qt_c, grids, ac_dims = _prog_grids(px, gray, quality, subsample)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tq, tab in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zzt = tab[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + zzt
    if gray:
        comp_spec = bytes([1, 0x11, 0])
    else:
        chh = 0x22 if subsample else 0x11
        comp_spec = bytes([1, chh, 0, 2, 0x11, 1, 3, 0x11, 1])
    nf = 1 if gray else 3
    out += (
        b"\xff\xca"  # SOF10: progressive DCT, arithmetic coding
        + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
        + comp_spec
    )
    dac = bytes([0x00, (up << 4) | low, 0x10, ac_kx])
    if not gray:
        dac += bytes([0x01, (up << 4) | low, 0x11, ac_kx])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac

    ids = [1] if gray else [1, 2, 3]
    tds = [0] if gray else [0, 1, 1]
    all_dc = [(ids[i], tds[i], tds[i]) for i in range(nf)]
    n_tbl = 1 if gray else 2

    def dc_scan(al: int, refine: bool) -> None:
        enc = QMEncoder()
        dsts = [bytearray(64) for _ in range(n_tbl)]
        fixed = bytearray([FIXED_BIN])
        preds = [0] * len(grids)
        dc_ctx = [0] * len(grids)
        mcus_y = min(g.shape[0] // gv for g, _, gv in grids)
        mcus_x = min(g.shape[1] // gh for g, gh, _ in grids)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for gi, (blocks, gh, gv) in enumerate(grids):
                    for by in range(gv):
                        for bx in range(gh):
                            dc = int(
                                blocks[my * gv + by, mx * gh + bx][0, 0]
                            )
                            if refine:
                                enc.encode(fixed, 0, (dc >> al) & 1)
                                continue
                            v = dc >> al  # arithmetic shift per T.81
                            _arith_enc_dc(
                                enc, dsts[tds[gi]], dc_ctx, gi,
                                v - preds[gi], low, up,
                            )
                            preds[gi] = v
        out.extend(enc.flush())

    def ac_scan(gi: int, ss: int, se: int, al: int, refine: bool) -> None:
        enc = QMEncoder()
        ast = bytearray(256)
        fixed = bytearray([FIXED_BIN])
        blocks = grids[gi][0]
        nbh, nbw = ac_dims[gi]
        for by in range(nbh):
            for bx in range(nbw):
                zz = blocks[by, bx][_ZZ_ROWS, _ZZ_COLS]
                if refine:
                    _arith_enc_ac_refine(enc, ast, fixed, zz, ss, se, al)
                else:
                    _arith_enc_ac_first(
                        enc, ast, fixed, zz, ss, se, al, ac_kx
                    )
        out.extend(enc.flush())

    # scan script: DC first @Al=1; AC first per comp (two bands for
    # comp 0) @Al=1; DC refine; AC refine mirrors the first scans
    _emit_scan_header(out, all_dc, (0, 0, 0, 1))
    dc_scan(1, refine=False)
    ac_script = []
    for i in range(nf):
        bands = [(1, 5), (6, 63)] if i == 0 else [(1, 63)]
        for ss, se in bands:
            ac_script.append((i, ss, se))
    for i, ss, se in ac_script:
        _emit_scan_header(out, [(ids[i], tds[i], tds[i])], (ss, se, 0, 1))
        ac_scan(i, ss, se, 1, refine=False)
    _emit_scan_header(out, all_dc, (0, 0, 1, 0))
    dc_scan(0, refine=True)
    for i, ss, se in ac_script:
        _emit_scan_header(out, [(ids[i], tds[i], tds[i])], (ss, se, 1, 0))
        ac_scan(i, ss, se, 0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg12(
    pixels: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """12-BIT extended sequential JPEG encode (T.81 SOF1, the
    medical/DICOM precision): an (H, W) / (H, W, 1) grayscale or
    (H, W, 3) RGB uint16 array with samples in 0..4095, level-shifted
    by 2048, quantized with 16-bit DQT tables (Pq = 1), and
    Huffman-coded with flat canonical tables sized for the extended
    ranges (DC SSSS 0..15 at 5 bits, AC sizes 1..14 at 8 bits).
    4:4:4 only; ``restart_interval`` > 0 emits DRI + RSTn. Fixture
    twin of ``decode_jpeg12``."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 channels")
    if px.max() > 4095 or px.min() < 0:
        raise ValueError("12-bit samples must be in 0..4095")
    gray = nc == 1
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)

    if gray:
        planes = [px[..., 0].astype(np.float64)]
    else:
        r, g, b = (px[..., k].astype(np.float64) for k in range(3))
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0
        planes = [yp, cb, cr]

    def blocks12(plane: np.ndarray) -> np.ndarray:
        ph, pw = -(-plane.shape[0] // 8) * 8, -(-plane.shape[1] // 8) * 8
        padded = np.pad(
            plane - 2048.0,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        return padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)

    grids = [
        (_fdct_quant(blocks12(p), qt_l if i == 0 else qt_c), 1, 1)
        for i, p in enumerate(planes)
    ]
    mcus_y, mcus_x = grids[0][0].shape[:2]

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT with Pq = 1 (16-bit entries) — the precision the 12-bit
    # process is allowed to need, exercising that parse path
    for tq, tab in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zz = tab[_ZZ_ROWS, _ZZ_COLS].astype(">u2").tobytes()
        out += (
            b"\xff\xdb" + struct.pack(">H", 3 + 128)
            + bytes([0x10 | tq]) + zz
        )
    if gray:
        comp_spec = bytes([1, 0x11, 0])
    else:
        comp_spec = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    nf = 1 if gray else 3
    out += (
        b"\xff\xc1"  # SOF1: extended sequential, Huffman
        + struct.pack(">HBHHB", 8 + 3 * nf, 12, h, w, nf)
        + comp_spec
    )
    tables = [(0, 0, _DC12_BITS, _DC12_VALS), (1, 0, _AC12_BITS, _AC12_VALS)]
    if not gray:
        tables += [
            (0, 1, _DC12_BITS, _DC12_VALS),
            (1, 1, _AC12_BITS, _AC12_VALS),
        ]
    for tc, th, bits, vals in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def encode_block12(writer: _BitWriter, blk: np.ndarray, pred: int) -> int:
        zz = blk[_ZZ_ROWS, _ZZ_COLS].copy()
        # extended-precision AC magnitudes cap at size 14
        np.clip(zz[1:], -16383, 16383, out=zz[1:])
        diff = int(zz[0]) - pred
        size = _csize(diff)
        ln, code = _DC12_CODES[size]
        writer.write(code, ln)
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        end = (last_nz[-1] + 2) if last_nz.size else 1
        for k in range(1, end):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = _AC12_CODES[0xF0]
                writer.write(code, ln)
                run -= 16
            size = _csize(v)
            ln, code = _AC12_CODES[(run << 4) | size]
            writer.write(code, ln)
            writer.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if end < 64:
            ln, code = _AC12_CODES[0x00]
            writer.write(code, ln)
        return int(zz[0])

    writer = _BitWriter()
    preds = [0] * len(grids)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                out += bytes(writer.out)
                writer = _BitWriter()
                out += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                )
                preds = [0] * len(grids)
            for gi, (blocks, _gh, _gv) in enumerate(grids):
                blk = blocks[my, mx]
                preds[gi] = encode_block12(writer, blk, preds[gi])
            mcu += 1
    writer.flush()
    out += bytes(writer.out)
    out += b"\xff\xd9"
    return bytes(out)


def exif_orientation(payload: bytes) -> int:
    """EXIF Orientation (tag 0x0112) from the APP1 segment, 1-8 per
    the EXIF spec (1 = upright); 1 when absent/unparseable. Walks only
    marker headers + IFD0 of the embedded TIFF structure."""
    if payload[:2] != b"\xff\xd8":
        return 1
    i = 2
    while i + 4 <= len(payload) and payload[i] == 0xFF:
        marker = payload[i + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack_from(">H", payload, i + 2)[0]
        if marker == 0xDA:  # entropy data: no EXIF past here
            break
        if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
            t = payload[i + 10 : i + 2 + seg_len]
            if len(t) >= 8 and t[:2] in (b"II", b"MM"):
                bo = "<" if t[:2] == b"II" else ">"
                try:
                    ifd = struct.unpack_from(bo + "I", t, 4)[0]
                    n = struct.unpack_from(bo + "H", t, ifd)[0]
                    for k in range(n):
                        off = ifd + 2 + 12 * k
                        tag, typ, _cnt = struct.unpack_from(
                            bo + "HHI", t, off
                        )
                        if tag == 0x0112 and typ == 3:
                            v = struct.unpack_from(bo + "H", t, off + 8)[0]
                            return v if 1 <= v <= 8 else 1
                except struct.error:
                    return 1
            return 1
        i += 2 + seg_len
    return 1


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize decoded pixels to upright per the EXIF orientation
    value (the transform every viewer applies silently)."""
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:
        return px.transpose(1, 0, 2)
    if orientation == 6:
        return px.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return px.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return px.transpose(1, 0, 2)[::-1]
    return px


def decode_jpeg_oriented(payload: bytes) -> np.ndarray | None:
    """decode_jpeg + EXIF orientation normalization — what a training
    pipeline actually wants (a sideways photo embeds differently)."""
    px = decode_jpeg(payload)
    if px is None:
        return None
    return np.ascontiguousarray(apply_orientation(px, exif_orientation(payload)))
