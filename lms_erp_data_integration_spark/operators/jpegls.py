"""JPEG-LS (ITU-T T.87 / ISO 14495-1, LOCO-I) codec in pure
numpy + stdlib — no external codec.

Implements the complete LOSSLESS (NEAR = 0) near-lossless-family
baseline process for precisions 2-16 bits, plane-interleaved
(ILV = 0) scans:

- Marker layer: SOI, SOF55 (0xF7) frame, optional LSE (0xF8, ID 1)
  preset parameters (MAXVAL, T1, T2, T3, RESET), per-component SOS
  with NEAR/ILV bytes, EOI. Entropy data uses the T.87 bit-stuffing
  rule: after an 0xFF byte only SEVEN bits of the next byte are
  code bits (its MSB is forced 0 so no marker can appear).
- Regular mode (A.4-A.6): causal template (Ra left, Rb above, Rc
  above-left, Rd above-right, with the spec's edge substitutions),
  local-gradient quantization by T1/T2/T3 into 365 sign-folded
  contexts, MED edge-detecting prediction plus the adaptive bias
  correction C[q] (B/C update with MIN_C/MAX_C clamps), Golomb
  parameter k from A[q]/N[q], the k = 0 bias-inverted error
  mapping, and limited-length Golomb coding (unary zeros + 1 +
  k LSBs, escape to qbpp raw bits at LIMIT - qbpp - 1).
- Run mode (A.7): entered when all three gradients are zero; run
  lengths coded by the 32-entry J[] segment-order table (the only
  table the standard needs), end-of-line partial segments, and the
  two run-interruption contexts (365/366) with their own
  A/N/Nn statistics, RItype prediction, and the three-branch error
  map of Figure A.21.

The encoder and decoder are exact mirrors; lossless round-trips are
property-tested over random and structured images (the same
evidence basis as the FLAC/QM/lossless-JPEG decoders: spec-derived
implementation + bijection + fixture CRCs under the driver gate).

Scale posture: per-payload CPU work inside Arrow-batched
``mapInPandas`` stages (``operators/multimodal.py``) — a narrow map
with no shuffle; at 100 TB it scales with input splits like the
rest of the codec family. The sample loop is per-pixel Python,
bounded by payload dimensions — fixture-sized in the gate, and the
documented slow-path trade every from-scratch decoder here makes.
"""

from __future__ import annotations

import struct

import numpy as np

# Order of run-length code segments (T.87 Table A.1) — the only
# constant table in the standard.
_J = [
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15,
]
_MIN_C, _MAX_C = -128, 127


def _default_thresholds(maxval: int, near: int = 0) -> tuple[int, int, int]:
    """C.2.4.1.1.1 default T1/T2/T3 for a given MAXVAL/NEAR."""

    def clamp(v: int, lo: int) -> int:
        return lo if (v > maxval or v < lo) else v

    if maxval >= 128:
        factor = (min(maxval, 4095) + 128) >> 8
        t1 = clamp(factor * (3 - 2) + 2 + 3 * near, near + 1)
        t2 = clamp(factor * (7 - 3) + 3 + 5 * near, t1)
        t3 = clamp(factor * (21 - 4) + 4 + 7 * near, t2)
    else:
        factor = 256 // (maxval + 1)
        t1 = clamp(max(2, 3 // factor + 3 * near), near + 1)
        t2 = clamp(max(3, 7 // factor + 5 * near), t1)
        t3 = clamp(max(4, 21 // factor + 7 * near), t2)
    return t1, t2, t3


class _Params:
    """Derived coding parameters (A.2.1) for one scan."""

    def __init__(self, maxval: int, t1: int, t2: int, t3: int, reset: int):
        self.maxval = maxval
        self.t1, self.t2, self.t3 = t1, t2, t3
        self.reset = reset
        self.range = maxval + 1  # NEAR = 0
        self.bpp = max(2, (maxval).bit_length())
        self.qbpp = self.bpp
        self.limit = 2 * (self.bpp + max(8, self.bpp))


class _State:
    """Per-scan adaptive statistics (A.2.1 initialization)."""

    def __init__(self, p: _Params):
        a0 = max(2, (p.range + 32) >> 6)
        self.A = [a0] * 367
        self.B = [0] * 365
        self.C = [0] * 365
        self.N = [1] * 367
        self.Nn = [0, 0]  # contexts 365/366
        self.run_index = 0


def _quantize(d: int, p: _Params) -> int:
    """Gradient quantizer (A.3.3), NEAR = 0."""
    if d <= -p.t3:
        return -4
    if d <= -p.t2:
        return -3
    if d <= -p.t1:
        return -2
    if d < 0:
        return -1
    if d == 0:
        return 0
    if d < p.t1:
        return 1
    if d < p.t2:
        return 2
    if d < p.t3:
        return 3
    return 4


def _med(a: int, b: int, c: int) -> int:
    """Median edge detector prediction (A.4.2)."""
    if c >= max(a, b):
        return min(a, b)
    if c <= min(a, b):
        return max(a, b)
    return a + b - c


class _BitWriter:
    """MSB-first writer with the T.87 0xFF bit-stuffing rule."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _width(self) -> int:
        # 7 code bits in the byte after an emitted 0xFF
        return 7 if (self.out and self.out[-1] == 0xFF) else 8

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == self._width():
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        w = self._width()
        if self.nbits:
            self.out.append(self.acc << (w - self.nbits))
            self.acc = 0
            self.nbits = 0


class _BitReader:
    """MSB-first reader mirroring the writer; a 1 bit in the MSB
    slot after an 0xFF byte means a marker follows — treated as
    end-of-data (zeros are fed so a well-formed stream's final
    padding still decodes)."""

    __slots__ = ("data", "pos", "acc", "nbits", "prev_ff")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.prev_ff = False

    def _fill(self) -> None:
        if self.pos < len(self.data):
            byte = self.data[self.pos]
            if self.prev_ff:
                if byte & 0x80:
                    # marker: stop consuming, feed zeros
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    return
                self.pos += 1
                self.prev_ff = False
                self.acc = ((self.acc << 7) | byte) & 0xFFFFFFFF
                self.nbits += 7
                return
            self.pos += 1
            self.prev_ff = byte == 0xFF
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.nbits += 8
        else:
            self.acc = (self.acc << 8) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _golomb_write(w: _BitWriter, v: int, k: int, glimit: int, qbpp: int):
    """Limited-length Golomb (A.5.3): unary zeros + 1 + k LSBs;
    escape to qbpp raw bits of (v - 1)."""
    hi = v >> k
    if hi < glimit - qbpp - 1:
        w.write(1, hi + 1)  # hi zeros then a 1
        if k:
            w.write(v & ((1 << k) - 1), k)
    else:
        w.write(1, glimit - qbpp)
        w.write((v - 1) & ((1 << qbpp) - 1), qbpp)


def _golomb_read(r: _BitReader, k: int, glimit: int, qbpp: int) -> int:
    z = 0
    while r.read_bit() == 0:
        z += 1
        if z > glimit:
            raise ValueError("unary overrun")
    if z < glimit - qbpp - 1:
        return (z << k) | (r.read_bits(k) if k else 0)
    return r.read_bits(qbpp) + 1


def _context(d1: int, d2: int, d3: int, p: _Params) -> tuple[int, int]:
    """Sign-folded context index 1..364 and SIGN (A.3.4)."""
    q = (
        81 * _quantize(d1, p)
        + 9 * _quantize(d2, p)
        + _quantize(d3, p)
    )
    if q < 0:
        return -q, -1
    return q, 1


def _regular_k(st: _State, q: int) -> int:
    k = 0
    while (st.N[q] << k) < st.A[q]:
        k += 1
    return k


def _update_regular(st: _State, q: int, errval: int, reset: int) -> None:
    """A.6: B/A accumulation, halving at RESET, bias correction."""
    st.B[q] += errval  # NEAR = 0
    st.A[q] += abs(errval)
    if st.N[q] == reset:
        st.A[q] >>= 1
        st.B[q] = st.B[q] >> 1
        st.N[q] >>= 1
    st.N[q] += 1
    if st.B[q] <= -st.N[q]:
        st.B[q] += st.N[q]
        if st.C[q] > _MIN_C:
            st.C[q] -= 1
        if st.B[q] <= -st.N[q]:
            st.B[q] = -st.N[q] + 1
    elif st.B[q] > 0:
        st.B[q] -= st.N[q]
        if st.C[q] < _MAX_C:
            st.C[q] += 1
        if st.B[q] > 0:
            st.B[q] = 0


def _ri_k_map(st: _State, ritype: int, errval: int) -> tuple[int, int, int]:
    """Run-interruption Golomb parameter, map bit, and EMErrval
    (Figure A.21)."""
    q = 365 + ritype
    temp = st.A[q] + ((st.N[q] >> 1) if ritype else 0)
    k = 0
    while (st.N[q] << k) < temp:
        k += 1
    nn, n = st.Nn[ritype], st.N[q]
    if k == 0 and errval > 0 and 2 * nn < n:
        m = 1
    elif errval < 0 and 2 * nn >= n:
        m = 1
    elif errval < 0 and k != 0:
        m = 1
    else:
        m = 0
    return k, m, 2 * abs(errval) - ritype - m


def _ri_k(st: _State, ritype: int) -> int:
    q = 365 + ritype
    temp = st.A[q] + ((st.N[q] >> 1) if ritype else 0)
    k = 0
    while (st.N[q] << k) < temp:
        k += 1
    return k


def _update_ri(st: _State, ritype: int, errval: int, em: int, reset: int):
    """Run-interruption statistics update (A.7.2)."""
    q = 365 + ritype
    if errval < 0:
        st.Nn[ritype] += 1
    st.A[q] += (em + 1 - ritype) >> 1
    if st.N[q] == reset:
        st.A[q] >>= 1
        st.N[q] >>= 1
        st.Nn[ritype] >>= 1
    st.N[q] += 1
    if st.run_index > 0:
        st.run_index -= 1


def _mod_range(e: int, rng: int) -> int:
    """A.4.5 modulo reduction to [-floor(R/2), ceil(R/2) - 1]."""
    if e < 0:
        e += rng
    if e >= (rng + 1) >> 1:
        e -= rng
    return e


def _encode_plane(plane: np.ndarray, p: _Params, w: _BitWriter) -> None:
    h, wd = plane.shape
    st = _State(p)
    glimit = p.limit
    up = [0] * wd
    c0 = 0
    for _row in range(h):
        cur = [0] * wd
        line = plane[_row]
        j = 0
        while j < wd:
            b = up[j]
            d = up[j + 1] if j + 1 < wd else b
            c = up[j - 1] if j > 0 else c0
            a = cur[j - 1] if j > 0 else b
            x = int(line[j])
            d1, d2, d3 = d - b, b - c, c - a
            if d1 == 0 and d2 == 0 and d3 == 0:
                # run mode (A.7): count samples equal to a
                run = 0
                while j + run < wd and int(line[j + run]) == a:
                    run += 1
                eol = j + run == wd
                for jj in range(j, j + run):
                    cur[jj] = a
                j += run
                while run >= (1 << _J[st.run_index]):
                    w.write(1, 1)
                    run -= 1 << _J[st.run_index]
                    if st.run_index < 31:
                        st.run_index += 1
                if eol:
                    if run > 0:
                        w.write(1, 1)
                    continue
                w.write(0, 1)
                if _J[st.run_index]:
                    w.write(run, _J[st.run_index])
                # run interruption sample
                x = int(line[j])
                b = up[j]
                ritype = 1 if a == b else 0
                px = a if ritype else b
                errval = x - px
                sign = -1 if (ritype == 0 and a > b) else 1
                errval *= sign
                errval = _mod_range(errval, p.range)
                k, _m, em = _ri_k_map(st, ritype, errval)
                _golomb_write(
                    w, em, k, glimit - _J[st.run_index] - 1, p.qbpp
                )
                _update_ri(st, ritype, errval, em, p.reset)
                cur[j] = x
                j += 1
                continue
            # regular mode
            q, sign = _context(d1, d2, d3, p)
            px = _med(a, b, c) + sign * st.C[q]
            px = 0 if px < 0 else (p.maxval if px > p.maxval else px)
            errval = (x - px) * sign
            errval = _mod_range(errval, p.range)
            k = _regular_k(st, q)
            if k == 0 and 2 * st.B[q] <= -st.N[q]:
                merr = 2 * errval + 1 if errval >= 0 else -2 * (errval + 1)
            else:
                merr = 2 * errval if errval >= 0 else -2 * errval - 1
            _golomb_write(w, merr, k, glimit, p.qbpp)
            _update_regular(st, q, errval, p.reset)
            cur[j] = x
            j += 1
        c0 = up[0]
        up = cur


def _decode_plane(r: _BitReader, h: int, wd: int, p: _Params) -> np.ndarray:
    st = _State(p)
    glimit = p.limit
    out = np.zeros((h, wd), np.int64)
    up = [0] * wd
    c0 = 0
    for _row in range(h):
        cur = [0] * wd
        j = 0
        while j < wd:
            b = up[j]
            d = up[j + 1] if j + 1 < wd else b
            c = up[j - 1] if j > 0 else c0
            a = cur[j - 1] if j > 0 else b
            d1, d2, d3 = d - b, b - c, c - a
            if d1 == 0 and d2 == 0 and d3 == 0:
                # run mode
                while True:
                    if r.read_bit():
                        seg = 1 << _J[st.run_index]
                        rem = wd - j
                        n = seg if seg <= rem else rem
                        for jj in range(j, j + n):
                            cur[jj] = a
                        j += n
                        if n == seg and st.run_index < 31:
                            # full segment: order grows even when it
                            # lands exactly on the line end (the
                            # encoder's subtract loop incremented too)
                            st.run_index += 1
                        if n < seg or j == wd:
                            break  # partial segment / EOL
                        continue
                    if _J[st.run_index]:
                        run = r.read_bits(_J[st.run_index])
                    else:
                        run = 0
                    if j + run > wd:
                        raise ValueError("run past line end")
                    for jj in range(j, j + run):
                        cur[jj] = a
                    j += run
                    # run interruption sample
                    b = up[j]
                    ritype = 1 if a == b else 0
                    px = a if ritype else b
                    k = _ri_k(st, ritype)
                    em = _golomb_read(
                        r, k, glimit - _J[st.run_index] - 1, p.qbpp
                    )
                    temp = em + ritype
                    m = temp & 1
                    eabs = (temp + m) >> 1
                    neg = (k != 0 or 2 * st.Nn[ritype] >= st.N[365 + ritype])
                    errval = -eabs if (neg == bool(m)) else eabs
                    _update_ri(st, ritype, errval, em, p.reset)
                    sign = -1 if (ritype == 0 and a > b) else 1
                    x = px + sign * errval
                    if x < 0:
                        x += p.range
                    elif x > p.maxval:
                        x -= p.range
                    cur[j] = x
                    j += 1
                    break
                continue
            # regular mode
            q, sign = _context(d1, d2, d3, p)
            px = _med(a, b, c) + sign * st.C[q]
            px = 0 if px < 0 else (p.maxval if px > p.maxval else px)
            k = _regular_k(st, q)
            merr = _golomb_read(r, k, glimit, p.qbpp)
            if k == 0 and 2 * st.B[q] <= -st.N[q]:
                if merr & 1:
                    errval = (merr - 1) >> 1
                else:
                    errval = -(merr >> 1) - 1
            else:
                if merr & 1:
                    errval = -((merr + 1) >> 1)
                else:
                    errval = merr >> 1
            _update_regular(st, q, errval, p.reset)
            x = px + sign * errval
            if x < 0:
                x += p.range
            elif x > p.maxval:
                x -= p.range
            if not 0 <= x <= p.maxval:
                raise ValueError("sample out of range")
            cur[j] = x
            j += 1
        c0 = up[0]
        up = cur
        out[_row] = cur
    return out


def encode_jpegls(pixels: np.ndarray, reset: int = 64) -> bytes:
    """Encode an (H, W) / (H, W, 1) / (H, W, 3) uint8 or uint16
    array (samples in 0..MAXVAL for the dtype's precision: 8-bit
    for uint8, 16-bit for uint16) as a lossless JPEG-LS stream with
    plane-interleaved (ILV = 0) scans and default thresholds. Emits
    an LSE marker when RESET differs from the default 64."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 or 3 components")
    if px.dtype == np.uint8:
        prec = 8
    elif px.dtype == np.uint16:
        prec = 16
    else:
        raise ValueError("expected uint8 or uint16 samples")
    maxval = (1 << prec) - 1
    t1, t2, t3 = _default_thresholds(maxval)
    p = _Params(maxval, t1, t2, t3, reset)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xf7"  # SOF55
        + struct.pack(">HBHHB", 8 + 3 * nc, prec, h, w, nc)
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc))
    )
    if reset != 64:
        body = struct.pack(">BHHHHH", 1, maxval, t1, t2, t3, reset)
        out += b"\xff\xf8" + struct.pack(">H", 2 + len(body)) + body
    for comp in range(nc):
        out += (
            b"\xff\xda"
            + struct.pack(">H", 8)
            + bytes([1, comp + 1, 0, 0, 0, 0])  # Ns=1, NEAR=0, ILV=0
        )
        wtr = _BitWriter()
        _encode_plane(px[..., comp].astype(np.int64), p, wtr)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def is_jpegls(payload: bytes) -> bool:
    """True when the marker chain reaches SOF55 before any other
    frame marker — a structural test (not a substring scan, which an
    EXIF blob could false-positive)."""
    if payload[:2] != b"\xff\xd8":
        return False
    i = 2
    while i + 4 <= len(payload) and payload[i] == 0xFF:
        m = payload[i + 1]
        if m == 0xF7:
            return True
        if m == 0xDA or (
            0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC)
        ):
            return False  # another frame type (or scan) came first
        i += 2 + struct.unpack_from(">H", payload, i + 2)[0]
    return False


def decode_jpegls(payload: bytes) -> np.ndarray | None:
    """Decode a lossless (NEAR = 0) plane-interleaved JPEG-LS stream
    to (H, W, C) uint8 (precision <= 8) or uint16. Returns None for
    non-JPEG-LS payloads, near-lossless scans (NEAR > 0), sample- or
    line-interleaved scans, and malformed streams — the decoder
    never raises on foreign input."""
    try:
        return _decode_jpegls_inner(payload)
    except (ValueError, IndexError, struct.error, MemoryError):
        return None


def _decode_jpegls_inner(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    if b"\xff\xf7" not in data:
        return None
    frame = None
    planes: list[np.ndarray] = []
    maxval = t1 = t2 = t3 = None
    reset = 64
    i = 2
    while i + 2 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9:
            break
        if i + 4 > len(data):
            return None
        seg_len = struct.unpack_from(">H", data, i + 2)[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xF7:  # SOF55
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if not 2 <= prec <= 16 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            if h * w > 1 << 26:
                return None
            comps = [seg[6 + 3 * k] for k in range(nc)]
            if any(
                seg[7 + 3 * k] != 0x11 for k in range(nc)
            ):
                return None  # subsampled JPEG-LS: out of scope
            frame = {"prec": prec, "h": h, "w": w, "nc": nc, "ids": comps}
            maxval = (1 << prec) - 1
            t1, t2, t3 = _default_thresholds(maxval)
        elif marker == 0xF8 and seg and seg[0] == 1:  # LSE preset
            mv, p1, p2, p3, rs = struct.unpack_from(">HHHHH", seg, 1)
            if mv:
                maxval = mv
                t1, t2, t3 = _default_thresholds(maxval)
            if p1 or p2 or p3:
                t1, t2, t3 = p1, p2, p3
            if rs:
                reset = rs
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            if ns != 1:
                return None  # ILV != 0 (interleaved scan): out of scope
            near, ilv = seg[1 + 2 * ns], seg[2 + 2 * ns]
            if near != 0 or ilv != 0:
                return None
            p = _Params(maxval, t1, t2, t3, reset)
            r = _BitReader(data, i + 2 + seg_len)
            planes.append(_decode_plane(r, frame["h"], frame["w"], p))
            # skip to the next marker after the entropy data: the
            # bit-stuffing rule means a code-stream 0xFF is always
            # followed by a byte < 0x80, so a marker is 0xFF + an
            # MSB-set byte; 0xFF 0xFF is a trailing code byte (or a
            # fill byte) in front of the real marker, so require the
            # second byte != 0xFF and start one byte back when the
            # reader may have consumed the marker's own 0xFF
            i = r.pos - 1 if r.prev_ff else r.pos
            while i + 2 <= len(data) and not (
                data[i] == 0xFF
                and data[i + 1] & 0x80
                and data[i + 1] != 0xFF
            ):
                i += 1
            continue
        i += 2 + seg_len
    if frame is None or len(planes) != frame["nc"]:
        return None
    dt = np.uint8 if frame["prec"] <= 8 else np.uint16
    return np.stack(planes, axis=-1).astype(dt)
