"""FLAC (Free Lossless Audio Codec) decoder + fixture encoder —
from scratch against the public xiph.org format spec (RFC 9639).

Decoder surface (``decode_flac``): stream header + STREAMINFO,
frame sync/header (coded frame number, CRC-8), subframe types
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), Rice-coded residual
partitions (coding methods 0 and 1, escape-to-raw partitions),
wasted bits, and all four channel assignments (independent,
left/side, right/side, mid/side). The decoded PCM is verified
against the STREAMINFO MD5 when present — a lossless codec's
built-in end-to-end check.

Encoder (``encode_flac``, fixture writer): 16-bit frames at a fixed
block size; per-subframe best-of (CONSTANT / FIXED order 0-4 / LPC
via Levinson-Durbin with quantized coefficients / VERBATIM fallback),
Rice parameter search, optional stereo decorrelation modes. Because
FLAC is lossless, round-trip equality proves both legs bit-exact
regardless of how good the predictors are.

The reference repo has no audio path (its surface is
``src/canvas.py``/``jenzabar.py`` ETL); this extends the engine's
multimodal corpus layer, where compressed audio columns are decoded
inside Arrow-batched ``mapInPandas`` tasks — payload bytes never
shuffle, one row per clip (see ``operators/multimodal.py``).

Scale note: this is per-clip work. The per-sample loops are plain
Python — fine for the metadata/fingerprint fixtures used here; a
production hot path would vectorize residual reconstruction with
numpy per partition, which changes none of the bitstream logic.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise EOFError
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while not self.read(1):
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_coded_number(br: _BitReader) -> int:
    """The frame header's UTF-8-style variable-length number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts or block_size >> porder <= order and nparts > 1:
        # partition sizes must divide the block; first partition must
        # still have room for the warmup samples
        if block_size % nparts:
            raise ValueError("bad partition order")
    out: list[int] = []
    for p in range(nparts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("bad partition size")
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(n):
                q = br.unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe pad bit set")
    typ = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if typ == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * block_size
    elif typ == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= typ <= 12:  # FIXED, order = typ & 7
        order = typ & 7
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        coef = _FIXED_COEFFS[order]
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coef))
            out.append(e + pred)
    elif typ >= 32:  # LPC, order = (typ & 31) + 1
        order = (typ & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid lpc precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coef = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coef)) >> shift
            out.append(e + pred)
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes) -> dict | None:
    """Full-stream decode. Returns {sample_rate, channels, bits,
    samples} with ``samples`` an (n, channels) int32 array, or None
    when the payload is not FLAC / uses reserved encodings / fails
    the STREAMINFO MD5 check. Malformed tails end decoding at the
    last good frame rather than raising."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0 and len(body) >= 34:
            (min_bs,) = struct.unpack_from(">H", body, 0)
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5 = body[18:34]
            info = (min_bs, rate, channels, bps, total, md5)
        pos += 4 + blen
        if last:
            break
    if info is None:
        return None
    _, rate, channels, bps, total, md5 = info
    if rate == 0 or bps not in (8, 16, 24, 32):
        return None

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            break
        frame_start = pos
        br = _BitReader(payload, pos)
        try:
            br.read(16)  # sync + reserved + blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            bps_code = br.read(3)
            br.read(1)
            _read_coded_number(br)
            if bs_code == 6:
                block_size = br.read(8) + 1
            elif bs_code == 7:
                block_size = br.read(16) + 1
            elif bs_code in _BLOCK_SIZES:
                block_size = _BLOCK_SIZES[bs_code]
            else:
                break
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            elif sr_code != 0 and sr_code not in _RATES:
                break
            hdr_end = br.byte + (1 if br.bit else 0)
            if hdr_end >= len(payload):
                break
            if _crc8(payload[frame_start:hdr_end]) != payload[hdr_end]:
                break
            br = _BitReader(payload, hdr_end + 1)
            fbps = _BPS.get(bps_code, bps) if bps_code else bps
            if ch_code < 8:
                n_sub = ch_code + 1
                subs = []
                for _ in range(n_sub):
                    subs.append(_read_subframe(br, block_size, fbps))
            elif ch_code == 8:  # left/side
                left = _read_subframe(br, block_size, fbps)
                side = _read_subframe(br, block_size, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, block_size, fbps + 1)
                right = _read_subframe(br, block_size, fbps)
                subs = [[r + s for r, s in zip(right, side)], right]
            elif ch_code == 10:  # mid/side
                mid = _read_subframe(br, block_size, fbps)
                side = _read_subframe(br, block_size, fbps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
            else:
                break
            if len(subs) != channels:
                break
            br.align()
            if br.byte + 2 > len(payload):
                break
            if _crc16(payload[frame_start : br.byte]) != int.from_bytes(
                payload[br.byte : br.byte + 2], "big"
            ):
                break
            for c in range(channels):
                chans[c].extend(subs[c])
            pos = br.byte + 2
        except (EOFError, ValueError, IndexError):
            break

    n = min(len(c) for c in chans) if chans else 0
    if total:
        n = min(n, total)
    if n == 0:
        return None
    samples = np.array(
        [c[:n] for c in chans], dtype=np.int64
    ).T.astype(np.int32)
    if md5 != b"\x00" * 16:
        width = bps // 8
        inter = samples.astype(np.int64)
        if bps == 8:
            raw = (inter & 0xFF).astype(np.uint8).tobytes()
        elif bps == 16:
            raw = inter.astype("<i2").tobytes()
        elif bps == 24:
            le = inter.astype("<i4").tobytes()
            raw = b"".join(
                le[i : i + 3] for i in range(0, len(le), 4)
            )
        else:
            raw = inter.astype("<i4").tobytes()
        del width
        if hashlib.md5(raw).digest() != md5:
            return None
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bps,
        "samples": samples,
    }


# ------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bits_len(self) -> int:
        return len(self.out) * 8 + self.nbits


def _coded_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | v
    return bytes([lead] + out[::-1])


def _best_rice_param(resid: list[int], plen: int = 4) -> tuple[int, int]:
    """(param, total_bits) minimizing the Rice cost; (escape) raw
    fallback handled by the caller via the returned cost."""
    best_p, best_cost = 0, None
    for p in range((1 << plen) - 1):
        cost = 0
        for e in resid:
            u = (e << 1) ^ (e >> 63) if e < 0 else e << 1
            cost += (u >> p) + 1 + p
            if best_cost is not None and cost >= best_cost:
                break
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p, best_cost


def _write_rice(bw: _BitWriter, resid: list[int], order: int, plen: int = 4) -> None:
    bw.write(0 if plen == 4 else 1, 2)
    bw.write(0, 4)  # partition order 0
    p, cost = _best_rice_param(resid, plen)
    raw_bits = max(
        (abs(e).bit_length() + 1 for e in resid), default=1
    )
    if cost > len(resid) * raw_bits + 5:
        bw.write((1 << plen) - 1, plen)  # escape
        bw.write(raw_bits, 5)
        for e in resid:
            bw.write(e, raw_bits)
        return
    bw.write(p, plen)
    for e in resid:
        u = (e << 1) ^ (e >> 63) if e < 0 else e << 1
        bw.write_unary(u >> p)
        bw.write(u, p)


def _lpc_coeffs(block: list[int], order: int, precision: int = 12):
    """Levinson-Durbin on the block autocorrelation, quantized to
    ``precision``-bit integers with a common shift."""
    # int64 autocorrelation: float np.dot is a BLAS reduction whose
    # summation order is CPU-dispatch-dependent — for loud 24-bit
    # blocks the partial sums pass 2^53 and the lsb becomes
    # host-dependent, flipping LPC quantization (and thus the encoded
    # bytes) between executors. Integer dot is numpy's own exact loop;
    # products*n stay under 2^63 through 24-bit x 4096-sample blocks.
    x = np.asarray(block, np.int64)
    n = len(x)
    if n <= order:
        return None
    ac = [float(np.dot(x[: n - i], x[i:])) for i in range(order + 1)]
    if ac[0] == 0:
        return None
    err = ac[0]
    a = [0.0] * order
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= a[j] * ac[i - j]
        k = acc / err
        a[i] = k
        for j in range(i // 2):
            t = a[j]
            a[j] -= k * a[i - 1 - j]
            a[i - 1 - j] -= k * t
        if i & 1:
            a[i // 2] -= k * a[i // 2]
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = max(abs(c) for c in a)
    if cmax == 0:
        return None
    shift = min(14, max(1, precision - 1 - int(np.ceil(np.log2(cmax + 1e-9)))))
    q = [int(round(c * (1 << shift))) for c in a]
    lim = 1 << (precision - 1)
    if any(c >= lim or c < -lim for c in q):
        return None
    return q, shift


def _subframe_plan(block: list[int], bps: int):
    """Pick the cheapest encoding for one channel's block: CONSTANT,
    best FIXED order, LPC(8), or VERBATIM. Returns (kind, payload)."""
    if all(v == block[0] for v in block):
        return ("constant", None)
    candidates = []
    for order in range(5):
        if len(block) <= order:
            continue
        resid = []
        coef = _FIXED_COEFFS[order]
        for i in range(order, len(block)):
            pred = sum(c * block[i - j - 1] for j, c in enumerate(coef))
            resid.append(block[i] - pred)
        _, cost = _best_rice_param(resid)
        candidates.append((cost + order * bps, "fixed", order, resid, None))
    lpc_order = 8
    lp = _lpc_coeffs(block, lpc_order)
    if lp is not None:
        q, shift = lp
        resid = []
        for i in range(lpc_order, len(block)):
            pred = (
                sum(c * block[i - j - 1] for j, c in enumerate(q)) >> shift
            )
            resid.append(block[i] - pred)
        _, cost = _best_rice_param(resid)
        candidates.append(
            (cost + lpc_order * bps + 4 + 5 + lpc_order * 12,
             "lpc", lpc_order, resid, (q, shift))
        )
    candidates.append((len(block) * bps, "verbatim", 0, None, None))
    candidates.sort(key=lambda c: c[0])
    _, kind, order, resid, extra = candidates[0]
    return (kind, (order, resid, extra))


def _write_subframe(bw: _BitWriter, block: list[int], bps: int) -> None:
    kind, payload = _subframe_plan(block, bps)
    bw.write(0, 1)  # pad
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(block[0], bps)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in block:
            bw.write(v, bps)
        return
    order, resid, extra = payload
    if kind == "fixed":
        bw.write(8 | order, 6)
        bw.write(0, 1)
        for v in block[:order]:
            bw.write(v, bps)
        _write_rice(bw, resid, order)
        return
    q, shift = extra
    bw.write(32 | (order - 1), 6)
    bw.write(0, 1)
    for v in block[:order]:
        bw.write(v, bps)
    bw.write(12 - 1, 4)  # precision 12
    bw.write(shift, 5)
    for c in q:
        bw.write(c, 12)
    _write_rice(bw, resid, order)


def encode_flac(
    samples,
    sample_rate: int,
    block_size: int = 1024,
    stereo_mode: str = "independent",
) -> bytes:
    """16-bit FLAC fixture writer. ``samples``: (n,) or (n, channels)
    int array. ``stereo_mode`` for 2-channel input: independent,
    left_side, right_side, or mid_side — exercising every decoder
    channel-assignment path. Lossless: decode_flac round-trips the
    exact samples (and the STREAMINFO MD5 proves it)."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    bps = 16
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | n
    )
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + md5
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(7, 4)  # blocksize: 16-bit value at header end
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 2 and stereo_mode != "independent":
            code = {"left_side": 8, "right_side": 9, "mid_side": 10}[
                stereo_mode
            ]
            hdr.write(code, 4)
        else:
            hdr.write(channels - 1, 4)
        hdr.write(4, 3)  # bps 16
        hdr.write(0, 1)
        hdr.align()
        header = bytes(hdr.out) + _coded_number(fi)
        header += struct.pack(">H", bs - 1)
        header += bytes([_crc8(header)])

        bw = _BitWriter()
        if channels == 2 and stereo_mode != "independent":
            left = blk[:, 0].tolist()
            right = blk[:, 1].tolist()
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                _write_subframe(bw, left, bps)
                _write_subframe(bw, side, bps + 1)
            elif stereo_mode == "right_side":
                _write_subframe(bw, side, bps + 1)
                _write_subframe(bw, right, bps)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _write_subframe(bw, mid, bps)
                _write_subframe(bw, side, bps + 1)
        else:
            for c in range(channels):
                _write_subframe(bw, blk[:, c].tolist(), bps)
        bw.align()
        frame = header + bytes(bw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
