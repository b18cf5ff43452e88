"""QM arithmetic coder (ITU-T T.81 Annex D) — the adaptive binary
arithmetic codec JPEG's arithmetic-coded processes (SOF9/SOF10/SOF11)
use for entropy coding, built from the public spec like the repo's
other codecs (FLAC per RFC 9639, ADPCM, T.81 Huffman).

The coder is the classic Qe-table state machine: each context holds a
(state index, MPS sense) pair; coding a decision subdivides the
interval register A by the state's LPS probability estimate Qe, with
conditional MPS/LPS exchange when the MPS subinterval falls below Qe
(T.81 D.1.3), renormalizing A and the code register C doubling at a
time until A >= 0x8000 (D.1.5). Probability adaptation happens ONLY on
renormalization: MPS renorm moves to Next_Index_MPS, LPS renorm to
Next_Index_LPS, flipping the MPS sense when the state's Switch flag is
set (Table D.3). Byte output stuffs a 0x00 after every 0xFF (JPEG
marker transparency, D.1.6) and defers 0xFF bytes on a counter so a
carry can ripple through them; the decoder un-stuffs and feeds zero
bytes once it reaches a marker (D.2.2).

Contexts live in a caller-owned ``bytearray`` ("statistics area"),
one byte per context: bit 7 = current MPS sense, bits 0..6 = state
index. Index 113 is the non-adaptive "fixed" state (Qe ~ 0.5, no
transitions) JPEG uses for AC sign decisions.

Used by ``operators/jpeg.py`` for the SOF9 (sequential DCT,
arithmetic) process; see there for the DC/AC statistical model
(T.81 F.1.4.4.1). Reference parity target: the reference repo has no
codec layer at all (its pipeline is 440 lines of pandas/API glue) —
this exists for the multimodal decode surface the driver gates with
pixel CRCs.
"""

from __future__ import annotations

# T.81 Table D.3: (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS)
# for the 113 adaptive states, plus the fixed ~0.5 estimate at index
# 113 (never transitions; JPEG uses it for AC sign decisions).
QE_TABLE: list[tuple[int, int, int, int]] = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # fixed ~0.5 estimate (AC sign)
]

FIXED_BIN = 113


class QMEncoder:
    """T.81 D.1 encoder. ``encode(stats, i, d)`` codes binary decision
    ``d`` under context ``stats[i]``; ``flush()`` terminates the
    stream (D.1.8: point C inside the final interval, push out the
    remaining register bits) and returns the stuffed byte string."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()
        self._b = -1  # pending byte (-1: none yet)
        self._sc = 0  # stacked 0xFF bytes awaiting carry resolution

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        sv = stats[i]
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return  # short MPS path: no renorm, no adaptation
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:  # no exchange: LPS is the top subinterval
                self.c += self.a
                self.a = qe
            if sw:
                mps ^= 1
            stats[i] = (mps << 7) | nlps
        self._renorm()

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the pending byte and converts every
            # stacked 0xFF into 0x00 (D.1.6)
            self._b += 1
            self._emit(self._b)
            for _ in range(self._sc):
                self._emit(0x00)
            self._sc = 0
            self._b = t & 0xFF
        elif t == 0xFF:
            self._sc += 1  # defer: a later carry may still convert it
        else:
            if self._b >= 0:
                self._emit(self._b)
            for _ in range(self._sc):
                self._emit(0xFF)
            self._sc = 0
            self._b = t
        self.c &= 0x7FFFF

    def _emit(self, byte: int) -> None:
        self.out.append(byte)
        if byte == 0xFF:
            self.out.append(0x00)  # marker transparency stuffing

    def flush(self) -> bytes:
        # D.1.8 CLEARBITS: choose the largest-trailing-zeros point in
        # [C, C + A)
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        # push out the remaining 16 code bits through the byte stage
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self._b >= 0:
            self._emit(self._b)
        for _ in range(self._sc):
            self._emit(0xFF)
        self._b, self._sc = -1, 0
        return bytes(self.out)


class QMDecoder:
    """T.81 D.2 decoder, fed the entropy-coded segment bytes. With
    ``stuffed=True`` (the default) byte un-stuffing mirrors the
    encoder and a marker (0xFF not followed by 0x00) ends the data;
    pass ``stuffed=False`` for input that has already been un-stuffed
    and de-markered (the JPEG decoder's ECS splitter does both). On
    reaching the end it feeds zero bytes forever, so truncated
    streams decode deterministically instead of raising."""

    def __init__(self, data: bytes, stuffed: bool = True) -> None:
        self.data = data
        self.pos = 0
        self.stuffed = stuffed
        self._done = False
        # load the first 16 code bits into the comparison window
        # (bits 16..31 of C); CT counts unconsumed bits staged below
        self.c = (self._next() << 24) | (self._next() << 16)
        self.ct = 0
        self.a = 0x10000

    def _next(self) -> int:
        if self._done or self.pos >= len(self.data):
            self._done = True
            return 0
        b = self.data[self.pos]
        if b == 0xFF and self.stuffed:
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos + 1] == 0x00
            ):
                self.pos += 2
                return 0xFF
            self._done = True  # marker: stop consuming, feed zeros
            return 0
        self.pos += 1
        return b

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if (self.c >> 16) < self.a:
            # code value in the bottom subinterval
            if self.a & 0x8000:
                return mps  # short MPS path
            if self.a < qe:  # exchanged: bottom belongs to the LPS
                d = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:  # exchanged: top belongs to the MPS
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
            self.a = qe
        self._renorm()
        return d

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self.c += self._next() << 8
                self.ct = 8
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
