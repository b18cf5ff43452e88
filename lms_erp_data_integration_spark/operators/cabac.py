"""CABAC entropy coding for the from-scratch H.264 decoder
(``h264.py``) — ITU-T H.264 clause 9.3, I/P/B slices.

Implements the full arithmetic coding ENGINE (9.3.3.2 decoding,
9.3.4 encoding: 510-range M-coder, 64-state probability ladder, LPS
range table, bypass and terminate modes, renormalization with
outstanding-bit carry resolution) and the SYNTAX layer
(9.3.2/9.3.3.1): mb_type binarization with neighbour contexts,
prev/rem intra-4x4 pred modes, intra_chroma_pred_mode TU,
coded_block_pattern with per-8x8 neighbour contexts, mb_qp_delta
unary, and residual_block_cabac for block categories 0-4
(coded_block_flag neighbour rules — including the inter availability
rule — significance + last-significance maps, UEG0 level binarization
with the Gt1/Eq1 context ladder, bypass signs), plus per-MB
end_of_slice terminate bins. P/B slices (r14): per-MB mb_skip_flag
with neighbour conditions, the P and B mb_type trees (intra-in-P/B
through a shared suffix context block), unary ref_idx with the
refIdx>0 neighbour increment, and UEG3 mvd (TU prefix over
|mvd|-sum-conditioned contexts, EG3 bypass suffix, bypass sign) over
the SAME motion compensation / weighting / reconstruction the CAVLC
P/B decoder uses. Supported inter shapes mirror CAVLC exactly:
P_Skip, P_L0_16x16/16x8/8x16, intra-in-P, B_L0/L1/Bi_16x16,
intra-in-B; P_8x8, B_Direct/B_Skip and B partitions reject cleanly.
Both directions are implemented — ``decode_islice_cabac`` /
``decode_pbslice_cabac`` and the closed-loop fixture encoder
``encode_h264_annexb_cabac`` (all-intra, IPP, IBP GOPs) — sharing
every context-index computation, so encoder reconstruction equals
decoder output bit-for-bit (the CAVLC / FLAC fixture pattern).

CONFORMANCE BOUNDARY (read this before pointing the decoder at
external streams): the spec's context INITIALIZATION tables (Tables
9-12..9-23, ~270 (m, n) pairs) could not be transcribed with
verifiable accuracy in this container (no spec text, no conformance
vectors, and no codec source ships here), and CABAC is adaptive
arithmetic coding — a single wrong init value decodes external
streams into silently WRONG pixels with no detectable syntax error,
violating the decoder family's reject-cleanly contract. This module
therefore uses a documented uniform initialization (every context
starts at state 0 / MPS 0 — ``_init_states`` is the single swap
point for a verified table) and the Annex B entry points accept
CABAC only when the stream carries this encoder's
user_data_unregistered SEI marker (``CABAC_SEI_UUID``), i.e. when
the stream is known to share these init tables. External CABAC
streams keep rejecting cleanly (None) exactly as before. The engine,
binarizations, context SELECTION logic, and neighbour rules are the
spec's; swapping in a verified init table is a 270-constant data
change, not a code change.

The LPS range / state transition tables below are engine-internal
shared constants: encoder and decoder use the same table object, so
round-trip exactness holds independently of table values (tests also
pin the structural invariants: monotone columns, 2..240 bounds,
state-63 floor).
"""

from __future__ import annotations

import numpy as np

from . import h264 as H

# 16-byte user_data_unregistered SEI UUID marking streams produced by
# encode_h264_annexb_cabac (shared context-init contract, see module
# docstring).
CABAC_SEI_UUID = b"LMS-SPARK-CABAC1"

# ----------------------------------------------------------- engine
#
# rangeTabLPS (64 states x 4 range quartiles) and the LPS state
# transition, per the public spec's table layout (state 0 row
# 128/176/208/240 decaying ~0.949 per state to the state-63 floor of
# 2). MPS transition is min(state + 1, 62); state 63 is absorbing.

_LPS = np.array([
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9],
    [2, 2, 2, 2],
], dtype=np.int64)

_TRANS_LPS = np.array([
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
], dtype=np.int64)

# 0..275 adaptive I-slice layout; 276 terminate pseudo-context;
# 277..323 the r14 P/B blocks (skip, P/B mb_type, intra-in-P/B
# suffix, ref_idx, mvd x/y, P sub_mb_type) — appended so pre-existing
# indices (and therefore the r13 all-intra fixture bitstreams) are
# unchanged
_N_CTX = 324


def _init_states() -> tuple[np.ndarray, np.ndarray]:
    """Uniform context init (state 0, MPS 0) — the single swap point
    for a verified spec init table (see module docstring)."""
    return (np.zeros(_N_CTX, dtype=np.int64),
            np.zeros(_N_CTX, dtype=np.int64))


class _CabacDec:
    """Arithmetic decoding engine (9.3.3.2)."""

    __slots__ = ("b", "range", "offset", "state", "mps")

    def __init__(self, bits: "H._Bits") -> None:
        self.b = bits
        self.range = 510
        self.offset = bits.u(9)
        self.state, self.mps = _init_states()

    def _bit(self) -> int:
        # A conformant stream may let the decoder renorm a few bits
        # past the flush; those reads are zeros by rbsp convention.
        try:
            return self.b.u(1)
        except EOFError:
            return 0

    def decision(self, ctx: int) -> int:
        st = int(self.state[ctx])
        q = int(_LPS[st, (self.range >> 6) & 3])
        self.range -= q
        if self.offset >= self.range:
            binv = 1 - int(self.mps[ctx])
            self.offset -= self.range
            self.range = q
            if st == 0:
                self.mps[ctx] ^= 1
            self.state[ctx] = _TRANS_LPS[st]
        else:
            binv = int(self.mps[ctx])
            if st < 62:
                self.state[ctx] = st + 1
        while self.range < 256:
            self.range <<= 1
            self.offset = ((self.offset << 1) | self._bit()) & 0x3FFFF
        return binv

    def bypass(self) -> int:
        self.offset = ((self.offset << 1) | self._bit()) & 0x3FFFF
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = ((self.offset << 1) | self._bit()) & 0x3FFFF
        return 0

    def restart(self) -> None:
        """Re-initialize the arithmetic engine mid-slice (9.3.1.2,
        after I_PCM raw samples): fresh range/offset from the
        now-byte-aligned reader; CONTEXT state persists — contexts
        are initialized once per slice, not per engine restart.
        Empirical invariant the PCM escape relies on (pinned by
        test_cabac_flush_resync_boundary): after ``terminate()``
        returns 1 the reader sits exactly at the encoder's pre-
        padding flush boundary, so skipping to the next byte edge
        aligns both sides bit-for-bit."""
        self.range = 510
        self.offset = self.b.u(9)


class _CabacEnc:
    """Arithmetic encoding engine (9.3.4) writing into an
    ``h264._BitWriter`` (after the byte-aligned slice header)."""

    __slots__ = ("w", "low", "range", "outstanding", "first",
                 "state", "mps")

    def __init__(self, w: "H._BitWriter") -> None:
        self.w = w
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True
        self.state, self.mps = _init_states()

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False  # spec PutBit discards the first bit
        else:
            self.w.u(1, b)
        while self.outstanding:
            self.w.u(1, 1 - b)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.range <<= 1
            self.low <<= 1

    def decision(self, ctx: int, binv: int) -> None:
        st = int(self.state[ctx])
        q = int(_LPS[st, (self.range >> 6) & 3])
        self.range -= q
        if binv != int(self.mps[ctx]):
            self.low += self.range
            self.range = q
            if st == 0:
                self.mps[ctx] ^= 1
            self.state[ctx] = _TRANS_LPS[st]
        elif st < 62:
            self.state[ctx] = st + 1
        self._renorm()

    def bypass(self, binv: int) -> None:
        self.low <<= 1
        if binv:
            self.low += self.range
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, binv: int) -> None:
        self.range -= 2
        if binv:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._put((self.low >> 9) & 1)
            # final two bits carry the rbsp_stop_one_bit
            self.w.u(2, ((self.low >> 7) & 3) | 1)
            self.w.byte_align_zero()
        else:
            self._renorm()

    def restart(self) -> None:
        """Encoder twin of ``_CabacDec.restart`` (9.3.1.2): fresh
        arithmetic registers after the byte-aligned I_PCM escape;
        context state persists."""
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True


# --------------------------------------------------- context indices

_CTX_MB_TYPE_I = 3        # +inc 0..2; suffix bins +3..+7 -> 6..10
_CTX_QP_DELTA = 60        # bin0 60+inc; bin1 62; rest 63
_CTX_CHROMA_PRED = 64     # bin0 64+inc; bins 1-2: 67
_CTX_PREV_I4 = 68
_CTX_REM_I4 = 69
_CTX_CBP_LUMA = 73        # +inc 0..3
_CTX_CBP_CHROMA = 77      # bin0 77+inc; bin1 81+inc
_CTX_CBF = 85             # + cat offset + inc 0..3
_CBF_CAT_OFF = (0, 4, 8, 12, 16)
_CTX_SIG = 105            # + cat offset + scan-pos inc
_SIG_CAT_OFF = (0, 15, 29, 44, 47)
_CTX_LAST = 166           # + cat offset + scan-pos inc
_CTX_ABS = 227            # + cat offset + Gt1/Eq1 ladder inc
_ABS_CAT_OFF = (0, 10, 20, 30, 39)
_CTX_TERMINATE = 276

# P/B context blocks (r14) — appended ABOVE the I-slice layout so every
# pre-existing index keeps its value and the r13 all-intra fixtures
# decode bit-identically. Context-index layout notes (closed-loop
# contract, same as the init tables — see the module docstring): the
# SELECTION structure below follows the spec's (which syntax element
# gets neighbour-conditioned increments, which bins share a context);
# where the spec conditions a bin's increment on an earlier bin value,
# the polarity used here is documented inline and is a fixed shared
# choice between this encoder and decoder.
_CTX_SKIP_P = 277     # mb_skip_flag, P: +inc 0..2 (avail && !skip)
_CTX_SKIP_B = 280     # mb_skip_flag, B: +inc 0..2
_CTX_MB_TYPE_P = 283  # bin0 +0; bin1 +1; bin2 +2 (bin1=1) / +3
_CTX_MB_TYPE_B = 287  # bin0 +inc 0..2; bin1 +3; bin2 +4; bins>=3 +5
_CTX_MB_TYPE_PB_I = 293  # intra-in-P/B suffix tree: same layout as
#                          _CTX_MB_TYPE_I but bin0 fixed (+0), suffix
#                          bins +3..+7
_CTX_REF_IDX = 301    # bin0 +inc 0..3 (condA + 2*condB); bin1 +4;
#                       bins>=2 +5
_CTX_MVD_X = 307      # bin0 +inc 0..2 (|mvd| nb sum); bins 1..3
#                       +3..+5; bins>=4 +6; EG3 suffix + sign bypass
_CTX_MVD_Y = 314
_CTX_SUB_MB_P = 321  # P sub_mb_type: bin0 +0, bin1 +1, bin2 +2

# residual block categories
_CAT_LUMA_DC = 0
_CAT_LUMA_AC = 1
_CAT_LUMA_4X4 = 2
_CAT_CHROMA_DC = 3
_CAT_CHROMA_AC = 4
_CAT_MAXCOEFF = (16, 15, 16, 4, 15)


class _CState:
    """Per-picture CABAC neighbour state (decoder and encoder walk
    MBs in the same order, so both sides maintain identical copies)."""

    def __init__(self, wmb: int, hmb: int) -> None:
        self.mb_done = np.zeros((hmb, wmb), dtype=bool)
        self.is_i4 = np.zeros((hmb, wmb), dtype=np.int8)
        self.cbp_luma = np.zeros((hmb, wmb), dtype=np.int16)
        self.cbp_chroma = np.zeros((hmb, wmb), dtype=np.int16)
        self.chroma_mode = np.zeros((hmb, wmb), dtype=np.int8)
        self.cbf_ydc = np.zeros((hmb, wmb), dtype=np.int8)
        self.is_i16 = np.zeros((hmb, wmb), dtype=bool)
        self.cbf_y4 = np.zeros((4 * hmb, 4 * wmb), dtype=np.int8)
        self.cbf_cdc = np.zeros((hmb, wmb, 2), dtype=np.int8)
        self.cbf_c4 = np.zeros((2 * hmb, 2 * wmb, 2), dtype=np.int8)
        self.prev_qp_delta_nz = 0  # previous MB in decoding order
        # P/B state (r14): skip flags for the mb_skip/B-mb_type
        # neighbour conditions, and per-4x4 |mvd| per (list, comp)
        # for the mvd bin-0 increments (intra/skip/unused-list spans
        # stay 0, which is the spec's contribution for them)
        self.skip = np.zeros((hmb, wmb), dtype=np.int8)
        # |mvd| clipped to 33: _mvd_inc only tests < 3 and <= 32, so
        # the clip preserves every increment exactly while keeping
        # the per-picture state uint8 (r14 review: full-resolution
        # int64 was ~17 MB per 1080p picture for no information)
        self.mvd_abs = np.zeros((4 * hmb, 4 * wmb, 2, 2),
                                dtype=np.uint8)


def _cstate(fr: "H._Frame") -> _CState:
    cs = getattr(fr, "_cabac_state", None)
    if cs is None:
        cs = _CState(fr.wmb, fr.hmb)
        fr._cabac_state = cs
    return cs


def _mb_avail(cs: _CState, fr: "H._Frame", sid: int,
              mbx: int, mby: int) -> bool:
    if mbx < 0 or mby < 0 or mbx >= cs.mb_done.shape[1] \
            or mby >= cs.mb_done.shape[0]:
        return False
    return bool(cs.mb_done[mby, mbx]) and \
        int(fr.slice_of_mb[mby, mbx]) == sid


def _mb_type_inc(cs, fr, sid, mbx, mby) -> int:
    inc = 0
    for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
        if _mb_avail(cs, fr, sid, nx, ny) and not cs.is_i4[ny, nx]:
            inc += 1
    return inc


def _chroma_pred_inc(cs, fr, sid, mbx, mby) -> int:
    inc = 0
    for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
        if _mb_avail(cs, fr, sid, nx, ny) and cs.chroma_mode[ny, nx]:
            inc += 1
    return inc


# left / up neighbour of a luma 8x8 CBP block: (mb dx, mb dy, idx)
_CBP8_LEFT = ((-1, 0, 1), (0, 0, 0), (-1, 0, 3), (0, 0, 2))
_CBP8_UP = ((0, -1, 2), (0, -1, 3), (0, 0, 0), (0, 0, 1))


def _cbp_luma_inc(cs, fr, sid, mbx, mby, idx8, partial_cbp) -> int:
    """condTermFlag per 8x8 neighbour: 1 when the neighbour's CBP bit
    is ZERO (inverted), 0 when the neighbour is unavailable. Within-MB
    neighbours read the prior decoded bins (partial_cbp)."""
    inc = 0
    for w8, (dx, dy, nidx) in ((1, _CBP8_LEFT[idx8]),
                               (2, _CBP8_UP[idx8])):
        if dx == 0 and dy == 0:
            bit = (partial_cbp >> nidx) & 1
            inc += w8 * (0 if bit else 1)
        else:
            nx, ny = mbx + dx, mby + dy
            if _mb_avail(cs, fr, sid, nx, ny):
                bit = (int(cs.cbp_luma[ny, nx]) >> nidx) & 1
                inc += w8 * (0 if bit else 1)
    return inc


def _cbp_chroma_inc(cs, fr, sid, mbx, mby, stage) -> int:
    inc = 0
    for w8, (nx, ny) in ((1, (mbx - 1, mby)), (2, (mbx, mby - 1))):
        if _mb_avail(cs, fr, sid, nx, ny):
            c = int(cs.cbp_chroma[ny, nx])
            inc += w8 * (1 if (c == 2 if stage else c != 0) else 0)
    return inc


def _cbf_inc(cs, fr, sid, cat, mbx, mby, comp, bx, by,
             cur_intra: bool = True) -> int:
    """coded_block_flag ctxIdxInc = condA + 2*condB. Neighbour
    unavailable MB -> 1 when the CURRENT MB is intra, 0 when inter
    (9.3.3.1.1.9's availability rule); available MB without that
    residual block (including skipped MBs) -> 0 (arrays default 0);
    else the stored flag. (bx, by): absolute 4x4 block coords for
    cats 1/2/4; ignored for the DC cats."""
    unavail = 1 if cur_intra else 0
    inc = 0
    for w8, (dx, dy) in ((1, (-1, 0)), (2, (0, -1))):
        if cat in (_CAT_LUMA_DC, _CAT_CHROMA_DC):
            nx, ny = mbx + dx, mby + dy
            if not _mb_avail(cs, fr, sid, nx, ny):
                inc += w8 * unavail
            elif cat == _CAT_LUMA_DC:
                # DC block exists only in Intra_16x16 neighbours
                if cs.is_i16[ny, nx]:
                    inc += w8 * int(cs.cbf_ydc[ny, nx])
            else:
                inc += w8 * int(cs.cbf_cdc[ny, nx, comp])
        else:
            nbx, nby = bx + dx, by + dy
            arr = cs.cbf_c4[..., comp] if cat == _CAT_CHROMA_AC \
                else cs.cbf_y4
            scale = 2 if cat == _CAT_CHROMA_AC else 4
            if nbx < 0 or nby < 0:
                inc += w8 * unavail  # outside the picture
                continue
            nmx, nmy = nbx // scale, nby // scale
            if not _mb_avail(cs, fr, sid, nmx, nmy) and \
                    not (nmx == mbx and nmy == mby):
                inc += w8 * unavail
            else:
                inc += w8 * int(arr[nby, nbx])
    return inc


def _skip_inc(cs, fr, sid, mbx, mby) -> int:
    """mb_skip_flag / B-mb_type bin-0 increment: condTermFlag per
    neighbour is 1 when the neighbour exists in this slice and is not
    skipped (no B_Direct MBs are ever decoded here, so "not direct"
    folds into "not skipped")."""
    inc = 0
    for nx, ny in ((mbx - 1, mby), (mbx, mby - 1)):
        if _mb_avail(cs, fr, sid, nx, ny) and not cs.skip[ny, nx]:
            inc += 1
    return inc


def _ref_idx_inc(cs, fr, sid, bx, by) -> int:
    """ref_idx bin-0 increment condA + 2*condB: cond is 1 when the
    neighbouring 4x4 block belongs to a decoded same-slice MB and
    carries a list-0 refIdx > 0 (intra spans store -1, skip spans 0 —
    both contribute 0)."""
    inc = 0
    for w8, (nbx, nby) in ((1, (bx - 1, by)), (2, (bx, by - 1))):
        if nbx < 0 or nby < 0:
            continue
        nmx, nmy = nbx // 4, nby // 4
        same_mb = nmx == bx // 4 and nmy == by // 4
        if not same_mb and not _mb_avail(cs, fr, sid, nmx, nmy):
            continue
        if int(fr.ref4[nby, nbx]) > 0:
            inc += w8
    return inc


def _mvd_inc(cs, fr, sid, bx, by, lst, comp) -> int:
    """mvd bin-0 increment from the neighbouring 4x4 blocks' stored
    |mvd| sum (same list, same component): <3 -> 0, <=32 -> 1,
    else 2."""
    s = 0
    for nbx, nby in ((bx - 1, by), (bx, by - 1)):
        if nbx < 0 or nby < 0:
            continue
        nmx, nmy = nbx // 4, nby // 4
        same_mb = nmx == bx // 4 and nmy == by // 4
        if not same_mb and not _mb_avail(cs, fr, sid, nmx, nmy):
            continue
        s += int(cs.mvd_abs[nby, nbx, lst, comp])
    return 0 if s < 3 else (1 if s <= 32 else 2)


# ------------------------------------------------- residual (enc/dec)

def _sig_inc(cat: int, i: int) -> int:
    if cat == _CAT_CHROMA_DC:
        return min(i, 2)
    return i


def _abs_inc(cat: int, n_eq1: int, n_gt1: int, bin_idx: int) -> int:
    if bin_idx == 0:
        return 0 if n_gt1 else min(4, 1 + n_eq1)
    cap = 3 if cat == _CAT_CHROMA_DC else 4
    return 5 + min(cap, n_gt1)


def _decode_residual(dec: _CabacDec, cat: int, cbf_inc: int
                     ) -> list[int] | None:
    """Decode one residual block -> zig-zag level list (length
    maxNumCoeff) or None when coded_block_flag is 0."""
    if not dec.decision(_CTX_CBF + _CBF_CAT_OFF[cat] + cbf_inc):
        return None
    m = _CAT_MAXCOEFF[cat]
    sig = [0] * m
    i = 0
    while i < m - 1:
        if dec.decision(_CTX_SIG + _SIG_CAT_OFF[cat] + _sig_inc(cat, i)):
            sig[i] = 1
            if dec.decision(
                _CTX_LAST + _SIG_CAT_OFF[cat] + _sig_inc(cat, i)
            ):
                break
        i += 1
    else:
        sig[m - 1] = 1  # inferred: cbf == 1 guarantees a coefficient
    levels = [0] * m
    n_eq1 = n_gt1 = 0
    for pos in range(m - 1, -1, -1):
        if not sig[pos]:
            continue
        # UEG0: TU prefix (cMax 14) in context, EG0 suffix in bypass
        base = _CTX_ABS + _ABS_CAT_OFF[cat]
        v = 0
        while v < 14 and dec.decision(
            base + _abs_inc(cat, n_eq1, n_gt1, 0 if v == 0 else 1)
        ):
            v += 1
        if v == 14:
            k = 0
            while dec.bypass():
                v += 1 << k
                k += 1
            while k:
                k -= 1
                v += dec.bypass() << k
        if v == 0:
            n_eq1 += 1
        else:
            n_gt1 += 1
        level = v + 1
        if dec.bypass():
            level = -level
        levels[pos] = level
    return levels


def _encode_residual(enc: _CabacEnc, cat: int, cbf_inc: int,
                     levels: list[int] | None) -> int:
    """Encode one residual block (zig-zag levels, or None/all-zero for
    cbf 0). Returns the coded_block_flag actually emitted."""
    cbf = 1 if levels is not None and any(levels) else 0
    enc.decision(_CTX_CBF + _CBF_CAT_OFF[cat] + cbf_inc, cbf)
    if not cbf:
        return 0
    m = _CAT_MAXCOEFF[cat]
    assert levels is not None and len(levels) == m
    last_pos = max(i for i, v in enumerate(levels) if v)
    for i in range(min(last_pos + 1, m - 1)):
        s = 1 if levels[i] else 0
        enc.decision(
            _CTX_SIG + _SIG_CAT_OFF[cat] + _sig_inc(cat, i), s
        )
        if s:
            enc.decision(
                _CTX_LAST + _SIG_CAT_OFF[cat] + _sig_inc(cat, i),
                1 if i == last_pos else 0,
            )
    n_eq1 = n_gt1 = 0
    for pos in range(m - 1, -1, -1):
        lv = levels[pos]
        if not lv:
            continue
        v = abs(lv) - 1
        base = _CTX_ABS + _ABS_CAT_OFF[cat]
        for j in range(min(v, 14)):
            enc.decision(
                base + _abs_inc(cat, n_eq1, n_gt1, 0 if j == 0 else 1), 1
            )
        if v < 14:
            enc.decision(
                base + _abs_inc(cat, n_eq1, n_gt1, 0 if v == 0 else 1), 0
            )
        else:
            rem = v - 14
            k = 0
            while rem >= (1 << k):
                enc.bypass(1)
                rem -= 1 << k
                k += 1
            enc.bypass(0)
            while k:
                k -= 1
                enc.bypass((rem >> k) & 1)
        if v == 0:
            n_eq1 += 1
        else:
            n_gt1 += 1
        enc.bypass(1 if lv < 0 else 0)
    return 1


# -------------------------------------------- syntax elements (pairs)

def _decode_qp_delta(dec: _CabacDec, cs: _CState) -> int:
    k = 0
    while k < 53 and dec.decision(
        _CTX_QP_DELTA + (cs.prev_qp_delta_nz if k == 0
                         else (2 if k == 1 else 3))
    ):
        k += 1
    cs.prev_qp_delta_nz = 1 if k else 0
    return (k + 1) >> 1 if k & 1 else -(k >> 1)


def _encode_qp_delta(enc: _CabacEnc, cs: _CState, delta: int) -> None:
    k = 2 * delta - 1 if delta > 0 else -2 * delta
    for j in range(k):
        enc.decision(
            _CTX_QP_DELTA + (cs.prev_qp_delta_nz if j == 0
                             else (2 if j == 1 else 3)), 1
        )
    enc.decision(
        _CTX_QP_DELTA + (cs.prev_qp_delta_nz if k == 0
                         else (2 if k == 1 else 3)), 0
    )
    cs.prev_qp_delta_nz = 1 if k else 0


def _decode_chroma_pred(dec: _CabacDec, inc: int) -> int:
    v = 0
    while v < 3 and dec.decision(
        _CTX_CHROMA_PRED + (inc if v == 0 else 3)
    ):
        v += 1
    return v


def _encode_chroma_pred(enc: _CabacEnc, inc: int, mode: int) -> None:
    for j in range(mode):
        enc.decision(_CTX_CHROMA_PRED + (inc if j == 0 else 3), 1)
    if mode < 3:
        enc.decision(_CTX_CHROMA_PRED + (mode and 3 or inc), 0)


def _decode_cbp(dec: _CabacDec, cs, fr, sid, mbx, mby) -> tuple[int, int]:
    cbp_l = 0
    for idx8 in range(4):
        inc = _cbp_luma_inc(cs, fr, sid, mbx, mby, idx8, cbp_l)
        if dec.decision(_CTX_CBP_LUMA + inc):
            cbp_l |= 1 << idx8
    cbp_c = 0
    if dec.decision(
        _CTX_CBP_CHROMA + _cbp_chroma_inc(cs, fr, sid, mbx, mby, 0)
    ):
        cbp_c = 2 if dec.decision(
            _CTX_CBP_CHROMA + 4 + _cbp_chroma_inc(cs, fr, sid, mbx, mby, 1)
        ) else 1
    return cbp_l, cbp_c


def _encode_cbp(enc: _CabacEnc, cs, fr, sid, mbx, mby,
                cbp_l: int, cbp_c: int) -> None:
    part = 0
    for idx8 in range(4):
        inc = _cbp_luma_inc(cs, fr, sid, mbx, mby, idx8, part)
        bit = (cbp_l >> idx8) & 1
        enc.decision(_CTX_CBP_LUMA + inc, bit)
        part |= bit << idx8
    enc.decision(
        _CTX_CBP_CHROMA + _cbp_chroma_inc(cs, fr, sid, mbx, mby, 0),
        1 if cbp_c else 0,
    )
    if cbp_c:
        enc.decision(
            _CTX_CBP_CHROMA + 4
            + _cbp_chroma_inc(cs, fr, sid, mbx, mby, 1),
            1 if cbp_c == 2 else 0,
        )


def _i4_pred_for_block(fr, abx: int, aby: int, sid: int) -> int:
    """Most-probable intra-4x4 mode (8.3.1.1) — same rule as the CAVLC
    paths in ``h264._decode_mb`` / ``_i4_pred_mode_bits``."""
    def nb_mode(x: int, y: int) -> int:
        if x < 0 or y < 0:
            return -9
        if fr.slice_of_mb[y // 4, x // 4] != sid:
            return -9
        m = int(fr.i4_mode[y, x])
        return m if m >= 0 else 2
    a = nb_mode(abx - 1, aby)
    bm = nb_mode(abx, aby - 1)
    return 2 if (a == -9 or bm == -9) else min(a, bm)


# --------------------------------------------------------- MB decode

def _mark_ipcm_cs(cs, fr, mbx, mby, sid) -> None:
    """Shared I_PCM bookkeeping (encoder and decoder walk identical
    state): neighbours see an all-coded intra MB — cbf flags 1,
    CBP 15/2, nC 16 (9.3.3.1.1.9 treats I_PCM as coded; the CAVLC
    path's nc=16 rule is the same statement). chroma_mode is kept 0
    (documented closed-loop choice; no chroma pred mode exists for
    I_PCM). QP-delta accumulation resets; QPY for deblocking is 0,
    matching the CAVLC I_PCM path."""
    fr.slice_of_mb[mby, mbx] = sid
    fr.ref4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    fr.ref4b[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    fr.i4_mode[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    fr.nc_y[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = 16
    fr.nc_cb[mby * 2: mby * 2 + 2, mbx * 2: mbx * 2 + 2] = 16
    fr.nc_cr[mby * 2: mby * 2 + 2, mbx * 2: mbx * 2 + 2] = 16
    fr.done4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = True
    fr.qp_deblock[mby, mbx] = 0
    cs.is_i4[mby, mbx] = 0
    cs.is_i16[mby, mbx] = True  # LUMA_DC cbf inc reads cbf_ydc
    cs.cbf_ydc[mby, mbx] = 1
    cs.cbf_y4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = 1
    cs.cbf_cdc[mby, mbx, :] = 1
    cs.cbf_c4[mby * 2: mby * 2 + 2, mbx * 2: mbx * 2 + 2, :] = 1
    cs.cbp_luma[mby, mbx] = 15
    cs.cbp_chroma[mby, mbx] = 2
    cs.chroma_mode[mby, mbx] = 0
    cs.prev_qp_delta_nz = 0
    cs.mb_done[mby, mbx] = True


def _decode_ipcm_cabac(fr, dec: _CabacDec, cs, mbx, mby, qp, sid
                       ) -> int:
    b = dec.b
    while b.pos & 7:  # pcm alignment (flush stop bit + zero padding)
        b.u(1)
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    y = np.frombuffer(b.bytes_(256), dtype=np.uint8).reshape(16, 16)
    cb = np.frombuffer(b.bytes_(64), dtype=np.uint8).reshape(8, 8)
    cr = np.frombuffer(b.bytes_(64), dtype=np.uint8).reshape(8, 8)
    fr.y[oy: oy + 16, ox: ox + 16] = y
    fr.cb[cy: cy + 8, cx: cx + 8] = cb
    fr.cr[cy: cy + 8, cx: cx + 8] = cr
    _mark_ipcm_cs(cs, fr, mbx, mby, sid)
    dec.restart()
    return qp  # QPY_prev for the next MB's delta is unchanged


def _encode_mb_ipcm_cabac(fr, enc: _CabacEnc, mb_addr: int, qp: int,
                          y, cb, cr, sid: int = 0,
                          mbtype_base: int = _CTX_MB_TYPE_I,
                          mbtype_inc: bool = True) -> int:
    """I_PCM under CABAC: prefix bin 1 (not I_4x4), the terminate-
    class pcm flag = 1 (which IS the engine flush + byte alignment),
    raw source samples, engine restart — lossless by construction, so
    the closed-loop reconstruction is the source MB itself."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    inc0 = _mb_type_inc(cs, fr, sid, mbx, mby) if mbtype_inc else 0
    enc.decision(mbtype_base + inc0, 1)
    enc.terminate(1)  # pcm flag: flush + align
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    w = enc.w
    for row in y[oy: oy + 16, ox: ox + 16]:
        for v in row:
            w.u(8, int(v))
    for plane in (cb, cr):
        for row in plane[cy: cy + 8, cx: cx + 8]:
            for v in row:
                w.u(8, int(v))
    fr.y[oy: oy + 16, ox: ox + 16] = y[oy: oy + 16, ox: ox + 16]
    fr.cb[cy: cy + 8, cx: cx + 8] = cb[cy: cy + 8, cx: cx + 8]
    fr.cr[cy: cy + 8, cx: cx + 8] = cr[cy: cy + 8, cx: cx + 8]
    _mark_ipcm_cs(cs, fr, mbx, mby, sid)
    enc.restart()
    return qp


def _decode_mb_cabac(fr, dec: _CabacDec, mb_addr: int, qp: int,
                     pps: dict, sid: int,
                     mbtype_base: int = _CTX_MB_TYPE_I,
                     mbtype_inc: bool = True) -> int:
    """Decode one intra MB. Defaults decode the I-slice mb_type tree;
    intra-in-P/B callers pass the suffix context block
    (``_CTX_MB_TYPE_PB_I``, no neighbour increment on bin 0) after
    consuming the prefix bins — the body is otherwise identical."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    ox, oy = mbx * 16, mby * 16
    fr.ref4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    fr.ref4b[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1

    # ---- mb_type (I-slice binarization / intra suffix in P and B)
    inc0 = _mb_type_inc(cs, fr, sid, mbx, mby) if mbtype_inc else 0
    if not dec.decision(mbtype_base + inc0):
        mb_is_i4 = True
    else:
        if dec.terminate():
            # I_PCM (r14): the terminate-class pcm flag flushed the
            # engine; skip the alignment padding, read the raw MB
            # samples directly from the bitstream, then re-init the
            # arithmetic engine (contexts persist) — 9.3.1.2
            return _decode_ipcm_cabac(fr, dec, cs, mbx, mby, qp, sid)
        mb_is_i4 = False
        b_cbp_l = dec.decision(mbtype_base + 3)
        cbp_c = 0
        if dec.decision(mbtype_base + 4):
            cbp_c = 2 if dec.decision(mbtype_base + 5) else 1
        pred_mode = (dec.decision(mbtype_base + 6) << 1) | \
            dec.decision(mbtype_base + 7)
        cbp_l = 15 if b_cbp_l else 0
    cs.is_i4[mby, mbx] = 1 if mb_is_i4 else 0
    cs.is_i16[mby, mbx] = not mb_is_i4

    if mb_is_i4:
        i4_modes: list[int] = []
        for blk in range(16):
            bx4, by4 = H._BLK_POS[blk]
            abx, aby = mbx * 4 + bx4, mby * 4 + by4
            pred = _i4_pred_for_block(fr, abx, aby, sid)
            if dec.decision(_CTX_PREV_I4):
                mode = pred
            else:
                rem = (dec.decision(_CTX_REM_I4)
                       | (dec.decision(_CTX_REM_I4) << 1)
                       | (dec.decision(_CTX_REM_I4) << 2))
                mode = rem if rem < pred else rem + 1
            i4_modes.append(mode)
            fr.i4_mode[aby, abx] = mode
        chroma_mode = _decode_chroma_pred(
            dec, _chroma_pred_inc(cs, fr, sid, mbx, mby)
        )
        cbp_l, cbp_c = _decode_cbp(dec, cs, fr, sid, mbx, mby)
    else:
        fr.i4_mode[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
        chroma_mode = _decode_chroma_pred(
            dec, _chroma_pred_inc(cs, fr, sid, mbx, mby)
        )
    cs.chroma_mode[mby, mbx] = chroma_mode
    cs.cbp_luma[mby, mbx] = cbp_l
    cs.cbp_chroma[mby, mbx] = cbp_c

    if (not mb_is_i4) or (cbp_l | cbp_c):
        qp = (qp + _decode_qp_delta(dec, cs) + 52) % 52
    else:
        cs.prev_qp_delta_nz = 0
    fr.qp_deblock[mby, mbx] = qp

    # ---- residuals
    dc_levels = None
    if not mb_is_i4:
        dc_levels = _decode_residual(
            dec, _CAT_LUMA_DC,
            _cbf_inc(cs, fr, sid, _CAT_LUMA_DC, mbx, mby, 0, 0, 0),
        )
        cs.cbf_ydc[mby, mbx] = 1 if dc_levels else 0
    luma_blocks: list[np.ndarray] = []
    cat = _CAT_LUMA_4X4 if mb_is_i4 else _CAT_LUMA_AC
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_l & (1 << (blk >> 2)):
            lv = _decode_residual(
                dec, cat,
                _cbf_inc(cs, fr, sid, cat, mbx, mby, 0, abx, aby),
            )
            cs.cbf_y4[aby, abx] = 1 if lv else 0
            if lv is None:
                lv = [0] * _CAT_MAXCOEFF[cat]
            if cat == _CAT_LUMA_AC:
                lv = [0] + lv
            luma_blocks.append(H._zig_to_nat(lv))
            fr.nc_y[aby, abx] = int(np.count_nonzero(luma_blocks[-1]))
        else:
            cs.cbf_y4[aby, abx] = 0
            fr.nc_y[aby, abx] = 0
            luma_blocks.append(np.zeros((4, 4), dtype=np.int64))
    dc_cb = dc_cr = [0, 0, 0, 0]
    ac_cb: list[np.ndarray] = []
    ac_cr: list[np.ndarray] = []
    if cbp_c:
        dcs = []
        for comp in range(2):
            lv = _decode_residual(
                dec, _CAT_CHROMA_DC,
                _cbf_inc(cs, fr, sid, _CAT_CHROMA_DC, mbx, mby, comp,
                         0, 0),
            )
            cs.cbf_cdc[mby, mbx, comp] = 1 if lv else 0
            dcs.append(lv if lv else [0, 0, 0, 0])
        dc_cb, dc_cr = dcs
    for comp, (nc_map, sink) in enumerate(
        ((fr.nc_cb, ac_cb), (fr.nc_cr, ac_cr))
    ):
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            abx, aby = mbx * 2 + bx2, mby * 2 + by2
            if cbp_c == 2:
                lv = _decode_residual(
                    dec, _CAT_CHROMA_AC,
                    _cbf_inc(cs, fr, sid, _CAT_CHROMA_AC, mbx, mby,
                             comp, abx, aby),
                )
                cs.cbf_c4[aby, abx, comp] = 1 if lv else 0
                mat = H._zig_to_nat([0] + lv) if lv else \
                    np.zeros((4, 4), dtype=np.int64)
                nc_map[aby, abx] = int(np.count_nonzero(mat))
            else:
                cs.cbf_c4[aby, abx, comp] = 0
                nc_map[aby, abx] = 0
                mat = np.zeros((4, 4), dtype=np.int64)
            sink.append(mat)

    # ---- reconstruct (identical to the CAVLC paths)
    if mb_is_i4:
        for blk in range(16):
            bx4, by4 = H._BLK_POS[blk]
            px, py = ox + bx4 * 4, oy + by4 * 4
            t, l, c = H._luma_neighbors(
                fr, px, py, 4, sid, fr.y, fr.done4, 4
            )
            pred = H._pred4x4(i4_modes[blk], t, l, c)
            if luma_blocks[blk].any():
                res = H._itransform4x4(
                    H._dequant4x4(luma_blocks[blk], qp, skip_dc=False)
                )
            else:
                res = 0
            fr.y[py: py + 4, px: px + 4] = H._clip8(pred + res)
            fr.done4[py // 4, px // 4] = True
    else:
        t, l, c = H._luma_neighbors(
            fr, ox, oy, 16, sid, fr.y, fr.done4, 4
        )
        pred = H._pred16x16(pred_mode, t, l, c)
        dc_nat = H._zig_to_nat(dc_levels if dc_levels else [0] * 16)
        dc_scaled = H._scale_luma_dc(H._ihadamard4(dc_nat), qp)
        recon = np.empty((16, 16), dtype=np.int64)
        for blk in range(16):
            bx4, by4 = H._BLK_POS[blk]
            d = H._dequant4x4(luma_blocks[blk], qp, skip_dc=True)
            d[0, 0] = dc_scaled[by4, bx4]
            res = H._itransform4x4(d)
            recon[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] = (
                pred[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] + res
            )
        fr.y[oy: oy + 16, ox: ox + 16] = H._clip8(recon)
        fr.done4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = True
    H._reconstruct_chroma(
        fr, mbx, mby, chroma_mode, qp, pps, list(dc_cb), list(dc_cr),
        ac_cb, ac_cr, sid,
    )
    cs.mb_done[mby, mbx] = True
    return qp


def decode_islice_cabac(fr, b: "H._Bits", pps: dict, qp: int,
                        sid: int, first_mb: int) -> None:
    """CABAC I-slice data: alignment, engine init, MB loop with
    end_of_slice_flag terminate bins (9.3.3.2.4)."""
    # cabac_alignment_one_bit(s): header ends on '1' bits to the byte
    while b.pos & 7:
        if b.u(1) != 1:
            raise ValueError("bad cabac_alignment_one_bit")
    dec = _CabacDec(b)
    n_mbs = fr.wmb * fr.hmb
    for mb_addr in range(first_mb, n_mbs):
        qp = _decode_mb_cabac(fr, dec, mb_addr, qp, pps, sid)
        if dec.terminate():  # end_of_slice_flag
            break


# ------------------------------------------------ P/B syntax (r14)
#
# The inter entropy layer over the SAME prediction/reconstruction
# machinery the CAVLC P/B decoder uses (h264.py: _mv_pred, _skip_mv,
# _partition_mc, _wp_planes, _reconstruct_chroma): per-MB mb_skip_flag
# (no mb_skip_run under CABAC), P/B mb_type trees, unary ref_idx, UEG3
# mvd with |mvd|-sum neighbour increments, and the shared CBP/qp/
# residual tail with the inter coded_block_flag availability rule.
# Supported surface mirrors CAVLC exactly: P_Skip, P_L0_16x16,
# P_L0_L0_16x8, P_L0_L0_8x16, intra-in-P; B_L0_16x16, B_L1_16x16,
# B_Bi_16x16, intra-in-B. P_8x8, B_Direct/B_Skip and B partitions
# reject cleanly, as in the CAVLC paths.

_MVD_UCOFF = 9  # UEG3 prefix cutoff


def _decode_mvd(dec: _CabacDec, cs, fr, sid, bx, by, lst, comp) -> int:
    base = _CTX_MVD_X if comp == 0 else _CTX_MVD_Y
    if not dec.decision(base + _mvd_inc(cs, fr, sid, bx, by, lst,
                                        comp)):
        return 0
    v = 1
    while v < _MVD_UCOFF and \
            dec.decision(base + 3 + min(v - 1, 3)):
        v += 1
    if v == _MVD_UCOFF:  # EG3 suffix, bypass
        k = 3
        while dec.bypass():
            v += 1 << k
            k += 1
        while k:
            k -= 1
            v += dec.bypass() << k
    return -v if dec.bypass() else v


def _encode_mvd(enc: _CabacEnc, cs, fr, sid, bx, by, lst, comp,
                mvd: int) -> None:
    base = _CTX_MVD_X if comp == 0 else _CTX_MVD_Y
    inc = _mvd_inc(cs, fr, sid, bx, by, lst, comp)
    a = abs(mvd)
    if a == 0:
        enc.decision(base + inc, 0)
        return
    enc.decision(base + inc, 1)
    for v in range(1, min(a, _MVD_UCOFF)):
        enc.decision(base + 3 + min(v - 1, 3), 1)
    if a < _MVD_UCOFF:
        enc.decision(base + 3 + min(a - 1, 3), 0)
    else:  # EG3 suffix
        rem = a - _MVD_UCOFF
        k = 3
        while rem >= (1 << k):
            enc.bypass(1)
            rem -= 1 << k
            k += 1
        enc.bypass(0)
        while k:
            k -= 1
            enc.bypass((rem >> k) & 1)
    enc.bypass(1 if mvd < 0 else 0)


def _decode_ref_idx(dec: _CabacDec, cs, fr, sid, bx, by,
                    n_active: int) -> int:
    if n_active == 1:
        return 0
    if not dec.decision(_CTX_REF_IDX + _ref_idx_inc(cs, fr, sid,
                                                    bx, by)):
        return 0
    v = 1
    while dec.decision(_CTX_REF_IDX + (4 if v == 1 else 5)):
        v += 1
        if v >= 32:
            raise ValueError("runaway ref_idx")
    if v >= n_active:
        raise ValueError("ref_idx out of range")
    return v


def _encode_ref_idx(enc: _CabacEnc, cs, fr, sid, bx, by,
                    n_active: int, ri: int) -> None:
    if n_active == 1:
        return
    inc = _ref_idx_inc(cs, fr, sid, bx, by)
    if ri == 0:
        enc.decision(_CTX_REF_IDX + inc, 0)
        return
    enc.decision(_CTX_REF_IDX + inc, 1)
    for v in range(1, ri):
        enc.decision(_CTX_REF_IDX + (4 if v == 1 else 5), 1)
    enc.decision(_CTX_REF_IDX + (4 if ri == 1 else 5), 0)


def _mark_inter_cs(cs, mbx, mby, cbp_l, cbp_c) -> None:
    cs.is_i4[mby, mbx] = 0
    cs.is_i16[mby, mbx] = False
    cs.chroma_mode[mby, mbx] = 0
    cs.cbp_luma[mby, mbx] = cbp_l
    cs.cbp_chroma[mby, mbx] = cbp_c
    cs.mb_done[mby, mbx] = True


def _mark_skip_cs(cs, mbx, mby) -> None:
    cs.skip[mby, mbx] = 1
    cs.prev_qp_delta_nz = 0
    _mark_inter_cs(cs, mbx, mby, 0, 0)


def _inter_residual_recon_cabac(fr, dec: _CabacDec, cs, mbx, mby,
                                qp, pps, sid, pred_y, pred_cb,
                                pred_cr) -> int:
    """CABAC twin of h264._inter_residual_recon: CBP bins (same tree
    as intra — CABAC has no Table 9-4 me(v) mapping), optional
    mb_qp_delta, residual blocks with the inter coded_block_flag
    availability rule, reconstruction over the MC prediction."""
    ox, oy = mbx * 16, mby * 16
    cbp_l, cbp_c = _decode_cbp(dec, cs, fr, sid, mbx, mby)
    if cbp_l | cbp_c:
        qp = (qp + _decode_qp_delta(dec, cs) + 52) % 52
    else:
        cs.prev_qp_delta_nz = 0
    fr.qp_deblock[mby, mbx] = qp
    fr.i4_mode[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    luma_blocks: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_l & (1 << (blk >> 2)):
            lv = _decode_residual(
                dec, _CAT_LUMA_4X4,
                _cbf_inc(cs, fr, sid, _CAT_LUMA_4X4, mbx, mby, 0,
                         abx, aby, cur_intra=False),
            )
            cs.cbf_y4[aby, abx] = 1 if lv else 0
            mat = H._zig_to_nat(lv) if lv else \
                np.zeros((4, 4), dtype=np.int64)
            luma_blocks.append(mat)
            fr.nc_y[aby, abx] = int(np.count_nonzero(mat))
        else:
            cs.cbf_y4[aby, abx] = 0
            fr.nc_y[aby, abx] = 0
            luma_blocks.append(np.zeros((4, 4), dtype=np.int64))
    dc_cb = dc_cr = [0, 0, 0, 0]
    ac_cb: list[np.ndarray] = []
    ac_cr: list[np.ndarray] = []
    if cbp_c:
        dcs = []
        for comp in range(2):
            lv = _decode_residual(
                dec, _CAT_CHROMA_DC,
                _cbf_inc(cs, fr, sid, _CAT_CHROMA_DC, mbx, mby, comp,
                         0, 0, cur_intra=False),
            )
            cs.cbf_cdc[mby, mbx, comp] = 1 if lv else 0
            dcs.append(lv if lv else [0, 0, 0, 0])
        dc_cb, dc_cr = dcs
    for comp, (nc_map, sink) in enumerate(
        ((fr.nc_cb, ac_cb), (fr.nc_cr, ac_cr))
    ):
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            abx, aby = mbx * 2 + bx2, mby * 2 + by2
            if cbp_c == 2:
                lv = _decode_residual(
                    dec, _CAT_CHROMA_AC,
                    _cbf_inc(cs, fr, sid, _CAT_CHROMA_AC, mbx, mby,
                             comp, abx, aby, cur_intra=False),
                )
                cs.cbf_c4[aby, abx, comp] = 1 if lv else 0
                mat = H._zig_to_nat([0] + lv) if lv else \
                    np.zeros((4, 4), dtype=np.int64)
                nc_map[aby, abx] = int(np.count_nonzero(mat))
            else:
                cs.cbf_c4[aby, abx, comp] = 0
                nc_map[aby, abx] = 0
                mat = np.zeros((4, 4), dtype=np.int64)
            sink.append(mat)
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        px, py = ox + bx4 * 4, oy + by4 * 4
        if luma_blocks[blk].any():
            res = H._itransform4x4(
                H._dequant4x4(luma_blocks[blk], qp, skip_dc=False)
            )
        else:
            res = 0
        fr.y[py: py + 4, px: px + 4] = H._clip8(
            pred_y[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] + res
        )
        fr.done4[py // 4, px // 4] = True
    H._reconstruct_chroma(
        fr, mbx, mby, 0, qp, pps, list(dc_cb), list(dc_cr),
        ac_cb, ac_cr, sid, preds=(pred_cb, pred_cr),
    )
    _mark_inter_cs(cs, mbx, mby, cbp_l, cbp_c)
    return qp


def _decode_mb_inter_cabac(fr, dec: _CabacDec, mb_addr, qp, pps, sid,
                           mb_type, refs, n_active, wp) -> int:
    """P_L0_16x16 / 16x8 / 8x16: CABAC ref_idx + mvd syntax over the
    CAVLC decoder's exact MC/weighting/reconstruction."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    parts = H._P_PARTS[mb_type]
    # ref_idx loop first (spec syntax order); each partition's ref4
    # span is stored IMMEDIATELY so the next partition's bin-0
    # increment sees it — the encoder mirrors this exactly
    ris: list[int] = []
    for (pbx, pby, w4, h4, kind) in parts:
        bx, by = mbx * 4 + pbx, mby * 4 + pby
        ri = _decode_ref_idx(dec, cs, fr, sid, bx, by, n_active)
        ris.append(ri)
        fr.ref4[by: by + h4, bx: bx + w4] = ri
        fr.ref4b[by: by + h4, bx: bx + w4] = -1
    mvs: list[tuple[int, int]] = []
    for (pbx, pby, w4, h4, kind), ri in zip(parts, ris):
        bx, by = mbx * 4 + pbx, mby * 4 + pby
        dx = _decode_mvd(dec, cs, fr, sid, bx, by, 0, 0)
        dy = _decode_mvd(dec, cs, fr, sid, bx, by, 0, 1)
        px_, py_ = H._mv_pred(fr, bx, by, w4, h4, sid, kind, 0, ri)
        mv = (px_ + dx, py_ + dy)
        mvs.append(mv)
        fr.mv4[by: by + h4, bx: bx + w4] = mv
        cs.mvd_abs[by: by + h4, bx: bx + w4, 0, 0] = min(abs(dx), 33)
        cs.mvd_abs[by: by + h4, bx: bx + w4, 0, 1] = min(abs(dy), 33)
    pred_y = np.empty((16, 16), dtype=np.int64)
    pred_cb = np.empty((8, 8), dtype=np.int64)
    pred_cr = np.empty((8, 8), dtype=np.int64)
    for (pbx, pby, w4, h4, kind), mv, ri in zip(parts, mvs, ris):
        py_, pcb, pcr = H._wp_planes(
            *H._partition_mc(fr, mbx, mby, pbx, pby, w4, h4, mv,
                             refs[ri]),
            wp, ri,
        )
        pred_y[pby * 4: pby * 4 + h4 * 4,
               pbx * 4: pbx * 4 + w4 * 4] = py_
        pred_cb[pby * 2: pby * 2 + h4 * 2,
                pbx * 2: pbx * 2 + w4 * 2] = pcb
        pred_cr[pby * 2: pby * 2 + h4 * 2,
                pbx * 2: pbx * 2 + w4 * 2] = pcr
    return _inter_residual_recon_cabac(
        fr, dec, cs, mbx, mby, qp, pps, sid, pred_y, pred_cb, pred_cr
    )


def _decode_mb_inter_b_cabac(fr, dec: _CabacDec, mb_addr, qp, pps,
                             sid, mb_type, refs) -> int:
    """B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 with the CAVLC decoder's
    default unweighted bi-prediction."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    use_l0 = mb_type in (1, 3)
    use_l1 = mb_type in (2, 3)
    b4x, b4y = mbx * 4, mby * 4
    parts = H._P_PARTS[0]
    preds = []
    for lx, used, ref_arr, mv_arr, ref in (
        (0, use_l0, fr.ref4, fr.mv4, refs[0]),
        (1, use_l1, fr.ref4b, fr.mv4b, refs[1]),
    ):
        if not used:
            ref_arr[b4y: b4y + 4, b4x: b4x + 4] = -1
            continue
        dx = _decode_mvd(dec, cs, fr, sid, b4x, b4y, lx, 0)
        dy = _decode_mvd(dec, cs, fr, sid, b4x, b4y, lx, 1)
        px_, py_ = H._mv_pred(fr, b4x, b4y, 4, 4, sid, "16x16", lx)
        mv = (px_ + dx, py_ + dy)
        mv_arr[b4y: b4y + 4, b4x: b4x + 4] = mv
        ref_arr[b4y: b4y + 4, b4x: b4x + 4] = 0
        cs.mvd_abs[b4y: b4y + 4, b4x: b4x + 4, lx, 0] = min(abs(dx), 33)
        cs.mvd_abs[b4y: b4y + 4, b4x: b4x + 4, lx, 1] = min(abs(dy), 33)
        preds.append(H._inter_pred_planes(fr, mbx, mby, parts, [mv],
                                          ref))
    if len(preds) == 2:
        pred_y = (preds[0][0] + preds[1][0] + 1) >> 1
        pred_cb = (preds[0][1] + preds[1][1] + 1) >> 1
        pred_cr = (preds[0][2] + preds[1][2] + 1) >> 1
    else:
        pred_y, pred_cb, pred_cr = preds[0]
    return _inter_residual_recon_cabac(
        fr, dec, cs, mbx, mby, qp, pps, sid, pred_y, pred_cb, pred_cr
    )


def decode_pbslice_cabac(fr, b: "H._Bits", pps: dict, qp: int,
                         sid: int, first_mb: int, is_b: bool,
                         refs: list, n_active: int,
                         wp: dict | None) -> None:
    """CABAC P/B slice data: per-MB mb_skip_flag, P/B mb_type trees,
    intra-in-P/B via the shared suffix block, end_of_slice terminate
    bins. Unsupported inter shapes (P_8x8, B_Direct/B_Skip, B
    partitions) reject cleanly — same surface as the CAVLC paths."""
    while b.pos & 7:
        if b.u(1) != 1:
            raise ValueError("bad cabac_alignment_one_bit")
    dec = _CabacDec(b)
    cs = _cstate(fr)
    n_mbs = fr.wmb * fr.hmb
    skip_base = _CTX_SKIP_B if is_b else _CTX_SKIP_P
    for mb_addr in range(first_mb, n_mbs):
        mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
        if dec.decision(skip_base + _skip_inc(cs, fr, sid, mbx, mby)):
            if is_b:
                raise ValueError("B_Skip (direct prediction) "
                                 "unsupported")
            H._decode_skip_mb(fr, mb_addr, qp, sid, refs[0], wp)
            fr.slice_of_mb[mby, mbx] = sid
            _mark_skip_cs(cs, mbx, mby)
        elif is_b:
            if not dec.decision(_CTX_MB_TYPE_B +
                                _skip_inc(cs, fr, sid, mbx, mby)):
                raise ValueError("B_Direct_16x16 unsupported")
            if not dec.decision(_CTX_MB_TYPE_B + 3):
                mb_type = 1 + dec.decision(_CTX_MB_TYPE_B + 4)
                qp = _decode_mb_inter_b_cabac(
                    fr, dec, mb_addr, qp, pps, sid, mb_type, refs
                )
            else:
                u = dec.decision(_CTX_MB_TYPE_B + 4)
                for _ in range(3):
                    u = (u << 1) | dec.decision(_CTX_MB_TYPE_B + 5)
                if u == 0:  # '110000' -> B_Bi_16x16
                    qp = _decode_mb_inter_b_cabac(
                        fr, dec, mb_addr, qp, pps, sid, 3, refs
                    )
                elif u == 13:  # '111101' -> intra suffix follows
                    qp = _decode_mb_cabac(
                        fr, dec, mb_addr, qp, pps, sid,
                        mbtype_base=_CTX_MB_TYPE_PB_I,
                        mbtype_inc=False,
                    )
                else:
                    raise ValueError(
                        "B partitions / B_8x8 unsupported"
                    )
        else:
            if dec.decision(_CTX_MB_TYPE_P):  # prefix: intra-in-P
                qp = _decode_mb_cabac(
                    fr, dec, mb_addr, qp, pps, sid,
                    mbtype_base=_CTX_MB_TYPE_PB_I, mbtype_inc=False,
                )
            else:
                b1 = dec.decision(_CTX_MB_TYPE_P + 1)
                b2 = dec.decision(_CTX_MB_TYPE_P + (2 if b1 else 3))
                # (b1,b2): (0,0)->16x16, (1,1)->16x8, (1,0)->8x16,
                # (0,1)->P_8x8 (r14; P_8x8ref0 is CAVLC-only — the
                # CABAC binarization has no code for mb_type 4)
                if not b1 and b2:
                    # sub_mb_type per quadrant, Table 9-38 strings
                    # 0:'1' 1:'00' 2:'011' 3:'010' — only P_L0_8x8
                    # (one MV per quadrant) decodes
                    for _ in range(4):
                        if dec.decision(_CTX_SUB_MB_P):
                            continue  # '1' -> P_L0_8x8
                        dec.decision(_CTX_SUB_MB_P + 1)
                        raise ValueError(
                            "P_8x8 sub-shapes below 8x8 unsupported"
                        )
                    mb_type = 3
                else:
                    mb_type = 0 if not b1 else (1 if b2 else 2)
                qp = _decode_mb_inter_cabac(
                    fr, dec, mb_addr, qp, pps, sid, mb_type, refs,
                    n_active, wp,
                )
        if dec.terminate():  # end_of_slice_flag
            break


# --------------------------------------------------------- MB encode

def _encode_mb_cabac(fr, enc: _CabacEnc, mb_addr: int, qp: int,
                     pps: dict, y, cb, cr, fi: int, sid: int = 0,
                     mbtype_base: int = _CTX_MB_TYPE_I,
                     mbtype_inc: bool = True) -> int:
    """Encode one intra MB (closed-loop reconstruction into ``fr``).
    Policy mirrors ``h264._encode_mb`` with I_PCM replaced by
    Intra_16x16 (the default all-intra fixture predates the r14
    flush/restart escape and its bitstreams are digest-pinned; the
    ``intra-pcm`` GOP restores real I_PCM MBs via
    ``_encode_mb_ipcm_cabac``). Intra-in-P/B callers
    emit the prefix bins themselves, then pass the suffix context
    block (``_CTX_MB_TYPE_PB_I``, no neighbour increment) here."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    fr.ref4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    fr.ref4b[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    src_y = y[oy: oy + 16, ox: ox + 16].astype(np.int64)
    src_cb = cb[cy: cy + 8, cx: cx + 8].astype(np.int64)
    src_cr = cr[cy: cy + 8, cx: cx + 8].astype(np.int64)
    choice = (fi + mb_addr) % 6
    mb_is_i4 = choice >= 3
    cs.is_i4[mby, mbx] = 1 if mb_is_i4 else 0
    cs.is_i16[mby, mbx] = not mb_is_i4

    def chroma_encode(qpc: int):
        dcs, acs = [], []
        for src, plane in ((src_cb, fr.cb), (src_cr, fr.cr)):
            t, l, c = H._luma_neighbors(
                fr, cx, cy, 8, sid, plane, fr.done4, 2
            )
            avail = [0] + [m for m, need in ((1, l), (2, t))
                           if need is not None]
            if t is not None and l is not None and c is not None:
                avail.append(3)
            cmode = avail[(mb_addr // 2) % len(avail)]
            pred = H._pred_chroma8x8(cmode, t, l, c)
            res = src - pred
            dcmat = np.zeros((2, 2), dtype=np.int64)
            blocks = []
            for blk in range(4):
                bx2, by2 = blk % 2, blk // 2
                wmat = H._fwd4x4(
                    res[by2 * 4: by2 * 4 + 4, bx2 * 4: bx2 * 4 + 4]
                )
                dcmat[by2, bx2] = wmat[0, 0]
                blocks.append(H._quant4x4(wmat, qpc, skip_dc=True))
            h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
            dc_lv = H._quant_dc(h2 @ dcmat @ h2, qpc)
            dcs.append([int(dc_lv[0, 0]), int(dc_lv[0, 1]),
                        int(dc_lv[1, 0]), int(dc_lv[1, 1])])
            acs.append((cmode, blocks))
        any_ac = any(bl.any() for _, blks in acs for bl in blks)
        any_dc = any(any(d) for d in dcs)
        cbp_c = 2 if any_ac else (1 if any_dc else 0)
        return dcs[0], dcs[1], acs[0], acs[1], cbp_c

    def emit_chroma_residuals(cbp_c, dc_cb_l, dc_cr_l, acs_cb, acs_cr):
        if cbp_c:
            for comp, dcl in enumerate((dc_cb_l, dc_cr_l)):
                cbf = _encode_residual(
                    enc, _CAT_CHROMA_DC,
                    _cbf_inc(cs, fr, sid, _CAT_CHROMA_DC, mbx, mby,
                             comp, 0, 0),
                    dcl,
                )
                cs.cbf_cdc[mby, mbx, comp] = cbf
        ac_nat_cb, ac_nat_cr = [], []
        for comp, (nc_map, acs) in enumerate(
            ((fr.nc_cb, acs_cb), (fr.nc_cr, acs_cr))
        ):
            for blk in range(4):
                bx2, by2 = blk % 2, blk // 2
                abx, aby = mbx * 2 + bx2, mby * 2 + by2
                blkmat = acs[1][blk]
                if cbp_c == 2:
                    zig = list(H._nat_to_zig(blkmat))[1:]
                    cbf = _encode_residual(
                        enc, _CAT_CHROMA_AC,
                        _cbf_inc(cs, fr, sid, _CAT_CHROMA_AC, mbx,
                                 mby, comp, abx, aby),
                        zig,
                    )
                    cs.cbf_c4[aby, abx, comp] = cbf
                    nc_map[aby, abx] = int(np.count_nonzero(blkmat))
                else:
                    cs.cbf_c4[aby, abx, comp] = 0
                    nc_map[aby, abx] = 0
                    blkmat = np.zeros((4, 4), dtype=np.int64)
                (ac_nat_cb if comp == 0 else ac_nat_cr).append(blkmat)
        return ac_nat_cb, ac_nat_cr

    if not mb_is_i4:  # ---------------- Intra_16x16
        t, l, c = H._luma_neighbors(fr, ox, oy, 16, sid, fr.y,
                                    fr.done4, 4)
        avail = [2] + [m for m, need in ((0, t), (1, l))
                       if need is not None]
        if t is not None and l is not None and c is not None:
            avail.append(3)
        mode = avail[mb_addr % len(avail)]
        delta = (1, -1, 0)[mb_addr % 3]
        new_qp = qp + delta
        if not 0 <= new_qp <= 51:
            delta, new_qp = 0, qp
        qp = new_qp
        pred = H._pred16x16(mode, t, l, c)
        res = src_y - pred
        dcmat = np.zeros((4, 4), dtype=np.int64)
        ac_levels: list[np.ndarray] = []
        for blk in range(16):
            bx4, by4 = H._BLK_POS[blk]
            wmat = H._fwd4x4(
                res[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4]
            )
            dcmat[by4, bx4] = wmat[0, 0]
            ac_levels.append(H._quant4x4(wmat, qp, skip_dc=True))
        dc_lv = H._quant_dc(H._HAD4 @ dcmat @ H._HAD4, qp)
        cbp_l = 15 if any(bl.any() for bl in ac_levels) else 0
        qpc = H._chroma_qp(qp, pps["chroma_qp_index_offset"])
        dc_cb_l, dc_cr_l, acs_cb, acs_cr, cbp_c = chroma_encode(qpc)
        # mb_type bins
        inc0 = _mb_type_inc(cs, fr, sid, mbx, mby) if mbtype_inc else 0
        enc.decision(mbtype_base + inc0, 1)
        enc.terminate(0)  # not I_PCM
        enc.decision(mbtype_base + 3, 1 if cbp_l else 0)
        enc.decision(mbtype_base + 4, 1 if cbp_c else 0)
        if cbp_c:
            enc.decision(mbtype_base + 5, 1 if cbp_c == 2 else 0)
        enc.decision(mbtype_base + 6, (mode >> 1) & 1)
        enc.decision(mbtype_base + 7, mode & 1)
        fr.i4_mode[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
        cmode = acs_cb[0]
        _encode_chroma_pred(
            enc, _chroma_pred_inc(cs, fr, sid, mbx, mby), cmode
        )
        cs.chroma_mode[mby, mbx] = cmode
        cs.cbp_luma[mby, mbx] = cbp_l
        cs.cbp_chroma[mby, mbx] = cbp_c
        _encode_qp_delta(enc, cs, delta)
        fr.qp_deblock[mby, mbx] = qp
        # luma DC + AC residuals
        cs.cbf_ydc[mby, mbx] = _encode_residual(
            enc, _CAT_LUMA_DC,
            _cbf_inc(cs, fr, sid, _CAT_LUMA_DC, mbx, mby, 0, 0, 0),
            list(H._nat_to_zig(dc_lv)),
        )
        kept: list[np.ndarray] = []
        for blk in range(16):
            bx4, by4 = H._BLK_POS[blk]
            abx, aby = mbx * 4 + bx4, mby * 4 + by4
            if cbp_l:
                zig = list(H._nat_to_zig(ac_levels[blk]))[1:]
                cbf = _encode_residual(
                    enc, _CAT_LUMA_AC,
                    _cbf_inc(cs, fr, sid, _CAT_LUMA_AC, mbx, mby, 0,
                             abx, aby),
                    zig,
                )
                cs.cbf_y4[aby, abx] = cbf
                fr.nc_y[aby, abx] = int(np.count_nonzero(ac_levels[blk]))
                kept.append(ac_levels[blk])
            else:
                cs.cbf_y4[aby, abx] = 0
                fr.nc_y[aby, abx] = 0
                kept.append(np.zeros((4, 4), dtype=np.int64))
        ac_nat_cb, ac_nat_cr = emit_chroma_residuals(
            cbp_c, dc_cb_l, dc_cr_l, acs_cb, acs_cr
        )
        # ---- reconstruct (decoder path)
        dc_scaled = H._scale_luma_dc(H._ihadamard4(dc_lv), qp)
        recon = np.empty((16, 16), dtype=np.int64)
        for blk in range(16):
            bx4, by4 = H._BLK_POS[blk]
            d = H._dequant4x4(kept[blk], qp, skip_dc=True)
            d[0, 0] = dc_scaled[by4, bx4]
            resd = H._itransform4x4(d)
            recon[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] = (
                pred[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] + resd
            )
        fr.y[oy: oy + 16, ox: ox + 16] = H._clip8(recon)
        fr.done4[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = True
        use_dc_cb = dc_cb_l if cbp_c else [0, 0, 0, 0]
        use_dc_cr = dc_cr_l if cbp_c else [0, 0, 0, 0]
        H._reconstruct_chroma(
            fr, mbx, mby, cmode, qp, pps, use_dc_cb, use_dc_cr,
            ac_nat_cb, ac_nat_cr, sid,
        )
        cs.mb_done[mby, mbx] = True
        return qp

    # ---------------- Intra_4x4
    inc0 = _mb_type_inc(cs, fr, sid, mbx, mby) if mbtype_inc else 0
    enc.decision(mbtype_base + inc0, 0)
    mode_infos: list[tuple[int, int]] = []  # (prev_flag, rem)
    blk_levels: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        px, py = ox + bx4 * 4, oy + by4 * 4
        t, l, c = H._luma_neighbors(fr, px, py, 4, sid, fr.y,
                                    fr.done4, 4)
        avail = [2]
        if t is not None:
            avail += [0, 3, 7]
        if l is not None:
            avail += [1, 8]
        if t is not None and l is not None and c is not None:
            avail += [4, 5, 6]
        mode = sorted(avail)[(blk + mb_addr + fi) % len(avail)]
        pm = _i4_pred_for_block(fr, abx, aby, sid)
        if mode == pm:
            mode_infos.append((1, 0))
        else:
            mode_infos.append((0, mode if mode < pm else mode - 1))
        fr.i4_mode[aby, abx] = mode
        pred = H._pred4x4(mode, t, l, c)
        res = src_y[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] - pred
        lv = H._quant4x4(H._fwd4x4(res), qp, skip_dc=False)
        blk_levels.append(lv)
        if lv.any():
            resd = H._itransform4x4(
                H._dequant4x4(lv, qp, skip_dc=False)
            )
        else:
            resd = 0
        fr.y[py: py + 4, px: px + 4] = H._clip8(pred + resd)
        fr.done4[py // 4, px // 4] = True
    for prev, rem in mode_infos:
        enc.decision(_CTX_PREV_I4, prev)
        if not prev:
            enc.decision(_CTX_REM_I4, rem & 1)
            enc.decision(_CTX_REM_I4, (rem >> 1) & 1)
            enc.decision(_CTX_REM_I4, (rem >> 2) & 1)
    cbp_l = 0
    for g in range(4):
        if any(blk_levels[g * 4 + k].any() for k in range(4)):
            cbp_l |= 1 << g
    qpc = H._chroma_qp(qp, pps["chroma_qp_index_offset"])
    dc_cb_l, dc_cr_l, acs_cb, acs_cr, cbp_c = chroma_encode(qpc)
    cmode = acs_cb[0]
    _encode_chroma_pred(
        enc, _chroma_pred_inc(cs, fr, sid, mbx, mby), cmode
    )
    cs.chroma_mode[mby, mbx] = cmode
    _encode_cbp(enc, cs, fr, sid, mbx, mby, cbp_l, cbp_c)
    cs.cbp_luma[mby, mbx] = cbp_l
    cs.cbp_chroma[mby, mbx] = cbp_c
    if cbp_l | cbp_c:
        _encode_qp_delta(enc, cs, 0)  # mirrors the CAVLC I_4x4 policy
    else:
        cs.prev_qp_delta_nz = 0
    fr.qp_deblock[mby, mbx] = qp
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_l & (1 << (blk >> 2)):
            cbf = _encode_residual(
                enc, _CAT_LUMA_4X4,
                _cbf_inc(cs, fr, sid, _CAT_LUMA_4X4, mbx, mby, 0,
                         abx, aby),
                list(H._nat_to_zig(blk_levels[blk])),
            )
            cs.cbf_y4[aby, abx] = cbf
            fr.nc_y[aby, abx] = int(np.count_nonzero(blk_levels[blk]))
        else:
            cs.cbf_y4[aby, abx] = 0
            fr.nc_y[aby, abx] = 0
    ac_nat_cb, ac_nat_cr = emit_chroma_residuals(
        cbp_c, dc_cb_l, dc_cr_l, acs_cb, acs_cr
    )
    use_dc_cb = dc_cb_l if cbp_c else [0, 0, 0, 0]
    use_dc_cr = dc_cr_l if cbp_c else [0, 0, 0, 0]
    H._reconstruct_chroma(
        fr, mbx, mby, cmode, qp, pps, use_dc_cb, use_dc_cr,
        ac_nat_cb, ac_nat_cr, sid,
    )
    cs.mb_done[mby, mbx] = True
    return qp


def _emit_inter_residual_cabac(fr, enc: _CabacEnc, cs, mbx, mby, qp,
                               pps, pred_y, pred_cb, pred_cr,
                               src_y, src_cb, src_cr, sid) -> None:
    """CABAC twin of h264._emit_inter_residual: same forward
    transform/quant math and closed-loop reconstruction, CABAC bins
    instead of CAVLC codes."""
    ox, oy = mbx * 16, mby * 16
    res = src_y - pred_y
    blk_levels: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        blk_levels.append(
            H._quant4x4(
                H._fwd4x4(res[by4 * 4: by4 * 4 + 4,
                              bx4 * 4: bx4 * 4 + 4]),
                qp, skip_dc=False,
            )
        )
    cbp_l = 0
    for g in range(4):
        if any(blk_levels[g * 4 + k].any() for k in range(4)):
            cbp_l |= 1 << g
    qpc = H._chroma_qp(qp, pps["chroma_qp_index_offset"])
    dcs: list[list[int]] = []
    acs: list[list[np.ndarray]] = []
    for src, pred in ((src_cb, pred_cb), (src_cr, pred_cr)):
        resc = src - pred
        dcmat = np.zeros((2, 2), dtype=np.int64)
        blocks = []
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            wmat = H._fwd4x4(
                resc[by2 * 4: by2 * 4 + 4, bx2 * 4: bx2 * 4 + 4]
            )
            dcmat[by2, bx2] = wmat[0, 0]
            blocks.append(H._quant4x4(wmat, qpc, skip_dc=True))
        h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
        dc_lv = H._quant_dc(h2 @ dcmat @ h2, qpc)
        dcs.append([int(dc_lv[0, 0]), int(dc_lv[0, 1]),
                    int(dc_lv[1, 0]), int(dc_lv[1, 1])])
        acs.append(blocks)
    any_ac = any(b_.any() for bl in acs for b_ in bl)
    any_dc = any(any(d) for d in dcs)
    cbp_c = 2 if any_ac else (1 if any_dc else 0)
    _encode_cbp(enc, cs, fr, sid, mbx, mby, cbp_l, cbp_c)
    if cbp_l | cbp_c:
        _encode_qp_delta(enc, cs, 0)  # mirrors the CAVLC se(0)
    else:
        cs.prev_qp_delta_nz = 0
    fr.qp_deblock[mby, mbx] = qp
    fr.i4_mode[mby * 4: mby * 4 + 4, mbx * 4: mbx * 4 + 4] = -1
    kept: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_l & (1 << (blk >> 2)):
            cbf = _encode_residual(
                enc, _CAT_LUMA_4X4,
                _cbf_inc(cs, fr, sid, _CAT_LUMA_4X4, mbx, mby, 0,
                         abx, aby, cur_intra=False),
                list(H._nat_to_zig(blk_levels[blk])),
            )
            cs.cbf_y4[aby, abx] = cbf
            fr.nc_y[aby, abx] = int(np.count_nonzero(blk_levels[blk]))
            kept.append(blk_levels[blk])
        else:
            cs.cbf_y4[aby, abx] = 0
            fr.nc_y[aby, abx] = 0
            kept.append(np.zeros((4, 4), dtype=np.int64))
    if cbp_c:
        for comp, dcl in enumerate(dcs):
            cbf = _encode_residual(
                enc, _CAT_CHROMA_DC,
                _cbf_inc(cs, fr, sid, _CAT_CHROMA_DC, mbx, mby, comp,
                         0, 0, cur_intra=False),
                dcl,
            )
            cs.cbf_cdc[mby, mbx, comp] = cbf
    ac_nat_cb: list[np.ndarray] = []
    ac_nat_cr: list[np.ndarray] = []
    for comp, (nc_map, blocks) in enumerate(
        ((fr.nc_cb, acs[0]), (fr.nc_cr, acs[1]))
    ):
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            abx, aby = mbx * 2 + bx2, mby * 2 + by2
            blkmat = blocks[blk]
            if cbp_c == 2:
                cbf = _encode_residual(
                    enc, _CAT_CHROMA_AC,
                    _cbf_inc(cs, fr, sid, _CAT_CHROMA_AC, mbx, mby,
                             comp, abx, aby, cur_intra=False),
                    list(H._nat_to_zig(blkmat))[1:],
                )
                cs.cbf_c4[aby, abx, comp] = cbf
                nc_map[aby, abx] = int(np.count_nonzero(blkmat))
            else:
                cs.cbf_c4[aby, abx, comp] = 0
                nc_map[aby, abx] = 0
                blkmat = np.zeros((4, 4), dtype=np.int64)
            (ac_nat_cb if comp == 0 else ac_nat_cr).append(blkmat)
    for blk in range(16):
        bx4, by4 = H._BLK_POS[blk]
        px, py = ox + bx4 * 4, oy + by4 * 4
        if kept[blk].any():
            resd = H._itransform4x4(
                H._dequant4x4(kept[blk], qp, skip_dc=False)
            )
        else:
            resd = 0
        fr.y[py: py + 4, px: px + 4] = H._clip8(
            pred_y[by4 * 4: by4 * 4 + 4, bx4 * 4: bx4 * 4 + 4] + resd
        )
        fr.done4[py // 4, px // 4] = True
    H._reconstruct_chroma(
        fr, mbx, mby, 0, qp, pps,
        dcs[0] if cbp_c else [0, 0, 0, 0],
        dcs[1] if cbp_c else [0, 0, 0, 0],
        ac_nat_cb, ac_nat_cr, sid, preds=(pred_cb, pred_cr),
    )
    _mark_inter_cs(cs, mbx, mby, cbp_l, cbp_c)


def _encode_mb_inter_cabac(fr, enc: _CabacEnc, mb_addr, qp, pps,
                           y, cb, cr, fi, refs, mb_type, sid=0,
                           n_active=1) -> int:
    """CABAC twin of h264._encode_mb_inter: SAME deterministic MV /
    ref_idx policy, CABAC mb_type + ref_idx + mvd bins."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    src_y = y[oy: oy + 16, ox: ox + 16].astype(np.int64)
    src_cb = cb[cy: cy + 8, cx: cx + 8].astype(np.int64)
    src_cr = cr[cy: cy + 8, cx: cx + 8].astype(np.int64)
    parts = H._P_PARTS[mb_type]
    ris = [(mb_addr + fi + pi) % n_active for pi in range(len(parts))]
    # mb_type bins: '000' 16x16, '011' 16x8, '010' 8x16, '001' P_8x8
    enc.decision(_CTX_MB_TYPE_P, 0)
    b1 = 1 if mb_type in (1, 2) else 0
    b2 = 1 if mb_type in (1, 3) else 0
    enc.decision(_CTX_MB_TYPE_P + 1, b1)
    enc.decision(_CTX_MB_TYPE_P + (2 if b1 else 3), b2)
    if mb_type == 3:
        for _ in parts:
            enc.decision(_CTX_SUB_MB_P, 1)  # sub_mb_type P_L0_8x8
    # ref_idx loop: store each partition's ref4 span immediately so
    # the next partition's increment sees it (decoder mirrors)
    for (pbx, pby, w4, h4, kind), ri in zip(parts, ris):
        bx, by = mbx * 4 + pbx, mby * 4 + pby
        _encode_ref_idx(enc, cs, fr, sid, bx, by, n_active, ri)
        fr.ref4[by: by + h4, bx: bx + w4] = ri
        fr.ref4b[by: by + h4, bx: bx + w4] = -1
    mvs: list[tuple[int, int]] = []
    for pi, ((pbx, pby, w4, h4, kind), ri) in enumerate(
            zip(parts, ris)):
        bx, by = mbx * 4 + pbx, mby * 4 + pby
        mvp = H._mv_pred(fr, bx, by, w4, h4, sid, kind, 0, ri)
        mv = (
            ((mb_addr * 7 + fi * 3 + pi * 5) % 17) - 8,
            ((mb_addr * 11 + fi * 5 + pi * 13) % 17) - 8,
        )
        dx, dy = mv[0] - mvp[0], mv[1] - mvp[1]
        _encode_mvd(enc, cs, fr, sid, bx, by, 0, 0, dx)
        _encode_mvd(enc, cs, fr, sid, bx, by, 0, 1, dy)
        mvs.append(mv)
        fr.mv4[by: by + h4, bx: bx + w4] = mv
        cs.mvd_abs[by: by + h4, bx: bx + w4, 0, 0] = min(abs(dx), 33)
        cs.mvd_abs[by: by + h4, bx: bx + w4, 0, 1] = min(abs(dy), 33)
    pred_y = np.empty((16, 16), dtype=np.int64)
    pred_cb = np.empty((8, 8), dtype=np.int64)
    pred_cr = np.empty((8, 8), dtype=np.int64)
    for (pbx, pby, w4, h4, kind), mv, ri in zip(parts, mvs, ris):
        py_, pcb, pcr = H._wp_planes(
            *H._partition_mc(fr, mbx, mby, pbx, pby, w4, h4, mv,
                             refs[ri]),
            None, ri,
        )
        pred_y[pby * 4: pby * 4 + h4 * 4,
               pbx * 4: pbx * 4 + w4 * 4] = py_
        pred_cb[pby * 2: pby * 2 + h4 * 2,
                pbx * 2: pbx * 2 + w4 * 2] = pcb
        pred_cr[pby * 2: pby * 2 + h4 * 2,
                pbx * 2: pbx * 2 + w4 * 2] = pcr
    _emit_inter_residual_cabac(
        fr, enc, cs, mbx, mby, qp, pps, pred_y, pred_cb, pred_cr,
        src_y, src_cb, src_cr, sid,
    )
    return qp


def _encode_mb_inter_b_cabac(fr, enc: _CabacEnc, mb_addr, qp, pps,
                             y, cb, cr, fi, refs, mb_type,
                             sid=0) -> int:
    """CABAC twin of h264._encode_mb_inter_b (same MV policy)."""
    cs = _cstate(fr)
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    src_y = y[oy: oy + 16, ox: ox + 16].astype(np.int64)
    src_cb = cb[cy: cy + 8, cx: cx + 8].astype(np.int64)
    src_cr = cr[cy: cy + 8, cx: cx + 8].astype(np.int64)
    use_l0 = mb_type in (1, 3)
    use_l1 = mb_type in (2, 3)
    b4x, b4y = mbx * 4, mby * 4
    parts = H._P_PARTS[0]
    # mb_type bins: '100' L0, '101' L1, '110000' Bi
    enc.decision(_CTX_MB_TYPE_B + _skip_inc(cs, fr, sid, mbx, mby), 1)
    if mb_type in (1, 2):
        enc.decision(_CTX_MB_TYPE_B + 3, 0)
        enc.decision(_CTX_MB_TYPE_B + 4, mb_type - 1)
    else:  # Bi
        enc.decision(_CTX_MB_TYPE_B + 3, 1)
        enc.decision(_CTX_MB_TYPE_B + 4, 0)
        for _ in range(3):
            enc.decision(_CTX_MB_TYPE_B + 5, 0)
    preds = []
    for lx, used, ref_arr, mv_arr, ref in (
        (0, use_l0, fr.ref4, fr.mv4, refs[0]),
        (1, use_l1, fr.ref4b, fr.mv4b, refs[1]),
    ):
        if not used:
            ref_arr[b4y: b4y + 4, b4x: b4x + 4] = -1
            continue
        mvp = H._mv_pred(fr, b4x, b4y, 4, 4, sid, "16x16", lx)
        mv = (
            ((mb_addr * 5 + fi * 7 + lx * 3) % 17) - 8,
            ((mb_addr * 13 + fi * 3 + lx * 11) % 17) - 8,
        )
        dx, dy = mv[0] - mvp[0], mv[1] - mvp[1]
        _encode_mvd(enc, cs, fr, sid, b4x, b4y, lx, 0, dx)
        _encode_mvd(enc, cs, fr, sid, b4x, b4y, lx, 1, dy)
        mv_arr[b4y: b4y + 4, b4x: b4x + 4] = mv
        ref_arr[b4y: b4y + 4, b4x: b4x + 4] = 0
        cs.mvd_abs[b4y: b4y + 4, b4x: b4x + 4, lx, 0] = min(abs(dx), 33)
        cs.mvd_abs[b4y: b4y + 4, b4x: b4x + 4, lx, 1] = min(abs(dy), 33)
        preds.append(H._inter_pred_planes(fr, mbx, mby, parts, [mv],
                                          ref))
    if len(preds) == 2:
        pred_y = (preds[0][0] + preds[1][0] + 1) >> 1
        pred_cb = (preds[0][1] + preds[1][1] + 1) >> 1
        pred_cr = (preds[0][2] + preds[1][2] + 1) >> 1
    else:
        pred_y, pred_cb, pred_cr = preds[0]
    _emit_inter_residual_cabac(
        fr, enc, cs, mbx, mby, qp, pps, pred_y, pred_cb, pred_cr,
        src_y, src_cb, src_cr, sid,
    )
    return qp


def _sei_cabac_marker() -> bytes:
    """user_data_unregistered SEI (payloadType 5) carrying
    CABAC_SEI_UUID — the shared-context-init marker."""
    payload = CABAC_SEI_UUID
    w = H._BitWriter()
    w.u(8, 5)  # payloadType: user_data_unregistered
    w.u(8, len(payload))
    w.raw_bytes(payload)
    w.rbsp_trailing()
    return H._nal(6, w.tobytes(), ref_idc=0)


def sei_has_cabac_marker(rbsp: bytes) -> bool:
    """True when an SEI RBSP carries this encoder's CABAC marker."""
    pos = 0
    while pos + 2 <= len(rbsp):
        ptype = 0
        while pos < len(rbsp) and rbsp[pos] == 0xFF:
            ptype += 255
            pos += 1
        if pos >= len(rbsp):
            return False
        ptype += rbsp[pos]
        pos += 1
        psize = 0
        while pos < len(rbsp) and rbsp[pos] == 0xFF:
            psize += 255
            pos += 1
        if pos >= len(rbsp):
            return False
        psize += rbsp[pos]
        pos += 1
        if ptype == 5 and rbsp[pos: pos + 16] == CABAC_SEI_UUID:
            return True
        pos += psize
    return False


def encode_h264_annexb_cabac(
    frames_rgb: list[np.ndarray],
    qp: int = 26,
    chroma_qp_offset: int = 0,
    gop: str = "all-intra",
) -> tuple[bytes, list[np.ndarray]]:
    """Annex B stream with CABAC entropy coding
    (entropy_coding_mode_flag = 1, Main profile) plus the
    shared-context SEI marker. Returns (stream, reconstructions);
    ``decode_h264_annexb(stream)`` must equal the reconstructions
    bit-for-bit.

    ``gop="all-intra"`` (default, byte-identical to the r13 output):
    per-MB policy mirrors the CAVLC fixture encoder with I_PCM
    replaced by Intra_16x16: (frame + mb) % 6 -> 0/1/2 Intra_16x16
    (pred modes cycling, qp wobble +-1), 3/4/5 Intra_4x4 (all 9 pred
    modes cycle).

    ``gop="ipp"`` (r14): IDR then P pictures, the CAVLC IPP policy —
    (frame + mb) % 8 -> 0/4 P_Skip (per-MB mb_skip_flag under CABAC,
    no skip runs), 1/2/3 P_L0_16x16 / 16x8 / 8x16, 5/6/7 intra-in-P —
    with n_active ramping to 2 once two references exist, so the
    CABAC ref_idx syntax (unary, neighbour-conditioned bin 0) is on
    the wire.

    ``gop="ibp"`` (r14): the CAVLC IBP shape — P references alternate
    with non-reference B pictures, (frame + mb) % 4 -> B_L0_16x16 /
    B_L1_16x16 / B_Bi_16x16 / intra-in-B; poc_type 0 as B requires."""
    if gop not in ("all-intra", "intra-pcm", "ipp", "ipp8", "ibp"):
        raise ValueError(f"unknown gop {gop!r}")
    if gop not in ("all-intra", "intra-pcm"):
        return _encode_cabac_gop(frames_rgb, qp, chroma_qp_offset, gop)
    pcm = gop == "intra-pcm"
    h, w = frames_rgb[0].shape[:2]
    if h % 16 or w % 16:
        raise ValueError("fixture frames must be MB-aligned")
    wmb, hmb = w // 16, h // 16
    sps_d = {
        "width_mbs": wmb, "height_mbs": hmb, "width": w, "height": h,
        "poc_type": 2, "log2_max_frame_num": 4, "log2_max_poc_lsb": 8,
    }
    pps_d = {
        "pic_init_qp": qp, "chroma_qp_index_offset": chroma_qp_offset,
        "deblocking_control_present": True, "constrained_intra": False,
    }
    out = [
        H._nal(7, H._sps_rbsp(wmb, hmb, poc_type=2, profile=77)),
        H._nal(8, H._pps_rbsp(qp, chroma_qp_offset, cabac=True)),
    ]
    recons: list[np.ndarray] = []
    for fi, rgb in enumerate(frames_rgb):
        # the shared-context marker rides EVERY access unit, so
        # per-sample consumers (MP4 demux -> one-AU decode) see it
        out.append(_sei_cabac_marker())
        y, cb, cr = H._rgb_to_yuv420(np.asarray(rgb, dtype=np.uint8))
        fr = H._Frame(sps_d)
        wtr = H._BitWriter()
        wtr.ue(0)  # first_mb
        wtr.ue(7)  # slice_type I (all slices)
        wtr.ue(0)  # pps_id
        wtr.u(4, 0)  # frame_num
        wtr.ue(fi % 8)  # idr_pic_id
        wtr.u(1, 0)  # no_output_of_prior_pics
        wtr.u(1, 0)  # long_term_reference
        wtr.se(0)  # slice_qp_delta
        wtr.ue(1)  # disable_deblocking_filter_idc: off
        while len(wtr.bits) % 8:  # cabac_alignment_one_bit
            wtr.u(1, 1)
        enc = _CabacEnc(wtr)
        cur_qp = qp
        n_mbs = wmb * hmb
        for mb_addr in range(n_mbs):
            if pcm and (fi + mb_addr) % 6 == 0:
                # intra-pcm (r14): the CAVLC fixture policy's I_PCM
                # slot, restored under CABAC via the flush/restart
                # escape; remaining MBs keep the all-intra policy
                cur_qp = _encode_mb_ipcm_cabac(
                    fr, enc, mb_addr, cur_qp, y, cb, cr
                )
            else:
                cur_qp = _encode_mb_cabac(
                    fr, enc, mb_addr, cur_qp, pps_d, y, cb, cr, fi
                )
            enc.terminate(1 if mb_addr == n_mbs - 1 else 0)
        out.append(H._nal(5, wtr.tobytes(), ref_idc=3))
        recons.append(
            H._yuv420_to_rgb(fr.y[:h, :w], fr.cb[: h // 2, : w // 2],
                             fr.cr[: h // 2, : w // 2])
        )
    return b"".join(out), recons


def _encode_cabac_gop(
    frames_rgb: list[np.ndarray], qp: int, chroma_qp_offset: int,
    gop: str,
) -> tuple[bytes, list[np.ndarray]]:
    """IPP / IBP CABAC fixture encoder (see encode_h264_annexb_cabac).
    Slice headers, reference-list maintenance, and per-MB policies
    mirror h264.encode_h264_annexb's GOP branch (deblocking signalled
    off, as in the all-intra CABAC path)."""
    h, w = frames_rgb[0].shape[:2]
    if h % 16 or w % 16:
        raise ValueError("fixture frames must be MB-aligned")
    wmb, hmb = w // 16, h // 16
    poc_type = 0 if gop == "ibp" else 2
    sps_d = {
        "width_mbs": wmb, "height_mbs": hmb, "width": w, "height": h,
        "poc_type": poc_type, "log2_max_frame_num": 4,
        "log2_max_poc_lsb": 8,
    }
    pps_d = {
        "pic_init_qp": qp, "chroma_qp_index_offset": chroma_qp_offset,
        "deblocking_control_present": True, "constrained_intra": False,
    }
    out = [
        H._nal(7, H._sps_rbsp(wmb, hmb, poc_type, profile=77)),
        H._nal(8, H._pps_rbsp(qp, chroma_qp_offset, cabac=True)),
    ]
    recons: list[np.ndarray] = []
    refs: list = []
    ref_count = 0
    n_mbs = wmb * hmb
    for fi, rgb in enumerate(frames_rgb):
        if fi == 0:
            kind = "i"
        elif gop in ("ipp", "ipp8"):
            kind = "p"
        else:
            kind = "p" if fi % 2 == 1 else "b"
        is_ref = kind != "b"
        n_active = (
            min(2, len(refs))
            if (kind == "p" and gop in ("ipp", "ipp8"))
            else 1
        )
        out.append(_sei_cabac_marker())
        y, cb, cr = H._rgb_to_yuv420(np.asarray(rgb, dtype=np.uint8))
        fr = H._Frame(sps_d)
        cs = _cstate(fr)
        wtr = H._BitWriter()
        wtr.ue(0)  # first_mb
        if kind == "i":
            wtr.ue(7)  # slice_type I (all slices)
            wtr.ue(0)  # pps_id
            wtr.u(4, 0)  # frame_num
            wtr.ue(fi % 8)  # idr_pic_id
            if poc_type == 0:
                wtr.u(8, (2 * fi) % 256)  # pic_order_cnt_lsb
            wtr.u(1, 0)  # no_output_of_prior_pics
            wtr.u(1, 0)  # long_term_reference
        else:
            wtr.ue(5 if kind == "p" else 6)  # slice_type P / B
            wtr.ue(0)  # pps_id
            wtr.u(4, ref_count % 16)  # frame_num
            if poc_type == 0:
                wtr.u(8, (2 * fi) % 256)  # pic_order_cnt_lsb
            if kind == "b":
                wtr.u(1, 0)  # direct_spatial_mv_pred_flag
            if kind == "p" and n_active == 2:
                wtr.u(1, 1)  # num_ref_idx_active_override_flag
                wtr.ue(n_active - 1)
            else:
                wtr.u(1, 0)  # num_ref_idx_active_override_flag
            wtr.u(1, 0)  # ref_pic_list_modification_flag_l0
            if kind == "b":
                wtr.u(1, 0)  # ref_pic_list_modification_flag_l1
            if is_ref:
                wtr.u(1, 0)  # adaptive_ref_pic_marking_mode_flag
        wtr.se(0)  # slice_qp_delta
        wtr.ue(1)  # disable_deblocking_filter_idc: off
        while len(wtr.bits) % 8:  # cabac_alignment_one_bit
            wtr.u(1, 1)
        enc = _CabacEnc(wtr)
        cur_qp = qp
        if kind == "i":
            for mb_addr in range(n_mbs):
                cur_qp = _encode_mb_cabac(
                    fr, enc, mb_addr, cur_qp, pps_d, y, cb, cr, fi
                )
                enc.terminate(1 if mb_addr == n_mbs - 1 else 0)
        elif kind == "p":
            for mb_addr in range(n_mbs):
                mbx, mby = mb_addr % wmb, mb_addr // wmb
                choice = (fi + mb_addr) % 8
                sinc = _skip_inc(cs, fr, 0, mbx, mby)
                if choice == 0 or (choice == 4 and gop != "ipp8"):
                    enc.decision(_CTX_SKIP_P + sinc, 1)  # P_Skip
                    H._decode_skip_mb(fr, mb_addr, cur_qp, 0,
                                      refs[0], None)
                    _mark_skip_cs(cs, mbx, mby)
                else:
                    enc.decision(_CTX_SKIP_P + sinc, 0)
                    if choice in (1, 2, 3) or (
                        gop == "ipp8" and choice in (4, 5)
                    ):
                        # ipp8 folds P_8x8 into the rotation (4 and 5
                        # both map to mb_type 3: CABAC has no ref0
                        # variant — quadrant ref_idx carries the
                        # reference choice instead)
                        mbt = choice - 1 if choice <= 3 else 3
                        cur_qp = _encode_mb_inter_cabac(
                            fr, enc, mb_addr, cur_qp, pps_d, y, cb,
                            cr, fi, refs, mbt,
                            n_active=n_active,
                        )
                    else:  # 5/6/7: intra-in-P
                        enc.decision(_CTX_MB_TYPE_P, 1)  # prefix
                        cur_qp = _encode_mb_cabac(
                            fr, enc, mb_addr, cur_qp, pps_d, y, cb,
                            cr, fi,
                            mbtype_base=_CTX_MB_TYPE_PB_I,
                            mbtype_inc=False,
                        )
                enc.terminate(1 if mb_addr == n_mbs - 1 else 0)
        else:  # B
            for mb_addr in range(n_mbs):
                mbx, mby = mb_addr % wmb, mb_addr // wmb
                enc.decision(
                    _CTX_SKIP_B + _skip_inc(cs, fr, 0, mbx, mby), 0
                )  # no B_Skip (direct prediction unsupported)
                choice = (fi + mb_addr) % 4
                if choice < 3:
                    cur_qp = _encode_mb_inter_b_cabac(
                        fr, enc, mb_addr, cur_qp, pps_d, y, cb, cr,
                        fi, refs, choice + 1,
                    )
                else:  # intra-in-B: prefix '111101'
                    enc.decision(
                        _CTX_MB_TYPE_B +
                        _skip_inc(cs, fr, 0, mbx, mby), 1,
                    )
                    enc.decision(_CTX_MB_TYPE_B + 3, 1)
                    enc.decision(_CTX_MB_TYPE_B + 4, 1)
                    enc.decision(_CTX_MB_TYPE_B + 5, 1)
                    enc.decision(_CTX_MB_TYPE_B + 5, 0)
                    enc.decision(_CTX_MB_TYPE_B + 5, 1)
                    cur_qp = _encode_mb_cabac(
                        fr, enc, mb_addr, cur_qp, pps_d, y, cb, cr,
                        fi, mbtype_base=_CTX_MB_TYPE_PB_I,
                        mbtype_inc=False,
                    )
                enc.terminate(1 if mb_addr == n_mbs - 1 else 0)
        ntype = 5 if kind == "i" else 1
        out.append(H._nal(ntype, wtr.tobytes(),
                          ref_idc=3 if is_ref else 0))
        if is_ref:
            planes = (fr.y, fr.cb, fr.cr)
            refs = [planes] if kind == "i" else [planes] + refs[:1]
            ref_count += 1
        recons.append(
            H._yuv420_to_rgb(fr.y[:h, :w], fr.cb[: h // 2, : w // 2],
                             fr.cr[: h // 2, : w // 2])
        )
    return b"".join(out), recons
