"""From-scratch H.264/AVC decoder (ITU-T H.264 / ISO/IEC 14496-10) —
Annex B byte streams and AVCC (length-prefixed) access units,
Baseline-profile I and single-reference P slices with CAVLC entropy
coding.

Beyond-reference scope (the reference repo has no codec layer): this
is the next step past r8's arithmetic-coded JPEG on the feasible-from-
scratch codec frontier — H.264's integer transforms make decode
BIT-EXACT by spec, so decoded pixels can sit under the driver's CRC
gate exactly like the JPEG/FLAC/ADPCM paths.

Supported (returns planes) vs rejected (returns None, never raises):

- IDR/I slices, ``entropy_coding_mode_flag == 0`` (CAVLC),
  ``frame_mbs_only_flag == 1``, 4:2:0 or implied chroma, 8-bit.
  Macroblock types: I_PCM, Intra_16x16 (all 4 pred modes), Intra_4x4
  (all 9 pred modes), with full CAVLC residual decoding (coeff_token
  / total_zeros / run_before per Tables 9-5..9-10), dequantisation
  (8.5.9-8.5.12) and the 4x4 integer inverse transform + luma DC
  Hadamard + chroma DC transform.
- P slices with up to TWO L0 references (sliding-window marking;
  per-partition ``ref_idx_l0`` te(v) when two are active): P_Skip via
  mb_skip_run, P_L0_16x16, P_L0_L0_16x8, P_L0_L0_8x16, and intra-in-P
  (mb_type - 5). Quarter-sample luma interpolation (6-tap half-pel +
  quarter averaging, 8.4.2.2.1; border-clamped fetches), eighth-sample
  bilinear chroma (8.4.2.2.2), median MV prediction with the
  16x8/8x16 directional rules (8.4.1.3) and the P_Skip zero-MV
  conditions (8.4.1.1), and the Table 9-4 INTER coded_block_pattern
  mapping. EXPLICIT WEIGHTED PREDICTION (pred_weight_table, 7.3.3.2):
  per-ref luma/chroma weights + offsets applied per 8.4.2.3.3,
  including to P_Skip macroblocks.
- The in-loop DEBLOCKING filter (8.7) with full per-segment boundary
  strengths: 4 on intra MB edges, 3 inside intra MBs, and the
  inter 2/1/0 tiers from coded coefficients and >= 1-sample MV
  deltas; normal + strong filters, slice alpha/beta offsets, I_PCM
  contributing QPY = 0 to its edge averages per 8.7.2. Streams may
  signal the filter on (idc 0/2) or off (idc 1), and PPS without the
  control flags defaults to ON. Because intra prediction reads
  pre-filter samples, the filter runs as a picture-level pass after
  construction — equivalent to the spec's per-MB ordering, which it
  replicates edge by edge; P slices predict from the POST-filter
  reference exactly as 8.4 requires.
- CABAC I slices (since r13, ``operators/cabac.py``: full 9.3
  arithmetic engine + I-slice syntax layer) for streams carrying the
  shared-context SEI marker — see that module's conformance-boundary
  note for why external CABAC streams (whose decode would depend on
  the unverifiable-in-container spec init tables) still reject
  cleanly.
  B direct/skip modes, B partitions, more than two references,
  weighted BI-prediction, sub-8x8 partitions, CABAC P/B slices, and
  unmarked external CABAC are REJECTED (None), honoring the decoder
  family's reject-cleanly contract (same posture as ``jpeg.py``'s
  hierarchical processes).

All VLC tables are transcribed from the public spec and checked for
prefix-freeness by ``tests/test_h264.py``; fixtures come from this
module's own closed-loop encoder (``encode_h264_annexb``), whose
reconstruction loop runs the decoder's exact dequant + inverse
transform — the property tests assert decoder output equals the
encoder's reconstruction bit-for-bit (the FLAC-fixture pattern).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

__all__ = [
    "parse_annexb_nals",
    "parse_sps",
    "parse_pps",
    "decode_h264_frame",
    "decode_h264_annexb",
    "encode_h264_annexb",
    "annexb_to_avcc",
    "avcc_config",
]


# ------------------------------------------------------------ bitstream

class _Bits:
    """MSB-first bit reader over an RBSP (emulation bytes already
    stripped). Raises EOFError past the end — callers catch."""

    __slots__ = ("d", "pos")

    def __init__(self, d: bytes) -> None:
        self.d = d
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise EOFError("rbsp exhausted")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def flag(self) -> bool:
        return self.u(1) == 1

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("exp-golomb prefix too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytes_(self, n: int) -> bytes:
        if self.pos & 7:
            raise ValueError("unaligned byte read")
        byte = self.pos >> 3
        if byte + n > len(self.d):
            raise EOFError("rbsp exhausted")
        self.pos += n * 8
        return self.d[byte : byte + n]

    def more_rbsp_data(self) -> bool:
        """True before the rbsp_stop_one_bit (9.x): data remains if any
        bit after the current position, other than the final 1 followed
        by zeros, is set."""
        if self.pos >> 3 >= len(self.d):
            return False
        # find last set bit in stream = stop bit position
        last = len(self.d) * 8 - 1
        while last >= 0:
            if (self.d[last >> 3] >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


def _rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    i, n = 0, len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += nal[i : i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def _emulate(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes for writing."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def parse_annexb_nals(
    data: bytes, with_ref_idc: bool = False
) -> list[tuple]:
    """Split an Annex B byte stream into (nal_unit_type, rbsp) pairs —
    or (nal_unit_type, nal_ref_idc, rbsp) triples with
    ``with_ref_idc`` (P-slice headers need ref_idc to know whether
    dec_ref_pic_marking is present). Returns [] when no start code is
    found."""
    out: list[tuple] = []
    i, n = 0, len(data)
    starts: list[int] = []
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        # trailing zero bytes of the previous NAL belong to the next
        # start code's 00 00 prefix; trim them
        while e > s and e - 3 >= s and data[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        if e <= s:
            continue
        hdr = data[s]
        if hdr & 0x80:
            continue  # forbidden_zero_bit set: corrupt
        if with_ref_idc:
            out.append(((hdr & 0x1F), (hdr >> 5) & 3, _rbsp(data[s + 1 : e])))
        else:
            out.append((hdr & 0x1F, _rbsp(data[s + 1 : e])))
    return out


# ------------------------------------------------------- parameter sets

_HIGH_PROFILES = frozenset({100, 110, 122, 244, 44, 83, 86, 118, 128, 138})


def parse_sps(rbsp: bytes) -> dict:
    """Sequence parameter set (7.3.2.1.1) — the Baseline/Constrained
    fields plus the High-profile chroma block (parsed, 4:2:0-or-bust).
    Raises ValueError on unsupported shapes."""
    b = _Bits(rbsp)
    profile = b.u(8)
    b.u(8)  # constraint flags + reserved
    level = b.u(8)
    sps_id = b.ue()
    chroma_format_idc = 1
    if profile in _HIGH_PROFILES:
        chroma_format_idc = b.ue()
        if chroma_format_idc == 3:
            b.flag()  # separate_colour_plane_flag
        bit_depth_luma = b.ue() + 8
        bit_depth_chroma = b.ue() + 8
        if bit_depth_luma != 8 or bit_depth_chroma != 8:
            raise ValueError("only 8-bit supported")
        b.flag()  # qpprime_y_zero_transform_bypass
        if b.flag():  # seq_scaling_matrix_present
            raise ValueError("scaling matrices not supported")
    if chroma_format_idc != 1:
        raise ValueError("only 4:2:0 supported")
    log2_max_frame_num = b.ue() + 4
    poc_type = b.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = b.ue() + 4
    elif poc_type == 1:
        b.flag()
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    b.ue()  # max_num_ref_frames
    b.flag()  # gaps_in_frame_num_value_allowed
    width_mbs = b.ue() + 1
    height_map_units = b.ue() + 1
    frame_mbs_only = b.flag()
    if not frame_mbs_only:
        raise ValueError("interlace (fields/MBAFF) not supported")
    b.flag()  # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if b.flag():  # frame_cropping
        crop = [b.ue(), b.ue(), b.ue(), b.ue()]
    return {
        "profile": profile,
        "level": level,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "width_mbs": width_mbs,
        "height_mbs": height_map_units,
        "width": width_mbs * 16 - 2 * (crop[0] + crop[1]),
        "height": height_map_units * 16 - 2 * (crop[2] + crop[3]),
        "crop": crop,
    }


def parse_pps(rbsp: bytes) -> dict:
    """Picture parameter set (7.3.2.2) — single-slice-group shapes;
    slice groups reject. CABAC (entropy_coding_mode_flag = 1) is
    accepted here and gated at slice-decode time: I slices decode via
    ``operators/cabac.py`` when the stream carries the shared-context
    SEI marker (see that module's conformance-boundary note), and
    everything else rejects cleanly."""
    b = _Bits(rbsp)
    pps_id = b.ue()
    sps_id = b.ue()
    entropy_cabac = b.flag()
    b.flag()  # bottom_field_pic_order_in_frame_present
    if b.ue() != 0:
        raise ValueError("slice groups (FMO) not supported")
    num_ref_l0 = b.ue() + 1  # num_ref_idx_l0_default_active_minus1
    num_ref_l1 = b.ue() + 1  # num_ref_idx_l1_default_active_minus1
    weighted_pred = b.flag()
    weighted_bipred_idc = b.u(2)
    pic_init_qp = b.se() + 26
    b.se()  # pic_init_qs
    chroma_qp_index_offset = b.se()
    deblocking_control_present = b.flag()
    constrained_intra = b.flag()
    b.flag()  # redundant_pic_cnt_present
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy_cabac": entropy_cabac,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_index_offset": chroma_qp_index_offset,
        "deblocking_control_present": deblocking_control_present,
        "constrained_intra": constrained_intra,
        "num_ref_idx_l0_active": num_ref_l0,
        "num_ref_idx_l1_active": num_ref_l1,
        "weighted_pred": weighted_pred,
        "weighted_bipred_idc": weighted_bipred_idc,
    }


# ------------------------------------------------------- CAVLC tables
#
# Transcribed from ITU-T H.264 Tables 9-5 (coeff_token), 9-7/9-8
# (total_zeros, 4x4), 9-9(a) (total_zeros, chroma DC 4:2:0) and 9-10
# (run_before). Encoded as {(trailing_ones, total_coeff): (length,
# code)} / column lists of (length, code); prefix-freeness of every
# table is asserted by tests/test_h264.py::test_vlc_tables_prefix_free.

_CT_NC0 = {  # 0 <= nC < 2
    (0, 0): (1, 1),
    (0, 1): (6, 0b000101), (1, 1): (2, 0b01),
    (0, 2): (8, 0b00000111), (1, 2): (6, 0b000100), (2, 2): (3, 0b001),
    (0, 3): (9, 0b000000111), (1, 3): (8, 0b00000110),
    (2, 3): (7, 0b0000101), (3, 3): (5, 0b00011),
    (0, 4): (10, 0b0000000111), (1, 4): (9, 0b000000110),
    (2, 4): (8, 0b00000101), (3, 4): (6, 0b000011),
    (0, 5): (11, 0b00000000111), (1, 5): (10, 0b0000000110),
    (2, 5): (9, 0b000000101), (3, 5): (7, 0b0000100),
    (0, 6): (13, 0b0000000001111), (1, 6): (11, 0b00000000110),
    (2, 6): (10, 0b0000000101), (3, 6): (8, 0b00000100),
    (0, 7): (13, 0b0000000001011), (1, 7): (13, 0b0000000001110),
    (2, 7): (11, 0b00000000101), (3, 7): (9, 0b000000100),
    (0, 8): (13, 0b0000000001000), (1, 8): (13, 0b0000000001010),
    (2, 8): (13, 0b0000000001101), (3, 8): (10, 0b0000000100),
    (0, 9): (14, 0b00000000001111), (1, 9): (14, 0b00000000001110),
    (2, 9): (13, 0b0000000001001), (3, 9): (11, 0b00000000100),
    (0, 10): (14, 0b00000000001011), (1, 10): (14, 0b00000000001010),
    (2, 10): (14, 0b00000000001101), (3, 10): (13, 0b0000000001100),
    (0, 11): (15, 0b000000000001111), (1, 11): (15, 0b000000000001110),
    (2, 11): (14, 0b00000000001001), (3, 11): (14, 0b00000000001100),
    (0, 12): (15, 0b000000000001011), (1, 12): (15, 0b000000000001010),
    (2, 12): (15, 0b000000000001101), (3, 12): (14, 0b00000000001000),
    (0, 13): (16, 0b0000000000001111), (1, 13): (15, 0b000000000000001),
    (2, 13): (15, 0b000000000001001), (3, 13): (15, 0b000000000001100),
    (0, 14): (16, 0b0000000000001011), (1, 14): (16, 0b0000000000001110),
    (2, 14): (16, 0b0000000000001101), (3, 14): (15, 0b000000000001000),
    (0, 15): (16, 0b0000000000000111), (1, 15): (16, 0b0000000000001010),
    (2, 15): (16, 0b0000000000001001), (3, 15): (16, 0b0000000000001100),
    (0, 16): (16, 0b0000000000000100), (1, 16): (16, 0b0000000000000110),
    (2, 16): (16, 0b0000000000000101), (3, 16): (16, 0b0000000000001000),
}

_CT_NC2 = {  # 2 <= nC < 4
    (0, 0): (2, 0b11),
    (0, 1): (6, 0b001011), (1, 1): (2, 0b10),
    (0, 2): (6, 0b000111), (1, 2): (5, 0b00111), (2, 2): (3, 0b011),
    (0, 3): (7, 0b0000111), (1, 3): (6, 0b001010),
    (2, 3): (6, 0b001001), (3, 3): (4, 0b0101),
    (0, 4): (8, 0b00000111), (1, 4): (6, 0b000110),
    (2, 4): (6, 0b000101), (3, 4): (4, 0b0100),
    (0, 5): (8, 0b00000100), (1, 5): (7, 0b0000110),
    (2, 5): (7, 0b0000101), (3, 5): (5, 0b00110),
    (0, 6): (9, 0b000000111), (1, 6): (8, 0b00000110),
    (2, 6): (8, 0b00000101), (3, 6): (6, 0b001000),
    (0, 7): (11, 0b00000001111), (1, 7): (9, 0b000000110),
    (2, 7): (9, 0b000000101), (3, 7): (6, 0b000100),
    (0, 8): (11, 0b00000001011), (1, 8): (11, 0b00000001110),
    (2, 8): (11, 0b00000001101), (3, 8): (7, 0b0000100),
    (0, 9): (12, 0b000000001111), (1, 9): (11, 0b00000001010),
    (2, 9): (11, 0b00000001001), (3, 9): (9, 0b000000100),
    (0, 10): (12, 0b000000001011), (1, 10): (12, 0b000000001110),
    (2, 10): (12, 0b000000001101), (3, 10): (11, 0b00000001100),
    (0, 11): (12, 0b000000001000), (1, 11): (12, 0b000000001010),
    (2, 11): (12, 0b000000001001), (3, 11): (11, 0b00000001000),
    (0, 12): (13, 0b0000000001111), (1, 12): (13, 0b0000000001110),
    (2, 12): (13, 0b0000000001101), (3, 12): (12, 0b000000001100),
    (0, 13): (13, 0b0000000001011), (1, 13): (13, 0b0000000001010),
    (2, 13): (13, 0b0000000001001), (3, 13): (13, 0b0000000001100),
    (0, 14): (13, 0b0000000000111), (1, 14): (14, 0b00000000001011),
    (2, 14): (13, 0b0000000000110), (3, 14): (13, 0b0000000001000),
    (0, 15): (14, 0b00000000001001), (1, 15): (14, 0b00000000001000),
    (2, 15): (14, 0b00000000001010), (3, 15): (13, 0b0000000000001),
    (0, 16): (14, 0b00000000000111), (1, 16): (14, 0b00000000000110),
    (2, 16): (14, 0b00000000000101), (3, 16): (14, 0b00000000000100),
}

_CT_NC4 = {  # 4 <= nC < 8
    (0, 0): (4, 0b1111),
    (0, 1): (6, 0b001111), (1, 1): (4, 0b1110),
    (0, 2): (6, 0b001011), (1, 2): (5, 0b01111), (2, 2): (4, 0b1101),
    (0, 3): (6, 0b001000), (1, 3): (5, 0b01100),
    (2, 3): (5, 0b01110), (3, 3): (4, 0b1100),
    (0, 4): (7, 0b0001111), (1, 4): (5, 0b01010),
    (2, 4): (5, 0b01011), (3, 4): (4, 0b1011),
    (0, 5): (7, 0b0001011), (1, 5): (5, 0b01000),
    (2, 5): (5, 0b01001), (3, 5): (4, 0b1010),
    (0, 6): (7, 0b0001001), (1, 6): (6, 0b001110),
    (2, 6): (6, 0b001101), (3, 6): (4, 0b1001),
    (0, 7): (7, 0b0001000), (1, 7): (6, 0b001010),
    (2, 7): (6, 0b001001), (3, 7): (4, 0b1000),
    (0, 8): (8, 0b00001111), (1, 8): (7, 0b0001110),
    (2, 8): (7, 0b0001101), (3, 8): (5, 0b01101),
    (0, 9): (8, 0b00001011), (1, 9): (8, 0b00001110),
    (2, 9): (7, 0b0001010), (3, 9): (6, 0b001100),
    (0, 10): (9, 0b000001111), (1, 10): (8, 0b00001010),
    (2, 10): (8, 0b00001101), (3, 10): (7, 0b0001100),
    (0, 11): (9, 0b000001011), (1, 11): (9, 0b000001110),
    (2, 11): (8, 0b00001001), (3, 11): (8, 0b00001100),
    (0, 12): (9, 0b000001000), (1, 12): (9, 0b000001010),
    (2, 12): (9, 0b000001101), (3, 12): (8, 0b00001000),
    (0, 13): (10, 0b0000001101), (1, 13): (9, 0b000000111),
    (2, 13): (9, 0b000001001), (3, 13): (9, 0b000001100),
    (0, 14): (10, 0b0000001001), (1, 14): (10, 0b0000001100),
    (2, 14): (10, 0b0000001011), (3, 14): (10, 0b0000001010),
    (0, 15): (10, 0b0000000101), (1, 15): (10, 0b0000001000),
    (2, 15): (10, 0b0000000111), (3, 15): (10, 0b0000000110),
    (0, 16): (10, 0b0000000001), (1, 16): (10, 0b0000000100),
    (2, 16): (10, 0b0000000011), (3, 16): (10, 0b0000000010),
}

_CT_CHROMA_DC = {  # nC == -1 (chroma DC, 4:2:0 -> max 4 coeffs)
    (0, 0): (2, 0b01),
    (0, 1): (6, 0b000111), (1, 1): (1, 0b1),
    (0, 2): (6, 0b000100), (1, 2): (6, 0b000110), (2, 2): (3, 0b001),
    (0, 3): (6, 0b000011), (1, 3): (7, 0b0000011),
    (2, 3): (7, 0b0000010), (3, 3): (6, 0b000101),
    (0, 4): (6, 0b000010), (1, 4): (8, 0b00000011),
    (2, 4): (8, 0b00000010), (3, 4): (7, 0b0000000),
}

# total_zeros for 4x4 blocks (Tables 9-7 / 9-8): _TZ[total_coeff-1] is
# a list indexed by total_zeros of (length, code); None = impossible.
_TZ = [
    # tc=1: tz 0..15
    [(1, 1), (3, 0b011), (3, 0b010), (4, 0b0011), (4, 0b0010),
     (5, 0b00011), (5, 0b00010), (6, 0b000011), (6, 0b000010),
     (7, 0b0000011), (7, 0b0000010), (8, 0b00000011), (8, 0b00000010),
     (9, 0b000000011), (9, 0b000000010), (9, 0b000000001)],
    # tc=2: tz 0..14
    [(3, 0b111), (3, 0b110), (3, 0b101), (3, 0b100), (3, 0b011),
     (4, 0b0101), (4, 0b0100), (4, 0b0011), (4, 0b0010), (5, 0b00011),
     (5, 0b00010), (6, 0b000011), (6, 0b000010), (6, 0b000001),
     (6, 0b000000)],
    # tc=3: tz 0..13
    [(4, 0b0101), (3, 0b111), (3, 0b110), (3, 0b101), (4, 0b0100),
     (4, 0b0011), (3, 0b100), (3, 0b011), (4, 0b0010), (5, 0b00011),
     (5, 0b00010), (6, 0b000001), (5, 0b00001), (6, 0b000000)],
    # tc=4: tz 0..12
    [(5, 0b00011), (3, 0b111), (4, 0b0101), (4, 0b0100), (3, 0b110),
     (3, 0b101), (3, 0b100), (4, 0b0011), (3, 0b011), (4, 0b0010),
     (5, 0b00010), (5, 0b00001), (5, 0b00000)],
    # tc=5: tz 0..11
    [(4, 0b0101), (4, 0b0100), (4, 0b0011), (3, 0b111), (3, 0b110),
     (3, 0b101), (3, 0b100), (3, 0b011), (4, 0b0010), (5, 0b00001),
     (4, 0b0001), (5, 0b00000)],
    # tc=6: tz 0..10
    [(6, 0b000001), (5, 0b00001), (3, 0b111), (3, 0b110), (3, 0b101),
     (3, 0b100), (3, 0b011), (3, 0b010), (4, 0b0001), (3, 0b001),
     (6, 0b000000)],
    # tc=7: tz 0..9
    [(6, 0b000001), (5, 0b00001), (3, 0b101), (3, 0b100), (3, 0b011),
     (2, 0b11), (3, 0b010), (4, 0b0001), (3, 0b001), (6, 0b000000)],
    # tc=8: tz 0..8
    [(6, 0b000001), (4, 0b0001), (5, 0b00001), (3, 0b011), (2, 0b11),
     (2, 0b10), (4, 0b0010), (3, 0b010), (6, 0b000000)],
    # tc=9: tz 0..7
    [(6, 0b000001), (6, 0b000000), (4, 0b0001), (2, 0b11), (2, 0b10),
     (3, 0b001), (2, 0b01), (5, 0b00001)],
    # tc=10: tz 0..6
    [(5, 0b00001), (5, 0b00000), (3, 0b001), (2, 0b11), (2, 0b10),
     (2, 0b01), (4, 0b0001)],
    # tc=11: tz 0..5
    [(4, 0b0000), (4, 0b0001), (3, 0b001), (3, 0b010), (1, 0b1),
     (3, 0b011)],
    # tc=12: tz 0..4
    [(4, 0b0000), (4, 0b0001), (2, 0b01), (1, 0b1), (3, 0b001)],
    # tc=13: tz 0..3
    [(3, 0b000), (3, 0b001), (1, 0b1), (2, 0b01)],
    # tc=14: tz 0..2
    [(2, 0b00), (2, 0b01), (1, 0b1)],
    # tc=15: tz 0..1
    [(1, 0b0), (1, 0b1)],
]

# total_zeros for chroma DC (4:2:0, Table 9-9a): _TZ_CDC[tc-1][tz]
_TZ_CDC = [
    [(1, 1), (2, 0b01), (3, 0b001), (3, 0b000)],  # tc=1: tz 0..3
    [(1, 1), (2, 0b01), (2, 0b00)],               # tc=2: tz 0..2
    [(1, 1), (1, 0b0)],                           # tc=3: tz 0..1
]

# run_before (Table 9-10): _RB[min(zeros_left,7)-1][run] -> (len, code)
_RB = [
    [(1, 1), (1, 0)],                                  # zerosLeft=1
    [(1, 1), (2, 0b01), (2, 0b00)],                    # 2
    [(2, 0b11), (2, 0b10), (2, 0b01), (2, 0b00)],      # 3
    [(2, 0b11), (2, 0b10), (2, 0b01), (3, 0b001), (3, 0b000)],  # 4
    [(2, 0b11), (2, 0b10), (3, 0b011), (3, 0b010), (3, 0b001),
     (3, 0b000)],                                      # 5
    [(2, 0b11), (3, 0b000), (3, 0b001), (3, 0b011), (3, 0b010),
     (3, 0b101), (3, 0b100)],                          # 6
    # zerosLeft > 6: runs 0..6 are 3-bit 111..001, run r >= 7 is
    # (r - 3) zeros then a 1 — handled in code, first 7 listed here
    [(3, 0b111), (3, 0b110), (3, 0b101), (3, 0b100), (3, 0b011),
     (3, 0b010), (3, 0b001)],
]


def _invert_vlc(table: dict) -> dict:
    """(length, code) -> (t1s, total_coeff) decode map."""
    return {lc: k for k, lc in table.items()}


_CT_DEC = {
    0: _invert_vlc(_CT_NC0),
    2: _invert_vlc(_CT_NC2),
    4: _invert_vlc(_CT_NC4),
    -1: _invert_vlc(_CT_CHROMA_DC),
}


def _ct_context(nC: int) -> int:
    if nC == -1:
        return -1
    if nC < 2:
        return 0
    if nC < 4:
        return 2
    if nC < 8:
        return 4
    return 8


def _read_vlc(b: _Bits, dec: dict, max_len: int = 16) -> tuple[int, int]:
    code, length = 0, 0
    while length < max_len:
        code = (code << 1) | b.u(1)
        length += 1
        hit = dec.get((length, code))
        if hit is not None:
            return hit
    raise ValueError("invalid VLC code")


def _read_coeff_token(b: _Bits, nC: int) -> tuple[int, int]:
    """-> (trailing_ones, total_coeff)."""
    ctx = _ct_context(nC)
    if ctx == 8:  # FLC: 6 bits = (total_coeff-1) << 2 | t1s, 000011 = 0,0
        v = b.u(6)
        if v == 0b000011:
            return 0, 0
        return v & 3, (v >> 2) + 1
    return _read_vlc(b, _CT_DEC[ctx])


def _read_total_zeros(b: _Bits, total_coeff: int, chroma_dc: bool) -> int:
    table = _TZ_CDC[total_coeff - 1] if chroma_dc else _TZ[total_coeff - 1]
    dec = {lc: tz for tz, lc in enumerate(table) if lc is not None}
    return _read_vlc(b, dec, max_len=9)


def _read_run_before(b: _Bits, zeros_left: int) -> int:
    if zeros_left > 6:
        code, length = 0, 0
        while length < 3:
            code = (code << 1) | b.u(1)
            length += 1
        if code != 0:
            return 7 - code
        # 000 read; count further zeros then the terminating 1
        run = 7
        while b.u(1) == 0:
            run += 1
            if run > 14:
                raise ValueError("run_before overflow")
        return run
    dec = {lc: r for r, lc in enumerate(_RB[zeros_left - 1])}
    return _read_vlc(b, dec, max_len=3)


def _residual_block(
    b: _Bits, nC: int, max_coeffs: int
) -> tuple[list[int], int]:
    """CAVLC residual_block_cavlc (9.2) -> (coeffs in scan order
    [max_coeffs], total_coeff)."""
    t1s, total = _read_coeff_token(b, nC)
    coeffs = [0] * max_coeffs
    if total == 0:
        return coeffs, 0
    levels: list[int] = []
    for _ in range(t1s):
        levels.append(-1 if b.u(1) else 1)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(t1s, total):
        prefix = 0
        while b.u(1) == 0:
            prefix += 1
            if prefix > 31:
                raise ValueError("level_prefix overflow")
        code = min(15, prefix) << suffix_len
        if suffix_len > 0 or prefix >= 14:
            size = suffix_len
            if prefix == 14 and suffix_len == 0:
                size = 4
            elif prefix >= 15:
                size = prefix - 3
            if size:
                code += b.u(size)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1s and t1s < 3:
            code += 2
        level = (code + 2) >> 1
        if code & 1:
            level = -level
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeffs:
        zeros_left = _read_total_zeros(b, total, max_coeffs == 4)
    else:
        zeros_left = 0
    pos = total - 1 + zeros_left  # scan index of the highest coeff
    for i, lv in enumerate(levels):
        coeffs[pos] = lv
        if i == total - 1:
            break
        run = _read_run_before(b, zeros_left) if zeros_left > 0 else 0
        zeros_left -= run
        if zeros_left < 0:
            raise ValueError("run_before exceeds zeros_left")
        pos -= run + 1
        if pos < 0:
            raise ValueError("coefficient position underflow")
    return coeffs, total


# -------------------------------------------- dequant / inverse transform

# LevelScale4x4 grouping (8.5.9): position class 0 = {(0,0),(0,2),
# (2,0),(2,2)}, class 1 = {(1,1),(1,3),(3,1),(3,3)}, class 2 = rest.
_LS_V = [
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]
_POS_CLASS = np.array(
    [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]]
)

# 4x4 zigzag scan (Table 8-13, frame coding)
_SCAN4 = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]

_QPC_TABLE = list(range(30)) + [
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
    38, 38, 38, 39, 39, 39, 39,
]


def _chroma_qp(qp: int, offset: int) -> int:
    return _QPC_TABLE[max(0, min(51, qp + offset))]


def _level_scale(qp: int) -> np.ndarray:
    v = _LS_V[qp % 6]
    return np.array(v)[_POS_CLASS]


def _dequant4x4(coeffs: np.ndarray, qp: int, skip_dc: bool) -> np.ndarray:
    """8.5.12.1: scale a 4x4 block of levels (natural order) to
    transform-domain values; ``skip_dc`` leaves [0,0] untouched (the
    Intra16x16 / chroma DC paths substitute it separately)."""
    ls = _level_scale(qp)
    d = coeffs.astype(np.int64)
    if qp >= 24:
        out = (d * ls) << (qp // 6 - 4)
    else:
        shift = 4 - qp // 6
        out = (d * ls + (1 << (shift - 1))) >> shift
    if skip_dc:
        out[0, 0] = d[0, 0]
    return out


def _itransform4x4(d: np.ndarray) -> np.ndarray:
    """8.5.12.2 integer inverse core transform, returns residual
    (includes the final (x + 32) >> 6)."""
    d = d.astype(np.int64)
    e = np.empty_like(d)
    # horizontal
    e0 = d[:, 0] + d[:, 2]
    e1 = d[:, 0] - d[:, 2]
    e2 = (d[:, 1] >> 1) - d[:, 3]
    e3 = d[:, 1] + (d[:, 3] >> 1)
    e[:, 0] = e0 + e3
    e[:, 1] = e1 + e2
    e[:, 2] = e1 - e2
    e[:, 3] = e0 - e3
    f = np.empty_like(e)
    g0 = e[0, :] + e[2, :]
    g1 = e[0, :] - e[2, :]
    g2 = (e[1, :] >> 1) - e[3, :]
    g3 = e[1, :] + (e[3, :] >> 1)
    f[0, :] = g0 + g3
    f[1, :] = g1 + g2
    f[2, :] = g1 - g2
    f[3, :] = g0 - g3
    return (f + 32) >> 6


def _ihadamard4(c: np.ndarray) -> np.ndarray:
    """8.5.10 inverse Hadamard for the Intra16x16 luma DC block."""
    c = c.astype(np.int64)
    m = np.empty_like(c)
    a0 = c[:, 0] + c[:, 2]
    a1 = c[:, 0] - c[:, 2]
    a2 = c[:, 1] - c[:, 3]
    a3 = c[:, 1] + c[:, 3]
    m[:, 0] = a0 + a3
    m[:, 1] = a1 + a2
    m[:, 2] = a1 - a2
    m[:, 3] = a0 - a3
    out = np.empty_like(m)
    b0 = m[0, :] + m[2, :]
    b1 = m[0, :] - m[2, :]
    b2 = m[1, :] - m[3, :]
    b3 = m[1, :] + m[3, :]
    out[0, :] = b0 + b3
    out[1, :] = b1 + b2
    out[2, :] = b1 - b2
    out[3, :] = b0 - b3
    return out


def _scale_luma_dc(f: np.ndarray, qp: int) -> np.ndarray:
    ls00 = _LS_V[qp % 6][0]
    if qp >= 36:
        return (f * ls00) << (qp // 6 - 6)
    shift = 6 - qp // 6
    return (f * ls00 + (1 << (shift - 1))) >> shift


def _scale_chroma_dc(f: np.ndarray, qp: int) -> np.ndarray:
    ls00 = _LS_V[qp % 6][0]
    return ((f * ls00) << (qp // 6)) >> 5


# --------------------------------------------------- intra prediction

def _clip8(a: np.ndarray) -> np.ndarray:
    return np.clip(a, 0, 255)


def _pred4x4(
    mode: int,
    t: np.ndarray | None,   # p[0..7, -1] (top + top-right), int64
    l: np.ndarray | None,   # p[-1, 0..3]
    c: int | None,          # p[-1, -1]
) -> np.ndarray:
    """8.3.1.2 Intra_4x4 sample prediction. ``t``/``l``/``c`` are None
    when unavailable (conformant streams never select a mode whose
    samples are missing; for robustness a missing input falls back to
    DC-style defaults instead of raising)."""
    p = np.zeros((4, 4), dtype=np.int64)
    if mode == 0 and t is not None:  # Vertical
        p[:, :] = t[:4]
        return p
    if mode == 1 and l is not None:  # Horizontal
        p[:, :] = l[:, None]
        return p
    if mode == 2:  # DC
        if t is not None and l is not None:
            p[:, :] = (int(t[:4].sum()) + int(l.sum()) + 4) >> 3
        elif l is not None:
            p[:, :] = (int(l.sum()) + 2) >> 2
        elif t is not None:
            p[:, :] = (int(t[:4].sum()) + 2) >> 2
        else:
            p[:, :] = 128
        return p
    if t is None:
        t = np.full(8, 128, dtype=np.int64)
    if l is None:
        l = np.full(4, 128, dtype=np.int64)
    if c is None:
        c = 128
    if mode == 3:  # Diagonal-Down-Left
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    p[y, x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2
        return p
    if mode == 4:  # Diagonal-Down-Right
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (t[x - y - 2] + 2 * t[x - y - 1] + t[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (l[y - x - 2] + 2 * l[y - x - 1] + l[y - x] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * c + l[0] + 2) >> 2
        return p
    if mode == 5:  # Vertical-Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (t[x - (y >> 1) - 1] + t[x - (y >> 1)] + 1) >> 1
                elif z >= 0:
                    p[y, x] = (
                        t[x - (y >> 1) - 2] + 2 * t[x - (y >> 1) - 1]
                        + t[x - (y >> 1)] + 2
                    ) >> 2
                elif z == -1:
                    p[y, x] = (l[0] + 2 * c + t[0] + 2) >> 2
                else:
                    p[y, x] = (l[y - 1] + 2 * l[y - 2] + l[y - 3] + 2) >> 2
        return p
    if mode == 6:  # Horizontal-Down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (l[y - (x >> 1) - 1] + l[y - (x >> 1)] + 1) >> 1
                elif z >= 0:
                    p[y, x] = (
                        l[y - (x >> 1) - 2] + 2 * l[y - (x >> 1) - 1]
                        + l[y - (x >> 1)] + 2
                    ) >> 2
                elif z == -1:
                    p[y, x] = (l[0] + 2 * c + t[0] + 2) >> 2
                else:
                    p[y, x] = (t[x - 1] + 2 * t[x - 2] + t[x - 3] + 2) >> 2
        return p
    if mode == 7:  # Vertical-Left
        for y in range(4):
            for x in range(4):
                if y % 2 == 0:
                    p[y, x] = (t[x + (y >> 1)] + t[x + (y >> 1) + 1] + 1) >> 1
                else:
                    p[y, x] = (
                        t[x + (y >> 1)] + 2 * t[x + (y >> 1) + 1]
                        + t[x + (y >> 1) + 2] + 2
                    ) >> 2
        return p
    if mode == 8:  # Horizontal-Up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z % 2 == 0 and z < 5:
                    p[y, x] = (l[y + (x >> 1)] + l[y + (x >> 1) + 1] + 1) >> 1
                elif z < 5:
                    p[y, x] = (
                        l[y + (x >> 1)] + 2 * l[y + (x >> 1) + 1]
                        + l[y + (x >> 1) + 2] + 2
                    ) >> 2
                elif z == 5:
                    p[y, x] = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    p[y, x] = l[3]
        return p
    # unavailable-mode fallback (non-conformant input): flat DC
    p[:, :] = 128
    return p


def _pred16x16(
    mode: int,
    t: np.ndarray | None,
    l: np.ndarray | None,
    c: int | None,
) -> np.ndarray:
    """8.3.2 Intra_16x16 prediction (modes 0-3)."""
    p = np.zeros((16, 16), dtype=np.int64)
    if mode == 0 and t is not None:
        p[:, :] = t
        return p
    if mode == 1 and l is not None:
        p[:, :] = l[:, None]
        return p
    if mode == 2:
        if t is not None and l is not None:
            p[:, :] = (int(t.sum()) + int(l.sum()) + 16) >> 5
        elif l is not None:
            p[:, :] = (int(l.sum()) + 8) >> 4
        elif t is not None:
            p[:, :] = (int(t.sum()) + 8) >> 4
        else:
            p[:, :] = 128
        return p
    if mode == 3 and t is not None and l is not None and c is not None:
        tt = np.concatenate(([c], t)).astype(np.int64)  # tt[1+x] = p[x,-1]
        ll = np.concatenate(([c], l)).astype(np.int64)
        H = sum((x + 1) * (tt[1 + 8 + x] - tt[1 + 6 - x]) for x in range(8))
        V = sum((y + 1) * (ll[1 + 8 + y] - ll[1 + 6 - y]) for y in range(8))
        a = 16 * (int(l[15]) + int(t[15]))
        b = (5 * H + 32) >> 6
        cc = (5 * V + 32) >> 6
        ys, xs = np.mgrid[0:16, 0:16]
        p = (a + b * (xs - 7) + cc * (ys - 7) + 16) >> 5
        return _clip8(p)
    p[:, :] = 128
    return p


def _pred_chroma8x8(
    mode: int,
    t: np.ndarray | None,
    l: np.ndarray | None,
    c: int | None,
) -> np.ndarray:
    """8.3.3 chroma prediction (8x8, modes: 0 DC, 1 horizontal,
    2 vertical, 3 plane)."""
    p = np.zeros((8, 8), dtype=np.int64)
    if mode == 1 and l is not None:
        p[:, :] = l[:, None]
        return p
    if mode == 2 and t is not None:
        p[:, :] = t
        return p
    if mode == 3 and t is not None and l is not None and c is not None:
        tt = np.concatenate(([c], t)).astype(np.int64)
        ll = np.concatenate(([c], l)).astype(np.int64)
        H = sum((x + 1) * (tt[1 + 4 + x] - tt[1 + 2 - x]) for x in range(4))
        V = sum((y + 1) * (ll[1 + 4 + y] - ll[1 + 2 - y]) for y in range(4))
        a = 16 * (int(l[7]) + int(t[7]))
        b = (17 * H + 16) >> 5
        cc = (17 * V + 16) >> 5
        ys, xs = np.mgrid[0:8, 0:8]
        p = (a + b * (xs - 3) + cc * (ys - 3) + 16) >> 5
        return _clip8(p)
    if mode == 0:  # DC, per 4x4 quadrant (8.3.3.1)
        for yo in (0, 4):
            for xo in (0, 4):
                ts = t[xo : xo + 4] if t is not None else None
                ls = l[yo : yo + 4] if l is not None else None
                if xo == 0 and yo == 0 or xo == 4 and yo == 4:
                    if ts is not None and ls is not None:
                        v = (int(ts.sum()) + int(ls.sum()) + 4) >> 3
                    elif ls is not None:
                        v = (int(ls.sum()) + 2) >> 2
                    elif ts is not None:
                        v = (int(ts.sum()) + 2) >> 2
                    else:
                        v = 128
                elif xo == 4 and yo == 0:
                    if ts is not None:
                        v = (int(ts.sum()) + 2) >> 2
                    elif ls is not None:
                        v = (int(ls.sum()) + 2) >> 2
                    else:
                        v = 128
                else:  # xo == 0, yo == 4
                    if ls is not None:
                        v = (int(ls.sum()) + 2) >> 2
                    elif ts is not None:
                        v = (int(ts.sum()) + 2) >> 2
                    else:
                        v = 128
                p[yo : yo + 4, xo : xo + 4] = v
        return p
    p[:, :] = 128
    return p


# Table 9-4, intra column: codeNum -> coded_block_pattern (I_4x4/I_8x8)
_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}

# Table 9-4, Inter column (coded_block_pattern mapping for inter-coded
# macroblocks, ChromaArrayType == 1)
_CBP_INTER = [
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13, 14, 6,
    9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46, 17, 18,
    20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
]
_CBP_INTER_INV = {cbp: i for i, cbp in enumerate(_CBP_INTER)}

# zig-zag ordering of the 16 luma 4x4 blocks within a MB: blkIdx ->
# (bx, by) in 4x4-block units
_BLK_POS = [
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3),
]


# ------------------------------------------------------ slice decoding

class _Frame:
    """Reconstruction state for one picture: planes + per-4x4-block
    bookkeeping used by neighbour-dependent decoding (nC contexts,
    Intra4x4 mode prediction, constructive sample availability)."""

    def __init__(self, sps: dict) -> None:
        self.wmb = sps["width_mbs"]
        self.hmb = sps["height_mbs"]
        self.y = np.zeros((self.hmb * 16, self.wmb * 16), dtype=np.int64)
        self.cb = np.zeros((self.hmb * 8, self.wmb * 8), dtype=np.int64)
        self.cr = np.zeros((self.hmb * 8, self.wmb * 8), dtype=np.int64)
        # total_coeff per 4x4 block (luma; chroma per component)
        self.nc_y = np.zeros((self.hmb * 4, self.wmb * 4), dtype=np.int16)
        self.nc_cb = np.zeros((self.hmb * 2, self.wmb * 2), dtype=np.int16)
        self.nc_cr = np.zeros((self.hmb * 2, self.wmb * 2), dtype=np.int16)
        # -1 = not decoded; else slice id (availability = same slice)
        self.slice_of_mb = np.full((self.hmb, self.wmb), -1, dtype=np.int32)
        # Intra4x4PredMode per 4x4 block; -1 = not an I4x4 block (treated
        # as DC=2 in prediction when the MB is intra, per 8.3.1.1)
        self.i4_mode = np.full((self.hmb * 4, self.wmb * 4), -1, dtype=np.int8)
        # decoded-sample availability at 4x4 granularity — marking
        # blocks as they are reconstructed reproduces the spec's
        # top-right availability rules constructively
        self.done4 = np.zeros((self.hmb * 4, self.wmb * 4), dtype=bool)
        # per-MB QPY for the deblocking filter (0 for I_PCM per
        # 8.7.2, damping the filter on its lossless samples)
        self.qp_deblock = np.zeros((self.hmb, self.wmb), dtype=np.int32)
        # slice id -> (disable_deblocking_filter_idc, alpha_off, beta_off)
        self.slice_params: dict[int, tuple[int, int, int]] = {}
        # per-4x4 motion state (P/B slices): per-list MV in quarter-luma
        # units and reference index — -2 = not yet decoded, -1 = list
        # unused (intra, or the other list only; mv treated as (0,0) by
        # 8.4.1.3.2), 0 = ref0 of that list. mv4/ref4 are list 0,
        # mv4b/ref4b list 1 (B slices only).
        self.mv4 = np.zeros((self.hmb * 4, self.wmb * 4, 2), dtype=np.int32)
        self.ref4 = np.full((self.hmb * 4, self.wmb * 4), -2, dtype=np.int8)
        self.mv4b = np.zeros((self.hmb * 4, self.wmb * 4, 2), dtype=np.int32)
        self.ref4b = np.full((self.hmb * 4, self.wmb * 4), -2, dtype=np.int8)

    def mb_avail(self, mbx: int, mby: int, cur_slice: int) -> bool:
        if mbx < 0 or mby < 0 or mbx >= self.wmb or mby >= self.hmb:
            return False
        return self.slice_of_mb[mby, mbx] == cur_slice


def _luma_neighbors(
    fr: _Frame, px: int, py: int, n: int, cur_slice: int, plane: np.ndarray,
    done: np.ndarray, gran: int,
) -> tuple[np.ndarray | None, np.ndarray | None, int | None]:
    """Gather (top[0:n or 2n], left[0:n], corner) for an n x n block at
    pixel (px, py) of ``plane``; ``done`` is the 4x4 (luma) or 4x4-
    chroma availability map with granularity ``gran`` pixels. Top is
    length 2n for n == 4 (top-right rule: unavailable tail replicates
    t[n-1]); length n otherwise. A sample is available only when its
    block is decoded AND its macroblock belongs to ``cur_slice`` —
    slices are independently decodable, so intra prediction never
    crosses a slice boundary (8.3)."""
    h, w = plane.shape
    mb_px = gran * 4  # pixels per MB side in this plane

    def avail(x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= w or y >= h:
            return False
        if fr.slice_of_mb[y // mb_px, x // mb_px] != cur_slice:
            return False
        return bool(done[y // gran, x // gran])

    top = None
    if py > 0 and avail(px, py - 1):
        if n == 4:
            t = np.empty(8, dtype=np.int64)
            t[:4] = plane[py - 1, px : px + 4]
            if avail(px + 4, py - 1):
                t[4:] = plane[py - 1, px + 4 : px + 8]
            else:
                t[4:] = t[3]
            top = t
        else:
            top = plane[py - 1, px : px + n].astype(np.int64)
    left = None
    if px > 0 and avail(px - 1, py):
        left = plane[py : py + n, px - 1].astype(np.int64)
    corner = None
    if px > 0 and py > 0 and avail(px - 1, py - 1):
        corner = int(plane[py - 1, px - 1])
    return top, left, corner


def _nc_for(
    fr: _Frame, nc_map: np.ndarray, bx: int, by: int, mb_gran: int,
    cur_slice: int,
) -> int:
    """9.2.1 nC from left/top neighbour blocks' total_coeff. ``mb_gran``
    is blocks-per-MB-side (4 luma, 2 chroma)."""

    def blk_avail(x: int, y: int) -> int | None:
        if x < 0 or y < 0:
            return None
        if x >= nc_map.shape[1] or y >= nc_map.shape[0]:
            return None
        if fr.slice_of_mb[y // mb_gran, x // mb_gran] != cur_slice:
            return None
        return int(nc_map[y, x])

    na = blk_avail(bx - 1, by)
    nb = blk_avail(bx, by - 1)
    if na is not None and nb is not None:
        return (na + nb + 1) >> 1
    if na is not None:
        return na
    if nb is not None:
        return nb
    return 0


def _zig_to_nat(coeffs: list[int]) -> np.ndarray:
    """16 zig-zag-scanned levels -> natural-order 4x4."""
    out = np.zeros((4, 4), dtype=np.int64)
    for i, (r, cidx) in enumerate(_SCAN4):
        out[r, cidx] = coeffs[i]
    return out


def _decode_slice(
    fr: _Frame, b: _Bits, sps: dict, pps: dict, nal_type: int,
    slice_id: int, nal_ref_idc: int = 3, refs: list | None = None,
) -> None:
    """Parse one I-, P- or B-slice header + data into ``fr``. ``refs``
    is the reference picture list as (y, cb, cr) plane tuples, most
    recent first (post-deblock): P slices predict from refs[0]; B
    slices use L0 = refs[0] and L1 = refs[1] (backward-only
    bi-prediction — with no future references, the default RefPicList1
    equals RefPicList0 and the spec swaps its first two entries, so
    L1[0] is the second-most-recent picture). Raises ValueError on
    unsupported shapes (direct/skip B modes, multi-ref L1, weighted
    bi-prediction, sub-8x8 partitions, constrained intra in P/B,
    ASO)."""
    first_mb = b.ue()
    slice_type = b.ue()
    st = slice_type % 5
    if st not in (0, 1, 2):
        raise ValueError("only I/P/B slices supported")
    is_p = st == 0
    is_b = st == 1
    if is_p and not refs:
        raise ValueError("P slice without a reference picture")
    if is_b and (refs is None or len(refs) < 2):
        raise ValueError("B slice without two reference pictures")
    if (is_p or is_b) and pps.get("constrained_intra", False):
        # 8.3.1: with constrained_intra_pred_flag, intra MBs inside
        # P/B slices must treat inter-coded neighbours as unavailable
        # for prediction. The decoder predicts from all decoded
        # neighbours, so decoding such a stream would produce silently
        # wrong pixels — reject cleanly instead.
        raise ValueError(
            "constrained_intra_pred in P/B slices unsupported"
        )
    b.ue()  # pps_id (single active PPS assumed)
    b.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        b.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        b.u(sps["log2_max_poc_lsb"])
    n_active = 1
    wp: dict | None = None
    if is_b:
        b.flag()  # direct_spatial_mv_pred_flag (no direct MBs decoded)
    if is_p or is_b:
        if b.flag():  # num_ref_idx_active_override_flag
            n_active = 1 + b.ue()
            if is_b and b.ue() != 0:
                raise ValueError("multiple L1 references unsupported")
        else:
            n_active = pps.get("num_ref_idx_l0_active", 1)
            if is_b and pps.get("num_ref_idx_l1_active", 1) != 1:
                # without the override flag the PPS L1 default applies;
                # >1 would put te(v) ref_idx_l1 syntax in the stream
                # that this decoder never parses — reject, don't desync
                raise ValueError("multiple L1 references unsupported")
        if is_b and n_active != 1:
            raise ValueError("multiple L0 references in B unsupported")
        if n_active > 2:
            raise ValueError("more than two reference pictures unsupported")
        if is_p and len(refs) < n_active:
            raise ValueError("reference list shorter than active count")
        if b.flag():  # ref_pic_list_modification_flag_l0
            raise ValueError("ref pic list modification unsupported")
        if is_b and b.flag():  # ref_pic_list_modification_flag_l1
            raise ValueError("ref pic list modification unsupported")
        if is_p and pps.get("weighted_pred", False):
            # pred_weight_table (7.3.3.2), explicit P weights
            l_lwd = b.ue()
            c_lwd = b.ue()
            if l_lwd > 7 or c_lwd > 7:
                raise ValueError("bad log2_weight_denom")
            wp = {"l_lwd": l_lwd, "c_lwd": c_lwd, "l": [], "c": []}
            for _ in range(n_active):
                if b.flag():  # luma_weight_l0_flag
                    wp["l"].append((b.se(), b.se()))
                else:
                    wp["l"].append((1 << l_lwd, 0))
                if b.flag():  # chroma_weight_l0_flag
                    wp["c"].append(
                        ((b.se(), b.se()), (b.se(), b.se()))
                    )
                else:
                    wp["c"].append(
                        ((1 << c_lwd, 0), (1 << c_lwd, 0))
                    )
        if is_b and pps.get("weighted_bipred_idc", 0) != 0:
            raise ValueError("weighted bi-prediction unsupported")
    # dec_ref_pic_marking: IDR = two flags; non-IDR reference slices =
    # adaptive_ref_pic_marking_mode_flag (sliding window only)
    if nal_type == 5:
        b.flag()
        b.flag()
    elif nal_ref_idc != 0:
        if b.flag():
            raise ValueError("adaptive ref pic marking unsupported")
    qp = pps["pic_init_qp"] + b.se()
    idc, off_a, off_b = 0, 0, 0
    if pps["deblocking_control_present"]:
        idc = b.ue()
        if idc > 2:
            raise ValueError("bad disable_deblocking_filter_idc")
        if idc != 1:
            off_a = b.se()
            off_b = b.se()
    fr.slice_params[slice_id] = (idc, off_a, off_b)
    n_mbs = fr.wmb * fr.hmb
    if pps.get("entropy_cabac"):
        if not pps.get("_cabac_marker_seen"):
            # conformance boundary: external CABAC streams reject
            # cleanly; only streams carrying the shared-context SEI
            # marker decode (see operators/cabac.py)
            raise ValueError("CABAC without shared-context SEI marker")
        if is_p or is_b:
            from .cabac import decode_pbslice_cabac

            decode_pbslice_cabac(fr, b, pps, qp, slice_id, first_mb,
                                 is_b, refs, n_active, wp)
            return
        from .cabac import decode_islice_cabac

        decode_islice_cabac(fr, b, pps, qp, slice_id, first_mb)
        return
    if not (is_p or is_b):
        for mb_addr in range(first_mb, n_mbs):
            qp = _decode_mb(fr, b, mb_addr, qp, pps, slice_id)
            if not b.more_rbsp_data():
                break
        return
    # P/B slice data: mb_skip_run before every explicitly coded MB
    mb_addr = first_mb
    while mb_addr < n_mbs:
        skip_run = b.ue()
        if is_b and skip_run:
            raise ValueError("B_Skip (direct prediction) unsupported")
        for _ in range(skip_run):
            if mb_addr >= n_mbs:
                raise ValueError("mb_skip_run past slice end")
            _decode_skip_mb(fr, mb_addr, qp, slice_id, refs[0], wp)
            mb_addr += 1
        if mb_addr >= n_mbs or not b.more_rbsp_data():
            break
        mb_type = b.ue()
        if is_b:
            if mb_type == 0:
                raise ValueError("B_Direct_16x16 unsupported")
            if 1 <= mb_type <= 3:
                qp = _decode_mb_inter_b(
                    fr, b, mb_addr, qp, pps, slice_id, mb_type, refs
                )
            elif mb_type <= 22:
                raise ValueError("B partitions / B_8x8 unsupported")
            else:
                qp = _decode_mb(
                    fr, b, mb_addr, qp, pps, slice_id, mb_type - 23
                )
        elif mb_type <= 2:
            qp = _decode_mb_inter(
                fr, b, mb_addr, qp, pps, slice_id, mb_type, refs,
                n_active, wp,
            )
        elif mb_type in (3, 4):
            # P_8x8 / P_8x8ref0 (r14): sub_mb_type per quadrant comes
            # FIRST (7.3.5.2); only P_L0_8x8 (one MV per quadrant)
            # decodes — 8x4/4x8/4x4 sub-shapes reject cleanly. The
            # ref0 variant suppresses ref_idx syntax (all quadrants
            # reference 0), which is exactly n_active = 1.
            for _ in range(4):
                if b.ue() != 0:
                    raise ValueError(
                        "P_8x8 sub-shapes below 8x8 unsupported"
                    )
            qp = _decode_mb_inter(
                fr, b, mb_addr, qp, pps, slice_id, 3, refs,
                n_active if mb_type == 3 else 1, wp,
            )
        else:
            qp = _decode_mb(
                fr, b, mb_addr, qp, pps, slice_id, mb_type - 5
            )
        mb_addr += 1
        if not b.more_rbsp_data():
            break


def _decode_mb(
    fr: _Frame, b: _Bits, mb_addr: int, qp: int, pps: dict, slice_id: int,
    mb_type: int | None = None,
) -> int:
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = slice_id
    ox, oy = mbx * 16, mby * 16  # luma pixel origin
    cx, cy = mbx * 8, mby * 8  # chroma pixel origin
    # every branch below is intra: mark for MV prediction / deblock bS
    fr.ref4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    fr.ref4b[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    if mb_type is None:
        mb_type = b.ue()
    if mb_type > 25:
        raise ValueError(f"bad I mb_type {mb_type}")

    if mb_type == 25:  # I_PCM
        b.byte_align()
        y = np.frombuffer(b.bytes_(256), dtype=np.uint8).reshape(16, 16)
        cb = np.frombuffer(b.bytes_(64), dtype=np.uint8).reshape(8, 8)
        cr = np.frombuffer(b.bytes_(64), dtype=np.uint8).reshape(8, 8)
        fr.y[oy : oy + 16, ox : ox + 16] = y
        fr.cb[cy : cy + 8, cx : cx + 8] = cb
        fr.cr[cy : cy + 8, cx : cx + 8] = cr
        # I_PCM: neighbours see nC = 16 (9.2.1), blocks decoded
        fr.nc_y[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
        fr.nc_cb[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.nc_cr[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.done4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = True
        fr.qp_deblock[mby, mbx] = 0  # I_PCM: QPY taken as 0 for 8.7
        return qp  # QPY_prev for the next MB's delta is unchanged

    if mb_type == 0:  # Intra_4x4
        i4_modes: list[int] = []
        for blk in range(16):
            bx4, by4 = _BLK_POS[blk]
            abx, aby = mbx * 4 + bx4, mby * 4 + by4
            # predicted mode = min(modeA, modeB); non-I4x4 intra MB
            # neighbours count as DC (2); unavailable -> 2
            ma = mb_b = 2

            def nb_mode(x: int, y: int) -> int:
                if x < 0 or y < 0:
                    return -9  # unavailable marker
                if fr.slice_of_mb[y // 4, x // 4] != slice_id:
                    return -9
                m = int(fr.i4_mode[y, x])
                return m if m >= 0 else 2
            a = nb_mode(abx - 1, aby)
            bm = nb_mode(abx, aby - 1)
            if a == -9 or bm == -9:
                pred = 2
            else:
                pred = min(a, bm)
            if b.flag():
                mode = pred
            else:
                rem = b.u(3)
                mode = rem if rem < pred else rem + 1
            i4_modes.append(mode)
            fr.i4_mode[aby, abx] = mode
        chroma_mode = b.ue()
        if chroma_mode > 3:
            raise ValueError("bad intra_chroma_pred_mode")
        cbp_code = b.ue()
        if cbp_code > 47:
            raise ValueError("bad coded_block_pattern")
        cbp = _CBP_INTRA[cbp_code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp > 0:
            qp = (qp + b.se() + 52) % 52
        fr.qp_deblock[mby, mbx] = qp
        # ---- residuals (parse all, bitstream order)
        luma_blocks: list[np.ndarray] = []
        for blk in range(16):
            bx4, by4 = _BLK_POS[blk]
            abx, aby = mbx * 4 + bx4, mby * 4 + by4
            if cbp_luma & (1 << (blk >> 2)):
                nc = _nc_for(fr, fr.nc_y, abx, aby, 4, slice_id)
                coeffs, total = _residual_block(b, nc, 16)
                fr.nc_y[aby, abx] = total
                luma_blocks.append(_zig_to_nat(coeffs))
            else:
                fr.nc_y[aby, abx] = 0
                luma_blocks.append(np.zeros((4, 4), dtype=np.int64))
        dc_cb, dc_cr, ac_cb, ac_cr = _parse_chroma_residual(
            fr, b, mbx, mby, cbp_chroma, slice_id
        )
        # ---- reconstruct luma per block (prediction feeds forward)
        for blk in range(16):
            bx4, by4 = _BLK_POS[blk]
            px, py = ox + bx4 * 4, oy + by4 * 4
            t, l, c = _luma_neighbors(
                fr, px, py, 4, slice_id, fr.y, fr.done4, 4
            )
            pred = _pred4x4(i4_modes[blk], t, l, c)
            if luma_blocks[blk].any():
                d = _dequant4x4(luma_blocks[blk], qp, skip_dc=False)
                res = _itransform4x4(d)
            else:
                res = 0
            fr.y[py : py + 4, px : px + 4] = _clip8(pred + res)
            fr.done4[py // 4, px // 4] = True
        _reconstruct_chroma(
            fr, mbx, mby, chroma_mode, qp, pps, dc_cb, dc_cr, ac_cb, ac_cr,
            slice_id,
        )
        return qp

    # Intra_16x16: mb_type 1..24
    pred_mode = (mb_type - 1) % 4
    cbp_chroma = ((mb_type - 1) // 4) % 3
    cbp_luma = 15 if mb_type > 12 else 0
    chroma_mode = b.ue()
    if chroma_mode > 3:
        raise ValueError("bad intra_chroma_pred_mode")
    qp = (qp + b.se() + 52) % 52  # always present for I_16x16
    fr.qp_deblock[mby, mbx] = qp
    fr.i4_mode[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    # DC block: nC from luma blk0 context
    nc = _nc_for(fr, fr.nc_y, mbx * 4, mby * 4, 4, slice_id)
    dc_coeffs, _dc_total = _residual_block(b, nc, 16)
    # AC blocks
    ac_blocks: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_luma:
            nc = _nc_for(fr, fr.nc_y, abx, aby, 4, slice_id)
            coeffs, total = _residual_block(b, nc, 15)
            fr.nc_y[aby, abx] = total
            ac_blocks.append(_zig_to_nat([0] + coeffs))
        else:
            fr.nc_y[aby, abx] = 0
            ac_blocks.append(np.zeros((4, 4), dtype=np.int64))
    dc_cb, dc_cr, ac_cb, ac_cr = _parse_chroma_residual(
        fr, b, mbx, mby, cbp_chroma, slice_id
    )
    # ---- reconstruct: 16x16 prediction from MB-edge neighbours
    t, l, c = _luma_neighbors(fr, ox, oy, 16, slice_id, fr.y, fr.done4, 4)
    pred = _pred16x16(pred_mode, t, l, c)
    # luma DC: zigzag -> 4x4, inverse Hadamard, scale (8.5.10)
    dc_nat = _zig_to_nat(dc_coeffs)
    dc_scaled = _scale_luma_dc(_ihadamard4(dc_nat), qp)
    recon = np.empty((16, 16), dtype=np.int64)
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        d = _dequant4x4(ac_blocks[blk], qp, skip_dc=True)
        d[0, 0] = dc_scaled[by4, bx4]
        res = _itransform4x4(d)
        recon[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] = (
            pred[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] + res
        )
    fr.y[oy : oy + 16, ox : ox + 16] = _clip8(recon)
    fr.done4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = True
    _reconstruct_chroma(
        fr, mbx, mby, chroma_mode, qp, pps, dc_cb, dc_cr, ac_cb, ac_cr,
        slice_id,
    )
    return qp


def _parse_chroma_residual(
    fr: _Frame, b: _Bits, mbx: int, mby: int, cbp_chroma: int,
    slice_id: int,
) -> tuple[list[int], list[int], list[np.ndarray], list[np.ndarray]]:
    """Chroma DC (2x2 per component) + AC (4 blocks per component)."""
    dc_cb = [0, 0, 0, 0]
    dc_cr = [0, 0, 0, 0]
    if cbp_chroma:
        dc_cb, _ = _residual_block(b, -1, 4)
        dc_cr, _ = _residual_block(b, -1, 4)
    ac_cb: list[np.ndarray] = []
    ac_cr: list[np.ndarray] = []
    for comp, (nc_map, acc) in enumerate(
        ((fr.nc_cb, ac_cb), (fr.nc_cr, ac_cr))
    ):
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            abx, aby = mbx * 2 + bx2, mby * 2 + by2
            if cbp_chroma == 2:
                nc = _nc_for(fr, nc_map, abx, aby, 2, slice_id)
                coeffs, total = _residual_block(b, nc, 15)
                nc_map[aby, abx] = total
                acc.append(_zig_to_nat([0] + coeffs))
            else:
                nc_map[aby, abx] = 0
                acc.append(np.zeros((4, 4), dtype=np.int64))
    return dc_cb, dc_cr, ac_cb, ac_cr


def _reconstruct_chroma(
    fr: _Frame, mbx: int, mby: int, mode: int, qp_y: int, pps: dict,
    dc_cb: list[int], dc_cr: list[int], ac_cb: list[np.ndarray],
    ac_cr: list[np.ndarray], slice_id: int,
    preds: tuple[np.ndarray, np.ndarray] | None = None,
) -> None:
    """``preds`` overrides the intra 8x8 prediction with externally
    computed (pred_cb, pred_cr) planes — the inter (motion-compensated)
    path; residual transform/scaling is identical either way."""
    qpc = _chroma_qp(qp_y, pps["chroma_qp_index_offset"])
    cx, cy = mbx * 8, mby * 8
    for ci, (plane, dc, ac) in enumerate(
        ((fr.cb, dc_cb, ac_cb), (fr.cr, dc_cr, ac_cr))
    ):
        if preds is not None:
            pred = preds[ci]
        else:
            # chroma availability: reuse the luma done-map at MB
            # granularity via a chroma-scaled view — a chroma sample is
            # decoded iff its MB's luma co-site is (chroma decode
            # happens with the MB)
            t, l, c = _luma_neighbors(
                fr, cx, cy, 8, slice_id, plane, fr.done4, 2
            )
            pred = _pred_chroma8x8(mode, t, l, c)
        # 2x2 DC inverse transform + scale (8.5.11)
        cmat = np.array([[dc[0], dc[1]], [dc[2], dc[3]]], dtype=np.int64)
        h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
        f = h2 @ cmat @ h2
        dc_scaled = _scale_chroma_dc(f, qpc)
        recon = np.empty((8, 8), dtype=np.int64)
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            d = _dequant4x4(ac[blk], qpc, skip_dc=True)
            d[0, 0] = dc_scaled[by2, bx2]
            res = _itransform4x4(d)
            recon[by2 * 4 : by2 * 4 + 4, bx2 * 4 : bx2 * 4 + 4] = (
                pred[by2 * 4 : by2 * 4 + 4, bx2 * 4 : bx2 * 4 + 4] + res
            )
        plane[cy : cy + 8, cx : cx + 8] = _clip8(recon)


# ------------------------------------------- inter prediction (P slices)
#
# Single-reference P slices (8.4): quarter-sample luma interpolation
# (6-tap half-pel + quarter averaging, 8.4.2.2.1), eighth-sample
# bilinear chroma (8.4.2.2.2), median MV prediction with the 16x8/8x16
# directional rules (8.4.1.3) and the P_Skip zero-MV conditions
# (8.4.1.1). Reference samples outside the picture are clamped to the
# border, exactly the spec's Clip3 on fetch coordinates.

_K6 = np.array([1, -5, 20, 20, -5, 1], dtype=np.int64)


def _tap6(a: np.ndarray, axis: int) -> np.ndarray:
    """Unshifted 6-tap filter along ``axis``: output length shrinks by
    5 (valid positions only)."""
    n = a.shape[axis] - 5
    sl = [slice(None)] * a.ndim
    out = np.zeros([n if i == axis else s for i, s in enumerate(a.shape)],
                   dtype=np.int64)
    for i in range(6):
        sl[axis] = slice(i, i + n)
        out += _K6[i] * a[tuple(sl)]
    return out


def _mc_luma(
    ref: np.ndarray, y0: int, x0: int, hh: int, ww: int,
    mv: tuple[int, int],
) -> np.ndarray:
    """Motion-compensated luma prediction block (8.4.2.2.1): full /
    half (6-tap, +16 >> 5; center j via unrounded intermediates,
    +512 >> 10) / quarter (averaging per Table 8-12) sample positions."""
    mvx, mvy = mv
    fx, fy = mvx & 3, mvy & 3
    iy, ix = y0 + (mvy >> 2), x0 + (mvx >> 2)
    rh, rw = ref.shape
    rows = np.clip(np.arange(iy - 2, iy + hh + 3), 0, rh - 1)
    cols = np.clip(np.arange(ix - 2, ix + ww + 3), 0, rw - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)  # (hh+5, ww+5)
    g = win[2 : hh + 3, 2 : ww + 3]  # integer grid, (hh+1, ww+1)
    if fx == 0 and fy == 0:
        return g[:hh, :ww]
    # half-pel grids over (hh+1, ww+1)
    bh1 = _tap6(win, 1)  # horizontal intermediates, (hh+5, ww)
    b = _clip8((bh1[2 : hh + 3, : ww + 1] + 16) >> 5)
    hv1 = _tap6(win, 0)  # vertical intermediates, (hh, ww+5)
    hgrid = _clip8((hv1[: hh + 1, 2 : ww + 3] + 16) >> 5)
    j = _clip8((_tap6(bh1, 0)[: hh + 1, : ww + 1] + 512) >> 10)

    def avg(a: np.ndarray, c: np.ndarray) -> np.ndarray:
        return (a[:hh, :ww] + c[:hh, :ww] + 1) >> 1

    g1x = g[:, 1:]
    g1y = g[1:, :]
    m = hgrid[:, 1:]  # h at x+1
    s = b[1:, :]  # b at y+1
    table = {
        (1, 0): lambda: avg(g, b),
        (2, 0): lambda: b[:hh, :ww],
        (3, 0): lambda: avg(b, g1x),
        (0, 1): lambda: avg(g, hgrid),
        (1, 1): lambda: avg(b, hgrid),
        (2, 1): lambda: avg(b, j),
        (3, 1): lambda: avg(b, m),
        (0, 2): lambda: hgrid[:hh, :ww],
        (1, 2): lambda: avg(hgrid, j),
        (2, 2): lambda: j[:hh, :ww],
        (3, 2): lambda: avg(j, m),
        (0, 3): lambda: avg(hgrid, g1y),
        (1, 3): lambda: avg(hgrid, s),
        (2, 3): lambda: avg(j, s),
        (3, 3): lambda: avg(m, s),
    }
    return table[(fx, fy)]()


def _mc_chroma(
    ref: np.ndarray, y0: int, x0: int, hh: int, ww: int,
    mv: tuple[int, int],
) -> np.ndarray:
    """Eighth-sample bilinear chroma prediction (8.4.2.2.2); the luma
    quarter-pel MV is an eighth-pel chroma MV at 4:2:0."""
    mvx, mvy = mv
    dx, dy = mvx & 7, mvy & 7
    iy, ix = y0 + (mvy >> 3), x0 + (mvx >> 3)
    rh, rw = ref.shape
    rows = np.clip(np.arange(iy, iy + hh + 1), 0, rh - 1)
    cols = np.clip(np.arange(ix, ix + ww + 1), 0, rw - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    a = win[:hh, :ww]
    bb = win[:hh, 1:]
    c = win[1:, :ww]
    d = win[1:, 1:]
    return (
        (8 - dx) * (8 - dy) * a + dx * (8 - dy) * bb
        + (8 - dx) * dy * c + dx * dy * d + 32
    ) >> 6


# P macroblock partitions: mb_type -> [(bx4, by4, w4, h4, kind)]
_P_PARTS = {
    0: [(0, 0, 4, 4, "16x16")],
    1: [(0, 0, 4, 2, "16x8t"), (0, 2, 4, 2, "16x8b")],
    2: [(0, 0, 2, 4, "8x16l"), (2, 0, 2, 4, "8x16r")],
    # P_8x8 quadrants (sub_mb_type 0 only — one MV per 8x8; the
    # "8x8" kind takes the generic median predictor, no directional
    # override applies at this partition shape)
    3: [(0, 0, 2, 2, "8x8"), (2, 0, 2, 2, "8x8"),
        (0, 2, 2, 2, "8x8"), (2, 2, 2, 2, "8x8")],
}


def _mv_neighbor(
    fr: _Frame, x4: int, y4: int, sid: int, lx: int = 0,
) -> tuple[tuple[int, int], int] | None:
    """(mv, refIdx) of the 4x4 block at block coords for reference
    list ``lx``, or None when the block is unavailable (outside the
    picture/slice or not yet decoded). Blocks that do not use list lx
    (intra, or other-list-only) are AVAILABLE with mv (0,0), refIdx -1
    (8.4.1.3.2)."""
    if x4 < 0 or y4 < 0 or x4 >= fr.wmb * 4 or y4 >= fr.hmb * 4:
        return None
    if fr.slice_of_mb[y4 // 4, x4 // 4] != sid:
        return None
    ref_arr = fr.ref4 if lx == 0 else fr.ref4b
    mv_arr = fr.mv4 if lx == 0 else fr.mv4b
    r = int(ref_arr[y4, x4])
    if r == -2:
        # decoded blocks of slices without list-1 state (P inter
        # before ref4b existed is impossible now, but an I/P picture's
        # list-1 view of a decoded block is "list unused")
        if lx == 1 and int(fr.ref4[y4, x4]) != -2:
            return ((0, 0), -1)
        return None
    if r == -1:
        return ((0, 0), -1)
    return ((int(mv_arr[y4, x4, 0]), int(mv_arr[y4, x4, 1])), r)


def _mv_pred(
    fr: _Frame, bx: int, by: int, w4: int, h4: int, sid: int, kind: str,
    lx: int = 0, cur_ref: int = 0,
) -> tuple[int, int]:
    """Luma MV predictor (8.4.1.3 + 8.4.1.3.1) for the partition whose
    top-left 4x4 block is (bx, by), over reference list ``lx`` with
    the partition's reference index ``cur_ref``: neighbours A (left),
    B (above), C (above-right, D above-left fallback); directional
    overrides for 16x8 / 8x16 partitions when the directional
    neighbour's reference equals cur_ref; else median, with the
    B-and-C-unavailable -> A rule and the exactly-one-matching-ref
    shortcut."""
    a = _mv_neighbor(fr, bx - 1, by, sid, lx)
    bn = _mv_neighbor(fr, bx, by - 1, sid, lx)
    c = _mv_neighbor(fr, bx + w4, by - 1, sid, lx)
    if c is None:
        c = _mv_neighbor(fr, bx - 1, by - 1, sid, lx)  # D fallback
    if kind == "16x8t" and bn is not None and bn[1] == cur_ref:
        return bn[0]
    if kind in ("16x8b", "8x16l") and a is not None and a[1] == cur_ref:
        return a[0]
    if kind == "8x16r" and c is not None and c[1] == cur_ref:
        return c[0]
    if bn is None and c is None:
        return a[0] if a is not None else (0, 0)
    mvs = [n[0] if n is not None else (0, 0) for n in (a, bn, c)]
    refs = [n[1] if n is not None else -1 for n in (a, bn, c)]
    same = [i for i in range(3) if refs[i] == cur_ref]
    if len(same) == 1:
        return mvs[same[0]]
    xs = sorted(v[0] for v in mvs)
    ys = sorted(v[1] for v in mvs)
    return (xs[1], ys[1])


def _skip_mv(fr: _Frame, mbx: int, mby: int, sid: int) -> tuple[int, int]:
    """P_Skip MV (8.4.1.1): zero when A or B is unavailable or either
    is an inter ref0 block with a zero MV; else the 16x16 predictor."""
    a = _mv_neighbor(fr, mbx * 4 - 1, mby * 4, sid)
    bn = _mv_neighbor(fr, mbx * 4, mby * 4 - 1, sid)
    if a is None or bn is None:
        return (0, 0)
    if a[1] == 0 and a[0] == (0, 0):
        return (0, 0)
    if bn[1] == 0 and bn[0] == (0, 0):
        return (0, 0)
    return _mv_pred(fr, mbx * 4, mby * 4, 4, 4, sid, "16x16")


_REF = tuple  # (y, cb, cr) int64 planes of the reference picture


def _apply_wp(
    pred: np.ndarray, w: int, o: int, lwd: int
) -> np.ndarray:
    """Explicit weighted-prediction sample transform (8.4.2.3.3,
    uni-directional): Clip1(((pred * w + 2^(lwd-1)) >> lwd) + o), or
    the shift-free form when lwd == 0."""
    if lwd >= 1:
        return _clip8(((pred * w + (1 << (lwd - 1))) >> lwd) + o)
    return _clip8(pred * w + o)


def _wp_planes(
    pred_y: np.ndarray, pred_cb: np.ndarray, pred_cr: np.ndarray,
    wp: dict | None, ri: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply a P slice's pred_weight_table entry for ref ``ri`` to the
    three MC planes (identity when the slice carries no table)."""
    if wp is None:
        return pred_y, pred_cb, pred_cr
    lw, lo = wp["l"][ri]
    (cbw, cbo), (crw, cro) = wp["c"][ri]
    return (
        _apply_wp(pred_y, lw, lo, wp["l_lwd"]),
        _apply_wp(pred_cb, cbw, cbo, wp["c_lwd"]),
        _apply_wp(pred_cr, crw, cro, wp["c_lwd"]),
    )


def _decode_skip_mb(
    fr: _Frame, mb_addr: int, qp: int, sid: int, ref: tuple,
    wp: dict | None = None,
) -> None:
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    mv = _skip_mv(fr, mbx, mby, sid)
    b4x, b4y = mbx * 4, mby * 4
    fr.mv4[b4y : b4y + 4, b4x : b4x + 4] = mv
    fr.ref4[b4y : b4y + 4, b4x : b4x + 4] = 0
    fr.ref4b[b4y : b4y + 4, b4x : b4x + 4] = -1
    ox, oy, cx, cy = mbx * 16, mby * 16, mbx * 8, mby * 8
    py_, pcb, pcr = _wp_planes(
        _mc_luma(ref[0], oy, ox, 16, 16, mv),
        _mc_chroma(ref[1], cy, cx, 8, 8, mv),
        _mc_chroma(ref[2], cy, cx, 8, 8, mv),
        wp, 0,
    )
    fr.y[oy : oy + 16, ox : ox + 16] = py_
    fr.cb[cy : cy + 8, cx : cx + 8] = pcb
    fr.cr[cy : cy + 8, cx : cx + 8] = pcr
    fr.nc_y[b4y : b4y + 4, b4x : b4x + 4] = 0
    fr.nc_cb[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
    fr.nc_cr[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
    fr.i4_mode[b4y : b4y + 4, b4x : b4x + 4] = -1
    fr.done4[b4y : b4y + 4, b4x : b4x + 4] = True
    fr.qp_deblock[mby, mbx] = qp


def _inter_pred_planes(
    fr: _Frame, mbx: int, mby: int, parts: list, mvs: list, ref: tuple,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ox, oy, cx, cy = mbx * 16, mby * 16, mbx * 8, mby * 8
    pred_y = np.empty((16, 16), dtype=np.int64)
    pred_cb = np.empty((8, 8), dtype=np.int64)
    pred_cr = np.empty((8, 8), dtype=np.int64)
    for (pbx, pby, w4, h4, _kind), mv in zip(parts, mvs):
        ph, pw = h4 * 4, w4 * 4
        pred_y[pby * 4 : pby * 4 + ph, pbx * 4 : pbx * 4 + pw] = _mc_luma(
            ref[0], oy + pby * 4, ox + pbx * 4, ph, pw, mv
        )
        ch, cw = h4 * 2, w4 * 2
        pred_cb[pby * 2 : pby * 2 + ch, pbx * 2 : pbx * 2 + cw] = _mc_chroma(
            ref[1], cy + pby * 2, cx + pbx * 2, ch, cw, mv
        )
        pred_cr[pby * 2 : pby * 2 + ch, pbx * 2 : pbx * 2 + cw] = _mc_chroma(
            ref[2], cy + pby * 2, cx + pbx * 2, ch, cw, mv
        )
    return pred_y, pred_cb, pred_cr


def _decode_mb_inter(
    fr: _Frame, b: _Bits, mb_addr: int, qp: int, pps: dict, sid: int,
    mb_type: int, refs: list, n_active: int = 1, wp: dict | None = None,
) -> int:
    """P_L0_16x16 / P_L0_L0_16x8 / P_L0_L0_8x16 (mb_type 0..2):
    optional per-partition ref_idx_l0 (te(v), present when two refs
    are active), mvd per partition, optional explicit weighted
    prediction, Table 9-4 inter CBP, CAVLC residuals identical to
    intra, prediction motion-compensated."""
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    parts = _P_PARTS[mb_type]
    # syntax order: all ref_idx_l0 (absent with one active ref), then
    # all mvd_l0 pairs; derivation is sequential (partition 1's
    # predictor may read partition 0's stored MV)
    if n_active == 2:
        # te(v) with range 0..1: one bit, inverted
        ris = [1 - b.u(1) for _ in parts]
    else:
        ris = [0 for _ in parts]
    mvds = [(b.se(), b.se()) for _ in parts]
    mvs: list[tuple[int, int]] = []
    for (pbx, pby, w4, h4, kind), (dx, dy), ri in zip(parts, mvds, ris):
        bx, by = mbx * 4 + pbx, mby * 4 + pby
        px_, py_ = _mv_pred(fr, bx, by, w4, h4, sid, kind, 0, ri)
        mv = (px_ + dx, py_ + dy)
        mvs.append(mv)
        fr.mv4[by : by + h4, bx : bx + w4] = mv
        fr.ref4[by : by + h4, bx : bx + w4] = ri
        fr.ref4b[by : by + h4, bx : bx + w4] = -1
    pred_y = np.empty((16, 16), dtype=np.int64)
    pred_cb = np.empty((8, 8), dtype=np.int64)
    pred_cr = np.empty((8, 8), dtype=np.int64)
    for (pbx, pby, w4, h4, kind), mv, ri in zip(parts, mvs, ris):
        py_, pcb, pcr = _wp_planes(
            *_partition_mc(fr, mbx, mby, pbx, pby, w4, h4, mv, refs[ri]),
            wp, ri,
        )
        pred_y[pby * 4 : pby * 4 + h4 * 4, pbx * 4 : pbx * 4 + w4 * 4] = py_
        pred_cb[pby * 2 : pby * 2 + h4 * 2, pbx * 2 : pbx * 2 + w4 * 2] = pcb
        pred_cr[pby * 2 : pby * 2 + h4 * 2, pbx * 2 : pbx * 2 + w4 * 2] = pcr
    return _inter_residual_recon(
        fr, b, mbx, mby, qp, pps, sid, pred_y, pred_cb, pred_cr
    )


def _partition_mc(
    fr: _Frame, mbx: int, mby: int, pbx: int, pby: int, w4: int,
    h4: int, mv: tuple[int, int], ref: tuple,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """MC planes for ONE partition of an MB (pre-weighting)."""
    ox, oy, cx, cy = mbx * 16, mby * 16, mbx * 8, mby * 8
    return (
        _mc_luma(ref[0], oy + pby * 4, ox + pbx * 4, h4 * 4, w4 * 4, mv),
        _mc_chroma(ref[1], cy + pby * 2, cx + pbx * 2, h4 * 2, w4 * 2, mv),
        _mc_chroma(ref[2], cy + pby * 2, cx + pbx * 2, h4 * 2, w4 * 2, mv),
    )


def _inter_residual_recon(
    fr: _Frame, b: _Bits, mbx: int, mby: int, qp: int, pps: dict,
    sid: int, pred_y: np.ndarray, pred_cb: np.ndarray,
    pred_cr: np.ndarray,
) -> int:
    """Shared inter-MB tail (P and B): Table 9-4 inter CBP, optional
    mb_qp_delta, CAVLC residual parse, and reconstruction over the
    given motion-compensated prediction planes."""
    ox, oy = mbx * 16, mby * 16
    cbp_code = b.ue()
    if cbp_code > 47:
        raise ValueError("bad coded_block_pattern")
    cbp = _CBP_INTER[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp > 0:
        qp = (qp + b.se() + 52) % 52
    fr.qp_deblock[mby, mbx] = qp
    fr.i4_mode[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    luma_blocks: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_luma & (1 << (blk >> 2)):
            nc = _nc_for(fr, fr.nc_y, abx, aby, 4, sid)
            coeffs, total = _residual_block(b, nc, 16)
            fr.nc_y[aby, abx] = total
            luma_blocks.append(_zig_to_nat(coeffs))
        else:
            fr.nc_y[aby, abx] = 0
            luma_blocks.append(np.zeros((4, 4), dtype=np.int64))
    dc_cb, dc_cr, ac_cb, ac_cr = _parse_chroma_residual(
        fr, b, mbx, mby, cbp_chroma, sid
    )
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        px, py = ox + bx4 * 4, oy + by4 * 4
        if luma_blocks[blk].any():
            d = _dequant4x4(luma_blocks[blk], qp, skip_dc=False)
            res = _itransform4x4(d)
        else:
            res = 0
        fr.y[py : py + 4, px : px + 4] = _clip8(
            pred_y[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] + res
        )
        fr.done4[py // 4, px // 4] = True
    _reconstruct_chroma(
        fr, mbx, mby, 0, qp, pps, dc_cb, dc_cr, ac_cb, ac_cr, sid,
        preds=(pred_cb, pred_cr),
    )
    return qp


def _decode_mb_inter_b(
    fr: _Frame, b: _Bits, mb_addr: int, qp: int, pps: dict, sid: int,
    mb_type: int, refs: list,
) -> int:
    """B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 (mb_type 1..3): one MV per
    used list, default (unweighted) bi-prediction ``(L0 + L1 + 1)>>1``
    per 8.4.2.3; ref lists hold one picture each — L0 = the closest
    past reference, L1 = the one before it (the backward-only B shape
    where decode order equals output order)."""
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    use_l0 = mb_type in (1, 3)
    use_l1 = mb_type in (2, 3)
    b4x, b4y = mbx * 4, mby * 4
    # syntax: mvd_l0 then mvd_l1 (ref_idx absent: one active per list)
    mvd0 = (b.se(), b.se()) if use_l0 else None
    mvd1 = (b.se(), b.se()) if use_l1 else None
    parts = _P_PARTS[0]
    preds = []
    for lx, mvd, ref_arr, mv_arr, ref in (
        (0, mvd0, fr.ref4, fr.mv4, refs[0]),
        (1, mvd1, fr.ref4b, fr.mv4b, refs[1]),
    ):
        if mvd is None:
            ref_arr[b4y : b4y + 4, b4x : b4x + 4] = -1
            continue
        px_, py_ = _mv_pred(fr, b4x, b4y, 4, 4, sid, "16x16", lx)
        mv = (px_ + mvd[0], py_ + mvd[1])
        mv_arr[b4y : b4y + 4, b4x : b4x + 4] = mv
        ref_arr[b4y : b4y + 4, b4x : b4x + 4] = 0
        preds.append(_inter_pred_planes(fr, mbx, mby, parts, [mv], ref))
    if len(preds) == 2:
        pred_y = (preds[0][0] + preds[1][0] + 1) >> 1
        pred_cb = (preds[0][1] + preds[1][1] + 1) >> 1
        pred_cr = (preds[0][2] + preds[1][2] + 1) >> 1
    else:
        pred_y, pred_cb, pred_cr = preds[0]
    return _inter_residual_recon(
        fr, b, mbx, mby, qp, pps, sid, pred_y, pred_cb, pred_cr
    )


# ------------------------------------------------------- top-level API

_DECODE_ERRORS = (EOFError, ValueError, IndexError, KeyError)


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Nearest-upsample chroma then the JFIF float matrix — the same
    conversion path as ``jpeg.py:_reconstruct``, so H.264 and MJPEG
    frames of identical YCbCr content produce identical RGB."""
    h, w = y.shape
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    yf = y.astype(np.float64)
    cbf = cbu.astype(np.float64) - 128.0
    crf = cru.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_picture_nals(
    slice_nals: list[tuple[int, int, bytes]], sps: dict, pps: dict,
    refs: list | None = None,
) -> tuple[np.ndarray, tuple]:
    """Decode one picture's (nal_type, nal_ref_idc, rbsp) slices ->
    (cropped (H, W, 3) RGB, post-deblock (y, cb, cr) planes — the
    reference later P/B pictures predict from if this picture is
    marked as a reference)."""
    fr = _Frame(sps)
    for sid, (ntype, ref_idc, rbsp) in enumerate(slice_nals):
        _decode_slice(fr, _Bits(rbsp), sps, pps, ntype, sid, ref_idc, refs)
    if not fr.done4.all():
        raise ValueError("picture not fully covered by slices")
    _deblock_picture(fr, pps)
    h, w = sps["height"], sps["width"]
    y = fr.y[:h, :w]
    cb = fr.cb[: (h + 1) // 2, : (w + 1) // 2]
    cr = fr.cr[: (h + 1) // 2, : (w + 1) // 2]
    return _yuv420_to_rgb(y, cb, cr), (fr.y, fr.cb, fr.cr)


def decode_h264_annexb(data: bytes) -> list[np.ndarray] | None:
    """Decode every coded picture of a self-contained Annex B stream
    (inline SPS/PPS; IDR/I pictures plus single-reference P pictures,
    each predicting from the immediately preceding decoded picture —
    the IPP GOP shape) to a list of (H, W, 3) uint8 RGB arrays.
    Returns None — never raises — on non-H.264 payloads and the
    documented out-of-scope shapes (unmarked external CABAC, CABAC
    P/B, B partitions, multi-ref beyond two, sub-8x8 partitions)."""
    try:
        nals = parse_annexb_nals(data, with_ref_idc=True)
        if not nals:
            return None
        sps = pps = None
        pics: list[list[tuple[int, int, bytes]]] = []
        for ntype, ref_idc, rbsp in nals:
            if ntype == 7:
                sps = parse_sps(rbsp)
            elif ntype == 8:
                pps = parse_pps(rbsp)
            elif ntype == 6:
                from .cabac import sei_has_cabac_marker

                if pps is not None and sei_has_cabac_marker(rbsp):
                    pps["_cabac_marker_seen"] = True
            elif ntype in (1, 5):
                first_mb = _Bits(rbsp).ue()
                if first_mb == 0 or not pics:
                    pics.append([])
                pics[-1].append((ntype, ref_idc, rbsp))
        if sps is None or pps is None or not pics:
            return None
        out: list[np.ndarray] = []
        refs: list = []  # sliding-window DPB, most recent ref first
        for p in pics:
            rgb, planes = _decode_picture_nals(p, sps, pps, refs)
            out.append(rgb)
            if any(ref_idc != 0 for _, ref_idc, _ in p):
                if p[0][0] == 5:  # IDR: clears the DPB
                    refs = [planes]
                else:
                    refs = [planes] + refs[:1]
        return out
    except _DECODE_ERRORS:
        return None


def avcc_config(avcc: bytes) -> dict | None:
    """Parse an ISO 14496-15 AVCDecoderConfigurationRecord (the avcC
    box payload): -> {sps, pps, nal_length_size, width, height}."""
    try:
        if len(avcc) < 7 or avcc[0] != 1:
            return None
        nls = (avcc[4] & 3) + 1
        n_sps = avcc[5] & 0x1F
        i = 6
        sps = None
        for _ in range(n_sps):
            ln = int.from_bytes(avcc[i : i + 2], "big")
            i += 2
            if sps is None:
                sps = parse_sps(_rbsp(avcc[i + 1 : i + ln]))
            i += ln
        n_pps = avcc[i]
        i += 1
        pps = None
        for _ in range(n_pps):
            ln = int.from_bytes(avcc[i : i + 2], "big")
            i += 2
            if pps is None:
                pps = parse_pps(_rbsp(avcc[i + 1 : i + ln]))
            i += ln
        if sps is None or pps is None:
            return None
        return {
            "sps": sps,
            "pps": pps,
            "nal_length_size": nls,
            "width": sps["width"],
            "height": sps["height"],
        }
    except _DECODE_ERRORS:
        return None


def decode_h264_frame(sample: bytes, cfg: dict) -> np.ndarray | None:
    """Decode one AVCC length-prefixed access unit (an MP4 sample)
    using out-of-band parameter sets from ``avcc_config``. Intra-only
    by construction — a lone sample carries no reference picture, so
    P slices reject to None (use ``decode_h264_annexb`` over the full
    sample stream for IPP GOPs). Returns (H, W, 3) uint8 RGB or None."""
    try:
        nls = cfg["nal_length_size"]
        slices: list[tuple[int, int, bytes]] = []
        i = 0
        while i + nls <= len(sample):
            ln = int.from_bytes(sample[i : i + nls], "big")
            i += nls
            if ln == 0 or i + ln > len(sample):
                return None
            hdr = sample[i]
            ntype = hdr & 0x1F
            if ntype in (1, 5):
                slices.append(
                    (ntype, (hdr >> 5) & 3, _rbsp(sample[i + 1 : i + ln]))
                )
            elif ntype == 6 and cfg["pps"].get("entropy_cabac"):
                from .cabac import sei_has_cabac_marker

                if sei_has_cabac_marker(_rbsp(sample[i + 1 : i + ln])):
                    cfg = dict(cfg)  # don't let the marker outlive
                    cfg["pps"] = dict(cfg["pps"])  # this one sample
                    cfg["pps"]["_cabac_marker_seen"] = True
            i += ln
        if not slices:
            return None
        rgb, _ = _decode_picture_nals(slices, cfg["sps"], cfg["pps"], None)
        return rgb
    except _DECODE_ERRORS:
        return None


def annexb_to_avcc(data: bytes) -> tuple[bytes, list[bytes]] | None:
    """Re-container an Annex B stream: -> (AVCDecoderConfigurationRecord,
    [length-prefixed samples, one per access unit]). The avcC carries
    the stream's SPS/PPS; 4-byte NAL lengths. Returns None — never
    raises — on streams whose SPS rejects (corrupt or out-of-scope
    shapes), matching the decoder family's contract."""
    try:
        return _annexb_to_avcc(data)
    except _DECODE_ERRORS:
        return None


def _annexb_to_avcc(data: bytes) -> tuple[bytes, list[bytes]] | None:
    nals = parse_annexb_nals(data, with_ref_idc=True)
    sps_raw = pps_raw = None
    # need raw (emulated) NAL bytes for the record: re-emulate,
    # PRESERVING nal_ref_idc (a non-reference B slice must keep its
    # ref_idc 0 — dec_ref_pic_marking presence depends on it)
    samples: list[bytes] = []
    cur: list[bytes] = []
    pending_sei: list[bytes] = []
    for ntype, ref_idc, rbsp in nals:
        raw = bytes([(ref_idc << 5) | ntype]) + _emulate(rbsp)
        if ntype == 7:
            sps_raw = raw
        elif ntype == 8:
            pps_raw = raw
        elif ntype == 6:
            # SEI precedes its access unit: hold it for the next
            # sample (the CABAC shared-context marker rides in-band)
            pending_sei.append(len(raw).to_bytes(4, "big") + raw)
        elif ntype in (1, 5):
            first_mb = _Bits(rbsp).ue()
            if first_mb == 0 and cur:
                samples.append(b"".join(cur))
                cur = []
            cur.extend(pending_sei)
            pending_sei = []
            cur.append(len(raw).to_bytes(4, "big") + raw)
    if cur:
        samples.append(b"".join(cur))
    if sps_raw is None or pps_raw is None or not samples:
        return None
    sps = parse_sps(_rbsp(sps_raw[1:]))
    rec = bytes(
        [1, sps["profile"], 0, sps["level"], 0xFC | 3, 0xE0 | 1]
    ) + len(sps_raw).to_bytes(2, "big") + sps_raw + bytes([1]) + len(
        pps_raw
    ).to_bytes(2, "big") + pps_raw
    return rec, samples


# ------------------------------------------------------------- encoder
#
# Closed-loop fixture encoder: maintains the decoder's exact _Frame
# reconstruction state (prediction -> forward transform -> quantize ->
# DECODER dequant/inverse -> reconstruct), so its output planes are
# bit-identical to what decode_h264_annexb recovers — the property the
# round-trip tests pin. Mode/QP choices are deterministic functions of
# (frame, mb_addr) so fixtures are reproducible with no RNG.

class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        n = v + 1
        ln = n.bit_length()
        self.u(2 * ln - 1, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def raw_bytes(self, data: bytes) -> None:
        for byt in data:
            self.u(8, byt)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        self.byte_align_zero()

    def tobytes(self) -> bytes:
        self.byte_align_zero()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for bit in self.bits[i : i + 8]:
                v = (v << 1) | bit
            out.append(v)
        return bytes(out)


# forward quant multipliers MF (position classes as _LS_V)
_MF_V = [
    (13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
    (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559),
]
_CF = np.array(
    [[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
    dtype=np.int64,
)
_HAD4 = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
    dtype=np.int64,
)


def _fwd4x4(res: np.ndarray) -> np.ndarray:
    return _CF @ res.astype(np.int64) @ _CF.T


def _quant4x4(w: np.ndarray, qp: int, skip_dc: bool) -> np.ndarray:
    mf = np.array(_MF_V[qp % 6])[_POS_CLASS]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding offset
    lv = np.sign(w) * ((np.abs(w) * mf + f) >> qbits)
    if skip_dc:
        lv[0, 0] = 0
    return lv.astype(np.int64)


def _quant_dc(w: np.ndarray, qp: int) -> np.ndarray:
    mf00 = _MF_V[qp % 6][0]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    return (np.sign(w) * ((np.abs(w) * mf00 + 2 * f) >> (qbits + 1))).astype(
        np.int64
    )


def _nat_to_zig(block: np.ndarray) -> list[int]:
    return [int(block[r, c]) for r, c in _SCAN4]


def _write_vlc(w: _BitWriter, lc: tuple[int, int]) -> None:
    w.u(lc[0], lc[1])


def _write_coeff_token(w: _BitWriter, nC: int, t1s: int, total: int) -> None:
    ctx = _ct_context(nC)
    if ctx == 8:
        w.u(6, 0b000011 if total == 0 else ((total - 1) << 2) | t1s)
        return
    table = {0: _CT_NC0, 2: _CT_NC2, 4: _CT_NC4, -1: _CT_CHROMA_DC}[ctx]
    _write_vlc(w, table[(t1s, total)])


def _write_run_before(w: _BitWriter, run: int, zeros_left: int) -> None:
    if zeros_left > 6:
        if run < 7:
            w.u(3, 7 - run)
        else:
            w.u(3, 0)
            w.u(run - 7 + 1, 1)  # (run-7) zeros then the stop 1
        return
    _write_vlc(w, _RB[zeros_left - 1][run])


def _encode_residual_block(
    w: _BitWriter, coeffs: list[int], nC: int, max_coeffs: int
) -> int:
    """CAVLC-encode one scan-ordered block; returns total_coeff."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total = len(nz)
    # trailing ones: +-1 coeffs at the END of scan order, max 3
    t1s = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1s < 3:
            t1s += 1
        else:
            break
    _write_coeff_token(w, nC, t1s, total)
    if total == 0:
        return 0
    levels = [c for _, c in reversed(nz)]  # decode order: high scan first
    for lv in levels[:t1s]:
        w.u(1, 1 if lv < 0 else 0)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(t1s, total):
        lv = levels[i]
        code = 2 * lv - 2 if lv > 0 else -2 * lv - 1
        if i == t1s and t1s < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                w.u(code + 1, 1)  # code zeros + stop 1
            elif code < 30:
                w.u(15, 1)  # prefix 14
                w.u(4, code - 14)
            else:
                w.u(16, 1)  # prefix 15
                w.u(12, code - 30)
        else:
            if (code >> suffix_len) < 15:
                w.u((code >> suffix_len) + 1, 1)
                w.u(suffix_len, code & ((1 << suffix_len) - 1))
            else:
                w.u(16, 1)  # prefix 15
                w.u(12, code - (15 << suffix_len))
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeffs:
        tz = nz[-1][0] + 1 - total  # zeros below the highest coeff
        table = _TZ_CDC[total - 1] if max_coeffs == 4 else _TZ[total - 1]
        _write_vlc(w, table[tz])
        zeros_left = tz
    else:
        zeros_left = 0
    for i in range(total - 1):
        if zeros_left <= 0:
            break
        run = nz[total - 1 - i][0] - nz[total - 2 - i][0] - 1
        _write_run_before(w, run, zeros_left)
        zeros_left -= run
    return total


def _rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic integer BT.601 full-range conversion + 2x2 mean
    chroma subsampling (fixture input path)."""
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    y = np.clip((77 * r + 150 * g + 29 * b + 128) >> 8, 0, 255)
    cb = np.clip(128 + ((-43 * r - 85 * g + 128 * b + 128) >> 8), 0, 255)
    cr = np.clip(128 + ((128 * r - 107 * g - 21 * b + 128) >> 8), 0, 255)
    h, w = y.shape
    cb = (cb[0:h:2, 0:w:2] + cb[1:h:2, 0:w:2] + cb[0:h:2, 1:w:2]
          + cb[1:h:2, 1:w:2] + 2) >> 2
    cr = (cr[0:h:2, 0:w:2] + cr[1:h:2, 0:w:2] + cr[0:h:2, 1:w:2]
          + cr[1:h:2, 1:w:2] + 2) >> 2
    return y, cb, cr


def _sps_rbsp(
    wmb: int, hmb: int, poc_type: int = 2, profile: int | None = None,
) -> bytes:
    w = _BitWriter()
    # Baseline for intra/P GOPs; Main (77) when B slices or CABAC are
    # present (neither is a Baseline tool)
    w.u(8, profile if profile is not None else (66 if poc_type == 2 else 77))
    w.u(8, 0)
    w.u(8, 20)  # level 2.0
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(poc_type)  # 2: no POC bits; 0: pic_order_cnt_lsb in headers
    if poc_type == 0:
        w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 -> 8 bits
    w.ue(1 if poc_type == 2 else 2)  # max_num_ref_frames
    w.u(1, 0)  # gaps allowed
    w.ue(wmb - 1)
    w.ue(hmb - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 0)  # direct_8x8
    w.u(1, 0)  # no cropping (fixtures are MB-aligned)
    w.u(1, 0)  # no VUI
    w.rbsp_trailing()
    return w.tobytes()


def _pps_rbsp(
    pic_init_qp: int, chroma_qp_offset: int, weighted_pred: bool = False,
    cabac: bool = False,
) -> bytes:
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(1, 1 if cabac else 0)  # entropy_coding_mode_flag
    w.u(1, 0)  # bottom_field_pic_order
    w.ue(0)  # one slice group
    w.ue(0)
    w.ue(0)
    w.u(1, 1 if weighted_pred else 0)  # weighted_pred
    w.u(2, 0)
    w.se(pic_init_qp - 26)
    w.se(0)  # pic_init_qs
    w.se(chroma_qp_offset)
    w.u(1, 1)  # deblocking_filter_control_present
    w.u(1, 0)  # constrained_intra_pred
    w.u(1, 0)  # redundant_pic_cnt
    w.rbsp_trailing()
    return w.tobytes()


def _nal(ntype: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return (
        b"\x00\x00\x00\x01"
        + bytes([(ref_idc << 5) | ntype])
        + _emulate(rbsp)
    )


def encode_h264_annexb(
    frames_rgb: list[np.ndarray],
    qp: int = 26,
    chroma_qp_offset: int = 0,
    deblock: bool = False,
    gop: str = "all_intra",
) -> tuple[bytes, list[np.ndarray]]:
    """Encode RGB frames (heights/widths multiple of 16) as an Annex B
    stream. ``gop="all_intra"`` makes every frame IDR; ``gop="ipp"``
    makes frame 0 IDR and every later frame a P slice predicting from
    the previous decoded picture (single reference, sliding window).
    Returns (stream, reconstructions) where reconstructions are the
    encoder's closed-loop RGB planes — decode_h264_annexb(stream) must
    equal them bit-for-bit.

    ``gop="ibp"`` alternates P (reference) and B (non-reference)
    pictures after the IDR: decode order I P1 B2 P3 B4 ... where each
    B bi-predicts from the two most recent reference pictures (L0 =
    closest past, L1 = the one before — backward-only, so decode
    order equals output order and no reordering buffer is needed);
    poc_type 0 with pic_order_cnt_lsb = 2*frame is signalled as B
    requires. Intra per-MB mode policy (deterministic, exercises
    every decode path): (frame + mb_addr) % 6 -> 0: I_PCM, 1/2:
    Intra_16x16, 3/4/5: Intra_4x4; pred modes cycle over whatever is
    available at that MB position; mb_qp_delta wobbles +-1 every
    third MB. P-frame policy: (frame + mb_addr) % 8 -> 0/4: P_Skip
    (mb_skip_run), 1: P_L0_16x16, 2: P_L0_L0_16x8, 3: P_L0_L0_8x16,
    5/6/7: intra-in-P (mb_type + 5); inter MVs sweep all 16
    quarter-pel fractional positions deterministically. B-frame
    policy: (frame + mb_addr) % 4 -> 0: B_L0_16x16, 1: B_L1_16x16,
    2: B_Bi_16x16 (unweighted average), 3: intra-in-B (mb_type + 23).

    ``deblock=True`` emits disable_deblocking_filter_idc = 0 and runs
    the in-loop filter (8.7) over the closed-loop reconstruction —
    same post-construction pass as the decoder, and P frames predict
    from the POST-filter reference exactly as 8.4 requires; False
    keeps the filter signalled OFF (idc = 1)."""
    h, w = frames_rgb[0].shape[:2]
    if h % 16 or w % 16:
        raise ValueError("fixture frames must be MB-aligned")
    wmb, hmb = w // 16, h // 16
    poc_type = 0 if gop == "ibp" else 2
    weighted = gop == "ippw"
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
        _nal(7, _sps_rbsp(wmb, hmb, poc_type)),
        _nal(8, _pps_rbsp(qp, chroma_qp_offset, weighted)),
    ]
    recons: list[np.ndarray] = []
    refs: list = []
    ref_count = 0  # frame_num of the next reference picture
    for fi, rgb in enumerate(frames_rgb):
        if fi == 0:
            kind = "i"
        elif gop in ("ipp", "ippw", "ipp8"):
            kind = "p"
        elif gop == "ibp":
            kind = "p" if fi % 2 == 1 else "b"
        else:
            kind = "i"
        is_ref = kind != "b"
        n_active = (
            min(2, len(refs)) if (weighted or gop == "ipp8") else 1
        )
        wp: dict | None = None
        if weighted and kind == "p":
            wp = {
                "l_lwd": 5, "c_lwd": 5,
                "l": [
                    (32 + ((fi * 8) % 17) - 8 + 2 * ri,
                     (fi % 5) - 2 + ri)
                    for ri in range(n_active)
                ],
                "c": [
                    ((32 - (fi % 3) + ri, (fi % 3) - 1),
                     (33 - (fi % 4), -(fi % 2) + ri))
                    for ri in range(n_active)
                ],
            }
        y, cb, cr = _rgb_to_yuv420(np.asarray(rgb, dtype=np.uint8))
        fr = _Frame(sps_d)
        wtr = _BitWriter()
        # slice header
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
            # non-reference pictures carry PrevRefFrameNum + 1 (7.4.3)
            wtr.u(4, ref_count % 16)
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
            if wp is not None:  # pred_weight_table (7.3.3.2)
                wtr.ue(wp["l_lwd"])
                wtr.ue(wp["c_lwd"])
                for ri in range(n_active):
                    wtr.u(1, 1)  # luma_weight_l0_flag
                    wtr.se(wp["l"][ri][0])
                    wtr.se(wp["l"][ri][1])
                    wtr.u(1, 1)  # chroma_weight_l0_flag
                    wtr.se(wp["c"][ri][0][0])
                    wtr.se(wp["c"][ri][0][1])
                    wtr.se(wp["c"][ri][1][0])
                    wtr.se(wp["c"][ri][1][1])
            if is_ref:
                wtr.u(1, 0)  # adaptive_ref_pic_marking_mode_flag
        wtr.se(0)  # slice_qp_delta
        if deblock:
            wtr.ue(0)  # disable_deblocking_filter_idc: filter all edges
            wtr.se(0)  # slice_alpha_c0_offset_div2
            wtr.se(0)  # slice_beta_offset_div2
        else:
            wtr.ue(1)  # disable_deblocking_filter_idc
        cur_qp = qp
        if kind == "i":
            for mb_addr in range(wmb * hmb):
                cur_qp = _encode_mb(
                    fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi
                )
        elif kind == "p":
            skip_run = 0
            for mb_addr in range(wmb * hmb):
                choice = (fi + mb_addr) % 8
                if choice == 0 or (choice == 4 and gop != "ipp8"):
                    _decode_skip_mb(fr, mb_addr, cur_qp, 0, refs[0], wp)
                    skip_run += 1
                    continue
                wtr.ue(skip_run)
                skip_run = 0
                if choice in (1, 2, 3):
                    cur_qp = _encode_mb_inter(
                        fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi,
                        refs, choice - 1, n_active=n_active, wp=wp,
                    )
                elif gop == "ipp8" and choice == 4:
                    # P_8x8: four quadrant MVs, per-quadrant ref_idx
                    cur_qp = _encode_mb_inter(
                        fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi,
                        refs, 3, n_active=n_active, wp=wp,
                    )
                elif gop == "ipp8" and choice == 5:
                    # P_8x8ref0: no ref_idx syntax, all quadrants ref 0
                    cur_qp = _encode_mb_inter(
                        fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi,
                        refs, 4, n_active=1, wp=wp,
                    )
                else:  # intra-in-P, mb_type offset +5
                    cur_qp = _encode_mb(
                        fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi,
                        mb_type_offset=5,
                    )
            if skip_run:
                wtr.ue(skip_run)
        else:  # B
            for mb_addr in range(wmb * hmb):
                wtr.ue(0)  # mb_skip_run (no B_Skip: direct unsupported)
                choice = (fi + mb_addr) % 4
                if choice < 3:
                    cur_qp = _encode_mb_inter_b(
                        fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi,
                        refs, choice + 1,
                    )
                else:  # intra-in-B, mb_type offset +23
                    cur_qp = _encode_mb(
                        fr, wtr, mb_addr, cur_qp, pps_d, y, cb, cr, fi,
                        mb_type_offset=23,
                    )
        wtr.rbsp_trailing()
        ntype = 5 if kind == "i" else 1
        out.append(_nal(ntype, wtr.tobytes(), ref_idc=3 if is_ref else 0))
        if deblock:
            fr.slice_params[0] = (0, 0, 0)
            _deblock_picture(fr, pps_d)
        if is_ref:
            planes = (fr.y, fr.cb, fr.cr)
            refs = [planes] if kind == "i" else [planes] + refs[:1]
            ref_count += 1
        recons.append(
            _yuv420_to_rgb(fr.y[:h, :w], fr.cb[: h // 2, : w // 2],
                           fr.cr[: h // 2, : w // 2])
        )
    return b"".join(out), recons


def _i4_pred_mode_bits(
    fr: _Frame, abx: int, aby: int, mode: int, sid: int = 0
) -> tuple[int, int]:
    """-> (prev_flag, rem) for intra4x4 mode signalling (rem = -1 when
    prev_flag). Mirrors the decoder's predicted-mode derivation."""

    def nb_mode(x: int, y: int) -> int:
        if x < 0 or y < 0:
            return -9
        if fr.slice_of_mb[y // 4, x // 4] != sid:
            return -9
        m = int(fr.i4_mode[y, x])
        return m if m >= 0 else 2

    a = nb_mode(abx - 1, aby)
    bm = nb_mode(abx, aby - 1)
    pred = 2 if (a == -9 or bm == -9) else min(a, bm)
    if mode == pred:
        return 1, -1
    return 0, mode if mode < pred else mode - 1


def _encode_mb(
    fr: _Frame, w: _BitWriter, mb_addr: int, qp: int, pps: dict,
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, fi: int,
    sid: int = 0, mb_type_offset: int = 0,
) -> int:
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    # every branch below is intra (the inter encoders are
    # _encode_mb_inter / _encode_mb_inter_b)
    fr.ref4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    fr.ref4b[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    src_y = y[oy : oy + 16, ox : ox + 16].astype(np.int64)
    src_cb = cb[cy : cy + 8, cx : cx + 8].astype(np.int64)
    src_cr = cr[cy : cy + 8, cx : cx + 8].astype(np.int64)
    choice = (fi + mb_addr) % 6

    if choice == 0:  # I_PCM (lossless: recon = source)
        w.ue(25 + mb_type_offset)
        w.byte_align_zero()
        w.raw_bytes(bytes(src_y.astype(np.uint8).reshape(-1)))
        w.raw_bytes(bytes(src_cb.astype(np.uint8).reshape(-1)))
        w.raw_bytes(bytes(src_cr.astype(np.uint8).reshape(-1)))
        fr.y[oy : oy + 16, ox : ox + 16] = src_y
        fr.cb[cy : cy + 8, cx : cx + 8] = src_cb
        fr.cr[cy : cy + 8, cx : cx + 8] = src_cr
        fr.nc_y[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
        fr.nc_cb[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.nc_cr[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.done4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = True
        fr.qp_deblock[mby, mbx] = 0  # I_PCM: QPY taken as 0 for 8.7
        return qp

    # ---------------- shared chroma encode (levels + recon arrays)
    def chroma_encode(qpc: int) -> tuple[list, list, list, list, int]:
        dcs, acs = [], []
        for src, plane in ((src_cb, fr.cb), (src_cr, fr.cr)):
            t, l, c = _luma_neighbors(
                fr, cx, cy, 8, sid, plane, fr.done4, 2
            )
            avail = [0] + [m for m, need in ((1, l), (2, t)) if need is not None]
            if t is not None and l is not None and c is not None:
                avail.append(3)
            cmode = avail[(mb_addr // 2) % len(avail)]
            pred = _pred_chroma8x8(cmode, t, l, c)
            res = src - pred
            dcmat = np.zeros((2, 2), dtype=np.int64)
            blocks = []
            for blk in range(4):
                bx2, by2 = blk % 2, blk // 2
                wmat = _fwd4x4(res[by2 * 4 : by2 * 4 + 4, bx2 * 4 : bx2 * 4 + 4])
                dcmat[by2, bx2] = wmat[0, 0]
                blocks.append(_quant4x4(wmat, qpc, skip_dc=True))
            h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
            dc_lv = _quant_dc(h2 @ dcmat @ h2, qpc)
            dcs.append([int(dc_lv[0, 0]), int(dc_lv[0, 1]),
                        int(dc_lv[1, 0]), int(dc_lv[1, 1])])
            acs.append((cmode, blocks))
        any_ac = any(b.any() for _, bl in acs for b in bl)
        any_dc = any(any(d) for d in dcs)
        cbp_c = 2 if any_ac else (1 if any_dc else 0)
        # both components share intra_chroma_pred_mode: re-derive with
        # the first component's availability (planes share geometry)
        return dcs[0], dcs[1], acs[0], acs[1], cbp_c

    # NOTE: intra_chroma_pred_mode is one syntax element for both
    # components — use the mode chosen for Cb for both.
    def chroma_emit_and_recon(
        cbp_c: int, dc_cb_l, dc_cr_l, acs_cb, acs_cr, qpy: int
    ) -> None:
        cmode = acs_cb[0]
        if cbp_c:
            _encode_residual_block(w, dc_cb_l, -1, 4)
            _encode_residual_block(w, dc_cr_l, -1, 4)
        ac_nat_cb, ac_nat_cr = [], []
        for comp, (nc_map, acs) in enumerate(
            ((fr.nc_cb, acs_cb), (fr.nc_cr, acs_cr))
        ):
            for blk in range(4):
                bx2, by2 = blk % 2, blk // 2
                abx, aby = mbx * 2 + bx2, mby * 2 + by2
                blkmat = acs[1][blk]
                zig = _nat_to_zig(blkmat)[1:]
                if cbp_c == 2:
                    nc = _nc_for(fr, nc_map, abx, aby, 2, sid)
                    total = _encode_residual_block(w, zig, nc, 15)
                    nc_map[aby, abx] = total
                else:
                    nc_map[aby, abx] = 0
                    blkmat = np.zeros((4, 4), dtype=np.int64)
                (ac_nat_cb if comp == 0 else ac_nat_cr).append(blkmat)
        use_dc_cb = dc_cb_l if cbp_c else [0, 0, 0, 0]
        use_dc_cr = dc_cr_l if cbp_c else [0, 0, 0, 0]
        _reconstruct_chroma(
            fr, mbx, mby, cmode, qpy, pps, use_dc_cb, use_dc_cr,
            ac_nat_cb, ac_nat_cr, sid,
        )

    if choice in (1, 2):  # ---------------- Intra_16x16
        t, l, c = _luma_neighbors(fr, ox, oy, 16, sid, fr.y, fr.done4, 4)
        avail = [2] + [m for m, need in ((0, t), (1, l)) if need is not None]
        if t is not None and l is not None and c is not None:
            avail.append(3)
        mode = avail[mb_addr % len(avail)]
        delta = (1, -1, 0)[mb_addr % 3]
        new_qp = qp + delta
        if not 0 <= new_qp <= 51:
            delta, new_qp = 0, qp
        qp = new_qp
        pred = _pred16x16(mode, t, l, c)
        res = src_y - pred
        dcmat = np.zeros((4, 4), dtype=np.int64)
        ac_levels: list[np.ndarray] = []
        for blk in range(16):
            bx4, by4 = _BLK_POS[blk]
            wmat = _fwd4x4(res[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4])
            dcmat[by4, bx4] = wmat[0, 0]
            ac_levels.append(_quant4x4(wmat, qp, skip_dc=True))
        dc_lv = _quant_dc(_HAD4 @ dcmat @ _HAD4, qp)
        cbp_luma_flag = 1 if any(b.any() for b in ac_levels) else 0
        qpc = _chroma_qp(qp, pps["chroma_qp_index_offset"])
        dc_cb_l, dc_cr_l, acs_cb, acs_cr, cbp_c = chroma_encode(qpc)
        mb_type = 1 + mode + 4 * cbp_c + (12 if cbp_luma_flag else 0)
        w.ue(mb_type + mb_type_offset)
        w.ue(acs_cb[0])  # intra_chroma_pred_mode
        w.se(delta)
        fr.i4_mode[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
        # DC block
        nc = _nc_for(fr, fr.nc_y, mbx * 4, mby * 4, 4, sid)
        _encode_residual_block(w, _nat_to_zig(dc_lv), nc, 16)
        # AC blocks
        kept: list[np.ndarray] = []
        for blk in range(16):
            bx4, by4 = _BLK_POS[blk]
            abx, aby = mbx * 4 + bx4, mby * 4 + by4
            if cbp_luma_flag:
                nc = _nc_for(fr, fr.nc_y, abx, aby, 4, sid)
                total = _encode_residual_block(
                    w, _nat_to_zig(ac_levels[blk])[1:], nc, 15
                )
                fr.nc_y[aby, abx] = total
                kept.append(ac_levels[blk])
            else:
                fr.nc_y[aby, abx] = 0
                kept.append(np.zeros((4, 4), dtype=np.int64))
        # ---- reconstruct (decoder path)
        dc_scaled = _scale_luma_dc(_ihadamard4(dc_lv), qp)
        recon = np.empty((16, 16), dtype=np.int64)
        for blk in range(16):
            bx4, by4 = _BLK_POS[blk]
            d = _dequant4x4(kept[blk], qp, skip_dc=True)
            d[0, 0] = dc_scaled[by4, bx4]
            resd = _itransform4x4(d)
            recon[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] = (
                pred[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] + resd
            )
        fr.y[oy : oy + 16, ox : ox + 16] = _clip8(recon)
        fr.done4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = True
        fr.qp_deblock[mby, mbx] = qp
        chroma_emit_and_recon(cbp_c, dc_cb_l, dc_cr_l, acs_cb, acs_cr, qp)
        return qp

    # ---------------- Intra_4x4
    mode_bits: list[tuple[int, int]] = []
    blk_levels: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        px, py = ox + bx4 * 4, oy + by4 * 4
        t, l, c = _luma_neighbors(fr, px, py, 4, sid, fr.y, fr.done4, 4)
        avail = [2]
        if t is not None:
            avail += [0, 3, 7]
        if l is not None:
            avail += [1, 8]
        if t is not None and l is not None and c is not None:
            avail += [4, 5, 6]
        mode = sorted(avail)[(blk + mb_addr + fi) % len(avail)]
        mode_bits.append(_i4_pred_mode_bits(fr, abx, aby, mode, sid))
        fr.i4_mode[aby, abx] = mode
        pred = _pred4x4(mode, t, l, c)
        res = src_y[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] - pred
        lv = _quant4x4(_fwd4x4(res), qp, skip_dc=False)
        blk_levels.append(lv)
        # closed-loop recon feeds the next block's prediction
        if lv.any():
            resd = _itransform4x4(_dequant4x4(lv, qp, skip_dc=False))
        else:
            resd = 0
        fr.y[py : py + 4, px : px + 4] = _clip8(pred + resd)
        fr.done4[py // 4, px // 4] = True
    cbp_luma = 0
    for g in range(4):
        if any(blk_levels[g * 4 + k].any() for k in range(4)):
            cbp_luma |= 1 << g
    qpc = _chroma_qp(qp, pps["chroma_qp_index_offset"])
    dc_cb_l, dc_cr_l, acs_cb, acs_cr, cbp_c = chroma_encode(qpc)
    cbp = cbp_luma | (cbp_c << 4)
    delta = (1, -1, 0)[mb_addr % 3]
    if cbp > 0:
        new_qp = qp + delta
        if not 0 <= new_qp <= 51:
            new_qp = qp
    else:
        new_qp = qp
    # NOTE: chroma levels were quantized with the PRE-delta qp's qpc;
    # re-quantizing after a qp change would be circular (cbp depends on
    # levels). Keep delta = 0 for I_4x4 so the closed loop stays exact.
    new_qp = qp
    w.ue(mb_type_offset)  # mb_type I_4x4 (+5 inside P slices)
    for prev, rem in mode_bits:
        w.u(1, prev)
        if not prev:
            w.u(3, rem)
    w.ue(acs_cb[0])  # intra_chroma_pred_mode
    w.ue(_CBP_INTRA_INV[cbp])
    if cbp > 0:
        w.se(0)
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_luma & (1 << (blk >> 2)):
            nc = _nc_for(fr, fr.nc_y, abx, aby, 4, sid)
            total = _encode_residual_block(
                w, _nat_to_zig(blk_levels[blk]), nc, 16
            )
            fr.nc_y[aby, abx] = total
        else:
            fr.nc_y[aby, abx] = 0
    fr.qp_deblock[mby, mbx] = new_qp
    chroma_emit_and_recon(cbp_c, dc_cb_l, dc_cr_l, acs_cb, acs_cr, new_qp)
    return new_qp


def _encode_mb_inter(
    fr: _Frame, w: _BitWriter, mb_addr: int, qp: int, pps: dict,
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, fi: int,
    refs: list, mb_type: int, sid: int = 0, n_active: int = 1,
    wp: dict | None = None,
) -> int:
    """Encode one inter MB (P_L0_16x16 / 16x8 / 8x16) with
    deterministic quarter-pel MVs (exercising every fractional
    position across MBs), deterministic per-partition ref_idx when two
    references are active, optional explicit weighting, and
    closed-loop reconstruction running the decoder's exact MC +
    dequant + inverse transform."""
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    src_y = y[oy : oy + 16, ox : ox + 16].astype(np.int64)
    src_cb = cb[cy : cy + 8, cx : cx + 8].astype(np.int64)
    src_cr = cr[cy : cy + 8, cx : cx + 8].astype(np.int64)
    parts = _P_PARTS[min(mb_type, 3)]
    ris = [
        (mb_addr + fi + pi) % n_active for pi in range(len(parts))
    ]
    mvds: list[tuple[int, int]] = []
    mvs: list[tuple[int, int]] = []
    for pi, (pbx, pby, w4, h4, kind) in enumerate(parts):
        bx, by = mbx * 4 + pbx, mby * 4 + pby
        mvp = _mv_pred(fr, bx, by, w4, h4, sid, kind, 0, ris[pi])
        mv = (
            ((mb_addr * 7 + fi * 3 + pi * 5) % 17) - 8,
            ((mb_addr * 11 + fi * 5 + pi * 13) % 17) - 8,
        )
        mvs.append(mv)
        mvds.append((mv[0] - mvp[0], mv[1] - mvp[1]))
        fr.mv4[by : by + h4, bx : bx + w4] = mv
        fr.ref4[by : by + h4, bx : bx + w4] = ris[pi]
        fr.ref4b[by : by + h4, bx : bx + w4] = -1
    pred_y = np.empty((16, 16), dtype=np.int64)
    pred_cb = np.empty((8, 8), dtype=np.int64)
    pred_cr = np.empty((8, 8), dtype=np.int64)
    for (pbx, pby, w4, h4, kind), mv, ri in zip(parts, mvs, ris):
        py_, pcb, pcr = _wp_planes(
            *_partition_mc(fr, mbx, mby, pbx, pby, w4, h4, mv, refs[ri]),
            wp, ri,
        )
        pred_y[pby * 4 : pby * 4 + h4 * 4, pbx * 4 : pbx * 4 + w4 * 4] = py_
        pred_cb[pby * 2 : pby * 2 + h4 * 2, pbx * 2 : pbx * 2 + w4 * 2] = pcb
        pred_cr[pby * 2 : pby * 2 + h4 * 2, pbx * 2 : pbx * 2 + w4 * 2] = pcr
    w.ue(mb_type)
    if mb_type >= 3:
        for _ in parts:
            w.ue(0)  # sub_mb_type: P_L0_8x8 per quadrant
    if n_active == 2:
        for ri in ris:
            w.u(1, 1 - ri)  # te(v), range 0..1: inverted single bit
    for dx, dy in mvds:
        w.se(dx)
        w.se(dy)
    _emit_inter_residual(
        fr, w, mbx, mby, qp, pps, pred_y, pred_cb, pred_cr,
        src_y, src_cb, src_cr, sid,
    )
    return qp


def _emit_inter_residual(
    fr: _Frame, w: _BitWriter, mbx: int, mby: int, qp: int, pps: dict,
    pred_y: np.ndarray, pred_cb: np.ndarray, pred_cr: np.ndarray,
    src_y: np.ndarray, src_cb: np.ndarray, src_cr: np.ndarray,
    sid: int = 0,
) -> tuple[int, int]:
    """Shared inter residual encoder tail: quantize luma/chroma
    residuals against the MC prediction, return (cbp, cbp_c) after
    WRITING the CBP code + residual blocks and reconstructing via the
    decoder's math. The caller must already have written mb_type +
    mvds."""
    ox, oy = mbx * 16, mby * 16
    res = src_y - pred_y
    blk_levels: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        blk_levels.append(
            _quant4x4(
                _fwd4x4(res[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4]),
                qp, skip_dc=False,
            )
        )
    cbp_luma = 0
    for g in range(4):
        if any(blk_levels[g * 4 + k].any() for k in range(4)):
            cbp_luma |= 1 << g
    qpc = _chroma_qp(qp, pps["chroma_qp_index_offset"])
    dcs: list[list[int]] = []
    acs: list[list[np.ndarray]] = []
    for src, pred in ((src_cb, pred_cb), (src_cr, pred_cr)):
        resc = src - pred
        dcmat = np.zeros((2, 2), dtype=np.int64)
        blocks = []
        for blk in range(4):
            bx2, by2 = blk % 2, blk // 2
            wmat = _fwd4x4(resc[by2 * 4 : by2 * 4 + 4, bx2 * 4 : bx2 * 4 + 4])
            dcmat[by2, bx2] = wmat[0, 0]
            blocks.append(_quant4x4(wmat, qpc, skip_dc=True))
        h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
        dc_lv = _quant_dc(h2 @ dcmat @ h2, qpc)
        dcs.append(
            [int(dc_lv[0, 0]), int(dc_lv[0, 1]),
             int(dc_lv[1, 0]), int(dc_lv[1, 1])]
        )
        acs.append(blocks)
    any_ac = any(b.any() for bl in acs for b in bl)
    any_dc = any(any(d) for d in dcs)
    cbp_c = 2 if any_ac else (1 if any_dc else 0)
    cbp = cbp_luma | (cbp_c << 4)
    w.ue(_CBP_INTER_INV[cbp])
    if cbp > 0:
        w.se(0)
    fr.qp_deblock[mby, mbx] = qp
    fr.i4_mode[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = -1
    kept: list[np.ndarray] = []
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        abx, aby = mbx * 4 + bx4, mby * 4 + by4
        if cbp_luma & (1 << (blk >> 2)):
            nc = _nc_for(fr, fr.nc_y, abx, aby, 4, sid)
            total = _encode_residual_block(
                w, _nat_to_zig(blk_levels[blk]), nc, 16
            )
            fr.nc_y[aby, abx] = total
            kept.append(blk_levels[blk])
        else:
            fr.nc_y[aby, abx] = 0
            kept.append(np.zeros((4, 4), dtype=np.int64))
    if cbp_c:
        _encode_residual_block(w, dcs[0], -1, 4)
        _encode_residual_block(w, dcs[1], -1, 4)
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
                nc = _nc_for(fr, nc_map, abx, aby, 2, sid)
                total = _encode_residual_block(
                    w, _nat_to_zig(blkmat)[1:], nc, 15
                )
                nc_map[aby, abx] = total
            else:
                nc_map[aby, abx] = 0
                blkmat = np.zeros((4, 4), dtype=np.int64)
            (ac_nat_cb if comp == 0 else ac_nat_cr).append(blkmat)
    for blk in range(16):
        bx4, by4 = _BLK_POS[blk]
        px, py = ox + bx4 * 4, oy + by4 * 4
        if kept[blk].any():
            resd = _itransform4x4(_dequant4x4(kept[blk], qp, skip_dc=False))
        else:
            resd = 0
        fr.y[py : py + 4, px : px + 4] = _clip8(
            pred_y[by4 * 4 : by4 * 4 + 4, bx4 * 4 : bx4 * 4 + 4] + resd
        )
        fr.done4[py // 4, px // 4] = True
    _reconstruct_chroma(
        fr, mbx, mby, 0, qp, pps,
        dcs[0] if cbp_c else [0, 0, 0, 0],
        dcs[1] if cbp_c else [0, 0, 0, 0],
        ac_nat_cb, ac_nat_cr, sid, preds=(pred_cb, pred_cr),
    )
    return cbp, cbp_c


def _encode_mb_inter_b(
    fr: _Frame, w: _BitWriter, mb_addr: int, qp: int, pps: dict,
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, fi: int,
    refs: list, mb_type: int, sid: int = 0,
) -> int:
    """Encode one B-slice inter MB (B_L0_16x16 / B_L1_16x16 /
    B_Bi_16x16, mb_type 1..3) with deterministic per-list MVs and the
    default unweighted bi-prediction average."""
    mbx, mby = mb_addr % fr.wmb, mb_addr // fr.wmb
    fr.slice_of_mb[mby, mbx] = sid
    ox, oy = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    src_y = y[oy : oy + 16, ox : ox + 16].astype(np.int64)
    src_cb = cb[cy : cy + 8, cx : cx + 8].astype(np.int64)
    src_cr = cr[cy : cy + 8, cx : cx + 8].astype(np.int64)
    use_l0 = mb_type in (1, 3)
    use_l1 = mb_type in (2, 3)
    b4x, b4y = mbx * 4, mby * 4
    parts = _P_PARTS[0]
    mvds: list[tuple[int, int]] = []
    preds = []
    for lx, used, ref_arr, mv_arr, ref in (
        (0, use_l0, fr.ref4, fr.mv4, refs[0]),
        (1, use_l1, fr.ref4b, fr.mv4b, refs[1]),
    ):
        if not used:
            ref_arr[b4y : b4y + 4, b4x : b4x + 4] = -1
            continue
        mvp = _mv_pred(fr, b4x, b4y, 4, 4, sid, "16x16", lx)
        mv = (
            ((mb_addr * 5 + fi * 7 + lx * 3) % 17) - 8,
            ((mb_addr * 13 + fi * 3 + lx * 11) % 17) - 8,
        )
        mvds.append((mv[0] - mvp[0], mv[1] - mvp[1]))
        mv_arr[b4y : b4y + 4, b4x : b4x + 4] = mv
        ref_arr[b4y : b4y + 4, b4x : b4x + 4] = 0
        preds.append(_inter_pred_planes(fr, mbx, mby, parts, [mv], ref))
    if len(preds) == 2:
        pred_y = (preds[0][0] + preds[1][0] + 1) >> 1
        pred_cb = (preds[0][1] + preds[1][1] + 1) >> 1
        pred_cr = (preds[0][2] + preds[1][2] + 1) >> 1
    else:
        pred_y, pred_cb, pred_cr = preds[0]
    w.ue(mb_type)
    for dx, dy in mvds:
        w.se(dx)
        w.se(dy)
    _emit_inter_residual(
        fr, w, mbx, mby, qp, pps, pred_y, pred_cb, pred_cr,
        src_y, src_cb, src_cr, sid,
    )
    return qp


def avcc_to_annexb(sample: bytes, avcc: bytes) -> bytes | None:
    """Convert one AVCC length-prefixed sample plus its
    AVCDecoderConfigurationRecord into a SELF-CONTAINED Annex B access
    unit (SPS/PPS NALs prefixed, length fields replaced by start
    codes) — the classic mp4-to-annexb bitstream filter. Returns None
    on malformed inputs; never raises."""
    try:
        if len(avcc) < 7 or avcc[0] != 1:
            return None
        nls = (avcc[4] & 3) + 1
        parts: list[bytes] = []
        i = 6
        for _ in range(avcc[5] & 0x1F):
            ln = int.from_bytes(avcc[i : i + 2], "big")
            i += 2
            parts.append(b"\x00\x00\x00\x01" + avcc[i : i + ln])
            i += ln
        n_pps = avcc[i]
        i += 1
        for _ in range(n_pps):
            ln = int.from_bytes(avcc[i : i + 2], "big")
            i += 2
            parts.append(b"\x00\x00\x00\x01" + avcc[i : i + ln])
            i += ln
        j = 0
        while j + nls <= len(sample):
            ln = int.from_bytes(sample[j : j + nls], "big")
            j += nls
            if ln == 0 or j + ln > len(sample):
                return None
            parts.append(b"\x00\x00\x00\x01" + sample[j : j + ln])
            j += ln
        return b"".join(parts)
    except _DECODE_ERRORS:
        return None


# ---------------------------------------------------- deblocking (8.7)
#
# The in-loop filter, applied AFTER the whole picture is constructed
# (intra prediction reads pre-filter samples, so reconstruction and
# filtering separate cleanly for intra-only streams). All-intra makes
# boundary strength trivial: 4 on macroblock edges, 3 inside.

# Table 8-16: alpha / beta thresholds indexed by 0..51
_ALPHA = [0] * 16 + [
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255,
]
_BETA = [0] * 16 + [
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
    11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18,
]
# Table 8-17: tC0 for bS 1..3 (only bS=3 is reachable all-intra)
_TC0 = [
    [0] * 16 + [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8,
                9, 10, 11, 13],
    [0] * 16 + [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                2, 2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10,
                11, 12, 13, 15, 17],
    [0] * 16 + [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
                3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14,
                16, 18, 20, 23, 25, 27],
]


def _clip3(lo, hi, v):
    return np.minimum(np.maximum(v, lo), hi)


def _deblock_edge_luma(
    p: list[np.ndarray], q: list[np.ndarray], bs: int, idx_a: int,
    idx_b: int,
) -> None:
    """Filter one luma edge in place. p = [p0, p1, p2, p3] and
    q = [q0..q3] are length-L int64 line arrays (p0 adjacent to the
    edge). 8.7.2.3 (bS < 4) / 8.7.2.4 (bS = 4)."""
    alpha, beta = _ALPHA[idx_a], _BETA[idx_b]
    p0, p1, p2, p3 = p
    q0, q1, q2, q3 = q
    fs = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not fs.any():
        return
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)
    if bs == 4:
        small = np.abs(p0 - q0) < (alpha >> 2) + 2
        sp = fs & small & (ap < beta)
        sq = fs & small & (aq < beta)
        p0n = np.where(
            sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
            np.where(fs, (2 * p1 + p0 + q1 + 2) >> 2, p0),
        )
        p1n = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        p2n = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
        q0n = np.where(
            sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
            np.where(fs, (2 * q1 + q0 + p1 + 2) >> 2, q0),
        )
        q1n = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        q2n = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
        p0[:], p1[:], p2[:] = p0n, p1n, p2n
        q0[:], q1[:], q2[:] = q0n, q1n, q2n
        return
    tc0 = _TC0[bs - 1][idx_a]
    tc = tc0 + (ap < beta).astype(np.int64) + (aq < beta).astype(np.int64)
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    p0n = np.where(fs, _clip8(p0 + delta), p0)
    q0n = np.where(fs, _clip8(q0 - delta), q0)
    dp1 = _clip3(
        -tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1
    )
    p1n = np.where(fs & (ap < beta), p1 + dp1, p1)
    dq1 = _clip3(
        -tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1
    )
    q1n = np.where(fs & (aq < beta), q1 + dq1, q1)
    p0[:], p1[:] = p0n, p1n
    q0[:], q1[:] = q0n, q1n


def _deblock_edge_chroma(
    p: list[np.ndarray], q: list[np.ndarray], bs: int, idx_a: int,
    idx_b: int,
) -> None:
    """Chroma edge: only p0/q0 move; tC = tC0 + 1 for bS < 4."""
    alpha, beta = _ALPHA[idx_a], _BETA[idx_b]
    p0, p1 = p[0], p[1]
    q0, q1 = q[0], q[1]
    fs = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not fs.any():
        return
    if bs == 4:
        p0n = np.where(fs, (2 * p1 + p0 + q1 + 2) >> 2, p0)
        q0n = np.where(fs, (2 * q1 + q0 + p1 + 2) >> 2, q0)
        p0[:], q0[:] = p0n, q0n
        return
    tc = _TC0[bs - 1][idx_a] + 1
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    p0[:] = np.where(fs, _clip8(p0 + delta), p0)
    q0[:] = np.where(fs, _clip8(q0 - delta), q0)


def _block_pic_mvs(
    fr: _Frame, x4: int, y4: int
) -> list[tuple[int, int, int]]:
    """[(reference-picture id, mvx, mvy)] used by the 4x4 block: the
    picture id is the physical DPB index — L0 ref_idx r is picture r
    (most recent reference = 0), L1 ref0 is picture 1 — list-agnostic
    identities, as 8.7.2.1 compares reference PICTURES not lists."""
    out = []
    r0 = int(fr.ref4[y4, x4])
    if r0 >= 0:
        out.append((r0, int(fr.mv4[y4, x4, 0]), int(fr.mv4[y4, x4, 1])))
    rb = int(fr.ref4b[y4, x4])
    if rb >= 0:
        # RefPicList1 is RefPicList0 with the first two entries swapped
        # (8.2.4.2.3 for our no-reorder streams): L1[0] is picture 1,
        # L1[1] is picture 0, L1[r>=2] stays picture r. Only rb == 0 is
        # reachable today (_decode_slice rejects multi-ref L1), but the
        # mapping follows the swap rule so lifting that guard cannot
        # silently misattribute reference pictures in 8.7.2.1.
        pic = 1 if rb == 0 else (0 if rb == 1 else rb)
        out.append((pic, int(fr.mv4b[y4, x4, 0]), int(fr.mv4b[y4, x4, 1])))
    return out


def _bs_blocks(
    fr: _Frame, px4: int, py4: int, qx4: int, qy4: int, mb_edge: bool,
) -> int:
    """Boundary strength between 4x4 luma blocks p and q (8.7.2.1,
    frame coding): either intra -> 4 on MB edges, 3 inside; else 2
    when either block carries non-zero luma coefficients; else 1 when
    the blocks use different reference pictures or a different number
    of motion vectors, or any same-picture MV pair differs by >= 4
    quarter samples in a component; else 0 (edge not filtered)."""
    p_inter = int(fr.ref4[py4, px4]) >= 0 or int(fr.ref4b[py4, px4]) >= 0
    q_inter = int(fr.ref4[qy4, qx4]) >= 0 or int(fr.ref4b[qy4, qx4]) >= 0
    # non-inter covers intra (-1) and never-assigned (-2, hand-built
    # frames): intra is the conservative strongest-filter default
    if not p_inter or not q_inter:
        return 4 if mb_edge else 3
    if fr.nc_y[py4, px4] > 0 or fr.nc_y[qy4, qx4] > 0:
        return 2
    pmv = _block_pic_mvs(fr, px4, py4)
    qmv = _block_pic_mvs(fr, qx4, qy4)
    if {m[0] for m in pmv} != {m[0] for m in qmv}:
        return 1
    qby = {m[0]: m for m in qmv}
    for pic, mx, my in pmv:
        _, qx, qy = qby[pic]
        if abs(mx - qx) >= 4 or abs(my - qy) >= 4:
            return 1
    return 0


def _deblock_picture(fr: _Frame, pps: dict) -> None:
    """Apply the in-loop filter over the constructed picture, MB by MB
    in raster order, vertical edges then horizontal (8.7). Boundary
    strength is derived per 4-sample segment from the blocks' coding
    state (``_bs_blocks``): all-intra pictures reduce to the classic
    4-on-MB-edge / 3-inside, P pictures get the coefficient/MV-driven
    2/1/0 tiers including unfiltered (bS 0) segments. Uses the per-MB
    QPY recorded during reconstruction (0 for I_PCM, which damps — and
    for low-QP neighbours disables — filtering of its lossless samples
    via the edge QP average) and per-slice disable/offset parameters.
    Chroma edges take each segment's bS from the co-sited luma
    blocks."""
    coff = pps["chroma_qp_index_offset"]
    for mby in range(fr.hmb):
        for mbx in range(fr.wmb):
            sid = int(fr.slice_of_mb[mby, mbx])
            if sid < 0:
                continue
            idc, off_a, off_b = fr.slice_params.get(sid, (1, 0, 0))
            if idc == 1:
                continue
            qp_cur = int(fr.qp_deblock[mby, mbx])

            def edge_ok(nx: int, ny: int) -> bool:
                if nx < 0 or ny < 0:
                    return False
                nsid = int(fr.slice_of_mb[ny, nx])
                if nsid < 0:
                    return False
                return idc == 0 or nsid == sid

            ox, oy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            # ---- vertical edges (filter columns), left to right
            for xe in (0, 4, 8, 12):
                if xe == 0:
                    if not edge_ok(mbx - 1, mby):
                        continue
                    qp_n = int(fr.qp_deblock[mby, mbx - 1])
                    qpav = (qp_cur + qp_n + 1) >> 1
                else:
                    qp_n = qp_cur
                    qpav = qp_cur
                idx_a = max(0, min(51, qpav + 2 * off_a))
                idx_b = max(0, min(51, qpav + 2 * off_b))
                x = ox + xe
                qbx = (ox + xe) // 4
                for seg in range(4):
                    by4 = mby * 4 + seg
                    bs = _bs_blocks(fr, qbx - 1, by4, qbx, by4, xe == 0)
                    if bs == 0:
                        continue
                    rows = slice(oy + seg * 4, oy + seg * 4 + 4)
                    p = [fr.y[rows, x - 1 - i] for i in range(4)]
                    q = [fr.y[rows, x + i] for i in range(4)]
                    _deblock_edge_luma(p, q, bs, idx_a, idx_b)
                if xe in (0, 8):
                    qpc_av = (
                        _chroma_qp(qp_cur, coff)
                        + _chroma_qp(qp_n, coff) + 1
                    ) >> 1
                    ia = max(0, min(51, qpc_av + 2 * off_a))
                    ib = max(0, min(51, qpc_av + 2 * off_b))
                    xc = cx + xe // 2
                    for seg in range(4):
                        by4 = mby * 4 + seg
                        bs = _bs_blocks(
                            fr, qbx - 1, by4, qbx, by4, xe == 0
                        )
                        if bs == 0:
                            continue
                        crows = slice(cy + seg * 2, cy + seg * 2 + 2)
                        for plane in (fr.cb, fr.cr):
                            pc = [plane[crows, xc - 1 - i] for i in range(2)]
                            qc = [plane[crows, xc + i] for i in range(2)]
                            _deblock_edge_chroma(pc, qc, bs, ia, ib)
            # ---- horizontal edges (filter rows), top to bottom
            for ye in (0, 4, 8, 12):
                if ye == 0:
                    if not edge_ok(mbx, mby - 1):
                        continue
                    qp_n = int(fr.qp_deblock[mby - 1, mbx])
                    qpav = (qp_cur + qp_n + 1) >> 1
                else:
                    qp_n = qp_cur
                    qpav = qp_cur
                idx_a = max(0, min(51, qpav + 2 * off_a))
                idx_b = max(0, min(51, qpav + 2 * off_b))
                yy = oy + ye
                qby = (oy + ye) // 4
                for seg in range(4):
                    bx4 = mbx * 4 + seg
                    bs = _bs_blocks(fr, bx4, qby - 1, bx4, qby, ye == 0)
                    if bs == 0:
                        continue
                    colsl = slice(ox + seg * 4, ox + seg * 4 + 4)
                    p = [fr.y[yy - 1 - i, colsl] for i in range(4)]
                    q = [fr.y[yy + i, colsl] for i in range(4)]
                    _deblock_edge_luma(p, q, bs, idx_a, idx_b)
                if ye in (0, 8):
                    qpc_av = (
                        _chroma_qp(qp_cur, coff)
                        + _chroma_qp(qp_n, coff) + 1
                    ) >> 1
                    ia = max(0, min(51, qpc_av + 2 * off_a))
                    ib = max(0, min(51, qpc_av + 2 * off_b))
                    yc = cy + ye // 2
                    for seg in range(4):
                        bx4 = mbx * 4 + seg
                        bs = _bs_blocks(
                            fr, bx4, qby - 1, bx4, qby, ye == 0
                        )
                        if bs == 0:
                            continue
                        ccols = slice(cx + seg * 2, cx + seg * 2 + 2)
                        for plane in (fr.cb, fr.cr):
                            pc = [plane[yc - 1 - i, ccols] for i in range(2)]
                            qc = [plane[yc + i, ccols] for i in range(2)]
                            _deblock_edge_chroma(pc, qc, bs, ia, ib)
