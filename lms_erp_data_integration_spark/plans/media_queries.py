"""Driver-gated media decode queries — the pixel-exact verification
surface for the from-scratch codec family (``operators/jpeg.py``,
``operators/gif.py``, ``operators/multimodal.py``, ``operators/
avi.py``).

Both queries build their payloads DETERMINISTICALLY inside executor
tasks (seeded numpy per payload_id, repo encoders), decode them with
the repo decoders, and emit exact integer signatures (CRC32 of the
decoded pixel buffer). The fixture set is fixed — independent of the
scale factor — so the literal-VALUES oracles are exact at every sf,
and any regression in ANY encoder or decoder (filter logic, Huffman
tables, LZW dictionary growth, interlace passes, chunk walks) flips a
CRC. This puts the r5 codec work under the driver's hard signal
instead of pytest alone (r5 verdict #5/#6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

from ..caching import tracked_persist
from .registry import query

_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("payload_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_payload_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("pixel_crc32", T.LongType()),
    ]
)

_FORMATS = ["png", "png_i", "jpeg", "gif", "tiff", "pnm"]
# ids 0-23 cycle _FORMATS (pinned since r6); ids 24-29 are TIFF 6.0
# TILE layout (r7: tiled decode landed), mixing compressions so every
# tile path (none/LZW/predictor/PackBits, gray/RGB, edge padding)
# sits under the driver gate; ids 30-35 (r8) are ARITHMETIC-coded
# JPEG (T.81 SOF9, QM-coder) — gray/color, 4:2:0, restart intervals,
# non-default DAC conditioning; ids 36-41 (r8) are LOSSLESS JPEG
# (T.81 SOF3) — every predictor selector exercised, gray/RGB, one
# point-transform case; decode is bit-exact so the CRC equals the
# source image's own CRC; ids 42-47 (r8) are PROGRESSIVE ARITHMETIC
# JPEG (T.81 SOF10) — the Annex-G scan script (DC first, banded AC
# first, DC/AC refinement) QM-coded, gray/color, 4:2:0, non-default
# DAC conditioning; ids 48-53 (r8) are 12-BIT extended sequential
# JPEG (T.81 SOF1, the medical/DICOM precision) — 16-bit DQT (Pq=1),
# extended Huffman ranges, uint16 rasters, restart intervals;
# ids 54-57 (r8) are QOI (qoiformat.org) — RGB/RGBA, all six chunk
# ops, lossless so the CRC equals the source image's own CRC;
# ids 58-63 (r8) are JPEG-LS (ITU-T T.87 / LOCO-I) — regular +
# run-mode content, gray/RGB, 8- and 16-bit, non-default RESET via
# LSE; lossless, so CRCs equal the source images' own CRCs
_N_PIXEL_PAYLOADS = 64


def _pixel_rows(ids) -> list[dict]:
    """Executor-side: generate image -> encode -> decode -> signature
    for each payload id. Deterministic: rng seeded by payload_id."""
    import zlib

    import numpy as np

    from ..operators import multimodal as mm
    from ..operators.gif import decode_gif, encode_gif
    from ..operators.jpeg import (
        decode_jpeg12,
        encode_jpeg,
        encode_jpeg12,
        encode_jpeg_arith,
        encode_jpeg_arith_progressive,
        encode_jpeg_lossless,
    )

    rows = []
    for pid in ids:
        pid = int(pid)
        rng = np.random.default_rng(pid)
        h = 5 + pid % 7
        w = 4 + (pid * 3) % 9
        if pid >= 58:
            # JPEG-LS (T.87): mixed smooth/flat/noisy content drives
            # both regular and run mode; 62-63 are 16-bit planes
            # (decoded via decode_jpegls directly — the 8-bit
            # dispatcher contract excludes deep rasters)
            from ..operators.jpegls import decode_jpegls, encode_jpegls

            h = 14 + pid % 7
            w = 11 + (pid * 3) % 13
            deep = pid >= 62
            gray = pid % 2 == 0
            shape = (h, w) if gray else (h, w, 3)
            if deep:
                img = rng.integers(0, 65536, (h, w), dtype=np.uint16)
                img[::3] = img[0, 0]  # flat rows: run mode
            else:
                img = np.cumsum(
                    rng.integers(0, 4, shape), axis=1
                ).astype(np.uint8)
                img[1::4] = 0  # flat rows: run mode
            payload = encode_jpegls(
                img, reset=32 if pid % 5 == 3 else 64
            )
            px = (
                decode_jpegls(payload)
                if deep
                else mm._decode_pixels(payload)
            )
            if px is None:
                continue
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "jpegls16" if deep else "jpegls",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        if pid >= 54:
            # QOI: RGB/RGBA alternating; low-cardinality palettes and
            # smooth ramps force INDEX/DIFF/LUMA/RUN chunks alongside
            # the literal ops; decode via the shared dispatcher
            h = 12 + pid % 9
            w = 10 + (pid * 3) % 11
            nc4 = pid % 2 == 1
            base = rng.integers(0, 5, (h, w, 4 if nc4 else 3))
            img = np.cumsum(base, axis=1).astype(np.uint8)
            if pid % 3 == 0:  # palette-ish rows: runs + index hits
                img[::2] = img[0]
            from ..operators.qoi import encode_qoi

            payload = encode_qoi(img)
            px = mm._decode_pixels(payload)
            if px is None:
                continue
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "qoi",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        if pid >= 48:
            # 12-bit extended sequential JPEG (SOF1): uint16 rasters
            # in 0..4095, 16-bit DQT entries, extended Huffman
            # category ranges, alternating gray/RGB and restarts
            h = 10 + pid % 11
            w = 9 + (pid * 5) % 13
            gray = pid % 2 == 0
            shape = (h, w) if gray else (h, w, 3)
            img = rng.integers(0, 4096, shape, dtype=np.uint16)
            payload = encode_jpeg12(
                img,
                quality=85 + (pid % 4) * 5,
                restart_interval=pid % 3,
            )
            px = decode_jpeg12(payload)
            if px is None:
                continue
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "jpeg12",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        if pid >= 42:
            # progressive arithmetic JPEG (SOF10): multi-MCU shapes so
            # the banded AC scans and refinement EOB decisions span
            # blocks; decoded pixels must be bit-identical to the
            # Huffman progressive process (shared DCT/quantization)
            h = 11 + pid % 13
            w = 9 + (pid * 3) % 17
            gray = pid % 3 == 0
            shape = (h, w) if gray else (h, w, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            payload = encode_jpeg_arith_progressive(
                img,
                quality=80 + (pid % 3) * 5,
                subsample=(not gray) and pid % 2 == 0,
                dc_cond=(1, 3) if pid % 5 == 2 else (0, 1),
                ac_kx=20 if pid % 5 == 2 else 5,
            )
            px = mm._decode_pixels(payload)
            if px is None:
                continue
            px = px if px.ndim == 3 else px[:, :, None]
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "jpeg_arith_prog",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        if pid >= 36:
            # lossless JPEG (SOF3): predictors 1-7 cycled (pid-36+1
            # for 36-41 covers 1..6; predictor 7 rides id 41's twin
            # below), gray/RGB alternating, one point-transform case
            h = 7 + pid % 9
            w = 6 + (pid * 5) % 11
            gray = pid % 2 == 0
            shape = (h, w) if gray else (h, w, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            sel = 1 + (pid - 36) % 7
            pt = 1 if pid == 41 else 0
            payload = encode_jpeg_lossless(
                img, predictor=sel, point_transform=pt
            )
            px = mm._decode_pixels(payload)
            if px is None:
                continue
            px = px if px.ndim == 3 else px[:, :, None]
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "jpeg_lossless",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        if pid >= 30:
            # arithmetic-coded JPEG (SOF9, QM-coder) through the same
            # dispatcher; decoded pixels must be bit-identical to the
            # Huffman process on the same quantized coefficients
            h = 9 + pid % 11
            w = 8 + (pid * 7) % 13
            gray = pid % 3 == 0
            shape = (h, w) if gray else (h, w, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            payload = encode_jpeg_arith(
                img,
                quality=85 + (pid % 3) * 5,
                subsample=(not gray) and pid % 2 == 0,
                restart_interval=pid % 4,
                dc_cond=(1, 3) if pid % 5 == 0 else (0, 1),
                ac_kx=20 if pid % 5 == 0 else 5,
            )
            px = mm._decode_pixels(payload)
            if px is None:
                continue
            px = px if px.ndim == 3 else px[:, :, None]
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "jpeg_arith",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        if pid >= 24:
            # tiled TIFF: larger-than-one-tile images, edge padding,
            # alternating gray/RGB and compression modes
            h = 17 + pid % 19
            w = 14 + (pid * 5) % 23
            shape = (h, w) if pid % 2 == 0 else (h, w, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            payload = mm.encode_tiff(
                img,
                big_endian=pid % 3 == 0,
                lzw=pid % 3 == 1,
                predictor=pid % 3 == 1,
                packbits=pid % 3 == 2,
                tiled=True,
                tile_size=(16, 32) if pid % 5 == 0 else (16, 16),
            )
            px = mm._decode_pixels(payload)
            if px is None:
                continue
            px = px if px.ndim == 3 else px[:, :, None]
            rows.append(
                {
                    "payload_id": pid,
                    "fmt": "tiff_tiled",
                    "n_payload_bytes": len(payload),
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "channels": px.shape[2],
                    "pixel_crc32": zlib.crc32(
                        np.ascontiguousarray(px).tobytes()
                    ),
                }
            )
            continue
        fmt = _FORMATS[pid % len(_FORMATS)]
        if fmt == "gif":
            pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
            idx = rng.integers(0, 64, (h, w), dtype=np.uint8)
            payload = encode_gif(idx, pal)
            px = decode_gif(payload)
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            if fmt == "png":
                payload = mm.encode_png(img)
            elif fmt == "png_i":
                payload = mm.encode_png(img, interlace=True)
            elif fmt == "jpeg":
                payload = encode_jpeg(img)
            elif fmt == "tiff":
                payload = mm.encode_tiff(img, lzw=True, predictor=True)
            else:  # pnm (P6)
                payload = (
                    b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
                )
            px = mm._decode_pixels(payload)
        if px is None:
            continue
        px = px if px.ndim == 3 else px[:, :, None]
        rows.append(
            {
                "payload_id": pid,
                "fmt": fmt,
                "n_payload_bytes": len(payload),
                "width": px.shape[1],
                "height": px.shape[0],
                "channels": px.shape[2],
                "pixel_crc32": zlib.crc32(
                    np.ascontiguousarray(px).tobytes()
                ),
            }
        )
    return rows


@query(
    "llm_decode_pixel_checksums",
    # literal-VALUES oracle: the fixture set is sf-independent;
    # regenerate by printing _pixel_rows(range(30)) after any
    # intentional codec change
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST('png' AS VARCHAR), CAST(133 AS BIGINT), CAST(4 AS BIGINT), CAST(5 AS BIGINT), CAST(3 AS BIGINT), CAST(302040629 AS BIGINT)),
  (1, 'png_i', 206, 7, 6, 3, 1191826467),
  (2, 'jpeg', 1022, 10, 7, 3, 1303101238),
  (3, 'gif', 248, 4, 8, 3, 2627054745),
  (4, 'tiff', 354, 7, 9, 3, 3760656964),
  (5, 'pnm', 313, 10, 10, 3, 167433302),
  (6, 'png', 211, 4, 11, 3, 2035333664),
  (7, 'png_i', 184, 7, 5, 3, 2328249974),
  (8, 'jpeg', 981, 10, 6, 3, 1853650848),
  (9, 'gif', 246, 4, 7, 3, 1289101628),
  (10, 'tiff', 332, 7, 8, 3, 73762456),
  (11, 'pnm', 282, 10, 9, 3, 2230487362),
  (12, 'png', 198, 4, 10, 3, 4165442502),
  (13, 'png_i', 321, 7, 11, 3, 22684973),
  (14, 'jpeg', 1013, 10, 5, 3, 1047514336),
  (15, 'gif', 242, 4, 6, 3, 1733413688),
  (16, 'tiff', 308, 7, 7, 3, 2371697587),
  (17, 'pnm', 252, 10, 8, 3, 3472453583),
  (18, 'png', 185, 4, 9, 3, 2145153027),
  (19, 'png_i', 298, 7, 10, 3, 1946913871),
  (20, 'jpeg', 1375, 10, 11, 3, 1532692962),
  (21, 'gif', 239, 4, 5, 3, 3081674837),
  (22, 'tiff', 284, 7, 6, 3, 125636109),
  (23, 'pnm', 222, 10, 7, 3, 2708203307),
  (24, 'tiff_tiled', 1190, 19, 22, 1, 2861817058),
  (25, 'tiff_tiled', 2405, 24, 23, 3, 348613663),
  (26, 'tiff_tiled', 941, 29, 24, 1, 3339185235),
  (27, 'tiff_tiled', 4796, 34, 25, 3, 2599770881),
  (28, 'tiff_tiled', 650, 16, 26, 1, 2574825527),
  (29, 'tiff_tiled', 1979, 21, 27, 3, 4048868154),
  (30, 'jpeg_arith', 350, 10, 17, 1, 3745164620),
  (31, 'jpeg_arith', 1068, 17, 18, 3, 84221391),
  (32, 'jpeg_arith', 790, 11, 19, 3, 1561402792),
  (33, 'jpeg_arith', 334, 18, 9, 1, 3617295482),
  (34, 'jpeg_arith', 455, 12, 10, 3, 380617304),
  (35, 'jpeg_arith', 1096, 19, 11, 3, 1961870652),
  (36, 'jpeg_lossless', 166, 10, 7, 1, 3958878314),
  (37, 'jpeg_lossless', 585, 15, 8, 3, 2382531046),
  (38, 'jpeg_lossless', 181, 9, 9, 1, 3842572368),
  (39, 'jpeg_lossless', 692, 14, 10, 3, 3324785416),
  (40, 'jpeg_lossless', 192, 8, 11, 1, 1294595814),
  (41, 'jpeg_lossless', 697, 13, 12, 3, 3096708290),
  (42, 'jpeg_arith_prog', 345, 16, 14, 1, 2114405455),
  (43, 'jpeg_arith_prog', 901, 19, 15, 3, 4021160576),
  (44, 'jpeg_arith_prog', 682, 22, 16, 3, 2433937771),
  (45, 'jpeg_arith_prog', 518, 25, 17, 1, 3929470375),
  (46, 'jpeg_arith_prog', 590, 11, 18, 3, 3884512524),
  (47, 'jpeg_arith_prog', 1009, 14, 19, 3, 3315520893),
  (48, 'jpeg12', 913, 15, 14, 1, 871743508),
  (49, 'jpeg12', 2819, 20, 15, 3, 3678634773),
  (50, 'jpeg12', 965, 12, 16, 1, 2638500597),
  (51, 'jpeg12', 2771, 17, 17, 3, 1923201571),
  (52, 'jpeg12', 866, 9, 18, 1, 3593233707),
  (53, 'jpeg12', 2809, 14, 19, 3, 845289056),
  (54, 'qoi', 395, 18, 12, 3, 2545604476),
  (55, 'qoi', 603, 10, 13, 4, 1998668283),
  (56, 'qoi', 389, 13, 14, 3, 1321189785),
  (57, 'qoi', 914, 16, 15, 4, 1449318864),
  (58, 'jpegls', 137, 16, 16, 1, 116807122),
  (59, 'jpegls', 396, 19, 17, 3, 3132768597),
  (60, 'jpegls', 169, 22, 18, 1, 335899660),
  (61, 'jpegls', 307, 12, 19, 3, 90954833),
  (62, 'jpegls16', 660, 15, 20, 1, 3953802440),
  (63, 'jpegls16', 608, 18, 14, 1, 3345470258)
) AS t(payload_id, fmt, n_payload_bytes, width, height, channels,
       pixel_crc32)
""",
)
def decode_pixel_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-exact codec gate: 64 deterministic fixture images cycle
    through PNG (plain + Adam7 interlace), baseline JPEG, GIF/LZW,
    TIFF-LZW-with-predictor, PNM, (ids 24-29, r7) TIFF 6.0 TILE
    layout — per-tile prediction/compression, 16-multiple tile dims,
    zero-padded edges cropped on decode — (ids 30-35, r8)
    ARITHMETIC-coded JPEG (T.81 SOF9: QM-coder + the F.1.4.4.1 DC/AC
    statistical model, gray/4:2:0/restart/DAC-conditioning variants,
    ``operators/qm.py``), (ids 36-41, r8) LOSSLESS JPEG (T.81
    SOF3: spatial predictors 1-7 + modulo-2^16 difference coding;
    bit-exact, so those CRCs equal the source images' own CRCs), and
    (ids 42-47, r8) PROGRESSIVE ARITHMETIC JPEG (T.81 SOF10: the
    Annex-G spectral-selection / successive-approximation scan script
    QM-coded; decoded pixels bit-identical to the SOF2 Huffman
    process on the same quantized coefficients), (ids 48-53, r8)
    12-BIT extended sequential JPEG (T.81 SOF1: 16-bit DQT, extended
    Huffman category ranges, uint16 rasters in 0..4095 via
    ``decode_jpeg12``), (ids 54-57, r8) QOI (the complete
    qoiformat.org spec: all six chunk ops, rolling color index,
    RGB/RGBA), and (ids 58-63, r8) JPEG-LS (ITU-T T.87 LOCO-I:
    gradient-context modeling, MED prediction with adaptive bias,
    limited Golomb coding, run mode with the J[] segment orders,
    8/16-bit, LSE presets; the QOI and JPEG-LS families are
    lossless, so those CRCs equal the source images' own CRCs) —
    each encoded AND decoded by
    the repo's from-scratch codecs inside executor tasks, signed with
    a CRC32 of the decoded pixel buffer. The fixture set is fixed
    (independent of sf_dir), so the pinned oracle is exact at every
    scale; a regression anywhere in the encode/decode path flips a
    CRC and the driver row goes red.

    Scale posture: the payload column never exists driver-side —
    generation, encode, and decode all run inside one Arrow-batched
    ``mapInPandas`` over ``spark.range``; the real-corpus analog
    (payloads from parquet binary columns) uses the identical
    decode dispatcher (``operators/multimodal.py:_decode_pixels``)."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _pixel_rows(pdf["id"]),
                columns=[f.name for f in _PIXEL_SCHEMA.fields],
            )

    return (
        spark.range(0, _N_PIXEL_PAYLOADS, 1, 8)
        .mapInPandas(op, _PIXEL_SCHEMA)
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("payload_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)

_AUDIO_CODECS = ["pcm16", "pcm8", "mulaw", "alaw"]
# ids 0-11 cycle the WAV codecs (pinned since r6); ids 12-17 are FLAC
# (r7: from-scratch spec decoder) — mono fixed/LPC, constant,
# full-range noise (verbatim/escape residuals), and the three stereo
# decorrelation modes; ids 18-19 are IMA ADPCM (WAVE fmt 0x11,
# mono + stereo) — every decoder path sits under the gate
_N_AUDIO_PAYLOADS = 20


def _mulaw_encode(x, np):
    """Textbook ITU G.711 mu-law companding (fixture writer; the
    DECODER under test is operators/multimodal.py:_wav_samples)."""
    BIAS, CLIP = 0x84, 32635
    out = bytearray()
    for s in x:
        sign = 0x80 if s < 0 else 0
        s = min(abs(int(s)), CLIP) + BIAS
        exp, mask = 7, 0x4000
        while exp > 0 and not (s & mask):
            exp -= 1
            mask >>= 1
        mant = (s >> (exp + 3)) & 0x0F
        out.append(~(sign | (exp << 4) | mant) & 0xFF)
    return bytes(out)


def _alaw_encode(x, np):
    """ITU G.711 A-law companding (fixture writer), exact inverse of
    the repo decoder's segment layout: exp 0 covers lin = mant*16+8,
    exp >= 1 covers lin = (mant*16+264) << (exp-1)."""
    out = bytearray()
    for s in x:
        s = int(s)
        sign = 0x80 if s < 0 else 0
        m = min(abs(s), 32635)
        if m < 256:
            exp, mant = 0, m >> 4
        else:
            exp = m.bit_length() - 8
            mant = (m >> (exp + 3)) & 0x0F
        out.append((sign | (exp << 4) | mant) ^ 0x55)
    return bytes(out)


def _audio_rows(ids) -> list[dict]:
    import struct

    import numpy as np

    from ..operators import multimodal as mm

    from ..operators.flac import encode_flac

    rows = []
    for pid in ids:
        pid = int(pid)
        rng = np.random.default_rng(2000 + pid)
        if pid >= 18:
            # IMA ADPCM (lossy 4-bit): the DECODED result is still
            # fully deterministic, which is what the gate pins
            ch = 1 + (pid - 18)
            rate = 8000
            n = 2000 + 100 * pid
            t = np.arange(n)
            tone = (
                10000 * np.sin(2 * np.pi * (240 + 10 * pid) * t / rate)
            ).astype(np.int64)
            if ch == 2:
                x = np.stack([tone, (tone * 2) // 3], axis=1).reshape(-1)
            else:
                x = tone
            data, balign = mm._ima_adpcm_encode(x, ch)
            fmtch = struct.pack(
                "<HHIIHH", 0x11, ch, rate, rate * balign, balign, 4
            )
            payload = (
                b"RIFF" + struct.pack("<I", 28 + len(fmtch) + len(data))
                + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmtch)) + fmtch
                + b"data" + struct.pack("<I", len(data)) + data
            )
            meta = mm.decode_wav(payload)
            if meta is None:
                continue
            fp = mm.audio_fingerprint(payload)
            if fp is None:
                fp = -1
            elif fp >= 1 << 63:
                fp -= 1 << 64
            rows.append(
                {
                    "payload_id": pid,
                    "codec": "ima_adpcm",
                    "sample_rate": meta["sample_rate"],
                    "channels": meta["channels"],
                    "n_samples": meta["n_samples"],
                    "duration_ms": meta["duration_ms"],
                    "rms_milli": meta["rms_milli"],
                    "fingerprint": int(fp),
                }
            )
            continue
        if pid >= 12:
            rate = 8000 * (1 + pid % 2)
            n = 1600 + 200 * (pid - 12)
            t = np.arange(n)
            tone = (
                11000 * np.sin(2 * np.pi * (180 + 30 * pid) * t / rate)
            ).astype(np.int64)
            kind = ["flac", "flac_const", "flac_noise",
                    "flac_ls", "flac_rs", "flac_ms"][pid - 12]
            if kind == "flac_const":
                x = np.full(n, -257 + pid, np.int64)
            elif kind == "flac_noise":
                x = rng.integers(-32768, 32767, n)
            elif kind == "flac":
                x = tone + rng.integers(-400, 400, n)
            else:
                left = tone + rng.integers(-300, 300, n)
                right = (tone * 3) // 4 + rng.integers(-300, 300, n)
                x = np.stack([left, right], axis=1)
            mode = {"flac_ls": "left_side", "flac_rs": "right_side",
                    "flac_ms": "mid_side"}.get(kind, "independent")
            payload = encode_flac(x, rate, stereo_mode=mode)
            meta = mm.decode_wav(payload)
            if meta is None:
                continue
            fp = mm.audio_fingerprint(payload)
            if fp is None:
                fp = -1
            elif fp >= 1 << 63:
                fp -= 1 << 64
            rows.append(
                {
                    "payload_id": pid,
                    "codec": kind,
                    "sample_rate": meta["sample_rate"],
                    "channels": meta["channels"],
                    "n_samples": meta["n_samples"],
                    "duration_ms": meta["duration_ms"],
                    "rms_milli": meta["rms_milli"],
                    "fingerprint": int(fp),
                }
            )
            continue
        codec = _AUDIO_CODECS[pid % len(_AUDIO_CODECS)]
        rate = 8000 * (1 + pid % 2)
        n = 400 + 50 * pid
        t = np.arange(n)
        tone = 12000 * np.sin(2 * np.pi * (220 + 20 * pid) * t / rate)
        noise = rng.integers(-2000, 2000, n)
        samples = (tone + noise).astype(np.int64)
        if codec == "pcm16":
            fmt_code, bits = 1, 16
            data = samples.astype("<i2").tobytes()
        elif codec == "pcm8":
            fmt_code, bits = 1, 8
            data = ((samples >> 8) + 128).clip(0, 255).astype(
                np.uint8
            ).tobytes()
        elif codec == "mulaw":
            fmt_code, bits = 7, 8
            data = _mulaw_encode(samples, np)
        else:
            fmt_code, bits = 6, 8
            data = _alaw_encode(samples, np)
        balign = bits // 8
        fmtch = struct.pack(
            "<HHIIHH", fmt_code, 1, rate, rate * balign, balign, bits
        )
        payload = (
            b"RIFF" + struct.pack("<I", 28 + len(fmtch) + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmtch)) + fmtch
            + b"data" + struct.pack("<I", len(data)) + data
        )
        meta = mm.decode_wav(payload)
        if meta is None:
            continue
        fp = mm.audio_fingerprint(payload)
        if fp is None:
            fp = -1
        elif fp >= 1 << 63:  # unsigned 64-bit -> signed long column
            fp -= 1 << 64
        rows.append(
            {
                "payload_id": pid,
                "codec": codec,
                "sample_rate": meta["sample_rate"],
                "channels": meta["channels"],
                "n_samples": meta["n_samples"],
                "duration_ms": meta["duration_ms"],
                "rms_milli": meta["rms_milli"],
                "fingerprint": int(fp),
            }
        )
    return rows


@query(
    "llm_audio_decode_stats",
    # literal-VALUES oracle: fixture set is sf-independent; regenerate
    # by printing _audio_rows(range(20)) after intentional changes
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'pcm16', CAST(8000 AS BIGINT), CAST(1 AS BIGINT),
   CAST(400 AS BIGINT), CAST(50 AS BIGINT), CAST(264 AS BIGINT),
   CAST(-2964825481421860150 AS BIGINT)),
  (1, 'pcm8', 16000, 1, 450, 28, 261, -732455141383735843),
  (2, 'mulaw', 8000, 1, 500, 62, 258, 6001445949948387657),
  (3, 'alaw', 16000, 1, 550, 34, 258, -3317501485048801803),
  (4, 'pcm16', 8000, 1, 600, 75, 261, 3979842020318196537),
  (5, 'pcm8', 16000, 1, 650, 40, 261, 8753728269761602941),
  (6, 'mulaw', 8000, 1, 700, 87, 262, 4124511370810962739),
  (7, 'alaw', 16000, 1, 750, 46, 262, 8318554718912738145),
  (8, 'pcm16', 8000, 1, 800, 100, 260, 2096734714317183259),
  (9, 'pcm8', 16000, 1, 850, 53, 261, 4123394215490433339),
  (10, 'mulaw', 8000, 1, 900, 112, 260, 2130516092363839769),
  (11, 'alaw', 16000, 1, 950, 59, 259, 4123392050826918205),
  (12, 'flac', 8000, 1, 1600, 200, 237, 1085102592571150095),
  (13, 'flac_const', 16000, 1, 1800, 112, 7, 0),
  (14, 'flac_noise', 8000, 1, 2000, 250, 576, 2414388588469883137),
  (15, 'flac_ls', 16000, 2, 2200, 137, 209, 2242545349356887839),
  (16, 'flac_rs', 8000, 2, 2400, 300, 209, 1121272129234374415),
  (17, 'flac_ms', 16000, 2, 2600, 162, 209, 6744590801950054681),
  (18, 'ima_adpcm', 8000, 1, 4040, 505, 216, 1085102592571150287),
  (19, 'ima_adpcm', 8000, 2, 4040, 505, 180, 1084537443560787343)
) AS t(payload_id, codec, sample_rate, channels, n_samples,
       duration_ms, rms_milli, fingerprint)
""",
)
def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-codec gate, the WAV analog of the pixel-CRC query: 20
    deterministic fixture signals (tone + seeded noise) encoded as
    PCM16, PCM8, G.711 mu-law, A-law, and (ids 12-17, r7) FLAC —
    mono fixed/LPC prediction, constant and verbatim/escape-residual
    blocks, and all three stereo decorrelation modes, through the
    from-scratch spec decoder (``operators/flac.py``, MD5-verified) —
    decoded by the repo's unified audio path, signed with the exact
    integer RMS and the band-energy audio fingerprint; ids 18-19 add
    IMA ADPCM (WAVE fmt 0x11, mono + stereo) — lossy on the wire but
    bit-deterministic after decode, which is what the gate pins. Fixtures are sf-independent, so the
    pinned oracle is exact at every scale; a companding-table or
    chunk-walk regression flips a value.

    Scale posture: generation+decode run inside one Arrow-batched
    ``mapInPandas`` over ``spark.range``; payloads never reach the
    driver."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _audio_rows(pdf["id"]),
                columns=[f.name for f in _AUDIO_SCHEMA.fields],
            )

    return spark.range(0, _N_AUDIO_PAYLOADS, 1, 4).mapInPandas(
        op, _AUDIO_SCHEMA
    )


_SHARD_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("sample_key", T.StringType()),
        T.StructField("member_ext", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("member_crc32", T.LongType()),
    ]
)

_N_SHARDS = 4
_SAMPLES_PER_SHARD = 6


def _shard_member_rows(ids) -> list[dict]:
    """Executor-side: build a deterministic WebDataset-style tar shard
    (txt + json member per sample; gzipped for odd shard ids), then
    re-read it through ``iter_tar_members`` — the same walk the
    ``webdataset`` read format and ``explode_tar_shards`` use."""
    import zlib

    from ..operators.multimodal import build_tar_shard, iter_tar_members

    rows = []
    for sid in ids:
        sid = int(sid)
        members = []
        for i in range(_SAMPLES_PER_SHARD):
            key = f"{sid:03d}{i:04d}"
            members.append(
                (f"{key}.txt", (f"sample text {sid} {i} " * (i + 1)).encode())
            )
            members.append(
                (f"{key}.json", b'{"id": %d, "shard": %d}' % (i, sid))
            )
        payload = build_tar_shard(members, gzipped=(sid % 2 == 1))
        for name, data in iter_tar_members(payload):
            base = name.rsplit("/", 1)[-1]
            stem, dot, ext = base.partition(".")
            rows.append(
                {
                    "shard_id": sid,
                    "sample_key": stem,
                    "member_ext": ext if dot else "",
                    "n_bytes": len(data),
                    "member_crc32": zlib.crc32(data),
                }
            )
    return rows


@query(
    "llm_webdataset_shard_stats",
    r"""
WITH ids AS (SELECT unnest(range(0, 4)) AS shard_id),
samples AS (
  SELECT shard_id, i
  FROM ids, unnest(range(0, 6)) AS t(i)),
members AS (
  SELECT shard_id,
         lpad(CAST(shard_id AS VARCHAR), 3, '0')
           || lpad(CAST(i AS VARCHAR), 4, '0') AS sample_key,
         CASE WHEN ext = 'txt' THEN
           strlen(repeat('sample text ' || shard_id || ' ' || i || ' ',
                         CAST(i + 1 AS INT)))
         ELSE
           strlen('{"id": ' || i || ', "shard": ' || shard_id || '}')
         END AS n_bytes
  FROM samples, unnest(['txt', 'json']) AS e(ext))
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(DISTINCT sample_key) AS BIGINT) AS n_samples,
       CAST(SUM(n_bytes) AS BIGINT) AS sum_member_bytes
FROM members
GROUP BY shard_id
""",
)
def webdataset_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard plumbing under the driver gate: 4 fixture tar
    shards (gzipped on odd ids; txt+json member per sample, mtime
    pinned to 0 for determinism) are built and re-read executor-side
    through the same member walk the ``webdataset`` read format uses,
    then reduced to per-shard member/sample counts and an exact byte
    sum. The oracle REBUILDS the expected member sizes arithmetically
    — a drift in tar serialization, gzip handling, or the
    sample-key/extension split breaks the match.

    Scale posture: shards explode inside one Arrow ``mapInPandas``
    over ``spark.range`` — the splits-are-shards read path; the
    aggregation is shard-cardinality-sized."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _shard_member_rows(pdf["id"]),
                columns=[f.name for f in _SHARD_MEMBER_SCHEMA.fields],
            )

    members = spark.range(0, _N_SHARDS, 1, 2).mapInPandas(
        op, _SHARD_MEMBER_SCHEMA
    )
    return members.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("sample_key").alias("n_samples"),
        F.sum("n_bytes").alias("sum_member_bytes"),
    )


_WARC_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("seg_id", T.LongType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("http_status", T.LongType()),
        T.StructField("html", T.StringType()),
    ]
)

_N_WARC_SEGMENTS = 6
_PAGES_PER_SEGMENT = 5


def warc_segment_records(seg: int) -> list[dict]:
    """Deterministic fixture records for segment ``seg`` (5 HTML pages
    with scripts, entities, nav links, tracking-param URLs) — shared
    by the batch ingest query and the streaming twin
    (``stream_warc_ingest``) so both pin the same bytes."""
    recs = []
    for i in range(_PAGES_PER_SEGMENT):
        html = (
            "<html><head><title>skip me</title>"
            "<script>var x = 1 &lt; 2;</script></head>"
            f"<body><h1>Page {seg}-{i}</h1>"
            f"<p>hello &amp;lt; world {seg} {i} the of and</p>"
            "<!-- boilerplate -->"
            f"<a href='x'>nav {i}</a>"
            f"<div>tail text {seg * 10 + i}</div></body></html>"
        )
        recs.append(
            {
                "record_type": "response",
                "target_uri": (
                    f"https://WWW.Example.com:443/a/{seg}/{i}/"
                    f"?utm_source=feed&q={i}#frag"
                ),
                "http_status": 200,
                "content_type": "text/html",
                "body": html.encode(),
            }
        )
    return recs


def _warc_page_rows(ids) -> list[dict]:
    """Executor-side: build a deterministic .warc(.gz) segment per id,
    then parse it back through the STREAMING reader — the same code
    path the ``spark.read.format("warc")`` source uses."""
    import io

    from ..sources.warc import build_warc, iter_warc_stream

    rows = []
    for seg in ids:
        seg = int(seg)
        payload = build_warc(
            warc_segment_records(seg), gzipped=(seg % 2 == 0)
        )
        for r in iter_warc_stream(io.BytesIO(payload)):
            rows.append(
                {
                    "seg_id": seg,
                    "target_uri": r["target_uri"],
                    "http_status": r["http_status"],
                    "html": r["body"].decode("utf-8", "replace"),
                }
            )
    return rows


@query(
    "llm_warc_ingest_stats",
    # literal-VALUES oracle: fixture segments are sf-independent;
    # regenerate by running the query after intentional changes to
    # the WARC reader, html_to_text, or canonical_url
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT),
   CAST(290 AS BIGINT), CAST(10698157547 AS BIGINT)),
  (1, 5, 5, 295, 14209188453),
  (2, 5, 5, 295, 9497684577),
  (3, 5, 5, 295, 12305511005),
  (4, 5, 5, 295, 11116190329),
  (5, 5, 5, 295, 8417944181)
) AS t(seg_id, n_pages, n_canonical_urls, sum_text_chars,
       text_crc_sum)
""",
)
def warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl ingest chain under the driver gate: 6 fixture
    ``.warc`` / ``.warc.gz`` segments (alternating, so BOTH the plain
    and the gzip-member streaming path run) are built and re-parsed
    executor-side with ``iter_warc_stream`` — the same streaming
    reader the ``warc`` data source uses — then the pages flow through
    the PURE-Column curation layer: ``html_to_text`` (script/comment
    removal, block tags, entity decode with &amp; last) and
    ``canonical_url`` (scheme/www/case/port/tracking-param/fragment
    folding). Per segment: page count, distinct canonical URLs, exact
    text-length sum and a crc32 sum over the extracted text — any
    regression in the reader, the HTML-to-text chain, or URL
    canonicalization flips a value.

    Scale posture: segment parse is per-task streaming (bounded
    buffer); the curation layer is one codegen'd projection; the
    aggregation is segment-cardinality-sized."""
    import pandas as pd

    from ..operators.text import canonical_url, html_to_text

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _warc_page_rows(pdf["id"]),
                columns=[f.name for f in _WARC_PAGE_SCHEMA.fields],
            )

    pages = spark.range(0, _N_WARC_SEGMENTS, 1, 3).mapInPandas(
        op, _WARC_PAGE_SCHEMA
    )
    curated = pages.select(
        "seg_id",
        canonical_url(F.col("target_uri")).alias("curl"),
        html_to_text(F.col("html")).alias("text"),
    )
    return curated.groupBy("seg_id").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("curl").alias("n_canonical_urls"),
        F.sum(F.length("text")).alias("sum_text_chars"),
        F.sum(F.crc32(F.col("text"))).alias("text_crc_sum"),
    )


_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frames_decoded", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("dts_last_ms", T.LongType()),
        T.StructField("pixels_crc32", T.LongType()),
    ]
)

_N_VIDEOS = 8


def _video_rows(ids) -> list[dict]:
    import zlib

    import numpy as np

    from ..operators import avi
    from ..operators.jpeg import decode_jpeg, encode_jpeg

    rows = []
    for vid in ids:
        vid = int(vid)
        rng = np.random.default_rng(1000 + vid)
        w = 8 * (2 + vid % 3)
        h = 8 * (1 + vid % 2)
        n = 3 + vid % 4
        fps = 4 + vid % 3
        frames = [
            encode_jpeg(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            )
            for _ in range(n)
        ]
        payload = avi.build_avi_mjpeg(frames, w, h, fps=fps)
        meta = avi.avi_meta(payload)
        crc = 0
        decoded = 0
        last_ms = 0
        for idx, fb in avi.iter_avi_frames(payload):
            px = decode_jpeg(fb)
            if px is None:
                continue
            decoded += 1
            last_ms = idx * meta["us_per_frame"] // 1000
            crc = zlib.crc32(px.tobytes(), crc)
        rows.append(
            {
                "video_id": vid,
                "n_frames": meta["n_frames"],
                "frames_decoded": decoded,
                "width": meta["width"],
                "height": meta["height"],
                "dts_last_ms": last_ms,
                "pixels_crc32": crc,
            }
        )
    return rows


@query(
    "llm_video_frame_stats",
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(16 AS BIGINT), CAST(8 AS BIGINT), CAST(500 AS BIGINT), CAST(2936782930 AS BIGINT)),
  (1, 4, 4, 24, 16, 600, 4159262582),
  (2, 5, 5, 32, 8, 666, 3524704602),
  (3, 6, 6, 16, 16, 1250, 924695305),
  (4, 3, 3, 24, 8, 400, 2565567128),
  (5, 4, 4, 32, 16, 499, 1674484812),
  (6, 5, 5, 16, 8, 1000, 2569562802),
  (7, 6, 6, 24, 16, 1000, 3570284818)
) AS t(video_id, n_frames, frames_decoded, width, height,
       dts_last_ms, pixels_crc32)
""",
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decoded video path (r5 verdict #5): 8 deterministic
    MJPEG-in-AVI fixture videos are muxed (``operators/avi.py:
    build_avi_mjpeg``), demuxed via the movi chunk walk, and every
    frame decoded by the from-scratch baseline JPEG decoder; the
    running CRC32 over all decoded frame pixels pins the entire
    demux+decode chain bit-for-bit. H.264 stays correctly out of
    scope — MP4 payloads remain demux-only and are dropped by the
    decode stage, a boundary ``decode_video_frame_stats`` makes
    explicit.

    Scale posture: one video payload = one row; mux/demux/decode all
    run inside one Arrow-batched ``mapInPandas`` over
    ``spark.range`` — payloads never shuffle or reach the driver."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _video_rows(pdf["id"]),
                columns=[f.name for f in _VIDEO_SCHEMA.fields],
            )

    return spark.range(0, _N_VIDEOS, 1, 4).mapInPandas(op, _VIDEO_SCHEMA)


_VIDEO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


_N_CODEC_VIDEOS = 26


def _mux_codec_fixture(vid: int) -> bytes:
    """Deterministic fixture video seeded by id (sf-independent):
    ids 0-7 alternate AVI rawvideo (BI_RGB DIB, even) and MJPEG
    (odd); ids 8-11 are ``raw ``-in-MP4 (packed top-down RGB with
    real stsd/stsz/stco/stsc/stts sample tables); ids 12-15 are
    H.264-in-MP4 (from-scratch CAVLC intra encoder -> avc1 sample
    entry with a real avcC record, ``operators/h264.py`` +
    ``multimodal.build_mp4_avc``); ids 16-19 are H.264 with the
    IN-LOOP DEBLOCKING filter signalled ON (idc 0 + 8.7 strong and
    normal edge filters in both loops); ids 20-23 (r13) are H.264
    with CABAC entropy coding (``operators/cabac.py`` — Main-profile
    arithmetic-coded intra slices, the shared-context SEI marker
    riding every access unit); ids 24-25 (late r14) are CABAC
    ``intra-pcm`` streams — real I_PCM macroblocks under arithmetic
    coding via the 9.3.1.2 flush/byte-align/raw-samples/engine-restart
    escape — one corpus exercising all five decodable codec paths,
    CAVLC and CABAC entropy layers, transform and PCM macroblocks."""
    import numpy as np

    from ..operators import avi
    from ..operators import cabac
    from ..operators import h264
    from ..operators import multimodal as mm
    from ..operators.jpeg import encode_jpeg

    rng = np.random.default_rng(7000 + vid)
    if vid >= 24:  # CABAC intra with real I_PCM MBs (late r14)
        w = 16 * (1 + vid % 2)
        h = 16 * (1 + (vid // 2) % 2)
        n = 2 + vid % 3
        fps = 4 + vid % 3
        frames = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        stream, _ = cabac.encode_h264_annexb_cabac(
            frames, qp=18 + 5 * (vid % 4), chroma_qp_offset=vid % 3 - 1,
            gop="intra-pcm",
        )
        avcc, samples = h264.annexb_to_avcc(stream)
        return mm.build_mp4_avc(samples, avcc, w, h, fps=fps)
    if vid >= 20:  # H.264 CABAC intra (arithmetic entropy coding)
        w = 16 * (1 + vid % 2)
        h = 16 * (1 + (vid // 2) % 2)
        n = 2 + vid % 3
        fps = 4 + vid % 3
        frames = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        stream, _ = cabac.encode_h264_annexb_cabac(
            frames, qp=18 + 5 * (vid % 4), chroma_qp_offset=vid % 3 - 1,
        )
        avcc, samples = h264.annexb_to_avcc(stream)
        return mm.build_mp4_avc(samples, avcc, w, h, fps=fps)
    if vid >= 12:  # H.264: MB-aligned geometry, per-id QP spread;
        # ids 16-19 signal the in-loop deblocking filter ON
        w = 16 * (1 + vid % 2)
        h = 16 * (1 + (vid // 2) % 2)
        n = 2 + vid % 3
        fps = 4 + vid % 3
        frames = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        stream, _ = h264.encode_h264_annexb(
            frames, qp=18 + 5 * (vid % 4), chroma_qp_offset=vid % 3 - 1,
            deblock=vid >= 16,
        )
        avcc, samples = h264.annexb_to_avcc(stream)
        return mm.build_mp4_avc(samples, avcc, w, h, fps=fps)
    w = 8 * (2 + vid % 3)
    h = 8 * (1 + vid % 2)
    n = 3 + vid % 4
    fps = 4 + vid % 3
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    if vid >= 8:
        return mm.build_mp4_raw(frames, w, h, fps=fps)
    if vid % 2 == 0:
        return avi.build_avi_rawvideo(frames, w, h, fps=fps)
    return avi.build_avi_mjpeg([encode_jpeg(f) for f in frames], w, h, fps=fps)


@query(
    "llm_video_codec_stats",
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST('raw' AS VARCHAR), CAST(3 AS BIGINT), CAST(16 AS BIGINT), CAST(8 AS BIGINT), CAST(500 AS BIGINT), CAST(6659364664 AS BIGINT)),
  (1, 'MJPG', 4, 24, 16, 600, 6612949530),
  (2, 'raw', 5, 32, 8, 666, 7294885029),
  (3, 'MJPG', 6, 16, 16, 1250, 12106122364),
  (4, 'raw', 3, 24, 8, 400, 10633261190),
  (5, 'MJPG', 4, 32, 16, 499, 7417584520),
  (6, 'raw', 5, 16, 8, 1000, 15781340042),
  (7, 'MJPG', 6, 24, 16, 1000, 19168781562),
  (8, 'rgb24', 3, 32, 8, 332, 6717079118),
  (9, 'rgb24', 4, 16, 16, 750, 8280422891),
  (10, 'rgb24', 5, 24, 8, 800, 9098864904),
  (11, 'rgb24', 6, 32, 16, 830, 7924762775),
  (12, 'avc1', 2, 16, 16, 250, 2231330748),
  (13, 'avc1', 3, 32, 16, 400, 2434106039),
  (14, 'avc1', 4, 16, 32, 498, 11774723885),
  (15, 'avc1', 2, 32, 32, 250, 2094537215),
  (16, 'avc1', 3, 16, 16, 400, 7783187973),
  (17, 'avc1', 4, 32, 16, 498, 2276320795),
  (18, 'avc1', 2, 16, 32, 250, 5220596810),
  (19, 'avc1', 3, 32, 32, 400, 7562168639),
  (20, 'avc1', 4, 16, 16, 498, 7130927190),
  (21, 'avc1', 2, 32, 16, 250, 2189176018),
  (22, 'avc1', 3, 16, 32, 400, 6488284072),
  (23, 'avc1', 4, 32, 32, 498, 9037371115),
  (24, 'avc1', 2, 16, 16, 250, 2581989316),
  (25, 'avc1', 3, 32, 16, 400, 9650955423)
) AS t(doc_id, codec, frames_decoded, width, height, dts_last_ms,
       crc_sum)
""",
)
def video_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All FIVE decodable video codec paths through the REAL
    operator chain (r6 verdict #6; H.264 added r8, CABAC r13): 24
    fixture videos — AVI rawvideo (uncompressed BI_RGB DIB, even ids
    0-7), MJPEG-in-AVI (odd ids 0-7), ``raw ``-in-MP4 (packed
    top-down RGB with real stsd + sample tables, ids 8-11),
    H.264-in-MP4 (avc1 + avcC, CAVLC intra streams from the
    from-scratch encoder, ids 12-15 filter-off, ids 16-19 with the
    8.7 in-loop deblocking filter ON), and H.264 CABAC-in-MP4 (ids
    20-23: Main-profile arithmetic-coded intra slices from
    ``operators/cabac.py``, shared-context SEI marker per access
    unit; ids 24-25, late r14: real I_PCM macroblocks under CABAC —
    the 9.3.1.2 flush / byte-align / raw-samples / engine-restart
    escape, contexts persisting across the restart) — are muxed,
    then demuxed by ``extract_video_frames``
    (which attaches the container-declared codec + geometry to every
    frame, and re-prefixes avc1 samples into self-contained Annex B)
    and decoded by ``decode_video_frame_stats`` (codec-dispatched:
    T.81 JPEG vs DIB vs packed-RGB unpack vs the H.264 intra
    decoder). The per-video SUM of decoded-pixel CRC32s pins all
    four decode paths bit-for-bit; codec comes back from the demux
    stage, proving the dispatch column survives the chain.

    Scale posture: identical to ``llm_video_frame_stats`` — one video
    payload = one row, mux/demux/decode all inside Arrow-batched
    ``mapInPandas``; the only shuffle is the final 8-group aggregate
    over (doc_id, codec) stat rows, frame payloads never move."""
    import pandas as pd

    from ..operators import multimodal as mm

    def mux(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "payload": [_mux_codec_fixture(int(v)) for v in pdf["id"]],
                }
            )

    payloads = spark.range(0, _N_CODEC_VIDEOS, 1, 4).mapInPandas(
        mux, _VIDEO_PAYLOAD_SCHEMA
    )
    frames = mm.extract_video_frames(payloads)
    stats = mm.decode_video_frame_stats(frames)
    return (
        stats.join(
            frames.select("doc_id", "sample_idx", "codec"),
            ["doc_id", "sample_idx"],
        )
        .groupBy("doc_id", "codec")
        .agg(
            F.count(F.lit(1)).alias("frames_decoded"),
            F.max("width").alias("width"),
            F.max("height").alias("height"),
            F.max("dts_ms").alias("dts_last_ms"),
            F.sum("pixel_crc32").alias("crc_sum"),
        )
        .select(
            "doc_id", "codec", "frames_decoded", "width", "height",
            "dts_last_ms", "crc_sum",
        )
    )


_N_IPP_VIDEOS = 18


def _mux_ipp_fixture(vid: int) -> bytes:
    """H.264 temporal-GOP fixture: ids 0-3 are IPP (IDR + P pictures:
    P_Skip / 16x16 / 16x8 / 8x16 / intra-in-P macroblocks, quarter-pel
    MVs; ids 2-3 with the in-loop deblocking filter ON, so P pictures
    predict from the POST-filter reference — the 8.4 requirement the
    closed loop pins); ids 4-5 are IBP (I P1 B2 P3 B4: non-reference
    B pictures bi-predicting from the two most recent references with
    the default unweighted average, B_L0/B_L1/B_Bi/intra-in-B
    macroblocks; id 5 deblocked); ids 6-7 are IPPW (P chains with TWO
    active L0 references — per-partition te(v) ref_idx — and explicit
    per-slice pred_weight_tables incl. weighted P_Skip; id 7
    deblocked), all from the from-scratch encoder's temporal modes,
    muxed as avc1-in-MP4. Ids 8-13 (r14) are the CABAC temporal
    modes from ``operators/cabac.py``: 8-10 CABAC IPP (per-MB
    mb_skip_flag — no skip runs under CABAC — UEG3 mvd with EG3
    escapes, unary ref_idx once two references are active,
    intra-in-P through the shared suffix context block) and 11-13
    CABAC IBP (B_L0/B_L1/B_Bi_16x16 bi-prediction, intra-in-B),
    gradient-plus-noise content so inter prediction finds real
    structure and the low-CBP paths are exercised. Ids 14-17 (late
    r14) carry P_8x8: 14-15 CAVLC ``gop="ipp8"`` (four quadrant MVs
    per MB, per-quadrant te(v) ref_idx under two active references,
    P_8x8ref0's suppressed-ref_idx form, 15 with the in-loop
    deblocking filter ON) and 16-17 CABAC ipp8 (the '001' mb_type
    leaf + per-quadrant sub_mb_type bins + quadrant-granular
    neighbour contexts for ref_idx/mvd)."""
    import numpy as np

    from ..operators import h264
    from ..operators import multimodal as mm

    rng = np.random.default_rng(7700 + vid)
    w = 16 * (1 + vid % 2)
    h = 16 * (1 + (vid // 2) % 2)
    if vid >= 14:  # P_8x8 GOPs (late r14): CAVLC 14-15, CABAC 16-17
        from ..operators import cabac

        n = 4 + vid % 3
        frames = [
            np.clip(
                np.add.outer(np.arange(h) * 3 + f * 9,
                             np.arange(w) * 2)[..., None]
                + rng.integers(0, 48, (h, w, 3)),
                0, 255,
            ).astype(np.uint8)
            for f in range(n)
        ]
        if vid < 16:
            stream, _ = h264.encode_h264_annexb(
                frames, qp=18 + 5 * (vid % 4),
                chroma_qp_offset=(vid % 3) - 1,
                gop="ipp8", deblock=vid == 15,
            )
        else:
            stream, _ = cabac.encode_h264_annexb_cabac(
                frames, qp=18 + 5 * (vid % 4),
                chroma_qp_offset=(vid % 3) - 1,
                gop="ipp8",
            )
        avcc, samples = h264.annexb_to_avcc(stream)
        return mm.build_mp4_avc(samples, avcc, w, h, fps=4 + vid)
    if vid >= 8:  # CABAC IPP / IBP (r14)
        from ..operators import cabac

        n = 4 + vid % 3  # >= 4 frames: the P ref list reaches depth 2
        frames = [
            np.clip(
                np.add.outer(np.arange(h) * 3 + f * 9,
                             np.arange(w) * 2)[..., None]
                + rng.integers(0, 48, (h, w, 3)),
                0, 255,
            ).astype(np.uint8)
            for f in range(n)
        ]
        stream, _ = cabac.encode_h264_annexb_cabac(
            frames, qp=18 + 5 * (vid % 4),
            chroma_qp_offset=(vid % 3) - 1,
            gop="ipp" if vid < 11 else "ibp",
        )
        avcc, samples = h264.annexb_to_avcc(stream)
        return mm.build_mp4_avc(samples, avcc, w, h, fps=4 + vid)
    n = 3 + vid % 3
    frames = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)
    ]
    gop = "ipp" if vid < 4 else ("ibp" if vid < 6 else "ippw")
    stream, _ = h264.encode_h264_annexb(
        frames, qp=20 + 4 * (vid % 4), chroma_qp_offset=(vid % 3) - 1,
        deblock=vid in (2, 3, 5, 7), gop=gop,
    )
    avcc, samples = h264.annexb_to_avcc(stream)
    return mm.build_mp4_avc(samples, avcc, w, h, fps=4 + vid)


@query(
    "llm_video_ipp_stats",
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(16 AS BIGINT),
   CAST(16 AS BIGINT), CAST(500 AS BIGINT), CAST(8335319835 AS BIGINT)),
  (1, 4, 32, 16, 600, 10672207217),
  (2, 5, 16, 32, 664, 10054453907),
  (3, 3, 32, 32, 284, 7140597168),
  (4, 4, 16, 16, 375, 8406193680),
  (5, 5, 32, 16, 444, 15211029894),
  (6, 3, 16, 32, 200, 9062735757),
  (7, 4, 32, 32, 270, 8581016192),
  (8, 6, 16, 16, 415, 10072939317),
  (9, 4, 32, 16, 228, 7693237634),
  (10, 5, 16, 32, 284, 10150104067),
  (11, 6, 32, 32, 330, 8008705006),
  (12, 4, 16, 16, 186, 12139947276),
  (13, 5, 32, 16, 232, 15531645836),
  (14, 6, 16, 32, 275, 11986862349),
  (15, 4, 32, 32, 156, 12749088506),
  (16, 5, 16, 16, 200, 13218014441),
  (17, 6, 32, 16, 235, 10831775421)
) AS t(doc_id, frames_decoded, width, height, dts_last_ms, crc_sum)
""",
)
def video_ipp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL (inter-predicted) H.264 under the driver CRC gate: 18
    fixture videos — ids 0-3 IPP GOPs (IDR + P pictures with P_Skip/
    16x16/16x8/8x16/intra-in-P macroblocks and quarter-pel motion
    sweeping all 16 fractional positions), ids 4-5 IBP GOPs
    (non-reference B pictures bi-predicting from the two most recent
    references with the default unweighted average; B_L0/B_L1/B_Bi/
    intra-in-B macroblocks), ids 6-7 IPPW chains (TWO active L0
    references with per-partition te(v) ref_idx + explicit per-slice
    pred_weight_tables, 8.4.2.3.3 weighted samples incl. weighted
    P_Skip), and — r14 — ids 8-10 CABAC IPP / ids 11-13 CABAC IBP
    (``operators/cabac.py``: per-MB mb_skip_flag, P/B mb_type trees,
    unary ref_idx under two active references, UEG3 mvd with EG3
    escapes, intra-in-P/B through the shared suffix context block,
    inter coded_block_flag availability rule — the arithmetic-coded
    temporal modes over the same MC/reconstruction machinery), and —
    late r14 — ids 14-17 P_8x8 GOPs (sub_mb_type syntax, four
    quadrant MVs per MB with the generic median predictor,
    per-quadrant ref_idx under two active references; 14-15 CAVLC
    incl. P_8x8ref0 and one deblocked stream, 16-17 CABAC with the
    '001' mb_type leaf + per-quadrant sub_mb_type bins; 8x4/4x8/4x4
    sub-shapes reject cleanly in both entropy layers) — are
    muxed as avc1-in-MP4, converted to one Annex B
    stream per video (``mp4_avc_full_annexb``) and decoded through
    the reference chain by ``decode_video_gop_stats``: each P/B
    picture motion-compensates from decoded reference pictures
    (post-deblock on ids 2-3, 5 and 7; non-ref B frames never enter
    the DPB, so P3 predicts from P1 across the intervening B2).
    ``frames_decoded`` pins that every P and B frame actually decodes
    (the per-sample path would drop them), and ``crc_sum`` pins the
    motion-compensated pixels bit-for-bit — quarter-pel 6-tap
    interpolation, median MV prediction, skip-MV rules, bi-prediction
    averaging, weighted prediction, multi-ref selection, inter CBP,
    and the 2/1/0 inter deblocking tiers all under one hash.

    Scale posture: decode is sequential WITHIN a GOP by data
    dependency, so the parallel unit is the video — one Arrow-batched
    ``mapInPandas`` row per clip, payloads never shuffle; the only
    shuffle is the 4-group stat aggregate."""
    import pandas as pd

    from ..operators import multimodal as mm

    def mux(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "payload": [_mux_ipp_fixture(int(v)) for v in pdf["id"]],
                }
            )

    payloads = spark.range(0, _N_IPP_VIDEOS, 1, 2).mapInPandas(
        mux, _VIDEO_PAYLOAD_SCHEMA
    )
    stats = mm.decode_video_gop_stats(payloads)
    return (
        stats.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("frames_decoded"),
            F.max("width").alias("width"),
            F.max("height").alias("height"),
            F.max("dts_ms").alias("dts_last_ms"),
            F.sum("pixel_crc32").alias("crc_sum"),
        )
        .select(
            "doc_id", "frames_decoded", "width", "height",
            "dts_last_ms", "crc_sum",
        )
    )


# ---------------------------------------------------------------------
# Visual (content-level) video near-dup detection — the capability
# operators/multimodal.py:video_fingerprint's docstring deferred
# "behind the codec gate": with the H.264 intra decoder landed, frames
# decode for real and per-frame perceptual hashes drive dedup.

_N_VISUAL_VIDEOS = 8


def _visual_fixture_frames(cs: int) -> list:
    """Structured content (gradients + a moving bright block) seeded
    by content id — phash-stable under lossy re-encode, unlike
    noise."""
    import numpy as np

    ys, xs = np.mgrid[0:32, 0:48]
    frames = []
    for t in range(3):
        base = (xs * (2 + cs) + ys * (3 + (cs * 5) % 7) + t * 9) % 160 + 40
        img = np.stack(
            [base, (base * 2) % 200, 255 - base], axis=-1
        ).astype(np.uint8)
        bx = (cs * 7 + t * 11) % 32
        img[8:20, bx : bx + 12] = (240, (240 - cs * 20) % 200, 30)
        frames.append(img)
    return frames


def _visual_dedup_payload(vid: int) -> bytes:
    """vids 0-5: three near-dup pairs — same content, pair members
    H.264-encoded at QP 20 vs QP 34 (one with deblocking) so pixels
    differ but structure survives; vids 6-7: unique content."""
    from ..operators import h264
    from ..operators import multimodal as mm

    cs = vid // 2 if vid < 6 else vid
    frames = _visual_fixture_frames(cs)
    stream, _ = h264.encode_h264_annexb(
        frames, qp=20 + (vid % 2) * 14, deblock=vid % 2 == 1
    )
    avcc, samples = h264.annexb_to_avcc(stream)
    return mm.build_mp4_avc(samples, avcc, 48, 32, fps=5)


_VISUAL_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("phash", T.LongType()),
    ]
)


def video_frame_phashes(spark: SparkSession) -> DataFrame:
    """(doc_id, sample_idx, phash) for the visual-dedup fixture corpus
    through the REAL chain: mux -> demux -> H.264 intra decode ->
    ``phash_pixels`` — all inside Arrow ``mapInPandas``; only the
    8-byte hashes ever shuffle, frame payloads stay in the task."""
    import pandas as pd

    from ..operators import multimodal as mm
    from ..operators.h264 import decode_h264_annexb

    def mux(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "payload": [
                        _visual_dedup_payload(int(v)) for v in pdf["id"]
                    ],
                }
            )

    payloads = spark.range(0, _N_VISUAL_VIDEOS, 1, 4).mapInPandas(
        mux, _VIDEO_PAYLOAD_SCHEMA
    )
    frames = mm.extract_video_frames(payloads)

    def op(batches):
        for pdf in batches:
            rows = []
            for i, si, fb in zip(
                pdf["doc_id"], pdf["sample_idx"], pdf["frame_bytes"]
            ):
                pics = decode_h264_annexb(bytes(fb))
                if not pics:
                    continue
                rows.append(
                    {
                        "doc_id": i,
                        "sample_idx": si,
                        "phash": mm.phash_pixels(pics[0]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_idx", "phash"]
            )

    return frames.select("doc_id", "sample_idx", "frame_bytes").mapInPandas(
        op, _VISUAL_PHASH_SCHEMA
    )


@query(
    "llm_video_visual_dedup",
    """
WITH ph(doc_id, sample_idx, phash) AS (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS INTEGER), CAST(2723212641831233423 AS BIGINT)),
  (0, 1, 3956767091357787562),
  (0, 2, 1041114999249689701),
  (1, 0, 2723212641831233423),
  (1, 1, 3911731099379082666),
  (1, 2, 5509811729508043879),
  (2, 0, 9133445114537150863),
  (2, 1, 7335119877204780394),
  (2, 2, 7432233731111859148),
  (3, 0, 9133449512587723151),
  (3, 1, 7335119877204776298),
  (3, 2, 7432233731111859148),
  (4, 0, 7140735275866531699),
  (4, 1, 7877273663950957898),
  (4, 2, 3948699640088585932),
  (5, 0, 7141861175505004387),
  (5, 1, 7588766210885725514),
  (5, 2, 8416270470440117964),
  (6, 0, 1121394375018951540),
  (6, 1, 7770448009674173226),
  (6, 2, 8472340282162976297),
  (7, 0, 279179249602278908),
  (7, 1, 3140818576098824745),
  (7, 2, 1289890081038149019)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(bit_count(xor(a.phash, b.phash))) AS BIGINT)
         AS hamming_sum,
       CAST(SUM(bit_count(xor(a.phash, b.phash))) <= 8 * COUNT(*)
         AS BOOLEAN) AS is_dup
FROM ph a JOIN ph b
  ON a.sample_idx = b.sample_idx AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
""",
)
def video_visual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-level video near-duplicate detection — the capability
    ``video_fingerprint`` (container-level) explicitly deferred until
    frame decode was real: 8 H.264-in-MP4 fixture videos (three
    near-dup pairs re-encoded at QP 20 vs 34, one side deblocked, so
    pixel bytes differ; two unique) run mux -> demux -> intra decode
    -> per-frame 64-bit pHash (``multimodal.phash_pixels``), then an
    aligned-frame self-join scores pairs by summed Hamming distance:
    mean <= 8 bits/frame -> duplicate. Flags exactly the three
    planted pairs; the closest non-pair sits at 82/192 bits.

    The oracle pins the DECODED phashes as literal VALUES (codec work
    is not SQL-expressible) and replicates the pair scoring in
    cross-engine SQL (bit_count + xor exist in both) — so a drift in
    ANY stage (encoder fixtures, demux, CAVLC/transform/deblock
    decode, DCT phash, or the join math) flips the row hash.

    Scale posture: one video = one row through Arrow ``mapInPandas``;
    only 8-byte hashes shuffle. The all-pairs join is the fixture-
    sized verifier — at corpus scale the same hashes feed the
    banded SimHash/LSH bucketing machinery (``operators/dedup.py``),
    which llm_dedup_simhash already proves out."""
    ph = video_frame_phashes(spark)
    a = ph.alias("a")
    b = ph.alias("b")
    ham = F.expr("bit_count(a.phash ^ b.phash)")
    return (
        a.join(
            b,
            (F.col("a.sample_idx") == F.col("b.sample_idx"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(ham).alias("hamming_sum"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_frames",
            "hamming_sum",
            (F.col("hamming_sum") <= 8 * F.col("n_frames")).alias("is_dup"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------
# IMAGE-corpus visual near-dup — the still-image counterpart of
# llm_video_visual_dedup (r8 verdict #6: "the video pHash machinery
# generalizes directly"): one perceptual hash per image payload
# across MIXED container formats, banded-LSH candidate generation,
# Hamming verification. This is the real multimodal-corpus shape —
# the same photo stored as JPEG, PNG, TIFF, QOI... at different
# qualities and sizes must dedup by CONTENT, which byte/CRC dedup
# can never see.

_N_DEDUP_IMAGES = 10
_IMG_PHASH_BANDS = 4  # 16-bit bands over the 64-bit pHash
_IMG_DUP_BITS = 8  # pairs within 8/64 bits are duplicates


def _image_content(cs: int):
    """Structured 64x48 RGB content (gradients + a bright block)
    seeded by content id — pHash-stable under lossy re-encode."""
    import numpy as np

    ys, xs = np.mgrid[0:48, 0:64]
    base = (xs * (2 + cs) + ys * (3 + (cs * 5) % 7)) % 160 + 40
    img = np.stack(
        [base, (base * 2) % 200, 255 - base], axis=-1
    ).astype(np.uint8)
    bx = (cs * 7) % 40
    by = (cs * 3) % 30
    img[by : by + 14, bx : bx + 16] = (240, (240 - cs * 20) % 200, 30)
    return img


def _image_dedup_payload(img_id: int) -> bytes:
    """Mixed-format fixture corpus with four planted content pairs:
    (0,1) same content as JPEG q90 vs noisy JPEG q12 4:2:0 (harsh
    lossy re-encode); (2,3) pixel-identical PNG vs QOI (byte-level
    dedup can't pair them, content dedup must); (4,5) TIFF vs a
    JPEG q80 of the 1.5x-upscaled content (re-encode + resize);
    (6,7) JPEG-LS vs a PNG brightened +6 with ±14 deterministic
    noise; 8/9 unique content (PNG, JPEG). Measured pHash Hamming:
    pairs 4/0/4/2 bits, nearest non-pair >= 22.

    Ids >= 10 extend the corpus for the SCALE probe
    (``scripts/probe_image_dedup.py``): each consecutive (even, odd)
    id pair plants one PNG-original/noisy-QOI-re-encode near-dup.
    Note the content formula itself repeats (base pattern period ~160
    in cs), so large probe corpora ALSO carry unplanned identical-
    content clusters whose pair count grows super-linearly — the
    harder collision load BASELINE.md's probe entry records the band
    join absorbing. The registered 10-image row and its pinned oracle
    are untouched."""
    import numpy as np

    from ..operators import multimodal as mm
    from ..operators.jpeg import encode_jpeg
    from ..operators.jpegls import encode_jpegls
    from ..operators.qoi import encode_qoi

    def noisy(img, seed, amp):
        rng = np.random.default_rng(900 + seed)
        n = rng.integers(-amp, amp + 1, img.shape)
        return np.clip(img.astype(np.int16) + n, 0, 255).astype(np.uint8)

    def upscale(img, num=3, den=2):
        h, w = img.shape[:2]
        hh, ww = h * num // den, w * num // den
        return img[(np.arange(hh) * den) // num][
            :, (np.arange(ww) * den) // num
        ]

    if img_id == 0:
        return encode_jpeg(_image_content(0), quality=90)
    if img_id == 1:
        return encode_jpeg(
            noisy(_image_content(0), 0, 10), quality=12, subsample=True
        )
    if img_id == 2:
        return mm.encode_png(_image_content(1))
    if img_id == 3:
        return encode_qoi(_image_content(1))
    if img_id == 4:
        return mm.encode_tiff(_image_content(2))
    if img_id == 5:
        return encode_jpeg(upscale(_image_content(2)), quality=80)
    if img_id == 6:
        return encode_jpegls(_image_content(3))
    if img_id == 7:
        import numpy as np

        bright = np.clip(
            _image_content(3).astype(np.int16) + 6, 0, 255
        ).astype(np.uint8)
        return mm.encode_png(noisy(bright, 3, 14))
    if img_id == 8:
        return mm.encode_png(_image_content(4))
    if img_id == 9:
        return encode_jpeg(_image_content(5), quality=85)
    # scale-probe extension: fresh content per (even, odd) pair
    cs = 10 + (img_id - 10) // 2
    if img_id % 2 == 0:
        return mm.encode_png(_image_content(cs))
    return encode_qoi(noisy(_image_content(cs), img_id, 3))


_IMAGE_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def image_phashes(
    spark: SparkSession, n_images: int = _N_DEDUP_IMAGES
) -> DataFrame:
    """(doc_id, phash) for the image-dedup fixture corpus: payloads
    are built AND hashed inside one Arrow ``mapInPandas`` pass
    (encode -> format-sniffing decode -> 32x32 box downsample -> DCT
    -> median threshold, ``multimodal.perceptual_hash``) — only the
    8-byte hashes ever leave the task."""
    import pandas as pd

    from ..operators import multimodal as mm

    def op(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                h = mm.perceptual_hash(_image_dedup_payload(int(i)))
                if h is None:
                    continue
                # store as signed int64 (Spark LongType)
                rows.append(
                    {"doc_id": int(i), "phash": h - (h >> 63 << 64)}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return spark.range(
        0, n_images, 1, max(4, n_images // 64)
    ).mapInPandas(op, _IMAGE_PHASH_SCHEMA)


# Pinned per-payload pHashes for the mixed-format fixture corpus —
# ONE definition shared by the llm_image_visual_dedup oracle (whose
# live-operator guard in tests/test_oracle_parity.py keeps these pins
# honest) and the cross-modal dedup oracle.
_PHASH_VALUES_SQL = """ph(doc_id, phash) AS (VALUES
  (CAST(0 AS BIGINT), CAST(227258910004145624 AS BIGINT)),
  (1, 1380180406021057946),
  (2, 4404166120930691378),
  (3, 4404166120930691378),
  (4, 4051215321835795460),
  (5, 4051215326097208321),
  (6, 5588174915674606114),
  (7, 5588174915641051810),
  (8, 1989859192593037408),
  (9, 1406077611615757052)
)"""

# Banded-LSH candidate generation + Hamming verify over the pinned
# pHashes — shared CTE tail (band count/width/threshold interpolated
# from the module constants, r9 ADVICE).
_PHASH_BANDS_CTES = f"""bands AS (
  SELECT doc_id, i AS band_idx,
         (phash >> CAST({64 // _IMG_PHASH_BANDS} * i AS INTEGER))
           & {(1 << (64 // _IMG_PHASH_BANDS)) - 1} AS band_val
  FROM ph, range({_IMG_PHASH_BANDS}) t(i)),
vcand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)"""


@query(
    "llm_image_visual_dedup",
    f"""
WITH {_PHASH_VALUES_SQL},
{_PHASH_BANDS_CTES}
SELECT c.doc_a, c.doc_b, c.n_shared_bands,
       CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming,
       CAST(bit_count(xor(pa.phash, pb.phash)) <= {_IMG_DUP_BITS}
            AS BOOLEAN) AS is_dup
FROM vcand c JOIN ph pa ON pa.doc_id = c.doc_a
             JOIN ph pb ON pb.doc_id = c.doc_b
ORDER BY doc_a, doc_b
""",
)
def image_visual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-level near-dup detection over a MIXED-FORMAT image
    corpus — the still-image capability the r8 verdict asked for:
    each payload (JPEG at two qualities, PNG, QOI, TIFF, JPEG-LS,
    resized re-encodes) is decoded by the format-sniffing
    ``perceptual_hash`` into one 64-bit pHash, candidates come from
    BANDED LSH (four 16-bit bands — pairs sharing any exact band),
    and candidates verify by full Hamming distance: <= 8/64 bits ->
    duplicate. Flags exactly the four planted content pairs — incl.
    the pixel-identical PNG/QOI pair byte-level dedup can never see
    — at Hamming 4/0/4/2; the fixture's nearest non-pair is >= 22
    bits and shares no band.

    The oracle pins the DECODED hashes as literal VALUES (codec work
    is not SQL-expressible) and replicates banding + verification in
    cross-engine SQL, so a drift in any decoder (JPEG/PNG/QOI/TIFF/
    JPEG-LS), the DCT hash, or the LSH banding flips the row hash.

    Scale posture: this is the SCALE path itself, not a fixture-only
    verifier — hashing is one Arrow ``mapInPandas`` pass (payloads
    never shuffle; 8 bytes per image leave the task), the band
    explode is a fixed 4x fan-out, candidate generation is an
    equi-join on (band_idx, band_val) — bucketed, never all-pairs —
    and Hamming verification touches candidates only. The same
    banding bound as SimHash dedup applies: a 100 TB corpus adds a
    per-band hot-bucket cap (operators/dedup.py pattern) to bound
    collision blowup."""
    ph = tracked_persist(image_phashes(spark))
    cand = _phash_candidates(ph)
    return cand.select(
        "doc_a",
        "doc_b",
        "n_shared_bands",
        "hamming",
        (F.col("hamming") <= _IMG_DUP_BITS).alias("is_dup"),
    ).orderBy("doc_a", "doc_b")


def _phash_candidates(ph: DataFrame) -> DataFrame:
    """Banded-LSH candidates + Hamming verify over a (doc_id, phash)
    frame -> (doc_a, doc_b, n_shared_bands, hamming). Shared by the
    visual-dedup and cross-modal rows (mirrors _PHASH_BANDS_CTES)."""
    bands = ph.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("phash"), (64 // _IMG_PHASH_BANDS) * i)
                    .bitwiseAND(F.lit((1 << (64 // _IMG_PHASH_BANDS)) - 1))
                    .alias(f"b{i}")
                    for i in range(_IMG_PHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    pa = ph.select(
        F.col("doc_id").alias("doc_a"), F.col("phash").alias("ha")
    )
    pb = ph.select(
        F.col("doc_id").alias("doc_b"), F.col("phash").alias("hb")
    )
    ham = F.expr("bit_count(ha ^ hb)")
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_shared_bands",
            ham.cast("long").alias("hamming"),
        )
    )


def _crossmodal_pair_ctes(
    num_hashes: int = 16, rows_per_band: int = 2
) -> str:
    """The cross-modal pair-relation CTE prelude shared by
    ``llm_crossmodal_dedup`` and ``llm_crossmodal_components``: TEXT
    pipeline (MinHash-LSH + exact-Jaccard verify over the whole
    documents corpus) full-outer joined with the VISUAL pipeline
    (pinned pHashes -> banded LSH -> Hamming <= dup threshold) into
    ``up`` — one row per flagged pair with evidence + modality. The
    pHash pins are the SAME ``_PHASH_VALUES_SQL`` block the guarded
    visual-dedup oracle uses, so they cannot drift independently.
    ``up`` is MATERIALIZED: the components oracle references it from
    inside a WITH RECURSIVE block, where an inlined CTE would be
    re-evaluated per reference."""
    from .llm_queries import _SIZES_CTE, _mh_banded_cte

    return f"""
{_mh_banded_cte(num_hashes, rows_per_band)}
{_SIZES_CTE}
tcands AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
tinter AS (
  SELECT c.i, c.j, COUNT(*) AS inter
  FROM tcands c
  JOIN shing si ON si.doc_id = c.i
  JOIN shing sj ON sj.doc_id = c.j AND sj.shingle = si.shingle
  GROUP BY c.i, c.j),
tp AS (
  SELECT i AS doc_a, j AS doc_b,
         inter * 1.0 / (sa.n + sb.n - inter) AS text_jaccard
  FROM tinter
  JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
{_PHASH_VALUES_SQL},
{_PHASH_BANDS_CTES},
vp AS (
  SELECT c.doc_a, c.doc_b,
         CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming
  FROM vcand c JOIN ph pa ON pa.doc_id = c.doc_a
               JOIN ph pb ON pb.doc_id = c.doc_b
  WHERE bit_count(xor(pa.phash, pb.phash)) <= {_IMG_DUP_BITS}),
up AS MATERIALIZED (
  SELECT COALESCE(t.doc_a, v.doc_a) AS doc_a,
         COALESCE(t.doc_b, v.doc_b) AS doc_b,
         t.text_jaccard,
         v.hamming AS visual_hamming,
         CASE WHEN t.doc_a IS NOT NULL AND v.doc_a IS NOT NULL THEN 'both'
              WHEN t.doc_a IS NOT NULL THEN 'text'
              ELSE 'visual' END AS modality
  FROM tp t FULL OUTER JOIN vp v
    ON v.doc_a = t.doc_a AND v.doc_b = t.doc_b)"""


def _crossmodal_oracle(num_hashes: int = 16, rows_per_band: int = 2) -> str:
    return f"""
{_crossmodal_pair_ctes(num_hashes, rows_per_band)}
SELECT doc_a, doc_b, text_jaccard, visual_hamming, modality
FROM up
ORDER BY doc_a, doc_b
"""


@query("llm_crossmodal_dedup", _crossmodal_oracle())
def crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL near-dup join (r9 verdict #6): a multimodal corpus
    dedups on the UNION of modality-specific near-dup relations —
    text MinHash-LSH pairs (whole documents corpus, exact-Jaccard
    >= 0.8) merged with image pHash pairs (decoded mixed-format
    payloads, banded LSH + Hamming <= 8 bits, _IMG_DUP_BITS) — because a
    re-encoded image with rewritten alt-text evades text dedup, and
    boilerplate pages around distinct images evade visual dedup.
    Output is one row per flagged pair with both evidence columns
    (text_jaccard, visual_hamming — NULL where that modality did not
    fire) and a modality verdict ('text' / 'visual' / 'both').

    Modeling contract (r10 ADVICE #3): the two relations share ONE
    document-id namespace — image fixture id i is the image ATTACHED
    to document doc_id=i (image_id == doc_id), the multimodal-row
    shape where each doc carries its media payload. A 'both' verdict
    is therefore evidence that the same document pair matches on text
    AND on its attached images; a corpus whose image ids are not
    document-attached must namespace them before this union.

    Scale posture: each modality runs its own bucketed candidate
    generation (banded MinHash; banded pHash) — the cross-modal step
    is ONE outer join on the pair key, sized by flagged pairs, never
    by the corpus. At 100 TB the pair frames are the two pipelines'
    existing outputs; the merge adds no new quadratic term.
    """
    return _crossmodal_pair_frame(spark, sf_dir).orderBy(
        "doc_a", "doc_b"
    )


def _crossmodal_pair_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNION near-dup pair relation both cross-modal rows read:
    text MinHash pairs full-outer joined with image pHash pairs on
    the pair key, one row per flagged pair with evidence columns and
    the modality verdict — the Spark twin of
    :func:`_crossmodal_pair_ctes`'s ``up`` CTE."""
    from ..catalog import Catalog
    from ..operators import dedup as dd

    docs = Catalog(spark, sf_dir).documents
    tpairs = dd.minhash_near_duplicates(
        docs, threshold=0.8, num_hashes=16, bands=8, shingle_n=3
    ).select(
        F.col("i").alias("doc_a"),
        F.col("j").alias("doc_b"),
        F.col("jaccard").alias("text_jaccard"),
    )
    ph = tracked_persist(image_phashes(spark))
    vpairs = (
        _phash_candidates(ph)
        .where(F.col("hamming") <= _IMG_DUP_BITS)
        .select("doc_a", "doc_b", F.col("hamming").alias("visual_hamming"))
    )
    return tpairs.join(vpairs, ["doc_a", "doc_b"], "full_outer").select(
        "doc_a",
        "doc_b",
        "text_jaccard",
        "visual_hamming",
        F.when(
            F.col("text_jaccard").isNotNull()
            & F.col("visual_hamming").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("text_jaccard").isNotNull(), F.lit("text"))
        .otherwise(F.lit("visual"))
        .alias("modality"),
    )


_CROSSMODAL_COMPONENTS_ORACLE = f"""
{_crossmodal_pair_ctes().replace("WITH ", "WITH RECURSIVE ", 1)},
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM up
  UNION SELECT doc_b AS src, doc_a AS dst FROM up),
reach AS (
  SELECT src AS node, dst AS target FROM edges
  UNION
  SELECT r.node, e.dst AS target
  FROM reach r JOIN edges e ON e.src = r.target),
labels AS MATERIALIZED (
  SELECT node AS member, LEAST(node, MIN(target)) AS cluster_id
  FROM reach GROUP BY node),
members AS (
  SELECT cluster_id, COUNT(*) AS n_members
  FROM labels GROUP BY cluster_id),
epc AS MATERIALIZED (
  SELECT l.cluster_id,
         SUM(CASE WHEN u.modality = 'text' THEN 1 ELSE 0 END) AS n_t,
         SUM(CASE WHEN u.modality = 'visual' THEN 1 ELSE 0 END) AS n_v,
         SUM(CASE WHEN u.modality = 'both' THEN 1 ELSE 0 END) AS n_b
  FROM up u JOIN labels l ON l.member = u.doc_a
  GROUP BY l.cluster_id)
SELECT m.cluster_id,
       CAST(m.n_members AS BIGINT) AS n_members,
       CAST(m.n_members - 1 AS BIGINT) AS n_dropped,
       CAST(COALESCE(e.n_t, 0) AS BIGINT) AS n_text_pairs,
       CAST(COALESCE(e.n_v, 0) AS BIGINT) AS n_visual_pairs,
       CAST(COALESCE(e.n_b, 0) AS BIGINT) AS n_both_pairs
FROM members m LEFT JOIN epc e ON e.cluster_id = m.cluster_id
ORDER BY m.cluster_id
"""


@query("llm_crossmodal_components", _CROSSMODAL_COMPONENTS_ORACLE)
def crossmodal_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal CONNECTED COMPONENTS + keeper pick (r10 verdict
    #3): a real multimodal dedup cannot stop at the pair relation —
    a text match A~B and a visual match B~C must collapse {A,B,C}
    into ONE cluster even though A and C never matched directly. This
    row takes connected components over the UNION pair relation
    ``llm_crossmodal_dedup`` emits (same
    :func:`_crossmodal_pair_frame`, same image_id == doc_id
    attachment contract) via the identical log-bounded
    label-propagation ``duplicate_clusters`` pass that
    ``compact_dedup_index`` uses for text-only pairs, picks the
    min-id keeper per cluster, and reports per cluster: member count,
    drops, and the modality mix of the evidence edges (how much of
    the cluster is held together by text vs visual vs both).

    Scale posture: components run over the FLAGGED-PAIR graph (sized
    by near-dup density, never the corpus), label propagation
    converges in O(log diameter) checkpointed rounds, and the
    per-cluster summaries are one groupBy over the pair frame — the
    same cluster-bounded shape as the text-only compaction row. The
    oracle unrolls the closure with a recursive reachability CTE over
    MATERIALIZED pair CTEs (the subset-filter/anti-join discipline
    the lifecycle oracle established)."""
    pairs = tracked_persist(_crossmodal_pair_frame(spark, sf_dir))
    return crossmodal_cluster_summary(pairs)


def crossmodal_cluster_summary(pairs: DataFrame) -> DataFrame:
    """Connected components + per-cluster modality-mix summary over a
    (doc_a, doc_b, ..., modality) pair frame — split out so tests can
    prove the cross-modal MERGE (a text edge and a visual edge
    collapsing into one cluster) on a synthetic frame; the fixture
    corpus's visual pairs happen never to share a cluster with a text
    pair."""
    from ..operators import dedup as dd

    clusters = dd.duplicate_clusters(
        pairs.select(
            F.col("doc_a").alias("i"), F.col("doc_b").alias("j")
        )
    )
    members = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    epc = (
        pairs.join(
            clusters.withColumnRenamed("member", "doc_a"), "doc_a"
        )
        .groupBy("cluster_id")
        .agg(
            F.sum(
                F.when(F.col("modality") == "text", 1).otherwise(0)
            ).cast("long").alias("n_text_pairs"),
            F.sum(
                F.when(F.col("modality") == "visual", 1).otherwise(0)
            ).cast("long").alias("n_visual_pairs"),
            F.sum(
                F.when(F.col("modality") == "both", 1).otherwise(0)
            ).cast("long").alias("n_both_pairs"),
        )
    )
    return (
        members.join(epc, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
            F.coalesce(F.col("n_text_pairs"), F.lit(0))
            .cast("long")
            .alias("n_text_pairs"),
            F.coalesce(F.col("n_visual_pairs"), F.lit(0))
            .cast("long")
            .alias("n_visual_pairs"),
            F.coalesce(F.col("n_both_pairs"), F.lit(0))
            .cast("long")
            .alias("n_both_pairs"),
        )
        .orderBy("cluster_id")
    )


_CROSSMODAL_APPLY_ORACLE = f"""
{_crossmodal_pair_ctes().replace("WITH ", "WITH RECURSIVE ", 1)},
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM up
  UNION SELECT doc_b AS src, doc_a AS dst FROM up),
reach AS (
  SELECT src AS node, dst AS target FROM edges
  UNION
  SELECT r.node, e.dst AS target
  FROM reach r JOIN edges e ON e.src = r.target),
losers AS MATERIALIZED (
  SELECT node FROM reach GROUP BY node
  HAVING LEAST(node, MIN(target)) <> node)
SELECT d.doc_id, d.lang, d.source
FROM documents d LEFT JOIN losers l ON l.node = d.doc_id
WHERE l.node IS NULL
"""


@query("llm_crossmodal_apply", _CROSSMODAL_APPLY_ORACLE)
def crossmodal_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the MULTIMODAL-deduped corpus — the apply step on
    top of ``llm_crossmodal_components``: every non-keeper member of
    a cross-modal near-dup cluster (text evidence, visual evidence,
    or a transitive mix) is dropped; survivors keep their metadata.
    This is ``llm_dedup_apply``'s shape with the UNION pair relation,
    completing the cross-modal story end-to-end: pairs -> components
    -> cleaned corpus. Same image_id == doc_id attachment contract as
    the other cross-modal rows.

    Scale posture: the loser set is cluster-bounded (components over
    the flagged-pair graph), the final step is one anti-join on
    doc_id; no broadcast hint — at web scale the duplicate set is
    corpus-proportional, and AQE still picks broadcast-hash when the
    loser set is genuinely small (the ``llm_dedup_apply``
    precedent)."""
    from ..catalog import Catalog
    from ..operators import dedup as dd

    docs = Catalog(spark, sf_dir).documents
    pairs = tracked_persist(_crossmodal_pair_frame(spark, sf_dir))
    clusters = dd.duplicate_clusters(
        pairs.select(
            F.col("doc_a").alias("i"), F.col("doc_b").alias("j")
        )
    )
    losers = clusters.where(
        F.col("member") != F.col("cluster_id")
    ).select(F.col("member").alias("doc_id"))
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )
