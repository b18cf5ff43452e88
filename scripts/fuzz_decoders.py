"""Decoder robustness soak: every payload decoder must reject
arbitrary bytes, magic-prefixed garbage, truncations of valid files,
and bit-flipped valid files WITHOUT raising. The pytest property
(tests/test_properties.py::test_decoders_never_raise_on_garbage) runs
a fast version; this script is the deep soak (found the JPEG corrupt-
DHT overflow, the undefined-Huffman-table crash, and three zipfile
internal-error leaks in r5).

    python scripts/fuzz_decoders.py [trials=600] [seed=0]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from lms_erp_data_integration_spark.operators import multimodal as mm  # noqa: E402
from lms_erp_data_integration_spark.operators.gif import (  # noqa: E402
    decode_gif,
    gif_frame_count,
)
from lms_erp_data_integration_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    decode_jpeg12,
    decode_jpeg_lossless16,
    decode_jpeg_oriented,
    encode_jpeg,
    encode_jpeg12,
    encode_jpeg_arith,
    encode_jpeg_arith_progressive,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)
from lms_erp_data_integration_spark.operators import avi  # noqa: E402
from lms_erp_data_integration_spark.operators import flac  # noqa: E402
from lms_erp_data_integration_spark.operators import h264  # noqa: E402
from lms_erp_data_integration_spark.operators.jpegls import (  # noqa: E402
    decode_jpegls,
    encode_jpegls,
)
from lms_erp_data_integration_spark.operators.qoi import (  # noqa: E402
    decode_qoi,
    encode_qoi,
)
from lms_erp_data_integration_spark.sources.warc import (  # noqa: E402
    iter_warc_records,
    iter_warc_stream,
)

PROBES = [
    mm.decode_image, mm._decode_pixels, mm.decode_wav,
    mm.wav_spectral_features, mm.probe_mp4, mm.mp4_sample_table,
    mm._decode_tiff_pixels, mm._decode_tga_pixels, mm._decode_ico_pixels,
    decode_gif, gif_frame_count, decode_jpeg, decode_jpeg_oriented,
    decode_jpeg_lossless16, decode_jpeg12, decode_qoi, decode_jpegls,
    mm.perceptual_hash, mm.audio_fingerprint, mm.video_fingerprint,
    mm.extract_pdf_text, mm.extract_docx_text, mm.extract_epub_html,
    lambda p: list(mm.iter_tar_members(p)),
    lambda p: list(iter_warc_records(p)),
    lambda p: list(iter_warc_stream(__import__("io").BytesIO(p))),
    avi.avi_meta,
    lambda p: list(avi.iter_avi_frames(p)),
    lambda p: avi.decode_dib_frame(p, 13, 5),
    lambda p: avi.decode_dib_frame(p, len(p) % 37, len(p) % 11),
    mm.mp4_video_config,
    lambda p: mm.decode_mp4_raw_frame(p, 13, 5),
    flac.decode_flac,
    lambda p: mm._ima_adpcm_decode(p, 1, 128),
    lambda p: mm._ima_adpcm_decode(p, 2, 16),
    h264.decode_h264_annexb,
    h264.avcc_config,
    lambda p: h264.avcc_to_annexb(p, p),
    lambda p: h264.annexb_to_avcc(p) if p[:4] == b"\x00\x00\x00\x01" else None,
]

MAGICS = [
    b"fLaC", b"qoif", b"\x00\x00\x00\x01\x67", b"\x00\x00\x00\x01\x65",
    b"\x01\x42\x00\x14\xff\xe1",  # avcC record prefix
    b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"RIFF", b"II*\x00",
    b"MM\x00*", b"P6\n", b"BM", b"WARC/1.0\r\n", b"%PDF-1.4",
    b"PK\x03\x04", b"\x00\x00\x01\x00", b"\x00\x00\x02\x00",
    b"\x1f\x8b\x08\x00",  # gzip magic — corrupt .warc.gz members
]


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    # default: cycle three seeds (trials/3 each) — the r7 soak found a
    # PNG-filter crash only on seed 1, so one seed's corpus is not
    # enough; an explicit second arg pins a single seed for repro
    if len(sys.argv) > 2:
        return _soak(trials, int(sys.argv[2]))
    for seed in (0, 1, 2):
        rc = _soak(max(trials // 3, 1), seed)
        if rc:
            return rc
    return 0


def _soak(trials: int, seed: int) -> int:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    valids = [
        encode_jpeg(img), encode_jpeg_progressive(img),
        encode_jpeg_arith(img), encode_jpeg_arith(img, restart_interval=2),
        encode_jpeg_arith_progressive(img),
        encode_jpeg12(
            rng.integers(0, 4096, (9, 7, 3), dtype=np.uint16),
            restart_interval=2,
        ),
        encode_qoi(rng.integers(0, 256, (9, 7, 4), dtype=np.uint8)),
        encode_jpegls(img),
        encode_jpegls(rng.integers(0, 65536, (6, 9), dtype=np.uint16)),
        encode_jpeg_lossless(img, predictor=4),
        mm.encode_png(img),
        mm.encode_png(img, interlace=True),
        mm.encode_tiff(img, lzw=True, predictor=True),
        mm.encode_tiff(img, tiled=True, packbits=True),
        mm.build_pdf(["x"]), mm.build_docx(["x"]),
        avi.build_avi_mjpeg([encode_jpeg(img)] * 3, 7, 9, fps=5),
        avi.build_avi_rawvideo([img] * 3, 7, 9, fps=5),
        mm.build_mp4_raw([img] * 3, 7, 9, fps=5),
        flac.encode_flac(
            (rng.integers(-9000, 9000, 700)).astype("int64"), 8000,
            block_size=256),
        h264.encode_h264_annexb(
            [rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)],
            qp=20 + seed,
        )[0],
        h264.encode_h264_annexb(
            [rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
             for _ in range(3)],
            qp=22 + seed, gop="ipp", deblock=True,
        )[0],
        h264.encode_h264_annexb(
            [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
             for _ in range(4)],
            qp=24 + seed, gop="ibp",
        )[0],
        h264.encode_h264_annexb(
            [rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
             for _ in range(4)],
            qp=26 + seed, gop="ippw",
        )[0],
        # short-segment WAV: seg_len < 256 exercised the reduceat
        # crash in audio_fingerprint's band-edge padding (r6 fix)
        (b"RIFF" + (28 + 800).to_bytes(4, "little") + b"WAVE"
         + b"fmt " + (16).to_bytes(4, "little")
         + __import__("struct").pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
         + b"data" + (800).to_bytes(4, "little")
         + rng.integers(-32768, 32767, 400, dtype=np.int64)
               .astype("<i2").tobytes()),
        __import__("gzip").compress(b"WARC/1.0\r\nWARC-Type: x\r\n"
                                    b"Content-Length: 2\r\n\r\nhi\r\n\r\n"),
    ]
    fails = 0
    for trial in range(trials):
        blob = bytes(
            rng.integers(0, 256, int(rng.integers(0, 600)), dtype=np.uint8)
        )
        cases = [blob] + [m + blob for m in MAGICS]
        v = valids[trial % len(valids)]
        cases.append(v[: int(rng.integers(0, len(v)))])
        mut = bytearray(v)
        for _ in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(0, len(mut)))] ^= int(rng.integers(1, 256))
        cases.append(bytes(mut))
        for payload in cases:
            for probe in PROBES:
                try:
                    probe(payload)
                except Exception as e:  # noqa: BLE001
                    print(
                        "FAIL", trial, getattr(probe, "__name__", probe),
                        type(e).__name__, e,
                    )
                    fails += 1
                    if fails > 10:
                        return 1
    print(
        f"soak: seed {seed}: {trials} trials x {len(PROBES)} probes,"
        f" {fails} crashes"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
