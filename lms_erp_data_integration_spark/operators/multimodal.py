"""Multimodal column plumbing (SURVEY.md M7): treat image/audio/video
as opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the decode kernels are
STUBS: ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake decode
(dimensions/pixel-mean derived from the payload bytes). Everything
Spark-side — schemas, batch iteration, partitioning, UDF signatures —
is real and tested; swapping in Pillow/librosa later only changes the
kernel body.

Scale posture: payloads stay in executor memory one Arrow batch at a
time (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
size); no payload ever reaches the driver. Feature extraction is a
narrow map — at 100 TB it parallelizes per input split with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_mean", T.DoubleType()),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Decode kernel stub. Real implementation would use Pillow; the
    deterministic fake derives metadata from the bytes themselves."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + n % 576,
        "height": 64 + (n * 7) % 448,
        "channels": 3,
        "pixel_mean": (sum(payload[:256]) / min(n, 256)) if n else 0.0,
    }


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (stand-in for real
    image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_image_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    plumbing for a decode stage. Arrow-batched; one pandas frame per
    batch, never a whole partition in memory as Python objects."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_stub(p, fake=True) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(op, IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled offset of each
    payload (video-frame analog). Pure JVM-side (explode over a
    sequence), no UDF."""
    n = F.length(F.col("payload"))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return df.select(
        id_col,
        F.explode(offsets).alias("frame_offset"),
        F.substring(
            F.col("payload").cast("string"), F.lit(1), F.lit(8)
        ).alias("frame_prefix"),
    )
