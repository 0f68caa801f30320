"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas operators.

The decode internals require media libraries absent from this container;
they are STUBBED with a clearly-marked deterministic fake (or raise
NotImplementedError when ``strict=True``). Everything Spark-side —
schemas, batch shapes, UDF signatures, partitioning — is real and
covered by tests/test_multimodal.py.

Scale design: media bytes ride in the DataFrame as a binary column
(parquet BYTE_ARRAY). Feature extraction is embarrassingly parallel —
no shuffle — and output embeddings are fixed-width arrays, so the stage
after extraction can feed straight into the similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(content: bytes) -> np.ndarray:
    """STUB decode+embed: deterministic pseudo-features from a content
    hash. A real deployment swaps in PIL/torchvision/ffmpeg here — the
    signature (bytes → fixed-width float vector) is the contract."""
    seed = int(hashlib.md5(content).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    return rng.rand(FEATURE_DIM).astype(np.float32)


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """binary content → fixed-width feature vectors via mapInPandas
    (Arrow batches; one task per input partition, zero shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present "
                "in this container"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "feature": pdf["content"].map(lambda b: _fake_decode_features(b).tolist()),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video row into one row
    per sampled frame timestamp (JVM-side sequence+explode; the actual
    frame decode happens in extract_features on the sliced bytes).
    """
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))),
        )
        .select("media_id", "mime", "duration_ms", "frame_ms", "content")
    )


def resize_spec(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: compute target dimensions preserving aspect ratio
    (pure JVM arithmetic); the pixel work belongs to the decode stub."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return df.withColumn("target_width", F.ceil(F.col("width") * scale).cast("int")).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int")
    )
