"""Multimodal queries over REAL stdlib-codec media bytes.

Each query builds deterministic synthetic media (pixels/samples are
exact integer functions of the media id and coordinates), encodes it to
a genuine file format (BMP / WAV / RVID) in one distributed Arrow stage,
decodes it with the real parser in another, and aggregates — so the
DuckDB oracle, which recomputes the statistics arithmetically from the
generating formula, hash-gates the ACTUAL encode->bytes->decode path
(exactly the strategy that certifies the weather codecs:
zarr_pruned_scan_agg etc.).

All decoded statistics are integer sums; the only floats are final
rounded means/rms, so no engine-libm drift can touch a gate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register
from weather_tools_spark.sources import media_codecs as MC
from weather_tools_spark.sources import multimodal as MM


def _ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(F.col("doc_id").cast("long").alias("media_id"))


def _gen_images(ids: DataFrame) -> DataFrame:
    """Deterministic BMPs: w = 16+(d%5)*4, h = 12+(d%3)*6,
    pixel(d,x,y,c) = (d*7 + x*13 + y*31 + c*5) % 256."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for d in pdf["media_id"]:
                d = int(d)
                w, h = 16 + (d % 5) * 4, 12 + (d % 3) * 6
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                rgb = ((d * 7 + x * 13 + y * 31 + c * 5) % 256).astype(np.uint8)
                content.append(MC.bmp_encode(rgb))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": content})

    return ids.mapInPandas(gen, "media_id long, content binary")


@register(
    "multimodal_image_decode_agg",
    oracle="""
    WITH dims AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 5) * 4 AS w,
             12 + (doc_id % 3) * 6 AS h
      FROM documents
    ),
    px1 AS (
      SELECT media_id, w, h, unnest(range(0, w)) AS x FROM dims
    ),
    px AS (
      SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM px1
    )
    SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg((media_id * 7 + x * 13 + y * 31) % 256), 6) AS mean_r,
           round(avg((media_id * 7 + x * 13 + y * 31 + 5) % 256), 6) AS mean_g,
           round(avg((media_id * 7 + x * 13 + y * 31 + 10) % 256), 6) AS mean_b
    FROM px GROUP BY media_id, w, h ORDER BY media_id
    """,
)
def multimodal_image_decode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode through REAL BMP bytes: distributed encode (numpy ->
    24-bpp padded bottom-up BMP), distributed decode (struct parse +
    frombuffer), per-image channel means. The oracle recomputes the
    means from the pixel formula — any padding/row-order/channel-order
    bug in either codec half flips the hash. Zero shuffle until the
    final per-image projection."""
    imgs = _gen_images(_ids(spark, sf_dir))
    stats = MM.decode_image_stats(imgs)
    n = (F.col("width") * F.col("height")).cast("double")
    return stats.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("sum_r") / n, 6).alias("mean_r"),
        F.round(F.col("sum_g") / n, 6).alias("mean_g"),
        F.round(F.col("sum_b") / n, 6).alias("mean_b"),
    ).orderBy("media_id")


@register(
    "multimodal_image_resize_agg",
    oracle="""
    WITH dims AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 5) * 4 AS w,
             12 + (doc_id % 3) * 6 AS h
      FROM documents
    ),
    tgt1 AS (
      SELECT media_id, w, h, unnest(range(0, 5)) AS ti FROM dims
    ),
    tgt AS (
      SELECT media_id,
             ((ti * w) // 5) AS sx,
             ((unnest(range(0, 4)) * h) // 4) AS sy
      FROM tgt1
    )
    SELECT media_id,
           round(avg((media_id * 7 + sx * 13 + sy * 31) % 256), 6) AS mean_r,
           round(avg((media_id * 7 + sx * 13 + sy * 31 + 5) % 256), 6) AS mean_g,
           round(avg((media_id * 7 + sx * 13 + sy * 31 + 10) % 256), 6) AS mean_b
    FROM tgt GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_image_resize_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize: decode BMP -> nearest-neighbor resample to 5x4 with
    the floor-index mapping src = (i*dim)//target -> re-encode BMP ->
    decode AGAIN -> means of the 20 sampled pixels. The oracle evaluates
    the pixel formula at exactly those source indices, so the gate pins
    the resample index arithmetic AND both codec round-trips."""
    imgs = _gen_images(_ids(spark, sf_dir))
    resized = MM.resize_images(imgs, target_w=5, target_h=4)
    stats = MM.decode_image_stats(resized)
    n = F.lit(20.0)  # 5 x 4 target pixels
    return stats.select(
        "media_id",
        F.round(F.col("sum_r") / n, 6).alias("mean_r"),
        F.round(F.col("sum_g") / n, 6).alias("mean_g"),
        F.round(F.col("sum_b") / n, 6).alias("mean_b"),
    ).orderBy("media_id")


@register(
    "multimodal_audio_features",
    oracle="""
    WITH clips AS (
      SELECT doc_id AS media_id, 800 + (doc_id % 7) * 100 AS n FROM documents
    ),
    s AS (
      SELECT media_id, n,
             ((media_id * 37 + unnest(range(0, n)) * 101) % 4001) - 2000 AS v
      FROM clips
    ),
    en AS (
      SELECT media_id, CAST(max(n) AS BIGINT) AS n_samples,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM s GROUP BY media_id
    ),
    pairs0 AS (
      SELECT media_id, unnest(range(0, n - 1)) AS k FROM clips
    ),
    pairs AS (
      SELECT media_id,
             ((media_id * 37 + k * 101) % 4001) - 2000 AS a,
             ((media_id * 37 + (k + 1) * 101) % 4001) - 2000 AS b
      FROM pairs0
    ),
    zc AS (
      SELECT media_id,
             CAST(sum(CASE WHEN a * b < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS zero_crossings
      FROM pairs GROUP BY media_id
    )
    SELECT media_id, n_samples, zero_crossings,
           round(sqrt(ss * 1.0 / n_samples), 6) AS rms
    FROM en JOIN zc USING (media_id) ORDER BY media_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features through REAL WAV bytes: deterministic int16
    waveform s_k = ((d*37 + k*101) % 4001) - 2000, encoded as RIFF/WAVE
    PCM16 in one Arrow stage, decoded by the chunk-walking parser in
    another, then RMS energy + zero-crossing count per clip. The oracle
    replays the waveform arithmetic — a byte-order or chunk-offset bug
    anywhere in the WAV path flips the gate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for d in pdf["media_id"]:
                d = int(d)
                n = 800 + (d % 7) * 100
                k = np.arange(n, dtype=np.int64)
                v = ((d * 37 + k * 101) % 4001) - 2000
                content.append(MC.wav_encode(v.astype(np.int16), sample_rate=16000))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": content})

    clips = _ids(spark, sf_dir).mapInPandas(gen, "media_id long, content binary")
    stats = MM.decode_audio_stats(clips)
    return stats.select(
        "media_id",
        "n_samples",
        "zero_crossings",
        F.round(F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6).alias("rms"),
    ).orderBy("media_id")


@register(
    "multimodal_video_framesample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, 8 + (doc_id % 5) AS nf FROM documents
    ),
    fr0 AS (
      SELECT media_id, unnest(range(0, nf)) AS f FROM v
    ),
    fr AS (
      SELECT media_id, f FROM fr0 WHERE f % 3 = 0
    ),
    px0 AS (
      SELECT media_id, f, unnest(range(0, 8)) AS x FROM fr
    ),
    px AS (
      SELECT media_id, f, x, unnest(range(0, 6)) AS y FROM px0
    )
    SELECT media_id,
           CAST(count(DISTINCT f) AS BIGINT) AS n_sampled,
           CAST(max(f) AS BIGINT) AS last_frame,
           round(avg((media_id * 11 + f * 17 + x * 13 + y * 31) % 256), 6) AS mean_r,
           round(avg((media_id * 11 + f * 17 + x * 13 + y * 31 + 5) % 256), 6) AS mean_g,
           round(avg((media_id * 11 + f * 17 + x * 13 + y * 31 + 10) % 256), 6) AS mean_b
    FROM px GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling: RVID raw-frame container with nf = 8+(d%5)
    frames of 8x6 RGB, pixel(d,f,x,y,c) = (d*11+f*17+x*13+y*31+c*5)%256;
    the sampler byte-range-slices ONLY frames 0,3,6,... (untouched
    frames are never read) and emits per-frame integer sums, aggregated
    to per-video channel means. The oracle replays the sampled-frame
    arithmetic — an off-by-one in the frame offset math flips the gate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for d in pdf["media_id"]:
                d = int(d)
                nf = 8 + (d % 5)
                f, y, x, c = np.ogrid[0:nf, 0:6, 0:8, 0:3]
                frames = ((d * 11 + f * 17 + x * 13 + y * 31 + c * 5) % 256).astype(
                    np.uint8
                )
                content.append(MC.rvid_encode(frames, fps=10))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": content})

    vids = _ids(spark, sf_dir).mapInPandas(gen, "media_id long, content binary")
    frames = MM.sample_video_frames(vids, every_n=3)
    px_per_frame = F.lit(48.0)  # 8 x 6
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_idx").cast("long").alias("last_frame"),
            F.round(F.sum("sum_r") / (F.count(F.lit(1)) * px_per_frame), 6).alias("mean_r"),
            F.round(F.sum("sum_g") / (F.count(F.lit(1)) * px_per_frame), 6).alias("mean_g"),
            F.round(F.sum("sum_b") / (F.count(F.lit(1)) * px_per_frame), 6).alias("mean_b"),
        )
        .orderBy("media_id")
    )


@register(
    "multimodal_video_scene_changes",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, 8 + (doc_id % 5) AS nf FROM documents
    ),
    -- only scene-boundary frames (f % 3 = 0, f >= 3) can differ: within
    -- a scene the generating formula is frame-invariant, so those diffs
    -- are exactly 0 and contribute nothing to any output column. The
    -- Spark side still sums EVERY consecutive diff, so a codec bug that
    -- leaks nonzero within-scene differences flips total_abs_diff.
    b0 AS (SELECT media_id, nf, unnest([3, 6, 9, 12]) AS f FROM v),
    b AS (SELECT media_id, nf, f FROM b0 WHERE f < nf),
    p0 AS (SELECT media_id, nf, f, unnest(range(0, 8)) AS x FROM b),
    p1 AS (SELECT media_id, nf, f, x, unnest(range(0, 6)) AS y FROM p0),
    px AS (SELECT media_id, nf, f, x, y, unnest(range(0, 3)) AS c FROM p1),
    diffs AS (
      SELECT media_id, f,
             sum(abs(
               (media_id * 11 + (f // 3) * 89 + x * 13 + y * 31 + c * 5) % 256
               - (media_id * 11 + ((f - 1) // 3) * 89 + x * 13 + y * 31 + c * 5) % 256
             )) AS sum_abs_diff
      FROM px GROUP BY media_id, f
    ),
    agg AS (
      SELECT media_id,
             CAST(sum(CASE WHEN sum_abs_diff > 1152 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scene_changes,
             CAST(min(CASE WHEN sum_abs_diff > 1152 THEN f END) AS BIGINT)
               AS first_change_frame,
             CAST(sum(sum_abs_diff) AS BIGINT) AS total_abs_diff
      FROM diffs GROUP BY media_id
    )
    SELECT v.media_id, CAST(v.nf AS INT) AS n_frames,
           coalesce(a.n_scene_changes, 0) AS n_scene_changes,
           coalesce(a.n_scene_changes, 0) + 1 AS n_scenes,
           a.first_change_frame,
           coalesce(a.total_abs_diff, 0) AS total_abs_diff
    FROM v LEFT JOIN agg a ON v.media_id = a.media_id
    ORDER BY v.media_id
    """,
)
def multimodal_video_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection through REAL RVID bytes: videos are
    generated with genuine scene structure (scene id = frame // 3, so
    frames within a scene are identical and boundaries jump), encoded
    to the raw-frame container, then decoded frame-by-frame by the
    sequential byte-range kernel emitting EXACT integer
    consecutive-frame |delta| sums. A boundary is a scene change when
    the summed difference exceeds mad 8 per pixel-channel (integer
    threshold 8 * 8*6*3 = 1152 — no float comparison anywhere). The
    oracle replays the per-pixel difference arithmetic from the
    generating formula, so any frame-offset or row-order bug in the
    codec flips the gate. Parallelism is across videos; per-video
    decode is the sequential unit (frames are a data-dependent chain),
    which is the correct distribution grain for shot detection at
    scale."""
    from weather_tools_spark.sources.multimodal import video_frame_diffs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for d in pdf["media_id"]:
                d = int(d)
                nf = 8 + (d % 5)
                f, y, x, c = np.ogrid[0:nf, 0:6, 0:8, 0:3]
                s = f // 3
                frames = ((d * 11 + s * 89 + x * 13 + y * 31 + c * 5) % 256).astype(
                    np.uint8
                )
                content.append(MC.rvid_encode(frames, fps=10))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": content})

    vids = _ids(spark, sf_dir).mapInPandas(gen, "media_id long, content binary")
    diffs = video_frame_diffs(vids)
    change = F.when(F.col("sum_abs_diff") > 1152, 1).otherwise(0)
    return (
        diffs.groupBy("media_id")
        .agg(
            F.max("n_frames").alias("n_frames"),
            F.sum(change).alias("n_scene_changes"),
            (F.sum(change) + 1).alias("n_scenes"),
            F.min(F.when(F.col("sum_abs_diff") > 1152, F.col("frame_idx"))).cast("long").alias(
                "first_change_frame"
            ),
            F.sum("sum_abs_diff").alias("total_abs_diff"),
        )
        .orderBy("media_id")
    )
