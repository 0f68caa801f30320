"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.operators import similarity as S
from weather_tools_spark.queries import register


@register(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.q_vec, c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.q_vec, q.q_vec))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors — the ANN
    baseline. Oracle: DuckDB list_dot_product in double precision."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rk"
    ).orderBy("query_id", "rk")


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, round(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4), exact
    all-pairs via the block-partitioned dgemm kernel
    (operators.similarity.embedding_cosine_pairs_blocked): every block
    pair is one bounded-memory task, nothing is collected on the
    driver, and each unordered pair is scored exactly once — the same
    answer as the oracle's O(n²) join at any corpus size."""
    pairs = S.embedding_cosine_pairs_blocked(
        load_table(spark, "embeddings", sf_dir), threshold=0.4
    )
    return pairs.select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("vec_a", "vec_b")


@register("dedup_embedding_lsh_pairs")  # approximate → rows-only check
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH bucketing — the corpus-scale
    path: bucket on (table, bucket) keys, run the exact dgemm pair
    kernel inside each bucket (bounded task memory), union hits across
    tables. Deterministic (seeded planes) but approximate → rows-only
    check; recall ≥ 0.9 vs the exact broadcast-kernel pairs is gated in
    tests/test_dedup_similarity.py."""
    pairs = S.embedding_lsh_pairs(
        load_table(spark, "embeddings", sf_dir), threshold=0.4, bits=2, tables=8
    )
    return pairs.select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("vec_a", "vec_b")


@register("sim_lsh_ann_topk")  # approximate → rows-only check
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via multi-table sign-LSH (8 tables × 4 bits), exact
    cosine re-rank inside candidate buckets. Deterministic (seeded
    planes) but approximate → no SQL oracle; recall vs. brute force
    asserted in tests/test_dedup_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.lsh_topk(emb, queries, k=5, bits=4, tables=8, dim=64, seed=42)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rk"
    ).orderBy("query_id", "rk")


@register("sim_ivf_ann_topk")  # approximate → rows-only check
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN (16 k-means cells, 4-probe) with exact cosine
    re-rank — the inverted-file scale path next to sign-LSH. Seeded and
    iteration-bounded → deterministic; recall vs. brute force asserted
    in tests/test_dedup_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4, seed=42)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rk"
    ).orderBy("query_id", "rk")


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT 'doc' AS kind,
           count(*) AS n_items,
           CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           16 AS feature_dim
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing through the driver surface: documents become
    opaque binary payloads with typed metadata, features come out of the
    Arrow-batched decode stub, and the aggregate proves every row
    produced a FEATURE_DIM vector (a missing/misshapen vector would
    break feature_dim or n_items). The byte accounting is oracle-checked;
    the feature values themselves are covered by tests/test_functions."""
    from weather_tools_spark.sources import multimodal as MM

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("doc").alias("kind"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.encode("text", "utf-8").alias("content"),
    )
    feats = MM.extract_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("n_bytes").cast("bigint")).alias("total_bytes"),
            F.first(F.size("feature")).alias("feature_dim"),
        )
        .select("kind", "n_items", "total_bytes", F.col("feature_dim").cast("int").alias("feature_dim"))
    )


@register(
    "sim_label_centroid_distance",
    oracle="""
    WITH comp AS (
      SELECT label, g.i AS pos, embedding[g.i]::DOUBLE AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g
    ),
    cent AS (SELECT label, pos, avg(x) AS m FROM comp GROUP BY label, pos)
    SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm
    FROM cent GROUP BY label ORDER BY label
    """,
)
def sim_label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid L2 norm — grouped vector aggregation via
    posexplode + per-component avg (the scalable layout for vector
    aggregation: component rows shuffle on (label, pos), no driver
    collection)."""
    emb = load_table(spark, "embeddings", sf_dir)
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    cent = comp.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return (
        cent.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm"))
        .orderBy("label")
    )


@register(
    "multimodal_frame_resize_plan",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             1000 + (doc_id % 20) * 500 AS duration_ms,
             320 + (doc_id % 8) * 120  AS width,
             240 + (doc_id % 5) * 144  AS height
      FROM documents
    )
    SELECT media_id, duration_ms,
           CAST(len(range(0, duration_ms, 1000)) AS BIGINT) AS n_frames,
           CAST(0 AS BIGINT) AS first_ms,
           CAST((len(range(0, duration_ms, 1000)) - 1) * 1000 AS BIGINT) AS last_ms,
           CAST(ceil(width  * least(1.0, 256.0 / greatest(width, height))) AS BIGINT) AS target_width,
           CAST(ceil(height * least(1.0, 256.0 / greatest(width, height))) AS BIGINT) AS target_height
    FROM media
    ORDER BY media_id
    """,
)
def multimodal_frame_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling + resize planning through the driver surface:
    synthetic per-doc media metadata flows through the REAL operators —
    frame_sample_plan's sequence+explode (then re-aggregated to per-media
    frame accounting) and resize_spec's aspect-preserving arithmetic —
    while the oracle recomputes the same counts/dims arithmetically. The
    byte-decode stage stays behind the decode stub; this certifies all
    the Spark-side plumbing a real codec would plug into."""
    from weather_tools_spark.sources import multimodal as MM

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("video/mp4").alias("mime"),
        (320 + (F.col("doc_id") % 8) * 120).cast("int").alias("width"),
        (240 + (F.col("doc_id") % 5) * 144).cast("int").alias("height"),
        (1000 + (F.col("doc_id") % 20) * 500).cast("int").alias("duration_ms"),
        F.col("text").cast("binary").alias("content"),
    )
    frames = (
        MM.frame_sample_plan(media, every_ms=1000)
        .groupBy("media_id", "duration_ms")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min("frame_ms").cast("long").alias("first_ms"),
            F.max("frame_ms").cast("long").alias("last_ms"),
        )
    )
    resized = MM.resize_spec(media).select(
        "media_id",
        F.col("target_width").cast("long").alias("target_width"),
        F.col("target_height").cast("long").alias("target_height"),
    )
    return (
        frames.join(resized, "media_id")
        .select(
            "media_id",
            F.col("duration_ms").cast("long").alias("duration_ms"),
            "n_frames",
            "first_ms",
            "last_ms",
            "target_width",
            "target_height",
        )
        .orderBy("media_id")
    )
