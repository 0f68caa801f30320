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
    "sim_cosine_topk_blocked",
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
def sim_cosine_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY DISTRIBUTED exact top-k path (cosine_topk_blocked:
    block-grid applyInPandas, neither frame materialized to the driver
    — the kernel cosine_topk delegates to above its broadcast bound)
    verified against the IDENTICAL brute-force oracle as
    sim_cosine_topk: the driver gate that pins the corpus-scale kNN
    plan exact, not just recall-bounded."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk_blocked(emb, queries, k=5, n_blocks=8)
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


# ---------------------------------------------------------------------------
# Embedding clustering (operators/clustering.py): k-means + SemDeDup
# ---------------------------------------------------------------------------

_KM_K, _KM_ITERS = 8, 3
_SEMDEDUP_TAU = 0.45


def _kmeans_cte_chain() -> str:
    """Chained-CTE replay of the EXACT Lloyd schedule kmeans_fit runs:
    seeds = k lowest-id vectors; each iteration assigns by squared
    distance (‖x‖²−2x·c+‖c‖², ties → lower cluster id) then updates
    centroids as element-wise means (empty cluster keeps its previous
    centroid); all arithmetic in fp64. Returns CTEs ending in
    ``final`` = (vec_id, cluster, dist2, v) against the post-iteration
    centroids ``c{iters}``."""
    k, iters = _KM_K, _KM_ITERS
    parts = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
      FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS (
      SELECT vec_id, cluster FROM (
        SELECT e.vec_id, s.cid AS cluster,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, s.c)
                          + list_dot_product(s.c, s.c), s.cid) AS rn
        FROM emb e CROSS JOIN c{t - 1} s)
      WHERE rn = 1
    )""")
        parts.append(f"""c{t} AS (
      SELECT s.cid, coalesce(m.c, s.c) AS c
      FROM c{t - 1} s LEFT JOIN (
        SELECT cid, list(mv ORDER BY pos) AS c FROM (
          SELECT cluster AS cid, pos, avg(val) AS mv FROM (
            SELECT a.cluster, unnest(e.v) AS val, unnest(range(0, len(e.v))) AS pos
            FROM a{t} a JOIN emb e USING (vec_id))
          GROUP BY cluster, pos)
        GROUP BY cid) m ON s.cid = m.cid
    )""")
    parts.append(f"""final AS (
      SELECT vec_id, cluster, dist2, v FROM (
        SELECT e.vec_id, s.cid AS cluster, e.v,
               list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, s.c)
                 + list_dot_product(s.c, s.c) AS dist2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, s.c)
                          + list_dot_product(s.c, s.c), s.cid) AS rn
        FROM emb e CROSS JOIN c{iters} s)
      WHERE rn = 1
    )""")
    return ",\n    ".join(parts)


@register(
    "ml_kmeans_cluster_summary",
    oracle=f"""
    WITH {_kmeans_cte_chain()}
    SELECT f.cluster,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(f.dist2), 3) AS inertia,
           round(any_value(sqrt(list_dot_product(c.c, c.c))), 6) AS centroid_norm
    FROM final f JOIN c{_KM_ITERS} c ON f.cluster = c.cid
    GROUP BY f.cluster
    ORDER BY f.cluster
    """,
)
def ml_kmeans_cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus
    (operators/clustering.py): k=8 seeds = lowest ids, 3
    assignment+update passes (each ONE mapInPandas emitting per-batch
    partial sums — k×d doubles per batch, not n rows), then a final
    assignment. The DuckDB oracle replays the identical schedule as a
    chained-CTE program, so the hash gate certifies every iteration:
    assignment ties, empty-cluster handling, fp64 means, and the final
    inertia — an ITERATIVE algorithm under the oracle, not rows-only."""
    from weather_tools_spark.operators import clustering as C

    emb = load_table(spark, "embeddings", sf_dir)
    cents = C.kmeans_fit(emb, k=_KM_K, iters=_KM_ITERS)
    assigned = C.kmeans_assign(emb, cents)
    norms = spark.createDataFrame(
        [(i, float(sum(x * x for x in c) ** 0.5)) for i, c in enumerate(cents)],
        "cluster int, centroid_norm double",
    )
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("dist2"), 3).alias("inertia"))
        .join(F.broadcast(norms), "cluster")
        .select("cluster", "n", "inertia", F.round("centroid_norm", 6).alias("centroid_norm"))
        .orderBy("cluster")
    )


@register(
    "ml_semdedup_keep_rate",
    oracle=f"""
    WITH {_kmeans_cte_chain()},
    normed AS (
      SELECT vec_id, cluster,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
      FROM final
    ),
    dups AS (
      SELECT b.vec_id
      FROM normed a JOIN normed b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.u, b.u) >= {_SEMDEDUP_TAU}
      GROUP BY b.vec_id
    )
    SELECT n.cluster,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE d.vec_id IS NULL) AS BIGINT) AS kept,
           round(count(*) FILTER (WHERE d.vec_id IS NULL) * 1.0 / count(*), 6) AS keep_rate
    FROM normed n LEFT JOIN dups d ON n.vec_id = d.vec_id
    GROUP BY n.cluster
    ORDER BY n.cluster
    """,
)
def ml_semdedup_keep_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embeddings, then mark a
    document as a near-duplicate when some lower-id document in the SAME
    cluster has cosine ≥ τ — the clustering bounds the quadratic search
    per cluster. Per-cluster applyInPandas dgemm on the Spark side; the
    oracle replays the full k-means chain plus the within-cluster pair
    scan in SQL. Output: per-cluster corpus size, survivors, keep rate."""
    from weather_tools_spark.operators import clustering as C

    emb = load_table(spark, "embeddings", sf_dir)
    cents = C.kmeans_fit(emb, k=_KM_K, iters=_KM_ITERS)
    marked = C.semdedup(emb, cents, threshold=_SEMDEDUP_TAU)
    return (
        marked.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        )
        .select(
            "cluster", "n", "kept",
            F.round(F.col("kept") / F.col("n"), 6).alias("keep_rate"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Semi-supervised kNN label propagation
# ---------------------------------------------------------------------------

_LP_K, _LP_ITERS = 5, 2


def _lp_oracle() -> str:
    """Chained-CTE replay of the kNN label-propagation schedule: seeds
    = vec_id % 5 == 0 with their true labels; each iteration labels
    every still-unlabeled vector by the MAJORITY label of its k nearest
    LABELED neighbors (cosine; rank ties → lower neighbor id; vote ties
    → smaller label)."""
    parts = [
        """emb AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS u
      FROM embeddings)""",
        "k0 AS (SELECT vec_id, label FROM emb WHERE vec_id % 5 = 0)",
    ]
    for t in range(1, _LP_ITERS + 1):
        parts.append(f"""nn{t} AS (
      SELECT query_id, label FROM (
        SELECT e.vec_id AS query_id, kk.label,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_dot_product(e.u, l.u) DESC, l.vec_id) AS rk
        FROM emb e
        JOIN k{t - 1} kk ON TRUE
        JOIN emb l ON l.vec_id = kk.vec_id
        WHERE e.vec_id NOT IN (SELECT vec_id FROM k{t - 1}))
      WHERE rk <= {_LP_K})""")
        parts.append(f"""v{t} AS (
      SELECT query_id AS vec_id, label FROM (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY count(*) DESC, label) AS vr
        FROM nn{t} GROUP BY query_id, label)
      WHERE vr = 1)""")
        parts.append(f"k{t} AS (SELECT * FROM k{t - 1} UNION ALL SELECT * FROM v{t})")
    return ",\n    ".join(parts)


@register(
    "ml_label_propagation",
    oracle=f"""
    WITH {_lp_oracle()},
    final AS (
      SELECT k.vec_id, k.label AS assigned, e.label AS true_label,
             CASE WHEN k.vec_id % 5 = 0 THEN 'seed' ELSE 'propagated' END AS kind
      FROM k{_LP_ITERS} k JOIN emb e ON k.vec_id = e.vec_id
    )
    SELECT assigned AS label,
           CAST(count(*) FILTER (WHERE kind = 'seed') AS BIGINT) AS n_seed,
           CAST(count(*) FILTER (WHERE kind = 'propagated') AS BIGINT) AS n_propagated,
           CAST(count(*) FILTER (WHERE kind = 'propagated' AND assigned = true_label) AS BIGINT)
             AS n_correct
    FROM final GROUP BY assigned ORDER BY assigned
    """,
)
def ml_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised kNN label propagation: 20% of the corpus keeps
    its label (seeds), then two rounds of 'label every unlabeled vector
    by the majority label of its 5 nearest labeled neighbors' — the
    classic graph-based SSL scheme, with every tie rule pinned
    (cosine-rank ties → lower id, vote ties → smaller label) so the
    DuckDB oracle can replay BOTH iterations as chained CTEs. Spark
    side: each round is one broadcast-query dgemm top-k
    (operators/similarity.cosine_topk — batch-local top-k, P×k shuffle
    rows) + a map-combinable vote; the labeled frame grows between
    rounds exactly as the oracle's UNION ALL does. Reported as
    per-label seed/propagated/accuracy counts."""
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir)
    known = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "label")
    for _ in range(_LP_ITERS):
        labeled_vecs = emb.join(known.select("vec_id"), "vec_id")
        unlabeled = emb.join(known.select("vec_id"), "vec_id", "left_anti")
        if unlabeled.limit(1).count() == 0:
            break  # converged — every vector labeled (oracle's nnT is empty too)
        nn = S.cosine_topk(labeled_vecs, unlabeled, k=_LP_K)
        votes = (
            nn.join(
                known.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
            )
            .groupBy("query_id", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        wv = Window.partitionBy("query_id").orderBy(F.col("n").desc(), "label")
        new = (
            votes.withColumn("vr", F.row_number().over(wv))
            .filter(F.col("vr") == 1)
            .select(F.col("query_id").alias("vec_id"), "label")
        )
        known = known.unionByName(new)
    final = known.join(
        emb.select("vec_id", F.col("label").alias("true_label")), "vec_id"
    ).select(
        F.col("label").alias("assigned"),
        "true_label",
        F.when(F.col("vec_id") % 5 == 0, "seed").otherwise("propagated").alias("kind"),
    )
    return (
        final.groupBy(F.col("assigned").alias("label"))
        .agg(
            F.sum(F.when(F.col("kind") == "seed", 1).otherwise(0)).alias("n_seed"),
            F.sum(F.when(F.col("kind") == "propagated", 1).otherwise(0)).alias("n_propagated"),
            F.sum(
                F.when(
                    (F.col("kind") == "propagated") & (F.col("assigned") == F.col("true_label")), 1
                ).otherwise(0)
            ).alias("n_correct"),
        )
        .orderBy("label")
    )


@register(
    "sim_hard_negative_mining",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, label AS q_label FROM e
          WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, q.q_label, c.vec_id AS neighbor_id, c.label AS n_label,
             list_dot_product(q.qv, c.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.v, c.v))) AS cosine
      FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id
    ),
    negs AS (
      SELECT query_id, 'hard_negative' AS kind, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored WHERE n_label <> q_label
    ),
    pos AS (
      SELECT query_id, 'hard_positive' AS kind, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored WHERE n_label = q_label
    )
    SELECT query_id, kind, neighbor_id, round(cosine, 6) AS cosine, rk
    FROM (SELECT * FROM negs WHERE rk <= 2
          UNION ALL SELECT * FROM pos WHERE rk <= 1)
    ORDER BY query_id, kind, rk
    """,
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for embedding-model training data: for
    each anchor, the 2 most similar DIFFERENT-label vectors (hard
    negatives — the examples a contrastive loss learns most from) and
    the most similar same-label vector (hard positive). Pure JVM
    arithmetic: the 20-row anchor set broadcasts against the corpus,
    cosines run as zip_with/aggregate folds inside codegen, and ranking
    is a window partitioned per anchor — the corpus is read once, no
    driver collection."""
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("q_label"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("n_label"),
            (dot / (nrm(F.col("qv")) * nrm(F.col("v")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id", "kind").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    tagged = scored.withColumn(
        "kind",
        F.when(F.col("n_label") != F.col("q_label"), "hard_negative").otherwise(
            "hard_positive"
        ),
    ).withColumn("rk", F.row_number().over(w))
    keep = tagged.filter(
        ((F.col("kind") == "hard_negative") & (F.col("rk") <= 2))
        | ((F.col("kind") == "hard_positive") & (F.col("rk") <= 1))
    )
    return keep.select(
        "query_id", "kind", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rk"
    ).orderBy("query_id", "kind", "rk")


# ---------------------------------------------------------------------------
# PCA top component by power iteration on the distributed Gram matrix
# ---------------------------------------------------------------------------

_PCA_D = 64
_PCA_ITERS = 3
_PCA_V0 = 0.125  # 1/sqrt(64): exact dyadic, so both engines start identically


def _pca_oracle() -> str:
    parts = [
        f"""
    e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings
    ),
    g AS (
      SELECT a.i AS gi, b.i AS gj, sum(a.v * b.v) AS g
      FROM e a JOIN e b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    v0 AS (
      SELECT unnest(generate_series(1, {_PCA_D})) AS vi, {_PCA_V0!r} AS vv
    )"""
    ]
    for it in range(1, _PCA_ITERS + 1):
        parts.append(f"""
    w{it} AS (
      SELECT gi, sum(g.g * v.vv) AS w
      FROM g JOIN v{it - 1} v ON g.gj = v.vi
      GROUP BY gi
    ),
    n{it} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{it}),
    v{it} AS (SELECT gi AS vi, w / nrm AS vv FROM w{it}, n{it})""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT v.vi AS component,
           round(v.vv, 6) AS loading,
           round(n.nrm, 4) AS eigenvalue
    FROM v{_PCA_ITERS} v CROSS JOIN n{_PCA_ITERS} n
    ORDER BY component
    """
    )


@register("ml_pca_power_iteration", oracle=_pca_oracle())
def ml_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by power
    iteration: the Gram matrix G = X^T X is computed DISTRIBUTED (one
    mapInPandas pass emitting d^2 partial sums per batch — shuffle
    volume O(batches * d^2), corpus never collected), then the
    iteration v <- G v / ||G v|| runs on one bounded collect of the
    d^2-row G frame (32 KB at d=64, corpus-independent — the k-means
    centroid-collect contract class), with the final norm as the
    Rayleigh-quotient eigenvalue estimate. Starts from the exact dyadic uniform unit
    vector 1/8, so both engines iterate from identical state; the
    oracle replays the Gram build AND all three iterations as chained
    CTEs (sixth iterative algorithm fully under the hash gate). sqrt
    and division are IEEE correctly-rounded — the only cross-engine
    divergence is last-ulp summation order inside the Gram/matvec
    sums, absorbed by the 6-decimal rounding. On this isotropic
    synthetic corpus the Gram spectrum is near-flat, so three
    iterations certify the machinery rather than a converged
    eigenvector (alignment error ~ (lambda2/lambda1)^iters);
    test_clustering pins actual convergence on an anisotropic
    corpus."""
    from weather_tools_spark.operators.similarity import gram_matrix, power_iteration

    emb = load_table(spark, "embeddings", sf_dir)
    g = gram_matrix(emb, "embedding", _PCA_D)
    v, nrm = power_iteration(g, _PCA_D, _PCA_ITERS, _PCA_V0)
    return (
        v.crossJoin(F.broadcast(nrm))
        .select(
            F.col("vi").alias("component"),
            F.round("vv", 6).alias("loading"),
            F.round("nrm", 4).alias("eigenvalue"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance diverse top-k
# ---------------------------------------------------------------------------

_MMR_QUERIES = 4     # query vectors: vec_id < 4
_MMR_POOL = 12       # candidate pool per query (top by relevance)
_MMR_K = 4           # diverse results to select
# lambda = 1/2 (dyadic): score = (rel - max_sim_to_selected) / 2


def _mmr_steps_sql() -> str:
    """Chained-CTE replay of the greedy MMR selection: step 1 takes the
    most relevant candidate; step k maximizes
    0.5*rel - 0.5*max(sim to already-selected), ties to the lower
    neighbor id. All comparisons run on 6-rounded cosines, so both
    engines rank identical grid values."""
    parts = [
        """
    s1 AS MATERIALIZED (
      SELECT query_id, neighbor_id, rel, 1 AS pick
      FROM (
        SELECT query_id, neighbor_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, neighbor_id) AS rk
        FROM pool
      ) WHERE rk = 1
    ),
    sel1 AS (SELECT query_id, neighbor_id, pick FROM s1)"""
    ]
    for k in range(2, _MMR_K + 1):
        parts.append(f"""
    s{k} AS MATERIALIZED (
      SELECT query_id, neighbor_id, rel, {k} AS pick
      FROM (
        SELECT p.query_id, p.neighbor_id, p.rel,
               row_number() OVER (PARTITION BY p.query_id
                 ORDER BY 0.5 * p.rel - 0.5 * mx.msim DESC, p.neighbor_id) AS rk
        FROM pool p
        JOIN (
          SELECT p2.query_id, p2.neighbor_id, max(pw.sim) AS msim
          FROM pool p2
          JOIN sel{k - 1} s ON s.query_id = p2.query_id
          JOIN pairwise pw ON pw.query_id = p2.query_id
            AND pw.a = p2.neighbor_id AND pw.b = s.neighbor_id
          GROUP BY p2.query_id, p2.neighbor_id
        ) mx ON mx.query_id = p.query_id AND mx.neighbor_id = p.neighbor_id
        WHERE NOT EXISTS (
          SELECT 1 FROM sel{k - 1} s
          WHERE s.query_id = p.query_id AND s.neighbor_id = p.neighbor_id
        )
      ) WHERE rk = 1
    ),
    sel{k} AS (
      SELECT query_id, neighbor_id, pick FROM sel{k - 1}
      UNION ALL SELECT query_id, neighbor_id, pick FROM s{k}
    )""")
    return ",".join(parts)


@register(
    "sim_mmr_diverse_topk",
    oracle=f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {_MMR_QUERIES}
    ),
    scored AS MATERIALIZED (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.qv, c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]))), 6) AS rel
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    pool AS MATERIALIZED (
      SELECT query_id, neighbor_id, rel FROM (
        SELECT query_id, neighbor_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, neighbor_id) AS rk
        FROM scored
      ) WHERE rk <= {_MMR_POOL}
    ),
    pairwise AS MATERIALIZED (
      SELECT a.query_id, a.neighbor_id AS a, b.neighbor_id AS b,
             round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
               / (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))), 6)
               AS sim
      FROM pool a
      JOIN pool b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
      JOIN embeddings ea ON ea.vec_id = a.neighbor_id
      JOIN embeddings eb ON eb.vec_id = b.neighbor_id
    ),
    {_mmr_steps_sql()}
    SELECT s.query_id, s.pick, s.neighbor_id, p.rel
    FROM sel{_MMR_K} s JOIN pool p
      ON p.query_id = s.query_id AND p.neighbor_id = s.neighbor_id
    ORDER BY s.query_id, s.pick
    """,
)
def sim_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diverse retrieval: greedily select
    k=4 results per query maximizing 0.5*relevance - 0.5*max
    similarity to the already-selected set — the diversity re-ranking
    stage of a RAG/retrieval pipeline (plain top-k returns near
    duplicates; MMR spends the budget on coverage). The relevance pool
    is a distributed broadcast-queries scan; the sequential greedy
    selection runs as an Arrow applyInPandas kernel per QUERY (queries
    are the distribution grain; inside one query the selection is a
    data-dependent chain over a {_MMR_POOL}-candidate pool). Every
    cosine is rounded to 6 decimals BEFORE any comparison, so both
    engines rank identical grid values and the argmax cannot flip on
    dgemm-vs-sequential dot-product summation order; ties break to the
    lower neighbor id. The oracle replays pool construction, the
    pairwise matrix, and all greedy steps as chained CTEs."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < _MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("nv"),
            F.round(
                F.expr(
                    "aggregate(zip_with(qv, embedding, (a, b) -> cast(a as double) * cast(b as double)), 0D, (s, x) -> s + x)"
                )
                / (
                    F.sqrt(
                        F.expr(
                            "aggregate(transform(qv, a -> cast(a as double) * cast(a as double)), 0D, (s, x) -> s + x)"
                        )
                    )
                    * F.sqrt(
                        F.expr(
                            "aggregate(transform(embedding, a -> cast(a as double) * cast(a as double)), 0D, (s, x) -> s + x)"
                        )
                    )
                ),
                6,
            ).alias("rel"),
        )
    )
    from pyspark.sql import Window as W

    wq = W.partitionBy("query_id").orderBy(F.col("rel").desc(), "neighbor_id")
    pool = scored.withColumn("rk", F.row_number().over(wq)).filter(
        F.col("rk") <= _MMR_POOL
    )

    def mmr(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        vecs = np.vstack(pdf["nv"].to_numpy()).astype(np.float64)
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        sims = np.round((vecs @ vecs.T) / np.outer(norms, norms), 6)
        ids = pdf["neighbor_id"].to_numpy()
        rels = pdf["rel"].to_numpy()
        selected: list[int] = []
        out = {"query_id": [], "pick": [], "neighbor_id": [], "rel": []}
        for pick in range(1, _MMR_K + 1):
            best_i, best_score = None, None
            for i in range(len(ids)):
                if i in selected:
                    continue
                if pick == 1:
                    score = rels[i]
                else:
                    score = 0.5 * rels[i] - 0.5 * max(sims[i, j] for j in selected)
                if (
                    best_score is None
                    or score > best_score
                    or (score == best_score and ids[i] < ids[best_i])
                ):
                    best_i, best_score = i, score
            selected.append(best_i)
            out["query_id"].append(int(pdf["query_id"].iloc[0]))
            out["pick"].append(pick)
            out["neighbor_id"].append(int(ids[best_i]))
            out["rel"].append(float(rels[best_i]))
        return pd.DataFrame(out)

    return (
        pool.select("query_id", "neighbor_id", "nv", "rel")
        .groupBy("query_id")
        .applyInPandas(mmr, "query_id long, pick int, neighbor_id long, rel double")
        .orderBy("query_id", "pick")
    )
