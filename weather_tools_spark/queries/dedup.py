"""Deduplication queries over the documents table.

Exact and exact-pairwise-Jaccard variants are oracle-checked against
DuckDB; MinHash-LSH and SimHash are approximate/hash-seeded operators
with no faithful ANSI-SQL equivalent, so they are registered without an
oracle (driver records the rows-only check) and additionally covered by
unit tests asserting they recover the exact-Jaccard planted pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.operators import dedup as D
from weather_tools_spark.queries import register


@register(
    "dedup_exact_canonical",
    oracle="""
    WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
    groups AS (SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_members
               FROM hashed GROUP BY content_hash)
    SELECT h.doc_id, g.keep_id, g.n_members
    FROM hashed h JOIN groups g USING (content_hash)
    ORDER BY h.doc_id
    """,
)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash → group → canonical representative mapping
    (keep-min-id policy). One map-combinable aggregation + broadcast-back."""
    docs = load_table(spark, "documents", sf_dir)
    hashed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    groups = D.exact_dedup_groups(docs, "doc_id", "text")
    return (
        hashed.join(groups, "content_hash")
        .select("doc_id", "keep_id", "n_members")
        .orderBy("doc_id")
    )


@register(
    "dedup_exact_normalized",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
      FROM documents)
    SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_members
    FROM hashed GROUP BY content_hash
    ORDER BY keep_id
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after canonicalization (lowercase + whitespace collapse
    + trim) — catches trivially-reformatted duplicates."""
    docs = load_table(spark, "documents", sf_dir)
    return D.exact_dedup_groups(docs, "doc_id", "text", normalized=True).orderBy("keep_id")


@register(
    "dedup_ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
    sh0 AS (SELECT doc_id,
                   unnest(list_distinct(list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
            FROM toks),
    rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM sh0 GROUP BY s) WHERE df <= 20),
    sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare USING (s)),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(1.0 * n_inter / (ca.n + cb.n - n_inter), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON doc_a = ca.doc_id
    JOIN cnt cb ON doc_b = cb.doc_id
    WHERE 1.0 * n_inter / (ca.n + cb.n - n_inter) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard ≥ 0.5 via shingle equi-join — the
    ground truth the approximate dedups are validated against.

    ``max_shingle_df=20`` drops boilerplate shingles before the pair
    join (the oracle applies the identical cap): every shingle then
    contributes ≤ C(20,2) candidate pairs, so join fan-out is linear in
    corpus size instead of quadratic on template text. Jaccard is
    computed over the capped shingle sets on both engines."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=20)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


@register("dedup_minhash_lsh_pairs")  # approximate → rows-only check
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(K=16)+LSH(4 bands × 4 rows) near-dup candidates with
    signature-estimated Jaccard ≥ 0.5. Deterministic (fixed hash seeds)
    but not ANSI-SQL-expressible → no oracle; recall vs. the exact
    Jaccard pairs is asserted in tests/test_dedup.py."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        D.minhash_lsh_pairs(docs, "doc_id", "text", k=16, bands=4, threshold=0.5)
        .select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_winnowing_pairs")  # hash-seeded scheme → rows-only check
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (window-min over shingle
    hashes) → candidate pairs sharing ≥3 fingerprints. Deterministic;
    recall vs. exact Jaccard asserted in tests/test_dedup_similarity.py."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        D.winnowing_candidate_pairs(docs, "doc_id", "text", n=3, window=4, min_shared=3)
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_simhash_pairs")  # approximate → rows-only check
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 (banded
    candidates, exact bit_count verification)."""
    docs = load_table(spark, "documents", sf_dir)
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).orderBy("doc_a", "doc_b")


@register(
    "dedup_cluster_canonical",
    oracle="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
    sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s FROM toks),
    rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM sh0 GROUP BY s) WHERE df <= 20),
    sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare USING (s)),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (SELECT doc_a, doc_b FROM p0
              JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
              WHERE 1.0 * n_inter / (ca.n + cb.n - n_inter) >= 0.5),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT src AS a, src AS b FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY doc_id
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization: connected components over the
    df-capped exact-Jaccard pairs (threshold 0.5) via distributed
    min-label propagation; cluster id = min doc id in the component
    (transitively: A~B, B~C collapse to one cluster even when A,C were
    never a pair). The oracle computes the same components with a
    recursive transitive-closure CTE."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=20)
    return D.connected_components(pairs).orderBy("doc_id")


@register(
    "dedup_jaccard_prefix_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(t) - 3),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
           FROM toks),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(1.0 * n_inter / (ca.n + cb.n - n_inter), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON doc_a = ca.doc_id
    JOIN cnt cb ON doc_b = cb.doc_id
    WHERE 1.0 * n_inter / (ca.n + cb.n - n_inter) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNCAPPED exact 5-gram Jaccard ≥ 0.5 pairs via prefix filtering
    (PPJoin) — same answer as a full shingle self-join, but the
    candidate join only touches each document's rarest
    ``|x| − ⌈τ|x|⌉ + 1`` shingles, so boilerplate shingles never fan
    out. The oracle is the PLAIN uncapped all-pairs SQL: the hash gate
    certifies that prefix filtering loses nothing. This is the exact
    dedup plan that survives 100 TB; ``dedup_ngram_jaccard_pairs``
    keeps the df-cap semantics twin."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = D.jaccard_prefix_pairs(docs, "doc_id", "text", n=5, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


@register(
    "corpus_clean_report_exact",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(t) - 3),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
           FROM toks),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              JOIN cnt ca ON a.doc_id = ca.doc_id
              JOIN cnt cb ON b.doc_id = cb.doc_id
              GROUP BY 1, 2
              HAVING 1.0 * count(*) / (any_value(ca.n) + any_value(cb.n) - count(*)) >= 0.5),
    und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.a, u.b FROM r JOIN und u ON r.b = u.a
      ) SELECT * FROM r
    ),
    clusters AS (
      SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
    ),
    hashed AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
      FROM documents),
    groups AS (SELECT content_hash, min(doc_id) AS keep_id
               FROM hashed GROUP BY content_hash),
    q AS (
      SELECT doc_id,
             (least(len(t) / 100.0, 1.0)
              + 1.0 - length(regexp_replace(text, '[\\w\\s]+', '', 'g')) * 1.0 / length(text)
              + least(len(list_filter(t, x -> x IN ('the','a','of','and','to')))
                      * 1.0 / len(t) * 5.0, 1.0)) / 3.0 AS quality
      FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)),
    verdicts AS (
      SELECT d.doc_id,
             CASE WHEN h.doc_id <> g.keep_id THEN 'exact'
                  WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id THEN 'near'
                  WHEN q.quality < 0.4371 THEN 'lowq'
                  ELSE 'clean' END AS verdict
      FROM documents d
      JOIN hashed h USING (doc_id)
      JOIN groups g USING (content_hash)
      LEFT JOIN clusters c ON c.doc_id = d.doc_id
      JOIN q ON q.doc_id = d.doc_id
    )
    SELECT verdict, CAST(count(*) AS BIGINT) AS n,
           md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_digest
    FROM verdicts GROUP BY verdict ORDER BY verdict
    """,
)
def corpus_clean_report_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus cleaning under ONE hash gate — the
    pipeline/corpus.clean_corpus composition (exact dedup → near dedup →
    quality filter, precedence exact > near > lowq) with the EXACT
    near-dup leg (prefix-filtered 5-gram Jaccard ≥ 0.5 + distributed
    connected components) so the whole multi-stage pipeline is
    SQL-replayable: the DuckDB twin recomputes the pair graph, takes
    its transitive closure with a RECURSIVE CTE, and reproduces the
    per-verdict membership digests — stage attribution certified to the
    exact document-id set, not just counts. Quality threshold 0.4371
    sits ≥4e-4 from every attainable score at all three SFs."""
    docs = load_table(spark, "documents", sf_dir)
    hashed = docs.select(
        "doc_id", F.md5(D.normalize_text("text")).alias("content_hash")
    )
    groups = D.exact_dedup_groups(docs, "doc_id", "text", normalized=True)
    pairs = D.jaccard_prefix_pairs(docs, "doc_id", "text", n=5, threshold=0.5)
    cc = D.connected_components(pairs)
    from weather_tools_spark.functions.text import quality_score

    q = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    verdicts = (
        docs.select("doc_id")
        .join(hashed, "doc_id")
        .join(groups.select("content_hash", "keep_id"), "content_hash")
        .join(cc.withColumnRenamed("cluster_id", "cl"), "doc_id", "left")
        .join(q, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("keep_id"), "exact")
            .when(F.col("cl").isNotNull() & (F.col("cl") != F.col("doc_id")), "near")
            .when(F.col("quality") < 0.4371, "lowq")
            .otherwise("clean")
            .alias("verdict"),
        )
    )
    return (
        verdicts.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list(F.col("doc_id"))))
            ).alias("ids_digest"),
        )
        .orderBy("verdict")
    )
