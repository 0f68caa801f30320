"""End-to-end training-corpus cleaning pipeline — the composition story
for the LLM-data operators: exact dedup → near dedup → quality filter,
with observable per-stage metrics.

Each stage is one of the already-tested operators; this module wires
them the way a production pipeline would, keeping everything lazy until
one action and reporting what each stage removed via a single
reconciliation aggregate (no per-stage count() jobs in the hot path —
stage attribution rides one pass).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_tools_spark.functions.text import quality_score
from weather_tools_spark.operators import dedup as D


@dataclass
class CleanReport:
    n_input: int
    n_exact_dups: int
    n_near_dups: int
    n_low_quality: int
    n_clean: int


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.5,
) -> tuple[DataFrame, CleanReport]:
    """Returns (clean_docs, report).

    Removal policy (standard corpus hygiene):
    - exact duplicates (normalized hash): keep the min-id representative;
    - near duplicates (MinHash-LSH candidates at ``jaccard_threshold``):
      drop the higher id of each pair (keep-first);
    - documents scoring below ``min_quality``.

    Stage attribution is computed with ONE labeled pass: each removal
    set is a key-frame anti-joined/flagged onto the corpus, then a
    single aggregation counts per-stage drops.
    """
    # exact: non-representative members of each hash group
    groups = D.exact_dedup_groups(docs, id_col, text_col, normalized=True)
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(D.normalize_text(text_col)).alias("content_hash"),
    )
    exact_drop = (
        hashed.join(groups, "content_hash")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    # near: cluster the LSH candidate pairs into connected components
    # and keep ONE survivor (min id) per component — pair-local
    # keep-first can strand a doc whose only neighbors have higher ids
    # even though its cluster already has a canonical survivor
    near_pairs = D.minhash_lsh_pairs(docs, id_col, text_col, threshold=jaccard_threshold)
    near_drop = (
        D.connected_components(near_pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    # quality
    scored = docs.select(
        F.col(id_col).alias("doc_id"), quality_score(F.col(text_col)).alias("q")
    )
    low_q = scored.filter(F.col("q") < min_quality).select("doc_id")

    flagged = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(exact_drop.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near_drop.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .join(low_q.withColumn("is_lowq", F.lit(1)), "doc_id", "left")
    )
    # precedence: exact > near > quality (a doc counts once)
    attributed = flagged.select(
        "doc_id",
        F.when(F.col("is_exact") == 1, "exact")
        .when(F.col("is_near") == 1, "near")
        .when(F.col("is_lowq") == 1, "lowq")
        .otherwise("clean")
        .alias("verdict"),
    )
    from weather_tools_spark.operators.bounded import bounded_rows

    counts = {
        r.verdict: r.n
        for r in bounded_rows(
            attributed.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")),
            4,
            "clean-report verdict counts (4 fixed verdict values)",
        )
    }
    report = CleanReport(
        n_input=sum(counts.values()),
        n_exact_dups=counts.get("exact", 0),
        n_near_dups=counts.get("near", 0),
        n_low_quality=counts.get("lowq", 0),
        n_clean=counts.get("clean", 0),
    )
    keep = attributed.filter(F.col("verdict") == "clean").select(
        F.col("doc_id").alias("__keep_id")
    )
    clean = docs.join(keep, F.col(id_col) == F.col("__keep_id"), "left_semi")
    return clean, report
