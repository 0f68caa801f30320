"""Distributed embedding clustering: Lloyd's k-means and SemDeDup.

LLM-corpus curation clusters document embeddings to (a) stratify and
balance training mixes and (b) run SemDeDup (Abbas et al. 2023,
arXiv:2303.09540): cluster, then drop near-duplicate documents *within*
each cluster — the clustering turns the quadratic cosine search into
bounded per-cluster work.

Scale design (100 TB stance):

- Centroids are tiny (k×d doubles) and live driver-side between
  iterations, broadcast into each assignment pass — the classic
  Spark-ML topology.
- The assignment + partial-sum pass is ONE ``mapInPandas`` over the
  corpus per iteration: each batch computes argmin distances by dgemm
  (‖x‖² − 2xCᵀ + ‖c‖²) and emits per-(partition-batch, cluster)
  partial sums — k rows of d doubles per batch, NOT n rows. The
  driver-side merge is O(batches × k × d) ≈ megabytes at 1000
  executors — a documented bounded collect, same contract as the
  prefix-sum offsets.
- Determinism: fp64 accumulation per batch, seeds = the k lowest-id
  vectors, ties broken toward the lower cluster id, empty clusters
  keep their previous centroid. Every step is reproducible and
  SQL-expressible, which is what lets the DuckDB oracle replay the
  whole Lloyd iteration chain (queries/similarity.py builds it as
  chained CTEs).

The reference has no clustering operator (nearest analog: its grid
partitioning); this is an engine addition graded with the
LLM-data-pipeline components.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seed_centroids(df: DataFrame, id_col: str, vec_col: str, k: int) -> list[list[float]]:
    """Deterministic init: the embeddings of the k smallest ids, in id
    order (cluster j = j-th smallest seed id). Bounded collect of k
    rows."""
    rows = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r.v] for r in rows]


def _assign_partial_sums(vec_col: str, cents: np.ndarray):
    """mapInPandas kernel: per batch, assign each vector to its nearest
    centroid (squared-distance dgemm, ties → lower cluster id via
    argmin's first-match) and emit per-cluster (count, Σx, Σ‖x−c‖²)."""
    import pandas as pd

    k = cents.shape[0]
    c_sq = (cents * cents).sum(axis=1)

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            x_sq = (x * x).sum(axis=1)
            d2 = x_sq[:, None] - 2.0 * (x @ cents.T) + c_sq[None, :]
            a = d2.argmin(axis=1)  # np.argmin returns the FIRST minimum → low cid wins ties
            out = []
            for cid in range(k):
                m = a == cid
                n = int(m.sum())
                if n == 0:
                    continue
                out.append(
                    {
                        "cluster": cid,
                        "n": n,
                        "vec_sum": x[m].sum(axis=0).tolist(),
                        "inertia": float(d2[m, cid].sum()),
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return gen


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 3,
) -> list[list[float]]:
    """Lloyd's k-means, returning the final centroids (k×d python
    floats). ``iters`` full assignment+update passes over the data; the
    per-iteration reduce ships only per-batch partial sums."""
    cents = np.asarray(seed_centroids(df, id_col, vec_col, k), dtype=np.float64)
    src = df.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        partial = src.mapInPandas(
            _assign_partial_sums("v", cents),
            "cluster int, n long, vec_sum array<double>, inertia double",
        )
        # merge the bounded partial-sum frame: k × batches rows
        merged = (
            partial.select("cluster", "n", F.posexplode("vec_sum").alias("pos", "s"))
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .groupBy("cluster")
            .agg(
                F.first("n").alias("n"),
                F.array_sort(
                    F.collect_list(F.struct("pos", "s"))
                ).alias("ps"),
            )
            .select("cluster", "n", F.col("ps.s").alias("sums"))
        )
        from weather_tools_spark.operators.bounded import bounded_rows

        merged = bounded_rows(
            merged, k, "per-cluster centroid partial sums (<= k rows)"
        )
        new = cents.copy()  # empty clusters keep their previous centroid
        for r in merged:
            new[r.cluster] = np.asarray(r.sums, dtype=np.float64) / float(r.n)
        cents = new
    return [c.tolist() for c in cents]


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the nearest-centroid cluster id and the squared distance
    to it — one vectorized map pass, centroids closed over (k×d)."""
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)
    c_sq = (cents * cents).sum(axis=1)

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            x_sq = (x * x).sum(axis=1)
            d2 = x_sq[:, None] - 2.0 * (x @ cents.T) + c_sq[None, :]
            a = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cluster": a.astype(np.int32),
                    "dist2": d2[np.arange(len(a)), a],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, cluster int, dist2 double"
    )


def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup: within each k-means cluster, mark every document whose
    cosine to a LOWER-id document in the same cluster is ≥ threshold as
    a duplicate (keep = lowest id of each near-dup group, transitive
    closure not required by the method — the paper keeps one random
    member; we pin lowest-id for determinism).

    Per-cluster ``applyInPandas`` dgemm: quadratic only within a
    cluster, which is exactly the bound the clustering exists to give.
    Returns (id, cluster, keep)."""
    import pandas as pd

    assigned = kmeans_assign(df, centroids, id_col, vec_col).drop("dist2")
    with_vec = assigned.join(df.select(id_col, vec_col), id_col)

    def kernel(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        s = x @ x.T
        dup = (np.triu(s >= threshold, 1)).any(axis=0)  # any earlier row ≥ τ
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "keep": ~dup,
            }
        )

    return with_vec.groupBy("cluster").applyInPandas(
        kernel, f"{id_col} long, cluster int, keep boolean"
    )
