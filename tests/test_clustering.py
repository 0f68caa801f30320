"""Clustering operator invariants (operators/clustering.py): the
distributed Lloyd's k-means must match an independent single-machine
numpy implementation step for step (same seeds/tie/empty-cluster
semantics), inertia must be non-increasing over iterations, and
SemDeDup's keep set must equal the brute-force within-cluster scan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.operators import clustering as C


def _numpy_lloyd(x: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Reference twin: identical schedule, written independently of the
    Spark kernels (plain loops, no shared code path)."""
    order = np.argsort(ids)
    seeds = x[order[:k]].astype(np.float64)
    cents = seeds.copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = x[m].mean(axis=0)
        cents = new
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d2.argmin(axis=1), d2.min(axis=1)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, "embeddings", sf_dir)
    pdf = df.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    return df, ids, x


def test_kmeans_matches_numpy_twin(spark, emb):
    df, ids, x = emb
    cents = np.asarray(C.kmeans_fit(df, k=4, iters=3))
    ref_cents, ref_a, _ = _numpy_lloyd(x, ids, 4, 3)
    assert np.abs(cents - ref_cents).max() < 1e-9
    assigned = C.kmeans_assign(df, cents.tolist()).toPandas().set_index("vec_id")
    got = assigned.loc[ids, "cluster"].to_numpy()
    assert (got == ref_a).all()


def test_kmeans_inertia_monotone(spark, emb):
    df, ids, x = emb
    inertias = []
    for iters in (0, 1, 2, 3, 4):
        cents, _, d2 = _numpy_lloyd(x, ids, 4, iters) if iters else (
            x[np.argsort(ids)[:4]], None, None)
        cs = C.kmeans_fit(df, k=4, iters=iters) if iters else C.seed_centroids(
            df, "vec_id", "embedding", 4)
        tot = C.kmeans_assign(df, cs).agg(F.sum("dist2")).collect()[0][0]
        inertias.append(tot)
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-9, inertias


def test_kmeans_empty_cluster_keeps_seed(spark):
    # two identical low-id seed points → one cluster necessarily empties
    # after the first update; its centroid must stay at the seed.
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [5.0, 6.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = C.kmeans_fit(df, k=2, iters=2)
    # iter 1: both seeds coincide → EVERY point ties → cluster 0 (low-id
    # tie rule); cluster 1 is empty and must keep its seed (0,0).
    # iter 2: the (0,0) points snap back to the preserved seed, the far
    # points stay with cluster 0 → c0 = mean((5,5),(5,6)) = (5, 5.5).
    assert cents[1] == [0.0, 0.0]
    assert cents[0] == [5.0, 5.5]


def test_semdedup_matches_bruteforce(spark, emb):
    df, ids, x = emb
    cents = C.kmeans_fit(df, k=4, iters=3)
    marked = C.semdedup(df, cents, threshold=0.45).toPandas().set_index("vec_id")
    _, a, _ = _numpy_lloyd(x, ids, 4, 3)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    # brute force: doc b is a dup iff any lower-id same-cluster doc has cos >= tau
    order = np.argsort(ids)
    expect = {}
    for c in range(4):
        idx = order[a[order] == c]
        for pos, j in enumerate(idx):
            earlier = idx[:pos]
            dup = bool(len(earlier)) and bool((u[earlier] @ u[j] >= 0.45).any())
            expect[ids[j]] = not dup
    for vid, keep in expect.items():
        assert bool(marked.loc[vid, "keep"]) == keep, vid
    # dedup must actually fire on this corpus at this threshold
    assert (~marked["keep"]).sum() > 0


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    from weather_tools_spark.operators.similarity import gram_matrix

    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)
    g = gram_matrix(df, "embedding", 8).toPandas().pivot(index="gi", columns="gj", values="g")
    expect = x.astype(np.float64).T @ x.astype(np.float64)
    assert np.allclose(g.to_numpy(), expect, rtol=0, atol=1e-9)
    # symmetric and complete
    assert g.shape == (8, 8)
    assert np.allclose(g.to_numpy(), g.to_numpy().T, rtol=0, atol=1e-9)


def test_pca_power_iteration_matches_numpy(spark):
    import numpy as np

    from weather_tools_spark.queries.similarity import (
        _PCA_D,
        _PCA_ITERS,
        _PCA_V0,
        ml_pca_power_iteration,
    )

    sf = "/root/testdata/sf0.001"
    out = ml_pca_power_iteration(spark, sf).toPandas()
    import pandas as pd
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    x = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    g = x.T @ x
    v = np.full(_PCA_D, _PCA_V0)
    for _ in range(_PCA_ITERS):
        w = g @ v
        nrm = np.sqrt((w * w).sum())
        v = w / nrm
    assert np.allclose(out.loading.to_numpy(), v, rtol=0, atol=1e-6)
    assert abs(out.eigenvalue.iloc[0] - nrm) < 1e-3


def test_power_iteration_converges_on_anisotropic_corpus(spark):
    # The registry corpus is isotropic (near-flat spectrum), so the
    # query certifies machinery, not convergence. Here: a corpus with a
    # strong dominant direction must converge to it in a few steps.
    import numpy as np

    from weather_tools_spark.operators.similarity import gram_matrix, power_iteration

    rng = np.random.default_rng(11)
    d, n = 8, 200
    direction = np.ones(d) / np.sqrt(d)
    x = (rng.normal(size=(n, 1)) * 6.0) @ direction[None, :] + rng.normal(
        size=(n, d)
    ) * 0.3
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(4)
    g = gram_matrix(df, "embedding", d)
    vdf, nrmdf = power_iteration(g, d, iters=5, v0=float(1 / np.sqrt(d)))
    v = vdf.orderBy("vi").toPandas().vv.to_numpy()
    lam = float(nrmdf.toPandas().nrm.iloc[0])
    gg = x.T @ x
    evals, evecs = np.linalg.eigh(gg)
    top = evecs[:, -1]
    assert abs(float(top @ v)) > 0.999
    assert abs(lam - evals[-1]) / evals[-1] < 1e-3
