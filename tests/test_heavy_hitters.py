"""Heavy-hitters summary: merge exactness and the truncation guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_tools_spark.operators.heavyhitters import heavy_hitter_candidates


def _skewed_frame(spark):
    # 3 hot keys (5000/2500/1200 rows) over a 1000-key uniform tail
    hot = spark.range(8700).select(
        F.when(F.col("id") < 5000, "hot_a")
        .when(F.col("id") < 7500, "hot_b")
        .otherwise("hot_c")
        .alias("k")
    )
    tail = spark.range(20000).select(F.concat(F.lit("t"), (F.col("id") % 1000)).alias("k"))
    return hot.unionAll(tail).repartition(16)


def test_truncation_guarantee_keeps_all_heavy_keys(spark):
    df = _skewed_frame(spark)
    n = df.count()
    capacity = 8
    cand = heavy_hitter_candidates(df, "k", capacity=capacity).collect()
    got = {r.key: r.cnt_lb for r in cand}
    exact = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    threshold = n / capacity
    heavy = {k for k, c in exact.items() if c > threshold}
    assert heavy, "test frame must contain heavy keys"
    for k in heavy:
        assert k in got, f"heavy key {k} (freq {exact[k]} > {threshold}) missing"
    # merged counts are lower bounds, never overestimates
    for k, lb in got.items():
        assert lb <= exact[k], f"{k}: lb {lb} > exact {exact[k]}"


def test_full_capacity_reproduces_exact_counts(spark):
    df = _skewed_frame(spark)
    cand = {r.key: r.cnt_lb for r in heavy_hitter_candidates(df, "k", capacity=2048).collect()}
    exact = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert cand == exact
