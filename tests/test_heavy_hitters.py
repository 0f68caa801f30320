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


def test_mg_state_never_exceeds_bound():
    """Unit-level Misra-Gries invariants over a high-cardinality stream:
    state stays ≤ m after every batch, surviving counters are lower
    bounds, and every key above total/(m+1) survives."""
    from collections import Counter

    from weather_tools_spark.operators.heavyhitters import _mg_update

    m = 64
    counts: dict[str, int] = {}
    exact: Counter = Counter()
    # 40 batches of 5000 items: zipf-ish head + ever-fresh tail keys
    for b in range(40):
        batch = (
            ["hot_x"] * 600 + ["hot_y"] * 250 + ["hot_z"] * 120
            + [f"tail_{b}_{i}" for i in range(4030)]
        )
        exact.update(batch)
        bc = Counter(batch)
        counts = _mg_update(counts, bc.keys(), bc.values(), m)
        assert len(counts) <= m, f"state {len(counts)} exceeds bound {m} at batch {b}"
    n = sum(exact.values())
    for k, v in counts.items():
        assert v <= exact[k], f"{k}: counter {v} above true {exact[k]}"
    for k, c in exact.items():
        if c > n / (m + 1):
            assert k in counts, f"key {k} ({c} > n/(m+1)={n/(m+1):.0f}) evicted"


def test_high_cardinality_bounded_emission_keeps_heavy_keys(spark):
    """Spark-level: 50k+ distinct keys through capacity×state_factor=64
    summaries — emitted rows stay O(partitions × state bound) and the
    n/capacity heavy key is present with a valid lower bound."""
    hot = spark.range(6000).select(F.lit("mega_hot").alias("k"))
    tail = spark.range(50000).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
    df = hot.unionAll(tail).repartition(16)
    n = 56000
    capacity, state_factor = 16, 4
    out = heavy_hitter_candidates(df, "k", capacity=capacity, state_factor=state_factor)
    rows = out.collect()
    assert len(rows) <= 16 * capacity * state_factor
    got = {r.key: r.cnt_lb for r in rows}
    assert "mega_hot" in got  # 6000 > n/capacity = 3500
    assert got["mega_hot"] <= 6000
    for k, lb in got.items():
        true = 6000 if k == "mega_hot" else 1
        assert lb <= true
