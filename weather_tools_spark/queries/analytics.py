"""Analytics wave 5 — graph shortest paths with path counting, a
two-stage distributed skyline, time-series autocorrelation, and a
Benford-law data-quality audit.

Every query is oracle-gated: the DuckDB twin replays the full
computation (the BFS oracle re-runs every frontier expansion as chained
CTEs; the skyline oracle is the plain NOT-EXISTS dominance definition,
so the hash gate proves the two-stage bucket prune is lossless)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register

# ---------------------------------------------------------------------------
# Unweighted shortest paths with shortest-path counting (layered BFS)
# ---------------------------------------------------------------------------

_SP_SOURCE = 0     # BFS source nation
_SP_TOPK = 3       # out-degree cap that sparsifies the dense trade graph
_SP_LEVELS = 4     # frontier expansions replayed by the oracle


def _sp_edges_sql() -> str:
    """Edge list: customer-nation -> supplier-nation trade graph, kept
    sparse by retaining each source's top-k out-edges by routed lineitem
    count (ties broken on destination)."""
    return f"""
    raw AS (
      SELECT c_nationkey AS src, s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY c_nationkey, s_nationkey
    ),
    e AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
        FROM raw
      ) WHERE rk <= {_SP_TOPK}
    )"""


def _sp_bfs_sql() -> str:
    """Chained-CTE replay of every BFS level: frontier L+1 = unreached
    out-neighbors of the level-L frontier, shortest-path count = sum of
    predecessor counts."""
    parts = [
        f"r0 AS (SELECT {_SP_SOURCE} AS nk, 0 AS dist, CAST(1 AS BIGINT) AS npaths)"
    ]
    for lvl in range(1, _SP_LEVELS + 1):
        prev = f"r{lvl - 1}"
        parts.append(f"""
    f{lvl} AS (
      SELECT e.dst AS nk, {lvl} AS dist, CAST(sum(r.npaths) AS BIGINT) AS npaths
      FROM {prev} r JOIN e ON r.nk = e.src
      WHERE r.dist = {lvl - 1}
        AND e.dst NOT IN (SELECT nk FROM {prev})
      GROUP BY e.dst
    ),
    r{lvl} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM f{lvl})""")
    return ",\n".join(parts)


@register(
    "graph_shortest_paths",
    oracle=f"""
    WITH {_sp_edges_sql()},
    {_sp_bfs_sql()}
    SELECT nk AS nationkey, dist, npaths
    FROM r{_SP_LEVELS}
    ORDER BY dist, nationkey
    """,
)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted single-source shortest paths WITH shortest-path
    counting (the betweenness-centrality forward pass) over the
    customer-nation -> supplier-nation trade graph, kept sparse by a
    per-source top-k out-edge cap so multi-hop structure actually
    exists. Layered BFS: frontier L+1 = LEFT-ANTI(unreached) neighbors
    of frontier L, npaths = sum over predecessors — each level is one
    join + one map-combinable aggregation on the TINY aggregated graph
    (<= |nations|^2 edges); the expensive stage is the fully
    distributed fact-join edge build, exactly like graph_pagerank.
    The oracle replays every frontier expansion as chained CTEs, so the
    hash gate certifies the iteration schedule itself (fifth iterative
    algorithm under the oracle, after k-means, PageRank, label
    propagation, and parcel advection)."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    raw = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wk = Window.partitionBy("src").orderBy(F.col("w").desc(), "dst")
    edges = (
        raw.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _SP_TOPK)
        .select("src", "dst")
        .persist()
    )
    reached = spark.createDataFrame(
        [(_SP_SOURCE, 0, 1)], "nk INT, dist INT, npaths BIGINT"
    )
    for lvl in range(1, _SP_LEVELS + 1):
        frontier = (
            reached.filter(F.col("dist") == lvl - 1)
            .join(edges, F.col("nk") == F.col("src"))
            .join(reached.select(F.col("nk").alias("dst")), "dst", "left_anti")
            .groupBy("dst")
            .agg(F.sum("npaths").alias("npaths"))
            .select(
                F.col("dst").alias("nk"),
                F.lit(lvl).cast("int").alias("dist"),
                F.col("npaths").cast("long").alias("npaths"),
            )
        )
        reached = reached.unionByName(frontier)
    return reached.select(
        F.col("nk").cast("int").alias("nationkey"), "dist", "npaths"
    ).orderBy("dist", "nationkey")


# ---------------------------------------------------------------------------
# Two-stage distributed skyline (Pareto frontier)
# ---------------------------------------------------------------------------

_SKY_BUCKETS = 16


@register(
    "analytics_skyline_parts",
    oracle="""
    WITH pts AS (
      SELECT p_retailprice AS price, p_size AS size,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(min(p_partkey) AS BIGINT) AS min_partkey
      FROM part GROUP BY p_retailprice, p_size
    )
    SELECT price, size, n_parts, min_partkey
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price <= p.price AND q.size >= p.size
        AND (q.price < p.price OR q.size > p.size)
    )
    ORDER BY price
    """,
)
def analytics_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the set of (price, size) points
    where no other part is both cheaper-or-equal AND larger-or-equal
    (strictly better in one) — minimize p_retailprice, maximize p_size.

    Classic distributed skyline topology: stage 1 computes a LOCAL
    skyline per hash bucket with a bucket-PARTITIONED window (sort by
    price asc, size desc; a point survives iff its size exceeds the
    running max over all strictly-preceding points — exact for distinct
    (price,size) pairs under this order); stage 2 takes the exact
    skyline of the survivor union. Dominance is a strict partial order,
    so every globally non-dominated point is locally non-dominated
    (survives stage 1) and every dominated survivor is eliminated by a
    maximal element in stage 2 — the result is bucket-invariant, which
    is exactly what the plain NOT-EXISTS oracle certifies. Survivors
    are O(buckets * skyline) — expected O(log n) skyline points per
    bucket on anti-correlated-free data — so the stage-2 global window
    runs on a tiny frame (same bounded contract as the KM curve).
    """
    part = load_table(spark, "part", sf_dir)
    pts = part.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    )

    def local_skyline(df: DataFrame, *partition_cols: str) -> DataFrame:
        w = (
            Window.partitionBy(*partition_cols)
            if partition_cols
            else Window.partitionBy(F.lit(1))
        )
        w = w.orderBy(F.col("price").asc(), F.col("size").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        runmax = F.max("size").over(w)
        return df.withColumn("runmax", runmax).filter(
            F.col("runmax").isNull() | (F.col("size") > F.col("runmax"))
        ).drop("runmax")

    bucketed = pts.withColumn("bkt", F.pmod(F.hash("price", "size"), F.lit(_SKY_BUCKETS)))
    survivors = local_skyline(bucketed, "bkt").drop("bkt")
    return local_skyline(survivors).orderBy("price")


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily event-count series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@register(
    "events_autocorrelation",
    oracle=f"""
    WITH days AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    m AS (SELECT avg(x) AS mu FROM days),
    stats AS (
      SELECT m.mu, sum((d.x - m.mu) * (d.x - m.mu)) AS ss
      FROM days d CROSS JOIN m GROUP BY m.mu
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    num AS (
      SELECT l.lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             sum((a.x - s.mu) * (b.x - s.mu)) AS cov
      FROM lags l
      JOIN days a ON TRUE
      JOIN days b ON b.day = a.day + l.lag
      CROSS JOIN stats s
      GROUP BY l.lag
    )
    SELECT n.lag, n.n_pairs, round(n.cov / s.ss, 6) AS acf
    FROM num n CROSS JOIN stats s
    ORDER BY n.lag
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..7 (the standard ACF with population centering: acf(k) =
    sum (x_t - mu)(x_{t+k} - mu) / sum (x_t - mu)^2) — the
    periodicity-detection readout behind seasonality diagnostics. The
    series is first reduced to <= horizon-days rows (map-combinable
    count), so the lag self-join and the mean/SS scalars all run on a
    tiny frame with broadcast scalars; nothing here touches the events
    fact more than once."""
    ev = load_table(spark, "events", sf_dir)
    days = (
        ev.groupBy(
            F.floor(F.unix_micros("ts") / 1_000_000.0 / 86400.0)
            .cast("long")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .persist()
    )
    mu = days.agg(F.avg("x").alias("mu"))
    stats = (
        days.crossJoin(F.broadcast(mu))
        .groupBy("mu")
        .agg(F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))).alias("ss"))
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = days.select(F.col("day").alias("day_a"), F.col("x").alias("xa"))
    b = days.select(F.col("day").alias("day_b"), F.col("x").alias("xb"))
    num = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("day_b") == F.col("day_a") + F.col("lag"))
        .crossJoin(F.broadcast(stats))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("xa") - F.col("mu")) * (F.col("xb") - F.col("mu"))).alias("cov"),
        )
    )
    return (
        num.crossJoin(F.broadcast(stats.select("ss")))
        .select("lag", "n_pairs", F.round(F.col("cov") / F.col("ss"), 6).alias("acf"))
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Benford first-digit data-quality audit
# ---------------------------------------------------------------------------

# Benford expected share per leading digit: log10(1 + 1/d). Precomputed
# double literals so Spark SQL never parses them as DECIMAL (recorded
# lesson: inline decimals drift from DuckDB doubles in the last ulp).
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _benford_case_sql(col: str) -> str:
    arms = " ".join(
        f"WHEN {col} = {d} THEN {share!r}" for d, share in _BENFORD.items()
    )
    return f"CASE {arms} END"


@register(
    "dq_benford_first_digit",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders
    ),
    digits AS (
      SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM cents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM digits)
    SELECT d.digit, d.n,
           round(d.n / t.total, 6) AS obs_share,
           round({_benford_case_sql('d.digit')}, 6) AS exp_share,
           round(
             (d.n - t.total * {_benford_case_sql('d.digit')})
             * (d.n - t.total * {_benford_case_sql('d.digit')})
             / (t.total * {_benford_case_sql('d.digit')}), 6) AS chi2_term
    FROM digits d CROSS JOIN tot t
    ORDER BY d.digit
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of o_totalprice —
    the classic fabricated-data / unit-mixing detector in DQ suites.
    The leading digit is extracted in the exact integer domain
    (cent-integers cast to string; integer-to-string is engine-exact,
    unlike log10-of-double whose last-ulp drift could flip a floor),
    the per-digit histogram is one map-combinable aggregation, and the
    chi-square terms against the precomputed log10(1+1/d) double
    literals attach via a single broadcast scalar."""
    orders = load_table(spark, "orders", sf_dir)
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    )
    digits = (
        cents.select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # total via a global window over the <=9-row digit histogram: keeps
    # the orders scan single-pass (a second agg branch would re-scan)
    tot_w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    exp_share = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(share))
            for d, share in _BENFORD.items()
        ]
    )
    exp_n = F.col("total") * exp_share
    return (
        digits.withColumn("total", F.sum("n").over(tot_w).cast("double"))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("obs_share"),
            F.round(exp_share, 6).alias("exp_share"),
            F.round((F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n, 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )
