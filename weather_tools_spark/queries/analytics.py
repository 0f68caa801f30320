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
from weather_tools_spark.operators.bounded import bounded_rows
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
    count (ties broken on destination).

    Both CTEs are MATERIALIZED: every graph oracle references ``e``
    more than once (self-joins, NOT EXISTS probes, chained BFS levels),
    and DuckDB inlines non-materialized CTEs per reference — so the
    fact-scale 4-way join was re-evaluated once per reference
    (exponentially through chained levels; the harmonic-centrality
    oracle measured 46.7 s -> 0.2 s at the 100x store from this hint
    alone). Evaluation-only: results are identical."""
    return f"""
    raw AS MATERIALIZED (
      SELECT c_nationkey AS src, s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY c_nationkey, s_nationkey
    ),
    e AS MATERIALIZED (
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
        # r{lvl} MATERIALIZED: each level is referenced twice by the
        # next (frontier scan + NOT IN probe) — same inline-blowup as
        # _sp_edges_sql, see its docstring.
        parts.append(f"""
    f{lvl} AS (
      SELECT e.dst AS nk, {lvl} AS dist, CAST(sum(r.npaths) AS BIGINT) AS npaths
      FROM {prev} r JOIN e ON r.nk = e.src
      WHERE r.dist = {lvl - 1}
        AND e.dst NOT IN (SELECT nk FROM {prev})
      GROUP BY e.dst
    ),
    r{lvl} AS MATERIALIZED
      (SELECT * FROM {prev} UNION ALL SELECT * FROM f{lvl})""")
    return ",\n".join(parts)


def _sp_edge_rows(spark: SparkSession, sf_dir: str):
    """Bounded collect of the capped trade-graph edge list (<=
    |nations|·top-k = 75 rows at ANY data scale) — the shared driver
    summary the graph family's bounded post-processing folds over
    (graph_shortest_paths' documented contract; r12 optimization
    extends it to the non-iterative consumers whose nation-bounded
    relational tails cost 13-24 exchanges of pure stage overhead)."""
    return bounded_rows(
        _sp_edges_df(spark, sf_dir),
        75,
        "nation-graph edge summary (<= |nations| * _SP_TOPK = 75)",
    )


def _sp_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed edge build: fact-fact join aggregated
    map-combinably into <= |nations|^2 weighted edges, then the
    per-source top-k cap via a key-partitioned ranking window.
    Factored out so the plan-quality suite can pin its topology."""
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
    return (
        raw.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _SP_TOPK)
        .select("src", "dst")
    )


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
    exists. Layered BFS: frontier L+1 = unreached out-neighbors of
    frontier L, npaths = sum over predecessors. The EXPENSIVE stage is
    the fully distributed fact-join edge build (map-combinable into
    <= |nations|^2 rows, exactly like graph_pagerank); the frontier
    schedule then runs on the COLLECTED edge summary — a bounded
    collect of <= |nations| * topk rows, the same documented contract
    as the PageRank node count and the k-means centroid merge. (A
    DataFrame-join level loop is the right shape when the vertex set
    exceeds driver memory, but on an aggregated dimension-sized graph
    it pays ~10 s of per-level stage overhead to shuffle 25-row
    frames — measured 14 s vs 1.5 s at sf0.01.) The oracle replays
    every frontier expansion as chained CTEs, so the hash gate
    certifies the iteration schedule itself (fifth iterative algorithm
    under the oracle, after k-means, PageRank, label propagation, and
    parcel advection)."""
    edge_rows = bounded_rows(
        _sp_edges_df(spark, sf_dir), 75,
        "nation-graph edge summary (<= |nations| * _SP_TOPK = 75)",
    )
    out_adj: dict[int, list[int]] = {}
    for r in edge_rows:
        out_adj.setdefault(int(r.src), []).append(int(r.dst))
    reached: dict[int, tuple[int, int]] = {_SP_SOURCE: (0, 1)}
    frontier = [_SP_SOURCE]
    for lvl in range(1, _SP_LEVELS + 1):
        counts: dict[int, int] = {}
        for nk in frontier:
            npaths = reached[nk][1]
            for dst in out_adj.get(nk, ()):
                if dst not in reached:
                    counts[dst] = counts.get(dst, 0) + npaths
        for dst, c in counts.items():
            reached[dst] = (lvl, c)
        frontier = sorted(counts)
    rows = [(nk, d, c) for nk, (d, c) in reached.items()]
    return spark.createDataFrame(
        rows, "nationkey INT, dist INT, npaths BIGINT"
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


# ---------------------------------------------------------------------------
# Semi-structured JSON property extraction
# ---------------------------------------------------------------------------


@register(
    "events_json_native_extract",
    oracle="""
    WITH k AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(kv) AS BIGINT) AS n_present,
           CAST(sum(kv) AS BIGINT) AS sum_k,
           CAST(min(kv) AS BIGINT) AS min_k,
           CAST(max(kv) AS BIGINT) AS max_k,
           round(sum(kv) * 1.0 / count(kv), 6) AS avg_k
    FROM k GROUP BY event_type ORDER BY event_type
    """,
)
def events_json_native_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via NATIVE JSON path evaluation:
    pull the integer property ``$.k`` out of the JSON ``props`` column
    with Spark ``get_json_object`` (JVM-side Jackson) against DuckDB
    ``json_extract_string`` — the real JSON engines on both sides,
    complementing events_json_props_extract's dialect-neutral regexp
    variant — and aggregate per event type.
    The JSON parse happens inside the single fact scan; everything after
    is one map-combinable aggregation. The average is computed as
    exact-integer sum / exact-integer count — one correctly-rounded
    division, so the 6-decimal round can never sit on an engine-drift
    boundary."""
    ev = load_table(spark, "events", sf_dir)
    k = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("kv"),
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("kv").alias("n_present"),
            F.sum("kv").alias("sum_k"),
            F.min("kv").alias("min_k"),
            F.max("kv").alias("max_k"),
            F.round(F.sum("kv") * 1.0 / F.count("kv"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection in exact integer arithmetic
# ---------------------------------------------------------------------------

# Slack and alarm threshold as exact rational multiples of the series
# mean: kappa = mean/100, H = mean/50 (chosen so alarm AND quiet days
# both occur at every test SF — the flag's two branches are live under
# the gate). Scaling every term by 100*n_days keeps the whole
# recurrence in BIGINT — no float ever enters the comparison, so the
# alarm flag cannot flip on engine libm/summation-order drift; ANY
# integer margin is a safe margin.
_CUSUM_KAPPA_NUM = 1   # kappa = mean * 1/100
_CUSUM_KAPPA_DEN = 100
_CUSUM_H_NUM = 1       # H = mean * 1/50
_CUSUM_H_DEN = 50


@register(
    "events_cusum_changepoint",
    oracle=f"""
    WITH days AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM days
    ),
    scaled AS (
      -- y_scaled = (x - mean - kappa) * (den*n), all integer:
      --   den*n*x - den*s - num*s   with den=100, num=1
      SELECT d.day, d.x,
             {_CUSUM_KAPPA_DEN} * t.n * d.x
               - {_CUSUM_KAPPA_DEN} * t.s - {_CUSUM_KAPPA_NUM} * t.s AS y,
             t.n, t.s
      FROM days d CROSS JOIN tot t
    ),
    cum AS (
      SELECT day, x, n, s,
             sum(y) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM scaled
    ),
    cusum AS (
      SELECT day, x, n, s, m,
             m - least(0, min(m) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS c
      FROM cum
    )
    SELECT day, x,
           round(c / ({float(_CUSUM_KAPPA_DEN)!r} * n), 6) AS cusum,
           CASE WHEN c * {_CUSUM_H_DEN} > {_CUSUM_H_NUM} * {_CUSUM_KAPPA_DEN} * s
                THEN 1 ELSE 0 END AS alarm
    FROM cusum ORDER BY day
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector over the daily event-count
    series: S_t = max(0, S_{{t-1}} + x_t - mu - kappa), alarm when
    S_t > H (kappa = mu/100, H = mu/50). The max(0,...) recurrence is
    restated closed-form as M_t - min(0, min_{{j<=t}} M_j) over the
    prefix sums M — one ordered window pass, no iteration. Every term
    is scaled by 100*n_days so the entire recurrence runs in exact
    BIGINT arithmetic: the alarm comparison is integer-vs-integer and
    cannot flip on summation-order or libm drift (the float division
    appears only in the reported, rounded cusum value). The series is
    first reduced to <= horizon-days rows map-combinably; the global
    ordered window runs on that tiny frame (same bounded contract as
    the Kaplan-Meier curve)."""
    ev = load_table(spark, "events", sf_dir)
    days = ev.groupBy(
        F.floor(F.unix_micros("ts") / 1_000_000.0 / 86400.0).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    den, num, hn, hd = (
        _CUSUM_KAPPA_DEN,
        _CUSUM_KAPPA_NUM,
        _CUSUM_H_NUM,
        _CUSUM_H_DEN,
    )
    # totals via a full-frame window over the <= horizon-days frame: a
    # separate .agg branch would re-scan the events fact (two scans)
    wt = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = (
        days.withColumn("n", F.count(F.lit(1)).over(wt).cast("long"))
        .withColumn("s", F.sum("x").over(wt).cast("long"))
        .withColumn(
            "y", den * F.col("n") * F.col("x") - den * F.col("s") - num * F.col("s")
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = scaled.withColumn("m", F.sum("y").over(w))
    cusum = cum.withColumn("c", F.col("m") - F.least(F.lit(0), F.min("m").over(w)))
    return cusum.select(
        "day",
        "x",
        F.round(F.col("c") / (float(_CUSUM_KAPPA_DEN) * F.col("n")), 6).alias("cusum"),
        F.when(F.col("c") * hd > hn * den * F.col("s"), 1).otherwise(0).alias("alarm"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Weighted priority sampling (Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------

_PRIO_K = 24


@register(
    "sample_weighted_priority",
    oracle=f"""
    WITH pri AS (
      SELECT o_orderkey, o_totalprice AS w,
             o_totalprice /
               (('0x' || substr(md5('ps:' || CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT
                / 281474976710656.0) AS q
      FROM orders
    ),
    top1 AS (SELECT * FROM pri ORDER BY q DESC, o_orderkey LIMIT {_PRIO_K + 1}),
    tau AS (SELECT min(q) AS tau FROM top1),
    samp AS (SELECT * FROM pri ORDER BY q DESC, o_orderkey LIMIT {_PRIO_K})
    SELECT s.o_orderkey, round(s.w, 2) AS weight,
           round(greatest(s.w, t.tau), 4) AS est_weight
    FROM samp s CROSS JOIN tau t
    ORDER BY s.o_orderkey
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup): each order gets priority q = w/u with w
    its totalprice and u a deterministic 48-bit md5 fraction; the sample
    is the top-k by priority and each member's Horvitz-Thompson weight
    estimate is max(w, tau) with tau the (k+1)-th priority. u is an
    exact dyadic rational (48-bit integer / 2^48) and q is a single
    correctly-rounded IEEE division — no libm call anywhere — so both
    engines rank bit-identical priorities; no log()-of-uniform
    (Efraimidis-Spirakis keys) whose libm drift could flip adjacent
    ranks. The top-k is a distributed TakeOrdered (min-k merge per
    partition), never a global sort; tau attaches as a broadcast
    scalar. This is the corpus-subsampling stage of a training-data
    pipeline with per-document importance weights."""
    orders = load_table(spark, "orders", sf_dir)
    u = F.expr(
        "cast(conv(substr(md5(concat('ps:', cast(o_orderkey as string))), 1, 12),"
        " 16, 10) as bigint)"
    ) / F.lit(float(1 << 48))
    pri = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("w"),
        (F.col("o_totalprice") / u).alias("q"),
    )
    top1 = pri.orderBy(F.col("q").desc(), "o_orderkey").limit(_PRIO_K + 1)
    tau = top1.agg(F.min("q").alias("tau"))
    samp = pri.orderBy(F.col("q").desc(), "o_orderkey").limit(_PRIO_K)
    return (
        samp.crossJoin(F.broadcast(tau))
        .select(
            "o_orderkey",
            F.round("w", 2).alias("weight"),
            F.round(F.greatest(F.col("w"), F.col("tau")), 4).alias("est_weight"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Geohash encoding in the exact dyadic domain
# ---------------------------------------------------------------------------

_GH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_CHARS = 5  # 25 bits: 13 lon + 12 lat


def _gh_b32_sql(num_expr: str, nchars: int) -> str:
    """Base32-encode the top `nchars` chars of a 25-bit cell number.
    The alphabet is ASCII-ascending, so lexicographic geohash order ==
    numeric cellnum order — which is why min(cellnum) (a hash-aggregable
    BIGINT buffer) can replace min(geohash) (a string buffer that would
    force SortAggregate over the whole fact)."""
    chars = [
        f"substr('{_GH_BASE32}',"
        f" CAST(CAST(floor(({num_expr}) / {32 ** (4 - m)}) AS BIGINT) % 32"
        f" AS INTEGER) + 1, 1)"
        for m in range(nchars)
    ]
    return "(" + " || ".join(chars) + ")"


def _gh_cellnum_expr(lon_frac: str, lat_frac: str) -> str:
    """The 25-bit geohash cell number as one integer: every
    interleaved bit (lon-first, the standard layout) shifted into
    place. Bit j of a fraction t is floor(t * 2^(j+1)) % 2 — and
    because t here is an exact 48-bit dyadic rational and multiplying a
    double by a power of two only shifts the exponent (never rounds),
    the floor argument is exact, so no bit can land on an
    engine-dependent rounding boundary. Summed per prefix group, the
    cell number hash-gates EVERY point's complete encoding even when
    the group key is only the 2-char prefix."""
    terms = []
    for g in range(5 * _GH_CHARS):
        t = lon_frac if g % 2 == 0 else lat_frac
        j = g // 2
        terms.append(
            f"(CAST(floor({t} * {1 << (j + 1)}) AS BIGINT) % 2)"
            f" * {1 << (5 * _GH_CHARS - 1 - g)}"
        )
    return " + ".join(terms)


@register(
    "geo_geohash_cells",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             ('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
               / 281474976710656.0 AS tlon,
             ('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
               / 281474976710656.0 AS tlat
      FROM customer
    ),
    hashed AS (
      SELECT c_custkey, tlon, tlat,
             {_gh_cellnum_expr("tlon", "tlat")} AS cellnum
      FROM pts
    ),
    cells AS (
      SELECT CAST(floor(cellnum / 32768) AS BIGINT) AS cell2num,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(min(c_custkey) AS BIGINT) AS min_custkey,
             CAST(min(cellnum) AS BIGINT) AS min_cellnum,
             CAST(sum(cellnum) AS BIGINT) AS sum_cellnum,
             round(min(tlon) * 360 - 180, 6) AS min_lon,
             round(min(tlat) * 180 - 90, 6) AS min_lat
      FROM hashed GROUP BY 1
    )
    SELECT {_gh_b32_sql("cell2num * 32768", 2)} AS cell2,
           n_customers, min_custkey,
           {_gh_b32_sql("min_cellnum", 5)} AS first_geohash,
           sum_cellnum, min_lon, min_lat
    FROM cells
    ORDER BY cell2
    """,
)
def geo_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash spatial bucketing: encode deterministic per-customer
    points to 5-character geohashes (the standard lon-first
    bit-interleaved base32 encoding) and census the occupied cells at
    the 2-character prefix level — the hierarchical prefix-joinable
    cell index used for spatial partitioning and neighbor search at
    scale (a coarser cell is literally a prefix of a finer one). The
    per-group sum of exact 25-bit cell numbers hash-gates EVERY point's
    full-precision encoding, not just the group keys. The bit
    extraction runs in the exact dyadic domain: each coordinate is a
    48-bit md5 fraction, so floor(t * 2^j) is exact and both engines
    produce identical bits (no degree-domain division whose rounding
    could straddle a cell boundary). Encoding is a pure JVM column
    expression inside the single scan; the census is one
    map-combinable aggregation on the cell key."""
    cust = load_table(spark, "customer", sf_dir)

    def frac(tag: str) -> str:
        # divide by CAST(2^48 AS DOUBLE): an inline 281474976710656.0
        # literal parses as DECIMAL in Spark SQL (recorded lesson) and
        # would drag the whole expression into decimal arithmetic
        return (
            f"(cast(conv(substr(md5(concat('{tag}:', cast(c_custkey as string))),"
            f" 1, 12), 16, 10) as bigint) / cast({1 << 48} as double))"
        )

    tlon, tlat = frac("lon"), frac("lat")
    pts = cust.select(
        "c_custkey",
        F.expr(tlon).alias("tlon"),
        F.expr(tlat).alias("tlat"),
    )
    cellnum = F.expr(_gh_cellnum_expr("tlon", "tlat"))
    cells = (
        pts.withColumn("cellnum", cellnum)
        .groupBy(F.expr("cast(floor(cellnum / 32768) as bigint)").alias("cell2num"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
            F.min("cellnum").cast("long").alias("min_cellnum"),
            F.sum("cellnum").cast("long").alias("sum_cellnum"),
            F.round(F.min("tlon") * 360 - 180, 6).alias("min_lon"),
            F.round(F.min("tlat") * 180 - 90, 6).alias("min_lat"),
        )
    )
    return cells.select(
        F.expr(_gh_b32_sql("cell2num * 32768", 2)).alias("cell2"),
        "n_customers",
        "min_custkey",
        F.expr(_gh_b32_sql("min_cellnum", 5)).alias("first_geohash"),
        "sum_cellnum",
        "min_lon",
        "min_lat",
    ).orderBy("cell2")


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


# ---------------------------------------------------------------------------
# Largest-remainder allocation (exact integer proration)
# ---------------------------------------------------------------------------


@register(
    "finance_largest_remainder_allocation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS w
      FROM lineitem
    ),
    o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS t
      FROM orders
    ),
    j AS (
      SELECT li.l_orderkey, li.l_linenumber, li.w, o.t, o.o_orderpriority,
             sum(li.w) OVER (PARTITION BY li.l_orderkey) AS wsum
      FROM li JOIN o ON li.l_orderkey = o.o_orderkey
    ),
    base AS (
      SELECT *,
             CAST(floor((t * w) / wsum) AS BIGINT) AS base_cents,
             (t * w) % wsum AS rem
      FROM j
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk,
             t - sum(base_cents) OVER (PARTITION BY l_orderkey) AS shortfall
      FROM base
    ),
    alloc AS (
      SELECT o_orderpriority, l_orderkey, t,
             base_cents + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS alloc_cents,
             CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS bumped
      FROM ranked
    ),
    per_order AS (
      SELECT o_orderpriority, l_orderkey,
             max(t) AS t, sum(alloc_cents) AS allocated, sum(bumped) AS n_bumped,
             count(*) AS n_items
      FROM alloc GROUP BY 1, 2
    )
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_items) AS BIGINT) AS n_lineitems,
           CAST(sum(t) AS BIGINT) AS total_cents,
           CAST(sum(allocated) AS BIGINT) AS allocated_cents,
           CAST(sum(n_bumped) AS BIGINT) AS n_bumped,
           CAST(sum(CASE WHEN allocated <> t THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched
    FROM per_order
    GROUP BY 1 ORDER BY priority
    """,
)
def finance_largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation: prorate each order's
    total cents across its lineitems proportional to extended price,
    in EXACT integer arithmetic — base share floor(t*w / W), then the
    per-order shortfall (at most items-1 cents) goes one cent each to
    the largest remainders, ties to the lower line number. The
    invariant sum(alloc) == total holds exactly per order and is
    emitted as n_mismatched (must be 0) — the property float proration
    cannot give. Topology: one equi-join, two key-partitioned windows
    on the fact, map-combinable rollups; products t*w stay under 2^53
    for TPC-H magnitudes and under BIGINT far beyond."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("w"),
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("t"),
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "wsum", F.sum("w").over(W.partitionBy("l_orderkey"))
    )
    base = j.withColumn(
        "base_cents", F.floor((F.col("t") * F.col("w")) / F.col("wsum")).cast("long")
    ).withColumn("rem", (F.col("t") * F.col("w")) % F.col("wsum"))
    ranked = base.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("l_orderkey").orderBy(F.col("rem").desc(), "l_linenumber")
        ),
    ).withColumn(
        "shortfall", F.col("t") - F.sum("base_cents").over(W.partitionBy("l_orderkey"))
    )
    alloc = ranked.select(
        "o_orderpriority",
        "l_orderkey",
        "t",
        (F.col("base_cents") + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)).alias(
            "alloc_cents"
        ),
        F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0).alias("bumped"),
    )
    per_order = alloc.groupBy("o_orderpriority", "l_orderkey").agg(
        F.max("t").alias("t"),
        F.sum("alloc_cents").alias("allocated"),
        F.sum("bumped").alias("n_bumped"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return (
        per_order.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").alias("n_lineitems"),
            F.sum("t").alias("total_cents"),
            F.sum("allocated").alias("allocated_cents"),
            F.sum("n_bumped").alias("n_bumped"),
            F.sum(F.when(F.col("allocated") != F.col("t"), 1).otherwise(0)).alias(
                "n_mismatched"
            ),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

_BS_B = 16
# Poisson(1) CDF thresholds as exact double literals: weight k is drawn
# when u lands in (P_{k-1}, P_k]; u is an exact dyadic md5 fraction, so
# the comparisons are deterministic in both engines.
_BS_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
]


def _bs_weight_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} <= {t!r} THEN {k}" for k, t in enumerate(_BS_POIS_CDF)
    )
    return f"CASE {arms} ELSE {len(_BS_POIS_CDF)} END"


@register(
    "stats_poisson_bootstrap_ci",
    oracle=f"""
    WITH draws AS (
      SELECT r.r, o.o_orderkey, o.o_totalprice AS x,
             {_bs_weight_sql("(('0x' || substr(md5('bs:' || CAST(r.r AS VARCHAR) || ':' || CAST(o.o_orderkey AS VARCHAR)), 1, 12))::BIGINT / 281474976710656.0)")} AS w
      FROM orders o
      CROSS JOIN (SELECT unnest(generate_series(0, {_BS_B - 1})) AS r) r
    ),
    means AS (
      SELECT r, CAST(sum(w) AS BIGINT) AS n_drawn,
             round(sum(w * x) / sum(w), 4) AS mean
      FROM draws GROUP BY r
    ),
    point AS (SELECT round(avg(o_totalprice), 4) AS pt FROM orders),
    ci AS (
      SELECT round(quantile_cont(mean, 0.05), 4) AS ci_low,
             round(quantile_cont(mean, 0.95), 4) AS ci_high
      FROM means
    )
    SELECT m.r AS resample, m.n_drawn, m.mean,
           p.pt AS point_estimate, c.ci_low, c.ci_high
    FROM means m CROSS JOIN point p CROSS JOIN ci c
    ORDER BY m.r
    """,
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value — THE distributed
    bootstrap: instead of materializing B resamples-with-replacement
    (impossible to coordinate across executors), each row draws an
    independent Poisson(1) replication weight per resample, which
    converges to multinomial resampling as n grows. Weights come from
    exact dyadic md5 fractions cut against precomputed Poisson-CDF
    double literals (deterministic CASE, no RNG state, reproducible on
    any cluster topology). The per-resample means reduce
    map-combinably; the 90% CI interpolates order statistics of the 16
    ROUNDED means (exact dyadic interpolation positions), so the gate
    is drift-free end to end. The fact is scanned once and exploded
    x16 map-side — no shuffle grows with B beyond the 16-group
    aggregate."""
    orders = load_table(spark, "orders", sf_dir)
    r = spark.range(_BS_B).select(F.col("id").cast("int").alias("r"))
    u = F.expr(
        "cast(conv(substr(md5(concat('bs:', cast(r as string), ':',"
        " cast(o_orderkey as string))), 1, 12), 16, 10) as bigint)"
        f" / cast({1 << 48} as double)"
    )
    w = F.coalesce(
        *[
            F.when(u <= F.lit(t), F.lit(k))
            for k, t in enumerate(_BS_POIS_CDF)
        ],
        F.lit(len(_BS_POIS_CDF)),
    )
    draws = orders.crossJoin(F.broadcast(r)).select(
        "r", F.col("o_totalprice").alias("x"), w.alias("w")
    )
    # persist the 16-row means frame: the CI branch would otherwise
    # re-derive it from the draws lineage and re-scan the fact
    means = (
        draws.groupBy("r")
        .agg(
            F.sum("w").cast("long").alias("n_drawn"),
            F.round(F.sum(F.col("w") * F.col("x")) / F.sum("w"), 4).alias("mean"),
        )
        .persist()
    )
    point = orders.agg(F.round(F.avg("o_totalprice"), 4).alias("point_estimate"))
    ci = means.agg(
        F.round(F.expr("percentile(mean, 0.05)"), 4).alias("ci_low"),
        F.round(F.expr("percentile(mean, 0.95)"), 4).alias("ci_high"),
    )
    return (
        means.crossJoin(F.broadcast(point))
        .crossJoin(F.broadcast(ci))
        .select(
            F.col("r").alias("resample"),
            "n_drawn",
            "mean",
            "point_estimate",
            "ci_low",
            "ci_high",
        )
        .orderBy("resample")
    )


# ---------------------------------------------------------------------------
# Privacy: differentially-private counts and k-anonymity audit
# ---------------------------------------------------------------------------

_DP_EPS = 0.5        # per-release epsilon
_DP_SCALE = 1.0 / _DP_EPS
_KANON_K = 20


@register(
    "privacy_dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS true_count
      FROM customer GROUP BY 1
    ),
    noise AS (
      SELECT segment, true_count,
             ('0x' || substr(md5('dp:' || segment), 1, 12))::BIGINT
               / 281474976710656.0 - 0.5 AS u
      FROM g
    )
    SELECT segment, true_count,
           round(true_count
                 - {_DP_SCALE!r} * sign(u) * ln(1.0 - 2.0 * abs(u)), 4) AS noisy_count,
           round(abs({_DP_SCALE!r} * sign(u) * ln(1.0 - 2.0 * abs(u))), 4) AS abs_noise,
           {_DP_EPS!r} AS epsilon
    FROM noise ORDER BY segment
    """,
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-segment customer counts:
    Laplace(1/epsilon) noise via the inverse CDF
    -b*sign(u)*ln(1-2|u|) over a centered md5 fraction — the
    deterministic-seed variant a reproducible pipeline needs (the same
    release is bit-stable across reruns, while a fresh salt would give
    a fresh draw). Counting queries have sensitivity 1, so scale = 1/
    epsilon gives epsilon-DP per release. The aggregate is one
    map-combinable count; the noise attaches map-side. The single
    ln() is the HLL-precedent libm call: rounded at 1e-4 against
    ~1e-15 cross-engine drift."""
    cust = load_table(spark, "customer", sf_dir)
    g = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    u = F.expr(
        "cast(conv(substr(md5(concat('dp:', segment)), 1, 12), 16, 10) as bigint)"
        f" / cast({1 << 48} as double)"
    ) - F.lit(0.5)
    noise = F.lit(_DP_SCALE) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))
    return g.select(
        "segment",
        "true_count",
        F.round(F.col("true_count") - noise, 4).alias("noisy_count"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("segment")


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS group_size
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN group_size < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(sum(CASE WHEN group_size < {_KANON_K} THEN group_size ELSE 0 END) AS BIGINT)
             AS n_suppressed_rows,
           CAST(min(group_size) AS BIGINT) AS min_group_size,
           CAST(sum(group_size) AS BIGINT) AS n_rows,
           {_KANON_K} AS k
    FROM qi
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, segment):
    every released row must be indistinguishable among >= k records
    sharing its quasi-identifier tuple. Reports the violating-group
    census and the suppression cost (rows a k-anonymizing release
    would drop) — the pre-release privacy gate of a data-publishing
    pipeline. Pure integer aggregation: one map-combinable group pass
    on the quasi-identifier, one scalar rollup, broadcast dimension
    join."""
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    qi = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    )
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("group_size") < _KANON_K, 1).otherwise(0)).alias(
            "n_violating_groups"
        ),
        F.sum(
            F.when(F.col("group_size") < _KANON_K, F.col("group_size")).otherwise(0)
        ).alias("n_suppressed_rows"),
        F.min("group_size").alias("min_group_size"),
        F.sum("group_size").alias("n_rows"),
        F.lit(_KANON_K).alias("k"),
    )


# ---------------------------------------------------------------------------
# MAD robust outliers in the exact integer domain
# ---------------------------------------------------------------------------


@register(
    "events_mad_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vc
      FROM events
    ),
    rv AS (
      SELECT event_type, vc,
             row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    med AS (
      -- median in HALF-cents: sum of the two middle order statistics
      -- (equal ranks when n is odd) — integer, no interpolation
      -- multiplicity 1 + n%2 doubles the single middle row when n is
      -- odd (the two selected ranks coincide)
      SELECT event_type, CAST(sum(vc * (1 + n % 2)) AS BIGINT) AS med2
      FROM rv WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
      GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, v.vc, abs(2 * v.vc - m.med2) AS d2
      FROM v JOIN med m ON v.event_type = m.event_type
    ),
    rd AS (
      SELECT event_type, d2,
             row_number() OVER (PARTITION BY event_type ORDER BY d2) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type, CAST(sum(d2 * (1 + n % 2)) AS BIGINT) AS mad4
      FROM rd WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
      GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(m2.med2) / 200.0, 4) AS median,
           round(max(ma.mad4) / 400.0, 4) AS mad,
           CAST(sum(CASE WHEN 2 * d.d2 > 3 * ma.mad4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(max(d.d2) / 200.0, 4) AS max_abs_dev
    FROM dev d
    JOIN med m2 ON d.event_type = m2.event_type
    JOIN mad ma ON d.event_type = ma.event_type
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation, computed
    ENTIRELY in exact integers: values are cent-integers, the median is
    kept in half-cents as the SUM of the two middle order statistics
    (no interpolation arithmetic — a 1-ulp divergence between the two
    engines' percentile interpolation could flip a point sitting
    exactly on the 3-MAD boundary, and this corpus has such points),
    deviations in half-cents, the MAD in quarter-cents, and the outlier
    test 2*d > 3*mad as pure integer comparison. Rank selection is a
    key-partitioned window (per event type — the scalable grain);
    floats appear only in the final rounded report columns, each one
    exact-rounded division of integers."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    v = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("vc")
    ).persist()

    def int_median(df: DataFrame, col: str, out: str) -> DataFrame:
        wk = W.partitionBy("event_type")
        rv = df.withColumn("rk", F.row_number().over(wk.orderBy(col))).withColumn(
            "n", F.count(F.lit(1)).over(wk)
        )
        return (
            rv.filter(
                (F.col("rk") == F.floor((F.col("n") + 1) / 2))
                | (F.col("rk") == F.floor((F.col("n") + 2) / 2))
            )
            .groupBy("event_type")
            .agg(
                F.sum(F.col(col) * (1 + F.col("n") % 2)).cast("long").alias(out)
            )
        )

    med = int_median(v, "vc", "med2")
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "vc", F.abs(2 * F.col("vc") - F.col("med2")).alias("d2")
    )
    mad = int_median(dev, "d2", "mad4")
    j = dev.join(F.broadcast(med), "event_type").join(F.broadcast(mad), "event_type")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med2") / 200.0, 4).alias("median"),
            F.round(F.max("mad4") / 400.0, 4).alias("mad"),
            F.sum(
                F.when(2 * F.col("d2") > 3 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.max("d2") / 200.0, 4).alias("max_abs_dev"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Median imputation of deterministically-masked missing values
# ---------------------------------------------------------------------------


@register(
    "dq_median_imputation",
    oracle="""
    WITH masked AS (
      -- deterministic 10% missingness: md5 bucket of the event id
      SELECT event_type,
             CASE WHEN ('0x' || substr(md5('miss:' || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 10 = 0
                  THEN NULL
                  ELSE CAST(round(value * 100, 0) AS BIGINT) END AS vc
      FROM events
    ),
    present AS (SELECT event_type, vc FROM masked WHERE vc IS NOT NULL),
    rv AS (
      SELECT event_type, vc,
             row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM present
    ),
    med AS (
      SELECT event_type, CAST(sum(vc * (1 + n % 2)) AS BIGINT) AS med2
      FROM rv WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
      GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(m.vc) AS BIGINT) AS n_imputed,
           round(max(d.med2) / 200.0, 4) AS imputed_value,
           CAST(sum(coalesce(m.vc, 0)) AS BIGINT) AS sum_cents_before,
           CAST(2 * sum(coalesce(m.vc, 0)) + (count(*) - count(m.vc)) * max(d.med2)
                AS BIGINT) AS sum_halfcents_after
    FROM masked m JOIN med d ON m.event_type = d.event_type
    GROUP BY m.event_type ORDER BY m.event_type
    """,
)
def dq_median_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair by per-group median imputation — the
    cleaning stage between ingest and training. Missingness is a
    deterministic 10% md5 mask (so the gate replays it); the imputation
    median uses the exact integer rank-arithmetic of
    events_mad_outliers (sum of the two middle order statistics in
    half-cents — no interpolation arithmetic that could diverge between
    engines), and the repaired total is reported in half-cents so
    before/after reconciliation stays in BIGINT. One key-partitioned
    ranking window on the present values, one broadcast join-back of
    the <= |types|-row median frame."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    miss = (
        F.expr(
            "cast(conv(substr(md5(concat('miss:', cast(event_id as string))),"
            " 1, 4), 16, 10) as bigint)"
        )
        % 10
        == 0
    )
    masked = ev.select(
        "event_type",
        F.when(miss, F.lit(None)).otherwise(
            F.round(F.col("value") * 100, 0).cast("long")
        ).alias("vc"),
    ).persist()
    present = masked.filter(F.col("vc").isNotNull())
    wk = W.partitionBy("event_type")
    rv = present.withColumn("rk", F.row_number().over(wk.orderBy("vc"))).withColumn(
        "n", F.count(F.lit(1)).over(wk)
    )
    med = (
        rv.filter(
            (F.col("rk") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rk") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(F.sum(F.col("vc") * (1 + F.col("n") % 2)).cast("long").alias("med2"))
    )
    return (
        masked.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count("vc")).alias("n_imputed"),
            F.round(F.max("med2") / 200.0, 4).alias("imputed_value"),
            F.sum(F.coalesce(F.col("vc"), F.lit(0))).cast("long").alias(
                "sum_cents_before"
            ),
            (
                2 * F.sum(F.coalesce(F.col("vc"), F.lit(0)))
                + (F.count(F.lit(1)) - F.count("vc")) * F.max("med2")
            )
            .cast("long")
            .alias("sum_halfcents_after"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# k-core decomposition of the trade graph
# ---------------------------------------------------------------------------

_KC_K = 2
_KC_ROUNDS = 6  # fixpoint certified reached (pytest asserts stability)


def _kcore_oracle() -> str:
    # MATERIALIZED: DuckDB inlines plain CTEs, and each peel round
    # references the previous round twice, so without materialization
    # the fact-join edge build would be re-evaluated 2^rounds times
    # (measured 19 s -> 0.2 s).
    parts = [f"""
    und AS MATERIALIZED (
      SELECT src AS u, dst AS v FROM e WHERE src <> dst
      UNION
      SELECT dst AS u, src AS v FROM e WHERE src <> dst
    ),
    n0 AS (SELECT DISTINCT u AS nk FROM und)"""]
    for r in range(1, _KC_ROUNDS + 1):
        prev = f"n{r - 1}"
        parts.append(f"""
    d{r} AS (
      SELECT und.u AS nk, CAST(count(*) AS BIGINT) AS deg
      FROM und
      JOIN {prev} a ON und.u = a.nk
      JOIN {prev} b ON und.v = b.nk
      GROUP BY und.u
    ),
    n{r} AS MATERIALIZED (SELECT nk FROM d{r} WHERE deg >= {_KC_K})""")
    return ",".join(parts)


@register(
    "graph_kcore",
    oracle=f"""
    WITH {_sp_edges_sql()},
    {_kcore_oracle()},
    final_deg AS (
      SELECT und.u AS nk, CAST(count(*) AS BIGINT) AS core_degree
      FROM und
      JOIN n{_KC_ROUNDS} a ON und.u = a.nk
      JOIN n{_KC_ROUNDS} b ON und.v = b.nk
      GROUP BY und.u
    )
    SELECT nk AS nationkey, core_degree
    FROM final_deg ORDER BY nationkey
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k = 2, matching ``_KC_K``) of the
    undirected capped trade graph: iteratively peel nodes of degree < k
    until the remaining subgraph is stable — the standard
    community-coreness primitive. Same split as the BFS query: the
    fact-scale work is the distributed edge aggregation (reused from
    graph_shortest_paths); the peeling schedule runs on the collected
    bounded edge summary, and the oracle replays every peel round as
    chained CTEs, so the hash gate certifies the round-by-round
    schedule. 6 rounds (``_KC_ROUNDS``) is past the fixpoint on every
    SF (pytest asserts one extra round changes nothing)."""
    edge_rows = bounded_rows(
        _sp_edges_df(spark, sf_dir), 75,
        "nation-graph edge summary (<= |nations| * _SP_TOPK = 75)",
    )
    und: set[tuple[int, int]] = set()
    for r in edge_rows:
        s, d = int(r.src), int(r.dst)
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = {u for u, _ in und}
    for _ in range(_KC_ROUNDS):
        deg: dict[int, int] = {}
        for u, v in und:
            if u in nodes and v in nodes:
                deg[u] = deg.get(u, 0) + 1
        nodes = {u for u, d in deg.items() if d >= _KC_K}
    deg = {}
    for u, v in und:
        if u in nodes and v in nodes:
            deg[u] = deg.get(u, 0) + 1
    rows = sorted(deg.items())
    return spark.createDataFrame(rows, "nationkey INT, core_degree BIGINT").orderBy(
        "nationkey"
    )


# ---------------------------------------------------------------------------
# Holt linear (double exponential) smoothing per event-type series
# ---------------------------------------------------------------------------

_HOLT_H = 3  # forecast horizon (days)


@register(
    "events_holt_forecast",
    oracle=f"""
    WITH RECURSIVE days AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM days
    ),
    rec AS (
      SELECT event_type, rn, n, x, x AS l, CAST(0 AS DOUBLE) AS b
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn, s.n, s.x,
             0.5 * s.x + 0.5 * (r.l + r.b) AS l,
             0.5 * ((0.5 * s.x + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b AS b
      FROM rec r JOIN seq s
        ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(l, 6) AS level, round(b, 6) AS trend,
           round(l + {_HOLT_H} * b, 6) AS forecast
    FROM rec WHERE rn = n
    ORDER BY event_type
    """,
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double exponential) smoothing of each event type's
    daily-count series, alpha = beta = 1/2: level and trend follow the
    coupled recurrence l' = a*x + (1-a)(l+b), b' = g*(l'-l) + (1-g)*b,
    with a 3-day-ahead forecast l + 3b. The genuinely sequential
    recurrence runs as an Arrow ``applyInPandas`` kernel per SERIES —
    the correct distribution grain (series are independent; time within
    one series is a data dependency) — while the oracle replays it with
    a recursive CTE walking the same row order. With dyadic smoothing
    constants and integer counts every intermediate is an exact binary
    rational well inside double precision, so both engines produce
    bit-identical trajectories (the rounds are formatting, not
    tolerance)."""
    import pandas as pd

    ev = load_table(spark, "events", sf_dir)
    days = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / 1_000_000.0 / 86400.0).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        xs = pdf["x"].tolist()
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            new_level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(xs)],
                "level": [round(level, 6)],
                "trend": [round(trend, 6)],
                "forecast": [round(level + _HOLT_H * trend, 6)],
            }
        )

    return (
        days.groupBy("event_type")
        .applyInPandas(
            holt,
            "event_type string, n_days long, level double, trend double, forecast double",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Periodogram of the daily event-count series
# ---------------------------------------------------------------------------

_PG_MAX_K = 10
_PG_TWO_PI = 6.283185307179586  # precomputed double literal (no pi() parse drift)


@register(
    "events_periodogram",
    oracle=f"""
    WITH days AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, x,
             row_number() OVER (ORDER BY day) - 1 AS t,
             count(*) OVER () AS n
      FROM days
    ),
    freqs AS (SELECT unnest(generate_series(1, {_PG_MAX_K})) AS k),
    terms AS (
      SELECT f.k, i.n,
             sum(i.x * cos({_PG_TWO_PI!r} * f.k * i.t / i.n)) AS c,
             sum(i.x * sin({_PG_TWO_PI!r} * f.k * i.t / i.n)) AS s
      FROM freqs f CROSS JOIN idx i
      GROUP BY f.k, i.n
    )
    SELECT k, CAST(n AS BIGINT) AS n_days,
           round((c * c + s * s) / n, 4) AS power
    FROM terms ORDER BY k
    """,
)
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram of the daily event-count series at
    frequencies k = 1..10 cycles per record length — the spectral
    companion to events_autocorrelation for periodicity detection:
    P(k) = ((sum x cos)^2 + (sum x sin)^2) / n over the raw series
    (the mean leaks only into k=0, which is not emitted). The
    fact reduces to <= horizon-days rows map-combinably; the k x days
    trig expansion runs on that tiny frame with a broadcast frequency
    spine. 2*pi is a shared precomputed double literal so both engines
    evaluate cos/sin at bit-identical arguments; the <= 1-ulp libm
    spread on the results sits nine orders below the 4-decimal round
    (the HLL-ln precedent)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    days = ev.groupBy(
        F.floor(F.unix_micros("ts") / 1_000_000.0 / 86400.0).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    wall = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    idx = (
        days.withColumn("t", F.row_number().over(W.orderBy("day")) - 1)
        .withColumn("n", F.count(F.lit(1)).over(wall))
    )
    freqs = spark.range(1, _PG_MAX_K + 1).select(F.col("id").alias("k"))
    arg = F.lit(_PG_TWO_PI) * F.col("k") * F.col("t") / F.col("n")
    terms = (
        F.broadcast(freqs)
        .crossJoin(idx)
        .groupBy("k", "n")
        .agg(
            F.sum(F.col("x") * F.cos(arg)).alias("c"),
            F.sum(F.col("x") * F.sin(arg)).alias("s"),
        )
    )
    return terms.select(
        "k",
        F.col("n").cast("long").alias("n_days"),
        F.round((F.col("c") * F.col("c") + F.col("s") * F.col("s")) / F.col("n"), 4).alias(
            "power"
        ),
    ).orderBy("k")


@register(
    "orders_gini_coefficient",
    oracle="""
    WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS x
                 FROM orders GROUP BY o_custkey),
    ranked AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM rev)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(x), 2) AS total_revenue,
           round((2.0 * sum(i * x) - (count(*) + 1) * sum(x))
                 / (count(*) * sum(x)), 6) AS gini
    FROM ranked
    """,
)
def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the inequality
    measure complementing the registry's HHI concentration: G =
    (2·Σi·x(i) − (n+1)·Σx) / (n·Σx) over the ascending-sorted revenue
    sequence.

    Scale shape: the global rank i comes from the distributed two-pass
    prefix sum (operators/prefix_sum.running_sum — range partition +
    per-partition cumsum + broadcast offsets), NOT a single-partition
    Window: the one operator every naive Gini implementation gets wrong
    at scale. Revenue is rounded to cents BEFORE ranking on both
    engines so summation-order ulp drift cannot reorder near-equal
    customers; (x, custkey) is the tie-free total order."""
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    orders = load_table(spark, "orders", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("x")
    )
    # r12 optimization: rank through the probe-dispatched cumulative
    # sum (bounded single-task window when the measured customer count
    # is <=100k, the distributed two-pass prefix sum past it) instead
    # of unconditionally paying the two-pass machinery.
    ranked = cumulative_sums(
        rev.withColumn("one", F.lit(1)), ["x", "o_custkey"], ["one"], ["i"]
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("x"), 2).alias("total_revenue"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("x"))
             - (F.count(F.lit(1)) + 1) * F.sum("x"))
            / (F.count(F.lit(1)) * F.sum("x")),
            6,
        ).alias("gini"),
    )


@register(
    "orders_lorenz_deciles",
    oracle="""
    WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS x
                 FROM orders GROUP BY o_custkey),
    ranked AS (SELECT o_custkey, x,
                      row_number() OVER (ORDER BY x, o_custkey) AS i,
                      count(*) OVER () AS n
               FROM rev),
    dec AS (SELECT CAST(ceil(i * 10.0 / n) AS INT) AS decile, x FROM ranked),
    agg AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
                   round(sum(x), 2) AS revenue
            FROM dec GROUP BY decile),
    tot AS (SELECT sum(revenue) AS t FROM agg)
    SELECT decile, n_customers, revenue,
           round(revenue / t, 6) AS revenue_share,
           round(sum(revenue) OVER (ORDER BY decile) / t, 6) AS cum_share
    FROM agg, tot
    ORDER BY decile
    """,
)
def orders_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile table of per-customer revenue (the curve the
    Gini coefficient summarizes — orders_gini_coefficient's drill-down):
    customers sorted ascending by revenue, split into 10 rank deciles,
    each decile's revenue share and the cumulative share (the Lorenz
    ordinates; a perfectly equal book gives cum_share = decile/10).

    Scale shape: the global rank rides the distributed two-pass prefix
    sum (operators/prefix_sum.running_sum), never a single-partition
    Window; everything after the rank is a 10-row frame, where the
    cumulative window is free. Revenue is rounded to cents before
    ranking (ulp-reorder kill, same as the Gini query)."""
    from pyspark.sql import Window as W

    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    orders = load_table(spark, "orders", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("x")
    )
    # r12 optimization: probe-dispatched cumulative sum (see
    # orders_gini_coefficient).
    ranked = cumulative_sums(
        rev.withColumn("one", F.lit(1)), ["x", "o_custkey"], ["one"], ["i"]
    )
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    agg = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.ceil(F.col("i") * 10.0 / F.col("n")).cast("int").alias("decile"), "x"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("x"), 2).alias("revenue"),
        )
    )
    tot = agg.agg(F.sum("revenue").alias("t"))
    w10 = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "revenue",
            F.round(F.col("revenue") / F.col("t"), 6).alias("revenue_share"),
            F.round(F.sum("revenue").over(w10) / F.col("t"), 6).alias("cum_share"),
        )
        .orderBy("decile")
    )
