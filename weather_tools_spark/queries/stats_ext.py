"""Extended statistics / graph cohesion / privacy / seeding (round 7,
wave 3).

Five operators closing specific family gaps, each exactly
oracle-replayable:

- Two-sample Kolmogorov-Smirnov test (the exact-statistic complement
  of the PSI-bucket drift monitor dq_distribution_drift): D = max
  |F1 - F2| over the pooled distinct values. Every term is a ratio of
  integer cumulative counts, so both engines compute IDENTICAL doubles
  and even the reject flag cannot drift.
- t-closeness audit (Li et al. 2007) — completes the
  k-anonymity / l-diversity / t-closeness privacy triad: EMD between
  each QI group's sensitive-attribute distribution and the global one,
  over the ordered category scale (normalized cumulative-difference
  sum). Integer-ratio arithmetic throughout.
- k-means|| initialization (Bahmani et al., VLDB 2012) — the
  DISTRIBUTED seeding that replaces k-means++'s k sequential passes:
  each round computes d²(x) to the current center set (one broadcast
  join), then oversamples points with probability l·d²(x)/φ using
  md5-dyadic uniforms, thresholds rounded so the selection set is
  engine-exact. The oracle replays both rounds as chained CTEs.
- k-truss decomposition (edge-peeling by triangle support) — the edge
  analog of graph_kcore, same bounded-summary schedule split: the
  fact-scale work is the distributed edge aggregation, the peel rounds
  run on the collected bounded nation-graph summary, and the oracle
  recomputes every round's support join.
- Weibull wind-speed fit (Justus 1978 method-of-moments): per-station
  shape k = (σ/μ)^-1.086 and scale c = μ/Γ(1+1/k), with Γ as a shared
  Lanczos(g=7) literal expression string evaluated identically by both
  engines — the resource-assessment statistic every wind climatology
  computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------

_KS_A, _KS_B = "purchase", "click"
_KS_CRIT = 1.3581015157406195  # c(alpha=0.05) = sqrt(-ln(0.025)/2... spelled
# as the standard constant; identical literal on both engines.


@register(
    "stats_ks_two_sample",
    oracle=f"""
    WITH pooled AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
            FROM pooled GROUP BY v),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2 FROM byv),
    cum AS (SELECT v,
                   sum(ca) OVER (ORDER BY v) AS cum1,
                   sum(cb) OVER (ORDER BY v) AS cum2
            FROM byv),
    d AS (SELECT max(abs(cum1 * 1.0 / tot.n1 - cum2 * 1.0 / tot.n2)) AS ks
          FROM cum, tot)
    SELECT tot.n1, tot.n2,
           round(d.ks, 6) AS ks_stat,
           round({_KS_CRIT!r} * sqrt((tot.n1 + tot.n2) * 1.0 / (tot.n1 * tot.n2)), 6)
             AS crit_05,
           CAST(CASE WHEN d.ks > {_KS_CRIT!r} * sqrt((tot.n1 + tot.n2) * 1.0 / (tot.n1 * tot.n2))
                     THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM d, tot
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS test between the '{a}' and '{b}' value
    distributions: D = max over pooled distinct values of |F1 − F2|,
    with the α=0.05 decision at c(α)·sqrt((n1+n2)/(n1·n2)). Every
    quantity is a ratio of integer cumulative counts over identical
    value sets, so the two engines produce bit-identical doubles — the
    reject flag is drift-proof by construction (unlike bucketed PSI,
    which is the monitoring twin dq_distribution_drift).

    Scale note: the cumulative counts flow through
    operators/prefix_sum.cumulative_sums — a measured cardinality probe
    takes the single-task ordered window ONLY when the value-aggregated
    frame is confirmed domain-bounded (2-decimal values in [0, 500] →
    ≤ 50k rows at every driver SF) and delegates to the distributed
    two-pass prefix sum past 100k distinct values, so the documented
    bound is enforced, not assumed (VERDICT r10 hardening).
    """
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    ev = load_table(spark, "events", sf_dir)
    pooled = ev.filter(F.col("event_type").isin(_KS_A, _KS_B)).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _KS_B, 1).otherwise(0).alias("b"),
    )
    byv = pooled.groupBy("v").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    tot = byv.agg(F.sum("ca").alias("n1"), F.sum("cb").alias("n2"))
    cum = cumulative_sums(byv, ["v"], ["ca", "cb"], ["cum1", "cum2"]).select(
        "v", "cum1", "cum2"
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.col("cum1") * F.lit(1.0) / F.col("n1")
                - F.col("cum2") * F.lit(1.0) / F.col("n2")
            )
        ).alias("ks")
    )
    crit = F.lit(_KS_CRIT) * F.sqrt(
        (F.col("n1") + F.col("n2")) * F.lit(1.0) / (F.col("n1") * F.col("n2"))
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.round("ks", 6).alias("ks_stat"),
        F.round(crit, 6).alias("crit_05"),
        F.when(F.col("ks") > crit, 1).otherwise(0).cast("int").alias("reject_05"),
    )


stats_ks_two_sample.__doc__ = stats_ks_two_sample.__doc__.format(a=_KS_A, b=_KS_B)


# ---------------------------------------------------------------------------
# t-closeness (ordered EMD)
# ---------------------------------------------------------------------------


@register(
    "privacy_t_closeness",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority AS priority,
             CAST(year(o_orderdate) AS INT) AS yr,
             o_orderstatus AS status
      FROM orders
    ),
    statuses AS (SELECT DISTINCT status FROM ranked),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM statuses),
    cell AS (SELECT priority, yr, status, CAST(count(*) AS BIGINT) AS cnt
             FROM ranked GROUP BY 1, 2, 3),
    g AS (SELECT priority, yr, CAST(sum(cnt) AS BIGINT) AS k_size FROM cell GROUP BY 1, 2),
    gdist AS (SELECT status, CAST(count(*) AS BIGINT) AS gcnt FROM ranked GROUP BY status),
    gtot AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n FROM gdist),
    -- dense grid: every (group, status) with zero-filled counts
    grid AS (
      SELECT g.priority, g.yr, g.k_size, s.status,
             coalesce(c.cnt, 0) AS cnt, gdist.gcnt, gtot.n
      FROM g CROSS JOIN statuses s
      LEFT JOIN cell c ON c.priority = g.priority AND c.yr = g.yr AND c.status = s.status
      JOIN gdist ON gdist.status = s.status
      CROSS JOIN gtot
    ),
    cums AS (
      SELECT priority, yr, k_size, status,
             sum(cnt * 1.0) OVER (PARTITION BY priority, yr ORDER BY status) / k_size AS cp,
             sum(gcnt * 1.0) OVER (PARTITION BY priority, yr ORDER BY status) / n AS cq
      FROM grid
    )
    SELECT priority, yr, any_value(k_size) AS k_size,
           round(sum(abs(cp - cq)) / (m.m - 1), 6) AS t_emd
    FROM cums, m
    GROUP BY priority, yr, m.m
    ORDER BY priority, yr
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): for each
    quasi-identifier group (order priority × year), the Earth Mover's
    Distance between the group's sensitive-attribute (order status)
    distribution and the GLOBAL distribution, over the ordered category
    scale — EMD = Σ|cumP − cumQ| / (m−1). Completes the privacy triad
    with privacy_k_anonymity and privacy_l_diversity. The dense
    (group × status) grid zero-fills absent cells so cumulative sums
    align; every probability is a ratio of integer counts, so both
    engines produce identical doubles. Windows partition by QI group —
    per-group state is bounded by the category count, never by corpus
    size."""
    orders = load_table(spark, "orders", sf_dir)
    ranked = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderstatus").alias("status"),
    )
    statuses = ranked.select("status").distinct()
    m = statuses.agg(F.count(F.lit(1)).alias("m"))
    cell = ranked.groupBy("priority", "yr", "status").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    g = cell.groupBy("priority", "yr").agg(F.sum("cnt").alias("k_size"))
    glob = ranked.groupBy("status").agg(F.count(F.lit(1)).alias("gcnt"))
    gtot = glob.agg(F.sum("gcnt").alias("n"))
    grid = (
        g.crossJoin(F.broadcast(statuses))
        .join(cell, ["priority", "yr", "status"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .join(F.broadcast(glob), "status")
        .crossJoin(F.broadcast(gtot))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("priority", "yr")
        .orderBy("status")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.select(
        "priority",
        "yr",
        "k_size",
        "status",
        (F.sum(F.col("cnt") * F.lit(1.0)).over(w) / F.col("k_size")).alias("cp"),
        (F.sum(F.col("gcnt") * F.lit(1.0)).over(w) / F.col("n")).alias("cq"),
    )
    return (
        cums.crossJoin(F.broadcast(m))
        .groupBy("priority", "yr", "m")
        .agg(
            F.first("k_size").alias("k_size"),
            F.round(F.sum(F.abs(F.col("cp") - F.col("cq"))) / (F.col("m") - 1), 6).alias(
                "t_emd"
            ),
        )
        .select("priority", "yr", "k_size", "t_emd")
        .orderBy("priority", "yr")
    )


# ---------------------------------------------------------------------------
# k-means|| initialization (Bahmani et al. 2012)
# ---------------------------------------------------------------------------

_KMPP_L = 4.0  # oversampling factor per round
_KMPP_ROUNDS = 2

_KMPP_D2 = (
    "round(aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as double), (acc, t) -> acc + t), 6)"
)
_KMPP_U = (
    "cast(conv(substr(md5(concat('kmpp{r}:', cast(vec_id as string))), 1, 12),"
    " 16, 10) as bigint) / cast({den} as double)"
)
_KMPP_U_SQL = (
    "('0x' || substr(md5('kmpp{r}:' || CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT"
    " / CAST({den} AS DOUBLE)"
)
_KMPP_DEN = float(1 << 48)


@register(
    "ml_kmeanspp_init",
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id = 0),
    d1 AS (
      SELECT e.vec_id,
             min(round(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)) AS d2
      FROM e, c0 c GROUP BY e.vec_id
    ),
    phi1 AS (SELECT sum(d2) AS phi FROM d1),
    sel1 AS (
      SELECT d1.vec_id, d1.d2
      FROM d1, phi1
      WHERE {_KMPP_U_SQL.format(r=1, den=_KMPP_DEN)}
            < round({_KMPP_L!r} * d1.d2 / phi1.phi, 9)
    ),
    c1 AS (SELECT cid, cv FROM c0
           UNION ALL
           SELECT s.vec_id AS cid, e.v AS cv FROM sel1 s JOIN e ON s.vec_id = e.vec_id),
    d2r AS (
      SELECT e.vec_id,
             min(round(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)) AS d2
      FROM e, c1 c GROUP BY e.vec_id
    ),
    phi2 AS (SELECT sum(d2) AS phi FROM d2r),
    sel2 AS (
      SELECT d2r.vec_id, d2r.d2
      FROM d2r, phi2
      WHERE {_KMPP_U_SQL.format(r=2, den=_KMPP_DEN)}
            < round({_KMPP_L!r} * d2r.d2 / phi2.phi, 9)
    )
    SELECT 1 AS round, vec_id, d2 FROM sel1
    UNION ALL
    SELECT 2 AS round, vec_id, d2 FROM sel2
    ORDER BY round, vec_id
    """,
)
def ml_kmeanspp_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| oversampling initialization (Bahmani et al., VLDB'12)
    — the distributed replacement for k-means++'s k sequential passes:
    starting from center 0, each of the {rounds} rounds computes every
    point's distance² to the CURRENT center set (one broadcast join +
    min; distances rounded at 1e-6 on both engines), sums them to φ,
    and independently selects each point with probability
    min(1, l·d²/φ) using a deterministic md5 48-bit dyadic uniform per
    (round, point). The selection threshold is rounded at 1e-9 so the
    φ summation-order drift (~1e-15 relative) cannot flip a membership
    decision. Emitted: each round's selected candidate centers with
    their selection-time d² — at 100 TB these rounds are the ONLY
    corpus passes seeding needs (the final weighted re-clustering runs
    on the ≤ l·rounds bounded candidate set, cf. ml_kmeans_cluster_
    summary)."""
    from weather_tools_spark.operators.dedup import _persist

    # persist the projected vectors: every round is a full corpus pass
    # over exactly this frame (Spark MLlib's KMeans caches its input
    # for the same reason) — without the pin Catalyst re-derived it
    # from the parquet scan 16 times across the round/union branches
    # (PLANS.md outlier audit; now pinned <= 2 scans in
    # test_plan_quality)
    emb = _persist(
        load_table(spark, "embeddings", sf_dir).select(
            "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
        )
    )
    centers = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    out = []
    for r in (1, 2):
        d2 = (
            emb.crossJoin(F.broadcast(centers))
            .select("vec_id", "v", F.expr(_KMPP_D2.format(a="v", b="cv")).alias("dd"))
            .groupBy("vec_id")
            .agg(F.min("dd").alias("d2"), F.first("v").alias("v"))
        )
        phi = d2.agg(F.sum("d2").alias("phi"))
        u = F.expr(_KMPP_U.format(r=r, den=_KMPP_DEN))
        # the selected candidate set is BOUNDED (expected ~l per round)
        # and is consumed twice (output + next round's center set):
        # persist it so round 2 does not replay round 1's corpus pass
        sel = _persist(
            d2.crossJoin(F.broadcast(phi))
            .filter(u < F.round(F.lit(_KMPP_L) * F.col("d2") / F.col("phi"), 9))
            .select("vec_id", "d2", "v")
        )
        out.append(sel.select(F.lit(r).alias("round"), "vec_id", "d2"))
        centers = centers.unionByName(
            sel.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        )
    return out[0].unionByName(out[1]).orderBy("round", "vec_id")


ml_kmeanspp_init.__doc__ = ml_kmeanspp_init.__doc__.format(rounds=_KMPP_ROUNDS)


# ---------------------------------------------------------------------------
# k-truss decomposition
# ---------------------------------------------------------------------------

_KT_K = 4  # keep edges in >= (k-2) = 2 triangles
_KT_ROUNDS = 4


def _ktruss_oracle() -> str:
    parts = [
        """
    und0 AS MATERIALIZED (
      SELECT src AS u, dst AS v FROM e WHERE src <> dst
      UNION
      SELECT dst AS u, src AS v FROM e WHERE src <> dst
    )"""
    ]
    for r in range(1, _KT_ROUNDS + 1):
        prev = f"und{r - 1}"
        parts.append(f"""
    sup{r} AS (
      SELECT ab.u, ab.v, CAST(count(*) AS BIGINT) AS support
      FROM {prev} ab
      JOIN {prev} aw ON aw.u = ab.u
      JOIN {prev} bw ON bw.u = ab.v AND bw.v = aw.v
      GROUP BY ab.u, ab.v
    ),
    und{r} AS MATERIALIZED (
      SELECT u, v FROM sup{r} WHERE support >= {_KT_K - 2}
    )""")
    return ",".join(parts)


@register(
    "graph_ktruss",
    oracle=None,  # assembled below (needs the shared edge CTE)
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss decomposition (k = 4): iteratively drop edges in fewer
    than k−2 = 2 triangles until stable — the EDGE-cohesion analog of
    graph_kcore, same schedule split: the fact-scale work is the
    distributed nation-graph edge aggregation (reused from
    graph_shortest_paths), the peel rounds run on the collected bounded
    summary (≤ 25 nodes), and the oracle replays every round's
    support join as chained materialized CTEs. 4 rounds is past the
    fixpoint on every SF (pytest asserts one extra round changes
    nothing). Output: surviving canonical edges with final support."""
    from weather_tools_spark.queries.analytics import _sp_edges_df

    from weather_tools_spark.operators.bounded import bounded_rows

    edge_rows = bounded_rows(
        _sp_edges_df(spark, sf_dir), 75,
        "nation-graph edge summary (<= |nations| * _SP_TOPK = 75)",
    )
    und: set[tuple[int, int]] = set()
    for row in edge_rows:
        s, d = int(row.src), int(row.dst)
        if s != d:
            und.add((s, d))
            und.add((d, s))
    for _ in range(_KT_ROUNDS):
        adj: dict[int, set[int]] = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
        kept: set[tuple[int, int]] = set()
        for u, v in und:
            if len(adj[u] & adj[v]) >= _KT_K - 2:
                kept.add((u, v))
        und = kept
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
    rows = sorted(
        (u, v, len(adj[u] & adj[v])) for u, v in und if u < v
    )
    return spark.createDataFrame(
        rows, "u INT, v INT, support BIGINT"
    ).orderBy("u", "v")


# assemble the k-truss oracle with the shared edge CTE from analytics
def _register_ktruss_oracle() -> None:
    from weather_tools_spark.queries import ORACLE
    from weather_tools_spark.queries.analytics import _sp_edges_sql

    ORACLE["graph_ktruss"] = f"""
    WITH {_sp_edges_sql()},
    {_ktruss_oracle()}
    SELECT u, v,
           CAST((SELECT count(*) FROM und{_KT_ROUNDS} aw
                 JOIN und{_KT_ROUNDS} bw ON bw.u = f.v AND bw.v = aw.v
                 WHERE aw.u = f.u) AS BIGINT) AS support
    FROM und{_KT_ROUNDS} f
    WHERE u < v
    ORDER BY u, v
    """


_register_ktruss_oracle()


# ---------------------------------------------------------------------------
# Weibull wind fit
# ---------------------------------------------------------------------------

# Lanczos g=7 gamma, valid for z > 0.5 (we use z = 1 + 1/k in (1, 2)).
# Spelled ONCE as a literal expression string shared by both engines so
# every coefficient and every operation order is identical.
_LANCZOS_C = [
    "0.99999999999980993",
    "676.5203681218851",
    "-1259.1392167224028",
    "771.32342877765313",
    "-176.61502916214059",
    "12.507343278686905",
    "-0.13857109526572012",
    "0.0000099843695780195716",
    "0.00000015056327351493116",
]


def _gamma_expr(z: str) -> str:
    a = _LANCZOS_C[0] + " + " + " + ".join(
        f"({c}) / (({z}) - 1.0 + {i})" for i, c in enumerate(_LANCZOS_C[1:], start=1)
    )
    t = f"(({z}) + 6.5)"
    return (
        f"(sqrt(2.0 * pi()) * pow({t}, ({z}) - 0.5) * exp(-{t}) * ({a}))"
    )


_WB_K = "pow(sigma / mu, -1.086)"
_WB_GAMMA = _gamma_expr(f"1.0 + 1.0 / ({_WB_K})")


@register(
    "weather_weibull_wind",
    oracle=f"""
    WITH cube AS (
      SELECT la.i AS station,
             5.0 * sin(d.i * 0.7 + la.i) + h.i * 0.3 - 2.0 AS u10,
             4.0 * cos(d.i * 0.9 + h.i * 0.5) + la.i * 0.5 AS v10
      FROM (SELECT unnest(range(0, 4)) AS i) la,
           (SELECT unnest(range(0, 24, 4)) AS i) h,
           (SELECT unnest(range(0, 30)) AS i) d
    ),
    sp AS (SELECT station, sqrt(u10 * u10 + v10 * v10) AS s FROM cube),
    stats AS (
      SELECT station, CAST(count(*) AS BIGINT) AS n,
             avg(s) AS mu,
             sqrt(avg(s * s) - avg(s) * avg(s)) AS sigma
      FROM sp GROUP BY station
    )
    SELECT station, n,
           round(mu, 6) AS mean_speed,
           round(sigma, 6) AS std_speed,
           round({_WB_K}, 6) AS k_shape,
           round(mu / {_WB_GAMMA}, 6) AS c_scale
    FROM stats ORDER BY station
    """,
)
def weather_weibull_wind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull wind-speed fit per station (the wind-resource statistic:
    P(V) ~ (k/c)(V/c)^(k−1) exp(−(V/c)^k)) by the Justus (1978)
    method-of-moments: shape k = (σ/μ)^−1.086, scale c = μ/Γ(1+1/k),
    on the same deterministic (u10, v10) wind cube as
    weather_derived_variables. Γ is a Lanczos(g=7) literal expression
    shared verbatim with the oracle (_gamma_expr) — no engine gamma()
    builtin, so no library-version drift. One map-combinable aggregate;
    σ uses the explicit population form sqrt(E[s²]−E[s]²) spelled
    identically on both engines rather than builtin stddev semantics."""
    n_la, hours, n_d = 4, list(range(0, 24, 4)), 30
    n_h = len(hours)
    cube = (
        spark.range(n_la * n_h * n_d)
        .select(
            (F.col("id") / (n_h * n_d)).cast("long").alias("station"),
            ((F.col("id") / n_d) % n_h).cast("long").alias("hi"),
            (F.col("id") % n_d).alias("doy"),
        )
        .select(
            "station",
            (
                5.0 * F.sin(F.col("doy") * 0.7 + F.col("station"))
                + F.col("hi") * 4 * 0.3
                - 2.0
            ).alias("u10"),
            (
                4.0 * F.cos(F.col("doy") * 0.9 + F.col("hi") * 4 * 0.5)
                + F.col("station") * 0.5
            ).alias("v10"),
        )
    )
    sp = cube.select(
        "station",
        F.sqrt(F.col("u10") * F.col("u10") + F.col("v10") * F.col("v10")).alias("s"),
    )
    stats = sp.groupBy("station").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("s").alias("mu"),
        F.sqrt(F.avg(F.expr("s * s")) - F.avg("s") * F.avg("s")).alias("sigma"),
    )
    return stats.select(
        "station",
        "n",
        F.round("mu", 6).alias("mean_speed"),
        F.round("sigma", 6).alias("std_speed"),
        F.round(F.expr(_WB_K), 6).alias("k_shape"),
        F.round(F.expr(f"mu / {_WB_GAMMA}"), 6).alias("c_scale"),
    ).orderBy("station")


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum with tie correction)
# ---------------------------------------------------------------------------


@register(
    "stats_mannwhitney_u",
    oracle=f"""
    WITH pooled AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
            FROM pooled GROUP BY v),
    cum AS (SELECT v, ca, cb, ca + cb AS t,
                   sum(ca + cb) OVER (ORDER BY v) AS cumt
            FROM byv),
    agg AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
             sum(ca * ((cumt - t) + (t + 1) / 2.0)) AS r1,
             sum(t * t * t - t) AS tie3
      FROM cum
    )
    SELECT n1, n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt((n1 * n2 / 12.0)
                        * ((n1 + n2 + 1) - tie3 * 1.0 / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
             AS z_score,
           CAST(CASE WHEN abs((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt((n1 * n2 / 12.0)
                        * ((n1 + n2 + 1) - tie3 * 1.0 / ((n1 + n2) * (n1 + n2 - 1.0)))))
                     > 1.959963984540054 THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM agg
    """,
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (tie-corrected normal
    approximation) between the same two event-type value samples as the
    KS test — the nonparametric location-shift complement to KS's
    any-difference alternative. Average ranks for ties derive from
    cumulative counts ((cum−t) + (t+1)/2), U₁ = R₁ − n₁(n₁+1)/2, and
    the tie-corrected variance subtracts Σ(t³−t)/((n)(n−1)). Every
    input to the z-score is an integer or an exact half-integer, so
    both engines compute identical doubles and the reject flag is
    drift-proof. One value-aggregation + the probed cumulative sum
    (operators/prefix_sum.cumulative_sums — same enforced-bound
    contract as stats_ks_two_sample: ordered window only below 100k
    measured distinct values, distributed two-pass prefix sum past
    it)."""
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    ev = load_table(spark, "events", sf_dir)
    pooled = ev.filter(F.col("event_type").isin(_KS_A, _KS_B)).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _KS_B, 1).otherwise(0).alias("b"),
    )
    byv = pooled.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    cum = cumulative_sums(
        byv.withColumn("t", F.col("ca") + F.col("cb")), ["v"], ["t"], ["cumt"]
    ).select("v", "ca", "cb", "t", "cumt")
    agg = cum.agg(
        F.sum("ca").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(
            F.col("ca") * ((F.col("cumt") - F.col("t")) + (F.col("t") + 1) / 2.0)
        ).alias("r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    z = (u - F.col("n1") * F.col("n2") / 2.0) / F.sqrt(
        (F.col("n1") * F.col("n2") / 12.0)
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie3") * F.lit(1.0)
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1.0))
        )
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u, 4).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
        F.when(F.abs(z) > 1.959963984540054, 1).otherwise(0).cast("int").alias(
            "reject_05"
        ),
    )


# ---------------------------------------------------------------------------
# nDCG ranking evaluation
# ---------------------------------------------------------------------------

_NDCG_TERMS = ["table", "window", "spark"]
_NDCG_K = 10


@register(
    "ml_ndcg_ranking_eval",
    oracle=f"""
    WITH docs_t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ),
    cand AS (
      SELECT q.term, d.doc_id,
             len(list_filter(d.t, x -> x = q.term)) AS tf,
             len(d.t) AS dl
      FROM docs_t d, (SELECT unnest(['{_NDCG_TERMS[0]}', '{_NDCG_TERMS[1]}', '{_NDCG_TERMS[2]}']) AS term) q
      WHERE len(list_filter(d.t, x -> x = q.term)) > 0
    ),
    scored AS (
      SELECT term, doc_id,
             round(tf * 1.0 / dl, 9) AS score,
             least(tf, 3) AS rel
      FROM cand
    ),
    ranked AS (
      SELECT term, doc_id, score, rel,
             row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk,
             row_number() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS irk
      FROM scored
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS n_candidates,
           round(sum(CASE WHEN rk <= {_NDCG_K}
                          THEN (pow(2.0, rel) - 1) / log2(rk + 1.0) ELSE 0 END), 6) AS dcg,
           round(sum(CASE WHEN irk <= {_NDCG_K}
                          THEN (pow(2.0, rel) - 1) / log2(irk + 1.0) ELSE 0 END), 6) AS idcg,
           round(sum(CASE WHEN rk <= {_NDCG_K}
                          THEN (pow(2.0, rel) - 1) / log2(rk + 1.0) ELSE 0 END)
                 / sum(CASE WHEN irk <= {_NDCG_K}
                            THEN (pow(2.0, rel) - 1) / log2(irk + 1.0) ELSE 0 END), 6) AS ndcg
    FROM ranked
    GROUP BY term
    ORDER BY term
    """,
)
def ml_ndcg_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{k} ranking evaluation — the retrieval-quality metric the
    registry's classifier_eval (confusion matrices) did not cover: for
    each query term, rank candidate documents by term-frequency
    density, grade relevance as min(tf, 3), and score
    DCG = Σ (2^rel − 1)/log₂(rank+1) against the ideal ordering
    (rel-desc). Scores are rounded at 1e-9 BEFORE ranking with doc_id
    tie-breaks, so the permutation is engine-exact; rel and rank are
    integers, so the DCG terms are identical doubles. Windows partition
    per query term — at 100 TB this evaluates each query's candidate
    set independently (the standard offline ranking-eval shape); the
    per-term candidate explode is one map-side pass."""
    docs = load_table(spark, "documents", sf_dir)
    terms = F.array(*[F.lit(t) for t in _NDCG_TERMS])
    cand = (
        docs.select(
            "doc_id",
            F.split(F.trim(F.col("text")), r"\s+").alias("t"),
            F.explode(terms).alias("term"),
        )
        .select(
            "term",
            "doc_id",
            F.expr("size(filter(t, x -> x = term))").alias("tf"),
            F.size("t").alias("dl"),
        )
        .filter(F.col("tf") > 0)
    )
    scored = cand.select(
        "term",
        "doc_id",
        F.round(F.col("tf") * F.lit(1.0) / F.col("dl"), 9).alias("score"),
        F.least(F.col("tf"), F.lit(3)).alias("rel"),
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("term").orderBy(F.col("score").desc(), "doc_id")
    wi = Window.partitionBy("term").orderBy(F.col("rel").desc(), "doc_id")
    ranked = scored.select(
        "term",
        "rel",
        F.row_number().over(wr).alias("rk"),
        F.row_number().over(wi).alias("irk"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    dcg = F.sum(
        F.when(F.col("rk") <= _NDCG_K, gain / F.log2(F.col("rk") + 1.0)).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(F.col("irk") <= _NDCG_K, gain / F.log2(F.col("irk") + 1.0)).otherwise(0.0)
    )
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.round(dcg, 6).alias("dcg"),
            F.round(idcg, 6).alias("idcg"),
            F.round(dcg / idcg, 6).alias("ndcg"),
        )
        .orderBy("term")
    )


ml_ndcg_ranking_eval.__doc__ = ml_ndcg_ranking_eval.__doc__.format(k=_NDCG_K)


# ---------------------------------------------------------------------------
# Calibration report (reliability bins, ECE, Brier)
# ---------------------------------------------------------------------------

_CAL_BUCKETS = 4096  # same hashing-trick feature space as corpus_quality_classifier


@register(
    "ml_calibration_report",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ), feats AS (
      SELECT doc_id, lang, dl,
             ((('0x' || substr(md5(term), 1, 8))::BIGINT % {_CAL_BUCKETS})
               * 2654435761) % 4294967296 / 2147483648.0 - 1.0 AS w
      FROM tok
    ), scored AS (
      SELECT doc_id,
             CASE WHEN any_value(lang) = 'en' THEN 1.0 ELSE 0.0 END AS y,
             1.0 / (1.0 + exp(-4.0 * sum(w) / any_value(dl))) AS s
      FROM feats GROUP BY doc_id
    ), binned AS (
      SELECT least(CAST(floor(s * 10) AS INT), 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             avg(s) AS conf, avg(y) AS acc
      FROM scored GROUP BY 1
    ), gstats AS (
      SELECT sum(binned.n) AS nn,
             sum(binned.n * abs(binned.acc - binned.conf)) AS gapsum
      FROM binned
    ), brier AS (
      SELECT avg((s - y) * (s - y)) AS brier FROM scored
    )
    SELECT bin, n, round(conf, 6) AS confidence, round(acc, 6) AS accuracy,
           round(abs(acc - conf), 6) AS gap,
           round(gstats.gapsum / gstats.nn, 6) AS ece,
           round(brier.brier, 6) AS brier
    FROM binned, gstats, brier
    ORDER BY bin
    """,
)
def ml_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-calibration report for the hashing-trick quality
    classifier (same deterministic score as corpus_quality_classifier)
    against the lang='en' label: 10 reliability bins with per-bin
    confidence vs accuracy, expected calibration error
    ECE = Σ (n_b/N)·|acc_b − conf_b|, and the Brier score — the
    eval stage that decides whether classifier scores can be used as
    sampling weights or need recalibration. One map-side score pass +
    a 10-row bin aggregate; the global ECE/Brier attach as broadcast
    scalars to every bin row.

    r9 shape fix (the sfx1.0 headline probe's heaviest entry, 24.7 s):
    the score is a pure per-document function, so the token explode +
    10M-row shuffle it used to ride is unnecessary — the term-weight
    sum is now a JVM ``F.aggregate`` over the split array (whole-stage
    codegen, zero shuffle before the 10-row bin aggregate), and the
    per-doc scored frame (one 3-column row per document) is persisted
    because it feeds BOTH the bin table and the Brier aggregate.
    Measured 24.7 s → 3.2 s at sfx1.0."""
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    terms = F.split(F.trim(F.col("text")), r"\s+")

    def w_of(t):
        bucket = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % _CAL_BUCKETS
        return (
            (bucket * F.lit(2654435761)) % F.lit(4294967296)
        ) / F.lit(2147483648.0) - 1.0

    sumw = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + w_of(t))
    scored = _persist(
        docs.select(
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-4.0 * sumw / F.size(terms)))
            ).alias("s"),
        )
    )
    binned = (
        scored.groupBy(
            F.least(F.floor(F.col("s") * 10).cast("int"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("s").alias("conf"),
            F.avg("y").alias("acc"),
        )
    )
    glob = binned.agg(
        F.sum("n").alias("nn"),
        F.sum(F.col("n") * F.abs(F.col("acc") - F.col("conf"))).alias("gapsum"),
    )
    brier = scored.agg(
        F.avg((F.col("s") - F.col("y")) * (F.col("s") - F.col("y"))).alias("brier")
    )
    return (
        binned.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(brier))
        .select(
            "bin",
            "n",
            F.round("conf", 6).alias("confidence"),
            F.round("acc", 6).alias("accuracy"),
            F.round(F.abs(F.col("acc") - F.col("conf")), 6).alias("gap"),
            F.round(F.col("gapsum") / F.col("nn"), 6).alias("ece"),
            F.round("brier", 6).alias("brier"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence
# ---------------------------------------------------------------------------


@register(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type AS r,
             CAST(floor(epoch(ts) / 86400.0) AS BIGINT) % 7 AS c,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rtot FROM cells GROUP BY r),
    ct AS (SELECT c, CAST(sum(o) AS BIGINT) AS ctot FROM cells GROUP BY c),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM rt) AS nr,
                    (SELECT CAST(count(*) AS BIGINT) FROM ct) AS nc),
    terms AS (
      SELECT (cells.o - rt.rtot * 1.0 * ct.ctot / n.n)
             * (cells.o - rt.rtot * 1.0 * ct.ctot / n.n)
             / (rt.rtot * 1.0 * ct.ctot / n.n) AS t
      FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN n
    )
    SELECT n.n, dims.nr, dims.nc,
           (dims.nr - 1) * (dims.nc - 1) AS dof,
           round(sum(terms.t), 6) AS chi2,
           round(sqrt(sum(terms.t) / (n.n * least(dims.nr - 1, dims.nc - 1))), 6)
             AS cramers_v
    FROM terms, n, dims
    GROUP BY n.n, dims.nr, dims.nc
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    day-of-week (epoch-day mod 7 — the engine-neutral weekday, avoiding
    dayofweek() origin mismatches): observed cell counts vs
    expected = row_total x col_total / n, χ² = Σ (o−e)²/e, plus
    Cramér's V = sqrt(χ²/(n·min(r−1, c−1))). Every term is a ratio of
    integer marginals over identical cells, so both engines compute
    identical doubles — the same drift-proof contract as the KS and
    Mann-Whitney tests. Shape: one cell aggregation (bounded by
    |types| x 7), marginals and totals as broadcast attaches."""
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        F.col("event_type").alias("r"),
        ((F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long") % 7).alias("c"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("r").agg(F.sum("o").alias("rtot"))
    ct = cells.groupBy("c").agg(F.sum("o").alias("ctot"))
    n = cells.agg(F.sum("o").alias("n"))
    dims = rt.agg(F.count(F.lit(1)).alias("nr")).crossJoin(
        F.broadcast(ct.agg(F.count(F.lit(1)).alias("nc")))
    )
    e = F.col("rtot") * F.lit(1.0) * F.col("ctot") / F.col("n")
    terms = (
        cells.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(n))
        .select(((F.col("o") - e) * (F.col("o") - e) / e).alias("t"), "n")
    )
    return (
        terms.groupBy("n")
        .agg(F.sum("t").alias("chi2_raw"))
        .crossJoin(F.broadcast(dims))
        .select(
            "n",
            "nr",
            "nc",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
            F.round("chi2_raw", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2_raw")
                    / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (round 8)
# ---------------------------------------------------------------------------


@register(
    "stats_spearman_corr",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS INT) AS q,
             CAST(round(l_discount * 100) AS INT) AS d
      FROM lineitem
    ),
    joint AS (SELECT flag, q, d, count(*) AS n FROM base GROUP BY 1, 2, 3),
    mq AS (SELECT flag, q, count(*) AS t FROM base GROUP BY 1, 2),
    rq AS (
      SELECT flag, q,
             (sum(t) OVER (PARTITION BY flag ORDER BY q) - t) + (t + 1) / 2.0 AS rq
      FROM mq
    ),
    md AS (SELECT flag, d, count(*) AS t FROM base GROUP BY 1, 2),
    rd AS (
      SELECT flag, d,
             (sum(t) OVER (PARTITION BY flag ORDER BY d) - t) + (t + 1) / 2.0 AS rd
      FROM md
    ),
    sums AS (
      SELECT j.flag,
             sum(j.n) AS n,
             sum(j.n * rq.rq) AS sx, sum(j.n * rd.rd) AS sy,
             sum(j.n * rq.rq * rq.rq) AS sxx, sum(j.n * rd.rd * rd.rd) AS syy,
             sum(j.n * rq.rq * rd.rd) AS sxy
      FROM joint j
      JOIN rq ON j.flag = rq.flag AND j.q = rq.q
      JOIN rd ON j.flag = rd.flag AND j.d = rd.d
      GROUP BY j.flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS rho
    FROM sums ORDER BY flag
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and discount per
    return flag — the nonparametric (monotone-association) complement
    to Pearson, robust to the heavy-tailed metrics a data pipeline
    actually monitors.

    Scale shape exploits the BOUNDED value domains (quantity 1..50,
    discount 0..10 cents): tie-averaged ranks come from the marginal
    count tables (<=50/<=11 rows per flag, cumulative window over that
    tiny frame — never over the fact), and all Pearson-on-ranks sums
    reduce over the <=550-cell JOINT count table. One fact-scale
    map-combinable aggregation, everything after is broadcast-sized.
    Ranks are exact half-integers on both engines; the single rounded
    division absorbs summation-order ulps."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("q"),
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
    )
    # The <=550-row joint count table is NOT persisted (r10 persist
    # audit: 2.05 s → 1.56 s at sfx1.0) — the marginals re-derive from
    # exchange-reused shuffles, and skipping the cache-materialization
    # job beats the recompute it would save.
    joint = li.groupBy("flag", "q", "d").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    def ranks(col: str):
        m = joint.groupBy("flag", col).agg(F.sum("n").alias("t"))
        w = W.partitionBy("flag").orderBy(col).rowsBetween(W.unboundedPreceding, 0)
        return m.select(
            "flag",
            col,
            ((F.sum("t").over(w) - F.col("t")) + (F.col("t") + 1) / 2.0).alias(
                f"r{col}"
            ),
        )

    sums = (
        joint.join(ranks("q"), ["flag", "q"])
        .join(ranks("d"), ["flag", "d"])
        .groupBy("flag")
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("n") * F.col("rq")).alias("sx"),
            F.sum(F.col("n") * F.col("rd")).alias("sy"),
            F.sum(F.col("n") * F.col("rq") * F.col("rq")).alias("sxx"),
            F.sum(F.col("n") * F.col("rd") * F.col("rd")).alias("syy"),
            F.sum(F.col("n") * F.col("rq") * F.col("rd")).alias("sxy"),
        )
    )
    return sums.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("rho"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# One-way ANOVA F (round 8)
# ---------------------------------------------------------------------------


@register(
    "stats_anova_f",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) AS ng, sum(value) AS sg, sum(value * value) AS qg
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT sum(ng) AS n, count(*) AS k, sum(sg) AS s,
             sum(qg - sg * sg / ng) AS ssw,
             sum(ng * (sg / ng - (SELECT sum(sg) FROM g) / (SELECT sum(ng) FROM g))
                 * (sg / ng - (SELECT sum(sg) FROM g) / (SELECT sum(ng) FROM g))) AS ssb
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS INT) AS k,
           CAST(k - 1 AS INT) AS df1, CAST(n - k AS BIGINT) AS df2,
           round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat,
           round(ssb / (ssb + ssw), 6) AS eta_sq
    FROM tot
    """,
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of `value` across event types — "does any
    group mean differ", generalizing the two-sample t/MW tests to k
    groups; the standard gate before per-pair drill-downs.

    Scale shape: one map-combinable aggregation to k group rows
    (n, Σv, Σv²), then a k-row reduce. SSB uses group MEANS (no
    large-term cancellation); SSW's per-group qg − sg²/ng cancels at
    most ~2× of magnitude, far inside double precision at the rounded
    decimals. F rounded to 4 (ratio of mean squares), eta² to 6."""
    ev = load_table(spark, "events", sf_dir)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("value").alias("sg"),
        F.sum(F.col("value") * F.col("value")).alias("qg"),
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sg").alias("s"),
        F.sum(F.col("qg") - F.col("sg") * F.col("sg") / F.col("ng")).alias("ssw"),
    )
    both = g.crossJoin(F.broadcast(tot))
    agg = both.groupBy("n", "k", "ssw").agg(
        F.sum(
            F.col("ng")
            * (F.col("sg") / F.col("ng") - F.col("s") / F.col("n"))
            * (F.col("sg") / F.col("ng") - F.col("s") / F.col("n"))
        ).alias("ssb")
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("int").alias("k"),
        (F.col("k") - 1).cast("int").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("n") - F.col("k"))),
            4,
        ).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Welch's t-test (round 8)
# ---------------------------------------------------------------------------


@register(
    "stats_ttest_welch",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) AS n, sum(value) AS s, sum(value * value) AS q
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type
    ),
    w AS (
      SELECT
        max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        max(CASE WHEN event_type = 'click' THEN n END) AS n2,
        max(CASE WHEN event_type = 'purchase' THEN s / n END) AS m1,
        max(CASE WHEN event_type = 'click' THEN s / n END) AS m2,
        max(CASE WHEN event_type = 'purchase' THEN (q - s * s / n) / (n - 1) END) AS v1,
        max(CASE WHEN event_type = 'click' THEN (q - s * s / n) / (n - 1) END) AS v2
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1, 6) AS mean_1, round(m2, 6) AS mean_2,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS df_welch
    FROM w
    """,
)
def stats_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the purchase and click
    value samples — the parametric member of the two-sample family
    (KS = any-difference, Mann-Whitney = location-shift, Welch =
    mean-difference under unequal variances) with the
    Welch-Satterthwaite effective degrees of freedom.

    Scale shape: one filtered map-combinable aggregation to TWO rows
    (n, Σv, Σv²), then scalar arithmetic — the cheapest possible
    two-sample plan. Variance's q − s²/n cancels ~2× of magnitude
    (benign); t rounded to 4, df to 2, means to 6."""
    ev = load_table(spark, "events", sf_dir)
    g = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("q"),
        )
    )
    is_p = F.col("event_type") == "purchase"
    w = g.agg(
        F.max(F.when(is_p, F.col("n"))).alias("n1"),
        F.max(F.when(~is_p, F.col("n"))).alias("n2"),
        F.max(F.when(is_p, F.col("s") / F.col("n"))).alias("m1"),
        F.max(F.when(~is_p, F.col("s") / F.col("n"))).alias("m2"),
        F.max(
            F.when(is_p, (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
        ).alias("v1"),
        F.max(
            F.when(~is_p, (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
        ).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round("m1", 6).alias("mean_1"),
        F.round("m2", 6).alias("mean_2"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            se2 * se2
            / (
                (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1")) / (F.col("n1") - 1)
                + (F.col("v2") / F.col("n2")) * (F.col("v2") / F.col("n2")) / (F.col("n2") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# Decision stump (round 8, wave 2)
# ---------------------------------------------------------------------------


@register(
    "ml_decision_stump",
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS INT) AS q,
             CAST(round(l_discount * 100) AS INT) AS d,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    long AS (
      SELECT 'quantity' AS feature, q AS x, y FROM base
      UNION ALL
      SELECT 'discount' AS feature, d AS x, y FROM base
    ),
    m AS (SELECT feature, x, count(*) AS n, sum(y) AS pos FROM long GROUP BY 1, 2),
    cum AS (
      SELECT feature, x,
             sum(n) OVER (PARTITION BY feature ORDER BY x) AS nl,
             sum(pos) OVER (PARTITION BY feature ORDER BY x) AS pl,
             sum(n) OVER (PARTITION BY feature) AS nt,
             sum(pos) OVER (PARTITION BY feature) AS pt
      FROM m
    ),
    splits AS (
      SELECT feature, x AS threshold, nl, nt - nl AS nr,
             (nl * (1.0 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
                        - (1.0 - CAST(pl AS DOUBLE) / nl) * (1.0 - CAST(pl AS DOUBLE) / nl))
              + (nt - nl) * (1.0 - (CAST(pt - pl AS DOUBLE) / (nt - nl)) * (CAST(pt - pl AS DOUBLE) / (nt - nl))
                                 - (1.0 - CAST(pt - pl AS DOUBLE) / (nt - nl)) * (1.0 - CAST(pt - pl AS DOUBLE) / (nt - nl))))
             / nt AS gini
      FROM cum WHERE nl < nt
    ),
    best AS (
      SELECT feature, threshold, nl, nr, gini,
             row_number() OVER (ORDER BY gini, feature, threshold) AS rk
      FROM splits
    )
    SELECT feature, CAST(threshold AS INT) AS threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           round(gini, 6) AS gini
    FROM best WHERE rk = 1
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump — the boosting weak learner: the single
    (feature, threshold) split minimizing weighted Gini impurity for
    predicting returned lineitems, over the two BOUNDED-domain features
    (quantity 1..50, discount 0..10 cents).

    Scale shape: one map-combinable count aggregation per feature value
    (<=61 rows total), cumulative windows over those tiny frames give
    every candidate split's left/right class counts in one pass (the
    classic sorted-split-scan, here as SQL), then a <=61-row argmin.
    All split statistics are ratios of exact integer counts evaluated
    in the same operation order on both engines, so even the argmin
    tie-break (gini, feature, threshold) cannot drift."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_quantity").cast("int").alias("q"),
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    long = li.selectExpr("'quantity' AS feature", "q AS x", "y").unionAll(
        li.selectExpr("'discount' AS feature", "d AS x", "y")
    )
    m = long.groupBy("feature", "x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    from pyspark.sql import Window as W

    wcum = W.partitionBy("feature").orderBy("x").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("feature")
    cum = m.select(
        "feature",
        "x",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("pos").over(wcum).alias("pl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("pt"),
    )
    pl_rate = F.col("pl").cast("double") / F.col("nl")
    pr_rate = (F.col("pt") - F.col("pl")).cast("double") / (F.col("nt") - F.col("nl"))
    gini = (
        F.col("nl") * (F.lit(1.0) - pl_rate * pl_rate - (F.lit(1.0) - pl_rate) * (F.lit(1.0) - pl_rate))
        + (F.col("nt") - F.col("nl"))
        * (F.lit(1.0) - pr_rate * pr_rate - (F.lit(1.0) - pr_rate) * (F.lit(1.0) - pr_rate))
    ) / F.col("nt")
    splits = cum.filter(F.col("nl") < F.col("nt")).select(
        "feature",
        F.col("x").alias("threshold"),
        "nl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        gini.alias("gini"),
    )
    wbest = W.orderBy("gini", "feature", "threshold")
    return (
        splits.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "feature",
            F.col("threshold").cast("int").alias("threshold"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            F.round("gini", 6).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# kNN label accuracy (round 8, wave 2)
# ---------------------------------------------------------------------------


@register(
    "ml_knn_label_accuracy",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS nb_label,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT query_id, nb_label,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ),
    votes AS (
      SELECT query_id, nb_label, count(*) AS v
      FROM ranked WHERE rk <= 5 GROUP BY query_id, nb_label
    ),
    pred AS (
      SELECT query_id, nb_label AS pred_label,
             row_number() OVER (PARTITION BY query_id ORDER BY v DESC, nb_label) AS pr
      FROM votes
    ),
    conf AS (
      SELECT e.label, p.pred_label, count(*) AS n
      FROM pred p JOIN e ON p.query_id = e.vec_id
      WHERE p.pr = 1
      GROUP BY e.label, p.pred_label
    )
    SELECT label, pred_label, CAST(n AS BIGINT) AS n
    FROM conf ORDER BY label, pred_label
    """,
)
def ml_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label prediction over the embedding corpus —
    the standard embedding-quality probe (does the vector space cluster
    by label?), reported as the label × predicted-label confusion
    matrix.

    Scale shape: neighbor search reuses the blocked-dgemm exact top-k
    kernel (operators/similarity.cosine_topk — the same plan the ANN
    audits gate); votes and the argmax are integer aggregations over
    5 rows per query. Majority ties break by (votes DESC, label ASC) on
    exact integer counts, so the only cross-engine float surface is the
    top-5 membership boundary itself — the same accepted contract as
    sim_cosine_topk."""
    from weather_tools_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    topk = S.cosine_topk(emb, emb, k=5)
    labels = emb.select(F.col("vec_id"), F.col("label"))
    votes = (
        topk.join(
            F.broadcast(labels.withColumnRenamed("vec_id", "neighbor_id")).withColumnRenamed(
                "label", "nb_label"
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    from pyspark.sql import Window as W

    wp = W.partitionBy("query_id").orderBy(F.col("v").desc(), F.col("nb_label"))
    pred = votes.withColumn("pr", F.row_number().over(wp)).filter(F.col("pr") == 1)
    return (
        pred.join(F.broadcast(labels).withColumnRenamed("vec_id", "query_id"), "query_id")
        .groupBy("label", F.col("nb_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("label", "pred_label")
    )


# ---------------------------------------------------------------------------
# Kendall tau-b (round 8, wave 3)
# ---------------------------------------------------------------------------


@register(
    "stats_kendall_tau",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS INT) AS q,
             CAST(round(l_discount * 100) AS INT) AS d
      FROM lineitem
    ),
    joint AS (SELECT flag, q, d, count(*) AS n FROM base GROUP BY 1, 2, 3),
    cd AS (
      SELECT a.flag,
             sum(CASE WHEN (a.q < b.q AND a.d < b.d) OR (a.q > b.q AND a.d > b.d)
                      THEN a.n * b.n ELSE 0 END) / 2 AS c,
             sum(CASE WHEN (a.q < b.q AND a.d > b.d) OR (a.q > b.q AND a.d < b.d)
                      THEN a.n * b.n ELSE 0 END) / 2 AS dd
      FROM joint a JOIN joint b ON a.flag = b.flag
      GROUP BY a.flag
    ),
    marg AS (
      SELECT flag, sum(n) AS nn,
             (sum(n) * (sum(n) - 1)) / 2 AS n0
      FROM joint GROUP BY flag
    ),
    tq AS (
      SELECT flag, sum((t * (t - 1)) / 2) AS n1
      FROM (SELECT flag, q, sum(n) AS t FROM joint GROUP BY flag, q)
      GROUP BY flag
    ),
    td AS (
      SELECT flag, sum((t * (t - 1)) / 2) AS n2
      FROM (SELECT flag, d, sum(n) AS t FROM joint GROUP BY flag, d)
      GROUP BY flag
    )
    SELECT m.flag AS flag, CAST(m.nn AS BIGINT) AS n,
           round(CAST(c - dd AS DOUBLE)
                 / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)), 6) AS tau_b
    FROM cd JOIN marg m ON cd.flag = m.flag
    JOIN tq ON tq.flag = m.flag JOIN td ON td.flag = m.flag
    ORDER BY m.flag
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (tie-corrected) between quantity and discount per
    return flag — completes the rank-correlation family next to
    stats_spearman_corr: tau counts concordant/discordant PAIRS, the
    statistic behind distance-based trend tests (Mann-Kendall).

    Scale shape: the O(n²) pair count collapses to an O(cells²)
    self-join of the BOUNDED joint count table (<=550 cells per flag →
    <=302k cell pairs, broadcast-joined), weighted by n_a·n_b; the tie
    terms come from the two tiny marginals. Every count is an exact
    integer (BIGINT products far under 2^63); the single rounded
    division is the only float."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("q"),
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
    )
    # the ONE fact-scale pass: a map-combinable joint count over the
    # <=50x11 value lattice per flag (<=1650 rows at ANY data scale).
    joint = li.groupBy("flag", "q", "d").agg(F.count(F.lit(1)).alias("n"))
    # r12 optimization (guide §1.2/§2.4): the five downstream branches
    # (pair self-join, marginal, two tie terms, three joins — 8
    # exchanges, 20 Spark jobs, and a persisted intermediate) all
    # consumed the SAME lattice-bounded frame; they now fold on the
    # driver over the bounded collect (same contract as the
    # graph_shortest_paths edge summary: "on an aggregated
    # dimension-sized table, per-stage overhead dwarfs the 1650-row
    # compute"). Arithmetic replicated exactly: every count stays an
    # int64 (numpy outer products mirror Spark's non-ANSI BIGINT
    # multiply), the only floats are the same /2 halvings and the one
    # rounded division, and _r6 matches SQL round()'s HALF_UP ties.
    import numpy as np

    from weather_tools_spark.operators.bounded import bounded_rows
    from weather_tools_spark.queries.round10 import _r6

    cells = bounded_rows(
        joint, 1700, "joint value-lattice count table (<=550 cells per flag)"
    )
    by_flag: dict[str, list] = {}
    for r in cells:
        by_flag.setdefault(r["flag"], []).append((r["q"], r["d"], r["n"]))
    out_rows = []
    for flag in sorted(by_flag):
        qq = np.array([x[0] for x in by_flag[flag]], dtype=np.int64)
        dd_ = np.array([x[1] for x in by_flag[flag]], dtype=np.int64)
        nn = np.array([x[2] for x in by_flag[flag]], dtype=np.int64)
        n_total = int(nn.sum())
        qa, qb = qq[:, None], qq[None, :]
        da, db = dd_[:, None], dd_[None, :]
        w = nn[:, None] * nn[None, :]
        conc = ((qa < qb) & (da < db)) | ((qa > qb) & (da > db))
        disc = ((qa < qb) & (da > db)) | ((qa > qb) & (da < db))
        c = int(w[conc].sum()) / 2
        d_ = int(w[disc].sum()) / 2
        n0 = (n_total * (n_total - 1)) / 2
        tq = np.zeros(len(qq), dtype=np.int64)
        np.add.at(tq, np.unique(qq, return_inverse=True)[1], nn)
        n1 = float(sum((int(t) * (int(t) - 1)) / 2 for t in tq if t))
        td = np.zeros(len(dd_), dtype=np.int64)
        np.add.at(td, np.unique(dd_, return_inverse=True)[1], nn)
        n2 = float(sum((int(t) * (int(t) - 1)) / 2 for t in td if t))
        denom_sq = (n0 - n1) * (n0 - n2)
        import math

        # denom_sq == 0 (all-tied lattice) mirrors Spark's non-ANSI
        # divide-by-zero NULL, not NaN (ADVICE r12)
        tau = (
            _r6((c - d_) / math.sqrt(denom_sq)) if denom_sq > 0 else None
        )
        out_rows.append((flag, n_total, tau))
    return spark.createDataFrame(
        out_rows, "flag string, n long, tau_b double"
    ).orderBy("flag")


@register(
    "stats_levene_test",
    oracle="""
    WITH g AS (SELECT event_type, avg(value) AS m
               FROM events WHERE value IS NOT NULL GROUP BY event_type),
    z AS (SELECT e.event_type, abs(e.value - g.m) AS z
          FROM events e JOIN g USING (event_type) WHERE e.value IS NOT NULL),
    gs AS (SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_i,
                  sum(z) AS sz, sum(z * z) AS sz2
           FROM z GROUP BY event_type),
    tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   sum(sz) / sum(n_i) AS zbar
            FROM gs)
    SELECT k, n,
           round(((n - k) * (SELECT sum(n_i * (sz / n_i - zbar) * (sz / n_i - zbar)) FROM gs, tot))
                 / ((k - 1) * (SELECT sum(sz2 - sz * sz / n_i) FROM gs)), 6) AS w_stat
    FROM tot
    """,
)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test of variance homogeneity across event types (the
    mean-centered classic form) — the gate that decides between the
    pooled-variance and Welch branches of the two-sample family this
    registry already carries (stats_ttest_welch, stats_anova_f).

    Scale shape: one map-combinable aggregation to k group means
    (broadcast back), one fact pass computing |x - mean_g|, one
    map-combinable aggregation to k rows of (n, Σz, Σz²), then k-row
    arithmetic. W from group-level sums only (zbar_i = Σz/n within the
    expression) so neither engine materializes per-row deviations
    twice; rounded at 1e-6 on both engines."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(F.avg("value").alias("m"))
    z = ev.join(F.broadcast(g), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("z")
    )
    gs = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("sz2"),
    )
    tot = gs.agg(
        F.sum("n_i").alias("n"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("sz") / F.sum("n_i")).alias("zbar"),
    )
    terms = gs.crossJoin(F.broadcast(tot)).agg(
        F.first("k").alias("k"),
        F.first("n").alias("n"),
        F.sum(
            F.col("n_i")
            * (F.col("sz") / F.col("n_i") - F.col("zbar"))
            * (F.col("sz") / F.col("n_i") - F.col("zbar"))
        ).alias("num"),
        F.sum(F.col("sz2") - F.col("sz") * F.col("sz") / F.col("n_i")).alias("den"),
    )
    return terms.select(
        "k",
        "n",
        F.round(
            ((F.col("n") - F.col("k")) * F.col("num"))
            / ((F.col("k") - 1) * F.col("den")),
            6,
        ).alias("w_stat"),
    )


@register(
    "events_dispersion_index",
    oracle="""
    WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY event_type, date_trunc('hour', ts))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS m_hours,
           round(avg(c), 6) AS mean_c,
           round((sum(c * c) / count(*) - avg(c) * avg(c)) / avg(c), 6) AS dispersion,
           CASE WHEN (sum(c * c) / count(*) - avg(c) * avg(c)) / avg(c) > 1.0
                THEN 'overdispersed' ELSE 'under/poisson' END AS regime
    FROM hc
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio of hourly event
    counts) per event type — the standard burstiness screen: Poisson
    arrivals give D≈1, user-session-driven traffic is overdispersed
    (D>1), rate-limited feeds underdispersed. Two map-combinable
    aggregations (hour buckets, then per-type moments); population
    variance from Σc² so no per-row second pass."""
    ev = load_table(spark, "events", sf_dir)
    hc = ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    disp = (
        F.sum(F.col("c") * F.col("c")) / F.count(F.lit(1))
        - F.avg("c") * F.avg("c")
    ) / F.avg("c")
    return (
        hc.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("m_hours"),
            F.round(F.avg("c"), 6).alias("mean_c"),
            F.round(disp, 6).alias("dispersion"),
            F.when(disp > 1.0, "overdispersed")
            .otherwise("under/poisson")
            .alias("regime"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_cramers_v",
    oracle="""
    WITH ct AS (SELECT l_returnflag AS a, l_linestatus AS b,
                       CAST(count(*) AS BIGINT) AS n
                FROM lineitem GROUP BY l_returnflag, l_linestatus),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(count(DISTINCT a) AS BIGINT) AS r,
                   CAST(count(DISTINCT b) AS BIGINT) AS c
            FROM ct),
    ma AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM ct GROUP BY a),
    mb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM ct GROUP BY b),
    chi AS (SELECT sum((ct.n - 1.0 * ma.na * mb.nb / tot.nn)
                       * (ct.n - 1.0 * ma.na * mb.nb / tot.nn)
                       / (1.0 * ma.na * mb.nb / tot.nn)) AS chi2
            FROM ct JOIN ma USING (a) JOIN mb USING (b), tot)
    SELECT tot.nn AS n, round(chi.chi2, 6) AS chi2,
           round(sqrt(chi.chi2 / (tot.nn * (least(tot.r, tot.c) - 1))), 6)
             AS cramers_v
    FROM chi, tot
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1] EFFECT SIZE for the returnflag ×
    linestatus association whose significance stats_chi2_independence
    already tests (a huge-n chi-square is always "significant"; V says
    whether the association matters). V = sqrt(chi2 / (n·(min(r,c)−1)))
    from the same contingency table.

    Scale shape: one fact-scale map-combinable aggregation to the
    ≤ r·c contingency table; margins and chi² are arithmetic on that
    bounded frame (the stats_chi2 pattern)."""
    from weather_tools_spark.operators.dedup import _persist

    li = load_table(spark, "lineitem", sf_dir)
    ct = _persist(
        li.groupBy(
            F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    tot = ct.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    ma = ct.groupBy("a").agg(F.sum("n").alias("na"))
    mb = ct.groupBy("b").agg(F.sum("n").alias("nb"))
    e = F.lit(1.0) * F.col("na") * F.col("nb") / F.col("nn")
    chi = (
        ct.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum((F.col("n") - e) * (F.col("n") - e) / e).alias("chi2"))
    )
    return chi.crossJoin(F.broadcast(tot)).select(
        F.col("nn").cast("long").alias("n"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("nn") * (F.least("r", "c") - 1))), 6
        ).alias("cramers_v"),
    )
