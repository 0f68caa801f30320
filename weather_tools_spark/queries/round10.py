"""Round-10 wave: boosting, dimensionality reduction, quantile-sketch
bounds, multiple-testing control, closed-form OLS regression, and
mutual-information feature ranking.

Six operators closing family gaps, each driver-gated against a DuckDB
oracle:

- AdaBoost with decision stumps (Freund & Schapire 1997), 2 rounds —
  the registry's first ENSEMBLE learner (complements ml_decision_stump
  / ml_logreg_newton). Entirely count-based: round-1 error is an
  integer ratio mis/n, round-2 reweighted error has the closed form
  (a·e^-α + b·e^α)/(C·e^-α + W·e^α) over the 2×2 agreement table, so
  both engines do identical arithmetic on identical integers.
- Johnson-Lindenstrauss random projection (Achlioptas 2003 sign
  matrix): 64 → 16 dims with a deterministic md5-derived ±1 matrix
  (generated at plan build, embedded as literals in BOTH engines),
  then a distance-distortion report over a bounded pair set — the
  scale path that shrinks embedding bytes 4× before any ANN pass.
- Greenwald-Khanna quantile rank-bound gate: Spark's JVM-side
  mergeable approx_percentile (map-side partials merged inside the
  aggregate — the merge IS under test) checked distributedly against
  the exact rank: |rank(est) − q·n| ≤ ε·n for every q. The estimate
  itself is partition-order-dependent, so the gate hashes the
  BOOLEANS + monotonicity, the same stable-surface technique as
  sketch_error_bounds_audit.
- Benjamini-Hochberg FDR step-up over the 5 per-event-type Welch
  z-tests (type vs rest) — multiple-testing control, the missing
  member of the stats family. Normal tail via the Zelen-Severo
  26.2.17 polynomial as a shared literal expression (DuckDB has no
  erf), applied to the PRE-ROUNDED z so both engines compute the same
  p bits.
- Multiple OLS regression in closed form: one map-combinable pass to
  the 10 sufficient moments, then Cramer's rule on the 3×3 normal
  equations as shared SQL fragments — the linear complement of
  ml_logreg_newton, and the canonical sufficient-statistics scale
  shape.
- Mutual-information feature ranking, Miller-Madow bias-corrected,
  with a doc_id%8 null-feature control — the feature-selection
  primitive of classifier-based quality filtering, with the
  correction that keeps the null control from winning on small
  samples.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register


def _r6(x: float) -> float:
    """round(x, 6) with HALF_UP ties — matching SQL round() on both
    engines; Python's built-in round is banker's (HALF_EVEN)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

# ---------------------------------------------------------------------------
# AdaBoost stumps
# ---------------------------------------------------------------------------

# (feature, threshold) stump grid × polarity; thresholds bracket the
# corpus token/char quantiles (p10≈21, p50≈56, p90≈88 tokens) so stumps
# are non-degenerate at every SF of the same generator.
_ADA_GRID = [("f_tok", t) for t in (30, 45, 60, 75)] + [
    ("f_chr", t) for t in (150, 250, 350, 450)
]
_ADA_CANDS = [(f, t, p) for (f, t) in _ADA_GRID for p in (1, -1)]

_ADA_CAND_SQL = ", ".join(f"('{f}', {t}, {p})" for f, t, p in _ADA_CANDS)

# h(x) for a candidate row c over a feature row ft (SQL fragment used
# by the oracle; the Spark side builds the same expression per column)
_ADA_H = (
    "c.p * (CASE WHEN (CASE WHEN c.f = 'f_tok' THEN ft.f_tok ELSE ft.f_chr END)"
    " <= c.t THEN 1 ELSE -1 END)"
)


@register(
    "ml_adaboost_stumps",
    oracle=f"""
    WITH ft AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             len(regexp_split_to_array(text, '\\s+')) AS f_tok,
             n_chars AS f_chr
      FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM ft),
    cands AS (SELECT * FROM (VALUES {_ADA_CAND_SQL}) c(f, t, p)),
    r1 AS (
      SELECT c.f, c.t, c.p,
             sum(CASE WHEN {_ADA_H} <> ft.y THEN 1 ELSE 0 END) AS mis
      FROM cands c CROSS JOIN ft
      GROUP BY c.f, c.t, c.p
    ),
    b1 AS (
      SELECT f, t, p, mis, mis * 1.0 / nn.n AS e1,
             0.5 * ln((nn.n - mis) * 1.0 / mis) AS a1, nn.n AS n
      FROM r1, nn
      WHERE mis > 0 AND mis < nn.n
      ORDER BY mis, f, t, p LIMIT 1
    ),
    r2 AS (
      SELECT c.f, c.t, c.p,
             sum(CASE WHEN (b1.p * (CASE WHEN (CASE WHEN b1.f = 'f_tok'
                      THEN ft.f_tok ELSE ft.f_chr END) <= b1.t THEN 1 ELSE -1 END)) = ft.y
                       AND {_ADA_H} <> ft.y THEN 1 ELSE 0 END) AS a_cw,
             sum(CASE WHEN (b1.p * (CASE WHEN (CASE WHEN b1.f = 'f_tok'
                      THEN ft.f_tok ELSE ft.f_chr END) <= b1.t THEN 1 ELSE -1 END)) <> ft.y
                       AND {_ADA_H} <> ft.y THEN 1 ELSE 0 END) AS b_ww
      FROM cands c CROSS JOIN ft CROSS JOIN b1
      GROUP BY c.f, c.t, c.p
    ),
    b2 AS (
      SELECT r2.f, r2.t, r2.p,
             (r2.a_cw * exp(-b1.a1) + r2.b_ww * exp(b1.a1))
               / ((b1.n - b1.mis) * exp(-b1.a1) + b1.mis * exp(b1.a1)) AS e2
      FROM r2, b1
      WHERE NOT (r2.f = b1.f AND r2.t = b1.t AND r2.p = b1.p)
      ORDER BY e2, r2.f, r2.t, r2.p LIMIT 1
    ),
    acc2 AS (
      SELECT sum(CASE WHEN (CASE WHEN b1.a1 >= 0.5 * ln((1 - b2.e2) / b2.e2)
              THEN b1.p * (CASE WHEN (CASE WHEN b1.f = 'f_tok' THEN ft.f_tok
                   ELSE ft.f_chr END) <= b1.t THEN 1 ELSE -1 END)
              ELSE b2.p * (CASE WHEN (CASE WHEN b2.f = 'f_tok' THEN ft.f_tok
                   ELSE ft.f_chr END) <= b2.t THEN 1 ELSE -1 END) END) = ft.y
              THEN 1 ELSE 0 END) AS ok
      FROM ft, b1, b2
    )
    SELECT 1 AS round, b1.f AS feature, CAST(b1.t AS DOUBLE) AS threshold,
           b1.p AS polarity, round(b1.e1, 6) AS err, round(b1.a1, 6) AS alpha,
           round(1.0 - b1.e1, 6) AS ensemble_acc
    FROM b1
    UNION ALL
    SELECT 2, b2.f, CAST(b2.t AS DOUBLE), b2.p, round(b2.e2, 6),
           round(0.5 * ln((1 - b2.e2) / b2.e2), 6),
           round(acc2.ok * 1.0 / b1.n, 6)
    FROM b2, b1, acc2
    ORDER BY round
    """,
)
def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of AdaBoost.M1 over a 16-candidate stump grid
    (features: token count, char count; both polarities), label
    y = ±1 for lang='en'. Every engine-visible number is derived from
    INTEGER counts: round-1 error is mis/n; because round-1 weights
    take only two values (e^∓α), round-2 weighted error is a closed
    form over the candidate×best-stump 2×2 agreement table, and the
    2-stump ensemble prediction is h1 when α1 ≥ α2 else h2 (sign
    algebra on ±1 hypotheses). Degenerate stumps (all-correct /
    all-wrong) are excluded on both engines.

    Scale shape: three map-combinable doc-scale aggregations total
    (round-1 counts, round-2 agreement counts, final ensemble
    accuracy), each with a bounded ×16 literal fan-out absorbed
    map-side; the candidate frames are 16 rows and the stump selection
    happens on bounded driver tables (bounded_rows, like the BPE merge
    fold). No shuffle ever exceeds the 16-row candidate key space."""
    from weather_tools_spark.operators.bounded import bounded_rows
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    # persisted: the 3-int-per-doc feature projection (NOT the text) is
    # read by both boosting rounds — interleaved A/B: persist 1.54 s vs
    # recompute 2.07 s median at sf0.1 (re-tokenizing for round 2 costs
    # more than caching 12 bytes/doc).
    ft = _persist(
        docs.select(
            F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
            F.size(F.split("text", r"\s+")).alias("f_tok"),
            F.col("n_chars").alias("f_chr"),
        )
    )

    def h_col(f: str, t: int, p: int) -> F.Column:
        feat = F.col("f_tok") if f == "f_tok" else F.col("f_chr")
        return F.lit(p) * F.when(feat <= t, 1).otherwise(-1)

    # r12 optimization (guide §1.2: don't compute things twice): the
    # total row count folds into the round-1 aggregate (one job instead
    # of a separate count(), and the first action doubles as the cache
    # materialization of ft)
    r1 = ft.groupBy().agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.sum(F.when(h_col(f, t, p) != F.col("y"), 1).otherwise(0)).alias(
                f"m_{i}"
            )
            for i, (f, t, p) in enumerate(_ADA_CANDS)
        ],
    )
    mis = bounded_rows(r1, 1, "single-row stump-grid error aggregate")[0]
    n = mis["n_total"]
    live = [
        (c, mis[f"m_{i}"])
        for i, c in enumerate(_ADA_CANDS)
        if 0 < mis[f"m_{i}"] < n
    ]
    (f1, t1, p1), mis1 = min(live, key=lambda it: (it[1], it[0]))
    e1 = mis1 / n
    a1 = 0.5 * math.log((n - mis1) / mis1)

    h1_ok = h_col(f1, t1, p1) == F.col("y")
    r2 = ft.groupBy().agg(
        *[
            F.sum(
                F.when(h1_ok & (h_col(f, t, p) != F.col("y")), 1).otherwise(0)
            ).alias(f"a_{i}")
            for i, (f, t, p) in enumerate(_ADA_CANDS)
        ],
        *[
            F.sum(
                F.when((~h1_ok) & (h_col(f, t, p) != F.col("y")), 1).otherwise(0)
            ).alias(f"b_{i}")
            for i, (f, t, p) in enumerate(_ADA_CANDS)
        ],
    )
    cells = bounded_rows(r2, 1, "single-row reweighted-error aggregate")[0]
    eneg, epos = math.exp(-a1), math.exp(a1)
    denom = (n - mis1) * eneg + mis1 * epos
    best2 = min(
        (
            ((cells[f"a_{i}"] * eneg + cells[f"b_{i}"] * epos) / denom, c)
            for i, c in enumerate(_ADA_CANDS)
            if c != (f1, t1, p1)
        ),
        key=lambda it: (it[0], it[1]),
    )
    e2, (f2, t2, p2) = best2
    a2 = 0.5 * math.log((1 - e2) / e2)

    # r12 optimization (guide §1.2): the 2-stump ensemble prediction is
    # h1 when a1 >= a2 else h2 (sign algebra on +-1 hypotheses), so its
    # accuracy count is n - mis(chosen stump) — already measured by the
    # round-1 aggregate. The third full-corpus pass the old code ran
    # here recomputed exactly that integer.
    chosen = (f1, t1, p1) if a1 >= a2 else (f2, t2, p2)
    mis_chosen = next(
        mis[f"m_{i}"] for i, c in enumerate(_ADA_CANDS) if c == chosen
    )
    ok2 = n - mis_chosen

    rows = [
        (1, f1, float(t1), p1, _r6(e1), _r6(a1), _r6(1.0 - e1)),
        (2, f2, float(t2), p2, _r6(e2), _r6(a2), _r6(ok2 / n)),
    ]
    return spark.createDataFrame(
        rows,
        "round INT, feature STRING, threshold DOUBLE, polarity INT, "
        "err DOUBLE, alpha DOUBLE, ensemble_acc DOUBLE",
    ).orderBy("round")


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------

_JL_D, _JL_K, _JL_NVEC = 64, 16, 40


def _jl_sign(j: int, k: int) -> int:
    """Deterministic ±1 from the parity of md5's first hex digit —
    computable identically anywhere, embedded as literals in BOTH
    engines (public md5, no engine hash dependence)."""
    return 1 if int(hashlib.md5(f"{j}_{k}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


_JL_SIGNS = [[_jl_sign(j, k) for j in range(_JL_D)] for k in range(_JL_K)]
_JL_SCALE = math.sqrt(_JL_K)


def _jl_proj_sql(vec: str) -> str:
    """DuckDB: 16-element projected list via list_dot_product."""
    rows = ", ".join(
        f"list_dot_product({vec}, {s}::DOUBLE[]) / {_JL_SCALE!r}"
        for s in _JL_SIGNS
    )
    return f"[{rows}]"


@register(
    "sim_random_projection_jl",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_jl_proj_sql('embedding::DOUBLE[]')} AS pr
      FROM embeddings WHERE vec_id < {_JL_NVEC}
    ),
    pairs AS (
      SELECT round((list_dot_product(a.pr, a.pr) + list_dot_product(b.pr, b.pr)
                    - 2 * list_dot_product(a.pr, b.pr))
                   / (list_dot_product(a.e, a.e) + list_dot_product(b.e, b.e)
                      - 2 * list_dot_product(a.e, b.e)), 6) AS distortion
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE (list_dot_product(a.e, a.e) + list_dot_product(b.e, b.e)
             - 2 * list_dot_product(a.e, b.e)) > 0
    )
    SELECT {_JL_K} AS k_dims, CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(distortion), 6) AS avg_distortion,
           round(min(distortion), 6) AS min_distortion,
           round(max(distortion), 6) AS max_distortion,
           CAST(sum(CASE WHEN distortion BETWEEN 0.8 AND 1.2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_20pct,
           CAST(sum(CASE WHEN distortion BETWEEN 0.5 AND 2.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_2x
    FROM pairs
    """,
)
def sim_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection 64 → 16 dims with a
    deterministic md5-derived Achlioptas ±1 matrix (module literals —
    the same 1024 signs are embedded in the oracle SQL), then the
    squared-distance distortion d²proj/d²orig over the 780 pairs of
    the first 40 vectors. Both engines expand d² as the SAME
    dot-product identity (daa + dbb − 2dab) and round per-pair at 1e-6
    before aggregating, the sim_cosine_topk technique.

    Scale shape: the projection is a map-side JVM fold per vector
    (zip_with + aggregate — 4× fewer bytes into any downstream ANN
    shuffle); the exactness check joins a BOUNDED pair set (40×40
    broadcast self-join), the standard audit-pair pattern."""
    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < _JL_NVEC
    )
    e = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")

    def dot(a: str, b: str) -> str:
        return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, x) -> s + x)"

    proj = F.array(
        *[
            F.expr(
                dot(
                    "transform(embedding, x -> CAST(x AS DOUBLE))",
                    f"array({', '.join(f'{s}D' for s in row)})",
                )
            )
            / _JL_SCALE
            for row in _JL_SIGNS
        ]
    )
    v = emb.select(
        "vec_id",
        e.alias("e"),
        proj.alias("pr"),
        F.expr(dot("transform(embedding, x -> CAST(x AS DOUBLE))",
                   "transform(embedding, x -> CAST(x AS DOUBLE))")).alias("dee"),
    ).withColumn("dpp", F.expr(dot("pr", "pr")))
    a = v.alias("a")
    b = v.alias("b")
    # zero-distance pairs are excluded on BOTH engines: 0/0 would be
    # NULL in DuckDB but NaN in Spark, and NaN poisons Spark's avg/min/
    # max while DuckDB's skip NULL — a hash-divergence trap if two of
    # the sampled embeddings were ever identical (ADVICE r10).
    pairs = (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            (
                F.col("a.dpp")
                + F.col("b.dpp")
                - 2 * F.expr(dot("a.pr", "b.pr"))
            ).alias("d2_proj"),
            (
                F.col("a.dee")
                + F.col("b.dee")
                - 2 * F.expr(dot("a.e", "b.e"))
            ).alias("d2_orig"),
        )
        .filter(F.col("d2_orig") > 0)
        .select(F.round(F.col("d2_proj") / F.col("d2_orig"), 6).alias("distortion"))
    )
    w20 = F.col("distortion").between(0.8, 1.2)
    w2x = F.col("distortion").between(0.5, 2.0)
    return pairs.agg(
        F.lit(_JL_K).alias("k_dims"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("distortion"), 6).alias("avg_distortion"),
        F.round(F.min("distortion"), 6).alias("min_distortion"),
        F.round(F.max("distortion"), 6).alias("max_distortion"),
        F.sum(F.when(w20, 1).otherwise(0)).alias("n_within_20pct"),
        F.sum(F.when(w2x, 1).otherwise(0)).alias("n_within_2x"),
    )


# ---------------------------------------------------------------------------
# Greenwald-Khanna quantile rank bounds
# ---------------------------------------------------------------------------

_GK_QS = [0.25, 0.5, 0.75, 0.9, 0.99]
_GK_EPS = 0.01


@register(
    "sketch_quantile_rank_bounds",
    oracle=f"""
    SELECT q, CAST(count(*) AS BIGINT) AS n, TRUE AS within_rank_bound,
           TRUE AS monotone
    FROM lineitem CROSS JOIN (SELECT unnest({_GK_QS}::DOUBLE[]) AS q) qs
    GROUP BY q ORDER BY q
    """,
)
def sketch_quantile_rank_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile-sketch gate: Spark's JVM Greenwald-Khanna
    (approx_percentile with accuracy 1/ε) estimates 5 quantiles of
    l_extendedprice in ONE map-combinable pass — the map-side partial
    sketches MERGE inside the aggregate, which is exactly the property
    under test — then a second distributed pass computes each
    estimate's EXACT rank and asserts |rank(est) − q·n| ≤ ε·n, plus
    cross-quantile monotonicity. The estimates themselves are
    partition-order-dependent (any GK is), so the driver-hashed
    surface is the (q, n, booleans) table — the
    sketch_error_bounds_audit technique.

    Scale shape: two fact-scale map-combinable aggregations, zero
    Python, zero sort; the sketch state is O(1/ε · log εn) per
    partial. The built-in is the Spark-first answer here — a custom
    mapInPandas sketch would leave whole-stage codegen for no
    capability gain."""
    from weather_tools_spark.operators.bounded import bounded_rows

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_extendedprice").alias("v")
    )
    acc = int(1 / _GK_EPS) * 10
    est_row = bounded_rows(
        li.agg(
            F.percentile_approx(
                "v", F.array(*[F.lit(q) for q in _GK_QS]), F.lit(acc)
            ).alias("est"),
            F.count(F.lit(1)).alias("n"),
        ),
        1,
        "single-row GK estimate aggregate",
    )[0]
    ests, n = list(est_row["est"]), est_row["n"]
    ranks_row = bounded_rows(
        li.agg(
            *[
                F.sum(F.when(F.col("v") <= F.lit(e), 1).otherwise(0)).alias(
                    f"r_{i}"
                )
                for i, e in enumerate(ests)
            ]
        ),
        1,
        "single-row exact-rank aggregate",
    )[0]
    rows = []
    for i, q in enumerate(_GK_QS):
        ok = abs(ranks_row[f"r_{i}"] - q * n) <= _GK_EPS * n
        mono = (i == 0) or (ests[i] >= ests[i - 1])
        rows.append((q, n, bool(ok), bool(mono)))
    return spark.createDataFrame(
        rows, "q DOUBLE, n BIGINT, within_rank_bound BOOLEAN, monotone BOOLEAN"
    ).orderBy("q")


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.10

# Zelen & Severo 26.2.17 upper-tail of the standard normal, as a shared
# literal expression: both engines apply it to the SAME pre-rounded z.
_NORM_TAIL = (
    "(exp(-({z}) * ({z}) / 2) / 2.5066282746310002 * "
    "(0.319381530 * (1 / (1 + 0.2316419 * ({z}))) "
    "- 0.356563782 * pow(1 / (1 + 0.2316419 * ({z})), 2) "
    "+ 1.781477937 * pow(1 / (1 + 0.2316419 * ({z})), 3) "
    "- 1.821255978 * pow(1 / (1 + 0.2316419 * ({z})), 4) "
    "+ 1.330274429 * pow(1 / (1 + 0.2316419 * ({z})), 5)))"
)


@register(
    "stats_benjamini_hochberg",
    oracle=f"""
    WITH g AS (
      SELECT event_type, count(*) AS n, sum(value) AS s,
             sum(value * value) AS sq
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT sum(n) AS n, sum(s) AS s, sum(sq) AS sq FROM g),
    z AS (
      SELECT g.event_type, g.n AS n_type,
             round((g.s / g.n - (tot.s - g.s) / (tot.n - g.n))
                   / sqrt(((g.sq - g.s * g.s / g.n) / (g.n - 1)) / g.n
                          + (((tot.sq - g.sq) - (tot.s - g.s) * (tot.s - g.s)
                              / (tot.n - g.n)) / (tot.n - g.n - 1))
                            / (tot.n - g.n)), 4) + 0.0 AS z
      FROM g, tot
    ),
    p AS (
      SELECT event_type, n_type, z,
             round(2 * {_NORM_TAIL.format(z='abs(z)')}, 8) AS p_value
      FROM z
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY p_value, event_type) AS p_rank,
             count(*) OVER () AS m
      FROM p
    ),
    cut AS (
      SELECT max(CASE WHEN p_value <= {_BH_ALPHA} * p_rank / m
                      THEN p_rank END) AS k_star
      FROM ranked
    )
    SELECT event_type, CAST(n_type AS BIGINT) AS n_type, z, p_value,
           CAST(p_rank AS INT) AS p_rank,
           round({_BH_ALPHA} * p_rank / m, 6) AS bh_threshold,
           COALESCE(p_rank <= cut.k_star, FALSE) AS rejected
    FROM ranked, cut
    ORDER BY p_rank
    """,
)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up (1995) over m = 5 simultaneous
    Welch z-tests, each comparing one event type's mean value against
    the rest — the multiple-testing control every A/B platform applies
    above its per-test statistics. p-values come from the shared
    Zelen-Severo normal-tail polynomial applied to the PRE-ROUNDED z
    (DuckDB has no erf), so both engines compute identical p bits; the
    step-up cut k* = max{{k : p(k) ≤ αk/m}} rejects ranks 1..k*.

    Scale shape: ONE fact-scale map-combinable aggregation to 5
    (n, Σv, Σv²) rows; the rest-of-population moments are derived by
    subtraction from the 1-row total (no second scan, no self-join),
    and the BH machinery runs on the 5-row frame."""
    ev = load_table(spark, "events", sf_dir)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("sq"),
    )
    tot = g.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts"), F.sum("sq").alias("tsq")
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("n").alias("n_type"),
        F.round(
            (F.col("s") / F.col("n") - (F.col("ts") - F.col("s")) / (F.col("tn") - F.col("n")))
            / F.sqrt(
                ((F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
                / F.col("n")
                + (
                    (
                        (F.col("tsq") - F.col("sq"))
                        - (F.col("ts") - F.col("s"))
                        * (F.col("ts") - F.col("s"))
                        / (F.col("tn") - F.col("n"))
                    )
                    / (F.col("tn") - F.col("n") - 1)
                )
                / (F.col("tn") - F.col("n"))
            ),
            4,
        ).alias("zr"),
    )
    z = z.select(
        "event_type", "n_type", (F.col("zr") + F.lit(0.0)).alias("z")
    )
    p = z.withColumn(
        "p_value", F.round(2 * F.expr(_NORM_TAIL.format(z="abs(z)")), 8)
    )
    from pyspark.sql import Window as W

    ranked = p.withColumn(
        "p_rank",
        F.row_number().over(W.orderBy(F.col("p_value"), F.col("event_type"))),
    ).withColumn("m", F.count(F.lit(1)).over(W.partitionBy()))
    ranked = ranked.withColumn(
        "bh_threshold", F.round(F.lit(_BH_ALPHA) * F.col("p_rank") / F.col("m"), 6)
    )
    cut = ranked.agg(
        F.max(
            F.when(
                F.col("p_value") <= F.lit(_BH_ALPHA) * F.col("p_rank") / F.col("m"),
                F.col("p_rank"),
            )
        ).alias("k_star")
    )
    return (
        ranked.crossJoin(F.broadcast(cut))
        .select(
            "event_type",
            "n_type",
            "z",
            "p_value",
            F.col("p_rank").cast("int").alias("p_rank"),
            "bh_threshold",
            F.coalesce(F.col("p_rank") <= F.col("k_star"), F.lit(False)).alias(
                "rejected"
            ),
        )
        .orderBy("p_rank")
    )


# ---------------------------------------------------------------------------
# Multiple OLS regression via distributed normal equations
# ---------------------------------------------------------------------------

# Cramer's-rule fragments over the 10 sufficient moments, shared
# verbatim by BOTH engines (same text → same arithmetic association):
# X'X = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], X'y = [sy,s1y,s2y]
_OLS_DET = (
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) "
    "+ s2 * (s1 * s12 - s11 * s2))"
)
_OLS_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) "
    "+ s2 * (s1y * s12 - s11 * s2y))"
)
_OLS_DET1 = (
    "(n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) "
    "+ s2 * (s1 * s2y - s1y * s2))"
)
_OLS_DET2 = (
    "(n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) "
    "+ sy * (s1 * s12 - s11 * s2))"
)
# output expressions, shared verbatim by both engines
_OLS_OUT = [
    "CAST(n AS BIGINT) AS n",
    f"round({_OLS_DET0} / {_OLS_DET}, 6) AS b0",
    f"round({_OLS_DET1} / {_OLS_DET}, 6) AS b1",
    f"round({_OLS_DET2} / {_OLS_DET}, 6) AS b2",
    f"""round(1 - (syy - ({_OLS_DET0} / {_OLS_DET} * sy
                             + {_OLS_DET1} / {_OLS_DET} * s1y
                             + {_OLS_DET2} / {_OLS_DET} * s2y))
                   / (syy - sy * sy / n), 6) AS r2""",
]
_OLS_FINAL = "SELECT " + ", ".join(_OLS_OUT) + " FROM m"


@register(
    "ml_ols_normal_equations",
    oracle=f"""
    WITH d AS (
      SELECT sum(l_quantity) AS x1, CAST(count(*) AS DOUBLE) AS x2,
             sum(l_extendedprice * (1 - l_discount)) AS y
      FROM lineitem GROUP BY l_orderkey
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM d
    )
    {_OLS_FINAL}
    """,
)
def ml_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression fitted in CLOSED FORM from one
    distributed pass: ŷ(order revenue = Σ extprice·(1−disc)) =
    b0 + b1·(order quantity) + b2·(order line count). The 10 sufficient moments (n, Σx, Σxx,
    Σxy, Σyy) are ONE map-combinable aggregation; β = (X'X)⁻¹X'y is
    then Cramer's rule on the 3×3 normal equations, written once as
    shared SQL fragments so both engines evaluate the identical
    expression tree; R² = 1 − SSE/SST from the same moments. This is
    the textbook scale shape for OLS at 100 TB — sufficient statistics
    are map-side partial-aggregable, the solve is O(p³) driver-free
    arithmetic — the linear complement of ml_logreg_newton (which must
    iterate because logistic loss has no closed form).

    Scale shape: one fact-scale groupBy (per-order features and
    target from the same pass), one aggregation to a SINGLE moment
    row; everything after is scalar expression arithmetic."""
    d = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("x1"),
            F.count(F.lit(1)).cast("double").alias("x2"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
        )
        .select("x1", "x2", "y")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.selectExpr(*_OLS_OUT)


# ---------------------------------------------------------------------------
# Mutual-information feature ranking
# ---------------------------------------------------------------------------

# bucketed doc features; the doc_id%8 control carries ~zero information
# about lang and must rank LAST. floor() is explicit because DuckDB's
# CAST(double AS INT) ROUNDS where Spark's truncates.
_MI_FEATURES = {
    # firstword_bucket carries REAL language signal (vocabularies
    # differ per lang); len_bucket is ~independent of lang in this
    # corpus; the doc_id%8 control is null by construction
    "firstword_bucket": (
        "CAST(ascii(substr(md5(regexp_split_to_array(text, '\\s+')[1]), 1, 1))"
        " % 8 AS INT)"
    ),
    "len_bucket": (
        "LEAST(CAST(floor(len(regexp_split_to_array(text, '\\s+')) / 25.0)"
        " AS INT), 8)"
    ),
    "control_bucket": "CAST(doc_id % 8 AS INT)",
}

_MI_SPARK = {
    "firstword_bucket": (
        "CAST(ascii(substr(md5(element_at(split(text, '\\\\s+'), 1)), 1, 1))"
        " % 8 AS INT)"
    ),
    "len_bucket": (
        "LEAST(CAST(floor(size(split(text, '\\\\s+')) / 25.0) AS INT), 8)"
    ),
    "control_bucket": "CAST(doc_id % 8 AS INT)",
}


def _mi_oracle() -> str:
    parts = []
    for name, expr in _MI_FEATURES.items():
        parts.append(
            f"""
    SELECT '{name}' AS feature, x, lang AS y, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT {expr} AS x, lang FROM documents)
    GROUP BY x, lang"""
        )
    cells = " UNION ALL ".join(parts)
    return f"""
    WITH cells AS ({cells}),
    nn AS (SELECT feature, sum(c) AS n FROM cells GROUP BY feature),
    mx AS (SELECT feature, x, sum(c) AS cx FROM cells GROUP BY feature, x),
    my AS (SELECT feature, y, sum(c) AS cy FROM cells GROUP BY feature, y),
    mi AS (
      SELECT cells.feature,
             sum((c * 1.0 / n) * ln(c * 1.0 * n / (cx * cy))) AS mi
      FROM cells
      JOIN nn USING (feature)
      JOIN mx ON cells.feature = mx.feature AND cells.x = mx.x
      JOIN my ON cells.feature = my.feature AND cells.y = my.y
      GROUP BY cells.feature
    ),
    hx AS (
      SELECT mx.feature, -sum((cx * 1.0 / n) * ln(cx * 1.0 / n)) AS h_feature,
             count(*) AS kx
      FROM mx JOIN nn ON mx.feature = nn.feature GROUP BY mx.feature
    ),
    hy AS (
      SELECT my.feature, -sum((cy * 1.0 / n) * ln(cy * 1.0 / n)) AS h_label,
             count(*) AS ky
      FROM my JOIN nn ON my.feature = nn.feature GROUP BY my.feature
    )
    SELECT mi.feature, round(mi.mi, 6) + 0.0 AS mi,
           round(mi.mi - (hx.kx - 1) * (hy.ky - 1) * 0.5 / nn.n, 6) + 0.0
             AS mi_corrected,
           round(hx.h_feature, 6) AS h_feature,
           round(hy.h_label, 6) AS h_label,
           round(mi.mi / least(hx.h_feature, hy.h_label), 6) + 0.0 AS nmi,
           CAST(row_number() OVER (ORDER BY
                round(mi.mi - (hx.kx - 1) * (hy.ky - 1) * 0.5 / nn.n, 6) DESC,
                mi.feature) AS INT) AS rank
    FROM mi
    JOIN hx ON mi.feature = hx.feature
    JOIN hy ON mi.feature = hy.feature
    JOIN nn ON mi.feature = nn.feature
    ORDER BY rank
    """


@register("ml_mutual_information_rank", oracle=_mi_oracle())
def ml_mutual_information_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information feature ranking against the lang label —
    I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over a real-signal feature
    (md5 bucket of the first token: vocabularies differ per language),
    a near-null length bucket, and a doc_id%8 null CONTROL. Raw plug-in
    MI is biased UP by (Kx−1)(Ky−1)/(2n) — enough to rank the null
    control FIRST on small samples (observed in-round at sf≤0.1) — so
    the ranking statistic is the Miller-Madow corrected
    mi_corrected = I − (Kx−1)(Ky−1)/(2n), the correction every honest
    feature-selection pass needs; raw mi, entropies, and normalized MI
    are reported alongside. Ranking compares 1e-6-ROUNDED corrected MI
    on both engines so summation-order drift on the bounded cell sums
    cannot flip it.

    Scale shape: ONE doc scan — the three features pivot long via a
    map-side stack() — feeding one map-combinable aggregation to a
    ≤(features×buckets×langs) cell table; that table is a BOUNDED
    driver frame (bounded_pandas, like the AdaBoost selection and BPE
    merge tables), and margins/entropies/MI are key-sorted driver
    arithmetic on it — a distributed margins-join formulation measured
    11 exchanges for the same bounded math."""
    from weather_tools_spark.operators.bounded import bounded_pandas

    docs = load_table(spark, "documents", sf_dir)
    feats = docs.selectExpr(
        "lang AS y", *[f"{expr} AS {name}" for name, expr in _MI_SPARK.items()]
    )
    stack_args = ", ".join(f"'{n}', {n}" for n in _MI_SPARK)
    long = feats.select(
        "y",
        F.expr(f"stack({len(_MI_SPARK)}, {stack_args}) AS (feature, x)"),
    ).select("feature", "x", "y")
    cells = bounded_pandas(
        long.groupBy("feature", "x", "y").agg(F.count(F.lit(1)).alias("c")),
        4096,
        "MI contingency cells (features × ≤16 buckets × languages)",
    ).sort_values(["feature", "x", "y"])  # deterministic summation order

    rows = []
    for feature, grp in cells.groupby("feature", sort=True):
        n = int(grp["c"].sum())
        cx = grp.groupby("x", sort=True)["c"].sum()
        cy = grp.groupby("y", sort=True)["c"].sum()
        mi = sum(
            (c / n) * math.log(c * n / (cx[xx] * cy[yy]))
            for xx, yy, c in zip(grp["x"], grp["y"], grp["c"])
        )
        hx = -sum((c / n) * math.log(c / n) for c in cx)
        hy = -sum((c / n) * math.log(c / n) for c in cy)
        mm = mi - (len(cx) - 1) * (len(cy) - 1) * 0.5 / n
        rows.append(
            (
                feature,
                _r6(mi) + 0.0,
                _r6(mm) + 0.0,
                _r6(hx),
                _r6(hy),
                _r6(mi / min(hx, hy)) + 0.0,
            )
        )
    rows.sort(key=lambda r: (-r[2], r[0]))
    out = [r + (i + 1,) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        out,
        "feature STRING, mi DOUBLE, mi_corrected DOUBLE, h_feature DOUBLE, "
        "h_label DOUBLE, nmi DOUBLE, rank INT",
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Wave 2: exact ROC-AUC, Markov entropy rate, source KL divergence,
# Burrows' delta, Theil-Sen robust slope
# ---------------------------------------------------------------------------


@register(
    "ml_roc_auc_exact",
    oracle="""
    WITH scored AS (
      SELECT len(regexp_split_to_array(text, '\\s+')) AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    g AS (
      SELECT score,
             CAST(sum(y) AS BIGINT) AS n1,
             CAST(sum(1 - y) AS BIGINT) AS n0
      FROM scored GROUP BY score
    ),
    cum AS (
      SELECT score, n1, n0,
             COALESCE(sum(n0) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0_below
      FROM g
    ),
    tot AS (SELECT sum(n1) AS p, sum(n0) AS n FROM g)
    SELECT CAST(tot.p AS BIGINT) AS n_pos, CAST(tot.n AS BIGINT) AS n_neg,
           round(sum(n1 * (n0_below + 0.5 * n0)) / (tot.p * tot.n), 6) AS auc,
           CAST(count(*) AS BIGINT) AS n_distinct_scores
    FROM cum, tot
    GROUP BY tot.p, tot.n
    """,
)
def ml_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank-sum identity with the
    midrank tie correction: AUC = Σ_v n1(v)·(N0_below(v) + ½n0(v)) /
    (N1·N0) over per-score-VALUE counts — every term is an integer
    (or integer/2) product, so both engines compute identical doubles
    and the value hash cannot drift. Score = document token count
    (integer, heavily tied — exactly the case where naive rank AUC is
    wrong and midranks matter); labels = lang='en'. Complements
    ml_classifier_eval's thresholded metrics with the
    threshold-independent one.

    Scale shape: ONE fact-scale map-combinable aggregation to the
    distinct-score frame (bounded by the score's integer range), then
    a prefix-sum window and a 1-row total on that bounded frame — the
    orders_gini/KS cumulative pattern. No per-row ranking shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        F.size(F.split("text", r"\s+")).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = scored.groupBy("score").agg(
        F.sum("y").alias("n1"), F.sum(1 - F.col("y")).alias("n0")
    )
    from pyspark.sql import Window as W

    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    cum = g.select(
        "score",
        "n1",
        "n0",
        F.coalesce(F.sum("n0").over(w), F.lit(0)).alias("n0_below"),
    )
    tot = g.agg(F.sum("n1").alias("p"), F.sum("n0").alias("n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("p", "n")
        .agg(
            F.round(
                F.sum(F.col("n1") * (F.col("n0_below") + 0.5 * F.col("n0")))
                / (F.col("p") * F.col("n")),
                6,
            ).alias("auc"),
            F.count(F.lit(1)).alias("n_distinct_scores"),
        )
        .select(
            F.col("p").alias("n_pos"),
            F.col("n").alias("n_neg"),
            "auc",
            "n_distinct_scores",
        )
    )


@register(
    "events_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS state, next_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    rowsum AS (SELECT state, sum(n) AS n_row FROM c GROUP BY state),
    tot AS (SELECT sum(n) AS n_tot FROM c),
    h AS (
      SELECT c.state,
             round(1.0 * rowsum.n_row / tot.n_tot, 6) AS pi_empirical,
             round(-sum((1.0 * c.n / rowsum.n_row)
                        * ln(1.0 * c.n / rowsum.n_row)), 6) AS h_state
      FROM c JOIN rowsum ON c.state = rowsum.state, tot
      GROUP BY c.state, rowsum.n_row, tot.n_tot
    ),
    rate AS (
      SELECT round(-sum((1.0 * c.n / tot.n_tot)
                        * ln(1.0 * c.n / rowsum.n_row)), 6) AS entropy_rate
      FROM c JOIN rowsum ON c.state = rowsum.state, tot
    )
    SELECT h.state, h.pi_empirical, h.h_state, rate.entropy_rate
    FROM h, rate
    ORDER BY h.state
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the empirical event-type Markov chain —
    H = −Σ_ij (c_ij/C)·ln(c_ij/c_i·) — with the per-state conditional
    entropies H_i and the empirical state weights: how predictable the
    NEXT event is given the current one, the sequence-level complement
    of events_transition_matrix / events_markov_stationary (which this
    reuses nothing from — one lead window, pure count arithmetic).

    Scale shape: the lead window is user-partitioned (the
    sessionization shuffle key), transition counts are one
    map-combinable aggregate to a ≤|types|² frame, and every entropy
    is arithmetic on that bounded frame."""
    from weather_tools_spark.operators.dedup import _persist
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    seq = ev.select(
        F.col("event_type").alias("state"),
        F.lead("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = _persist(
        seq.groupBy("state", "next_type").agg(F.count(F.lit(1)).alias("n"))
    )
    rowsum = c.groupBy("state").agg(F.sum("n").alias("n_row"))
    tot = c.agg(F.sum("n").alias("n_tot"))
    joined = c.join(rowsum, "state").crossJoin(F.broadcast(tot))
    h = joined.groupBy("state", "n_row", "n_tot").agg(
        F.round(
            -F.sum(
                (1.0 * F.col("n") / F.col("n_row"))
                * F.log(1.0 * F.col("n") / F.col("n_row"))
            ),
            6,
        ).alias("h_state")
    ).select(
        "state",
        F.round(1.0 * F.col("n_row") / F.col("n_tot"), 6).alias("pi_empirical"),
        "h_state",
    )
    rate = joined.agg(
        F.round(
            -F.sum(
                (1.0 * F.col("n") / F.col("n_tot"))
                * F.log(1.0 * F.col("n") / F.col("n_row"))
            ),
            6,
        ).alias("entropy_rate")
    )
    return h.crossJoin(F.broadcast(rate)).orderBy("state")


@register(
    "corpus_source_kl_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY source, w),
    s AS (SELECT source, sum(c) AS c_s FROM sw GROUP BY source),
    wv AS (SELECT w, sum(c) AS c_w FROM sw GROUP BY w),
    tot AS (SELECT sum(c) AS c_tot FROM sw)
    SELECT sw.source,
           CAST(s.c_s AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_source,
           round(sum((1.0 * sw.c / s.c_s)
                     * ln((1.0 * sw.c / s.c_s) / (1.0 * wv.c_w / tot.c_tot))), 6)
             AS kl_vs_corpus,
           round(-sum((1.0 * sw.c / s.c_s)
                      * ln(1.0 * wv.c_w / tot.c_tot)), 6) AS cross_entropy
    FROM sw JOIN s ON sw.source = s.source JOIN wv ON sw.w = wv.w, tot
    GROUP BY sw.source, s.c_s, tot.c_tot
    ORDER BY sw.source
    """,
)
def corpus_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence against the corpus-wide
    distribution, KL(p_source ‖ p_corpus), plus the cross-entropy —
    the mixture diagnostic that tells a data pipeline WHICH feed
    drifts from the blend it is supposed to match (the per-source
    complement of corpus_dsir_importance's per-document score). Every
    source's support is a subset of the corpus support by
    construction, so no zero-probability guard is needed and KL ≥ 0
    exactly.

    Scale shape: ONE token-scale shuffle to the (source, word) count
    frame; source totals, corpus word totals, and both divergences are
    arithmetic on that frame (same contract as the Kneser-Ney count
    tables). The count frame is deliberately NOT persisted: it is
    vocab×sources-scale, and the r10 A/B at sfx1.0 measured 11.6 s
    persisted vs 1.9 s unpersisted — Catalyst's exchange reuse already
    shares the shuffle across consumers, while the cache pays full
    materialization for nothing."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split("text", r"\s+")).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    s = sw.groupBy("source").agg(F.sum("c").alias("c_s"))
    wv = sw.groupBy("w").agg(F.sum("c").alias("c_w"))
    tot = sw.agg(F.sum("c").alias("c_tot"))
    p_s = 1.0 * F.col("c") / F.col("c_s")
    p_c = 1.0 * F.col("c_w") / F.col("c_tot")
    return (
        sw.join(s, "source")
        .join(wv, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "c_s", "c_tot")
        .agg(
            F.count(F.lit(1)).alias("vocab_source"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_vs_corpus"),
            F.round(-F.sum(p_s * F.log(p_c)), 6).alias("cross_entropy"),
        )
        .select(
            "source",
            F.col("c_s").alias("n_tokens"),
            "vocab_source",
            "kl_vs_corpus",
            "cross_entropy",
        )
        .orderBy("source")
    )


_BURROWS_TOPK = 30


@register(
    "text_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    top AS (
      SELECT w FROM toks GROUP BY w
      ORDER BY count(*) DESC, w LIMIT {_BURROWS_TOPK}
    ),
    stot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
             FROM toks GROUP BY source),
    f AS (
      SELECT stot.source, top.w,
             1000.0 * COALESCE(c.c, 0) / stot.n_s AS fpm
      FROM stot CROSS JOIN top
      LEFT JOIN (SELECT source, w, CAST(count(*) AS BIGINT) AS c
                 FROM toks GROUP BY source, w) c
        ON c.source = stot.source AND c.w = top.w
    ),
    mu AS (
      SELECT w, avg(fpm) AS m,
             sqrt(avg(fpm * fpm) - avg(fpm) * avg(fpm)) AS sd
      FROM f GROUP BY w
    ),
    z AS (
      SELECT f.source, f.w, (f.fpm - mu.m) / mu.sd AS z
      FROM f JOIN mu ON f.w = mu.w
      WHERE mu.sd > 1e-12
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_words,
           round(avg(abs(a.z - b.z)), 6) AS delta
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY delta, source_a, source_b
    LIMIT 25
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (2002) — the classic stylometric
    authorship-attribution distance: per-source per-mille frequencies
    of the corpus's top-{_BURROWS_TOPK} words, z-scored across sources
    (population σ), Delta(a,b) = mean |z_a − z_b|; the 25 most similar
    source pairs. In an LLM pipeline this is the provenance screen
    that flags two "different" feeds as the same underlying crawl.
    Words with σ ≈ 0 across sources are excluded on both engines (no
    0/0), and the σ uses the same E[x²]−E[x]² form in both.

    Scale shape (r11 rewrite): one token-scale shuffle to the
    (source, word) counts, whose exchange all three consumers reuse;
    the grid zero-fill is a LEFT join against the top-word-filtered
    counts (a broadcast hash join on the ≤|sources|·{_BURROWS_TOPK}-row
    frame), NOT against the vocab-scale count frame — the r10 plan
    joined sources×top against the FULL (source, word) frame, which
    EnsureRequirements re-partitioned (the 22-exchange outlier VERDICT
    r10 flagged). The top-k vocabulary, frequency grid, z-scores and
    pair join are all arithmetic on frames bounded by
    |sources|·{_BURROWS_TOPK}. The (source, word) count frame is NOT
    persisted — r10 A/B at sfx1.0: 25.0 s persisted vs 1.8 s
    unpersisted (a vocab×sources-scale cache loses to exchange-reused
    recompute).

    Wall-clock honesty (r12 A/B, bench_archive/AB_r11_rewrites.json):
    at sf0.1 on a quiet host the r11 zero-fill rewrite is marginally
    SLOWER than the r10 plan (median 0.93 s vs 0.79 s, interleaved
    warm runs) — the r11-claimed 0.16 s median did not reproduce;
    both plans sit on the local session floor. The rewrite is kept
    for its structural bound: the zero-fill join's stream side is
    |sources|·top-k instead of vocab-scale, the term that dominates
    at corpus scale."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    top = (
        sw.groupBy("w")
        .agg(F.sum("c").alias("cw"))
        .orderBy(F.col("cw").desc(), "w")
        .limit(_BURROWS_TOPK)
        .select("w")
    )
    stot = sw.groupBy("source").agg(F.sum("c").alias("n_s"))
    # counts restricted to the top-k words: a map-side broadcast semi
    # filter over the reused sw exchange, bounded by |sources|*K rows —
    # small enough to be the BROADCAST build side of the zero-fill join
    swt = sw.join(F.broadcast(top), "w")
    f = (
        stot.crossJoin(F.broadcast(top))
        .join(F.broadcast(swt), ["source", "w"], "left")
        .select(
            "source",
            "w",
            (1000.0 * F.coalesce(F.col("c"), F.lit(0)) / F.col("n_s")).alias(
                "fpm"
            ),
        )
    )
    mu = f.groupBy("w").agg(
        F.avg("fpm").alias("m"),
        F.sqrt(F.avg(F.col("fpm") * F.col("fpm")) - F.avg("fpm") * F.avg("fpm")).alias("sd"),
    )
    z = (
        f.join(F.broadcast(mu), "w")
        .filter(F.col("sd") > 1e-12)
        .select("source", "w", ((F.col("fpm") - F.col("m")) / F.col("sd")).alias("z"))
    )
    # The z pair join stays a broadcast SELF-JOIN: the measured A/B at
    # sf0.1 has it at 0.22 s vs 1.0 s for the map-side array-pair
    # expansion (the adamic-adar pattern buys nothing here — z is
    # already bounded at |sources|*K rows, and the extra collect_list
    # shuffle + higher-order explode stages cost more than the static
    # plan duplication they remove; runtime ReusedExchange collapses
    # the duplicated sw subtrees anyway).
    a = z.alias("a")
    b = z.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(F.abs(F.col("a.z") - F.col("b.z"))), 6).alias("delta"),
        )
        .orderBy("delta", "source_a", "source_b")
        .limit(25)
    )


@register(
    "stats_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
               AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    slopes AS (
      SELECT (1.0 * b.c - a.c) / (b.d - a.d) AS s
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    ols AS (
      SELECT regr_slope(c, d) AS ols_s FROM daily
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(s, 0.5), 6) AS theil_sen_slope,
           round((SELECT ols_s FROM ols), 6) AS ols_slope
    FROM slopes
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily event volume: the MEDIAN of
    all pairwise slopes (c_j−c_i)/(d_j−d_i) — the estimator that
    shrugs off the outlier days that drag OLS (reported alongside for
    contrast, via the same Σ-moment identity DuckDB's regr_slope
    uses). Slopes are ratios of integer counts over integer day gaps,
    and the median rides Spark `percentile` ≡ DuckDB `quantile_cont`
    interpolation (the orders_price_percentiles equivalence).

    Scale shape: the fact table aggregates to ONE ROW PER DAY first
    (map-combinable), so the O(days²) pair join is on a bounded frame
    (365 days → 66k slope rows per year of data, independent of event
    volume) — the standard robust-regression compromise at scale;
    beyond a few years, swap in the repeated-median or a
    slope-histogram approximation."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.select(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from weather_tools_spark.operators.dedup import _persist

    daily = _persist(daily)
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).select(
        ((1.0 * F.col("b.c") - F.col("a.c")) / (F.col("b.d") - F.col("a.d"))).alias(
            "s"
        )
    )
    # OLS slope from the same moment identity regr_slope uses
    ols = daily.agg(
        (
            (F.avg(F.col("d") * F.col("c")) - F.avg("d") * F.avg("c"))
            / (F.avg(F.col("d") * F.col("d")) - F.avg("d") * F.avg("d"))
        ).alias("ols_s")
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        slopes.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.expr("percentile(s, 0.5)"), 6).alias("theil_sen_slope"),
        )
        .crossJoin(F.broadcast(ols))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            "n_pairs",
            "theil_sen_slope",
            F.round("ols_s", 6).alias("ols_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 3: HITS hubs/authorities, PACF via Durbin-Levinson, NB learning
# curve
# ---------------------------------------------------------------------------

_HITS_ITERS = 8


@register(
    "graph_hits_nations",
    oracle=f"""
    WITH RECURSIVE edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    m AS (
      SELECT a.dst AS n1, b.dst AS n2, sum(a.w * b.w) AS mw
      FROM edges a JOIN edges b ON a.src = b.src
      GROUP BY a.dst, b.dst
    ),
    it(step, n, a) AS (
      SELECT 0, dst, CAST(1.0 AS DOUBLE) FROM (SELECT DISTINCT dst FROM edges)
      UNION ALL
      SELECT step + 1, m.n2, sum(i.a * m.mw)
      FROM it i JOIN m ON m.n1 = i.n
      WHERE step < {_HITS_ITERS}
      GROUP BY step + 1, m.n2
    ),
    af AS (
      SELECT n, a / sum(a) OVER () AS auth
      FROM it WHERE step = {_HITS_ITERS}
    ),
    hub0 AS (
      SELECT e.src AS n, sum(e.w * af.auth) AS h
      FROM edges e JOIN af ON e.dst = af.n
      GROUP BY e.src
    ),
    hf AS (SELECT n, h / sum(h) OVER () AS hub FROM hub0)
    SELECT af.n AS nationkey, round(af.auth, 6) AS authority,
           round(COALESCE(hf.hub, 0.0), 6) AS hub,
           CAST(row_number() OVER (ORDER BY round(af.auth, 6) DESC, af.n)
                AS INT) AS auth_rank
    FROM af LEFT JOIN hf ON af.n = hf.n
    ORDER BY auth_rank
    """,
)
def graph_hits_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the customer-nation
    → supplier-nation trade graph (same edge list as
    graph_pagerank_nations): authority = dominant eigenvector of AᵀA
    by {_HITS_ITERS} UN-normalized power steps from the all-ones
    vector, L1-normalized ONCE at the end (scale-invariant, so
    per-step normalization — awkward inside a recursive CTE — is
    unnecessary; the iterate stays < 1e150 for any store below ~10 PB
    at this graph's fan-in, far inside double range), hubs = A·a
    normalized. Rounded at 1e-6, ranked on the rounded score.

    Scale split (the pagerank/markov schedule): the expensive stage is
    the fact-scale edge aggregation into ≤|nations|² rows; the AᵀA
    co-occurrence matrix and the power iteration run on that bounded
    summary (driver math on a bounded_rows table, like
    events_markov_stationary), and the oracle replays the identical
    iterates through a recursive CTE."""
    from weather_tools_spark.operators.bounded import bounded_rows

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    edges = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    erows = bounded_rows(
        edges, 4096, "nation-nation trade edge summary (≤ |nations|² rows)"
    )
    # driver math on the bounded summary, key-sorted for determinism
    import collections

    out_of = collections.defaultdict(list)
    for r in sorted(erows, key=lambda r: (r["src"], r["dst"])):
        out_of[r["src"]].append((r["dst"], r["w"]))
    m: dict[tuple[int, int], float] = collections.defaultdict(float)
    for src in sorted(out_of):
        for n1, w1 in out_of[src]:
            for n2, w2 in out_of[src]:
                m[(n1, n2)] += w1 * w2
    nodes = sorted({r["dst"] for r in erows})
    a = {n: 1.0 for n in nodes}
    for _ in range(_HITS_ITERS):
        nxt = {n: 0.0 for n in nodes}
        for (n1, n2), mw in sorted(m.items()):
            nxt[n2] += a[n1] * mw
        a = nxt
    tot = sum(a[n] for n in nodes)
    auth = {n: a[n] / tot for n in nodes}
    hub = collections.defaultdict(float)
    for r in sorted(erows, key=lambda r: (r["src"], r["dst"])):
        hub[r["src"]] += r["w"] * auth[r["dst"]]
    htot = sum(hub.values())
    ranked = sorted(nodes, key=lambda n: (-_r6(auth[n]), n))
    rows = [
        (
            int(n),
            _r6(auth[n]),
            _r6(hub.get(n, 0.0) / htot) if htot else 0.0,
            i + 1,
        )
        for i, n in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows, "nationkey INT, authority DOUBLE, hub DOUBLE, auth_rank INT"
    ).orderBy("auth_rank")


_PACF_LAGS = 6


def _pacf_oracle() -> str:
    """Unrolled Durbin-Levinson recursion as chained CTEs: phi{{k}}
    tables are ≤k rows, rho(i) scalar subqueries read the 6-row ACF
    CTE. Generated so the recursion depth is a constant, not SQL."""
    rho = "(SELECT r FROM acf WHERE lag = {i})"
    parts = [
        f"""
    days AS MATERIALIZED (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    st AS (SELECT avg(x) AS mu FROM days),
    ss AS (SELECT sum((x - mu) * (x - mu)) AS ss FROM days, st),
    acf AS MATERIALIZED (
      SELECT k.lag,
             round(sum((a.x - st.mu) * (b.x - st.mu)) / ss.ss, 9) AS r
      FROM (SELECT unnest(range(1, {_PACF_LAGS + 1})) AS lag) k
      JOIN days a ON TRUE
      JOIN days b ON b.d = a.d + k.lag, st, ss
      GROUP BY k.lag, ss.ss
    ),
    phi1 AS (SELECT 1 AS j, {rho.format(i=1)} AS v)"""
    ]
    for k in range(2, _PACF_LAGS + 1):
        prev = f"phi{k - 1}"
        parts.append(
            f"""
    kk{k} AS (
      SELECT ({rho.format(i=k)} - sum(p.v * (SELECT r FROM acf WHERE lag = {k} - p.j)))
             / (1 - sum(p.v * (SELECT r FROM acf WHERE lag = p.j))) AS v
      FROM {prev} p
    ),
    phi{k} AS (
      SELECT p.j AS j, p.v - (SELECT v FROM kk{k}) * pm.v AS v
      FROM {prev} p JOIN {prev} pm ON pm.j = {k} - p.j
      UNION ALL
      SELECT {k}, (SELECT v FROM kk{k})
    )"""
        )
    pacf_rows = ["SELECT 1 AS lag, (SELECT v FROM phi1 WHERE j = 1) AS p"] + [
        f"SELECT {k}, (SELECT v FROM kk{k})" for k in range(2, _PACF_LAGS + 1)
    ]
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT acf.lag, round(acf.r, 6) + 0.0 AS acf,
           round(pf.p, 6) + 0.0 AS pacf
    FROM acf JOIN ({" UNION ALL ".join(pacf_rows)}) pf ON pf.lag = acf.lag
    ORDER BY acf.lag
    """
    )


@register("events_pacf_durbin_levinson", oracle=_pacf_oracle())
def events_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1..{_PACF_LAGS} via the Durbin-Levinson recursion — the AR-order
    diagnostic that separates DIRECT lag-k dependence from dependence
    inherited through shorter lags (the pacf cutoff picks p in
    AR(p) model selection; complements events_autocorrelation's raw
    ACF). ACF values are rounded at 1e-9 on BOTH engines before the
    recursion so engine summation drift cannot amplify through the
    division chain; outputs rounded at 1e-6 with −0.0 normalized.

    Scale shape: the fact table reduces to ≤horizon-days rows
    (map-combinable count); the lag products are a bounded self-join
    and the DL recursion is O(lags²) scalar arithmetic on the 6-value
    ACF table (driver math on a bounded_rows fetch; the oracle unrolls
    the same recursion as chained CTEs)."""
    from weather_tools_spark.operators.bounded import bounded_rows

    ev = load_table(spark, "events", sf_dir)
    days = (
        ev.groupBy(
            F.floor(F.unix_micros("ts") / 1_000_000.0 / 86400.0)
            .cast("bigint")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    st = days.agg(F.avg("x").alias("mu"))
    centered = days.crossJoin(F.broadcast(st)).select(
        "d", (F.col("x") - F.col("mu")).alias("cx")
    )
    ss = centered.agg(F.sum(F.col("cx") * F.col("cx")).alias("ss"))
    lags = spark.range(1, _PACF_LAGS + 1).select(F.col("id").alias("lag"))
    a = centered.alias("a")
    b = centered.alias("b")
    acf_df = (
        lags.join(a, F.lit(True))
        .join(b, F.col("b.d") == F.col("a.d") + F.col("lag"))
        .crossJoin(F.broadcast(ss))
        .groupBy("lag", "ss")
        .agg(F.round(F.sum(F.col("a.cx") * F.col("b.cx")) / F.col("ss"), 9).alias("r"))
    )
    rows = bounded_rows(acf_df, _PACF_LAGS, "ACF table (one row per lag)")
    rho = {int(r["lag"]): float(r["r"]) for r in rows}
    phi = {1: {1: rho[1]}}
    pacf = {1: rho[1]}
    for k in range(2, _PACF_LAGS + 1):
        prev = phi[k - 1]
        num = rho[k] - sum(prev[j] * rho[k - j] for j in sorted(prev))
        den = 1 - sum(prev[j] * rho[j] for j in sorted(prev))
        kk = num / den
        phi[k] = {j: prev[j] - kk * prev[k - j] for j in sorted(prev)}
        phi[k][k] = kk
        pacf[k] = kk
    out = [
        (k, _r6(rho[k]) + 0.0, _r6(pacf[k]) + 0.0)
        for k in range(1, _PACF_LAGS + 1)
    ]
    return spark.createDataFrame(
        out, "lag BIGINT, acf DOUBLE, pacf DOUBLE"
    ).orderBy("lag")


_LC_FRACTIONS = [1, 2, 4]  # md5-bucket quarters: 25%, 50%, 100%


def _lc_nb_sql(k: int) -> str:
    """One NB train-on-fraction / eval-on-all accuracy row (DuckDB)."""
    train = (
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4"
        f" < {k}"
    )
    return f"""
    SELECT {k} / 4.0 AS fraction,
           (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE {train})
             AS n_train,
           CAST(count(*) AS BIGINT) AS n_eval,
           round(avg(CASE WHEN pred_lang = true_lang THEN 1.0 ELSE 0.0 END), 6)
             AS accuracy
    FROM (
      WITH tr AS MATERIALIZED (
        SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\\s+')) AS w
        FROM documents WHERE {train}
      ),
      wl AS MATERIALIZED (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY lang, w
      ),
      cl AS MATERIALIZED (
        SELECT wl.lang, CAST(sum(c) AS BIGINT) AS c_l,
               (SELECT count(*) FROM documents d
                WHERE d.lang = wl.lang AND {train.replace('doc_id', 'd.doc_id')})
                 AS n_l
        FROM wl GROUP BY wl.lang
      ),
      v AS MATERIALIZED (
        SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab,
               (SELECT count(*) FROM documents WHERE {train}) AS n_docs
        FROM tr
      ),
      ev AS MATERIALIZED (
        SELECT doc_id, lang AS true_lang,
               unnest(regexp_split_to_array(text, '\\s+')) AS w
        FROM documents
      ),
      dl AS MATERIALIZED (
        SELECT e.doc_id, e.true_lang, c.lang AS cand,
               CAST(count(*) AS BIGINT) AS n_tok,
               sum(ln(COALESCE(wl.c, 0) + 1)) AS s_num
        FROM ev e
        CROSS JOIN (SELECT DISTINCT lang FROM documents) c
        LEFT JOIN wl ON wl.lang = c.lang AND wl.w = e.w
        GROUP BY e.doc_id, e.true_lang, c.lang
      ),
      scored AS (
        SELECT dl.doc_id, dl.true_lang, dl.cand,
               round(ln(cl.n_l * 1.0 / v.n_docs) + dl.s_num
                     - dl.n_tok * ln(cl.c_l + v.vocab), 6) AS s
        FROM dl JOIN cl ON cl.lang = dl.cand, v
      )
      SELECT doc_id, true_lang,
             (array_agg(cand ORDER BY s DESC, cand ASC))[1] AS pred_lang
      FROM scored GROUP BY doc_id, true_lang
    )
    """


@register(
    "ml_nb_learning_curve",
    oracle=" UNION ALL ".join(_lc_nb_sql(k) for k in _LC_FRACTIONS)
    + " ORDER BY fraction",
)
def ml_nb_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve of the multinomial naive-Bayes langid: train on
    deterministic md5-bucket fractions (25% / 50% / 100% of documents,
    nested — every smaller split is a subset of the larger), evaluate
    resubstitution accuracy on the FULL corpus. The data-scaling
    readout every curation pipeline wants before buying more data —
    is the model in the data-limited or capacity-limited regime?
    Same smoothing/priors/rounding/tie-break as ml_naive_bayes_langid,
    with train-derived vocabulary (unseen eval words contribute
    exactly 0 via log(c+1)).

    Scale shape: the per-(doc, word) eval counts shuffle ONCE and fan
    into the three fraction branches of a single unioned plan
    (exchange reuse — the r10 persist audit's mechanism, relied on
    instead of any cache); each branch's training tables are
    vocab-bounded aggregations of the md5-filtered train split, and
    the per-language priors are bounded driver tables exactly as in
    the parent query."""
    import math

    from weather_tools_spark.operators.bounded import bounded_rows
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 4
    )
    toks_all = docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split(F.col("text"), r"\s+")).alias("w"),
    )
    tw = toks_all.groupBy("doc_id", "true_lang", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # r13 (guide §1.2 — remove redundant corpus passes): the fractions
    # are NESTED md5 buckets (bucket<1 ⊂ bucket<2 ⊂ bucket<4=all), so
    # every per-fraction training table is a CUMULATIVE view of one
    # (lang, w) aggregate carrying a count per fraction — the train
    # split's token explode runs ONCE for all three branches, not once
    # per branch per consumer (the r12 plan re-exploded it ~3.5
    # corpus-passes' worth across the 3 collect jobs + 3 wmap
    # lineages). The aggregate is vocab-bounded (|langs| × |vocab|
    # rows), persisted for its 4 bounded consumers and released by the
    # caller like every dedup-operator persist.
    base = _persist(
        docs.select(
            F.when(bucket < 1, F.lit(1)).when(bucket < 2, F.lit(2)).otherwise(F.lit(4)).alias("g"),
            "lang",
            F.explode(F.split(F.col("text"), r"\s+")).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(
            F.sum(F.when(F.col("g") <= 1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("g") <= 2, 1).otherwise(0)).alias("c2"),
            F.count(F.lit(1)).alias("c4"),
        )
    )
    # one bounded collect for ALL fractions: per-language token totals
    # and doc counts per fraction, plus the per-fraction vocabulary
    # sizes (distinct w with any occurrence in that fraction)
    lang_stats = base.groupBy("lang").agg(
        F.sum("c1").alias("c_l1"), F.sum("c2").alias("c_l2"), F.sum("c4").alias("c_l4")
    )
    n_docs = docs.select(
        F.when(bucket < 1, F.lit(1)).when(bucket < 2, F.lit(2)).otherwise(F.lit(4)).alias("g"),
        "lang",
    ).groupBy("lang").agg(
        F.sum(F.when(F.col("g") <= 1, 1).otherwise(0)).alias("n_l1"),
        F.sum(F.when(F.col("g") <= 2, 1).otherwise(0)).alias("n_l2"),
        F.count(F.lit(1)).alias("n_l4"),
    )
    vocab_row = (
        base.groupBy("w")
        .agg(F.max("c1").alias("m1"), F.max("c2").alias("m2"))
        .agg(
            F.sum(F.when(F.col("m1") > 0, 1).otherwise(0)).alias("vocab1"),
            F.sum(F.when(F.col("m2") > 0, 1).otherwise(0)).alias("vocab2"),
            F.count(F.lit(1)).alias("vocab4"),
        )
    )
    all_stats = bounded_rows(
        lang_stats.join(n_docs, "lang").crossJoin(F.broadcast(vocab_row)),
        100,
        "per-language NB prior table, all fractions (one row per language code)",
    )
    out_branches = []
    for k in _LC_FRACTIONS:
        wl = base.filter(F.col(f"c{k}") > 0).select(
            "lang", "w", F.col(f"c{k}").alias("c")
        )
        wmap = wl.groupBy("w").agg(
            F.map_from_entries(F.collect_list(F.struct("lang", "c"))).alias("cmap")
        )
        stats = [
            {"lang": r["lang"], "c_l": r[f"c_l{k}"], "n_l": r[f"n_l{k}"], "vocab": r[f"vocab{k}"]}
            for r in all_stats
            if r[f"n_l{k}"] > 0
        ]
        vocab = stats[0]["vocab"]
        n_train = sum(r["n_l"] for r in stats)
        langs = sorted(r["lang"] for r in stats)
        st = {r["lang"]: r for r in stats}
        prior = {L: math.log(st[L]["n_l"] / n_train) for L in langs}
        denom = {L: math.log(st[L]["c_l"] + vocab) for L in langs}
        per_doc = (
            tw.join(F.broadcast(wmap), "w", "left")
            .groupBy("doc_id", "true_lang")
            .agg(
                F.sum("cnt").alias("n_tok"),
                *[
                    F.sum(
                        F.col("cnt")
                        * F.log(
                            F.coalesce(
                                F.element_at(F.col("cmap"), F.lit(L)), F.lit(0)
                            )
                            + F.lit(1)
                        )
                    ).alias(f"s{i}")
                    for i, L in enumerate(langs)
                ],
            )
        )
        cand = F.array(
            *[
                F.struct(
                    F.round(
                        F.lit(prior[L]) + F.col(f"s{i}")
                        - F.col("n_tok") * F.lit(denom[L]),
                        6,
                    ).alias("s"),
                    F.lit(-i).alias("nidx"),
                )
                for i, L in enumerate(langs)
            ]
        )
        best = F.array_max(cand)
        pred = per_doc.select(
            "true_lang",
            F.element_at(F.array(*[F.lit(L) for L in langs]), -best["nidx"] + 1).alias(
                "pred_lang"
            ),
        )
        out_branches.append(
            pred.agg(
                F.lit(k / 4.0).alias("fraction"),
                F.lit(sum(int(r["n_l"]) for r in stats)).cast("bigint").alias("n_train"),
                F.count(F.lit(1)).alias("n_eval"),
                F.round(
                    F.avg(
                        F.when(F.col("pred_lang") == F.col("true_lang"), 1.0).otherwise(
                            0.0
                        )
                    ),
                    6,
                ).alias("accuracy"),
            )
        )
    out = out_branches[0]
    for b in out_branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("fraction")
