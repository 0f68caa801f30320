"""Round-12 wave 8: ranking/calibration evaluation and diagnostics the
registry's ML-eval family did not yet cover, plus the time-series
portmanteau test and graph-partition quality.

Same contract as every wave: each query is a Catalyst plan with a
DuckDB oracle computing the identical frame; every float column is a
ratio of INTEGER moments (or arithmetic on doubles both engines derive
identically), rounded at the same literal decimals on both sides, so
the driver's value hash cannot drift with partial-aggregation order.

Reference parity note: the reference pipelines (weather_dl /
weather_mv / weather_sp, see SURVEY.md §2) contain no evaluation
operators at all — this wave extends the LLM-data-pipeline surface the
build brief makes first-class (ranking eval for retrieval corpora,
forecast calibration, drift/seasonality diagnostics, community quality
for dedup graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register
from weather_tools_spark.queries.analytics import _sp_edges_df, _sp_edges_sql
from weather_tools_spark.queries.stats_ext import _NDCG_TERMS

# ---------------------------------------------------------------------------
# Average precision (tie-aware, block form)
# ---------------------------------------------------------------------------


@register(
    "ml_average_precision",
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
             sum(n1) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(n0) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM g
    ),
    tot AS (SELECT sum(n1) AS p, sum(n0) AS n FROM g)
    SELECT CAST(tot.p AS BIGINT) AS n_pos,
           CAST(tot.n AS BIGINT) AS n_neg,
           CAST(count(*) AS BIGINT) AS n_distinct_scores,
           round(sum(CAST(n1 AS DOUBLE) / tot.p * tp / (tp + fp)), 6)
             AS average_precision
    FROM cum, tot
    GROUP BY tot.p, tot.n
    """,
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware average precision — the PR-curve companion to
    ml_roc_auc_exact (AUC is threshold-free but class-balance-blind;
    AP is the metric retrieval and rare-class screening actually
    report). Block form over distinct score VALUES: descending score
    groups contribute (n1_g / P) * precision-at-block-end, which
    equals classical AP exactly when scores are untied and is the
    deterministic tie convention otherwise (a per-row ranking would
    be permutation-dependent under ties — same reasoning as the
    midrank AUC). Score = document token count, label = lang='en',
    matching the AUC query so the two metrics are directly
    comparable on the same task.

    Every term is integer (group counts, prefix sums) over the
    bounded distinct-score frame, with two exact divisions per group
    — identical doubles on both engines. Scale shape: ONE
    map-combinable fact aggregation to the distinct-score frame, a
    bounded prefix window, a 1-row total."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        F.size(F.split("text", r"\s+")).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = scored.groupBy("score").agg(
        F.sum("y").alias("n1"), F.sum(1 - F.col("y")).alias("n0")
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "n1", F.sum("n1").over(w).alias("tp"), F.sum("n0").over(w).alias("fp")
    )
    tot = g.agg(F.sum("n1").alias("p"), F.sum("n0").alias("n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("p", "n")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_scores"),
            F.round(
                F.sum(
                    F.col("n1").cast("double")
                    / F.col("p")
                    * F.col("tp")
                    / (F.col("tp") + F.col("fp"))
                ),
                6,
            ).alias("average_precision"),
        )
        .select(
            F.col("p").cast("long").alias("n_pos"),
            F.col("n").cast("long").alias("n_neg"),
            "n_distinct_scores",
            "average_precision",
        )
    )


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test on the daily count series
# ---------------------------------------------------------------------------

_LB_LAGS = 7
# chi-square 0.95 quantiles for df = 1..7 (literal on both engines —
# no cross-libm inverse-CDF dependence)
_LB_CHI2_05 = [3.841459, 5.991465, 7.814728, 9.487729, 11.070498, 12.591587, 14.067140]
_LB_CHI2_SQL = ", ".join(
    f"({k + 1}, {v})" for k, v in enumerate(_LB_CHI2_05)
)


@register(
    "stats_ljung_box",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM daily
    ),
    lagk AS (
      SELECT k.lag AS lag,
             CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
             CAST(sum(a.x) AS BIGINT) AS sh,
             CAST(sum(b.x) AS BIGINT) AS st
      FROM (SELECT unnest(range(1, {_LB_LAGS + 1})) AS lag) k
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + k.lag
      GROUP BY k.lag
    ),
    r AS (
      SELECT lag,
             (sxy - (CAST(s1 AS DOUBLE) / n) * (sh + st)
                  + nk * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             / (s2 - (CAST(s1 AS DOUBLE) / n) * s1) AS rk,
             m.n AS n
      FROM lagk, m
    ),
    q AS (
      SELECT lag, rk, n,
             n * (n + 2.0) * sum(rk * rk / (n - lag)) OVER (ORDER BY lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qlb
      FROM r
    )
    SELECT q.lag AS lag,
           round(rk, 6) AS acf,
           round(qlb, 6) AS q_lb,
           c.crit AS chi2_05,
           qlb > c.crit AS reject_iid
    FROM q JOIN (VALUES {_LB_CHI2_SQL}) AS c(lag, crit) ON c.lag = q.lag
    ORDER BY lag
    """,
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (1978) for serial correlation of the
    daily event-count series: Q_m = n(n+2) Σ_{{k≤m}} r_k²/(n−k) at
    lags 1..{_LB_LAGS}, against the χ²(m) 0.05 critical values — the
    standard "is this feed i.i.d. over days or does it carry
    autocorrelation my sampler must stratify over" screen, and the
    decision-rule completion of events_autocorrelation (which reports
    r_k without a test).

    Determinism: every moment is an INTEGER sum (Σx, Σx², Σx_t·x_{{t+k}},
    head/tail sums over the lag pairs) and μ enters only as the same
    exact division on both engines — the centered cross-moment uses
    the algebraic identity Σ(x_t−μ)(x_{{t+k}}−μ) = Sxy − μ(Sh+St) +
    n_k μ², so no per-row double is ever summed. χ² criticals are
    literals. Scale shape: one map-combinable fact aggregation to the
    calendar-bounded daily frame; the lag self-join, the running Q
    window and the criticals join all run on ≤ {_LB_LAGS} + days
    rows."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").alias("lag"))
    a = daily.alias("a")
    b = daily.alias("b")
    lagk = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.day") == F.col("a.day") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("nk"),
            F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
            F.sum(F.col("a.x")).alias("sh"),
            F.sum(F.col("b.x")).alias("st"),
        )
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r = lagk.crossJoin(F.broadcast(m)).select(
        "lag",
        (
            (F.col("sxy") - mu * (F.col("sh") + F.col("st")) + F.col("nk") * mu * mu)
            / (F.col("s2") - mu * F.col("s1"))
        ).alias("rk"),
        "n",
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    q = r.select(
        "lag",
        "rk",
        (
            F.col("n")
            * (F.col("n") + 2.0)
            * F.sum(F.col("rk") * F.col("rk") / (F.col("n") - F.col("lag"))).over(wq)
        ).alias("qlb"),
    )
    crit = spark.createDataFrame(
        [(k + 1, v) for k, v in enumerate(_LB_CHI2_05)], "lag int, crit double"
    )
    return (
        q.join(F.broadcast(crit), "lag")
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.round("rk", 6).alias("acf"),
            F.round("qlb", 6).alias("q_lb"),
            F.col("crit").alias("chi2_05"),
            (F.col("qlb") > F.col("crit")).alias("reject_iid"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Modularity of the region partition over the nation trade graph
# ---------------------------------------------------------------------------


@register(
    "graph_modularity_regions",
    oracle=f"""
    WITH {_sp_edges_sql()},
    lab AS (SELECT n_nationkey AS nk, n_regionkey AS c FROM nation),
    el AS (
      SELECT ls.c AS cs, ld.c AS cd
      FROM e JOIN lab ls ON ls.nk = e.src JOIN lab ld ON ld.nk = e.dst
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM el),
    byc AS (
      SELECT c,
             CAST(sum(CASE WHEN intra THEN 1 ELSE 0 END) AS BIGINT) AS ec,
             CAST(sum(douts) AS BIGINT) AS dout,
             CAST(sum(dins) AS BIGINT) AS din
      FROM (
        SELECT cs AS c, cs = cd AS intra, 1 AS douts, 0 AS dins FROM el
        UNION ALL
        SELECT cd AS c, FALSE AS intra, 0 AS douts, 1 AS dins FROM el
      ) GROUP BY c
    ),
    terms AS (
      SELECT c, ec, dout, din,
             CAST(ec AS DOUBLE) / m.m
               - (CAST(dout AS DOUBLE) / m.m) * (CAST(din AS DOUBLE) / m.m)
               AS term
      FROM byc, m
    )
    SELECT CAST(c AS BIGINT) AS regionkey,
           ec AS intra_edges, dout AS out_degree, din AS in_degree,
           round(term, 6) AS modularity_term,
           round((SELECT sum(term) FROM terms), 6) AS modularity_q
    FROM terms ORDER BY regionkey
    """,
)
def graph_modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed modularity of the REGION partition over the
    nation-to-nation trade graph (the registry's shared top-k-sparsified
    edge frame): Q = Σ_c [e_c/m − (dout_c/m)(din_c/m)] — the
    partition-quality score that tells a dedup/clustering pipeline
    whether a candidate community structure (here: the natural
    geographic one) explains the observed edges better than the
    degree-preserving null model. Completes the graph family's
    community toolkit (components, label propagation, k-core/truss
    find structure; modularity SCORES a given structure).

    Determinism: e_c, dout_c, din_c, m are integers from one edge-scale
    aggregation; Q's terms are exact divisions of those integers —
    identical doubles both engines, rounded at 6 on both. Note the
    intra-edge count rides the same unioned long frame as the degree
    sums (one aggregation, not three). Scale shape: the edge build is
    the fact-scale join (shared with BFS/pagerank); everything after
    is ≤|nations|² rows with a broadcast 1-row m."""
    edges = _sp_edges_df(spark, sf_dir)
    lab = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("c")
    )
    ls = lab.alias("ls")
    ld = lab.alias("ld")
    el = (
        edges.join(F.broadcast(ls), F.col("ls.nk") == F.col("src"))
        .join(F.broadcast(ld), F.col("ld.nk") == F.col("dst"))
        .select(F.col("ls.c").alias("cs"), F.col("ld.c").alias("cd"))
    )
    # one explode instead of a self-union: a union would duplicate the
    # whole fact-scale edge-build subtree in the plan; exploding each
    # edge into its (src-side, dst-side) contribution rows keeps the
    # build single-subtree (intra counted once, on the src side)
    sides = el.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("cs").alias("c"),
                    F.when(F.col("cs") == F.col("cd"), 1).otherwise(0).alias("ecs"),
                    F.lit(1).alias("douts"),
                    F.lit(0).alias("dins"),
                ),
                F.struct(
                    F.col("cd").alias("c"),
                    F.lit(0).alias("ecs"),
                    F.lit(0).alias("douts"),
                    F.lit(1).alias("dins"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    byc = sides.groupBy("c").agg(
        F.sum("ecs").alias("ec"),
        F.sum("douts").alias("dout"),
        F.sum("dins").alias("din"),
    )
    # m = |edges| = Σ dout — derived from byc itself, so the second
    # reference to the fact-scale subtree sits ABOVE byc's exchange and
    # Spark's ReuseExchange collapses the duplicate build at runtime
    m = byc.agg(F.sum("dout").alias("m"))
    terms = byc.crossJoin(F.broadcast(m)).select(
        "c",
        "ec",
        "dout",
        "din",
        (
            F.col("ec").cast("double") / F.col("m")
            - (F.col("dout").cast("double") / F.col("m"))
            * (F.col("din").cast("double") / F.col("m"))
        ).alias("term"),
    )
    qtot = terms.agg(F.sum("term").alias("qsum"))
    return (
        terms.crossJoin(F.broadcast(qtot))
        .select(
            F.col("c").cast("long").alias("regionkey"),
            F.col("ec").cast("long").alias("intra_edges"),
            F.col("dout").cast("long").alias("out_degree"),
            F.col("din").cast("long").alias("in_degree"),
            F.round("term", 6).alias("modularity_term"),
            F.round("qsum", 6).alias("modularity_q"),
        )
        .orderBy("regionkey")
    )


# ---------------------------------------------------------------------------
# Lift / gains deciles
# ---------------------------------------------------------------------------

_LG_CUTS = [i / 10.0 for i in range(1, 10)]
_LG_CUTS_SQL = ", ".join(str(c) for c in _LG_CUTS)


@register(
    "ml_lift_gains_deciles",
    oracle=f"""
    WITH base AS (
      SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    cuts AS (SELECT quantile_cont(value, [{_LG_CUTS_SQL}]) AS cs FROM base),
    bucketed AS (
      SELECT len(list_filter(cuts.cs, c -> base.value > c)) AS decile, y
      FROM base, cuts
    ),
    byd AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM bucketed GROUP BY decile
    ),
    tot AS (SELECT sum(n) AS nn, sum(pos) AS pp FROM byd)
    SELECT CAST(decile AS BIGINT) AS decile, n, pos,
           round(CAST(pos AS DOUBLE) * tot.nn / (n * tot.pp), 6) AS lift,
           round(CAST(sum(pos) OVER (ORDER BY decile DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / tot.pp, 6) AS cum_gain
    FROM byd, tot ORDER BY decile DESC
    """,
)
def ml_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift and cumulative-gains table over score deciles — the
    campaign/screening readout (does the top score decile concentrate
    the positives, and by how much over random) that complements
    ROC/PR with the business-facing view. Score = event value, label =
    purchase. Deciles are assigned by counting EXACT decile cutoffs
    (percentile ≡ quantile_cont, the engine's proven equivalence)
    below each value — no global ranking window over the fact, so the
    plan stays map-combinable at 100 TB: one 1-row cutoff aggregate
    broadcast into one grouped aggregation; ties at a boundary fall on
    the same side in both engines because the comparison is against
    the identical cutoff double.

    Lift_d = (pos_d/n_d)/(P/N) and gains are exact integer ratios,
    rounded at 6 on both sides; the running gains window rides the
    ≤10-row decile frame."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cuts = base.agg(
        F.expr(f"percentile(value, array({_LG_CUTS_SQL}))").alias("cs")
    )
    bucketed = base.crossJoin(F.broadcast(cuts)).select(
        F.expr("size(filter(cs, c -> value > c))").alias("decile"), "y"
    )
    byd = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    tot = byd.agg(F.sum("n").alias("nn"), F.sum("pos").alias("pp"))
    wg = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        byd.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.round(
                F.col("pos").cast("double") * F.col("nn") / (F.col("n") * F.col("pp")),
                6,
            ).alias("lift"),
            F.round(
                F.sum("pos").over(wg).cast("double") / F.col("pp"), 6
            ).alias("cum_gain"),
        )
        .orderBy(F.col("decile").desc())
    )


# ---------------------------------------------------------------------------
# Brier score with Murphy decomposition
# ---------------------------------------------------------------------------


@register(
    "ml_brier_decomposition",
    oracle="""
    WITH base AS (
      SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    byb AS (
      SELECT bin, (bin + 0.5) / 10.0 AS p,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS k
      FROM base GROUP BY bin
    ),
    tot AS (SELECT sum(n) AS nn, sum(k) AS kk FROM byb),
    parts AS (
      SELECT
        sum(k * (p - 1) * (p - 1) + (n - k) * p * p) / tot.nn AS brier,
        sum(n * (p - CAST(k AS DOUBLE) / n) * (p - CAST(k AS DOUBLE) / n))
          / tot.nn AS reliability,
        sum(n * (CAST(k AS DOUBLE) / n - CAST(tot.kk AS DOUBLE) / tot.nn)
              * (CAST(k AS DOUBLE) / n - CAST(tot.kk AS DOUBLE) / tot.nn))
          / tot.nn AS resolution,
        (CAST(tot.kk AS DOUBLE) / tot.nn)
          * (1 - CAST(tot.kk AS DOUBLE) / tot.nn) AS uncertainty,
        CAST(tot.nn AS BIGINT) AS n, CAST(tot.kk AS BIGINT) AS n_pos
      FROM byb, tot GROUP BY tot.nn, tot.kk
    )
    SELECT n, n_pos,
           round(brier, 6) AS brier,
           round(reliability, 6) AS reliability,
           round(resolution, 6) AS resolution,
           round(uncertainty, 6) AS uncertainty,
           round(reliability - resolution + uncertainty, 6) AS brier_check
    FROM parts
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy (1973) decomposition — reliability
    (calibration error), resolution (how much the forecast separates
    outcomes) and uncertainty (base-rate entropy), with the identity
    Brier = REL − RES + UNC emitted as a cross-check column (exact
    here because the forecast is constant within each bin). The
    forecast is the binned score p_b = (bin+0.5)/10 over 10 equal
    value bins (integer floor — no round-half tie hazard), outcome =
    purchase; this is the decomposition view of ml_calibration_report.

    Determinism: bin counts and positives are integers; p_b and every
    decomposition term are arithmetic on exact divisions of those
    integers — identical doubles, rounded at 6 both sides. Scale
    shape: ONE map-combinable aggregation over the fact to ≤10 bin
    rows; everything else is 1-row arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    byb = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    )
    byb = byb.select("bin", ((F.col("bin") + 0.5) / 10.0).alias("p"), "n", "k")
    tot = byb.agg(F.sum("n").alias("nn"), F.sum("k").alias("kk"))
    ob = F.col("k").cast("double") / F.col("n")
    obar = F.col("kk").cast("double") / F.col("nn")
    parts = (
        byb.crossJoin(F.broadcast(tot))
        .groupBy("nn", "kk")
        .agg(
            (
                F.sum(
                    F.col("k") * (F.col("p") - 1) * (F.col("p") - 1)
                    + (F.col("n") - F.col("k")) * F.col("p") * F.col("p")
                )
                / F.first("nn")
            ).alias("brier"),
            (
                F.sum(F.col("n") * (F.col("p") - ob) * (F.col("p") - ob))
                / F.first("nn")
            ).alias("reliability"),
            (
                F.sum(F.col("n") * (ob - obar) * (ob - obar)) / F.first("nn")
            ).alias("resolution"),
        )
    )
    return parts.select(
        F.col("nn").cast("long").alias("n"),
        F.col("kk").cast("long").alias("n_pos"),
        F.round("brier", 6).alias("brier"),
        F.round("reliability", 6).alias("reliability"),
        F.round("resolution", 6).alias("resolution"),
        F.round(obar * (1 - obar), 6).alias("uncertainty"),
        F.round(
            F.col("reliability") - F.col("resolution") + obar * (1 - obar), 6
        ).alias("brier_check"),
    )


# ---------------------------------------------------------------------------
# Mean reciprocal rank over the retrieval-eval construction
# ---------------------------------------------------------------------------

_MRR_K = 10


@register(
    "ml_mrr_retrieval",
    oracle=f"""
    WITH docs_t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ),
    cand AS (
      SELECT q.term, d.doc_id,
             len(list_filter(d.t, x -> x = q.term)) AS tf,
             len(d.t) AS dl
      FROM docs_t d,
           (SELECT unnest(['{_NDCG_TERMS[0]}', '{_NDCG_TERMS[1]}',
                           '{_NDCG_TERMS[2]}']) AS term) q
      WHERE len(list_filter(d.t, x -> x = q.term)) > 0
    ),
    ranked AS (
      SELECT term, doc_id, tf >= 2 AS rel,
             row_number() OVER (PARTITION BY term
               ORDER BY round(tf * 1.0 / dl, 9) DESC, doc_id) AS rk
      FROM cand
    ),
    firstrel AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(min(CASE WHEN rel THEN rk END) AS BIGINT) AS first_rel_rank
      FROM ranked GROUP BY term
    )
    SELECT term, n_candidates, first_rel_rank,
           round(CASE WHEN first_rel_rank IS NULL THEN 0.0
                      ELSE 1.0 / first_rel_rank END, 6) AS reciprocal_rank,
           COALESCE(first_rel_rank <= {_MRR_K}, FALSE) AS hit_at_{_MRR_K}
    FROM firstrel ORDER BY term
    """,
)
def ml_mrr_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank / hit@{_MRR_K} retrieval evaluation over
    the SAME query-term + tf-density ranking construction as
    ml_ndcg_ranking_eval (scores rounded at 1e-9 before ranking,
    doc_id tie-break → engine-exact permutation): per term, the rank
    of the first relevant candidate (relevance = tf ≥ 2), its
    reciprocal, and whether it lands in the top {_MRR_K} — the metric
    trio RAG retrievers are actually tuned on (nDCG grades the whole
    list; MRR grades time-to-first-hit).

    Ranks are integers from the deterministic permutation; 1/rank is
    one exact division. Scale shape identical to the nDCG query: one
    map-side candidate pass, per-term bounded ranking windows."""
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
    wr = Window.partitionBy("term").orderBy(
        F.round(F.col("tf") * F.lit(1.0) / F.col("dl"), 9).desc(), "doc_id"
    )
    ranked = cand.select(
        "term",
        (F.col("tf") >= 2).alias("rel"),
        F.row_number().over(wr).alias("rk"),
    )
    firstrel = ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.min(F.when(F.col("rel"), F.col("rk"))).cast("long").alias("first_rel_rank"),
    )
    return firstrel.select(
        "term",
        "n_candidates",
        "first_rel_rank",
        F.round(
            F.when(F.col("first_rel_rank").isNull(), 0.0).otherwise(
                1.0 / F.col("first_rel_rank")
            ),
            6,
        ).alias("reciprocal_rank"),
        F.coalesce(F.col("first_rel_rank") <= _MRR_K, F.lit(False)).alias(
            f"hit_at_{_MRR_K}"
        ),
    ).orderBy("term")


# ---------------------------------------------------------------------------
# Wave 8b: Mann-Kendall trend, turning-points randomness, reciprocity
# ---------------------------------------------------------------------------

_MK_Z_05 = 1.959964  # two-sided normal 0.05 critical (literal, both engines)


@register(
    "stats_mann_kendall",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    ties AS (
      SELECT CAST(COALESCE(sum(tp * (tp - 1) * (2 * tp + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS tp FROM daily GROUP BY x)
      WHERE tp > 1
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    v AS (
      SELECT (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0 AS var_s, n
      FROM nn, ties
    )
    SELECT n, s.s AS s_statistic, round(var_s, 6) AS var_s,
           round(CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(var_s)
                      WHEN s.s < 0 THEN (s.s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z,
           abs(CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(var_s)
                    WHEN s.s < 0 THEN (s.s + 1) / sqrt(var_s)
                    ELSE 0.0 END) > {_MK_Z_05} AS trend_detected
    FROM s, v
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on the daily event-count
    series — the nonparametric companion to stats_theil_sen_trend
    (Theil-Sen estimates the slope; Mann-Kendall decides whether a
    trend EXISTS): S = Σ_{{i<j}} sgn(x_j − x_i) over all day pairs,
    tie-corrected variance n(n−1)(2n+5)/18 − Σ t_p(t_p−1)(2t_p+5)/18,
    continuity-corrected normal z. The ingest-drift decision rule for
    any daily volume metric.

    Determinism: S and the tie term are pure INTEGER sums over the
    calendar-bounded daily frame's pair join (≤ C(31,2) pairs at any
    scale); variance is one exact division, z one IEEE sqrt+divide —
    identical doubles both engines; the 1.96 critical is a literal.
    Scale shape: one map-combinable fact aggregation, then bounded
    arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(b, F.col("b.day") > F.col("a.day")).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        ).alias("s")
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("tp"))
        .filter(F.col("tp") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n"))
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(
            F.col("s_statistic") > 0,
            (F.col("s_statistic") - 1) / F.sqrt(F.col("var_s_raw")),
        )
        .when(
            F.col("s_statistic") < 0,
            (F.col("s_statistic") + 1) / F.sqrt(F.col("var_s_raw")),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("s").cast("long").alias("s_statistic"),
            var_s.alias("var_s_raw"),
        )
        .select(
            "n",
            "s_statistic",
            F.round("var_s_raw", 6).alias("var_s"),
            F.round(z, 6).alias("z"),
            (F.abs(z) > _MK_Z_05).alias("trend_detected"),
        )
    )


@register(
    "events_turning_points",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT x,
             lag(x) OVER (ORDER BY day) AS prev,
             lead(x) OVER (ORDER BY day) AS nxt
      FROM daily
    ),
    t AS (
      SELECT CAST(sum(CASE WHEN (x > prev AND x > nxt)
                             OR (x < prev AND x < nxt) THEN 1 ELSE 0 END)
                  AS BIGINT) AS t
      FROM lagged WHERE prev IS NOT NULL AND nxt IS NOT NULL
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
    SELECT n, t.t AS turning_points,
           round(2.0 * (n - 2) / 3.0, 6) AS expected,
           round((16.0 * n - 29) / 90.0, 6) AS variance,
           round((t.t - 2.0 * (n - 2) / 3.0)
                 / sqrt((16.0 * n - 29) / 90.0), 6) AS z
    FROM t, nn
    """,
)
def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's turning-points randomness test on the daily count
    series: the number of STRICT interior local extrema versus its
    i.i.d. expectation 2(n−2)/3 and variance (16n−29)/90 — the
    cheapest "is this series random or structured" screen, and the
    third member of the serial-dependence trio (Ljung-Box measures
    autocorrelation, runs-test measures sign clustering, turning
    points measure local alternation).

    The lag/lead window rides the calendar-bounded daily frame (one
    row per day — structural bound); T and n are integers; expected/
    variance/z are exact arithmetic + one IEEE sqrt. Strict
    comparisons mean tied neighbors are NOT turning points —
    identical convention in both engines by construction."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        F.lag("x").over(w).alias("prev"),
        F.lead("x").over(w).alias("nxt"),
    )
    t = lagged.filter(
        F.col("prev").isNotNull() & F.col("nxt").isNotNull()
    ).agg(
        F.sum(
            F.when(
                ((F.col("x") > F.col("prev")) & (F.col("x") > F.col("nxt")))
                | ((F.col("x") < F.col("prev")) & (F.col("x") < F.col("nxt"))),
                1,
            ).otherwise(0)
        ).alias("t")
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n"))
    exp_ = 2.0 * (F.col("n") - 2) / 3.0
    var_ = (16.0 * F.col("n") - 29) / 90.0
    return t.crossJoin(F.broadcast(nn)).select(
        F.col("n").cast("long").alias("n"),
        F.col("t").cast("long").alias("turning_points"),
        F.round(exp_, 6).alias("expected"),
        F.round(var_, 6).alias("variance"),
        F.round((F.col("t") - exp_) / F.sqrt(var_), 6).alias("z"),
    )


@register(
    "graph_reciprocity",
    oracle=f"""
    WITH {_sp_edges_sql()},
    nonloop AS (SELECT src, dst FROM e WHERE src <> dst),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM nonloop),
    loops AS (SELECT CAST(count(*) AS BIGINT) AS n_loops FROM e WHERE src = dst),
    recip AS (
      SELECT CAST(count(*) AS BIGINT) AS r
      FROM nonloop a JOIN nonloop b ON a.src = b.dst AND a.dst = b.src
    )
    SELECT m.m AS m_edges, loops.n_loops AS n_self_loops,
           recip.r AS n_reciprocated,
           round(CAST(recip.r AS DOUBLE) / m.m, 6) AS reciprocity
    FROM m, loops, recip
    """,
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the directed trade graph: the fraction of
    non-loop edges whose reverse edge also exists — the standard
    directed-network symmetry statistic (trade graphs are usually
    highly reciprocal; a drop flags one-way-dominant routing). Self
    loops counted separately (a nation trading with itself is neither
    reciprocal nor not).

    One pass over the bounded (≤ |nations|·k) edge frame; all
    counts integer, one exact division. The fact-scale work is the
    shared edge build (graph family idiom). r12 optimization (guide
    §1.2): the self-join/count tail folds on the driver over the
    bounded edge collect (the graph_shortest_paths contract) — the
    previous relational tail planned 13 exchanges / 16 Spark jobs over
    <=75-row frames."""
    from weather_tools_spark.queries.analytics import _sp_edge_rows
    from weather_tools_spark.queries.round10 import _r6

    edges = {(int(r.src), int(r.dst)) for r in _sp_edge_rows(spark, sf_dir)}
    nonloop = {(s, d) for s, d in edges if s != d}
    m = len(nonloop)
    n_loops = len(edges) - m
    r_count = sum(1 for s, d in nonloop if (d, s) in nonloop)
    recip = _r6(r_count / m) if m else None
    return spark.createDataFrame(
        [(m, n_loops, r_count, recip)],
        "m_edges long, n_self_loops long, n_reciprocated long, reciprocity double",
    )

