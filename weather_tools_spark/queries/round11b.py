"""Round-11 waves 3 and 4: twelve operators extending the
aggregation/text/graph families along the same determinism rules the
r11 hardening proved (integer-scaled exact sums, two-pass
standardized moments, join-based sequence adjacency, chained-CTE
oracle replay of iterative rounds).

Wave 3: distribution-shape testing, stylometric keyness,
vocabulary-richness constants, equity-curve risk, residual
autocorrelation, connected components. Wave 4: rank-based and binary
repeated-measures tests (Friedman, Cochran's Q), Good-Turing
spectrum smoothing, Allan-variance stream stability, Bartlett
variance homogeneity, and Newman degree assortativity.

- Jarque-Bera normality test per event type: the standard
  moments-based screen (is this stream's value distribution Gaussian
  enough for z-score monitoring?). Demonstrates the TWO-PASS
  standardized-moment shape: pass 1 derives mu/sigma from
  integer-scaled exact sums, pass 2 sums rounded powers of the
  identical standardized residual — skew/kurtosis never touch a
  raw x^4 sum whose magnitude would overflow the integer lattice.
- Dunning log-likelihood (G²) keyness: the corpus-linguistics
  source-vs-rest keyword extractor (Dunning 1993; Rayson & Garside
  2000) — the provenance screen that names WHICH words make a feed
  distinctive where burrows_delta only scores how distinctive.
- Yule's K + Simpson's D: closed-form vocabulary-richness constants
  off pure integer frequency moments (sum c, sum c²) — exact on any
  partitioning, no spectrum materialization.
- Maximum drawdown of the daily net-value equity curve: running
  peak minus running total, the risk statistic for cumulative
  metrics; both runnings ride ONE ordered window over the
  calendar-bounded daily frame (one row per day — the domain bound
  the KS/MWU hardening demands, here structural, not assumed).
- Durbin-Watson: lag-1 autocorrelation of daily-volume OLS
  residuals — trend fit via exact integer normal equations (slope
  and intercept are ratios of BIGINTs, bit-identical on both
  engines), residual adjacency as a dense-rank EQUI-JOIN (the
  stats_runs_test shape), never a global lag window.
- Connected components of the intra-region trade subgraph:
  distributed fact-scale edge aggregation (shared _sp_edges_df),
  min-label propagation replayed round-by-round by the oracle's
  chained CTEs — the hash gate certifies every round, not just the
  fixpoint. The label schedule runs on the collected bounded edge
  summary (<= |nations| * top-k rows, the graph_kcore precedent);
  the DATA-SCALE components path is dedup_cluster_canonical, which
  runs the same min-label contraction distributed over document
  duplicate pairs.

Reference scope: none of these exist in the reference (xql has no
statistics surface — SURVEY §2.12); they extend SURVEY §2.4's
aggregation family the same way the r8-r11 stats waves did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.operators.bounded import bounded_rows
from weather_tools_spark.queries import register
from weather_tools_spark.queries.analytics import _sp_edges_df, _sp_edges_sql
from weather_tools_spark.queries.core_sql import _dsum

# integer-scaled exact sum, DuckDB half (the q1/_dsum oracle idiom)
_DS = "(CAST(sum(CAST(round(({expr}) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000)"


def _ds(expr: str) -> str:
    return _DS.format(expr=expr)


# ---------------------------------------------------------------------------
# Jarque-Bera normality test per event type
# ---------------------------------------------------------------------------

_JB_CHI2_05 = 5.991464547107979  # chi-square(2) 0.95 quantile


@register(
    "stats_jarque_bera",
    oracle=f"""
    WITH s1 AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             {_ds('value')} / count(*) AS mu,
             {_ds('value * value')} / count(*) AS ex2
      FROM events GROUP BY event_type
    ),
    sp AS (SELECT event_type, n, mu, sqrt(ex2 - mu * mu) AS sig FROM s1),
    z AS (
      SELECT e.event_type, (e.value - s.mu) / s.sig AS z
      FROM events e JOIN sp s USING (event_type)
    ),
    m AS (
      SELECT z.event_type, min(s.n) AS n,
             {_ds('z * z * z')} / min(s.n) AS skw,
             {_ds('z * z * z * z')} / min(s.n) AS krt
      FROM z JOIN sp s USING (event_type) GROUP BY z.event_type
    ),
    jb AS (
      SELECT event_type, n, round(skw, 6) AS skewness,
             round(krt, 6) AS kurtosis,
             round(n / 6.0 * (skw * skw + (krt - 3) * (krt - 3) / 4.0), 6)
               AS jarque_bera
      FROM m
    )
    SELECT event_type, n, skewness, kurtosis, jarque_bera,
           CAST(CASE WHEN jarque_bera > {_JB_CHI2_05} THEN 1 ELSE 0 END AS INT)
             AS reject_05
    FROM jb ORDER BY event_type
    """,
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of the event-value distribution per
    event type: JB = n/6 * (S² + (K−3)²/4) over the sample skewness S
    and kurtosis K, rejected at the chi-square(2) 0.05 critical value.
    The monitoring question it answers: which event streams can use
    Gaussian z-score alerting at all?

    Determinism is the two-pass standardized-moment shape: pass 1
    computes mu and sigma per type from INTEGER-SCALED exact sums
    (partial-merge-order-proof; sqrt is IEEE-correctly-rounded, so
    sigma is the identical double on both engines); pass 2
    standardizes each value with those identical doubles and
    exact-sums the rounded z³/z⁴ terms (|z| is O(1), so the 1e-6
    lattice loses nothing — where a raw Σx⁴ would overflow the
    64-bit micro-unit lattice at 100x, the standardized form never
    grows with scale). The reject decision compares the ROUNDED
    statistic on both engines. Scale shape: two map-combinable
    aggregations over the fact and one broadcast join of the
    <=|event types|-row moment table — no window, no driver math."""
    ev = load_table(spark, "events", sf_dir)
    s1 = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (_dsum(F.col("value")) / F.count(F.lit(1))).alias("mu"),
        (_dsum(F.col("value") * F.col("value")) / F.count(F.lit(1))).alias("ex2"),
    )
    sp = s1.select(
        "event_type", "n", "mu", F.sqrt(F.col("ex2") - F.col("mu") * F.col("mu")).alias("sig")
    )
    z = ev.join(F.broadcast(sp), "event_type").select(
        "event_type", "n", ((F.col("value") - F.col("mu")) / F.col("sig")).alias("z")
    )
    m = z.groupBy("event_type").agg(
        F.min("n").alias("n"),
        (_dsum(F.col("z") * F.col("z") * F.col("z")) / F.min("n")).alias("skw"),
        (_dsum(F.col("z") * F.col("z") * F.col("z") * F.col("z")) / F.min("n")).alias("krt"),
    )
    jb = m.select(
        "event_type",
        "n",
        F.round(F.col("skw"), 6).alias("skewness"),
        F.round(F.col("krt"), 6).alias("kurtosis"),
        F.round(
            F.col("n") / 6.0
            * (F.col("skw") * F.col("skw") + (F.col("krt") - 3) * (F.col("krt") - 3) / 4.0),
            6,
        ).alias("jarque_bera"),
    )
    return jb.select(
        "event_type",
        "n",
        "skewness",
        "kurtosis",
        "jarque_bera",
        F.when(F.col("jarque_bera") > _JB_CHI2_05, 1).otherwise(0).cast("int").alias("reject_05"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Dunning log-likelihood (G²) keyness per source
# ---------------------------------------------------------------------------

_G2_TOPK = 3


@register(
    "text_dunning_g2_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS a
           FROM toks GROUP BY source, w),
    wv AS (SELECT w, CAST(sum(a) AS BIGINT) AS cw FROM sw GROUP BY w),
    st AS (SELECT source, CAST(sum(a) AS BIGINT) AS ns FROM sw GROUP BY source),
    tot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM sw),
    g AS (
      SELECT sw.source, sw.w, sw.a,
             round(2.0 * (sw.a * ln((sw.a * tot.n) / (wv.cw * st.ns))
                   + CASE WHEN wv.cw - sw.a > 0
                          THEN (wv.cw - sw.a)
                               * ln(((wv.cw - sw.a) * tot.n)
                                    / (wv.cw * (tot.n - st.ns)))
                          ELSE 0 END), 6) AS g2
      FROM sw JOIN wv USING (w) JOIN st USING (source) CROSS JOIN tot
    ),
    rk AS (
      SELECT source, w, a, g2,
             row_number() OVER (PARTITION BY source ORDER BY g2 DESC, w) AS rk
      FROM g
    )
    SELECT source, w AS word, a AS occurrences, g2, CAST(rk AS INT) AS rank
    FROM rk WHERE rk <= {_G2_TOPK} ORDER BY source, rank
    """,
)
def text_dunning_g2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness (G², Dunning 1993 as applied by
    Rayson & Garside 2000): for each source, score every word by the
    two-cell likelihood-ratio statistic comparing its in-source count
    against its rest-of-corpus count (expected counts from the
    marginals), and keep the top-3 keywords. This NAMES the words
    that make a feed distinctive — the complement of burrows_delta,
    which only scores how distinctive.

    Determinism: every ln() argument is a ratio of exact BIGINT
    products (a·N / (c_w·N_s) — both engines convert the identical
    integers and divide once), the statistic is rounded at 1e-6
    BEFORE the per-source ranking, and rank ties break on the word —
    so a 1-ulp libm divergence inside ln cannot reorder the top-k.
    The b = 0 term (word fully concentrated in one source)
    contributes exactly 0 on both engines.

    Scale shape: one token-scale shuffle to the (source, word)
    counts, whose exchange the global word-count and per-source
    total consumers reuse; the keyness join re-keys the count frame
    by word once (vocab-scale, the unavoidable marginal join); the
    per-source top-k is a rank window Spark plans as
    WindowGroupLimit (map-side partial top-k)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    wv = sw.groupBy("w").agg(F.sum("a").alias("cw"))
    st = sw.groupBy("source").agg(F.sum("a").alias("ns"))
    tot = sw.agg(F.sum("a").alias("n"))
    b = F.col("cw") - F.col("a")
    g2 = F.round(
        2.0
        * (
            F.col("a") * F.log((F.col("a") * F.col("n")) / (F.col("cw") * F.col("ns")))
            + F.when(
                b > 0,
                b * F.log((b * F.col("n")) / (F.col("cw") * (F.col("n") - F.col("ns")))),
            ).otherwise(F.lit(0.0))
        ),
        6,
    )
    g = (
        sw.join(wv, "w")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", "w", "a", g2.alias("g2"))
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("g2").desc(), "w")
    )
    return (
        g.withColumn("rk", rk)
        .filter(F.col("rk") <= _G2_TOPK)
        .select(
            "source",
            F.col("w").alias("word"),
            F.col("a").alias("occurrences"),
            "g2",
            F.col("rk").cast("int").alias("rank"),
        )
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------------
# Yule's K + Simpson's D vocabulary-richness constants per source
# ---------------------------------------------------------------------------


@register(
    "text_yule_k",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY source, w)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocabulary,
           round(10000.0 * (sum(c * c) - sum(c))
                 / (CAST(sum(c) AS DOUBLE) * sum(c)), 6) AS yule_k,
           round(CAST(sum(c * (c - 1)) AS DOUBLE)
                 / (CAST(sum(c) AS DOUBLE) * (sum(c) - 1)), 6) AS simpson_d
    FROM sw GROUP BY source ORDER BY source
    """,
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K characteristic (1944) and Simpson's D — the two
    classic repeat-rate vocabulary-richness constants, per source:
    K = 10⁴·(Σc² − N)/N², D = Σc(c−1)/(N(N−1)) over the word
    frequencies c. Both are scale-invariant style fingerprints (K is
    famously stable in text length), the cheap screen for template-
    generated or boilerplate-heavy feeds in an LLM ingest pipeline
    (high K = few types dominate).

    Exactness: both constants are ratios of pure INTEGER moments
    (Σc, Σc²) — the frequency-spectrum identity Σ_m m²V(m) = Σ_w c²
    means no spectrum table is ever materialized, and the only
    doubles are two final correctly-rounded divisions. The N²/N(N−1)
    denominators promote ONE factor to double before multiplying
    (ADVICE r11): a BIGINT N·N silently wraps in Spark's non-ANSI
    long multiply past N ≈ 3·10⁹ tokens/source while DuckDB raises —
    double·bigint is the same IEEE multiply on both engines at every
    N (the integer numerators Σc², Σc(c−1) stay exact to c ≈ 3·10⁹
    per word, far past any real single-word count). Scale shape:
    one token-scale map-combinable shuffle to (source, word) counts,
    one bounded per-source aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    nd = n.cast("double")
    return (
        sw.groupBy("source")
        .agg(
            n.cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocabulary"),
            F.round(10000.0 * (F.sum(F.col("c") * F.col("c")) - n) / (nd * n), 6).alias(
                "yule_k"
            ),
            F.round(
                F.sum(F.col("c") * (F.col("c") - 1)).cast("double") / (nd * (n - 1)), 6
            ).alias("simpson_d"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of the daily net-value equity curve
# ---------------------------------------------------------------------------


@register(
    "events_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(sum(CAST(round((value - 250) * 1000000, 0) AS BIGINT))
                  AS BIGINT) AS flow
      FROM events GROUP BY 1
    ),
    eq AS (SELECT day, sum(flow) OVER (ORDER BY day) AS cum FROM daily),
    dd AS (
      SELECT day, cum, max(cum) OVER (ORDER BY day) - cum AS draw FROM eq
    ),
    mx AS (SELECT max(draw) AS mdraw, max(cum) AS peak FROM dd)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           round((SELECT peak FROM mx) / 1000000.0, 6) AS peak_equity,
           round((SELECT mdraw FROM mx) / 1000000.0, 6) AS max_drawdown,
           CAST((SELECT min(day) FROM dd, mx WHERE dd.draw = mx.mdraw)
                AS BIGINT) AS trough_day
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily net value (value
    centered at the generator's 250 midpoint, so the equity curve
    wanders): running peak minus running total, its maximum, and the
    FIRST day it is attained — the risk statistic for any cumulative
    business metric (revenue retention, token-budget burn-down).

    Exactness: daily flows are summed on the 1e-6 integer lattice and
    STAY integers through the running sum, running max, drawdown and
    the argmax day (equality against the max is integer equality —
    no float tie ambiguity; first-day tie-break is min(day) on both
    engines). The two runnings ride one ordered window over the
    daily frame, which is CALENDAR-BOUNDED (one row per day —
    structural, unlike the value-domain contracts the r11 KS/MWU
    probe had to enforce); the fact-scale work is the one
    map-combinable daily aggregation."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(
        F.sum(F.round((F.col("value") - 250) * 1_000_000, 0).cast("long")).alias("flow")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        F.sum("flow").over(w).alias("cum"),
    ).select("day", "cum", (F.max("cum").over(w) - F.col("cum")).alias("draw"))
    mx = dd.agg(
        F.max("draw").alias("mdraw"),
        F.max("cum").alias("peak"),
        F.count(F.lit(1)).alias("n_days"),
    )
    trough = (
        dd.join(F.broadcast(mx), dd["draw"] == mx["mdraw"])
        .agg(F.min("day").alias("trough_day"))
    )
    return (
        mx.crossJoin(F.broadcast(trough))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.round(F.col("peak") / 1_000_000.0, 6).alias("peak_equity"),
            F.round(F.col("mdraw") / 1_000_000.0, 6).alias("max_drawdown"),
            F.col("trough_day").cast("long").alias("trough_day"),
        )
    )


# ---------------------------------------------------------------------------
# Durbin-Watson residual autocorrelation of the daily-volume trend
# ---------------------------------------------------------------------------


@register(
    "stats_durbin_watson",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    seq AS (SELECT row_number() OVER (ORDER BY day) AS t, c FROM daily),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS sx,
             CAST(sum(c) AS BIGINT) AS sy, CAST(sum(t * t) AS BIGINT) AS sxx,
             CAST(sum(t * c) AS BIGINT) AS sxy
      FROM seq
    ),
    fit AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             (sy - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n AS icept
      FROM s
    ),
    e AS (SELECT t, c - (icept + slope * t) AS r FROM seq, fit),
    num AS (
      SELECT {_ds('(b.r - a.r) * (b.r - a.r)')} AS sdiff
      FROM e a JOIN e b ON b.t = a.t + 1
    ),
    den AS (SELECT {_ds('r * r')} AS sres FROM e)
    SELECT (SELECT n FROM fit) AS n_days,
           round((SELECT slope FROM fit), 6) AS slope,
           round((SELECT icept FROM fit), 6) AS intercept,
           round(sdiff / sres, 6) AS durbin_watson,
           round(1 - sdiff / sres / 2.0, 6) AS rho_lag1
    FROM num, den
    """,
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test on the residuals of the daily-event-volume
    linear trend: DW = Σ(e_t − e_{t−1})² / Σe_t², the canonical
    lag-1 residual-autocorrelation screen (DW ≈ 2 means the trend
    model left no serial structure; DW → 0 flags positive
    autocorrelation that invalidates i.i.d. confidence intervals on
    the trend). Reported with the implied ρ ≈ 1 − DW/2.

    Determinism: the OLS normal equations are ratios of exact BIGINT
    sums (day index and daily count are integers), so slope,
    intercept and every residual are bit-identical doubles on both
    engines; the two residual sums use the integer-scaled exact sum.
    The lag-1 adjacency is a DENSE-RANK EQUI-JOIN (b.t = a.t + 1,
    the stats_runs_test shape) — never a global lag window; the one
    ordered window that assigns t runs over the CALENDAR-BOUNDED
    daily frame (one row per day)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    seq = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"), "c"
    )
    s = seq.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
        F.sum(F.col("t") * F.col("c")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    fit = s.select(
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("icept"),
    )
    e = seq.crossJoin(F.broadcast(fit)).select(
        "t", "n", "slope", "icept",
        (F.col("c") - (F.col("icept") + F.col("slope") * F.col("t"))).alias("r"),
    )
    a = e.alias("a")
    b = e.alias("b")
    num = a.join(b, F.col("b.t") == F.col("a.t") + 1).agg(
        _dsum((F.col("b.r") - F.col("a.r")) * (F.col("b.r") - F.col("a.r"))).alias("sdiff")
    )
    den = e.agg(
        _dsum(F.col("r") * F.col("r")).alias("sres"),
        F.min("n").alias("n_days"),
        F.min("slope").alias("slope"),
        F.min("icept").alias("icept"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("slope"), 6).alias("slope"),
        F.round(F.col("icept"), 6).alias("intercept"),
        F.round(F.col("sdiff") / F.col("sres"), 6).alias("durbin_watson"),
        F.round(1 - F.col("sdiff") / F.col("sres") / 2.0, 6).alias("rho_lag1"),
    )


# ---------------------------------------------------------------------------
# Connected components of the intra-region trade subgraph
# ---------------------------------------------------------------------------

_CC_ROUNDS = 5


def _cc_oracle() -> str:
    """Chained-CTE replay of every min-label propagation round:
    l_{r+1}(v) = min(l_r(v), min over in-neighbors u of l_r(u))."""
    # every CTE is MATERIALIZED (the graph_kcore precedent): each
    # round references the previous one TWICE (own label + neighbor
    # propagation), so without materialization DuckDB re-inlines the
    # whole lineage 2^rounds times — measured 57 s at sfx1.0, 1.5 s
    # materialized
    parts = [
        """
    er AS MATERIALIZED (
      SELECT e.src AS u, e.dst AS v
      FROM e
      JOIN nation cn ON e.src = cn.n_nationkey
      JOIN nation sn ON e.dst = sn.n_nationkey
      WHERE cn.n_regionkey = sn.n_regionkey AND e.src <> e.dst
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM er UNION ALL SELECT v, u FROM er
      )
    ),
    l0 AS (SELECT n_nationkey AS v, n_nationkey AS lbl FROM nation)"""
    ]
    for r in range(1, _CC_ROUNDS + 1):
        parts.append(f"""
    l{r} AS MATERIALIZED (
      SELECT v, min(lbl) AS lbl FROM (
        SELECT v, lbl FROM l{r - 1}
        UNION ALL
        SELECT und.v AS v, l.lbl FROM und JOIN l{r - 1} l ON und.u = l.v
      ) GROUP BY v
    )""")
    return ",".join(parts)


@register(
    "graph_connected_components",
    oracle=f"""
    WITH {_sp_edges_sql()},
    {_cc_oracle()},
    sz AS (
      SELECT lbl, CAST(count(*) AS BIGINT) AS csize
      FROM l{_CC_ROUNDS} GROUP BY lbl
    )
    SELECT CAST(l.v AS INT) AS nationkey, CAST(l.lbl AS INT) AS component,
           sz.csize
    FROM l{_CC_ROUNDS} l JOIN sz USING (lbl)
    ORDER BY nationkey
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the INTRA-REGION trade subgraph (the
    capped customer-nation → supplier-nation edges restricted to
    same-region endpoints): min-label propagation — every node starts
    labeled with its own key; each round every node takes the min of
    its own and its neighbors' labels — run to the fixpoint, with
    component sizes. The trading-bloc decomposition: which nations
    form connected intra-region commerce, and do regions split?

    The oracle replays EVERY propagation round as a chained CTE, so
    the hash gate certifies the round-by-round schedule (label
    monotonicity included), not just the final partition.
    {_CC_ROUNDS} rounds is past the fixpoint on every SF: a
    component's min label reaches every member in at most
    diameter <= |region| - 1 = 4 rounds (pytest asserts one extra
    round changes nothing). Same split as graph_kcore: the
    fact-scale work is the distributed edge aggregation (the shared
    _sp_edges_df plan — orders⋈customer⋈lineitem⋈supplier
    map-combinably reduced to <=|nations|·top-k weighted edges); the
    propagation schedule runs on the collected bounded summary. The
    DATA-SCALE components path in this engine is
    dedup_cluster_canonical, which runs the identical min-label
    contraction DISTRIBUTED over document duplicate pairs."""
    nat_rows = bounded_rows(
        load_table(spark, "nation", sf_dir).select("n_nationkey", "n_regionkey"),
        100,
        "nation → region map (one row per nation)",
    )
    region = {int(r.n_nationkey): int(r.n_regionkey) for r in nat_rows}
    edge_rows = bounded_rows(
        _sp_edges_df(spark, sf_dir),
        75,
        "nation-graph edge summary (<= |nations| * _SP_TOPK = 75)",
    )
    und: set[tuple[int, int]] = set()
    for r in edge_rows:
        s, d = int(r.src), int(r.dst)
        if s != d and region[s] == region[d]:
            und.add((s, d))
            und.add((d, s))
    lbl = {v: v for v in region}
    for _ in range(_CC_ROUNDS):
        nxt = dict(lbl)
        for u, v in und:
            if lbl[u] < nxt[v]:
                nxt[v] = lbl[u]
        lbl = nxt
    sizes: dict[int, int] = {}
    for c in lbl.values():
        sizes[c] = sizes.get(c, 0) + 1
    rows = sorted((v, c, sizes[c]) for v, c in lbl.items())
    return spark.createDataFrame(
        rows, "nationkey INT, component INT, csize BIGINT"
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Wave 4: Friedman test (rank-based repeated measures)
# ---------------------------------------------------------------------------


@register(
    "stats_friedman_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, t.event_type, COALESCE(daily.c, 0) AS c
      FROM (SELECT DISTINCT day FROM daily) d
      CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      LEFT JOIN daily USING (day, event_type)
    ),
    rk AS (
      SELECT day, event_type,
             rank() OVER (PARTITION BY day ORDER BY c)
               + (count(*) OVER (PARTITION BY day, c) - 1) / 2.0 AS r
      FROM grid
    ),
    rs AS (
      SELECT event_type, sum(r) AS rj FROM rk GROUP BY event_type
    ),
    dims AS (
      SELECT CAST((SELECT count(DISTINCT day) FROM daily) AS BIGINT) AS n,
             CAST((SELECT count(DISTINCT event_type) FROM daily) AS BIGINT)
               AS k
    ),
    stat AS (
      SELECT n, k,
             12.0 / (n * k * (k + 1)) * sum(rj * rj) - 3.0 * n * (k + 1)
               AS chi2
      FROM rs, dims GROUP BY n, k
    )
    SELECT n AS n_blocks, k AS k_treatments,
           round(chi2, 6) AS friedman_chi2,
           round(chi2 / (n * (k - 1)), 6) AS kendalls_w
    FROM stat
    """,
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of the daily event-type volume profile:
    blocks = days, treatments = event types, observations = daily
    counts (zero-filled to the full day x type grid); average ranks
    within each day, chi-square_F = 12/(nk(k+1)) * Sum R_j^2 - 3n(k+1),
    reported with Kendall's W concordance. The nonparametric
    repeated-measures ANOVA: is the relative ordering of event types
    consistent across days?

    Determinism: average rank is rank() + (tie_count - 1)/2 — both
    terms integers, so every rank is an exact dyadic multiple of 0.5
    and rank sums are ORDER-INDEPENDENT exact doubles (no integer
    lattice needed); the statistic is closed-form arithmetic on those
    exact sums. The within-day rank window is PARTITIONED by day
    (bounded by |event types| rows per partition, never global).
    Scale shape: one map-combinable fact aggregation; the grid,
    ranks and rank sums are bounded by days x types."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    r = (
        F.rank().over(Window.partitionBy("day").orderBy("c"))
        + (F.count(F.lit(1)).over(Window.partitionBy("day", "c")) - 1) / 2.0
    )
    rk = grid.select("day", "event_type", r.alias("r"))
    rs = rk.groupBy("event_type").agg(F.sum("r").alias("rj"))
    dims = daily.agg(
        F.countDistinct("day").alias("n"), F.countDistinct("event_type").alias("k")
    )
    stat = rs.crossJoin(F.broadcast(dims)).groupBy("n", "k").agg(
        (
            12.0 / (F.col("n") * F.col("k") * (F.col("k") + 1))
            * F.sum(F.col("rj") * F.col("rj"))
            - 3.0 * F.col("n") * (F.col("k") + 1)
        ).alias("chi2")
    )
    return stat.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k_treatments"),
        F.round(F.col("chi2"), 6).alias("friedman_chi2"),
        F.round(F.col("chi2") / (F.col("n") * (F.col("k") - 1)), 6).alias("kendalls_w"),
    )


# ---------------------------------------------------------------------------
# Wave 4: Cochran's Q (binary repeated measures)
# ---------------------------------------------------------------------------


@register(
    "stats_cochran_q",
    oracle="""
    WITH cell AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    dims AS (
      SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k,
             CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
             CAST(sum(cnt) AS BIGINT) AS tot
      FROM cell
    ),
    x AS (
      SELECT cell.user_id, cell.event_type
      FROM cell, dims
      WHERE cell.cnt * dims.nu * dims.k > dims.tot
    ),
    rowt AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS ri FROM x GROUP BY user_id
    ),
    colt AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS cj FROM x GROUP BY event_type
    ),
    s AS (
      SELECT (SELECT k FROM dims) AS k,
             (SELECT nu FROM dims) AS n_users,
             (SELECT CAST(sum(cj * cj) AS BIGINT) FROM colt) AS sc2,
             (SELECT CAST(sum(ri) AS BIGINT) FROM rowt) AS n,
             (SELECT CAST(sum(ri * ri) AS BIGINT) FROM rowt) AS sr2
    )
    SELECT k AS k_treatments, n_users,
           CAST(k - 1 AS BIGINT) AS df,
           round(CASE WHEN k * n - sr2 = 0 THEN 0.0
                      ELSE CAST((k - 1) * (k * sc2 - n * n) AS DOUBLE)
                           / (k * n - sr2) END, 6) AS cochran_q
    FROM s
    """,
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test on the user x event-type OVER-ENGAGEMENT
    matrix: x_ij = 1 iff user i's count of type j exceeds the global
    average cell count (cnt_ij · n_users · k > total — a pure-INTEGER
    comparison, so the threshold is scale-free and both engines
    agree exactly). Q = (k-1)(k·ΣC_j² - N²) / (k·N - ΣR_i²), the
    binary repeated-measures test (McNemar's generalization to k
    treatments): are the k event types over-used by the same
    share of users? The naive "ever fired type j" binarization is
    DEGENERATE here — every user fires every type, all R_i = k and
    the denominator is identically zero (found by the sf0.01 gate);
    a saturated matrix still yields the 0/0 guard below, reported
    as Q = 0 by convention on both engines (no variation = no
    evidence).

    Exactness: EVERY input to the statistic is a BIGINT (cell
    counts, row totals, column totals, their squares), so both
    engines do one identical correctly-rounded division at the end —
    no float accumulation anywhere. Scale shape: one map-combinable
    groupBy to the (user, type) cells is the only fact-scale
    shuffle; the binarization is a broadcast scalar compare; row
    totals re-key by user, column totals by type; users never
    materialize to the driver."""
    ev = load_table(spark, "events", sf_dir)
    cell = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    dims = cell.agg(
        F.countDistinct("event_type").alias("k"),
        F.countDistinct("user_id").alias("nu"),
        F.sum("cnt").alias("tot"),
    )
    x = (
        cell.crossJoin(F.broadcast(dims))
        .filter(F.col("cnt") * F.col("nu") * F.col("k") > F.col("tot"))
        .select("user_id", "event_type")
    )
    rowt = x.groupBy("user_id").agg(F.count(F.lit(1)).alias("ri"))
    colt = x.groupBy("event_type").agg(F.count(F.lit(1)).alias("cj"))
    rstats = rowt.agg(
        F.sum("ri").alias("n"),
        F.sum(F.col("ri") * F.col("ri")).alias("sr2"),
    )
    cstats = colt.agg(F.sum(F.col("cj") * F.col("cj")).alias("sc2"))
    s = dims.crossJoin(F.broadcast(rstats)).crossJoin(F.broadcast(cstats))
    denom = F.col("k") * F.col("n") - F.col("sr2")
    q = F.when(denom == 0, F.lit(0.0)).otherwise(
        (
            (F.col("k") - 1) * (F.col("k") * F.col("sc2") - F.col("n") * F.col("n"))
        ).cast("double")
        / denom
    )
    return s.select(
        F.col("k").cast("long").alias("k_treatments"),
        F.col("nu").cast("long").alias("n_users"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(q, 6).alias("cochran_q"),
    )


# ---------------------------------------------------------------------------
# Wave 4: Good-Turing frequency smoothing
# ---------------------------------------------------------------------------

_GT_MAX_R = 5


@register(
    "text_good_turing",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
    spec AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS nr
             FROM wc GROUP BY c),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM wc)
    SELECT a.r, a.nr, COALESCE(b.nr, 0) AS nr_next,
           round(CAST((a.r + 1) * COALESCE(b.nr, 0) AS DOUBLE) / a.nr, 6)
             AS r_star,
           round(CAST(a.r * a.nr AS DOUBLE) / tot.n, 6) AS mass_at_r
    FROM spec a LEFT JOIN spec b ON b.r = a.r + 1
    CROSS JOIN tot
    WHERE a.r <= {_GT_MAX_R}
    ORDER BY a.r
    """,
)
def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus unigram counts:
    the frequency-of-frequencies spectrum N_r and the adjusted count
    r* = (r+1)·N_{{r+1}}/N_r for r ≤ {_GT_MAX_R}, with each class's
    probability mass r·N_r/N. The classical unseen-mass estimator
    (Good 1953) — r*=0 rows and r* << r flag the spectrum holes that
    make naive MLE language models overconfident, and N_1/N is the
    Laplace-alternative unseen-word mass (this query's r=1 row).

    Exactness: the spectrum is pure integers end to end (counts of
    counts); r* and the mass are single correctly-rounded divisions
    of BIGINT products. Scale shape: token shuffle -> word counts ->
    spectrum (two map-combinable aggregations, the second over the
    vocab-bounded frame); the r+1 lookup is a self-join on the
    <=|distinct frequencies|-row spectrum."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    spec = wc.groupBy(F.col("c").alias("r")).agg(F.count(F.lit(1)).alias("nr"))
    tot = wc.agg(F.sum("c").alias("n"))
    a = spec.alias("a")
    b = spec.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b.r") == F.col("a.r") + 1, "left")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("a.r") <= _GT_MAX_R)
        .select(
            F.col("a.r").alias("r"),
            F.col("a.nr").alias("nr"),
            F.coalesce(F.col("b.nr"), F.lit(0)).alias("nr_next"),
            F.round(
                ((F.col("a.r") + 1) * F.coalesce(F.col("b.nr"), F.lit(0))).cast("double")
                / F.col("a.nr"),
                6,
            ).alias("r_star"),
            F.round((F.col("a.r") * F.col("a.nr")).cast("double") / F.col("n"), 6).alias(
                "mass_at_r"
            ),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# Wave 4: Allan variance (stream stability)
# ---------------------------------------------------------------------------

_AV_TAUS = (3600, 21600)


def _av_cte(tau: int) -> str:
    return f"""
    b{tau} AS (
      SELECT CAST(floor(epoch(ts) / {tau}.0) AS BIGINT) AS bucket,
             {_DS.format(expr='value')} / count(*) AS y
      FROM events GROUP BY 1
    ),
    s{tau} AS (
      SELECT row_number() OVER (ORDER BY bucket) AS i, y FROM b{tau}
    ),
    av{tau} AS (
      SELECT CAST(count(*) + 1 AS BIGINT) AS m,
             {_DS.format(expr='(b.y - a.y) * (b.y - a.y)')}
               / (2.0 * count(*)) AS avar
      FROM s{tau} a JOIN s{tau} b ON b.i = a.i + 1
    )"""


@register(
    "events_allan_variance",
    oracle=f"""
    WITH {_av_cte(_AV_TAUS[0])},
    {_av_cte(_AV_TAUS[1])}
    SELECT a.m AS m_small, b.m AS m_large,
           round(a.avar, 6) AS avar_small_tau,
           round(b.avar, 6) AS avar_large_tau,
           round((ln(b.avar) - ln(a.avar))
                 / (ln({_AV_TAUS[1]}) - ln({_AV_TAUS[0]})), 6) AS noise_slope
    FROM av{_AV_TAUS[0]} a, av{_AV_TAUS[1]} b
    """,
)
def events_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Allan variance of the event-value stream at two
    averaging windows (tau = 1 h and 6 h): AVAR(tau) =
    Sum (y_{{i+1}} - y_i)^2 / (2(M-1)) over consecutive occupied-bucket
    means, plus the log-log noise slope between the two taus — the
    clock-stability statistic (Allan 1966) repurposed as a stream
    drift detector (white noise slopes to -1; a flat/rising slope
    flags wandering sensor baselines or load-dependent bias).

    Determinism: bucket means divide an integer-scaled exact sum by
    an integer count; the squared-difference sum is itself
    integer-scaled; bucket re-indexing (gaps allowed — occupied
    buckets only, documented) is one ordered window over the
    CALENDAR-BOUNDED bucket frame; the adjacency is a dense-rank
    equi-join, never a global lag window. ln() feeds a 1e-6 round
    (the hurst/heaps precedent). Scale shape: two map-combinable
    fact aggregations; everything after is bucket-bounded."""
    ev = load_table(spark, "events", sf_dir)
    out = []
    for tau in _AV_TAUS:
        bkt = ev.groupBy(
            F.floor(F.unix_timestamp("ts") / F.lit(float(tau))).cast("long").alias("bucket")
        ).agg((_dsum(F.col("value")) / F.count(F.lit(1))).alias("y"))
        s = bkt.select(
            F.row_number().over(Window.orderBy("bucket")).cast("long").alias("i"), "y"
        )
        a = s.alias("a")
        b = s.alias("b")
        out.append(
            a.join(b, F.col("b.i") == F.col("a.i") + 1).agg(
                (F.count(F.lit(1)) + 1).alias(f"m_{tau}"),
                (
                    _dsum((F.col("b.y") - F.col("a.y")) * (F.col("b.y") - F.col("a.y")))
                    / (2.0 * F.count(F.lit(1)))
                ).alias(f"avar_{tau}"),
            )
        )
    import math

    t0, t1 = _AV_TAUS
    j = out[0].crossJoin(F.broadcast(out[1]))
    return j.select(
        F.col(f"m_{t0}").cast("long").alias("m_small"),
        F.col(f"m_{t1}").cast("long").alias("m_large"),
        F.round(F.col(f"avar_{t0}"), 6).alias("avar_small_tau"),
        F.round(F.col(f"avar_{t1}"), 6).alias("avar_large_tau"),
        F.round(
            (F.log(F.col(f"avar_{t1}")) - F.log(F.col(f"avar_{t0}")))
            / (math.log(t1) - math.log(t0)),
            6,
        ).alias("noise_slope"),
    )


# ---------------------------------------------------------------------------
# Wave 4: Bartlett's test for variance homogeneity
# ---------------------------------------------------------------------------


@register(
    "stats_bartlett_test",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ni,
             {_DS.format(expr='value')} AS s1,
             {_DS.format(expr='value * value')} AS s2
      FROM events GROUP BY event_type
    ),
    v AS (
      SELECT event_type, ni,
             (s2 - s1 * s1 / ni) / (ni - 1) AS vi
      FROM g
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ni) AS BIGINT) AS n,
             {_DS.format(expr='(ni - 1) * vi')} AS pooled_num,
             {_DS.format(expr='(ni - 1) * ln(vi)')} AS sum_lnv,
             {_DS.format(expr='1.0 / (ni - 1)')} AS sum_inv
      FROM v
    )
    SELECT k AS k_groups, n AS n_total,
           round((n - k) * ln(pooled_num / (n - k)) - sum_lnv, 6)
             AS bartlett_raw,
           round(((n - k) * ln(pooled_num / (n - k)) - sum_lnv)
                 / (1 + (sum_inv - 1.0 / (n - k)) / (3 * (k - 1))), 6)
             AS bartlett_chi2,
           CAST(k - 1 AS BIGINT) AS df
    FROM agg
    """,
)
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of the event-value variance
    across event types: T = [(N-k) ln(s_p^2) - Sum (n_i-1) ln(s_i^2)]
    / C with the standard correction C = 1 + (Sum 1/(n_i-1) -
    1/(N-k)) / (3(k-1)). The parametric complement of the registry's
    Levene test — Bartlett is the more powerful screen when the
    normality established by stats_jarque_bera holds.

    Determinism: group variances come from integer-scaled exact sums
    (the s2 - s1^2/n form on identical doubles); the three ACROSS-
    GROUP reductions — pooled numerator, sum of (n_i-1)ln(v_i), sum
    of 1/(n_i-1) — are THEMSELVES integer-scale-summed, so the
    k-term accumulation order (which Spark does not guarantee across
    a 5-row aggregation) cannot wiggle the last ulp. Scale shape:
    one map-combinable fact aggregation; everything after operates
    on the <=|event types|-row frame."""
    ev = load_table(spark, "events", sf_dir)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ni"),
        _dsum(F.col("value")).alias("s1"),
        _dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    v = g.select(
        "event_type",
        "ni",
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("ni")) / (F.col("ni") - 1)).alias("vi"),
    )
    agg = v.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        _dsum((F.col("ni") - 1) * F.col("vi")).alias("pooled_num"),
        _dsum((F.col("ni") - 1) * F.log(F.col("vi"))).alias("sum_lnv"),
        _dsum(1.0 / (F.col("ni") - 1)).alias("sum_inv"),
    )
    raw = (F.col("n") - F.col("k")) * F.log(
        F.col("pooled_num") / (F.col("n") - F.col("k"))
    ) - F.col("sum_lnv")
    corr = 1 + (F.col("sum_inv") - 1.0 / (F.col("n") - F.col("k"))) / (
        3 * (F.col("k") - 1)
    )
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n_total"),
        F.round(raw, 6).alias("bartlett_raw"),
        F.round(raw / corr, 6).alias("bartlett_chi2"),
        (F.col("k") - 1).cast("long").alias("df"),
    )


# ---------------------------------------------------------------------------
# Wave 4: degree assortativity of the trade graph
# ---------------------------------------------------------------------------


@register(
    "graph_assortativity",
    oracle=f"""
    WITH {_sp_edges_sql()},
    und AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM e WHERE src <> dst
        UNION ALL
        SELECT dst AS u, src AS v FROM e WHERE src <> dst
      )
    ),
    deg AS MATERIALIZED (
      SELECT u AS nk, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
    ed AS (
      SELECT du.d AS j, dv.d AS kk
      FROM und JOIN deg du ON und.u = du.nk JOIN deg dv ON und.v = dv.nk
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(j * kk) AS BIGINT) AS sjk,
             CAST(sum(j + kk) AS BIGINT) AS ssum,
             CAST(sum(j * j + kk * kk) AS BIGINT) AS ssq
      FROM ed
    )
    SELECT m AS m_directed_pairs,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           round((CAST(sjk AS DOUBLE) / m - (CAST(ssum AS DOUBLE) / (2 * m))
                  * (CAST(ssum AS DOUBLE) / (2 * m)))
                 / (CAST(ssq AS DOUBLE) / (2 * m) - (CAST(ssum AS DOUBLE)
                    / (2 * m)) * (CAST(ssum AS DOUBLE) / (2 * m))), 6)
             AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the undirected capped
    trade graph: the Pearson correlation of endpoint degrees over all
    edges, r = (E[jk] - E[(j+k)/2]^2) / (E[(j^2+k^2)/2] -
    E[(j+k)/2]^2) — negative r (hubs attach to leaves) is the
    disassortative signature of trade/internet topologies, positive r
    the social-network signature. Complements the registry's local
    clustering and k-core structure queries with the graph-level
    mixing statistic.

    Exactness: endpoint degrees are integers, so all four moment
    sums are BIGINTs and the statistic is closed-form arithmetic on
    their exact double conversions — no accumulation-order exposure
    anywhere. Scale shape (r12 optimization, guide §1.2): the
    fact-scale work is the shared _sp_edges_df aggregation;
    symmetrization, degrees, the degree-attach joins and the moment
    reduction all operate on the <=2·|nations|·top-k edge frame, so
    they fold on the driver over the bounded edge collect (the
    graph_shortest_paths contract) — the previous fully-relational
    tail planned 24 exchanges / 18 Spark jobs of pure stage overhead
    over <=150-row frames."""
    from weather_tools_spark.queries.analytics import _sp_edge_rows
    from weather_tools_spark.queries.round10 import _r6

    und: set[tuple[int, int]] = set()
    for r in _sp_edge_rows(spark, sf_dir):
        s_, d_ = int(r.src), int(r.dst)
        if s_ != d_:
            und.add((s_, d_))
            und.add((d_, s_))
    deg: dict[int, int] = {}
    for u, _v in und:
        deg[u] = deg.get(u, 0) + 1
    m = len(und)
    if m == 0:  # degenerate: mirror the old empty-aggregate NULLs
        return spark.createDataFrame(
            [(0, 0, None)],
            "m_directed_pairs long, n_nodes long, assortativity double",
        )
    sjk = sum(deg[u] * deg[v] for u, v in und)
    ssum = sum(deg[u] + deg[v] for u, v in und)
    ssq = sum(deg[u] * deg[u] + deg[v] * deg[v] for u, v in und)
    mean = ssum / (2 * m)
    denom = ssq / (2 * m) - mean * mean
    # denom == 0 (degree-regular graph) mirrors Spark's non-ANSI
    # divide-by-zero NULL, not NaN (ADVICE r12: a NaN here would fail
    # the oracle hash-match on degenerate inputs)
    r_assort = (
        _r6((sjk / m - mean * mean) / denom) if denom != 0 else None
    )
    return spark.createDataFrame(
        [(m, len(deg), r_assort)],
        "m_directed_pairs long, n_nodes long, assortativity double",
    )


# ---------------------------------------------------------------------------
# Wave 5: AMS (tug-of-war) F2 sketch with merge parity
# ---------------------------------------------------------------------------

_AMS_LANES = 16


@register(
    "sketch_ams_f2",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    swc AS MATERIALIZED (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, w
    ),
    lanes AS (SELECT unnest(range(0, {_AMS_LANES})) AS lane),
    signed AS MATERIALIZED (
      SELECT source, lane,
             CAST(sum(c * (1 - 2 * (('0x' || substr(md5(lane || ':' || w), 1, 1))::BIGINT % 2)))
                  AS BIGINT) AS z
      FROM swc CROSS JOIN lanes GROUP BY source, lane
    ),
    merged AS MATERIALIZED (
      SELECT lane, CAST(sum(z) AS BIGINT) AS z FROM signed GROUP BY lane
    ),
    direct AS MATERIALIZED (
      SELECT lane,
             CAST(sum(c * (1 - 2 * (('0x' || substr(md5(lane || ':' || w), 1, 1))::BIGINT % 2)))
                  AS BIGINT) AS z
      FROM (SELECT w, CAST(sum(c) AS BIGINT) AS c FROM swc GROUP BY w)
      CROSS JOIN lanes GROUP BY lane
    ),
    exact AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS f2
      FROM (SELECT w, CAST(sum(c) AS BIGINT) AS c FROM swc GROUP BY w)
    ),
    est AS (
      SELECT CAST(sum(z * z) AS BIGINT) AS sz2,
             quantile_cont(CAST(z * z AS DOUBLE), 0.5) AS med
      FROM merged
    ),
    parity AS (
      SELECT CAST(count(*) AS BIGINT) AS n_equal
      FROM merged m JOIN direct d ON m.lane = d.lane AND m.z = d.z
    )
    SELECT {_AMS_LANES} AS lanes, exact.f2 AS f2_exact,
           round(CAST(est.sz2 AS DOUBLE) / {_AMS_LANES}, 6) AS f2_est_mean,
           round(est.med, 6) AS f2_est_median,
           round(abs(CAST(est.sz2 AS DOUBLE) / {_AMS_LANES} - exact.f2)
                 / exact.f2, 6) AS rel_err_mean,
           CAST(CASE WHEN parity.n_equal = {_AMS_LANES} THEN 1 ELSE 0 END
                AS INT) AS merge_is_lossless
    FROM exact, est, parity
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war sketch (Alon-Matias-Szegedy 1996) of the corpus
    second frequency moment F2 = Σc_w² (the self-join size / surprise
    number): {_AMS_LANES} independent ±1-signed lanes, estimator Z²
    averaged and medianed across lanes, vs the exact F2 — plus the
    MERGE-PARITY proof that per-source lane registers summed equal
    the registers built directly over the union (the linearity that
    makes AMS the distributed-F2 sketch of choice at 100 TB; the
    sketch_hll_merge_parity analog for moment sketches).

    Determinism: signs come from an md5 nibble of "lane:word" (both
    engines hash the identical string), so every register is a pure
    BIGINT sum — merge parity is integer equality, the mean estimate
    is one division of a BIGINT by the literal lane count, and the
    median interpolates two integers (the percentile ≡ quantile_cont
    equivalence). Scale shape: one token shuffle to (source, word)
    counts, reused by the per-source registers, the direct registers
    and the exact F2; lane fan-out is a literal ×{_AMS_LANES}
    map-side explode over the vocab-bounded count frame."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    swc = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    lane = F.explode(F.sequence(F.lit(0), F.lit(_AMS_LANES - 1))).alias("lane")
    sgn = 1 - 2 * (
        F.conv(F.substring(F.md5(F.concat(F.col("lane").cast("string"), F.lit(":"), F.col("w"))), 1, 1), 16, 10).cast("long")
        % 2
    )
    signed = (
        swc.select("source", "w", "c", lane)
        .groupBy("source", "lane")
        .agg(F.sum(F.col("c") * sgn).alias("z"))
    )
    merged = signed.groupBy("lane").agg(F.sum("z").alias("z"))
    gwc = swc.groupBy("w").agg(F.sum("c").alias("c"))
    direct = (
        gwc.select("w", "c", lane)
        .groupBy("lane")
        .agg(F.sum(F.col("c") * sgn).alias("z"))
    )
    exact = gwc.agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
    est = merged.agg(
        F.sum(F.col("z") * F.col("z")).alias("sz2"),
        F.expr("percentile(CAST(z * z AS DOUBLE), 0.5)").alias("med"),
    )
    parity = (
        merged.alias("m")
        .join(direct.alias("d"), (F.col("m.lane") == F.col("d.lane")) & (F.col("m.z") == F.col("d.z")))
        .agg(F.count(F.lit(1)).alias("n_equal"))
    )
    mean_est = F.col("sz2").cast("double") / _AMS_LANES
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(parity))
        .select(
            F.lit(_AMS_LANES).alias("lanes"),
            F.col("f2").alias("f2_exact"),
            F.round(mean_est, 6).alias("f2_est_mean"),
            F.round(F.col("med"), 6).alias("f2_est_median"),
            F.round(F.abs(mean_est - F.col("f2")) / F.col("f2"), 6).alias("rel_err_mean"),
            F.when(F.col("n_equal") == _AMS_LANES, 1).otherwise(0).cast("int").alias(
                "merge_is_lossless"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Wave 5: Page-Hinkley drift detector over daily means
# ---------------------------------------------------------------------------

_PH_DELTA = 1.0   # slack per step
_PH_LAMBDA = 25.0  # alarm threshold


@register(
    "events_page_hinkley",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             {_DS.format(expr='value')} / count(*) AS x
      FROM events GROUP BY 1
    ),
    mu AS (
      SELECT {_DS.format(expr='x')} / count(*) AS mu FROM daily
    ),
    dev AS (
      SELECT day, CAST(round((x - mu.mu - {_PH_DELTA}) * 1000000, 0) AS BIGINT)
               AS d
      FROM daily, mu
    ),
    cum AS (
      SELECT day, sum(d) OVER (ORDER BY day) AS m FROM dev
    ),
    ph AS (
      SELECT day, m - min(m) OVER (ORDER BY day) AS ph FROM cum
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           round((SELECT max(ph) FROM ph) / 1000000.0, 6) AS max_ph,
           CAST(COALESCE((SELECT min(day) FROM ph
                          WHERE ph > {_PH_LAMBDA} * 1000000), -1) AS BIGINT)
             AS first_alarm_day
    """,
)
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector (Page 1954; the streaming-ML
    concept-drift standard) over the daily mean event value:
    cumulative deviation m_t = Σ(x_i − μ − δ) with slack
    δ = {_PH_DELTA}, PH_t = m_t − min m, alarm when PH exceeds
    λ = {_PH_LAMBDA}. Reports the max PH excursion and the FIRST
    alarm day (−1 when the stream never drifts — the generator's
    stationary stream should stay quiet; a broken feed does not).
    Complements events_cusum_changepoint with the detector that
    needs no post-change distribution estimate.

    Determinism: daily means are exact-sum/count doubles; each
    deviation is rounded to the 1e-6 integer lattice BEFORE the
    running sum, so the cumulative minimum, the PH excursion and the
    alarm-day comparison are all INTEGER arithmetic (the max_drawdown
    idiom — alarm equality can never hinge on float accumulation).
    The two running windows ride the CALENDAR-BOUNDED daily frame.
    One map-combinable fact aggregation is the only fact-scale
    work."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg((_dsum(F.col("value")) / F.count(F.lit(1))).alias("x"))
    mu = daily.agg((_dsum(F.col("x")) / F.count(F.lit(1))).alias("mu"))
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        F.round((F.col("x") - F.col("mu") - _PH_DELTA) * 1_000_000, 0)
        .cast("long")
        .alias("d"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    ph = dev.select("day", F.sum("d").over(w).alias("m")).select(
        "day", (F.col("m") - F.min("m").over(w)).alias("ph")
    )
    agg = ph.agg(F.max("ph").alias("mx"), F.count(F.lit(1)).alias("n_days"))
    alarm = ph.filter(F.col("ph") > _PH_LAMBDA * 1_000_000).agg(
        F.min("day").alias("first_alarm")
    )
    return agg.crossJoin(F.broadcast(alarm)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("mx") / 1_000_000.0, 6).alias("max_ph"),
        F.coalesce(F.col("first_alarm"), F.lit(-1)).cast("long").alias("first_alarm_day"),
    )


# ---------------------------------------------------------------------------
# Wave 5: n-gram novelty per source (memorization screen)
# ---------------------------------------------------------------------------


@register(
    "corpus_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
      FROM documents
    ),
    ng AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks WHERE len(t) >= 3
    ),
    first AS MATERIALIZED (
      SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc FROM ng GROUP BY g
    ),
    per_doc AS (
      SELECT ng.doc_id,
             CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN f.first_doc = ng.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS novel
      FROM ng JOIN first f USING (g) GROUP BY ng.doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.total) AS BIGINT) AS ngrams,
           CAST(sum(p.novel) AS BIGINT) AS novel,
           round(CAST(sum(p.novel) AS DOUBLE) / sum(p.total), 6)
             AS novelty_rate
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty per source: for each document, the share of its
    DISTINCT word-trigrams first seen in that document (attribution by
    minimum doc_id — the deterministic stand-in for ingest order),
    aggregated per source. The memorization/boilerplate screen of LLM
    ingest: a feed whose novelty collapses is re-crawling content the
    corpus already holds (the document-level complement of
    corpus_exact_substring_dedup).

    Determinism: everything is integer counting — distinct trigrams,
    min-doc attribution, one final division per source. Scale shape:
    trigrams expand MAP-SIDE from the token array (the
    text_bigram_counts idiom), one shuffle to distinct (doc, gram),
    one to first-occurrence (both map-combinable), a co-partitioned
    gram join, and a broadcast doc→source attach. The token array is
    MATERIALIZED in its own projection before the lambda touches it:
    inlining split() into the transform re-tokenized the whole text
    on EVERY element_at call (3 per index — measured 106 s at sfx1.0,
    21 s materialized, fresh session both; codegen does not hoist
    common subexpressions out of higher-order-function lambdas)."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.split(F.lower("text"), r"\s+").alias("t"))
    ng = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 3 THEN "
                "transform(sequence(1, size(t) - 2), "
                "i -> concat_ws(' ', element_at(t, i), "
                "element_at(t, i + 1), element_at(t, i + 2))) "
                "ELSE array() END"
            )
        ).alias("g"),
    ).distinct()
    first = ng.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        ng.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)).alias(
                "novel"
            ),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("total").alias("ngrams"),
            F.sum("novel").alias("novel"),
            F.round(F.sum("novel").cast("double") / F.sum("total"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Wave 5: pairwise source vocabulary Jaccard
# ---------------------------------------------------------------------------


@register(
    "text_vocab_jaccard_sources",
    oracle="""
    WITH sv AS MATERIALIZED (
      SELECT DISTINCT source,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    sizes AS MATERIALIZED (
      SELECT source, CAST(count(*) AS BIGINT) AS nv FROM sv GROUP BY source
    ),
    inter AS (
      SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS i
      FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT inter.sa AS source_a, inter.sb AS source_b,
           inter.i AS intersection,
           na.nv + nb.nv - inter.i AS vocab_union,
           round(CAST(inter.i AS DOUBLE) / (na.nv + nb.nv - inter.i), 6)
             AS jaccard,
           round(CAST(inter.i AS DOUBLE) / least(na.nv, nb.nv), 6)
             AS overlap_coef
    FROM inter
    JOIN sizes na ON na.source = inter.sa
    JOIN sizes nb ON nb.source = inter.sb
    ORDER BY source_a, source_b
    """,
)
def text_vocab_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise VOCABULARY Jaccard and overlap coefficient between
    sources: |V_a ∩ V_b| / |V_a ∪ V_b| over each source's distinct
    word set. The coarse crawl-overlap screen that runs before any
    document-level dedup — two feeds with near-1 vocabulary overlap
    are candidates for the expensive MinHash pass, complementing
    burrows_delta (style) and dunning_g2 (keyness) with raw lexical
    identity.

    Exactness: set sizes and intersections are pure integers; two
    correctly-rounded divisions per pair. Scale shape: one token
    shuffle to the distinct (source, word) set; the intersection is
    a self-equi-join ON THE WORD KEY (co-partitioned with the
    distinct — vocab-scale, the one unavoidable shuffle), never an
    all-pairs document comparison; |sources|² output pairs are
    bounded."""
    docs = load_table(spark, "documents", sf_dir)
    sv = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).distinct()
    sizes = sv.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = sv.alias("a")
    b = sv.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("source").alias("sa"), F.col("nv").alias("na"))
    nb = sizes.select(F.col("source").alias("sb"), F.col("nv").alias("nb"))
    uni = F.col("na") + F.col("nb") - F.col("i")
    return (
        inter.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("i").alias("intersection"),
            uni.alias("vocab_union"),
            F.round(F.col("i").cast("double") / uni, 6).alias("jaccard"),
            F.round(F.col("i").cast("double") / F.least("na", "nb"), 6).alias(
                "overlap_coef"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Wave 5: Wilcoxon signed-rank test (paired halves)
# ---------------------------------------------------------------------------


@register(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    seq AS (SELECT row_number() OVER (ORDER BY day) AS t, c FROM daily),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
    pairs AS (
      SELECT a.t AS i, b.c - a.c AS d
      FROM seq a JOIN seq b ON b.t = a.t + (SELECT (n + 1) // 2 FROM n)
    ),
    nz AS (SELECT i, d, abs(d) AS ad FROM pairs WHERE d <> 0),
    rk AS (
      SELECT d,
             rank() OVER (ORDER BY ad)
               + (count(*) OVER (PARTITION BY ad) - 1) / 2.0 AS r
      FROM nz
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS wplus
      FROM rk
    )
    SELECT np AS n_pairs, round(wplus, 6) AS w_plus,
           round((wplus - np * (np + 1) / 4.0)
                 / sqrt(np * (np + 1) * (2 * np + 1) / 24.0), 6) AS z_score
    FROM s
    """,
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test pairing each day of the period's
    first half with its offset-aligned day in the second half
    (d_i = c_{i+h} − c_i, h = ⌈n/2⌉): W+ = sum of |d| average-ranks
    where d > 0, with the normal approximation z. The paired
    nonparametric location test — did daily volume shift between the
    two halves without assuming normality? (The paired complement of
    stats_mannwhitney_u's independent-samples question.)

    Determinism: differences are integers; average ranks are exact
    dyadic 0.5-multiples (rank() + (ties−1)/2 — the friedman idiom),
    so W+ is an order-independent exact double and z's denominator
    is an integer expression under one IEEE sqrt. Zero differences
    drop on both engines. The rank window orders the ≤⌊n/2⌋-row
    CALENDAR-BOUNDED pair frame; adjacency is the dense-rank
    equi-join shape."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    seq = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"), "c"
    )
    n = seq.agg(F.count(F.lit(1)).alias("n"))
    a = seq.alias("a")
    b = seq.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(n))
        .join(b, F.col("b.t") == F.col("a.t") + ((F.col("n") + 1) / 2).cast("long"))
        .select((F.col("b.c") - F.col("a.c")).alias("d"))
    )
    nz = pairs.filter(F.col("d") != 0).select("d", F.abs("d").alias("ad"))
    r = (
        F.rank().over(Window.orderBy("ad"))
        + (F.count(F.lit(1)).over(Window.partitionBy("ad")) - 1) / 2.0
    )
    rk = nz.select("d", r.alias("r"))
    s = rk.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum(F.when(F.col("d") > 0, F.col("r")).otherwise(0.0)).alias("wplus"),
    )
    mu = F.col("np") * (F.col("np") + 1) / 4.0
    sd = F.sqrt(F.col("np") * (F.col("np") + 1) * (2 * F.col("np") + 1) / 24.0)
    return s.select(
        F.col("np").cast("long").alias("n_pairs"),
        F.round(F.col("wplus"), 6).alias("w_plus"),
        F.round((F.col("wplus") - mu) / sd, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Wave 5: Grubbs outlier statistic over daily volume
# ---------------------------------------------------------------------------


@register(
    "stats_grubbs_statistic",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM daily
    ),
    m AS (
      SELECT n, CAST(s1 AS DOUBLE) / n AS mu,
             sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS sd
      FROM s
    ),
    top AS (
      SELECT d.day, d.c, abs(d.c - m.mu) / m.sd AS g, m.n, m.mu, m.sd
      FROM daily d, m
      ORDER BY g DESC, d.day
      LIMIT 1
    )
    SELECT n AS n_days, round(mu, 6) AS mean_daily,
           round(sd, 6) AS sd_daily, round(g, 6) AS g_max,
           day AS outlier_day, c AS outlier_count
    FROM top
    """,
)
def stats_grubbs_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs outlier statistic over daily event volume:
    G = max|c_t − mean| / sd (sample sd), reporting the most extreme
    day — the single-outlier screen run before trend fitting (one
    backfill day or outage dominates both OLS and Theil-Sen's
    breakdown bound less gracefully than it dominates G).

    Determinism: daily counts are integers, so mean and sd are exact
    integer-sum expressions under one IEEE sqrt — identical doubles
    on both engines; the argmax orders by (G desc, day) where every
    G is computed from those identical doubles, so ties (two days
    equidistant from the mean) break on the integer day. One
    map-combinable fact aggregation; the scan order never matters."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    m = s.select(
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    top = (
        daily.crossJoin(F.broadcast(m))
        .select(
            "day", "c", "n", "mu", "sd",
            (F.abs(F.col("c") - F.col("mu")) / F.col("sd")).alias("g"),
        )
        .orderBy(F.col("g").desc(), "day")
        .limit(1)
    )
    return top.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("mu"), 6).alias("mean_daily"),
        F.round(F.col("sd"), 6).alias("sd_daily"),
        F.round(F.col("g"), 6).alias("g_max"),
        F.col("day").cast("long").alias("outlier_day"),
        F.col("c").cast("long").alias("outlier_count"),
    )


# ---------------------------------------------------------------------------
# Wave 6: Kruskal-Wallis k-sample rank test
# ---------------------------------------------------------------------------


@register(
    "stats_kruskal_wallis",
    oracle="""
    WITH byv AS (
      SELECT value AS v, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY value, event_type
    ),
    byv2 AS (
      SELECT v, CAST(sum(cnt) AS BIGINT) AS t FROM byv GROUP BY v
    ),
    cum AS (
      SELECT v, t, sum(t) OVER (ORDER BY v) AS cumt FROM byv2
    ),
    rk AS (
      SELECT v, (cumt - t) + (t + 1) / 2.0 AS r FROM cum
    ),
    g AS (
      SELECT byv.event_type, CAST(sum(byv.cnt) AS BIGINT) AS ng,
             sum(byv.cnt * rk.r) AS rg
      FROM byv JOIN rk USING (v) GROUP BY byv.event_type
    ),
    nn AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    terms AS (
      SELECT CAST(sum(CAST(round(
               (((rg / ng - (nn.n + 1) / 2.0) * (rg / ng - (nn.n + 1) / 2.0))
                * ng) / (1.0 * nn.n * (nn.n + 1)) * 1000000000, 0)
             AS BIGINT)) AS DOUBLE) / 1000000000 AS s
      FROM g, nn GROUP BY nn.n
    ),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM byv2
    )
    SELECT nn.n AS n_total, nn.k AS k_groups,
           CAST(nn.k - 1 AS BIGINT) AS df,
           round(12.0 * terms.s, 6) AS h_stat,
           round(12.0 * terms.s
                 / (1 - CAST(ties.tie3 AS DOUBLE)
                        / (CAST(nn.n AS DOUBLE) * nn.n * nn.n - nn.n)), 6)
             AS h_tie_corrected
    FROM nn, terms, ties
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test across ALL event types (the k-sample
    generalization of the registry's Mann-Whitney U): average ranks
    from cumulative value-lattice counts, H = 12/(N(N+1))·Σn_g(R̄_g −
    R̄)² in the deviation form, with the standard tie correction
    1 − Σ(t³−t)/(N³−N).

    Determinism is the hardened KS/MWU machinery: one value
    aggregation, average ranks from cumulative counts ((cum−t) +
    (t+1)/2 — exact half-integers), per-group rank sums are exact
    dyadic doubles below 2^53. The k across-group deviation terms are
    PRE-SCALED by 1/(N(N+1)) (bounding each at n_g/4, so a 1e-9
    integer lattice holds them exactly) and integer-scale-summed —
    the k-term accumulation order cannot move the last ulp (the
    bartlett treatment, one decimal tighter because H multiplies the
    sum by 12 only). The ordered cumulative window runs over the
    VALUE-LATTICE frame (≤50k distinct 2-decimal values — the same
    domain contract the KS/MWU cardinality probe enforces; this
    query's window inherits that bound by construction)."""
    ev = load_table(spark, "events", sf_dir)
    byv = ev.groupBy(F.col("value").alias("v"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    byv2 = byv.groupBy("v").agg(F.sum("cnt").alias("t"))
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    cum = cumulative_sums(byv2, ["v"], ["t"], ["cumt"])
    rk = cum.select("v", ((F.col("cumt") - F.col("t")) + (F.col("t") + 1) / 2.0).alias("r"))
    g = (
        byv.join(rk, "v")
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("ng"), F.sum(F.col("cnt") * F.col("r")).alias("rg"))
    )
    nn = g.agg(F.sum("ng").alias("n"), F.count(F.lit(1)).alias("k"))
    gd = g.crossJoin(F.broadcast(nn))
    dev = F.col("rg") / F.col("ng") - (F.col("n") + 1) / 2.0
    term = ((dev * dev) * F.col("ng")) / (1.0 * F.col("n") * (F.col("n") + 1))
    terms = gd.groupBy("n").agg(
        (
            F.sum(F.round(term * 1_000_000_000, 0).cast("long")).cast("double")
            / 1_000_000_000
        ).alias("s")
    )
    ties = byv2.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3")
    )
    h = 12.0 * F.col("s")
    corr = 1 - F.col("tie3").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return (
        nn.join(terms, "n")
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n_total"),
            F.col("k").cast("long").alias("k_groups"),
            (F.col("k") - 1).cast("long").alias("df"),
            F.round(h, 6).alias("h_stat"),
            F.round(h / corr, 6).alias("h_tie_corrected"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 6: Mood's median test
# ---------------------------------------------------------------------------


@register(
    "stats_mood_median",
    oracle="""
    WITH med AS (SELECT quantile_cont(value, 0.5) AS m FROM events),
    cls AS (
      SELECT event_type,
             CAST(sum(CASE WHEN value > med.m THEN 1 ELSE 0 END) AS BIGINT)
               AS above,
             CAST(sum(CASE WHEN value <= med.m THEN 1 ELSE 0 END) AS BIGINT)
               AS below
      FROM events, med GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(above) AS BIGINT) AS ta,
             CAST(sum(below) AS BIGINT) AS tb,
             CAST(sum(above + below) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM cls
    ),
    chi AS (
      SELECT CAST(sum(CAST(round(
               ((above - 1.0 * (above + below) * ta / n)
                * (above - 1.0 * (above + below) * ta / n))
               / (1.0 * (above + below) * ta / n) * 1000000, 0) AS BIGINT))
             AS DOUBLE) / 1000000
           + CAST(sum(CAST(round(
               ((below - 1.0 * (above + below) * tb / n)
                * (below - 1.0 * (above + below) * tb / n))
               / (1.0 * (above + below) * tb / n) * 1000000, 0) AS BIGINT))
             AS DOUBLE) / 1000000 AS chi2
      FROM cls, tot GROUP BY ta, tb, n
    )
    SELECT tot.n AS n_total, tot.k AS k_groups,
           CAST(tot.k - 1 AS BIGINT) AS df,
           round(chi.chi2, 6) AS mood_chi2
    FROM tot, chi
    """,
)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types: dichotomize every value
    at the grand median (exact interpolated percentile — identical on
    the shared 2-decimal lattice), build the k×2 above/below
    contingency table, and compute the chi-square against the
    marginal expectations. The coarse-but-robust k-sample location
    screen that pairs with Kruskal-Wallis the way the sign test
    pairs with Wilcoxon.

    Determinism: cell counts and margins are BIGINTs; expectations
    are single divisions of exact integers; the k chi-square terms
    are integer-scale-summed (the bartlett treatment) so across-group
    accumulation order is irrelevant. One fact aggregation after a
    broadcast median attach; everything else is ≤k rows."""
    ev = load_table(spark, "events", sf_dir)
    med = ev.agg(F.expr("percentile(value, 0.5)").alias("m"))
    cls = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > F.col("m"), 1).otherwise(0)).alias("above"),
            F.sum(F.when(F.col("value") <= F.col("m"), 1).otherwise(0)).alias("below"),
        )
    )
    tot = cls.agg(
        F.sum("above").alias("ta"),
        F.sum("below").alias("tb"),
        F.sum(F.col("above") + F.col("below")).alias("n"),
        F.count(F.lit(1)).alias("k"),
    )
    cj = cls.crossJoin(F.broadcast(tot))
    ea = 1.0 * (F.col("above") + F.col("below")) * F.col("ta") / F.col("n")
    eb = 1.0 * (F.col("above") + F.col("below")) * F.col("tb") / F.col("n")
    term_a = (F.col("above") - ea) * (F.col("above") - ea) / ea
    term_b = (F.col("below") - eb) * (F.col("below") - eb) / eb
    chi = cj.groupBy("ta", "tb", "n").agg(
        (
            F.sum(F.round(term_a * 1_000_000, 0).cast("long")).cast("double") / 1_000_000
            + F.sum(F.round(term_b * 1_000_000, 0).cast("long")).cast("double") / 1_000_000
        ).alias("chi2")
    )
    return tot.join(chi, ["ta", "tb", "n"]).select(
        F.col("n").cast("long").alias("n_total"),
        F.col("k").cast("long").alias("k_groups"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(F.col("chi2"), 6).alias("mood_chi2"),
    )


# ---------------------------------------------------------------------------
# Wave 6: Tukey IQR outlier fences per event type
# ---------------------------------------------------------------------------


@register(
    "dq_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    ),
    f AS (
      SELECT event_type, n, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM q
    )
    SELECT f.event_type, f.n,
           round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
           round(f.lo, 6) AS fence_lo, round(f.hi, 6) AS fence_hi,
           CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
                              THEN 1 ELSE 0 END) AS DOUBLE) / f.n, 6)
             AS outlier_frac
    FROM events e JOIN f ON e.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.q1, f.q3, f.lo, f.hi
    ORDER BY f.event_type
    """,
)
def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR fences per event type: exact interpolated quartiles,
    fences at q1/q3 ∓/± 1.5·IQR, and the count/fraction of values
    outside them — the box-plot outlier rule, the robust complement
    of events_value_outliers' z-score rule and events_mad_outliers'
    MAD rule (three robustness tiers over the same column).

    Determinism: quartiles ride the percentile ≡ quantile_cont
    interpolation equivalence on the 2-decimal lattice; fences are
    IEEE arithmetic on those identical doubles; outlier membership is
    a comparison of lattice values against identical fences (strict
    inequalities, so a value exactly ON a fence counts inside on both
    engines). Two passes over the fact — quartile aggregation, then
    a broadcast fence attach + count — both map-combinable."""
    ev = load_table(spark, "events", sf_dir)
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out = F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1).otherwise(0)
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "n", "q1", "q3", "lo", "hi")
        .agg(F.sum(out).alias("n_outliers"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("q1"), 6).alias("q1"),
            F.round(F.col("q3"), 6).alias("q3"),
            F.round(F.col("lo"), 6).alias("fence_lo"),
            F.round(F.col("hi"), 6).alias("fence_hi"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
            F.round(F.col("n_outliers").cast("double") / F.col("n"), 6).alias(
                "outlier_frac"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Wave 6: neighborhood Jaccard link prediction on the trade graph
# ---------------------------------------------------------------------------

_EJ_TOPK = 10


@register(
    "graph_edge_jaccard",
    oracle=f"""
    WITH {_sp_edges_sql()},
    und AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM e WHERE src <> dst
        UNION ALL
        SELECT dst AS u, src AS v FROM e WHERE src <> dst
      )
    ),
    deg AS MATERIALIZED (
      SELECT u AS nk, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    ),
    common AS (
      SELECT a.u AS x, b.u AS y, CAST(count(*) AS BIGINT) AS c
      FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
      GROUP BY a.u, b.u
    ),
    scored AS (
      SELECT common.x, common.y, common.c,
             dx.d + dy.d - common.c AS uni,
             round(CAST(common.c AS DOUBLE) / (dx.d + dy.d - common.c), 6)
               AS jaccard
      FROM common
      JOIN deg dx ON dx.nk = common.x
      JOIN deg dy ON dy.nk = common.y
    )
    SELECT CAST(x AS INT) AS node_a, CAST(y AS INT) AS node_b,
           c AS common_neighbors, uni AS neighborhood_union, jaccard
    FROM scored
    ORDER BY jaccard DESC, node_a, node_b
    LIMIT {_EJ_TOPK}
    """,
)
def graph_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction on the undirected capped
    trade graph: for every node pair sharing at least one neighbor,
    |Γ(x)∩Γ(y)| / |Γ(x)∪Γ(y)|, top-{_EJ_TOPK} — the normalized
    complement of graph_adamic_adar_linkpred (Adamic-Adar up-weights
    rare common neighbors; Jaccard normalizes by neighborhood size).

    Exactness: common-neighbor counts and degrees are integers; one
    correctly-rounded division per pair; ties in the top-k break on
    the integer node pair. Scale shape: the fact-scale work is the
    shared _sp_edges_df aggregation; candidate pairs are generated
    by the WEDGE join (und ⋈ und on the shared neighbor — never an
    all-pairs product), the same enumeration the triangle census
    bounds; degrees broadcast onto the bounded pair frame.

    r12 optimization (guide §1.2): the wedge join, degree attach and
    top-k all operate on the <=2·|nations|·top-k symmetrized frame, so
    they fold on the driver over the bounded edge collect (the
    graph_shortest_paths contract) — the previous relational tail
    planned 23 exchanges / 15 Spark jobs over <=150-row frames."""
    from weather_tools_spark.queries.analytics import _sp_edge_rows
    from weather_tools_spark.queries.round10 import _r6

    nbrs: dict[int, set[int]] = {}
    for r in _sp_edge_rows(spark, sf_dir):
        s_, d_ = int(r.src), int(r.dst)
        if s_ != d_:
            nbrs.setdefault(s_, set()).add(d_)
            nbrs.setdefault(d_, set()).add(s_)
    pairs = []
    nodes = sorted(nbrs)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            c = len(nbrs[x] & nbrs[y])
            if c:
                uni = len(nbrs[x]) + len(nbrs[y]) - c
                pairs.append((x, y, c, uni, _r6(c / uni)))
    pairs.sort(key=lambda t: (-t[4], t[0], t[1]))
    return spark.createDataFrame(
        pairs[:_EJ_TOPK],
        "node_a int, node_b int, common_neighbors long, "
        "neighborhood_union long, jaccard double",
    )


# ---------------------------------------------------------------------------
# Wave 7: standardized effect sizes between two event types
# ---------------------------------------------------------------------------

_ES_A, _ES_B = "purchase", "click"


@register(
    "stats_effect_sizes",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             {_DS.format(expr='value')} AS s1,
             {_DS.format(expr='value * value')} AS s2
      FROM events WHERE event_type IN ('{_ES_A}', '{_ES_B}')
      GROUP BY event_type
    ),
    v AS (
      SELECT event_type, n, s1 / n AS m,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM g
    ),
    p AS (
      SELECT a.n AS n1, b.n AS n2, a.m - b.m AS diff,
             sqrt(((a.n - 1) * a.var + (b.n - 1) * b.var)
                  / (a.n + b.n - 2)) AS sp,
             sqrt(b.var) AS s_control
      FROM v a, v b
      WHERE a.event_type = '{_ES_A}' AND b.event_type = '{_ES_B}'
    )
    SELECT n1, n2, round(diff, 6) AS mean_diff,
           round(diff / sp, 6) AS cohens_d,
           round(diff / sp * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g,
           round(diff / s_control, 6) AS glass_delta
    FROM p
    """,
)
def stats_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes between the '{_ES_A}' and '{_ES_B}'
    value samples: Cohen's d (pooled sd), Hedges' g (small-sample
    bias correction 1 − 3/(4N−9)) and Glass's Δ (control-group sd) —
    the practical-significance companions to the registry's Welch t
    and Mann-Whitney tests, which report only detectability.

    Determinism: means and variances come from integer-scaled exact
    sums (the bartlett moment shape); the pooled sd is one IEEE sqrt
    of arithmetic on identical doubles; each effect size is a single
    correctly-rounded division. One map-combinable fact aggregation;
    everything after is a 2-row frame."""
    ev = load_table(spark, "events", sf_dir)
    g = (
        ev.filter(F.col("event_type").isin(_ES_A, _ES_B))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value")).alias("s1"),
            _dsum(F.col("value") * F.col("value")).alias("s2"),
        )
    )
    v = g.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("m"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    a = v.filter(F.col("event_type") == _ES_A).select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("var").alias("v1")
    )
    b = v.filter(F.col("event_type") == _ES_B).select(
        F.col("n").alias("n2"), F.col("m").alias("m2"), F.col("var").alias("v2")
    )
    p = a.crossJoin(F.broadcast(b))
    diff = F.col("m1") - F.col("m2")
    sp = F.sqrt(
        ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2"))
        / (F.col("n1") + F.col("n2") - 2)
    )
    return p.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(diff / sp, 6).alias("cohens_d"),
        F.round(diff / sp * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)), 6).alias(
            "hedges_g"
        ),
        F.round(diff / F.sqrt(F.col("v2")), 6).alias("glass_delta"),
    )


# ---------------------------------------------------------------------------
# Wave 7: Honoré's R and Sichel's S vocabulary statistics
# ---------------------------------------------------------------------------


@register(
    "text_honore_sichel",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY source, w)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocabulary,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           round(CASE WHEN sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) < count(*)
                 THEN 100.0 * ln(sum(c))
                      / (1 - CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                                  AS DOUBLE) / count(*))
                 ELSE NULL END, 6) AS honore_r,
           round(CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS sichel_s
    FROM sw GROUP BY source ORDER BY source
    """,
)
def text_honore_sichel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honoré's R (1979) and Sichel's S per source: R = 100·ln(N) /
    (1 − V₁/V) weights the hapax share (rises with productive,
    non-templated vocabulary use), S = V₂/V is famously stable in
    text length — together with text_yule_k they form the classical
    vocabulary-richness triple used for authorship and
    template-detection screens.

    Exactness: N, V, V₁, V₂ are pure integers off the same
    (source, word) count frame as yule_k; one ln() on an integer and
    two correctly-rounded divisions. The degenerate all-hapax source
    (V₁ = V) yields NULL identically on both engines. Scale shape:
    one token-scale map-combinable shuffle, one bounded per-source
    aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    v = F.count(F.lit(1))
    v1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    v2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
    return (
        sw.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            v.alias("vocabulary"),
            v1.cast("long").alias("hapax"),
            v2.cast("long").alias("dis"),
            F.round(
                F.when(
                    v1 < v,
                    100.0 * F.log(F.sum("c")) / (1 - v1.cast("double") / v),
                ).otherwise(F.lit(None)),
                6,
            ).alias("honore_r"),
            F.round(v2.cast("double") / v, 6).alias("sichel_s"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Wave 7: peak-over-threshold GPD moment fit
# ---------------------------------------------------------------------------

_POT_Q = 0.95


@register(
    "events_peak_over_threshold",
    oracle=f"""
    WITH u AS (SELECT quantile_cont(value, {_POT_Q}) AS u FROM events),
    exc AS (
      SELECT value - u.u AS e FROM events, u WHERE value > u.u
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {_DS.format(expr='e')} / count(*) AS me,
             {_DS.format(expr='e * e')} / count(*) AS me2
      FROM exc
    ),
    fit AS (
      SELECT n, me, me2 - me * me AS v FROM m
    )
    SELECT (SELECT round(u, 6) FROM u) AS threshold,
           n AS n_exceedances,
           round(me, 6) AS mean_excess,
           round((1 - me * me / v) / 2.0, 6) AS gpd_xi,
           round(me * (1 + me * me / v) / 2.0, 6) AS gpd_sigma
    FROM fit
    """,
)
def events_peak_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-over-threshold tail fit of the event values: threshold at
    the exact {_POT_Q:.0%} quantile, generalized-Pareto shape/scale by
    the method of moments (ξ = (1 − m²/v)/2, σ = m(1 + m²/v)/2 over
    the excess mean m and variance v) — the extreme-value companion
    to weather_return_period's block-maxima approach (POT uses every
    exceedance, not one maximum per block, the standard choice for
    operational tail monitoring). ξ ≈ 0 is the exponential-tail
    baseline the generator's uniform values should show
    (ξ = −? bounded support pulls ξ negative — the fit reports it
    honestly either way).

    Determinism: the threshold rides the percentile ≡ quantile_cont
    equivalence; excesses are differences of lattice values and the
    identical threshold double; their moments are integer-scale-
    summed; ξ and σ are closed-form arithmetic on those identical
    doubles. Two map-combinable fact passes (quantile, then excess
    moments under a broadcast threshold). The moments aggregate is
    GLOBAL (ADVICE r11): a groupBy("u") over the exceedance frame
    yields 0 rows when nothing clears the threshold (degenerate
    store where the top 5% of values all equal the max), while the
    oracle's ungrouped aggregate yields one (n=0, NULL moments) row
    — so the threshold is re-attached by a broadcast crossJoin onto
    the always-one-row moment frame instead of grouped on."""
    ev = load_table(spark, "events", sf_dir)
    u = ev.agg(F.expr(f"percentile(value, {_POT_Q})").alias("u"))
    exc = (
        ev.crossJoin(F.broadcast(u))
        .filter(F.col("value") > F.col("u"))
        .select((F.col("value") - F.col("u")).alias("e"))
    )
    m = exc.agg(
        F.count(F.lit(1)).alias("n"),
        (_dsum(F.col("e")) / F.count(F.lit(1))).alias("me"),
        (_dsum(F.col("e") * F.col("e")) / F.count(F.lit(1))).alias("me2"),
    ).crossJoin(F.broadcast(u))
    fit = m.select(
        "u", "n", "me", (F.col("me2") - F.col("me") * F.col("me")).alias("v")
    )
    r = F.col("me") * F.col("me") / F.col("v")
    return fit.select(
        F.round(F.col("u"), 6).alias("threshold"),
        F.col("n").cast("long").alias("n_exceedances"),
        F.round(F.col("me"), 6).alias("mean_excess"),
        F.round((1 - r) / 2.0, 6).alias("gpd_xi"),
        F.round(F.col("me") * (1 + r) / 2.0, 6).alias("gpd_sigma"),
    )
