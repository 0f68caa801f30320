"""Round-11 wave 3: distribution-shape testing, stylometric keyness,
vocabulary-richness constants, equity-curve risk, residual
autocorrelation, and connected components — six operators extending
the aggregation/text/graph families along the same determinism rules
the r11 hardening proved (integer-scaled exact sums, two-pass
standardized moments, join-based sequence adjacency, chained-CTE
oracle replay of iterative rounds).

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
           round(10000.0 * (sum(c * c) - sum(c)) / (sum(c) * sum(c)), 6)
             AS yule_k,
           round(CAST(sum(c * (c - 1)) AS DOUBLE)
                 / (sum(c) * (sum(c) - 1)), 6) AS simpson_d
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
    doubles are two final correctly-rounded divisions. Scale shape:
    one token-scale map-combinable shuffle to (source, word) counts,
    one bounded per-source aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return (
        sw.groupBy("source")
        .agg(
            n.cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocabulary"),
            F.round(10000.0 * (F.sum(F.col("c") * F.col("c")) - n) / (n * n), 6).alias(
                "yule_k"
            ),
            F.round(
                F.sum(F.col("c") * (F.col("c") - 1)).cast("double") / (n * (n - 1)), 6
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
    parts = [
        """
    er AS (
      SELECT e.src AS u, e.dst AS v
      FROM e
      JOIN nation cn ON e.src = cn.n_nationkey
      JOIN nation sn ON e.dst = sn.n_nationkey
      WHERE cn.n_regionkey = sn.n_regionkey AND e.src <> e.dst
    ),
    und AS (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM er UNION ALL SELECT v, u FROM er
      )
    ),
    l0 AS (SELECT n_nationkey AS v, n_nationkey AS lbl FROM nation)"""
    ]
    for r in range(1, _CC_ROUNDS + 1):
        parts.append(f"""
    l{r} AS (
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
