"""Round-12 wave 9: classical nonparametric tests the stats family did
not yet cover (sign test, Ansari-Bradley scale, two-sample
Anderson-Darling, two-sample Cramér-von Mises), multiclass macro-F1,
and harmonic centrality.

Same contract as every wave: each query is a Catalyst plan with a
DuckDB oracle computing the identical frame; every float column is a
ratio of INTEGER moments (or arithmetic both engines derive from the
same integers with the same IEEE operation sequence), with
order-sensitive double accumulations pushed through the established
1e-lattice integer-sum treatment (the Kruskal-Wallis precedent), so
the driver's value hash cannot drift with partial-aggregation order.

Reference parity note: the reference pipelines (weather_dl /
weather_mv / weather_sp, SURVEY.md §2) contain no statistical testing
or evaluation operators — this wave extends the LLM-data-pipeline
surface the build brief makes first-class (distribution-shift tests
between cohorts/sources for drift detection, scale-change tests for
sensor QC, multiclass eval for langid gates, centrality for dedup
graphs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.functions import text as TX
from weather_tools_spark.operators.bounded import bounded_rows
from weather_tools_spark.operators.prefix_sum import cumulative_sums
from weather_tools_spark.queries import register
from weather_tools_spark.queries.analytics import _sp_edges_df, _sp_edges_sql

_AB_A, _AB_B = "purchase", "click"  # the KS/MWU two-sample pair

# ---------------------------------------------------------------------------
# Sign test on day-over-day differences
# ---------------------------------------------------------------------------


@register(
    "stats_sign_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT c - lag(c) OVER (ORDER BY day) AS dc FROM daily
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN dc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
             CAST(sum(CASE WHEN dc < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus
      FROM d WHERE dc IS NOT NULL
    )
    SELECT n_days, n_plus, n_minus,
           round((n_plus - n_minus) / sqrt(1.0 * (n_plus + n_minus)), 6)
             AS z_score,
           round(CASE WHEN n_plus = n_minus THEN 0.0
                 ELSE (CASE WHEN n_plus > n_minus THEN 1 ELSE -1 END)
                      * (abs(n_plus - n_minus) - 1)
                      / sqrt(1.0 * (n_plus + n_minus)) END, 6) AS z_continuity,
           CAST(CASE WHEN abs((n_plus - n_minus)
                              / sqrt(1.0 * (n_plus + n_minus)))
                     > 1.959963984540054 THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM s
    """,
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical paired sign test on consecutive day-over-day
    differences of the daily event count — the distribution-free
    trend screen that complements stats_mann_kendall (all-pairs S) and
    events_turning_points (local extrema): only the SIGNS of adjacent
    differences enter, so a single outlier day cannot move the
    statistic. Zero differences are dropped (the standard treatment);
    z = (n+ − n−)/√n with and without continuity correction.

    Every input is an integer count and √ is correctly rounded IEEE,
    so both engines produce identical doubles. Scale shape: one
    map-combinable fact aggregation to the ≤|days| daily frame, then a
    lag over the calendar-bounded day frame (same domain contract as
    events_ewma_daily)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    d = daily.select(
        (F.col("c") - F.lag("c").over(Window.orderBy("day"))).alias("dc")
    ).filter(F.col("dc").isNotNull())
    s = d.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("dc") > 0, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("dc") < 0, 1).otherwise(0)).alias("n_minus"),
    )
    z = (F.col("n_plus") - F.col("n_minus")) / F.sqrt(
        1.0 * (F.col("n_plus") + F.col("n_minus"))
    )
    zc = F.when(F.col("n_plus") == F.col("n_minus"), F.lit(0.0)).otherwise(
        F.when(F.col("n_plus") > F.col("n_minus"), 1).otherwise(-1)
        * (F.abs(F.col("n_plus") - F.col("n_minus")) - 1)
        / F.sqrt(1.0 * (F.col("n_plus") + F.col("n_minus")))
    )
    return s.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_plus").cast("long").alias("n_plus"),
        F.col("n_minus").cast("long").alias("n_minus"),
        F.round(z, 6).alias("z_score"),
        F.round(zc, 6).alias("z_continuity"),
        F.when(F.abs(z) > 1.959963984540054, 1).otherwise(0).cast("int").alias(
            "reject_05"
        ),
    )


# ---------------------------------------------------------------------------
# Ansari-Bradley two-sample scale test
# ---------------------------------------------------------------------------

# Midrank-averaged AB scores on the value lattice. For a tie block
# spanning combined ranks [lo, hi] with N total, the block score sum
# S_b = sum_{r=lo..hi} min(r, N+1-r) has the closed split form at
# M = floor((N+1)/2):  arith(lo, min(hi,M)) + arith(N+1-hi,
# N+1-max(lo,M+1)), arith(a,b) = (a+b)(b-a+1)/2 — all BIGINT. The
# per-element score is S_b/t; the order-sensitive double sums T1 =
# sum ca*S_b/t and S2 = sum S_b^2/t go through the Kruskal-Wallis
# pre-scaled 1e-lattice integer-sum treatment (scaled by N^2 and N^3
# respectively, bounding the scaled sums near 1) so partial-aggregation
# order cannot move a bit.
_AB_ORACLE = f"""
    WITH pooled AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')
    ),
    byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
            FROM pooled GROUP BY v),
    cum AS (SELECT v, ca, cb, ca + cb AS t,
                   sum(ca + cb) OVER (ORDER BY v) AS cumt
            FROM byv),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
                  CAST(sum(ca + cb) AS BIGINT) AS n
           FROM byv),
    blocks AS (
      SELECT ca, cb, t,
             cumt - t + 1 AS lo, cumt AS hi,
             CAST(floor((nn.n + 1) / 2.0) AS BIGINT) AS m, nn.n AS n
      FROM cum, nn
    ),
    scored AS (
      SELECT ca, cb, t, n,
             (CASE WHEN least(hi, m) >= lo
                   THEN (lo + least(hi, m)) * (least(hi, m) - lo + 1) // 2
                   ELSE 0 END)
             + (CASE WHEN hi >= greatest(lo, m + 1)
                     THEN ((n + 1 - hi) + (n + 1 - greatest(lo, m + 1)))
                          * (hi - greatest(lo, m + 1) + 1) // 2
                     ELSE 0 END) AS sb
      FROM blocks
    ),
    lat AS (
      SELECT n,
             CAST(sum(CAST(sb AS BIGINT)) AS BIGINT) AS s_total,
             CAST(sum(CAST(round(
               (ca * 1.0 * sb / t) / (1.0 * n * n) * 1e15, 0) AS BIGINT))
             AS DOUBLE) / 1e15 AS t1s,
             CAST(sum(CAST(round(
               (sb * 1.0 * sb / t) / (1.0 * n * n * n) * 1e15, 0) AS BIGINT))
             AS DOUBLE) / 1e15 AS s2s
      FROM scored GROUP BY n
    )
    SELECT nn.n1, nn.n2, lat.n AS n_total,
           round(lat.t1s * lat.n * lat.n, 3) AS ab_t1,
           round((lat.t1s * lat.n * lat.n
                  - nn.n1 * (lat.s_total * 1.0 / lat.n))
                 / sqrt(1.0 * nn.n1 * nn.n2
                        * (lat.n * (lat.s2s * lat.n * lat.n * lat.n)
                           - (lat.s_total * 1.0) * lat.s_total)
                        / (1.0 * lat.n * lat.n * (lat.n - 1))), 6) AS z_score
    FROM nn, lat
"""


@register("stats_ansari_bradley", oracle=_AB_ORACLE)
def stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley two-sample SCALE test between the KS/MWU
    event-type value samples — the rank test for dispersion change
    (same-location, different-spread drift that Mann-Whitney is blind
    to by construction: AB scores a_r = min(r, N+1−r) peak at the
    center, so a variance increase pushes one sample's scores down).
    Midrank-averaged scores for ties via the closed-form block score
    sum (see _AB_ORACLE comment); T1 = Σ ca·S_b/t, z from the exact
    null moments E[T1] = n1·S/N and Var[T1] = n1 n2 (N·S2 − S²)/
    (N²(N−1)) with S2 = Σ S_b²/t (the tie-exact moments, Hollander &
    Wolfe form).

    Determinism: block score sums are BIGINT; the two cross-block
    double accumulations (T1, S2) are pre-scaled by N² / N³ (bounding
    each scaled sum near unity) and integer-lattice-summed at 1e-15 —
    the Kruskal-Wallis treatment — so the k-term order cannot move the
    last ulp; everything after is a fixed scalar expression tree
    identical on both engines. Scale shape: one value-lattice
    aggregation + the probed cumulative sum + one scalar reduce."""
    ev = load_table(spark, "events", sf_dir)
    pooled = ev.filter(F.col("event_type").isin(_AB_A, _AB_B)).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == _AB_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _AB_B, 1).otherwise(0).alias("b"),
    )
    byv = pooled.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    cum = cumulative_sums(
        byv.withColumn("t", F.col("ca") + F.col("cb")), ["v"], ["t"], ["cumt"]
    )
    nn = byv.agg(
        F.sum("ca").alias("n1"), F.sum("cb").alias("n2"),
        (F.sum("ca") + F.sum("cb")).alias("n"),
    )
    blocks = cum.crossJoin(F.broadcast(nn)).select(
        "ca", "cb", "t", "n", "n1", "n2",
        (F.col("cumt") - F.col("t") + 1).alias("lo"),
        F.col("cumt").alias("hi"),
        F.floor((F.col("n") + 1) / 2.0).cast("long").alias("m"),
    )
    hi1 = F.least(F.col("hi"), F.col("m"))
    lo2 = F.greatest(F.col("lo"), F.col("m") + 1)
    part1 = F.when(
        hi1 >= F.col("lo"),
        ((F.col("lo") + hi1) * (hi1 - F.col("lo") + 1) / 2).cast("long"),
    ).otherwise(0)
    part2 = F.when(
        F.col("hi") >= lo2,
        (
            ((F.col("n") + 1 - F.col("hi")) + (F.col("n") + 1 - lo2))
            * (F.col("hi") - lo2 + 1) / 2
        ).cast("long"),
    ).otherwise(0)
    scored = blocks.withColumn("sb", part1 + part2)
    lat = scored.groupBy("n").agg(
        F.sum(F.col("sb")).cast("long").alias("s_total"),
        (
            F.sum(
                F.round(
                    (F.col("ca") * 1.0 * F.col("sb") / F.col("t"))
                    / (1.0 * F.col("n") * F.col("n")) * 1e15, 0
                ).cast("long")
            ).cast("double") / 1e15
        ).alias("t1s"),
        (
            F.sum(
                F.round(
                    (F.col("sb") * 1.0 * F.col("sb") / F.col("t"))
                    / (1.0 * F.col("n") * F.col("n") * F.col("n")) * 1e15, 0
                ).cast("long")
            ).cast("double") / 1e15
        ).alias("s2s"),
    )
    t1 = F.col("t1s") * F.col("n") * F.col("n")
    e1 = F.col("n1") * (F.col("s_total") * 1.0 / F.col("n"))
    var = (
        1.0 * F.col("n1") * F.col("n2")
        * (
            F.col("n") * (F.col("s2s") * F.col("n") * F.col("n") * F.col("n"))
            - (F.col("s_total") * 1.0) * F.col("s_total")
        )
        / (1.0 * F.col("n") * F.col("n") * (F.col("n") - 1))
    )
    return (
        nn.select("n1", "n2")
        .crossJoin(F.broadcast(lat))
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("n").cast("long").alias("n_total"),
            F.round(t1, 3).alias("ab_t1"),
            F.round((t1 - e1) / F.sqrt(var), 6).alias("z_score"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Anderson-Darling (Scholz-Stephens tie-adjusted A2akN)
# ---------------------------------------------------------------------------

# Midpoint form over the value lattice: per block j, Ba_j = cumt - t/2
# and Ma_ij = cum_i - t_i/2 (half-integers — carried as the INTEGER
# doublings 2Ba = 2*cumt - t and 2Ma = 2*cum_i - t_i). The per-block
# term (1/n_i)(t_j/N) * (N*Ma - n_i*Ba)^2 / (Ba(N-Ba) - N*t_j/4)
# rewrites exactly as t_j * num2^2 / (denom4 * N * n_i) with
# num2 = N*2Ma - n_i*2Ba and denom4 = (2Ba)(2N - 2Ba) - N*t_j (both
# integer), so the only doubles are one product and one division per
# block, lattice-summed at 1e-12.
_AD_ORACLE = f"""
    WITH pooled AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')
    ),
    byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
            FROM pooled GROUP BY v),
    cum AS (SELECT v, ca, cb, ca + cb AS t,
                   sum(ca) OVER (ORDER BY v) AS cuma,
                   sum(cb) OVER (ORDER BY v) AS cumb,
                   sum(ca + cb) OVER (ORDER BY v) AS cumt
            FROM byv),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
                  CAST(sum(ca + cb) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS n_blocks
           FROM byv),
    terms AS (
      SELECT nn.n, nn.n1, nn.n2, nn.n_blocks,
             t * ((nn.n * (2 * cuma - ca) - nn.n1 * (2 * cumt - t)) * 1.0
                  * (nn.n * (2 * cuma - ca) - nn.n1 * (2 * cumt - t)))
               / (1.0 * ((2 * cumt - t) * (2 * nn.n - (2 * cumt - t))
                         - nn.n * t) * nn.n * nn.n1) AS ta,
             t * ((nn.n * (2 * cumb - cb) - nn.n2 * (2 * cumt - t)) * 1.0
                  * (nn.n * (2 * cumb - cb) - nn.n2 * (2 * cumt - t)))
               / (1.0 * ((2 * cumt - t) * (2 * nn.n - (2 * cumt - t))
                         - nn.n * t) * nn.n * nn.n2) AS tb
      FROM cum, nn
    )
    SELECT n1, n2, n AS n_total, n_blocks,
           round((n - 1.0) / n
                 * (CAST(sum(CAST(round(ta * 1e12, 0) AS BIGINT)) AS DOUBLE)
                    / 1e12
                    + CAST(sum(CAST(round(tb * 1e12, 0) AS BIGINT)) AS DOUBLE)
                      / 1e12), 6) AS a2_stat
    FROM terms GROUP BY n1, n2, n, n_blocks
"""


@register("stats_ad_two_sample", oracle=_AD_ORACLE)
def stats_ad_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A²akN (Scholz-Stephens 1987,
    tie-adjusted midpoint form) between the KS/MWU event-type value
    samples — the tail-weighted distribution-equality test: the
    1/(Ba(N−Ba)) weight blows up at the distribution edges, so A²
    catches tail drift that the center-weighted KS statistic smooths
    over (the canonical pairing for drift gates: KS for the body, AD
    for the tails).

    The midpoint construction keeps every tie block's contribution a
    ratio of INTEGERS (see _AD_ORACLE comment); the cross-block sum is
    pre-scaled (each term already carries 1/(N·n_i)) and
    integer-lattice-summed at 1e-12, Kruskal-Wallis-style, so
    accumulation order cannot move a bit. Scale shape: one
    value-lattice aggregation + the probed cumulative sum (three
    running counters in ONE pass) + one scalar reduce."""
    ev = load_table(spark, "events", sf_dir)
    pooled = ev.filter(F.col("event_type").isin(_AB_A, _AB_B)).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == _AB_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _AB_B, 1).otherwise(0).alias("b"),
    )
    byv = pooled.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    cum = cumulative_sums(
        byv.withColumn("t", F.col("ca") + F.col("cb")),
        ["v"], ["ca", "cb", "t"], ["cuma", "cumb", "cumt"],
    )
    nn = byv.agg(
        F.sum("ca").alias("n1"), F.sum("cb").alias("n2"),
        (F.sum("ca") + F.sum("cb")).alias("n"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    j = cum.crossJoin(F.broadcast(nn))
    two_ba = 2 * F.col("cumt") - F.col("t")
    denom4 = two_ba * (2 * F.col("n") - two_ba) - F.col("n") * F.col("t")

    def term(cum_i: str, c_i: str, n_i: str):
        num2 = F.col("n") * (2 * F.col(cum_i) - F.col(c_i)) - F.col(n_i) * two_ba
        return F.col("t") * (num2 * 1.0 * num2) / (
            1.0 * denom4 * F.col("n") * F.col(n_i)
        )

    terms = j.select(
        "n", "n1", "n2", "n_blocks",
        term("cuma", "ca", "n1").alias("ta"),
        term("cumb", "cb", "n2").alias("tb"),
    )
    return terms.groupBy("n1", "n2", "n", "n_blocks").agg(
        F.round(
            (F.col("n") - 1.0) / F.col("n")
            * (
                F.sum(F.round(F.col("ta") * 1e12, 0).cast("long")).cast("double")
                / 1e12
                + F.sum(F.round(F.col("tb") * 1e12, 0).cast("long")).cast("double")
                / 1e12
            ),
            6,
        ).alias("a2_stat")
    ).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("n").cast("long").alias("n_total"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        "a2_stat",
    )


# ---------------------------------------------------------------------------
# Two-sample Cramér-von Mises
# ---------------------------------------------------------------------------


@register(
    "stats_cramer_von_mises",
    oracle=f"""
    WITH pooled AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')
    ),
    byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
            FROM pooled GROUP BY v),
    cum AS (SELECT v, ca, cb, ca + cb AS t,
                   sum(ca) OVER (ORDER BY v) AS cuma,
                   sum(cb) OVER (ORDER BY v) AS cumb
            FROM byv),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
                  CAST(sum(ca + cb) AS BIGINT) AS n
           FROM byv),
    lat AS (
      SELECT nn.n1, nn.n2, nn.n,
             CAST(sum(CAST(round(
               t * ((nn.n2 * cuma - nn.n1 * cumb) * 1.0
                    * (nn.n2 * cuma - nn.n1 * cumb))
                 / (1.0 * nn.n * nn.n * nn.n1 * nn.n2) * 1e12, 0) AS BIGINT))
             AS DOUBLE) / 1e12 AS t_stat
      FROM cum, nn GROUP BY nn.n1, nn.n2, nn.n
    )
    SELECT n1, n2, n AS n_total,
           round(t_stat, 6) AS t_stat,
           round((n + 1.0) / (6.0 * n), 6) AS t_null_mean,
           round((t_stat - (n + 1.0) / (6.0 * n))
                 / sqrt((n + 1.0) / (45.0 * n * n)
                        * (4.0 * n1 * n2 * n - 3.0 * (n1 * 1.0 * n1
                           + n2 * 1.0 * n2) - 2.0 * n1 * n2)
                        / (4.0 * n1 * n2)), 6) AS z_score
    FROM lat
    """,
)
def stats_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises T between the KS/MWU event-type
    value samples, in the ecdf form T = (n1·n2/N²)·Σ_blocks t·(F̂₁−F̂₂)²
    — the INTEGRATED squared ecdf gap, completing the two-sample
    distribution-equality triad (KS = sup gap, AD = tail-weighted, CvM
    = body-integrated; a drift gate reports all three because they
    rank different alternatives differently). Standardized against the
    exact null moments E[T] = (N+1)/(6N) and Anderson's finite-sample
    Var[T] = (N+1)/(45N²)·(4mnN − 3(m²+n²) − 2mn)/(4mn).

    Per block the squared gap is a ratio of integers: n2·cumA − n1·cumB
    is BIGINT and t·d²/(N²n1n2) ≤ t/4, so the lattice sum at 1e-12 is
    exact-ordered (Kruskal-Wallis treatment); the moments are fixed
    scalar expressions on three integers. Scale shape: one
    value-lattice aggregation + the probed cumulative sum + one scalar
    reduce."""
    ev = load_table(spark, "events", sf_dir)
    pooled = ev.filter(F.col("event_type").isin(_AB_A, _AB_B)).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == _AB_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _AB_B, 1).otherwise(0).alias("b"),
    )
    byv = pooled.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    cum = cumulative_sums(
        byv.withColumn("t", F.col("ca") + F.col("cb")),
        ["v"], ["ca", "cb"], ["cuma", "cumb"],
    )
    nn = byv.agg(
        F.sum("ca").alias("n1"), F.sum("cb").alias("n2"),
        (F.sum("ca") + F.sum("cb")).alias("n"),
    )
    j = cum.crossJoin(F.broadcast(nn))
    d = F.col("n2") * F.col("cuma") - F.col("n1") * F.col("cumb")
    term = F.col("t") * (d * 1.0 * d) / (
        1.0 * F.col("n") * F.col("n") * F.col("n1") * F.col("n2")
    )
    lat = j.groupBy("n1", "n2", "n").agg(
        (
            F.sum(F.round(term * 1e12, 0).cast("long")).cast("double") / 1e12
        ).alias("t_stat")
    )
    mean0 = (F.col("n") + 1.0) / (6.0 * F.col("n"))
    var0 = (
        (F.col("n") + 1.0) / (45.0 * F.col("n") * F.col("n"))
        * (
            4.0 * F.col("n1") * F.col("n2") * F.col("n")
            - 3.0 * (F.col("n1") * 1.0 * F.col("n1")
                     + F.col("n2") * 1.0 * F.col("n2"))
            - 2.0 * F.col("n1") * F.col("n2")
        )
        / (4.0 * F.col("n1") * F.col("n2"))
    )
    return lat.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("n").cast("long").alias("n_total"),
        F.round(F.col("t_stat"), 6).alias("t_stat"),
        F.round(mean0, 6).alias("t_null_mean"),
        F.round((F.col("t_stat") - mean0) / F.sqrt(var0), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Multiclass macro/micro F1 for the langid heuristic
# ---------------------------------------------------------------------------


@register(
    "ml_macro_f1_multiclass",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> x IN ('der','die','das','und','nicht'))) AS s_de,
        len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS s_en,
        len(list_filter(toks, x -> x IN ('el','los','las','y','no'))) AS s_es,
        len(list_filter(toks, x -> x IN ('le','la','les','et','pas'))) AS s_fr
      FROM t
    ),
    lid AS (
      SELECT doc_id, lang,
        CASE
          WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
          WHEN s_es >= s_fr THEN 'es'
          ELSE 'fr'
        END AS pred
      FROM s
    ),
    conf AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n FROM lid GROUP BY lang, pred),
    classes AS (
      SELECT lang AS k FROM conf UNION SELECT pred AS k FROM conf
    ),
    perclass AS (
      SELECT c.k AS class,
             CAST(COALESCE(sum(CASE WHEN conf.lang = c.k AND conf.pred = c.k
                                    THEN n END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(sum(CASE WHEN conf.pred = c.k AND conf.lang <> c.k
                                    THEN n END), 0) AS BIGINT) AS fp,
             CAST(COALESCE(sum(CASE WHEN conf.lang = c.k AND conf.pred <> c.k
                                    THEN n END), 0) AS BIGINT) AS fn
      FROM classes c LEFT JOIN conf
        ON conf.lang = c.k OR conf.pred = c.k
      GROUP BY c.k
    ),
    scored AS (
      SELECT class, tp, fp, fn,
             round(CASE WHEN tp + fp = 0 THEN 0.0
                        ELSE tp * 1.0 / (tp + fp) END, 6) AS precision,
             round(CASE WHEN tp + fn = 0 THEN 0.0
                        ELSE tp * 1.0 / (tp + fn) END, 6) AS recall,
             CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE 2.0 * tp / (2 * tp + fp + fn) END AS f1x
      FROM perclass
    ),
    macro AS (
      SELECT round(CAST(sum(CAST(round(f1x * 1e6, 0) AS BIGINT)) AS DOUBLE)
                   / 1e6 / count(*), 6) AS macro_f1,
             round(sum(tp) * 1.0 / (sum(tp) + sum(fp)), 6) AS micro_f1
      FROM scored
    )
    SELECT s.class, s.tp, s.fp, s.fn, s.precision, s.recall,
           round(s.f1x, 6) AS f1,
           m.macro_f1, m.micro_f1
    FROM scored s, macro m
    ORDER BY s.class
    """,
)
def ml_macro_f1_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 plus macro- and micro-averaged F1
    for the langid heuristic — the MULTICLASS eval readout
    (ml_classifier_eval is the binary harness; ml_langid_mcc collapses
    to one number). Macro-F1 weights every class equally — the metric
    that exposes a classifier coasting on the majority language, which
    is exactly the failure mode of langid gates on imbalanced corpora.
    Micro-F1 for single-label multiclass equals accuracy (Σtp/(Σtp+Σfp)
    since every error is one FP and one FN).

    The class axis is the UNION of true and predicted labels ('und' is
    predicted but never true — its row carries tp=0), via one LEFT
    join of the ≤|langs|² confusion table. All counts are integers;
    per-class ratios are single exact divisions; the cross-class
    macro mean goes through the 1e-6 micro-unit integer sum so the
    ≤6-row accumulation order is fixed. Scale shape: one scoring pass
    to the confusion table (persisted), then arithmetic on ≤6 rows."""
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    conf = _persist(
        docs.select("lang", TX.lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    classes = (
        conf.select(F.col("lang").alias("k"))
        .union(conf.select(F.col("pred").alias("k")))
        .distinct()
    )
    joined = classes.join(
        conf, (conf.lang == classes.k) | (conf.pred == classes.k), "left"
    )
    perclass = joined.groupBy(F.col("k").alias("class")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("k")) & (F.col("pred") == F.col("k")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("tp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("pred") == F.col("k")) & (F.col("lang") != F.col("k")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("fp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("k")) & (F.col("pred") != F.col("k")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("fn"),
    )
    f1x = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    scored = perclass.select(
        "class", "tp", "fp", "fn",
        F.round(
            F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)).otherwise(
                F.col("tp") * 1.0 / (F.col("tp") + F.col("fp"))
            ), 6,
        ).alias("precision"),
        F.round(
            F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
                F.col("tp") * 1.0 / (F.col("tp") + F.col("fn"))
            ), 6,
        ).alias("recall"),
        f1x.alias("f1x"),
    )
    macro = scored.agg(
        F.round(
            F.sum(F.round(F.col("f1x") * 1e6, 0).cast("long")).cast("double")
            / 1e6 / F.count(F.lit(1)),
            6,
        ).alias("macro_f1"),
        F.round(
            F.sum("tp") * 1.0 / (F.sum("tp") + F.sum("fp")), 6
        ).alias("micro_f1"),
    )
    return (
        scored.crossJoin(F.broadcast(macro))
        .select(
            "class", "tp", "fp", "fn", "precision", "recall",
            F.round(F.col("f1x"), 6).alias("f1"),
            "macro_f1", "micro_f1",
        )
        .orderBy("class")
    )


# ---------------------------------------------------------------------------
# Harmonic centrality over the trade graph
# ---------------------------------------------------------------------------

_HC_LEVELS = 4  # BFS horizon replayed by the oracle (trade-graph diameter)
_HC_LCM = 12   # lcm(1..4): 12/d is integer for every reachable distance


def _hc_bfs_sql() -> str:
    """All-pairs layered BFS as chained CTEs: one frontier table keyed
    by (source, node) per level.

    Every level CTE is MATERIALIZED: each h{l} is referenced twice by
    level l+1 (frontier scan + NOT EXISTS), so without the hint DuckDB
    inlines the whole chain and re-evaluates the fact-scale edge build
    ~3^levels times — measured 46.7 s vs 0.4 s at the 100x store for
    IDENTICAL results (the hint changes evaluation, not semantics)."""
    parts = [
        "em AS MATERIALIZED (SELECT src, dst FROM e)",
        "nodes AS MATERIALIZED "
        "(SELECT src AS nk FROM em UNION SELECT dst AS nk FROM em)",
        "h0 AS MATERIALIZED (SELECT nk AS s, nk AS v, 0 AS dist FROM nodes)",
    ]
    for lvl in range(1, _HC_LEVELS + 1):
        prev = f"h{lvl - 1}"
        parts.append(f"""
    g{lvl} AS MATERIALIZED (
      SELECT r.s, em.dst AS v, {lvl} AS dist
      FROM {prev} r JOIN em ON r.v = em.src
      WHERE r.dist = {lvl - 1}
        AND NOT EXISTS (SELECT 1 FROM {prev} p
                        WHERE p.s = r.s AND p.v = em.dst)
      GROUP BY r.s, em.dst
    ),
    h{lvl} AS MATERIALIZED
      (SELECT * FROM {prev} UNION ALL SELECT * FROM g{lvl})""")
    return ",\n".join(parts)


@register(
    "graph_harmonic_centrality",
    oracle=f"""
    WITH {_sp_edges_sql()},
    {_hc_bfs_sql()}
    SELECT s AS nationkey,
           CAST(count(*) - 1 AS BIGINT) AS n_reached,
           CAST(sum(CASE WHEN dist = 0 THEN 0 ELSE {_HC_LCM} // dist END)
                AS BIGINT) AS h_scaled,
           round(sum(CASE WHEN dist = 0 THEN 0 ELSE {_HC_LCM} // dist END)
                 / {float(_HC_LCM)}, 6) AS harmonic
    FROM h{_HC_LEVELS}
    GROUP BY s
    ORDER BY s
    """,
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality Σ 1/d(u,v) per nation over the sparsified
    customer→supplier trade graph — the centrality that stays
    well-defined on DISCONNECTED graphs (closeness degenerates: one
    unreachable node zeroes it; harmonic just drops the 1/∞ term),
    which is the normal condition for a top-k-sparsified digraph.
    Distances from all-pairs layered BFS to the graph's diameter
    horizon; reciprocals enter as the INTEGER lattice 12/d
    (lcm(1..4) = 12 divides every reachable distance), so the
    per-source sum is exact integer arithmetic and the single
    unscaling division is identical on both engines.

    Scale shape: the expensive stage is the fully distributed
    fact-join edge build (shared _sp_edges_df — map-combinable to
    ≤|nations|² rows + per-source top-k); the BFS schedule then runs
    on the COLLECTED ≤75-row edge summary (the bounded-collect
    contract of graph_shortest_paths/pagerank — a frame-per-level loop
    would shuffle 25-row frames through ~10 s of stage overhead). The
    oracle replays every frontier expansion for every source as
    chained CTEs, certifying the iteration schedule itself."""
    edge_rows = bounded_rows(
        _sp_edges_df(spark, sf_dir), 75,
        "nation-graph edge summary (<= |nations| * topk = 75)",
    )
    out_adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for r in edge_rows:
        out_adj.setdefault(int(r.src), []).append(int(r.dst))
        nodes.add(int(r.src))
        nodes.add(int(r.dst))
    rows = []
    for s in sorted(nodes):
        dist = {s: 0}
        frontier = [s]
        for lvl in range(1, _HC_LEVELS + 1):
            nxt = []
            for u in frontier:
                for w in out_adj.get(u, ()):
                    if w not in dist:
                        dist[w] = lvl
                        nxt.append(w)
            frontier = nxt
        h_scaled = sum(_HC_LCM // d for d in dist.values() if d > 0)
        rows.append((s, len(dist) - 1, h_scaled, round(h_scaled / _HC_LCM, 6)))
    return spark.createDataFrame(
        rows, "nationkey INT, n_reached BIGINT, h_scaled BIGINT, harmonic DOUBLE"
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Wave 10: Brunner-Munzel generalized rank test
# ---------------------------------------------------------------------------

# All rank quantities are half-integers on the value lattice, carried as
# integer DOUBLINGS: combined midrank 2R = 2*cumt - t + 1; within-sample
# midrank 2r_i = 2*cum_i - c_i + 1; placement doubling q_i = 2(R - r_i)
# = 2*cumt - t - 2*cum_i + c_i. The placement means come from EXACT
# integer sums (sum c_i * 2R fits BIGINT); the placement second moment
# sum c_i * q_i^2 would overflow BIGINT at the 100x store, so it goes
# through the Kruskal-Wallis pre-scaled lattice (divided by 4N^2,
# bounding each term at c_i, summed as 1e9-lattice integers).
_BM_ORACLE = f"""
    WITH pooled AS (
      SELECT value AS v,
             CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')
    ),
    byv AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
            FROM pooled GROUP BY v),
    cum AS (SELECT v, ca, cb, ca + cb AS t,
                   sum(ca) OVER (ORDER BY v) AS cuma,
                   sum(cb) OVER (ORDER BY v) AS cumb,
                   sum(ca + cb) OVER (ORDER BY v) AS cumt
            FROM byv),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
                  CAST(sum(ca + cb) AS BIGINT) AS n
           FROM byv),
    mom AS (
      SELECT nn.n1, nn.n2, nn.n,
             CAST(sum(ca * (2 * cumt - t + 1)) AS BIGINT) AS s2ra,
             CAST(sum(cb * (2 * cumt - t + 1)) AS BIGINT) AS s2rb,
             CAST(sum(ca * (2 * cumt - t - 2 * cuma + ca)) AS BIGINT) AS sqa1,
             CAST(sum(cb * (2 * cumt - t - 2 * cumb + cb)) AS BIGINT) AS sqb1,
             CAST(sum(CAST(round(
               ca * ((2 * cumt - t - 2 * cuma + ca) * 1.0
                     * (2 * cumt - t - 2 * cuma + ca))
                  / (4.0 * nn.n * nn.n) * 1e9, 0) AS BIGINT)) AS DOUBLE) / 1e9
               AS sqa2,
             CAST(sum(CAST(round(
               cb * ((2 * cumt - t - 2 * cumb + cb) * 1.0
                     * (2 * cumt - t - 2 * cumb + cb))
                  / (4.0 * nn.n * nn.n) * 1e9, 0) AS BIGINT)) AS DOUBLE) / 1e9
               AS sqb2
      FROM cum, nn GROUP BY nn.n1, nn.n2, nn.n
    ),
    stat AS (
      SELECT n1, n2, n,
             s2ra / (2.0 * n1) AS m1,
             s2rb / (2.0 * n2) AS m2,
             (sqa2 * n * n - 2 * (s2ra / (2.0 * n1) - (n1 + 1) / 2.0)
                             * (sqa1 / 2.0)
              + n1 * (s2ra / (2.0 * n1) - (n1 + 1) / 2.0)
                   * (s2ra / (2.0 * n1) - (n1 + 1) / 2.0)) / (n1 - 1) AS v1,
             (sqb2 * n * n - 2 * (s2rb / (2.0 * n2) - (n2 + 1) / 2.0)
                             * (sqb1 / 2.0)
              + n2 * (s2rb / (2.0 * n2) - (n2 + 1) / 2.0)
                   * (s2rb / (2.0 * n2) - (n2 + 1) / 2.0)) / (n2 - 1) AS v2
      FROM mom
    )
    SELECT n1, n2,
           round((m2 - (n2 + 1) / 2.0) / n1, 6) AS p_hat,
           round(1.0 * n1 * n2 * (m2 - m1)
                 / (n * sqrt(n1 * v1 + n2 * v2)), 6) AS w_stat,
           round(((n1 * v1 + n2 * v2) * (n1 * v1 + n2 * v2))
                 / ((n1 * v1) * (n1 * v1) / (n1 - 1)
                    + (n2 * v2) * (n2 * v2) / (n2 - 1)), 3) AS df_welch
    FROM stat
"""


@register("stats_brunner_munzel", oracle=_BM_ORACLE)
def stats_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel generalized Wilcoxon test between the KS/MWU
    event-type value samples — the rank test that stays valid when the
    two distributions differ in SHAPE/variance (the Behrens-Fisher
    situation where classical Mann-Whitney's variance assumption
    breaks): it estimates p = P(X<Y) + 0.5*P(X=Y) directly and
    studentizes with per-sample placement variances and a
    Welch-Satterthwaite df. The modern default recommendation for
    two-sample rank testing, completing the location (MWU) / scale
    (Ansari-Bradley) / shape-robust (this) rank family.

    Determinism (see _BM_ORACLE comment): placement means from exact
    BIGINT doubled-midrank sums; the one overflow-prone second moment
    through the pre-scaled 1e9 lattice; everything downstream a fixed
    scalar expression tree. Scale shape: one value-lattice aggregation
    + the probed cumulative sum (three counters, one pass) + one
    scalar reduce — identical cost to the MWU it generalizes."""
    ev = load_table(spark, "events", sf_dir)
    pooled = ev.filter(F.col("event_type").isin(_AB_A, _AB_B)).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == _AB_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == _AB_B, 1).otherwise(0).alias("b"),
    )
    byv = pooled.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    cum = cumulative_sums(
        byv.withColumn("t", F.col("ca") + F.col("cb")),
        ["v"], ["ca", "cb", "t"], ["cuma", "cumb", "cumt"],
    )
    nn = byv.agg(
        F.sum("ca").alias("n1"), F.sum("cb").alias("n2"),
        (F.sum("ca") + F.sum("cb")).alias("n"),
    )
    j = cum.crossJoin(F.broadcast(nn))
    two_r = 2 * F.col("cumt") - F.col("t") + 1
    qa = 2 * F.col("cumt") - F.col("t") - 2 * F.col("cuma") + F.col("ca")
    qb = 2 * F.col("cumt") - F.col("t") - 2 * F.col("cumb") + F.col("cb")
    mom = j.groupBy("n1", "n2", "n").agg(
        F.sum(F.col("ca") * two_r).cast("long").alias("s2ra"),
        F.sum(F.col("cb") * two_r).cast("long").alias("s2rb"),
        F.sum(F.col("ca") * qa).cast("long").alias("sqa1"),
        F.sum(F.col("cb") * qb).cast("long").alias("sqb1"),
        (
            F.sum(
                F.round(
                    F.col("ca") * (qa * 1.0 * qa)
                    / (4.0 * F.col("n") * F.col("n")) * 1e9, 0
                ).cast("long")
            ).cast("double") / 1e9
        ).alias("sqa2"),
        (
            F.sum(
                F.round(
                    F.col("cb") * (qb * 1.0 * qb)
                    / (4.0 * F.col("n") * F.col("n")) * 1e9, 0
                ).cast("long")
            ).cast("double") / 1e9
        ).alias("sqb2"),
    )
    m1 = F.col("s2ra") / (2.0 * F.col("n1"))
    m2 = F.col("s2rb") / (2.0 * F.col("n2"))
    c1 = m1 - (F.col("n1") + 1) / 2.0
    c2 = m2 - (F.col("n2") + 1) / 2.0
    v1 = (
        F.col("sqa2") * F.col("n") * F.col("n")
        - 2 * c1 * (F.col("sqa1") / 2.0)
        + F.col("n1") * c1 * c1
    ) / (F.col("n1") - 1)
    v2 = (
        F.col("sqb2") * F.col("n") * F.col("n")
        - 2 * c2 * (F.col("sqb1") / 2.0)
        + F.col("n2") * c2 * c2
    ) / (F.col("n2") - 1)
    nv = F.col("n1") * v1 + F.col("n2") * v2
    return mom.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round((m2 - (F.col("n2") + 1) / 2.0) / F.col("n1"), 6).alias("p_hat"),
        F.round(
            1.0 * F.col("n1") * F.col("n2") * (m2 - m1)
            / (F.col("n") * F.sqrt(nv)), 6
        ).alias("w_stat"),
        F.round(
            (nv * nv)
            / (
                (F.col("n1") * v1) * (F.col("n1") * v1) / (F.col("n1") - 1)
                + (F.col("n2") * v2) * (F.col("n2") * v2) / (F.col("n2") - 1)
            ), 3
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# Wave 10: two-sample Poisson rate test on event counts
# ---------------------------------------------------------------------------


@register(
    "events_poisson_rate_test",
    oracle=f"""
    WITH k AS (
      SELECT CAST(sum(CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k1,
             CAST(sum(CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k2,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
      FROM events
    )
    SELECT k1, k2, n_days,
           round(k1 * 1.0 / k2, 6) AS rate_ratio,
           round((k1 - k2) / sqrt(1.0 * (k1 + k2)), 6) AS z_conditional,
           CAST(CASE WHEN abs((k1 - k2) / sqrt(1.0 * (k1 + k2)))
                     > 1.959963984540054 THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM k
    """,
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate comparison between the purchase and
    click event streams over their shared observation window: under
    equal rates (and equal exposure — both streams span the same
    calendar), k1 | k1+k2 is Binomial(K, 1/2), so the CONDITIONAL
    z = (k1 − k2)/√(k1+k2) is the exact-variance score test — the
    throughput-drift gate for event pipelines (is stream A's RATE
    different from stream B's?), complementing events_ab_test_zscore
    which compares VALUES within one stream. Inputs are two integer
    counts and IEEE √, so both engines produce identical doubles.

    Scale shape: one map-combinable conditional-count pass over the
    fact (plus the distinct-day exposure count) — constant state per
    task, no shuffle beyond the 1-row combine."""
    ev = load_table(spark, "events", sf_dir)
    k = ev.agg(
        F.sum(F.when(F.col("event_type") == _AB_A, 1).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("event_type") == _AB_B, 1).otherwise(0)).alias("k2"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )
    z = (F.col("k1") - F.col("k2")) / F.sqrt(1.0 * (F.col("k1") + F.col("k2")))
    return k.select(
        F.col("k1").cast("long").alias("k1"),
        F.col("k2").cast("long").alias("k2"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("k1") * 1.0 / F.col("k2"), 6).alias("rate_ratio"),
        F.round(z, 6).alias("z_conditional"),
        F.when(F.abs(z) > 1.959963984540054, 1).otherwise(0).cast("int").alias(
            "reject_05"
        ),
    )


# ---------------------------------------------------------------------------
# Wave 10: pairwise Jensen-Shannon divergence between sources
# ---------------------------------------------------------------------------

_JS_TOPK_SOURCES = 6  # bounded pair fan-out: 6 sources -> 15 pairs


@register(
    "text_js_divergence_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY source, w),
    s AS (SELECT source, sum(c) AS c_s FROM sw GROUP BY source),
    top AS (SELECT source, c_s FROM s
            ORDER BY c_s DESC, source LIMIT {_JS_TOPK_SOURCES}),
    pairs AS (SELECT a.source AS s1, a.c_s AS c1, b.source AS s2, b.c_s AS c2
              FROM top a, top b WHERE a.source < b.source),
    wv AS (SELECT DISTINCT w FROM sw
           WHERE source IN (SELECT source FROM top)),
    grid AS (
      SELECT pr.s1, pr.s2,
             COALESCE(x.c, 0) * 1.0 / pr.c1 AS p,
             COALESCE(y.c, 0) * 1.0 / pr.c2 AS q
      FROM pairs pr
      CROSS JOIN wv
      LEFT JOIN sw x ON x.source = pr.s1 AND x.w = wv.w
      LEFT JOIN sw y ON y.source = pr.s2 AND y.w = wv.w
      WHERE COALESCE(x.c, 0) + COALESCE(y.c, 0) > 0
    )
    SELECT s1, s2,
           CAST(count(*) AS BIGINT) AS vocab_union,
           round(0.5 * sum(CASE WHEN p > 0
                                THEN p * ln(2.0 * p / (p + q)) ELSE 0 END)
                 + 0.5 * sum(CASE WHEN q > 0
                                  THEN q * ln(2.0 * q / (p + q)) ELSE 0 END), 6)
             AS js_nats,
           round((0.5 * sum(CASE WHEN p > 0
                                 THEN p * ln(2.0 * p / (p + q)) ELSE 0 END)
                  + 0.5 * sum(CASE WHEN q > 0
                                   THEN q * ln(2.0 * q / (p + q)) ELSE 0 END))
                 / ln(2.0), 6) AS js_bits
    FROM grid
    GROUP BY s1, s2
    ORDER BY s1, s2
    """,
)
def text_js_divergence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of the top-k sources by token volume — the SYMMETRIC,
    bounded (≤ ln 2) companion to corpus_source_kl_divergence: KL vs
    the corpus says which feed drifts from the blend; pairwise JS says
    which feeds are interchangeable vs complementary (the mixture-
    design input for corpus_mixture_plan — near-zero JS pairs are
    redundant, high-JS pairs cover different text). JS(p,q) =
    ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)) with 0·ln0 = 0; js_bits =
    js_nats/ln 2 normalizes to [0,1].

    Scale shape: ONE token-scale shuffle to the (source, word) count
    frame (shared shape with the KL query); the pair fan-out is
    BOUNDED — top-{_JS_TOPK_SOURCES} sources → ≤15 pairs broadcast
    against the vocabulary frame, so the grid is |vocab|·|pairs| rows
    with both probability joins on the word key. The support filter
    (p+q > 0) keeps only words either source uses. ln determinism
    follows the KL precedent (6-decimal rounding over a
    magnitude-homogeneous sum, hash-stable across ten driver
    rounds)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("source", F.explode(F.split("text", r"\s+")).alias("w"))
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    s = sw.groupBy("source").agg(F.sum("c").alias("c_s"))
    top = s.orderBy(F.col("c_s").desc(), "source").limit(_JS_TOPK_SOURCES)
    a = top.select(F.col("source").alias("s1"), F.col("c_s").alias("c1"))
    b = top.select(F.col("source").alias("s2"), F.col("c_s").alias("c2"))
    pairs = a.crossJoin(b).filter(F.col("s1") < F.col("s2"))
    wv = (
        sw.join(F.broadcast(top.select("source")), "source")
        .select("w").distinct()
    )
    x = sw.select(F.col("source").alias("xs"), F.col("w").alias("xw"),
                  F.col("c").alias("xc"))
    y = sw.select(F.col("source").alias("ys"), F.col("w").alias("yw"),
                  F.col("c").alias("yc"))
    grid = (
        wv.crossJoin(F.broadcast(pairs))
        .join(x, (F.col("xs") == F.col("s1")) & (F.col("xw") == F.col("w")), "left")
        .join(y, (F.col("ys") == F.col("s2")) & (F.col("yw") == F.col("w")), "left")
        .select(
            "s1", "s2",
            (F.coalesce(F.col("xc"), F.lit(0)) * 1.0 / F.col("c1")).alias("p"),
            (F.coalesce(F.col("yc"), F.lit(0)) * 1.0 / F.col("c2")).alias("q"),
        )
        .filter(F.col("p") + F.col("q") > 0)
    )
    half_p = F.sum(
        F.when(F.col("p") > 0,
               F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q"))))
        .otherwise(0.0)
    )
    half_q = F.sum(
        F.when(F.col("q") > 0,
               F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q"))))
        .otherwise(0.0)
    )
    js = 0.5 * half_p + 0.5 * half_q
    return (
        grid.groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("vocab_union"),
            F.round(js, 6).alias("js_nats"),
            F.round(js / math.log(2.0), 6).alias("js_bits"),
        )
        .orderBy("s1", "s2")
    )


# ---------------------------------------------------------------------------
# Wave 11: Jonckheere-Terpstra ordered-alternative trend test
# ---------------------------------------------------------------------------

# Ordered groups = week-of-month (floor((day-1)/7), 0..4) of the event
# stream; the alternative is a MONOTONE distribution shift across
# weeks. 2*JT is exact BIGINT via the dense per-group value-lattice
# grid: 2*JT = sum over group pairs i<j and lattice values v of
# 2*c_j(v)*cumlt_i(v) + c_j(v)*c_i(v), where cumlt_i(v) = #elements of
# group i strictly below v. The grid MUST be dense (every group at
# every lattice value, zero-filled): a support-only equi-join would
# drop contributions where group j has rows at v but group i merely
# has mass below v. Null moments use the standard tie-corrected JT
# variance (Kendall form) — integer power sums combined in doubles
# identically on both engines.
_JT_ORACLE = """
    WITH base AS (
      SELECT value AS v,
             CAST(floor((CAST(strftime(ts, '%d') AS BIGINT) - 1) / 7.0)
                  AS BIGINT) AS g
      FROM events
    ),
    byvg AS (SELECT v, g, CAST(count(*) AS BIGINT) AS c
             FROM base GROUP BY v, g),
    vals AS (SELECT DISTINCT v FROM byvg),
    grps AS (SELECT DISTINCT g FROM byvg),
    grid AS (
      SELECT vals.v, grps.g, COALESCE(byvg.c, 0) AS c
      FROM vals CROSS JOIN grps
      LEFT JOIN byvg ON byvg.v = vals.v AND byvg.g = grps.g
    ),
    cum AS (
      SELECT v, g, c,
             sum(c) OVER (PARTITION BY g ORDER BY v) - c AS cumlt
      FROM grid
    ),
    jt2 AS (
      SELECT CAST(sum(2 * b.c * a.cumlt + b.c * a.c) AS BIGINT) AS jt2
      FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g
    ),
    gsz AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM byvg GROUP BY g),
    tsz AS (SELECT v, CAST(sum(c) AS BIGINT) AS tv FROM byvg GROUP BY v),
    mom AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng * ng) AS BIGINT) AS sn2,
             sum((1.0 * ng) * (ng - 1) * (2 * ng + 5)) AS sn25,
             sum((1.0 * ng) * (ng - 1) * (ng - 2)) AS sn3,
             sum((1.0 * ng) * (ng - 1)) AS snn
      FROM gsz
    ),
    tmom AS (
      SELECT sum((1.0 * tv) * (tv - 1) * (2 * tv + 5)) AS st25,
             sum((1.0 * tv) * (tv - 1) * (tv - 2)) AS st3,
             sum((1.0 * tv) * (tv - 1)) AS stt
      FROM tsz
    ),
    stat AS (
      SELECT jt2.jt2 / 2.0 AS jt,
             (1.0 * mom.n * mom.n - mom.sn2) / 4.0 AS e_jt,
             ((1.0 * mom.n) * (mom.n - 1) * (2 * mom.n + 5)
              - mom.sn25 - tmom.st25) / 72.0
             + (mom.sn3 * tmom.st3)
               / (36.0 * mom.n * (mom.n - 1) * (mom.n - 2))
             + (mom.snn * tmom.stt) / (8.0 * mom.n * (mom.n - 1)) AS var_jt,
             mom.n AS n, mom.k AS k
      FROM jt2, mom, tmom
    )
    SELECT n AS n_total, k AS k_groups,
           round(jt, 1) AS jt_stat,
           round(e_jt, 1) AS jt_null_mean,
           round((jt - e_jt) / sqrt(var_jt), 6) AS z_score,
           CAST(CASE WHEN abs((jt - e_jt) / sqrt(var_jt))
                     > 1.959963984540054 THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM stat
"""


@register("events_jonckheere_terpstra", oracle=_JT_ORACLE)
def events_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for a MONOTONE distribution trend
    across the ordered week-of-month groups of the event stream — the
    ordered-alternative k-sample test (Kruskal-Wallis asks "any
    difference?"; JT asks "does the distribution shift in ONE
    direction as the ordinal factor increases?" — the dose-response /
    temporal-drift question, with far more power against monotone
    alternatives). JT = Σ_{i<j} U_ij over all ordered group pairs,
    tie convention ½ per tied cross-pair; z against the exact null
    mean (n² − Σn_i²)/4 and the standard tie-corrected variance.

    Determinism (see _JT_ORACLE comment): 2·JT is an exact BIGINT from
    the dense lattice grid; the variance combines integer power sums
    of group and tie-block sizes in a fixed double expression tree.
    Scale shape: one fact aggregation to the (value, week) lattice,
    a |lattice|×k zero-filled grid with k-partitioned cumulative
    windows, one k²-fan self-equi-join on the value key (k=5 ordered
    pairs), and scalar reduces — no data-scale shuffle beyond the
    lattice aggregation."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        F.col("value").alias("v"),
        F.floor((F.dayofmonth("ts") - 1) / 7.0).cast("long").alias("g"),
    )
    byvg = base.groupBy("v", "g").agg(F.count(F.lit(1)).alias("c"))
    vals = byvg.select("v").distinct()
    grps = byvg.select("g").distinct()
    grid = (
        vals.crossJoin(F.broadcast(grps))
        .join(byvg, ["v", "g"], "left")
        .select("v", "g", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "v", "g", "c", (F.sum("c").over(w) - F.col("c")).alias("cumlt")
    )
    a = cum.select(
        F.col("v").alias("av"), F.col("g").alias("ag"),
        F.col("c").alias("ac"), F.col("cumlt").alias("acumlt"),
    )
    b = cum.select(
        F.col("v").alias("bv"), F.col("g").alias("bg"), F.col("c").alias("bc")
    )
    jt2 = (
        a.join(b, (F.col("av") == F.col("bv")) & (F.col("ag") < F.col("bg")))
        .agg(
            F.sum(
                2 * F.col("bc") * F.col("acumlt") + F.col("bc") * F.col("ac")
            ).cast("long").alias("jt2")
        )
    )
    gsz = byvg.groupBy("g").agg(F.sum("c").alias("ng"))
    tsz = byvg.groupBy("v").agg(F.sum("c").alias("tv"))
    mom = gsz.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("ng") * F.col("ng")).alias("sn2"),
        F.sum((1.0 * F.col("ng")) * (F.col("ng") - 1) * (2 * F.col("ng") + 5)).alias("sn25"),
        F.sum((1.0 * F.col("ng")) * (F.col("ng") - 1) * (F.col("ng") - 2)).alias("sn3"),
        F.sum((1.0 * F.col("ng")) * (F.col("ng") - 1)).alias("snn"),
    )
    tmom = tsz.agg(
        F.sum((1.0 * F.col("tv")) * (F.col("tv") - 1) * (2 * F.col("tv") + 5)).alias("st25"),
        F.sum((1.0 * F.col("tv")) * (F.col("tv") - 1) * (F.col("tv") - 2)).alias("st3"),
        F.sum((1.0 * F.col("tv")) * (F.col("tv") - 1)).alias("stt"),
    )
    jt = F.col("jt2") / 2.0
    e_jt = (1.0 * F.col("n") * F.col("n") - F.col("sn2")) / 4.0
    var_jt = (
        (
            (1.0 * F.col("n")) * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("sn25") - F.col("st25")
        ) / 72.0
        + (F.col("sn3") * F.col("st3"))
        / (36.0 * F.col("n") * (F.col("n") - 1) * (F.col("n") - 2))
        + (F.col("snn") * F.col("stt")) / (8.0 * F.col("n") * (F.col("n") - 1))
    )
    z = (jt - e_jt) / F.sqrt(var_jt)
    return (
        jt2.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(tmom))
        .select(
            F.col("n").cast("long").alias("n_total"),
            F.col("k").cast("long").alias("k_groups"),
            F.round(jt, 1).alias("jt_stat"),
            F.round(e_jt, 1).alias("jt_null_mean"),
            F.round(z, 6).alias("z_score"),
            F.when(F.abs(z) > 1.959963984540054, 1).otherwise(0)
            .cast("int").alias("reject_05"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 11: log loss (cross-entropy) with skill score
# ---------------------------------------------------------------------------


@register(
    "ml_log_loss",
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
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(k) AS BIGINT) AS kk FROM byb),
    ll AS (
      SELECT
        -(CAST(sum(CAST(round(
            ((1.0 * k / tot.nn) * ln(p)
             + (1.0 * (n - k) / tot.nn) * ln(1 - p)) * 1e12, 0)
          AS BIGINT)) AS DOUBLE) / 1e12) AS log_loss,
        tot.nn AS nn, tot.kk AS kk
      FROM byb, tot GROUP BY tot.nn, tot.kk
    )
    SELECT nn AS n, kk AS n_pos,
           round(log_loss, 6) AS log_loss,
           round(-((1.0 * kk / nn) * ln(1.0 * kk / nn)
                   + (1.0 * (nn - kk) / nn) * ln(1.0 * (nn - kk) / nn)), 6)
             AS baseline_entropy,
           round(1 - log_loss
                 / (-((1.0 * kk / nn) * ln(1.0 * kk / nn)
                      + (1.0 * (nn - kk) / nn) * ln(1.0 * (nn - kk) / nn))), 6)
             AS skill_score
    FROM ll
    """,
)
def ml_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log loss (binary cross-entropy) of the same binned constant
    forecast as ml_brier_decomposition, plus the base-rate entropy
    baseline and the skill score 1 − LL/H(base) — the metric triad a
    classifier-eval readout actually reports (Brier: quadratic,
    bounded; log loss: the proper scoring rule training optimizes,
    unbounded near confident errors; skill: normalized vs predicting
    the prior). Same bins, outcome, and data pass as the Brier query,
    so the two decompose the same forecast.

    Determinism: bin counts are integers, p_b are fixed rationals;
    each bin's contribution is pre-divided by N (bounding it in
    [−ln 20, 0]) and the ≤10-term sum goes through the 1e-12 lattice
    (ln follows the KL-divergence precedent). Scale shape: ONE
    map-combinable fact aggregation to ≤10 bin rows + 1-row
    arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    byb = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    ).select("bin", ((F.col("bin") + 0.5) / 10.0).alias("p"), "n", "k")
    tot = byb.agg(F.sum("n").alias("nn"), F.sum("k").alias("kk"))
    j = byb.crossJoin(F.broadcast(tot))
    contrib = (
        (1.0 * F.col("k") / F.col("nn")) * F.log(F.col("p"))
        + (1.0 * (F.col("n") - F.col("k")) / F.col("nn")) * F.log(1 - F.col("p"))
    )
    ll = j.groupBy("nn", "kk").agg(
        (
            -(
                F.sum(F.round(contrib * 1e12, 0).cast("long")).cast("double")
                / 1e12
            )
        ).alias("log_loss")
    )
    base_rate = 1.0 * F.col("kk") / F.col("nn")
    ent = -(
        base_rate * F.log(base_rate)
        + (1.0 * (F.col("nn") - F.col("kk")) / F.col("nn"))
        * F.log(1.0 * (F.col("nn") - F.col("kk")) / F.col("nn"))
    )
    return ll.select(
        F.col("nn").cast("long").alias("n"),
        F.col("kk").cast("long").alias("n_pos"),
        F.round(F.col("log_loss"), 6).alias("log_loss"),
        F.round(ent, 6).alias("baseline_entropy"),
        F.round(1 - F.col("log_loss") / ent, 6).alias("skill_score"),
    )
