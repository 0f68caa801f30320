"""Round-11 wave: corpus-growth law fitting, a distributed runs test,
and long-range-dependence estimation — three operators that deepen the
round's scale axes (each exercises a distributed-sequence technique the
r11 hardening added or proved, and each is driver-gated vs DuckDB).

- Heaps' law fit: vocabulary growth V(n) = K·n^β over the document
  stream — the canonical corpus-planning statistic (how much NEW
  vocabulary will the next 10 TB add?). Built on the r11 multi-column
  ``cumulative_sums`` (one range-partitioned pass carries BOTH running
  totals), with the OLS moments integer-scale-summed on both engines.
- Wald-Wolfowitz runs test on the median-dichotomized event sequence —
  randomness screen for event streams. The sequential "lag" is a dense
  event_id equi-join (a.event_id + 1 = b.event_id), NOT an
  unpartitioned window: adjacency via join distributes over any
  partitioning, the scale-correct shape for sequence statistics over
  dense ids.
- Hurst exponent via rescaled-range (R/S) analysis over two chunk
  sizes — long-range dependence of the event-value series (Mandelbrot
  & Wallis 1969). Per-chunk cumulative deviations use windows
  PARTITIONED by chunk (bounded by chunk size, never global), chunk
  moments use the integer-scaled exact sum, and the final slope is
  arithmetic on identical doubles.

Reference scope: none of these exist in the reference (xql has no
statistics surface); they extend SURVEY §2's aggregation family the
same way the r8-r10 stats waves did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register
from weather_tools_spark.queries.core_sql import _davg, _dsum

# ---------------------------------------------------------------------------
# Heaps' law fit
# ---------------------------------------------------------------------------

_HEAPS_CHECKPOINTS = 20

# integer-scaled exact sum of a pre-rounded double expression — the
# DuckDB half of _dsum (same literal idiom as q1's oracle)
_DS = "(CAST(sum(CAST(round(({expr}) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000)"


def _ds(expr: str) -> str:
    return _DS.format(expr=expr)


@register(
    "text_heaps_law_fit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    pd AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_toks
      FROM documents
    ),
    firsts AS (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY w),
    newpd AS (SELECT first_doc AS doc_id, count(*) AS n_new FROM firsts GROUP BY first_doc),
    base AS (
      SELECT pd.doc_id, pd.n_toks, coalesce(newpd.n_new, 0) AS n_new
      FROM pd LEFT JOIN newpd USING (doc_id)
    ),
    cum AS (
      SELECT doc_id,
             sum(n_toks) OVER (ORDER BY doc_id) AS cum_toks,
             sum(n_new)  OVER (ORDER BY doc_id) AS cum_vocab
      FROM base
    ),
    chk AS (
      SELECT round(ln(cum_toks), 6) AS lx, round(ln(cum_vocab), 6) AS ly,
             cum_toks, cum_vocab, doc_id
      FROM cum
      WHERE (doc_id + 1) % (SELECT greatest(1, count(*) // {_HEAPS_CHECKPOINTS}) FROM documents) = 0
    ),
    s AS (
      SELECT count(*) AS n,
             {_ds('lx')} AS sx, {_ds('ly')} AS sy,
             {_ds('lx * lx')} AS sxx, {_ds('lx * ly')} AS sxy,
             max(cum_toks) AS total_tokens, max(cum_vocab) AS total_vocab
      FROM chk
    )
    SELECT CAST(n AS BIGINT) AS n_checkpoints,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(total_vocab AS BIGINT) AS total_vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS heaps_beta,
           round(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n), 6)
             AS heaps_k
    FROM s
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) = K·n^β: cumulative (tokens, vocabulary)
    checkpoints over the doc_id stream, log-log OLS for (K, β).

    Scale shape: per-doc token counts are map-side (size(split), no
    explode); each word's FIRST document is one token-scale groupBy
    (min(doc_id)); both running totals then ride ONE multi-column
    ``cumulative_sums`` pass — the r11 probed dispatcher (ordered
    window only below the measured 100k-row bound, distributed
    two-pass prefix sum past it; the base frame is one row per doc, so
    at 100-TB corpus scale the prefix-sum branch engages). OLS moments
    are pre-rounded and integer-scale-summed (_dsum) on BOTH engines —
    the r11 local-cluster sweep proved raw float moments shift with
    partitioning. β for a Zipf/Heaps corpus lands in (0,1); the
    driver's 31-word fixture saturates early (β near 0 at the tail),
    which the fit reports honestly rather than assuming."""
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    stride = max(1, n_docs // _HEAPS_CHECKPOINTS)

    toks_arr = F.split(F.lower("text"), r"\s+")
    per_doc = docs.select("doc_id", F.size(toks_arr).alias("n_toks"))
    words = docs.select("doc_id", F.explode(toks_arr).alias("w"))
    firsts = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    base = per_doc.join(new_per_doc, "doc_id", "left").select(
        "doc_id", "n_toks", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    cum = cumulative_sums(base, ["doc_id"], ["n_toks", "n_new"], ["cum_toks", "cum_vocab"])
    chk = cum.filter((F.col("doc_id") + 1) % stride == 0).select(
        F.round(F.log(F.col("cum_toks").cast("double")), 6).alias("lx"),
        F.round(F.log(F.col("cum_vocab").cast("double")), 6).alias("ly"),
        "cum_toks",
        "cum_vocab",
    )
    s = chk.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("lx")).alias("sx"),
        _dsum(F.col("ly")).alias("sy"),
        _dsum(F.col("lx") * F.col("lx")).alias("sxx"),
        _dsum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.max("cum_toks").alias("total_tokens"),
        F.max("cum_vocab").alias("total_vocab"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_checkpoints"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("total_vocab").cast("long").alias("total_vocab"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 6).alias(
            "heaps_k"
        ),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


@register(
    "stats_runs_test",
    oracle="""
    WITH med AS (SELECT quantile_cont(value, 0.5) AS m FROM events),
    seq AS (
      SELECT event_id, CASE WHEN value > med.m THEN 1 ELSE 0 END AS above
      FROM events, med
    ),
    adj AS (
      SELECT count(*) AS changes
      FROM seq a JOIN seq b ON b.event_id = a.event_id + 1
      WHERE a.above <> b.above
    ),
    agg AS (
      SELECT CAST(sum(above) AS BIGINT) AS n1,
             CAST(count(*) - sum(above) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n
      FROM seq
    )
    SELECT n1, n2,
           CAST(changes + 1 AS BIGINT) AS runs,
           round((changes + 1 - (2.0 * n1 * n2 / n + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (1.0 * n * n * (n - 1))), 6) AS z_score,
           CAST(CASE WHEN abs((changes + 1 - (2.0 * n1 * n2 / n + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (1.0 * n * n * (n - 1)))) > 1.959963984540054
                THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM adj, agg
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the median-dichotomized event-value
    sequence (above = value > median; runs of equal dichotomized signs
    counted over event_id order). R runs vs E[R] = 2n₁n₂/n + 1 with the
    exact variance — every z-score input is an integer, so both engines
    produce identical doubles.

    Scale shape: the sequence adjacency is a DENSE-ID EQUI-JOIN
    (b.event_id = a.event_id + 1), not lag() over an unpartitioned
    window — the join shuffles by id range and distributes over any
    cluster width, where a global-window lag funnels the entire stream
    through one task (the exact anti-pattern the r11 KS/MWU hardening
    removed). The median is computed in-plan (exact interpolated
    percentile, identical on the shared 2-decimal lattice) and
    broadcast; one scan feeds both the sign sequence and the counts."""
    ev = load_table(spark, "events", sf_dir)
    med = ev.agg(F.expr("percentile(value, 0.5)").alias("m"))
    seq = ev.crossJoin(F.broadcast(med)).select(
        "event_id", F.when(F.col("value") > F.col("m"), 1).otherwise(0).alias("above")
    )
    a = seq.alias("a")
    b = seq.alias("b")
    adj = a.join(b, F.col("b.event_id") == F.col("a.event_id") + 1).agg(
        F.sum(
            F.when(F.col("a.above") != F.col("b.above"), 1).otherwise(0)
        ).alias("changes")
    )
    agg = seq.agg(
        F.sum("above").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).alias("n2"),
        F.count(F.lit(1)).alias("n"),
    )
    j = adj.crossJoin(F.broadcast(agg))
    runs = F.col("changes") + 1
    mu = 2.0 * F.col("n1") * F.col("n2") / F.col("n") + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n"))
        / (1.0 * F.col("n") * F.col("n") * (F.col("n") - 1))
    )
    z = (runs - mu) / F.sqrt(var)
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        runs.cast("long").alias("runs"),
        F.round(z, 6).alias("z_score"),
        F.when(F.abs(z) > 1.959963984540054, 1).otherwise(0).cast("int").alias(
            "reject_05"
        ),
    )


# ---------------------------------------------------------------------------
# Hurst exponent (rescaled-range analysis)
# ---------------------------------------------------------------------------

_HURST_SIZES = (250, 2500)


def _hurst_cte(cs: int) -> str:
    """Per-chunk-size R/S pipeline as a SQL fragment: complete chunks
    only, exact (integer-scaled) chunk moments, in-order cumulative
    deviations, ln(R/S) rounded per chunk, then the exact-summed mean."""
    return f"""
    c{cs} AS (
      SELECT event_id // {cs} AS chunk, event_id, value
      FROM events, n WHERE event_id < (n.n // {cs}) * {cs}
    ),
    m{cs} AS (
      SELECT chunk, {_ds('value')} / count(*) AS mu,
             {_ds('value * value')} / count(*) AS m2
      FROM c{cs} GROUP BY chunk
    ),
    d{cs} AS (
      SELECT c.chunk, c.event_id, c.value - m.mu AS dev,
             m.m2 - m.mu * m.mu AS varr
      FROM c{cs} c JOIN m{cs} m USING (chunk)
    ),
    cd{cs} AS (
      SELECT chunk, varr,
             sum(dev) OVER (PARTITION BY chunk ORDER BY event_id) AS cum
      FROM d{cs}
    ),
    rs{cs} AS (
      SELECT chunk,
             round(ln((max(cum) - min(cum)) / sqrt(min(varr))), 6) AS lrs
      FROM cd{cs} GROUP BY chunk
      HAVING min(varr) > 0 AND (max(cum) - min(cum)) > 0
    ),
    a{cs} AS (SELECT count(*) AS k, {_ds('lrs')} / count(*) AS y FROM rs{cs})"""


@register(
    "events_hurst_exponent",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n FROM events),
    {_hurst_cte(_HURST_SIZES[0])},
    {_hurst_cte(_HURST_SIZES[1])}
    SELECT CAST(a{_HURST_SIZES[0]}.k AS BIGINT) AS n_chunks_small,
           CAST(a{_HURST_SIZES[1]}.k AS BIGINT) AS n_chunks_large,
           round(a{_HURST_SIZES[0]}.y, 6) AS mean_log_rs_small,
           round(a{_HURST_SIZES[1]}.y, 6) AS mean_log_rs_large,
           round((a{_HURST_SIZES[1]}.y - a{_HURST_SIZES[0]}.y)
                 / (ln({_HURST_SIZES[1]}) - ln({_HURST_SIZES[0]})), 6) AS hurst_h
    FROM a{_HURST_SIZES[0]}, a{_HURST_SIZES[1]}
    """,
)
def events_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent via rescaled-range (R/S) analysis (Mandelbrot &
    Wallis 1969): for chunk sizes 250 and 2500, split the event-value
    series into complete chunks, compute each chunk's range of
    cumulative mean-deviations over its std, and estimate H as the
    log-log slope of mean ln(R/S) between the two sizes. H ≈ 0.5 for
    the generator's i.i.d. values; H > 0.5 flags long-range dependence
    (bursty load) — the capacity-planning statistic for event streams.

    Determinism: chunk moments via the integer-scaled exact sum
    (partial-merge-order-proof — the r11 local-cluster lesson), the
    cumulative deviation via a window PARTITIONED by chunk (bounded by
    the literal chunk size, never global, and summed in event_id order
    identically on both engines), per-chunk ln(R/S) rounded at 1e-6
    before the exact-summed mean. Chunks with zero variance or zero
    range are excluded on both engines."""
    ev = load_table(spark, "events", sf_dir)
    n = ev.count()
    from pyspark.sql import Window

    per_size = []
    for cs in _HURST_SIZES:
        c = ev.filter(F.col("event_id") < (n // cs) * cs).select(
            (F.col("event_id") / cs).cast("long").alias("chunk"),
            "event_id",
            "value",
        )
        m = c.groupBy("chunk").agg(
            (_dsum(F.col("value")) / F.count(F.lit(1))).alias("mu"),
            (_dsum(F.col("value") * F.col("value")) / F.count(F.lit(1))).alias("m2"),
        )
        d = c.join(m, "chunk").select(
            "chunk",
            "event_id",
            (F.col("value") - F.col("mu")).alias("dev"),
            (F.col("m2") - F.col("mu") * F.col("mu")).alias("varr"),
        )
        w = Window.partitionBy("chunk").orderBy("event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cd = d.select("chunk", "varr", F.sum("dev").over(w).alias("cum"))
        rs = (
            cd.groupBy("chunk")
            .agg(
                F.max("cum").alias("cmax"),
                F.min("cum").alias("cmin"),
                F.min("varr").alias("varr"),
            )
            .filter((F.col("varr") > 0) & (F.col("cmax") - F.col("cmin") > 0))
            .select(
                F.round(
                    F.log((F.col("cmax") - F.col("cmin")) / F.sqrt(F.col("varr"))), 6
                ).alias("lrs")
            )
        )
        per_size.append(
            rs.agg(
                F.count(F.lit(1)).alias(f"k_{cs}"),
                (_dsum(F.col("lrs")) / F.count(F.lit(1))).alias(f"y_{cs}"),
            )
        )
    import math

    j = per_size[0].crossJoin(F.broadcast(per_size[1]))
    cs0, cs1 = _HURST_SIZES
    return j.select(
        F.col(f"k_{cs0}").cast("long").alias("n_chunks_small"),
        F.col(f"k_{cs1}").cast("long").alias("n_chunks_large"),
        F.round(F.col(f"y_{cs0}"), 6).alias("mean_log_rs_small"),
        F.round(F.col(f"y_{cs1}"), 6).alias("mean_log_rs_large"),
        F.round(
            (F.col(f"y_{cs1}") - F.col(f"y_{cs0}"))
            / (math.log(cs1) - math.log(cs0)),
            6,
        ).alias("hurst_h"),
    )


# ---------------------------------------------------------------------------
# Spectral periodogram (wave 2)
# ---------------------------------------------------------------------------

_PGRAM_PERIODS = (6, 12, 24, 168)


def _trig_tables(p: int) -> tuple[list[float], list[float]]:
    """cos/sin literal tables for the p phases of period p — computed
    ONCE in Python and embedded as identical literals in BOTH engines,
    so no cross-libm trig dependence exists anywhere in the query
    (repr(float) round-trips, and both SQL parsers take the decimal
    string to the same nearest double)."""
    import math as _m

    cos = [_m.cos(2.0 * _m.pi * m / p) for m in range(p)]
    sin = [_m.sin(2.0 * _m.pi * m / p) for m in range(p)]
    return cos, sin


def _pgram_duck_one(p: int) -> str:
    cos, sin = _trig_tables(p)
    cl = ", ".join(repr(x) for x in cos)
    sl = ", ".join(repr(x) for x in sin)
    return f"""
      SELECT {p} AS period_hours,
             CAST(round(
               pow(CAST(sum(CAST(round(value * ([{cl}]::DOUBLE[])[(h % {p}) + 1] * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000, 2)
               + pow(CAST(sum(CAST(round(value * ([{sl}]::DOUBLE[])[(h % {p}) + 1] * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000, 2),
             0) AS BIGINT) AS power_int
      FROM hours"""


@register(
    "events_spectral_periodogram",
    oracle=f"""
    WITH hours AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, value FROM events
    )
    {" UNION ALL ".join(_pgram_duck_one(p) for p in _PGRAM_PERIODS)}
    ORDER BY period_hours
    """,
)
def events_spectral_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of the event-value series at 4 candidate
    periods (6 h / 12 h / 24 h / weekly): P(1/p) = C² + S² with
    C = Σ v·cos(2π·(hour mod p)/p), S likewise — the seasonality
    detector of load forecasting (the generator's daily cycle should
    dominate).

    Scale shape: ONE map-combinable pass over raw events per period —
    no hourly materialization, no window, no shuffle beyond the 4-row
    final aggregate; at 100 TB this is a single scan with 8 integer
    accumulator columns. Determinism: the cos/sin tables are module
    literals embedded in BOTH engines (no cross-libm trig anywhere);
    each product is micro-rounded into the integer-scaled exact sum,
    and the final power rounds identical doubles at magnitudes where
    every tie is exactly representable."""
    import math as _m

    ev = load_table(spark, "events", sf_dir)
    h = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    rows = []
    for p in _PGRAM_PERIODS:
        cos, sin = _trig_tables(p)
        m = (h % p).cast("int")
        carr = F.array(*[F.lit(x) for x in cos])
        sarr = F.array(*[F.lit(x) for x in sin])
        rows.append(
            ev.select(F.col("value"), m.alias("m"))
            .agg(
                F.lit(p).alias("period_hours"),
                F.round(
                    F.pow(_dsum(F.col("value") * F.element_at(carr, F.col("m") + 1)), 2)
                    + F.pow(_dsum(F.col("value") * F.element_at(sarr, F.col("m") + 1)), 2),
                    0,
                )
                .cast("long")
                .alias("power_int"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("period_hours")


# ---------------------------------------------------------------------------
# Hodges-Lehmann pseudo-median (wave 2)
# ---------------------------------------------------------------------------

_HL_TYPE = "click"


@register(
    "stats_hodges_lehmann",
    oracle=f"""
    WITH s AS (
      SELECT CAST(round(value, 0) AS BIGINT) AS v FROM events
      WHERE event_type = '{_HL_TYPE}'
    ),
    vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v),
    pairs AS (
      SELECT (a.v + b.v) / 2.0 AS walsh,
             CASE WHEN a.v = b.v THEN a.c * (a.c + 1) / 2 ELSE a.c * b.c END AS wt
      FROM vc a JOIN vc b ON a.v <= b.v
    ),
    wdist AS (SELECT walsh, CAST(sum(wt) AS BIGINT) AS wt FROM pairs GROUP BY walsh),
    cum AS (SELECT walsh, sum(wt) OVER (ORDER BY walsh) AS cumw FROM wdist),
    tot AS (SELECT CAST(sum(wt) AS BIGINT) AS w FROM wdist),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    lo AS (SELECT min(walsh) AS v1 FROM cum, tot WHERE cumw >= (tot.w + 1) // 2),
    hi AS (SELECT min(walsh) AS v2 FROM cum, tot WHERE cumw >= (tot.w + 2) // 2)
    SELECT n.n, tot.w AS n_walsh_pairs,
           round((lo.v1 + hi.v2) / 2.0, 4) AS hl_pseudo_median
    FROM n, tot, lo, hi
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of the '{t}' value sample: the
    median of all n(n+1)/2 Walsh averages (xᵢ+xⱼ)/2, i ≤ j — the
    location estimator dual to the Wilcoxon signed-rank test (robust to
    outliers, ~0.96 efficiency vs the mean at the normal).

    Scale shape: values aggregate to the INTEGER lattice first (the
    bounded value-domain contract, same as KS/MWU), so the pair space
    is |V|² over distinct values with multiplicities — weights, not
    row blowup; Walsh averages re-aggregate to ≤ 2|V|−1 distinct
    half-integers before the cumulative pass (probed cumulative_sums —
    window here, distributed prefix sum past the bound). Every
    quantity through the median selection is integer weights over
    half-integer lattice values, so both engines agree bit-for-bit."""
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    ev = load_table(spark, "events", sf_dir)
    s = ev.filter(F.col("event_type") == _HL_TYPE).select(
        F.round("value", 0).cast("long").alias("v")
    )
    n = s.count()
    vc = s.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    a, b = vc.alias("a"), vc.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.v") <= F.col("b.v")).select(
        ((F.col("a.v") + F.col("b.v")) / 2.0).alias("walsh"),
        F.when(
            F.col("a.v") == F.col("b.v"),
            F.col("a.c") * (F.col("a.c") + 1) / 2,
        )
        .otherwise(F.col("a.c") * F.col("b.c"))
        .cast("long")
        .alias("wt"),
    )
    wdist = pairs.groupBy("walsh").agg(F.sum("wt").alias("wt"))
    cum = cumulative_sums(wdist, ["walsh"], ["wt"], ["cumw"])
    w_total = n * (n + 1) // 2
    k1, k2 = (w_total + 1) // 2, (w_total + 2) // 2
    lo = cum.filter(F.col("cumw") >= k1).agg(F.min("walsh").alias("v1"))
    hi = cum.filter(F.col("cumw") >= k2).agg(F.min("walsh").alias("v2"))
    return (
        lo.crossJoin(F.broadcast(hi))
        .select(
            F.lit(n).cast("long").alias("n"),
            F.lit(w_total).cast("long").alias("n_walsh_pairs"),
            F.round((F.col("v1") + F.col("v2")) / 2.0, 4).alias("hl_pseudo_median"),
        )
    )


stats_hodges_lehmann.__doc__ = stats_hodges_lehmann.__doc__.format(t=_HL_TYPE)


# ---------------------------------------------------------------------------
# Local clustering coefficient by brand (wave 2)
# ---------------------------------------------------------------------------


@register(
    "graph_local_clustering_brand",
    oracle=f"""
    WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tv AS (
      SELECT v, CAST(count(*) AS BIGINT) AS t
      FROM (SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
            UNION ALL SELECT z AS v FROM tri) GROUP BY v
    ),
    cc AS (
      SELECT deg.v, deg.d,
             round(CASE WHEN deg.d >= 2
                        THEN 2.0 * coalesce(tv.t, 0) / (deg.d * (deg.d - 1))
                        ELSE 0.0 END, 6) AS c
      FROM deg LEFT JOIN tv ON tv.v = deg.v
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round({_ds('c')} / count(c), 6) AS avg_local_cc,
           max(d) AS max_degree
    FROM cc JOIN part ON p_partkey = cc.v
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def graph_local_clustering_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average LOCAL clustering coefficient (Watts-Strogatz) per part
    brand over the co-purchase graph: cc(v) = 2·T(v)/(d(v)·(d(v)−1))
    with T(v) from per-triangle vertex credit; degree-<2 nodes
    contribute 0. Complements graph_triangle_census's GLOBAL
    transitivity 3T/wedges — the two diverge exactly when triangles
    concentrate on hubs, which is what a brand-level breakdown shows.

    Scale shape: same degree-ordered O(m^1.5) triangle machinery as
    the census (each triangle enumerated ONCE at its minimum-order
    vertex), with the (x,y,z) triple exploded for per-vertex counts —
    3 rows per triangle, map-combinable count; cc is a rational of
    integers rounded identically on both engines, averaged via the
    integer-scaled exact sum; the brand join broadcasts the part dim.
    Oracle recomputes triangles with plain id-ordered triple joins —
    same set, different enumeration order, so the per-vertex counts
    certify the orientation logic too."""
    from weather_tools_spark.operators.graph import (
        orient_by_degree,
        oriented_triangles,
        undirected_degrees,
    )

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a, b = baskets.alias("a"), baskets.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .distinct()
    )
    deg = undirected_degrees(edges)
    tri = oriented_triangles(orient_by_degree(edges, deg))
    tv = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    cc = deg.join(tv, "v", "left").select(
        "v",
        "d",
        F.round(
            F.when(
                F.col("d") >= 2,
                2.0 * F.coalesce(F.col("t"), F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
            ).otherwise(0.0),
            6,
        ).alias("c"),
    )
    return (
        cc.join(F.broadcast(part), cc["v"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(_davg(F.col("c")), 6).alias("avg_local_cc"),
            F.max("d").alias("max_degree"),
        )
        .orderBy("p_brand")
    )
