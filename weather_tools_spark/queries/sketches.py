"""Mergeable sketches with EXACT oracle replay.

HyperLogLog, KMV (k-minimum-values), and Count-Min are usually treated
as "approximate therefore unverifiable" — but given a fixed hash
function they are fully deterministic, so the DuckDB oracle can replay
the register/counter state bit-for-bit and hash-gate the sketch
implementation itself (not just its error bound). That upgrades the
sketch family from rows-only to the same gate every exact operator gets;
the probabilistic *accuracy* contracts stay covered by
sketch_error_bounds_audit / tests.

All three use md5 (identical lowercase hex in Spark and DuckDB) as the
hash; register math is integer or exactly-representable binary
fractions, so no engine-libm drift can touch a gate (the one ln() in
HLL linear counting is rounded at 1e-6 against ~1e-15 drift).

Scale notes: every sketch here is a map-combinable aggregation —
registers merge with max, KMV merges with min-k, Count-Min merges with
+ — which is the whole point of sketches at 100 TB: one pass, fixed
memory, shuffle only the sketch state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register

# rho = position of the first 1-bit in the 32-bit suffix (1-based), 33
# if the suffix is all zeros. A pure integer CASE chain — no log2()
# float boundary anywhere.
_RHO_CASE = (
    "CASE "
    + " ".join(f"WHEN v32 >= {2 ** (32 - i)} THEN {i}" for i in range(1, 33))
    + " ELSE 33 END"
)

_HLL_M = 256
# alpha_256 = 0.7213/(1 + 1.079/256) precomputed as an exact double
# literal: spelled inline, Spark SQL would parse the decimals as
# DECIMAL and produce different last-ulp arithmetic than DuckDB.
_HLL_ALPHA_VAL = 0.7182725932495458
_HLL_ALPHA = f"CAST({_HLL_ALPHA_VAL!r} AS DOUBLE)"


@register(
    "sketch_hll_registers",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT md5('u:' || CAST(user_id AS VARCHAR)) AS h FROM events
    ),
    bv AS (
      SELECT ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
             ('0x' || substr(h, 3, 8))::BIGINT AS v32
      FROM h
    ),
    reg AS (
      SELECT bucket, max({_RHO_CASE}) AS rho FROM bv GROUP BY bucket
    ),
    z AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nonempty,
             sum(pow(2.0, -rho)) AS z_nonempty
      FROM reg
    ),
    est AS (
      SELECT n_nonempty,
             {_HLL_M} - n_nonempty AS n_zero,
             ({_HLL_ALPHA}) * {_HLL_M} * {_HLL_M}
               / (z_nonempty + ({_HLL_M} - n_nonempty) * 1.0) AS raw
      FROM z
    ),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
    SELECT {_HLL_M} AS m, ex.n_exact, est.n_zero,
           round(est.raw, 6) AS raw_estimate,
           round(CASE WHEN est.raw <= 2.5 * {_HLL_M} AND est.n_zero > 0
                      THEN {_HLL_M} * ln({_HLL_M} * 1.0 / est.n_zero)
                      ELSE est.raw END, 6) AS estimate,
           round(abs(CASE WHEN est.raw <= 2.5 * {_HLL_M} AND est.n_zero > 0
                          THEN {_HLL_M} * ln({_HLL_M} * 1.0 / est.n_zero)
                          ELSE est.raw END - ex.n_exact) / ex.n_exact, 6)
             AS rel_error
    FROM est, ex
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate with EXACT register replay:
    md5 hex digits 1-2 pick one of 256 registers, digits 3-10 give the
    32-bit suffix whose first-1-bit position (integer CASE chain, no
    log2) is max-merged per register; the harmonic mean and the
    small-range linear-counting branch follow Flajolet et al. 2007. The
    oracle recomputes every register — a wrong bucket split, rho
    off-by-one, or a missing empty-register term flips the gate. The
    register aggregation is max-mergeable: one pass, 256 longs of state
    per executor."""
    ev = load_table(spark, "events", sf_dir)
    h = ev.select(
        F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))).alias("h")
    ).distinct()
    bv = h.select(
        F.expr("cast(conv(substr(h, 1, 2), 16, 10) as bigint)").alias("bucket"),
        F.expr("cast(conv(substr(h, 3, 8), 16, 10) as bigint)").alias("v32"),
    )
    reg = bv.groupBy("bucket").agg(F.expr(f"max({_RHO_CASE})").alias("rho"))
    z = reg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("z_nonempty"),
    )
    est = z.select(
        "n_nonempty",
        (F.lit(_HLL_M) - F.col("n_nonempty")).alias("n_zero"),
        (
            F.lit(_HLL_ALPHA_VAL)
            * _HLL_M
            * _HLL_M
            / (F.col("z_nonempty") + (F.lit(_HLL_M) - F.col("n_nonempty")) * 1.0)
        ).alias("raw"),
    )
    ex = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    corrected = F.when(
        (F.col("raw") <= 2.5 * _HLL_M) & (F.col("n_zero") > 0),
        _HLL_M * F.log(_HLL_M * 1.0 / F.col("n_zero")),
    ).otherwise(F.col("raw"))
    return est.crossJoin(ex).select(
        F.lit(_HLL_M).alias("m"),
        "n_exact",
        "n_zero",
        F.round(F.col("raw"), 6).alias("raw_estimate"),
        F.round(corrected, 6).alias("estimate"),
        F.round(F.abs(corrected - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_error"
        ),
    )


_KMV_K = 64


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT md5('u:' || CAST(user_id AS VARCHAR)) AS h FROM events
    ),
    topk AS (
      SELECT h FROM h ORDER BY h LIMIT {_KMV_K}
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
      FROM topk
    ),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
    SELECT {_KMV_K} AS k, ex.n_exact, s.n_kept,
           round(CASE WHEN s.n_kept < {_KMV_K}
                      THEN s.n_kept * 1.0
                      ELSE ({_KMV_K} - 1)
                           / (('0x' || substr(s.kth, 1, 12))::BIGINT
                              / (16.0 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16))
                      END, 6) AS estimate,
           round(abs(CASE WHEN s.n_kept < {_KMV_K}
                          THEN s.n_kept * 1.0
                          ELSE ({_KMV_K} - 1)
                               / (('0x' || substr(s.kth, 1, 12))::BIGINT
                                  / (16.0 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16 * 16))
                          END - ex.n_exact) / ex.n_exact, 6) AS rel_error
    FROM stats s, ex
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, exactly replayed:
    keep the k=64 lexicographically smallest md5 hashes (fixed-width
    lowercase hex, so lexical order IS numeric order); the estimate is
    (k-1)/f_k with f_k the k-th minimum as a 48-bit binary fraction
    (exactly representable — no float drift). Fewer than k distinct
    values degrades to the exact count, the standard KMV convention —
    the sf0.001 gate exercises that branch, larger SFs the estimator
    branch. The top-k is a distributed TakeOrdered (min-k merges), not
    a global sort."""
    ev = load_table(spark, "events", sf_dir)
    h = ev.select(
        F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))).alias("h")
    ).distinct()
    topk = h.orderBy("h").limit(_KMV_K)
    stats = topk.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"), F.max("h").alias("kth")
    )
    ex = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    frac = F.expr("cast(conv(substr(kth, 1, 12), 16, 10) as bigint)") / F.lit(
        float(16**12)
    )
    est = F.when(F.col("n_kept") < _KMV_K, F.col("n_kept") * 1.0).otherwise(
        (_KMV_K - 1) / frac
    )
    return stats.crossJoin(ex).select(
        F.lit(_KMV_K).alias("k"),
        "n_exact",
        "n_kept",
        F.round(est, 6).alias("estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
    )


_CM_D, _CM_W = 4, 64


@register(
    "sketch_countmin_point",
    oracle=f"""
    WITH rows_ AS (SELECT unnest(range(0, {_CM_D})) AS r),
    hashed AS (
      SELECT r.r AS r,
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || e.event_type), 1, 2))::BIGINT
               % {_CM_W} AS bucket
      FROM events e CROSS JOIN rows_ r
    ),
    counters AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
      FROM hashed GROUP BY r, bucket
    ),
    truth AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_n FROM events
      GROUP BY event_type
    ),
    probes AS (
      SELECT t.event_type, t.true_n, r.r AS r,
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.event_type), 1, 2))::BIGINT
               % {_CM_W} AS bucket
      FROM truth t CROSS JOIN rows_ r
    )
    SELECT p.event_type, p.true_n,
           CAST(min(c.c) AS BIGINT) AS cm_estimate,
           CAST(min(c.c) - p.true_n AS BIGINT) AS overestimate
    FROM probes p JOIN counters c ON p.r = c.r AND p.bucket = c.bucket
    GROUP BY p.event_type, p.true_n
    ORDER BY p.event_type
    """,
)
def sketch_countmin_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 x width 64) over event-type frequencies
    with EXACT counter replay: each row's md5-derived bucket counter is
    sum-merged (one groupBy over d x w cells of state), and the point
    estimate min-over-rows is probed for every distinct type. Outputs
    are pure integers — true count, CM estimate, and the (always
    nonnegative) collision overestimate, which the oracle reproduces
    counter-for-counter."""
    ev = load_table(spark, "events", sf_dir)
    rows_ = spark.range(_CM_D).select(F.col("id").cast("int").alias("r"))
    hashed = ev.crossJoin(F.broadcast(rows_)).select(
        "r",
        F.expr(
            f"cast(conv(substr(md5(concat(cast(r as string), ':', event_type)), 1, 2), 16, 10) as bigint) % {_CM_W}"
        ).alias("bucket"),
    )
    counters = hashed.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    truth = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    probes = truth.crossJoin(F.broadcast(rows_)).select(
        "event_type",
        "true_n",
        "r",
        F.expr(
            f"cast(conv(substr(md5(concat(cast(r as string), ':', event_type)), 1, 2), 16, 10) as bigint) % {_CM_W}"
        ).alias("bucket"),
    )
    return (
        probes.join(counters, ["r", "bucket"])
        .groupBy("event_type", "true_n")
        .agg(
            F.min("c").cast("long").alias("cm_estimate"),
            (F.min("c") - F.col("true_n")).cast("long").alias("overestimate"),
        )
        .orderBy("event_type")
    )


_BLOOM_M, _BLOOM_K = 4096, 3


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
    rows_ AS (SELECT unnest(range(0, {_BLOOM_K})) AS r),
    bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                                 || CAST(k.key AS VARCHAR)), 1, 4))::BIGINT
               % {_BLOOM_M} AS pos
      FROM keys k CROSS JOIN rows_ r
    ),
    probes AS (SELECT unnest(range(1, 3001)) AS p),
    probe_bits AS (
      SELECT p.p, r.r,
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                                 || CAST(p.p AS VARCHAR)), 1, 4))::BIGINT
               % {_BLOOM_M} AS pos
      FROM probes p CROSS JOIN rows_ r
    ),
    verdicts AS (
      SELECT pb.p,
             CASE WHEN count(b.pos) = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_pos
      FROM probe_bits pb LEFT JOIN bits b ON pb.pos = b.pos
      GROUP BY pb.p
    ),
    truth AS (
      SELECT p.p, CASE WHEN k.key IS NULL THEN 0 ELSE 1 END AS member
      FROM probes p LEFT JOIN keys k ON k.key = p.p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(t.member) AS BIGINT) AS n_members,
           CAST(sum(v.bloom_pos) AS BIGINT) AS n_bloom_positive,
           CAST(sum(CASE WHEN v.bloom_pos = 1 AND t.member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(sum(CASE WHEN v.bloom_pos = 0 AND t.member = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative,
           round(CAST(sum(CASE WHEN v.bloom_pos = 1 AND t.member = 0
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / greatest(count(*) - sum(t.member), 1), 6) AS fp_rate
    FROM verdicts v JOIN truth t ON v.p = t.p
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership with EXACT bit replay: a 4096-bit /
    3-hash filter over the distinct order-customer keys, probed with a
    fixed integer range. Build and probe positions come from md5 hex
    arithmetic, so the oracle reconstructs the identical bit set and the
    report's false-positive count is exact — and the n_false_negative
    column is a structural zero the gate enforces (Bloom filters never
    false-negative). This is the semi-join-reduction primitive: at
    100 TB the bit set (512 bytes here, KBs in practice) broadcasts to
    prune a fact scan before the real join."""
    orders = load_table(spark, "orders", sf_dir)
    keys = orders.select(F.col("o_custkey").alias("key")).distinct()
    rows_ = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("r"))
    bits = (
        keys.crossJoin(F.broadcast(rows_))
        .select(
            F.expr(
                f"cast(conv(substr(md5(concat(cast(r as string), ':', cast(key as string))), 1, 4), 16, 10) as bigint) % {_BLOOM_M}"
            ).alias("pos")
        )
        .distinct()
    )
    probes = spark.range(1, 3001).select(F.col("id").alias("p"))
    probe_bits = probes.crossJoin(F.broadcast(rows_)).select(
        "p",
        F.expr(
            f"cast(conv(substr(md5(concat(cast(r as string), ':', cast(p as string))), 1, 4), 16, 10) as bigint) % {_BLOOM_M}"
        ).alias("pos"),
    )
    verdicts = (
        probe_bits.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("p")
        .agg(
            F.when(F.count("hit") == _BLOOM_K, 1).otherwise(0).alias("bloom_pos")
        )
    )
    truth = probes.join(
        keys.withColumn("member", F.lit(1)), probes.p == keys.key, "left"
    ).select("p", F.coalesce("member", F.lit(0)).alias("member"))
    j = verdicts.join(truth, "p")
    return j.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("member").cast("long").alias("n_members"),
        F.sum("bloom_pos").cast("long").alias("n_bloom_positive"),
        F.sum(F.when((F.col("bloom_pos") == 1) & (F.col("member") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positive"),
        F.sum(F.when((F.col("bloom_pos") == 0) & (F.col("member") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_false_negative"),
        F.round(
            F.sum(
                F.when((F.col("bloom_pos") == 1) & (F.col("member") == 0), 1).otherwise(0)
            ).cast("double")
            / F.greatest(F.count(F.lit(1)) - F.sum("member"), F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


# ---------------------------------------------------------------------------
# Theta-sketch set operations over KMV sketches
# ---------------------------------------------------------------------------

_TH_K = 32
_TH_A, _TH_B = "click", "purchase"
# frac(h) = first 48 md5 bits as an exact dyadic fraction in [0, 1)
_TH_FRAC_SPARK = (
    # CAST(2^48 AS DOUBLE): an inline .0 literal parses as DECIMAL in
    # Spark SQL and would make the fraction (and theta) decimal-typed
    f"cast(conv(substr(h, 1, 12), 16, 10) as bigint) / cast({1 << 48} as double)"
)
_TH_FRAC_DUCK = "('0x' || substr(h, 1, 12))::BIGINT / 281474976710656.0"


def _theta_side_sql(side: str, etype: str) -> str:
    """CTEs building one side's distinct-hash frame, k-min sketch and
    theta (kth fraction, or 1.0 below k — the exact-regime convention)."""
    return f"""
    h{side} AS (
      SELECT DISTINCT md5('u:' || CAST(user_id AS VARCHAR)) AS h
      FROM events WHERE event_type = '{etype}'
    ),
    sk{side} AS (SELECT h FROM h{side} ORDER BY h LIMIT {_TH_K}),
    th{side} AS (
      SELECT CASE WHEN (SELECT count(*) FROM h{side}) >= {_TH_K}
                  THEN (SELECT max({_TH_FRAC_DUCK}) FROM sk{side})
                  ELSE 1.0 END AS theta
    )"""


@register(
    "sketch_kmv_setops",
    oracle=f"""
    WITH {_theta_side_sql("a", _TH_A)},
    {_theta_side_sql("b", _TH_B)},
    th AS (SELECT least(a.theta, b.theta) AS theta FROM tha a, thb b),
    sa AS (SELECT h FROM ska, th WHERE {_TH_FRAC_DUCK} < th.theta),
    sb AS (SELECT h FROM skb, th WHERE {_TH_FRAC_DUCK} < th.theta),
    counts AS (
      SELECT (SELECT count(*) FROM sa) AS na,
             (SELECT count(*) FROM sb) AS nb,
             (SELECT count(*) FROM sa WHERE h IN (SELECT h FROM sb)) AS ni,
             (SELECT theta FROM th) AS theta
    ),
    exact AS (
      SELECT (SELECT count(*) FROM ha) AS xa,
             (SELECT count(*) FROM hb) AS xb,
             (SELECT count(*) FROM ha WHERE h IN (SELECT h FROM hb)) AS xi
    )
    SELECT {_TH_K} AS k,
           CAST(e.xa AS BIGINT) AS exact_a,
           CAST(e.xb AS BIGINT) AS exact_b,
           CAST(e.xa + e.xb - e.xi AS BIGINT) AS exact_union,
           CAST(e.xi AS BIGINT) AS exact_intersection,
           round((c.na + c.nb - c.ni) / c.theta, 6) AS est_union,
           round(c.ni / c.theta, 6) AS est_intersection,
           round((c.na - c.ni) / c.theta, 6) AS est_a_minus_b
    FROM counts c, exact e
    """,
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over two KMV sketches: estimate
    |A ∪ B|, |A ∩ B| and |A \\ B| for the click-user and purchase-user
    sets from their k-minimum-value sketches alone — the standard theta
    intersection (cut both retained sets at theta = min(theta_a,
    theta_b); any set expression's cardinality is |survivors| / theta),
    the composability that makes KMV the sketch of choice for audience
    overlap at 100 TB. Deterministic end to end: md5 hashes, theta as
    an exact dyadic 48-bit fraction, integer survivor counts, one
    correctly-rounded division per estimate — the oracle replays the
    full sketch state. Below k the sketch is exact (theta = 1.0, the
    sf0.001 gate exercises that regime; larger SFs exercise the
    estimator).

    Scale shape (r11 rewrite of the 37-exchange outlier VERDICT r10
    flagged): ONE distinct over (event_type, h) is the only fact-scale
    shuffle, and its exchange is reused by both consumers — (a) a
    groupBy(h) pass that yields ALL THREE exact cardinalities in one
    aggregation (side membership flags summed), and (b) a
    row_number window partitioned by event_type whose rank<=k filter
    Spark plans as WindowGroupLimit (partial map-side top-k: at most
    k rows per map partition reach the 2-partition exchange, so the
    hot-side skew of partitioning by a 2-value key never
    materializes). Per-side thetas fall out of the same <=2k-row
    sketch frame (count>=k guard replaces the separate per-side
    count), survivors of the global theta cut are counted — na, nb
    AND the intersection ni — in one groupBy(h) over <=2k rows. The
    r10 plan built each side independently: 2 distincts, 2
    TakeOrdered, 4 scalar aggregates and 5 joins (37 Exch / 23 BNLJ);
    this plan is 1 distinct + 2 bounded groupBys + 1 group-limited
    window (the remaining BNLJs are 1-row theta/estimate
    broadcasts).

    Wall-clock honesty (r12 A/B, bench_archive/AB_r11_rewrites.json):
    on a quiet host at sf0.1 the fused plan measures 1.28x the r10
    plan's median (0.95 s vs 1.22 s, interleaved warm runs) — NOT the
    7x a mid-JIT r11 reading suggested. At local 100k-row scale both
    plans sit on the ~0.8 s per-query session floor; the fused plan's
    real value is structural (12 vs 37 exchanges / 3 vs 23 BNLJ =
    fewer stage barriers), which prices in at cluster scale, not
    here."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    frac = F.expr(_TH_FRAC_SPARK)
    base = (
        ev.filter(F.col("event_type").isin(_TH_A, _TH_B))
        .select(
            "event_type",
            F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))).alias("h"),
        )
        .distinct()
    )
    # all three exact cardinalities from ONE per-hash membership pass
    byh = base.groupBy("h").agg(
        F.max(F.col("event_type") == _TH_A).alias("in_a"),
        F.max(F.col("event_type") == _TH_B).alias("in_b"),
    )
    ex = byh.agg(
        F.coalesce(F.sum(F.col("in_a").cast("long")), F.lit(0)).alias("xa"),
        F.coalesce(F.sum(F.col("in_b").cast("long")), F.lit(0)).alias("xb"),
        F.coalesce(F.sum((F.col("in_a") & F.col("in_b")).cast("long")), F.lit(0)).alias("xi"),
    )
    # both k-min sketches in one group-limited window (<=2k rows out)
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    sk = base.withColumn("rn", rn).filter(F.col("rn") <= _TH_K).drop("rn")
    # per-side theta off the sketch itself: a side saw >=k distinct
    # hashes iff its sketch holds exactly k rows
    th = (
        sk.groupBy("event_type")
        .agg(
            F.when(F.count(F.lit(1)) >= _TH_K, F.max(frac))
            .otherwise(F.lit(1.0))
            .alias("theta_side")
        )
        .agg(F.coalesce(F.min("theta_side"), F.lit(1.0)).alias("theta"))
    )
    # theta cut + survivor counts (incl. intersection) in one pass
    surv = sk.crossJoin(F.broadcast(th)).filter(frac < F.col("theta"))
    cnts = (
        surv.groupBy("h")
        .agg(
            F.max(F.col("event_type") == _TH_A).alias("sa"),
            F.max(F.col("event_type") == _TH_B).alias("sb"),
        )
        .agg(
            F.coalesce(F.sum(F.col("sa").cast("long")), F.lit(0)).alias("na"),
            F.coalesce(F.sum(F.col("sb").cast("long")), F.lit(0)).alias("nb"),
            F.coalesce(F.sum((F.col("sa") & F.col("sb")).cast("long")), F.lit(0)).alias("ni"),
        )
    )
    return (
        ex.crossJoin(cnts)
        .crossJoin(F.broadcast(th))
        .select(
            F.lit(_TH_K).alias("k"),
            F.col("xa").cast("long").alias("exact_a"),
            F.col("xb").cast("long").alias("exact_b"),
            (F.col("xa") + F.col("xb") - F.col("xi")).cast("long").alias("exact_union"),
            F.col("xi").cast("long").alias("exact_intersection"),
            F.round((F.col("na") + F.col("nb") - F.col("ni")) / F.col("theta"), 6).alias("est_union"),
            F.round(F.col("ni") / F.col("theta"), 6).alias("est_intersection"),
            F.round((F.col("na") - F.col("ni")) / F.col("theta"), 6).alias("est_a_minus_b"),
        )
    )


@register(
    "sketch_hll_merge_parity",
    oracle=f"""
    WITH h AS (
      SELECT event_type, md5('u:' || CAST(user_id AS VARCHAR)) AS h
      FROM events GROUP BY event_type, user_id
    ),
    bv AS (
      SELECT event_type,
             ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
             ('0x' || substr(h, 3, 8))::BIGINT AS v32
      FROM h
    ),
    -- per-partition (event_type) sketches
    part_reg AS (
      SELECT event_type, bucket, max({_RHO_CASE}) AS rho
      FROM bv GROUP BY event_type, bucket
    ),
    -- merge the partition sketches: register-wise max
    merged AS (
      SELECT bucket, max(rho) AS rho FROM part_reg GROUP BY bucket
    ),
    -- direct global sketch over the union
    direct AS (
      SELECT bucket, max({_RHO_CASE}) AS rho
      FROM (SELECT DISTINCT bucket, v32 FROM bv) GROUP BY bucket
    ),
    cmp AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM merged) AS n_merged,
        (SELECT CAST(count(*) AS BIGINT) FROM direct) AS n_direct,
        (SELECT CAST(count(*) AS BIGINT)
         FROM merged m JOIN direct d
           ON m.bucket = d.bucket AND m.rho = d.rho) AS n_equal,
        (SELECT CAST(sum(rho) AS BIGINT) FROM merged) AS sum_rho,
        (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM part_reg)
          AS n_partitions
    )
    SELECT n_partitions, n_merged, n_direct, n_equal, sum_rho,
           CASE WHEN n_merged = n_direct AND n_equal = n_merged
                THEN 1 ELSE 0 END AS merge_is_lossless
    FROM cmp
    """,
)
def sketch_hll_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes sketches THE 100 TB cardinality tool,
    demonstrated and gated: build an independent HLL register set per
    event_type partition, merge them register-wise (max), and prove the
    merged sketch is IDENTICAL to the sketch built directly over the
    union — merge_is_lossless must be 1, and the oracle replays both
    constructions plus the register-level equality join. This is the
    algebra that lets per-shard/per-day sketches roll up to any
    grouping without touching raw data again (partial aggregation in
    sketch space). All integer arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    h = ev.select(
        "event_type",
        F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))).alias("h"),
    ).distinct()
    bv = h.select(
        "event_type",
        F.expr("cast(conv(substr(h, 1, 2), 16, 10) as bigint)").alias("bucket"),
        F.expr("cast(conv(substr(h, 3, 8), 16, 10) as bigint)").alias("v32"),
    )
    part_reg = bv.groupBy("event_type", "bucket").agg(
        F.expr(f"max({_RHO_CASE})").alias("rho")
    )
    merged = part_reg.groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = (
        bv.select("bucket", "v32")
        .distinct()
        .groupBy("bucket")
        .agg(F.expr(f"max({_RHO_CASE})").alias("rho"))
    )
    n_merged = merged.agg(F.count(F.lit(1)).alias("n_merged"))
    n_direct = direct.agg(F.count(F.lit(1)).alias("n_direct"))
    n_equal = (
        merged.join(direct, ["bucket", "rho"])
        .agg(F.count(F.lit(1)).alias("n_equal"))
    )
    sum_rho = merged.agg(F.sum("rho").cast("long").alias("sum_rho"))
    n_parts = part_reg.select("event_type").distinct().agg(
        F.count(F.lit(1)).alias("n_partitions")
    )
    return (
        n_parts.crossJoin(n_merged)
        .crossJoin(n_direct)
        .crossJoin(n_equal)
        .crossJoin(sum_rho)
        .select(
            "n_partitions",
            "n_merged",
            "n_direct",
            "n_equal",
            "sum_rho",
            F.when(
                (F.col("n_merged") == F.col("n_direct"))
                & (F.col("n_equal") == F.col("n_merged")),
                1,
            )
            .otherwise(0)
            .alias("merge_is_lossless"),
        )
    )
