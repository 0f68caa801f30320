"""Data-selection & curation operators (round 7).

The training-data-pipeline stages between dedup and training that the
registry did not yet cover, each as a declarative Spark plan with an
exact DuckDB oracle:

- DSIR importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed-unigram bucket
  LMs for a target domain vs the raw pool, per-document log importance
  weight, top-k selection. Everything is md5-bucketed counts + log
  ratios — fully relational on both engines.
- Soft dedup weighting (down-weight near-dups instead of dropping — the
  mixture-correction used when dedup would starve a small source).
- CCNet-style paragraph-granularity dedup (Wenzek et al. 2020): dedup
  on paragraph hashes with keep-first-occurrence semantics, reported as
  per-document retention. Paragraph = 10-word chunk here (the corpus
  fixture has no newlines; the chunking rule is the deterministic
  stand-in and is applied identically in the oracle).
- Asymmetric n-gram containment pairs (doc-in-doc near-subset
  detection that symmetric Jaccard misses when |B| >> |A|).
- Moments-sketch merge parity (Gan et al., VLDB'18 shape): power sums
  S0..S4 are the sketch state; per-shard partials merged by + must
  equal the oracle's direct global moments, and mean/std/skew/kurtosis
  derive from the merged state. The sketch aggregation is one
  map-combinable pass — the 100 TB shape for distribution profiling.
- Product-quantization ADC top-k (Jégou et al. 2011): subspace
  codebooks, code assignment, asymmetric-distance lookup — with a
  DETERMINISTIC codebook (first-K vectors per subspace, the stand-in
  for k-means centroids) so the whole ANN pipeline gets an exact
  oracle gate, unlike the hash-seeded LSH/IVF variants (rows-only).
- Adamic-Adar link prediction on the customer co-purchase projection
  (common-neighbor scoring with inverse-log weighting).
- l-diversity audit (privacy): distinct + entropy diversity of the
  sensitive attribute per quasi-identifier group.
- Interpolated Kneser-Ney bigram perplexity (wave 2): the production
  upgrade of the add-k CCNet filter; scoring the training corpus keeps
  every bigram count >= 1 so the max(c-D, 0) branch is exactly
  relational.
- Newton/IRLS logistic-regression TRAINING (wave 2): sufficient
  statistics in one map-combinable aggregate per step, Cramer 3x3
  solve in column expressions, coefficients broadcast back; the
  oracle replays both iterations through shared expression strings.

Scale notes: no collect anywhere; small frames (bucket LMs <= 256
rows, codebooks 64 rows, per-subspace LUTs) attach as broadcasts; the
only self-joins are df-capped (containment: shingle df <= 20;
link prediction: part fan-out 2..20) so candidate blowup is linear in
corpus size, mirroring the dedup operators' cap rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.operators import dedup as D
from weather_tools_spark.queries import register


@register(
    "corpus_dsir_importance",
    oracle="""
    WITH w AS (SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\\s+')) AS w
               FROM documents),
    wb AS (SELECT doc_id, lang, ('0x' || substr(md5(w), 1, 4))::BIGINT % 256 AS b FROM w),
    bs AS (SELECT b,
                  CAST(count(*) AS BIGINT) AS n_s,
                  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_t
           FROM wb GROUP BY b),
    tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS tot_s, CAST(sum(n_t) AS BIGINT) AS tot_t
            FROM bs),
    lr AS (SELECT b, ln((n_t + 0.5) / (tot_t + 128.0)) - ln((n_s + 0.5) / (tot_s + 128.0)) AS lr
           FROM bs, tot)
    SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_words,
           round(sum(lr), 6) AS dsir_logw
    FROM wb JOIN lr USING (b)
    WHERE lang <> 'de'
    GROUP BY doc_id, lang
    ORDER BY dsir_logw DESC, doc_id
    LIMIT 25
    """,
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: 256-bucket hashed-unigram LMs (md5, the
    cross-engine hash) for the target domain (lang='de') and the raw
    pool, add-0.5 smoothing, per-document log importance weight
    sum(ln p_t(b) - ln p_s(b)) over word occurrences, top-25 candidates
    from the non-target pool. Two passes over the exploded words (bucket
    stats, then per-doc sums); the 256-row log-ratio table and the 1-row
    totals attach as broadcasts; ranking is on the ROUNDED weight (both
    engines) so libm/summation-order drift cannot flip the top-k
    boundary.

    Shape notes (r9, PLANS.md): a single-explode rewrite through a
    persisted (doc, lang, bucket) count table was MEASURED SLOWER
    (1.64 s vs 1.28 s at sf0.1) — short documents rarely repeat a
    bucket, so the count table is nearly token-sized and the extra
    shuffle buys no compaction. The keeper is the OPPOSITE direction:
    the bucket-LM pass keeps its explode (its groupBy has 256 keys, so
    the map-side combine collapses the shuffle), but the per-document
    scoring pass is explode-FREE — the 256-entry log-ratio table is a
    bounded collect inlined as a literal map, and the weight sum is a
    JVM ``F.aggregate`` over the split array (no second explode, no
    token-scale groupBy(doc) shuffle; the same rewrite that took
    ml_calibration_report 24.7 s → 3.2 s). Measured 6.9 s → 5.2 s at
    sfx1.0 — the remaining cost is the bucket-LM pass's own explode,
    which the 256-key map-side combine already makes shuffle-cheap;
    what the rewrite removes is the TOKEN-SCALE groupBy(doc) shuffle,
    the term that mattered at 100 TB."""
    from weather_tools_spark.operators.bounded import bounded_rows

    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "lang", F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    )
    def bucket_of(c):
        return F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("bigint") % 256

    bs = words.select("lang", bucket_of(F.col("w")).alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("n_t"),
    )
    tot = bs.agg(F.sum("n_s").alias("tot_s"), F.sum("n_t").alias("tot_t"))
    lr_rows = bounded_rows(
        bs.crossJoin(F.broadcast(tot)).select(
            "b",
            F.expr(
                "ln((n_t + 0.5) / (tot_t + 128.0)) - ln((n_s + 0.5) / (tot_s + 128.0))"
            ).alias("lr"),
        ),
        256,
        "the 256-bucket hashed-unigram log-ratio table",
    )
    lr_map = F.create_map(
        *[x for r in lr_rows for x in (F.lit(int(r.b)), F.lit(float(r.lr)))]
    )
    toks = F.split(F.col("text"), r"\s+")
    logw = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, w: acc + F.element_at(lr_map, bucket_of(w)),
    )
    return (
        docs.filter(F.col("lang") != "de")
        .select(
            "doc_id",
            "lang",
            F.size(toks).cast("long").alias("n_words"),
            F.round(logw, 6).alias("dsir_logw"),
        )
        .orderBy(F.col("dsir_logw").desc(), "doc_id")
        .limit(25)
    )


@register(
    "corpus_soft_dedup_weights",
    oracle="""
    WITH hashed AS (SELECT doc_id, source, md5(text) AS h,
                           len(regexp_split_to_array(text, '\\s+')) AS n_words
                    FROM documents),
    grp AS (SELECT h, CAST(count(*) AS BIGINT) AS n_members FROM hashed GROUP BY h)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(1.0 / n_members), 6) AS effective_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words_total,
           round(sum(1.0 * n_words / n_members), 6) AS effective_words
    FROM hashed JOIN grp USING (h)
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of dropping exact duplicates, weight every
    copy by 1/n_members of its content-hash group (so each distinct
    document contributes total weight 1 regardless of copy count) and
    report per-source raw vs effective document/token mass — the
    mixture correction applied when hard dedup would starve a small
    source. One hash aggregation + one equi-join back; map-combinable
    end to end. The hashed projection (doc_id, source, h, n_words — no
    text) is persisted so the group-count side derives from it instead
    of Catalyst re-running the text scan + md5 for each branch (r9;
    the ROUND8_NOTES single-scan pattern)."""
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    hashed = _persist(
        docs.select(
            "doc_id",
            "source",
            F.md5("text").alias("h"),
            F.size(F.split(F.col("text"), r"\s+")).alias("n_words"),
        )
    )
    grp = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        hashed.join(grp, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(F.lit(1.0) / F.col("n_members")), 6).alias("effective_docs"),
            F.sum("n_words").alias("n_words_total"),
            F.round(F.sum(F.lit(1.0) * F.col("n_words") / F.col("n_members")), 6).alias(
                "effective_words"
            ),
        )
        .orderBy("source")
    )


@register(
    "dedup_paragraph_dupes",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
    ch AS (SELECT doc_id,
                  unnest(list_transform(range(0, CAST(ceil(len(t) / 10.0) AS INT)),
                         i -> {'idx': i,
                               'h': md5(array_to_string(list_slice(t, i*10+1, i*10+10), ' '))})) AS u
           FROM toks),
    occ AS (SELECT doc_id, doc_id * 1000000000 + u.idx AS k, u.h AS h FROM ch),
    firsts AS (SELECT h, min(k) AS mk FROM occ GROUP BY h)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN k > mk THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(1.0 * sum(CASE WHEN k > mk THEN 1 ELSE 0 END) / count(*), 6) AS dup_frac
    FROM occ JOIN firsts USING (h)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def dedup_paragraph_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup report: split every document into
    10-word chunks (the deterministic paragraph stand-in for this
    corpus), hash each chunk, keep only the FIRST occurrence of each
    hash corpus-wide (ordering key doc_id*1e9 + chunk index — collision
    would need a single ~10-billion-word document), and report per-document chunk
    retention. The first-occurrence rule is ``min(k) OVER (PARTITION BY
    h)`` — a hash-PARTITIONED window (billions of tiny partitions, no
    global sort), which needs ONE chunk-scale shuffle where the r8
    min-aggregate + equi-join needed two AND re-derived the
    split+md5 chunk build for each join side (r9; 9.9 → 4.4 s at
    sfx1.0). The token array is materialized in its own projection
    before the chunk lambda slices it — the inlined split() was
    re-tokenizing the full text once per 10-word chunk (the r11
    corpus_ngram_novelty lesson: codegen does not hoist common
    subexpressions out of higher-order-function lambdas; 5.0 → 2.8 s
    warm at sfx1.0, fresh plan per run so stage reuse can't mask the
    delta). At 100 TB this is the paragraph-granularity dedup pass
    that runs before document-level near-dup."""
    from pyspark.sql import Window as W
    docs = load_table(spark, "documents", sf_dir)
    occ = (
        docs.select("doc_id", F.split("text", r"\s+").alias("t"))
        .select(
            "doc_id",
            F.expr(
                "inline(transform(sequence(0, cast(ceil(size(t) / 10.0) as int) - 1), "
                "i -> struct(i as idx, "
                "md5(array_join(slice(t, i*10+1, 10), ' ')) as h)))"
            ),
        )
        .select(
            "doc_id",
            (F.col("doc_id") * F.lit(1000000000) + F.col("idx")).alias("k"),
            "h",
        )
    )
    return (
        occ.withColumn("mk", F.min("k").over(W.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("k") > F.col("mk"), 1).otherwise(0)).alias("n_dup"),
            F.round(
                F.lit(1.0)
                * F.sum(F.when(F.col("k") > F.col("mk"), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_containment_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
    sh0 AS (SELECT doc_id,
                   unnest(list_distinct(list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
            FROM toks),
    rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM sh0 GROUP BY s) WHERE df <= 20),
    sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare USING (s)),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b, round(1.0 * n_inter / ca.n, 6) AS containment
    FROM pairs JOIN cnt ca ON doc_a = ca.doc_id
    WHERE 1.0 * n_inter / ca.n >= 0.9
    ORDER BY doc_a, doc_b
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment pairs: |A∩B|/|A| >= 0.9 over the
    df-capped shingle sets (cap 20, identical on both engines) — the
    doc-in-doc detector for quoted/truncated/boilerplate-wrapped copies
    that symmetric Jaccard misses when |B| >> |A|. Single by-shingle
    aggregation expands in-bucket combinations once per UNORDERED pair;
    both directions then derive by a narrow explode (see
    operators/dedup.containment_pairs)."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = D.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.9, max_shingle_df=20
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("containment", 6).alias("containment")
    ).orderBy("doc_a", "doc_b")


_MOM_DERIVED = {
    "mean": "round(s1 / s0, 6)",
    "std": "round(sqrt(s2 / s0 - (s1 / s0) * (s1 / s0)), 6)",
    "skew": (
        "round((s3 / s0 - 3 * (s1 / s0) * (s2 / s0) + 2 * (s1 / s0) * (s1 / s0) * (s1 / s0))"
        " / pow(s2 / s0 - (s1 / s0) * (s1 / s0), 1.5), 6)"
    ),
    "kurtosis": (
        "round((s4 / s0 - 4 * (s1 / s0) * (s3 / s0) + 6 * (s1 / s0) * (s1 / s0) * (s2 / s0)"
        " - 3 * pow(s1 / s0, 4.0)) / pow(s2 / s0 - (s1 / s0) * (s1 / s0), 2.0) - 3, 6)"
    ),
}


@register(
    "sketch_moments_merge_parity",
    oracle=f"""
    WITH v AS (SELECT event_type, value / 100.0 AS x FROM events),
    per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS s0,
                   sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
            FROM v GROUP BY event_type),
    allr AS (SELECT '__all__' AS event_type, CAST(count(*) AS BIGINT) AS s0,
                    sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
             FROM v),
    u AS (SELECT * FROM per UNION ALL SELECT * FROM allr)
    SELECT event_type AS shard, s0 AS n,
           round(s1, 4) AS s1, round(s2, 4) AS s2,
           round(s3, 4) AS s3, round(s4, 4) AS s4,
           {_MOM_DERIVED['mean']} AS mean,
           {_MOM_DERIVED['std']} AS std,
           {_MOM_DERIVED['skew']} AS skew,
           {_MOM_DERIVED['kurtosis']} AS kurtosis
    FROM u
    ORDER BY shard
    """,
)
def sketch_moments_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moments sketch (power sums S0..S4 of value/100 — scaled so S4
    stays < 1e7 and 4-decimal rounding absorbs summation-order drift):
    per-event-type partials are the sketch state, the '__all__' row is
    their + merge, and mean/std/skew/kurtosis derive from the merged
    state. The oracle computes the global moments DIRECTLY from the
    rows, so the gate proves partial states merge to the exact global
    sketch — the mergeability contract that makes one-pass distribution
    profiling work at 100 TB (fixed state per executor, shuffle only
    the 5 sums)."""
    ev = load_table(spark, "events", sf_dir)
    v = ev.select("event_type", (F.col("value") / 100.0).alias("x"))
    per = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum("x").alias("s1"),
        F.sum(F.expr("x*x")).alias("s2"),
        F.sum(F.expr("x*x*x")).alias("s3"),
        F.sum(F.expr("x*x*x*x")).alias("s4"),
    )
    merged = per.agg(
        F.sum("s0").alias("s0"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").alias("s3"),
        F.sum("s4").alias("s4"),
    ).withColumn("event_type", F.lit("__all__"))
    u = per.unionByName(merged)
    return u.select(
        F.col("event_type").alias("shard"),
        F.col("s0").alias("n"),
        F.round("s1", 4).alias("s1"),
        F.round("s2", 4).alias("s2"),
        F.round("s3", 4).alias("s3"),
        F.round("s4", 4).alias("s4"),
        F.expr(_MOM_DERIVED["mean"]).alias("mean"),
        F.expr(_MOM_DERIVED["std"]).alias("std"),
        F.expr(_MOM_DERIVED["skew"]).alias("skew"),
        F.expr(_MOM_DERIVED["kurtosis"]).alias("kurtosis"),
    ).orderBy("shard")


_PQ_D2 = "round(aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, t) -> acc + t), 6)"


@register(
    "sim_pq_adc_topk",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    subs AS (SELECT vec_id, s, list_slice(v, s*16+1, s*16+16) AS sv
             FROM e, (SELECT CAST(unnest(range(0, 4)) AS INT) AS s)),
    cb AS (SELECT vec_id AS cw, s, sv AS cv FROM subs WHERE vec_id < 16),
    dist AS (SELECT a.vec_id, a.s, c.cw,
                    round(list_sum(list_transform(range(1, 17),
                          i -> (a.sv[i] - c.cv[i]) * (a.sv[i] - c.cv[i]))), 6) AS d
             FROM subs a JOIN cb c ON a.s = c.s),
    mind AS (SELECT vec_id, s, min(d) AS md FROM dist GROUP BY vec_id, s),
    assign AS (SELECT d.vec_id, d.s, min(d.cw) AS code
               FROM dist d JOIN mind m ON d.vec_id = m.vec_id AND d.s = m.s AND d.d = m.md
               GROUP BY d.vec_id, d.s),
    q AS (SELECT s, sv AS qv FROM subs WHERE vec_id = 7),
    lut AS (SELECT c.s, c.cw,
                   round(list_sum(list_transform(range(1, 17),
                         i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), 6) AS qd
            FROM cb c JOIN q ON c.s = q.s),
    adc AS (SELECT a.vec_id, round(sum(l.qd), 6) AS adc_dist2
            FROM assign a JOIN lut l ON a.s = l.s AND a.code = l.cw
            GROUP BY a.vec_id),
    qf AS (SELECT v AS qv FROM e WHERE vec_id = 7),
    exact AS (SELECT e.vec_id,
                     round(list_sum(list_transform(range(1, 65),
                           i -> (e.v[i] - qf.qv[i]) * (e.v[i] - qf.qv[i]))), 6) AS exact_dist2
              FROM e, qf)
    SELECT adc.vec_id, adc.adc_dist2, exact.exact_dist2
    FROM adc JOIN exact ON adc.vec_id = exact.vec_id
    ORDER BY adc.adc_dist2, adc.vec_id
    LIMIT 10
    """,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): 4 subspaces × 16
    dims, 16 codewords per subspace, code assignment by nearest
    codeword, then asymmetric-distance (ADC) top-10 for a query vector
    via the 64-entry subspace LUT. The codebook is DETERMINISTIC (the
    first 16 vectors per subspace — the stand-in for k-means centroids)
    so the entire PQ pipeline is exactly replayable in the oracle: a
    wrong slice boundary, assignment tie-break, or LUT join flips the
    gate. All per-subspace distances are rounded to 1e-6 BEFORE the
    argmin/top-k on both engines, so fold-order drift cannot flip a
    code. Scale shape: the codebook (64 rows) and LUT (64 rows)
    broadcast; encoding is one broadcast-join pass over vectors; the
    ADC scan is a narrow map + TakeOrdered — no shuffle proportional to
    the corpus beyond the final top-k merge."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    subs = emb.select(
        "vec_id",
        F.expr(
            "inline(transform(sequence(0, 3), "
            "s -> struct(cast(s as int) as s, slice(v, s*16+1, 16) as sv)))"
        ),
    )
    cb = subs.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cw"), "s", F.col("sv").alias("cv")
    )
    dist = subs.join(F.broadcast(cb), "s").select(
        "vec_id", "s", "cw", F.expr(_PQ_D2.format(a="sv", b="cv")).alias("d")
    )
    mind = dist.groupBy("vec_id", "s").agg(F.min("d").alias("md"))
    assign = (
        dist.join(mind, ["vec_id", "s"])
        .filter(F.col("d") == F.col("md"))
        .groupBy("vec_id", "s")
        .agg(F.min("cw").alias("code"))
    )
    q = subs.filter(F.col("vec_id") == 7).select("s", F.col("sv").alias("qv"))
    lut = cb.join(F.broadcast(q), "s").select(
        F.col("s").alias("ls"),
        F.col("cw").alias("lcw"),
        F.expr(_PQ_D2.format(a="qv", b="cv")).alias("qd"),
    )
    adc = (
        assign.join(
            F.broadcast(lut),
            (F.col("s") == F.col("ls")) & (F.col("code") == F.col("lcw")),
        )
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd"), 6).alias("adc_dist2"))
    )
    qf = emb.filter(F.col("vec_id") == 7).select(F.col("v").alias("qv"))
    exact = emb.crossJoin(F.broadcast(qf)).select(
        "vec_id", F.expr(_PQ_D2.format(a="v", b="qv")).alias("exact_dist2")
    )
    return (
        adc.join(exact, "vec_id")
        .select("vec_id", "adc_dist2", "exact_dist2")
        .orderBy("adc_dist2", "vec_id")
        .limit(10)
    )


@register(
    "graph_adamic_adar_linkpred",
    oracle="""
    WITH buyers AS (SELECT DISTINCT l_partkey AS part, o_custkey AS cust
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    pc AS (SELECT part, CAST(count(*) AS BIGINT) AS nb FROM buyers GROUP BY part),
    mid AS (SELECT b.part, b.cust, pc.nb
            FROM buyers b JOIN pc USING (part)
            WHERE nb BETWEEN 2 AND 20),
    pairs AS (SELECT a.cust AS cust_a, b.cust AS cust_b,
                     CAST(count(*) AS BIGINT) AS n_common,
                     round(sum(1.0 / ln(a.nb)), 6) AS aa_score
              FROM mid a JOIN mid b ON a.part = b.part AND a.cust < b.cust
              GROUP BY 1, 2)
    SELECT cust_a, cust_b, n_common, aa_score
    FROM pairs
    ORDER BY aa_score DESC, cust_a, cust_b
    LIMIT 20
    """,
)
def graph_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the customer co-purchase
    projection: customers u, v sharing a part p score sum 1/ln(buyers(p))
    — rare co-purchases weigh more. The part fan-out is capped to
    2..20 buyers (identical on both engines): hub parts generate
    quadratic candidate pairs but contribute ~1/ln(huge) ≈ 0 AA weight,
    so the cap is the standard linkpred scale guard, same rationale as
    the dedup shingle df cap. Ranking is on the ROUNDED score so
    summation-order drift cannot flip the top-20 boundary.

    Scale shape (r10 rewrite): candidate pairs expand MAP-SIDE from the
    per-part sorted buyer array (collect_list state ≤ 20 rows per part,
    guaranteed by the pre-filter on nb) instead of a second by-part
    shuffle of the full mid frame — one buyers-scale shuffle replaces
    the self-join's two, and the ≤C(20,2)-per-part expansion is exactly
    the pair volume the oracle's self-join emits. The buyers base is
    deliberately NOT persisted even though two consumers recompute it:
    measured at the 100× series (sfx1.0, local[32]), caching the
    multi-million-row distinct frame costs 14–21 s of memory
    serialization while recomputing the columnar scan + broadcast join
    lineage twice costs ~3 s — recompute-twice wins whenever the base
    is fact-scale and its lineage is scan+join (the persisted-base
    pattern pays off only for MANY consumers over a BOUNDED frame, as
    in ml_kmeanspp_init's 16 scans). A/B numbers: pair-expansion
    8.07 s vs self-join 11.08 s unpersisted; 21.87 s / 31.91 s with the
    base persisted."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    buyers = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("l_partkey").alias("part"), F.col("o_custkey").alias("cust"))
        .distinct()
    )
    pc = buyers.groupBy("part").agg(F.count(F.lit(1)).alias("nb")).filter(
        (F.col("nb") >= 2) & (F.col("nb") <= 20)
    )
    grouped = (
        buyers.join(pc, "part")
        .groupBy("part", "nb")
        .agg(F.array_sort(F.collect_list("cust")).alias("custs"))
    )
    pairs = grouped.select(
        "nb",
        F.explode(
            F.expr(
                "flatten(transform(custs, (x, i) -> "
                "transform(slice(custs, i + 2, size(custs) - i - 1), "
                "y -> struct(x AS cust_a, y AS cust_b))))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.cust_a").alias("cust_a"), F.col("p.cust_b").alias("cust_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("nb"))), 6).alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), "cust_a", "cust_b")
        .limit(20)
    )


@register(
    "privacy_l_diversity",
    oracle="""
    WITH cell AS (SELECT o_orderpriority AS priority,
                         CAST(year(o_orderdate) AS INT) AS yr,
                         o_orderstatus AS status,
                         CAST(count(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2, 3),
    g AS (SELECT priority, yr,
                 CAST(sum(cnt) AS BIGINT) AS k_size,
                 CAST(count(*) AS BIGINT) AS l_distinct
          FROM cell GROUP BY priority, yr),
    ent AS (SELECT c.priority, c.yr,
                   round(-sum((1.0 * c.cnt / g.k_size) * ln(1.0 * c.cnt / g.k_size)), 6)
                     AS entropy_l
            FROM cell c JOIN g ON c.priority = g.priority AND c.yr = g.yr
            GROUP BY c.priority, c.yr)
    SELECT g.priority, g.yr, g.k_size, g.l_distinct, ent.entropy_l,
           round(exp(ent.entropy_l), 6) AS effective_l
    FROM g JOIN ent ON g.priority = ent.priority AND g.yr = ent.yr
    ORDER BY g.priority, g.yr
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): for each
    quasi-identifier group (order priority × order year) report group
    size k, distinct l-diversity and entropy l-diversity of the
    sensitive attribute (order status), plus exp(entropy) — the
    effective number of sensitive classes an attacker faces. Companion
    to privacy_k_anonymity; two nested map-combinable aggregations, no
    window, no distinct-count over raw rows."""
    orders = load_table(spark, "orders", sf_dir)
    cell = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    g = cell.groupBy("priority", "yr").agg(
        F.sum("cnt").alias("k_size"), F.count(F.lit(1)).alias("l_distinct")
    )
    ent = (
        cell.join(g.select("priority", "yr", "k_size"), ["priority", "yr"])
        .groupBy("priority", "yr")
        .agg(
            F.round(
                -F.sum(
                    (F.lit(1.0) * F.col("cnt") / F.col("k_size"))
                    * F.log(F.lit(1.0) * F.col("cnt") / F.col("k_size"))
                ),
                6,
            ).alias("entropy_l")
        )
    )
    return (
        g.join(ent, ["priority", "yr"])
        .select(
            "priority",
            "yr",
            "k_size",
            "l_distinct",
            "entropy_l",
            F.round(F.exp("entropy_l"), 6).alias("effective_l"),
        )
        .orderBy("priority", "yr")
    )


_KN_D = 0.75  # absolute discount


@register(
    "text_kneser_ney_ppl",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ), cbg AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
    ), cleft AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS cl,
             CAST(count(DISTINCT w2) AS BIGINT) AS n1p_left
      FROM bg GROUP BY w1
    ), cont AS (
      SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS n1p_right FROM bg GROUP BY w2
    ), types AS (
      SELECT CAST(count(*) AS BIGINT) AS n_types FROM cbg
    ), scored AS (
      SELECT b.doc_id, any_value(b.source) AS source,
             pow(2.0, -avg(log2(
               (c.c - {_KN_D!r}) / l.cl
               + ({_KN_D!r} * l.n1p_left / l.cl) * (r.n1p_right * 1.0 / types.n_types)
             ))) AS ppl
      FROM bg b
      JOIN cbg c ON b.w1 = c.w1 AND b.w2 = c.w2
      JOIN cleft l ON b.w1 = l.w1
      JOIN cont r ON b.w2 = r.w2
      CROSS JOIN types
      GROUP BY b.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(ppl), 6) AS avg_ppl,
           round(min(ppl), 6) AS min_ppl,
           round(max(ppl), 6) AS max_ppl
    FROM scored GROUP BY source ORDER BY source
    """,
)
def text_kneser_ney_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1999) — the LM the CCNet-style perplexity filter
    (corpus_perplexity_filter, add-k smoothed) upgrades to in practice:

        P_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1·)
                      + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)

    with absolute discount D=0.75 and the continuation distribution
    N1+(·w2)/N1+(··) ("how many contexts does w2 complete"). Scoring
    the training corpus itself means every scored bigram has c ≥ 1, so
    the max(·,0) branch never truncates and the formula is exactly
    relational: three count aggregations (bigram, left-context with
    distinct-right, right-continuation) + equi-joins back, the bigram-
    type total as a 1-row broadcast. Same 100 TB shape as the add-k
    filter — everything co-partitioned by token keys, map-combinable,
    no Python."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    bg = toks.select(
        "doc_id",
        "source",
        # Guard: Spark's sequence(1, 0) counts DOWN (yielding [1, 0]), so an
        # unguarded expansion over a 1-token doc hits element_at(t, 0) and
        # throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT.  The empty-array branch
        # matches the DuckDB oracle's range(1, 0), which yields no bigrams.
        F.expr(
            "explode(CASE WHEN size(t) < 2 "
            "THEN cast(array() AS array<struct<w1: string, w2: string>>) "
            "ELSE transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2)) END)"
        ).alias("p"),
    ).select("doc_id", "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # ONE token-explode pass for all four count tables: cbg (persisted,
    # bounded by distinct bigram TYPES, << token instances) is the only
    # aggregate over bg; cleft/cont/types derive from cbg — cbg rows are
    # distinct (w1, w2), so countDistinct collapses to row counts.
    # NOT persisted (r10 persist audit): Catalyst re-runs the explode
    # per derived table but exchange reuse shares the bigram shuffle —
    # the persisted plan measured 26.1 s vs 9.3 s unpersisted at
    # sfx1.0 (the bigram-type frame grows with the Heaps-law vocab and
    # its cache materialization dominates the recompute it saves).
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cleft = cbg.groupBy("w1").agg(
        F.sum("c").alias("cl"), F.count(F.lit(1)).alias("n1p_left")
    )
    cont = cbg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_right"))
    types = cbg.agg(F.count(F.lit(1)).alias("n_types"))
    scored = (
        bg.join(cbg, ["w1", "w2"])
        .join(cleft, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.pow(
                F.lit(2.0),
                -F.avg(
                    F.log2(
                        (F.col("c") - _KN_D) / F.col("cl")
                        + (F.lit(_KN_D) * F.col("n1p_left") / F.col("cl"))
                        * (F.col("n1p_right") * F.lit(1.0) / F.col("n_types"))
                    )
                ),
            ).alias("ppl"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ppl"), 6).alias("avg_ppl"),
            F.round(F.min("ppl"), 6).alias("min_ppl"),
            F.round(F.max("ppl"), 6).alias("max_ppl"),
        )
        .orderBy("source")
    )


def _det3(a11, a12, a13, a21, a22, a23, a31, a32, a33):
    """3x3 determinant as a literal expression string — spelled once and
    shared verbatim by the Spark plan and the DuckDB oracle so the
    Cramer-rule Newton solve is arithmetically identical on both."""
    return (
        f"(({a11})*(({a22})*({a33})-({a23})*({a32}))"
        f" - ({a12})*(({a21})*({a33})-({a23})*({a31}))"
        f" + ({a13})*(({a21})*({a32})-({a22})*({a31})))"
    )


_LR_P = "1.0/(1.0 + exp(-(({b0})*x0 + ({b1})*x1 + ({b2})*x2)))"

_LR_SUMS = {
    "h00": "sum(w*x0*x0)", "h01": "sum(w*x0*x1)", "h02": "sum(w*x0*x2)",
    "h11": "sum(w*x1*x1)", "h12": "sum(w*x1*x2)", "h22": "sum(w*x2*x2)",
    "g0": "sum((y - p)*x0)", "g1": "sum((y - p)*x1)", "g2": "sum((y - p)*x2)",
}

_LR_DET = _det3("h00", "h01", "h02", "h01", "h11", "h12", "h02", "h12", "h22")
_LR_NUM = {
    "b0": _det3("g0", "h01", "h02", "g1", "h11", "h12", "g2", "h12", "h22"),
    "b1": _det3("h00", "g0", "h02", "h01", "g1", "h12", "h02", "g2", "h22"),
    "b2": _det3("h00", "h01", "g0", "h01", "h11", "g1", "h02", "h12", "g2"),
}


@register(
    "ml_logreg_newton",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             1.0 AS x0,
             len(regexp_split_to_array(trim(text), '\\s+')) / 100.0 AS x1,
             len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) * 1.0
               / len(regexp_split_to_array(trim(text), '\\s+')) AS x2
      FROM documents
    ),
    beta0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
    s1 AS (
      SELECT {", ".join(f"{expr} AS {k}" for k, expr in _LR_SUMS.items())}
      FROM (SELECT f.*, {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")} AS p,
                   {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")}
                   * (1.0 - {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")}) AS w
            FROM feat f CROSS JOIN beta0 b)
    ),
    beta1 AS (
      SELECT b.b0 + {_LR_NUM['b0']} / {_LR_DET} AS b0,
             b.b1 + {_LR_NUM['b1']} / {_LR_DET} AS b1,
             b.b2 + {_LR_NUM['b2']} / {_LR_DET} AS b2
      FROM s1 CROSS JOIN beta0 b
    ),
    m1 AS (
      SELECT CAST(count(*) FILTER (WHERE (p >= 0.5) = (y = 1.0)) AS BIGINT) AS accuracy,
             round(-avg(y * ln(p) + (1.0 - y) * ln(1.0 - p)), 6) AS log_loss
      FROM (SELECT f.y, {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")} AS p
            FROM feat f CROSS JOIN beta1 b)
    ),
    s2 AS (
      SELECT {", ".join(f"{expr} AS {k}" for k, expr in _LR_SUMS.items())}
      FROM (SELECT f.*, {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")} AS p,
                   {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")}
                   * (1.0 - {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")}) AS w
            FROM feat f CROSS JOIN beta1 b)
    ),
    beta2 AS (
      SELECT b.b0 + {_LR_NUM['b0']} / {_LR_DET} AS b0,
             b.b1 + {_LR_NUM['b1']} / {_LR_DET} AS b1,
             b.b2 + {_LR_NUM['b2']} / {_LR_DET} AS b2
      FROM s2 CROSS JOIN beta1 b
    ),
    m2 AS (
      SELECT CAST(count(*) FILTER (WHERE (p >= 0.5) = (y = 1.0)) AS BIGINT) AS accuracy,
             round(-avg(y * ln(p) + (1.0 - y) * ln(1.0 - p)), 6) AS log_loss
      FROM (SELECT f.y, {_LR_P.format(b0="b.b0", b1="b.b1", b2="b.b2")} AS p
            FROM feat f CROSS JOIN beta2 b)
    )
    SELECT 1 AS iter, round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
           accuracy, log_loss
    FROM beta1 CROSS JOIN m1
    UNION ALL
    SELECT 2 AS iter, round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
           accuracy, log_loss
    FROM beta2 CROSS JOIN m2
    ORDER BY iter
    """,
)
def ml_logreg_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING by Newton-Raphson (IRLS)
    — the missing twin of corpus_quality_classifier (which only SCORES
    with fixed weights): two Newton steps on features (1, n_words/100,
    distinct-word ratio) predicting lang='en', each iteration's
    coefficients, training accuracy and log-loss emitted and the WHOLE
    optimization replayed by the oracle (same Cramer-rule 3x3 solve,
    same literal expression strings — see _det3/_LR_P).

    Scale shape: each Newton step is ONE map-combinable aggregation
    over the corpus producing the 9 sufficient statistics (upper
    Hessian triangle + gradient); the 3x3 solve happens in column
    expressions on that 1-row frame and the updated coefficients attach
    back as a broadcast — the classic sufficient-statistics pattern
    that trains GLMs at 100 TB in p passes with O(d^2) state, no
    driver-side math, no Python."""
    docs = load_table(spark, "documents", sf_dir)
    feat = docs.select(
        "doc_id",
        F.expr("CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END").alias("y"),
        F.lit(1.0).alias("x0"),
        F.expr("size(split(trim(text), '\\\\s+')) / 100.0").alias("x1"),
        F.expr(
            "size(array_distinct(split(trim(text), '\\\\s+'))) * 1.0"
            " / size(split(trim(text), '\\\\s+'))"
        ).alias("x2"),
    )

    def newton_step(beta):
        """One IRLS step: sufficient-statistics aggregate + Cramer solve."""
        p_expr = _LR_P.format(b0="b0", b1="b1", b2="b2")
        enriched = feat.crossJoin(F.broadcast(beta)).select(
            "*",
            F.expr(p_expr).alias("p"),
            F.expr(f"{p_expr} * (1.0 - {p_expr})").alias("w"),
        )
        sums = enriched.agg(
            *[F.expr(expr).alias(k) for k, expr in _LR_SUMS.items()]
        )
        return sums.crossJoin(F.broadcast(beta)).select(
            F.expr(f"b0 + {_LR_NUM['b0']} / {_LR_DET}").alias("b0"),
            F.expr(f"b1 + {_LR_NUM['b1']} / {_LR_DET}").alias("b1"),
            F.expr(f"b2 + {_LR_NUM['b2']} / {_LR_DET}").alias("b2"),
        )

    def metrics(beta):
        p_expr = _LR_P.format(b0="b0", b1="b1", b2="b2")
        return (
            feat.crossJoin(F.broadcast(beta))
            .select("y", F.expr(p_expr).alias("p"))
            .agg(
                F.sum(
                    F.when((F.col("p") >= 0.5) == (F.col("y") == 1.0), 1).otherwise(0)
                ).alias("accuracy"),
                F.round(
                    -F.avg(
                        F.col("y") * F.log("p")
                        + (1.0 - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
                    ),
                    6,
                ).alias("log_loss"),
            )
        )

    beta0 = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    beta1 = newton_step(beta0)
    beta2 = newton_step(beta1)
    row1 = beta1.crossJoin(metrics(beta1)).select(
        F.lit(1).alias("iter"),
        F.round("b0", 6).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        "accuracy",
        "log_loss",
    )
    row2 = beta2.crossJoin(metrics(beta2)).select(
        F.lit(2).alias("iter"),
        F.round("b0", 6).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        "accuracy",
        "log_loss",
    )
    return row1.unionByName(row2).orderBy("iter")


@register(
    "ml_naive_bayes_langid",
    oracle="""
    WITH toks AS (SELECT doc_id, lang,
                         unnest(regexp_split_to_array(text, '\\s+')) AS w
                  FROM documents),
    wl AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY lang, w),
    cl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS c_l,
                  CAST((SELECT count(*) FROM documents d WHERE d.lang = wl.lang) AS BIGINT) AS n_l
           FROM wl GROUP BY lang),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab,
                 CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
          FROM toks),
    dtok AS (SELECT doc_id, lang AS true_lang, w FROM toks),
    dl AS (SELECT d.doc_id, d.true_lang, c.lang AS cand,
                  CAST(count(*) AS BIGINT) AS n_tok,
                  sum(ln(COALESCE(wl.c, 0) + 1)) AS s_num
           FROM dtok d
           CROSS JOIN (SELECT DISTINCT lang FROM documents) c
           LEFT JOIN wl ON wl.lang = c.lang AND wl.w = d.w
           GROUP BY d.doc_id, d.true_lang, c.lang),
    scored AS (SELECT dl.doc_id, dl.true_lang, dl.cand,
                      round(ln(cl.n_l * 1.0 / v.n_docs)
                            + dl.s_num - dl.n_tok * ln(cl.c_l + v.vocab), 6) AS s
               FROM dl JOIN cl ON cl.lang = dl.cand, v),
    pred AS (SELECT doc_id, true_lang,
                    (array_agg(cand ORDER BY s DESC, cand ASC))[1] AS pred_lang
             FROM scored GROUP BY doc_id, true_lang)
    SELECT true_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(1.0 * sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                 / count(*), 6) AS accuracy
    FROM pred
    GROUP BY true_lang
    ORDER BY true_lang
    """,
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language ID, trained and evaluated on
    the corpus itself (resubstitution — the deterministic eval both
    engines can replay): add-1 smoothed per-language unigram LMs +
    document-count priors, per-document argmax over the 5 candidate
    languages, per-true-language accuracy. The canonical
    classifier-based langid of LLM data pipelines (fastText's shape),
    complementing the registry's n-gram-heuristic langid.

    Scale shape (r10 pivoted-base rewrite): ONE token explode feeding
    (a) the (lang, word) count table — pivoted once into a
    per-word lang→count map, so scoring joins each distinct (doc, word)
    against ONE vocab-bounded row instead of |langs| fan-out rows — and
    (b) a per-(doc, word) count aggregation (the only token-scale
    shuffle). All |langs| scores accumulate in a single per-doc groupBy
    as literal-parameterized columns: the per-language priors and
    denominators are a bounded driver table (one row per language code,
    enforced via bounded_rows), the same literal-inlining treatment as
    corpus_dsir_importance. log(c+1) makes absent (word, lang) pairs
    contribute exactly 0, so the map lookup needs no dense vocab×lang
    grid. The argmax is a struct array_max (max score, then
    alphabetically-first language on ties) — no Window, no
    BroadcastNestedLoopJoin anywhere in the plan. Scores rounded at
    1e-6 on BOTH engines before the argmax so libm drift cannot flip a
    prediction."""
    import math

    from weather_tools_spark.operators.bounded import bounded_rows

    docs = load_table(spark, "documents", sf_dir)
    # deliberately NO persist anywhere in this lineage: measured at the
    # 100x series, caching toks (token-scale) or even the vocab-bounded
    # wl/wmap costs 19.1 s vs 6.6 s fully unpersisted (local[32],
    # sfx1.0) - re-running the explode+groupBy lineage per consumer is
    # cheaper than materializing multi-hundred-thousand-row caches.
    # Persist pays only for MANY consumers (ml_kmeanspp_init's 16).
    toks = docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split(F.col("text"), r"\s+")).alias("w"),
    )
    wl = toks.groupBy(F.col("true_lang").alias("lang"), "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    # per-word lang→count map: vocab-bounded, one row per distinct word
    wmap = wl.groupBy("w").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "c"))).alias("cmap")
    )
    # bounded prior table: one row per language CODE — a label set, not
    # data-scale; c_l (token mass) + n_l (doc count) per language.
    # r12 optimization (guide §1.2): the vocabulary size rides the SAME
    # collect as the prior table (1-row countDistinct broadcast onto the
    # <=|langs|-row frame) instead of a second wmap.count() job — the
    # two driver actions each re-ran the token explode; in one job the
    # (lang, w) aggregate exchange is planned once and reused.
    lang_stats = bounded_rows(
        wl.groupBy("lang")
        .agg(F.sum("c").alias("c_l"))
        .join(docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l")), "lang")
        .crossJoin(F.broadcast(wl.agg(F.countDistinct("w").alias("vocab")))),
        100,
        "per-language naive-Bayes prior table (one row per language code)",
    )
    vocab = lang_stats[0]["vocab"]
    n_docs_total = sum(r["n_l"] for r in lang_stats)
    langs = sorted(r["lang"] for r in lang_stats)
    stat = {r["lang"]: r for r in lang_stats}
    prior = {L: math.log(stat[L]["n_l"] / n_docs_total) for L in langs}
    denom = {L: math.log(stat[L]["c_l"] + vocab) for L in langs}

    # the one token-scale shuffle: distinct (doc, word) occurrence counts
    tw = toks.groupBy("doc_id", "true_lang", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = (
        tw.join(F.broadcast(wmap), "w")
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
    # argmax via struct ordering: max s, then max(-idx) = alphabetically
    # first language (langs sorted ascending) — the oracle's tie-break
    cand_structs = F.array(
        *[
            F.struct(
                F.round(
                    F.lit(prior[L])
                    + F.col(f"s{i}")
                    - F.col("n_tok") * F.lit(denom[L]),
                    6,
                ).alias("s"),
                F.lit(-i).alias("nidx"),
            )
            for i, L in enumerate(langs)
        ]
    )
    best = F.array_max(cand_structs)
    pred = per_doc.select(
        "doc_id",
        "true_lang",
        F.element_at(
            F.array(*[F.lit(L) for L in langs]), -best["nidx"] + 1
        ).alias("pred_lang"),
    )
    return (
        pred.groupBy("true_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)
            ).alias("n_correct"),
            F.round(
                F.sum(
                    F.when(F.col("pred_lang") == F.col("true_lang"), 1.0).otherwise(0.0)
                )
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
        .orderBy("true_lang")
    )


@register(
    "ml_kfold_split_balance",
    oracle="""
    WITH folds AS (SELECT doc_id, lang,
                          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5
                            AS fold
                   FROM documents)
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           round(1.0 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / count(*), 6)
             AS en_frac
    FROM folds
    GROUP BY fold
    ORDER BY fold
    """,
)
def ml_kfold_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (md5-of-id mod k — the
    cross-engine, cross-run-stable split every training pipeline needs
    for reproducible CV) with the per-fold balance report that decides
    whether hash folding is acceptable or stratification is required
    (fold sizes, label coverage, majority-label fraction).

    Scale shape: pure map-side fold assignment + one k-row aggregate;
    no sampling state, no shuffle beyond the k-key groupBy."""
    docs = load_table(spark, "documents", sf_dir)
    folds = docs.select(
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 5
        ).alias("fold"),
    )
    return (
        folds.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("en_frac"),
        )
        .orderBy("fold")
    )
