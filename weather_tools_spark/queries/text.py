"""Text-analysis queries over the documents table (language ID, quality
scoring, token counting, fingerprinting) — each mirrored in portable SQL
for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.functions import text as TX
from weather_tools_spark.queries import register


@register(
    "text_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             length(text) AS n_chars_actual
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / count(n_tokens), 6) AS avg_tokens,
           round(CAST(sum(n_chars_actual) AS DOUBLE) / count(n_chars_actual), 6) AS avg_chars
    FROM t GROUP BY source ORDER BY source
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) aggregated per source — the
    core 'how many tokens is this corpus' pipeline query."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "source",
        TX.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("n_tokens").cast("double") / F.count("n_tokens"), 6).alias("avg_tokens"),
            F.round(F.sum("n_chars_actual").cast("double") / F.count("n_chars_actual"), 6).alias("avg_chars"),
        )
        .orderBy("source")
    )


@register(
    "text_quality_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(regexp_replace(text, '[\\w\\s]+', '', 'g')) * 1.0 / length(text) AS punct_ratio
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             least(len(toks) / 100.0, 1.0) AS length_score,
             1.0 - punct_ratio AS alpha_ratio,
             least(len(list_filter(toks, x -> x IN ('the','a','of','and','to')))
                   * 1.0 / len(toks) * 5.0, 1.0) AS stop_score
      FROM t
    )
    SELECT doc_id,
           round((length_score + alpha_ratio + stop_score) / 3.0, 6) AS quality
    FROM s ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document heuristic quality score (length / punctuation /
    stopword evidence blend)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


@register(
    "text_langid_distribution",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id,
        len(list_filter(toks, x -> x IN ('der','die','das','und','nicht'))) AS s_de,
        len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS s_en,
        len(list_filter(toks, x -> x IN ('el','los','las','y','no'))) AS s_es,
        len(list_filter(toks, x -> x IN ('le','la','les','et','pas'))) AS s_fr
      FROM t
    ),
    lid AS (
      -- argmax with alphabetical-first tie-break, 'und' when all zero
      SELECT doc_id,
        CASE
          WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
          WHEN s_es >= s_fr THEN 'es'
          ELSE 'fr'
        END AS lang_pred
      FROM s
    )
    SELECT lang_pred, count(*) AS n FROM lid GROUP BY lang_pred ORDER BY lang_pred
    """,
)
def text_langid_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (argmax with alphabetical-order
    tie-break: a later language wins only on a strictly greater score),
    aggregated to a corpus language distribution."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(TX.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_pred")
    )


@register(
    "text_langid_accuracy",
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
        END AS lang_pred
      FROM s
    )
    SELECT lang, lang_pred, count(*) AS n
    FROM lid GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """,
)
def text_langid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: heuristic prediction × labeled
    ``lang`` column (the corpus carries de/en/es/fr/zh labels; zh has no
    marker list and should land in 'und'/misclassified — visible in the
    matrix)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("lang", TX.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


@register(
    "dedup_name_levenshtein",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
)
def dedup_name_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup for short strings (entity names): distinct
    values pairwise under Levenshtein ≤ 3. The distinct set is tiny, so
    the pair join broadcasts; for large vocabularies the standard scale
    guard is length/prefix bucketing before pairing."""
    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= 3)
        .orderBy("name_a", "name_b")
    )


@register(
    "text_fingerprint_groups",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
                  regexp_split_to_array(trim(lower(text)), '\\s+'))), ' ')) AS fingerprint
      FROM documents
    )
    SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_members
    FROM fp GROUP BY fingerprint
    HAVING count(*) > 1
    ORDER BY keep_id
    """,
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words fingerprint dedup groups (order-insensitive content
    key): documents that are token-set-identical."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .orderBy("keep_id")
    )


@register(
    "text_bpe_token_counts",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_units
      FROM documents
    )
    SELECT source,
           CAST(sum(n_units) AS BIGINT) AS total_units,
           round(CAST(sum(n_units) AS DOUBLE) / count(n_units), 6) AS avg_units
    FROM t GROUP BY source ORDER BY source
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counting (word + punctuation units via the
    standard ``\\w+|[^\\w\\s]`` split) — the 'how many model tokens'
    estimator, distinct from whitespace token counts."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("source", TX.regex_token_count(F.col("text")).alias("n_units"))
    return (
        t.groupBy("source")
        .agg(
            F.sum("n_units").alias("total_units"),
            F.round(F.sum("n_units").cast("double") / F.count("n_units"), 6).alias("avg_units"),
        )
        .orderBy("source")
    )


@register(
    "text_top_terms",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents
    ),
    counts AS (SELECT term, count(*) AS tf FROM toks GROUP BY term)
    SELECT term, tf FROM counts
    ORDER BY tf DESC, term
    LIMIT 20
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies, top-20 (explode → count → ordered limit
    with term tie-break) — the vocabulary-profiling pass of a data
    pipeline; map-side combine keeps the shuffle at distinct-term
    cardinality."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(TX.word_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(20)
    )


@register(
    "text_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket,
           count(*) AS n,
           round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY bucket ORDER BY bucket
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document length histogram (100-char buckets) — corpus profiling."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(
            (F.floor(F.col("n_chars") / 100) * 100).cast("bigint").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("n_chars").cast("double") / F.count("n_chars"), 6).alias("avg_chars"))
        .orderBy("bucket")
    )


@register(
    "corpus_train_split",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
                  THEN 'train'
                  WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 14
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc, CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-free hash
    bucketing: the first hex digit of md5(doc_id) splits ~13/16 train,
    1/16 val, 2/16 test — reproducible across engines, runs, and
    cluster sizes (unlike seed-based sampling, which is engine- and
    partitioning-dependent), and stable under corpus growth: a doc's
    split never changes when other docs are added. The standard
    holdout-assignment pattern for training-data pipelines."""
    docs = load_table(spark, "documents", sf_dir)
    digit = F.instr(
        F.lit("0123456789abcdef"), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    ) - 1
    assigned = docs.select(
        "doc_id",
        F.when(digit < 13, "train").when(digit < 14, "val").otherwise("test").alias("split"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("split")
    )


@register(
    "text_token_rarity",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS t
                 FROM documents),
    dfreq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
    per_doc AS (
      SELECT tok.doc_id,
             count(*) AS n_toks,
             CAST(sum(dfreq.df) AS BIGINT) AS sum_df,
             CAST(sum(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM tok JOIN dfreq USING (t) GROUP BY tok.doc_id
    )
    SELECT doc_id, n_toks,
           round(CAST(sum_df AS DOUBLE) / n_toks, 6) AS mean_token_df,
           round(CAST(n_hapax AS DOUBLE) / n_toks, 6) AS hapax_ratio
    FROM per_doc ORDER BY doc_id
    """,
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity quality signal: per document, the mean corpus
    document-frequency of its distinct tokens and its hapax ratio
    (fraction of tokens appearing in this document only). Boilerplate
    scores a high mean-df; unique/noisy text scores a high hapax ratio
    — the frequency-based half of corpus quality filtering, computed
    with one token-df aggregation joined back to the token frame (all
    integer arithmetic → exact cross-engine parity)."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), r"\s+"))).alias("t"),
    )
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    per_doc = tok.join(dfreq, "t").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("df").alias("sum_df"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return per_doc.select(
        "doc_id",
        "n_toks",
        F.round(F.col("sum_df").cast("double") / F.col("n_toks"), 6).alias("mean_token_df"),
        F.round(F.col("n_hapax").cast("double") / F.col("n_toks"), 6).alias("hapax_ratio"),
    ).orderBy("doc_id")


@register(
    "corpus_decontamination",
    oracle="""
    WITH assigned AS (SELECT doc_id, lang, text,
           instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS d
         FROM documents),
    toks AS (SELECT doc_id, lang, d, regexp_split_to_array(text, '\\s+') AS t FROM assigned),
    sh AS (SELECT doc_id, lang, d,
            unnest(list_distinct(list_transform(range(1, len(t) - 6),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))) AS s
           FROM toks),
    bench AS (SELECT DISTINCT s FROM sh WHERE d >= 14),
    tr AS (SELECT doc_id, lang, s FROM sh WHERE d < 13),
    hits AS (SELECT tr.doc_id, tr.lang, count(*) AS n_shared
             FROM tr JOIN bench USING (s) GROUP BY 1, 2),
    trd AS (SELECT lang, count(*) AS n_train FROM assigned WHERE d < 13 GROUP BY lang),
    contam AS (SELECT lang, count(*) AS n_contaminated,
                      CAST(sum(n_shared) AS BIGINT) AS total_shared,
                      CAST(max(n_shared) AS BIGINT) AS max_shared
               FROM hits GROUP BY lang)
    SELECT trd.lang, n_train,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           CAST(COALESCE(total_shared, 0) AS BIGINT) AS total_shared,
           CAST(COALESCE(max_shared, 0) AS BIGINT) AS max_shared,
           round(1.0 * COALESCE(n_contaminated, 0) / n_train, 6) AS contamination_rate
    FROM trd LEFT JOIN contam ON trd.lang = contam.lang
    ORDER BY trd.lang
    """,
)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    8-gram with the held-out test split (the standard eval-leakage check
    a training-data pipeline runs before shipping a corpus; split
    assignment reuses ``corpus_train_split``'s md5 bucketing).

    Scale shape: shingling is map-side (zip_with, no per-index
    re-evaluation); the contamination check is a shingle **equi-join** —
    at 100 TB with a real (small) benchmark suite the bench side is a
    broadcast set, and even with a proportionally-large holdout it stays
    a hash join keyed on the shingle, the same shape as the Jaccard
    dedup join. Report is per-language with exact doc counts, so any
    leak regression flips the hash gate."""
    from weather_tools_spark.operators.dedup import with_shingles

    docs = load_table(spark, "documents", sf_dir)
    digit = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    )
    sh = (
        with_shingles(docs, "doc_id", "text", 8, extra=("lang",))
        .withColumn("d", digit)
        .select("doc_id", "lang", "d", F.explode("shingles").alias("s"))
    )
    bench = sh.filter(F.col("d") >= 14).select("s").distinct()
    tr = sh.filter(F.col("d") < 13)
    hits = tr.join(bench, "s").groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    trd = (
        docs.select("lang", digit.alias("d"))
        .filter(F.col("d") < 13)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_train"))
    )
    contam = hits.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_contaminated"),
        F.sum("n_shared").alias("total_shared"),
        F.max("n_shared").alias("max_shared"),
    )
    return (
        trd.join(contam, "lang", "left")
        .select(
            "lang",
            "n_train",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.coalesce("total_shared", F.lit(0)).alias("total_shared"),
            F.coalesce("max_shared", F.lit(0)).alias("max_shared"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_train"), 6
            ).alias("contamination_rate"),
        )
        .orderBy("lang")
    )


@register(
    "text_repetition_profile",
    oracle="""
    WITH tok AS (SELECT doc_id, source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t
                 FROM documents),
    cnt AS (SELECT doc_id, source, t, count(*) AS c FROM tok GROUP BY 1, 2, 3),
    per_doc AS (
      SELECT doc_id, source,
             CAST(max(c) AS BIGINT) AS top_c,
             CAST(sum(c) AS BIGINT) AS n_tok,
             count(*) AS n_distinct
      FROM cnt GROUP BY 1, 2
    )
    SELECT source,
           count(*) AS n_docs,
           round(CAST(sum(CAST(round((1.0 * top_c / n_tok) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000 / count(*), 6) AS avg_top_token_share,
           round(CAST(sum(CAST(round((1.0 - 1.0 * n_distinct / n_tok) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000 / count(*), 6) AS avg_dup_token_frac,
           CAST(sum(CASE WHEN 1.0 * top_c / n_tok > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (Gopher-style): per document, the
    share of tokens taken by the single most frequent token and the
    duplicate-token fraction; documents with top-token share > 0.2 are
    flagged. Reported per source so a crawler regression shows up as a
    per-source rate shift.

    Scale shape (r9): ZERO pre-aggregation shuffle — top_c is the
    map-side sorted-run fold (functions/text.max_run_count), n_tok /
    n_distinct are size()/array_distinct() expressions, so the only
    shuffle is the |sources|-key rollup (the r8 version shuffled every
    (doc, token) pair); the per-doc ratios are single divisions
    (engine-deterministic) and the cross-doc means go through
    micro-unit integer sums (the ``_dsum`` parity contract)."""
    from weather_tools_spark.functions.text import max_run_count

    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.lower("text"), r"\s+")
    per_doc = docs.select(
        "doc_id",
        "source",
        max_run_count(toks).alias("top_c"),
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    top_share = F.col("top_c") / F.col("n_tok")
    dup_frac = F.lit(1.0) - F.col("n_distinct") / F.col("n_tok")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (F.sum(F.round(top_share * 1_000_000, 0).cast("long")) / 1_000_000).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_top_token_share"),
            F.round(
                (F.sum(F.round(dup_frac * 1_000_000, 0).cast("long")) / 1_000_000).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_dup_token_frac"),
            F.sum(F.when(top_share > 0.2, 1).otherwise(0)).alias("n_flagged"),
        )
        .orderBy("source")
    )


@register(
    "text_bigram_counts",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM toks),
    counts AS (SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
               FROM bg GROUP BY bigram)
    SELECT bigram, n, df
    FROM counts
    WHERE n >= 5
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram count table (term + document frequency, min-count 5,
    top 50) — the first step of every count-based n-gram LM and the
    collocation statistic quality filters build on.

    Scale shape: the bigram generator is map-side (zip_with over the
    token array — no per-index re-evaluation of the tokenizer); the
    count is one map-combinable aggregate on the bigram key, and the
    min-count filter drops the long tail before the tiny top-k sort.
    Ties broken on the bigram string so LIMIT is deterministic."""
    docs = load_table(spark, "documents", sf_dir)
    t = "split(lower(text), '\\\\s+')"
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size({t}) >= 2 THEN "
                f"zip_with(slice({t}, 1, size({t}) - 1), slice({t}, 2, size({t}) - 1), "
                f"(x, y) -> concat(x, ' ', y)) ELSE array() END"
            )
        ).alias("bigram"),
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("df"))
        .filter(F.col("n") >= 5)
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@register(
    "text_heavy_hitters_audit",
    oracle="""
    WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS t FROM documents),
    exact AS (SELECT t, count(*) AS n FROM tok GROUP BY t)
    SELECT CAST(sum(n) AS BIGINT) AS n_total,
           count(*) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_freq,
           TRUE AS all_keys_present,
           TRUE AS counts_exact
    FROM exact
    """,
)
def text_heavy_hitters_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-sketch audit: run the distributed heavy-hitters
    summary (operators/heavyhitters.py, per-partition top-C + merge)
    with capacity ≥ the corpus vocabulary, where the merge must
    reproduce the exact count table — every key present, every merged
    count equal to the exact count. The booleans flip (failing the
    driver's hash gate) on any summarize/merge regression. The
    truncation guarantee (capacity < vocabulary: every key above an
    n/C share survives, merged counts are lower bounds) is asserted on
    a synthetically skewed frame in tests/test_heavy_hitters.py —
    uniform corpus data has no heavy keys to make that case
    driver-visible.

    The capacity is derived from the measured vocabulary (the exact
    count table's row count, taken via .count() with no persist, IS
    the vocabulary), not a constant: a fixed capacity=64 satisfied the ≥-vocabulary contract
    only on the 31-word driver corpus — on a Heaps-law vocabulary
    (.scaledata sfx1.0, ~10^5 words) Misra-Gries compression kicks in
    and the exactness booleans legitimately flip. Found by the r10
    sfx1.0 strict sweep; the capacity now follows the corpus so the
    audit tests the summarize/merge path, not the fixture's vocabulary.
    The exact table is NOT persisted between its two consumers (vocab
    count + verification join): recomputing one explode + groupBy is
    cheaper than materializing a vocab-scale cache (the r10
    persist-vs-recompute measurements on the NB lineage). The full
    vocabulary count() is an AUDIT-ONLY cost: the production
    heavy-hitter path calls heavy_hitter_candidates with a FIXED
    capacity (bounded state, lower-bound counts) and never sizes
    capacity off the corpus."""
    from weather_tools_spark.operators.heavyhitters import heavy_hitter_candidates

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    vocab = exact.count()
    # state_factor=1: capacity >= vocab already guarantees MG eviction
    # never triggers (the exactness contract), so per-partition state
    # stays at 1x the vocabulary instead of the default 8x — the 8x
    # headroom only buys tighter lower bounds when capacity < vocab.
    cand = heavy_hitter_candidates(tok, "t", capacity=max(64, vocab), state_factor=1)
    joined = exact.join(cand, exact["t"] == cand["key"], "left")
    return joined.agg(
        F.sum("n").alias("n_total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_freq"),
        (F.sum(F.when(F.col("key").isNull(), 1).otherwise(0)) == 0).alias("all_keys_present"),
        (F.sum(F.when(F.col("cnt_lb") == F.col("n"), 0).otherwise(1)) == 0).alias("counts_exact"),
    )


@register(
    "documents_dup_rate_by_source",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_copies,
           round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def documents_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplication rate per source — the provenance view of the
    dedup pass (which crawler/feed ships copies). Distinct-count over
    the md5 content digest: one map-combinable aggregate; hashing the
    text first keeps the distinct state at 32 bytes/row instead of the
    document body. (The synthetic corpus plants exact copies at sf0.1+
    — 8 there; smaller SFs legitimately report all-zero rates, which
    the hash gate still verifies digit-for-digit.)"""
    docs = load_table(spark, "documents", sf_dir)
    uniq = F.count_distinct(F.md5("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            uniq.alias("n_unique"),
            (F.count(F.lit(1)) - uniq).alias("n_dup_copies"),
            F.round(
                (F.count(F.lit(1)) - uniq).cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "text_pii_scrub",
    oracle=r"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                  || ' ssn ' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0')
                  || '-' || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')
                  || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS clean,
             text
      FROM seeded
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text) - len(replace(text, '@', ''))) AS BIGINT) AS n_at_signs,
           CAST(sum(CASE WHEN clean LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_email_docs,
           CAST(sum(CASE WHEN clean LIKE '%<SSN>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ssn_docs,
           CAST(sum(CASE WHEN clean LIKE '%<IP>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ip_docs,
           CAST(sum(CASE WHEN regexp_matches(clean,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') THEN 1 ELSE 0 END) AS BIGINT)
             AS n_residual_emails,
           md5(string_agg(md5(clean), '' ORDER BY doc_id)) AS scrub_digest
    FROM scrubbed
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrub stage every training-data pipeline
    runs before tokenization. Deterministic synthetic PII (emails, SSNs,
    IPv4s derived from doc_id) is injected into the corpus, then
    removed with chained regexp_replace; the patterns are written in
    the RE2 ∩ Java-regex common dialect (character classes + bounded
    quantifiers, no lookaround) so Spark and DuckDB replace
    identically. The report hash-gates the complete scrubbed corpus
    (order-fixed digest of per-doc md5s), per-category hit counts, and
    a residual-PII count that must be zero — any pattern drift or
    missed occurrence flips the digest or the residual count.
    Map-only: no shuffle except the final 1-row aggregate."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ssn = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
    ip = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
    docs = load_table(spark, "documents", sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail-"), (F.col("doc_id") % 7).cast("string"), F.lit(".example.com"),
            F.lit(" ssn "), F.lpad((F.col("doc_id") % 900 + 100).cast("string"), 3, "0"),
            F.lit("-"), F.lpad((F.col("doc_id") % 90 + 10).cast("string"), 2, "0"),
            F.lit("-"), F.lpad((F.col("doc_id") % 9000 + 1000).cast("string"), 4, "0"),
            F.lit(" host 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), ssn, "<SSN>"
        ),
        ip,
        "<IP>",
    )
    scrubbed = seeded.select(
        "doc_id", "text", clean.alias("clean")
    )
    return scrubbed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text") - F.length(F.replace(F.col("text"), F.lit("@"), F.lit("")))).alias("n_at_signs"),
        F.sum(F.when(F.col("clean").contains("<EMAIL>"), 1).otherwise(0)).alias("n_email_docs"),
        F.sum(F.when(F.col("clean").contains("<SSN>"), 1).otherwise(0)).alias("n_ssn_docs"),
        F.sum(F.when(F.col("clean").contains("<IP>"), 1).otherwise(0)).alias("n_ip_docs"),
        F.sum(F.when(F.regexp_like(F.col("clean"), F.lit(email)), 1).otherwise(0)).alias("n_residual_emails"),
        F.md5(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("doc_id"), F.md5("clean").alias("h")))
                ),
                F.lit(""),
                lambda acc, x: F.concat(acc, x["h"]),
            ).cast("binary")
        ).alias("scrub_digest"),
    )


@register(
    "corpus_chunk_documents",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS t,
             len(regexp_split_to_array(text, '\s+')) AS n
      FROM documents
    ),
    chunked AS (
      SELECT doc_id,
             g.i AS chunk_idx,
             array_to_string(t[g.i * 24 + 1 : g.i * 24 + 32], ' ') AS chunk_text,
             len(t[g.i * 24 + 1 : g.i * 24 + 32]) AS n_tokens
      FROM toks,
           LATERAL (SELECT unnest(range(0, 1 + (greatest(0, n - 32) + 23) // 24)) AS i) g
      WHERE n > 0
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(n_tokens AS INTEGER) AS n_tokens, md5(chunk_text) AS chunk_md5
    FROM chunked
    ORDER BY doc_id, chunk_idx
    """,
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the fixed-context packing
    stage of an LLM training pipeline: 32-token windows, stride 24
    (8-token overlap), last window ragged. Chunk count is
    ``1 + ceil(max(0, n_tokens − 32) / 24)`` in exact integer
    arithmetic on both engines, and every chunk's TEXT is hash-gated
    (md5 per chunk), so a boundary off-by-one or tokenizer drift fails
    the driver's value hash. Map-only explode — no shuffle beyond the
    output ordering; at 100 TB this is the shape that feeds the
    tokenizer fleet."""
    window, stride = 32, 24
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("t")
    ).withColumn("n", F.size("t"))
    chunked = (
        toks.filter(F.col("n") > 0)
        .select(
            "doc_id",
            "t",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    # integer `div`, matching the oracle's `//`
                    F.expr(f"(greatest(0, n - {window}) + {stride - 1}) div {stride}").cast("int"),
                )
            ).alias("chunk_idx", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.slice(F.col("t"), F.col("chunk_idx") * stride + 1, window).alias("c"),
        )
    )
    return (
        chunked.select(
            "doc_id",
            "chunk_idx",
            F.size("c").cast("int").alias("n_tokens"),
            F.md5(F.array_join("c", " ")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "corpus_pack_sequences",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS n
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n,
             sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    ),
    spans AS (
      SELECT doc_id, n,
             (cum - n) // 256 AS bin_first,
             (cum - 1) // 256 AS bin_last
      FROM pos
    )
    SELECT CAST((SELECT (sum(n) + 255) // 256 FROM toks) AS BIGINT) AS n_bins,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN bin_last > bin_first THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
           round(CAST(sum(CASE WHEN bin_last > bin_first THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS split_frac,
           CAST((SELECT sum(n) FROM toks) AS BIGINT) AS total_tokens,
           CAST((SELECT sum(n) % 256 FROM toks) AS BIGINT) AS tail_fill
    FROM spans
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing — the GPT-style pre-training
    packing stage: the corpus token stream (docs in doc_id order) is
    cut into fixed 256-token contexts, and the report gives the packing
    geometry a data engineer actually tunes on: bin count, how many
    documents straddle a context boundary (those get truncated
    attention in training), and the tail fill.

    The global running offset uses the engine's distributed two-pass
    prefix sum (operators/prefix_sum.py) — NOT a single-partition
    Window, which would funnel the whole corpus through one task at
    100 TB. The oracle recomputes identical spans with a SQL window;
    every output is exact integer arithmetic."""
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    ctx = 256
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n"))
    # r12 optimization: probe-dispatched cumulative sum — bounded
    # single-task window when the measured doc count is <=100k, the
    # distributed two-pass prefix sum past it (same dispatch as the
    # stats family; the 100 TB path is unchanged).
    pos = cumulative_sums(toks, ["doc_id"], ["n"], ["cum"])
    spans = pos.select(
        "doc_id",
        "n",
        F.expr(f"(cum - n) div {ctx}").alias("bin_first"),
        F.expr(f"(cum - 1) div {ctx}").alias("bin_last"),
    )
    split = F.when(F.col("bin_last") > F.col("bin_first"), 1).otherwise(0)
    return spans.agg(
        F.ceil(F.sum("n") / ctx).cast("long").alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(split).cast("long").alias("n_split_docs"),
        F.round(F.sum(split).cast("double") / F.count(F.lit(1)), 6).alias("split_frac"),
        F.sum("n").cast("long").alias("total_tokens"),
        (F.sum("n") % ctx).cast("long").alias("tail_fill"),
    )


# ---------------------------------------------------------------------------
# Retrieval scoring + model-based quality filtering
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "table", "join", "query")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, avg(len(t)) AS avg_len FROM toks
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl FROM (
        SELECT doc_id, unnest(t) AS term, len(t) AS dl FROM toks)
      WHERE term IN {tuple(_BM25_TERMS)!r}
      GROUP BY doc_id, term
    ), idf AS (
      SELECT term, ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf FROM (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term) d
      CROSS JOIN stats s
    ), scored AS (
      SELECT f.doc_id,
             sum(i.idf * f.tf * ({_BM25_K1!r} + 1)
                 / (f.tf + {_BM25_K1!r} * (1 - {_BM25_B!r} + {_BM25_B!r} * f.dl / s.avg_len)))
               AS score
      FROM tf f JOIN idf i USING (term) CROSS JOIN stats s
      GROUP BY f.doc_id
    )
    SELECT doc_id, round(score, 6) AS score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
    FROM scored
    ORDER BY rk LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck-Jones, the Okapi
    formula) for a fixed keyword query over the corpus — the classic
    inverted-index ranking as a distributed DataFrame plan: tokenize →
    explode FILTERED to the query terms (the filter sits under the
    shuffle, so only matching postings move), per-(doc, term) tf, df →
    idf as a broadcast dim, one map-combinable per-doc sum, top-20.
    The corpus-level scalars (N, avg doc length) ride a single-row
    broadcast. Oracle recomputes the identical formula in SQL."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).select("doc_id", "t", F.size("t").alias("dl"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_len")
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select("term", F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"))
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avg_len")))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf") * F.col("tf") * (_BM25_K1 + 1)
                / (F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avg_len")))
            ).alias("score")
        )
    )
    from pyspark.sql import Window

    # distributed top-k (TakeOrdered), THEN rank the 20 survivors — the
    # row_number window only ever sees k rows, never the corpus
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(20)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        top.withColumn("rk", F.row_number().over(w).cast("long"))
        .select("doc_id", F.round("score", 6).alias("score"), "rk")
        .orderBy("rk")
    )


_CLS_BUCKETS = 4096


@register(
    "corpus_quality_classifier",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ), feats AS (
      SELECT doc_id, source, dl,
             ((('0x' || substr(md5(term), 1, 8))::BIGINT % {_CLS_BUCKETS})
               * 2654435761) % 4294967296 / 2147483648.0 - 1.0 AS w
      FROM tok
    ), scored AS (
      SELECT doc_id, any_value(source) AS source,
             1.0 / (1.0 + exp(-4.0 * sum(w) / any_value(dl))) AS score
      FROM feats GROUP BY doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE score >= 0.5) AS BIGINT) AS kept,
           round(avg(score), 6) AS avg_score,
           round(count(*) FILTER (WHERE score >= 0.5) * 1.0 / count(*), 6) AS keep_rate
    FROM scored GROUP BY source ORDER BY source
    """,
)
def corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the FineWeb-Edu / DCLM pipeline
    stage): a linear classifier over hashing-trick bag-of-words
    features, scored entirely JVM-side — feature hash = first 8 hex
    digits of md5(token) mod B, weight = a fixed multiplicative-hash
    lookup (w(b) = (b·2654435761 mod 2³²)/2³¹ − 1, a deterministic
    stand-in for trained weights with the exact runtime shape of the
    real thing), doc score = σ(4·Σw/len). At 100 TB this is one
    map-side pass + a per-source combinable aggregate: no shuffle of
    token rows (partial aggregation), no Python. Oracle recomputes the
    identical hash/weights/sigmoid in SQL."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).select("doc_id", "source", F.size("t").alias("dl"), F.explode("t").alias("term"))
    bucket = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") % _CLS_BUCKETS
    w = ((bucket * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(2147483648.0) - 1.0
    scored = (
        tok.withColumn("w", w)
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            (1.0 / (1.0 + F.exp(-4.0 * F.sum("w") / F.first("dl")))).alias("score"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("score") >= 0.5).cast("long")).alias("kept"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
        .select(
            "source", "n_docs", "kept", "avg_score",
            F.round(F.col("kept") / F.col("n_docs"), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


_PPL_K = 0.5        # add-k smoothing
_PPL_THR = 29.5     # keep threshold — inside the corpus PPL distribution
                    # (min |ppl-thr| ≥ 4e-4 at both SFs vs ~1e-11 engine drift)


@register(
    "corpus_perplexity_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ), cbg AS (
      SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2
    ), cleft AS (
      SELECT w1, count(*) AS cl FROM bg GROUP BY w1
    ), vocab AS (
      SELECT count(DISTINCT w) AS v FROM (
        SELECT unnest(t) AS w FROM toks)
    ), scored AS (
      SELECT b.doc_id, any_value(b.source) AS source,
             pow(2.0, -avg(log2((c.c + {_PPL_K!r}) / (l.cl + {_PPL_K!r} * vocab.v)))) AS ppl
      FROM bg b
      JOIN cbg c ON b.w1 = c.w1 AND b.w2 = c.w2
      JOIN cleft l ON b.w1 = l.w1
      CROSS JOIN vocab
      GROUP BY b.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(ppl), 6) AS avg_ppl,
           CAST(count(*) FILTER (WHERE ppl <= {_PPL_THR!r}) AS BIGINT) AS kept,
           round(count(*) FILTER (WHERE ppl <= {_PPL_THR!r}) * 1.0 / count(*), 6) AS keep_rate
    FROM scored GROUP BY source ORDER BY source
    """,
)
def corpus_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality filtering (the CCNet stage, Wenzek et
    al. 2020): train an add-k-smoothed bigram LM on the corpus itself —
    P(w₂|w₁) = (c(w₁,w₂)+k)/(c(w₁·)+k·V) — then score every document
    with PPL = 2^(−mean log₂ P) and keep documents under the threshold.
    Plan shape at scale: bigram explode (map-side) → two count
    aggregations → equi-joins back on the bigram/left-context keys (all
    co-partitioned by token keys, map-combinable) → per-doc then
    per-source aggregation; the vocabulary size rides a one-row
    broadcast. The oracle retrains the identical LM in SQL."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    bg = toks.select(
        "doc_id", "source",
        # Same 1-token-doc guard as text_kneser_ney_ppl (ADVICE r7):
        # sequence(1, 0) counts DOWN and element_at(t, 0) throws.
        F.expr(
            "explode(CASE WHEN size(t) < 2 "
            "THEN cast(array() AS array<struct<w1: string, w2: string>>) "
            "ELSE transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2)) END)"
        ).alias("p"),
    ).select("doc_id", "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # cleft derives from cbg (distinct (w1,w2) rows → sum of c per w1);
    # vocab must still scan unigrams (a 1-token doc's only token never
    # enters a bigram). cbg is NOT persisted (r10 persist audit):
    # caching the bigram-type frame measured 22.3 s vs 9.6 s unpersisted
    # at sfx1.0 — exchange reuse shares the bigram shuffle already.
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cleft = cbg.groupBy("w1").agg(F.sum("c").alias("cl"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        bg.join(cbg, ["w1", "w2"])
        .join(cleft, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.pow(
                F.lit(2.0),
                -F.avg(F.log2((F.col("c") + _PPL_K) / (F.col("cl") + _PPL_K * F.col("v")))),
            ).alias("ppl"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ppl"), 6).alias("avg_ppl"),
            F.sum((F.col("ppl") <= _PPL_THR).cast("long")).alias("kept"),
        )
        .select(
            "source", "n_docs", "avg_ppl", "kept",
            F.round(F.col("kept") / F.col("n_docs"), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


@register(
    "text_tfidf_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) * 1.0 / any_value(dl) AS tf
      FROM tok GROUP BY doc_id, term
    ), idf AS (
      SELECT term, ln((SELECT count(DISTINCT doc_id) FROM tok) * 1.0 / count(DISTINCT doc_id)) AS idf
      FROM tok GROUP BY term
    ), scored AS (
      SELECT f.doc_id, f.term, f.tf * i.idf AS w,
             row_number() OVER (PARTITION BY f.doc_id
                                ORDER BY f.tf * i.idf DESC, f.term) AS rk
      FROM tf f JOIN idf i USING (term)
    )
    SELECT doc_id, term, round(w, 6) AS tfidf, CAST(rk AS BIGINT) AS rk
    FROM scored WHERE rk <= 3 AND doc_id < 40
    ORDER BY doc_id, rk
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction — TF-IDF top-3 terms per doc
    (the tagging/labeling stage of corpus curation): term frequency
    normalized by doc length × smooth-free idf ln(N/df); ranking ties
    broken lexicographically so both engines agree deterministically.
    Plan: one token explode → two map-combinable aggregates → a
    broadcast idf join → per-doc window (PARTITIONED by doc — parallel
    across the corpus). Output limited to doc_id < 40 to keep the
    verification frame small; the plan is identical at any cut."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("dl"),
    )
    n_docs = docs.count()  # bounded scalar (dimension count)
    # ONE explode pass: tf (one row per (doc, term) — the frame the
    # ranking join needs anyway); idf derives from it:
    # countDistinct(doc_id) per term over tokens == row count per term
    # over tf. NOT persisted (r10 persist audit): Catalyst re-runs the
    # explode for idf, but exchange reuse shares the (doc, term)
    # shuffle — caching the doc×term frame measured 34.9 s vs 4.1 s
    # unpersisted at sfx1.0, the worst persist penalty in the registry.
    tf = tok.groupBy("doc_id", "term").agg(
        (F.count(F.lit(1)) / F.first("dl")).alias("tf")
    )
    idf = tf.groupBy("term").agg(
        F.log(F.lit(float(n_docs)) / F.count(F.lit(1))).alias("idf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), "term")
    return (
        tf.join(F.broadcast(idf), "term")
        .select("doc_id", "term", (F.col("tf") * F.col("idf")).alias("w"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 40))
        .select("doc_id", "term", F.round("w", 6).alias("tfidf"), "rk")
        .orderBy("doc_id", "rk")
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents
    ), freq AS (
      SELECT term, count(*) AS f FROM tok GROUP BY term
    ), ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY f DESC, term) AS DOUBLE)) AS lr,
             ln(CAST(f AS DOUBLE)) AS lf
      FROM freq
    ), m AS (
      SELECT count(*) AS n, sum(lr) AS sx, sum(lf) AS sy,
             sum(lr * lr) AS sxx, sum(lr * lf) AS sxy, sum(lf * lf) AS syy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(-(n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_exponent,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log-frequency against log-rank (rank ties broken by term so both
    engines rank identically) — the standard corpus-statistics
    diagnostic (natural text ⇒ exponent ≈ 1). Same sufficient-statistic
    reduction as events_linear_trend: the fit is one combinable
    aggregate over the ranked vocabulary; the only ordered step is the
    vocabulary ranking itself (a dimension-sized sort)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    freq = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # vocabulary-sized global sort (dimension scale, like the geo lookup)
    ranked = freq.select(
        F.log(F.row_number().over(Window.orderBy(F.col("f").desc(), "term")).cast("double")).alias("lr"),
        F.log(F.col("f").cast("double")).alias("lf"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lr").alias("sx"), F.sum("lf").alias("sy"),
        F.sum(F.col("lr") * F.col("lr")).alias("sxx"),
        F.sum(F.col("lr") * F.col("lf")).alias("sxy"),
        F.sum(F.col("lf") * F.col("lf")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(-num / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")), 6).alias("zipf_exponent"),
        F.round(
            F.pow(num, 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


@register(
    "text_collocations_pmi",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(t) AS w FROM toks
      ) GROUP BY w
    ),
    n_tok AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
    bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
      ) GROUP BY w1, w2
    ),
    n_bi AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bi),
    scored AS (
      SELECT b.w1, b.w2, b.c AS pair_count,
             ln((CAST(b.c AS DOUBLE) / nb.n)
                / ((CAST(u1.c AS DOUBLE) / nt.n) * (CAST(u2.c AS DOUBLE) / nt.n)))
               AS pmi
      FROM bi b
      JOIN uni u1 ON b.w1 = u1.w
      JOIN uni u2 ON b.w2 = u2.w
      CROSS JOIN n_tok nt CROSS JOIN n_bi nb
      WHERE b.c >= 5
    )
    SELECT w1, w2, pair_count, round(pmi, 6) AS pmi
    FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 15
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information — the
    classic NLP association measure over adjacent word pairs (min pair
    count 5, top-15 by PMI with full deterministic tie-break). Unigram
    and bigram counts are map-combinable aggregations; the corpus
    scalars broadcast; the final top-k is a distributed TakeOrdered.
    At 100 TB the joined frames are vocabulary-sized, never
    corpus-sized."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.expr(r"filter(split(trim(text), '\\s+'), x -> x <> '')").alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN cast(array() as array<struct<w1:string,w2:string>>) "
                    "ELSE transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, cast(i as int)) AS w1, "
                    "element_at(t, cast(i + 1 as int)) AS w2)) END"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )
    n_tok = uni.agg(F.sum("c").alias("nt"))
    n_bi_all = (
        toks.select(
            F.expr("cast(greatest(size(t) - 1, 0) as bigint)").alias("k")
        ).agg(F.sum("k").alias("nb"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bi_all))
        .select(
            "w1",
            "w2",
            F.col("c").alias("pair_count"),
            F.log(
                (F.col("c").cast("double") / F.col("nb"))
                / (
                    (F.col("c1").cast("double") / F.col("nt"))
                    * (F.col("c2").cast("double") / F.col("nt"))
                )
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(15)
    return top.select(
        "w1", "w2", "pair_count", F.round("pmi", 6).alias("pmi")
    ).orderBy(F.col("pmi").desc(), "w1", "w2")


@register(
    "ml_classifier_eval",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ), feats AS (
      SELECT doc_id, lang, dl,
             ((('0x' || substr(md5(term), 1, 8))::BIGINT % {_CLS_BUCKETS})
               * 2654435761) % 4294967296 / 2147483648.0 - 1.0 AS w
      FROM tok
    ), scored AS (
      SELECT doc_id, any_value(lang) AS lang,
             1.0 / (1.0 + exp(-4.0 * sum(w) / any_value(dl))) AS score
      FROM feats GROUP BY doc_id
    ), cm AS (
      SELECT
        CAST(count(*) FILTER (WHERE score >= 0.5 AND lang = 'en') AS BIGINT) AS tp,
        CAST(count(*) FILTER (WHERE score >= 0.5 AND lang <> 'en') AS BIGINT) AS fp,
        CAST(count(*) FILTER (WHERE score < 0.5 AND lang = 'en') AS BIGINT) AS fn,
        CAST(count(*) FILTER (WHERE score < 0.5 AND lang <> 'en') AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           round((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy,
           round(tp * 1.0 / (tp + fp), 6) AS precision,
           round(tp * 1.0 / (tp + fn), 6) AS recall,
           round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
           round(((tp + fp) * 1.0 / (tp + fp + fn + tn))
                 * ((tp + fn) * 1.0 / (tp + fp + fn + tn))
                 + ((tn + fn) * 1.0 / (tp + fp + fn + tn))
                 * ((tn + fp) * 1.0 / (tp + fp + fn + tn)), 6) AS expected_agreement
    FROM cm
    """,
)
def ml_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation harness: confusion matrix and the derived
    metric suite (accuracy, precision, recall, F1, and the chance-
    agreement term of Cohen's kappa) for the hashing-trick quality
    classifier scored against the lang == 'en' reference labels — the
    model-eval readout an MLOps pipeline runs after every retrain. The
    scoring pass is the same single map-combinable token aggregation as
    corpus_quality_classifier (no token shuffle); the matrix is one
    conditional-count pass and every metric is an exact-integer ratio
    rounded once (F1 as 2TP/(2TP+FP+FN) avoids the precision*recall
    intermediate division). The 0.5 cut reuses the decision margins
    certified for the classifier query."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", "lang", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).select("doc_id", "lang", F.size("t").alias("dl"), F.explode("t").alias("term"))
    bucket = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") % _CLS_BUCKETS
    w = ((bucket * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(2147483648.0) - 1.0
    scored = (
        tok.withColumn("w", w)
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            (1.0 / (1.0 + F.exp(-4.0 * F.sum("w") / F.first("dl")))).alias("score"),
        )
    )
    pred = F.col("score") >= 0.5
    en = F.col("lang") == "en"
    cm = scored.agg(
        F.sum(F.when(pred & en, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~en, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & en, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~pred & ~en, 1).otherwise(0)).cast("long").alias("tn"),
    )
    tot = (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")) * 1.0
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((F.col("tp") + F.col("tn")) / tot, 6).alias("accuracy"),
        F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")), 6).alias("recall"),
        F.round(
            2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
        F.round(
            ((F.col("tp") + F.col("fp")) / tot) * ((F.col("tp") + F.col("fn")) / tot)
            + ((F.col("tn") + F.col("fn")) / tot) * ((F.col("tn") + F.col("fp")) / tot),
            6,
        ).alias("expected_agreement"),
    )


@register(
    "text_readability_flesch",
    oracle="""
    WITH d AS (
      SELECT lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS words,
             greatest(1, len(regexp_replace(text, '[^.!?]', '', 'g'))) AS sents,
             greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS sylls
      FROM documents
    ),
    scored AS (
      SELECT lang, words, sents, sylls,
             CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE) * (CAST(words AS DOUBLE) / sents)
               - CAST(84.6 AS DOUBLE) * (CAST(sylls AS DOUBLE) / words) AS flesch
      FROM d
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS total_words,
           CAST(sum(sylls) AS BIGINT) AS total_syllables,
           round(sum(words) * 1.0 / sum(sents), 6) AS words_per_sentence,
           round(avg(flesch), 6) AS mean_flesch,
           CAST(count(*) FILTER (WHERE flesch < 30) AS BIGINT) AS n_hard_docs
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease readability profiling per language — the
    document-difficulty feature readability-based corpus filters use.
    Words are whitespace tokens, sentences count terminator characters
    (.!?), and syllables use the standard maximal-vowel-run heuristic —
    all three are integer regexp counts identical in both engines
    (greedy character-class runs), so the only floats are the score's
    two correctly-rounded divisions against exact double constants.
    One map-side scoring pass, one map-combinable aggregate; the
    hard-document census (score < 30) rides the same pass."""
    docs = load_table(spark, "documents", sf_dir)
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sents = F.greatest(
        F.lit(1), F.length(F.regexp_replace(F.col("text"), r"[^.!?]", ""))
    )
    sylls = F.greatest(
        F.lit(1),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
    )
    d = docs.select(
        "lang",
        words.alias("words"),
        sents.alias("sents"),
        sylls.alias("sylls"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words").cast("double") / F.col("sents"))
        - F.lit(84.6) * (F.col("sylls").cast("double") / F.col("words"))
    )
    scored = d.withColumn("flesch", flesch)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").cast("long").alias("total_words"),
            F.sum("sylls").cast("long").alias("total_syllables"),
            F.round(F.sum("words") * 1.0 / F.sum("sents"), 6).alias(
                "words_per_sentence"
            ),
            F.round(F.avg("flesch"), 6).alias("mean_flesch"),
            F.sum(F.when(F.col("flesch") < 30, 1).otherwise(0))
            .cast("long")
            .alias("n_hard_docs"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Hapax legomena / vocabulary profile (round 8)
# ---------------------------------------------------------------------------


@register(
    "text_hapax_legomena",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (SELECT source, tok, count(*) AS f FROM toks GROUP BY source, tok)
    SELECT source,
           CAST(sum(f) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(1.0 * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS hapax_ratio,
           round(1.0 * count(*) / sum(f), 6) AS type_token_ratio
    FROM tf GROUP BY source ORDER BY source
    """,
)
def text_hapax_legomena(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile: token/type counts, hapax legomena
    (once-occurring types) and the hapax + type-token ratios — the
    vocabulary-growth health check (Heaps-law regime detector) a corpus
    pipeline runs to spot boilerplate-dominated or template-generated
    sources (low hapax ratio = degenerate vocabulary; the scale data
    generator in tools/gen_scale_data.py was calibrated with exactly
    this statistic).

    Scale shape: explode to tokens (map-side), two-phase count
    aggregate keyed by (source, token) — shuffle bounded by the
    distinct vocabulary, not corpus tokens — then a per-source reduce.
    Exact integer arithmetic; the two ratios are single rounded
    divisions."""
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
            F.round(
                F.lit(1.0)
                * F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_ratio"),
            F.round(F.lit(1.0) * F.count(F.lit(1)) / F.sum("f"), 6).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa for the langid classifier (round 8, wave 3)
# ---------------------------------------------------------------------------


@register(
    "text_langid_cohens_kappa",
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
        END AS lang_pred
      FROM s
    ),
    conf AS (SELECT lang, lang_pred, count(*) AS n FROM lid GROUP BY 1, 2),
    tot AS (SELECT sum(n) AS nn FROM conf),
    po AS (SELECT sum(n) AS agree FROM conf WHERE lang = lang_pred),
    margins AS (
      SELECT coalesce(r.lang, c.lang_pred) AS k,
             coalesce(r.rn, 0) AS rn, coalesce(c.cn, 0) AS cn
      FROM (SELECT lang, sum(n) AS rn FROM conf GROUP BY lang) r
      FULL OUTER JOIN (SELECT lang_pred, sum(n) AS cn FROM conf GROUP BY lang_pred) c
        ON r.lang = c.lang_pred
    ),
    pe AS (SELECT sum(rn * cn) AS e FROM margins)
    SELECT CAST(tot.nn AS BIGINT) AS n,
           round(CAST(po.agree AS DOUBLE) / tot.nn, 6) AS p_observed,
           round(CAST(pe.e AS DOUBLE) / (tot.nn * tot.nn), 6) AS p_expected,
           round((CAST(po.agree AS DOUBLE) / tot.nn
                  - CAST(pe.e AS DOUBLE) / (tot.nn * tot.nn))
                 / (1.0 - CAST(pe.e AS DOUBLE) / (tot.nn * tot.nn)), 6) AS kappa
    FROM tot, po, pe
    """,
)
def text_langid_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the labeled ``lang`` column and the
    heuristic langid prediction — chance-corrected agreement, the
    metric that exposes a classifier that merely predicts the majority
    class (accuracy hides it, kappa goes to 0). One row:
    n, observed agreement, expected-by-chance agreement, kappa.

    Scale shape: the fact-scale work is text_langid_accuracy's scoring
    pass (map-side marker counts, no shuffle beyond the confusion
    aggregate, <=|langs|² rows); kappa is exact integer margins over
    that tiny frame — a full-outer margin join because a label can be
    absent from either axis (zh never predicted, 'und' never true).
    The confusion table (≤|langs|² rows) is persisted (r9): it feeds
    the row margins, column margins, AND the agreement scalars, and
    without the pin Catalyst re-ran the marker-count scoring pass for
    every branch (4 fact scans; 9.5 s → 2.7 s at sfx1.0)."""
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    conf = _persist(
        docs.select("lang", TX.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = conf.groupBy("lang").agg(F.sum("n").alias("rn"))
    cols = conf.groupBy("lang_pred").agg(F.sum("n").alias("cn"))
    margins = rows.join(
        cols, rows["lang"] == cols["lang_pred"], "full_outer"
    ).select(
        F.coalesce(F.col("rn"), F.lit(0)).alias("rn"),
        F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
    )
    scalars = conf.agg(
        F.sum("n").alias("nn"),
        F.sum(F.when(F.col("lang") == F.col("lang_pred"), F.col("n")).otherwise(0)).alias(
            "agree"
        ),
    )
    e = margins.agg(F.sum(F.col("rn") * F.col("cn")).alias("e"))
    pe = F.col("e").cast("double") / (F.col("nn") * F.col("nn"))
    po = F.col("agree").cast("double") / F.col("nn")
    return (
        scalars.crossJoin(F.broadcast(e))
        .select(
            F.col("nn").cast("long").alias("n"),
            F.round(po, 6).alias("p_observed"),
            F.round(pe, 6).alias("p_expected"),
            F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
        )
    )


@register(
    "text_ttr_standardized",
    oracle="""
    WITH toks AS (SELECT doc_id, source,
                         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                  FROM documents),
    perdoc AS (
      SELECT doc_id, source,
             len(list_distinct(t)) * 1.0 / len(t) AS ttr,
             CAST(len(t) // 25 AS INT) AS n_chunks,
             CASE WHEN len(t) >= 25 THEN
               list_avg(list_transform(range(0, CAST(len(t) // 25 AS INT)),
                 i -> len(list_distinct(list_slice(t, i*25+1, i*25+25))) / 25.0))
             END AS sttr
      FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
           round(sum(CAST(round(ttr * 1000000, 0) AS BIGINT)) * 1.0
                 / 1000000 / count(*), 6) AS avg_ttr,
           round(sum(CAST(round(sttr * 1000000, 0) AS BIGINT)) * 1.0
                 / 1000000 / count(CASE WHEN sttr IS NOT NULL THEN 1 END), 6)
             AS avg_sttr
    FROM perdoc
    GROUP BY source
    ORDER BY source
    """,
)
def text_ttr_standardized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: raw type-token ratio (TTR, biased
    by length) and the STANDARDIZED TTR (mean distinct-ratio over fixed
    25-token chunks, the corpus-linguistics fix that makes sources of
    different document lengths comparable — the signal quality filters
    use to catch template/boilerplate text that a stopword ratio
    misses).

    Scale shape: explode-FREE (the r9 fold style) — per-doc TTR is
    array_distinct/size, per-doc STTR maps full 25-token windows
    through slice + array_distinct inside one ``transform`` and
    averages with ``aggregate``; the only shuffle is the |sources|-key
    rollup. Cross-doc means go through micro-unit integer sums (the
    ``_dsum`` parity contract)."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    chunk = 25
    n_chunks = (F.size(t) / chunk).cast("int")
    chunk_ratios = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.size(F.array_distinct(F.slice(t, i * chunk + 1, chunk))) / F.lit(float(chunk)),
    )
    sttr = F.when(
        F.size(t) >= chunk,
        F.aggregate(chunk_ratios, F.lit(0.0), lambda a, x: a + x) / n_chunks,
    )
    perdoc = docs.select(
        "source",
        (F.size(F.array_distinct(t)) * 1.0 / F.size(t)).alias("ttr"),
        n_chunks.alias("n_chunks"),
        sttr.alias("sttr"),
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.round(
                F.sum(F.round(F.col("ttr") * 1_000_000, 0).cast("long")) * 1.0
                / 1_000_000 / F.count(F.lit(1)),
                6,
            ).alias("avg_ttr"),
            F.round(
                F.sum(F.round(F.col("sttr") * 1_000_000, 0).cast("long")) * 1.0
                / 1_000_000 / F.count(F.col("sttr")),
                6,
            ).alias("avg_sttr"),
        )
        .orderBy("source")
    )


@register(
    "ml_langid_mcc",
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
    scalars AS (SELECT CAST(sum(n) AS BIGINT) AS s,
                       CAST(sum(CASE WHEN lang = pred THEN n ELSE 0 END) AS BIGINT) AS c
                FROM conf),
    rows_m AS (SELECT lang AS k, CAST(sum(n) AS BIGINT) AS t_k FROM conf GROUP BY lang),
    cols_m AS (SELECT pred AS k, CAST(sum(n) AS BIGINT) AS p_k FROM conf GROUP BY pred),
    m AS (SELECT COALESCE(r.k, c.k) AS k, COALESCE(t_k, 0) AS t_k, COALESCE(p_k, 0) AS p_k
          FROM rows_m r FULL OUTER JOIN cols_m c ON r.k = c.k),
    dots AS (SELECT CAST(sum(p_k * t_k) AS BIGINT) AS pt,
                    CAST(sum(p_k * p_k) AS BIGINT) AS pp,
                    CAST(sum(t_k * t_k) AS BIGINT) AS tt
             FROM m)
    SELECT s AS n,
           round((c * s - pt) * 1.0
                 / sqrt((s * s - pp) * 1.0) / sqrt((s * s - tt) * 1.0), 6) AS mcc
    FROM scalars, dots
    """,
)
def ml_langid_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class Matthews correlation coefficient of the langid
    heuristic — the single-number eval that stays honest under class
    imbalance (accuracy and even kappa degrade gracefully; MCC goes to
    0 for any trivial classifier): the R_k form
    MCC = (c·s − Σₖ pₖtₖ) / √(s²−Σpₖ²) / √(s²−Σtₖ²) over the confusion
    matrix. Completes the agreement family (accuracy → kappa → MCC)
    on exact integer margins.

    Scale shape: one scoring pass (the single-fold lang_scores) into
    the ≤|langs|² confusion table, persisted because the scalars and
    both margins derive from it; everything downstream is arithmetic on
    ≤6 rows. The margin join is full-outer — a label can be absent from
    either axis ('und' never true, 'zh' never predicted)."""
    from weather_tools_spark.operators.dedup import _persist

    docs = load_table(spark, "documents", sf_dir)
    conf = _persist(
        docs.select("lang", TX.lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scalars = conf.agg(
        F.sum("n").alias("s"),
        F.sum(F.when(F.col("lang") == F.col("pred"), F.col("n")).otherwise(0)).alias("c"),
    )
    rows_m = conf.groupBy(F.col("lang").alias("k")).agg(F.sum("n").alias("t_k"))
    cols_m = conf.groupBy(F.col("pred").alias("k")).agg(F.sum("n").alias("p_k"))
    m = rows_m.join(cols_m, "k", "full_outer").select(
        F.coalesce(F.col("t_k"), F.lit(0)).alias("t_k"),
        F.coalesce(F.col("p_k"), F.lit(0)).alias("p_k"),
    )
    dots = m.agg(
        F.sum(F.col("p_k") * F.col("t_k")).alias("pt"),
        F.sum(F.col("p_k") * F.col("p_k")).alias("pp"),
        F.sum(F.col("t_k") * F.col("t_k")).alias("tt"),
    )
    return scalars.crossJoin(F.broadcast(dots)).select(
        F.col("s").cast("long").alias("n"),
        F.round(
            (F.col("c") * F.col("s") - F.col("pt")) * 1.0
            / F.sqrt((F.col("s") * F.col("s") - F.col("pp")) * 1.0)
            / F.sqrt((F.col("s") * F.col("s") - F.col("tt")) * 1.0),
            6,
        ).alias("mcc"),
    )
