"""LLM-training-data pipeline stages, wave 2: tokenizer training (BPE)
and named quality-rule filtering (Gopher-style), each mirrored in
portable SQL for the DuckDB oracle.

These extend the reference's data-prep surface (the reference has no
tokenizer or quality stage; SURVEY.md §2 extensions) with the stages a
real pretraining pipeline runs between raw text and packed sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.functions import text as TX
from weather_tools_spark.operators.bpe import bpe_fit, bpe_train
from weather_tools_spark.queries import register

# The oracle replays ALL THREE merge iterations: pair counting from the
# delimited symbol string, deterministic argmax (cnt DESC, lhs, rhs),
# then a RECURSIVE-CTE fixpoint that splices the FIRST occurrence per
# pass — which is provably equivalent to greedy left-to-right
# non-overlapping merging because a splice can never create an earlier
# match (the merged symbol contains no separator, so it can't act as
# either side of the pattern). The '_' separator is unambiguous: symbols
# come from an [a-z]+ extraction.
_BPE_STEP_TEMPLATE = """
p{k} AS (
  SELECT syms[i] AS lhs, syms[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, list_filter(str_split(seq, '_'), x -> x <> '') AS syms
        FROM v{prev}) s,
       unnest(generate_series(1, len(syms) - 1)) AS t(i)
  GROUP BY 1, 2
),
b{k} AS (SELECT lhs, rhs, cnt FROM p{k} ORDER BY cnt DESC, lhs, rhs LIMIT 1),
r{k} AS (
  SELECT word, freq, seq, 0 AS it FROM v{prev}
  UNION ALL
  SELECT word, freq,
         substr(seq, 1, strpos(seq, '_' || lhs || '_' || rhs || '_') - 1)
           || '_' || lhs || rhs || '_'
           || substr(seq, strpos(seq, '_' || lhs || '_' || rhs || '_')
                          + length('_' || lhs || '_' || rhs || '_')),
         it + 1
  FROM r{k}, b{k}
  WHERE strpos(seq, '_' || lhs || '_' || rhs || '_') > 0
),
v{k} AS (
  SELECT word, freq, seq FROM (
    SELECT word, freq, seq,
           row_number() OVER (PARTITION BY word ORDER BY it DESC) AS rn
    FROM r{k}
  ) WHERE rn = 1
),
a{k} AS (
  SELECT CAST(sum(len(list_filter(str_split(seq, '_'), x -> x <> '')) * freq)
              AS BIGINT) AS symbols_after
  FROM v{k}
)
"""

_BPE_ORACLE = (
    """
    WITH RECURSIVE words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents) u
      GROUP BY w
    ),
    v0 AS (
      SELECT word, freq, '_' || regexp_replace(word, '(.)', '\\1_', 'g') AS seq
      FROM words
    ),
    """
    + ",\n".join(
        _BPE_STEP_TEMPLATE.format(k=k, prev=k - 1) for k in (1, 2, 3)
    )
    + """
    SELECT * FROM (
      SELECT 1 AS step, lhs, rhs, lhs || rhs AS merged, cnt AS pair_freq,
             (SELECT symbols_after FROM a1) AS symbols_after FROM b1
      UNION ALL
      SELECT 2, lhs, rhs, lhs || rhs, cnt,
             (SELECT symbols_after FROM a2) FROM b2
      UNION ALL
      SELECT 3, lhs, rhs, lhs || rhs, cnt,
             (SELECT symbols_after FROM a3) FROM b3
    ) ORDER BY step
    """
)


@register("corpus_bpe_train", oracle=_BPE_ORACLE)
def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 3 BPE merges over the documents corpus — the tokenizer-
    training stage of an LLM data pipeline (engine addition; the
    reference has no tokenizer stage). Distributed pair counting over
    the vocabulary frame; the oracle replays every merge iteration with
    recursive-CTE fixpoints, so both the argmax AND the full greedy
    merge application are hash-gated (symbols_after is not derivable
    from pair_freq when occurrences overlap)."""
    docs = load_table(spark, "documents", sf_dir)
    return bpe_train(spark, docs, n_merges=3).orderBy("step")


_BPE_TOKENIZE_ORACLE = (
    """
    WITH RECURSIVE words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents) u
      GROUP BY w
    ),
    v0 AS (
      SELECT word, freq, '_' || regexp_replace(word, '(.)', '\\1_', 'g') AS seq
      FROM words
    ),
    """
    + ",\n".join(
        _BPE_STEP_TEMPLATE.format(k=k, prev=k - 1) for k in (1, 2, 3)
    )
    + """
    SELECT tok, CAST(sum(freq) AS BIGINT) AS n_occurrences
    FROM (
      SELECT freq, unnest(list_filter(str_split(seq, '_'), x -> x <> '')) AS tok
      FROM v3
    )
    GROUP BY tok ORDER BY n_occurrences DESC, tok LIMIT 20
    """
)


@register("corpus_bpe_tokenize", oracle=_BPE_TOKENIZE_ORACLE)
def corpus_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 3 learned BPE merges to the corpus and emit the top-20
    resulting token vocabulary (deterministic freq DESC, token ASC
    tie-break) — the train-then-apply half of the tokenizer stage. The
    token histogram comes straight off the fitted vocabulary frame
    (explode symbols, weight by word frequency — map-combinable), so at
    100 TB the corpus is still read exactly once."""
    docs = load_table(spark, "documents", sf_dir)
    _merges, fitted, base = bpe_fit(spark, docs, n_merges=3)
    out = (
        fitted.select("freq", F.explode("syms").alias("tok"))
        .groupBy("tok")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
        .limit(20)
    )
    from weather_tools_spark.operators.bounded import bounded_rows

    out = spark.createDataFrame(
        bounded_rows(out, 20, "top-20 BPE token table (limit(20) upstream)"),
        out.schema,
    )
    base.unpersist()
    return out


_GOPHER_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, source,
         len(toks) AS n_words,
         CAST(len(list_filter(toks,
              x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS stop_count,
         (SELECT CAST(coalesce(sum(length(x.tok)), 0) AS BIGINT)
          FROM unnest(toks) AS x(tok)) AS total_chars,
         (SELECT CAST(coalesce(max(c), 0) AS BIGINT)
          FROM (SELECT count(*) AS c FROM unnest(toks) AS x(tok)
                GROUP BY x.tok)) AS max_tok
  FROM t
),
f AS (
  SELECT source,
         CASE WHEN n_words NOT BETWEEN 15 AND 80 THEN 1 ELSE 0 END AS f_wc,
         CASE WHEN total_chars < 4 * n_words OR 10 * total_chars > 47 * n_words
              THEN 1 ELSE 0 END AS f_ml,
         CASE WHEN stop_count < 2 THEN 1 ELSE 0 END AS f_sw,
         CASE WHEN 5 * max_tok > n_words THEN 1 ELSE 0 END AS f_rep
  FROM m
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(f_wc) AS BIGINT) AS fail_wordcount,
       CAST(sum(f_ml) AS BIGINT) AS fail_meanlen,
       CAST(sum(f_sw) AS BIGINT) AS fail_stopword,
       CAST(sum(f_rep) AS BIGINT) AS fail_repetition,
       CAST(sum(CASE WHEN f_wc = 0 AND f_ml = 0 AND f_sw = 0 AND f_rep = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM f GROUP BY source ORDER BY source
"""


@register("corpus_gopher_rules", oracle=_GOPHER_ORACLE)
def corpus_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style named quality rules (Rae et al. 2021 §A1.1 shape):
    word-count range, mean-word-length range, minimum stopword evidence,
    top-token repetition cap — per-source failure counts + keep count.
    All rule arithmetic is INTEGER (mean-length and repetition
    thresholds are cross-multiplied), so the gate has no float boundary
    at any scale factor. The per-doc top-token count is the map-side
    sorted-run fold (functions/text.max_run_count — r9): O(n log n)
    per row in whole-stage codegen, replacing the r8 explode +
    two-level groupBy whose token-scale (doc, token) shuffle was the
    query's dominant term at sfx1.0."""
    from weather_tools_spark.functions.text import max_run_count

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.expr(r"filter(split(trim(text), '\\s+'), x -> x <> '')").alias("toks"),
    )
    m = toks.select(
        "doc_id",
        "source",
        F.size("toks").alias("n_words"),
        F.expr(
            "cast(size(filter(toks, x -> x IN ('the','a','of','and','to'))) as bigint)"
        ).alias("stop_count"),
        F.expr(
            "cast(aggregate(toks, 0L, (acc, x) -> acc + length(x)) as bigint)"
        ).alias("total_chars"),
        max_run_count(F.col("toks")).alias("max_tok"),
    ).filter(F.col("n_words") > 0)  # the r8 inner join dropped token-free docs
    f = m.select(
        "source",
        F.when(~F.col("n_words").between(15, 80), 1).otherwise(0).alias("f_wc"),
        F.when(
            (F.col("total_chars") < 4 * F.col("n_words"))
            | (10 * F.col("total_chars") > 47 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("f_ml"),
        F.when(F.col("stop_count") < 2, 1).otherwise(0).alias("f_sw"),
        F.when(5 * F.col("max_tok") > F.col("n_words"), 1).otherwise(0).alias("f_rep"),
    )
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_wc").cast("long").alias("fail_wordcount"),
            F.sum("f_ml").cast("long").alias("fail_meanlen"),
            F.sum("f_sw").cast("long").alias("fail_stopword"),
            F.sum("f_rep").cast("long").alias("fail_repetition"),
            F.sum(
                F.when(
                    (F.col("f_wc") == 0)
                    & (F.col("f_ml") == 0)
                    & (F.col("f_sw") == 0)
                    & (F.col("f_rep") == 0),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_keep"),
        )
        .orderBy("source")
    )


_SUBSTR_K = 40

_SUBSTR_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, length(text) AS nc, text,
         unnest(range(1, length(text) - {_SUBSTR_K} + 2)) AS p
  FROM documents
  WHERE length(text) >= {_SUBSTR_K}
),
grams AS (
  SELECT doc_id, nc, p, substr(text, p, {_SUBSTR_K}) AS g FROM pos
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) > 1
),
hits AS (
  SELECT doc_id, nc, p FROM grams WHERE g IN (SELECT g FROM dup)
),
isl AS (
  SELECT doc_id, nc, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                   <= {_SUBSTR_K} THEN 0 ELSE 1 END AS brk
  FROM hits
),
grp AS (
  SELECT doc_id, nc, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, nc, island,
         max(p) + {_SUBSTR_K} - min(p) AS covered
  FROM grp GROUP BY doc_id, nc, island
)
SELECT doc_id,
       CAST(nc AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(covered) AS BIGINT) AS dup_chars,
       round(CAST(sum(covered) AS DOUBLE) / nc, 6) AS dup_fraction
FROM spans GROUP BY doc_id, nc ORDER BY doc_id
"""


@register("corpus_exact_substring_dedup", oracle=_SUBSTR_ORACLE)
def corpus_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (the ExactSubstr stage of
    Lee et al. 2022, 'Deduplicating Training Data Makes Language Models
    Better'): every 40-char gram that occurs more than once corpus-wide
    marks its occurrences, and per document the marked start positions
    are merged into maximal covered spans (gaps-and-islands with a
    gap-of-k rule, so overlapping/adjacent grams union into one span) —
    yielding the exact number of duplicated characters per document.

    Scale topology: gram fan-out is length-linear (one row per start
    position, the suffix-array-free formulation); the duplicate-gram
    filter is one map-combinable count; coverage merge is a window
    partitioned per document (≤ doc length rows each). First positions
    of a gram count as duplicated too — matching the symmetric
    definition the oracle replays."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    k = _SUBSTR_K
    grams = (
        docs.filter(F.length("text") >= k)
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.explode(
                F.expr(f"sequence(1, length(text) - {k} + 1)")
            ).alias("p"),
            "text",
        )
        .select(
            "doc_id", "n_chars", "p", F.expr(f"substring(text, p, {k})").alias("g")
        )
    )
    dup = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
    hits = grams.join(dup.select("g"), "g", "left_semi").select(
        "doc_id", "n_chars", "p"
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = hits.withColumn(
        "brk",
        F.when(F.col("p") - F.lag("p").over(w) <= k, 0).otherwise(1),
    ).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = isl.groupBy("doc_id", "n_chars", "island").agg(
        (F.max("p") + k - F.min("p")).alias("covered")
    )
    return (
        spans.groupBy("doc_id", "n_chars")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("covered").alias("dup_chars"),
            F.round(
                F.sum("covered").cast("double") / F.col("n_chars"), 6
            ).alias("dup_fraction"),
        )
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            "n_spans",
            "dup_chars",
            "dup_fraction",
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_span_corruption_plan",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    plan AS (
      -- T5-style span corruption geometry at noise density 15%, mean
      -- span 3: n_spans = round(0.15 * n / 3) (at least 1 for docs
      -- with >= 7 tokens), masked = n_spans * 3 capped at n // 2,
      -- sentinel tokens = n_spans, target length = masked + n_spans.
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens >= 7
                  THEN greatest(1, CAST(floor((15 * n_tokens + 150) / 300) AS BIGINT))
                  ELSE 0 END AS n_spans
      FROM tok
    ),
    sized AS (
      SELECT doc_id, n_tokens, n_spans,
             least(n_spans * 3, n_tokens // 2) AS n_masked
      FROM plan
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN n_spans = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_too_short,
           CAST(sum(n_spans) AS BIGINT) AS total_spans,
           CAST(sum(n_masked) AS BIGINT) AS total_masked,
           CAST(sum(n_tokens - n_masked + n_spans) AS BIGINT) AS input_len_total,
           CAST(sum(n_masked + n_spans) AS BIGINT) AS target_len_total,
           round(sum(n_masked) * 1.0 / sum(n_tokens), 6) AS mask_rate
    FROM sized
    """,
)
def corpus_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLANNING over the corpus: for each
    document, how many length-3 spans a 15% noise density masks
    (integer arithmetic: round(0.15*n/3) computed cross-multiplied as
    floor((15n+150)/300), capped at half the doc), and the resulting
    encoder-input / decoder-target token budgets including one sentinel
    per span — the pretraining-batch accounting a seq2seq data pipeline
    must produce before materializing examples. Token counts are the
    whitespace-regexp integers of the tokenizer family; one map-side
    pass, one global rollup, everything BIGINT until the final
    mask-rate division."""
    docs = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    tok = docs.select(n_tokens.alias("n_tokens"))
    n_spans = F.when(
        F.col("n_tokens") >= 7,
        F.greatest(
            F.lit(1), F.floor((15 * F.col("n_tokens") + 150) / 300).cast("long")
        ),
    ).otherwise(0)
    sized = tok.withColumn("n_spans", n_spans).withColumn(
        "n_masked",
        F.least(F.col("n_spans") * 3, F.floor(F.col("n_tokens") / 2).cast("long")),
    )
    return sized.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("n_spans") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_too_short"),
        F.sum("n_spans").cast("long").alias("total_spans"),
        F.sum("n_masked").cast("long").alias("total_masked"),
        F.sum(F.col("n_tokens") - F.col("n_masked") + F.col("n_spans"))
        .cast("long")
        .alias("input_len_total"),
        F.sum(F.col("n_masked") + F.col("n_spans"))
        .cast("long")
        .alias("target_len_total"),
        F.round(F.sum("n_masked") * 1.0 / F.sum("n_tokens"), 6).alias("mask_rate"),
    )
