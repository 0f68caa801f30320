"""Distributed BPE merge training (byte-pair-encoding tokenizer learning).

The classic tokenizer-training stage of an LLM data pipeline (Sennrich et
al. 2016; GPT-2's BPE): represent every distinct word as a symbol
sequence (initially characters), repeatedly count adjacent-symbol pairs
weighted by word frequency, merge the most frequent pair everywhere
(greedy left-to-right, non-overlapping), and record the learned merge
table.

Spark-first shape — the expensive part is fully distributed and
map-combinable:

- The corpus is read ONCE into a ``(word, freq)`` vocabulary frame
  (groupBy word — partial aggregation applies, so at 100 TB the shuffle
  carries distinct words per partition, not tokens).
- Every merge iteration runs pair counting + merge application on the
  VOCABULARY frame (|distinct words|, orders of magnitude smaller than
  the corpus), never re-touching documents.
- Per iteration the driver collects exactly ONE row (the argmax pair)
  and ONE scalar (the post-merge symbol count) — bounded O(n_merges)
  driver traffic, same contract as the k-means partial-sum collects.
- Merge application is a pure JVM ``aggregate()`` fold over the symbol
  array (greedy non-overlapping semantics proven in tests against a
  Python reference implementation); no Python stage anywhere.

The argmax tie-break is fully deterministic: count DESC, lhs ASC,
rhs ASC.

Reference parity note: the weather-tools reference has no tokenizer
stage; this is an engine addition for the LLM-training-data surface
(SURVEY.md §2 extensions), sitting beside text_bpe_token_counts which
*applies* a fixed regex tokenizer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class BpeMerge:
    step: int
    lhs: str
    rhs: str
    merged: str
    pair_freq: int
    symbols_after: int


MERGE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType(), False),
        T.StructField("lhs", T.StringType(), False),
        T.StructField("rhs", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_freq", T.LongType(), False),
        T.StructField("symbols_after", T.LongType(), False),
    ]
)

# Adjacent-pair fan-out guarded against 1-symbol words (sequence(1,0)
# would count DOWN in Spark SQL, so the guard is load-bearing).
_PAIRS_EXPR = """
CASE WHEN size(syms) < 2 THEN cast(array() as array<struct<lhs:string,rhs:string>>)
     ELSE transform(sequence(1, size(syms) - 1),
                    i -> struct(element_at(syms, cast(i as int)) AS lhs,
                                element_at(syms, cast(i + 1 as int)) AS rhs))
END
"""


def _merge_fold_expr(lhs: str, rhs: str, merged: str) -> str:
    """Greedy left-to-right non-overlapping merge of (lhs, rhs) -> merged
    as a pure JVM fold. Safe to inline: symbols originate from an
    ``[a-z]+`` extraction, so no SQL escaping is possible."""
    return f"""
    aggregate(syms, cast(array() as array<string>),
      (acc, x) -> CASE WHEN size(acc) > 0
                         AND element_at(acc, -1) = '{lhs}'
                         AND x = '{rhs}'
                  THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))
                  ELSE concat(acc, array(x)) END)
    """


def build_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) vocabulary with word split into initial
    character symbols. The single pass that touches the full corpus."""
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.withColumn(
        "syms", F.expr("filter(split(word, ''), x -> x <> '')")
    )


def bpe_fit(
    spark: SparkSession, docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[BpeMerge], DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, final_vocab,
    persisted_base): ``final_vocab`` is the (word, freq, syms) frame
    AFTER all merges are applied — the fitted tokenizer state — and
    ``persisted_base`` must be unpersisted by the caller once derived
    results are materialized."""
    vocab = build_vocab(docs, text_col).persist()
    # r12 optimization (guide §1.2 — one driver action per iteration):
    # the argmax pair and the TOTAL adjacent-pair count ride one
    # single-row aggregate (min over (-cnt, lhs, rhs) structs is exactly
    # the old count DESC, lhs ASC, rhs ASC ordering; no sort+limit
    # stage). The total gives the PREVIOUS step's symbols_after for
    # free: symbols(k-1) = Sigma_w size_w*f_w = Sigma adjacent-pair
    # counts at step k + Sigma f_w (each word contributes size-1 pairs),
    # so only the final step pays a dedicated symbol-count job. 2 jobs
    # per merge step -> 1 (+1 at the end), and the top-1 sort exchange
    # disappears.
    f_total = vocab.agg(F.sum("freq")).collect()[0][0] or 0
    merges: list[BpeMerge] = []
    pend: dict | None = None
    cur = vocab
    for step in range(1, n_merges + 1):
        agg = (
            cur.where(F.expr("size(syms) >= 2"))
            .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("cnt"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("lhs"),
                        F.col("rhs"),
                    )
                ).alias("best"),
                F.sum("cnt").alias("total"),
            )
            .collect()[0]  # bounded: exactly one row per merge step
        )
        if pend is not None:
            merges.append(
                BpeMerge(symbols_after=int((agg["total"] or 0) + f_total), **pend)
            )
            pend = None
        if agg["best"] is None:
            break
        lhs, rhs = agg["best"]["lhs"], agg["best"]["rhs"]
        merged = lhs + rhs
        cur = cur.withColumn("syms", F.expr(_merge_fold_expr(lhs, rhs, merged)))
        pend = {
            "step": step,
            "lhs": lhs,
            "rhs": rhs,
            "merged": merged,
            "pair_freq": int(-agg["best"]["nc"]),
        }
    if pend is not None:
        symbols_after = cur.agg(
            F.sum(F.size("syms") * F.col("freq")).alias("s")
        ).collect()[0]["s"]  # bounded: one scalar, final step only
        merges.append(BpeMerge(symbols_after=int(symbols_after), **pend))
    return merges, cur, vocab


def bpe_train(
    spark: SparkSession, docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, lhs, rhs, merged, pair_freq, symbols_after)."""
    merges, _final, base = bpe_fit(spark, docs, n_merges, text_col)
    base.unpersist()
    return spark.createDataFrame(
        [
            (m.step, m.lhs, m.rhs, m.merged, m.pair_freq, m.symbols_after)
            for m in merges
        ],
        MERGE_SCHEMA,
    )


def bpe_train_python(word_freq: dict[str, int], n_merges: int) -> list[BpeMerge]:
    """Pure-Python reference twin (used by tests to certify the Spark
    fold's greedy non-overlapping semantics)."""
    vocab: dict[str, tuple[list[str], int]] = {
        w: (list(w), f) for w, f in word_freq.items()
    }
    out: list[BpeMerge] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = lhs + rhs
        for w, (syms, f) in vocab.items():
            new: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = (new, f)
        symbols_after = sum(len(s) * f for s, f in vocab.values())
        out.append(BpeMerge(step, lhs, rhs, merged, cnt, symbols_after))
    return out
