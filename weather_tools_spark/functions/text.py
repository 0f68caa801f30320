"""Text-analysis column functions for training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All pure JVM-side expressions (split / regexp / higher-order array
functions) — the hot path over a 100 TB documents table must stay inside
whole-stage codegen, not Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Real pipelines plug in fastText etc.; the
# engine-level contract is "argmax of per-language evidence", which this
# implements deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "pas"),
    "es": ("el", "los", "las", "y", "no"),
}


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization (regex-based so repeated spaces are safe)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count word-and-punctuation units, the standard
    pre-tokenizer regex family."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def avg_token_len(text: Column) -> Column:
    toks = word_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    toks = word_tokens(text)
    lst = ", ".join(f"'{s}'" for s in stopwords)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    _ = lst  # stopwords inlined via isin; lst kept for SQL-surface parity docs
    return hits.cast("double") / F.size(toks)


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[\w\s]+", ""))
    return n_punct.cast("double") / F.length(text)


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0,1]: rewards moderate length
    and real-word structure, penalizes punctuation soup — the standard
    shape of cheap quality filters in data pipelines."""
    ntok = token_count(text)
    length_score = F.least(ntok / F.lit(100.0), F.lit(1.0))
    alpha_ratio = 1.0 - punct_ratio(text)
    stop = stopword_ratio(text)
    stop_score = F.least(stop * 5.0, F.lit(1.0))
    return F.round((length_score + alpha_ratio + stop_score) / 3.0, 6)


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    # NB: a plain closure, not a default-arg lambda — a two-parameter
    # lambda would be interpreted by Spark as the (element, index) form.
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts — ONE fold over the token array
    accumulating all languages' counts in a struct (r9; was one
    ``filter`` pass per language, i.e. |langs| array traversals per
    document). The repeated struct subexpression collapses under
    Spark's subexpression elimination, so the array is walked once."""
    toks = word_tokens(text)
    langs = sorted(LANG_MARKERS)
    init = F.struct(*[F.lit(0).alias(lang) for lang in langs])

    def merge(acc, t):
        return F.struct(
            *[
                (
                    acc[lang]
                    + F.when(t.isin(*LANG_MARKERS[lang]), 1).otherwise(0)
                ).alias(lang)
                for lang in langs
            ]
        )

    folded = F.aggregate(toks, init, merge)
    return {lang: folded[lang] for lang in langs}


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; 'und' (undetermined) when no
    markers hit. Deterministic tie-break by language code order.

    r12 optimization (guide §7.2 — plan size): the argmax runs in the
    marker-fold's FINISHER, so the (large) fold expression appears in
    the tree exactly once. The old nested-when chain referenced the
    fold ~2·|langs| times, multiplying the analyzed expression tree —
    pure plan-construction overhead for every langid consumer.
    Identical values: array_max over (score, -index) structs is max
    score with alphabetically-first tie-break (langs sorted ascending),
    and 'und' still wins unless some score is strictly positive."""
    toks = word_tokens(text)
    langs = sorted(LANG_MARKERS)
    init = F.struct(*[F.lit(0).alias(lang) for lang in langs])

    def merge(acc, t):
        return F.struct(
            *[
                (
                    acc[lang]
                    + F.when(t.isin(*LANG_MARKERS[lang]), 1).otherwise(0)
                ).alias(lang)
                for lang in langs
            ]
        )

    names = F.array(*[F.lit(lang) for lang in langs])

    def finish(acc):
        cand = F.array(
            *[
                F.struct(acc[lang].alias("s"), F.lit(-i).alias("nidx"))
                for i, lang in enumerate(langs)
            ]
        )
        best = F.array_max(cand)
        return F.when(
            best["s"] > 0, F.element_at(names, -best["nidx"] + 1)
        ).otherwise(F.lit("und"))

    return F.aggregate(toks, init, merge, finish)


def fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: sorted distinct tokens, md5'd — a
    set-normalized document key (token-order-insensitive)."""
    toks = F.array_sort(F.array_distinct(word_tokens(F.lower(text))))
    return F.md5(F.concat_ws(" ", toks))


def max_run_count(arr: Column) -> Column:
    """Count of the most frequent element of an array — computed
    map-side as the longest run of equal adjacent elements after
    ``array_sort`` (O(n log n) per row, whole-stage codegen), so
    per-document token-mode statistics need NO token-scale
    explode + groupBy(doc, token) shuffle. Empty arrays yield 0.

    The fold state is a (prev, run, best) struct threaded through
    ``F.aggregate``; the finisher projects ``best``. Works for any
    orderable element type: the zero's ``prev`` is seeded from the
    array's own first element (so its Catalyst type matches the merge
    result type), which also leaves the first iteration's run at 1."""
    sorted_arr = F.array_sort(arr)

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    init = F.struct(
        # element-typed zero (try_element_at: NULL, not an ANSI error,
        # on empty arrays — the fold never runs there and best stays 0);
        # for a non-empty array the first x equals this seed, so run
        # becomes 0+1 = 1 exactly as a NULL seed would give
        F.try_element_at(sorted_arr, F.lit(1)).alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    return F.aggregate(sorted_arr, init, merge, lambda acc: acc["best"])
