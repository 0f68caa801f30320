"""BPE merge-training operator: the distributed Spark fold must
reproduce the classic greedy left-to-right non-overlapping merge
semantics exactly (pinned against a pure-Python reference), including
the overlap case where pair_freq over-counts mergeable occurrences."""

from __future__ import annotations

import pytest

from weather_tools_spark.operators.bpe import (
    bpe_train,
    bpe_train_python,
)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


def _word_freq(texts):
    import re

    freq: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            freq[w] = freq.get(w, 0) + 1
    return freq


def _assert_matches_python(spark, texts, n_merges):
    got = [tuple(r) for r in bpe_train(spark, _docs(spark, texts), n_merges).orderBy("step").collect()]
    want = [
        (m.step, m.lhs, m.rhs, m.merged, m.pair_freq, m.symbols_after)
        for m in bpe_train_python(_word_freq(texts), n_merges)
    ]
    assert got == want


def test_bpe_simple_corpus(spark):  # noqa: F811
    _assert_matches_python(
        spark, ["low lower lowest", "newer newest wider", "low low new"], 4
    )


def test_bpe_overlapping_runs(spark):  # noqa: F811
    # 'aaaa': pair (a,a) counts 3 occurrences but greedy merges only 2 —
    # symbols_after certifies the fold, not just the counter.
    texts = ["aaaa aaa aa baab"]
    _assert_matches_python(spark, texts, 2)
    merges = bpe_train_python(_word_freq(texts), 1)
    m = merges[0]
    assert (m.lhs, m.rhs) == ("a", "a")
    # 11 symbols before; greedy merges: aaaa->2, aaa->1, aa->1, baab->1 = 5
    # removed, but pair count is 3+2+1+1 = 7 > 5.
    assert m.pair_freq == 7
    assert m.symbols_after == 13 - 5


def test_bpe_tie_break_deterministic(spark):  # noqa: F811
    # 'ab' and 'ba' pairs tie; (a,b) < (b,a) lexicographically must win.
    texts = ["ab ab ba ba"]
    got = bpe_train(spark, _docs(spark, texts), 1).collect()[0]
    assert (got["lhs"], got["rhs"]) == ("a", "b")
    _assert_matches_python(spark, texts, 2)


def test_bpe_merged_symbol_participates_in_later_merges(spark):  # noqa: F811
    # After merging (l,o)->lo, the next merges can use 'lo' as a side.
    texts = ["lolo lolo lol"]
    _assert_matches_python(spark, texts, 3)


def test_bpe_exhausts_gracefully(spark):  # noqa: F811
    # Single-char vocabulary: no pairs at all -> empty merge table.
    out = bpe_train(spark, _docs(spark, ["a b c a b"]), 3)
    assert out.count() == 0


@pytest.mark.parametrize("n", [1, 3])
def test_bpe_registry_query_schema(spark, n):  # noqa: F811
    df = bpe_train(spark, _docs(spark, ["the theme there then"]), n)
    assert [f.name for f in df.schema.fields] == [
        "step", "lhs", "rhs", "merged", "pair_freq", "symbols_after",
    ]
    rows = df.orderBy("step").collect()
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
