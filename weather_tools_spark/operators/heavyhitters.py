"""Distributed heavy-hitters (frequent items) with a provable merge
guarantee — the frequency-sketch companion to the HLL/quantile sketches
(queries/audits.py).

Why not exact groupBy-count? For bounded key domains exact is cheap and
already covered (text_top_terms). Heavy hitters matter when the key
cardinality is itself data-scale (URLs, n-grams, user agents at 100 TB):
a full groupBy materializes every distinct key through the shuffle,
while a per-partition summary ships only O(partitions × capacity) rows.

Guarantee (per-partition top-C truncation, Misra-Gries flavored): at
most C-1 keys can exceed a 1/C share of a partition, so every key whose
TOTAL frequency exceeds n/C must exceed n_p/C in at least one partition
(else its total would be ≤ Σ n_p/C = n/C) and therefore survives that
partition's top-C cut. Merged candidate counts are LOWER bounds (mass
truncated in non-emitting partitions is lost, never invented), so
``candidate_count ≤ true_count`` always holds. Both properties are
asserted by the driver-checked audit query (text_heavy_hitters_audit).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def heavy_hitter_candidates(df: DataFrame, key_col: str, capacity: int = 64) -> DataFrame:
    """Candidate heavy hitters: per-partition exact counting truncated
    to the top-``capacity`` keys (Arrow-batched; the per-partition state
    is one dict bounded by the partition's distinct keys — for truly
    unbounded domains swap the dict for SpaceSaving eviction, same
    emitted schema), merged by summing per-partition counts.

    Output: (key, cnt_lb) where cnt_lb ≤ true count, and every key with
    true count > n/capacity is guaranteed present."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for k, c in pdf[key_col].value_counts().items():
                ks = str(k)
                counts[ks] = counts.get(ks, 0) + int(c)
        if counts:
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:capacity]
            yield pd.DataFrame({"key": [k for k, _ in top], "cnt": [c for _, c in top]})

    summaries = df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, _SUMMARY_SCHEMA
    )
    return summaries.groupBy("key").agg(F.sum("cnt").alias("cnt_lb"))
