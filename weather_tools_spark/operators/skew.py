"""Skew-mitigation operators for hot join keys.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew automatically at runtime; ``salted_join`` is the explicit fallback
for the cases AQE can't re-plan — e.g. a broadcast-ineligible dimension
joined on a key where one value carries a large share of the fact rows.

Technique (standard): replicate each small-side row R times with salt
0..R-1; append a random-but-deterministic salt (hash-mod, so results
are reproducible) to each big-side row; equi-join on (key, salt). Every
hot key's rows spread across R tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with ``salt``-way key
    spreading. Semantically identical to ``big.join(small, on, how)``
    for equi-joins (each big row matches exactly one replicated small
    row). Salt is ``xxhash64`` of the whole row's key + a row-local
    component, deterministic across runs."""
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    return (
        salted_big.join(exploded_small, [on, "__salt"], how)
        .drop("__salt")
    )
