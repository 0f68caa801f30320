"""Runtime-enforced bounded driver materialization.

Every ``collect()``/``toPandas()`` in this package is bounded *by
construction* (a 1-row aggregate, a k-row centroid table, a
chunk-manifest whose cardinality is the chunk GRID, never the data).
These helpers turn that code-review contract into an enforced
invariant: the fetch goes through ``limit(n + 1)``, so the driver can
never materialize more than ``n`` rows (+1 probe row) even when the
bound reasoning is wrong — it fails loudly with the documented reason
instead of silently ballooning the driver heap at scale.

This is the same bounded-probe idea the exact-cosine kernels use to
decide broadcast vs blocked delegation (operators/similarity.py): a
``limit(n+1)`` scan is cheap and data-volume-independent, because the
limit is pushed into the scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Row


class BoundExceeded(RuntimeError):
    """A driver-side materialization exceeded its documented bound."""


def bounded_rows(df: DataFrame, n: int, why: str) -> list[Row]:
    """``df.collect()`` that PROVES the result is ≤ ``n`` rows.

    Fetches through ``limit(n + 1)`` — the driver never holds more than
    ``n + 1`` rows regardless of the input's true cardinality — and
    raises :class:`BoundExceeded` naming ``why`` when the probe row
    shows up. Use at every site whose collect is bounded by
    construction; the bound and its reason then live in the call."""
    rows = df.limit(n + 1).collect()
    if len(rows) > n:
        raise BoundExceeded(
            f"bounded collect exceeded: {why} was documented to produce "
            f"<= {n} rows but has more — the bound reasoning is stale"
        )
    return rows


def bounded_pandas(df: DataFrame, n: int, why: str) -> pd.DataFrame:
    """``df.toPandas()`` with the same enforced row bound as
    :func:`bounded_rows` (Arrow path preserved)."""
    pdf = df.limit(n + 1).toPandas()
    if len(pdf) > n:
        raise BoundExceeded(
            f"bounded toPandas exceeded: {why} was documented to produce "
            f"<= {n} rows but has more — the bound reasoning is stale"
        )
    return pdf
