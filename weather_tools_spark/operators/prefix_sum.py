"""Distributed prefix (running) sum over a total order — without the
single-partition Window.

``sum().over(Window.orderBy(...))`` with no partition key moves the
whole dataset into ONE task (Spark even warns); at 100 TB that is not a
plan. The classic fix is the two-pass prefix sum:

1. range-partition by the order key (so partition i holds a contiguous
   key range, all less than partition i+1) and sort within partitions;
2. pass A: per-partition local cumulative sums + one (partition, total)
   row each — the totals frame is O(partitions), collected to the
   driver (bounded by cluster width, not data size);
3. pass B: broadcast each partition's prefix offset (sum of totals of
   all earlier partitions) and add it to the local cumsums map-side.

The result is deterministic for any partition-boundary placement as
long as (order_cols) is a TOTAL order — the running sum at a row
depends only on the set of rows ordered before it, which range
partitioning preserves by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running sum of ``value_col`` over the total order given by
    ``order_cols`` (must be tie-free for a well-defined result), as a
    new long column ``out_col``. Two passes, no global shuffle beyond
    the range partitioning the sort needs anyway."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(*order_cols)

    out_fields = ordered.schema.fields + [
        T.StructField("_pid", T.IntegerType()),
        T.StructField("_local_cumsum", T.LongType()),
    ]
    out_schema = T.StructType(out_fields)

    def local_cumsum(batches: Iterator) -> Iterator:
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            vals = pdf[value_col].astype("int64")
            cs = vals.cumsum() + acc
            acc = int(cs.iloc[-1]) if len(cs) else acc
            pdf = pdf.copy()
            pdf["_pid"] = pd.Series([pid] * len(pdf), dtype="int32")
            pdf["_local_cumsum"] = cs.astype("int64")
            yield pdf

    with_local = ordered.mapInPandas(local_cumsum, out_schema)
    # Pass A output is reused by the totals aggregate and pass B;
    # localCheckpoint severs recomputation (range partitioning would
    # otherwise rerun, and its sampled boundaries must match between
    # the totals and the final pass).
    with_local = with_local.localCheckpoint(eager=False)

    # partition total = sum of the values (NOT max of the cumsum — with
    # negative values the running sum is not monotone)
    from weather_tools_spark.operators.bounded import bounded_rows

    totals = {
        r._pid: r.total
        for r in bounded_rows(
            with_local.groupBy("_pid").agg(
                F.sum(F.col(value_col).cast("long")).alias("total")
            ),
            n_parts,
            "per-partition prefix-sum totals (one row per range partition)",
        )
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("_pid")
    )
    return with_local.withColumn(
        out_col, (F.col("_local_cumsum") + F.coalesce(offset_col, F.lit(0))).cast("long")
    ).drop("_pid", "_local_cumsum")
