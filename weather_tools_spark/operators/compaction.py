"""Small-file compaction for parquet directories.

The reference's pipelines write one object per download/split
(weather_dl partition fan-out, weather_sp per-variable splitting), so a
long-running deployment accumulates millions of small files — the
classic scan-killer: each file costs a task launch, a footer read, and
an object-store request, and at 100 TB a 1 MB-average directory means
~10^8 tasks per scan. Compaction rewrites a directory to
target-sized files.

Spark-first shape:

- **coalesce mode (default)**: narrow dependency — each output task
  concatenates whole input splits, so compacting N TB moves N TB
  through tasks but through **no shuffle** (no hash, no sort, no
  network re-bucketing beyond locality). This is the right plan when
  the goal is purely fewer files.
- **shuffle mode**: full ``repartition`` — pays one all-to-all exchange
  to also fix skew (coalesce keeps pre-existing imbalance: an output
  file is the sum of whatever inputs it swallowed).

Output file count is sized from the *actual* directory bytes (Hadoop
FileSystem listing — works on local, HDFS, or object stores), not a
guess, so the same call self-adapts from sf0.001 to 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def directory_stats(spark: SparkSession, path: str, suffix: str = ".parquet") -> dict:
    """File count / byte totals for a data directory via the Hadoop
    FileSystem API (FS-agnostic: local, HDFS, S3A, GCS connectors all
    answer the same listStatus call). Driver-side metadata only — no
    data is read."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = [
        st.getLen()
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(suffix)
    ]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def plan_output_files(total_bytes: int, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Number of output files that lands each near the target size."""
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "coalesce",
) -> dict:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    target-sized files. Returns before/after stats.

    ``mode='coalesce'`` narrows partitions without a shuffle (cheapest;
    keeps input skew). ``mode='shuffle'`` pays one round-robin exchange
    to also rebalance. Compression typically shrinks rewritten files
    below target — the sizing intentionally errs toward fewer, larger
    files, which is the direction that helps scans."""
    before = directory_stats(spark, src)
    n_out = plan_output_files(before["total_bytes"], target_file_bytes)
    df: DataFrame = spark.read.parquet(src)
    if mode == "coalesce":
        out = df.coalesce(n_out)
    elif mode == "shuffle":
        out = df.repartition(n_out)
    else:
        raise ValueError(f"unknown compaction mode: {mode!r}")
    out.write.mode("overwrite").parquet(dst)
    after = directory_stats(spark, dst)
    return {"before": before, "after": after, "planned_files": n_out, "mode": mode}
