"""SparkSession factory tuned for both local testing and cluster scale.

The knobs below are chosen for the 100 TB design point and merely
*parameterized* for local runs:

- AQE on (runtime coalescing, skew-join splitting) so plans self-correct
  at scale without hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE coalescing makes the initial number non-critical.
- Arrow enabled so every Pandas-UDF boundary is columnar-batched.
- Session timezone pinned to UTC: the reference coerces tz-naive times to
  UTC (weather_mv/loader_pipeline/util.py:116-120) and the DuckDB oracle
  compares UTC-naive timestamps.
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the events table stores
  TIMESTAMP(NANOS) which Spark's vectorized parquet reader rejects;
  reading nanos as LongType keeps the native columnar scan + filter
  pushdown, and ``catalog.load_table`` converts to a microsecond
  TimestampType column (DuckDB performs the same ns→µs truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "weather_tools_spark"


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 4


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply the engine's standard config to any builder (including the
    driver-provided one)."""
    n = shuffle_partitions or default_parallelism()
    return (
        builder.config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Python DataSource filter pushdown (sources/datasource.py
        # absorbs lat/lon/time range predicates inside the decode task)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # spill-awareness at scale: 128 MB input splits keep a task's
        # working set well inside executor memory even for wide rows;
        # AQE's advisory size governs post-shuffle partition sizing
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 * 1024 * 1024))
    )


def get_spark(app_name: str = DEFAULT_APP_NAME, master: str | None = None) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[N]`` with N = SPARK_GRAFT_CPUS or the
    machine's core count; on a cluster, leave ``master`` unset and let
    spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{default_parallelism()}]"
    if master:
        builder = builder.master(master)
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    if master and master.startswith("local-cluster"):
        # real separate executor JVMs: their Python workers must import
        # this package (driver-side sys.path edits don't cross the
        # process boundary), and executor memory must fit the worker
        # grant declared in the master string
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).config(
            "spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g")
        )
    spark = configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
