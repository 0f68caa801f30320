"""Table catalog for the engine's relational model.

The reference's analytic data model is a flat, de-normalized long-format
table (weather_mv/loader_pipeline/bq.py:338-386 flattens hypercubes into
rows; SURVEY.md §1.1-B).  In the Spark build that model is simply a
DataFrame over columnar parquet — scans get predicate pushdown, column
pruning and partition pruning from Catalyst for free.

This module loads the driver-provided test tables and registers them as
temp views so both the DataFrame and SQL surfaces can address them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Parquet schema memo, keyed by resolved table path (r13, guide §1.2 /
# §7.3 "very large plans / planning time"): `spark.read.parquet(path)`
# infers the schema by opening file footers on EVERY call — measured
# ~90 ms per call at sf0.1, paid 1-4x per query build, ~40-80 s across
# one 193-query bench run. The memo holds CATALOG METADATA only (a
# StructType — the same thing a Hive metastore serves), never rows or
# results: every query still computes from the parquet inputs. Keyed on
# the absolute path so different SF dirs coexist; StructType is
# session-independent, so session restarts within a process reuse it.
# The driver's own test tables are immutable per round; a caller that
# rewrites a table in place mid-process (nothing in the repo does)
# would need to clear this dict.
_SCHEMA_MEMO: dict[str, "object"] = {}


def _ensure_nanos_as_long(spark: SparkSession) -> None:
    # The events table stores TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects unless nanos are surfaced as longs. Runtime-settable,
    # so apply it to whatever session we were handed. The session
    # timezone is pinned to UTC for the same reason: time-bucket
    # formatting must agree with the UTC-naive oracle regardless of the
    # host machine's timezone.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table as a DataFrame with engine-canonical types.

    ``events.ts`` arrives as nanoseconds-since-epoch (long) and is
    converted to a microsecond timestamp — the identical truncation DuckDB
    applies, so oracle comparisons line up. The conversion happens *after*
    the scan node, so pushdown on the remaining columns is unaffected.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    _ensure_nanos_as_long(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = os.path.abspath(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
    else:
        # schema known: skip footer-based inference (~90 ms/call); the
        # scan itself is unchanged — same columns, same physical types
        df = spark.read.schema(schema).parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        # TIMESTAMP(NANOS) storage surfaced as long via nanosAsLong.
        # Keep the raw nanos column: predicates on the *computed* ts
        # column cannot reach the parquet scan, but `ts_ns` comparisons
        # push down as ordinary long filters (see events_time_between).
        # Integer division (`div`), NOT float division: (ts/1000).cast('long')
        # routes through double precision and lands ~1.6% of rows 1µs off
        # vs DuckDB's exact integer truncation, breaking the hash gate.
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif name == "events" and ts_type == "timestamp_ntz":
        # timestamp[us] storage (isAdjustedToUTC=false) reads as
        # TIMESTAMP_NTZ. The engine canonicalizes to TIMESTAMP (LTZ) —
        # the session timezone is pinned UTC above, so the cast is a
        # pure re-tag with identical wall-clock values and identical
        # string form vs the naive DuckDB oracle. `ts_scan` keeps the
        # untouched scan attribute so range predicates still reach the
        # parquet scan (see events_time_between); `ts_ns` stays
        # available with the same nanos-since-epoch semantics as the
        # nanos-storage branch.
        df = (
            df.withColumn("ts_scan", F.col("ts"))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
        )
    return df


def events_time_between(df: DataFrame, start: str | None = None, end: str | None = None) -> DataFrame:
    """Time-range filter for the events table that actually pushes down.

    Emits the predicate twice: on the computed ``ts`` timestamp (the
    semantic filter) and on the raw ``ts_ns`` long (identical bound ×1e9,
    which Catalyst pushes into the parquet scan as a plain long
    comparison → row-group pruning at scale). [start, end) semantics.
    """
    import pandas as pd

    # Pick the twin that is an untouched scan attribute for this storage
    # flavor: raw long nanos (TIMESTAMP(NANOS) storage) or the NTZ scan
    # column (timestamp[us] storage). Predicates on computed columns
    # never reach the parquet scan.
    ntz_twin = "ts_scan" in df.columns
    if start is not None:
        ns = int(pd.Timestamp(start).value)
        twin = (
            F.col("ts_scan") >= F.lit(start).cast("timestamp_ntz")
            if ntz_twin
            else F.col("ts_ns") >= F.lit(ns)
        )
        df = df.filter((F.col("ts") >= F.lit(start).cast("timestamp")) & twin)
    if end is not None:
        ns = int(pd.Timestamp(end).value)
        twin = (
            F.col("ts_scan") < F.lit(end).cast("timestamp_ntz")
            if ntz_twin
            else F.col("ts_ns") < F.lit(ns)
        )
        df = df.filter((F.col("ts") < F.lit(end).cast("timestamp")) & twin)
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None, tables: tuple[str, ...] = TABLES) -> None:
    """Register every test table as a temp view for the SQL surface."""
    for name in tables:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
