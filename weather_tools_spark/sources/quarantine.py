"""Corrupt-record quarantine for semi-structured ingest (JSON feeds).

The reference's ingest pipelines assume well-formed files and crash on
malformed records; a 100 TB feed always contains some. Spark-native
pattern: read the feed as raw text and parse with ``from_json`` in
PERMISSIVE mode with a corrupt-record capture field — malformed lines
surface the raw text in that field, clean rows flow to the pipeline,
and the quarantine branch carries enough context to reprocess. One
scan, no pre-validation pass, and — unlike the top-level JSON reader's
``_corrupt_record`` column, which Spark refuses to filter on without
caching the parsed frame
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — parsing from
a text column carries no such restriction and works identically under
``readStream`` for a continuous dead-letter queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON against ``schema``; return
    ``(good, quarantined)``.

    - good: schema columns, rows whose line parsed as JSON (fields that
      fail type coercion come back null — PERMISSIVE semantics);
    - quarantined: the raw malformed line + source file + ingest
      timestamp (the reprocessing context a dead-letter queue needs).
    """
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.from_json(
            "value",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("data"),
    )
    corrupt = F.col(f"data.{CORRUPT_COL}")
    good = raw.filter(corrupt.isNull()).select(
        *[f"data.{f.name}" for f in schema.fields]
    )
    quarantined = raw.filter(corrupt.isNotNull()).select(
        corrupt.alias("raw_record"),
        "source_file",
        F.current_timestamp().alias("quarantined_at"),
    )
    return good, quarantined


def quarantine_summary(good: DataFrame, quarantined: DataFrame) -> DataFrame:
    """One-row ingest health report (counts + malformed fraction)."""
    n_good = good.count()
    n_bad = quarantined.count()
    total = n_good + n_bad
    spark = good.sparkSession
    return spark.createDataFrame(
        [(n_good, n_bad, total, round(n_bad / total, 6) if total else 0.0)],
        "n_good long, n_quarantined long, n_total long, malformed_rate double",
    )
