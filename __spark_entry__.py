"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry from
``weather_tools_spark.queries`` (one entry per implemented operator,
SURVEY.md §2 + LLM-data-pipeline extensions; see COVERAGE.md for the
line-by-line map). The six approximate/hash-seeded operators
(MinHash-LSH, SimHash, winnowing, sign-LSH ANN, IVF ANN, sketches)
intentionally have no oracle entry — the driver records the weaker
rows-only check for those, and tests/test_dedup_similarity.py gates
their recall against the exact operators instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing-summary shape) on sf0.001."""
    from weather_tools_spark.queries import SPARK

    return SPARK["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from weather_tools_spark.queries import SPARK

    return dict(SPARK)


def oracle_sql() -> dict[str, str]:
    from weather_tools_spark.queries import ORACLE

    return dict(ORACLE)
