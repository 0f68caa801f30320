"""NL→SQL surface (weather_lm parity, SURVEY.md §2.12).

The reference routes natural-language questions through Gemini with a
dataset-metadata prompt, then executes the produced SQL via xql
(xql/src/weather_lm/gemini.py). The engine keeps the same split:

- ``nl_to_sql(question, tables, llm=...)`` — the translation step.
  Any callable ``(prompt: str) -> str`` plugs in as the LLM (none are
  bundled in this container); without one, a deterministic rule-based
  translator answers the reference README's question shapes
  ("what is the average temperature by day for city X in June 2024"),
  so the surface is fully testable offline.
- the produced SQL executes through ``plans.xql.run_query`` — the same
  rewrite + Catalyst path as hand-written queries, so city/bucket
  extensions in LLM output are handled identically.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from weather_tools_spark.plans import xql

_AGG_WORDS = {
    "average": "AVG",
    "avg": "AVG",
    "mean": "AVG",
    "total": "SUM",
    "sum": "SUM",
    "maximum": "MAX",
    "max": "MAX",
    "minimum": "MIN",
    "min": "MIN",
    "count": "COUNT",
}

_BUCKET_WORDS = {
    "day": "time_date",
    "daily": "time_date",
    "month": "time_month",
    "monthly": "time_month",
    "year": "time_year",
    "yearly": "time_year",
}


def _rule_based(question: str, table: str) -> str:
    """Deterministic fallback translator for the reference's documented
    question shapes: '<agg> of <col> by <bucket> [for city <name>]'."""
    q = question.lower()
    agg = next((sql for w, sql in _AGG_WORDS.items() if re.search(rf"\b{w}\b", q)), None)
    col_m = re.search(
        r"\b(?:average|avg|mean|total|sum|maximum|max|minimum|min|count)\s+(?:of\s+)?(?:the\s+)?([a-z_][a-z0-9_]*)",
        q,
    )
    bucket = next((b for w, b in _BUCKET_WORDS.items() if re.search(rf"\bby\s+{w}|\b{w}\b", q)), None)
    city_m = re.search(r"\b(?:in|for)\s+city\s+([a-z ]+?)(?:\s+(?:in|during|for)\b|$)", q)
    if agg is None or col_m is None:
        raise ValueError(
            f"rule-based NL translator cannot parse {question!r}; pass llm="
        )
    col = col_m.group(1)
    select = [f"{agg}('{col}')"]
    group = ""
    if bucket:
        select.insert(0, bucket)
        group = f" GROUP BY {bucket}"
    where = ""
    if city_m:
        where = f" WHERE city = '{city_m.group(1).strip()}'"
    order = f" ORDER BY {bucket}" if bucket else ""
    return f"SELECT {', '.join(select)} FROM {table}{where}{group}{order}"


def nl_to_sql(
    question: str,
    table: str,
    llm: Callable[[str], str] | None = None,
    table_metadata: str | None = None,
) -> str:
    """Translate a natural-language question to SQL. With ``llm``, the
    prompt carries the table metadata (the reference's prompt shape);
    without one, the rule-based fallback handles the documented
    question templates."""
    if llm is not None:
        prompt = (
            "Translate the question to a single ANSI SQL statement.\n"
            f"Table: {table}\n"
            + (f"Schema/metadata: {table_metadata}\n" if table_metadata else "")
            + f"Question: {question}\nSQL:"
        )
        return llm(prompt).strip().rstrip(";")
    return _rule_based(question, table)


def ask(
    spark: SparkSession,
    question: str,
    table: str,
    llm: Callable[[str], str] | None = None,
    time_col: str = "time",
) -> DataFrame:
    """NL question → SQL → rewritten + executed on Spark."""
    sql = nl_to_sql(question, table, llm=llm)
    return xql.run_query(spark, sql, time_col=time_col)
