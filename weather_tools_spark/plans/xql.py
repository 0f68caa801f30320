"""xql-parity SQL surface: accept SQL text, apply the reference's
query-language extensions as a pre-pass rewrite, execute via spark.sql.

The reference parses SQL with sqlglot and interprets it against xarray
(xql/src/xql/apply.py:245-299). This engine instead *rewrites* the
extension syntax to plain ANSI SQL and hands the result to Catalyst —
the whole optimizer inventory in SURVEY.md §4 comes for free, and OR
semantics are correct (the reference executes only the first DNF term,
where.py:237-238).

Extensions handled (all from the reference's surface):
- ``city = 'new york'`` / ``country = 'india'`` predicates → bbox
  conjunctions over latitude/longitude (where.py:140-171,
  constant.py:16-34);
- ``GROUP BY time_date | time_month | time_year`` time-bucket shorthand
  → ``date_format(time, ...)`` buckets (apply.py:56-60,132-156), with
  the bucket exposed under the shorthand name in the output;
- bare aggregate calls ``AVG('var')`` with single-quoted column args
  (xql's README style) → ``avg(var) AS avg_var`` using the reference's
  ``{func}_{var}`` output naming (apply.py:155).

sqlglot is not available in this container, so the rewriter is a
deliberately small regex/string pass over these three constructs; full
SQL (joins, windows, subqueries, set ops...) flows through untouched to
Spark's own parser. If sqlglot is importable it is used to validate the
statement parses before execution.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from weather_tools_spark.functions.geo import geo_entity_bbox

try:  # pragma: no cover - optional dependency
    import sqlglot  # type: ignore
except Exception:  # pragma: no cover
    sqlglot = None

_TIME_BUCKETS = {
    "time_date": "yyyy-MM-dd",
    "time_month": "yyyy-MM",
    "time_year": "yyyy",
}

_AGG_FUNCS = ("AVG", "SUM", "MIN", "MAX", "COUNT")


def _quoted_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of string literals — single-quoted with ''
    escaping, plus double-quoted (Spark's default treats "x" as a
    string literal too). An unterminated literal runs to the end."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch not in ("'", '"'):
            i += 1
            continue
        j = i + 1
        while j < n:
            if sql[j] == ch:
                if ch == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2  # '' escape: still inside the literal
                    continue
                break
            j += 1
        end = j + 1 if j < n else n
        spans.append((i, end))
        i = end
    return spans


def _sub_outside_literals(pattern: str, repl, sql: str, flags: int = 0) -> str:
    """re.sub that leaves any match starting inside a string literal
    untouched — so a user's ``WHERE note = "city='paris'"`` (or an
    ``AVG('x')`` spelled inside a quoted string) is never rewritten."""
    spans = _quoted_spans(sql)

    def guarded(m: re.Match[str]) -> str:
        if any(s < m.start() < e or m.start() == s for s, e in spans):
            return m.group(0)
        return repl(m) if callable(repl) else m.expand(repl)

    return re.sub(pattern, guarded, sql, flags=flags)


def rewrite_geo_predicates(sql: str) -> str:
    """``city='new york'`` / ``country='x'`` → bbox conjunction."""

    def repl(m: re.Match[str]) -> str:
        kind = m.group(1).lower()
        name = m.group(2)
        lat_min, lat_max, lon_min, lon_max = geo_entity_bbox(kind, name)
        return (
            f"(latitude >= {lat_min} AND latitude <= {lat_max} "
            f"AND longitude >= {lon_min} AND longitude <= {lon_max})"
        )

    return _sub_outside_literals(
        r"\b(city|country)\s*=\s*'([^']+)'", repl, sql, flags=re.IGNORECASE
    )


def rewrite_quoted_agg_args(sql: str) -> str:
    """xql allows ``AVG('temperature')`` — strip the quotes and alias the
    output ``{func}_{var}`` unless the query aliases it explicitly."""

    def repl(m: re.Match[str]) -> str:
        func, var = m.group(1), m.group(2)
        tail = sql[m.end():].lstrip()
        # word-boundary match: a bare prefix test would treat ASC
        # (ORDER BY AVG('x') ASC) as an explicit alias and suppress
        # the {func}_{var} output name
        if re.match(r"AS\b", tail, re.IGNORECASE):
            return f"{func}({var})"
        return f"{func}({var}) AS {func.lower()}_{var}"

    pattern = r"\b(" + "|".join(_AGG_FUNCS) + r")\s*\(\s*'([A-Za-z_][A-Za-z0-9_]*)'\s*\)"
    return _sub_outside_literals(pattern, repl, sql, flags=re.IGNORECASE)


def rewrite_time_buckets(sql: str, time_col: str = "time") -> str:
    """``GROUP BY time_date`` (etc.) → date_format bucket.

    The SELECT-list occurrence becomes ``date_format(...) AS time_date``
    so the output column keeps the shorthand name (matching the
    reference's output naming); GROUP BY / ORDER BY occurrences then
    reference that alias (Spark resolves group-by aliases natively).
    If the shorthand never appears before FROM, every occurrence is
    expanded to the raw expression instead."""
    out = sql
    for shorthand, fmt in _TIME_BUCKETS.items():
        if not re.search(rf"\b{shorthand}\b", out, flags=re.IGNORECASE):
            continue
        expr = f"date_format({time_col}, '{fmt}')"
        m = re.search(r"\bFROM\b", out, flags=re.IGNORECASE)
        head, tail = (out[: m.start()], out[m.start():]) if m else (out, "")
        if re.search(rf"\b{shorthand}\b", head, flags=re.IGNORECASE):
            head = _sub_outside_literals(
                rf"\b{shorthand}\b", f"{expr} AS {shorthand}", head, flags=re.IGNORECASE
            )
        else:
            tail = _sub_outside_literals(
                rf"\b{shorthand}\b", expr, tail, flags=re.IGNORECASE
            )
        out = head + tail
    return out


def rewrite(sql: str, time_col: str = "time") -> str:
    """Full pre-pass: geo entities → bboxes, quoted agg args → named
    aggregates, time-bucket shorthands → date_format."""
    out = rewrite_geo_predicates(sql)
    out = rewrite_quoted_agg_args(out)
    out = rewrite_time_buckets(out, time_col=time_col)
    return out


def run_query(spark: SparkSession, sql: str, time_col: str = "time") -> DataFrame:
    """Rewrite + execute. Views must already be registered
    (catalog.register_views or spark.read...createOrReplaceTempView)."""
    rewritten = rewrite(sql, time_col=time_col)
    if sqlglot is not None:  # validate early with a real parser when present
        sqlglot.parse_one(rewritten)
    return spark.sql(rewritten)
