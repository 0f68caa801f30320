"""Config-time date/time parsing and range expansion (weather-dl
parity, SURVEY.md §2.8).

These functions run at *plan-build* time (they expand download-config
selections, not data), so they are pure Python by design — matching the
reference's placement (weather_dl/download_pipeline/parsers.py) while
the data path stays in Spark expressions.

Semantics re-expressed:
- ECMWF date forms (parsers.py:34-70): ``YYYY-MM-DD``, ``YYYYMMDD``,
  ``YYYY-DDD`` (day-of-year), and relative ``-N`` (N days before today).
- ECMWF time forms (parsers.py:73-104): ``HH``, ``HH:MM``, ``HHMM``.
- MARS ranges (parsers.py:238-319): ``a/to/b[/by/c]`` over ints,
  floats, dates and year-months, preserving leading-zero width and
  supporting reversed ranges; bare ``a/b/c`` lists pass through.
- ``day=all`` expansion (config.py:80-126): year×month → every day of
  that month.
- hdate generation (weather_dl util.py:213-236): same month/day N years
  back, with Feb-29 → Feb-28 on non-leap years.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re
from typing import Iterable


def parse_ecmwf_date(value: str, today: dt.date | None = None) -> dt.date:
    """Accept YYYY-MM-DD, YYYYMMDD, YYYY-DDD (day-of-year) and relative
    -N (days before ``today``)."""
    value = value.strip()
    if re.fullmatch(r"-\d+", value):
        base = today or dt.date.today()
        return base + dt.timedelta(days=int(value))
    if re.fullmatch(r"\d{4}-\d{3}", value):
        year, doy = value.split("-")
        return dt.date(int(year), 1, 1) + dt.timedelta(days=int(doy) - 1)
    if re.fullmatch(r"\d{8}", value):
        return dt.date(int(value[:4]), int(value[4:6]), int(value[6:8]))
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", value):
        y, m, d = value.split("-")
        return dt.date(int(y), int(m), int(d))
    raise ValueError(f"unrecognized ECMWF date: {value!r}")


def parse_ecmwf_time(value: str) -> dt.time:
    """Accept HH, HH:MM, HHMM."""
    value = value.strip()
    if re.fullmatch(r"\d{1,2}", value):
        return dt.time(int(value))
    if re.fullmatch(r"\d{1,2}:\d{2}", value):
        h, m = value.split(":")
        return dt.time(int(h), int(m))
    if re.fullmatch(r"\d{4}", value):
        return dt.time(int(value[:2]), int(value[2:]))
    raise ValueError(f"unrecognized ECMWF time: {value!r}")


_NUM = re.compile(r"^-?\d+$")
_FLOAT = re.compile(r"^-?\d*\.\d+$")
_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def expand_mars_range(spec: str) -> list[str]:
    """Expand ``a/to/b[/by/c]`` into the inclusive value list; other
    ``/``-joined strings pass through as explicit lists.

    >>> expand_mars_range('10/to/12')
    ['10', '11', '12']
    >>> expand_mars_range('00/to/06/by/3')
    ['00', '03', '06']
    >>> expand_mars_range('2020-01-07/to/2020-01-14/by/2')
    ['2020-01-07', '2020-01-09', '2020-01-11', '2020-01-13']
    >>> expand_mars_range('0.0/to/0.5/by/0.1')
    ['0.0', '0.1', '0.2', '0.3', '0.4', '0.5']
    >>> expand_mars_range('12/to/10')
    ['12', '11', '10']
    >>> expand_mars_range('a/b/c')
    ['a', 'b', 'c']
    """
    parts = spec.split("/")
    if len(parts) >= 3 and parts[1].lower() == "to":
        start_s, end_s = parts[0], parts[2]
        step_s = parts[4] if len(parts) >= 5 and parts[3].lower() == "by" else None
        if _DATE.match(start_s):
            start = dt.date.fromisoformat(start_s)
            end = dt.date.fromisoformat(end_s)
            step = dt.timedelta(days=int(step_s) if step_s else 1)
            if end < start:
                step = -step
            out, cur = [], start
            while (cur <= end) if end >= start else (cur >= end):
                out.append(cur.isoformat())
                cur = cur + step
            return out
        if _NUM.match(start_s):
            width = len(start_s) if start_s[0] != "-" else 0
            start, end = int(start_s), int(end_s)
            step = int(step_s) if step_s else 1
            if end < start:
                step = -abs(step)
            vals = list(range(start, end + (1 if step > 0 else -1), step))
            pad = width if start_s.startswith("0") and width > 1 else 0
            return [f"{v:0{pad}d}" if pad else str(v) for v in vals]
        if _FLOAT.match(start_s):
            # decimal-string stepping to avoid float accumulation error
            from decimal import Decimal

            start, end = Decimal(start_s), Decimal(end_s)
            step = Decimal(step_s) if step_s else Decimal(1)
            if end < start:
                step = -abs(step)
            out, cur = [], start
            while (cur <= end) if step > 0 else (cur >= end):
                out.append(str(cur))
                cur += step
            return out
        raise ValueError(f"cannot expand MARS range over {start_s!r}")
    return parts


def filename_datetime_expr(path_col, pattern: str):
    """Column expression extracting a timestamp from a URI whose basename
    embeds a ``%Y%m%d``-style datetime (weather_mv sinks.py:96-146
    semantics): the strftime-ish ``pattern`` (supporting %Y %m %d %H %M
    %S in any order) is compiled to a regex; missing components default
    to year→1978, month/day→1, time→0 — the reference's documented
    defaults.

    Pure JVM expression: regexp_extract per component + make_timestamp.
    """
    from pyspark.sql import functions as F

    component_res = {
        "%Y": r"(\d{4})",
        "%m": r"(\d{2})",
        "%d": r"(\d{2})",
        "%H": r"(\d{2})",
        "%M": r"(\d{2})",
        "%S": r"(\d{2})",
    }
    order: list[str] = []
    regex = ""
    i = 0
    while i < len(pattern):
        if pattern[i] == "%" and i + 1 < len(pattern):
            token = pattern[i : i + 2]
            if token in component_res:
                order.append(token)
                regex += component_res[token]
                i += 2
                continue
        regex += re.escape(pattern[i])
        i += 1

    defaults = {"%Y": 1978, "%m": 1, "%d": 1, "%H": 0, "%M": 0, "%S": 0}

    def comp(token: str):
        if token in order:
            idx = order.index(token) + 1
            # try_cast: a non-matching path extracts '' → NULL component
            # → NULL timestamp (instead of an ANSI cast error)
            return F.regexp_extract(path_col, regex, idx).try_cast("int")
        return F.lit(defaults[token])

    return F.make_timestamp(
        comp("%Y"), comp("%m"), comp("%d"), comp("%H"), comp("%M"), comp("%S")
    )


def expand_day_all(year: int, month: int) -> list[str]:
    """``day=all`` → zero-padded day list for the month (config.py:91-126)."""
    _, ndays = calendar.monthrange(year, month)
    return [f"{d:02d}" for d in range(1, ndays + 1)]


def hdates(base: dt.date, years_back: int) -> list[str]:
    """Hindcast dates: same month/day for the N previous years; Feb-29
    falls back to Feb-28 off leap years (weather_dl util.py:213-236)."""
    out = []
    for i in range(1, years_back + 1):
        y = base.year - i
        month, day = base.month, base.day
        if month == 2 and day == 29 and not calendar.isleap(y):
            day = 28
        out.append(dt.date(y, month, day).isoformat())
    return out


def validate_selection(selection: dict[str, list[str]]) -> list[str]:
    """Config-time validation (parsers.py:124-154 semantics): day ∈
    [1,31], month ∈ [1,12], hour ∈ [0,23], years 4-digit numerics.
    Returns a list of human-readable violations (empty = valid)."""
    problems: list[str] = []
    bounds = {"day": (1, 31), "month": (1, 12), "hour": (0, 23)}
    for key, (lo, hi) in bounds.items():
        for v in selection.get(key, []):
            try:
                iv = int(v)
            except (TypeError, ValueError):
                problems.append(f"{key}={v!r} is not an integer")
                continue
            if not lo <= iv <= hi:
                problems.append(f"{key}={v!r} outside [{lo}, {hi}]")
    for v in selection.get("year", []):
        if not re.fullmatch(r"\d{4}", str(v)):
            problems.append(f"year={v!r} is not a 4-digit year")
    return problems


def expand_selection(selection: dict[str, list[str] | str]) -> dict[str, list[str]]:
    """Normalize a download-config selection: every value becomes an
    explicit list with MARS ranges and day=all expanded."""
    out: dict[str, list[str]] = {}
    for key, raw in selection.items():
        values: Iterable[str] = [raw] if isinstance(raw, str) else raw
        expanded: list[str] = []
        for v in values:
            if isinstance(v, str) and v.lower() == "all" and key == "day":
                year = int(str(out.get("year", selection.get("year", ["2000"]))[0]))
                month = int(str(out.get("month", selection.get("month", ["1"]))[0]))
                expanded.extend(expand_day_all(year, month))
            elif isinstance(v, str) and "/" in v:
                expanded.extend(expand_mars_range(v))
            else:
                expanded.append(str(v))
        out[key] = expanded
    return out
