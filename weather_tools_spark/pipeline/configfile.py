"""weather-dl configuration-file grammar → DownloadConfig.

The reference drives its download pipeline from user-authored ``*.cfg``
(configparser) or ``*.json`` files (weather_dl/download_pipeline/
parsers.py:157-487). A user switching to this engine brings those
files, so the full grammar is re-implemented here with the same
semantics, feeding the engine's ``DownloadConfig`` →
``pipeline.partition.fanout`` Cartesian fan-out:

- ``[parameters]`` (client / dataset / target_path / partition_keys) +
  ``[selection]`` (API request key-values) sections;
- multiline values split into lists; ``/``-joined values parse as MARS
  syntax — explicit lists (``a/b/c``) or inclusive ranges
  (``10/to/12``, ``00/to/06/by/3``, date and decimal ranges, and
  ``year-month`` ranges stepped by months) — EXCEPT inside
  ``parameters`` sections and for the ``date_range`` key
  (parsers.py:330-348 `_parse_lists` rules);
- dotted sections (``[parameters.alice]``) nest as subsections — the
  multi-API-key mechanism license cycling consumes
  (parsers.py:351-369, 490-516);
- the validation set of ``process_config`` (parsers.py:378-479):
  parameters/target_path/client required, deprecated keys rejected,
  every partition key present in the selection, the number of
  ``target_path`` format replacements equal to the number of partition
  keys, ``day=all`` forbidden as a partition key, ``hdate`` requiring
  a ``date`` partition key, singleton partition values coerced to
  lists.

JSON configs pass through the same pipeline (lists may already be
typed; string values still get the MARS treatment, matching the
reference's backward-compatible handling).
"""

from __future__ import annotations

import configparser
import json
import re
import string
from typing import IO

from weather_tools_spark.functions.timeparse import expand_mars_range
from weather_tools_spark.pipeline.partition import DownloadConfig

#: reference client registry names (weather_dl clients.py:430-436);
#: this engine ships the fake strategy, the ECMWF ones gate on
#: credentials at get_client time
KNOWN_CLIENTS = ("cds", "mars", "ecpublic", "fake")

_YM = re.compile(r"^\d{4}-\d{2}$")


def _expand_year_month_range(spec: str) -> list[str] | None:
    """``2020-01/to/2020-04[/by/2]`` → month-stepped YYYY-MM list
    (the reference's `year-month` key special case)."""
    parts = [p.strip() for p in spec.split("/") if p]
    if len(parts) < 3 or parts[1].lower() != "to":
        return None
    if not (_YM.match(parts[0]) and _YM.match(parts[2])):
        return None
    step = int(parts[4]) if len(parts) >= 5 and parts[3].lower() == "by" else 1
    y0, m0 = map(int, parts[0].split("-"))
    y1, m1 = map(int, parts[2].split("-"))
    start, end = y0 * 12 + (m0 - 1), y1 * 12 + (m1 - 1)
    if end < start and step > 0:
        step = -step
    out = []
    cur = start
    while (cur <= end) if step > 0 else (cur >= end):
        out.append(f"{cur // 12:04d}-{cur % 12 + 1:02d}")
        cur += step
    return out


def _parse_lists(section: dict, section_name: str = "") -> dict:
    """Multiline values → lists; '/'-joined values → MARS expansion
    (outside `parameters` sections, excluding `date_range`)."""
    out = {}
    for key, val in section.items():
        if not isinstance(val, str):
            out[key] = val
            continue
        if "/" in val and "parameters" not in section_name and key != "date_range":
            ym = _expand_year_month_range(val) if key == "year-month" else None
            out[key] = ym if ym is not None else expand_mars_range(val.strip())
        elif "\n" in val:
            out[key] = [line.strip() for line in val.strip().splitlines()]
        else:
            out[key] = val
    return out


def _nest_subsections(config: dict) -> dict:
    """``parameters.alice`` keys nest under ``parameters`` as dicts."""
    out: dict = {}
    for key, val in config.items():
        if "." not in key:
            if isinstance(val, dict):
                out.setdefault(key, {}).update(val)
            else:
                out[key] = val
    for key, val in config.items():
        if "." in key:
            head, rest = key.split(".", 1)
            out.setdefault(head, {})[rest] = val
    return out


def parse_config(source: str | IO) -> dict:
    """Parse ``*.cfg``/``*.json`` text (or an open file) into the
    nested section dict the reference produces."""
    text = source if isinstance(source, str) else source.read()
    try:
        raw = json.loads(text)
    except json.JSONDecodeError:
        cp = configparser.ConfigParser()
        try:
            cp.read_string(text)
        except configparser.Error:
            return {}
        raw = {s: dict(cp.items(s)) for s in cp.sections()}
    parsed = {s: _parse_lists(v, s) if isinstance(v, dict) else v for s, v in raw.items()}
    return _nest_subsections(parsed)


def _n_replacements(template: str) -> int:
    """Count format replacement fields in a target_path template
    (parsers.py:343-348 semantics)."""
    return sum(1 for _, fld, _, _ in string.Formatter().parse(template) if fld is not None)


def _require(cond: bool, message: str, error: type[Exception] = ValueError) -> None:
    if not cond:
        raise error(message)


def process_config(source: str | IO, config_name: str = "config") -> DownloadConfig:
    """Full reference validation pipeline → engine DownloadConfig."""
    config = parse_config(source)
    _require(bool(config), "Unable to parse configuration file.")
    _require("parameters" in config, "'parameters' section required in configuration file.")
    params = {k: v for k, v in config["parameters"].items() if not isinstance(v, dict)}
    _require(
        "target_template" not in params,
        "'target_template' is deprecated, use 'target_path' instead.",
    )
    _require("target_path" in params, "'parameters' section requires a 'target_path' key.")
    _require("client" in params, "'parameters' section requires a 'client' key.")
    _require(
        params["client"] in KNOWN_CLIENTS,
        f"Invalid 'client' parameter; supported clients are {list(KNOWN_CLIENTS)}.",
    )
    for gone in ("append_date_dirs", "target_filename"):
        _require(
            gone not in params,
            f"'{gone}' is no longer supported.",
            NotImplementedError,
        )

    partition_keys = params.get("partition_keys", [])
    if isinstance(partition_keys, str):
        partition_keys = [partition_keys.strip()]
    selection = dict(config.get("selection", {}))
    _require(
        all(k in selection for k in partition_keys),
        "All 'partition_keys' must appear in the 'selection' section.",
    )
    n_repl = _n_replacements(params["target_path"])
    _require(
        n_repl == len(partition_keys),
        f"'target_path' has {n_repl} replacements. Expected {len(partition_keys)}, "
        f"since there are {len(partition_keys)} partition keys.",
    )
    if "day" in partition_keys:
        _require(
            selection.get("day") != "all",
            "If 'all' is used for a selection value, it cannot appear as a partition key.",
        )
    if "hdate" in selection:
        _require(
            "date" in partition_keys,
            "If 'hdate' is specified in the 'selection' section, then 'date' is "
            "required as a partition key.",
        )
    if "date_range" in selection:
        _require(
            "date_range" in partition_keys,
            "If 'date_range' is specified in the 'selection' section, then it is "
            "also required as a partition key.",
        )
    for key in partition_keys:  # singleton → list, so the product is well-formed
        if not isinstance(selection[key], list):
            selection[key] = [selection[key]]

    # positional '{}' templates map to partition keys in order so the
    # engine's named-template fan-out renders them identically
    target = params["target_path"]
    if "{}" in target:
        for key in partition_keys:
            target = target.replace("{}", "{" + key + "}", 1)

    return DownloadConfig(
        name=config_name,
        client=params["client"],
        dataset=params.get("dataset"),
        target_template=target,
        partition_keys=list(partition_keys),
        selection=selection,
    )


def get_subsections(source_or_config: str | IO | dict) -> list[tuple[str, dict]]:
    """Parameter subsections (multiple API keys) for license cycling —
    ``[('alice', {'api_key': ...}), ...]``, or ``[('default', {})]``
    when none exist (parsers.py:490-516 semantics)."""
    config = (
        source_or_config
        if isinstance(source_or_config, dict)
        else parse_config(source_or_config)
    )
    subs = [
        (name, val)
        for name, val in config.get("parameters", {}).items()
        if isinstance(val, dict)
    ]
    return subs or [("default", {})]
