#!/usr/bin/env python3
"""Developer CLI over the query registry.

    python tools/query_cli.py list [substring]
    python tools/query_cli.py run NAME [sf_dir] [--limit N]
    python tools/query_cli.py explain NAME [sf_dir]
    python tools/query_cli.py oracle NAME

``run`` executes a registry query and prints a CSV head; ``explain``
prints the formatted physical plan plus the operator profile
(Exchange / join strategies / HashAggregate / Python stages — the same
counters PLANS.md tracks); ``oracle`` prints the query's DuckDB twin.
One-stop spot-checking for any of the `queries()` entries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.01"


def _spark():
    from weather_tools_spark.session import get_spark

    return get_spark("query_cli")


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] not in ("list", "run", "explain", "oracle"):
        print(__doc__, file=sys.stderr)
        return 2
    cmd = args[0]
    from weather_tools_spark.queries import AUDIT_ONLY, ORACLE, SPARK

    if cmd == "list":
        sub = args[1] if len(args) > 1 else ""
        for name in sorted(SPARK):
            if sub in name:
                tags = ["oracle" if name in ORACLE else "rows-only"]
                if name in AUDIT_ONLY:
                    # verification instrument (~2x operator cost, 16g
                    # heap for the recall audits at sf0.1) — schedule
                    # as CI/canary, not as a production pipeline
                    tags.append("audit-only")
                print(f"{name}  [{', '.join(tags)}]")
        return 0

    name = args[1] if len(args) > 1 else ""
    if name not in SPARK:
        print(f"unknown query {name!r} — try: python tools/query_cli.py list", file=sys.stderr)
        return 2

    if cmd == "oracle":
        if name not in ORACLE:
            print(f"{name} is rows-only (no SQL oracle)", file=sys.stderr)
            return 1
        print(ORACLE[name].strip())
        return 0

    sf_dir = next((a for a in args[2:] if not a.startswith("--")), DEFAULT_SF)
    limit = 20
    for a in args[2:]:
        if a.startswith("--limit"):
            limit = int(a.split("=", 1)[1]) if "=" in a else int(args[args.index(a) + 1])
    spark = _spark()
    df = SPARK[name](spark, sf_dir)

    if cmd == "explain":
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        print(plan)
        import re

        def n(op: str) -> int:
            return len(re.findall(rf"^\(\d+\) {op}\b", plan, re.MULTILINE))

        profile = {
            "Exchange": n("Exchange"),
            "BroadcastHashJoin": n("BroadcastHashJoin"),
            "SortMergeJoin": n("SortMergeJoin"),
            "BroadcastNestedLoopJoin": n("BroadcastNestedLoopJoin"),
            "CartesianProduct": n("CartesianProduct"),
            "HashAggregate": n("HashAggregate"),
            "Python stages": len(re.findall(r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)),
        }
        print("profile:", ", ".join(f"{k}={v}" for k, v in profile.items()))
        return 0

    rows = df.limit(limit).collect()
    print(",".join(df.columns))
    for r in rows:
        print(",".join("" if r[c] is None else str(r[c]) for c in df.columns))
    print(f"-- {len(rows)} row(s) shown (limit {limit}) from {name} at {sf_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
