#!/usr/bin/env python3
"""Full-HEADLINE sf×1.0 scale probe (VERDICT r8 task 4).

tools/scale_probe_sf1.py cleared the 12 known shuffle-bound suspects at
a true 100× data span; the remaining ~100 headline queries had never
run above sf0.1 — a hidden data-dependent term (a join that stops
broadcasting, an agg whose key domain explodes, a window that
single-partitions) would surface only here. This probe runs EVERY
bench.py headline query on the gen_scale_data series at sfx0.01 and
sfx1.0 (the ratio ends; sfx0.1 optional) and prints a ratio table,
flagging every entry above the 5×-per-100× attention bar for a written
explanation in SCALING.md §SCALING_sf1_headline.

Methodology matches tools/scaling_probe.py: fresh session per SF,
min-of-2 executions, noop sink, resumable JSON
(.scaledata/headline_results.json — per-SF invocations merge).

Usage:
    python tools/gen_scale_data.py .scaledata/sfx0.01 0.01   # once
    python tools/gen_scale_data.py .scaledata/sfx1.0  1.0
    python tools/scale_probe_sf1_headline.py [SF ...]        # ~25 min
Env:
    PROBE_ONLY=a,b   run only the named queries
    PROBE_SKIP=a,b   skip the named queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.01", "1.0"]
ATTENTION_RATIO = 5.0  # per 100× data — above this needs a written explanation


def main() -> int:
    from bench import HEADLINE
    from weather_tools_spark.operators.dedup import release_persisted
    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, ".scaledata", "headline_results.json")
    results: dict[str, dict[str, float]] = {}
    if os.path.exists(out_path):  # resumable: merge per-SF invocations
        with open(out_path) as f:
            results = json.load(f).get("times", {})
    sfs = sys.argv[1:] or SFS
    only = os.environ.get("PROBE_ONLY")
    skip = set((os.environ.get("PROBE_SKIP") or "").split(","))
    probes = [q for q in HEADLINE if q in SPARK and q not in skip]
    if only:
        probes = [q for q in probes if q in only.split(",")]
    for sf in sfs:
        spark = get_spark("scale_probe_sf1_headline")
        sf_dir = os.path.join(here, ".scaledata", f"sfx{sf}")
        # one warm pass for JIT + Arrow worker spawn (bench.py contract)
        SPARK[probes[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_persisted()
        for i, name in enumerate(probes):
            if results.get(name, {}).get(sf) is not None:
                continue  # resumed
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                SPARK[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_persisted()
            results.setdefault(name, {})[sf] = round(best, 3)
            print(f"  [{i + 1}/{len(probes)}] {name} sfx{sf}: {best:.2f}s", file=sys.stderr)
            with open(out_path, "w") as f:
                json.dump({"times": results}, f, indent=1)
        spark.stop()

    done = [q for q in probes if all(sf in results.get(q, {}) for sf in SFS)]
    if len(done) < len(probes):
        print(f"(partial: {len(done)}/{len(probes)} — rerun for the rest)")
        return 0
    flagged = []
    print("| query | sfx0.01 s | sfx1.0 s | t-ratio /100x |")
    print("|---|---|---|---|")
    for name in probes:
        r = results[name]
        ratio = r["1.0"] / r["0.01"] if r["0.01"] else float("inf")
        mark = " **(>5x)**" if ratio > ATTENTION_RATIO else ""
        if ratio > ATTENTION_RATIO:
            flagged.append((name, ratio))
        print(f"| {name} | {r['0.01']} | {r['1.0']} | {ratio:.1f}x{mark} |")
    print(f"\n{len(flagged)} quer{'y' if len(flagged) == 1 else 'ies'} above "
          f"the {ATTENTION_RATIO}x/100x attention bar:")
    for name, ratio in sorted(flagged, key=lambda x: -x[1]):
        print(f"  {name}: {ratio:.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
