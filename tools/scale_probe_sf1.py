#!/usr/bin/env python3
"""sf1.0 scale probe for the shuffle-bound pair/graph operators.

SCALING.md's /root/testdata span (sf0.001→0.1) is fixed-overhead
dominated, so its ~1× ratios prove little about the operators whose
cost is DATA-dependent: the dedup pair joins, the graph kernels, and
decontamination. This probe runs them across a true 100× span that is
also distribution-realistic at the top end — the driver corpus's
31-word vocabulary saturates its 3-gram space by sf1.0 (the df cap
would empty every pair join), so the probe uses tools/gen_scale_data.py
series data (Zipf long-tail vocab, constant planted-dup fraction; see
that module's docstring).

Usage:
    python tools/gen_scale_data.py .scaledata/sfx0.01 0.01   # once
    python tools/gen_scale_data.py .scaledata/sfx0.1  0.1
    python tools/gen_scale_data.py .scaledata/sfx1.0  1.0
    python tools/scale_probe_sf1.py                          # ~15 min

Methodology matches tools/scaling_probe.py: fresh session per SF
(position-dependent JVM aging cancels in the ratio), min-of-2
executions, noop sink. Output: markdown ratio table on stdout +
.scaledata/probe_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "dedup_ngram_jaccard_pairs",
    "dedup_containment_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_prefix_pairs",
    "dedup_paragraph_dupes",
    "dedup_embedding_lsh_pairs",
    "graph_triangle_census",
    "graph_ktruss",
    "graph_adamic_adar_linkpred",
    "corpus_decontamination",
    # r8 additions whose cost is data-dependent (quadratic kNN compute;
    # fact-scale contingency aggregation)
    "ml_knn_label_accuracy",
    "stats_kendall_tau",
]

SFS = ["0.01", "0.1", "1.0"]


def main() -> None:
    from weather_tools_spark.operators.dedup import release_persisted
    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, ".scaledata", "probe_results.json")
    results: dict[str, dict[str, float]] = {}
    rows_out: dict[str, dict[str, int]] = {}
    if os.path.exists(out_path):  # resumable: merge per-SF invocations
        with open(out_path) as f:
            prev = json.load(f)
        results, rows_out = prev.get("times", {}), prev.get("rows", {})
    sfs = sys.argv[1:] or SFS
    only = os.environ.get("PROBE_ONLY")  # comma-separated query filter
    probes = [p for p in PROBES if p in only.split(",")] if only else PROBES
    for sf in sfs:
        spark = get_spark("scale_probe_sf1")
        sf_dir = os.path.join(here, ".scaledata", f"sfx{sf}")
        for name in probes:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                df = SPARK[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_persisted()
            results.setdefault(name, {})[sf] = round(best, 3)
            rows_out.setdefault(name, {})[sf] = SPARK[name](spark, sf_dir).count()
            release_persisted()
            print(f"  {name} sfx{sf}: {best:.2f}s", file=sys.stderr)
        spark.stop()
        with open(out_path, "w") as f:
            json.dump({"times": results, "rows": rows_out}, f, indent=1)

    if not all(sf in results.get(PROBES[0], {}) for sf in SFS):
        print("(partial run — rerun remaining SFs for the full table)")
        return
    print("| query | sfx0.01 s | sfx0.1 s | sfx1.0 s | t-ratio /100x | rows 0.01→1.0 |")
    print("|---|---|---|---|---|---|")
    for name in PROBES:
        r = results[name]
        ratio = r["1.0"] / r["0.01"] if r["0.01"] else float("inf")
        ro = rows_out[name]
        print(
            f"| {name} | {r['0.01']} | {r['0.1']} | {r['1.0']} | "
            f"{ratio:.1f}x | {ro['0.01']}→{ro['1.0']} |"
        )


if __name__ == "__main__":
    main()
