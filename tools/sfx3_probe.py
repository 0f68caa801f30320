"""sfx3 spot-probe: one more decade for the slowest scale family
(VERDICT r10 task 8).

The sfx series (0.01 → 0.1 → 1.0) gives each query a measured exponent
from 3 points spanning 100×; extrapolating the 100-TB claim leans
hardest on the most expensive queries, so this probe adds an sfx3.0
point (18M lineitem / 150k docs / 3M events — 3× the largest measured
store) for the 12 queries that topped the sfx1.0 strict sweep, and
reports each one's measured exponent over the 1.0→3.0 decade fragment:

    exponent = log(t_3.0 / t_1.0) / log(3)

Spark-side time only (noop write, same instrument as
tools/scaling_probe.py — the strict sweep's times include the DuckDB
oracle recompute, which at O(n²) queries would dominate). Single
execution per (query, sf): these queries run 10-600 s, so the session
floor that motivates min-of-2 elsewhere is noise here.

Usage:
    python tools/gen_scale_data.py .scaledata/sfx3.0 3.0
    python tools/sfx3_probe.py [--out .scaledata/sfx3_probe.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 12 slowest entries of STRICT_SWEEP_sfx1.json (sweep seconds at
# sfx1.0 incl. oracle, for reference): knn 300, cluster_canonical 163,
# minhash_audit 104, ngram_jaccard 94, simhash_audit 87, containment 72,
# winnowing_audit 59, tfidf 58, clean_report 52, embedding_cosine 52,
# banded_recall 45, gopher 44
PROBES = [
    "ml_knn_label_accuracy",
    "dedup_cluster_canonical",
    "dedup_minhash_md5_audit",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_md5_audit",
    "dedup_containment_pairs",
    "dedup_winnowing_md5_audit",
    "text_tfidf_keywords",
    "corpus_clean_report_exact",
    "dedup_embedding_cosine",
    "dedup_banded_recall_audit",
    "corpus_gopher_rules",
]

SF_DIRS = {
    "1.0": ".scaledata/sfx1.0",
    "3.0": ".scaledata/sfx3.0",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scaledata/sfx3_probe.json")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from weather_tools_spark.operators.dedup import release_persisted
    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    probes = args.only or PROBES
    results: dict[str, dict[str, float]] = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for sf, sf_dir in SF_DIRS.items():
        todo = [n for n in probes if sf not in results.get(n, {})]
        if not todo:
            continue
        spark = get_spark(f"sfx3_probe_{sf}")
        for name in todo:
            t0 = time.perf_counter()
            SPARK[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_persisted()
            results.setdefault(name, {})[sf] = round(dt, 2)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
            print(f"{name} sfx{sf}: {dt:.1f}s", file=sys.stderr)
        spark.stop()

    print(f"{'query':<32}{'sfx1.0':>9}{'sfx3.0':>9}{'ratio':>7}{'exponent':>9}")
    for name in probes:
        r = results.get(name, {})
        t1, t3 = r.get("1.0"), r.get("3.0")
        if not t1 or not t3:
            print(f"{name:<32}   (incomplete)")
            continue
        ratio = t3 / t1
        expo = math.log(ratio) / math.log(3.0)
        print(f"{name:<32}{t1:>9.1f}{t3:>9.1f}{ratio:>7.2f}{expo:>9.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
