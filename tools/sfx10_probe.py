"""sfx10 decade probe (VERDICT r11 task 6): one decade past the fixes.

The two r11 sfx3 fixes (the candidate-pair-bounded minhash audit and
the 8k-column-chunked cosine dgemm) have exactly two clean decade
points post-fix (sfx1.0, sfx3.0) — and sfx3 is precisely where the
PRE-fix extrapolations broke (measured exponents 2.31 / 2.39 that the
1.0-point fit had hidden). This probe adds an sfx10 store (500k docs /
200k embeddings / 10M events / 60M lineitem — ~1.7 GB) and re-fits the
exponent over the 3.0 -> 10.0 fragment for the four operators the
100-TB dedup/ANN claim leans on hardest:

    exponent = log(t_10 / t_3) / log(10/3)

Same instrument as tools/sfx3_probe.py: Spark-side noop write, single
execution per (query, sf) — these run 30-600 s, far above session
noise. Pass/fail bar: exponent <= ~1.1 for the pair/audit operators
(pair emission is linear by construction in the generator: constant 5%
planted near-dup + 1% exact-dup fractions), <= ~1.3 for knn/cosine
(the dgemm is O(n_q * n_docs) with both sides scaling — but the
CHUNKED kernel bounds per-task memory, so time may grow faster than
linear while staying spill-free; the artifact reports it honestly).

Usage:
    python tools/gen_scale_data.py .scaledata/sfx10 10.0
    python tools/sfx10_probe.py [--out SCALING_sfx10.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBES = [
    "dedup_minhash_md5_audit",   # r11 fix (a): candidate-pair-bounded audit
    "sim_cosine_topk",           # r11 fix (b): chunked dgemm
    "ml_knn_label_accuracy",     # heaviest dgemm consumer
    "dedup_ngram_jaccard_pairs", # df-capped shingle equi-join
]

SF_DIRS = {
    "3.0": os.path.join(REPO, ".scaledata/sfx3.0"),
    "10.0": os.path.join(REPO, ".scaledata/sfx10"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, ".scaledata/sfx10_probe.json"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    names = args.only or PROBES

    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    spark = get_spark("sfx10_probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name in names:
        fn = SPARK[name]
        rec: dict = {}
        # one untimed warm pass at sf0.01: the first execution of a
        # query pays Catalyst+JIT compilation (~2 s) — negligible
        # against the 100-600 s heavies but it DOMINATED the first
        # sfx10-probe reading of sim_cosine_topk (5.7 s at sfx3 vs
        # 3.7 s at sfx10 → a nonsense negative exponent)
        fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()
        for sf, d in SF_DIRS.items():
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            rec[f"sec_sfx{sf}"] = round(time.perf_counter() - t0, 1)
            from weather_tools_spark.operators.dedup import release_persisted

            release_persisted()
            print(f"{name} sfx{sf}: {rec[f'sec_sfx{sf}']}s", file=sys.stderr)
        rec["exponent_3_to_10"] = round(
            math.log(rec["sec_sfx10.0"] / rec["sec_sfx3.0"]) / math.log(10 / 3), 2
        )
        results[name] = rec
        print(f"{name}: exponent(3->10) = {rec['exponent_3_to_10']}")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
