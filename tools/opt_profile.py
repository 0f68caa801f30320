#!/usr/bin/env python3
"""Optimization-round profiler (guide §1): per headline query, measure

- ``build_sec``  : time for SPARK[name](spark, sf) to RETURN the frame —
  captures driver-side work done during plan construction (bounded
  collects, counts, iterative loops) that the bench's per-query wall
  hides inside one number.
- ``exec_sec``   : time for the returned frame's noop write alone.
- ``n_jobs``     : Spark jobs launched by one full build+execute cycle
  (statusTracker delta) — the per-job scheduling overhead multiplier.
- ``sec``        : min-of-3 of (build + execute), same estimator as
  bench.py.
- plan shape     : Exchange / join / Python-stage counts, and the
  formatted plan written to ``plans/r12/<name>_before.txt`` (or a
  directory given by --plans-dir / none).

Usage:
    python tools/opt_profile.py [sf_dir] [--only A B ...] [--out PATH]
        [--plans-dir DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_counts(plan: str) -> dict[str, int]:
    import re

    def n(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.MULTILINE))

    return {
        "Exch": n("Exchange"),
        "BHJ": n("BroadcastHashJoin"),
        "SMJ": n("SortMergeJoin"),
        "SHJ": n("ShuffledHashJoin"),
        "BNLJ": n("BroadcastNestedLoopJoin"),
        "CART": n("CartesianProduct"),
        "HashAgg": n("HashAggregate"),
        "Sort": n("Sort"),
        "Window": n("Window"),
        "Py": n("MapInPandas") + n("MapInArrow") + n("FlatMapGroupsInPandas")
        + n("ArrowEvalPython") + n("BatchEvalPython"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default="/tmp/opt_profile.json")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import HEADLINE
    from weather_tools_spark.operators.dedup import release_persisted
    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    spark = get_spark("opt_profile")
    sc = spark.sparkContext
    names = args.only if args.only else [n for n in HEADLINE if n in SPARK]

    # same warmup as bench.py so steady-state numbers are comparable
    from weather_tools_spark.catalog import load_table

    load_table(spark, "lineitem", args.sf_dir).count()
    SPARK[HEADLINE[0]](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    SPARK["dedup_ngram_jaccard_pairs"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted()
    import pandas as _pd

    def _warm(batches):
        import numpy as _np  # noqa: F401

        for b in batches:
            yield _pd.DataFrame({"x": b["x"]})

    (
        spark.range(256)
        .selectExpr("id as x")
        .repartition(int(sc.defaultParallelism))
        .mapInPandas(_warm, "x long")
        .write.format("noop").mode("overwrite").save()
    )

    results: dict[str, dict] = {}
    for name in names:
        fn = SPARK[name]
        best = None
        bb = ee = None
        n_jobs = None

        def _job_count() -> int:
            return len(sc.statusTracker().getJobIdsForGroup(None) or [])

        for _ in range(args.reps):
            # ADVICE r12: one tracker API (PySpark statusTracker) for
            # BOTH snapshots — mixing it with the JVM-side tracker made
            # the delta unreliable (different retained-jobs windows) —
            # and keep the LAST rep's delta, not the first's, so the
            # count reflects steady state rather than warm-up builds.
            jobs0 = _job_count()
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            release_persisted()
            tot = t2 - t0
            if best is None or tot < best:
                best, bb, ee = tot, t1 - t0, t2 - t1
            n_jobs = max(0, _job_count() - jobs0)
        df = fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        release_persisted()
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(os.path.join(args.plans_dir, f"{name}_before.txt"), "w") as f:
                f.write(plan)
        results[name] = {
            "sec": round(best, 3),
            "build_sec": round(bb, 3),
            "exec_sec": round(ee, 3),
            "n_jobs": n_jobs,
            **plan_counts(plan),
        }
        print(
            f"{best:7.3f}s (build {bb:5.2f} exec {ee:5.2f} jobs {n_jobs:3d}) {name}",
            flush=True,
        )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    total = round(sum(r["sec"] for r in results.values()), 2)
    print(f"TOTAL {total}s over {len(results)} queries -> {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
