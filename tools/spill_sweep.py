"""Spill sweep: force real shuffle/sort/aggregation SPILL under executor
memory pressure and hash-compare every result to an unspilled baseline.

The one 100-TB execution regime no prior probe touched (VERDICT r11
task 1): every earlier sweep — local[32], local-cluster[2,8,8192],
retry/executor-loss/concurrency probes — ran memory-comfortable, so
Spark's external-spill merge paths (UnsafeExternalSorter,
ExternalAppendOnlyUnsafeRowArray, ObjectAggregationIterator's
sort-based fallback) never actually executed. A 1000-executor job over
100 TB lives in those paths. A deterministic engine must produce the
exact same frame whether an aggregation/sort/join buffer stayed on the
heap or round-tripped through spill files and a merge pass.

Mechanism — two sessions in one process:

1. BASELINE: vanilla ``local[8]``, comfortable memory (the driver's
   own regime). Record each query's driver-style md5.
2. SPILL: ``local-cluster[2,2,2200]`` (two real executor JVMs, network
   shuffle) with the execution-memory pool squeezed
   (``spark.memory.fraction=0.2`` over a ~1.6 GB heap → ~260 MB of
   unified memory shared by 2 task slots) AND the deterministic
   force-spill thresholds dropped (``spark.shuffle.spill.
   numElementsForceSpillThreshold`` + the windowExec / sortMergeJoin
   buffer thresholds at 256k elements), so every data-scale sort,
   hash-agg fallback, window buffer and SMJ buffer demonstrably
   spills. Per-query spilled bytes are read from the driver's status
   store REST API (delta of stage-level ``memoryBytesSpilled`` /
   ``diskBytesSpilled``) — the artifact proves spill HAPPENED rather
   than assuming the squeeze worked. (The threshold is 256k, not
   lower: see the SPILL_CONF note — too-aggressive force spilling
   explodes the merge-phase spill-file fan-in and hard-OOMs the JVM,
   a finding of this sweep.)

Any hash divergence, job failure, or an all-zero spill column fails
the sweep (exit 1). Artifact: SPILL_SWEEP.json at the repo root.

Usage:
    python tools/spill_sweep.py [sf_dir] [--only name ...] [--out path]
Defaults to the 100x store (.scaledata/sfx1.0) so partitions are big
enough that the squeeze bites data-scale operators, not fixture noise.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Representative data-scale queries per family: wide-shuffle aggs,
# sort-merge joins, global sorts, window buffers, dedup shingle joins,
# iterative graph, text token shuffles, blocked dgemm, prefix-sum stats.
DEFAULT_QUERIES = [
    # core SQL: hash-agg fallback, SMJ, semi/anti, global sort
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q21_waiting_orders",
    "orderby_limit_offset",
    "topk_orders_per_priority",
    # window buffers (ExternalAppendOnlyUnsafeRowArray spill path)
    "window_running_customer_spend",
    "window_ntile_quartiles",
    "events_sessionization",
    "events_conversion_window",
    "orders_price_percentiles",
    # dedup / corpus: shingle equi-joins, explode-heavy shuffles
    "dedup_exact_canonical",
    "dedup_ngram_jaccard_pairs",
    "dedup_jaccard_prefix_pairs",
    "dedup_containment_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_paragraph_dupes",
    "corpus_decontamination",
    "corpus_exact_substring_dedup",
    "corpus_ngram_novelty",
    # graph: iterative joins over the edge frame
    "graph_pagerank_nations",
    "graph_connected_components",
    "graph_triangle_census",
    "graph_kcore",
    # text / sketch / sim / stats
    "text_bigram_counts",
    "text_burrows_delta",
    "sketch_kmv_setops",
    "sim_cosine_topk_blocked",
    "stats_ks_two_sample",
]


# Queries whose data-scale sorts are so large (1e8+ intermediate rows
# per partition) that ANY force-spill threshold explodes the merge
# fan-in past the JVM's non-spillable headroom — these run in a third
# session under pure memory pressure (fraction squeeze only, no force
# thresholds), where the natural spill cadence keeps the file count
# bounded. Verified: at 16k AND 256k thresholds the wedge sort of
# graph_triangle_census (60M-lineitem basket pairs) OOMs the executor
# after spilling 3 GB; pressure-only it completes and still spills.
HEAVY_SORT = frozenset({"graph_triangle_census"})


def frame_md5(df) -> str:
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


SPILL_CONF = {
    # real memory pressure: ~260 MB unified pool across 2 task slots.
    # (First run used 900m heap: the unified pool squeezed fine, but the
    # NON-spillable heap — codegen, join relation builds, Python/Arrow
    # buffers — OOM-killed the executors (exit 52) on the iterative
    # graph family and q21. Spill pressure comes from memory.fraction +
    # the force thresholds, not from starving the whole JVM.)
    "spark.executor.memory": "1600m",
    "spark.memory.fraction": "0.2",
    "spark.sql.shuffle.partitions": "8",
    # deterministic spill triggers: force the external-merge paths even
    # where 8 fat partitions would still (barely) fit the squeezed pool.
    # NOT lower: at 16k the 10M-row sorts of graph_triangle_census
    # produced ~600 spill files per task and the merge phase's per-file
    # read buffers hard-OOMed the executor JVM (exit 52) — a real
    # 100-TB lesson (spill-file COUNT is a memory cost too); 256k keeps
    # every data-scale buffer spilling while bounding the merge fan-in.
    "spark.shuffle.spill.numElementsForceSpillThreshold": "262144",
    "spark.sql.windowExec.buffer.spill.threshold": "262144",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "262144",
    "spark.sql.cartesianProductExec.buffer.spill.threshold": "262144",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "16384",
}


def _rest_spill_totals(ui_url: str) -> tuple[int, int]:
    """Cumulative (memoryBytesSpilled, diskBytesSpilled) over all stages
    of all applications on this driver's status-store REST API."""
    with urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10) as r:
        apps = json.load(r)
    mem = disk = 0
    for app in apps:
        url = f"{ui_url}/api/v1/applications/{app['id']}/stages"
        with urllib.request.urlopen(url, timeout=10) as r:
            for st in json.load(r):
                mem += st.get("memoryBytesSpilled", 0)
                disk += st.get("diskBytesSpilled", 0)
    return mem, disk


def _run(names, sf, builder, label, ui=False):
    from pyspark.sql import SparkSession

    b = builder(SparkSession.builder)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl if ui else None
    from weather_tools_spark.queries import SPARK

    out = {}
    for name in names:
        t0 = time.perf_counter()
        pre = _rest_spill_totals(ui_url) if ui_url else (0, 0)
        try:
            h = frame_md5(SPARK[name](spark, sf))
            err = None
        except Exception as e:  # noqa: BLE001
            h, err = None, f"{type(e).__name__}: {str(e)[:200]}"
        dt = time.perf_counter() - t0
        post = _rest_spill_totals(ui_url) if ui_url else (0, 0)
        rec = {"md5": h, "sec": round(dt, 2)}
        if err:
            rec["err"] = err
        if ui_url:
            rec["memory_spilled_bytes"] = post[0] - pre[0]
            rec["disk_spilled_bytes"] = post[1] - pre[1]
        out[name] = rec
        spill = f" spill={rec.get('disk_spilled_bytes', 0):,}B" if ui_url else ""
        print(
            f"[{label}] {name}: {'ERR ' + err if err else h} {dt:.1f}s{spill}",
            file=sys.stderr,
        )
        if err and ui_url:
            # an executor OOM poisons the next query while the worker
            # relaunches the JVM — give the cluster a recovery window so
            # one failure doesn't cascade into phantom ERRs
            time.sleep(8)
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.path.join(REPO, ".scaledata/sfx1.0"))
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "SPILL_SWEEP.json"))
    args = ap.parse_args()
    names = args.only or DEFAULT_QUERIES

    # The driver JVM is launched ONCE per process (the second session
    # reuses it), so the comfortable heap is set here: the baseline
    # local[8] executors live IN the driver JVM and the dedup family
    # needs real heap at sfx1.0, while phase B's squeezed executors are
    # separate local-cluster worker processes capped at 900m regardless.
    base = _run(
        names,
        args.sf_dir,
        lambda b: b.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "10g")
        .config("spark.sql.shuffle.partitions", "16"),
        "baseline",
    )

    def spill_builder(forced: bool):
        def build(b):
            b = (
                b.master("local-cluster[2,2,2200]")
                .config("spark.ui.enabled", "true")
                .config("spark.ui.port", "4050")
                .config("spark.executorEnv.PYTHONPATH", REPO)
            )
            for k, v in SPILL_CONF.items():
                if not forced and "hreshold" in k:
                    continue  # pressure-only session for HEAVY_SORT
                b = b.config(k, v)
            return b

        return build

    forced_names = [n for n in names if n not in HEAVY_SORT]
    heavy_names = [n for n in names if n in HEAVY_SORT]
    spilled = _run(forced_names, args.sf_dir, spill_builder(True), "spill", ui=True)
    if heavy_names:
        spilled.update(
            _run(
                heavy_names, args.sf_dir, spill_builder(False), "spill-pressure", ui=True
            )
        )

    per_query = {}
    n_div = n_err = 0
    total_disk = total_mem = 0
    for name in names:
        b, s = base[name], spilled[name]
        match = b["md5"] is not None and b["md5"] == s["md5"]
        if s.get("err") or b.get("err"):
            n_err += 1
        elif not match:
            n_div += 1
        total_mem += s.get("memory_spilled_bytes", 0)
        total_disk += s.get("disk_spilled_bytes", 0)
        per_query[name] = {
            "hash_match": match,
            "md5": b["md5"],
            "baseline_sec": b["sec"],
            "spill_sec": s["sec"],
            "memory_spilled_bytes": s.get("memory_spilled_bytes", 0),
            "disk_spilled_bytes": s.get("disk_spilled_bytes", 0),
            **({"err": s.get("err") or b.get("err")} if (s.get("err") or b.get("err")) else {}),
        }
    n_spilling = sum(1 for q in per_query.values() if q["disk_spilled_bytes"] > 0)
    artifact = {
        "sf_dir": args.sf_dir,
        "baseline_master": "local[8]",
        "spill_master": "local-cluster[2,2,2200]",
        "spill_conf": SPILL_CONF,
        "n_queries": len(names),
        "n_hash_divergences": n_div,
        "n_errors": n_err,
        "n_queries_with_disk_spill": n_spilling,
        "total_memory_spilled_bytes": total_mem,
        "total_disk_spilled_bytes": total_disk,
        "queries": per_query,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
    ok = n_div == 0 and n_err == 0 and total_disk > 0
    print(
        f"spill sweep: {len(names)} queries, {n_spilling} spilled to disk "
        f"({total_disk/1e6:.0f} MB disk / {total_mem/1e6:.0f} MB memory), "
        f"{n_div} divergence(s), {n_err} error(s) -> {args.out}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
