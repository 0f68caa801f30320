"""Quiet-host A/B medians for the two r11 plan rewrites (VERDICT r11
task 2): sketch_kmv_setops (fused distinct + WindowGroupLimit top-k +
membership-flag groupBys; 37->12 exchanges) and text_burrows_delta
(zero-fill LEFT-joins the broadcast top-word-filtered count frame
instead of the vocab-scale (source, word) frame).

ROUND11_NOTES and the registry docstrings claim 0.88->0.12 s and
0.53->0.16 s sf0.1 medians, but the only committed numbers at r11 HEAD
(BENCH_detail.json 0.66/0.76 s) came from contended hosts — this
harness makes the claim auditable: the OLD plans are reconstructed
verbatim from git 430eddb^ (the commit the rewrites landed on) HERE,
in the harness, never in the package; old and new run interleaved
(A/B/A/B...) on the same warm session so drift hits both arms equally;
N>=7 timed runs per arm, median reported; and both arms' frames are
hash-compared first (the rewrites claim values-identical).

Usage: python tools/ab_r11_rewrites.py [sf_dir] [--n 7]
Writes bench_archive/AB_r11_rewrites.json. Exit 1 on hash divergence.
Run on an IDLE host — the point of the artifact is the quiet-host
number; the 16-thread probe result is recorded so a reader can verify.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def frame_md5(df) -> str:
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


# ---------------------------------------------------------------------------
# OLD plans — reconstructed from git 430eddb^ (pre-rewrite HEAD), verbatim
# except for imports resolved against the current module constants.
# ---------------------------------------------------------------------------


def old_sketch_kmv_setops(spark, sf_dir: str):
    """430eddb^:weather_tools_spark/queries/sketches.py — per-side
    orderBy().limit() sketches, scalar crossJoin chains (37 exchanges,
    23 BNLJ at sf0.1)."""
    from pyspark.sql import functions as F

    from weather_tools_spark.catalog import load_table
    from weather_tools_spark.queries.sketches import (
        _TH_A,
        _TH_B,
        _TH_FRAC_SPARK,
        _TH_K,
    )

    ev = load_table(spark, "events", sf_dir)
    frac = F.expr(_TH_FRAC_SPARK)

    def side(etype: str):
        h = (
            ev.filter(F.col("event_type") == etype)
            .select(
                F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))).alias("h")
            )
            .distinct()
        )
        sk = h.orderBy("h").limit(_TH_K)
        n = h.agg(F.count(F.lit(1)).alias("n"))
        kth = sk.agg(F.max(frac).alias("kth"))
        theta = n.crossJoin(kth).select(
            F.when(F.col("n") >= _TH_K, F.col("kth")).otherwise(F.lit(1.0)).alias("theta"),
            F.col("n"),
        )
        return h, sk, theta

    ha, ska, ta = side(_TH_A)
    hb, skb, tb = side(_TH_B)
    th = (
        ta.select(F.col("theta").alias("theta_a"), F.col("n").alias("xa"))
        .crossJoin(tb.select(F.col("theta").alias("theta_b"), F.col("n").alias("xb")))
        .select(F.least("theta_a", "theta_b").alias("theta"), "xa", "xb")
    )
    sa = ska.crossJoin(F.broadcast(th.select("theta"))).filter(frac < F.col("theta"))
    sb = skb.crossJoin(F.broadcast(th.select("theta"))).filter(frac < F.col("theta"))
    na = sa.agg(F.count(F.lit(1)).alias("na"))
    nb = sb.agg(F.count(F.lit(1)).alias("nb"))
    ni = sa.select("h").join(sb.select("h"), "h").agg(F.count(F.lit(1)).alias("ni"))
    xi = ha.join(hb, "h").agg(F.count(F.lit(1)).alias("xi"))
    return (
        th.crossJoin(na)
        .crossJoin(nb)
        .crossJoin(ni)
        .crossJoin(xi)
        .select(
            F.lit(_TH_K).alias("k"),
            F.col("xa").cast("long").alias("exact_a"),
            F.col("xb").cast("long").alias("exact_b"),
            (F.col("xa") + F.col("xb") - F.col("xi")).cast("long").alias("exact_union"),
            F.col("xi").cast("long").alias("exact_intersection"),
            F.round((F.col("na") + F.col("nb") - F.col("ni")) / F.col("theta"), 6).alias(
                "est_union"
            ),
            F.round(F.col("ni") / F.col("theta"), 6).alias("est_intersection"),
            F.round((F.col("na") - F.col("ni")) / F.col("theta"), 6).alias(
                "est_a_minus_b"
            ),
        )
    )


def old_text_burrows_delta(spark, sf_dir: str):
    """430eddb^:weather_tools_spark/queries/round10.py — the zero-fill
    grid LEFT-joins the vocab-scale (source, word) count frame."""
    from pyspark.sql import functions as F

    from weather_tools_spark.catalog import load_table
    from weather_tools_spark.queries.round10 import _BURROWS_TOPK

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    top = (
        sw.groupBy("w")
        .agg(F.sum("c").alias("cw"))
        .orderBy(F.col("cw").desc(), "w")
        .limit(_BURROWS_TOPK)
        .select("w")
    )
    stot = sw.groupBy("source").agg(F.sum("c").alias("n_s"))
    f = (
        stot.crossJoin(F.broadcast(top))
        .join(sw, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (1000.0 * F.coalesce(F.col("c"), F.lit(0)) / F.col("n_s")).alias("fpm"),
        )
    )
    mu = f.groupBy("w").agg(
        F.avg("fpm").alias("m"),
        F.sqrt(F.avg(F.col("fpm") * F.col("fpm")) - F.avg("fpm") * F.avg("fpm")).alias(
            "sd"
        ),
    )
    z = (
        f.join(F.broadcast(mu), "w")
        .filter(F.col("sd") > 1e-12)
        .select("source", "w", ((F.col("fpm") - F.col("m")) / F.col("sd")).alias("z"))
    )
    a = z.alias("a")
    b = z.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(F.abs(F.col("a.z") - F.col("b.z"))), 6).alias("delta"),
        )
        .orderBy("delta", "source_a", "source_b")
        .limit(25)
    )


def timed(fn, spark, sf):
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "bench_archive", "AB_r11_rewrites.json")
    )
    args = ap.parse_args()

    import bench

    probe_par = bench._host_probe_parallel()

    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    spark = get_spark("ab_r11_rewrites")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = {
        "sketch_kmv_setops": (old_sketch_kmv_setops, SPARK["sketch_kmv_setops"]),
        "text_burrows_delta": (old_text_burrows_delta, SPARK["text_burrows_delta"]),
    }
    out = {
        "sf_dir": args.sf_dir,
        "n_runs_per_arm": args.n,
        "host_probe_par_sec": round(probe_par, 4),
        "host_probe_par_ref": bench._HOST_PROBE_PAR_REF,
        "old_plan_source": "git 430eddb^ (pre-rewrite), reconstructed in this harness",
        "queries": {},
    }
    rc = 0
    for name, (old, new) in pairs.items():
        h_old, h_new = frame_md5(old(spark, args.sf_dir)), frame_md5(new(spark, args.sf_dir))
        if h_old != h_new:
            print(f"{name}: HASH DIVERGENCE old={h_old} new={h_new}", file=sys.stderr)
            rc = 1
        # warm both arms 3x (codegen/JIT converge over ~3 executions for
        # these plans), then interleave the timed runs so drift hits
        # both arms equally
        for _ in range(3):
            timed(old, spark, args.sf_dir)
            timed(new, spark, args.sf_dir)
        t_old, t_new = [], []
        for _ in range(args.n):
            t_old.append(timed(old, spark, args.sf_dir))
            t_new.append(timed(new, spark, args.sf_dir))
        out["queries"][name] = {
            "hash_match": h_old == h_new,
            "md5": h_new,
            "old_median_sec": round(statistics.median(t_old), 3),
            "new_median_sec": round(statistics.median(t_new), 3),
            "old_min_sec": round(min(t_old), 3),
            "new_min_sec": round(min(t_new), 3),
            "old_runs": [round(t, 3) for t in t_old],
            "new_runs": [round(t, 3) for t in t_new],
            "speedup": round(statistics.median(t_old) / statistics.median(t_new), 2),
        }
        print(f"{name}: old {out['queries'][name]['old_median_sec']}s -> "
              f"new {out['queries'][name]['new_median_sec']}s "
              f"({out['queries'][name]['speedup']}x median, "
              f"min {out['queries'][name]['old_min_sec']}->"
              f"{out['queries'][name]['new_min_sec']}), hash_match={h_old == h_new}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
