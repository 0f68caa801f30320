"""Decade exponent fit for the 18 post-r11 queries (waves 8/8b/9/10).

Times ONLY the Spark query (collect; no oracle, no compare) at
.scaledata/sfx0.1 and .scaledata/sfx1.0, min of N runs each, and fits
the per-query scaling exponent log10(t1/t0.1) — the same
self-consistent generator series the sfx3/sfx10 probes use, so a
super-linear term shows up as exponent >> 1 rather than being masked
by the saturating driver-testdata corpus. Writes
.scaledata/newwave_exponents.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

NEW = [
    "ml_average_precision", "stats_ljung_box", "graph_modularity_regions",
    "ml_lift_gains_deciles", "ml_brier_decomposition", "ml_mrr_retrieval",
    "stats_mann_kendall", "events_turning_points", "graph_reciprocity",
    "stats_sign_test", "stats_ansari_bradley", "stats_ad_two_sample",
    "stats_cramer_von_mises", "ml_macro_f1_multiclass",
    "graph_harmonic_centrality", "stats_brunner_munzel",
    "events_poisson_rate_test", "text_js_divergence_pairs",
]
N_RUNS = 2


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from weather_tools_spark.queries import SPARK

    stores = {
        "sfx0.1": os.path.join(here, ".scaledata", "sfx0.1"),
        "sfx1.0": os.path.join(here, ".scaledata", "sfx1.0"),
    }
    out: dict[str, dict] = {}
    for name in NEW:
        rec: dict[str, float] = {}
        for label, sf in stores.items():
            best = None
            for _ in range(N_RUNS):
                t0 = time.time()
                SPARK[name](spark, sf).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rec[label] = round(best, 3)
        import math

        rec["exponent"] = round(
            math.log10(max(rec["sfx1.0"], 1e-3) / max(rec["sfx0.1"], 1e-3)), 2
        )
        out[name] = rec
        print(f"{name:32s} {rec['sfx0.1']:7.2f}s {rec['sfx1.0']:7.2f}s "
              f"exp={rec['exponent']:5.2f}", flush=True)
    path = os.path.join(here, ".scaledata", "newwave_exponents.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    bad = {k: v for k, v in out.items() if v["exponent"] > 1.3}
    print("exponents > 1.3:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
