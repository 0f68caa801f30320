#!/usr/bin/env python3
"""Measure headline-query runtime across the 100x scale-factor span and
write SCALING.md — direct evidence for the 'would this survive a scale-up'
question. min-of-2 executions per (query, sf), same methodology as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "q1_pricing_summary",
    "q21_waiting_orders",
    "xql_daily_avg",
    "events_sessionization",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_embedding_lsh_pairs",
    "sim_lsh_ann_topk",
    "text_langid_distribution",
    "corpus_decontamination",
    "events_conversion_window",
    "events_transition_matrix",
    "orders_cohort_retention",
    # round-4 continuation operators
    "dedup_jaccard_prefix_pairs",
    "ml_kmeans_cluster_summary",
    "ml_semdedup_keep_rate",
    "text_bm25_topk",
    "corpus_quality_classifier",
    "geo_radius_join_bucketed",
    "graph_pagerank_nations",
    "events_ewma_daily",
    "geo_utm_project",
    # round-4 session-4 operators
    "corpus_bpe_train",
    "corpus_gopher_rules",
    "graph_triangle_census",
    "weather_etccdi_spells",
    "multimodal_image_decode_agg",
    "multimodal_audio_features",
    "sketch_hll_registers",
    "sketch_countmin_point",
    "events_funnel_steps",
    "mv_incremental_refresh",
    "cdc_apply_latest_snapshot",
    # round-4 session-5 operators
    "graph_shortest_paths",
    "analytics_skyline_parts",
    "events_cusum_changepoint",
    "geo_geohash_cells",
    "sketch_kmv_setops",
    "sample_weighted_priority",
    "ml_pca_power_iteration",
    "cdc_scd2_history",
    "linkage_fuzzy_part_names",
    "finance_largest_remainder_allocation",
    "stats_poisson_bootstrap_ci",
    "privacy_dp_noisy_counts",
    "multimodal_video_scene_changes",
    "events_sliding_window_agg",
    "events_mad_outliers",
    "events_attribution_linear",
    "mv_join_delta_refresh",
    "storage_zorder_clustering",
    "graph_kcore",
    "events_holt_forecast",
    "sim_mmr_diverse_topk",
    "format_transcode_chain",
    # round-7 data-selection operators
    "corpus_dsir_importance",
    "corpus_soft_dedup_weights",
    "dedup_paragraph_dupes",
    "dedup_containment_pairs",
    "sketch_moments_merge_parity",
    "sim_pq_adc_topk",
    "graph_adamic_adar_linkpred",
    "privacy_l_diversity",
    "text_kneser_ney_ppl",
    "ml_logreg_newton",
    "stats_ks_two_sample",
    "privacy_t_closeness",
    "ml_kmeanspp_init",
    "graph_ktruss",
    "weather_weibull_wind",
    "stats_mannwhitney_u",
    "ml_ndcg_ranking_eval",
    "ml_calibration_report",
    "stats_chi2_independence",
    # round-6 codec hash-gates
    "grib_jpeg2000_roundtrip_agg",
    "hdf5_dense_roundtrip_agg",
]

SFS = ["0.001", "0.01", "0.1"]

# One-line shuffle-topology explanations for queries whose measured
# sf0.1/sf0.001 ratio exceeds 3x per 100x data (verdict r5 task 5).
# Kept here so regenerating SCALING.md preserves them.
NOTES = {
    "dedup_minhash_md5_audit": (
        "AUDIT_ONLY regression canary: computes banded LSH pairs AND exact "
        "md5 signatures to cross-certify, so its cost is two pipelines; the "
        "banded-pair join volume grows with true near-dup density, which the "
        "synthetic corpus scales super-linearly at these toy SFs."
    ),
    "dedup_simhash_md5_audit": (
        "AUDIT_ONLY twin of the minhash audit — same double-pipeline "
        "cross-certification cost, same banded-pair growth."
    ),
    "dedup_winnowing_md5_audit": (
        "AUDIT_ONLY twin — fingerprint-band pairs plus exact md5 audit."
    ),
    "graph_triangle_census": (
        "O(m^1.5) degree-ordered wedge join: candidate volume grows m^1.5 "
        "per m edges by design — sub-quadratic but super-linear; the ratio "
        "reflects the algorithm's bound, not a shuffle pathology."
    ),
    "join_salted_equivalence": (
        "Deliberately materializes BOTH the salted and unsalted join to "
        "hash-gate their equivalence — twice the join volume of a production "
        "plan; the salt fan-out multiplies probe rows by the salt width."
    ),
    "orders_price_percentiles": (
        "Exact percentiles build per-group sorted value sketches; value "
        "volume grows linearly and the percentile merge is the documented "
        "exact-quantile cost (the approx path is the scale default)."
    ),
    "mv_incremental_refresh": (
        "Union + full re-aggregate of base and delta at every refresh: cost "
        "tracks total input size by construction; at production scale the "
        "delta partition-prunes and the base aggregate is the stored MV."
    ),
    "unpivot_lineitem_metrics": (
        "Stack/unpivot multiplies rows by the metric count before the "
        "aggregate, so input volume (and the partial-agg combine) scales "
        "with rows x metrics — map-side only, no extra shuffle."
    ),
    "text_bigram_counts": (
        "Explode to one row per bigram token before the count aggregate: "
        "row volume is corpus tokens, the dominant linear term; two-phase "
        "agg keeps the shuffle bounded by distinct bigrams."
    ),
    "corpus_gopher_rules": (
        "Explode-to-tokens rule evaluation: per-token row volume dominates; "
        "all aggregates are map-combinable, no joins."
    ),
    "events_sliding_window_agg": (
        "Range-frame window over per-key event sequences: state per key "
        "grows with events/key at larger SFs; partitioned by key, no "
        "global window."
    ),
    "graph_adamic_adar_linkpred": (
        "Co-purchase pair expansion: candidate volume is sum over parts of "
        "C(buyers, 2), which grows super-linearly while buyer counts climb "
        "toward the 2..20 cap at larger SFs; the cap bounds it at "
        "C(20,2) x parts — linear beyond that point, same guard as the "
        "dedup shingle df cap."
    ),
    "dedup_containment_pairs": (
        "Exact-pairs operator: same capped by-shingle expansion cost "
        "profile as dedup_ngram_jaccard_pairs (bounded by C(20,2) per "
        "shingle), plus the both-directions explode; pair volume tracks "
        "true near-dup density at toy SFs."
    ),
    "geo_radius_join_bucketed": (
        "Result-size bound, not a plan problem: both tables densify in a "
        "FIXED geography, so the number of true within-radius pairs (the "
        "query's own output and the per-cell candidate volume) grows "
        "~quadratically with SF; the bucketed join keeps the candidate "
        "set proportional to that true match volume."
    ),
    "text_bm25_topk": (
        "Linear token-volume term emerging from under the ~0.5 s fixed "
        "overhead that dominates sf0.001: corpus tokens explode to one "
        "row each before the per-term aggregates; 3.5x per 100x data is "
        "strongly sub-linear, two-phase aggs throughout."
    ),
    "ml_calibration_report": (
        "Explode-to-tokens scoring pass (one row per corpus token for "
        "the hashing-trick features) is the dominant linear term "
        "emerging from under fixed overhead; the bin aggregate itself "
        "is 10 rows. Same cost family as text_bm25_topk/bigram_counts."
    ),
    "window_running_customer_spend": (
        "Running-sum window partitioned by customer: per-customer "
        "sequence volume grows linearly with SF (more orders per "
        "customer), the dominant linear term emerging from fixed "
        "overhead; partitioned by a high-cardinality key, never global."
    ),
    "dedup_paragraph_dupes": (
        "LINEAR operator emerging from fixed overhead: one "
        "groupBy+join over every 10-word chunk (rows = corpus tokens "
        "/ 10, output = one row per doc); the sfx1.0 probe "
        "(SCALING_sf1) measures 11.4x per 100x data — no super-linear "
        "term."
    ),
    "topk_orders_per_priority": (
        "Rank window partitioned by the 5 priorities; Catalyst inserts "
        "a PARTIAL WindowGroupLimit BEFORE the exchange (pinned in "
        "test_plan_quality), so the shuffle carries only partitions x k "
        "rows per group — the measured ratio is the map-side scan/sort "
        "term, linear, emerging from fixed overhead."
    ),
    "multimodal_image_decode_agg": (
        "Arrow decode kernel cost is linear in image bytes by nature "
        "(per-pixel BMP parse in the mapInPandas stage); the ratio is "
        "the linear decode term emerging from under the ~0.5 s fixed "
        "overhead — strongly sub-linear per 100x data, no shuffle "
        "pathology (single scan, map-combinable aggregate)."
    ),
}


def _all_probes() -> list[str]:
    """The curated probe list UNION the full bench headline set, so
    every headline query has a measured 3-SF row (r5 verdict task 5);
    curated non-headline probes (audit/heavy representatives) stay."""
    import bench

    merged = list(PROBES)
    merged += [n for n in bench.HEADLINE if n not in merged]
    return merged


def main() -> None:
    from weather_tools_spark.operators.dedup import release_persisted
    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_path = os.path.join(repo, ".scaledata", "scaling_probe_cache.json")
    probes = _all_probes()
    results: dict[str, dict[str, float]] = {}
    # Resumable: a full 3-SF regen is ~45 min, past any single run
    # budget. Cached (query, sf) timings are reused; delete the cache
    # to force a cold re-measure.
    if os.path.exists(cache_path):
        import json as _json

        with open(cache_path) as f:
            results = _json.load(f)
    for sf in SFS:
        # FRESH session per scale factor: a single long-lived JVM ages
        # (code cache, GC pressure, listener state) across the 3 x
        # len(probes) query loop, inflating whichever SF runs last and
        # poisoning the cross-SF ratios (measured: trivial single-scan
        # queries read 5-7x when sf0.1 ran ~250 queries into the
        # session). Per-SF sessions give every loop the same aging
        # profile, so position-dependent overhead cancels in the ratio.
        todo = [n for n in probes if sf not in results.get(n, {})]
        if not todo:
            continue
        spark = get_spark("scaling_probe")
        sf_dir = f"/root/testdata/sf{sf}"
        for name in todo:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                SPARK[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_persisted()
            results.setdefault(name, {})[sf] = round(best, 3)
        # SparkContext.stop() clears the active context under its own
        # lock; builder.getOrCreate() detects the stopped context and
        # makes a fresh one — no private-attribute reset needed.
        spark.stop()
        import json as _json

        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as f:
            _json.dump(results, f, indent=1)

    missing = [n for n in probes for sf in SFS if sf not in results.get(n, {})]
    if missing:
        print(f"partial: {len(missing)} (query, sf) cells still unmeasured — rerun to continue")
        return

    from weather_tools_spark.session import default_parallelism

    lines = [
        "# SCALING — measured runtime across a 100x data span",
        "",
        "Generated by tools/scaling_probe.py: min-of-2 executions per",
        "(query, scale factor), FRESH local[{}] session per SF (a shared".format(
            default_parallelism()
        ),
        "session ages over the probe loop and inflates whichever SF runs",
        "last — per-SF sessions make the aging cancel in the ratio).",
        "ratio t(sf0.1)/t(sf0.001) against the 100x data ratio: fixed",
        "per-query overhead (plan compile, job launch) dominates at these",
        "sizes, so a ratio far below 100 means the data-dependent cost is",
        "comfortably sub-linear in this regime — the shuffle-bound terms",
        "(pair joins, banded LSH) are the ones to watch as they approach",
        "the data ratio.",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | t(0.1)/t(0.001) vs 100x data |",
        "|---|---|---|---|---|",
    ]
    hot: list[tuple[str, float]] = []
    for name in probes:
        r = results[name]
        ratio = r["0.1"] / max(r["0.001"], 1e-9)
        lines.append(
            f"| {name} | {r['0.001']} | {r['0.01']} | {r['0.1']} | {ratio:.1f}x |"
        )
        if ratio > 3.0:
            hot.append((name, ratio))
    lines.append("")
    if hot:
        lines.append("## Ratios above 3x — topology notes")
        lines.append("")
        lines.append(
            "Queries whose sf0.1/sf0.001 ratio exceeds 3x per 100x data;"
        )
        lines.append(
            "each needs (or has) a one-line shuffle-topology explanation:"
        )
        lines.append("")
        for name, ratio in sorted(hot, key=lambda t: -t[1]):
            note = NOTES.get(
                name,
                "UNEXPLAINED — inspect the plan before shipping (PLANS.md row, "
                ".explain('formatted')).",
            )
            lines.append(f"- **{name}** ({ratio:.1f}x): {note}")
        lines.append("")
    out = os.path.join(repo, "SCALING.md")
    # Preserve hand-measured sections appended after the main table
    # (SCALING_sf1 — the 100x-span probe lives on generated data and is
    # not re-derivable from /root/testdata).
    extra = ""
    if os.path.exists(out):
        prev = open(out).read()
        idx = prev.find("\n## SCALING_sf1")
        if idx != -1:
            extra = prev[idx:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + extra)
    print(f"SCALING.md written: {len(probes)} probes x {len(SFS)} SFs")


if __name__ == "__main__":
    main()
