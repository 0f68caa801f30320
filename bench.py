#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()-style action that forces full
evaluation without collecting rows to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Engine-independent host-speed probe (ADVICE r9): sort + cumsum of 4M
# doubles, min-of-3. Single-threaded NumPy, no BLAS matmul (thread-count
# sensitive), no Spark — so an engine regression cannot scale it. The
# reference constant is the value measured on the r10 host (0.075 s,
# q1_pricing_summary ~0.8 s class); a 2x-slower host probes ~0.15 s and
# the budget gates scale accordingly.
_HOST_PROBE_REF = 0.075
# Parallel-probe reference (r11, VERDICT r10: the single-threaded probe
# missed a real 1.5x JVM-level slowdown on the r10 driver host — one
# NumPy thread cannot see parallelism-level contention, CPU
# oversubscription, or cgroup throttling, which hit a 32-thread Spark
# stage but not a lone sort). Reference: 16 threads each sorting 2M
# doubles, wall-clock min-of-3 — idle r11 host measures 0.044-0.057 s
# over repeated trials; 0.058 sits just above that band so a healthy
# host calibrates to 1.0 while a contended one (a concurrent 32-thread
# sweep probed 0.248 s) scales the gates. Sanity cross-check: the same
# probe under a running strict sweep measured 4.4x the idle value.
_HOST_PROBE_PAR_REF = 0.058


def _host_probe() -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.standard_normal(4_000_000)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.sort(x).cumsum().sum()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _host_probe_parallel(n_threads: int = 16) -> float:
    """Wall-clock for N concurrent sort+cumsum threads (NumPy releases
    the GIL in sort for large arrays, so these genuinely contend for
    cores the way a Spark stage's tasks do). Engine-independent like
    the single-threaded probe; unlike it, this one slows down when the
    machine cannot actually run N threads at full speed — the exact
    condition under which every 32-thread Spark stage slows too."""
    import threading

    import numpy as np

    rng = np.random.default_rng(11)
    arrays = [rng.standard_normal(2_000_000) for _ in range(n_threads)]

    def work(a) -> None:
        np.sort(a).cumsum().sum()

    best = None
    for _ in range(3):
        threads = [threading.Thread(target=work, args=(a,)) for a in arrays]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q21_waiting_orders",
    "q22_global_sales_opportunity",
    "topk_orders_per_priority",
    "window_running_customer_spend",
    "cube_qty_by_flag_status",
    "range_join_value_buckets",
    "xql_daily_avg",
    "xql_monthly_multi_agg",
    "xql_where_or",
    "events_minute_window_agg",
    "events_sessionization",
    "events_asof_join_orders",
    "dedup_exact_canonical",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_winnowing_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh_pairs",
    "sim_cosine_topk",
    "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
    "sim_label_centroid_distance",
    # agg_exact_percentiles stays oracle-checked but out of the headline
    # set: Spark's exact percentile builds per-group value maps and its
    # runtime swings 3-11s with GC pressure, dominating bench variance
    "text_token_stats",
    "text_quality_scores",
    "text_langid_distribution",
    # round-2 additions (the heavyweight audits — banded recall, cluster
    # canonical — stay oracle-checked but out of the headline set, like
    # agg_exact_percentiles, to keep bench variance low)
    "dedup_minhash_md5_audit",
    "dedup_winnowing_md5_audit",
    "dedup_simhash_md5_audit",
    "events_resample_1h_gapfill",
    "geo_webmercator_project",
    "multimodal_frame_resize_plan",
    "corpus_train_split",
    "dq_column_profile",
    "join_salted_equivalence",
    "events_conversion_window",
    "sample_stratified_deterministic",
    "unpivot_lineitem_metrics",
    "corpus_decontamination",
    "orders_cohort_retention",
    "text_repetition_profile",
    "events_value_outliers",
    "events_transition_matrix",
    "orders_price_percentiles",
    "customer_rfm_segments",
    "text_bigram_counts",
    "events_hourly_seasonality",
    "text_heavy_hitters_audit",
    "orders_open_backlog_monthly",
    # round-4 session-4 additions (cheap representatives; the heavy
    # graph_triangle_census stays oracle-checked but out of the
    # headline set like the audits, to keep bench variance low)
    "corpus_bpe_train",
    "corpus_gopher_rules",
    "sketch_hll_registers",
    "events_funnel_steps",
    "mv_incremental_refresh",
    "cdc_apply_latest_snapshot",
    "multimodal_image_decode_agg",
    "weather_etccdi_spells",
    # round-4 session-5 additions (cheap representatives; the heavier
    # graph_shortest_paths stays oracle-checked but out of the headline
    # set like the audits)
    "events_autocorrelation",
    "dq_benford_first_digit",
    "events_json_native_extract",
    "events_cusum_changepoint",
    "sample_weighted_priority",
    "geo_geohash_cells",
    "sketch_kmv_setops",
    "analytics_skyline_parts",
    "ml_pca_power_iteration",
    # session-5 later waves (cheap representatives; the transcode chain
    # and scene-change decode stay oracle-checked but out of the
    # headline set like the audits)
    "events_mad_outliers",
    "dq_median_imputation",
    "events_holt_forecast",
    "orders_hhi_concentration",
    "text_readability_flesch",
    "storage_zorder_clustering",
    "mv_join_delta_refresh",
    "events_attribution_linear",
    "sim_mmr_diverse_topk",
    # round-7 data-selection operators (queries/selection.py)
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
    # round-8 statistics / corpus-profile wave
    "stats_spearman_corr",
    "stats_anova_f",
    "stats_ttest_welch",
    "events_markov_stationary",
    "text_hapax_legomena",
    "ml_decision_stump",
    "ml_knn_label_accuracy",
    "stats_kendall_tau",
    "text_langid_cohens_kappa",
    "sim_cosine_topk_blocked",
    # round-9 wave (variance-homogeneity gate, burstiness screen,
    # NB langid, inequality measure on the distributed prefix sum)
    "stats_levene_test",
    "events_dispersion_index",
    "ml_naive_bayes_langid",
    "orders_gini_coefficient",
    # round-9 wave 2 (Lorenz drill-down, lexical diversity, MCC eval,
    # inter-arrival cadence)
    "orders_lorenz_deciles",
    "text_ttr_standardized",
    "ml_langid_mcc",
    "events_interarrival_quantiles",
    # round-9 wave 3 (cohort retention triangle, reproducible CV folds,
    # association effect size)
    "events_retention_triangle",
    "ml_kfold_split_balance",
    "stats_cramers_v",
    # round-10 wave (ensemble learner, JL projection, GK rank bounds,
    # FDR control, closed-form OLS, MI feature ranking)
    "ml_adaboost_stumps",
    "sim_random_projection_jl",
    "sketch_quantile_rank_bounds",
    "stats_benjamini_hochberg",
    "ml_ols_normal_equations",
    "ml_mutual_information_rank",
    # round-10 wave 2 (exact AUC, sequence entropy, mixture drift,
    # stylometric provenance, robust trend)
    "ml_roc_auc_exact",
    "events_entropy_rate",
    "corpus_source_kl_divergence",
    "text_burrows_delta",
    "stats_theil_sen_trend",
    # round-10 wave 3 (link-analysis eigenvectors, AR-order diagnostic,
    # data-scaling curve)
    "graph_hits_nations",
    "events_pacf_durbin_levinson",
    "ml_nb_learning_curve",
    # round-11 wave (corpus growth law on the probed cumulative-sums
    # dispatcher, join-shaped sequence statistics, long-range dependence)
    "text_heaps_law_fit",
    "stats_runs_test",
    "events_hurst_exponent",
    # round-11 wave 2 (single-pass seasonality detection, robust
    # location estimation; graph_local_clustering_brand stays
    # oracle-checked but out of the headline set — its DuckDB oracle
    # recomputes the triangle set, heavyweight like the census)
    "events_spectral_periodogram",
    "stats_hodges_lehmann",
    # round-11 wave 3 (two-pass standardized moments, keyness,
    # integer richness constants, equity-curve risk, residual
    # autocorrelation, chained-CTE-replayed components)
    "stats_jarque_bera",
    "text_dunning_g2_keywords",
    "text_yule_k",
    "events_max_drawdown",
    "stats_durbin_watson",
    "graph_connected_components",
    # round-11 wave 4 (rank/binary repeated measures, spectrum
    # smoothing, stream stability, variance homogeneity, graph mixing)
    "stats_friedman_test",
    "stats_cochran_q",
    "text_good_turing",
    "events_allan_variance",
    "stats_bartlett_test",
    "graph_assortativity",
    # round-11 wave 5 (moment-sketch merge parity, sequential drift,
    # memorization screen, lexical overlap, paired location shift,
    # single-outlier screen)
    "sketch_ams_f2",
    "events_page_hinkley",
    "corpus_ngram_novelty",
    "text_vocab_jaccard_sources",
    "stats_wilcoxon_signed_rank",
    "stats_grubbs_statistic",
    # round-11 wave 6 (k-sample rank/median tests on the hardened
    # cumulative path, box-plot fences, normalized link prediction)
    "stats_kruskal_wallis",
    "stats_mood_median",
    "dq_iqr_outliers",
    "graph_edge_jaccard",
    # round-11 wave 7 (effect sizes, vocabulary-richness triple
    # completion, extreme-value tail fit)
    "stats_effect_sizes",
    "text_honore_sichel",
    "events_peak_over_threshold",
    # round-12 wave 8 (ranking/calibration eval completion, portmanteau
    # autocorrelation test, partition quality)
    "ml_average_precision",
    "stats_ljung_box",
    "graph_modularity_regions",
    "ml_lift_gains_deciles",
    "ml_brier_decomposition",
    "ml_mrr_retrieval",
    "stats_mann_kendall",
    "events_turning_points",
    "graph_reciprocity",
    # round-12 wave 9 (classical nonparametric completion: sign test,
    # scale test, tail- and body-weighted distribution equality;
    # multiclass eval; disconnection-safe centrality)
    "stats_sign_test",
    "stats_ansari_bradley",
    "stats_ad_two_sample",
    "stats_cramer_von_mises",
    "ml_macro_f1_multiclass",
    "graph_harmonic_centrality",
    # round-12 wave 10 (shape-robust rank test, rate-drift gate,
    # symmetric source-divergence for mixture design)
    "stats_brunner_munzel",
    "events_poisson_rate_test",
    "text_js_divergence_pairs",
    # round-12 wave 11 (ordered-alternative trend test, proper-scoring
    # eval completion)
    "events_jonckheere_terpstra",
    "ml_log_loss",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # measure the host-speed probes BEFORE the JVM exists: run after the
    # query loop they also measure the session's residual threads (GC,
    # shutdown hooks) — the r11 bench saw the 16-thread probe read 2.08x
    # on an idle host purely from post-run JVM residue, which would
    # over-loosen the gates. Probing first measures the HOST.
    probe = _host_probe()
    probe_par = _host_probe_parallel()

    from weather_tools_spark.queries import SPARK
    from weather_tools_spark.session import get_spark

    spark = get_spark("weather_tools_spark_bench")
    # warm the JVM (codegen, shuffle machinery, parquet footers) with one
    # untimed run of the first headline query so the timed numbers
    # measure steady-state execution rather than first-query JIT warmup
    from weather_tools_spark.catalog import load_table

    load_table(spark, "lineitem", sf_dir).count()
    SPARK[HEADLINE[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # ...and the shingle/pair-expansion codegen path: the exploded-
    # combination expressions take ~3 executions to reach steady state
    # (measured 3.3 -> 2.4 s across 5 runs), so one untimed pass keeps
    # min-of-2 from recording mid-JIT numbers for the dedup family
    SPARK["dedup_ngram_jaccard_pairs"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    from weather_tools_spark.operators.dedup import release_persisted as _rp

    _rp()
    # ...and warm the Python/Arrow worker pool: the first Arrow stage of
    # the session pays worker spawn + numpy/pandas import on every core
    # (~5-10s across 32 workers) — a fixed session cost, not per-query
    # throughput. One tiny mapInPandas over one partition per core
    # pre-imports the kernels so Python-stage timings are steady-state.
    import pandas as _pd

    def _warm(batches):
        import numpy as _np  # noqa: F401

        for b in batches:
            yield _pd.DataFrame({"x": b["x"]})

    (
        spark.range(256).selectExpr("id as x")
        .repartition(int(spark.sparkContext.defaultParallelism))
        .mapInPandas(_warm, "x long")
        .write.format("noop").mode("overwrite").save()
    )

    # min-of-3 per query (r9, was min-of-2): the first execution pays
    # Catalyst plan compilation + JIT (irrelevant to sustained 100-TB
    # throughput) and single-shot numbers swing ±50% with host jitter;
    # the minimum of three full executions measures steady-state — the
    # r8→r9 round-over-round comparison showed min-of-2 still carries
    # noise-scale drift on sub-second queries. Disclosed in the JSON.
    #
    # r12 (VERDICT r11): the mid-loop parallel probe makes a contention
    # spike DURING the run visible (the start-of-run probe is a single
    # sample of a noisy neighbor process), and when any probe window
    # exceeds the 3.0 calibration clamp the whole headline loop runs a
    # SECOND pass keeping per-query minimums — min-across-windows is
    # the only defensible estimator when contention is beyond what the
    # clamp can normalize (the r11 driver host measured 11.3x on the
    # parallel probe; its raw numbers were inflated past the clamped
    # calib and a noisier host could false-fail the 2x gate despite a
    # healthy engine).
    probe_par_mid: float | None = None

    def _timing_pass(prev: dict[str, float]) -> dict[str, float]:
        nonlocal probe_par_mid
        out = dict(prev)
        names = [n for n in HEADLINE if n in SPARK]
        for i, name in enumerate(names):
            fn = SPARK[name]
            best = out.get(name)
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                # release dedup-operator persisted intermediates so a
                # long bench session doesn't accumulate cached partitions
                from weather_tools_spark.operators.dedup import release_persisted

                release_persisted()
            out[name] = round(best, 2)
            if probe_par_mid is None and i == len(names) // 2:
                probe_par_mid = _host_probe_parallel()
        return out

    timings = _timing_pass({})
    calib_unclamped = max(
        1.0,
        probe / _HOST_PROBE_REF,
        probe_par / _HOST_PROBE_PAR_REF,
        (probe_par_mid or 0.0) / _HOST_PROBE_PAR_REF,
    )
    n_passes = 1
    if calib_unclamped > 3.0:
        print(
            f"WARNING: host contention {calib_unclamped:.1f}x exceeds the "
            "3.0 calibration clamp — running a second headline pass and "
            "keeping per-query minimums",
            file=sys.stderr,
        )
        timings = _timing_pass(timings)
        n_passes = 2

    total = round(sum(timings.values()), 2)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Budget guard (VERDICT r7 task 6): the headline set grows every
    # round (46.7s → 84.6s total), which erodes the driver's 2× bar by
    # accretion rather than regression. Gate the per-query MEAN (<1.0s
    # at sf0.1 — headline queries are sub-second by design; audits live
    # in AUDIT_ONLY) and a total budget that scales with set size so
    # adding queries can't hide a per-query regression. Warn-only at
    # other SFs (the budget is calibrated to sf0.1 on local[32]).
    #
    # Host calibration (r9): absolute wall-clock gates conflate engine
    # regressions with machine speed — the r9 host ran EVERY stable
    # query 1.7-2.6× slower than the r8 host (q1 0.89s vs 0.52s, q21
    # 1.98s vs 0.75s) with identical plans, so the gates scale by a
    # measured host factor.
    # r10 (ADVICE r9): calibration moved OFF q1 onto an
    # engine-independent NumPy probe (sort+cumsum of 4M doubles,
    # single-threaded, min-of-3; 0.075 s reference on the r9/r10 host).
    # A uniform engine regression (lost codegen, slow load_table)
    # scales q1 but NOT the probe, so it can no longer launder itself
    # through the calibration; the 3x cap stays as a backstop against
    # probe-only anomalies (e.g. a BLAS/thermal outlier).
    # r11 (VERDICT r10): calibrate on the MAX of the single-threaded and
    # the 16-thread parallel probe — the r10 driver host ran q1 1.5x
    # slower at host_calib 1.0 because JVM/parallelism-level contention
    # is invisible to one NumPy thread. The parallel probe contends for
    # cores exactly like a Spark stage, so that class of host slowness
    # now scales the gates instead of eating the budget margin. Both
    # probes are measured at program start, before the JVM exists.
    # The clamped factor scales the GATES (a backstop against probe-only
    # anomalies); the raw ratio is recorded unclamped so a reader can
    # see when the host was contended beyond what the clamp normalizes
    # (r12, VERDICT r11 — on such hosts the loop above already ran a
    # second pass, so the recorded minimums come from two probe windows).
    calib = min(3.0, calib_unclamped)
    mean = (total / len(timings)) if timings else 0.0
    if timings and sf_val == 0.1:
        if mean >= 1.0 * calib or total >= 150.0 * calib:
            print(
                f"FATAL: bench budget exceeded: mean {mean:.3f}s/query "
                f"(gate {1.0 * calib:.2f}s) total {total}s "
                f"(gate {150.0 * calib:.0f}s, {len(timings)} queries, "
                f"host calibration x{calib:.2f})",
                file=sys.stderr,
            )
            sys.exit(1)
    # The driver records only the last 2 KB of stdout and parses the
    # FINAL line. At 89+ headline queries the full per-query map is
    # ~2.9 KB — past the tail — which left BENCH_r04 `parsed: null`.
    # So: the final stdout line is a COMPACT summary (<200 B, always
    # fits), and the per-query detail goes to (a) stderr and (b) a
    # committed BENCH_detail.json next to this script, so it stays
    # inspectable per-round without riding the parsed line.
    detail = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        # host-speed telemetry (VERDICT r9 task 8): raw NumPy probe,
        # the calibration factor derived from it, q1 as the historical
        # cross-round control, and the host-normalized mean so
        # cross-round per-query comparisons are readable at a glance
        "host_probe_sec": round(probe, 4),
        "host_probe_par_sec": round(probe_par, 4),
        "host_probe_par_mid_sec": round(probe_par_mid, 4) if probe_par_mid else None,
        "host_calib": round(calib, 3),
        "host_calib_unclamped": round(calib_unclamped, 3),
        "n_passes": n_passes,
        "q1_sec": timings.get("q1_pricing_summary"),
        "sec_per_query": round(mean, 4),
        "sec_per_query_normalized": round(mean / calib, 4),
        "queries": timings,
    }
    detail_line = json.dumps(detail, separators=(",", ":"))
    print(detail_line, file=sys.stderr)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_detail.json"), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=False)
            f.write("\n")
    except OSError as e:  # read-only checkout: detail still on stderr
        print(f"WARNING: could not write BENCH_detail.json: {e}", file=sys.stderr)
    # r13 (VERDICT r12 item 9): the driver tails the last 2000 chars of
    # output and parses the FINAL line (BENCH_r01..r12 all have
    # tail_len == 2000 exactly; r01/r03 fit the full queries dict at
    # 39/63 queries, r02/r04 overflowed it and parsed as null). At 193
    # queries the dict is ~6 KB — it physically cannot ride the parsed
    # line — so the per-query detail stays in BENCH_detail.json +
    # stderr, and the parsed line gains ADDITIONS-ONLY aggregates the
    # round-over-round comparator can use without the dict: the
    # per-query geometric mean and the host calibration factors.
    import math as _math

    geomean = (
        round(
            _math.exp(
                sum(_math.log(max(v, 0.005)) for v in timings.values())
                / len(timings)
            ),
            4,
        )
        if timings
        else None
    )
    line = json.dumps(
        {
            "metric": "headline_total_sec",
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "n_queries": len(timings),
            "geomean_sec": geomean,
            "host_calib": round(calib, 3),
            "host_calib_unclamped": round(calib_unclamped, 3),
            "detail_file": "BENCH_detail.json",
        },
        separators=(",", ":"),
    )
    if len(line) >= 500:  # always-on (asserts vanish under python -O):
        # the driver tails stdout, so the summary must stay one short line
        print(f"FATAL: bench summary line {len(line)}B >= 500B budget", file=sys.stderr)
        sys.exit(1)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
