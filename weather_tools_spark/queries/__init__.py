"""Query registry — the correctness surface of the engine.

Every operator the engine claims (SURVEY.md §2 plus the LLM-data-pipeline
extensions) is exposed here as a named query:

- ``SPARK[name]``  : Callable[(SparkSession, sf_dir) -> DataFrame]
- ``ORACLE[name]`` : equivalent ANSI SQL for the DuckDB oracle, or absent
  for genuinely non-SQL-expressible operators (approximate/stateful ones),
  which the driver then checks rows-only.

Column-naming contract: aggregates/computed columns are aliased
identically in the Spark plan and the oracle SQL (the driver hashes
values under sorted column names). Float aggregates are rounded on BOTH
sides (same literal decimals) so partial-aggregation order can't flip a
hash bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Queries whose CHECK changed this round (new or upgraded oracle, or a
# rewritten execution path): forced to the very front of the driver
# ordering so the new gate actually runs this round even though an old
# clean verdict exists for the name.
CHECK_CHANGED: list[str] = [
    "zarr_pruned_scan_agg",        # r4: NEW — real Zarr v2 decode, oracle-gated
    "netcdf_roundtrip_agg",        # r4: NEW — stdlib classic-NetCDF codec, oracle-gated
    "geotiff_roundtrip_agg",       # r4: NEW — stdlib GeoTIFF codec, oracle-gated
    "grib_roundtrip_agg",          # r4: NEW — stdlib GRIB2 simple-packing codec, oracle-gated
    "grib1_roundtrip_agg",         # r4: NEW — stdlib GRIB edition-1 codec (IBM float), oracle-gated
    "geo_lambert_project",         # r4: NEW — Lambert conformal conic CRS transform, oracle-gated
    "netcdf4_roundtrip_agg",       # r4: NEW — stdlib HDF5/NetCDF-4 subset codec, oracle-gated
    "regrid_conservative_agg",     # r4: NEW — area-weighted conservative regrid, oracle-gated
    "weather_ensemble_stats",      # r4: NEW — ensemble `number` axis statistics, oracle-gated
    "weather_forecast_leadtime",   # r4: NEW — step/valid_time lead-time semantics, oracle-gated
    "grib_reduced_gaussian_agg",   # r4: NEW — ERA5-native reduced-Gaussian decode, oracle-gated
    "dl_config_grammar_fanout",    # r4: NEW — weather-dl .cfg grammar → fan-out, oracle-gated
    "dq_distribution_drift",       # r4: NEW — PSI drift between corpus snapshots, oracle-gated
    "grib_manifest_pruned_scan",   # r4: NEW — kerchunk-style byte-range manifest scan, oracle-gated
    "xql_zarr_daily_avg",          # r4: NEW — flagship xql-over-Zarr flow, oracle-gated
    "text_pii_scrub",              # r4: NEW — PII redaction, digest-gated
    "corpus_chunk_documents",      # r4: NEW — sliding-window chunking, per-chunk hash-gated
    "corpus_pack_sequences",       # r4: NEW — concat-and-split packing via distributed prefix sum
    "pipeline_compaction_report",  # r4: rows-only → FS-independent oracle
    "pipeline_quarantine_report",  # r4: rows-only → FS-independent oracle + reason histogram
    "dedup_embedding_cosine",      # r4: rerouted to the blocked exact kernel
    "dedup_ngram_jaccard_pairs",   # r4: capped path now grouped pair-gen + arrow shingles
    "corpus_decontamination",      # r4: arrow shingle kernel
    "dedup_minhash_lsh_pairs",     # r4: carried-signature banding + arrow shingles
    "dedup_winnowing_pairs",       # r4: arrow ordered-shingle kernel
    "geo_utm_project",             # r4: NEW — ellipsoidal UTM (Krüger series), oracle-gated
    "geo_datum_shift",             # r4: NEW — ECEF + 7-param Helmert datum leg, oracle-gated
    "ml_kmeans_cluster_summary",   # r4: NEW — distributed Lloyd's k-means, oracle replays all iterations
    "ml_semdedup_keep_rate",       # r4: NEW — SemDeDup within-cluster near-dup removal, oracle-gated
    "text_bm25_topk",              # r4: NEW — Okapi BM25 retrieval scoring, oracle-gated
    "corpus_quality_classifier",   # r4: NEW — hashing-trick linear quality filter, oracle-gated
    "weather_climatology_anomaly", # r4: NEW — day-of-year climatology + anomaly workflow, oracle-gated
    "weather_degree_days",         # r4: NEW — HDD/CDD/frost-day aggregation, oracle-gated
    "dedup_jaccard_prefix_pairs",  # r4: NEW — PPJoin prefix-filtered exact Jaccard, uncapped oracle
    "graph_pagerank_nations",      # r4: NEW — weighted PageRank power iteration, oracle replays iterations
    "geo_radius_join_bucketed",    # r4: NEW — grid-bucketed spatial radius join (no cross join), oracle-gated
    "events_ewma_daily",           # r4: NEW — EWMA smoothing as a closed-form windowed sum, oracle-gated
    "corpus_mixture_plan",         # r4: NEW — training-mix token allocation (rates/epochs/budget), oracle-gated
    "orders_status_islands",       # r4: NEW — gaps-and-islands run compression, oracle-gated
    "linkage_part_duplicates",     # r4: NEW — Fellegi-Sunter probabilistic record linkage, oracle-gated
    "corpus_perplexity_filter",    # r4: NEW — CCNet bigram-LM perplexity filter, oracle retrains the LM
    "weather_derived_variables",   # r4: NEW — wind speed/circular-mean direction + solar zenith, oracle-gated
    "weather_vertical_interp",     # r4: NEW — ln(p) vertical interpolation to target levels, oracle-gated
    "weather_grid_smoothing",      # r4: NEW — 9-point neighborhood smoother via offset fan-out, oracle-gated
    "corpus_clean_report_exact",   # r4: NEW — END-TO-END clean pipeline (exact+near CC+quality) under one oracle
    "weather_format_scan_agg",     # r4: NEW — spark.read.format("weather") Python DataSource + pushFilters, oracle-gated
    "geo_polar_stereo_project",    # r4: NEW — ellipsoidal EPSG:3413 polar stereographic, oracle-gated
    "text_tfidf_keywords",         # r4: NEW — per-doc TF-IDF keyword extraction, oracle-gated
    "weather_station_idw_analysis",# r4: NEW — IDW objective analysis via band-join, oracle-gated
    "basket_part_pair_lift",       # r4: NEW — market-basket support/confidence/lift, oracle-gated
    "events_linear_trend",         # r4: NEW — OLS trend from sufficient statistics, oracle-gated
    "events_seasonal_decompose",   # r4: NEW — classical MA seasonal decomposition, oracle-gated
    "weather_ensemble_probability",# r4: NEW — exceedance probability / expected-exceedance products, oracle-gated
    "geo_greatcircle_waypoints",   # r4: NEW — great-circle slerp route interpolation, oracle-gated
    "weather_storm_objects",       # r4: NEW — MODE-style space-time feature detection via distributed CC, oracle-gated
    "regrid_bilinear_agg",         # r4: NEW — bilinear regrid onto an off-lattice target grid, oracle-gated
    "ml_label_propagation",        # r4: NEW — semi-supervised kNN label propagation, oracle replays both rounds
    "weather_gradient_fronts",     # r4: NEW — |∇T| frontal detection via signed-stencil fan-out, oracle-gated
    "weather_comfort_indices",     # r4: NEW — NWS heat-index/wind-chill polynomials + danger counts, oracle-gated
    "text_zipf_fit",               # r4: NEW — Zipf-law OLS fit over the vocabulary, oracle-gated
    "weather_etccdi_tx90p",        # r4: NEW — ETCCDI TX90p percentile-of-climatology index, oracle-gated
    "corpus_bpe_train",            # r4: NEW — distributed BPE merge training, oracle replays all iterations
    "corpus_gopher_rules",         # r4: NEW — Gopher-style named quality rules (integer gates), oracle-gated
    "corpus_bpe_tokenize",         # r4: NEW — fitted-BPE token vocabulary histogram, oracle-gated
    "weather_etccdi_spells",       # r4: NEW — WSDI-style spell-duration indices via gaps-and-islands, oracle-gated
    "graph_triangle_census",       # r4: NEW — oriented two-hop triangle counting + clustering coefficient, oracle-gated
    "multimodal_image_decode_agg", # r4: NEW — real BMP encode->decode channel means, oracle-gated
    "multimodal_image_resize_agg", # r4: NEW — real nearest-neighbor resize roundtrip, oracle-gated
    "multimodal_audio_features",   # r4: NEW — real WAV PCM16 RMS/zero-crossings, oracle-gated
    "multimodal_video_framesample",# r4: NEW — real RVID byte-range frame sampling, oracle-gated
    "sketch_hll_registers",        # r4: NEW — HyperLogLog with exact register replay, oracle-gated
    "sketch_kmv_distinct",         # r4: NEW — KMV distinct sketch with exact k-min replay, oracle-gated
    "sketch_countmin_point",       # r4: NEW — Count-Min with exact counter replay, oracle-gated
    "events_funnel_steps",         # r4: NEW — first-touch ordered funnel with shared deadline, oracle-gated
    "mv_incremental_refresh",      # r4: NEW — algebraic MV maintenance (merge == recompute), oracle-gated
    "cdc_apply_latest_snapshot",   # r4: NEW — CDC op-log collapse with tombstones, oracle-gated
    "weather_vorticity_divergence",# r4: NEW — wind-field vorticity/divergence via signed stencil, oracle-gated
    "corpus_exact_substring_dedup",# r4: NEW — ExactSubstr duplicated-span coverage (Lee et al.), oracle-gated
    "weather_forecast_verification",# r4: NEW — bias/RMSE/MAE/Pearson per lead time, oracle-gated
    "sim_hard_negative_mining",    # r4: NEW — contrastive hard-negative/positive mining, oracle-gated
    "events_ab_test_zscore",       # r4: NEW — two-sample Welch z-test experiment readout, oracle-gated
    "dq_expectation_suite",        # r4: NEW — declarative DQ checks incl. FK anti-joins, oracle-gated
    "geo_point_in_polygon",        # r4: NEW — ray-casting containment vs non-convex polygon, oracle-gated
    "weather_parcel_trajectory",   # r4: NEW — Euler advection, oracle replays every step, oracle-gated
    "text_collocations_pmi",       # r4: NEW — PMI collocation extraction, oracle-gated
    "sketch_bloom_membership",     # r4: NEW — Bloom filter with exact bit replay + FP census, oracle-gated
    "events_survival_kaplan_meier",# r4: NEW — product-limit survival curve with censoring, oracle-gated
    "graph_shortest_paths",        # r4: NEW — layered BFS with shortest-path counting, oracle replays every level
    "analytics_skyline_parts",     # r4: NEW — two-stage distributed skyline, oracle is the NOT-EXISTS definition
    "events_autocorrelation",      # r4: NEW — daily-series ACF at lags 1..7, oracle-gated
    "dq_benford_first_digit",      # r4: NEW — Benford first-digit audit in the exact integer domain, oracle-gated
    "events_json_native_extract",  # r4: NEW — native JSON-path extraction (get_json_object), oracle-gated
    "events_cusum_changepoint",    # r4: NEW — integer-exact CUSUM changepoint detector, oracle-gated
    "sample_weighted_priority",    # r4: NEW — priority sampling (w/u keys, libm-free), oracle-gated
    "geo_geohash_cells",           # r4: NEW — exact-dyadic geohash encoding + prefix census, oracle-gated
    "sketch_kmv_setops",           # r4: NEW — theta-sketch union/intersection/difference, oracle replays state
    "ml_pca_power_iteration",      # r4: NEW — distributed Gram + power iteration, oracle replays all steps
    "cdc_scd2_history",            # r4: NEW — SCD Type 2 effective-dated history census, oracle-gated
    "linkage_fuzzy_part_names",    # r4: NEW — blocked Levenshtein fuzzy linkage, integer DP, oracle-gated
    "finance_largest_remainder_allocation",  # r4: NEW — exact integer proration, invariant-carrying, oracle-gated
    "stats_poisson_bootstrap_ci",  # r4: NEW — distributed Poisson bootstrap CI, deterministic draws, oracle-gated
    "privacy_dp_noisy_counts",     # r4: NEW — epsilon-DP Laplace release with deterministic draws, oracle-gated
    "privacy_k_anonymity",         # r4: NEW — k-anonymity violating-group census, integer-exact, oracle-gated
    "multimodal_video_scene_changes",  # r4: NEW — shot detection over real RVID bytes, integer diffs, oracle-gated
    "events_sliding_window_agg",   # r4: NEW — 1h/15min sliding windows vs explicit band-join oracle
    "sketch_hll_merge_parity",     # r4: NEW — register-wise merge == direct sketch, losslessness gated
    "events_mad_outliers",         # r4: NEW — MAD robust outliers, rank-arithmetic medians, all integer
    "ml_classifier_eval",          # r4: NEW — confusion matrix + metric suite, exact-integer ratios
    "mv_join_delta_refresh",       # r4: NEW — delta-join IVM algebra, merge == recompute gated
    "storage_zorder_clustering",   # r4: NEW — Morton bit-interleave bucket census, integer replay
    "dq_median_imputation",        # r4: NEW — per-group integer median repair of masked missingness
    "weather_station_qc",          # r4: NEW — WMO range/step/persistence QC flags, integer domain
    "events_attribution_linear",   # r4: NEW — multi-touch attribution with exact cent conservation
    "graph_kcore",                 # r4: NEW — k-core peeling, oracle replays every round (materialized CTEs)
    "events_holt_forecast",        # r4: NEW — Holt smoothing, Arrow kernel vs recursive-CTE oracle, dyadic-exact
    "orders_hhi_concentration",    # r4: NEW — Herfindahl revenue concentration, integer cents + stable ratio
    "text_readability_flesch",     # r4: NEW — Flesch readability via integer regexp counts, oracle-gated
    "sim_mmr_diverse_topk",        # r4: NEW — MMR diverse retrieval on rounded-grid cosines, all steps replayed
    "format_transcode_chain",      # r4: NEW — GRIB2->ingest->Zarr->pruned-scan transcode, all legs gated
    "weather_return_period",       # r4: NEW — Weibull plotting-position return periods, integer domain
    "events_periodogram",          # r4: NEW — Schuster periodogram at shared-literal trig arguments
    "analytics_abc_classification",# r4: NEW — Pareto ABC classes with cross-multiplied integer cutoffs
    "corpus_span_corruption_plan", # r4: NEW — T5 span-masking budget accounting, integer geometry
    "agg_weighted_median",         # r4: NEW — integer cumulative-weight median, no interpolation
]

# Names of queries first registered in round 2 — surfaced early in the
# driver ordering (see __spark_entry__._ordered) so a prefix-sampling
# driver verifies them the round they land.
R02_NEW: list[str] = [
    "dedup_embedding_lsh_pairs",
    "dedup_minhash_md5_audit",
    "sketch_error_bounds_audit",
    "sim_ann_recall_audit",
    "dedup_banded_recall_audit",
    "dedup_winnowing_md5_audit",
    "dedup_simhash_md5_audit",
    "dedup_cluster_canonical",
    "dq_column_profile",
    "join_salted_equivalence",
    "events_resample_1h_gapfill",
    "geo_webmercator_project",
    "multimodal_frame_resize_plan",
    "corpus_train_split",
    "text_token_rarity",
    "events_conversion_window",
    "sample_stratified_deterministic",
    "unpivot_lineitem_metrics",
    "corpus_decontamination",
    "orders_cohort_retention",
    "text_repetition_profile",
    "pipeline_compaction_report",
    "events_value_outliers",
    "events_transition_matrix",
    "orders_price_percentiles",
    "customer_rfm_segments",
    "text_bigram_counts",
    "events_hourly_seasonality",
    "text_heavy_hitters_audit",
    "orders_open_backlog_monthly",
    "pipeline_quarantine_report",
    "documents_dup_rate_by_source",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in SPARK:
            raise ValueError(f"duplicate query registration: {name}")
        SPARK[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side-effects; keep modules independent.
    from weather_tools_spark.queries import (  # noqa: F401
        analytics,
        audits,
        core_sql,
        core_sql2,
        core_sql3,
        core_sql4,
        dedup,
        events,
        llm_pipeline,
        media,
        pipeline_ops,
        sketches,
        similarity,
        text,
        xql_shaped,
    )


_load_all()
