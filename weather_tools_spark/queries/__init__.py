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
    # Re-add a name here ONLY when its oracle or execution path changes.
    # (r10's 20 entries were all driver-green in CORRECTNESS_r10 and are
    # reset — VERDICT r10 item 5 — so the rotation window isn't starved.)
    #
    # r11: KS/MWU cumulative counts now flow through the probed
    # operators/prefix_sum.cumulative_sums (bounded window only when a
    # measured count confirms the value-domain contract; distributed
    # two-pass prefix sum past 100k distinct values — VERDICT r10
    # item 6). Values identical, execution path changed:
    "stats_ks_two_sample",
    "stats_mannwhitney_u",
    # r11: JL distortion excludes zero-original-distance pairs on BOTH
    # engines (ADVICE r10: 0/0 is NULL in DuckDB but NaN in Spark —
    # hash-divergence trap on identical sampled vectors). Oracle SQL
    # and Spark plan both changed:
    "sim_random_projection_jl",
    # r11: the minhash recall gate moved to the ≥0.85-true-Jaccard band
    # where the (k=16, bands=4) S-curve clears the 0.8 recall bar with
    # real margin (ADVICE r10: at s=0.80 the theoretical pass
    # probability is 0.878 — too thin). Oracle changed (method label +
    # band threshold):
    "dedup_banded_recall_audit",
    # r11: the heavy-hitters audit passes state_factor=1 (ADVICE r10:
    # capacity ≥ vocab already guarantees exactness; the default 8×
    # state was unbounded headroom at corpus scale). Same values, MG
    # state-size parameter changed:
    "text_heavy_hitters_audit",
    # r11: the FIRST defect the multi-process local-cluster sweep
    # surfaced (VERDICT r10 task 1) — the climatology/anomaly means now
    # use the integer-scaled exact sum on both engines; a raw avg()'s
    # partial-merge order changed across the 2-executor split and
    # flipped near-zero anomaly signs (6/18 rows). Oracle + plan
    # changed:
    "weather_climatology_anomaly",
    # r11 sfx3-probe fixes (both values-identical, paths changed):
    # (a) the md5-minhash audit's exact-intersection join is now
    # candidate-pair-bounded instead of an uncapped shingle self-join
    # (measured exponent 2.31 → 0.59 over the 1.0→3.0 decade; 551 s →
    # 64 s at sfx3) — oracle + plan changed;
    "dedup_minhash_md5_audit",
    # (b) cosine_topk chunks its dgemm over query columns (a
    # batch × |Q| score matrix hit ~900 MB/task at 60k queries —
    # exponent 2.39 → bounded; 359 s → 47 s at sfx3). Kernel changed
    # for every consumer:
    "ml_knn_label_accuracy",
    "sim_cosine_topk",
    "ml_label_propagation",
    "sim_ann_recall_audit",
    # r11 skew-probe fix: every round(_dsum, d) money aggregate now
    # rounds at the INTEGER level (micro-units → target units,
    # core_sql._dsum_round) — the skewed-data sweep caught q10's hot
    # customer summing to EXACTLY a half-cent (2282705.155), where
    # Spark's decimal-string HALF_UP and DuckDB's binary rounding
    # disagree. Values identical off the boundary, oracle + plan
    # changed for every money-sum query:
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q19_disjunctive_predicates",
    "unpivot_lineitem_measures",
    "groupingsets_region_segment",
    "join_salted_equivalence",
    "unpivot_lineitem_metrics",
    "null_handling_aggregates",
    # r11 skew-probe fix: the batch band-join now buckets on
    # (user_id, time_bucket) — a bare user_id hash join evaluates
    # |signups|x|purchases| pairs per hot user (2.2x slower on the Zipf
    # twin, quadratic in the hot key). Values identical (streaming twin
    # + oracle re-proven), plan changed:
    "events_conversion_window",
    # r11 wave 3: the two shuffle-count outliers VERDICT r10 named get
    # the fused-plan treatment (values identical, plans changed).
    # sketch_kmv_setops: one reused distinct + one WindowGroupLimit
    # window + membership-flag groupBys — 37→12 Exch, 23→3 BNLJ,
    # 0.88→0.12 s at sf0.1.
    "sketch_kmv_setops",
    # text_burrows_delta: the grid zero-fill LEFT-joins the broadcast
    # top-word-filtered count frame instead of the vocab-scale (source,
    # word) frame — 0.53→0.16 s at sf0.1.
    "text_burrows_delta",
    # r11 wave 5 side-fix: the chunk lambda now slices a MATERIALIZED
    # token-array column — the inlined split() re-tokenized the full
    # text once per 10-word chunk (5.0→2.8 s warm at sfx1.0). Values
    # identical, plan changed:
    "dedup_paragraph_dupes",
]

# Verification-only queries: each recomputes an approximate operator's
# result AND its exact ground truth (md5-keyed signature replay, banded
# recall, ANN recall, sketch error bounds) to cross-certify the
# approximate path. They are correctness instruments, not production
# pipelines: intentionally ~2x the work of the operator they audit, and
# the recall audits are the queries that need the 16 GiB single-JVM
# heap at sf0.1 (ROUND4_NOTES) — a real deployment should schedule them
# as CI/canary jobs, never as data-plane pipelines. Surfaced in
# `tools/query_cli.py list` as [audit-only]; the bench headline set
# keeps only the cheap md5/heavy-hitter representatives
# (tests/test_registry_tags.py pins that intersection).
AUDIT_ONLY: frozenset[str] = frozenset(
    {
        "dedup_minhash_md5_audit",
        "dedup_winnowing_md5_audit",
        "dedup_simhash_md5_audit",
        "dedup_banded_recall_audit",
        "sim_ann_recall_audit",
        "sketch_error_bounds_audit",
        "text_heavy_hitters_audit",
    }
)

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
        codec_gates,
        core_sql,
        core_sql2,
        core_sql3,
        core_sql4,
        dedup,
        events,
        llm_pipeline,
        media,
        pipeline_ops,
        round10,
        round11,
        round11b,
        selection,
        sketches,
        stats_ext,
        similarity,
        text,
        xql_shaped,
    )


_load_all()
