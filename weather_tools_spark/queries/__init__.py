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
    # r9: the Python DataSource reader gained projection pushdown — the
    # decode task now routes through _decoder_for(variables=...) (an
    # opts.variables want-set on every decoder) even for full-width
    # reads. Values are pinned identical by test_datasource, but the
    # execution path changed, so the one driver-gated query on that
    # path re-verifies:
    "weather_format_scan_agg",
    # r9: the bounded-collect contract became an enforced invariant —
    # every documented-bounded collect()/toPandas() now routes through
    # operators/bounded.bounded_rows (a limit(n+1) probe that raises
    # when the bound reasoning is stale). Values identical (the limit
    # is above the full result), but the collect plan of these queries
    # gained the limit node, so they re-verify:
    "graph_shortest_paths",
    "graph_kcore",
    "graph_ktruss",
    "graph_triangle_census",
    "events_markov_stationary",
    "corpus_bpe_tokenize",
    "orders_open_backlog_monthly",
    "corpus_pack_sequences",
    "corpus_clean_report_exact",
    "pipeline_quarantine_report",
    "ml_kmeans_cluster_summary",
    "ml_semdedup_keep_rate",
    # r9: the hashed projection is persisted so the group-count branch
    # derives from one text scan instead of two (PLANS.md r9 section);
    # values identical, scan topology changed:
    "corpus_soft_dedup_weights",
    # r9: the projected vectors + per-round candidate frames are
    # persisted (MLlib-style input caching) — 16 embeddings scans
    # collapse to the persisted base; values identical, plan pinned in
    # test_plan_quality:
    "ml_kmeanspp_init",
    # r9: the per-doc score became a JVM F.aggregate over the split
    # array (no token explode, no pre-bin shuffle) and the scored
    # frame is persisted for the bin/Brier branches — 24.7 s → 3.2 s
    # at sfx1.0; values identical (re-verified at both SFs):
    "ml_calibration_report",
    # r9: same rewrite for the DSIR scoring pass — the 256-entry
    # log-ratio table inlines as a literal map into a JVM F.aggregate,
    # removing the second explode and the token-scale groupBy(doc)
    # shuffle; values identical (re-verified at both SFs):
    "corpus_dsir_importance",
    # r9: per-doc top-token counts became the map-side sorted-run fold
    # (functions/text.max_run_count) — the token-scale (doc, token)
    # shuffle is gone from both; values identical (re-verified):
    "corpus_gopher_rules",
    "text_repetition_profile",
    # r9: lang_scores became ONE struct-fold over the token array (was
    # |langs| filter passes), and the kappa confusion table is
    # persisted (4 scoring passes -> 1); values identical (all three
    # re-verified at both SFs):
    "text_langid_distribution",
    "text_langid_accuracy",
    "text_langid_cohens_kappa",
    # r9: first-occurrence selection became a hash-partitioned window
    # (one chunk-scale shuffle instead of min-aggregate + equi-join,
    # which also re-derived the chunk build per side); values identical
    # (re-verified at both SFs):
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
        selection,
        sketches,
        stats_ext,
        similarity,
        text,
        xql_shaped,
    )


_load_all()
