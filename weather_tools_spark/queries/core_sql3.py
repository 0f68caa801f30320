"""Third relational wave: correlated scalar subqueries, exact
percentiles, unpivot (wide→long melt), GROUPING SETS via the SQL
surface, and sketch aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.pipeline.splitter import melt_variables
from weather_tools_spark.queries import register
from weather_tools_spark.queries.core_sql import _davg, _dsum, _dsum_round


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             (CAST(sum(CAST(round((l_quantity) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round((CAST(sum(CAST(round((l_extendedprice) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into a pre-aggregated join — the aggregation runs once
    over the fact table instead of per outer row."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#1")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        _davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pa_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(_dsum(F.col("l_extendedprice")) / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — both linear interpolation over the sorted set)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    WITH long AS (
      SELECT 'l_discount' AS variable, l_discount AS value FROM lineitem
      UNION ALL
      SELECT 'l_quantity', l_quantity FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT variable, count(*) AS n,
           round(CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS total
    FROM long GROUP BY variable ORDER BY variable
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt via stack()) + per-variable aggregate —
    the row-model side of the splitter's split-by-variable operator
    (weather_sp parity: one narrow generator pass, no shuffle until the
    aggregate)."""
    li = load_table(spark, "lineitem", sf_dir)
    long_df = melt_variables(li, [], ["l_discount", "l_quantity", "l_tax"])
    return (
        long_df.groupBy("variable")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum_round(F.col("value")).alias("total"),
        )
        .orderBy("variable")
    )


@register(
    "groupingsets_region_segment",
    oracle="""
    SELECT c_mktsegment, n_name,
           count(*) AS n, round(CAST(sum(CAST(round((c_acctbal) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
    ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST
    """,
)
def groupingsets_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL surface
    (spark.sql over registered views) — grouping-set planning beyond
    rollup/cube."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("gs_customer")
    load_table(spark, "nation", sf_dir).createOrReplaceTempView("gs_nation")
    return spark.sql(
        """
        SELECT c_mktsegment, n_name,
               count(*) AS n,
               round(CAST(sum(CAST(round((c_acctbal) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS total_bal
        FROM gs_customer JOIN gs_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
        ORDER BY c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST
        """
    )


@register(
    "argmax_supplier_per_nation",
    oracle="""
    SELECT n_name, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM (
      SELECT n_name, s_name, s_acctbal,
             row_number() OVER (PARTITION BY n_nationkey
                                ORDER BY s_acctbal DESC, s_suppkey) AS rk
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    WHERE rk = 1
    ORDER BY n_name
    """,
)
def argmax_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax (the TPC-H Q2 'min-cost supplier' shape without
    partsupp): rank-1 row per group with deterministic key tie-break."""
    from pyspark.sql import Window as W

    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    w = W.partitionBy("n_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("n_name")
    )


@register(
    "union_by_name_schema_evolution",
    oracle="""
    WITH v1 AS (SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0),
         v2 AS (SELECT event_id, event_type, value, props FROM events WHERE event_id % 2 = 1),
    unioned AS (
      SELECT event_id, event_type, value, NULL AS props FROM v1
      UNION ALL BY NAME
      SELECT * FROM v2
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_props
    FROM unioned
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def union_by_name_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two generations of the events schema (one
    without ``props``) merged with ``unionByName(allowMissingColumns)``
    — the engine-side analog of the reference's GRIB wide-schema merge
    (sinks.py:326-342), where hypercubes with differing variable sets
    align into one schema with NULL fill."""
    ev = load_table(spark, "events", sf_dir)
    v1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "event_type", "value")
    v2 = ev.filter(F.col("event_id") % 2 == 1).select("event_id", "event_type", "value", "props")
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return (
        unioned.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("n_missing_props"),
        )
        .orderBy("event_type")
    )


@register("sketch_approx_aggregates")  # approximate → rows-only check
def sketch_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB profiling: HyperLogLog distinct
    counts and quantile sketches (approx → no SQL oracle; bounds checked
    in tests against exact values)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p50_approx"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             round(min(l_extendedprice / l_quantity), 6) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT ps.*, s_suppkey, s_name, s_acctbal, n_name
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mc AS (SELECT ps_partkey AS mc_partkey, min(ps_supplycost) AS min_cost
           FROM eu GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey,
           ps_supplycost AS supplycost
    FROM eu
    JOIN mc ON mc_partkey = ps_partkey AND ps_supplycost = min_cost
    JOIN part ON p_partkey = ps_partkey
    WHERE p_type = 'SMALL'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost correlated subquery over a 5-way dim
    join, decorrelated into a per-part min re-joined on equality.

    The synthetic schema has no partsupp table, so the part-supplier
    relation is derived from lineitem (per-pair minimum unit price ≈
    supply cost) — same join topology and decorrelation as Q2 proper
    (reference parity: classic relational surface, SURVEY §2.3/§2.4).
    Scale notes: region/nation/supplier/part are dims → broadcast;
    the only fact-sized shuffles are the two groupBys on (part, supp)
    and (part), both map-side combinable.
    """
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "SMALL")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("ps_supplycost"))
    eu = (
        ps.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    mc = eu.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eu.join(
            mc,
            (F.col("mc_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey",
                F.col("ps_supplycost").alias("supplycost"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "q11_important_part_value",
    oracle="""
    WITH filtered AS (
      SELECT l_partkey,
             CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
    ),
    total AS (SELECT CAST(sum(v) AS DOUBLE) / 1000000 AS grand FROM filtered)
    SELECT l_partkey AS partkey,
           round(CAST(sum(v) AS DOUBLE) / 1000000, 2) AS part_value
    FROM filtered, total
    GROUP BY l_partkey, grand
    HAVING CAST(sum(v) AS DOUBLE) / 1000000 > 0.001 * grand
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a global scalar threshold
    (group-HAVING against a whole-table aggregate).

    partsupp value is derived from lineitem revenue restricted to one
    nation's suppliers. The global scalar is computed once and attached
    via a broadcast cross-join of a single row — no per-group
    recomputation, no correlated re-scan; both aggregations are
    map-side-combinable fixed-point sums (see _dsum).
    """
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_7")
    filtered = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000, 0)
            .cast("long")
            .alias("v"),
        )
    )
    total = filtered.agg((F.sum("v") / 1_000_000).cast("double").alias("grand"))
    return (
        filtered.groupBy("l_partkey")
        .agg((F.sum("v") / 1_000_000).cast("double").alias("raw_value"))
        .join(F.broadcast(total))
        .filter(F.col("raw_value") > 0.001 * F.col("grand"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("raw_value"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )
