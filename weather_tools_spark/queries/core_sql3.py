"""Third relational wave: correlated scalar subqueries, exact
percentiles, unpivot (wide→long melt), GROUPING SETS via the SQL
surface, and sketch aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.pipeline.splitter import melt_variables
from weather_tools_spark.queries import register
from weather_tools_spark.queries.core_sql import _davg, _dsum


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
           round((CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000), 2) AS total
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
            F.round(_dsum(F.col("value")), 2).alias("total"),
        )
        .orderBy("variable")
    )


@register(
    "groupingsets_region_segment",
    oracle="""
    SELECT c_mktsegment, n_name,
           count(*) AS n, round((CAST(sum(CAST(round((c_acctbal) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000), 2) AS total_bal
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
               round((CAST(sum(CAST(round((c_acctbal) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000), 2) AS total_bal
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
