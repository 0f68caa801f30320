"""Bucketed-table storage layout for shuffle-free fact-fact joins.

The reference reads chunk-aligned slices of its hypercube store so a
query touches only co-located data (xql/src/xql/open.py:30-66 — chunked
Zarr opening); the relational analog is hash-bucketed storage: write
both fact tables bucketed (and sorted) on the join key, and every
subsequent equi-join or aggregation on that key runs with ZERO
exchanges — at 100 TB the q18/q21-style orderkey shuffle (the largest
shuffle in the workload, ~the size of lineitem) disappears from every
query that reuses the layout.

Spark-first mechanics: ``bucketBy`` hashes rows into a fixed number of
buckets per output partition; the catalog records the layout, and the
planner proves co-partitioning for joins/aggs on the bucket key, so it
plans SortMergeJoin/HashAggregate with no Exchange (and no sort when
``sortBy`` matches). Pick ``num_buckets`` ≈ cluster cores × small
constant at deploy scale; alignment matters more than the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table

# (table, bucket/sort key) for the workload's fact tables — every
# fact-fact join in the query set is on the orderkey
FACT_BUCKET_SPECS: dict[str, str] = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 32, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) managed
    table. Sorting inside buckets lets sort-merge joins skip their sort
    step as well."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def materialize_fact_buckets(
    spark: SparkSession, sf_dir: str, num_buckets: int = 32, prefix: str = "bkt_"
) -> dict[str, str]:
    """Write the workload's fact tables in the bucketed layout. Returns
    {logical_name: bucketed_table_name}. One-time (re)organization cost;
    every orderkey join afterwards is exchange-free."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    out = {}
    for table, key in FACT_BUCKET_SPECS.items():
        name = f"{prefix}{table}"
        write_bucketed(load_table(spark, table, sf_dir), name, key, num_buckets)
        out[table] = name
    return out


def q18_on_bucketed(spark: SparkSession, tables: dict[str, str], qty_cut: float = 250.0) -> DataFrame:
    """The q18 large-volume-customers shape over the bucketed layout:
    groupBy(l_orderkey) and the orders⋈lineitem join both reuse the
    bucket partitioning — the plan must contain no Exchange on the
    orderkey path (asserted in tests/test_scale_helpers.py)."""
    li = spark.table(tables["lineitem"])
    orders = spark.table(tables["orders"])
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > qty_cut)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .select("o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


def q21_self_join_on_bucketed(spark: SparkSession, tables: dict[str, str]) -> DataFrame:
    """The q21 shape's fact-fact core — lineitem self-joined on
    l_orderkey (other suppliers for the same order) — over the bucketed
    layout: both sides share the bucket partitioning, so the self-join
    plans with no Exchange."""
    li = spark.table(tables["lineitem"])
    l1 = li.select("l_orderkey", F.col("l_suppkey").alias("s1"))
    l2 = li.select("l_orderkey", F.col("l_suppkey").alias("s2"))
    return (
        l1.join(l2, "l_orderkey")
        .filter(F.col("s1") != F.col("s2"))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("s2").alias("n_other_supps"))
    )
