"""Second wave of relational coverage: correlated subqueries, scalar
subqueries, LIKE-driven joins, disjunctive multi-column predicates,
grouped HAVING, range joins, cube grouping — all shapes the reference
engine cannot express at all (SURVEY.md §2.3-2.7 'missing vs a full
engine') and Spark answers natively."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register
from weather_tools_spark.queries.core_sql import _davg, _dsum, _dsum_round


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi term → left-semi
    join on the key with the inequality as a join residual."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, yr, round(CAST(sum(CAST(round((volume) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             strftime(l_shipdate, '%Y') AS yr,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two aliased copies of the nation dim + disjunctive
    cross-filter; both dim joins broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.date_format("l_shipdate", "yyyy").alias("yr")
        )
        .agg(_dsum_round(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name, yr, round(CAST(sum(CAST(round((amount) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS profit
    FROM (
      SELECT n_name, strftime(o_orderdate, '%Y') AS yr,
             l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
    )
    GROUP BY n_name, yr
    ORDER BY n_name, yr DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dim, profit expression, group
    by nation × year (supply cost proxied by 0.8×retail — the driver
    schema has no partsupp table)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    amount = _rev() - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy").alias("yr"))
        .agg(_dsum_round(amount).alias("profit"))
        .orderBy(F.col("n_name"), F.col("yr").desc())
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation over a fact-fact join."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.00 * (CAST(sum(CAST(round((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) END) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000)
                 / (CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional ratio aggregate over a broadcast join."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir)
    promo = F.when(F.col("p_type") == "PROMO", _rev())
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(100.0 * _dsum(promo) / _dsum(_rev()), 4).alias("promo_revenue")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING (CAST(sum(CAST(round((l_quantity) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) > 250
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped-HAVING subquery as a semi-join of the
    pre-aggregated key set (the aggregation runs once, the key set
    broadcasts)."""
    li = load_table(spark, "lineitem", sf_dir)
    big = li.groupBy("l_orderkey").agg(_dsum(F.col("l_quantity")).alias("sq")).filter(F.col("sq") > 250)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return (
        li.join(F.broadcast(big.select("l_orderkey")), "l_orderkey", "left_semi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 15 AND l_quantity <= 35)
       OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 25 AND l_quantity <= 45)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-arm disjunction across both join sides —
    Catalyst extracts the common join key and pushes arm-local terms to
    each scan."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    arm1 = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(15, 35)
    )
    arm3 = (
        (F.col("p_type") == "PROMO") & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(25, 45)
    )
    return j.filter(arm1 | arm2 | arm3).agg(_dsum_round(_rev()).alias("revenue"))


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT (CAST(sum(CAST(round((c_acctbal) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + anti-join.
    The scalar aggregate broadcasts as a 1-row crossJoin — no collect."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(_davg(F.col("c_acctbal")).alias("ab"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


@register(
    "cube_qty_by_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_qty_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (full cross-classification; rollup's sibling)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "range_join_value_buckets",
    oracle="""
    WITH buckets AS (
      SELECT unnest(generate_series(0, 475, 25)) AS lo
    )
    SELECT lo, count(*) AS n, round((CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(value), 6) AS avg_value
    FROM events JOIN buckets
      ON value >= lo AND value < lo + 25
    GROUP BY lo
    ORDER BY lo
    """,
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (non-equi) executed as bucketize→equi-join: the fact
    row's bucket key is computed arithmetically, turning an O(n×m)
    nested-loop range join into an O(n) hash join — the standard scale
    rewrite when range boundaries are regular. The oracle runs the naive
    BETWEEN join to prove equivalence."""
    ev = load_table(spark, "events", sf_dir)
    buckets = (
        spark.range(1)
        .coalesce(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(475), F.lit(25))).alias("lo"))
    )
    with_bucket = ev.filter((F.col("value") >= 0) & (F.col("value") < 500)).withColumn(
        "lo", (F.floor(F.col("value") / 25) * 25).cast("bigint")
    )
    return (
        with_bucket.join(F.broadcast(buckets), "lo")
        .groupBy("lo")
        .agg(F.count(F.lit(1)).alias("n"), F.round(_davg(F.col("value")), 6).alias("avg_value"))
        .orderBy("lo")
    )
