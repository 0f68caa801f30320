"""Core relational queries (scan/filter/project/join/agg/sort/set-op).

The reference itself has no general join/sort/set-op engine (SURVEY.md
§2.3-2.7) — these queries exercise the Spark-native operators that fill
that gap, in TPC-H-like shapes over the driver's star schema.

Determinism/parity contract with the DuckDB oracle:
- every float aggregate is rounded identically on both sides *before*
  any ORDER BY ... LIMIT that could be tie-sensitive, and ties are broken
  by a key column;
- timestamps that reach the output are formatted to 'yyyy-MM-dd' strings
  (hash-stable across engines);
- every computed column is aliased the same on both sides.

Scale notes (100 TB design point): all joins below are either
broadcast-able dimension joins (region/nation/customer/supplier are
orders-of-magnitude smaller than lineitem — Catalyst broadcasts them
under the configured 64 MB threshold; AQE converts to broadcast at
runtime when estimates are off) or key-partitioned shuffle joins on the
natural join key, which co-locates with the downstream groupBy key where
possible (e.g. q3 groups by o_orderkey after joining on it — one
exchange, reused).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _dsum(c: F.Column) -> F.Column:
    """Exact (order-independent) sum of a double expression via scaled
    longs: round each term to 1e-6, sum as 64-bit integers, divide back
    once. Money values live on a fixed decimal lattice, so double sums
    frequently land exactly on round-half boundaries where engine-
    dependent summation noise flips the rounded digit; integer summation
    is bit-identical on every engine and partitioning (and ~3x faster
    than DECIMAL-typed sums, which leave codegen's long arithmetic).
    Oracles mirror it textually:
    ``CAST(sum(CAST(round((e) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000``.
    Range: per-row |e| < 9e12, total |sum| < 9e18 micro-units."""
    return (F.sum(F.round(c * 1_000_000, 0).cast("long")) / 1_000_000).cast("double")


def _davg(c: F.Column) -> F.Column:
    return _dsum(c) / F.count(c)


def _dsum_round(c: F.Column, decimals: int = 2) -> F.Column:
    """``round(_dsum(c), decimals)`` with the rounding done at the
    INTEGER level (micro-units → target units), engine-divergence-proof.

    ``round(S/1e6, 2)`` is NOT: when the exact micro-sum S lands on a
    half-cent boundary (S mod 10000 == 5000 — probability ~1e-4 per
    group, and the r11 skew probe HIT it: q10's hot customer summed to
    exactly 2282705.155), Spark's round (decimal-string HALF_UP of the
    shortest repr) says .16 while DuckDB's (binary value) says .15,
    because 2282705.155 is not representable and the engines round
    different representations. Dividing by 10^(6-d) FIRST keeps every
    tie exactly representable (y.5 is a dyadic rational), where both
    engines round identically (away from zero), and every non-tie sits
    a full 1e-4 lattice step from the boundary. Oracle mirror:
    ``round(CAST(sum(...) AS DOUBLE) / 10000, 0) / 100`` (d=2)."""
    scale = float(10 ** (6 - decimals))
    unit = 10**decimals
    return (
        F.round(F.sum(F.round(c * 1_000_000, 0).cast("long")) / scale, 0) / unit
    ).cast("double")


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(round((l_quantity) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS sum_qty,
           round(CAST(sum(CAST(round((l_extendedprice) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS sum_base_price,
           round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS sum_disc_price,
           round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS sum_charge,
           round((CAST(sum(CAST(round((l_quantity) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(l_quantity), 6) AS avg_qty,
           round((CAST(sum(CAST(round((l_extendedprice) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(l_extendedprice), 6) AS avg_price,
           round((CAST(sum(CAST(round((l_discount) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(l_discount), 6) AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate groupBy (map-side partial agg +
    one exchange on the 6-value group key; whole-stage codegen end-to-end)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum_round(F.col("l_quantity")).alias("sum_qty"),
            _dsum_round(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum_round(_rev()).alias("sum_disc_price"),
            _dsum_round(_rev() * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(_davg(F.col("l_quantity")), 6).alias("avg_qty"),
            F.round(_davg(F.col("l_extendedprice")), 6).alias("avg_price"),
            F.round(_davg(F.col("l_discount")), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → broadcast customer into
    orders, shuffle join to lineitem on the group key, top-k."""
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum_round(_rev()).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; region/nation/supplier/customer are all
    broadcast dims, so the only shuffle is lineitem→orders."""
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    dim = (
        supplier.join(F.broadcast(nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))),
                      F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer),
              (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(_dsum_round(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round((l_extendedprice * l_discount) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg — every predicate reaches
    the parquet reader as a pushed filter (verify via .explain PushedFilters)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum_round(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS revenue,
           round(c_acctbal, 2) AS c_acctbal,
           n_name, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join + 2 broadcast dims + grouped top-k."""
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_dsum_round(_rev()).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name", "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). Mirrors the reference's 'skip-existing'
    membership checks (partition.py:149-161) done relationally."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_without_1995_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the Spark-native form of every
    'skip existing output' filter in the reference (SURVEY.md §2.2)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 5
    ORDER BY o_orderpriority, rk
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (absent from the reference —
    SURVEY.md §2.5). One exchange on the partition key; at scale this is
    the standard shuffle-then-rank plan with partial top-k via AQE."""
    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_orderpriority", "rk")
    )


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate window — analytic frame support."""
    orders = load_table(spark, "orders", sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "agg_distinct_stats",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)  AS distinct_parts,
           count(DISTINCT l_suppkey)  AS distinct_supps,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation + dispersion stats (expand+two-phase agg plan)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "rollup_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_rf_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent from the reference; Spark built-in)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "setop_repeat_buyers",
    oracle="""
    (SELECT DISTINCT o_custkey AS custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
     INTERSECT
     SELECT DISTINCT o_custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    ORDER BY custkey
    """,
)
def setop_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation (reference has none — SURVEY.md §2.7)."""
    orders = load_table(spark, "orders", sf_dir)
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97).orderBy("custkey")


@register(
    "setop_lapsed_buyers",
    oracle="""
    (SELECT DISTINCT o_custkey AS custkey FROM orders
     WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
     EXCEPT
     SELECT DISTINCT o_custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    ORDER BY custkey
    """,
)
def setop_lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set operation."""
    orders = load_table(spark, "orders", sf_dir)
    early = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey")
    )
    late = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")).select(
        F.col("o_custkey").alias("custkey")
    )
    return early.subtract(late).orderBy("custkey")


@register(
    "pivot_qty_by_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) — maps to the reference's hypercube→wide
    normalization concept (sinks.py:251-342) done relationally."""
    li = load_table(spark, "lineitem", sf_dir)
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .orderBy("l_returnflag")
    )
    return pv


@register(
    "orderby_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
)
def orderby_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET — xql applies these driver-side on pandas
    (xql/src/xql/apply.py:326-364); here they are distributed (TakeOrdered)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(10)
    )
