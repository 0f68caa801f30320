"""Fourth relational wave — the remaining TPC-H shapes: outer-join
histograms (q13), market share (q8), view+scalar-max (q15), NOT-IN
anti-semantics (q16), nested semi-joins (q20), multi-correlated
EXISTS/NOT EXISTS (q21)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.queries import register
from weather_tools_spark.queries.core_sql import _dsum, _dsum_round


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT strftime(o_orderdate, '%Y') AS yr,
             l_extendedprice * (1 - l_discount) AS volume,
             n_name
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT yr,
           round((CAST(sum(CAST(round((CASE WHEN n_name = 'NATION_3' THEN volume ELSE 0.0 END) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000)
                 / (CAST(sum(CAST(round((volume) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000), 6) AS mkt_share
    FROM volumes
    GROUP BY yr
    ORDER BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total volume per year —
    conditional/total exact-sum ratio over a 4-way join."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    vol = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.date_format("o_orderdate", "yyyy").alias("yr"),
            _rev().alias("volume"),
            "n_name",
        )
    )
    national = F.when(F.col("n_name") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return (
        vol.groupBy("yr")
        .agg(F.round(_dsum(national) / _dsum(F.col("volume")), 6).alias("mkt_share"))
        .orderBy("yr")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra join predicate +
    double aggregation (per-entity count, then histogram of counts)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             (CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view + equality against its own
    scalar max (ties kept — which is why this is not just argmax). The
    exact-decimal revenue makes the equality comparison engine-safe."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_rev()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, "supplier", sf_dir)
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_type, p_size
    ORDER BY supplier_cnt DESC, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (anti-join on a filtered key
    set) + multi-key distinct counting."""
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, "lineitem", sf_dir)
    bad_supp = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_type"), F.col("p_size"))
    )


@register(
    "q20_part_suppliers_with_volume",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100
    )
    ORDER BY s_name
    """,
)
def q20_part_suppliers_with_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN over a grouped-HAVING subquery —
    evaluated as one aggregation + semi-join (quantity threshold over an
    integer-valued measure, boundary-safe)."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("small%"))
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    return (
        supp.join(qualifying, "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "orders_monthly_growth",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS m,
             (CAST(sum(CAST(round((o_totalprice) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY m
    )
    SELECT m,
           round(rev, 2) AS revenue,
           round(rev / lag(rev) OVER (ORDER BY m) - 1.0, 6) AS mom_growth
    FROM monthly
    ORDER BY m
    """,
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: analytic lag over the (already tiny)
    monthly rollup — the aggregate-then-window layering that keeps the
    window stage off the fact table entirely."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    monthly = orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m")).agg(
        _dsum(F.col("o_totalprice")).alias("rev")
    )
    w = W.orderBy("m")
    return (
        monthly.select(
            "m",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.lag("rev").over(w) - 1.0, 6).alias("mom_growth"),
        )
        .orderBy("m")
    )


@register(
    "customer_reorder_interval",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_custkey,
           count(gap_days) AS n_reorders,
           round(CAST(sum(gap_days) AS DOUBLE) / count(gap_days), 4) AS avg_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    HAVING count(gap_days) >= 5
    ORDER BY o_custkey
    """,
)
def customer_reorder_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-interval analytics: per-customer day gaps between
    consecutive orders (lag over event time), then integer-exact gap
    statistics for repeat customers."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("gap_days").alias("n_reorders"),
            F.round(F.sum("gap_days").cast("double") / F.count("gap_days"), 4).alias("avg_gap_days"),
            F.max("gap_days").cast("bigint").alias("max_gap_days"),
        )
        .filter(F.col("n_reorders") >= 5)
        .orderBy("o_custkey")
    )


@register(
    "supplier_revenue_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             (CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS BIGINT)) AS rev_micro
      FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT l_suppkey, rev_micro,
             sum(rev_micro) OVER (ORDER BY rev_micro DESC, l_suppkey) AS cum_micro,
             sum(rev_micro) OVER () AS total_micro
      FROM rev
    )
    SELECT l_suppkey,
           round(CAST(rev_micro AS DOUBLE) / 1000000, 2) AS revenue,
           round(CAST(cum_micro AS DOUBLE) / CAST(total_micro AS DOUBLE), 6) AS cum_share
    FROM ranked
    WHERE CAST(cum_micro AS DOUBLE) / CAST(total_micro AS DOUBLE) <= 0.5
    ORDER BY cum_share
    """,
)
def supplier_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: the smallest supplier set carrying 50% of total
    revenue — descending cumulative share via window sums over
    integer-exact (micro-unit) revenue, so the cut-off comparison is
    engine-deterministic."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.round(_rev() * 1_000_000, 0).cast("long")).alias("rev_micro")
    )
    w_cum = W.orderBy(F.col("rev_micro").desc(), F.col("l_suppkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = rev.select(
        "l_suppkey",
        "rev_micro",
        F.sum("rev_micro").over(w_cum).alias("cum_micro"),
        F.sum("rev_micro").over(w_all).alias("total_micro"),
    )
    share = F.col("cum_micro").cast("double") / F.col("total_micro").cast("double")
    return (
        ranked.filter(share <= 0.5)
        .select(
            "l_suppkey",
            F.round(F.col("rev_micro").cast("double") / 1_000_000, 2).alias("revenue"),
            F.round(share, 6).alias("cum_share"),
        )
        .orderBy("cum_share")
    )


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.orderkey' AS fk,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.partkey',
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'orders.custkey',
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY fk
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality referential check: per-FK violation counts (anti-join
    cardinality) across the star schema — the data-level generalization
    of the reference's destination validation (bq.py:162-195); backed by
    operators.quality for programmatic use."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    part = load_table(spark, "part", sf_dir)
    cust = load_table(spark, "customer", sf_dir)

    def fk_count(child, ckey, parent, pkey, label):
        parents = parent.select(F.col(pkey).alias(ckey)).distinct()
        return child.join(F.broadcast(parents), ckey, "left_anti").agg(
            F.lit(label).alias("fk"), F.count(F.lit(1)).alias("violations")
        )

    return (
        fk_count(li, "l_orderkey", orders, "o_orderkey", "lineitem.orderkey")
        .unionByName(fk_count(li, "l_partkey", part, "p_partkey", "lineitem.partkey"))
        .unionByName(fk_count(orders, "o_custkey", cust, "c_custkey", "orders.custkey"))
        .orderBy("fk")
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile,
             o_totalprice
      FROM orders
    )
    SELECT o_orderpriority, quartile,
           count(*) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM ranked
    GROUP BY o_orderpriority, quartile
    ORDER BY o_orderpriority, quartile
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() bucketing analytics (quartile boundaries per group) —
    deterministic under the unique (price, key) ordering."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the same
    fact table — expressed as one pre-aggregation per order instead of
    two per-row subqueries: for each (order, supplier) line, count other
    suppliers and other-suppliers-with-returns once, then filter."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, "supplier", sf_dir)
    # per-(order, supplier): does THIS supplier have any R line on the
    # order, and how many lines it has — ONE shuffle over lineitem; the
    # per-order stats then derive from this much smaller frame
    # (distinct counts become plain count/sum).
    #
    # r12 optimization (guide §2.3 — aggregate before you shuffle): the
    # EXISTS/NOT-EXISTS predicates depend only on (order, supplier), and
    # numwait counts qualifying LINES — so carrying n_lines through the
    # per-(order, supplier) aggregate and summing it replaces the old
    # third pass that re-joined raw lineitem against per_os/per_order
    # (the big join stream shrinks from line-scale to
    # (order×supplier)-scale, and lineitem is scanned once instead of
    # twice).
    per_os = li.groupBy(
        F.col("l_orderkey").alias("os_key"), F.col("l_suppkey").alias("os_supp")
    ).agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    per_order = per_os.groupBy(F.col("os_key").alias("po_key")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("has_r").alias("n_r_supps"),
    )
    # EXISTS another supplier on the order ⇔ n_supps ≥ 2
    exists_other = F.col("n_supps") >= 2
    # NOT EXISTS another supplier with an R line ⇔ the R-supplier set is
    # empty, or is exactly {this supplier} (this supplier has an R line
    # and is the only R supplier)
    not_exists_other_r = (F.col("n_r_supps") == 0) | (
        (F.col("n_r_supps") == 1) & (F.col("has_r") == 1)
    )
    return (
        per_os.join(per_order, F.col("po_key") == F.col("os_key"))
        .filter(exists_other & not_exists_other_r)
        .join(orders, F.col("os_key") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("os_supp"))
        .groupBy("s_name")
        .agg(F.sum("n_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "dq_column_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           count(*) AS n_rows,
           CAST(count(*) - count(o_totalprice) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           round(min(o_totalprice), 2) AS min_v,
           round(max(o_totalprice), 2) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', count(*),
           CAST(count(*) - count(o_orderkey) AS BIGINT),
           CAST(count(DISTINCT o_orderkey) AS BIGINT),
           round(min(o_orderkey), 2), round(max(o_orderkey), 2)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(min(o_custkey), 2), round(max(o_custkey), 2)
    FROM orders
    ORDER BY col
    """,
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profiling (null count, exact distinct, min/max) — the
    scan-shaped data-quality pass every ingestion pipeline runs before
    accepting a batch. One row per profiled column; each column's stats
    are ONE map-combinable aggregation over the table."""
    orders = load_table(spark, "orders", sf_dir)

    def prof(col: str):
        c = F.col(col)
        return orders.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.min(c).cast("double"), 2).alias("min_v"),
            F.round(F.max(c).cast("double"), 2).alias("max_v"),
        )

    return (
        prof("o_totalprice")
        .unionByName(prof("o_orderkey"))
        .unionByName(prof("o_custkey"))
        .orderBy("col")
    )


@register(
    "dq_distribution_drift",
    oracle="""
    WITH ev AS (
      SELECT CAST(least(greatest(floor(value / 50.0), 0), 9) AS BIGINT) AS bucket,
             event_id % 2 = 0 AS is_old
      FROM events
    ),
    b AS (SELECT unnest(range(0, 10)) AS bucket),
    cnt AS (
      SELECT b.bucket,
             0.5 + coalesce(sum(CASE WHEN is_old THEN 1 END), 0) AS n_old,
             0.5 + coalesce(sum(CASE WHEN NOT is_old THEN 1 END), 0) AS n_new
      FROM b LEFT JOIN ev ON b.bucket = ev.bucket
      GROUP BY b.bucket
    ),
    tot AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM cnt)
    SELECT bucket,
           CAST(n_old - 0.5 AS BIGINT) AS n_old,
           CAST(n_new - 0.5 AS BIGINT) AS n_new,
           round(n_old / t_old, 6) AS p_old,
           round(n_new / t_new, 6) AS p_new,
           round((n_new / t_new - n_old / t_old) * ln((n_new / t_new) / (n_old / t_old)), 6)
             AS psi_term
    FROM cnt, tot
    ORDER BY bucket
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection (population stability index) — the
    check a training-data pipeline runs between corpus snapshots before
    accepting a refresh. Two deterministic cohorts of the events table
    (event_id parity ≈ old/new snapshot) are histogrammed into fixed
    50-unit value buckets; each bucket's PSI term
    (p_new − p_old)·ln(p_new/p_old) is computed with Laplace-smoothed
    (+0.5) counts so empty buckets stay finite. One map-combinable
    aggregation over the fact table — the same shape at 100 TB; the
    oracle recomputes every term with its own arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 50.0), F.lit(0)), F.lit(9)
    ).cast("bigint")
    cnt = (
        ev.select(bucket.alias("bucket"), (F.col("event_id") % 2 == 0).alias("is_old"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("raw_old"),
            F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("raw_new"),
        )
    )
    buckets = spark.range(10).select(F.col("id").alias("bucket"))
    cnt = (
        buckets.join(cnt, "bucket", "left")
        .select(
            "bucket",
            (F.coalesce(F.col("raw_old"), F.lit(0)) + 0.5).alias("n_old"),
            (F.coalesce(F.col("raw_new"), F.lit(0)) + 0.5).alias("n_new"),
        )
    )
    tot = cnt.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    p_old = F.col("n_old") / F.col("t_old")
    p_new = F.col("n_new") / F.col("t_new")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.col("n_old") - 0.5).cast("bigint").alias("n_old"),
            (F.col("n_new") - 0.5).cast("bigint").alias("n_new"),
            F.round(p_old, 6).alias("p_old"),
            F.round(p_new, 6).alias("p_new"),
            F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


@register(
    "join_salted_equivalence",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(CAST(sum(CAST(round((l_quantity) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 10000, 0) / 100 AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_salted_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-handling machinery, driver-verified: the salted fact join
    (8-way key spreading of the build side, deterministic salt on the
    probe side) must produce results identical to the plain equi-join
    the oracle computes — certifying salting is a pure physical rewrite."""
    from weather_tools_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, "l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum_round(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "orders_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT f.cohort,
             date_diff('month', f.cohort, date_trunc('month', o.o_orderdate)) AS offset_m,
             o.o_custkey
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT strftime(cohort, '%Y-%m') AS cohort_month,
           CAST(offset_m AS BIGINT) AS offset_m,
           count(DISTINCT o_custkey) AS active_customers,
           count(*) AS n_orders
    FROM j
    GROUP BY cohort, offset_m
    ORDER BY cohort_month, offset_m
    """,
)
def orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers bucketed by first-order
    month, activity tracked by month offset — the standard
    product-analytics shape (no reference analog; engine-native).

    Scale shape: the first-order aggregate collapses the fact table to
    one row per customer before the join — at test SF AQE broadcasts it
    (plan-verified: single BroadcastHashJoin, no fact reshuffle); at
    cluster scale both sides hash-partition on the shared ``o_custkey``
    key. The distinct-count then reshuffles only (cohort, offset,
    custkey) triples, which partial-distinct collapses map-side first."""
    orders = load_table(spark, "orders", sf_dir)
    month = F.date_trunc("month", F.col("o_orderdate"))
    firsts = orders.groupBy("o_custkey").agg(F.min(month).alias("cohort"))
    j = orders.join(firsts, "o_custkey").select(
        F.col("cohort"),
        F.months_between(month, F.col("cohort")).cast("long").alias("offset_m"),
        "o_custkey",
    )
    return (
        j.groupBy("cohort", "offset_m")
        .agg(
            F.count_distinct(F.col("o_custkey")).alias("active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            "offset_m",
            "active_customers",
            "n_orders",
        )
        .orderBy("cohort_month", "offset_m")
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type, count(value) AS n,
             sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS s_micro,
             sum(CAST(round(value * value * 10000, 0) AS BIGINT)) AS sq_tenk
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(s_micro AS DOUBLE) / 1000000 / n AS mean_v,
             sqrt(greatest((CAST(sq_tenk AS DOUBLE) / 10000
                            - n * (CAST(s_micro AS DOUBLE) / 1000000 / n)
                                * (CAST(s_micro AS DOUBLE) / 1000000 / n)) / (n - 1),
                           0.0)) AS std_v
      FROM stats
    ),
    z AS (
      SELECT e.event_type, abs((e.value - m.mean_v) / m.std_v) AS az
      FROM events e JOIN m ON e.event_type = m.event_type
    ),
    zz AS (
      SELECT event_type,
             CAST(sum(CASE WHEN az > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             round(max(az), 4) AS max_abs_z
      FROM z GROUP BY event_type
    )
    SELECT m.event_type, m.n,
           round(m.mean_v, 4) AS mean_v,
           round(m.std_v, 4) AS std_v,
           zz.n_outliers, zz.max_abs_z
    FROM m JOIN zz ON m.event_type = zz.event_type
    ORDER BY m.event_type
    """,
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 3) — the anomaly-scan
    DQ pass, two passes over the fact: (1) exact first/second moments
    per group via scaled-integer sums (sum-order-independent, so the
    derived mean/stddev are bit-identical on any engine or
    partitioning), (2) broadcast the tiny per-group stats back and
    score every row map-side. No window, no row shuffle — the second
    pass is embarrassingly parallel.

    Scaling contract: value² is summed in 1e4-units (|sum| < 9e18 ⇒
    safe below ~3.6e9 rows per group at |value| ≤ 500; re-scale the
    lattice for wider domains)."""
    ev = load_table(spark, "events", sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("s_micro"),
        F.sum(F.round(F.col("value") * F.col("value") * 10_000, 0).cast("long")).alias("sq_tenk"),
    )
    mean_v = F.col("s_micro").cast("double") / 1_000_000 / F.col("n")
    var_v = (
        F.col("sq_tenk").cast("double") / 10_000 - F.col("n") * mean_v * mean_v
    ) / (F.col("n") - 1)
    m = stats.select(
        "event_type",
        "n",
        mean_v.alias("mean_v"),
        F.sqrt(F.greatest(var_v, F.lit(0.0))).alias("std_v"),
    )
    z = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        "n",
        "mean_v",
        "std_v",
        F.abs((F.col("value") - F.col("mean_v")) / F.col("std_v")).alias("az"),
    )
    return (
        z.groupBy("event_type", "n", "mean_v", "std_v")
        .agg(
            F.sum(F.when(F.col("az") > 3, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max("az"), 4).alias("max_abs_z"),
        )
        .select(
            "event_type",
            "n",
            F.round("mean_v", 4).alias("mean_v"),
            F.round("std_v", 4).alias("std_v"),
            "n_outliers",
            "max_abs_z",
        )
        .orderBy("event_type")
    )


@register(
    "orders_price_percentiles",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority, count(*) AS n,
           round(quantile_cont(cents, 0.5) / 100, 4) AS p50,
           round(quantile_cont(cents, 0.9) / 100, 4) AS p90,
           round(quantile_cont(cents, 0.99) / 100, 4) AS p99,
           round(CAST(min(cents) AS DOUBLE) / 100, 2) AS min_price,
           round(CAST(max(cents) AS DOUBLE) / 100, 2) AS max_price
    FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def orders_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated price percentiles (p50/p90/p99) per order
    priority. ``percentile`` over the integer-cents lattice ≡ DuckDB
    ``quantile_cont`` bit-for-bit (same linear interpolation over exact
    integers — the pattern proven by the sketch audit's exact_p50).
    Exact percentiles sort each (small-keyed) group; the approx path
    for high-cardinality keys is ``approx_percentile`` under the sketch
    audit's error gate."""
    orders = load_table(spark, "orders", sf_dir)
    d = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(cents, 0.5)") / 100, 4).alias("p50"),
            F.round(F.expr("percentile(cents, 0.9)") / 100, 4).alias("p90"),
            F.round(F.expr("percentile(cents, 0.99)") / 100, 4).alias("p99"),
            F.round((F.min("cents").cast("double") / 100), 2).alias("min_price"),
            F.round((F.max("cents").cast("double") / 100), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS m_score,
             monetary_cents
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           round(CAST(sum(monetary_cents) AS DOUBLE) / 100, 2) AS total_value
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles per
    customer (ntile with deterministic key tie-breaks), rolled up to
    segment sizes and value. Monetary sums ride the integer-cents
    lattice so quartile boundaries and totals are engine-exact.

    Scale note: global ntile is a single-partition sort of the
    *aggregated* per-customer frame (not the fact table); for a
    customer dimension too large for one task, swap ntile for
    percent_rank-over-range or pre-computed quantile boundaries."""
    orders = load_table(spark, "orders", sf_dir)
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("monetary_cents"),
    )
    from pyspark.sql import Window as W

    scored = rfm.select(
        "o_custkey",
        F.ntile(4).over(W.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(4).over(W.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(4).over(W.orderBy("monetary_cents", "o_custkey")).alias("m_score"),
        "monetary_cents",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round((F.sum("monetary_cents") / 100).cast("double"), 2).alias("total_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "orders_open_backlog_monthly",
    oracle="""
    WITH close AS (
      SELECT l_orderkey, max(l_shipdate) + INTERVAL 1 DAY AS cd
      FROM lineitem GROUP BY l_orderkey
    ),
    opens AS (SELECT o_orderdate AS d, 1 AS kind, 1 AS delta, o_orderkey AS tie
              FROM orders JOIN close ON o_orderkey = l_orderkey),
    closes AS (SELECT cd AS d, 0 AS kind, -1 AS delta, l_orderkey AS tie FROM close),
    bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
                      date_trunc('month', max(o_orderdate)) AS hi
               FROM orders),
    months AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS d,
                      2 AS kind, 0 AS delta, 0 AS tie
               FROM bounds),
    stream AS (SELECT * FROM opens UNION ALL SELECT * FROM closes UNION ALL SELECT * FROM months),
    rs AS (SELECT d, kind,
                  sum(delta) OVER (ORDER BY d, kind, tie ROWS UNBOUNDED PRECEDING) AS rt
           FROM stream)
    SELECT strftime(d, '%Y-%m') AS month, CAST(rt AS BIGINT) AS n_open
    FROM rs WHERE kind = 2 ORDER BY month
    """,
)
def orders_open_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog at each month start — the interval sweep-line:
    +1 at order date, -1 the day after the last line item ships, query
    points at month boundaries, one running sum over the merged event
    stream.

    r12 optimization (guide §2.3, aggregate before you shuffle): the
    sweep-line deltas are pre-aggregated to DATE scale (+n per order
    date, −n per close date; one row per (date, kind)) before the
    running sum, so the ordered frame is date-bounded (~2·|distinct
    dates| + |months|: ~5k rows at sf0.1, ~75k for a century of
    days) instead of order-scale (2·|orders|: 300k at sf0.1, billions
    at 100 TB). The prefix sums at every (d, kind) boundary are
    unchanged — summing deltas within a (d, kind) group commutes with
    the running sum, and the month query rows are their own kind — so
    n_open at each month is identical. Previously the two-pass
    range-partition prefix sum ran over the raw per-order stream
    (300k-row shuffle + Arrow cumsum + totals collect: 13 Spark jobs,
    1.86 s at sf0.1; now 3 date-scale aggregates and the
    probe-dispatched cumulative sum). The map-side partial aggregation
    shrinks the one order-scale shuffle to date cardinality — exactly
    the 100-TB-relevant reduction, not a local-only trick; past 100k
    distinct (date, kind) rows the probe dispatcher transparently
    returns to the distributed two-pass path over the (d, kind) total
    order."""
    from weather_tools_spark.operators.prefix_sum import cumulative_sums

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    close = li.groupBy("l_orderkey").agg(
        (F.max("l_shipdate") + F.expr("INTERVAL 1 DAY")).alias("cd")
    )
    opens = (
        orders.join(close, orders["o_orderkey"] == close["l_orderkey"])
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("delta"))
        .select("d", F.lit(1).alias("kind"), "delta")
    )
    closes = (
        close.groupBy(F.col("cd").alias("d"))
        .agg((-F.count(F.lit(1))).cast("long").alias("delta"))
        .select("d", F.lit(0).alias("kind"), "delta")
    )
    months = (
        orders.agg(
            F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
        )
        .select(F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("d"))
        .select("d", F.lit(2).alias("kind"), F.lit(0).cast("long").alias("delta"))
    )
    stream = opens.unionByName(closes).unionByName(months)
    rs = cumulative_sums(stream, ["d", "kind"], ["delta"], ["n_open"])
    return (
        rs.filter(F.col("kind") == 2)
        .select(F.date_format("d", "yyyy-MM").alias("month"), F.col("n_open"))
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics: PageRank by power iteration
# ---------------------------------------------------------------------------

_PR_D, _PR_ITERS = 0.85, 3


def _pagerank_oracle() -> str:
    """Chained-CTE replay of the exact power-iteration schedule: edge
    weights from the orders⋈lineitem fact join, uniform init 1/N,
    r' = (1−d)/N + d·Σ inflow (nodes with no in-edges keep the teleport
    term via the LEFT JOIN coalesce)."""
    d, iters = _PR_D, _PR_ITERS
    parts = [
        """edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )""",
        """outw AS (SELECT src, sum(w) AS tot FROM edges GROUP BY src)""",
        """nodes AS (SELECT DISTINCT nk FROM (SELECT src AS nk FROM edges
                                   UNION SELECT dst FROM edges))""",
        """nn AS (SELECT count(*) AS n FROM nodes)""",
        """r0 AS (SELECT nk, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""r{t} AS (
      SELECT nodes.nk,
             (1 - {d!r}) / nn.n + {d!r} * coalesce(fl.inflow, 0) AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS nk, sum(p.r * e.w / o.tot) AS inflow
        FROM r{t - 1} p JOIN edges e ON p.nk = e.src JOIN outw o ON e.src = o.src
        GROUP BY e.dst) fl ON nodes.nk = fl.nk
    )""")
    return ",\n    ".join(parts)


@register(
    "graph_pagerank_nations",
    oracle=f"""
    WITH {_pagerank_oracle()}
    SELECT nk AS nationkey, round(r, 9) AS pagerank,
           CAST(row_number() OVER (ORDER BY r DESC, nk) AS BIGINT) AS rk
    FROM r{_PR_ITERS}
    ORDER BY rk
    """,
)
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation → supplier-nation
    trade graph (edge weight = lineitem count routed between the two
    nations), 3 power iterations, d=0.85 — the canonical iterative
    join-based graph algorithm expressed as DataFrame ops.

    Scale split: the EXPENSIVE stage is building the edge list — a
    fact-fact join (orders⋈lineitem) plus two broadcast dims, fully
    distributed and map-combinable into ≤ |nations|² rows. The power
    iteration then runs on that tiny aggregated graph (joins on
    broadcast-sized frames), so iterations cost nothing at any scale —
    the standard "aggregate the fact table into a graph summary, then
    iterate on the summary" topology. The oracle replays the identical
    schedule (init, damping, in-flow sums, no-in-edge teleport) as
    chained CTEs — like the k-means query, an iterative algorithm
    certified by the hash gate, not rows-only."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    edges = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = edges.persist()
    outw = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    nodes = (
        edges.select(F.col("src").alias("nk"))
        .union(edges.select(F.col("dst").alias("nk")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # bounded: ≤ |nations|
    rank = nodes.select("nk", F.lit(1.0 / n_nodes).alias("r"))
    contrib_edges = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("tot")).alias("frac")
    )
    for _ in range(_PR_ITERS):
        inflow = (
            rank.join(contrib_edges, rank.nk == contrib_edges.src)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("frac")).alias("inflow"))
        )
        rank = nodes.join(inflow, nodes.nk == inflow.dst, "left").select(
            "nk",
            (F.lit((1 - _PR_D) / n_nodes) + _PR_D * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("r"),
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("r").desc(), "nk")
    out = (
        rank.withColumn("rk", F.row_number().over(w).cast("long"))
        .select(F.col("nk").alias("nationkey"), F.round("r", 9).alias("pagerank"), "rk")
        .orderBy("rk")
    )
    return out


# ---------------------------------------------------------------------------
# Gaps-and-islands run compression
# ---------------------------------------------------------------------------


@register(
    "orders_status_islands",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate, o_orderkey) AS rn_s
      FROM orders
    ), islands AS (
      SELECT o_custkey, o_orderstatus, rn - rn_s AS grp,
             count(*) AS run_len
      FROM seq GROUP BY o_custkey, o_orderstatus, rn - rn_s
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(run_len) AS BIGINT) AS max_run,
           round(avg(run_len), 6) AS avg_run,
           CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS long_runs
    FROM islands GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def orders_status_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each customer's order-status timeline
    into maximal same-status runs with the classic double-row_number
    difference (rn − rn_per_status = island id), then profile run
    lengths per status. Both windows partition by customer (and
    customer+status) — parallel across the key space, never a global
    window; the island aggregation is map-combinable."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    w_all = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_st = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey",
        (F.row_number().over(w_all) - F.row_number().over(w_st)).alias("grp"),
    )
    islands = seq.groupBy("o_custkey", "o_orderstatus", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        islands.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("run_len").alias("max_run"),
            F.round(F.avg("run_len"), 6).alias("avg_run"),
            F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0)).alias("long_runs"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Probabilistic record linkage (Fellegi-Sunter)
# ---------------------------------------------------------------------------

# log2(m/u) agreement / disagreement weights per comparison field —
# fixed public-methodology constants (Fellegi & Sunter 1969 scoring).
_FS_W = {
    "type": (0.9, 0.3),   # m, u for p_type equality
    "adj": (0.85, 0.1),   # first word of p_name
    "size": (0.8, 0.2),   # |Δ p_size| <= 1
}
_FS_THRESHOLD = 2.0


def _fs_weight_sql(agree_expr: str, field: str) -> str:
    import math

    m, u = _FS_W[field]
    wa = math.log2(m / u)
    wd = math.log2((1 - m) / (1 - u))
    return f"CASE WHEN {agree_expr} THEN {wa!r} ELSE {wd!r} END"


@register(
    "linkage_part_duplicates",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_brand, p_type, p_size,
             string_split(p_name, ' ')[1] AS adj,
             string_split(p_name, ' ')[2] AS noun
      FROM part
    ), cand AS (
      SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
             {_fs_weight_sql('a.p_type = b.p_type', 'type')}
             + {_fs_weight_sql('a.adj = b.adj', 'adj')}
             + {_fs_weight_sql('abs(a.p_size - b.p_size) <= 1', 'size')} AS score
      FROM p a JOIN p b
        ON a.noun = b.noun AND a.p_brand = b.p_brand
       AND a.p_partkey < b.p_partkey
    )
    SELECT part_a, part_b, round(score, 6) AS score
    FROM cand WHERE score > {_FS_THRESHOLD!r}
    ORDER BY part_a, part_b
    """,
)
def linkage_part_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi-Sunter 1969): block
    candidate pairs on (name noun, brand) — an equi-join, never a cross
    join — then score remaining fields with log2(m/u) agreement /
    log2((1−m)/(1−u)) disagreement weights and keep pairs above the
    match threshold. The attainable score sums are a discrete set with
    ≥0.28 margin to the threshold, so the float gate is safe. The
    classic data-integration operator for entity resolution beyond
    exact/fuzzy string distance."""
    import math

    part = load_table(spark, "part", sf_dir)
    p = part.select(
        "p_partkey", "p_brand", "p_type", "p_size",
        F.split("p_name", " ").getItem(0).alias("adj"),
        F.split("p_name", " ").getItem(1).alias("noun"),
    )

    def w(agree, field):
        m, u = _FS_W[field]
        return F.when(agree, math.log2(m / u)).otherwise(math.log2((1 - m) / (1 - u)))

    a, b = p.alias("a"), p.alias("b")
    cand = a.join(
        b,
        (F.col("a.noun") == F.col("b.noun"))
        & (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    score = (
        w(F.col("a.p_type") == F.col("b.p_type"), "type")
        + w(F.col("a.adj") == F.col("b.adj"), "adj")
        + w(F.abs(F.col("a.p_size") - F.col("b.p_size")) <= 1, "size")
    )
    return (
        cand.select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            score.alias("score"),
        )
        .filter(F.col("score") > _FS_THRESHOLD)
        .select("part_a", "part_b", F.round("score", 6).alias("score"))
        .orderBy("part_a", "part_b")
    )


@register(
    "basket_part_pair_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT count(DISTINCT l_orderkey) AS n FROM baskets
    ), item_freq AS (
      SELECT l_partkey, count(*) AS f FROM baskets GROUP BY l_partkey
    ), pair_freq AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pf
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), scored AS (
      SELECT p.part_a, p.part_b, p.pf,
             p.pf * 1.0 / n.n AS support,
             p.pf * 1.0 / fa.f AS confidence,
             p.pf * 1.0 * n.n / (fa.f * fb.f) AS lift
      FROM pair_freq p
      JOIN item_freq fa ON p.part_a = fa.l_partkey
      JOIN item_freq fb ON p.part_b = fb.l_partkey
      CROSS JOIN n_orders n
      WHERE p.pf >= 3
    )
    SELECT part_a, part_b, CAST(pf AS BIGINT) AS pf,
           round(support, 6) AS support, round(confidence, 6) AS confidence,
           round(lift, 6) AS lift
    FROM scored
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair affinity (association rules): co-occurrence
    of part pairs within an order with support / confidence / lift, the
    Apriori-style first pass. Scale topology: the pair join is WITHIN
    basket (equi-join on the order key, fan-out bounded by per-order
    item count — C(k,2) per basket, never corpus-quadratic), item
    frequencies broadcast, min-support prunes before ranking, and the
    top-k is a distributed TakeOrdered."""
    li = load_table(spark, "lineitem", sf_dir)
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.select("l_orderkey").distinct().count()  # bounded scalar
    item_freq = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_freq = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("pf"))
        .filter(F.col("pf") >= 3)
    )
    fa = item_freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("fa"))
    fb = item_freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("fb"))
    scored = (
        pair_freq.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .select(
            "part_a", "part_b", "pf",
            (F.col("pf") / F.lit(float(n_orders))).alias("support"),
            (F.col("pf") / F.col("fa")).alias("confidence"),
            (F.col("pf") * F.lit(float(n_orders)) / (F.col("fa") * F.col("fb"))).alias("lift"),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.col("lift").desc(), "part_a", "part_b").limit(20)
    return top.select(
        "part_a", "part_b", F.col("pf").cast("long").alias("pf"),
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    ).orderBy(F.col("lift").desc(), "part_a", "part_b")


@register(
    "graph_triangle_census",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
      ) GROUP BY v
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT CAST(max(d) AS BIGINT) FROM deg) AS max_degree,
           round((SELECT n_triangles FROM tri) * 3.0
                 / (SELECT sum(d * (d - 1) / 2) FROM deg), 6)
             AS global_clustering
    """,
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts sharing an
    order), the classic distributed graph kernel — via DEGREE-ORDERED
    edge orientation: every undirected edge points from its lower-degree
    endpoint to its higher-degree endpoint (ties by id), wedges are
    enumerated only at each triangle's minimum-degree vertex, and the
    closing edge lookup is one equi-join. Census row: nodes, edges,
    triangles, wedges (Σ C(deg,2) over UNDIRECTED degrees — the
    clustering-coefficient denominator), max degree, and the global
    clustering coefficient 3T/wedges.

    Scale topology: this is the O(m^1.5) algorithm — the oriented
    out-degree of every vertex is O(sqrt(m)) regardless of skew, so the
    wedge join fans out Σ C(outdeg,2) = O(m^1.5) candidate rows where
    id-ordered orientation (the r4 path; SCALING.md watch item at 5.0x
    per 100x data) degrades toward Σ C(deg,2) on hub-heavy graphs. A
    power-law hub of degree h contributes C(h,2) id-ordered wedges but
    only C(sqrt(m),2)-bounded degree-ordered ones — the standard
    high-degree-vertex split, expressed declaratively. Edge
    construction fans out C(k,2) per order (bounded by basket size);
    the two joins are shuffle equi-joins on node keys; degree/wedge
    stats are map-combinable. Integer outputs plus one rounded ratio.

    Reference parity: no graph surface exists in the reference; engine
    addition beside graph_pagerank_nations (SURVEY.md §2 extensions)."""
    from weather_tools_spark.operators.graph import (
        orient_by_degree,
        oriented_triangle_count,
        undirected_degrees,
    )

    li = load_table(spark, "lineitem", sf_dir)
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a, b = baskets.alias("a"), baskets.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .distinct()
        .persist()
    )
    deg = undirected_degrees(edges)
    oriented = orient_by_degree(edges, deg).persist()
    tri = oriented_triangle_count(oriented)
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        F.max("d").cast("long").alias("max_degree"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    out = (
        tri.crossJoin(stats)
        .crossJoin(n_edges)
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            "n_wedges",
            "max_degree",
            F.round(F.col("n_triangles") * 3.0 / F.col("n_wedges"), 6).alias(
                "global_clustering"
            ),
        )
    )
    from weather_tools_spark.operators.bounded import bounded_rows

    out = spark.createDataFrame(
        bounded_rows(out, 1, "whole-graph triangle census summary"), out.schema
    )
    oriented.unpersist()
    edges.unpersist()
    return out


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
             AS qty_cents,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic materialized-view maintenance: the fact table arrives
    as a BASE snapshot plus a DELTA batch (10% of order keys); each side
    produces its partial aggregate state independently, and the refresh
    MERGES the two states (union + re-aggregate — count and sum are
    commutative monoids, so partial states compose) instead of
    rescanning the base. The oracle aggregates the whole table directly,
    so the hash gate proves merge(partial(base), partial(delta)) ==
    recompute(full) — the invariant incremental view maintenance rests
    on. Monetary values are cent-integers end to end.

    At 100 TB this is THE refresh pattern: the delta is a day's
    partition, the base state is the stored MV, and the merge touches
    |MV| + |delta| rows, never the history."""
    li = load_table(spark, "lineitem", sf_dir)
    base = li.filter(F.col("l_orderkey") % 10 != 0)
    delta = li.filter(F.col("l_orderkey") % 10 == 0)

    def partial_state(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("qty_cents"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "price_cents"
            ),
        )

    merged = (
        partial_state(base)
        .unionByName(partial_state(delta))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("qty_cents").alias("qty_cents"),
            F.sum("price_cents").alias("price_cents"),
        )
    )
    return merged.orderBy("l_returnflag", "l_linestatus")


@register(
    "cdc_apply_latest_snapshot",
    oracle="""
    WITH ops AS (
      SELECT o_custkey AS key, o_orderdate, o_orderkey,
             CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
                  THEN 'D' ELSE 'U' END AS op,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
      FROM orders
    ),
    latest AS (
      SELECT key, op, price_cents FROM (
        SELECT key, op, price_cents,
               row_number() OVER (PARTITION BY key
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM ops
      ) WHERE rn = 1
    ),
    snap AS (SELECT key, price_cents FROM latest WHERE op = 'U')
    SELECT c.c_mktsegment AS segment,
           CAST(count(s.key) AS BIGINT) AS n_present,
           CAST(count(*) - count(s.key) AS BIGINT) AS n_tombstoned,
           CAST(coalesce(sum(s.price_cents), 0) AS BIGINT) AS total_cents
    FROM customer c
    JOIN (SELECT DISTINCT key FROM ops) k ON k.key = c.c_custkey
    LEFT JOIN snap s ON s.key = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
)
def cdc_apply_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: a keyed op-log (upserts + tombstone
    deletes, here derived deterministically from the orders stream) is
    collapsed to the latest state per key by a partitioned ranking
    window with a total ordering tie-break, deletes drop the key from
    the snapshot, and the surviving state is summarized per customer
    segment. This is the lakehouse MERGE/CDC-apply kernel (the batch
    form of the manifest state machine in pipeline/manifest.py): one
    shuffle on the key for the window, one broadcastable dimension
    join. Monetary values are cent-integers."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    ops = orders.select(
        F.col("o_custkey").alias("key"),
        "o_orderdate",
        "o_orderkey",
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 7 == 0), "D"
        )
        .otherwise("U")
        .alias("op"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        ops.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "op", "price_cents")
    )
    snap = latest.filter(F.col("op") == "U").select("key", "price_cents")
    keys = ops.select("key").distinct()
    return (
        cust.join(keys, cust.c_custkey == keys.key)
        .join(snap.withColumnRenamed("key", "s_key"),
              F.col("c_custkey") == F.col("s_key"), "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("s_key").alias("n_present"),
            (F.count(F.lit(1)) - F.count("s_key")).alias("n_tombstoned"),
            F.coalesce(F.sum("price_cents"), F.lit(0)).alias("total_cents"),
        )
        .orderBy("segment")
    )


@register(
    "cdc_scd2_history",
    oracle="""
    WITH ops AS (
      SELECT o_custkey AS key, o_orderdate, o_orderkey,
             CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
                  THEN 'D' ELSE 'U' END AS op
      FROM orders
    ),
    seq AS (
      SELECT key, o_orderdate AS valid_from, op,
             lead(o_orderdate) OVER (PARTITION BY key
                 ORDER BY o_orderdate, o_orderkey) AS valid_to
      FROM ops
    ),
    versions AS (SELECT * FROM seq WHERE op = 'U'),
    per_key AS (
      SELECT key,
             CAST(count(*) AS BIGINT) AS n_versions,
             CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
             CAST(coalesce(sum(CASE WHEN valid_to IS NOT NULL
                  THEN date_diff('day', valid_from, valid_to) END), 0) AS BIGINT) AS dur_days
      FROM versions GROUP BY key
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(p.n_versions) AS BIGINT) AS n_versions,
           CAST(sum(p.n_current) AS BIGINT) AS n_current,
           CAST(sum(p.n_versions - p.n_current) AS BIGINT) AS n_closed,
           CAST(sum(p.dur_days) AS BIGINT) AS sum_duration_days,
           CAST(max(p.n_versions) AS BIGINT) AS max_versions_per_key
    FROM per_key p JOIN customer c ON c.c_custkey = p.key
    GROUP BY segment ORDER BY segment
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history build from the CDC
    op-log of cdc_apply_latest_snapshot: every upsert opens an
    effective-dated version [valid_from, valid_to) whose close date is
    the NEXT op on the key (update or tombstone) via one partitioned
    lead() window — a key whose last op is a delete ends with no
    current version. The per-segment census (versions, currents,
    closed-version duration in exact integer days, max version depth)
    summarizes the history table a warehouse MERGE would materialize.
    One shuffle on the key for the window, two map-combinable
    aggregation levels, broadcastable dimension join — the standard
    SCD2 topology at fact scale."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    ops = orders.select(
        F.col("o_custkey").alias("key"),
        "o_orderdate",
        "o_orderkey",
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 7 == 0), "D"
        )
        .otherwise("U")
        .alias("op"),
    )
    w = Window.partitionBy("key").orderBy("o_orderdate", "o_orderkey")
    versions = (
        ops.withColumn("valid_to", F.lead("o_orderdate").over(w))
        .filter(F.col("op") == "U")
        .select("key", F.col("o_orderdate").alias("valid_from"), "valid_to")
    )
    per_key = versions.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias("n_current"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.datediff("valid_to", "valid_from"),
                )
            ),
            F.lit(0),
        ).alias("dur_days"),
    )
    return (
        per_key.join(F.broadcast(cust), per_key.key == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_versions").alias("n_versions"),
            F.sum("n_current").alias("n_current"),
            F.sum(F.col("n_versions") - F.col("n_current")).alias("n_closed"),
            F.sum("dur_days").alias("sum_duration_days"),
            F.max("n_versions").alias("max_versions_per_key"),
        )
        .orderBy("segment")
    )


@register(
    "linkage_fuzzy_part_names",
    oracle="""
    WITH names AS (
      SELECT p_name,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(min(p_partkey) AS BIGINT) AS min_partkey
      FROM part GROUP BY p_name
    ),
    keyed AS (
      SELECT p_name, n_parts,
             substr(p_name, strpos(p_name, ' ') + 1) AS noun
      FROM names
    )
    SELECT a.noun,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(a.n_parts * b.n_parts AS BIGINT) AS pair_weight
    FROM keyed a JOIN keyed b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY a.noun, name_a, name_b
    """,
)
def linkage_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-string record linkage: candidate part-name pairs blocked
    on the head noun (classic blocking — candidates only form inside a
    block, never corpus-quadratic) and scored by Levenshtein edit
    distance <= 4, weighted by the product of the names' part counts.
    The name frame is first reduced map-combinably (64 distinct names
    regardless of fact size), so the quadratic stage is bounded by
    distinct-values-per-block, not rows — the same
    reduce-then-block-then-pair topology the Fellegi-Sunter linkage
    query uses for discrete fields. Levenshtein is an integer DP,
    identical in both engines — no float anywhere."""
    part = load_table(spark, "part", sf_dir)
    names = part.groupBy("p_name").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    )
    keyed = names.select(
        "p_name",
        "n_parts",
        F.expr("substr(p_name, instr(p_name, ' ') + 1)").alias("noun"),
    )
    a = keyed.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("na"),
        F.col("noun").alias("noun"),
    )
    b = keyed.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("nb"),
        F.col("noun").alias("noun_b"),
    )
    pairs = a.join(
        b,
        (F.col("noun") == F.col("noun_b")) & (F.col("name_a") < F.col("name_b")),
    )
    return (
        pairs.withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 4)
        .select(
            "noun",
            "name_a",
            "name_b",
            "dist",
            (F.col("na") * F.col("nb")).cast("long").alias("pair_weight"),
        )
        .orderBy("noun", "name_a", "name_b")
    )


@register(
    "mv_join_delta_refresh",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY segment ORDER BY segment
    """,
)
def mv_join_delta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-join algebra:
    with orders arriving as base A + delta dA and lineitem as base B +
    delta dB, the view delta of A join B is

        d(A join B) = dA join B  +  A join dB  +  dA join dB

    so the refresh aggregates THREE delta joins plus the stored base
    state and merges the partial aggregates (commutative monoids), never
    rescanning base-join-base. Deltas are deterministic key slices
    (order keys % 7 == 0 on the orders side, lineitem line numbers > 4
    on the other) so all four terms are non-empty and every algebra
    branch is exercised. The oracle recomputes the whole view directly —
    the hash gate proves base_state + three delta terms == full
    recompute, the identity streaming/lakehouse view maintenance rests
    on. Cent-integer money; the customer dimension broadcasts."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)

    a = orders.filter(F.col("o_orderkey") % 7 != 0)       # base orders
    da = orders.filter(F.col("o_orderkey") % 7 == 0)      # delta orders
    b = li.filter(F.col("l_linenumber") <= 4)             # base lineitem
    db = li.filter(F.col("l_linenumber") > 4)             # delta lineitem

    def view_state(o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                    "price_cents"
                ),
            )
        )

    merged = (
        view_state(a, b)            # stored base state
        .unionByName(view_state(da, b))   # dA join B
        .unionByName(view_state(a, db))   # A join dB
        .unionByName(view_state(da, db))  # dA join dB
        .groupBy("segment")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("price_cents").alias("price_cents"),
        )
    )
    return merged.orderBy("segment")


@register(
    "orders_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT nationkey,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             sum(CAST(cents AS DOUBLE) * CAST(cents AS DOUBLE)) AS sum_sq,
             CAST(max(cents) AS BIGINT) AS top_cents
      FROM rev GROUP BY nationkey
    )
    SELECT nationkey, n_customers, total_cents,
           round(sum_sq / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)), 6)
             AS hhi,
           round(CAST(top_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 6)
             AS top_share
    FROM agg ORDER BY nationkey
    """,
)
def orders_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per customer nation:
    HHI = sum of squared customer revenue shares — the
    market-concentration readout (1/n_customers = perfectly even, 1.0 =
    monopoly). Per-customer revenue reduces map-combinably to exact
    integer cents; the squared-share sum runs in double (each square is
    one correctly-rounded op; the 1e-16 summation-order drift is
    nine orders below the 6-decimal round). Two stacked map-combinable
    aggregations, one broadcast dimension join, no window."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), F.col("o_custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    agg = rev.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("cents").cast("double") * F.col("cents").cast("double")).alias(
            "sum_sq"
        ),
        F.max("cents").cast("long").alias("top_cents"),
    )
    tot_d = F.col("total_cents").cast("double")
    return agg.select(
        "nationkey",
        "n_customers",
        "total_cents",
        F.round(F.col("sum_sq") / (tot_d * tot_d), 6).alias("hhi"),
        F.round(F.col("top_cents").cast("double") / tot_d, 6).alias("top_share"),
    ).orderBy("nationkey")


@register(
    "analytics_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT p.p_partkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    ranked AS (
      SELECT p_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, p_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(cents) OVER () AS total_cents
      FROM rev
    ),
    classed AS (
      SELECT p_partkey, cents,
             CASE WHEN cum_cents * 100 <= 80 * total_cents THEN 'A'
                  WHEN cum_cents * 100 <= 95 * total_cents THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS class_cents,
           round(sum(cents) * 1.0 / max(t.total), 6) AS revenue_share,
           CAST(min(cents) AS BIGINT) AS min_part_cents
    FROM classed CROSS JOIN (SELECT sum(cents) AS total FROM rev) t
    GROUP BY abc ORDER BY abc
    """,
)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: rank parts by revenue,
    class A = parts covering the first 80% of cumulative revenue, B to
    95%, C the tail — the stock-policy segmentation every supply-chain
    warehouse runs. Revenue reduces map-combinably to exact integer
    cents; the class boundary test is cross-multiplied integers
    (cum*100 <= 80*total), so no cumulative-share float can sit on the
    cutoff. The ranking window is global but runs over the
    parts-aggregate frame (|parts| rows, not the fact) — the documented
    bounded contract; at larger dimension cardinality the same query
    shape runs on a two-stage percentile split."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wcum = W.orderBy(F.col("cents").desc(), "p_partkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = rev.withColumn("cum_cents", F.sum("cents").over(wcum)).withColumn(
        "total_cents", F.sum("cents").over(wall)
    )
    classed = ranked.withColumn(
        "abc",
        F.when(F.col("cum_cents") * 100 <= 80 * F.col("total_cents"), "A")
        .when(F.col("cum_cents") * 100 <= 95 * F.col("total_cents"), "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
            F.round(F.sum("cents") * 1.0 / F.max("total_cents"), 6).alias(
                "revenue_share"
            ),
            F.min("cents").cast("long").alias("min_part_cents"),
        )
        .orderBy("abc")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT o.o_orderpriority AS priority, o.o_orderkey,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS wt
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT priority, cents, wt,
             sum(wt) OVER (PARTITION BY priority ORDER BY cents, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY priority) AS tw
      FROM w
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
             AS weighted_median_cents
    FROM cum GROUP BY priority ORDER BY priority
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median of order value per priority, weighted by
    each order's lineitem count — the robust center used when rows
    represent unequal masses (documents weighted by tokens, orders by
    items). Entirely exact integers: cent values, integer weights, a
    key-partitioned cumulative-weight window, and the median as the
    smallest value whose doubled cumulative weight reaches the total —
    an integer comparison, no interpolation, no float boundary. The
    weight build is one map-combinable fact join; the quantile scan is
    a per-group ordered window (the scalable grain)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    w = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
    )
    wk = W.partitionBy("priority")
    cum = w.withColumn(
        "cw",
        F.sum("wt").over(wk.orderBy("cents", "o_orderkey").rowsBetween(W.unboundedPreceding, 0)),
    ).withColumn("tw", F.sum("wt").over(wk))
    return (
        cum.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("tw").cast("long").alias("total_weight"),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents")))
            .cast("long")
            .alias("weighted_median_cents"),
        )
        .orderBy("priority")
    )
