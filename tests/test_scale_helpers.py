"""Scale-path helpers: salted joins, bucketed co-located joins,
filename-datetime extraction, asset-safe names, area polygons."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.functions import geo as G
from weather_tools_spark.functions import timeparse as TP
from weather_tools_spark.operators.skew import salted_join


def test_salted_join_equivalent_to_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .orderBy("o_orderpriority")
        .collect()
    )
    salted = (
        salted_join(li, orders, "l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_bucketed_join_skips_exchange(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plan must contain NO Exchange on the bucketed columns —
    the shuffle-free co-located join the reference's chunk-aligned reads
    approximate (SURVEY.md §4 'chunk-aligned reads')."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
        orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
        li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
            "b_lineitem"
        )
        orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
            "b_orders"
        )
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_filename_datetime_extraction(spark):
    df = spark.createDataFrame(
        [
            ("gs://bucket/era5-20180102T0600.nc",),
            ("gs://bucket/era5-0315.nc",),  # month-day only
        ],
        "path string",
    )
    full = df.select(
        TP.filename_datetime_expr(F.col("path"), "era5-%Y%m%dT%H%M").alias("t")
    ).collect()
    assert str(full[0].t) == "2018-01-02 06:00:00"
    assert full[1].t is None  # pattern doesn't match → NULL, not an error
    # missing components default: year→1978, time→0 (sinks.py:96-146)
    partial = df.select(
        TP.filename_datetime_expr(F.col("path"), "era5-%m%d.nc").alias("t")
    ).collect()
    assert str(partial[1].t) == "1978-03-15 00:00:00"


def test_ee_safe_name(spark):
    df = spark.createDataFrame([("my file (v2).grib",), ("ok-name_1",)], "n string")
    out = [r[0] for r in df.select(G.ee_safe_name(F.col("n"))).collect()]
    assert out == ["my_file_v2_grib", "ok-name_1"]


def test_area_polygon():
    poly = json.loads(G.area_polygon(45.0, -103.0, 33.0, -92.0))
    ring = poly["coordinates"][0]
    assert ring[0] == ring[-1] == [-103.0, 45.0]
    assert [-92.0, 33.0] in ring
    assert G.AREA_PRESETS["G"] == (90.0, -180.0, -90.0, 180.0)


def test_bucketed_layout_eliminates_fact_join_shuffles(spark, sf_dir):
    """materialize_fact_buckets once, then both the q18 shape (agg +
    orders join on orderkey) and the q21 shape (lineitem self-join) must
    plan with ZERO Exchange nodes — the whole point of the layout at
    100 TB, where the orderkey shuffle dominates the workload."""
    from weather_tools_spark.operators import bucketing as B

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tables = B.materialize_fact_buckets(spark, sf_dir, num_buckets=8, prefix="t_bkt_")
        q18 = B.q18_on_bucketed(spark, tables)
        p18 = q18._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p18, p18
        q21 = B.q21_self_join_on_bucketed(spark, tables)
        p21 = q21._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p21, p21
        # and they still compute: q18 over buckets == q18 over raw parquet
        li = load_table(spark, "lineitem", sf_dir)
        raw = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 250.0)
            .count()
        )
        assert q18.count() == raw
        assert q21.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for t in ("t_bkt_lineitem", "t_bkt_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ee_compatible_attrs():
    long_name = "a" * 115 + "!!"
    got = G.ee_compatible_attrs(
        {
            long_name: "v",
            "has spaces & units (m/s)": 3.5,
            "big": "x" * 2000,
            "n": 42,
            "flag": True,
        }
    )
    assert "a" * 110 in got and got["a" * 110] == "v"  # name truncated FIRST
    assert got["has_spaces_units_m_s_"] == 3.5  # numeric passes through
    assert got["big"].endswith("...") and len(got["big"]) == 1024
    assert got["n"] == 42
    assert got["flag"] == "True"  # bools stringify (not JSON numbers)


def test_zorder_write_enables_second_dimension_pruning(spark, tmp_path):
    """A lat-ordered layout cannot prune longitude predicates at all
    (every file spans the full lon range); the Z-ordered layout must
    let statistics skip most files for a lon-selective box — measured
    from the actual parquet footer min/max, which is exactly what scan
    pruning consults. Results stay identical (layout is physical only)."""
    import glob

    import pyarrow.parquet as pq

    from weather_tools_spark.operators import zorder as ZO

    grid = spark.range(64 * 64).selectExpr(
        "cast(id div 64 as double) * 0.25 - 8.0 as latitude",
        "cast(id % 64 as double) * 0.25 - 8.0 as longitude",
        "cast(id as double) as value",
    )

    def files_intersecting_lon(path, lo, hi):
        n_total, n_hit = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
            fmin = min(md.row_group(rg).column(sch["longitude"]).statistics.min
                       for rg in range(md.num_row_groups))
            fmax = max(md.row_group(rg).column(sch["longitude"]).statistics.max
                       for rg in range(md.num_row_groups))
            n_total += 1
            if fmax >= lo and fmin <= hi:
                n_hit += 1
        assert n_total >= 8
        return n_hit, n_total

    row_major = str(tmp_path / "rowmajor")
    grid.repartitionByRange(16, "latitude", "longitude").write.mode("overwrite").parquet(row_major)
    zordered = str(tmp_path / "zordered")
    ZO.write_zordered(grid, zordered, n_files=16)

    hit_m, tot_m = files_intersecting_lon(row_major, -2.0, -1.0)
    hit_z, tot_z = files_intersecting_lon(zordered, -2.0, -1.0)
    assert hit_m == tot_m  # lat-ordered slabs: zero lon pruning possible
    assert hit_z <= tot_z // 2, f"z-order still hits {hit_z}/{tot_z} files"

    # and the layout is purely physical: bbox query results are identical
    bbox = "latitude between -2 and 2 and longitude between -2 and -1"
    n_z = spark.read.parquet(zordered).filter(bbox).count()
    n_m = spark.read.parquet(row_major).filter(bbox).count()
    assert n_z == n_m == 17 * 5
