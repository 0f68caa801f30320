"""Distributed two-pass prefix sum: exactness, determinism across
partition counts, and the backlog query's no-global-Window plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_tools_spark.operators.prefix_sum import running_sum
from weather_tools_spark.queries import SPARK


@pytest.mark.parametrize("n_parts", [1, 3, 32])
def test_running_sum_exact_any_partitioning(spark, n_parts):
    n = 5003
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, -1).otherwise(2).alias("v"),
    )
    got = (
        running_sum(df, ["k"], "v", "rt", num_partitions=n_parts)
        .orderBy("k")
        .select("rt")
        .toPandas()["rt"]
        .tolist()
    )
    want, acc = [], 0
    for i in range(n):
        acc += -1 if i % 3 == 0 else 2
        want.append(acc)
    assert got == want


def test_running_sum_keeps_all_columns(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1).alias("v"), F.lit("x").alias("tag")
    )
    out = running_sum(df, ["k"], "v", "rt")
    assert set(out.columns) == {"k", "v", "tag", "rt"}
    assert out.count() == 100


def test_backlog_plan_has_no_global_window(spark, sf_dir):
    # the whole point of the operator: the sweep-line running sum must
    # not plan an unpartitioned Window (single-task global sort)
    import re

    df = SPARK["orders_open_backlog_monthly"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert not re.search(r"^\(\d+\) Window", plan, re.M), plan
    # the Arrow cumsum pass ran behind the localCheckpoint, so the final
    # plan reads the checkpointed partitions rather than re-deriving them
    assert "ExistingRDD" in plan or "MapInPandas" in plan, plan
