"""Small-file compaction: fewer files, identical data, honest stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_tools_spark.catalog import load_table
from weather_tools_spark.operators import compaction as C


@pytest.fixture(scope="module")
def fragmented_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("frag") / "events_many")
    load_table(spark, "events", sf_dir).repartition(64).write.parquet(path)
    return path


def test_directory_stats_counts_files(spark, fragmented_dir):
    stats = C.directory_stats(spark, fragmented_dir)
    assert stats["n_files"] == 64
    assert stats["total_bytes"] > 0
    assert stats["min_bytes"] <= stats["avg_bytes"] <= stats["max_bytes"]


def test_plan_output_files_sizing():
    assert C.plan_output_files(0) == 1
    assert C.plan_output_files(128 * 1024 * 1024) == 1
    assert C.plan_output_files(128 * 1024 * 1024 + 1) == 2
    assert C.plan_output_files(10 * 128 * 1024 * 1024, 128 * 1024 * 1024) == 10


@pytest.mark.parametrize("mode", ["coalesce", "shuffle"])
def test_compact_preserves_data_and_reduces_files(spark, fragmented_dir, tmp_path, mode):
    src_df = spark.read.parquet(fragmented_dir)
    want = src_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]

    dst = str(tmp_path / f"compacted_{mode}")
    stats = C.directory_stats(spark, fragmented_dir)
    # target ~quarter of the total → ~4 output files
    report = C.compact(
        spark, fragmented_dir, dst, target_file_bytes=stats["total_bytes"] // 4, mode=mode
    )
    assert report["mode"] == mode
    assert report["after"]["n_files"] <= report["planned_files"]
    assert report["after"]["n_files"] < report["before"]["n_files"]

    got = (
        spark.read.parquet(dst)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)


def test_compact_rejects_unknown_mode(spark, fragmented_dir, tmp_path):
    with pytest.raises(ValueError):
        C.compact(spark, fragmented_dir, str(tmp_path / "x"), mode="magic")
