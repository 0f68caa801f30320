"""Corrupt-record quarantine: clean rows pass, malformed lines are
captured with reprocessing context, nothing is dropped."""

from __future__ import annotations

from pyspark.sql import types as T

from weather_tools_spark.sources.quarantine import (
    quarantine_summary,
    read_json_with_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

GOOD_LINES = [
    '{"event_id": 1, "event_type": "click", "value": 1.5}',
    '{"event_id": 2, "event_type": "view", "value": 2.0}',
    '{"event_id": 3, "event_type": "purchase", "value": 9.99}',
]
BAD_LINES = [
    '{"event_id": "not-a-number-and-unclosed',
    "plainly not json at all",
]


def test_quarantine_splits_good_and_bad(spark, tmp_path):
    src = tmp_path / "feed.json"
    src.write_text("\n".join(GOOD_LINES + BAD_LINES) + "\n")
    good, bad = read_json_with_quarantine(spark, str(src), SCHEMA)

    good_rows = sorted(r.event_id for r in good.collect())
    assert good_rows == [1, 2, 3]
    assert set(good.columns) == {"event_id", "event_type", "value"}

    bad_rows = bad.collect()
    assert len(bad_rows) == len(BAD_LINES)
    assert {r.raw_record for r in bad_rows} == set(BAD_LINES)
    assert all(r.source_file.endswith("feed.json") for r in bad_rows)
    assert all(r.quarantined_at is not None for r in bad_rows)


def test_quarantine_summary_counts(spark, tmp_path):
    src = tmp_path / "feed.json"
    src.write_text("\n".join(GOOD_LINES + BAD_LINES) + "\n")
    good, bad = read_json_with_quarantine(spark, str(src), SCHEMA)
    row = quarantine_summary(good, bad).collect()[0]
    assert (row.n_good, row.n_quarantined, row.n_total) == (3, 2, 5)
    assert row.malformed_rate == 0.4


def test_all_good_file_quarantines_nothing(spark, tmp_path):
    src = tmp_path / "clean.json"
    src.write_text("\n".join(GOOD_LINES) + "\n")
    good, bad = read_json_with_quarantine(spark, str(src), SCHEMA)
    assert good.count() == 3
    assert bad.count() == 0
