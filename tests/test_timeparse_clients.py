"""Config-time parsing (ECMWF dates/times, MARS ranges, day=all,
hdates), rate-limit sharding, client retry strategy, end-to-end
fetch execution with per-license serialization."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from weather_tools_spark.functions import timeparse as TP
from weather_tools_spark.pipeline import clients as C
from weather_tools_spark.pipeline import partition as P
from weather_tools_spark.pipeline import ratelimit as RL


def test_parse_ecmwf_date_forms():
    assert TP.parse_ecmwf_date("2020-01-07") == dt.date(2020, 1, 7)
    assert TP.parse_ecmwf_date("20200107") == dt.date(2020, 1, 7)
    assert TP.parse_ecmwf_date("2020-032") == dt.date(2020, 2, 1)  # day-of-year
    assert TP.parse_ecmwf_date("-2", today=dt.date(2020, 1, 10)) == dt.date(2020, 1, 8)
    with pytest.raises(ValueError):
        TP.parse_ecmwf_date("Jan 7 2020")


def test_parse_ecmwf_time_forms():
    assert TP.parse_ecmwf_time("6") == dt.time(6)
    assert TP.parse_ecmwf_time("18") == dt.time(18)
    assert TP.parse_ecmwf_time("06:30") == dt.time(6, 30)
    assert TP.parse_ecmwf_time("0630") == dt.time(6, 30)


def test_mars_range_expansion_forms():
    assert TP.expand_mars_range("10/to/12") == ["10", "11", "12"]
    assert TP.expand_mars_range("00/to/06/by/3") == ["00", "03", "06"]
    assert TP.expand_mars_range("2020-01-07/to/2020-01-14/by/2") == [
        "2020-01-07", "2020-01-09", "2020-01-11", "2020-01-13",
    ]
    assert TP.expand_mars_range("0.0/to/0.5/by/0.1") == [
        "0.0", "0.1", "0.2", "0.3", "0.4", "0.5",
    ]
    assert TP.expand_mars_range("12/to/10") == ["12", "11", "10"]  # reversed
    assert TP.expand_mars_range("a/b/c") == ["a", "b", "c"]  # plain list


def test_day_all_and_hdates():
    assert TP.expand_day_all(2020, 2) == [f"{d:02d}" for d in range(1, 30)]  # leap
    assert TP.expand_day_all(2021, 2)[-1] == "28"
    # Feb-29 base: non-leap years fall back to Feb-28
    assert TP.hdates(dt.date(2020, 2, 29), 2) == ["2019-02-28", "2018-02-28"]


def test_expand_selection():
    sel = TP.expand_selection(
        {"year": ["2020"], "month": ["02"], "day": "all", "level": ["500/to/850/by/350"]}
    )
    assert len(sel["day"]) == 29
    assert sel["level"] == ["500", "850"]


def test_validate_selection():
    ok = TP.validate_selection({"year": ["2020"], "month": ["01"], "day": ["15"], "hour": ["23"]})
    assert ok == []
    bad = TP.validate_selection(
        {"year": ["20"], "month": ["13"], "day": ["32", "x"], "hour": ["24"]}
    )
    assert len(bad) == 5
    assert any("month='13'" in p for p in bad)
    assert any("not an integer" in p for p in bad)
    assert any("4-digit year" in p for p in bad)


def test_num_shards_formula():
    # EE defaults: 10 qps × 0.5 s latency capped at 10 → 5 shards
    assert RL.num_shards(10, 0.5, 10) == 5
    assert RL.num_shards(100, 0.5, 10) == 10  # capped
    assert RL.num_shards(0.1, 0.5, 10) == 1  # floor
    # the reference's own docstring example (util.py:362-365):
    # 500 qps × 0.5 s → exactly 250 shards
    assert RL.num_shards(500, 0.5, 1000) == 250
    # TRUNCATING int() like util.py:377-380, not ceil
    assert RL.num_shards(3, 0.4, 10) == 1
    assert RL.num_shards(9.9, 0.5, 10) == 4


def test_rate_limited_foreach_shards_and_processes(spark):
    """End-to-end: rate_limited_foreach paces every row through the
    shard layout num_shards prescribes — all rows processed exactly
    once at an effectively-unbounded rate (no sleeping in tests)."""
    acc = spark.sparkContext.accumulator(0)

    def hit(row):
        acc.add(row["v"])

    df = spark.range(20).selectExpr("CAST(id AS INT) AS v")
    RL.rate_limited_foreach(df, hit, qps=1e6, latency_sec=0.5, max_concurrent=4)
    assert acc.value == sum(range(20))


def test_token_bucket_paces():
    clock = {"t": 0.0}
    slept = []

    def now():
        return clock["t"]

    def sleep(s):
        slept.append(s)
        clock["t"] += s

    bucket = RL.TokenBucket(rate=2.0)  # 2/sec
    for _ in range(4):
        bucket.acquire(now=now, sleep=sleep)
    # first token free (burst), subsequent ones pace at 0.5 s
    assert len(slept) == 3
    assert all(abs(s - 0.5) < 1e-9 for s in slept)


def test_client_retry_then_success(tmp_path):
    client = C.FakeClient(fail_first=2)
    sleeps = []
    t1 = str(tmp_path / "t1")
    C.with_retries(
        lambda: client.retrieve(None, {}, t1),
        C.RetryPolicy(max_retries=5, initial_delay=1.0),
        sleep=sleeps.append,
    )
    assert [c[1] for c in client.calls] == [t1]
    assert sleeps == [1.0, 2.0]  # exponential backoff observed


def test_client_retry_budget_exhausted(tmp_path):
    client = C.FakeClient(fail_first=99)
    with pytest.raises(IOError):
        C.with_retries(
            lambda: client.retrieve(None, {}, str(tmp_path / "t2")),
            C.RetryPolicy(max_retries=3, initial_delay=0.0),
            sleep=lambda s: None,
        )


def test_run_fetches_end_to_end(spark, tmp_path):
    """fan-out → licenses → foreachPartition fetch, recording per-task
    results to disk (executors share the local FS in local mode)."""
    cfg = P.DownloadConfig(
        name="c",
        target_template=str(tmp_path / "dl" / "t-{year}-{level}.nc"),
        partition_keys=["year", "level"],
        selection={"year": [2016, 2017], "level": [500, 850]},
    )
    parts = P.assign_licenses(P.fanout(spark, cfg), n_licenses=2)
    out = tmp_path / "fetched"
    out.mkdir()

    def fetch(rows):
        client = C.FakeClient()
        for r in rows:
            C.with_retries(lambda r=r: client.retrieve(None, {}, r["target"]), sleep=lambda s: None)
        for _, target in client.calls:
            (out / os.path.basename(target)).touch()

    P.run_fetches(parts, fetch, n_licenses=2)
    assert sorted(p.name for p in out.iterdir()) == [
        "t-2016-500.nc", "t-2016-850.nc", "t-2017-500.nc", "t-2017-850.nc",
    ]
