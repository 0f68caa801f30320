"""Rate-limited external I/O (weather-mv RateLimit parity,
weather_mv/loader_pipeline/util.py:345-431; SURVEY.md §2.10).

Reference semantics: work is sharded into ``max(1, min(int(qps ×
latency), max_concurrent))`` groups (util.py:377-380 — note TRUNCATING
int(), not ceil: 500 qps × 0.5 s → exactly 250 shards, the docstring
example in the reference) and each shard sleeps to keep its request
rate at ``qps / shards``.

Spark-first form: ``repartition(n_shards)`` bounds concurrency (one
task = one shard), and a token-bucket pacer inside ``foreachPartition``
enforces the per-shard rate. The pacing happens entirely inside the
I/O stage — the query layer never sees it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame


def num_shards(qps: float, latency_sec: float, max_concurrent: int) -> int:
    """shards = max(1, min(int(qps × latency), max_concurrent)) —
    util.py:377-380 exactly, truncating division like the reference
    (int(), not ceil: 3 qps × 0.4 s → 1 shard, not 2)."""
    return max(1, min(int(qps * latency_sec), max_concurrent))


@dataclass
class TokenBucket:
    """Simple token bucket: ``rate`` tokens/sec, burst of ``burst``."""

    rate: float
    burst: float = 1.0
    _tokens: float = 0.0
    _last: float | None = None

    def acquire(self, now: Callable[[], float] = time.monotonic, sleep: Callable[[float], None] = time.sleep) -> None:
        t = now()
        if self._last is None:
            self._last = t
            self._tokens = self.burst
        self._tokens = min(self.burst, self._tokens + (t - self._last) * self.rate)
        self._last = t
        if self._tokens < 1.0:
            wait = (1.0 - self._tokens) / self.rate
            sleep(wait)
            self._tokens = 1.0
            self._last = now()
        self._tokens -= 1.0


def rate_limited_foreach(
    df: DataFrame,
    fn: Callable[[dict], None],
    qps: float,
    latency_sec: float = 0.5,
    max_concurrent: int = 10,
) -> None:
    """Apply ``fn`` to every row with a global rate of ~``qps``:
    repartition to the shard count, then pace each shard at
    qps/shards with a token bucket. Defaults mirror the reference's
    EE limits (10 qps / 0.5 s / 10 concurrent, ee.py:389-394)."""
    shards = num_shards(qps, latency_sec, max_concurrent)
    per_shard = qps / shards

    def run(rows: Iterator) -> None:
        bucket = TokenBucket(rate=per_shard, burst=1.0)
        for row in rows:
            bucket.acquire()
            fn(row.asDict())

    df.repartition(shards).foreachPartition(run)


def paced(iterable: Iterable, rate: float) -> Iterator:
    """Generator pacing helper for strategy code that iterates manually."""
    bucket = TokenBucket(rate=rate, burst=1.0)
    for item in iterable:
        bucket.acquire()
        yield item
