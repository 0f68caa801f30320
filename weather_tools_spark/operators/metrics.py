"""Pipeline observability (SURVEY.md §2.4 'Counters' + §2.11 timeit).

The reference threads Beam ``Metrics.counter`` calls through every stage
(success/failure/skip counts, e.g. sinks.py:460,506,517) and a timeit
decorator for per-stage latency (metrics.py:44-105). Spark-native form:
``DataFrame.observe`` — named aggregate metrics collected by the
executors as a side effect of the job that runs anyway (no extra pass,
no driver round-trip), surfaced through ``pyspark.sql.Observation``.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(df: DataFrame, name: str = "metrics", **named_conditions) -> tuple[DataFrame, Observation]:
    """Attach success/failure/skip-style counters to a frame.

    ``named_conditions`` maps metric name → boolean Column; each becomes
    ``count_if(condition)`` plus an always-on ``n_rows``. Returns the
    instrumented frame and the Observation to read after an action.

    Example::

        df2, obs = observe_counts(df, nulls=F.col("x").isNull())
        df2.write...   # any action
        obs.get  # {'n_rows': ..., 'nulls': ...}
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(metric)
        for metric, cond in named_conditions.items()
    ]
    return df.observe(obs, *metrics), obs


@contextmanager
def stage_timer(timings: dict[str, float], stage: str) -> Iterator[None]:
    """Per-stage wall-clock timing dict, the engine-side analog of the
    reference's timeit decorator threading (metrics.py:44-105)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        timings[stage] = timings.get(stage, 0.0) + time.perf_counter() - t0
