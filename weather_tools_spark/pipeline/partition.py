"""Download-partition fan-out (weather-dl parity, SURVEY.md §2.10).

Reference model: a Config carries ``selection: {key: [values...]}`` and
``partition_keys``; one *partition* is a point in the Cartesian product
of the selected key values (weather_dl/download_pipeline/config.py:23-77,
partition.py:164-191). Downloads are skipped when the target exists
(partition.py:149-161), licenses are assigned round-robin
(partition.py:67-90), and work is grouped per (license, slot) so each
API key's requests serialize (pipeline.py:127).

Spark-first re-expression:
- fan-out = chained ``explode`` over literal value arrays on a
  single-partition seed (NOT a crossJoin of default-parallelism frames —
  that multiplies task counts combinatorially);
- skip-existing = LEFT ANTI join against a listing of existing outputs;
- license assignment = ``row_number() % n_licenses`` (in-order) or
  round-robin interleave across configs (fair scheduling,
  partition.py:254-282) = rank within config, then sort by (rank,
  config) — both pure window expressions;
- per-license serialization = ``repartition(n_licenses, license_col)``
  + ``foreachPartition`` fetch with client-specific concurrency caps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


@dataclass
class DownloadConfig:
    """Engine-native download config (config.py:23-77 shape)."""

    name: str
    client: str = "fake"
    dataset: str | None = None
    target_template: str = "{name}.nc"
    partition_keys: list[str] = field(default_factory=list)
    selection: dict[str, list[Any]] = field(default_factory=dict)


def fanout(spark: SparkSession, config: DownloadConfig) -> DataFrame:
    """One row per partition: the Cartesian product of
    ``selection[partition_keys]`` plus the formatted ``target`` path and
    the originating ``config_name``."""
    df = spark.range(1).coalesce(1).select(F.lit(config.name).alias("config_name"))
    for key in config.partition_keys:
        values = config.selection[key]
        df = df.select("*", F.explode(F.array(*[F.lit(v) for v in values])).alias(key))
    fmt, args = _template_to_format(config.target_template, config.partition_keys)
    return df.withColumn("target", F.format_string(fmt, *[F.col(a) for a in args]))


def _template_to_format(template: str, keys: list[str]) -> tuple[str, list[str]]:
    """'{year}-{month}.nc' → ('%s-%s.nc', ['year','month']) — Python
    str.format templates rendered distributed via format_string."""
    import re

    args: list[str] = []

    def repl(m: "re.Match[str]") -> str:
        name, spec = m.group(1), m.group(2)
        args.append(name)
        # '{year:04d}' → '%04d'; bare '{year}' → '%s'
        return "%" + spec[1:] if spec else "%s"

    fmt = re.sub(r"\{(\w+)(:[^}]*)?\}", repl, template)
    return fmt, args


def skip_existing(partitions: DataFrame, existing_targets: DataFrame) -> DataFrame:
    """Drop partitions whose target already exists — LEFT ANTI join, the
    relational form of the reference's per-element FS ``exists`` check
    (cheaper at scale: one listing scan instead of N stat calls)."""
    return partitions.join(existing_targets.select("target"), "target", "left_anti")


def assign_licenses(partitions: DataFrame, n_licenses: int, fair: bool = False) -> DataFrame:
    """Round-robin license slots. ``fair=True`` interleaves across
    configs (each config's i-th partition gets scheduled in the i-th
    wave — partition.py:254-282 semantics) instead of in-order."""
    if fair:
        per_cfg = W.partitionBy("config_name").orderBy("target")
        ranked = partitions.withColumn("wave", F.row_number().over(per_cfg))
        order = W.orderBy("wave", "config_name", "target")
        return ranked.withColumn(
            "license_slot", ((F.row_number().over(order) - 1) % n_licenses).cast("int")
        )
    order = W.orderBy("config_name", "target")
    return partitions.withColumn(
        "license_slot", ((F.row_number().over(order) - 1) % n_licenses).cast("int")
    )


def run_fetches(
    partitions: DataFrame,
    fetch_fn: Callable[[Iterable[dict]], None],
    n_licenses: int,
) -> None:
    """Execute fetches with per-license serialization: repartition on the
    license slot so one task owns one key's queue, then hand rows to the
    I/O strategy (clients implement retry/backoff — external I/O stays
    out of the query layer, SURVEY.md §7.4.5)."""
    (
        partitions.repartition(n_licenses, "license_slot")
        .foreachPartition(lambda rows: fetch_fn(r.asDict() for r in rows))
    )
