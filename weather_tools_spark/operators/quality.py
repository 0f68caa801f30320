"""Data-quality expectations over DataFrames — the validation layer an
analytics engine runs before/after ingest (the reference validates
configs and canary-writes destinations, weather_mv bq.py:162-195; this
generalizes that to data-level invariants).

All checks ride ONE pass via ``observe``-style conditional aggregates;
referential checks are anti-join counts. Nothing collects raw rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ExpectationReport:
    n_rows: int
    failures: dict[str, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(v == 0 for v in self.failures.values())


def check_expectations(df: DataFrame, rules: dict[str, Column]) -> ExpectationReport:
    """``rules`` maps rule name → boolean Column that must hold per row.
    Returns per-rule violation counts from a single aggregation pass."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(~cond | cond.isNull(), 1).otherwise(0)).alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(*aggs).first()
    return ExpectationReport(
        n_rows=row["__n"], failures={name: row[name] for name in rules}
    )


def fk_violations(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> int:
    """Count of child rows whose key has no parent — LEFT ANTI count."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(parents, child_key, "left_anti").count()
