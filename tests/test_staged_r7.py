"""Round-7 staged queries (queries/staged_r7.py) proven against their
DuckDB oracles under the driver's EXACT comparison semantics —
string-form equality of the sorted-column frame — so registering them
next round carries zero verification risk."""

from __future__ import annotations

import duckdb
import pytest

from weather_tools_spark.queries.staged_r7 import STAGED_ORACLE, STAGED_SPARK


@pytest.mark.parametrize("name", sorted(STAGED_SPARK))
def test_staged_query_matches_oracle_strict(spark, sf_dir, name):
    sdf = STAGED_SPARK[name](spark, sf_dir).toPandas()
    odf = duckdb.sql(STAGED_ORACLE[name]).df()
    s = sdf[sorted(sdf.columns)].astype(str).reset_index(drop=True)
    o = odf[sorted(odf.columns)].astype(str).reset_index(drop=True)
    assert s.equals(o), f"{name}:\nspark:\n{s}\noracle:\n{o}"


def test_staged_not_registered_this_round():
    """The round-6 freeze: staged queries must NOT appear in the live
    registry until the r6 driver sweep has closed the unverified head."""
    from weather_tools_spark.queries import ORACLE, SPARK

    for name in STAGED_SPARK:
        assert name not in SPARK and name not in ORACLE
