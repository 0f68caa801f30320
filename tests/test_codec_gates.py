"""Codec hash-gate queries (queries/codec_gates.py) proven against
their DuckDB oracles under the driver's EXACT comparison semantics —
string-form equality of the sorted-column frame — before registration
(they were staged mid-round; see ROUND6_NOTES.md)."""

from __future__ import annotations

import duckdb
import pytest

from weather_tools_spark.queries.codec_gates import STAGED_ORACLE, STAGED_SPARK


@pytest.mark.parametrize("name", sorted(STAGED_SPARK))
def test_codec_gate_matches_oracle_strict(spark, sf_dir, name):
    sdf = STAGED_SPARK[name](spark, sf_dir).toPandas()
    odf = duckdb.sql(STAGED_ORACLE[name]).df()
    s = sdf[sorted(sdf.columns)].astype(str).reset_index(drop=True)
    o = odf[sorted(odf.columns)].astype(str).reset_index(drop=True)
    assert s.equals(o), f"{name}:\nspark:\n{s}\noracle:\n{o}"


def test_codec_gates_registered():
    """Registered AND oracle-backed: both entries ride the live
    registry so the round-6 driver sweep verifies them (positions
    directly behind the 24-entry debt head)."""
    from weather_tools_spark.queries import ORACLE, SPARK

    for name in STAGED_SPARK:
        assert name in SPARK and name in ORACLE
