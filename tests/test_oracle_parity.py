"""Run every registered query against the DuckDB oracle at the test SF —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tests.oracle_utils import assert_frames_match, duckdb_conn
from weather_tools_spark.queries import ORACLE, SPARK

ORACLE_QUERIES = sorted(ORACLE)
ROWS_ONLY_QUERIES = sorted(set(SPARK) - set(ORACLE))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    sdf = SPARK[name](spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(ORACLE[name]).df()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = SPARK[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
