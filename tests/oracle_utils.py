"""Shared DuckDB-oracle comparison, mirroring the driver's t2 protocol:
row count + schema width + order-insensitive value comparison under
sorted column names."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from weather_tools_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str, float_tol: float = 1e-9) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # the driver hashes string forms: a DECIMAL-typed Spark column
            # ("0.125000") never string-matches DuckDB's DOUBLE ("0.125"),
            # so a float column must be float on BOTH sides
            assert pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv), (
                f"{name}.{col}: dtype mismatch {av.dtype} vs {bv.dtype} "
                "(decimal-typed Spark output? cast to double)"
            )
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            for i, (x, y) in enumerate(zip(av, bv)):
                both_nan = (x is None or (isinstance(x, float) and math.isnan(x))) and (
                    y is None or (isinstance(y, float) and math.isnan(y))
                )
                if both_nan:
                    continue
                assert x == y or abs(x - y) <= float_tol * max(1.0, abs(x), abs(y)), (
                    f"{name}.{col}[{i}]: {x!r} != {y!r}"
                )
        else:
            mism = (av.astype(str) != bv.astype(str))
            assert not mism.any(), (
                f"{name}.{col}: first mismatch at row {mism.idxmax()}: "
                f"{av[mism.idxmax()]!r} != {bv[mism.idxmax()]!r}"
            )
