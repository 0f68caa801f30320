"""File splitting (weather-sp parity): split a dataset by variable
and/or dimension values into one output per combination.

The reference shells out to pygrib/grib_copy/netCDF4 per input file
(weather_sp/splitter_pipeline/file_splitters.py:159-378) and formats
output paths from the split dimension values. On the engine's
long-format row model this is *exactly* Spark's partitioned write:
``df.write.partitionBy(dims...)`` produces one directory (file set) per
dimension-value combination, with skip-existing/force semantics
(file_splitters.py:131-156) via write modes.

Splitting "by variable" on a wide table = melt to (variable, value)
long form first, then partition by the variable column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt_variables(df: DataFrame, id_cols: list[str], var_cols: list[str]) -> DataFrame:
    """Wide → long: one row per (id_cols..., variable, value). Built on
    the stack() table generator (single narrow pass, no shuffle)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in var_cols)
    return df.select(
        *id_cols, F.expr(f"stack({len(var_cols)}, {pairs}) AS (variable, value)")
    )


def split_by_dims(
    df: DataFrame,
    out_dir: str,
    dims: list[str],
    mode: str = "errorifexists",
    fmt: str = "parquet",
) -> None:
    """Partitioned write: one output partition per value combination of
    ``dims``. ``mode='ignore'`` ≈ skip-existing, ``'overwrite'`` ≈ force
    (file_splitters.py:131-156 semantics)."""
    (df.write.mode(mode).partitionBy(*dims).format(fmt).save(out_dir))


def split_by_variable(
    df: DataFrame,
    out_dir: str,
    id_cols: list[str],
    var_cols: list[str],
    mode: str = "errorifexists",
) -> None:
    """Split a wide table into one partition per data variable —
    the 'split by variable' mode of weather-sp."""
    long_df = melt_variables(df, id_cols, var_cols)
    split_by_dims(long_df, out_dir, ["variable"], mode=mode)
