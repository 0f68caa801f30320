"""Z-order (Morton) clustering for multi-dimensional scan pruning.

A weather store is queried by (lat, lon) boxes and time ranges at once;
sorting by any single column only prunes that column. Interleaving the
bits of the two grid indices (Morton code) and range-partitioning +
sorting the write on that key gives every parquet file/row-group a
*compact* footprint in BOTH dimensions, so the engine's ordinary
min/max statistics pruning skips most of the store for any bbox query —
the lakehouse-standard answer (Delta/Iceberg ``ZORDER BY``) to the
reference's chunk-aligned locality (xql/src/xql/open.py:30-66),
expressed with nothing but column arithmetic and a sorted write.

All expressions are JVM-side (shift/mask bit spreading), whole-stage
codegen-friendly; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i lands at position 2i
    (standard Morton bit-dilation via shift/mask stages)."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
    return c


def morton_key(x: Column, y: Column) -> Column:
    """32-bit Morton interleave of two 16-bit non-negative indices."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_key(
    lat: Column,
    lon: Column,
    lat_res: float = 0.25,
    lon_res: float = 0.25,
) -> Column:
    """Morton key over grid indices derived from raw coordinates —
    offsets shift lat/lon into non-negative index space first."""
    lat_i = F.round((lat + F.lit(90.0)) / lat_res, 0).cast("long")
    lon_i = F.round((lon + F.lit(180.0)) / lon_res, 0).cast("long")
    return morton_key(lat_i, lon_i)


def write_zordered(
    df: DataFrame,
    path: str,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    n_files: int = 16,
    lat_res: float = 0.25,
    lon_res: float = 0.25,
) -> None:
    """Write ``df`` clustered by Z-order: range-partition on the Morton
    key (one shuffle — contiguous key ranges per output file) and sort
    within partitions, so each file's (lat, lon) min/max box is tight
    and statistics pruning works for 2-D box predicates. The key column
    is dropped from the data; it exists only to order the write."""
    keyed = df.withColumn("__z", zorder_key(F.col(lat_col), F.col(lon_col), lat_res, lon_res))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
