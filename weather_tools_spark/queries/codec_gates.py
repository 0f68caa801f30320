"""Codec hash-gate registry queries: each drives a round-6 codec
addition end-to-end through the driver surface (write → stdlib decode →
aggregate, the same pattern as grib_roundtrip_agg) with a DuckDB oracle
that recomputes the deterministic grid arithmetically.

These were written and oracle-proven mid-round as STAGED entries
(ROUND6_NOTES.md) and are now registered: the 24-entry verification
debt occupies positions 1-24 of the driver ordering, these land
directly after it, and the driver's 50-sample prefix sweeps both."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_tools_spark.queries import register

STAGED_SPARK: dict = {}
STAGED_ORACLE: dict = {}


def _staged(name: str, oracle: str):
    def deco(fn):
        STAGED_SPARK[name] = fn
        STAGED_ORACLE[name] = oracle
        return register(name, oracle=oracle)(fn)

    return deco


@_staged(
    "grib_jpeg2000_roundtrip_agg",
    oracle="""
    WITH cells AS (
      SELECT r.i AS row_i, c.i AS col_i
      FROM (SELECT unnest(range(0, 9)) AS i) r,
           (SELECT unnest(range(0, 13)) AS i) c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(250.0 + row_i * 2.5 + col_i * 0.125), 3) AS sum_t,
           round(max(250.0 + row_i * 2.5 + col_i * 0.125), 3) AS max_t,
           round(min(250.0 + row_i * 2.5 + col_i * 0.125), 3) AS min_t
    FROM cells
    """,
)
def grib_jpeg2000_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 template 5.40 (JPEG 2000 packing) end-to-end: a
    deterministic dyadic grid is written with ``packing='jpeg2000'``
    (sources/jpeg2000.py — MQ coder, EBCOT Tier-1, 5/3 DWT, real
    codestream), read back through the stdlib decoder, and aggregated;
    the DuckDB oracle recomputes the same sums arithmetically. Values
    are multiples of 1/8 so decimal scale 3 round-trips exactly —
    a hash gate over genuine template-5.40 bytes."""
    import os
    import tempfile

    import numpy as np

    from weather_tools_spark.sources import grib2 as G2

    nr, nc = 9, 13
    lats = np.linspace(50, 48, nr)
    lons = np.linspace(10, 13, nc)
    vals = 250.0 + np.arange(nr)[:, None] * 2.5 + np.arange(nc)[None, :] * 0.125
    path = os.path.join(tempfile.mkdtemp(prefix="wts_j2k_"), "t.grib2")
    G2.write_grib2(
        path,
        [{"param": "d2m", "ref_time": "2024-06-03T00:00", "lats": lats,
          "lons": lons, "values": vals}],
        packing="jpeg2000",
        decimal_scale=3,
    )
    rows = [
        (float(m["lats"][i]), float(m["lons"][j]), float(m["values"][i, j]))
        for m in G2.read_grib2(path)
        for i in range(nr)
        for j in range(nc)
    ]
    df = spark.createDataFrame(rows, "latitude double, longitude double, t double")
    return df.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("t"), 3).alias("sum_t"),
        F.round(F.max("t"), 3).alias("max_t"),
        F.round(F.min("t"), 3).alias("min_t"),
    )


@_staged(
    "hdf5_dense_roundtrip_agg",
    oracle="""
    WITH cells AS (
      SELECT v.i AS vi, r.i AS row_i, c.i AS col_i
      FROM (SELECT unnest(range(0, 12)) AS i) v,
           (SELECT unnest(range(0, 5)) AS i) r,
           (SELECT unnest(range(0, 7)) AS i) c
    )
    SELECT CAST(12 AS BIGINT) AS n_vars,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(vi * 100.0 + row_i * 10 + col_i + 0.25), 3) AS sum_v,
           round(max(vi * 100.0 + row_i * 10 + col_i + 0.25), 3) AS max_v
    FROM cells
    """,
)
def hdf5_dense_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDF5 dense (fractal-heap) group storage end-to-end: 12 data
    variables — past every compact-link limit, forcing the
    FRHP/FHDB/BTHD structures — written with ``layout='dense'`` and
    enumerated back through the v2-B-tree + fractal-heap reader; the
    oracle recomputes the deterministic cell sums arithmetically."""
    import os
    import tempfile

    import numpy as np

    from weather_tools_spark.sources import hdf5 as H5

    nv, nr, nc = 12, 5, 7
    ds = {
        f"var{v:02d}": v * 100.0
        + np.arange(nr)[:, None] * 10
        + np.arange(nc)[None, :]
        + 0.25
        for v in range(nv)
    }
    path = os.path.join(tempfile.mkdtemp(prefix="wts_dense_"), "d.h5")
    H5.write_hdf5(path, ds, layout="dense")
    back, _attrs = H5.read_hdf5(path)
    rows = [
        (name, float(back[name][i, j]))
        for name in sorted(back)
        for i in range(nr)
        for j in range(nc)
    ]
    df = spark.createDataFrame(rows, "var string, v double")
    return df.agg(
        F.countDistinct("var").cast("bigint").alias("n_vars"),
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("v"), 3).alias("sum_v"),
        F.round(F.max("v"), 3).alias("max_v"),
    )
