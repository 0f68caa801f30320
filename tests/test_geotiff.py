"""Golden tests for the stdlib GeoTIFF codec (sources/geotiff.py):
self-written rasters parse back byte-identically with correct
georeferencing; the distributed sink writes one valid raster per time
slice. Reference semantics: rioxarray/rasterio open + COG output in
weather_mv loader_pipeline (sinks.py engine dispatch, regrid.py)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from weather_tools_spark.sources import geotiff as GT
from weather_tools_spark.sources import hypercube as H


def _raster():
    # 3 rows (lat 52.0 down to 51.5) x 4 cols (lon 4.0..4.75), north-up
    arr = (np.arange(12, dtype="f8") * 1.5 - 2.25).reshape(3, 4)
    return arr, (4.0, 52.0), (0.25, 0.25)


@pytest.mark.parametrize("compression", ["deflate", None])
def test_roundtrip_byte_identical(tmp_path, compression):
    arr, origin, pixel = _raster()
    path = str(tmp_path / "t.tif")
    GT.write_geotiff(path, arr, origin, pixel, compression)

    buf = open(path, "rb").read()
    assert buf[:4] == b"II*\x00"  # little-endian classic TIFF magic
    assert GT.is_tiff(path)

    got, g_origin, g_pixel = GT.read_geotiff(path)
    assert np.array_equal(got, arr)  # exact float64 — byte-identical
    assert g_origin == origin and g_pixel == pixel


def test_decode_long_format_georeferencing(tmp_path):
    arr, origin, pixel = _raster()
    path = str(tmp_path / "t.tif")
    GT.write_geotiff(path, arr, origin, pixel)
    pdf = GT.gtiff_decode(path, value_col="d2m")
    assert len(pdf) == 12
    # cell (row 1, col 2): lat 52.0-0.25, lon 4.0+0.5, value idx 6
    row = pdf[(pdf.latitude == 51.75) & (pdf.longitude == 4.5)]
    assert float(row.d2m.iloc[0]) == 6 * 1.5 - 2.25
    # north-up: first row is the max latitude
    assert pdf.latitude.iloc[0] == 52.0

    opts = H.IngestOptions(area=(52.0, 4.4, 51.6, 4.8))
    clipped = GT.gtiff_decode(path, opts, value_col="d2m")
    assert set(clipped.latitude) == {52.0, 51.75}
    assert set(clipped.longitude) == {4.5, 4.75}


def test_partitioned_sink_one_raster_per_slice(spark, tmp_path):
    rows = []
    for h in (0, 12):
        for la in (50.0, 49.75):
            for lo in (7.0, 7.25, 7.5):
                rows.append(
                    (pd.Timestamp(f"2024-05-01 {h:02d}:00:00").to_pydatetime(),
                     la, lo, float(h * 10 + la + lo))
                )
    df = spark.createDataFrame(rows, "time timestamp, latitude double, longitude double, value double")
    out = str(tmp_path / "tiffs")
    n = GT.write_geotiff_partitioned(df, out)
    assert n == 2

    import os

    files = sorted(os.listdir(out))
    assert files == ["2024-05-01T00.tif", "2024-05-01T12.tif"]
    back = GT.gtiff_decode(os.path.join(out, "2024-05-01T12.tif"))
    want = {(la, lo): v for t, la, lo, v in rows if t.hour == 12}
    assert len(back) == len(want)
    for _, r in back.iterrows():
        assert want[(r.latitude, r.longitude)] == r.value


def test_missing_cells_are_nan(spark, tmp_path):
    df = spark.createDataFrame(
        [(pd.Timestamp("2024-05-01 00:00:00").to_pydatetime(), la, lo, 1.0)
         for la in (50.0, 49.75) for lo in (7.0, 7.25) if not (la == 50.0 and lo == 7.25)],
        "time timestamp, latitude double, longitude double, value double",
    )
    out = str(tmp_path / "sparse")
    GT.write_geotiff_partitioned(df, out)
    import os

    back = GT.gtiff_decode(os.path.join(out, "2024-05-01T00.tif"))
    miss = back[(back.latitude == 50.0) & (back.longitude == 7.25)]
    assert np.isnan(miss.value.iloc[0])
    assert back.value.notna().sum() == 3


def test_rejects_non_tiff(tmp_path):
    p = tmp_path / "junk.tif"
    p.write_bytes(b"CDF\x01" + b"\x00" * 32)
    assert not GT.is_tiff(str(p))
    with pytest.raises(ValueError):
        GT.read_geotiff(str(p))
