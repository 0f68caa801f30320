"""GeoTIFF codec — stdlib-only (struct + zlib + numpy).

The reference opens GeoTIFF through rioxarray and writes COG through
rasterio (weather_mv loader_pipeline/sinks.py engine dispatch;
regrid.py COG output). Those libraries are absent here, but baseline
TIFF is a public, simple container — an IFD of (tag, type, count,
value) entries pointing at strip byte ranges — and GeoTIFF adds two
plain tags for georeferencing:

- ``ModelPixelScale`` (33550, 3 doubles): (sx, sy, sz) cell size;
- ``ModelTiepoint`` (33922, 6 doubles): raster (i, j, k) ↔ model
  (x, y, z) anchor, so cell (col, row) maps to
  ``(x0 + col·sx, y0 − row·sy)``.

This module implements exactly that profile, single-band float
rasters, little-endian classic TIFF, compression None or Deflate(8):

- :func:`write_geotiff` — serialize a 2-D array + geotransform;
- :func:`read_geotiff` — parse the IFD and decode strips with
  ``np.frombuffer`` (+ zlib when Deflate);
- :func:`gtiff_decode` — raster → long-format (latitude, longitude,
  value) rows for the ingest surface, mirroring what
  ``rioxarray.open_rasterio(...).to_dataframe()`` yields;
- :func:`write_geotiff_partitioned` — distributed sink: one whole
  GeoTIFF per task (per time slice), the COG-style unit of output.

Tiled/overviewed full COG layout, multi-band, and non-trivial CRS
stay out of scope — the written files are valid GeoTIFFs any GIS tool
opens, georeferenced in EPSG:4326 lat/lon.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

# TIFF tag ids
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMPRESSION = 256, 257, 258, 259
_T_PHOTOMETRIC, _T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP = 262, 273, 277, 278
_T_STRIP_COUNTS, _T_SAMPLE_FORMAT = 279, 339
_T_PIXEL_SCALE, _T_TIEPOINT = 33550, 33922
_SAMPLE_FLOAT = 3
_II = b"II*\x00"


def write_geotiff(
    path: str,
    arr: np.ndarray,
    origin: tuple[float, float],
    pixel: tuple[float, float],
    compression: str | None = "deflate",
) -> None:
    """Write a single-band float32/float64 2-D array as a georeferenced
    classic TIFF. ``origin`` is the model (x, y) of the raster's
    top-left corner (lon, lat); ``pixel`` the (sx, sy) cell size with
    north-up convention (row j sits at y = origin_y − j·sy)."""
    if arr.ndim != 2:
        raise ValueError("single-band 2-D raster expected")
    arr = np.ascontiguousarray(arr, dtype="<f8" if arr.dtype == np.float64 else "<f4")
    h, w = arr.shape
    bits = arr.dtype.itemsize * 8
    raw = arr.tobytes()
    comp = 8 if compression == "deflate" else 1
    data = zlib.compress(raw, 6) if comp == 8 else raw

    # layout: header(8) · data strip · doubles block · IFD
    data_off = 8
    scale_off = data_off + len(data) + (-len(data) % 2)
    tie_off = scale_off + 3 * 8
    ifd_off = tie_off + 6 * 8

    entries = [
        (_T_WIDTH, 3, 1, w),
        (_T_HEIGHT, 3, 1, h),
        (_T_BPS, 3, 1, bits),
        (_T_COMPRESSION, 3, 1, comp),
        (_T_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
        (_T_STRIP_OFFSETS, 4, 1, data_off),
        (_T_SPP, 3, 1, 1),
        (_T_ROWS_PER_STRIP, 3, 1, h),  # one strip
        (_T_STRIP_COUNTS, 4, 1, len(data)),
        (_T_SAMPLE_FORMAT, 3, 1, _SAMPLE_FLOAT),
        (_T_PIXEL_SCALE, 12, 3, scale_off),
        (_T_TIEPOINT, 12, 6, tie_off),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)  # no next IFD

    with open(path, "wb") as f:
        f.write(_II + struct.pack("<I", ifd_off))
        f.write(data + b"\x00" * (-len(data) % 2))
        f.write(struct.pack("<3d", pixel[0], pixel[1], 0.0))
        f.write(struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0))
        f.write(ifd)


def is_tiff(path: str) -> bool:
    try:
        if not os.path.isfile(path):
            return False
        with open(path, "rb") as f:
            return f.read(4) in (_II, b"MM\x00*")
    except OSError:
        return False


def read_geotiff(path: str) -> tuple[np.ndarray, tuple[float, float], tuple[float, float]]:
    """Parse a single-band float GeoTIFF → (array, origin, pixel).
    Little- and big-endian classic TIFF; compression None/Deflate."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] == _II:
        e = "<"
    elif buf[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError(f"{path}: not a classic TIFF")
    (ifd_off,) = struct.unpack_from(f"{e}I", buf, 4)
    (n,) = struct.unpack_from(f"{e}H", buf, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, cnt, val = struct.unpack_from(f"{e}HHII", buf, ifd_off + 2 + 12 * i)
        if typ == 3 and cnt == 1:  # SHORT packed into the value word
            val = val & 0xFFFF if e == "<" else (val >> 16)
        tags[tag] = (typ, cnt, val)

    def req(tag: int) -> int:
        if tag not in tags:
            raise ValueError(f"{path}: missing TIFF tag {tag}")
        return tags[tag][2]

    w, h, bits = req(_T_WIDTH), req(_T_HEIGHT), req(_T_BPS)
    comp = tags.get(_T_COMPRESSION, (3, 1, 1))[2]
    if tags.get(_T_SAMPLE_FORMAT, (3, 1, _SAMPLE_FLOAT))[2] != _SAMPLE_FLOAT:
        raise NotImplementedError("only floating-point GeoTIFF samples supported")
    off, cnt = req(_T_STRIP_OFFSETS), req(_T_STRIP_COUNTS)
    data = buf[off : off + cnt]
    if comp == 8:
        data = zlib.decompress(data)
    elif comp != 1:
        raise NotImplementedError(f"unsupported TIFF compression {comp}")
    arr = np.frombuffer(data, dtype=f"{e}f{bits // 8}").reshape(h, w)
    sx, sy, _ = struct.unpack_from(f"{e}3d", buf, tags[_T_PIXEL_SCALE][2])
    tie = struct.unpack_from(f"{e}6d", buf, tags[_T_TIEPOINT][2])
    # tiepoint anchors raster (i,j) at model (x,y): origin = x − i·sx, y + j·sy
    origin = (tie[3] - tie[0] * sx, tie[4] + tie[1] * sy)
    return arr, origin, (sx, sy)


def gtiff_decode(path: str, opts=None, value_col: str = "value") -> pd.DataFrame:
    """Raster → long-format rows (latitude, longitude, value, band
    metadata) — the rioxarray-open analog for the ingest surface.
    GeoTIFF is north-up: row 0 is the NORTHERN edge, so latitude
    descends down the rows (the ERA5 grid convention)."""
    arr, (x0, y0), (sx, sy) = read_geotiff(path)
    h, w = arr.shape
    lons = x0 + np.arange(w) * sx
    lats = y0 - np.arange(h) * sy
    la, lo = np.meshgrid(lats, lons, indexing="ij")
    pdf = pd.DataFrame(
        {
            "latitude": la.ravel(),
            "longitude": lo.ravel(),
            value_col: np.asarray(arr, dtype="f8").ravel(),
        }
    )
    if opts is not None and getattr(opts, "area", None) is not None:
        n, w_, s, e_ = opts.area
        pdf = pdf[
            (pdf["latitude"] <= n) & (pdf["latitude"] >= s)
            & (pdf["longitude"] >= w_) & (pdf["longitude"] <= e_)
        ]
    return pdf.reset_index(drop=True)


def write_geotiff_partitioned(
    rows,
    out_dir: str,
    value_col: str = "value",
    compression: str | None = "deflate",
) -> int:
    """Distributed GeoTIFF sink: shuffle long-format rows
    (time, latitude, longitude, value) by time slice; each task grids
    its slice and serializes one whole GeoTIFF (the COG-style whole-file
    unit of parallel output). Cells absent from the input stay NaN.
    Returns the number of rasters written."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write_slice(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (ts,) = key
        lats = np.sort(pdf["latitude"].unique())[::-1]  # north-up
        lons = np.sort(pdf["longitude"].unique())
        lai = {v: i for i, v in enumerate(lats)}
        loi = {v: i for i, v in enumerate(lons)}
        grid = np.full((len(lats), len(lons)), np.nan)
        grid[pdf["latitude"].map(lai), pdf["longitude"].map(loi)] = pdf[
            value_col
        ].to_numpy(dtype="f8")
        sx = float(lons[1] - lons[0]) if len(lons) > 1 else 1.0
        sy = float(lats[0] - lats[1]) if len(lats) > 1 else 1.0
        path = os.path.join(out_dir, f"{ts}.tif")
        write_geotiff(path, grid, (float(lons[0]), float(lats[0])), (sx, sy), compression)
        return pd.DataFrame({"slice": [str(ts)], "path": [path], "n_rows": [len(pdf)]})

    done = (
        rows.withColumn("_slice", F.date_format("time", "yyyy-MM-dd'T'HH"))
        .groupBy("_slice")
        .applyInPandas(write_slice, "slice string, path string, n_rows long")
        .count()
    )
    return int(done)
