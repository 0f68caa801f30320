"""Foreign-producer NetCDF evidence: the stdlib classic-NetCDF decoder
has (r5 verdict task 6) 'only been proven on self-written files'. No
third-party NetCDF producer exists in this container (no scipy/xarray/
netCDF4), so the independent evidence is a file HAND-ASSEMBLED byte by
byte from the public NetCDF classic spec in the layout the ECMWF CDS
actually emits for ERA5 — which our own writer would never produce:

- coordinate floats as NC_FLOAT (our writer emits f8), latitude
  DESCENDING, longitude-major dim declaration order;
- time as NC_INT with ``hours since 1900-01-01 00:00:00.0`` /
  ``calendar: gregorian`` (ours: seconds since 1970);
- data packed as NC_SHORT with scale_factor/add_offset and a
  _FillValue=-32767 sentinel (ours: unpacked f8);
- global attributes present (Conventions/history — must be skipped).

The file is then driven through the real pipeline: ``mv`` CLI → parquet
→ daily-average SQL, checked against a DuckDB recompute over the same
parquet (matching the xql daily-avg oracle pattern)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from weather_tools_spark.sources import netcdf3 as N3

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE, NC_CHAR = 3, 4, 5, 6, 2

SCALE, OFFSET, FILL = 1.0 / 512, 250.0, -32767

# grid: 4 hourly steps over two calendar days × 2 lats (descending) × 3 lons
TIMES = pd.to_datetime(
    ["2016-01-01 00:00", "2016-01-01 01:00", "2016-01-02 00:00", "2016-01-02 01:00"]
)
LATS = np.array([49.0, 48.75], dtype="f4")  # descending, CDS-style
LONS = np.array([11.0, 11.25, 11.5], dtype="f4")
PACKED = np.arange(24, dtype="<i2").reshape(4, 2, 3) * 64 - 512
PACKED[1, 0, 1] = FILL  # one masked cell


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + _pad4(b)


def _att_text(name: str, text: str) -> bytes:
    b = text.encode()
    return _name(name) + struct.pack(">ii", NC_CHAR, len(b)) + _pad4(b)


def _att_num(name: str, nc_type: int, fmt: str, value) -> bytes:
    return _name(name) + struct.pack(">ii", nc_type, 1) + _pad4(struct.pack(fmt, value))


def _att_list(atts: list[bytes]) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", NC_ATTRIBUTE, len(atts)) + b"".join(atts)


def write_cds_style_file(path: str) -> None:
    """Assemble the CDF-1 bytes directly from the spec (magic, numrecs,
    dim/gatt/var lists, absolute data begins) — no code shared with
    sources/netcdf3.write_netcdf3."""
    hours = ((TIMES - pd.Timestamp("1900-01-01")) / pd.Timedelta(hours=1)).astype(int)
    # dim list in CDS declaration order: longitude, latitude, time
    dims = struct.pack(">ii", NC_DIMENSION, 3)
    dims += _name("longitude") + struct.pack(">i", len(LONS))
    dims += _name("latitude") + struct.pack(">i", len(LATS))
    dims += _name("time") + struct.pack(">i", len(TIMES))
    gatts = _att_list(
        [
            _att_text("Conventions", "CF-1.6"),
            _att_text("history", "2016-02-02 gribapi era5 retrieval"),
        ]
    )

    def var(name: str, dimids: tuple[int, ...], atts: list[bytes], nc_type: int,
            vsize: int, begin: int) -> bytes:
        out = _name(name) + struct.pack(">i", len(dimids))
        out += b"".join(struct.pack(">i", d) for d in dimids)
        out += _att_list(atts) + struct.pack(">iii", nc_type, vsize, begin)
        return out

    payloads = {
        "longitude": LONS.astype(">f4").tobytes(),
        "latitude": LATS.astype(">f4").tobytes(),
        "time": hours.to_numpy().astype(">i4").tobytes(),
        "t2m": PACKED.astype(">i2").tobytes(),
    }
    specs = [
        ("longitude", (0,), [_att_text("units", "degrees_east")], NC_FLOAT),
        ("latitude", (1,), [_att_text("units", "degrees_north")], NC_FLOAT),
        (
            "time",
            (2,),
            [
                _att_text("units", "hours since 1900-01-01 00:00:00.0"),
                _att_text("calendar", "gregorian"),
            ],
            NC_INT,
        ),
        (
            "t2m",
            (2, 1, 0),  # (time, latitude, longitude)
            [
                _att_num("scale_factor", NC_DOUBLE, ">d", SCALE),
                _att_num("add_offset", NC_DOUBLE, ">d", OFFSET),
                _att_num("_FillValue", NC_SHORT, ">h", FILL),
                _att_num("missing_value", NC_SHORT, ">h", FILL),
                _att_text("units", "K"),
            ],
            NC_SHORT,
        ),
    ]

    def assemble(begins: dict[str, int]) -> bytes:
        vl = struct.pack(">ii", NC_VARIABLE, len(specs))
        for nm, dimids, atts, t in specs:
            vsize = len(payloads[nm]) + (-len(payloads[nm]) % 4)
            vl += var(nm, dimids, atts, t, vsize, begins[nm])
        return b"CDF\x01" + struct.pack(">i", 0) + dims + gatts + vl

    zero = {nm: 0 for nm, *_ in specs}
    header_len = len(assemble(zero))
    begins, pos = {}, header_len
    for nm, *_ in specs:
        begins[nm] = pos
        pos += len(payloads[nm]) + (-len(payloads[nm]) % 4)
    body = b"".join(_pad4(payloads[nm]) for nm, *_ in specs)
    with open(path, "wb") as f:
        f.write(assemble(begins) + body)


def _expected_unpacked() -> np.ndarray:
    vals = PACKED.astype("f8") * SCALE + OFFSET
    vals[PACKED == FILL] = np.nan
    return vals


def test_decoder_reads_cds_layout(tmp_path):
    """read_netcdf3 + nc3_decode against the hand-assembled spec bytes:
    coords exact, CF time decoded from the 1900 epoch, packing and fill
    sentinel applied."""
    path = str(tmp_path / "era5-t2m.nc")
    write_cds_style_file(path)
    coords, data, attrs = N3.read_netcdf3(path)
    assert np.array_equal(np.asarray(coords["latitude"], "f8"), LATS.astype("f8"))
    assert np.array_equal(np.asarray(coords["longitude"], "f8"), LONS.astype("f8"))
    assert np.array_equal(np.asarray(data["t2m"], "i8"), PACKED.astype("i8"))
    assert attrs["t2m"]["scale_factor"] == [SCALE]

    pdf = N3.nc3_decode(path, None)
    assert list(pdf.columns) == ["time", "latitude", "longitude", "t2m"]
    assert len(pdf) == 24
    got_times = pd.DatetimeIndex(pdf["time"].unique())
    assert list(got_times) == list(TIMES)
    exp = _expected_unpacked().ravel()
    got = pdf["t2m"].to_numpy()
    assert np.allclose(got, exp, equal_nan=True)
    # lat order preserved (descending) in the long-format expansion
    assert pdf["latitude"].iloc[0] == 49.0 and pdf["latitude"].iloc[3] == 48.75


def test_cf_time_units_spellings():
    vals = np.array([0, 36, 48])
    got = N3.cf_decode_time(vals, "hours since 1900-01-01 00:00:00.0", "gregorian")
    assert got[1] == pd.Timestamp("1900-01-02 12:00")
    got = N3.cf_decode_time(np.array([10.5]), "days since 2000-01-01", None)
    assert got[0] == pd.Timestamp("2000-01-11 12:00")
    got = N3.cf_decode_time(np.array([90]), "seconds since 1970-01-01T00:00:00", "proleptic_gregorian")
    assert got[0] == pd.Timestamp("1970-01-01 00:01:30")
    with pytest.raises(NotImplementedError, match="360_day"):
        N3.cf_decode_time(vals, "days since 2000-01-01", "360_day")
    with pytest.raises(ValueError, match="unknown CF time unit"):
        N3.cf_decode_time(vals, "fortnights since 2000-01-01", None)


def test_cds_file_through_mv_and_daily_avg(spark, tmp_path):
    """Full-pipeline smoke on the foreign-layout file: mv CLI → parquet
    → daily-average SQL, against a DuckDB recompute over the same
    parquet (the xql daily-avg oracle pattern)."""
    import duckdb

    from weather_tools_spark.cli import main

    nc = str(tmp_path / "era5-t2m.nc")
    write_cds_style_file(nc)
    out = str(tmp_path / "rows.parquet")
    assert main(["mv", "--uris", nc, "--output", out]) == 0

    df = spark.read.parquet(out)
    assert df.count() == 24
    got = (
        df.selectExpr("date_trunc('day', time) AS day", "t2m")
        .groupBy("day")
        .agg({"t2m": "avg"})
        .withColumnRenamed("avg(t2m)", "avg_t2m")
        .orderBy("day")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""
        SELECT date_trunc('day', time) AS day, avg(t2m) AS avg_t2m
        FROM '{out}/*.parquet' GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert len(got) == 2
    assert np.allclose(got["avg_t2m"].to_numpy(), exp["avg_t2m"].to_numpy())
    # independent hand recompute: day-1 average skips the masked cell
    vals = _expected_unpacked()
    d1 = np.nanmean(vals[:2]) if not np.isnan(vals[:2]).all() else np.nan
    d2 = vals[2:].mean()
    assert abs(got["avg_t2m"].iloc[0] - d1) < 1e-9
    assert abs(got["avg_t2m"].iloc[1] - d2) < 1e-9
