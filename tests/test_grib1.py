"""Golden tests for the stdlib GRIB edition-1 codec (sources/grib1.py):
self-written simple-packed messages parse back exactly (IBM hexadecimal
float reference value, millidegree sign-magnitude grid), the message
filter skips without unpacking, and the hypercube ingest auto-detects
edition 1 by magic+edition bytes — the reference's cfgrib edition
fallback (weather_mv loader_pipeline/sinks.py:370-389) realized as a
second stdlib codec."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from weather_tools_spark.sources import grib1 as G1
from weather_tools_spark.sources import hypercube as H

LATS = np.array([49.0, 48.75, 48.5])
LONS = np.array([2.0, 2.25, 2.5, 2.75])


def _msgs():
    # values are exact multiples of 10^-3, so simple packing at D=3
    # round-trips exactly (X integers, R exact in the IBM encoding)
    base = np.arange(12, dtype="f8").reshape(3, 4)
    return [
        {"param": "d2m", "ref_time": "2024-06-01 06:00:00", "lats": LATS, "lons": LONS,
         "values": base + 0.125},
        {"param": "u10", "ref_time": "2024-06-01 06:00:00", "lats": LATS, "lons": LONS,
         "values": base * 2 - 5.5},
        {"param": "v10", "ref_time": "2024-06-01 06:00:00", "lats": LATS, "lons": LONS,
         "values": base * -0.25},
    ]


def test_ibm_float_exact_dyadics():
    # integers up to 2^24 and dyadic rationals are exactly representable
    for x in (0.0, 1.0, -1.0, 16.0, 255.0, 65536.0, 2.0**24 - 1, -1234.5, 0.001953125):
        assert G1.ibm32_decode(G1.ibm32_encode(x)) == x


def test_ibm_float_directed_bound():
    rng = np.random.RandomState(7)
    for x in rng.uniform(-1e8, 1e8, 1000):
        word, dec = G1._encode_ref_at_most(float(x))
        assert dec <= x
        # within one hexit ulp below (relative 16·2^-24)
        assert x - dec <= abs(x) * 16 * 2.0**-24 + 1e-30


def test_roundtrip_exact(tmp_path):
    path = str(tmp_path / "f.grib")
    G1.write_grib1(path, _msgs())
    buf = open(path, "rb").read()
    assert buf[:4] == b"GRIB" and buf[7] == 1  # magic + edition
    total = int.from_bytes(buf[4:7], "big")
    assert buf[total - 4 : total] == b"7777"
    assert G1.is_grib1(path)

    msgs = G1.read_grib1(path)
    assert [m["param"] for m in msgs] == ["d2m", "u10", "v10"]
    for got, want in zip(msgs, _msgs()):
        assert got["ref_time"] == pd.Timestamp("2024-06-01 06:00:00")
        np.testing.assert_allclose(got["lats"], LATS, atol=1e-12)
        np.testing.assert_allclose(got["lons"], LONS, atol=1e-12)
        assert np.array_equal(got["values"], want["values"])  # exact


def test_negative_coordinates_sign_magnitude(tmp_path):
    lats = np.array([-10.0, -10.25])
    lons = np.array([-75.5, -75.25, -75.0])
    vals = np.array([[1.0, 2.0, 3.0], [-4.0, -5.0, 6.0]])
    path = str(tmp_path / "s.grib")
    G1.write_grib1(path, [{"param": "d2m", "ref_time": "2024-01-01", "lats": lats,
                           "lons": lons, "values": vals}])
    (m,) = G1.read_grib1(path)
    np.testing.assert_allclose(m["lats"], lats, atol=1e-12)
    np.testing.assert_allclose(m["lons"], lons, atol=1e-12)
    assert np.array_equal(m["values"], vals)


def test_century_boundary_years(tmp_path):
    # year 2000 is century 20, year-of-century 100 — the classic edge
    path = str(tmp_path / "y2k.grib")
    for year in (2000, 1999, 2024):
        G1.write_grib1(path, [{"param": "d2m", "ref_time": f"{year}-03-04 05:00:00",
                               "lats": LATS[:2], "lons": LONS[:2],
                               "values": np.ones((2, 2))}])
        (m,) = G1.read_grib1(path)
        assert m["ref_time"] == pd.Timestamp(f"{year}-03-04 05:00:00")


def test_bitmap_roundtrip(tmp_path):
    """NaN grid points produce a real BMS: PDS flag 0xC0, data section
    holds present points only, decode scatters NaN back."""
    rng = np.random.RandomState(9)
    vals = (rng.randint(-5000, 5000, (3, 4)) / 1000.0)
    vals[0, 0] = vals[1, 3] = np.nan
    path = str(tmp_path / "b.grib")
    G1.write_grib1(path, [{"param": "d2m", "ref_time": "2024-01-05", "lats": LATS,
                           "lons": LONS, "values": vals}])
    buf = open(path, "rb").read()
    assert buf[8 + 7] == 0xC0  # PDS flags: GDS + BMS present
    (m,) = G1.read_grib1(path)
    assert np.array_equal(np.isnan(m["values"]), np.isnan(vals))
    keep = ~np.isnan(vals)
    assert np.array_equal(m["values"][keep], vals[keep])


def test_message_filter_pushdown(tmp_path):
    path = str(tmp_path / "f.grib")
    G1.write_grib1(path, _msgs())
    only_u = G1.read_grib1(path, want={G1.PARAMS1["u10"]})
    assert [m["param"] for m in only_u] == ["u10"]

    opts = H.IngestOptions(variables=["d2m"])
    pdf = G1.grib1_decode(path, opts)
    assert "d2m" in pdf.columns and "u10" not in pdf.columns
    assert len(pdf) == 12


def test_header_probe_lists_params(tmp_path):
    path = str(tmp_path / "f.grib")
    G1.write_grib1(path, _msgs())
    assert G1.list_params1(path) == ["d2m", "u10", "v10"]


def test_edition2_rejected_by_grib1_reader(tmp_path):
    from weather_tools_spark.sources import grib2 as G2

    path = str(tmp_path / "new.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-01-01",
                           "lats": LATS, "lons": LONS,
                           "values": np.zeros((3, 4))}])
    assert not G1.is_grib1(path)
    with pytest.raises(ValueError, match="edition 2"):
        G1.read_grib1(path)


def test_ingest_auto_detects_grib1(spark, tmp_path):
    path = str(tmp_path / "era-interim.grib")
    G1.write_grib1(path, _msgs())
    out = H.ingest(spark, [path]).collect()
    assert len(out) == 12
    got = {(r.latitude, r.longitude): (r.d2m, r.u10, r.v10) for r in out}
    assert got[(49.0, 2.0)] == (0.125, -5.5, 0.0)
    assert got[(48.5, 2.75)] == (11.125, 16.5, -2.75)


def test_opener_dispatches_grib1(spark, tmp_path):
    from weather_tools_spark.sources.opener import detect, open_dataset

    path = str(tmp_path / "old.grib")
    G1.write_grib1(path, _msgs())
    assert detect(path) == "grib1"
    df = open_dataset(spark, path)
    assert sorted(c for c in df.columns if c not in ("time", "latitude", "longitude")) == [
        "d2m", "u10", "v10"
    ]
    assert df.count() == 12


def test_partitioned_sink_roundtrip(spark, tmp_path):
    rows = []
    for h in (0, 12):
        for la in LATS:
            for lo in LONS:
                rows.append(
                    (pd.Timestamp(f"2024-06-02 {h:02d}:00:00").to_pydatetime(),
                     float(la), float(lo), float(h + la + lo), float(h - lo))
                )
    df = spark.createDataFrame(
        rows, "time timestamp, latitude double, longitude double, d2m double, u10 double"
    )
    out = str(tmp_path / "gribs")
    n = G1.write_grib1_partitioned(df, out, ["d2m", "u10"])
    assert n == 2

    import os

    files = sorted(os.listdir(out))
    assert files == ["2024-06-02T00.grib", "2024-06-02T12.grib"]
    back = G1.grib1_decode(os.path.join(out, "2024-06-02T12.grib"), None)
    want = {(la, lo): (v1, v2) for t, la, lo, v1, v2 in rows if t.hour == 12}
    assert len(back) == len(want)
    for _, r in back.iterrows():
        assert want[(r.latitude, r.longitude)] == (r.d2m, r.u10)


def test_forecast_step_p1(tmp_path):
    """GRIB1 forecast step in PDS P1 (hours): decoded as step
    seconds-FLOAT64 + valid_time (reference bq.py:440-441 semantics);
    analysis files (P1=0 everywhere) keep the plain schema."""
    base = np.arange(12, dtype="f8").reshape(3, 4)
    path = str(tmp_path / "fc.grib")
    G1.write_grib1(path, [{"param": "d2m", "ref_time": "2024-05-01 00:00:00",
                           "lats": LATS, "lons": LONS, "values": base + s,
                           "step_hours": s} for s in (0, 12)])
    msgs = G1.read_grib1(path)
    assert msgs[1]["step_hours"] == 12.0
    assert msgs[1]["valid_time"] == pd.Timestamp("2024-05-01 12:00:00")
    pdf = G1.grib1_decode(path, None)
    assert sorted(pdf["step"].unique()) == [0.0, 43200.0]

    G1.write_grib1(path, [{"param": "d2m", "ref_time": "2024-05-01",
                           "lats": LATS, "lons": LONS, "values": base}])
    assert set(G1.grib1_decode(path, None).columns) == {
        "time", "latitude", "longitude", "d2m"
    }
