"""Golden tests for the stdlib GRIB2 codec (sources/grib2.py):
self-written simple-packed messages parse back exactly, the message
filter skips without unpacking, and the hypercube ingest auto-detects
GRIB2 by magic+edition bytes. Reference semantics: cfgrib decode with
edition fallback, weather_mv loader_pipeline/sinks.py:437-519."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from weather_tools_spark.sources import grib2 as G2
from weather_tools_spark.sources import hypercube as H

LATS = np.array([49.0, 48.75, 48.5])
LONS = np.array([2.0, 2.25, 2.5, 2.75])


def _msgs():
    # values are i + 0.125: exact multiples of 10^-3, so simple packing
    # at D=3 round-trips exactly (X integers, R exact in float32)
    base = np.arange(12, dtype="f8").reshape(3, 4)
    return [
        {"param": "d2m", "ref_time": "2024-06-01 06:00:00", "lats": LATS, "lons": LONS,
         "values": base + 0.125},
        {"param": "u10", "ref_time": "2024-06-01 06:00:00", "lats": LATS, "lons": LONS,
         "values": base * 2 - 5.5},
        {"param": "v10", "ref_time": "2024-06-01 06:00:00", "lats": LATS, "lons": LONS,
         "values": base * -0.25},
    ]


def test_roundtrip_exact(tmp_path):
    path = str(tmp_path / "f.grib2")
    G2.write_grib2(path, _msgs())
    buf = open(path, "rb").read()
    assert buf[:4] == b"GRIB" and buf[7] == 2  # magic + edition
    (total,) = struct.unpack_from(">Q", buf, 8)
    assert buf[total - 4 : total] == b"7777"  # first message terminator
    assert G2.is_grib2(path)

    msgs = G2.read_grib2(path)
    assert [m["param"] for m in msgs] == ["d2m", "u10", "v10"]
    for got, want in zip(msgs, _msgs()):
        assert got["ref_time"] == pd.Timestamp("2024-06-01 06:00:00")
        assert np.array_equal(got["lats"], LATS)
        assert np.array_equal(got["lons"], LONS)
        assert np.array_equal(got["values"], want["values"])  # exact


def test_negative_coordinates_sign_magnitude(tmp_path):
    # southern/western hemisphere grid exercises sign-magnitude ints
    lats = np.array([-10.0, -10.25])
    lons = np.array([-75.5, -75.25, -75.0])
    vals = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    path = str(tmp_path / "s.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-01-01", "lats": lats,
                           "lons": lons, "values": vals}])
    (m,) = G2.read_grib2(path)
    assert np.array_equal(m["lats"], lats) and np.array_equal(m["lons"], lons)
    assert np.array_equal(m["values"], vals)


def test_message_filter_pushdown(tmp_path):
    path = str(tmp_path / "f.grib2")
    G2.write_grib2(path, _msgs())
    only_u = G2.read_grib2(path, want={G2.PARAMS["u10"]})
    assert [m["param"] for m in only_u] == ["u10"]

    # decode honors opts.variables as the filter
    opts = H.IngestOptions(variables=["d2m"])
    pdf = G2.grib2_decode(path, opts)
    assert "d2m" in pdf.columns and "u10" not in pdf.columns
    assert len(pdf) == 12


def test_grib1_edition_fallback(tmp_path):
    p = tmp_path / "old.grib"
    # edition byte 1 → must raise toward the edition-1 codec, not misparse
    p.write_bytes(b"GRIB\x00\x00\x00\x01" + b"\x00" * 24)
    assert not G2.is_grib2(str(p))
    with pytest.raises(NotImplementedError, match="edition 1"):
        G2.read_grib2(str(p))


@pytest.mark.parametrize("packing", ["complex", "complex_diff1", "complex_diff2"])
def test_complex_packing_roundtrip(tmp_path, packing):
    """Templates 5.2/5.3: multi-group fields (group length 20 ⇒ a
    truncated last group on a 3×4 grid plus a 60-point grid spanning 3
    full groups) round-trip exactly on 10^-3 multiples."""
    path = str(tmp_path / "c.grib2")
    G2.write_grib2(path, _msgs(), packing=packing)
    msgs = G2.read_grib2(path)
    assert [m["param"] for m in msgs] == ["d2m", "u10", "v10"]
    for got, want in zip(msgs, _msgs()):
        assert np.array_equal(got["values"], want["values"])

    # bigger grid: several groups, wide dynamic range, negatives
    lats = np.linspace(60.0, 50.0, 6)
    lons = np.linspace(-20.0, -10.0, 10)
    vals = ((np.arange(60).reshape(6, 10) ** 2) - 1200) / 8.0  # /8: dyadic, exact at D=3
    G2.write_grib2(
        path,
        [{"param": "u10", "ref_time": "2024-02-02", "lats": lats, "lons": lons,
          "values": vals}],
        packing=packing,
    )
    (m,) = G2.read_grib2(path)
    assert np.array_equal(m["values"], vals)


def test_png_packing_roundtrip(tmp_path):
    """Template 5.41: offsets packed as a genuine grayscale PNG
    (stdlib zlib encoder, filter 0). Exact on 10^-3 multiples within
    the 16-bit span."""
    path = str(tmp_path / "p.grib2")
    G2.write_grib2(path, _msgs(), packing="png")
    msgs = G2.read_grib2(path)
    for got, want in zip(msgs, _msgs()):
        assert np.array_equal(got["values"], want["values"])
    # the section-7 payload really is a PNG stream
    buf = open(path, "rb").read()
    assert b"\x89PNG\r\n\x1a\n" in buf and b"IHDR" in buf and b"IEND" in buf


def test_png_decoder_handles_all_filter_types():
    """PNGs from standard encoders use per-scanline filter heuristics;
    the decoder reverses all five types (None/Sub/Up/Average/Paeth)."""
    import struct as _s
    import zlib as _z

    rng = np.random.RandomState(11)
    h, w = 4, 6
    img = rng.randint(0, 255, (h, w)).astype("u1")
    for ftype in range(5):
        scan, prev = b"", np.zeros(w, dtype="i4")
        for j in range(h):
            row = img[j].astype("i4")
            enc = np.zeros(w, dtype="i4")
            for i in range(w):
                a = int(row[i - 1]) if i >= 1 else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if i >= 1 else 0
                pred = [0, a, b, (a + b) // 2,
                        a if abs(b - c) <= abs(a - c) and abs(b - c) <= abs(a + b - 2 * c)
                        else b if abs(a - c) <= abs(a + b - 2 * c) else c][ftype]
                enc[i] = (row[i] - pred) % 256
            prev = row
            scan += bytes([ftype]) + enc.astype("u1").tobytes()

        def chunk(tag, body):
            return _s.pack(">I", len(body)) + tag + body + _s.pack(
                ">I", _z.crc32(tag + body) & 0xFFFFFFFF
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", _z.compress(scan))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(G2._png_decode(png), img.astype("i8"))


@pytest.mark.parametrize("packing", ["simple", "complex", "complex_diff2"])
def test_bitmap_roundtrip(tmp_path, packing):
    """NaN grid points produce a real section-6 bitmap: the data
    section holds only present points; decode scatters NaN back."""
    rng = np.random.RandomState(7)
    vals = (rng.randint(-5000, 5000, (3, 4)) / 1000.0)
    vals[0, 1] = vals[2, 3] = vals[1, 0] = np.nan
    path = str(tmp_path / "b.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-01-05", "lats": LATS,
                           "lons": LONS, "values": vals}], packing=packing)
    (m,) = G2.read_grib2(path)
    assert np.array_equal(np.isnan(m["values"]), np.isnan(vals))
    keep = ~np.isnan(vals)
    assert np.array_equal(m["values"][keep], vals[keep])


def test_bitmap_nan_becomes_null_in_ingest(spark, tmp_path):
    """The reference scrubs NaN→NULL on every row (bq.py:461-465,
    util.py:88-99); bitmap holes must surface as SQL NULLs."""
    vals = np.arange(12, dtype="f8").reshape(3, 4)
    vals[1, 2] = np.nan
    path = str(tmp_path / "n.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-01-05", "lats": LATS,
                           "lons": LONS, "values": vals}])
    rows = H.ingest(spark, [path])
    assert rows.filter("d2m IS NULL").count() == 1
    assert rows.filter("d2m IS NOT NULL").count() == 11


def test_complex_packing_is_smaller_on_smooth_fields(tmp_path):
    """The point of complex packing: per-group widths track local
    dynamic range, so smooth fields pack tighter than one global
    width."""
    rng = np.random.RandomState(5)
    lats = np.linspace(60.0, 50.0, 20)
    lons = np.linspace(-20.0, 0.0, 40)
    smooth = np.cumsum(np.cumsum(rng.randint(-50, 51, (20, 40)), axis=0), axis=1) / 1000.0
    msg = [{"param": "d2m", "ref_time": "2024-01-01", "lats": lats, "lons": lons,
            "values": smooth}]
    p_simple = str(tmp_path / "s.grib2")
    p_complex = str(tmp_path / "c.grib2")
    G2.write_grib2(p_simple, msg, packing="simple")
    G2.write_grib2(p_complex, msg, packing="complex_diff2")
    import os

    assert os.path.getsize(p_complex) < os.path.getsize(p_simple)
    np.testing.assert_array_equal(G2.read_grib2(p_complex)[0]["values"], smooth)


def test_ingest_auto_detects_grib2(spark, tmp_path):
    path = str(tmp_path / "era.grib2")
    G2.write_grib2(path, _msgs())
    out = H.ingest(spark, [path]).collect()
    assert len(out) == 12
    got = {(r.latitude, r.longitude): (r.d2m, r.u10, r.v10) for r in out}
    assert got[(49.0, 2.0)] == (0.125, -5.5, 0.0)
    assert got[(48.5, 2.75)] == (11.125, 16.5, -2.75)


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
    n = G2.write_grib2_partitioned(df, out, ["d2m", "u10"])
    assert n == 2

    import os

    files = sorted(os.listdir(out))
    assert files == ["2024-06-02T00.grib2", "2024-06-02T12.grib2"]
    back = G2.grib2_decode(os.path.join(out, "2024-06-02T12.grib2"), None)
    want = {(la, lo): (v1, v2) for t, la, lo, v1, v2 in rows if t.hour == 12}
    assert len(back) == len(want)
    for _, r in back.iterrows():
        assert want[(r.latitude, r.longitude)] == (r.d2m, r.u10)


def test_lambert_grid_template_330(tmp_path, spark):
    """Grid definition template 3.30 (Lambert conformal — the NAM/HRRR
    grid): the writer stores first-point lat/lon + LaD/LoV/Latin1/
    Latin2 + Dx/Dy in millimeters; the reader reconstructs per-point
    lat/lon through the closed spherical inverse projection
    (functions/geo.py) and the hypercube decode emits curvilinear
    long-format rows."""
    from weather_tools_spark.functions.geo import (
        lambert_conformal_inverse_np,
        lambert_conformal_params,
        lambert_conformal_xy_np,
    )

    grid = {"lat1": 21.138, "lon1": -122.72, "dx_m": 3000.0, "dy_m": 3000.0,
            "lad": 38.5, "lov": -97.5, "lat_1": 38.5, "lat_2": 38.5}
    ny, nx = 6, 8
    rng = np.random.RandomState(2)
    vals = rng.randint(-20000, 20000, (ny, nx)) / 1000.0
    path = str(tmp_path / "hrrr.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-03-01T12:00:00",
                           "values": vals, "grid": grid}])
    (m,) = G2.read_grib2(path)
    assert np.array_equal(m["values"], vals)

    p = lambert_conformal_params(38.5, 38.5, 38.5, -97.5)
    x1, y1 = lambert_conformal_xy_np(grid["lat1"], grid["lon1"], p)
    xx, yy = np.meshgrid(x1 + np.arange(nx) * 3000.0, y1 + np.arange(ny) * 3000.0)
    elat, elon = lambert_conformal_inverse_np(xx, yy, p)
    np.testing.assert_allclose(m["lat_grid"], elat, atol=2e-6)
    np.testing.assert_allclose(m["lon_grid"], elon, atol=2e-6)
    assert abs(m["lat_grid"][0, 0] - grid["lat1"]) < 1e-5  # first point exact

    # curvilinear long-format rows through ingest auto-dispatch
    rows = H.ingest(spark, [path]).collect()
    assert len(rows) == ny * nx
    got = {round(r.latitude, 5) for r in rows}
    assert round(grid["lat1"], 5) in got


def test_polar_stereo_grid_template_320(tmp_path):
    """Grid template 3.20 (polar stereographic, true at LaD): decoded
    per-point lat/lon via the inverse projection; the first grid point
    reproduces its stored coordinates."""
    grid = {"type": "polar", "lat1": 60.0, "lon1": -105.0, "dx_m": 25000.0,
            "dy_m": 25000.0, "lad": 60.0, "lov": -80.0}
    ny, nx = 5, 7
    rng = np.random.RandomState(3)
    vals = rng.randint(-9000, 9000, (ny, nx)) / 1000.0
    path = str(tmp_path / "arctic.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-02-02T00:00:00",
                           "values": vals, "grid": grid}])
    (m,) = G2.read_grib2(path)
    assert np.array_equal(m["values"], vals)
    assert abs(m["lat_grid"][0, 0] - 60.0) < 1e-5
    assert abs(m["lon_grid"][0, 0] + 105.0) < 1e-5
    assert m["lat_grid"].min() >= 59.9  # stays in the Arctic band


def test_gaussian_grid_template_340(tmp_path):
    """Grid template 3.40 (regular Gaussian — the native ECMWF model
    grid): latitudes are the Gauss-Legendre nodes recomputed from N,
    so the decoded rows are EXACT Legendre roots (better than the
    microdegree anchor precision); a contiguous row band roundtrips."""
    full = G2.gaussian_latitudes(32)
    assert len(full) == 64
    assert np.all(np.diff(full) < 0)  # north → south
    assert abs(full[0] - 87.86) < 0.2  # N32's first line (known value)
    sub = full[10:21]
    grid = {"type": "gaussian", "n": 32, "lat1": float(sub[0]), "lon1": 0.0,
            "lat2": float(sub[-1]), "lon2": 357.5, "di": 2.5}
    nj, ni = len(sub), 144
    vals = (np.arange(nj * ni).reshape(nj, ni) % 977) / 8.0
    path = str(tmp_path / "era.grib2")
    G2.write_grib2(path, [{"param": "u10", "ref_time": "2024-02-02T06:00:00",
                           "values": vals, "grid": grid}])
    (m,) = G2.read_grib2(path)
    assert np.array_equal(m["values"], vals)
    assert np.array_equal(m["lats"], sub)  # exact Legendre nodes
    np.testing.assert_allclose(m["lons"], np.arange(ni) * 2.5, atol=1e-9)


def test_reduced_gaussian_grid(tmp_path):
    """REDUCED Gaussian grid (template 3.40 + points-per-row list —
    ERA5's native storage): ragged rows each spanning the full circle
    at their own spacing, per-point lat/lon reconstruction, bitmap
    over the ragged layout, and long-format decode."""
    full = G2.gaussian_latitudes(24)
    sub = full[5:12]
    counts = [20, 24, 28, 30, 28, 24, 20]
    npts = sum(counts)
    rng = np.random.RandomState(5)
    vals = rng.randint(-8000, 8000, npts) / 1000.0
    grid = {"type": "gaussian_reduced", "n": 24, "lat1": float(sub[0]),
            "lat2": float(sub[-1]), "counts": counts}
    path = str(tmp_path / "era-native.grib2")
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-04-04T00:00:00",
                           "values": vals, "grid": grid}])
    (m,) = G2.read_grib2(path)
    assert np.array_equal(m["values"], vals)
    assert np.array_equal(m["lat_grid"], np.repeat(sub, counts))
    np.testing.assert_allclose(m["lon_grid"][: counts[0]],
                               np.arange(counts[0]) * (360.0 / counts[0]), atol=1e-9)
    assert len(G2.grib2_decode(path, None)) == npts

    # NaN holes → bitmap over the ragged point sequence
    vals2 = vals.copy()
    vals2[[3, 50, npts - 1]] = np.nan
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-04-04T00:00:00",
                           "values": vals2, "grid": grid}], packing="complex_diff2")
    (m2,) = G2.read_grib2(path)
    assert np.array_equal(np.isnan(m2["values"]), np.isnan(vals2))
    keep = ~np.isnan(vals2)
    assert np.array_equal(m2["values"][keep], vals2[keep])


def test_pds_step_and_ensemble_member(tmp_path):
    """PDS templates 4.0/4.1: forecast time (step) and the ensemble
    member number — the GRIB origin of the hypercube's step /
    valid_time / number coordinates (reference coordinate set
    sinks.py:44; step stored as seconds-FLOAT64, bq.py:440-441).
    Files without them keep the plain 3-coordinate decode schema."""
    lats = np.array([49.0, 48.75])
    lons = np.array([2.0, 2.25, 2.5])
    base = np.arange(6, dtype="f8").reshape(2, 3)
    msgs = [
        {"param": "d2m", "ref_time": "2024-05-01 00:00:00", "lats": lats,
         "lons": lons, "values": base + member * 10 + step,
         "step_hours": step, "member": member}
        for member in (0, 1, 2) for step in (0, 6, 12)
    ]
    path = str(tmp_path / "ens.grib2")
    G2.write_grib2(path, msgs)
    back = G2.read_grib2(path)
    m = back[4]  # member 1, step 6
    assert m["member"] == 1 and m["step_hours"] == 6.0
    assert m["valid_time"] == pd.Timestamp("2024-05-01 06:00:00")

    pdf = G2.grib2_decode(path, None)
    assert {"step", "valid_time", "number"} <= set(pdf.columns)
    assert len(pdf) == 9 * 6
    assert sorted(pdf["step"].unique()) == [0.0, 21600.0, 43200.0]
    row = pdf[(pdf.number == 2) & (pdf.step == 43200.0)].iloc[0]
    assert row.valid_time == pd.Timestamp("2024-05-01 12:00:00")

    # deterministic file: no step/member columns
    G2.write_grib2(path, [{"param": "d2m", "ref_time": "2024-05-01",
                           "lats": lats, "lons": lons, "values": base}])
    assert set(G2.grib2_decode(path, None).columns) == {
        "time", "latitude", "longitude", "d2m"
    }


def test_isobaric_levels(tmp_path):
    """Pressure-level products: a per-message ('isobaric', hPa) level
    writes fixed-surface type 100 with the Pa value; multi-level files
    decode with a `level` column — the hypercube's vertical axis."""
    base = np.arange(12, dtype="f8").reshape(3, 4)
    msgs = [{"param": "u10", "ref_time": "2024-05-01", "lats": LATS, "lons": LONS,
             "values": base + hpa, "level": ("isobaric", hpa)}
            for hpa in (1000, 850, 500)]
    path = str(tmp_path / "plev.grib2")
    G2.write_grib2(path, msgs)
    back = G2.read_grib2(path)
    assert [m["level"] for m in back] == [100000.0, 85000.0, 50000.0]
    assert all(m["level_type"] == 100 for m in back)
    pdf = G2.grib2_decode(path, None)
    assert sorted(pdf["level"].unique()) == [50000.0, 85000.0, 100000.0]
    assert len(pdf) == 36


def test_mercator_grid_roundtrip(tmp_path):
    """Grid template 3.10: encode a Mercator grid (true scale 20°),
    decode, and verify coordinates against an independent computation
    of the spherical Mercator graticule plus exact value roundtrip."""
    import math

    import numpy as np

    from weather_tools_spark.functions.geo import GRIB_SPHERE_R
    from weather_tools_spark.sources.grib2 import read_grib2, write_grib2

    nx, ny = 5, 4
    vals = (np.arange(nx * ny, dtype="f8").reshape(ny, nx) / 8) + 290.0
    g = {"type": "mercator", "lat1": -10.0, "lon1": 100.0, "lad": 20.0,
         "dx_m": 50_000.0, "dy_m": 60_000.0}
    p = str(tmp_path / "merc.grib2")
    write_grib2(p, [{"param": "d2m", "ref_time": "2024-03-01T06:00",
                     "grid": g, "values": vals}])
    (m,) = read_grib2(p)
    assert m["values"].shape == (ny, nx)
    np.testing.assert_allclose(m["values"], vals, atol=1e-3)
    # independent graticule: x=Rk·λ, y=Rk·ln tan(π/4+φ/2)
    k = math.cos(math.radians(20.0))
    x1 = GRIB_SPHERE_R * k * math.radians(100.0)
    y1 = GRIB_SPHERE_R * k * math.log(math.tan(math.pi / 4 + math.radians(-10.0) / 2))
    exp_lons = [(x1 + i * 50_000.0) / (GRIB_SPHERE_R * k) / math.radians(1) for i in range(nx)]
    exp_lats = [
        math.degrees(2 * math.atan(math.exp((y1 + j * 60_000.0) / (GRIB_SPHERE_R * k))) - math.pi / 2)
        for j in range(ny)
    ]
    np.testing.assert_allclose(m["lons"], exp_lons, atol=2e-5)  # µdeg quantization
    np.testing.assert_allclose(m["lats"], exp_lats, atol=2e-5)
    assert m["lats"][0] == pytest.approx(-10.0, abs=1e-5)
    assert m["lons"][0] == pytest.approx(100.0, abs=1e-5)
