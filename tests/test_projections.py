"""Map-projection verification for the weather-grid CRS transforms
(functions/geo.py): Lambert conformal conic (GRIB template 3.30),
north-polar stereographic (template 3.20), transverse Mercator, and
Web-Mercator. The reference reprojects through pyproj (weather_mv
loader_pipeline/sinks.py:149-227); these closed spherical forms are
library-free, so the tests pin the MATH, not a library:

- inverse ∘ forward = identity on a lat/lon grid (1e-9°);
- conformality — finite-difference local scale along meridian (h) and
  parallel (k) agree to 1e-5 relative, and both equal 1 at the
  projection's true line(s);
- geometric anchors (origin maps to (0,0), central meridian to x=0,
  pole to (0,0), parallels to circular arcs).

All finite differences are evaluated through the REAL Spark column
expressions, so the assertions cover the deployed code path."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from weather_tools_spark.functions import geo as G

LCC = G.lambert_conformal_params(lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0)


def _project(spark, pts, fwd):
    df = spark.createDataFrame(pts, "latitude double, longitude double")
    x, y = fwd(F.col("latitude"), F.col("longitude"))
    rows = df.select("latitude", "longitude", x.alias("x"), y.alias("y")).collect()
    return {(r.latitude, r.longitude): (r.x, r.y) for r in rows}


def _roundtrip(spark, pts, fwd, inv, tol=1e-9):
    df = spark.createDataFrame(pts, "latitude double, longitude double")
    x, y = fwd(F.col("latitude"), F.col("longitude"))
    proj = df.select("latitude", "longitude", x.alias("x"), y.alias("y"))
    la, lo = inv(F.col("x"), F.col("y"))
    back = proj.select("latitude", "longitude", la.alias("la"), lo.alias("lo")).collect()
    for r in back:
        assert abs(r.la - r.latitude) < tol, r
        assert abs(r.lo - r.longitude) < tol, r


def _scales(spark, lat, lon, fwd, radius=G.GRIB_SPHERE_R, eps=1e-6):
    """Finite-difference meridian scale h and parallel scale k through
    the Spark expressions."""
    pts = [(lat, lon), (lat + eps, lon), (lat, lon + eps)]
    m = _project(spark, pts, fwd)
    x0, y0 = m[(lat, lon)]
    xh, yh = m[(lat + eps, lon)]
    xk, yk = m[(lat, lon + eps)]
    dphi = eps * math.pi / 180
    dlam = eps * math.pi / 180
    h = math.hypot(xh - x0, yh - y0) / (radius * dphi)
    k = math.hypot(xk - x0, yk - y0) / (radius * math.cos(math.radians(lat)) * dlam)
    return h, k


GRID = [(la, lo) for la in (-70.0, -30.5, 0.25, 24.0, 47.5, 71.0)
        for lo in (-170.0, -96.0, -30.5, 0.0, 45.25, 179.0)]
NORTH = [(la, lo) for la in (20.0, 45.5, 60.0, 80.25, 89.0) for lo in (-120.0, 0.0, 77.5)]


def test_lcc_roundtrip(spark):
    _roundtrip(spark, GRID, lambda a, b: G.lambert_conformal_xy(a, b, LCC),
               lambda x, y: G.lambert_conformal_inverse(x, y, LCC))


def test_polar_stereo_roundtrip(spark):
    _roundtrip(spark, NORTH, lambda a, b: G.polar_stereo_xy(a, b, 60.0, -105.0),
               lambda x, y: G.polar_stereo_inverse(x, y, 60.0, -105.0))


def test_transverse_mercator_roundtrip(spark):
    pts = [(la, lo) for la in (-60.0, -10.25, 0.0, 33.5, 72.0)
           for lo in (-99.0, -96.0, -93.25)]  # within the zone
    _roundtrip(spark, pts, lambda a, b: G.transverse_mercator_xy(a, b, lon0=-96.0),
               lambda x, y: G.transverse_mercator_inverse(x, y, lon0=-96.0))


@pytest.mark.parametrize("lat,lon", [(25.0, -120.0), (39.0, -96.0), (55.5, -70.0)])
def test_lcc_conformal_and_true_parallels(spark, lat, lon):
    fwd = lambda a, b: G.lambert_conformal_xy(a, b, LCC)
    h, k = _scales(spark, lat, lon, fwd)
    assert abs(h - k) / k < 1e-5  # conformal: isotropic local scale
    h1, k1 = _scales(spark, 33.0, lon, fwd)
    h2, k2 = _scales(spark, 45.0, lon, fwd)
    assert abs(k1 - 1) < 1e-6 and abs(k2 - 1) < 1e-6  # true at both parallels
    hm, km = _scales(spark, 39.0, lon, fwd)
    assert km < 1  # scale dips below 1 between secant parallels


@pytest.mark.parametrize("lat,lon", [(30.0, 10.0), (60.0, -45.0), (85.0, 170.0)])
def test_polar_stereo_conformal_true_at_60(spark, lat, lon):
    fwd = lambda a, b: G.polar_stereo_xy(a, b, 60.0, 0.0)
    h, k = _scales(spark, lat, lon, fwd)
    assert abs(h - k) / k < 1e-5
    h60, k60 = _scales(spark, 60.0, lon, fwd)
    assert abs(k60 - 1) < 1e-6  # true at the standard parallel


def test_tm_conformal_true_on_central_meridian(spark):
    fwd = lambda a, b: G.transverse_mercator_xy(a, b, lon0=-96.0, k0=1.0)
    for lat in (-40.0, 0.5, 63.0):
        h, k = _scales(spark, lat, -96.0, fwd)
        assert abs(h - 1) < 1e-6 and abs(k - 1) < 1e-5
    h, k = _scales(spark, 10.0, -90.0, fwd)
    assert abs(h - k) / k < 1e-5 and h > 1  # off-meridian scale grows


def test_geometric_anchors(spark):
    # LCC origin → (0, 0); central meridian → x = 0
    m = _project(spark, [(39.0, -96.0), (55.0, -96.0), (25.0, -96.0)],
                 lambda a, b: G.lambert_conformal_xy(a, b, LCC))
    assert abs(m[(39.0, -96.0)][0]) < 1e-6 and abs(m[(39.0, -96.0)][1]) < 1e-6
    assert abs(m[(55.0, -96.0)][0]) < 1e-6 and abs(m[(25.0, -96.0)][0]) < 1e-6
    # LCC parallels are circular arcs: ρ constant along a parallel
    pts = [(45.0, lo) for lo in (-120.0, -96.0, -60.0)]
    mm = _project(spark, pts, lambda a, b: G.lambert_conformal_xy(a, b, LCC))
    rhos = {round(math.hypot(x, LCC["rho0"] - y), 6) for x, y in mm.values()}
    assert len(rhos) == 1
    # polar stereo: pole → (0,0); λ0 meridian → x = 0, y < 0
    ms = _project(spark, [(90.0, 0.0), (60.0, -105.0)],
                  lambda a, b: G.polar_stereo_xy(a, b, 60.0, -105.0))
    assert abs(ms[(90.0, 0.0)][0]) < 1e-6 and abs(ms[(90.0, 0.0)][1]) < 1e-6
    x, y = ms[(60.0, -105.0)]
    assert abs(x) < 1e-6 and y < 0
    # TM: equator → y = 0; central meridian → x = 0, y = R·k0·φ
    mt = _project(spark, [(0.0, -90.0), (30.0, -96.0)],
                  lambda a, b: G.transverse_mercator_xy(a, b, lon0=-96.0, k0=1.0))
    assert abs(mt[(0.0, -90.0)][1]) < 1e-6
    assert abs(mt[(30.0, -96.0)][0]) < 1e-6
    assert abs(mt[(30.0, -96.0)][1] - G.GRIB_SPHERE_R * math.radians(30)) < 1e-3


def test_webmercator_roundtrip(spark):
    pts = [(la, lo) for la in (-80.0, 0.0, 45.5, 80.0) for lo in (-179.0, 0.0, 120.25)]
    _roundtrip(spark, pts, G.webmercator_xy, G.webmercator_inverse, tol=1e-7)
