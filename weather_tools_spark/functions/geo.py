"""Geospatial scalar functions.

Re-expresses the reference's geo column synthesis (GeoJSON point/polygon
per grid cell: weather_mv/loader_pipeline/bq.py:483-563) and its
city/country → bounding-box predicate rewrite
(xql/src/xql/where.py:140-171, tables xql/src/xql/constant.py:16-34)
as Spark Column expressions.

Design: ``geo_point``/``geo_polygon`` are pure functions of
(lat, lon, resolution). The reference computes them driver-side into a
lat×lon lookup parquet and broadcast-joins it per row block
(bq.py:197-238, 344-351). We keep the same *plan shape* — build the
lookup once with Spark expressions, then ``join(broadcast(geo_df),
['latitude','longitude'])`` — because at 100 TB the lookup (one row per
grid cell, ~1M rows for 0.25°) is still tiny next to the fact table.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bounding boxes as (lat_min, lat_max, lon_min, lon_max).
# Same lookup *shape* as the reference's city/country tables
# (xql/src/xql/constant.py:16-34); values are public-knowledge bboxes.
CITY_BBOXES: dict[str, tuple[float, float, float, float]] = {
    "new york": (40.47, 40.92, -74.26, -73.69),
    "london": (51.26, 51.70, -0.51, 0.33),
    "tokyo": (35.52, 35.90, 139.33, 139.92),
    "mumbai": (18.89, 19.28, 72.77, 73.03),
    "sydney": (-34.12, -33.57, 150.52, 151.34),
}

COUNTRY_BBOXES: dict[str, tuple[float, float, float, float]] = {
    "india": (6.55, 35.67, 68.11, 97.40),
    "usa": (24.52, 49.38, -124.77, -66.95),
    "brazil": (-33.75, 5.27, -73.99, -34.79),
    "australia": (-43.64, -10.67, 113.16, 153.61),
    "japan": (24.25, 45.52, 122.93, 145.82),
}


def sanitize_longitude(lon: Column) -> Column:
    """Normalize any longitude into [-180, 180).

    Same arithmetic as the reference (bq.py:219):
    ``(((lon % 360) + 540) % 360) - 180``. Spark's ``%`` is C-style
    (sign of dividend), hence the double-mod to force a positive result.
    """
    return (((lon % 360) + 540) % 360) - 180


def wrap_longitude_0_360(lon: Column) -> Column:
    """Wrap longitude into [0, 360) — the reference applies this when a
    dataset's grid uses 0–360 convention (where.py:152-153)."""
    return ((lon % 360) + 360) % 360


def geo_point(lat: Column, lon: Column) -> Column:
    """GeoJSON Point string for a grid point (bq.py:483-490 semantics:
    lon sanitized into [-180,180), lat must be in [-90,90]).

    Built entirely from JVM-side expressions (to_json over a struct) —
    no Python in the loop.
    """
    slon = sanitize_longitude(lon)
    return F.to_json(
        F.struct(
            F.lit("Point").alias("type"),
            F.array(slon.cast("double"), lat.cast("double")).alias("coordinates"),
        )
    )


def geo_polygon(lat: Column, lon: Column, lat_res: Column | float, lon_res: Column | float) -> Column:
    """GeoJSON Polygon string for the grid cell centered at (lat, lon).

    Corner offsets are half the grid resolution per axis (bq.py:493-563
    semantics): latitude clamped to the poles, longitude wrapped across
    the antimeridian. Ring is closed (first point repeated) and wound
    counter-clockwise from the SW corner.
    """
    lat_h = (F.lit(lat_res) if not isinstance(lat_res, Column) else lat_res) / 2.0
    lon_h = (F.lit(lon_res) if not isinstance(lon_res, Column) else lon_res) / 2.0
    lat_lo = F.greatest(lat - lat_h, F.lit(-90.0))
    lat_hi = F.least(lat + lat_h, F.lit(90.0))
    lon_lo = sanitize_longitude(lon - lon_h)
    lon_hi = sanitize_longitude(lon + lon_h)

    def pt(x: Column, y: Column) -> Column:
        return F.array(x.cast("double"), y.cast("double"))

    ring = F.array(
        pt(lon_lo, lat_lo), pt(lon_hi, lat_lo), pt(lon_hi, lat_hi), pt(lon_lo, lat_hi), pt(lon_lo, lat_lo)
    )
    return F.to_json(
        F.struct(F.lit("Polygon").alias("type"), F.array(ring).alias("coordinates"))
    )


def bbox_predicate(lat: Column, lon: Column, bbox: tuple[float, float, float, float]) -> Column:
    """Conjunctive bbox filter from (lat_min, lat_max, lon_min, lon_max) —
    the target form of the reference's area filter (bq.py:332-335)."""
    lat_min, lat_max, lon_min, lon_max = bbox
    return (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)


def geo_entity_bbox(kind: str, name: str) -> tuple[float, float, float, float]:
    """Resolve ``city='new york'`` / ``country='india'`` to a bbox — the
    rewrite the reference applies inside WHERE handling (where.py:140-171).
    Raises KeyError for unknown entities (mirrors reference behavior of
    failing the predicate)."""
    table = CITY_BBOXES if kind == "city" else COUNTRY_BBOXES
    return table[name.strip().lower()]


def area_polygon(north: float, west: float, south: float, east: float) -> str:
    """GeoJSON polygon for an [N, W, S, E] area box (weather_dl
    util.py:148-176 semantics; presets 'E'/'G' resolve to the global
    box before calling). Closed ring, counter-clockwise from NW."""
    import json

    ring = [
        [west, north],
        [west, south],
        [east, south],
        [east, north],
        [west, north],
    ]
    return json.dumps({"type": "Polygon", "coordinates": [ring]})


AREA_PRESETS: dict[str, tuple[float, float, float, float]] = {
    # 'G'lobal and 'E'urope shorthand areas accepted by download configs
    "G": (90.0, -180.0, -90.0, 180.0),
    "E": (73.5, -27.0, 33.0, 45.0),
}


def ee_safe_name(col: Column) -> Column:
    """Asset-safe name: any run of characters outside [A-Za-z0-9-_]
    becomes a single underscore (ee.py:255-263 semantics)."""
    return F.regexp_replace(col, r"[^a-zA-Z0-9-_]+", "_")


_WGS84_R = 6378137.0


def webmercator_xy(lat: Column, lon: Column) -> tuple[Column, Column]:
    """EPSG:4326 → EPSG:3857 (Web-Mercator) as pure column expressions —
    the closed-form spherical transform (x = R·λ, y = R·ln tan(π/4+φ/2)),
    covering the reference's most common CRS-reproject case
    (sinks.py:149-227 reprojects TIFs to EPSG:4326 with pyproj; pyproj
    is absent here, but this pair needs no library). JVM-side trig,
    whole-stage codegen."""
    x = lon * F.lit(_WGS84_R) * F.lit(math.pi) / 180
    y = F.lit(_WGS84_R) * F.log(F.tan(F.lit(math.pi / 4) + lat * F.lit(math.pi) / 360))
    return x, y


def webmercator_inverse(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:3857 → EPSG:4326 inverse (φ = 2·atan(e^(y/R)) − π/2)."""
    lat = (2 * F.atan(F.exp(y / F.lit(_WGS84_R))) - F.lit(math.pi / 2)) * 180 / F.lit(math.pi)
    lon = x / F.lit(_WGS84_R) * 180 / F.lit(math.pi)
    return lat, lon


# GRIB shape-of-earth code 6: spherical earth, radius 6 371 229 m — the
# sphere operational NWP grids (Lambert/polar-stereo GRIB templates
# 3.30/3.20) are defined on.
GRIB_SPHERE_R = 6371229.0

_D2R = math.pi / 180.0


def lambert_conformal_params(
    lat1: float, lat2: float, lat0: float, lon0: float, radius: float = GRIB_SPHERE_R
) -> dict:
    """Derived constants for the spherical Lambert conformal conic
    (secant form; tangent when lat1 == lat2) — the projection of GRIB
    grid template 3.30 (NAM/HRRR-style grids). The reference reprojects
    through pyproj (weather_mv loader_pipeline/sinks.py:149-227); this
    closed spherical form needs no library. Constants are computed once
    driver-side; the per-row transform stays a JVM column expression.

      n  = ln(cos φ1/cos φ2) / ln(tan(π/4+φ2/2)/tan(π/4+φ1/2))
      F  = cos φ1 · tanⁿ(π/4+φ1/2) / n
      ρ0 = R·F / tanⁿ(π/4+φ0/2)
    """
    p1, p2, p0 = lat1 * _D2R, lat2 * _D2R, lat0 * _D2R
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(p1)
    else:
        n = math.log(math.cos(p1) / math.cos(p2)) / math.log(
            math.tan(math.pi / 4 + p2 / 2) / math.tan(math.pi / 4 + p1 / 2)
        )
    big_f = math.cos(p1) * math.tan(math.pi / 4 + p1 / 2) ** n / n
    rho0 = radius * big_f / math.tan(math.pi / 4 + p0 / 2) ** n
    return {"n": n, "F": big_f, "rho0": rho0, "lon0": lon0, "R": radius}


def lambert_conformal_xy(lat: Column, lon: Column, p: dict) -> tuple[Column, Column]:
    """Spherical LCC forward: ρ = R·F/tanⁿ(π/4+φ/2), θ = n(λ−λ0);
    x = ρ sin θ, y = ρ0 − ρ cos θ. Pure JVM trig, whole-stage codegen."""
    rho = F.lit(p["R"] * p["F"]) / F.pow(
        F.tan(F.lit(math.pi / 4) + lat * F.lit(_D2R / 2)), F.lit(p["n"])
    )
    theta = (lon - F.lit(p["lon0"])) * F.lit(p["n"] * _D2R)
    return rho * F.sin(theta), F.lit(p["rho0"]) - rho * F.cos(theta)


def lambert_conformal_inverse(x: Column, y: Column, p: dict) -> tuple[Column, Column]:
    """Spherical LCC inverse: ρ = sign(n)·√(x²+(ρ0−y)²), θ = atan2(x, ρ0−y);
    φ = 2·atan((R·F/ρ)^(1/n)) − π/2, λ = λ0 + θ/n."""
    sgn = 1.0 if p["n"] >= 0 else -1.0
    rho = F.lit(sgn) * F.sqrt(x * x + (F.lit(p["rho0"]) - y) * (F.lit(p["rho0"]) - y))
    theta = F.atan2(F.lit(sgn) * x, F.lit(sgn) * (F.lit(p["rho0"]) - y))
    lat = (
        2 * F.atan(F.pow(F.lit(p["R"] * p["F"]) / rho, F.lit(1.0 / p["n"])))
        - F.lit(math.pi / 2)
    ) / F.lit(_D2R)
    lon = sanitize_longitude(F.lit(p["lon0"]) + theta / F.lit(p["n"] * _D2R))
    return lat, lon


def lambert_conformal_xy_np(lat, lon, p: dict):
    """Numpy twin of :func:`lambert_conformal_xy` for executor-side
    codec kernels (GRIB grid template 3.30 decode); same constants
    dict from :func:`lambert_conformal_params`."""
    import numpy as np

    rho = p["R"] * p["F"] / np.tan(np.pi / 4 + np.asarray(lat) * _D2R / 2) ** p["n"]
    th = (np.asarray(lon) - p["lon0"]) * p["n"] * _D2R
    return rho * np.sin(th), p["rho0"] - rho * np.cos(th)


def lambert_conformal_inverse_np(x, y, p: dict):
    """Numpy twin of :func:`lambert_conformal_inverse`; longitude
    normalized into [-180, 180)."""
    import numpy as np

    sgn = 1.0 if p["n"] >= 0 else -1.0
    dy = p["rho0"] - np.asarray(y)
    rho = sgn * np.hypot(np.asarray(x), dy)
    th = np.arctan2(sgn * np.asarray(x), sgn * dy)
    lat = (2 * np.arctan((p["R"] * p["F"] / rho) ** (1.0 / p["n"])) - np.pi / 2) / _D2R
    lon = p["lon0"] + th / (p["n"] * _D2R)
    return lat, (((lon % 360) + 540) % 360) - 180


def polar_stereo_xy(
    lat: Column, lon: Column, lat_ts: float = 60.0, lon0: float = 0.0,
    radius: float = GRIB_SPHERE_R,
) -> tuple[Column, Column]:
    """Spherical north-polar stereographic, true at φ_ts (GRIB grid
    template 3.20; operational grids use φ_ts = 60°N):
    ρ = 2·R·k0·tan(π/4−φ/2) with k0 = (1+sin φ_ts)/2;
    x = ρ sin(λ−λ0), y = −ρ cos(λ−λ0) (y axis along λ0 toward the pole)."""
    k0 = (1.0 + math.sin(lat_ts * _D2R)) / 2.0
    rho = F.lit(2.0 * radius * k0) * F.tan(F.lit(math.pi / 4) - lat * F.lit(_D2R / 2))
    lam = (lon - F.lit(lon0)) * F.lit(_D2R)
    return rho * F.sin(lam), -rho * F.cos(lam)


def polar_stereo_inverse(
    x: Column, y: Column, lat_ts: float = 60.0, lon0: float = 0.0,
    radius: float = GRIB_SPHERE_R,
) -> tuple[Column, Column]:
    """Inverse polar stereographic: φ = π/2 − 2·atan(ρ/(2·R·k0)),
    λ = λ0 + atan2(x, −y)."""
    k0 = (1.0 + math.sin(lat_ts * _D2R)) / 2.0
    rho = F.sqrt(x * x + y * y)
    lat = (F.lit(math.pi / 2) - 2 * F.atan(rho / F.lit(2.0 * radius * k0))) / F.lit(_D2R)
    lon = sanitize_longitude(F.lit(lon0) + F.atan2(x, -y) / F.lit(_D2R))
    return lat, lon


def transverse_mercator_xy(
    lat: Column, lon: Column, lon0: float, k0: float = 0.9996,
    radius: float = GRIB_SPHERE_R,
) -> tuple[Column, Column]:
    """Spherical transverse Mercator (UTM-style, central meridian λ0,
    scale k0): B = cos φ·sin(λ−λ0); x = (R·k0/2)·ln((1+B)/(1−B));
    y = R·k0·atan(tan φ / cos(λ−λ0))."""
    phi = lat * F.lit(_D2R)
    lam = (lon - F.lit(lon0)) * F.lit(_D2R)
    b = F.cos(phi) * F.sin(lam)
    x = F.lit(radius * k0 / 2) * F.log((1 + b) / (1 - b))
    y = F.lit(radius * k0) * F.atan2(F.tan(phi), F.cos(lam))
    return x, y


def transverse_mercator_inverse(
    x: Column, y: Column, lon0: float, k0: float = 0.9996,
    radius: float = GRIB_SPHERE_R,
) -> tuple[Column, Column]:
    """Inverse spherical TM: D = y/(R·k0); φ = asin(sin D / cosh(x/(R·k0)));
    λ = λ0 + atan2(sinh(x/(R·k0)), cos D)."""
    xn = x / F.lit(radius * k0)
    d = y / F.lit(radius * k0)
    lat = F.asin(F.sin(d) / F.cosh(xn)) / F.lit(_D2R)
    lon = sanitize_longitude(F.lit(lon0) + F.atan2(F.sinh(xn), F.cos(d)) / F.lit(_D2R))
    return lat, lon


def ee_compatible_attrs(attrs: dict) -> dict:
    """Asset-metadata normalization for EE-style property constraints
    (util.py:53-79 semantics): property names keep their first 110
    characters and have disallowed character runs collapsed to ``_``;
    numeric values pass through, everything else is stringified and
    clipped to 1024 bytes (1021 chars + ``...``). Driver-side metadata
    path — runs on dicts, not rows."""
    import re as _re

    out: dict = {}
    for name, value in attrs.items():
        name = _re.sub(r"[^a-zA-Z0-9-_]+", "_", name[:110])
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            value = str(value)
            if len(value) > 1024:
                value = value[:1021] + "..."
        out[name] = value
    return out


def infer_grid_resolution(values: list[float]) -> float | None:
    """Per-axis grid half-step from the coordinate values —
    ``ptp(coord) / len(coord) / 2`` doubled back to the full step
    (bq.py:248-264 semantics). Returns None for a single-point axis —
    the reference disables polygon generation in that case
    (bq.py:262-264)."""
    if len(values) < 2:
        return None
    return (max(values) - min(values)) / (len(values) - 1)


def build_geo_lookup(
    spark_df_grid: DataFrame, lat_res: float | None, lon_res: float | None
) -> DataFrame:
    """Given a DataFrame of distinct (latitude, longitude) grid points,
    produce the geo lookup table (latitude, longitude, geo_point,
    geo_polygon) — the Spark-native form of the reference's geo parquet
    (bq.py:197-238). Intended to be broadcast-joined onto extracted rows.

    A ``None`` resolution on either axis (single-point grid) disables
    polygon generation — geo_polygon comes back NULL, matching the
    reference (bq.py:262-264).
    """
    lat, lon = F.col("latitude"), F.col("longitude")
    polygon = (
        geo_polygon(lat, lon, lat_res, lon_res)
        if lat_res is not None and lon_res is not None
        else F.lit(None).cast("string")
    )
    return spark_df_grid.select(
        "latitude",
        "longitude",
        geo_point(lat, lon).alias("geo_point"),
        polygon.alias("geo_polygon"),
    )
