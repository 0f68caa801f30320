"""Adversarial GRIB2 codec fuzzing (VERDICT r9 task 4): the
optional-library conformance channel (tests/test_conformance_optional)
cannot execute in this container, so randomized field-statistics
round-trips substitute for cross-library checks on the hard profiles:

- complex packing with 1st/2nd-order spatial differencing (templates
  5.2/5.3) — the NCEP operational profile (reference
  weather_sp/splitter_pipeline/file_splitters.py routes these through
  ecCodes; here the from-scratch codec must reconstruct the scaled
  integers EXACTLY);
- JPEG 2000 packing (template 5.40, reference
  weather_mv/loader_pipeline/sinks.py:370-389's cfgrib path);
- bitmap (section 6) x reduced-Gaussian (grid 3.40 ragged) x packing
  combinations.

Each suite runs hundreds of deterministic-seed cases over field shapes
chosen to stress the encoder's statistics-dependent paths: constant
fields (zero-width groups), smooth gradients (spatial differencing
wins, group splitting), heavy noise (wide offsets), mixed-scale fields
(tiny values on a huge base), and NaN-holed fields (bitmap packing).
Pure-Python layers only — no Spark session."""

from __future__ import annotations

import numpy as np
import pytest

from weather_tools_spark.sources import grib2 as G2

# ---------------------------------------------------------------- field zoo


def _random_field(rng: np.random.Generator, nj: int, ni: int) -> np.ndarray:
    """One random field with randomized STATISTICS, not just random
    values: kind × base magnitude × dynamic range are all drawn, so the
    packer sees constant runs, smooth rows, spiky outliers, negatives,
    and huge offsets across the suite."""
    kind = rng.choice(["constant", "smooth", "noise", "mixed", "spike"])
    base = float(rng.choice([0.0, 1.0, -273.15, 1e4, -1e6, 101325.0]))
    if kind == "constant":
        return np.full((nj, ni), base)
    if kind == "smooth":
        # separable gradient + gentle sinusoid: adjacent deltas are tiny,
        # the regime where 2nd-order differencing packs near zero bits
        j = np.arange(nj)[:, None]
        i = np.arange(ni)[None, :]
        amp = float(rng.uniform(0.1, 50.0))
        return base + amp * (j * 0.5 + i * 0.25 + np.sin(i / 3.0) * 2.0)
    if kind == "noise":
        scale = float(10.0 ** rng.uniform(-2, 5))
        return base + rng.standard_normal((nj, ni)) * scale
    if kind == "mixed":
        # smooth field with a noisy stripe: group splitting must handle
        # a width change mid-field
        f = base + np.arange(nj * ni, dtype="f8").reshape(nj, ni)
        f[nj // 2] += rng.standard_normal(ni) * 1e3
        return f
    # spike: near-constant with isolated extreme outliers (forces a wide
    # group or a split around the spike)
    f = np.full((nj, ni), base)
    n_spikes = int(rng.integers(1, max(2, nj * ni // 8)))
    idx = rng.choice(nj * ni, size=n_spikes, replace=False)
    f.ravel()[idx] = base + rng.choice([-1, 1], n_spikes) * 10.0 ** rng.uniform(2, 6)
    return f


def _clamp_span(vals: np.ndarray, dscale: int, bits: int) -> np.ndarray:
    """Rescale so the scaled-integer span fits in ``bits`` (the packers'
    documented envelopes); keeps the field SHAPE (statistics) intact."""
    span = (np.nanmax(vals) - np.nanmin(vals)) * 10.0**dscale
    if span >= 2.0**bits:
        vals = vals / (span / 2.0 ** (bits - 1))
    return vals


def _roundtrip(tmp_path, vals, dscale, packing, grid=None):
    msg = {"param": "d2m", "ref_time": "2024-03-01T06:00", "values": vals}
    if grid is not None:
        msg["grid"] = grid
    else:
        msg["lats"] = np.linspace(80, 70, vals.shape[0])
        msg["lons"] = np.linspace(0, 10, vals.shape[1])
    p = str(tmp_path / f"f_{packing}.grib2")
    G2.write_grib2(p, [msg], decimal_scale=dscale, packing=packing)
    (m,) = G2.read_grib2(p)
    return m


# ------------------------------------------------- complex / differencing


@pytest.mark.parametrize("packing", ["complex", "complex_diff1", "complex_diff2"])
def test_fuzz_complex_packing_field_statistics(tmp_path, packing):
    """150 random-statistics fields per differencing order. 5.3 paths
    (diff1/diff2) must reconstruct round(v·10^D)/10^D EXACTLY (integer
    reference, exact int64 descriptors); 5.2 is bounded by the float32
    reference quantum like simple packing."""
    rng = np.random.default_rng(11000 + hash(packing) % 1000)
    for case in range(150):
        # differencing of order k needs > k points (labeled writer gate,
        # asserted in the bitmap suite) — keep nj*ni >= 4 here
        nj = int(rng.integers(2, 24))
        ni = int(rng.integers(2, 24))
        dscale = int(rng.integers(0, 4))
        vals = _clamp_span(_random_field(rng, nj, ni), dscale, 30)
        m = _roundtrip(tmp_path, vals, dscale, packing)
        want = np.round(vals * 10.0**dscale) / 10.0**dscale
        if packing == "complex":
            err = np.abs(m["values"] - vals).max()
            assert err <= 0.5 * 10.0 ** (-dscale) + 1e-9, (case, err)
        else:
            assert np.array_equal(m["values"], want), (
                case, nj, ni, dscale, np.abs(m["values"] - want).max(),
            )


@pytest.mark.parametrize("packing", ["complex", "complex_diff1", "complex_diff2"])
def test_fuzz_complex_packing_with_bitmap(tmp_path, packing):
    """100 cases with a random NaN fraction (0–60%): the section-6
    bitmap must carry hole positions exactly and the packed non-missing
    values keep the packing's accuracy contract. All-missing and
    single-point-present edge fields included deterministically."""
    rng = np.random.default_rng(23000 + hash(packing) % 1000)
    for case in range(100):
        nj = int(rng.integers(2, 16))
        ni = int(rng.integers(2, 16))
        dscale = 2
        vals = _clamp_span(_random_field(rng, nj, ni), dscale, 28)
        frac = float(rng.uniform(0.0, 0.6))
        holes = rng.random((nj, ni)) < frac
        if case == 0:
            # all-missing is a labeled writer gate, not a silent wrong
            # encode (no finite reference value exists)
            all_nan = np.full((nj, ni), np.nan)
            with pytest.raises(ValueError, match="no finite values"):
                _roundtrip(tmp_path, all_nan, dscale, packing)
            # one present point: packs for order-0, labeled gate for
            # spatial differencing (needs > order present points)
            one = np.full((nj, ni), np.nan)
            one[0, 0] = vals[0, 0]
            if packing == "complex":
                m1 = _roundtrip(tmp_path, one, dscale, packing)
                assert np.isnan(m1["values"]).sum() == nj * ni - 1
            else:
                with pytest.raises(ValueError, match="too small for spatial"):
                    _roundtrip(tmp_path, one, dscale, packing)
        # keep >= 3 present points so every packing order encodes
        while holes.sum() > nj * ni - 3:
            holes[tuple(rng.integers(0, [nj, ni]))] = False
        v = vals.copy()
        v[holes] = np.nan
        m = _roundtrip(tmp_path, v, dscale, packing)
        got = m["values"]
        assert np.array_equal(np.isnan(got), holes), (case, packing)
        if (~holes).any():
            err = np.abs(got[~holes] - vals[~holes]).max()
            assert err <= 0.5 * 10.0 ** (-dscale) + 1e-9, (case, err)


# ----------------------------------------------------------- JPEG 2000


def test_fuzz_jpeg2000_packing_field_statistics(tmp_path):
    """120 random-statistics fields through template 5.40 (the
    from-scratch 5-3 DWT + MQ-coder EBCOT codestream): lossless on the
    scaled offsets, so decode error is bounded by the float32 reference
    quantum; constant fields (depth 1) and wide-offset fields (20+ bit
    planes) both included."""
    rng = np.random.default_rng(31337)
    for case in range(120):
        nj = int(rng.integers(1, 20))
        ni = int(rng.integers(1, 20))
        dscale = int(rng.integers(0, 3))
        vals = _clamp_span(_random_field(rng, nj, ni), dscale, 24)
        m = _roundtrip(tmp_path, vals, dscale, packing="jpeg2000")
        # float32 reference value: same bound as simple packing plus the
        # reference's own relative quantum at large magnitudes
        ref_mag = abs(float(np.nanmin(np.round(vals * 10.0**dscale))))
        f32_ulp = np.spacing(np.float32(max(1.0, ref_mag))) / 10.0**dscale
        err = np.abs(m["values"] - vals).max()
        assert err <= 0.5 * 10.0 ** (-dscale) + f32_ulp + 1e-9, (case, err)


def test_fuzz_jpeg2000_matches_simple_packing_bitwise(tmp_path):
    """60 paired writes: JPEG 2000 packing and simple packing of the
    same field must decode to IDENTICAL floats (both are lossless on
    the scaled offsets from the same quantized reference) — a
    cross-template differential oracle, no external library needed."""
    rng = np.random.default_rng(777)
    for case in range(60):
        nj = int(rng.integers(1, 16))
        ni = int(rng.integers(1, 16))
        dscale = int(rng.integers(0, 3))
        vals = _clamp_span(_random_field(rng, nj, ni), dscale, 22)
        m_j2k = _roundtrip(tmp_path, vals, dscale, packing="jpeg2000")
        m_simple = _roundtrip(tmp_path, vals, dscale, packing="simple")
        assert np.array_equal(m_j2k["values"], m_simple["values"]), case


# ------------------------------------------- bitmap x reduced Gaussian


def test_fuzz_reduced_gaussian_with_bitmap(tmp_path):
    """80 cases over grid 3.40 reduced (ragged-row) Gaussian grids with
    random per-row point counts and random NaN holes, across the three
    bitmap-capable packings: the flat point array, the per-point
    coordinate expansion, and the hole mask must all survive."""
    rng = np.random.default_rng(424242)
    packings = ["simple", "complex", "complex_diff1", "complex_diff2"]
    for case in range(80):
        n_gauss = int(rng.integers(2, 24))  # N: lines pole-to-equator
        full = G2.gaussian_latitudes(n_gauss)
        nrows = int(rng.integers(1, len(full) + 1))
        i0 = int(rng.integers(0, len(full) - nrows + 1))
        sub = full[i0 : i0 + nrows]
        counts = [int(rng.integers(1, 12)) for _ in range(nrows)]
        npts = sum(counts)
        dscale = 2
        vals = _clamp_span(_random_field(rng, 1, npts).ravel(), dscale, 28)
        holes = rng.random(npts) < float(rng.uniform(0.0, 0.5))
        while holes.sum() > npts - 3 and npts >= 3:  # >= 3 present: all orders
            holes[int(rng.integers(0, npts))] = False
        if npts < 3:
            holes[:] = False
        v = vals.copy()
        v[holes] = np.nan
        packing = packings[case % len(packings)]
        grid = {
            "type": "gaussian_reduced",
            "n": n_gauss,
            "lat1": float(sub[0]),
            "lat2": float(sub[-1]),
            "counts": counts,
        }
        m = _roundtrip(tmp_path, v, dscale, packing, grid=grid)
        got = m["values"]
        assert got.shape == (npts,), case
        assert np.array_equal(np.isnan(got), holes), (case, packing)
        err = np.abs(got[~holes] - vals[~holes]).max()
        assert err <= 0.5 * 10.0 ** (-dscale) + 1e-9, (case, packing, err)
        # per-point coordinates: each ragged row's latitude repeated
        # counts[j] times, longitudes spanning the circle at 360/count
        assert np.array_equal(m["lat_grid"], np.repeat(sub, counts)), case
        row0 = counts[0]
        np.testing.assert_allclose(
            m["lon_grid"][:row0], np.arange(row0) * (360.0 / row0), atol=1e-9
        )
