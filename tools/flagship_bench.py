#!/usr/bin/env python3
"""Flagship benchmark at the BASELINE's data scale.

BASELINE.md row 1 (the reference's only published number): the xql
headline query — ``SELECT AVG('temperature') ... GROUP BY time_date``
over ONE MONTH of ERA5 0.25° hourly data, New-York bbox — took
**1 m 55 s** on a Dask cluster reading the GCS Zarr store
(xql/README.md example output).

This script reproduces that query AT THE SAME DATA SCALE against this
engine: a real Zarr v2 store with the full ERA5 grid (720 hourly steps
× 721 lats × 1440 lons = 747.5M float64 cells ≈ 6 GB raw), written
once under .scaledata/, then queried through the production path
(opener.open_dataset → chunk-manifest scan → xql SQL rewrite).

Two timed variants:
- pruned: lat/lon ranges passed to open_dataset, so the chunk manifest
  prunes to the bbox chunks before any byte is read (the plan a real
  deployment runs);
- full-scan: no ranges at open; every chunk is read+decoded and the
  bbox filter applies post-scan — the conservative apples-to-apples
  number against a reader that cannot prune.

Honest-comparison notes, also printed with the result: the reference
read from GCS over the network on a Dask CLUSTER; this runs on
local[32] reading local disk. Same query, same data volume, same
storage format, single node. Correctness is asserted against the
closed-form expectation (cell values are a linear function of grid
indices, so each daily bbox average is exact arithmetic).

Usage:  python tools/flagship_bench.py          # ~1 min build + query
Output: one JSON line; FLAGSHIP.md with the result table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = os.path.join(REPO, ".scaledata", "era5_month.zarr")

N_T, N_LA, N_LO = 720, 721, 1440  # 30 days hourly, ERA5 0.25° grid
C_T, C_LA, C_LO = 24, 145, 288  # 750 chunks of ~8 MB f8
VAR = "temperature"
# value = closed form of GLOBAL grid indices (t, y, x)
A_T, A_Y, A_X, BASE = 0.01, 0.02, 0.005, 250.0
# New-York bbox on the 0..360-lon grid
LAT_RANGE = (40.25, 41.0)  # lat index y = (90 - lat) / 0.25 → 196..199
LON_RANGE = (285.75, 286.5)  # lon index x = lon / 0.25      → 1143..1146


def build_store(spark) -> dict:
    """Parallel chunk writer: each task synthesizes its chunk ndarray
    from the closed form and writes a spec-conformant v2 zlib chunk —
    no 747M-row shuffle needed to BUILD the fixture (the read path is
    what this benchmark measures)."""
    import pandas as pd

    from weather_tools_spark.sources.zarr_v2 import (
        ZMETADATA,
        _compress,
        _put_bytes,
        _write_array,
        _zarray,
    )

    t0 = time.perf_counter()
    times = (np.datetime64("2024-01-01", "s") + np.arange(N_T) * 3600).astype("<i8")
    lats = 90.0 - 0.25 * np.arange(N_LA)
    lons = 0.25 * np.arange(N_LO)
    consolidated: dict = {".zgroup": {"zarr_format": 2}, ".zattrs": {}}
    _put_bytes(os.path.join(STORE, ".zgroup"), json.dumps({"zarr_format": 2}).encode())
    comp = {"id": "zlib", "level": 1}
    consolidated.update(_write_array(STORE, "time", times, ("time",), comp))
    consolidated.update(_write_array(STORE, "latitude", lats.astype("<f8"), ("latitude",), comp))
    consolidated.update(_write_array(STORE, "longitude", lons.astype("<f8"), ("longitude",), comp))
    zarray = _zarray((N_T, N_LA, N_LO), (C_T, C_LA, C_LO), "<f8", comp, "NaN")
    zattrs = {"_ARRAY_DIMENSIONS": ["time", "latitude", "longitude"]}
    _put_bytes(os.path.join(STORE, VAR, ".zarray"), json.dumps(zarray).encode())
    _put_bytes(os.path.join(STORE, VAR, ".zattrs"), json.dumps(zattrs).encode())
    consolidated[f"{VAR}/.zarray"] = zarray
    consolidated[f"{VAR}/.zattrs"] = zattrs
    _put_bytes(
        os.path.join(STORE, ZMETADATA),
        json.dumps({"zarr_consolidated_format": 1, "metadata": consolidated}).encode(),
    )

    nt, nla, nlo = (
        math.ceil(N_T / C_T),
        math.ceil(N_LA / C_LA),
        math.ceil(N_LO / C_LO),
    )
    keys = [(t, y, x) for t in range(nt) for y in range(nla) for x in range(nlo)]
    kdf = spark.createDataFrame(keys, "ti int, yi int, xi int").repartition(
        spark.sparkContext.defaultParallelism
    )
    store, var = STORE, VAR

    def gen(batches):
        for b in batches:
            out = []
            for r in b.itertuples(index=False):
                t0g, y0g, x0g = r.ti * C_T, r.yi * C_LA, r.xi * C_LO
                tt = np.arange(t0g, t0g + C_T)[:, None, None]
                yy = np.arange(y0g, y0g + C_LA)[None, :, None]
                xx = np.arange(x0g, x0g + C_LO)[None, None, :]
                arr = (BASE + A_T * tt + A_Y * yy + A_X * xx).astype("<f8")
                # NaN-pad beyond the real grid (edge chunks)
                arr[:, (np.arange(y0g, y0g + C_LA) >= N_LA), :] = np.nan
                arr[:, :, (np.arange(x0g, x0g + C_LO) >= N_LO)] = np.nan
                data = _compress(arr.tobytes(), comp, 8)
                _put_bytes(os.path.join(store, var, f"{r.ti}.{r.yi}.{r.xi}"), data)
                out.append(len(data))
            yield pd.DataFrame({"nbytes": out})

    total = (
        kdf.mapInPandas(gen, "nbytes long")
        .agg({"nbytes": "sum"})
        .collect()[0][0]
    )
    return {
        "build_sec": round(time.perf_counter() - t0, 2),
        "n_chunks": len(keys),
        "store_bytes": int(total),
    }


def expected_daily_means() -> dict:
    """Closed form: mean over a day's bbox cells = f(mean indices)."""
    y_mean = (196 + 199) / 2.0
    x_mean = (1143 + 1146) / 2.0
    out = {}
    for d in range(30):
        t_mean = 24 * d + 11.5
        out[f"2024-01-{d + 1:02d}"] = round(
            BASE + A_T * t_mean + A_Y * y_mean + A_X * x_mean, 6
        )
    return out


def run_query(spark, pruned: bool) -> tuple[float, dict]:
    from weather_tools_spark.plans import xql as XQL
    from weather_tools_spark.sources import opener as OP

    t0 = time.perf_counter()
    kwargs = (
        {"lat_range": LAT_RANGE, "lon_range": LON_RANGE} if pruned else {}
    )
    df = OP.open_dataset(spark, STORE, view="era5_month", **kwargs)
    res = XQL.run_query(
        spark,
        f"SELECT time_date, AVG('{VAR}') FROM era5_month GROUP BY time_date",
        time_col="time",
    )
    if not pruned:
        # bbox as an ordinary post-scan filter — rebuild through SQL so
        # the filter sits under the aggregate
        df.createOrReplaceTempView("era5_month")
        res = spark.sql(
            f"""
            SELECT date_format(time, 'yyyy-MM-dd') AS time_date,
                   avg({VAR}) AS avg_{VAR}
            FROM era5_month
            WHERE latitude BETWEEN {LAT_RANGE[0]} AND {LAT_RANGE[1]}
              AND longitude BETWEEN {LON_RANGE[0]} AND {LON_RANGE[1]}
            GROUP BY 1 ORDER BY 1
            """
        )
    rows = {r[0]: round(float(r[1]), 6) for r in res.collect()}
    return round(time.perf_counter() - t0, 2), rows


def main() -> None:
    from weather_tools_spark.session import get_spark

    spark = get_spark("flagship_bench")
    built = None
    if not os.path.exists(os.path.join(STORE, ".zmetadata")):
        built = build_store(spark)
    want = expected_daily_means()

    # min-of-2 per variant (same methodology as bench.py): the first
    # execution pays plan compile + page-cache warmup
    pruned_sec, got_p = run_query(spark, pruned=True)
    p2, _ = run_query(spark, pruned=True)
    pruned_sec = min(pruned_sec, p2)
    full_sec, got_f = run_query(spark, pruned=False)
    f2, _ = run_query(spark, pruned=False)
    full_sec = min(full_sec, f2)
    for name, got in (("pruned", got_p), ("full", got_f)):
        assert set(got) == set(want), (name, sorted(got)[:3], sorted(want)[:3])
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, (name, k, got[k], v)

    result = {
        "metric": "flagship_xql_daily_avg_era5_month",
        "reference_dask_sec": 115,
        "pruned_sec": pruned_sec,
        "full_scan_sec": full_sec,
        "cells": N_T * N_LA * N_LO,
        "grid": f"{N_T}x{N_LA}x{N_LO}",
        "correct": True,
    }
    if built:
        result["build"] = built
    print(json.dumps(result, separators=(",", ":")))

    with open(os.path.join(REPO, "FLAGSHIP.md"), "w") as f:
        f.write(
            f"""# FLAGSHIP — the baseline query at the baseline's data scale

The reference's only published performance number (BASELINE.md):
`SELECT AVG('temperature') ... GROUP BY time_date` over one month of
ERA5 0.25-degree hourly data, New-York bbox — **1 m 55 s** on a Dask
cluster reading the GCS Zarr store (xql/README.md).

Same query, same data volume, this engine (tools/flagship_bench.py):
a real Zarr v2 store with the full ERA5 grid — {N_T} hourly steps x
{N_LA} x {N_LO} = {N_T * N_LA * N_LO:,} float64 cells (~6 GB raw,
zlib chunks, {math.ceil(N_T / C_T) * math.ceil(N_LA / C_LA) * math.ceil(N_LO / C_LO)} chunks of {C_T}x{C_LA}x{C_LO}), queried through the
production path (opener.open_dataset -> chunk-manifest scan -> xql
rewrite). Every daily average asserted equal to the closed-form
expectation.

| variant | seconds | vs reference 115 s |
|---|---|---|
| chunk-PRUNED scan (ranges at open — the deployed plan) | {pruned_sec} | {115 / max(pruned_sec, 1e-9):.0f}x faster |
| FULL scan + post-filter (reads/decodes all ~6 GB) | {full_sec} | {115 / max(full_sec, 1e-9):.0f}x faster |

Honest-comparison notes: the reference read GCS over the network on a
Dask cluster; this is local[32] reading local disk — same query shape,
same data scale, same storage format, one node. The full-scan variant
is the conservative bound (no pruning advantage); the pruned variant
is the plan the engine actually runs (the manifest prunes to the bbox
chunks before any byte is read). Store build: one-off fixture cost
(parallel closed-form chunk writer), excluded from query timings like
the reference's pre-existing GCS store.
"""
        )
    spark.stop()


if __name__ == "__main__":
    main()
