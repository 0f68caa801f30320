"""open_dataset dispatch (sources/opener.py): every stdlib codec opens
through one URI entrypoint and feeds the xql SQL surface — the
reference's xql.open flow (xql/src/xql/open.py:68-98)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from weather_tools_spark.plans import xql
from weather_tools_spark.sources import grib2 as G2
from weather_tools_spark.sources import netcdf3 as N3
from weather_tools_spark.sources import opener as OP
from weather_tools_spark.sources import zarr_scan as ZS
from weather_tools_spark.sources import zarr_v2 as Z2


def test_zarr_dispatch_with_pruning(spark, tmp_path):
    store = str(tmp_path / "s.zarr")
    times = [f"2024-07-01 {h:02d}:00:00" for h in range(4)]
    meta = ZS.ChunkedDatasetMeta(
        uri=store, times=times, lats=[50.0, 49.75], lons=[8.0, 8.25],
        chunk_time=2, chunk_lat=2, chunk_lon=2, variables=("d2m",),
    )
    rows = []
    for ti, t in enumerate(pd.to_datetime(times)):
        for la in meta.lats:
            for lo in meta.lons:
                rows.append((t.to_pydatetime(), la, lo, float(ti)))
    src = spark.createDataFrame(rows, "time timestamp, latitude double, longitude double, d2m double")
    Z2.write_zarr_v2(src, store, meta)

    assert OP.detect(store) == "zarr"
    df = OP.open_dataset(spark, store, time_range=("2024-07-01 02:00:00", "2024-07-01 04:00:00"))
    got = df.collect()
    assert len(got) == 8 and {r.d2m for r in got} == {2.0, 3.0}


def test_netcdf_dispatch_and_header_probe(spark, tmp_path):
    path = str(tmp_path / "g.nc")
    times = np.array([1704067200], dtype=">i4")  # 2024-01-01
    N3.write_netcdf3(
        path,
        {"time": times, "latitude": np.array([10.0]), "longitude": np.array([20.0, 20.5])},
        {"d2m": np.array([[[1.5, 2.5]]]), "u10": np.array([[[3.5, 4.5]]])},
    )
    assert N3.list_variables(path) == ["d2m", "u10"]
    assert OP.detect(path) == "netcdf3"
    got = OP.open_dataset(spark, path).orderBy("longitude").collect()
    assert [r.d2m for r in got] == [1.5, 2.5] and got[0].u10 == 3.5


def test_grib_dispatch_and_param_probe(spark, tmp_path):
    path = str(tmp_path / "g.grib2")
    lats, lons = np.array([49.0, 48.75]), np.array([2.0, 2.25])
    vals = np.array([[1.0, 2.0], [3.0, 4.0]])
    G2.write_grib2(path, [
        {"param": "d2m", "ref_time": "2024-07-02 12:00:00", "lats": lats, "lons": lons, "values": vals},
        {"param": "v10", "ref_time": "2024-07-02 12:00:00", "lats": lats, "lons": lons, "values": vals * 2},
    ])
    assert G2.list_params(path) == ["d2m", "v10"]
    assert OP.detect(path) == "grib2"
    got = OP.open_dataset(spark, path, lat_range=(48.9, 49.1)).collect()
    assert len(got) == 2 and {r.v10 for r in got} == {2.0, 4.0}


def test_geotiff_dispatch(spark, tmp_path):
    from weather_tools_spark.sources import geotiff as GT

    path = str(tmp_path / "r.tif")
    GT.write_geotiff(path, np.array([[1.0, 2.0], [3.0, 4.0]]), (5.0, 51.0), (0.5, 0.5))
    assert OP.detect(path) == "geotiff"
    got = OP.open_dataset(spark, path).orderBy("latitude", "longitude").collect()
    assert [r.value for r in got] == [3.0, 4.0, 1.0, 2.0]


def test_unknown_format_raises(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"\x00NOTAFORMAT\x00" * 4)
    with pytest.raises(ValueError, match="unable to open"):
        OP.detect(str(p))
    # HDF5 magic is no longer unknown — it routes to the stdlib subset
    q = tmp_path / "y.h5"
    q.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 8)
    assert OP.detect(str(q)) == "netcdf4"


def test_xql_over_zarr_store(spark, tmp_path):
    """The reference's flagship flow: open a Zarr store by URI, run an
    xql query (quoted agg + time_date bucket + bbox predicate) over the
    registered view."""
    store = str(tmp_path / "era.zarr")
    times = [f"2024-07-0{d} {h:02d}:00:00" for d in (1, 2) for h in (0, 12)]
    meta = ZS.ChunkedDatasetMeta(
        uri=store, times=times, lats=[50.0, 49.75, 49.5], lons=[8.0, 8.25],
        chunk_time=2, chunk_lat=2, chunk_lon=2, variables=("d2m",),
    )
    rows = []
    for ti, t in enumerate(pd.to_datetime(times)):
        for la in meta.lats:
            for lo in meta.lons:
                rows.append((t.to_pydatetime(), la, lo, float(10 * ti + 1)))
    src = spark.createDataFrame(rows, "time timestamp, latitude double, longitude double, d2m double")
    Z2.write_zarr_v2(src, store, meta)

    OP.open_dataset(spark, store, view="era5", lat_range=(49.6, 50.1))
    out = xql.run_query(
        spark,
        "SELECT time_date, AVG('d2m') FROM era5 GROUP BY time_date ORDER BY time_date",
    ).collect()
    # day 1: ti 0,1 → avg(1, 11) = 6; day 2: ti 2,3 → avg(21, 31) = 26
    assert [(r.time_date, r.avg_d2m) for r in out] == [
        ("2024-07-01", 6.0), ("2024-07-02", 26.0)
    ]


def test_glob_opens_multi_file_collection(spark, tmp_path):
    """A glob URI fans out to one decode task per file — the reference's
    beam.Create(uris) collection ingest through the opener."""
    for d in (1, 2, 3):
        N3.write_netcdf3(
            str(tmp_path / f"era5-0{d}.nc"),
            {"time": np.array([1704067200 + d * 3600], dtype=">i4"),
             "latitude": np.array([10.0]), "longitude": np.array([20.0])},
            {"d2m": np.array([[[float(d)]]])},
        )
    df = OP.open_dataset(spark, str(tmp_path / "era5-*.nc"))
    assert sorted(r.d2m for r in df.collect()) == [1.0, 2.0, 3.0]

    with pytest.raises(ValueError, match="no files match"):
        OP.open_dataset(spark, str(tmp_path / "missing-*.nc"))


def test_earthengine_uri_gates_clearly():
    with pytest.raises(NotImplementedError, match="earthengine-api"):
        OP.detect("ee://ECMWF/ERA5/HOURLY")


@pytest.mark.parametrize("source", ["files", "notifications"])
def test_stream_ingest_files_decodes_new_weather_files(spark, tmp_path, source):
    """The reference's streaming mode (Pub/Sub object-finalize → file
    URIs → decode, weather_mv pipeline.py:62-70): files landing in a
    watched directory are decoded per micro-batch through the
    magic-byte dispatch, exactly once across a checkpointed restart.

    Parametrized over BOTH event sources (VERDICT r7 task 4): the
    directory watch (binaryFile) and the Pub/Sub/Kafka-shaped
    notification bus (JSON object-finalize messages through the shared
    notification_uris parse plan) — same decode pipeline, same
    exactly-once restart contract."""
    import json

    import numpy as np

    from weather_tools_spark.sources import grib2 as G2
    from weather_tools_spark.sources import netcdf3 as N3

    watch = tmp_path / "incoming"
    watch.mkdir()
    bus = tmp_path / "bus"
    bus.mkdir()

    def publish(fname: str) -> None:
        # one notification message per finalized object, one file per
        # message batch (mirrors GCS→Pub/Sub granularity)
        (bus / f"msg-{fname}.jsonl").write_text(
            json.dumps(
                {"bucket": str(watch), "name": fname, "eventType": "OBJECT_FINALIZE"}
            )
            + "\n"
        )

    src_kwargs = (
        {"source": "notifications", "bus_dir": str(bus)}
        if source == "notifications"
        else {}
    )
    lats = np.array([49.0, 48.75])
    lons = np.array([2.0, 2.25, 2.5])
    base = np.arange(6, dtype="f8").reshape(2, 3)
    # two formats in one stream: the dispatch is per file
    G2.write_grib2(
        str(watch / "a.grib2"),
        [{"param": "d2m", "ref_time": "2024-06-01 00:00:00", "lats": lats,
          "lons": lons, "values": base + 0.125}],
    )
    N3.write_netcdf3(
        str(watch / "b.nc"),
        {"time": np.array([1_700_000_000], dtype=">i4"),
         "latitude": lats, "longitude": lons},
        {"d2m": (base + 0.5).reshape(1, 2, 3)},
    )

    got = []

    def sink(df, batch_id):
        got.extend(df.select("time", "latitude", "longitude", "d2m").collect())

    publish("a.grib2")
    publish("b.nc")
    q = OP.stream_ingest_files(
        spark, str(watch), ["time", "latitude", "longitude", "d2m"], sink,
        checkpoint_dir=str(tmp_path / "ckpt"), **src_kwargs,
    )
    q.awaitTermination(60)
    assert len(got) == 12  # 6 grid points from each file
    vals = sorted(round(r.d2m, 3) for r in got)
    assert vals == sorted(
        list((base + 0.125).ravel()) + list((base + 0.5).ravel())
    )

    # restart with the same checkpoint: already-ingested files are NOT
    # re-emitted; a new file is
    G2.write_grib2(
        str(watch / "c.grib2"),
        [{"param": "d2m", "ref_time": "2024-06-01 06:00:00", "lats": lats,
          "lons": lons, "values": base * 0.0 + 7.25}],
    )
    got2 = []

    def sink2(df, batch_id):
        got2.extend(df.collect())

    publish("c.grib2")
    q2 = OP.stream_ingest_files(
        spark, str(watch), ["time", "latitude", "longitude", "d2m"], sink2,
        checkpoint_dir=str(tmp_path / "ckpt"), **src_kwargs,
    )
    q2.awaitTermination(60)
    assert len(got2) == 6
    assert all(round(r.d2m, 3) == 7.25 for r in got2)
