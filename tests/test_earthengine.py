"""EarthEngine connector (sources/earthengine.py) under the mocked
client: ee:// open end-to-end (asset metadata → chunk manifest →
executor-side pixel fetch → long-format rows) and the COG/CSV
asset-conversion + ingestion manifests (reference ee.py:854-970).
The real-client gate (no earthengine-api in this container) must stay
byte-for-byte useful."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from weather_tools_spark.sources import earthengine as EE
from weather_tools_spark.sources import opener as OP


def test_open_ee_reassembles_hypercube_exactly(spark):
    """Chunked fetches must reassemble the full (time, band, y, x)
    hypercube with the fake's closed-form pixel values, regardless of
    tile size (chunk=2 forces many partial tiles on a 5x6 grid)."""
    fake = EE.FakeEEClient()
    df = EE.open_ee(spark, "ee://ECMWF/ERA5/TEST", EE.FakeEEClient, chunk=2)
    rows = df.collect()
    info = fake.get_asset_info("ECMWF/ERA5/TEST")
    n_expected = len(info["times"]) * len(info["bands"]) * 5 * 6
    assert len(rows) == n_expected
    ox, oy = info["grid"]["origin"]
    px, py = info["grid"]["pixel"]
    for r in rows:
        t_index = info["times"].index(int(r.time.timestamp()))
        bi = info["bands"].index(r.band)
        y = round((r.latitude - oy) / py)
        x = round((r.longitude - ox) / px)
        want = 100.0 * bi + 10.0 * t_index + y + 0.01 * x
        assert abs(r.value - want) < 1e-9, (r, want)


def test_open_dataset_dispatches_ee_with_filters(spark):
    """The single open_dataset entrypoint must route ee:// through the
    connector and apply range filters + view registration like every
    other format."""
    df = OP.open_dataset(
        spark,
        "ee://ECMWF/ERA5/TEST",
        lat_range=(49.0, 50.0),
        client_factory=EE.FakeEEClient,
        view="ee_test",
    )
    assert df.filter(~F.col("latitude").between(49.0, 50.0)).count() == 0
    assert spark.sql("SELECT count(*) AS n FROM ee_test").first().n == df.count()


def test_ee_gate_unchanged_without_package():
    """No earthengine-api in the container: detect() and the default
    open_dataset path must keep the canonical gated error."""
    with pytest.raises(NotImplementedError, match="earthengine-api"):
        OP.detect("ee://ECMWF/ERA5/HOURLY")
    with pytest.raises(NotImplementedError, match="earthengine-api"):
        EE.RealEEClient()


def test_cog_ingest_chain_builds_reference_manifest(spark, tmp_path):
    """convert→upload→register (reference ConvertToAsset + IngestIntoEE):
    one band pivots to a dense grid, writes a readable COG, and the
    recorded imageManifest has the reference's payload shape
    (name under the asset collection, single tileset with the COG URI)."""
    from weather_tools_spark.sources.geotiff import gtiff_decode

    fake = EE.FakeEEClient(n_time=1, height=4, width=4, bands=("t2m",))
    src = EE.open_ee(spark, "ee://SRC", lambda: fake, chunk=4)
    cog = str(tmp_path / "t2m.tif")
    asset_id = EE.to_cog_then_ingest(
        src, "t2m", cog, fake, "projects/p/assets/col", "t2m_2024060100"
    )
    assert asset_id == "projects/p/assets/col/t2m_2024060100"
    assert len(fake.ingested) == 1
    rec = fake.ingested[0]
    assert rec["type"] == "IMAGE"
    m = rec["manifest"]
    assert m["tilesets"] == [{"id": "0", "sources": [{"uris": [cog]}]}]
    # the written COG must decode back to the same values
    back = gtiff_decode(cog)
    got = sorted(back["value"].tolist())
    want = sorted(r.value for r in src.collect())
    assert np.allclose(got, want)


def test_table_ingest_manifest(tmp_path):
    fake = EE.FakeEEClient()
    csv = str(tmp_path / "obs.csv")
    with open(csv, "w") as f:
        f.write("lat,lon,v\n49.0,2.0,1.5\n")
    asset_id = EE.ingest_table_asset(
        fake, "projects/p/assets/tables", EE.AssetData(name="obs", target_path=csv)
    )
    assert asset_id == "projects/p/assets/tables/obs"
    assert fake.ingested[0]["type"] == "TABLE"
    assert fake.ingested[0]["manifest"]["sources"] == [{"uris": [csv]}]


def test_time_range_prunes_manifest_not_just_rows(spark):
    """time_range must prune CHUNK MANIFEST rows (no pixel fetch for
    out-of-range images — the zarr chunk-pruning analog), and the
    pruned result must equal the post-filtered unpruned one."""
    fake = EE.FakeEEClient(n_time=4)
    info = fake.get_asset_info("A")
    import pandas as pd

    t1 = pd.Timestamp(info["times"][1], unit="s")
    t3 = pd.Timestamp(info["times"][3], unit="s")
    full = EE.chunk_manifest(info)
    pruned = EE.chunk_manifest(info, time_range=(str(t1), str(t3)))
    assert len(pruned) == len(full) // 2  # 2 of 4 time steps survive
    got = sorted(
        (r.time, r.band, r.latitude, r.longitude, r.value)
        for r in EE.open_ee(
            spark, "ee://A", EE.FakeEEClient, time_range=(str(t1), str(t3))
        ).collect()
    )
    want = sorted(
        (r.time, r.band, r.latitude, r.longitude, r.value)
        for r in EE.open_ee(spark, "ee://A", EE.FakeEEClient)
        .filter((F.col("time") >= F.lit(str(t1))) & (F.col("time") < F.lit(str(t3))))
        .collect()
    )
    assert got == want and len(got) > 0
    # empty prune window → empty frame with the stable schema, no RPCs
    empty = EE.open_ee(
        spark, "ee://A", EE.FakeEEClient, time_range=("1990-01-01", "1990-01-02")
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "time", "latitude", "longitude", "band", "value",
    ]
