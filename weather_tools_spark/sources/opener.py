"""URI → DataFrame dataset opener — the reference's
``xql.open.open_dataset`` analog (xql/src/xql/open.py:68-98, which
dispatches a URI to ``xr.open_zarr`` / engine-mapped ``open_dataset``
and feeds the xql query layer).

Dispatch is by store layout and magic bytes, all against the stdlib
codecs (no xarray/cfgrib/rasterio):

- Zarr v2 store (directory with ``.zmetadata``/array dirs, or
  ``*.zarr``)  → chunk-manifest scan with range PRUNING + ``zarr2``
  decode (sources/zarr_scan.py + zarr_v2.py);
- classic NetCDF (``CDF\\x01/\\x02``)   → sources/netcdf3.py;
- NetCDF-4/HDF5 (``\\x89HDF\\r\\n\\x1a\\n``) → sources/hdf5.py (stdlib
  HDF5 subset: symbol-table groups, contiguous/chunked B-tree
  layouts, shuffle+deflate);
- GRIB2 (``GRIB``+edition 2)           → sources/grib2.py;
- GRIB1 (``GRIB``+edition 1)           → sources/grib1.py (the
  reference's cfgrib edition fallback, sinks.py:370-389);
- GeoTIFF (``II*\\0`` / ``MM\\0*``)      → sources/geotiff.py.

Single-file formats probe only the file HEADER on the driver (variable
names → output schema; the reference's metadata open) and decode on
executors via ``mapInPandas`` — one task per file, whole-file decode,
the same plan shape as hypercube.ingest. The returned frame is plain
long-format rows, so the xql SQL surface (plans/xql.py) runs on top by
registering it as a view: ``open_dataset(spark, uri, view="era5")``
then ``xql.run_query(spark, "SELECT ... FROM era5 ...")`` — the
reference's flagship flow end-to-end.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def detect(uri: str) -> str:
    """Classify a URI by store layout / magic bytes."""
    from .geotiff import is_tiff
    from .grib1 import is_grib1
    from .grib2 import is_grib2
    from .hdf5 import is_hdf5
    from .hypercube import _is_classic_netcdf
    from .zarr_v2 import ZMETADATA

    if uri.startswith("ee://"):
        # the reference's EarthEngine branch (xql/src/xql/open.py:85-89)
        # initializes the EE client; the connector (sources/earthengine.py)
        # is implemented against the client protocol, but the REAL client
        # needs the earthengine-api package and live credentials — a
        # clean gate when absent, not silent misdetection.
        try:
            import ee  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "ee:// datasets require the earthengine-api client (reference "
                "branch xql/src/xql/open.py:85-89); install it, or pass an "
                "EEClient factory to open_dataset(client_factory=...) — every "
                "other opener path is library-free"
            ) from None
        return "ee"
    if os.path.isdir(uri) and (
        os.path.exists(os.path.join(uri, ZMETADATA))
        or os.path.exists(os.path.join(uri, "zarr.json"))  # v3 store
        or uri.rstrip("/").endswith(".zarr")
    ):
        return "zarr"
    if _is_classic_netcdf(uri):
        return "netcdf3"
    if is_hdf5(uri):
        return "netcdf4"
    if is_grib2(uri):
        return "grib2"
    if is_grib1(uri):
        return "grib1"  # reference edition fallback (sinks.py:370-389)
    if is_tiff(uri):
        return "geotiff"
    raise ValueError(
        f"unable to open dataset {uri!r}: not a zarr store, classic NetCDF, "
        "NetCDF-4/HDF5, GRIB1/GRIB2, or GeoTIFF"
    )


def _file_frame(
    spark: SparkSession, uris: list[str], decode_one, columns: list[str]
) -> DataFrame:
    """One-task-per-file decode plan for single-file formats: the file
    list is the input frame (repartitioned so whole files are the unit
    of parallelism), decoding runs in mapInPandas on executors (the
    driver touched only one header for the schema)."""
    schema = ", ".join(
        f"`{c}` {'timestamp' if c == 'time' else 'double'}" for c in columns
    )
    files = spark.createDataFrame([(u,) for u in uris], "path string").repartition(
        max(1, min(len(uris), spark.sparkContext.defaultParallelism))
    )

    def gen(batches):
        for pdf in batches:
            for p in pdf["path"]:
                out = decode_one(p)
                yield out.reindex(columns=columns)

    return files.mapInPandas(gen, schema)


def open_dataset(
    spark: SparkSession,
    uri: str,
    time_range: tuple[str, str] | None = None,
    lat_range: tuple[float, float] | None = None,
    lon_range: tuple[float, float] | None = None,
    view: str | None = None,
    client_factory=None,
    variables: list[str] | None = None,
) -> DataFrame:
    """Open any supported store/file as a long-format DataFrame;
    optionally register it as a temp view for the SQL surface. Range
    arguments prune CHUNKS for zarr stores (parquet row-group-style
    min/max pruning) and apply as ordinary filters for file formats.

    ``variables`` is the projection pushdown (the reference's
    ``_only_target_vars``, weather_mv/loader_pipeline/util.py:159-191):
    only the named data variables decode — for zarr stores the pruned
    variables' chunk FILES are never opened (each variable is its own
    chunked array), for GRIB the pruned messages are skipped at the
    header, for HDF5 the pruned chunks never inflate, for NetCDF-3 the
    pruned payloads never CF-unpack. Unknown names raise driver-side.

    ``uri`` may be a glob (``.../era5-*.grib2``): every match must be
    the same format; one executor task decodes each whole file — the
    reference's multi-file collection ingest (beam.Create(uris)).

    ``ee://`` URIs route to the EarthEngine connector
    (sources/earthengine.py). ``client_factory`` (picklable EEClient
    factory) overrides the real client — tests inject FakeEEClient;
    without it, the real client import gates cleanly."""
    import glob as _glob

    if uri.startswith("ee://"):
        from .earthengine import open_ee

        if client_factory is None:
            detect(uri)  # gate with the canonical message if no ee pkg
        # time_range prunes the chunk MANIFEST (no pixel RPC for
        # out-of-range images); the residual filter below stays for
        # uniformity with the file formats (cheap no-op after pruning)
        # `variables` maps to EE bands: the chunk manifest prunes by
        # band, so unrequested bands never issue a pixel RPC
        df = open_ee(
            spark, uri, client_factory=client_factory, time_range=time_range,
            bands=variables,
        )
        if time_range is not None:
            df = df.filter(
                (F.col("time") >= F.lit(time_range[0]).cast("timestamp"))
                & (F.col("time") < F.lit(time_range[1]).cast("timestamp"))
            )
        if lat_range is not None:
            df = df.filter(F.col("latitude").between(*lat_range))
        if lon_range is not None:
            df = df.filter(F.col("longitude").between(*lon_range))
        if view is not None:
            df.createOrReplaceTempView(view)
        return df

    uris = sorted(_glob.glob(uri)) if any(ch in uri for ch in "*?[") else [uri]
    if not uris:
        raise ValueError(f"no files match {uri!r}")
    kinds = {detect(u) for u in uris}
    if len(kinds) > 1:
        raise ValueError(f"mixed formats under {uri!r}: {sorted(kinds)}")
    (kind,) = kinds
    if kind == "zarr" and len(uris) > 1:
        raise ValueError("glob of multiple zarr stores unsupported — open each store")
    if kind == "zarr":
        import dataclasses

        from . import zarr_scan as ZS
        from .zarr_v2 import open_zarr_v2

        meta = open_zarr_v2(uri)
        if variables is not None:
            unknown = sorted(set(variables) - set(meta.variables))
            if unknown:
                raise ValueError(f"unknown variables {unknown} (store has {list(meta.variables)})")
            # each variable is its own chunked array: restricting the
            # template means the pruned variables' chunk files are
            # never opened, let alone decompressed
            meta = dataclasses.replace(
                meta, variables=tuple(v for v in meta.variables if v in set(variables))
            )
        df = ZS.scan(
            spark, meta, time_range, lat_range, lon_range,
            decoder="zarr2", include_uri=False,
        )
    else:
        if kind == "geotiff":  # no time axis, single value band
            from .geotiff import gtiff_decode

            cols = ["latitude", "longitude", "value"]
            df = _file_frame(spark, uris, lambda p: gtiff_decode(p), cols)
        else:
            # single-file hypercube formats share the decoder pairing —
            # projection pushdown included — with format("weather")
            from .datasource import _decoder_for

            decode_one, cols = _decoder_for(kind, uris[0], variables)
            df = _file_frame(spark, uris, decode_one, cols)
        if time_range is not None and "time" in df.columns:
            df = df.filter(
                (F.col("time") >= F.lit(time_range[0]).cast("timestamp"))
                & (F.col("time") < F.lit(time_range[1]).cast("timestamp"))
            )
        if lat_range is not None:
            df = df.filter(F.col("latitude").between(*lat_range))
        if lon_range is not None:
            df = df.filter(F.col("longitude").between(*lon_range))
    if view is not None:
        df.createOrReplaceTempView(view)
    return df


def notification_uris(values: "DataFrame") -> "DataFrame":
    """Shared notification-parse plan: a ``value`` STRING column of
    object-finalize JSON payloads → one ``path`` URI column.

    This is the deploy-time-switch half of the Pub/Sub/Kafka ingest
    story (reference weather_mv streaming.py:72-121): the SAME plan
    runs downstream of

    - the real Kafka source::

        spark.readStream.format("kafka")
             .option("kafka.bootstrap.servers", ...)
             .option("subscribe", topic).load()
             .selectExpr("CAST(value AS STRING) AS value")

    - the file-backed bus stand-in (``readStream.text`` yields the
      identical single ``value`` string column), which is what the
      test harness drives — no broker in the container.

    Payload contract mirrors a GCS OBJECT_FINALIZE notification:
    ``{"bucket": <dir-or-bucket>, "name": <object>, "eventType": ...}``.
    Messages with a non-finalize eventType are dropped; a missing
    eventType passes (bare {bucket,name} notifications).
    """
    j = F.from_json(
        F.col("value"), "bucket string, name string, eventType string"
    )
    return (
        values.select(j.alias("n"))
        .filter(
            F.col("n.name").isNotNull()
            & (
                F.col("n.eventType").isNull()
                | (F.col("n.eventType") == "OBJECT_FINALIZE")
            )
        )
        .select(F.concat_ws("/", F.col("n.bucket"), F.col("n.name")).alias("path"))
    )


def stream_ingest_files(
    spark: SparkSession,
    watch_dir: str,
    columns: list[str],
    sink_fn,
    pattern: str = "*",
    max_files_per_trigger: int = 4,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    source: str = "files",
    bus_dir: str | None = None,
):
    """Streaming weather-file ingest — the reference's streaming mode
    (weather_mv loader_pipeline/pipeline.py:62-70: Pub/Sub
    object-finalize events → file URIs → open_dataset → rows) as
    Structured Streaming.

    New files landing in ``watch_dir`` are the event source (the
    file-source analog of object-finalize notifications);
    ``maxFilesPerTrigger`` bounds files per micro-batch. Each
    micro-batch decodes WHOLE files on executors through the
    magic-byte auto dispatch (hypercube.decode_auto — classic NetCDF /
    HDF5 / GRIB1 / GRIB2, no libraries), then hands the long-format
    rows to ``sink_fn(df, batch_id)`` via foreachBatch. Only the
    ``path`` column is selected from the binaryFile source, so file
    CONTENT is never shipped through the stream — decode re-reads
    bytes executor-side, keeping the micro-batch plan metadata-sized.
    Pass ``checkpoint_dir`` for a durable offset log (exactly-once
    file accounting across restarts).

    Returns the started StreamingQuery (caller awaits/stops it).
    """
    from .hypercube import IngestOptions, decode_auto

    if source == "files":
        files = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, length long, content binary"
            )
            .option("pathGlobFilter", pattern)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .load(watch_dir)
            .select("path")
        )
    elif source == "notifications":
        # Pub/Sub/Kafka-shaped ingest: the event source is a message bus
        # of object-finalize notifications, not a directory listing. The
        # bus stand-in is a text stream (one JSON payload per line) with
        # the SAME single `value` string column a Kafka source exposes
        # after CAST(value AS STRING); notification_uris is the shared
        # downstream plan, so the real-broker deployment is exactly the
        # reader swap documented there. Checkpointed offsets give the
        # same exactly-once notification accounting as the file source.
        if bus_dir is None:
            raise ValueError("source='notifications' requires bus_dir")
        values = (
            spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
            .text(bus_dir)
        )
        files = notification_uris(values)
    else:
        raise ValueError(f"unknown stream source {source!r} (files|notifications)")
    schema = ", ".join(
        f"`{c}` {'timestamp' if c == 'time' else 'double'}" for c in columns
    )
    opts = IngestOptions()

    def gen(batches):
        for pdf in batches:
            for p in pdf["path"]:
                local = p[5:] if p.startswith("file:") else p
                yield decode_auto(local, opts).reindex(columns=columns)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.repartition(
            max(1, batch_df.sparkSession.sparkContext.defaultParallelism)
        ).mapInPandas(gen, schema)
        sink_fn(rows, batch_id)

    writer = files.writeStream.foreachBatch(process)
    if available_now:
        writer = writer.trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
