"""Download manifest: an upsert state table keyed by ``location``.

Reference model (weather_dl/download_pipeline/manifest.py): schema at
:460-504 (config_name, dataset, selection JSON, location [upsert key],
area, stage, status, error, username, size, nine stage-transition
timestamps), status machine ``scheduled → in-progress →
success|failure`` (:58-89), BigQuery MERGE upsert keyed on location
(:546-561), Firestore/local/console backends (:401-680).

Spark-first re-expression: the manifest lives as a parquet directory;
an *upsert batch* is merged with last-writer-wins semantics via a
window over (current ∪ updates) — the exact result a sequence of
point MERGEs would produce, but computed in one shuffle. On a
lakehouse runtime the same call maps to ``MERGE INTO`` (Delta/Iceberg);
the parquet emulation keeps this container dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUSES = ("scheduled", "in-progress", "success", "failure")
STAGES = ("fetch", "download", "retrieve", "upload")

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("config_name", T.StringType(), False),
        T.StructField("dataset", T.StringType()),
        T.StructField("selection", T.StringType()),  # JSON dict
        T.StructField("location", T.StringType(), False),  # upsert key
        T.StructField("area", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("size", T.DoubleType()),
        T.StructField("scheduled_time", T.TimestampType()),
        T.StructField("retrieve_start_time", T.TimestampType()),
        T.StructField("retrieve_end_time", T.TimestampType()),
        T.StructField("fetch_start_time", T.TimestampType()),
        T.StructField("fetch_end_time", T.TimestampType()),
        T.StructField("download_start_time", T.TimestampType()),
        T.StructField("download_end_time", T.TimestampType()),
        T.StructField("upload_start_time", T.TimestampType()),
        T.StructField("upload_end_time", T.TimestampType()),
        T.StructField("_seq", T.LongType()),  # monotonic update sequence
    ]
)

VALID_TRANSITIONS: dict[str, set[str]] = {
    "scheduled": {"in-progress"},
    "in-progress": {"success", "failure"},
    "failure": {"in-progress"},  # retries re-enter
    "success": set(),
}


def empty_manifest(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], MANIFEST_SCHEMA)


def merge_updates(current: DataFrame, updates: DataFrame) -> DataFrame:
    """Last-writer-wins MERGE keyed by ``location``: union current state
    with the update batch and keep the max-``_seq`` row per key. One
    shuffle on the merge key; equivalent to applying the updates as
    point MERGEs in ``_seq`` order."""
    unioned = current.unionByName(updates, allowMissingColumns=True)
    w = W.partitionBy("location").orderBy(F.col("_seq").desc())
    return (
        unioned.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def transition_ok(old_status: str | None, new_status: str) -> bool:
    """Status-machine guard (manifest.py:58-89 semantics)."""
    if old_status is None:
        return new_status == "scheduled"
    return new_status in VALID_TRANSITIONS.get(old_status, set())


def validate_transitions(current: DataFrame, updates: DataFrame) -> DataFrame:
    """Return the update rows whose status transition is illegal given
    current state (for strict pipelines that reject instead of clobber)."""
    cur = current.select("location", F.col("status").alias("old_status"))
    joined = updates.join(cur, "location", "left")
    legal = F.lit(False)
    for old, news in VALID_TRANSITIONS.items():
        if news:
            legal = legal | (
                (F.col("old_status") == old) & F.col("status").isin(*sorted(news))
            )
    legal = legal | (F.col("old_status").isNull() & (F.col("status") == "scheduled"))
    return joined.filter(~legal)


class ParquetManifest:
    """Manifest backend over a parquet directory (the local/cloud-FS
    analog of the reference's BigQuery/Firestore backends).

    ``apply(updates)`` rewrites the store via merge_updates — at scale,
    swap for MERGE INTO on a table format; the call-site contract is
    identical.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)
        except Exception:
            return empty_manifest(self.spark)

    def apply(self, updates: DataFrame) -> None:
        # Write the merged state to a temp dir FIRST, then swap it into
        # place. Never cache-then-overwrite the source path: Spark caching
        # is best-effort, and an evicted block would recompute its lineage
        # from the already-overwritten source, corrupting manifest state.
        # The swap goes through the Hadoop FileSystem API (same route as
        # compaction.directory_stats) so hdfs:// / s3a:// / gs:// manifest
        # paths work identically to local ones — NOT shutil, which only
        # understands POSIX paths. (On a lakehouse runtime this whole
        # method is `MERGE INTO`.)
        import uuid

        merged = merge_updates(self.read(), updates)
        tmp = f"{self.path}.__tmp__{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)

        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(hconf)
        jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
        jold = jvm.org.apache.hadoop.fs.Path(f"{self.path}.__old__{uuid.uuid4().hex[:8]}")
        # FileSystem.rename signals failure by returning false, not by
        # raising — every result must be checked or a failed swap would
        # silently corrupt manifest state (rename onto an existing dir
        # can no-op or nest the source). Fail loudly instead, and only
        # delete the old state after the new one is confirmed in place.
        had_old = fs.exists(jpath)
        if had_old and not fs.rename(jpath, jold):
            raise IOError(
                f"manifest swap: could not move current state {self.path} aside"
            )
        if not fs.rename(jtmp, jpath):
            raise IOError(
                f"manifest swap: could not move merged state into place at "
                f"{self.path} (previous state preserved at {jold.toString() if had_old else tmp})"
            )
        if had_old:
            fs.delete(jold, True)
