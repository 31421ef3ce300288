"""Stream source factory: deterministic replay of fixture data as streams.

No Kinesis connector exists in this environment (third-party package), so
streams are simulated with Spark's file source, which reproduces the
Kinesis semantics the reference exercises:

* TRIM_HORIZON / earliest offset (KinesisSync.java:96)  → a file stream
  always starts from the oldest file;
* GetRecords batch cap (KinesisSync.java:110)           → maxFilesPerTrigger;
* per-shard ordering                                    → per-file row order;
* the 2 s job cadence (App.java:18)                     → trigger intervals,
  with trigger(availableNow=True) as the deterministic-replay variant.

The same transformation code runs over spark.read and spark.readStream —
the engine-side analog of the reference running one logical pipeline on
three client stacks (§2 A18).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from kinesis_datastore_app_spark.catalog import table

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/kinesis_datastore_app_spark")

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _sf_tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("/", 1)[-1]


def events_stream_dir(spark: SparkSession, sf_dir: str, copies: int = 1, files: int = 1) -> str:
    """Materialize the events table as a streamable directory (idempotent:
    deterministic content keyed by sf/copies/files, reused if present).

    Publication is atomic: all ``copies`` writes land in a temp dir which
    is then renamed into place, so a crash mid-build can never leave a
    partially-written dir that later runs would silently reuse (the
    overwrite's own _SUCCESS appears before the appends and is NOT a
    valid completeness signal for copies > 1)."""
    import shutil
    import uuid as _uuid

    path = f"{SCRATCH}/{_sf_tag(sf_dir)}/events_stream_c{copies}_f{files}"
    if not os.path.exists(path):
        tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
        src = table(spark, sf_dir, "events").coalesce(files)
        src.write.mode("overwrite").parquet(tmp)
        for _ in range(copies - 1):
            src.write.mode("append").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost a concurrent race — the winner's dir is complete
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    copies: int = 1,
    files: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events replay dir (earliest-offset semantics)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_stream_dir(spark, sf_dir, copies, files))


def run_to_table(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow replay)
    and return the result as a batch DataFrame via the memory sink."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="kdas_ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
