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
from kinesis_datastore_app_spark.tmpdirs import scratch_tmpdir
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import (
    _ensure_engine_confs,
    _write_src_marker,
    scratch_tag,
    table,
)

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/kinesis_datastore_app_spark")

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _sf_tag(sf_dir: str) -> str:
    # Fingerprinted (size+mtime of events.parquet): a regenerated
    # fixture or a different dataset with the same basename addresses a
    # fresh scratch dir instead of silently reusing a stale one.
    return scratch_tag(sf_dir, "events")


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

    _ensure_engine_confs(spark)
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
        _write_src_marker(f"{SCRATCH}/{_sf_tag(sf_dir)}", sf_dir)
    return path


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    copies: int = 1,
    files: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events replay dir (earliest-offset semantics).

    Applies the engine session confs UNCONDITIONALLY: when the replay dir
    already exists the builder skips catalog.table(), and without the
    UTC conf a caller-provided session in another timezone would render
    every streamed timestamp shifted (caught by the TZ spot-check)."""
    _ensure_engine_confs(spark)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_stream_dir(spark, sf_dir, copies, files))


STATE_PARTITIONS = 8


def run_to_table(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow replay)
    and return the result as a batch DataFrame via the memory sink.

    Stateful shuffle partitions are scoped to STATE_PARTITIONS for the
    query's lifetime: a streaming query pins one state store instance
    per shuffle partition at first start, and each micro-batch commits a
    delta file per store — so the partition count must be sized to STATE
    VOLUME, not to the session's scan-parallelism default (measured here:
    32 stores over a few thousand state rows cost 4-18 s per replay in
    store-commit overhead; 8 cost ~3 s, identical results). At 100 TB
    the same knob goes UP with aggregate state size — the point is that
    it is a deliberate, state-sized choice, decoupled from
    spark.sql.shuffle.partitions."""
    spark = sdf.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    ckpt = scratch_tmpdir("kdas_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def events_batched_stream_dir(spark: SparkSession, sf_dir: str, batches: int = 4) -> str:
    """Replay dir with a DETERMINISTIC, SQL-expressible batch assignment:
    batch = ntile(batches) over (ORDER BY ts, event_id), except rows with
    event_id % 10 == 0 are demoted TWO batches (bounded controlled
    lateness). One parquet file per batch, mtimes strictly increasing, so
    FileStreamSource with maxFilesPerTrigger=1 replays batch b as
    micro-batch b — which makes the watermark's whole evolution (and
    therefore exactly which late rows are dropped) a pure function of the
    data that an offline SQL oracle can replay.

    The demotion is two batches, not one, because Spark's late-row
    filter lags the eviction watermark by one micro-batch (measured: the
    filter in batch b uses the watermark REPORTED for batch b-1, i.e.
    max event time through batch b-2, minus the delay; eviction in batch
    b uses batch b's own reported watermark). A one-batch demotion's
    rows always arrive while their windows are still live — nothing is
    ever dropped; two batches puts most demoted rows behind the filter
    watermark, exercising the drop path. The global ntile window is
    single-partition but runs once at fixture-build time over the
    bounded replay corpus, never in the streaming hot path."""
    import glob as _glob
    import shutil as _shutil
    import uuid as _uuid

    from pyspark.sql import Window as _W

    _ensure_engine_confs(spark)
    path = f"{SCRATCH}/{_sf_tag(sf_dir)}/events_stream_nt{batches}d2"
    if not os.path.exists(path):
        tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        src = table(spark, sf_dir, "events")
        q = F.ntile(batches).over(_W.orderBy("ts", "event_id")) - 1
        b = F.when(
            F.col("event_id") % 10 == 0, F.least(q + 2, F.lit(batches - 1))
        ).otherwise(q)
        staged = src.withColumn("b", b)
        for i in range(batches):
            sub = f"{tmp}.part{i}"
            (
                staged.filter(F.col("b") == i)
                .drop("b")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(sub)
            )
            part = _glob.glob(f"{sub}/part-*.parquet")[0]
            dst = f"{tmp}/batch-{i:03d}.parquet"
            _shutil.move(part, dst)
            _shutil.rmtree(sub)
            # fixed, strictly increasing mtimes: processing order is part
            # of the fixture, not of when this builder happened to run
            os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        try:
            os.rename(tmp, path)
        except OSError:
            _shutil.rmtree(tmp, ignore_errors=True)
    return path
