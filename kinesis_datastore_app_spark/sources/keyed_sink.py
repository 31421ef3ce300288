"""Keyed stream sink via the Python Data Source API writer contract.

The reference's producer is a best-effort keyed put: errors are logged
and swallowed, delivery is at-least-once-ish (KinesisSync.java:145-169,
swallow at :164-168). This sink implements the opposite contract with
the public writer API's two-phase commit:

* each task writes its rows to a STAGED file (invisible to readers) and
  returns a WriterCommitMessage naming it;
* the driver's commit() publishes a manifest listing exactly the files
  from successful tasks — readers resolve the manifest, so a failed or
  aborted job leaves nothing visible (exactly-once per job);
* abort() removes the stage, mirroring how FileStreamSink/Kinesis
  producers with transactions behave.

Partition keying (A7: partition key = ticker/event_type,
KinesisSync.java:158) is the caller's repartition before the write —
each task then holds whole key groups, preserving per-key order inside
its staged file exactly like records on one Kinesis shard.

At 100 TB: tasks write in parallel (no driver funnel); the manifest is
O(tasks) metadata — the same commit-protocol shape as FileStreamSink's
file manifest log.

COMMIT-PROTOCOL DEMO, NOT A DATA PATH: the staged files are written by a
per-row Python json.dumps loop, which is fine for demonstrating the
two-phase-commit contract but must never carry bulk data. The engine's
real keyed sinks are JVM parquet writes (``sink_partitioned``,
``trades_sink_keyed``); a production Python-writer sink would stage
Arrow record batches, not JSON lines.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/kinesis_datastore_app_spark")


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class _KeyedSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        os.makedirs(f"{self.path}/stage", exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(f"{self.path}/stage/{fname}", "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), separators=(",", ":")) + "\n")
                n += 1
        return _FileCommit(filename=fname, rows=n)

    def commit(self, messages):
        # Atomic publish (temp + rename): a crash between staging and
        # commit leaves no manifest at all — readers resolve ONLY the
        # manifest, so partial jobs are invisible, never half-visible.
        committed = [m.filename for m in messages if m is not None]
        tmp = f"{self.path}/_MANIFEST.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"files": committed}, f)
        os.replace(tmp, f"{self.path}/_MANIFEST")

    def abort(self, messages):
        import shutil

        shutil.rmtree(f"{self.path}/stage", ignore_errors=True)


class KeyedSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "keyed_manifest_sink"

    def writer(self, schema, overwrite: bool) -> _KeyedSinkWriter:
        return _KeyedSinkWriter(self.options)


# Each invocation writes a fresh uniquely-named sink dir (the unique
# name is what the crash-safety tests rely on: no state bleeds between
# runs), so without cleanup every bench/sweep leaks ~8 MB. Age-gated so
# a CONCURRENT session's in-flight sink — or the lazy read-back of a
# just-returned frame, whose files are only resolved when the frame is
# finally evaluated — is never deleted under it: the dir's mtime last
# moves at manifest commit, so the gate must cover the longest
# plausible commit-to-evaluation lag, not just the write itself.
_SINK_PRUNE_AGE_S = 3600


def _prune_old_sink_dirs(base: str) -> None:
    from kinesis_datastore_app_spark.tmpdirs import prune_aged

    prune_aged(base, "custom_sink_", _SINK_PRUNE_AGE_S)


_SINK_ORACLE = """
SELECT event_id, user_id, event_type, value FROM events
"""


@register("sink_custom_datasource", oracle=_SINK_ORACLE)
def sink_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events through the custom manifest-committing sink (keyed by
    event_type — the A7 partitioned put), then read back ONLY the files
    the manifest committed. Content equality with the source proves the
    commit protocol published every task's rows exactly once."""
    spark.dataSource.register(KeyedSinkDataSource)
    base = f"{SCRATCH}/{sf_dir.rstrip('/').rsplit('/', 1)[-1]}"
    _prune_old_sink_dirs(base)
    path = f"{base}/custom_sink_{uuid.uuid4().hex[:12]}"
    src = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    (
        src.repartition(F.col("event_type"))
        .write.format("keyed_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    with open(f"{path}/_MANIFEST") as f:
        files = [f"{path}/stage/{name}" for name in json.load(f)["files"]]
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).json(files)
