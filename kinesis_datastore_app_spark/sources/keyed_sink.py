"""Keyed stream sink via the Python Data Source API writer contract.

The reference's producer is a best-effort keyed put: errors are logged
and swallowed, delivery is at-least-once-ish (KinesisSync.java:145-169,
swallow at :164-168). This sink implements the opposite contract with
the public writer API's two-phase commit:

* each task writes its rows to a STAGED file under this JOB's stage
  subdir (invisible to readers) and returns a WriterCommitMessage
  naming it;
* the driver's commit() publishes a manifest: in append mode the prior
  manifest's files plus this job's, in overwrite mode this job's only —
  readers resolve the manifest, so a failed or aborted job leaves
  nothing newly visible (exactly-once per job);
* abort() removes only THIS job's stage subdir, mirroring how
  FileStreamSink/Kinesis producers with transactions behave — files a
  PRIOR job already committed (still listed by the live manifest) are
  never touched by a later job's failure.

Partition keying (A7: partition key = ticker/event_type,
KinesisSync.java:158) is the caller's repartition before the write —
each task then holds whole key groups. Per-key order inside a staged
file (the one-Kinesis-shard analog) is the caller's
sortWithinPartitions: the repartition SHUFFLE alone does not preserve
intra-key row order (reducers fetch map outputs in nondeterministic
order), so the registered query sorts by (key, event_id) in-task.

At 100 TB: tasks write in parallel (no driver funnel); the manifest is
O(tasks) metadata — the same commit-protocol shape as FileStreamSink's
file manifest log. Staged files must then land on SHARED storage (an
object store / DFS) so the driver-side commit and the readers resolve
the same paths; the local-disk staging here is the single-node stand-in.

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

# Scratch root shared with catalog.py — a fourth verbatim copy here
# silently desynchronized if the env-var name or default ever changed
# (round-10 review): sink dirs would land outside what session.py
# configures and the pruners sweep. Accessed through scratch_root() at
# call time (round-11: resolution is lazy and tests monkeypatch
# catalog.SCRATCH, which scratch_root honors).
from kinesis_datastore_app_spark.catalog import scratch_root, table
from kinesis_datastore_app_spark.registry import register


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class _KeyedSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite
        # minted once on the driver, pickled to every task: all of this
        # job's staged files live under stage/<job_id>/, so abort() can
        # remove exactly this job's work and a prior job's committed
        # files can never be collateral damage
        self.job_id = f"job-{uuid.uuid4().hex[:12]}"

    def write(self, iterator):
        # staged file is created lazily on the first row: an empty
        # partition commits no file, so the manifest and the read-back
        # never carry empty entries
        fname, f, n = None, None, 0
        try:
            for row in iterator:
                if f is None:
                    os.makedirs(f"{self.path}/stage/{self.job_id}", exist_ok=True)
                    fname = f"part-{uuid.uuid4().hex}.jsonl"
                    f = open(f"{self.path}/stage/{self.job_id}/{fname}", "w")
                f.write(json.dumps(row.asDict(), separators=(",", ":")) + "\n")
                n += 1
        finally:
            if f is not None:
                # fsync the DATA before this task's commit message can
                # reach the driver (round-10 review): commit() fsyncs the
                # MANIFEST and its directory, so without this a power
                # loss after job success could leave a durable manifest
                # naming part files whose pages never hit disk —
                # truncated data behind a committed version, inverting
                # the exactly-once claim.
                f.flush()
                os.fsync(f.fileno())
                f.close()
        return _FileCommit(
            filename=f"{self.job_id}/{fname}" if fname else None, rows=n
        )

    def commit(self, messages):
        # OCC publish through the versioned transaction log (txnlog.py):
        # a commit is an atomic create-if-absent of the next manifest
        # version, so a crash between staging and commit leaves the prior
        # version live (readers resolve ONLY the latest version — partial
        # jobs are invisible, never half-visible), and TWO jobs committing
        # concurrently to the same sink path serialize instead of the old
        # read-modify-write race where the second os.replace dropped the
        # first job's files. Append mode REBASES on conflict (re-merges
        # against the winner's file list — this job's staged files are
        # immutable, so re-applying is safe); overwrite publishes this
        # job's files alone at whatever version it wins.
        from kinesis_datastore_app_spark.txnlog import occ_commit

        mine = [m.filename for m in messages if m is not None and m.filename]
        os.makedirs(self.path, exist_ok=True)  # zero-task job: empty manifest

        def apply(prev, prev_v):
            if self.overwrite or prev is None:
                return {"files": mine}
            return {"files": prev["files"] + mine}

        occ_commit(self.path, apply)

    def abort(self, messages):
        import shutil

        shutil.rmtree(f"{self.path}/stage/{self.job_id}", ignore_errors=True)


class KeyedSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "keyed_manifest_sink"

    def writer(self, schema, overwrite: bool) -> _KeyedSinkWriter:
        return _KeyedSinkWriter(self.options, overwrite)


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
    from kinesis_datastore_app_spark.tmpdirs import _activity_mtime, prune_aged

    # activity probe (dir + immediate children) rather than the bare
    # top-level mtime: a sink dir's writes land in stage/, whose mtime
    # bumps as tasks create files, so a long in-flight write keeps its
    # dir young instead of aging out mid-job
    prune_aged(base, "custom_sink_", _SINK_PRUNE_AGE_S, activity=_activity_mtime)


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
    base = f"{scratch_root()}/{sf_dir.rstrip('/').rsplit('/', 1)[-1]}"
    _prune_old_sink_dirs(base)
    path = f"{base}/custom_sink_{uuid.uuid4().hex[:12]}"
    src = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    (
        src.repartition(F.col("event_type"))
        # the per-key order inside each staged file (the one-shard
        # analog) is established HERE — the shuffle alone doesn't keep it
        .sortWithinPartitions("event_type", "event_id")
        .write.format("keyed_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    from kinesis_datastore_app_spark.txnlog import read_latest

    _, manifest = read_latest(path)
    files = [f"{path}/stage/{name}" for name in (manifest or {"files": []})["files"]]
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).json(files)
