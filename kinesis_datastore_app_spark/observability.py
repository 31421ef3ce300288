"""Query observability (SURVEY.md §2 gap-closure; reference parity A-obs).

The reference instruments its consumer loop with a tracing annotation on
the hot methods (KinesisSync.java:33 ``@Trace(dispatcher=true)``) so an
APM agent records per-run throughput. The agent itself is out of scope
(third-party SaaS), but the engine-side capability — "this query run
processed N rows / M errors, measured in-band, without a second pass" —
is ``DataFrame.observe()``:

* metric expressions attach to a POINT IN THE PLAN and are computed by
  an AggregatingAccumulator during the same pass as the query — zero
  extra jobs, zero extra shuffles, and exactly-once per row even under
  task retry (unlike hand-rolled accumulators, which double-count
  retried tasks);
* results publish through QueryExecution listener events, which is
  where a metrics exporter (the APM-agent analog) would subscribe; in a
  streaming query the same metrics surface per micro-batch in
  ``StreamingQueryProgress.observedMetrics`` — the reference's per-tick
  trace, per trigger.

At 100 TB this is the only sane shape for pipeline counters: the
alternative — a second aggregation pass over the input — doubles the
scan, and driver-side counting doesn't exist (the rows never visit the
driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_OBS_ORACLE = """
SELECT COUNT(*) AS rows_seen,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
       MAX(user_id) AS max_user_id,
       COUNT(*) FILTER (WHERE event_type = 'error') AS gate_out_rows
FROM events
"""


@register("obs_query_metrics", oracle=_OBS_ORACLE)
def obs_query_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-band query metrics via ``df.observe()`` — the engine analog of
    the reference's ``@Trace`` consumer instrumentation
    (KinesisSync.java:33): rows seen, per-type counters, value mass and
    distinct users are measured ON the scan that feeds a downstream
    filter, in one pass, then returned as a one-row metrics record.

    The observed sum uses the exact-decimal pattern (numerics.py) so the
    metric is bit-identical across partitionings and engines — observed
    metrics feed alerting thresholds, and a float-sum metric that
    changes with task scheduling would flap alerts. The single collected
    row is METADATA (the metrics record), not data — the gated rows
    themselves stay distributed (their count is cross-checked against
    the observed per-type counter)."""
    e = table(spark, sf_dir, "events")
    obs = Observation("gate_metrics")
    # NOTE: observed metrics must be DISTINCT-free (CollectMetrics
    # restriction) — distinct-ish needs (n_users) use a sketch metric
    # (approx_count_distinct) in production; here max(user_id) keeps the
    # record fully exact for the oracle.
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        F.max("user_id").alias("max_user_id"),
    )
    gate_out_rows = observed.filter(F.col("event_type") == "error").count()
    m = obs.get  # blocks until the action above publishes the metrics
    return spark.createDataFrame(
        [
            (
                m["rows_seen"],
                m["n_error"],
                m["n_purchase"],
                # sum over zero rows / all-NULL values publishes NULL —
                # pass it through instead of float(None) TypeError
                # (round-8 review); the oracle's SUM is NULL there too
                float(m["sum_value"]) if m["sum_value"] is not None else None,
                m["max_user_id"],
                gate_out_rows,
            )
        ],
        "rows_seen BIGINT, n_error BIGINT, n_purchase BIGINT, "
        "sum_value DOUBLE, max_user_id BIGINT, gate_out_rows BIGINT",
    )


_OBS_STREAM_ORACLE = """
SELECT COUNT(*) AS rows_total, TRUE AS ticks_equal_files FROM events
"""


@register("obs_stream_progress", oracle=_OBS_STREAM_ORACLE)
def obs_stream_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trigger observed metrics on a STREAM — the reference's 2 s
    consumer tick logging its batch throughput (KinesisSync.java:118-122
    under @Trace), re-expressed as ``observe()`` on a streaming
    DataFrame: every micro-batch publishes its metric row in
    ``StreamingQueryProgress.observedMetrics``, with no second pass over
    the batch. The query replays the events dir one file per trigger and
    then asserts (a) summed per-tick row counters reconstruct the exact
    total row count, and (b) every data-carrying trigger produced a
    metrics entry — one tick per input file. The oracle pins (a)
    exactly and (b) as literal TRUE."""
    import glob
    from kinesis_datastore_app_spark.tmpdirs import scratch_tmpdir
    import uuid

    from kinesis_datastore_app_spark.streaming.source_factory import (
        events_stream,
        events_stream_dir,
    )

    path = events_stream_dir(spark, sf_dir, files=3)
    n_files = len(glob.glob(f"{path}/*.parquet"))
    s = events_stream(spark, sf_dir, files=3, max_files_per_trigger=1)
    out = s.observe("tick", F.count(F.lit(1)).alias("rows")).select("event_id")
    name = f"obs_stream_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_tmpdir("kdas_obs_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ticks = [
        p.observedMetrics["tick"].rows
        for p in q.recentProgress
        if "tick" in (p.observedMetrics or {}) and p.observedMetrics["tick"].rows > 0
    ]
    # the memory sink existed only to drive progress; drop it so it does
    # not pin every event_id on the driver for the session (round-10
    # review — one leaked table per invocation across a sweep)
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(
        [(sum(ticks), len(ticks) == n_files)],
        "rows_total BIGINT, ticks_equal_files BOOLEAN",
    )
