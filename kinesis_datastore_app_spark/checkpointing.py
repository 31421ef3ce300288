"""Checkpoint-block lifecycle for driver-side iterative loops.

``DataFrame.unpersist()`` only releases CacheManager entries; a frame
materialized by ``localCheckpoint(eager=True)`` holds its rows as raw
RDD blocks OUTSIDE the CacheManager, so the pre-round-3 loops leaked one
block set per checkpoint cadence for the life of the session. These
helpers track the block-RDD ids a checkpoint created (via the
JavaSparkContext persistent-RDD registry) and release exactly those when
the successor frame is itself materialized — so no RDD blocks outlive
the query except the single returned frame.

Only safe from a single-threaded driver loop (the id diff would
attribute a concurrent query's persists to the checkpoint); every caller
here is a sequential iterate-swap loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently holding storage in this context."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Release storage for the given RDD ids (no-op for absent ids)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist()


def materialize_swap(
    old_df: DataFrame | None,
    old_ckpt_ids: set[int],
    new_df: DataFrame,
    do_ckpt: bool,
) -> tuple[DataFrame, set[int]]:
    """One iteration-frame swap: materialize ``new_df`` (localCheckpoint
    when ``do_ckpt`` — truncates lineage — else persist+count), then
    release the predecessor's storage, cache entry and checkpoint blocks
    alike. Returns the materialized frame plus the block ids to pass
    back on the next swap. The final frame's storage intentionally
    survives — it IS the result."""
    spark = new_df.sparkSession
    if do_ckpt:
        before = persistent_rdd_ids(spark)
        new_df = new_df.localCheckpoint(eager=True)
        new_ids = persistent_rdd_ids(spark) - before
    else:
        new_df = new_df.persist()
        new_df.count()  # materialize (and publish any observe() metrics)
        new_ids = set()
    if old_df is not None:
        if old_ckpt_ids:
            unpersist_rdd_ids(spark, old_ckpt_ids)
        else:
            old_df.unpersist()
    return new_df, new_ids
