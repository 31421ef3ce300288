"""Change-data-capture shapes: SCD Type-2 history build from a change feed.

The reference's pipeline is itself a change feed — an append-only stream
of keyed records (StockTrade.java:37-43) consumed in arrival order
(KinesisSync.java:118-122). The warehouse-side dual of that feed is the
slowly-changing-dimension build: collapse consecutive duplicate states
per key, then derive each surviving state's validity interval
[effective_from, effective_to) and an is_current flag. This module
re-expresses that as two window functions over ONE hash partitioning:

* change-point detection: ``LAG(status) OVER (PARTITION BY key ORDER BY
  ts, id)`` — keep a row iff its status differs from the previous one;
* interval derivation: ``LEAD(ts)`` over the SAME window spec gives the
  exclusive upper bound; NULL upper bound marks the current row.

Because both windows share partitioning and ordering, Catalyst plans a
single Exchange + Sort feeding both Window nodes — at 100 TB the whole
SCD2 build costs exactly one shuffle of the change feed, and the
per-key state never materializes anywhere (no driver loop, no
``collect``). Skewed keys (one entity with millions of changes) are the
only hazard; the mitigation is the same salting used in
``join_skew_salted`` applied to the change-point pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

# The SCD2 change-point + interval CTEs, defined ONCE: both oracles
# (cdc_scd2_build, join_point_in_time) compose from this snippet, the
# SQL mirror of join_point_in_time calling cdc_scd2_build — an edit to
# the change-point semantics can't silently leave one oracle behind.
_SCD2_HIST_CTES = """changes AS (
    SELECT user_id,
           event_type AS status,
           ts,
           event_id,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_status
    FROM events
),
hist AS (
    SELECT user_id, status, ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS effective_to
    FROM changes
    WHERE prev_status IS NULL OR prev_status <> status
)"""

_SCD2_ORACLE = f"""
WITH {_SCD2_HIST_CTES}
SELECT user_id, status, effective_from, effective_to,
       (effective_to IS NULL) AS is_current
FROM hist
"""


@register("cdc_scd2_build", oracle=_SCD2_ORACLE)
def cdc_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from the events change feed: treat each
    user's event_type sequence as a status stream, keep only change
    points, and emit validity intervals. Deterministic because the window
    ordering is total (ts, event_id). One shuffle on user_id serves both
    the LAG (change detection) and LEAD (interval bounds) passes —
    Catalyst reuses the Exchange+Sort for both Window nodes since the
    specs are identical."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            F.col("event_type").alias("status"),
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_status"),
        )
        .filter(F.col("prev_status").isNull() | (F.col("prev_status") != F.col("status")))
    )
    return changes.select(
        "user_id",
        "status",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w).alias("effective_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# Point-in-time (temporal) join: reconstruct each entity's state at
# fixed snapshot instants from the SCD2 history — the feature-store /
# time-travel primitive ("what did the dimension say when X happened").
_PIT_SNAPSHOTS = (
    "2024-01-08 00:00:00",
    "2024-01-15 00:00:00",
    "2024-01-22 00:00:00",
    "2024-01-29 00:00:00",
)

_PIT_ORACLE = f"""
WITH {_SCD2_HIST_CTES},
probe AS (
    SELECT DISTINCT user_id, unnest([{", ".join(f"TIMESTAMP '{s}'" for s in _PIT_SNAPSHOTS)}]) AS snap_ts
    FROM events
)
SELECT p.user_id, p.snap_ts, h.status AS status_at_snapshot
FROM probe p JOIN hist h
  ON h.user_id = p.user_id
 AND h.effective_from <= p.snap_ts
 AND (h.effective_to IS NULL OR p.snap_ts < h.effective_to)
"""


@register("join_point_in_time", oracle=_PIT_ORACLE)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 history: for each user and
    each of the 4 snapshot instants (_PIT_SNAPSHOTS), the status valid THEN —
    exactly one history row matches per (user, snapshot) because SCD2
    intervals partition each key's timeline. This is the temporal-
    correctness primitive behind feature stores (no training-serving
    leakage: features as of label time) and warehouse time travel.

    Scale shape: the join is an EQUI join on the entity key — the
    interval predicate is a post-join filter, and the multiplication
    before it is bounded by versions-per-key (status change points),
    not by rows. One shuffle each side on user_id; the snapshot spine
    is a constant-size explode on the probe. If versions-per-key were
    unbounded (sensor-grade churn), the fix is the coarsened-interval
    bucketing of join_range_bucketed on top of the same key equi-join."""
    hist = cdc_scd2_build(spark, sf_dir).select(
        "user_id", "status", "effective_from", "effective_to"
    )
    probe = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.array(*[F.lit(s).cast("timestamp") for s in _PIT_SNAPSHOTS])
            ).alias("snap_ts"),
        )
    )
    return (
        probe.join(hist, "user_id")
        .filter(
            (F.col("effective_from") <= F.col("snap_ts"))
            & (F.col("effective_to").isNull() | (F.col("snap_ts") < F.col("effective_to")))
        )
        .select("user_id", "snap_ts", F.col("status").alias("status_at_snapshot"))
    )
