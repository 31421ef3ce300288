"""Window-function operators (SURVEY.md §2.B5).

The reference's per-shard sequence ordering (KinesisSync.java:118-122)
generalizes to `Window.partitionBy(key).orderBy(time)` — the same
"ordered within a partition key" contract Kinesis gives per shard.

Determinism discipline: every ORDER BY includes unique tie-break columns
so row_number/ntile/lag pick identical rows in both engines. Windowed
float sums use the decimal pattern (numerics.py) because engines may
accumulate frames differently (running sum vs segment tree).

Scale notes: a window over partitionBy(k).orderBy(t) is one hash shuffle
on k + per-partition sort — the same cost shape as a grouped agg. Frames
evaluate incrementally; no per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.numerics import dsum, dsum_over
from kinesis_datastore_app_spark.registry import register

_RANK_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile
FROM lineitem
WHERE l_orderkey % 10 = 0
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
"""


@register("win_rank", oracle=_RANK_ORACLE)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a totally ordered window."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


_ANALYTIC_ORACLE = """
SELECT event_id, user_id, ts, value,
       lag(value, 1) OVER w AS prev_value,
       lead(event_type, 1) OVER w AS next_type,
       first_value(ts) OVER w AS first_ts,
       lag(value, 2, -1.0) OVER w AS prev2_or_default
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("win_analytic", oracle=_ANALYTIC_ORACLE)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value — per-key sequential context, the engine-side
    analog of walking a shard in sequence order (A12)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.first("ts").over(w).alias("first_ts"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


_FRAME_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(sum(CAST(value AS DECIMAL(38,2))) OVER running AS DOUBLE)
         AS running_sum,
       CAST(sum(CAST(value AS DECIMAL(38,2))) OVER sliding AS DOUBLE)
         / count(*) OVER sliding AS moving_avg3,
       count(*) OVER running AS n_so_far
FROM events
WINDOW running AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       sliding AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@register("win_frame", oracle=_FRAME_ORACLE)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and sliding frames (exact-decimal accumulations)."""
    e = table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = base.rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        dsum_over("value", running).alias("running_sum"),
        (dsum_over("value", sliding) / F.count(F.lit(1)).over(sliding)).alias(
            "moving_avg3"
        ),
        F.count(F.lit(1)).over(running).alias("n_so_far"),
    )


_TOPK_ORACLE = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal
FROM customer
QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey) <= 3
"""


@register("topk_per_group", oracle=_TOPK_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key: row_number + filter. At scale Spark pushes the rank
    filter into the sort (WindowGroupLimit) so each partition keeps only
    k rows per key instead of fully sorting."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
    )


_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
"""


@register("win_sessionize", oracle=_SESSIONIZE_ORACLE)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the lag→gap-flag→cumsum idiom (the batch
    twin of stream_session's session_window; same oracle family). One
    shuffle on user_id serves both windows and the final aggregation —
    Spark reuses the partitioning, so sessionizing 100 TB of events costs
    a single exchange plus per-partition sorts. event_id tie-break keeps
    the lag/cumsum ordering total (the file-wide determinism rule);
    tied rows have gap 0 and so land in one session either way."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 600_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_seq", F.sum("new_session").over(w))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events")
    )


_PCTRANK_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cdist
FROM orders
WHERE o_orderkey % 20 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("win_percent_rank", oracle=_PCTRANK_ORACLE)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows≤current / n). Both are exact rational divisions of
    identical integer operands in either engine, so the doubles agree
    bit-for-bit without rounding. Unique tie-break (o_orderkey) keeps the
    rank assignment total. Same one-shuffle cost shape as win_rank."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


_RANGE_INTERVAL_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS sum_1h,
       COUNT(*) OVER w AS n_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@register("win_range_interval", oracle=_RANGE_INTERVAL_ORACLE)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time range frame: per-user trailing 1-hour sum/count — the
    time-series moving aggregate (value-based RANGE frame, not row
    count). Spark's rangeBetween needs a numeric ordering key, so the
    frame orders by unix_micros(ts) with a -3.6e9 µs lower bound —
    exactly DuckDB's RANGE BETWEEN INTERVAL 1 HOUR PRECEDING (both
    bounds inclusive, peers included). The frame sum is decimal-cast
    (numerics.py) because engines may accumulate frames differently.
    One shuffle on user_id + per-partition sort; frame evaluation is
    incremental (sliding accumulator), no per-row rescan."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        dsum_over("value", w).alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


_LOCF_ORACLE = """
WITH gappy AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, user_id, ts, v,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
       first_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
FROM gappy
"""


@register("win_locf", oracle=_LOCF_ORACLE)
def win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by observation carry: forward fill (LOCF — last
    observation carried forward) and backward fill via IGNORE NULLS
    window frames, the standard sensor/time-series repair step before
    resampling. Nulls are synthesized deterministically (event_id % 7)
    since the fixture has none. Values are carried, never combined, so
    the result is float-exact with no rounding discipline needed. Same
    one-shuffle-plus-sort cost shape as any keyed window; both fills
    share the (user_id, ts) sort so Spark evaluates them in one Window
    node per frame direction."""
    e = table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    )
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fwd = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "v",
        F.last("v", ignorenulls=True).over(fwd).alias("v_ffill"),
        F.first("v", ignorenulls=True).over(bwd).alias("v_bfill"),
    )


_NTILE_ORACLE = """
SELECT event_id,
       event_type,
       value,
       CAST(ntile(4) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS INT) AS quartile
FROM events
"""


@register("win_ntile", oracle=_NTILE_ORACLE)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quantile bucketing: assign each row its within-group
    quartile — the curriculum/difficulty-bucketing primitive (split a
    corpus into quality tiers before mixing). Deterministic because the
    ordering is total (value, event_id); both engines share NTILE's
    equal-fill semantics (remainder rows go to the leading buckets).

    Scale note: PARTITION BY keeps each sort keyed (one task per group,
    parallel across groups). A GLOBAL ntile would funnel the table
    through one partition — at 100 TB the right shape for global
    bucketing is two-pass: approx_percentile cut points (sketch, one
    scan), broadcast them, then a codegen CASE assigns buckets in the
    second scan (the shape agg_histogram uses)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


_GAPS_ISLANDS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS island
    FROM events
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS streak_len,
       MIN(ts) AS streak_start,
       MAX(ts) AS streak_end
FROM seq
GROUP BY user_id, event_type, island
HAVING COUNT(*) >= 3
"""


@register("win_gaps_islands", oracle=_GAPS_ISLANDS_ORACLE)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: find runs of >= 3 consecutive same-type events
    per user (the behavioral-streak primitive — retention runs, error
    bursts, session-like repetition). The classic difference-of-
    row-numbers trick assigns a stable island id with two window passes;
    both windows hash-partition on user_id, so Catalyst plans ONE
    Exchange and two Sorts (the second adds event_type to the sort key,
    no reshuffle), then the island rollup is a grouped aggregate whose
    key already contains user_id — AQE coalesces it onto the same
    partitioning. Total cost at 100 TB: one shuffle of the fact, same
    as any keyed window."""
    e = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    return (
        seq.groupBy("user_id", "event_type", "island")
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min("ts").alias("streak_start"),
            F.max("ts").alias("streak_end"),
        )
        .filter(F.col("streak_len") >= 3)
        .drop("island")
    )


# Rolling z-score: per-series trailing-window anomaly flag (the moving
# sibling of dq_anomaly_detect's global z-score). Frame sums are exact
# decimals; the gate compares the raw double z so both engines agree.
_ROLL_N = 20
_ROLL_Z = 2.0

_ROLLING_Z_ORACLE = f"""
WITH s AS (
  SELECT event_id, user_id, ts, value,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,4))) OVER w AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ROLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
       round((value - s1 / n)
             / sqrt(greatest(s2 - s1 * s1 / n, 0) / (n - 1)), 6) AS z,
       abs((value - s1 / n)
           / sqrt(greatest(s2 - s1 * s1 / n, 0) / (n - 1))) > {_ROLL_Z} AS is_anomaly
FROM s
WHERE n >= {_ROLL_N}
"""


@register("win_rolling_zscore", oracle=_ROLLING_Z_ORACLE)
def win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{N}-observation z-score per series with an anomaly gate —
    streaming-style drift detection expressed as a batch window. One
    hash shuffle on user_id + per-partition sort; the three frame
    aggregates share the identical frame, so Spark evaluates them in a
    single WindowExec pass with incremental (slide-in/slide-out)
    accumulation — no per-row rescan of the frame. Rows before the
    window fills are excluded (n >= {N}) in both engines; sums are
    decimal-exact so the z formula sees identical inputs. The variance
    numerator is clamped at 0 (both engines): a zero-variance window can
    float 1 ulp negative, which Spark's sqrt turns into silent NaN but
    DuckDB's turns into a hard error — the clamp keeps the differential
    comparable instead of crashing the oracle."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_N - 1), 0)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = dsum_over("value", w)
    s2 = dsum_over(F.col("value") * F.col("value"), w, scale=4)
    z = (F.col("value") - s1 / n) / F.sqrt(
        F.greatest(s2 - s1 * s1 / n, F.lit(0.0)) / (n - 1)
    )
    return (
        e.select("event_id", "user_id", "ts", "value", n.alias("n"), z.alias("zr"))
        .filter(F.col("n") >= _ROLL_N)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("zr", 6).alias("z"),
            (F.abs(F.col("zr")) > _ROLL_Z).alias("is_anomaly"),
        )
    )


# Linearly-weighted moving average: weight 20..1 over the trailing 20
# observations. Frame-relative weights can't go in a frame SUM directly;
# the identity  sum_j (rn_j - (rn_t - W)) x_j = S(x*rn) - (rn_t - W) S(x)
# turns them into two plain (exact-decimal) frame sums — the standard
# cumulative trick, one WindowExec pass, incremental evaluation.
_WMA_W = 20

_WMA_ORACLE = f"""
WITH r AS (
  SELECT event_id, user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
s AS (
  SELECT event_id, user_id, ts, rn,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * rn AS DECIMAL(38,2))) OVER w AS DOUBLE) AS sr
  FROM r
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_WMA_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
       round((sr - (rn - {_WMA_W}) * s1) / {_WMA_W * (_WMA_W + 1) // 2}, 6)
         AS wma
FROM s WHERE n >= {_WMA_W}
"""


@register("win_wma", oracle=_WMA_ORACLE)
def win_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted moving average with linear decay (weight {W} for the
    current observation down to 1 for the oldest) — the recency-biased
    smoother between plain MA (win_range_interval) and EWMA. Weights
    depend on the distance from the current row, which a frame aggregate
    cannot see — so the query computes two weight-FREE frame sums, S(x)
    and S(x·rank), and recovers the weighted sum algebraically:
    Σ (rank_j - rank_t + {W})·x_j = S(x·rank) - (rank_t - {W})·S(x).
    Everything stays in one hash shuffle + one sort + one incremental
    WindowExec pass; both sums are exact decimals (rank is an exact
    integer), so the quotient is deterministic across engines."""
    e = table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = order.rowsBetween(-(_WMA_W - 1), 0)
    rn = F.row_number().over(order)
    base = e.select("event_id", "user_id", "ts", "value", rn.alias("rn"))
    # all frame aggregates share the ONE frame object so an edit can't
    # desynchronize them; rn >= W is exactly "the frame is full" (frame
    # row count = min(rn, W)), so no separate COUNT aggregate is needed
    s1 = dsum_over("value", frame)
    sr = dsum_over(F.col("value") * F.col("rn"), frame)
    denom = _WMA_W * (_WMA_W + 1) // 2
    return (
        base.select(
            "event_id",
            "user_id",
            "ts",
            "rn",
            s1.alias("s1"),
            sr.alias("sr"),
        )
        .filter(F.col("rn") >= _WMA_W)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(
                (F.col("sr") - (F.col("rn") - _WMA_W) * F.col("s1")) / denom, 6
            ).alias("wma"),
        )
    )


# Rolling median: exact order statistic over a bounded trailing frame —
# the robust smoother (outlier-immune, unlike mean-based win_wma).
_MED_W = 20

_MEDIAN_ORACLE = f"""
WITH s AS (
  SELECT event_id, user_id, ts,
         COUNT(*) OVER w AS n,
         list_sort(list(value) OVER w) AS arr
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_MED_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
       round((arr[{(_MED_W + 1) // 2}] + arr[{_MED_W // 2 + 1}]) / 2, 6) AS rolling_median
FROM s WHERE n >= {_MED_W}
"""


@register("win_median_rolling", oracle=_MEDIAN_ORACLE)
def win_median_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over the trailing {W} observations — the
    robust counterpart of win_wma (a single spike moves a mean, not a
    median). No native frame-median exists in either engine, so the
    frame materializes as a {W}-element array (collect_list over the
    frame — bounded, {W}·8 bytes per row) and the median reads the two
    middle order statistics. Same single shuffle + sort as every keyed
    window; the per-row sort is O(W log W) on a constant W. For large
    or unbounded frames the right tool is the mergeable quantile sketch
    (agg_quantile_sketch) instead."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_W - 1), 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.count(F.lit(1)).over(w)
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            n.alias("n"),
            arr.alias("arr"),
        )
        .filter(F.col("n") >= _MED_W)
        .select(
            "event_id",
            "user_id",
            "ts",
            # ((W+1)//2, W//2+1) are the two middle 1-based order stats
            # for even W and collapse to the same index for odd W, so
            # the formula stays correct if the _MED_W knob is retuned
            F.round(
                (
                    F.element_at("arr", (_MED_W + 1) // 2)
                    + F.element_at("arr", _MED_W // 2 + 1)
                )
                / 2,
                6,
            ).alias("rolling_median"),
        )
    )


# Running distinct count: "how many distinct event types has this user
# seen up to now" — COUNT(DISTINCT) OVER a running frame is unsupported
# in both engines; the first-occurrence-flag + running-sum identity
# computes it with two windows on one shuffle.
_CUMDIST_ORACLE = """
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id, ts, event_type,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_types_so_far
FROM flagged
"""


@register("win_cumulative_distinct", oracle=_CUMDIST_ORACLE)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct count per key — the engagement-breadth /
    catalog-coverage running metric. Neither engine supports
    COUNT(DISTINCT) OVER, so the plan marks each (user, type)'s first
    occurrence with a rank window and running-sums the flags: two
    windows whose partition keys share the user_id prefix → ONE hash
    exchange, two sorts. The identity is exact (a row is 'new' iff it
    is its group's first by the total order), no approximate state —
    contrast the streaming twin, which would hold a per-key set in the
    state store (stream_dedup's shape)."""
    e = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
    )


# Period-over-period change: daily totals with deltas and growth vs the
# previous day WITHIN each month (partitioned lag — the window key keeps
# the exchange bounded by the period domain; each month's first day has
# no baseline -> NULLs by construction).
_POP_ORACLE = """
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
)
SELECT month, day, CAST(n AS BIGINT) AS n, round(total, 2) AS total,
       round(total - lag(total) OVER w, 2) AS delta,
       round((total - lag(total) OVER w) / lag(total) OVER w, 9) AS growth
FROM daily
WINDOW w AS (PARTITION BY month ORDER BY day)
"""


@register("win_period_over_period", oracle=_POP_ORACLE)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day deltas and growth rates within each month — the BI
    trend readout. The lag window partitions on the month key, so the
    exchange after the (tiny) daily rollup is bounded by the period
    domain, and a month's opening day has a NULL baseline by
    construction. Daily totals are decimal-exact before the ratio, so
    deltas and growth agree across engines."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM").alias("month"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("total"),
    )
    w = Window.partitionBy("month").orderBy("day")
    prev = F.lag("total").over(w)
    return daily.select(
        "month",
        "day",
        "n",
        F.round("total", 2).alias("total"),
        F.round(F.col("total") - prev, 2).alias("delta"),
        F.round((F.col("total") - prev) / prev, 9).alias("growth"),
    )


# nth_value + first/last family over an explicit frame — completes the
# B5 positional-analytics set (win_analytic covers lag/lead/first).
_NTH_ORACLE = """
SELECT event_id, user_id, ts,
       nth_value(value, 2) OVER w AS second_value,
       first_value(value) OVER w AS first_value,
       last_value(value) OVER w AS latest_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("win_nth_value", oracle=_NTH_ORACLE)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional frame analytics: each user's second-ever observation
    (nth_value — NULL until the frame holds two rows), their first, and
    the running latest. The explicit running frame makes last_value
    well-defined (the default frame's last_value is the CURRENT row —
    a classic SQL trap both engines share). One exchange + sort, frame
    evaluation incremental."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("latest_value"),
    )


# Attribution window: purchases within one hour AFTER each click, same
# user — the click-credit primitive, expressed as a forward event-time
# RANGE frame with a conditional measure (no join, no row explosion).
_ATTR_WINDOW_US = 3_600_000_000

_ATTR_ORACLE = f"""
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w
           AS n_in_window
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN CURRENT ROW AND {_ATTR_WINDOW_US} FOLLOWING)
)
SELECT event_id, user_id, ts,
       CAST(n_in_window AS BIGINT) AS purchases_within_1h,
       n_in_window > 0 AS converted
FROM s WHERE event_type = 'click'
"""


@register("win_attribution_window", oracle=_ATTR_ORACLE)
def win_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase attribution: for every click, the number of
    same-user purchases in the following hour (and a converted flag).
    A forward event-time RANGE frame with a conditional SUM does this
    in ONE window pass — no self-join, no interval explosion; the
    classic join formulation multiplies clicks × purchases before
    filtering. Frame peers at the same microsecond are included both
    engines alike (RANGE bounds are value-inclusive). One user_id
    exchange + sort, incremental frame evaluation — attribution over
    100 TB costs what any keyed window costs."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(0, _ATTR_WINDOW_US)
    )
    s = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w)
        .alias("n_in_window"),
    )
    return s.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.col("n_in_window").alias("purchases_within_1h"),
        (F.col("n_in_window") > 0).alias("converted"),
    )
