"""Aggregation operators (SURVEY.md §2.B4) + the flagship query.

Covers: global agg, grouped hash agg (TPC-H Q1 shape), distinct agg,
approximate count-distinct, rollup/cube/grouping-sets, statistical aggs,
collect_list/set, and exact dedup (motivated by the reference's async
double-send, KinesisAsync.java:96-97 — every async-v2 trade is put twice,
so a consumer needs ``dropDuplicates`` to see the logical stream).

Scale notes: every query here is a single hash aggregate — Spark plans a
partial (map-side) aggregate before the shuffle, so the shuffle carries one
row per (partition, group), not per input row. Group-by keys are
low-cardinality fixture columns → no skew concern; AQE coalesces the
post-shuffle partitions. Float sums go through numerics.py for exact
order-independent results (same physical shape, still codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.numerics import davg, dsum, sql_davg, sql_dsum
from kinesis_datastore_app_spark.registry import register

# --------------------------------------------------------------------------
# Flagship (M0): scan → filter → project → group agg → sort in one query.
# --------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
SELECT date_trunc('hour', ts) AS hour_ts,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dsum("value")} AS sum_value,
       {sql_davg("value")} AS avg_value
FROM events
WHERE event_type = 'purchase'
GROUP BY 1, 2
"""


@register("agg_group_events", oracle=_FLAGSHIP_ORACLE)
def agg_group_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly purchase rollup over the stream-shaped ``events`` table.

    The batch analog of the reference's consume loop (KinesisSync.java:
    76-123): scan the stream from the beginning, project, and summarize —
    generalized to a keyed time-bucket aggregation.
    """
    events = table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
            davg("value").alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# B4 inventory
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag,
       l_linestatus,
       {sql_dsum("l_quantity")} AS sum_qty,
       {sql_dsum("l_extendedprice")} AS sum_base_price,
       {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       {sql_davg("l_quantity")} AS avg_qty,
       {sql_davg("l_extendedprice")} AS avg_price,
       {sql_davg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_group", oracle=_Q1_ORACLE)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final hash aggregate."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_GLOBAL_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum("l_quantity")} AS sum_qty,
       {sql_davg("l_extendedprice")} AS avg_price,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
"""


@register("agg_global", oracle=_GLOBAL_ORACLE)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — one-row summary of the fact table."""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_dist_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_distinct", oracle=_DISTINCT_ORACLE)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (expand + two-phase agg under the hood)."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(38,2)"))
        .cast("double")
        .alias("sum_dist_qty"),
    )


_APPROX_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS orders_in_bounds,
       TRUE AS parts_in_bounds
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_approx", oracle=_APPROX_ORACLE)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct: the 100 TB-scale substitute for exact
    COUNT(DISTINCT) (no expand, constant memory per group).

    Driver-checkable form: the query outputs the EXACT distinct counts
    plus a boolean asserting the HLL++ estimate lands within 5× the
    configured rsd (0.02 → ±10%); the oracle computes the same exact
    counts with literal TRUE. The hash match therefore both verifies the
    exact aggregation AND asserts the sketch's accuracy bound —
    deterministic because HLL++ is hash-based (same input → same
    estimate, independent of partitioning)."""
    l = table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("a_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )

    def in_bounds(approx: str, exact: str):
        err = F.abs(F.col(approx).cast("double") - F.col(exact)) / F.col(exact)
        return err <= 0.10

    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        in_bounds("a_orders", "exact_orders").alias("orders_in_bounds"),
        in_bounds("a_parts", "exact_parts").alias("parts_in_bounds"),
    )


_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {sql_dsum("l_quantity")} AS sum_qty,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one pass (expand + single agg)."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )


_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {sql_dsum("l_extendedprice")} AS sum_price,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations."""
    l = table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("sum_price"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )


_GSETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("agg_gsets", oracle=_GSETS_ORACLE)
def agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL. Namespaced view (round-10
    review): the old bare name "orders" persisted session-globally at
    whatever sf_dir ran last — any later SQL text saying `orders` would
    silently resolve to that stale vintage instead of erroring."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("gsets_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# Statistical aggregates, computed from exact decimal power sums so both
# engines run the identical double formula on identical inputs (built-in
# stddev/corr are float-order-dependent and would flake the value hash —
# the built-ins are exercised in tests/ instead, against these as oracle).
_STATS_ORACLE = f"""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {sql_dsum("l_quantity")} AS sx,
         {sql_dsum("l_quantity * l_quantity", 4)} AS sxx,
         {sql_dsum("l_extendedprice")} AS sy,
         {sql_dsum("l_extendedprice * l_extendedprice", 4)} AS syy,
         {sql_dsum("l_quantity * l_extendedprice", 4)} AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       round((sxx - sx * sx / n) / (n - 1), 9) AS var_qty,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 9) AS stddev_qty,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS corr_qty_price
FROM s
"""


@register("agg_stats", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation per group (exact-sum formulation)."""
    l = table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q).alias("sx"),
        dsum(q * q, 4).alias("sxx"),
        dsum(p).alias("sy"),
        dsum(p * p, 4).alias("syy"),
        dsum(q * p, 4).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    # final formula in double, rounded to 9 decimals: the exact decimal sums
    # make inputs identical across engines, and rounding absorbs the ≤1-ulp
    # divergence from differing float expression contraction (e.g. FMA).
    return s.select(
        "l_returnflag",
        F.round((sxx - sx * sx / n) / (n - 1), 9).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 9).alias("stddev_qty"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            9,
        ).alias("corr_qty_price"),
    )


_COLLECT_ORACLE = """
SELECT event_type,
       array_to_string(list_sort(list(DISTINCT CAST(user_id AS VARCHAR))), ',')
         AS users_csv,
       COUNT(*) AS n
FROM events
WHERE user_id % 29 = 0
GROUP BY event_type
"""


@register("agg_collect", oracle=_COLLECT_ORACLE)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set (sorted, stringified for deterministic comparison)."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("user_id") % 29 == 0)
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set(F.col("user_id").cast("string"))), ","
            ).alias("users_csv"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_EVENT_COLS = "event_id, ts, user_id, event_type, value, props"

_DEDUP_ORACLE = f"""
SELECT DISTINCT {_EVENT_COLS}
FROM (SELECT {_EVENT_COLS} FROM events
      UNION ALL
      SELECT {_EVENT_COLS} FROM events)
"""


@register("dedup_exact", oracle=_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact keyed dedup of a doubled stream.

    Models the reference's async double-send (KinesisAsync.java:96-97 puts
    every trade twice with the same id): replay the events table twice and
    drop whole-row duplicates — the exact mirror of the oracle's row-level
    DISTINCT, with no reliance on event_id uniqueness in the base table
    (id-keyed dedup would keep a nondeterministic row if an id were ever
    reused with a different payload; the id-keyed form is stream_dedup's
    job, where per-key state is the point). One hash shuffle on the row.
    """
    e = table(spark, sf_dir, "events").select(*[c.strip() for c in _EVENT_COLS.split(",")])
    return e.unionAll(e).dropDuplicates()


_MINMAX_BY_ORACLE = """
SELECT c_nationkey,
       max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000000 + c_custkey) AS richest,
       min_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000000 + c_custkey) AS poorest,
       max(c_acctbal) AS max_bal
FROM customer
GROUP BY c_nationkey
"""


@register("agg_minmax_by", oracle=_MINMAX_BY_ORACLE)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by/min_by): the single-pass answer to
    'top row per group' when only one column is needed — no window, no
    self-join, partial-aggregatable so the shuffle carries one candidate
    per (task, group). Ties in the raw ordering value are broken by
    folding the unique key into integer cents (ord = cents·10¹⁰ +
    custkey — the 10¹⁰ spacing keeps the composite order correct up to
    10 billion customers, ~SF 10⁵, without overflowing BIGINT),
    making the argmax deterministic across engines and partitionings."""
    c = table(spark, sf_dir, "customer")
    from kinesis_datastore_app_spark.numerics import cents

    ord_ = cents("c_acctbal") * 10000000000 + F.col("c_custkey")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", ord_).alias("richest"),
        F.min_by("c_name", ord_).alias("poorest"),
        F.max("c_acctbal").alias("max_bal"),
    )


_SKETCH_HLL_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bounds
FROM events
GROUP BY event_type
"""


@register("agg_sketch_hll", oracle=_SKETCH_HLL_ORACLE)
def agg_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): build
    one sketch per (event_type, day), then hll_union_agg merges the
    partials into per-type estimates. Mergeability is the 100 TB point —
    daily sketches of a few KB union across any partitioning/retention
    window without re-reading data, vs an exact COUNT(DISTINCT) whose
    shuffle carries every distinct key. (approx_count_distinct's HLL++ is
    the one-shot variant, registered as agg_approx.)

    Driver-checkable form: exact per-type distinct count + a boolean that
    the daily-sketch-union estimate is within ±10% (default lgConfigK=12
    → rsd ≈ 1.6%, so the bound has huge margin and the boolean is stable);
    oracle = exact count + literal TRUE. Both sides of the verify join
    are tiny aggregated frames (one row per event_type) → broadcast."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    err = (
        F.abs(F.col("approx_users").cast("double") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "exact_users",
        (err <= 0.10).alias("within_bounds"),
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(floor(value / 25) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       min(value) AS lo,
       max(value) AS hi
FROM events
GROUP BY 1
"""


@register("agg_histogram", oracle=_HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(value/width) then count —
    one partial+final aggregation, shuffle cost = number of buckets, the
    constant-memory way to profile a 100 TB column's distribution (vs
    exact percentiles, which hold whole groups)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 25).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


_INCR_ROLLUP_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum("value")} AS total_value
FROM events
GROUP BY event_type
"""


@register("agg_incremental_rollup", oracle=_INCR_ROLLUP_ORACLE)
def agg_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern: maintain per-(day, key) PARTIAL
    aggregates as a materialized rollup table, answer coarser queries by
    MERGING partials instead of rescanning raw events. The oracle is the
    direct aggregation over raw data — equality proves the partials are
    lossless (counts and exact-decimal sums are associative; avg/stddev
    would be carried as (sum, count)/(sum, sum², count)). At 100 TB this
    turns a daily full scan into an incremental append of yesterday's
    partials + a merge that reads KB-scale rollups.

    The rollup table goes through published_parquet (round-10 review:
    the old bare mode-overwrite write to a shared scratch path deleted
    the dir under any concurrent session's in-flight read and re-derived
    identical partials on every call — the exact classes
    atomic_publish_dir and the fingerprint memo exist for)."""
    from kinesis_datastore_app_spark.catalog import published_parquet

    e = table(spark, sf_dir, "events")
    partials = published_parquet(
        spark,
        sf_dir,
        "rollup_daily_v2",
        lambda: e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,2)")).alias("sum_value"),
        ),
        src_table="events",
        reap_family="rollup_daily",
    )
    return partials.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.sum("sum_value").cast("double").alias("total_value"),
    )


_GAPFILL_ORACLE = f"""
WITH spine AS (
  SELECT CAST(g AS DATE) AS d
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) t(g)
),
daily AS (
  SELECT CAST(ts AS DATE) AS d,
         COUNT(*) AS n_purchases,
         {sql_dsum("value")} AS sum_value
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1
)
SELECT strftime(spine.d, '%Y-%m-%d') AS day,
       coalesce(n_purchases, 0) AS n_purchases,
       coalesce(sum_value, 0.0) AS sum_value
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


@register("agg_gapfill_daily", oracle=_GAPFILL_ORACLE)
def agg_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily rollup: a constant date spine (sequence+explode)
    left-joined to the per-day aggregate so empty days surface as zero
    rows — the time-series resampling idiom (hypertable-style rollup).
    The spine is tiny → broadcast to the agg side; the aggregate itself
    is one map-side-combined shuffle on day. Day rendered as an ISO
    string (oracle discipline: no DATE in output)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum("value").alias("sum_value"),
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("2024-01-01")),
                F.to_date(F.lit("2024-01-30")),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    return spine.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


_HEAVY_ORACLE = """
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_events
  FROM events
  GROUP BY user_id
),
ranked AS (
  SELECT user_id, n_events,
         row_number() OVER (ORDER BY n_events DESC, user_id) AS rn
  FROM counts
)
SELECT user_id, n_events, rn FROM ranked WHERE rn <= 20
"""


@register("agg_heavy_hitters", oracle=_HEAVY_ORACLE)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: global top-20 keys by frequency with a
    tie-free total order (count desc, then key). Plan shape: map-side
    partial count → one shuffle on user_id → a single-partition top-k
    (TakeOrderedAndProject on the tiny aggregated set) — never a global
    sort of raw events. The approximate twin is DataFrame.freqItems
    (lossy-counting sketch, one pass, no shuffle of distinct keys);
    tests assert its superset guarantee against this exact top-k."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    # orderBy().limit() plans as TakeOrderedAndProject: each task keeps a
    # 20-row heap, the driver merges top-20s — no global sort, and
    # crucially no single-partition window over ALL per-user counts
    # (billions of rows at 100 TB). The rank is derived afterwards over
    # the 20-row result, where a single partition is the point.
    top = counts.orderBy(F.col("n_events").desc(), "user_id").limit(20)
    w = Window.orderBy(F.col("n_events").desc(), "user_id")
    return top.withColumn("rn", F.row_number().over(w)).select(
        "user_id", "n_events", "rn"
    )


_FILTERED_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
       COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_revenue
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_filtered", oracle=_FILTERED_ORACLE)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) aggregates: several differently-
    filtered measures in ONE pass over the fact table — the idiom that
    replaces N filtered scans with one scan + N conditional aggregates.
    Spark expresses FILTER as sum/count over when(cond, x) (nulls are
    ignored by aggregates, so semantics match SQL FILTER exactly,
    including the empty-set → NULL sum). Same partial-agg shuffle shape
    as agg_group."""
    l = table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(disc, 1)).alias("n_disc"),
        F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("n_bulk"),
        F.sum(F.when(disc, F.col("l_extendedprice")).cast("decimal(38,2)"))
        .cast("double")
        .alias("disc_revenue"),
    )


_STRING_SEQ_ORACLE = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY event_id) AS journey,
       COUNT(*) AS n_events
FROM events WHERE user_id % 7 = 0
GROUP BY user_id
"""


@register("agg_string_sequence", oracle=_STRING_SEQ_ORACLE)
def agg_string_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL LISTAGG / string_agg ORDER BY):
    reconstructs each user's event-type journey in event order — the
    behavioral-analytics path query. Spark has no ordered string_agg, so
    the idiom is collect_list of (order_key, value) structs → array_sort
    (lexicographic on the leading unique key) → transform + array_join;
    all JVM expressions after one grouped shuffle, and the partial-agg
    lists stay bounded by events-per-user. The order key (event_id) is
    unique, so both engines produce the identical concatenation."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("event_id"), F.col("event_type")))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("journey"),
        F.count(F.lit(1)).alias("n_events"),
    )


_BOOL_ORACLE = """
SELECT l_returnflag,
       bool_and(l_quantity > 0) AS all_positive_qty,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       bool_and(l_shipdate IS NOT NULL) AS all_shipped,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.09) AS BIGINT) AS n_deep
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_bool", oracle=_BOOL_ORACLE)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (SQL EVERY/ANY): per-group assertion checks —
    the aggregate form of a data-quality gate (dq_constraint_check is
    the row-level form). bool_and/bool_or short-circuit in the partial
    aggregate, so a violated assertion costs one scan with early-out
    per partition; same partial-agg shuffle shape as any grouped agg."""
    l = table(spark, sf_dir, "lineitem")
    deep = F.col("l_discount") > 0.09
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(deep).alias("any_deep_discount"),
        F.bool_and(F.col("l_shipdate").isNotNull()).alias("all_shipped"),
        F.count(F.when(deep, 1)).alias("n_deep"),
    )


_QSKETCH_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(quantile_cont(l_quantity, 0.50), 9) AS exact_p50,
       round(quantile_cont(l_quantity, 0.95), 9) AS exact_p95,
       TRUE AS p50_in_bounds,
       TRUE AS p95_in_bounds
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_quantile_sketch", oracle=_QSKETCH_ORACLE)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch with an in-query accuracy assertion —
    the 100 TB percentile path. ``approx_percentile`` builds a
    Greenwald-Khanna summary per partition and merges them (map-side
    partials, bounded memory, one shuffle of sketches — never of rows);
    exact ``percentile`` materializes every group value into the
    aggregation buffer and exists here only as the verifier.

    Driver-checkable by the same pattern as agg_approx: the query emits
    the EXACT interpolated quantiles plus booleans asserting the sketch
    lands within the rank-error guarantee (eps = 1/accuracy; the value
    at the approximated rank must sit between the exact quantiles at
    p +/- 2*eps), and the oracle pins the exact values and literal TRUE.
    The sketch's merge order varies with partitioning, so its raw output
    is NOT hash-stable — the bounds boolean is, which is exactly why the
    assertion ships instead of the estimate."""
    l = table(spark, sf_dir, "lineitem")
    eps = 2.0 / 1000.0
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("approx_percentile(l_quantity, 0.50, 1000)").alias("a50"),
        F.expr("approx_percentile(l_quantity, 0.95, 1000)").alias("a95"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 9).alias("exact_p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 9).alias("exact_p95"),
        F.expr(f"percentile(l_quantity, {0.50 - eps})").alias("lo50"),
        F.expr(f"percentile(l_quantity, {0.50 + eps})").alias("hi50"),
        F.expr(f"percentile(l_quantity, {0.95 - eps})").alias("lo95"),
        F.expr(f"percentile(l_quantity, {min(0.95 + eps, 1.0)})").alias("hi95"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        "exact_p50",
        "exact_p95",
        F.col("a50").between(F.col("lo50"), F.col("hi50")).alias("p50_in_bounds"),
        F.col("a95").between(F.col("lo95"), F.col("hi95")).alias("p95_in_bounds"),
    )


_CMS_W, _CMS_D = 1024, 4  # width/depth: eps = e/W ~ 0.0027, delta = e^-D

_CMS_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS exact_n,
       TRUE AS est_ge_exact,
       TRUE AS est_within_eps
FROM events
GROUP BY user_id
ORDER BY exact_n DESC, user_id
LIMIT 20
"""


@register("agg_count_min", oracle=_CMS_ORACLE)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, fully distributed: hash
    every row into D=4 rows of a W=1024-counter grid (explode + one
    grouped count — the sketch is BUILT with one shuffle of (d,bucket)
    pairs, never of keys), then answer point queries by taking the MIN
    over each key's D buckets. The materialized sketch is D*W = 4096
    rows regardless of input size, so the query-side join is a broadcast
    — at 100 TB the sketch still fits in L2 cache.

    Driver-checkable by the agg_approx pattern: emits the exact top-20
    key counts plus the CMS guarantees as booleans — est >= exact
    (structural: every occurrence lands in all D counters) and
    est <= exact + eps*N with eps = e/W (holds w.p. 1-e^-D; determinis-
    tic here because xxhash64 is a fixed function of the data). Oracle
    pins the exact counts and literal TRUE.

    The per-key count table (the sketch's input, and at scale the
    expensive part) is materialized to scratch parquet ONCE and every
    downstream reference — grid build, probes, stream length — reads it
    back, so the raw input is scanned exactly once. Re-deriving each
    reference from the scan would triple the input cost at 100 TB
    (Spark does not share common subplans across one query tree); the
    sketch is an index: build once, probe many times. CMS additivity
    makes grid-from-key-counts equivalent to grid-from-rows."""
    import math

    from kinesis_datastore_app_spark.catalog import published_parquet

    e = table(spark, sf_dir, "events")

    # pmod, not abs(...)%W: abs(Long.MIN_VALUE) overflows bigint (an
    # ANSI-mode abort if xxhash64 ever lands there); pmod is total and
    # identical for every other input
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col("user_id"), F.lit(d)), F.lit(_CMS_W)).alias(
                    "bkt"
                ),
            )
            for d in range(_CMS_D)
        ]
    )
    # published_parquet, not a bare overwrite to a shared scratch path
    # (round-10 review: concurrent-session clobber + rebuild-per-call)
    exact = published_parquet(
        spark,
        sf_dir,
        "cms_key_counts_v2",
        lambda: e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n")),
        src_table="events",
        reap_family="cms_key_counts",
    )
    # grid counts via CMS additivity: sum per-key counts into cells —
    # identical to counting raw rows, but reads the materialized key
    # table instead of re-scanning the input
    sketch = (
        exact.select(F.col("exact_n"), F.explode(cells).alias("c"))
        .groupBy("c.d", "c.bkt")
        .agg(F.sum("exact_n").alias("cnt"))
    )
    probes = exact.select(
        "user_id", "exact_n", F.explode(cells).alias("c")
    ).select("user_id", "exact_n", "c.d", "c.bkt")
    est = (
        probes.join(F.broadcast(sketch), ["d", "bkt"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("est"))
    )
    # N for the eps*N bound comes from the sketch itself (any one depth
    # row sums to the stream length) — no second pass over the input.
    n_total = F.broadcast(
        sketch.filter(F.col("d") == 0).agg(F.sum("cnt").alias("n_total"))
    )
    # The oracle pins est_within_eps as literal TRUE, but the eps*N CMS
    # guarantee is probabilistic (holds w.p. 1-e^-D per key for a random
    # hash; xxhash64 is one fixed draw). The check uses 2*eps*N so the
    # pinned TRUE has real margin: a fixture/seed or scale-factor change
    # can't legitimately flip the boolean without an actual code bug.
    # (Same fixture-dependence note applies to the ±10% HLL booleans in
    # agg_approx / agg_sketch_hll.)
    return (
        est.crossJoin(n_total)
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
        .select(
            "user_id",
            "exact_n",
            (F.col("est") >= F.col("exact_n")).alias("est_ge_exact"),
            (
                F.col("est")
                <= F.col("exact_n")
                + F.lit(2 * math.e / _CMS_W) * F.col("n_total")
            ).alias("est_within_eps"),
        )
    )


_MODE_ORACLE = """
WITH counts AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_type, n
FROM counts
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) = 1
"""


@register("agg_mode", oracle=_MODE_ORACLE)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (each user's most frequent event type)
    as two aggregations over ONE shuffle spine: count per (user, type),
    then max_by with an explicit (count DESC, type ASC) struct ordering —
    ties break deterministically, which engine-native mode() functions
    don't promise (why the oracle uses a window, not DuckDB's mode()).
    Both aggs partial-aggregate map-side; the second one's key is a
    prefix of the first's, so AQE keeps it on the same partitioning.
    The per-key-frequency shape is the same state CMS approximates when
    exact counting stops fitting (agg_count_min)."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.groupBy("user_id").agg(
        F.min_by(
            F.struct(
                F.col("event_type").alias("mode_type"), F.col("n").alias("n")
            ),
            # min over (-n, type): highest count first, then lexicographic
            F.struct(-F.col("n"), F.col("event_type")),
        ).alias("m")
    ).select("user_id", "m.mode_type", "m.n")


# Simple linear regression per group, from exact decimal power sums (the
# regression sibling of agg_stats' variance/correlation). Components are
# cast to double INSIDE the final formula in both engines: the sums are
# exactly representable (< 2^53) at every tested SF, and at 100 TB the
# bigint power sums would overflow int64 while the double formula only
# loses ulps that the 9-dp rounding absorbs.
_LINREG_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(k) AS sx,
         SUM(k * k) AS sxx,
         {sql_dsum("value")} AS sy,
         {sql_dsum("value * value", 4)} AS syy,
         {sql_dsum("k * value", 2)} AS sxy
  FROM (SELECT event_type, value,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events)
  WHERE k IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS slope,
       round((sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 9) AS intercept,
       round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS r2
FROM s
"""


@register("agg_linreg", oracle=_LINREG_ORACLE)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit of value against the JSON
    payload integer k: slope, intercept, R² per event_type — the trend
    primitive (metric drift per feature bucket) that built-in
    regr_slope/regr_r2 compute float-order-dependently. Same scale shape
    as agg_stats: one partial-aggregated shuffle carrying six power sums
    per group, formula evaluated once per group row. The JSON extraction
    is codegen (GetJsonObject) and feeds the aggregate directly — no
    intermediate materialization."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        # try_cast: ANSI-mode Spark throws on malformed string casts; a
        # non-numeric $.k must become NULL, not error
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k"),
    )
    k, v = F.col("k"), F.col("value")
    # complete pairs only (round-10 review): without this filter a NULL k
    # row is skipped by sx/sxx/sxy but still counted in n and summed into
    # sy/syy — OLS over mismatched populations, silently wrong on any
    # data with missing k (the fixture has none, so the oracle twin hid
    # it). Both engines filter identically.
    e = e.filter(k.isNotNull())
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sx"),
        F.sum(k * k).alias("sxx"),
        dsum(v).alias("sy"),
        dsum(v * v, 4).alias("syy"),
        dsum(k * v, 2).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num / den
    return s.select(
        "event_type",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"),
        F.round((num * num) / (den * (n * syy - sy * sy)), 9).alias("r2"),
    )


# Shannon entropy of each user's event-type mix — the data-diversity /
# behavioral-spread metric (a training-data pipeline uses the identical
# aggregation for per-source token-distribution diversity). Identity
# H = log2(n) - (Σ c·log2 c)/n needs ONE log per (user,type) row; each
# term is pinned to 9 dp then exact-decimal-summed (≤ |event types|
# terms) so the sum is order-independent; final 6-dp round absorbs the
# engines' log2 ulp differences.
_ENTROPY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS INT) AS n_types,
       round(log2(SUM(c))
             - CAST(SUM(CAST(round(c * log2(c), 9) AS DECIMAL(38,12)))
                    AS DOUBLE) / SUM(c), 6) AS entropy_bits
FROM c
GROUP BY user_id
"""


@register("agg_entropy", oracle=_ENTROPY_ORACLE)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy (bits) of the event-type distribution.
    Two aggregations over one shuffle spine (groupBy(user,type) then
    groupBy(user) — the second key is a prefix of the first, so AQE
    keeps the partitioning; same shape as agg_mode). Both levels
    partial-aggregate map-side: the shuffle carries one row per
    (partition, user, type), never per event — at 100 TB the exchange is
    bounded by |users|×|types|, not |events|."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    cc = F.col("c")
    return c.groupBy("user_id").agg(
        F.sum(cc).alias("n_events"),
        F.count(F.lit(1)).cast("int").alias("n_types"),
        F.round(
            F.log2(F.sum(cc))
            - F.sum(F.round(cc * F.log2(cc), 9).cast("decimal(38,12)")).cast(
                "double"
            )
            / F.sum(cc),
            6,
        ).alias("entropy_bits"),
    )


# Bitmap-based exact distinct: pack each key into a bit of a per-word
# bitmap, OR the bitmaps, popcount the result. The oracle computes the
# same quantity with a plain COUNT(DISTINCT) — two independent
# algorithms agreeing is the strongest equivalence check the harness
# can express. Bits 0..59 per 64-bit word keep every shift in the
# portable range for both engines.
_BITMAP_WORD = 60

_BITMAP_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id // 60) AS BIGINT) AS n_words,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events
GROUP BY event_type
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) via OR-aggregated bitmaps — the mergeable
    exact-distinct structure (the exact counterpart of agg_sketch_hll's
    HLL): key k sets bit k%60 of word k/60; bit_or is associative and
    commutative, so partial aggregation works map-side like any sum, and
    the final popcount rollup touches |words| rows, not |rows|.

    Why it matters at 100 TB: a naive COUNT(DISTINCT key) plans an
    Expand + re-shuffle of every row; the bitmap form ships one 8-byte
    word per (group, word-id) per partition. For dense integer key
    domains this is the exact-answer path that scales; sparse/huge
    domains step down to HLL (agg_sketch_hll) or roaring-style chunked
    bitmaps (same word-id grouping, compressed words). The oracle
    cross-checks with a plain COUNT(DISTINCT) — two independent
    algorithms, one answer."""
    e = table(spark, sf_dir, "events")
    words = (
        e.select(
            "event_type",
            F.expr(f"user_id div {_BITMAP_WORD}").alias("word_id"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BITMAP_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word_id")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    return words.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.bit_count("word")).alias("n_distinct_users"),
    )


# Cohort retention: users grouped by first-activity day, activity counted
# per (cohort, day-offset) — the product-analytics matrix, and the same
# shape as "documents grouped by ingest batch, reuse counted per batch
# offset" in a data-curation audit.
_RETENTION_ORACLE = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', f.cohort_day, a.day) AS INT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN first_day f ON a.user_id = f.user_id
GROUP BY f.cohort_day, day_offset
"""


@register("agg_retention_cohort", oracle=_RETENTION_ORACLE)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: for each first-seen day (cohort), how
    many of its users were active again N days later. Three keyed steps
    — min-day per user, distinct (user, day), join + rollup — and all
    three hash on user_id, so Catalyst plans ONE exchange spine and AQE
    keeps the join co-partitioned; the final (cohort, offset) aggregate
    is a tiny second shuffle bounded by days², not rows. All arithmetic
    is date/integer — nothing to pin."""
    e = table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# First-order transition matrix over per-user event sequences — the
# sequence statistic behind behavior modeling and next-event prediction
# baselines (and the event-stream analog of a bigram LM).
_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY prev_type)
SELECT c.prev_type, c.event_type, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / t.tot, 9) AS p
FROM c JOIN t USING (prev_type)
"""


@register("agg_markov_transitions", oracle=_MARKOV_ORACLE)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: P(next | current) from each user's
    time-ordered event sequence. One shuffle on user_id for the LAG
    pass, then a grouped count whose key domain is |types|² — the
    second aggregation and the per-row-total join run on a handful of
    rows. Probabilities are exact integer ratios rounded once. The
    same plan yields bigram statistics over any keyed sequence (pages,
    API calls, token streams)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 9).alias("p"),
        )
    )


# Two-sample proportion z-test — the A/B experiment readout. Assignment
# comes from the key-derived LCG (deterministic under any partitioning,
# same stream discipline as operators/sampling.py); all inputs to the
# z formula are exact integer counts, so the statistic is identical
# across engines.
_AB_Z_CRIT = 1.959963985  # two-sided 95%

_AB_TEST_ORACLE = f"""
WITH assigned AS (
  SELECT user_id,
         CASE WHEN ((48271 * ((48271 * (user_id * 512 + 384)) % 2147483647))
                    % 2147483647) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
g AS (
  SELECT arm, COUNT(*) AS n, SUM(converted) AS conv FROM assigned GROUP BY arm
),
w AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
         MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
         MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
         MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
  FROM g
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
       round(CAST(ca AS DOUBLE) / na, 9) AS rate_a,
       round(CAST(cb AS DOUBLE) / nb, 9) AS rate_b,
       round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 9) AS z,
       abs((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
           / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                  * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                  * (1.0 / na + 1.0 / nb))) > {_AB_Z_CRIT} AS significant
FROM w
"""


@register("agg_ab_test", oracle=_AB_TEST_ORACLE)
def agg_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic LCG arm assignment per
    user, per-user conversion (any purchase), pooled two-sample
    proportion z-test with a 95% significance flag (conversion = at
    least 14 purchases, near the per-user median so both outcomes are
    populated; the double-stepped LCG wraps the modulus, so arm parity
    actually mixes — a single step's parity is constant for small ids).
    Two aggregations on
    one user_id shuffle spine (per-user conversion, then per-arm
    counts), then a single-row pivot and pure arithmetic on four exact
    integers — at 100 TB the experiment readout costs one shuffle of
    user keys and nothing else. LCG parity assignment means the arms
    are reproducible on any cluster shape — the property real
    experiment platforms get from hashing the unit id."""
    e = table(spark, sf_dir, "events")
    h1 = (F.lit(48271) * (F.col("user_id") * 512 + 384)) % 2147483647
    arm = F.when((F.lit(48271) * h1) % 2147483647 % 2 == 0, "A").otherwise("B")
    assigned = e.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select("user_id", arm.alias("arm"), "converted")
    g = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = g.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    na, ca, nb, cb = (F.col(c).cast("double") for c in ("na", "ca", "nb", "cb"))
    pool = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / F.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    return w.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        F.round(ca / na, 9).alias("rate_a"),
        F.round(cb / nb, 9).alias("rate_b"),
        F.round(z, 9).alias("z"),
        (F.abs(z) > _AB_Z_CRIT).alias("significant"),
    )


# Exponentially time-decayed aggregate: recency-weighted engagement
# ("value now", half-life 7 days), DAILY-BUCKETED: the weight for an
# event aged k whole days is a shared 9-dp literal from a precomputed
# 2^(-k/7) table, so no transcendental is evaluated at query time.
# The earlier per-row exp() form was ulp-fragile: at 100k rows one
# term landed on a 9-dp rounding boundary where Spark's and DuckDB's
# exp differ by 1 ulp and the totals split (caught by the sf0.1
# sweep). A literal table is bit-identical everywhere — and bucketed
# decay is also the materializable form a 100 TB rollup wants (weights
# change once per day, so yesterday's partial sums stay valid).
_DECAY_REF_TS = "2024-01-30 00:00:00"
_DECAY_HALF_LIFE_DAYS = 7.0
_DECAY_US_PER_DAY = 86_400_000_000
# k (whole days, truncated toward zero — Spark `div` and DuckDB `//`
# agree) clamped to [KMIN, KMAX]; beyond KMAX the weight is < 0.5e-9
# and rounds to 0 at the 9-dp term grid anyway.
_DECAY_KMIN, _DECAY_KMAX = -64, 217
_DECAY_W = [
    round(2.0 ** (-k / _DECAY_HALF_LIFE_DAYS), 9)
    for k in range(_DECAY_KMIN, _DECAY_KMAX + 1)
]
_DECAY_W_SQL = "[" + ", ".join(f"{w:.9f}" for w in _DECAY_W) + "]"

_DECAY_ORACLE = f"""
WITH aged AS (
  SELECT user_id, value,
         (epoch_us(TIMESTAMP '{_DECAY_REF_TS}') - epoch_us(ts))
           // {_DECAY_US_PER_DAY} AS k
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(CAST(SUM(CAST(round(
           value * ({_DECAY_W_SQL}[
             LEAST(GREATEST(k, {_DECAY_KMIN}), {_DECAY_KMAX}) - {_DECAY_KMIN} + 1]),
           9) AS DECIMAL(38,12))) AS DOUBLE), 6) AS decayed_value
FROM aged
GROUP BY user_id
"""


@register("agg_decayed_sum", oracle=_DECAY_ORACLE)
def agg_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially decayed value total per user (half-life {H} days
    against a fixed reference instant), daily-bucketed: the whole-day
    age indexes a precomputed 9-dp 2^(-k/{H}) literal table shared
    verbatim with the oracle — no query-time transcendental, so terms
    are bit-identical across engines and partitionings (a per-row
    exp() was 1-ulp-divergent on rounding boundaries at 100k rows).
    Each term is pinned to 9 dp and exact-decimal-summed; one
    map-side-combined shuffle, same cost as any grouped sum. At scale,
    day-constant weights also make the rollup incrementally
    materializable (yesterday's partials never change)."""
    e = table(spark, sf_dir, "events")
    age_us = (
        F.unix_micros(F.lit(_DECAY_REF_TS).cast("timestamp"))
        - F.unix_micros(F.col("ts"))
    )
    weights = F.array(*[F.lit(w) for w in _DECAY_W])
    aged = e.select("user_id", "value", age_us.alias("age_us")).select(
        "user_id",
        "value",
        F.expr(f"age_us div {_DECAY_US_PER_DAY}").alias("k"),
    )
    idx = (
        F.least(F.greatest(F.col("k"), F.lit(_DECAY_KMIN)), F.lit(_DECAY_KMAX))
        - _DECAY_KMIN
        + 1
    )
    term = F.round(F.col("value") * F.element_at(weights, idx.cast("int")), 9)
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(term.cast("decimal(38,12)")).cast("double"), 6
        ).alias("decayed_value"),
    )


# Gini coefficient of per-type value concentration — the inequality /
# dominance audit (how concentrated is revenue, or a corpus's token
# mass, across contributors). Rank-weighted identity over the sorted
# values: G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)).
_GINI_ORACLE = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS i
  FROM events
),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(i * value AS DECIMAL(38,2))) AS DOUBLE) AS six
  FROM r GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((2 * six - (n + 1) * sx) / (n * sx), 9) AS gini
FROM s
"""


@register("agg_gini", oracle=_GINI_ORACLE)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration per group via the rank-weighted identity —
    0 when every row contributes equally, →1 under heavy-hitter
    dominance. The audit metric for dataset balance (source/token-mass
    concentration) and revenue inequality alike. One hash exchange
    serves both the rank window and the aggregate (same partition key);
    Σi·x is decimal-exact (ties contribute the same sum under any
    tie-order, so the rank tiebreak never shows in the result)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = e.select(
        "event_type", "value", F.row_number().over(w).alias("i")
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("sx"),
        F.sum((F.col("i") * F.col("value")).cast("decimal(38,2)"))
        .cast("double")
        .alias("six"),
    )
    n, sx, six = F.col("n"), F.col("sx"), F.col("six")
    return s.select(
        "event_type",
        "n",
        F.round((2 * six - (n + 1) * sx) / (n * sx), 9).alias("gini"),
    )


# Daily active users split into new vs returning — the growth-
# accounting decomposition (DAU = first-timers + retained).
_NEW_RET_ORACLE = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN day > d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM daily JOIN first_day USING (user_id)
GROUP BY day
"""


@register("agg_new_vs_returning", oracle=_NEW_RET_ORACLE)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives decomposed into new vs returning users. Same
    one-exchange-spine shape as agg_retention_cohort (min-day per user,
    distinct user-days, join on user_id, rollup to days): the identity
    active = new + returning holds by construction and is a free data
    quality check downstream. All dates and counts — nothing to pin."""
    e = table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        daily.join(first_day, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0)).alias(
                "new_users"
            ),
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0)).alias(
                "returning_users"
            ),
        )
    )


# Median absolute deviation — the robust spread estimate (stddev is
# yanked by one outlier; MAD isn't). Exact medians via rank arithmetic,
# no arrays: median = mean of the one-or-two middle order statistics.
_MAD_ORACLE = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
         CAST(AVG(value) AS DOUBLE) AS median
  FROM r WHERE i IN ((n + 1) // 2, (n + 2) // 2)
  GROUP BY event_type
),
d AS (
  SELECT e.event_type, abs(e.value - m.median) AS dev,
         row_number() OVER (PARTITION BY e.event_type
                            ORDER BY abs(e.value - m.median), e.event_id) AS i,
         COUNT(*) OVER (PARTITION BY e.event_type) AS n
  FROM events e JOIN med m USING (event_type)
)
SELECT d.event_type,
       round(ANY_VALUE(m.median), 6) AS median,
       round(CAST(AVG(dev) AS DOUBLE), 6) AS mad
FROM d JOIN med m USING (event_type)
WHERE d.i IN ((d.n + 1) // 2, (d.n + 2) // 2)
GROUP BY d.event_type
"""


@register("agg_mad", oracle=_MAD_ORACLE)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group: the outlier-immune spread
    estimate behind robust z-scores (value is anomalous when
    |x - median| >> MAD, regardless of how wild the outliers that
    polluted a stddev would be). Two rank passes — exact median by
    picking the middle order statistic(s) arithmetically, then the same
    on |x - median| — each one exchange on the group key; deviations of
    2-dp values from an exactly-representable median average without
    drift (middle-pair mean is one correctly-rounded division)."""
    e = table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_n = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    med = (
        r.filter(
            (F.col("i") == F.expr("(n + 1) div 2"))
            | (F.col("i") == F.expr("(n + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(F.avg("value").cast("double").alias("median"))
    )
    dev = e.join(med, "event_type").select(
        "event_type",
        "median",
        F.abs(F.col("value") - F.col("median")).alias("dev"),
        "event_id",
    )
    w_rank2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    d = dev.select(
        "event_type",
        "median",
        "dev",
        F.row_number().over(w_rank2).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return (
        d.filter(
            (F.col("i") == F.expr("(n + 1) div 2"))
            | (F.col("i") == F.expr("(n + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(
            F.round(F.first("median"), 6).alias("median"),
            F.round(F.avg("dev").cast("double"), 6).alias("mad"),
        )
    )


# Lag-1 autocorrelation of each user's value series — the stationarity
# / burstiness signal (near 0: memoryless; positive: trending/bursty).
# Built on consecutive (x_{t-1}, x_t) pairs from one LAG pass, then the
# exact-power-sum correlation formula shared with agg_stats.
_AUTOCORR_ORACLE = f"""
WITH pairs AS (
  SELECT user_id, value AS y,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
  FROM events
),
s AS (
  SELECT user_id,
         COUNT(*) AS n,
         {sql_dsum("x")} AS sx,
         {sql_dsum("x * x", 4)} AS sxx,
         {sql_dsum("y")} AS sy,
         {sql_dsum("y * y", 4)} AS syy,
         {sql_dsum("x * y", 4)} AS sxy
  FROM pairs WHERE x IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(*) >= 10
)
SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS autocorr_lag1
FROM s
"""


@register("agg_autocorr", oracle=_AUTOCORR_ORACLE)
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series lag-1 autocorrelation: correlate each observation with
    its predecessor (one LAG window), then the exact-decimal power-sum
    correlation formula (agg_stats' discipline) per user. Positive
    values flag trending or bursty series — the signal that picks
    which metrics need the rolling detectors (win_rolling_zscore) vs a
    simple global gate. One exchange serves the window, the pairing and
    the aggregate; series with < 10 pairs are excluded in both
    engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "user_id",
        F.col("value").alias("y"),
        F.lag("value").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    x, y = F.col("x"), F.col("y")
    s = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(x * x, 4).alias("sxx"),
        dsum(y).alias("sy"),
        dsum(y * y, 4).alias("syy"),
        dsum(x * y, 4).alias("sxy"),
    ).filter(F.col("n") >= 10)
    n, sx, sxx, sy, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy")
    )
    return s.select(
        "user_id",
        F.col("n").alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            9,
        ).alias("autocorr_lag1"),
    )


# Hour-of-day activity profile with a chi-square-vs-uniform readout —
# the seasonality fingerprint (is traffic flat or peaked, and when).
_SEASON_ORACLE = """
WITH h AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1
),
t AS (SELECT SUM(n) AS total, COUNT(*) AS nb FROM h)
SELECT h.hour, CAST(h.n AS BIGINT) AS n,
       round(CAST(h.n AS DOUBLE) * t.nb / t.total, 9) AS load_ratio,
       round(CAST(SUM(CAST(round(
               (h2.n - CAST(t.total AS DOUBLE) / t.nb)
               * (h2.n - CAST(t.total AS DOUBLE) / t.nb)
               / (CAST(t.total AS DOUBLE) / t.nb), 9) AS DECIMAL(38,12)))
             AS DOUBLE), 6) AS chi2_uniform
FROM h CROSS JOIN t CROSS JOIN h h2
GROUP BY h.hour, h.n, t.nb, t.total
"""


@register("agg_seasonality", oracle=_SEASON_ORACLE)
def agg_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load profile: per-hour volume, load ratio vs uniform
    (1.0 = flat), and the chi-square statistic against the uniform
    profile (repeated on every row — it is a property of the whole
    profile). One scan to a 24-row aggregate; the chi-square folds the
    24 pinned terms with an exact decimal sum, so the statistic is
    identical across engines. The profile is what capacity planning
    and anomaly baselining condition on.

    Plan shape: the total/bucket-count/chi-square folds are GLOBAL
    WINDOWS over the 24-row hourly aggregate, not crossJoins back to
    re-derived copies of it — Spark shares no common subplans inside
    one query tree, so the crossJoin form scanned events four times
    for this 24-row result. The partition-less window is safe here
    because its input is the grouped aggregate (≤24 rows by
    construction — allow-listed in the global-window plan gate)."""
    e = table(spark, sf_dir, "events")
    h = e.groupBy(F.hour("ts").alias("hour")).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    total = F.sum("n").over(w)
    nb = F.count(F.lit(1)).over(w)
    exp = total.cast("double") / nb
    term = F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 9)
    return h.select(
        "hour",
        "n",
        F.round(F.col("n").cast("double") * nb / total, 9).alias("load_ratio"),
        F.round(
            F.sum(term.cast("decimal(38,12)")).over(w).cast("double"), 6
        ).alias("chi2_uniform"),
    )


# Top-N concentration share: "what fraction of total value do the top
# 10 users account for" — the business-facing concentration headline
# (agg_gini's 0..1 coefficient is the statistician's form of the same
# question).
_TOPN_SHARE_N = 10

_TOPN_SHARE_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, {sql_dsum("value")} AS total
  FROM events GROUP BY user_id
),
top AS (
  SELECT user_id, total FROM per_user
  ORDER BY total DESC, user_id LIMIT {_TOPN_SHARE_N}
),
all_t AS (SELECT {sql_dsum("value")} AS grand FROM events)
SELECT CAST({_TOPN_SHARE_N} AS INT) AS top_n,
       round(CAST(SUM(CAST(t.total AS DECIMAL(38,2))) AS DOUBLE), 2)
         AS top_total,
       round(a.grand, 2) AS grand_total,
       round(CAST(SUM(CAST(t.total AS DECIMAL(38,2))) AS DOUBLE) / a.grand, 9)
         AS top_share
FROM top t CROSS JOIN all_t a
GROUP BY a.grand
"""


@register("agg_topn_share", oracle=_TOPN_SHARE_ORACLE)
def agg_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration headline: the top-{N} users' share of all value.
    Per-user totals are one map-combined shuffle; the top-{N} cut is a
    TakeOrderedAndProject (bounded heap — the full user list never
    sorts); the grand total is a 1-row broadcast. Totals are exact
    decimals, so the share is one correctly-rounded division. Pair
    with agg_gini for the full inequality picture."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(dsum("value").alias("total"))
    top = per_user.orderBy(F.desc("total"), "user_id").limit(_TOPN_SHARE_N)
    grand = e.agg(dsum("value").alias("grand"))
    return (
        top.crossJoin(F.broadcast(grand))
        .groupBy("grand")
        .agg(
            F.lit(_TOPN_SHARE_N).cast("int").alias("top_n"),
            # dsum over the 10 per-user double totals (round-10 review):
            # a raw double SUM is merge-order-dependent — engines (or two
            # Spark runs) can differ by an ulp, and a round() midpoint
            # turns that into a hash flake; the registry's rule is every
            # float aggregation goes through exact decimals
            F.round(dsum("total"), 2).alias("top_total"),
            F.round(dsum("total") / F.first("grand"), 9).alias("top_share"),
        )
        .select(
            "top_n",
            "top_total",
            F.round(F.col("grand"), 2).alias("grand_total"),
            "top_share",
        )
    )


# Time-to-convert: per-user first-click -> first-purchase latency and
# the corpus-level summary (integer-second arithmetic end to end).
_TTC_ORACLE = """
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
d AS (
  SELECT user_id,
         (epoch_us(first_purchase) - epoch_us(first_click)) // 1000000
           AS delta_s
  FROM f
  WHERE first_click IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_click
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(delta_s) AS BIGINT) AS min_s,
       CAST(MAX(delta_s) AS BIGINT) AS max_s,
       round(CAST(SUM(delta_s) AS DOUBLE) / COUNT(*), 6) AS mean_s
FROM d
"""


@register("agg_time_to_convert", oracle=_TTC_ORACLE)
def agg_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: first click to first purchase per user
    (users who purchased before ever clicking are excluded — that is a
    different funnel), summarized to count/min/max/mean seconds. One
    conditional-MIN aggregate per user (single shuffle, map-combined),
    then a 1-row global rollup of exact integer seconds — the mean is
    one correctly-rounded division. The per-user deltas feed the
    quantile sketch (agg_quantile_sketch) when the business wants p50/
    p90 latency at scale instead of moments."""
    e = table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    d = f.filter(
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_click"))
    ).select(
        (
            (
                F.unix_micros(F.col("first_purchase"))
                - F.unix_micros(F.col("first_click"))
            )
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("delta_s")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("delta_s").alias("min_s"),
        F.max("delta_s").alias("max_s"),
        F.round(F.sum("delta_s").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_s"
        ),
    )


# k-th order statistics per group — the generalization of MIN/MAX that
# trimmed estimators (and "3rd-worst latency" style SLOs) need.
_KTH_K = 3

_KTH_ORACLE = f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       MAX(CASE WHEN i = {_KTH_K} THEN value END) AS kth_smallest,
       MAX(CASE WHEN i = n - {_KTH_K} + 1 THEN value END) AS kth_largest,
       CAST(MAX(n) AS BIGINT) AS n
FROM r GROUP BY event_type
"""


@register("agg_kth_order_stat", oracle=_KTH_ORACLE)
def agg_kth_order_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-th smallest and largest value per group by rank
    arithmetic (same machinery as agg_mad's exact medians): one rank
    window + one conditional aggregate on the shared group key — a
    single exchange. Trimmed min/max is the robust SLO form: the 3rd
    worst ignores two outliers the plain MAX would report."""
    e = table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_n = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max(F.when(F.col("i") == _KTH_K, F.col("value"))).alias("kth_smallest"),
        F.max(
            F.when(F.col("i") == F.col("n") - _KTH_K + 1, F.col("value"))
        ).alias("kth_largest"),
        F.max("n").alias("n"),
    )
