"""TPC-H-shaped showcase queries (SURVEY.md §7 M1) + scale patterns.

Q1 lives in operators/aggregates.py (agg_group). These add the multi-join
shapes (Q3, Q5) and two explicitly scale-oriented patterns: a two-phase
salted aggregation (the hand-rolled skew defense for pre-AQE clusters or
extreme heavy-hitter keys) and exact percentiles.

Plan expectations at 100 TB: Q3/Q5 join dimension-filtered small sides
into the fact table — region/nation broadcast (genuinely fixed-size:
5/25 rows); customer/supplier GROW with SF so their strategy is AQE's
size-based decision (broadcast at fixture scale, shuffle join at 100 TB);
the orders⋈lineitem spine is the one real shuffle, on the join key both
sides already aggregate on afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.numerics import dsum, sql_dsum
from kinesis_datastore_app_spark.registry import register

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("tpch_q3_shape", oracle=_Q3_ORACLE)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: segment-filtered customer ⋈ orders ⋈ lineitem, top-10 revenue.
    The segment-filtered customer side is SF-GROWING (~1/5 of customer),
    so broadcasting it is AQE's size-based call, not a forced hint — a
    hint would ship a fifth of all customers to every executor at the
    100 TB design point (round-8 review). At fixture scale AQE still
    picks broadcast; at scale it degrades to a shuffle join safely. The
    orders-lineitem join is the shuffle spine; ORDER BY+LIMIT plans as
    TakeOrderedAndProject (per-partition top-k, driver merge)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


_Q5_ORACLE = f"""
SELECT n.n_name,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("tpch_q5_shape", oracle=_Q5_ORACLE)
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: five-way join through the region→nation→customer→orders→
    lineitem→supplier chain with the local-supplier predicate. Forced
    broadcast hints ONLY on the genuinely fixed-size dims (region 5
    rows, nation 25): customer and supplier GROW with SF, so their join
    strategy is AQE's size-based call — at fixture scale it still
    broadcasts them, at the 100 TB design point they degrade to shuffle
    joins instead of OOMing the driver (round-8 review). Only
    orders⋈lineitem is the unavoidable fact-fact shuffle."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        o.join(
            c.join(
                F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                c.c_nationkey == n.n_nationkey,
            ),
            o.o_custkey == c.c_custkey,
        )
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


_SALTED_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dsum("value")} AS sum_value
FROM events
GROUP BY event_type
"""


@register("agg_salted_skew", oracle=_SALTED_ORACLE)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: the classic defense when one key
    dominates (5 event types over millions of rows → every row of a hot
    key lands on one reducer). Phase 1 groups by (key, salt) spreading
    each hot key over 16 partitions; phase 2 merges the 16 partials.
    Result provably equals the direct groupBy (the oracle). Decimal sums
    keep the two-phase re-aggregation exact. AQE's skew handling covers
    joins; for aggregations this pattern is still the explicit tool."""
    e = table(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(38,2)")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


_PCT_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 9) AS p25,
       round(quantile_cont(l_quantity, 0.50), 9) AS p50,
       round(quantile_cont(l_quantity, 0.75), 9) AS p75
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_percentile", oracle=_PCT_ORACLE)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (order statistics — deterministic,
    so oracle-comparable). At 100 TB prefer percentile_approx (t-digest
    sketch, mergeable, bounded memory; exercised in agg_approx's family)."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 9).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 9).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 9).alias("p75"),
    )


_Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey, {sql_dsum("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("tpch_q18_shape", oracle=_Q18_ORACLE)
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): an AGGREGATE as a join
    build side — group lineitem by order, HAVING-filter to the rare big
    orders, then join the small surviving set back through orders to
    customer. The plan shape matters at 100 TB: the heavy groupBy
    shuffles lineitem ONCE on its natural key; the HAVING filter
    shrinks it (measured ~20% of orders at this threshold — large
    enough that a forced broadcast would ship a fifth of the fact-side
    keys to every executor at scale, so the join strategy is AQE's
    size-based call, not a hint; round-8 review). The exact-decimal sum
    keeps the HAVING threshold decision identical across engines (a
    float-sum boundary row could flip membership)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("tpch_q10_shape", oracle=_Q10_ORACLE)
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item reporting — which customers returned the most
    revenue in a quarter. The date predicate prunes orders at the scan
    (PushedFilters), the returnflag predicate prunes lineitem; the
    orders⋈lineitem spine is the one big shuffle, then the per-customer
    rollup reuses the customer key the join already hashed on; nation is
    a fixed-size broadcast. Top-20 plans as TakeOrderedAndProject. The
    same plan at 100 TB: two pruned scans, one exchange, bounded heap."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )
