"""Subquery shapes (scalar, correlated) expressed Spark-first.

SQL subqueries are plan shapes, not operators: Catalyst rewrites an
uncorrelated scalar subquery into a broadcast of a 1-row aggregate, and a
correlated scalar subquery into a decorrelated aggregate-join — or, when
the correlation key is the grouping key, a window aggregate with NO join
at all. These operators implement each shape directly in the DataFrame
API (the form the optimizer targets), with the SQL-subquery text as the
oracle, proving the rewrite is semantics-preserving.

Exactness note: thresholds like "above average" compare a double against
a division — engines disagree in the last ulp. Both operators therefore
compare in integer cents (value·n > total, mathematically identical to
value > total/n) so the predicate is exact integer arithmetic in Spark
and DuckDB. The same trick is the 100 TB answer too: no floating-point
boundary rows that flip between runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.numerics import cents
from kinesis_datastore_app_spark.registry import register


# exact integer cents: shared definition in numerics.cents
_cents = cents


_SCALAR_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE CAST(round(c_acctbal * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM customer)
      > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) FROM customer)
"""


@register("subquery_scalar", oracle=_SCALAR_ORACLE)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (customers above the global average
    balance): the 1-row aggregate is computed once and broadcast-joined
    under every probe row — the fact side never shuffles, the scalar
    ships to every executor. At 100 TB this is a full scan + a 1-row
    exchange, nothing more."""
    c = table(spark, sf_dir, "customer")
    stats = c.agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("total_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(_cents(F.col("c_acctbal")) * F.col("n") > F.col("total_cents"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


_CORRELATED_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(round(o_totalprice * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT SUM(CAST(round(i.o_totalprice * 100) AS BIGINT))
         FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


@register("subquery_correlated", oracle=_CORRELATED_ORACLE)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above their own customer's
    average) decorrelated to a window aggregate: one hash shuffle on the
    correlation key, no self-join, no per-row re-execution — the plan a
    naive correlated evaluation (O(rows × groups)) must become to survive
    100 TB. The oracle keeps the correlated-subquery text to prove the
    rewrite preserves semantics."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cents = _cents(F.col("o_totalprice"))
    return (
        o.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("total_cents", F.sum(cents).over(w))
        .filter(cents * F.col("n") > F.col("total_cents"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_IN_ALL_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                      WHERE c_mktsegment = 'MACHINERY')
  AND CAST(round(o.o_totalprice * 100) AS BIGINT)
      > (SELECT MAX(CAST(round(i.o_totalprice * 100) AS BIGINT))
         FROM orders i
         WHERE i.o_orderpriority = '5-LOW' AND i.o_orderkey % 100 = 0)
"""


@register("subquery_in_all", oracle=_IN_ALL_ORACLE)
def subquery_in_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery + ALL-comparison in one predicate: orders by
    MACHINERY customers whose price beats EVERY sampled 5-LOW order.
    Spark-first decorrelation: IN (uncorrelated set) becomes a left-semi
    join; `> ALL (set)` becomes `> scalar MAX(set)` — a 1-row broadcast,
    the rewrite that turns a per-row set comparison into one aggregate
    + one codegen filter. NOTE the rewrite is only equivalent for a
    NON-EMPTY, non-NULL threshold set: `> ALL (empty)` is TRUE while
    `> NULL` filters every row — this op's sampled 5-LOW set is
    guaranteed non-empty by the fixture, and the oracle intentionally
    uses the same MAX form so both engines take the same branch; a
    caller porting the pattern to a possibly-empty set needs
    COALESCE(max, -infinity). (Integer-cents comparison keeps the float
    boundary exact.) At 100 TB: one semi-join exchange bounded by the
    dim, one 1-row exchange, no per-row re-execution."""
    o = table(spark, sf_dir, "orders")
    machinery = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
    )
    cents = _cents(F.col("o_totalprice"))
    threshold = (
        o.filter(
            (F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderkey") % 100 == 0)
        )
        .agg(F.max(cents).alias("max_low_cents"))
    )
    return (
        # machinery is an SF-growing customer subset — no broadcast
        # hint (AQE broadcasts at fixture scale, shuffle semi join at
        # 100 TB); the 1-row threshold broadcast below is the only
        # forced exchange, and it is genuinely constant-size.
        o.join(machinery, o["o_custkey"] == machinery["c_custkey"], "semi")
        .crossJoin(F.broadcast(threshold))
        .filter(cents > F.col("max_low_cents"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
