"""Projection & predicate operators (SURVEY.md §2.B2).

The reference's only projections are row construction (StockTrade.java:
37-43) and display formatting (KinesisSync.java:121); its only predicate is
the stream-status gate (KinesisSync.java:179). Generalized to the full
predicate surface. Everything here is a Catalyst-native expression:
predicates and column selections push down into the parquet scan (visible
as PushedFilters/ReadSchema in .explain), so at 100 TB these queries read
only the row groups and columns they touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_PROJECT_ORACLE = """
SELECT l_orderkey,
       l_linenumber AS line_no,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_quantity * 2.0 AS double_qty,
       upper(l_returnflag) AS flag_uc
FROM lineitem
"""


@register("project", oracle=_PROJECT_ORACLE)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection: rename + per-row computed columns (A4 generalization).

    Per-row double arithmetic is IEEE-identical across engines, so no
    decimal discipline is needed until values are aggregated.
    """
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * 2.0).alias("double_qty"),
        F.upper("l_returnflag").alias("flag_uc"),
    )


@register(
    "filter_eq",
    oracle="SELECT event_id, ts, user_id, event_type, value, props "
    "FROM events WHERE event_type = 'purchase'",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate (A14's ACTIVE-status gate generalized)."""
    return table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")


_RANGE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_quantity > 25
"""


@register("filter_range", oracle=_RANGE_ORACLE)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates — the min/max row-group-skipping workhorse."""
    l = table(spark, sf_dir, "lineitem")
    return l.select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 25)
    )


_COMBO_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_orderpriority LIKE '1-%'
  AND o_totalprice BETWEEN 50000 AND 200000
  AND NULLIF(o_orderstatus, 'P') IS NOT NULL
  AND NOT (o_orderkey % 7 = 0)
"""


@register("filter_in_like_null", oracle=_COMBO_ORACLE)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / BETWEEN / IS NULL / NOT, combined with & and ~."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice").filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_totalprice").between(50000, 200000)
        & F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull()
        & ~(F.col("o_orderkey") % 7 == 0)
    )
