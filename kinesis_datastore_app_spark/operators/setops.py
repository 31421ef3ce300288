"""Sort / limit / set operators (SURVEY.md §2.B6).

LIMIT mirrors the reference's GetRecords cap of 1000 (KinesisSync.java:
110); the reference's ordered read (per-shard sequence order,
KinesisSync.java:118-122) generalizes to multi-key ORDER BY. Every limited
query imposes a TOTAL order (unique tie-break keys) so Spark and DuckDB
select the same rows.

Scale notes: Spark executes ORDER BY as range-partitioned sort (sampled
boundaries), and ORDER BY + LIMIT as a per-partition top-k + driver merge
(TakeOrderedAndProject) — no global sort materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_SORT_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null
FROM orders
ORDER BY prio_or_null DESC NULLS LAST, o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("sort_multi", oracle=_SORT_ORACLE)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering + unique tie-break."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_or_null"),
        )
        .orderBy(
            F.col("prio_or_null").desc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


_LIMIT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 1000
"""


@register("limit", oracle=_LIMIT_ORACLE)
def limit_1000(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT 1000 over a total order — the GetRecords(limit=1000) analog
    (KinesisSync.java:110): a bounded scan from the start of the stream."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


_UNION_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
"""


@register("set_union", oracle=_UNION_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): unionByName + distinct."""
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).distinct()


_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


_EXCEPT_ORACLE = """
SELECT event_id FROM events WHERE value > 100
EXCEPT
SELECT event_id FROM events WHERE event_type = 'purchase'
"""


@register("set_except", oracle=_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicities)
    return e.filter(F.col("value") > 100).select("event_id").subtract(
        e.filter(F.col("event_type") == "purchase").select("event_id")
    )


_UNION_BY_NAME_ORACLE = """
SELECT * FROM (
  SELECT c_custkey, c_name, c_acctbal
  FROM customer WHERE c_mktsegment = 'MACHINERY'
  UNION ALL BY NAME
  SELECT c_name, c_custkey
  FROM customer WHERE c_mktsegment = 'BUILDING'
)
"""


@register("set_union_by_name", oracle=_UNION_BY_NAME_ORACLE)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: aligns columns by NAME (not
    position) and null-fills columns missing from one side — how a
    long-lived pipeline appends data written before a column existed
    (the batch analog of the scan_schema_evolution read path).
    Positional UNION would silently pair c_name with c_custkey here;
    by-name alignment is the correctness guard. Pure narrow op — no
    shuffle, both legs stay partition-local."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_name", "c_custkey"
    )
    return a.unionByName(b, allowMissingColumns=True)
