"""Pivot / unpivot operators (wide↔long reshaping — the remaining common
OLAP pattern not already in §2.B; oracle via conditional aggregation,
which is also exactly what Spark compiles .pivot() into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.numerics import sql_dsum
from kinesis_datastore_app_spark.registry import register

_PIVOT_ORACLE = f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_pivot", oracle=_PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per l_linestatus value. Explicit value list —
    at scale never let pivot discover values with an extra pass."""
    l = table(spark, sf_dir, "lineitem")
    out = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


_UNPIVOT_ORACLE = """
SELECT o_orderkey, metric, val
FROM (
  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
)
WHERE o_orderkey % 10 = 0
"""


@register("unpivot", oracle=_UNPIVOT_ORACLE)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide → long via the native unpivot operator
    (compiles to Expand — one pass, rows × n_metrics output, no shuffle)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
        .unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "val")
    )
