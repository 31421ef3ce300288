"""UDF / UDAF / UDTF surface (SURVEY.md §2.B9).

The engine's position: UDFs are the slow path. Every UDF here mirrors a
formula the oracle can also compute, so correctness is hash-checked — and
each docstring names the built-in alternative a production query should
prefer. When Python is unavoidable, the Arrow-vectorized forms
(pandas_udf / applyInPandas / mapInPandas) amortize the boundary cost by
whole record batches; row-at-a-time @udf appears exactly once, as surface
coverage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_UDF_PY_ORACLE = """
SELECT doc_id,
       CAST(length(lower(text)) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
            AS BIGINT) AS n_vowels
FROM documents WHERE doc_id % 10 = 0
"""


@register("udf_python", oracle=_UDF_PY_ORACLE)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (serde per row — demo only; the oracle's
    regexp formulation is what a real query should use)."""

    @F.udf(T.LongType())
    def count_vowels(s: str) -> int:
        return sum(1 for ch in s.lower() if ch in "aeiou")

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select("doc_id", count_vowels("text").alias("n_vowels"))


# Both engines pin to the 9-dp grid with the SAME IEEE ops (multiply,
# add, floor, divide) — numpy's .round is half-EVEN (rint) while
# DuckDB's round is half-away, so an exact-tie value would flake the
# hash (round-8 review); sign-aware is unnecessary because the formula
# only needs both sides to agree, and floor(x*1e9 + 0.5) on identical
# doubles is engine-identical by construction (the graph.py _pin
# discipline).
_UDF_PANDAS_ORACLE = """
SELECT event_id,
       floor((value - 100.0) / 7.0 * 1000000000.0 + 0.5) / 1000000000.0
           AS value_z
FROM events
"""


@register("udf_pandas", oracle=_UDF_PANDAS_ORACLE)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: one Python call per record
    batch, numpy arithmetic inside — the acceptable UDF shape at scale."""

    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        import numpy as np

        x = (v - 100.0) / 7.0
        return np.floor(x * 1e9 + 0.5) / 1e9

    e = table(spark, sf_dir, "events")
    return e.select("event_id", zscore("value").alias("value_z"))


_UDAF_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       round(quantile_cont(value, 0.5), 9) AS median_value
FROM events
GROUP BY event_type
"""


@register("udaf_pandas", oracle=_UDAF_ORACLE)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate UDAF via applyInPandas: whole group in, one row
    out. Median is order-statistics (exact), so it hash-matches DuckDB's
    quantile_cont. At 100 TB prefer percentile_approx unless per-group
    cardinality is bounded — applyInPandas materializes each group."""

    def group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "median_value": [round(float(pdf["value"].median()), 9)],
            }
        )

    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").applyInPandas(
        group_stats, schema="event_type STRING, n BIGINT, median_value DOUBLE"
    )


_UDTF_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id % 25 = 0
"""


@register("udtf", oracle=_UDTF_ORACLE)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (PySpark ≥3.5): one input row → N output rows. The
    declarative twin is explode(split(...)) — preferred at scale since it
    never leaves the JVM; the UDTF form is registered surface coverage."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token STRING")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield (tok,)

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    d.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT d.doc_id, t.token "
        "FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t"
    )
