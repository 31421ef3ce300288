"""End-to-end training-data curation pipeline as ONE declarative plan.

Composes the engine's curation primitives — quality gate, exact content
dedup, deterministic train/val/test split — into a single DataFrame
program. The value of declaring the whole pipeline (vs materializing
between stages) is that Catalyst fuses it: the quality filter pushes into
the scan, dedup is the only shuffle, and the split is a free projection
on top — at 100 TB the corpus is read once and shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.operators.sampling import _u_col, _u_sql
from kinesis_datastore_app_spark.registry import register

MIN_CHARS = 100

_CURATION_ORACLE = f"""
WITH clean AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  WHERE n_chars >= {MIN_CHARS} AND lang IS NOT NULL
),
deduped AS (
  SELECT doc_id, lang, n_chars
  FROM clean
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
)
SELECT doc_id, lang, n_chars,
       CASE WHEN {_u_sql("doc_id")} < 0.8 THEN 'train'
            WHEN {_u_sql("doc_id")} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM deduped
"""


@register("pipeline_curation", oracle=_CURATION_ORACLE)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup (keep lowest doc_id per content hash) →
    deterministic split, fused into one plan: the length/lang predicates
    reach the parquet scan (pushed filters), the content-hash dedup is
    the single shuffle (WindowGroupLimit caps it at one row per hash per
    task before the exchange), and split assignment is a key-derived
    expression (partitioning-invariant, see operators/sampling.py)."""
    d = table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") >= MIN_CHARS) & F.col("lang").isNotNull()
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    u = _u_col(F.col("doc_id"))
    return deduped.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split"),
    )
