"""Embedding storage ops: int8 quantization with verified reconstruction.

A 100 TB embedding corpus at float32 is 4 bytes/dim; symmetric int8
quantization (per-vector scale = max|x|/127, q_i = round(x_i/scale))
cuts storage and shuffle bytes 4x and is what ANN engines ship to disk.
The whole transform is per-row array arithmetic — `transform` /
`aggregate` lambdas over the array column, JVM-side, no UDF, no
shuffle: it runs at scan speed and composes with the ANN operators
(llm/simsearch.py) as a cheaper storage tier.

Determinism notes (what makes this oracle-checkable bit-exactly):

* float32 -> float64 widening is exact, and / and floor are
  IEEE-deterministic, so both engines compute identical scales and
  codes;
* rounding uses ``floor(x/scale + 0.5)`` EXPLICITLY rather than each
  engine's ``round()`` (whose half-away/half-even conventions differ);
* the reconstruction-error assertion |x - q_i*scale| <= scale/2 + eps
  is emitted as a BOOLEAN the oracle pins to TRUE — the same
  checkable-sketch pattern as agg_approx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import table
from kinesis_datastore_app_spark.registry import register

_QUANT_ORACLE = """
WITH scaled AS (
    SELECT vec_id,
           embedding,
           list_max(list_transform(embedding,
                                   x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale
    FROM embeddings
),
coded AS (
    SELECT vec_id,
           scale,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5)
                                    AS BIGINT)) AS q
    FROM scaled
    WHERE scale > 0
)
SELECT vec_id,
       scale,
       CAST(len(q) AS INT) AS n_dims,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS q_l1,
       CAST(list_max(list_transform(q, v -> abs(v))) AS BIGINT) AS q_max_abs,
       TRUE AS err_in_bounds
FROM coded
"""


@register("embed_quantize", oracle=_QUANT_ORACLE)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column,
    entirely in array-lambda expressions (codegen, zero shuffle). Emits
    the scale, integer summaries of the code vector (sum / L1 / max-abs
    — enough to pin every code given the oracle recomputes them), and a
    reconstruction-error bound asserted in-query: max_i |x_i -
    q_i*scale| <= scale/2 (+1 ulp guard), which the oracle pins as
    literal TRUE. q_max_abs <= 127 by construction — the codes fit
    int8."""
    e = table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    scaled = e.select(
        "vec_id",
        "embedding",
        (F.array_max(xd) / F.lit(127.0)).alias("scale"),
    ).filter(F.col("scale") > 0)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    coded = scaled.select("vec_id", "scale", "embedding", q.alias("q"))
    recon_err = F.array_max(
        F.zip_with(
            F.col("embedding"),
            F.col("q"),
            lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale")),
        )
    )
    return coded.select(
        "vec_id",
        "scale",
        F.size("q").alias("n_dims"),
        F.aggregate(
            "q", F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("q_sum"),
        F.aggregate(
            "q", F.lit(0).cast("bigint"), lambda acc, v: acc + F.abs(v)
        ).alias("q_l1"),
        F.array_max(F.transform("q", F.abs)).alias("q_max_abs"),
        (recon_err <= F.col("scale") * 0.5 + F.lit(1e-12)).alias("err_in_bounds"),
    )


# Johnson-Lindenstrauss random projection: 64 -> 16 dims. The projection
# matrix is minstd-LCG rationals (stream tag offset 7000 decorrelates it
# from the LSH hyperplanes), regenerable in SQL for the oracle.
RP_K, RP_DIM = 16, 64

_RP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
comps AS (
  SELECT k.k, d.d,
         CAST(((48271 * ((48271 * (7000 + k.k * {RP_DIM} + d.d + 1))
                % 2147483647)) % 2147483647) AS DOUBLE)
             / 2147483647.0 - 0.5 AS comp
  FROM (SELECT unnest(range({RP_K})) AS k) k
  CROSS JOIN (SELECT unnest(range({RP_DIM})) AS d) d
),
planes AS (SELECT k, list(comp ORDER BY d) AS plane FROM comps GROUP BY k),
proj AS (
  SELECT e.vec_id, CAST(p.k AS INT) AS k,
         round(list_dot_product(e.v, p.plane), 6) AS y
  FROM e CROSS JOIN planes p
)
SELECT vec_id, k, y FROM proj
"""


def _rp_plane(k: int) -> list[float]:
    A, M = 48271, 2147483647
    out = []
    for d in range(RP_DIM):
        s0 = 7000 + k * RP_DIM + d + 1
        h1 = (A * s0) % M
        h2 = (A * h1) % M
        out.append(h2 / M - 0.5)
    return out


@register("embed_random_projection", oracle=_RP_ORACLE)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection of the embedding column
    (64 -> 16 dims): K fixed pseudo-random directions, one dot product
    each, all in array expressions — dimensionality reduction at scan
    speed with zero shuffles, the standard pre-step before clustering or
    coarse ANN when the native dimension is too wide to shuffle.

    The projection matrix is minstd-LCG rationals (the engine's public
    reproducible-randomness primitive, same family as the sampling ops
    and SRP-LSH hyperplanes), so both engines regenerate it exactly and
    the projected vectors hash-match bit-for-bit — a random projection
    that is nonetheless deterministic across clusters, re-runs, and
    engines. Output is long form (vec_id, component index, value) —
    scalar columns hash-compare robustly; a consumer pivots or
    array-aggregates as needed."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    comps = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("v"),
                            F.array(*[F.lit(c) for c in _rp_plane(k)]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ).alias("y"),
            )
            for k in range(RP_K)
        ]
    )
    return e.select("vec_id", F.explode(comps).alias("c")).select(
        "vec_id", "c.k", "c.y"
    )
