"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM), but every setting here is
chosen to also be the right default on a large multi-executor cluster:

* AQE on — runtime join-strategy switches, skew-join splitting, and
  shuffle-partition coalescing are the scale levers at 100 TB.
* ``spark.sql.shuffle.partitions`` sized from the environment rather than
  the 200 default (pure overhead locally; far too few at 100 TB — AQE
  coalescing makes a generous initial number safe either way).
* UTC session timezone so timestamp semantics agree with the DuckDB oracle
  and are deployment-independent.
* Arrow on for every pandas-UDF / toPandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _scratch_root() -> str:
    """The catalog's validated scratch root (imported lazily so module
    import order stays free; resolved lazily by the catalog itself)."""
    from kinesis_datastore_app_spark.catalog import scratch_root

    return scratch_root()


def get_spark(
    app_name: str = "kinesis_datastore_app_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` controls both local parallelism and the shuffle-partition
    default; on a real cluster the caller passes ``master`` via
    ``extra_conf``/spark-submit and these settings carry over unchanged.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Joins (optimization guide §3.1/§9): shuffled-hash joins are
        # taken ONLY through AQE's runtime SMJ→SHJ conversion — the
        # plan converts when every post-shuffle partition's build side
        # is MEASURED under 64 MB, so an oversized or misestimated
        # build keeps the sort-merge plan and its graceful spill. The
        # r13 static preference (preferSortMergeJoin=false) is dropped
        # (r14): the r13/r14 verdicts flagged that a statically-planned
        # SHJ from misestimated stats cannot sort-spill at 100 TB, and
        # an interleaved same-session A/B (plans/r14/ab_shj_out.json,
        # 11 keys × 4 rounds × both arms) read every key within noise
        # of 1.0 either way — the measured r13 SHJ wins come from the
        # AQE conversion below, which stays. tests/test_plan_audit.py
        # now pins that no initial (pre-AQE) plan contains a
        # ShuffledHashJoin.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read as long nanos and convert in catalog.table
        # (truncating to micros exactly like DuckDB's scan does).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        # managed-table warehouse in scratch: the default in-memory catalog
        # forgets tables across sessions but their directories persist, so
        # a repo-local spark-warehouse would poison later CREATE TABLEs.
        # catalog.SCRATCH, not the raw env var: the catalog validates the
        # predictable default path (symlink/squat/ownership) once at
        # import — the warehouse must live under the same TRUSTED root
        .config("spark.sql.warehouse.dir", _scratch_root() + "/warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
