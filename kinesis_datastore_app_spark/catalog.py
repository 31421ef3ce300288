"""Fixture-table catalog: load the driver-generated parquet tables.

The fixture corpus (see /root/repo/FIXTURES.md) lives at
``/root/testdata/sf{0.001,0.01,0.1}/<table>.parquet``. All operators load
through :func:`table` so scans stay uniform (and a future move to a real
catalog / Delta / Iceberg touches one function).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — TPC-H
# region/nation are fixed-size; supplier/part/customer grow with SF but stay
# far under the broadcast threshold at the scales we target locally. At
# 100 TB, Catalyst's size-based broadcast decision (plus the explicit
# broadcast() hints in operators/joins.py for the fixed-size dims) keeps
# these joins shuffle-free.
SMALL_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scratch_tag(sf_dir: str, name: str) -> str:
    """Cache key for scratch artifacts derived from one fixture table:
    ``<sf-basename>-<size>-<mtime>`` of the source parquet. Keying on a
    content fingerprint (not just the basename) means a regenerated
    fixture, or two datasets sharing a directory name, can never
    silently reuse each other's scratch data — the stale dir is simply
    never addressed again. Works for single-file and directory layouts.
    """
    src = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if os.path.isdir(src):
        sts = [
            os.stat(os.path.join(src, f))
            for f in sorted(os.listdir(src))
            if not f.startswith((".", "_"))
        ]
        size = sum(s.st_size for s in sts)
        mtime = max((s.st_mtime_ns for s in sts), default=0)
    else:
        st = os.stat(src)
        size, mtime = st.st_size, st.st_mtime_ns
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return f"{base}-{size:x}-{mtime:x}"


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Make a caller-provided SparkSession safe for the engine (the driver
    constructs its own session, not session.get_spark()). Both are runtime
    SQL confs: nanosAsLong lets the reader accept events.parquet's
    TIMESTAMP(NANOS); UTC makes timestamp rendering agree with the
    timezone-naive DuckDB oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (columnar parquet; Catalyst prunes/pushes)."""
    _ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Fixture generations have stored ts as TIMESTAMP(NANOS) (read as
        # long via nanosAsLong → truncate to micros) or TIMESTAMP_NTZ
        # micros (cast to the session-TZ instant; session tz is pinned
        # UTC above, so the wall clock — and the DuckDB naive-timestamp
        # oracle comparison — is unchanged). Branch on the read type so
        # either fixture vintage loads identically.
        dt = df.schema["ts"].dataType.simpleString()
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
