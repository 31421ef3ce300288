"""Registered operators for the reference stream semantics (SURVEY.md §2.A).

Because the generator is expressible as pure arithmetic SQL
(generator.py), every operator in the reference's produce/consume pipeline
gets a REAL DuckDB oracle — the driver hash-verifies generation, wire
round-trip, envelope ordering, keyed sink, and double-send dedup, not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.registry import register
from kinesis_datastore_app_spark.trades import wire
from kinesis_datastore_app_spark.trades.generator import DEFAULT_N, trades, trades_sql

_GEN_SQL = trades_sql(DEFAULT_N)


@register("trades_generate", oracle=_GEN_SQL)
def trades_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3: the seeded random-trade source, §1.5 distribution."""
    return trades(spark, DEFAULT_N)


@register("trades_roundtrip", oracle=_GEN_SQL)
def trades_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6: encode every trade to JSON bytes, decode back, return the
    decoded fields. Hash-equality with the generator oracle proves the
    wire format is lossless (the reference's Jackson round-trip,
    StockTrade.java:65-79)."""
    t = trades(spark, DEFAULT_N)
    decoded = wire.encode(t).select(wire.decode(F.col("data")).alias("t"))
    return decoded.select(
        F.col("t.tickerSymbol").alias("tickerSymbol"),
        F.col("t.tradeType").alias("tradeType"),
        F.col("t.price").alias("price"),
        F.col("t.quantity").alias("quantity"),
        F.col("t.id").alias("id"),
    )


_LENIENT_ORACLE = """
SELECT * FROM (VALUES
  (1, 'AAPL', 'BUY',  119.72, CAST(100 AS BIGINT), CAST(1 AS BIGINT)),
  (2, 'XOM',  'SELL', 91.56,  CAST(5 AS BIGINT),   CAST(2 AS BIGINT)),
  (3, '123',  'false', NULL,  NULL,                CAST(3 AS BIGINT)),
  (4, NULL,   NULL,   NULL,   NULL,                NULL),
  (5, 'GE',   'BUY',  NULL,   NULL,                CAST(5 AS BIGINT))
) AS t(case_id, tickerSymbol, tradeType, price, quantity, id)
"""


@register("trades_wire_lenient", oracle=_LENIENT_ORACLE)
def trades_wire_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 leniency matrix (StockTrade.java:15-18,73-79):

    1. clean payload → full decode;
    2. payload with UNKNOWN extra field → extra ignored, rest decoded;
    3. wrong-typed fields → scalars coerce to string (Jackson-compatible);
       non-numeric strings in numeric fields → null for those fields;
    4. corrupt (truncated) JSON → all-null row;
    5. missing fields → nulls, present fields decoded.
    """
    payloads = [
        (1, '{"tickerSymbol":"AAPL","tradeType":"BUY","price":119.72,"quantity":100,"id":1}'),
        (2, '{"tickerSymbol":"XOM","tradeType":"SELL","price":91.56,"quantity":5,"id":2,'
            '"unknownField":"ignored","another":42}'),
        (3, '{"tickerSymbol":123,"tradeType":false,"price":"notanumber","quantity":"x","id":3}'),
        (4, '{"tickerSymbol":"BRK.A","tradeType":'),
        (5, '{"tickerSymbol":"GE","tradeType":"BUY","id":5}'),
    ]
    df = spark.createDataFrame(payloads, "case_id INT, payload STRING")
    t = wire.decode(F.col("payload").cast("binary"))
    return df.select(
        "case_id",
        t.getField("tickerSymbol").alias("tickerSymbol"),
        t.getField("tradeType").alias("tradeType"),
        t.getField("price").alias("price"),
        t.getField("quantity").alias("quantity"),
        t.getField("id").alias("id"),
    )


_ENVELOPE_ORACLE = f"""
WITH gen AS ({_GEN_SQL}),
env AS (
  SELECT row_number() OVER (PARTITION BY tickerSymbol ORDER BY id) AS seq_no,
         tickerSymbol AS partition_key,
         TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL 100 MILLISECOND
           AS arrival_ts,
         tradeType, price, quantity, id
  FROM gen
)
SELECT seq_no, partition_key, arrival_ts,
       printf('ID %d: %s %d shares of %s for $%.2f',
              id, tradeType, quantity, partition_key, price) AS display
FROM env
ORDER BY partition_key, seq_no
LIMIT 1000
"""


@register("trades_envelope_scan", oracle=_ENVELOPE_ORACLE)
def trades_envelope_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10+A11+A12+A13: the consumer pipeline — scan the stream from the
    oldest record (TRIM_HORIZON, KinesisSync.java:96), in per-key sequence
    order (:118-122), capped at 1000 records (:110), decoding each payload
    and emitting the display projection (StockTrade.java:81-86)."""
    env = wire.envelope(trades(spark, DEFAULT_N))
    t = wire.decode(F.col("data"))
    return (
        env.select(
            "seq_no",
            "partition_key",
            "arrival_ts",
            wire.display(
                t.getField("id"),
                t.getField("tradeType"),
                t.getField("quantity"),
                F.col("partition_key"),
                t.getField("price"),
            ).alias("display"),
        )
        .orderBy("partition_key", "seq_no")
        .limit(1000)
    )


@register("trades_sink_keyed", oracle=_GEN_SQL)
def trades_sink_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: the keyed partitioned sink — trades hash-distributed by ticker
    (the PutRecord partition key, KinesisSync.java:158), one directory per
    key, then read back. Hash-equality with the generator oracle proves
    no loss/duplication through the sink. At scale: repartition(key) +
    partitionBy(key) writes each key's rows from one task — preserving
    per-key order the way a Kinesis shard does. Fresh per-run scratch
    dir (age-gated GC, tmpdirs): a fixed shared path would let one
    process's overwrite delete the files under another's read-back."""
    from kinesis_datastore_app_spark.tmpdirs import scratch_tmpdir

    path = scratch_tmpdir("kdas_trades_sink_")
    t = trades(spark, DEFAULT_N)
    (
        t.repartition(F.col("tickerSymbol"))
        .sortWithinPartitions("tickerSymbol", "id")
        .write.mode("overwrite")
        .partitionBy("tickerSymbol")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.select(
        F.col("tickerSymbol").cast("string").alias("tickerSymbol"),
        "tradeType",
        "price",
        "quantity",
        "id",
    )


@register("trades_dedup_double_send", oracle=_GEN_SQL)
def trades_dedup_double_send(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The async-v2 double-send quirk (KinesisAsync.java:96-97): every
    trade hits the stream twice with the same id. Keyed dedup restores the
    logical stream — hash-equality with the single-copy generator."""
    t = trades(spark, DEFAULT_N)
    return t.unionAll(t).dropDuplicates(["id"])


_GATE_ORACLE = """
SELECT 'java-test-stream' AS stream_name,
       'ACTIVE' AS stream_status,
       1 AS shard_count
"""


@register("trades_validate_gate", oracle=_GATE_ORACLE)
def trades_validate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: the stream-status gate (KinesisSync.java:171-188) — a predicate
    on a metadata view; the engine raises before running a query against a
    non-ACTIVE stream instead of System.exit(1)."""
    meta = spark.range(1).select(
        F.lit("java-test-stream").alias("stream_name"),
        F.lit("ACTIVE").alias("stream_status"),
        F.lit(1).alias("shard_count"),
    )
    active = meta.filter(F.col("stream_status") == "ACTIVE")
    if active.isEmpty():  # pragma: no cover - the ACTIVE fixture never trips it
        raise RuntimeError("stream is not ACTIVE")
    return active


@register("trades_ddl_create_drop", oracle=_GEN_SQL)
def trades_ddl_create_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/A16: stream DDL — createStream/deleteStream (dead code in the
    reference, KinesisSync.java:48-74) map to Spark SQL CREATE/DROP TABLE.
    Creates a managed table from the generated stream, reads it back via
    SQL, and drops a scratch twin to exercise both statements."""
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS kdas")
    trades(spark, DEFAULT_N).createOrReplaceTempView("trades_src")
    spark.sql("DROP TABLE IF EXISTS kdas.trades_stream")
    # the in-memory catalog forgets tables across sessions but their
    # directories persist — clear the location so CREATE TABLE can't
    # collide with a previous session's leftovers
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/kdas.db/trades_stream", ignore_errors=True)
    spark.sql(
        "CREATE TABLE kdas.trades_stream USING parquet AS SELECT * FROM trades_src"
    )
    spark.sql("DROP TABLE IF EXISTS kdas.trades_scratch")
    # same stale-location guard as trades_stream: a run killed between
    # the scratch CTAS and its DROP leaves a directory the forgotten
    # catalog can't drop, failing every later CTAS on non-empty location
    shutil.rmtree(f"{warehouse}/kdas.db/trades_scratch", ignore_errors=True)
    spark.sql("CREATE TABLE kdas.trades_scratch USING parquet AS SELECT 1 AS x")
    spark.sql("DROP TABLE kdas.trades_scratch")  # A16
    return spark.sql(
        "SELECT tickerSymbol, tradeType, price, quantity, id FROM kdas.trades_stream"
    )


_SHARDS_ORACLE = f"""
WITH gen AS ({_GEN_SQL})
SELECT tickerSymbol AS shard_key,
       COUNT(*) AS n_records,
       MIN(id) AS min_id,
       MAX(id) AS max_id
FROM gen
GROUP BY tickerSymbol
"""


@register("trades_shard_enumeration", oracle=_SHARDS_ORACLE)
def trades_shard_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: shard enumeration — the reference pages DescribeStream until
    hasMoreShards is false (KinesisSync.java:83-92). The engine analog:
    enumerate the keyed sink's partitions (one directory per partition
    key) with per-shard record counts and id ranges, via partition
    discovery on the sink path. Unlike the reference's consumer — which
    reads only the LAST shard (KinesisSync.java:90,97) and would drop
    data on a multi-shard stream — the engine reads all of them. Fresh
    per-run scratch dir (age-gated GC), same rationale as the sink."""
    from kinesis_datastore_app_spark.tmpdirs import scratch_tmpdir

    path = scratch_tmpdir("kdas_trades_shards_")
    t = trades(spark, DEFAULT_N)
    (
        t.repartition(F.col("tickerSymbol"))
        .write.mode("overwrite")
        .partitionBy("tickerSymbol")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy(F.col("tickerSymbol").cast("string").alias("shard_key")).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )
