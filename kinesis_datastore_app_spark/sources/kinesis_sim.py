"""Kinesis-semantics connector via the public Python Data Source API.

Where streaming/source_factory.py SIMULATES Kinesis with file replay,
this module IMPLEMENTS the connector shape with PySpark's Data Source
API (pyspark.sql.datasource, public since Spark 4.0) — the same
contract a real Kinesis connector fills, mapped 1:1:

* shard            → ``InputPartition`` (reference shard enumeration,
                     KinesisSync.java:83-92; shardCount config :49)
* sequence number  → per-shard offset; the stream reader's offset dict
                     (TRIM_HORIZON start = offset 0, KinesisSync.java:96)
* GetRecords limit → ``records_per_batch`` option bounding each
                     micro-batch's offset range (KinesisSync.java:110)
* record envelope  → seq_no / partition_key / data BINARY / arrival_ts
                     (SURVEY.md §1.3)

Payloads are JSON-encoded trades (reference wire format, A5) generated
from an INTEGER-ONLY minstd LCG on the record index: deterministic under
any partitioning, identical from Python, Spark, and ANSI SQL — so the
DuckDB oracle regenerates the full stream and the driver hash-verifies a
custom connector end to end. Prices are integer cents (no float wire
values, no rounding-mode hazards).

At 100 TB: partitions() returning one InputPartition per shard is
exactly how a real connector exposes parallelism — Spark schedules one
task per shard, offsets advance per micro-batch, and the engine's
transformations are identical DataFrame code over this source or the
real one.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from kinesis_datastore_app_spark.registry import register
from kinesis_datastore_app_spark.trades.generator import TICKERS

_A, _M = 48271, 2147483647
MEAN_CENTS = [round(m * 100) for _, m in TICKERS]
SYMBOLS = [t for t, _ in TICKERS]

# arrival_s: integer seconds since the stream epoch. The reader emits an
# INTEGER, not a Python datetime, on purpose: a naive datetime crossing
# the Python-worker -> JVM boundary is interpreted in the PROCESS-local
# timezone but rendered in the SESSION timezone, so results would depend
# on the host TZ. The query layer builds arrival_ts from this integer
# with a naive SQL timestamp literal (interpreted AND rendered in the
# session TZ -> wall-clock stable anywhere, matching the DuckDB oracle).
ENVELOPE_SCHEMA = (
    "shard_id INT, seq_no BIGINT, partition_key STRING, data BINARY, "
    "arrival_s BIGINT"
)

TRADE_SCHEMA = (
    "tickerSymbol STRING, tradeType STRING, price_cents BIGINT, "
    "quantity BIGINT, id BIGINT"
)


def _h(i: int, k: int) -> int:
    """Double-stepped minstd LCG value in [0, M) for record i, stream k."""
    s0 = i * 8 + k + 11
    return (_A * ((_A * s0) % _M)) % _M


def _trade(i: int) -> dict:
    idx = _h(i, 0) % 25
    return {
        "tickerSymbol": SYMBOLS[idx],
        "tradeType": "SELL" if _h(i, 1) % 10 < 4 else "BUY",
        "price_cents": MEAN_CENTS[idx] * (80 + _h(i, 2) % 41) // 100,
        "quantity": 1 + _h(i, 3) % 10000,
        "id": i + 1,
    }


def _rows(shard: int, shards: int, lo: int, hi: int):
    """Envelope rows for one shard over global record indexes [lo, hi)."""
    for i in range(lo, hi):
        if i % shards != shard:
            continue
        t = _trade(i)
        yield (
            shard,
            i // shards,  # per-shard sequence number
            t["tickerSymbol"],
            json.dumps(t, separators=(",", ":")).encode("utf-8"),
            i,
        )


class _ShardRange(InputPartition):
    def __init__(self, shard: int, shards: int, lo: int, hi: int):
        self.shard, self.shards, self.lo, self.hi = shard, shards, lo, hi


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.shards = int(options.get("shards", 4))

    def partitions(self):
        # one InputPartition per shard — the connector's parallelism unit
        return [_ShardRange(s, self.shards, 0, self.n) for s in range(self.shards)]

    def read(self, partition: _ShardRange):
        yield from _rows(partition.shard, partition.shards, partition.lo, partition.hi)


class _StreamReader(DataSourceStreamReader):
    """Offset-based stream reader: offsets are global record indexes;
    each micro-batch advances by records_per_batch (the GetRecords-limit
    analog) and fans out one task per shard."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.shards = int(options.get("shards", 4))
        self.per_batch = int(options.get("records_per_batch", 250))

    def initialOffset(self) -> dict:
        self._latest = 0
        return {"index": 0}  # TRIM_HORIZON: oldest retained record

    def latestOffset(self) -> dict:
        # GetRecords-limit pacing: advertise at most records_per_batch new
        # records per trigger — the admission-control contract; partitions()
        # below must then serve EXACTLY the committed [start, end) range
        self._latest = min(getattr(self, "_latest", 0) + self.per_batch, self.n)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        # Restart safety: after a checkpoint restore Spark skips
        # initialOffset and replays the last planned batch through here —
        # ratchet the advertised watermark to the checkpointed end so the
        # next latestOffset() never advertises an end < committed start.
        self._latest = max(getattr(self, "_latest", 0), hi)
        return [_ShardRange(s, self.shards, lo, hi) for s in range(self.shards)]

    def read(self, partition: _ShardRange):
        yield from _rows(partition.shard, partition.shards, partition.lo, partition.hi)

    def commit(self, end: dict) -> None:
        # same ratchet on commit: a committed end is a floor for progress
        self._latest = max(getattr(self, "_latest", 0), end["index"])


class KinesisSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_sim"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def _register_source(spark: SparkSession) -> None:
    # idempotent: re-registering the same name just overwrites
    spark.dataSource.register(KinesisSimDataSource)


N_RECORDS = 2000
N_SHARDS = 4

_CENTS_LIST = "[" + ", ".join(str(c) for c in MEAN_CENTS) + "]"
_SYM_LIST = "[" + ", ".join(f"'{s}'" for s in SYMBOLS) + "]"


def _h_sql(k: int) -> str:
    s0 = f"(i * 8 + {k + 11})"
    return f"(({_A} * (({_A} * {s0}) % {_M})) % {_M})"


_DECODED_ORACLE = f"""
WITH r AS (SELECT range AS i FROM range({N_RECORDS})),
t AS (
  SELECT i,
         CAST(i % {N_SHARDS} AS INT) AS shard_id,
         i // {N_SHARDS} AS seq_no,
         {_SYM_LIST}[({_h_sql(0)} % 25) + 1] AS tickerSymbol,
         CASE WHEN {_h_sql(1)} % 10 < 4 THEN 'SELL' ELSE 'BUY' END AS tradeType,
         ({_CENTS_LIST}[({_h_sql(0)} % 25) + 1] * (80 + {_h_sql(2)} % 41)) // 100 AS price_cents,
         1 + {_h_sql(3)} % 10000 AS quantity,
         i + 1 AS trade_id,
         TIMESTAMP '2024-06-01 00:00:00' + i * INTERVAL 1 SECOND AS arrival_ts
  FROM r
)
SELECT shard_id, seq_no, tickerSymbol, tradeType, price_cents, quantity,
       trade_id, arrival_ts
FROM t
"""


@register("source_custom_datasource", oracle=_DECODED_ORACLE)
def source_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read through the custom connector: shard partitions, envelope
    schema, JSON wire decode (A6) — the oracle regenerates the identical
    stream from the integer LCG spec, hash-verifying a Python Data Source
    implementation end to end."""
    _register_source(spark)
    env = (
        spark.read.format("kinesis_sim")
        .option("n", N_RECORDS)
        .option("shards", N_SHARDS)
        .load()
    )
    d = F.from_json(F.col("data").cast("string"), TRADE_SCHEMA)
    return env.select(
        "shard_id",
        "seq_no",
        d.getField("tickerSymbol").alias("tickerSymbol"),
        d.getField("tradeType").alias("tradeType"),
        d.getField("price_cents").alias("price_cents"),
        d.getField("quantity").alias("quantity"),
        d.getField("id").alias("trade_id"),
        F.expr(
            "TIMESTAMP '2024-06-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, 0, 0, arrival_s)"
        ).alias("arrival_ts"),
    )


@register("source_custom_stream", oracle=_DECODED_ORACLE)
def source_custom_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same connector consumed as a STREAM: latestOffset advertises at
    most records_per_batch new records per trigger (GetRecords-limit
    pagination — 4 micro-batches here), partitions fan out per shard.
    Content equality with the batch oracle proves no loss or duplication
    across micro-batch offset boundaries — the exactly-once contract the
    reference's best-effort put lacks (KinesisSync.java:164-168)."""
    import tempfile
    import time
    import uuid

    _register_source(spark)
    env = (
        spark.readStream.format("kinesis_sim")
        .option("n", N_RECORDS)
        .option("shards", N_SHARDS)
        .option("records_per_batch", 500)
        .load()
    )
    d = F.from_json(F.col("data").cast("string"), TRADE_SCHEMA)
    out = env.select(
        "shard_id",
        "seq_no",
        d.getField("tickerSymbol").alias("tickerSymbol"),
        d.getField("tradeType").alias("tradeType"),
        d.getField("price_cents").alias("price_cents"),
        d.getField("quantity").alias("quantity"),
        d.getField("id").alias("trade_id"),
        F.expr(
            "TIMESTAMP '2024-06-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, 0, 0, arrival_s)"
        ).alias("arrival_ts"),
    )
    name = f"kinesis_sim_out_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kdas_ksim_"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.table(name).count() >= N_RECORDS:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination()
    return spark.table(name)
