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

from kinesis_datastore_app_spark.numerics import _MINSTD_A as _A
from kinesis_datastore_app_spark.numerics import _MINSTD_M as _M
from kinesis_datastore_app_spark.numerics import lcg2
from kinesis_datastore_app_spark.registry import register
from kinesis_datastore_app_spark.trades.generator import TICKERS

MEAN_CENTS = [round(m * 100) for _, m in TICKERS]
SYMBOLS = [t for t, _ in TICKERS]
# one symbol-count constant for every derivation (Python row gen, hash
# routing, and the SQL oracle below) — they must agree record-for-record
N_SYM = len(SYMBOLS)

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
    """Double-stepped minstd value for record i, stream k (shared
    primitive: numerics.lcg2 — module-level import: this runs 4x per
    record on the executor hot path, and the constants feeding _h_sql
    come from numerics too, so the SQL oracle can never desynchronize
    from the Python rows)."""
    return lcg2(i * 8 + k + 11)


def _trade(i: int) -> dict:
    idx = _h(i, 0) % N_SYM
    return {
        "tickerSymbol": SYMBOLS[idx],
        "tradeType": "SELL" if _h(i, 1) % 10 < 4 else "BUY",
        "price_cents": MEAN_CENTS[idx] * (80 + _h(i, 2) % 41) // 100,
        "quantity": 1 + _h(i, 3) % 10000,
        "id": i + 1,
    }


def _rows(shard: int, shards: int, lo: int, hi: int):
    """Envelope rows for one shard over global record indexes [lo, hi).
    Strided iteration over the shard's OWN indexes — the modulo-filter
    form looped the full global range in every shard task (O(n*shards)
    total work replicated into every micro-batch; round-8 review)."""
    first = lo + (shard - lo) % shards
    for i in range(first, hi, shards):
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


# --------------------------------------------------------------------------
# Resharding (shard split / merge) — the scale lever of a real Kinesis-style
# stream. A production stream at 100 TB/day does not run a static shard set:
# throughput growth forces SplitShard, decay forces MergeShards, and the
# connector must (a) route records by partition-key hash range (the contract
# SplitShard/MergeShards manipulate), (b) track shard LINEAGE (children name
# their closed parents), and (c) preserve per-key order across the
# parent->child handoff. The static-shard readers above model the reference's
# fixed 1-shard world (KinesisSync.java:49); this mode models the part a
# production connector adds on top. Enabled via a `reshard` option (JSON
# event list); the registered keys above keep the static layout, so this
# mode is exercised by the property/fault suites, not the oracle registry.
#
# Hash routing uses MD5 of the partition key over a 2^16 hash space —
# the same construction Kinesis documents for PutRecord routing.
# Sequence numbers in reshard mode are the global record index: opaque,
# strictly increasing over time, unique per stream — so "per-key order
# survives the handoff" is checkable as: each key's seq_nos are increasing
# and its owning-shard sequence follows the lineage graph.
# --------------------------------------------------------------------------

HASH_SPACE = 1 << 16


def _key_hash(key: str) -> int:
    import hashlib

    return int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % HASH_SPACE


class ShardSpan:
    """One shard's lifetime: id, owned hash range [hash_lo, hash_hi),
    parents it was created from, and the [open_i, close_i) global-index
    window during which it is the range's owner (close_i None = still
    open at stream end)."""

    __slots__ = ("shard_id", "hash_lo", "hash_hi", "parents", "open_i", "close_i")

    def __init__(self, shard_id, hash_lo, hash_hi, parents, open_i, close_i=None):
        self.shard_id = shard_id
        self.hash_lo = hash_lo
        self.hash_hi = hash_hi
        self.parents = tuple(parents)
        self.open_i = open_i
        self.close_i = close_i

    def as_tuple(self):
        return (
            self.shard_id,
            self.hash_lo,
            self.hash_hi,
            self.parents,
            self.open_i,
            self.close_i,
        )


def shard_lineage(shards: int, events: list[dict]) -> list[ShardSpan]:
    """Build the shard lineage table for an initial even hash-range split
    plus a sequence of reshard events, each
    ``{"at": i, "op": "split", "shard": id}`` or
    ``{"at": i, "op": "merge", "shards": [a, b]}`` (a, b hash-adjacent),
    applied in increasing ``at`` order. New shards take fresh increasing
    ids and record their parents — the DescribeStream lineage a consumer
    walks to order parents before children. Raises ValueError on
    out-of-order events, unknown/closed shards, or non-adjacent merges.

    Invariant (property-tested): at every record index the OPEN shards'
    hash ranges exactly partition [0, HASH_SPACE) — splits and merges
    move range ownership, never lose or overlap it."""
    spans = [
        ShardSpan(
            s,
            s * HASH_SPACE // shards,
            (s + 1) * HASH_SPACE // shards,
            (),
            0,
        )
        for s in range(shards)
    ]
    next_id = shards
    last_at = 0
    for ev in events:
        at = int(ev["at"])
        if at < last_at:
            raise ValueError(f"reshard events out of order at index {at}")
        last_at = at
        open_spans = {sp.shard_id: sp for sp in spans if sp.close_i is None}
        if ev["op"] == "split":
            sid = int(ev["shard"])
            if sid not in open_spans:
                raise ValueError(f"split of unknown/closed shard {sid}")
            p = open_spans[sid]
            if p.hash_hi - p.hash_lo < 2:
                raise ValueError(f"shard {sid} range too narrow to split")
            p.close_i = at
            mid = (p.hash_lo + p.hash_hi) // 2
            spans.append(ShardSpan(next_id, p.hash_lo, mid, (sid,), at))
            spans.append(ShardSpan(next_id + 1, mid, p.hash_hi, (sid,), at))
            next_id += 2
        elif ev["op"] == "merge":
            a, b = (int(x) for x in ev["shards"])
            if a not in open_spans or b not in open_spans:
                raise ValueError(f"merge of unknown/closed shards {a},{b}")
            pa, pb = open_spans[a], open_spans[b]
            if pa.hash_lo > pb.hash_lo:
                pa, pb = pb, pa
            if pa.hash_hi != pb.hash_lo:
                raise ValueError(f"merge of non-adjacent shards {a},{b}")
            pa.close_i = at
            pb.close_i = at
            spans.append(
                ShardSpan(next_id, pa.hash_lo, pb.hash_hi, (pa.shard_id, pb.shard_id), at)
            )
            next_id += 1
        else:
            raise ValueError(f"unknown reshard op {ev['op']!r}")
    return spans


def _reshard_rows(span_t, lo: int, hi: int):
    """Envelope rows owned by one shard span over global indexes [lo, hi):
    records whose partition-key hash falls in the span's range, clipped to
    the span's open window. seq_no = global index (monotone per stream,
    hence per shard and per key)."""
    shard_id, h_lo, h_hi, _parents, open_i, close_i = span_t
    start = max(lo, open_i)
    stop = min(hi, close_i) if close_i is not None else hi
    # filter-before-generate (the static _rows pattern): routing needs
    # only the ticker symbol (one LCG value, the same derivation _trade
    # uses), so the full trade is built solely for owned indexes — the
    # per-batch work stays O(range) per shard, not O(range * fields)
    owned = [_key_hash(s) for s in SYMBOLS]
    for i in range(start, stop):
        if not (h_lo <= owned[_h(i, 0) % N_SYM] < h_hi):
            continue
        t = _trade(i)
        yield (
            shard_id,
            i,
            t["tickerSymbol"],
            json.dumps(t, separators=(",", ":")).encode("utf-8"),
            i,
        )


def _reshard_partitions(spans, lo: int, hi: int):
    """InputPartitions for the shard spans whose open window intersects
    [lo, hi) — one task per live shard per micro-batch, the same
    parallelism contract as the static readers."""
    out = []
    for sp in spans:
        stop = sp.close_i if sp.close_i is not None else hi
        if max(lo, sp.open_i) < min(hi, stop):
            out.append(_SpanRange(sp.as_tuple(), lo, hi))
    if not out:
        # degenerate range (n=0 stream, or a replayed empty batch):
        # the Data Source API wants >=1 partition, so serve one that
        # yields nothing rather than an empty plan
        out.append(_SpanRange((0, 0, 0, (), 0, 0), lo, lo))
    return out


class _SpanRange(InputPartition):
    def __init__(self, span_t, lo, hi):
        self.span_t, self.lo, self.hi = span_t, lo, hi


def _parse_reshard(options):
    spec = options.get("reshard")
    if not spec:
        return None
    return shard_lineage(
        int(options.get("shards", 4)), json.loads(spec)
    )


class _ReshardBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.spans = _parse_reshard(options)

    def partitions(self):
        return _reshard_partitions(self.spans, 0, self.n)

    def read(self, partition: _SpanRange):
        yield from _reshard_rows(partition.span_t, partition.lo, partition.hi)


class _ReshardStreamReader(_StreamReader):
    """Stream reader over a resharding shard set: offset machinery
    (initialOffset / latestOffset pacing / commit, and the restart
    ratchet) is INHERITED from _StreamReader — one copy of the
    checkpoint-restore semantics — but each planned batch fans out one
    task per shard OPEN anywhere inside the batch's range. A batch
    spanning a reshard boundary carries the parent's final records and
    the children's first records in seq_no order, which is exactly the
    parent-before-child handoff contract."""

    def __init__(self, options):
        super().__init__(options)
        self.spans = _parse_reshard(options)

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        # same restart-safety ratchet as the parent's partitions()
        self._latest = max(getattr(self, "_latest", 0), hi)
        return _reshard_partitions(self.spans, lo, hi)

    def read(self, partition: _SpanRange):
        yield from _reshard_rows(partition.span_t, partition.lo, partition.hi)


class KinesisSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_sim"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def reader(self, schema):
        if self.options.get("reshard"):
            return _ReshardBatchReader(self.options)
        return _BatchReader(self.options)

    def streamReader(self, schema):
        if self.options.get("reshard"):
            return _ReshardStreamReader(self.options)
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
         {_SYM_LIST}[({_h_sql(0)} % {N_SYM}) + 1] AS tickerSymbol,
         CASE WHEN {_h_sql(1)} % 10 < 4 THEN 'SELL' ELSE 'BUY' END AS tradeType,
         ({_CENTS_LIST}[({_h_sql(0)} % {N_SYM}) + 1] * (80 + {_h_sql(2)} % 41)) // 100 AS price_cents,
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
    return _decode_envelope(env)


def _decode_envelope(env: DataFrame) -> DataFrame:
    """THE wire-decode projection (lenient from_json + field extraction +
    session-TZ-stable arrival_ts) — single definition shared by the batch
    and stream connector keys, whose outputs the shared _DECODED_ORACLE
    asserts identical (round-8 review: two verbatim copies had to be
    edited in lockstep)."""
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
    reference's best-effort put lacks (KinesisSync.java:164-168).

    Execution rides the shared _run_wallclock_to_memory scaffolding
    (round-10 review: this function carried a drifted copy of that loop
    MINUS its raise-on-shortfall guard and memory-sink release — a
    timeout here returned a partial table that would surface later as a
    confusing oracle hash mismatch, and the sink leaked one driver-pinned
    table per invocation). Function-level import: queries.py does not
    import this module, but keep the load order decoupled anyway."""
    from kinesis_datastore_app_spark.streaming.queries import (
        _run_wallclock_to_memory,
    )

    _register_source(spark)
    env = (
        spark.readStream.format("kinesis_sim")
        .option("n", N_RECORDS)
        .option("shards", N_SHARDS)
        .option("records_per_batch", 500)
        .load()
    )
    return _run_wallclock_to_memory(
        _decode_envelope(env),
        "kinesis_sim_out",
        N_RECORDS,
        "300 milliseconds",
        "kdas_ksim_",
        timeout_s=90.0,
    )
