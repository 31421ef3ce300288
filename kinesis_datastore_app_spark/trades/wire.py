"""Lenient JSON wire format + envelope (reference A5/A6/A12/A13, §1.2-1.3).

Encode: `to_json(struct(...)).cast("binary")` — the engine twin of Jackson
`writeValueAsBytes` (StockTrade.java:65-71).

Decode: `from_json(cast(data as string), TRADE_SCHEMA)` in the default
PERMISSIVE mode — exactly the reference's leniency
(FAIL_ON_UNKNOWN_PROPERTIES=false, StockTrade.java:15-18): unknown JSON
fields ignored, missing fields null, unparseable payload → null row.

Envelope (§1.3): seq_no (per-partition-key total order — the Kinesis
sequence number), partition_key (= tickerSymbol, KinesisSync.java:158),
data (binary payload), arrival_ts (ingest time at the reference's ~10
records/sec pacing, KinesisSync.java:135).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.trades.generator import TRADE_SCHEMA

TRADE_COLS = ("tickerSymbol", "tradeType", "price", "quantity", "id")

# epoch micros of 2024-01-01T00:00:00Z — arbitrary fixed stream start
_BASE_US = 1_704_067_200_000_000
_PACING_US = 100_000  # 100 ms between puts, KinesisSync.java:135


def encode(df: DataFrame) -> DataFrame:
    """Trade rows → wire rows (id kept alongside for envelope assembly)."""
    return df.select(
        "tickerSymbol",
        "id",
        F.to_json(F.struct(*TRADE_COLS)).cast("binary").alias("data"),
    )


def decode(data: Column) -> Column:
    """Binary JSON payload → trade struct (PERMISSIVE: corrupt → null)."""
    return F.from_json(data.cast("string"), TRADE_SCHEMA)


def envelope(df: DataFrame) -> DataFrame:
    """Wrap trades in the stream envelope: seq_no, partition_key, data,
    arrival_ts.

    seq_no is a row_number per partition_key ordered by id — the engine
    analog of Kinesis assigning per-shard monotone sequence numbers to
    keyed puts. One shuffle on the key; at scale this is the same hash
    distribution the keyed sink needs anyway, so the exchange is reused.
    """
    w = Window.partitionBy("tickerSymbol").orderBy("id")
    return encode(df).select(
        F.row_number().over(w).cast("bigint").alias("seq_no"),
        F.col("tickerSymbol").alias("partition_key"),
        "data",
        F.timestamp_micros(_BASE_US + F.col("id") * _PACING_US).alias("arrival_ts"),
    )


def display(id_c, trade_type, quantity, ticker, price) -> Column:
    """StockTrade.toString (StockTrade.java:81-86, A13) — THE format
    string, defined once; column-parameterized so both the raw-trade
    and decoded-envelope shapes render through it."""
    return F.format_string(
        "ID %d: %s %d shares of %s for $%.2f",
        id_c,
        trade_type,
        quantity,
        ticker,
        price,
    )
