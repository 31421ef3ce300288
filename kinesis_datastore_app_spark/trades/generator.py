"""Deterministic StockTrade generator (reference A1/A2/A3, SURVEY.md §1.5).

Reproduces the reference generator's distribution
(StockTradeGenerator.java:62-83):

* uniform ticker from the 25-symbol universe with its mean price (:17-44);
* price = mean × (1 + U(−0.2, +0.2)) rounded HALF_UP to 2 decimals
  (:47, :66-70);
* tradeType = SELL with p = 0.4 else BUY (:53, :73-76);
* quantity uniform in [1, 10000] (:50, :79);
* id monotone from 1 (:56, :82).

Randomness design: instead of `F.rand(seed)` (whose stream depends on the
physical partitioning, so results change with parallelism), uniforms are
derived per-row from the row id with a double-stepped minstd LCG
(Park-Miller 1988: x → 48271·x mod (2³¹−1)) — pure integer arithmetic that
(a) is deterministic under ANY partitioning / cluster size, (b) never
overflows 64-bit (48271·(2³¹−1) < 2⁶³), and (c) is expressible identically
in ANSI SQL, so the DuckDB oracle can regenerate the exact stream and the
driver can hash-verify the generator end to end.

Both the Spark Column expressions and the equivalent SQL text are emitted
from the same spec below — one source of truth, two renderings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_datastore_app_spark.catalog import _ensure_engine_confs

# Ticker universe with mean prices, StockTradeGenerator.java:19-43.
TICKERS: list[tuple[str, float]] = [
    ("AAPL", 119.72), ("XOM", 91.56), ("GOOG", 527.83), ("BRK.A", 223999.88),
    ("MSFT", 42.36), ("WFC", 54.21), ("JNJ", 99.78), ("WMT", 85.91),
    ("CHL", 66.96), ("GE", 24.64), ("NVS", 102.46), ("PG", 85.05),
    ("JPM", 57.82), ("RDS.A", 66.72), ("CVX", 110.43), ("PFE", 33.07),
    ("FB", 74.44), ("VZ", 49.09), ("PTR", 111.08), ("BUD", 120.39),
    ("ORCL", 43.40), ("KO", 41.23), ("T", 34.64), ("DIS", 101.73),
    ("AMZN", 370.56),
]

MAX_DEVIATION = 0.2    # StockTradeGenerator.java:47
MAX_QUANTITY = 10000   # StockTradeGenerator.java:50
PROBABILITY_SELL = 0.4  # StockTradeGenerator.java:53

_A = 48271          # minstd multiplier
_M = 2147483647     # 2^31 - 1

DEFAULT_N = 5000

TRADE_SCHEMA = "tickerSymbol STRING, tradeType STRING, price DOUBLE, quantity BIGINT, id BIGINT"


def _u_col(i: Column, k: int) -> Column:
    """k-th uniform for row i as a Spark column (double in (0,1))."""
    s0 = i * 4 + F.lit(k + 1)
    h1 = (F.lit(_A) * s0) % F.lit(_M)
    h2 = (F.lit(_A) * h1) % F.lit(_M)
    return h2.cast("double") / F.lit(float(_M))


def _u_sql(k: int) -> str:
    """Same uniform as SQL text over a 0-based row id column ``i``."""
    s0 = f"(i * 4 + {k + 1})"
    h1 = f"(({_A} * {s0}) % {_M})"
    h2 = f"(({_A} * {h1}) % {_M})"
    return f"(CAST({h2} AS DOUBLE) / {float(_M)})"


def trade_cols(i: Column) -> list[Column]:
    """The five §1.5 trade columns derived from a 0-based row id ``i``.

    Shared by the batch generator (over spark.range) and the rate-source
    streaming twin (over the rate stream's value column) so both produce
    the bit-identical stream the SQL oracle regenerates.
    """
    symbols = F.array(*[F.lit(t) for t, _ in TICKERS])
    means = F.array(*[F.lit(m) for _, m in TICKERS])
    idx = (F.floor(_u_col(i, 0) * len(TICKERS)) + 1).cast("int")
    mean = F.element_at(means, idx)
    price = F.round(mean * (1 + (_u_col(i, 1) * 2 * MAX_DEVIATION - MAX_DEVIATION)), 2)
    qty = (F.floor(_u_col(i, 2) * MAX_QUANTITY) + 1).cast("bigint")
    trade_type = F.when(_u_col(i, 3) < PROBABILITY_SELL, "SELL").otherwise("BUY")
    return [
        F.element_at(symbols, idx).alias("tickerSymbol"),
        trade_type.alias("tradeType"),
        price.alias("price"),
        qty.alias("quantity"),
        (i + 1).alias("id"),
    ]


def trades(spark: SparkSession, n: int = DEFAULT_N) -> DataFrame:
    """Generate ``n`` StockTrade rows (columns per TRADE_SCHEMA).

    Distributed: spark.range partitions the id space across executors;
    every derived column is a codegen'd expression, so generation scales
    linearly with cores and no Python runs per row.
    """
    # trades queries never pass through catalog.table(), so apply the
    # engine session confs here: without the UTC conf a caller session in
    # another timezone renders arrival_ts shifted vs the naive oracle.
    _ensure_engine_confs(spark)
    return spark.range(n).select(*trade_cols(F.col("id")))


def trades_sql(n: int = DEFAULT_N) -> str:
    """The identical generator as DuckDB SQL (the oracle's twin)."""
    symbols = "[" + ", ".join(f"'{t}'" for t, _ in TICKERS) + "]"
    means = "[" + ", ".join(str(m) for _, m in TICKERS) + "]"
    idx = f"CAST(floor({_u_sql(0)} * {len(TICKERS)}) + 1 AS INT)"
    price = (
        f"round({means}[{idx}] * (1 + ({_u_sql(1)} * {2 * MAX_DEVIATION} "
        f"- {MAX_DEVIATION})), 2)"
    )
    qty = f"CAST(floor({_u_sql(2)} * {MAX_QUANTITY}) + 1 AS BIGINT)"
    ttype = f"CASE WHEN {_u_sql(3)} < {PROBABILITY_SELL} THEN 'SELL' ELSE 'BUY' END"
    return f"""
SELECT {symbols}[{idx}] AS tickerSymbol,
       {ttype} AS tradeType,
       {price} AS price,
       {qty} AS quantity,
       i + 1 AS id
FROM (SELECT CAST(range AS BIGINT) AS i FROM range({n}))
"""
