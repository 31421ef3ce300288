"""Mirror of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL over the same parquet
fixtures and asserts row count + column names + EXACT values (floats are
compared bit-exactly: the engine's numerics discipline is supposed to make
Spark and DuckDB agree bitwise, and this harness is what proves it before
the driver's value-hash does).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from kinesis_datastore_app_spark.catalog import TABLES


def connect_views(sf_dir: str):
    """DuckDB connection with every fixture table registered as a view —
    THE single definition of the oracle-side setup (round-10 review:
    tools/sweep.py carried a verbatim copy; a fixture-layout change must
    land once or the sweep silently diverges from the gate it mirrors)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    return connect_views(sf_dir).execute(sql).fetchdf()


def _norm(v):
    """Normalize one cell to a comparable canonical value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # canonicalize -0.0: sign-of-zero is not part of
            # the parity contract (tuple == treats them equal anyway) and
            # repr('-0.0') would destabilize the row sort
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1:  # numpy array
        return tuple(_norm(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    def _is_seq(v):
        return isinstance(v, (list, tuple)) or getattr(v, "ndim", 0) >= 1

    for t in df[cols].itertuples(index=False, name=None):
        row = tuple(_norm(pd.NA if pd.isna(v) and not _is_seq(v) else v)
                    if not _is_seq(v) else _norm(v)
                    for v in t)
        row = tuple(None if r is pd.NA else r for r in row)
        out.append(row)
    out.sort(key=lambda r: tuple(repr(x) for x in r))
    return out


def _kind_check(spdf: pd.DataFrame, oracle_df: pd.DataFrame, key: str) -> None:
    """Fail on integer-vs-float dtype divergence between the engines.

    The driver's value-hash is type-sensitive, but Python's ``1.0 == 1``
    is True — so an oracle column DuckDB widens to HUGEINT/DOUBLE
    (fetchdf renders HUGEINT as float64) against a Spark BIGINT passed
    this harness while failing the driver (round-9 ``maintenance_vacuum``:
    an uncast ``SUM(BIGINT)`` is HUGEINT in DuckDB). Only the int↔float
    kind flip is gated: nullable ints legitimately surface as float64 on
    BOTH sides, and Decimal/array columns arrive as object dtype."""
    def _is_decimal_col(s: pd.Series) -> bool:
        if s.dtype.kind != "O":
            return False
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            return isinstance(v, Decimal)
        return False

    for c in spdf.columns:
        sk, ok = spdf[c].dtype.kind, oracle_df[c].dtype.kind
        int_kinds, float_kinds = ("i", "u"), ("f",)
        if (sk in int_kinds and ok in float_kinds) or (
            sk in float_kinds and ok in int_kinds
        ):
            raise AssertionError(
                f"{key}: column {c!r} dtype-kind mismatch spark={spdf[c].dtype} "
                f"duckdb={oracle_df[c].dtype} — likely an uncast DuckDB "
                f"HUGEINT/DOUBLE aggregate (CAST the oracle output) or a "
                f"missing cast on the Spark side; the driver's value-hash "
                f"distinguishes these even though == does not"
            )
        # Decimal-object vs numeric is the same class one step wider
        # (round-10 tooling review): _norm folds Decimal→float, so a
        # Spark DecimalType output against DuckDB's float64 rendering
        # compares equal here while losing exactness past 2^53 and
        # diverging under the driver's type-sensitive value-hash. The
        # repo discipline is to CAST outputs to DOUBLE/BIGINT — flag
        # the uncast column, don't normalize it away.
        sd, od = _is_decimal_col(spdf[c]), _is_decimal_col(oracle_df[c])
        if (sd and ok in "iuf") or (od and sk in "iuf"):
            raise AssertionError(
                f"{key}: column {c!r} is Decimal-object on one side only "
                f"(spark={spdf[c].dtype}, duckdb={oracle_df[c].dtype}) — "
                f"CAST the output to DOUBLE/BIGINT on both sides; float "
                f"folding would hide exactness loss past 2^53"
            )


def compare(spark_df, oracle_df: pd.DataFrame, key: str) -> None:
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_df.columns), (
        f"{key}: column mismatch spark={sorted(spdf.columns)} "
        f"duckdb={sorted(oracle_df.columns)}"
    )
    _kind_check(spdf, oracle_df, key)
    assert len(spdf) == len(oracle_df), (
        f"{key}: row count spark={len(spdf)} duckdb={len(oracle_df)}"
    )
    srows, orows = _rows(spdf), _rows(oracle_df)
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{key}: row {i} differs\n spark={a}\nduckdb={b}"


def run_check(spark, key: str, sf_dir: str) -> None:
    from kinesis_datastore_app_spark import registry

    qs, oracles = registry.queries(), registry.oracle_sql()
    sdf = qs[key](spark, sf_dir)
    if key in oracles:
        compare(sdf, duckdb_run(oracles[key], sf_dir), key)
    else:
        # rows-only: materializes without error, schema is stable
        n = sdf.count()
        assert n >= 0 and len(sdf.columns) > 0
