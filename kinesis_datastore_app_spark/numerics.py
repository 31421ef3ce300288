"""Exact-decimal aggregation helpers for oracle-identical float math.

Problem: ``SUM(double)`` is order-dependent; Spark sums in partition order,
DuckDB in its own order, so an exact value-hash comparison would flake.

Fix: the fixture corpus's double columns hold 2-decimal-clean values
(verified against the parquet footers; the one exception, ``o_totalprice``,
is never SUM-aggregated in an oracle-checked query), so every arithmetic
combination of them (price*(1-disc), price*(1-disc)*(1+tax), x², x*y, …)
has a KNOWN small number of true decimal places and magnitude < 2^53 when
scaled — i.e. the true value is exactly representable. A per-row double
computation lands within a few ulp of that true value in BOTH engines (IEEE
arithmetic), so casting the double to a DECIMAL at the true scale recovers
the exact value identically on both sides. Decimal addition is exact and
associative → any aggregation order gives the identical sum; a final cast
back to DOUBLE is deterministic.

Pattern (mirror the same casts in the oracle SQL):

    Spark:  F.sum(expr.cast("decimal(38,4)")).cast("double")
    DuckDB: CAST(SUM(CAST(expr AS DECIMAL(38,4))) AS DOUBLE)

At scale this costs little: decimal arithmetic stays inside whole-stage
codegen on the JVM and the partial-aggregate (map-side combine) structure
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, scale: int = 2, prec: int = 38) -> Column:
    """Order-independent SUM of a double expr with ≤``scale`` true decimals."""
    return F.sum(_col(c).cast(f"decimal({prec},{scale})")).cast("double")


def davg(c: Column | str, scale: int = 2, prec: int = 38) -> Column:
    """Order-independent AVG (no-null columns): exact sum / COUNT(*).

    Oracle mirror: ``CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)/COUNT(*)``.
    """
    return F.sum(_col(c).cast(f"decimal({prec},{scale})")).cast("double") / F.count(F.lit(1))


def seq_dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays, JVM-side, SEQUENTIAL left fold —
    the same left-to-right order DuckDB's list functions use, which is
    the bit-exactness contract every vector oracle depends on (one
    definition here; reassociating or vectorizing ANY copy silently
    breaks Spark/DuckDB parity for that operator).

    Measured trade-off note (round 6): an unrolled element_at
    multiply-add chain executes ~2x faster than this interpreted
    higher-order fold (the lambda runs outside whole-stage codegen) —
    but a fresh invocation re-ANALYZES the plan, and the ~dim*K-node
    unrolled tree costs seconds of Catalyst analysis per call, a ~15x
    net LOSS for a query-per-call engine (bench:
    embed_random_projection 0.28 s HOF vs 4.3 s unrolled, per-call).
    The compact fold keeps analysis O(small); revisit only if Spark
    codegens HOF lambdas."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def seq_norm(a: Column) -> Column:
    """L2 norm via the same sequential-fold discipline as seq_dot."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


_MINSTD_A, _MINSTD_M = 48271, 2147483647


def lcg2(s0: int) -> int:
    """Double-stepped minstd LCG value in [0, M) at seed ``s0`` — the
    engine's shared driver-side deterministic pseudo-random primitive
    (public constants, engine-independent, reproducible on any
    cluster). One definition: the trade generator, the LSH hyperplanes
    and the random-projection planes all derive from it; the DuckDB
    oracles inline the same ``(A*((A*s0)%M))%M`` form. (The
    partitioning-invariant COLUMN variant lives in
    operators/sampling._u_col.)"""
    return (_MINSTD_A * ((_MINSTD_A * s0) % _MINSTD_M)) % _MINSTD_M


def lcg2_unit(s0: int) -> float:
    """lcg2 scaled to [-0.5, 0.5) — hyperplane/projection components."""
    return lcg2(s0) / _MINSTD_M - 0.5


def dsum_over(c: Column | str, w, scale: int = 2, prec: int = 38) -> Column:
    """Order-independent windowed SUM — dsum's ``.over(w)`` form (the
    trailing double cast must land AFTER the window aggregate, which is
    why dsum itself can't be composed with .over). Oracle mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(38,s))) OVER w AS DOUBLE)``."""
    return F.sum(_col(c).cast(f"decimal({prec},{scale})")).over(w).cast("double")


def cents(c: Column | str) -> Column:
    """2-dec-clean double → exact integer cents — THE shared definition
    (was re-implemented inline in subqueries.py and aggregates.py;
    round-8 review). Safe because the fixture monetary columns carry at
    most 2 decimals, so *100 lands on exact integers and round() only
    clears float-representation dust — both engines agree."""
    return F.round(_col(c) * 100).cast("bigint")


def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sql_dsum(expr: str, scale: int = 2, prec: int = 38) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2, prec: int = 38) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT(*))"
