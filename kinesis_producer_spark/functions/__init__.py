"""Scalar/aggregate helpers shared across operators.

Cross-engine exactness: the correctness gate hash-compares our results
against a DuckDB oracle, so floating-point aggregates must be
bit-identical across engines. Two hazards:

1. Double SUM is order-dependent, and Spark's partial-aggregation
   order varies run to run.
2. Double→DECIMAL casts round differently per engine: Spark rounds the
   *shortest decimal string* of the double (Java ``BigDecimal.valueOf``),
   DuckDB rounds the *full binary value* — they disagree on ~0.7% of
   computed products (measured on the sf0.01 fixtures).

:func:`dsum` avoids both by quantizing each term with pure IEEE-754
operations that every engine executes identically — ``floor(x·10⁴ + 0.5)``
(round-half-up at 4 decimals) into an exact integer domain — summing
exactly (decimal(38,0) accumulator: no overflow at any scale, no
order-dependence), and converting to DOUBLE once at the end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000  # 4 decimal places — covers every money/qty column in the fixtures


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _quant(col: Column | str) -> Column:
    """Portable round-half-up to 4 decimals, as an exact integer."""
    return F.floor(_c(col) * SCALE + F.lit(0.5)).cast("decimal(38,0)")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, engine-portable exact sum → DOUBLE."""
    out = F.sum(_quant(col)).cast("double") / F.lit(float(SCALE))
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum / count average → DOUBLE (single deterministic division)."""
    c = _c(col)
    out = F.sum(_quant(c)).cast("double") / F.lit(float(SCALE)) / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(FLOOR(({expr}) * {SCALE} + 0.5) AS HUGEINT)) AS DOUBLE) / {SCALE}.0"


def davg_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"{dsum_sql(expr)} / COUNT({expr})"
