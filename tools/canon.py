"""Shared Spark↔DuckDB result canonicalization (the gate surface).

One implementation used by BOTH ``tools/oracle_check.py`` (the local
driver mimic) and ``tests/test_oracle_relational.py`` (the 210-query
sweep that runs on every pytest invocation), so the two gates cannot
drift: rounds 1–2 were lost to the pytest sweep canonicalizing DuckDB
via ``fetchall()`` (HUGEINT → Python int) while the driver goes through
pandas ``.df()`` (HUGEINT → float64), a divergence invisible locally
and hash-fatal at the driver.

Rules:

- DuckDB results are ALWAYS materialized through ``.df()`` (pandas) +
  ``itertuples`` — the same funnel the driver uses — via
  :func:`duckdb_result`.
- NaN/NaT conflate with NULL only in columns whose *oracle pandas
  dtype* is float/datetime — the columns where pandas itself forced
  NULL→NaN/NaT, so the distinction is unrecoverable. In any other
  column a NaN renders as ``NaN`` and diffs, so a query that genuinely
  computes NaN where the oracle yields NULL (or vice versa) is caught
  instead of silently conflated.
"""

from __future__ import annotations

import datetime

__all__ = ["canon_value", "canon_rows", "duckdb_result", "compare"]


def canon_value(v, conflate_nan: bool = True) -> str:
    if v is None:
        return "NULL"
    # Self-inequality ⇒ NaN (float) or NaT (pandas datetime). Whether it
    # joins the NULL equivalence class depends on the COLUMN: pandas
    # renders a NULL double as NaN and a NULL timestamp as NaT, so in
    # float64/datetime64 columns the conflation mirrors the driver
    # (q08/q11/q131 hash-pass the driver gate with exactly this
    # pairing); elsewhere a NaN is a real value and must diff.
    try:
        if v != v:
            return "NULL" if conflate_nan else "NaN"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        # DuckDB DATE surfaces as a midnight datetime64 through .df();
        # the driver's canonicalization equates that with Spark's
        # DateType (q18 hash-passed two rounds with exactly this pair),
        # so render midnight naive timestamps as bare dates.
        try:
            midnight = (
                v.tzinfo is None
                and v.hour == 0
                and v.minute == 0
                and v.second == 0
                and v.microsecond == 0
            )
        except (TypeError, ValueError):
            midnight = False
        if midnight:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x, conflate_nan) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(
    cols: list[str],
    rows: list[tuple],
    nan_null_cols: set[str] | None = None,
) -> list[tuple[str, ...]]:
    """Canonicalize to the driver surface: columns sorted by name, every
    cell stringified, rows sorted. ``nan_null_cols`` names the columns
    where NaN/NaT ∈ NULL-class (pandas-forced); ``None`` keeps the
    historical behavior of conflating everywhere."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    conflate = (
        [True] * len(cols)
        if nan_null_cols is None
        else [c in nan_null_cols for c in cols]
    )
    out = [
        tuple(canon_value(r[i], conflate[i]) for i in order) for r in rows
    ]
    out.sort()
    return out


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple], set[str]]:
    """Run ``sql`` on a DuckDB connection and materialize through pandas
    ``.df()`` + ``itertuples`` — the driver's funnel. Returns
    ``(columns, rows, nan_null_cols)`` where ``nan_null_cols`` is the
    set of columns whose pandas dtype is float or datetime (kind 'f' or
    'M'): exactly the columns where a NULL was forced to NaN/NaT and
    the conflation is therefore sound."""
    odf = con.execute(sql).df()
    cols = [str(c) for c in odf.columns]
    rows = list(odf.itertuples(index=False, name=None))
    nan_null = {
        str(c) for c, dt in odf.dtypes.items() if dt.kind in ("f", "M")
    }
    return cols, rows, nan_null


def compare(
    scols: list[str],
    srows: list[tuple],
    ocols: list[str],
    orows: list[tuple],
    nan_null_cols: set[str],
) -> str | None:
    """Full driver-surface diff. Returns None on match, else a message.

    The Spark side reuses the ORACLE's nan_null_cols: comparison is
    column-name aligned, and the pandas funnel that decides the
    equivalence class is the oracle's.
    """
    if sorted(scols) != sorted(ocols):
        return f"columns spark={sorted(scols)} duckdb={sorted(ocols)}"
    cs = canon_rows(scols, srows, nan_null_cols)
    co = canon_rows(ocols, orows, nan_null_cols)
    if len(cs) != len(co):
        return f"rowcount spark={len(cs)} duckdb={len(co)}"
    if cs != co:
        bad = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        return f"value mismatch; first diffs: {bad}"
    return None
