"""Local mimic of the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, canonicalizes (sort columns by name, stringify,
sort rows), and diffs. Exact float equality is intended — the query
suite is built so doubles are bit-identical across engines.

The DuckDB side is materialized through ``.df()`` (pandas), NOT
``fetchall()``, to match the driver's pandas-based canonicalization:
a bare integer SUM() comes back as HUGEINT, which pandas renders as
float64 (``0.0``) while Spark's bigint renders int64 (``0``) — a
hash-fatal divergence that ``fetchall()`` (HUGEINT → Python int)
can never see. That blind spot cost rounds 1 and 2 (q04/q22).

Usage: python tools/oracle_check.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def canon_value(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    # NaN / NaT (self-inequality) render as NULL: the driver funnels
    # BOTH engines through pandas, where a NULL double is NaN and a
    # NULL timestamp is NaT — Spark-collect None must land in the
    # same equivalence class (q08/q11/q131 hash-pass the driver gate
    # with exactly this pairing).
    try:
        if v != v:
            return "NULL"
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
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    import duckdb

    from kinesis_producer_spark.session import get_spark
    from kinesis_producer_spark.suite import load_all

    only = set(sys.argv[1:])
    queries, oracle = load_all()
    spark = get_spark("oracle_check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracle[name]).df()
            ocols = [str(c) for c in odf.columns]
            orows = list(odf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(ocols)}")
            n_fail += 1
            continue
        cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
        if len(cs) != len(co):
            print(f"FAIL {name}: rowcount spark={len(cs)} duckdb={len(co)}")
            n_fail += 1
            continue
        if cs != co:
            bad = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(cs)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
