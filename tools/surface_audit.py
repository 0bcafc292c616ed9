"""Audit the gate surface of every registered query.

The driver's correctness gate canonicalizes results through pandas and
hashes cell values; round 1 showed two hazard classes on that surface:

1. array/map-typed cells  → ``TypeError: unhashable type: 'list'``
2. computed doubles       → rendering/ulp exposure (q04 hash-mismatch)

This tool builds each ``queries()`` DataFrame and reports any output
column whose type is Array/Map/Struct, or Double/Float. Most builders
only construct a plan, but a handful are side-effecting (q37/q38 write
through a sink, q192 and the streaming queries run micro-batches), so
a full unfiltered run executes those and takes minutes at sf0.01 —
pass query names to narrow.  Doubles that are raw fixture-column passthroughs are
reported separately from computed ones (passthroughs are bit-identical
on both engines by construction and have passed the gate; computed
doubles should be quantized or integerized).

Round 2 exposed a third hazard class on the same surface: DuckDB
promotes a bare integer ``SUM()`` to HUGEINT, which pandas renders as
float64 (``0.0``) while Spark's bigint renders int64 (``0``) — rows
and schema green, hash red. So in addition to the Spark-side schema
scan, this tool now runs each oracle through DuckDB ``.df()`` at
sf0.01 and diffs the pandas dtype *kind* (int vs float) per column
against the Spark schema; any numeric-kind divergence is flagged.
Fix is always on the oracle side: ``CAST(SUM(...) AS BIGINT)`` or a
``COALESCE`` sentinel for NULL-induced float64.

Usage: python tools/surface_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

# Raw fixture double columns: passthrough of these (by name) is benign.
RAW_DOUBLE_COLS = {
    "o_totalprice",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "c_acctbal",
    "s_acctbal",
    "p_retailprice",
    "value",
}

# (query, column) pairs whose double column is a raw cell value under an
# alias — MIN/MAX/lag/lead of a fixture column involve no arithmetic, so
# both engines surface bit-identical parquet values. Audited by hand.
RAW_PROPAGATED = {
    ("q11_lag_lead", "prev_value"),
    ("q11_lag_lead", "next_value"),
    ("q82_min_price_supplier", "min_price"),
    ("q102_hierarchical_rollup", "min_value"),
    ("q102_hierarchical_rollup", "max_value"),
}


def _spark_kind(t) -> str:
    """Collapse a Spark type to the pandas dtype kind the driver will see."""
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(t, (T.DoubleType, T.FloatType)):
        return "f"
    return "other"


def main() -> int:
    import duckdb
    from pyspark.sql import types as T

    from kinesis_producer_spark.session import get_spark
    from kinesis_producer_spark.suite import load_all

    only = set(sys.argv[1:])
    queries, oracle = load_all()
    spark = get_spark("surface_audit", cpus=4)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_flag = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_flag += 1
            continue
        for f in df.schema.fields:
            t = f.dataType
            if isinstance(t, (T.ArrayType, T.MapType, T.StructType)):
                print(f"FLAG {name}: {f.name} is {t.simpleString()} (unhashable cell)")
                n_flag += 1
            elif isinstance(t, (T.DoubleType, T.FloatType)):
                raw = f.name in RAW_DOUBLE_COLS or (name, f.name) in RAW_PROPAGATED
                kind = "raw-passthrough" if raw else "COMPUTED"
                print(f"{'flag' if kind == 'COMPUTED' else 'note'} {name}: {f.name} is {t.simpleString()} ({kind})")
                if kind == "COMPUTED":
                    n_flag += 1
        # Cross-engine dtype sweep: the driver canonicalizes the DuckDB
        # side through pandas, so a HUGEINT (bare integer SUM) or a
        # NULL-bearing int column surfaces as float64 there while Spark
        # surfaces int64 — hash-fatal with rows/schema green.
        if name in oracle:
            try:
                odf = con.execute(oracle[name]).df()
            except Exception as e:  # noqa: BLE001
                print(f"ERR  {name}: duckdb: {type(e).__name__}: {e}")
                n_flag += 1
                continue
            okinds = {str(c): odf[c].dtype.kind for c in odf.columns}
            for f in df.schema.fields:
                sk = _spark_kind(f.dataType)
                ok = okinds.get(f.name)
                if ok is None:
                    continue  # column-name mismatch is oracle_check's job
                if sk == "i" and ok == "f":
                    print(
                        f"FLAG {name}: {f.name} spark={f.dataType.simpleString()} but oracle pandas dtype is float64 "
                        f"(HUGEINT SUM or NULL-induced) — CAST(... AS BIGINT)/COALESCE in the oracle SQL"
                    )
                    n_flag += 1
                elif sk == "f" and ok == "i":
                    print(
                        f"FLAG {name}: {f.name} spark={f.dataType.simpleString()} but oracle pandas dtype is int "
                        f"— repr divergence (0.0 vs 0); align the types"
                    )
                    n_flag += 1
    print(f"\n{n_flag} flagged")
    spark.stop()
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
