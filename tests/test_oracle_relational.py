"""Oracle-differential tests (SURVEY.md §5.2): Spark vs DuckDB at sf0.01.

Same canonicalization as the driver: sort columns by name, stringify,
sort rows, compare. Exact equality — the suite is built so doubles are
bit-identical (decimal-exact sums, functions.dsum).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import canon_rows  # noqa: E402

from kinesis_producer_spark.suite import load_all  # noqa: E402

QUERIES, ORACLE = load_all()
SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
    assert len(cs) == len(co)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        pytest.fail(f"value mismatch, first diffs: {diffs}")
