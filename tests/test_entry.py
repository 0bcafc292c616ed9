"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib.util
import os

SPEC = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(entry_mod)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracle_keys_align(spark):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    missing = set(o) - set(q)
    assert not missing, f"oracle keys without query: {missing}"


def test_every_query_runs_on_smoke_data(spark):
    q = entry_mod.queries()
    for name, fn in q.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
