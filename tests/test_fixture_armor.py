"""Fixture-regeneration armor (VERDICT round 1, item 5).

The driver regenerates /root/testdata between rounds and physical
types drift (events.ts nanos→µs already happened). These tests
simulate the next likely flips — money columns double→decimal,
events.ts to µs-timestamp — and assert the loader normalizes them so
query results are unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_SMOKE  # noqa: E402


def _flipped_dir(tmp_path, flip_table: str, flip_sql: str) -> str:
    """Build an sf-dir clone with one table rewritten by DuckDB `flip_sql`
    (a SELECT over the original) and every other table symlinked."""
    import duckdb

    from kinesis_producer_spark.tables import TABLES

    d = str(tmp_path / "flipped")
    os.makedirs(d)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        dst = os.path.join(d, f"{t}.parquet")
        if t == flip_table:
            con.execute(
                f"COPY ({flip_sql.format(src=src)}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, dst)
    con.close()
    return d


def test_decimal_money_flip_is_normalized(spark, tmp_path):
    """lineitem money columns rewritten as DECIMAL(12,2): the loader
    casts back to double and a money-quantizing aggregation is
    bit-identical to the original fixtures."""
    from kinesis_producer_spark.suite import load_all
    from kinesis_producer_spark.tables import load_table

    QUERIES, _ = load_all()

    flipped = _flipped_dir(
        tmp_path,
        "lineitem",
        "SELECT * REPLACE ("
        "CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice, "
        "CAST(l_discount AS DECIMAL(12,2)) AS l_discount, "
        "CAST(l_tax AS DECIMAL(12,2)) AS l_tax) "
        "FROM read_parquet('{src}')",
    )
    assert dict(load_table(spark, flipped, "lineitem").dtypes)["l_extendedprice"] == "double"

    q = QUERIES["q01_pricing_summary"]
    base = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    flip = sorted(map(tuple, q(spark, flipped).collect()))
    assert base == flip


def test_events_ts_micros_flip_is_normalized(spark, tmp_path):
    """events.ts rewritten as TIMESTAMP (µs): loader still yields a
    timestamp column and a sessionization query agrees with the
    original nanos fixtures."""
    from kinesis_producer_spark.suite import load_all
    from kinesis_producer_spark.tables import load_table

    QUERIES, _ = load_all()

    flipped = _flipped_dir(
        tmp_path,
        "events",
        "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM read_parquet('{src}')",
    )
    assert dict(load_table(spark, flipped, "events").dtypes)["ts"] == "timestamp"

    q = QUERIES["q20_sessionize"]
    base = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    flip = sorted(map(tuple, q(spark, flipped).collect()))
    assert base == flip


def test_short_document_texts_do_not_crash_ngram_queries(spark, tmp_path):
    """Documents with 0/1/2 tokens (possible after regeneration) must
    not crash the n-gram family under ANSI mode, and must keep
    matching the DuckDB oracle."""
    import duckdb

    from kinesis_producer_spark.suite import load_all

    QUERIES, ORACLE = load_all()
    flipped = _flipped_dir(
        tmp_path,
        "documents",
        "SELECT doc_id, CASE doc_id % 4 WHEN 0 THEN 'one'"
        " WHEN 1 THEN 'two words' ELSE text END AS text,"
        " lang, source, n_chars FROM read_parquet('{src}')",
    )
    for name in ("q189_dup_ngram_fraction", "q51_minhash_lsh", "q96_word_repetition"):
        sdf = QUERIES[name](spark, flipped)
        srows = sorted(map(tuple, sdf.collect()))  # must not raise
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{flipped}/{t}.parquet')"
            )
        res = con.execute(ORACLE[name])
        cols = [d[0] for d in res.description]
        order = [cols.index(c) for c in sdf.columns]
        orows = sorted(tuple(r[i] for i in order) for r in res.fetchall())
        con.close()
        assert len(srows) == len(orows), f"{name}: row count diverged on short docs"
        assert [tuple(map(str, r)) for r in srows] == [
            tuple(map(str, r)) for r in orows
        ], f"{name}: values diverged on short docs"


def test_embedding_double_flip_is_handled(spark, tmp_path):
    """embeddings.embedding rewritten as DOUBLE[]: the quantized dot
    product casts per-element, so ANN results are unchanged."""
    from kinesis_producer_spark.suite import load_all

    QUERIES, _ = load_all()
    flipped = _flipped_dir(
        tmp_path,
        "embeddings",
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding, label "
        "FROM read_parquet('{src}')",
    )
    q = QUERIES["q55_ann_bruteforce"]
    base = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    flip = sorted(map(tuple, q(spark, flipped).collect()))
    assert base == flip
