"""Tests for Bloom-filter join pruning and the compressed-text source."""

from __future__ import annotations

import gzip
import zlib

import pytest
from pyspark.sql import functions as F


def test_bloom_has_no_false_negatives_and_prunes(spark):
    from kinesis_producer_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom,
    )

    build = spark.range(0, 200).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    words = build_bloom(build, "k", m_bits=1 << 14, k=5)
    kept = probe.where(bloom_might_contain(words, F.col("k"), 1 << 14, 5))
    kept_keys = {r.k for r in kept.collect()}
    true_keys = {i * 7 for i in range(200)}
    # no false negatives: every build key that appears in probe survives
    assert true_keys & set(range(20000)) <= kept_keys
    # real pruning: false-positive rate well under 5% of the non-members
    assert len(kept_keys) < 200 + 0.05 * 20000


def test_bloom_semi_join_equals_exact_semi_join(spark):
    from kinesis_producer_spark.operators.bloom import bloom_semi_join

    build = spark.range(0, 50).select((F.col("id") * 3 + 1).alias("bk"))
    probe = spark.range(0, 5000).select(
        F.col("id").alias("pk"), (F.col("id") % 97).alias("payload")
    )
    got = sorted(
        (r.pk, r.payload)
        for r in bloom_semi_join(probe, build, "pk", "bk", m_bits=1 << 10).collect()
    )
    exact = sorted(
        (r.pk, r.payload)
        for r in probe.join(
            build, probe["pk"] == build["bk"], "left_semi"
        ).collect()
    )
    assert got == exact and len(got) == 50


def test_gunzip_text_containers_and_poison(spark):
    from kinesis_producer_spark.sources.compressed import gunzip_text

    text = "hello compressed world éè"
    rows = [
        (1, bytearray(gzip.compress(text.encode(), mtime=0))),
        (2, bytearray(zlib.compress(text.encode()))),
        (3, bytearray(b"not compressed at all")),
        (4, bytearray(zlib.compress(b"\xff\xfe invalid utf8? no:") + b"x")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r.asDict() for r in gunzip_text(df).collect()}
    assert out[1]["text"] == text and out[2]["text"] == text
    assert out[3]["text"] is None
    assert out[4]["text"] is None  # trailing garbage → zlib error → null
    assert out[1]["n_bytes_compressed"] == len(rows[0][1])


def test_gunzip_truncated_stream_yields_null_not_prefix(spark):
    """A chopped gzip/zlib stream inflates to a silent PREFIX with no
    zlib.error (the CRC trailer is only checked at end-of-stream), so
    the operator must gate on d.eof — otherwise partial text passes as
    valid and silently corrupts documents at scale."""
    from kinesis_producer_spark.sources.compressed import gunzip_text

    text = ("the quick brown fox jumps over the lazy dog " * 40).strip()
    gz = gzip.compress(text.encode(), mtime=0)
    zl = zlib.compress(text.encode())
    rows = [
        (1, bytearray(gz)),  # intact control
        (2, bytearray(gz[: len(gz) - 12])),  # trailer+tail chopped
        (3, bytearray(gz[: len(gz) // 2])),  # half the stream
        (4, bytearray(zl[: len(zl) - 6])),  # zlib adler32 chopped
        (5, bytearray(gz[: len(gz) - 1])),  # single byte short
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r.text for r in gunzip_text(df).collect()}
    assert out[1] == text
    for did in (2, 3, 4, 5):
        assert out[did] is None, f"truncated blob {did} returned partial text"


def test_gunzip_zip_bomb_guard(spark):
    from kinesis_producer_spark.sources.compressed import gunzip_text

    bomb = zlib.compress(b"A" * (1 << 20))  # 1 MiB inflates from ~1 KiB
    df = spark.createDataFrame(
        [(1, bytearray(bomb))], "doc_id long, content binary"
    )
    out = gunzip_text(df, max_bytes=1 << 10).collect()[0]
    assert out["text"] is None  # over the bound → null, not OOM/crash
    ok = gunzip_text(df, max_bytes=1 << 21).collect()[0]
    assert ok["text"] == "A" * (1 << 20)


def test_gunzip_text_works_on_a_stream(spark, tmp_path):
    """gunzip_text is a mapInPandas stage, so it must compose with
    Structured Streaming unchanged — inflate per-record blobs as they
    arrive (the WARC/compressed-record ingestion shape)."""
    import gzip as _gz

    import pandas as pd

    src = tmp_path / "gz_stream_src"
    src.mkdir()
    rows = [(i, _gz.compress(f"doc number {i}".encode(), mtime=0)) for i in range(20)]
    spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "doc_id long, content binary"
    ).write.mode("overwrite").parquet(str(src))

    from kinesis_producer_spark.sources.compressed import gunzip_text

    stream = spark.readStream.schema("doc_id long, content binary").parquet(str(src))
    out = gunzip_text(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("gz_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.text for r in spark.sql("SELECT * FROM gz_stream_t").collect()
    }
    assert got == {i: f"doc number {i}" for i in range(20)}


def test_pack_tar_shards_deterministic_and_writable(spark, tmp_path):
    import hashlib
    import tarfile as _tar
    import io as _io

    from kinesis_producer_spark.sources.tar import (
        pack_tar_shards,
        tar_members,
        write_tar_shards,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 200).select(
        F.concat(F.col("id").cast("string"), F.lit(".txt")).alias("key"),
        F.concat(F.lit("payload-"), F.col("id").cast("string"))
        .cast("binary")
        .alias("content"),
    )
    shards = pack_tar_shards(df, n_shards=4)
    rows = {r.shard_id: r for r in shards.collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert sum(r.n_members for r in rows.values()) == 200
    # byte-determinism: a second pack produces identical shard bytes
    again = {r.shard_id: r for r in pack_tar_shards(df, n_shards=4).collect()}
    for sid in rows:
        assert hashlib.md5(bytes(rows[sid].tar_bytes)).hexdigest() == hashlib.md5(
            bytes(again[sid].tar_bytes)
        ).hexdigest()
    # members round-trip through the tar SOURCE
    back = tar_members(
        shards.select(F.col("shard_id").cast("string").alias("path"), F.col("tar_bytes").alias("content")),
        content_col="content",
        archive_col="path",
    )
    got = {r.member_name: bytes(r.content) for r in back.collect()}
    assert got["7.txt"] == b"payload-7" and len(got) == 200
    # file sink lands shard-NNNNN.tar atomically
    out = tmp_path / "wds"
    write_tar_shards(df, str(out), n_shards=4)
    files = sorted(p.name for p in out.iterdir())
    assert files == [f"shard-{i:05d}.tar" for i in range(4)]
    with _tar.open(fileobj=_io.BytesIO((out / files[0]).read_bytes())) as tf:
        assert all(m.mtime == 0 for m in tf)


def test_tar_members_corrupt_archive_contract(spark):
    """Poisoned-archive contract: PERMISSIVE (default) turns a corrupt
    or truncated tar into a single null marker row with size -1 and NO
    partial members; FAILFAST raises. Healthy archives in the same
    batch are unaffected."""
    import io as _io
    import tarfile as _tar

    from pyspark.errors.exceptions.captured import PythonException

    from kinesis_producer_spark.sources.tar import tar_members

    buf = _io.BytesIO()
    with _tar.open(fileobj=buf, mode="w") as tf:
        for name, payload in [("a.txt", b"alpha"), ("b.txt", b"beta")]:
            info = _tar.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, _io.BytesIO(payload))
    good = buf.getvalue()
    corrupt = b"definitely not a tar archive" * 20
    # tarfile pads archives to 10240-byte records, so "halfway" is just
    # padding — cut INSIDE the first member's data so extraction fails
    truncated = good[: good.index(b"alpha") + 2]

    df = spark.createDataFrame(
        [
            ("good", bytearray(good)),
            ("corrupt", bytearray(corrupt)),
            ("truncated", bytearray(truncated)),
            ("nullblob", None),
        ],
        "path string, content binary",
    )
    rows = tar_members(df).collect()
    by_archive: dict = {}
    for r in rows:
        by_archive.setdefault(r.archive, []).append(r)
    assert {r.member_name for r in by_archive["good"]} == {"a.txt", "b.txt"}
    for bad in ("corrupt", "truncated", "nullblob"):
        markers = by_archive[bad]
        assert len(markers) == 1, f"{bad}: partial members leaked"
        assert markers[0].member_name is None and markers[0].size == -1

    with pytest.raises(PythonException):
        tar_members(df, mode="FAILFAST").collect()
    with pytest.raises(ValueError):
        tar_members(df, mode="bogus")
