"""Tar-archive source (SURVEY.md §2a rows 4-5).

Spark has no native tar format. The Spark-first shape: a
``binaryFile`` scan (distributed listing, 128 MB-bounded splits,
pushdown on path) followed by an Arrow-batched ``mapInPandas`` that
opens each archive with :mod:`tarfile` and emits one row per member —
the reference's member loop (decompression.py:34-39) as a streaming
per-partition operator. Archives never gather on the driver; each
task holds one archive's bytes at a time.

``tar_members`` works on any DataFrame with a binary content column,
so the same operator serves S3-style scans (``spark.read.format
("binaryFile")``) and in-flight archives built upstream.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType()),
        T.StructField("member_name", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("size", T.LongType()),
    ]
)


def tar_members(
    df: DataFrame, content_col: str = "content", archive_col: str | None = "path"
) -> DataFrame:
    """Explode tar archives: one row per regular member file."""
    archive_expr = F.col(archive_col) if archive_col else F.lit(None).cast("string")
    src = df.select(archive_expr.alias("archive"), F.col(content_col).alias("_bytes"))

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for archive, blob in zip(pdf["archive"], pdf["_bytes"]):
                if blob is None:
                    continue
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for member in tf:
                        if not member.isfile():
                            continue
                        f = tf.extractfile(member)
                        content = f.read() if f is not None else b""
                        rows.append(
                            {
                                "archive": archive,
                                "member_name": member.name,
                                "content": content,
                                "size": len(content),
                            }
                        )
            yield pd.DataFrame(rows, columns=["archive", "member_name", "content", "size"])

    return src.mapInPandas(unpack, MEMBER_SCHEMA)


def read_tar_archives(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Scan a directory of tar files → one row per member.

    ``binaryFile`` provides the distributed listing + splitting the
    reference hand-rolled with its S3 batch packer (aws_utils.py:27-45).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return tar_members(reader.load(path), content_col="content", archive_col="path")
