"""Batch sinks (SURVEY.md §2a rows 6-7, 17-18).

- ``wrap_records``: the unpack stage's record envelope
  ``{payload, tenant_id, partition_id}`` (reference decompression.py:40-44)
  as a ``to_json(struct(...))`` projection.
- ``write_jsonlines``: compacted JSON-lines objects; per-file sizing via
  ``maxRecordsPerFile`` replaces the reference's hand-packed 128 MB
  batches (aws_utils.py:27-45).
- ``write_hive_partitioned_csv`` / ``..._parquet``: the flatten stage's
  partitioned layout ``<root>/<type>/year=Y/month=M/day=D/``
  (reference consts.py:8-11, file_flattener.py:157-170), with
  quote-all CSV matching ``csv.QUOTE_ALL`` (:163).

Partitioned writes get partition pruning on re-read for free; at 100 TB
the partition columns (reading_type/year/month/day) keep file counts
per partition bounded and let Catalyst prune whole days.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wrap_records(
    df: DataFrame,
    payload_col: str | Column = "payload",
    tenant_id: str = "bhp",
    partition_id: str | Column = "partition_id",
    out_col: str = "record",
) -> DataFrame:
    """JSON record envelope: {payload, tenant_id, partition_id}."""
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    part = F.lit(partition_id) if isinstance(partition_id, str) else partition_id
    rec = F.to_json(
        F.struct(
            payload.alias("payload"),
            F.lit(tenant_id).alias("tenant_id"),
            part.alias("partition_id"),
        )
    )
    return df.withColumn(out_col, rec)


def write_jsonlines(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "append",
) -> None:
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_hive_partitioned_csv(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    quote_all: bool = True,
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    w = (
        df.write.mode(mode)
        .option("header", header)
        .option("quoteAll", quote_all)
        .option("emptyValue", "")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_hive_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
