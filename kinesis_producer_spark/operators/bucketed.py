"""Bucketed-table layout: co-located, exchange-free joins.

The 100 TB pattern: two fact tables joined repeatedly on the same key
should be written ONCE into hash-bucketed layout (``bucketBy`` +
``sortBy`` on the join key). Spark then plans their join as a
sort-merge over matching buckets with NO Exchange on either side —
the single biggest shuffle you can delete from a recurring pipeline,
and the Spark-native equivalent of the co-partitioned table layouts
warehouse engines use.

Local verification shows the real thing: the joined plan of two
``bucketed_table`` outputs contains zero ShuffleExchange nodes
(asserted in tests/test_bucketed.py), while the same join on plain
parquet shuffles both sides.

Constraints worth knowing at scale (all public Spark semantics):
bucket count must match on both sides (or divide evenly, Spark
3.1+ with bucketing.ratio), the join key must equal the bucket key,
and bucketed writes require ``saveAsTable`` (a metastore entry), not
bare ``parquet(path)``. One file per bucket per task — coalesce
before writing to keep file counts sane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a hash-bucketed (and bucket-sorted) managed or
    path-based table, replacing any previous version."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count ShuffleExchange nodes in the executed plan (the metric a
    bucketed join drives to zero)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
