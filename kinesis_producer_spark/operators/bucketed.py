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
before writing to keep file counts sane. For filter-only point
lookups note ``spark.sql.sources.bucketing.autoBucketedScan.enabled``
(default true) DISABLES the bucketed scan when no operator needs the
hash distribution — which also forfeits bucket pruning; set it false
around point lookups to get ``SelectedBucketsCount: 1 out of N``
(asserted in tests/test_bucketed.py).
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


def n_shuffle_exchanges(df: DataFrame, final: bool = False) -> int:
    """Count ShuffleExchange nodes in the executed plan (the metric a
    bucketed join drives to zero).

    With AQE enabled the pre-execution plan is only the INITIAL plan;
    AQE may re-plan at runtime (e.g. re-introduce an exchange for a
    skew-join split). ``final=True`` executes THIS DataFrame's own
    QueryExecution via ``collect()`` — ``count()`` would run a
    different QueryExecution (``groupBy().count()``) and leave the
    inspected AdaptiveSparkPlan un-finalized, silently reporting
    initial-plan numbers (found in review; the un-finalized plan is
    now detected and rejected). Diagnostic helper: collect() is fine
    at test scale, not on production-sized frames."""
    if final:
        df.collect()  # same QueryExecution → finalizes its adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    if final and "AdaptiveSparkPlan" in plan and "isFinalPlan=true" not in plan:
        raise RuntimeError(
            "adaptive plan did not finalize — the exchange count would "
            "be the initial plan's, not the executed one"
        )
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def selected_buckets(df: DataFrame) -> tuple[int, int] | None:
    """Parse bucket pruning out of the scan: returns (selected, total)
    from the FileSourceScan's ``SelectedBucketsCount`` annotation, or
    None if no pruning is reported. A point filter on the bucket key
    must scan ONE bucket's files, not all of them — at 100 TB that is
    the difference between a lookup and a full scan."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount:\s*(\d+)\s*out of\s*(\d+)", plan)
    return (int(m.group(1)), int(m.group(2))) if m else None
