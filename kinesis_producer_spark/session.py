"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in a single JVM; the
same configuration keys are the ones that matter on a 1000-executor
cluster (AQE, shuffle partitioning, Arrow, partition sizing), so tests
exercise the real knobs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# 128 MB input split — same constant the reference uses for its greedy
# input batching (reference aws_utils.py:27, max_batch_size=128_000_000).
_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def get_spark(
    app_name: str = "kinesis_producer_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting
      replace every hand-tuned batch-size heuristic in the reference
      (reference aws_utils.py:27-45, file_flattener.py:160).
    - Arrow on: all pandas-UDF operators move data in columnar batches.
    - UTC session timezone: required for byte-identical comparison with
      the DuckDB oracle (DuckDB timestamps are UTC-naive).
    """
    n = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", str(2 * n)))

    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(_MAX_PARTITION_BYTES))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture events.parquet stores ts as TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, tables.py converts to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
