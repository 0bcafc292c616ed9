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


def s3_tuning_profile(connection_pool: int = 50) -> dict[str, str]:
    """s3a configuration preset mirroring the reference's S3 client
    tuning (aws_utils.py:11 pins botocore max_pool_connections=50).

    Inert in this sandbox (no real S3); pass to ``get_spark(extra_conf=
    s3_tuning_profile())`` when pointing at s3a:// paths. Values follow
    the public Hadoop s3a documentation: pooled connections sized to the
    reference's constant, fast upload with disk buffering (the analogue
    of the reference's BytesIO-then-upload, minus the OOM risk), and
    directory-marker retention for modern committers.

    Committer keys live in ``s3_committer_profile`` — deliberately NOT
    here, because ``spark.sql.sources.commitProtocolClass`` governs
    writes on EVERY filesystem scheme and requires the
    spark-hadoop-cloud jar on the classpath (ClassNotFoundException on
    all writes otherwise).
    """
    return {
        "spark.hadoop.fs.s3a.connection.maximum": str(connection_pool),
        "spark.hadoop.fs.s3a.threads.max": str(connection_pool),
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.fast.upload.buffer": "disk",
        "spark.hadoop.fs.s3a.block.size": str(_MAX_PARTITION_BYTES),
        "spark.hadoop.fs.s3a.directory.marker.retention": "keep",
    }


def s3_committer_profile() -> dict[str, str]:
    """Opt-in S3A magic-committer preset — separate from the
    connection-pool tuning because these keys have GLOBAL write scope:
    ``spark.sql.sources.commitProtocolClass`` replaces the commit
    protocol for every DataFrame write on every filesystem scheme, and
    ``PathOutputCommitProtocol`` requires the spark-hadoop-cloud jar
    (ship it via ``spark.jars.packages
    org.apache.spark:spark-hadoop-cloud_2.13:<spark version>``).
    Only merge this profile into a session whose writes all target
    s3a:// and whose classpath carries that jar."""
    return {
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
    }


def streaming_state_profile() -> dict[str, str]:
    """Production state-store preset for large streaming state:
    RocksDB provider (state off executor heap — the HDFS-backed
    default keeps every key in memory and OOMs at multi-GB state),
    changelog checkpointing (upload deltas, not full snapshots), and
    a bounded block-cache. MUST be set as session confs before the
    query starts — ``writeStream.option()`` silently ignores these
    keys (pinned by tests/test_streaming.py's provider-artifact
    check)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    }


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
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package as a zip to executor Python workers.

    Driver-side imports resolve via cwd / caller ``sys.path``, but the
    executor Python workers spawn with their own path and cannot
    unpickle our pandas UDFs without the package. ``addPyFile`` is the
    deployment-agnostic fix (works in local mode and on a real
    cluster); idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_kps_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"kinesis_producer_spark_pkg_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="kinesis_producer_spark"
    )
    sc.addPyFile(zip_path)
    sc._kps_shipped = True
