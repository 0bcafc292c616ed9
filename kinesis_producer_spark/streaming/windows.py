"""Watermarked window aggregations (SURVEY.md §2b streaming row).

The reference has no consumer-side state; these are the Spark
built-ins our engine surface exposes for it — tumbling / sliding /
session windows with event-time watermarks, runnable identically in
batch (for the oracle) and streaming (``readStream`` file source →
memory sink, exercised in tests).
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_producer_spark.functions import dsum


@contextmanager
def bounded_stream_shuffle(spark: SparkSession, partitions: int | None = None):
    """Pin ``spark.sql.shuffle.partitions`` to a small count for the
    duration of a BOUNDED fixture stream, restoring it afterwards.

    Stateful streaming cost is (state-store commits) = partitions ×
    micro-batches × stores-per-operator, and — unlike batch — AQE
    never coalesces a stateful shuffle (the state partition count is
    pinned at first run). The session default (2×cores, sized for
    batch scans) therefore multiplies pure trigger overhead by ~8× on
    a 4-file fixture stream that carries a few thousand rows. Results
    are identical at any value — partitioning of state is internal —
    so bounded oracle/bench streams run at SPARK_GRAFT_STREAM_SHUFFLE
    (default 8). Production deployments with real volume should size
    partitions to throughput as usual; this knob is scoped to each
    bounded run and leaks nothing.

    ``partitions`` overrides the env default for operators whose
    store count per partition differs from the single-store norm: a
    stream-stream join keeps FOUR stores per partition (two per
    side), so its commit count at the 8-partition pin is 4× a
    stateful agg's — q97/q100 measured fastest at 4 (round-9 sweep:
    5.7/6.2s @ 8 → 4.7/4.6s @ 4, with 2 slower again as compute
    concentrates)."""
    target = (
        str(partitions)
        if partitions is not None
        else os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", target)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_agg(events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user (batch & streaming capable)."""
    sessions = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


def watermarked_tumbling(
    events: DataFrame, duration: str = "1 hour", delay: str = "30 minutes"
) -> DataFrame:
    """Tumbling window agg with an event-time watermark — the
    append-mode (late-data-discarding) path: a window is emitted once,
    when the watermark passes its end, and state for it is evicted."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def run_stream_append(
    agg: DataFrame, spark: SparkSession, partitions: int | None = None
) -> DataFrame:
    """Execute a bounded watermarked stream in append mode; the memory
    table holds exactly the watermark-closed windows. ``partitions``
    passes through to the bounded shuffle pin (stream-stream joins
    carry 4 state stores per partition and want a smaller count)."""
    name = f"mem_{uuid.uuid4().hex[:10]}"
    with bounded_stream_shuffle(spark, partitions):
        q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
        q.processAllAvailable()
        q.stop()
    return spark.table(name)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a bounded file stream (for tests).

    Reads the raw parquet with the nanos→long conf and restores the
    micros timestamp, exactly like tables.load_table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source requires a directory: expose the single
    # fixture file through a symlink dir (read-only testdata untouched)
    import hashlib
    import os
    import tempfile

    stream_dir = os.path.join(
        tempfile.gettempdir(), f"events_stream_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    # probe the footer type via a batch read: driver-regenerated fixtures
    # have shipped ts as TIMESTAMP(NANOS)-as-long and as plain timestamp[us]
    ts_type = dict(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes
    )["ts"]
    raw_schema = (
        f"event_id bigint, ts {ts_type}, user_id bigint, event_type string, "
        "value double, props string"
    )
    raw = spark.readStream.schema(raw_schema).parquet(stream_dir)
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_stream_to_memory(agg: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a (bounded) streaming aggregation to completion.

    Complete output mode → every window is emitted even without
    watermark closure; fine for bounded fixture streams.
    """
    name = f"mem_{uuid.uuid4().hex[:10]}"
    with bounded_stream_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(name)
