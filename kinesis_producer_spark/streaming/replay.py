"""Event-time replay (SURVEY.md §2a rows 20-21).

The reference's absent ``xml_generator`` module is specified by its
call sites (main.py:41-51): ``get_batches()`` yields
``(ts_millis, [payload, ...])`` in ascending event-time order, one
batch per distinct timestamp; the producer sleeps
``(ts - last_ts)/1000`` seconds between batches (first batch
immediate) and out-of-order timestamps are sent immediately
(``last_ts < ts`` guard). SURVEY §0 documents the inference.

Spark-first split of responsibilities:
- **batching/ordering** is a DataFrame op: groupBy event time +
  collect_list + orderBy — distributed, spill-safe;
- **pacing** is inherently sequential wall-clock behavior, so it runs
  driver-side over ``toLocalIterator`` (one partition's batches in
  memory at a time, never the full stream) or bounded inside
  ``foreachBatch`` for the streaming path.

``speedup`` scales the cadence (``inf`` → as fast as possible);
``max_sleep_s`` bounds any single gap so a day-long hole in the data
cannot stall a micro-batch (SURVEY §7 hard part (c)).
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_time_batches(
    df: DataFrame,
    ts_col: str | Column = "ts",
    payload_col: str | Column = "payload",
) -> DataFrame:
    """One row per distinct event time: (ts, payloads array), ascending."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return (
        df.select(ts.alias("ts"), payload.alias("payload"))
        .groupBy("ts")
        .agg(F.collect_list("payload").alias("payloads"))
        .orderBy("ts")
    )


def replay(
    batches: DataFrame,
    produce: Callable[[object, list], None],
    speedup: float = math.inf,
    max_sleep_s: float = 5.0,
    on_error: str = "skip",
) -> dict:
    """Drive ``produce(ts, payloads)`` at the original event-time cadence.

    ``on_error='skip'`` reproduces the reference's batch-level
    containment (log & continue, main.py:45-49); ``'raise'`` fails fast.
    Returns counters (SURVEY §2a row 28 observability).
    """
    stats = {"batches": 0, "records": 0, "skipped_batches": 0, "slept_s": 0.0}
    last_ts: float | None = None
    for row in batches.toLocalIterator():
        ts, payloads = row["ts"], row["payloads"]
        ts_s = ts.timestamp() if hasattr(ts, "timestamp") else float(ts) / 1000.0
        if last_ts is not None and last_ts < ts_s and speedup != math.inf:
            delay = min((ts_s - last_ts) / speedup, max_sleep_s)
            if delay > 0:
                time.sleep(delay)
                stats["slept_s"] += delay
        try:
            produce(ts, payloads)
            stats["batches"] += 1
            stats["records"] += len(payloads)
        except Exception:  # noqa: BLE001
            if on_error == "raise":
                raise
            stats["skipped_batches"] += 1
        # advance even on skip/out-of-order, mirroring main.py:51
        last_ts = max(last_ts, ts_s) if last_ts is not None else ts_s
    return stats


def replay_to_kinesis(
    df: DataFrame,
    sink,
    ts_col: str = "ts",
    payload_col: str = "payload",
    partition_key: str | Column = "partition_key",
    speedup: float = math.inf,
    max_sleep_s: float = 5.0,
) -> DataFrame:
    """Batch-mode paced replay through a KinesisSink.

    Pacing happens between event-time groups; each group is sent as one
    distributed write (the sink chunks per the API limits). Returns the
    union of ack frames… materialized per batch, so acks are collected
    incrementally — suitable for moderate batch counts; use
    ``foreachBatch`` streaming for unbounded replay.
    """
    key = F.col(partition_key) if isinstance(partition_key, str) else partition_key
    prepared = df.select(
        F.col(ts_col).alias("ts"), F.col(payload_col).alias("payload"), key.alias("partition_key")
    )
    batches = (
        prepared.groupBy("ts")
        .agg(F.collect_list(F.struct("payload", "partition_key")).alias("payloads"))
        .orderBy("ts")
    )
    spark = df.sparkSession
    acks: list = []

    def produce(ts, payloads) -> None:
        rows = [(bytes(p["payload"], "utf-8") if isinstance(p["payload"], str) else p["payload"], p["partition_key"]) for p in payloads]
        bdf = spark.createDataFrame(rows, "data binary, partition_key string")
        acks.extend(sink.write_batch(bdf).collect())

    replay(batches, produce, speedup=speedup, max_sleep_s=max_sleep_s)
    from kinesis_producer_spark.streaming.kinesis_sink import ACK_SCHEMA

    return spark.createDataFrame(acks, ACK_SCHEMA)
