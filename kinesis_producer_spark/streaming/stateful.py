"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference keeps no consumer-side state (SURVEY.md §2b streaming
row); this module supplies the custom-stateful surface a Spark engine
offers for it. The flagship operator is a streaming first-seen tracker
— the stateful core of a streaming dedup: per key it remembers the
earliest event time and a cumulative event count across micro-batches.

Scale notes:
- state is per-key and O(1) (a timestamp + a counter), so the state
  store grows with key cardinality only, never with event volume;
- emissions are **order-insensitive under the final aggregation**
  (min of partial mins = global min; max of cumulative counts = total),
  so results are deterministic regardless of micro-batch boundaries —
  which also makes the operator oracle-checkable in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = "user_id bigint, first_ts timestamp, cum_events bigint"
FIRST_SEEN_STATE = "first_ts timestamp, cum_events bigint"


def _first_seen_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch_min = None
    batch_n = 0
    for pdf in pdfs:
        if len(pdf):
            m = pdf["ts"].min()
            batch_min = m if batch_min is None else min(batch_min, m)
            batch_n += len(pdf)
    if batch_n == 0:
        return
    if state.exists:
        first_ts, cum = state.get
        if batch_min is not None and batch_min < first_ts:
            first_ts = batch_min
        cum += batch_n
    else:
        first_ts, cum = batch_min, batch_n
    state.update((first_ts, cum))
    yield pd.DataFrame({"user_id": [key[0]], "first_ts": [first_ts], "cum_events": [cum]})


def stateful_first_seen(events: DataFrame) -> DataFrame:
    """Per-user first event time + running count, one emission per
    micro-batch in which the user appears (update semantics)."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_first_seen(emissions: DataFrame) -> DataFrame:
    """Collapse per-batch update emissions to the final per-key answer."""
    return emissions.groupBy("user_id").agg(
        F.min("first_ts").alias("first_ts"),
        F.max("cum_events").alias("n_events"),
    )


def events_multifile_stream(
    spark,
    sf_dir: str,
    n_files: int = 4,
    duplicate: bool = False,
    files_per_trigger: int = 1,
) -> DataFrame:
    """The events fixture as a bounded *multi-batch* file stream.

    Splits events into ``n_files`` ts-range parquet files (one-time
    prep via repartitionByRange) and streams them ``files_per_trigger``
    files per trigger, so stateful operators genuinely carry state
    across micro-batches. ``duplicate=True`` writes every event twice
    (same ts → same range file → same micro-batch) to exercise
    streaming dedup. ``files_per_trigger`` > 1 trades trigger count
    for batch size (guide §2: fewer, larger micro-batches) — the
    stream-stream joins use 2, which halves their per-trigger state
    store commits (4 stores × partitions × sides each) while still
    carrying join state across a genuine batch boundary; watermarks
    only advance between batches, so any grouping of the ts-ascending
    range files yields the identical final table.
    """
    import hashlib
    import os
    import tempfile

    from kinesis_producer_spark.tables import load_table

    # The cache tag includes the fixture's mtime: the driver regenerates
    # events.parquet in place between rounds, and a tag keyed on path
    # alone would serve stale micro-batches against a fresh batch oracle.
    src = os.path.join(sf_dir, "events.parquet")
    mtime = os.stat(src).st_mtime_ns if os.path.exists(src) else 0
    tag = hashlib.md5(f"{sf_dir}:{mtime}".encode()).hexdigest()[:8]
    suffix = "_dup" if duplicate else ""
    prep = os.path.join(tempfile.gettempdir(), f"events_mf2_{tag}_{n_files}{suffix}")
    if not os.path.exists(os.path.join(prep, "_SUCCESS")):
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        if duplicate:
            e = e.unionByName(e)
        e.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(prep)
    # Pin ascending mtimes in part-file (= ts-range) order so the file
    # source processes micro-batches in deterministic event-time order.
    parts = sorted(f for f in os.listdir(prep) if f.startswith("part-"))
    for i, f in enumerate(parts):
        os.utime(os.path.join(prep, f), (1_000_000 + i, 1_000_000 + i))
    return spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    ).option("maxFilesPerTrigger", int(files_per_trigger)).parquet(prep)


def run_stream_update(df: DataFrame, spark) -> DataFrame:
    """Execute a bounded update-mode stream; return the accumulated
    emissions (memory sink appends each trigger's updated rows)."""
    import uuid

    from kinesis_producer_spark.streaming.windows import bounded_stream_shuffle

    name = f"mem_{uuid.uuid4().hex[:10]}"
    with bounded_stream_shuffle(spark):
        q = df.writeStream.outputMode("update").format("memory").queryName(name).start()
        q.processAllAvailable()
        q.stop()
    return spark.table(name)


VERSION_TRACK_OUTPUT = "user_id bigint, n_versions bigint, first_cents bigint, last_cents bigint"
VERSION_TRACK_STATE = "first_cents bigint, last_cents bigint, n_versions bigint"


def _version_track_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = [pdf for pdf in pdfs if len(pdf)]
    if not batch:
        return
    rows = pd.concat(batch).sort_values(["ts", "event_id"])
    if state.exists:
        first, last, n = state.get
    else:
        first, last, n = None, None, 0
    for v in rows["cents"]:
        v = int(v)
        if n == 0:
            first, last, n = v, v, 1
        elif v != last:
            last, n = v, n + 1
    state.update((first, last, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_versions": [n],
            "first_cents": [first],
            "last_cents": [last],
        }
    )


def stateful_version_track(events: DataFrame) -> DataFrame:
    """Per-key SCD-style version counter: rows apply in (ts, event_id)
    order; a new version opens whenever the value changes from the
    previous one. Because micro-batches arrive in event-time order
    (ts-range files) and in-batch rows are explicitly sorted, the
    version sequence equals the fully-sequential replay — micro-batch
    boundaries cannot affect the result, which is what makes this
    streaming operator oracle-checkable.

    Scale: O(1) state per key (two values + a counter); emissions are
    cumulative, so the finalize step is a per-key max."""
    return events.groupBy("user_id").applyInPandasWithState(
        _version_track_fn,
        outputStructType=VERSION_TRACK_OUTPUT,
        stateStructType=VERSION_TRACK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONS_OUTPUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSIONS_STATE = "start_us bigint, last_us bigint, n bigint"
SESSION_GAP_MS = 30 * 60 * 1000


def _sessions_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows_out: list[tuple] = []
    if state.hasTimedOut:
        s, l, n = state.get
        rows_out.append((key[0], s, l, n))
        state.remove()
    else:
        batch = [p for p in pdfs if len(p)]
        if batch:
            rows = pd.concat(batch).sort_values(["ts", "event_id"])
            if state.exists:
                s, l, n = state.get
            else:
                s = l = None
                n = 0
            for t in rows["ts"]:
                us = int(pd.Timestamp(t).value // 1000)
                if n == 0:
                    s = l = us
                    n = 1
                elif us - l > SESSION_GAP_MS * 1000:
                    rows_out.append((key[0], s, l, n))
                    s = l = us
                    n = 1
                else:
                    l = us
                    n += 1
            state.update((s, l, n))
            state.setTimeoutTimestamp(l // 1000 + SESSION_GAP_MS)
    if rows_out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows_out],
                "session_start": pd.to_datetime([r[1] for r in rows_out], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in rows_out], unit="us"),
                "n_events": [r[3] for r in rows_out],
            }
        )


def stateful_sessions(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Gap-based sessionization with **event-time state timeout**: a
    session closes (and its one row is emitted, append mode) either
    when a same-user event arrives past the 30-min gap, or when the
    event-time watermark passes session_end + gap — at which point the
    key's state is evicted, which is what bounds the state store on an
    unbounded stream (keys that go quiet cost nothing forever after).

    Determinism (what makes this oracle-checkable): micro-batches are
    ts-range files in ascending order, so (a) no input row is ever
    late vs the watermark, and (b) a timed-out key's later events are
    genuinely gap-separated — the emitted set equals the batch
    sessionization filtered to closed sessions, where closed ⇔ a
    successor session exists OR session_end + gap < max(ts) − delay
    (Spark fires the final timeouts in the no-data batch it runs after
    the last file, with the final watermark).
    """
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_fn,
            outputStructType=SESSIONS_OUTPUT,
            stateStructType=SESSIONS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_append_mode(df: DataFrame, spark) -> DataFrame:
    """Execute a bounded append-mode stream; return all emissions."""
    import uuid

    from kinesis_producer_spark.streaming.windows import bounded_stream_shuffle

    name = f"mem_{uuid.uuid4().hex[:10]}"
    with bounded_stream_shuffle(spark):
        q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
        q.processAllAvailable()
        q.stop()
    return spark.table(name)


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x arbitrary-state API)
# ---------------------------------------------------------------------------

TWS_OUTPUT = "user_id bigint, n_events bigint, total_cents bigint, recent_types string"


def _tws_processor():
    """Build the StatefulProcessor lazily (the class only exists on
    Spark 4.x; import at call time keeps module import cheap)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserStats(StatefulProcessor):
        """Per-user running stats on the transformWithState API — the
        successor to applyInPandasWithState, with TYPED state handles
        instead of one opaque tuple:

        - ValueState (count + integer-cents total): the O(1)-per-key
          running aggregate;
        - ListState (recent event types, capped at 3): bounded
          per-key history — a state shape the old API could only fake
          inside the single tuple.

        Emissions are update-mode running totals, so the LAST emission
        per key equals the batch-boundary-independent truth (count and
        integer sum are associative) — which is what the test pins.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState(
                "totals", "n_events bigint, total_cents bigint"
            )
            self.recent = handle.getListState("recent", "event_type string")

        def handleInputRows(self, key, rows, timerValues):
            # concat ALL Arrow chunks before sorting: a per-chunk sort
            # interleaves wrongly when a key's batch spans chunks
            # (found in review; same discipline as _sessions_fn)
            chunks = [pdf for pdf in rows if len(pdf)]
            if not chunks:
                return
            batch = pd.concat(chunks, ignore_index=True).sort_values("ts")
            n = len(batch)
            cents = int(batch["cents"].sum())
            types = batch["event_type"].tolist()
            if self.totals.exists():
                prev_n, prev_cents = self.totals.get()
            else:
                prev_n, prev_cents = 0, 0
            n += prev_n
            cents += prev_cents
            self.totals.update((n, cents))
            for t in types:
                self.recent.appendValue((t,))
            # keep only the 3 newest entries (bounded history)
            kept = [r[0] for r in self.recent.get()][-3:]
            self.recent.clear()
            for t in kept:
                self.recent.appendValue((t,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                    "recent_types": [",".join(kept)],
                }
            )

        def close(self) -> None:
            pass

    return UserStats()


def tws_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, integer-cents total, last-3 event
    types) via ``transformWithStateInPandas``. Requires the RocksDB
    state-store provider (a transformWithState constraint — set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider before starting the query) AND the ``protobuf`` package
    (Spark's state-server protocol for this API — verified absent in
    this image, so the operator is dependency-gated: it raises
    ImportError naming the package instead of crashing the streaming
    Python runner mid-query).

    Scale: state is O(1) per key (two longs + a ≤3-element list); the
    typed-column state encoding lands in RocksDB, so key cardinality
    is bounded by disk, not executor memory — the property that lets
    a 100 TB stream track every entity it has ever seen."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's state-server protocol); install protobuf to use "
            "tws_user_stats — the applyInPandasWithState operators in "
            "this module cover the same shapes without it"
        ) from exc
    src = events.select(
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_tws_processor(),
        outputStructType=TWS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Packed-bucket variants (round-8 tuning of the q133/q153 tail):
# applyInPandasWithState cost at many-keys scale is per-group PYTHON
# CALLS, not state-store commits (the q230/q221 measurement) — one
# state row packs a crc32 key-bucket's per-user state as parallel
# arrays, dividing the call count by the bucket fan-in. Buckets are a
# packing unit only: per-user semantics, emission rows, and tie-breaks
# are pinned identical to the per-key path in tests/test_streaming.py.
# ---------------------------------------------------------------------------

VERSION_TRACK_BUCKET_STATE = (
    "uids array<bigint>, firsts array<bigint>, lasts array<bigint>, "
    "nvers array<bigint>"
)


def _version_track_bucket_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = [pdf for pdf in pdfs if len(pdf)]
    if not batch:
        return
    rows = pd.concat(batch).sort_values(["ts", "event_id"])
    st: dict[int, list[int]] = {}
    if state.exists:
        u, f, l, n = state.get
        st = {
            int(ui): [int(fi), int(li), int(ni)]
            for ui, fi, li, ni in zip(u or [], f or [], l or [], n or [])
        }
    touched: list[int] = []
    for uid, v in zip(rows["user_id"], rows["cents"]):
        uid, v = int(uid), int(v)
        cur = st.get(uid)
        if cur is None:
            st[uid] = [v, v, 1]
            touched.append(uid)
        else:
            if v != cur[1]:
                cur[1] = v
                cur[2] += 1
            else:
                cur[1] = v
            touched.append(uid)
    uids = sorted(st)
    state.update(
        (
            uids,
            [st[u][0] for u in uids],
            [st[u][1] for u in uids],
            [st[u][2] for u in uids],
        )
    )
    seen = sorted(set(touched))
    yield pd.DataFrame(
        {
            "user_id": seen,
            "n_versions": [st[u][2] for u in seen],
            "first_cents": [st[u][0] for u in seen],
            "last_cents": [st[u][1] for u in seen],
        }
    )


def stateful_version_track_packed(
    events: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """``stateful_version_track`` with crc32-packed per-user state —
    emission rows identical by construction (per-user fold in the
    same (ts, event_id) order; one cumulative row per user per batch)."""
    bucketed = events.withColumn(
        "_bucket", F.crc32(F.col("user_id").cast("string")) % int(n_buckets)
    )
    return bucketed.groupBy("_bucket").applyInPandasWithState(
        _version_track_bucket_fn,
        outputStructType=VERSION_TRACK_OUTPUT,
        stateStructType=VERSION_TRACK_BUCKET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONS_BUCKET_STATE = (
    "uids array<bigint>, starts array<bigint>, lasts array<bigint>, "
    "ns array<bigint>"
)


def _sessions_bucket_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    st: dict[int, list[int]] = {}
    if state.exists:
        u, s, l, n = state.get
        st = {
            int(ui): [int(si), int(li), int(ni)]
            for ui, si, li, ni in zip(u or [], s or [], l or [], n or [])
        }
    rows_out: list[tuple] = []
    if not state.hasTimedOut:
        batch = [p for p in pdfs if len(p)]
        if batch:
            rows = pd.concat(batch).sort_values(["ts", "event_id"])
            for uid, t in zip(rows["user_id"], rows["ts"]):
                uid = int(uid)
                us = int(pd.Timestamp(t).value // 1000)
                cur = st.get(uid)
                if cur is None:
                    st[uid] = [us, us, 1]
                elif us - cur[1] > SESSION_GAP_MS * 1000:
                    rows_out.append((uid, cur[0], cur[1], cur[2]))
                    st[uid] = [us, us, 1]
                else:
                    cur[1] = us
                    cur[2] += 1
    # watermark sweep: close every member whose deadline the watermark
    # passed — exactly the set whose per-key timeouts would have fired
    # by this batch (strict <, Spark's event-time-timeout rule); runs
    # on BOTH data calls and the bucket's timeout call, because a
    # bucket-level timeout must not delay a member whose own deadline
    # expired earlier than the bucket minimum re-registration
    wm_ms = state.getCurrentWatermarkMs()
    for uid in sorted(st):
        s_, l_, n_ = st[uid]
        if l_ // 1000 + SESSION_GAP_MS < wm_ms:
            rows_out.append((uid, s_, l_, n_))
            del st[uid]
    if st:
        uids = sorted(st)
        state.update(
            (
                uids,
                [st[u][0] for u in uids],
                [st[u][1] for u in uids],
                [st[u][2] for u in uids],
            )
        )
        # bucket timeout = the EARLIEST member deadline (strictly past
        # the watermark, as the API requires)
        next_ms = min(st[u][1] // 1000 + SESSION_GAP_MS for u in uids)
        state.setTimeoutTimestamp(max(next_ms, wm_ms + 1))
    elif state.exists:
        state.remove()
    if rows_out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows_out],
                "session_start": pd.to_datetime([r[1] for r in rows_out], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in rows_out], unit="us"),
                "n_events": [r[3] for r in rows_out],
            }
        )


def stateful_sessions_packed(
    events: DataFrame, delay: str = "10 minutes", n_buckets: int = 64
) -> DataFrame:
    """``stateful_sessions`` with crc32-packed per-user state. The
    bucket carries one EventTimeTimeout = the minimum member deadline,
    and every invocation (data or timeout) closes all members whose
    deadline the current watermark strictly passed — the emitted
    session SET equals the per-key path's (same gap splits from the
    same (ts, event_id) fold; same closure rule as the per-key
    timeouts, which also fire only when the watermark passes the
    deadline), it just batches the firings. Pinned row-identical in
    tests/test_streaming.py."""
    return (
        events.withWatermark("ts", delay)
        .withColumn(
            "_bucket", F.crc32(F.col("user_id").cast("string")) % int(n_buckets)
        )
        .groupBy("_bucket")
        .applyInPandasWithState(
            _sessions_bucket_fn,
            outputStructType=SESSIONS_OUTPUT,
            stateStructType=SESSIONS_BUCKET_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
