"""Streaming MinHash-LSH near-duplicate detection.

Batch dedup (operators/dedup.py) answers "which documents in this
corpus are near-dups"; a training-data pipeline ingesting continuously
needs the STREAMING form: as each document arrives, which
already-ingested documents is it a near-dup candidate of? This module
composes the engine's own pieces:

- the per-row MinHash signature and band hashing are pure column
  expressions (operators/dedup.py), so they run unchanged on a
  stream — no shuffle, no state;
- the only stateful step is bucket membership: per (band, bucket) the
  operator remembers the doc_ids seen so far (bounded list) and emits
  a candidate pair for every new arrival against the bucket's
  residents. ``applyInPandasWithState`` keyed by the bucket gives
  exactly that — state is per-bucket and bounded, so the state store
  scales with bucket cardinality, not corpus size.

Semantics: the DISTINCT set of emitted pairs equals the batch
``lsh_candidate_pairs`` over the same corpus, independent of
micro-batch boundaries (a pair emits when its later member arrives;
duplicate emissions across bands dedup downstream) — asserted against
the batch operator in tests. Replayed doc_ids are ignored (idempotent
ingestion, same contract as q105).

Scale: ``max_bucket_size`` bounds BOTH per-bucket state and the
quadratic pair fan-out of a hot bucket (the skew pathology of LSH —
the batch path leans on AQE for it; the stream must bound it up
front). The cap is the load-shedding backstop, and capped buckets
trade recall exactly like the batch prefilter.

State AGING (round 5): without it the state store grows with bucket
cardinality forever under continuous ingest. ``epoch_ms`` keys every
bucket by a rolling corpus epoch (event-time window start) and
registers an event-time timeout at the epoch's end: once the
watermark passes it, the bucket's state is REMOVED. Near-dup
candidates are then scoped within an epoch — the standard rolling-
corpus dedup contract (a document only dedups against its own
epoch's corpus), and the state store holds only the buckets of
epochs the watermark still keeps alive, regardless of stream age.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesis_producer_spark.operators.dedup import minhash_signature, shingles

PAIRS_OUTPUT = "id_a bigint, id_b bigint"
BUCKET_STATE = "ids array<bigint>"


def band_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    time_col: str | None = None,
    epoch_ms: int | None = None,
) -> DataFrame:
    """(band_idx, bucket, doc_id) rows — stream-safe column expressions
    only (one md5 per shingle, banded like the batch path). With
    ``epoch_ms``, adds the event-time epoch start (``epoch``, ms since
    the Unix epoch — exact bigint math, no doubles) and keeps
    ``time_col`` so the watermark survives the projection."""
    sig = minhash_signature(docs, shingles(F.col(text_col)), k=k)
    n_bands = k // band_size
    cols = [
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        "|", F.slice(sig, b * band_size + 1, F.lit(band_size))
                    )
                ),
            )
        ).alias("band_idx", "bucket"),
    ]
    if epoch_ms is not None:
        if time_col is None:
            raise ValueError("epoch_ms requires time_col")
        cols.append(
            F.expr(
                f"(unix_millis(`{time_col}`) div {int(epoch_ms)}) * {int(epoch_ms)}"
            ).alias("epoch")
        )
        cols.append(F.col(time_col))
    return docs.select(*cols)


def _bucket_fn_factory(max_bucket_size: int, epoch_ms: int | None = None):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if epoch_ms is not None and state.hasTimedOut:
            # the watermark passed this bucket's epoch end: its epoch
            # can receive no more admissible arrivals — drop the state
            state.remove()
            return
        arrivals: list[int] = []
        for pdf in pdfs:
            arrivals.extend(int(x) for x in pdf["doc_id"])
        if not arrivals:
            return
        seen: list[int] = list(state.get[0]) if state.exists else []
        resident = set(seen)
        pairs: list[tuple[int, int]] = []
        for d in sorted(set(arrivals)):
            if d in resident:
                continue  # replayed doc: idempotent ingestion
            for e in seen:
                pairs.append((min(d, e), max(d, e)))
            if len(seen) < max_bucket_size:
                seen.append(d)
                resident.add(d)
        state.update((seen,))
        if epoch_ms is not None:
            # expire when the watermark passes the epoch end; the API
            # requires a timestamp STRICTLY beyond the current watermark
            # (late-but-admissible data can arrive after its epoch end)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(key[0]) + int(epoch_ms), wm + 1))
        if pairs:
            if epoch_ms is not None:
                yield pd.DataFrame(
                    [(int(key[0]), a, b) for a, b in pairs],
                    columns=["epoch", "id_a", "id_b"],
                )
            else:
                yield pd.DataFrame(pairs, columns=["id_a", "id_b"])

    return fn


PACKED_STATE = "keys array<string>, ids array<array<bigint>>"


def _packed_fn_factory(max_bucket_size: int, epoch_ms: int | None = None):
    """Packed variant of ``_bucket_fn_factory``: one state row holds
    every live (band, bucket) resident list of a crc32 super-bucket
    (dict stored as parallel arrays). Identical per-bucket semantics
    and pairs; the super-bucket is a Python-call packing unit — the
    same discipline as streaming/substring.py's bucketed state."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if epoch_ms is not None and state.hasTimedOut:
            state.remove()
            return
        arrivals: list[tuple[str, int]] = []
        for pdf in pdfs:
            arrivals.extend(
                (f"{bi}|{bk}", int(d))
                for bi, bk, d in zip(pdf["band_idx"], pdf["bucket"], pdf["doc_id"])
            )
        if not arrivals:
            return
        store: dict[str, list[int]] = {}
        if state.exists:
            store = {
                k_: list(v) for k_, v in zip(state.get[0], state.get[1])
            }
        pairs: list[tuple[int, int]] = []
        for bkey, d in sorted(set(arrivals)):
            seen = store.setdefault(bkey, [])
            if d in seen:
                continue  # replayed doc: idempotent ingestion
            for e in seen:
                pairs.append((min(d, e), max(d, e)))
            if len(seen) < max_bucket_size:
                seen.append(d)
        ks = sorted(store)
        state.update((ks, [store[k_] for k_ in ks]))
        if epoch_ms is not None:
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(key[0]) + int(epoch_ms), wm + 1))
        if pairs:
            if epoch_ms is not None:
                yield pd.DataFrame(
                    [(int(key[0]), a, b) for a, b in pairs],
                    columns=["epoch", "id_a", "id_b"],
                )
            else:
                yield pd.DataFrame(pairs, columns=["id_a", "id_b"])

    return fn


def streaming_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1024,
    time_col: str | None = None,
    epoch_ms: int | None = None,
    watermark_delay: str = "0 seconds",
    n_buckets: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs, emitted as documents arrive. Each
    pair may emit once per shared band — run ``dropDuplicates`` (or a
    distinct sink) downstream, exactly like the batch path's final
    ``.distinct()``.

    With ``epoch_ms`` (+ ``time_col``), buckets are keyed by rolling
    event-time epoch and AGED OUT via event-time timeout once the
    watermark (``time_col`` − ``watermark_delay``) passes the epoch
    end — the state store stays bounded by the buckets of live epochs
    under indefinite ingest, and candidates are scoped within an
    epoch (output gains an ``epoch`` column, the epoch start in ms).

    ``n_buckets`` switches to PACKED state: keyed by
    ``crc32(band|bucket) % n_buckets``, one row per super-bucket
    holding its (band, bucket)→residents dict — identical pairs, the
    per-group Python-call overhead divided by the fan-in (the
    streaming/substring.py bucketed discipline). Size it so a
    super-bucket's residents stay a modest row; it scales with corpus
    cardinality like shuffle partitions."""
    if epoch_ms is None:
        buckets = band_buckets(docs, text_col, id_col, k, band_size)
        if n_buckets is None:
            return buckets.groupBy("band_idx", "bucket").applyInPandasWithState(
                _bucket_fn_factory(max_bucket_size),
                outputStructType=PAIRS_OUTPUT,
                stateStructType=BUCKET_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        return (
            buckets.withColumn(
                "super",
                F.crc32(F.concat_ws("|", F.col("band_idx"), F.col("bucket")))
                % int(n_buckets),
            )
            .groupBy("super")
            .applyInPandasWithState(
                _packed_fn_factory(max_bucket_size),
                outputStructType=PAIRS_OUTPUT,
                stateStructType=PACKED_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    if time_col is None:
        raise ValueError("epoch_ms requires time_col")
    docs = docs.withWatermark(time_col, watermark_delay)
    buckets = band_buckets(
        docs, text_col, id_col, k, band_size, time_col=time_col, epoch_ms=epoch_ms
    )
    if n_buckets is None:
        return buckets.groupBy("epoch", "band_idx", "bucket").applyInPandasWithState(
            _bucket_fn_factory(max_bucket_size, epoch_ms=epoch_ms),
            outputStructType="epoch bigint, " + PAIRS_OUTPUT,
            stateStructType=BUCKET_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    return (
        buckets.withColumn(
            "super",
            F.crc32(F.concat_ws("|", F.col("band_idx"), F.col("bucket")))
            % int(n_buckets),
        )
        .groupBy("epoch", "super")
        .applyInPandasWithState(
            _packed_fn_factory(max_bucket_size, epoch_ms=epoch_ms),
            outputStructType="epoch bigint, " + PAIRS_OUTPUT,
            stateStructType=PACKED_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
