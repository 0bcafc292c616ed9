"""Streaming exact-substring duplicate marking.

Batch span dedup (operators/dedup.py:exact_substring_spans) answers
"which passages of this corpus are duplicated"; a pipeline ingesting
continuously needs the STREAMING form: as each document arrives, which
of its n-gram windows has the corpus already seen? This module mirrors
the streaming-LSH composition (streaming/lsh.py):

- positional grams and their md5 digests are pure column expressions
  (operators/dedup.py:positional_shingles) — stream-safe, no state;
- the only stateful step is per-gram first-occurrence tracking: keyed
  by digest, the state holds the CANONICAL (first-arrival) occurrence;
  every later arrival of the same digest is emitted as a duplicate
  mark (doc_id, pos). That is exactly the batch ``keep_first`` policy
  (q228): one copy of every duplicated window survives unmarked.

Semantics: with the whole corpus in one availableNow batch, the
DISTINCT mark set equals the batch keep-first marking — arrivals sort
by (doc_id, pos) inside the group, so the canonical pick is the
lexicographic minimum, the same tie-break the batch aggregate uses —
and the span fold over those marks equals q228's spans (asserted by
the q230 oracle). Across micro-batches, canonical status is
first-ARRIVAL wins: an early-batch occurrence stays canonical when
later batches repeat it (pinned in tests). Replays of the canonical
occurrence itself are ignored (idempotent ingestion); replayed
non-canonical occurrences re-emit their mark — update-mode output,
dedup downstream, the streaming-LSH contract.

Scale: state is one (doc_id, pos) pair PER DISTINCT LIVE GRAM — the
honest floor for exact substring dedup (the batch path shuffles every
gram occurrence per run; the stream pays one bounded record per
distinct gram instead, amortized over the corpus lifetime). Without
aging that grows with corpus vocabulary forever, so ``epoch_ms`` keys
gram state by a rolling event-time epoch and registers an event-time
timeout at the epoch end: once the watermark passes it, the gram's
state is REMOVED and dedup is scoped within an epoch — the rolling-
corpus contract, state bounded by live-epoch gram cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesis_producer_spark.operators.dedup import positional_shingles

MARKS_OUTPUT = "doc_id bigint, pos int"
GRAM_STATE = "canon_doc bigint, canon_pos int"


def gram_positions(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    time_col: str | None = None,
    epoch_ms: int | None = None,
) -> DataFrame:
    """(digest, doc_id, pos) rows — stream-safe column expressions only
    (one md5 per positional gram, like the batch path). With
    ``epoch_ms``, adds the event-time epoch start (exact bigint math)
    and keeps ``time_col`` so the watermark survives the projection."""
    cols = [
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.posexplode(F.transform(positional_shingles(text_col, n), F.md5)).alias(
            "pos", "digest"
        ),
    ]
    out = docs.select(*cols)
    if epoch_ms is not None:
        if time_col is None:
            raise ValueError("epoch_ms requires time_col")
        out = docs.select(
            *cols,
            F.expr(
                f"(unix_millis(`{time_col}`) div {int(epoch_ms)}) * {int(epoch_ms)}"
            ).alias("epoch"),
            F.col(time_col),
        )
    return out


def _gram_fn_factory(epoch_ms: int | None = None):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if epoch_ms is not None and state.hasTimedOut:
            # watermark passed this gram's epoch end: no admissible
            # arrival can reference it again — drop the state
            state.remove()
            return
        arrivals: list[tuple[int, int]] = []
        for pdf in pdfs:
            arrivals.extend(
                (int(d), int(p)) for d, p in zip(pdf["doc_id"], pdf["pos"])
            )
        if not arrivals:
            return
        # sorted → within one batch the canonical pick is the
        # lexicographic minimum, the batch keep_first tie-break
        arrivals = sorted(set(arrivals))
        if state.exists:
            canon = (int(state.get[0]), int(state.get[1]))
        else:
            canon = arrivals[0]
        marks = [a for a in arrivals if a != canon]
        state.update((canon[0], canon[1]))
        if epoch_ms is not None:
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(key[0]) + int(epoch_ms), wm + 1))
        if marks:
            if epoch_ms is not None:
                yield pd.DataFrame(
                    [(int(key[0]), d, p) for d, p in marks],
                    columns=["epoch", "doc_id", "pos"],
                )
            else:
                yield pd.DataFrame(marks, columns=["doc_id", "pos"])

    return fn


BUCKET_STATE = "digests array<string>, docs array<bigint>, poss array<int>"


def _bucket_fn_factory(epoch_ms: int | None = None):
    """Bucketed variant of ``_gram_fn_factory``: one state row packs
    every live gram of a digest BUCKET (digest→canonical dict stored
    as parallel arrays). Identical per-digest semantics; the bucket is
    purely a packing unit that divides the per-group Python-call
    overhead by the bucket fan-in (measured 23.2s → ~4s at sf0.1 for
    q230's ~150k distinct grams)."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if epoch_ms is not None and state.hasTimedOut:
            state.remove()
            return
        arrivals: list[tuple[str, int, int]] = []
        for pdf in pdfs:
            arrivals.extend(
                (str(g), int(d), int(p))
                for g, d, p in zip(pdf["digest"], pdf["doc_id"], pdf["pos"])
            )
        if not arrivals:
            return
        # sorted → per digest the canonical pick is the lexicographic
        # minimum, the batch keep_first tie-break (as in the
        # per-gram path)
        arrivals = sorted(set(arrivals))
        canon: dict[str, tuple[int, int]] = {}
        if state.exists:
            canon = {
                g: (int(d), int(p))
                for g, d, p in zip(state.get[0], state.get[1], state.get[2])
            }
        marks: list[tuple[int, int]] = []
        for g, d, p in arrivals:
            c = canon.get(g)
            if c is None:
                canon[g] = (d, p)
            elif (d, p) != c:
                marks.append((d, p))
        gs = sorted(canon)
        state.update(
            (gs, [canon[g][0] for g in gs], [canon[g][1] for g in gs])
        )
        if epoch_ms is not None:
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(key[0]) + int(epoch_ms), wm + 1))
        if marks:
            if epoch_ms is not None:
                yield pd.DataFrame(
                    [(int(key[0]), d, p) for d, p in marks],
                    columns=["epoch", "doc_id", "pos"],
                )
            else:
                yield pd.DataFrame(marks, columns=["doc_id", "pos"])

    return fn


def streaming_duplicate_marks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    time_col: str | None = None,
    epoch_ms: int | None = None,
    watermark_delay: str = "0 seconds",
    n_buckets: int | None = None,
) -> DataFrame:
    """Duplicate n-gram window marks (doc_id, pos), emitted as
    documents arrive; each gram's first-arrival occurrence stays
    unmarked (keep-first). Run ``distinct`` downstream (update-mode
    re-emissions on replay, the streaming-LSH contract); fold marks
    into spans with ``operators.dedup._spans_from_marked``.

    With ``epoch_ms`` (+ ``time_col``), gram state is keyed by rolling
    event-time epoch and AGED OUT via event-time timeout once the
    watermark passes the epoch end — dedup scopes within an epoch and
    the state store holds only live-epoch grams (output gains an
    ``epoch`` column).

    ``n_buckets`` switches to BUCKETED state packing: state is keyed
    by ``crc32(digest) % n_buckets`` and one row holds that bucket's
    digest→canonical dict, dividing the per-group Python-call
    overhead by the fan-in — identical marks (the per-digest logic is
    unchanged), state CONTENT still one canonical per live gram.
    Size n_buckets so a bucket's live grams stay a modest row
    (corpus-vocabulary / n_buckets ≈ thousands): it is a throughput
    knob that scales with the corpus, like shuffle partitions."""
    if epoch_ms is None:
        grams = gram_positions(docs, text_col, id_col, n)
        if n_buckets is None:
            return grams.groupBy("digest").applyInPandasWithState(
                _gram_fn_factory(),
                outputStructType=MARKS_OUTPUT,
                stateStructType=GRAM_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        return (
            grams.withColumn("bucket", F.crc32(F.col("digest")) % int(n_buckets))
            .groupBy("bucket")
            .applyInPandasWithState(
                _bucket_fn_factory(),
                outputStructType=MARKS_OUTPUT,
                stateStructType=BUCKET_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    if time_col is None:
        raise ValueError("epoch_ms requires time_col")
    docs = docs.withWatermark(time_col, watermark_delay)
    grams = gram_positions(
        docs, text_col, id_col, n, time_col=time_col, epoch_ms=epoch_ms
    )
    if n_buckets is None:
        return grams.groupBy("epoch", "digest").applyInPandasWithState(
            _gram_fn_factory(epoch_ms=epoch_ms),
            outputStructType="epoch bigint, " + MARKS_OUTPUT,
            stateStructType=GRAM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    return (
        grams.withColumn("bucket", F.crc32(F.col("digest")) % int(n_buckets))
        .groupBy("epoch", "bucket")
        .applyInPandasWithState(
            _bucket_fn_factory(epoch_ms=epoch_ms),
            outputStructType="epoch bigint, " + MARKS_OUTPUT,
            stateStructType=BUCKET_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
