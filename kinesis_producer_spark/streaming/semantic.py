"""Streaming SemDeDup: semantic dedup keep-list decisions as vectors arrive.

Batch SemDeDup (operators/similarity.py:semantic_dedup_keep_list, q231)
answers "which vectors of this corpus are semantically redundant"; a
pipeline embedding documents continuously needs the STREAMING form: as
each vector arrives, is it a near-duplicate of something its cell has
already seen? This module mirrors the streaming-LSH / streaming-
substring composition (streaming/lsh.py, streaming/substring.py):

- the coarse cell id (IVF sign bits) is a pure column expression —
  stream-safe, no state;
- the only stateful step is per-cell residency: the state holds the
  (vec_id, embedding, self-norm) of every vector the cell has admitted;
  each first-seen arrival is scored against the residents with the
  SAME integer-exact quantized cosine as the batch path and emits its
  keep-list row — kept with dup_of = -1, or dropped with dup_of = the
  smallest matching resident id.

Semantics: with the whole corpus in one availableNow batch, arrivals
sort by vec_id inside each cell group, so every vector is compared
against exactly its lower-id cellmates — the batch q231 answer row for
row (asserted by the q236 oracle, which is q231's verbatim). Across
micro-batches, residency is first-ARRIVAL: a vector dedups against
whatever its cell held when it arrived (the rolling-ingest contract;
pinned in tests). Replays of an already-resident vec_id are ignored
(idempotent ingestion, the streaming-LSH contract).

Exactness: the Python-side cosine reproduces the batch expression
operation for operation — per-element product quantized to picounits
(``floor(x·y·1e12 + 0.5)``, float32 inputs widened to float64 exactly
as Spark's CAST does), integer sum, then one fixed-order double
expression ``floor(1e6·qxy/sqrt(qxx·qyy) + 0.5)``. Self-norms are
computed once per vector and carried in state (the batch hoisting).

Scale: per-cell state is capped at ``max_residents`` — the same
load-shedding backstop as streaming-LSH's ``max_bucket_size`` (an
over-full cell trades recall, never memory), and the per-arrival cost
is one dot per resident, the batch sum-of-|cell|² pair bound paid
incrementally. With ``epoch_ms``, cells are keyed by rolling
event-time epoch and aged out by event-time timeout once the
watermark passes the epoch end — state bounded by live-epoch cell
population under indefinite ingest.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesis_producer_spark.operators.similarity import ivf_cell

KEEP_OUTPUT = "vec_id bigint, kept bigint, dup_of bigint"
CELL_STATE = "ids array<bigint>, embs array<array<float>>, norms array<bigint>"


def _qdot_np(a: np.ndarray, b: np.ndarray) -> int:
    """Batch qdot (operators/similarity.py:29) reproduced in numpy:
    per-element picounit quantization, exact integer sum."""
    return int(np.floor(a * b * 1e12 + 0.5).astype(np.int64).sum())


def _cos_micro_py(qxy: int, qxx: int, qyy: int) -> int:
    """Batch cosine_micro's final double expression, same op order."""
    return math.floor(1e6 * float(qxy) / math.sqrt(float(qxx) * float(qyy)) + 0.5)


def cell_vectors(
    vecs: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 3,
    time_col: str | None = None,
    epoch_ms: int | None = None,
) -> DataFrame:
    """(cell, vec_id, embedding) rows — the stream-safe stateless
    prefix. With ``epoch_ms``, adds the event-time epoch start (exact
    bigint math) and keeps ``time_col`` so the watermark survives."""
    cols = [
        ivf_cell(F.col(emb_col), bits).alias("cell"),
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.col(emb_col).alias("embedding"),
    ]
    if epoch_ms is None:
        return vecs.select(*cols)
    if time_col is None:
        raise ValueError("epoch_ms requires time_col")
    return vecs.select(
        *cols,
        F.expr(
            f"(unix_millis(`{time_col}`) div {int(epoch_ms)}) * {int(epoch_ms)}"
        ).alias("epoch"),
        F.col(time_col),
    )


def _cell_fn_factory(
    threshold_micro: int, max_residents: int, epoch_ms: int | None = None
):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if epoch_ms is not None and state.hasTimedOut:
            # watermark passed this cell's epoch end: no admissible
            # arrival can land in it again — drop the residents
            state.remove()
            return
        arrivals: list[tuple[int, np.ndarray]] = []
        for pdf in pdfs:
            for vid, emb in zip(pdf["vec_id"], pdf["embedding"]):
                arrivals.append(
                    (int(vid), np.asarray(emb, dtype=np.float64))
                )
        if not arrivals:
            return
        # sorted → within one batch each vector sees exactly its
        # lower-id cellmates, the batch q231 comparison set
        arrivals.sort(key=lambda t: t[0])
        if state.exists:
            ids = list(state.get[0])
            raw = [np.asarray(e, dtype=np.float64) for e in state.get[1]]
            norms = list(state.get[2])
        else:
            ids, raw, norms = [], [], []
        resident = set(ids)
        rows: list[tuple[int, int, int]] = []
        for vid, emb in arrivals:
            if vid in resident:
                continue  # replayed vector: idempotent ingestion
            qyy = _qdot_np(emb, emb)
            dup = -1
            for rid, remb, rn in zip(ids, raw, norms):
                if dup != -1 and rid >= dup:
                    continue
                qxy = _qdot_np(emb, remb)
                if _cos_micro_py(qxy, int(rn), qyy) >= threshold_micro:
                    dup = rid if dup == -1 else min(dup, rid)
            rows.append((vid, 1 if dup == -1 else 0, dup))
            if len(ids) < max_residents:
                ids.append(vid)
                raw.append(emb)
                norms.append(qyy)
                resident.add(vid)
        state.update(
            (ids, [[float(x) for x in np.asarray(e, dtype=np.float32)] for e in raw], norms)
        )
        if epoch_ms is not None:
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(key[0]) + int(epoch_ms), wm + 1))
        if rows:
            if epoch_ms is not None:
                yield pd.DataFrame(
                    [(int(key[0]), v, k, d) for v, k, d in rows],
                    columns=["epoch", "vec_id", "kept", "dup_of"],
                )
            else:
                yield pd.DataFrame(rows, columns=["vec_id", "kept", "dup_of"])

    return fn


def streaming_semantic_keep_list(
    vecs: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int | None = None,
    threshold_micro: int = 300_000,
    max_residents: int = 65_536,
    time_col: str | None = None,
    epoch_ms: int | None = None,
    watermark_delay: str = "0 seconds",
    expected_corpus: int | None = None,
) -> DataFrame:
    """Keep-list rows (vec_id, kept, dup_of) emitted as vectors
    arrive; dup_of is -1 for kept rows (the q231 output contract).
    Update-mode re-emissions on replay — dedup downstream, the
    streaming-LSH contract.

    With ``epoch_ms`` (+ ``time_col``), cell residency is keyed by
    rolling event-time epoch and AGED OUT via event-time timeout once
    the watermark passes the epoch end (output gains an ``epoch``
    column).

    The quantizer width: a stream cannot be counted, so ``bits=None``
    derives it from ``expected_corpus`` (the live corpus size the
    deployment is provisioned for — the same
    ``similarity.semdedup_auto_bits`` rule as the batch operator, so
    cell density cannot silently go quadratic at 100× volume); the
    cell id keys the state store, so bits is FIXED for a checkpoint's
    lifetime — changing it means a new checkpoint, like any state
    schema change."""
    if bits is None:
        if expected_corpus is None:
            raise ValueError(
                "provide bits or expected_corpus: a stream cannot be "
                "counted, and the cell id keys the state store"
            )
        from kinesis_producer_spark.operators.similarity import semdedup_auto_bits

        bits = semdedup_auto_bits(expected_corpus)
    if epoch_ms is None:
        cells = cell_vectors(vecs, emb_col, id_col, bits)
        return cells.groupBy("cell").applyInPandasWithState(
            _cell_fn_factory(threshold_micro, max_residents),
            outputStructType=KEEP_OUTPUT,
            stateStructType=CELL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    if time_col is None:
        raise ValueError("epoch_ms requires time_col")
    vecs = vecs.withWatermark(time_col, watermark_delay)
    cells = cell_vectors(
        vecs, emb_col, id_col, bits, time_col=time_col, epoch_ms=epoch_ms
    )
    return cells.groupBy("epoch", "cell").applyInPandasWithState(
        _cell_fn_factory(threshold_micro, max_residents, epoch_ms=epoch_ms),
        outputStructType="epoch bigint, " + KEEP_OUTPUT,
        stateStructType=CELL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
