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
front). Production additionally ages buckets out with a TTL or a
rolling corpus epoch; the cap is the load-shedding backstop, and
capped buckets trade recall exactly like the batch prefilter.
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
) -> DataFrame:
    """(band_idx, bucket, doc_id) rows — stream-safe column expressions
    only (one md5 per shingle, banded like the batch path)."""
    sig = minhash_signature(docs, shingles(F.col(text_col)), k=k)
    n_bands = k // band_size
    return docs.select(
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
    )


def _bucket_fn_factory(max_bucket_size: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
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
        if pairs:
            yield pd.DataFrame(pairs, columns=["id_a", "id_b"])

    return fn


def streaming_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Candidate near-dup pairs, emitted as documents arrive. Each
    pair may emit once per shared band — run ``dropDuplicates`` (or a
    distinct sink) downstream, exactly like the batch path's final
    ``.distinct()``."""
    buckets = band_buckets(docs, text_col, id_col, k, band_size)
    return buckets.groupBy("band_idx", "bucket").applyInPandasWithState(
        _bucket_fn_factory(max_bucket_size),
        outputStructType=PAIRS_OUTPUT,
        stateStructType=BUCKET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
