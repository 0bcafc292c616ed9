"""Streaming sketch maintenance with bounded custom state.

The engine's three mergeable sketches each have a streaming form:

- Count-Min (q218): counters ADD — a plain streaming groupBy sum,
  no custom state (tests pin streaming grid == batch grid);
- HLL registers (q222): registers MAX — a plain streaming groupBy
  max (same contract, same test pattern);
- KMV (q145/q224): the merge is "k smallest of the union", which is
  NOT a built-in streaming aggregate — collect_list would hold every
  distinct hash (state grows with cardinality, the opposite of a
  sketch). This module keeps the sketch itself as the state:
  ``applyInPandasWithState`` per segment holds exactly the k
  lexicographically smallest hashes seen so far — O(k) state per
  segment FOREVER, merged incrementally per micro-batch.

Because a KMV sketch is a set union, the ``ks`` state is
replay-idempotent for free (re-delivered hashes change nothing), and
the final emission per segment equals the batch ``kmv_partial_sketch``
over the same corpus — both pinned in tests. The emitted ``n_seen``
arrival tally is explicitly OUTSIDE that guarantee: it re-counts
re-delivered micro-batches (at-least-once observability counter, not
an exact count — see ``streaming_kmv``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_OUTPUT = "key string, ks array<string>, n_seen bigint"
KMV_STATE = "ks array<string>, n_seen bigint"


def _kmv_fn_factory(k: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        arrivals: list[str] = []
        for pdf in pdfs:
            arrivals.extend(str(x) for x in pdf["h"])
        if not arrivals:
            return
        ks: list[str]
        n_seen: int
        if state.exists:
            ks, n_seen = list(state.get[0]), int(state.get[1])
        else:
            ks, n_seen = [], 0
        # set-union merge, then bottom-k: the ks set is idempotent
        # under replay; n_seen below is NOT (it re-counts re-delivered
        # micro-batches) — see streaming_kmv's docstring for the scope
        merged = sorted(set(ks) | set(arrivals))[:k]
        n_seen += len(arrivals)
        state.update((merged, n_seen))
        yield pd.DataFrame(
            [{"key": key[0], "ks": merged, "n_seen": n_seen}],
            columns=["key", "ks", "n_seen"],
        )

    return fn


def streaming_kmv(
    docs: DataFrame,
    key_col: str = "key",
    hash_col: str = "h",
    k: int = 64,
) -> DataFrame:
    """Per-segment KMV sketches maintained over a stream: one emission
    per segment per micro-batch carrying the CURRENT k-smallest set
    (update mode — downstream keeps the latest row per key).

    Scale: state is exactly k hashes (+1 counter) per segment,
    independent of stream length or segment cardinality; each batch
    shuffles only the batch's (key, hash) rows. The batch-equivalence
    and replay-idempotence contracts are pinned in
    tests/test_streaming.py.

    Replay-idempotence scope: ONLY the ``ks`` set (and hence any
    distinct-count estimate derived from it) is idempotent — a
    re-delivered micro-batch set-unions to the same bottom-k. The
    ``n_seen`` counter is a raw arrival tally and DOES inflate on
    re-delivery; treat it as an at-least-once observability counter,
    not an exact count. An exact replay-safe count would need
    per-record ids deduplicated in state (unbounded) — out of scope
    for a bounded sketch."""
    from pyspark.sql import functions as F

    src = docs.select(
        F.col(key_col).cast("string").alias("key"), F.col(hash_col).alias("h")
    )
    return src.groupBy("key").applyInPandasWithState(
        _kmv_fn_factory(k),
        outputStructType=KMV_OUTPUT,
        stateStructType=KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
