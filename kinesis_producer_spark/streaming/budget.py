"""Streaming token-budget admission: the online form of q238's
selection manifest.

Batch selection (q238) ranks the WHOLE corpus and cuts at the budget;
an ingest pipeline admitting documents as they arrive cannot rank what
it has not seen — it runs the streaming form: per-source state carries
the cumulative admitted token count, and each arrival is admitted iff
the source's budget is not yet exhausted WHEN IT ARRIVES (cum_before <
budget — the q238 straddler policy: the document that crosses the
boundary is still admitted, then the gate closes). This is the
first-come admission contract of a real ingest quota, not an
approximation of the batch ranking.

Semantics: within one micro-batch, arrivals sort by doc_id (the
fixture's arrival order), so a single availableNow batch over the
corpus equals the batch window cumsum ordered by doc_id per source —
the q243 oracle. Across micro-batches the cumulative count carries in
state (pinned in tests/test_streaming.py). Replayed doc_ids are
re-emitted with the same verdict but not re-counted (idempotent
ingestion — the streaming-LSH/semantic contract), state carrying the
set of counted ids per source, capped by the budget's own admission
bound plus the rejected tail seen so far.

Scale: state per source is one bigint counter plus the counted-id set;
the id set is the replay-idempotence cost and is BOUNDED per source by
the stream's own arrival volume — production deployments with
exactly-once upstream delivery (the Kinesis sink's ledger, q40) drop
it and keep the counter alone (``track_ids=False``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BUDGET_OUTPUT = (
    "source string, doc_id bigint, n_tokens bigint, cum_before bigint, "
    "admitted bigint"
)
BUDGET_STATE = "cum bigint, seen array<bigint>"


def tokenized_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(source, doc_id, n_tokens) — the stream-safe stateless prefix;
    token counting is the same whitespace-split column expression as
    the batch queries (no Python in the hot path)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    return docs.select(
        F.col("source"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


def _budget_fn_factory(token_budget: int, track_ids: bool):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            for did, nt in zip(pdf["doc_id"], pdf["n_tokens"]):
                rows.append((int(did), int(nt)))
        if not rows:
            return
        rows.sort(key=lambda t: t[0])
        if state.exists:
            cum = int(state.get[0])
            seen = set(state.get[1] or [])
        else:
            cum, seen = 0, set()
        out: list[tuple[str, int, int, int, int]] = []
        src = str(key[0])
        for did, nt in rows:
            if did in seen:
                # replay: never re-counted (and not re-emitted — the
                # original verdict is already downstream; update-mode
                # consumers dedup on doc_id, the streaming-LSH contract)
                continue
            admitted = 1 if cum < token_budget else 0
            out.append((src, did, nt, cum, admitted))
            if admitted:
                cum += nt
            if track_ids:
                seen.add(did)
        state.update((cum, sorted(seen) if track_ids else []))
        if out:
            yield pd.DataFrame(
                out,
                columns=["source", "doc_id", "n_tokens", "cum_before", "admitted"],
            )

    return fn


def streaming_token_budget(
    docs: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    track_ids: bool = True,
) -> DataFrame:
    """Admission rows (source, doc_id, n_tokens, cum_before, admitted)
    emitted as documents arrive; cum_before counts only ADMITTED
    tokens so far, and admission is the q238 straddler policy
    (cum_before < budget admits, even across the boundary)."""
    stream = tokenized_stream(docs, text_col=text_col, id_col=id_col)
    return stream.groupBy("source").applyInPandasWithState(
        _budget_fn_factory(int(token_budget), track_ids),
        outputStructType=BUDGET_OUTPUT,
        stateStructType=BUDGET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
