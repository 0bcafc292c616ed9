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
IGNORED — neither re-counted nor re-emitted (the original verdict is
already downstream; idempotent ingestion, the streaming-LSH/semantic
contract), state carrying the set of seen ids per source.

Scale — pick ONE of three state disciplines:

- ``track_ids=False`` (the RECOMMENDED production default when the
  upstream transport is exactly-once, e.g. the Kinesis sink's
  epoch-commit ledger, q40): state is ONE bigint counter per source,
  nothing grows.
- ``seen_ttl_ms=<replay horizon>``: bounded at-least-once mode.
  ADMITTED ids are tracked forever — that set is intrinsically
  bounded by the budget itself (≤ budget/min_doc_tokens entries), and
  it is the set that protects the counter (re-counting an admitted
  replay would corrupt ``cum``). REJECTED ids age out ``seen_ttl_ms``
  past their event time (pruned against the query watermark): a
  replay older than the TTL re-emits its row, but that row is
  byte-identical — after the first rejection ``cum`` is frozen
  forever (admission only ever decrements headroom), so a rejected
  doc's (cum_before, admitted=0) can never change. Size the TTL at
  the transport's replay horizon (Kinesis: 24 h–7 d) and state is
  bounded by the horizon's arrival volume, not the stream's lifetime.

  Admitted-set sizing (be honest about the worst case): the bound is
  ``budget / min_doc_tokens`` ENTRIES — with no minimum document
  length enforced upstream, a flood of 1-token documents makes that
  bound the budget itself (a 1B-token budget → up to 1e9 int64s ≈
  8 GB in ONE state row, which no state store survives). Size it as
  ``8 bytes × budget / min_doc_tokens`` and pass ``max_admitted_ids``
  to fail loudly (with that formula in the message) before the state
  row grows past what was provisioned; past the guard the honest
  fixes are a shorter-budget source split or the ``track_ids=False``
  exactly-once transport, never silent truncation (dropping an
  admitted id would let a replay re-count it and corrupt ``cum``).
- default (``track_ids=True``, no TTL): every seen id is kept —
  exact no-re-emission forever, state grows with arrivals; use only
  for bounded backfills.
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
# TTL mode: admitted ids are budget-bounded and kept forever (they
# guard the counter); rejected ids carry their last event time and age
# out once the watermark passes event_ms + ttl
BUDGET_STATE_TTL = (
    "cum bigint, admitted_ids array<bigint>, "
    "rejected_ids array<bigint>, rejected_ms array<bigint>"
)


def tokenized_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str | None = None,
) -> DataFrame:
    """(source, doc_id, n_tokens[, event_ms]) — the stream-safe
    stateless prefix; token counting is the same whitespace-split
    column expression as the batch queries (no Python in the hot
    path). With ``time_col``, keeps the event time (exact bigint
    millis) for the TTL-aged seen set."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    cols = [
        F.col("source"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    ]
    if time_col is not None:
        cols.append(F.unix_millis(F.col(time_col)).alias("event_ms"))
        cols.append(F.col(time_col))
    return docs.select(*cols)


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


def _budget_ttl_fn_factory(
    token_budget: int, seen_ttl_ms: int, max_admitted_ids: int | None = None
):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            for did, nt, ms in zip(pdf["doc_id"], pdf["n_tokens"], pdf["event_ms"]):
                rows.append((int(did), int(nt), int(ms)))
        if not rows:
            return
        rows.sort(key=lambda t: t[0])
        if state.exists:
            cum = int(state.get[0])
            admitted_ids = set(state.get[1] or [])
            rejected: dict[int, int] = {
                int(d): int(m) for d, m in zip(state.get[2] or [], state.get[3] or [])
            }
        else:
            cum, admitted_ids, rejected = 0, set(), {}
        wm = state.getCurrentWatermarkMs()
        # age rejected ids out once the watermark passes event + ttl:
        # a later replay re-emits a byte-identical row (cum is frozen
        # after the first rejection), so only duplicate emission is at
        # stake, never the counter
        rejected = {d: m for d, m in rejected.items() if m + seen_ttl_ms > wm}
        out: list[tuple[str, int, int, int, int]] = []
        src = str(key[0])
        for did, nt, ms in rows:
            if did in admitted_ids:
                continue  # admitted replay: must never re-count
            if did in rejected:
                rejected[did] = max(rejected[did], ms)
                continue
            admitted = 1 if cum < token_budget else 0
            out.append((src, did, nt, cum, admitted))
            if admitted:
                cum += nt
                admitted_ids.add(did)
            else:
                rejected[did] = ms
        if max_admitted_ids is not None and len(admitted_ids) > max_admitted_ids:
            # fail LOUDLY before the state row outgrows what was
            # provisioned — silently dropping an admitted id would let
            # a replay re-count it and corrupt cum (module docstring
            # has the 8·budget/min_doc_tokens sizing formula)
            raise ValueError(
                f"admitted-id state for source {src!r} reached "
                f"{len(admitted_ids)} entries (> max_admitted_ids="
                f"{max_admitted_ids}): the corpus's min doc length is "
                f"smaller than provisioned (state bound is "
                f"budget/min_doc_tokens = {token_budget}/min_doc_tokens "
                f"entries x 8 bytes); split the source budget or switch "
                f"to track_ids=False over an exactly-once transport"
            )
        rids = sorted(rejected)
        state.update(
            (cum, sorted(admitted_ids), rids, [rejected[d] for d in rids])
        )
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
    time_col: str | None = None,
    seen_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
    max_admitted_ids: int | None = None,
) -> DataFrame:
    """Admission rows (source, doc_id, n_tokens, cum_before, admitted)
    emitted as documents arrive; cum_before counts only ADMITTED
    tokens so far, and admission is the q238 straddler policy
    (cum_before < budget admits, even across the boundary).

    State discipline (module docstring has the full contract):
    ``track_ids=False`` for exactly-once transports (counter only,
    the production default); ``seen_ttl_ms`` + ``time_col`` for
    bounded at-least-once replay suppression (admitted ids kept —
    budget-bounded; ``max_admitted_ids`` fails loudly if a degenerate
    short-doc corpus blows that bound — rejected ids aged out past the
    replay horizon); plain ``track_ids=True`` keeps every id forever
    (bounded backfills only). The disciplines are mutually exclusive:
    ``seen_ttl_ms`` with ``track_ids=False`` is a contract error (TTL
    mode IS id tracking), rejected here rather than silently tracking
    ids the caller asked not to keep."""
    if seen_ttl_ms is not None:
        if time_col is None:
            raise ValueError("seen_ttl_ms requires time_col")
        if not track_ids:
            raise ValueError(
                "seen_ttl_ms and track_ids=False are contradictory: the "
                "TTL discipline tracks admitted ids (budget-bounded) and "
                "TTL-ages rejected ids; pick ONE of the module "
                "docstring's three state disciplines"
            )
        docs = docs.withWatermark(time_col, watermark_delay)
        stream = tokenized_stream(
            docs, text_col=text_col, id_col=id_col, time_col=time_col
        )
        return stream.groupBy("source").applyInPandasWithState(
            _budget_ttl_fn_factory(
                int(token_budget),
                int(seen_ttl_ms),
                int(max_admitted_ids) if max_admitted_ids is not None else None,
            ),
            outputStructType=BUDGET_OUTPUT,
            stateStructType=BUDGET_STATE_TTL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    stream = tokenized_stream(docs, text_col=text_col, id_col=id_col)
    return stream.groupBy("source").applyInPandasWithState(
        _budget_fn_factory(int(token_budget), track_ids),
        outputStructType=BUDGET_OUTPUT,
        stateStructType=BUDGET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
