"""Custom stateful streaming operator: incremental page reassembly.

Pages of a document can arrive across micro-batches (e.g. page-level OCR
results streaming off a queue). ``streaming_reassemble`` keeps per-document
state — expected page count + pages collected so far — and emits one
``(doc_id, doc_text, n_pages, status)`` row the moment the document
completes, via ``applyInPandasWithState`` (the Structured Streaming analog
of the reference's per-doc temp-file accumulation + final join,
pdf2pdfocr.py:942-956, with the marker-file progress tracking at 160,985-991
replaced by explicit state). Page order is restored from offsets, never
arrival order.

State eviction (round-3 verdict #3): with ``state_timeout_ms`` set, a
document whose remaining pages never arrive is EVICTED on a processing-time
timeout — its partial text emits with ``status='timeout_partial'`` (the
streaming mirror of the batch path's timeout→quarantine: the doc aborts,
the stream continues, reference doc abort + batch-continues semantics at
pdf2pdfocr.py:1511-1533) and its state drops. Without the timeout a
never-completing doc held its page texts in state forever — the slow OOM at
stream scale.
"""

from __future__ import annotations

import functools
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGE_EVENT_SCHEMA = (
    "doc_id string, offset int, n_pages int, page_text string"
)
OUTPUT_SCHEMA = "doc_id string, doc_text string, n_pages int, status string"
STATE_SCHEMA = "offsets array<int>, texts array<string>, expected int"


def _reassemble_fn(
    key: Tuple[str],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    if timeout_ms is not None and state.hasTimedOut:
        # eviction path: no new data for this doc within the timeout —
        # quarantine the partial doc and drop its state (bounded state)
        offsets, texts, _expected = state.get
        ordered = [t for _, t in sorted(zip(list(offsets), list(texts)))]
        state.remove()
        yield pd.DataFrame(
            {"doc_id": [key[0]], "doc_text": ["".join(ordered)],
             "n_pages": [len(ordered)], "status": ["timeout_partial"]}
        )
        return

    if state.exists:
        offsets, texts, expected = state.get
        offsets, texts = list(offsets), list(texts)
    else:
        offsets, texts, expected = [], [], -1

    # O(1) membership: `off not in offsets` on the state LIST is
    # O(pages²)/doc across a document's lifetime — 10⁸ comparisons for a
    # 10k-page doc (round-2 verdict). The set is rebuilt per invocation
    # from the state list (state schema unchanged), so the quadratic term
    # is gone while the state stays a plain array.
    seen = set(offsets)
    for pdf in batches:
        # zipped column arrays, not iterrows() (the slowest pandas path)
        for off, n_pages, text in zip(
            pdf["offset"].to_numpy(), pdf["n_pages"].to_numpy(),
            pdf["page_text"].to_numpy(),
        ):
            expected = int(n_pages)
            off = int(off)
            if off not in seen:  # idempotent re-delivery
                seen.add(off)
                offsets.append(off)
                texts.append(text)

    if expected >= 0 and len(offsets) >= expected:
        ordered = [t for _, t in sorted(zip(offsets, texts))]
        state.remove()
        yield pd.DataFrame(
            {"doc_id": [key[0]], "doc_text": ["".join(ordered)],
             "n_pages": [expected], "status": ["complete"]}
        )
    else:
        state.update((offsets, texts, expected))
        if timeout_ms is not None:
            # re-armed on every update: the clock measures inactivity (time
            # since this doc last received a page), not total lifetime
            state.setTimeoutDuration(timeout_ms)


def streaming_reassemble(
    pages: DataFrame, state_timeout_ms: int | None = None
) -> DataFrame:
    """page-event stream → completed-document stream.

    ``state_timeout_ms``: processing-time inactivity budget per document;
    on expiry the partial doc emits with status='timeout_partial' and its
    state drops. None (default) keeps state until completion — use the
    timeout in production, where a lost page otherwise pins state forever.
    """
    fn = functools.partial(_reassemble_fn, timeout_ms=state_timeout_ms)
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        pages.groupBy("doc_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
