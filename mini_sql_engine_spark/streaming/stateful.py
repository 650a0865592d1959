"""Custom stateful streaming operators via ``applyInPandasWithState``.

``streaming_dedup`` is the one a training-data pipeline actually
needs: exact first-occurrence deduplication over an unbounded stream.
Spark's built-in ``dropDuplicates`` on a stream keeps ALL keys in
state forever unless a watermark column is part of the key; this
operator owns its state explicitly — one boolean per key, optional
TTL — which is the 100 TB-stream discipline: state size is the
product of live keys only, and the timeout bounds it when the key
space drifts (e.g. content hashes of a crawl).

Semantics: for each key, emit the first row that arrives (arrival
order within the stream; deterministic for a deterministic replay),
drop every later one. The batch twin of "one row per distinct key" is
``pipeline.dedup.exact_dedup``.

Arrow moves each group's rows into pandas; per-group Python work is
O(first batch row) — the emitted row — so the operator is
Python-bound only on unique keys, never on duplicate volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ttl: str | None = None,
) -> DataFrame:
    """First-occurrence dedup over a (streaming) DataFrame.

    ``ttl`` (e.g. ``"1 hour"`` of processing time) expires a key's
    seen-flag — after expiry the key is treated as new again. ``None``
    keeps state forever (exact dedup; state grows with distinct keys).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout
    )

    def first_only(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        if state.exists or first is None:
            return
        state.update((True,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield first

    return df.groupBy(*key_cols).applyInPandasWithState(
        first_only,
        outputStructType=df.schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
