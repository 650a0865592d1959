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
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


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


def take_per_key_gs(
    df: DataFrame,
    key_cols: list[str],
    limit: int,
) -> DataFrame:
    """Per-key quota on the ``applyInPandasWithState`` API (GroupState
    — Spark 3.x-compatible, no protobuf dependency): same semantics as
    :func:`take_per_key` — at most ``limit`` rows per key over the
    stream's lifetime, counter state carried across micro-batches.

    This is the execution fallback where the 4.x
    ``transformWithStateInPandas`` worker protocol's protobuf runtime
    dependency is unavailable (as in this container) — and the e2e
    coverage for the quota semantics runs through it. The 4.x variant
    stays the primary: named state + TTL + timers are what a drifting
    key space needs at 100 TB.
    """

    def quota(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # NoTimeout → unreachable; keeps shape
            state.remove()
            return
        taken = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if taken >= limit:
                break
            out = pdf.iloc[: limit - taken]
            taken += len(out)
            if len(out):
                yield out
        state.update((taken,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        quota,
        outputStructType=df.schema,
        stateStructType="n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _TakePerKey(StatefulProcessor):
    """Emit at most ``limit`` rows per key over the stream's lifetime.
    State: one bigint counter per key."""

    def __init__(self, limit: int):
        self.limit = limit

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.count = handle.getValueState("taken", "n bigint")

    def handleInputRows(self, key, rows, timer_values):
        taken = self.count.get()[0] if self.count.exists() else 0
        for pdf in rows:
            if taken >= self.limit:
                break
            out = pdf.iloc[: self.limit - taken]
            taken += len(out)
            if len(out):
                yield out
        self.count.update((taken,))

    def close(self) -> None:
        pass


def take_per_key(df: DataFrame, key_cols: list[str], limit: int) -> DataFrame:
    """Per-key quota over an unbounded stream via the 4.x
    ``transformWithStateInPandas`` API (the successor to
    ``applyInPandasWithState``: explicit named state variables, TTL
    per state, timers). The training-data use case: cap documents
    per domain / user so one hot source can't dominate a crawl batch.

    Requires the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — which is what a 100 TB
    deployment should run anyway: state lives off-heap and spills to
    disk, so quota state over hundreds of millions of keys doesn't
    pressure executor heaps. Counter-only state means bytes-per-key is
    ~key + 8 bytes regardless of row width.

    Runtime dependency: executing (not planning) this operator needs
    the ``protobuf`` python package — Spark 4.x implements the
    transformWithState driver↔worker state protocol over protobuf
    messages. Plan construction and schema derivation work without it;
    the e2e test skips where it's absent.
    """
    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_TakePerKey(limit),
        outputStructType=df.schema,
        outputMode="append",
        timeMode="none",
    )
