"""Sequence packing and document chunking — the two layout operators
an LLM training-data pipeline runs after cleaning/dedup to turn a
document corpus into fixed-length training sequences.

- ``pack_sequences``: concat-then-split packing. Documents are laid
  end-to-end in a deterministic total order and the concatenated token
  stream is cut into ``max_tokens`` windows; each document learns
  which pack it starts in and at what offset (a document may straddle
  packs — the standard GPT-style pretraining layout, zero padding
  waste). The global running token total uses the same
  range-partition + per-partition-cumsum + O(P) offset machinery as
  ``operators.sorting.with_rank`` — no single-task window over the
  data at any scale.
- ``chunk_documents``: overlapping fixed-size token windows per
  document (RAG/embedding-style chunking): starts at 0, stride,
  2·stride…; the last window is clipped to the document end. Pure
  per-row arithmetic + ``sequence``/``explode`` — embarrassingly
  parallel, no shuffle at all.

Both are whole-column integer arithmetic on token counts (whitespace
tokenizer shared with ``functions.text``) — JVM expressions only, and
exactly reproducible in ANSI SQL, so both are hash-checked against
DuckDB rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_sql_engine_spark.functions.text import token_count
from mini_sql_engine_spark.operators.sorting import with_running_total


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its position in the packed token stream.

    Output: (doc_id, n_tokens, pack_id, pack_offset) where
    ``pack_id = cum_before div max_tokens`` and
    ``pack_offset = cum_before mod max_tokens`` for ``cum_before`` =
    total tokens of all earlier documents (ordered by ``id_col``).
    Integer div/mod — never float division, which loses exactness
    past 2^53 cumulative tokens (a 100 TB corpus is ~10^13 tokens,
    within 2^53, but the discipline costs nothing).
    """
    t = docs.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    cum = with_running_total(t, "n_tokens", F.col(id_col), alias="_cum")
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.expr(f"(_cum - n_tokens) div {max_tokens}").alias("pack_id"),
        F.expr(f"(_cum - n_tokens) % {max_tokens}").alias("pack_offset"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 100,
    stride: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows per document.

    Starts are 0, stride, 2·stride, …; a document emits
    ``1 + ceil((n - chunk)/stride)`` chunks (one if it fits whole);
    the final chunk's end clips to the document length. Ceil is done
    in integer arithmetic (``(n - chunk + stride - 1) div stride``)
    so Spark and the SQL oracle agree exactly.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    n = F.col("n_tokens")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1).cast("long")).otherwise(
        F.expr(f"(n_tokens - {chunk_tokens} + {stride} - 1) div {stride}")
        + F.lit(1)
    )
    start = F.col("chunk_id") * stride
    return (
        docs.select(
            F.col(id_col),
            token_count(text_col).cast("long").alias("n_tokens"),
        )
        .withColumn("chunk_id",
                    F.explode(F.sequence(F.lit(0).cast("long"),
                                         n_chunks - 1)))
        .select(
            F.col(id_col),
            "n_tokens",
            "chunk_id",
            start.cast("long").alias("chunk_start"),
            F.least(start + chunk_tokens, n).cast("long").alias("chunk_end"),
        )
    )
