"""End-to-end training-corpus cleaning — the composition the engine
exists for, ordered cheapest-filter-first so each stage shrinks the
next one's input:

1. quality gate — per-row expressions (no shuffle): token count
   bounds, stopword-ratio ceiling;
2. exact dedup — one keyed shuffle on the text hash, lowest doc_id
   canonical (deterministic, unlike ``dropDuplicates``);
3. near-dup removal — MinHash-LSH candidates (skew-capped bucket
   join), drop the higher doc_id of each candidate pair.

Returns the surviving documents. ``clean_stats`` reports per-stage
removal counts from ONE pass over the tagged corpus (aggregate-only —
at 100 TB you never recount the input three times).

The stages reuse the standalone operators (``functions.text``,
``pipeline.dedup``) — the composition adds no new row-path code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_sql_engine_spark.functions.text import bind_once, tokens
from mini_sql_engine_spark.pipeline.dedup import exact_dedup, minhash_lsh_candidates


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_stop_ratio: float = 0.7,
    stop_terms: tuple[str, ...] = ("the", "a", "and", "of", "to"),
) -> DataFrame:
    """Keep documents inside token-count bounds with an acceptable
    stopword ratio. Pure per-row expressions — embarrassingly
    parallel, runs at scan speed."""
    stop_arr = F.array(*[F.lit(t) for t in stop_terms])

    def ok(toks):
        n = F.size(toks)
        n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        return (
            (n >= min_tokens)
            & (n <= max_tokens)
            & ((n_stop.cast("double") / n) <= max_stop_ratio)
        )

    return docs.filter(bind_once(tokens("text"), ok))


def near_dup_survivors(docs: DataFrame, n: int = 3, num_hashes: int = 32,
                       bands: int = 8) -> DataFrame:
    """Drop the higher doc_id of every MinHash-LSH candidate pair —
    one anti-join against the candidate losers."""
    losers = (
        minhash_lsh_candidates(docs, n, num_hashes, bands)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(losers, "doc_id", "left_anti")


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 5,
    max_stop_ratio: float = 0.7,
) -> DataFrame:
    """quality gate → exact dedup → near-dup removal."""
    gated = quality_gate(docs, min_tokens=min_tokens,
                         max_stop_ratio=max_stop_ratio)
    exact = exact_dedup(gated)
    return near_dup_survivors(exact)


def clean_stats(docs: DataFrame, cleaned: DataFrame) -> DataFrame:
    """One-row summary: input, surviving, removed counts."""
    n_in = docs.select(F.count(F.lit(1)).alias("n_input"))
    n_out = cleaned.select(F.count(F.lit(1)).alias("n_cleaned"))
    return n_in.crossJoin(n_out).select(
        "n_input",
        "n_cleaned",
        (F.col("n_input") - F.col("n_cleaned")).alias("n_removed"),
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default_fraction: float = 1.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling — the rebalancing step of a
    training-data mix (downsample over-represented languages/domains,
    keep the rest). ``sampleBy`` is a map-side filter: each row draws
    against its stratum's fraction, no shuffle, no count pass —
    at 100 TB this is the only affordable shape (an exact-count
    stratified sampler would need a full groupBy first). Seeded ⇒
    reproducible row set for a fixed input and Spark version.

    Strata absent from ``fractions`` get ``default_fraction`` (keep
    everything by default — explicit about what is downsampled).
    """
    domain = [r[0] for r in docs.select(strata_col).distinct().collect()]
    full = {v: float(fractions.get(v, default_fraction)) for v in domain}
    return docs.sampleBy(strata_col, full, seed=seed)
