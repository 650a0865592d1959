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

from mini_sql_engine_spark.functions.text import bind_once, shingles, tokens
from mini_sql_engine_spark.pipeline.dedup import exact_dedup, minhash_lsh_candidates

# stratified_sample collects the strata domain to the driver (sampleBy
# wants a fraction dict); past this many distinct values the column is
# not a stratification key and the collect would flood the driver.
MAX_STRATA = 100_000


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
    max_strata: int | None = None,
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

    The strata domain IS collected to the driver (``sampleBy`` wants a
    per-stratum fraction dict), which is fine for language/domain
    strata but would silently OOM the driver if someone passed a
    near-unique column — so the domain is capped like every other
    driver-bounded surface in this repo: more than ``max_strata``
    distinct values (default: the module constant ``MAX_STRATA``)
    raises instead of collecting them.
    """
    cap = MAX_STRATA if max_strata is None else max_strata
    domain = [
        r[0]
        for r in docs.select(strata_col).distinct()
        .limit(cap + 1).collect()
    ]
    if len(domain) > cap:
        raise ValueError(
            f"stratified_sample: column {strata_col!r} has more than "
            f"{cap} distinct values — not a stratification "
            "column; pick a bounded-cardinality key (language, domain, "
            "source) or pre-bucket it"
        )
    full = {v: float(fractions.get(v, default_fraction)) for v in domain}
    return docs.sampleBy(strata_col, full, seed=seed)


def transitive_near_dup_survivors(
    docs: DataFrame, n: int = 3, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Near-dup removal via the TRANSITIVE closure: LSH candidate
    pairs → connected components → keep only each cluster's
    representative (min doc_id). Strictly stronger than the pairwise
    drop-higher rule (`near_dup_survivors`): in a chain A~B~C the
    pairwise rule can keep both A and C even though they are
    near-dups of the same B, while the cluster rule keeps exactly one
    document per duplicate cluster — the semantics training-corpus
    dedup actually wants."""
    from mini_sql_engine_spark.pipeline.graph import dedup_clusters

    pairs = minhash_lsh_candidates(docs, n, num_hashes, bands)
    losers = (
        dedup_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_rep"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti")


def benchmark_contamination(
    docs: DataFrame, bench: DataFrame, n: int = 3
) -> DataFrame:
    """Eval-set contamination scan: for every corpus document, the
    number of distinct word n-grams it shares with ANY benchmark
    document. Docs with overlap must be quarantined before training or
    the benchmark is compromised.

    Scale plan: the benchmark side is tiny relative to the corpus
    (10³–10⁵ eval items vs 10⁹ docs), so its distinct shingle set is
    BROADCAST — the corpus is scanned exactly once with a map-side
    hash probe, no shuffle of corpus data. Per-doc shingle dedup
    happens inside the row (``array_distinct`` before explode), so
    the only exchange is the final per-doc count aggregation, which
    has map-side combine.
    """
    corpus_sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens("text"), n))).alias("shingle"),
    )
    bench_sh = bench.select(
        F.explode(shingles(tokens("text"), n)).alias("shingle")
    ).distinct()
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def hash_mix(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    text_col: str = "text",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic weighted corpus mixing: keep each row with its
    stratum's target rate, decided by the row's own CONTENT hash
    rather than an RNG — ``keep iff md5(text)[0:8] < hex(rate·16⁸)``.

    Why content-hashed instead of ``sampleBy``: (a) the decision is a
    pure per-row expression — reproducible across engines, Spark
    versions, partitionings, and reruns (seeded ``sampleBy`` is only
    stable within one Spark version); (b) duplicate texts land on the
    same side of the cut, so mixing composes with dedup instead of
    re-introducing randomness between pipeline stages. This is the
    standard trick for train/holdout splits of web corpora.

    Map-side filter, no shuffle. An 8-hex-digit prefix gives rate
    granularity of 2⁻³², plenty for mixing ratios. Comparison is
    lexicographic on fixed-width lower-case hex = numeric compare;
    rate ≥ 1.0 maps to sentinel ``'g'`` which is greater than every
    hex digit, keeping all rows.
    """
    def thr(rate: float) -> str:
        return "g" if rate >= 1.0 else format(int(rate * 16**8), "08x")

    threshold = F.lit(thr(default_rate))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(thr(rate))
        ).otherwise(threshold)
    prefix = F.substring(F.md5(F.col(text_col).cast("binary")), 1, 8)
    return docs.filter(prefix < threshold)


def training_pipeline_stats(
    docs: DataFrame,
    bench: DataFrame,
    mix_rates: dict[str, float],
    min_tokens: int = 5,
    max_stop_ratio: float = 0.7,
    pack_tokens: int = 512,
) -> DataFrame:
    """The whole training-data pipeline, end-to-end, as ONE summary
    row — the composition this engine exists for, each stage shrinking
    the next one's input (cheapest-filter-first):

    quality gate → exact dedup → transitive near-dup (LSH + connected
    components) → benchmark decontamination → deterministic mixing →
    sequence packing.

    Output columns: per-stage surviving counts plus the packed-stream
    totals (token count and pack count at ``pack_tokens``). All stage
    counts come from aggregate-only plans — no stage materializes rows
    to the driver. Each stage IS materialized once on the executors
    (``materialized()`` barrier): the summary fans out into one count
    branch per stage, and without barriers each branch re-runs its
    whole stage prefix — prefix work that grows quadratically with
    stage count at scale (locally ~12% because the CC stage's own
    iterative rounds dominate). At 100 TB use durable path-based
    checkpoints between stages instead — same structure, spill-proof.

    r14 A/B (VERDICT item 4, "overlap the serialized stages"):
    the stage chain is DATA-dependent-linear (each stage consumes the
    previous stage's rows), so driver-thread overlap has nothing
    independent to run; the only serialized cost is the eager
    barrier jobs themselves. Dropping the barriers on the two
    map-only stages was measured and REJECTED: no `gated` barrier →
    7.33 s (quality_gate is tokenize-CPU, not scan speed, and
    exact_dedup references its input twice); no `mixed` barrier →
    6.03 s (the md5 mix filter re-runs per consumer and one consumer
    re-tokenizes for token totals); all five barriers → 4.37 s
    (isolated min-of-3 at sf0.1, same session). The five-barrier
    form stands.
    """
    from mini_sql_engine_spark.functions.text import token_count
    from mini_sql_engine_spark.plans import materialized

    gated = materialized(quality_gate(docs, min_tokens=min_tokens,
                                      max_stop_ratio=max_stop_ratio))
    exact = materialized(exact_dedup(gated))
    neardup = materialized(transitive_near_dup_survivors(exact))
    hits = benchmark_contamination(neardup, bench).select("doc_id")
    decont = materialized(neardup.join(hits, "doc_id", "left_anti"))
    mixed = materialized(hash_mix(decont, mix_rates))

    def n(df: DataFrame, alias: str) -> DataFrame:
        return df.select(F.count(F.lit(1)).alias(alias))

    tokens_total = mixed.select(
        F.coalesce(F.sum(token_count("text").cast("long")), F.lit(0))
        .alias("n_tokens")
    )
    return (
        n(docs, "n_input")
        .crossJoin(n(gated, "n_quality"))
        .crossJoin(n(exact, "n_exact_dedup"))
        .crossJoin(n(neardup, "n_near_dedup"))
        .crossJoin(n(decont, "n_decontaminated"))
        .crossJoin(n(mixed, "n_mixed"))
        .crossJoin(tokens_total)
        .withColumn(
            "n_packs",
            F.expr(f"(n_tokens + {pack_tokens} - 1) div {pack_tokens}"),
        )
    )
