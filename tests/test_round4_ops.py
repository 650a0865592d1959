"""Round-4 surface: connected components, MERGE/SCD, corpus hygiene
(contamination / deterministic mixing), rank-filter top-k, distributed
ntile. Hash parity vs DuckDB runs in test_oracle_parity; these tests
pin the operator semantics on hand-built inputs and the plan shapes
that make them viable at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.operators.merge import merge_upsert, scd2_history
from mini_sql_engine_spark.pipeline.clean import benchmark_contamination, hash_mix
from mini_sql_engine_spark.pipeline.graph import connected_components

from tests.conftest import SF_SMOKE
from tests.test_plans import formatted, plan


# ───────────────────── connected components ─────────────────────


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_cc_chain_cycle_and_island(spark):
    """Transitivity: a chain collapses to its min node even though the
    endpoints never share an edge; cycles converge; disjoint islands
    keep separate labels."""
    got = _cc(spark, [(1, 2), (2, 3), (3, 4),      # chain
                      (10, 11),                     # island
                      (21, 20), (22, 21), (20, 22)  # cycle
                      ])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_cc_self_loops_and_duplicate_edges_ignored(spark):
    got = _cc(spark, [(5, 5), (6, 7), (7, 6), (6, 7)])
    assert got == {6: 6, 7: 6}


def test_cc_long_chain_converges_in_logarithmic_rounds(spark):
    """Pointer shortcutting: a 40-node path has diameter 39, so plain
    min-propagation needs ~39 rounds — the shortcut step must close it
    within a log-scale budget (~log2(39)+2)."""
    chain = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    rows = connected_components(df, max_rounds=9).collect()
    assert {r["component"] for r in rows} == {0}
    assert len(rows) == 40


def test_cc_raises_instead_of_partial_labels(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="no convergence"):
        # diameter 2 needs one propagating round + one confirming
        # round; max_rounds=1 must refuse, not mislabel
        connected_components(df, max_rounds=1)


# ─────────────────────────── MERGE / SCD ───────────────────────────


def test_merge_upsert_three_branches(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "name", "bal"])
    upd = spark.createDataFrame([(2, 99.0), (3, 7.0)], ["k", "bal"])
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_upsert(
            base, upd, keys=["k"],
            insert_defaults={"name": F.lit("new")},
        ).collect()
    }
    assert got == {1: ("a", 10.0),   # carried forward
                   2: ("b", 99.0),   # updated
                   3: ("new", 7.0)}  # inserted with default


def test_merge_upsert_rejects_unknown_update_column(spark):
    base = spark.createDataFrame([(1, 10.0)], ["k", "bal"])
    upd = spark.createDataFrame([(1, 5.0)], ["k", "nosuch"])
    with pytest.raises(ValueError, match="nosuch"):
        merge_upsert(base, upd, keys=["k"])


def test_scd2_intervals_tile_the_timeline(spark):
    rows = [(1, "2020-01-01 00:00:00", 100, 10.0),
            (1, "2020-03-01 00:00:00", 101, 11.0),
            (2, "2021-01-01 00:00:00", 200, 20.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "oid", "val"]).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    hist = scd2_history(df, key="k", change_ts="ts", attrs=["oid", "val"],
                        tiebreak="oid").collect()
    by_oid = {r["oid"]: r for r in hist}
    # consecutive versions chain: v1.valid_to == v2.valid_from
    assert by_oid[100]["valid_to"] == by_oid[101]["valid_from"]
    assert not by_oid[100]["is_current"]
    assert by_oid[101]["is_current"] and by_oid[200]["is_current"]
    assert str(by_oid[101]["valid_to"]).startswith("9999-12-31")


# ───────────────────────── corpus hygiene ─────────────────────────


def test_contamination_finds_exact_shared_ngrams(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),       # shares 2 shingles
         (2, "zeta eta theta iota")],         # disjoint
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_shared_shingles"]
           for r in benchmark_contamination(docs, bench, n=3).collect()}
    assert got == {1: 2}  # 'alpha beta gamma', 'beta gamma delta'; doc 2 clean


def test_hash_mix_is_deterministic_and_nested(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} text", "en") for i in range(200)],
        ["doc_id", "text", "lang"])
    low = {r["doc_id"] for r in hash_mix(docs, {"en": 0.2}).collect()}
    low2 = {r["doc_id"] for r in hash_mix(docs, {"en": 0.2}).collect()}
    high = {r["doc_id"] for r in hash_mix(docs, {"en": 0.6}).collect()}
    assert low == low2                      # content-hash ⇒ rerun-stable
    assert low < high                       # thresholds nest: raising the
    assert 10 <= len(low) < len(high) < 200  # rate only ADDS documents
    # rate ≥ 1.0 keeps everything (sentinel threshold)
    assert len(hash_mix(docs, {"en": 1.0}).collect()) == 200


def test_hash_mix_rate_hits_target_fraction(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} with some words", "en") for i in range(1000)],
        ["doc_id", "text", "lang"])
    n = hash_mix(docs, {"en": 0.5}).count()
    assert 400 <= n <= 600  # binomial(1000, .5) well within ±100


# ─────────────────────────── plan gates ───────────────────────────


def test_topk_per_group_plans_window_group_limit(spark):
    """The rank filter must push a per-group limit below the window
    exchange (WindowGroupLimit) — each map task forwards ≤ k rows per
    group instead of the whole table through the shuffle."""
    p = plan(Q.topk_per_group(spark, SF_SMOKE))
    assert "WindowGroupLimit" in p, p


def test_ntile_bucket_avoids_global_single_partition_window(spark):
    """Exact ntile without ntile()'s all-rows-in-one-task window: the
    row_number windows must stay keyed by the range-partition id (the
    same distributed-rank shape order_by is gated on)."""
    p = formatted(Q.ntile_bucket(spark, SF_SMOKE))
    assert "ntile" not in p.lower(), p
    rn_specs = [ln for ln in p.splitlines()
                if "row_number()" in ln and "windowspecdefinition" in ln]
    assert rn_specs, p
    for ln in rn_specs:
        assert "_pid" in ln, f"row_number window not partition-keyed: {ln}"


def test_merge_strategies_agree_and_broadcast_path_spares_the_snapshot(spark):
    """Both MERGE strategies must produce identical rows, and the
    small-changelog plan must probe the snapshot map-side: the update/
    carry branch is a BroadcastHashJoin (a full-outer join can never
    broadcast — Spark ignores the hint — which is why the strategy
    split exists)."""
    base = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)], ["k", "name", "bal"])
    upd = spark.createDataFrame(
        [(5, 55.0), (200, 1.0)], ["k", "bal"])
    kw = dict(keys=["k"], insert_defaults={"name": F.lit("new")})
    wide = merge_upsert(base, upd, broadcast_updates=False, **kw)
    small = merge_upsert(base, upd, broadcast_updates=True, **kw)
    assert sorted(map(tuple, wide.collect())) == sorted(map(tuple, small.collect()))
    p = plan(small)
    assert "BroadcastHashJoin" in p, p
    p_wide = plan(wide)
    assert "BroadcastHashJoin" not in p_wide  # hint would be ignored anyway


def test_contamination_broadcasts_the_benchmark_side(spark):
    """The corpus must be probed map-side: the benchmark shingle set
    enters the plan as a broadcast, and the only exchange after it is
    the per-doc count aggregation."""
    p = plan(Q.contamination(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


# ───────────────── end-to-end pipeline composition ─────────────────


def test_transitive_dedup_collapses_chains_pairwise_rule_misses(spark):
    """A~B~C chain: the pairwise drop-higher rule keeps {A}, but so
    must the cluster rule — and on a chain where pairwise keeps TWO
    docs the cluster rule still keeps exactly one per component."""
    from mini_sql_engine_spark.pipeline.clean import (
        transitive_near_dup_survivors,
    )

    # three near-identical docs forming an LSH chain + one distinct
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " mu"), (3, base + " mu nu"),
         (9, "completely different words with no shared shingles here")],
        ["doc_id", "text"])
    kept = {r["doc_id"]
            for r in transitive_near_dup_survivors(docs).collect()}
    assert 9 in kept                       # singleton untouched
    assert kept & {1, 2, 3} == {1}         # one rep per cluster (min id)


def test_training_pipeline_stage_counts_monotone(spark):
    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.pipeline.clean import training_pipeline_stats

    docs = Catalog(spark, SF_SMOKE).table("documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    row = training_pipeline_stats(corpus, bench, {"en": 0.5}).collect()[0]
    seq = [row["n_input"], row["n_quality"], row["n_exact_dedup"],
           row["n_near_dedup"], row["n_decontaminated"], row["n_mixed"]]
    assert seq == sorted(seq, reverse=True)      # each stage only removes
    assert row["n_mixed"] > 0                    # and does not nuke the corpus
    assert row["n_packs"] == (row["n_tokens"] + 511) // 512
    # deterministic end to end (content-hash mixing, seeded LSH)
    row2 = training_pipeline_stats(corpus, bench, {"en": 0.5}).collect()[0]
    assert tuple(row) == tuple(row2)
