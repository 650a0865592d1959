"""Semantic edge tests for the §2.17 round-7 operators — invariants
the hash-parity check can't see (leakage, balance, outer-row
preservation, numpy cross-checks)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_group_split_no_source_straddles_splits(spark):
    """The point of a GROUP-aware split: every source lands in
    exactly one of train/val/test."""
    per_source = (
        Q.group_split(spark, SF_SMOKE)
        .groupBy()  # placeholder; real check below on raw assignment
    )
    d = Catalog(spark, SF_SMOKE).table("documents")
    h = F.substring(F.md5(F.col("source").cast("binary")), 1, 8)
    split = (
        F.when(h < F.lit("cc000000"), F.lit("train"))
        .when(h < F.lit("e6000000"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    n_multi = (
        d.select("source", split.alias("split"))
        .groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_multi == 0
    # and all three splits are non-empty at this SF
    splits = {r["split"] for r in
              Q.group_split(spark, SF_SMOKE).select("split").collect()}
    assert splits == {"train", "val", "test"}


def test_label_balance_produces_equal_class_sizes(spark):
    rows = Q.label_balance(spark, SF_SMOKE).collect()
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    sizes = set(by_lang.values())
    assert len(sizes) == 1, f"unbalanced classes: {by_lang}"
    # the balanced size is the true minority-class count
    d = Catalog(spark, SF_SMOKE).table("documents")
    true_min = (
        d.groupBy("lang").count().agg(F.min("count")).collect()[0][0]
    )
    assert sizes == {true_min}
    # deterministic: second run picks the identical doc_ids
    again = {(r["doc_id"], r["lang"])
             for r in Q.label_balance(spark, SF_SMOKE).collect()}
    assert again == {(r["doc_id"], r["lang"]) for r in rows}


def test_explode_outer_preserves_empty_array_rows(spark):
    out = Q.explode_outer_toks(spark, SF_SMOKE)
    n_parts = Catalog(spark, SF_SMOKE).table("part").count()
    distinct_parts = out.select("p_partkey").distinct().count()
    assert distinct_parts == n_parts, "outer explode lost rows"
    assert out.filter(F.col("token").isNull()).count() > 0, (
        "fixture should contain parts with no >6-char token; "
        "otherwise the outer semantics go untested")


def test_moments_agg_matches_numpy_population_moments(spark):
    import numpy as np

    li = Catalog(spark, SF_SMOKE).table("lineitem")
    got = {r["l_returnflag"]: r
           for r in Q.moments_agg(spark, SF_SMOKE).collect()}
    pdf = li.select("l_returnflag", "l_quantity").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=float)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3.0
        assert math.isclose(got[flag]["skewness"], skew, abs_tol=1e-4), flag
        assert math.isclose(got[flag]["kurtosis"], kurt, abs_tol=1e-4), flag
        assert got[flag]["n"] == len(x)


def test_winsorize_bounds_and_tail_fractions(spark):
    li_n = {r["l_returnflag"]: r for r in
            Catalog(spark, SF_SMOKE).table("lineitem")
            .groupBy("l_returnflag").count().collect()}
    for r in Q.winsorize(spark, SF_SMOKE).collect():
        n = li_n[r["l_returnflag"]]["count"]
        assert r["lo"] < r["hi"]
        # each clamped tail is ≈1% (exact interpolated percentile ⇒
        # strictly-outside counts are ≤ the tail mass)
        assert r["n_lo"] <= math.ceil(0.011 * n) + 1
        assert r["n_hi"] <= math.ceil(0.011 * n) + 1
        assert r["winsorized_sum"] > 0


def test_kl_divergence_nonnegative_and_gibbs_inequality(spark):
    rows = Q.kl_divergence(spark, SF_SMOKE).collect()
    assert rows, "no sources"
    for r in rows:
        assert r["kl"] >= 0.0, f"KL must be ≥ 0 (Gibbs): {r}"
        assert r["n_tokens"] > 0


def test_lm_score_logprobs_are_nonpositive(spark):
    rows = Q.lm_score(spark, SF_SMOKE).collect()
    assert rows
    # c(w1,w2) ≤ c(w1·) always ⇒ every bigram logprob ≤ 0
    assert all(r["avg_logprob"] <= 0.0 for r in rows)
    assert all(r["n_bigrams"] > 0 for r in rows)


def test_anomaly_mad_median_is_robust_center(spark):
    rows = {r["l_returnflag"]: r
            for r in Q.anomaly_mad(spark, SF_SMOKE).collect()}
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    import numpy as np

    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_extendedprice"].to_numpy(dtype=float)
        assert math.isclose(rows[flag]["med"], float(np.median(x)),
                            rel_tol=1e-12), flag
        assert math.isclose(
            rows[flag]["mad"],
            float(np.median(np.abs(x - np.median(x)))), rel_tol=1e-12), flag
        assert rows[flag]["n"] == len(x)


def test_boilerplate_strip_drops_only_common_segments(spark):
    out = Q.boilerplate_strip(spark, SF_SMOKE)
    rows = out.collect()
    n_docs = Catalog(spark, SF_SMOKE).table("documents").count()
    assert len(rows) == n_docs, "every document must survive (maybe empty)"
    # at least something was dropped and something kept corpus-wide
    total_kept = sum(r["n_kept"] for r in rows)
    total_dropped = sum(r["n_dropped"] for r in rows)
    assert total_kept > 0
    assert total_dropped > 0, (
        "threshold selects nothing — boilerplate removal untested")
    # reassembly preserves order: clean_text tokens are a subsequence
    # of the original text's segment stream for a sample doc
    d = Catalog(spark, SF_SMOKE).table("documents").limit(5).collect()
    cleaned = {r["doc_id"]: r["clean_text"] for r in rows}
    for doc in d:
        toks = doc["text"].split(" ")
        segs = [" ".join(toks[i:i + 2]) for i in range(0, len(toks), 2)]
        kept_segs = [s for s in cleaned[doc["doc_id"]].split(" ")] \
            if cleaned[doc["doc_id"]] else []
        # verify each kept 2-token window appears in original order
        joined = cleaned[doc["doc_id"]]
        pos = 0
        ok = True
        for s in ([] if not joined else [seg for seg in segs
                                         if seg in joined]):
            idx = joined.find(s, pos)
            if idx < 0:
                ok = False
                break
            pos = idx
        assert ok, f"segment order broken for doc {doc['doc_id']}"
        assert kept_segs is not None  # silence lint on unused var


def test_rolling_median_first_row_equals_own_value(spark):
    out = Q.rolling_median(spark, SF_SMOKE)
    o = Catalog(spark, SF_SMOKE).table("orders")
    w_first = (
        o.groupBy("o_custkey")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("s"))
        .select("o_custkey", F.col("s.o_orderkey").alias("o_orderkey"))
    )
    j = (
        out.join(w_first, ["o_custkey", "o_orderkey"])
        .join(o.select("o_orderkey",
                       F.col("o_totalprice").cast("double").alias("tp")),
              "o_orderkey")
    )
    bad = j.filter(
        (F.col("frame_n") != 1) | (F.abs(F.col("rolling_med")
                                         - F.col("tp")) > 1e-9)).count()
    assert bad == 0
    assert out.filter(F.col("frame_n") > 5).count() == 0


def test_winsorize_approx_certificate_holds(spark):
    """The sketch path's accuracy contract: every group's approx
    limits and approx-clipped sum are within tolerance of the exact
    ones (ok_* all 1), so swapping winsorize → winsorize_approx at
    scale is a verified substitution, not a hope."""
    rows = Q.winsorize_approx(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["ok_lo"] == 1 and r["ok_hi"] == 1 and r["ok_sum"] == 1
               for r in rows)
    assert all(r["n_rows"] > 0 for r in rows)
