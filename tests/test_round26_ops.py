"""Semantic tests for the §2.36 round-7 (cycle 7) operators:
confusion-matrix identities, Heaps-curve monotonicity and
conservation, XYZ mass checks, a numpy replay of the Pareto knee,
and Wilson-interval coverage properties."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_lang_confusion_row_shares(spark):
    out = Q.lang_confusion(spark, SF_SMOKE).collect()
    d = Catalog(spark, SF_SMOKE).table("documents")
    assert sum(r["n_docs"] for r in out) == d.count()
    rows: dict[str, float] = {}
    for r in out:
        rows[r["lang"]] = rows.get(r["lang"], 0.0) + r["row_share"]
    for lang, share in rows.items():
        assert math.isclose(share, 1.0, rel_tol=1e-9), lang
    # predictions must agree with lang_id itself
    pred = Q.lang_id(spark, SF_SMOKE)
    n_match = pred.filter(F.col("lang") == F.col("lang_pred")).count()
    assert sum(r["n_docs"] for r in out
               if r["lang"] == r["lang_pred"]) == n_match


def test_heaps_curve_monotone_and_conserved(spark):
    out = sorted(Q.heaps_curve(spark, SF_SMOKE).collect(),
                 key=lambda r: r["decile"])
    assert [r["decile"] for r in out] == list(range(1, 11))
    d = Catalog(spark, SF_SMOKE).table("documents")
    toks = F.split("text", " ")
    total_toks = d.select(F.sum(F.size(toks))).collect()[0][0]
    total_vocab = (d.select(F.explode(toks).alias("t"))
                   .select("t").distinct().count())
    assert out[-1]["tokens_cum"] == total_toks
    assert out[-1]["vocab_cum"] == total_vocab
    for a, b in zip(out, out[1:]):
        assert a["tokens_cum"] < b["tokens_cum"]
        assert a["vocab_cum"] <= b["vocab_cum"]
    # Heaps: vocabulary grows sub-linearly in tokens
    for r in out:
        assert 0 < r["heaps_ratio"] < 1


def test_xyz_class_mass(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    out = Q.xyz_class(spark, SF_SMOKE).collect()
    assert sum(r["n_parts"] for r in out) == n_parts
    for r in out:
        assert r["xyz_class"] in ("X", "Y", "Z")
        if r["xyz_class"] == "X":
            assert r["avg_cv"] < 0.5
        assert r["avg_cv"] >= 0


def test_pareto_knee_numpy_replay(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    pdf = (li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * 100, 0).cast("long").alias("c"))
        .groupBy("l_partkey").agg(F.sum("c").alias("r"))
        .toPandas())
    pdf = pdf.sort_values(["r", "l_partkey"],
                          ascending=[False, True])
    cum = pdf["r"].cumsum().to_numpy()
    n, tot = len(pdf), pdf["r"].sum()
    gap = cum / tot - np.arange(1, n + 1) / n
    k = int(np.argmax(gap))  # first max = lowest rank tiebreak
    row = Q.pareto_knee(spark, SF_SMOKE).collect()[0]
    assert row["n_parts"] == n
    assert row["knee_rank"] == k + 1
    assert math.isclose(row["knee_cum_share"], cum[k] / tot)
    assert math.isclose(row["knee_gap"], gap[k])
    # the knee beats the 80% heuristic's gap by construction
    assert row["knee_gap"] >= gap[min(int(0.2 * n), n - 1)] - 1e-12


def test_wilson_daily_error_interval_properties(spark):
    out = Q.wilson_daily_error(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert 0 <= r["ci_lo"] <= r["err_rate"] <= r["ci_hi"] <= 1
        # Wilson never collapses to a point for n > 0
        assert r["ci_hi"] - r["ci_lo"] > 0
        # replay the closed form
        n, e = r["n_events"], r["n_errors"]
        z = 1.959964
        p = e / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n
                             + z * z / (4 * n * n)) / denom
        assert math.isclose(r["ci_lo"], center - half, abs_tol=1e-12)
        assert math.isclose(r["ci_hi"], center + half, abs_tol=1e-12)
