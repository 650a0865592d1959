"""Semantic tests for the §2.31 round-7 (cycle 2) operators: numpy/
pandas replays of the statistics (Spearman, Cramér's V, HHI, CUPED),
set-replay of the event-type Jaccard matrix, mass-conservation
identities for the histograms/lift table, and batch≡stream equality
for the readStream twin."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_token_len_buckets_mass_and_bounds(spark):
    """Buckets partition the corpus (Σ n_docs = |docs|) and every
    bucket's token mass sits inside [lo·n_docs, 2·lo·n_docs)."""
    docs = Catalog(spark, SF_SMOKE).table("documents")
    out = Q.token_len_buckets(spark, SF_SMOKE).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        lo = r["bucket_lo"]
        assert lo >= 1 and (lo & (lo - 1)) == 0  # power of two
        assert lo * r["n_docs"] <= r["sum_tokens"] < 2 * lo * r["n_docs"]


def test_smoothed_rates_shrinks_toward_prior(spark):
    """Add-k smoothing must land strictly between the raw rate and
    the global prior (or equal when they coincide), and global
    totals must reconcile."""
    out = Q.smoothed_rates(spark, SF_SMOKE).collect()
    gn = sum(r["n_events"] for r in out)
    gh = sum(r["n_high"] for r in out)
    prior = gh / gn
    for r in out:
        lo, hi = sorted((r["raw_rate"], prior))
        assert lo - 1e-12 <= r["smoothed_rate"] <= hi + 1e-12
        assert math.isclose(
            r["smoothed_rate"],
            (r["n_high"] + 5 * prior) / (r["n_events"] + 5))


def test_order_interarrival_mass(spark):
    """One gap per consecutive order pair: Σ n_gaps = Σ_cust
    (orders_cust − 1)."""
    o = Catalog(spark, SF_SMOKE).table("orders")
    per = o.groupBy("o_custkey").count().collect()
    expected = sum(r["count"] - 1 for r in per)
    out = Q.order_interarrival(spark, SF_SMOKE).collect()
    assert sum(r["n_gaps"] for r in out) == expected
    assert all(r["avg_gap_days"] >= 0 for r in out)


def test_crosstab_counts_pandas_replay(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = o.select("o_orderpriority", "o_orderstatus").toPandas()
    ct = pd.crosstab(pdf["o_orderpriority"], pdf["o_orderstatus"])
    out = {r["priority"]: r
           for r in Q.crosstab_counts(spark, SF_SMOKE).collect()}
    for pri, row in ct.iterrows():
        got = out[pri]
        assert got["n_f"] == row.get("F", 0)
        assert got["n_o"] == row.get("O", 0)
        assert got["n_p"] == row.get("P", 0)
        assert got["n_total"] == row.sum()


def test_herfindahl_numpy_replay_and_bounds(spark):
    """Replay HHI from raw cents; 1/k ≤ HHI ≤ 1 and the effective-N
    column is its reciprocal."""
    o = Catalog(spark, SF_SMOKE).table("orders")
    c = Catalog(spark, SF_SMOKE).table("customer")
    pdf = (o.join(c, o["o_custkey"] == c["c_custkey"])
           .select("c_mktsegment", "c_custkey",
                   F.round(F.col("o_totalprice") * 100, 0).cast("long")
                   .alias("cents")).toPandas())
    per = pdf.groupby(["c_mktsegment", "c_custkey"])["cents"].sum()
    for r in Q.herfindahl(spark, SF_SMOKE).collect():
        rr = per[r["c_mktsegment"]].to_numpy(dtype=float)
        hhi = float((rr ** 2).sum() / rr.sum() ** 2)
        assert math.isclose(r["hhi"], hhi, rel_tol=1e-12)
        assert 1.0 / len(rr) - 1e-12 <= r["hhi"] <= 1.0
        assert math.isclose(r["effective_customers"], 1.0 / hhi,
                            rel_tol=1e-12)
        assert r["n_customers"] == len(rr)


def test_jaccard_event_types_set_replay(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    rows = ev.select(
        "event_type", "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("d")).collect()
    sets: dict = {}
    for r in rows:
        sets.setdefault(r["event_type"], set()).add((r["user_id"], r["d"]))
    out = Q.jaccard_event_types(spark, SF_SMOKE).collect()
    types = sorted(sets)
    assert len(out) == len(types) * (len(types) - 1) // 2
    for r in out:
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert r["n_common"] == len(a & b)
        assert math.isclose(r["jaccard"], len(a & b) / len(a | b))


def test_skew_profile_replay_one_column(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    freqs = np.array(sorted(
        r["count"] for r in li.groupBy("l_partkey").count().collect()),
        dtype=float)
    got = {r["key_col"]: r for r in Q.skew_profile(spark, SF_SMOKE).collect()}
    r = got["lineitem.l_partkey"]
    assert r["n_rows"] == int(freqs.sum())
    assert r["n_keys"] == len(freqs)
    assert r["max_freq"] == int(freqs.max())
    assert math.isclose(
        r["skew_ratio"], freqs.max() * len(freqs) / freqs.sum())
    assert r["p99_freq"] <= r["max_freq"]
    assert len(got) == 4


def test_cuped_adjust_theta_replay_and_mean_preservation(spark):
    """θ must equal the numpy OLS slope of y on x, and CUPED must
    preserve the overall weighted mean (the adjustment is mean-zero
    across groups by construction)."""
    o = Catalog(spark, SF_SMOKE).table("orders")
    c = Catalog(spark, SF_SMOKE).table("customer")
    pdf = (o.join(c, o["o_custkey"] == c["c_custkey"])
           .select(F.round(F.col("o_totalprice") * 100, 0).cast("long")
                   .alias("y"),
                   F.round(F.col("c_acctbal") * 100, 0).cast("long")
                   .alias("x")).toPandas())
    x, y = pdf["x"].to_numpy(float), pdf["y"].to_numpy(float)
    theta = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
    out = Q.cuped_adjust(spark, SF_SMOKE).collect()
    assert len(out) == 2
    for r in out:
        assert math.isclose(r["theta"], theta, rel_tol=1e-9)
    n = sum(r["n_orders"] for r in out)
    raw_mean = sum(r["n_orders"] * r["mean_value"] for r in out) / n
    cuped_mean = sum(r["n_orders"] * r["cuped_mean"] for r in out) / n
    assert math.isclose(raw_mean, cuped_mean, rel_tol=1e-9)


def test_cramers_v_pandas_replay(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = o.select("o_orderpriority", "o_orderstatus").toPandas()
    ct = pd.crosstab(pdf["o_orderpriority"], pdf["o_orderstatus"]) \
        .to_numpy(float)
    n = ct.sum()
    e = np.outer(ct.sum(1), ct.sum(0)) / n
    # the operator sums per-cell µ-integers — replay that exactly
    chi2 = np.round((ct - e) ** 2 / e * 1e6).sum() / 1e6
    v = math.sqrt(chi2 / (n * min(ct.shape[0] - 1, ct.shape[1] - 1)))
    r = Q.cramers_v(spark, SF_SMOKE).collect()[0]
    assert r["n_orders"] == int(n)
    assert r["min_dim"] == min(ct.shape[0] - 1, ct.shape[1] - 1)
    assert math.isclose(r["chi2"], chi2, rel_tol=1e-12)
    assert math.isclose(r["cramers_v"], v, rel_tol=1e-12)
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_decile_lift_identities(spark):
    """Deciles partition the scored docs into 10 near-equal buckets;
    keeps reconcile; the doc-weighted mean of lift is exactly 1."""
    out = sorted(Q.decile_lift(spark, SF_SMOKE).collect(),
                 key=lambda r: r["decile"])
    assert [r["decile"] for r in out] == list(range(1, 11))
    sizes = [r["n_docs"] for r in out]
    assert max(sizes) - min(sizes) <= 1
    n = sum(sizes)
    keeps = sum(r["n_keep"] for r in out)
    wavg_lift = sum(r["n_docs"] * r["lift"] for r in out) / n
    assert math.isclose(wavg_lift, 1.0, rel_tol=1e-9)
    for r in out:
        assert math.isclose(r["keep_rate"], r["n_keep"] / r["n_docs"])
        assert math.isclose(r["lift"], r["keep_rate"] / (keeps / n))


def test_spearman_corr_pandas_replay(spark):
    """Mid-rank Spearman per group must equal pandas' rank(average)
    + Pearson replay (up to the shipped round(6))."""
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    pdf = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("y")).toPandas()
    got = {r["l_returnflag"]: r
           for r in Q.spearman_corr(spark, SF_SMOKE).collect()}
    for g, grp in pdf.groupby("l_returnflag"):
        rx = grp["x"].rank(method="average")
        ry = grp["y"].rank(method="average")
        rho = float(np.corrcoef(rx, ry)[0, 1])
        assert got[g]["n_rows"] == len(grp)
        assert abs(got[g]["spearman_rho"] - rho) < 1e-6
        assert -1.0 <= got[g]["spearman_rho"] <= 1.0


def test_iqr_scale_approx_certificate_holds(spark):
    out = Q.iqr_scale_approx(spark, SF_SMOKE)
    n = out.count()
    assert n == Catalog(spark, SF_SMOKE).table("lineitem").count()
    assert out.filter(~F.col("ok_scaled")).count() == 0


def test_stream_tumbling_equals_batch(spark):
    stream = {tuple(r) for r in Q.stream_tumbling(spark, SF_SMOKE).collect()}
    batch = {tuple(r) for r in Q.win_tumbling(spark, SF_SMOKE).collect()}
    assert stream == batch and len(stream) > 0
