"""Semantic tests for the §2.32 round-7 (cycle 3) operators: numpy/
pandas replays of the statistics (Mann-Kendall, CUSUM, partial
correlation, Poisson rate z, NDCG), structural identities for the
rank/fusion/survival tables, and batch≡stream equality for the
second readStream twin."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_yoy_growth_self_consistency(spark):
    """prev_year_revenue of month m must equal revenue of m−12 when
    that month exists, and yoy_pct must reproduce from the pair."""
    out = Q.yoy_growth(spark, SF_SMOKE).collect()
    rev = {r["month"]: r["revenue"] for r in out}

    def minus12(m):
        y, mo = map(int, m.split("-"))
        y, mo = (y - 1, mo)
        return f"{y:04d}-{mo:02d}"

    n_checked = 0
    for r in out:
        prev_m = minus12(r["month"])
        if prev_m in rev:
            assert r["prev_year_revenue"] == rev[prev_m]
            assert math.isclose(
                r["yoy_pct"],
                (r["revenue"] - r["prev_year_revenue"])
                / r["prev_year_revenue"] * 100)
            n_checked += 1
        else:
            assert r["prev_year_revenue"] is None
    assert n_checked > 0


def test_rank_change_ranks_are_yearly_permutations(spark):
    out = Q.rank_change(spark, SF_SMOKE).collect()
    by_year: dict[int, list] = {}
    for r in out:
        by_year.setdefault(r["year"], []).append(r)
    for rows in by_year.values():
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # rank 1 has the max revenue of its year
        top = next(r for r in rows if r["rnk"] == 1)
        assert top["revenue"] == max(r["revenue"] for r in rows)
    for r in out:
        if r["prev_rnk"] is not None:
            assert r["rank_gain"] == r["prev_rnk"] - r["rnk"]


def test_mk_trend_numpy_replay(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = (o.select(F.to_date("o_orderdate").alias("d"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").alias("c"))
           .groupBy("d").agg(F.sum("c").alias("r"))
           .orderBy("d").toPandas())
    r = pdf["r"].to_numpy()
    n = len(r)
    s = int(np.sign(r[None, :] - r[:, None])[np.triu_indices(n, 1)]
            .sum())
    _, counts = np.unique(r, return_counts=True)
    tie = int(sum(t * (t - 1) * (2 * t + 5) for t in counts))
    var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18
    row = Q.mk_trend(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert math.isclose(row["var_s"], var_s)
    z = ((s - 1) / math.sqrt(var_s) if s > 0
         else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    assert math.isclose(row["z"], z)


def test_cusum_shift_numpy_replay(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    pdf = (ev.select(F.to_date("ts").alias("d")).groupBy("d").count()
           .orderBy("d").toPandas())
    x = pdf["count"].to_numpy().astype(np.int64)
    n, total = len(x), int(x.sum())
    c = n * np.cumsum(x) - np.arange(1, n + 1) * total
    absc = np.abs(c[:-1])  # C_n ≡ 0 excluded
    t_star = int(np.argmax(absc))  # first max = smallest day tiebreak
    row = Q.cusum_shift(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == n
    assert row["shift_day"] == str(pdf["d"].iloc[t_star])
    assert math.isclose(row["max_abs_cusum"], absc[t_star] / n)
    assert math.isclose(row["pre_mean"],
                        x[: t_star + 1].mean())
    assert math.isclose(row["post_mean"],
                        x[t_star + 1:].mean())


def test_rrf_fusion_rank_permutations_and_formula(spark):
    out = Q.rrf_fusion(spark, SF_SMOKE).collect()
    n = len(out)
    assert sorted(r["rank_lm"] for r in out) == list(range(1, n + 1))
    assert sorted(r["rank_read"] for r in out) == list(range(1, n + 1))
    for r in out:
        assert math.isclose(
            r["rrf"],
            1.0 / (60 + r["rank_lm"]) + 1.0 / (60 + r["rank_read"]))


def test_ndcg_eval_bounds_and_replay(spark):
    out = Q.ndcg_eval(spark, SF_SMOKE).collect()
    assert out, "at least one language"
    for r in out:
        assert r["dcg20"] <= r["idcg20"] + 1e-9
        if r["ndcg20"] is not None:
            assert 0.0 <= r["ndcg20"] <= 1.0 + 1e-9
    # full numpy replay for the largest language
    sc = Q.lm_score(spark, SF_SMOKE).select("doc_id", "avg_logprob")
    kp = Q.quality_gate(spark, SF_SMOKE).select("doc_id", "keep")
    d = Catalog(spark, SF_SMOKE).table("documents").select(
        "doc_id", "lang")
    pdf = sc.join(kp, "doc_id").join(d, "doc_id").toPandas()
    lang = pdf["lang"].value_counts().idxmax()
    sub = pdf[pdf["lang"] == lang]
    act = sub.sort_values(["avg_logprob", "doc_id"],
                          ascending=[False, True])["keep"].to_numpy()
    idl = sub.sort_values(["keep", "avg_logprob", "doc_id"],
                          ascending=[False, False, True])[
        "keep"].to_numpy()

    def dcg(rel):
        return sum(
            round(1e6 * int(rel[i]) / math.log2(i + 2))
            for i in range(min(20, len(rel)))) / 1e6

    row = next(r for r in out if r["lang"] == lang)
    assert math.isclose(row["dcg20"], dcg(act))
    assert math.isclose(row["idcg20"], dcg(idl))


def test_calibration_ece_partitions_and_bounds(spark):
    out = Q.calibration_ece(spark, SF_SMOKE).collect()
    docs = Catalog(spark, SF_SMOKE).table("documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert 0.0 - 1e-9 <= r["avg_conf"] <= 1.0 + 1e-9
        assert 0.0 <= r["keep_rate"] <= 1.0
        assert math.isclose(r["gap"],
                            abs(r["keep_rate"] - r["avg_conf"]))


def test_partial_corr_numpy_replay(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    pdf = li.select(
        F.round("l_quantity", 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("y"),
        F.round(F.col("l_discount") * 10000, 0).cast("long")
        .alias("z"),
    ).toPandas()
    cm = np.corrcoef(np.vstack([pdf["x"], pdf["y"], pdf["z"]]))
    r_xy, r_xz, r_yz = cm[0, 1], cm[0, 2], cm[1, 2]
    want = ((r_xy - r_xz * r_yz)
            / math.sqrt((1 - r_xz ** 2) * (1 - r_yz ** 2)))
    row = Q.partial_corr(spark, SF_SMOKE).collect()[0]
    assert row["n_rows"] == len(pdf)
    # outputs are rounded at 6 decimals (round 8: the cents² power
    # sum exceeds 2⁵³ at sf0.1 and DuckDB's HUGEINT→DOUBLE cast
    # double-rounds 1 ulp below Spark's correctly-rounded
    # DECIMAL→DOUBLE) — compare at the rounding's max error
    assert math.isclose(row["r_xy"], r_xy, abs_tol=5e-7)
    assert math.isclose(row["r_xz"], r_xz, abs_tol=5e-7)
    assert math.isclose(row["r_yz"], r_yz, abs_tol=5e-7)
    assert math.isclose(row["r_xy_given_z"], want, abs_tol=5e-7)


def test_srm_check_counts_and_chi2(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    row = Q.srm_check(spark, SF_SMOKE).collect()[0]
    assert row["n_a"] + row["n_b"] == (
        ev.select("user_id").distinct().count())
    na, nb = row["n_a"], row["n_b"]
    assert math.isclose(row["chi2"], (na - nb) ** 2 / (na + nb))
    assert row["srm_detected"] == (row["chi2"] > 3.841459)


def test_km_survival_monotone_and_risk_replay(spark):
    out = sorted(Q.km_survival(spark, SF_SMOKE).collect(),
                 key=lambda r: r["gap_days"])
    assert out
    prev = 1.0
    for r in out:
        assert 0.0 <= r["survival"] <= prev + 1e-9
        prev = r["survival"]
        assert r["n_events"] >= 1
        assert r["n_risk"] >= r["n_events"]
    # replay the at-risk count for the median event time
    o = Catalog(spark, SF_SMOKE).table("orders")
    w_gap = F.datediff(
        "o_orderdate",
        F.lag("o_orderdate").over(
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")))
    obs = [r["t"] for r in o.select(w_gap.alias("t"))
           .filter(F.col("t").isNotNull()).collect()]
    horizon = o.agg(F.max(F.to_date("o_orderdate"))).collect()[0][0]
    cens = [
        (horizon - r["last"]).days
        for r in o.groupBy("o_custkey")
        .agg(F.max(F.to_date("o_orderdate")).alias("last")).collect()
    ]
    all_t = obs + cens
    mid = out[len(out) // 2]
    assert mid["n_risk"] == sum(1 for t in all_t
                                if t >= mid["gap_days"])


def test_poisson_rate_test_replay(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    row = Q.poisson_rate_test(spark, SF_SMOKE).collect()[0]
    assert row["n_1"] + row["n_2"] == ev.count()
    lo, hi = ev.agg(F.min(F.to_date("ts")),
                    F.max(F.to_date("ts"))).collect()[0]
    assert row["days_1"] + row["days_2"] == (hi - lo).days + 1
    r1 = row["n_1"] / row["days_1"]
    r2 = row["n_2"] / row["days_2"]
    z = (r1 - r2) / math.sqrt(row["n_1"] / row["days_1"] ** 2
                              + row["n_2"] / row["days_2"] ** 2)
    assert math.isclose(row["rate_1"], r1)
    assert math.isclose(row["rate_2"], r2)
    assert math.isclose(row["z"], z)


def test_session_depth_hist_mass(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    out = Q.session_depth_hist(spark, SF_SMOKE).collect()
    assert sum(r["sum_events"] for r in out) == ev.count()
    for r in out:
        lo = r["bucket_lo"]
        assert lo >= 1 and (lo & (lo - 1)) == 0
        assert lo <= r["max_depth"] < 2 * lo
        assert lo * r["n_sessions"] <= r["sum_events"]


def test_stream_sliding_equals_batch(spark):
    """The availableNow readStream drain must reproduce the batch
    sliding-window result bit-for-bit (in-order replay)."""
    batch = {(r["ws"], r["event_type"]): r["n_events"]
             for r in Q.win_sliding(spark, SF_SMOKE).collect()}
    stream = {(r["ws"], r["event_type"]): r["n_events"]
              for r in Q.stream_sliding(spark, SF_SMOKE).collect()}
    assert batch == stream
