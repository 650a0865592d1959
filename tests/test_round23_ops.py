"""Semantic tests for the §2.33 round-7 (cycle 4) operators: numpy
replays of the SES recurrence, Theil-Sen estimator, Poisson
bootstrap, and power formula; structural identities for the degree
histogram and the LSH S-curve."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def _daily_cents(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = (o.select(F.to_date("o_orderdate").alias("d"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").alias("c"))
           .groupBy("d").agg(F.sum("c").alias("r"))
           .orderBy("d").toPandas())
    return pdf


def test_ses_forecast_matches_sequential_recurrence(spark):
    """The closed-form weighted sum must agree with the textbook
    sequential recurrence S_i = α·x_i + (1−α)·S_{i−1} (to the
    per-term cent-rounding tolerance: ≤ 0.5 cents × n_days)."""
    pdf = _daily_cents(spark)
    x = pdf["r"].to_numpy().astype(float)
    s = x[0]
    for v in x[1:]:
        s = 0.3 * v + 0.7 * s
    row = Q.ses_forecast(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == len(x)
    assert row["last_revenue"] == x[-1] / 100
    assert abs(row["ses_level"] - s / 100) <= 0.5 * len(x) / 100
    # and the sequential value is approached far tighter in practice
    assert math.isclose(row["ses_level"], s / 100, rel_tol=1e-6)


def test_theil_sen_numpy_replay(spark):
    pdf = _daily_cents(spark)
    x = (pdf["d"] - pdf["d"].min()).map(lambda t: t.days).to_numpy()
    r = pdf["r"].to_numpy().astype(float)
    i, j = np.triu_indices(len(x), 1)
    slopes = (r[j] - r[i]) / (x[j] - x[i])
    row = Q.theil_sen(spark, SF_SMOKE).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert math.isclose(row["slope_cents_per_day"],
                        float(np.median(slopes)), rel_tol=1e-9)
    resid = r - row["slope_cents_per_day"] * x
    assert math.isclose(row["intercept_cents"],
                        float(np.median(resid)), rel_tol=1e-9)


def test_bootstrap_ci_python_replay(spark):
    """Replay the deterministic Poisson weights from md5 and the
    replicate means; the CI must bracket the replicate median and
    the point estimate must be the exact mean."""
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    ).toPandas()
    ts = ["5e2d58d8b3bce00", "bc5ab1b16779c00", "eb715e1dc158300",
          "fb23979734a2580", "ff1025f59174e00"]

    def weight(key, b):
        h = hashlib.md5(f"{key}:{b}".encode()).hexdigest()[:15]
        for w, t in enumerate(ts):
            if h < t:
                return w
        return 5

    means = []
    for b in range(1, 21):
        w = np.array([weight(k, b) for k in pdf["o_orderkey"]])
        means.append((w * pdf["c"]).sum() / w.sum() / 100)
    row = Q.bootstrap_ci(spark, SF_SMOKE).collect()[0]
    assert row["n_boot"] == 20
    assert math.isclose(row["mean_price"],
                        pdf["c"].sum() / len(pdf) / 100)
    assert math.isclose(row["ci_lo"],
                        float(np.quantile(means, 0.025)), rel_tol=1e-9)
    assert math.isclose(row["ci_hi"],
                        float(np.quantile(means, 0.975)), rel_tol=1e-9)
    assert row["ci_lo"] <= float(np.median(means)) <= row["ci_hi"]


def test_power_analysis_formula_replay(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = o.select(F.round(F.col("o_totalprice") * 100, 0)
                   .cast("long").alias("c")).toPandas()
    c = pdf["c"].to_numpy().astype(float)
    var = c.var(ddof=1)
    mde = 0.05 * c.mean()
    want = math.ceil(2.801585 ** 2 * 2 * var / mde ** 2)
    row = Q.power_analysis(spark, SF_SMOKE).collect()[0]
    assert row["n_orders"] == len(c)
    assert math.isclose(row["mean_price"], c.mean() / 100)
    assert math.isclose(row["sd_price"], math.sqrt(var) / 100,
                        rel_tol=1e-12)
    # power-sum vs two-pass variance can differ in the last ulps;
    # the ceil may then sit one integer apart on a knife-edge
    assert abs(row["n_per_arm"] - want) <= 1
    # sanity: detecting a 5% lift on a noisy metric needs real n
    assert row["n_per_arm"] > 100


def test_degree_hist_mass(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    n_pairs = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
               .select("o_custkey", "l_partkey").distinct().count())
    out = Q.degree_hist(spark, SF_SMOKE).collect()
    assert sum(r["sum_degree"] for r in out) == n_pairs
    for r in out:
        lo = r["bucket_lo"]
        assert lo >= 1 and (lo & (lo - 1)) == 0
        assert lo <= r["max_degree"] < 2 * lo


def test_lsh_tuning_curve_math(spark):
    out = {round(r["s"], 2): r
           for r in Q.lsh_tuning_curve(spark, SF_SMOKE).collect()}
    assert len(out) == 19
    for s, r in out.items():
        assert math.isclose(r["p_candidate"], 1 - (1 - s ** 4) ** 8,
                            rel_tol=1e-9, abs_tol=1e-12)
        assert r["bands"] == 8 and r["rows_per_band"] == 4
    # the S-curve is monotone and brackets the design knee
    ps = [out[round(0.05 * i, 2)]["p_candidate"] for i in range(1, 20)]
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    assert out[0.3]["p_candidate"] < 0.15 and out[0.8]["p_candidate"] > 0.9
