"""Semantic tests for the §2.35 round-7 (cycle 6) operators: LOO
identity checks, session-funnel consistency, heatmap conservation,
entropy bounds, and the distribution-identity property of quantile
normalization."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_target_encode_loo_identity(spark):
    """n_g·mean_g = (n_g−1)·loo_i + x_i for every row, and the LOO
    value never equals the naive group mean unless x_i does."""
    out = Q.target_encode_loo(spark, SF_SMOKE).toPandas()
    for pri, grp in out.groupby("o_orderpriority"):
        n = len(grp)
        s = grp["price"].sum()
        # reconstruct the group sum from each row's LOO encode
        recon = grp["loo_mean_price"] * (n - 1) + grp["price"]
        assert np.allclose(recon, s, rtol=1e-9)


def test_session_conversion_bounds(spark):
    row = Q.session_conversion(spark, SF_SMOKE).collect()[0]
    assert 0 < row["n_view_sessions"] <= row["n_sessions"]
    assert 0 <= row["n_converted"] <= row["n_view_sessions"]
    assert math.isclose(row["conversion_rate"],
                        row["n_converted"] / row["n_view_sessions"])
    # session count must agree with the sessionize labeling
    s = Q.sessionize(spark, SF_SMOKE)
    n_sessions = s.select("user_id", "session_seq").distinct().count()
    assert row["n_sessions"] == n_sessions


def test_hour_dow_heatmap_conservation(spark):
    ev = Catalog(spark, SF_SMOKE).table("events")
    out = Q.hour_dow_heatmap(spark, SF_SMOKE).collect()
    assert sum(r["n_events"] for r in out) == ev.count()
    assert math.isclose(sum(r["share"] for r in out), 1.0,
                        rel_tol=1e-9)
    for r in out:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23


def test_col_entropy_profile_bounds(spark):
    out = {r["column_name"]: r
           for r in Q.col_entropy_profile(spark, SF_SMOKE).collect()}
    assert len(out) == 5
    for name, r in out.items():
        # 0 ≤ H ≤ ln(k); rounding can nick the bound by 1e-6
        assert -1e-6 <= r["entropy_nats"] \
            <= math.log(r["n_distinct"]) + 1e-6, name
    # nation names are uniform (one row each) → H = ln(25) exactly
    nn = out["nation.n_name"]
    assert nn["n_distinct"] == 25
    assert math.isclose(nn["entropy_nats"], round(math.log(25), 6))


def test_quantile_normalize_distribution_identity(spark):
    """THE defining property: after normalization, every group's
    multiset of values is (near-)identical — each group now draws
    from the global distribution. Compare per-group deciles."""
    pdf = Q.quantile_normalize(spark, SF_SMOKE).toPandas()
    qs = np.linspace(0.1, 0.9, 9)
    deciles = {g: np.quantile(grp["qnorm_v"], qs)
               for g, grp in pdf.groupby("g")}
    ref = next(iter(deciles.values()))
    for g, d in deciles.items():
        assert np.allclose(d, ref, atol=1.0), g
    # rank order is preserved within each group
    for g, grp in pdf.groupby("g"):
        srt = grp.sort_values(["v", "l_orderkey", "l_linenumber"])
        assert (srt["qnorm_v"].to_numpy()
                == np.sort(srt["qnorm_v"].to_numpy())).all()
    # row count preserved
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    assert len(pdf) == li.count()
