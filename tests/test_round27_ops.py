"""Semantic tests for the §2.37 round-7 (cycle 8) operators:
conservation and bound checks for the returns/discount/CLV tables,
a numpy replay of max drawdown, and HHI-range checks for the
supplier-concentration profile."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_returns_impact_mass_and_bounds(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    out = Q.returns_impact(spark, SF_SMOKE).collect()
    assert sum(r["n_lines"] for r in out) == li.count()
    n_r = li.filter(F.col("l_returnflag") == "R").count()
    assert sum(r["n_returned"] for r in out) == n_r
    for r in out:
        assert 0 <= r["return_rate"] <= 1
        assert math.isclose(r["return_rate"],
                            r["n_returned"] / r["n_lines"])
        assert 0 <= r["returned_revenue_share"] <= 1


def test_discount_bands_mass(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    out = Q.discount_bands(spark, SF_SMOKE).collect()
    assert sum(r["n_lines"] for r in out) == li.count()
    for r in out:
        assert 0 <= r["discount_pct"] <= 10
        assert r["avg_qty"] > 0 and r["avg_line_revenue"] > 0


def test_clv_summary_decomposition_identity(spark):
    """AOV × orders-per-customer must equal revenue per customer —
    the decomposition is consistent by construction."""
    out = Q.clv_summary(spark, SF_SMOKE).collect()
    assert len(out) == 5
    for r in out:
        rev_per_cust = r["aov"] * r["orders_per_customer"]
        assert math.isclose(r["clv_margin30"], rev_per_cust * 0.3,
                            rel_tol=1e-12)
        assert r["n_orders"] >= r["n_customers"] > 0


def test_max_drawdown_numpy_replay(spark):
    o = Catalog(spark, SF_SMOKE).table("orders")
    pdf = (o.select(F.to_date("o_orderdate").alias("d"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").alias("c"))
           .groupBy("d").agg(F.sum("c").alias("r"))
           .orderBy("d").toPandas())
    cum = pdf["r"].cumsum().to_numpy()
    dd = np.maximum.accumulate(cum) - cum
    k = int(np.argmax(dd))
    row = Q.max_drawdown(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == len(pdf)
    assert row["trough_day"] == str(pdf["d"].iloc[k])
    assert math.isclose(row["max_drawdown"], dd[k] / 100)
    assert math.isclose(row["cum_at_trough"], cum[k] / 100)
    assert row["max_drawdown"] >= 0


def test_supply_risk_hhi_bounds(spark):
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    out = Q.supply_risk(spark, SF_SMOKE).collect()
    assert sum(r["n_parts"] for r in out) == n_parts
    for r in out:
        k = r["n_suppliers"]
        assert k >= 1
        # 1/k ≤ HHI ≤ 1 (equality when perfectly even / single source)
        assert 1 / k - 1e-6 <= r["avg_hhi"] <= 1 + 1e-6
        if k == 1:
            assert math.isclose(r["avg_hhi"], 1.0, abs_tol=1e-6)
