"""Semantic tests for the §2.25 round-15 operators: RFM quintile
balance + direction, basket-pair support reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_rfm_quintiles_are_balanced_and_directional(spark):
    rows = Q.rfm_quintiles(spark, SF_SMOKE).collect()
    assert rows
    n = len(rows)
    for dim in ("r_q", "f_q", "m_q"):
        counts: dict = {}
        for r in rows:
            assert 1 <= r[dim] <= 5
            counts[r[dim]] = counts.get(r[dim], 0) + 1
        # threshold quantiles keep every quintile within a loose band
        # (ties can skew but not collapse buckets)
        assert len(counts) >= 4, (dim, counts)
        assert max(counts.values()) <= n * 0.45, (dim, counts)
    # direction: the most recent buyer ranks r_q=5, the stalest r_q=1
    by_rec = sorted(rows, key=lambda r: r["r_days"])
    assert by_rec[0]["r_q"] == 5
    assert by_rec[-1]["r_q"] == 1
    # monetary: the top-revenue customer ranks m_q=5
    by_m = sorted(rows, key=lambda r: float(r["revenue"]))
    assert by_m[-1]["m_q"] == 5


def test_basket_pairs_support_reconciles(spark):
    rows = Q.basket_pairs(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    cat = Catalog(spark, SF_SMOKE)
    li, p = cat.table("lineitem"), cat.table("part")
    ob = (li.join(p, li.l_partkey == p.p_partkey)
          .select("l_orderkey", "p_brand").distinct().collect())
    orders: dict = {}
    for r in ob:
        orders.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    support: dict = {}
    for brands in orders.values():
        bs = sorted(brands)
        for i, a in enumerate(bs):
            for b in bs[i + 1:]:
                support[(a, b)] = support.get((a, b), 0) + 1
    for r in rows:
        assert support[(r["brand_a"], r["brand_b"])] == r["support"]
    # top-20 really are the maxima
    floor = min(r["support"] for r in rows)
    higher = sum(1 for v in support.values() if v > floor)
    assert higher < 20
