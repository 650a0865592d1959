"""Semantic tests for the §2.24 round-14 operators: adoption-curve
monotonicity + reconciliation, Pareto class boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_adoption_curve_reconciles_and_is_monotone(spark):
    rows = sorted(Q.adoption_curve(spark, SF_SMOKE).collect(),
                  key=lambda r: r["day"])
    assert rows
    ev = Catalog(spark, SF_SMOKE).table("events")
    n_users = ev.select("user_id").distinct().count()
    assert rows[-1]["total_users"] == n_users
    assert sum(r["new_users"] for r in rows) == n_users
    totals = [r["total_users"] for r in rows]
    assert totals == sorted(totals)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["total_users"] == prev["total_users"] + cur["new_users"]


def test_pareto_abc_boundaries(spark):
    rows = Q.pareto_abc(spark, SF_SMOKE).collect()
    assert rows
    by_share = sorted(rows, key=lambda r: r["cum_share"])
    # classes are contiguous in cumulative-share order: A then B then C
    labels = "".join(r["abc_class"] for r in by_share)
    assert labels == ("A" * labels.count("A") + "B" * labels.count("B")
                      + "C" * labels.count("C"))
    for r in rows:
        if r["cum_share"] <= 0.80:
            assert r["abc_class"] == "A"
        elif r["cum_share"] <= 0.95:
            assert r["abc_class"] == "B"
        else:
            assert r["abc_class"] == "C"
    assert by_share[-1]["cum_share"] <= 1.0 + 1e-9
    # top customers carry disproportionate share: the A class is a
    # strict minority of customers on TPC-H-ish revenue
    n_a = sum(1 for r in rows if r["abc_class"] == "A")
    assert n_a < len(rows) * 0.85


def test_pareto_revenue_reconciles(spark):
    rows = Q.pareto_abc(spark, SF_SMOKE).collect()
    o = Catalog(spark, SF_SMOKE).table("orders")
    # revenue surfaces as DOUBLE since r6 (driver canon: no DECIMAL
    # in driver-visible columns); the sum itself is still exact
    want = {r["o_custkey"]: r["rev"] for r in o.groupBy("o_custkey")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev")).collect()}
    got = {r["o_custkey"]: r["revenue"] for r in rows}
    assert got == want
