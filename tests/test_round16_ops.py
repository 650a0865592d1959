"""Semantic tests for the §2.26 round-16 operators: interpolation
fixture, chi-square reconciliation, multi-touch credit conservation."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def _with_events(df, fn, spark):
    orig = Catalog.table
    try:
        Catalog.table = (lambda self, name, _df=df:
                         _df if name == "events" else orig(self, name))
        return fn(spark, SF_SMOKE).collect()
    finally:
        Catalog.table = orig


def test_linear_interp_fixture(spark):
    """Readings 10 @t=0 and 20 @t=100 with an error @t=25 ⇒ filled
    12.5; leading error takes the next value, trailing the last."""
    t0 = datetime.datetime(2024, 8, 1)

    def ev(eid, sec, typ, val):
        return Row(event_id=eid, ts=t0 + datetime.timedelta(seconds=sec),
                   user_id=1, event_type=typ, value=val, props="{}")

    df = spark.createDataFrame([
        ev(0, -10, "error", 99.0),   # leading → NOCB = 10
        ev(1, 0, "view", 10.0),
        ev(2, 25, "error", 99.0),    # interior → 12.5
        ev(3, 100, "view", 20.0),
        ev(4, 130, "error", 99.0),   # trailing → LOCF = 20
    ])
    out = {r["event_id"]: r["reading_filled"]
           for r in _with_events(df, Q.linear_interp, spark)}
    assert out[0] == 10.0
    assert out[1] == 10.0
    assert math.isclose(out[2], 12.5, abs_tol=1e-12)
    assert out[3] == 20.0
    assert out[4] == 20.0


def test_linear_interp_preserves_observed_readings(spark):
    rows = Q.linear_interp(spark, SF_SMOKE).collect()
    assert rows
    n_filled = 0
    for r in rows:
        if r["reading"] is not None:
            assert r["reading_filled"] == r["reading"]
        else:
            n_filled += 1
            assert r["reading_filled"] is not None
    assert n_filled > 0  # the smoke stream has error events


def test_chi_square_cells_reconcile(spark):
    rows = Q.chi_square_cells(spark, SF_SMOKE).collect()
    d = Catalog(spark, SF_SMOKE).table("documents")
    n = d.count()
    obs_total = sum(r["observed"] for r in rows)
    assert obs_total == n
    # expected mass over the PRESENT cells never exceeds n (cells
    # with observed = 0 are absent, so Σ expected ≤ n strictly)
    assert sum(r["expected"] for r in rows) <= n + 1e-6
    for r in rows:
        want = (r["observed"] - r["expected"]) ** 2 / r["expected"]
        assert math.isclose(r["chi2_contrib"], want, rel_tol=1e-3,
                            abs_tol=1e-4)


def test_utouch_credit_is_conserved(spark):
    """Total credit across clicks equals the number of attributed
    purchases — 0.5 + 0.5 (or 1.0) per purchase, nothing lost."""
    rows = Q.utouch_attribution(spark, SF_SMOKE).collect()
    assert rows
    total_credit = sum(r["total_credit"] for r in rows)
    ev = Catalog(spark, SF_SMOKE).table("events")
    # purchases with at least one preceding click:
    clicks = ev.filter(F.col("event_type") == "click") \
        .groupBy("user_id").agg(F.min("ts").alias("t0"))
    attributed = (ev.filter(F.col("event_type") == "purchase")
                  .join(clicks, "user_id")
                  .filter(F.col("ts") > F.col("t0")).count())
    assert math.isclose(total_credit, attributed, abs_tol=1e-9)


def test_utouch_fixture_split(spark):
    """click c1, click c2, purchase ⇒ c1 and c2 get 0.5 each;
    a second purchase doubles both; single-click user gets 1.0."""
    t0 = datetime.datetime(2024, 8, 1)

    def ev(eid, uid, sec, typ):
        return Row(event_id=eid, ts=t0 + datetime.timedelta(seconds=sec),
                   user_id=uid, event_type=typ, value=0.0, props="{}")

    df = spark.createDataFrame([
        ev(0, 1, 0, "click"), ev(1, 1, 10, "click"),
        ev(2, 1, 20, "purchase"), ev(3, 1, 30, "purchase"),
        ev(4, 2, 0, "click"), ev(5, 2, 10, "purchase"),
    ])
    out = {r["click_id"]: (r["total_credit"], r["n_purchases"])
           for r in _with_events(df, Q.utouch_attribution, spark)}
    assert out == {0: (1.0, 2), 1: (1.0, 2), 4: (1.0, 1)}
