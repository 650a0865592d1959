"""Semantic tests for the §2.27 round-17 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_cluster_sizes_reconcile_with_cc_labels(spark):
    hist = {r["cluster_size"]: r["n_clusters"]
            for r in Q.cluster_sizes(spark, SF_SMOKE).collect()}
    labels = Q.dedup_cc(spark, SF_SMOKE).collect()
    per: dict = {}
    for r in labels:
        per[r["cluster_rep"]] = per.get(r["cluster_rep"], 0) + 1
    want: dict = {}
    for size in per.values():
        want[size] = want.get(size, 0) + 1
    assert hist == want
    assert all(size >= 2 for size in hist)  # singletons aren't in the graph


def test_dau_new_returning_reconciles(spark):
    rows = sorted(Q.dau_new_returning(spark, SF_SMOKE).collect(),
                  key=lambda r: r["day"])
    assert rows
    ev = Catalog(spark, SF_SMOKE).table("events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_new"] for r in rows) == n_users
    # day-1 has no returning users; every (user, day) pair is counted
    assert rows[0]["n_returning"] == 0
    n_pairs = ev.select("user_id", F.to_date("ts")).distinct().count()
    assert sum(r["n_new"] + r["n_returning"] for r in rows) == n_pairs
