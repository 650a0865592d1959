"""Semantic tests for the §2.22 round-12 operators: OR-join rewrite
vs the naive OR join, per-group sample caps, burst frame arithmetic,
relational-division selectivity, streak islands."""

from __future__ import annotations

import datetime

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


def test_or_join_union_equals_naive_or_join(spark):
    """The union-of-hash-joins rewrite must reproduce the naive OR
    join (which Spark would plan as a nested loop) row for row."""
    got = {r["s_suppkey"]: r["n_matches"]
           for r in Q.or_join_union(spark, SF_SMOKE).collect()}
    cat = Catalog(spark, SF_SMOKE)
    s, c = cat.table("supplier"), cat.table("customer")
    naive = (
        s.join(c, (s.s_nationkey == c.c_nationkey)
               | (F.floor(s.s_acctbal / 100) == F.floor(c.c_acctbal / 100)))
        .select("s_suppkey", "c_custkey").distinct()
        .groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["s_suppkey"]: r["n"] for r in naive.collect()}
    assert got == want


def test_sample_k_grouped_caps_every_language(spark):
    rows = Q.sample_k_grouped(spark, SF_SMOKE).collect()
    per_lang: dict = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    docs = Catalog(spark, SF_SMOKE).table("documents")
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per_lang) == set(avail)
    for lang, n in per_lang.items():
        assert n == min(10, avail[lang])
    # deterministic rerun
    again = sorted((r["doc_id"], r["lang"])
                   for r in Q.sample_k_grouped(spark, SF_SMOKE).collect())
    assert again == sorted((r["doc_id"], r["lang"]) for r in rows)


def test_burst_detect_frame_arithmetic(spark):
    """7 errors then a view: at the view, all preceding 7 errors are
    in the 20-row frame → flagged with exactly 7; the first 5 errors
    see < 5 predecessors and stay unflagged."""
    t0 = datetime.datetime(2024, 6, 1)
    evs = [Row(event_id=i, ts=t0 + datetime.timedelta(seconds=i),
               user_id=1, event_type="error", value=0.0, props="{}")
           for i in range(7)]
    evs.append(Row(event_id=7, ts=t0 + datetime.timedelta(seconds=7),
                   user_id=1, event_type="view", value=0.0, props="{}"))
    out = {r["event_id"]: r["n_recent_errors"]
           for r in _with_events(spark.createDataFrame(evs),
                                 Q.burst_detect, spark)}
    assert out == {5: 5, 6: 6, 7: 7}


def test_rel_division_is_selective_on_smoke(spark):
    """The high-value filter keeps the division selective — only a
    strict subset of users qualifies."""
    got = {r["user_id"] for r in Q.rel_division(spark, SF_SMOKE).collect()}
    ev = Catalog(spark, SF_SMOKE).table("events").filter(F.col("value") > 100)
    n_types = ev.select("event_type").distinct().count()
    want = {r["user_id"] for r in ev.groupBy("user_id")
            .agg(F.countDistinct("event_type").alias("k"))
            .filter(F.col("k") == n_types).collect()}
    assert got == want
    n_users = ev.select("user_id").distinct().count()
    assert len(got) < n_users  # genuinely selective at smoke scale


def test_streaks_islands_fixture(spark):
    """Days 1,2,3, 7,8, 30 ⇒ longest streak 3."""
    t0 = datetime.datetime(2024, 6, 1)
    evs = [Row(event_id=i, ts=t0 + datetime.timedelta(days=d, hours=h),
               user_id=5, event_type="x", value=0.0, props="{}")
           for i, (d, h) in enumerate(
               [(0, 1), (0, 9), (1, 2), (2, 3), (6, 4), (7, 5), (29, 6)])]
    out = _with_events(spark.createDataFrame(evs), Q.streaks, spark)
    assert len(out) == 1
    assert out[0]["longest_streak"] == 3
