"""Semantic tests for the §2.20 round-10 operators: numpy k-means
twin, triangle-count structure, nearest-join tie semantics, interval
union on a hand fixture, pivot empty-cell discipline."""

from __future__ import annotations

import datetime
import math

import numpy as np
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


def test_kmeans_matches_numpy_replay(spark):
    """Driver-side training + JVM assignment == a pure-numpy replay
    of the identical subsample, Lloyd loop, and argmax (rows-only
    Qkey oracle)."""
    got = {r["vec_id"]: (r["cluster"], r["sim"])
           for r in Q.kmeans_clusters(spark, SF_SMOKE).collect()}
    emb = Catalog(spark, SF_SMOKE).table("embeddings")
    rows = (emb.select("vec_id", "embedding",
                       F.xxhash64("vec_id").alias("h"))
            .orderBy("h", "vec_id").collect())
    train = np.array([r["embedding"] for r in rows], dtype=np.float64)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    k, iters = 8, 5
    cent = train[:k].copy()
    for _ in range(iters):
        assign = np.argmax(train @ cent.T, axis=1)
        for j in range(k):
            members = train[assign == j]
            if len(members):
                cent[j] = members.sum(axis=0)
        cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    all_rows = emb.select("vec_id", "embedding").collect()
    for r in all_rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        sims = np.round(v @ cent.T, 6)
        j = int(np.argmax(sims))  # ties → lowest index, same as Spark
        cl, sim = got[r["vec_id"]]
        assert cl == j, (r["vec_id"], cl, j, sims)
        assert math.isclose(sim, sims[j], abs_tol=2e-6)
    assert len({c for c, _ in got.values()}) > 1  # non-degenerate


def test_triangle_ring_edges_guarantee_triangles(spark):
    """(x, x+1, x+2) closes for every x, so every vertex is in ≥1
    triangle and the total corner count is ≥ 3N."""
    rows = Q.triangle_count(spark, SF_SMOKE).collect()
    n = Catalog(spark, SF_SMOKE).table("documents").count()
    assert len(rows) == n  # every vertex participates
    assert sum(r["n_triangles"] for r in rows) >= 3 * n
    assert all(r["n_triangles"] >= 1 for r in rows)


def test_nearest_join_prefers_smaller_gap_and_breaks_ties_backward(spark):
    """purchase at t=100: clicks at t=40 (gap 60) and t=130 (gap 30)
    → forward click wins; purchase at t=200 with clicks at 170/230
    (both gap 30) → tie goes to the EARLIER click."""
    t0 = datetime.datetime(2024, 5, 1)

    def ev(eid, sec, typ):
        return Row(event_id=eid, ts=t0 + datetime.timedelta(seconds=sec),
                   user_id=1, event_type=typ, value=0.0, props="{}")

    df = spark.createDataFrame([
        ev(0, 40, "click"), ev(1, 100, "purchase"), ev(2, 130, "click"),
        ev(3, 170, "click"), ev(4, 200, "purchase"), ev(5, 230, "click"),
        ev(6, 500, "purchase"),   # nearest is click 5 (backward, gap 270)
    ])
    out = {r["event_id"]: (r["nearest_click"], r["gap_sec"])
           for r in _with_events(df, Q.nearest_join, spark)}
    assert out[1] == (2, 30)
    assert out[4] == (3, 30)   # tie → earlier click
    assert out[6] == (5, 270)


def test_interval_union_merges_overlaps(spark):
    """Events at 0 s, 100 s (overlap into one 400-s span) and 1000 s
    (separate 300-s span) ⇒ 2 spans, 700 covered seconds."""
    t0 = datetime.datetime(2024, 5, 1)
    df = spark.createDataFrame([
        Row(event_id=i, ts=t0 + datetime.timedelta(seconds=s), user_id=9,
            event_type="x", value=0.0, props="{}")
        for i, s in enumerate((0, 100, 1000))
    ])
    out = _with_events(df, Q.interval_union, spark)
    assert len(out) == 1
    assert out[0]["n_spans"] == 2
    assert out[0]["covered_sec"] == 700


def test_pivot_multi_empty_cell_discipline(spark):
    """Counts for empty cells are 0 (coalesced); sums stay NULL —
    and present combos reconcile against a plain groupBy."""
    rows = Q.pivot_multi(spark, SF_SMOKE).collect()
    assert rows
    o = Catalog(spark, SF_SMOKE).table("orders")
    want = {(r["o_orderpriority"], r["o_orderstatus"]): r["n"]
            for r in o.groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in rows:
        for s in ("o", "f", "p"):
            cnt = r[f"{s}_cnt"]
            assert cnt == want.get((r["o_orderpriority"], s.upper()), 0)
            if cnt == 0:
                assert r[f"{s}_total"] is None
            else:
                assert r[f"{s}_total"] is not None


def test_map_funcs_reconciles_with_flat_counts(spark):
    rows = Q.map_funcs(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        types = r["types_csv"].split(",")
        assert types == sorted(types)
        assert r["n_types"] == len(types)
        assert ("click" in types) == (r["n_clicks"] > 0)
