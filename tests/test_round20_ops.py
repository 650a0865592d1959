"""Semantic tests for the §2.30 round-20 operators: windowed-dedup
mass conservation, vocabulary-coverage identities, entropy bounds, a
numpy replay of the IQR scaler, and vector-stats identities against
numpy on the raw embeddings."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def test_dedup_time_window_mass_and_membership(spark):
    """Every input event lands in exactly one bucket (Σ n_in_window =
    |events|), every kept id exists, and no (user, type, hour) bucket
    appears twice."""
    ev = Catalog(spark, SF_SMOKE).table("events")
    out = Q.dedup_time_window(spark, SF_SMOKE).collect()
    n_events = ev.count()
    assert sum(r["n_in_window"] for r in out) == n_events
    keys = [(r["user_id"], r["event_type"], r["window_start"]) for r in out]
    assert len(keys) == len(set(keys))
    ids = {r["event_id"] for r in ev.select("event_id").collect()}
    assert all(r["kept_event_id"] in ids for r in out)
    assert all(r["window_start"] % 3600 == 0 for r in out)
    # the kept event really is the bucket's earliest (ts, event_id)
    first = (
        ev.select("event_id", "user_id", "event_type",
                  (F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT) "
                          "div 3600") * 3600).alias("hb"), "ts")
        .orderBy("ts", "event_id").collect()
    )
    earliest: dict = {}
    for r in first:
        k = (r["user_id"], r["event_type"], r["hb"])
        earliest.setdefault(k, r["event_id"])
    for r in out:
        k = (r["user_id"], r["event_type"], r["window_start"])
        assert r["kept_event_id"] == earliest[k]


def test_vocab_coverage_identities(spark):
    """OOV rate = n_oov / n_tokens exactly; per-language token totals
    reconcile with a direct count; rates live in [0, 1]."""
    rows = Q.vocab_coverage(spark, SF_SMOKE).collect()
    assert rows
    d = Catalog(spark, SF_SMOKE).table("documents")
    direct = {
        r["lang"]: r["n"]
        for r in d.select(
            "lang",
            F.size(F.filter(F.split("text", " "),
                            lambda t: t != F.lit(""))).alias("k"))
        .groupBy("lang").agg(F.sum("k").alias("n")).collect()
    }
    for r in rows:
        assert r["n_tokens"] == direct[r["lang"]]
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_rate"] == r["n_oov"] / r["n_tokens"]


def test_char_entropy_bounds_and_numpy_replay(spark):
    """0 ≤ H ≤ log2(#distinct chars); numpy replay agrees to the
    declared rounding digit on a sample of documents."""
    rows = Q.char_entropy(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        hi = math.log2(r["n_distinct_chars"]) if r["n_distinct_chars"] > 1 else 0.0
        assert -1e-9 <= r["entropy_bits"] <= hi + 1e-6
    docs = {r["doc_id"]: r["text"]
            for r in Catalog(spark, SF_SMOKE).table("documents")
            .filter(F.col("doc_id") < 20).collect()}
    got = {r["doc_id"]: r for r in rows if r["doc_id"] in docs}
    for doc_id, text in docs.items():
        counts: dict = {}
        for ch in text:
            counts[ch] = counts.get(ch, 0) + 1
        n = sum(counts.values())
        h = -sum(c / n * math.log2(c / n) for c in counts.values())
        assert got[doc_id]["n_chars"] == n
        assert got[doc_id]["n_distinct_chars"] == len(counts)
        assert math.isclose(got[doc_id]["entropy_bits"], h, abs_tol=1e-5)


def test_iqr_scale_numpy_replay(spark):
    """Quartiles and scaled values replayed with numpy's linear
    interpolation (the same definition as F.percentile /
    quantile_cont) on one group."""
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    rows = Q.iqr_scale(spark, SF_SMOKE).collect()
    assert len(rows) == li.count()
    qs = np.array([
        r["l_quantity"] for r in
        li.filter(F.col("l_returnflag") == "A")
        .select("l_quantity").collect()
    ], dtype=np.float64)
    q1, med, q3 = np.percentile(qs, [25, 50, 75])
    for r in rows:
        if r["l_returnflag"] != "A":
            continue
        want = (r["qty"] - med) / (q3 - q1)
        assert math.isclose(r["qty_scaled"], want, abs_tol=1e-12)


def test_vec_stats_numpy_identities(spark):
    e = Catalog(spark, SF_SMOKE).table("embeddings")
    raw = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in e.collect()}
    rows = Q.vec_stats(spark, SF_SMOKE).collect()
    assert len(rows) == len(raw)
    for r in rows:
        v = raw[r["vec_id"]]
        assert r["dim"] == len(v)
        assert math.isclose(r["l2_norm"], np.linalg.norm(v), abs_tol=1e-5)
        assert math.isclose(r["mean_val"], v.mean(), abs_tol=1e-5)
        assert math.isclose(r["median_val"], float(np.median(v)),
                            abs_tol=1e-9)
        assert r["max_val"] == v.max()


def test_round20_plans_stay_jvm_side(spark):
    """No Python row path anywhere in the five new operators, the
    vocab membership join broadcasts, and vec_stats is shuffle-free."""
    for qkey in ("dedup_time_window", "vocab_coverage", "char_entropy",
                 "iqr_scale", "vec_stats"):
        p = Q.QUERIES[qkey](spark, SF_SMOKE) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p, f"{qkey}: {p}"
        assert "CartesianProduct" not in p, f"{qkey}: {p}"
    pv = Q.vocab_coverage(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pv, pv
    pi = Q.iqr_scale(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pi, pi
    ps = Q.vec_stats(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in ps, ps
