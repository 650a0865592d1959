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


def test_revenue_bridge_reconciles(spark):
    """Class totals reconcile with the raw yearly sums, delta =
    curr − prev per class, and classes partition the active-customer
    set."""
    rows = Q.revenue_bridge(spark, SF_SMOKE).collect()
    o = Catalog(spark, SF_SMOKE).table("orders")
    raw = o.filter(F.year("o_orderdate").isin(1995, 1996)).select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"))
    n_cust = raw.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    tot_p = float(raw.filter("yr = 1995").agg(F.sum("v")).first()[0] or 0)
    tot_c = float(raw.filter("yr = 1996").agg(F.sum("v")).first()[0] or 0)
    assert math.isclose(sum(r["rev_prev"] for r in rows), tot_p, abs_tol=1e-6)
    assert math.isclose(sum(r["rev_curr"] for r in rows), tot_c, abs_tol=1e-6)
    for r in rows:
        assert math.isclose(r["delta"], r["rev_curr"] - r["rev_prev"],
                            abs_tol=1e-6)


def test_top_paths_shapes(spark):
    rows = Q.top_paths(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    types = {r["event_type"] for r in
             Catalog(spark, SF_SMOKE).table("events")
             .select("event_type").distinct().collect()}
    for r in rows:
        segs = r["path"].split(">")
        assert 1 <= len(segs) <= 3
        assert all(s in types for s in segs)
        assert r["n_sessions"] >= 1
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_gini_index_numpy_replay(spark):
    """0 ≤ G < 1 and a numpy replay of the exact formula agrees to
    double precision for every segment."""
    rows = Q.gini_index(spark, SF_SMOKE).collect()
    assert rows
    cat = Catalog(spark, SF_SMOKE)
    o, c = cat.table("orders"), cat.table("customer")
    rev = (o.groupBy("o_custkey")
           .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
                .cast("decimal(20,0)").cast("bigint").alias("cents"))
           .join(c.select(F.col("c_custkey").alias("o_custkey"),
                          "c_mktsegment"), "o_custkey")
           .collect())
    by_seg: dict = {}
    for r in rev:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (r["cents"], r["o_custkey"]))
    for r in rows:
        xs = [v for v, _ in sorted(by_seg[r["c_mktsegment"]])]
        n, s = len(xs), float(sum(xs))
        s1 = float(sum((i + 1) * x for i, x in enumerate(xs)))
        want = (2.0 * s1 - (n + 1) * s) / (n * s)
        assert r["n_customers"] == n
        assert math.isclose(r["gini"], want, rel_tol=1e-12)
        assert 0 <= r["gini"] < 1


def test_order_aging_partitions_open_orders(spark):
    rows = Q.order_aging(spark, SF_SMOKE).collect()
    o = Catalog(spark, SF_SMOKE).table("orders")
    n_open = o.filter(F.col("o_orderstatus") != "F").count()
    assert sum(r["n_orders"] for r in rows) == n_open
    assert {r["age_bucket"] for r in rows} <= {"0-30", "31-90",
                                               "91-365", "365+"}
    assert all(r["status"] in ("O", "P") for r in rows)


def test_label_noise_reconciles_with_knn(spark):
    rows = {r["true_label"]: r
            for r in Q.label_noise(spark, SF_SMOKE).collect()}
    emb = Catalog(spark, SF_SMOKE).table("embeddings")
    own = {r["vec_id"]: r["label"]
           for r in emb.filter(F.col("vec_id") % 10 == 0).collect()}
    pred = {r["q_id"]: r["pred_label"]
            for r in Q.knn_label(spark, SF_SMOKE).collect()}
    assert sum(r["n_queries"] for r in rows.values()) == len(own)
    for lab, r in rows.items():
        qs = [q for q, tl in own.items() if tl == lab]
        dis = sum(1 for q in qs if pred[q] != lab)
        assert r["n_queries"] == len(qs)
        assert r["n_disagree"] == dis
        assert r["noise_rate"] == dis / len(qs)


def test_round20_batch2_plans(spark):
    """JVM-only row paths; the aging anchor broadcasts; the gini rank
    uses the distributed grouped prefix-sum (range partitioning, not
    a per-segment window sort)."""
    for qkey in ("revenue_bridge", "top_paths", "gini_index",
                 "order_aging", "label_noise"):
        p = Q.QUERIES[qkey](spark, SF_SMOKE) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p, f"{qkey}: {p}"
    pg = Q.gini_index(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in pg.lower(), pg
    assert "_pid" in pg, pg


def test_score_auc_python_replay(spark):
    """Exact Mann-Whitney AUC (ties → ½) replayed in pure python
    from the score/keep tables; AUC ∈ [0, 1]."""
    sc = {r["doc_id"]: r["avg_logprob"]
          for r in Q.lm_score(spark, SF_SMOKE).collect()}
    kp = {r["doc_id"]: r["keep"]
          for r in Q.quality_gate(spark, SF_SMOKE).collect()}
    pos = [sc[d] for d in sc if d in kp and kp[d] == 1]
    neg = [sc[d] for d in sc if d in kp and kp[d] == 0]
    num = 0.0
    for x in pos:
        for y in neg:
            num += 1.0 if x > y else (0.5 if x == y else 0.0)
    want = num / (len(pos) * len(neg))
    r = Q.score_auc(spark, SF_SMOKE).collect()[0]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert math.isclose(r["auc"], want, rel_tol=1e-12)
    assert 0.0 <= r["auc"] <= 1.0


def test_ks_test_numpy_replay(spark):
    """KS statistic replayed from the raw cents arrays: D equals the
    max CDF gap and the reported location attains it."""
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    rows = li.filter(F.col("l_returnflag").isin("A", "R")).select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("decimal(20,0)").cast("bigint").alias("c")).collect()
    a = sorted(r["c"] for r in rows if r["l_returnflag"] == "A")
    b = sorted(r["c"] for r in rows if r["l_returnflag"] == "R")
    support = sorted(set(a) | set(b))
    import bisect
    best, best_at = -1, None
    for v in support:
        fa = bisect.bisect_right(a, v) / len(a)
        fb = bisect.bisect_right(b, v) / len(b)
        d = abs(fa - fb)
        if d > best + 1e-15:
            best, best_at = d, v
    r = Q.ks_test(spark, SF_SMOKE).collect()[0]
    assert r["n_a"] == len(a) and r["n_r"] == len(b)
    assert math.isclose(r["ks_stat"], best, rel_tol=1e-9)
    fa = bisect.bisect_right(a, r["ks_at_cents"]) / len(a)
    fb = bisect.bisect_right(b, r["ks_at_cents"]) / len(b)
    assert math.isclose(abs(fa - fb), best, rel_tol=1e-9)


def test_psi_drift_python_replay(spark):
    rows = Catalog(spark, SF_SMOKE).table("documents").select(
        "lang",
        ((F.instr(F.lit("0123456789abcdef"),
                  F.substring(F.md5(F.col("text")), 4, 1)) - 1) % 2)
        .alias("s")).collect()
    per: dict = {}
    for r in rows:
        a, b = per.get(r["lang"], (0, 0))
        per[r["lang"]] = (a + (r["s"] == 0), b + (r["s"] == 1))
    ta = sum(a for a, _ in per.values())
    tb = sum(b for _, b in per.values())
    k = len(per)
    psi = 0.0
    for a, b in per.values():
        p = (a + 0.5) / (ta + 0.5 * k)
        q = (b + 0.5) / (tb + 0.5 * k)
        psi += (p - q) * math.log(p / q)
    r = Q.psi_drift(spark, SF_SMOKE).collect()[0]
    assert r["n_langs"] == k
    assert math.isclose(r["psi"], psi, abs_tol=1e-6)
    assert r["psi"] >= 0  # PSI is a symmetrized divergence
    assert r["drift_flag"] == (1 if psi > 0.2 else 0)


def test_fk_orphans_clean_schema(spark):
    """The generated star schema is referentially intact — every edge
    reports zero orphans over the full child count."""
    rows = {r["fk_edge"]: r for r in Q.fk_orphans(spark, SF_SMOKE).collect()}
    assert len(rows) == 5
    cat = Catalog(spark, SF_SMOKE)
    assert rows["lineitem.l_orderkey->orders"]["n_child"] == \
        cat.table("lineitem").count()
    assert rows["orders.o_custkey->customer"]["n_child"] == \
        cat.table("orders").count()
    for r in rows.values():
        assert r["n_orphans"] == 0
        assert r["orphan_rate"] == 0.0


def test_round20_batch3_plans(spark):
    """AUC and KS use the distributed prefix-sum (no single-task
    domain window); dimension-parent FK probes broadcast."""
    for qkey in ("score_auc", "ks_test"):
        p = Q.QUERIES[qkey](spark, SF_SMOKE) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in p.lower(), f"{qkey}: {p}"
        assert "_pid" in p, f"{qkey}: {p}"
        assert "BatchEvalPython" not in p, f"{qkey}: {p}"
    pf = Q.fk_orphans(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pf, pf
    assert "BatchEvalPython" not in pf, pf
