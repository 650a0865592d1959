"""Semantic tests for the §2.19 round-9 operators: numpy PCA oracle,
prefix-filter exactness vs the inverted-index ground truth, bitmap
== countDistinct, sweep-line concurrency on a constructed fixture,
TWAP hand-check, containment directionality."""

from __future__ import annotations

import datetime
import math

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog
from mini_sql_engine_spark.pipeline import dedup as DD

from tests.conftest import SF_SMOKE


def test_pca_matches_numpy(spark):
    """Gram-partial covariance + driver eigh + JVM projection ==
    numpy PCA on the same matrix (sign-fixed), to 1e-6."""
    got = {r["vec_id"]: [r["pc1"], r["pc2"], r["pc3"], r["pc4"]]
           for r in Q.pca_project(spark, SF_SMOKE).collect()}
    emb = Catalog(spark, SF_SMOKE).table("embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    x = np.asarray([np.asarray(r["embedding"], dtype=np.float64)
                    for r in rows])
    ids = [r["vec_id"] for r in rows]
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :4].T
    for i in range(4):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    proj = (x - mean) @ comps.T
    assert len(got) == len(ids)
    for vid, p in zip(ids, proj):
        for a, b in zip(got[vid], p):
            assert math.isclose(a, round(b, 6), abs_tol=2e-6), (
                f"vec {vid}: {got[vid]} vs numpy {p}")
    # variance ordering: pc1 spreads at least as much as pc4
    var = np.var(proj, axis=0)
    assert var[0] >= var[3]


def test_prefix_filter_equals_inverted_index_ground_truth(spark):
    """The SSJoin prefix theorem in practice: candidates generated
    from rarest-first prefixes alone reproduce the all-pairs result
    EXACTLY (same pairs, same jaccard values)."""
    docs = Catalog(spark, SF_SMOKE).table("documents")
    fast = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in DD.prefix_filter_jaccard_pairs(
                docs, n=4, threshold=0.5).collect()}
    truth = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in DD.ngram_jaccard_pairs(
                 docs, n=4, threshold=0.5).collect()}
    assert fast == truth
    assert truth  # non-vacuous: the smoke corpus has near-dup pairs


def test_bitmap_distinct_equals_count_distinct(spark):
    got = {r["event_type"]: r["n_users"]
           for r in Q.bitmap_distinct(spark, SF_SMOKE).collect()}
    ev = Catalog(spark, SF_SMOKE).table("events")
    want = {r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == want


def test_sketch_rollup_certificate_holds(spark):
    rows = Q.sketch_rollup(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["ok"] for r in rows)
    assert all(r["exact_users"] > 0 for r in rows)


def test_max_concurrency_sweep_line_fixture(spark):
    """3 users, hand-placed sessions on one day: A 10:00–11:00,
    B 10:30–11:30, C 10:45–10:50 ⇒ peak 3; D alone next day ⇒ 1.
    Each session is a pair of events 'start,end' spaced < 30 min
    apart via intermediate pings every 10 min."""
    base = datetime.datetime(2024, 3, 1, 10, 0, 0)

    def mins(m):
        return base + datetime.timedelta(minutes=m)

    evs, eid = [], 0

    def session(uid, start_min, end_min):
        nonlocal eid
        m = start_min
        while m < end_min:
            evs.append(Row(event_id=eid, ts=mins(m), user_id=uid,
                           event_type="x", value=1.0, props="{}"))
            eid += 1
            m += 10
        evs.append(Row(event_id=eid, ts=mins(end_min), user_id=uid,
                       event_type="x", value=1.0, props="{}"))
        eid += 1

    session(1, 0, 60)       # A 10:00–11:00
    session(2, 30, 90)      # B 10:30–11:30
    session(3, 45, 50)      # C 10:45–10:50
    session(4, 24 * 60, 24 * 60 + 30)   # D next day

    df = spark.createDataFrame(evs)
    import mini_sql_engine_spark.queries as QQ
    orig = Catalog.table
    try:
        Catalog.table = (lambda self, name, _df=df:
                         _df if name == "events" else orig(self, name))
        out = {r["day"]: r["max_concurrent"]
               for r in QQ.max_concurrency(spark, SF_SMOKE).collect()}
    finally:
        Catalog.table = orig
    assert out == {"2024-03-01": 3, "2024-03-02": 1}


def test_twap_weights_by_holding_time(spark):
    """One user, value 10 held 100 s then value 20 held 300 s (final
    reading unweighted) ⇒ TWAP = (10·100 + 20·300) / 400 = 17.5."""
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        Row(event_id=0, ts=t0, user_id=7, event_type="x",
            value=10.0, props="{}"),
        Row(event_id=1, ts=t0 + datetime.timedelta(seconds=100),
            user_id=7, event_type="x", value=20.0, props="{}"),
        Row(event_id=2, ts=t0 + datetime.timedelta(seconds=400),
            user_id=7, event_type="x", value=99.0, props="{}"),
    ]
    df = spark.createDataFrame(rows)
    import mini_sql_engine_spark.queries as QQ
    orig = Catalog.table
    try:
        Catalog.table = (lambda self, name, _df=df:
                         _df if name == "events" else orig(self, name))
        out = QQ.twap_agg(spark, SF_SMOKE).collect()
    finally:
        Catalog.table = orig
    assert len(out) == 1
    assert out[0]["active_sec"] == 400
    assert math.isclose(out[0]["twap"], 17.5, abs_tol=1e-9)


def test_containment_is_asymmetric_and_bounded(spark):
    rows = Q.containment_dup(spark, SF_SMOKE).collect()
    assert rows  # smoke corpus has near-verbatim inclusions
    for r in rows:
        assert 0.6 <= r["containment"] <= 1.0
        assert r["doc_id"] != r["container_id"]
    # a (doc, container) edge must come from shingle overlap, so the
    # reverse direction may exist but with its OWN ratio — check at
    # least one pair is one-directional OR ratios differ, i.e. the
    # measure is genuinely asymmetric on this corpus
    ratio = {(r["doc_id"], r["container_id"]): r["containment"]
             for r in rows}
    asym = [k for k in ratio
            if (k[1], k[0]) not in ratio or ratio[(k[1], k[0])] != ratio[k]]
    assert asym


def test_event_transitions_rows_are_a_distribution(spark):
    rows = Q.event_transitions(spark, SF_SMOKE).collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r["p"])
        assert r["n"] >= 1
    for src, ps in by_src.items():
        assert math.isclose(sum(ps), 1.0, abs_tol=1e-9), src


def test_dict_encode_codes_are_dense_and_frequency_ordered(spark):
    rows = Q.dict_encode(spark, SF_SMOKE).collect()
    counts: dict = {}
    code: dict = {}
    for r in rows:
        counts[r["p_brand"]] = counts.get(r["p_brand"], 0) + 1
        code[r["p_brand"]] = r["brand_code"]
    assert sorted(code.values()) == list(range(len(code)))
    ordered = sorted(counts, key=lambda b: (-counts[b], b))
    assert [code[b] for b in ordered] == list(range(len(ordered)))


def test_pmi_pairs_sign_semantics(spark):
    """PMI > 0 ⇔ the pair co-occurs more than independence predicts;
    recompute from raw counts in python."""
    rows = Q.pmi_pairs(spark, SF_SMOKE).collect()
    assert rows
    ev = Catalog(spark, SF_SMOKE).table("events")
    ut = ev.select("user_id", "event_type").distinct().collect()
    users: dict = {}
    for r in ut:
        users.setdefault(r["user_id"], set()).add(r["event_type"])
    n = len(users)
    for r in rows:
        n_both = sum(1 for s in users.values()
                     if r["t1"] in s and r["t2"] in s)
        c1 = sum(1 for s in users.values() if r["t1"] in s)
        c2 = sum(1 for s in users.values() if r["t2"] in s)
        assert r["n_both"] == n_both
        want = math.log(n_both * n / (c1 * c2))
        assert math.isclose(r["pmi"], round(want, 6), abs_tol=1e-6)


# ── round-5 hardening gates (VERDICT r4 #4 + ADVICE r4) ─────────


def test_gram_cells_constant_size_regardless_of_partitions(spark):
    """The scale gate on pca_project's driver funnel: however many
    partitions (→ Arrow batches → Gram partials) feed it, the folded
    cell table the driver collects is EXACTLY d²+d+1 rows — constant
    in corpus size, so 100 TB collects the same ~33 KB as sf0.001."""
    from mini_sql_engine_spark.pipeline import similarity as SIM

    emb = Catalog(spark, SF_SMOKE).table("embeddings")
    d = SIM.EMBEDDING_DIM
    expected = d * d + d + 1
    for parts in (1, 7):
        sub = emb.repartition(parts)
        import pandas as pd
        from pyspark.sql import types as T

        part_schema = T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ])

        def gp(batches):
            for pdf in batches:
                x = np.asarray([np.asarray(v, dtype=np.float64)
                                for v in pdf["embedding"]])
                if len(x) == 0:
                    continue
                yield pd.DataFrame({
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                })

        partials = sub.select("embedding").mapInPandas(gp, part_schema)
        assert SIM.gram_cells(partials).count() == expected


def test_pca_projection_invariant_to_partitioning(spark):
    """Associativity check on the distributed Gram fold: 1-partition
    and 7-partition layouts give bit-identical projections (the sum
    per cell is over the same floats; only grouping order differs,
    and the 6-decimal round absorbs it)."""
    from mini_sql_engine_spark.pipeline import similarity as SIM

    emb = Catalog(spark, SF_SMOKE).table("embeddings")
    a = {r["vec_id"]: (r["pc1"], r["pc2"])
         for r in SIM.pca_project(emb.repartition(1), k=2).collect()}
    b = {r["vec_id"]: (r["pc1"], r["pc2"])
         for r in SIM.pca_project(emb.repartition(7), k=2).collect()}
    assert a.keys() == b.keys() and a
    for vid in a:
        assert math.isclose(a[vid][0], b[vid][0], abs_tol=2e-6)
        assert math.isclose(a[vid][1], b[vid][1], abs_tol=2e-6)


def test_pca_project_empty_input_returns_empty_frame(spark):
    """ADVICE r4: n == 0 must short-circuit (no ZeroDivisionError /
    np.sum over empty partials) with the projected schema intact."""
    from pyspark.sql import types as T

    from mini_sql_engine_spark.pipeline import similarity as SIM

    empty = spark.createDataFrame([], T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]))
    out = SIM.pca_project(empty, k=3)
    assert out.columns == ["vec_id", "pc1", "pc2", "pc3"]
    assert out.count() == 0


def test_kmeans_clamps_k_and_survives_zero_vectors(spark):
    """ADVICE r4: a corpus smaller than k must clamp (no IndexError)
    and a zero vector must not poison the centroids with NaN."""
    from pyspark.sql import Row

    from mini_sql_engine_spark.pipeline import similarity as SIM

    rows = [Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 0.0]),   # zero vector
            Row(vec_id=3, embedding=[0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows)
    out = SIM.kmeans_assignments(df, k=8, iters=2, train_cap=10)
    got = {r["vec_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    for r in got.values():
        assert r["cluster"] is not None
        assert r["sim"] is None or not math.isnan(r["sim"])


def test_kmeans_empty_corpus_returns_empty_frame(spark):
    from pyspark.sql import types as T

    from mini_sql_engine_spark.pipeline import similarity as SIM

    empty = spark.createDataFrame([], T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]))
    out = SIM.kmeans_assignments(empty, k=4)
    assert out.columns == ["vec_id", "cluster", "sim"]
    assert out.count() == 0
