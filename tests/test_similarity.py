"""Numpy oracles for the vector ops (rows-only Qkeys sim_topk /
sim_ann / dedup_embed): brute-force correctness, LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mini_sql_engine_spark.catalog import Catalog
from mini_sql_engine_spark.pipeline import similarity as SIM

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        Catalog(spark, SF_SMOKE).table("embeddings")
        .select("vec_id", "embedding").collect()
    )
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def np_topk(ids, mat, query_ids, k=10):
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for qid in query_ids:
        qi = np.where(ids == qid)[0][0]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))
        out[qid] = [
            (int(ids[i]), float(cos[i])) for i in order if ids[i] != qid
        ][:k]
    return out


def test_brute_force_topk_matches_numpy(spark, emb_np):
    ids, mat = emb_np
    e = Catalog(spark, SF_SMOKE).table("embeddings")
    got = SIM.brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=10).collect()
    expect = np_topk(ids, mat, [i for i in range(5) if i in ids], k=10)
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine))
    assert set(by_q) == set(expect)
    for qid, neigh in expect.items():
        got_ids = [n for n, _ in by_q[qid]]
        exp_ids = [n for n, _ in neigh]
        assert got_ids == exp_ids, f"query {qid}: {got_ids} != {exp_ids}"
        for (gn, gc), (en, ec) in zip(by_q[qid], neigh):
            assert abs(gc - round(ec, 6)) < 1e-5, f"query {qid} neighbor {gn}"


def test_lsh_topk_recall(spark, emb_np):
    """Multi-table LSH ANN must reach ≥0.3 recall@10 vs brute force
    (4 planes × 8 tables: single-table recall ≈0.14 measured →
    OR-construction ≈1−0.86⁸≈0.7). The point is the measured trade —
    brute force is the correctness bar."""
    ids, mat = emb_np
    e = Catalog(spark, SF_SMOKE).table("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = SIM.brute_force_topk(e, q, k=10).collect()
    approx = SIM.lsh_topk(e, q, k=10, n_planes=4, n_tables=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"LSH recall {recall:.2f} too low"
    # every approx hit must carry the exact cosine score
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-9


def test_cosine_dup_pairs_exact_matches_numpy(spark, emb_np):
    ids, mat = emb_np
    got = SIM.cosine_dup_pairs(
        Catalog(spark, SF_SMOKE).table("embeddings"), threshold=0.4, exact=True
    ).collect()
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    expect = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and round(cos[i, j], 6) >= 0.4
    }
    assert {(r.id_a, r.id_b) for r in got} == expect
    assert len(expect) > 0, "threshold should catch some pairs at sf0.001"


def test_lsh_blocked_dup_pairs_subset_of_exact(spark):
    """The bucketed (Qkey-bound) path may only miss pairs, never
    invent them — and at the Qkey's parameters it must find most."""
    e = Catalog(spark, SF_SMOKE).table("embeddings")
    exact = {(r.id_a, r.id_b)
             for r in SIM.cosine_dup_pairs(e, threshold=0.4, exact=True).collect()}
    blocked = {(r.id_a, r.id_b)
               for r in SIM.cosine_dup_pairs(
                   e, threshold=0.4, n_planes=4, n_tables=8).collect()}
    assert blocked <= exact
    assert len(blocked) / len(exact) >= 0.5, (
        f"Qkey-shape recall {len(blocked)}/{len(exact)} too low")


def test_cosine_dup_pairs_recall_on_planted_neardups(spark):
    """Recall gate for the default multi-table path: plant 40 true
    near-duplicate pairs (cos ≥ 0.9) among 400 random vectors; the
    8-plane × 8-table OR-construction must recover ≥ 0.9 of them
    (Charikar bound predicts ≈ 0.94 at cos = 0.9 exactly; planted
    pairs sit at 0.9–0.99 so observed recall is higher)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(400, 64))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(400)]
    planted = set()
    next_id = 400
    for i in range(40):
        # dup = unit(base) + small orthogonal-ish noise → cos ≥ 0.9
        v = base[i] / np.linalg.norm(base[i])
        noise = rng.normal(size=64)
        noise *= rng.uniform(0.15, 0.4) / np.linalg.norm(noise)
        dup = v + noise
        cos = float(v @ dup / np.linalg.norm(dup))
        if cos >= 0.9:
            rows.append((next_id, [float(x) for x in dup]))
            planted.add((i, next_id))
            next_id += 1
    assert len(planted) >= 30, "planting failed"
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b)
           for r in SIM.cosine_dup_pairs(df, threshold=0.9).collect()}
    exact = {(r.id_a, r.id_b)
             for r in SIM.cosine_dup_pairs(df, threshold=0.9, exact=True).collect()}
    assert got <= exact
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"multi-table recall {recall:.2f} < 0.9"


def test_ivf_topk_recall(spark, emb_np):
    """IVF with 8/32 probes must beat plain-bucket recall and carry
    exact cosines for every hit (32 cells, probe 8 -> ~25% of corpus
    scored per query). The k-means-refined quantizer must beat the
    raw hash-subsample quantizer at the same probe budget — the whole
    point of training the centroids (deterministic: hash-ordered
    sample, argmax ties to lowest index)."""
    e = Catalog(spark, SF_SMOKE).table("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = SIM.brute_force_topk(e, q, k=10).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}

    def recall(iters):
        approx = SIM.ivf_topk(e, q, k=10, n_cells=32, n_probe=8,
                              kmeans_iters=iters).collect()
        got = {(r.query_id, r.neighbor_id) for r in approx}
        return len(exact_set & got) / len(exact_set), approx

    r_seed, _ = recall(0)
    r_kmeans, approx = recall(4)
    assert r_kmeans >= 0.6, f"IVF recall {r_kmeans:.2f} too low"
    assert r_kmeans >= r_seed + 0.05, (
        f"k-means refinement didn't help: {r_kmeans:.2f} vs seed {r_seed:.2f}"
    )
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-9


def test_ivfpq_recall_and_rerank_monotonicity(spark):
    """IVF+PQ with exact re-rank must (a) reach usable recall vs
    brute force at n_probe=8/16 cells, and (b) never do worse than
    trusting the PQ scores alone (rerank=1 keeps the ADC top-k and
    merely re-scores it) — the re-rank stage is what buys back the
    quantization loss."""
    from pyspark.sql import functions as F

    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.pipeline import similarity as SIM

    from tests.conftest import SF_SMOKE

    e = Catalog(spark, SF_SMOKE).table("embeddings")
    q = e.filter(F.col("vec_id") < 8)
    bf = {(r["query_id"], r["neighbor_id"])
          for r in SIM.brute_force_topk(e, q, k=10).collect()}
    full = {(r["query_id"], r["neighbor_id"])
            for r in SIM.ivfpq_topk(e, q, k=10).collect()}
    pq_only = {(r["query_id"], r["neighbor_id"])
               for r in SIM.ivfpq_topk(e, q, k=10, rerank=1).collect()}
    r_full = len(bf & full) / len(bf)
    r_pq = len(bf & pq_only) / len(bf)
    assert r_full >= 0.6, f"IVFPQ recall {r_full:.2f} too low"
    assert r_full >= r_pq, (r_full, r_pq)
    # every query returns a full k and ranks are 1..k
    from collections import Counter
    counts = Counter(qid for qid, _ in full)
    assert all(v == 10 for v in counts.values())


def test_ivfpq_empty_corpus_returns_empty_frame(spark):
    """The empty-corpus guard the rest of the similarity family got
    in round 5 applies to IVF+PQ too (review finding): no numpy
    AxisError, just a typed empty result."""
    from pyspark.sql import types as T

    from mini_sql_engine_spark.pipeline import similarity as SIM

    empty = spark.createDataFrame([], T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]))
    out = SIM.ivfpq_topk(empty, empty, k=5)
    assert out.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert out.count() == 0
