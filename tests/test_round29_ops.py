"""Round-10 verification surface (VERDICT r9): the large-star/
small-star CC candidate must produce the EXACT labeling of the
shipped min-label propagation (same clusters, different iteration
schedule), the `quantile_normalize_approx` at-scale swap needs its
tolerance certificate against the exact key, the oracle cap
constants must stay single-sourced (r9 #8), and the stream staging
dir must track source mtime/size (ADVICE r9)."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog
from mini_sql_engine_spark.pipeline import dedup as DD
from mini_sql_engine_spark.pipeline import graph as GR

from tests.conftest import SF_CORRECTNESS, SF_SMOKE


# ──────────────── large-star / small-star candidate ────────────────


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


@pytest.mark.parametrize("edges", [
    [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (22, 21), (20, 22)],
    [(5, 5), (6, 7), (7, 6), (6, 7)],
    [(i, i + 1) for i in range(25)],            # adversarial chain
    [(0, k) for k in range(1, 20)],             # star already
    [(2 * k, 2 * k + 1) for k in range(12)],    # many 2-cliques
])
def test_star_cc_matches_min_label(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    expect = _labels(GR.connected_components(df))
    got = _labels(GR.connected_components_star(df))
    assert got == expect


def test_star_cc_matches_on_real_pair_graph(spark):
    """The faceoff's correctness premise, pinned in CI: on the actual
    dedup_cc pair graph (3-gram Jaccard, threshold 0.6) both
    algorithms emit the identical (node, component) set."""
    docs = Catalog(spark, SF_SMOKE).table("documents")
    pairs = DD.ngram_jaccard_pairs_capped(
        docs, n=3, threshold=0.6).select("doc_a", "doc_b")
    expect = _labels(GR.connected_components(pairs))
    got = _labels(GR.connected_components_star(pairs))
    assert expect  # non-degenerate corpus: the graph has edges
    assert got == expect


def test_star_cc_rounds_instrumented(spark):
    """LAST_ROUNDS is the per-decade O(log d) evidence channel
    (cc_faceoff logs it into BENCH_SCALE100.json): both algorithms
    must record their convergence round count, and a 25-node chain
    must close within a logarithmic budget for both."""
    chain = [(i, i + 1) for i in range(24)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    GR.connected_components(df)
    GR.connected_components_star(df)
    assert 1 <= GR.LAST_ROUNDS["min_label"] <= 8
    assert 1 <= GR.LAST_ROUNDS["star"] <= 10


def test_star_cc_raises_instead_of_partial_labels(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(24)],
                               ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="no convergence"):
        GR.connected_components_star(df, max_rounds=1)


# ──────────────── quantile_normalize approx certificate ────────────────


def qn_error_stats(spark, sf_dir):
    """Per-row |qnorm_approx − qnorm_exact| without a row join: the
    synthetic lineitem's (l_orderkey, l_linenumber) is NOT unique, but
    within each (g, v) group both outputs are monotone in the shared
    within-group rank — so sorting each group's qnorm multiset aligns
    the rows positionally and zip_with yields the exact per-row
    errors. ≤150 groups (3 flags × 50 quantities), bounded state."""
    def packed(df, name):
        return df.groupBy("g", "v").agg(
            F.count(F.lit(1)).alias("n_" + name),
            F.sort_array(F.collect_list("qnorm_v")).alias(name))
    j = packed(Q.quantile_normalize(spark, sf_dir), "e").join(
        packed(Q.quantile_normalize_approx(spark, sf_dir), "a"),
        ["g", "v"], "full")
    return j.select(
        "n_e", "n_a",
        F.zip_with("e", "a", lambda x, y: F.abs(x - y)).alias("d")
    ).agg(
        F.sum(F.when(F.col("n_e") == F.col("n_a"), 0).otherwise(1))
        .alias("bad_groups"),
        F.max(F.array_max("d")).alias("max_abs_err"),
        (F.sum(F.aggregate("d", F.lit(0.0), lambda a, x: a + x))
         / F.sum("n_e")).alias("mean_abs_err"),
        F.sum("n_e").alias("rows"),
    ).first()


def test_quantile_normalize_approx_certificate(spark):
    """Against the exact key at sf0.01: the broadcast-grid swap must
    cover the identical row universe, stay within one adjacent order
    statistic of the exact target distribution (l_quantity's 50-value
    lattice ⇒ adjacent order statistics differ by ≤ 1.0), and be
    exact for almost all rows (mean |Δ| ≤ 0.05; measured 0.006 —
    grid quantization only touches rows that round across a value
    boundary)."""
    stats = qn_error_stats(spark, SF_CORRECTNESS)
    assert stats["bad_groups"] == 0  # same (g, v) row universe
    assert stats["max_abs_err"] <= 1.0
    assert stats["mean_abs_err"] <= 0.05


# ──────────────── oracle cap constants stay single-sourced ────────────────


def test_oracle_caps_not_hardcoded():
    """r8's ADVICE fix (interpolate KNN_QUERY_CAP into the oracles
    from the one shared constant) must not regress: oracles.py keeps
    the f-string interpolation sites and carries NO literal
    `LIMIT <cap-value>` clause that would silently diverge if the
    constant changes (VERDICT r9 #8)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(
        root, "mini_sql_engine_spark", "oracles.py")).read()
    code = "\n".join(ln for ln in src.splitlines()
                     if not ln.lstrip().startswith("#"))
    assert code.count("{KNN_QUERY_CAP}") >= 2
    assert not re.search(rf"LIMIT\s+{Q.KNN_QUERY_CAP}\b", code)
    # the queries-side constants exist and hold their documented values
    assert Q.KNN_QUERY_CAP == 128
    assert Q.DEDUP_EVAL_DOC_CAP == 5000


# ──────────────── stream staging tracks the source file ────────────────


def test_stream_events_stage_tracks_source_mtime(tmp_path):
    """A regenerated single-file events.parquet must get a FRESH
    staging dir (ADVICE r9: the old tag keyed only on sf_dir, so a
    rewritten source silently streamed the stale copy)."""
    sf = tmp_path / "sfx"
    sf.mkdir()
    src = sf / "events.parquet"
    src.write_bytes(b"v1-bytes")
    stage1 = Q._stream_events_dir(str(sf))
    assert open(os.path.join(stage1, "events.parquet"), "rb").read() \
        == b"v1-bytes"
    # regenerate with different size (and mtime) — must re-stage
    src.write_bytes(b"v2-bytes-longer")
    stage2 = Q._stream_events_dir(str(sf))
    assert stage2 != stage1
    assert open(os.path.join(stage2, "events.parquet"), "rb").read() \
        == b"v2-bytes-longer"
    # directory-shaped events tables stream in place, no staging
    d = tmp_path / "sfdir"
    (d / "events.parquet").mkdir(parents=True)
    assert Q._stream_events_dir(str(d)) == str(d / "events.parquet")
