"""Sequence packing + chunking invariants (pipeline/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_sql_engine_spark.catalog import Catalog
from mini_sql_engine_spark.pipeline.packing import chunk_documents, pack_sequences
from tests.conftest import SF_SMOKE

M = 128


def test_pack_sequences_matches_python_prefix_sum(spark):
    docs = Catalog(spark, SF_SMOKE).table("documents")
    got = {r.doc_id: r for r in pack_sequences(docs, max_tokens=M).collect()}
    rows = sorted(
        (r.doc_id, len([t for t in r.text.split(" ") if t]))
        for r in docs.select("doc_id", "text").collect()
    )
    cum = 0
    for doc_id, n in rows:
        r = got[doc_id]
        assert r.n_tokens == n
        assert r.pack_id == cum // M
        assert r.pack_offset == cum % M
        cum += n
    assert len(got) == len(rows)


def test_pack_sequences_offsets_in_range(spark):
    docs = Catalog(spark, SF_SMOKE).table("documents")
    bad = pack_sequences(docs, max_tokens=M).filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= M)
        | (F.col("pack_id") < 0)
    )
    assert bad.count() == 0


def test_pack_prefix_sum_plan_has_no_data_scale_funnel(spark):
    """The only single-partition exchange may feed the O(P) offsets
    branch (one row per partition), never the document stream: the
    data side must go through repartitionByRange, and the per-doc
    cumsum window partitions by _pid."""
    plan = pack_sequences(
        Catalog(spark, SF_SMOKE).table("documents"), max_tokens=M
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    # the per-row window is keyed by partition id, not global
    assert "partitionBy" not in plan or "Window" in plan
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    data_side = [w for w in windows if "_local" in w]
    assert data_side and all("_pid" in w for w in data_side), windows


def test_chunk_documents_covers_every_token_with_overlap(spark):
    docs = Catalog(spark, SF_SMOKE).table("documents")
    chunks = chunk_documents(docs, chunk_tokens=32, stride=24).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        n = rs[0].n_tokens
        assert [r.chunk_id for r in rs] == list(range(len(rs)))
        assert rs[0].chunk_start == 0
        assert rs[-1].chunk_end == n  # full coverage
        for a, b in zip(rs, rs[1:]):
            assert b.chunk_start == a.chunk_start + 24
            assert b.chunk_start < a.chunk_end  # 8-token overlap
        for r in rs:
            assert r.chunk_end - r.chunk_start <= 32
        # no chunk fully contained in the previous one (stride < chunk
        # guarantees progress)
        assert all(b.chunk_end > a.chunk_end for a, b in zip(rs, rs[1:]))


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [(1, "just five ws tokens here"), (2, "a b")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=32, stride=24).collect(),
        key=lambda r: r.doc_id,
    )
    assert [(r.doc_id, r.chunk_id, r.chunk_start, r.chunk_end) for r in rows] \
        == [(1, 0, 0, 5), (2, 0, 0, 2)]
