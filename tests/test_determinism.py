"""Determinism across physical layouts: the same query must produce
identical results when the shuffle partitioning, scan split size, and
AQE mode change — the properties that vary between local[32] and a
1000-executor cluster. Any divergence means an operator depends on
row order or partition boundaries (the rank/top-k/fingerprint ops are
the ones historically at risk — every order must carry a unique
tie-break key, SURVEY.md §7)."""

from __future__ import annotations

import pytest

from mini_sql_engine_spark.queries import QUERIES

from tests.conftest import SF_SMOKE

SENSITIVE = [
    "top_k",            # global order + limit
    "order_by",         # total order encoded as data
    "win_rank",         # per-key ranking
    "doc_fingerprint",  # window frames over exploded rows
    "dedup_near",       # LSH bucket join + distinct
    "sim_topk",         # per-query top-k with ties
    "asof_join",        # union + carry-forward window
    "corpus_clean",     # full pipeline composition
    "dedup_cc",         # iterative joins + per-round checkpoints (r4)
    "ntile_bucket",     # range-partitioned global rank (r4)
    "merge_upsert",     # broadcast-join + anti-join union branches (r4)
    "corpus_mix",       # content-hash sampling must ignore layout (r4)
]

LAYOUTS = [
    {"spark.sql.shuffle.partitions": "32",
     "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
     "spark.sql.adaptive.enabled": "true"},
    {"spark.sql.shuffle.partitions": "3",
     "spark.sql.files.maxPartitionBytes": str(256 * 1024),
     "spark.sql.adaptive.enabled": "false"},
]


def _rows(spark, qkey):
    df = QUERIES[qkey](spark, SF_SMOKE)
    return sorted(map(lambda r: tuple(str(v) for v in r), df.collect()))


@pytest.mark.parametrize("qkey", SENSITIVE)
def test_layout_invariance(spark, qkey):
    results = []
    saved = {k: spark.conf.get(k) for k in LAYOUTS[0]}
    try:
        for layout in LAYOUTS:
            for k, v in layout.items():
                spark.conf.set(k, v)
            results.append(_rows(spark, qkey))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert results[0] == results[1], (
        f"{qkey}: result depends on physical layout "
        f"({len(results[0])} vs {len(results[1])} rows)"
    )
