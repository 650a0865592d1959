"""Materialization barrier for fan-out subplans.

Spark recomputes a shared subplan once PER CONSUMER: a self-join on a
derived DataFrame (fingerprints, LSH keys, inverted index) evaluates
the whole upstream pipeline for each side unless an identical exchange
gets reused — which canonicalization rarely grants across differently
-aliased join branches. For derived tables that are small relative to
their input (a 64-bit fingerprint per multi-KB document) the right
plan is: compute once, materialize, fan out.

``materialized`` uses ``localCheckpoint`` — executor-local blocks, no
lineage, computed exactly once and shared by every consumer in the
same action. On a real cluster local checkpoints don't survive
executor loss; a 100 TB run with long downstream stages should write
the derived table to durable storage instead (parquet + re-read),
which this helper models with ``path=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialized(df: DataFrame, path: str | None = None) -> DataFrame:
    """Force ``df`` to compute once and be re-read by all consumers.

    ``path=None`` → eager ``localCheckpoint`` (fast, non-resilient —
    fine for single-action fan-out). ``path=...`` → durable parquet
    round-trip (the cluster-grade variant for multi-hour pipelines).
    """
    if path is not None:
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint(eager=True)
