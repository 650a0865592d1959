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


def spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy per-row kernels
    (optimization guide §2: derive partitioning from the input, never
    from a local constant).

    A parquet scan's task count is bounded by its file/row-group
    layout: a small input (one file, one row group) plans as ONE task,
    and every per-row kernel upstream of the first exchange — shingle
    explosion, per-seed MinHash md5s, bigram builds — then runs on one
    core no matter how many the session has. At real scale the scan
    has thousands of splits and this helper is a NO-OP (the planned
    partition count already meets the session's parallelism); below
    that it inserts one round-robin exchange whose cost is
    proportional to the (small, by construction) input.

    The check reads the PLANNED partitioning (driver-side only — no
    job runs); the target is ``sparkContext.defaultParallelism``, so
    the decision scales with the session rather than hard-coding any
    local core count.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # non-queryable plan (e.g. streaming) — leave it
        return df
    if current >= target:
        return df
    return df.repartition(target)
