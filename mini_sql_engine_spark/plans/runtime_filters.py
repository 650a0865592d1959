"""Runtime bloom-filter join pruning — row-level semi-join filtering.

At 100 TB the dominant join cost is scanning + shuffling probe-side
rows that will never find a match. Static partition pruning can't help
when the filter is on a *non-partition* column of the other table.
Spark's runtime filter optimization (`InjectRuntimeFilter`, 3.3+)
fixes this: when one join side carries a selective predicate, Catalyst
adds a subquery that builds a bloom filter over that side's join keys
(`bloom_filter_agg`) and wraps the probe side's scan in
`BloomFilterMightContain`, dropping non-matching rows BEFORE the
shuffle. The probe side then shuffles only rows that can join — on a
1000-executor cluster this is the difference between exchanging the
full fact table and exchanging the ~matching fraction.

Spark only injects the filter when it estimates it pays off:
- creation side ≤ `...bloomFilter.creationSideThreshold` (10 MB
  default — the filter build is a broadcast-like cost), and
- application side ≥ `...applicationSideScanSizeThreshold` (10 GB
  default — below that the scan is cheap enough anyway).

Those defaults are exactly right for a real cluster, which is why
`session.py` doesn't override them: at sf0.1 locally nothing crosses
10 GB, so the optimization is dormant in tests unless
``demo_thresholds=True`` lowers the gate (what ``tests/test_plans.py``
does to pin the plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
}

_DEMO_CONFS = {
    # let the optimization fire on KB-scale local data so its plan
    # shape is testable; never set these on a real cluster
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def enable_runtime_filters(spark: SparkSession, demo_thresholds: bool = False) -> dict[str, str | None]:
    """Turn on runtime bloom-filter injection (it is on by default in
    4.x; this pins it explicitly). Returns the previous values of every
    conf touched so a caller/test can restore them."""
    confs = dict(_CONFS)
    if demo_thresholds:
        confs.update(_DEMO_CONFS)
    prev: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def restore_confs(spark: SparkSession, prev: dict[str, str | None]) -> None:
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def bloom_filter_nodes(df: DataFrame) -> list[str]:
    """Lines of the optimized logical plan that build or apply a
    runtime bloom filter (`bloom_filter_agg` / `might_contain`)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [
        ln.strip()
        for ln in plan.splitlines()
        if "bloom_filter_agg" in ln or "might_contain" in ln
    ]
