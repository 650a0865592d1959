#!/usr/bin/env python
"""Benchmark: run every contract Qkey at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on one warm local[$SPARK_GRAFT_CPUS] session and
print ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {qkey: sec, ...}, "sf": <sf>}

Execution is forced with a noop-format write (full pipeline runs on
executors, nothing is collected to the driver) — the honest way to
time a distributed plan. JVM/session warm-up is excluded via a
throwaway warm-up query (BASELINE.md note).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from mini_sql_engine_spark.queries import QUERIES  # noqa: E402
from mini_sql_engine_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    """Execute the full plan without materializing on the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="mini_sql_engine_spark-bench")

    # warm up JVM / codegen / parquet footer caches
    force(QUERIES["group_agg"](spark, sf_dir))

    # min of two runs per query: one-off JVM GC pauses / Python-worker
    # pool spin-up otherwise attribute multi-second noise to whichever
    # query they land on (observed: 11 s on a 0.7 s query).
    timings: dict[str, float] = {}
    for qkey in sorted(QUERIES):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(QUERIES[qkey](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[qkey] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "qkey_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
