#!/usr/bin/env python
"""Head-to-head: exact `quantile_normalize` (two full-fact
distributed ranks + a fact-sized rank-index join) vs
`quantile_normalize_approx` (one exact within-group rank + a
broadcast percentile_approx grid) at the 10x and 100x blow-ups
(VERDICT r9 #4).

Also measures the realized approximation error at 10x — max and mean
|qnorm_approx - qnorm_exact| over every row — so the keep/reject
entry in BASELINE.md carries the accuracy alongside the speed.

Usage: python scripts/qn_faceoff.py [--skip-100x]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import stress_scale  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from bench import timed_min  # noqa: E402
from mini_sql_engine_spark import queries as Q  # noqa: E402
from mini_sql_engine_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-100x", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="qn-faceoff")
    src = os.environ.get("SWEEP_SRC", "/root/testdata/sf0.1")
    scales = [("10x", "/tmp/sfscaled", 10)]
    if not args.skip_100x:
        scales.append(("100x", "/tmp/sfscaled100", 100))

    out: dict = {"mode": "qn_faceoff", "timings": {}}
    for tag, sf_dir, copies in scales:
        stress_scale.ensure_built(spark, src, sf_dir, copies)
        for name, fn in (("exact", Q.quantile_normalize),
                         ("approx", Q.quantile_normalize_approx)):
            stress_scale.settle_jvm(spark)
            out["timings"].setdefault(tag, {})[name] = timed_min(
                lambda: fn(spark, sf_dir).write.format("noop")
                .mode("overwrite").save())

    # realized error at 10x (sorted-multiset alignment per (g, v) —
    # see tests/test_round29_ops.qn_error_stats for why not a row join)
    from tests.test_round29_ops import qn_error_stats
    err = qn_error_stats(spark, "/tmp/sfscaled")
    out["error_at_10x"] = {"rows": err["rows"],
                           "bad_groups": err["bad_groups"],
                           "max_abs_err": err["max_abs_err"],
                           "mean_abs_err": round(err["mean_abs_err"], 6)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
