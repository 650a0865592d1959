#!/usr/bin/env python
"""Standing ~sf1 full-registry cross-engine sweep (VERDICT r8 #3).

Round 8's one-off sweep of all 339 contract keys against DuckDB on
the 10x blow-up found two wrong-answer modes the sf0.01 gate missed
(decile_lift's range-boundary ranks, DuckDB DECIMAL double-rounding).
This script makes that sweep a repeatable per-round gate:

  1. build the content-perturbed 10x dataset from sf0.1 into
     $SWEEP_OUT (default /tmp/sfscaled) if the marker is missing —
     same builder bench.py uses (scripts/stress_scale.build);
  2. drive the full queries()-vs-oracle_sql() contract at that scale
     (scripts/drive_contract.run — rowcount + sorted column names +
     order-insensitive value hash + the round driver's pandas canon);
  3. print the one-line summary BASELINE.md records each round and
     exit non-zero on any MISMATCH or ERR.

Usage: python scripts/sweep_scale.py [key ...]   # subset for re-checks
Env:   SWEEP_SRC (default /root/testdata/sf0.1), SWEEP_OUT, SWEEP_CPUS.

Expect ~25-45 min for the full registry at ~sf1 on local[8]; pass key
names to re-check just the operators you touched.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root
sys.path.insert(0, _HERE)  # sibling scripts

import drive_contract  # noqa: E402
import stress_scale  # noqa: E402

from mini_sql_engine_spark.session import get_spark  # noqa: E402


def main() -> int:
    src = os.environ.get("SWEEP_SRC", "/root/testdata/sf0.1")
    out = os.environ.get("SWEEP_OUT", "/tmp/sfscaled")
    cpus = int(os.environ.get("SWEEP_CPUS", "8"))
    copies = 10

    spark = get_spark(app_name="sweep-scale", cpus=cpus)
    marker = os.path.join(out, f".built_v4_{copies}")
    if not os.path.exists(marker):
        stress_scale.build(spark, src, out, copies)
        with open(marker, "w") as fh:
            fh.write("ok")
        print(f"built {copies}x data at {out}", file=sys.stderr)

    match, mismatch, err, rows_only = drive_contract.run(
        keys=sys.argv[1:], sf_dir=out, spark=spark)
    print(f"SWEEP ~sf1 ({copies}x of {src}): "
          f"match={match} mismatch={mismatch} err={err} "
          f"rows_only={rows_only}")
    return 1 if (mismatch or err) else 0


if __name__ == "__main__":
    sys.exit(main())
