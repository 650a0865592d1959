#!/usr/bin/env python
"""Standing full-registry cross-engine sweeps at ~sf1 and ~sf10
(VERDICT r8 #3, promoted to a two-decade gate by VERDICT r9 #1).

Round 8's one-off sweep of all 339 contract keys against DuckDB on
the 10x blow-up found two wrong-answer modes the sf0.01 gate missed
(decile_lift's range-boundary ranks, DuckDB DECIMAL double-rounding);
round 9's first ~sf1 run of THIS script found a third (the readStream
twins' IsADirectoryError on directory-shaped events tables). Every
scale decade added so far has surfaced a real defect — so the 100x
spot-check (28 keys in round 9) is now a full gate too:

  1. build the content-perturbed blow-up from sf0.1 into $SWEEP_OUT
     if the marker is missing (scripts/stress_scale.ensure_built —
     the same builder bench.py uses);
  2. drive the queries()-vs-oracle_sql() contract at that scale
     (scripts/drive_contract.run — rowcount + sorted column names +
     order-insensitive value hash + the round driver's pandas canon);
  3. print the one-line summary BASELINE.md records each round and
     exit non-zero on any MISMATCH or ERR.

At --copies 100 (lineitem 60M rows) the driven set is every
hash-checked key whose OUTPUT stays bounded as the fact tables grow;
keys whose output is itself fact-sized are enumerated explicitly in
EXCLUDE_100X below (driving them would collect 10M-60M rows into the
driver AND DuckDB — their third-decade evidence is the perf series,
their correctness evidence the ~sf1 sweep, where every one of them is
hash-green). Rows-only keys (no DuckDB oracle) are skipped at 100x as
well — there is nothing to cross-check.

Usage: python scripts/sweep_scale.py [--copies 10|100] [key ...]
Env:   SWEEP_SRC (default /root/testdata/sf0.1), SWEEP_OUT, SWEEP_CPUS.

Expect ~25-45 min for the full registry at ~sf1 on local[8]; pass key
names to re-check just the operators you touched.
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root
sys.path.insert(0, _HERE)  # sibling scripts

import drive_contract  # noqa: E402
import stress_scale  # noqa: E402

from mini_sql_engine_spark.session import get_spark  # noqa: E402

# Hash-checked keys whose OUTPUT is fact-sized — measured rows at the
# ~sf1 blow-up (10x of sf0.1) shown; at 100x they would be ~2.5M-300M
# row collects on BOTH engines. Cut line: >250k rows at ~sf1 (the
# kept worst cases — arg_max ~150k at ~sf1 -> 1.5M at 100x — were
# exercised in the round-9 spot-check and complete in minutes; the
# events-derived 100k-row keys don't grow at all because the blow-up
# leaves the events table unscaled, which keeps the three stream_*
# twins in the gate per VERDICT r9 #7). Their 100x evidence is the
# perf series (BENCH_SCALE100.json); their cross-engine hashes are
# green at every decade up to the ~sf1 sweep.
EXCLUDE_100X: dict[str, int] = {
    "theta_join": 29_725_400,
    "quantile_normalize": 6_000_000,
    "iqr_scale": 6_000_000,
    "iqr_scale_approx": 6_000_000,
    "win_count_distinct": 6_000_000,
    "math_funcs": 6_000_000,
    "scan_table": 6_000_000,
    "project_cols": 6_000_000,
    "project_expr": 6_000_000,
    "join3": 6_000_000,
    "filter_cmp": 2_402_630,
    "filter_or": 2_401_830,
    "filter_colcmp": 2_117_320,
    "right_join": 1_500_010,
    "left_join": 1_500_010,
    "target_encode_loo": 1_500_000,
    "scd2_history": 1_500_000,
    "bitwise_funcs": 1_500_000,
    "kv_parse": 1_500_000,
    "win_rank": 1_500_000,
    "win_dist": 1_500_000,
    "win_first_last": 1_500_000,
    "case_when": 1_500_000,
    "date_funcs": 1_500_000,
    "order_by": 1_500_000,
    "equi_join": 1_500_000,
    "rolling_median": 1_500_000,
    "interval_arith": 1_500_000,
    "filter_and": 1_082_450,
    "union_by_name": 998_110,
    "tfidf": 752_070,
    "feature_hashing": 604_150,
    "zscore_outliers": 457_370,
    "minhash_sig": 400_000,
    "unpivot_metrics": 400_000,
    "scalar_subquery": 374_300,
    "media_manifest": 371_074,
    "exists_ineq": 262_550,
}

# Keys whose CROSS-CHECK (not the Spark plan) is infeasible at the
# 100x blow-up — measured during the round-10 gate on a 125 GiB /
# 80 GiB-free box; every one of them is hash-green at the ~sf1 sweep
# and (where in the 65-key series) timed clean at 100x in
# BENCH_SCALE100.json:
#
# - or_join_union: quadratic BY CONSTRUCTION of the blow-up, on both
#   engines — the OR-join's nation disjunct keeps its fixed 25-key
#   domain while both sides grow 100x, so the pair intermediate grows
#   as copies^2 (~6e11 rows at 100x; Spark's shuffle for it filled
#   >70 GiB of disk twice). Real corpora grow the key domain with the
#   data; the union-of-hash-joins rewrite itself is the right plan.
# - dedup_cc / cluster_canonical / cluster_sizes / dedup_graph_stats:
#   the DuckDB twin computes connected components with a recursive
#   CTE, which holds the whole iteration table in memory (cannot
#   spill): OOM at the 12 GB cap with 32 GiB already spilled
#   (dedup_cc), >56 GiB of temp before dying (cluster_canonical).
#   The SPARK side of all four completes in 59-64 s at 100x
#   (BENCH_SCALE100.json) — it is the oracle that cannot scale.
# - minhash_est_quality: the oracle's exact-verification join spilled
#   past ~43 GiB of free disk in a solo drive.
ORACLE_INFEASIBLE_100X: dict[str, str] = {
    "or_join_union": "blow-up-quadratic pair intermediate (~6e11 rows)",
    "dedup_cc": "DuckDB recursive-CTE CC: OOM at 12GB cap, 32GB spilled",
    "cluster_canonical": "DuckDB recursive-CTE CC: >56GB temp, disk-full",
    "cluster_sizes": "DuckDB recursive-CTE CC (same oracle shape)",
    "dedup_graph_stats": "DuckDB recursive-CTE CC: disk-full twice",
    "minhash_est_quality": "oracle exact-verify join spills >43GB",
}


def _raise_map_count(target: int = 262144) -> None:
    """The 100x oracles need more than the kernel's default
    vm.max_map_count=65530: DuckDB's bundled jemalloc retains virtual
    ranges instead of unmapping (retain:true on Linux), so a
    string-agg working set in the tens of GB accumulates >65k
    mappings and 256 KiB allocations start dying with std::bad_alloc
    / pthread EAGAIN while 100+ GiB of RAM sit free (measured:
    boilerplate_strip at 100x pins /proc/<pid>/maps at exactly 65530
    then aborts). Same knob Elasticsearch documents; best-effort —
    non-root boxes get a warning and the small-SF drives are
    unaffected."""
    path = "/proc/sys/vm/max_map_count"
    try:
        cur = int(open(path).read())
        if cur < target:
            open(path, "w").write(str(target))
            print(f"raised vm.max_map_count {cur} -> {target}",
                  file=sys.stderr)
    except (OSError, ValueError) as e:
        print(f"WARNING: could not raise vm.max_map_count ({e}); "
              "100x string-heavy oracles may abort with bad_alloc",
              file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*",
                    help="subset of Qkeys to re-check (default: all)")
    ap.add_argument("--copies", type=int, default=10, choices=(10, 100))
    args = ap.parse_args()

    src = os.environ.get("SWEEP_SRC", "/root/testdata/sf0.1")
    default_out = "/tmp/sfscaled" if args.copies == 10 else "/tmp/sfscaled100"
    out = os.environ.get("SWEEP_OUT", default_out)
    cpus = int(os.environ.get("SWEEP_CPUS", "8"))

    spark = get_spark(app_name="sweep-scale", cpus=cpus)
    stress_scale.ensure_built(spark, src, out, args.copies)

    if args.copies == 100:
        _raise_map_count()

    keys = args.keys
    if not keys and args.copies == 100:
        import __spark_entry__ as E
        oracles = E.oracle_sql()
        keys = [k for k in E.queries() if k in oracles
                and k not in EXCLUDE_100X
                and k not in ORACLE_INFEASIBLE_100X]
        print(f"100x gate: driving {len(keys)} hash-checked keys "
              f"({len(EXCLUDE_100X)} fact-sized-output and "
              f"{len(ORACLE_INFEASIBLE_100X)} oracle-infeasible keys "
              f"excluded, rows-only keys skipped)", file=sys.stderr)

    match, mismatch, err, rows_only = drive_contract.run(
        keys=keys, sf_dir=out, spark=spark)
    print(f"SWEEP ~sf{args.copies // 10} ({args.copies}x of {src}): "
          f"match={match} mismatch={mismatch} err={err} "
          f"rows_only={rows_only}")
    return 1 if (mismatch or err) else 0


if __name__ == "__main__":
    sys.exit(main())
