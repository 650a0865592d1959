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

At --copies 100 (lineitem 60M rows) EVERY hash-checked key is driven
(VERDICT r10 #1/#3):

- bounded-output keys: the full collect-and-compare contract;
- fact-sized-output keys (CHECKSUM_100X below — driving them would
  collect 10M-60M rows into the driver): the engine-side checksum
  fold (drive_contract.spark_checksum / duck_checksum) — BOTH
  engines reduce their own result to one (count, fold1, fold2) row
  over the portable row-rendering canon, so nothing is collected;
- the CC family (CC_KEYS_100X): DuckDB's recursive-CTE closure
  cannot spill and OOMs at this decade, so the 100x oracle swaps
  ONLY the closure — DuckDB still computes the edge list
  independently (the same pair SQL its own dedup_ngram oracle runs
  green in this gate), a python union-find closes it, and the
  relational tail runs in DuckDB over the resulting ``cc_labels``
  temp table.

Rows-only keys (no DuckDB oracle) are skipped at 100x — there is
nothing to cross-check.

Usage: python scripts/sweep_scale.py [--copies 10|100] [key ...]
Env:   SWEEP_SRC (default /root/testdata/sf0.1), SWEEP_OUT, SWEEP_CPUS.

Expect ~25-45 min for the full registry at ~sf1 on local[8]; pass key
names to re-check just the operators you touched.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root
sys.path.insert(0, _HERE)  # sibling scripts

import drive_contract  # noqa: E402
import stress_scale  # noqa: E402

from mini_sql_engine_spark.session import get_spark  # noqa: E402

# Hash-checked keys whose OUTPUT is fact-sized — measured rows at the
# ~sf1 blow-up (10x of sf0.1) shown; at 100x they would be ~2.5M-300M
# row collects on BOTH engines, so they are driven with the
# ENGINE-SIDE CHECKSUM compare instead of the full collect (VERDICT
# r10 #1 — both engines fold their own result to one count+hash row;
# the fold work is linear and streams, nothing is materialized).
# Cut line for membership: >250k output rows at ~sf1 (the kept worst
# cases — arg_max ~150k at ~sf1 -> 1.5M at 100x — complete in
# minutes under the full compare; the events-derived 100k-row keys
# don't grow at all because the blow-up leaves the events table
# unscaled, which keeps the three stream_* twins in the full-compare
# set per VERDICT r9 #7).
CHECKSUM_100X: dict[str, int] = {
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
# 100x blow-up.  EMPTY since round 12: the last entry
# (minhash_est_quality, "oracle exact-verify join spills >43GB") was
# closed by bounding the ORACLE's exact-Jaccard verify to candidate
# docs — the same semi-join the Spark plan already applies, so the
# output is value-identical (oracles.py).  Round 11 closed the r10
# entries: the CC family moved to the union-find oracle
# (CC_KEYS_100X), or_join_union re-entered the full set once the
# blow-up's nation-key domain scaled with the data (stress_scale
# v5), and dedup_graph_stats re-ran clean solo.  Kept as a dict so
# the gate print and the keys filter stay honest if a future decade
# ever needs an entry.
ORACLE_INFEASIBLE_100X: dict[str, str] = {}

# The CC family at 100x (VERDICT r10 #3): DuckDB computes the EDGES
# independently (same pair SQL the green dedup_ngram oracle runs),
# python union-find computes the closure, the relational tail runs in
# DuckDB over the cc_labels temp table.  cluster_canonical's output
# is one row per cluster INCLUDING singletons (~5M at 100x) so it
# compares via checksum; the other two outputs are tiny.
CC_EDGES_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) >= 0.6
"""

CC_ORACLE_100X: dict[str, str] = {
    "dedup_cc": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_rep AS BIGINT) AS cluster_rep
FROM cc_labels
""",
    "cluster_sizes": """
WITH per_cluster AS (
  SELECT cluster_rep, count(*) AS cluster_size
  FROM cc_labels GROUP BY cluster_rep
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM per_cluster GROUP BY cluster_size
""",
    "cluster_canonical": """
WITH lab AS (
  SELECT d.doc_id, coalesce(r.cluster_rep, d.doc_id) AS cluster, d.n_chars
  FROM documents d LEFT JOIN cc_labels r USING (doc_id)
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY cluster
                               ORDER BY n_chars DESC, doc_id) AS rnk
  FROM lab
)
SELECT cluster,
       max(CASE WHEN rnk = 1 THEN doc_id END) AS canonical_doc,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(n_chars) AS max_chars
FROM rk GROUP BY cluster
""",
    # dedup_graph_stats has NO recursion, but its original oracle's
    # scalar subqueries make DuckDB evaluate the giant pairs-join CTE
    # several times concurrently — measured >56 GiB of spill before
    # disk-full at 100x (r10, reproduced solo in r11). The gate
    # oracle runs the identical stats over the ONCE-materialized
    # cc_edges temp table (the same edge SQL the union-find oracle
    # fetches — one pass, 85 s, no spill blow-up).
    "dedup_graph_stats": """
WITH deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT doc_a AS v FROM cc_edges
        UNION ALL SELECT doc_b FROM cc_edges)
  GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM cc_edges) AS BIGINT) AS n_edges,
       CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
       (SELECT CAST(CAST(sum(d) AS VARCHAR) AS DOUBLE) / count(*) FROM deg)
         AS mean_degree
""",
}
CC_KEYS_100X = tuple(CC_ORACLE_100X)


def union_find(edges):
    """Plain-python connected components — the independent closure
    oracle for the CC family (min reachable node per node)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root is the component's min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def register_cc_labels(con):
    """con_setup hook: edges from DuckDB (ONE materialized pass),
    closure in python, cc_labels + cc_edges temp tables for the
    CC_ORACLE_100X tails."""
    t0 = time.time()
    edges = con.execute(CC_EDGES_SQL).fetchall()
    labels = union_find(edges)
    import pandas as pd
    epdf = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    con.register("_cc_edges_src", epdf)
    con.execute("CREATE OR REPLACE TEMP TABLE cc_edges AS "
                "SELECT CAST(doc_a AS BIGINT) AS doc_a, "
                "CAST(doc_b AS BIGINT) AS doc_b FROM _cc_edges_src")
    pdf = pd.DataFrame(
        sorted(labels.items()), columns=["doc_id", "cluster_rep"])
    con.register("_cc_labels_src", pdf)
    con.execute("CREATE OR REPLACE TEMP TABLE cc_labels AS "
                "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
                "CAST(cluster_rep AS BIGINT) AS cluster_rep "
                "FROM _cc_labels_src")
    print(f"cc_labels: {len(edges)} edges -> {len(labels)} labeled "
          f"nodes in {time.time()-t0:.1f}s (union-find oracle)",
          file=sys.stderr)


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
    checksum_keys: set[str] = set()
    oracle_overrides: dict[str, str] = {}
    con_setup = None
    if args.copies == 100:
        import __spark_entry__ as E
        oracles = E.oracle_sql()
        if not keys:
            keys = [k for k in E.queries() if k in oracles
                    and k not in ORACLE_INFEASIBLE_100X]
        # fact-sized outputs compare via the engine-side checksum fold
        checksum_keys = {k for k in keys if k in CHECKSUM_100X
                         or k == "cluster_canonical"}
        if any(k in CC_KEYS_100X for k in keys):
            oracle_overrides = CC_ORACLE_100X
            con_setup = register_cc_labels
        n_full = len(keys) - len(checksum_keys)
        print(f"100x gate: driving {len(keys)} hash-checked keys "
              f"({n_full} full-compare, {len(checksum_keys)} checksum, "
              f"{len([k for k in keys if k in CC_KEYS_100X])} via the "
              f"union-find CC oracle; "
              f"{len(ORACLE_INFEASIBLE_100X)} oracle-infeasible keys "
              f"excluded, rows-only keys skipped)", file=sys.stderr)

    match, mismatch, err, rows_only = drive_contract.run(
        keys=keys, sf_dir=out, spark=spark,
        oracle_overrides=oracle_overrides, con_setup=con_setup,
        checksum_keys=checksum_keys,
        # pandas-canon twin off at 100x only: it RE-EXECUTES both
        # engines per key, and what it checks (stringification canon)
        # is schema-determined — proven for every key at three
        # smaller scales where the twin stays on
        pandas_twin=(args.copies != 100))
    print(f"SWEEP ~sf{args.copies // 10} ({args.copies}x of {src}): "
          f"match={match} mismatch={mismatch} err={err} "
          f"rows_only={rows_only}")
    return 1 if (mismatch or err) else 0


if __name__ == "__main__":
    sys.exit(main())
