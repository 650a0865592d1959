#!/usr/bin/env python
"""Head-to-head: min-label-propagation CC vs large-star/small-star
(Kiveris et al., SoCC'14) on the real dedup pair graph, at the 10x
and 100x blow-ups (VERDICT r9 #2).

The CC family (dedup_cc / cluster_canonical / cluster_sizes) is the
registry's biggest absolute cost at 100x (59-64 s in-series) and
measured exactly linear per decade — this script answers "is the
iteration schedule the best one?" with data instead of citation:

  1. generate the EXACT dedup_cc pair graph (the df-capped 3-gram
     Jaccard inverted index, threshold 0.6) once per scale and
     materialize it to parquet, so both algorithms are timed on
     identical, pre-computed edges (pair generation — common to both
     — is excluded from the comparison);
  2. time each algorithm min-of-2 with a JVM settle between runs
     (stress_scale.settle_jvm), record rounds-to-convergence
     (pipeline.graph.LAST_ROUNDS) per decade;
  3. cross-check the two labelings are IDENTICAL at 10x (hash of the
     sorted (node, component) set) — same clusters, different
     iteration schedule, as the verdict requires;
  4. print one JSON line; the keep/reject decision and the loser's
     numbers go into BASELINE.md.

Usage: python scripts/cc_faceoff.py [--skip-100x]
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
from mini_sql_engine_spark.catalog import Catalog  # noqa: E402
from mini_sql_engine_spark.pipeline import dedup as DD  # noqa: E402
from mini_sql_engine_spark.pipeline import graph as GR  # noqa: E402
from mini_sql_engine_spark.session import get_spark  # noqa: E402

ALGOS = {
    "min_label": GR.connected_components,
    "star": GR.connected_components_star,
}


def pairs_path(spark, sf_dir: str, tag: str) -> str:
    out = f"/tmp/cc_faceoff_pairs_{tag}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = Catalog(spark, sf_dir).table("documents")
        (DD.ngram_jaccard_pairs_capped(docs, n=3, threshold=0.6)
         .select("doc_a", "doc_b")
         .write.mode("overwrite").parquet(out))
        print(f"materialized pair graph for {sf_dir} -> {out}",
              file=sys.stderr)
    return out


def labeling_hash(df) -> tuple[int, int]:
    r = df.agg(F.count(F.lit(1)),
               F.bit_xor(F.xxhash64("node", "component"))).first()
    return (r[0], r[1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-100x", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="cc-faceoff")
    src = os.environ.get("SWEEP_SRC", "/root/testdata/sf0.1")
    scales = [("10x", "/tmp/sfscaled", 10)]
    if not args.skip_100x:
        scales.append(("100x", "/tmp/sfscaled100", 100))

    out: dict = {"mode": "cc_faceoff", "timings": {}, "rounds": {},
                 "labelings_identical": None}
    for tag, sf_dir, copies in scales:
        stress_scale.ensure_built(spark, src, sf_dir, copies)
        pp = pairs_path(spark, sf_dir, tag)
        pairs = spark.read.parquet(pp)
        n_edges = pairs.count()
        out.setdefault("n_edges", {})[tag] = n_edges
        for name, fn in ALGOS.items():
            stress_scale.settle_jvm(spark)
            out["timings"].setdefault(tag, {})[name] = timed_min(
                lambda: fn(pairs).write.format("noop")
                .mode("overwrite").save())
            out["rounds"].setdefault(tag, {})[name] = GR.LAST_ROUNDS[
                "min_label" if name == "min_label" else "star"]
        if tag == "10x":
            h = {n: labeling_hash(f(pairs)) for n, f in ALGOS.items()}
            out["labelings_identical"] = (h["min_label"] == h["star"])
            if not out["labelings_identical"]:
                print(f"LABELING MISMATCH: {h}", file=sys.stderr)
    print(json.dumps(out))
    return 0 if out["labelings_identical"] else 1


if __name__ == "__main__":
    sys.exit(main())
