"""Registry rotation hygiene (VERDICT r3 ask #6).

The round driver records at most the first 50 ``queries()`` entries in
``CORRECTNESS_r{N}.json``.  The rotation invariant is: every
hash-checked key (has a DuckDB oracle) that LACKS a green row in the
committed artifacts must sit in the front-50, so the next driver run
gives it a real row.  A reorder that silently re-tests already-green
keys while new keys starve fails here.
"""

from __future__ import annotations

import glob
import json
import os

from mini_sql_engine_spark.oracles import ORACLES
from mini_sql_engine_spark.queries import QUERIES

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50


def _green_keys() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            artifact = json.load(fh)
        for key, row in artifact.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            ):
                green.add(key)
    return green


def test_ungreen_hash_checked_keys_form_contiguous_registry_prefix():
    """All hash-checked keys lacking a green driver row must precede
    every green key in the registry, so the 50-entry driver cap never
    wastes a slot re-testing a green key while an ungreen one
    starves.  (When more than 50 keys are ungreen — a round that adds
    operators beyond the cap — the overflow queues contiguously right
    after position 50 and rotates in next round.)"""
    green = _green_keys()
    order = list(QUERIES)
    ungreen = {k for k in ORACLES if k not in green}
    if not ungreen:
        return
    last_ungreen = max(order.index(k) for k in ungreen)
    misplaced = sorted(
        k for k in order[:last_ungreen] if k in ORACLES and k in green
    )
    assert not misplaced, (
        f"green hash-checked keys sit ahead of ungreen ones "
        f"(driver cap {DRIVER_CAP} would starve them): {misplaced}"
    )


def test_every_query_key_has_oracle_or_is_declared_rows_only():
    # every oracle key must exist in the registry (no dangling SQL)
    dangling = sorted(set(ORACLES) - set(QUERIES))
    assert not dangling, f"oracles without queries: {dangling}"


def test_hash_checked_outputs_use_driver_safe_types_only(spark):
    """Driver-canon output-type discipline (VERDICT r5 root cause,
    widened to the FULL registry in r8 after ``pq_encode`` — a
    rows-only key — crashed the driver's pandas canonicalizer with
    an ARRAY cell in r7): the round driver lowers every result set,
    hash-checked or not, to pandas and sorts cells, so a Spark
    DECIMAL ("115906.00") vs DuckDB float64 ("115906.0") mismatches
    on every trailing-zero value, DATE vs TIMESTAMP stringify
    differently, and ARRAY/MAP cells crash pandas sort_values.
    Every ``queries()`` entry must therefore emit only DOUBLE /
    integral / STRING / BOOLEAN / TIMESTAMP columns (timestamps and
    booleans are proven safe by green rows).  Array-valued internals
    (signatures, embeddings, PQ codes) stay on the pipeline-layer
    functions; the Qkey surface joins them to strings.  Plan-only —
    schemas resolve without executing a single job."""
    from pyspark.sql import types as T

    banned = (T.DecimalType, T.DateType, T.ArrayType, T.MapType,
              T.BinaryType, T.StructType)
    offenders = []
    for key, fn in QUERIES.items():
        schema = fn(spark, SF_SMOKE).schema
        for field in schema.fields:
            if isinstance(field.dataType, banned):
                offenders.append(
                    f"{key}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "driver-hostile output types in registry keys "
        f"(pandas canon would red them): {offenders}"
    )


def test_registry_is_large_enough_to_need_rotation():
    # guards against an accidental truncation of the registry itself
    # (floors trail the actual counts — 264/246 as of round 5 — by a
    # small margin so a deliberate key retirement doesn't break CI)
    assert len(QUERIES) >= 260
    assert len(ORACLES) >= 242


def test_100x_gate_key_lists_reference_real_hash_checked_keys():
    """The 100x gate's key lists (checksum-compared fact-sized
    outputs, oracle-infeasible cross-checks, the union-find CC
    family) must name only keys that exist in the registry AND have a
    DuckDB oracle — otherwise an entry silently stops applying when a
    key is renamed, and the gate either re-runs a known-infeasible
    oracle or (worse) reports a smaller driven set than BASELINE.md
    records."""
    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from sweep_scale import (CC_ORACLE_100X, CHECKSUM_100X,
                             ORACLE_INFEASIBLE_100X)

    import __spark_entry__ as E
    queries, oracles = E.queries(), E.oracle_sql()
    for name, lst in (("CHECKSUM_100X", CHECKSUM_100X),
                      ("ORACLE_INFEASIBLE_100X", ORACLE_INFEASIBLE_100X),
                      ("CC_ORACLE_100X", CC_ORACLE_100X)):
        for k in lst:
            assert k in queries, f"{name} names unknown key {k!r}"
            assert k in oracles, (
                f"{name} names rows-only key {k!r} — rows-only keys "
                "are already skipped at 100x, the entry is dead")
    overlap = set(CHECKSUM_100X) & set(ORACLE_INFEASIBLE_100X)
    assert not overlap, f"keys in both checksum and infeasible: {overlap}"
    overlap = set(CC_ORACLE_100X) & set(ORACLE_INFEASIBLE_100X)
    assert not overlap, f"CC keys still marked infeasible: {overlap}"
