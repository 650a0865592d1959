"""Round-11 verification hardening tests: the engine-side checksum
canon (drive_contract.spark_checksum / duck_checksum — VERDICT r10
#1), the union-find CC oracle (r10 #3), and the stratified-sample
driver-surface cap (r10 #8)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import drive_contract  # noqa: E402
import sweep_scale  # noqa: E402


# ------------------------------------------------------------------ #
# checksum canon: every supported type renders identically            #
# ------------------------------------------------------------------ #

def test_checksum_canon_agrees_across_engines_on_every_type(spark):
    """One row-set expressed natively in BOTH engines (no pandas
    transfer — pandas would launder NaN into NULL) must produce
    identical (count, fold1, fold2). Covers negatives, NULLs in every
    type, -0.0 (normalized to +0.0), nan/inf spellings, denormal-ish
    and huge doubles, decimal trailing zeros, dates, timestamps with
    and without microseconds, booleans, arrays with NULL elements and
    empty arrays."""
    sdf = spark.sql("""
        SELECT * FROM VALUES
          (CAST(1 AS BIGINT), CAST(-7 AS INT), 'plain', TRUE,
           DATE'2020-02-29', TIMESTAMP'2021-06-01 12:34:56.789012',
           CAST(0.1 AS DOUBLE), CAST(123.40 AS DECIMAL(18,2)),
           array('x', CAST(NULL AS STRING), 'y'),
           array(CAST(1.5 AS DOUBLE))),
          (CAST(2 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS STRING),
           FALSE, CAST(NULL AS DATE), TIMESTAMP'1999-12-31 23:59:59',
           CAST(-0.0 AS DOUBLE), CAST(NULL AS DECIMAL(18,2)),
           array(), CAST(NULL AS ARRAY<DOUBLE>)),
          (CAST(3 AS BIGINT), CAST(2147483647 AS INT), 'q''uote',
           CAST(NULL AS BOOLEAN), DATE'1970-01-01',
           CAST(NULL AS TIMESTAMP), CAST(double('nan') AS DOUBLE),
           CAST(0.01 AS DECIMAL(18,2)), CAST(NULL AS ARRAY<STRING>),
           array(CAST(double('inf') AS DOUBLE),
                 CAST(-1.7976931348623157E308 AS DOUBLE))),
          (CAST(-4 AS BIGINT), CAST(0 AS INT), '', TRUE,
           DATE'2038-01-19', TIMESTAMP'2021-06-01 00:00:00',
           CAST(4.9E-324 AS DOUBLE), CAST(-0.50 AS DECIMAL(18,2)),
           array(''), array(CAST(double('-inf') AS DOUBLE),
                            CAST(-0.0 AS DOUBLE)))
        AS t(k, i, s, b, d, ts, x, dec, arr_s, arr_d)
    """)
    con = duckdb.connect()
    duck_sql = """
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(-7 AS INTEGER), 'plain', TRUE,
           DATE '2020-02-29', TIMESTAMP '2021-06-01 12:34:56.789012',
           CAST(0.1 AS DOUBLE), CAST(123.40 AS DECIMAL(18,2)),
           ['x', CAST(NULL AS VARCHAR), 'y'],
           [CAST(1.5 AS DOUBLE)]),
          (CAST(2 AS BIGINT), CAST(NULL AS INTEGER),
           CAST(NULL AS VARCHAR), FALSE, CAST(NULL AS DATE),
           TIMESTAMP '1999-12-31 23:59:59', CAST(-0.0 AS DOUBLE),
           CAST(NULL AS DECIMAL(18,2)), CAST([] AS VARCHAR[]),
           CAST(NULL AS DOUBLE[])),
          (CAST(3 AS BIGINT), CAST(2147483647 AS INTEGER), 'q''uote',
           CAST(NULL AS BOOLEAN), DATE '1970-01-01',
           CAST(NULL AS TIMESTAMP), CAST('nan' AS DOUBLE),
           CAST(0.01 AS DECIMAL(18,2)), CAST(NULL AS VARCHAR[]),
           [CAST('inf' AS DOUBLE),
            CAST(-1.7976931348623157E308 AS DOUBLE)]),
          (CAST(-4 AS BIGINT), CAST(0 AS INTEGER), '', TRUE,
           DATE '2038-01-19', TIMESTAMP '2021-06-01 00:00:00',
           CAST(4.9E-324 AS DOUBLE), CAST(-0.50 AS DECIMAL(18,2)),
           [''], [CAST('-inf' AS DOUBLE), CAST(-0.0 AS DOUBLE)])
        ) t(k, i, s, b, d, ts, x, dec, arr_s, arr_d)
    """
    assert (drive_contract.spark_checksum(sdf)
            == drive_contract.duck_checksum(con, duck_sql))


def test_checksum_detects_single_cell_and_row_count_drift(spark):
    con = duckdb.connect()
    base = ("SELECT * FROM (VALUES (1, 'a', CAST(1.5 AS DOUBLE)), "
            "(2, 'b', CAST(2.5 AS DOUBLE))) t(k, s, x)")
    sdf = spark.sql(
        "SELECT * FROM VALUES (1, 'a', CAST(1.5 AS DOUBLE)),"
        " (2, 'b', CAST(2.5 AS DOUBLE)) AS t(k, s, x)")
    ck = drive_contract.duck_checksum(con, base)
    assert drive_contract.spark_checksum(sdf) == ck
    # one flipped cell -> both folds move, count doesn't
    drift = base.replace("2.5", "2.5000001")
    dn, dh1, dh2 = drive_contract.duck_checksum(con, drift)
    assert dn == ck[0] and dh1 != ck[1] and dh2 != ck[2]
    # one dropped row -> count moves
    fewer = ("SELECT * FROM (VALUES (1, 'a', CAST(1.5 AS DOUBLE))) "
             "t(k, s, x)")
    assert drive_contract.duck_checksum(con, fewer)[0] == ck[0] - 1


def test_checksum_empty_result_is_zero_not_null(spark):
    con = duckdb.connect()
    sdf = spark.range(0).select(F.col("id").alias("k"))
    assert drive_contract.spark_checksum(sdf) == (0, 0, 0)
    assert drive_contract.duck_checksum(
        con, "SELECT 1 AS k WHERE false") == (0, 0, 0)


def test_checksum_column_order_insensitive_name_check_in_run(spark):
    """Columns are folded in sorted-name order (the driver's canon),
    so SELECT a,b vs b,a agree.  The FOLD itself never hashes column
    NAMES — a renamed sort-order-preserving column yields the same
    triple (asserted below) — which is exactly why run()'s checksum
    branch compares sorted names explicitly (ADVICE r11)."""
    con = duckdb.connect()
    ab = drive_contract.duck_checksum(con, "SELECT 1 AS a, 'x' AS b")
    ba = drive_contract.duck_checksum(con, "SELECT 'x' AS b, 1 AS a")
    assert ab == ba
    sdf = spark.sql("SELECT 'x' AS b, 1 AS a")
    assert drive_contract.spark_checksum(sdf) == ab
    # name-blindness of the fold, pinned: rename that preserves sort
    # order ('a','b' -> 'a','c') leaves the triple unchanged
    ac = drive_contract.duck_checksum(con, "SELECT 1 AS a, 'x' AS c")
    assert ac == ab


def test_run_rejects_checksum_key_without_oracle(spark, monkeypatch):
    """A checksum key with no oracle must fail LOUDLY instead of
    falling through to the full driver collect (ADVICE r11): at 100x
    that silent fallback is a 10M-60M-row collect."""
    import pytest

    monkeypatch.setattr(drive_contract.E, "entry",
                        lambda s: s.sql("SELECT 1 AS x"))
    monkeypatch.setattr(drive_contract.E, "queries",
                        lambda: {"k": lambda s, d: s.sql("SELECT 1 AS x")})
    monkeypatch.setattr(drive_contract.E, "oracle_sql", lambda: {})
    with pytest.raises(ValueError, match="checksum_keys without an oracle"):
        drive_contract.run(keys=["k"], sf_dir="/root/testdata/sf0.001",
                           spark=spark, checksum_keys={"k"})


# ------------------------------------------------------------------ #
# union-find CC oracle                                                #
# ------------------------------------------------------------------ #

def test_union_find_matches_spark_connected_components(spark):
    """The python closure oracle labels a multi-component graph with
    chains, a cycle, and isolated pairs exactly like the distributed
    min-label propagation."""
    edges = [(5, 3), (3, 9), (9, 7),          # chain -> rep 3
             (20, 21), (21, 22), (22, 20),    # cycle -> rep 20
             (40, 41),                        # pair  -> rep 40
             (2, 2)]                          # self-loop (dropped)
    uf = sweep_scale.union_find([(a, b) for a, b in edges if a != b])
    assert uf == {5: 3, 3: 3, 9: 3, 7: 3,
                  20: 20, 21: 20, 22: 20, 40: 40, 41: 40}
    from mini_sql_engine_spark.pipeline.graph import connected_components
    pairs = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    got = {(r["node"], r["component"])
           for r in connected_components(pairs).collect()}
    assert got == set(uf.items())


def test_cc_oracle_sql_matches_recursive_cte_at_smoke_scale(spark):
    """At sf0.001 (where the recursive CTE is cheap) the union-find
    oracle path — DuckDB edges + python closure + cc_labels tail —
    must reproduce the ORIGINAL oracles byte-for-byte for all three
    rewritten CC keys."""
    from mini_sql_engine_spark.oracles import ORACLES
    from tests.conftest import SF_SMOKE, register_duck_views

    con = duckdb.connect()
    register_duck_views(con, SF_SMOKE)
    sweep_scale.register_cc_labels(con)
    for key in sweep_scale.CC_KEYS_100X:
        original = con.execute(ORACLES[key]).fetchall()
        rewritten = con.execute(sweep_scale.CC_ORACLE_100X[key]).fetchall()
        assert sorted(map(tuple, rewritten)) == sorted(map(tuple, original)), key


# ------------------------------------------------------------------ #
# stratified_sample driver-surface cap                                #
# ------------------------------------------------------------------ #

def test_stratified_sample_caps_unbounded_strata(spark, monkeypatch):
    """The last unguarded driver collect (pipeline/clean.py — VERDICT
    r10 #8): a near-unique strata column must raise, not flood the
    driver. The cap is monkeypatched small — building >100k real
    strata in a unit test would be pure wall-clock."""
    from mini_sql_engine_spark.pipeline import clean

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.col("id")).alias("stratum"))
    # bounded column works and keeps everything at fraction 1.0
    ok = clean.stratified_sample(
        docs.withColumn("stratum", F.lit("en")), "stratum", {"en": 1.0})
    assert ok.count() == 50
    monkeypatch.setattr(clean, "MAX_STRATA", 10)
    with pytest.raises(ValueError, match="distinct values"):
        clean.stratified_sample(docs, "stratum", {})
    # per-call override (ADVICE r11): kwarg beats the module constant
    assert clean.stratified_sample(
        docs, "stratum", {}, max_strata=50).count() == 50
    with pytest.raises(ValueError, match="more than 5 distinct"):
        clean.stratified_sample(docs, "stratum", {}, max_strata=5)
