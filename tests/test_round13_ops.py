"""Semantic tests for the §2.23 round-13 operators: python SimHash
replay, MoM growth math, conversion-latency fixture, profiler
reconciliation."""

from __future__ import annotations

import datetime
import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from mini_sql_engine_spark import queries as Q
from mini_sql_engine_spark.catalog import Catalog

from tests.conftest import SF_SMOKE


def _py_simhash_chunks(text: str, n: int = 3) -> tuple | None:
    toks = [t for t in text.split(" ") if t]
    shingles = {" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)} if len(toks) >= n else set()
    if not shingles:
        return None
    votes = [0] * 64
    for s in shingles:
        h = hashlib.md5(s.encode()).hexdigest()
        for j in range(64):
            d = int(h[j // 4], 16)
            bit = (d >> (3 - j % 4)) & 1
            votes[j] += 1 if bit else -1
    chunks = []
    for k in range(4):
        c = 0
        for b in range(16):
            if votes[k * 16 + b] > 0:
                c |= 1 << (15 - b)
        chunks.append(c)
    return tuple(chunks)


def test_simhash_sig_matches_python_replay(spark):
    got = {r["doc_id"]: (r["c0"], r["c1"], r["c2"], r["c3"])
           for r in Q.simhash_sig(spark, SF_SMOKE).collect()}
    docs = Catalog(spark, SF_SMOKE).table("documents") \
        .select("doc_id", "text").limit(25).collect()
    checked = 0
    for r in docs:
        want = _py_simhash_chunks(r["text"])
        if want is None:
            assert r["doc_id"] not in got
        else:
            assert got[r["doc_id"]] == want, r["doc_id"]
            checked += 1
    assert checked >= 10


def test_simhash_sig_chunks_are_16_bit(spark):
    rows = Q.simhash_sig(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        for c in ("c0", "c1", "c2", "c3"):
            assert 0 <= r[c] < (1 << 16)


def test_mom_growth_math(spark):
    rows = Q.mom_growth(spark, SF_SMOKE).collect()
    by_prio: dict = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], []).append(r)
    for prio, rs in by_prio.items():
        rs.sort(key=lambda r: r["month"])
        assert rs[0]["growth_pct"] is None
        for prev, cur in zip(rs, rs[1:]):
            want = (float(cur["revenue"]) - float(prev["revenue"])) \
                / float(prev["revenue"]) * 100
            assert math.isclose(cur["growth_pct"], want, rel_tol=1e-9)


def test_conversion_latency_fixture(spark):
    """view@0, purchase@100 (u1); view@0, purchase@50 (u2); purchase
    BEFORE the view only (u3 — not converted)."""
    t0 = datetime.datetime(2024, 7, 1)

    def ev(eid, uid, sec, typ):
        return Row(event_id=eid, ts=t0 + datetime.timedelta(seconds=sec),
                   user_id=uid, event_type=typ, value=0.0, props="{}")

    df = spark.createDataFrame([
        ev(0, 1, 0, "view"), ev(1, 1, 100, "purchase"),
        ev(2, 2, 0, "view"), ev(3, 2, 50, "purchase"),
        ev(4, 3, 60, "view"), ev(5, 3, 30, "purchase"),
    ])
    orig = Catalog.table
    try:
        Catalog.table = (lambda self, name, _df=df:
                         _df if name == "events" else orig(self, name))
        out = Q.conversion_latency(spark, SF_SMOKE).collect()[0]
    finally:
        Catalog.table = orig
    assert out["n_converted"] == 2
    assert math.isclose(out["p50_sec"], 75.0, abs_tol=1e-9)
    assert math.isclose(out["p90_sec"], 95.0, abs_tol=1e-9)


def test_profile_table_reconciles(spark):
    rows = {r["col_name"]: r
            for r in Q.profile_table(spark, SF_SMOKE).collect()}
    o = Catalog(spark, SF_SMOKE).table("orders")
    assert set(rows) == {"o_orderstatus", "o_orderpriority",
                         "o_custkey", "o_totalprice"}
    assert rows["o_orderstatus"]["n_distinct"] == \
        o.select("o_orderstatus").distinct().count()
    assert rows["o_custkey"]["n_nulls"] == 0
    lo = o.agg(F.min("o_custkey")).collect()[0][0]
    assert rows["o_custkey"]["min_val"] == str(lo)
