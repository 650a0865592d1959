"""Property-based parity (SURVEY.md §5.4): hypothesis-generated
filters / aggregations / set ops over random small integer tables must
produce identical results in Spark and DuckDB. The generator emits
each predicate in BOTH dialects from one AST, so any divergence is an
engine-semantics bug, not a transcription bug.

Integer-only tables mirror the reference's data model (every cell an
integer [SPEC-HIGH]) — which also sidesteps float-ordering noise; the
float discipline is covered by the main oracle contract instead.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

COLS = ["a", "b", "k"]

rows_st = st.lists(
    st.tuples(
        st.integers(-5, 5), st.integers(-50, 50), st.integers(0, 3)
    ),
    min_size=0,
    max_size=30,
)

OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}

cmp_st = st.tuples(
    st.sampled_from(COLS),
    st.sampled_from(sorted(OPS)),
    st.one_of(st.integers(-5, 5), st.sampled_from(COLS)),
)

pred_st = st.tuples(cmp_st, st.sampled_from(["AND", "OR", None]), cmp_st)


def spark_pred(pred):
    (c1, op1, r1), conn, (c2, op2, r2) = pred
    lhs = OPS[op1](F.col(c1), F.col(r1) if isinstance(r1, str) else F.lit(r1))
    if conn is None:
        return lhs
    rhs = OPS[op2](F.col(c2), F.col(r2) if isinstance(r2, str) else F.lit(r2))
    return (lhs & rhs) if conn == "AND" else (lhs | rhs)


def sql_pred(pred):
    (c1, op1, r1), conn, (c2, op2, r2) = pred
    lhs = f"{c1} {'<>' if op1 == '!=' else op1} {r1}"
    if conn is None:
        return lhs
    rhs = f"{c2} {'<>' if op2 == '!=' else op2} {r2}"
    return f"({lhs}) {conn} ({rhs})"


def make_inputs(spark, rows):
    pdf = pd.DataFrame(rows, columns=COLS) if rows else pd.DataFrame(
        {c: pd.Series(dtype="int64") for c in COLS}
    )
    sdf = spark.createDataFrame(pdf.astype("int64")) if rows else (
        spark.createDataFrame([], "a long, b long, k long")
    )
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@prop_settings
@given(rows=rows_st, pred=pred_st)
def test_filter_parity(spark, rows, pred):
    sdf, con = make_inputs(spark, rows)
    got = sorted(tuple(r) for r in sdf.filter(spark_pred(pred)).collect())
    exp = sorted(
        map(tuple, con.execute(f"SELECT * FROM t WHERE {sql_pred(pred)}").fetchall())
    )
    assert got == exp, f"predicate {sql_pred(pred)!r}"


@prop_settings
@given(rows=rows_st)
def test_group_agg_parity(spark, rows):
    sdf, con = make_inputs(spark, rows)
    got = sorted(
        tuple(r)
        for r in sdf.groupBy("k")
        .agg(
            F.sum("a").alias("sa"),
            F.min("b").alias("mb"),
            F.max("b").alias("xb"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    exp = sorted(
        map(
            tuple,
            con.execute(
                "SELECT k, sum(a) AS sa, min(b) AS mb, max(b) AS xb,"
                " count(*) AS n FROM t GROUP BY k"
            ).fetchall(),
        )
    )
    assert got == exp


null_rows_st = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.one_of(st.none(), st.integers(-50, 50)),
        st.integers(0, 2),
    ),
    min_size=0,
    max_size=25,
)



def nsorted(it):
    """Sort tuples that may contain None (None sorts first)."""
    return sorted(it, key=lambda t: tuple((v is not None, v) for v in t))

def make_null_inputs(spark, rows):
    sdf = spark.createDataFrame(rows, "a long, b long, k long") if rows else (
        spark.createDataFrame([], "a long, b long, k long")
    )
    pdf = pd.DataFrame(rows, columns=COLS, dtype="object").astype(
        {c: "Int64" for c in COLS}
    ) if rows else pd.DataFrame({c: pd.Series(dtype="Int64") for c in COLS})
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


@prop_settings
@given(rows=null_rows_st, pred=pred_st)
def test_filter_parity_with_nulls(spark, rows, pred):
    """SQL three-valued logic: NULL comparisons are UNKNOWN and drop
    the row — both engines must agree, including through AND/OR."""
    sdf, con = make_null_inputs(spark, rows)
    got = nsorted(tuple(r) for r in sdf.filter(spark_pred(pred)).collect())
    exp = nsorted(
        map(tuple, con.execute(f"SELECT * FROM t WHERE {sql_pred(pred)}").fetchall())
    )
    assert got == exp, f"predicate {sql_pred(pred)!r}"


@prop_settings
@given(rows=null_rows_st)
def test_group_agg_parity_with_nulls(spark, rows):
    """Aggregates skip NULLs; count(*) doesn't; all-NULL groups yield
    NULL sums — both engines must agree."""
    sdf, con = make_null_inputs(spark, rows)
    got = nsorted(
        tuple(r)
        for r in sdf.groupBy("k")
        .agg(
            F.sum("a").alias("sa"),
            F.count("a").alias("na"),
            F.min("b").alias("mb"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    exp = nsorted(
        map(
            tuple,
            con.execute(
                "SELECT k, sum(a) AS sa, count(a) AS na, min(b) AS mb,"
                " count(*) AS n FROM t GROUP BY k"
            ).fetchall(),
        )
    )
    assert got == exp


@prop_settings
@given(rows=rows_st, rows2=rows_st)
def test_set_op_parity(spark, rows, rows2):
    sdf1, con = make_inputs(spark, rows)
    pdf2 = pd.DataFrame(rows2, columns=COLS)
    sdf2 = (
        spark.createDataFrame(pdf2.astype("int64"))
        if rows2
        else spark.createDataFrame([], "a long, b long, k long")
    )
    con.register("t2", pdf2)
    cases = [
        (sdf1.union(sdf2).distinct(), "SELECT * FROM t UNION SELECT * FROM t2"),
        (sdf1.intersectAll(sdf2), "SELECT * FROM t INTERSECT ALL SELECT * FROM t2"),
        (sdf1.exceptAll(sdf2), "SELECT * FROM t EXCEPT ALL SELECT * FROM t2"),
    ]
    for df, sql in cases:
        got = sorted(tuple(r) for r in df.collect())
        exp = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == exp, sql


@prop_settings
@given(rows=rows_st)
def test_window_parity(spark, rows):
    """Ranking/analytic window functions over random data must agree
    with DuckDB. Orders always carry the full row as tie-break so the
    functions are deterministic on duplicate keys."""
    sdf, con = make_inputs(spark, rows)
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy("a", "b")
    got = sorted(
        tuple(r)
        for r in sdf.select(
            "a", "b", "k",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.lag("b").over(w).alias("prev_b"),
            F.sum("b").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("run_b"),
        ).collect()
    )
    exp = sorted(
        map(
            tuple,
            con.execute(
                "SELECT a, b, k,"
                " row_number() OVER w AS rn,"
                " rank() OVER w AS rk,"
                " lag(b) OVER w AS prev_b,"
                " sum(b) OVER (PARTITION BY k ORDER BY a, b"
                "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_b"
                " FROM t WINDOW w AS (PARTITION BY k ORDER BY a, b)"
            ).fetchall(),
        )
    )
    # prev_b/run_b may be NULL in row 1 of each partition
    def nkey(t):
        return tuple((v is not None, v) for v in t)

    assert sorted(got, key=nkey) == sorted(exp, key=nkey)


# ── round-4 ops vs pure-Python oracles on random inputs ──────────

edges_st = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=0, max_size=40,
)


def _union_find_components(edges):
    """Reference implementation: classic union-find, min id per set."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for u, v in edges:
        if u == v:
            continue
        nodes.update((u, v))
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_st)
def test_connected_components_match_union_find(spark, edges):
    from mini_sql_engine_spark.pipeline.graph import connected_components

    expect = _union_find_components(edges)
    if not expect:
        return  # all self-loops / empty: operator returns no rows
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == expect


merge_rows_st = st.lists(
    st.tuples(st.integers(0, 15), st.integers(-99, 99)),
    min_size=0, max_size=20,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base_rows=merge_rows_st, upd_rows=merge_rows_st)
def test_merge_upsert_matches_dict_semantics(spark, base_rows, upd_rows):
    """Both MERGE strategies must equal plain dict.update() semantics
    on random (unique-key) tables."""
    from mini_sql_engine_spark.operators.merge import merge_upsert

    base = {k: v for k, v in base_rows}     # last wins → unique keys
    upd = {k: v for k, v in upd_rows}
    expect = {**base, **upd}
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k int, val int")
    upd_df = spark.createDataFrame(
        [(k, v) for k, v in upd.items()], "k int, val int")
    for bcast in (False, True):
        got = {r["k"]: r["val"]
               for r in merge_upsert(base_df, upd_df, keys=["k"],
                                     broadcast_updates=bcast).collect()}
        assert got == expect, f"broadcast_updates={bcast}"


# ── grouped distributed prefix-sum property (round 5) ───────────

grouped_rows_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40), st.integers(1, 9)),
    min_size=1, max_size=40,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=grouped_rows_st, parts=st.integers(1, 5))
def test_grouped_running_total_matches_python(spark, rows, parts):
    """with_grouped_running_total on random (group, key, weight)
    tables == a python per-group cumsum under the same total order,
    for any partition count (the offsets algebra must be
    layout-free). Duplicate (g, k) rows get a unique tiebreak id."""
    from mini_sql_engine_spark.operators import sorting as SO

    data = [(g, k, i, w) for i, (g, k, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, k int, i int, w int")
    got = {
        (r["g"], r["k"], r["i"]): r["cum"]
        for r in SO.with_grouped_running_total(
            df, "w", ["g"], "k", "i", alias="cum",
            num_partitions=parts).collect()
    }
    want: dict = {}
    acc: dict = {}
    for g, k, i, w in sorted(data, key=lambda t: (t[0], t[1], t[2])):
        acc[g] = acc.get(g, 0) + w
        want[(g, k, i)] = acc[g]
    assert got == want
