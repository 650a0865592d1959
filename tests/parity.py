"""Spark ↔ DuckDB comparison harness mirroring the driver's check:
row count + column names + order-insensitive value equality.

Stricter than a hash: normalized cell-by-cell comparison, so failures
show the first differing row instead of an opaque hash mismatch.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
from pyspark.sql import DataFrame


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; -0.0 normalized
        return repr(v + 0.0 if v != 0 else 0.0)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
    if isinstance(v, dt.timedelta):
        return f"td:{v.total_seconds()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(rows, col_order):
    out = [tuple(_norm_cell(row[i]) for i in col_order) for row in rows]
    out.sort()
    return out


def spark_rows(df: DataFrame):
    cols = df.columns
    return cols, [tuple(r) for r in df.collect()]


def duck_rows(con: duckdb.DuckDBPyConnection, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_parity(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, qkey: str = "?"):
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"[{qkey}] column names differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{qkey}] row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    )
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_norm = _normalize(s_rows, [s_cols.index(sorted(s_cols)[i]) for i in range(len(s_cols))])
    d_norm = _normalize(d_rows, [d_cols.index(sorted(d_cols)[i]) for i in range(len(d_cols))])
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:3]
        raise AssertionError(
            f"[{qkey}] values differ; first diffs (spark vs duck): {diffs}"
        )
