"""Scan / project / filter — the reference's core surface.

Reference behavior (SURVEY.md §2.1-2.2, [SPEC-HIGH]): full-file CSV
scan into memory, projection of ``*`` or a column list, WHERE with
one comparison or exactly two conditions joined by AND/OR, operators
``= < > <= >= !=``, column-vs-literal and column-vs-column.

Spark-first: these are direct DataFrame expressions. The win over the
reference is not the code (it's trivial either way) but the plan:
filters and projections expressed declaratively reach the parquet
scan as ``PushedFilters`` / ``ReadSchema`` pruning, so at 100 TB the
engine reads only the row groups and columns the query touches —
the reference reads and materializes everything, always.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CMP_OPS = {
    "=": Column.__eq__,
    "==": Column.__eq__,
    "!=": Column.__ne__,
    "<>": Column.__ne__,
    "<": Column.__lt__,
    "<=": Column.__le__,
    ">": Column.__gt__,
    ">=": Column.__ge__,
}


def scan(df: DataFrame) -> DataFrame:
    """Full table scan (``SELECT *``). Identity on purpose: the scan is
    whatever Catalyst plans — a columnar, predicate-pushed parquet read,
    not the reference's whole-file materialization."""
    return df


def project(df: DataFrame, cols: Iterable[str | Column]) -> DataFrame:
    """Project a column list (``SELECT a, t.b``). Column pruning reaches
    the scan: only these columns are read from parquet."""
    return df.select(*cols)


def project_exprs(df: DataFrame, **aliased: Column) -> DataFrame:
    """Project computed expressions, each aliased (``SELECT a*b AS x``)."""
    return df.select(*[expr.alias(name) for name, expr in aliased.items()])


def compare(left: str | Column, op: str, right) -> Column:
    """One comparison predicate: column vs literal or column vs column.

    Mirrors the reference's comparison set ``= != < <= > >=``
    (SURVEY.md §2.2). ``right`` may be a Column (column-vs-column) or a
    Python literal.
    """
    if op not in _CMP_OPS:
        raise ValueError(f"unsupported comparison {op!r}; supported: {sorted(_CMP_OPS)}")
    left_col = F.col(left) if isinstance(left, str) else left
    return _CMP_OPS[op](left_col, right)


def where(df: DataFrame, predicate: Column) -> DataFrame:
    """Filter rows. Arbitrary boolean trees via ``&``/``|``/``~`` — a
    strict superset of the reference's two-conjunct cap."""
    return df.filter(predicate)


def where_all(df: DataFrame, *predicates: Column) -> DataFrame:
    """AND of any number of predicates (reference caps at two)."""
    out = df
    for p in predicates:
        out = out.filter(p)
    return out


def where_any(df: DataFrame, *predicates: Column) -> DataFrame:
    """OR of any number of predicates."""
    if not predicates:
        return df
    acc = predicates[0]
    for p in predicates[1:]:
        acc = acc | p
    return df.filter(acc)
