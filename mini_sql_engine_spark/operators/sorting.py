"""ORDER BY / LIMIT / top-k.

Reference (SURVEY.md §2.5): ``list.sort()`` on the materialized result
[SPEC-MED]; LIMIT absent. Spark-first: ``orderBy`` is a range-
partitioned distributed sort (sampled range boundaries → shuffle →
per-partition sort); ``orderBy().limit(k)`` is planned as
``TakeOrderedAndProject`` — each partition keeps only its top-k, the
driver merges k·p rows — which is the only sane top-k at 100 TB.

Determinism: callers should include a unique tie-break key; a sort on
a non-unique key is only deterministic up to ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def order_by(df: DataFrame, *keys: Column | str) -> DataFrame:
    """Total sort. Multi-key superset of the reference's single key."""
    return df.orderBy(*keys)


def top_k(df: DataFrame, k: int, *keys: Column | str) -> DataFrame:
    """Top-k by sort keys → TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*keys).limit(k)


def with_rank(df: DataFrame, *keys: Column | str, alias: str = "pos") -> DataFrame:
    """Attach a global 1-based position under a total order.

    Implemented as ``row_number`` over an un-partitioned window — this
    funnels through one task, so it is for bounded/diagnostic outputs
    only (Qkey hashing of an ordered result); at scale use
    ``zipWithIndex``-free ranking per partition key instead.
    """
    w = Window.orderBy(*keys)
    return df.withColumn(alias, F.row_number().over(w))
