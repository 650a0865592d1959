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


def with_rank(
    df: DataFrame, *keys: Column | str, alias: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a global 1-based position under a total order — scale
    plan, no single-task data funnel.

    An un-partitioned ``row_number`` window would range-exchange every
    row into ONE task; instead: (1) ``repartitionByRange`` on the sort
    keys (sampled boundaries, the same exchange a distributed ORDER BY
    uses), (2) per-range-partition ``row_number`` keyed by
    ``spark_partition_id`` — fully parallel, rows are already
    clustered, (3) global position = local position + the cumulative
    row count of all earlier range partitions. The offset cumsum runs
    over exactly ``num_partitions`` rows (one count per partition) —
    O(P), independent of data size — and is broadcast back, so the
    only remaining single-partition window touches ~32 rows at any
    scale. Deterministic whenever ``keys`` form a total order (callers
    add a unique tie-break, as the module docstring requires).
    """
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    base = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*cols)
    s = base.withColumn("_local", F.row_number().over(w_local))
    # per-partition row counts off the shared exchange (ReusedExchange)
    counts = base.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        s.join(F.broadcast(offsets), "_pid")
        .withColumn(alias, (F.col("_local") + F.col("_off")).cast("int"))
        .select(*df.columns, alias)
    )


def with_running_total(
    df: DataFrame, value_col: str, *keys: Column | str, alias: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach an inclusive global running total of ``value_col`` under
    a total order — the distributed prefix-sum twin of ``with_rank``,
    same scale plan: range-partition on the sort keys, per-partition
    cumulative sum (parallel), then add each partition's exclusive
    prefix of per-partition totals (an O(P) single-partition window
    over ~32 rows, broadcast back). No data-size single-task stage.
    Deterministic whenever ``keys`` form a total order.
    """
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    base = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = base.withColumn("_local", F.sum(value_col).over(w_local))
    totals = base.groupBy("_pid").agg(F.sum(value_col).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        s.join(F.broadcast(offsets), "_pid")
        .withColumn(alias, F.col("_local") + F.col("_off"))
        .select(*df.columns, alias)
    )


def with_grouped_running_total(
    df: DataFrame, value_col: str, group_cols: list[str],
    *keys: Column | str, alias: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-GROUP inclusive running total under a total order within
    each group — ``with_running_total`` generalized so that a LOW-
    cardinality group column (return flag, region, label) does not
    collapse the sort into one task per group: a plain
    ``Window.partitionBy(group)`` cumsum gives each group exactly ONE
    sort task no matter how many executors exist (the 3-group fact
    table sorts on 3 cores at any scale — the 4.5× factor the 10×
    series showed for the window form).

    Plan: (1) ``repartitionByRange`` on (group, keys) — a group spans
    MANY partitions, each sorted slice parallel; (2) per-partition
    cumsum keyed by (partition id, group); (3) each (partition,
    group)'s exclusive prefix of earlier partitions' group totals —
    an O(P·spanning groups) table, broadcast back. For HIGH-
    cardinality groups each group fits inside one range partition and
    the offsets table degenerates to zeros (a plain grouped window is
    equally fine there); this operator earns its exchange when groups
    are few and huge.
    """
    gcols = [F.col(g) for g in group_cols]
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    base = (
        df.repartitionByRange(parts, *gcols, *cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid", *group_cols).orderBy(
        *cols
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = base.withColumn("_local", F.sum(value_col).over(w_local))
    totals = base.groupBy("_pid", *group_cols).agg(
        F.sum(value_col).alias("_n"))
    w_off = Window.partitionBy(*group_cols).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_pid", *group_cols, "_off")
    return (
        s.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(alias, F.col("_local") + F.col("_off"))
        .select(*df.columns, alias)
    )
