"""JDBC source/sink — the warehouse-interop path.

A 100 TB engine still talks to operational databases at its edges:
dimension snapshots come FROM them, serving marts go TO them. The two
rules that make JDBC viable at scale, both encoded here:

1. **Partitioned reads.** A bare JDBC read is ONE connection pulling
   the whole table through the driver — the classic ingest
   bottleneck. ``read_jdbc`` therefore requires the stride spec
   (``partition_col``/``lower``/``upper``/``num_partitions``): Spark
   issues one range-predicated query per partition, in parallel, and
   the table lands already split across executors.
2. **Predicate pushdown.** Filters on the returned DataFrame compile
   into the remote WHERE clause (``PushedFilters: [*...]`` — the
   ``*`` marks full pushdown), so the database ships only matching
   rows. Pinned in tests against the Derby engine that Spark bundles
   (no external server needed).

Writes go through ``num_partitions`` concurrent INSERT streams —
bounded by what the target database tolerates, not by Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
    num_partitions: int | None = None,
) -> None:
    """Write ``df`` to a JDBC table; ``num_partitions`` caps the
    concurrent connection count (coalesce, no shuffle)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_col: str,
    lower: int,
    upper: int,
    num_partitions: int,
) -> DataFrame:
    """Range-partitioned parallel JDBC read: one connection per
    partition, each with a stride predicate on ``partition_col``
    (rows outside [lower, upper] still arrive — the bounds shape the
    stride, they don't filter)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("partitionColumn", partition_col)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .load()
    )
