"""Sinks that encode the two big 100 TB layout decisions.

``write_partitioned`` — hive-style directory partitioning: a filter on
the partition column prunes whole directories at planning time
(``PartitionFilters`` in the scan, zero I/O for pruned values). Use
for low-cardinality, always-filtered columns (date, lang,
event_type).

``write_bucketed`` — pre-shuffled table layout: rows are hash-bucketed
by the join/agg key at WRITE time, so every later join or aggregation
on that key runs with NO exchange on the bucketed side(s). This is
how a fact table that is joined daily amortizes its shuffle once.
Bucket counts must match across co-joined tables; Spark requires
``saveAsTable`` (the bucket metadata lives in the catalog, not the
files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (directory per value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted parquet table registered in the session
    catalog. ``path`` makes it an external table (data under ``path``,
    metadata in the catalog)."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
