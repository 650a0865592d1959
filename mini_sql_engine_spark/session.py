"""SparkSession factory with scale-appropriate defaults.

The reference engine is a single-threaded CPython process that loads
whole CSV files into RAM (SURVEY.md §3.1/§4.1); our equivalent of its
"runtime setup" is a SparkSession tuned so the same logical queries
run distributed: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow on (fast JVM<->Python batches for the
pandas-UDF paths), UTC session time so event-time windows are
deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "mini_sql_engine_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or
    ``local[*]``. ``spark.sql.shuffle.partitions`` defaults to 32 —
    sized to local cores; on a real cluster this should be ~2-3× total
    executor cores (or left to AQE coalescing, which is enabled).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as raw nanos and convert in the catalog
        # (truncation to µs — matches DuckDB's ns→µs behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
