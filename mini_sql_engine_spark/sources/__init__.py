"""Sources: typed parquet (the default, via catalog) and the
reference's native CSV+metadata.txt format (compat path)."""

from mini_sql_engine_spark.sources import csv_metadata  # noqa: F401
