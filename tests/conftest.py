"""Shared fixtures: one SparkSession per test run (JVM warm-up is
~15 s — pay it once), DuckDB oracle connections per sf dir."""

from __future__ import annotations

import duckdb
import pytest

from mini_sql_engine_spark.catalog import TABLES
from mini_sql_engine_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mini_sql_engine_spark-tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with all tables of both sf dirs registered as
    ``<table>`` (sf0.001) — parity tests re-register per sf as needed."""
    con = duckdb.connect()
    return con


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
