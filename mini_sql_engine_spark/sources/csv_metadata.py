"""Reference-native source: ``metadata.txt`` + one integer CSV per table.

Format (SURVEY.md §1.1 / FIXTURES.md §A, [SPEC-HIGH] genre spec):

    <begin_table>
    table1
    A
    B
    <end_table>
    ...

with ``<table>.csv`` holding comma-separated integers (cells may be
double-quoted), no header, no nulls. Every column is integer-typed by
spec → ``LongType`` here.

Spark-first: the metadata parser is driver-side (it is a tiny catalog
file, not data); the CSV read itself is a distributed
``spark.read.schema(...).csv`` with an explicit schema — never
``inferSchema`` (an extra full pass at scale). Quoted integer cells
are handled by the CSV reader's quote option.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BEGIN = "<begin_table>"
END = "<end_table>"


@dataclass
class RefCatalog:
    """Parsed metadata.txt: table name → column names (order matters)."""

    tables: dict[str, list[str]] = field(default_factory=dict)

    @classmethod
    def parse(cls, metadata_path: str) -> "RefCatalog":
        tables: dict[str, list[str]] = {}
        with open(metadata_path, encoding="utf-8") as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        i = 0
        while i < len(lines):
            if lines[i] != BEGIN:
                raise ValueError(
                    f"malformed metadata.txt at line {i}: expected {BEGIN}, got {lines[i]!r}"
                )
            i += 1
            name = lines[i]
            i += 1
            cols: list[str] = []
            while i < len(lines) and lines[i] != END:
                cols.append(lines[i])
                i += 1
            if i >= len(lines):
                raise ValueError(f"table {name!r}: missing {END}")
            if not cols:
                raise ValueError(f"table {name!r}: no columns")
            tables[name] = cols
            i += 1  # skip END
        return cls(tables)

    def schema(self, table: str) -> T.StructType:
        if table not in self.tables:
            raise KeyError(
                f"unknown table {table!r}; metadata has {sorted(self.tables)}"
            )
        return T.StructType(
            [T.StructField(c, T.LongType(), nullable=False) for c in self.tables[table]]
        )


def load_ref_table(
    spark: SparkSession, data_dir: str, table: str, catalog: RefCatalog | None = None
) -> DataFrame:
    """Distributed read of ``<data_dir>/<table>.csv`` with the explicit
    integer schema from ``<data_dir>/metadata.txt``."""
    catalog = catalog or RefCatalog.parse(os.path.join(data_dir, "metadata.txt"))
    return (
        spark.read.schema(catalog.schema(table))
        .option("header", "false")
        .option("quote", '"')
        .csv(os.path.join(data_dir, f"{table}.csv"))
    )


def register_ref_tables(spark: SparkSession, data_dir: str) -> RefCatalog:
    """Register every metadata.txt table as a temp view → the SQL front
    door then accepts exactly the reference's query surface (and more)."""
    catalog = RefCatalog.parse(os.path.join(data_dir, "metadata.txt"))
    for name in catalog.tables:
        load_ref_table(spark, data_dir, name, catalog).createOrReplaceTempView(name)
    return catalog
