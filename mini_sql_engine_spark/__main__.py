"""Reference-compatible command-line front door.

The reference engine's whole UX is ``python <engine>.py "<sql>"`` over
``metadata.txt``-described integer CSVs, printing a ``table.col,...``
header line and comma-separated rows to stdout (SURVEY.md §3.1,
[SPEC-HIGH]). This module reproduces that surface on Spark:

    python -m mini_sql_engine_spark "SELECT A, B FROM table1 WHERE A > 2"
    python -m mini_sql_engine_spark --data-dir files/ "<sql>"

Spark-first: there is NO hand-written SQL parser here — the query goes
straight to ``spark.sql``, so the accepted language is full Spark SQL,
a strict superset of the reference's subset (SELECT/DISTINCT/WHERE
with AND/OR, aggregates, ``FROM t1, t2`` joins). Catalyst recovers
equi-joins from cartesian+WHERE shapes, pushes filters into the CSV
scan, and prunes columns — the reference materializes the cross
product first [SPEC-HIGH, SURVEY.md §4.1].

Output formatting notes vs the reference:
- Headers are qualified ``table.col`` when the bare column name maps
  to exactly one metadata table (the genre prints qualified names;
  with our superset language a column may be computed, so unmappable
  names print as-is).
- Rows stream through ``toLocalIterator`` — the driver never
  materializes the full result (the reference buffers everything in
  memory).
"""

from __future__ import annotations

import argparse
import sys

from mini_sql_engine_spark.session import get_spark
from mini_sql_engine_spark.sources.csv_metadata import RefCatalog, register_ref_tables


def qualified_header(columns: list[str], catalog: RefCatalog) -> str:
    owners: dict[str, list[str]] = {}
    for tbl, cols in catalog.tables.items():
        for c in cols:
            owners.setdefault(c, []).append(tbl)
    out = []
    for c in columns:
        tbls = owners.get(c, [])
        out.append(f"{tbls[0]}.{c}" if len(tbls) == 1 else c)
    return ",".join(out)


def run(sql: str, data_dir: str, spark=None, max_cross_rows: int | None = None) -> int:
    spark = spark or get_spark(app_name="mini_sql_engine_spark-cli")
    catalog = register_ref_tables(spark, data_dir)
    try:
        result = spark.sql(sql)
        if max_cross_rows is not None:
            from mini_sql_engine_spark.plans.guard import check_cross_joins

            check_cross_joins(result, max_rows=max_cross_rows)
    except Exception as exc:  # parse/analysis errors → reference-style exit
        print(f"error: {exc}", file=sys.stderr)
        return 1
    print(qualified_header(result.columns, catalog))
    for row in result.toLocalIterator():
        print(",".join("" if v is None else str(v) for v in row))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m mini_sql_engine_spark",
        description="Run a SQL query over metadata.txt-described CSV tables.",
    )
    ap.add_argument("sql", help="SQL query string (full Spark SQL)")
    ap.add_argument("--data-dir", default=".",
                    help="directory holding metadata.txt and <table>.csv files")
    ap.add_argument("--max-cross-rows", type=int, default=None,
                    help="refuse unconstrained cross joins estimated above "
                         "this row count (plans.guard pre-flight check)")
    args = ap.parse_args(argv)
    return run(args.sql, args.data_dir, max_cross_rows=args.max_cross_rows)


if __name__ == "__main__":
    sys.exit(main())
