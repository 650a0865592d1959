#!/usr/bin/env python
"""Simulate the round driver: run __spark_entry__ queries() vs
oracle_sql() on DuckDB at sf0.01, compare rowcount + sorted column
names + order-insensitive value hash. Optional argv: subset of keys."""
import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from mini_sql_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("DRIVE_CPUS", "8"))
SHUF = os.environ.get("DRIVE_SHUFFLE")  # optional partition override
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm_cell(v):
    import datetime
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def pandas_hash(pdf):
    """The round driver's canon: pandas frame, columns sorted by
    name, rows sorted via sort_values over all columns, every cell
    stringified with str().  Decimal/date/list cells keep their
    pandas repr — exactly the surface the driver compares."""
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False):
        h.update("\x1f".join(str(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def run(keys=None, sf_dir=None, spark=None):
    """Drive the queries()-vs-oracle_sql() contract at ``sf_dir``.

    Returns (match, mismatch, err, rows_only) so callers
    (scripts/sweep_scale.py — the standing ~sf1 gate) can assert on
    the counts; prints one MATCH/MISMATCH/ERR line per key."""
    sf_dir = sf_dir or SF_DIR
    if spark is None:
        spark = get_spark(cpus=CPUS,
                          shuffle_partitions=int(SHUF) if SHUF else None)
    df = E.entry(spark)
    assert len(df.take(1)) > 0, "entry() returned no rows"
    con = duckdb.connect()
    # An in-memory DuckDB defaults to 80% of system RAM, one thread
    # per core, and CANNOT spill (no temp_directory). Worse, its
    # buffer manager allocates 256 KiB blocks that glibc serves as
    # one mmap each (>= the 128 KiB MMAP_THRESHOLD), so a working
    # set past ~16 GiB exhausts the kernel's default
    # vm.max_map_count=65530 and 256 KiB allocations start failing
    # with std::bad_alloc / pthread EAGAIN while 100+ GiB of RAM sit
    # free — exactly what the string-agg-heavy oracles hit at the
    # 100x blow-up (boilerplate_strip: ~50M two-token segments).
    # 12 GiB keeps live blocks (~49k mmaps) under the map budget;
    # the temp_directory turns the rest into spill instead of death.
    # 12GB default; DRIVE_DUCKDB_MEM overrides for oracles whose
    # working set cannot spill (DuckDB recursive CTEs hold the whole
    # iteration table in memory — the CC-family oracles at the 100x
    # blow-up OOM at 12GB with 30+GB already spilled)
    con.execute(f"SET memory_limit='"
                f"{os.environ.get('DRIVE_DUCKDB_MEM', '12GB')}'")
    con.execute(f"SET threads={CPUS}")
    con.execute("SET preserve_insertion_order=false")
    # per-PID spill dir: concurrent drive processes (the sharded 100x
    # gate) sharing one temp_directory delete each other's
    # duckdb_temp_storage-*.tmp on connection cleanup and the loser
    # terminates with duckdb::IOException mid-key
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        # driver testdata is one file per table; Spark-written blow-up
        # dirs (sweep_scale) need the part-file glob
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    qs = E.queries()
    oracles = E.oracle_sql()
    todo = keys or list(qs)
    n_match = n_mismatch = n_err = n_rowsonly = 0
    for k in todo:
        try:
            sdf = qs[k](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            if k not in oracles:
                print(f"ROWS-ONLY {k}: {len(srows)} rows")
                n_rowsonly += 1
                continue
            ocur = con.execute(oracles[k])
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
            ok_rows = len(srows) == len(orows)
            ok_cols = sorted(scols) == sorted(ocols)
            ok_hash = (table_hash(scols, [tuple(r) for r in srows])
                       == table_hash(ocols, orows))
            # pandas twin: replicate the ROUND DRIVER's canon exactly
            # (fetchdf/toPandas + sort_values + str cells) — catches
            # Decimal-vs-float64 trailing zeros, DATE-vs-TIMESTAMP
            # strings, and unsortable list cells that the collect()
            # hash above normalizes away.
            ok_pd = (pandas_hash(sdf.toPandas())
                     == pandas_hash(con.execute(oracles[k]).fetchdf()))
            if ok_rows and ok_cols and ok_hash and ok_pd:
                print(f"MATCH     {k}: {len(srows)} rows")
                n_match += 1
            else:
                print(f"MISMATCH  {k}: rows {len(srows)}/{len(orows)} "
                      f"cols_ok={ok_cols} hash_ok={ok_hash} pd_ok={ok_pd}")
                if not ok_cols:
                    print(f"   spark cols: {sorted(scols)}")
                    print(f"   duck  cols: {sorted(ocols)}")
                n_mismatch += 1
        except Exception as exc:
            print(f"ERR       {k}: {type(exc).__name__}: {exc}")
            n_err += 1
    print(f"\nTOTAL match={n_match} mismatch={n_mismatch} "
          f"err={n_err} rows_only={n_rowsonly}")
    return n_match, n_mismatch, n_err, n_rowsonly


def main():
    run(keys=sys.argv[1:])


if __name__ == "__main__":
    main()
