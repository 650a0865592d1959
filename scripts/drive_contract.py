#!/usr/bin/env python
"""Simulate the round driver: run __spark_entry__ queries() vs
oracle_sql() on DuckDB at sf0.01, compare rowcount + sorted column
names + order-insensitive value hash. Optional argv: subset of keys.

Two compare modes:

- full (default): collect both result sets and compare rowcount +
  sorted column names + order-insensitive value hash + the round
  driver's pandas canon — byte-faithful, but it materializes every
  row on the driver, which caps it at bounded-output keys.
- checksum (``checksum_keys``): BOTH engines reduce their own result
  to ONE row — ``(count(*), sum(fold64(md5(row))), sum(fold64(md5'
  (row))))`` over a canonical per-type row rendering that is
  engine-portable by construction (VERDICT r10 #1) — so fact-sized
  outputs (10M–60M rows at the 100x blow-up) are cross-checked
  without collecting anything. The rendering canon per column type:
  integers/booleans/dates/decimals CAST to their (identical) string
  forms, timestamps via an explicit 6-digit-microsecond format,
  doubles via ``%.17e`` after ``+0.0`` (-0.0 → 0.0) with nan/inf
  spelled out (Java's Formatter and C's printf agree on %.17e digits
  — both round the exact binary expansion — but disagree on
  NaN/Infinity spelling), arrays element-rendered and joined.  Rows
  join their sorted-by-name columns with \\x1f (NULL → \\x05NULL);
  the two independent 60-bit md5 prefix folds make a cross-engine
  collision vanishingly unlikely (~2^-120 per key).
"""
import atexit
import glob as _glob
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


# ---------------------------------------------------------------- #
# Engine-side checksum compare (VERDICT r10 #1)                      #
# ---------------------------------------------------------------- #

_SEP = "\x1f"          # column separator inside a row string
_ASEP = "\x02"         # element separator inside an array cell
_NULLTOK = "\x05NULL"  # rendered NULL (cell or array element)


def _spark_render(col, dt):
    """Canonical engine-portable string rendering of one Spark column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.BooleanType, T.DateType, T.DecimalType,
                       T.StringType)):
        return col.cast("string")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return _spark_num_canon(col)
    if isinstance(dt, T.ArrayType):
        rendered = F.transform(col, lambda x: _spark_render(x, dt.elementType))
        return F.array_join(rendered, _ASEP, _NULLTOK)
    raise NotImplementedError(f"checksum canon: Spark type {dt}")


def _spark_num_canon(col):
    """Render a double as ``[-]<52-bit mantissa>p<exponent>`` by
    extracting the IEEE-754 fields with EXACT power-of-two arithmetic
    — no decimal rendering at all.  Decimal formats are not portable:
    C's printf %e prints the exact binary expansion while Java's
    Formatter zero-pads the shortest repr, and even shortest reprs
    disagree (Java 17's pre-Ryu Double.toString says 4.9E-324 where
    DuckDB says 5e-324).  Multiplying by a power of two is exact
    whenever the result is representable, so mantissa recovery is
    bit-faithful in both engines; floor(log2(a)) may be off by one
    near boundaries and is corrected by exact comparisons (applied
    twice, belt and braces)."""
    from pyspark.sql import functions as F

    d = col.cast("double") + F.lit(0.0)  # -0.0 -> +0.0
    a = F.abs(d)

    def corr(e):
        e = F.when(F.pow(F.lit(2.0), e.cast("double")) > a,
                   e - 1).otherwise(e)
        return F.when(F.pow(F.lit(2.0), (e + 1).cast("double")) <= a,
                      e + 1).otherwise(e)

    e = corr(corr(F.floor(F.log2(a)).cast("int")))
    ee = F.greatest(e, F.lit(-1022))  # subnormals share e=-1022
    m = ((a * F.pow(F.lit(2.0), (-ee).cast("double")))
         * F.lit(4503599627370496.0)).cast("long")  # * 2^52, exact
    num = F.concat(
        F.when(d < 0, F.lit("-")).otherwise(F.lit("")),
        m.cast("string"), F.lit("p"), ee.cast("string"))
    return (
        F.when(F.isnan(d), F.lit("nan"))
        .when(d == F.lit(float("inf")), F.lit("inf"))
        .when(d == F.lit(float("-inf")), F.lit("-inf"))
        .when(d == F.lit(0.0), F.lit("0"))
        .otherwise(num)
    )


_DUCK_NUM_MACROS = """
CREATE OR REPLACE TEMP MACRO _ck_corr(a, e) AS
  CASE WHEN power(2.0, CAST(e AS DOUBLE)) > a THEN e - 1
       WHEN power(2.0, CAST(e + 1 AS DOUBLE)) <= a THEN e + 1
       ELSE e END;
CREATE OR REPLACE TEMP MACRO _ck_ee(a) AS
  greatest(_ck_corr(a, _ck_corr(a, CAST(floor(log2(a)) AS INTEGER))),
           -1022);
CREATE OR REPLACE TEMP MACRO _ck_m(a) AS
  CAST(a * power(2.0, CAST(-_ck_ee(a) AS DOUBLE))
         * 4503599627370496.0 AS BIGINT);
CREATE OR REPLACE TEMP MACRO _ck_num(x0) AS (
  CASE WHEN x0 IS NULL THEN NULL
       WHEN isnan(x0) THEN 'nan'
       WHEN x0 = 'inf'::DOUBLE THEN 'inf'
       WHEN x0 = '-inf'::DOUBLE THEN '-inf'
       WHEN x0 = 0 THEN '0'
       ELSE concat(CASE WHEN x0 < 0 THEN '-' ELSE '' END,
                   CAST(_ck_m(abs(x0)) AS VARCHAR), 'p',
                   CAST(_ck_ee(abs(x0)) AS VARCHAR)) END);
"""


def install_duck_canon(con):
    """Install the mantissa-extraction macros (mirror of
    :func:`_spark_num_canon`) on a DuckDB connection — idempotent."""
    for stmt in _DUCK_NUM_MACROS.split(";"):
        if stmt.strip():
            con.execute(stmt)


def spark_checksum(sdf):
    """(n_rows, fold1, fold2) computed ENTIRELY inside the Spark job —
    one aggregate row reaches the driver regardless of result size."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    fields = {f.name: f.dataType for f in sdf.schema.fields}
    parts = [F.coalesce(_spark_render(F.col(c), fields[c]), F.lit(_NULLTOK))
             for c in cols]
    s = F.concat_ws(_SEP, *parts)

    def fold(start):
        return F.sum(
            F.conv(F.substring(F.md5(s), start, 15), 16, 10)
            .cast("decimal(38,0)"))

    row = sdf.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(fold(1), F.lit(0).cast("decimal(38,0)")).alias("h1"),
        F.coalesce(fold(17), F.lit(0).cast("decimal(38,0)")).alias("h2"),
    ).collect()[0]
    return int(row["n"]), int(row["h1"]), int(row["h2"])


def _duck_render(col, typ):
    """DuckDB-side rendering of the identical canon. ``typ`` is the
    DESCRIBE type string (e.g. BIGINT, DOUBLE, VARCHAR[], DECIMAL(18,2))."""
    t = typ.upper()
    if t.endswith("[]"):
        inner = _duck_render("x", typ[:-2])
        lst = (f"list_transform({col}, "
               f"x -> coalesce({inner}, chr(5) || 'NULL'))")
        # array_to_string([]) is NULL in DuckDB but '' in Spark's
        # array_join — distinguish empty (⇒ '') from NULL list here
        return (f"CASE WHEN {col} IS NULL THEN NULL "
                f"ELSE coalesce(array_to_string({lst}, chr(2)), '') END")
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return f"_ck_num(CAST({col} AS DOUBLE) + 0.0)"
    if t.startswith("TIMESTAMP"):
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S.%f')"
    if (t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
              "BOOLEAN", "DATE", "VARCHAR")
            or t.startswith("DECIMAL")):
        return f"CAST({col} AS VARCHAR)"
    raise NotImplementedError(f"checksum canon: DuckDB type {typ}")


def duck_checksum(con, sql):
    """(n_rows, fold1, fold2) computed ENTIRELY inside DuckDB over the
    oracle query's result — the mirror of :func:`spark_checksum`."""
    install_duck_canon(con)
    desc = con.execute(
        f"DESCRIBE SELECT * FROM ({sql}) _q").fetchall()
    cols = sorted((name, typ) for name, typ, *_ in desc)
    parts = ", ".join(
        f"coalesce({_duck_render(_qid(name), typ)}, chr(5) || 'NULL')"
        for name, typ in cols)
    row = con.execute(
        f"WITH _rows AS (SELECT concat_ws(chr(31), {parts}) AS _s "
        f"FROM ({sql}) _q) "
        f"SELECT count(*), "
        f"coalesce(sum(CAST(('0x' || substr(md5(_s), 1, 15)) AS UBIGINT)"
        f"::HUGEINT), 0), "
        f"coalesce(sum(CAST(('0x' || substr(md5(_s), 17, 15)) AS UBIGINT)"
        f"::HUGEINT), 0) FROM _rows").fetchone()
    return int(row[0]), int(row[1]), int(row[2])


def _qid(name):
    return '"' + name.replace('"', '""') + '"'


def _cleanup_spill(path):
    shutil.rmtree(path, ignore_errors=True)


def _sweep_stale_spill_dirs():
    """Remove spill dirs left by DEAD drive processes (a crashed 100x
    run can strand tens of GiB under /tmp — ADVICE r10)."""
    for d in _glob.glob("/tmp/duckdb_spill_*"):
        try:
            pid = int(d.rsplit("_", 1)[-1])
        except ValueError:
            continue
        if pid != os.getpid() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(d, ignore_errors=True)


def run(keys=None, sf_dir=None, spark=None, oracle_overrides=None,
        con_setup=None, checksum_keys=(), pandas_twin=True):
    """Drive the queries()-vs-oracle_sql() contract at ``sf_dir``.

    ``oracle_overrides`` swaps individual keys' DuckDB SQL (the 100x
    CC-family union-find oracle registers a ``cc_labels`` temp table
    via ``con_setup`` and rewrites the recursive CTE against it);
    ``checksum_keys`` compares those keys with the engine-side
    checksum fold instead of collecting rows.

    ``pandas_twin=False`` skips the round-driver pandas-canon
    replication (which RE-EXECUTES both the Spark query and the
    oracle — doubling per-key cost). The twin exists to catch
    stringification divergences (Decimal trailing zeros, DATE vs
    TIMESTAMP forms), which are properties of the output SCHEMA, not
    the data volume — the 100x gate disables it because every key
    passes the twin at sf0.01/sf0.1/~sf1 and the 100x question is
    about VALUES at scale (rowcount + sorted cols + value hash keep
    full strength).

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
    # terminates with duckdb::IOException mid-key.  Registered for
    # atexit removal + stale dirs of dead PIDs swept at startup
    # (ADVICE r10: crashed 100x runs stranded tens of GiB).
    _sweep_stale_spill_dirs()
    spill_dir = f"/tmp/duckdb_spill_{os.getpid()}"
    atexit.register(_cleanup_spill, spill_dir)
    con.execute(f"SET temp_directory='{spill_dir}'")
    for t in TABLES:
        # driver testdata is one file per table; Spark-written blow-up
        # dirs (sweep_scale) need the part-file glob
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    if con_setup is not None:
        con_setup(con)
    qs = E.queries()
    oracles = dict(E.oracle_sql())
    oracles.update(oracle_overrides or {})
    todo = keys or list(qs)
    # a checksum key without an oracle would silently fall through to
    # the FULL path — sdf.collect() before the rows-only check, i.e.
    # the 10M-60M-row driver collect checksum mode exists to avoid
    # (ADVICE r11). Fail loudly instead.
    orphan_ck = set(checksum_keys) & set(todo) - set(oracles)
    if orphan_ck:
        raise ValueError(
            f"checksum_keys without an oracle (would fall through to a "
            f"full driver collect): {sorted(orphan_ck)}")
    n_match = n_mismatch = n_err = n_rowsonly = 0
    for k in todo:
        try:
            sdf = qs[k](spark, sf_dir)
            if k in checksum_keys and k in oracles:
                sn, sh1, sh2 = spark_checksum(sdf)
                on, oh1, oh2 = duck_checksum(con, oracles[k])
                # the fold walks cells in sorted-COLUMN-NAME order but
                # never hashes the names themselves — compare them
                # explicitly so a renamed column can't pass (ADVICE r11)
                ocols_ck = [d[0] for d in con.execute(
                    f"DESCRIBE SELECT * FROM ({oracles[k]}) _q").fetchall()]
                ck_cols_ok = sorted(sdf.columns) == sorted(ocols_ck)
                if (sn, sh1, sh2) == (on, oh1, oh2) and ck_cols_ok:
                    print(f"MATCH(ck) {k}: {sn} rows")
                    n_match += 1
                else:
                    print(f"MISMATCH(ck) {k}: rows {sn}/{on} "
                          f"h1 {sh1}/{oh1} h2 {sh2}/{oh2} "
                          f"cols_ok={ck_cols_ok}")
                    if not ck_cols_ok:
                        print(f"   spark cols: {sorted(sdf.columns)}")
                        print(f"   duck  cols: {sorted(ocols_ck)}")
                    n_mismatch += 1
                continue
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
            ok_pd = (not pandas_twin
                     or pandas_hash(sdf.toPandas())
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
