"""Reference-native CSV+metadata.txt compat source tests (FIXTURES.md §A)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_sql_engine_spark.sources.csv_metadata import (
    RefCatalog,
    load_ref_table,
    register_ref_tables,
)

META = """<begin_table>
table1
A
B
C
<end_table>
<begin_table>
table2
B
D
<end_table>
"""


@pytest.fixture()
def ref_dir(tmp_path):
    (tmp_path / "metadata.txt").write_text(META)
    (tmp_path / "table1.csv").write_text('1,2,3\n4,"5",6\n')
    (tmp_path / "table2.csv").write_text('2,200\n5,500\n9,900\n')
    return str(tmp_path)


def test_parse_metadata(ref_dir):
    cat = RefCatalog.parse(f"{ref_dir}/metadata.txt")
    assert cat.tables == {"table1": ["A", "B", "C"], "table2": ["B", "D"]}
    assert [f.dataType.simpleString() for f in cat.schema("table1").fields] == [
        "bigint", "bigint", "bigint"
    ]
    with pytest.raises(KeyError):
        cat.schema("nope")


def test_malformed_metadata(tmp_path):
    (tmp_path / "metadata.txt").write_text("<begin_table>\nt1\nA\n")  # no end
    with pytest.raises(ValueError, match="missing"):
        RefCatalog.parse(str(tmp_path / "metadata.txt"))


def test_load_and_query_ref_tables(spark, ref_dir):
    t1 = load_ref_table(spark, ref_dir, "table1")
    rows = sorted(tuple(r) for r in t1.collect())
    assert rows == [(1, 2, 3), (4, 5, 6)]  # quoted "5" parsed as integer

    register_ref_tables(spark, ref_dir)
    # the reference's flagship query shape: join via WHERE equality
    out = spark.sql(
        "SELECT table1.A, table2.D FROM table1, table2 WHERE table1.B = table2.B"
    ).collect()
    assert sorted(tuple(r) for r in out) == [(1, 200), (4, 500)]
    # aggregate shape
    agg = spark.sql("SELECT MAX(B), MIN(B), SUM(B), AVG(B), COUNT(B) FROM table2")
    assert tuple(agg.collect()[0]) == (9, 2, 16, 16 / 3, 3)


def test_cli_front_door(spark, ref_dir, capsys):
    """End-to-end reference UX: SQL string in, table.col header +
    comma-separated rows out."""
    from mini_sql_engine_spark.__main__ import run

    assert run("SELECT A, C FROM table1 WHERE A > 2", ref_dir, spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "table1.A,table1.C"
    assert out[1:] == ["4,6"]

    # ambiguous bare column (B is in both tables) stays unqualified
    assert run("SELECT table2.B, D FROM table2 WHERE D >= 500", ref_dir, spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "B,table2.D"
    assert sorted(out[1:]) == ["5,500", "9,900"]

    # reference-style error path: unknown table -> exit 1, error on stderr
    assert run("SELECT x FROM nope", ref_dir, spark) == 1
    assert "error:" in capsys.readouterr().err


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (planning-time pruning), not a data filter."""
    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.sources.sinks import write_partitioned

    from tests.conftest import SF_SMOKE

    ev = Catalog(spark, SF_SMOKE).table("events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, ["event_type"])

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    assert df.count() == ev.filter(F.col("event_type") == "click").count()


def test_bucketed_join_runs_without_exchange(spark, tmp_path):
    """Both sides bucketed on the join key with equal bucket counts →
    the sort-merge join must have NO shuffle exchange on either side."""
    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.sources.sinks import write_bucketed

    from tests.conftest import SF_SMOKE

    cat = Catalog(spark, SF_SMOKE)
    li = cat.table("lineitem").select("l_orderkey", "l_quantity")
    o = cat.table("orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(tmp_path / "li_b"))
    write_bucketed(o, "o_b", "o_orderkey", 8, path=str(tmp_path / "o_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        phys = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in phys, phys
        assert "Exchange" not in phys, phys
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """On a uniform 256x256 grid split into 16 files, a linear sort on
    x skips x-predicates but NOTHING on y; the z-ordered layout carves
    the grid into 4x4 blocks, so a 10-wide stripe on EITHER dimension
    prunes ~3/4 of the files from footer stats alone."""
    from mini_sql_engine_spark.sources.layout import (
        file_skipping_ratio,
        write_linear,
        write_zordered,
    )

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    lin, zed = str(tmp_path / "lin"), str(tmp_path / "zed")
    write_linear(grid, "x", lin, n_files=16)
    write_zordered(grid, ["x", "y"], zed, n_files=16, bits=8)

    # identical content, different layout
    assert (
        spark.read.parquet(zed).count() == spark.read.parquet(lin).count() == 65536
    )

    lin_x = file_skipping_ratio(lin, "x", 10, 19)
    lin_y = file_skipping_ratio(lin, "y", 10, 19)
    z_x = file_skipping_ratio(zed, "x", 10, 19)
    z_y = file_skipping_ratio(zed, "y", 10, 19)

    assert lin_x >= 0.8          # linear layout is perfect on its sort key
    assert lin_y == 0.0          # ... and useless on the other dimension
    assert z_x >= 0.5 and z_y >= 0.5, (z_x, z_y)  # z-order skips on BOTH


def test_json_orc_connectors_roundtrip(spark, tmp_path):
    """DataSource V2 gives json/orc for free — prove the claim with an
    explicit-schema roundtrip of a catalog table through both formats
    (schema-on-write preserved by orc; json re-read with the explicit
    StructType, never inferSchema)."""
    from mini_sql_engine_spark.catalog import Catalog

    from tests.conftest import SF_SMOKE

    nation = Catalog(spark, SF_SMOKE).table("nation")
    expect = sorted(map(tuple, nation.collect()))

    orc_path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(orc_path)
    assert sorted(map(tuple, spark.read.orc(orc_path).collect())) == expect

    json_path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(json_path)
    back = spark.read.schema(nation.schema).json(json_path)
    assert sorted(map(tuple, back.collect())) == expect


def test_approx_count_distinct_error_bound(spark):
    """The HLL++ sketch (the 100 TB cardinality path) must land within
    ~3x its configured relative standard deviation of the exact count."""
    from mini_sql_engine_spark.operators.aggregates import (
        approx_count_distinct,
        count_distinct,
    )
    from mini_sql_engine_spark.catalog import Catalog

    from tests.conftest import SF_SMOKE

    li = Catalog(spark, SF_SMOKE).table("lineitem")
    exact = count_distinct(li, "l_partkey", "n").collect()[0].n
    approx = approx_count_distinct(li, "l_partkey", "n", rsd=0.02).collect()[0].n
    assert abs(approx - exact) / exact <= 0.06, (approx, exact)


def test_quantile_zorder_balances_heavy_tailed_keys(spark):
    """On a heavy-tailed column, min/max z-order normalization
    collapses most rows into the bottom code (one outlier stretches
    the range); equi-depth quantile normalization must spread rows so
    no code holds more than a few times its fair share."""
    from mini_sql_engine_spark.sources.layout import (
        zorder_value,
        zorder_value_quantile,
    )

    # exp(x): 99% of mass lands in the bottom ~1% of the value range
    skewed = spark.range(20_000).select(
        F.exp(F.col("id") / 1000.0).alias("v"),
        (F.col("id") % 97).cast("double").alias("u"),
    )

    def max_code_share(zcol):
        counts = (
            skewed.select(zcol).groupBy("_zval").count()
            .agg(F.max("count").alias("m")).collect()[0].m
        )
        return counts / 20_000

    lin = max_code_share(zorder_value(skewed, ["v", "u"], bits=4))
    qnt = max_code_share(zorder_value_quantile(skewed, ["v", "u"], bits=4))
    # 2 cols x 4 bits = 256 codes; fair share ~0.4% of rows per code
    assert lin > 0.05, lin    # linear: >5% of rows pile into one code
    assert qnt < 0.02, qnt    # equi-depth: every code under 2%


def test_cli_runs_from_any_cwd(ref_dir, tmp_path):
    """Packaging contract: the launcher script works with cwd OUTSIDE
    the repo root (its own JVM; PYTHONPATH is derived from the script
    location, not inherited)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    launcher = os.path.join(repo, "scripts", "mini-sql-engine-spark")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [launcher, "--data-dir", ref_dir, "SELECT A, C FROM table1 WHERE A > 2"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout.strip().splitlines()
    assert out[0] == "table1.A,table1.C"
    assert out[1:] == ["4,6"]


def test_dynamic_partition_pruning_from_filtered_dim(spark, tmp_path):
    """The 100 TB star-join staple: fact partitioned by day, dim
    filtered at runtime → the fact scan must carry a dynamicpruning
    subquery in its PartitionFilters (only matching day directories
    are read), not scan all partitions.

    Two DPP preconditions this test pins (both found empirically —
    violating either silently disables pruning):
    - the dim predicate must be comparison-shaped: the optimizer's
      `isLikelySelective` heuristic rejects a bare boolean attribute
      filter (``.filter(F.col("is_hot"))`` → no DPP);
    - the join key types must match EXACTLY — partition-directory
      type inference reads ``day=2024-01-03`` back as DATE, and a
      cast inserted over the partition column kills the rewrite, so
      the dim side is cast to the fact's inferred type first."""
    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.sources.sinks import write_partitioned

    ev = (
        Catalog(spark, "/root/testdata/sf0.001").table("events")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    )
    fact = str(tmp_path / "events_by_day")
    write_partitioned(ev, fact, ["day"])
    dim = (
        ev.select("day").distinct()
        .withColumn("dom", F.dayofmonth(F.to_date("day")))
    )
    dim_path = str(tmp_path / "days")
    dim.write.parquet(dim_path)

    f = spark.read.parquet(fact)
    day_type = dict(f.dtypes)["day"]
    d = (
        spark.read.parquet(dim_path)
        .filter(F.col("dom") <= 3)
        .withColumn("day", F.col("day").cast(day_type))
    )
    joined = f.join(d, "day").groupBy("event_type").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = {r.event_type: r["count"] for r in joined.collect()}
    # oracle: recompute without the partitioned layout
    want = {
        r.event_type: r["count"]
        for r in ev.filter(F.dayofmonth(F.to_date("day")) <= 3)
        .groupBy("event_type").count().collect()
    }
    assert got == want


def test_compact_files_hits_target_count(spark, tmp_path):
    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.sources.layout import compact_files

    li = Catalog(spark, "/root/testdata/sf0.001").table("lineitem")
    src = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(src)  # 64 tiny files
    out = str(tmp_path / "compacted")
    n = compact_files(spark, src, out, target_file_mb=256)
    assert n == 1  # tiny table → one file target
    import glob
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n
    assert spark.read.parquet(out).count() == li.count()


def test_jdbc_roundtrip_partitioned_read_and_pushdown(spark, tmp_path):
    """JDBC interop against the Derby engine Spark bundles: write,
    read back through a 4-way range-partitioned scan (one connection
    per stride), and verify a filter compiles into the remote WHERE
    clause (* = fully pushed, Spark re-checks nothing)."""
    from mini_sql_engine_spark.catalog import Catalog
    from mini_sql_engine_spark.sources.jdbc import (
        DERBY_DRIVER, read_jdbc, write_jdbc,
    )
    from tests.conftest import SF_SMOKE

    url = f"jdbc:derby:{tmp_path}/jdbc_db;create=true"
    nation = Catalog(spark, SF_SMOKE).table("nation")
    write_jdbc(nation, url, "nation", DERBY_DRIVER, num_partitions=2)

    back = read_jdbc(spark, url, "nation", DERBY_DRIVER,
                     partition_col="n_nationkey", lower=0, upper=25,
                     num_partitions=4)
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))

    flt = back.filter(F.col("n_regionkey") == 1).select("n_name")
    plan_str = flt._sc._jvm.PythonSQLUtils.explainString(
        flt._jdf.queryExecution(), "formatted")
    pushed = [ln for ln in plan_str.splitlines() if "PushedFilters" in ln]
    assert pushed and "*EqualTo(n_regionkey,1)" in pushed[0], plan_str


def test_text_source_ingests_raw_corpus(spark, tmp_path):
    """Corpus ingestion from raw text files (one document per line):
    spark.read.text → (doc_id, text) with a deterministic id from the
    content hash — the classic first step of every corpus pipeline,
    and the id survives re-ingestion from any file layout."""
    lines = ["the quick brown fox", "jumps over the lazy dog",
             "pack my box with five dozen jugs"]
    (tmp_path / "a.txt").write_text("\n".join(lines[:2]) + "\n")
    (tmp_path / "b.txt").write_text(lines[2] + "\n")
    docs = (
        spark.read.text(str(tmp_path))
        .filter(F.col("value") != "")
        .select(
            F.xxhash64("value").alias("doc_id"),
            F.col("value").alias("text"),
        )
    )
    got = {r.text: r.doc_id for r in docs.collect()}
    assert set(got) == set(lines)
    # ids are content-derived: re-reading yields identical ids
    again = {r.text: r.doc_id
             for r in spark.read.text(str(tmp_path))
             .filter(F.col("value") != "")
             .select(F.xxhash64("value").alias("doc_id"),
                     F.col("value").alias("text")).collect()}
    assert got == again


def test_binary_file_source_feeds_multimodal_pipeline(spark, tmp_path):
    """Media ingestion: format('binaryFile') reads opaque files as
    (path, content: binary) rows, which slot straight into the
    multimodal feature extractor — the real files-on-disk front door
    for the (binary, metadata) column convention."""
    from mini_sql_engine_spark.pipeline.multimodal import extract_features

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    payloads = {f"m{i}.bin": bytes([i]) * (10 + i) for i in range(4)}
    for name, blob in payloads.items():
        (media_dir / name).write_bytes(blob)

    raw = (
        spark.read.format("binaryFile").load(str(media_dir))
        .select(
            F.xxhash64(F.col("path")).alias("media_id"),
            F.col("content").alias("payload"),
        )
    )
    assert raw.count() == 4
    feats = extract_features(raw, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 4
    assert all(r.n_bytes in {10 + i for i in range(4)} for r in rows)
