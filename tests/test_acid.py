"""Behavior contract of the manifest-versioned ACID table layout
(sources/acid.py — VERDICT r10 #6): atomic commits, snapshot
isolation / time travel, MERGE/DELETE as copy-on-write versions,
schema evolution, optimistic-concurrency conflicts, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mini_sql_engine_spark.sources.acid import AcidTable, CommitConflict


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id BIGINT, name STRING, bal DOUBLE")
    path = str(tmp_path / "t")
    return AcidTable.create(spark, path, df)


def test_create_and_read_roundtrip(spark, table):
    assert table.version() == 0
    assert _rows(table.read(), "id", "name", "bal") == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
    # re-open by path gives the same snapshot
    again = AcidTable(spark, table.path)
    assert _rows(again.read(), "id") == [(1,), (2,), (3,)]


def test_append_carries_old_dirs_and_time_travels(spark, table):
    table.append(spark.createDataFrame(
        [(4, "d", 40.0)], "id BIGINT, name STRING, bal DOUBLE"))
    assert table.version() == 1
    assert _rows(table.read(), "id") == [(1,), (2,), (3,), (4,)]
    # version 0 still reads the original three rows
    assert _rows(table.read(version=0), "id") == [(1,), (2,), (3,)]
    # append is O(1) metadata: v1 lists v0's data dir by reference
    h = table.history()
    assert h[0]["dirs"][0] in h[1]["dirs"]


def test_merge_updates_inserts_and_carries(spark, table):
    updates = spark.createDataFrame(
        [(2, 99.0), (5, 55.0)], "id BIGINT, bal DOUBLE")
    table.merge(updates, keys=["id"])
    got = dict((r["id"], r["bal"]) for r in table.read().collect())
    assert got == {1: 10.0, 2: 99.0, 3: 30.0, 5: 55.0}
    # pre-merge snapshot unchanged (snapshot isolation)
    pre = dict((r["id"], r["bal"]) for r in table.read(0).collect())
    assert pre == {1: 10.0, 2: 20.0, 3: 30.0}


def test_delete_where_is_versioned_and_null_safe(spark, table):
    table.append(spark.createDataFrame(
        [(6, None, 60.0)], "id BIGINT, name STRING, bal DOUBLE"))
    table.delete_where("name = 'b'")  # NULL name must SURVIVE
    assert _rows(table.read(), "id") == [(1,), (3,), (6,)]
    assert table.history()[-1]["operation"] == "delete"
    assert _rows(table.read(version=1), "id") == [(1,), (2,), (3,), (6,)]


def test_schema_evolution_widens_and_rejects_retypes(spark, table):
    table.append(spark.createDataFrame(
        [(7, "g", 70.0, "fr")], "id BIGINT, name STRING, bal DOUBLE, "
        "lang STRING"))
    out = table.read()
    assert out.columns == ["id", "name", "bal", "lang"]
    langs = dict((r["id"], r["lang"]) for r in out.collect())
    assert langs[7] == "fr" and langs[1] is None  # old files read NULL
    with pytest.raises(TypeError, match="never retypes"):
        table.append(spark.createDataFrame(
            [(8, "h", "oops")], "id BIGINT, name STRING, bal STRING"))


def test_concurrent_commit_conflict(spark, table):
    """Two writers race version 1: exactly one wins the os.link CAS."""
    winner = AcidTable(spark, table.path)
    loser = AcidTable(spark, table.path)
    df = spark.createDataFrame(
        [(9, "w", 90.0)], "id BIGINT, name STRING, bal DOUBLE")
    winner.append(df)
    with pytest.raises(CommitConflict):
        # the loser publishes into the version the winner just took
        base = loser._manifest(0)
        loser._commit(df, "append", base["version"] + 1, base["dirs"])
    # losing commit left no visible state: latest is the winner's
    assert table.version() == 1
    assert _rows(table.read(), "id") == [(1,), (2,), (3,), (9,)]


def test_overwrite_then_vacuum_reclaims_unreferenced(spark, table):
    table.overwrite(spark.createDataFrame(
        [(10, "z", 1.0)], "id BIGINT, name STRING, bal DOUBLE"))
    assert _rows(table.read(), "id") == [(10,)]
    assert _rows(table.read(0), "id") == [(1,), (2,), (3,)]
    # default retention refuses fresh dirs (in-flight-commit safety);
    # retention 0 = caller asserts no writer is in flight
    assert table.vacuum(keep_last=1) == []
    removed = table.vacuum(keep_last=1, retention_seconds=0.0)
    assert len(removed) == 1  # v0's data dir is unreferenced by v1
    assert _rows(table.read(), "id") == [(10,)]  # survivor intact
    with pytest.raises(FileNotFoundError):
        table.read(0)  # time travel past the horizon is gone
    data_root = os.path.join(table.path, "data")
    assert len(os.listdir(data_root)) == 1


def test_failed_writer_leaves_no_visible_state(spark, tmp_path):
    """A crash between data-write and publish = orphan dir only;
    readers see the prior version; vacuum reclaims the orphan."""
    df = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    t = AcidTable.create(spark, str(tmp_path / "t2"), df)
    # simulate a crashed writer: data written, manifest never published
    t._write_data(df.withColumn("name", F.lit("ghost")), version=1)
    assert t.version() == 0
    assert _rows(t.read(), "name") == [("a",)]
    # the orphan is YOUNG: default retention protects it — it could
    # be an in-flight commit about to publish (ADVICE r11)
    assert t.vacuum(keep_last=1) == []
    assert t.vacuum(keep_last=1, retention_seconds=0.0)  # reclaimed


def test_merge_conflicts_instead_of_lost_update(spark, table, monkeypatch):
    """ADVICE r11: snapshot and CAS must share ONE base version. A
    concurrent commit landing between merge's snapshot and its
    publish must raise CommitConflict — not be silently overwritten."""
    other = AcidTable(spark, table.path)
    orig = table._write_data
    fired = {"n": 0}

    def interleave(df, version):
        if fired["n"] == 0:  # first write = the merge's own data dir
            fired["n"] += 1
            other.append(spark.createDataFrame(
                [(100, "conc", 1.0)], "id BIGINT, name STRING, bal DOUBLE"))
        return orig(df, version)

    monkeypatch.setattr(table, "_write_data", interleave)
    updates = spark.createDataFrame([(2, 99.0)], "id BIGINT, bal DOUBLE")
    with pytest.raises(CommitConflict):
        table.merge(updates, keys=["id"])
    # the concurrent writer's row SURVIVED (nothing was lost)
    assert (100,) in _rows(table.read(), "id")


def test_with_retry_lands_both_writers(spark, table, monkeypatch):
    """Bounded-retry commit helper: a writer that loses the CAS once
    retries on a fresh snapshot and lands; both writers' rows end up
    in the table."""
    other = AcidTable(spark, table.path)
    orig = table._write_data
    fired = {"n": 0}

    def interleave(df, version):
        if fired["n"] == 0:
            fired["n"] += 1
            other.append(spark.createDataFrame(
                [(200, "w1", 1.0)], "id BIGINT, name STRING, bal DOUBLE"))
        return orig(df, version)

    monkeypatch.setattr(table, "_write_data", interleave)
    table.with_retry(lambda: table.append(spark.createDataFrame(
        [(201, "w2", 2.0)], "id BIGINT, name STRING, bal DOUBLE")))
    ids = [r[0] for r in _rows(table.read(), "id")]
    assert 200 in ids and 201 in ids
    assert table.version() == 2  # two commits, no lost update


def test_stats_skip_dirs_on_filtered_read(spark, table):
    """Phase-2 data skipping (VERDICT r11 #2): per-dir min/max stats
    in the manifest prune whole directories on a filtered read, and
    the pruned read returns exactly the filtered rows."""
    table.append(spark.createDataFrame(
        [(101, "x", 1.0), (102, "y", 2.0)],
        "id BIGINT, name STRING, bal DOUBLE"))
    table.append(spark.createDataFrame(
        [(201, "z", 3.0)], "id BIGINT, name STRING, bal DOUBLE"))
    m = table._manifest()
    assert len(m["dirs"]) == 3 and all(
        "id" in m["stats"][d] for d in m["dirs"])
    # >= 201 keeps only the third dir
    kept, skipped = table.prune_dirs(m, ("id", ">=", 201))
    assert len(kept) == 1 and len(skipped) == 2
    assert table.skipping_ratio(("id", ">=", 201)) == pytest.approx(2 / 3)
    assert _rows(table.read(where=("id", ">=", 201)), "id") == [(201,)]
    # equality predicate inside the middle dir's range
    assert table.skipping_ratio(("id", "=", 102)) == pytest.approx(2 / 3)
    assert _rows(table.read(where=("id", "=", 102)), "id") == [(102,)]
    # string stats prune too
    assert _rows(table.read(where=("name", ">=", "z")), "id") == [(201,)]
    # a column with no stats in some dir is kept (correctness first)
    assert table.skipping_ratio(("nope", "=", 1)) == 0.0


def test_optimize_bin_packs_small_dirs(spark, table):
    """Phase-3 compaction (VERDICT r11 #3): optimize() rewrites the
    small dirs into one, reads stay row-identical, and vacuum
    reclaims the packed originals."""
    for i in range(3):
        table.append(spark.createDataFrame(
            [(10 + i, "s", float(i))], "id BIGINT, name STRING, bal DOUBLE"))
    before = _rows(table.read(), "id", "name", "bal")
    v = table.optimize()  # everything here is tiny -> one packed dir
    assert v == table.version() == 4
    m = table._manifest()
    assert len(m["dirs"]) == 1 and m["operation"] == "optimize"
    assert _rows(table.read(), "id", "name", "bal") == before
    # packed dir carries fresh stats; originals reclaimable
    assert "id" in m["stats"][m["dirs"][0]]
    assert len(table.vacuum(keep_last=1, retention_seconds=0.0)) == 4
    assert _rows(table.read(), "id", "name", "bal") == before
    # idempotent: a second optimize with one dir is a no-op version
    assert table.optimize() == 4


def test_optimize_carries_large_dirs_by_reference(spark, tmp_path):
    """Dirs at/above the small_bytes threshold are NOT rewritten:
    they stay in the manifest by reference, with their stats."""
    import pyspark.sql.functions as SF

    big_df = spark.range(20000).select(
        SF.col("id"), SF.concat(SF.lit("n"), SF.col("id")).alias("name"),
        (SF.col("id") * 1.5).alias("bal")).coalesce(1)
    t = AcidTable.create(spark, str(tmp_path / "t4"), big_df)
    t.append(spark.createDataFrame(
        [(50000, "x", 5.0)], "id BIGINT, name STRING, bal DOUBLE"))
    t.append(spark.createDataFrame(
        [(50001, "y", 6.0)], "id BIGINT, name STRING, bal DOUBLE"))
    m_before = t._manifest()
    big = m_before["dirs"][0]  # v0's 20k-row dir
    before = _rows(t.read(), "id", "name", "bal")
    # threshold between v0's dir size and the 1-row appends
    cut = table_cut = t._dir_bytes(big)
    assert all(t._dir_bytes(d) < table_cut for d in m_before["dirs"][1:])
    v = t.optimize(small_bytes=cut)
    m = t._manifest(v)
    assert big in m["dirs"] and len(m["dirs"]) == 2  # big + one packed
    assert m["stats"][big] == m_before["stats"][big]  # stats carried
    assert _rows(t.read(), "id", "name", "bal") == before


def test_data_skipping_null_and_statless_columns_safe(spark, tmp_path):
    """Stats never make a read WRONG: an all-NULL column yields no
    stats for its dir (min/max are NULL) so the dir is kept, and the
    row filter still applies — NULLs never match a comparison."""
    df1 = spark.createDataFrame(
        [(1, None), (2, None)], "id BIGINT, score DOUBLE")
    t = AcidTable.create(spark, str(tmp_path / "t3"), df1)
    t.append(spark.createDataFrame(
        [(3, 7.5)], "id BIGINT, score DOUBLE"))
    m = t._manifest()
    assert "score" not in m["stats"][m["dirs"][0]]  # all-NULL: dropped
    assert "score" in m["stats"][m["dirs"][1]]
    # dir 0 has no score stats -> kept; its NULL rows filtered out
    assert _rows(t.read(where=("score", ">", 5.0)), "id") == [(3,)]
    assert t.skipping_ratio(("score", ">", 5.0)) == 0.0  # kept both
    assert _rows(t.read(where=("score", "<", 5.0)), "id") == []


def test_streaming_idempotence_survives_vacuum_and_foreign_commits(
        spark, tmp_path):
    """The per-stream high-water mark rides EVERY manifest, so replay
    detection survives vacuum truncating old manifests and foreign
    commits landing between micro-batches (code-review r12)."""
    df = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    t = AcidTable.create(spark, str(tmp_path / "t5"), df.limit(0))
    sink = t.streaming_sink("s1")
    sink(df, 0)
    sink(spark.createDataFrame([(2, "b")], "id BIGINT, name STRING"), 1)
    # foreign commit (no batch_id) then vacuum away the stream's own
    # manifests — only the latest (foreign) manifest remains
    t.append(spark.createDataFrame([(9, "f")], "id BIGINT, name STRING"))
    t.vacuum(keep_last=1, retention_seconds=0.0)
    v = t.version()
    rows = _rows(t.read(), "id")
    # replayed batches are STILL no-ops
    sink(df, 0)
    sink(spark.createDataFrame([(2, "b")], "id BIGINT, name STRING"), 1)
    assert t.version() == v and _rows(t.read(), "id") == rows
    # a genuinely new batch commits normally
    sink(spark.createDataFrame([(3, "c")], "id BIGINT, name STRING"), 2)
    assert t.version() == v + 1
    assert (3,) in _rows(t.read(), "id")


def test_prune_never_crosses_temporal_shapes(spark, tmp_path):
    """A DATE-shaped predicate key against TIMESTAMP-shaped stats must
    NOT prune (ISO strings of different shapes mis-order at equality
    boundaries); the read stays row-identical to the unpruned filter
    (code-review r12)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 8, 16, 0, 0, 0)),
         (2, dt.datetime(2026, 8, 17, 12, 0, 0))],
        "id BIGINT, ts TIMESTAMP")
    t = AcidTable.create(spark, str(tmp_path / "t6"), df)
    m = t._manifest()
    assert "ts" in m["stats"][m["dirs"][0]]  # timestamp stats exist
    key = dt.date(2026, 8, 16)
    # date key vs timestamp stats: cross-shape -> keep (no prune)
    assert t.skipping_ratio(("ts", "=", key)) == 0.0
    got = _rows(t.read(where=("ts", "=", key)), "id")
    expect = _rows(t.read().filter(F.col("ts") == F.lit(key)), "id")
    assert got == expect == [(1,)]
    # same-shape timestamp key still prunes correctly
    assert _rows(t.read(
        where=("ts", ">=", dt.datetime(2026, 8, 17, 0, 0, 0))),
        "id") == [(2,)]


def test_decimal_stats_widen_outward(spark, tmp_path):
    """DECIMAL stats are float-lossy; they widen OUTWARD so a strict
    inequality at a rounded boundary cannot prune a dir holding
    matching rows (code-review r12)."""
    from decimal import Decimal as D

    df = spark.createDataFrame(
        [(1, D("1.00000000000000000001"))],
        "id BIGINT, d DECIMAL(38,20)")
    t = AcidTable.create(spark, str(tmp_path / "t7"), df)
    # float(1.00000000000000000001) == 1.0 exactly; unwidened stats
    # would prune on d > 1
    assert _rows(t.read(where=("d", ">", D("1"))), "id") == [(1,)]
    assert t.skipping_ratio(("d", ">", D("1"))) == 0.0


def test_guards_reject_bad_retry_and_bad_op(spark, table):
    with pytest.raises(ValueError, match="retries must be >= 1"):
        table.with_retry(lambda: None, retries=0)
    with pytest.raises(ValueError, match="unsupported where-op"):
        table.read(where=("id", "!=", 1))
    with pytest.raises(ValueError, match="unsupported op"):
        table.prune_dirs(table._manifest(), ("id", "=>", 1))


# ──────────────── round-13 hardening (VERDICT/ADVICE r12) ────────────────


def _n_scans(df):
    """Parquet relation (scan) nodes in the optimized logical plan."""
    return df._jdf.queryExecution().optimizedPlan().toString().count(
        "Relation")


def test_read_plan_scan_nodes_stay_bounded_after_many_stream_commits(
        spark, tmp_path):
    """VERDICT r12 #2: sustained streaming ingest (one data dir per
    micro-batch) must NOT grow the read plan — dirs of one schema
    generation are read with ONE multi-path parquet scan, so after 50
    micro-batch commits the plan still holds a single relation node
    (the old per-dir unionByName fold built 50)."""
    t = AcidTable.create(spark, str(tmp_path / "t8"), spark.createDataFrame(
        [(0, 0.0)], "id BIGINT, v DOUBLE"))
    sink = t.streaming_sink("s")
    for i in range(1, 51):
        sink(spark.createDataFrame([(i, float(i))],
                                   "id BIGINT, v DOUBLE"), i)
    assert t.version() == 50
    assert len(t._manifest()["dirs"]) == 51
    out = t.read()
    assert _n_scans(out) == 1
    assert out.count() == 51
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(51))
    # a pruned read keeps the bound too
    assert _n_scans(t.read(where=("id", ">=", 25))) <= 1


def test_schema_generations_bound_plan_after_evolution(spark, tmp_path):
    """Schema evolution adds exactly one generation (one extra scan
    node), never one per commit; old rows pad NULL for new columns."""
    t = AcidTable.create(spark, str(tmp_path / "t9"), spark.createDataFrame(
        [(1, "a")], "id BIGINT, name STRING"))
    for i in range(2, 6):
        t.append(spark.createDataFrame([(i, "x")],
                                       "id BIGINT, name STRING"))
    t.append(spark.createDataFrame(
        [(6, "w", 9.5)], "id BIGINT, name STRING, score DOUBLE"))
    t.append(spark.createDataFrame(
        [(7, "z", 1.5)], "id BIGINT, name STRING, score DOUBLE"))
    m = t._manifest()
    assert len(m["dirs"]) == 7
    assert len(m["schema_gens"]) == 2
    out = t.read()
    assert _n_scans(out) == 2
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got == {1: None, 2: None, 3: None, 4: None, 5: None,
                   6: 9.5, 7: 1.5}


def test_zorder_optimize_improves_multi_column_skipping(spark, tmp_path):
    """VERDICT r12 #3: ``optimize(zorder_by=[x, y])`` rewrites the
    snapshot along the Morton curve into slice dirs whose manifest
    stats are tight on BOTH columns — ``skipping_ratio`` strictly
    improves for predicates on either column, rows stay identical,
    and vacuum keeps the (prefix-referenced) slice dirs alive."""
    rows = [(i, i % 64, (i // 64) % 32, float(i)) for i in range(2048)]
    schema = "id BIGINT, x BIGINT, y BIGINT, v DOUBLE"
    t = AcidTable.create(spark, str(tmp_path / "t10"),
                         spark.createDataFrame(rows[:512], schema))
    for lo in (512, 1024, 1536):
        t.append(spark.createDataFrame(rows[lo:lo + 512], schema))
    before = _rows(t.read(), "id", "x", "y", "v")
    # every dir spans the full x range -> nothing skippable
    assert t.skipping_ratio(("x", "<=", 7)) == 0.0
    v = t.optimize(zorder_by=["x", "y"], n_slices=8)
    assert t._manifest()["operation"] == "optimize-zorder"
    assert t.version() == v
    after = _rows(t.read(), "id", "x", "y", "v")
    assert after == before
    rx = t.skipping_ratio(("x", "<=", 7))
    ry = t.skipping_ratio(("y", "<=", 3))
    assert rx > 0.0, "z-order gave no skipping on x"
    assert ry > 0.0, "z-order gave no skipping on y"
    # pruned read == full filter, row for row
    assert _rows(t.read(where=("x", "<=", 7)), "id") == _rows(
        t.read().filter(F.col("x") <= 7), "id")
    # vacuum must treat prefix-referenced slice dirs as live
    t.vacuum(keep_last=1, retention_seconds=0.0)
    assert _rows(t.read(), "id", "x", "y", "v") == before


def test_stream_rebatch_fresh_checkpoint_contract(spark, tmp_path):
    """VERDICT r12 #5, pinned: a fresh-checkpoint re-run that
    RE-BATCHES the source under different trigger sizing is treated
    as replay — batch_ids at or below the high-water mark are skipped
    wholesale (rows never duplicate, rows that moved into a lower
    batch_id are not re-appended). A NEW stream_id re-delivers."""
    t = AcidTable.create(spark, str(tmp_path / "t11"),
                         spark.createDataFrame([(0,)], "id BIGINT"))
    sink = t.streaming_sink("app-1")
    b0 = spark.createDataFrame([(1,), (2,)], "id BIGINT")
    b1 = spark.createDataFrame([(3,)], "id BIGINT")
    sink(b0, 0)
    sink(b1, 1)
    assert _rows(t.read(), "id") == [(0,), (1,), (2,), (3,)]
    # fresh checkpoint, coarser batching: all four rows land in batch 0
    replay = t.streaming_sink("app-1")
    replay(b0.union(b1), 0)
    assert _rows(t.read(), "id") == [(0,), (1,), (2,), (3,)]
    # same data under a NEW stream_id is a new app: it appends
    t.streaming_sink("app-2")(spark.createDataFrame([(9,)], "id BIGINT"), 0)
    assert _rows(t.read(), "id") == [(0,), (1,), (2,), (3,), (9,)]


def test_dotted_column_names_commit_and_read(spark, tmp_path):
    """ADVICE r12: a legal top-level column named with a dot must not
    be parsed as a nested-field reference by the stats step — commits
    succeed, stats are recorded, reads round-trip."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("a.b", T.DoubleType())])
    t = AcidTable.create(spark, str(tmp_path / "t12"),
                         spark.createDataFrame([(1, 1.5)], schema))
    t.append(spark.createDataFrame([(2, 2.5)], schema))
    m = t._manifest()
    assert all("a.b" in m["stats"][rel] for rel in m["dirs"])
    got = sorted((r["id"], r["a.b"]) for r in t.read().collect())
    assert got == [(1, 1.5), (2, 2.5)]


def test_tz_offset_stat_keys_never_prune(spark, tmp_path):
    """ADVICE r12: an offset-bearing ISO key ('…+02:00') against
    naive timestamp stats compares timezone-blind lexicographically —
    such pairs must be declared incomparable (dir kept)."""
    from mini_sql_engine_spark.sources.acid import _stat_comparable

    naive = "2026-08-16T10:00:00"
    aware = "2026-08-16T10:00:00+02:00"
    assert _stat_comparable(naive, naive)
    assert not _stat_comparable(naive, aware)
    assert not _stat_comparable(aware, naive)
    # two aware strings may carry DIFFERENT offsets — also incomparable
    assert not _stat_comparable(aware, "2026-08-16T09:00:00+01:00")
    assert _stat_comparable("2026-08-16", "2026-08-17")  # plain dates ok
    # end-to-end: an aware key over naive stats keeps the dir
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 8, 16, 10, 0, 0))], "id BIGINT, ts TIMESTAMP")
    t = AcidTable.create(spark, str(tmp_path / "t13"), df)
    key = dt.datetime(2026, 8, 16, 23, 0, 0,
                      tzinfo=dt.timezone(dt.timedelta(hours=2)))
    assert t.skipping_ratio(("ts", ">", key)) == 0.0
