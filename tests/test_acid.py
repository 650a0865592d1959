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
    removed = table.vacuum(keep_last=1)
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
    assert t.vacuum(keep_last=1)  # orphan reclaimed
