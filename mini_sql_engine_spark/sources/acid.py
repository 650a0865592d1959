"""Manifest-versioned parquet tables: the minimal ACID layer under
``merge_upsert`` / ``cdc_apply`` / ``scd2_history`` (VERDICT r10 #6).

Every production 100 TB pipeline eventually needs four storage-level
guarantees that raw parquet directories cannot give: atomic commits
(readers never see a half-written table), snapshot isolation /
time-travel reads, MERGE that rewrites data without torn state, and
schema evolution recorded per version. Delta Lake and Iceberg (both
public) deliver them with the same core design used here — an
append-only COMMIT LOG of manifest files naming the data files of
each version — minus their engine integrations:

* data is immutable: each commit writes a fresh
  ``data/c{version}-{uuid}/`` parquet directory and NEVER touches
  prior directories;
* a manifest (``_manifests/v{N}.json``) lists the FULL set of data
  directories making up version N (full listing, not a delta — a
  reader needs exactly one manifest), plus the schema and operation;
* commits are atomic + optimistically concurrent: the manifest is
  staged to a temp name and published with ``os.link`` — hard-link
  creation fails with EEXIST when the version already exists, so of
  two racing writers exactly one wins and the loser gets a
  ``CommitConflict`` (the compare-and-swap every table format builds
  on; on real object stores this is the conditional-PUT /
  put-if-absent call);
* readers resolve a version by listing manifests only — a crashed
  writer leaves at most an orphaned data directory and a temp file,
  both invisible to every reader and reclaimed by ``vacuum``.

Scale notes: the manifest holds directory names, not row data — a
commit is O(1) metadata no matter how many rows moved. MERGE rewrites
via the existing relational core (``operators.merge.merge_upsert``),
i.e. one broadcast or shuffle join; the snapshot-write is the same
parquet write the pipeline would do anyway. Readers union the listed
directories ``unionByName(allowMissingColumns=True)`` so old files
stay readable after columns are added (schema evolution on disk
without rewriting history).

Kept OUT of the registry on purpose (the Qkey contract is frozen at
339); the behavior contract lives in ``tests/test_acid.py``.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mini_sql_engine_spark.operators.merge import merge_upsert

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency lost the compare-and-swap) — re-read and retry."""


def _now_iso() -> str:
    return datetime.now(timezone.utc).isoformat(timespec="seconds")


class AcidTable:
    """Handle on a manifest-versioned parquet table rooted at
    ``path`` (a local/posix directory; the layout is object-store
    portable — only the publish CAS is filesystem-specific here)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._mdir = os.path.join(path, _MANIFEST_DIR)
        if not os.path.isdir(self._mdir):
            raise FileNotFoundError(
                f"{path} is not an AcidTable (no {_MANIFEST_DIR}/) — "
                "use AcidTable.create()")

    # ------------------------------------------------------------ #
    # creation / commit plumbing                                    #
    # ------------------------------------------------------------ #

    @classmethod
    def create(cls, spark: SparkSession, path: str,
               df: DataFrame) -> "AcidTable":
        """Create version 0 holding ``df``. Fails if a table already
        exists at ``path``."""
        mdir = os.path.join(path, _MANIFEST_DIR)
        os.makedirs(mdir, exist_ok=False)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        table = cls.__new__(cls)
        table.spark, table.path, table._mdir = spark, path, mdir
        table._commit(df, operation="create", version=0, dirs=None)
        return table

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:08d}.json")

    def _versions(self) -> list[int]:
        return sorted(
            int(name[1:-5])
            for name in os.listdir(self._mdir)
            if name.startswith("v") and name.endswith(".json")
        )

    def version(self) -> int:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"{self.path}: no committed version")
        return versions[-1]

    def _manifest(self, version: int | None = None) -> dict:
        v = self.version() if version is None else version
        path = self._manifest_path(v)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{self.path}: version {v} does not exist "
                f"(have {self._versions()})")
        with open(path) as fh:
            return json.load(fh)

    def _write_data(self, df: DataFrame, version: int) -> str:
        rel = os.path.join(_DATA_DIR, f"c{version:08d}-{uuid.uuid4().hex}")
        df.write.mode("error").parquet(os.path.join(self.path, rel))
        return rel

    def _publish(self, manifest: dict) -> None:
        """Atomic compare-and-swap publish: stage under a temp name,
        ``os.link`` to the version name (EEXIST ⇒ lost the race),
        always unlink the stage file."""
        final = self._manifest_path(manifest["version"])
        stage = os.path.join(self._mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(stage, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(stage, final)
        except FileExistsError:
            raise CommitConflict(
                f"{self.path}: version {manifest['version']} was "
                "committed concurrently — re-read the table and retry"
            ) from None
        finally:
            os.unlink(stage)

    def _commit(self, df: DataFrame, operation: str,
                version: int, dirs: list[str] | None,
                extra: dict | None = None) -> int:
        """Write ``df`` as a fresh data dir and publish the manifest
        for ``version`` listing ``dirs`` + the new dir."""
        return self._commit_with_schema(
            df, operation, version, list(dirs or []),
            df.schema.jsonValue(), extra)

    # ------------------------------------------------------------ #
    # reads                                                         #
    # ------------------------------------------------------------ #

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: latest). Data dirs
        written under OLDER schemas are widened to the manifest schema
        (missing columns → NULL) — schema evolution without rewrites."""
        m = self._manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        out = None
        for rel in m["dirs"]:
            part = self.spark.read.parquet(os.path.join(self.path, rel))
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True)
        if out is None:
            return self.spark.createDataFrame([], schema)
        for field in schema.fields:
            if field.name not in out.columns:
                from pyspark.sql import functions as F
                out = out.withColumn(
                    field.name, F.lit(None).cast(field.dataType))
        return out.select([f.name for f in schema.fields])

    def history(self) -> list[dict]:
        """All manifests, oldest first — the table's commit log."""
        return [self._manifest(v) for v in self._versions()]

    # ------------------------------------------------------------ #
    # writes (each = one atomic version)                            #
    # ------------------------------------------------------------ #

    def append(self, df: DataFrame) -> int:
        """Add rows; prior data dirs are carried by reference (O(1)
        metadata — nothing is rewritten). New columns are allowed and
        widen the schema; old files read as NULL for them."""
        base = self._manifest()
        schema = (self._evolve_schema(base["schema"], df)
                  or base["schema"])
        return self._commit_with_schema(
            df, "append", base["version"] + 1, base["dirs"], schema)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents atomically; prior versions stay
        time-travel readable."""
        base = self._manifest()
        return self._commit(df, "overwrite", base["version"] + 1, dirs=[])

    def merge(self, updates: DataFrame, keys: list[str],
              broadcast_updates: bool = True) -> int:
        """MERGE (SCD-1 upsert) ``updates`` into the snapshot via the
        relational core and commit the result as one new version —
        matched keys update, new keys insert, others carry forward."""
        merged = merge_upsert(self.read(), updates, keys,
                              broadcast_updates=broadcast_updates)
        base = self._manifest()
        return self._commit(merged, "merge", base["version"] + 1, dirs=[])

    def delete_where(self, condition: str) -> int:
        """Delete rows matching the SQL ``condition`` (a copy-on-write
        rewrite of the survivors, like Delta's non-vacuum DELETE)."""
        from pyspark.sql import functions as F
        # three-valued logic: DELETE removes rows where the condition
        # is TRUE; NULL-condition rows survive (Delta/ANSI semantics)
        survivors = self.read().filter(
            ~F.coalesce(F.expr(condition), F.lit(False)))
        base = self._manifest()
        return self._commit(survivors, "delete", base["version"] + 1,
                            dirs=[], extra={"condition": condition})

    # ------------------------------------------------------------ #
    # maintenance                                                   #
    # ------------------------------------------------------------ #

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions
        and delete data dirs no retained version references. Returns
        the deleted dirs. Time travel only reaches retained versions
        afterwards."""
        import shutil

        versions = self._versions()
        keep = versions[-max(keep_last, 1):]
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._manifest(v)["dirs"])
        removed = []
        data_root = os.path.join(self.path, _DATA_DIR)
        for name in sorted(os.listdir(data_root)):
            rel = os.path.join(_DATA_DIR, name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
        for v in versions:
            if v not in keep:
                os.unlink(self._manifest_path(v))
        return removed

    # ------------------------------------------------------------ #
    # helpers                                                       #
    # ------------------------------------------------------------ #

    def _evolve_schema(self, base_schema_json: dict,
                       df: DataFrame) -> dict | None:
        """None if ``df`` adds nothing; else the widened schema json.
        Type changes on existing columns are rejected (a silent cast
        would corrupt history)."""
        base = T.StructType.fromJson(base_schema_json)
        base_names = {f.name: f.dataType for f in base.fields}
        out = list(base.fields)
        changed = False
        for f in df.schema.fields:
            if f.name not in base_names:
                out.append(f)
                changed = True
            elif base_names[f.name] != f.dataType:
                raise TypeError(
                    f"append: column {f.name!r} is "
                    f"{base_names[f.name].simpleString()} in the table "
                    f"but {f.dataType.simpleString()} in the new data — "
                    "schema evolution adds columns, it never retypes")
        return T.StructType(out).jsonValue() if changed else None

    def _commit_with_schema(self, df: DataFrame, operation: str,
                            version: int, dirs: list[str],
                            schema_json: dict,
                            extra: dict | None = None) -> int:
        all_dirs = list(dirs) + [self._write_data(df, version)]
        manifest = {
            "version": version,
            "parent": version - 1 if version else None,
            "operation": operation,
            "timestamp": _now_iso(),
            "schema": schema_json,
            "dirs": all_dirs,
            **(extra or {}),
        }
        self._publish(manifest)
        return version
