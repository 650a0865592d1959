"""Batch MERGE (upsert) and slowly-changing-dimension history.

A warehouse engine needs MERGE even without a transactional table
format: the nightly "apply this changelog to the snapshot" job is a
single full-outer hash join away. Lakehouse MERGE implementations
(Delta/Iceberg, both public) do exactly this join under the hood and
add file-level conflict handling; the relational core is here.

Scale notes: the changelog is usually ≪ the snapshot — pass
``broadcast_updates=True`` and the merge becomes a broadcast join, no
shuffle of the snapshot at all. When both sides are large, the
full-outer join shuffles each side once on the key — the minimum any
MERGE can do. Snapshots stored bucketed by the merge key
(``sources.sinks.write_bucketed``) skip even that exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    insert_defaults: dict[str, Column] | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """SCD-1 MERGE: one full-outer join on ``keys``.

    - matched row            → update columns take the updates side;
    - only-in-updates (new)  → inserted; base-only columns come from
      ``insert_defaults`` (error if a non-key base column has none and
      the updates side lacks it);
    - only-in-base           → carried forward unchanged.

    Column contract: ``updates`` must contain ``keys`` plus a subset
    of base's columns (the ones being updated). The result has exactly
    base's schema. Update values must be non-null (a null update value
    is indistinguishable from "no update" in the coalesce plan; SCD
    deletes are a separate tombstone column, not nulls).
    """
    insert_defaults = insert_defaults or {}
    upd_cols = [c for c in updates.columns if c not in keys]
    missing = set(upd_cols) - set(base.columns)
    if missing:
        raise ValueError(f"updates columns not in base schema: {sorted(missing)}")

    u = F.broadcast(updates) if broadcast_updates else updates
    joined = base.alias("b").join(u.alias("u"), on=keys, how="full_outer")

    out: list[Column] = []
    for c in base.columns:
        if c in keys:
            out.append(F.col(c))  # USING-join key: already coalesced
        elif c in upd_cols:
            out.append(F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c))
        elif c in insert_defaults:
            out.append(F.coalesce(F.col(f"b.{c}"), insert_defaults[c]).alias(c))
        else:
            out.append(F.col(f"b.{c}").alias(c))
    return joined.select(*out)


def scd2_history(
    df: DataFrame,
    key: str,
    change_ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
    end_of_time: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Type-2 slowly-changing-dimension layout from a change log:
    each (key, change) row becomes a versioned interval
    ``[valid_from, valid_to)`` with ``is_current`` on the newest.

    One keyed window (lead over the per-key change order) — a single
    shuffle on the entity key, no self-join. The standard dimension-
    table shape every warehouse ETL emits. ``tiebreak`` makes the
    per-key order total when change timestamps can collide (module
    determinism rule).
    """
    from pyspark.sql.window import Window

    order_cols = [F.col(change_ts)] + (
        [F.col(tiebreak)] if tiebreak is not None else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.select(
        key,
        *attrs,
        F.col(change_ts).alias("valid_from"),
        F.coalesce(
            F.lead(change_ts).over(w), F.lit(end_of_time).cast("timestamp")
        ).alias("valid_to"),
        F.lead(change_ts).over(w).isNull().alias("is_current"),
    )
