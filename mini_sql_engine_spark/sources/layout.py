"""Z-order (Morton-curve) file layout for multi-column data skipping.

Parquet readers prune row groups / files whose min-max statistics
can't satisfy the predicate. A layout sorted linearly on column A
gives perfect skipping on A and ~none on B; interleaving the bits of
A and B (a Morton / Z-curve) makes file ranges narrow on BOTH columns
at once, so point/range predicates on either column (or both) skip
most files. This is the mechanism behind Delta/Iceberg `ZORDER BY` /
sort-order optimization, expressed here with stock Spark:

1. normalize each key column to a ``bits``-wide integer rank using
   its global min/max (one cheap agg — at 100 TB this is a metadata-
   scale action, and the normalization constants are broadcast
   literals in the expression);
2. interleave the bits into a single z-value with shift/mask
   arithmetic — a pure JVM whole-stage-codegen expression, no UDF;
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` and write:
   each output file covers a compact Z-curve segment, i.e. a small
   hyper-rectangle of the key space.

The same z-value works as a bucketing/clustering key for co-locating
multidimensional workloads. ``file_skipping_ratio`` measures the
payoff directly from parquet footer statistics (what any engine's
pruner consults) — tests assert z-order skips where linear layout
cannot.

Linear normalization is deliberate: rank-based (quantile) z-order
handles skew better but needs an approxQuantile pass; min/max keeps
the demo deterministic. Swap ``_normalize`` for bucket boundaries
from ``approxQuantile`` when key distributions are heavy-tailed.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] linearly onto [0, 2^bits - 1] as a long."""
    span = max(hi - lo, 1e-300)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span)
    return F.least(
        F.greatest((scaled * F.lit(float(2**bits - 1))).cast("long"), F.lit(0)),
        F.lit(2**bits - 1),
    )


def _normalize_quantile(col: Column, boundaries: list[float]) -> Column:
    """Map a value to its bucket index via pre-computed quantile
    boundaries: index = #boundaries ≤ value. Expressed as a HOF over a
    broadcast array literal — O(buckets) comparisons per row, all
    codegen, no UDF. Fine for ≤ a few hundred buckets per column."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double")))


def zorder_value_quantile(
    df: DataFrame, cols: list[str], bits: int = 8, rel_err: float = 0.001
) -> Column:
    """Rank-based Morton z-value: per-column normalization uses
    ``approxQuantile`` bucket boundaries instead of min/max. For
    heavy-tailed keys (bytes, view counts, prices) linear min/max
    collapses most rows into a handful of codes — one outlier
    stretches the range — while equi-depth buckets give every code
    ~1/2^bits of the rows, so the curve segments (and the output
    files) stay balanced. Cost: one approxQuantile pass (mergeable
    GK sketch, driver gets 2^bits doubles per column)."""
    probs = [i / 2**bits for i in range(1, 2**bits)]
    z = F.lit(0).cast("long")
    n = len(cols)
    for j, c in enumerate(cols):
        bounds = df.stat.approxQuantile(c, probs, rel_err)
        norm = F.least(_normalize_quantile(F.col(c), bounds),
                       F.lit(2**bits - 1))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(norm, i).bitwiseAND(F.lit(1)),
                            i * n + j)
            )
    return z.alias("_zval")


def zorder_value(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton z-value over ``cols`` (2 or more), as one codegen-able
    integer expression. Collects each column's min/max (one agg)."""
    stats = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in cols for n, f in
          (("lo", F.min), ("hi", F.max))]
    ).collect()[0]
    z = F.lit(0).cast("long")
    n = len(cols)
    for j, c in enumerate(cols):
        norm = _normalize(F.col(c), float(stats[f"lo_{c}"]),
                          float(stats[f"hi_{c}"]), bits)
        for i in range(bits):
            # bit i of column j lands at interleaved position i*n + j
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(norm, i).bitwiseAND(F.lit(1)),
                            i * n + j)
            )
    return z.alias("_zval")


def write_zordered(
    df: DataFrame, cols: list[str], path: str, n_files: int = 16, bits: int = 12
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.
    ``repartitionByRange`` on the z-value gives contiguous, balanced
    curve segments (range partitioning samples the distribution);
    the within-partition sort makes row-group stats tight too."""
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("_zval", z)
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(df: DataFrame, col: str, path: str, n_files: int = 16) -> None:
    """Baseline layout: range-partitioned + sorted on ONE column."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skipping_ratio(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet files under ``path`` a min/max pruner skips
    for the predicate ``col BETWEEN lo AND hi`` — read straight from
    footer statistics, engine-independent ground truth."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files, f"no parquet files under {path}"
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        overlaps = False
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                if cc.path_in_schema != col:
                    continue
                st = cc.statistics
                if st is None or not st.has_min_max:
                    overlaps = True
                elif not (st.max < lo or st.min > hi):
                    overlaps = True
        if not overlaps:
            skipped += 1
    return skipped / len(files)


def compact_files(
    spark, path: str, out_path: str, target_file_mb: int = 256
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_mb`` files — the maintenance job every streaming /
    incremental-ingest table needs (a 100 TB table fed by thousands of
    micro-batches degrades into millions of KB-scale files whose
    open/footer costs dominate scans).

    File count = ceil(input bytes / target). The rewrite uses
    ``repartition(n)`` (round-robin) — balanced outputs without a
    range sample; pair with ``zorder_write`` when the table also
    wants clustering. Input size comes from the file listing, not a
    data scan. Returns the number of files written.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
