"""Point-in-interval range join without an equi key.

Spark compiles ``points JOIN intervals ON p BETWEEN lo AND hi`` (no
equality conjunct) to a BroadcastNestedLoopJoin — O(|P|·|I|) and a
broadcast of a whole side; at scale it's the join that never
finishes. The standard fix is bucket expansion: quantize time into
granules, explode each interval into the granules it covers, tag each
point with its granule, hash-join on the granule, and re-check the
exact range as a residual filter.

Cost: |P| + Σ(interval_len/granule) join-input rows and ONE keyed
shuffle. The granule is the skew/blowup dial — it should be on the
order of the median interval length (too fine explodes intervals,
too coarse packs everything into few buckets).

Matches are exact (the residual filter re-checks the true bounds);
only the routing is approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    granule_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    lo ≤ point ≤ hi (timestamps). Output: point columns + interval
    columns."""
    g = F.lit(granule_seconds)

    def granule(c: str):
        # cast handles TIMESTAMP_NTZ columns (session tz is UTC)
        return (F.unix_timestamp(F.col(c).cast("timestamp")) / g).cast("long")

    p = points.withColumn("_granule", granule(point_col))
    i = intervals.withColumn(
        "_granule", F.explode(F.sequence(granule(lo_col), granule(hi_col)))
    )
    return (
        p.join(i, "_granule", how)
        .filter(
            F.col(point_col).between(F.col(lo_col), F.col(hi_col))
        )
        .drop("_granule")
    )
