"""As-of join — for each left row, the most recent right row at or
before its timestamp (per key). Spark has no built-in; the naive
formulation (range self-join + per-left-row max) is a
BroadcastNestedLoopJoin that dies at scale.

Scalable composition (the kdb/Flink "temporal join" shape re-expressed
in DataFrame ops): tag both sides, UNION them, and carry the last
right-side value forward over a window partitioned by key and ordered
by (ts, side). One shuffle total — the window exchange on the key —
with cost O((|L|+|R|) log per-partition), never |L|·|R|. Skewed keys
are handled by AQE the same as any keyed shuffle.

Tie policy: a right row at exactly the left row's timestamp matches
(``ASOF JOIN ... ON l.ts >= r.ts`` semantics — right sorts before
left at equal ts). Among right rows with equal (key, ts), the one with
the largest tie-break column wins, making results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Backward as-of join.

    Output: every ``left`` row plus ``value_cols`` from the matched
    right row (null when no right row precedes it). ``tie_break``
    orders right rows that share (by, ts); defaults to the first
    value column.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (by, right_ts)]
    tie_break = tie_break or value_cols[0]

    l_tagged = left.select(
        F.col(by).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie_break].dataType).alias("_tb"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
            ) + ">"
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(by).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_break).alias("_tb"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )

    # right rows sort before left rows at equal ts (_side 0 < 1), so a
    # right row at exactly left's ts is visible to it; _tb breaks
    # right-side ties deterministically.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return carried.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"asof_{c}") for c in value_cols],
    )
