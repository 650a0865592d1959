"""Cross-join guard — the API-layer lint SURVEY.md §4.2 calls for.

The reference executes every multi-table query as a materialized
cartesian product; at 100 TB an accidental unconstrained cross join
(a join whose equality conditions didn't survive analysis — wrong
column, mismatched types, a typo'd alias) is the plan that takes the
cluster down. Catalyst will happily plan it (CartesianProduct /
BroadcastNestedLoopJoin); this guard inspects the OPTIMIZED logical
plan — after Catalyst has recovered equi-joins from
``FROM a, b WHERE a.x = b.y`` shapes, so only genuinely unconstrained
products remain — and raises when one's estimated output exceeds a
budget.

Implemented as an explicit pre-flight check rather than a Catalyst
rule on purpose: a JVM extension can't be injected from Python-only
deployments, and a lint that names the offending plan line is more
actionable than a strategy that silently refuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 100_000_000


class UnboundedCrossJoinError(RuntimeError):
    pass


def check_cross_joins(df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS) -> DataFrame:
    """Raise ``UnboundedCrossJoinError`` if the optimized plan contains
    a condition-free cross join whose estimated row product exceeds
    ``max_rows``. Returns ``df`` unchanged so it chains."""
    qe = df._jdf.queryExecution()
    plan = qe.optimizedPlan()
    offenders = _find_unbounded_cross(plan, max_rows)
    if offenders:
        raise UnboundedCrossJoinError(
            "unconstrained cross join with estimated rows > "
            f"{max_rows}: {offenders[0]}"
        )
    return df


def _find_unbounded_cross(plan, max_rows: int) -> list[str]:
    out: list[str] = []
    node_name = plan.nodeName()
    if node_name == "Join":
        jt = plan.joinType().toString().lower()
        cond_empty = not plan.condition().isDefined()
        if cond_empty and jt in ("cross", "inner"):
            sides = [plan.left(), plan.right()]
            est, known = 1.0, True
            for s in sides:
                rc = s.stats().rowCount()
                size = float(str(s.stats().sizeInBytes()))
                if rc.isDefined():
                    est *= float(str(rc.get()))
                elif size < 2.0**61:  # real estimate, not defaultSizeInBytes
                    # size-based fallback: bytes / 16 as a crude row floor
                    est *= max(size / 16.0, 1.0)
                else:
                    # statistics unknown (e.g. parallelized local data) —
                    # the guard flags only PROVEN-large products
                    known = False
            if known and est > max_rows:
                out.append(f"{jt} join, est {est:.3g} rows")
    it = plan.children().iterator()
    while it.hasNext():
        out.extend(_find_unbounded_cross(it.next(), max_rows))
    return out
