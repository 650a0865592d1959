"""Salted join — the manual fix for join-key skew.

A hot join key sends all its rows to one reducer; the stage finishes
when that one task does. AQE's skew-join splitting (enabled in
``session.py``) handles most sort-merge cases at runtime, but can't
help when the skewed side feeds a downstream keyed aggregation, when
the plan is forced away from SMJ, or on engines/versions without AQE.
Salting is the explicit version of the same idea: split each hot key
into ``n_salts`` synthetic sub-keys on the big side and replicate the
small side once per salt, trading |small|·n_salts extra rows for
n_salts-way parallelism on the hot key.

The salt on the big side is ``xxhash64`` of the whole row —
deterministic (same data → same plan → same result), no RNG in the
row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, with the big side's rows
    spread across ``n_salts`` sub-keys. Semantics identical to
    ``big.join(small, on, how)`` for inner/left joins."""
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*big.columns)), F.lit(n_salts))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")
