"""t2 mirror: every hash-checkable Qkey vs its DuckDB oracle at
sf0.001 (fast inner loop; the driver runs sf0.01). Rows-only Qkeys are
checked for execution + non-degenerate output here and against
numpy/python oracles in their dedicated test modules."""

from __future__ import annotations

import pytest

from mini_sql_engine_spark.oracles import ORACLES
from mini_sql_engine_spark.queries import QUERIES

from tests.conftest import SF_SMOKE
from tests.parity import assert_parity


@pytest.mark.parametrize("qkey", sorted(ORACLES))
def test_oracle_parity(spark, duck, qkey):
    from tests.conftest import register_duck_views

    register_duck_views(duck, SF_SMOKE)
    df = QUERIES[qkey](spark, SF_SMOKE)
    assert_parity(df, duck, ORACLES[qkey], qkey)


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("qkey", ROWS_ONLY)
def test_rows_only_queries_run(spark, qkey):
    df = QUERIES[qkey](spark, SF_SMOKE)
    # must produce a stable schema and execute without error
    n = df.count()
    assert df.columns, f"{qkey}: empty schema"
    assert n >= 0
