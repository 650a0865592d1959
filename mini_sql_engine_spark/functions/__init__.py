"""Scalar & text function layer (SURVEY.md §2.7, §2.10).

The reference has no scalar functions at all (integer compare/arith
only, [SPEC-HIGH]); everything here is a capability extension built on
``pyspark.sql.functions`` so it stays JVM-side inside whole-stage
codegen — no Python in the row path.
"""

from mini_sql_engine_spark.functions import text  # noqa: F401
