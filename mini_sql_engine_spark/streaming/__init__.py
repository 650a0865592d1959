"""Event-time windowed operators (SURVEY.md §2.9) — batch-first.

The same window expressions run unchanged under Structured Streaming
(``readStream`` → identical transformations → ``writeStream``); the
batch path is the contract surface, the streaming path is provided by
``streaming.jobs`` and exercised with availableNow triggers in tests.
"""

from mini_sql_engine_spark.streaming import event_windows, jobs, stateful  # noqa: F401
