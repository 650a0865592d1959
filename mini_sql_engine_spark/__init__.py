"""mini_sql_engine_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query surface of the
reference engine ``Janmejay50010/Mini_SQL_Engine`` (a single-process
Python CSV SQL engine; see SURVEY.md §0 for provenance — the reference
mount was empty, so the contract derives from the published assignment
spec the reference implements), widened into a distributed analytics
engine with the operators a large-scale training-data pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, event-time windows, and
multimodal column plumbing.

Design stance (100 TB first):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical
  strategies. No hand-scheduled execution, no driver-side loops.
- Explicit schemas everywhere (``catalog.py``); never ``inferSchema``.
- Broadcast hints for dimension tables; shuffle-heavy ops keyed so
  partial (map-side) aggregation applies.
- Python UDFs only where built-ins cannot express the semantics
  (vector math uses built-in higher-order functions; multimodal decode
  uses Arrow-batched ``mapInPandas``).
"""

from mini_sql_engine_spark.session import get_spark
from mini_sql_engine_spark.catalog import Catalog, TABLE_SCHEMAS

__all__ = ["get_spark", "Catalog", "TABLE_SCHEMAS"]
__version__ = "0.1.0"
