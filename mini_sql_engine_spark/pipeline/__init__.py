"""LLM-training-data pipeline operators (SURVEY.md §2.10): dedup
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + LSH ANN), multimodal column plumbing.
"""

from mini_sql_engine_spark.pipeline import (  # noqa: F401
    clean,
    dedup,
    multimodal,
    similarity,
)
