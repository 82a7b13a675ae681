"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class engine components (SURVEY.md §7.2 M6): exact and
approximate deduplication, similarity search over embedding columns,
text analysis, and multimodal binary-column plumbing — all expressed as
declarative DataFrame transformations (no row-at-a-time Python in hot
paths) so they scale with partition parallelism to 100 TB inputs.

Determinism contract: every hash used is md5 (hex string), so results
are engine-independent and each operator has an exact ANSI-SQL oracle.
"""

from lakesoul_spark.operators import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
