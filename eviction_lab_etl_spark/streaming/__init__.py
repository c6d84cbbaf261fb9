"""Group K — streaming surface (SURVEY §2.K).

Importing registers the batch-checkable window operators and the rows-only
true Structured Streaming operators.
"""

from eviction_lab_etl_spark.streaming import batch_windows, stream_ops  # noqa: F401
