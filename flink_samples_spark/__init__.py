"""flink_samples_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
reference repo (echauchot/flink-samples, a Flink 1.19 streaming
sandbox) as an idiomatic Spark DataFrame / Spark SQL / Structured
Streaming library, and extends it with the relational surface the
reference ships via its SQL planner plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
- ``session``    — SparkSession builder (AQE, Arrow, UTC, tuned shuffle)
- ``sources``    — batch + streaming source/sink constructors
- ``operators``  — relational operators (agg, join, windows, set ops, ...)
- ``functions``  — scalar function families + UDF surface
- ``streaming``  — event-time windows, watermark, checkpointed jobs
- ``llmops``     — dedup / similarity / text-analysis / multimodal
- ``plans``      — the declared query catalog (q_* ids from SURVEY.md §2)
"""

from flink_samples_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
