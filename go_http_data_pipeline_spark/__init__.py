"""PySpark-native analytics engine with the query & data-processing
capabilities of Dharineesh-MCW/Go-HTTP-Data-PipeLine, re-expressed
Spark-first (DataFrame/SQL + Structured Streaming), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.
"""

from .session import get_spark

__all__ = ["get_spark"]
