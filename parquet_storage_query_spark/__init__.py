"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo (vplauzon/parquet-storage-query),
re-expressed Spark-first and extended to the relational / streaming /
LLM-pipeline surface. See SURVEY.md for the blueprint."""

from .registry import all_queries, builders, oracles
from .session import get_spark

__all__ = ["all_queries", "builders", "get_spark", "oracles"]
