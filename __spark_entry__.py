"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1 pricing summary) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2, from the
                central registry (parquet_storage_query_spark.registry).
oracle_sql()  — DuckDB oracle SQL per query (omitted for approximate /
                hash-seeded ops → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from parquet_storage_query_spark.registry import builders, oracles  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parquet_storage_query_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return builders()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return oracles()
