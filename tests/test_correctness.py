"""Differential correctness: every registered query vs its DuckDB oracle
at sf0.001 (fast tier; the driver re-runs the same contract at sf0.01).

This mirrors the reference's dual-engine methodology
(QueryOrchestration.cs:371-401 runs storage + ADX back-to-back) upgraded to
automated hash comparison per SURVEY.md §5.
"""

from __future__ import annotations

import duckdb
import pytest

from parquet_storage_query_spark.catalog import TABLES, table_path
from parquet_storage_query_spark.registry import all_queries
from tools.check import result_fingerprint

from .conftest import SF_SMOKE

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_SMOKE, t)}')"
        )
    return con


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    qd = _QUERIES[name]
    sdf = qd.builder(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if qd.oracle is None:
        # rows-only contract: runs, stable schema, deterministic row count
        again = [tuple(r) for r in qd.builder(spark, SF_SMOKE).collect()]
        assert len(srows) == len(again)
        return
    cur = oracle_con.execute(qd.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert result_fingerprint(sdf.columns, srows) == result_fingerprint(ocols, orows)
