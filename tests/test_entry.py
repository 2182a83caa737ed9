"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty_e2", "count_order"}


def test_queries_oracles_aligned():
    qs = entrymod.queries()
    os = entrymod.oracle_sql()
    assert len(qs) >= 100
    assert set(os) <= set(qs)
    for name, sql in os.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_priority_names_all_registered():
    """Every _PRIORITY entry must exist in the registry: a typo'd name is
    silently skipped by all_queries(), which would quietly push a query out
    of the driver's 50-slot sampling window."""
    from parquet_storage_query_spark.registry import _PRIORITY, all_queries

    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, missing
    assert len(_PRIORITY) == len(set(_PRIORITY))  # no duplicate slots
