"""Data-prep tests (SURVEY.md §7 M3): conversion + compaction preserve
rows exactly (DuckDB count+hash oracle per the property test spec)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_storage_query_spark.catalog import SCHEMAS, load
from parquet_storage_query_spark.sources import prep

from .conftest import SF_SMOKE


def test_convert_csv_roundtrip(spark, tmp_path):
    """CSV.gz → parquet conversion (D3) keeps every row and value."""
    src_csv = str(tmp_path / "csv_in")
    dest = str(tmp_path / "parquet_out")
    nation = load(spark, SF_SMOKE, "nation")
    nation.write.option("compression", "gzip").csv(src_csv)
    assert any(f.endswith(".csv.gz") for f in os.listdir(src_csv))

    prep.convert(spark, src_csv, dest, SCHEMAS["nation"], src_format="csv")

    out = spark.read.parquet(dest)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, nation.collect()))


def test_compact_preserves_rows(spark, tmp_path):
    """Compaction (D2): many small files → few files, same rows (DuckDB
    oracle on both sides)."""
    src = str(tmp_path / "small_files")
    dest = str(tmp_path / "compacted")
    li = load(spark, SF_SMOKE, "lineitem")
    li.repartition(16).write.parquet(src)  # fragment into 16 small files

    stats = prep.compact(spark, src, dest, target_mb=64)

    assert stats["in_files"] == 16
    assert stats["out_files"] < stats["in_files"]
    con = duckdb.connect()
    before = con.execute(
        f"SELECT count(*), sum(hash(l_orderkey, l_linenumber)) FROM read_parquet('{src}/*.parquet')"
    ).fetchone()
    after = con.execute(
        f"SELECT count(*), sum(hash(l_orderkey, l_linenumber)) FROM read_parquet('{dest}/*.parquet')"
    ).fetchone()
    assert before == after


def test_compact_grouped_reference_mode(spark, tmp_path):
    """Reference-faithful greedy grouping (DP:88-143): every source file
    lands in exactly one group, order preserved, sizes accumulate to the
    target."""
    src = str(tmp_path / "grouped_src")
    dest = str(tmp_path / "grouped_out")
    load(spark, SF_SMOKE, "orders").repartition(8).write.parquet(src)

    mappings = prep.compact_grouped(spark, src, dest, target_mb=1)
    all_inputs = [p for m in mappings for p in m.original_paths]
    assert sorted(all_inputs) == sorted(p for p, _ in prep.list_data_files(src, ".parquet"))

    out = spark.read.parquet(*[m.destination_path for m in mappings])
    assert out.count() == load(spark, SF_SMOKE, "orders").count()


def test_plan_packing_greedy():
    files = [(f"f{i}", 40 * 1024 * 1024) for i in range(5)]  # 5 × 40 MiB
    groups = prep.plan_packing(files, "/dest", target_mb=100)
    # greedy: accumulate until ≥100 MiB → [f0,f1,f2], [f3,f4]
    assert [len(g.original_paths) for g in groups] == [3, 2]
    one_to_one = prep.plan_packing(files, "/dest", target_mb=None)
    assert len(one_to_one) == 5


def test_with_retry_bounded():
    calls = []

    def flaky():
        calls.append(1)
        raise RuntimeError("transient")

    with pytest.raises(RuntimeError):
        prep.with_retry(flaky, max_attempts=3, base_delay_s=0.01)
    assert len(calls) == 3
