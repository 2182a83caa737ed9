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


def test_schema_evolution_merge(spark, tmp_path):
    """Folder with files written under two schema versions (a column added
    later) reads as the union schema with mergeSchema; old rows surface
    NULL for the new column — the append-only evolution story a long-lived
    100 TB table needs."""
    folder = str(tmp_path / "evolving")
    v1 = load(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    v2 = load(spark, SF_SMOKE, "nation").withColumn("added_col", F.lit("v2")).select(
        "n_nationkey", "n_name", "added_col"
    )
    v1.write.parquet(folder + "/batch=1")
    v2.write.parquet(folder + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(folder)
    assert "added_col" in merged.columns
    assert merged.count() == 50
    assert merged.filter(F.col("added_col").isNull()).count() == 25


def test_binpack_plan_properties(spark):
    """Property test (hypothesis): for arbitrary file-size lists, greedy
    packing (D2, DP:88-143) covers every file exactly once, preserves
    listing order, keeps every multi-file group within the target (flush
    happens BEFORE the overflowing file, DP:119-132), and never splits a
    group that could have absorbed the next file."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=10 * 1024 * 1024), max_size=40),
        target_mb=st.integers(min_value=1, max_value=8),
    )
    def check(sizes, target_mb):
        files = [(f"f{i}", s) for i, s in enumerate(sizes)]
        groups = prep.plan_packing(files, "/dest", target_mb)
        flat = [p for g in groups for p in g.original_paths]
        assert flat == [p for p, _ in files]  # complete, ordered, no dupes
        target = target_mb * 1024 * 1024
        by_path = dict(files)
        totals = [sum(by_path[p] for p in g.original_paths) for g in groups]
        for g, acc in zip(groups, totals):
            # ≤ target unless a single oversized file forms its own group
            assert acc <= target or len(g.original_paths) == 1
        for i in range(1, len(groups)):
            # greedy maximality: the next group's first file wouldn't fit
            first_next = by_path[groups[i].original_paths[0]]
            assert totals[i - 1] + first_next > target

    check()


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
    # reference semantics (DP:119-132): flush BEFORE overflow, so groups
    # stay ≤ 100 MiB → [f0,f1], [f2,f3], [f4]
    assert [len(g.original_paths) for g in groups] == [2, 2, 1]
    # a single file larger than the target still forms its own group
    big = prep.plan_packing([("big", 300 * 1024 * 1024)], "/dest", target_mb=100)
    assert [len(g.original_paths) for g in big] == [1]
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


def test_jsonl_roundtrip(spark, tmp_path):
    """documents → gzip JSONL → (convert) parquet must preserve every row:
    the corpus-interchange egest/ingest pair is lossless."""
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load
    from parquet_storage_query_spark.sources.prep import convert, export_jsonl

    docs = load(spark, SF_SMOKE, "documents")
    jl = str(tmp_path / "docs_jsonl")
    pq = str(tmp_path / "docs_pq")
    export_jsonl(docs, jl)
    assert any(f.endswith(".json.gz") for f in os.listdir(jl)), os.listdir(jl)
    convert(spark, jl, pq, docs.schema, src_format="json")
    back = spark.read.parquet(pq)
    orig = {tuple(r) for r in docs.collect()}
    assert {tuple(r) for r in back.collect()} == orig
    assert back.count() == len(orig)
