"""Structured Streaming parity: the streaming runners must produce the
same results as their batch twins (SURVEY.md §7 M4 verification strategy —
foreachBatch/memory-sink vs batch equivalence, since DuckDB can't oracle
incremental execution)."""

from __future__ import annotations

from parquet_storage_query_spark.streaming import windows as sw

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streaming_total_count_matches_batch(spark):
    got = sw.streaming_total_count(spark, SF_SMOKE)
    from parquet_storage_query_spark.operators.reference import ref_total_count

    assert _rows(got) == _rows(ref_total_count(spark, SF_SMOKE))


def test_streaming_tumbling_matches_batch(spark):
    got = sw.streaming_tumbling_counts(spark, SF_SMOKE)
    want = sw.stream_tumbling_counts(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_session_windows_match_batch(spark):
    got = sw.streaming_session_windows(spark, SF_SMOKE)
    want = sw.stream_session_windows(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)
