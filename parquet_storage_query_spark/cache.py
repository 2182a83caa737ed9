"""Session-scoped memoization for expensive per-(session, sf_dir) artifacts:
persisted signature DataFrames (dedup), trained centroid models (IVF),
temp-view registration (SQL builders).

Keyed on ``SparkContext.applicationId`` — unique per context for the life of
the process — NOT ``id(SparkSession)``: a new session can be allocated at a
garbage-collected session's address and would inherit a stale persisted
DataFrame bound to the dead context. Entries from any other application are
swept (and their persisted DataFrames unpinned) the first time a new
application touches the memo, so restarting the session in one process does
not leak executor storage.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

_MEMO: dict[tuple[str, str, str], Any] = {}


def session_memo(spark: SparkSession, sf_dir: str, tag: str, build: Callable[[], Any]) -> Any:
    """Return the memoized artifact for (this session, sf_dir, tag),
    building it once via ``build()``."""
    app = spark.sparkContext.applicationId
    for k in [k for k in _MEMO if k[0] != app]:
        stale = _MEMO.pop(k)
        if isinstance(stale, DataFrame):
            try:
                stale.unpersist()
            except Exception:
                pass  # context already gone — nothing is pinned
    key = (app, sf_dir, tag)
    if key not in _MEMO:
        _MEMO[key] = build()
    return _MEMO[key]


def prepared(tag: str):
    """Decorator for (spark, sf_dir) -> DataFrame builders whose PLAN is
    expensive to construct (inlined model literals, long hash pipelines):
    memoizes the built DataFrame per (session, sf_dir) like a prepared
    statement. Every action on the memoized frame still re-executes the
    plan — only re-analysis and codegen are skipped. Profiled on the
    similarity/dedup serving queries: 0.9-16s of per-call planning against
    0.03-0.16s of execution."""
    import functools

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            return session_memo(spark, sf_dir, tag, lambda: fn(spark, sf_dir))

        return wrapper

    return deco
