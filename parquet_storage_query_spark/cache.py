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
