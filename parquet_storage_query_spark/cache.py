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


def scratch_dir(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    """A per-(application, sf_dir) scratch path for demo artifacts
    (standing indexes, staged stream shards) under $SPARK_GRAFT_INDEX_DIR
    or the system temp dir: `{prefix}_{md5(sf_dir)[:8]}_{applicationId}`.

    The applicationId suffix is the isolation: two concurrent sessions
    over the same sf_dir never overwrite each other (a shared fixed path
    raced — one session's overwrite rmtree'd a directory the other was
    serving from). Stale sibling app dirs (same prefix+digest, mtime
    older than a day) are pruned on the way in, so repeated sessions
    don't accumulate one dir each forever."""
    import hashlib
    import os
    import shutil
    import tempfile
    import time

    base = os.environ.get("SPARK_GRAFT_INDEX_DIR") or os.path.join(
        tempfile.gettempdir(), "spark_graft_indexes"
    )
    stem = f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    os.makedirs(base, exist_ok=True)
    cutoff = time.time() - 24 * 3600
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if d.startswith(stem + "_") and os.path.isdir(p) and os.path.getmtime(p) < cutoff:
            shutil.rmtree(p, ignore_errors=True)
    return os.path.join(base, f"{stem}_{spark.sparkContext.applicationId}")


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
