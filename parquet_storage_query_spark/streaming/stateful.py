"""Custom stateful streaming operator (SURVEY.md §2.9: the extension
surface for operators Spark's built-in windows can't express) via
`applyInPandasWithState`: arbitrary per-key state maintained across
micro-batches, Arrow-batched on the Python side.

The demo operator keeps running per-user statistics (event count, max
value, last-seen timestamp) — the moral generalization of the reference's
MaxBy/TotalCount merges (QueryOrchestration.cs:258-265, 362-367) to
*incremental* execution: each micro-batch folds into O(|users|) state
instead of reprocessing history.

Scale design: state lives in the state store partitioned by the grouping
key (user_id), so memory is O(active keys / shuffle partition), not
O(events). The same logic at 100 TB/day needs only a key-cardinality-sized
store plus a timeout policy for idle keys (GroupStateTimeout) — the knobs
are on this exact API.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load
from ..registry import query
from .windows import read_events_stream

_OUT_SCHEMA = "user_id LONG, n_events LONG, max_value DOUBLE, last_ts TIMESTAMP"
_STATE_SCHEMA = "n LONG, mx DOUBLE, last LONG"  # last = microseconds since epoch


def _fold_user_stats(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into (count, max, last_ts)
    state and emit the updated totals. Pure-Python per-key logic — the shape
    to copy for any custom sketch/accumulator the built-ins lack."""
    n, mx, last = state.get if state.exists else (0, float("-inf"), 0)
    for pdf in batches:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, mx, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "max_value": [mx],
            "last_ts": [pd.Timestamp(last, unit="us")],
        }
    )


def streaming_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the custom stateful operator incrementally (update mode, memory
    sink). The sink accumulates one row per (user, micro-batch); the final
    state per user is the row with the highest n_events (monotone)."""
    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
    updates = stream.groupBy("user_id").applyInPandasWithState(
        _fold_user_stats,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .windows import _run_to_memory

    all_updates = _run_to_memory(updates, "stream_user_stats_out", "update")
    final = all_updates.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "max_value", "last_ts"), "n_events").alias("s")
    )
    return final.select(
        "user_id",
        "s.n_events",
        F.round("s.max_value", 2).alias("max_value"),  # match batch twin's rounding
        "s.last_ts",
    )


@query(
    "stream_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(max(value), 2) AS max_value,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming fold: per-user count / max /
    last-seen. One partial/final aggregate; the streaming variant must
    converge to exactly this (asserted in tests/test_streaming.py)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.max("ts").alias("last_ts"),
        )
    )
