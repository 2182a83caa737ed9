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


# ---------------------------------------------------------------------------
# Order-sensitive stateful operator: live error-burst detection
# ---------------------------------------------------------------------------

_BURST_OUT = (
    "user_id LONG, seen LONG, n_bursts LONG, longest_burst LONG, "
    "total_burst_errors LONG"
)
_BURST_STATE = "last_us LONG, run_len LONG, n_bursts LONG, longest LONG, total LONG, seen LONG"
_BURST_GAP_US = 3_600_000_000  # 1 h, matching the batch twin events_error_bursts
_NO_LAST = -(10**18)  # sentinel: no prior error for this user


def _fold_error_bursts(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental gaps-and-islands run detection — the ORDER-SENSITIVE
    stateful shape (stream_user_stats' folds are all commutative; a run
    detector is not): per user, O(1) state (last error time, current run
    length, burst tallies) folded over time-ordered error events. A run
    is consecutive errors ≤1 h apart; a burst is a run of ≥2; the fold
    updates tallies at the exact moment a run reaches length 2 and
    extends them per subsequent member — equivalent to the batch
    operator's window pass, but over state instead of history.

    Ordering contract: rows are sorted (ts, event_id) WITHIN each batch
    here; ACROSS batches the caller must deliver time-ordered
    micro-batches (log streams are; production guards stragglers with a
    watermark + sorted per-batch apply). State stays O(1) per user —
    never a buffer of history.

    All Arrow chunks for the key are concatenated BEFORE the sort
    (ADVICE r10 #2): `batches` yields one pandas frame per Arrow chunk,
    and a key whose micro-batch exceeds maxRecordsPerBatch spans several
    — sorting each independently would fold timestamps out of global
    order across the chunk boundary and miscount runs."""
    last_us, run_len, n_bursts, longest, total, seen = (
        state.get if state.exists else (_NO_LAST, 0, 0, 0, 0, 0)
    )
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        for us in (pdf["ts"].astype("int64") // 1000).tolist():
            if last_us != _NO_LAST and us - last_us <= _BURST_GAP_US:
                run_len += 1
                if run_len == 2:
                    n_bursts += 1
                    total += 2
                else:
                    total += 1
                if run_len > longest:
                    longest = run_len
            else:
                run_len = 1
            last_us = us
            seen += 1
    state.update((last_us, run_len, n_bursts, longest, total, seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "seen": [seen],
            "n_bursts": [n_bursts],
            "longest_burst": [longest],
            "total_burst_errors": [total],
        }
    )


def streaming_error_bursts(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """Live twin of `events_error_bursts` (operators/events.py): the same
    per-user burst report maintained incrementally across micro-batches.
    Update-mode emissions are monotone in `seen`, so the final state per
    user is the row with the highest seen; users whose errors never
    formed a burst are dropped at the end exactly like the batch twin's
    len ≥ 2 filter."""
    if stream is None:
        stream = read_events_stream(spark, sf_dir)
    errors = stream.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    updates = errors.groupBy("user_id").applyInPandasWithState(
        _fold_error_bursts,
        outputStructType=_BURST_OUT,
        stateStructType=_BURST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .windows import _run_to_memory

    all_updates = _run_to_memory(updates, "stream_error_bursts_out", "update")
    final = all_updates.groupBy("user_id").agg(
        F.max_by(
            F.struct("n_bursts", "longest_burst", "total_burst_errors"), "seen"
        ).alias("s")
    )
    return final.filter(F.col("s.n_bursts") > 0).select(
        "user_id", "s.n_bursts", "s.longest_burst", "s.total_burst_errors"
    )


# ---------------------------------------------------------------------------
# Order-sensitive stateful operator: live onboarding-journey classification
# ---------------------------------------------------------------------------

_SEQ_OUT = "user_id LONG, seen LONG, journey STRING"
_SEQ_STATE = "journey STRING, seen LONG"


def _fold_journey(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental onboarding-prefix fold: per user, the state is the
    first-N event-code string (monotone — it only APPENDS until full,
    then never changes) plus the seen count. The prefix is the
    error-bursts shape taken to its simplest extreme: O(cap) state, and
    once the prefix is full every later event is a pure counter bump —
    the state-store write amortizes to nothing for mature users.
    Ordering contract matches _fold_error_bursts: rows sorted
    (ts, event_id) within each batch; micro-batches delivered in time
    order. Arrow chunks are concatenated before the sort for the same
    reason as _fold_error_bursts (ADVICE r10 #2) — a multi-chunk key
    would otherwise append prefix codes out of global time order."""
    from ..operators.events import _JOURNEY_CAP

    journey, seen = state.get if state.exists else ("", 0)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        for code in pdf["code"].tolist():
            if len(journey) < _JOURNEY_CAP:
                journey += code
            seen += 1
    state.update((journey, seen))
    yield pd.DataFrame(
        {"user_id": [key[0]], "seen": [seen], "journey": [journey]}
    )


def streaming_sequence_pattern(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """Live twin of `events_sequence_pattern` (operators/events.py): the
    per-user onboarding journey maintained incrementally, the same regex
    panel classifying the final snapshot, the same census/share output.
    Update-mode emissions are monotone in `seen`, so the final journey
    per user is the row with the highest seen. The regex CASE and the
    e6 share arithmetic are imported from the batch twin — one panel,
    two execution modes."""
    from ..operators.events import _JOURNEY_PATTERNS

    if stream is None:
        stream = read_events_stream(spark, sf_dir)
    ev = stream.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("substring(event_type, 1, 1)").alias("code"),
    )
    updates = ev.groupBy("user_id").applyInPandasWithState(
        _fold_journey,
        outputStructType=_SEQ_OUT,
        stateStructType=_SEQ_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .windows import _run_to_memory

    all_updates = _run_to_memory(updates, "stream_seq_pattern_out", "update")
    final = all_updates.groupBy("user_id").agg(
        F.max_by("journey", "seen").alias("journey")
    )
    case = " ".join(
        f"WHEN journey RLIKE '{rx}' THEN '{name}'" for name, rx in _JOURNEY_PATTERNS
    )
    census = (
        final.select(F.expr(f"CASE {case} ELSE 'other' END").alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .localCheckpoint(eager=True)
    )
    n = census.agg(F.sum("n_users").alias("total"))
    return (
        census.crossJoin(n)
        .select(
            "pattern",
            "n_users",
            F.expr(
                "CAST((2000000 * n_users + total) DIV (2 * total) AS BIGINT)"
            ).alias("share_e6"),
        )
        .orderBy("pattern")
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas port (Spark 4's successor API — VERDICT r9 #7)
# ---------------------------------------------------------------------------


class _BurstProcessor:
    """The error-burst fold as a Spark 4 `StatefulProcessor` —
    transformWithStateInPandas is the successor of
    applyInPandasWithState (SPARK-49564: typed state variables on a
    handle, timers, TTL, RocksDB-only), and this port proves the state
    CONTRACT is API-independent: the identical O(1) per-user tuple
    (last error time, current run length, burst tallies) folded by the
    identical gaps-and-islands logic, with only the state plumbing
    swapped (GroupState.get/update -> handle.getValueState). Declared
    as a plain class with the StatefulProcessor duck-type surface
    (init/handleInputRows/close) and mixed in at call time so module
    import never hard-depends on the new API's import path."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("burst", _BURST_STATE)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._state.get()
        last_us, run_len, n_bursts, longest, total, seen = (
            got if got is not None else (_NO_LAST, 0, 0, 0, 0, 0)
        )
        # Concatenate ALL Arrow chunks for this key BEFORE sorting (ADVICE
        # r10 #2): a key whose micro-batch spans multiple chunks (> arrow
        # maxRecordsPerBatch) would otherwise be folded chunk-by-chunk in
        # out-of-global-order timestamp runs and miscount bursts. One key's
        # batch is bounded by the micro-batch trigger, so the concat is
        # small; the fold itself stays O(1)-state.
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for us in (pdf["ts"].astype("int64") // 1000).tolist():
                if last_us != _NO_LAST and us - last_us <= _BURST_GAP_US:
                    run_len += 1
                    if run_len == 2:
                        n_bursts += 1
                        total += 2
                    else:
                        total += 1
                    if run_len > longest:
                        longest = run_len
                else:
                    run_len = 1
                last_us = us
                seen += 1
        self._state.update((last_us, run_len, n_bursts, longest, total, seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "seen": [seen],
                "n_bursts": [n_bursts],
                "longest_burst": [longest],
                "total_burst_errors": [total],
            }
        )

    def close(self) -> None:
        pass


def streaming_error_bursts_tws(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """streaming_error_bursts through transformWithStateInPandas. The
    new API only runs on the RocksDB state store (its design point: a
    disk-backed store whose typed column families hold the state
    variables), so the provider conf is applied SCOPED around the
    bounded drain — the run is eager inside the builder, so unlike a
    lazy plan the try/finally genuinely covers execution — and the
    session's prior provider is restored after."""
    # transformWithState's Python state client speaks protobuf to a
    # driver-side state server (pyspark.sql.streaming.proto); without
    # the google.protobuf package the driver worker crashes AFTER query
    # start with an opaque "worker exited unexpectedly". Fail loudly
    # and early instead — the documented lib-bound boundary (same
    # contract as the mp3/aac codec hooks; this container ships no
    # protobuf and installs are out of scope). The processor FOLD
    # itself is protobuf-free and parity-pinned by the unit pytest.
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(its state-server protocol is protobuf-encoded); not installed "
            "in this environment"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from .windows import _run_to_memory

    if stream is None:
        stream = read_events_stream(spark, sf_dir)
    errors = stream.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    proc = type("BurstProcessor", (_BurstProcessor, StatefulProcessor), {})()
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = errors.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=_BURST_OUT,
            outputMode="Update",
            timeMode="None",
        )
        all_updates = _run_to_memory(updates, "stream_tws_error_bursts_out", "update")
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
    final = all_updates.groupBy("user_id").agg(
        F.max_by(
            F.struct("n_bursts", "longest_burst", "total_burst_errors"), "seen"
        ).alias("s")
    )
    return final.filter(F.col("s.n_bursts") > 0).select(
        "user_id", "s.n_bursts", "s.longest_burst", "s.total_burst_errors"
    )


def stream_tws_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end run of the transformWithStateInPandas port: drain the
    events file-stream through the StatefulProcessor on a RocksDB state
    store and report the final per-user burst tallies (equal to
    events_error_bursts' batch gaps-and-islands by construction).

    NOT driver-registered: the new API's state protocol requires the
    google.protobuf package, absent from this container (the builder
    raises a documented NotImplementedError here — verified by running
    it: the state client crashes importing StateMessage_pb2 otherwise).
    The processor's FOLD is parity-pinned against the batch twin by the
    protobuf-free unit pytest; the e2e pytest runs wherever protobuf
    exists (pytest.importorskip). Scale shape identical to the old API:
    state is O(active users) in a partitioned disk-backed store, each
    micro-batch touches only the keys it contains, and update-mode
    emissions are monotone in `seen` so the final report is one max_by
    per user."""
    return streaming_error_bursts_tws(spark, sf_dir)


# ---------------------------------------------------------------------------
# Stateful streaming AS-OF join (round 11): the third stateful shape —
# JOIN output (one row per probe event), not a per-key aggregate
# ---------------------------------------------------------------------------

_ASOF_OUT = (
    "event_id LONG, user_id LONG, click_ts TIMESTAMP, view_ts TIMESTAMP, "
    "view_value DOUBLE"
)
_ASOF_STATE = "last_us LONG, vval DOUBLE"


def _fold_asof(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming as-of enrich fold: per user, O(1) state = the latest
    view (event-time µs, value); each CLICK row emits one joined output
    the moment it is processed — the incremental form of join_asof's
    batch window-carry, with the identical same-instant rule (a view at
    the click's exact timestamp is visible: views sort before clicks at
    equal ts). Chunks concatenate before the sort (the ADVICE r10 #2
    contract shared by every order-sensitive fold here); across batches
    the caller delivers time-ordered micro-batches."""
    last_us, vval = state.get if state.exists else (_NO_LAST, 0.0)
    chunks = [pdf for pdf in batches if len(pdf)]
    out: dict[str, list] = {
        "event_id": [], "user_id": [], "click_ts": [], "view_ts": [],
        "view_value": [],
    }
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "side", "event_id"])
        us_col = (pdf["ts"].astype("int64") // 1000).tolist()
        for us, side, eid, val in zip(
            us_col, pdf["side"].tolist(), pdf["event_id"].tolist(),
            pdf["value"].tolist(),
        ):
            if side == 0:  # view: refresh state
                last_us, vval = us, float(val)
            elif last_us != _NO_LAST:  # click with a prior view: emit
                out["event_id"].append(int(eid))
                out["user_id"].append(int(key[0]))
                out["click_ts"].append(pd.Timestamp(us, unit="us"))
                out["view_ts"].append(pd.Timestamp(last_us, unit="us"))
                out["view_value"].append(round(vval, 2))
    state.update((last_us, vval))
    if out["event_id"]:
        yield pd.DataFrame(out)


def streaming_join_asof(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """Run the as-of enrich incrementally: one stream carrying both
    event types, keyed by user, append-mode output (each click's joined
    row is emitted exactly once, in the micro-batch that processes it).
    At 100 TB/day the state is one (ts, value) pair per active user —
    the feature-serving "latest value per key" store, maintained by the
    state backend instead of a nightly rebuild."""
    if stream is None:
        stream = read_events_stream(spark, sf_dir)
    tagged = (
        stream.filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("value", F.lit(0.0)).alias("value"),
            F.when(F.col("event_type") == "view", F.lit(0))
            .otherwise(F.lit(1))
            .alias("side"),
        )
    )
    joined = tagged.groupBy("user_id").applyInPandasWithState(
        _fold_asof,
        outputStructType=_ASOF_OUT,
        stateStructType=_ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .windows import _run_to_memory

    # DELIBERATELY NOT resized (r12 negative result, measured at 10x):
    # backlog-derived state partitions (8) cut summed commitTimeMs 13x at
    # sf0.1 with flat wall, but at sf1 the wall REGRESSED 4.5 -> 7.8 s —
    # addBatch here is the per-group Python fold (CPU-bound, scales with
    # keys), and fewer partitions starve it of cores. The fsync-bound
    # sizing rule only fits built-in stateful aggregates whose per-task
    # work is O(keys-in-partition) cheap; a python fold keeps the session
    # default so executor slots stay saturated.
    return _run_to_memory(joined, "stream_join_asof_out", "append")


@query(
    "stream_join_asof",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts AS click_ts,
           b.ts AS view_ts, round(b.value, 2) AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def stream_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING as-of join — join_asof's point-in-time enrich as a live
    stateful operator (applyInPandasWithState, the third stateful shape
    here: JOIN output rather than per-key aggregates). The oracle is the
    identical ASOF JOIN the batch twin is checked against, so streaming
    execution across real micro-batches must reproduce the batch result
    value-for-value — runs spanning micro-batch boundaries included
    (a click in batch N joins a view from batch N-1 via state)."""
    return streaming_join_asof(spark, sf_dir)
