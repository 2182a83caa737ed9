"""Structured Streaming parity: the streaming runners must produce the
same results as their batch twins (SURVEY.md §7 M4 verification strategy —
foreachBatch/memory-sink vs batch equivalence, since DuckDB can't oracle
incremental execution)."""

from __future__ import annotations

import pytest

# streaming e2e: every test spins real micro-batch queries (watermark waits, checkpoint restarts) -- ~3 min wall
pytestmark = pytest.mark.slow

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


@pytest.mark.parametrize(
    "stream_fn,batch_query",
    [
        ("streaming_min_max", "ref_min_max"),
        ("streaming_time_filter_count", "ref_time_filter_count"),
        ("streaming_filter_count", "ref_filter_count"),
        ("streaming_max_by", "ref_max_by"),
        ("streaming_distinct", "ref_distinct"),
        ("streaming_point_filter", "ref_point_filter"),
    ],
)
def test_streaming_reference_queries_match_batch(spark, stream_fn, batch_query):
    """Streaming A2-A7 converge to their batch twins (SURVEY §7 M4)."""
    from parquet_storage_query_spark.registry import all_queries

    got = getattr(sw, stream_fn)(spark, SF_SMOKE)
    want = all_queries()[batch_query].builder(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_stateful_user_stats_match_batch(spark):
    """Custom applyInPandasWithState operator converges to the batch agg."""
    from parquet_storage_query_spark.streaming import stateful as st

    got = st.streaming_user_stats(spark, SF_SMOKE)
    want = st.stream_user_stats(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_stream_stream_interval_join_matches_batch(spark):
    """Stream-stream inner join with watermarks converges to the batch
    inequality join (all data within watermark in the single-file test)."""
    from parquet_storage_query_spark.streaming import joins as sj

    got = sj.streaming_interval_join(spark, SF_SMOKE)
    want = sj.stream_interval_join(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_stream_stream_left_outer_join_matches_batch(spark, tmp_path):
    """LEFT OUTER stream-stream interval join across ≥3 micro-batch cuts
    (VERDICT r7 next-round #3): unmatched clicks must emit their
    NULL-extended rows — but only after the joint watermark passes their
    interval end (state-eviction semantics). Two trailing sentinel files
    (user_id = -1, a day+ ahead) advance the watermark so every real
    click is provably expired: the first sentinel batch moves the
    watermark, the second triggers the eviction scan that emits the
    nulls. Result must equal the batch left-outer twin exactly."""
    import datetime as dt
    import time

    from pyspark.sql import functions as F

    from parquet_storage_query_spark.streaming import joins as sj

    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    t = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    d = dt.timedelta(days=1)
    f1 = [  # u1: view then click 10 min later (match); u2: click, no view ever
        (1, t, 1, "view", 0.0, "{}"),
        (2, t + 10 * m, 1, "click", 0.0, "{}"),
        (3, t + 5 * m, 2, "click", 0.0, "{}"),
    ]
    f2 = [  # u3 matches inside f2; u1's second click is 50 min past its view
        (4, t + 40 * m, 3, "view", 0.0, "{}"),
        (5, t + 45 * m, 3, "click", 0.0, "{}"),
        (6, t + 50 * m, 1, "click", 0.0, "{}"),
    ]
    f3 = [  # match crossing nothing, but a third real micro-batch
        (7, t + 69 * m, 4, "view", 0.0, "{}"),
        (8, t + 70 * m, 4, "click", 0.0, "{}"),
    ]
    s1 = [(100, t + d, -1, "view", 0.0, "{}"), (101, t + d + m, -1, "click", 0.0, "{}")]
    s2 = [(102, t + 2 * d, -1, "view", 0.0, "{}"), (103, t + 2 * d + m, -1, "click", 0.0, "{}")]

    src = tmp_path / "src"
    src.mkdir()
    fed = []
    for name, rows in [("f1", f1), ("f2", f2), ("f3", f3), ("s1", s1), ("s2", s2)]:
        fed.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))
        time.sleep(1.1)  # strictly increasing mtimes -> deterministic order

    def mk_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )

    clicks = mk_stream().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    views = mk_stream().filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    got = _rows(
        sj.streaming_interval_outer_join(spark, str(tmp_path), clicks=clicks, views=views)
    )

    batch_sf = tmp_path / "batch_sf"
    batch_sf.mkdir()
    spark.createDataFrame(fed, schema).coalesce(1).write.parquet(
        str(batch_sf / "events.parquet")
    )
    want = _rows(
        sj.join_interval_outer(spark, str(batch_sf)).filter(F.col("user_id") >= 0)
    )
    assert got == want
    # the whole point of OUTER: the two unmatched clicks (u2's only click,
    # u1's stale second click) emit with NULL view columns
    nulls = sorted(r[0] for r in got if r[3] is None)
    assert nulls == [3, 6]
    assert len(got) == 5  # 3 matches + 2 null-extended


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a 10-min watermark: a row arriving a
    day late (in a later micro-batch) is excluded from its closed window.
    This is the late-data contract that bounds state at 100 TB/day."""
    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_one(name, rows):
        spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE").coalesce(
            1
        ).write.parquet(str(src / name))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 5)
    # batch 1: two on-time rows in the 00:00 window, then batch 2 advances
    # the watermark a day forward, then batch 3 delivers a very late row
    write_one("b1", [(1, t0, 1.0), (2, t0.replace(minute=20), 2.0)])

    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = stream.writeStream.outputMode("append").format("memory").queryName("wm_out").start()
    try:
        q.processAllAvailable()
        write_one("b2", [(3, t0 + dt.timedelta(days=1), 3.0)])
        q.processAllAvailable()
        write_one("b3", [(4, t0, 99.0)])  # a day late — beyond the watermark
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["ws"]: r["n"] for r in spark.table("wm_out").collect()}
    # the 00:00 window closed with exactly the 2 on-time rows; the late row
    # neither re-emits the window nor creates a new one
    assert out.get(dt.datetime(2024, 1, 1, 0, 0)) == 2


def test_append_mode_emits_only_closed_windows(spark):
    """Append mode must withhold the trailing window still open at the
    final watermark (max ts − 10 min) — emitting it would double-count
    when real late data arrives."""
    import datetime

    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load

    got = sw.stream_tumbling_append(spark, SF_SMOKE)
    max_ts = load(spark, SF_SMOKE, "events").agg(F.max("ts")).collect()[0][0]
    ends = [r["window_end"] for r in got.collect()]
    assert ends
    assert all(e <= max_ts - datetime.timedelta(minutes=10) for e in ends)


def test_streaming_parquet_sink_exactly_once(spark, tmp_path):
    """S7 streaming twin: the checkpointed parquet sink lands exactly the
    batch row set, and restarting the SAME checkpoint with no new source
    data re-commits nothing (exactly-once across restarts)."""
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load
    from parquet_storage_query_spark.streaming.sinks import stream_events_to_parquet

    dest, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = stream_events_to_parquet(spark, SF_SMOKE, dest, ckpt)
    want = load(spark, SF_SMOKE, "events")
    assert got.count() == want.count()
    # value-level spot check: per-type counts match the batch read
    gt = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    wt = {r["event_type"]: r["n"] for r in want.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert gt == wt
    # restart against the same checkpoint: nothing new to commit
    again = stream_events_to_parquet(spark, SF_SMOKE, dest, ckpt)
    assert again.count() == want.count()


def test_stream_static_enrichment_matches_batch(spark):
    """Stream-static broadcast join (feature-serving enrichment) converges
    to the batch twin — stateless, so exact equality, not just closure."""
    from parquet_storage_query_spark.streaming import joins as sj

    got = sj.streaming_enrich_static(spark, SF_SMOKE)
    want = sj.stream_enrich_static(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_windowed_topk_matches_batch(spark):
    """foreachBatch-ranked trending items converge to the batch twin once
    the stream drains (complete-mode counts = batch counts)."""
    got = sw.streaming_windowed_topk(spark, SF_SMOKE)
    want = sw.stream_windowed_topk(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_upsert_keeps_latest_per_key(spark, tmp_path):
    """The foreachBatch CDC apply must converge to exactly one row per key:
    the key's LATEST event by (ts, event_id) — identical to the batch
    window answer over the full table, regardless of how many micro-batches
    the stream was cut into."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load
    from parquet_storage_query_spark.streaming.sinks import stream_upsert_to_parquet

    # split events into 4 files and feed them one per micro-batch, so the
    # merge loop exercises REPEATED delta-onto-snapshot application, not
    # just the first-batch bootstrap
    ev = load(spark, SF_SMOKE, "events")
    src_dir = str(tmp_path / "ev4")
    ev.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    snap = stream_upsert_to_parquet(
        spark, SF_SMOKE, str(tmp_path / "snap"), str(tmp_path / "ckpt"), stream=stream
    )
    got = {
        (r["user_id"], r["event_id"]) for r in snap.select("user_id", "event_id").collect()
    }
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = {
        (r["user_id"], r["event_id"])
        for r in load(spark, SF_SMOKE, "events")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want


def test_streaming_upsert_recovers_from_checkpoint(spark, tmp_path):
    """Kill/restart recovery for the CDC-apply sink (VERDICT r3 'What's
    missing' #5): run two micro-batches, stop the query, then restart a
    NEW query from the SAME checkpoint with one late out-of-order file.

    Exactly-once is proven from the checkpoint's own commit log: the
    restarted query must process exactly ONE new micro-batch (the new
    file) — a fresh checkpoint would replay all three files at
    maxFilesPerTrigger=1. Correctness: the final snapshot equals the
    batch latest-per-key oracle over everything ever fed, including a
    late event OLDER than its key's current winner (must not displace)."""
    import datetime as dt
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.streaming.sinks import stream_upsert_to_parquet

    schema = "user_id LONG, event_id LONG, ts TIMESTAMP, v DOUBLE"
    src = tmp_path / "src"
    src.mkdir()

    def write_one(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

    def mk_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )

    t = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    all_rows = []

    def feed(name, rows):
        all_rows.extend(rows)
        write_one(name, rows)

    snap_dir, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    feed("f1", [(1, 10, t + 5 * m, 1.0), (2, 20, t + 3 * m, 1.0)])
    feed("f2", [(1, 11, t + 9 * m, 1.0), (3, 30, t + 1 * m, 1.0)])
    snap1 = stream_upsert_to_parquet(spark, SF_SMOKE, snap_dir, ckpt, stream=mk_stream())
    assert {(r["user_id"], r["event_id"]) for r in snap1.collect()} == {
        (1, 11), (2, 20), (3, 30)
    }
    def commits():
        return {f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()}

    committed = commits()
    assert len(committed) == 2  # one commit per source file

    # the query is stopped; deliver late data and restart from the SAME
    # checkpoint: (1, 9) is OLDER than key 1's winner — must not displace;
    # (2, 21) is newer — must displace; (4, 40) is a new key
    feed("f3", [(1, 9, t + 2 * m, 9.9), (2, 21, t + 8 * m, 2.0), (4, 40, t + 1 * m, 1.0)])
    snap2 = stream_upsert_to_parquet(spark, SF_SMOKE, snap_dir, ckpt, stream=mk_stream())

    new_commits = commits() - committed
    assert len(new_commits) == 1, "restart must process only the new file"

    got = {(r["user_id"], r["event_id"]) for r in snap2.collect()}
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    oracle = (
        spark.createDataFrame(all_rows, schema)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    assert got == {(r["user_id"], r["event_id"]) for r in oracle.collect()}
    assert got == {(1, 11), (2, 21), (3, 30), (4, 40)}


def test_streaming_incremental_dedup_matches_batch(spark):
    """The live ingest-dedup loop (file-source stream of new docs,
    MinHash-signed per micro-batch, stream-static joined against the
    persisted signature index) emits exactly the batch twin's pairs —
    stateless joins, so exact equality. The staged shard is 4 files at
    maxFilesPerTrigger=1, so this is a real multi-micro-batch run, and
    every emitted pair references an index doc never present in the
    stream."""
    from parquet_storage_query_spark.operators.dedup import (
        INCR_BATCH_MOD,
        stream_incremental_dedup,
    )
    from parquet_storage_query_spark.streaming import joins as sj

    got = sj.streaming_incremental_dedup(spark, SF_SMOKE)
    want = stream_incremental_dedup(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)
    rows = got.collect()
    assert len(rows) > 0  # the check must not be vacuous
    assert all(r["doc_a"] % INCR_BATCH_MOD != 0 for r in rows)  # index side
    assert all(r["doc_b"] % INCR_BATCH_MOD == 0 for r in rows)  # stream side


def test_streaming_countmin_matches_batch(spark):
    """Live CMS maintenance parity: after the stream drains, the counter
    state equals the batch-built matrix cell-for-cell (counts are
    associative — the sketch folds incrementally without drift)."""
    got = sw.streaming_countmin_cells(spark, SF_SMOKE)
    want = sw.stream_countmin_cells(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_agg_on_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state backend: the same incremental aggregation runs on
    the RocksDB state store provider (bounded-heap, spill-to-disk state —
    what a production deployment uses instead of the default in-heap
    HDFS-backed store) INCLUDING kill/restart recovery from its
    checkpoint. Exactly-once is pinned the same way as the CDC-sink test:
    the restarted query processes exactly one new commit for one new
    file, and the final counts equal the batch oracle over everything
    ever fed."""
    import os

    from pyspark.sql import functions as F

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = "id LONG, k LONG"
        src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
        src.mkdir()
        fed = []

        def feed(name, rows):
            fed.extend(rows)
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

        def run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src) + "/*")
            )
            q = (
                stream.groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
                .writeStream.outputMode("complete")
                .format("memory")
                .queryName("rocks_counts")
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            return {tuple(r) for r in spark.table("rocks_counts").collect()}

        feed("f1", [(1, 0), (2, 1), (3, 0)])
        feed("f2", [(4, 1), (5, 2)])
        run()
        commits = os.path.join(ckpt, "commits")
        n1 = len([f for f in os.listdir(commits) if f.isdigit()])
        assert n1 == 2  # one commit per file

        feed("f3", [(6, 0), (7, 2)])
        got = run()
        n2 = len([f for f in os.listdir(commits) if f.isdigit()])
        assert n2 == 3  # exactly ONE new commit — state recovered, not replayed

        want = {
            tuple(r)
            for r in spark.createDataFrame(fed, schema)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def test_streaming_anomaly_matches_batch(spark):
    """Live anomaly monitor parity: after the stream drains, the scored
    snapshot equals the batch operator's output row-for-row."""
    from parquet_storage_query_spark.operators.events import events_anomaly_zscore

    got = sw.streaming_anomaly_zscore(spark, SF_SMOKE)
    want = events_anomaly_zscore(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """Live materialized-view maintenance parity: after draining a
    4-micro-batch stream, the standing rollup equals the full batch
    recompute EXACTLY — integer partials merge associatively across any
    batch cut (the same contract agg_incremental_rollup pins for the
    batch merge path)."""
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load
    from parquet_storage_query_spark.streaming.sinks import stream_rollup_to_parquet

    ev = load(spark, SF_SMOKE, "events")
    src_dir = str(tmp_path / "ev4")
    ev.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    live = stream_rollup_to_parquet(
        spark, SF_SMOKE, str(tmp_path / "roll"), str(tmp_path / "ckpt"), stream=stream
    )
    got = {
        (str(r["day"]), r["event_type"], r["n"], r["sc"])
        for r in live.collect()
    }
    want = {
        (str(r["day"]), r["event_type"], r["n"], r["sc"])
        for r in ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sc"),
        )
        .collect()
    }
    assert got == want and len(got) > 100


def test_streaming_rollup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch replayed after a crash
    (merge committed, checkpoint commit lost) must NOT double-count.
    Drives the sink's merge body directly: same batch id twice → one
    merge; a later id → merged; and the table stays readable at every
    point (versioned commit, no rmtree window). ADVICE r5 (medium)."""
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load
    from parquet_storage_query_spark.streaming.sinks import (
        _read_current,
        rollup_merge_batch,
    )

    ev = load(spark, SF_SMOKE, "events")
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    dest = str(tmp_path / "roll")
    import os

    os.makedirs(dest, exist_ok=True)
    merge = rollup_merge_batch(spark, dest)

    merge(b0, 0)
    after_first = {tuple(r) for r in _read_current(spark, dest).collect()}
    merge(b0, 0)  # crash-replay of the SAME batch
    assert {tuple(r) for r in _read_current(spark, dest).collect()} == after_first

    merge(b1, 1)
    total_n = sum(r["n"] for r in _read_current(spark, dest).collect())
    assert total_n == ev.count()  # each event counted exactly once
    merge(b1, 1)  # replay of the last batch after the final commit
    assert sum(r["n"] for r in _read_current(spark, dest).collect()) == total_n


def test_streaming_rollup_restart_resumes_checkpoint(spark, tmp_path):
    """Stop/restart across runs: the first run drains half the source,
    the process 'dies', more data arrives, and a SECOND run on the SAME
    checkpoint must merge only the new batches on top of the committed
    version pointer — final table equals the full batch recompute with
    nothing double-counted (checkpoint offsets + versioned pointer
    working together across process boundaries)."""
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.catalog import load
    from parquet_storage_query_spark.streaming.sinks import stream_rollup_to_parquet

    ev = load(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")

    def mk_stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    ev.filter(F.col("event_id") % 4 < 2).repartition(2).write.mode("append").parquet(src)
    stream_rollup_to_parquet(spark, SF_SMOKE, roll, ckpt, stream=mk_stream())

    ev.filter(F.col("event_id") % 4 >= 2).repartition(2).write.mode("append").parquet(src)
    live = stream_rollup_to_parquet(spark, SF_SMOKE, roll, ckpt, stream=mk_stream())

    got = {(str(r["day"]), r["event_type"], r["n"], r["sc"]) for r in live.collect()}
    want = {
        (str(r["day"]), r["event_type"], r["n"], r["sc"])
        for r in ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sc"),
        )
        .collect()
    }
    assert got == want and len(got) > 100

    # a FRESH checkpoint against the same dest must refuse loudly: its
    # batch ids restart at 0 and the pointer would silently discard them
    # as replays (review finding)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bound to checkpoint"):
        stream_rollup_to_parquet(
            spark, SF_SMOKE, roll, str(tmp_path / "ckpt_fresh"), stream=mk_stream()
        )


def test_streaming_error_bursts_match_batch(spark):
    """The order-sensitive stateful fold over the real sf0.001 corpus
    must equal the batch gaps-and-islands operator exactly."""
    from parquet_storage_query_spark.operators.events import events_error_bursts
    from parquet_storage_query_spark.streaming.stateful import streaming_error_bursts

    got = _rows(streaming_error_bursts(spark, SF_SMOKE))
    want = _rows(events_error_bursts(spark, SF_SMOKE))
    assert got == want


def test_streaming_error_bursts_across_micro_batches(spark, tmp_path):
    """Runs SPANNING micro-batch boundaries are the case the O(1) state
    must carry: feed three time-ordered files through ONE checkpoint
    (sequential availableNow runs — deterministic batch order), with a
    burst crossing f1→f2, a >1h gap breaking a run inside f2, and a
    3-run crossing f2→f3. Final report must equal the batch operator on
    the union corpus (written as a tiny events table)."""
    import datetime as dt

    from parquet_storage_query_spark.operators.events import events_error_bursts
    from parquet_storage_query_spark.streaming.stateful import streaming_error_bursts

    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    t = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    h = dt.timedelta(hours=1)
    f1 = [
        (1, t + 0 * m, 1, "error", 0.0, "{}"),
        (2, t + 5 * m, 1, "view", 0.0, "{}"),   # non-error must be ignored
        (3, t + 10 * m, 2, "error", 0.0, "{}"),
    ]
    f2 = [
        (4, t + 20 * m, 1, "error", 0.0, "{}"),     # burst 1 for u1: ids 1,4 (cross f1->f2)
        (5, t + 20 * m + 2 * h, 1, "error", 0.0, "{}"),  # >1h gap: new run for u1
        (6, t + 25 * m + 2 * h, 1, "error", 0.0, "{}"),  # burst 2 for u1 starts
    ]
    f3 = [
        (7, t + 30 * m + 2 * h, 1, "error", 0.0, "{}"),  # burst 2 reaches len 3 (cross f2->f3)
        (8, t + 9 * h, 2, "error", 0.0, "{}"),           # u2: isolated errors, no burst
    ]
    import time

    src = tmp_path / "src"
    src.mkdir()
    fed = []
    for name, rows in [("f1", f1), ("f2", f2), ("f3", f3)]:
        fed.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )
        time.sleep(1.1)  # strictly increasing mtimes -> deterministic
        # micro-batch order (the file source orders by mod time)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    got = _rows(streaming_error_bursts(spark, str(tmp_path), stream=stream))

    # batch oracle over the union, written as a tiny events table
    batch_sf = tmp_path / "batch_sf"
    batch_sf.mkdir()
    spark.createDataFrame(fed, schema).coalesce(1).write.parquet(
        str(batch_sf / "events.parquet")
    )
    want = _rows(events_error_bursts(spark, str(batch_sf)))
    assert got == want
    # and the hand-computed expectation: u1 has two bursts (len 2 + len 3)
    by_user = {r[0]: r for r in got}
    assert by_user[1] == (1, 2, 3, 5) or by_user[1][1:] == (2, 3, 5)


def test_streaming_ohlc_matches_batch(spark):
    """Live candlestick state (struct-min/max merge per micro-batch over
    maxFilesPerTrigger=1) converges to the batch timeseries_ohlc bars —
    the mergeability claim in both docstrings, proved end to end."""
    from parquet_storage_query_spark.operators.advanced import timeseries_ohlc

    got = sw.streaming_ohlc(spark, SF_SMOKE)
    want = timeseries_ohlc(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_bitmap_distinct_matches_batch(spark):
    """Live bitmap-word state (bit_or merge per micro-batch) converges to
    the batch exact distinct census — bit_or's mergeability proof, and
    the exact-answer complement of the HLL/CMS live sketches."""
    from parquet_storage_query_spark.operators.advanced import agg_bitmap_distinct

    got = sw.streaming_bitmap_distinct(spark, SF_SMOKE)
    want = agg_bitmap_distinct(spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_streaming_sequence_pattern_match_batch(spark):
    """The monotone prefix fold over the real sf0.001 corpus must yield
    the exact batch census (pattern, n_users, share_e6)."""
    from parquet_storage_query_spark.operators.events import events_sequence_pattern
    from parquet_storage_query_spark.streaming.stateful import (
        streaming_sequence_pattern,
    )

    got = _rows(streaming_sequence_pattern(spark, SF_SMOKE))
    want = _rows(events_sequence_pattern(spark, SF_SMOKE))
    assert got == want and len(got) >= 2


def test_streaming_sequence_pattern_across_micro_batches(spark, tmp_path):
    """A user's first-6 prefix SPANNING micro-batch boundaries is the
    state the fold must carry: u1's purchase arrives in file 2 (making
    an error_recovery journey 'vep...'), u2 fills its prefix in file 1
    and file 3's extra events must NOT change it, u3 appears only in
    file 3. Census must equal the batch operator on the union corpus."""
    import datetime as dt
    import time

    from parquet_storage_query_spark.operators.events import events_sequence_pattern
    from parquet_storage_query_spark.streaming.stateful import (
        streaming_sequence_pattern,
    )

    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    t = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    f1 = [
        (1, t + 0 * m, 1, "view", 0.0, "{}"),
        (12, t + 1 * m, 1, "click", 0.0, "{}"),
        (2, t + 2 * m, 1, "error", 0.0, "{}"),
        (3, t + 0 * m, 2, "view", 0.0, "{}"),
        (4, t + 1 * m, 2, "click", 0.0, "{}"),
        (5, t + 2 * m, 2, "view", 0.0, "{}"),
        (6, t + 3 * m, 2, "click", 0.0, "{}"),
        (7, t + 4 * m, 2, "view", 0.0, "{}"),
        (8, t + 5 * m, 2, "click", 0.0, "{}"),  # u2 prefix full: vcvcvc
    ]
    f2 = [
        (9, t + 3 * m, 1, "purchase", 9.0, "{}"),  # u1 -> 'vcep' = error_recovery
        # (p is 4th: not instant_buyer; e precedes p: not research_buyer)
    ]
    f3 = [
        (10, t + 9 * m, 2, "purchase", 9.0, "{}"),  # beyond u2's full prefix
        (11, t + 0 * m, 3, "purchase", 5.0, "{}"),  # u3: instant_buyer
    ]
    src = tmp_path / "src"
    src.mkdir()
    fed = []
    for name, rows in [("f1", f1), ("f2", f2), ("f3", f3)]:
        fed.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))
        time.sleep(1.1)  # strictly increasing mtimes -> deterministic order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    got = _rows(streaming_sequence_pattern(spark, str(tmp_path), stream=stream))

    batch_sf = tmp_path / "batch_sf"
    batch_sf.mkdir()
    spark.createDataFrame(fed, schema).coalesce(1).write.parquet(
        str(batch_sf / "events.parquet")
    )
    want = _rows(events_sequence_pattern(spark, str(batch_sf)))
    assert got == want
    pats = {r[0] for r in got}
    assert {"error_recovery", "window_shopper", "instant_buyer"} <= pats


def test_custom_stream_source_checkpoint_restart(spark, tmp_path):
    """The custom Python stream source must survive a stop/restart on
    the same checkpoint WITHOUT losing or duplicating rows: run one
    bounded drain while only half the shards exist, stop the query, add
    the remaining shards, restart from the same checkpoint, drain, and
    require the final complete-mode rollup to equal the batch read of
    everything. This drives the offset-cursor persistence and the
    readBetweenOffsets replay path end-to-end (the unit test covers the
    protocol; this covers Spark actually using it)."""
    import gzip
    import json

    from pyspark.sql import functions as F2

    from parquet_storage_query_spark.sources import jsonl_source

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def shard(k, ids):
        with gzip.open(src / f"shard-{k:04d}.json.gz", "wt", encoding="utf-8") as fh:
            for i in ids:
                fh.write(json.dumps({
                    "doc_id": i, "text": f"doc {i}", "lang": "en" if i % 2 else "fr",
                    "source": "t", "n_chars": 5 + i,
                }) + "\n")

    jsonl_source.register(spark)
    for k in range(5):
        shard(k, [10 * k, 10 * k + 1])

    def start():
        agg = (
            spark.readStream.format("jsonl_corpus")
            .option("path", str(src))
            .load()
            .groupBy("lang")
            .agg(F2.count(F2.lit(1)).alias("n"), F2.sum("n_chars").alias("c"))
        )
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("ckpt_restart_out")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # more shards arrive while the query is down
    for k in range(5, 9):
        shard(k, [10 * k, 10 * k + 1])

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["lang"]: (r["n"], r["c"])
        for r in spark.table("ckpt_restart_out").collect()
    }
    expect = {
        r["lang"]: (r["n"], r["c"])
        for r in (
            spark.read.format("jsonl_corpus").option("path", str(src)).load()
            .groupBy("lang")
            .agg(F2.count(F2.lit(1)).alias("n"), F2.sum("n_chars").alias("c"))
            .collect()
        )
    }
    assert got == expect
    assert sum(n for n, _ in got.values()) == 18  # nothing lost/duplicated


def test_tws_processor_fold_parity_with_batch(spark):
    """The transformWithStateInPandas port's StatefulProcessor must fold
    to EXACTLY the batch gaps-and-islands result when fed the corpus as
    per-user micro-batch cuts — proving the state contract is
    API-independent without needing the new API's protobuf state server
    (absent from this container): a dict-backed fake ValueState stands
    in for the handle, and the corpus is delivered per user in three
    time-ordered cuts so runs genuinely span 'micro-batches'."""
    import pandas as pd

    from parquet_storage_query_spark.operators.events import events_error_bursts
    from parquet_storage_query_spark.streaming.stateful import _BurstProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeValueState())

    from parquet_storage_query_spark.catalog import load

    errors = (
        load(spark, SF_SMOKE, "events")
        .filter("event_type = 'error'")
        .select("user_id", "ts", "event_id")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    got = {}
    for uid, updf in errors.groupby("user_id"):
        proc = _BurstProcessor()
        proc.init(FakeHandle())
        n = len(updf)
        cuts = [updf.iloc[: n // 3], updf.iloc[n // 3 : 2 * n // 3], updf.iloc[2 * n // 3 :]]
        last = None
        for cut in cuts:  # three sequential micro-batches per user
            # Each micro-batch arrives as MULTIPLE Arrow chunks, and the
            # chunk boundary is arbitrary w.r.t. time order (ADVICE r10
            # #2): scramble the cut and split it in two, so a fold that
            # sorts per-chunk instead of per-batch miscounts runs that
            # span the chunk boundary. The processor must concat-then-sort.
            scrambled = cut.sort_values(["event_id", "ts"])  # != time order
            m = len(scrambled)
            chunks = [scrambled.iloc[: m // 2], scrambled.iloc[m // 2 :]]
            for out in proc.handleInputRows((uid,), iter(chunks), None):
                last = out
        r = last.iloc[0]
        if r["n_bursts"] > 0:
            got[int(uid)] = (
                int(r["n_bursts"]),
                int(r["longest_burst"]),
                int(r["total_burst_errors"]),
            )
    want = {
        r["user_id"]: (r["n_bursts"], r["longest_burst"], r["total_burst_errors"])
        for r in events_error_bursts(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_tws_error_bursts_e2e_or_documented_hook(spark):
    """End-to-end transformWithStateInPandas run where the environment
    has protobuf (the new API's state-server protocol needs it);
    elsewhere the builder must fail LOUDLY with the documented
    NotImplementedError before the query starts — never the opaque
    'driver worker exited unexpectedly' crash the raw API gives."""
    import pytest as _pt

    from parquet_storage_query_spark.operators.events import events_error_bursts
    from parquet_storage_query_spark.streaming.stateful import (
        streaming_error_bursts_tws,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with _pt.raises(NotImplementedError, match="protobuf"):
            streaming_error_bursts_tws(spark, SF_SMOKE)
        return
    got = _rows(streaming_error_bursts_tws(spark, SF_SMOKE))
    want = _rows(events_error_bursts(spark, SF_SMOKE))
    assert got == want
