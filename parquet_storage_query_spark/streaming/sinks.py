"""Streaming parquet sink (S7's streaming twin): readStream → writeStream
to snappy parquet with a checkpoint — the continuous-ingest version of the
reference's batch parquet sink (DataPreparationOrchestration.cs:145-170).

The checkpoint carries the source offsets and sink commit log, which is
what makes the pipeline exactly-once across restarts: a resumed query
re-reads nothing it already committed (tests restart the same checkpoint
and assert zero duplicate rows). At 100 TB/day this is the ingest tier:
file-source backpressure via maxFilesPerTrigger, one output commit per
micro-batch, downstream readers see atomic batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .windows import read_events_stream


def stream_events_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    dest: str,
    checkpoint: str,
    compression: str = "snappy",
) -> DataFrame:
    """Drain the events stream into a parquet folder (exactly-once via the
    checkpoint) and return a batch DataFrame over the written output."""
    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .option("compression", compression)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dest)


def stream_upsert_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    dest: str,
    checkpoint: str,
    key: str = "user_id",
    stream: DataFrame | None = None,
) -> DataFrame:
    """Streaming CDC apply: maintain a latest-row-per-key snapshot table
    from a live stream via foreachBatch merge — the streaming twin of
    `prep_upsert_snapshot` (delta-wins copy-on-write), and the pattern a
    lakehouse runs to keep a serving table current from an event stream.

    Each micro-batch: (1) reduce the batch to one winner per key (latest
    event-time), (2) merge by keeping the (ts, event_id)-max row per key
    across delta ∪ snapshot, (3) atomically swap the snapshot dir. The
    event-time comparison — NOT blind delta-wins — is what makes the
    merge correct under out-of-order arrival: a micro-batch may deliver
    an event OLDER than the snapshot's current row for that key (the
    multi-batch test drives exactly this), and it also makes replayed
    batches idempotent after a checkpoint restart.

    At scale the swap step is what a table format replaces with a
    transactional commit; the dataflow (broadcast delta anti-join, only
    delta-keyed files rewritten) is identical."""
    import os
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from .windows import read_events_stream

    live = dest + "/live"
    staging = dest + "/staging"

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        w = W.partitionBy(key).orderBy(F.col("ts").desc(), F.col("event_id").desc())

        def latest_per_key(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )

        delta = latest_per_key(batch_df)
        if os.path.isdir(live):
            combined = delta.unionByName(spark.read.parquet(live))
            merged = latest_per_key(combined)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(live):
            shutil.rmtree(live)
        os.rename(staging, live)

    src = stream if stream is not None else read_events_stream(spark, sf_dir)
    q = (
        src.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(live)


def stream_rollup_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    dest: str,
    checkpoint: str,
    stream: DataFrame | None = None,
) -> DataFrame:
    """Streaming MATERIALIZED-VIEW maintenance: keep the daily per-type
    rollup current from a live stream — the continuous twin of
    `agg_incremental_rollup` (operators/advanced.py). Each micro-batch
    reduces to (day, event_type, count, Σcents) partials, merges them
    into the standing rollup by re-aggregating partial-with-partial
    (integer partials: bit-exact under any merge order and any batch
    cut), and atomically swaps the table. Exactly-once across restarts
    comes from the checkpoint, and REPLAYED batches cannot double-count
    because the swap is atomic per committed micro-batch.

    At 100 TB/day this is the serving tier the batch operator bootstraps:
    the dashboard query reads O(days × types) rows no matter how much
    raw history exists, and the stream keeps it fresh without any rescan
    (same contract the CDC-apply sink pins for snapshots)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from .windows import read_events_stream

    live = dest + "/live"
    staging = dest + "/staging"

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sc"),
        )

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        delta = partials(batch_df)
        if os.path.isdir(live):
            merged = (
                delta.unionByName(spark.read.parquet(live))
                .groupBy("day", "event_type")
                .agg(F.sum("n").alias("n"), F.sum("sc").alias("sc"))
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(live):
            shutil.rmtree(live)
        os.rename(staging, live)

    src = stream if stream is not None else read_events_stream(spark, sf_dir)
    q = (
        src.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(live)
