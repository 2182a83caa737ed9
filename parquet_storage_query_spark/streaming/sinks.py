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
