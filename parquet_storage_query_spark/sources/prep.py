"""Data preparation: format conversion + small-file compaction.

Reference parity (SURVEY.md §2.11 D2/D3): DataPreparationOrchestration.cs
enumerates source blobs, greedily bin-packs them into groups of at most
`BlobSizeTarget` MiB (DP:88-143), and rewrites each group as one Snappy
parquet file capped at 1 GiB (DP:145-170, sizeLimit=1073741824). This is
the classic lakehouse ingest: CSV.gz → parquet conversion and many-small-
files → few-right-sized-files compaction.

Spark-first design:
- `convert`: `spark.read.schema(s).csv(...)` → `.write.parquet(...)` —
  gzip codec auto-detected (DP's format='csv' on .csv.gz, DP:154, 165).
- `compact`: two modes.
  * `plan_packing` + per-group coalesce(1) mirrors the reference's greedy
    first-fit exactly (DP:113-141) — useful when group membership matters.
  * The default `compact` is the *Spark-native* strategy: one read of the
    whole folder, `repartition(ceil(bytes/target))`, one write — at 100 TB
    this is one distributed job instead of thousands of driver-sequenced
    group jobs, and AQE right-sizes the shuffle. The byte cap per output
    file is enforced with `maxRecordsPerFile` derived from sampled row
    width (Spark caps rows, not bytes — SURVEY §7 risk register).
- Bounded retry with backoff replaces the reference's unbounded transient
  retry recursion (DP:172-195; SURVEY §7: replicate as bounded).
"""

from __future__ import annotations

import math
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class PathMapping:
    """One compaction group: source files → one destination file.
    Mirrors the reference's PathMapping (DP:57-86)."""

    original_paths: tuple[str, ...]
    destination_path: str


def list_data_files(folder: str, suffix: str = "") -> list[tuple[str, int]]:
    """Enumerate (path, size) under a folder, skipping zero-length files —
    the reference's blob listing + empty filter (BC:15-30; DP:97-99).
    Local filesystem here; on a cluster the same via the Hadoop FS API."""
    out: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(folder):
        for f in sorted(files):
            if suffix and not f.endswith(suffix):
                continue
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            size = os.path.getsize(p)
            if size > 0:
                out.append((p, size))
    return out


def plan_packing(
    files: list[tuple[str, int]], dest_folder: str, target_mb: int | None
) -> list[PathMapping]:
    """Greedy size-target packing, one pass in listing order — the same
    accumulate-until-over-target loop as the reference (DP:113-141).
    target_mb None → 1:1 re-encode mapping (DP:133-139's no-target mode)."""
    if target_mb is None:
        return [
            PathMapping((p,), os.path.join(dest_folder, f"part-{i:05d}.parquet"))
            for i, (p, _s) in enumerate(files)
        ]
    target = target_mb * 1024 * 1024
    groups: list[PathMapping] = []
    current: list[str] = []
    acc = 0

    def flush() -> None:
        nonlocal current, acc
        if current:
            groups.append(
                PathMapping(
                    tuple(current),
                    os.path.join(dest_folder, f"part-{len(groups):05d}.parquet"),
                )
            )
            current, acc = [], 0

    for p, size in files:
        # flush BEFORE adding a file that would overflow (DP:119-132): groups
        # stay ≤ target unless a single file alone exceeds it
        if current and acc + size > target:
            flush()
        current.append(p)
        acc += size
    flush()
    return groups


def convert(
    spark: SparkSession,
    src: str | list[str],
    dest: str,
    schema: T.StructType,
    src_format: str = "csv",
    compression: str = "snappy",
    header: bool = False,
    dest_format: str = "parquet",
) -> None:
    """Format conversion (D3, DP:145-170): CSV[.gz] / JSON / parquet in →
    Snappy parquet out (default), schema enforced (never inferred — the
    reference declares all 7 columns in externaldata, DP:165).
    `dest_format` extends the reference's parquet-only sink to the other
    Spark-native columnar/row formats (orc / csv / json) for egest paths;
    compression falls back per-format where snappy is unsupported."""
    if src_format == "csv":
        df = spark.read.schema(schema).option("header", str(header).lower()).csv(src)
    elif src_format == "json":
        df = spark.read.schema(schema).json(src)
    elif src_format == "parquet":
        df = spark.read.schema(schema).parquet(*src if isinstance(src, list) else [src])
    else:
        raise ValueError(f"unsupported source format: {src_format}")
    w = df.write.mode("overwrite")
    if dest_format == "parquet":
        w.option("compression", compression).parquet(dest)
    elif dest_format == "orc":
        w.option("compression", compression).orc(dest)
    elif dest_format == "csv":
        w.option("compression", "gzip").option("header", "true").csv(dest)
    elif dest_format == "json":
        w.option("compression", "gzip").json(dest)
    else:
        raise ValueError(f"unsupported destination format: {dest_format}")


def append_evolving(df: DataFrame, dest: str) -> None:
    """Append a batch whose schema may differ from earlier batches (added
    or missing columns) to a parquet table dir. The reference declares a
    FIXED 7-column schema at ingest (DP:165); real lakehouse corpora add
    columns mid-stream (a crawler starts emitting `n_chars`, an old shard
    lacks it). Parquet handles this natively: each file carries its own
    schema and `read_evolving` reconciles them, null-filling the columns a
    file doesn't have. Nothing is rewritten — schema evolution is a
    metadata property of the read, O(footers), not O(data)."""
    df.write.mode("append").parquet(dest)


def read_evolving(spark: SparkSession, folder: str) -> DataFrame:
    """Read a parquet dir whose files were written under different schemas:
    `mergeSchema=true` unions the per-file schemas (footer-only work) and
    rows from files missing a column surface it as NULL. Scoped via the
    reader option, not the session-wide spark.sql.parquet.mergeSchema —
    same policy as read_ignoring_corrupt_files."""
    return spark.read.option("mergeSchema", "true").parquet(folder)


def export_jsonl(df: DataFrame, dest: str, compression: str = "gzip") -> None:
    """JSON-Lines egest — the LLM-corpus interchange format (one JSON object
    per line, gzip-compressed per part file). The inverse of `convert`'s
    json source: parquet-lake tables out to the format tokenizer/training
    toolchains consume. Distributed write, one part per partition; pair
    with `compact`-style repartition upstream to control part count."""
    df.write.mode("overwrite").option("compression", compression).json(dest)


def compact(
    spark: SparkSession,
    src_folder: str,
    dest_folder: str,
    target_mb: int = 256,
    max_file_bytes: int = 1 << 30,
    compression: str = "snappy",
) -> dict[str, int]:
    """Spark-native compaction (D2): one distributed read → repartition to
    ceil(total/target) → one write. The 1 GiB per-file cap (DP:158) is
    approximated via maxRecordsPerFile from sampled average row width.

    Returns {"in_files": N, "out_files": M} — the reference's printed
    compaction ratio (DP:69-73)."""
    files = list_data_files(src_folder, suffix=".parquet")
    total_bytes = sum(s for _p, s in files)
    df = spark.read.parquet(src_folder)
    n_parts = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    # bytes cap → rows cap from parquet FOOTER metadata (num_rows is free in
    # every footer) — not df.count(), which would scan the entire input a
    # second time just to size output files
    import pyarrow.parquet as pq

    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p, _s in files)
    avg_row = max(1, total_bytes // max(1, n_rows))
    max_records = max(1, max_file_bytes // avg_row)

    (
        df.repartition(n_parts)
        .write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records)
        .parquet(dest_folder)
    )
    out_files = list_data_files(dest_folder, suffix=".parquet")
    return {"in_files": len(files), "out_files": len(out_files), "n_rows": n_rows}


def compact_grouped(
    spark: SparkSession,
    src_folder: str,
    dest_folder: str,
    target_mb: int | None,
    compression: str = "snappy",
) -> list[PathMapping]:
    """Reference-faithful grouped compaction: greedy first-fit groups
    (plan_packing ≙ DP:88-143), each group read and written as exactly one
    file via coalesce(1) (≙ one .export per mapping, DP:145-170).
    Driver-sequenced per group — use `compact` for large folders."""
    import shutil

    files = list_data_files(src_folder, suffix=".parquet")
    mappings = plan_packing(files, dest_folder, target_mb)
    os.makedirs(dest_folder, exist_ok=True)
    for m in mappings:
        # Spark writes a DIRECTORY of part files; the reference's contract is
        # one FILE per mapping (one .export blob, DP:145-170) — write to a
        # staging dir, then move the single part file to destination_path
        staging = m.destination_path + ".staging"
        (
            spark.read.parquet(*m.original_paths)
            .coalesce(1)
            .write.mode("overwrite")
            .option("compression", compression)
            .parquet(staging)
        )
        parts = [f for f in os.listdir(staging) if f.endswith(".parquet")]
        assert len(parts) == 1, f"coalesce(1) produced {len(parts)} files"
        os.replace(os.path.join(staging, parts[0]), m.destination_path)
        shutil.rmtree(staging)
    return mappings


def csv_with_error_channel(
    spark: SparkSession, src: str | list[str], schema: T.StructType
) -> DataFrame:
    """Per-record error channel (D5): the reference prints each failing
    blob's position/name/description and continues (QueryOrchestration.cs:
    470-475). Spark's analogue is PERMISSIVE mode with a _corrupt_record
    column: malformed rows land in the channel instead of failing the job,
    and `WHERE _corrupt_record IS NOT NULL` is the error report."""
    with_channel = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(with_channel)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(src)
    )


def read_ignoring_corrupt_files(spark: SparkSession, folder: str) -> DataFrame:
    """Per-FILE error channel: skip unreadable parquet blobs and keep going
    (the reference's continue-on-blob-error behavior at file granularity).
    Scoped via the DataFrame reader option, not session-wide config."""
    return spark.read.option("ignoreCorruptFiles", "true").parquet(folder)


def _default_permanent() -> tuple[type[BaseException], ...]:
    """Exception types that fail identically on retry (the reference's
    IsPermanent check, DP:185): plan/schema/config errors, not transients."""
    from pyspark.errors import AnalysisException, IllegalArgumentException

    return (AnalysisException, IllegalArgumentException, ValueError, KeyError, TypeError)


def with_retry(
    fn: Callable[[], None],
    max_attempts: int = 4,
    base_delay_s: float = 0.5,
    permanent: tuple[type[BaseException], ...] | None = None,
) -> None:
    """Bounded exponential-backoff retry for job-level transients —
    replaces the reference's unbounded recursion with a bounded loop
    (DP:172-195; SURVEY §7 risk register) and keeps its permanent-vs-
    transient distinction: deterministic failures re-raise immediately
    instead of sleeping through pointless attempts."""
    if permanent is None:
        permanent = _default_permanent()
    for attempt in range(max_attempts):
        try:
            fn()
            return
        except permanent:
            raise
        except Exception:  # noqa: BLE001 — transient by elimination
            if attempt == max_attempts - 1:
                raise
            time.sleep(base_delay_s * (2**attempt))


def rewrite_zorder(
    spark: SparkSession,
    src: str | DataFrame,
    dest_folder: str,
    z_col,
    n_files: int = 16,
    compression: str = "snappy",
) -> dict[str, int]:
    """Physical z-order rewrite: cluster the table on a Morton z-value so a
    predicate on ANY interleaved dimension prunes most output files via
    parquet footer stats (single-column sorting only clusters its leading
    column). `z_col` is the z-value expression — e.g.
    `operators.advanced._z_value(x, y)` — kept a parameter so callers pick
    the dimensions.

    Shape: repartitionByRange(z) routes rows to files by z-range (a
    sampled range exchange — ONE shuffle, no global sort barrier), then
    sortWithinPartitions(z) orders rows inside each file so row-group
    stats are tight too. This executes the plan that
    `prep_zorder_layout` (the queryable planner) reports.

    `src` may be a folder path or an already-loaded DataFrame — pass
    `catalog.load(...)` output for tables needing read-time fixes (e.g.
    the events table's TIMESTAMP(NANOS) handling).

    Dimension scaling matters: interleaving only balances dimensions whose
    VALUE RANGES fill comparable bit widths. A dim spanning 0-15 zipped
    with one spanning 0-255 leaves its high bits constant and the curve
    degenerates to ordering by the wider dim — scale each dim (min-max or
    rank) to the interleave width before passing `z_col`."""
    base = src if isinstance(src, DataFrame) else spark.read.parquet(src)
    df = base.withColumn("_z", z_col)
    (
        df.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(dest_folder)
    )
    out = list_data_files(dest_folder, suffix=".parquet")
    return {"out_files": len(out)}
