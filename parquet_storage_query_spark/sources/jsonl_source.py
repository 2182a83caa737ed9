"""Custom Python DataSource: JSONL-gz corpus shards as a first-class
Spark source (SURVEY §2.1 S5/S6 extension seam, Spark 4 DataSource API).

The reference's source layer is "enumerate blobs, decode each one"
(QueryOrchestration.cs:478-496 fan-out; DataPreparation CSV.gz decode
DP:145-170). Spark's built-in json reader covers JSONL already — this
module demonstrates the seam a format Spark LACKS would use: a
`DataSource` subclass registered on the session, planning ONE input
partition per shard file (the per-blob fan-out, driver-side listing
only), each task decoding its own gzip stream.

Slow-path caveat, stated plainly: rows produced by a Python DataSource
cross the Python→JVM boundary per batch; for formats Spark has native
readers for, the native reader wins. The seam exists for the formats it
doesn't, and the partitioning/schema contract here is the part that
carries over.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

CORPUS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


class JsonlShard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        # driver-side listing only — one partition per shard file, the
        # per-blob fan-out unit (QO:478-496)
        import os

        return [
            JsonlShard(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".json.gz") or f.endswith(".json")
        ]

    def read(self, partition: JsonlShard):
        import gzip
        import json

        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rt", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                d = json.loads(line)
                yield (
                    d.get("doc_id"),
                    d.get("text"),
                    d.get("lang"),
                    d.get("source"),
                    d.get("n_chars"),
                )


class JsonlCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_corpus"

    def schema(self) -> str:
        return CORPUS_SCHEMA

    def reader(self, schema) -> JsonlCorpusReader:
        return JsonlCorpusReader(self.options)


def register(spark) -> None:
    # the reader classes pickle BY REFERENCE — ship the package zip so
    # executor-side Python workers can import this module even when the
    # driving process's CWD/sys.path lacks the repo (VERDICT r5 bug:
    # ModuleNotFoundError in workers when driven from /tmp)
    from ..pkgship import ship_package

    ship_package(spark)
    spark.dataSource.register(JsonlCorpusDataSource)
