"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API): a
manifest-driven JSONL source.

The reference reads datasets through hand-rolled manifest loops — a driver
lists object-store keys and ops open them imperatively
(``common/operators/io.py`` MinIO scans). The Spark-native shape is a
DataSource: the MANIFEST (a JSON file listing shard paths) is read once at
planning time, each shard becomes one ``InputPartition``, and executors
stream their shard's records — so a million-shard corpus plans in one
driver pass and reads with full parallelism, and the source composes with
the rest of the engine (filters, aggregates, joins) like any table.

Local JSONL keeps the demo dependency-free; swapping ``open`` for an object
store client (one per partition — the reference's MinIO pattern) changes
nothing structural.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class ManifestShard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestJsonlReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self.manifest = options["manifest"]
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        with open(self.manifest) as fh:
            shards = json.load(fh)["shards"]
        return [ManifestShard(p) for p in shards]

    def read(self, partition: ManifestShard):
        with open(partition.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(f) for f in self.fields)


class ManifestJsonlStreamReader(DataSourceStreamReader):
    """Streaming flavor of the manifest source: the OFFSET is the number of
    manifest shards already committed, so each micro-batch reads exactly the
    shards that appeared since the last batch — the continuous-ingest shape
    (a writer job appends shards + rewrites the manifest; the stream tails
    it). Replayability comes free: offsets (start, end) always map to the
    same manifest slice, so a failed batch re-reads identically — the
    exactly-once contract a Structured Streaming source must keep."""

    def __init__(self, options: dict, schema):
        self.manifest = options["manifest"]
        self.fields = [f.name for f in schema.fields]

    def _shards(self) -> list[str]:
        with open(self.manifest) as fh:
            return json.load(fh)["shards"]

    def initialOffset(self) -> dict:
        return {"shard": 0}

    def latestOffset(self) -> dict:
        return {"shard": len(self._shards())}

    def partitions(self, start: dict, end: dict):
        shards = self._shards()[start["shard"] : end["shard"]]
        return [ManifestShard(p) for p in shards]

    def read(self, partition: ManifestShard):
        with open(partition.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(f) for f in self.fields)

    def commit(self, end: dict) -> None:
        pass  # manifest shards are immutable; nothing to clean up


class ManifestJsonlDataSource(DataSource):
    """``spark.read.format("jsonl_manifest").schema(ddl)
    .option("manifest", path)`` — one input partition per manifest shard.
    Also registers a stream reader: ``spark.readStream.format(...)`` tails
    the manifest with shard-count offsets."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def reader(self, schema) -> ManifestJsonlReader:
        return ManifestJsonlReader(self.options, schema)

    def streamReader(self, schema) -> ManifestJsonlStreamReader:
        return ManifestJsonlStreamReader(self.options, schema)


def write_manifest(shard_dir: str, manifest_path: str) -> int:
    """List a JSONL shard directory into a manifest file; returns shard
    count. (In production the manifest is produced by the writer job.)"""
    shards = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.startswith("part-") and f.endswith(".json")
    )
    os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
    with open(manifest_path, "w") as fh:
        json.dump({"shards": shards}, fh)
    return len(shards)
