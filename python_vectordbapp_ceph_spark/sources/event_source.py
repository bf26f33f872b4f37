"""Custom Python DataSource (Spark 4 DataSource API): the S3
bucket-notification event feed as a first-class format.

The reference consumes RGW bucket notifications over a Knative webhook
(SURVEY §3.1). As a Spark source the same feed is ``spark.read.format
("s3events")`` — here backed by a deterministic synthetic generator
(options: n, bucket, seed) standing in for the RGW/Kafka endpoint; a
production impl swaps `_rows` for the real poll without touching the
Spark surface.

Partition-aware: the read splits into ``numPartitions`` independent
ranges, so generation (or fetching) parallelizes across executors —
the DataSource API's contract for scalable custom connectors.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENT_SCHEMA = (
    "bucket string, key string, event_name string, event_ts timestamp, "
    "tags map<string,string>"
)

_OPS = ("ObjectCreated:Put", "ObjectCreated:Copy", "ObjectRemoved:Delete")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _rows(bucket: str, seed: int, start: int, end: int):
    for i in range(start, end):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        op = _OPS[h[0] % 4 % 3]  # deletes rarer (index 3 folds to 0)
        key = f"obj-{h[1] % 50:03d}.txt"
        ts = _EPOCH + timedelta(seconds=i * 37 + h[2])
        tags = {"color": ["red", "blue", "green"][h[3] % 3]} if h[4] % 2 else {}
        yield (bucket, key, op, ts.replace(tzinfo=None), tags)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class S3EventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.bucket = options.get("bucket", "bucket-1")
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 4))

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range):
        yield from _rows(self.bucket, self.seed, partition.start, partition.end)


class S3EventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the event feed: each micro-batch drains up to
    ``batchSize`` events past the checkpointed offset, capped at ``n``
    total — the notification queue the reference's webhook consumes
    push-style, consumed pull-style with Spark-managed offsets.

    Offsets are plain ``{"index": i}`` dicts: Structured Streaming
    checkpoints them, so restart resumes exactly where the last
    committed batch ended (at-least-once into foreachBatch, exactly-
    once through idempotent sinks — the same contract as ingest.py).
    ``readBetweenOffsets`` replays any committed span deterministically
    (the generator is a pure function of (seed, range)), which is what
    makes crash-recovery correct."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.batch = int(options.get("batchSize", 20))
        self.bucket = options.get("bucket", "bucket-1")
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        i = int(start["index"])
        j = min(self.n, i + self.batch)
        # materialized list, not a generator: the SimpleStreamReader
        # prefetch cache copy.copy()s the returned iterator when
        # planning partitions, which only works for list iterators.
        # Bounded by batchSize rows — the simple reader runs on the
        # driver by design (right for a notification-queue-rate feed;
        # a firehose source would use the partition-planning
        # DataSourceStreamReader instead).
        return iter(list(_rows(self.bucket, self.seed, i, j))), {"index": j}

    def readBetweenOffsets(self, start, end):
        return iter(
            list(_rows(self.bucket, self.seed, int(start["index"]), int(end["index"])))
        )


class S3EventsDataSource(DataSource):
    """spark.read.format("s3events").option("n", 1000).load() — or
    spark.readStream.format("s3events") for the continuous feed."""

    @classmethod
    def name(cls) -> str:
        return "s3events"

    def schema(self) -> str:
        return EVENT_SCHEMA

    def reader(self, schema: StructType) -> S3EventsReader:
        return S3EventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> S3EventsStreamReader:
        return S3EventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(S3EventsDataSource)
