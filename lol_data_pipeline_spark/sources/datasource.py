"""PySpark 4 Python DataSource for the paginated match-ID API.

The reference's ID scan (src/api/matches.py:21-53) is a driver-side
loop: for each queue type, GET pages of 100 IDs until exhausted.
This DataSource turns that into a first-class Spark source where
**each (queue_type, page) is an InputPartition** — pages are fetched
in parallel by executors, scale out with the cluster, and appear to
Catalyst as a normal scan (prunable, filterable).

The page fetch itself is pluggable; the default synthesizes the same
deterministic IDs as sources.riot.match_id_scan (no network). A real
implementation would issue the HTTP GET inside ``read()`` — the
partition layout, retry placement, and rate budget per task carry
over unchanged.

Usage:
    spark.dataSource.register(MatchIdDataSource)
    df = (spark.read.format("riot_match_ids")
          .option("queues", "draft,blind")
          .option("num_matches", 1000)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("match_id", StringType()),
        StructField("queue_type", StringType()),
        StructField("page_start", IntegerType()),
    ]
)


class MatchPagePartition(InputPartition):
    def __init__(self, queue_type: str, page_start: int, page_size: int):
        self.queue_type = queue_type
        self.page_start = page_start
        self.page_size = page_size


class MatchIdReader(DataSourceReader):
    def __init__(self, options):
        self.queues = [q for q in str(options.get("queues", "draft,blind,aram")).split(",") if q]
        self.num_matches = int(options.get("num_matches", 1000))
        self.page_size = int(options.get("page_size", 100))

    def partitions(self):
        return [
            MatchPagePartition(q, start, self.page_size)
            for q in self.queues
            for start in range(0, self.num_matches, self.page_size)
        ]

    def read(self, partition: MatchPagePartition):
        # One "HTTP page" per partition; deterministic synthetic IDs
        # (same shape as sources.riot). A live source would GET
        # ...?start={page_start}&count={page_size} here, with 429
        # retry/backoff local to this task.
        for i in range(partition.page_start, partition.page_start + partition.page_size):
            yield (f"NA1_{i:07d}", partition.queue_type, partition.page_start)


class MatchIdDataSource(DataSource):
    @classmethod
    def name(cls):
        return "riot_match_ids"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return MatchIdReader(self.options)

    def streamReader(self, schema):
        return MatchIdStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming variant: the same paginated scan as an incremental
# readStream source — pages appear over time, each micro-batch plans
# the newly-visible pages as parallel InputPartitions. Offsets are
# page cursors, so replay after failure re-reads exactly the pages of
# the failed batch (exactly-once with a deterministic page fetch).
# ---------------------------------------------------------------------------


class MatchIdStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the paginated ID API.

    ``latestOffset`` models polling the API: each call discovers up
    to ``pages_per_batch`` new pages until ``max_pages`` is reached
    (a live source would compare the remote cursor instead). Spark
    hands (start, end] back to ``partitions()``, which fans the page
    range out one InputPartition per (queue, page) — identical
    executor-side layout to the batch reader, so the retry/rate
    policy placement carries over."""

    def __init__(self, options):
        self.queues = [q for q in str(options.get("queues", "draft,blind")).split(",") if q]
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))
        self.max_pages = int(options.get("max_pages", 6))
        self._seen = 0

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        self._seen = min(self._seen + self.pages_per_batch, self.max_pages)
        return {"page": self._seen}

    def partitions(self, start, end):
        return [
            MatchPagePartition(q, p * self.page_size, self.page_size)
            for p in range(int(start["page"]), int(end["page"]))
            for q in self.queues
        ]

    def read(self, partition: MatchPagePartition):
        for i in range(partition.page_start, partition.page_start + partition.page_size):
            yield (f"NA1_{i:07d}", partition.queue_type, partition.page_start)

    def commit(self, end):
        pass  # page fetches are idempotent; nothing to release
