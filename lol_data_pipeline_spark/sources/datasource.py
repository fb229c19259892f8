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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
