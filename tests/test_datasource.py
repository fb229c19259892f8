"""Tests for the PySpark 4 Python DataSource paginated source."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lol_data_pipeline_spark.sources.datasource import MatchIdDataSource


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(MatchIdDataSource)


def test_datasource_partitions_per_page(spark):
    df = (
        spark.read.format("riot_match_ids")
        .option("queues", "draft,blind")
        .option("num_matches", 300)
        .load()
    )
    assert df.count() == 600  # 2 queues × 3 pages × 100
    # one input partition per (queue, page) → parallel page fetches
    assert df.rdd.getNumPartitions() == 6
    pages = {r.page_start for r in df.select("page_start").distinct().collect()}
    assert pages == {0, 100, 200}


def test_datasource_dedups_across_queues(spark):
    df = (
        spark.read.format("riot_match_ids")
        .option("queues", "draft,blind,aram")
        .option("num_matches", 200)
        .load()
    )
    assert df.select("match_id").distinct().count() == 200


def test_datasource_filter_prunes_rows(spark):
    df = (
        spark.read.format("riot_match_ids")
        .option("queues", "draft")
        .option("num_matches", 200)
        .load()
        .filter(F.col("page_start") == 100)
    )
    assert df.count() == 100
