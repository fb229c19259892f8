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


def test_load_file_json_and_csv_roundtrip(spark, sf_dir, tmp_path):
    """Generic json/csv source: declared schema honored, values
    round-trip through both formats."""
    from lol_data_pipeline_spark.io import load_file, load_table

    nation = load_table(spark, sf_dir, "nation")
    jdir, cdir = str(tmp_path / "n_json"), str(tmp_path / "n_csv")
    nation.write.mode("overwrite").json(jdir)
    nation.write.mode("overwrite").option("header", "true").csv(cdir)
    ddl = "n_nationkey int, n_name string, n_regionkey int"
    back_j = load_file(spark, jdir, "json", schema=ddl)
    back_c = load_file(spark, cdir, "csv", schema=ddl)
    want = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in back_j.collect()} == want
    assert {tuple(r) for r in back_c.collect()} == want


def test_stream_datasource_incremental_pages(spark, tmp_path):
    """readStream over the custom source: micro-batches advance the
    page cursor (pages_per_batch per poll) until max_pages; every
    match id lands exactly once (offset-range planning + idempotent
    page reads = exactly-once)."""
    q = (
        spark.readStream.format("riot_match_ids")
        .option("queues", "draft,blind")
        .option("page_size", 50)
        .option("pages_per_batch", 2)
        .option("max_pages", 4)
        .load()
        .writeStream.format("memory")
        .queryName("stream_pages")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM stream_pages").collect()
    # 4 pages × 50 ids × 2 queues, each exactly once
    assert len(out) == 400
    per_queue = {}
    for r in out:
        per_queue.setdefault(r.queue_type, set()).add(r.match_id)
    assert set(per_queue) == {"draft", "blind"}
    for ids in per_queue.values():
        assert len(ids) == 200  # no duplicates within a queue
    assert {r.page_start for r in out} == {0, 50, 100, 150}
