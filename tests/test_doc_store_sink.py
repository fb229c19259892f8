"""Document-store sink adapter against sqlite (reference db.py:23-38
truncate-and-load semantics, distributed per-partition writers)."""

from __future__ import annotations

import json
import sqlite3

from pyspark.sql import functions as F

from lol_data_pipeline_spark.io import load_table
from lol_data_pipeline_spark.sinks import (
    sqlite_connect,
    write_stream_doc_store,
    write_truncate_and_load,
)


def _docs(db_path, collection):
    with sqlite3.connect(db_path) as conn:
        return [json.loads(r[0]) for r in conn.execute(f"SELECT doc FROM {collection}")]


def test_truncate_and_load_roundtrip(spark, sf_dir, tmp_path):
    db = str(tmp_path / "store.db")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text").limit(50)
    write_truncate_and_load(src.repartition(8), sqlite_connect(db), "match_data")
    docs = _docs(db, "match_data")
    assert len(docs) == 50
    want = {r["doc_id"]: r["text"] for r in (x.asDict() for x in src.collect())}
    got = {d["doc_id"]: d["text"] for d in docs}
    assert got == want


def test_truncate_and_load_is_idempotent_on_rerun(spark, sf_dir, tmp_path):
    """Reference semantics: delete_many({}) before insert_many — a
    re-run replaces the collection, never duplicates it."""
    db = str(tmp_path / "store.db")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").limit(20)
    for _ in range(3):
        write_truncate_and_load(src, sqlite_connect(db), "match_data")
    assert len(_docs(db, "match_data")) == 20


def test_non_json_types_are_stringified(spark, tmp_path):
    db = str(tmp_path / "store.db")
    df = spark.sql(
        "SELECT 1 AS id, DATE'2024-03-01' AS d, TIMESTAMP'2024-03-01 10:00:00' AS ts"
    )
    write_truncate_and_load(df, sqlite_connect(db), "typed")
    (doc,) = _docs(db, "typed")
    assert doc["d"] == "2024-03-01" and doc["ts"].startswith("2024-03-01 10:00")


def test_streaming_epoch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch routes micro-batches through the same adapter;
    the per-epoch delete makes replay idempotent."""
    from lol_data_pipeline_spark.streaming.windows import _events_stream

    db = str(tmp_path / "store.db")
    stream = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
    )
    epochs = write_stream_doc_store(stream, sqlite_connect(db), "agg")
    assert epochs  # at least one micro-batch ran
    docs = _docs(db, "agg")
    assert docs and all({"event_type", "n", "w"} <= set(d) for d in docs)
