"""Schema-evolution parquet source: one landing zone, two write-time
schemas, one merged read.

A 100 TB pipeline's landing zone is long-lived: partitions written
before a producer upgrade lack columns that later partitions carry.
The reference pins a fixed 14-field projection and would simply crash
or silently drop on a payload-shape change
(`/root/reference/src/api/utils/utils.py:25-153` hard-codes the field
list); the Spark-native surface is `mergeSchema` — the footer schemas
of every partition are unioned, and rows from pre-upgrade partitions
come back with NULLs in the added columns, so one query spans eras
without a backfill.

Staged deterministically so a DuckDB oracle can reproduce the exact
era split: era v1 = odd event_ids with the original column set, era
v2 = even event_ids plus an added ``src_bucket`` column computed from
existing data (pmod(event_id, 16)). Same staging idempotence/cleanup
contract as sources/jsonl.py.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stage_events_two_schemas(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as two parquet subdirs with DIFFERENT
    schemas (once per (sf_dir, pid)): era=v1 (odd event_ids, original
    columns) and era=v2 (even event_ids, plus src_bucket). Idempotent
    within the process; removed at exit."""
    import atexit
    import shutil

    from lol_data_pipeline_spark.io import load_table

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    stage = os.path.join(tempfile.gettempdir(), f"evo_events_{h}_{os.getpid()}")
    done = os.path.join(stage, "_STAGED")
    if os.path.exists(done):
        return stage
    atexit.register(shutil.rmtree, stage, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(
        os.path.join(stage, "era=v1")
    )
    (
        ev.filter(F.col("event_id") % 2 == 0)
        .withColumn("src_bucket", F.pmod(F.col("event_id"), F.lit(16)).cast("long"))
        .write.mode("overwrite")
        .parquet(os.path.join(stage, "era=v2"))
    )
    with open(done, "w") as f:
        f.write("ok")
    return stage


def read_events_merged(spark: SparkSession, sf_dir: str):
    """Merged-schema read over both eras: v1 rows carry NULL
    src_bucket. ``mergeSchema`` unions footer schemas at planning
    time (cost: one footer read per file, not a data scan); column
    pruning and filter pushdown still reach each file's scan."""
    stage = stage_events_two_schemas(spark, sf_dir)
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", stage)
        .parquet(os.path.join(stage, "era=*"))
    )
