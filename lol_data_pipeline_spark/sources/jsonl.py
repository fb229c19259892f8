"""JSON-lines batch source with explicit schema and corrupt-record
policy.

The reference consumes JSON payloads over HTTP and trusts them
blindly (`/root/reference/src/api/pipeline.py:67` — `response.json()`
with a try/except around content type only). At scale the equivalent
surface is a JSONL landing zone read with a DECLARED schema and an
explicit malformed-row policy: PERMISSIVE mode routes undecodable
lines into a `_corrupt_record` column instead of failing the job or
silently nulling fields, so the pipeline can count/quarantine them.

Timestamps ride as epoch-MICROS longs in the JSON (format-ambiguity-
free AND precision-lossless for parquet TIMESTAMP(MICROS)) and are
normalized back through the magnitude-detecting `io.ts_from_epoch` —
the same single chokepoint every other long→timestamp path uses.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# injected malformed lines: one truncated JSON, one schema-violating
# type. Deterministic so the valid-row counts are oracle-exact.
CORRUPT_LINES = [
    '{"event_id": 999999999, "ts_us": 1700000',
    '{"event_id": "not-a-number", "ts_us": true, "value": "x"}',
]


def stage_events_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as a JSONL landing dir (once per
    (sf_dir, pid)), with CORRUPT_LINES appended as an extra file.
    Idempotent: reused if already staged by this process."""
    from lol_data_pipeline_spark.io import load_table

    import atexit
    import shutil

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    stage = os.path.join(tempfile.gettempdir(), f"jsonl_events_{h}_{os.getpid()}")
    done = os.path.join(stage, "_STAGED")
    if os.path.exists(done):
        return stage
    # pid-scoped dirs would otherwise accrete across runs — remove
    # this process's staging on exit (reuse within the process stands)
    atexit.register(shutil.rmtree, stage, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    ev.select(F.to_json(F.struct(*ev.columns)).alias("line")).write.mode(
        "overwrite"
    ).text(stage)
    with open(os.path.join(stage, "zz_corrupt.txt"), "w") as f:
        f.write("\n".join(CORRUPT_LINES) + "\n")
    with open(done, "w") as f:
        f.write("ok")
    return stage


def read_events_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-enforced PERMISSIVE read of the staged JSONL: valid rows
    get typed columns + a normalized timestamp; malformed lines
    surface as `_corrupt_record` rows with NULL fields."""
    from lol_data_pipeline_spark.io import ts_from_epoch

    stage = stage_events_jsonl(spark, sf_dir)
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(stage + "/*.txt")
    )
    return raw.withColumn("ts", ts_from_epoch("ts_us"))
