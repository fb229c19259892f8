"""CSV batch source with explicit schema and corrupt-record policy.

The CSV twin of the JSONL landing zone (`sources/jsonl.py`): the
events table staged as headerless CSV files, read back under a
DECLARED schema in PERMISSIVE mode so malformed rows (truncated
lines, type violations, wrong column counts) land in
`_corrupt_record` instead of failing the job or silently nulling
fields. CSV is the other landing-zone format every warehouse feed
still uses; the parser path (univocity line splitting, quote/escape
handling) and its failure modes are entirely different from JSON's,
so it gets its own round-trip proof.

Same design rules as the JSONL source:
- schema-on-read with a declared StructType — no sampling inference
  pass over 100 TB of landing files;
- timestamps ride as epoch-MICROS longs (format-ambiguity-free,
  precision-lossless) and re-enter through the magnitude-detecting
  `io.ts_from_epoch` chokepoint;
- doubles survive because Spark's CSV writer emits Java shortest
  round-trip representations and the reader parses them back to the
  identical IEEE-754 value.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# injected malformed rows: a type violation, a truncated line (too
# few columns with a non-castable tail), and a stray header-looking
# line. Deterministic so the valid-row counts are oracle-exact.
CORRUPT_ROWS = [
    "not-a-number,true,7,click,xyz",
    "12345,98765",
    "event_id,ts_us,user_id,event_type,value",
]


def stage_events_csv(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as a CSV landing dir (once per
    (sf_dir, pid)), with CORRUPT_ROWS appended as an extra file.
    Idempotent: reused if already staged by this process."""
    from lol_data_pipeline_spark.io import load_table

    import atexit
    import shutil

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    stage = os.path.join(tempfile.gettempdir(), f"csv_events_{h}_{os.getpid()}")
    done = os.path.join(stage, "_STAGED")
    if os.path.exists(done):
        return stage
    atexit.register(shutil.rmtree, stage, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    ev.write.mode("overwrite").option("header", "false").csv(stage)
    with open(os.path.join(stage, "zz_corrupt.txt"), "w") as f:
        f.write("\n".join(CORRUPT_ROWS) + "\n")
    with open(done, "w") as f:
        f.write("ok")
    return stage


def read_events_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the staged CSV landing zone under the declared schema,
    PERMISSIVE mode, with `ts` reconstructed from the epoch-micros
    column through the shared unit-detecting chokepoint. Malformed
    rows keep their raw line in `_corrupt_record` (and NULL fields),
    ready for quarantine-by-filter."""
    from lol_data_pipeline_spark.io import ts_from_epoch

    stage = stage_events_csv(spark, sf_dir)
    raw = (
        spark.read.schema(CSV_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "false")
        .csv(stage)
    )
    return raw.withColumn("ts", ts_from_epoch("ts_us"))
