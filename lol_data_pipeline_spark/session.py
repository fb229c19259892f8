"""SparkSession factory tuned for both local testing and cluster scale.

The knobs below are chosen for the 100 TB posture:
- AQE on (runtime coalesce, skew-join splitting, dynamic join
  selection) so a plan tuned at sf0.1 survives a 1000× scale-up.
- shuffle partitions sized from the environment (cores locally; on a
  real cluster this would be ~2-3× total executor cores, and AQE
  coalesces down).
- UTC session timezone so timestamp semantics match the DuckDB
  oracle and are cluster-timezone-independent.
- Arrow enabled for every pandas-UDF / toPandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_APP = "lol_data_pipeline_spark"


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = _DEFAULT_APP,
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a cluster, ``master`` comes from spark-submit and is left
    unset here; locally we default to ``local[N]`` with N from
    $SPARK_GRAFT_CPUS.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # canChangeCachedPlanOutputPartitioning stays at its default
        # (false): measured A/B at sf0.1 — enabling it let AQE
        # re-plan inside cached subtrees but REGRESSED persist-heavy
        # entries ~40% (dedup_simhash 1.1→1.75 s, minhash 1.36→1.62)
        # with no win on the label-propagation loop it was meant to
        # help (that cost is stage-scheduling, which AQE can't
        # remove). See PERF_NOTES.md.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Read nominal TIMESTAMP (no tz) parquet the way the oracle does.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in io.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
