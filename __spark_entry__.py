"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``lol_data_pipeline_spark/plans/queries.py``
(one registered plan + oracle SQL per operator from SURVEY.md §2 and
the north-star extensions); this module only adapts it to the driver
interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session-level invariants to a driver-owned
    session (UTC timestamps for oracle parity, AQE, nanos handling)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; load_table handles both shapes
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Scan lineitem → join orders → join filtered customer dim
    (broadcast) → groupBy → agg → top-k: proves
    scan/filter/join/agg/sort/limit end-to-end.
    """
    from lol_data_pipeline_spark.plans import REGISTRY

    _configure(spark)
    return REGISTRY["rel_q3_shipping"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + M2/M3)."""
    from lol_data_pipeline_spark.plans import REGISTRY

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from lol_data_pipeline_spark.plans import REGISTRY

    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
