"""Sketches and hierarchical rollups.

Spark's built-in approximate aggregates (HLL++ approx_count_distinct,
t-digest approx_percentile) are implementation-specific, so a DuckDB
oracle can't reproduce them bit-for-bit. These operators instead use
DETERMINISTIC sketch constructions both engines compute identically:

- KMV (K-minimum-values) distinct-count sketch: keep the K smallest
  60-bit md5 hashes per group; estimate = (K-1) / θ where θ is the
  K-th smallest hash normalized to (0,1]. Groups with fewer than K
  distinct values are exact. The estimator is the classic
  order-statistics bound (Bar-Yossef et al.) — mergeable (union of
  min-sets) and therefore shuffle-friendly at 100 TB.
- Hierarchical time rollup: hourly pre-aggregates re-aggregated into
  daily — the continuous-aggregate pattern (sums of sums, counts of
  counts). At scale the hourly tier is materialized incrementally
  and daily queries never touch raw events.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from lol_data_pipeline_spark.functions.scalar import md5_long
from lol_data_pipeline_spark.plans.queries import T, query

_K = 64
_HASH_SPACE = float(2**60)  # md5_long is 15 hex digits = 60 bits

SQL_MD5_LONG = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


@query(
    "sketch_kmv_distinct",
    sql=f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             {SQL_MD5_LONG.format(expr="CAST(l_orderkey AS VARCHAR)")} AS h
      FROM lineitem
    ), r AS (
      SELECT l_returnflag, h,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n_distinct
      FROM h
    )
    SELECT l_returnflag,
           CAST(max(n_distinct) AS BIGINT) AS exact_distinct,
           round(CASE WHEN max(n_distinct) < {_K} THEN CAST(max(n_distinct) AS DOUBLE)
                 ELSE ({_K} - 1) / (max(CASE WHEN rn = {_K} THEN h END) / {_HASH_SPACE})
                 END, 4) AS kmv_estimate
    FROM r WHERE rn <= {_K}
    GROUP BY 1
    """,
)
def sketch_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch per l_returnflag vs the exact count.
    Deterministic (md5 order statistics), so the oracle reproduces
    the estimate exactly — the property HLL lacks."""
    li = T(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        md5_long(F.col("l_orderkey").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    wall = Window.partitionBy("l_returnflag")
    r = h.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_distinct", F.count("*").over(wall)
    )
    return (
        r.filter(F.col("rn") <= _K)
        .groupBy("l_returnflag")
        .agg(
            F.max("n_distinct").cast("long").alias("exact_distinct"),
            F.round(
                F.when(
                    F.max("n_distinct") < _K,
                    F.max("n_distinct").cast("double"),
                ).otherwise(
                    (_K - 1)
                    / (
                        F.max(F.when(F.col("rn") == _K, F.col("h")))
                        / F.lit(_HASH_SPACE)
                    )
                ),
                4,
            ).alias("kmv_estimate"),
        )
    )


@query(
    "rel_time_rollup_hierarchy",
    sql="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, sum(value) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day, event_type,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(sum(sv), 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n_hours
    FROM hourly GROUP BY 1, 2
    """,
)
def rel_time_rollup_hierarchy(spark, sf_dir):
    """Hierarchical time rollup (continuous-aggregate pattern):
    daily aggregates computed FROM the hourly tier — counts of
    counts, sums of sums — never from raw events. At 100 TB the
    hourly tier is the materialized incremental layer; this query is
    the re-rollup that stays cheap forever."""
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    return hourly.groupBy(
        F.date_trunc("day", "h").alias("day"), "event_type"
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(F.sum("sv"), 2).alias("sum_value"),
        F.count("*").cast("long").alias("n_hours"),
    )
