"""Bucketed tables: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders)
is the exchange of both sides by the join key. Bucketing
pre-partitions the stored table by a hash of the key into a fixed
number of buckets, so a join between two tables bucketed the same
way is planned as a sort-merge join with NO Exchange on either side
— the shuffle is paid once at write time and amortized over every
subsequent join/agg on that key.

Spark specifics this module encodes:
- bucketing only applies through the session catalog
  (``saveAsTable``), not plain ``.parquet(path)`` writes;
- both sides must have the same bucket count (or a divisor with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` at write time additionally removes the Sort below the
  merge join;
- a groupBy on the bucket key likewise skips its exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered)
    catalog table. One shuffle now, zero shuffles for every future
    join/agg on ``bucket_cols``."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cobucket_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables. With matching bucket
    specs the physical plan is a sort-merge join whose children read
    bucketed file splits directly — no Exchange (verified by
    tests/test_plan_hygiene.py::test_bucketed_join_has_no_exchange).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
