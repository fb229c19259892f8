"""General relational helpers the reference lacks (SURVEY §2.5-2.6,
build-plan M2): top-k per group, salted joins for skew.

Plain joins/aggs/windows/set-ops are used directly from the
DataFrame API in plans/queries.py; only the composite patterns live
here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number window — one shuffle on
    the group key; include a unique tiebreak column in ``order`` for
    determinism."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant join: salt the big side's key into ``salt``
    sub-keys and explode the small side across all salts, so one hot
    key spreads over ``salt`` reducers. AQE's skew-join handles most
    cases automatically; this is the explicit fallback for
    pathological keys (e.g. null-heavy foreign keys at 100 TB)."""
    b = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")))
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
