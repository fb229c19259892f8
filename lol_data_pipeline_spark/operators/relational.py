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


_SALTED_PHASE1 = {
    "sum": F.sum,
    # count(col) — NULL-skipping, like the plain agg it replaces;
    # partial counts compose by summation either way
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_SALTED_PHASE2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    exprs: list[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: phase 1 aggregates on
    ``keys + salt`` so ONE hot group key spreads over ``salt``
    reducers; phase 2 merges the algebraic partials on ``keys``
    alone (a tiny shuffle: salt rows per group).

    ``exprs`` = [(column, fn, alias)] with fn in sum/count/min/max
    (the algebraic set — avg is sum/count at the call site).

    When this matters at 100 TB: hash aggregation already does
    map-side partial combine, which absorbs most skew for these
    functions. The explicit two-phase form is for the cases partials
    can't save: aggregation after an exchange that is ALREADY keyed
    (e.g. post-join), low-cardinality keys where a handful of
    reducers own everything (5 event types on 1000 executors), and as
    the template for non-combinable aggregates (collect/exact
    distinct), where phase 1 must physically split the key.
    """
    for _, fn, _ in exprs:
        if fn not in _SALTED_PHASE1:
            raise ValueError(f"salted_agg supports {sorted(_SALTED_PHASE1)}, got {fn!r}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[_SALTED_PHASE1[fn](col).alias(alias) for col, fn, alias in exprs]
    )
    return p1.groupBy(*keys).agg(
        *[_SALTED_PHASE2[fn](alias).alias(alias) for _, fn, alias in exprs]
    )
