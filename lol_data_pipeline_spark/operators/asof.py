"""Scalable as-of join (point-in-time join) — no pandas, one shuffle.

Spark has no native ASOF JOIN. The usual pandas route
(``applyInPandas`` + ``pd.merge_asof`` per key) materializes whole
key groups in Python memory — it dies on skewed keys at 100 TB. This
implementation is the union-tag / last-value trick instead:

1. UNION the left (probe) and right (reference) rows with a side tag;
   right rows carry their payload columns, left rows carry NULLs.
2. One window per key, ordered by (ts, side, tiebreak):
   ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
   recent right payload forward onto each left row.
3. Keep only the left rows.

Cost: exactly ONE shuffle (hash by key) + per-partition sort — same
cost class as a sort-merge join, fully codegen'd, AQE-skew-
splittable, and it never builds a per-key in-memory group. Right
rows sort before left rows at equal timestamps, so the match is
inclusive, i.e. ASOF JOIN ... ON l.ts >= r.ts semantics (the DuckDB
oracle's definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach to each left row the payload of the latest right row
    with the same ``on`` key and ``right_ts <= left_ts`` (NULL
    payload when no such row). Payload columns come back prefixed
    ``asof_``.

    ``tiebreak`` (a right-side numeric column, e.g. an event id)
    makes equal-timestamp matches deterministic: max wins.
    """
    lcols = left.columns
    ltagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
            for c in payload
        ],
    )
    rtagged = right.select(
        # left's non-key columns are NULL on reference rows
        *[
            (F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tie"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ltagged.unionByName(rtagged).select(
        *lcols,
        F.col("__side"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
