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
from pyspark.sql import types as T


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

    All payload columns travel as ONE struct through a single
    ``last(ignorenulls=True)``: the struct of a right row is non-null
    even when individual payload fields are null, so the latest right
    row is selected atomically — per-column carries could silently
    mix payload values from different right rows when a field is
    null. One window function regardless of payload width, too.

    NULL timestamps: NULL-``right_ts`` rows are dropped (a reference
    row at "unknown time" matches nothing) — without the filter, ASC
    NULLS FIRST ordering would sort such a row before every real row
    and carry its payload onto left rows that precede any real
    reference row. A left row with NULL ``left_ts`` sorts first and
    can only pick up such phantom payloads, so with the filter it
    gets NULL payload, symmetric with :func:`asof_join_forward`.
    """
    lcols = left.columns
    ptype = T.StructType([T.StructField(c, right.schema[c].dataType) for c in payload])
    ltagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(ptype).alias("__p"),
    )
    rtagged = right.filter(F.col(right_ts).isNotNull()).select(
        # left's non-key columns are NULL on reference rows
        *[
            (F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tie"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__p"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ltagged.unionByName(rtagged).select(
        *lcols,
        F.col("__side"),
        F.last("__p", ignorenulls=True).over(w).alias("__pc"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(*lcols, *[F.col("__pc").getField(c).alias(f"asof_{c}") for c in payload])
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach to each left row the payload of the EARLIEST right row
    with the same ``on`` key and ``right_ts >= left_ts`` (NULL when
    none) — the forward twin of :func:`asof_join_backward`, i.e. the
    "next event at-or-after" / time-to-convert join.

    Same union-tag single-shuffle construction, with the window
    ordering REVERSED: descending timestamp, right rows before left
    rows at equal timestamps (so the match is inclusive), and the
    tiebreak DESCENDING so that among equal-timestamp right rows the
    MINIMUM tiebreak value is the one ``last(ignorenulls)`` carries —
    the deterministic mirror of backward's max-wins rule. An oracle
    must pre-dedupe equal-timestamp right rows to min-tiebreak to
    match (DuckDB's ASOF JOIN leaves duplicate timestamps undefined).

    NULL timestamps: the window orders DESC **NULLS FIRST** so a left
    row with NULL ``left_ts`` sorts before every right row and gets a
    NULL payload (a bare DESC would be NULLS LAST, silently matching
    it to the key's EARLIEST right row); NULL-``right_ts`` rows are
    dropped — a reference row at "unknown time" matches nothing.
    """
    lcols = left.columns
    ptype = T.StructType([T.StructField(c, right.schema[c].dataType) for c in payload])
    ltagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(ptype).alias("__p"),
    )
    rtagged = right.filter(F.col(right_ts).isNotNull()).select(
        *[
            (F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tie"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__p"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").desc_nulls_first(),
            F.col("__side").asc(),
            F.col("__tie").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ltagged.unionByName(rtagged).select(
        *lcols,
        F.col("__side"),
        F.last("__p", ignorenulls=True).over(w).alias("__pc"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(*lcols, *[F.col("__pc").getField(c).alias(f"asof_{c}") for c in payload])
    )
