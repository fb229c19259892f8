"""Scalar function catalog — native Column expressions only.

Re-expresses every plain-Python scalar helper of the reference
(reference src/api/utils/utils.py:25-107) as JVM-side, codegen-able
Column expressions; none of these are UDFs, so they stay inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic 60-bit hash shared with the DuckDB oracle.
#
# Both engines expose md5() with identical output, so
# `conv(substr(md5(s),1,15),16,10)` is an engine-portable,
# deterministic 60-bit integer hash (fits signed int64). Used as the
# hash primitive for minhash/simhash so oracle SQL can reproduce the
# exact same signatures. xxhash64 would be faster but is
# Spark-private; at 100 TB you would swap `F.xxhash64` in here and
# drop oracle parity.
# ---------------------------------------------------------------------------


def md5_long(col: Column | str, seed: int = 0) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    ``seed`` derives independent hash families (minhash needs k
    independent functions): h_i(x) = md5(i || ':' || x).
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# --- temporal (reference utils.py:84-91: epoch-ms → '%Y-%m-%d') -----------


def epoch_ms_to_date_str(col: Column | str) -> Column:
    """epoch-milliseconds → 'yyyy-MM-dd' string (reference P3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.timestamp_millis(c.cast("long")), "yyyy-MM-dd")


def to_epoch_ms(col: Column | str) -> Column:
    """timestamp → epoch milliseconds (inverse of the above;
    floor-division of microseconds, matching DuckDB's epoch_ms)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.unix_micros(c) / F.lit(1000)).cast("long")


# --- conditional unit tagging (reference utils.py:109-147) ----------------


def duration_units(end_ts: Column | str) -> Column:
    """'s' when the end timestamp is present else 'ms'.

    The reference encodes this s/ms duality with try/except KeyError
    (utils.py:130); here it is data, not control flow.
    """
    c = F.col(end_ts) if isinstance(end_ts, str) else end_ts
    return F.when(c.isNotNull(), F.lit("s")).otherwise(F.lit("ms"))


# --- literal map lookup (reference utils.py:63-76) ------------------------

QUEUE_IDS = {"draft": 400, "blind": 430, "aram": 450}


def map_lookup(col: Column | str, mapping: dict[str, int], default=None) -> Column:
    """Literal-map lookup as a CASE WHEN chain (broadcast-free,
    constant-folded by Catalyst). Reference P9 generalized."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(default)
    for k, v in reversed(list(mapping.items())):
        expr = F.when(c == F.lit(k), F.lit(v)).otherwise(expr)
    return expr


def queue_id(col: Column | str) -> Column:
    return map_lookup(col, QUEUE_IDS)


# --- array search (reference utils.py:93-107, 149-150) --------------------


def array_find_pos(arr: Column | str, value: Column) -> Column:
    """1-based position of ``value`` in array, NULL when absent.

    The reference's linear scan returns the *last* match
    (utils.py:104-106), but match participants are unique so
    first-match is equivalent; we use first-match (native
    array_position) and NULL (not 0) for "absent".
    """
    a = F.col(arr) if isinstance(arr, str) else arr
    pos = F.array_position(a, value)
    return F.when(pos == 0, F.lit(None)).otherwise(pos)


def element_at_pos(arr: Column | str, pos: Column) -> Column:
    """Null-safe element extraction by computed (1-based) index."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.when(pos.isNull(), F.lit(None)).otherwise(F.try_element_at(a, pos))


def snap(col: Column | str, scale: int = 6) -> Column:
    """Tie-safe n-decimal snap (Column twin of plans.queries.snap_sql):
    ``floor(x·10ⁿ + 0.5) / 10ⁿ``. Use instead of round() whenever the
    value is RATIONAL (exact-integer numerator / integer denominator)
    — such values hit EXACT .5 ties at the snap scale, where Spark
    (half-up) and DuckDB (half-even) break double round() apart.

    The returned Column is unnamed — callers alias it. Note the
    floor(+0.5) rule rounds NEGATIVE .5 ties toward +inf (-1.5 → -1),
    unlike round()'s away-from-zero; identical to snap_sql on both
    engines, but mind it if snapping signed values."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10 ** scale
    return F.floor(c * m + F.lit(0.5)).cast("long") / F.lit(float(m))
