"""Z-order (Morton) clustering key — multi-column data skipping.

Range clustering on ONE column (io.write_clustered) makes that
column's row-group stats selective but leaves every other column's
stats wide. Interleaving the bits of two (or more) normalized
columns into a single Morton key and range-clustering on THAT gives
every participating column locality: a point/range predicate on any
one of them intersects only ~sqrt-fraction of the row groups
(the classic lakehouse OPTIMIZE ZORDER BY layout, here as plain
Spark expressions — no engine extension needed).

Everything is a pure JVM-side Column expression: per-column min/max
arrive via a 1-row scalar broadcast (the same pattern as the BM25 /
Q11 global scalars), normalization is fixed-point integer math, and
the bit interleave unrolls into shift/or terms that whole-stage
codegen fuses into one projection. No UDFs, no driver data.

Reference parity: the reference repo has no storage-layout surface —
this is north-star scale tooling (SURVEY §2.8 sinks family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY_COL = "__zkey"


def _normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` affinely from [lo, hi] onto [0, 2^bits − 1] as a
    long. Degenerate ranges (hi == lo) map to 0 — every row lands in
    the same cell, which is correct: a constant column contributes
    nothing to ordering."""
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(
        span > 0,
        ((col.cast("double") - lo.cast("double")) / span) * F.lit((1 << bits) - 1),
    ).otherwise(F.lit(0.0))
    return F.floor(scaled).cast("long")


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``cols`` (already normalized to ``bits``-bit
    longs): output bit (i * n + j) takes bit i of column j, so the
    key cycles through the columns' bits from least significant up.
    Unrolls to n·bits shift/or terms — a single codegen'd projection."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = ZKEY_COL
) -> DataFrame:
    """Append a Morton key over ``cols`` (numeric or timestamp).

    Column mins/maxes ride ONE broadcast row — at any scale the
    normalization is a metadata-sized join, and the interleave is a
    pure per-row projection. ``bits`` per column × len(cols) must fit
    a long: 2 cols × 16 bits (default) uses 32 key bits.
    """
    if not cols:
        raise ValueError("with_zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {bits * len(cols)} key bits; "
            "must fit a signed long (<= 63)"
        )

    def as_num(name: str) -> Column:
        c = F.col(name)
        dt = df.schema[name].dataType.simpleString()
        return F.unix_timestamp(c).cast("double") if dt.startswith("timestamp") else c

    stats = df.agg(
        *[m(as_num(c)).alias(f"__{tag}_{c}") for c in cols for tag, m in (("lo", F.min), ("hi", F.max))]
    )
    joined = df.crossJoin(F.broadcast(stats))
    normed = [
        _normalize_to_bits(
            as_num(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    ]
    key = _interleave(normed, bits)
    return joined.withColumn(out_col, key).drop(
        *[f"__{tag}_{c}" for c in cols for tag in ("lo", "hi")]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Truncate-and-load range-clustered on a Morton key over
    ``zorder_by``: every listed column gets selective row-group
    min/max stats, so single-column predicates on ANY of them skip
    most row groups (tests/test_data_skipping.py measures it). The
    key column itself is dropped from the written table — it is a
    layout device, not data."""
    from lol_data_pipeline_spark.io import write_overwrite

    keyed = with_zorder_key(df, zorder_by, bits=bits)
    parts = [num_files] if num_files else []
    clustered = (
        keyed.repartitionByRange(*parts, ZKEY_COL)
        .sortWithinPartitions(ZKEY_COL)
        .drop(ZKEY_COL)
    )
    write_overwrite(clustered, path, partition_by=partition_by)
