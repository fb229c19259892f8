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


def global_topk_ranked(
    df: DataFrame, order: list[tuple[str, bool]], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Global top-k with a row_number-style rank column, WITHOUT an
    unpartitioned window.

    ``order`` is [(column, descending)]; the LAST column must be a
    unique non-null tiebreaker so the order is total (rank then
    equals row_number deterministically). Other order columns MAY be
    null: comparisons follow Spark's default null ordering (asc =
    NULLS FIRST, desc = NULLS LAST) via explicit null-aware
    predicates — an oracle ranking nullable columns must spell the
    same NULLS FIRST/LAST (engines disagree on the default).

    Why not ``row_number() OVER (ORDER BY ...)``: an unpartitioned
    window moves the ENTIRE input to one partition before ranking —
    a single-task sort that is the classic 100 TB scale-killer when
    the input is data-sized (BM25 candidates for a common term, the
    full n-gram vocabulary). Instead:

    - ``orderBy().limit(k)`` compiles to TakeOrderedAndProject:
      every partition keeps a k-row heap, the driver merges P heaps
      of k rows — no global sort, no single-partition shuffle.
    - the rank of each survivor = 1 + how many of the OTHER k-1
      survivors sort strictly ahead of it — a k×k broadcast
      comparison (k is small by contract), still no window.

    The k-row result is persisted so the top-k subtree runs once,
    not once per self-join side.
    """
    from lol_data_pipeline_spark.caching import tracked_persist

    sort_cols = [F.col(n).desc() if d else F.col(n).asc() for n, d in order]
    topk = tracked_persist(df.orderBy(*sort_cols).limit(k))

    # "peer sorts strictly ahead" as a lexicographic predicate over
    # the order columns (peer side renamed __p_*). Null-aware so a
    # NULL in a non-last order column ranks exactly where the sort
    # put it (desc → NULLS LAST, asc → NULLS FIRST), instead of
    # vacuously matching no peers and stealing rank 1.
    def ahead(idx: int) -> Column:
        name, desc = order[idx]
        p, r = F.col(f"__p_{name}"), F.col(name)
        if desc:  # NULLS LAST: non-null beats null
            strict = (p.isNotNull() & r.isNull()) | (p > r)
        else:  # NULLS FIRST: null beats non-null
            strict = (p.isNull() & r.isNotNull()) | (p < r)
        if idx + 1 == len(order):
            return strict
        return strict | (p.eqNullSafe(r) & ahead(idx + 1))

    peers = topk.select(
        F.lit(1).alias("__p_one"),
        *[F.col(n).alias(f"__p_{n}") for n, _ in order],
    )
    out_cols = topk.columns
    return (
        topk.join(F.broadcast(peers), ahead(0), "left")
        .groupBy(*out_cols)
        .agg((F.count("__p_one") + 1).cast("long").alias(rank_col))
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
    # count(col) — NULL-skipping, like SQL count(col); use
    # "count_star" for SQL count(*) row-count semantics (the column
    # argument is ignored there). Partial counts compose by summation
    # either way.
    "count": F.count,
    "count_star": lambda _col: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_SALTED_PHASE2 = {"sum": F.sum, "count": F.sum, "count_star": F.sum, "min": F.min, "max": F.max}


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

    ``exprs`` = [(column, fn, alias)] with fn in
    sum/count/count_star/min/max (the algebraic set — avg is
    sum/count at the call site).

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
