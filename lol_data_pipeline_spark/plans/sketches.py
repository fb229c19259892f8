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


# ---------------------------------------------------------------------------
# HyperLogLog with deterministic md5 registers (p=8, m=256).
#
# Spark's approx_count_distinct is HLL++ with an opaque hash — not
# reproducible in another engine. This is the CLASSIC HLL estimator
# (Flajolet et al.) over the engine-portable 60-bit md5 hash:
#   idx = h & 255          (8-bit register index)
#   w   = h >> 8           (remaining 52 bits)
#   rho = leading-zero count of w within 52 bits, + 1   (1..53)
#   M[idx] = max(rho);  E = alpha·m² / Σ 2^-M[j]
# The harmonic sum is computed EXACTLY as an integer:
#   Σ 2^-M[j] = S / 2^53  with  S = Σ 2^(53-M[j])  (empty register →
#   2^53), so the only float ops are one constant multiply and one
#   divide — bit-equal across engines. rho is a generated 52-branch
#   integer CASE chain (no float log2).
#
# Scale: one hash-aggregate to (group, idx) register maxima —
# map-side partials shrink each task's contribution to ≤ m rows per
# group — then a tiny m-row re-aggregate. Mergeable by construction
# (max of maxes), the property that lets 1000 executors sketch 100 TB
# and union the result in milliseconds.
# ---------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256 registers
_HLL_WBITS = 60 - _HLL_P  # 52 bits hashed into each register
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_C = _HLL_ALPHA * float(_HLL_M) * float(_HLL_M) * float(1 << 53)


def _rho_case_sql(w: str) -> str:
    whens = " ".join(
        f"WHEN {w} >= {1 << (_HLL_WBITS - k)} THEN {k}" for k in range(1, _HLL_WBITS + 1)
    )
    return f"CASE {whens} ELSE {_HLL_WBITS + 1} END"


def _rho_case_col(w):
    expr = F.lit(_HLL_WBITS + 1)
    for k in range(_HLL_WBITS, 0, -1):
        expr = F.when(w >= (1 << (_HLL_WBITS - k)), F.lit(k)).otherwise(expr)
    return expr


@query(
    "sketch_hll_distinct",
    sql=f"""
    WITH h AS (
      SELECT l_returnflag, l_orderkey,
             {SQL_MD5_LONG.format(expr="CAST(l_orderkey AS VARCHAR)")} AS h
      FROM lineitem
    ), regs AS (
      SELECT l_returnflag, h & {_HLL_M - 1} AS idx,
             max({_rho_case_sql(f"(h >> {_HLL_P})")}) AS m_j
      FROM h GROUP BY 1, 2
    ), agg AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n_used,
             sum((CAST(1 AS BIGINT) << (53 - m_j)))
               + ({_HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 53) AS s
      FROM regs GROUP BY 1
    ), ex AS (
      SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem GROUP BY 1
    )
    SELECT a.l_returnflag, e.exact_distinct, a.n_used,
           CAST(a.s AS BIGINT) AS harmonic_s,
           round({_HLL_C!r} / a.s, 2) AS hll_estimate
    FROM agg a JOIN ex e ON e.l_returnflag = a.l_returnflag
    """,
)
def sketch_hll_distinct(spark, sf_dir):
    """Deterministic HyperLogLog distinct estimate per l_returnflag
    vs the exact count. Register maxima come out of one map-side-
    combinable hash aggregate; the harmonic mean is exact integer
    arithmetic rescaled by one double divide, so the DuckDB oracle
    reproduces the estimate bit-for-bit — the reproducibility that
    approx_count_distinct's opaque HLL++ hash can't give."""
    li = T(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        "l_orderkey",
        md5_long(F.col("l_orderkey").cast("string")).alias("h"),
    )
    regs = (
        h.select(
            "l_returnflag",
            F.col("h").bitwiseAND(_HLL_M - 1).alias("idx"),
            _rho_case_col(F.shiftright("h", _HLL_P)).alias("rho"),
        )
        .groupBy("l_returnflag", "idx")
        .agg(F.max("rho").alias("m_j"))
    )
    agg = regs.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_used"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - m_j)"))
            + (_HLL_M - F.count("*")) * F.lit(1 << 53).cast("long")
        ).cast("long").alias("harmonic_s"),
    )
    ex = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_distinct")
    )
    return (
        agg.join(ex, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_distinct",
            "n_used",
            "harmonic_s",
            F.round(F.lit(_HLL_C) / F.col("harmonic_s"), 2).alias("hll_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (d=4 hash rows × w=512 counters).
#
# The sketch is a d×w grid of ADDITIVE counters — each key increments
# one counter per hash row, an estimate reads back the min of its d
# counters (over-count only, never under). Sums make it mergeable:
# every executor sketches its partitions independently and the grids
# add elementwise, so 100 TB collapses to d·w longs per node before a
# single tiny reduce. Hash row j uses the engine-portable
# md5_long(key, seed=j+1), so DuckDB rebuilds the identical grid.
# ---------------------------------------------------------------------------

_CM_D = 4
_CM_W = 512


def _sql_cm_bucket(j: str, key: str) -> str:
    h = SQL_MD5_LONG.format(expr=f"concat(CAST({j} + 1 AS VARCHAR), ':', {key})")
    return f"({h} % {_CM_W})"


@query(
    "sketch_countmin_freq",
    sql=f"""
    WITH rows_ AS (
      SELECT l_suppkey, jj.j,
             {_sql_cm_bucket("jj.j", "CAST(l_suppkey AS VARCHAR)")} AS b
      FROM lineitem, (VALUES (0), (1), (2), (3)) jj(j)
    ), grid AS (
      SELECT j, b, CAST(count(*) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2
    ), probe AS (
      SELECT DISTINCT l_suppkey AS k FROM lineitem WHERE l_suppkey <= 10
    ), probed AS (
      SELECT p.k, jj.j,
             {_sql_cm_bucket("jj.j", "CAST(p.k AS VARCHAR)")} AS b
      FROM probe p, (VALUES (0), (1), (2), (3)) jj(j)
    ), est AS (
      SELECT pr.k, min(g.c) AS cm_estimate
      FROM probed pr JOIN grid g ON g.j = pr.j AND g.b = pr.b
      GROUP BY 1
    ), exact AS (
      SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS exact_n
      FROM lineitem WHERE l_suppkey <= 10 GROUP BY 1
    )
    SELECT CAST(e.k AS BIGINT) AS l_suppkey, x.exact_n, e.cm_estimate
    FROM est e JOIN exact x ON x.k = e.k
    """,
)
def sketch_countmin_freq(spark, sf_dir):
    """Count-Min frequency estimates for suppkeys 1-10 vs their exact
    counts (estimate ≥ exact always; equality when no bucket
    collisions). The d·w=2048-cell grid is built in ONE hash-aggregate
    over an explode(d) of the fact table and broadcast to the probe
    join — the probe side never shuffles."""
    li = T(spark, sf_dir, "lineitem")
    key = F.col("l_suppkey").cast("string")
    hashes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(md5_long(key, seed=j + 1), F.lit(_CM_W)).alias("b"),
            )
            for j in range(_CM_D)
        ]
    )
    grid = (
        li.select(F.explode(hashes).alias("jb"))
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    probe = li.filter(F.col("l_suppkey") <= 10).select("l_suppkey").distinct()
    pk = F.col("l_suppkey").cast("string")
    probed = probe.select(
        "l_suppkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(md5_long(pk, seed=j + 1), F.lit(_CM_W)).alias("b"),
                    )
                    for j in range(_CM_D)
                ]
            )
        ).alias("jb"),
    ).select("l_suppkey", "jb.j", "jb.b")
    est = (
        probed.join(F.broadcast(grid), ["j", "b"])
        .groupBy("l_suppkey")
        .agg(F.min("c").alias("cm_estimate"))
    )
    exact = (
        li.filter(F.col("l_suppkey") <= 10)
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("exact_n"))
    )
    return est.join(exact, "l_suppkey").select(
        F.col("l_suppkey").cast("long").alias("l_suppkey"), "exact_n", "cm_estimate"
    )


# ---------------------------------------------------------------------------
# Bloom filter membership (m=4096 bits, k=3 hashes).
#
# The member set's bit positions are a distinct-set of ≤ m ints —
# built with one explode(k)+distinct, broadcast to the probe side
# (the filter is KBs regardless of member-set size, the whole point
# of a Bloom filter). Probe key "maybe present" ⇔ all k of its bits
# are set; guaranteed no false negatives, false positives only on
# full k-bit collision. Mergeable: bit-set union.
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 3


def _sql_bloom_bit(j: str, key: str) -> str:
    h = SQL_MD5_LONG.format(expr=f"concat('b', CAST({j} AS VARCHAR), ':', {key})")
    return f"({h} % {_BLOOM_M})"


def _bloom_bits(key_col):
    """The k bloom bit positions of a key — ONE definition shared by
    every build and probe site (sketch_bloom_membership,
    rel_bloom_prejoin, and their tests): a build/probe hash-family
    mismatch would silently break the no-false-negative contract.

    md5-based because sketch_bloom_membership's ORACLE must reproduce
    the bit positions in DuckDB. Operators whose bloom is purely
    physical (the oracle never sees the bits) should use
    _bloom_bits_fast instead."""
    return [
        F.pmod(md5_long(F.concat(F.lit(f"b{j}:"), key_col)), F.lit(_BLOOM_M))
        for j in range(_BLOOM_K)
    ]


def _bloom_bits_fast(key_col):
    """xxhash64 bloom bit positions — the JVM-cheap hash family for
    physical-only blooms (rel_bloom_prejoin: the filter's bits never
    reach the oracle, only the join's final answer does, so engine
    portability buys nothing and md5's per-row cost is pure waste —
    switching cut the fact-side probe ~5× in bench)."""
    return [
        F.pmod(F.xxhash64(F.lit(j), key_col), F.lit(_BLOOM_M))
        for j in range(_BLOOM_K)
    ]


@query(
    "sketch_bloom_membership",
    sql=f"""
    WITH bits AS (
      SELECT DISTINCT {_sql_bloom_bit("jj.j", "CAST(o_custkey AS VARCHAR)")} AS bit
      FROM orders, (VALUES (0), (1), (2)) jj(j)
    ), probe AS (
      SELECT c_custkey FROM customer WHERE c_custkey <= 300
    ), probed AS (
      SELECT p.c_custkey, jj.j,
             {_sql_bloom_bit("jj.j", "CAST(p.c_custkey AS VARCHAR)")} AS bit
      FROM probe p, (VALUES (0), (1), (2)) jj(j)
    ), hits AS (
      SELECT pr.c_custkey,
             count(b.bit) = {_BLOOM_K} AS bloom_maybe
      FROM probed pr LEFT JOIN bits b ON b.bit = pr.bit
      GROUP BY 1
    ), truth AS (
      SELECT p.c_custkey,
             EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey)
               AS actually_present
      FROM probe p
    )
    SELECT h.c_custkey, h.bloom_maybe, t.actually_present
    FROM hits h JOIN truth t ON t.c_custkey = h.c_custkey
    """,
)
def sketch_bloom_membership(spark, sf_dir):
    """Bloom-filter membership of customer keys 1-300 against the
    set of custkeys that placed orders, alongside ground truth (a
    semi-join): bloom_maybe is true for every actual member (no
    false negatives) plus any k-fold hash collisions. The bit set is
    built fact-side and broadcast; probes never shuffle."""
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    mk = F.col("o_custkey").cast("string")
    bits = (
        orders.select(
            F.explode(F.array(*_bloom_bits(mk))).alias("bit")
        )
        .distinct()
    )
    probe = cust.filter(F.col("c_custkey") <= 300).select("c_custkey")
    pk = F.col("c_custkey").cast("string")
    probed = probe.select(
        "c_custkey",
        F.explode(F.array(*_bloom_bits(pk))).alias("bit"),
    )
    hits = (
        probed.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("c_custkey")
        .agg((F.count("*") == _BLOOM_K).alias("bloom_maybe"))
    )
    # Probes missing every bit vanish from the semi-join — restore
    # them as bloom_maybe = false with a left join back to the probe set.
    truth = probe.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    ).withColumn("actually_present", F.lit(True))
    return (
        probe.join(hits, "c_custkey", "left")
        .join(truth.select("c_custkey", "actually_present"), "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("bloom_maybe", F.lit(False)).alias("bloom_maybe"),
            F.coalesce("actually_present", F.lit(False)).alias("actually_present"),
        )
    )


# ---------------------------------------------------------------------------
# KMV set operations: union / intersection / Jaccard estimates from
# MERGED sketches — the reason KMV (and theta sketches generally)
# exist: two tables sketched independently (64 longs each, anywhere
# in the cluster) combine into cross-set cardinality estimates
# without ever co-shuffling the raw keys.
# ---------------------------------------------------------------------------


def _sql_kmv_set(expr_from: str) -> str:
    """k smallest distinct 60-bit hashes of a key set."""
    return f"""(
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT {SQL_MD5_LONG.format(expr="CAST(k AS VARCHAR)")} AS h
      FROM ({expr_from})
    ) QUALIFY rn <= {_K}
  )
)"""


@query(
    "sketch_kmv_setops",
    sql=f"""
    WITH ka AS {_sql_kmv_set("SELECT o_custkey AS k FROM orders")},
    kb AS {_sql_kmv_set("SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000")},
    merged AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb))
      QUALIFY rn <= {_K}
    ),
    stats AS (
      SELECT max(CASE WHEN rn = {_K} THEN m.h END) AS kth,
             CAST(count(*) AS BIGINT) AS n_merged,
             CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                           THEN 1 ELSE 0 END) AS DOUBLE) AS n_both
      FROM merged m
      LEFT JOIN ka a ON a.h = m.h
      LEFT JOIN kb b ON b.h = m.h
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_union FROM (
        SELECT o_custkey AS k FROM orders
        UNION
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
      )
    )
    SELECT e.exact_union,
           round(CASE WHEN s.n_merged < {_K} THEN CAST(s.n_merged AS DOUBLE)
                 ELSE ({_K} - 1) / (s.kth / {_HASH_SPACE}) END, 4) AS union_est,
           round(s.n_both / s.n_merged, 4) AS jaccard_est,
           round((s.n_both / s.n_merged)
                 * (CASE WHEN s.n_merged < {_K} THEN CAST(s.n_merged AS DOUBLE)
                    ELSE ({_K} - 1) / (s.kth / {_HASH_SPACE}) END), 4) AS intersect_est
    FROM stats s CROSS JOIN exact e
    """,
)
def sketch_kmv_setops(spark, sf_dir):
    """Mergeable-sketch set algebra: KMV sketches of {custkeys with
    orders} and {custkeys with acctbal > 5000}, merged into union /
    intersection / Jaccard estimates, next to the exact union. The
    raw key sets never meet — only two 64-row sketches do (the merge
    is 'k smallest of the union of min-sets'; ρ = fraction of merged
    minima present in both sketches). Deterministic order statistics
    ⇒ the oracle reproduces every estimate bit-for-bit."""
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")

    def kmv(df, key):
        return (
            df.select(md5_long(F.col(key).cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(_K)
        )

    ka = kmv(orders.select("o_custkey"), "o_custkey")
    kb = kmv(cust.filter(F.col("c_acctbal") > 5000).select("c_custkey"), "c_custkey")
    merged = (
        ka.unionAll(kb)
        .distinct()
        .orderBy("h")
        .limit(_K)
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
    )
    stats = (
        merged.join(ka.withColumnRenamed("h", "ha"), merged.h == F.col("ha"), "left")
        .join(kb.withColumnRenamed("h", "hb"), merged.h == F.col("hb"), "left")
        .agg(
            F.max(F.when(F.col("rn") == _K, F.col("h"))).alias("kth"),
            F.count("*").cast("long").alias("n_merged"),
            F.sum(
                F.when(F.col("ha").isNotNull() & F.col("hb").isNotNull(), 1).otherwise(0)
            ).cast("double").alias("n_both"),
        )
    )
    exact = (
        orders.select(F.col("o_custkey").alias("k"))
        .union(cust.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k")))
        .distinct()
        .agg(F.count("*").cast("long").alias("exact_union"))
    )
    union_est = F.when(
        F.col("n_merged") < _K, F.col("n_merged").cast("double")
    ).otherwise((_K - 1) / (F.col("kth") / F.lit(_HASH_SPACE)))
    rho = F.col("n_both") / F.col("n_merged")
    return stats.crossJoin(F.broadcast(exact)).select(
        "exact_union",
        F.round(union_est, 4).alias("union_est"),
        F.round(rho, 4).alias("jaccard_est"),
        F.round(rho * union_est, 4).alias("intersect_est"),
    )


@query(
    "sketch_quantile_hist",
    sql="""
    WITH p AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS tot FROM events),
    b AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(CAST(floor((value - lo) / ((hi - lo) / 64.0)) AS INTEGER), 63)
             END AS bin,
             count(*) AS n
      FROM events, p GROUP BY 1
    ),
    c AS (
      SELECT bin, sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum FROM b
    )
    SELECT q,
           CAST(min(bin) AS INTEGER) AS qbin,
           round(min(lo + (bin + 1) * ((hi - lo) / 64.0)), 6) AS est_value
    FROM (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q) qs, c, p
    WHERE cum >= q * tot
    GROUP BY q
    """,
)
def sketch_quantile_hist(spark, sf_dir):
    """Equi-width histogram quantile sketch (64 bins): estimate for
    quantile q = upper edge of the first bin whose cumulative count
    reaches q·N, error bounded by one bin width.

    Why not approx_percentile: Spark's t-digest is implementation-
    specific (no oracle can reproduce it); the histogram is fully
    deterministic, and — the property that matters at 100 TB —
    MERGEABLE: per-partition (and per-day, per-shard) histograms
    combine by adding bin counts, so the sketch state is 64 longs no
    matter the data size. The cumulative window runs over 64 rows,
    never over data."""
    ev = T(spark, sf_dir, "events").select("value")
    p = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("tot"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(64.0)
    # hi == lo (all values equal) would make width 0 and the bin
    # expression NaN; the degenerate answer is bin 0 / estimate lo
    # (width 0 collapses every bin edge onto lo), mirrored in the
    # oracle's CASE
    binned = ev.crossJoin(F.broadcast(p)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
                F.lit(63),
            )
        )
        .alias("bin"),
        "lo",
        "hi",
        "tot",
    )
    b = binned.groupBy("bin", "lo", "hi", "tot").agg(F.count("*").alias("n"))
    c = b.withColumn(
        "cum",
        F.sum("n").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q")
    )
    return (
        qs.crossJoin(c)
        .filter(F.col("cum") >= F.col("q") * F.col("tot"))
        .groupBy("q")
        .agg(
            F.min("bin").cast("int").alias("qbin"),
            F.round(
                F.min(F.col("lo") + (F.col("bin") + 1) * width), 6
            ).alias("est_value"),
        )
    )


@query(
    "rel_bloom_prejoin",
    sql="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def rel_bloom_prejoin(spark, sf_dir):
    """Runtime-filter join pre-reduction: before shuffling the fact
    for a selective dim join, probe each fact row against a BLOOM
    BITMASK of the dim's join keys and drop non-matching rows at scan
    time. The join itself then removes the bloom's false positives,
    so the result is byte-identical to the plain join — the oracle IS
    the plain join, which is the whole point (a physical-only
    optimization must never change answers).

    The production shape, not the semi-join model
    (sketch_bloom_membership probes via an exploded bit join — fine
    for a membership REPORT, wrong for a pre-filter because it costs
    a shuffle): here the 4096-bit set packs into a ≤64-entry
    word→mask map built by one tiny aggregate over the dim keys,
    broadcast, and probed with a PURE PROJECTION (3 hash → bit-test
    expressions per row — whole-stage codegen, zero extra shuffle).
    At 100 TB this is the manual form of Spark's own runtime bloom
    filter (spark.sql.optimizer.runtime.bloomFilter), written out so
    the no-false-negative contract is testable: every fact row the
    real join keeps MUST pass the pre-filter
    (tests/test_round5b_ops.py pins it)."""
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dk = F.col("o_orderkey").cast("string")
    words = (
        orders.select(F.explode(F.array(*_bloom_bits_fast(dk))).alias("bit"))
        .distinct()
        .select(
            (F.col("bit") / 64).cast("int").alias("w"),
            F.expr("CAST(shiftleft(1L, CAST(bit % 64 AS INT)) AS BIGINT)").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    bloom = words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("mp")
    )
    fk = F.col("l_orderkey").cast("string")
    probes = _bloom_bits_fast(fk)
    pre = li.join(F.broadcast(bloom))
    cond = F.lit(True)
    for j, bit in enumerate(probes):
        pre = pre.withColumn(f"__b{j}", bit)
        word = (F.col(f"__b{j}") / 64).cast("int")
        mask = F.expr(f"CAST(shiftleft(1L, CAST(__b{j} % 64 AS INT)) AS BIGINT)")
        cond = cond & (
            (F.coalesce(F.try_element_at(F.col("mp"), word), F.lit(0)) .bitwiseAND(mask)) != 0
        )
    filtered = pre.filter(cond).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        filtered.join(orders, filtered.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


def hll_day_registers(ev):
    """(day, idx, m_j) daily HLL registers over an events frame — the
    shared sketch derivation of sketch_hll_rolling and the persisted
    sketch index (operators/sketch_index.py), so the in-query and
    served forms cannot drift."""
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    h = du.select("day", md5_long(F.col("user_id").cast("string")).alias("h"))
    return (
        h.select(
            "day",
            F.col("h").bitwiseAND(_HLL_M - 1).alias("idx"),
            _rho_case_col(F.shiftright("h", _HLL_P)).alias("rho"),
        )
        .groupBy("day", "idx")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_rolling_estimate(day_regs, spine):
    """report-day 7-day rolling HLL estimate from daily registers:
    register-wise MAX merge per window, exact-integer harmonic sum,
    linear-counting small-range correction. Returns (report_day,
    n_used, harmonic_s, hll_wau) — the shared estimate tail of
    sketch_hll_rolling (which joins the exact answer alongside) and
    the served sketch-index entries (artifact-only, no exact leg)."""
    win_regs = (
        day_regs.withColumn("o", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("report_day", F.expr("date_add(day, o)"))
        .join(spine, "report_day")
        .groupBy("report_day", "idx")
        .agg(F.max("m_j").alias("m_j"))
    )
    est = win_regs.groupBy("report_day").agg(
        F.count("*").cast("long").alias("n_used"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - m_j)"))
            + (_HLL_M - F.count("*")) * F.lit(1 << 53).cast("long")
        ).cast("long").alias("harmonic_s"),
    )
    raw = F.lit(_HLL_C) / F.col("harmonic_s")
    # classic HLL small-range (linear counting) correction — see
    # sketch_hll_rolling's docstring for the measured rationale
    corrected = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("n_used") < _HLL_M),
        F.round(
            F.lit(float(_HLL_M))
            * F.log(F.lit(float(_HLL_M)) / (_HLL_M - F.col("n_used"))),
            2,
        ),
    ).otherwise(F.round(raw, 2))
    return est.select(
        "report_day", "n_used", "harmonic_s", corrected.alias("hll_wau")
    )


@query(
    "sketch_hll_rolling",
    sql=f"""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    spine AS (SELECT DISTINCT day FROM du),
    h AS (
      SELECT day, user_id,
             {SQL_MD5_LONG.format(expr="CAST(user_id AS VARCHAR)")} AS h
      FROM du
    ),
    day_regs AS (
      SELECT day, h & {_HLL_M - 1} AS idx,
             max({_rho_case_sql(f"(h >> {_HLL_P})")}) AS m_j
      FROM h GROUP BY 1, 2
    ),
    win_regs AS (
      SELECT s.day AS report_day, r.idx, max(r.m_j) AS m_j
      FROM spine s JOIN day_regs r ON r.day BETWEEN s.day - 6 AND s.day
      GROUP BY 1, 2
    ),
    est AS (
      SELECT report_day,
             CAST(count(*) AS BIGINT) AS n_used,
             CAST(sum((CAST(1 AS BIGINT) << (53 - m_j)))
               + ({_HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS harmonic_s
      FROM win_regs GROUP BY 1
    ),
    exact AS (
      SELECT s.day AS report_day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau_exact
      FROM spine s JOIN du ON du.day BETWEEN s.day - 6 AND s.day
      GROUP BY 1
    )
    SELECT e.report_day, x.wau_exact, e.n_used, e.harmonic_s,
           CASE WHEN {_HLL_C!r} / e.harmonic_s <= {2.5 * _HLL_M!r} AND e.n_used < {_HLL_M}
                THEN round({float(_HLL_M)!r} * ln({float(_HLL_M)!r} / ({_HLL_M} - e.n_used)), 2)
                ELSE round({_HLL_C!r} / e.harmonic_s, 2) END AS hll_wau
    FROM est e JOIN exact x ON x.report_day = e.report_day
    """,
)
def sketch_hll_rolling(spark, sf_dir):
    """Rolling 7-day distinct users via MERGEABLE HLL registers — the
    scale path for rel_rolling_wau, shown against the exact answer.

    rel_rolling_wau's exact COUNT DISTINCT re-deduplicates every
    7-day window from active-pairs — fine until user cardinality is
    itself huge. The sketch form exploits HLL's defining property
    (register max is associative and idempotent): sketch each DAY
    once (≤256 registers per day, one map-side-combinable
    aggregate), then a window's sketch is the register-wise MAX of 7
    day sketches — constant work per report day, independent of user
    cardinality, and the same precomputed day sketches serve 7-day,
    28-day, or any other window for free (idempotence makes
    overlapping merges harmless — the property sums lack). This is
    how every production "rolling uniques" dashboard at 100 TB
    actually works. Deterministic md5 registers + exact-integer
    harmonic sum, so the oracle reproduces the estimate bit-for-bit;
    the exact WAU rides alongside so the estimate's error is
    visible in the result itself. Sketch + estimate live in the
    shared helpers (hll_day_registers / hll_rolling_estimate) the
    persisted sketch index serves from."""
    ev = T(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct().withColumnRenamed("day", "report_day")
    est = hll_rolling_estimate(hll_day_registers(ev), spine)
    exact = (
        du.withColumn("o", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("report_day", F.expr("date_add(day, o)"))
        .join(spine, "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau_exact"))
    )
    return est.join(exact, "report_day").select(
        "report_day",
        "wau_exact",
        "n_used",
        "harmonic_s",
        "hll_wau",
    )
