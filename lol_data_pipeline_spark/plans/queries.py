"""The engine's query catalog.

Every operator from SURVEY.md §2 (reference surface, ``ref_*``), the
general relational surface (``rel_*``), and the north-star extension
ops (``text_*``, ``dedup_*``, ``ann_*``, ``mm_*``, ``stream_*``) is
registered here as a named plan: a Spark DataFrame callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet.

Rules that keep the oracle hash-stable across engines:
- every computed column is aliased identically on both sides;
- order-dependent float aggregates are rounded (2 dp for money sums,
  4-6 dp for ratios/similarities) on BOTH sides;
- BIGINT casts on counts/sums of integers (DuckDB widens to HUGEINT);
- timestamps stay UTC (session TZ pinned in session.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from lol_data_pipeline_spark.caching import release_caches
from lol_data_pipeline_spark.io import load_table, widen
from lol_data_pipeline_spark.functions import scalar, text as tx
from lol_data_pipeline_spark.functions.flatten import flatten
from lol_data_pipeline_spark.operators import dedup as dd
from lol_data_pipeline_spark.operators import similarity as sim
from lol_data_pipeline_spark.operators.asof import asof_join_backward
from lol_data_pipeline_spark.operators.relational import topk_per_group


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Free intermediates persisted by the PREVIOUS entry: a
            # long-lived session otherwise accumulates executor
            # storage (CacheManager holds plan-keyed caches until an
            # explicit unpersist; Python GC never reclaims them).
            # The current entry's own persists stay live until the
            # next entry runs or the caller releases them.
            release_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        REGISTRY[name] = QuerySpec(fn=wrapped, sql=sql)
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = load_table(spark, sf_dir, name)
    if name in ("documents", "embeddings"):
        # These two feed CPU-heavy per-row work (shingling, hashing,
        # vector folds); spread narrow scans across all cores. No-op
        # once the scan is big enough to have >= cores splits.
        df = widen(df)
    return df


# =========================================================================
# ref_* — the reference's own operator surface (SURVEY §2), re-expressed
# =========================================================================


@query(
    "ref_dedup_distinct",
    sql="SELECT DISTINCT o_custkey FROM orders",
)
def ref_dedup_distinct(spark, sf_dir):
    """A1 (reference matches.py:45-50): set-dedup of scanned IDs →
    distinct(). One hash-aggregate shuffle; map-side partial dedup."""
    return T(spark, sf_dir, "orders").select("o_custkey").distinct()


@query(
    "ref_filter_status",
    sql="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'error' AND value > 5.0
    """,
)
def ref_filter_status(spark, sf_dir):
    """F1 (reference pipeline.py:44-46): keep status==200 responses →
    predicate fully pushed to the parquet scan."""
    ev = T(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") == "error") & (F.col("value") > 5.0)).select(
        "event_id", "user_id", "value"
    )


@query(
    "ref_projection_rename",
    sql="""
    SELECT o_orderkey AS order_id,
           upper(o_orderstatus) AS status,
           round(o_totalprice * 1.1, 3) AS total_with_tax
    FROM orders
    """,
)
def ref_projection_rename(spark, sf_dir):
    """P1/P2 (reference utils.py:112-128): projection + rename of
    selected fields — a pure Project node, column-pruned at the scan."""
    return T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.upper("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 1.1, 3).alias("total_with_tax"),
    )


@query(
    "ref_epoch_ms_to_date",
    sql="""
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%d') AS ts_date
    FROM events
    """,
)
def ref_epoch_ms_to_date(spark, sf_dir):
    """P3 (reference utils.py:84-91): epoch-ms ↔ 'yyyy-MM-dd' — native
    temporal exprs replace datetime.fromtimestamp per row."""
    ev = T(spark, sf_dir, "events")
    ms = scalar.to_epoch_ms("ts")
    return ev.select(
        "event_id",
        ms.alias("ts_ms"),
        scalar.epoch_ms_to_date_str(ms).alias("ts_date"),
    )


@query(
    "ref_conditional_units",
    sql="""
    SELECT o_orderkey,
           CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 's' ELSE 'ms' END AS duration_units,
           CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                THEN round(o_totalprice, 2) ELSE round(o_totalprice * 1000, 2) END AS duration_norm
    FROM orders
    """,
)
def ref_conditional_units(spark, sf_dir):
    """P4 (reference utils.py:109-147): the s/ms duality as data —
    F.when on null-presence instead of try/except KeyError."""
    o = T(spark, sf_dir, "orders")
    nullable = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        scalar.duration_units(nullable).alias("duration_units"),
        F.when(nullable.isNotNull(), F.round(F.col("o_totalprice"), 2))
        .otherwise(F.round(F.col("o_totalprice") * 1000, 2))
        .alias("duration_norm"),
    )


@query(
    "ref_map_lookup",
    sql="""
    SELECT event_type,
           CASE WHEN event_type = 'click' THEN 400
                WHEN event_type = 'view' THEN 430
                WHEN event_type = 'purchase' THEN 450
                ELSE NULL END AS queue_id,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def ref_map_lookup(spark, sf_dir):
    """P9 (reference utils.py:63-76): literal map lookup as a CASE
    chain — constant-folded, no join, no UDF."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            scalar.map_lookup("event_type", {"click": 400, "view": 430, "purchase": 450}).alias(
                "queue_id"
            ),
        )
        .groupBy("event_type", "queue_id")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ref_array_position",
    sql="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(nullif(list_position(toks, 'merge'), 0) AS BIGINT) AS pos,
           toks[nullif(list_position(toks, 'merge'), 0) + 1] AS next_tok
    FROM tok
    """,
)
def ref_array_position(spark, sf_dir):
    """P5/P6 (reference utils.py:93-107,149-150): array position
    search + element extraction by computed index, null-safe."""
    d = T(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    pos = scalar.array_find_pos(toks, F.lit("merge"))
    return d.select(
        "doc_id",
        pos.cast("long").alias("pos"),
        scalar.element_at_pos(toks, (pos + 1).cast("int")).alias("next_tok"),
    )


@query(
    "ref_flatten_struct",
    sql="""
    SELECT o_orderkey AS metadata_order_id,
           o_orderstatus AS metadata_status,
           o_custkey AS info_cust_id,
           round(o_totalprice, 2) AS info_price_total,
           strftime(o_orderdate, '%Y-%m-%d') AS info_dates_order_date
    FROM orders
    """,
)
def ref_flatten_struct(spark, sf_dir):
    """P7/P8 (reference utils.py:25-43): recursive struct flatten as a
    schema-driven pure projection (functions/flatten.py). We nest
    orders into a 2-level struct then flatten it back — the flatten
    itself is the operator under test."""
    o = T(spark, sf_dir, "orders")
    nested = o.select(
        F.struct(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderstatus").alias("status"),
        ).alias("metadata"),
        F.struct(
            F.col("o_custkey").alias("cust_id"),
            F.struct(F.round(F.col("o_totalprice"), 2).alias("total")).alias("price"),
            F.struct(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")).alias(
                "dates"
            ),
        ).alias("info"),
    )
    return flatten(nested)


@query(
    "ref_union_scans",
    sql="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM (
      SELECT * FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT * FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY o_orderstatus
    """,
)
def ref_union_scans(spark, sf_dir):
    """§2.6 (reference matches.py:27-43): per-queue scan loop = UNION
    ALL of parameterized scans, then aggregate."""
    o = T(spark, sf_dir, "orders")
    u = o.filter(F.col("o_orderstatus") == "O").unionAll(
        o.filter(F.col("o_orderstatus") == "F")
    )
    return u.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "ref_limit_topk",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def ref_limit_topk(spark, sf_dir):
    """§2.6 limit (reference matches.py:12,29): bounded scan → global
    top-k. Spark executes as TakeOrderedAndProject — no full sort."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "ref_semijoin",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 900)
    """,
)
def ref_semijoin(spark, sf_dir):
    """J1/J2 (reference utils.py:93-107): correlated existence lookup
    → left-semi join (never duplicates the probe side)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 900)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "ref_antijoin",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def ref_antijoin(spark, sf_dir):
    """Inverse of the semi-join: customers that never ordered —
    left-anti join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "ref_counts_observability",
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
    FROM orders
    """,
)
def ref_counts_observability(spark, sf_dir):
    """A2 (reference pipeline.py:42-46, db.py:34-38): pipeline
    counters as one aggregate pass instead of repeated len() calls."""
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.when(F.col("o_orderstatus") != "O", 1).otherwise(0))
        .cast("long")
        .alias("n_closed"),
    )


@query(
    "ref_json_extract",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def ref_json_extract(spark, sf_dir):
    """§1.1 schema-on-read JSON: extract a field from a raw JSON
    string column (the reference's whole input is such documents)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k_val"), "value"
        )
        .groupBy("k_val")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# =========================================================================
# rel_* — general relational surface (SURVEY §7 M2)
# =========================================================================


@query(
    "rel_q1_pricing",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_q1_pricing(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates — the
    partial-agg (map-side combine) path; 6 output groups."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "rel_q3_shipping",
    sql="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def rel_q3_shipping(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → fact join → agg →
    global top-k. The customer side is small post-filter → broadcast."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "rel_q5_local_supplier",
    sql="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def rel_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with two broadcast dims and a
    same-nation co-location predicate."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # supplier scales with SF: no hint, AQE decides broadcast-vs-shuffle
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "rel_join_broadcast",
    sql="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def rel_join_broadcast(spark, sf_dir):
    """Dimension join with an explicit broadcast hint — zero shuffle."""
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "rel_join_left_agg",
    sql="""
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def rel_join_left_agg(spark, sf_dir):
    """Left outer join preserving customers with no orders, then
    null-aware aggregation."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "rel_agg_rollup",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_agg_rollup(spark, sf_dir):
    """Hierarchical totals via ROLLUP — one pass, Spark expands
    grouping sets internally."""
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "rel_agg_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rel_agg_cube(spark, sf_dir):
    """All marginal combinations via CUBE."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "rel_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def rel_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS through the SQL API (same Catalyst
    Expand node as rollup/cube)."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "rel_agg_distinct",
    sql="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def rel_agg_distinct(spark, sf_dir):
    """Distinct aggregate alongside plain aggregates (two-phase
    distinct-agg expansion in Catalyst)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


@query(
    "rel_window_topk",
    sql="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def rel_window_topk(spark, sf_dir):
    """Top-k per group via ranking window (one shuffle on the group
    key; Spark pushes a per-partition top-k below the shuffle)."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long")).filter(F.col("rn") <= 3)
    )


@query(
    "rel_window_running",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def rel_window_running(spark, sf_dir):
    """Running total per customer — explicit ROWS frame so engines
    agree on tie handling."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "rel_window_lag",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
    FROM orders
    """,
)
def rel_window_lag(spark, sf_dir):
    """lag() — offset window function; NULL delta on each partition's
    first row."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
    )


@query(
    "rel_setop_intersect",
    sql="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def rel_setop_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics) — customers active in both
    years."""
    o = T(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


@query(
    "rel_setop_except",
    sql="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def rel_setop_except(spark, sf_dir):
    """EXCEPT (distinct) — customers active in 1996 but not 1997."""
    o = T(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.subtract(y97)


@query(
    "rel_pivot",
    sql="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_pivot(spark, sf_dir):
    """Pivot (wide aggregation) with an explicit value list — maps to
    the same conditional-aggregation plan the oracle runs."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "rel_range_join",
    sql="""
    SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'click'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def rel_range_join(spark, sf_dir):
    """Interval/range join: click within 5 minutes after a view by
    the same user. Equi-key (user_id) carries the shuffle; the range
    predicate is evaluated inside the sort-merge join."""
    ev = T(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("b_user_id"),
        F.col("ts").alias("cts"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user_id"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select("view_id", "click_id", "user_id")
    )


@query(
    "rel_asof_join",
    sql="""
    SELECT c.event_id AS click_id, c.user_id,
           v.event_id AS view_id, round(v.value, 2) AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def rel_asof_join(spark, sf_dir):
    """As-of (point-in-time) join: latest view at-or-before each
    click. Spark lacks native ASOF; operators/asof.py implements the
    one-shuffle union-tag algorithm (no pandas, skew-safe)."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.col("value").alias("view_value")
    )
    joined = asof_join_backward(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["view_id", "view_value"],
        tiebreak="view_id",
    )
    return joined.filter(F.col("asof_view_id").isNotNull()).select(
        "click_id",
        "user_id",
        F.col("asof_view_id").alias("view_id"),
        F.round("asof_view_value", 2).alias("view_value"),
    )


@query(
    "rel_topk_per_group_op",
    sql="""
    SELECT l_suppkey, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 2
    """,
)
def rel_topk_per_group_op(spark, sf_dir):
    """operators.relational.topk_per_group as a catalog entry."""
    li = T(spark, sf_dir, "lineitem")
    top = topk_per_group(
        li,
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        2,
    )
    return top.select(
        "l_suppkey", "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice")
    )


@query(
    "rel_join_salted",
    sql="""
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def rel_join_salted(spark, sf_dir):
    """operators.relational.salted_join as a catalog entry: the big
    side's key is salted into 16 sub-keys and the dim side explodes
    across all salts, so ONE pathological hot key spreads over 16
    reducers. Salting changes the physical distribution only — the
    oracle is the plain join, which is exactly the point (AQE's
    skew-join does this adaptively; the explicit form is for keys
    AQE can't see, e.g. null-heavy FKs at 100 TB)."""
    from lol_data_pipeline_spark.operators.relational import salted_join

    cust = T(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nk")
    nation = T(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nk")
    joined = salted_join(cust, nation, "nk", salt=16)
    return joined.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


@query(
    "rel_agg_salted",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1
    """,
)
def rel_agg_salted(spark, sf_dir):
    """operators.relational.salted_agg as a catalog entry: two-phase
    skew-safe aggregation over a pathologically low-cardinality key
    (5 event types — on a 1000-executor cluster a plain groupBy puts
    everything on 5 reducers; phase 1 on (key, salt) uses 5×16).
    Salting changes the physical distribution only, so the oracle is
    the plain aggregate."""
    from lol_data_pipeline_spark.operators.relational import salted_agg

    ev = T(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        [
            # count_star = count(*) row-count semantics, exactly the
            # oracle's count(*) even if value ever carries NULLs
            ("value", "count_star", "n"),
            ("value", "sum", "sum_value"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
        ],
        salt=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 2).alias("sum_value"),
        "min_value",
        "max_value",
    )


@query(
    "rel_incremental_agg_merge",
    sql="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY 1
    """,
)
def rel_incremental_agg_merge(spark, sf_dir):
    """Incremental-view maintenance: the full aggregate recomputed as
    base-partial ⊎ delta-partial (sum-of-sums, count-of-counts,
    min-of-mins, max-of-maxes) — the algebraic-merge property that
    lets a materialized aggregate absorb new partitions without
    touching history. The oracle is the from-scratch aggregate; the
    plan proves the merge is lossless. At 100 TB this is the
    difference between re-scanning the lake and scanning one day."""
    li = T(spark, sf_dir, "lineitem")
    cutoff = "1997-06-01"

    def partial(df):
        return df.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("p_sum"),
            F.count("*").alias("p_cnt"),
            F.min("l_extendedprice").alias("p_min"),
            F.max("l_extendedprice").alias("p_max"),
        )

    base = partial(li.filter(F.col("l_shipdate") < cutoff))
    delta = partial(li.filter(F.col("l_shipdate") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("p_sum"), 2).alias("sum_qty"),
            F.sum("p_cnt").cast("long").alias("n_rows"),
            F.round(F.min("p_min"), 2).alias("min_price"),
            F.round(F.max("p_max"), 2).alias("max_price"),
        )
    )


@query(
    "ref_json_lines_scan",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value,
           min(CAST(ts AS DATE)) AS first_day,
           max(CAST(ts AS DATE)) AS last_day
    FROM events
    GROUP BY 1
    """,
)
def ref_json_lines_scan(spark, sf_dir):
    """Schema-enforced JSON-lines source with an explicit corrupt-
    record policy: the events table staged as a JSONL landing zone
    (epoch-micros timestamps, jsonl.py's ts_us), read back under a DECLARED schema in
    PERMISSIVE mode with two injected malformed lines routed into
    `_corrupt_record` and quarantined by filter — then aggregated.
    Parity against the parquet table proves the JSON round trip is
    lossless AND that the corrupt lines contaminated nothing.

    Reference parity: the reference trusts `response.json()` with
    only a content-type guard (`/root/reference/src/api/pipeline.py:
    67-74`); this is that ingestion surface with the malformed-payload
    policy made explicit and scale-safe (schema-on-read with a
    declared StructType — no sampling inference pass over 100 TB —
    and per-file parallel line parsing). Timestamps re-enter through
    io.ts_from_epoch, the same unit-detecting chokepoint as every
    other long→timestamp path (SURVEY §1.2)."""
    from lol_data_pipeline_spark.sources.jsonl import read_events_jsonl

    raw = read_events_jsonl(spark, sf_dir)
    valid = raw.filter(F.col("_corrupt_record").isNull())
    return valid.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )


@query(
    "ref_schema_evolution_scan",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN event_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_new_era,
           CAST(count(DISTINCT CASE WHEN event_id % 2 = 0
                                    THEN event_id % 16 END) AS BIGINT) AS n_buckets,
           round(sum(CASE WHEN event_id % 2 = 1 THEN value ELSE 0 END), 2)
             AS old_era_value
    FROM events
    GROUP BY 1
    """,
)
def ref_schema_evolution_scan(spark, sf_dir):
    """Schema-evolution landing-zone read: the events table staged as
    TWO parquet eras with different write-time schemas (era v1 = odd
    event_ids, original columns; era v2 = even event_ids plus an
    added ``src_bucket``), read back in ONE ``mergeSchema`` scan
    where v1 rows surface NULL src_bucket — the long-lived-pipeline
    capability of querying across a producer upgrade without a
    backfill. The aggregate proves all three era behaviors at once:
    total counts span both eras, ``count(src_bucket)`` counts only
    the new era (NULL-fill correct), and the old-era value sum shows
    v1 rows kept their data columns.

    Reference parity: the reference hard-codes a 14-field projection
    (`/root/reference/src/api/utils/utils.py:25-153`) and has no
    story for a payload-shape change; this surface makes the upgrade
    path explicit. Scale: mergeSchema unions FOOTER schemas at
    planning time (per-file footer read, no data scan) and pruning/
    pushdown still reach each file — plan-checked in
    tests/test_queries.py."""
    from lol_data_pipeline_spark.sources.evolution import read_events_merged

    merged = read_events_merged(spark, sf_dir)
    return merged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("src_bucket").cast("long").alias("n_new_era"),
        F.countDistinct("src_bucket").cast("long").alias("n_buckets"),
        F.round(
            F.sum(F.when(F.col("src_bucket").isNull(), F.col("value")).otherwise(F.lit(0.0))),
            2,
        ).alias("old_era_value"),
    )


_ASOF_TOLERANCE_MS = 30 * 60 * 1000


def asof_tolerance_attribution(clicks, views, tolerance_ms=_ASOF_TOLERANCE_MS):
    """The rel_asof_tolerance plan body over arbitrary frames —
    clicks (click_id, user_id, ts), views (user_id, ts, view_id,
    view_value?, view_ts) — used by BOTH the registry entry and its
    boundary test so the lookback guard cannot regress against a
    private copy. Matched rows older than ``tolerance_ms`` become
    NULL; the matched row's own timestamp rides in the carried
    payload struct, so the check is a pure post-projection."""
    from lol_data_pipeline_spark.operators.asof import asof_join_backward

    payload = [c for c in ("view_id", "view_value", "view_ts") if c in views.columns]
    joined = asof_join_backward(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=payload,
        tiebreak="view_id",
    )
    fresh = F.col("asof_view_ts").isNotNull() & (
        F.unix_millis("ts") - F.unix_millis("asof_view_ts") <= tolerance_ms
    )
    out = [
        "click_id",
        "user_id",
        F.when(fresh, F.col("asof_view_id")).alias("view_id"),
    ]
    if "view_value" in payload:
        out.append(F.when(fresh, F.round("asof_view_value", 2)).alias("view_value"))
    return joined.select(*out)


@query(
    "rel_asof_tolerance",
    sql="""
    WITH v AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'view'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id AS click_id, c.user_id,
           CASE WHEN v.ts IS NOT NULL AND c.ts - v.ts <= INTERVAL 30 MINUTE
                THEN v.event_id END AS view_id,
           CASE WHEN v.ts IS NOT NULL AND c.ts - v.ts <= INTERVAL 30 MINUTE
                THEN round(v.value, 2) END AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def rel_asof_tolerance(spark, sf_dir):
    """As-of join with a match tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics): the latest view
    at-or-before each click, but only if it happened within 30
    minutes — staler matches become NULL instead of silently
    attributing a click to an hours-old view. The real-world form of
    every attribution join (a lookback window is a business rule,
    not an afterthought).

    Same one-shuffle union-tag kernel as rel_asof_join
    (operators/asof.py — no pandas, skew-safe). Equal-timestamp view
    ties are broken to max event_id EXPLICITLY on both sides: the
    Spark kernel's tiebreak already picks max, but DuckDB's ASOF
    JOIN leaves duplicate right timestamps undefined, so the oracle
    pre-dedupes views per (user_id, ts) with the same rule — parity
    is deterministic for any data, not just tie-free fixtures."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
        F.col("ts").alias("view_ts"),
    )
    return asof_tolerance_attribution(clicks, views)


@query(
    "rel_asof_forward",
    sql="""
    WITH p AS (
      SELECT user_id, ts, event_id
      FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id ASC) = 1
    )
    SELECT c.event_id AS click_id, c.user_id,
           p.event_id AS purchase_id,
           CAST(CASE WHEN p.ts IS NOT NULL
                     THEN epoch_ms(p.ts) - epoch_ms(c.ts) END AS BIGINT)
               AS ms_to_convert
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def rel_asof_forward(spark, sf_dir):
    """Forward as-of join: the NEXT purchase at-or-after each click
    by the same user, plus the time-to-convert — the attribution
    question rel_asof_join asks in reverse. Spark still has no ASOF;
    operators/asof.py's forward twin runs the same one-shuffle
    union-tag kernel with the window ordering reversed (descending
    ts, min-id tiebreak). Equal-timestamp purchase ties are
    pre-deduped to MIN event_id in the oracle because DuckDB's ASOF
    leaves duplicate right timestamps undefined — the deterministic
    mirror of rel_asof_tolerance's max-wins rule on the backward
    side."""
    from lol_data_pipeline_spark.operators.asof import asof_join_forward

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = asof_join_forward(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["purchase_id", "purchase_ts"],
        tiebreak="purchase_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("asof_purchase_id").alias("purchase_id"),
        (
            F.unix_millis("asof_purchase_ts") - F.unix_millis("ts")
        ).cast("long").alias("ms_to_convert"),
    )


def snap_sql(expr: str, scale: int = 6) -> str:
    """Tie-safe n-decimal snap, identical text for Spark and DuckDB:
    ``floor(x·10ⁿ + 0.5) / 10ⁿ`` instead of ``round(x, n)``.

    Why round() is unsafe for RATIONAL outputs (exact-integer
    numerators over integer denominators — fixed-point averages,
    count ratios, OLS statistics): such values land on EXACT .5 ties
    at the n-th decimal (e.g. s/n = 472537.5 in the sf0.1 sweep),
    and the engines break double round()'s tie differently (Spark
    half-up via BigDecimal, DuckDB half-even) — a one-ulp output
    difference that fails the value-hash. floor(x + 0.5) has ONE
    definition everywhere. Float-valued expressions (cosines, BM25
    scores) hit ties with probability ~0 and may keep round(); the
    divisor is CAST(... AS DOUBLE) because a bare ``1000000.0``
    literal is DECIMAL in DuckDB and would change the output type."""
    m = 10 ** scale
    return f"CAST(floor(({expr}) * {m} + 0.5) AS BIGINT) / CAST({m} AS DOUBLE)"
