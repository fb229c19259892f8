"""TPC-H-pattern relational queries (adapted to the driver's
simplified star schema — no partsupp / shipmode / commitdate).

These widen the general relational surface beyond the reference's
operator set (SURVEY §2 notes the reference has no joins/aggs at
all): disjunctive predicates, correlated scalar subqueries,
conditional aggregation, HAVING-subquery pipelines, anti-joins —
each registered with a DuckDB oracle.

Scale notes (100 TB): every query here is a declarative DataFrame
plan — Catalyst pushes the date/brand filters into the parquet
scans, AQE picks broadcast sides for the dim tables (nation,
region, part at 2k rows), and sums are partially aggregated
map-side before the group-key shuffle. No collect(), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans.queries import T, query


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "rel_q6_forecast_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def rel_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate. All three
    predicates push down into the parquet scan (no join, no
    shuffle past the single partial/final agg)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "rel_q7_volume_shipping",
    sql="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2, 3
    """,
)
def rel_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: 6-table snowflake join with a disjunctive
    cross-nation predicate, grouped by both nations and ship year.
    nation is hint-broadcast (25 rows at every SF); supplier and
    customer carry NO hint — they scale with data volume, so the
    broadcast-vs-shuffle choice belongs to autoBroadcastJoinThreshold
    + AQE (broadcast at bench SF, shuffle at 100 TB), not to a hint
    that would OOM executors at scale."""
    li, o, c, s, n = (T(spark, sf_dir, t) for t in ("lineitem", "orders", "customer", "supplier", "nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "rel_q9_product_profit",
    sql="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ((sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                      AS BIGINT)) + 50) // 100) / 100.0 AS amount
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type LIKE 'PROM%'
    GROUP BY 1, 2
    """,
)
def rel_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: LIKE-filtered part dimension drives a 5-table
    join, profit grouped by supplier nation and order year. The part
    filter prunes before the fact join (broadcast semi-reduction).

    The profit sum keeps standard TPC-H ROUND-OF-SUM semantics AND is
    cross-engine deterministic: l_extendedprice and l_discount are
    both 2-dp, so the exact product has at most 4 decimals — per-row
    floor(x·10⁴ + 0.5) recovers the EXACT 1e-4-unit integer (the +0.5
    floor only strips double representation error; no information is
    lost, unlike a per-row cent rounding, whose accumulated half-cent
    error can move group totals). The exact BIGINT sum is then
    cent-rounded ONCE in pure integer arithmetic ((s+50) div 100 —
    half-up, no double division that could hit a .5 tie), and the
    final int/100.0 yields the identical double on both engines. Tie
    rule is half-up toward +inf; group sums here are non-negative."""
    li, o, s, n, p = (T(spark, sf_dir, t) for t in ("lineitem", "orders", "supplier", "nation", "part"))
    return (
        li.join(F.broadcast(p.filter(F.col("p_type").like("PROM%"))), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # SF-scaling: no hint, AQE decides
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.expr(
                "CAST(((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)"
                " AS BIGINT)) + 50) div 100) AS DOUBLE) / 100.0"
            ).alias("amount")
        )
    )


@query(
    "rel_q10_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def rel_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in
    a half-year window. TakeOrderedAndProject caps the result
    driver-side; tiebreak on custkey keeps the limit deterministic."""
    li, o, c, n = (T(spark, sf_dir, t) for t in ("lineitem", "orders", "customer", "nation"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))  # SF-scaling: no hint, AQE decides
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "rel_q12_priority_class",
    sql="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def rel_q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape: conditional aggregation (pivot-style CASE
    counts) over a joined year of shipments."""
    li, o = (T(spark, sf_dir, t) for t in ("lineitem", "orders"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "rel_q14_promo_effect",
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROM%'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def rel_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — a ratio of two
    conditional sums in one aggregate pass over a month window."""
    li, p = (T(spark, sf_dir, t) for t in ("lineitem", "part"))
    promo = F.when(F.col("p_type").like("PROM%"), _rev()).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))  # SF-scaling: no hint, AQE decides
        .agg(F.round(100.0 * F.sum(promo) / F.sum(_rev()), 4).alias("promo_revenue_pct"))
    )


@query(
    "rel_q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def rel_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly
    revenue — an aggregate reused both as join input and as a scalar
    subquery, exactly the spec's form: ``max(total_revenue)`` is a
    1-row aggregate broadcast back onto the revenue view (comparison
    on the ROUNDED sum so float ties resolve identically in both
    engines). No global rank window: the scalar-max form never
    single-partitions the per-supplier aggregate, however many
    suppliers exist. The revenue view is persisted because it feeds
    both the scalar and the join (spec's CREATE VIEW)."""
    from lol_data_pipeline_spark.caching import tracked_persist

    li, s = (T(spark, sf_dir, t) for t in ("lineitem", "supplier"))
    revenue = tracked_persist(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))  # SF-scaling: no hint
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "rel_q17_small_qty_revenue",
    sql="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
          FROM lineitem GROUP BY 1) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.qty_cut
    """,
)
def rel_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate-then-join — the form
    Catalyst itself rewrites correlated scalars into."""
    li, p = (T(spark, sf_dir, t) for t in ("lineitem", "part"))
    cuts = li.groupBy(F.col("l_partkey").alias("cut_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#1")), F.col("l_partkey") == F.col("p_partkey"))
        .join(cuts, F.col("l_partkey") == F.col("cut_pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "rel_q18_large_orders",
    sql="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def rel_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered IN-subquery (orders whose
    total quantity exceeds 200) re-joined to its detail — a
    semi-join against an aggregate."""
    li, o, c = (T(spark, sf_dir, t) for t in ("lineitem", "orders", "customer"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))  # SF-scaling: no hint, AQE decides
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "rel_q19_disjunctive_revenue",
    sql="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def rel_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: three-way disjunction of conjunctive
    brand/size/quantity bands — the classic OR-of-ANDs predicate the
    optimizer must not naively split across the join."""
    li, p = (T(spark, sf_dir, t) for t in ("lineitem", "part"))

    def band(brand, szlo, szhi, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(szlo, szhi)
            & F.col("l_quantity").between(qlo, qhi)
        )

    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band("Brand#1", 1, 5, 1, 11) | band("Brand#2", 1, 10, 10, 20) | band("Brand#3", 1, 15, 20, 30))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "rel_q22_idle_wealthy_customers",
    sql="""
    WITH cut AS (SELECT avg(c_acctbal) AS m FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, cut
    WHERE c.c_acctbal > cut.m
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def rel_q22_idle_wealthy_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold (global average
    balance) + NOT EXISTS anti-join against a filtered fact, grouped
    per nation."""
    c, o = (T(spark, sf_dir, t) for t in ("customer", "orders"))
    cut = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("m"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.crossJoin(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("m"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "rel_q4_order_priority",
    sql="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
)
def rel_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join (orders with at least one
    line shipped after the order date) counted per priority. The
    semi-join needs only l_orderkey+l_shipdate from the fact —
    column pruning keeps the probe narrow."""
    li, o = (T(spark, sf_dir, t) for t in ("lineitem", "orders"))
    oq = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        oq.join(
            li.select("l_orderkey", "l_shipdate"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


@query(
    "rel_q13_order_histogram",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY 1
    """,
)
def rel_q13_order_histogram(spark, sf_dir):
    """TPC-H Q13 shape: count-of-counts histogram — left join keeps
    customers with zero qualifying orders (count() over a null key
    yields 0), then the distribution of per-customer order counts."""
    c, o = (T(spark, sf_dir, t) for t in ("customer", "orders"))
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@query(
    "rel_q8_market_share",
    sql="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_1'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY 1
    """,
)
def rel_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of revenue sold
    into a region, per year — a ratio of conditional sums over a
    7-table snowflake (region filters the customer side; the share
    condition tags the supplier side)."""
    li, o, c, s, n, r = (
        T(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "supplier", "nation", "region")
    )
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    amer = r.filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    share = F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))  # SF-scaling: no hint, AQE decides
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(amer), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # SF-scaling: no hint, AQE decides
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(share) / F.sum(_rev()), 6).alias("mkt_share"))
    )


@query(
    "rel_q2_min_acctbal_supplier",
    sql="""
    SELECT n.n_name, s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def rel_q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 pattern (adapted — no partsupp in this schema): a
    correlated scalar-min subquery selecting each nation's
    minimum-balance supplier, decorrelated into aggregate-then-join —
    exactly Catalyst's own RewriteCorrelatedScalarSubquery form. The
    per-group min table is group-count-sized, so it broadcasts; the
    equality probe is a BroadcastHashJoin, no shuffle of supplier.
    Min is an exact (order-insensitive) agg, so the double equality
    is engine-portable."""
    s, n = (T(spark, sf_dir, t) for t in ("supplier", "nation"))
    mins = s.groupBy(F.col("s_nationkey").alias("m_nk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(
            F.broadcast(mins),
            (F.col("s_nationkey") == F.col("m_nk")) & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("n_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@query(
    "rel_q11_important_parts",
    sql="""
    WITH v AS (
      SELECT l_partkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, round(qty, 2) AS qty
    FROM v
    WHERE qty > (SELECT 0.0008 * sum(qty) FROM v)
    """,
)
def rel_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 pattern: per-group value HAVING a global-total
    scalar threshold. The total is a 1-row aggregate broadcast into
    the filter (scalar-subquery broadcast — no second shuffle of the
    grouped table). Quantities are integral, so both the per-part and
    global double sums are exact and the threshold compare is
    engine-portable."""
    li = T(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("qty"))
    total = per_part.agg((F.lit(0.0008) * F.sum("qty")).alias("cut"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("qty") > F.col("cut"))
        .select("l_partkey", F.round("qty", 2).alias("qty"))
    )


@query(
    "rel_q16_supplier_cnt",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def rel_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 pattern: NOT-IN exclusion (suppliers in arrears
    standing in for the complaints predicate) as a broadcast
    anti-join, then count(DISTINCT supplier) per part descriptor.
    The distinct-agg expands keys map-side; only the small distinct
    pairs shuffle."""
    li, p, s = (T(spark, sf_dir, t) for t in ("lineitem", "part", "supplier"))
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13))
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "rel_q20_dominant_shippers",
    sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), pt AS (
      SELECT l_partkey, sum(sq) AS tq FROM ps GROUP BY 1
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN ps ON ps.l_suppkey = s.s_suppkey
    JOIN pt ON pt.l_partkey = ps.l_partkey
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_name LIKE 'red%' AND ps.sq > 0.3 * pt.tq
    """,
)
def rel_q20_dominant_shippers(spark, sf_dir):
    """TPC-H Q20 pattern (availqty threshold adapted to shipped
    volume): suppliers who shipped >30% of a red part's 1996 volume —
    a per-(part,supplier) aggregate compared against a correlated
    per-part total, then a semi-join-shaped DISTINCT onto supplier.
    The per-part total REUSES the (part,supplier) aggregate (one
    lineitem scan feeds both levels); part filter broadcasts.
    Integral quantities keep the 0.3·total compare exact."""
    li, s, p = (T(spark, sf_dir, t) for t in ("lineitem", "supplier", "part"))
    ps = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    pt = ps.groupBy(F.col("l_partkey").alias("t_pk")).agg(F.sum("sq").alias("tq"))
    red = p.filter(F.col("p_name").like("red%")).select("p_partkey")
    return (
        ps.join(pt, F.col("l_partkey") == F.col("t_pk"))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("sq") > 0.3 * F.col("tq"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "rel_q21_sole_late_supplier",
    sql="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def rel_q21_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 pattern (late = shipped >60 days after order date,
    standing in for the absent commit/receipt dates): suppliers who
    were the ONLY late shipper on a finished multi-supplier order.
    EXISTS → left-semi self-join on the order's other-supplier rows;
    NOT EXISTS → left-anti against the other-supplier LATE rows.
    Both correlated subqueries become hash joins keyed on l_orderkey,
    reusing the same shuffle partitioning across the semi, anti, and
    count aggregations."""
    li, o, s = (T(spark, sf_dir, t) for t in ("lineitem", "orders", "supplier"))
    late1 = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk")
    )
    late_others = late1.select(
        F.col("l_orderkey").alias("y_ok"), F.col("l_suppkey").alias("y_sk")
    )
    sole_late = (
        late1.join(
            others,
            (F.col("l_orderkey") == F.col("x_ok")) & (F.col("l_suppkey") != F.col("x_sk")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("y_ok")) & (F.col("l_suppkey") != F.col("y_sk")),
            "left_anti",
        )
    )
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # SF-scaling: no hint
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
