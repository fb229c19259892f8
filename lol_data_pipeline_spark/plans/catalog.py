"""Function-catalog and remaining-relational-surface queries:
string/date/math/array scalar functions, the full window-function
set, correlated subqueries, full outer join, exact percentiles.

These close out SURVEY §7 M2: everything the reference lacks but a
relational engine must provide, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lol_data_pipeline_spark.functions.scalar import snap
from lol_data_pipeline_spark.plans.queries import T, query


@query(
    "rel_scalar_string_catalog",
    sql="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS low_seg,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_key,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_pad,
           CASE WHEN c_name LIKE '%001%' THEN 1 ELSE 0 END AS has_001,
           split_part(c_name, '_', 1) AS name_head,
           regexp_extract(c_name, '[0-9]+', 0) AS name_digits,
           reverse(c_mktsegment) AS seg_rev
    FROM customer
    """,
)
def rel_scalar_string_catalog(spark, sf_dir):
    """String function catalog (SURVEY §2.9: the engine's scalar-fn
    surface) — all JVM-side builtins, one Project node."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat("c_mktsegment", F.lit("#"), F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_pad"),
        F.when(F.col("c_name").like("%001%"), 1).otherwise(0).alias("has_001"),
        F.split_part(F.col("c_name"), F.lit("_"), F.lit(1)).alias("name_head"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("name_digits"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
    )


@query(
    "rel_scalar_datetime_catalog",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders
    """,
)
def rel_scalar_datetime_catalog(spark, sf_dir):
    """Date/time function catalog over the orders timestamps."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_epoch_start"),
    )


@query(
    "rel_scalar_math_catalog",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(abs(l_discount - 0.05) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS abs_disc_delta,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(floor(sqrt(l_quantity) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS qty_sqrt,
           CAST(floor(ln(l_extendedprice + 1) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS price_ln,
           CAST(floor(pow(1 + l_tax, 2) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS tax_sq,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def rel_scalar_math_catalog(spark, sf_dir):
    """Math function catalog over lineitem numerics.

    Parity notes (r08, fixing the r07 driver hash-mismatch):
    - ``disc_sign``: Spark ``signum`` returns DOUBLE, DuckDB
      ``sign()`` returns TINYINT — values were cell-identical at
      sf0.01 but the driver hashes ``1.0`` and ``1`` differently, so
      the oracle casts to DOUBLE.
    - the four multi-decimal columns use the tie-safe ``snap()``
      idiom (``floor(x·10⁶+0.5)/10⁶``) instead of ``round(x, 6)``:
      the .5-tie/half-even divergence the registry purged in r5."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        snap(F.abs(F.col("l_discount") - 0.05)).alias("abs_disc_delta"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        snap(F.sqrt("l_quantity")).alias("qty_sqrt"),
        snap(F.log(F.col("l_extendedprice") + 1)).alias("price_ln"),
        snap(F.pow(F.lit(1) + F.col("l_tax"), 2)).alias("tax_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "rel_window_catalog",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(avg(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def rel_window_catalog(spark, sf_dir):
    """The full window-function surface: ranking, distribution,
    offset, and frame-spec functions in one pass (one shuffle)."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.avg("o_totalprice").over(wmov), 4).alias("moving_avg3"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "rel_subquery_exists",
    sql="""
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
    )
    AND s_acctbal > (SELECT avg(s_acctbal) FROM supplier)
    """,
)
def rel_subquery_exists(spark, sf_dir):
    """Correlated EXISTS + scalar subquery through the SQL API —
    Catalyst decorrelates to a semi-join + broadcast scalar."""
    T(spark, sf_dir, "supplier").createOrReplaceTempView("__sq_supplier")
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("__sq_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
        FROM __sq_supplier s
        WHERE EXISTS (
          SELECT 1 FROM __sq_lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
        )
        AND s_acctbal > (SELECT avg(s_acctbal) FROM __sq_supplier)
        """
    )


@query(
    "rel_join_full_outer",
    sql="""
    SELECT coalesce(a.k, b.k) AS nationkey,
           a.n_cust, b.n_supp
    FROM (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_cust
          FROM customer GROUP BY 1) a
    FULL OUTER JOIN (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_supp
                     FROM supplier GROUP BY 1) b
      ON a.k = b.k
    """,
)
def rel_join_full_outer(spark, sf_dir):
    """Full outer join preserving unmatched keys on both sides."""
    c = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "k", "full_outer").select(
        F.col("k").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "rel_percentiles",
    sql="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def rel_percentiles(spark, sf_dir):
    """Exact percentiles (linear interpolation) per group — Spark's
    percentile() and DuckDB's quantile_cont share the definition.
    (approx_percentile exists for the at-scale variant but is
    engine-specific, so the oracle uses the exact form.)"""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "rel_array_agg_catalog",
    sql="""
    SELECT n_nationkey,
           CAST(len(list_sort(list(c.c_custkey))) AS BIGINT) AS n_members,
           list_sort(list(c.c_custkey))[1] AS first_member,
           CAST(list_sort(list(c.c_custkey))[len(list(c.c_custkey))] AS BIGINT) AS last_member,
           round(list_aggregate(list_sort(list(c.c_acctbal)), 'sum'), 2) AS bal_sum
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n_nationkey
    """,
)
def rel_array_agg_catalog(spark, sf_dir):
    """Array aggregation (collect_list) + array ops on the result —
    grouped data as first-class array values."""
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return joined.groupBy("n_nationkey").agg(
        F.size(F.array_sort(F.collect_list("c_custkey"))).cast("long").alias("n_members"),
        F.array_sort(F.collect_list("c_custkey")).getItem(0).alias("first_member"),
        F.array_max(F.collect_list("c_custkey")).cast("long").alias("last_member"),
        # sum over the SORTED list → deterministic float order on
        # both engines (collect_list order is not)
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("c_acctbal")), F.lit(0.0), lambda acc, x: acc + x
            ),
            2,
        ).alias("bal_sum"),
    )


@query(
    "rel_unpivot",
    sql="""
    WITH m AS (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(val), 2) AS sum_val,
           round(min(val), 2) AS min_val,
           round(max(val), 2) AS max_val
    FROM m GROUP BY 1
    """,
)
def rel_unpivot(spark, sf_dir):
    """Wide→long reshaping (melt): the four lineitem measures
    unpivoted into (measure, val) rows, then profiled per measure —
    the canonical "stats over every column" pass a profiler runs.

    `DataFrame.unpivot` plans an Expand (a generator: each input row
    emits one output row per measure inside the SAME task) — no
    shuffle, no per-measure re-scan; the table is read ONCE even
    though the SQL oracle reads it four times. The follow-up
    aggregate has only 4 groups — pathological key cardinality — but
    partial aggregation collapses each partition to ≤4 rows before
    the exchange, so the 4-row reducer side receives ~4×partitions
    rows, not the data. (Same argument as `rel_agg_salted`; with a
    measure-count this low the salt is unnecessary.)"""
    li = T(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = li.unpivot(
        ids=[], values=measures, variableColumnName="measure", valueColumnName="val"
    )
    return long.groupBy("measure").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("val"), 2).alias("sum_val"),
        F.round(F.min("val"), 2).alias("min_val"),
        F.round(F.max("val"), 2).alias("max_val"),
    )
