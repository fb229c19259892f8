"""Behavioral / statistical analytics over the events and lineitem
tables: batch sessionization, equi-width histograms, z-score
outliers.

These are the batch twins of the streaming windows (a sessionize
over bounded data is what `stream_session_window` computes over an
unbounded one) and the profiling passes a curation pipeline runs
before choosing filters. No reference parity — north-star
extensions (SURVEY §7 M3).

Scale notes:
- sessionization is one window (shuffle on user_id) + one
  hash-aggregate on (user_id, session_idx) — the second groupBy
  reuses the first shuffle's partitioning (session_idx is a
  function of rows within a user partition), so Catalyst plans no
  second exchange.
- histogram / outliers: global or per-group scalar statistics ride
  a 1-row (or few-row broadcast) join; the fact table is scanned
  once and never shuffled except the final tiny bin/group count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans.queries import T, query

_SESSION_GAP_MS = 1_800_000  # 30 min


def _with_session_idx(ev):
    """30-min-gap session boundaries: adds ``session_idx`` within each
    user partition (lag + running sum of boundary flags). ONE
    definition shared by rel_sessionize_events and
    rel_interval_overlap so the gap rule / tie-break ordering cannot
    silently desynchronize between the two entries' sessions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.unix_millis(F.lag("ts").over(w))
    flag = F.when(
        prev_ms.isNull() | (F.unix_millis("ts") - prev_ms > _SESSION_GAP_MS), 1
    ).otherwise(0)
    return ev.withColumn(
        "session_idx",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


@query(
    "rel_sessionize_events",
    sql=f"""
    WITH base AS (
      SELECT user_id, event_id, ts, value, epoch_ms(ts) AS ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > {_SESSION_GAP_MS}
                     THEN 1 ELSE 0 END AS s_flag
      FROM base
    ), sess AS (
      SELECT *, sum(s_flag) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS session_idx
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY 1, 2
    """,
)
def rel_sessionize_events(spark, sf_dir):
    """Batch sessionization: split each user's event stream on >30 min
    silence gaps (lag + running sum of boundary flags), then one
    aggregate per session. The window shuffle on user_id is the only
    exchange — the session aggregate groups by (user_id, session_idx),
    which is produced inside the user partitions, so Catalyst reuses
    the partitioning instead of re-shuffling."""
    ev = T(spark, sf_dir, "events")
    sess = _with_session_idx(ev)
    return sess.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_idx").cast("long").alias("session_idx"),
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_HIST_BINS = 20


@query(
    "stat_histogram_prices",
    sql=f"""
    WITH scal AS (
      SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
             CAST(max(l_extendedprice) AS DOUBLE) AS hi
      FROM lineitem
    ), binned AS (
      SELECT CASE WHEN s.hi = s.lo THEN 0
                  ELSE least({_HIST_BINS - 1}, CAST(floor(
                    (CAST(l_extendedprice AS DOUBLE) - s.lo) / ((s.hi - s.lo) / {_HIST_BINS}.0)
                  ) AS BIGINT)) END AS bin,
             s.lo, s.hi
      FROM lineitem CROSS JOIN scal s
    )
    SELECT bin,
           round(min(lo) + bin * ((min(hi) - min(lo)) / {_HIST_BINS}.0), 2) AS bin_lo,
           round(min(lo) + (bin + 1) * ((min(hi) - min(lo)) / {_HIST_BINS}.0), 2) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY 1
    """,
)
def stat_histogram_prices(spark, sf_dir):
    """Equi-width 20-bin histogram of l_extendedprice. Global
    min/max ride a 1-row scalar broadcast into a pure projection —
    the fact table is scanned once, never shuffled; the groupBy
    output is at most 20 rows. (This is the data-profiling pass that
    sizes the bins of a real AQE-style stats collector.)"""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    scal = li.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / float(_HIST_BINS)
    # hi == lo (all values equal) would make the bin NaN on the Spark
    # side and NULL in DuckDB; degenerate answer = single bin 0
    binned = li.crossJoin(F.broadcast(scal)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.lit(_HIST_BINS - 1),
                F.floor((F.col("x") - F.col("lo")) / width).cast("long"),
            )
        )
        .alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin").agg(
        F.round(F.min("lo") + F.col("bin") * ((F.min("hi") - F.min("lo")) / float(_HIST_BINS)), 2).alias("bin_lo"),
        F.round(F.min("lo") + (F.col("bin") + 1) * ((F.min("hi") - F.min("lo")) / float(_HIST_BINS)), 2).alias("bin_hi"),
        F.count("*").cast("long").alias("n"),
    )


_Z_THRESHOLD = 3.0


@query(
    "stat_outliers_zscore",
    sql=f"""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sigma) > {_Z_THRESHOLD}
    """,
)
def stat_outliers_zscore(spark, sf_dir):
    """Per-event-type z-score outliers (|z| > 3): group statistics
    (few rows) broadcast back onto the fact scan — one aggregate
    shuffle for the stats, zero shuffles for the probe. The
    threshold compare runs on the raw double (both engines compute
    (x−μ)/σ from identically-aggregated μ,σ); the emitted z is
    rounded for the value-hash."""
    ev = T(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > _Z_THRESHOLD)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )


@query(
    "rel_scd2_intervals",
    sql="""
    WITH snap AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), dedup AS (SELECT user_id, ts, value FROM snap WHERE rn = 1)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           round(value, 2) AS value,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS is_current
    FROM dedup
    """,
)
def rel_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: each user's purchase
    updates become [valid_from, valid_to) intervals via lead() —
    open-ended (NULL valid_to) marks the current version. Ties at
    the same timestamp resolve to the highest event_id (latest
    writer wins), mirrored exactly in the oracle. One window shuffle
    on user_id; the interval table then serves as-of joins
    (rel_asof_join) without re-sorting. This is the warehouse CDC
    pattern: appends in, temporal dimension out."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    wded = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    dedup = (
        ev.withColumn("rn", F.row_number().over(wded))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    lead_ts = F.lead("ts").over(w)
    return dedup.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").alias("valid_from"),
        lead_ts.alias("valid_to"),
        F.round("value", 2).alias("value"),
        lead_ts.isNull().alias("is_current"),
    )


@query(
    "dq_expectations",
    sql="""
    SELECT 'orders_custkey_not_null' AS check_name,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'orders_orderkey_unique',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_in_customer',
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events_ts_in_range',
           CAST(count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-01'
                                    OR ts >= TIMESTAMP '2025-01-01') AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM events
    """,
)
def dq_expectations(spark, sf_dir):
    """Data-quality expectation suite — the validation pass a
    pipeline runs before publishing a partition: null checks, key
    uniqueness, referential integrity (anti-join shaped as a
    left-join count), domain ranges. Each check is one conditional
    aggregate over one scan (the FK check broadcasts the dim); the
    whole suite is a union of 5 tiny result rows. At 100 TB these
    run as cheap piggyback aggregates on data already being
    written."""
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    li = T(spark, sf_dir, "lineitem")
    ev = T(spark, sf_dir, "events")

    def check(name, df, viol_cond):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count_if(viol_cond).cast("long").alias("n_violations"),
            F.count("*").cast("long").alias("n_checked"),
        )

    c1 = check("orders_custkey_not_null", orders, F.col("o_custkey").isNull())
    c2 = orders.agg(
        F.lit("orders_orderkey_unique").alias("check_name"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("n_violations"),
        F.count("*").cast("long").alias("n_checked"),
    )
    c3 = check(
        "orders_custkey_in_customer",
        # customer scales with SF: no broadcast hint, AQE decides
        orders.join(cust.select("c_custkey"),
                    orders.o_custkey == F.col("c_custkey"), "left"),
        F.col("c_custkey").isNull(),
    )
    c4 = check("lineitem_qty_positive", li, F.col("l_quantity") <= 0)
    c5 = check(
        "events_ts_in_range",
        ev,
        (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
        | (F.col("ts") >= F.lit("2025-01-01").cast("timestamp")),
    )
    return c1.unionAll(c2).unionAll(c3).unionAll(c4).unionAll(c5)


@query(
    "dq_anomaly",
    sql="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS ss
      FROM daily GROUP BY 1
    )
    SELECT dd.event_type, dd.d, dd.n,
           (dd.n * st.k - st.s) * (dd.n * st.k - st.s) * (st.k - 1)
             > 4 * st.k * (st.k * st.ss - st.s * st.s) AS is_anomaly
    FROM daily dd JOIN stats st USING (event_type)
    """,
)
def dq_anomaly(spark, sf_dir):
    """Volume-anomaly flags: for each (event_type, day), is the
    event count more than 2 sample standard deviations from that
    type's daily mean — the monitoring pass that catches a broken
    producer or a backfill double-write before publishing.

    The |z| > 2 test is evaluated in EXACT integer arithmetic — with
    k days, S = Σn, SS = Σn²:  (n·k − S)²·(k−1) > 4·k·(k·SS − S²)
    is z² > 4 with every denominator multiplied out — so both
    engines compare identical integers and the flag can never flip
    on float summation order (stddev_samp would drift).

    Exactness domain: the multiplied-out terms stay inside int64 for
    daily counts up to ~2³⁰ per (type, day) at k=366 (k²·Σn² < 2⁶³)
    — ample for per-type DAILY partitions even at 100 TB overall,
    since the hot dimension is types × days, not rows. Beyond that,
    ANSI mode fails loudly (no silent wrap); the remedy at such
    volumes is coarser counting units (e.g. thousands), not floats.
    Scale shape: one (event_type, day) aggregate (map-side
    combined), a per-type 1-row stats aggregate broadcast back onto
    it; k-day state per type, never data-sized."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count("*").cast("long").alias("n"))
    )
    stats = daily.groupBy(F.col("event_type").alias("st_et")).agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    dev = F.col("n") * F.col("k") - F.col("s")
    return (
        daily.join(
            F.broadcast(stats), F.col("event_type") == F.col("st_et")
        )
        .select(
            "event_type",
            "d",
            "n",
            (
                dev * dev * (F.col("k") - 1)
                > 4 * F.col("k") * (F.col("k") * F.col("ss") - F.col("s") * F.col("s"))
            ).alias("is_anomaly"),
        )
    )


@query(
    "rel_funnel_steps",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY 1
    )
    SELECT '1_view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT '2_click_after_view', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT '3_purchase_after_click', CAST((SELECT count(*) FROM p) AS BIGINT)
    """,
)
def rel_funnel_steps(spark, sf_dir):
    """Conversion funnel (view → click → purchase, order-respecting):
    per user, the first view, the first click at-or-after it, and the
    first purchase at-or-after that; output = users completing each
    prefix. Every stage is keyed on user_id, so at scale one shuffle
    partitioning carries all three aggregate+join rounds (the
    per-user firsts are tiny relative to the event log — AQE
    broadcast-converts them when they fit).

    The step frames v and c are persisted because each feeds BOTH the
    next step's join and the final count: unpersisted, the v subtree
    executes once per funnel level (3× scans and aggregates — the
    shape this entry benched at 2.1 s before the rewrite). The three
    counts come from ONE left-join chain (p ⊆ c ⊆ v, so count(t2)/
    count(t3) over the join are exactly |c|/|p|) stacked into rows,
    instead of three separate aggregate jobs."""
    from lol_data_pipeline_spark.caching import tracked_persist

    ev = T(spark, sf_dir, "events")

    def first_at_or_after(etype, prev, prev_ts, alias):
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is None:
            base = e
        else:
            base = e.join(prev, "user_id").filter(F.col("ts") >= F.col(prev_ts))
        return base.groupBy("user_id").agg(F.min("ts").alias(alias))

    v = tracked_persist(first_at_or_after("view", None, None, "t1"))
    c = tracked_persist(first_at_or_after("click", v, "t1", "t2"))
    p = first_at_or_after("purchase", c, "t2", "t3")

    counts = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("*").alias("n1"),
            F.count("t2").alias("n2"),
            F.count("t3").alias("n3"),
        )
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', CAST(n1 AS BIGINT),"
            " '2_click_after_view', CAST(n2 AS BIGINT),"
            " '3_purchase_after_click', CAST(n3 AS BIGINT)) AS (step, n_users)"
        )
    )


@query(
    "rel_retention_cohort",
    sql="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY 1
    )
    SELECT f.cohort_date,
           CAST(datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS INTEGER)
               AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_seen f USING (user_id)
    WHERE datediff('day', f.cohort_date, CAST(e.ts AS DATE)) <= 6
    GROUP BY 1, 2
    """,
)
def rel_retention_cohort(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen date,
    counted distinct on each of their first 7 activity days — the
    standard D0..D6 retention report. Two shuffles total (first-seen
    aggregate, then the distinct count on (cohort, offset)); the
    first-seen table joins back on user_id, the same key as the
    aggregate that produced it, so the exchange is reused."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    offs = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff("d", "cohort_date").cast("int").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 6)
    )
    return offs.groupBy("cohort_date", "day_offset").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )


@query(
    "rel_gap_fill_locf",
    sql="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n,
             CAST(floor(CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
                        / count(*) + 0.5) AS BIGINT) / CAST(10000 AS DOUBLE) AS avg_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
    ), spine AS (
      SELECT t.event_type, g.h AS hour_ts
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g
    )
    SELECT s.event_type, s.hour_ts,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
           h.avg_value,
           last_value(h.avg_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg
    FROM spine s LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
    """,
)
def rel_gap_fill_locf(spark, sf_dir):
    """Time-series gap filling + last-observation-carried-forward —
    the hypertable `time_bucket_gapfill` / `locf` pattern: a dense
    hourly spine per event_type (generated, not stored), left-joined
    to the hourly aggregate, missing hours filled with the latest
    preceding observation.

    Plan shape: the fact table collapses to hourly grain FIRST (one
    partial-agg shuffle on (type, hour)); the spine is
    sequence+explode over a 1-row broadcast min/max scalar — its
    cardinality is |types| × calendar-hours, bounded by wall-clock
    time, not by data volume, so at 100 TB the join's build side is
    still tiny and the LOCF window runs over spine rows only. The
    window partitions by event_type: fine while each type's hour
    count (years ≈ 10⁴–10⁵ rows) fits a partition — for a
    multi-decade spine you'd segment the window by (type, year) and
    carry the year-boundary value forward with a second tiny join.
    avg_value is rounded BEFORE the LOCF fill so both engines carry
    bit-identical values through the window."""
    ev = T(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts"), "value"
    )
    # fixed-point mean: per-row value*1e4 snaps to an exact BIGINT,
    # the sum is exact, and the final divide is one deterministic
    # float op — a plain round(avg(),4) drifted by 1 ulp across the
    # 4-dp boundary at sf0.1 (3 rows in the full-registry sweep)
    # because float summation order differs between engines. The
    # per-row snap AND the final 4-dp snap are floor(x + 0.5), NOT
    # round(): the engines disagree on double round()'s .5 tie
    # direction (Spark half-up, DuckDB half-even) — with exact
    # integer sums the mean lands on EXACT .5 ties (s/n = 472537.5
    # in the sf0.1 sweep), so the tie rule must be spelled out.
    hourly = ev.groupBy("event_type", "hour_ts").agg(
        F.count("*").cast("long").alias("n"),
        F.expr(
            "CAST(floor(CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)"
            " / count(*) + 0.5) AS BIGINT) / CAST(10000 AS DOUBLE)"
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min(F.col("hour_ts"))).alias("lo"),
        F.date_trunc("hour", F.max(F.col("hour_ts"))).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour_ts"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "hour_ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("locf_avg"),
    )


@query(
    "stat_corr_matrix",
    sql="""
    WITH s AS (
      SELECT round(corr(l_quantity, l_extendedprice), 4) AS c_qty_price,
             round(corr(l_quantity, l_discount), 4) AS c_qty_disc,
             round(corr(l_quantity, l_tax), 4) AS c_qty_tax,
             round(corr(l_extendedprice, l_discount), 4) AS c_price_disc,
             round(corr(l_extendedprice, l_tax), 4) AS c_price_tax,
             round(corr(l_discount, l_tax), 4) AS c_disc_tax
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, c_qty_price AS corr FROM s
    UNION ALL SELECT 'l_quantity', 'l_discount', c_qty_disc FROM s
    UNION ALL SELECT 'l_quantity', 'l_tax', c_qty_tax FROM s
    UNION ALL SELECT 'l_extendedprice', 'l_discount', c_price_disc FROM s
    UNION ALL SELECT 'l_extendedprice', 'l_tax', c_price_tax FROM s
    UNION ALL SELECT 'l_discount', 'l_tax', c_disc_tax FROM s
    """,
)
def stat_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the four lineitem
    measures — the feature-correlation profiling pass. ALL six
    coefficients come out of ONE aggregate over ONE scan (each
    F.corr keeps a 6-double co-moment state; partials merge
    associatively), then the 1-row result is unpivoted driver-free
    with a stack() generator into tidy (col_a, col_b, corr) rows.
    Never N scans, never a driver loop over column pairs; at 100 TB
    this is one pass regardless of how many pairs are requested
    (state is O(pairs), not O(data)). Rounded to 4 dp so partial-
    merge float ordering can't flip the last digit vs the oracle."""
    li = T(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
        ("l_discount", "l_tax"),
    ]
    one = li.agg(
        *[F.round(F.corr(a, b), 4).alias(f"c{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack_args = ", ".join(f"'{a}', '{b}', c{i}" for i, (a, b) in enumerate(pairs))
    return one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
    )


@query(
    "stat_mad_outliers",
    sql="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_type, e.value, m.med, round(abs(e.value - m.med), 6) AS ad
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           max(d.med) AS med,
           max(m.mad) AS mad,
           CAST(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def stat_mad_outliers(spark, sf_dir):
    """Robust outlier profiling: per-type median / median-absolute-
    deviation and the count of |x − med| > 3·MAD rows — the
    heavy-tail-safe complement of `stat_outliers_zscore` (one wild
    value inflates μ/σ and hides itself; the median/MAD pair is
    50%-breakdown robust).

    Exact medians buffer each group's values in the aggregate — the
    honest cost of EXACT order statistics, bounded here by per-type
    event volume. This is the oracle-checkable shape; at 100 TB the
    same report runs on `sketch_quantile_hist`'s mergeable fixed-bin
    histogram (O(bins) state, rank-error ≤ bin width) — the sketch
    IS this query's scale path, the exact form is its ground truth.
    Both percentile passes reuse the same per-type partitioning; the
    tiny med/mad tables broadcast back onto the fact scan, which is
    read twice (med pass, then dev/flag pass) and shuffled never.
    med / ad / mad are rounded to 6 dp BEFORE the ad > 3·mad flag —
    Spark's percentile() and DuckDB's quantile_cont could disagree
    in the last ulp of the interpolation, and an unrounded boundary
    comparison would let that flip n_outliers by one."""
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.round(F.abs(F.col("value") - F.col("med")), 6)
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum((F.col("ad") > 3 * F.col("mad")).cast("int")).cast("long").alias("n_outliers"),
            F.count("*").cast("long").alias("n"),
        )
    )


@query(
    "dq_referential_integrity",
    sql="""
    SELECT 'lineitem->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Foreign-key orphan audit across the star schema — the
    join-health check a pipeline runs before trusting any downstream
    join (an orphaned FK silently drops rows from every inner join
    built on it). Each constraint is one LEFT ANTI join (the
    child's FK column only — column pruning cuts the scan to one
    int64) counted; the three results union into a tiny report.

    At 100 TB: each constraint is one left join on (key) pairs —
    total and orphan counts come out of the SAME pass (count(*) +
    count-of-null-parent), so the child is scanned once per
    constraint, not twice; the dim-sided constraints
    (customer→nation) broadcast the parent. The whole report is one
    lazy plan (a union of three 1-row aggregates) — no driver-side
    count() actions."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")

    def audit(child, key, parent, pkey, name):
        pk = parent.select(F.col(pkey).alias("__pk")).distinct()
        return (
            child.join(pk, child[key] == F.col("__pk"), "left")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col("__pk").isNull().cast("int")).cast("long").alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        )

    return (
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(audit(o.select("o_custkey"), "o_custkey", c, "c_custkey", "orders->customer"))
        .unionByName(
            audit(c.select("c_nationkey"), "c_nationkey", F.broadcast(n), "n_nationkey", "customer->nation")
        )
    )


@query(
    "rel_cdc_upsert",
    sql="""
    WITH changes AS (
      SELECT o_custkey AS custkey,
             round(sum(o_totalprice), 2) AS new_spend,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT c.c_custkey,
           c.c_name,
           CASE WHEN ch.custkey IS NOT NULL THEN 'updated' ELSE 'unchanged' END AS merge_action,
           round(coalesce(ch.new_spend, 0.0) + c.c_acctbal, 2) AS acct_total,
           CAST(coalesce(ch.n_orders, 0) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN changes ch ON ch.custkey = c.c_custkey
    """,
)
def rel_cdc_upsert(spark, sf_dir):
    """CDC MERGE/upsert semantics batch-style: a deterministic change
    set (per-customer finished-order totals) applied onto the
    customer dimension — matched rows get 'updated' values, the rest
    pass through 'unchanged', exactly the WHEN MATCHED / WHEN NOT
    MATCHED split of a lakehouse MERGE INTO. One equi-join on the
    target's key carries the whole merge; the action tag makes the
    matched/unmatched partition of the output auditable.

    At 100 TB the physical form is `write_overwrite(...,
    partition_by=...)` applied to only the partitions the change set
    touches (dynamic partition overwrite — proven plan-level in
    tests/test_plan_hygiene.py::test_dynamic_partition_upsert); this
    entry pins the MERGE's row-level semantics, which stay identical
    whether the sink rewrites a table or three partitions."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    changes = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("new_spend"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    return c.join(changes, c.c_custkey == changes.custkey, "left").select(
        "c_custkey",
        "c_name",
        F.when(F.col("custkey").isNotNull(), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("merge_action"),
        F.round(F.coalesce(F.col("new_spend"), F.lit(0.0)) + F.col("c_acctbal"), 2).alias(
            "acct_total"
        ),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )


# Two-sample CDF drift: compare value distributions between event
# types at a fixed 20-point grid derived from the global min/max.
# The grid formula text is SHARED between the Spark expression and
# the DuckDB oracle so both engines evaluate identical IEEE doubles.
# The LAST cut is the literal max: mn + (mx-mn)*20/20.0 can round a
# hair BELOW mx in IEEE arithmetic, silently dropping max-valued rows
# from the final CDF point (caught by the hypothesis property test —
# a group without the global max would then show phantom 1/n drift).
_KS_CUTS = 20
_KS_CUT_SQL = (
    "CASE WHEN {i} = " + str(_KS_CUTS)
    + " THEN mx ELSE mn + (mx - mn) * {i} / " + f"{_KS_CUTS}.0 END"
)


def _ks_cut(i: int) -> str:
    return _KS_CUT_SQL.format(i=i)


def _grid_counts(ev):
    """Per-group fixed-grid cumulative counts (event_type, n,
    c1..c20) over (event_type, value) — ONE scan, constant per-group
    state. Shared DEFINITION for stat_ks_drift and stat_psi_drift
    (same grid, same counters); each registry entry still executes
    its own scan — a caller wanting one physical pass computes this
    frame once, persists it, and derives both reports from it."""
    scal = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    return (
        ev.join(F.broadcast(scal))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            *[
                F.sum(
                    F.expr(f"CASE WHEN value <= {_ks_cut(i)} THEN 1 ELSE 0 END")
                ).alias(f"c{i}")
                for i in range(1, _KS_CUTS + 1)
            ],
        )
    )


@query(
    "stat_ks_drift",
    sql=f"""
    WITH scal AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    cuts AS (
      SELECT i, {_KS_CUT_SQL.format(i="i")} AS cut
      FROM range(1, {_KS_CUTS + 1}) t(i), scal
    ),
    cdf AS (
      SELECT event_type, i,
             CAST(sum(CASE WHEN value <= cut THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS cdf,
             CAST(count(*) AS BIGINT) AS n
      FROM events CROSS JOIN cuts
      GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a,
           b.event_type AS type_b,
           max(a.n) AS n_a,
           max(b.n) AS n_b,
           CAST(floor((max(abs(a.cdf - b.cdf))) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS ks_stat
    FROM cdf a JOIN cdf b ON a.i = b.i AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def stat_ks_drift(spark, sf_dir):
    """Distribution-drift detection: a Kolmogorov–Smirnov-style
    statistic between every pair of event types, evaluated at a
    FIXED 20-point grid instead of the full empirical CDF.

    The textbook KS statistic sup|F_a − F_b| needs a global sort of
    both samples — a scale-killer. The grid form needs exactly ONE
    scan: a 1-row min/max scalar broadcast, then 20 conditional
    counts per group in a single hash aggregate (20 longs of state
    per group, independent of data size), then all comparisons
    happen on a (groups × 20)-row table. Rank error vs the exact
    statistic is bounded by the largest CDF jump inside one grid
    cell — the standard sketch trade (same argument as
    sketch_quantile_hist). Counts are exact integers, so cdf =
    count/n is a deterministic double in both engines; the grid
    formula text is shared verbatim with the oracle.

    At 100 TB this is THE feasible drift monitor: one pass, 20
    counters per group, no sort, no sample collection. No reference
    parity — north-star data-quality extension (SURVEY §7 M3)."""
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    wide = _grid_counts(ev)
    stack_args = ", ".join(
        f"{i}, CAST(c{i} AS DOUBLE) / n" for i in range(1, _KS_CUTS + 1)
    )
    cdf = wide.select(
        "event_type",
        "n",
        F.expr(f"stack({_KS_CUTS}, {stack_args}) AS (i, cdf)"),
    )
    a = cdf.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("i").alias("ia"),
        F.col("cdf").alias("cdf_a"),
    )
    b = cdf.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("i").alias("ib"),
        F.col("cdf").alias("cdf_b"),
    )
    return (
        a.join(b, (F.col("ia") == F.col("ib")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.expr(
                "CAST(floor((max(abs(cdf_a - cdf_b))) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE)"
            ).alias("ks_stat"),
        )
    )


# OLS combination formulas, single-sourced so the Spark expressions
# and the oracle SQL cannot drift. Degenerate groups (all x equal →
# dxx = 0; all y equal → dyy = 0) are explicit NULLs on BOTH sides:
# relying on x/0 → NULL is a non-ANSI Spark behavior that DuckDB 1.1+
# no longer shares (IEEE inf/NaN became its default).
_LR_NUM = "CAST(n * sxy - sx * sy AS DOUBLE)"
_LR_DXX = "CAST(n * sxx - sx * sx AS DOUBLE)"
_LR_DYY = "CAST(n * syy - sy * sy AS DOUBLE)"
_LR_SLOPE = f"CASE WHEN {_LR_DXX} = 0 THEN NULL ELSE CAST(floor(({_LR_NUM} / {_LR_DXX}) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) END"
_LR_INTERCEPT = (
    f"CASE WHEN {_LR_DXX} = 0 THEN NULL ELSE "
    f"CAST(floor(((CAST(sy AS DOUBLE) - ({_LR_NUM} / {_LR_DXX}) * CAST(sx AS DOUBLE)) / n) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) END"
)
_LR_R2 = (
    f"CASE WHEN {_LR_DXX} = 0 OR {_LR_DYY} = 0 THEN NULL ELSE "
    f"CAST(floor(({_LR_NUM} * {_LR_NUM} / ({_LR_DXX} * {_LR_DYY})) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) END"
)


@query(
    "stat_linreg_hourly",
    sql=f"""
    WITH base AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    suff AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM base GROUP BY 1
    )
    SELECT event_type, n,
           {_LR_SLOPE} AS slope_cents,
           {_LR_INTERCEPT} AS intercept_cents,
           {_LR_R2} AS r2
    FROM suff
    """,
)
def stat_linreg_hourly(spark, sf_dir):
    """Per-group ordinary least squares (value vs hour-of-day) from
    sufficient statistics — the one-pass closed form: slope =
    (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), plus intercept and r².

    Determinism is the whole design: x is a small integer and y is
    fixed-point cents (round(value·100) as BIGINT), so all six
    sufficient statistics are EXACT integer sums — immune to
    float-summation order, hence identical under any partitioning
    and in both engines. Floats appear only in the final per-group
    combination, written as the same expression text on both sides.

    At 100 TB: one scan, one hash aggregate with 6 longs of state
    per group — the same mergeable-sufficient-statistics pattern as
    stat_corr_matrix, and the template for any moment-based model
    fit (the int64 sums hold to ~10¹⁴ rows per group at these
    magnitudes; beyond that the same shape runs on DECIMAL(38)).
    No reference parity — north-star profiling extension."""
    ev = T(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
    )
    suff = base.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return suff.select(
        "event_type",
        "n",
        F.expr(_LR_SLOPE).alias("slope_cents"),
        F.expr(_LR_INTERCEPT).alias("intercept_cents"),
        F.expr(_LR_R2).alias("r2"),
    )


@query(
    "rel_skyline_parts",
    sql="""
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def rel_skyline_parts(spark, sf_dir):
    """Pareto frontier (skyline) over part: minimize p_retailprice
    while maximizing p_size — rows no other row dominates.

    The naive plan is an all-pairs NOT EXISTS (quadratic). The
    scale-safe shape is two-phase bucket pruning:

    1. bucket parts into 32 price bands (1-row min/max scalar
       broadcast; bucket index is monotone in price, so a row in a
       strictly lower band is strictly cheaper),
    2. per-band max size (≤32 rows) → prefix-max over strictly
       cheaper bands (32×32 driver-free self-join), broadcast back:
       any row whose size ≤ the cheaper-prefix max is dominated by
       SOME strictly-cheaper row and is pruned without ever being
       compared pairwise,
    3. the surviving candidates hug the frontier staircase (a
       vanishing fraction of the data — pruning removed everything
       strictly inside it), so the exact dominance anti-join runs
       on candidates × candidates via broadcast, never data × data.

    Pruning is sound: it only drops rows with a strict dominator, so
    the skyline survives intact and the oracle can stay the plain
    NOT EXISTS form. Degenerate guard: if every price is identical
    all rows land in one band and the plan degrades to exact-only —
    correct, and the band count (or a second dimension grid) is the
    tuning knob. No reference parity — north-star analytic."""
    p = T(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    scal = p.agg(F.min("p_retailprice").alias("mn"), F.max("p_retailprice").alias("mx"))
    bucket_sql = (
        "least(31, greatest(0, CAST(floor((p_retailprice - mn) * 32.0 / (mx - mn + 1e-9)) AS INT)))"
    )
    banded = p.join(F.broadcast(scal)).withColumn("b", F.expr(bucket_sql))
    bmax = banded.groupBy("b").agg(F.max("p_size").alias("bmax"))
    lower = bmax.select(F.col("b").alias("lb"), F.col("bmax").alias("lmax"))
    pm = (
        bmax.join(lower, F.col("lb") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.max("lmax").alias("pmax"))
    )
    cand = (
        banded.join(F.broadcast(pm), "b")
        .filter(F.col("pmax").isNull() | (F.col("p_size") > F.col("pmax")))
        .select("p_partkey", "p_size", "p_retailprice")
    )
    from lol_data_pipeline_spark.caching import tracked_persist

    cand = tracked_persist(cand)
    q = cand.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") > F.col("p_size")))
    )
    return cand.join(F.broadcast(q), dominated, "left_anti")


@query(
    "rel_rolling_wau",
    sql="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    spine AS (SELECT DISTINCT day FROM du),
    rolled AS (
      SELECT s.day AS report_day, du.user_id
      FROM spine s JOIN du ON du.day BETWEEN s.day - 6 AND s.day
    ),
    wau AS (
      SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM rolled GROUP BY 1
    ),
    dau AS (
      SELECT day AS report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM du GROUP BY 1
    )
    SELECT d.report_day, d.dau, w.wau,
           CAST(floor((CAST(d.dau AS DOUBLE) / w.wau) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w ON d.report_day = w.report_day
    """,
)
def rel_rolling_wau(spark, sf_dir):
    """Rolling 7-day distinct users (WAU) per day, plus DAU and the
    DAU/WAU stickiness ratio — the canonical engagement dashboard
    query, and the shape every "rolling distinct" metric takes.

    Spark has no COUNT(DISTINCT) OVER a range frame, and a
    range-join against raw events would re-scan the fact 7×. The
    scale-safe form collapses FIRST: events → distinct (day, user)
    pairs (one shuffle, map-side combine absorbs the per-day event
    volume — the output is active-pairs-sized, not events-sized),
    then each pair is exploded to the ≤7 report days it serves
    (bounded fan-out, a projection) and semi-joined to observed
    days, then ONE distinct-count per report day. Total: two keyed
    shuffles over active-pairs-sized data, never an events-sized
    range join. The same template computes rolling 28-day MAU by
    widening the sequence. No reference parity — north-star
    behavioral extension (SURVEY §7 M3)."""
    ev = T(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct().withColumnRenamed("day", "report_day")
    rolled = (
        du.withColumn("o", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("report_day", F.expr("date_add(day, o)"))
        .join(spine, "report_day")
    )
    wau = rolled.groupBy("report_day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    dau = du.groupBy(F.col("day").alias("report_day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    return dau.join(wau, "report_day").select(
        "report_day",
        "dau",
        "wau",
        F.expr("CAST(floor((CAST(dau AS DOUBLE) / wau) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE)").alias("stickiness"),
    )


@query(
    "stat_entropy_daily",
    sql="""
    WITH counts AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT day, sum(c) AS n FROM counts GROUP BY 1),
    terms AS (
      SELECT c.day, t.n,
             CAST(round((CAST(c.c AS DOUBLE) / t.n)
                        * ln(CAST(c.c AS DOUBLE) / t.n) * 1000000000) AS BIGINT) AS term_e9
      FROM counts c JOIN tot t ON c.day = t.day
    )
    SELECT day, CAST(max(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(floor((-CAST(sum(term_e9) AS DOUBLE) / CAST(1000000000 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS entropy_nats
    FROM terms GROUP BY 1
    """,
)
def stat_entropy_daily(spark, sf_dir):
    """Shannon entropy of the daily event-type mix — the behavioral
    diversity monitor (a day whose traffic collapses onto one event
    type drops to ~0 nats; uniform mix over k types scores ln k).
    Pairs with stat_ks_drift as the pipeline's drift dashboard: KS
    watches value distributions, this watches categorical mixes.

    Two stacked aggregates sharing the day partitioning (per-(day,
    type) counts, then per-day totals — the second groupBy reuses
    the first shuffle's keys); each −p·ln p term is frozen to
    fixed-point nano-nats BEFORE the per-day sum, so the entropy is
    an exact-integer aggregate — deterministic under any
    partitioning and identical across engines. Per-day state is one
    counter per observed type (bounded by the type vocabulary, not
    by events). No reference parity — north-star data-quality
    extension."""
    ev = T(spark, sf_dir, "events")
    counts = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = counts.groupBy("day").agg(F.sum("c").alias("n"))
    terms = counts.join(tot, "day").select(
        "day",
        "n",
        F.expr(
            "CAST(round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)"
            " * 1000000000) AS BIGINT)"
        ).alias("term_e9"),
    )
    return terms.groupBy("day").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.expr(
            "CAST(floor((-CAST(sum(term_e9) AS DOUBLE) / CAST(1000000000 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE)"
        ).alias("entropy_nats"),
    )


@query(
    "rel_interval_overlap",
    sql=f"""
    WITH base AS (
      SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > {_SESSION_GAP_MS}
                     THEN 1 ELSE 0 END AS s_flag
      FROM base
    ), sess AS (
      SELECT *, sum(s_flag) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS session_idx
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_idx, min(ts) AS s_start, max(ts) AS s_end
      FROM sess GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    win AS (
      SELECT day,
             CAST(day AS TIMESTAMP) + INTERVAL 2 HOUR AS w_start,
             CAST(day AS TIMESTAMP) + INTERVAL 4 HOUR AS w_end
      FROM days
    )
    SELECT w.day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
           CAST(sum(epoch_ms(least(s.s_end, w.w_end))
                    - epoch_ms(greatest(s.s_start, w.w_start))) AS BIGINT) AS overlap_ms
    FROM win w JOIN sessions s
      ON s.s_start <= w.w_end AND s.s_end >= w.w_start
    GROUP BY 1
    """,
)
def rel_interval_overlap(spark, sf_dir):
    """Interval-overlap join WITHOUT a shared equi-key: user sessions
    (derived by the same 30-min-gap sessionization as
    rel_sessionize_events) against daily 02:00–04:00 maintenance
    windows — which sessions were live during each window, and for
    how long.

    rel_range_join's trick (equi-key carries the shuffle, range
    predicate rides inside the join) needs a shared key; a pure
    overlap join has none, and the naive form is a cartesian with an
    inequality filter — the classic scale-killer. The scale-safe
    manufacture: BUCKET time by day on both sides. Each session
    explodes to the calendar days it touches (fan-out bounded by
    interval length / bucket width — here ≤2 for sub-day sessions),
    windows carry their own day, and the join becomes an EQUI-join
    on day with the exact overlap predicate evaluated only within a
    bucket. A window's day is unique, so bucketing cannot duplicate
    a (session, window) pair. Overlap duration sums exact epoch-ms
    integers — deterministic. Same pattern at any scale: pick the
    bucket width ~ the p99 interval length. No reference parity —
    north-star relational extension (SURVEY §7 M3)."""
    return _overlap_report(T(spark, sf_dir, "events"))


def _overlap_report(ev):
    """The rel_interval_overlap plan body over an arbitrary events
    frame (user_id, event_id, ts, ...) — extracted so the property
    test can drive it with random midnight-crossing/multi-day
    sessions and compare against brute force."""
    # project to the three session-defining columns BEFORE the window:
    # the user_id shuffle is this entry's only data-sized exchange and
    # must not carry event_type/value/props bytes it never reads
    sess = _with_session_idx(ev.select("user_id", "event_id", "ts"))
    sessions = sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    win = days.select(
        "day",
        F.expr("CAST(day AS TIMESTAMP) + INTERVAL 2 HOUR").alias("w_start"),
        F.expr("CAST(day AS TIMESTAMP) + INTERVAL 4 HOUR").alias("w_end"),
    )
    bucketed = sessions.withColumn(
        "day", F.explode(F.sequence(F.to_date("s_start"), F.to_date("s_end")))
    )
    joined = bucketed.join(F.broadcast(win), "day").filter(
        (F.col("s_start") <= F.col("w_end")) & (F.col("s_end") >= F.col("w_start"))
    )
    return joined.groupBy("day").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(
            F.unix_millis(F.least("s_end", "w_end"))
            - F.unix_millis(F.greatest("s_start", "w_start"))
        ).cast("long").alias("overlap_ms"),
    )


# PSI bin-term formula text, shared verbatim with the oracle. p's are
# clamped at 1e-6 (scientific notation parses as DOUBLE in both
# engines — a bare decimal literal would be DECIMAL in Spark) so
# empty bins contribute a finite term instead of ±inf; each term is
# frozen to fixed-point nano-units BEFORE the sum so the aggregate is
# an exact integer on both engines.
_PSI_P = "greatest(CAST({b} AS DOUBLE) / {n}, 1e-6)"
_PSI_TERM = (
    "CAST(round(({pa} - {pb}) * ln({pa} / {pb}) * 1000000000) AS BIGINT)"
).format(
    pa=_PSI_P.format(b="bin_a", n="n_a"),
    pb=_PSI_P.format(b="bin_b", n="n_b"),
)


@query(
    "stat_psi_drift",
    sql=f"""
    WITH scal AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    cuts AS (
      SELECT i, {_KS_CUT_SQL.format(i="i")} AS cut
      FROM range(1, {_KS_CUTS + 1}) t(i), scal
    ),
    cum AS (
      SELECT event_type, i,
             CAST(sum(CASE WHEN value <= cut THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM events CROSS JOIN cuts
      GROUP BY 1, 2
    ),
    bins AS (
      SELECT event_type, i, n,
             c - coalesce(lag(c) OVER (PARTITION BY event_type ORDER BY i), 0) AS b
      FROM cum
    ),
    terms AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS n_a, b.n AS n_b,
             a.b AS bin_a, b.b AS bin_b
      FROM bins a JOIN bins b
        ON a.i = b.i AND a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(floor((CAST(sum({_PSI_TERM}) AS DOUBLE) / CAST(1000000000 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS psi
    FROM terms GROUP BY 1, 2
    """,
)
def stat_psi_drift(spark, sf_dir):
    """Population Stability Index between every pair of event types
    over the SAME fixed 20-bin grid as stat_ks_drift: PSI =
    Σ_bins (p_a − p_b)·ln(p_a/p_b). The industry-standard drift score
    (credit-risk monitoring's >0.25 = "significant shift" rule) —
    where KS reports the worst single point of CDF divergence, PSI
    integrates divergence across ALL bins, so broad small shifts that
    never produce one big CDF gap still register.

    Same scale posture as its sibling: one scan, 20 counters per
    group (the _grid_counts frame is the shared definition; persist
    it once to derive both reports from one physical pass), bin
    masses from a 20-row-per-group
    partitioned window, every float term frozen to fixed-point
    nano-units before the sum. Empty bins are clamped at p = 1e-6 on
    both engines (the standard PSI epsilon; an empty bin would
    otherwise emit ±inf). No reference parity — north-star
    data-quality extension (SURVEY §7 M3)."""
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    wide = _grid_counts(ev)
    stack_args = ", ".join(f"{i}, c{i}" for i in range(1, _KS_CUTS + 1))
    cum = wide.select(
        "event_type",
        "n",
        F.expr(f"stack({_KS_CUTS}, {stack_args}) AS (i, c)"),
    )
    w = Window.partitionBy("event_type").orderBy("i")
    bins = cum.select(
        "event_type",
        "n",
        "i",
        (F.col("c") - F.coalesce(F.lag("c").over(w), F.lit(0))).alias("b"),
    )
    a = bins.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("i").alias("ia"),
        F.col("b").alias("bin_a"),
    )
    b = bins.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("i").alias("ib"),
        F.col("b").alias("bin_b"),
    )
    return (
        a.join(b, (F.col("ia") == F.col("ib")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.expr(
                f"CAST(floor((CAST(sum({_PSI_TERM}) AS DOUBLE) / CAST(1000000000 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE)"
            ).alias("psi"),
        )
    )


@query(
    "stat_cusum_changepoint",
    sql="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(n) AS BIGINT) AS total
      FROM daily
    ),
    cus AS (
      SELECT day, n,
             CAST(t.d * sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  - (row_number() OVER (ORDER BY day)) * t.total AS BIGINT)
                 AS cusum_scaled
      FROM daily CROSS JOIN tot t
    ),
    mx AS (SELECT max(abs(cusum_scaled)) AS m FROM cus),
    peak AS (
      SELECT min(day) AS pd FROM cus, mx WHERE abs(cusum_scaled) = m
    )
    SELECT c.day, c.n, c.cusum_scaled,
           (abs(c.cusum_scaled) = mx.m AND c.day = peak.pd) AS is_peak
    FROM cus c CROSS JOIN mx CROSS JOIN peak
    """,
)
def stat_cusum_changepoint(spark, sf_dir):
    """CUSUM level-shift (changepoint) detection over daily event
    volume: the running sum of deviations from the global daily mean
    peaks at the day the level changed — the classic offline CUSUM
    statistic, the time-dimension sibling of the stat_ks/psi drift
    pair (those compare groups; this finds WHEN a single series
    shifted).

    Exact-integer formulation: with D days and total events T, the
    statistic D·Σ_{j≤i} n_j − i·T is the cusum scaled by D — integer
    arithmetic end-to-end, so no float-summation or mean-rounding
    divergence is possible between engines. The running sum is a
    window over the DAY-GRAIN series: bounded by the calendar (30
    rows here, 36 500 for a century), never by event volume — the
    allowlisted global-window shape, same argument as
    sketch_quantile_hist's 64 bins. Peak day ties break to the
    earliest day on both sides."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("d"), F.sum("n").cast("long").alias("total")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    rn = Window.orderBy("day")
    cus = daily.join(F.broadcast(tot)).select(
        "day",
        "n",
        (
            F.col("d") * F.sum("n").over(w) - F.row_number().over(rn) * F.col("total")
        ).cast("long").alias("cusum_scaled"),
    )
    mx = cus.agg(F.max(F.abs("cusum_scaled")).alias("m"))
    peak_day = (
        cus.join(F.broadcast(mx))
        .filter(F.abs("cusum_scaled") == F.col("m"))
        .agg(F.min("day").alias("peak_day"))
    )
    return (
        cus.join(F.broadcast(mx))
        .join(F.broadcast(peak_day))
        .select(
            "day",
            "n",
            "cusum_scaled",
            (
                (F.abs("cusum_scaled") == F.col("m"))
                & (F.col("day") == F.col("peak_day"))
            ).alias("is_peak"),
        )
    )
