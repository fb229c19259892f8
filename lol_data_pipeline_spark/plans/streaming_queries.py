"""Streaming queries registered in the catalog.

Each runs a real Structured Streaming pipeline (file source → window
aggregation → memory sink) to completion and returns the final
result as a batch DataFrame, so the DuckDB oracle can check it
exactly like a batch query.
"""

from __future__ import annotations

from lol_data_pipeline_spark.plans.queries import query
from lol_data_pipeline_spark.streaming import windows as sw


@query(
    "stream_tumbling_window",
    sql="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark, sf_dir):
    """Tumbling 1h windows per event_type via readStream→writeStream."""
    return sw.tumbling_counts(spark, sf_dir)


@query(
    "stream_sliding_window",
    sql="""
    SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800) * 1000000) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events, (VALUES (0), (1)) offs(k)
    GROUP BY 1
    """,
)
def stream_sliding_window(spark, sf_dir):
    """Sliding 1h/30m windows: every event contributes to two
    windows (the oracle cross-joins the two slide offsets)."""
    return sw.sliding_counts(spark, sf_dir)


@query(
    "stream_session_window",
    sql="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), numbered AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def stream_session_window(spark, sf_dir):
    """Per-user 30-minute-gap session windows via
    F.session_window in a streaming aggregation; the oracle computes
    the same sessions with the classic gaps-and-islands SQL."""
    return sw.session_windows(spark, sf_dir)


@query(
    "stream_stateful_totals",
    sql="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    (count, sum) state evolved per micro-batch; with the full replay
    in one batch the emitted updates equal the batch aggregate, which
    is exactly what the oracle checks."""
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.streaming.stateful import running_user_totals

    out = running_user_totals(spark, sf_dir)
    return out.select(
        "user_id", "n_events", F.round("sum_value", 2).alias("sum_value")
    )


@query(
    "stream_dedup",
    sql="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark, sf_dir):
    """Stateful streaming dropDuplicates on (user_id, event_type);
    with the full replay the surviving set equals batch DISTINCT,
    which is what the oracle checks."""
    return sw.streaming_dedup(spark, sf_dir)


@query(
    "stream_dedup_multibatch",
    sql="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_multibatch(spark, sf_dir):
    """Streaming dropDuplicates over a four-batch ordered replay:
    the seen-keys state store must survive every trigger boundary —
    pairs recur across slices, so lost state re-emits them and the
    row count exceeds the batch DISTINCT oracle (the state-eviction
    regression a single-batch replay cannot catch)."""
    return sw.streaming_dedup_multibatch(spark, sf_dir)


@query(
    "stream_totals_multibatch",
    sql="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_totals_multibatch(spark, sf_dir):
    """Per-user running (count, sum) GroupState accumulated across a
    four-batch ordered replay; integer-cent state makes the total
    bit-exact under any batch split, and the final snapshot per key
    must equal the batch aggregate — if state failed to restore at a
    trigger the counts would collapse to the last slice's."""
    from lol_data_pipeline_spark.streaming.stateful import (
        running_user_totals_multibatch,
    )

    return running_user_totals_multibatch(spark, sf_dir)


@query(
    "stream_join_click_purchase",
    sql="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           round(p.value, 2) AS purchase_value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_join_click_purchase(spark, sf_dir):
    """Watermarked stream-stream inner join with a time-range
    constraint (purchases ≤30 min after a click, same user)."""
    return sw.click_purchase_join(spark, sf_dir)


@query(
    "stream_ingest_ids",
    sql="""
    SELECT 'NA1_' || lpad(CAST(r.range AS VARCHAR), 7, '0') AS match_id,
           q.queue_type,
           CAST((r.range // 100) * 100 AS INTEGER) AS page_start
    FROM range(0, 600) r, (VALUES ('draft'), ('blind')) q(queue_type)
    """,
)
def stream_ingest_ids(spark, sf_dir):
    """Incremental ingest through the custom PySpark 4 streaming
    DataSource (sources.datasource.MatchIdStreamReader): the
    paginated ID scan of the reference (src/api/matches.py:21-53)
    as a readStream whose micro-batches discover two pages per poll,
    fanned out one InputPartition per (queue, page). Run to
    completion (6 pages × 100 ids × 2 queues) the emitted set is the
    deterministic page synthesis the oracle regenerates with a
    range() scan — exactly-once: page-cursor offsets mean a replayed
    batch re-reads exactly its own pages, never re-emits others."""
    from lol_data_pipeline_spark.sources.datasource import MatchIdDataSource
    from lol_data_pipeline_spark.streaming.windows import run_to_completion

    spark.dataSource.register(MatchIdDataSource)
    stream = (
        spark.readStream.format("riot_match_ids")
        .option("queues", "draft,blind")
        .option("page_size", 100)
        .option("pages_per_batch", 2)
        .option("max_pages", 6)
        .load()
    )
    return run_to_completion(stream, mode="append")


@query(
    "stream_user_topk",
    sql="""
    SELECT user_id, CAST(rnk AS INTEGER) AS rnk, value, event_id
    FROM (
      SELECT user_id, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rnk
      FROM events
    )
    WHERE rnk <= 3
    """,
)
def stream_user_topk(spark, sf_dir):
    """Per-user top-3 events by value as a custom stateful streaming
    operator (bounded per-key state over an unbounded stream): the
    oracle is the batch row_number() top-k with the same
    deterministic tie-break. A transformWithStateInPandas variant
    with identical semantics exists (streaming/stateful.py:
    user_topk_values) but is container-blocked on protobuf."""
    from lol_data_pipeline_spark.streaming.stateful import running_user_topk

    return running_user_topk(spark, sf_dir, k=3)


@query(
    "stream_tumbling_multibatch",
    sql="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_multibatch(spark, sf_dir):
    """Tumbling windows over a four-micro-batch time-ordered replay
    (append mode, sentinel-flushed): windows spanning batch
    boundaries force window state to persist/restore across
    triggers, and each window must emit exactly once when the
    watermark passes it — the oracle is the plain batch aggregate,
    so lost state, double emission, or early eviction fail here."""
    return sw.tumbling_counts_multibatch(spark, sf_dir)


@query(
    "stream_session_multibatch",
    sql="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), numbered AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def stream_session_multibatch(spark, sf_dir):
    """Session windows over a four-batch time-ordered replay — the
    hardest cross-batch state: a session still open at a slice
    boundary must be EXTENDED by next-batch events (session-window
    state merge), not emitted early or restarted; append mode emits
    each session exactly once after the watermark passes its
    end + gap. Early emission, lost open-session state, or a failed
    merge all change (session_start, n_events) pairs and fail the
    batch gaps-and-islands oracle."""
    return sw.session_windows_multibatch(spark, sf_dir)


@query(
    "stream_topk_multibatch",
    sql="""
    SELECT user_id, CAST(rnk AS INTEGER) AS rnk, value, event_id
    FROM (
      SELECT user_id, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rnk
      FROM events
    )
    WHERE rnk <= 3
    """,
)
def stream_topk_multibatch(spark, sf_dir):
    """Per-user top-3 via applyInPandasWithState over a two-batch
    replay (trimmed from four, then three: as the bench's multibatch
    representative, trigger scheduling dominated its cost, and ONE
    batch boundary already forces the serialize→restore→merge the
    entry exists to prove — most users span both time halves):
    GroupState (the running top-k arrays) round-trips the state
    store between micro-batches; the final per-user snapshot must
    equal the batch row_number() top-k."""
    from lol_data_pipeline_spark.streaming.stateful import (
        running_user_topk_multibatch,
    )

    return running_user_topk_multibatch(spark, sf_dir, k=3)


@query(
    "stream_join_multibatch",
    sql="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           round(p.value, 2) AS purchase_value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_join_multibatch(spark, sf_dir):
    """Stream-stream inner join over a four-batch time-ordered
    replay: clicks buffer in join state across micro-batches until
    their purchase arrives; the 1 h watermark dominates the 30 min
    match window so no legitimate match can be evicted — the batch
    join oracle fails if cross-batch buffering breaks."""
    return sw.click_purchase_join_multibatch(spark, sf_dir)


@query(
    "stream_late_data_drop",
    sql="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE event_id % 7 <> 0
    GROUP BY 1
    """,
)
def stream_late_data_drop(spark, sf_dir):
    """Watermark negative test: a three-micro-batch replay where the
    second batch is entirely late data (≥2 h older than the 30-min
    watermark) that MUST be dropped — the oracle counts on-time rows
    only, so removing the watermark fails this parity row."""
    return sw.late_data_drop(spark, sf_dir)


# shared by stream_join_left_outer and its multibatch twin: under a
# time-ordered replay the final query watermark is the same global
# least(max click ts, max purchase ts) − 1 h, and ordered arrival
# means a matching purchase (≤ click + 30 min) always lands before
# the watermark (lagging 1 h) can evict its click — so the outer
# result set is batch-count invariant and ONE oracle serves both.
_LEFT_OUTER_SQL = """
    WITH scal AS (
      SELECT least(
               (SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase')
             ) - INTERVAL 1 HOUR AS wm
    ),
    clicks AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
      SELECT c.user_id, c.click_id, p.purchase_id,
             round(p.value, 2) AS purchase_value
      FROM clicks c JOIN purch p ON p.user_id = c.user_id
        AND p.purchase_ts >= c.click_ts
        AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
    ),
    unmatched AS (
      SELECT c.user_id, c.click_id,
             CAST(NULL AS BIGINT) AS purchase_id,
             CAST(NULL AS DOUBLE) AS purchase_value
      FROM clicks c CROSS JOIN scal s
      WHERE NOT EXISTS (
        SELECT 1 FROM purch p WHERE p.user_id = c.user_id
          AND p.purchase_ts >= c.click_ts
          AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
      )
      AND c.click_ts + INTERVAL 30 MINUTE < s.wm
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


@query("stream_join_left_outer", sql=_LEFT_OUTER_SQL)
def stream_join_left_outer(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join (clicks left): null
    extension happens at state EVICTION — when the query watermark
    (advanced by the bounded replay's final no-data micro-batch)
    passes a click's 30-minute match window. Each side's watermark
    node sits AFTER its event_type filter, so it tracks that side's
    own max event time, and the query watermark is the MIN of the
    two (multipleWatermarkPolicy=min): wm = least(max click ts,
    max purchase ts) − 1 h. The oracle reproduces exactly that
    cutoff: a batch left join PLUS the watermark condition on
    unmatched rows — the difference between the two IS the
    streaming semantics. (Found at sf0.001, where the latest click
    precedes the latest purchase by hours: modeling wm from
    max(all ts) over-evicts by exactly that gap.)"""
    return sw.click_purchase_left_join(spark, sf_dir)


@query("stream_join_left_outer_multibatch", sql=_LEFT_OUTER_SQL)
def stream_join_left_outer_multibatch(spark, sf_dir):
    """LEFT OUTER stream-stream join over a four-batch time-ordered
    replay — the hardest eviction shape: a click buffered across
    batch boundaries must null-extend exactly once, when the
    cross-batch watermark finally passes its match window, and must
    NOT null-extend early (a duplicate null row beside a later match
    would break the oracle's UNION ALL row count). Ordered arrival +
    the 1 h watermark dominating the 30 min window make the final
    result equal the single-batch entry's, so the same
    cutoff-modeling oracle gates both (see _LEFT_OUTER_SQL)."""
    return sw.click_purchase_left_join_multibatch(spark, sf_dir)


@query(
    "stream_incremental_view",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def stream_incremental_view(spark, sf_dir):
    """foreachBatch incremental view maintenance over a four-batch
    replay: each micro-batch's O(groups) partial aggregate merges
    into versioned at-rest state (sum-of-sums / count-of-counts,
    idempotent per epoch); the final state must equal the
    from-scratch batch aggregate. See
    streaming/sinks.py:incremental_view_multibatch."""
    from lol_data_pipeline_spark.streaming.sinks import incremental_view_multibatch

    return incremental_view_multibatch(spark, sf_dir)


@query(
    "stream_sliding_multibatch",
    sql="""
    SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800) * 1000000) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events, (VALUES (0), (1)) offs(k)
    GROUP BY 1
    """,
)
def stream_sliding_multibatch(spark, sf_dir):
    """Sliding 1h/30m windows over a four-batch replay — TWO open
    windows per key span each slice boundary (overlapping-window
    state restore), append mode emits each window exactly once at
    watermark passage; oracle is the batch two-offset cross join."""
    return sw.sliding_counts_multibatch(spark, sf_dir)


@query(
    "stream_cdc_latest",
    sql="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           ts AS last_ts,
           CAST(event_id AS BIGINT) AS last_event_id,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_cdc_latest(spark, sf_dir):
    """Streaming CDC apply over a four-batch replay: per-key
    last-write-wins state (one tuple per key) materializes the
    current-state table a change stream implies — the streaming
    SCD1/upsert. Oracle is the batch row_number() latest-per-key."""
    from lol_data_pipeline_spark.streaming.stateful import latest_per_key_multibatch

    return latest_per_key_multibatch(spark, sf_dir)


@query(
    "stream_cdf_multibatch",
    sql="""
    WITH scal AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    cuts AS (
      SELECT i, CASE WHEN i = 20 THEN mx
                     ELSE mn + (mx - mn) * i / 20.0 END AS cut
      FROM range(1, 21) t(i), scal
    )
    SELECT event_type,
           CAST(i AS INTEGER) AS i,
           CAST(sum(CASE WHEN value <= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
           CAST(count(*) AS BIGINT) AS n
    FROM events CROSS JOIN cuts
    GROUP BY event_type, i
    """,
)
def stream_cdf_multibatch(spark, sf_dir):
    """Streaming fixed-grid CDF drift counters over a four-batch
    replay (complete mode): the streaming twin of stat_ks_drift.
    Reference bounds are frozen literals (a stream can't know its
    final min/max — production monitors compare against a reference
    window); the 20 per-group counters are mergeable state folded
    per micro-batch, and the final snapshot must equal the batch
    aggregate."""
    from lol_data_pipeline_spark.streaming import windows as sw

    return sw.cdf_counters_multibatch(spark, sf_dir)


@query(
    "stream_alert_multibatch",
    sql="""
    WITH decisive AS (
      SELECT user_id, ts, event_id,
             CASE WHEN value >= 100.0 THEN 'on' ELSE 'off' END AS dir
      FROM events WHERE value >= 100.0 OR value <= 10.0
    ),
    seq AS (
      SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM decisive
    )
    SELECT user_id, ts, event_id, dir AS transition
    FROM seq WHERE dir != coalesce(prev, 'off')
    """,
)
def stream_alert_multibatch(spark, sf_dir):
    """Per-user hysteresis alerting (ON at value ≥ 100, OFF at ≤ 10,
    transitions only) as a custom stateful streaming operator over a
    four-batch time-ordered replay. The state machine's current
    status crosses micro-batch boundaries through the state store;
    the oracle reconstructs the same machine in batch SQL (decisive
    events + lag over each user's history, initial state OFF). A
    state-store round-trip bug changes WHICH rows are transitions —
    the strictest cross-batch state check in the streaming family
    because output identity, not an aggregate, depends on state."""
    from lol_data_pipeline_spark.streaming.stateful import (
        alert_transitions_multibatch,
    )

    return alert_transitions_multibatch(spark, sf_dir)
