"""Behavioral tests for the second round-5 operator batch: Pareto
skyline, KS-grid drift, sufficient-statistics OLS, deterministic
shard planning, unigram-LM quality scoring.

Oracle parity (tests/test_parity_all.py + tools/check_parity.py)
pins exact values; these pin the SEMANTIC invariants a refactor
could silently break while still matching a co-refactored oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMALL as SF


# ---------------------------------------------------------------- rel_skyline_parts


def test_skyline_rows_are_mutually_nondominated(spark):
    """No returned row dominates another returned row, and every
    returned row is genuinely non-dominated in the source table —
    the definition, checked exhaustively at sf0.001."""
    out = REGISTRY["rel_skyline_parts"].fn(spark, SF).collect()
    src = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_size", "p_retailprice")
        .collect()
    )

    def dominates(a_price, a_size, b_price, b_size):
        return (
            a_price <= b_price
            and a_size >= b_size
            and (a_price < b_price or a_size > b_size)
        )

    for r in out:
        for s in src:
            assert not dominates(
                s["p_retailprice"], s["p_size"], r["p_retailprice"], r["p_size"]
            ), f"{r} dominated by {s}"
    for a in out:
        for b in out:
            if a is not b:
                assert not dominates(
                    a["p_retailprice"], a["p_size"], b["p_retailprice"], b["p_size"]
                )


def test_skyline_frontier_is_strictly_increasing_staircase(spark):
    """Over DISTINCT (price, size) points sorted by ascending price,
    skyline sizes strictly INCREASE — paying more must buy strictly
    more size, else the cheaper point dominates (min-price/max-size
    frontier shape). Exact duplicates of a frontier point all
    survive strict dominance, hence the dedupe before the check."""
    pts = sorted(
        {
            (r["p_retailprice"], r["p_size"])
            for r in REGISTRY["rel_skyline_parts"].fn(spark, SF).collect()
        }
    )
    sizes = [s for _, s in pts]
    assert sizes == sorted(sizes)
    assert len(set(sizes)) == len(sizes)
    prices = [p for p, _ in pts]
    assert len(set(prices)) == len(prices)


# ---------------------------------------------------------------- stat_ks_drift


def test_ks_drift_bounds_and_symmetric_pairs(spark):
    """KS statistic is in [0, 1]; every unordered type pair appears
    exactly once (canonical a < b orientation)."""
    rows = REGISTRY["stat_ks_drift"].fn(spark, SF).collect()
    assert rows, "no pairs produced"
    seen = set()
    for r in rows:
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert r["type_a"] < r["type_b"]
        key = (r["type_a"], r["type_b"])
        assert key not in seen
        seen.add(key)


def test_ks_drift_identical_samples_score_zero(spark):
    """Two groups with identical value multisets have KS = 0 at every
    grid point — drift detector must not false-positive on clones."""
    from pyspark.sql import Row

    base = [Row(event_type="a", value=float(v)) for v in range(100)]
    clone = [Row(event_type="b", value=float(v)) for v in range(100)]
    df = spark.createDataFrame(base + clone)
    import lol_data_pipeline_spark.plans.behavior as bh

    scal = df.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    wide = (
        df.join(F.broadcast(scal))
        .groupBy("event_type")
        .agg(
            *[
                F.sum(
                    F.expr(f"CASE WHEN value <= {bh._ks_cut(i)} THEN 1 ELSE 0 END")
                ).alias(f"c{i}")
                for i in range(1, bh._KS_CUTS + 1)
            ]
        )
    )
    a, b = sorted(wide.collect(), key=lambda r: r["event_type"])
    assert [a[f"c{i}"] for i in range(1, 21)] == [b[f"c{i}"] for i in range(1, 21)]


# ---------------------------------------------------------------- stat_linreg_hourly


def test_linreg_recovers_exact_line(spark):
    """On noiseless y = 3x + 5 (cents: 300x + 500) the closed form
    returns the exact slope/intercept and r² = 1."""
    from pyspark.sql import Row
    import datetime as dt

    rows = [
        Row(
            event_type="t",
            ts=dt.datetime(2024, 1, 1, h, 0, 0),
            value=3.0 * h + 5.0,
        )
        for h in range(24)
    ]
    df = spark.createDataFrame(rows)
    base = df.select(
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
    num = "CAST(n * sxy - sx * sy AS DOUBLE)"
    dxx = "CAST(n * sxx - sx * sx AS DOUBLE)"
    dyy = "CAST(n * syy - sy * sy AS DOUBLE)"
    r = suff.select(
        F.expr(f"round({num} / {dxx}, 6)").alias("slope"),
        F.expr(f"round({num} * {num} / ({dxx} * {dyy}), 6)").alias("r2"),
    ).collect()[0]
    assert r["slope"] == 300.0
    assert r["r2"] == 1.0


def test_linreg_entry_r2_within_bounds(spark):
    for r in REGISTRY["stat_linreg_hourly"].fn(spark, SF).collect():
        if r["r2"] is not None:
            assert 0.0 <= r["r2"] <= 1.0 + 1e-9


# ---------------------------------------------------------------- corpus_shard_plan


def test_shard_plan_partitioning_independent(spark):
    """The shard report is identical under different input
    partitionings — the reproducibility property the hash design
    buys (a row_number-based shuffle would NOT survive this)."""
    fn = REGISTRY["corpus_shard_plan"].fn

    def keyify(df):
        return sorted(tuple(r) for r in df.collect())

    base = keyify(fn(spark, SF))

    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(13)
    import lol_data_pipeline_spark.plans.corpus  # noqa: F401
    from lol_data_pipeline_spark.functions.scalar import md5_long

    keyed = d.select(
        "doc_id",
        "n_chars",
        (
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % 16
        ).alias("shard"),
        md5_long(F.concat(F.lit("ord:"), F.col("doc_id").cast("string"))).alias(
            "sort_key"
        ),
    )
    rep = keyed.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("sort_key").alias("first_key"),
        F.max("sort_key").alias("last_key"),
        F.min_by("doc_id", "sort_key").alias("first_doc"),
    )
    assert keyify(rep) == base


def test_shard_plan_covers_all_docs_balanced(spark):
    rows = REGISTRY["corpus_shard_plan"].fn(spark, SF).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs == total
    assert len(rows) == 16
    counts = [r["n_docs"] for r in rows]
    # md5 sharding should be roughly uniform: no empty shard and no
    # shard holding more than 4x its fair share on 500 docs.
    assert min(counts) > 0
    assert max(counts) <= 4 * total / 16


# ---------------------------------------------------------------- text_unigram_loglik


def test_unigram_loglik_common_beats_rare(spark):
    """A doc made of corpus-frequent words must score (avg log-lik)
    strictly higher than a doc of hapax gibberish — the separation
    the quality filter exists to provide."""
    from pyspark.sql import Row

    common = "the cat sat on the mat and the dog sat too"
    docs = [Row(doc_id=i, text=common) for i in range(20)]
    docs.append(Row(doc_id=99, text="zxqv wplk jhgf qwerty uiopz"))
    df = spark.createDataFrame(docs)
    df.createOrReplaceTempView("___ulm_docs")
    # reuse the production plan body against the temp frame via the
    # registered fn's module helpers
    from lol_data_pipeline_spark.functions import text as tx
    from lol_data_pipeline_spark.operators.relational import global_topk_ranked

    tok = df.select("doc_id", F.explode(tx.tokens("text")).alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    total = tok.agg(F.count("*").cast("long").alias("tot"))
    vocab = global_topk_ranked(tf, [("cnt", True), ("term", False)], 512)
    lp = vocab.join(F.broadcast(total)).select(
        "term",
        F.expr("CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT)").alias("lp"),
    )
    scored = (
        tok.join(F.broadcast(lp), "term", "left")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("lp"), F.expr("CAST(round(ln(1.0 / tot) * 1000000) AS BIGINT)"))).alias("s"),
        )
        .select("doc_id", (F.col("s") / F.col("n_tokens")).alias("avg"))
    )
    out = {r["doc_id"]: r["avg"] for r in scored.collect()}
    assert out[0] > out[99]


def test_unigram_loglik_entry_scores_negative(spark):
    rows = REGISTRY["text_unigram_loglik"].fn(spark, SF).limit(50).collect()
    assert rows
    for r in rows:
        assert r["avg_lp"] < 0.0
        assert r["n_tokens"] > 0


# ---------------------------------------------------------------- ann_recall_eval


def test_ann_recall_eval_bounds(spark):
    """Each of the 20 queries reports exactly k=5 ground-truth rows,
    0 <= n_hit <= 5, and recall == n_hit/5 — the harness invariants
    regardless of how good the index is."""
    rows = REGISTRY["ann_recall_eval"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hit"] <= 5
        assert abs(r["recall_at_5"] - r["n_hit"] / 5.0) < 1e-9


def test_ann_recall_eval_perfect_when_one_cell(spark):
    """With a single IVF cell the index IS brute force — recall must
    be exactly 1.0 for every query (eval-harness sanity: it can
    detect 'no loss', not only loss)."""
    from pyspark.sql import Row
    from lol_data_pipeline_spark.operators import similarity as sim_ops

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 7), float((i * 3) % 5), 1.0]) for i in range(30)]
    )
    exact = sim_ops.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    approx = sim_ops.ivf_topk(emb, n_centroids=1, k=3, n_queries=5)
    e = exact.select("query_id", "match_id")
    a = approx.select(
        F.col("query_id").alias("aq"), F.col("match_id").alias("am"), F.lit(1).alias("hit")
    )
    out = (
        e.join(a, (F.col("query_id") == F.col("aq")) & (F.col("match_id") == F.col("am")), "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"), F.count("*").alias("n"))
        .collect()
    )
    assert len(out) == 5
    for r in out:
        assert r["n_hit"] == r["n"]


# ---------------------------------------------------------------- rel_rolling_wau


def test_rolling_wau_dominates_dau_and_monotone_window(spark):
    """WAU >= DAU always (the 7-day set contains the 1-day set);
    stickiness in (0, 1]; every report day is an observed day."""
    rows = REGISTRY["rel_rolling_wau"].fn(spark, SF).collect()
    assert rows
    observed = {
        r["day"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["wau"] >= r["dau"] >= 1
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["report_day"] in observed


def test_rolling_wau_exact_on_synthetic_window(spark):
    """Hand-checkable case: user 1 active day 1 only, user 2 active
    days 1 and 8. Day 8's WAU window [2..8] contains only user 2."""
    from pyspark.sql import Row
    import datetime as dt

    ev = spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 1, 1, 12), user_id=1),
            Row(ts=dt.datetime(2024, 1, 1, 13), user_id=2),
            Row(ts=dt.datetime(2024, 1, 8, 12), user_id=2),
        ]
    )
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct().withColumnRenamed("day", "report_day")
    rolled = (
        du.withColumn("o", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("report_day", F.expr("date_add(day, o)"))
        .join(spine, "report_day")
    )
    wau = {
        r["report_day"].isoformat(): r["wau"]
        for r in rolled.groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .collect()
    }
    assert wau["2024-01-01"] == 2
    assert wau["2024-01-08"] == 1


# ---------------------------------------------------------------- stat_entropy_daily


def test_entropy_daily_bounds(spark):
    """0 <= H <= ln(n_types) per day (within fixed-point epsilon)."""
    import math

    rows = REGISTRY["stat_entropy_daily"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r["entropy_nats"] <= math.log(r["n_types"]) + 1e-6


def test_entropy_extremes(spark):
    """Single-type day scores exactly 0; uniform 4-type day scores
    ln 4 (to fixed-point resolution)."""
    import datetime as dt
    import math

    from pyspark.sql import Row

    ev = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 2, 1, 1), event_type="only")] * 10
        + [
            Row(ts=dt.datetime(2024, 2, 2, h + 1), event_type=t)
            for h in range(5)
            for t in ("a", "b", "c", "d")
        ]
    )
    counts = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = counts.groupBy("day").agg(F.sum("c").alias("n"))
    terms = counts.join(tot, "day").select(
        "day",
        F.expr(
            "CAST(round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)"
            " * 1000000000) AS BIGINT)"
        ).alias("t9"),
    )
    out = {
        r["day"].isoformat(): -r["s"] / 1e9
        for r in terms.groupBy("day").agg(F.sum("t9").alias("s")).collect()
    }
    assert out["2024-02-01"] == 0.0
    assert abs(out["2024-02-02"] - math.log(4)) < 1e-6


# ---------------------------------------------------------------- rel_interval_overlap


def test_interval_overlap_invariants(spark):
    rows = REGISTRY["rel_interval_overlap"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_sessions"] >= r["n_users"] >= 1
        assert r["overlap_ms"] >= 0
        # a session can overlap at most the 2h window per day
        assert r["overlap_ms"] <= r["n_sessions"] * 2 * 3600 * 1000


def test_interval_overlap_bucketing_no_duplicates(spark):
    """A midnight-crossing session touches two day buckets but must
    pair with each window at most once, with exact clamped overlap."""
    import datetime as dt

    from pyspark.sql import Row

    # one session 23:00 day1 .. 03:00 day2 (crosses midnight, overlaps
    # day2's 02:00-04:00 window by exactly 1h), plus a filler event
    # so day1 exists in the spine
    ev = spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 3, 1, 23, 0), user_id=7, event_id=1),
            Row(ts=dt.datetime(2024, 3, 1, 23, 20), user_id=7, event_id=2),
            Row(ts=dt.datetime(2024, 3, 1, 23, 40), user_id=7, event_id=3),
            Row(ts=dt.datetime(2024, 3, 2, 0, 0), user_id=7, event_id=4),
            Row(ts=dt.datetime(2024, 3, 2, 3, 0), user_id=7, event_id=5),
        ]
    )
    # replicate the entry's plan on the inline frame
    from pyspark.sql import Window as W
    import lol_data_pipeline_spark.plans.behavior as bh

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.unix_millis(F.lag("ts").over(w))
    flag = F.when(
        prev_ms.isNull() | (F.unix_millis("ts") - prev_ms > bh._SESSION_GAP_MS), 1
    ).otherwise(0)
    sess = ev.withColumn("session_idx", F.sum(flag).over(w.rowsBetween(W.unboundedPreceding, 0)))
    sessions = sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    # the 00:00->03:00 gap is 3h > 30min, so this is actually TWO
    # sessions: [23:00, 00:00] and [03:00, 03:00]
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
    out = joined.select(
        "day",
        "session_idx",
        (
            F.unix_millis(F.least("s_end", "w_end"))
            - F.unix_millis(F.greatest("s_start", "w_start"))
        ).alias("ms"),
    ).collect()
    # only the instantaneous 03:00 session overlaps day2's window
    assert len(out) == 1
    assert out[0]["day"].isoformat() == "2024-03-02"
    assert out[0]["ms"] == 0


# ---------------------------------------------------------------- stream_cdf_multibatch


def test_stream_cdf_counters_monotone_and_complete(spark):
    """Per type: n_le is non-decreasing in the grid index and reaches
    n at the last cut (the literal-max fix applies to the streaming
    twin too); grid has exactly 20 points per type."""
    rows = REGISTRY["stream_cdf_multibatch"].fn(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["i"])
        assert [r["i"] for r in rs] == list(range(1, 21)), t
        counts = [r["n_le"] for r in rs]
        assert counts == sorted(counts), t
        assert counts[-1] == rs[0]["n"], t


# ---------------------------------------------------------------- ref_json_lines_scan


def test_jsonl_corrupt_records_quarantined(spark):
    """The two injected malformed lines surface as _corrupt_record
    rows (not silent nulls, not job failure) and the valid row count
    matches the parquet table exactly."""
    from lol_data_pipeline_spark.sources.jsonl import (
        CORRUPT_LINES,
        read_events_jsonl,
    )

    # Spark disallows corrupt-column-only queries on raw JSON (count
    # prunes every other column) — cache first, the documented
    # workaround, then query the parsed results
    raw = read_events_jsonl(spark, SF).cache()
    try:
        n_corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).count()
        assert n_corrupt == len(CORRUPT_LINES)
        n_valid = raw.filter(F.col("_corrupt_record").isNull()).count()
        n_parquet = spark.read.parquet(f"{SF}/events.parquet").count()
        assert n_valid == n_parquet
    finally:
        raw.unpersist()


def test_jsonl_timestamps_roundtrip(spark):
    """Epoch-micros JSON timestamps (jsonl.py's ts_us) re-enter
    through ts_from_epoch and equal the parquet timestamps
    row-for-row."""
    from lol_data_pipeline_spark.io import load_table
    from lol_data_pipeline_spark.sources.jsonl import read_events_jsonl

    got = {
        r["event_id"]: r["ts"]
        for r in read_events_jsonl(spark, SF)
        .filter(F.col("_corrupt_record").isNull())
        .select("event_id", "ts")
        .collect()
    }
    want = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, SF, "events").select("event_id", "ts").collect()
    }
    assert got == want


# ---------------------------------------------------------------- rel_bloom_prejoin


def test_bloom_prejoin_no_false_negatives(spark):
    """The bitmask pre-filter must pass EVERY fact row the real join
    keeps (false negatives would silently drop revenue — the one
    failure mode a physical-only filter cannot have), while dropping
    a meaningful share of non-matching rows."""
    import lol_data_pipeline_spark.plans.sketches as sk

    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    dk = F.col("o_orderkey").cast("string")
    words = (
        orders.select(F.explode(F.array(*sk._bloom_bits_fast(dk))).alias("bit"))
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
    pre = li.join(F.broadcast(bloom))
    cond = F.lit(True)
    for j, bit in enumerate(sk._bloom_bits_fast(fk)):
        pre = pre.withColumn(f"__b{j}", bit)
        word = (F.col(f"__b{j}") / 64).cast("int")
        mask = F.expr(f"CAST(shiftleft(1L, CAST(__b{j} % 64 AS INT)) AS BIGINT)")
        cond = cond & (
            (F.coalesce(F.try_element_at(F.col("mp"), word), F.lit(0)).bitwiseAND(mask))
            != 0
        )
    passed = pre.filter(cond).select("l_orderkey")
    true_match = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
    n_li, n_passed, n_true = li.count(), passed.count(), true_match.count()
    # no false negatives: every true match passes
    assert (
        true_match.join(passed.distinct(), "l_orderkey", "left_anti").count() == 0
    )
    assert n_true <= n_passed <= n_li
    # and the filter actually filters (urgent is ~20% of orders; with
    # 4096 bits the false-positive rate stays well under 100%)
    assert n_passed < n_li


def test_linreg_degenerate_group_is_null_not_engine_dependent(spark):
    """A group whose events all share one hour has dxx = 0; the
    shared CASE guard must emit NULL explicitly (x/0-as-NULL is
    non-ANSI Spark behavior DuckDB 1.1+ no longer shares)."""
    import datetime as dt

    from pyspark.sql import Row
    import lol_data_pipeline_spark.plans.behavior as bh

    df = spark.createDataFrame(
        [Row(event_type="one_hour", ts=dt.datetime(2024, 1, 1, 9, m), value=1.0 + m)
         for m in range(5)]
    )
    base = df.select(
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
    r = suff.select(
        F.expr(bh._LR_SLOPE).alias("slope"),
        F.expr(bh._LR_INTERCEPT).alias("icept"),
        F.expr(bh._LR_R2).alias("r2"),
    ).collect()[0]
    assert r["slope"] is None and r["icept"] is None and r["r2"] is None


# ---------------------------------------------------------------- corpus_pipeline_e2e


def test_pipeline_e2e_funnel_monotone(spark):
    """Each curation stage can only shrink the corpus: n_in >=
    n_quality >= n_dedup >= n_final, chars_final <= sum(n_chars),
    and no benchmark source appears in the report."""
    rows = REGISTRY["corpus_pipeline_e2e"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_in"] >= r["n_quality"] >= r["n_dedup"] >= r["n_final"] >= 0
        assert r["source"] not in ("src0", "src1")
        assert r["chars_final"] >= 0
    total_final = sum(r["n_final"] for r in rows)
    assert total_final > 0, "pipeline must keep something at sf0.001"


# ---------------------------------------------------------------- stat_psi_drift


def test_psi_nonnegative(spark):
    """PSI >= 0 for every pair (each term (pa-pb)ln(pa/pb) is
    non-negative since sign(pa-pb) == sign(ln(pa/pb)))."""
    rows = REGISTRY["stat_psi_drift"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["psi"] >= -1e-9, r
        assert r["type_a"] < r["type_b"]


def test_psi_identical_distributions_score_zero(spark):
    """Two groups with identical value multisets must score exactly
    0 — bin misalignment between the self-join sides or an
    asymmetric clamp would inflate it."""
    from pyspark.sql import Row

    import lol_data_pipeline_spark.plans.behavior as bh

    df = spark.createDataFrame(
        [Row(event_type=t, value=float(v % 37) * 1.5 - 10) for t in ("a", "b") for v in range(200)]
    )
    wide = bh._grid_counts(df)
    stack_args = ", ".join(f"{i}, c{i}" for i in range(1, bh._KS_CUTS + 1))
    cum = wide.select("event_type", "n", F.expr(f"stack({bh._KS_CUTS}, {stack_args}) AS (i, c)"))
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("i")
    bins = cum.select(
        "event_type", "n", "i",
        (F.col("c") - F.coalesce(F.lag("c").over(w), F.lit(0))).alias("b"),
    )
    a = bins.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a"),
        F.col("i").alias("ia"), F.col("b").alias("bin_a"),
    )
    b = bins.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b"),
        F.col("i").alias("ib"), F.col("b").alias("bin_b"),
    )
    out = (
        a.join(b, (F.col("ia") == F.col("ib")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.expr(f"round(CAST(sum({bh._PSI_TERM}) AS DOUBLE) / 1000000000.0, 6)").alias("psi"))
        .collect()
    )
    assert len(out) == 1
    assert out[0]["psi"] == 0.0


# ---------------------------------------------------------------- rel_asof_tolerance


def test_asof_tolerance_nullifies_stale_matches(spark):
    """A click 31 minutes after the only view gets NULL; a click 29
    minutes after gets the match — the lookback boundary."""
    import datetime as dt

    from pyspark.sql import Row
    from lol_data_pipeline_spark.plans.queries import asof_tolerance_attribution

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    clicks = spark.createDataFrame(
        [
            Row(click_id=1, user_id=9, ts=t0 + dt.timedelta(minutes=29)),
            Row(click_id=2, user_id=9, ts=t0 + dt.timedelta(minutes=31)),
        ]
    )
    views = spark.createDataFrame(
        [Row(user_id=9, ts=t0, view_id=100, view_ts=t0)]
    )
    # drive the PRODUCTION helper (shared with the registry entry),
    # not a private copy of the guard
    out = {
        r["click_id"]: r["view_id"]
        for r in asof_tolerance_attribution(clicks, views).collect()
    }
    assert out[1] == 100
    assert out[2] is None


# ---------------------------------------------------------------- rel_asof_forward


def test_asof_forward_picks_nearest_future_min_id(spark):
    """The forward kernel must pick the EARLIEST future right row
    (inclusive at equal ts) and break equal-timestamp ties to MIN
    id — the documented deterministic mirror of backward's max rule."""
    import datetime as dt

    from pyspark.sql import Row
    from lol_data_pipeline_spark.operators.asof import asof_join_forward

    t0 = dt.datetime(2024, 7, 1, 10, 0, 0)
    clicks = spark.createDataFrame(
        [
            Row(click_id=1, user_id=5, ts=t0),                          # matches p at t0 (inclusive)
            Row(click_id=2, user_id=5, ts=t0 + dt.timedelta(minutes=5)),  # matches later pair, min id
            Row(click_id=3, user_id=5, ts=t0 + dt.timedelta(hours=2)),    # nothing after
        ]
    )
    purchases = spark.createDataFrame(
        [
            Row(user_id=5, ts=t0, purchase_id=50),
            Row(user_id=5, ts=t0 + dt.timedelta(minutes=10), purchase_id=61),
            Row(user_id=5, ts=t0 + dt.timedelta(minutes=10), purchase_id=60),
        ]
    )
    out = {
        r["click_id"]: r["asof_purchase_id"]
        for r in asof_join_forward(
            clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
            payload=["purchase_id"], tiebreak="purchase_id",
        ).collect()
    }
    assert out[1] == 50
    assert out[2] == 60
    assert out[3] is None


# ---------------------------------------------------------------- stat_cusum_changepoint


def test_cusum_finds_injected_level_shift(spark):
    """A series with 10 days at ~5/day then 10 days at ~50/day must
    peak (max |cusum|) exactly at the last low day — the level-shift
    boundary; cusum ends at 0 by construction."""
    import datetime as dt

    from pyspark.sql import Row

    rows = []
    eid = 0
    for d in range(20):
        per_day = 5 if d < 10 else 50
        for k in range(per_day):
            rows.append(
                Row(ts=dt.datetime(2024, 8, 1 + d, 8, 0, k % 60), event_id=eid)
            )
            eid += 1
    ev = spark.createDataFrame(rows)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    from pyspark.sql import Window as W

    tot = daily.agg(
        F.count("*").cast("long").alias("d"), F.sum("n").cast("long").alias("total")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    rn = W.orderBy("day")
    cus = daily.join(F.broadcast(tot)).select(
        "day",
        (
            F.col("d") * F.sum("n").over(w) - F.row_number().over(rn) * F.col("total")
        ).cast("long").alias("c"),
    ).collect()
    by_day = sorted(cus, key=lambda r: r["day"])
    peak = max(by_day, key=lambda r: abs(r["c"]))
    assert peak["day"].isoformat() == "2024-08-10"  # last low day
    assert by_day[-1]["c"] == 0  # telescoping: D*total - D*total


def test_asof_forward_null_timestamps(spark):
    """A left row with NULL ts must get a NULL match (mirroring the
    backward twin), and NULL-ts right rows match nothing — the
    review-caught NULLS LAST trap where a NULL left ts silently
    matched the key's earliest right row."""
    import datetime as dt

    from pyspark.sql import Row
    from lol_data_pipeline_spark.operators.asof import asof_join_forward
    from pyspark.sql import types as T

    t0 = dt.datetime(2024, 7, 1, 10, 0, 0)
    schema_l = T.StructType([
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    schema_r = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("purchase_id", T.LongType()),
    ])
    clicks = spark.createDataFrame(
        [(1, 5, None), (2, 5, t0)], schema_l
    )
    purchases = spark.createDataFrame(
        [(5, t0, 50), (5, None, 99)], schema_r
    )
    out = {
        r["click_id"]: r["asof_purchase_id"]
        for r in asof_join_forward(
            clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
            payload=["purchase_id"], tiebreak="purchase_id",
        ).collect()
    }
    assert out[1] is None  # NULL left ts -> no match
    assert out[2] == 50    # NULL-ts right row (99) never matches


def test_asof_backward_null_timestamps(spark):
    """Backward twin of the NULL-ts regression: a NULL-ts reference
    row must match nothing. Pre-fix, ASC NULLS FIRST sorted the NULL
    reference row before everything, so a left row earlier than every
    real reference row (and a NULL-ts left row) picked up its payload
    instead of NULL."""
    import datetime as dt

    from pyspark.sql import types as T
    from lol_data_pipeline_spark.operators.asof import asof_join_backward

    t0 = dt.datetime(2024, 7, 1, 10, 0, 0)
    t1 = dt.datetime(2024, 7, 2, 10, 0, 0)
    schema_l = T.StructType([
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    schema_r = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("price_id", T.LongType()),
    ])
    clicks = spark.createDataFrame(
        [(1, 5, t0), (2, 5, t1), (3, 5, None)], schema_l
    )
    prices = spark.createDataFrame(
        [(5, t1, 50), (5, None, 99)], schema_r
    )
    out = {
        r["click_id"]: r["asof_price_id"]
        for r in asof_join_backward(
            clicks, prices, on=["user_id"], left_ts="ts", right_ts="ts",
            payload=["price_id"], tiebreak="price_id",
        ).collect()
    }
    assert out[1] is None  # precedes every real reference row -> no match
    assert out[2] == 50    # real row matches; NULL-ts row (99) never does
    assert out[3] is None  # NULL left ts -> no match


def test_acf_daily_matches_python_model(spark, sf_dir):
    """r_acf must equal the plain-Python autocorrelation of the daily
    count series, the integer num/den columns must recompute exactly
    from the counts (they are the engine-exact audit trail), and lag
    k must have exactly n-k pairs."""
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.io import load_table
    from lol_data_pipeline_spark.plans import REGISTRY

    daily = sorted(
        (r.day, r.c)
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    cs = [c for _, c in daily]
    n, s = len(cs), sum(cs)
    d = [n * c - s for c in cs]
    den = sum(x * x for x in d)
    rows = {r.lag: r for r in REGISTRY["stat_acf_daily"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 8))
    for k, r in rows.items():
        num = sum(d[t] * d[t + k] for t in range(n - k))
        assert r.num_scaled == num, (k, r)
        assert r.den_scaled == den, (k, r)
        assert r.n_pairs == n - k, (k, r)
        assert abs(r.r_acf - round(num / den, 6)) < 1e-12, (k, r)
