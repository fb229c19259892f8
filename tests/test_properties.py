"""Property tests (SURVEY §5 point 4): invariants that must hold for
arbitrary inputs, not just the fixtures — flatten loses no leaves,
dedup is idempotent, date conversion round-trips, signatures are
permutation-invariant."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@SLOW
@given(
    rows=st.lists(
        st.tuples(_text, st.integers(-(2**31), 2**31 - 1), st.booleans()),
        min_size=1,
        max_size=8,
    )
)
def test_flatten_preserves_every_leaf(spark, rows):
    """flatten() must emit exactly one column per leaf of the nested
    schema and preserve the values row-for-row."""
    from lol_data_pipeline_spark.functions.flatten import flatten

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "a",
                T.StructType(
                    [
                        T.StructField("s", T.StringType()),
                        T.StructField(
                            "b",
                            T.StructType(
                                [
                                    T.StructField("i", T.IntegerType()),
                                    T.StructField("f", T.BooleanType()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )
    data = [(i, (s, (n, b))) for i, (s, n, b) in enumerate(rows)]
    df = spark.createDataFrame(data, schema)
    flat = flatten(df)
    assert set(flat.columns) == {"id", "a_s", "a_b_i", "a_b_f"}
    got = sorted(flat.collect(), key=lambda r: r.id)
    for i, (s, n, b) in enumerate(rows):
        assert (got[i].a_s, got[i].a_b_i, got[i].a_b_f) == (s, n, b)


@SLOW
@given(ids=st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=30))
def test_distinct_dedup_idempotent_and_minimal(spark, ids):
    """A1 semantics: dedup twice == dedup once == the set of inputs
    (also covers the reference bug of returning the pre-dedup list,
    reference matches.py:53)."""
    df = spark.createDataFrame([(x,) for x in ids], "match_id string")
    once = df.distinct()
    twice = once.distinct()
    assert once.count() == len(set(ids))
    assert twice.count() == once.count()
    assert {r.match_id for r in once.collect()} == set(ids)


@SLOW
@given(ts=st.integers(0, 4_102_444_800_000))  # 1970..2100 epoch-ms
def test_epoch_ms_to_date_roundtrip(spark, ts):
    """P3 semantics (reference utils.py:84-91): epoch-ms → yyyy-MM-dd
    must agree with Python's UTC datetime arithmetic."""
    from lol_data_pipeline_spark.functions.scalar import epoch_ms_to_date_str

    df = spark.createDataFrame([(ts,)], "t long")
    got = df.select(epoch_ms_to_date_str("t").alias("d")).first().d
    want = dt.datetime.fromtimestamp(ts / 1000, tz=dt.timezone.utc).strftime("%Y-%m-%d")
    assert got == want


@SLOW
@given(
    words=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=3, max_size=20),
    seed=st.integers(0, 2**31),
)
def test_minhash_signature_word_order_invariant(spark, words, seed):
    """MinHash signatures depend only on the shingle SET, so any
    rotation of the same circular word sequence that produces the
    same shingle set yields the same signature; identical docs always
    sign identically."""
    from lol_data_pipeline_spark.operators.dedup import minhash_signatures

    text = " ".join(words)
    df = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    sigs = minhash_signatures(df, k=8).collect()
    assert len(sigs) == 2
    a, b = sorted(sigs, key=lambda r: r.id)
    assert a[1:] == b[1:]


@SLOW
@given(
    texts=st.lists(_text.filter(lambda s: s.strip()), min_size=2, max_size=10)
)
def test_simhash_pairs_are_canonical(spark, texts):
    """simhash_pairs emits each qualifying pair exactly once with
    id_a < id_b (the first-matching-band rule must not duplicate or
    drop pairs)."""
    from lol_data_pipeline_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = simhash_pairs(df, max_hamming=64).collect()
    seen = [(r.id_a, r.id_b) for r in rows]
    assert len(seen) == len(set(seen))  # no duplicates
    assert all(a < b for a, b in seen)
    # Hamming ≤ 64 on 64-bit signatures means EVERY pair of non-empty
    # docs must appear
    n_docs = len([t for t in texts if t.split()])
    assert len(seen) == n_docs * (n_docs - 1) // 2


@SLOW
@given(
    instants=st.lists(
        st.datetimes(
            min_value=dt.datetime(1975, 1, 1),
            max_value=dt.datetime(2200, 1, 1),
        ),
        min_size=1,
        max_size=8,
    ),
    unit=st.sampled_from(["s", "ms", "us", "ns"]),
)
def test_ts_from_epoch_unit_invariant(spark, instants, unit):
    """For ANY instant in the detection range, expressing it in any
    epoch unit and normalizing yields that instant at the unit's own
    precision — the invariant whose violation was the round-3
    streaming bug."""
    from lol_data_pipeline_spark.io import ts_from_epoch

    mult = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    epoch = dt.datetime(1970, 1, 1)
    # integer microseconds via timedelta floor-div — float
    # total_seconds() is off by ±1-2 us at these magnitudes
    rows = [
        ((x - epoch) // dt.timedelta(microseconds=1) * mult // 10**6,)
        for x in instants
    ]
    df = spark.createDataFrame(rows, "ts long").select(
        ts_from_epoch("ts").alias("t")
    )
    got = [r.t for r in df.collect()]
    trunc = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
    for want, g in zip(instants, got):
        us = (want - epoch) // dt.timedelta(microseconds=1)
        expect = epoch + dt.timedelta(microseconds=us - us % trunc)
        assert g == expect, (unit, want, g)


@SLOW
@given(
    values=st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.integers(0, 10**6),
        ),
        max_size=60,
    ),
    k=st.integers(1, 5),
    split=st.integers(0, 60),
)
def test_topk_merge_equals_global_topk(values, k, split):
    """Merging batches incrementally through _topk_merge equals the
    global top-k by (value desc, event_id asc) — order of batch
    arrival must not matter (the streaming-state invariant)."""
    import pandas as pd

    from lol_data_pipeline_spark.streaming.stateful import _topk_merge

    # unique event_ids (ties on id would make the expected order
    # ambiguous; real event ids are unique)
    uniq: dict[int, float] = {}
    for v, e in values:
        uniq.setdefault(e, float(v))
    values = [(v, e) for e, v in uniq.items()]
    a, b = values[:split], values[split:]
    state = []
    for batch in (a, b):
        if batch:
            pdf = pd.DataFrame(
                {"value": [v for v, _ in batch], "event_id": [e for _, e in batch]}
            )
            state = _topk_merge(state, iter([pdf]), k)
    want = sorted(values, key=lambda t: (-t[0], t[1]))[:k]
    assert state == want


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-100, 100)),
            st.integers(0, 10**6),
        ),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(1, 6),
    desc=st.booleans(),
)
def test_global_topk_ranked_matches_row_number(spark, rows, k, desc):
    """global_topk_ranked (TakeOrderedAndProject + k×k rank join)
    must equal the window row_number() formulation for ANY input —
    including NULL order values — under Spark's default null
    ordering. This is the equivalence the BM25/ngram refactor rests
    on."""
    from pyspark.sql import Window

    from lol_data_pipeline_spark.operators.relational import global_topk_ranked

    uniq = {}
    for v, e in rows:
        uniq.setdefault(e, v)
    data = [(v, e) for e, v in uniq.items()]
    df = spark.createDataFrame(data, "score int, id long")
    got = sorted(
        (
            tuple(r)
            for r in global_topk_ranked(
                df, [("score", desc), ("id", False)], k
            ).collect()
        ),
        key=lambda t: t[-1],  # by rank; tuples may contain None
    )
    order = [
        F.col("score").desc() if desc else F.col("score").asc(),
        F.col("id").asc(),
    ]
    w = Window.orderBy(*order)
    want = sorted(
        (
            tuple(r)
            for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .collect()
        ),
        key=lambda t: t[-1],
    )
    assert got == want


@SLOW
@given(
    secs=st.lists(
        st.one_of(st.none(), st.integers(1_500_000_000, 1_700_000_000)),
        min_size=1,
        max_size=30,
    ),
    n=st.integers(2, 5),
)
def test_time_slices_partition_any_input(spark, secs, n):
    """time_slices must produce a PARTITION of any input (full
    coverage, no duplication, no empties) with slices time-ordered —
    including NULL timestamps and arbitrarily skewed distributions."""
    from lol_data_pipeline_spark.streaming.windows import time_slices

    rows = [
        (i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None) if s is not None else None)
        for i, s in enumerate(secs)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    parts = time_slices(df, "ts", n)
    ids = [sorted(r.event_id for r in p.collect()) for p in parts]
    flat = sorted(x for chunk in ids for x in chunk)
    assert flat == list(range(len(secs)))  # partition: cover + no dup
    assert all(chunk for chunk in ids)  # no empty staged batch
    non_null = [
        [r.ts for r in p.collect() if r.ts is not None] for p in parts
    ]
    for a, b in zip(non_null, non_null[1:]):
        if a and b:
            assert max(a) <= min(b)  # time-ordered across slices


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=8, max_size=14).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_substring_dedup_clone_has_full_ratio(spark, docs):
    """Cloning any document makes EVERY one of its windows shared —
    the clone pair must both report dup_ratio 1.0, and ratios are
    always within [0, 1]. (The defining invariant of the
    posting-list window-dedup operator, independent of the oracle.)"""
    from pyspark.sql import Row

    from lol_data_pipeline_spark.operators.dedup import substring_dup_stats

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    clone_src = rows[0]
    rows.append(Row(doc_id=len(rows), text=clone_src.text))
    out = {r["doc_id"]: r for r in substring_dup_stats(spark.createDataFrame(rows), n=8).collect()}
    assert out[clone_src.doc_id]["dup_ratio"] == 1.0
    assert out[len(rows) - 1]["dup_ratio"] == 1.0
    for r in out.values():
        assert 0.0 <= r["dup_ratio"] <= 1.0
        assert r["n_dup_windows"] <= r["n_windows"]


@SLOW
@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 50),  # price (small int domain forces ties)
            st.integers(1, 20),  # size
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_bucket_pruning_equals_bruteforce(spark, pts):
    """The banded-pruning skyline must return EXACTLY the brute-force
    Pareto frontier for arbitrary point sets — including degenerate
    all-same-price inputs and heavy ties, where the pruning phase
    contributes nothing and correctness rests on the exact pass."""
    from pyspark.sql import Row

    from lol_data_pipeline_spark.plans import REGISTRY  # noqa: F401  (module import side effects)
    import lol_data_pipeline_spark.plans.behavior as bh

    df = spark.createDataFrame(
        [Row(p_partkey=i, p_size=s, p_retailprice=float(p)) for i, (p, s) in enumerate(pts)]
    )
    # production plan body on the arbitrary frame
    scal = df.agg(F.min("p_retailprice").alias("mn"), F.max("p_retailprice").alias("mx"))
    bucket_sql = (
        "least(31, greatest(0, CAST(floor((p_retailprice - mn) * 32.0 / (mx - mn + 1e-9)) AS INT)))"
    )
    banded = df.join(F.broadcast(scal)).withColumn("b", F.expr(bucket_sql))
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
    q = cand.select(F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size"))
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") > F.col("p_size")))
    )
    got = {
        r["p_partkey"]
        for r in cand.join(F.broadcast(q), dominated, "left_anti").collect()
    }

    def dom(a, b):
        return a[0] <= b[0] and a[1] >= b[1] and (a[0] < b[0] or a[1] > b[1])

    want = {
        i
        for i, (p, s) in enumerate(pts)
        if not any(dom((p2, s2), (p, s)) for (p2, s2) in pts)
    }
    assert got == want


@SLOW
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=30,
    )
)
def test_ks_grid_cdf_monotone_and_bounded(spark, vals):
    """Grid CDF counts are non-decreasing in the cut index and end at
    n on the last cut (value <= max always true) — for any sample."""
    from pyspark.sql import Row

    import lol_data_pipeline_spark.plans.behavior as bh

    df = spark.createDataFrame([Row(event_type="g", value=float(v)) for v in vals])
    scal = df.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    wide = (
        df.join(F.broadcast(scal))
        .groupBy("event_type")
        .agg(
            *[
                F.sum(F.expr(f"CASE WHEN value <= {bh._ks_cut(i)} THEN 1 ELSE 0 END")).alias(
                    f"c{i}"
                )
                for i in range(1, bh._KS_CUTS + 1)
            ]
        )
    )
    r = wide.collect()[0]
    counts = [r[f"c{i}"] for i in range(1, bh._KS_CUTS + 1)]
    assert counts == sorted(counts)
    assert counts[-1] == len(vals)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),        # user_id
            st.integers(0, 5 * 24 * 60),  # minutes offset over 5 days
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_interval_overlap_bucketing_equals_bruteforce(spark, events):
    """The day-bucketed overlap join must equal a brute-force
    sessions×windows overlap for arbitrary event layouts — including
    sessions crossing midnight and spanning multiple days (chains of
    <30-min gaps), the cases where a bucketing bug would double-count
    or drop a pair."""
    from pyspark.sql import Row

    import lol_data_pipeline_spark.plans.behavior as bh

    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        Row(user_id=u, event_id=i, ts=base + dt.timedelta(minutes=m))
        for i, (u, m) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["day"].isoformat(): (r["n_sessions"], r["n_users"], r["overlap_ms"])
        for r in bh._overlap_report(df).collect()
    }

    # brute force in python: sessionize, enumerate windows, overlap
    GAP = dt.timedelta(milliseconds=bh._SESSION_GAP_MS)
    by_user = {}
    for u, m in events:
        by_user.setdefault(u, []).append(base + dt.timedelta(minutes=m))
    sessions = []
    for u, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        for t in tss[1:]:
            if t - prev > GAP:
                sessions.append((u, start, prev))
                start = t
            prev = t
        sessions.append((u, start, prev))
    days = sorted({(base + dt.timedelta(minutes=m)).date() for _, m in events})
    want = {}
    for d in days:
        w0 = dt.datetime(d.year, d.month, d.day, 2, 0, 0)
        w1 = dt.datetime(d.year, d.month, d.day, 4, 0, 0)
        hits = [
            (u, s, e) for (u, s, e) in sessions if s <= w1 and e >= w0
        ]
        if hits:
            ms = sum(
                int((min(e, w1) - max(s, w0)).total_seconds() * 1000)
                for (_, s, e) in hits
            )
            want[d.isoformat()] = (len(hits), len({u for u, _, _ in hits}), ms)
    assert got == want


@SLOW
@given(
    n_tokens=st.lists(st.integers(0, 200), min_size=1, max_size=30),
)
def test_length_bucket_report_matches_python_model(spark, n_tokens):
    """For ANY distribution of document lengths, the bucket report
    must equal a direct Python computation: ladder assignment, token
    accounting, and the exact integer basis-point padding ratio."""
    from lol_data_pipeline_spark.plans.curation import (
        _LADDER,
        _TOP_CAP,
        length_bucket_report,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(n_tokens)],
        "doc_id long, text string",
    )
    got = {
        r.bucket_cap: r for r in length_bucket_report(docs).collect()
    }

    def cap_of(n):
        for c in _LADDER:
            if n <= c:
                return c
        return _TOP_CAP

    model: dict = {}
    for n in n_tokens:
        c = cap_of(n)
        m = model.setdefault(c, dict(n_docs=0, sum=0, kept=0, pad=0, trunc=0))
        m["n_docs"] += 1
        m["sum"] += n
        m["kept"] += min(n, c)
        m["pad"] += c - min(n, c)
        m["trunc"] += max(n - c, 0)
    assert set(got) == set(model)
    for c, m in model.items():
        r = got[c]
        assert (r.n_docs, r.sum_tokens, r.kept_tokens, r.pad_tokens, r.trunc_tokens) == (
            m["n_docs"], m["sum"], m["kept"], m["pad"], m["trunc"]
        )
        assert r.pad_bp == (10000 * m["pad"]) // (m["n_docs"] * c)


@SLOW
@given(
    # groups of duplicated texts: (distinct word-seed, copies)
    groups=st.lists(
        st.tuples(st.integers(0, 9), st.integers(1, 5)),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
def test_softweight_report_matches_python_model(spark, groups):
    """For corpora with REAL duplicate groups (which the small
    testdata scales lack), every member's group_size and exact
    integer weight must match a direct Python computation, case and
    punctuation variants must collapse into the same group, and
    exactly one canonical member (the minimum doc_id) must be
    flagged per group."""
    from lol_data_pipeline_spark.plans.curation import softweight_report

    rows, doc_id = [], 0
    expected_group = {}  # doc_id -> seed
    for seed, copies in groups:
        base = f"doc body number {seed} for softweight"
        for j in range(copies):
            # vary case/punctuation per copy: normalization must fold it
            text = base.upper() if j % 2 else base + "!!"
            rows.append((doc_id, text))
            expected_group[doc_id] = seed
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in softweight_report(docs).collect()}
    assert set(out) == set(expected_group)
    sizes = {}
    for d, seed in expected_group.items():
        sizes[seed] = sizes.get(seed, 0) + 1
    canon = {}
    for d, seed in expected_group.items():
        canon[seed] = min(canon.get(seed, d), d)
    for d, r in out.items():
        seed = expected_group[d]
        assert r.group_size == sizes[seed], r
        assert r.weight_bp == 10000 // sizes[seed], r
        assert r.is_canonical == (d == canon[seed]), r


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=10,
    )
)
def test_kmeans_training_objective_monotone(spark, vals):
    """Lloyd's guarantee, fixed-point edition: the quantization
    objective J(cents) = Σ min_c |x − c|² must be non-increasing
    across update rounds for ARBITRARY inputs — each update step
    recomputes per-cluster means (exact up to the 2^-20 fixed-point
    grid) and each assignment step picks the nearer centroid. The
    epsilon absorbs the quantization: a snapped mean is within
    dim·2^-20 per coordinate of the true minimizer, so the per-round
    J regression is bounded far below 1e-3·N."""
    from lol_data_pipeline_spark.operators.clustering import kmeans_train

    rows = [(i, [float(v) for v in vec]) for i, vec in enumerate(vals)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    import numpy as np

    x = np.array(
        [list(r.embedding) for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )

    def j(cents):
        c = np.array([v for _, v in cents])
        return float(((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).min(axis=1).sum())

    prev = None
    for r in range(3):
        cur = j(kmeans_train(emb, k=2, rounds=r, dim=4))
        if prev is not None:
            assert cur <= prev + 1e-3 * len(vals), (r, cur, prev)
        prev = cur


@given(
    media_id=st.integers(min_value=0, max_value=10**9),
    perturb=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_phash_byte_roundtrip_equals_arithmetic(media_id, perturb):
    """For ANY id, the signature computed by synthesizing real BMP
    bytes and parsing the pixels back out equals the signature from
    the raw pixel arithmetic — the premise every phash oracle rests
    on (the oracle only ever sees the arithmetic)."""
    from lol_data_pipeline_spark.operators.multimodal import (
        DHASH_H,
        DHASH_W,
        _gray,
        dhash64,
        parse_bmp_gray,
        synthesize_gray_bmp,
    )

    via_bytes = dhash64(parse_bmp_gray(synthesize_gray_bmp(media_id, perturb)))
    grid = [
        [
            (_gray(media_id, x, y) + (128 if perturb and x == 0 and y == 0 else 0))
            % 256
            for x in range(DHASH_W)
        ]
        for y in range(DHASH_H)
    ]
    assert via_bytes == dhash64(grid)
    # signed-int64 two's complement domain
    assert -(2**63) <= via_bytes < 2**63


@given(media_id=st.integers(min_value=0, max_value=10**9))
@settings(max_examples=60, deadline=None)
def test_phash_twin_within_one_bit(media_id):
    """dHash is column-local: the 1-pixel perturbation flips at most
    the single bit whose comparison reads pixel (0,0)."""
    from lol_data_pipeline_spark.operators.multimodal import (
        dhash64,
        parse_bmp_gray,
        synthesize_gray_bmp,
    )

    a = dhash64(parse_bmp_gray(synthesize_gray_bmp(media_id, False)))
    b = dhash64(parse_bmp_gray(synthesize_gray_bmp(media_id, True)))
    assert bin((a ^ b) & (2**64 - 1)).count("1") <= 1
