"""Unit tests for composite operators (asof, topk, dedup family)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lol_data_pipeline_spark.operators.asof import asof_join_backward
from lol_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from lol_data_pipeline_spark.operators.relational import topk_per_group


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_latest(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "L1"), (1, ts("2024-01-01T09:00:00"), "L2"),
         (2, ts("2024-01-01T10:00:00"), "L3")],
        "k int, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:30:00"), 100), (1, ts("2024-01-01T10:00:00"), 200),
         (1, ts("2024-01-01T11:00:00"), 300)],
        "k int, ts timestamp, rid int",
    )
    out = asof_join_backward(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["rid"], tiebreak="rid"
    )
    got = {r.lbl: r.asof_rid for r in out.collect()}
    # L1 at 10:00 matches rid=200 (inclusive, latest); L2 at 09:00 has
    # no prior right row; key 2 has no right rows at all.
    assert got == {"L1": 200, "L2": None, "L3": None}


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id int, v double",
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 2)
    got = sorted((r.g, r.id) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 4)]


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near-dup of 0
    (2, "completely different words about spark partitions and shuffles here"),
    (3, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 0
]


def test_asof_null_payload_field_does_not_mix_rows(spark):
    """A right row with NULL in one payload column must be carried
    atomically: the joined left row takes ALL payload fields from the
    latest right row (including its NULLs), never a blend of two
    right rows."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00:00"))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), 10, "old"),
         (1, ts("2024-01-01T11:00:00"), None, "new")],  # latest: rid NULL
        "k int, ts timestamp, rid int, tag string",
    )
    row = asof_join_backward(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["rid", "tag"]
    ).collect()[0]
    assert row.asof_tag == "new" and row.asof_rid is None  # not 10!


def test_exact_dedup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.keep_id: r.n_copies for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 3 identical, keep lowest id
    assert out[1] == 1 and out[2] == 1


def test_ngram_jaccard_finds_near_dup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_ngram_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """A stopword-heavy corpus (every doc shares one hot trigram) must
    not produce Σ(df²) candidate pairs once the cap drops the hot
    shingle: docs related ONLY through capped shingles yield no pairs,
    while genuinely similar docs still match."""
    hot = "the quick fox"
    rows = [(i, f"{hot} unique{i} tail{i} end{i}") for i in range(20)]
    rows += [(100, "aa bb cc dd ee"), (101, "aa bb cc dd ee")]  # true dup pair
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_shingle_df=5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}  # hot-shingle-only pairs gone, real dup kept
    uncapped = ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_shingle_df=None)
    assert uncapped.count() > 100  # without the cap: quadratic blowup


def test_minhash_lsh_recovers_exact_and_near_dups(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs  # exact dup always collides
    assert not any(2 in p for p in pairs)


def test_minhash_lsh_recall_assumption_holds_on_fixture(spark, sf_dir):
    """The registered dedup_minhash_lsh oracle is the EXACT all-pairs
    Jaccard answer, valid only while LSH (k=16, 8 bands) recalls every
    fixture pair at s>=0.8 (P[miss] = (1-s^2)^8 <= 3e-4 at the
    threshold). This guard fails locally if a future fixture contains
    a pair the bands miss — before the driver's value-hash gate does."""
    from lol_data_pipeline_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8, max_shingle_df=None).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, k=16, bands=8, n=3, threshold=0.8).collect()
    }
    assert lsh == exact  # verify-step ⇒ no false positives; bands ⇒ recall


def test_cosine_topk_arrow_rejects_oversized_query_set(spark):
    import pytest

    from lol_data_pipeline_spark.operators.similarity import cosine_topk_arrow

    from pyspark.sql import functions as F

    vecs = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_queries"):
        cosine_topk_arrow(vecs, vecs, k=3, max_queries=10)


def test_simhash_exact_dup_distance_zero(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs, max_hamming=6).collect()}
    assert pairs.get((0, 3)) == 0
    assert (0, 2) not in pairs


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.operators.relational import salted_join

    # pathologically skewed: 90% of big-side rows share one key
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k long, v long"
    )
    small = spark.createDataFrame([(i, f"d{i}") for i in range(100)], "k long, d string")
    got = salted_join(big, small, "k")
    want = big.join(small, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_agg_matches_plain_agg(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    from lol_data_pipeline_spark.operators.relational import salted_agg

    got = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            [("v", "count", "n"), ("v", "sum", "s"), ("v", "min", "mn"), ("v", "max", "mx")],
            salt=8,
        ).collect()
    }
    want = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0] and got[k][2:] == want[k][2:]
        assert abs(got[k][1] - want[k][1]) < 1e-6  # sum order differs


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest as _pytest

    from lol_data_pipeline_spark.operators.relational import salted_agg

    df = spark.range(1).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with _pytest.raises(ValueError):
        salted_agg(df, ["k"], [("v", "avg", "a")])


def test_topk_merge_is_deterministic_and_bounded():
    import pandas as pd

    from lol_data_pipeline_spark.streaming.stateful import _topk_merge

    batch = pd.DataFrame({"value": [5.0, 9.0, 9.0, 1.0], "event_id": [4, 2, 1, 9]})
    cur = _topk_merge([(7.0, 3)], iter([batch]), k=3)
    # value desc, event_id asc tie-break; bounded at k
    assert cur == [(9.0, 1), (9.0, 2), (7.0, 3)]
    # a later batch of smaller values cannot displace the current top
    low = pd.DataFrame({"value": [0.5, 0.1], "event_id": [100, 101]})
    assert _topk_merge(list(cur), iter([low]), k=3) == cur


def test_fuzzy_name_pairs_band_blocking_is_lossless(spark):
    """(noun, length band) blocking returns exactly the pairs that
    noun-only blocking + distance filter returns — band pruning only
    drops pairs the filter would kill (|len diff| > max_dist)."""
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.plans.extensions import fuzzy_name_pairs

    # one hot head noun, prefixes of many lengths, some near-dups
    rows = [(f"{'x' * (i % 37)}a{i} widget",) for i in range(120)]
    rows += [(f"{'x' * (i % 37)}b{i} widget",) for i in range(120)]  # dist-1 twins
    rows += [(f"other{i} gadget",) for i in range(20)]
    names = spark.createDataFrame(rows, ["name"]).distinct()

    got = fuzzy_name_pairs(names, max_dist=3)
    a, b = names.alias("a"), names.alias("b")
    want = (
        a.join(
            b,
            (
                F.element_at(F.split("a.name", " "), -1)
                == F.element_at(F.split("b.name", " "), -1)
            )
            & (F.col("a.name") < F.col("b.name")),
        )
        .withColumn("dist", F.levenshtein(F.col("a.name"), F.col("b.name")))
        .filter(F.col("dist") <= 3)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
    gs, ws = (sorted(map(tuple, d.collect())) for d in (got, want))
    assert gs == ws and len(gs) > 0


def test_fuzzy_band_key_bounds_hot_block(spark):
    """The de-skew claim, measured: with every name sharing one head
    noun, the noun-only key puts 100% of rows in one block; the
    (noun, band) key's largest block stays under 20%."""
    from pyspark.sql import functions as F

    rows = [(f"{'x' * (i % 41)}n{i} widget",) for i in range(400)]
    names = spark.createDataFrame(rows, ["name"])
    keyed = names.select(
        F.element_at(F.split("name", " "), -1).alias("noun"),
        F.floor(F.length("name") / 4).alias("band"),
    )
    total = names.count()
    noun_max = keyed.groupBy("noun").count().agg(F.max("count")).first()[0]
    band_max = keyed.groupBy("noun", "band").count().agg(F.max("count")).first()[0]
    assert noun_max == total  # the skewed baseline
    assert band_max / total < 0.20, band_max


def test_salted_exchange_spreads_hot_key(spark):
    """The skew datapoint behind salted_join/salted_agg, measured:
    with 95% of rows on ONE key, the plain keyed exchange sends ~95%
    of the data to a single reducer partition (the straggler that
    dominates wall-clock at 100 TB); salting the same exchange caps
    the largest partition at a small multiple of the mean. Numbers
    recorded in PERF_NOTES.md."""
    from pyspark.sql import functions as F

    # salt ≫ partitions: with salt == p, several of the hot key's 16
    # sub-keys hash into one partition (balls-into-bins) and the max
    # stays ~4× the mean; 64 sub-keys over 16 partitions smooth it
    n, p, salt = 60_000, 16, 64
    hot = spark.range(n).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k")
    )

    def max_partition_rows(df):
        sizes = (
            df.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in sizes)

    plain = max_partition_rows(hot.repartition(p, F.col("k")))
    salted = max_partition_rows(
        hot.withColumn(
            "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
        ).repartition(p, F.col("k"), F.col("__salt"))
    )
    assert plain >= 0.95 * n  # the straggler is real
    assert salted < plain / 4  # salting breaks it
    assert salted < 3 * (n / p)  # and lands near the balanced mean


def test_global_topk_ranked_null_order_column(spark):
    """Review-pinned: a NULL in a non-last order column must rank
    where the sort puts it (desc -> NULLS LAST), not vacuously match
    no peers and steal rank 1."""
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.operators.relational import global_topk_ranked

    rows = [(1, 10.0), (2, None), (3, 30.0), (4, 20.0)]
    df = spark.createDataFrame(rows, "id long, score double")
    got = {
        r["id"]: r["rank"]
        for r in global_topk_ranked(df, [("score", True), ("id", False)], 4).collect()
    }
    assert got == {3: 1, 4: 2, 1: 3, 2: 4}  # NULL score ranks last
