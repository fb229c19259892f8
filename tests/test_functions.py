"""Unit tests for the scalar/text/flatten function catalog, covering
the reference quirks called out in SURVEY.md §2.3."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lol_data_pipeline_spark.functions import scalar, text as tx
from lol_data_pipeline_spark.functions.flatten import flatten


def test_epoch_ms_to_date(spark):
    df = spark.createDataFrame([(1672531200123,), (0,)], "ms long")
    out = df.select(scalar.epoch_ms_to_date_str("ms").alias("d")).collect()
    assert [r.d for r in out] == ["2023-01-01", "1970-01-01"]


def test_duration_units_sms_duality(spark):
    # reference utils.py:109-147: 's' when end ts present, else 'ms'
    df = spark.createDataFrame(
        [(1, 100), (2, None)], T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("end_ts", T.LongType()),
        ])
    )
    out = {r.id: r.u for r in df.select("id", scalar.duration_units("end_ts").alias("u")).collect()}
    assert out == {1: "s", 2: "ms"}


def test_map_lookup_queue_ids(spark):
    # reference utils.py:63-76
    df = spark.createDataFrame([("draft",), ("blind",), ("aram",), ("ranked",)], "q string")
    out = [r.qid for r in df.select(scalar.queue_id("q").alias("qid")).collect()]
    assert out == [400, 430, 450, None]


def test_array_find_pos_and_element(spark):
    # reference utils.py:93-107 (position) + 149-150 (extraction)
    df = spark.createDataFrame([(["a", "b", "c"],), (["x"],)], "arr array<string>")
    pos = scalar.array_find_pos("arr", F.lit("b"))
    out = df.select(pos.alias("p"), scalar.element_at_pos("arr", pos.cast("int")).alias("e")).collect()
    assert (out[0].p, out[0].e) == (2, "b")
    assert (out[1].p, out[1].e) == (None, None)


def test_md5_long_deterministic_and_seeded(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    r = df.select(
        scalar.md5_long("s").alias("h0"),
        scalar.md5_long("s").alias("h0b"),
        scalar.md5_long("s", seed=1).alias("h1"),
    ).collect()[0]
    assert r.h0 == r.h0b
    assert r.h0 != r.h1
    assert r.h0 == 648541476951500027  # = int(md5('abc')[:15], 16)


def test_flatten_struct_and_indexed_arrays(spark):
    # index-preserving flatten (divergence from reference utils.py:37-39
    # documented in functions/flatten.py)
    df = spark.createDataFrame(
        [
            (
                {"matchId": "NA1_1", "participants": ["p1", "p2"]},
                [{"kills": 1, "challenges": {"kda": 2.0}}, {"kills": 3, "challenges": {"kda": 4.0}}],
            )
        ],
        T.StructType(
            [
                T.StructField(
                    "metadata",
                    T.StructType(
                        [
                            T.StructField("matchId", T.StringType()),
                            T.StructField("participants", T.ArrayType(T.StringType())),
                        ]
                    ),
                ),
                T.StructField(
                    "info",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("kills", T.IntegerType()),
                                T.StructField(
                                    "challenges",
                                    T.StructType([T.StructField("kda", T.DoubleType())]),
                                ),
                            ]
                        )
                    ),
                ),
            ]
        ),
    )
    out = flatten(df, array_limit=3)
    row = out.collect()[0]
    assert row["metadata_matchId"] == "NA1_1"
    assert row["metadata_participants_0"] == "p1"
    assert row["metadata_participants_2"] is None  # past end → NULL
    assert row["info_0_kills"] == 1
    assert row["info_1_challenges_kda"] == 4.0
    # no leaf lost: every leaf of the schema appears exactly once
    assert len(out.columns) == 1 + 3 + 3 * 2


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("the  quick fox",), ("",)], "text string")
    out = df.select(tx.token_count("text").alias("n")).collect()
    assert [r.n for r in out] == [3, 0]


def test_lang_id_prefers_matching_stopwords(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat",), ("el gato y la casa es de un",)], "text string"
    )
    out = [r.l for r in df.select(tx.lang_id("text").alias("l")).collect()]
    assert out == ["en", "es"]


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("b a c",), ("c b a a",)], "text string")
    fps = [r.fp for r in df.select(tx.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(tx.word_shingles("text", 3).alias("sh")).collect()[0].sh
    assert out == ["a b c", "b c d"]


def test_word_shingles_short_doc_empty_not_descending(spark):
    """Docs with fewer than n tokens must yield NO shingles: a bare
    sequence(1, len-n+1) would DESCEND (sequence(1,0) == [1,0]) and
    hit an ANSI slice error at start index 0."""
    df = spark.createDataFrame([("a b",), ("a",), ("",)], "text string")
    out = [r.sh for r in df.select(tx.word_shingles("text", 3).alias("sh")).collect()]
    assert out == [[], [], []]


def test_char_shingles_short_string_empty(spark):
    df = spark.createDataFrame([("abc",), ("abcdefg",)], "text string")
    out = [r.sh for r in df.select(tx.char_shingles("text", 5).alias("sh")).collect()]
    assert out == [[], ["abcde", "bcdef", "cdefg"]]


def test_word_shingle_arrays_matches_expression_form(spark):
    """The projection-barrier fast path and the expression form agree."""
    df = spark.createDataFrame(
        [(1, "w x y z w x y"), (2, "a b"), (3, "p q r")], "id long, text string"
    )
    fast = {
        r.id: sorted(r.sh_arr)
        for r in tx.word_shingle_arrays(df, 3, "text", keep=["id"]).collect()
    }
    expr = {
        r.id: sorted(r.sh)
        for r in df.select(
            "id", F.array_distinct(tx.word_shingles("text", 3)).alias("sh")
        ).collect()
    }
    assert fast == expr


def test_ts_from_epoch_detects_all_units(spark):
    """The round-3 streaming bug was a hard-coded epoch unit; the
    shared normalizer must map the SAME instant expressed in s / ms /
    us / ns to the SAME timestamp."""
    import datetime as dt

    from lol_data_pipeline_spark.io import ts_from_epoch

    base_us = 1_704_067_798_778_549  # 2024-01-01T00:09:58.778549
    rows = [
        ("s", base_us // 1_000_000),
        ("ms", base_us // 1_000),
        ("us", base_us),
        ("ns", base_us * 1_000),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "unit string, ts long").select(
        "unit", ts_from_epoch("ts").alias("t")
    )
    got = {r.unit: r.t for r in df.collect()}
    full = dt.datetime(2024, 1, 1, 0, 9, 58, 778549)
    assert got["us"] == full and got["ns"] == full
    assert got["ms"] == full.replace(microsecond=778000)
    assert got["s"] == full.replace(microsecond=0)
    assert got["null"] is None


def test_ts_from_epoch_rejects_out_of_window_values(spark):
    """Epochs outside the detectable 1973–5138 window must be NULL,
    not a plausible-but-wrong instant: negatives (pre-1970), zero,
    and small positives (pre-1973 seconds, ambiguous with ms/us/ns
    of other eras)."""
    from lol_data_pipeline_spark.io import ts_from_epoch

    rows = [("neg", -1_704_067_798), ("zero", 0), ("small", 99_999_999),
            ("edge_ok", 100_000_001)]
    df = spark.createDataFrame(rows, "unit string, ts long").select(
        "unit", ts_from_epoch("ts").alias("t")
    )
    got = {r.unit: r.t for r in df.collect()}
    assert got["neg"] is None and got["zero"] is None and got["small"] is None
    assert got["edge_ok"] is not None  # 1973-03-03, seconds branch


def test_round_tie_divergence_and_snap_agreement(spark):
    """Regression doc-test for the sf0.1 sweep finding: on the exact
    value 15121200/32/10000 (a mean whose scaled numerator is an
    exact integer), double round(x, 4) DISAGREES between engines
    (Spark 47.2538 via decimal-expansion half-up, DuckDB 47.2537),
    while the shared floor(x·10⁴ + 0.5) snap produces the same
    result in both — the property functions.scalar.snap /
    plans.queries.snap_sql exist to guarantee. If an engine upgrade
    changes either behavior, this test localizes it immediately."""
    import duckdb

    expr_round = "round(CAST(15121200 AS DOUBLE)/32/CAST(10000 AS DOUBLE), 4)"
    expr_snap = (
        "CAST(floor(CAST(15121200 AS DOUBLE)/32/CAST(10000 AS DOUBLE)*10000 + 0.5)"
        " AS BIGINT)/CAST(10000 AS DOUBLE)"
    )
    s_round = spark.sql(f"SELECT {expr_round}").collect()[0][0]
    s_snap = spark.sql(f"SELECT {expr_snap}").collect()[0][0]
    d_round = duckdb.sql(f"SELECT {expr_round}").fetchone()[0]
    d_snap = duckdb.sql(f"SELECT {expr_snap}").fetchone()[0]
    # identical float ops -> identical snap on both engines
    assert s_snap == d_snap
    # the round() forms are allowed to differ (they do today:
    # 47.2538 vs 47.2537); what matters is each engine's round stays
    # self-consistent with what the snap policy was calibrated on
    assert (s_round, d_round) == (47.2538, 47.2537) or s_round == d_round
