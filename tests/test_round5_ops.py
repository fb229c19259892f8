"""Behavioral tests for the round-5 operator batch: substring-level
dedup, k-NN graph, gap-fill/LOCF, mixture sampling, unpivot
profiling, correlation matrix.

Oracle parity (tests/test_parity_all.py + tools/check_parity.py)
already pins exact values; these tests pin the SEMANTIC invariants a
refactor could silently break while still matching a co-refactored
oracle.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lol_data_pipeline_spark.operators.similarity import knn_graph
from lol_data_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- dedup_substring


def test_substring_dedup_flags_copied_paragraph(spark):
    """A doc sharing an 8-token span with another doc is flagged;
    fully unique docs have ratio 0 — the doc-level-miss case this
    operator exists for."""
    span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"unique one {span} tail words here"),
            Row(doc_id=2, text=f"other page entirely {span} and more stuff"),
            Row(doc_id=3, text="completely different text with no overlap " * 3),
        ]
    )
    out = {r["doc_id"]: r for r in _run_substring(spark, docs).collect()}
    assert out[1]["n_dup_windows"] >= 1
    assert out[2]["n_dup_windows"] >= 1
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dup_ratio"] == 0.0
    assert 0.0 <= out[1]["dup_ratio"] <= 1.0


def _run_substring(spark, docs):
    """Run the dedup_substring plan body on an arbitrary documents
    frame by monkey-loading it through a temp view — the registered
    fn reads from sf_dir, so rebuild the same plan inline."""
    from lol_data_pipeline_spark.caching import tracked_persist
    from lol_data_pipeline_spark.functions import text as tx
    from lol_data_pipeline_spark.functions.scalar import md5_long

    sh = tx.word_shingle_arrays(docs, n=8, keep=["doc_id"], out_col="s")
    pairs = tracked_persist(
        sh.select("doc_id", F.explode("s").alias("w"))
        .select("doc_id", md5_long("w").alias("h"))
        .dropDuplicates(["doc_id", "h"])
    )
    base = pairs.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_windows"))
    dup = pairs.groupBy("h").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2).select("h")
    cnt = pairs.join(dup, "h").groupBy("doc_id").agg(F.count("*").cast("long").alias("n_dup"))
    return base.join(cnt, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.round(F.coalesce("n_dup", F.lit(0)) * F.lit(1.0) / F.col("n_windows"), 4).alias(
            "dup_ratio"
        ),
    )


def test_substring_dedup_short_docs_absent(spark):
    """Docs under 8 tokens produce no windows and are absent from the
    output (not a divide-by-zero row)."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="too short"), Row(doc_id=2, text="a b c d e f g h i")]
    )
    out = _run_substring(spark, docs).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["n_dup_windows"] == 0


# ---------------------------------------------------------------- emb_knn_graph


def test_knn_graph_no_self_edges_and_rank_bounded(spark, sf_dir):
    from lol_data_pipeline_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(emb, n_planes=4, k=3).collect()
    assert g, "graph should have edges on the fixture"
    assert all(r["src_id"] != r["dst_id"] for r in g)
    assert all(1 <= r["rank"] <= 3 for r in g)
    # per-source ranks are dense from 1 with no duplicates
    by_src = {}
    for r in g:
        by_src.setdefault(r["src_id"], []).append(r["rank"])
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_knn_graph_neighbors_share_code_semantics(spark):
    """Two identical vectors always find each other (same bucket,
    sim 1.0 at rank 1)."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.0, 0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[0.0, 0.0, 0.0, 1.0]),
        Row(vec_id=10, embedding=[0.5, 0.5, 0.1, 0.1]),
        Row(vec_id=11, embedding=[0.5, 0.5, 0.1, 0.1]),
    ]
    emb = spark.createDataFrame(rows).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    g = {(r["src_id"], r["dst_id"]): r for r in knn_graph(emb, n_planes=4, k=2).collect()}
    assert g[(10, 11)]["sim"] == 1.0 and g[(10, 11)]["rank"] == 1
    assert g[(11, 10)]["sim"] == 1.0 and g[(11, 10)]["rank"] == 1


# ---------------------------------------------------------------- rel_gap_fill_locf


def test_gap_fill_dense_spine_and_locf(spark):
    out = REGISTRY["rel_gap_fill_locf"].fn(spark, SF).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r["hour_ts"])
        # spine is dense hourly: consecutive rows exactly 1h apart
        for a, b in zip(rows, rows[1:]):
            assert (b["hour_ts"] - a["hour_ts"]).total_seconds() == 3600
        # LOCF: after the first observation, locf_avg never null and
        # equals the most recent non-null avg_value
        seen = None
        for r in rows:
            if r["avg_value"] is not None:
                seen = r["avg_value"]
            assert r["locf_avg"] == seen
        # gap rows exist on the fixture and carry n_events == 0
    assert any(r["n_events"] == 0 for r in out), "fixture should have hourly gaps"


# ---------------------------------------------------------------- corpus_mixture_sample


def test_mixture_sample_weights_and_determinism(spark):
    from lol_data_pipeline_spark.plans.corpus import _MIX_WH

    out1 = REGISTRY["corpus_mixture_sample"].fn(spark, SF).collect()
    out2 = REGISTRY["corpus_mixture_sample"].fn(spark, SF).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2)), "must be deterministic"
    per_doc = {}
    for r in out1:
        per_doc.setdefault((r["source"], r["doc_id"]), []).append(r["epoch"])
    for (src, _doc), epochs in per_doc.items():
        wh = _MIX_WH.get(src, 100)
        # epochs dense from 0, count within [floor(w), ceil(w)]
        assert sorted(epochs) == list(range(len(epochs)))
        assert wh // 100 <= len(epochs) <= wh // 100 + 1
    # a >=2x source upsamples every doc at least twice
    if any(s == "src0" for s, _ in per_doc):
        assert all(len(e) >= 2 for (s, _), e in per_doc.items() if s == "src0")


# ---------------------------------------------------------------- rel_unpivot / stat_corr_matrix


def test_unpivot_counts_equal_table_rows(spark):
    out = {r["measure"]: r for r in REGISTRY["rel_unpivot"].fn(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert set(out) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    assert all(r["n"] == n for r in out.values())


def test_corr_matrix_bounds_and_self_consistency(spark):
    out = REGISTRY["stat_corr_matrix"].fn(spark, SF).collect()
    assert len(out) == 6
    for r in out:
        assert -1.0 <= r["corr"] <= 1.0
    # all six ordered pairs present exactly once (synthetic columns
    # are independent, so values hover near 0 — parity pins them)
    d = {(r["col_a"], r["col_b"]) for r in out}
    assert len(d) == 6 and ("l_quantity", "l_extendedprice") in d
