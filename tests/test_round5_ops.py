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
from tests.conftest import SF_SMALL as SF


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
    """The PRODUCTION plan body (operators.dedup.substring_dup_stats)
    on an arbitrary documents frame — the registered fn only differs
    by reading its input from sf_dir, so these tests exercise the
    real code path, not a copy that can drift."""
    from lol_data_pipeline_spark.operators.dedup import substring_dup_stats

    return substring_dup_stats(docs, n=8)


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


# ---------------------------------------------------------------- dedup_incremental_minhash


def test_incremental_probe_is_asymmetric_subset(spark, sf_dir):
    """Every probe pair is (new, index) — never new↔new or
    index↔index — and coincides with the symmetric LSH result
    restricted to cross-batch pairs."""
    from lol_data_pipeline_spark.io import load_table
    from lol_data_pipeline_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.pmod(F.col("doc_id"), F.lit(5)) == 0
    probe = dd.minhash_lsh_probe(docs, is_new=is_new, k=16, bands=8, n=3, threshold=0.8)
    rows = probe.collect()
    for r in rows:
        assert r["id_new"] % 5 == 0
        assert r["id_index"] % 5 != 0
    sym = dd.minhash_lsh_pairs(docs, k=16, bands=8, n=3, threshold=0.8).collect()
    cross = {
        frozenset((r["id_a"], r["id_b"]))
        for r in sym
        if (r["id_a"] % 5 == 0) != (r["id_b"] % 5 == 0)
    }
    assert {frozenset((r["id_new"], r["id_index"])) for r in rows} == cross


# ---------------------------------------------------------------- text_tfidf_topterms


def test_tfidf_ranks_rare_term_over_common(spark):
    """A term unique to one doc must outscore a term present in all
    docs, whatever their tf — the defining property of IDF."""
    from lol_data_pipeline_spark.plans import REGISTRY

    out = REGISTRY["text_tfidf_topterms"].fn(spark, SF).collect()
    assert out
    for r in out:
        assert 1 <= r["rank"] <= 3
    # per-doc ranks dense from 1
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_tfidf_idf_property_synthetic(spark):
    from pyspark.sql import Row

    from lol_data_pipeline_spark.functions import text as tx

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common zebra"),
            Row(doc_id=2, text="common filler words here"),
            Row(doc_id=3, text="common more filler text"),
        ]
    )
    tf = (
        docs.select("doc_id", F.explode(tx.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6).alias(
                "score"
            ),
        )
        .collect()
    }
    # doc 1: 'zebra' (tf=1, df=1) must beat 'common' (tf=3, df=3)
    assert scored[(1, "zebra")] > scored[(1, "common")]


# ---------------------------------------------------------------- emb_label_centroids


def test_label_centroids_match_numpy_mean(spark, sf_dir):
    import numpy as np

    from lol_data_pipeline_spark.plans import REGISTRY

    # registry entry emits LONG format (label, n, pos, value) — see
    # the r08 comparator fix; rebuild per-label vectors from it
    rows = REGISTRY["emb_label_centroids"].fn(spark, sf_dir).collect()
    out_vec, out_n = {}, {}
    for r in rows:
        out_vec.setdefault(r["label"], {})[r["pos"]] = r["value"]
        out_n[r["label"]] = r["n"]
    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label = {}
    for r in raw:
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"], dtype=np.float64))
    for label, vecs in by_label.items():
        comps = out_vec[label]
        got = np.array([comps[p] for p in sorted(comps)])
        want = np.mean(vecs, axis=0)
        assert len(got) == len(want)
        # fixed-point floor loses < 2^-20 per element before averaging
        assert np.allclose(got, want, atol=2e-6)
        assert out_n[label] == len(vecs)


# ---------------------------------------------------------------- stat_mad_outliers


def test_mad_outliers_robust_to_single_wild_value(spark):
    """The MAD flag catches a planted wild value that z-score-with-
    inflated-σ logic would mask — the reason this operator exists."""
    from pyspark.sql import Row

    rows = [Row(event_type="t", value=float(v)) for v in range(100)] + [
        Row(event_type="t", value=1e9)
    ]
    ev = spark.createDataFrame(rows)
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    flagged = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("ad") > 3 * F.col("mad"))
        .collect()
    )
    assert any(r["value"] == 1e9 for r in flagged)
    # the bulk of the uniform range is NOT flagged
    assert len(flagged) < 30


# ---------------------------------------------------------------- partitioning invariance


def _identical_under_repartition(spark, build, parts=(1, 13)):
    """Collect `build(df)` under two pathological partitionings and
    assert BIT-identical rows — the distributed-determinism claim
    the fixed-point / hash-keyed docstrings make. `build` receives a
    repartitioned embeddings/documents frame and returns a
    DataFrame."""
    outs = []
    for p in parts:
        outs.append(sorted(map(tuple, build(p).collect())))
    assert outs[0] == outs[1]
    return outs[0]


def test_label_centroids_partitioning_invariant(spark, sf_dir):
    """Fixed-point integer accumulation ⇒ same centroid bits on any
    partitioning (a double sum would drift in the last ulp). Runs
    the PRODUCTION label_centroids, not a copy."""
    from lol_data_pipeline_spark.operators.clustering import label_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def build(p):
        out = label_centroids(emb.repartition(p))
        # flatten the array column so row tuples compare exactly
        return out.select("label", "n", F.expr("array_join(transform(centroid, x -> cast(x as string)), ',')").alias("c"))

    rows = _identical_under_repartition(spark, build)
    assert rows


def test_mixture_sample_partitioning_invariant(spark, sf_dir):
    """The md5 keep-decision must select the SAME docs/epochs on 1
    partition as on 13 — the reproducibility property sampleBy()
    lacks."""
    from lol_data_pipeline_spark.functions.scalar import md5_long
    from lol_data_pipeline_spark.plans.corpus import _MIX_WH

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build(p):
        d = docs.repartition(p)
        wh = F.lit(100)
        for s, w in _MIX_WH.items():
            wh = F.when(F.col("source") == s, F.lit(w)).otherwise(wh)
        h = F.pmod(md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), F.lit(100))
        total = (wh / 100).cast("int") + F.when(h < wh % 100, 1).otherwise(0)
        return (
            d.select("doc_id", "source", total.alias("total"))
            .filter(F.col("total") > 0)
            .select("doc_id", "source", F.explode(F.sequence(F.lit(0), F.col("total") - 1)).alias("epoch"))
        )

    rows = _identical_under_repartition(spark, build)
    assert rows


def test_incremental_probe_tolerates_user_is_new_column(spark, sf_dir):
    """A docs frame that already carries its own `is_new` column (the
    natural name for a batch flag) must not collide with the probe's
    internal flag, and NULL flags count as index-side rows."""
    from lol_data_pipeline_spark.io import load_table
    from lol_data_pipeline_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_new",
        F.when(F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.lit(True)).otherwise(
            F.lit(None).cast("boolean")
        ),
    )
    out = dd.minhash_lsh_probe(
        docs, is_new=F.col("is_new"), k=16, bands=8, n=3, threshold=0.8
    ).collect()
    # same pairs as the modulo-expression form (NULL ⇒ index side)
    want = dd.minhash_lsh_probe(
        load_table(spark, sf_dir, "documents"),
        is_new=(F.pmod(F.col("doc_id"), F.lit(5)) == 0),
        k=16, bands=8, n=3, threshold=0.8,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, want))
