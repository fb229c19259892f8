"""Corpus-curation operators: semantics + physical-plan posture
(scan-speed ops must not shuffle; decontamination must broadcast the
benchmark index)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans import REGISTRY
from tests.test_plan_hygiene import physical_plan


def test_scan_speed_ops_have_no_exchange(spark, sf_dir):
    """PII scrub, repetition, quality filter, and hash sampling are
    per-row projections/filters — a key-shuffle (hashpartitioning
    Exchange) in their plan is a scale regression. (The round-robin
    widen() repartition is allowed: it exists to parallelize
    single-file local scans and is a no-op at scale.)"""
    for name in (
        "corpus_pii_scrub",
        "corpus_repetition",
        "corpus_quality_filter",
        "corpus_sample_stratified",
    ):
        assert "Exchange hashpartitioning" not in physical_plan(spark, sf_dir, name), name


def test_pack_single_shuffle_decontaminate_broadcasts(spark, sf_dir):
    pack = physical_plan(spark, sf_dir, "corpus_pack_token_budget")
    assert pack.count("Exchange hashpartitioning") == 1
    deco = physical_plan(spark, sf_dir, "corpus_decontaminate")
    assert "BroadcastHashJoin" in deco and "CartesianProduct" not in deco


def test_pii_scrub_redacts_all_injected(spark, sf_dir):
    rows = REGISTRY["corpus_pii_scrub"].fn(spark, sf_dir).limit(20).collect()
    for r in rows:
        assert "<EMAIL>" in r.scrubbed and "<PHONE>" in r.scrubbed and "<SSN>" in r.scrubbed
        assert "@" not in r.scrubbed
        assert r.n_emails >= 1 and r.n_ssn_like >= 1


def test_pack_token_budget_bins(spark, sf_dir):
    out = REGISTRY["corpus_pack_token_budget"].fn(spark, sf_dir)
    per_src = (
        out.groupBy("source")
        .agg(F.sum("n_tok").alias("total"), F.max("bin_id").alias("last_bin"))
        .collect()
    )
    for r in per_src:
        assert r.last_bin == (r.total - 1) // 2048  # greedy fill leaves no empty bins
    # bin ids are non-decreasing in doc order within a source
    w_bad = (
        out.withColumn(
            "prev_bin",
            F.lag("bin_id").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "source"
                ).orderBy("doc_id")
            ),
        )
        .filter(F.col("prev_bin") > F.col("bin_id"))
        .count()
    )
    assert w_bad == 0


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    q = REGISTRY["corpus_sample_stratified"].fn
    a = {r.doc_id for r in q(spark, sf_dir).collect()}
    b = {r.doc_id for r in q(spark, sf_dir).collect()}
    assert a == b  # partitioning-independent determinism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept_en = len([1 for r in q(spark, sf_dir).collect() if r.lang == "en"])
    total_en = docs.filter(F.col("lang") == "en").count()
    assert 0.3 <= kept_en / total_en <= 0.7  # ~50% target, loose bounds


def test_decontaminate_excludes_benchmark_sources(spark, sf_dir):
    rows = REGISTRY["corpus_decontaminate"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench_ids = {
        r.doc_id for r in docs.filter(F.col("source").isin("src0", "src1")).collect()
    }
    for r in rows:
        assert r.doc_id not in bench_ids
        assert r.contaminated == (r.n_shared >= 3)


def test_leakage_safe_split_no_component_straddles(spark, sf_dir):
    """The defining property: no near-dup component has members on
    both sides of the split — and the property is non-vacuous (at
    least one multi-doc component exists, and both splits are
    non-empty)."""
    out = REGISTRY["corpus_leakage_safe_split"].fn(spark, sf_dir)
    per_comp = out.groupBy("component").agg(
        F.countDistinct("split").alias("n_sides"),
        F.count("*").alias("n_docs"),
    )
    assert per_comp.filter(F.col("n_sides") > 1).count() == 0
    assert per_comp.filter(F.col("n_docs") > 1).count() > 0
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "eval"}
    # doc-id-hash splitting WOULD leak on this corpus: some multi-doc
    # component contains ids that hash to different sides
    from lol_data_pipeline_spark.functions.scalar import md5_long

    naive = out.withColumn(
        "naive_side",
        F.pmod(md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), F.lit(100)) < 10,
    )
    leaky = (
        naive.groupBy("component")
        .agg(F.countDistinct("naive_side").alias("n"), F.count("*").alias("sz"))
        .filter((F.col("n") > 1) & (F.col("sz") > 1))
        .count()
    )
    assert leaky > 0  # the component-keyed split is doing real work
