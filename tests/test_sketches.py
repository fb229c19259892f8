"""Sketch invariants: the properties that hold for ANY input, beyond
the oracle's value-equality check (Count-Min never under-counts,
Bloom never false-negatives, SQ-ANN candidate recall ⊇ exact top-1
when quantization is lossless, HLL register merge = max)."""

from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_countmin_never_undercounts(spark, sf_dir):
    rows = _run("sketch_countmin_freq", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cm_estimate >= r.exact_n, r


def test_bloom_no_false_negatives(spark, sf_dir):
    rows = _run("sketch_bloom_membership", spark, sf_dir).collect()
    assert rows
    present = [r for r in rows if r.actually_present]
    assert present
    for r in present:
        assert r.bloom_maybe, f"false negative for custkey {r.c_custkey}"


def test_hll_estimate_within_classic_error(spark, sf_dir):
    # classic HLL standard error = 1.04/sqrt(m); allow 5 sigma.
    rows = _run("sketch_hll_distinct", spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r.hll_estimate - r.exact_distinct) / max(r.exact_distinct, 1)
        assert rel < 5 * 1.04 / (256**0.5), r


def test_sq_topk_matches_exact_on_clean_margin(spark, sf_dir):
    """With refine*k=20 candidates over well-separated synthetic
    embeddings, the rescored top-1 per query should equal exact
    brute-force top-1 for nearly all queries (quantization to int8
    preserves large margins)."""
    sq = {
        (r.query_id, r.rank): r.match_id
        for r in _run("ann_sq_topk", spark, sf_dir).collect()
    }
    exact = {
        (r.query_id, r.rank): r.match_id
        for r in _run("ann_cosine_topk", spark, sf_dir).collect()
    }
    q_ids = {q for q, _ in exact}
    agree = sum(1 for q in q_ids if sq.get((q, 1)) == exact.get((q, 1)))
    assert agree >= int(0.8 * len(q_ids)), (agree, len(q_ids))


def test_stream_ingest_ids_exactly_once(spark, sf_dir):
    out = _run("stream_ingest_ids", spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 1200
    assert len({(r.match_id, r.queue_type) for r in rows}) == 1200


def test_keep_first_removes_only_group_members(spark, sf_dir):
    """Every removed doc must appear as a drop=true member of a
    component, and every kept group representative survives."""
    from lol_data_pipeline_spark.plans.queries import T

    docs = {r.doc_id for r in T(spark, sf_dir, "documents").select("doc_id").collect()}
    kept = {r.doc_id for r in _run("corpus_dedup_keep_first", spark, sf_dir).collect()}
    groups = _run("dedup_components", spark, sf_dir).collect()
    dropped = {r.doc_id for r in groups if r.drop}
    reps = {r.keep_id for r in groups}
    assert docs - kept == dropped
    assert reps <= kept


def test_kmv_setops_estimates_bracket_truth(spark, sf_dir):
    from lol_data_pipeline_spark.plans import REGISTRY

    r = REGISTRY["sketch_kmv_setops"].fn(spark, sf_dir).first()
    # k=64 KMV: relative error ~1/sqrt(k-1) ≈ 13%; allow 3 sigma
    assert abs(r.union_est - r.exact_union) / r.exact_union < 0.4
    assert 0.0 <= r.jaccard_est <= 1.0
    assert r.intersect_est <= r.union_est


def test_hll_rolling_estimate_tracks_exact(spark):
    """The rolling HLL estimate must sit within the standard-error
    envelope of the exact WAU (m=256 → σ ≈ 1.04/√256 ≈ 6.5%; allow
    4σ), and merged-window registers must dominate each member day's
    registers (mergeability = max is monotone)."""
    from lol_data_pipeline_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL as SF

    rows = REGISTRY["sketch_hll_rolling"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        err = abs(r["hll_wau"] - r["wau_exact"]) / max(r["wau_exact"], 1)
        assert err < 4 * 1.04 / (256 ** 0.5), (r, err)
        assert 1 <= r["n_used"] <= 256
