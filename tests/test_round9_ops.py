"""Round-9 operator tests: IVF+PQ composition and the kmeans-trained
IVF index (vs the deterministic-seed index it upgrades)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lol_data_pipeline_spark.operators.clustering import kmeans_cells, kmeans_train
from lol_data_pipeline_spark.operators.similarity import assign_ivf_cells
from lol_data_pipeline_spark.plans import REGISTRY
from lol_data_pipeline_spark.plans.round9 import (
    _IVF_CELLS,
    _K,
    _KM_ROUNDS,
    _KMQ_HI,
    _KMQ_LO,
    _KMQ_TAIL_HI,
    _KMQ_TAIL_LO,
    _NPROBE,
    _NQ,
)


def _matches_by_query(rows):
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.match_id)
    return by_q


def _exact_topk(emb_rows, queries, k):
    """Ground-truth top-k by rounded cosine (match the engines'
    round-to-6 then (sim desc, id asc) total order)."""
    ids = np.array([r.vec_id for r in emb_rows])
    x = np.array([list(r.embedding) for r in emb_rows], dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1)
    out = {}
    for q in queries:
        qi = int(np.where(ids == q)[0][0])
        sims = np.round(x @ x[qi] / (nrm * nrm[qi]), 6)
        sims[qi] = -np.inf
        order = np.lexsort((ids, -sims))[:k]
        out[q] = set(int(ids[i]) for i in order)
    return out


def test_ivfpq_output_semantics(spark, sf_dir):
    """Dense ranks 1..n<=k per query in (sim desc, id asc) order;
    probe_rank within 1..nprobe; and matches recovered by probe 2
    exist (otherwise the multi-probe half of the composition is
    dead weight and nprobe=1 would be the honest entry)."""
    rows = REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir).collect()
    assert all(1 <= r.probe_rank <= _NPROBE for r in rows)
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(_NQ))
    for qid, ms in by_q.items():
        ms.sort(key=lambda r: r.rank)
        assert [m.rank for m in ms] == list(range(1, len(ms) + 1))
        assert len(ms) <= _K
        order = [(-m.sim, m.match_id) for m in ms]
        assert order == sorted(order)
    assert any(r.probe_rank == 2 for r in rows)


def test_ivfpq_recall_vs_exact_and_pq(spark, sf_dir):
    """The composition must stay useful: >=60% recall of the exact
    top-k at this SF (measured 34/50), and — because cell locality
    correlates with true neighbourhoods, filtering ADC's mistakes —
    not below the unpartitioned PQ entry (measured 29/50). Both
    sides are deterministic; if a testdata regeneration shifts them,
    re-measure and loosen deliberately, don't delete."""
    emb_rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    exact = _exact_topk(emb_rows, range(_NQ), _K)
    ivfpq = _matches_by_query(REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir).collect())
    pq = _matches_by_query(REGISTRY["ann_pq_topk"].fn(spark, sf_dir).collect())
    ivfpq_recall = sum(len(ivfpq.get(q, set()) & exact[q]) for q in exact)
    pq_recall = sum(len(pq.get(q, set()) & exact[q]) for q in exact)
    assert ivfpq_recall >= 0.6 * _K * _NQ, ivfpq_recall
    assert ivfpq_recall >= pq_recall, (ivfpq_recall, pq_recall)


def test_ivfpq_residual_when_it_helps_and_when_it_does_not(spark, sf_dir):
    """Residual PQ (IVFADC's by_residual=True) wins iff the coarse
    quantizer absorbs real structure — E|x − c|² « E|x|². This
    corpus is UNIT-NORM (E|x|² = 1.00) and the coarse quantizer is
    cosine-based, so the residual energy 2 − 2·cos_max (measured
    1.63) EXCEEDS the raw energy: encoding residuals is strictly
    harder than encoding the vectors, and the no-residual twin must
    out-recall the residual one here. Pin the full causal chain —
    energy ordering → reconstruction-error ordering → recall
    ordering — so the relationship can't silently flip into
    cargo-cult 'residual is always better' territory."""
    from lol_data_pipeline_spark.operators.similarity import (
        pq_encode,
        residuals_with_cells,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coarse = emb.filter(F.col("vec_id") < _IVF_CELLS)
    resdf = residuals_with_cells(emb, coarse)

    # 1. energy ordering: mean |res|^2 > mean |x|^2 (unit-norm corpus)
    rows = resdf.select("embedding", "res").collect()
    x = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    res = np.array([list(r.res) for r in rows], dtype=np.float64)
    e_x = float((x**2).sum(axis=1).mean())
    e_res = float((res**2).sum(axis=1).mean())
    assert 0.95 < e_x < 1.05, e_x  # unit-norm corpus
    assert e_res > e_x, (e_res, e_x)

    # 2. reconstruction-error ordering follows the energy ordering
    raw_seed_rows = (
        emb.orderBy("vec_id").limit(16)
        .select(F.col("embedding").cast("array<double>").alias("c")).collect()
    )
    raw_seeds = [[float(v) for v in r.c] for r in raw_seed_rows]
    raw_enc = pq_encode(emb, raw_seeds).select("cvec", "xhat").collect()
    raw_err = float(
        np.mean([
            ((np.array(list(r.cvec), dtype=np.float64) - np.array(r.xhat)) ** 2).sum()
            for r in raw_enc
        ])
    )
    res_seed_rows = (
        resdf.filter(F.col("vec_id").between(_IVF_CELLS, _IVF_CELLS + 15))
        .orderBy("vec_id").select("res").collect()
    )
    res_seeds = [[float(v) for v in r.res] for r in res_seed_rows]
    res_enc = pq_encode(
        resdf, res_seeds, vec_col="res", keep=["embedding", "cv"],
        vec_alias="res", widen_input=False,
    ).select("embedding", "cv", "xhat").collect()
    res_err = float(
        np.mean([
            (
                (
                    np.array(list(r.embedding), dtype=np.float64)
                    - (np.array(r.cv) + np.array(r.xhat))
                ) ** 2
            ).sum()
            for r in res_enc
        ])
    )
    assert res_err > raw_err, (res_err, raw_err)

    # 3. recall ordering follows (34 vs 28 of 50 at this SF)
    emb_rows = emb.select("vec_id", "embedding").collect()
    exact = _exact_topk(emb_rows, range(_NQ), _K)
    nores = _matches_by_query(REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir).collect())
    resid = _matches_by_query(
        REGISTRY["ann_ivfpq_residual_topk"].fn(spark, sf_dir).collect()
    )
    nores_recall = sum(len(nores.get(q, set()) & exact[q]) for q in exact)
    resid_recall = sum(len(resid.get(q, set()) & exact[q]) for q in exact)
    assert nores_recall >= resid_recall, (nores_recall, resid_recall)
    # the residual index must still be a working index, not noise
    assert resid_recall >= 0.4 * _K * _NQ, resid_recall


def test_kmeans_ivf_recall_beats_seeded_on_fair_queries(spark, sf_dir):
    """The reason training exists. Queries are DISJOINT from the
    seed ids: queries 0..7 are the seeded index's own centroids —
    cells centered on the query itself, an advantage no real
    workload has. On the fair ranges the trained index's total
    recall is strictly higher (measured 28 vs 26 of 100; isotropic
    synthetic data caps how much structure training can find — on
    clustered real embeddings the gap widens). Deterministic on this
    data; if a regeneration equalizes, re-measure and loosen
    deliberately."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_rows = emb.select("vec_id", "embedding").collect()
    qids = [
        r.vec_id
        for r in emb_rows
        if _KMQ_LO <= r.vec_id < _KMQ_HI or _KMQ_TAIL_LO <= r.vec_id < _KMQ_TAIL_HI
    ]
    exact = _exact_topk(emb_rows, qids, _K)

    trained = _matches_by_query(
        REGISTRY["ann_ivf_kmeans_topk"].fn(spark, sf_dir).collect()
    )
    # seeded twin on the SAME queries: cosine assignment against the
    # first-C-by-id centroids (ann_ivf_topk's index), single-probe.
    cells = assign_ivf_cells(emb, emb.filter(F.col("vec_id") < _IVF_CELLS))
    crows = cells.select("vec_id", "cell_id").collect()
    cell_of = {r.vec_id: r.cell_id for r in crows}
    seeded = {
        q: {m for m in cell_of if cell_of[m] == cell_of[q] and m != q}
        for q in qids
    }
    trained_recall = sum(len(trained.get(q, set()) & exact[q]) for q in exact)
    # seeded candidate sets here are whole cells; intersecting with
    # exact top-k upper-bounds the seeded index's achievable recall,
    # so beating it is the strong form of the claim.
    seeded_recall = sum(len(seeded[q] & exact[q]) for q in exact)
    assert trained_recall > seeded_recall, (trained_recall, seeded_recall)


def test_kmeans_cells_flatter_and_lower_quantization_error(spark, sf_dir):
    """What Lloyd training provably buys on ANY data: (a) lower
    quantization error — mean d2 to the assigned centroid (measured
    1.63 seeded -> 0.93 trained, a 43% cut), the objective that
    drives ADC accuracy when PQ composes on top; (b) flatter cell
    occupancy (std 5.10 < 5.17, max 68 < 71) — cell skew is scan
    skew at probe time, the 100 TB concern."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x_rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in x_rows])
    x = np.array([list(r.embedding) for r in x_rows], dtype=np.float64)

    trained_cents = kmeans_train(emb, k=_IVF_CELLS, rounds=_KM_ROUNDS, dim=64)
    tc = np.array([c for _, c in trained_cents])
    seeded_c = x[np.argsort(ids)][: _IVF_CELLS]

    def qerr(cents):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        return float(d2.min(axis=1).mean())

    assert qerr(tc) < 0.7 * qerr(seeded_c), (qerr(tc), qerr(seeded_c))

    t_occ = np.array(
        [
            r.n
            for r in kmeans_cells(emb, k=_IVF_CELLS, rounds=_KM_ROUNDS)
            .groupBy("cell_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ],
        dtype=float,
    )
    s_occ = np.array(
        [
            r.n
            for r in assign_ivf_cells(emb, emb.filter(F.col("vec_id") < _IVF_CELLS))
            .groupBy("cell_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ],
        dtype=float,
    )
    assert len(t_occ) == len(s_occ) == _IVF_CELLS
    assert t_occ.std() < s_occ.std(), (t_occ.std(), s_occ.std())
    assert t_occ.max() <= s_occ.max(), (t_occ.max(), s_occ.max())


def test_ivfpq_kmeans_full_composition(spark, sf_dir):
    """The complete production index (trained coarse quantizer +
    multi-probe + PQ + exact rescore) must (a) keep sane output
    semantics, (b) out-recall the single-probe trained index that
    scans full-precision vectors — i.e. the second probe recovers
    MORE than PQ compression loses (measured 32 vs 28 of 100) — and
    (c) actually use probe 2 (measured: 47 of 100 matches)."""
    rows = REGISTRY["ann_ivfpq_kmeans_topk"].fn(spark, sf_dir).collect()
    assert all(1 <= r.probe_rank <= _NPROBE for r in rows)
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, ms in by_q.items():
        ms.sort(key=lambda r: r.rank)
        assert [m.rank for m in ms] == list(range(1, len(ms) + 1))
        assert len(ms) <= _K
    assert any(r.probe_rank == 2 for r in rows)

    emb_rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    qids = [
        r.vec_id
        for r in emb_rows
        if _KMQ_LO <= r.vec_id < _KMQ_HI or _KMQ_TAIL_LO <= r.vec_id < _KMQ_TAIL_HI
    ]
    exact = _exact_topk(emb_rows, qids, _K)
    full = _matches_by_query(rows)
    single = _matches_by_query(
        REGISTRY["ann_ivf_kmeans_topk"].fn(spark, sf_dir).collect()
    )
    full_recall = sum(len(full.get(q, set()) & exact[q]) for q in exact)
    single_recall = sum(len(single.get(q, set()) & exact[q]) for q in exact)
    assert full_recall >= single_recall, (full_recall, single_recall)


def test_sampled_training_holds_index_quality(spark, sf_dir):
    """The 100 TB index-build claim, made falsifiable: training the
    codebook on a deterministic 1-in-4 sample must (a) retain the
    quantization-error win over the seeded index (measured 0.96
    sampled vs 0.93 full-trained vs 1.63 seeded — sampling keeps
    ~96% of the improvement at a quarter of the training scan) and
    (b) not lose recall vs full training (measured 37 vs 28 of 100
    here — on isotropic data cell-boundary noise dominates and the
    sampled optimum happens to suit these queries; the slack below
    tolerates a regeneration flipping that noise, not a real
    quality loss)."""
    from lol_data_pipeline_spark.plans.round9 import _SAMPLE_MOD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb_rows])
    x = np.array([list(r.embedding) for r in emb_rows], dtype=np.float64)

    sampled_cents = kmeans_train(
        emb.filter(F.col("vec_id") % _SAMPLE_MOD == 0),
        k=_IVF_CELLS, rounds=_KM_ROUNDS, dim=64,
    )
    sc = np.array([c for _, c in sampled_cents])
    seeded_c = x[np.argsort(ids)][: _IVF_CELLS]

    def qerr(cents):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        return float(d2.min(axis=1).mean())

    assert qerr(sc) < 0.7 * qerr(seeded_c), (qerr(sc), qerr(seeded_c))

    qids = [
        r.vec_id
        for r in emb_rows
        if _KMQ_LO <= r.vec_id < _KMQ_HI or _KMQ_TAIL_LO <= r.vec_id < _KMQ_TAIL_HI
    ]
    exact = _exact_topk(emb_rows, qids, _K)
    sampled = _matches_by_query(
        REGISTRY["ann_ivf_kmeans_sampled_topk"].fn(spark, sf_dir).collect()
    )
    full = _matches_by_query(
        REGISTRY["ann_ivf_kmeans_topk"].fn(spark, sf_dir).collect()
    )
    sampled_recall = sum(len(sampled.get(q, set()) & exact[q]) for q in exact)
    full_recall = sum(len(full.get(q, set()) & exact[q]) for q in exact)
    assert sampled_recall + 5 >= full_recall, (sampled_recall, full_recall)


def test_adc_refine_stage_shared(spark, sf_dir):
    """pq_cosine_topk and ivfpq_topk share _adc_refine_topk — pin the
    output contracts so a helper change that breaks either surface
    fails here, not at the driver."""
    pq = REGISTRY["ann_pq_topk"].fn(spark, sf_dir)
    ivfpq = REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir)
    assert pq.columns == ["query_id", "match_id", "sim", "rank"]
    assert ivfpq.columns == ["query_id", "match_id", "probe_rank", "sim", "rank"]
    assert dict(ivfpq.dtypes)["probe_rank"] == "bigint"
    assert dict(ivfpq.dtypes)["rank"] == "bigint"
    assert dict(pq.dtypes)["rank"] == "bigint"


def test_bpe_train_toy_corpus_semantics(spark):
    """Hand-checkable training: corpus 'low low low lower newest'
    (per doc). Round 0 must merge the most frequent weighted pair
    with deterministic (cnt DESC, l, r) tie-breaks, each round's
    merged symbol is left||right, and winning counts never increase
    across rounds (a new pair's count is bounded by the merge that
    created its symbol)."""
    from lol_data_pipeline_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame(
        [(0, "low low low lower newest"), (1, "lowest low newest")],
        "doc_id long, text string",
    )
    rows = bpe_train_merges(docs, rounds=3).collect()
    assert [r.round for r in rows] == [0, 1, 2]
    # 'lo' and 'ow' both appear in every 'low*' token (6 occurrences);
    # the (cnt DESC, l, r) tie-break picks 'lo' first, after which
    # 'lo'+'w' is the 6-count survivor.
    assert (rows[0].left_sym, rows[0].right_sym, rows[0].cnt) == ("l", "o", 6)
    assert (rows[1].left_sym, rows[1].right_sym, rows[1].cnt) == ("lo", "w", 6)
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_bpe_merge_application_is_separator_consuming_leftmost(spark):
    """Pin the documented merge-application semantics: one
    separator-replace pass per round, leftmost non-overlapping with
    the shared separator consumed — 'aaaa' becomes [aa, a, a] after
    an (a, a) merge (canonical HF BPE would give [aa, aa]; the
    deviation covers ANY adjacent repetition of the merged pair —
    see the non-self-pair 'anana' test below — and both engines
    implement it identically, which is what the oracle
    checks). The next round recounts from the ACTUAL representation
    [aa, a, a]: the leftover (a, a) adjacency (count 2) ties with
    (aa, a) and wins the (cnt DESC, l, r) tie-break, so round 1
    re-merges (a, a) — converging the run to the canonical [aa, aa]
    one round late instead of losing it."""
    from lol_data_pipeline_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    rows = bpe_train_merges(docs, rounds=2).collect()
    assert (rows[0].left_sym, rows[0].right_sym) == ("a", "a")
    assert (rows[0].cnt) == 6  # 3 adjacencies x 2 occurrences (overlap counted)
    assert (rows[1].left_sym, rows[1].right_sym, rows[1].cnt) == ("a", "a", 2)


def test_bpe_boundary_consumption_covers_non_self_pairs(spark):
    """The separator-consumption deviation is NOT limited to self-pair
    runs: any back-to-back repetition of the merged pair shares its
    boundary separator. 'anana' under merge (a, n): canonical
    greedy-leftmost BPE yields [an, an, a]; the literal replace
    consumes the shared '·' and yields [an, a, n, a]. Pin it via the
    round-1 recount: after round 0 merges (a, n), the leftover (a, n)
    adjacency in 'anana' plus the (an, a) adjacencies decide round 1 —
    if the second 'an' HAD merged, (a, n) would not survive round 0.

    Corpus 'anana an': round 0 pairs are (a,n)x3+1=... weighted —
    'anana' contributes (a,n):2 (overlapping adjacency positions 0-1
    and 2-3), (n,a):2; 'an' contributes (a,n):1. (a,n)=3 wins the
    tie over (n,a)=2. After replace, 'anana' -> ·an·a·n·a· — the
    surviving (a, n) at positions 1-2 proves the second occurrence
    was skipped."""
    from lol_data_pipeline_spark.operators.bpe import bpe_train_merges, SEP, corpus_words
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(0, "anana an")], "doc_id long, text string")
    rows = bpe_train_merges(docs, rounds=1).collect()
    assert (rows[0].left_sym, rows[0].right_sym, rows[0].cnt) == ("a", "n", 3)
    # Apply the same replace corpus_words+round-0 would and inspect the
    # actual representation of 'anana'.
    words = corpus_words(docs).select(
        F.replace(
            F.col("w"), F.lit(SEP + "a" + SEP + "n" + SEP), F.lit(SEP + "an" + SEP)
        ).alias("w")
    )
    reps = {r.w for r in words.collect()}
    assert SEP + "an" + SEP + "a" + SEP + "n" + SEP + "a" + SEP in reps  # NOT ·an·an·a·
    assert SEP + "an" + SEP in reps
