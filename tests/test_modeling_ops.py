"""Trained-model curation family tests (plans/modeling.py): SemDeDup
policy invariants off the served IVF index, the distributed logistic
regression's learning + determinism, curriculum banding consistency,
and served-tokenizer utilization stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans import REGISTRY
from lol_data_pipeline_spark.plans.modeling import (
    _LR_NF,
    _LR_PSC,
    _SD_TAU,
    _lr_feats_df,
    _lr_train_weights,
)

ENTRIES = [
    "corpus_semdedup",
    "corpus_semdedup_cells",
    "corpus_quality_logreg",
    "corpus_quality_logreg_eval",
    "corpus_curriculum_stages",
    "corpus_mixture_temperature",
    "stream_quality_score_multibatch",
    "text_bpe_stats_served",
    "graph_label_prop_served",
    "stream_semdedup_probe_multibatch",
    "retrieval_hard_negatives_served",
    "corpus_mixture_shard_plan",
    "dq_model_score_drift",
    "text_bpe_fertility_served",
    "corpus_training_data_e2e",
    "corpus_quality_logreg_weights",
    "stream_mixture_weights_multibatch",
    "corpus_semdedup_components",
    "corpus_quality_calibration",
    "corpus_dsir_select",
]


def test_entries_registered_with_oracles():
    for name in ENTRIES:
        assert name in REGISTRY, name
        assert REGISTRY[name].sql, name


def test_semdedup_policy_invariants(spark, sf_dir):
    """Every dropped doc keeps a LOWER-id keeper from its own cell at
    sim ≥ τ, exactly one keeper per dropped id, and the cell column
    agrees with the persisted index's assignment."""
    from lol_data_pipeline_spark.operators.vector_index import (
        ensure_ivfpq_index,
    )
    from lol_data_pipeline_spark.plans.round10 import _INDEX_PARAMS

    rows = REGISTRY["corpus_semdedup"].fn(spark, sf_dir).collect()
    assert rows, "threshold should drop at least one doc at sf0.001"
    assert len({r.vec_id for r in rows}) == len(rows)
    for r in rows:
        assert r.kept_id < r.vec_id
        assert r.sim >= _SD_TAU
    path, _meta = ensure_ivfpq_index(spark, sf_dir, **_INDEX_PARAMS)
    cells = {
        r.vec_id: r.cell_id
        for r in spark.read.parquet(path)
        .select(F.col("vec_id").cast("long"), F.col("cell_id").cast("long"))
        .collect()
    }
    for r in rows:
        assert cells[r.vec_id] == r.cell_id
        assert cells[r.kept_id] == r.cell_id


def test_logreg_learns_and_scores_on_grid(spark, sf_dir):
    """Training separates the classes (accuracy beats the base rate
    by a wide margin), the token-count feature carries the dominant
    positive weight, and every served score sits exactly on the
    2^-12 quantization grid (the oracle-parity invariant)."""
    from lol_data_pipeline_spark.caching import tracked_persist

    feats = tracked_persist(_lr_feats_df(spark, sf_dir))
    w = _lr_train_weights(feats)
    assert len(w) == _LR_NF
    assert w[2] > 0 and w[2] == max(w), "token count drives the label"
    ev = {
        (r.label, r.pred): r.n
        for r in REGISTRY["corpus_quality_logreg_eval"].fn(spark, sf_dir).collect()
    }
    total = sum(ev.values())
    correct = ev.get((0, 0), 0) + ev.get((1, 1), 0)
    base = max(
        ev.get((0, 0), 0) + ev.get((0, 1), 0),
        ev.get((1, 0), 0) + ev.get((1, 1), 0),
    )
    assert correct / total >= 0.9
    assert correct > base, "must beat predicting the majority class"
    top = REGISTRY["corpus_quality_logreg"].fn(spark, sf_dir).collect()
    assert len(top) == 20
    for r in top:
        assert 0.0 <= r.score <= 1.0
        assert r.score * _LR_PSC == int(r.score * _LR_PSC)
        assert r.pred == (1 if r.score >= 0.5 else 0)


def test_logreg_training_is_deterministic(spark, sf_dir):
    """Two independent trainings produce bit-identical weights — the
    fixed-point BIGINT gradient sums make the rounds partition- and
    order-independent."""
    w1 = _lr_train_weights(_lr_feats_df(spark, sf_dir))
    w2 = _lr_train_weights(
        _lr_feats_df(spark, sf_dir).repartition(7)
    )
    assert w1 == w2


def test_lr_model_artifact_reuse_and_staleness(spark, sf_dir, tmp_path):
    """The served model trains once per (corpus, params): a warm
    sidecar is reused bit-for-bit without touching Spark; a params
    change invalidates it and retrains."""
    import json
    import os

    from lol_data_pipeline_spark.plans import modeling as M

    root = str(tmp_path / "qm")
    w1 = M.ensure_lr_model(spark, sf_dir, root=root)
    meta_path = os.path.join(
        root, f"qlr_{os.path.basename(sf_dir)}", "_model_meta.json"
    )
    with open(meta_path) as f:
        meta = json.load(f)
    # poison the stored weights, keep fingerprint+params: a warm
    # artifact must be SERVED, not retrained — the poison proves the
    # second call never re-enters training
    meta["weights"] = [99.0] * M._LR_NF
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    assert M.ensure_lr_model(spark, sf_dir, root=root) == [99.0] * M._LR_NF
    # stale params → rebuild → poison gone, weights match fresh run
    meta["params"]["eta"] = -1.0
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    assert M.ensure_lr_model(spark, sf_dir, root=root) == w1


def test_curriculum_stages_partition_the_corpus(spark, sf_dir):
    """Stage rollup covers every scored doc exactly once and the
    score bounds respect the fixed band edges."""
    bands = {0: (0.75, 1.0), 1: (0.5, 0.75), 2: (0.25, 0.5), 3: (0.0, 0.25)}
    rows = REGISTRY["corpus_curriculum_stages"].fn(spark, sf_dir).collect()
    n_docs = sum(r.n_docs for r in rows)
    total = (
        REGISTRY["corpus_quality_logreg_eval"]
        .fn(spark, sf_dir)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert n_docs == total
    for r in rows:
        lo, hi = bands[r.stage]
        assert lo <= r.min_score <= r.max_score
        assert r.max_score < hi or (r.stage == 0 and r.max_score <= 1.0)
        assert 0 <= r.n_pos <= r.n_docs
        assert r.sum_tokens > 0


def test_semdedup_cells_reconcile_with_pair_listing(spark, sf_dir):
    """The observability rollup must account for every index member
    and agree with the pair listing's drop count per cell."""
    cells = REGISTRY["corpus_semdedup_cells"].fn(spark, sf_dir).collect()
    dropped = REGISTRY["corpus_semdedup"].fn(spark, sf_dir).collect()
    per_cell = {}
    for r in dropped:
        per_cell[r.cell_id] = per_cell.get(r.cell_id, 0) + 1
    assert sum(r.n_dropped for r in cells) == len(dropped)
    total_members = 0
    for r in cells:
        assert r.n_kept + r.n_dropped == r.n_members
        assert r.n_dropped == per_cell.get(r.cell_id, 0)
        total_members += r.n_members
    emb_n = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert total_members == emb_n


def test_mixture_temperature_flattens_the_distribution(spark, sf_dir):
    """τ < 1 must pull weights toward uniform: the head domain's
    weight shrinks vs its raw share, the tail domain's grows, and the
    weights form a distribution."""
    rows = REGISTRY["corpus_mixture_temperature"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r.weight_temp for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_raw for r in rows) - 1.0) < 1e-9
    head = max(rows, key=lambda r: r.share_raw)
    tail = min(rows, key=lambda r: r.share_raw)
    assert head.weight_temp < head.share_raw
    assert tail.weight_temp > tail.share_raw


def test_stream_scoring_equals_batch_scoring(spark, sf_dir):
    """The streamed micro-batches must union to exactly the batch
    scoring — one scoring definition, so drift is structurally
    impossible; this pins it anyway."""
    from lol_data_pipeline_spark.plans.modeling import (
        _lr_scored_df,
    )

    streamed = sorted(
        (r.doc_id, r.score, r.label, r.pred)
        for r in REGISTRY["stream_quality_score_multibatch"]
        .fn(spark, sf_dir)
        .collect()
    )
    batch = sorted(
        (r.doc_id, r.score, r.label, r.pred)
        for r in _lr_scored_df(spark, sf_dir)
        .select("doc_id", "score", "label", "pred")
        .collect()
    )
    assert streamed == batch


def test_dsir_weights_and_ranking_are_correct(spark, sf_dir):
    """The importance mechanics, verified against a driver-side
    recomputation: every bucket's weight sign matches the smoothed
    p_target-vs-p_corpus comparison, selected scores are
    rank-ordered, and the fixed-point average reconciles with the
    integer sum. (Enrichment of the target CLASS is a data property
    — this synthetic corpus draws both classes from one vocabulary,
    so lexical importance is near-uniform by construction and the
    selection rate hovers at the base rate; on a corpus where the
    target slice reads differently, these same weights are the DSIR
    selector.)"""
    import math

    from lol_data_pipeline_spark.functions.scalar import md5_long
    from lol_data_pipeline_spark.plans.modeling import _DSIR_B

    rows = REGISTRY["corpus_dsir_select"].fn(spark, sf_dir).collect()
    assert rows
    avgs = [r.avg_w for r in rows]
    assert avgs == sorted(avgs, reverse=True)
    for r in rows:
        assert r.n_tokens > 0
        assert abs(r.avg_w - r.sum_w_e6 / r.n_tokens / 1e6) < 1e-6
    # recompute the bucket table driver-side and check weight signs
    from lol_data_pipeline_spark.functions import text as tx2

    tok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            (F.col("n_chars") >= 300).alias("is_t"),
            F.explode(tx2.tokens("text")).alias("t"),
        )
        .select("is_t", F.pmod(md5_long("t"), F.lit(_DSIR_B)).alias("bkt"))
        .collect()
    )
    cc, ct = {}, {}
    for row in tok:
        cc[row.bkt] = cc.get(row.bkt, 0) + 1
        if row.is_t:
            ct[row.bkt] = ct.get(row.bkt, 0) + 1
    nc, nt = len(tok), sum(ct.values())
    for b, c in cc.items():
        w = math.log(
            ((ct.get(b, 0) + 1.0) * (nc + _DSIR_B))
            / ((c + 1.0) * (nt + _DSIR_B))
        )
        pt = (ct.get(b, 0) + 1.0) / (nt + _DSIR_B)
        pcv = (c + 1.0) / (nc + _DSIR_B)
        assert (w > 0) == (pt > pcv)


def test_dsir_sample_recovers_select_at_zero_temperature(spark, sf_dir):
    """τ→0 (tau_inv→∞): the importance term dominates every Gumbel
    perturbation, so Gumbel-top-k degenerates to corpus_dsir_select's
    pure ranking — the pin that holds the sampling half to the
    selection half. Also checks the entry's own draw is a real
    perturbation (some rank differs from the deterministic order,
    else the noise is dead) and the Gumbel arithmetic is within the
    analytic range implied by u ∈ [5e-7, 1-5e-7]."""
    import math

    from lol_data_pipeline_spark.plans.modeling import (
        _dsir_sample_frame,
    )

    sel = [r.doc_id for r in REGISTRY["corpus_dsir_select"].fn(spark, sf_dir).collect()]
    frozen = [
        r.doc_id for r in _dsir_sample_frame(spark, sf_dir, 10**9).collect()
    ]
    assert frozen == sel
    rows = REGISTRY["corpus_dsir_sample"].fn(spark, sf_dir).collect()
    assert len(rows) == len(sel)
    assert [r.doc_id for r in rows] != sel  # the draw perturbs
    g_hi = -math.log(-math.log(1 - 5e-7)) * 1e6  # u max
    g_lo = -math.log(-math.log(5e-7)) * 1e6  # u min
    for r in rows:
        assert g_lo - 1 <= r.g_e6 <= g_hi + 1


def test_calibration_reconciles_with_eval(spark, sf_dir):
    """Band totals must cover the scored corpus, positives must sum
    to the confusion matrix's positive-label mass, and a calibrated-
    ish model puts higher empirical positive rates in higher bands
    (monotone between the extreme occupied bands)."""
    rows = REGISTRY["corpus_quality_calibration"].fn(spark, sf_dir).collect()
    ev = {
        (r.label, r.pred): r.n
        for r in REGISTRY["corpus_quality_logreg_eval"].fn(spark, sf_dir).collect()
    }
    assert sum(r.n for r in rows) == sum(ev.values())
    assert sum(r.n_pos for r in rows) == ev.get((1, 0), 0) + ev.get((1, 1), 0)
    for r in rows:
        assert 0.0 <= r.frac_pos <= 1.0
        assert r.n_pos <= r.n
    lo, hi = rows[0], rows[-1]
    assert lo.frac_pos <= hi.frac_pos


def test_semdedup_components_close_the_one_hop_chains(spark, sf_dir):
    """Transitive groups: every one-hop dropped id is in some
    component with drop=true; keep ids are component minima; group
    sizes reconcile with membership; components never cross cells."""
    rows = (
        REGISTRY["corpus_semdedup_components"].fn(spark, sf_dir).collect()
    )
    assert rows
    one_hop = {r.vec_id for r in REGISTRY["corpus_semdedup"].fn(spark, sf_dir).collect()}
    members = {}
    for r in rows:
        members.setdefault(r.keep_id, []).append(r)
    for keep_id, grp in members.items():
        assert min(m.vec_id for m in grp) == keep_id
        assert all(m.group_size == len(grp) for m in grp)
        for m in grp:
            assert m.drop == (m.vec_id != keep_id)
    comp_dropped = {r.vec_id for r in rows if r.drop}
    assert one_hop <= comp_dropped | set(), (
        "every one-hop casualty must fall in a component"
    )
    cells = {r.vec_id: r.cell_id for r in _modeling_nodes(spark, sf_dir).collect()}
    for keep_id, grp in members.items():
        assert len({cells[m.vec_id] for m in grp}) == 1, "cell-local"


def test_weights_entry_serves_the_sidecar_exactly(spark, sf_dir):
    """The registry read returns the artifact's coefficients
    bit-for-bit, named and ordered."""
    from lol_data_pipeline_spark.plans.modeling import (
        _LR_FEATURE_NAMES,
        ensure_lr_model,
    )

    rows = (
        REGISTRY["corpus_quality_logreg_weights"].fn(spark, sf_dir).collect()
    )
    w = ensure_lr_model(spark, sf_dir)
    assert [r.feature_idx for r in rows] == list(range(len(w)))
    assert [r.feature_name for r in rows] == _LR_FEATURE_NAMES
    assert [r.weight for r in rows] == w


def test_stream_mixture_equals_batch_mixture(spark, sf_dir):
    """The stream-maintained weights must equal the batch entry
    row-for-row — state accumulated across all four epochs."""
    streamed = sorted(
        (r.source, r.n_docs, r.tokens, r.share_raw, r.weight_temp)
        for r in REGISTRY["stream_mixture_weights_multibatch"]
        .fn(spark, sf_dir)
        .collect()
    )
    batch = sorted(
        (r.source, r.n_docs, r.tokens, r.share_raw, r.weight_temp)
        for r in REGISTRY["corpus_mixture_temperature"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert streamed == batch


def test_training_e2e_composes_its_stages(spark, sf_dir):
    """The capstone's population is exactly (quality-kept docs) minus
    (semdedup-dropped ids) that tokenize to at least one word, and
    packing is contiguous per source (bin ids start at 0 and never
    skip)."""
    from lol_data_pipeline_spark.plans.modeling import (
        _lr_scored_df,
        _semdedup_dropped,
    )

    rows = REGISTRY["corpus_training_data_e2e"].fn(spark, sf_dir).collect()
    assert rows
    got_ids = {r.doc_id for r in rows}
    kept = {
        r.doc_id
        for r in _lr_scored_df(spark, sf_dir)
        .filter(F.col("pred") == 1)
        .select("doc_id")
        .collect()
    }
    dropped = {r.vid for r in _semdedup_dropped(spark, sf_dir).collect()}
    assert got_ids <= kept - dropped
    assert not (dropped & got_ids)
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r.bin_id)
    for bins in per_source.values():
        assert min(bins) == 0
        assert set(bins) == set(range(max(bins) + 1)), "no skipped bins"


def test_model_drift_accounts_for_every_doc(spark, sf_dir):
    """The drift row's cohort totals cover the scored corpus and the
    PSI is finite and non-negative."""
    from lol_data_pipeline_spark.plans.modeling import _lr_scored_df

    row = REGISTRY["dq_model_score_drift"].fn(spark, sf_dir).collect()[0]
    total = _lr_scored_df(spark, sf_dir).count()
    assert row.n_a + row.n_b == total
    assert row.psi >= 0.0
    assert row.psi == row.psi and abs(row.psi) < 1e9  # finite


def test_bpe_fertility_reconciles_with_encode(spark, sf_dir):
    """Per-source word/token masses must sum to the served encode's
    corpus totals, and fertility is always >= 1 (a word is at least
    one token)."""
    rows = REGISTRY["text_bpe_fertility_served"].fn(spark, sf_dir).collect()
    enc = REGISTRY["text_bpe_encode_served"].fn(spark, sf_dir).collect()
    assert sum(r.words for r in rows) == sum(e.n_words for e in enc)
    assert sum(r.toks for r in rows) == sum(e.bpe_tokens for e in enc)
    for r in rows:
        assert r.fertility >= 1.0
        assert r.toks >= r.words


def test_hard_negatives_are_the_band_below_the_positives(spark, sf_dir):
    """Negatives occupy exactly the (k, k+neg] rank band of the SAME
    served candidate list: disjoint from the top-k positives, at most
    neg per query, and for each query every negative scores <= the
    weakest positive."""
    from lol_data_pipeline_spark.plans.modeling import _NEG
    from lol_data_pipeline_spark.plans.round9 import _K

    negs = (
        REGISTRY["retrieval_hard_negatives_served"].fn(spark, sf_dir).collect()
    )
    pos = REGISTRY["ann_ivfpq_served_topk"].fn(spark, sf_dir).collect()
    assert negs
    pos_pairs = {(r.query_id, r.match_id) for r in pos}
    worst_pos = {}
    for r in pos:
        worst_pos[r.query_id] = min(
            worst_pos.get(r.query_id, 1e9), r.sim
        )
    per_q = {}
    for r in negs:
        assert _K < r.rank <= _K + _NEG
        assert (r.query_id, r.match_id) not in pos_pairs
        assert r.sim <= worst_pos[r.query_id]
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(n <= _NEG for n in per_q.values())


def test_shard_plan_apportions_exactly(spark, sf_dir):
    """Largest-remainder apportionment: shard counts sum exactly to
    the total and every source sits within one shard of its fair
    share."""
    from lol_data_pipeline_spark.plans.modeling import _SHARDS_TOTAL

    rows = REGISTRY["corpus_mixture_shard_plan"].fn(spark, sf_dir).collect()
    assert sum(r.n_shards for r in rows) == _SHARDS_TOTAL
    for r in rows:
        fair = r.weight_temp * _SHARDS_TOTAL
        assert abs(r.n_shards - fair) < 1.0


def test_semdedup_probe_is_asymmetric_and_cell_local(spark, sf_dir):
    """The streamed probe flags only new×standing pairs, every pair
    is same-cell under the served assignment, and the flagged sims
    clear τ."""
    from lol_data_pipeline_spark.plans.modeling import _SDP_MOD

    rows = (
        REGISTRY["stream_semdedup_probe_multibatch"].fn(spark, sf_dir).collect()
    )
    assert rows
    nodes = {
        r.vec_id: r.cell_id
        for r in _modeling_nodes(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.vec_id % _SDP_MOD == 0, "left side must be the batch"
        assert r.match_id % _SDP_MOD != 0, "right side must be standing"
        assert r.sim >= _SD_TAU
        assert nodes[r.vec_id] == r.cell_id == nodes[r.match_id]


def _modeling_nodes(spark, sf_dir):
    from lol_data_pipeline_spark.plans.modeling import _semdedup_nodes

    return _semdedup_nodes(spark, sf_dir)


def test_label_prop_commit_semantics(spark, sf_dir):
    """Committed propagation invariants: seeds never re-labeled, a
    node is labeled at most once, a round-r label requires a
    neighbour labeled before round r, and every label is a real
    class id."""
    from lol_data_pipeline_spark.operators.graph_index import (
        ensure_knn_graph_index,
        read_edges,
    )
    from lol_data_pipeline_spark.plans.modeling import _LP_SEED_MOD
    from lol_data_pipeline_spark.plans.round11 import (
        _GRAPH_K,
        _GRAPH_PLANES,
    )

    rows = REGISTRY["graph_label_prop_served"].fn(spark, sf_dir).collect()
    assert rows
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)
    classes = {
        r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label")
        .distinct()
        .collect()
    }
    labeled_at = {}
    for r in rows:
        assert r.vec_id % _LP_SEED_MOD != 0, "seed ids must not re-label"
        assert r.label in classes
        labeled_at[r.vec_id] = r.round
    path, _meta = ensure_knn_graph_index(
        spark, sf_dir, n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    nbrs = {}
    for e in read_edges(spark, path).collect():
        nbrs.setdefault(e.src_id, []).append(e.dst_id)
    for r in rows:
        prior = [
            d
            for d in nbrs.get(r.vec_id, [])
            if d % _LP_SEED_MOD == 0 or labeled_at.get(d, 99) < r.round
        ]
        assert prior, "a committed label needs an earlier-labeled neighbour"


def test_bpe_stats_reflect_learned_merges(spark, sf_dir):
    """The utilization head contains the trained merge symbols (a
    merge that never carries corpus mass would be dead vocabulary)
    and counts are non-increasing."""
    from lol_data_pipeline_spark.operators.bpe import (
        ensure_bpe_vocab,
        vocab_merges,
    )
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    rows = REGISTRY["text_bpe_stats_served"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r.is_merged == (r.token_len > 1)
        assert r.token_len == len(r.token)
    _path, meta = ensure_bpe_vocab(spark, sf_dir, rounds=_BPE_ROUNDS)
    merged = {m for (_i, _l, _r, m, _c) in vocab_merges(meta)}
    head_tokens = {r.token for r in rows}
    assert merged & head_tokens, "learned merges must appear in the head"
