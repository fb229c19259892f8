"""Round-10 operator tests: the materialized IVF+PQ index — build
artifact shape, partition-pruned serve plan, staleness rebuild, and
idempotent incremental maintenance."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lol_data_pipeline_spark.operators.vector_index import (
    assign_to_index,
    ensure_ivfpq_index,
    index_upsert,
    ivf_probe_rows,
    pq_code_cols,
    pq_decode_expr,
    read_index_codes,
)
from lol_data_pipeline_spark.plans import REGISTRY
from lol_data_pipeline_spark.plans.round10 import (
    _INDEX_PARAMS,
    _UP_HI,
    _UP_LO,
    _UP_SHIFT,
)
from lol_data_pipeline_spark.plans.round9 import (
    _IVF_CELLS,
    _NPROBE,
    _PQ_M,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    """A fresh index under a test-owned root (never the shared
    spark-warehouse copy), built once for the module."""
    root = str(tmp_path_factory.mktemp("vector_index"))
    path, meta = ensure_ivfpq_index(spark, sf_dir, root=root, **_INDEX_PARAMS)
    return root, path, meta


def test_index_layout_is_cell_partitioned_codes(index):
    """The persisted artifact IS the 100 TB layout: hive directories
    per cell_id, a sidecar the parquet reader ignores, and data files
    holding only (vec_id, code*) — no float vectors on disk."""
    _root, path, meta = index
    cells = sorted(
        d for d in os.listdir(path) if d.startswith("cell_id=")
    )
    assert len(cells) == _IVF_CELLS
    assert os.path.exists(os.path.join(path, "_index_meta.json"))
    assert len(meta["cents"]) == _IVF_CELLS
    assert len(meta["seeds"]) == _INDEX_PARAMS["ncent"]
    import pyarrow.parquet as pq

    part = os.path.join(path, cells[0])
    f = next(p for p in os.listdir(part) if p.endswith(".parquet"))
    schema = pq.read_schema(os.path.join(part, f))
    assert set(schema.names) == {"vec_id", *pq_code_cols(_PQ_M)}


def test_served_scan_prunes_partitions_and_reads_only_codes(
    spark, index
):
    """SCALE.md's central claim, asserted on the PLAN: the probe scan
    carries PartitionFilters on cell_id (directory pruning — at
    100 TB the scan touches nprobe/C of the files) and a ReadSchema
    of exactly the code columns (m bytes/vector, not dim·4)."""
    _root, path, meta = index
    probed = [1, 3]
    idx = read_index_codes(spark, path, meta, cells=probed)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell_id" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "vec_id" in read_schema and "code0" in read_schema
    assert "embedding" not in read_schema and "double" not in read_schema
    # the pruned scan actually reads only the probed cells
    got = {r.cell_id for r in idx.select("cell_id").distinct().collect()}
    assert got == set(probed)


def test_decode_matches_inquery_encode_bitwise(spark, sf_dir, index):
    """Decoded x̂ from persisted codes must equal pq_encode's
    in-query xhat EXACTLY (same literal doubles) — that equivalence
    is why ann_ivfpq_served_topk can share the flagship's oracle."""
    from lol_data_pipeline_spark.io import load_table
    from lol_data_pipeline_spark.operators.similarity import pq_encode

    _root, path, meta = index
    p = meta["params"]
    served = read_index_codes(spark, path, meta).select(
        "vec_id", pq_decode_expr(meta["seeds"], p["m"], p["dsub"]).alias("xhat")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    inq = pq_encode(
        emb, meta["seeds"], m=p["m"], dsub=p["dsub"], id_alias="vec_id"
    ).select("vec_id", "xhat")
    diff = served.alias("s").join(inq.alias("q"), "vec_id").filter(
        F.expr("s.xhat <> q.xhat")
    )
    assert diff.count() == 0
    assert served.count() == inq.count()


def test_served_equals_inquery_flagship(spark, sf_dir):
    """The served entry and the recomputing flagship return the SAME
    rows — persistence is an optimization, not a semantic change."""
    served = REGISTRY["ann_ivfpq_served_topk"].fn(spark, sf_dir)
    flagship = REGISTRY["ann_ivfpq_kmeans_topk"].fn(spark, sf_dir)
    cols = served.columns
    assert cols == flagship.columns
    s_rows = sorted(map(tuple, served.collect()))
    f_rows = sorted(map(tuple, flagship.collect()))
    assert s_rows == f_rows


def test_stale_index_rebuilds_and_fresh_index_is_reused(
    spark, sf_dir, index
):
    """Staleness contract: same source + params → the build is NOT
    repeated (same files); a corrupted fingerprint → rebuild."""
    root, path, _meta = index
    meta_path = os.path.join(path, "_index_meta.json")
    mtime0 = os.path.getmtime(meta_path)
    p2, _ = ensure_ivfpq_index(spark, sf_dir, root=root, **_INDEX_PARAMS)
    assert p2 == path
    assert os.path.getmtime(meta_path) == mtime0  # reused, not rebuilt
    with open(meta_path) as f:
        meta = json.load(f)
    meta["fingerprint"] = "stale"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    p3, meta3 = ensure_ivfpq_index(spark, sf_dir, root=root, **_INDEX_PARAMS)
    assert p3 == path
    assert meta3["fingerprint"] != "stale"  # rebuilt


def test_upsert_is_idempotent_and_merges_not_replaces(
    spark, sf_dir, index
):
    """Two contracts at once: (a) MERGE semantics — the affected
    partitions keep their pre-existing members alongside the new
    batch (dynamic overwrite alone would drop them); (b) idempotence
    — re-running the same batch leaves disk content identical."""
    _root, path, meta = index
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = F.col("embedding").cast("array<double>")
    batch = emb.filter(F.col("vec_id").between(_UP_LO, _UP_HI - 1)).select(
        (F.col("vec_id") + _UP_SHIFT).alias("vec_id"),
        F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias("embedding"),
    )
    new_codes = assign_to_index(batch, meta)
    n_new = new_codes.count()
    assert n_new == _UP_HI - _UP_LO

    before = {
        int(r.cell_id): r.n
        for r in spark.read.parquet(path)
        .groupBy("cell_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    affected = index_upsert(spark, path, meta, new_codes)
    assert 1 <= len(affected) <= _IVF_CELLS

    def snapshot():
        return sorted(
            map(
                tuple,
                read_index_codes(spark, path, meta)
                .filter(F.col("cell_id").isin(affected))
                .collect(),
            )
        )

    after1 = snapshot()
    # merge: every pre-existing member survived, plus the new batch
    per_cell_after = {}
    for row in after1:
        per_cell_after[row[1]] = per_cell_after.get(row[1], 0) + 1
    for c in affected:
        assert per_cell_after[c] >= before.get(c, 0)
    assert sum(per_cell_after.values()) == sum(
        before.get(c, 0) for c in affected
    ) + n_new
    # idempotent: second run, identical disk content
    index_upsert(spark, path, meta, new_codes)
    assert snapshot() == after1

    # untouched partitions kept their original content
    untouched = [c for c in before if c not in set(affected)]
    now = {
        int(r.cell_id): r.n
        for r in spark.read.parquet(path)
        .groupBy("cell_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for c in untouched:
        assert now[c] == before[c]


def test_index_delete_removes_ids_and_drops_emptied_cells(
    spark, sf_dir, index
):
    """Delete contracts: (a) the doomed ids are gone from disk, other
    members of the affected cells survive; (b) idempotent re-run; (c)
    a cell whose EVERY member is deleted loses its directory (the
    dynamic-overwrite blind spot handled explicitly)."""
    from lol_data_pipeline_spark.operators.vector_index import index_delete

    _root, path, meta = index
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    doomed = emb.filter(F.col("vec_id").between(200, 219)).select(
        "vec_id", "embedding"
    )
    before_ids = {r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()}
    assert set(range(200, 220)) <= before_ids
    affected = index_delete(spark, path, meta, doomed)
    after = spark.read.parquet(path).select("vec_id", "cell_id").collect()
    after_ids = {r.vec_id for r in after}
    assert after_ids == before_ids - set(range(200, 220))
    # idempotent
    index_delete(spark, path, meta, doomed)
    again = {r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()}
    assert again == after_ids

    # (c) empty a whole cell: doom every remaining member of the
    # first affected cell, then assert its directory is gone. Members
    # upserted earlier in this module (ids ≥ _UP_SHIFT) have the
    # halves-swapped batch vector as their source.
    victim = affected[0]
    members = [r.vec_id for r in after if r.cell_id == victim]
    assert members
    x = F.col("embedding").cast("array<double>")
    doom_all = emb.filter(
        F.col("vec_id").isin([m for m in members if m < _UP_SHIFT])
    ).select("vec_id", "embedding")
    up_members = [m - _UP_SHIFT for m in members if m >= _UP_SHIFT]
    if up_members:
        doom_all = doom_all.unionByName(
            emb.filter(F.col("vec_id").isin(up_members)).select(
                (F.col("vec_id") + _UP_SHIFT).alias("vec_id"),
                F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias(
                    "embedding"
                ),
            )
        )
    index_delete(spark, path, meta, doom_all)
    assert not os.path.isdir(os.path.join(path, f"cell_id={victim}"))
    left = {r.cell_id for r in spark.read.parquet(path).select("cell_id").distinct().collect()}
    assert victim not in left


def test_graph_beam_search_expands_and_improves(spark, sf_dir):
    """Beam-search invariants: (a) contiguous per-query ranks, ≤ k
    rows; (b) the walk actually LEAVES the entry neighborhood (some
    final match is not an entry node or a direct entry neighbor);
    (c) expansion is monotone — every query's best final sim is ≥
    the best achievable by scoring the entry nodes alone (the beam
    keeps the running best by construction)."""
    import numpy as np

    from lol_data_pipeline_spark.plans.round10 import _BEAM_ENTRY_N

    rows = REGISTRY["ann_graph_beam_topk"].fn(spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, ms in by_q.items():
        ms.sort(key=lambda r: r.rank)
        assert [m.rank for m in ms] == list(range(1, len(ms) + 1))
    emb_rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vec = {r.vec_id: np.array(list(r.embedding), dtype=np.float64) for r in emb_rows}

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    left_entry_hood = False
    for qid, ms in by_q.items():
        entry_best = max(
            cos(vec[qid], vec[e]) for e in range(_BEAM_ENTRY_N)
        )
        assert ms[0].sim >= entry_best - 1e-9, (qid, ms[0].sim, entry_best)
        if any(m.match_id >= _BEAM_ENTRY_N for m in ms):
            left_entry_hood = True
    assert left_entry_hood


def test_power_iteration_climbs_the_spectrum(spark, sf_dir):
    """Spectral contracts against numpy ground truth: the returned
    direction is unit-norm; its Rayleigh quotient on X'X (a) never
    fell below the starting vector's (power iteration is monotone in
    RQ), (b) does not exceed the true top eigenvalue, and (c) covers
    most of the gap to it (convergence actually happened)."""
    import numpy as np

    rows = REGISTRY["emb_power_iteration"].fn(spark, sf_dir).collect()
    assert [r.pos for r in rows] == list(range(64))
    v = np.array([r.loading for r in rows], dtype=np.float64)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit (mod 6-dp rounding)
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    G = X.T @ X
    lam_max = float(np.linalg.eigvalsh(G)[-1])
    v0 = X[[r.vec_id for r in emb].index(0)]
    v0 = v0 / np.linalg.norm(v0)
    rq = float(v @ G @ v)
    rq0 = float(v0 @ G @ v0)
    assert rq >= rq0 - 1e-6
    assert rq <= lam_max + 1e-6
    assert rq >= rq0 + 0.5 * (lam_max - rq0)  # covered >=half the gap


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR semantics: pick 1 is the relevance argmax; 5 distinct
    picks per query; and ACROSS the query set the diversified
    selections are less self-similar than plain top-5 by relevance
    (mean max-pairwise-cosine strictly lower) — the property the
    operator exists to provide, measured against ground truth."""
    import numpy as np

    rows = REGISTRY["ann_mmr_rerank"].fn(spark, sf_dir).collect()
    emb_rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vec = {r.vec_id: np.array(list(r.embedding), dtype=np.float64) for r in emb_rows}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)

    def max_pairwise(ids):
        return max(
            cos(vec[a], vec[b]) for i, a in enumerate(ids) for b in ids[i + 1 :]
        )

    mmr_div, topk_div = [], []
    for qid, ms in by_q.items():
        ms.sort(key=lambda r: r.pick)
        assert [m.pick for m in ms] == [1, 2, 3, 4, 5]
        assert len({m.match_id for m in ms}) == 5
        rels = sorted(
            ((cos(vec[qid], vec[v]), v) for v in vec if v != qid),
            key=lambda t: (-round(t[0], 6), t[1]),
        )
        assert ms[0].match_id == rels[0][1]  # pick 1 = relevance argmax
        mmr_div.append(max_pairwise([m.match_id for m in ms]))
        topk_div.append(max_pairwise([v for _s, v in rels[:5]]))
    assert sum(mmr_div) / len(mmr_div) < sum(topk_div) / len(topk_div)


def test_bpe_encode_applies_learned_merges(spark):
    """Hand-checkable corpus: 'low low lower' learns (l,o) then
    (lo,w) in 2 rounds; encoding then tokenizes 'low'→[low]? No —
    after merge 0 'low'=[lo,w], after merge 1 'low'=[low]: 1 token;
    'lower'=[low,e,r]: 3 tokens. n_words and totals pinned."""
    from lol_data_pipeline_spark.operators.bpe import bpe_encode_docs, bpe_train

    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, "lower low")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, rounds=2)
    assert [(m[1], m[2]) for m in merges] == [("l", "o"), ("lo", "w")]
    rows = {r.doc_id: r for r in bpe_encode_docs(docs, merges).collect()}
    assert rows[0].n_words == 3 and rows[0].bpe_tokens == 1 + 1 + 3
    assert rows[1].n_words == 2 and rows[1].bpe_tokens == 3 + 1


def test_bpe_encode_zero_merges_is_char_count(spark):
    """With an empty merge list the encoder degenerates to per-word
    character counts — the representation invariant."""
    from lol_data_pipeline_spark.operators.bpe import bpe_encode_docs

    docs = spark.createDataFrame([(7, "abc de")], "doc_id long, text string")
    row = bpe_encode_docs(docs, []).collect()[0]
    assert (row.doc_id, row.n_words, row.bpe_tokens) == (7, 2, 5)


def test_pack_bpe_budget_bins_are_monotone(spark, sf_dir):
    """Greedy first-fit invariants on the real corpus: bins start at
    0 per source, are non-decreasing in doc_id order, and every
    doc's tokens are positive."""
    rows = REGISTRY["corpus_pack_bpe_budget"].fn(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        assert rs[0].bin_id == 0
        bins = [r.bin_id for r in rs]
        assert bins == sorted(bins)
        assert all(r.n_tok > 0 for r in rs)


def test_probe_rows_bounded_by_codebook(spark, sf_dir, index):
    """The probed-cell set is bounded by the codebook size no matter
    how many queries probe — the literal partition filter stays
    constant-size at any scale."""
    _root, _path, meta = index
    cents = [(int(c), [float(v) for v in cv]) for c, cv in meta["cents"]]
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qprobe = ivf_probe_rows(emb, cents, _NPROBE)  # EVERY vector queries
    cells = qprobe.select("pcell").distinct().count()
    assert cells <= _IVF_CELLS
