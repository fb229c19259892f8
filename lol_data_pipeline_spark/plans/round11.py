"""Round-11 additions: the k-NN GRAPH index graduates to a
materialized at-rest artifact with full lifecycle parity to the IVF
family (build-if-stale + sidecar + code-partitioned storage; serve
the beam walk from persisted edges; bucket-local upsert/delete), the
retrieval pipeline composes end-to-end (served-index candidate pool →
MMR diversified rerank), plus index compaction (quota rebalance of
skewed cells), top-r spectral directions via deflation, streaming
upsert that actually MAINTAINS a queryable index, and a
recall-vs-nprobe evaluation of the SERVED index.

Round 10 closed the recompute-vs-serve gap for the IVF family; its
verdict flagged the two remaining recompute shapes — the beam entry
rebuilt its kNN graph in-query and MMR brute-forced its relevance
pool. This round closes both with machinery that already exists
(operators/graph_index.py mirrors operators/vector_index.py exactly)
and completes the maintenance story (compaction after skewing
upserts; streaming ingest that writes through to the artifact).

Registered AFTER plans/round10.py on purpose (window discipline: the
driver's correctness gate samples the FIRST 50 registry entries and
orders never-green entries by registration order — new entries queue
behind the existing backlog).

Scale notes (100 TB):
- ann_graph_beam_served_topk: the data-bound Σ bucket² graph build is
  amortized into the at-rest artifact; the per-query cost is ONLY the
  bounded walk (frontier = Q×B rows, broadcast joins, lineage-
  truncated rounds) plus an edge-table scan that is k·N tiny rows.
- graph_index_upsert/_delete: maintenance is bucket-local — edges
  never cross LSH buckets, so rewriting the ≤ 2^n_planes affected
  partitions of nodes+edges is EXACT parity with a full rebuild at
  Σ affected-bucket² cost, never corpus-sized.
- ann_served_mmr_rerank: the relevance pool comes from the persisted
  IVF+PQ index (partition-pruned code scan), so the exact-scan pool
  stage of ann_mmr_rerank (kept as the oracle baseline, like
  ann_cosine_topk) is gone from the production path. Measured
  crossover at toy scale recorded in PERF_NOTES.md (the serve path's
  per-stage constants beat a 2000-row NLJ only past a larger N).
- ann_index_compact / ann_index_stats and graph_index_stats complete
  the ops loop: MONITOR (per-cell / per-bucket skew off the
  artifact's partition layout alone) → COMPACT (quota rebalance
  rewriting only donor∪receiver partitions).
- stream_ann_upsert_multibatch: per epoch, a stateless assignment
  projection + an idempotent dynamic-overwrite of the batch's ≤ k
  cells — the stream maintains a queryable artifact.
- ann_served_recall_eval / ann_graph_recall_eval: serving quality
  measured (not inherited) for both index axes, off one persisted
  artifact each; emb_power_topr extends the spectral front-end to r
  deflated directions at the same per-round distributed cost.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans.queries import T, query
from lol_data_pipeline_spark.plans.round9 import (
    _K,
    _KMQ_HI,
    _KMQ_LO,
    _KMQ_TAIL_HI,
    _KMQ_TAIL_LO,
)
from lol_data_pipeline_spark.plans.round10 import (
    _BEAM_B,
    _BEAM_ENTRY_N,
    _BEAM_R,
    _sql_graph_beam,
)

# Graph-maintenance batches: deterministic transforms of bounded id
# ranges (halves-swapped vectors under shifted ids for upsert; a raw
# range for delete), derivable from the shared testdata in both
# engines. The shift is distinct from round10's IVF shift so the two
# families' synthetic batches can never be confused in a debug read.
_GUP_LO, _GUP_HI = 150, 170
_GUP_SHIFT = 200000
_GDEL_LO, _GDEL_HI = 60, 80
_GRAPH_PLANES = 6
_GRAPH_K = 3


@query("ann_graph_beam_served_topk", sql=_sql_graph_beam())
def ann_graph_beam_served_topk(spark, sf_dir):
    """Serve graph-ANN top-k from the PERSISTED k-NN graph (built
    once per corpus by operators/graph_index.py: LSH-coded nodes +
    top-k edges, both hive-partitioned by bucket code, JSON sidecar
    with the literal plane vectors + source fingerprint). The serve
    plan is ONLY round 10's bounded beam walk — Q×B frontier,
    broadcast joins, lineage-truncated rounds — reading the at-rest
    edge table instead of rebuilding the graph in-query (the
    recompute-vs-serve gap round 10's verdict flagged, closed with
    the vector_index.py pattern). Values are identical to the
    in-query entry, so this shares ann_graph_beam_topk's oracle
    verbatim — persistence is an optimization, not a semantic
    change."""
    from lol_data_pipeline_spark.operators.graph_index import served_beam_topk

    queries = T(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    return served_beam_topk(
        spark,
        sf_dir,
        queries,
        k=_K,
        beam=_BEAM_B,
        rounds=_BEAM_R,
        entry_n=_BEAM_ENTRY_N,
    )


def _knn_edge_ctes_over(src: str) -> list[str]:
    """Edge-construction oracle CTEs over an arbitrary corpus CTE
    ``src`` providing (vec_id, x DOUBLE[]): frozen planes (the first
    {n} ORIGINAL corpus vectors — maintenance codes new batches
    against the sidecar's frozen literals, so the oracle's planes
    must come from `e`, never from the widened set), rounded-sign
    bucket codes, within-bucket cosine pairs, per-source rank. The
    same construction as extensions.KNN_EDGE_CTES, parameterized so
    the maintenance oracles can point it at corpus∪batch or
    corpus∖doomed."""
    cos = (
        "round(list_inner_product(va.x, vb.x) / "
        "(sqrt(list_inner_product(va.x, va.x)) * "
        "sqrt(list_inner_product(vb.x, vb.x))), 6)"
    )
    return [
        f"planes AS (SELECT vec_id AS plane_id, x AS pvec FROM e WHERE vec_id < {_GRAPH_PLANES})",
        f"""gcodes AS (
      SELECT a.vec_id,
             CAST(sum(CASE WHEN round(list_inner_product(a.x, p.pvec), 6) >= 0
                      THEN CAST(power(2, p.plane_id) AS BIGINT) ELSE 0 END) AS BIGINT) AS code
      FROM {src} a CROSS JOIN planes p GROUP BY 1
    )""",
        f"""gscored AS (
      SELECT a.code, a.vec_id AS src_id, b.vec_id AS dst_id, {cos} AS sim
      FROM gcodes a
      JOIN gaffected f ON a.code = f.code
      JOIN gcodes b ON b.code = a.code AND b.vec_id <> a.vec_id
      JOIN {src} va ON va.vec_id = a.vec_id
      JOIN {src} vb ON vb.vec_id = b.vec_id
    )""",
        f"""granked AS (
      SELECT code, src_id, dst_id, sim,
             CAST(row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, dst_id) AS BIGINT) AS rank
      FROM gscored
    )""",
    ]


def _sql_graph_upsert_for(lo: int, hi: int, shift: int) -> str:
    """The graph-upsert oracle parameterized by batch range/shift —
    one definition shared by the batch entry (graph_index_upsert) and
    its streaming twin, so the two cannot drift."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)",
        f"""allv AS (
      SELECT vec_id, x FROM e
      UNION ALL
      SELECT vec_id + {shift} AS vec_id,
             list_concat(list_slice(x, 33, 64), list_slice(x, 1, 32)) AS x
      FROM e WHERE vec_id >= {lo} AND vec_id < {hi}
    )""",
    ]
    edge_ctes = _knn_edge_ctes_over("allv")
    gaff = f"gaffected AS (SELECT DISTINCT code FROM gcodes WHERE vec_id >= {shift})"
    ctes += edge_ctes[:2] + [gaff] + edge_ctes[2:]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT code, src_id, dst_id, sim, rank FROM granked WHERE rank <= {_GRAPH_K}
    ORDER BY src_id, rank
    """
    )


def _sql_graph_upsert() -> str:
    # delegates to the parameterized builder the streaming twin also
    # uses (byte-identical output for these constants — verified)
    return _sql_graph_upsert_for(_GUP_LO, _GUP_HI, _GUP_SHIFT)


@query("graph_index_upsert", sql=_sql_graph_upsert())
def graph_index_upsert(spark, sf_dir):
    """Incremental GRAPH-index maintenance: a new vector batch is
    coded against the FROZEN sidecar planes (pure projection — no
    re-planing), merged into the affected buckets' node partitions,
    and those buckets' edges are RECOMPUTED from the merged members —
    exact parity with a full rebuild because edges never cross
    buckets; new nodes get their out-edges AND existing bucket-mates
    see the new nodes as candidates (their edge lists update), the
    symmetric maintenance a graph index needs. Only the ≤ 2^n_planes
    affected partitions of both tables are rewritten (dynamic
    partition overwrite); idempotent. Returns the post-upsert DISK
    edges of the affected buckets, re-read from parquet — what a
    subsequent beam walk would scan. The oracle re-derives the edge
    construction over corpus∪batch restricted to the batch's buckets,
    with planes frozen to the ORIGINAL corpus. Maintains its own
    index copy (variant="upsert") so the synthetic batch never leaks
    into ann_graph_beam_served_topk's read-only index."""
    from lol_data_pipeline_spark.operators.graph_index import (
        ensure_knn_graph_index,
        graph_upsert,
        read_edges,
    )

    path, meta = ensure_knn_graph_index(
        spark, sf_dir, variant="upsert", n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    emb = T(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    batch = emb.filter(F.col("vec_id").between(_GUP_LO, _GUP_HI - 1)).select(
        (F.col("vec_id") + _GUP_SHIFT).alias("vec_id"),
        F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias("embedding"),
    )
    affected = graph_upsert(spark, path, meta, batch)
    disk = read_edges(spark, path, codes=affected)
    return disk.select(
        F.col("code").cast("long").alias("code"),
        "src_id",
        "dst_id",
        "sim",
        "rank",
    ).orderBy("src_id", "rank")


def _sql_graph_delete() -> str:
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)",
        f"""surv AS (
      SELECT vec_id, x FROM e
      WHERE vec_id < {_GDEL_LO} OR vec_id >= {_GDEL_HI}
    )""",
    ]
    edge_ctes = _knn_edge_ctes_over("surv")
    # affected buckets come from the DOOMED ids' codes — computed on
    # the FULL corpus coding (the doomed rows still exist there),
    # while edges recompute over the survivors only.
    gaff = f"""gall AS (
      SELECT a.vec_id,
             CAST(sum(CASE WHEN round(list_inner_product(a.x, p.pvec), 6) >= 0
                      THEN CAST(power(2, p.plane_id) AS BIGINT) ELSE 0 END) AS BIGINT) AS code
      FROM e a CROSS JOIN planes p GROUP BY 1
    ),
    gaffected AS (
      SELECT DISTINCT code FROM gall
      WHERE vec_id >= {_GDEL_LO} AND vec_id < {_GDEL_HI}
    )"""
    ctes += edge_ctes[:2] + [gaff] + edge_ctes[2:]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT code, src_id, dst_id, sim, rank FROM granked WHERE rank <= {_GRAPH_K}
    ORDER BY src_id, rank
    """
    )


@query("graph_index_delete", sql=_sql_graph_delete())
def graph_index_delete(spark, sf_dir):
    """GRAPH-index take-down: the doomed ids' buckets are located by
    RECODING their source vectors against the frozen planes (the
    deterministic coding IS the lookup — no index scan), their node
    partitions drop the doomed ids, and those buckets' edges are
    recomputed from the survivors — incident edges disappear AND
    survivors that lost a neighbor get their next-best bucket-mate
    promoted, exactly as a full rebuild would (dropping incident
    edges alone would leave survivors with short lists forever). A
    fully-emptied bucket loses its directory in BOTH tables.
    Idempotent. Returns the post-delete DISK edges of the affected
    buckets; the oracle re-derives the construction over
    corpus∖doomed restricted to the doomed buckets. Own index copy
    (variant="delete")."""
    from lol_data_pipeline_spark.operators.graph_index import (
        ensure_knn_graph_index,
        graph_delete,
        read_edges,
    )

    path, meta = ensure_knn_graph_index(
        spark, sf_dir, variant="delete", n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    emb = T(spark, sf_dir, "embeddings")
    doomed = emb.filter(
        F.col("vec_id").between(_GDEL_LO, _GDEL_HI - 1)
    ).select("vec_id", "embedding")
    affected = graph_delete(spark, path, meta, doomed)
    disk = read_edges(spark, path, codes=affected)
    return disk.select(
        F.col("code").cast("long").alias("code"),
        "src_id",
        "dst_id",
        "sim",
        "rank",
    ).orderBy("src_id", "rank")


# ---------------------------------------------------------------------------
# End-to-end retrieval composition: served-index candidate pool → MMR
# diversified rerank — the production pipeline shape (ann_mmr_rerank's
# exact-scan pool stays registered as the oracle baseline, the same
# role ann_cosine_topk plays for the ANN family).
# ---------------------------------------------------------------------------


def _sql_served_pool_head() -> str:
    """Oracle CTE chain reproducing the SERVED IVF+PQ pool: the
    sampled-trained codebook + probe + ADC + exact rescore of
    plans/round9.py's _sql_ivfpq_kmeans, ending in a
    ``pool``(query_id, cand, rel) CTE of the top-{pool} rescored
    candidates per query — exactly what served_ivfpq_topk(k=pool)
    returns, because serving is bit-identical to recomputation
    (tests/test_round10_ops.py::test_decode_matches_inquery_encode_bitwise)."""
    from lol_data_pipeline_spark.plans.extensions import SQL_COS, kmeans_ctes
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _NPROBE,
        _REFINE,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )
    from lol_data_pipeline_spark.plans.round10 import _MMR_POOL

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    dist = (
        "list_inner_product(e.x, e.x) - 2 * list_inner_product(e.x, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    qprobe AS (
      SELECT vec_id AS query_id, x AS qvec, cid AS pcell, rn AS probe_rank
      FROM (
        SELECT e.vec_id, e.x, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e CROSS JOIN {trained} c
        WHERE (e.vec_id >= {_KMQ_LO} AND e.vec_id < {_KMQ_HI})
           OR (e.vec_id >= {_KMQ_TAIL_LO} AND e.vec_id < {_KMQ_TAIL_HI})
      ) WHERE rn <= {_NPROBE}
    ),
    {_pq_xhat_ctes()},
    approx AS (
      SELECT q.query_id, cl.vec_id AS match_id, q.qvec,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_inner_product(q.qvec, h.xh) DESC,
                        cl.vec_id
             ) AS arank
      FROM qprobe q
      JOIN {cells} cl ON cl.cluster = q.pcell AND cl.vec_id <> q.query_id
      JOIN xhat h ON h.match_id = cl.vec_id
    ),
    cand AS (
      SELECT a.query_id, a.match_id,
             {SQL_COS.format(a='a.qvec', b='e.embedding')} AS sim
      FROM approx a JOIN embeddings e ON e.vec_id = a.match_id
      WHERE a.arank <= {_REFINE * _MMR_POOL}
    ),
    pool AS (
      SELECT query_id, match_id AS cand, sim AS rel FROM (
        SELECT query_id, match_id, sim,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY sim DESC, match_id
               ) AS rnk
        FROM cand
      ) WHERE rnk <= {_MMR_POOL}
    )"""
    )


def _sql_mmr_rounds_tail() -> str:
    """Greedy MMR selection CTEs over a ``pool``(query_id, cand, rel)
    CTE, candidate vectors joined from ``embeddings`` — the same
    rounds as plans/round10.py's _sql_mmr, with CTE names prefixed
    ``m`` because this chain coexists with kmeans_ctes (whose
    ``s{i}`` update CTEs would collide with the original's ``s{t}``
    selection names)."""
    from lol_data_pipeline_spark.plans.extensions import SQL_COS
    from lol_data_pipeline_spark.plans.queries import snap_sql
    from lol_data_pipeline_spark.plans.round10 import _MMR_K, _MMR_LAM

    lam, mu = _MMR_LAM, round(1 - _MMR_LAM, 6)
    snap1 = snap_sql(f"{lam} * rel")
    snapt = snap_sql(f"{lam} * rel - {mu} * div")
    ctes = [
        f"""msel1 AS (
      SELECT query_id, cand, rel, {snap1} AS score, 1 AS pick
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand) AS rn2
        FROM pool
      ) WHERE rn2 = 1
    )"""
    ]
    for t in range(2, _MMR_K + 1):
        prev = f"msel{t - 1}"
        ctes.append(f"""mdiv{t} AS (
      SELECT p.query_id, p.cand, p.rel,
             max({SQL_COS.format(a='cp.embedding', b='cs.embedding')}) AS div
      FROM pool p
      JOIN {prev} s ON s.query_id = p.query_id
      JOIN embeddings cp ON cp.vec_id = p.cand
      JOIN embeddings cs ON cs.vec_id = s.cand
      WHERE NOT EXISTS (
        SELECT 1 FROM {prev} z WHERE z.query_id = p.query_id AND z.cand = p.cand
      )
      GROUP BY 1, 2, 3
    )""")
        ctes.append(f"""mpick{t} AS (
      SELECT query_id, cand, rel, score, {t} AS pick FROM (
        SELECT query_id, cand, rel,
               {snapt} AS score,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY {snapt} DESC, cand
               ) AS rn2
        FROM mdiv{t}
      ) WHERE rn2 = 1
    )""")
        ctes.append(
            f"msel{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM mpick{t})"
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT query_id, CAST(cand AS BIGINT) AS match_id, rel, score AS mmr_score,
           CAST(pick AS BIGINT) AS pick
    FROM msel{_MMR_K} ORDER BY query_id, pick
    """
    )


def _sql_served_mmr() -> str:
    return _sql_served_pool_head() + ",\n    " + _sql_mmr_rounds_tail()


@query("ann_served_mmr_rerank", sql=_sql_served_mmr())
def ann_served_mmr_rerank(spark, sf_dir):
    """The retrieval pipeline END-TO-END: candidate pool from the
    PERSISTED IVF+PQ index (partition-pruned code scan + decode + ADC
    + bounded exact rescore — served_ivfpq_topk with k = the pool
    size) → greedy MMR diversification over that pool (the shared
    selection kernel operators/similarity.mmr_greedy). This is the
    production shape round 10's verdict asked for: ann_mmr_rerank's
    exact full-corpus pool stage (kept as the oracle baseline) is
    replaced by the index the repo already maintains — per query the
    pool costs nprobe pruned partitions + refine·pool rescore rows
    instead of a corpus scan. The oracle re-derives index build +
    probe + ADC + rescore + the identical selection rounds in one CTE
    chain (serving is bit-identical to recomputation, so the oracle
    can recompute). Queries: the fair seed-disjoint 20-id set."""
    from lol_data_pipeline_spark.caching import tracked_persist
    from lol_data_pipeline_spark.operators.similarity import mmr_greedy
    from lol_data_pipeline_spark.operators.vector_index import served_ivfpq_topk
    from lol_data_pipeline_spark.plans.round9 import _NPROBE, _REFINE
    from lol_data_pipeline_spark.plans.round10 import _MMR_LAM, _MMR_K, _MMR_POOL

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    # keep_vec threads the candidate vectors (for the diversity
    # terms) through the rescore stage's existing corpus join — the
    # pool stage costs NO extra scan beyond the serve itself
    pool = tracked_persist(
        served_ivfpq_topk(
            spark,
            sf_dir,
            queries,
            k=_MMR_POOL,
            refine=_REFINE,
            nprobe=_NPROBE,
            keep_vec=True,
        ).select(
            "query_id",
            F.col("match_id").alias("cand"),
            "cvec",
            F.col("sim").alias("rel"),
        )
    )
    out = mmr_greedy(pool, lam=_MMR_LAM, k=_MMR_K)
    return out.select(
        "query_id",
        F.col("cand").alias("match_id"),
        "rel",
        F.col("score").alias("mmr_score"),
        F.col("pick").cast("long").alias("pick"),
    ).orderBy("query_id", "pick")


# ---------------------------------------------------------------------------
# Index compaction — quota rebalance of skewed cells (the maintenance
# step a long-fed upsert index eventually needs).
# ---------------------------------------------------------------------------


def _compact_chain_sql() -> tuple[str, str]:
    """(prefix, cells): the WITH-chain build → decode → quota →
    keep-rank → next-nearest reassignment, through ``newassign`` —
    shared by the ann_index_compact oracle and the quota-trigger
    oracle (plans/round12.py) so the two compaction derivations
    cannot drift. Emitted text is byte-identical to what
    _sql_index_compact inlined before the extraction."""
    from lol_data_pipeline_spark.plans.extensions import kmeans_ctes
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    d2 = (
        "list_inner_product({x}, {x}) - 2 * list_inner_product({x}, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    prefix = (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes(src=cells, xcol="x", emit="both")},
    stats AS (SELECT cluster, count(*) AS n FROM {cells} GROUP BY 1),
    tot AS (
      SELECT CAST((sum(n) + {_IVF_CELLS - 1}) // {_IVF_CELLS} AS BIGINT) AS quota
      FROM stats
    ),
    overq AS (SELECT s.cluster FROM stats s, tot t WHERE s.n > t.quota),
    own AS (
      SELECT a.vec_id, a.cluster AS cell_id, h.xh,
             {d2.format(x="h.xh")} AS d2own
      FROM {cells} a
      JOIN overq v ON v.cluster = a.cluster
      JOIN xhat h ON h.match_id = a.vec_id
      JOIN {trained} c ON c.cid = a.cluster
    ),
    rankedm AS (
      SELECT own.*, row_number() OVER (
        PARTITION BY cell_id ORDER BY d2own, vec_id
      ) AS rn
      FROM own
    ),
    moverrows AS (
      SELECT r.vec_id, r.cell_id, r.xh FROM rankedm r, tot t WHERE r.rn > t.quota
    ),
    second AS (
      SELECT vec_id, cid AS to_cell FROM (
        SELECT m.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY m.vec_id
                 ORDER BY {d2.format(x="m.xh")}, c.cid
               ) AS rn2
        FROM moverrows m CROSS JOIN {trained} c
        WHERE c.cid <> m.cell_id
      ) WHERE rn2 = 1
    ),
    newassign AS (
      SELECT a.vec_id, CAST(COALESCE(s.to_cell, a.cluster) AS BIGINT) AS cell_id
      FROM {cells} a LEFT JOIN second s ON s.vec_id = a.vec_id
    )"""
    )
    return prefix, cells


def _sql_index_compact() -> str:
    prefix, _cells = _compact_chain_sql()
    return (
        prefix
        + """,
    affcells AS (
      SELECT cluster AS cell FROM overq
      UNION
      SELECT to_cell FROM second
    )
    SELECT n.vec_id, n.cell_id, c.codes
    FROM newassign n
    JOIN codes c USING (vec_id)
    JOIN affcells f ON n.cell_id = f.cell
    ORDER BY vec_id
    """
    )


@query("ann_index_compact", sql=_sql_index_compact())
def ann_index_compact(spark, sf_dir):
    """Index COMPACTION: rebalance over-quota cells by moving each
    such cell's members FARTHEST from its centroid (d² of the decoded
    x̂ — computed from the index alone, no source scan) to their
    next-nearest other centroid, rewriting only the donor∪receiver
    partitions (≤ codebook size). The maintenance step the upsert
    path eventually needs: batches land in ≤ k cells and nothing
    re-splits a hot cell, and cell skew IS scan skew at probe time.
    Codes are cell-independent in this no-residual PQ variant, so a
    move rewrites cell_id without re-encoding. Returns the
    post-compact DISK content of the affected partitions, re-read
    from parquet; the oracle re-derives build → decode → quota →
    keep-rank → next-nearest reassignment end-to-end. The entry
    rebuilds its private copy (variant="compact") from scratch each
    run — compaction is a one-way mutation, and a deterministic
    entry must pin the build→compact→read sequence, not compact an
    already-compacted artifact into a no-op."""
    import shutil

    from lol_data_pipeline_spark.operators.vector_index import (
        ensure_ivfpq_index,
        index_compact,
        pq_code_cols,
        read_index_codes,
    )
    from lol_data_pipeline_spark.plans.round10 import _INDEX_PARAMS
    from lol_data_pipeline_spark.plans.round9 import _PQ_M

    # compaction mutates in place and a single pass can leave a
    # RECEIVER over quota, so "is it already compacted" is not
    # decidable from counts — always start from a freshly built
    # artifact (bounded cost: one private build per run)
    path, meta = ensure_ivfpq_index(
        spark, sf_dir, variant="compact", **_INDEX_PARAMS
    )
    shutil.rmtree(path, ignore_errors=True)
    path, meta = ensure_ivfpq_index(
        spark, sf_dir, variant="compact", **_INDEX_PARAMS
    )
    affected, _moves = index_compact(spark, path, meta)
    disk = read_index_codes(spark, path, meta, cells=affected)
    return disk.select(
        "vec_id",
        F.col("cell_id").cast("long").alias("cell_id"),
        F.concat_ws(",", *pq_code_cols(_PQ_M)).alias("codes"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Top-r spectral directions — power iteration with Hotelling deflation
# (the PCA-whitening front-end an embedding pipeline wants; extends
# round10's single-direction emb_power_iteration).
# ---------------------------------------------------------------------------

_PR_DIRS = 2


def _power_cte_list() -> list[str]:
    """The deflated power-iteration CTE chain (e, p, then per
    direction d the round/deflation/normalize CTEs ending at
    d{d}v{R}) — shared by the emb_power_topr oracle and the
    spectral-front-end ANN oracle so the two derivations cannot
    drift. The emitted text is byte-identical to what
    _sql_power_topr inlined before the extraction (fingerprint-
    stable)."""
    from lol_data_pipeline_spark.plans.round10 import _PI_ROUNDS

    R = _PI_ROUNDS
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)",
        "p AS (SELECT unnest(generate_series(1, 64)) AS pos)",
    ]
    for d in range(_PR_DIRS):
        ctes.append(
            f"d{d}v0 AS MATERIALIZED (SELECT x AS v FROM e WHERE vec_id = {d})"
        )
        for r in range(1, R + 1):
            ctes.append(f"""d{d}t{r} AS MATERIALIZED (
      SELECT p.pos,
             sum(CAST(floor(e.x[p.pos] * list_inner_product(e.x, (SELECT v FROM d{d}v{r - 1})) * 1048576.0) AS BIGINT)) AS sv
      FROM e CROSS JOIN p GROUP BY 1
    )""")
            wname = f"d{d}w{r}_0"
            ctes.append(
                f"{wname} AS MATERIALIZED (SELECT list(sv / 1048576.0 ORDER BY pos) AS w FROM d{d}t{r})"
            )
            # deflate against each CONVERGED earlier direction, in
            # discovery order — identical arithmetic to the Spark
            # side's driver loop (w ← w − (w·u)·u per u)
            for j in range(d):
                uj = f"d{j}v{R}"
                du = f"d{d}u{r}_{j}"
                ctes.append(
                    f"{du} AS MATERIALIZED (SELECT list_inner_product(w, (SELECT v FROM {uj})) AS du FROM {wname})"
                )
                nxt = f"d{d}w{r}_{j + 1}"
                ctes.append(f"""{nxt} AS MATERIALIZED (
      SELECT list(ww ORDER BY pos) AS w FROM (
        SELECT p.pos, t.w[p.pos] - u.du * (SELECT v FROM {uj})[p.pos] AS ww
        FROM p, {wname} t, {du} u
      )
    )""")
                wname = nxt
            ctes.append(
                f"d{d}v{r} AS MATERIALIZED (SELECT list_transform(w, y -> y / sqrt(list_inner_product(w, w))) AS v FROM {wname})"
            )
    return ctes


def _sql_power_topr() -> str:
    from lol_data_pipeline_spark.plans.round10 import _PI_ROUNDS

    R = _PI_ROUNDS
    ctes = _power_cte_list()
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({d} AS BIGINT) AS direction, CAST(p.pos - 1 AS BIGINT) AS pos,"
        f" round((SELECT v FROM d{d}v{R})[p.pos], 6) AS loading FROM p"
        for d in range(_PR_DIRS)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT * FROM (
    {finals}
    ) ORDER BY direction, pos
    """
    )


@query("emb_power_topr", sql=_sql_power_topr())
def emb_power_topr(spark, sf_dir):
    """Top-{r} principal DIRECTIONS of the embedding corpus: power
    iteration with Hotelling DEFLATION — direction d starts from the
    vec_id-d embedding (sign fix) and every round subtracts each
    converged earlier direction's projection from the G·v product
    before normalizing, so direction d converges in the orthogonal
    complement of the found span. The spectral front-end a
    PCA-whitening / anisotropy-removal stage needs (one direction =
    round10's emb_power_iteration; real pipelines want the top few).
    Distributed cost per round is unchanged: ONE codegen aggregate
    whose shuffle is dim partial rows at any corpus size (floor(x·s·
    2^20) BIGINT sums — bit-identical across engines/partitionings)
    plus a dim-row collect; deflation is driver-side arithmetic on
    dim-sized vectors with the engines' fold order. The oracle
    unrolls every round AND every subtraction. Returns (direction,
    pos, loading)."""
    from lol_data_pipeline_spark.operators.clustering import power_topr
    from lol_data_pipeline_spark.plans.round10 import _PI_ROUNDS

    emb = T(spark, sf_dir, "embeddings")
    dirs = power_topr(emb, r=_PR_DIRS, rounds=_PI_ROUNDS, dim=64)
    raw = spark.createDataFrame(
        [
            (d, p, float(x))
            for d, vec in enumerate(dirs)
            for p, x in enumerate(vec)
        ],
        "direction bigint, pos bigint, loading double",
    )
    # round via the ENGINE (not Python's round) — the Spark-vs-DuckDB
    # round() pairing is the parity-proven one across the registry.
    return raw.select(
        "direction", "pos", F.round("loading", 6).alias("loading")
    ).orderBy("direction", "pos")


# ---------------------------------------------------------------------------
# Streaming upsert INTO the served index — round10's stream assigned
# but never wrote; this wires the foreachBatch sink to index_upsert so
# the stream actually maintains a queryable artifact.
# ---------------------------------------------------------------------------

_SUP_LO, _SUP_HI = 250, 270
_SUP_SHIFT = 300000


def _sql_stream_upsert() -> str:
    from lol_data_pipeline_spark.plans.extensions import kmeans_ctes
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
        assign_src="allv",
    )
    allv = f"""allv AS (
      SELECT vec_id, x FROM e
      UNION ALL
      SELECT vec_id + {_SUP_SHIFT} AS vec_id,
             list_concat(list_slice(x, 33, 64), list_slice(x, 1, 32)) AS x
      FROM e WHERE vec_id >= {_SUP_LO} AND vec_id < {_SUP_HI}
    )"""
    ctes = ctes[:2] + [allv] + ctes[2:]
    cells = f"a{_KM_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes(src=cells, xcol="x", emit="codes")},
    affected AS (
      SELECT DISTINCT cluster FROM {cells} WHERE vec_id >= {_SUP_SHIFT}
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cell_id, c.codes
    FROM {cells} a
    JOIN codes c USING (vec_id)
    JOIN affected f ON a.cluster = f.cluster
    ORDER BY vec_id
    """
    )


@query("stream_ann_upsert_multibatch", sql=_sql_stream_upsert())
def stream_ann_upsert_multibatch(spark, sf_dir):
    """STREAMING index MAINTENANCE end-to-end: new vectors arrive as
    a four-batch ordered replay, are assigned to the FROZEN persisted
    codebook + PQ-encoded (stateless pure projection per micro-batch,
    like round10's stream_ann_assign_multibatch) — and then each
    micro-batch is WRITTEN THROUGH a foreachBatch sink into the
    persisted index via index_upsert (dynamic overwrite of ≤
    codebook-size partitions per epoch; idempotent, so a replayed
    epoch rewrites identical content — the exactly-once-by-
    idempotence discipline streaming/sinks.py documents). What is
    verified is the post-stream DISK content of the affected
    partitions — the stream maintained a QUERYABLE artifact, not just
    an assignment feed (the gap round 10's verdict flagged). The
    oracle re-derives the batch build over corpus∪batch end-to-end
    and restricts to the batch's cells. Own index copy
    (variant="streamup")."""
    from lol_data_pipeline_spark.operators.vector_index import (
        assign_to_index,
        ensure_ivfpq_index,
        index_upsert,
        pq_code_cols,
        read_index_codes,
    )
    from lol_data_pipeline_spark.plans.round10 import _INDEX_PARAMS
    from lol_data_pipeline_spark.plans.round9 import _PQ_M
    from lol_data_pipeline_spark.streaming.windows import replay_multibatch

    path, meta = ensure_ivfpq_index(
        spark, sf_dir, variant="streamup", **_INDEX_PARAMS
    )
    emb = T(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    batch = emb.filter(F.col("vec_id").between(_SUP_LO, _SUP_HI - 1)).select(
        (F.col("vec_id") + _SUP_SHIFT).alias("vec_id"),
        F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias("embedding"),
    )
    parts = [batch.filter(F.col("vec_id") % 4 == i) for i in range(4)]

    def build(stream):
        return assign_to_index(stream, meta)

    def sink(df, _epoch_id):
        index_upsert(spark, path, meta, df)

    replay_multibatch(
        spark,
        parts,
        build,
        mode="append",
        key=f"ann_upsert:{sf_dir}",
        foreach_batch=sink,
    )
    affected = sorted(
        int(r.cell_id)
        for r in assign_to_index(batch, meta)
        .select("cell_id")
        .distinct()
        .collect()
    )
    disk = read_index_codes(spark, path, meta, cells=affected)
    return disk.select(
        "vec_id",
        F.col("cell_id").cast("long").alias("cell_id"),
        F.concat_ws(",", *pq_code_cols(_PQ_M)).alias("codes"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Recall-vs-nprobe on the SERVED index — round10's ann_recall_eval
# evaluates in-query variants; this measures the quality of what
# production actually serves, across the probe-width lever.
# ---------------------------------------------------------------------------

_RECALL_NPROBES = (1, 2, 4)


def _sql_served_recall() -> str:
    from lol_data_pipeline_spark.plans.extensions import SQL_COS, kmeans_ctes
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _K,
        _KM_ROUNDS,
        _REFINE,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    dist = (
        "list_inner_product(e.x, e.x) - 2 * list_inner_product(e.x, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    fair = (
        f"(vec_id >= {_KMQ_LO} AND vec_id < {_KMQ_HI})"
        f" OR (vec_id >= {_KMQ_TAIL_LO} AND vec_id < {_KMQ_TAIL_HI})"
    )
    head = (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes()},
    qe AS (SELECT vec_id AS query_id, x AS qvec FROM e WHERE {fair}),
    se AS (
      SELECT qe.query_id, c.vec_id AS match_id,
             {SQL_COS.format(a='qe.qvec', b='c.x')} AS sim
      FROM qe JOIN e c ON c.vec_id <> qe.query_id
    ),
    exact AS (
      SELECT query_id, match_id FROM (
        SELECT query_id, match_id,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, match_id) AS rank
        FROM se
      ) WHERE rank <= {_K}
    ),
    qprobeall AS (
      SELECT vec_id AS query_id, x AS qvec, cid AS pcell, rn
      FROM (
        SELECT e.vec_id, e.x, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e CROSS JOIN {trained} c
        WHERE {fair.replace('vec_id', 'e.vec_id')}
      ) WHERE rn <= {max(_RECALL_NPROBES)}
    )"""
    )
    per_np = []
    for np_ in _RECALL_NPROBES:
        per_np.append(f""",
    approx{np_} AS (
      SELECT q.query_id, cl.vec_id AS match_id, q.qvec,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_inner_product(q.qvec, h.xh) DESC, cl.vec_id
             ) AS arank
      FROM qprobeall q
      JOIN {cells} cl ON cl.cluster = q.pcell AND cl.vec_id <> q.query_id
      JOIN xhat h ON h.match_id = cl.vec_id
      WHERE q.rn <= {np_}
    ),
    ranked{np_} AS (
      SELECT query_id, match_id FROM (
        SELECT c2.query_id, c2.match_id,
               row_number() OVER (
                 PARTITION BY c2.query_id ORDER BY c2.sim DESC, c2.match_id
               ) AS rank
        FROM (
          SELECT a.query_id, a.match_id,
                 {SQL_COS.format(a='a.qvec', b='e2.embedding')} AS sim
          FROM approx{np_} a JOIN embeddings e2 ON e2.vec_id = a.match_id
          WHERE a.arank <= {_REFINE * _K}
        ) c2
      ) WHERE rank <= {_K}
    )""")
    finals = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({np_} AS BIGINT) AS nprobe, x.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(CAST(sum(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS recall_at_5
    FROM exact x LEFT JOIN ranked{np_} a
      ON a.query_id = x.query_id AND a.match_id = x.match_id
    GROUP BY 1, 2"""
        for np_ in _RECALL_NPROBES
    )
    return (
        head
        + "".join(per_np)
        + f"""
    SELECT * FROM (
    {finals}
    ) ORDER BY nprobe, query_id
    """
    )


@query("ann_served_recall_eval", sql=_sql_served_recall())
def ann_served_recall_eval(spark, sf_dir):
    """Recall@{k} of the SERVED IVF+PQ index against brute-force
    ground truth, per query, across nprobe ∈ {probes} — the curve an
    operator reads before picking the probe width, measured on what
    production actually serves (ann_recall_eval evaluates in-query
    variants; serving quality must be measured, not inherited). All
    three probe widths serve from the SAME persisted artifact — only
    the partition filter widens, which is exactly the 100 TB cost
    model: recall is bought with nprobe/C more files scanned, nothing
    is rebuilt. The exact side runs over the fixed 20-query fair set
    (the affordable-eval pattern ann_recall_eval documents). The
    oracle re-derives the codebook, the probe ranks once (rn ≤ max
    nprobe), and per width the ADC ranking + rescore + hit join."""
    from lol_data_pipeline_spark.operators import similarity as sim
    from lol_data_pipeline_spark.operators.vector_index import (
        served_ivfpq_topk_multi,
    )
    from lol_data_pipeline_spark.plans.round9 import _REFINE

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    exact = sim.cosine_topk(emb, queries, k=_K).select("query_id", "match_id")
    # one multi-width plan: probe once at max(nprobe), ONE pruned
    # index scan, per-width ADC windows, one shared rescore — not
    # three full serve pipelines (3× the index machinery for rows the
    # widest width already computed)
    served = served_ivfpq_topk_multi(
        spark, sf_dir, queries, list(_RECALL_NPROBES), k=_K, refine=_REFINE
    ).select(
        "nprobe",
        F.col("query_id").alias("aq"),
        F.col("match_id").alias("am"),
        F.lit(1).alias("hit"),
    )
    probes = spark.createDataFrame(
        [(n,) for n in _RECALL_NPROBES], "nprobe long"
    )
    base = exact.crossJoin(F.broadcast(probes))
    return (
        base.join(
            served,
            (F.col("query_id") == F.col("aq"))
            & (F.col("match_id") == F.col("am"))
            & (base.nprobe == served.nprobe),
            "left",
        )
        .drop(served.nprobe)
        .groupBy("nprobe", "query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
            F.expr(
                "round(CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)"
                " / count(*), 6)"
            ).alias("recall_at_5"),
        )
        .orderBy("nprobe", "query_id")
    )


# ---------------------------------------------------------------------------
# Index observability — the monitoring view that TRIGGERS maintenance
# (cell skew is scan skew at probe time; compaction is the response).
# ---------------------------------------------------------------------------


def _sql_index_stats() -> str:
    from lol_data_pipeline_spark.plans.extensions import kmeans_ctes
    from lol_data_pipeline_spark.plans.queries import snap_sql
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _SAMPLE_WHERE,
    )

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    frac = snap_sql("CAST(s.n_members AS DOUBLE) / t.total")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    stats AS (
      SELECT CAST(cluster AS BIGINT) AS cell_id, CAST(count(*) AS BIGINT) AS n_members
      FROM {cells} GROUP BY 1
    ),
    tot AS (SELECT sum(n_members) AS total FROM stats)
    SELECT s.cell_id, s.n_members,
           {frac} AS frac
    FROM stats s, tot t
    ORDER BY cell_id
    """
    )


@query("ann_index_stats", sql=_sql_index_stats())
def ann_index_stats(spark, sf_dir):
    """IVF+PQ index OBSERVABILITY: per-cell membership of the
    persisted artifact (cell_id, n_members, frac) — the monitoring
    view an operator reads to decide WHEN to run ann_index_compact
    (cell skew is scan skew at probe time; a frac far above 1/k marks
    a hot cell). Computed from the index's partition layout alone:
    one aggregate over the ≤ k-directory scan reading only vec_id +
    the partition column — no source access, no vector bytes. frac
    takes the tie-safe snap (exact rational n/total). The oracle
    re-derives the build's cell assignment and counts it."""
    from lol_data_pipeline_spark.functions.scalar import snap
    from lol_data_pipeline_spark.operators.vector_index import (
        ensure_ivfpq_index,
        read_index_codes,
    )
    from lol_data_pipeline_spark.plans.round10 import _INDEX_PARAMS

    path, _meta = ensure_ivfpq_index(spark, sf_dir, **_INDEX_PARAMS)
    counts = (
        read_index_codes(spark, path, _meta)
        .groupBy(F.col("cell_id").cast("long").alias("cell_id"))
        .agg(F.count("*").cast("long").alias("n_members"))
    )
    total = counts.agg(F.sum("n_members").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "cell_id",
            "n_members",
            snap(F.col("n_members").cast("double") / F.col("total")).alias(
                "frac"
            ),
        )
        .orderBy("cell_id")
    )


def _sql_graph_stats() -> str:
    edge_ctes = _knn_edge_ctes_over("e")
    gaff = "gaffected AS (SELECT DISTINCT code FROM gcodes)"
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)"
    ] + edge_ctes[:2] + [gaff] + edge_ctes[2:]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    nodes AS (SELECT code, CAST(count(*) AS BIGINT) AS n_nodes FROM gcodes GROUP BY 1),
    eco AS (
      SELECT code, CAST(count(*) AS BIGINT) AS n_edges
      FROM granked WHERE rank <= {_GRAPH_K} GROUP BY 1
    )
    SELECT n.code, n.n_nodes, COALESCE(e2.n_edges, 0) AS n_edges
    FROM nodes n LEFT JOIN eco e2 USING (code)
    ORDER BY code
    """
    )


@query("graph_index_stats", sql=_sql_graph_stats())
def graph_index_stats(spark, sf_dir):
    """k-NN graph index OBSERVABILITY: per-bucket node and edge
    counts of the persisted artifact (code, n_nodes, n_edges) — the
    view that surfaces bucket skew (a hot LSH bucket means Σ bucket²
    maintenance cost concentrates there; the lever is n_planes).
    Computed from the artifact's two partition layouts alone; a
    single-member bucket legitimately has 0 edges (nothing to pair
    with) and still reports. The oracle re-derives coding + edge
    construction over the corpus."""
    from lol_data_pipeline_spark.operators.graph_index import (
        ensure_knn_graph_index,
        read_edges,
        read_nodes,
    )

    path, _meta = ensure_knn_graph_index(
        spark, sf_dir, n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    nodes = (
        read_nodes(spark, path)
        .groupBy(F.col("code").cast("long").alias("code"))
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
    edges = (
        read_edges(spark, path)
        .groupBy(F.col("code").cast("long").alias("code"))
        .agg(F.count("*").cast("long").alias("n_edges"))
    )
    return (
        nodes.join(edges, "code", "left")
        .select(
            "code",
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0).cast("long")).alias(
                "n_edges"
            ),
        )
        .orderBy("code")
    )


# ---------------------------------------------------------------------------
# Graph-axis recall eval — quality measurement for the third index
# family, mirroring ann_served_recall_eval's role for the IVF axis.
# ---------------------------------------------------------------------------


def _sql_graph_recall() -> str:
    from lol_data_pipeline_spark.plans.extensions import KNN_EDGE_CTES, SQL_COS

    ctes = [
        KNN_EDGE_CTES,
        "edges AS (SELECT src_id, dst_id FROM ranked WHERE rank <= 3)",
        f"""qset AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE (vec_id >= {_KMQ_LO} AND vec_id < {_KMQ_HI})
         OR (vec_id >= {_KMQ_TAIL_LO} AND vec_id < {_KMQ_TAIL_HI})
    )""",
        f"""f0 AS (
      SELECT q.query_id, e.vec_id AS cand
      FROM qset q CROSS JOIN (SELECT vec_id FROM embeddings WHERE vec_id < {_BEAM_ENTRY_N}) e
    )""",
    ]
    for r in range(1, _BEAM_R + 1):
        ctes.append(f"""x{r} AS (
      SELECT query_id, cand FROM f{r - 1}
      UNION
      SELECT f.query_id, ed.dst_id AS cand
      FROM f{r - 1} f JOIN edges ed ON ed.src_id = f.cand
    )""")
        ctes.append(f"""s{r} AS (
      SELECT x.query_id, x.cand,
             {SQL_COS.format(a='q.qvec', b='c.embedding')} AS sim
      FROM x{r} x
      JOIN qset q ON q.query_id = x.query_id
      JOIN embeddings c ON c.vec_id = x.cand
      WHERE x.cand <> x.query_id
    )""")
        ctes.append(f"""f{r} AS (
      SELECT query_id, cand FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand) AS rn
        FROM s{r}
      ) WHERE rn <= {_BEAM_B}
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    beam AS (
      SELECT query_id, cand AS match_id FROM (
        SELECT query_id, cand,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand) AS rank
        FROM s{_BEAM_R}
      ) WHERE rank <= {_K}
    ),
    ex AS (
      SELECT query_id, match_id FROM (
        SELECT q.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {SQL_COS.format(a='q.qvec', b='c.embedding')} DESC, c.vec_id
               ) AS rank
        FROM qset q JOIN embeddings c ON c.vec_id <> q.query_id
      ) WHERE rank <= {_K}
    )
    SELECT x.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN b.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(CAST(sum(CASE WHEN b.match_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS recall_at_5
    FROM ex x LEFT JOIN beam b
      ON b.query_id = x.query_id AND b.match_id = x.match_id
    GROUP BY 1
    ORDER BY x.query_id
    """
    )


@query("ann_graph_recall_eval", sql=_sql_graph_recall())
def ann_graph_recall_eval(spark, sf_dir):
    """Recall@{k} of the SERVED graph-beam index against brute-force
    ground truth, per query — the quality harness for the third index
    axis, mirroring ann_served_recall_eval's role for the IVF axis
    (every deployed index needs its recall measured, not inherited;
    beam width / rounds / entry count are the graph axis's levers the
    way nprobe is IVF's). Both sides reuse production operators
    verbatim: graph_index.served_beam_topk over the persisted edges,
    similarity.cosine_topk for the exact side, a (queries×k)-row left
    join for the comparison. The oracle re-derives the edge CTEs
    (shared verbatim with emb_knn_graph), the beam unroll (shared
    with the beam entries), and the hit join."""
    from lol_data_pipeline_spark.operators import similarity as sim
    from lol_data_pipeline_spark.operators.graph_index import served_beam_topk

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    exact = sim.cosine_topk(emb, queries, k=_K).select("query_id", "match_id")
    beam = served_beam_topk(
        spark,
        sf_dir,
        queries,
        k=_K,
        beam=_BEAM_B,
        rounds=_BEAM_R,
        entry_n=_BEAM_ENTRY_N,
    ).select(
        F.col("query_id").alias("bq"),
        F.col("match_id").alias("bm"),
        F.lit(1).alias("hit"),
    )
    return (
        exact.join(
            beam,
            (F.col("query_id") == F.col("bq"))
            & (F.col("match_id") == F.col("bm")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
            F.expr(
                "round(CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)"
                " / count(*), 6)"
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Streaming maintenance for the GRAPH index (symmetry with
# stream_ann_upsert_multibatch) and the two-artifact hybrid: IVF
# routes the entry points, the graph walks from them.
# ---------------------------------------------------------------------------

_GSUP_LO, _GSUP_HI = 230, 250
_GSUP_SHIFT = 600000



@query(
    "stream_graph_upsert_multibatch",
    sql=_sql_graph_upsert_for(_GSUP_LO, _GSUP_HI, _GSUP_SHIFT),
)
def stream_graph_upsert_multibatch(spark, sf_dir):
    """STREAMING maintenance for the GRAPH index — the graph twin of
    stream_ann_upsert_multibatch: new vectors arrive as a four-batch
    ordered replay and each micro-batch is written THROUGH a
    foreachBatch graph_upsert sink (code the batch against the frozen
    sidecar planes, merge the affected buckets' nodes, recompute
    those buckets' edges, dynamic-overwrite both tables' affected
    partitions). Idempotent per epoch — bucket-local recompute
    rewrites identical content on replay. Verified on the post-stream
    DISK edges of the batch's buckets; because edges never cross
    buckets and recompute is exact, the four-batch incremental result
    equals the one-shot batch upsert, which is what the shared oracle
    (graph_index_upsert's, re-parameterized) checks. Own index copy
    (variant="streamup")."""
    from lol_data_pipeline_spark.operators.graph_index import (
        assign_codes,
        ensure_knn_graph_index,
        graph_upsert,
        read_edges,
    )
    from lol_data_pipeline_spark.streaming.windows import replay_multibatch

    path, meta = ensure_knn_graph_index(
        spark, sf_dir, variant="streamup", n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    emb = T(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    batch = emb.filter(F.col("vec_id").between(_GSUP_LO, _GSUP_HI - 1)).select(
        (F.col("vec_id") + _GSUP_SHIFT).alias("vec_id"),
        F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias("embedding"),
    )
    parts = [batch.filter(F.col("vec_id") % 4 == i) for i in range(4)]

    def build(stream):
        return stream.select("vec_id", "embedding")

    def sink(df, _epoch_id):
        graph_upsert(spark, path, meta, df)

    replay_multibatch(
        spark,
        parts,
        build,
        mode="append",
        key=f"graph_upsert:{sf_dir}",
        foreach_batch=sink,
    )
    affected = sorted(
        int(r.code)
        for r in assign_codes(batch, meta["planes"])
        .select("code")
        .distinct()
        .collect()
    )
    disk = read_edges(spark, path, codes=affected)
    return disk.select(
        F.col("code").cast("long").alias("code"),
        "src_id",
        "dst_id",
        "sim",
        "rank",
    ).orderBy("src_id", "rank")


_HYB_ENTRY_K = 4


def _sql_hybrid_index() -> str:
    """Two persisted artifacts composed: the IVF+PQ serve chain
    yields each query's top-{ek} candidates as PER-QUERY entry
    points; the beam walk expands them over the k-NN graph edges.
    CTE names: kmeans_ctes owns e/es/c*/a*/s*, the PQ chain owns
    cents/sub/cs2/xs2/d/chosen/xhat, the graph chain owns g*-names,
    beam rounds are b*-prefixed — zero collisions by construction."""
    from lol_data_pipeline_spark.plans.extensions import SQL_COS, kmeans_ctes
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _NPROBE,
        _REFINE,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    dist = (
        "list_inner_product(e.x, e.x) - 2 * list_inner_product(e.x, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    fair = (
        f"(e.vec_id >= {_KMQ_LO} AND e.vec_id < {_KMQ_HI})"
        f" OR (e.vec_id >= {_KMQ_TAIL_LO} AND e.vec_id < {_KMQ_TAIL_HI})"
    )
    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    head = (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    qprobe AS (
      SELECT vec_id AS query_id, x AS qvec, cid AS pcell, rn AS probe_rank
      FROM (
        SELECT e.vec_id, e.x, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e CROSS JOIN {trained} c
        WHERE {fair}
      ) WHERE rn <= {_NPROBE}
    ),
    {_pq_xhat_ctes()},
    approx AS (
      SELECT q.query_id, cl.vec_id AS match_id, q.qvec,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_inner_product(q.qvec, h.xh) DESC,
                        cl.vec_id
             ) AS arank
      FROM qprobe q
      JOIN {cells} cl ON cl.cluster = q.pcell AND cl.vec_id <> q.query_id
      JOIN xhat h ON h.match_id = cl.vec_id
    ),
    rcand AS (
      SELECT a.query_id, a.match_id,
             {SQL_COS.format(a='a.qvec', b='e2.embedding')} AS sim
      FROM approx a JOIN embeddings e2 ON e2.vec_id = a.match_id
      WHERE a.arank <= {_REFINE * _HYB_ENTRY_K}
    ),
    bf0 AS (
      SELECT query_id, match_id AS cand FROM (
        SELECT query_id, match_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY sim DESC, match_id
               ) AS rnk
        FROM rcand
      ) WHERE rnk <= {_HYB_ENTRY_K}
    )"""
    )
    edge_ctes = _knn_edge_ctes_over("e")
    gaff = "gaffected AS (SELECT DISTINCT code FROM gcodes)"
    graph = (
        ",\n    "
        + ",\n".join(edge_ctes[:2] + [gaff] + edge_ctes[2:])
        + f""",
    gedges AS (SELECT src_id, dst_id FROM granked WHERE rank <= {_GRAPH_K}),
    bqset AS (
      SELECT vec_id AS query_id, x AS qvec FROM e
      WHERE (vec_id >= {_KMQ_LO} AND vec_id < {_KMQ_HI})
         OR (vec_id >= {_KMQ_TAIL_LO} AND vec_id < {_KMQ_TAIL_HI})
    )"""
    )
    rounds = []
    for r in range(1, _BEAM_R + 1):
        rounds.append(f""",
    bx{r} AS (
      SELECT query_id, cand FROM bf{r - 1}
      UNION
      SELECT f.query_id, ed.dst_id AS cand
      FROM bf{r - 1} f JOIN gedges ed ON ed.src_id = f.cand
    ),
    bs{r} AS (
      SELECT x2.query_id, x2.cand,
             {SQL_COS.format(a='q.qvec', b='c.x')} AS sim
      FROM bx{r} x2
      JOIN bqset q ON q.query_id = x2.query_id
      JOIN e c ON c.vec_id = x2.cand
      WHERE x2.cand <> x2.query_id
    ),
    bf{r} AS (
      SELECT query_id, cand FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand) AS rn
        FROM bs{r}
      ) WHERE rn <= {_BEAM_B}
    )""")
    return (
        head
        + graph
        + "".join(rounds)
        + f"""
    SELECT query_id, CAST(cand AS BIGINT) AS match_id, sim, rank
    FROM (
      SELECT query_id, cand, sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand) AS BIGINT) AS rank
      FROM bs{_BEAM_R}
    ) WHERE rank <= {_K}
    """
    )


@query("ann_hybrid_index_topk", sql=_sql_hybrid_index())
def ann_hybrid_index_topk(spark, sf_dir):
    """BOTH persisted artifacts composed in one query — the
    IVF-routes/graph-walks hybrid real retrieval systems deploy: the
    served IVF+PQ index produces each query's top-{ek} candidates
    (partition-pruned code scan + bounded rescore) as PER-QUERY entry
    points, and the beam walk expands them over the persisted k-NN
    graph edges (query-local entries beat the fixed lowest-id entry
    nodes the plain beam uses — the walk starts inside the query's
    neighborhood instead of crossing the space). Everything bounded:
    entries = Q×{ek}, frontier = Q×B broadcast rows,
    lineage-truncated rounds; both index builds are amortized
    artifacts. The oracle re-derives the full IVF serve chain, the
    edge construction, and the beam unroll in one CTE chain."""
    from lol_data_pipeline_spark.operators.graph_index import served_beam_topk
    from lol_data_pipeline_spark.operators.vector_index import served_ivfpq_topk
    from lol_data_pipeline_spark.plans.round9 import _NPROBE, _REFINE

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    entries = served_ivfpq_topk(
        spark, sf_dir, queries, k=_HYB_ENTRY_K, refine=_REFINE, nprobe=_NPROBE
    ).select("query_id", F.col("match_id").alias("cand"))
    return served_beam_topk(
        spark,
        sf_dir,
        queries,
        k=_K,
        beam=_BEAM_B,
        rounds=_BEAM_R,
        entries=entries,
    )


# ---------------------------------------------------------------------------
# Artifact reuse beyond search: the persisted graph doubles as the
# candidate-pair feed of a similarity-dedup pipeline.
# ---------------------------------------------------------------------------

_PAIR_TAU = 0.35


def _sql_graph_sim_pairs() -> str:
    edge_ctes = _knn_edge_ctes_over("e")
    gaff = "gaffected AS (SELECT DISTINCT code FROM gcodes)"
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)"
    ] + edge_ctes[:2] + [gaff] + edge_ctes[2:]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT DISTINCT
           CAST(least(src_id, dst_id) AS BIGINT) AS id_a,
           CAST(greatest(src_id, dst_id) AS BIGINT) AS id_b,
           sim
    FROM granked
    WHERE rank <= {_GRAPH_K} AND sim >= {_PAIR_TAU}
    ORDER BY id_a, id_b
    """
    )


@query("dedup_graph_pairs_served", sql=_sql_graph_sim_pairs())
def dedup_graph_pairs_served(spark, sf_dir):
    """Similarity-pair extraction from the PERSISTED k-NN graph — the
    same artifact that serves beam search doubles as the
    candidate-pair feed of an embedding-dedup pipeline (pairs with
    cosine ≥ τ; τ is the dedup policy knob, and the graph's top-k
    edges are exactly the bounded candidate set a near-dup pass
    scores — no second pairwise stage). One filter + canonicalize
    (least/greatest + distinct: the edge list is directed and a close
    pair usually appears in both directions) over the at-rest edge
    table — at 100 TB this reads k·N tiny edge rows and touches no
    vectors. Downstream is the existing components/keep-first
    machinery (dedup_components, corpus_dedup_keep_first). The oracle
    re-derives the edge construction and applies the same filter."""
    from lol_data_pipeline_spark.operators.graph_index import (
        ensure_knn_graph_index,
        read_edges,
    )

    path, _meta = ensure_knn_graph_index(
        spark, sf_dir, n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    edges = read_edges(spark, path).filter(F.col("sim") >= _PAIR_TAU)
    return (
        edges.select(
            F.least("src_id", "dst_id").alias("id_a"),
            F.greatest("src_id", "dst_id").alias("id_b"),
            "sim",
        )
        .distinct()
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# The LEXICAL served index — BM25 postings as an at-rest artifact,
# completing the served-index family's third axis (quantization =
# vector_index, graph = graph_index, lexical = text_index).
# ---------------------------------------------------------------------------

_BMUP_LO, _BMUP_HI = 10, 30
_BMUP_SHIFT = 100000
_BMDEL_LO, _BMDEL_HI = 5, 25


def _bm25_oracle(src: str = "documents", head: str = "") -> str:
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
        _sql_bm25,
    )

    return _sql_bm25(_BM25_TERMS, _BM25_K, _BM25_K1, _BM25_B, src=src, head=head)


@query("text_bm25_served", sql=_bm25_oracle())
def text_bm25_served(spark, sf_dir):
    """Serve BM25 top-k from the PERSISTED inverted index (built once
    per corpus by operators/text_index.py: term-bucket-partitioned
    postings + doc-length table + exact-integer stats sidecar) — the
    lexical axis joins the served-index family. The probe: query
    terms hash driver-side to their buckets (literal partition
    filters; the term equality pushes into the pruned scan), per-term
    df comes from the SAME pruned rows, corpus scalars ride as
    sidecar literals whose doubles equal the in-query aggregates
    exactly (integer totals), and the score is the shared
    bm25_weight_sql expression — so this entry shares
    text_search_bm25's oracle verbatim and returns identical rows.
    At 100 TB the probe reads |terms| buckets of tiny (doc, term, tf)
    rows; text_search_bm25's tokenize-everything pass is gone from
    the query path."""
    from lol_data_pipeline_spark.operators.text_index import (
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
    )

    path, meta = ensure_bm25_index(spark, sf_dir)
    return served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


def _sql_bm25_upsert() -> str:
    head = f"""alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_BMUP_SHIFT} AS doc_id, text FROM documents
      WHERE doc_id >= {_BMUP_LO} AND doc_id < {_BMUP_HI}
    ),
    """
    return _bm25_oracle(src="alldocs", head=head)


@query("bm25_index_upsert", sql=_sql_bm25_upsert())
def bm25_index_upsert_entry(spark, sf_dir):
    """Incremental LEXICAL-index maintenance, verified through the
    SERVE path: a document batch (cloned docs under shifted ids — the
    re-ingest shape) merges into the persisted postings (≤ NB term
    buckets rewrite; a replaced doc's stale postings are purged even
    from buckets the new text no longer touches) and doclens (≤ NB
    doc buckets), and the sidecar's exact integer totals update. The
    entry then SERVES the standing query from the maintained artifact
    — what is verified is that maintenance kept the index
    query-correct (df, N, avgdl all shifted by the batch), against an
    oracle that recomputes BM25 over corpus∪batch from scratch.
    Idempotent; own index copy (variant="upsert")."""
    from lol_data_pipeline_spark.operators.text_index import (
        bm25_index_upsert,
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
    )

    path, meta = ensure_bm25_index(spark, sf_dir, variant="upsert")
    docs = T(spark, sf_dir, "documents")
    batch = docs.filter(
        F.col("doc_id").between(_BMUP_LO, _BMUP_HI - 1)
    ).select((F.col("doc_id") + _BMUP_SHIFT).alias("doc_id"), "text")
    meta = bm25_index_upsert(spark, path, meta, batch)
    return served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


def _sql_bm25_delete() -> str:
    head = f"""survdocs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < {_BMDEL_LO} OR doc_id >= {_BMDEL_HI}
    ),
    """
    return _bm25_oracle(src="survdocs", head=head)


@query("bm25_index_delete", sql=_sql_bm25_delete())
def bm25_index_delete_entry(spark, sf_dir):
    """LEXICAL-index take-down, verified through the SERVE path: a
    doomed document range vanishes from postings (only the buckets
    actually holding its rows rewrite; emptied directories drop) and
    doclens, the sidecar totals shrink exactly, and the standing
    query served from the maintained artifact matches an oracle that
    recomputes BM25 over corpus∖doomed — deletions move every
    surviving score (df and N fall), so serving-after-delete is a
    sharp whole-index check, not a row-absence check. Idempotent; own
    index copy (variant="delete")."""
    from lol_data_pipeline_spark.operators.text_index import (
        bm25_index_delete,
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
    )

    path, meta = ensure_bm25_index(spark, sf_dir, variant="delete")
    docs = T(spark, sf_dir, "documents")
    doomed = docs.filter(
        F.col("doc_id").between(_BMDEL_LO, _BMDEL_HI - 1)
    ).select("doc_id")
    meta = bm25_index_delete(spark, path, meta, doomed)
    return served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


# ---------------------------------------------------------------------------
# Cross-axis retrieval fusion: the lexical and quantization artifacts
# composed in ONE entry. ann_hybrid_rerank (plans/curation.py) reranks
# a lexical pool in-query; this is the production two-tower shape —
# BOTH legs come from PERSISTED indexes (partition-pruned probes, no
# corpus scan on either side) and fuse union-style: a doc found by
# only one leg still scores from the legs that found it.
# ---------------------------------------------------------------------------

_RRF_Q = 100  # query vector: first id of the fair query set
_RRF_NL = 20  # lexical pool size (BM25-served top-NL)
_RRF_NV = 20  # vector pool size (IVFPQ-served top-NV)
_RRF_K = 10  # fused final top-k
_RRF_C = 60  # standard RRF constant


def _sql_rrf_fusion() -> str:
    """Vector leg re-derives the IVF+PQ serve chain for the single
    query (codebook train → probe → ADC rank → bounded rescore);
    lexical leg is the verbatim BM25 chain as a subquery; fusion is
    a FULL OUTER JOIN so one-leg docs keep their reciprocal-rank
    contribution (the other leg's term coalesces to 0)."""
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        SQL_COS,
        _sql_bm25,
        kmeans_ctes,
    )
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _NPROBE,
        _REFINE,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    dist = (
        "list_inner_product(e.x, e.x) - 2 * list_inner_product(e.x, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    lex = _sql_bm25(_BM25_TERMS, _RRF_NL, _BM25_K1, _BM25_B)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes()},
    qprobe AS (
      SELECT vec_id AS query_id, x AS qvec, cid AS pcell
      FROM (
        SELECT e.vec_id, e.x, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e CROSS JOIN {trained} c
        WHERE e.vec_id = {_RRF_Q}
      ) WHERE rn <= {_NPROBE}
    ),
    approx AS (
      SELECT q.query_id, cl.vec_id AS match_id, q.qvec,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_inner_product(q.qvec, h.xh) DESC, cl.vec_id
             ) AS arank
      FROM qprobe q
      JOIN {cells} cl ON cl.cluster = q.pcell AND cl.vec_id <> q.query_id
      JOIN xhat h ON h.match_id = cl.vec_id
    ),
    vtop AS (
      SELECT match_id AS doc_id, rank_vec FROM (
        SELECT a.match_id,
               CAST(row_number() OVER (
                 ORDER BY {SQL_COS.format(a='a.qvec', b='e2.embedding')} DESC,
                          a.match_id
               ) AS BIGINT) AS rank_vec
        FROM approx a JOIN embeddings e2 ON e2.vec_id = a.match_id
        WHERE a.arank <= {_REFINE * _RRF_NV}
      ) WHERE rank_vec <= {_RRF_NV}
    ),
    lexleg AS (SELECT doc_id, CAST(rank AS BIGINT) AS rank_lex FROM ({lex})),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.rank_lex, v.rank_vec,
             CAST(round(1000000 * (COALESCE(1.0 / ({_RRF_C} + l.rank_lex), 0.0)
                                   + COALESCE(1.0 / ({_RRF_C} + v.rank_vec), 0.0)))
                  AS BIGINT) AS rrf_e6
      FROM lexleg l FULL OUTER JOIN vtop v ON v.doc_id = l.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rrf_e6,
           CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT)
               AS final_rank
    FROM fused
    QUALIFY final_rank <= {_RRF_K}
    """
    )


@query("retrieval_rrf_served", sql=_sql_rrf_fusion())
def retrieval_rrf_served(spark, sf_dir):
    """Two-tower retrieval served ENTIRELY from persisted artifacts:
    the lexical leg probes the BM25 inverted index (query terms →
    literal bucket filters; operators/text_index.py) for its top-{nl},
    the vector leg probes the IVF+PQ index (probe → pruned code scan →
    bounded rescore; operators/vector_index.py) for the query
    embedding's top-{nv}, and Reciprocal Rank Fusion merges them
    union-style — a doc found by only one leg keeps that leg's
    1/(C+rank) contribution instead of vanishing (FULL OUTER join, the
    difference from ann_hybrid_rerank's rerank-a-lexical-pool shape).
    RRF fuses RANKS, so the fusion is exact integer-rational
    arithmetic at any corpus size. At 100 TB neither leg scans the
    corpus: the lexical probe reads |terms| postings buckets, the
    vector probe nprobe/C of the code partitions, and the fusion
    joins two ≤{nl}+{nv}-row broadcast sets."""
    from lol_data_pipeline_spark.operators.text_index import (
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.operators.vector_index import served_ivfpq_topk
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )
    from lol_data_pipeline_spark.plans.round9 import _NPROBE, _REFINE

    path, meta = ensure_bm25_index(spark, sf_dir)
    lex = served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_RRF_NL, k1=_BM25_K1, b=_BM25_B
    ).select("doc_id", F.col("rank").cast("long").alias("rank_lex"))
    q = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") == _RRF_Q)
    vec = served_ivfpq_topk(
        spark, sf_dir, q, k=_RRF_NV, refine=_REFINE, nprobe=_NPROBE
    ).select(
        F.col("match_id").alias("vdoc"),
        F.col("rank").cast("long").alias("rank_vec"),
    )
    fused = (
        lex.join(vec, lex.doc_id == vec.vdoc, "full_outer")
        .select(
            F.coalesce(lex.doc_id, F.col("vdoc")).alias("doc_id"),
            "rank_lex",
            "rank_vec",
        )
        .withColumn(
            "rrf_e6",
            F.expr(
                f"CAST(round(1000000 * (COALESCE(1.0 / ({_RRF_C} + rank_lex), 0.0)"
                f" + COALESCE(1.0 / ({_RRF_C} + rank_vec), 0.0))) AS BIGINT)"
            ),
        )
    )
    from lol_data_pipeline_spark.operators.relational import global_topk_ranked

    # no unpartitioned window: TakeOrderedAndProject + the bounded
    # k×k broadcast rank derivation (operators/relational.py)
    topk = global_topk_ranked(
        fused, [("rrf_e6", True), ("doc_id", False)], _RRF_K, rank_col="final_rank"
    )
    return topk.select(
        "doc_id",
        "rank_lex",
        "rank_vec",
        "rrf_e6",
        F.col("final_rank").cast("long").alias("final_rank"),
    ).orderBy("final_rank")


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (RM3-lite) over the SERVED lexical index:
# probe → feedback docs → expansion terms → expanded re-probe. The
# oracle cannot pivot tf columns for terms it does not know at SQL-
# generation time, so it scores RELATIONALLY — per-(doc, term-index)
# weights folded in index order (list_reduce over list(... ORDER BY i)
# reproduces the serve path's left-to-right "+"-chain exactly, so the
# doubles match bit-for-bit before the shared round(..., 6)).
# ---------------------------------------------------------------------------

_PRF_FB = 5  # feedback depth: top-FB docs of the original query
_PRF_E = 3  # expansion terms mined from the feedback docs


def _sql_bm25_prf() -> str:
    from lol_data_pipeline_spark.operators.search import bm25_weight_sql
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
        SQL_TOKS,
        _sql_bm25,
    )

    nt = len(_BM25_TERMS)
    phase1 = _sql_bm25(_BM25_TERMS, _PRF_FB, _BM25_K1, _BM25_B)
    orig_vals = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(_BM25_TERMS)
    )
    not_orig = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    # the shared per-term BM25 weight, rebased onto relational columns
    # (tf/df/dl/avgdl live in joined rows, not pivoted pseudo-columns).
    # avgdl is rewritten FIRST so the bare-"dl" rewrite cannot touch it.
    wt = (
        bm25_weight_sql(0, _BM25_K1, _BM25_B)
        .replace("avgdl", "__AVGDL__")
        .replace("tf0", "p.tf")
        .replace("df0", "d.df")
        .replace("dl", "pl.dl")
        .replace("n_docs", "s.n_docs")
        .replace("__AVGDL__", "s.avgdl")
    )
    return f"""
    WITH ptok AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    ppd AS (SELECT doc_id, len(t) AS dl FROM ptok),
    pposts AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM ptok)
      GROUP BY 1, 2
    ),
    pscal AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM ppd
    ),
    fb AS (SELECT doc_id FROM ({phase1})),
    exptok AS (
      SELECT p.term, CAST(sum(p.tf) AS BIGINT) AS cnt
      FROM pposts p JOIN fb USING (doc_id)
      WHERE p.term NOT IN ({not_orig})
      GROUP BY 1
    ),
    expsel AS (
      SELECT term, rnk FROM (
        SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
        FROM exptok
      ) WHERE rnk <= {_PRF_E}
    ),
    qterms AS (
      SELECT CAST(i AS INTEGER) AS i, term
      FROM (VALUES {orig_vals}) AS v(i, term)
      UNION ALL
      SELECT CAST({nt - 1} + rnk AS INTEGER) AS i, term FROM expsel
    ),
    pdfs AS (
      SELECT q.i, q.term, CAST(count(*) AS DOUBLE) AS df
      FROM qterms q JOIN pposts p ON p.term = q.term
      GROUP BY 1, 2
    ),
    pcand AS (
      SELECT DISTINCT p.doc_id
      FROM pposts p JOIN qterms q ON q.term = p.term
    ),
    pw AS (
      SELECT c.doc_id, q.i,
             CAST({wt} AS DOUBLE) AS wt,
             CASE WHEN p.tf > 0 THEN 1 ELSE 0 END AS hit
      FROM pcand c
      CROSS JOIN qterms q
      JOIN pdfs d ON d.i = q.i
      JOIN ppd pl ON pl.doc_id = c.doc_id
      CROSS JOIN pscal s
      LEFT JOIN pposts p ON p.doc_id = c.doc_id AND p.term = q.term
    ),
    pscored AS (
      SELECT doc_id,
             round(list_reduce(list(wt ORDER BY i), (a, b) -> a + b), 6)
                 AS score,
             CAST(sum(hit) AS BIGINT) AS n_terms_hit
      FROM pw GROUP BY doc_id
    )
    SELECT doc_id, score, n_terms_hit, rank FROM (
      SELECT doc_id, score, n_terms_hit,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                 AS rank
      FROM pscored
    ) WHERE rank <= {_BM25_K}
    """


@query("text_bm25_prf_served", sql=_sql_bm25_prf())
def text_bm25_prf_served(spark, sf_dir):
    """Query expansion by pseudo-relevance feedback (RM3-lite), both
    phases served from the persisted inverted index: (1) probe the
    original {nt}-term query for its top-{fb} feedback docs (bounded
    collect: {fb} ids); (2) mine the top-{e} expansion terms from JUST
    those docs — one pushed-filter scan of {fb} documents, tokenize,
    count, tie-broken (count DESC, term ASC); bounded collect: {e}
    terms; (3) re-probe the index with the expanded term list. The
    expansion terms become driver-side literals, so phase 3 is the
    SAME pivoted literal-term serve plan as every BM25 entry — probes
    read only the expanded query's postings buckets. At 100 TB the
    corpus is touched exactly once per phase-3 term bucket; feedback
    mining reads {fb} documents, never the corpus. The oracle re-
    derives feedback ranking, expansion selection, and the expanded
    scoring relationally, folding per-term weights in term-index
    order to reproduce the serve path's "+"-chain doubles exactly."""
    from lol_data_pipeline_spark.functions.text import tokens
    from lol_data_pipeline_spark.operators.text_index import (
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
    )

    path, meta = ensure_bm25_index(spark, sf_dir)
    fb = served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_PRF_FB, k1=_BM25_K1, b=_BM25_B
    )
    fb_ids = [int(r.doc_id) for r in fb.select("doc_id").collect()]
    docs = T(spark, sf_dir, "documents")
    exp_rows = (
        docs.filter(F.col("doc_id").isin(fb_ids))
        .select(F.explode(tokens("text")).alias("term"))
        .filter(~F.col("term").isin(list(_BM25_TERMS)))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(_PRF_E)
        .collect()
    )
    expanded = list(_BM25_TERMS) + [r.term for r in exp_rows]
    return served_bm25_topk(
        spark, path, meta, expanded, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


# ---------------------------------------------------------------------------
# Streaming maintenance of the LEXICAL index — parity with
# stream_ann_upsert_multibatch: document micro-batches write THROUGH a
# foreachBatch sink into the persisted postings/doclens/sidecar, and
# the standing query served from the maintained artifact must match an
# oracle recomputing BM25 over corpus∪batch (df, N and avgdl all move,
# so it is a whole-index check).
# ---------------------------------------------------------------------------

_SBUP_LO, _SBUP_HI = 30, 50
_SBUP_SHIFT = 120000


def _sql_stream_bm25_upsert() -> str:
    head = f"""alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SBUP_SHIFT} AS doc_id, text FROM documents
      WHERE doc_id >= {_SBUP_LO} AND doc_id < {_SBUP_HI}
    ),
    """
    return _bm25_oracle(src="alldocs", head=head)


@query("stream_bm25_upsert_multibatch", sql=_sql_stream_bm25_upsert())
def stream_bm25_upsert_multibatch(spark, sf_dir):
    """STREAMING lexical-index maintenance end-to-end: a document
    batch (cloned docs under shifted ids) arrives as a four-micro-
    batch ordered replay and each epoch WRITES THROUGH a foreachBatch
    sink into the persisted inverted index via bm25_index_upsert —
    per epoch, ≤ NB term-bucket partitions and ≤ NB doc-bucket
    partitions rewrite (dynamic partition overwrite) and the
    sidecar's exact integer totals advance. The sink re-reads the
    sidecar at each epoch, so a replayed epoch re-ingests its ids
    idempotently (stale postings purged before re-insert — identical
    disk content and identical totals; the exactly-once-by-
    idempotence discipline streaming/sinks.py documents). What is
    verified is the SERVE path over the post-stream artifact against
    an oracle recomputing BM25 over corpus∪batch from scratch. Own
    index copy (variant="streamup")."""
    import json as _json
    import os as _os

    from lol_data_pipeline_spark.operators.text_index import (
        bm25_index_upsert,
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_TERMS,
    )
    from lol_data_pipeline_spark.streaming.windows import replay_multibatch

    path, _meta = ensure_bm25_index(spark, sf_dir, variant="streamup")
    docs = T(spark, sf_dir, "documents")
    batch = docs.filter(
        F.col("doc_id").between(_SBUP_LO, _SBUP_HI - 1)
    ).select((F.col("doc_id") + _SBUP_SHIFT).alias("doc_id"), "text")
    parts = [batch.filter(F.col("doc_id") % 4 == i) for i in range(4)]

    def sink(df, _epoch_id):
        # current sidecar, not the closure's snapshot — each epoch's
        # exact totals build on the previous epoch's writes
        with open(_os.path.join(path, "_text_meta.json")) as f:
            m = _json.load(f)
        bm25_index_upsert(spark, path, m, df)

    replay_multibatch(
        spark,
        parts,
        lambda stream: stream,
        mode="append",
        key=f"bm25_upsert:{sf_dir}",
        foreach_batch=sink,
    )
    with open(_os.path.join(path, "_text_meta.json")) as f:
        meta = _json.load(f)
    return served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


# ---------------------------------------------------------------------------
# Lexical index observability — monitoring off the ARTIFACT (postings
# + doclens + sidecar), completing stats parity across all three
# served families (ann_index_stats, graph_index_stats, this). The
# sidecar totals ride along as literals so a sidecar-vs-disk drift
# (a maintenance bug) fails the oracle comparison.
# ---------------------------------------------------------------------------


def _sql_bm25_stats() -> str:
    from lol_data_pipeline_spark.plans.extensions import SQL_TOKS

    return f"""
    WITH ptok AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    ppd AS (SELECT doc_id, len(t) AS dl FROM ptok),
    pposts AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM ptok)
      GROUP BY 1, 2
    ),
    pdfs AS (SELECT term, count(*) AS df FROM pposts GROUP BY 1),
    pdb AS (SELECT doc_id % 16 AS db, count(*) AS c FROM ppd GROUP BY 1)
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM ppd) AS n_docs,
      (SELECT CAST(sum(dl) AS BIGINT) FROM ppd) AS total_tokens,
      (SELECT CAST(count(*) AS BIGINT) FROM ppd) AS meta_n_docs,
      (SELECT CAST(sum(dl) AS BIGINT) FROM ppd) AS meta_total_tokens,
      (SELECT CAST(count(*) AS BIGINT) FROM pposts) AS n_postings,
      (SELECT CAST(count(*) AS BIGINT) FROM pdfs) AS n_terms,
      (SELECT CAST(max(df) AS BIGINT) FROM pdfs) AS max_df,
      (SELECT CAST(count(*) AS BIGINT) FROM pdb) AS db_buckets,
      (SELECT CAST(max(c) AS BIGINT) FROM pdb) AS db_max_docs,
      (SELECT CAST(min(c) AS BIGINT) FROM pdb) AS db_min_docs
    """


@query("bm25_index_stats", sql=_sql_bm25_stats())
def bm25_index_stats(spark, sf_dir):
    """Lexical-index OBSERVABILITY: one row of artifact-level health
    metrics computed from the persisted postings/doclens tables plus
    the sidecar's totals as literals — so the oracle comparison
    cross-checks sidecar vs disk (a maintenance bug that drifts the
    exact integer totals fails here, not in production probes).
    n_postings is the corpus's (doc, term) surface, max_df its most
    common term's reach (the skew that makes a postings bucket hot),
    db_max/min_docs the doc-bucket balance that bounds maintenance
    rewrite cost. All aggregates run over the index's own partition
    layout — the source corpus is never read."""
    from lol_data_pipeline_spark.operators.text_index import (
        ensure_bm25_index,
        read_doclens,
        read_postings,
    )

    path, meta = ensure_bm25_index(spark, sf_dir)
    post = read_postings(spark, path)
    lens = read_doclens(spark, path)
    lstats = lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    pstats = post.agg(
        F.count("*").cast("long").alias("n_postings"),
        F.countDistinct("term").cast("long").alias("n_terms"),
    )
    dfmax = (
        post.groupBy("term")
        .agg(F.count("*").alias("df"))
        .agg(F.max("df").cast("long").alias("max_df"))
    )
    dbstats = (
        lens.groupBy("db")
        .agg(F.count("*").alias("c"))
        .agg(
            F.count("*").cast("long").alias("db_buckets"),
            F.max("c").cast("long").alias("db_max_docs"),
            F.min("c").cast("long").alias("db_min_docs"),
        )
    )
    return (
        lstats.crossJoin(F.broadcast(pstats))
        .crossJoin(F.broadcast(dfmax))
        .crossJoin(F.broadcast(dbstats))
        .select(
            "n_docs",
            "total_tokens",
            F.lit(int(meta["n_docs"])).cast("long").alias("meta_n_docs"),
            F.lit(int(meta["total_tokens"]))
            .cast("long")
            .alias("meta_total_tokens"),
            "n_postings",
            "n_terms",
            "max_df",
            "db_buckets",
            "db_max_docs",
            "db_min_docs",
        )
    )


# ---------------------------------------------------------------------------
# The DEDUP axis joins the served-index family: a materialized
# MinHash-LSH bucket table (operators/minhash_index.py) probed by
# incoming batches and maintained band-locally. dedup_incremental_
# minhash (the recompute twin, kept as the comparison) signs BOTH
# sides per run; these entries sign only the batch.
# ---------------------------------------------------------------------------

_MH_K, _MH_BANDS, _MH_N = 16, 8, 3
_MH_TAU = 0.8
_MH_IDX_WHERE = "doc_id % 5 <> 0"  # the standing 80% index corpus
_MHUP_LO, _MHUP_HI = 200, 220
_MHUP_SHIFT = 140000
_MHDEL_LO, _MHDEL_HI = 5, 30


def _sql_minhash_probe(
    head: str = "", src: str = "documents",
    new_cond: str = "a.doc_id % 5 = 0",
    idx_cond: str = "b.doc_id % 5 <> 0",
) -> str:
    """The exact asymmetric all-pairs Jaccard oracle of
    dedup_incremental_minhash, parameterized over the corpus CTE and
    the two side predicates so the maintenance entries can point the
    identical scoring chain at corpus∪batch / corpus∖doomed. LSH
    recall at s≥0.8 with k=16/8 bands is ≥0.9997 and every candidate
    is exact-verified, so LSH output and exact output coincide (the
    dedup_minhash_lsh recall argument, fixture-tested)."""
    from lol_data_pipeline_spark.plans.extensions import SQL_TOKS, _sql_shingles

    toks = SQL_TOKS.replace("text", "d.text") if False else SQL_TOKS
    return f"""
    WITH {head}tok AS (SELECT doc_id, {toks} AS t FROM {src}),
    sh AS (SELECT doc_id, unnest(list_distinct({_sql_shingles(_MH_N)})) AS s FROM tok),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS id_new, b.doc_id AS id_index, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND ({new_cond}) AND ({idx_cond})
      GROUP BY 1, 2
    )
    SELECT CAST(id_new AS BIGINT) AS id_new, CAST(id_index AS BIGINT) AS id_index,
           CAST(floor((c * 1.0 / (sa.n + sb.n - c)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_new
    JOIN sizes sb ON sb.doc_id = id_index
    WHERE CAST(floor((c * 1.0 / (sa.n + sb.n - c)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) >= {_MH_TAU}
    """


@query("dedup_minhash_served", sql=_sql_minhash_probe())
def dedup_minhash_served(spark, sf_dir):
    """Probe the daily batch (doc_id % 5 = 0) against the PERSISTED
    MinHash-LSH index of the standing corpus (the other 80%) — the
    served twin of dedup_incremental_minhash, which signs both sides
    per run. Here the index side's (band, bkey) bucket rows are AT
    REST (band-partitioned, bkey-sorted — operators/minhash_index.py)
    and the probe shingles/signs ONLY the batch; exact-Jaccard verify
    recomputes index-side shingles for CANDIDATE ids only via a
    pushed id join against the source corpus. At 100 TB the daily
    cost is batch-sized signing + a bucket equi-join + candidate-
    bounded verification — the standing corpus is never re-tokenized.
    Shares the recompute twin's oracle shape (exact asymmetric
    all-pairs ≥ τ)."""
    from lol_data_pipeline_spark.operators.minhash_index import (
        ensure_minhash_index,
        served_minhash_probe,
    )

    path, meta = ensure_minhash_index(
        spark, sf_dir, variant="probe",
        k=_MH_K, bands=_MH_BANDS, n=_MH_N, index_where=_MH_IDX_WHERE,
    )
    docs = T(spark, sf_dir, "documents")
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    return served_minhash_probe(
        spark, path, meta, batch, verify_docs=docs, threshold=_MH_TAU
    )


def _sql_mh_upsert() -> str:
    head = f"""alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_MHUP_SHIFT} AS doc_id, text FROM documents
      WHERE doc_id >= {_MHUP_LO} AND doc_id < {_MHUP_HI}
    ),
    """
    return _sql_minhash_probe(
        head=head, src="alldocs",
        new_cond=f"a.doc_id % 5 = 0 AND a.doc_id < {_MHUP_SHIFT}",
        idx_cond=f"b.doc_id % 5 <> 0 OR b.doc_id >= {_MHUP_SHIFT}",
    )


@query("minhash_index_upsert", sql=_sql_mh_upsert())
def minhash_index_upsert_entry(spark, sf_dir):
    """Incremental DEDUP-index maintenance, verified through the
    PROBE path: a document batch (cloned docs under shifted ids — the
    re-ingest shape) merges into the persisted bucket table (each doc
    lands one row in every band; the rewrite touches the CONSTANT
    ``bands`` partitions regardless of batch or corpus size) and the
    standing batch probe re-runs against the maintained artifact.
    Sharp by construction: the clones of batch-side ids (200/205/...)
    enter the index with IDENTICAL text, so the probe MUST find their
    jaccard-1.0 pairs — missed maintenance loses rows, stale rows
    duplicate them. Oracle recomputes the asymmetric exact pairs over
    corpus∪batch. Idempotent; own index copy (variant="upsert")."""
    from lol_data_pipeline_spark.operators.minhash_index import (
        ensure_minhash_index,
        minhash_index_upsert,
        served_minhash_probe,
    )

    path, meta = ensure_minhash_index(
        spark, sf_dir, variant="upsert",
        k=_MH_K, bands=_MH_BANDS, n=_MH_N, index_where=_MH_IDX_WHERE,
    )
    docs = T(spark, sf_dir, "documents")
    batch = docs.filter(
        F.col("doc_id").between(_MHUP_LO, _MHUP_HI - 1)
    ).select((F.col("doc_id") + _MHUP_SHIFT).alias("doc_id"), "text")
    meta = minhash_index_upsert(spark, path, meta, batch)
    probe = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    verify = docs.select("doc_id", "text").unionByName(batch)
    return served_minhash_probe(
        spark, path, meta, probe, verify_docs=verify, threshold=_MH_TAU
    )


def _sql_mh_delete() -> str:
    return _sql_minhash_probe(
        idx_cond=(
            f"b.doc_id % 5 <> 0 AND NOT (b.doc_id >= {_MHDEL_LO} "
            f"AND b.doc_id < {_MHDEL_HI})"
        ),
    )


@query("minhash_index_delete", sql=_sql_mh_delete())
def minhash_index_delete_entry(spark, sf_dir):
    """DEDUP-index take-down, verified through the PROBE path: a
    doomed id range vanishes from every band partition, and the
    standing batch probe against the maintained artifact must lose
    exactly the doomed side's pairs (the range is chosen so real
    pairs disappear at both test scales — a row-absence check with
    teeth). Oracle recomputes the asymmetric exact pairs over
    corpus∖doomed. Idempotent; own index copy (variant="delete")."""
    from lol_data_pipeline_spark.operators.minhash_index import (
        ensure_minhash_index,
        minhash_index_delete,
        served_minhash_probe,
    )

    path, meta = ensure_minhash_index(
        spark, sf_dir, variant="delete",
        k=_MH_K, bands=_MH_BANDS, n=_MH_N, index_where=_MH_IDX_WHERE,
    )
    docs = T(spark, sf_dir, "documents")
    doomed = docs.filter(
        F.col("doc_id").between(_MHDEL_LO, _MHDEL_HI - 1)
    ).select("doc_id")
    meta = minhash_index_delete(spark, path, meta, doomed)
    probe = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    return served_minhash_probe(
        spark, path, meta, probe, verify_docs=docs, threshold=_MH_TAU
    )


def _sql_mh_stats() -> str:
    from lol_data_pipeline_spark.operators.minhash_index import minhash_sql_ctes

    return (
        "WITH "
        + minhash_sql_ctes(_MH_K, _MH_BANDS, _MH_N)
        + """,
    per AS (SELECT band, bkey, count(*) AS cbk FROM mhbuckets GROUP BY 1, 2)
    SELECT CAST(band AS INTEGER) AS band,
           CAST(sum(cbk) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(cbk) AS BIGINT) AS max_bucket
    FROM per GROUP BY 1 ORDER BY band
    """
    )


@query("minhash_index_stats", sql=_sql_mh_stats())
def minhash_index_stats(spark, sf_dir):
    """DEDUP-index OBSERVABILITY: per-band bucket-occupancy stats off
    the artifact's own layout (n_rows = docs indexed per band,
    n_buckets = distinct bkeys, max_bucket = the hottest bucket — the
    probe-join skew monitor: a mega-bucket is a boilerplate-text
    cluster whose self-join fans out quadratically, exactly what
    ngram_jaccard's shingle-DF cap guards; this row says WHEN to
    care). One aggregate over the bucket table reading 2 small
    columns + the partition column; the source corpus is never read.
    The oracle re-derives signatures with the SAME affine constants
    as literals — a full cross-engine replication of the MinHash
    construction, not just a count check (full-corpus index,
    variant='stats')."""
    from lol_data_pipeline_spark.operators.minhash_index import (
        ensure_minhash_index,
        read_minhash_buckets,
    )

    path, _meta = ensure_minhash_index(
        spark, sf_dir, variant="stats",
        k=_MH_K, bands=_MH_BANDS, n=_MH_N, index_where="",
    )
    per = (
        read_minhash_buckets(spark, path)
        .groupBy(F.col("band").cast("int").alias("band"), "bkey")
        .agg(F.count("*").alias("cbk"))
    )
    return (
        per.groupBy("band")
        .agg(
            F.sum("cbk").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_buckets"),
            F.max("cbk").cast("long").alias("max_bucket"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Spectral front-end ANN: the top-r deflated directions emb_power_topr
# discovers become a candidate-generation projection — scan r doubles
# per vector instead of dim, rescore the bounded survivors exactly.
# ---------------------------------------------------------------------------

_PCA_REFINE = 8


def _pca_head() -> str:
    """The deflated-power-chain + subspace-ranking CTE text shared by
    the pca top-k oracle and the pca recall oracle (so the candidate
    derivation cannot drift between them)."""
    from lol_data_pipeline_spark.plans.round10 import _PI_ROUNDS

    R = _PI_ROUNDS
    fair = (
        f"(vec_id >= {_KMQ_LO} AND vec_id < {_KMQ_HI})"
        f" OR (vec_id >= {_KMQ_TAIL_LO} AND vec_id < {_KMQ_TAIL_HI})"
    )
    zq = ",\n             ".join(
        f"list_inner_product(x, (SELECT v FROM d{d}v{R})) AS qz{d}"
        for d in range(_PR_DIRS)
    )
    zc = ",\n             ".join(
        f"list_inner_product(x, (SELECT v FROM d{d}v{R})) AS cz{d}"
        for d in range(_PR_DIRS)
    )
    score = " + ".join(f"q.qz{d} * c.cz{d}" for d in range(_PR_DIRS))
    return (
        "WITH "
        + ",\n    ".join(_power_cte_list())
        + f""",
    qz AS (
      SELECT vec_id AS query_id, x AS qvec,
             {zq}
      FROM e WHERE {fair}
    ),
    cz AS (
      SELECT vec_id AS match_id,
             {zc}
      FROM e
    ),
    approx AS (
      SELECT q.query_id, c.match_id, q.qvec,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {score} DESC, c.match_id
             ) AS arank
      FROM qz q JOIN cz c ON c.match_id <> q.query_id
    )"""
    )


def _sql_pca_topk() -> str:
    from lol_data_pipeline_spark.plans.extensions import SQL_COS

    return (
        _pca_head()
        + f"""
    SELECT query_id, match_id, sim, rank FROM (
      SELECT a.query_id, a.match_id,
             {SQL_COS.format(a='a.qvec', b='e2.embedding')} AS sim,
             CAST(row_number() OVER (
               PARTITION BY a.query_id
               ORDER BY {SQL_COS.format(a='a.qvec', b='e2.embedding')} DESC,
                        a.match_id
             ) AS BIGINT) AS rank
      FROM approx a JOIN embeddings e2 ON e2.vec_id = a.match_id
      WHERE a.arank <= {_PCA_REFINE * _K}
    ) WHERE rank <= {_K}
    """
    )


@query("ann_pca_topk", sql=_sql_pca_topk())
def ann_pca_topk(spark, sf_dir):
    """Spectral-front-end ANN: candidates are ranked in the top-{r}
    PCA subspace (the deflated power-iteration directions of
    emb_power_topr, computed with the same fixed-point recipe so both
    engines hold bit-equal directions), then the refine·k survivors
    are rescored with exact full-dimension cosine. The approximate
    scan reads {r} doubles per corpus vector instead of dim — the
    same bytes-per-vector lever as SQ/PQ, bought with spectral
    structure instead of quantization (at rest the z-projection is a
    2-column table; here it is a pure projection against literal
    directions). Queries broadcast (bounded fair set), candidates
    bounded at refine·k per query, rescore joins the full-precision
    source only for survivors — the ann_sq_topk geometry with a
    trained transform. The oracle unrolls the full deflated power
    chain, projects both sides with the same fold arithmetic, and
    replays approx-rank + rescore."""
    from lol_data_pipeline_spark.operators import similarity as sim
    from lol_data_pipeline_spark.operators.clustering import ensure_power_dirs
    from lol_data_pipeline_spark.plans.round10 import _PI_ROUNDS

    emb = T(spark, sf_dir, "embeddings")
    # directions come from the fingerprinted sidecar (build-if-stale)
    # — the r·rounds training aggregates amortize across runs; JSON
    # round-trips the doubles exactly, and emb_power_topr's oracle
    # parity is the standing proof the stored directions equal a
    # fresh training run
    dirs = ensure_power_dirs(spark, sf_dir, r=_PR_DIRS, rounds=_PI_ROUNDS, dim=64)
    x = F.col("embedding")
    q = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        *[
            sim.dot(x, F.array(*[F.lit(float(v)) for v in d])).alias(f"qz{j}")
            for j, d in enumerate(dirs)
        ],
    )
    c = emb.select(
        F.col("vec_id").alias("match_id"),
        *[
            sim.dot(x, F.array(*[F.lit(float(v)) for v in d])).alias(f"cz{j}")
            for j, d in enumerate(dirs)
        ],
    )
    score = F.expr(" + ".join(f"qz{j} * cz{j}" for j in range(_PR_DIRS)))
    w_a = Window.partitionBy("query_id").orderBy(
        score.desc(), F.col("match_id").asc()
    )
    cand = (
        c.join(F.broadcast(q), F.col("match_id") != F.col("query_id"))
        .withColumn("arank", F.row_number().over(w_a))
        .filter(F.col("arank") <= _PCA_REFINE * _K)
        .select("query_id", "match_id", "qvec")
    )
    rescored = cand.join(
        emb.select(
            F.col("vec_id").alias("match_id"), F.col("embedding").alias("mvec")
        ),
        "match_id",
    ).select(
        "query_id",
        "match_id",
        F.round(sim.cosine(F.col("qvec"), F.col("mvec")), 6).alias("sim"),
    )
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_r).cast("long"))
        .filter(F.col("rank") <= _K)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Streaming probe of the DEDUP index — the real-time ingest gate: each
# arriving micro-batch is checked against the persisted corpus index
# and its near-dup pairs are emitted through an idempotent epoch-
# partitioned sink. Stateless per batch (a doc's pairs depend only on
# the doc and the frozen index), so the four-epoch union must equal
# the one-shot probe row-for-row.
# ---------------------------------------------------------------------------


@query("stream_minhash_probe_multibatch", sql=_sql_minhash_probe())
def stream_minhash_probe_multibatch(spark, sf_dir):
    """STREAMING near-dup gating: the daily batch (doc_id % 5 = 0)
    arrives as a four-micro-batch ordered replay; each epoch signs
    ONLY its documents, probes the PERSISTED MinHash index
    (operators/minhash_index.py), and writes its verified pairs to an
    epoch-partitioned parquet sink (mode=overwrite per epoch — a
    replayed epoch rewrites identical content, the exactly-once-by-
    idempotence discipline). The probe is stateless per batch, so the
    union of all epochs' outputs equals the one-shot
    dedup_minhash_served probe row-for-row — which is why this entry
    shares its oracle (the exact asymmetric all-pairs answer). At
    100 TB this is the ingest-time dedup gate: per trigger, batch-
    sized signing + a bucket equi-join + candidate-bounded verify;
    the standing corpus is never re-tokenized and no streaming state
    accumulates."""
    import os
    import shutil as _sh

    from lol_data_pipeline_spark.operators.minhash_index import (
        ensure_minhash_index,
        served_minhash_probe,
    )
    from lol_data_pipeline_spark.streaming.windows import replay_multibatch

    path, meta = ensure_minhash_index(
        spark, sf_dir, variant="probe",
        k=_MH_K, bands=_MH_BANDS, n=_MH_N, index_where=_MH_IDX_WHERE,
    )
    docs = T(spark, sf_dir, "documents")
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0).select(
        "doc_id", "text"
    )
    parts = [
        batch.filter(F.pmod(F.col("doc_id"), F.lit(20)) == i * 5)
        for i in range(4)
    ]
    out = os.path.join(
        os.path.dirname(path), f"stream_probe_{os.path.basename(path)}"
    )
    _sh.rmtree(out, ignore_errors=True)

    def sink(df, epoch_id):
        pairs = served_minhash_probe(
            spark, path, meta, df, verify_docs=docs, threshold=_MH_TAU
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(out, f"epoch={int(epoch_id)}")
        )

    replay_multibatch(
        spark,
        parts,
        lambda stream: stream,
        mode="append",
        key=f"minhash_probe:{sf_dir}",
        foreach_batch=sink,
    )
    return (
        spark.read.parquet(out)
        .select("id_new", "id_index", "jaccard")
        .orderBy("id_new", "id_index")
    )


# ---------------------------------------------------------------------------
# The tokenizer becomes an at-rest artifact: text_bpe_encode retrains
# its merge table on every run (the one remaining per-query retraining
# in the registry); these entries serve train and encode from a
# persisted, fingerprinted vocabulary instead.
# ---------------------------------------------------------------------------


def _bpe_train_oracle() -> str:
    from lol_data_pipeline_spark.plans.round9 import _sql_bpe_train

    return _sql_bpe_train()


def _bpe_encode_oracle() -> str:
    from lol_data_pipeline_spark.plans.round10 import _sql_bpe_encode

    return _sql_bpe_encode()


@query("bpe_vocab_served", sql=_bpe_train_oracle())
def bpe_vocab_served(spark, sf_dir):
    """Serve the LEARNED merge table from the persisted tokenizer
    artifact (operators/bpe.py ensure_bpe_vocab: ordered merges +
    params + source fingerprint in one JSON sidecar — the artifact is
    driver-literal-sized, so the 'index' is a sidecar alone). Shares
    text_bpe_train's oracle verbatim: the served rows must equal a
    from-scratch training run, which is exactly the staleness
    contract (fingerprint match => the stored merges ARE what
    training would produce; corpus change => rebuild). Maintenance is
    re-training by design — BPE merges have no sound incremental
    update, an early merge decision can flip under new data."""
    from lol_data_pipeline_spark.operators.bpe import (
        ensure_bpe_vocab,
        vocab_merges,
    )
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    _path, meta = ensure_bpe_vocab(spark, sf_dir, rounds=_BPE_ROUNDS)
    return spark.createDataFrame(
        vocab_merges(meta),
        "round bigint, left_sym string, right_sym string, merged string, cnt bigint",
    )


@query("text_bpe_encode_served", sql=_bpe_encode_oracle())
def text_bpe_encode_served(spark, sf_dir):
    """ENCODE the corpus with the PERSISTED tokenizer: the merge
    table loads from the artifact sidecar (no training scans — the
    vocabulary-sized pair counts and per-round argmax collects of
    text_bpe_encode are gone from the query path) and the encode is
    ONE corpus scan of pure projections with the merges as
    driver-side literals. Shares text_bpe_encode's oracle verbatim —
    served counts must equal the retraining entry's row-for-row. At
    100 TB this is the tokenizer deployment shape: train once per
    corpus snapshot, encode every shard from the frozen artifact."""
    from lol_data_pipeline_spark.operators.bpe import (
        bpe_encode_docs,
        ensure_bpe_vocab,
        vocab_merges,
    )
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    _path, meta = ensure_bpe_vocab(spark, sf_dir, rounds=_BPE_ROUNDS)
    docs = T(spark, sf_dir, "documents")
    return bpe_encode_docs(docs, vocab_merges(meta)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus-wide pair mining entirely OFF the artifact: the in-query
# dedup_minhash_lsh signs the whole corpus every run; with the bucket
# table at rest, candidate generation is a self-join of 3 small
# columns and only candidates ever touch document text again.
# ---------------------------------------------------------------------------


def _sql_pairs_served() -> str:
    from lol_data_pipeline_spark.plans.extensions import _sql_jaccard_pairs

    return _sql_jaccard_pairs(_MH_TAU)


@query("dedup_minhash_pairs_served", sql=_sql_pairs_served())
def dedup_minhash_pairs_served(spark, sf_dir):
    """Corpus-wide near-dup PAIRS served from the persisted MinHash
    index: candidate generation is a (band, bkey) SELF-JOIN of the
    bucket table — 3 small columns, Σ bucket², zero tokenization —
    and exact-Jaccard verification re-shingles CANDIDATE ids only via
    a pushed id join on the source corpus. The in-query twin
    (dedup_minhash_lsh, kept benched as the comparison) shingles and
    signs the ENTIRE corpus on every run; at 100 TB that is the
    difference between scanning the text corpus and scanning an
    index of (doc, band, key) rows. Shares the twin's oracle verbatim
    (the exact all-pairs answer — LSH recall ≥0.9997 at these params
    and every candidate is verified). Reuses the full-corpus index
    the stats entry maintains (variant='stats')."""
    from lol_data_pipeline_spark.caching import tracked_persist
    from lol_data_pipeline_spark.operators.dedup import (
        _doc_shingle_arrays,
        _jaccard_verify,
    )
    from lol_data_pipeline_spark.operators.minhash_index import (
        ensure_minhash_index,
        read_minhash_buckets,
    )

    path, _meta = ensure_minhash_index(
        spark, sf_dir, variant="stats",
        k=_MH_K, bands=_MH_BANDS, n=_MH_N, index_where="",
    )
    # persist the bucket scan: the self-join otherwise reads the
    # parquet once per side
    idx = tracked_persist(read_minhash_buckets(spark, path))
    a, b = idx.alias("a"), idx.alias("b")
    # persist the candidate set: it feeds BOTH verify-join sides plus
    # the id projection below — unpersisted, the bucket self-join
    # would re-run three times (measured 4.2 s -> see PERF_NOTES)
    cand = tracked_persist(
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    docs = T(spark, sf_dir, "documents")
    # persist the candidate shingles too: _jaccard_verify joins base
    # once per pair side, and the O(words²) shingle transform must
    # run once per candidate doc, not twice
    base = tracked_persist(
        _doc_shingle_arrays(
            docs.join(F.broadcast(ids), "doc_id"), _MH_N, "text", "doc_id"
        )
    )
    return _jaccard_verify(cand, base, "id_a", "id_b", _MH_TAU).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# Filtered search on the SERVED index: the metadata predicate prunes
# candidate lists BEFORE ADC ranking (pre-filter semantics —
# ann_filtered_topk pins why post-filtering is wrong), composed with
# the persisted IVF+PQ artifact instead of the in-query index the
# round-8 filtered family probes.
# ---------------------------------------------------------------------------


def _sql_filtered_served() -> str:
    from lol_data_pipeline_spark.plans.curation import _FILT_K, _FILT_LABEL, _FILT_NQ
    from lol_data_pipeline_spark.plans.extensions import SQL_COS, kmeans_ctes
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _NPROBE,
        _REFINE,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    ctes = kmeans_ctes(
        _IVF_CELLS, assigns=_KM_ROUNDS + 1, updates=_KM_ROUNDS, dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    dist = (
        "list_inner_product(e.x, e.x) - 2 * list_inner_product(e.x, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    qprobe AS (
      SELECT vec_id AS query_id, x AS qvec, cid AS pcell, rn AS probe_rank
      FROM (
        SELECT e.vec_id, e.x, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e CROSS JOIN {trained} c
        WHERE e.vec_id < {_FILT_NQ}
      ) WHERE rn <= {_NPROBE}
    ),
    {_pq_xhat_ctes()},
    approx AS (
      SELECT q.query_id, cl.vec_id AS match_id, lf.label, q.qvec,
             CAST(q.probe_rank AS BIGINT) AS probe_rank,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_inner_product(q.qvec, h.xh) DESC,
                        cl.vec_id
             ) AS arank
      FROM qprobe q
      JOIN {cells} cl ON cl.cluster = q.pcell AND cl.vec_id <> q.query_id
      JOIN embeddings lf ON lf.vec_id = cl.vec_id AND lf.label = {_FILT_LABEL}
      JOIN xhat h ON h.match_id = cl.vec_id
    ),
    rcand AS (
      SELECT a.query_id, a.match_id, a.label, a.probe_rank,
             {SQL_COS.format(a='a.qvec', b='e2.embedding')} AS sim
      FROM approx a JOIN embeddings e2 ON e2.vec_id = a.match_id
      WHERE a.arank <= {_REFINE * _FILT_K}
    )
    SELECT query_id, match_id, label, probe_rank, sim, rank FROM (
      SELECT query_id, match_id, label, probe_rank, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, match_id
             ) AS BIGINT) AS rank
      FROM rcand
    ) WHERE rank <= {_FILT_K}
    """
    )


@query("ann_filtered_served_topk", sql=_sql_filtered_served())
def ann_filtered_served_topk(spark, sf_dir):
    """Filtered vector search on the PERSISTED IVF+PQ index: the
    metadata predicate (label = 3, ~10% selectivity) semi-joins the
    decoded candidate lists BEFORE ADC ranking — pre-filter
    semantics, so the refine·k budget is spent entirely on vectors
    that satisfy the predicate (post-filtering an unfiltered top-k
    starves the result at low selectivity; ann_filtered_topk pins the
    ground truth). Everything else is the served shape: literal
    partition pruning to the probed cells, codes-only scan, bounded
    exact rescore. At 100 TB the predicate id-set is a bitmap/bloom
    pushed into the candidate join; the index itself is untouched —
    one artifact serves every predicate, which is the point of
    pre-filtering over per-predicate index builds. Oracle re-derives
    the full serve chain with the filter applied at the same stage."""
    from lol_data_pipeline_spark.operators.vector_index import served_ivfpq_topk
    from lol_data_pipeline_spark.plans.curation import _FILT_K, _FILT_LABEL, _FILT_NQ
    from lol_data_pipeline_spark.plans.round9 import _NPROBE, _REFINE

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _FILT_NQ)
    fids = emb.filter(F.col("label") == _FILT_LABEL).select("vec_id", "label")
    served = served_ivfpq_topk(
        spark,
        sf_dir,
        queries,
        k=_FILT_K,
        refine=_REFINE,
        nprobe=_NPROBE,
        filter_ids=fids.select("vec_id"),
    )
    return served.join(
        F.broadcast(fids.withColumnRenamed("vec_id", "match_id")), "match_id"
    ).select("query_id", "match_id", "label", "probe_rank", "sim", "rank").orderBy(
        "query_id", "rank"
    )


def _sql_pca_recall() -> str:
    from lol_data_pipeline_spark.plans.extensions import SQL_COS

    return (
        _pca_head()
        + f""",
    pca AS (
      SELECT query_id, match_id FROM (
        SELECT a.query_id, a.match_id,
               row_number() OVER (
                 PARTITION BY a.query_id
                 ORDER BY {SQL_COS.format(a='a.qvec', b='e2.embedding')} DESC,
                          a.match_id
               ) AS rank
        FROM approx a JOIN embeddings e2 ON e2.vec_id = a.match_id
        WHERE a.arank <= {_PCA_REFINE * _K}
      ) WHERE rank <= {_K}
    ),
    ex AS (
      SELECT query_id, match_id FROM (
        SELECT q.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {SQL_COS.format(a='q.qvec', b='c.embedding')} DESC,
                          c.vec_id
               ) AS rank
        FROM qz q JOIN embeddings c ON c.vec_id <> q.query_id
      ) WHERE rank <= {_K}
    )
    SELECT x.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN p.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(CAST(sum(CASE WHEN p.match_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS recall_at_5
    FROM ex x LEFT JOIN pca p
      ON p.query_id = x.query_id AND p.match_id = x.match_id
    GROUP BY x.query_id
    ORDER BY x.query_id
    """
    )


@query("ann_pca_recall_eval", sql=_sql_pca_recall())
def ann_pca_recall_eval(spark, sf_dir):
    """Recall@{k} of the SPECTRAL front-end against brute-force
    ground truth, per query — the quality harness for the new
    candidate-generation axis, mirroring ann_served_recall_eval (IVF)
    and ann_graph_recall_eval (graph): every deployed
    candidate-generation strategy gets its recall measured, not
    inherited, and r (subspace width) / refine are this axis's levers
    the way nprobe is IVF's. Both sides reuse production operators
    verbatim: the registered ann_pca_topk plan for the approximate
    side (served directions from the sidecar), similarity.cosine_topk
    for the exact side, a (queries×k)-row left join for the
    comparison. The oracle re-derives the deflated power chain, the
    subspace ranking + rescore, and the hit join in one CTE chain
    (the head is shared verbatim with ann_pca_topk's oracle)."""
    from lol_data_pipeline_spark.operators import similarity as sim
    from lol_data_pipeline_spark.plans import REGISTRY

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    exact = sim.cosine_topk(emb, queries, k=_K).select("query_id", "match_id")
    pca = (
        REGISTRY["ann_pca_topk"]
        .fn(spark, sf_dir)
        .select(
            F.col("query_id").alias("pq"),
            F.col("match_id").alias("pm"),
            F.lit(1).alias("hit"),
        )
    )
    return (
        exact.join(
            pca,
            (F.col("query_id") == F.col("pq"))
            & (F.col("match_id") == F.col("pm")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
            F.expr(
                "round(CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)"
                " / count(*), 6)"
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# The capstone composition: ALL THREE retrieval axes served from
# their persisted artifacts — BM25 postings (lexical), IVF+PQ codes
# (vector), kNN-graph edges (graph) — fused by Reciprocal Rank Fusion
# in one query. The full production retrieval stack, off artifacts.
# ---------------------------------------------------------------------------

_RRF_NG = 10  # graph pool size (bounded by the beam's scored set)


def _sql_rrf3_fusion() -> str:
    """Three legs re-derived end-to-end: the IVF serve chain and the
    lexical chain exactly as _sql_rrf_fusion builds them, plus the
    beam unroll over the persisted-edge construction for the single
    query (entries = the beam's default lowest-id nodes); fusion
    chains two FULL OUTER joins through a coalesced doc_id."""
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        SQL_COS,
        _sql_bm25,
        kmeans_ctes,
    )
    from lol_data_pipeline_spark.plans.round9 import (
        _IVF_CELLS,
        _KM_ROUNDS,
        _NPROBE,
        _REFINE,
        _SAMPLE_WHERE,
        _pq_xhat_ctes,
    )

    cells = f"a{_KM_ROUNDS}"
    trained = f"c{_KM_ROUNDS}"
    dist = (
        "list_inner_product(e.x, e.x) - 2 * list_inner_product(e.x, c.c) "
        "+ list_inner_product(c.c, c.c)"
    )
    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    lex = _sql_bm25(_BM25_TERMS, _RRF_NL, _BM25_K1, _BM25_B)
    edge_ctes = _knn_edge_ctes_over("e")
    gaff = "gaffected AS (SELECT DISTINCT code FROM gcodes)"
    graph_ctes = (
        ",\n    ".join(edge_ctes[:2] + [gaff] + edge_ctes[2:])
        + f""",
    gedges AS (SELECT src_id, dst_id FROM granked WHERE rank <= {_GRAPH_K}),
    bqset AS (SELECT vec_id AS query_id, x AS qvec FROM e WHERE vec_id = {_RRF_Q}),
    bf0 AS (
      SELECT q.query_id, n.vec_id AS cand
      FROM bqset q CROSS JOIN (SELECT vec_id FROM e WHERE vec_id < {_BEAM_ENTRY_N}) n
    )"""
    )
    rounds = []
    for r in range(1, _BEAM_R + 1):
        rounds.append(f""",
    bx{r} AS (
      SELECT query_id, cand FROM bf{r - 1}
      UNION
      SELECT f.query_id, ed.dst_id AS cand
      FROM bf{r - 1} f JOIN gedges ed ON ed.src_id = f.cand
    ),
    bs{r} AS (
      SELECT x2.query_id, x2.cand,
             {SQL_COS.format(a='q.qvec', b='c.x')} AS sim
      FROM bx{r} x2
      JOIN bqset q ON q.query_id = x2.query_id
      JOIN e c ON c.vec_id = x2.cand
      WHERE x2.cand <> x2.query_id
    ),
    bf{r} AS (
      SELECT query_id, cand FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand) AS rn
        FROM bs{r}
      ) WHERE rn <= {_BEAM_B}
    )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes()},
    qprobe AS (
      SELECT vec_id AS query_id, x AS qvec, cid AS pcell
      FROM (
        SELECT e.vec_id, e.x, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e CROSS JOIN {trained} c
        WHERE e.vec_id = {_RRF_Q}
      ) WHERE rn <= {_NPROBE}
    ),
    approx AS (
      SELECT q.query_id, cl.vec_id AS match_id, q.qvec,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_inner_product(q.qvec, h.xh) DESC, cl.vec_id
             ) AS arank
      FROM qprobe q
      JOIN {cells} cl ON cl.cluster = q.pcell AND cl.vec_id <> q.query_id
      JOIN xhat h ON h.match_id = cl.vec_id
    ),
    vtop AS (
      SELECT match_id AS doc_id, rank_vec FROM (
        SELECT a.match_id,
               CAST(row_number() OVER (
                 ORDER BY {SQL_COS.format(a='a.qvec', b='e2.embedding')} DESC,
                          a.match_id
               ) AS BIGINT) AS rank_vec
        FROM approx a JOIN embeddings e2 ON e2.vec_id = a.match_id
        WHERE a.arank <= {_REFINE * _RRF_NV}
      ) WHERE rank_vec <= {_RRF_NV}
    ),
    {graph_ctes}{"".join(rounds)},
    gtop AS (
      SELECT cand AS doc_id, rank_graph FROM (
        SELECT cand,
               CAST(row_number() OVER (ORDER BY sim DESC, cand) AS BIGINT) AS rank_graph
        FROM bs{_BEAM_R}
      ) WHERE rank_graph <= {_RRF_NG}
    ),
    lexleg AS (SELECT doc_id, CAST(rank AS BIGINT) AS rank_lex FROM ({lex})),
    fused2 AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.rank_lex, v.rank_vec
      FROM lexleg l FULL OUTER JOIN vtop v ON v.doc_id = l.doc_id
    ),
    fused AS (
      SELECT COALESCE(f.doc_id, g.doc_id) AS doc_id,
             f.rank_lex, f.rank_vec, g.rank_graph,
             CAST(round(1000000 * (COALESCE(1.0 / ({_RRF_C} + f.rank_lex), 0.0)
                                   + COALESCE(1.0 / ({_RRF_C} + f.rank_vec), 0.0)
                                   + COALESCE(1.0 / ({_RRF_C} + g.rank_graph), 0.0)))
                  AS BIGINT) AS rrf_e6
      FROM fused2 f FULL OUTER JOIN gtop g ON g.doc_id = f.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rank_graph, rrf_e6,
           CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT)
               AS final_rank
    FROM fused
    QUALIFY final_rank <= {_RRF_K}
    """
    )


@query("retrieval_rrf3_served", sql=_sql_rrf3_fusion())
def retrieval_rrf3_served(spark, sf_dir):
    """The full retrieval stack in one query, every leg an ARTIFACT
    probe: BM25 postings (lexical, top-{nl}), IVF+PQ codes (vector,
    top-{nv}), kNN-graph edges (graph beam walk, top-{ng}) — fused by
    Reciprocal Rank Fusion, union-style across all three (two chained
    FULL OUTER joins; a doc found by any subset of legs sums exactly
    those legs' 1/(C+rank) terms). The three axes fail differently —
    lexical misses paraphrase, IVF misses across cell boundaries, the
    beam misses across graph components — which is why production
    fuses them; RRF needs no score normalization because it fuses
    RANKS (exact integer-rational arithmetic). At 100 TB nothing here
    scans the corpus: |terms| postings buckets + nprobe/C code
    partitions + a Q×B bounded walk over the edge table, then rank
    arithmetic on ≤{nl}+{nv}+{ng} rows. The oracle re-derives all
    three serve chains and both fusion joins in one statement."""
    from lol_data_pipeline_spark.operators.graph_index import served_beam_topk
    from lol_data_pipeline_spark.operators.relational import global_topk_ranked
    from lol_data_pipeline_spark.operators.text_index import (
        ensure_bm25_index,
        served_bm25_topk,
    )
    from lol_data_pipeline_spark.operators.vector_index import served_ivfpq_topk
    from lol_data_pipeline_spark.plans.extensions import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )
    from lol_data_pipeline_spark.plans.round9 import _NPROBE, _REFINE

    path, meta = ensure_bm25_index(spark, sf_dir)
    lex = served_bm25_topk(
        spark, path, meta, _BM25_TERMS, k=_RRF_NL, k1=_BM25_K1, b=_BM25_B
    ).select("doc_id", F.col("rank").cast("long").alias("rank_lex"))
    q = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") == _RRF_Q)
    vec = served_ivfpq_topk(
        spark, sf_dir, q, k=_RRF_NV, refine=_REFINE, nprobe=_NPROBE
    ).select(
        F.col("match_id").alias("vdoc"),
        F.col("rank").cast("long").alias("rank_vec"),
    )
    graph = served_beam_topk(
        spark, sf_dir, q, k=_RRF_NG, beam=_BEAM_B, rounds=_BEAM_R,
        entry_n=_BEAM_ENTRY_N,
    ).select(
        F.col("match_id").alias("gdoc"),
        F.col("rank").cast("long").alias("rank_graph"),
    )
    fused2 = lex.join(vec, lex.doc_id == vec.vdoc, "full_outer").select(
        F.coalesce(lex.doc_id, F.col("vdoc")).alias("doc_id"),
        "rank_lex",
        "rank_vec",
    )
    fused = (
        fused2.join(graph, fused2.doc_id == graph.gdoc, "full_outer")
        .select(
            F.coalesce(fused2.doc_id, F.col("gdoc")).alias("doc_id"),
            "rank_lex",
            "rank_vec",
            "rank_graph",
        )
        .withColumn(
            "rrf_e6",
            F.expr(
                f"CAST(round(1000000 * (COALESCE(1.0 / ({_RRF_C} + rank_lex), 0.0)"
                f" + COALESCE(1.0 / ({_RRF_C} + rank_vec), 0.0)"
                f" + COALESCE(1.0 / ({_RRF_C} + rank_graph), 0.0))) AS BIGINT)"
            ),
        )
    )
    topk = global_topk_ranked(
        fused, [("rrf_e6", True), ("doc_id", False)], _RRF_K, rank_col="final_rank"
    )
    return topk.select(
        "doc_id",
        "rank_lex",
        "rank_vec",
        "rank_graph",
        "rrf_e6",
        F.col("final_rank").cast("long").alias("final_rank"),
    ).orderBy("final_rank")
