"""Round-10 additions: the MATERIALIZED vector index lifecycle —
build once as a cell_id-partitioned parquet table, SERVE probes via
partition pruning, and MAINTAIN it against the frozen codebook
(batch upsert, streaming assign, take-down delete) — plus the
retrieval stages around it (graph-axis beam search, MMR diversified
rerank), the tokenizer lifecycle's encode half (text_bpe_encode,
corpus_pack_bpe_budget), and spectral embedding analytics
(emb_power_iteration).

Round 9 proved every index STAGE in-query (train → assign → encode →
probe → rescore, all oracle-matched); this round persists the build
so serving stops recomputing it — executing SCALE.md's central 100 TB
claim ("cell_id as a partition column; probes become partition
pruning") as code with a hygiene-asserted plan instead of prose.

Registered AFTER plans/round9.py on purpose (same window discipline):
the driver's correctness gate samples the FIRST 50 registry entries
and orders never-green entries by registration order — new entries
queue behind the existing backlog.

Scale notes (100 TB):
- ann_ivfpq_served_topk amortizes the index build across every query
  batch: the serve path touches nprobe/C of the FILES (hive partition
  pruning on literal probed cells — the probed-cell collect is
  bounded by the CODEBOOK size, never query count) and m/(dim·4) of
  the BYTES per vector (the scan reads only the m small-int code
  columns; ReadSchema is asserted in tests/test_round10_ops.py). The
  full-precision corpus is touched only by the bounded refine·k
  rescore, as a broadcast-candidate filter join.
- ann_index_upsert is the daily-ingest pattern: new vectors are
  assigned to the FROZEN trained codebook as a pure projection (no
  retraining — production indexes are built once and fed forever),
  and only the ≤ k affected partitions are rewritten (dynamic
  partition overwrite). Idempotent by construction: re-running the
  same batch rewrites identical content.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lol_data_pipeline_spark.plans.queries import T, query
from lol_data_pipeline_spark.plans.round9 import (
    _IVF_CELLS,
    _K,
    _KM_ROUNDS,
    _KMQ_HI,
    _KMQ_LO,
    _KMQ_TAIL_HI,
    _KMQ_TAIL_LO,
    _NPROBE,
    _PQ_DSUB,
    _PQ_M,
    _PQ_NCENT,
    _REFINE,
    _SAMPLE_MOD,
    _SAMPLE_WHERE,
    _pq_xhat_ctes,
    _sql_ivfpq_kmeans,
)

_INDEX_PARAMS = dict(
    k=_IVF_CELLS,
    rounds=_KM_ROUNDS,
    m=_PQ_M,
    dsub=_PQ_DSUB,
    ncent=_PQ_NCENT,
    sample_mod=_SAMPLE_MOD,
    dim=64,
)

# Incremental-maintenance batch: a deterministic TRANSFORM of a
# bounded id range (halves-swapped vectors under shifted ids), so the
# "new" vectors are genuinely different from anything indexed while
# remaining derivable from the shared testdata in both engines.
_UP_LO, _UP_HI = 300, 320
_UP_SHIFT = 100000


@query("ann_ivfpq_served_topk", sql=_sql_ivfpq_kmeans())
def ann_ivfpq_served_topk(spark, sf_dir):
    """Serve top-k from the PERSISTED IVF+PQ index (built once per
    corpus by operators/vector_index.py: sample-trained codebook,
    cell_id-partitioned PQ codes, JSON sidecar with the literal
    centroids + codebook + source fingerprint). The serve plan:
    probe selection is the shared join-free projection against the
    sidecar's literal centroids; the probed cells become LITERAL
    partition filters (Spark prunes to nprobe directories — asserted
    on the plan in tests/test_round10_ops.py) over a scan that reads
    ONLY the m code columns; decode to x̂ is a pure projection whose
    doubles are bit-identical to the in-query encode, so this entry
    shares ann_ivfpq_kmeans_topk's oracle verbatim and returns the
    exact same rows — recomputation and serving are provably
    equivalent. Exact rescore joins the bounded refine·k candidates
    (broadcast) against the full-precision source table."""
    from lol_data_pipeline_spark.operators.vector_index import served_ivfpq_topk

    queries = T(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    )
    return served_ivfpq_topk(
        spark, sf_dir, queries, k=_K, refine=_REFINE, nprobe=_NPROBE
    )


def _sql_index_upsert() -> str:
    from lol_data_pipeline_spark.plans.extensions import kmeans_ctes

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
        assign_src="allv",
    )
    # Splice the corpus∪batch CTE right after (e, es) — DuckDB CTEs
    # may only reference earlier ones, and the final assignment
    # (assign_src) reads allv.
    allv = f"""allv AS (
      SELECT vec_id, x FROM e
      UNION ALL
      SELECT vec_id + {_UP_SHIFT} AS vec_id,
             list_concat(list_slice(x, 33, 64), list_slice(x, 1, 32)) AS x
      FROM e WHERE vec_id >= {_UP_LO} AND vec_id < {_UP_HI}
    )"""
    ctes = ctes[:2] + [allv] + ctes[2:]
    cells = f"a{_KM_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes(src=cells, xcol="x", emit="codes")},
    affected AS (
      SELECT DISTINCT cluster FROM {cells} WHERE vec_id >= {_UP_SHIFT}
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cell_id, c.codes
    FROM {cells} a
    JOIN codes c USING (vec_id)
    JOIN affected f ON a.cluster = f.cluster
    ORDER BY vec_id
    """
    )


@query("ann_index_upsert", sql=_sql_index_upsert())
def ann_index_upsert(spark, sf_dir):
    """Incremental index maintenance: assign a NEW vector batch to
    the FROZEN persisted codebook (pure projection against the
    sidecar's literal centroids — no retraining), PQ-encode it, and
    merge it into the persisted index rewriting ONLY the ≤ k affected
    partitions (dynamic partition overwrite). Returns the post-upsert
    DISK content of the affected partitions (vec_id, cell_id, codes)
    — re-read from parquet, so what is verified is what a subsequent
    serve would scan. Idempotent: a re-run replaces the same ids with
    identical rows. The entry maintains its OWN index copy
    (variant="upsert") so the synthetic batch never leaks into
    ann_ivfpq_served_topk's read-only index. The oracle re-derives
    the sampled-trained codebook, assigns corpus∪batch, re-encodes,
    and restricts to the batch's cells — end-to-end, no fixtures."""
    from lol_data_pipeline_spark.operators.vector_index import (
        assign_to_index,
        ensure_ivfpq_index,
        index_upsert,
        pq_code_cols,
        read_index_codes,
    )

    path, meta = ensure_ivfpq_index(
        spark, sf_dir, variant="upsert", **_INDEX_PARAMS
    )
    emb = T(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    batch = emb.filter(
        F.col("vec_id").between(_UP_LO, _UP_HI - 1)
    ).select(
        (F.col("vec_id") + _UP_SHIFT).alias("vec_id"),
        F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias("embedding"),
    )
    new_codes = assign_to_index(batch, meta)
    affected = index_upsert(spark, path, meta, new_codes)
    disk = read_index_codes(spark, path, meta, cells=affected)
    return disk.select(
        "vec_id",
        F.col("cell_id").cast("long").alias("cell_id"),
        F.concat_ws(",", *pq_code_cols(_PQ_M)).alias("codes"),
    ).orderBy("vec_id")


def _sql_stream_assign() -> str:
    from lol_data_pipeline_spark.plans.extensions import kmeans_ctes

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes(src=cells, xcol="x", emit="codes")}
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cell_id, c.codes
    FROM {cells} a JOIN codes c USING (vec_id)
    ORDER BY vec_id
    """
    )


@query("stream_ann_assign_multibatch", sql=_sql_stream_assign())
def stream_ann_assign_multibatch(spark, sf_dir):
    """STREAMING index ingest: new vectors arrive as a four-batch
    ordered replay and are assigned to the FROZEN persisted codebook
    (the sidecar ann_ivfpq_served_topk serves from) + PQ-encoded —
    the production feed path: the index is built once, then fed
    forever by a stream that never retrains. The whole per-batch
    transform is STATELESS pure projection against literal centroids
    (no watermark, no state store, no shuffle inside a micro-batch —
    the cheapest possible streaming operator shape), so any batch
    split yields the same rows. Oracle: the batch index BUILD
    content re-derived end-to-end (sampled-trained codebook →
    assignment → codes) — streaming ingest and batch build are
    provably byte-identical, which is what makes a lambda-free
    single-pipeline architecture sound."""
    from lol_data_pipeline_spark.operators.vector_index import (
        assign_to_index,
        ensure_ivfpq_index,
        pq_code_cols,
    )
    from lol_data_pipeline_spark.streaming.windows import replay_multibatch

    _path, meta = ensure_ivfpq_index(spark, sf_dir, **_INDEX_PARAMS)
    emb = T(spark, sf_dir, "embeddings")
    parts = [emb.filter(F.col("vec_id") % 4 == i) for i in range(4)]

    def build(stream):
        return assign_to_index(stream, meta).select(
            "vec_id",
            F.col("cell_id").cast("long").alias("cell_id"),
            F.concat_ws(",", *pq_code_cols(_PQ_M)).alias("codes"),
        )

    return replay_multibatch(
        spark, parts, build, mode="append", key=f"ann_assign:{sf_dir}"
    )


# ---------------------------------------------------------------------------
# Power iteration — the spectral member of the embedding-analytics
# family: top principal direction of the uncentered Gram matrix.
# ---------------------------------------------------------------------------

_PI_ROUNDS = 6


def _sql_power_iteration() -> str:
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)",
        "p AS (SELECT unnest(generate_series(1, 64)) AS pos)",
        "v0 AS (SELECT x AS v FROM e WHERE vec_id = 0)",
    ]
    for r in range(1, _PI_ROUNDS + 1):
        ctes.append(f"""t{r} AS (
      SELECT p.pos,
             sum(CAST(floor(e.x[p.pos] * list_inner_product(e.x, (SELECT v FROM v{r - 1})) * 1048576.0) AS BIGINT)) AS sv
      FROM e CROSS JOIN p GROUP BY 1
    )""")
        ctes.append(
            f"w{r} AS (SELECT list(sv / 1048576.0 ORDER BY pos) AS w FROM t{r})"
        )
        ctes.append(
            f"v{r} AS (SELECT list_transform(w, y -> y / sqrt(list_inner_product(w, w))) AS v FROM w{r})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(p.pos - 1 AS BIGINT) AS pos,
           round((SELECT v FROM v{_PI_ROUNDS})[p.pos], 6) AS loading
    FROM p ORDER BY pos
    """
    )


@query("emb_power_iteration", sql=_sql_power_iteration())
def emb_power_iteration(spark, sf_dir):
    """Top principal DIRECTION of the embedding corpus via {r} rounds
    of power iteration — the spectral embedding-analytics op (what a
    PCA-whitening or anisotropy-removal preprocessing stage needs).
    The broadcast-iterate / fixed-point recipe kmeans_train proved:
    per round ONE codegen aggregate whose shuffle is dim partial rows
    at any corpus size (per-term floor(x·s·2^20) BIGINT sums make the
    result bit-identical across engines and partitionings) plus a
    dim-row collect; normalization runs driver-side on the dim-sized
    vector with the engines' sequential fold order. Deterministic
    start (v₀ = the vec_id-0 embedding) fixes the eigenvector's sign.
    The oracle unrolls every round. Returns (pos, loading), the unit
    direction."""
    from lol_data_pipeline_spark.operators.clustering import power_iteration

    emb = T(spark, sf_dir, "embeddings")
    v = power_iteration(emb, rounds=_PI_ROUNDS, dim=64)
    raw = spark.createDataFrame(
        [(p, float(x)) for p, x in enumerate(v)],
        "pos bigint, loading double",
    )
    # round via the ENGINE (not Python's round) — the Spark-vs-DuckDB
    # round() pairing is the parity-proven one across the registry.
    return raw.select("pos", F.round("loading", 6).alias("loading")).orderBy(
        "pos"
    )


# ---------------------------------------------------------------------------
# MMR diversified rerank — the retrieval-diversity stage after ANN:
# greedy maximal-marginal-relevance selection from a bounded pool.
# ---------------------------------------------------------------------------

_MMR_POOL = 20
_MMR_K = 5
_MMR_LAM = 0.7


def _sql_mmr() -> str:
    from lol_data_pipeline_spark.plans.extensions import SQL_COS
    from lol_data_pipeline_spark.plans.queries import snap_sql

    lam, mu = _MMR_LAM, round(1 - _MMR_LAM, 6)
    # MMR scores are λ·rel (and λ·rel − μ·div) over 6-decimal inputs
    # — RATIONAL values that land on exact .5 ties at the 6th decimal
    # (seen at sf0.01: 0.7·0.375955 = 0.2631685), so they take the
    # tie-safe snap, not round() (see snap_sql).
    snap1 = snap_sql(f"{lam} * rel")
    snapt = snap_sql(f"{lam} * rel - {mu} * div")
    ctes = [
        f"""qset AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE (vec_id >= {_KMQ_LO} AND vec_id < {_KMQ_HI})
         OR (vec_id >= {_KMQ_TAIL_LO} AND vec_id < {_KMQ_TAIL_HI})
    )""",
        f"""pool AS (
      SELECT query_id, cand, rel FROM (
        SELECT q.query_id, e.vec_id AS cand,
               {SQL_COS.format(a='q.qvec', b='e.embedding')} AS rel,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {SQL_COS.format(a='q.qvec', b='e.embedding')} DESC, e.vec_id
               ) AS rn
        FROM qset q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
      ) WHERE rn <= {_MMR_POOL}
    )""",
        f"""s1 AS (
      SELECT query_id, cand, rel, {snap1} AS score, 1 AS pick
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand) AS rn
        FROM pool
      ) WHERE rn = 1
    )""",
    ]
    for t in range(2, _MMR_K + 1):
        prev = f"s{t - 1}"
        ctes.append(f"""d{t} AS (
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
        ctes.append(f"""p{t} AS (
      SELECT query_id, cand, rel, score, {t} AS pick FROM (
        SELECT query_id, cand, rel,
               {snapt} AS score,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY {snapt} DESC, cand
               ) AS rn
        FROM d{t}
      ) WHERE rn = 1
    )""")
        ctes.append(
            f"s{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{t})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT query_id, CAST(cand AS BIGINT) AS match_id, rel, score AS mmr_score,
           CAST(pick AS BIGINT) AS pick
    FROM s{_MMR_K} ORDER BY query_id, pick
    """
    )


@query("ann_mmr_rerank", sql=_sql_mmr())
def ann_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance DIVERSIFIED top-k — the rerank
    stage a retrieval pipeline runs after ANN so the k results are
    not k near-duplicates: greedily pick argmax
    λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) from a bounded
    relevance pool (top-{pool} exact cosine), k−1 rounds. Every
    structure is BOUNDED: the pool is Q×{pool} rows (broadcast on
    every join), the selected set grows to k, rounds are a driver
    loop over lazy plans with no collect — constant work per query
    at any corpus size once the pool stage (any ANN entry) has run.
    All scores are rounded to 6 before comparison, so the greedy
    argmax (score DESC, id) is engine-deterministic and the oracle
    unrolls the identical selection rounds. Selection runs as the
    shared single-stage grouped kernel (operators/similarity.
    mmr_greedy) — one applyInPandas over query_id groups, not k−1
    driver-synchronized rounds."""
    from lol_data_pipeline_spark.caching import tracked_persist
    from lol_data_pipeline_spark.operators.similarity import cosine, mmr_greedy

    lam = _MMR_LAM
    emb = T(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("cand"),
        F.col("embedding").alias("cvec"),
        F.round(cosine(F.col("qvec"), F.col("embedding")), 6).alias("rel"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("cand").asc())
    pool = tracked_persist(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_POOL)
        .select("query_id", "cand", "cvec", "rel")
    )
    out = mmr_greedy(pool, lam=lam, k=_MMR_K)
    return out.select(
        "query_id",
        F.col("cand").alias("match_id"),
        "rel",
        F.col("score").alias("mmr_score"),
        F.col("pick").cast("long").alias("pick"),
    ).orderBy("query_id", "pick")


# ---------------------------------------------------------------------------
# BPE encode: apply the LEARNED merge table (train → encode → count,
# the full tokenizer lifecycle — text_bpe_train produces merges,
# these consume them).
# ---------------------------------------------------------------------------


# Take-down batch: a bounded id range standing in for deletion
# requests (the right-to-be-forgotten path).
_DEL_LO, _DEL_HI = 40, 60


def _sql_index_delete() -> str:
    from lol_data_pipeline_spark.plans.extensions import kmeans_ctes

    ctes = kmeans_ctes(
        _IVF_CELLS,
        assigns=_KM_ROUNDS + 1,
        updates=_KM_ROUNDS,
        dim=64,
        train_where=_SAMPLE_WHERE,
    )
    cells = f"a{_KM_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    {_pq_xhat_ctes(src=cells, xcol="x", emit="codes")},
    affected AS (
      SELECT DISTINCT cluster FROM {cells}
      WHERE vec_id >= {_DEL_LO} AND vec_id < {_DEL_HI}
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cell_id, c.codes
    FROM {cells} a
    JOIN codes c USING (vec_id)
    JOIN affected f ON a.cluster = f.cluster
    WHERE a.vec_id < {_DEL_LO} OR a.vec_id >= {_DEL_HI}
    ORDER BY vec_id
    """
    )


@query("ann_index_delete", sql=_sql_index_delete())
def ann_index_delete(spark, sf_dir):
    """Index DELETE — the take-down / right-to-be-forgotten path
    every training-data pipeline must have: a bounded deletion batch
    is located by RECOMPUTING its cell assignment from the source
    vectors (a pure projection against the frozen codebook — the
    deterministic assignment IS the lookup, no index scan), then
    ONLY the ≤ codebook-size affected partitions are rewritten
    without the doomed ids (a fully-emptied cell's directory is
    dropped explicitly — dynamic overwrite cannot write an empty
    partition). Idempotent: a re-run rewrites identical content.
    Returns the post-delete DISK content of the affected partitions,
    re-read from parquet; the oracle re-derives the build and
    subtracts the doomed range. Maintains its own index copy
    (variant="delete") so the mutation never leaks into the served
    read-only index."""
    from lol_data_pipeline_spark.operators.vector_index import (
        ensure_ivfpq_index,
        index_delete,
        pq_code_cols,
        read_index_codes,
    )

    path, meta = ensure_ivfpq_index(
        spark, sf_dir, variant="delete", **_INDEX_PARAMS
    )
    emb = T(spark, sf_dir, "embeddings")
    doomed = emb.filter(F.col("vec_id").between(_DEL_LO, _DEL_HI - 1)).select(
        "vec_id", "embedding"
    )
    affected = index_delete(spark, path, meta, doomed)
    disk = read_index_codes(spark, path, meta, cells=affected)
    return disk.select(
        "vec_id",
        F.col("cell_id").cast("long").alias("cell_id"),
        F.concat_ws(",", *pq_code_cols(_PQ_M)).alias("codes"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Graph-based ANN: beam search over the k-NN graph — the third index
# family axis (quantization: ann_ivfpq_*; hashing: ann_lsh_*; graph:
# this), the serving pattern HNSW/NSG-style indexes use, expressed as
# bounded-round DataFrame algebra.
# ---------------------------------------------------------------------------

_BEAM_B = 8  # beam width (candidates kept per query per round)
_BEAM_R = 3  # expansion rounds (bounded — graph diameter at toy scale)
_BEAM_ENTRY_N = 4  # deterministic entry points: the lowest vec_ids


def _sql_graph_beam() -> str:
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
        + f"""
    SELECT query_id, CAST(cand AS BIGINT) AS match_id, sim, rank
    FROM (
      SELECT query_id, cand, sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand) AS BIGINT) AS rank
      FROM s{_BEAM_R}
    ) WHERE rank <= {_K}
    """
    )


@query("ann_graph_beam_topk", sql=_sql_graph_beam())
def ann_graph_beam_topk(spark, sf_dir):
    """GRAPH-based ANN: beam search over the k-NN graph — the third
    index-family axis (quantization = ann_ivfpq_*, hashing =
    ann_lsh_*, graph = this), the serving pattern HNSW/NSG-style
    indexes use, as bounded-round DataFrame algebra. From {n}
    deterministic entry nodes, {r} expansion rounds: frontier ∪
    graph-neighbors(frontier) → exact cosine score → keep the top-{b}
    beam per query; final top-k from the last scored set. The graph
    is the emb_knn_graph edge list (LSH-bucketed top-3 neighbors,
    Σ bucket² build — at 100 TB it is an AT-REST artifact built
    once, like the IVF index).

    Plan shape per round: the frontier is Q×{b} rows (BROADCAST on
    both the edge join and the score join — the corpus and the edge
    table are filter-joined by broadcast candidate ids, never
    shuffled); rounds are a bounded driver loop over lazy plans with
    NO collect. Oracle: the edge CTEs shared VERBATIM with
    emb_knn_graph, then the identical rounds unrolled. Bounded
    everything: entries, beam, rounds, k — constant work per query
    at any corpus size once the graph exists."""
    from lol_data_pipeline_spark.caching import tracked_persist, truncate_lineage
    from lol_data_pipeline_spark.operators.similarity import cosine, knn_graph

    emb = T(spark, sf_dir, "embeddings")
    edges = tracked_persist(
        knn_graph(emb, n_planes=6, k=3).select("src_id", "dst_id")
    )
    q = emb.filter(
        (F.col("vec_id").between(_KMQ_LO, _KMQ_HI - 1))
        | (F.col("vec_id").between(_KMQ_TAIL_LO, _KMQ_TAIL_HI - 1))
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    corpus = emb.select(
        F.col("vec_id").alias("cand"), F.col("embedding").alias("cvec")
    )
    frontier = q.select("query_id").crossJoin(
        emb.filter(F.col("vec_id") < _BEAM_ENTRY_N).select(
            F.col("vec_id").alias("cand")
        )
    )
    scored = None
    for _r in range(_BEAM_R):
        expanded = frontier.unionByName(
            frontier.join(edges, frontier.cand == edges.src_id).select(
                "query_id", F.col("dst_id").alias("cand")
            )
        ).distinct()
        scored = (
            corpus.join(F.broadcast(expanded), "cand")
            .join(F.broadcast(q), "query_id")
            .filter(F.col("cand") != F.col("query_id"))
            .select(
                "query_id",
                "cand",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("cand").asc()
        )
        # the frontier is referenced twice next round (union left +
        # edge-join right) — cut its lineage per round (Q×B rows) so
        # the plan stays constant-size instead of doubling per round.
        frontier = truncate_lineage(
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _BEAM_B)
            .select("query_id", "cand")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _K)
        .select(
            "query_id", F.col("cand").alias("match_id"), "sim", "rank"
        )
    )


def _sql_bpe_doc_ctes() -> list[str]:
    """Per-doc word representation + the learned merges applied in
    training order: dw0 (separator form per doc-word occurrence),
    dw{i+1} = merge b{i} applied — the same replace the training
    chain uses, parameterized by the 1-row argmax CTEs it derives."""
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS, _bpe_train_ctes

    ctes = list(_bpe_train_ctes())
    ctes.append("""dw0 AS (
      SELECT doc_id, chr(183) || regexp_replace(word, '(.)', '\\1' || chr(183), 'g') AS w
      FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        FROM documents
      ) t WHERE word <> ''
    )""")
    for i in range(_BPE_ROUNDS):
        ctes.append(f"""dw{i + 1} AS (
      SELECT doc_id,
             replace(w, chr(183) || (SELECT l FROM b{i}) || chr(183) || (SELECT r FROM b{i}) || chr(183),
                     chr(183) || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || chr(183)) AS w
      FROM dw{i}
    )""")
    return ctes


def _sql_bpe_encode() -> str:
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    return (
        "WITH "
        + ",\n".join(_sql_bpe_doc_ctes())
        + f"""
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(list_filter(string_split(w, chr(183)), x -> x <> ''))) AS BIGINT) AS bpe_tokens
    FROM dw{_BPE_ROUNDS} GROUP BY 1 ORDER BY doc_id
    """
    )


@query("text_bpe_encode", sql=_sql_bpe_encode())
def text_bpe_encode(spark, sf_dir):
    """ENCODE the corpus with the learned BPE merge table: train
    ({r} rounds, vocabulary-sized — same loop as text_bpe_train, one
    definition via operators/bpe.py bpe_train), then tokenize every
    document by applying the merges in training order and count
    per-doc tokens. Returns (doc_id, n_words, bpe_tokens) — the REAL
    token counts a budgeting stage needs, vs the regex-proxy counts
    text_token_stats reports. Encode is ONE corpus scan of pure
    projections (the merge table rides as driver-side literals,
    constant size at any corpus scale) + one per-doc aggregate; the
    oracle re-derives training end-to-end (shared CTE chain) and
    unrolls the same merge applications per document. Docs with no
    [a-z]+ word produce no row — nothing to tokenize."""
    from lol_data_pipeline_spark.operators.bpe import bpe_encode_docs, bpe_train
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    docs = T(spark, sf_dir, "documents")
    merges = bpe_train(docs, rounds=_BPE_ROUNDS)
    return bpe_encode_docs(docs, merges).orderBy("doc_id")


def _sql_pack_bpe() -> str:
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    return (
        "WITH "
        + ",\n".join(_sql_bpe_doc_ctes())
        + f""",
    tok AS (
      SELECT w.doc_id, d.source,
             CAST(sum(len(list_filter(string_split(w.w, chr(183)), x -> x <> ''))) AS BIGINT) AS n_tok
      FROM dw{_BPE_ROUNDS} w JOIN documents d USING (doc_id)
      GROUP BY 1, 2
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM tok
    )
    SELECT doc_id, source, n_tok,
           CAST((cum - 1) // 2048 AS BIGINT) AS bin_id
    FROM c
    """
    )


@query("corpus_pack_bpe_budget", sql=_sql_pack_bpe())
def corpus_pack_bpe_budget(spark, sf_dir):
    """Sequence packing on REAL tokenizer counts: the same greedy
    first-fit running-sum packing as corpus_pack_token_budget
    (one window per source partition, a single hash shuffle), but
    budgeted by the learned-BPE token counts text_bpe_encode
    produces instead of that entry's regex-proxy counts — the
    train → encode → pack composition a production data pipeline
    runs. Docs with no [a-z]+ word have nothing to pack and are
    absent (their proxy-count twin bins them at zero tokens)."""
    from lol_data_pipeline_spark.operators.bpe import bpe_encode_docs, bpe_train
    from lol_data_pipeline_spark.plans.round9 import _BPE_ROUNDS

    docs = T(spark, sf_dir, "documents")
    merges = bpe_train(docs, rounds=_BPE_ROUNDS)
    tok = bpe_encode_docs(docs, merges, keep_cols=("source",)).select(
        "doc_id", "source", F.col("bpe_tokens").alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tok.select(
        "doc_id",
        "source",
        "n_tok",
        ((F.sum("n_tok").over(w) - 1) / F.lit(2048)).cast("long").alias("bin_id"),
    )
