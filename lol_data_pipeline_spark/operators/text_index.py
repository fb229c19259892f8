"""Materialized BM25 inverted index: build ONCE as a term-bucket-
partitioned postings table + a doc-length table + a JSON stats
sidecar, then SERVE keyword queries via partition pruning and
MAINTAIN the artifact bucket-locally — the LEXICAL member of the
served-index family (quantization = operators/vector_index.py,
graph = operators/graph_index.py, lexical = this).

operators/search.py's bm25_topk fuses index build and probe into one
query ("a production search engine would persist the postings +
lengths tables", its own docstring notes) — this module is that
persistence:

- BUILD (once): ONE tokenize pass → postings (term, doc_id, tf)
  hive-partitioned by ``tb`` = crc32(term) mod NB (a handful of
  stable directories; a query's terms prune to ≤ |terms| of them),
  plus doclens (doc_id, dl) partitioned by ``db`` = doc_id mod NB
  (so document upserts/deletes rewrite only their partitions), plus
  a sidecar with exact integer corpus totals (n_docs, total tokens —
  avgdl derives as an exact-integer division, so the served literal
  equals the oracle's computed avg bit-for-bit).
- SERVE (per query): query terms hash driver-side to their buckets
  (zlib.crc32 == Spark's crc32 — pinned by test) → LITERAL partition
  filters + a pushed term filter on the postings scan; per-term df
  comes from the SAME pruned scan (≤ |terms| rows collected), so df
  stays correct under maintenance with no separate stats table;
  score = the shared bm25_weight_sql expression over pivoted tf
  columns with sidecar scalars as literals — identical doubles to
  the in-query operator, which is why the served entry shares
  text_search_bm25's oracle verbatim.
- MAINTAIN: batch-bounded LSM writes (operators/lsm.py — the r13
  verdict's headline fix): an upsert APPENDS the batch's postings
  and lengths as delta epochs plus doc-id tombstones on BOTH tables
  (write ∝ batch — the old shape re-wrote every affected bucket's
  full contents, index-sized bytes when a batch's terms span the
  buckets; tombstones also subsume the old second pass that chased
  replaced ids' postings into unaffected buckets), and the sidecar's
  integer totals update exactly. Deletes append tombstones only.
  Serves read the base∪delta view (plain base scan when the log is
  empty); the quota trigger folds the log back. Idempotent at the
  view level by construction.

At 100 TB: the postings table is the corpus's token-frequency
surface (rows = distinct (doc, term) pairs); a query reads only its
terms' postings (partition pruning × pushed term filter), never the
corpus. Reference parity: the reference persists fetched documents
and re-serves them (src/api/db.py:23-38) — the same build-once/
serve-many contract, lexical axis.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lol_data_pipeline_spark.functions.text import tokens
from lol_data_pipeline_spark.io import load_table, widen, write_overwrite
from lol_data_pipeline_spark.operators.lsm import (
    lsm_delete,
    lsm_maybe_compact,
    lsm_reset,
    lsm_upsert,
    lsm_view,
)
from lol_data_pipeline_spark.operators.relational import global_topk_ranked
from lol_data_pipeline_spark.operators.search import bm25_weight_sql

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
TEXT_ROOT = os.environ.get(
    "SPARK_GRAFT_TEXT_INDEX_DIR",
    os.path.join(_REPO_ROOT, "spark-warehouse", "text_index"),
)
_META_NAME = "_text_meta.json"
_NB = 16  # term/doc bucket count


def term_bucket(term: str) -> int:
    """Driver-side twin of the build's ``pmod(crc32(term), NB)`` —
    zlib.crc32 computes the same CRC-32 Spark's crc32() does (pinned
    by tests/test_round11_ops.py)."""
    return zlib.crc32(term.encode("utf-8")) % _NB


def postings_path(path: str) -> str:
    return os.path.join(path, "postings")


def doclens_path(path: str) -> str:
    return os.path.join(path, "doclens")


POSTINGS_DDL = "doc_id long, term string, tf long, tb int"
DOCLENS_DDL = "doc_id long, dl long, db int"
# one source of truth per table: lsm_view's declared read schema AND
# the empty fallback (r14 ADVICE)


def read_postings(spark: SparkSession, path: str) -> DataFrame:
    """The postings table's logical (doc_id, term, tf, tb) rows — the
    LSM view (plain base scan when the log is empty). Empty-with-
    schema when nothing is on disk."""
    view = lsm_view(
        spark, postings_path(path), "doc_id", schema=POSTINGS_DDL
    )
    if view is None:
        view = spark.createDataFrame([], POSTINGS_DDL)
    return view.select(
        "doc_id", "term", "tf", F.col("tb").cast("int").alias("tb")
    )


def read_doclens(spark: SparkSession, path: str) -> DataFrame:
    """The doc-length table's logical (doc_id, dl, db) rows — same
    contract as read_postings."""
    view = lsm_view(
        spark, doclens_path(path), "doc_id", schema=DOCLENS_DDL
    )
    if view is None:
        view = spark.createDataFrame([], DOCLENS_DDL)
    return view.select("doc_id", "dl", F.col("db").cast("int").alias("db"))


def _postings_and_lens(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    toks = widen(docs).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    )
    lens = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("dl"),
        F.pmod(F.col("doc_id"), F.lit(_NB)).cast("int").alias("db"),
    )
    postings = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn(
            "tb", F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(_NB)).cast("int")
        )
    )
    return postings, lens


def build_bm25_index(spark: SparkSession, sf_dir: str, path: str) -> dict:
    """ONE tokenize pass → postings + doclens + exact-integer stats
    sidecar. The build materializes the FULL vocabulary's postings —
    the one-time cost every probe afterwards avoids."""
    docs = load_table(spark, sf_dir, "documents")
    postings, lens = _postings_and_lens(docs)
    write_overwrite(postings, postings_path(path), partition_by=["tb"])
    write_overwrite(lens, doclens_path(path), partition_by=["db"])
    lsm_reset(postings_path(path))  # a rebuild starts a fresh generation
    lsm_reset(doclens_path(path))
    row = (
        spark.read.parquet(doclens_path(path))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("dl").cast("long").alias("tot"),
        )
        .collect()[0]
    )
    from lol_data_pipeline_spark.operators.vector_index import (
        _source_fingerprint,
    )

    meta = {
        "fingerprint": _source_fingerprint(sf_dir, table="documents"),
        "params": {"nb": _NB},
        "n_docs": int(row.n),
        "total_tokens": int(row.tot),
    }
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def ensure_bm25_index(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    variant: str = "",
) -> tuple[str, dict]:
    """Build-if-absent-or-stale (the vector_index.ensure_* contract),
    keyed by corpus basename + optional variant."""
    from lol_data_pipeline_spark.operators.vector_index import (
        _source_fingerprint,
    )

    root = root or TEXT_ROOT
    name = os.path.basename(os.path.normpath(sf_dir)) + (
        f"_{variant}" if variant else ""
    )
    path = os.path.join(root, f"bm25_{name}")
    meta_path = os.path.join(path, _META_NAME)
    want_fp = _source_fingerprint(sf_dir, table="documents")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == want_fp and meta.get("params") == {
            "nb": _NB
        }:
            return path, meta
    except (OSError, ValueError):
        pass
    os.makedirs(path, exist_ok=True)
    meta = build_bm25_index(spark, sf_dir, path)
    return path, meta


def served_bm25_topk(
    spark: SparkSession,
    path: str,
    meta: dict,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Serve BM25 top-k from the PERSISTED index: the postings scan
    is pruned to the query terms' buckets (literal partition filters)
    with the term equality pushed into the scan; per-term df comes
    from the same pruned rows (≤ |terms| values collected); corpus
    scalars ride as sidecar literals whose doubles equal the
    recomputing operator's aggregates exactly (integer totals).
    Output (doc_id, score, n_terms_hit, rank) is identical to
    operators/search.bm25_topk — the served entry shares its oracle
    verbatim."""
    esc = [t.replace("'", "''") for t in terms]
    nt = len(terms)
    buckets = sorted({term_bucket(t) for t in terms})
    post = (
        read_postings(spark, path)
        .filter(F.col("tb").isin(buckets))
        .filter(F.col("term").isin(list(terms)))
        .select("doc_id", "term", "tf")
    )
    dfs = {r.term: int(r.n) for r in post.groupBy("term").agg(F.count("*").alias("n")).collect()}
    n_docs = float(meta["n_docs"])
    avgdl = meta["total_tokens"] / meta["n_docs"]
    # pivot the ≤|terms| postings per doc into dense tf{i} columns —
    # the same shape bm25_topk scores (shared bm25_weight_sql text)
    cand = post.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0))
            .cast("double")
            .alias(f"tf{i}")
            for i, t in enumerate(terms)
        ]
    )
    lens = read_doclens(spark, path).select("doc_id", "dl")
    joined = lens.join(F.broadcast(cand), "doc_id").select(
        F.col("doc_id").alias("id"),
        F.col("dl").cast("double").alias("dl"),
        *[F.col(f"tf{i}") for i in range(nt)],
        F.lit(n_docs).alias("n_docs"),
        F.lit(float(avgdl)).alias("avgdl"),
        *[F.lit(float(dfs.get(t, 0))).alias(f"df{i}") for i, t in enumerate(terms)],
    )
    score_expr = " + ".join(bm25_weight_sql(i, k1, b) for i in range(nt))
    hits_expr = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(nt)
    )
    scored = joined.select(
        "id",
        F.expr(f"round({score_expr}, 6)").alias("score"),
        F.expr(f"CAST({hits_expr} AS BIGINT)").alias("n_terms_hit"),
    )
    topk = global_topk_ranked(scored, [("score", True), ("id", False)], k)
    return topk.select(F.col("id").alias("doc_id"), "score", "n_terms_hit", "rank")


def bm25_index_upsert(
    spark: SparkSession, path: str, meta: dict, new_docs: DataFrame
) -> dict:
    """Merge a document batch into the persisted index: the batch's
    postings and lengths APPEND as delta epochs + doc-id tombstones
    on both tables (write ∝ batch; a replaced doc's OLD postings —
    including ones in buckets the new text never touches — are
    superseded by the tombstone at read time, which retires the old
    second chase-the-unaffected-buckets pass), and the sidecar's
    EXACT integer totals update. Older rows physically drop at the
    quota-triggered compact. Idempotent. Returns the updated meta."""
    postings, lens = _postings_and_lens(new_docs)
    lsm_upsert(spark, postings_path(path), postings, "doc_id", ["tb"])
    lsm_upsert(spark, doclens_path(path), lens, "doc_id", ["db"])
    lsm_maybe_compact(
        spark, postings_path(path), "doc_id", ["tb"], sort_within=["term"]
    )
    lsm_maybe_compact(spark, doclens_path(path), "doc_id", ["db"])
    # exact totals from the post-write doclens view (one column-pruned
    # aggregate — the same read the old incremental arithmetic needed
    # to find replaced docs' lengths)
    row = (
        read_doclens(spark, path)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("tot"),
        )
        .collect()[0]
    )
    meta = dict(meta)
    meta["n_docs"] = int(row.n)
    meta["total_tokens"] = int(row.tot)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def bm25_index_delete(
    spark: SparkSession, path: str, meta: dict, doomed_ids: DataFrame
) -> dict:
    """Take-down: doc-id tombstones on both tables (write ∝ doomed
    ids) — the docs' postings and lengths vanish from the VIEW
    immediately, from disk at the next compact; the sidecar's EXACT
    integer totals shrink. Idempotent."""
    ids = doomed_ids.select("doc_id")
    lsm_delete(spark, postings_path(path), ids, "doc_id")
    lsm_delete(spark, doclens_path(path), ids, "doc_id")
    lsm_maybe_compact(
        spark, postings_path(path), "doc_id", ["tb"], sort_within=["term"]
    )
    lsm_maybe_compact(spark, doclens_path(path), "doc_id", ["db"])
    row = (
        read_doclens(spark, path)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("tot"),
        )
        .collect()[0]
    )
    meta = dict(meta)
    meta["n_docs"] = int(row.n)
    meta["total_tokens"] = int(row.tot)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return meta
