"""Full-text relevance ranking: Okapi BM25 over an on-the-fly
inverted index.

The keyword-retrieval counterpart of the ANN family: given a bag of
query terms, rank documents by BM25. Spark-first layout:

- ONE tokenize pass; per-doc lengths are a narrow projection (no
  explode). The explode happens only to build postings, and the
  term filter sits directly on the generated column, so the
  full-vocabulary inverted index is never materialized — only the
  query terms' postings flow into the tf aggregate.
- document frequency / idf are per-term scalars (tiny, broadcast);
  the corpus doc count and mean length are a 1-row scalar broadcast
  (the same pattern as TPC-H Q11's global total).
- score_d = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
  idf_t = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)  (Lucene's
  always-positive variant). Ranking ties break on doc_id, and the
  rank is computed on the ROUNDED score so both engines order
  identically.

At 100 TB: postings for a handful of query terms are a vanishing
fraction of the corpus, and they reach the tf aggregate pre-shuffled
down to (candidate doc × term) rows; the per-doc-length join sends
the tiny tf side to the big lens side broadcast, so the corpus is
never shuffled. A production search engine would persist the
postings + lengths tables (they're both one scan) and bucket them by
term / doc; this operator is that build fused with one probe.

Reference parity: the reference repo has no search surface — this is
a north-star extension (SURVEY §7 M3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lol_data_pipeline_spark.caching import tracked_persist
from lol_data_pipeline_spark.functions.text import tokens
from lol_data_pipeline_spark.io import widen
from lol_data_pipeline_spark.operators.relational import global_topk_ranked


def bm25_weight_sql(i: int, k1: float, b: float) -> str:
    """The BM25 contribution of term ``i`` as SQL text over columns
    tf{i}/df{i}/dl/n_docs/avgdl — shared verbatim by the Spark
    expression and the DuckDB oracle, so even the literal constants
    parse to identical doubles in both engines."""
    return (
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * {k1 + 1.0})"
        f" / (tf{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        f" ELSE 0.0 END)"
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 for ``terms``.

    Returns (doc_id, score, n_terms_hit, rank); only documents
    containing at least one query term are candidates.

    For a handful of query terms (the operator's contract) the
    inverted index degenerates profitably into DENSE per-row tf
    columns: tf_t = size(filter(tokens, x = t)) is a pure projection
    — no explode, no postings shuffle, ONE tokenize pass. The only
    aggregate is the 1-row scalar (N, avgdl, df_t per term), and the
    score is a per-row expression over the scalar broadcast, summed
    in a FIXED term order so the float result is deterministic on
    both engines. (For open-ended term sets — hundreds of terms —
    the postings/explode layout wins; that shape is what
    `corpus_decontaminate`'s inverted shingle index implements.)
    """
    esc = [t.replace("'", "''") for t in terms]
    nt = len(terms)
    tcol = "_toks"
    base = widen(docs).withColumn(tcol, tokens(text_col))
    # Narrow per-doc stats (id, dl, tf…): ~5 columns regardless of
    # corpus width. Persisted because the scalar aggregate and the
    # scoring projection are separate jobs (the scalar must collect
    # for its broadcast first).
    per_doc = tracked_persist(
        base.select(
            F.col(id_col).alias("id"),
            F.size(tcol).alias("dl"),
            *[
                F.expr(f"CAST(size(filter({tcol}, x -> x = '{t}')) AS DOUBLE)").alias(f"tf{i}")
                for i, t in enumerate(esc)
            ],
        )
    )
    scal = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double").alias(f"df{i}")
            for i in range(nt)
        ],
    )
    cand = per_doc.filter(F.expr(" OR ".join(f"tf{i} > 0" for i in range(nt))))
    score_expr = " + ".join(bm25_weight_sql(i, k1, b) for i in range(nt))
    hits_expr = " + ".join(f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(nt))
    scored = cand.crossJoin(F.broadcast(scal)).select(
        "id",
        F.expr(f"round({score_expr}, 6)").alias("score"),
        F.expr(f"CAST({hits_expr} AS BIGINT)").alias("n_terms_hit"),
    )
    # Top-k via TakeOrderedAndProject + k×k rank derivation — NOT an
    # unpartitioned window: a common query term makes the candidate
    # set data-sized at 100 TB, and a global row_number would move
    # all of it to one partition. TakeOrdered keeps a k-row heap per
    # partition and merges P·k rows on the driver instead.
    topk = global_topk_ranked(scored, [("score", True), ("id", False)], k)
    return topk.select(F.col("id").alias(id_col), "score", "n_terms_hit", "rank")
