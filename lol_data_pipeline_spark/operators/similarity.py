"""Embedding similarity search: brute-force cosine top-k and an
IVF-bucketed approximate variant.

Vectors are ``array<float>`` columns. The dot product / norm are
native higher-order functions (`zip_with` + `aggregate`) — JVM-side,
no Python. Similarities are rounded to 6 dp before ranking so the
oracle (which sums in a different order) ranks identically; ties
break on vec_id.

Scale notes (100 TB):
- brute force is O(Q × N) — fine when Q (queries) is small enough to
  broadcast, which is the layout here: corpus stays partitioned,
  queries broadcast, no shuffle of the corpus at all; the final
  top-k per query is a tiny shuffle of Q × k rows.
- IVF: corpus is bucketed by nearest centroid once (a broadcast join
  against C centroids); a query probes only its centroid's bucket,
  cutting scanned rows by ~C×. Centroids here are deterministic seed
  vectors (first C by id) so the oracle can reproduce assignment;
  production would k-means them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lol_data_pipeline_spark.io import widen


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def with_norm(df: DataFrame, vec_col: str, out_col: str = "nrm") -> DataFrame:
    """Attach the L2 norm as a materialized column so pairwise joins
    compute cosine as dot/(nrm_a*nrm_b) — the two norm folds move
    from O(N²) pair evaluations to O(N) row evaluations. The dot is
    still the sequential zip_with fold, so results stay bit-identical
    to the naive cosine() (same op order)."""
    return df.withColumn(out_col, norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query over the corpus.

    Broadcast the (small) query set against the partitioned corpus;
    rank per query with a window. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = widen(corpus).select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec"))
    scored = c.join(F.broadcast(q), F.col("match_id") != F.col("query_id")).select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def assign_ivf_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max
    rounded cosine, centroid-id tiebreak). Broadcast-join + window —
    the corpus itself is never shuffled by value."""
    cent = centroids.select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centvec")
    )
    scored = widen(corpus).crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell_id"),
        F.round(cosine(F.col(vec_col), F.col("centvec")), 6).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cell_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell_id")
    )


def ivf_topk(
    corpus: DataFrame,
    n_centroids: int = 8,
    k: int = 5,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's own IVF cell.

    Deterministic setup (oracle-reproducible): centroids are the
    first ``n_centroids`` vectors by id; queries the first
    ``n_queries``.
    """
    centroids = corpus.filter(F.col(id_col) < n_centroids)
    cells = assign_ivf_cells(corpus, centroids, id_col, vec_col)
    queries = cells.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("cell_id").alias("qcell"),
    )
    scored = cells.join(
        F.broadcast(queries),
        (F.col("cell_id") == F.col("qcell")) & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("match_id"),
        F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )
