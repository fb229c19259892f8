"""Connected-components and k-means operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_pipeline_spark.io import load_table
from lol_data_pipeline_spark.operators.clustering import kmeans_assign, kmeans_summary
from lol_data_pipeline_spark.operators.graph import connected_components, dedup_groups


def test_components_close_transitive_chain(spark):
    """A~B, B~C, C~D (no direct A~C/A~D edges) must all land in one
    component labeled by the minimum id — the case pairwise dedup
    output gets wrong."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.component for r in connected_components(pairs, iters=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_groups_verdicts(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    rows = {r.doc_id: r for r in dedup_groups(pairs, iters=3).collect()}
    assert rows[5].keep_id == 5 and rows[5].drop is False
    assert rows[7].keep_id == 5 and rows[7].drop is True
    assert all(r.group_size == 3 for r in rows.values())


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_assign(emb, k=4, iters=2)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    clusters = {r.cluster for r in out.select("cluster").distinct().collect()}
    assert clusters <= set(range(4)) and len(clusters) >= 2


def test_kmeans_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted((r.vec_id, r.cluster) for r in kmeans_assign(emb, k=4, iters=2).collect())
    b = sorted((r.vec_id, r.cluster) for r in kmeans_assign(emb, k=4, iters=2).collect())
    assert a == b


def test_kmeans_one_iter_assigns_to_nearest_seed(spark):
    """With iters=1 and orthogonal seed vectors, every point lands on
    the seed it is closest to."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # near seed 0
        (3, [0.1, 0.95, 0.0, 0.0]),  # near seed 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=2, iters=1, dim=4).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_kmeans_summary_covers_members(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    s = kmeans_summary(emb, k=4, iters=2)
    rows = s.collect()
    assert sum(r.n_members for r in rows) == emb.count()
    assert all(r.rep_id is not None for r in rows)
