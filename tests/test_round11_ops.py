"""Round-11 operator tests: the materialized k-NN graph index —
artifact layout, staleness reuse, served-equals-in-query equivalence,
and idempotent bucket-local maintenance."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lol_data_pipeline_spark.operators.graph_index import (
    assign_codes,
    ensure_knn_graph_index,
    graph_delete,
    graph_upsert,
    read_edges,
    read_nodes,
)
from lol_data_pipeline_spark.plans import REGISTRY
from lol_data_pipeline_spark.plans.round11 import (
    _GRAPH_K,
    _GRAPH_PLANES,
    _GUP_HI,
    _GUP_LO,
    _GUP_SHIFT,
)


@pytest.fixture(scope="module")
def gindex(spark, sf_dir, tmp_path_factory):
    """A fresh graph index under a test-owned root (never the shared
    spark-warehouse copy), built once for the module."""
    root = str(tmp_path_factory.mktemp("graph_index"))
    path, meta = ensure_knn_graph_index(
        spark, sf_dir, root=root, n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    return root, path, meta


def test_graph_layout_is_code_partitioned_nodes_and_edges(gindex):
    """The persisted artifact IS the bucket-local maintenance layout:
    hive directories per code for BOTH tables, a sidecar carrying the
    literal plane vectors (maintenance must never depend on the
    source still containing them)."""
    _root, path, meta = gindex
    assert os.path.exists(os.path.join(path, "_graph_meta.json"))
    assert len(meta["planes"]) == _GRAPH_PLANES
    assert all(len(p) == 64 for p in meta["planes"])
    for sub in ("nodes", "edges"):
        parts = [
            d
            for d in os.listdir(os.path.join(path, sub))
            if d.startswith("code=")
        ]
        assert parts, sub
    # every edge bucket has a node bucket (edges form within buckets)
    ncodes = {
        d
        for d in os.listdir(os.path.join(path, "nodes"))
        if d.startswith("code=")
    }
    ecodes = {
        d
        for d in os.listdir(os.path.join(path, "edges"))
        if d.startswith("code=")
    }
    assert ecodes <= ncodes


def test_graph_index_matches_inquery_knn_graph(spark, sf_dir, gindex):
    """The persisted edges equal similarity.knn_graph's in-query
    output exactly (literal-plane coding vs joined-plane coding is
    the same rounded sign test) — the equivalence that lets the
    served beam entry share the in-query entry's oracle."""
    from lol_data_pipeline_spark.operators.similarity import knn_graph

    _root, path, _meta = gindex
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    inq = sorted(
        map(
            tuple,
            knn_graph(emb, n_planes=_GRAPH_PLANES, k=_GRAPH_K)
            .select("src_id", "dst_id", "sim", "rank")
            .collect(),
        )
    )
    served = sorted(
        map(
            tuple,
            read_edges(spark, path)
            .select("src_id", "dst_id", "sim", "rank")
            .collect(),
        )
    )
    assert served == inq


def test_served_beam_equals_inquery_beam(spark, sf_dir):
    """The served entry and the graph-rebuilding entry return the
    SAME rows — persistence is an optimization, not a semantic
    change."""
    served = REGISTRY["ann_graph_beam_served_topk"].fn(spark, sf_dir)
    s_cols, s_rows = served.columns, sorted(map(tuple, served.collect()))
    # collect BEFORE invoking the next entry: registered entries
    # release tracked caches on entry, which frees the served plan's
    # lineage-truncation checkpoints
    inq = REGISTRY["ann_graph_beam_topk"].fn(spark, sf_dir)
    assert s_cols == inq.columns
    assert s_rows == sorted(map(tuple, inq.collect()))


def test_stale_graph_rebuilds_and_fresh_graph_is_reused(
    spark, sf_dir, gindex
):
    """Staleness contract: same source + params → the build is NOT
    repeated; a corrupted fingerprint → rebuild."""
    root, path, _meta = gindex
    meta_path = os.path.join(path, "_graph_meta.json")
    mtime0 = os.path.getmtime(meta_path)
    p2, _ = ensure_knn_graph_index(
        spark, sf_dir, root=root, n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    assert p2 == path
    assert os.path.getmtime(meta_path) == mtime0  # reused, not rebuilt
    with open(meta_path) as f:
        meta = json.load(f)
    meta["fingerprint"] = "stale"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    p3, meta3 = ensure_knn_graph_index(
        spark, sf_dir, root=root, n_planes=_GRAPH_PLANES, k=_GRAPH_K
    )
    assert p3 == path
    assert meta3["fingerprint"] != "stale"  # rebuilt


def test_graph_upsert_is_idempotent_and_symmetric(spark, sf_dir, gindex):
    """Three contracts: (a) new nodes land in their buckets with
    out-edges; (b) existing bucket-mates' edge lists SEE the new
    nodes (symmetric maintenance, not append-only); (c) re-running
    the same batch leaves disk content identical. Untouched buckets
    keep their content byte-for-byte."""
    _root, path, meta = gindex
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = F.col("embedding").cast("array<double>")
    batch = emb.filter(F.col("vec_id").between(_GUP_LO, _GUP_HI - 1)).select(
        (F.col("vec_id") + _GUP_SHIFT).alias("vec_id"),
        F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias("embedding"),
    )
    before_edges = {
        int(r.code): r.n
        for r in read_edges(spark, path)
        .groupBy("code")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    affected = graph_upsert(spark, path, meta, batch)
    assert 1 <= len(affected) <= 2 ** _GRAPH_PLANES

    # (a) every batch node exists on disk, in the bucket its coding says
    nodes = read_nodes(spark, path, codes=affected)
    want = {
        (int(r.vec_id), int(r.code))
        for r in assign_codes(batch, meta["planes"]).collect()
    }
    got = {
        (int(r.vec_id), int(r.code))
        for r in nodes.filter(F.col("vec_id") >= _GUP_SHIFT).collect()
    }
    assert got == want

    def snapshot():
        return sorted(map(tuple, read_edges(spark, path, codes=affected).collect()))

    after1 = snapshot()
    # (b) some new node appears as a DESTINATION of a pre-existing
    # source — bucket-mates' lists were recomputed, not appended
    assert any(
        row[2] >= _GUP_SHIFT and row[1] < _GUP_SHIFT for row in after1
    )
    # (c) idempotent
    graph_upsert(spark, path, meta, batch)
    assert snapshot() == after1
    # untouched buckets unchanged
    now = {
        int(r.code): r.n
        for r in read_edges(spark, path)
        .groupBy("code")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for c, n in before_edges.items():
        if c not in set(affected):
            assert now[c] == n


def test_graph_delete_promotes_survivors_and_drops_emptied(
    spark, sf_dir, gindex
):
    """Delete contracts: (a) doomed ids vanish from nodes AND from
    every edge endpoint; (b) survivors that lost a neighbor get a
    promoted replacement (per-source ranks stay contiguous from 1);
    (c) idempotent; (d) a fully-emptied bucket loses its directory in
    both tables."""
    _root, path, meta = gindex
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    doomed = emb.filter(F.col("vec_id").between(200, 219)).select(
        "vec_id", "embedding"
    )
    affected = graph_delete(spark, path, meta, doomed)
    gone = set(range(200, 220))
    node_ids = {r.vec_id for r in read_nodes(spark, path).select("vec_id").collect()}
    assert not (node_ids & gone)
    edges = read_edges(spark, path).collect()
    assert not ({r.src_id for r in edges} & gone)
    assert not ({r.dst_id for r in edges} & gone)
    # (b) contiguous ranks per source in affected buckets
    by_src: dict = {}
    for r in edges:
        if r.code in set(affected):
            by_src.setdefault(r.src_id, []).append(r.rank)
    assert by_src
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
    # (c) idempotent
    graph_delete(spark, path, meta, doomed)
    assert {
        r.vec_id for r in read_nodes(spark, path).select("vec_id").collect()
    } == node_ids
    # (d) empty a whole bucket: doom every remaining member of the
    # first affected bucket
    victim = affected[0]
    members = read_nodes(spark, path, codes=[victim]).select("vec_id").collect()
    member_ids = [r.vec_id for r in members]
    if member_ids:
        base = emb.filter(
            F.col("vec_id").isin([m for m in member_ids if m < _GUP_SHIFT])
        ).select("vec_id", "embedding")
        x = F.col("embedding").cast("array<double>")
        up = [m - _GUP_SHIFT for m in member_ids if m >= _GUP_SHIFT]
        doom_all = base
        if up:
            doom_all = doom_all.unionByName(
                emb.filter(F.col("vec_id").isin(up)).select(
                    (F.col("vec_id") + _GUP_SHIFT).alias("vec_id"),
                    F.concat(F.slice(x, 33, 32), F.slice(x, 1, 32)).alias(
                        "embedding"
                    ),
                )
            )
        graph_delete(spark, path, meta, doom_all)
    assert not os.path.isdir(os.path.join(path, "nodes", f"code={victim}"))
    assert not os.path.isdir(os.path.join(path, "edges", f"code={victim}"))


def test_served_beam_plan_has_no_bucket_selfjoin(spark, sf_dir):
    """The REASON the artifact exists, asserted on the plan: the
    served walk's physical plan reads the persisted edge parquet and
    contains no LSH bucket self-join (SortMergeJoin on code) — the
    build cost is gone from the query path."""
    df = REGISTRY["ann_graph_beam_served_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the walk reads the persisted edge table ...
    assert "graph_index" in plan and "edges" in plan
    # ... and never runs the build's bucket self-join (its join
    # condition equates code with the aliased dcode side)
    assert "dcode" not in plan
