"""Data-skipping layout tests: write_clustered / write_zordered must
produce parquet row-group statistics a pushed predicate can actually
skip on. Measured on the real file metadata (pyarrow), not asserted
from the plan — the stats ARE the mechanism readers skip with."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from lol_data_pipeline_spark.functions.zorder import with_zorder_key, write_zordered
from lol_data_pipeline_spark.io import load_table, write_clustered, write_overwrite


def _hit_fraction(path: str, col: str, value) -> float:
    """Fraction of row groups whose [min, max] for ``col`` contains
    ``value`` — the row groups a stats-pruning reader must read."""
    import pyarrow.parquet as pq

    tot = hit = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(f)
        names = [pf.schema_arrow.field(i).name for i in range(len(pf.schema_arrow))]
        idx = names.index(col)
        md = pf.metadata
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            tot += 1
            if st.min <= value <= st.max:
                hit += 1
    assert tot >= 4, f"need several row groups to measure skipping, got {tot}"
    return hit / tot


def test_write_clustered_narrows_row_group_stats(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    probe = li.approxQuantile("l_orderkey", [0.5], 0.01)[0]

    plain_dir, clus_dir = str(tmp_path / "plain"), str(tmp_path / "clustered")
    write_overwrite(li.repartition(8), plain_dir)
    write_clustered(li, clus_dir, ["l_orderkey"], num_files=8)

    plain_hit = _hit_fraction(plain_dir, "l_orderkey", probe)
    clus_hit = _hit_fraction(clus_dir, "l_orderkey", probe)
    assert plain_hit == 1.0  # round-robin files: every group spans the range
    assert clus_hit <= 0.25, (plain_hit, clus_hit)  # near-disjoint ranges

    # layout must not change content
    want = li.filter(F.col("l_orderkey") == probe).count()
    got = (
        spark.read.parquet(clus_dir).filter(F.col("l_orderkey") == probe).count()
    )
    assert got == want


def test_zorder_skips_on_every_participating_column(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    u_probe = ev.approxQuantile("user_id", [0.5], 0.01)[0]
    v_probe = round(ev.approxQuantile("value", [0.5], 0.01)[0], 3)

    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    write_overwrite(ev.repartition(8), plain_dir)
    write_zordered(ev, z_dir, ["user_id", "value"], num_files=8)

    for col, probe in (("user_id", u_probe), ("value", v_probe)):
        plain_hit = _hit_fraction(plain_dir, col, probe)
        z_hit = _hit_fraction(z_dir, col, probe)
        assert plain_hit == 1.0, (col, plain_hit)
        # z-order trades per-column perfection for BOTH columns
        # getting locality: each point predicate must still skip a
        # substantial share of row groups
        assert z_hit <= 0.75, (col, z_hit)

    # content parity after the layout rewrite
    assert spark.read.parquet(z_dir).count() == ev.count()
    want = ev.filter(F.col("user_id") == u_probe).count()
    assert (
        spark.read.parquet(z_dir).filter(F.col("user_id") == u_probe).count()
        == want
    )


def test_zorder_key_is_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") * 7 % 89).alias("b")
    )
    k1 = with_zorder_key(df, ["a", "b"], bits=8)
    k2 = with_zorder_key(df, ["a", "b"], bits=8)
    assert k1.select("__zkey").collect() == k2.select("__zkey").collect()
    mx = k1.agg(F.max("__zkey")).first()[0]
    assert 0 <= mx < (1 << 16)  # 2 cols x 8 bits


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """Compaction must collapse a many-tiny-files table to the
    byte-targeted count, preserve content exactly, and keep
    clustering stats when asked."""
    import glob as g

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "frag")
    # simulate an incremental sink: 24 tiny appends
    for i in range(24):
        li.filter(F.col("l_orderkey") % 24 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before_files = len(g.glob(f"{path}/*.parquet"))
    assert before_files >= 24
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    from lol_data_pipeline_spark.io import compact_parquet

    # target sized to force a multi-file result so the clustering
    # claim below is actually exercised
    total = sum(
        os.path.getsize(f) for f in g.glob(f"{path}/*.parquet")
    )
    n = compact_parquet(
        spark, path, target_file_bytes=max(1, total // 6),
        preserve_clustering=["l_orderkey"],
    )
    after_files = len(g.glob(f"{path}/*.parquet"))
    assert 4 <= after_files <= n < before_files
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before

    # clustering preserved: point probe touches few row groups
    probe = li.approxQuantile("l_orderkey", [0.5], 0.01)[0]
    assert _hit_fraction(path, "l_orderkey", probe) <= 0.5


def test_ann_index_at_rest_prunes_partitions(spark, sf_dir, tmp_path):
    """The production ANN path: persist IVF cell assignments
    partitioned BY CELL, so probing a query's cell is a partition-
    pruned scan (only that cell's files are listed/opened) — the
    at-rest counterpart of ivf_topk's in-flight cell filter. Verifies
    (a) the probe plan carries a PartitionFilter, (b) pruned-probe
    results equal the unpruned filter, (c) top-k over the pruned
    probe matches ivf_topk's answer for that query."""
    import re

    from lol_data_pipeline_spark.operators.similarity import (
        assign_ivf_cells,
        cosine,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    cells = assign_ivf_cells(emb, centroids)
    idx = str(tmp_path / "ivf_index")
    write_overwrite(cells, idx, partition_by=["cell_id"])

    at_rest = spark.read.parquet(idx)
    q = cells.filter(F.col("vec_id") == 10).first()  # a query + its cell
    probe = at_rest.filter(F.col("cell_id") == q["cell_id"])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell_id", plan)

    assert probe.count() == cells.filter(F.col("cell_id") == q["cell_id"]).count()

    topk = (
        probe.filter(F.col("vec_id") != 10)
        .select(
            F.col("vec_id").alias("match_id"),
            F.round(cosine(F.lit(q["embedding"]).cast("array<double>"), F.col("embedding")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("match_id").asc())
        .limit(5)
    )
    got = [(r["match_id"], r["sim"]) for r in topk.collect()]
    want = [
        (r["match_id"], r["sim"])
        for r in ivf_topk(emb, n_centroids=8, k=5, n_queries=20)
        .filter(F.col("query_id") == 10)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_lsh_index_at_rest_prunes_partitions(spark, sf_dir, tmp_path):
    """The production incremental-dedup path: the existing corpus's
    LSH band buckets live AT REST partitioned by band, so a new
    batch's probe — 8 (band, bkey) point predicates per doc — is a
    partition-pruned, stats-skipped scan instead of re-signing the
    corpus. Verifies (a) the probe plan carries a PartitionFilter on
    band + a pushed filter on bkey, (b) the candidate ids the
    at-rest probe returns for one new doc equal the in-flight
    bucket-join candidates for that doc."""
    import re

    from lol_data_pipeline_spark.operators.dedup import (
        _doc_shingle_arrays,
        _minhash_agg_cols,
        _MINHASH_P,
        minhash_band_buckets,
    )
    from lol_data_pipeline_spark.functions.scalar import md5_long

    docs = load_table(spark, sf_dir, "documents")
    base = _doc_shingle_arrays(docs, 3, "text", "doc_id")
    sh = base.select("id", F.explode("sh_arr").alias("shingle")).withColumn(
        "bh", F.pmod(md5_long(F.col("shingle")), F.lit(_MINHASH_P))
    )
    sigs = sh.groupBy("id").agg(*_minhash_agg_cols(16))
    buckets = minhash_band_buckets(sigs, 16, 8)

    # "existing corpus" = doc_id % 5 != 0, written partitioned by band
    idx = str(tmp_path / "lsh_index")
    write_overwrite(buckets.filter(F.pmod(F.col("id"), F.lit(5)) != 0), idx, partition_by=["band"])
    at_rest = spark.read.parquet(idx)

    # a "new" doc that shares ≥1 bucket with the index (the
    # interesting probe); its bucket keys are bounded: `bands` rows
    new_ids = (
        buckets.filter(F.pmod(F.col("id"), F.lit(5)) == 0)
        .join(
            buckets.filter(F.pmod(F.col("id"), F.lit(5)) != 0).select("band", "bkey"),
            ["band", "bkey"],
        )
        .select("id")
        .orderBy("id")
        .limit(1)
        .collect()
    )
    assert new_ids, "fixture should contain at least one cross-batch bucket match"
    new_id = new_ids[0]["id"]
    probe_keys = buckets.filter(F.col("id") == new_id).select("band", "bkey").collect()
    band0, bkey0 = probe_keys[0]["band"], probe_keys[0]["bkey"]

    probe = at_rest.filter((F.col("band") == band0) & (F.col("bkey") == bkey0))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*band", plan)
    assert re.search(r"PushedFilters: \[[^\]]*bkey", plan)

    # candidates via at-rest probe over all 8 keys == in-flight join
    import functools
    cond = functools.reduce(
        lambda a, b: a | b,
        [(F.col("band") == r["band"]) & (F.col("bkey") == r["bkey"]) for r in probe_keys],
    )
    got = {r["id"] for r in at_rest.filter(cond).select("id").distinct().collect()}
    inflight = (
        buckets.filter(F.col("id") == new_id)
        .select("band", "bkey")
        .join(buckets.filter(F.pmod(F.col("id"), F.lit(5)) != 0), ["band", "bkey"])
        .select("id")
        .distinct()
    )
    assert got == {r["id"] for r in inflight.collect()}
    assert got, "fixture should produce at least one candidate"
