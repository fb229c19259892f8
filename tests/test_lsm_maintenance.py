"""The r14 LSM maintenance layer's contracts (operators/lsm.py — the
r13 verdict's headline fix): upsert/delete WRITE cost is bounded by
the batch, never the artifact; the logical view is exactly the eager
merge's result; compaction folds without changing the view; the
emptied-table crash class (r13 ADVICE) is structurally gone.

The write-cost test is the verdict's done-criterion verbatim: "a new
test asserts rewritten bytes/partitions scale with the batch, not the
index (count files touched per upsert at two corpus sizes)".
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lol_data_pipeline_spark.operators.lsm import (
    delta_path,
    dir_bytes,
    lsm_compact,
    lsm_epochs,
    lsm_maybe_compact,
    tomb_path,
)

SF = "/root/testdata/sf0.001"


def _file_set(d):
    out = set()
    for dirpath, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out.add((p, os.path.getsize(p), os.path.getmtime(p)))
    return out


def _batch(spark, n=4, shift=770000):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + shift).alias("doc_id"), "text"
    )


def _build_ngram(spark, tmp, name, index_where):
    from lol_data_pipeline_spark.operators.chunk_index import (
        build_ngram_index,
    )

    path = str(tmp / name)
    os.makedirs(path, exist_ok=True)
    meta = build_ngram_index(spark, SF, path, n=5, index_where=index_where)
    return path, meta


def test_upsert_write_cost_scales_with_batch_not_index(spark, tmp_path):
    """THE scale invariant: the same fixed batch upserted into a
    small index and into an ~8x larger index writes the SAME bytes
    (one delta epoch + one tombstone epoch), leaves every base file
    untouched, and those bytes are far below the artifact's. The old
    keep∪batch shape rewrote base bytes ∝ the INDEX both times."""
    from lol_data_pipeline_spark.operators.chunk_index import (
        chunks_path,
        ngram_index_upsert,
    )

    small_path, small_meta = _build_ngram(
        spark, tmp_path, "ng_small", "doc_id % 16 = 0"
    )
    big_path, big_meta = _build_ngram(spark, tmp_path, "ng_big", "doc_id % 2 = 0")
    small_base, big_base = chunks_path(small_path), chunks_path(big_path)
    assert dir_bytes(big_base) > 4 * dir_bytes(small_base)

    batch = _batch(spark)
    written = {}
    for path, meta, base in (
        (small_path, small_meta, small_base),
        (big_path, big_meta, big_base),
    ):
        before = _file_set(base)
        ngram_index_upsert(spark, path, meta, batch)
        assert _file_set(base) == before, "base files touched by upsert"
        written[path] = dir_bytes(delta_path(base)) + dir_bytes(
            tomb_path(base)
        )
        assert written[path] > 0
    # identical batch → identical write, independent of index size
    ratio = written[big_path] / written[small_path]
    assert 0.8 <= ratio <= 1.25, ratio
    # and the write is a small fraction of the big artifact
    assert written[big_path] < dir_bytes(big_base) / 2


def test_view_equals_eager_merge_and_replace_precedence(spark, tmp_path):
    """The view after upsert equals the eager keep∪batch result; a
    second upsert of CHANGED content for the same ids replaces (the
    latest epoch wins), never duplicates."""
    from lol_data_pipeline_spark.operators.chunk_index import (
        _batch_ngram_rows,
        ngram_index_upsert,
        read_ngram_rows,
    )

    path, meta = _build_ngram(spark, tmp_path, "ng_view", "doc_id % 16 = 0")
    base_rows = set(map(tuple, read_ngram_rows(spark, path).collect()))
    b1 = _batch(spark)
    meta = ngram_index_upsert(spark, path, meta, b1)
    got1 = set(map(tuple, read_ngram_rows(spark, path).collect()))
    want1 = base_rows | set(
        map(tuple, _batch_ngram_rows(b1, 5).collect())
    )
    assert got1 == want1
    # changed text, same ids → full replacement of those ids' rows
    b2 = b1.select("doc_id", F.concat(F.lit("zq xq "), F.col("text")).alias("text"))
    meta = ngram_index_upsert(spark, path, meta, b2)
    got2 = set(map(tuple, read_ngram_rows(spark, path).collect()))
    want2 = base_rows | set(
        map(tuple, _batch_ngram_rows(b2, 5).collect())
    )
    assert got2 == want2
    assert meta["n_docs"] == len({r[0] for r in want2})


def test_compact_preserves_view_and_clears_log(spark, tmp_path):
    """Fold-back: upsert + delete, compact, and the view is
    row-identical while the delta/tombstone logs disappear and the
    doomed ids are physically gone from base."""
    from lol_data_pipeline_spark.operators.chunk_index import (
        chunks_path,
        ngram_index_delete,
        ngram_index_upsert,
        read_ngram_rows,
    )

    path, meta = _build_ngram(spark, tmp_path, "ng_cpt", "doc_id % 8 = 0")
    meta = ngram_index_upsert(spark, path, meta, _batch(spark))
    doomed = spark.createDataFrame([(0,), (8,)], "doc_id long")
    meta = ngram_index_delete(spark, path, meta, doomed)
    base = chunks_path(path)
    assert lsm_epochs(base)
    before = sorted(map(tuple, read_ngram_rows(spark, path).collect()))
    assert lsm_compact(spark, base, "id", ["hb"], sort_within=["h"])
    assert lsm_epochs(base) == []
    after = sorted(map(tuple, read_ngram_rows(spark, path).collect()))
    assert after == before
    raw = spark.read.parquet(base)
    assert raw.filter(F.col("id").isin(0, 8)).count() == 0


def test_upsert_after_full_delete_and_empty_compact(spark, tmp_path):
    """The r13 ADVICE crash class, structurally: delete EVERYTHING,
    keep reading (no schema-inference crash), compact the emptied
    table (schema-bearing empty base), then upsert into it and read
    the batch back."""
    from lol_data_pipeline_spark.operators.chunk_index import (
        _batch_ngram_rows,
        chunks_path,
        ngram_index_delete,
        ngram_index_upsert,
        read_ngram_rows,
    )

    path, meta = _build_ngram(spark, tmp_path, "ng_empty", "doc_id IN (0, 8)")
    doomed = spark.createDataFrame([(0,), (8,)], "doc_id long")
    meta = ngram_index_delete(spark, path, meta, doomed)
    assert meta["n_docs"] == 0 and meta["n_grams"] == 0
    assert read_ngram_rows(spark, path).count() == 0
    base = chunks_path(path)
    lsm_compact(spark, base, "id", ["hb"], sort_within=["h"])
    assert read_ngram_rows(spark, path).count() == 0  # schema survives
    b = _batch(spark, n=2)
    meta = ngram_index_upsert(spark, path, meta, b)
    got = set(map(tuple, read_ngram_rows(spark, path).collect()))
    assert got == set(map(tuple, _batch_ngram_rows(b, 5).collect()))
    assert meta["n_docs"] == 2


def test_quota_trigger_folds_at_threshold(spark, tmp_path):
    """lsm_maybe_compact is a no-op below the quota and folds at it —
    the amortization contract (per-batch cost = batch + artifact /
    quota)."""
    from lol_data_pipeline_spark.operators.chunk_index import (
        chunks_path,
        ngram_index_upsert,
    )

    path, meta = _build_ngram(spark, tmp_path, "ng_quota", "doc_id % 16 = 0")
    base = chunks_path(path)
    meta = ngram_index_upsert(spark, path, meta, _batch(spark, n=2))
    assert not lsm_maybe_compact(spark, base, "id", ["hb"], quota=5)
    assert lsm_epochs(base)
    assert lsm_maybe_compact(spark, base, "id", ["hb"], quota=1)
    assert lsm_epochs(base) == []
