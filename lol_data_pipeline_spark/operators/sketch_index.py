"""Materialized daily-HLL sketch index: the (day, idx, m_j) register
table persisted day-partitioned + a JSON sidecar — the SKETCH member
of the served-index family (quantization = vector_index, graph =
graph_index, lexical = text_index, near-dup = minhash_index, exact
substring = chunk_index, mergeable aggregates = this).

sketch_hll_rolling derives the daily registers from raw events every
run; this module is the production rollup shape (how every "rolling
uniques" dashboard actually works): each day's ≤m-register sketch is
computed ONCE when the day's events land, and every window query —
7-day, 28-day, any — is a register-wise MAX merge over the at-rest
day sketches, never a raw-events scan. HLL's register max is
associative AND idempotent, which makes the maintenance trivially
exactly-once: re-ingesting a day's events max-merges to the identical
registers.

- BUILD (once): one distinct (day, user) pass → daily registers,
  written hive-partitioned by ``day`` (the natural incremental unit —
  a daily batch lands in exactly its own partitions).
- SERVE: window estimates off the artifact alone (register merge +
  exact-integer harmonic sum — plans/sketches.hll_rolling_estimate,
  the SAME estimate tail the in-query entry runs).
- MAINTAIN: upsert = register-wise MAX merge of a batch's day
  sketches into the touched day partitions (idempotent by the HLL
  merge property); delete = retention drop of whole day partitions.

Reference parity: the reference persists fetched documents and
re-serves them (src/api/db.py:23-38) — the same build-once/probe-many
contract, mergeable-aggregate axis.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lol_data_pipeline_spark.io import (
    load_table,
    write_overwrite,
    write_upsert_partitions,
)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SKETCH_ROOT = os.environ.get(
    "SPARK_GRAFT_SKETCH_INDEX_DIR",
    os.path.join(_REPO_ROOT, "spark-warehouse", "sketch_index"),
)
_META_NAME = "_sketch_meta.json"


def regs_path(path: str) -> str:
    return os.path.join(path, "day_regs")


def _day_regs(ev: DataFrame) -> DataFrame:
    # lazy import: the register derivation lives beside the in-query
    # entry (plans/sketches.hll_day_registers) so served ≡ in-query
    # by construction; importing here avoids a plans→operators cycle
    from lol_data_pipeline_spark.plans.sketches import hll_day_registers

    return hll_day_registers(ev)


def build_hll_index(spark: SparkSession, sf_dir: str, path: str) -> dict:
    """One distinct-pass over events → day-partitioned registers +
    sidecar (HLL params, counts, source fingerprint)."""
    from lol_data_pipeline_spark.operators.vector_index import (
        _source_fingerprint,
    )
    from lol_data_pipeline_spark.plans.sketches import _HLL_M, _HLL_P

    ev = load_table(spark, sf_dir, "events")
    regs = _day_regs(ev).repartition("day").sortWithinPartitions("idx")
    write_overwrite(regs, regs_path(path), partition_by=["day"])
    disk = spark.read.parquet(regs_path(path))
    agg = disk.agg(
        F.count("*").alias("n_rows"), F.countDistinct("day").alias("n_days")
    ).collect()[0]
    meta = {
        "fingerprint": _source_fingerprint(sf_dir, table="events"),
        "params": {"p": _HLL_P, "m": _HLL_M},
        "n_days": int(agg.n_days),
        "n_rows": int(agg.n_rows),
    }
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def ensure_hll_index(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    variant: str = "",
) -> tuple[str, dict]:
    """Build-if-absent-or-stale (the vector_index.ensure_* contract)."""
    from lol_data_pipeline_spark.operators.vector_index import (
        _source_fingerprint,
    )
    from lol_data_pipeline_spark.plans.sketches import _HLL_M, _HLL_P

    root = root or SKETCH_ROOT
    name = os.path.basename(os.path.normpath(sf_dir)) + (
        f"_{variant}" if variant else ""
    )
    path = os.path.join(root, f"hll_{name}")
    meta_path = os.path.join(path, _META_NAME)
    want_fp = _source_fingerprint(sf_dir, table="events")
    want_params = {"p": _HLL_P, "m": _HLL_M}
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == want_fp and meta.get("params") == want_params:
            return path, meta
    except (OSError, ValueError):
        pass
    os.makedirs(path, exist_ok=True)
    meta = build_hll_index(spark, sf_dir, path)
    return path, meta


def served_hll_rolling(spark: SparkSession, path: str) -> DataFrame:
    """Rolling 7-day estimates from the artifact ALONE: spine = the
    at-rest days, estimate = the shared register-merge tail. No
    events scan, no exact leg — the serving shape (the in-query twin
    carries the exact answer alongside as its error envelope)."""
    from lol_data_pipeline_spark.plans.sketches import hll_rolling_estimate

    day_regs = spark.read.schema("idx long, m_j int, day date").parquet(
        regs_path(path)
    ).select(
        "day", F.col("idx").cast("long").alias("idx"), "m_j"
    )
    spine = day_regs.select("day").distinct().withColumnRenamed(
        "day", "report_day"
    )
    return hll_rolling_estimate(day_regs, spine).orderBy("report_day")


def hll_index_upsert(
    spark: SparkSession, path: str, meta: dict, new_events: DataFrame
) -> dict:
    """Merge a batch's day sketches into the artifact: register-wise
    MAX per (day, idx) against the touched days' existing rows, then
    rewrite ONLY those day partitions. Idempotent by HLL's merge
    property — re-ingesting the same events is a no-op."""
    batch = _day_regs(new_events)
    days = batch.select("day").distinct()
    existing = spark.read.parquet(regs_path(path)).select(
        "day", F.col("idx").cast("long").alias("idx"), "m_j"
    )
    touched = existing.join(F.broadcast(days), "day")
    merged = (
        touched.unionByName(batch)
        .groupBy("day", "idx")
        .agg(F.max("m_j").alias("m_j"))
        .localCheckpoint()
    )
    write_upsert_partitions(merged, regs_path(path), ["day"])
    disk = spark.read.parquet(regs_path(path))
    agg = disk.agg(
        F.count("*").alias("n_rows"), F.countDistinct("day").alias("n_days")
    ).collect()[0]
    meta = dict(meta)
    meta["n_days"], meta["n_rows"] = int(agg.n_days), int(agg.n_rows)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def hll_index_retention_drop(
    spark: SparkSession, path: str, meta: dict, keep_from
) -> dict:
    """Retention: drop whole day partitions older than ``keep_from``
    (a date) — the take-down shape for pre-aggregated telemetry.
    Idempotent."""
    disk = spark.read.parquet(regs_path(path))
    days = [r.day for r in disk.select("day").distinct().collect()]
    doomed = [d for d in days if d < keep_from]
    for d in doomed:
        shutil.rmtree(
            os.path.join(regs_path(path), f"day={d.isoformat()}"),
            ignore_errors=True,
        )
    meta = dict(meta)
    if len(doomed) == len(days):
        # keep_from beyond the newest day: every partition dropped —
        # re-reading the emptied directory would throw (unable to
        # infer schema) and leave the sidecar stale (r12 ADVICE).
        meta["n_days"], meta["n_rows"] = 0, 0
    else:
        disk = spark.read.parquet(regs_path(path))
        agg = disk.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("day").alias("n_days"),
        ).collect()[0]
        meta["n_days"], meta["n_rows"] = int(agg.n_days), int(agg.n_rows)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return meta
