"""Connected components over near-duplicate pair graphs.

A dedup pipeline's last step: pair lists (from MinHash/SimHash/
Jaccard) are EDGES; the duplicate GROUPS are the connected
components, and the canonical document per group is its minimum id.
Pairwise output alone under-deletes (A~B, B~C but A~C unreported —
keeping A and C) — grouping must close over transitive chains.

Algorithm: synchronous min-label propagation. Every vertex starts
labeled with its own id; each round every vertex takes the min of
its label and its neighbors' labels. After k rounds every vertex
within graph distance k of its component's minimum carries that
minimum. Near-dup components are dense (duplicate groups are
near-cliques, diameter 1-2), so a small fixed k converges; a fixed
k also makes the operator DETERMINISTIC and lets the DuckDB oracle
unroll the same k rounds symbolically.

Scale notes (100 TB):
- per round: one join (edges ⋈ labels, shuffle keyed on vertex id)
  + one min-aggregate — both partial-aggregated map-side. Label
  propagation is how GraphX/Pregel implement CC; this is the same
  dataflow expressed as DataFrame ops.
- labels are persisted per round (via tracked_persist) so the plan
  stays k-deep, not exponential; at production scale each round
  would checkpoint to break lineage.
- pure integer arithmetic end-to-end — engine-portable, no float
  drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lol_data_pipeline_spark.caching import tracked_persist


def connected_components(
    pairs: DataFrame, iters: int = 4, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """(vertex, component) for every vertex in ``pairs``, where
    component = min vertex id reachable within ``iters`` hops (= the
    true component minimum once iters ≥ component diameter)."""
    edges = tracked_persist(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
    )
    labels = edges.select(F.col("src").alias("v")).distinct().withColumn(
        "label", F.col("v")
    )
    for _ in range(iters):
        nbr_min = (
            edges.join(labels, edges.src == labels.v)
            .groupBy(F.col("dst").alias("nv"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = tracked_persist(
            labels.join(nbr_min, labels.v == F.col("nv"), "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
    return labels.select(
        F.col("v").alias("doc_id"), F.col("label").alias("component")
    )


def dedup_groups(pairs: DataFrame, iters: int = 4) -> DataFrame:
    """Components + the keep/drop verdict: one row per duplicate-group
    member, its canonical (minimum-id) representative, and group
    size — the actionable dedup output."""
    cc = connected_components(pairs, iters)
    sizes = cc.groupBy("component").agg(F.count("*").cast("long").alias("group_size"))
    return (
        cc.join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            F.col("component").alias("keep_id"),
            "group_size",
            (F.col("doc_id") != F.col("component")).alias("drop"),
        )
    )
