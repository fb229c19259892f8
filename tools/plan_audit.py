"""Plan audit: sweep every registered query's physical plan for
scale red flags.

Usage: python tools/plan_audit.py [sf_dir]

Flags raised per query:
- CARTESIAN      CartesianProduct / BroadcastNestedLoopJoin outside the
                 pairwise-similarity family (where cross-scoring is the
                 operator's semantics)
- NO_PUSHDOWN    a parquet scan whose PushedFilters is empty while the
                 plan contains a Filter (possible missed pushdown)
- WIDE_SCAN      a scan reading >12 columns (possible missed pruning)
- PY_ROW_UDF     row-at-a-time BatchEvalPython in the plan (pandas /
                 Arrow paths show ArrowEvalPython / MapInPandas instead)
- GLOBAL_WINDOW  an unpartitioned Window node (moves ALL input rows to
                 one partition — the single-task-sort scale-killer)
                 outside the bounded-input allowlist

Exit code 1 if any unexpected flag fires — usable as a CI gate.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lol_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from lol_data_pipeline_spark.session import get_spark  # noqa: E402

# cross-scoring is the semantics of these: queries × corpus / planes /
# centroids, always with a broadcast build side
CROSS_OK = {
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_sq_topk",
    "ann_pq_topk",
    "dedup_embedding_cosine",
    "rel_q22_idle_wealthy_customers",  # scalar-subquery broadcast (1 row)
    "rel_q11_important_parts",  # global-total scalar broadcast (1 row)
    "text_search_bm25",  # scalar broadcast (1 row) + k×k rank derivation
    "text_ngram_topk",  # global_topk_ranked: k×k broadcast rank (k=20)
    "stat_histogram_prices",  # global min/max scalar broadcast (1 row)
    "graph_pagerank",  # node-count scalar broadcast (1 row)
    "sketch_kmv_setops",  # exact-union scalar broadcast (1 row)
    "sketch_quantile_hist",  # 1-row bounds broadcast + 3 quantiles x 64 bins
    "emb_knn_graph",  # LSH plane assignment: n_planes-row broadcast cross join
    "rel_gap_fill_locf",  # spine = types x 1-row min/max bounds broadcast
    "text_tfidf_topterms",  # corpus doc-count scalar broadcast (1 row)
    "ann_range_search",  # broadcast query set vs corpus (brute-force baseline)
    "stat_ks_drift",  # global min/max scalar broadcast (1 row) + 20-row grid
    "stat_psi_drift",  # same 1-row bounds broadcast + 20-bin grid as ks
    "ann_recall_eval",  # inherits cosine_topk's broadcast query-set nested loop
    "rel_bloom_prejoin",  # 1-row bloom bitmask broadcast onto the fact scan
    "text_unigram_loglik",  # corpus token-total scalar broadcast (1 row)
    "stat_cusum_changepoint",  # three 1-row scalar broadcasts (totals, max, peak day)
    "rel_skyline_parts",  # 1-row bounds broadcast, 32x32 band prefix join,
    # and frontier-candidates x candidates dominance anti-join — all
    # bounded by construction (band count / staircase size), never data x data
}
# global windows whose input is bounded by construction (state-sized,
# not data-sized) — the only shapes where a single partition is fine
GLOBAL_WINDOW_OK = {
    "sketch_kmv_setops",  # window over k=64 sketch rows
    "sketch_quantile_hist",  # running sum over 64 fixed bins
    "stat_cusum_changepoint",  # running sum over the DAY-grain series —
    # bounded by the calendar (36.5k rows/century), never by event volume
}
# streaming plans materialize through a memory sink; their batch-side
# plan is not what executes
SKIP = {name for name in REGISTRY if name.startswith("stream_")}


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan line (bracket-depth scan;
    window exprs contain parens but square brackets never nest in
    plan text)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1 : i])
    return groups


def has_global_window(plan: str) -> bool:
    """True if any Window/WindowGroupLimit node lacks a partition
    spec (= Spark's 'Moving all data to a single partition' warning).

    Plan-text shapes:
    - ``Window [exprs], [part], [order]``  → partitioned, ok
    - ``Window [exprs], [part]``           → partition-only, ok
    - ``Window [exprs], [order]``          → GLOBAL (order specs are
      recognizable by ASC/DESC NULLS markers; partition specs are
      bare attributes)

    ``WindowGroupLimit`` nodes are ignored: Spark only inserts the
    rank-filter pushdown when a partition spec exists (verified on
    4.1 — an unpartitioned row_number+filter plan carries no
    WindowGroupLimit at all), and the parent Window node is always
    present for detection anyway.
    """
    for line in plan.splitlines():
        m = re.search(r"\bWindow \[", line)
        if not m:
            continue
        groups = _bracket_groups(line[m.start() :])
        # first group is exprs; inspect the spec groups after
        specs = groups[1:]
        if not specs:
            return True  # no partition, no order — global frame
        is_order = [bool(re.search(r"(ASC|DESC) NULLS", g)) for g in specs]
        # partitioned iff some spec group is NOT an order spec
        if all(is_order):
            return True
    return False


def audit(spark, sf_dir: str) -> int:
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    bad = 0
    for name in sorted(REGISTRY):
        if name in SKIP:
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover
            print(f"ERROR {name}: {exc}")
            bad += 1
            continue
        flags = []
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) and name not in CROSS_OK:
            flags.append("CARTESIAN")
        if "Filter " in plan and re.search(r"PushedFilters: \[\],", plan):
            # scans can legitimately have no pushable predicate (e.g.
            # the filter is on a computed column) — surface for review
            flags.append("NO_PUSHDOWN?")
        for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
            if schema.count(":") > 12:
                flags.append("WIDE_SCAN")
                break
        if "BatchEvalPython" in plan:
            flags.append("PY_ROW_UDF")
        if has_global_window(plan) and name not in GLOBAL_WINDOW_OK:
            flags.append("GLOBAL_WINDOW")
        status = " ".join(flags) if flags else "ok"
        print(f"{name:36s} {status}")
        if flags and flags != ["NO_PUSHDOWN?"]:
            bad += 1
    return bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_bad = audit(get_spark("plan_audit"), sf)
    print(f"\n{n_bad} queries with unexpected plan flags")
    sys.exit(1 if n_bad else 0)
