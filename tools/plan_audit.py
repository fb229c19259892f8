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
- SINGLE_PARTITION  an `Exchange SinglePartition` (or `Coalesce 1`)
                 NOT fed by a partial aggregate / limit — i.e. one
                 task receives data-sized input, not one-row-per-
                 partition input. Scalar aggregates are fine (their
                 single-partition exchange carries one partial row
                 per upstream partition); a global sort or global
                 window funneling raw rows is not.
- BROADCAST_UNBOUNDED  a BroadcastExchange whose build subtree has no
                 aggregate, no limit, no non-trivial filter, and
                 scans a table that SCALES with data volume (anything
                 but nation=25 / region=5 rows, which are fixed at
                 every SF). A forced broadcast of an SF-scaling table
                 works at sf0.1 and OOMs the driver at 100 TB; such
                 joins must be threshold-decided, not hinted.

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
    "ann_filtered_topk",  # 5 queries broadcast x pre-filtered corpus
    "ann_filtered_ivf_topk",  # centroid + query broadcasts; cell-probe joins
    "ann_filtered_ivf_multiprobe",  # same geometry: 8-row centroid
    # broadcast for assignment + Q x nprobe probe-row broadcast join
    "rel_q22_idle_wealthy_customers",  # scalar-subquery broadcast (1 row)
    "rel_q11_important_parts",  # global-total scalar broadcast (1 row)
    "text_search_bm25",  # scalar broadcast (1 row) + k×k rank derivation
    "text_ngram_topk",  # global_topk_ranked: k×k broadcast rank (k=20)
    "stat_histogram_prices",  # global min/max scalar broadcast (1 row)
    "graph_pagerank",  # node-count scalar broadcast (1 row)
    "ann_hybrid_rerank",  # query-embedding scalar broadcast (1 row)
    "stat_acf_daily",  # n/S scalar broadcast (1 row) + 7-lag fan-out over
    # the calendar-bounded day series
    "sketch_kmv_setops",  # exact-union scalar broadcast (1 row)
    "sketch_quantile_hist",  # 1-row bounds broadcast + 3 quantiles x 64 bins
    "emb_knn_graph",  # LSH plane assignment: n_planes-row broadcast cross join
    "rel_gap_fill_locf",  # spine = types x 1-row min/max bounds broadcast
    "text_tfidf_topterms",  # corpus doc-count scalar broadcast (1 row)
    "ann_range_search",  # broadcast query set vs corpus (brute-force baseline)
    "ann_graph_beam_topk",  # constant-20 queries x 4 entry nodes seed
    # cross join + broadcast Qxbeam frontier joins (all bounded)
    "ann_mmr_rerank",  # constant-20 query broadcast vs corpus for the
    # bounded relevance pool (ann_cosine_topk geometry) + Qxpool rounds
    "stat_ks_drift",  # global min/max scalar broadcast (1 row) + 20-row grid
    "stat_psi_drift",  # same 1-row bounds broadcast + 20-bin grid as ks
    "ann_recall_eval",  # inherits cosine_topk's broadcast query-set nested loop
    "ann_served_recall_eval",  # same exact-side geometry (20-query broadcast
    # NLJ vs corpus for ground truth) + a 3-row nprobe-literal crossJoin;
    # the served side itself is equi-join only
    "ann_graph_recall_eval",  # same exact-side geometry (cosine_topk ground
    # truth); the beam side is equi-join only
    "ann_index_stats",  # 1-row scalar total crossJoined for the fraction —
    # the rel_q22 scalar-subquery-broadcast class
    "rel_bloom_prejoin",  # 1-row bloom bitmask broadcast onto the fact scan
    "text_unigram_loglik",  # corpus token-total scalar broadcast (1 row)
    "stat_cusum_changepoint",  # three 1-row scalar broadcasts (totals, max, peak day)
    "corpus_quality_adaptive",  # 1-row percentile-cutoff broadcast onto scores
    "rel_skyline_parts",  # 1-row bounds broadcast, 32x32 band prefix join,
    # and frontier-candidates x candidates dominance anti-join — all
    # bounded by construction (band count / staircase size), never data x data
    "ann_ivfpq_topk",  # 8-row coarse-centroid broadcast for assignment +
    # Q x nprobe probe-row broadcast join (same geometry as the
    # filtered-IVF family; PQ encode itself is a pure projection)
    "ann_ivfpq_residual_topk",  # same geometry + an 8-row centroid
    # ride-along broadcast for the residual computation
    "text_bm25_served",  # k×k broadcast rank derivation over the
    # served top-k (global_topk_ranked) — text_search_bm25's class
    "bm25_index_upsert",  # same serve-path k×k rank derivation after
    # maintenance (the upsert itself is equi-join + partition rewrite)
    "bm25_index_delete",  # same serve-path k×k rank derivation
    "bm25_index_stats",  # 1-row aggregate crossJoins composing the
    # single stats row — the ann_index_stats scalar-broadcast class
    "text_bm25_prf_served",  # two serve probes (each the k×k rank
    # derivation over bounded top-k) — feedback/expansion collects are
    # bounded at FB ids / E terms by construction
    "ann_pca_recall_eval",  # exact-side ground truth is the cosine_topk
    # broadcast query-set NLJ (the ann_recall_eval class); the pca side
    # is the already-allowlisted bounded geometry
    "ann_pca_topk",  # queries-broadcast NLJ vs the reduced-dim corpus
    # projection (the ann_cosine_topk class; candidates bounded at
    # refine*k per query before the full-precision rescore join)
    "retrieval_rrf3_served",  # three bounded legs: the lexical/vector
    # geometries of retrieval_rrf_served plus the beam's 1-query x
    # 4-entry-node seed cross join (the ann_graph_beam_topk class);
    # fusion joins <=50 rows and ranks via the k x k broadcast
    "retrieval_rrf_served",  # both legs end in bounded top-k rank
    # derivations (≤NL lexical + ≤NV vector rows); the fusion joins
    # two ≤20-row sets and ranks ≤40 fused rows (k×k broadcast)
    "corpus_mixture_temperature",  # two 1-row scalar totals (token
    # mass, quantized-weight mass) crossJoined over the ≤|sources|
    # per-domain frame — the ann_index_stats scalar-broadcast class
    "corpus_mixture_shard_plan",  # same scalar-broadcast class: the
    # 1-row leftover total crossJoined over the allocation frame
    "dq_model_score_drift",  # two 1-row cohort totals crossJoined
    # over the fixed 8-bin spine — the ann_index_stats scalar class
    "ann_index_rebuild_decision",  # 1-row total/quota broadcast over
    # the ≤k per-cell counts — the ann_index_stats scalar class
    "ann_index_autosize",  # 1-row corpus-count broadcast over the
    # 5-row scale ladder + a ≤5×32 exponent theta-grid — every input
    # bounded by construction, nothing data-sized past the count
    "corpus_dsir_select",  # 1-row corpus/target token totals
    # crossJoined over the bounded B=256 bucket spine — the
    # dq_model_score_drift scalar-broadcast class
    "corpus_dsir_sample",  # same 1-row totals broadcast as
    # corpus_dsir_select; the Gumbel draw adds no join shape
}
# global windows whose input is bounded by construction (state-sized,
# not data-sized) — the only shapes where a single partition is fine
GLOBAL_WINDOW_OK = {
    "sketch_kmv_setops",  # window over k=64 sketch rows
    "sketch_quantile_hist",  # running sum over 64 fixed bins
    "stat_cusum_changepoint",  # running sum over the DAY-grain series —
    # bounded by the calendar (36.5k rows/century), never by event volume
    "corpus_quality_adaptive",  # running sum over the score histogram —
    # bounded by the integer score domain (≤10001 rows at any data size)
    "ann_hybrid_rerank",  # rank windows over the BM25 candidate set —
    # bounded at 50 rows by the lexical top-k, never by corpus size
    "stat_acf_daily",  # rank window over the DAY-grain series —
    # calendar-bounded (36.5k rows/century), like stat_cusum_changepoint
    "corpus_mixture_shard_plan",  # remainder-rank window over the
    # per-source allocation frame — bounded by the source domain
    # (≤|sources| rows), never by corpus size
}
# streaming plans materialize through a memory sink; their batch-side
# plan is not what executes
SKIP = {name for name in REGISTRY if name.startswith("stream_")}

# single-partition exchanges whose input is bounded by construction —
# same rationale (and mostly the same members) as GLOBAL_WINDOW_OK
SINGLE_PARTITION_OK = {
    "sketch_kmv_setops",  # 64-row sketch union
    "sketch_quantile_hist",  # 64 fixed bins
    "stat_cusum_changepoint",  # day-grain series, calendar-bounded
    "corpus_quality_adaptive",  # score histogram, ≤10001 rows by domain
    "ann_hybrid_rerank",  # ≤50 BM25 candidates by construction
    "stat_acf_daily",  # day-grain series, calendar-bounded
    "corpus_mixture_shard_plan",  # ≤|sources| allocation rows
}

# tables whose cardinality does NOT scale with data volume (TPC-H:
# nation is fixed at 25 rows, region at 5, at every scale factor) —
# the only parquet tables a forced broadcast may scan unfiltered.
# Keyed by the table's LEADING column as it appears in Relation
# nodes of the optimized logical plan (full name, not a prefix —
# a future table whose first column merely starts with n_/r_ must
# NOT slip past the BROADCAST_UNBOUNDED check).
FIXED_CARDINALITY_LEAD_COLS = {"n_nationkey", "r_regionkey"}

# forced broadcasts of bounded-by-construction build sides that the
# textual heuristic can't see through (each verified by reading the
# plan: the build side is k rows / scalar / delta-sized, not data-sized)
BROADCAST_OK = set()


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


def _node_depth(line: str) -> int:
    """Character offset where a plan-tree line's node text begins
    (past the ``+- `` / ``:- `` / ``:  `` drawing prefix); children
    sit at strictly greater depth."""
    m = re.match(r"^[\s:+\-]*", line)
    return m.end()


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines of the subtree rooted at ``lines[i]`` (descendants only)."""
    d = _node_depth(lines[i])
    out = []
    for j in range(i + 1, len(lines)):
        if not lines[j].strip() or _node_depth(lines[j]) <= d:
            break
        out.append(lines[j])
    return out


def has_bad_single_partition(plan: str) -> bool:
    """True if an ``Exchange SinglePartition`` funnels DATA-sized
    input into one task. Fine: the exchange under a scalar aggregate
    (child is a partial aggregate — one row per upstream partition)
    or under a limit (child is LocalLimit/CollectLimit — k rows per
    partition). Bad: anything else (global sort/window over raw
    rows). ``Coalesce 1`` is always bad — it doesn't even shuffle, it
    serializes the whole upstream onto one task."""
    if re.search(r"\bCoalesce 1\b", plan):
        return True
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        sub = _subtree(lines, i)
        child = sub[0] if sub else ""
        if re.search(r"\bpartial_", child):
            continue  # final scalar agg over per-partition partials
        if "LocalLimit" in child or "CollectLimit" in child or "TakeOrdered" in child:
            continue  # k-bounded per partition
        return True
    return False


def _children(lines: list[str], i: int) -> list[list[str]]:
    """Direct child subtrees (as line blocks) of the node at lines[i]."""
    d = _node_depth(lines[i])
    sub = []
    for j in range(i + 1, len(lines)):
        if not lines[j].strip() or _node_depth(lines[j]) <= d:
            break
        sub.append(j)
    if not sub:
        return []
    dmin = min(_node_depth(lines[j]) for j in sub)
    starts = [j for j in sub if _node_depth(lines[j]) == dmin]
    blocks = []
    for k, sj in enumerate(starts):
        ej = starts[k + 1] if k + 1 < len(starts) else sub[-1] + 1
        blocks.append(lines[sj:ej])
    return blocks


def has_unbounded_broadcast(logical_plan: str) -> bool:
    """True if a broadcast HINT (``F.broadcast`` / ``/*+ BROADCAST */``
    in the optimized logical plan — ``leftHint=/rightHint=(strategy=
    broadcast)`` on a Join node) commits a DATA-SIZED build side.

    Only hints are audited: an unhinted join below
    ``autoBroadcastJoinThreshold`` broadcasts today and re-decides
    itself into a shuffle join at 100 TB; a hint is a hard design
    commitment that OOMs the executors instead. A hinted side is
    bounded if its subtree aggregates, limits, or filters beyond
    isnotnull, or only touches fixed-cardinality inputs: nation (25
    rows at every SF, lead column ``n_nationkey``), region (5
    rows, ``r_regionkey``),
    LocalRelation / OneRowRelation literals, or ``Range`` (driven by
    literal args, not data)."""
    lines = logical_plan.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r"\bJoin\b.*?(left|right)?Hint=\(strategy=broadcast", line)
        if not m:
            continue
        kids = _children(lines, i)
        if len(kids) != 2:
            continue
        sides = []
        if "leftHint=(strategy=broadcast" in line:
            sides.append(kids[0])
        if "rightHint=(strategy=broadcast" in line:
            sides.append(kids[1])
        for block in sides:
            text = "\n".join(block)
            if re.search(r"\bAggregate\b|\bGlobalLimit\b|\bLocalLimit\b|\bDeduplicate\b", text):
                continue
            conds = " ".join(re.findall(r"\bFilter (.*)", text))
            if re.sub(r"\b(?:isnotnull)\([^)]*\)|AND|\s|\(|\)", "", conds):
                continue  # a real predicate bounds the side
            scales = False
            for cols in re.findall(r"\bRelation \[([^\]]*)\]", text):
                # strip the expr-id suffix (n_nationkey#123L -> n_nationkey)
                first = cols.split(",")[0].split("#")[0].strip()
                if first not in FIXED_CARDINALITY_LEAD_COLS:
                    scales = True
            if scales:
                return True
    return False


# --- source-level rule: artifact reads must declare their schema ---
# Parquet schema inference launches a footer-read job per
# spark.read.parquet call (~75 ms measured, r14) and the serve paths
# re-read their artifacts on every probe, so every HOT read goes
# through a declared-schema reader (lsm_view(schema=...),
# read_index_codes, io.load_table's memo). This rule keeps that
# structural: any NEW bare .read.parquet() in the engine package must
# either get a declared schema or be added here with a reason.
# Allowlist = "module:function" sites verified to be build-once /
# maintenance / sink-readback paths (one inference per artifact
# REWRITE or per completed stream, amortized — not per probe).
BARE_READ_OK = {
    "cli.py:main",  # CLI landing-zone count, not a query path
    "io.py:table_schema",  # the schema MEMO's cold path — inference
    # runs once per (table, file generation), then every read declares
    "io.py:compact_parquet",  # maintenance rewrite, once per compact
    "operators/lsm.py:lsm_view",  # the schema=None fallback branch;
    # every family caller passes its declared DDL
    "operators/minhash_index.py:build_minhash_index",  # build-once
    "operators/graph_index.py:build_knn_graph_index",  # build-once
    "operators/chunk_index.py:build_chunk_index",  # build-once
    "operators/chunk_index.py:build_ngram_index",  # build-once
    "operators/phash_index.py:build_phash_index",  # build-once
    "operators/text_index.py:build_bm25_index",  # build-once
    "operators/sketch_index.py:build_hll_index",  # build-once
    "operators/sketch_index.py:hll_index_upsert",  # maintenance merge
    # over the register partitions it rewrites (write-staging entry)
    "operators/sketch_index.py:hll_index_retention_drop",  # maintenance
    "operators/vector_index.py:index_compact",  # maintenance: per-cell
    # counts over the index it is about to rewrite
    "sources/evolution.py:read_events_merged",  # schema-EVOLUTION scan:
    # mergeSchema inference is the operator's semantics
    "plans/modeling.py:corpus_semdedup_probe_replay",  # standing side
    # of the stream replay entry, read once per replay
    "plans/modeling.py:stream_semdedup_probe_multibatch",  # sink readback
    "plans/round11.py:stream_minhash_probe_multibatch",  # sink readback
    "plans/round12.py:ann_index_quota_trigger",  # maintenance stats
    "plans/round12.py:ann_index_rebuild_decision",  # maintenance stats
    "plans/round12.py:stream_chunk_probe_multibatch",  # sink readback
    "plans/round12.py:sketch_hll_index_retention",  # maintenance: day
    # bounds of the register table it rewrites
    "plans/round13.py:stream_ingest_gate_multibatch",  # sink readback
    "plans/round13.py:stream_phash_probe_multibatch",  # sink readback
    "streaming/windows.py:stage_ordered_batches",  # replay staging
    "streaming/sinks.py:merge_batch",  # incremental-view state swap
    "streaming/sinks.py:incremental_view_multibatch",  # state readback
}


def audit_bare_reads(pkg_root: str | None = None) -> list[str]:
    """``module:function`` sites calling ``.read.parquet(...)`` (or
    ``.read.format/load``) WITHOUT a ``.schema(...)`` in the reader
    chain, excluding the audited allowlist. Empty list = clean."""
    import ast

    pkg_root = pkg_root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "lol_data_pipeline_spark",
    )
    hits: list[str] = []
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            fpath = os.path.join(dirpath, fname)
            rel = os.path.relpath(fpath, pkg_root)
            tree = ast.parse(open(fpath).read())
            # map each node to its enclosing function name
            func_of: dict[ast.AST, str] = {}

            def walk(node, fn):
                for child in ast.iter_child_nodes(node):
                    nfn = (
                        child.name
                        if isinstance(
                            child, (ast.FunctionDef, ast.AsyncFunctionDef)
                        )
                        else fn
                    )
                    func_of[child] = nfn
                    walk(child, nfn)

            walk(tree, "<module>")
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "parquet"
                ):
                    continue
                # walk the attribute/call chain leftward looking for
                # .read (a reader chain) and .schema(...) in between
                chain, cur, has_schema, has_read = [], node.func.value, False, False
                while True:
                    if isinstance(cur, ast.Call) and isinstance(
                        cur.func, ast.Attribute
                    ):
                        if cur.func.attr == "schema":
                            has_schema = True
                        chain.append(cur.func.attr)
                        cur = cur.func.value
                    elif isinstance(cur, ast.Attribute):
                        if cur.attr == "read":
                            has_read = True
                        chain.append(cur.attr)
                        cur = cur.value
                    else:
                        break
                if has_read and not has_schema:
                    site = f"{rel}:{func_of.get(node, '<module>')}"
                    if site not in BARE_READ_OK:
                        hits.append(site)
    return sorted(set(hits))


def audit(spark, sf_dir: str) -> int:
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    bad = 0
    for name in sorted(REGISTRY):
        if name in SKIP:
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            logical = df._jdf.queryExecution().optimizedPlan().toString()
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
        if has_bad_single_partition(plan) and name not in SINGLE_PARTITION_OK:
            flags.append("SINGLE_PARTITION")
        if has_unbounded_broadcast(logical) and name not in BROADCAST_OK:
            flags.append("BROADCAST_UNBOUNDED")
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
