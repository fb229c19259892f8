"""BPE merge training — tokenizer induction over a document corpus.

The missing third of the text-tokenization story: `text_token_bpe`
(plans/extensions.py) APPLIES a fixed regex pre-tokenizer; this module
LEARNS the merge table the way byte-pair-encoding training does —
iteratively count adjacent-symbol pairs across the corpus and merge
the most frequent pair, greedy-leftmost within each word.

Representation: each distinct word rides as a single separator-joined
string ``·h·e·l·l·o·`` (U+00B7 cannot appear in the [a-z]+ word
charset), so one literal ``replace('·l·r·' → '·lr·')`` applies a merge
corpus-wide, leftmost non-overlapping — both engines' ``replace``
scans left to right, which is what makes the DuckDB oracle reproduce
training bit-for-bit. Deviation from canonical greedy-leftmost BPE:
the replace CONSUMES the shared boundary separator, so ANY
back-to-back repetition of the merged pair skips its second
occurrence — ``·a·n·a·n·a·`` with merge (a, n) yields [an, a, n, a]
where canonical BPE gives [an, an, a]; the self-pair odd-run case
(``·a·a·a·a·`` → [aa, a, a]) is one instance, not the whole scope.
Count-neutral: the next round recounts from the actual
representation, so the skipped adjacency re-surfaces and converges
a round late (pinned in tests/test_round9_ops.py).

Scale notes (100 TB):
- the corpus is scanned ONCE (word extraction + count); every
  training round then runs on the DISTINCT-WORD table weighted by
  frequency — vocabulary-sized (Heaps' law: ~N^0.5), not
  corpus-sized, the same reduction real BPE trainers use.
- per round: one explode of per-word adjacent pairs + a map-side
  combined hash aggregate, a 1-ROW collect (the argmax pair — the
  kmeans broadcast-iterate pattern), and a pure-projection literal
  replace. Lineage stays `rounds` projections deep over the persisted
  vocab; no shuffle of anything corpus-sized after the first pass.
- determinism: ties break (count DESC, left ASC, right ASC) on ASCII
  strings — identical collation in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "·"  # '·' — outside the [a-z]+ word alphabet by construction


def corpus_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, n): distinct separator-joined lowercase words with corpus
    frequencies — the vocabulary table every training round reads."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("raw")
        )
        .filter(F.col("raw") != "")
        .groupBy("raw")
        .agg(F.count("*").alias("n"))
    )
    return words.select(
        F.concat(
            F.lit(SEP), F.regexp_replace(F.col("raw"), "(.)", "$1" + SEP)
        ).alias("w"),
        "n",
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over the
    current vocabulary representation."""
    syms = F.filter(F.split(F.col("w"), SEP), lambda x: x != F.lit(""))
    zipped = F.arrays_zip(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
    )
    return (
        words.select(F.explode(zipped).alias("z"), "n")
        .select(F.col("z")["0"].alias("l"), F.col("z")["1"].alias("r"), "n")
        .groupBy("l", "r")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, rounds: int = 3, text_col: str = "text"
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``rounds`` BPE merges; returns the ORDERED merge list
    [(round, left, right, merged, cnt)] — the driver-side literal
    form the encoder applies. Bounded driver traffic: ONE row per
    round (the argmax pair), the broadcast-iterate pattern. The one
    definition of training, shared by the merge-table entry
    (:func:`bpe_train_merges`) and the encoder
    (:func:`bpe_encode_docs`)."""
    from lol_data_pipeline_spark.caching import tracked_persist

    words = tracked_persist(corpus_words(docs, text_col))
    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(rounds):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary of 1-char words only — nothing to merge
            break
        l, r, cnt = best[0].l, best[0].r, int(best[0].cnt)
        merges.append((i, l, r, l + r, cnt))
        words = words.select(
            _apply_merge(F.col("w"), l, r).alias("w"),
            "n",
        )
    return merges


def _apply_merge(wcol, l: str, r: str):
    """ONE definition of merge application: the separator-consuming
    literal replace (see module docstring for its deviation scope),
    shared by training and encoding so the two cannot drift."""
    return F.replace(
        wcol,
        F.lit(SEP + l + SEP + r + SEP),
        F.lit(SEP + l + r + SEP),
    )


def bpe_train_merges(
    docs: DataFrame, rounds: int = 3, text_col: str = "text"
) -> DataFrame:
    """The learned merge TABLE as a DataFrame: one row per merge,
    (round, left_sym, right_sym, merged, cnt) — the artifact a
    tokenizer would persist."""
    return docs.sparkSession.createDataFrame(
        bpe_train(docs, rounds, text_col),
        "round bigint, left_sym string, right_sym string, merged string, cnt bigint",
    )


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    doc_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """APPLY a learned merge list: tokenize every document with the
    trained BPE — per-doc word extraction, separator form, the
    merges applied IN TRAINING ORDER as literal replaces (identical
    application semantics to training — :func:`_apply_merge`), then
    per-doc token accounting. Returns (doc_id, *keep_cols, n_words,
    bpe_tokens): the real token counts a packing/budgeting stage
    needs (train → encode → count, the full tokenizer lifecycle).

    Scale shape: ONE corpus scan; merge application is a pure
    projection (the merge table is driver-side literals, constant
    size); the only shuffle is the final per-doc aggregate. Docs with
    no [a-z]+ word produce no row (nothing to tokenize)."""
    wcol = F.concat(
        F.lit(SEP), F.regexp_replace(F.col("raw"), "(.)", "$1" + SEP)
    )
    for _i, l, r, _merged, _cnt in merges:
        wcol = _apply_merge(wcol, l, r)
    syms = F.filter(F.split(wcol, SEP), lambda x: x != F.lit(""))
    words = (
        docs.select(
            doc_col,
            *keep_cols,
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("raw"),
        )
        .filter(F.col("raw") != "")
        .select(doc_col, *keep_cols, F.size(syms).alias("toks"))
    )
    return words.groupBy(doc_col, *keep_cols).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("toks").cast("long").alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# The MATERIALIZED tokenizer: the ordered merge table persisted as a
# fingerprinted JSON artifact (driver-literal-sized — no parquet
# needed), so the encode path never pays the training scans. The
# served-index family's pattern (vector_index / graph_index /
# text_index / minhash_index ensure_* contract), applied to the one
# remaining per-query retraining in the registry (text_bpe_encode
# trains its merges on every run). Maintenance is re-training: BPE
# merges have no sound incremental update (an early merge decision
# can flip under new data), so staleness => rebuild, by design.
# ---------------------------------------------------------------------------

_BPE_META_NAME = "_bpe_meta.json"


def ensure_bpe_vocab(
    spark,
    sf_dir: str,
    rounds: int = 3,
    root: str | None = None,
    variant: str = "",
) -> tuple[str, dict]:
    """Build-if-absent-or-stale tokenizer artifact: the ordered merge
    list + params + source fingerprint in one JSON sidecar. Returns
    (path, meta); meta["merges"] is the same [(round, l, r, merged,
    cnt)] list bpe_train returns, JSON round-tripped."""
    import json
    import os

    from lol_data_pipeline_spark.io import load_table
    from lol_data_pipeline_spark.operators.vector_index import (
        _source_fingerprint,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    root = root or os.environ.get(
        "SPARK_GRAFT_BPE_VOCAB_DIR",
        os.path.join(repo_root, "spark-warehouse", "bpe_vocab"),
    )
    name = os.path.basename(os.path.normpath(sf_dir)) + (
        f"_{variant}" if variant else ""
    )
    path = os.path.join(root, f"bpe_{name}")
    meta_path = os.path.join(path, _BPE_META_NAME)
    want_fp = _source_fingerprint(sf_dir, table="documents")
    want_params = {"rounds": rounds}
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == want_fp and meta.get("params") == want_params:
            return path, meta
    except (OSError, ValueError):
        pass
    merges = bpe_train(load_table(spark, sf_dir, "documents"), rounds=rounds)
    meta = {
        "fingerprint": want_fp,
        "params": want_params,
        "merges": [[i, l, r, m, c] for (i, l, r, m, c) in merges],
    }
    os.makedirs(path, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return path, meta


def vocab_merges(meta: dict) -> list[tuple[int, str, str, str, int]]:
    """The artifact's merge list in bpe_train's tuple form."""
    return [
        (int(i), str(l), str(r), str(m), int(c))
        for i, l, r, m, c in meta["merges"]
    ]
