"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All four are pure DataFrame compositions (no UDFs), built on the
engine-portable md5-derived hash (functions.scalar.md5_long) so the
DuckDB oracle can reproduce signatures bit-for-bit.

Scale notes (100 TB):
- exact: one hash-aggregate shuffle on the text hash — optimal.
- jaccard all-pairs is O(n²); `ngram_jaccard_pairs` joins on shared
  shingles instead, so cost is Σ(docs-per-shingle²) — the classic
  inverted-index candidate generation. Hot shingles (stopword-only
  trigrams) are the skew risk; `max_shingle_df` drops shingles whose
  document frequency exceeds a cap, exactly what a production
  near-dup pipeline does.
- minhash_lsh: signatures shrink each doc to k longs; banding means
  candidates join on tiny (band, key) buckets. The verify step
  recomputes true Jaccard only for candidates.
- simhash: one 32-bit signature per doc; candidate pairs share at
  least one of 4 8-bit bands (Hamming ≤3 ⇒ some band equal by
  pigeonhole when distance <4), then exact Hamming filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lol_data_pipeline_spark.functions.scalar import md5_long
from lol_data_pipeline_spark.functions.text import word_shingles


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per identical text; report
    group size. One hash-aggregate; at scale, group on md5(text)
    instead of the full text to shrink shuffle width."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the inverted-index input."""
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word n-gram shingle
    sets, candidates generated via inverted-index self-join (only
    pairs sharing ≥1 shingle are ever scored)."""
    sh = doc_shingles(docs, n, text_col, id_col)
    if max_shingle_df:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


_MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _affine_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the k affine permutations
    h_i(x) = (a_i·x + b_i) mod P — the classic one-base-hash MinHash
    family (a_i odd, nonzero)."""
    params = []
    for i in range(k):
        a = ((1_103_515_245 * (i + 1) + 12_345) % _MINHASH_P) | 1
        b = (2_654_435_761 * (i + 1)) % _MINHASH_P
        params.append((a, b))
    return params


def minhash_signatures(
    docs: DataFrame, k: int = 16, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash signature per doc.

    ONE md5 per shingle (the expensive part), then k affine
    permutations of that base hash — vs k independent md5s this cuts
    the dominant cost k×. All k mins come out of a single aggregate
    pass (one shuffle). Products stay < 2^61 so ANSI-mode int64
    arithmetic cannot overflow."""
    sh = doc_shingles(docs, n, text_col, id_col).withColumn(
        "bh", F.pmod(md5_long(F.col("shingle")), F.lit(_MINHASH_P))
    )
    return sh.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("bh") * F.lit(a) + F.lit(b), F.lit(_MINHASH_P))).alias(f"h{i}")
            for i, (a, b) in enumerate(_affine_params(k))
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.

    k hashes split into ``bands`` bands of r=k/bands rows; docs
    agreeing on any full band become candidates (P[candidate] =
    1-(1-s^r)^b). Candidates are then verified with true Jaccard ≥
    threshold, so false positives are eliminated and only LSH recall
    (tunable via bands) is approximate.
    """
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(docs, k, n, text_col, id_col)
    band_rows = []
    for b in range(bands):
        key = F.concat_ws("_", *[F.col(f"h{b * r + j}").cast("string") for j in range(r)])
        band_rows.append(sigs.select("id", F.lit(b).alias("band"), key.alias("bkey")))
    buckets = band_rows[0]
    for extra in band_rows[1:]:
        buckets = buckets.unionByName(extra)
    a = buckets.alias("a")
    b2 = buckets.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Verify ONLY the candidate pairs: push the candidate set into the
    # inverted-index join instead of computing Jaccard for every
    # shingle-sharing pair — at scale candidates are a tiny fraction.
    sh = doc_shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    common = (
        cand.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash signature: bit i of the signature is 1 iff the sum of
    (+1/-1) votes (bit i of each distinct token's hash) is >= 0."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))
        ).alias("tok"),
    ).withColumn("th", md5_long(F.col("tok")))
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"v{i}") >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return votes.select("id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of 32-bit
    SimHash. Candidate generation: band the signature into
    (max_hamming+1) chunks — any pair within distance shares ≥1
    identical chunk (pigeonhole), so the join is on tiny buckets,
    never all-pairs."""
    nbands = max_hamming + 1
    width = bits // nbands
    sigs = simhash_signatures(docs, bits, text_col, id_col)
    bands = None
    for bnd in range(nbands):
        chunk = F.shiftright(F.col("simhash"), bnd * width).bitwiseAND(F.lit((1 << width) - 1))
        piece = sigs.select("id", "simhash", F.lit(bnd).alias("band"), chunk.alias("chunk"))
        bands = piece if bands is None else bands.unionByName(piece)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
