"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard and embedding-cosine
near-dup — the standard large-corpus dedup toolbox, built Spark-first:

- exact:     one hash-groupBy (map-side combinable).
- MinHash:   shingle -> k seeded min-hashes -> band -> bucket join.
             Candidate generation never compares all pairs: documents
             meet only inside an LSH bucket, so the shuffle is keyed by
             (band, band_hash) and scales with corpus size, not its
             square.
- SimHash:   64-bit sign-of-weighted-sum signature; near-dups differ
             in few bits.  Banded the same way.
- n-gram Jaccard: exact verification on candidate pairs only.
- embedding: cosine near-dup via random-hyperplane LSH over an
             embedding column (see functions/similarity.py for ANN).

All hashing is seeded/deterministic — reruns produce identical
clusters (required for reproducible data recipes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_spark.functions.text import normalize_text, tokens


# ---------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per exact normalized text.
    Single hash aggregation on a 64-bit digest — no text shuffled."""
    h = F.xxhash64(normalize_text(text_col)).alias("_h")
    keep = (
        docs.select(F.col(id_col), h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of identical documents: (hash, ids, size) with size > 1."""
    return (
        docs.select(F.col(id_col), F.xxhash64(normalize_text(text_col)).alias("hash"))
        .groupBy("hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count("*").alias("size"))
        .filter(F.col("size") > 1)
    )


# -------------------------------------------------------------- shingles

def shingles(text_col: str | Column = "text", n: int = 3) -> Column:
    """Word n-gram shingle array (distinct)."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


# --------------------------------------------------------------- minhash

def minhash_signature(shingle_col: Column, num_hashes: int = 128) -> Column:
    """k seeded min-hashes of the shingle set (the classic MinHash
    signature; each seed is an independent permutation approximation)."""
    sigs = [
        F.array_min(F.transform(shingle_col, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    rows/band r = num_hashes/bands; the similarity threshold is
    ~ (1/bands)^(1/r).  Output: (id_a, id_b) with id_a < id_b, distinct.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signature(shingles(text_col, shingle_n), num_hashes)
    banded = docs.select(F.col(id_col).alias("_id"), sig.alias("_sig")).select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", F.slice(F.col("_sig"), b * r + 1, r)),
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    )
    left = banded.select("bb", F.col("_id").alias("id_a"))
    right = banded.select("bb", F.col("_id").alias("id_b"))
    return (
        left.join(right, "bb")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (verification stage).
    Joins shingle sets to both sides of the pair list — candidates only,
    never all pairs."""
    sh = docs.select(F.col(id_col).alias("_id"), shingles(text_col, shingle_n).alias("_sh"))
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("_sh_a", "_sh_b"))
                / F.greatest(F.size(F.array_union("_sh_a", "_sh_b")), F.lit(1))
            ).alias("jaccard"),
        )
    )


def minhash_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dedup: LSH candidates -> exact Jaccard >= t ->
    drop the larger id of each dup pair (greedy representative-keeps-
    min-id; one connected-component hop, sufficient for near-dup
    clusters where every member pairs with the representative)."""
    cand = minhash_candidates(
        docs, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
    )
    dup = jaccard_pairs(docs, cand, id_col=id_col, text_col=text_col, shingle_n=shingle_n)
    drop = (
        dup.filter(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return docs.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------- simhash

def _bit_lit(b: int) -> Column:
    """Long literal with bit b set (two's complement for bit 63 —
    1 << 63 is not a valid signed-long literal)."""
    v = 1 << b
    if v >= 1 << 63:
        v -= 1 << 64
    return F.lit(v).cast("long")


def simhash(text_col: str | Column = "text", bits: int = 64) -> Column:
    """SimHash signature: sign of the per-bit weighted sum of token
    hashes.  Expressed as pure array exprs (no Python in the loop):
    for each bit b, sum over tokens of (+1 if hash bit set else -1)."""
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_sum(b):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(_bit_lit(b)) != 0, 1).otherwise(-1),
        )
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(
            F.when(bit_sum(b) > 0, _bit_lit(b)).otherwise(F.lit(0).cast("long"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of xor)."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)


def simhash_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidates by SimHash banding (pigeonhole: two sigs
    within ``max_hamming`` bits share at least one of ``bands`` equal
    16-bit blocks when bands > max_hamming), verified by exact Hamming."""
    width = 64 // bands
    sig = docs.select(F.col(id_col).alias("_id"), simhash(text_col).alias("_sig"))
    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("_sig"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    )
    a = banded.select("bb", F.col("_id").alias("id_a"), F.col("_sig").alias("_sig_a"))
    b = banded.select("bb", F.col("_id").alias("id_b"), F.col("_sig").alias("_sig_b"))
    return (
        a.join(b, "bb")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("_sig_a"), F.col("_sig_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------- embedding cosine

def embedding_near_dups(
    vecs: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs: random-hyperplane LSH bucket join,
    then exact cosine within buckets.  See similarity.hyperplane_sig."""
    from hbase_spark.functions.similarity import cosine, hyperplane_sig

    dim = len(vecs.select(vec_col).first()[0])
    sig = hyperplane_sig(F.col(vec_col), dim=dim, planes=planes, seed=seed)
    s = vecs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig.alias("_sig"))
    a = s.select(F.col("_sig").alias("sig"), F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = s.select(F.col("_sig").alias("sig"), F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
