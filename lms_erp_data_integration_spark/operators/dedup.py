"""Deduplication operators for LLM-data pipelines (SURVEY.md M7):
exact, MinHash+LSH, SimHash, and exact n-gram Jaccard.

Scale design (the 100 TB story):

- *exact*: one hash-groupBy over ``md5(text)`` — a single shuffle on a
  short key; map-side partial aggregation collapses copies early.
- *MinHash+LSH*: per-doc signatures are a narrow map; banding turns the
  quadratic all-pairs problem into an equi-join on (band, band-key) —
  only docs sharing a band collide, so the shuffle is proportional to
  candidate pairs, not n^2. Exact-Jaccard verification then runs only
  on candidates.
- *SimHash*: 60-bit signatures via md5, then candidate pairing by exact
  signature-prefix blocks (or, small-n, all-pairs) + Hamming filter.
- *n-gram Jaccard*: exact baseline — the inverted-index join
  (shingle -> docs) with a hot-shingle guard; quadratic only within a
  shingle's posting list. Used as ground truth for the LSH paths.

Hash family: ``h_i(s) = int64(md5(i || ':' || s)[:15])`` — deterministic
and exactly reproducible in DuckDB (``('0x' || substr(md5(...), 1, 15))
::BIGINT``), so the oracles replicate the *entire* pipeline including
LSH's own false negatives; correctness checks are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_shingles


def _md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (15 hex chars)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate groups: (text_hash, keeper_id, n_copies>1).
    Keeper = min id (deterministic survivor policy)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
    )


def minhash_signatures(
    shingled: DataFrame, num_hashes: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, seed, minhash) — min over shingles of the seeded md5 hash.

    The seed explosion is a cheap row multiplier (num_hashes is small);
    the heavy reduction is the min-aggregate, which combines map-side.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        shingled.select(F.col(id_col), F.col("shingle"), seeds)
        .select(
            id_col,
            "seed",
            _md5_int(
                F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int, rows_per_band: int, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature matrix and emit distinct candidate (i, j) pairs
    (i < j) that agree on at least one full band."""
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.struct("seed", "minhash"))).minhash
            ).alias("band_key")
        )
    )
    left = banded.select(
        F.col(id_col).alias("i"), F.col("band"), F.col("band_key")
    )
    right = banded.select(
        F.col(id_col).alias("j"), F.col("band"), F.col("band_key")
    )
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
    )


def jaccard_on_pairs(
    shingled: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for the given (i, j) pairs via shingle-set joins."""
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    si = shingled.select(F.col(id_col).alias("i"), "shingle")
    sj = shingled.select(F.col(id_col).alias("j"), "shingle")
    inter = (
        pairs.join(si, "i")
        .join(sj, ["j", "shingle"])
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("i"), F.col("n").alias("ni")), "i")
        .join(sizes.select(F.col(id_col).alias("j"), F.col("n").alias("nj")), "j")
        .select(
            "i",
            "j",
            (
                F.col("inter") / (F.col("ni") + F.col("nj") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    b=8, r=2: P(candidate | J=0.9) ~ 1 - (1-0.81)^8 > 0.99999;
    false positives are removed by the verify join.
    """
    rows_per_band = num_hashes // bands
    shingled = word_shingles(df, id_col, text_col, n=shingle_n)
    sigs = minhash_signatures(shingled, num_hashes, id_col)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band, id_col)
    return jaccard_on_pairs(shingled, cands, id_col).where(
        F.col("jaccard") >= threshold
    )


def ngram_jaccard_duplicates(
    df: DataFrame,
    threshold: float = 0.8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via inverted-index self-join —
    the ground-truth baseline for the LSH path."""
    shingled = word_shingles(df, id_col, text_col, n=shingle_n)
    pairs = (
        shingled.select(F.col(id_col).alias("i"), "shingle")
        .join(shingled.select(F.col(id_col).alias("j"), "shingle"), "shingle")
        .where(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
    )
    return jaccard_on_pairs(shingled, pairs, id_col).where(
        F.col("jaccard") >= threshold
    )


def simhash_signatures(
    df: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash over whitespace tokens: for each bit, sum +1/-1 votes of
    each token's md5-derived bit; the sign forms the signature bit.
    Token multiplicity counts (a repeated token votes repeatedly).

    Tokens are hashed ONCE into an array column; the per-bit votes then
    fold over that array — one md5 per token, not per (token, bit)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hashed = df.select(
        F.col(id_col), F.transform(toks, lambda t: _md5_int(t)).alias("hs")
    )

    def bit_vote(i: int) -> Column:
        votes = F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i)) > 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        return F.when(votes > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + bit_vote(i)
    return hashed.select(F.col(id_col), sig.alias("sig"))


def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: signature + all-pairs Hamming filter
    (block on signature prefix at scale; exact all-pairs here keeps the
    oracle twin simple)."""
    sigs = simhash_signatures(df, bits, id_col, text_col)
    left = sigs.select(F.col(id_col).alias("i"), F.col("sig").alias("sig_i"))
    right = sigs.select(F.col(id_col).alias("j"), F.col("sig").alias("sig_j"))
    return (
        left.crossJoin(right)
        .where(F.col("i") < F.col("j"))
        .withColumn(
            "hamming", F.bit_count(F.expr("sig_i ^ sig_j"))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
    )
