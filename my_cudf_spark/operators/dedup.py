"""Deduplication operators for training-data pipelines (north star;
reference surface: nvtext minhash.hpp:72-213, jaccard.hpp:73,
stream_compaction distinct).

Three tiers, all shuffle-bounded and collect-free:

- ``exact_dedup``        : hash-groupBy on a content key. One shuffle.
- ``neardup_pairs_exact``: EXACT n-gram Jaccard pairs via inverted-index
  join (explode grams → self-join on gram → count shared grams). Exact for
  any jaccard>0 threshold; cost ∝ Σ posting-list². The oracle-checkable
  path.
- ``minhash_lsh_pairs``  : the 100 TB path — fixed-size minhash signature,
  banding, bucket join. Probabilistic (tunable band/row tradeoff);
  candidates are verified with exact jaccard so false positives never
  escape; false-negative rate is the standard 1-(1-s^r)^b curve.
- ``simhash_pairs``      : hamming-distance candidates via simhash band
  join (near-dup for token-multiset similarity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_cudf_spark.functions import text as T

__all__ = [
    "exact_dedup",
    "neardup_pairs_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
]


def exact_dedup(df: DataFrame, id_col: str, content: Column) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with the
    canonical (min) id and the duplicate count."""
    return (
        df.select(F.col(id_col), F.sha2(content, 256).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _gram_sets(df: DataFrame, id_col: str, grams: Column) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), F.array_distinct(grams).alias("grams"))


def neardup_pairs_exact(
    df: DataFrame,
    id_col: str,
    grams: Column,
    threshold: float,
) -> DataFrame:
    """All pairs with set-Jaccard(grams) ≥ threshold, exactly.

    Inverted-index join: explode distinct grams, self-join postings on the
    gram, count co-occurrences = |A∩B|, then |A∪B| = |A|+|B|-|A∩B|.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sets = _gram_sets(df, id_col, grams).withColumn("n", F.size("grams"))
    postings = sets.select("id", "n", F.explode("grams").alias("g"))
    a = postings.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), "g")
    b = postings.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), "g")
    pairs = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    grams: Column,
    threshold: float,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding, verified with
    exact jaccard (minhash.hpp:72-213 + the standard banding construction).

    num_hashes/bands set the S-curve: bands=16 × rows=4 targets τ≈0.5.
    Signature is fixed-size regardless of document length → the shuffle
    volume is O(docs × num_hashes), independent of text size.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    sets = _gram_sets(df, id_col, grams)
    sig = sets.withColumn("sig", T.minhash_signature(F.col("grams"), num_hashes))
    banded = sig.select(
        "id",
        "grams",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.array_join(F.transform(
                        F.slice("sig", i * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ), ","))
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.select(F.col("id").alias("id_a"), F.col("grams").alias("g_a"), "band_idx", "band_hash")
    right = banded.select(F.col("id").alias("id_b"), F.col("grams").alias("g_b"), "band_idx", "band_hash")
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "g_a", "g_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", T.jaccard(F.col("g_a"), F.col("g_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit signature into max_hamming+1
    bands — any pair within distance max_hamming shares at least one exact
    band (pigeonhole) → equi-join per band, then exact popcount filter.
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    sig = df.select(F.col(id_col).alias("id"), T.simhash64(tokens).alias("sh"))
    banded = sig.select(
        "id",
        "sh",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("sh"), i * width).bitwiseAND(F.lit((1 << width) - 1))
                for i in range(nbands)
            ])
        ).alias("band_idx", "band_val"),
    )
    l = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band_idx", "band_val")
    r = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band_idx", "band_val")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
