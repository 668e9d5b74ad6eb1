"""Differential tests: probabilistic dedup paths vs the exact path.

The exact inverted-index Jaccard pairs are oracle-checked in test_oracle;
here MinHash-LSH (the scale path) is held to: no false positives (verified
candidates) and high recall on the fixture's near-dup clusters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.functions import text as T
from my_cudf_spark.operators import dedup as D
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def _trigrams():
    return T.word_ngrams(F.split(T.normalize_text("text"), " "), 3)


def test_minhash_lsh_matches_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.neardup_pairs_exact(docs, "doc_id", _trigrams(), 0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(docs, "doc_id", _trigrams(), 0.5, num_hashes=64, bands=16).collect()
    }
    # verified candidates → every LSH pair is a true pair
    assert lsh <= exact
    # banding S-curve at j≥0.7 (the fixture's dup clusters) ⇒ high recall
    assert len(lsh) >= 0.85 * len(exact), (len(lsh), len(exact))


def test_simhash_pairs_sane(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = D.simhash_pairs(docs, "doc_id", F.split(T.normalize_text("text"), " "), max_hamming=3)
    rows = pairs.collect()
    # hamming bound respected and symmetric-free (a<b)
    assert all(0 <= r["hamming"] <= 3 and r["id_a"] < r["id_b"] for r in rows)
    # near-dup clusters exist in the fixture → simhash should find some
    assert len(rows) > 0


def test_exact_dedup_partitions_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = D.exact_dedup(docs, "doc_id", F.col("text")).collect()
    assert sum(r["dup_count"] for r in out) == docs.count()
    # fixture texts are globally unique → every group is a singleton
    assert all(r["dup_count"] == 1 for r in out)


def test_incremental_dedup_null_content_contract(spark):
    """Pinned NULL semantics (documented in incremental_dedup): NULL
    content never matches corpus keys (always novel), and forms ONE
    keep-first group within the batch."""
    from pyspark.sql import functions as F

    from my_cudf_spark.operators.dedup import incremental_dedup

    batch = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "y")], "id int, txt string"
    )
    corpus = spark.createDataFrame([(0, None), (9, "x")], "id int, txt string")
    got = sorted(
        r["id"]
        for r in incremental_dedup(
            batch, corpus, "id", F.col("txt"), F.col("txt")
        ).collect()
    )
    # id=1: first NULL row (novel despite corpus NULL); id=2 deduped within
    # batch; id=3 dropped (corpus has 'x'); id=4 novel.
    assert got == [1, 4]
