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


def test_substring_dup_spans_planted(spark):
    """Hand-planted shared passage: docs 1 and 2 share exactly one
    15-token run (at different offsets), doc 3 shares nothing long
    enough.  Maximal span boundaries and length are exact."""
    from pyspark.sql import functions as F

    from my_cudf_spark.operators.dedup import substring_dup_spans

    shared = [f"s{i}" for i in range(15)]
    d1 = ["a1", "a2"] + shared + ["a3"]
    d2 = ["b1", "b2", "b3", "b4"] + shared + ["b5", "b6"]
    d3 = shared[:9] + ["c1", "c2"]  # only 9 shared tokens < min_len 12
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "id long, toks array<string>"
    )
    out = substring_dup_spans(df, "id", F.col("toks"), k=8, min_len=12)
    rows = [(r.id_a, r.id_b, r.pos_a, r.pos_b, r.span_len) for r in out.collect()]
    assert rows == [(1, 2, 2, 4, 15)]
    # min_len = 9 admits the doc-3 prefix overlaps too
    out9 = substring_dup_spans(df, "id", F.col("toks"), k=8, min_len=9)
    got = {(r.id_a, r.id_b): r.span_len for r in out9.collect()}
    assert got == {(1, 2): 15, (1, 3): 9, (2, 3): 9}


def test_substring_dup_spans_hot_cap(spark):
    """max_postings drops ultra-common shingles from seeding: a boilerplate
    run shared by ALL docs stops seeding when its df exceeds the cap, while
    a rare 2-doc span survives."""
    from pyspark.sql import functions as F

    from my_cudf_spark.operators.dedup import substring_dup_spans
    import pytest

    boiler = [f"b{i}" for i in range(12)]
    rare = [f"r{i}" for i in range(12)]
    rows = [(i, boiler + [f"u{i}"]) for i in range(1, 5)]  # 4 docs of boilerplate
    rows += [(10, rare + ["x"]), (11, rare + ["y"])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    full = substring_dup_spans(df, "id", F.col("toks"), k=8, min_len=12)
    assert full.count() == 6 + 1  # C(4,2) boilerplate pairs + 1 rare pair
    capped = substring_dup_spans(
        df, "id", F.col("toks"), k=8, min_len=12, max_postings=3
    )
    got = [(r.id_a, r.id_b, r.span_len) for r in capped.collect()]
    assert got == [(10, 11, 12)]
    with pytest.raises(ValueError, match="min_len"):
        substring_dup_spans(df, "id", F.col("toks"), k=8, min_len=4)


def test_remove_dup_spans_planted(spark):
    """The shared 15-token passage is cut from the HIGHER-id doc only;
    untouched docs pass through; rebuilt text preserves token order."""
    from pyspark.sql import functions as F

    from my_cudf_spark.operators.dedup import remove_dup_spans, substring_dup_spans

    shared = [f"s{i}" for i in range(15)]
    d1 = ["a1", "a2"] + shared + ["a3"]
    d2 = ["b1", "b2", "b3", "b4"] + shared + ["b5", "b6"]
    d3 = ["c1"] * 3
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "id long, toks array<string>"
    )
    spans = substring_dup_spans(df, "id", F.col("toks"), k=8, min_len=12)
    out = {r["id"]: r for r in remove_dup_spans(df, spans, "id", F.col("toks")).collect()}
    assert (out[1]["n_before"], out[1]["n_after"]) == (18, 18)  # lower id keeps all
    assert out[2]["n_after"] == 6 and out[2]["clean_text"] == "b1 b2 b3 b4 b5 b6"
    assert out[3]["n_after"] == 3 and out[3]["clean_text"] == "c1 c1 c1"


def test_bloom_contamination_superset_of_exact(spark):
    """Bloom membership has NO false negatives: every doc's Bloom overlap
    count is >= its exact overlap count, equal for most docs at the 32 Kbit
    default, and the bitmap stays within its ceil(m_bits/63)-word bound."""
    from my_cudf_spark.operators.decontam import (
        bloom_contamination,
        bloom_filter_bits,
        contamination_report,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.array_distinct(_trigrams()).alias("grams")
    ).filter(F.size("grams") > 0)
    bench_docs = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0).select(
        F.col("doc_id").alias("id"), "grams"
    )
    bench = bench_docs.select(F.explode("grams").alias("gram"))

    bits = bloom_filter_bits(bench)
    n_words = bits.count()
    assert n_words <= (32768 + 62) // 63

    exact = contamination_report(train, bench.distinct(), threshold=0.2).select(
        "id", F.col("n_overlap").alias("n_exact")
    )
    bloom = bloom_contamination(train, bits, threshold=0.2).select(
        "id", F.col("n_overlap").alias("n_bloom")
    )
    both = exact.join(bloom, "id").collect()
    assert len(both) == train.count()
    assert all(r.n_bloom >= r.n_exact for r in both)
    # False positives exist but are rare at m=32768, k=3 for this corpus.
    n_equal = sum(1 for r in both if r.n_bloom == r.n_exact)
    assert n_equal >= 0.9 * len(both)


def test_tfidf_cosine_pairs_max_df_cap(spark):
    """The max_df cap drops hot grams from postings AND norms: a
    stop-gram shared by every doc neither generates pairs on its own nor
    dilutes the norms of docs whose non-hot grams match exactly."""
    rows = []
    # docs 0..8 share hot gram "the the the" (df = 9 < nd = 10, so its
    # idf² is small but nonzero); docs 0 and 1 also share two selective
    # grams; docs 2..9 each get one unique gram.
    for i in range(10):
        grams = ["the the the"] if i < 9 else []
        if i in (0, 1):
            grams += ["alpha beta gamma", "delta eps zeta"]
        else:
            grams += [f"uniq{i} x y"]
        rows += [(i, g) for g in grams]
    df = spark.createDataFrame(rows, "id long, gram string")

    capped = D.tfidf_cosine_pairs(df, threshold=0.001, max_df=5).collect()
    # only (0, 1) can pair — the hot gram is out of the index entirely
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(0, 1)}
    # norms exclude the hot gram too: docs 0/1 agree on ALL surviving
    # grams, so the capped cosine is exactly 1
    assert abs(capped[0]["cosine"] - 1.0) < 1e-9

    uncapped = D.tfidf_cosine_pairs(df, threshold=0.001).collect()
    by_pair = {(r["id_a"], r["id_b"]) for r in uncapped}
    # without the cap the hot gram pairs every hot doc with every other:
    # C(9,2) = 36 pairs survive even a tiny threshold — the quadratic
    # blowup the cap exists to bound
    assert len(by_pair) == 36


def test_substring_self_spans_planted(spark):
    """Planted tandem repeat: a 12-token block duplicated inside one doc
    yields exactly the (0, 12, 12) span; a repeat-free doc yields none."""
    base = [f"t{i}" for i in range(12)]
    doc1 = base + base
    doc2 = [f"u{i}" for i in range(30)]
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "id long, toks array<string>"
    )
    out = D.substring_self_spans(df, "id", F.col("toks")).collect()
    got = {(r["id"], r["pos_a"], r["pos_b"], r["span_len"]) for r in out}
    assert got == {(1, 0, 12, 12)}
