"""Real BPE + WordPiece, pinned to the reference's own test vectors:
cpp/tests/text/bpe_tests.cpp:30-120 (basic / custom separator / adjacent
pairs) and the wordpiece_tokenize.hpp:71 doc examples (incl.
max_words_per_row truncation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.functions.bpe import (
    _bpe_word,
    byte_pair_encode,
    load_merge_pairs,
    load_wordpiece_vocabulary,
    wordpiece_tokenize,
)

# bpe_tests.cpp:32-45 — partial gpt2 merges table
GPT2_MERGES = [
    "e n", "i t", "i s", "e s", "en t", "c e", "es t", "en ce",
    "t h", "h i", "th is", "t est", "s i", "s ent",
]


def test_bpe_reference_basic(spark):
    # bpe_tests.cpp:52-65
    rows = [
        ("thisisit", "this is it"),
        ("thisis test-sentence-1", "this is   test - sent ence - 1"),
        ("thisistestsentence-2", "this is test sent ence - 2"),
        ("this-istestsentence 3", "this - is test sent ence   3"),
        (None, None),
        ("", ""),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string")
    got = [r["e"] for r in
           df.select(byte_pair_encode("s", GPT2_MERGES).alias("e")).collect()]
    assert got == [e for _, e in rows]


def test_bpe_reference_separator(spark):
    # bpe_tests.cpp:75-92 — "$" separator; Ġ-style byte-level prefixes
    merges = ["Ġ t", "Ġt he", "h e", "e n", "i t", "e s",
              "en t", "c e", "es t", "en ce", "t est", "s ent"]
    rows = [
        ("Ġthe test sentence", "Ġthe$ $test$ $sent$ence"),
        ("test Ġthe sentence", "test$ $Ġthe$ $sent$ence"),
        ("Ġthetest sentence", "Ġthe$test$ $sent$ence"),
        ("testĠthesentence", "test$Ġthe$sent$ence"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string")
    got = [r["e"] for r in
           df.select(byte_pair_encode("s", merges, separator="$").alias("e")).collect()]
    assert got == [e for _, e in rows]


def test_bpe_adjacent_pairs():
    # bpe_tests.cpp:96-116 — rank order decides between overlapping merges
    ranks = load_merge_pairs([
        "▁ H", "m m", "? !", "▁H mm", "mm m", "?! !",
        "? !?", "mm mm", "▁H m", "?! ?!", "?!? !",
    ])
    assert _bpe_word("▁Hmmmmm", ranks) == ["▁Hmm", "mmm"]
    assert _bpe_word("?!?!?!", ranks) == ["?!?!", "?!"]


def test_load_merge_pairs_validation():
    import pytest

    with pytest.raises(ValueError):
        load_merge_pairs([])
    with pytest.raises(ValueError):
        load_merge_pairs(["a b", "bad"])
    # earlier line wins on duplicate pairs
    assert load_merge_pairs(["a b", "a b"])[("a", "b")] == 0


WP_VOCAB = ["[UNK]", "a", "have", "I", "new", "GP", "##U", "!"]


def test_wordpiece_reference_example(spark):
    # wordpiece_tokenize.hpp:80-86: unmatched word ('now') -> [UNK] id
    df = spark.createDataFrame([("I have a new GPU now !",), (None,)], "s string")
    got = [r["t"] for r in
           df.select(wordpiece_tokenize("s", WP_VOCAB).alias("t")).collect()]
    assert got == [[3, 2, 1, 4, 5, 6, 0, 7], None]


def test_wordpiece_max_words_per_row(spark):
    # wordpiece_tokenize.hpp:92-101: double space still one word boundary
    df = spark.createDataFrame([("I have  a new GPU now !",)], "s string")
    t4 = df.select(wordpiece_tokenize("s", WP_VOCAB, max_words_per_row=4).alias("t"))
    t5 = df.select(wordpiece_tokenize("s", WP_VOCAB, max_words_per_row=5).alias("t"))
    assert t4.collect()[0]["t"] == [3, 2, 1, 4]
    assert t5.collect()[0]["t"] == [3, 2, 1, 4, 5, 6]


def test_wordpiece_no_unk_in_vocab(spark):
    # vocab without [UNK]: misses map to -1
    df = spark.createDataFrame([("zzz a",)], "s string")
    [row] = df.select(wordpiece_tokenize("s", ["a"]).alias("t")).collect()
    assert row["t"] == [-1, 0]


def test_vocab_ids_are_row_indices():
    ids = load_wordpiece_vocabulary(["x", "y", "x"])
    assert ids["x"] == 0 and ids["y"] == 1


def test_subword_windows(spark):
    # overlapping windows: 5 tokens, max=4, stride=2 -> starts 0 and 2
    from my_cudf_spark.functions.bpe import subword_tokenize

    df = spark.createDataFrame([(1, "a a a a a")], "id int, text string")
    rows = subword_tokenize(
        df, "text", ["[UNK]", "a"], ["id"], max_sequence_length=4, stride=2
    ).orderBy("seq").collect()
    assert [(r["seq"], r["start_pos"], r["stop_pos"]) for r in rows] == [(0, 0, 3), (1, 2, 4)]
    assert rows[0]["token_ids"] == [1, 1, 1, 1]
    assert rows[0]["attention_mask"] == [1, 1, 1, 1]
    assert rows[1]["token_ids"] == [1, 1, 1, 0]
    assert rows[1]["attention_mask"] == [1, 1, 1, 0]
    assert rows[1]["n_valid"] == 3


def test_subword_truncate_and_lower(spark):
    from my_cudf_spark.functions.bpe import subword_tokenize

    df = spark.createDataFrame([(1, "A a A a A")], "id int, text string")
    rows = subword_tokenize(
        df, "text", ["[UNK]", "a"], ["id"],
        max_sequence_length=4, stride=2, do_truncate=True,
    ).collect()
    assert len(rows) == 1 and rows[0]["token_ids"] == [1, 1, 1, 1]


def test_subword_oracle_mapping_matches_algorithm():
    # the literal word->ids CASE used by the text_subword oracle must agree
    # with the wordpiece algorithm
    from my_cudf_spark.functions.bpe import _wp_word, load_wordpiece_vocabulary
    from my_cudf_spark.queries.text_queries import SUBWORD_VOCAB

    ids = load_wordpiece_vocabulary(SUBWORD_VOCAB)
    for i, w in enumerate(SUBWORD_VOCAB):
        if w != "[UNK]" and not w.startswith("##"):
            assert _wp_word(w, ids, 0) == (i,)
    assert _wp_word("window", ids, 0) == (30, 31)
    assert _wp_word("merge", ids, 0) == (0,)


def test_learn_bpe_merges_tiny_corpus(spark):
    """Hand-computed 2-round BPE at word level, including the greedy
    left-to-right overlap case ('x x x' yields one merged pair + a bare x)."""
    from my_cudf_spark.functions.bpe import learn_bpe_merges
    from my_cudf_spark.operators.dedup import release_cached

    df = spark.createDataFrame(
        [("a b a b x x x",), ("a b c",)], "t string"
    )
    try:
        merges, rep = learn_bpe_merges(df, "t", num_merges=2)
        rows = [(r["merge_round"], r["pair"], r["n_occurrences"]) for r in merges.collect()]
        # round 1: pairs = {a b:3, b a:1, b x:1, x x:2, b c:1} -> 'a b' wins with 3
        assert rows[0] == (1, "a b", 3)
        # round 2 on [a@b a@b x x x], [a@b c]:
        # pairs = {a@b a@b:1, a@b x:1, x x:2, a@b c:1} -> 'x x' wins with 2
        assert rows[1] == (2, "x x", 2)
        reps = sorted(r["rep"] for r in rep.collect())
        # greedy left-to-right: x x x -> (x x) x -> x@x x
        assert reps == [" a@b  a@b  x@x  x ", " a@b  c "]
    finally:
        release_cached()


def test_learn_bpe_merges_validates_args(spark):
    from my_cudf_spark.functions.bpe import learn_bpe_merges
    import pytest

    df = spark.createDataFrame([("a b",)], "t string")
    with pytest.raises(ValueError, match="num_merges"):
        learn_bpe_merges(df, "t", num_merges=0)
    with pytest.raises(ValueError, match="sep"):
        learn_bpe_merges(df, "t", num_merges=1, sep=" ")


def test_learn_bpe_merges_exhaustion_keeps_rep(spark):
    """Rounds past pair exhaustion add no merge rows and leave the
    representation unchanged (a crossJoin against the empty winner frame
    would instead silently empty the corpus)."""
    from my_cudf_spark.functions.bpe import learn_bpe_merges

    df = spark.createDataFrame([("a b",), ("a b",)], "t string")
    merges, rep = learn_bpe_merges(df, "t", num_merges=4)
    rows = [(r["merge_round"], r["pair"], r["n_occurrences"]) for r in merges.collect()]
    assert rows == [(1, "a b", 2)]
    assert sorted(r["rep"] for r in rep.collect()) == [" a@b ", " a@b "]


def test_learn_bpe_merges_releases_its_persists(spark):
    """Lifecycle contract: the call leaves nothing in the executor cache
    but its own (tiny) localCheckpoint RDDs — per-round corpus-sized
    frames are unpersisted before returning, and the shared gram-set LRU
    in operators.dedup is untouched."""
    from my_cudf_spark.functions.bpe import learn_bpe_merges
    from my_cudf_spark.plans import pin

    sc = spark.sparkContext
    before_lru = len(pin._CACHE)
    df = spark.createDataFrame([("a b a b c d c d",)] * 5, "t string")
    merges, rep = learn_bpe_merges(df, "t", num_merges=3, checkpoint_every=2)
    persisted = {
        rid: r.name() or "" for rid, r in sc._jsc.getPersistentRDDs().items()
    }
    # Only checkpoint RDDs may remain cached (their names carry the
    # "Local Checkpoint"/checkpoint marker or back a checkpointed plan);
    # no per-round persist survives the call.
    leaked = [n for n in persisted.values() if "heckpoint" not in (n or "LocalCheckpoint")]
    assert leaked == [], persisted
    assert len(pin._CACHE) == before_lru
    # results stay correct across the cadence checkpoint
    assert merges.count() == 3
    assert rep.count() == 5
