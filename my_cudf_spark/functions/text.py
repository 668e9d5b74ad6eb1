"""Text / LLM-pipeline functions — the nvtext surface (SURVEY.md §2.10;
reference ``cpp/include/nvtext/``) plus the north-star training-data ops
(language-id, quality scoring, fingerprinting).

Everything is JVM-side Column expressions (split/transform/aggregate/
xxhash64) — no Python UDFs — so the hot path stays inside whole-stage
codegen and scales linearly with executors.

Reference parity:
- tokenize/count_tokens: nvtext/tokenize.hpp:61-226
- generate_ngrams / character ngrams / hash ngrams: generate_ngrams.hpp:59-125
- minhash (LSH signatures): minhash.hpp:72-213
- jaccard_index: jaccard.hpp:73
- edit distance: edit_distance.hpp:62 → F.levenshtein (builtin)
- normalize_spaces/characters: normalize.hpp:55/216
- replace/filter tokens: replace.hpp:87/136
- BPE/subword/wordpiece: the real algorithms live in
  :mod:`my_cudf_spark.functions.bpe` (byte_pair_encoding.hpp:97,
  wordpiece_tokenize.hpp:71); ``bpe_token_count`` here remains the cheap
  JVM-side screening estimate for token budgeting.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "classifier_features",
    "classifier_logit",
    "classifier_logit_bulk",
    "dsir_log_weights",
    "tokenize",
    "character_tokenize",
    "count_tokens",
    "word_ngrams",
    "char_ngrams",
    "hash_ngrams",
    "minhash_signature",
    "simhash64",
    "jaccard",
    "normalize_text",
    "fingerprint",
    "stopword_ratio",
    "quality_score",
    "bpe_token_count",
]

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic; deterministic and SQL-replicable.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "pour", "sur"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "para", "con"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace/delimiter tokenize (tokenize.hpp:61)."""
    return F.split(F.trim(_c(col)), pattern)


def character_tokenize(col: Column | str) -> Column:
    """character_tokenize (nvtext/tokenize.hpp:187): every character —
    including spaces — becomes a token.  The reference flattens across
    rows; we keep a per-row array (explode for the flat form).  Note
    Spark's split('') yields [''] for an empty string where the reference
    yields no tokens — filter empties when exploding."""
    return F.split(_c(col), "")


def count_tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    """count_tokens (tokenize.hpp:126)."""
    return F.size(tokenize(col, pattern))


def word_ngrams(tokens: Column, n: int, sep: str = " ") -> Column:
    """generate_ngrams (generate_ngrams.hpp:59): n-grams of a token array.

    Guarded for |tokens| < n: Spark's ``sequence(1, 0)`` counts DOWN
    ([1, 0]), which would feed slice() a zero start — short arrays yield
    an empty gram list instead.  NULL input stays NULL (cudf
    generate_ngrams null semantics): a missing doc must remain
    distinguishable from a short one."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), sep),
    )
    return (
        F.when(F.size(tokens) >= n, grams)
        .when(tokens.isNotNull(), F.array().cast("array<string>"))
        .otherwise(F.lit(None).cast("array<string>"))
    )


def char_ngrams(col: Column | str, n: int) -> Column:
    """generate_character_ngrams (generate_ngrams.hpp:89).

    Same short-input guard as ``word_ngrams``: without it,
    ``sequence(1, 0)`` counts down and a too-short string yields two
    bogus partial grams instead of none.  NULL input stays NULL (cudf
    null semantics)."""
    c = _c(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: F.substring(c, i, n),
    )
    return (
        F.when(F.length(c) >= n, grams)
        .when(c.isNotNull(), F.array().cast("array<string>"))
        .otherwise(F.lit(None).cast("array<string>"))
    )


def hash_ngrams(ngrams: Column) -> Column:
    """hash_character_ngrams (generate_ngrams.hpp:125): xxhash64 per gram
    (hashing.hpp:183 — same algorithm family the reference exposes)."""
    return F.transform(ngrams, lambda g: F.xxhash64(g))


def minhash_signature(ngrams: Column, num_hashes: int) -> Column:
    """minhash/minhash64 (minhash.hpp:72-213): k independent min-hashes of
    the shingle set.  Each gram is string-hashed once, then each lane
    re-hashes that long with the lane index as seed (xxhash64(i, h)) —
    identical lane values to ``operators.dedup.minhash_pairs_signatures``,
    which is the bulk (explode + groupBy) form to prefer on whole frames;
    this array form is for per-row use on an already-materialized gram
    column (never pass a generating expression: lambdas re-evaluate their
    operand per element)."""
    hashes = F.transform(F.array_distinct(ngrams), lambda g: F.xxhash64(g))
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda a, i: F.least(a, F.xxhash64(i, h)),
        ),
    )


def simhash64(tokens: Column) -> Column:
    """SimHash (north star; not in reference): 64-bit signature whose bits
    are the signs of per-bit vote sums over token hashes. Hamming-close
    signatures ⇒ similar token multisets."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def vote_fn(b: int):
        return lambda acc, h: acc + (F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    bits = []
    for b in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), vote_fn(b))
        one = F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        if b < 63:
            bits.append(one * F.lit(2**b).cast("long"))
        else:  # sign bit: set via long min to stay in two's complement
            bits.append(F.when(vote > 0, F.lit(-(2**63)).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


def jaccard(a: Column, b: Column) -> Column:
    """jaccard_index (jaccard.hpp:73) on two token/ngram arrays (as sets)."""
    ad, bd = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ad, bd)).cast("double")
    union = F.size(F.array_union(ad, bd)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def replace_tokens(tokens: Column, mapping: dict[str, str]) -> Column:
    """replace_tokens (nvtext/replace.hpp:87): swap target tokens for their
    replacements, leaving the rest — transform + map lookup, all JVM-side.
    The mapping is a literal MapType expression, so at scale it ships once
    inside the plan (a table-sized vocabulary belongs in
    tokens_to_vocab_ids' broadcast-join path instead)."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend((F.lit(k), F.lit(v)))
    m = F.create_map(*pairs)
    return F.transform(tokens, lambda t: F.coalesce(m[t], t))


def filter_tokens(tokens: Column, min_token_length: int) -> Column:
    """filter_tokens (nvtext/replace.hpp:136): drop tokens shorter than
    ``min_token_length`` (higher-order filter; no shuffle, no UDF)."""
    return F.filter(tokens, lambda t: F.length(t) >= min_token_length)


def detokenize(tokens: Column, sep: str = " ") -> Column:
    """detokenize (nvtext/tokenize.hpp:181): rows of token arrays back to
    strings.  The row-wise inverse of :func:`tokenize`; the reference's
    row-indices variant is a groupBy(collect_list) + this."""
    return F.array_join(tokens, sep)


def normalize_text(col: Column | str) -> Column:
    """normalize_characters+spaces (normalize.hpp:55/216): lower, strip
    non-alphanumerics to space, collapse runs."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint (north star): md5 of sorted distinct normalized
    tokens — whitespace/punct/word-order insensitive content key."""
    toks = F.sort_array(F.array_distinct(F.split(normalize_text(col), " ")))
    return F.md5(F.array_join(toks, " "))


def stopword_ratio(tokens: Column, lang: str) -> Column:
    """Fraction of tokens in the language's stopword list (language-id
    n-gram/stopword heuristic, north star)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tokens) > 0, n_stop.cast("double") / F.size(tokens)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic quality score in [0,1] (north star): mix of alpha ratio,
    mean word length band, and whitespace sanity — all regexp counts."""
    c = _c(col)
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    spaces = F.length(F.regexp_replace(c, r"[^ ]", "")).cast("double")
    words = spaces + 1
    mean_wl = (n - spaces) / words
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        F.when(n > 0, (alpha / n) * 0.6 + wl_ok * 0.3 + F.least(n / 100.0, F.lit(1.0)) * 0.1).otherwise(F.lit(0.0)),
        6,
    )


def classifier_features(tokens: Column, max_n: int = 2) -> Column:
    """fastText-style feature set: word unigrams plus word n-grams up to
    ``max_n`` (Joulin et al. 2016, "Bag of Tricks for Efficient Text
    Classification" — the hashing-trick feature layout CCNet/Llama-style
    quality classifiers apply at corpus scale).

    Pass a MATERIALIZED token column (``_with_tokens`` convention), never
    a generating expression — downstream lambdas re-evaluate their operand
    per element."""
    feats = tokens
    for n in range(2, max_n + 1):
        feats = F.concat(feats, word_ngrams(tokens, n))
    return feats


def classifier_logit(
    features: Column,
    weights_micro: Sequence[int],
    bias_micro: int = 0,
    hash_expr: Callable[[Column], Column] | None = None,
) -> Column:
    """Hashed linear classifier logit (model-based quality scoring, north
    star): each feature gram hashes into ``len(weights_micro)`` buckets
    (hashing trick) and the logit is ``bias + mean(weight[bucket(g)])`` —
    the scalar-weight form of fastText's averaged-embedding linear layer.

    Weights are INTEGER micro-units (1e-6), so the feature sum is an exact
    integer fold — no float-accumulation-order sensitivity between engines
    or between plan shapes — and only the final mean/bias arithmetic is
    float (one division sequence, bit-identical cross-engine).  The weight
    vector rides as an array literal: pure per-row whole-stage-codegen
    expression, zero shuffle, zero UDF — the 100 TB path.  For models too
    wide for a literal (real fastText uses ~2M buckets) use
    :func:`classifier_logit_bulk`, the broadcast-join twin.

    ``hash_expr`` defaults to xxhash64 (library fast path); pass
    ``operators.dedup.md5_hash60`` for a DuckDB-replicable signature (the
    SimHash oracle convention).  NULL/empty feature arrays yield NULL
    (nothing scored)."""
    w = len(weights_micro)
    if w < 1:
        raise ValueError("weights_micro must be non-empty")
    h = hash_expr or F.xxhash64
    warr = F.array(*[F.lit(int(x)).cast("long") for x in weights_micro])
    sum_micro = F.aggregate(
        features,
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.element_at(warr, (F.pmod(h(g), F.lit(w)) + 1).cast("int")),
    )
    return F.when(
        F.size(features) > 0,
        sum_micro.cast("double") / F.lit(1000000.0) / F.size(features)
        + F.lit(bias_micro / 1e6),
    )


def classifier_logit_bulk(
    df,
    id_col: str,
    features_col: str,
    weights_df,
    n_buckets: int,
    bias_micro: int = 0,
    hash_expr: Callable[[Column], Column] | None = None,
):
    """Broadcast-join twin of :func:`classifier_logit` for wide models:
    explode features, hash to buckets, broadcast-join the ``(bucket,
    w_micro)`` weight table, per-doc integer sum — one shuffle (the
    per-doc groupBy), weight table never shuffled.  Missing buckets weigh
    0 (a sparse model's implicit zeros).  Returns ``id_col, n_feat,
    logit`` — bit-identical to the literal path (same integer sum, same
    final float sequence)."""
    h = hash_expr or F.xxhash64
    exploded = df.select(
        F.col(id_col),
        F.size(features_col).alias("__nf"),
        F.explode(features_col).alias("__g"),
    ).withColumn("__bkt", F.pmod(h(F.col("__g")), F.lit(n_buckets)).cast("int"))
    joined = exploded.join(
        F.broadcast(weights_df.select(F.col("bucket").alias("__bkt"), "w_micro")),
        "__bkt",
        "left",
    )
    agg = joined.groupBy(id_col, "__nf").agg(
        F.sum(F.coalesce(F.col("w_micro"), F.lit(0)).cast("long")).alias("__sm")
    )
    return agg.select(
        F.col(id_col),
        F.col("__nf").cast("long").alias("n_feat"),
        (
            F.col("__sm").cast("double") / F.lit(1000000.0) / F.col("__nf")
            + F.lit(bias_micro / 1e6)
        ).alias("logit"),
    )


def learn_linear_classifier(
    df,
    id_col: str,
    features_col: str,
    label_col: str,
    n_buckets: int,
    n_iters: int,
    lr: float,
    hash_expr: Callable[[Column], Column] | None = None,
):
    """Distributed TRAINING of the hashed linear classifier —
    the learning counterpart of :func:`classifier_logit` /
    :func:`classifier_logit_bulk`, exactly as :func:`bpe.learn_bpe_merges`
    is the learning counterpart of the BPE apply step.  Full-batch
    gradient descent with squared loss on the fastText-style model
    ``pred = bias + mean(weight[bucket(g)])`` (Joulin et al. 2016): the
    standard distill-the-heuristic stage (CCNet/Llama-style pipelines
    train a cheap classifier on seed labels, then apply it corpus-wide).

    Cross-engine-deterministic by construction, term by term:

    - per-doc weight sum: exact BIGINT fold (weights are integer
      micro-units, the classifier_logit convention);
    - per-doc prediction/residual: one fixed float sequence
      ``sum/1e6/nf + bias/1e6 - y`` (no cross-row float math);
    - gradient accumulation: per-doc contributions rounded to 9 decimals
      and summed as DECIMAL(28,9) — exact, order-independent (the
      functions.stable convention), so Spark's partial/final shuffle
      order cannot move a low bit;
    - weight update: ``w - floor((lr*1e6/N)*grad + 0.5)`` back in integer
      micro-units — integers in, integers out, every iteration.

    A trained model is therefore a pure function of (corpus, labels,
    hyperparameters): bit-identical on any engine replicating the
    formula, which is what makes the registered query SQL-oracle-able.

    Distributed shape (no driver-side weights, unlike classic MLlib
    loops): the bias rides the weight frame as pseudo-bucket -1 (its
    per-doc "feature" row has nf = 1, so the SAME gradient and update
    expressions serve weights and bias — r/1 == r and the floor-update
    formula are bit-identical to the split form the oracle spells out).
    The exploded (id, y, nf, bucket) feature frame plus the one bias row
    per doc is built ONCE, hash-partitioned by doc id, and persisted
    (call-owned); because groupBy(id) and the residual join both reuse
    that clustering, an iteration's ONLY exchange is the
    (n_buckets+1)-row gradient shuffle — scoring, residuals and the
    join-back all run exchange-free on the cached layout, and each
    iteration is ONE eager job (the model localCheckpoint) so the
    prediction chain is never evaluated twice.  At 100 TB the persisted
    frame is the corpus token stream — the same scale shape as
    TF-IDF/BM25 — and everything else is O(n_buckets).

    Returns ``(weights_df, bias_df)``: ``weights_df`` = (bucket INT,
    w_micro BIGINT), ``bias_df`` = one row (b_micro BIGINT, n_docs
    BIGINT).  Rows with NULL/empty features must be filtered by the
    caller (they have no gradient — and the doc count N that scales the
    learning rate counts exactly the rows of ``df``)."""
    from pyspark.storagelevel import StorageLevel

    from my_cudf_spark.plans.pin import lru_persist

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    h = hash_expr or F.xxhash64
    spark = df.sparkSession

    # Three subtrees read the labeled feature frame (the exploded union
    # side, the bias-row union side, and the doc count) — and feature
    # generation is typically the expensive regex/ngram chain upstream.
    # The shared LRU makes it ONE evaluation; callers composing further
    # reads (e.g. per-bucket feature counts) hit the same cache entry via
    # plan substitution.
    df = lru_persist(df)

    feat = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("double").alias("__y"),
            F.size(features_col).cast("long").alias("__nf"),
            F.explode(features_col).alias("__g"),
        )
        .withColumn("__bkt", F.pmod(h(F.col("__g")), F.lit(n_buckets)).cast("int"))
        .drop("__g")
    )
    biasrows = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("double").alias("__y"),
        F.lit(1).cast("long").alias("__nf"),
        F.lit(-1).cast("int").alias("__bkt"),
    )
    exb = (
        feat.unionByName(biasrows)
        .repartition("__id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Iteration-invariant doc count rides as a 1-row frame (no collect):
    # it scales the learning rate.
    stats = df.agg(F.count(F.lit(1)).alias("__n")).localCheckpoint(eager=True)

    model = spark.range(-1, n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        F.lit(0).cast("long").alias("w_micro"),
    )
    model = model.localCheckpoint(eager=True)
    lr6 = float(lr) * 1000000.0

    def _delta(s: Column, n: Column) -> Column:
        # floor(x+0.5) not ROUND: identical half-handling on every engine.
        return F.floor((F.lit(lr6) / n) * s.cast("double") + F.lit(0.5)).cast("long")

    try:
        for _ in range(n_iters):
            w_feat = model.filter(F.col("bucket") >= 0)
            b_row = model.filter(F.col("bucket") == -1).select(
                F.col("w_micro").alias("__b")
            )
            pred = (
                exb.join(F.broadcast(w_feat), exb["__bkt"] == w_feat["bucket"])
                .groupBy("__id")
                .agg(
                    F.first("__y").alias("__y"),
                    F.first("__nf").alias("__nf"),
                    F.sum("w_micro").alias("__sm"),
                )
            )
            resid = pred.crossJoin(F.broadcast(b_row)).select(
                "__id",
                (
                    F.col("__sm").cast("double") / F.lit(1000000.0) / F.col("__nf")
                    + F.col("__b").cast("double") / F.lit(1000000.0)
                    - F.col("__y")
                ).alias("__r"),
            )
            # Bias rows carry __nf = 1, so round(__r/__nf, 9) is the plain
            # round(__r, 9) of the oracle's bias-gradient CTE, exactly.
            grad = (
                exb.join(resid, "__id")
                .groupBy("__bkt")
                .agg(
                    F.sum(
                        F.round(F.col("__r") / F.col("__nf"), 9).cast("decimal(28,9)")
                    ).alias("__s")
                )
            )
            new_model = (
                model.join(grad, model["bucket"] == grad["__bkt"], "left")
                .crossJoin(F.broadcast(stats))
                .select(
                    "bucket",
                    F.when(F.col("__s").isNull(), F.col("w_micro"))
                    .otherwise(F.col("w_micro") - _delta(F.col("__s"), F.col("__n")))
                    .alias("w_micro"),
                )
            )
            # One eager job per iteration; the (n_buckets+1)-row result
            # keeps lineage flat no matter how many iterations run, and
            # the next iteration references it twice (scoring + update)
            # for free.
            model = new_model.localCheckpoint(eager=True)
        weights = model.filter(F.col("bucket") >= 0)
        bias = (
            model.filter(F.col("bucket") == -1)
            .crossJoin(F.broadcast(stats))
            .select(
                F.col("w_micro").alias("b_micro"),
                F.col("__n").cast("long").alias("n_docs"),
            )
        )
        return weights, bias
    finally:
        try:
            exb.unpersist()
        except Exception:  # session tearing down — nothing to release
            pass



def dup_token_fraction(tokens: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token —
    1 - |distinct|/|tokens| (Gopher-style repetition signal; pure Column
    expression, no shuffle)."""
    n = F.size(tokens)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(tokens)).cast("double") / n,
    ).otherwise(F.lit(0.0))


def dup_ngram_fraction(tokens: Column, n: int) -> Column:
    """Fraction of word n-grams that are duplicates (Gopher's
    'duplicate n-gram fraction' family). Linear in document length."""
    grams = word_ngrams(tokens, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate (byte_pair_encoding.hpp:97 without a merges
    file): count of word-pieces ≈ words + punctuation + long-word splits
    via regex — the standard cheap estimator for LLM token budgeting."""
    c = _c(col)
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def porter_stemmer_measure(word: Column | str) -> Column:
    """porter_stemmer_measure (nvtext/stemmer.hpp:80): the m in the
    [C](VC)^m[V] decomposition of a lowercase word = number of
    vowel-group→consonant-group transitions ('y' after a consonant acts as
    a vowel; approximated here as always-vowel, the common simplification)."""
    w = F.lower(_c(word))
    return F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+[^aeiouy]+"), 0))


def tokens_to_vocab_ids(tokens: Column, vocab: list[str], oov_id: int = -1) -> Column:
    """tokenize_with_vocabulary (nvtext/tokenize.hpp:273/303): map each
    token to its id in a fixed vocabulary, OOV → ``oov_id``.  For small
    vocabularies this inlines as a literal map lookup (JVM-side); for large
    vocabularies prefer an explode + broadcast-join against a vocab table.
    """
    pairs: list[Column] = []
    for i, w in enumerate(vocab):
        pairs.extend([F.lit(w), F.lit(i)])
    vmap = F.create_map(*pairs)
    return F.transform(tokens, lambda t: F.coalesce(vmap[t], F.lit(oov_id)))


# PII scrubbing patterns, ordered: specific before general (SSN's 3-2-4
# grouping would otherwise be half-eaten by the phone pattern).  Patterns
# stay inside the Java-regex ∩ RE2 common subset (no lookaround) so the
# DuckDB oracle applies them verbatim.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column | str) -> Column:
    """Scrub emails / SSNs / phone numbers / IPv4 addresses to typed
    placeholder tokens (north-star curation op; no reference equivalent —
    nvtext stops at replace_tokens, nvtext/replace.hpp:71, which can only
    swap whole whitespace tokens, not patterns).  Pure Column exprs:
    chained JVM regexp_replace, no UDF."""
    out = _c(col)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern kind in the raw text."""
    (pat,) = [p for k, p, _ in PII_PATTERNS if k == kind]
    return F.size(F.regexp_extract_all(_c(col), F.lit(pat), 0))


def chunk_documents(
    df,
    id_cols,
    text_col,
    max_tokens: int,
    overlap: int = 0,
    sep: str = " ",
):
    """Split documents into overlapping fixed-token-budget chunks — the
    context-window packing prep a training/RAG pipeline runs over every
    corpus (the reference stops at tokenize_with_vocabulary; chunking is
    the step between raw docs and sequence packing).

    One row per chunk: ``(*id_cols, chunk_seq, chunk, n_tokens)`` where
    chunks start every ``max_tokens - overlap`` tokens and a trailing
    window is emitted only if the previous one did not already reach the
    end of the document (same window rule as ``bpe.subword_tokenize``'s
    HF-style overflow).

    Scale: whitespace split + sequence/filter/explode/slice are all narrow
    JVM-side higher-order Column expressions — no UDF, no shuffle; the
    explode fan-out is bounded by ceil(n_tokens/step) per doc."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    id_cols = list(id_cols)
    c = _c(text_col)
    t = df.select(*id_cols, F.split(c, " ").alias("__tk"))
    n = F.size("__tk")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n),
    )
    t = t.select(*id_cols, "__tk", F.explode(starts).alias("__s"))
    sl = F.slice("__tk", F.col("__s") + 1, max_tokens)
    return t.select(
        *id_cols,
        (F.col("__s") / step).cast("int").alias("chunk_seq"),
        F.array_join(sl, sep).alias("chunk"),
        F.size(sl).cast("long").alias("n_tokens"),
    )


def ngram_lm_scores(
    df,
    id_cols,
    text_col,
    alpha: float = 0.5,
):
    """Per-document add-alpha bigram language-model score — the
    perplexity-proxy quality signal of CCNet-style curation (docs whose
    token transitions are improbable under the corpus LM are boilerplate/
    garbled candidates; the reference has no LM machinery at all).

    Trains ON the corpus itself (the in-domain score): unigram and bigram
    counts are map-side-combined aggregations; each document's bigrams
    hash-join those count tables and close
    ``avg(ln((c(w1,w2)+a) / (c(w1)+a*V)))`` per doc.  Documents with fewer
    than two tokens have no bigrams and drop out (standard LM convention).

    Returns ``(*id_cols, n_bigrams, avg_logprob)`` with the score rounded
    to 6dp (ln noise across engines lives ~1e-15, far below the
    rounding).

    Scale: two count shuffles bounded by vocab/vocab² cardinality, token-
    key hash joins, one per-doc aggregation — no UDF, no broadcast of
    anything corpus-sized (V rides a 1-row broadcast).  The token
    projection feeds three subtrees (unigram counts, bigram counts, the
    per-doc scoring join), so it rides the shared :func:`plans.pin.
    lru_persist` LRU: ONE linear corpus scan builds the cache, the other
    subtrees read it — not three independent corpus scans."""
    from my_cudf_spark.plans.pin import lru_persist

    id_cols = list(id_cols)
    t = lru_persist(df.select(*id_cols, F.split(_c(text_col), " ").alias("__tk")))
    uni = (
        t.select(F.explode("__tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    pairs = F.transform(
        F.slice(F.col("__tk"), 1, F.greatest(F.size("__tk") - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(F.col("__tk"), i + 2).alias("w2")
        ),
    )
    bg = t.select(*id_cols, F.explode(pairs).alias("p")).select(
        *id_cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    a = F.lit(float(alpha))
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .join(F.broadcast(vocab), F.lit(True), "left")
        .withColumn(
            "__lp",
            F.log((F.col("cb") + a) / (F.col("cu") + a * F.col("__v"))),
        )
    )
    return scored.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("avg_logprob"),
    )


def bm25_scores(
    df,
    id_cols,
    text_col,
    query_terms,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance of every document against a fixed term set — the
    classic lexical-retrieval scorer (the sparse half of a RAG stack next
    to :mod:`..operators.similarity`'s dense top-k; the reference stops at
    raw tf via token counting).

    Standard Robertson/Sparck-Jones form: ``score(d) = Σ_t idf(t) ·
    tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))`` with
    ``idf = ln((N-df+0.5)/(df+0.5) + 1)`` (the non-negative variant).

    Returns ``(*id_cols, n_terms, score)`` for documents matching ≥1 term.

    Scale: the term filter lands BEFORE the explode aggregation, so the
    (doc, term) tf shuffle carries only query-term hits (|terms| ≈ query
    size, not vocab); document length and corpus stats (N, avgdl) are one
    narrow pass + a 1-row broadcast; df-per-term is |terms| rows broadcast
    back.  All hash joins on doc/term keys — no UDF, no cross product.
    The token projection feeds lens/stats/tf as three subtrees, so it
    rides the shared :func:`plans.pin.lru_persist` LRU: ONE linear corpus
    scan builds the cache instead of three independent scans."""
    from my_cudf_spark.plans.pin import lru_persist

    id_cols = list(id_cols)
    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tk = lru_persist(
        df.select(*id_cols, F.split(_c(text_col), " ").alias("__tk"))
    )
    lens = tk.select(*id_cols, F.size("__tk").alias("__dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        tk.select(*id_cols, F.explode("__tk").alias("__w"))
        .filter(F.col("__w").isin(terms))
        .groupBy(*id_cols, "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__w")
        .join(lens, id_cols)
        .join(F.broadcast(stats), F.lit(True), "left")
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    norm = F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    term_score = idf * F.col("__tf") * (k1 + 1.0) / norm
    return (
        scored.withColumn("__s", term_score)
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("__s"), 6).alias("score"),
        )
    )


def bm25_scores_multi(
    df,
    id_cols,
    text_col,
    query_terms,
    query_id: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
):
    """:func:`bm25_scores` generalized to a PER-QUERY term table — the
    multi-query lexical-retrieval leg of a hybrid RAG stack: ``query_terms``
    is a (query_id, term) frame and the result scores every document
    against every query's term set in one pass.

    Same Robertson/Sparck-Jones form and corpus statistics as
    :func:`bm25_scores` (idf/N/avgdl are corpus-global, shared across
    queries).  Returns ``(query_id, *id_cols, n_terms, score)`` for
    (query, doc) pairs matching ≥ 1 term, with ``score`` an exact
    DECIMAL(38,9) sum of per-term contributions rounded to 9dp — callers
    RANK on this column, so the sum must be order-independent (the repo's
    decimal convention; a raw double sum would tie-break differently
    across partitionings and engines).

    Scale: one (doc, term) tf aggregation over term hits only (the
    distinct-term table — |queries| × terms rows — broadcasts into the
    token explode), df/idf is |terms| rows broadcast back, and the
    query↔term fan-out joins AFTER aggregation on the hit set, never on
    the raw token stream."""
    from my_cudf_spark.plans.pin import lru_persist

    id_cols = list(id_cols)
    qt = query_terms.select(
        F.col(query_id).alias("__qid"), F.col(term_col).alias("__w")
    )
    tk = lru_persist(
        df.select(*id_cols, F.split(_c(text_col), " ").alias("__tk"))
    )
    lens = tk.select(*id_cols, F.size("__tk").alias("__dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    terms = qt.select("__w").distinct()
    tf = (
        tk.select(*id_cols, F.explode("__tk").alias("__w"))
        .join(F.broadcast(terms), "__w")
        .groupBy(*id_cols, "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(qt), "__w")
        .join(F.broadcast(dfreq), "__w")
        .join(lens, id_cols)
        .join(F.broadcast(stats), F.lit(True), "left")
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    norm = F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    term_score = idf * F.col("__tf") * (k1 + 1.0) / norm
    return (
        scored.withColumn("__s", F.round(term_score, 9).cast("decimal(28,9)"))
        .groupBy(F.col("__qid").alias(query_id), *id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__s").alias("score"),
        )
    )


def dsir_log_weights(
    df,
    id_cols,
    feats_col: str,
    is_target_col: str,
    n_buckets: int = 64,
    hash_expr: Callable[[Column], Column] | None = None,
):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every RAW document by how much more likely its hashed n-gram bag is
    under the TARGET distribution than under the raw distribution —
    ``log w(x) = Σ_b c_b(x) · (ln p_target(b) − ln p_raw(b))`` with add-one
    smoothing over ``n_buckets`` hashed feature buckets.  The standard
    trained-distribution data-selection stage between heuristic filters
    and full model scoring (used for e.g. Wikipedia/books-like selection
    from Common Crawl).

    ``df`` must carry a MATERIALIZED feature-array column (``feats_col``,
    e.g. :func:`classifier_features` over ``_with_tokens`` output) and a
    boolean ``is_target_col`` marking the in-domain sample.  Rows with
    NULL/empty features — and target rows themselves — produce no output.

    Scale: one explode pass feeds (a) the bucket-count aggregation —
    ``n_buckets`` rows out, map-side combined — and (b) the per-doc score
    sum keyed by doc id; the bucket→log-ratio table rides back as a
    ``n_buckets``-row broadcast.  No UDF, no driver loop, nothing
    corpus-sized ever broadcast.

    ``hash_expr`` defaults to xxhash64; pass ``operators.dedup.md5_hash60``
    to make every bucket index SQL-replicable (the classifier/SimHash
    oracle convention).

    Returns ``(*id_cols, n_feat, log_weight)`` for raw rows.
    """
    h = hash_expr or F.xxhash64
    ids = list(id_cols)
    b = df.select(
        *ids,
        F.col(is_target_col).alias("__t"),
        F.explode(feats_col).alias("__g"),
    ).select(
        *ids, "__t", F.pmod(h(F.col("__g")), F.lit(n_buckets)).alias("__b")
    )
    counts = b.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__ct"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("__cr"),
    )
    totals = counts.agg(
        F.sum("__ct").alias("__tt"), F.sum("__cr").alias("__tr")
    )
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log((F.col("__ct") + 1).cast("double") / (F.col("__tt") + F.lit(n_buckets)))
            - F.log((F.col("__cr") + 1).cast("double") / (F.col("__tr") + F.lit(n_buckets)))
        ).alias("__lr"),
    )
    # Per-doc sum via round(·,9) + DECIMAL(28,9): plain double F.sum is
    # order-dependent, and callers rank/select on the ROUNDED weight — a
    # sum landing on a rounding boundary could flip across partitionings
    # or engines (the classifier/PCA order-independent-sum convention).
    return (
        b.filter(~F.col("__t"))
        .join(F.broadcast(ratios), "__b")
        .groupBy(*ids)
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.sum(F.round(F.col("__lr"), 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("log_weight"),
        )
    )
