"""Deduplication operators for training-data pipelines (north star;
reference surface: nvtext minhash.hpp:72-213, jaccard.hpp:73,
stream_compaction distinct).

Tiers, all shuffle-bounded and collect-free:

- ``exact_dedup``        : hash-groupBy on a content key. One shuffle.
- ``neardup_pairs_exact``: EXACT n-gram Jaccard pairs via inverted-index
  join with **prefix + length filtering** (AllPairs/PPJoin): grams are
  ordered rarest-first by global document frequency and only the first
  ``⌊(1-t)·n⌋+1`` grams of each document enter the join — provably no
  qualifying pair is missed, and hot grams (the quadratic blowup) are
  excluded from the index.  Candidates are verified with exact jaccard.
- ``minhash_lsh_pairs``  : the 100 TB path — fixed-size minhash signature,
  banding, bucket join. Probabilistic (tunable band/row tradeoff);
  candidates are verified with exact jaccard so false positives never
  escape; false-negative rate is the standard 1-(1-s^r)^b curve.
- ``simhash_pairs``      : hamming-distance candidates via simhash band
  join (near-dup for token-multiset similarity).

Perf shape (measured at sf0.1, 5k docs, local[32]): signatures are computed
by **explode → xxhash64 once per gram → groupBy(id) with k simple aggs**,
never by k per-row array traversals (k inlined lambdas recompute their
operand per element and blow up codegen); candidate verification re-joins
the small candidate set against the gram table instead of carrying gram
arrays through the band shuffle.  These three choices took the dedup family
from 80s to a few seconds at sf0.1 and are exactly the shapes that survive
1000 executors: one shuffle to build signatures (partial aggs map-side),
one shuffle to bucket, one broadcast-size join to verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "neardup_pairs_exact",
    "minhash_lsh_pairs",
    "minhash_ngrams_signatures",
    "simhash_pairs",
    "substring_dup_spans",
    "substring_self_spans",
    "tfidf_cosine_pairs",
    "md5_hash60",
    "release_cached",
]

# Gram-set frames persisted by the pair builders below.  The returned plans
# reference them lazily, so they cannot be unpersisted inside the builder;
# they ride the shared semantic-hash-keyed LRU in plans.pin (also used by
# the token projections in functions.text).
from my_cudf_spark.plans.pin import lru_persist as _persist
from my_cudf_spark.plans.pin import release_persisted


def release_cached() -> int:
    """Unpersist every builder-cached frame (gram sets here, token
    projections in functions.text — one shared LRU; call once consumers
    finish, e.g. at the end of a pipeline stage).  Returns the number of
    frames released."""
    return release_persisted()


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


def incremental_dedup(
    new_batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    content_new: Column,
    content_corpus: Column,
) -> DataFrame:
    """Incremental exact dedup: the rows of ``new_batch`` whose content is
    (a) absent from the already-ingested ``corpus`` and (b) the first
    occurrence (min ``id_col``) within the batch — the per-drop ingestion
    step of a continuously-growing training corpus, where re-deduplicating
    the full corpus on every delivery is the thing a 100 TB pipeline cannot
    afford.

    Scale: the corpus side reduces to DISTINCT hashes before the anti-join
    (map-side partial distinct; the wire carries one 32-byte key per
    distinct corpus content, never corpus payloads), the anti-join and the
    within-batch keep-first shuffle hash on the same key, and everything is
    proportional to |new batch| + |distinct corpus hashes| — the corpus
    text itself is scanned once and never shuffled.  In a real deployment
    the distinct-hash frame is the thing you persist between drops.

    NULL contract (SQL join semantics, pinned by test_dedup): a NULL
    content expression hashes to NULL, and a left-anti join never matches
    NULL keys — so NULL-content rows are ALWAYS treated as novel relative
    to the corpus, even when the corpus also holds NULL content.  Within
    the batch they form one keep-first group (the row_number window
    partitions NULLs together, per SQL grouping), so exactly one NULL-
    content row survives per drop.  Callers wanting NOT-IN semantics
    (NULL poisons membership) should filter ``content.isNotNull()``
    upstream."""
    key_new = F.sha2(content_new, 256).alias("__h")
    corpus_keys = corpus.select(F.sha2(content_corpus, 256).alias("__h")).distinct()
    w = Window.partitionBy("__h").orderBy(id_col)
    return (
        new_batch.withColumn("__h", key_new)
        .join(corpus_keys, "__h", "left_anti")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def _gram_sets(df: DataFrame, id_col: str, grams: Column) -> DataFrame:
    """(id, grams) with grams distinct — materialized as its own projection
    so downstream lambdas reference the stored array, not the generating
    expression (which Spark would otherwise re-evaluate per element)."""
    return df.select(F.col(id_col).alias("id"), F.array_distinct(grams).alias("grams"))


def _pairs_in_buckets(
    df: DataFrame, bucket_cols: list[str], payload: Column
) -> DataFrame:
    """Enumerate unordered pairs of payloads sharing a bucket, WITHOUT a
    self-join: groupBy(bucket) + collect_list + in-bucket combination
    expansion.  One shuffle, one evaluation of the input subtree (a
    self-join evaluates it twice — Spark does not reuse unaliased plan
    subtrees), and the pair blowup is explicit: a bucket of k rows yields
    k·(k-1)/2 pairs, so upstream filtering (prefix/banding) must keep
    buckets small — hot buckets are a data-model problem (run exact dedup
    first), not one a join strategy can hide.

    Payload structs are sorted, so pairs come out with ``a < b`` by the
    struct's leading field.  Returns columns (a, b) of the payload type.
    """
    grouped = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_list(payload)).alias("xs"))
        .filter(F.size("xs") > 1)
    )
    pairs = F.flatten(
        F.transform(
            F.col("xs"),
            lambda x, i: F.transform(
                F.slice(F.col("xs"), i + 2, F.size(F.col("xs")) - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return grouped.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def _verify_jaccard(cand: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their gram sets and keep
    exact jaccard ≥ threshold.  The candidate set is tiny relative to the
    corpus, so these are two cheap hash joins (broadcast-able when the
    planner sees the size)."""
    ga = sets.select(F.col("id").alias("id_a"), F.col("grams").alias("g_a"))
    gb = sets.select(F.col("id").alias("id_b"), F.col("grams").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size(F.array_union("g_a", "g_b")).cast("double")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def neardup_pairs_exact(
    df: DataFrame,
    id_col: str,
    grams: Column,
    threshold: float,
    method: str = "count",
) -> DataFrame:
    """All pairs with set-Jaccard(grams) ≥ threshold, exactly.

    Two exact strategies for two data regimes:

    - ``method="count"`` (default): single-sided inverted-index —
      bucket postings per gram, enumerate in-bucket pairs, and
      ``groupBy(pair).count()`` **is** the intersection size, from which
      jaccard follows (|A∪B| = n_a + n_b − |A∩B|).  Two shuffles, zero
      array operations.  Cost ∝ Σ|posting list|² — right when shingles are
      selective (short posting lists), e.g. ≥trigram shingles.
    - ``method="prefix"``: AllPairs/PPJoin prefix filtering — order grams
      rarest-first (global document frequency) and index only the first
      ``n − ⌈t·n⌉ + 1`` grams per document (if J(A,B) ≥ t the pigeonhole
      forces a shared prefix gram), with the length filter
      ``t·max(n_a,n_b) ≤ min(n_a,n_b)``; then verify candidates with exact
      array jaccard.  Right when documents are long and posting lists are
      hot (the count method's Σ|list|² blows up) but true-pair density is
      low: the verification cost is per-candidate, so it pays off exactly
      when prefix filtering prunes hard.  (On a dense small-vocabulary
      corpus it inverts — measured 400k surviving candidates at sf0.1
      made array verification 10× slower than counting.)
    """
    if method not in ("count", "prefix"):
        raise ValueError(f"unknown method: {method}")
    # The gram table feeds several consumers; Spark re-evaluates an
    # unpersisted subtree per consumer, so materialize it once (LRU-reused
    # across repeated builds).
    # MEMORY_AND_DISK: at cluster scale this spills instead of OOMing.
    sets = _persist(_gram_sets(df, id_col, grams).withColumn("n", F.size("grams")))
    postings = sets.select("id", "n", F.explode("grams").alias("g"))

    if method == "count":
        pairs = _pairs_in_buckets(postings, ["g"], F.struct("id", "n"))
        counted = (
            pairs.filter(F.greatest("a.n", "b.n") * threshold <= F.least("a.n", "b.n"))
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.n").alias("n_a"),
                F.col("b.n").alias("n_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        return (
            counted.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    from pyspark.sql import Window

    dfreq = postings.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy("df", "g")
    prefix_len = (F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1).cast("int")
    prefix = (
        postings.join(dfreq, "g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("id", "n", "g")
    )
    cand = (
        _pairs_in_buckets(prefix, ["g"], F.struct("id", "n"))
        .filter(F.greatest("a.n", "b.n") * threshold <= F.least("a.n", "b.n"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(cand, sets, threshold)


def minhash_pairs_signatures(
    sets: DataFrame, num_hashes: int
) -> DataFrame:
    """(id, sig array<long>) minhash signatures via explode + groupBy.

    Each gram is hashed **once** (xxhash64, the algorithm family the
    reference exposes — hashing.hpp:183); the k signature lanes re-hash
    that 8-byte value with the lane index as seed (xxhash64(i, h) — cheap
    fixed-width hashing, no k-fold string re-hashing, no k array
    traversals).  groupBy(id) with k ``min`` aggs gets map-side partial
    aggregation for free — the shuffle carries k longs per document.
    """
    hashed = sets.select("id", F.explode("grams").alias("g")).select(
        "id", F.xxhash64("g").alias("h")
    )
    mins = hashed.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(i), "h")).alias(f"m{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig")
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
    Signature is fixed-size regardless of document length → the band
    shuffle is O(docs × bands), independent of text size.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    # Reused by the signature build and both verification sides (see
    # neardup_pairs_exact on why persist; LRU-reused across repeated builds).
    # Filter OUTSIDE the persist boundary (r12, guide §7.2): a size()
    # predicate on the computed grams column inside the persisted plan is
    # pushdown-substituted below the projection with the WHOLE gram
    # pipeline inlined, evaluated on the pre-shuffle scan task during
    # materialization (measured 4.7 s vs 0.2 s on the fixture corpus);
    # on top of the persist it reads the cached column.
    sets = _persist(_gram_sets(df, id_col, grams)).filter(F.size("grams") > 0)
    sig = minhash_pairs_signatures(sets, num_hashes)
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(i), *[F.element_at("sig", i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)]
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    cand = (
        _pairs_in_buckets(banded, ["band_idx", "band_hash"], F.struct("id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(cand, sets, threshold)


def md5_hash60(col: Column) -> Column:
    """60-bit hash from the md5 hex prefix — the cross-engine token hash.

    xxhash64 has no DuckDB twin, so SimHash built on it can only get a
    rows-only driver check.  The first 15 hex chars of md5 give 60
    uniform bits both engines compute identically (DuckDB:
    ``('0x' || substr(md5(t),1,15))::BIGINT``), making the full signature
    SQL-expressible.  The top 4 signature bits become constant zero —
    harmless: they cancel in every XOR/hamming comparison."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MERSENNE_PRIME61 = (1 << 61) - 1


def minhash_ngrams_signatures(
    sets: DataFrame,
    parameter_a: list[int],
    parameter_b: list[int],
    hash_expr=None,
) -> DataFrame:
    """Affine-permuted minhash — exact formula parity with the reference's
    ``minhash64_ngrams`` (nvtext/minhash.hpp:180-213): each gram hash hv is
    permuted per lane as ``pv[i] = (hv*a[i] + b[i]) % (2^61 - 1)`` and the
    signature is the per-lane minimum.  (The main LSH pipeline's
    ``minhash_pairs_signatures`` re-hashes with the lane index instead —
    equivalent sketch quality, cheaper; this variant exists for API/formula
    parity and uses the same explode + k-min-aggs shape.)

    The 2^61-1 modular product needs a 122-bit intermediate, out of range
    for BIGINT — both engines run it exactly in wide arithmetic: Spark in
    decimal(38,0) (values < 2^125 ≈ 4.3e37 fit), DuckDB in HUGEINT.
    ``hash_expr`` defaults to :func:`md5_hash60` so hv < 2^60 needs no
    pre-reduction and the oracle can recompute it."""
    import decimal

    if len(parameter_a) != len(parameter_b):
        raise ValueError("parameter_a and parameter_b must have equal length")
    if hash_expr is None:
        hash_expr = md5_hash60
    dec = lambda v: F.lit(decimal.Decimal(v)).cast("decimal(38,0)")
    hashed = sets.select("id", F.explode("grams").alias("g")).select(
        "id", hash_expr(F.col("g")).cast("decimal(38,0)").alias("hv")
    )
    lanes = [
        F.min(
            ((F.col("hv") * dec(a) + dec(b)) % dec(MERSENNE_PRIME61)).cast("long")
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(zip(parameter_a, parameter_b))
    ]
    return hashed.groupBy("id").agg(*lanes)


def simhash_signatures(
    df: DataFrame, id_col: str, tokens: Column, hash_expr=None
) -> DataFrame:
    """(id, sh) 64-bit SimHash per document via explode + groupBy: one
    xxhash64 per token, then 64 conditional-sum aggs (one per bit) and a
    bitwise reassembly.  Documents with zero tokens get signature 0 (the
    empty-vote fixpoint), restored via left join.

    ``hash_expr``: Column-expression factory for the per-token hash;
    defaults to xxhash64 (fastest), :func:`md5_hash60` when the caller
    needs cross-engine (DuckDB-oracle) reproducibility."""
    if hash_expr is None:
        hash_expr = F.xxhash64
    ids = df.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    hashed = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("t")).select(
        "id", hash_expr(F.col("t")).alias("h")
    )
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    bit = lambda b: F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
    sh = bit(0)
    for b in range(1, 63):
        sh = sh + bit(b) * F.lit(1 << b).cast("long")
    sh = sh + F.when(F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
    sigs = votes.select("id", sh.alias("sh"))
    return ids.join(sigs, "id", "left").select(
        "id", F.coalesce("sh", F.lit(0).cast("long")).alias("sh")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    max_hamming: int = 3,
    hash_expr=None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit signature into max_hamming+1
    bands — any pair within distance max_hamming shares at least one exact
    band (pigeonhole) → equi-join per band, then exact popcount filter.
    Pigeonhole is complete: the output is EVERY pair at distance ≤
    max_hamming, not a sample — which is why the md5-backed variant
    (``hash_expr=md5_hash60``) admits an exact SQL oracle.
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    sig = simhash_signatures(df, id_col, tokens, hash_expr=hash_expr)
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
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        _pairs_in_buckets(banded, ["band_idx", "band_val"], F.struct("id", "sh"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming"
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _pos_shingles(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    k: int,
    max_postings: int | None,
) -> DataFrame:
    """Positional k-shingle hashes ``(id, pos, h)`` — window ``pos``
    covers tokens [pos, pos+k); md5-derived 60-bit hash, SQL-replicable.
    ``max_postings`` drops shingles whose document frequency exceeds the
    cap (the shared hot-shingle knob of the substring-span family)."""
    toked = df.select(
        F.col(id_col).alias("id"), tokens.alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # posexplode_outer + post-filter (r12, guide §7.2): plain posexplode
    # makes Catalyst infer a size()>0 filter carrying the whole md5
    # shingle transform inlined — double evaluation per row inside the
    # persisted plan.  Shingle hashes are never null, so dropping the
    # null row an empty array emits is exactly the old semantics.
    sh = toked.filter(F.col("__n") >= k).select(
        "id",
        F.posexplode_outer(
            F.transform(
                F.sequence(F.lit(1), F.col("__n") - (k - 1)),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice("__toks", i, k), "\x1f")), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ).alias("pos", "h"),
    ).filter(F.col("h").isNotNull())
    sh = _persist(sh)
    if max_postings is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.countDistinct("id").alias("__df"))
            .filter(F.col("__df") > max_postings)
            .select("h")
        )
        sh = sh.join(hot, "h", "left_anti")
    return sh


def substring_dup_spans(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    k: int = 8,
    min_len: int = 12,
    max_postings: int | None = None,
) -> DataFrame:
    """Exact duplicated SUBSTRING spans across documents (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) — the span-level dedup flavor the set-based ops
    (jaccard / minhash / simhash) cannot express: two documents sharing
    one verbatim ≥ ``min_len``-token passage but nothing else have tiny
    set overlap yet exactly the contamination substring dedup removes.

    Plan (inverted index + diagonal runs, no suffix array needed on
    Spark):

    1. positional k-shingles — posexplode tokens, hash each k-token
       window (md5-derived, SQL-replicable);
    2. cross-doc postings join on shingle hash → (id_a < id_b, pos_a,
       pos_b) seed matches;
    3. gaps-and-islands on the DIAGONAL: matches of one pair with equal
       ``pos_a − pos_b`` and consecutive ``pos_a`` form one maximal
       shared span of ``run + k − 1`` tokens (two window functions over
       (pair, diag), never a global window);
    4. keep spans of ≥ ``min_len`` tokens, emit one row per maximal span.

    Returns ``(id_a, id_b, pos_a, pos_b, span_len)``.

    Scale: postings shuffle ∝ corpus tokens; the quadratic sits in hot
    shingles (a k-gram occurring in p documents seeds p² matches).
    ``max_postings`` caps it — shingles with document frequency above the
    cap are dropped from SEEDING (spans still extend THROUGH them via
    the diagonal merge as long as one seed shingle inside the span
    survives; only spans composed purely of ultra-common k-grams are
    missed — the Lee et al. practice of ignoring boilerplate).  The cap
    is part of the operator contract, so an oracle replicates it
    exactly.  Suffix-array exactness without a cap needs the
    single-machine structure the reference-free repo deliberately avoids.
    """
    if k < 1 or min_len < k:
        raise ValueError("need k >= 1 and min_len >= k")
    sh = _pos_shingles(df, id_col, tokens, k, max_postings)
    a = sh.select(F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "h")
    seeds = a.join(b, "h").filter(F.col("id_a") < F.col("id_b"))
    w = Window.partitionBy(
        "id_a", "id_b", F.col("pos_a") - F.col("pos_b")
    ).orderBy("pos_a")
    runs = seeds.withColumn(
        "__grp", F.col("pos_a") - F.row_number().over(w)
    )
    spans = (
        runs.groupBy("id_a", "id_b", F.col("pos_a") - F.col("pos_b"), "__grp")
        .agg(
            F.min("pos_a").alias("pos_a"),
            F.min("pos_b").alias("pos_b"),
            (F.count(F.lit(1)) + (k - 1)).alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select("id_a", "id_b", "pos_a", "pos_b", F.col("span_len").cast("long"))
    )
    return spans


def remove_dup_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str,
    tokens: Column,
) -> DataFrame:
    """APPLY substring dedup (the Lee et al. 2022 action step): given the
    span pairs :func:`substring_dup_spans` found, cut every duplicated
    passage from the HIGHER-id document of each pair (lower id keeps the
    canonical copy — the repo's lower-id-wins convention) and rebuild the
    cleaned token stream.

    Returns one row per input document:
    ``(id, n_before, n_after, clean_text)`` — documents untouched by any
    span pass through with ``n_after = n_before``.

    Plan: spans explode into covered (id, pos) rows (volume ∝ duplicated
    tokens — exactly the text being deleted, so it cannot dominate the
    corpus), distinct, one anti-join against the posexploded token
    stream, one groupBy to reassemble in position order.  No window over
    whole documents, no collect."""
    covered = (
        spans.select(
            F.col("id_b").alias("id"),
            F.explode(
                F.sequence(
                    F.col("pos_b"), F.col("pos_b") + F.col("span_len") - 1
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toked = docs.select(F.col(id_col).alias("id"), tokens.alias("__toks"))
    positions = toked.select(
        "id", F.posexplode("__toks").alias("pos", "tok")
    )
    survivors = positions.join(covered, ["id", "pos"], "left_anti")
    rebuilt = survivors.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    base = toked.select("id", F.size("__toks").cast("long").alias("n_before"))
    return base.join(rebuilt, "id", "left").select(
        "id",
        "n_before",
        F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def tfidf_cosine_pairs(
    grams: DataFrame,
    threshold: float,
    max_df: int | None = None,
) -> DataFrame:
    """TF-IDF cosine all-pairs similarity over a binary-tf gram table —
    the idf-weighted sibling of :func:`neardup_pairs_exact` (same
    inverted-index pair join, weighted dot product instead of set
    counting).  ``grams`` must hold one row per DISTINCT ``(id, gram)``.

    Weights are idf² (binary tf, so each shared gram contributes idf·idf
    to the dot product); norms and dots are per-term-rounded decimal sums
    (order-independent, so a SQL oracle reproduces them bit-for-bit);
    cosine = dot / (‖a‖·‖b‖), pairs with cosine ≥ ``threshold`` returned
    as ``(id_a, id_b, cosine)`` with ``id_a < id_b``.

    Scale: the dot-product join meets pairs only on shared grams, so its
    cost is Σ|posting list|² — quadratic in a gram's document frequency.
    ``max_df`` caps it exactly like ``substring_dup_spans.max_postings``:
    grams with df > ``max_df`` are dropped from BOTH join legs AND the
    norms (the cosine is computed over the capped vocabulary — a
    consistent metric, not a truncated dot over full-vocab norms), which
    is also the right semantics: a stop-gram's idf² weight is ≈ 0, so it
    inflates the join quadratically while moving the cosine negligibly.
    The cap is part of the operator contract so oracles replicate it.
    """
    grams = _persist(grams.select("id", "gram"))
    n = grams.agg(F.countDistinct("id").alias("nd"))
    dfq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfq = dfq.filter(F.col("df") <= max_df)
    idf = F.log(F.col("nd").cast("double") / F.col("df"))
    # inner join against the (capped) df table drops hot grams from the
    # postings once, upstream of BOTH the norm agg and both dot legs
    w = _persist(
        grams.join(dfq, "gram")
        .crossJoin(F.broadcast(n))
        .select("id", "gram", F.round(idf * idf, 9).alias("w2"))
    )
    DEC = "decimal(28,9)"
    nrm = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w2").cast(DEC)).cast("double")).alias("nn")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.w2").cast(DEC)).cast("double").alias("dot"))
    )
    na = nrm.select(F.col("id").alias("id_a"), F.col("nn").alias("na"))
    nb = nrm.select(F.col("id").alias("id_b"), F.col("nn").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def substring_self_spans(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    k: int = 8,
    min_len: int = 12,
    max_postings: int | None = None,
) -> DataFrame:
    """Intra-document duplicated spans — the WITHIN-document flavor of
    :func:`substring_dup_spans` (Lee et al. 2022 dedups inside documents
    too: boilerplate repeated in one page, tandem-duplicated passages):
    every maximal run of ≥ ``min_len`` tokens appearing at two positions
    of the SAME document, as ``(id, pos_a, pos_b, span_len)`` with
    ``pos_a < pos_b``.

    Same machinery as the cross-document op — positional k-shingles
    (shared ``_pos_shingles`` builder, same ``max_postings`` hot-shingle
    cap), a self-join on (id, hash) restricted to ``pos_a < pos_b``, and
    the gaps-and-islands merge along the REPEAT-DISTANCE diagonal
    ``pos_b − pos_a`` (a tandem repeat of period p shows up as one span
    per distance p, 2p, … — each a true verbatim recurrence).  Shuffle
    volume ∝ document tokens; the quadratic sits in within-document
    shingle multiplicity, which ``max_postings`` bounds exactly as the
    cross-doc cap does."""
    if k < 1 or min_len < k:
        raise ValueError("need k >= 1 and min_len >= k")
    sh = _pos_shingles(df, id_col, tokens, k, max_postings)
    a = sh.select("id", F.col("pos").alias("pos_a"), "h")
    b = sh.select("id", F.col("pos").alias("pos_b"), "h")
    seeds = a.join(b, ["id", "h"]).filter(F.col("pos_a") < F.col("pos_b"))
    w = Window.partitionBy(
        "id", F.col("pos_b") - F.col("pos_a")
    ).orderBy("pos_a")
    runs = seeds.withColumn("__grp", F.col("pos_a") - F.row_number().over(w))
    return (
        runs.groupBy("id", F.col("pos_b") - F.col("pos_a"), "__grp")
        .agg(
            F.min("pos_a").alias("pos_a"),
            F.min("pos_b").alias("pos_b"),
            (F.count(F.lit(1)) + (k - 1)).alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select("id", "pos_a", "pos_b", F.col("span_len").cast("long"))
    )
