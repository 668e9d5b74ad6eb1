"""Distributed unigram-LM tokenizer training (SentencePiece-style,
Kudo 2018, arXiv:1804.10959) — the other tokenizer real pretraining
stacks train, completing the tier next to BPE merge learning
(functions/bpe.learn_bpe_merges), WordPiece and subword application.
The reference only APPLIES pretrained vocabularies
(nvtext/byte_pair_encoding.hpp, subword_tokenize.hpp); learning them is
the upstream step a corpus-scale engine should own.

Hard-EM formulation, chosen because every step is an exact integer /
windowless dataflow a SQL oracle replays bit-for-bit:

- seed vocabulary: every substring of length ≤ ``max_piece_len`` of
  every corpus word, counted with word frequency;
- piece scores: ln(count/total) in integer NANO-NATS
  (``round(round(ln, 9) · 1e9)`` — the repo's round-before-compare
  convention, so JVM/DuckDB libm last-ulp differences cannot flip a
  Viterbi comparison);
- E-step: per DISTINCT WORD Viterbi segmentation (dp over ≤
  ``max_word_len`` positions, candidates iterated shortest-piece-first
  with strict improvement — ties resolve to the shortest last piece in
  both engines), piece counts folded back weighted by word frequency;
- M-step: multi-char pieces keep their count (dropped at 0), single
  chars get add-one smoothing (never dropped — segmentation coverage),
  scores recomputed;
- ``iterations`` E/M rounds, then the top ``top_v`` pieces by
  (count desc, piece asc).

Scale: ONE corpus scan builds the word-frequency table; everything
after is VOCABULARY-sized — the seed explosion is |distinct words| ×
O(max_word_len · max_piece_len) rows, each Viterbi round is a narrow
projection over the distinct-word frame with the score map riding a
1-row broadcast (the text_classifier_learn one-job-per-iteration
pattern), and no window ever sees more than the vocabulary.  The dp
recurrence and backtrace are single higher-order fold expressions
(runtime loops, constant plan size) — no per-row Python, no UDF, and
none of the projection-collapse blowup an unrolled per-position column
chain suffers (see ``_viterbi_segments``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from my_cudf_spark.plans.pin import lru_persist as _persist

__all__ = ["learn_unigram", "train_unigram_counts", "unigram_segment_stats"]

_MISS = -(10**15)  # piece absent from the vocabulary
_INV = -(9 * 10**17)  # candidate length exceeds position


def _nanolog(x):
    """ln(x) in integer nano-nats — round(·, 9) BEFORE scaling so both
    engines agree despite last-ulp libm differences."""
    return F.round(F.round(F.log(x), 9) * F.lit(1e9), 0).cast("long")


def _score_rows(counts: DataFrame) -> DataFrame:
    """(piece, c) → (piece, s) nano-nat score rows."""
    t = counts.agg(F.sum("c").alias("t"))
    return counts.crossJoin(F.broadcast(t)).select(
        "piece",
        _nanolog(F.col("c").cast("double") / F.col("t")).alias("s"),
    )


def _viterbi_segments(
    wf: DataFrame, sc: DataFrame, max_piece_len: int, max_word_len: int
) -> DataFrame:
    """Viterbi-segment every distinct word against the score rows
    ``sc`` (piece, s).  ``wf`` must carry ``w`` (a DISTINCT word) and
    ``n`` (length ≤ max_word_len); returns every ``wf`` column plus
    ``pieces`` (the segmentation, last-to-first) and ``score`` (the
    word's total dp log-prob in nano-nats).

    Candidate scores are resolved BEFORE the dp: the (position, length)
    substring grid of each word (≤ max_word_len·max_piece_len cells) is
    exploded once and hash-joined to the vocabulary scores, then packed
    into one per-word array the fold indexes O(1).  The previous shape
    looked each candidate up in a vocabulary-sized map column, and
    Spark's ``element_at`` on a map is a linear scan — grid ×
    |vocabulary| work per word (measured ~6× the whole-query time at a
    ~15k-piece vocabulary).  A join against the score rows does the
    same resolution in one hash probe per cell.

    Both the dp pass and the backtrace are SINGLE ``F.aggregate`` fold
    expressions over the position sequence (runtime loops, constant
    expression size).  An unrolled per-position withColumn chain would
    collapse into one projection whose dp_j tree embeds dp_{j-1} once
    per candidate — ~3^max_word_len expression nodes, a driver-heap OOM
    in analysis (observed); the fold keeps the plan O(1)."""
    miss = F.lit(_MISS).cast("long")
    inv = F.lit(_INV).cast("long")
    carry = [c for c in wf.columns]
    K = max_piece_len

    # (word row, grid-index k = (j-1)·K + (i-1), substring) for the full
    # grid; cells with i > j produce junk substrings (negative start
    # wraps) but the dp's i<=j guard never reads their scores — same
    # contract as the old lazily-guarded map lookup.  Every wf column
    # rides the explode so the per-word score array regroups WITHOUT a
    # join back to wf (w is distinct, so grouping on all carried columns
    # preserves cardinality).
    grid = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_word_len)),
            lambda j: F.transform(
                F.sequence(F.lit(1), F.lit(K)),
                lambda i: F.substring(F.col("w"), j - i + F.lit(1), i),
            ),
        )
    )
    cells = wf.select(*carry, F.posexplode(grid).alias("__k", "__sub"))
    scored = cells.join(
        F.broadcast(sc), cells["__sub"] == sc["piece"], "left"
    ).select(*carry, "__k", F.coalesce(F.col("s"), miss).alias("__s"))
    sarr = scored.groupBy(*carry).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__k", "__s"))),
            lambda e: e.getField("__s"),
        ).alias("__sarr")
    )

    def dp_step(acc, j):
        # acc: struct(dpl array<long>, btl array<long>); position j runtime
        def cand(i):
            # 1-based element_at over the (j,i) grid array: (j-1)*K + i
            s = F.element_at(F.col("__sarr"), (j - F.lit(1)) * F.lit(K) + F.lit(i))
            return F.when(
                F.lit(i) <= j,
                F.element_at(acc["dpl"], F.greatest(j - F.lit(i - 1), F.lit(1)))
                + s,
            ).otherwise(inv)

        cs = [cand(i) for i in range(1, max_piece_len + 1)]
        g = F.greatest(*cs) if len(cs) > 1 else cs[0]
        bt = F.when(g == cs[0], 1)
        for i in range(2, max_piece_len):
            bt = bt.when(g == cs[i - 1], i)
        bt = bt.otherwise(max_piece_len).cast("long")
        return F.struct(
            F.array_append(acc["dpl"], g).alias("dpl"),
            F.array_append(acc["btl"], bt).alias("btl"),
        )

    dp_init = F.struct(
        F.array(F.lit(0).cast("long")).alias("dpl"),
        F.array().cast("array<long>").alias("btl"),
    )
    vit = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word_len)), dp_init, dp_step
    )
    v = sarr.select(
        *carry,
        vit["btl"].alias("btl"),
        F.element_at(vit["dpl"], F.col("n").cast("int") + 1).alias("score"),
    )

    def walk_step(acc, _):
        i = F.element_at(F.col("btl"), F.greatest(acc["pos"], F.lit(1))).cast("int")
        piece = F.substring(F.col("w"), acc["pos"] - i + F.lit(1), i)
        stepped = F.struct(
            (acc["pos"] - i).cast("int").alias("pos"),
            F.array_append(acc["pieces"], piece).alias("pieces"),
        )
        return F.when(acc["pos"] > 0, stepped).otherwise(acc)

    walk_init = F.struct(
        F.col("n").cast("int").alias("pos"),
        F.array().cast("array<string>").alias("pieces"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word_len)), walk_init, walk_step
    )
    return v.select(*carry, "score", walk["pieces"].alias("pieces"))


def _viterbi_counts(
    wf: DataFrame, sc: DataFrame, max_piece_len: int, max_word_len: int
) -> DataFrame:
    """E-step: piece counts from every distinct word's Viterbi
    segmentation, weighted by word frequency.  Returns (piece, c)."""
    segs = _viterbi_segments(wf, sc, max_piece_len, max_word_len)
    return (
        segs.select("f", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").alias("c"))
    )


def _m_counts(counts: DataFrame, chars: DataFrame) -> DataFrame:
    """M-step count adjustment: multi-char pieces keep c (>0 only),
    single chars get add-one smoothing and are never dropped.

    The smoothing is a union + one hash aggregation instead of the
    former ``chars LEFT JOIN counts`` (r12): the left-outer join planned
    as a SortMergeJoin — two exchanges + two sorts per M-step on a
    vocabulary-sized frame (and chars, the bounded charset, cannot be
    the broadcast build side of its own left join).  Every single-char
    piece in ``counts`` is by construction in ``chars`` (both derive
    from the same corpus substrings), so sum-over-union equals the
    join's coalesce(c, 0) exactly."""
    multi = counts.filter((F.length("piece") > 1) & (F.col("c") > 0)).select(
        "piece", "c"
    )
    smoothed = (
        chars.select("piece", F.lit(0).cast("long").alias("c"))
        .unionByName(counts.filter(F.length("piece") == 1).select("piece", "c"))
        .groupBy("piece")
        .agg((F.sum("c") + 1).cast("long").alias("c"))
    )
    return multi.unionByName(smoothed)


def learn_unigram(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 3,
    max_word_len: int = 12,
    iterations: int = 2,
    top_v: int = 30,
) -> DataFrame:
    """Train a unigram-LM vocabulary over normalized text — see module
    docstring for the algorithm and its engine-exactness contract.

    ``text_col`` must already be normalized (single-space separated;
    route through ``functions.text.normalize_text``).  Words longer
    than ``max_word_len`` are excluded from training (documented
    contract; real trainers cap word length the same way).  Returns
    ``(rank, piece, cnt, score)`` — the top ``top_v`` pieces by final
    E-step count (ties to the lexicographically smaller piece), with
    ``score`` the final nano-nat log probability."""
    counts = train_unigram_counts(
        df, text_col, max_piece_len, max_word_len, iterations
    )
    t = counts.agg(F.sum("c").alias("t"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("c").desc(), F.col("piece"))
    ranked = (
        counts.crossJoin(F.broadcast(t))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_v)
    )
    return ranked.select(
        "rank",
        "piece",
        F.col("c").alias("cnt"),
        _nanolog(F.col("c").cast("double") / F.col("t")).alias("score"),
    )


def _word_freqs(df: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """(w, f, n) distinct-word frequencies over normalized text; words
    longer than ``max_word_len`` excluded (training contract)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w").between(1, max_word_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .withColumn("n", F.length("w"))
    )


def train_unigram_counts(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 3,
    max_word_len: int = 12,
    iterations: int = 2,
) -> DataFrame:
    """The EM loop of :func:`learn_unigram`, returning the FULL final
    piece-count frame ``(piece, c)`` (char-smoothed M-step applied) —
    the trained model :func:`unigram_segment_stats` consumes."""
    if iterations < 1 or max_piece_len < 1 or max_word_len < max_piece_len:
        raise ValueError(
            "need iterations >= 1 and 1 <= max_piece_len <= max_word_len"
        )
    wf = _persist(_word_freqs(df, text_col, max_word_len))
    # seed: every substring of length <= max_piece_len, frequency-weighted
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.col("n") - s + 1)
                ),
                lambda l: F.substring(F.col("w"), s, l),
            ),
        )
    )
    seed = _persist(
        wf.select("f", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").alias("c"))
    )
    chars = _persist(seed.filter(F.length("piece") == 1).select("piece"))

    counts = seed
    for _ in range(iterations):
        sc = _score_rows(counts)
        e_counts = _persist(
            _viterbi_counts(wf, sc, max_piece_len, max_word_len)
        )
        counts = _persist(_m_counts(e_counts, chars))
    return counts


def unigram_segment_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    counts: DataFrame,
    max_piece_len: int = 3,
    max_word_len: int = 12,
) -> DataFrame:
    """APPLY a trained unigram vocabulary — the tokenizer train→apply
    loop (the unigram sibling of text_classifier_train_apply): segment
    each document against the model's piece scores and emit per-document
    tokenization statistics ``(id, n_words, n_skipped, n_pieces,
    score)`` — ``score`` the summed Viterbi log-probability in integer
    nano-nats (exact addition; a document-level LM quality signal),
    ``n_skipped`` the words over ``max_word_len`` the model excludes.

    Scale shape: the VOCABULARY side is segmented once (per distinct
    word — one Viterbi fold over the distinct-word frame with the score
    map on a 1-row broadcast), then per-word stats hash-join back to the
    per-document word stream — corpus-sized work is one explode + one
    join + one groupBy; the quadratic-free shape a tokenizer apply
    needs at 100 TB.  Coverage contract: the model's char smoothing
    guarantees segmentability when the model was trained on (a superset
    of) this corpus; genuinely unseen characters surface as sentinel
    (−1e15) piece scores rather than errors."""
    sc = _score_rows(counts)
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).withColumn("n", F.length("w"))
    valid = words.filter(F.col("n").between(1, max_word_len))
    wf = valid.select("w", "n").distinct()
    segs = _viterbi_segments(wf, sc, max_piece_len, max_word_len).select(
        "w",
        F.size("pieces").cast("long").alias("__np"),
        F.col("score").alias("__sc"),
    )
    per_doc = (
        valid.join(segs, "w")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__np").alias("n_pieces"),
            F.sum("__sc").alias("score"),
        )
    )
    skipped = words.groupBy("id").agg(
        F.sum((~F.col("n").between(1, max_word_len)).cast("long")).alias(
            "n_skipped"
        )
    )
    return (
        skipped.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.col("n_skipped").cast("long").alias("n_skipped"),
            F.coalesce(F.col("n_pieces"), F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
        )
    )
