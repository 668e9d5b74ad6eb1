"""Benchmark decontamination: flag training documents that overlap an
evaluation set's n-grams (the GPT-3/PaLM-style 13-gram filter, scaled
down to the fixture's trigrams).

Not in the reference (its nvtext surface stops at gram generation —
generate_ngrams.hpp:59); decontamination is corpus hygiene every
LLM-pipeline user runs before training, so it is first-class here.

Shape: the benchmark gram set is inherently bounded (eval suites are
small relative to training corpora), so the join against it is
broadcast-able at any training-corpus scale — but the hint is left to
the planner/AQE: a caller scanning MANY benchmarks at once would
overflow a forced broadcast.  One explode + one equi-join + one
groupBy; cost is O(corpus grams), never corpus × benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "contamination_report",
    "bloom_filter_bits",
    "bloom_contamination",
    "bloom_probe_positions",
]


def bloom_probe_positions(gram, m_bits: int = 32768, k: int = 3, salt: str = "bloom"):
    """The k Bloom probe positions of a gram as Column expressions:
    ``md5(salt<j>|gram) % m_bits`` on the 60-bit (15-hex-digit) prefix —
    shared by the batch build/probe and the streaming twin so all three
    agree bit-for-bit with the DuckDB oracle."""
    gram = F.col(gram) if isinstance(gram, str) else gram
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}{j}|"), gram)), 1, 15),
            16,
            10,
        ).cast("long")
        % m_bits
        for j in range(k)
    ]


def contamination_report(
    doc_grams: DataFrame,
    bench_grams: DataFrame,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-document overlap with a benchmark gram set.

    ``doc_grams``: (id, grams array<string>) — training docs, gram sets
    distinct per doc (use ``F.array_distinct``).  ``bench_grams``: one
    ``gram`` column (need not be distinct; deduped here).  Returns
    (id, n_grams, n_overlap, ratio, contaminated) with
    ratio = |doc ∩ bench| / |doc| and contaminated = ratio ≥ threshold.
    Documents with empty gram sets are excluded (no overlap basis).
    """
    bench = bench_grams.select(F.col("gram")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    exploded = (
        doc_grams.filter(F.size("grams") > 0)
        .select("id", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram"))
    )
    return (
        exploded.join(bench, "gram", "left")
        .groupBy("id", "n_grams")
        .agg(F.count("__hit").alias("n_overlap"))
        .withColumn("ratio", F.col("n_overlap") / F.col("n_grams"))
        .withColumn("contaminated", F.col("ratio") >= F.lit(threshold))
    )


def bloom_filter_bits(
    bench_grams: DataFrame,
    m_bits: int = 32768,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom bitmap of a gram set as a (word_idx int, bits long) frame —
    ``ceil(m_bits / 63)`` rows, 63 payload bits per word (shifts stay in
    [0, 62] so ``1 << bit`` is positive BIGINT on every engine).

    Positions are ``md5(salt<j>|gram) % m_bits`` for j in [0, k) — pure
    column math, so DuckDB rebuilds the identical bitmap and membership
    tests (false positives included) agree bit-for-bit across engines.

    Scale: this is the decontamination shape for LARGE eval suites — the
    bitmap is ~m_bits/8 bytes regardless of gram count (32 KB default vs
    megabytes of raw grams), always broadcastable; build cost is one
    explode + one ``bit_or`` aggregation over k·|grams| rows."""
    pos = bloom_probe_positions("gram", m_bits, k, salt)
    return (
        bench_grams.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            (F.col("pos") / 63).cast("int").alias("word_idx"),
            (F.col("pos") % 63).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        # shiftleft's Python wrapper only takes an int shift; the SQL
        # function accepts a column expression.
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def bloom_contamination(
    doc_grams: DataFrame,
    bloom_bits: DataFrame,
    m_bits: int = 32768,
    k: int = 3,
    salt: str = "bloom",
    threshold: float = 0.2,
) -> DataFrame:
    """:func:`contamination_report` with the benchmark side compressed to
    a broadcast Bloom bitmap (:func:`bloom_filter_bits`) — the 100 TB
    decontamination path: the corpus never joins raw benchmark grams,
    only a ~m_bits/63-row bitmap frame; a gram counts as overlapping when
    ALL k probe bits are set (false-positive rate is the explicit
    contract knob, identical across engines because the hashes are).

    Same input/output contract as :func:`contamination_report`
    (``n_overlap`` counts Bloom-POSITIVE grams)."""
    exploded = doc_grams.filter(F.size("grams") > 0).select(
        "id",
        F.size("grams").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    probes = exploded.select(
        "id",
        "n_grams",
        "gram",
        F.posexplode(
            F.array(*bloom_probe_positions("gram", m_bits, k, salt))
        ).alias("j", "pos"),
    ).select(
        "id",
        "n_grams",
        "gram",
        (F.col("pos") / 63).cast("int").alias("word_idx"),
        (F.col("pos") % 63).cast("int").alias("bit"),
    )
    hit = (
        probes.join(F.broadcast(bloom_bits), "word_idx", "left")
        .withColumn(
            "__hit",
            F.coalesce(
                F.expr("shiftrightunsigned(bits, bit) & CAST(1 AS BIGINT)"),
                F.lit(0).cast("long"),
            ),
        )
        .groupBy("id", "n_grams", "gram")
        .agg(F.min("__hit").alias("__in"))
    )
    return (
        hit.groupBy("id", "n_grams")
        .agg(F.sum("__in").alias("n_overlap"))
        .withColumn("ratio", F.col("n_overlap") / F.col("n_grams"))
        .withColumn("contaminated", F.col("ratio") >= threshold)
    )
