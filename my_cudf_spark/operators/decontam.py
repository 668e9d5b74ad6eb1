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

__all__ = ["contamination_report"]


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
