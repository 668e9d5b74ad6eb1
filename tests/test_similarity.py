"""Differential test: LSH ANN vs brute-force cosine top-k (recall@5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_cudf_spark.operators import similarity as S
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def test_lsh_recall_vs_brute_force(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    approx = S.lsh_topk(emb, queries, "vec_id", "embedding", k=5, dim=64, bits=4, tables=16).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    found = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.6, f"LSH recall@5 too low: {recall}"


def test_cosine_self_similarity(spark):
    emb = _emb(spark).limit(20)
    row = emb.select(S.cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert all(abs(r["c"] - 1.0) < 1e-12 for r in row)
