"""Multimodal-column queries: binary payload + metadata + mapInPandas
decode/feature stages (north star; SURVEY.md §7.2.5 "multimodal columns").

The stand-in codec (payload bytes = gray8 pixels) makes the whole
decode → numpy → features pipeline SQL-replicable: pixel values are the
UTF-8 byte values of the fixture text (pure ASCII), so DuckDB reproduces
the features from ``ord()`` per character.  The Spark side still runs the
real plumbing — Arrow batch transfer, mapInPandas workers, binary columns,
metadata struct — which is exactly what a real codec would ride on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.operators import multimodal as M
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "multimodal_features",
    sql="""
    WITH e AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
    SELECT doc_id,
           COUNT(*) AS n_bytes,
           AVG(ord(ch)) AS mean_px,
           CAST(MIN(ord(ch)) AS INT) AS min_px,
           CAST(MAX(ord(ch)) AS INT) AS max_px
    FROM e GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload decode + per-image feature extraction in one
    Arrow-batched mapInPandas pass; integer pixel sums are exact in
    doubles, so the mean matches the oracle bit-for-bit."""
    docs = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.image_features(docs, "doc_id").orderBy("doc_id")


@register(
    "multimodal_frames",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, '') AS cs FROM documents),
         u AS (SELECT doc_id, CAST(generate_subscripts(cs, 1) - 1 AS INT) AS frame_idx,
                      unnest(cs) AS ch
               FROM t)
    SELECT doc_id, frame_idx, CAST(ord(ch) AS INT) AS frame_val
    FROM u WHERE frame_idx % 7 = 0
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 7th frame) — the explode-shaped mapInPandas
    stage of a video pipeline, one output row per sampled frame."""
    docs = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.frame_sample(docs, "doc_id", every_k=7).orderBy("doc_id", "frame_idx")
