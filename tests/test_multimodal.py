"""Multimodal plumbing tests: batch shapes, round-trips, codec seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.operators import multimodal as M
from my_cudf_spark.sources import load_table
from tests.conftest import SF_DIR


def _docs(spark):
    return M.attach_payload(load_table(spark, SF_DIR, "documents"))


def test_attach_payload_schema(spark):
    docs = _docs(spark)
    assert dict(docs.dtypes)["payload"] == "binary"
    meta = docs.select("media_meta.*").first()
    assert meta["fmt"] == "gray8" and meta["height"] == 1


def test_resize_gray_width_and_determinism(spark):
    out = M.resize_gray(_docs(spark), "doc_id", out_width=16)
    rows = out.orderBy("doc_id").limit(5).collect()
    assert all(len(r["payload"]) == 16 and r["width"] == 16 for r in rows)
    rows2 = M.resize_gray(_docs(spark), "doc_id", 16).orderBy("doc_id").limit(5).collect()
    assert [bytes(r["payload"]) for r in rows] == [bytes(r["payload"]) for r in rows2]


def test_image_features_match_bytes(spark):
    docs = _docs(spark)
    feats = M.image_features(docs, "doc_id")
    joined = feats.join(docs.select("doc_id", F.octet_length("payload").alias("blen")), "doc_id")
    bad = joined.filter(
        (F.col("n_bytes") != F.col("blen"))
        | (F.col("min_px") < 0)
        | (F.col("max_px") > 255)
        | (F.col("mean_px") < F.col("min_px"))
        | (F.col("mean_px") > F.col("max_px"))
    )
    assert bad.count() == 0


def test_pil_decoder_is_a_stub_here(spark):
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.pil_decoder(b"\x89PNG", None)
