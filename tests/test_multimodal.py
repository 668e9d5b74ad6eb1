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


def test_phash_neardup_planted_recall_and_banding_completeness(spark):
    """dHash + pigeonhole banding: planted near-dup images (single-block
    pixel edits) pair up at small hamming, and the banded join returns
    EXACTLY the brute-force pair set at the distance bound (pigeonhole
    completeness — never a sample)."""
    import itertools
    import random

    from my_cudf_spark.operators.multimodal import (
        attach_payload,
        dhash_signatures,
        phash_neardup_pairs,
    )

    rng = random.Random(99)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    def doc(n=700):
        return "".join(rng.choice(alphabet) for _ in range(n))

    base = doc()
    # near-dup: one 10-char stretch pushed to high byte values → flips the
    # comparisons around one block only
    near = base[:300] + "z" * 10 + base[310:]
    rows = [(0, base), (1, near)] + [(i, doc()) for i in range(2, 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dhash_signatures(attach_payload(df), "doc_id")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(sigs, "doc_id", max_hamming=6).collect()
    }
    # brute force over the collected signatures
    sig_map = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(sig_map), 2):
        h = bin(sig_map[a] ^ sig_map[b]).count("1")
        if h <= 6:
            want[(a, b)] = h
    # NB: max_hamming=6 → 7 bands over 60 bits is the NON-DIVISIBLE
    # geometry — the remainder bits are distributed across the first four
    # bands, so this equality also proves every bit participates
    assert got == want
    assert (0, 1) in got and got[(0, 1)] <= 6   # planted pair recalled

    # degenerate geometry (more bands than bits) must refuse loudly — a
    # zero-width band silently becomes an all-pairs cross join
    with pytest.raises(ValueError, match="band"):
        phash_neardup_pairs(sigs, "doc_id", max_hamming=60, sig_bits=60)
