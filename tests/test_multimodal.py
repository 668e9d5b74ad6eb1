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


def _audio_frame(spark, rows):
    """(id, payload-bytes) rows → multimodal frame with media_meta."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return M.attach_payload(df)


def test_audio_landmarks_formula(spark):
    """Landmark tokens closed by hand: window-4 DFT energies are exact
    integers — e1 = (x0-x2)^2 + (x1-x3)^2, e2 = (x0-x1+x2-x3)^2."""
    # bytes: 'ABCD' = 65,66,67,68 ; 'AAAA' = 65*4
    out = M.audio_landmarks(_audio_frame(spark, [(1, "ABCDAAAA")]), "doc_id").collect()
    # frame0: e1 = (65-67)^2 + (66-68)^2 = 8, e2 = (65-66+67-68)^2 = 4 -> 1:8
    # frame1: e1 = 0, e2 = 0, tie -> lower bin -> 1:0
    assert out[0]["lms"] == ["1:8>1:0"]
    # < 2 frames -> empty landmark set, row preserved
    short = M.audio_landmarks(_audio_frame(spark, [(2, "ABCDE")]), "doc_id").collect()
    assert short[0]["lms"] == []


def test_audio_pairs_planted_recall(spark):
    """A few-byte perturbation of a clip is caught at high jaccard; an
    unrelated clip is not paired."""
    import random

    from my_cudf_spark.operators import dedup as D

    rng = random.Random(5)
    base = "".join(chr(rng.randrange(40, 120)) for _ in range(400))
    mut = list(base)
    for pos in (37, 203):  # 2 corrupted samples -> ≤4 broken landmarks
        mut[pos] = chr(ord(mut[pos]) ^ 1)
    other = "".join(chr(rng.randrange(40, 120)) for _ in range(400))
    lms = M.audio_landmarks(
        _audio_frame(spark, [(1, base), (2, "".join(mut)), (3, other)]), "doc_id"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.neardup_pairs_exact(lms, "doc_id", F.col("lms"), 0.8).collect()
    }
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] >= 0.9


def test_video_frame_signatures_and_pairs(spark):
    """Two clips sharing a 7-frame run at different offsets are paired
    with exact boundaries; an unrelated clip is not."""
    from my_cudf_spark.operators import dedup as D

    seg = "".join(chr(65 + (i % 20)) + "0123456789abcde" for i in range(7))  # 7 frames
    v1 = "X" * 16 + seg + "Y" * 16            # shared run at frame 1
    v2 = "Z" * 32 + seg                        # shared run at frame 2
    v3 = "".join(chr(97 + (i % 9)) * 16 for i in range(9))
    df = _audio_frame(spark, [(1, v1), (2, v2), (3, v3)])
    sigs = M.video_frame_signatures(df, "doc_id", frame_bytes=16)
    got = {r["doc_id"]: r["fsigs"] for r in sigs.collect()}
    assert len(got[1]) == 9 and len(got[2]) == 9 and got[1][1] == got[2][2]
    spans = D.substring_dup_spans(sigs, "doc_id", F.col("fsigs"), k=2, min_len=6)
    rows = [(r.id_a, r.id_b, r.pos_a, r.pos_b, r.span_len) for r in spans.collect()]
    assert rows == [(1, 2, 1, 2, 7)]
