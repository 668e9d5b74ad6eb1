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


@register(
    "mm_phash_signatures",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, '') AS cs,
                      CAST(length(text) AS BIGINT) AS n
               FROM documents),
    u AS (SELECT doc_id, n,
                 CAST(generate_subscripts(cs, 1) - 1 AS BIGINT) AS p,
                 ord(unnest(cs)) AS v
          FROM t),
    blk AS (SELECT doc_id, CAST((p * 70) // n AS INT) AS k,
                   CAST(SUM(v) AS DOUBLE) / COUNT(*) AS m
            FROM u GROUP BY doc_id, CAST((p * 70) // n AS INT)),
    bits AS (SELECT a.doc_id,
                    CAST(SUM(CASE WHEN b.m > a.m
                        THEN 1::BIGINT << CAST((a.k // 7) * 6 + (a.k % 7) AS INT)
                        ELSE 0 END) AS BIGINT) AS sig
             FROM blk a JOIN blk b
               ON a.doc_id = b.doc_id AND b.k = a.k + 1 AND a.k % 7 < 6
             GROUP BY a.doc_id)
    SELECT t.doc_id, CAST(COALESCE(bits.sig, 0) AS BIGINT) AS sig
    FROM t LEFT JOIN bits USING (doc_id) ORDER BY t.doc_id
    """,
)
def mm_phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash over the multimodal payload column
    (multimodal.dhash_signatures): decode → 10×7 block-mean grid → 60-bit
    difference hash, one Arrow-batched mapInPandas pass.  The stand-in
    codec keeps every one of the 60 bits SQL-replicable (block means are
    exact-integer sums over ord() values), so the driver hash-compares the
    COMPLETE signature per document — the end-to-end proof behind the
    image near-dup tier (pairing via phash_neardup_pairs' pigeonhole
    banding is covered by planted-image recall + brute-force completeness
    tests; the fixture corpus itself has no byte-aligned image dups, its
    organic minimum hamming is 10/60)."""
    docs = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.dhash_signatures(docs, "doc_id").orderBy("doc_id")


@register(
    "mm_phash_pairs",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, '') AS cs,
                      CAST(length(text) AS BIGINT) AS n
               FROM documents),
    u AS (SELECT doc_id, n,
                 CAST(generate_subscripts(cs, 1) - 1 AS BIGINT) AS p,
                 ord(unnest(cs)) AS v
          FROM t),
    blk AS (SELECT doc_id, CAST((p * 70) // n AS INT) AS k,
                   CAST(SUM(v) AS DOUBLE) / COUNT(*) AS m
            FROM u GROUP BY doc_id, CAST((p * 70) // n AS INT)),
    bits AS (SELECT a.doc_id,
                    CAST(SUM(CASE WHEN b.m > a.m
                        THEN 1::BIGINT << CAST((a.k // 7) * 6 + (a.k % 7) AS INT)
                        ELSE 0 END) AS BIGINT) AS sig
             FROM blk a JOIN blk b
               ON a.doc_id = b.doc_id AND b.k = a.k + 1 AND a.k % 7 < 6
             GROUP BY a.doc_id),
    s AS (SELECT t.doc_id, CAST(COALESCE(bits.sig, 0) AS BIGINT) AS sig
          FROM t LEFT JOIN bits USING (doc_id))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 11
    ORDER BY id_a, id_b
    """,
)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup PAIRS by perceptual-hash hamming distance
    (multimodal.phash_neardup_pairs over dhash_signatures): pigeonhole
    banding — the shipped hamming ≤ 11 bound splits the 60-bit signature
    into 12 bands of 5 bits — generates candidates with an equi-join per
    band, exact popcount verifies; the oracle brute-forces every pair, so
    the driver row proves the banded join is COMPLETE on real data (the
    banding guarantee, not just the planted-image unit test).  ≤ 11 was
    chosen because the fixture corpus' closest signatures sit at 10-11,
    so the result is non-trivially populated at every SF; the
    tried-and-rejected ≤ 12 bound (13 bands of 4 bits) measured 2-4×
    slower — ~4× the candidate volume for only looser matches.  At 100 TB the same plan is
    the scale path: the persisted signature frame is KBs per million
    images and candidates stream through the banded self-join; a
    production bound would use max_hamming ≈ 3-6, tightening buckets
    further."""
    docs = M.attach_payload(load_table(spark, sf_dir, "documents"))
    sigs = M.dhash_signatures(docs, "doc_id")
    return M.phash_neardup_pairs(sigs, "doc_id", max_hamming=11).orderBy(
        "id_a", "id_b"
    )


# DuckDB twin of multimodal.audio_landmarks: exact-integer window-4 DFT
# energies → dominant-bin tokens → adjacent-frame landmark strings.
# Shared by mm_audio_pairs and the streaming replay query.
AUDIO_LM_SQL = """
    t AS (SELECT doc_id, string_split(text, '') AS cs FROM documents),
    u AS (SELECT doc_id, CAST(generate_subscripts(cs, 1) - 1 AS BIGINT) AS p,
                 ord(unnest(cs)) AS v
          FROM t),
    fr AS (SELECT doc_id, p // 4 AS k,
                  CAST(SUM(CASE p % 4 WHEN 0 THEN v WHEN 2 THEN -v ELSE 0 END) AS BIGINT) AS re1,
                  CAST(SUM(CASE p % 4 WHEN 1 THEN v WHEN 3 THEN -v ELSE 0 END) AS BIGINT) AS im1,
                  CAST(SUM(CASE p % 4 WHEN 1 THEN -v WHEN 3 THEN -v ELSE v END) AS BIGINT) AS re2
           FROM u GROUP BY doc_id, p // 4 HAVING COUNT(*) = 4),
    en AS (SELECT doc_id, k, re1*re1 + im1*im1 AS e1, re2*re2 AS e2 FROM fr),
    tok AS (SELECT a.doc_id,
                   (CASE WHEN a.e1 >= a.e2 THEN '1:' || a.e1 ELSE '2:' || a.e2 END)
                   || '>' ||
                   (CASE WHEN b.e1 >= b.e2 THEN '1:' || b.e1 ELSE '2:' || b.e2 END) AS lm
            FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.k = a.k + 1)
"""


@register(
    "mm_audio_pairs",
    sql=f"""
    WITH {AUDIO_LM_SQL},
    sets AS (SELECT doc_id, list_distinct(list(lm)) AS lms FROM tok GROUP BY doc_id),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.lms, b.lms)) AS inter,
                 len(a.lms) AS n_a, len(b.lms) AS n_b
          FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
    FROM p WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
    ORDER BY id_a, id_b
    """,
)
def mm_audio_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs by spectral landmark fingerprint
    (multimodal.audio_landmarks — Shazam-style peak-pair hashing over
    exact-integer 4-sample DFT frames, decoded in one Arrow-batched
    mapInPandas pass) paired via MinHash-LSH banding with exact-jaccard
    verification (dedup.minhash_lsh_pairs).  LSH is the measured plan, not
    a default: structurally hot landmarks (constant audio regions) appear
    in ~1.8k clips at sf0.1, so the inverted-index count join enumerates
    36.5M co-token pairs (15 s) and prefix filtering inverts on this
    dense corpus (48 s); banding probes 64 lanes × 16 bands and verifies
    only true candidates (1.8 s), the 100 TB shape.  The oracle recomputes
    every landmark with integer SQL (window-4 twiddle factors are all in
    {-1,0,1} — the dHash convention) and brute-forces EVERY pair, so the
    driver row proves the banding's deterministic recall is exactly 100%
    on real data (the dedup_minhash_lsh convention).  Planted-perturbation
    recall is additionally asserted in tests/test_multimodal.py."""
    from my_cudf_spark.operators import dedup as D

    docs = M.attach_payload(load_table(spark, sf_dir, "documents"))
    lms = M.audio_landmarks(docs, "doc_id")
    return (
        D.minhash_lsh_pairs(lms, "doc_id", F.col("lms"), threshold=0.8, num_hashes=64, bands=16)
        .orderBy("id_a", "id_b")
    )


@register(
    "mm_video_pairs",
    sql="""
    WITH t AS (SELECT doc_id, text, length(text) // 16 AS nf FROM documents),
    f AS (SELECT doc_id, j - 1 AS fidx, md5(substr(text, (j-1)*16 + 1, 16)) AS fsig
          FROM t, unnest(range(1, nf + 1)) AS r(j) WHERE nf >= 2),
    sh AS (SELECT a.doc_id, a.fidx AS pos,
                  ('0x' || substr(md5(a.fsig || chr(31) || b.fsig), 1, 15))::BIGINT AS h
           FROM f a JOIN f b ON a.doc_id = b.doc_id AND b.fidx = a.fidx + 1),
    seeds AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b USING (h) WHERE a.doc_id < b.doc_id),
    runs AS (SELECT *, pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, pos_a - pos_b
                                                  ORDER BY pos_a) AS grp
             FROM seeds)
    SELECT id_a, id_b, CAST(MIN(pos_a) AS BIGINT) AS frame_a,
           CAST(MIN(pos_b) AS BIGINT) AS frame_b,
           CAST(COUNT(*) + 1 AS BIGINT) AS shared_frames
    FROM runs GROUP BY id_a, id_b, pos_a - pos_b, grp
    HAVING COUNT(*) + 1 >= 6
    ORDER BY id_a, id_b, frame_a, frame_b
    """,
)
def mm_video_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video temporal near-dup segments: clips sharing a run of ≥ 6
    identical 16-byte frames at any temporal offset
    (multimodal.video_frame_signatures → dedup.substring_dup_spans with
    frames as tokens, k=2 frame-shingles) — the video leg of the
    multimodal dedup tier, and a direct reuse of the duplicated-substring
    machinery: video segment dedup IS substring dedup over
    frame-signature sequences.  Decode + per-frame hashing is one
    Arrow-batched mapInPandas pass; seeding, diagonal merge and the
    hot-shingle cap are shared with the text-side operator, so the 100 TB
    shape is proven once and reused."""
    from my_cudf_spark.operators import dedup as D

    docs = M.attach_payload(load_table(spark, sf_dir, "documents"))
    sigs = M.video_frame_signatures(docs, "doc_id", frame_bytes=16)
    spans = D.substring_dup_spans(sigs, "doc_id", F.col("fsigs"), k=2, min_len=6)
    return spans.select(
        "id_a",
        "id_b",
        F.col("pos_a").cast("long").alias("frame_a"),
        F.col("pos_b").cast("long").alias("frame_b"),
        F.col("span_len").alias("shared_frames"),
    ).orderBy("id_a", "id_b", "frame_a", "frame_b")
