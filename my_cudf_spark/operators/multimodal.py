"""Multimodal (image/audio/video) column plumbing (north star; no
reference equivalent — cudf stops at strings/lists/structs).

Design: media is an opaque ``binary`` payload column plus a typed metadata
struct (``media_meta_schema``); decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so each Python
worker sees a columnar batch of payloads (one numpy decode per batch, no
per-row IPC).  The image/audio codecs are not installed in this
environment, so the codec boundary is a pluggable ``decoder`` callable:
``pil_decoder``/``ffmpeg_decoder`` raise NotImplementedError with install
hints, while ``raw_gray_decoder`` (bytes → 1×N gray8 ndarray,
deterministic) exercises the full pipeline — schema, partitioning, UDF
signature, batch shape — and is SQL-replicable, so the feature stage is
oracle-checked end-to-end.

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves each partition's binary column in bulk; feature rows shrink the data
(bytes → a handful of doubles), so the expensive decode sits before the
first shuffle and partition sizing (``spark.sql.files.maxPartitionBytes``)
is the only knob that matters.  Metadata-only predicates (width/fmt/
duration) are plain columns → Catalyst prunes/pushes them without touching
payload bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "media_meta_schema",
    "attach_payload",
    "raw_gray_decoder",
    "pil_decoder",
    "image_features",
    "resize_gray",
    "frame_sample",
    "audio_landmarks",
    "video_frame_signatures",
]


def media_meta_schema() -> StructType:
    """Typed metadata carried next to the opaque payload."""
    return StructType(
        [
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("frames", IntegerType()),
        ]
    )


def attach_payload(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Fixture adapter: treat a text column's UTF-8 bytes as a 1×N gray8
    image payload with populated metadata.  Real pipelines read payloads
    with ``spark.read.format("binaryFile")`` or from parquet binary
    columns; everything downstream is identical."""
    return df.withColumn("payload", F.encode(F.col(content_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("gray8").alias("fmt"),
            F.octet_length("payload").alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(1).alias("frames"),
        ),
    )


def raw_gray_decoder(payload: bytes, meta: Any) -> "Any":
    """Deterministic stand-in codec: payload bytes ARE the 1×N gray8
    pixels.  Keeps the full mapInPandas pipeline testable (and
    SQL-replicable: pixel values = byte values) without image libraries."""
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8).reshape(1, -1)


def pil_decoder(payload: bytes, meta: Any) -> "Any":
    """Real-image codec seam — requires Pillow, which is not installed in
    this environment; the decode stage is STUBBED here by design."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pil_decoder needs Pillow (`pip install pillow`); use "
            "raw_gray_decoder for the deterministic test codec"
        ) from e
    import io as _io

    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(_io.BytesIO(payload)))


def _feature_schema(id_col: str) -> str:
    return (
        f"{id_col} long, n_bytes long, mean_px double, min_px int, max_px int"
    )


def image_features(
    df: DataFrame,
    id_col: str,
    decoder: Callable[[bytes, Any], Any] = raw_gray_decoder,
) -> DataFrame:
    """Decode + per-image features via one Arrow-batched pass
    (mapInPandas): (n_bytes, mean/min/max pixel).  The decoder sees raw
    bytes; everything else is numpy on the decoded array."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["media_meta"]
            ):
                img = decoder(payload, meta)
                arr = np.asarray(img, dtype=np.float64)
                rows.append(
                    (
                        rid,
                        len(payload),
                        float(arr.mean()) if arr.size else 0.0,
                        int(arr.min()) if arr.size else 0,
                        int(arr.max()) if arr.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_bytes", "mean_px", "min_px", "max_px"]
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        run, schema=_feature_schema(id_col)
    )


def resize_gray(
    df: DataFrame,
    id_col: str,
    out_width: int,
    decoder: Callable[[bytes, Any], Any] = raw_gray_decoder,
) -> DataFrame:
    """Nearest-neighbor resize of 1×N gray images to 1×out_width, returned
    as a re-encoded payload (bytes) + updated metadata — the shape of any
    decode → transform → re-encode media stage."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["media_meta"]
            ):
                arr = np.asarray(decoder(payload, meta)).ravel()
                if arr.size:
                    idx = (np.arange(out_width) * arr.size // out_width).clip(
                        0, arr.size - 1
                    )
                    out = arr[idx].astype(np.uint8).tobytes()
                else:
                    out = b""
                rows.append((rid, out, out_width))
            yield pd.DataFrame(rows, columns=[id_col, "payload", "width"])

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
        ]
    )
    return df.select(id_col, "payload", "media_meta").mapInPandas(run, schema=schema)


def frame_sample(
    df: DataFrame,
    id_col: str,
    every_k: int,
    decoder: Callable[[bytes, Any], Any] = raw_gray_decoder,
) -> DataFrame:
    """Sample every k-th frame (here: byte) of a "video" payload and emit
    one row per sampled frame with its index and value — the explode-shaped
    stage of a frame-extraction pipeline."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, fidx, fval = [], [], []
            for rid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["media_meta"]
            ):
                arr = np.asarray(decoder(payload, meta)).ravel()
                sel = np.arange(0, arr.size, every_k)
                ids.extend([rid] * len(sel))
                fidx.extend(sel.tolist())
                fval.extend(arr[sel].astype(int).tolist())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "frame_val": fval}
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        run, schema=f"{id_col} long, frame_idx int, frame_val int"
    )


def dhash_signatures(
    df: DataFrame,
    id_col: str,
    decoder: Callable[[bytes, Any], Any] = raw_gray_decoder,
    grid_rows: int = 10,
    grid_cols: int = 7,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode, block-mean
    downsample the flattened pixels to a ``grid_rows × grid_cols`` grid
    (block k of n pixels covers positions p with ⌊p·nb/n⌋ = k), then one
    bit per horizontally adjacent block pair — bit (r·(cols−1)+c) set iff
    mean(r,c+1) > mean(r,c).  Default 10×7 grid → 60 bits, the repo's
    SQL-safe signature width (md5_hash60 convention — packs into BIGINT
    without sign games on either engine).  A comparison with an EMPTY
    block (n < nb) contributes 0, so short payloads are well-defined.

    Near-identical images (small pixel edits) differ in few block means →
    small hamming distance; pair them with :func:`phash_neardup_pairs`.
    Integer pixel sums are exact in doubles and both engines divide the
    same operands, so the signature is bit-identical to the SQL oracle —
    the mm_phash_signatures driver row checks all 60 bits per doc.

    One Arrow-batched mapInPandas pass; output is (id, sig) — kilobytes
    per million images, the shape that makes the downstream banded join
    cheap at 100 TB."""
    import numpy as np
    import pandas as pd

    nb = grid_rows * grid_cols

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_ids, out_sigs = [], []
            for rid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["media_meta"]
            ):
                arr = np.asarray(decoder(payload, meta)).ravel()
                n = arr.size
                sig = 0
                if n:
                    blk = (np.arange(n) * nb) // n
                    s = np.bincount(
                        blk, weights=arr.astype(np.float64), minlength=nb
                    )
                    c = np.bincount(blk, minlength=nb)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        m = s / c
                    for r in range(grid_rows):
                        for col in range(grid_cols - 1):
                            k = r * grid_cols + col
                            if (
                                c[k] > 0
                                and c[k + 1] > 0
                                and m[k + 1] > m[k]
                            ):
                                sig |= 1 << (r * (grid_cols - 1) + col)
                out_ids.append(rid)
                out_sigs.append(sig)
            yield pd.DataFrame({id_col: out_ids, "sig": out_sigs})

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        run, schema=f"{id_col} long, sig long"
    )


def phash_neardup_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    max_hamming: int = 3,
    sig_bits: int = 60,
) -> DataFrame:
    """Near-duplicate image pairs by signature hamming distance ≤
    ``max_hamming`` — the multimodal leg of the dedup tier.

    Candidate generation is the SimHash pigeonhole banding: split the
    signature into ``max_hamming + 1`` bands; any pair within distance
    ``max_hamming`` agrees on ≥ 1 whole band (diffs land in ≤ max_hamming
    bands) → per-band equi-join, exact popcount verify on candidates
    only.  COMPLETE (every qualifying pair, proven vs brute force in
    tests/test_multimodal.py AND vs the mm_phash_pairs brute-force
    oracle), never all-pairs.

    Plan shape: the (id, sig) projection is persisted once (signatures
    are ~12 bytes/row — KBs per million images) and BANDED SELF-JOINED on
    (band_idx, band_val) — unlike the collect_list pair expansion the
    text dedup ops use, which is quadratic in ARRAY MATERIALIZATION per
    bucket and assumes tiny buckets; wide hamming bounds make buckets
    hundreds deep, where the hash self-join (shuffle ∝ banded rows, pairs
    streamed through codegen, never held as an array) is several times
    cheaper.  id_a < id_b is part of the join condition so the pair
    stream halves before the popcount filter."""
    from my_cudf_spark.plans.pin import lru_persist

    nbands = max_hamming + 1
    if nbands > sig_bits:
        # width 0 would band every signature into the same bucket — a
        # silent all-pairs cross join.  A bound that wide is all-pairs by
        # construction; make the caller say so explicitly.
        raise ValueError(
            f"max_hamming={max_hamming} needs {nbands} bands but the "
            f"signature has only {sig_bits} bits; banding degenerates"
        )
    width = sig_bits // nbands
    extra = sig_bits % nbands  # first `extra` bands take one bit more
    offs = [i * width + min(i, extra) for i in range(nbands + 1)]
    offs[-1] = sig_bits
    s = lru_persist(
        sig_df.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sh"))
    )

    def banded(tag: str) -> DataFrame:
        return s.select(
            F.col("id").alias(f"id_{tag}"),
            F.col("sh").alias(f"sh_{tag}"),
            F.posexplode(
                F.array(*[
                    F.shiftrightunsigned(F.col("sh"), offs[i]).bitwiseAND(
                        F.lit((1 << (offs[i + 1] - offs[i])) - 1)
                    )
                    for i in range(nbands)
                ])
            ).alias(f"bi_{tag}", f"bv_{tag}"),
        )

    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        banded("a")
        .join(
            banded("b"),
            (F.col("bi_a") == F.col("bi_b"))
            & (F.col("bv_a") == F.col("bv_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def audio_landmarks(
    df: DataFrame,
    id_col: str,
    decoder: Callable[[bytes, Any], Any] = raw_gray_decoder,
) -> DataFrame:
    """Spectral landmark fingerprints per audio clip (Shazam-style
    peak-pair hashing, Wang 2003) — the audio leg of the multimodal dedup
    tier.

    The payload is framed into non-overlapping 4-sample windows and each
    frame gets its DFT energies at bins k=1 and k=2.  Window 4 is the one
    width where those bins' twiddle factors are all in {-1, 0, 1}
    (cos/sin of multiples of π/2), so the spectrum is EXACT integer
    arithmetic — e1 = (x0−x2)² + (x1−x3)², e2 = (x0−x1+x2−x3)² — making
    the whole fingerprint SQL-replicable (the dHash convention: design
    the signature so the oracle can recompute it bit-for-bit).  A real
    deployment swaps the frame transform for np.fft.rfft over 1024-sample
    windows behind the same decoder seam; everything downstream
    (landmark pairing, inverted-index join) is unchanged.

    Each frame contributes its dominant bin b and that bin's energy; a
    LANDMARK is the pair of adjacent frames' (b, energy) peaks —
    ``"b:e>b':e'"`` — the anchor→target peak pairing that makes Shazam
    fingerprints robust: one corrupted sample invalidates at most two
    landmarks out of n/4.  Output is (id, lms array<string>); feed to
    ``dedup.neardup_pairs_exact`` for Jaccard pairing via the
    inverted-index join (posting lists are short because exact energies
    are high-entropy — the property the 100 TB join shape needs).

    One Arrow-batched mapInPandas pass; clips shorter than 2 frames yield
    an empty landmark set (nothing fingerprintable, row preserved)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_ids, out_lms = [], []
            for rid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["media_meta"]
            ):
                x = np.asarray(decoder(payload, meta)).ravel().astype(np.int64)
                nfr = x.size // 4
                lms: list[str] = []
                if nfr >= 2:
                    fr = x[: nfr * 4].reshape(nfr, 4)
                    re1 = fr[:, 0] - fr[:, 2]
                    im1 = fr[:, 1] - fr[:, 3]
                    re2 = fr[:, 0] - fr[:, 1] + fr[:, 2] - fr[:, 3]
                    e1 = re1 * re1 + im1 * im1
                    e2 = re2 * re2
                    dom = e1 >= e2  # tie → lower bin, matching the oracle
                    b = np.where(dom, 1, 2)
                    ed = np.where(dom, e1, e2)
                    toks = [f"{b[t]}:{ed[t]}" for t in range(nfr)]
                    lms = [f"{toks[t]}>{toks[t + 1]}" for t in range(nfr - 1)]
                out_ids.append(rid)
                out_lms.append(lms)
            yield pd.DataFrame({id_col: out_ids, "lms": out_lms})

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        run, schema=f"{id_col} long, lms array<string>"
    )


def video_frame_signatures(
    df: DataFrame,
    id_col: str,
    frame_bytes: int = 16,
    decoder: Callable[[bytes, Any], Any] = raw_gray_decoder,
) -> DataFrame:
    """Per-frame content signatures for a "video" payload: the decoded
    sample stream is chunked into consecutive ``frame_bytes``-sample
    frames (ragged tail dropped) and each frame gets an md5 content hash
    — output ``(id, fsigs array<string>)``, the frame-sequence view
    temporal dedup consumes.

    Video near-dup = two clips sharing a RUN of identical frames at some
    temporal offset; that is exactly the duplicated-substring problem
    over frame-signature tokens, so pairing reuses
    ``dedup.substring_dup_spans`` (positional shingles + inverted index +
    diagonal gaps-and-islands) with frames as tokens — one machinery for
    text passages and video segments.  A real deployment swaps the chunk
    step for codec keyframe extraction + a perceptual per-frame hash
    (dhash_signatures) behind the same decoder seam; exact md5 keeps the
    whole chain SQL-replicable here (the dHash convention).

    One Arrow-batched mapInPandas pass; signature volume is
    32 bytes/frame — the shape that makes the downstream index join
    cheap at scale."""
    import hashlib

    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_ids, out_sigs = [], []
            for rid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["media_meta"]
            ):
                x = np.asarray(decoder(payload, meta), dtype=np.uint8).ravel()
                nf = x.size // frame_bytes
                raw = x[: nf * frame_bytes].tobytes()
                out_ids.append(rid)
                out_sigs.append(
                    [
                        hashlib.md5(
                            raw[j * frame_bytes : (j + 1) * frame_bytes]
                        ).hexdigest()
                        for j in range(nf)
                    ]
                )
            yield pd.DataFrame({id_col: out_ids, "fsigs": out_sigs})

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        run, schema=f"{id_col} long, fsigs array<string>"
    )
