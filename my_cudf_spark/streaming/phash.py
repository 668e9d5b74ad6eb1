"""Incremental (streaming) perceptual-hash image dedup — the stream twin
of :func:`my_cudf_spark.operators.multimodal.phash_neardup_pairs`, closing
the last cell of the dedup modality×mode matrix (image × stream).

A replayed image stream drops arrivals whose signature sits within
``max_hamming`` of an already-ingested LOWER-ID image.  The keep rule is
deliberately a pure function of the final corpus —
``keep(x) ⇔ ¬∃ y: y.id < x.id ∧ hamming(sig(x), sig(y)) ≤ h`` — so the
streamed end state is arrival-order independent and SQL-checkable (a
plain EXISTS over brute-forced pairs).  Order independence is achieved by
REVOCATION, exactly as :mod:`my_cudf_spark.streaming.semdedup`: when a
lower-id near-duplicate arrives late, the operator re-emits the
previously-kept higher-id image with ``keep = false``.  Keep flags only
ever flip true→false, so the final snapshot per id is the AND of every
emission for that id — no version bookkeeping needed.

Candidate generation is the batch operator's pigeonhole banding turned
into STATE LAYOUT: the signature splits into ``max_hamming + 1`` bands
(any pair within distance h agrees on ≥ 1 whole band), each arrival is
routed to all of its (band_idx, band_val) groups, and cross-batch state
per group holds the full (id, sig) entries whose signature carries that
band value — a distributed inverted band index.  An arriving image is
compared (exact popcount on the stored full signatures) only against
entries sharing a band, never all-pairs.  ``buckets`` groups band keys
into ``hash(band_idx, band_val) % buckets`` state rows (the repo's
bucketed-state pattern — one Arrow-encoded Python invocation per bucket
per batch, vectorized inside).

Each image therefore emits one local keep verdict per band bucket it
lands in (plus later revocations); the consumer folds them with
``bool_and`` grouped by id.  A bucket that never saw a near neighbor
votes true; any bucket that did votes false — AND is the corpus rule.

Scale: state is nbands rows per image of ~20 bytes — the same volume the
batch banded self-join shuffles, held incrementally (RocksDB state store
at production scale).  Per-batch work is ∝ new band rows + band-bucket
collisions, never corpus².  The per-arrival fan-out (nbands state
updates) is the price of dedup-against-everything on a stream; a
production deployment bounds it with a watermark on ingest time exactly
like the text-side streaming dedup.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_phash_dedup"]

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — signatures are < 2^63 so the
    uint64 view is sign-safe."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def _band_offsets(max_hamming: int, sig_bits: int) -> list[int]:
    """Band bit offsets — IDENTICAL split to multimodal.phash_neardup_pairs
    (width = bits // nbands, remainder distributed over leading bands) so
    the stream and batch legs band the same way."""
    nbands = max_hamming + 1
    if nbands > sig_bits:
        raise ValueError(
            f"max_hamming={max_hamming} needs {nbands} bands but the "
            f"signature has only {sig_bits} bits; banding degenerates"
        )
    width = sig_bits // nbands
    extra = sig_bits % nbands
    offs = [i * width + min(i, extra) for i in range(nbands + 1)]
    offs[-1] = sig_bits
    return offs


def stream_phash_dedup(
    df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    max_hamming: int = 3,
    sig_bits: int = 60,
    buckets: int = 8,
) -> DataFrame:
    """Streaming image dedup over (id, sig) rows — see module docstring.

    Emits ``(id, keep)`` verdicts each micro-batch (one per band bucket an
    arrival lands in, plus revocations); final snapshot per id =
    ``bool_and(keep)``.  Batch frames take the equivalent pair rule
    (lower-id near-dup exists → drop) via the banded self-join — the
    oracle for the streamed final state."""
    offs = _band_offsets(max_hamming, sig_bits)
    nbands = max_hamming + 1

    if not df.isStreaming:
        from my_cudf_spark.operators.multimodal import phash_neardup_pairs

        pairs = phash_neardup_pairs(
            df, id_col, sig_col, max_hamming=max_hamming, sig_bits=sig_bits
        )
        dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return df.join(
            dropped.withColumn("__dropped", F.lit(True)), [id_col], "left"
        ).select(
            F.col(id_col).alias("id"),
            (~F.coalesce(F.col("__dropped"), F.lit(False))).alias("keep"),
        )

    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    id_type = typ[id_col]
    out_schema = f"id {id_type}, keep boolean"
    state_schema = (
        f"bis array<int>, bvs array<long>, ids array<{id_type}>,"
        " sigs array<long>"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bis, bvs, ids, sigs = (list(a) for a in state.get)
        else:
            bis, bvs, ids, sigs = [], [], [], []
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=["id", "keep"])
            return
        new = pd.concat(batch, ignore_index=True)
        old = pd.DataFrame(
            {
                "bi": pd.array(bis, dtype="int32"),
                "bv": pd.array(bvs, dtype="int64"),
                "id": pd.array(ids, dtype="int64"),
                "sig": pd.array(sigs, dtype="int64"),
            }
        )
        new_entries = pd.DataFrame(
            {
                "bi": new["__bi"].astype("int32"),
                "bv": new["__bv"].astype("int64"),
                "id": new[id_col].astype("int64"),
                "sig": new[sig_col].astype("int64"),
            }
        )
        everything = pd.concat([old, new_entries], ignore_index=True)
        # candidates: new × (old + new) sharing a band key in this bucket
        cand = new_entries.merge(
            everything, on=["bi", "bv"], suffixes=("_a", "_b")
        )
        cand = cand[cand["id_a"] != cand["id_b"]]
        out: dict[int, bool] = {}
        if len(cand):
            ham = _popcount64(
                np.bitwise_xor(
                    cand["sig_a"].to_numpy(np.int64),
                    cand["sig_b"].to_numpy(np.int64),
                )
            )
            hits = cand[ham <= max_hamming]
            # in any qualifying pair the HIGHER id is the dropped one;
            # higher ids already in state get a revocation emission
            higher = np.maximum(
                hits["id_a"].to_numpy(np.int64), hits["id_b"].to_numpy(np.int64)
            )
            for hid in higher:
                out[int(hid)] = False
        # every distinct new arrival votes: true unless dropped above
        for nid in new_entries["id"].drop_duplicates():
            out.setdefault(int(nid), True)
        bis.extend(int(x) for x in new_entries["bi"])
        bvs.extend(int(x) for x in new_entries["bv"])
        ids.extend(int(x) for x in new_entries["id"])
        sigs.extend(int(x) for x in new_entries["sig"])
        state.update((bis, bvs, ids, sigs))
        yield pd.DataFrame(
            {"id": list(out.keys()), "keep": list(out.values())}
        )

    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col(sig_col), offs[i]).bitwiseAND(
                F.lit((1 << (offs[i + 1] - offs[i])) - 1)
            )
            for i in range(nbands)
        ]
    )
    banded = df.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(band_vals).alias("__bi", "__bv"),
    )
    bucket = F.pmod(F.hash(F.col("__bi"), F.col("__bv")), F.lit(buckets))
    return (
        banded.withColumn("__bkt", bucket)
        .groupBy("__bkt")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
