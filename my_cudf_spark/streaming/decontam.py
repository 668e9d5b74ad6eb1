"""Incremental (streaming) Bloom-filter decontamination — the stream twin
of :func:`my_cudf_spark.operators.decontam.bloom_contamination`: the
benchmark (eval-set) grams and the training corpus arrive INTERLEAVED on
one stream, and every training document is scored against the Bloom
bitmap of every bench gram ever seen — including bench grams that arrive
AFTER the document did.

Order independence is monotonicity, not revocation: Bloom bits only ever
get SET, so a probe verdict flips false→true at most once.  The operator
emits each probe's verdict when the probe arrives, keeps unresolved
probes (misses) as per-bucket pending state, and RE-EMITS a probe with
``hit = true`` the moment a late bench gram sets its bit — so the
``bool_or``-folded final snapshot per probe equals the batch test against
the complete bitmap, whatever the arrival order (the dual of the
keep-flags-only-flip-true→false argument in :mod:`.phash`).

State layout: the ``m_bits``-position space is bucketed by
``word_idx % buckets`` (word_idx = pos // 63, the batch bitmap's word
key), one state row per bucket holding (set words, pending probes).  Each
gram contributes k probe rows routed by position — bench rows set bits,
train rows query them — so per-batch work is ∝ new probe rows in the
bucket, never corpus².  Pending state is bounded by the corpus's
unresolved-miss volume; a production deployment bounds it with an
ingest-time watermark (expire pending probes once the eval side is
sealed), exactly like the text-side streaming dedup.

The final fold (per probe ``bool_or`` → per gram ``bool_and`` over its k
probes → per doc sum) runs as a plain batch aggregation over the drained
update log.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from my_cudf_spark.operators.decontam import bloom_probe_positions

__all__ = ["stream_bloom_decontam"]


def stream_bloom_decontam(
    df: DataFrame,
    id_col: str,
    grams_col: str,
    bench_col: str,
    m_bits: int = 32768,
    k: int = 3,
    salt: str = "bloom",
    buckets: int = 8,
) -> DataFrame:
    """Streaming Bloom decontamination over (id, grams array, is_bench)
    rows — see module docstring.

    Emits ``(doc_id, gram, j, hit)`` probe verdicts each micro-batch
    (every probe at least once; misses re-emitted as hits when a late
    bench gram sets their bit).  Final snapshot: ``bool_or`` per (doc,
    gram, j), ``bool_and`` across j, summed per doc — equal to the batch
    :func:`~my_cudf_spark.operators.decontam.bloom_contamination` against
    the full bench set.  ``gram`` is the 60-bit md5 prefix of the gram
    string (emission identity only; the probe positions hash the string
    itself)."""
    pos = bloom_probe_positions(F.col("gram"), m_bits, k, salt)
    probes = (
        df.filter(F.size(grams_col) > 0)
        .select(
            F.col(id_col).alias("__id"),
            F.col(bench_col).alias("__bench"),
            F.explode(grams_col).alias("gram"),
        )
        .select(
            "__id",
            "__bench",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("__gram"),
            F.posexplode(F.array(*pos)).alias("__j", "__pos"),
        )
        .withColumn(
            "__bkt", F.pmod((F.col("__pos") / 63).cast("int"), F.lit(buckets))
        )
    )

    out_schema = "doc_id long, gram long, j int, hit boolean"
    state_schema = (
        "widx array<int>, wbits array<long>, p_pos array<int>,"
        " p_doc array<long>, p_gram array<long>, p_j array<int>"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            widx, wbits, p_pos, p_doc, p_gram, p_j = (list(a) for a in state.get)
        else:
            widx, wbits, p_pos, p_doc, p_gram, p_j = [], [], [], [], [], []
        words = dict(zip(widx, wbits))
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=["doc_id", "gram", "j", "hit"])
            return
        new = pd.concat(batch, ignore_index=True)

        # 1) bench probes set bits FIRST (intra-batch determinism; the
        #    monotone fold makes any other order converge to the same
        #    final snapshot anyway).
        flipped = False
        for p in new.loc[new["__bench"], "__pos"]:
            p = int(p)
            w, b = p // 63, p % 63
            prev = words.get(w, 0)
            nxt = prev | (1 << b)
            if nxt != prev:
                words[w] = nxt
                flipped = True

        out_doc: list[int] = []
        out_gram: list[int] = []
        out_j: list[int] = []
        out_hit: list[bool] = []

        # 2) late-arrival correction: pending misses whose bit is now set
        #    re-emit as hits and leave state.
        if flipped and p_pos:
            keep_pos, keep_doc, keep_gram, keep_j = [], [], [], []
            for pp, pdc, pg, pj in zip(p_pos, p_doc, p_gram, p_j):
                if (words.get(pp // 63, 0) >> (pp % 63)) & 1:
                    out_doc.append(pdc)
                    out_gram.append(pg)
                    out_j.append(pj)
                    out_hit.append(True)
                else:
                    keep_pos.append(pp)
                    keep_doc.append(pdc)
                    keep_gram.append(pg)
                    keep_j.append(pj)
            p_pos, p_doc, p_gram, p_j = keep_pos, keep_doc, keep_gram, keep_j

        # 3) evaluate this batch's train probes against the updated words.
        train = new.loc[~new["__bench"]]
        for pp, pdc, pg, pj in zip(
            train["__pos"].astype(int),
            train["__id"].astype(int),
            train["__gram"].astype(int),
            train["__j"].astype(int),
        ):
            hit = bool((words.get(pp // 63, 0) >> (pp % 63)) & 1)
            out_doc.append(pdc)
            out_gram.append(pg)
            out_j.append(pj)
            out_hit.append(hit)
            if not hit:
                p_pos.append(int(pp))
                p_doc.append(int(pdc))
                p_gram.append(int(pg))
                p_j.append(int(pj))

        state.update(
            (
                list(words.keys()),
                list(words.values()),
                p_pos,
                p_doc,
                p_gram,
                p_j,
            )
        )
        yield pd.DataFrame(
            {"doc_id": out_doc, "gram": out_gram, "j": out_j, "hit": out_hit}
        )

    return probes.groupBy("__bkt").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
