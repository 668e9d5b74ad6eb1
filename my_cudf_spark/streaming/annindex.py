"""Incremental (streaming) ANN index maintenance — the missing loop
around the batch IVF family (similarity.ivf_topk / pq_topk / ivfpq_topk,
which rebuild their index per call): a growing corpus streams in, each
vector is assigned to the FROZEN coarse quantizer's Voronoi cell
(:func:`~my_cudf_spark.streaming.semdedup.cell_assign_expr` — a pure
Column projection, bit-identical to the batch assignment and legal on a
stream), and the per-cell POSTING LISTS accumulate as cross-batch state.
Draining the stream yields exactly the inverted file the batch operator
would build over the full corpus — so a top-k probe against the drained
index equals batch ``ivf_topk`` on base + delta, which is the oracle.

Epochs: the quantizer is frozen per index epoch (the real-world contract
— FAISS/ScaNN style IVF indexes never move centroids under live
ingest).  A re-train is a NEW epoch: recompute centroids from
:func:`~my_cudf_spark.streaming.kmeans.stream_cluster_stats`'s drained
sufficient statistics (that operator is the M-step carrier), bump the
epoch id, and rebuild state under the new key — emissions carry the
epoch so a reader ignores (revokes) snapshots from stale epochs.  PQ
code assignment rides the same projection shape (codebook literals per
subspace) once cells are frozen.

Scale: state is ids only — the index, not the corpus (vectors stay in
the lake and join back by id at query time, exactly how a posting-list
index works); per-cell emission volume is the cell's cumulative posting
list, O(corpus/cells) per cell.  Assignment is O(rows × centroids × dim)
JVM-side arithmetic with the centroid literals broadcast inside the
plan; the only shuffle per batch carries the new rows once, keyed by
cell bucket.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_ann_index"]


def stream_ann_index(
    df: DataFrame,
    id_col: str,
    cell_col: str,
    epoch: int = 0,
    buckets: int = 4,
) -> DataFrame:
    """Maintain per-cell posting lists over a stream of (id, cell) rows
    (cell precomputed with ``cell_assign_expr`` against the epoch's
    frozen centroids).  Emits the cumulative ``(epoch, cell, n, ids)``
    snapshot for every cell a micro-batch touches; ``n`` is strictly
    increasing per cell, so the final index is the max-``n`` emission
    per cell — ids are kept sorted, making the snapshot a pure function
    of the final id set (arrival-order and chunking independent)."""
    rows = df.select(
        F.col(cell_col).cast("int").alias("__cell"),
        F.col(id_col).cast("long").alias("__id"),
    ).withColumn("__bkt", F.pmod(F.col("__cell"), F.lit(buckets)))

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cells, ids = state.get
            cells = np.asarray(cells, dtype=np.int64)
            ids = np.asarray(ids, dtype=np.int64)
        else:
            cells = np.empty(0, dtype=np.int64)
            ids = np.empty(0, dtype=np.int64)
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=["epoch", "cell", "n", "ids"])
            return
        new = pd.concat(batch, ignore_index=True)
        cells = np.concatenate([cells, new["__cell"].to_numpy(np.int64)])
        ids = np.concatenate([ids, new["__id"].to_numpy(np.int64)])
        # cell-major, id-minor: per-cell postings are contiguous sorted
        # slices — state stays canonical whatever the arrival order
        order = np.lexsort((ids, cells))
        cells, ids = cells[order], ids[order]
        touched = np.unique(new["__cell"].to_numpy(np.int64))
        starts = np.searchsorted(cells, touched, side="left")
        ends = np.searchsorted(cells, touched, side="right")
        out = pd.DataFrame(
            {
                "epoch": np.full(len(touched), epoch, dtype=np.int64),
                "cell": touched.astype(np.int32),
                "n": (ends - starts).astype(np.int64),
                "ids": [ids[a:b].tolist() for a, b in zip(starts, ends)],
            }
        )
        state.update((cells.tolist(), ids.tolist()))
        yield out

    return rows.groupBy("__bkt").applyInPandasWithState(
        update,
        outputStructType="epoch long, cell int, n long, ids array<long>",
        stateStructType="cells array<int>, ids array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
