"""Incremental (streaming) semantic embedding dedup — the stream twin of
:func:`my_cudf_spark.operators.similarity.semantic_dedup`.

A replayed embedding stream drops near-duplicates against everything
already ingested: per Voronoi cell (assignment precomputed as a pure
Column expression — see :func:`cell_assign_expr`), cross-batch state holds
the cell's seen vectors, and an arriving vector is dropped when any
LOWER-ID vector of the same cell is cosine-similar at ``threshold``.

The keep rule is deliberately a pure function of the final corpus —
``keep(x) ⇔ ¬∃ y: y.id < x.id ∧ cell(y) = cell(x) ∧ cos(x,y) ≥ τ`` — so
the streamed END STATE is arrival-order independent and SQL-checkable
(a plain EXISTS over within-cell pairs, no recursion).  Order
independence is achieved by REVOCATION: when a lower-id near-duplicate
arrives late, the operator re-emits the previously-kept higher-id row
with ``keep = false``; keep flags only ever flip true→false, and each
emission carries a per-bucket monotone ``ver`` so the final snapshot per
id is the row with the maximal ``ver``.

Versus the batch operator (similarity.semantic_dedup, connected
components + min-id canonical): the incremental rule is the SEQUENTIAL
dedup a continuously-ingested corpus actually applies — each document is
judged against the corpus as of its arrival (cf. the text-side
``dedup.incremental_dedup`` contract) — and the two rules agree on every
pairwise-complete cluster; they differ only on similarity chains
(a~b, b~c, a≁c: components drop b AND c, the sequential rule keeps c).

Scale: state is the cell-partitioned corpus itself — inherent to
dedup-against-everything (SemDeDup holds its 5B embeddings in 50k
clusters the same way); per-cell work for a batch is new×seen matmul,
summing to the same cell-bounded quadratic as the batch operator, and
the per-batch shuffle carries only the new rows.  ``buckets`` groups
cells into ``hash(cell) % buckets`` state rows — one Arrow-encoded
Python invocation per bucket per batch.  State lives in the state store
(RocksDB at production scale); a memory-bounded variant would subsample
representatives per cell at a documented recall cost.

Cosine note: the in-batch comparisons run as numpy float64 matmul
(pairwise summation) while the SQL oracle sums sequentially — last-ulp
differences, harmless because fixture cosines sit ≥ 1e-4 from the
threshold (checked empirically; organic cosines never land within ulps
of τ).  Cell ASSIGNMENT, whose top-1 gaps run as small as 1e-4, is
computed as a sequential-fold Column expression instead
(:func:`cell_assign_expr`) — bit-identical to the oracle's
``list_dot_product``.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from my_cudf_spark.operators.similarity import dot, l2_norm

__all__ = [
    "cell_assign_expr",
    "cell_assign_pandas",
    "seed_centroid_rows",
    "stream_semantic_dedup",
]


def seed_centroid_rows(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> list[list[float]]:
    """Fetch the ``n_centroids`` lowest-id embeddings as a Python list —
    the deterministic seeding of similarity._seed_centroids, materialized
    driver-side so :func:`cell_assign_expr` can inline them as literals
    (usable on STREAMS, where the window-rank assignment of
    similarity._assign_nearest is illegal).

    Driver materialization is BOUNDED at n_centroids × dim floats (the
    MLlib-KMeans pattern — centroids always live on the driver between
    iterations); ``take`` over orderBy().limit() plans as
    TakeOrderedAndProject, so the corpus never funnels through one task."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).take(n_centroids)
    return [[float(x) for x in r[1]] for r in rows]


def cell_assign_expr(centroids: Sequence[Sequence[float]], vec_col: str) -> Column:
    """Nearest-centroid cell id as a pure Column expression (argmax cosine,
    ties → lowest cid): centroids ride as array literals, every dot
    product is the same sequential fold the DuckDB oracle's
    ``list_dot_product`` performs — bit-identical assignment, and legal in
    a streaming plan (no window).  Cost O(n_centroids × dim) per row,
    JVM-side."""
    v = F.col(vec_col)
    vn = l2_norm(v)
    scored = []
    for cid, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        # sequential accumulation, bit-identical to the oracle's
        # list_dot_product (np.dot would sum pairwise/BLAS-order)
        c2 = 0.0
        for x in c:
            c2 += float(x) * float(x)
        cn = float(np.sqrt(c2))
        scored.append(
            F.struct(
                (dot(v, lit_c) / (vn * F.lit(cn))).alias("cos"),
                F.lit(cid).alias("cid"),
            )
        )
    best = F.aggregate(
        F.array(*scored),
        F.struct(F.lit(float("-inf")).alias("cos"), F.lit(-1).alias("cid")),
        # strict > keeps the FIRST maximal element → ties resolve to the
        # lowest cid, matching the oracle's ORDER BY cos DESC, cid
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
    )
    return best["cid"]


def _centroid_norms(centroids: Sequence[Sequence[float]]) -> list[float]:
    """Per-centroid L2 norms with the SAME plain sequential Python fold
    ``cell_assign_expr`` inlines as literals (np.dot would sum in BLAS
    order and could flip an ulp-close tie)."""
    out = []
    for c in centroids:
        c2 = 0.0
        for x in c:
            c2 += float(x) * float(x)
        out.append(float(np.sqrt(c2)))
    return out


def _seq_cells(
    X: "np.ndarray",
    cents: "np.ndarray",
    cnorms: Sequence[float],
) -> "np.ndarray":
    """Vectorized-across-rows, SEQUENTIAL-across-dims nearest-centroid
    assignment — bit-identical to :func:`cell_assign_expr` (and therefore
    to the oracle's ``list_dot_product`` fold): every per-row accumulator
    follows the exact IEEE add order of the sequential fold (acc starts
    0.0; acc = acc + x_d·c_d in dim order), the norm is the identical
    acc + v·v fold under one sqrt, cos = dot / (vn·cn) in the same
    operation order, and strict ``>`` keeps the FIRST maximal centroid
    (ties → lowest cid).  NumPy float64 elementwise ops are IEEE — the
    same doubles the JVM produces.  O(n_centroids × dim) numpy ops, no
    expression tree, no per-batch codegen."""
    n = X.shape[0]
    vn = np.zeros(n, dtype=np.float64)
    for d in range(X.shape[1]):
        x = X[:, d]
        vn += x * x
    vn = np.sqrt(vn)
    best_cos = np.full(n, -np.inf, dtype=np.float64)
    best_cid = np.full(n, -1, dtype=np.int32)
    for cid in range(cents.shape[0]):
        c = cents[cid]
        acc = np.zeros(n, dtype=np.float64)
        for d in range(cents.shape[1]):
            acc += X[:, d] * c[d]
        cos = acc / (vn * cnorms[cid])
        m = cos > best_cos
        best_cos[m] = cos[m]
        best_cid[m] = cid
    return best_cid


def _stack_vectors(vs: "pd.Series") -> "np.ndarray":
    """Arrow list<double> Series → (n, dim) float64 matrix; loud error on
    null/ragged rows (the frozen-epoch streams never carry them)."""
    rows = vs.to_numpy()
    try:
        return np.stack([np.asarray(r, dtype=np.float64) for r in rows])
    except Exception as e:  # pragma: no cover — defensive
        raise ValueError(
            f"cell assignment: null or ragged vector in batch ({e})"
        ) from e


def cell_assign_pandas(centroids: Sequence[Sequence[float]], vec_col) -> Column:
    """Nearest-centroid cell id as ONE Arrow-batched pandas projection —
    the value-identical replacement for :func:`cell_assign_expr` on hot
    streaming paths (guide §4.2).  The literal-tree Column form costs
    ~1.4 s of py4j expression construction PER CALL plus ~1 s/micro-batch
    of query planning and codegen of a ~10⁴-node expression; this kernel
    is a closure over n_centroids × dim floats and runs the bit-identical
    arithmetic (see :func:`_seq_cells`) in a handful of vectorized NumPy
    ops per batch.  Legal on a stream (stateless projection)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(
        [[float(x) for x in c] for c in centroids], dtype=np.float64
    )
    cnorms = _centroid_norms(centroids)

    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        return pd.Series(_seq_cells(_stack_vectors(vs), cents, cnorms))

    _assign.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return pandas_udf(_assign, "int")(v)


def stream_semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    threshold: float,
    buckets: int = 8,
) -> DataFrame:
    """Streaming semantic dedup over (id, cell, vec) rows — see module
    docstring for semantics.  Emits ``(cell, id, keep, ver)`` updates each
    micro-batch (new arrivals + revocations); final snapshot per id = the
    row with maximal ``ver``.  Batch frames take the equivalent
    within-cell pair rule (lower-id near-dup exists → drop) — the oracle
    for the streamed final state."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if not df.isStreaming:
        a = df.select(
            F.col(cell_col).alias("__ca"),
            F.col(id_col).alias("__ida"),
            F.col(vec_col).alias("__va"),
            l2_norm(F.col(vec_col)).alias("__na"),
        )
        b = df.select(
            F.col(cell_col).alias("__cb"),
            F.col(id_col).alias("__idb"),
            F.col(vec_col).alias("__vb"),
            l2_norm(F.col(vec_col)).alias("__nb"),
        )
        dropped = (
            a.join(
                b,
                (F.col("__ca") == F.col("__cb"))
                & (F.col("__idb") < F.col("__ida"))
                & (
                    dot(F.col("__va"), F.col("__vb"))
                    / (F.col("__na") * F.col("__nb"))
                    >= threshold
                ),
                "left_semi",
            )
            .select(F.col("__ca").alias(cell_col), F.col("__ida").alias(id_col))
        )
        marked = df.join(
            dropped.withColumn("__dropped", F.lit(True)),
            [cell_col, id_col],
            "left",
        )
        return marked.select(
            F.col(cell_col).cast("int").alias("cell"),
            F.col(id_col).alias("id"),
            (~F.coalesce(F.col("__dropped"), F.lit(False))).alias("keep"),
            F.lit(1).cast("long").alias("ver"),
        )

    id_type = typ[id_col]
    out_schema = f"cell int, id {id_type}, keep boolean, ver bigint"
    state_schema = (
        f"cells array<int>, ids array<{id_type}>, flat array<double>,"
        " norms array<double>, keeps array<boolean>, dim int, ver bigint"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cells, ids, flat, norms, keeps, dim, ver = state.get
            cells = list(cells)
            ids = list(ids)
            norms = np.asarray(norms, dtype=np.float64)
            keeps = list(keeps)
            V = np.asarray(flat, dtype=np.float64).reshape(-1, dim) if dim else None
        else:
            cells, ids, keeps = [], [], []
            norms = np.empty(0)
            V = None
            dim, ver = 0, 0
        batch = [pdf for pdf in pdfs if len(pdf)]
        if not batch:
            yield pd.DataFrame(columns=["cell", "id", "keep", "ver"])
            return
        b = pd.concat(batch, ignore_index=True).sort_values([cell_col, id_col])
        ver += 1
        out_rows: list[dict] = []
        cell_arr = np.asarray(cells)
        id_arr = np.asarray(ids)
        for cell, grp in b.groupby(cell_col, sort=True):
            cell = int(cell)
            new_ids = grp[id_col].to_numpy()
            NV = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in grp[vec_col]]
            )
            if dim == 0:
                dim = NV.shape[1]
                V = np.empty((0, dim))
            new_norms = np.sqrt((NV * NV).sum(axis=1))
            old_idx = (
                np.nonzero(cell_arr == cell)[0] if len(cell_arr) else np.empty(0, int)
            )
            OV = V[old_idx] if len(old_idx) else np.empty((0, dim))
            o_norms = norms[old_idx] if len(old_idx) else np.empty(0)
            o_ids = id_arr[old_idx] if len(old_idx) else np.empty(0, dtype=new_ids.dtype)
            # new × (old + new) cosines — the only quadratic, cell-bounded
            AV = np.concatenate([OV, NV])
            a_norms = np.concatenate([o_norms, new_norms])
            a_ids = np.concatenate([o_ids, new_ids])
            cos = (NV @ AV.T) / np.outer(new_norms, a_norms)
            near = cos >= threshold
            lower = a_ids[None, :] < new_ids[:, None]
            # keep(new i) ⇔ no lower-id near neighbor among all seen
            new_keep = ~(near & lower).any(axis=1)
            for i, nid in enumerate(new_ids):
                out_rows.append(
                    {"cell": cell, "id": nid, "keep": bool(new_keep[i]), "ver": ver}
                )
            # revocation: an old kept row with a NEW lower-id near neighbor
            if len(old_idx):
                kills = near[:, : len(old_idx)] & (
                    new_ids[:, None] < o_ids[None, :]
                )
                for j_local in np.nonzero(kills.any(axis=0))[0]:
                    j = old_idx[j_local]
                    if keeps[j]:
                        keeps[j] = False
                        out_rows.append(
                            {"cell": cell, "id": ids[j], "keep": False, "ver": ver}
                        )
            # append new rows to state
            cells.extend([cell] * len(new_ids))
            ids.extend(new_ids.tolist())
            V = np.concatenate([V, NV])
            norms = np.concatenate([norms, new_norms])
            keeps.extend(bool(k) for k in new_keep)
            cell_arr = np.asarray(cells)
            id_arr = np.asarray(ids)
        state.update(
            (
                cells,
                ids,
                V.reshape(-1).tolist(),
                norms.tolist(),
                keeps,
                dim,
                ver,
            )
        )
        yield pd.DataFrame(out_rows, columns=["cell", "id", "keep", "ver"])

    bucket = F.pmod(F.hash(F.col(cell_col)), F.lit(buckets))
    return (
        df.select(
            F.col(cell_col).cast("int").alias(cell_col),
            F.col(id_col),
            F.col(vec_col),
        )
        .withColumn("__bkt", bucket)
        .groupBy("__bkt")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
