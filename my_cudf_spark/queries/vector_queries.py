"""Embedding-similarity correctness queries (north star) over the
``embeddings`` fixture (vec_id, embedding array<float>, label).

Float policy: embeddings are float32; both sides cast to double BEFORE any
arithmetic and both engines reduce the 64-dim dot product sequentially →
bit-identical cosines; displayed values rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_cudf_spark.operators import similarity as S
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


def _as_double(df: DataFrame) -> DataFrame:
    return df.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))


@register(
    "vec_stats",
    sql="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id, label,
           CAST(len(v) AS INT) AS dim,
           ROUND(sqrt(list_dot_product(v, v)), 6) AS l2,
           ROUND(list_aggregate(v, 'sum') / len(v), 6) AS mean_val,
           ROUND(list_aggregate(v, 'max'), 6) AS max_val
    FROM e ORDER BY vec_id
    """,
)
def vec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math over embedding columns: norms, means, extrema
    (list-level reductions — reference lists/ + reduction.hpp surface)."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.size(v).alias("dim"),
        F.round(S.l2_norm(v), 6).alias("l2"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size(v), 6).alias("mean_val"),
        F.round(F.array_max(v), 6).alias("max_val"),
    ).orderBy("vec_id")


@register(
    "vec_topk_cosine",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
         s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                      list_dot_product(q.v, c.v)
                        / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
               FROM e c, q WHERE c.vec_id <> q.vec_id),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the ANN correctness baseline): broadcast
    query set × corpus, per-query window. LSH variant is rows-only below."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 6).alias("cos"), F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


@register(
    "vec_topk_lsh",
    sql="""
    WITH p AS (SELECT t.t AS t, b.b AS b, d.d AS d,
                      CASE WHEN substr(md5(t.t || '|' || b.b || '|' || d.d), 1, 1) >= '8'
                           THEN 1.0 ELSE -1.0 END AS w
               FROM range(16) t(t) CROSS JOIN range(4) b(b) CROSS JOIN range(64) d(d)),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ed AS (SELECT vec_id, d.d AS d, v[d.d + 1] AS x FROM e CROSS JOIN range(64) d(d)),
    dots AS (SELECT ed.vec_id, p.t, p.b, SUM(ed.x * p.w) AS s
             FROM ed JOIN p ON ed.d = p.d GROUP BY 1, 2, 3),
    sigs AS (SELECT vec_id, t, SUM(CASE WHEN s > 0 THEN (1 << b) ELSE 0 END) AS sig
             FROM dots GROUP BY 1, 2),
    bk AS (SELECT vec_id, t || ':' || CAST(sig AS VARCHAR) AS bucket FROM sigs),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM bk c JOIN bk q USING (bucket)
             WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
    scored AS (SELECT cand.query_id, cand.neighbor_id,
                      list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
               FROM cand JOIN e a ON a.vec_id = cand.query_id
                         JOIN e b ON b.vec_id = cand.neighbor_id),
    r AS (SELECT query_id, neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH (the scale path: bucket
    join instead of full cross product).  Recall vs brute force asserted in
    tests/test_similarity.py.

    Oracle-checkable: the hyperplanes are md5-derived Rademacher (±1)
    entries (similarity.md5_rademacher_planes), so DuckDB regenerates the
    exact planes, signatures and buckets — the whole approximate pipeline
    is a deterministic function both engines compute identically."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.lsh_topk(
        emb, queries, "vec_id", "embedding", k=5, dim=64, bits=4, tables=16,
        plane_source="md5",
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 6).alias("cos"), F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


@register(
    "vec_neardup_pairs",
    sql="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(cos, 6) AS cos
    FROM p WHERE cos >= 0.25 ORDER BY id_a, id_b
    """,
)
def vec_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact): same-label blocking bounds
    the quadratic and hash-partitions the join; cosine computed once per
    surviving pair.  The correctness baseline for cosine_neardup_lsh (the
    scale path, recall-tested against this in tests/test_similarity.py).
    Threshold 0.25 sits in the fixture's top-1% similarity tail."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    out = S.cosine_pairs_exact(emb, "vec_id", "embedding", 0.25, block_col="label")
    return out.select(
        "id_a", "id_b", F.round("cos", 6).alias("cos")
    ).orderBy("id_a", "id_b")


@register(
    "vec_topk_ivf",
    sql="""
    WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
               FROM embeddings),
    cents AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv, nn AS cn
              FROM n QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
    ca AS (SELECT n.vec_id AS neighbor_id, n.v, n.nn, c.cid,
                  ROW_NUMBER() OVER (PARTITION BY n.vec_id
                      ORDER BY list_dot_product(n.v, c.cv)/(n.nn*c.cn) DESC, c.cid) AS pr
           FROM n CROSS JOIN cents c),
    buckets AS (SELECT neighbor_id, v, nn, cid FROM ca WHERE pr = 1),
    qa AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nn AS qn, c.cid,
                  ROW_NUMBER() OVER (PARTITION BY n.vec_id
                      ORDER BY list_dot_product(n.v, c.cv)/(n.nn*c.cn) DESC, c.cid) AS pr
           FROM n CROSS JOIN cents c WHERE n.vec_id < 5),
    probes AS (SELECT query_id, qv, qn, cid FROM qa WHERE pr <= 4),
    s AS (SELECT p.query_id, b.neighbor_id,
                 list_dot_product(p.qv, b.v)/(p.qn*b.nn) AS cos
          FROM probes p JOIN buckets b USING (cid)
          WHERE b.neighbor_id <> p.query_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS rank FROM s)
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (operators/similarity.ivf_topk): 16 seeded Voronoi cells,
    4-probe search — the inverted-file scale path next to vec_topk_lsh,
    deterministic (seeded centroids, no Lloyd step) so the DuckDB oracle
    replays the identical cell assignment and probe search."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.ivf_topk(
        emb, queries, "vec_id", "embedding",
        k=5, n_centroids=16, n_probe=4, lloyd_iterations=0,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank"
    ).orderBy("query_id", "rank")


@register(
    "vec_filtered_topk",
    sql="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, label, v FROM e WHERE vec_id < 8),
         s AS (SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
                      list_dot_product(q.v, c.v)
                        / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
               FROM e c JOIN q ON c.label = q.label AND c.vec_id <> q.vec_id),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cos DESC, neighbor_id) AS rank FROM s)
    SELECT query_id, label, neighbor_id, ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3 ORDER BY query_id, rank
    """,
)
def vec_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN (similarity.filtered_topk) — the RAG
    retrieval shape: candidates restricted to the query's label via a
    hash equi-join on the metadata key (the corpus shuffles once on the
    key — or never, if bucketed by it — instead of broadcast-cross-scoring
    everything), then exact cosine rank within the filtered set."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 8)
    out = S.filtered_topk(emb, queries, "vec_id", "embedding", k=3, filter_cols=["label"])
    return out.select(
        "query_id",
        "label",
        "neighbor_id",
        F.round("cos", 6).alias("cos"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "vec_semantic_dedup",
    sql="""
    WITH RECURSIVE
    n AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
          FROM embeddings),
    cents AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv, nn AS cn
              FROM n QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
    ca AS (SELECT n.vec_id, n.v, n.nn, c.cid,
                  ROW_NUMBER() OVER (PARTITION BY n.vec_id
                      ORDER BY list_dot_product(n.v, c.cv)/(n.nn*c.cn) DESC, c.cid) AS pr
           FROM n CROSS JOIN cents c),
    cells AS (SELECT vec_id, v, nn, cid FROM ca WHERE pr = 1),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.v, b.v)/(a.nn*b.nn) >= 0.4),
    edges AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
    reach(id, r) AS (
        SELECT vec_id, vec_id FROM cells
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src
    )
    SELECT c.vec_id, CAST(c.cid AS INT) AS cell, MIN(reach.r) AS cluster_id,
           (c.vec_id = MIN(reach.r)) AS keep
    FROM cells c JOIN reach ON reach.id = c.vec_id
    GROUP BY c.vec_id, c.cid ORDER BY c.vec_id
    """,
)
def vec_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (similarity.semantic_dedup; Abbas et
    al. 2023): 16 seeded Voronoi cells bound the pairwise cosine search,
    within-cell near-dups (cos ≥ 0.4) group into connected components,
    min-id per component is the kept canonical.  The embedding-space twin
    of dedup_clusters — cluster-bounded pairs, never all-pairs; the
    DuckDB oracle replays cells + pairs and closes components with a
    recursive CTE."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    out = S.semantic_dedup(emb, "vec_id", "embedding", threshold=0.4, n_centroids=16)
    return out.select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "cluster_id", "keep"
    ).orderBy("vec_id")


_KM_K = 8


def _kmeans_ctes(iters: int, k: int = _KM_K) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs — ``e`` (vectors), ``c0``
    (min-id seeds) … ``c{iters}`` (final centroids).  Mirrors
    similarity.lloyd_kmeans exactly: squared-L2 argmin with cid tiebreak,
    decimal-stable per-(cid, dim) means (the functions/stable.py contract —
    exact sums, so both engines land on bit-identical centroids), empty
    cells keep their previous centroid."""
    parts = [
        "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                          v AS cv
                   FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {k})""",
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"""a{i} AS (SELECT vec_id, v, cid FROM (
                 SELECT e.vec_id, e.v, c.cid,
                        ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                          list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.cv)
                            + list_dot_product(c.cv, c.cv), c.cid) AS rn
                 FROM e CROSS JOIN {prev} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""m{i} AS (SELECT cid, list(m ORDER BY i) AS mv FROM (
                 SELECT cid, i,
                        CAST(CAST(SUM(CAST(val AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
                          / COUNT(val) AS m
                 FROM (SELECT cid, i, v[i] AS val
                       FROM (SELECT cid, v, unnest(range(1, len(v) + 1)) AS i FROM a{i}))
                 GROUP BY cid, i) GROUP BY cid)"""
        )
        parts.append(
            f"""c{i} AS (SELECT c.cid, COALESCE(m.mv, c.cv) AS cv
                 FROM {prev} c LEFT JOIN m{i} m USING (cid))"""
        )
    return ",\n".join(parts)


def _kmeans_assign_sql(iters: int, k: int = _KM_K) -> str:
    return f"""
    WITH {_kmeans_ctes(iters, k)},
    fin AS (SELECT vec_id, label, cid, dist2 FROM (
        SELECT e.vec_id, e.label, c.cid,
               list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS dist2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.cv)
                   + list_dot_product(c.cv, c.cv), c.cid) AS rn
        FROM e CROSS JOIN c{iters} c) WHERE rn = 1)
    """


@register(
    "vec_kmeans",
    sql=_kmeans_assign_sql(3)
    + """
    SELECT vec_id, label, CAST(cid AS INT) AS cluster_id,
           ROUND(dist2, 6) AS dist2
    FROM fin ORDER BY vec_id
    """,
)
def vec_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (similarity.lloyd_kmeans): 8 min-id-seeded
    centroids, 3 refinement iterations, squared-L2 assignment — the domain/
    topic clustering stage a curation pipeline hangs SemDeDup cells,
    mixture balancing and cluster-stratified splits on.  Each iteration is
    one broadcast-assignment scan plus one posexplode mean shuffle (both
    linear, map-side-combined); decimal-stable means make the centroids —
    and therefore every assignment — bit-identical to the single-node
    oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    asg = S.lloyd_kmeans(emb, "vec_id", "embedding", k=_KM_K, iterations=3)
    return (
        asg.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.round("dist2", 6).alias("dist2"),
        )
        .orderBy("vec_id")
    )


@register(
    "vec_cluster_balance",
    sql=_kmeans_assign_sql(1)
    + """
    SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id,
           CAST(pick AS INT) AS pick
    FROM (SELECT vec_id, cid AS cluster_id,
                 ROW_NUMBER() OVER (PARTITION BY cid ORDER BY
                   substr(md5('bal|' || CAST(vec_id AS VARCHAR)), 1, 8), vec_id) AS pick
          FROM fin)
    WHERE pick <= 25 ORDER BY cluster_id, pick
    """,
)
def vec_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subsampling: an equal content-keyed quota (25) from
    every k-means cell — the domain-balancing draw (cf. DoReMi-style
    mixture control) that stops a crawl's majority domain from swamping
    the training mix.  The per-cell draw uses sampling.grouped_topn: cells
    are k=8 GIANT groups at corpus scale, so a naive per-cell window would
    sort terabytes in single tasks — the two-phase (partition-local top-n,
    then window over ≤ n×partitions survivors) form is identical in result
    and never sorts a whole cell in one task."""
    from my_cudf_spark.operators.sampling import grouped_topn, hash_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    asg = S.lloyd_kmeans(emb, "vec_id", "embedding", k=_KM_K, iterations=1)
    sel = grouped_topn(
        asg.withColumn("__b", hash_bucket(["vec_id"], salt="bal")),
        ["cluster_id"],
        [F.col("__b"), F.col("vec_id")],
        n=25,
        rank_out="pick",
    )
    return sel.select(
        "vec_id",
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.col("pick").cast("int").alias("pick"),
    ).orderBy("cluster_id", "pick")


@register(
    "vec_topk_hamming",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (SELECT vec_id,
              list_reduce(list_transform(v[1:32],
                x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
                (a, b) -> a * 2 + b) AS s0,
              list_reduce(list_transform(v[33:64],
                x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
                (a, b) -> a * 2 + b) AS s1
            FROM e),
    cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    CAST(bit_count(xor(q.s0, c.s0))
                         + bit_count(xor(q.s1, c.s1)) AS INT) AS hamming
             FROM sig c JOIN sig q
               ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
    topc AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY hamming, neighbor_id) AS crk
             FROM cand),
    scored AS (SELECT t.query_id, t.neighbor_id, t.hamming,
                      list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v))) AS cos
               FROM topc t JOIN e a ON a.vec_id = t.query_id
                           JOIN e b ON b.vec_id = t.neighbor_id
               WHERE t.crk <= 20),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, hamming, ROUND(cos, 6) AS cos,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (S.hamming_topk): sign-bit signatures pack each
    64-dim vector into two BIGINT words (16 bytes, 16× smaller than
    float32); Hamming distance (xor + popcount, whole-stage codegen)
    generates 20 candidates per query; exact cosine reranks to top-5.

    Oracle-checkable end to end: the signature fold, the integer Hamming
    ranking, and the rerank cosine are each deterministic arithmetic both
    engines replicate bit-for-bit.  Recall vs the exact brute-force top-k
    is asserted in tests/test_similarity.py.  At 100 TB the stage-1 scan
    is the 16-byte signature projection — the candidate generator reads
    ~0.4% of the corpus bytes; full vectors are touched only for the
    candidates×queries equi-join."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.hamming_topk(emb, queries, "vec_id", "embedding", k=5, dim=64, candidates=20)
    return out.select(
        "query_id",
        "neighbor_id",
        "hamming",
        F.round("cos", 6).alias("cos"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "vec_topk_int8",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qz AS (SELECT vec_id,
                  CASE WHEN ma = 0
                       THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(FLOOR(x * (127.0 / ma) + 0.5)
                                                        AS BIGINT)) END AS q
           FROM (SELECT vec_id, v,
                        list_max(list_transform(v, x -> abs(x))) AS ma
                 FROM e)),
    n AS (SELECT vec_id, q,
                 sqrt(CAST(list_dot_product(q, q) AS DOUBLE)) AS nn
          FROM qz),
    scored AS (SELECT qy.vec_id AS query_id, c.vec_id AS neighbor_id,
                      CAST(list_dot_product(qy.q, c.q) AS DOUBLE)
                        / (qy.nn * c.nn) AS approx_cos
               FROM n c JOIN n qy
                 ON qy.vec_id < 5 AND c.vec_id <> qy.vec_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY approx_cos DESC, neighbor_id) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, ROUND(approx_cos, 6) AS approx_cos,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-quantized cosine top-k (S.int8_topk): symmetric per-vector int8
    quantization (floor(x·127/maxabs + 0.5)), then ranking happens
    entirely in integer space — the integer dot products are exact, so
    even the APPROXIMATE scores are cross-engine bit-identical and the
    whole quantized pipeline hash-matches the oracle.  The scan is the
    int8 corpus: 4× fewer bytes than float32 with near-identical ranking
    (agreement vs brute force asserted in tests/test_similarity.py)."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.int8_topk(emb, queries, "vec_id", "embedding", k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("approx_cos", 6).alias("approx_cos"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


_PCA_ITERS = 6


def _pca_sql() -> str:
    """Unrolled DuckDB twin of similarity.power_iteration_pca: centering,
    the DECIMAL-summed covariance, every power-iteration matvec+normalize
    as its own CTE pair, and the per-vector sequential-fold projection —
    the same per-term round(…,9) DECIMAL(28,9) discipline as the k-means
    and classifier-training oracles, so the iterative result is
    bit-identical across engines."""
    its = ""
    pv = "v0"
    for k in range(1, _PCA_ITERS + 1):
        its += f"""
    w{k} AS (SELECT c.i, CAST(CAST(SUM(CAST(ROUND(c.c * v.val, 9) AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE) AS w
             FROM cov c JOIN {pv} v ON c.j = v.pos GROUP BY c.i),
    n{k} AS (SELECT sqrt(CAST(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE)) AS n FROM w{k}),
    v{k} AS (SELECT w.i AS pos, w.w / n.n AS val FROM w{k} w, n{k} n),"""
        pv = f"v{k}"

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    st AS (SELECT COUNT(*) AS n FROM e),
    ex AS (SELECT vec_id, d.d AS pos, v[d.d + 1] AS x
           FROM e CROSS JOIN range(64) d(d)),
    mu AS (SELECT pos,
                  CAST(CAST(SUM(CAST(x AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE)
                    / (SELECT n FROM st) AS mu
           FROM ex GROUP BY pos),
    xc AS (SELECT ex.vec_id, ex.pos, ex.x - mu.mu AS xc
           FROM ex JOIN mu USING (pos)),
    covh AS (SELECT a.pos AS i, b.pos AS j,
                    CAST(SUM(CAST(FLOOR(a.xc * b.xc * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 1000000000 / (SELECT n FROM st) AS c
             FROM xc a JOIN xc b USING (vec_id) WHERE a.pos <= b.pos
             GROUP BY 1, 2),
    cov AS (SELECT i, j, c FROM covh
            UNION ALL
            SELECT j AS i, i AS j, c FROM covh WHERE i < j),
    v0 AS (SELECT CAST(range AS INT) AS pos, 0.125 AS val FROM range(64)),{its}
    mua AS (SELECT list(mu ORDER BY pos) AS mu FROM mu),
    va AS (SELECT list(val ORDER BY pos) AS vv FROM {pv})
    SELECT e.vec_id,
           ROUND(list_aggregate(list_transform(range(1, 65),
                   i -> (e.v[i] - mua.mu[i]) * va.vv[i]), 'sum'), 6) AS pc1
    FROM e, mua, va ORDER BY e.vec_id
    """


@register("vec_pca_project", sql=_pca_sql())
def vec_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principal-component projection by distributed power iteration
    (similarity.power_iteration_pca) — the linear-algebra tier of the
    embedding pipeline (decorrelation, 1-D curriculum ordering, whitening
    prep), done the MLlib RowMatrix way but with the eigensolve replaced
    by a FIXED engine-replicable iteration: mean-center, one
    map-side-combined d² covariance aggregation, six matvec+normalize
    steps on d²/d-row frames (one tiny eager job each), one narrow
    projection pass.  Corpus scanned twice; nothing corpus-sized ever
    broadcasts or sorts globally.

    The whole iterative pipeline is oracle-checked BIT-FOR-BIT (not
    recall-style): every cross-row sum rides the round(·,9)+DECIMAL(28,9)
    order-independence contract, every within-row reduction is the shared
    sequential fold — the same discipline that made vec_kmeans and
    text_classifier_learn exactly reproducible in SQL."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    _, proj = S.power_iteration_pca(
        emb, "vec_id", "embedding", dim=64, iterations=_PCA_ITERS
    )
    return proj.select("vec_id", F.round("pc1", 6).alias("pc1")).orderBy("vec_id")


_PCA_TOPR = 2


def _pca_topr_sql(components: int = _PCA_TOPR) -> str:
    """Unrolled DuckDB twin of power_iteration_pca(components=r): the
    _pca_sql covariance + iteration CTEs, repeated per component on the
    HOTELLING-DEFLATED matrix — cov{k+1} = cov{k} - λ·v·vᵀ with λ the
    final iteration's matvec norm, each element one exactly-rounded IEEE
    sequence (c - (λ·vᵢ)·vⱼ) shared with the Spark plan — then one
    projection column per component."""
    body = ""
    for c in range(components):
        pv = f"v{c}_0"
        body += f"""
    {pv} AS (SELECT CAST(range AS INT) AS pos, 0.125 AS val FROM range(64)),"""
        for t in range(1, _PCA_ITERS + 1):
            body += f"""
    w{c}_{t} AS (SELECT c.i, CAST(CAST(SUM(CAST(ROUND(c.c * v.val, 9) AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE) AS w
             FROM cov{c} c JOIN {pv} v ON c.j = v.pos GROUP BY c.i),
    n{c}_{t} AS (SELECT sqrt(CAST(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE)) AS n FROM w{c}_{t}),
    v{c}_{t} AS (SELECT w.i AS pos, w.w / n.n AS val FROM w{c}_{t} w, n{c}_{t} n),"""
            pv = f"v{c}_{t}"
        if c + 1 < components:
            body += f"""
    cov{c + 1} AS MATERIALIZED (SELECT c.i, c.j,
                   c.c - (SELECT n FROM n{c}_{_PCA_ITERS}) * a.val * b.val AS c
                   FROM cov{c} c
                   JOIN {pv} a ON c.i = a.pos JOIN {pv} b ON c.j = b.pos),"""
    vas = ",".join(
        f"""
    va{c} AS (SELECT list(val ORDER BY pos) AS vv FROM v{c}_{_PCA_ITERS})"""
        for c in range(components)
    )
    pcs = ",\n           ".join(
        f"""ROUND(list_aggregate(list_transform(range(1, 65),
                   i -> (e.v[i] - mua.mu[i]) * va{c}.vv[i]), 'sum'), 6) AS pc{c + 1}"""
        for c in range(components)
    )
    froms = ", ".join(f"va{c}" for c in range(components))
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    st AS (SELECT COUNT(*) AS n FROM e),
    ex AS (SELECT vec_id, d.d AS pos, v[d.d + 1] AS x
           FROM e CROSS JOIN range(64) d(d)),
    mu AS MATERIALIZED (SELECT pos,
                  CAST(CAST(SUM(CAST(x AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE)
                    / (SELECT n FROM st) AS mu
           FROM ex GROUP BY pos),
    xc AS (SELECT ex.vec_id, ex.pos, ex.x - mu.mu AS xc
           FROM ex JOIN mu USING (pos)),
    covh AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j,
                    CAST(SUM(CAST(FLOOR(a.xc * b.xc * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 1000000000 / (SELECT n FROM st) AS c
             FROM xc a JOIN xc b USING (vec_id) WHERE a.pos <= b.pos
             GROUP BY 1, 2),
    cov0 AS MATERIALIZED (SELECT i, j, c FROM covh
            UNION ALL
            SELECT j AS i, i AS j, c FROM covh WHERE i < j),{body}
    mua AS (SELECT list(mu ORDER BY pos) AS mu FROM mu),{vas}
    SELECT e.vec_id,
           {pcs}
    FROM e, mua, {froms} ORDER BY e.vec_id
    """


@register("vec_pca_topr", sql=_pca_topr_sql())
def vec_pca_topr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-r principal-component projection by power iteration + Hotelling
    deflation (similarity.power_iteration_pca(components=2)) — the
    whitening / SemDeDup-preprocessing / visualization tier that needs
    more than PC1.  After each converged direction the d²-row covariance
    CHECKPOINT is deflated in place (C - λ·v·vᵀ); the corpus is still
    scanned exactly twice regardless of r.  Bit-exact across engines by
    the vec_pca_project contract — the deflation adds only per-element
    exactly-rounded IEEE multiply/subtract, no new accumulations — so the
    full two-component iterative pipeline hash-matches the unrolled-CTE
    oracle.  Eigenbasis alignment vs numpy is asserted in
    tests/test_similarity.py."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    _, proj = S.power_iteration_pca(
        emb, "vec_id", "embedding", dim=64, iterations=_PCA_ITERS,
        components=_PCA_TOPR,
    )
    return proj.select(
        "vec_id",
        F.round("pc1", 6).alias("pc1"),
        F.round("pc2", 6).alias("pc2"),
    ).orderBy("vec_id")


@register(
    "vec_topk_pq",
    sql="""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    seed AS (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
             FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
    cents AS MATERIALIZED (
      SELECT cid, CAST(s.s AS INT) AS sub, v[s.s*8+1 : s.s*8+8] AS cvec
      FROM seed CROSS JOIN range(8) s(s)),
    cs AS (SELECT vec_id AS neighbor_id, CAST(s.s AS INT) AS sub,
                  v[s.s*8+1 : s.s*8+8] AS xvec
           FROM e CROSS JOIN range(8) s(s)),
    dist AS (SELECT neighbor_id, sub, cid,
                    list_aggregate(list_transform(range(1, 9),
                      i -> (xvec[i] - cvec[i]) * (xvec[i] - cvec[i])), 'sum') AS d2
             FROM cs JOIN cents USING (sub)),
    codes AS MATERIALIZED (
      SELECT neighbor_id, sub, cid AS code FROM dist
      QUALIFY ROW_NUMBER() OVER (PARTITION BY neighbor_id, sub
                                 ORDER BY d2, cid) = 1),
    cn2 AS (SELECT sub, cid AS code, list_dot_product(cvec, cvec) AS cn2 FROM cents),
    recon AS (SELECT neighbor_id,
                     sqrt(CAST(CAST(SUM(CAST(ROUND(cn2, 9) AS DECIMAL(28,9)))
                               AS VARCHAR) AS DOUBLE)) AS rn
              FROM codes JOIN cn2 USING (sub, code) GROUP BY neighbor_id),
    q AS (SELECT vec_id AS query_id, v AS qv,
                 sqrt(list_dot_product(v, v)) AS qn
          FROM e WHERE vec_id < 5),
    adc AS (SELECT query_id, qn, sub, cid AS code,
                   list_dot_product(qv[sub*8+1 : sub*8+8], cvec) AS dt
            FROM q CROSS JOIN cents),
    sc AS (SELECT a.query_id, c.neighbor_id, a.qn,
                  CAST(CAST(SUM(CAST(ROUND(a.dt, 9) AS DECIMAL(28,9)))
                       AS VARCHAR) AS DOUBLE) AS ip
           FROM codes c JOIN adc a ON a.sub = c.sub AND a.code = c.code
           WHERE c.neighbor_id <> a.query_id
           GROUP BY 1, 2, 3),
    sc2 AS (SELECT query_id, neighbor_id, ip / (qn * rn) AS approx_cos
            FROM sc JOIN recon USING (neighbor_id)),
    cand AS (SELECT * FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY approx_cos DESC, neighbor_id) AS crk
      FROM sc2) WHERE crk <= 100),
    rr AS (SELECT t.query_id, t.neighbor_id, t.approx_cos,
                  list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))) AS cos
           FROM cand t JOIN e a ON a.vec_id = t.query_id
                       JOIN e b ON b.vec_id = t.neighbor_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM rr)
    SELECT query_id, neighbor_id, ROUND(approx_cos, 6) AS approx_cos,
           ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (S.pq_topk; Jégou et al. 2011) — completes
    the quantized tier next to the sign-bit (vec_topk_hamming) and SQ8
    (vec_topk_int8) paths: 8 subspaces × 16 deterministic per-subspace
    centroids, each vector stored as 8 codes (32× compression); the
    broadcast ADC table ranks reconstructed vectors to 100 candidates per
    query, exact cosine reranks to top-5 (the hamming_topk two-stage
    shape — full vectors touched only for the candidates×queries join).
    The whole approximate pipeline is hash-exact: the codebook seeding is
    the ivf_topk smallest-id convention, the per-subspace encode argmin
    tie-breaks on code id, and both cross-subspace sums (reconstructed
    norm, inner product) ride the round(·,9)+DECIMAL(28,9) contract.
    Recall vs brute force asserted in tests/test_similarity.py."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.pq_topk(
        emb, queries, "vec_id", "embedding", k=5, dim=64, m=8, n_codes=16,
        candidates=100,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("approx_cos", 6).alias("approx_cos"),
        F.round("cos", 6).alias("cos"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "vec_topk_ivfpq",
    sql="""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nn FROM e),
    cents AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv, nn AS cn
      FROM n QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
    ca AS (SELECT n.vec_id AS neighbor_id, n.v, c.cid, c.cv,
                  ROW_NUMBER() OVER (PARTITION BY n.vec_id
                      ORDER BY list_dot_product(n.v, c.cv)/(n.nn*c.cn) DESC, c.cid) AS pr
           FROM n CROSS JOIN cents c),
    res AS MATERIALIZED (
      SELECT neighbor_id, cid,
             list_transform(range(1, 65), i -> v[i] - cv[i]) AS r
      FROM ca WHERE pr = 1),
    rseed AS (SELECT r, ROW_NUMBER() OVER (ORDER BY neighbor_id) - 1 AS code
              FROM res QUALIFY ROW_NUMBER() OVER (ORDER BY neighbor_id) <= 16),
    rcents AS MATERIALIZED (
      SELECT code, CAST(s.s AS INT) AS sub, r[s.s*8+1 : s.s*8+8] AS rcvec
      FROM rseed CROSS JOIN range(8) s(s)),
    rs AS (SELECT neighbor_id, cid, CAST(s.s AS INT) AS sub,
                  r[s.s*8+1 : s.s*8+8] AS rxvec
           FROM res CROSS JOIN range(8) s(s)),
    dist AS (SELECT neighbor_id, cid, sub, code,
                    list_aggregate(list_transform(range(1, 9),
                      i -> (rxvec[i] - rcvec[i]) * (rxvec[i] - rcvec[i])), 'sum') AS d2
             FROM rs JOIN rcents USING (sub)),
    codes AS MATERIALIZED (
      SELECT neighbor_id, cid, sub, code FROM dist
      QUALIFY ROW_NUMBER() OVER (PARTITION BY neighbor_id, sub
                                 ORDER BY d2, code) = 1),
    csubs AS (SELECT cid, CAST(s.s AS INT) AS sub, cv[s.s*8+1 : s.s*8+8] AS csvec
              FROM cents CROSS JOIN range(8) s(s)),
    crossdt AS (SELECT cid, sub, code,
                       2*list_dot_product(csvec, rcvec)
                         + list_dot_product(rcvec, rcvec) AS cx
                FROM csubs JOIN rcents USING (sub)),
    centn2 AS (SELECT cid, list_dot_product(cv, cv) AS c2 FROM cents),
    recon AS (SELECT c.neighbor_id,
                     sqrt(CAST(CAST(SUM(CAST(ROUND(x.cx, 9) AS DECIMAL(28,9)))
                          + CAST(ROUND(MIN(z.c2), 9) AS DECIMAL(28,9))
                          AS VARCHAR) AS DOUBLE)) AS rn
              FROM codes c
              JOIN crossdt x ON x.cid = c.cid AND x.sub = c.sub AND x.code = c.code
              JOIN centn2 z ON z.cid = c.cid
              GROUP BY c.neighbor_id),
    qa AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nn AS qn, c.cid, c.cv,
                  ROW_NUMBER() OVER (PARTITION BY n.vec_id
                      ORDER BY list_dot_product(n.v, c.cv)/(n.nn*c.cn) DESC, c.cid) AS pr
           FROM n CROSS JOIN cents c WHERE n.vec_id < 5),
    probes AS (SELECT query_id, qn, cid, list_dot_product(qv, cv) AS qc
               FROM qa WHERE pr <= 4),
    adc AS (SELECT q.vec_id AS query_id, r.sub, r.code,
                   list_dot_product(q.v[r.sub*8+1 : r.sub*8+8], r.rcvec) AS dt
            FROM e q CROSS JOIN rcents r WHERE q.vec_id < 5),
    sc AS (SELECT p.query_id, c.neighbor_id, MIN(p.qn) AS qn,
                  CAST(CAST(SUM(CAST(ROUND(a.dt, 9) AS DECIMAL(28,9)))
                       + CAST(ROUND(MIN(p.qc), 9) AS DECIMAL(28,9))
                       AS VARCHAR) AS DOUBLE) AS ip
           FROM codes c
           JOIN probes p ON p.cid = c.cid
           JOIN adc a ON a.query_id = p.query_id AND a.sub = c.sub AND a.code = c.code
           WHERE c.neighbor_id <> p.query_id
           GROUP BY 1, 2),
    sc2 AS (SELECT query_id, neighbor_id, ip / (qn * rn) AS approx_cos
            FROM sc JOIN recon USING (neighbor_id)),
    cand AS (SELECT * FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY approx_cos DESC, neighbor_id) AS crk
      FROM sc2) WHERE crk <= 50),
    rr AS (SELECT t.query_id, t.neighbor_id, t.approx_cos,
                  list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))) AS cos
           FROM cand t JOIN e a ON a.vec_id = t.query_id
                       JOIN e b ON b.vec_id = t.neighbor_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM rr)
    SELECT query_id, neighbor_id, ROUND(approx_cos, 6) AS approx_cos,
           ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def vec_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (S.ivfpq_topk; Jégou et al. 2011 §V) — the composition
    of the inverted-file coarse quantizer (vec_topk_ivf) with product
    quantization of the residuals, i.e. the standard billion-scale layout:
    16 Voronoi cells prune the search to 4 probed cells per query, a
    shared 8-subspace × 16-code residual codebook compresses what remains,
    the ADC inner product decomposes as dot(q, cent) + Σₛ dot(qₛ, cₛ[code]),
    and exact cosine reranks 50 candidates to top-5.  Deterministic
    end-to-end (seeded centroids and codebook, lower-code argmin ties,
    decimal order-independent sums), so the DuckDB oracle replays the
    whole approximate pipeline bit-for-bit.  Recall vs brute force is
    asserted in tests/test_similarity.py."""
    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.ivfpq_topk(
        emb, queries, "vec_id", "embedding", k=5, dim=64, m=8, n_codes=16,
        n_centroids=16, n_probe=4, candidates=50,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("approx_cos", 6).alias("approx_cos"),
        F.round("cos", 6).alias("cos"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "rag_hybrid_rrf",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d AS (SELECT doc_id, trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')) AS norm
          FROM documents JOIN e ON doc_id = vec_id),
    tk AS (SELECT doc_id, string_split(norm, ' ') AS tk FROM d),
    lens AS (SELECT doc_id, len(tk) AS dl FROM tk),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
    qt AS (SELECT doc_id AS query_id, t AS term,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t) AS tr
           FROM (SELECT DISTINCT doc_id, unnest(tk) AS t FROM tk WHERE doc_id < 5)
           WHERE len(t) >= 4 QUALIFY tr <= 8),
    terms AS (SELECT DISTINCT term FROM qt),
    hits AS (SELECT doc_id, w AS term, COUNT(*) AS tf
             FROM (SELECT doc_id, unnest(tk) AS w FROM tk) x
             JOIN terms ON x.w = terms.term GROUP BY doc_id, w),
    dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
    lex AS (SELECT qt.query_id, h.doc_id,
                   SUM(CAST(ROUND(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                            * h.tf * (1.2 + 1.0)
                            / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 9)
                        AS DECIMAL(28,9))) AS score
            FROM qt JOIN hits h USING (term) JOIN dfreq USING (term)
                 JOIN lens ON lens.doc_id = h.doc_id CROSS JOIN stats
            WHERE h.doc_id <> qt.query_id
            GROUP BY qt.query_id, h.doc_id),
    lrank AS (SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank_lex
              FROM lex QUALIFY rank_lex <= 50),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
    s AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                 list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
          FROM e c, q WHERE c.vec_id <> q.vec_id),
    drank AS (SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, doc_id) AS rank_dense
              FROM s QUALIFY rank_dense <= 50),
    fused AS (SELECT COALESCE(l.query_id, dr.query_id) AS query_id,
                     COALESCE(l.doc_id, dr.doc_id) AS doc_id,
                     l.rank_lex, dr.rank_dense,
                     COALESCE(CAST(1.0 AS DOUBLE) / (60 + dr.rank_dense), 0.0)
                       + COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.rank_lex), 0.0) AS rrf
              FROM lrank l FULL JOIN drank dr
                   ON l.query_id = dr.query_id AND l.doc_id = dr.doc_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf DESC, doc_id) AS rank
          FROM fused)
    SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
           ROUND(rrf, 6) AS rrf_score,
           CAST(rank_dense AS INT) AS rank_dense,
           CAST(rank_lex AS INT) AS rank_lex
    FROM r WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def rag_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009)
    — the standard RAG stack: a sparse BM25 leg (functions/text.
    bm25_scores_multi; each query doc's first 8 alphabetical ≥4-char
    distinct tokens as its term set) and a dense cosine leg (similarity.
    brute_force_topk), top-50 each, fused by ``Σ 1/(60+rank)`` and cut to
    top-10 per query.  The fixture's embeddings.vec_id indexes
    documents.doc_id, so the corpus is the embedded document slice on
    both legs and the fused candidate universe is consistent.

    Determinism: lexical ranking orders on the DECIMAL(28,9) per-term-
    rounded BM25 sum (order-independent); RRF is a two-term double sum in
    fixed leg order; all rank ties break on doc_id.

    Scale: the lexical leg shuffles only term HITS (terms broadcast into
    the token explode); per-query rank windows ride grouped_topn's
    giant-group-safe two phases; the dense leg is the brute-force
    baseline (LSH/IVF/PQ variants are the registered scale paths); the
    fusion join and final window touch ≤ 100 candidate rows per query."""
    from my_cudf_spark.functions import text as T
    from my_cudf_spark.operators.sampling import grouped_topn

    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
    ).select("doc_id", T.normalize_text("text").alias("norm"))

    qt = (
        corpus.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(F.split("norm", " "))).alias("term"),
        )
        .filter(F.length("term") >= 4)
        .withColumn(
            "tr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("term")
            ),
        )
        .filter(F.col("tr") <= 8)
        .select("query_id", "term")
    )
    lex = T.bm25_scores_multi(corpus, ["doc_id"], "norm", qt).filter(
        F.col("doc_id") != F.col("query_id")
    )
    lrank = grouped_topn(
        lex.select("query_id", "doc_id", "score"),
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id")],
        50,
        rank_out="rank_lex",
    ).select("query_id", "doc_id", "rank_lex")

    dense = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=50
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_dense")
    )

    fused = lrank.join(dense, ["query_id", "doc_id"], "full").withColumn(
        "rrf",
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_dense")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_lex")), F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rank_dense").cast("int").alias("rank_dense"),
            F.col("rank_lex").cast("int").alias("rank_lex"),
        )
        .orderBy("query_id", "rank")
    )


def _kcenter_sql(k: int = 8, dim: int = 64) -> str:
    """Unrolled k-round oracle for similarity.kcenter_coreset: nano-unit
    int components, HUGEINT squared distances, per round one LEAST
    update against the newly chosen center and one (d DESC, id) top-1 —
    the identical integer arithmetic the Spark operator runs."""
    d2 = (
        lambda a, b: f"list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST({a}[i] - {b}[i] AS HUGEINT)"
        f" * CAST({a}[i] - {b}[i] AS HUGEINT)))"
    )
    parts = [
        "WITH e AS (SELECT vec_id AS id,"
        " list_transform(embedding::DOUBLE[],"
        " x -> CAST(ROUND(x * 1000000000.0) AS BIGINT)) AS v FROM embeddings)",
        "c0 AS (SELECT id, v FROM e ORDER BY id LIMIT 1)",
        f"d0 AS (SELECT e.id, e.v, {d2('e.v', 'c.v')} AS d FROM e, c0 c"
        " WHERE e.id <> c.id)",
    ]
    for t in range(1, k):
        parts.append(
            f"f{t} AS (SELECT id, v, d FROM d{t - 1} ORDER BY d DESC, id LIMIT 1)"
        )
        if t < k - 1:
            parts.append(
                f"d{t} AS (SELECT p.id, p.v, LEAST(p.d, {d2('p.v', 'f.v')}) AS d"
                f" FROM d{t - 1} p, f{t} f WHERE p.id <> f.id)"
            )
    union = " UNION ALL ".join(
        ["SELECT 0 AS round, id AS vec_id, CAST(NULL AS VARCHAR) AS dist FROM c0"]
        + [
            f"SELECT {t}, id, CAST(CAST(d AS DECIMAL(38,0)) AS VARCHAR) FROM f{t}"
            for t in range(1, k)
        ]
    )
    return ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY round"


@register("vec_kcenter_coreset", sql=_kcenter_sql())
def vec_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (similarity.kcenter_coreset,
    Gonzalez farthest-point): 8 maximally-spread embedding
    representatives — the diverse-subset data-selection primitive next
    to semantic dedup (that removes near-dups; this PICKS a spread
    subset).  Exact nano-unit² DECIMAL distances make every min/argmax
    an integer comparison, so the unrolled 8-round oracle agrees
    bit-for-bit; per round the operator runs one narrow min-distance
    update against the new center (1-row broadcast) and one
    TakeOrderedAndProject top-1."""
    from my_cudf_spark.operators.similarity import kcenter_coreset

    emb = _as_double(load_table(spark, sf_dir, "embeddings"))
    out = kcenter_coreset(emb, "vec_id", "embedding", k=8)
    # exact integer distance as a STRING: DuckDB renders DECIMAL(38,0)
    # as float64 in pandas (precision loss) while Spark yields Decimal
    # objects — the digit string is the dtype both engines agree on
    return out.select(
        "round", "vec_id", F.col("dist").cast("string").alias("dist")
    ).orderBy("round")
