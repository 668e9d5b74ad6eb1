"""Deterministic-sampling correctness queries (north-star pipeline ops)
over the ``documents`` fixture.

Membership must be a pure function of the row key (operators/sampling.py)
— the oracle runs the IDENTICAL md5-prefix expression in DuckDB, so any
engine- or partitioning-dependence would show up as a hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.operators import sampling as S
from my_cudf_spark.operators.sampling import _threshold_hex
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table

# DuckDB twin of sampling.hash_bucket over doc_id with empty salt.
SQL_BUCKET = "substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8)"


@register(
    "sample_split",
    sql=f"""
    WITH h AS (SELECT doc_id, {SQL_BUCKET} AS b FROM documents)
    SELECT doc_id,
           b < '{_threshold_hex(0.25)}' AS in_sample,
           CASE WHEN b < '{_threshold_hex(0.8)}' THEN 'train'
                WHEN b < '{_threshold_hex(0.9)}' THEN 'val'
                ELSE 'test' END AS split
    FROM h ORDER BY doc_id
    """,
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample membership + train/val/test split
    assignment, both pure functions of doc_id (reproducible across
    clusters and engines; no RNG)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = S.hash_bucket(["doc_id"])
    labeled = S.assign_splits(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return labeled.select(
        "doc_id",
        (bucket < F.lit(_threshold_hex(0.25))).alias("in_sample"),
        "split",
    ).orderBy("doc_id")


@register(
    "sample_stratified",
    sql=f"""
    WITH h AS (SELECT doc_id, lang, source, {SQL_BUCKET} AS b FROM documents),
    r AS (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY lang, source
              ORDER BY b, CAST(doc_id AS VARCHAR)) AS rk
          FROM h)
    SELECT doc_id, lang, source FROM r WHERE rk <= 3 ORDER BY doc_id
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus construction: exactly min(3, |stratum|) documents
    per (lang, source) stratum, chosen by deterministic hash rank (one
    windowed shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        S.stratified_sample(docs, ["lang", "source"], ["doc_id"], 3)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source AS dom, COUNT(*) AS n FROM documents
  WHERE source IN ('src1','src2','src3') GROUP BY source),
w AS (
  SELECT dom, n,
         CASE dom WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
                  WHEN 'src2' THEN CAST(0.3 AS DOUBLE)
                  ELSE CAST(0.2 AS DOUBLE) END AS w
  FROM counts),
c AS (SELECT MIN(n / w) AS c FROM w),
thr AS (
  SELECT dom,
         lpad(printf('%x',
              CAST(floor(least(CAST(1.0 AS DOUBLE), c * w / n)
                         * 4294967296.0) AS BIGINT)), 9, '0') AS thr
  FROM w, c)
SELECT doc_id, source
FROM documents d JOIN thr ON d.source = thr.dom
WHERE '0' || {SQL_BUCKET} < thr
ORDER BY doc_id
"""


@register("sample_mixture", sql=MIXTURE_SQL)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling (DoReMi-style reweighting by
    subsampling): thin each source so the surviving corpus approaches
    target shares 0.5/0.3/0.2, membership a pure function of doc_id.
    The binding domain keeps probability 1 — which exercises the 9-hex
    threshold path.  Plan: two tiny aggregates + broadcast join + narrow
    filter; no full-data shuffle (operators/sampling.py:mixture_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = S.mixture_sample(
        docs, "source", ["doc_id"], {"src1": 0.5, "src2": 0.3, "src3": 0.2}
    )
    return kept.select("doc_id", "source").orderBy("doc_id")


EPOCH_SHUFFLE_SQL = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY substr(md5('epoch1|' || CAST(doc_id AS VARCHAR)), 1, 15),
                  doc_id) - 1 AS BIGINT) AS pos
FROM documents ORDER BY doc_id
"""


@register("sample_epoch_shuffle", sql=EPOCH_SHUFFLE_SQL)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-order shuffle
    (sampling.epoch_shuffle): pos = rank of md5('epoch1|'||doc_id) — the
    same permutation on any cluster size / partitioning, a different one
    per epoch, resumable mid-epoch.  Rank rides global_cumsum's
    deterministic-bucket path (digest prefix as numeric key): one hash
    exchange, no single-task window, no RNG."""
    from my_cudf_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return (
        epoch_shuffle(docs.select("doc_id"), ["doc_id"], epoch=1)
        .select("doc_id", F.col("pos").cast("long").alias("pos"))
        .orderBy("doc_id")
    )


@register(
    "sample_weighted",
    sql="""
    WITH s AS (
      SELECT o_orderkey, o_totalprice,
             -ln((CAST(('0x' || substr(md5('wsample|' || CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
                 / CAST(4503599627370497 AS DOUBLE)) / o_totalprice AS sk
      FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0)
    SELECT o_orderkey, o_totalprice, ROUND(sk, 9) AS sample_key
    FROM s ORDER BY sk, o_orderkey LIMIT 200
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/sampling.weighted_sample — Efraimidis–Spirakis A-ES):
    200 orders drawn with probability ∝ o_totalprice via content-keyed
    exponential order keys; TakeOrderedAndProject keeps the top-k
    per-partition partial, so nothing global materializes.  Reproducible
    across runs and cluster sizes — no RNG anywhere."""
    from my_cudf_spark.operators.sampling import weighted_sample

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = weighted_sample(orders, ["o_orderkey"], "o_totalprice", k=200)
    return out.select(
        "o_orderkey", "o_totalprice", F.round("sample_key", 9).alias("sample_key")
    ).orderBy("o_orderkey")


# COALESCE on both sides: Spark's concat_ws SKIPS a NULL source (hashing
# 'grp') while DuckDB's || would yield NULL and fall to the ELSE branch —
# an explicit empty-string contract keeps the engines aligned if a future
# fixture regeneration introduces NULL sources.
SQL_GRP_BUCKET = "substr(md5('grp|' || COALESCE(source, '')), 1, 8)"


@register(
    "sample_split_grouped",
    sql=f"""
    WITH h AS (SELECT source, {SQL_GRP_BUCKET} AS b FROM documents)
    SELECT source,
           CASE WHEN b < '{_threshold_hex(0.8)}' THEN 'train'
                WHEN b < '{_threshold_hex(0.9)}' THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM h GROUP BY 1, 2 ORDER BY source
    """,
)
def sample_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: membership keyed on the GROUP
    (``source``), not the row, so every document from one source lands in
    the same split — the split discipline near-duplicate-heavy corpora
    need (row-keyed splits leak near-dups of a train doc into test; cf.
    the dedup tier in operators/dedup.py).  Pure function of the group key
    — no RNG, stable under re-partitioning; one narrow pass + the count
    aggregation.  The (source, split) output having exactly one split per
    source IS the no-straddle proof the oracle hash-checks."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = S.assign_splits(
        docs,
        [F.coalesce(F.col("source"), F.lit(""))],
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="grp",
    )
    return (
        labeled.groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


@register(
    "sample_negatives",
    sql=f"""
    WITH h AS (SELECT doc_id, source, {SQL_BUCKET} AS b FROM documents),
    anch AS (SELECT doc_id, source FROM h WHERE b < '{_threshold_hex(0.10)}'),
    cm AS (SELECT doc_id, md5('neg|' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
    corp AS (SELECT doc_id, substr(m, 1, 1) AS bkt,
                    ('0x' || substr(m, 1, 15))::BIGINT AS hh FROM cm),
    slots AS (SELECT anch.doc_id AS anchor_id, anch.source, r.s
              FROM anch CROSS JOIN range(8) r(s)),
    pm AS (SELECT anchor_id, source, s,
                  md5('negq|' || CAST(anchor_id AS VARCHAR) || '|' || CAST(s AS VARCHAR)) AS m
           FROM slots),
    pts AS (SELECT anchor_id, source, s, substr(m, 1, 1) AS bkt,
                   ('0x' || substr(m, 1, 15))::BIGINT AS p FROM pm),
    cand AS (SELECT pts.anchor_id, pts.source, pts.s, corp.doc_id AS neg_id,
                    ROW_NUMBER() OVER (PARTITION BY pts.anchor_id, pts.s
                        ORDER BY CASE WHEN corp.hh >= pts.p THEN corp.hh - pts.p
                                      ELSE corp.hh - pts.p + 1152921504606846976 END,
                                 corp.doc_id) AS rn
             FROM pts JOIN corp USING (bkt)),
    hit AS (SELECT anchor_id, source, s, neg_id FROM cand WHERE rn = 1),
    ok AS (SELECT hit.anchor_id, hit.s, hit.neg_id
           FROM hit JOIN documents d ON d.doc_id = hit.neg_id
           WHERE hit.neg_id <> hit.anchor_id AND d.source <> hit.source),
    ded AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, neg_id ORDER BY s) AS rd
            FROM ok),
    rk AS (SELECT anchor_id, neg_id,
                  ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY s) AS rank
           FROM ded WHERE rd = 1)
    SELECT anchor_id, CAST(rank AS INT) AS rank, neg_id
    FROM rk WHERE rank <= 4 ORDER BY anchor_id, rank
    """,
)
def sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic consistent-hash negative sampling
    (sampling.negative_samples) — contrastive-training data prep: each
    anchor (a 10% hash slice) draws 4 pseudo-random negatives from the
    corpus ring, EXCLUDING itself and any document from its own source
    (the standard same-crawl leakage guard), with repeat draws deduped.
    Membership is a pure function of (anchor, slot) — any cluster, any
    partitioning, any engine draws the identical negatives, which is what
    makes the training set reproducible.  The exclusion constraint rides
    the operator's generic (anchor, excluded) pair-list API; the oracle
    applies the same rule as a predicate.

    Scale: probe = forward as-of join per digest bucket (sort-merge
    within bucket, never anchors × corpus); wraparound = 16-row
    broadcast of bucket minima; dedup/rank windows are per-anchor over
    ≤ 8 rows.  The oracle's bucket-join + wrapped-distance argmin is the
    as-of probe's algebraic twin (oracle-only expansion, fine at fixture
    scale)."""
    docs = load_table(spark, sf_dir, "documents")
    anch = S.hash_sample(docs, ["doc_id"], 0.10).select("doc_id", "source")
    excl = (
        anch.select(F.col("doc_id").alias("a"), "source")
        .join(docs.select(F.col("doc_id").alias("e"), "source"), "source")
        .select("a", "e")
    )
    out = S.negative_samples(
        anch, docs, "doc_id", "doc_id", k=4, exclusions=excl, pad=4, bucket_chars=1
    )
    return out.select(
        F.col("doc_id").alias("anchor_id"),
        "rank",
        F.col("neg_doc_id").alias("neg_id"),
    ).orderBy("anchor_id", "rank")


@register(
    "sample_token_budget",
    sql=r"""
    WITH d AS (SELECT doc_id, source,
                      CAST(len(string_split(trim(text),' ')) AS BIGINT) AS nt,
                      ROUND(CASE WHEN length(text) > 0 THEN
                        (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/length(text))*0.6
                        + (CASE WHEN (CAST(length(text) - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
                                      /(length(regexp_replace(text, '[^ ]', '', 'g'))+1)) BETWEEN 3 AND 10
                           THEN 1.0 ELSE 0.0 END)*0.3
                        + LEAST(CAST(length(text) AS DOUBLE)/100.0, 1.0)*0.1
                      ELSE 0.0 END, 6) AS q
               FROM documents WHERE text IS NOT NULL),
    s AS (SELECT source, SUM(nt) AS total_tokens, COUNT(*) AS n,
                 SUM(CAST(q AS DECIMAL(28,9))) AS qsum
          FROM d GROUP BY source),
    b AS (SELECT CAST(floor(0.4 * SUM(total_tokens)) AS BIGINT) AS budget FROM s),
    w AS (SELECT source, CAST(total_tokens AS BIGINT) AS total_tokens,
                 CAST(CAST(qsum AS VARCHAR) AS DOUBLE)/n AS mean_q,
                 CAST(floor(2.0 * total_tokens) AS BIGINT) AS cap, budget
          FROM s CROSS JOIN b),
    w2 AS (SELECT *, COALESCE(SUM(cap) OVER (ORDER BY mean_q DESC, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumcap
           FROM w),
    a AS (SELECT source, total_tokens, mean_q,
                 CAST(LEAST(cap, GREATEST(budget - cumcap, 0)) AS BIGINT) AS alloc_tokens
          FROM w2),
    e AS (SELECT *, CAST(alloc_tokens AS DOUBLE)/total_tokens AS epochs FROM a),
    r AS (SELECT d.source, d.nt,
                 CAST(floor(e.epochs) AS BIGINT)
                 + CASE WHEN ('0x' || substr(md5('rep|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                            < CAST(floor((e.epochs - floor(e.epochs)) * 4294967296.0) AS BIGINT)
                        THEN 1 ELSE 0 END AS n_rep
          FROM d JOIN e USING (source)),
    g AS (SELECT source, CAST(SUM(n_rep) AS BIGINT) AS realized_docs,
                 CAST(SUM(n_rep * nt) AS BIGINT) AS realized_tokens
          FROM r GROUP BY source)
    SELECT e.source, e.total_tokens, ROUND(e.mean_q, 6) AS mean_q,
           e.alloc_tokens, ROUND(e.epochs, 6) AS epochs,
           COALESCE(g.realized_docs, 0) AS realized_docs,
           COALESCE(g.realized_tokens, 0) AS realized_tokens
    FROM e LEFT JOIN g USING (source) ORDER BY source
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing (sampling.token_budget_mixture): allocate
    40% of the corpus's tokens across sources by greedy quality-ranked
    waterfill with a 2-epoch per-source repetition cap (the Llama/Gopher
    mixture shape), then realize the mixture with deterministic
    fractional-epoch replication — floor(epochs) copies per doc plus one
    md5-gated extra with probability frac(epochs).  Per source: the
    allocation, the decimal order-independent mean quality, and the
    realized doc/token counts of the materialized mixture."""
    from my_cudf_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
        T.quality_score("text").alias("q"),
    )
    alloc, rep = S.token_budget_mixture(
        d, "doc_id", "source", "n_tokens", "q", budget_frac=0.4, max_epochs=2.0
    )
    realized = rep.groupBy("source").agg(
        F.count(F.lit(1)).alias("realized_docs"),
        F.sum("n_tokens").alias("realized_tokens"),
    )
    return (
        alloc.join(realized, "source", "left")
        .select(
            "source",
            "total_tokens",
            F.round("mean_q", 6).alias("mean_q"),
            "alloc_tokens",
            F.round("epochs", 6).alias("epochs"),
            F.coalesce("realized_docs", F.lit(0)).cast("long").alias("realized_docs"),
            F.coalesce("realized_tokens", F.lit(0)).cast("long").alias("realized_tokens"),
        )
        .orderBy("source")
    )


@register(
    "sample_temperature",
    sql=r"""
    WITH d AS (SELECT doc_id, source,
                      CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt
               FROM documents WHERE text IS NOT NULL),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM d GROUP BY source),
    t AS (SELECT source, n_docs, ROUND(sqrt(CAST(n_docs AS DOUBLE)), 9) AS wr FROM s),
    z AS (SELECT CAST(CAST(SUM(CAST(wr AS DECIMAL(28,9))) AS VARCHAR) AS DOUBLE) AS zs,
                 CAST(SUM(n_docs) AS BIGINT) AS n_total FROM t),
    a AS (SELECT source, n_docs, wr, wr / zs AS w,
                 CAST(floor((wr / zs) * (0.5 * n_total)) AS BIGINT) AS n_target
          FROM t CROSS JOIN z),
    r AS (SELECT d.source, d.nt,
                 CASE WHEN ('0x' || substr(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                          < CAST(floor(CAST(a.n_target AS DOUBLE) / a.n_docs * 4294967296.0) AS BIGINT)
                      THEN 1 ELSE 0 END AS keep
          FROM d JOIN a USING (source))
    SELECT a.source, a.n_docs, ROUND(a.w, 9) AS w, a.n_target,
           CAST(SUM(r.keep) AS BIGINT) AS realized_docs,
           CAST(SUM(r.keep * r.nt) AS BIGINT) AS realized_tokens
    FROM a JOIN r USING (source)
    GROUP BY a.source, a.n_docs, a.w, a.n_target ORDER BY a.source
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced source sampling at T = 1/2 (the multilingual
    data-balancing trick of mC4 / XLM-R: rare sources upweighted, share_s
    ∝ n_s^T): target counts n_target = floor(w_s · B) with w_s =
    √n_s / Σ√n_j and budget B = half the corpus, realized by the
    deterministic md5-gate.  T = 1/2 exactly because IEEE sqrt is
    correctly rounded on every engine — a fractional pow would not be —
    and the normalizer is a decimal order-independent sum of rounded
    roots.  One per-source aggregation + one broadcast back; no second
    corpus shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("nt"),
    )
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    t = s.withColumn("wr", F.round(F.sqrt(F.col("n_docs").cast("double")), 9))
    z = t.agg(
        F.sum(F.col("wr").cast("decimal(28,9)")).cast("double").alias("zs"),
        F.sum("n_docs").alias("n_total"),
    )
    a = (
        t.crossJoin(F.broadcast(z))
        .withColumn("w", F.col("wr") / F.col("zs"))
        .withColumn(
            "n_target",
            F.floor(F.col("w") * (0.5 * F.col("n_total"))).cast("long"),
        )
    )
    thr = F.floor(
        F.col("n_target").cast("double") / F.col("n_docs") * F.lit(4294967296.0)
    ).cast("long")
    from my_cudf_spark.operators.sampling import hash_bucket

    r = d.join(F.broadcast(a.withColumn("__thr", thr)), "source").withColumn(
        "keep",
        (
            F.conv(hash_bucket(["doc_id"], salt="temp"), 16, 10).cast("long")
            < F.col("__thr")
        ).cast("long"),
    )
    return (
        r.groupBy("source", "n_docs", F.round("w", 9).alias("w"), "n_target")
        .agg(
            F.sum("keep").cast("long").alias("realized_docs"),
            F.sum(F.col("keep") * F.col("nt")).cast("long").alias("realized_tokens"),
        )
        .orderBy("source")
    )


@register(
    "sample_epoch_shuffle_multi",
    sql="""
    WITH d AS (SELECT doc_id,
                      CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, nt, CAST(e.e AS INT) AS epoch,
                 ROW_NUMBER() OVER (PARTITION BY e.e
                   ORDER BY substr(md5('epoch' || CAST(e.e AS VARCHAR) || '|'
                                       || CAST(doc_id AS VARCHAR)), 1, 15),
                            doc_id) - 1 AS pos
          FROM d CROSS JOIN range(1, 4) e(e)),
    c AS (SELECT *, COALESCE(SUM(nt) OVER (PARTITION BY epoch ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          FROM p),
    k AS (SELECT epoch, doc_id, pos, nt,
                 CAST(floor(CAST(cum AS DOUBLE) / 2048.0) AS BIGINT) AS pack
          FROM c),
    e1 AS (SELECT doc_id, pos AS pos1 FROM p WHERE epoch = 1)
    SELECT k.epoch,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT k.pos) AS BIGINT) AS n_distinct_pos,
           CAST(MAX(k.pos) AS BIGINT) AS max_pos,
           CAST(SUM(CASE WHEN k.pos = e1.pos1 THEN 1 ELSE 0 END) AS BIGINT)
             AS same_as_e1,
           CAST(COUNT(DISTINCT k.pack) AS BIGINT) AS n_packs,
           CAST(SUM(k.nt) AS BIGINT) AS n_tokens
    FROM k JOIN e1 USING (doc_id)
    GROUP BY k.epoch ORDER BY k.epoch
    """,
)
def sample_epoch_shuffle_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-EPOCH deterministic training order feeding the packer
    (sampling.epoch_shuffle × k composed with packing.global_cumsum —
    the multi-epoch leg pipeline_pretrain ships as epoch-1-only): three
    epochs, each a distinct md5-salted permutation of the same corpus,
    each independently token-cumsum'd into 2048-token sequential packs.

    The 3-row result is the PROOF SET: per epoch, ``n_distinct_pos ==
    n_docs`` and ``max_pos == n_docs - 1`` certify a bijective
    permutation over the identical doc set; ``same_as_e1`` is n_docs for
    epoch 1 and collapses to chance-level for epochs 2-3 (distinct
    permutations, not shifts of one another); ``n_packs``/``n_tokens``
    pin the per-epoch pack layout the trainer consumes.

    Scale: each epoch is two deterministic-bucket global_cumsum
    exchanges (rank, then token cumsum) — linear in k with no cross-
    epoch dependency (epochs materialize independently, exactly how a
    trainer consumes them); no RNG, resumable mid-epoch."""
    from my_cudf_spark.operators.packing import global_cumsum
    from my_cudf_spark.operators.sampling import epoch_shuffle

    from my_cudf_spark.operators.dedup import _persist

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Pin the (doc_id, token-count) metadata once: the three epoch chains
    # plus the epoch-1 self-join otherwise each re-scan and re-tokenize
    # the text column (4 corpus text passes for one 2-column frame).
    base = _persist(
        docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("nt"),
        )
    )
    per_epoch = []
    for e in (1, 2, 3):
        # rank AND token cumsum in ONE cumsum pass (r12): the chained
        # global_cumsum(sh, ["pos"], "nt") re-evaluated the rank pass in
        # each of its three plan branches; pos order == rank-key order,
        # so the fused exclusive sums are bit-identical.
        cum = epoch_shuffle(
            base, ["doc_id"], epoch=e, extra_cumsums=[("nt", "cum")]
        )
        per_epoch.append(
            cum.withColumn(
                "pack", F.floor(F.col("cum") / F.lit(2048.0)).cast("long")
            ).withColumn("epoch", F.lit(e))
        )
    # epoch 1 feeds both the union and the same_as_e1 join — pin it so the
    # two consumers share one evaluation of its rank+cumsum exchanges.
    per_epoch[0] = _persist(per_epoch[0])
    all_e = per_epoch[0].unionByName(per_epoch[1]).unionByName(per_epoch[2])
    e1 = per_epoch[0].select("doc_id", F.col("pos").alias("pos1"))
    return (
        all_e.join(e1, "doc_id")
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("pos").alias("n_distinct_pos"),
            F.max("pos").cast("long").alias("max_pos"),
            F.sum((F.col("pos") == F.col("pos1")).cast("long")).alias("same_as_e1"),
            F.countDistinct("pack").alias("n_packs"),
            F.sum("nt").alias("n_tokens"),
        )
        .orderBy("epoch")
    )
