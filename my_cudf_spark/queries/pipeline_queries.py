"""End-to-end LLM-corpus curation pipeline as ONE declarative Spark plan.

The flagship composition query: quality filter → exact dedup (keep-first)
→ source-balancing mixture resample → train/val/test split → per-cell
corpus accounting.  Every stage is the operator the standalone queries
test in isolation (text.quality_score, frame-style keep-first dedup,
sampling.mixture_sample, sampling.assign_splits); the value demonstrated
here is that they compose into a single lazy DAG Catalyst optimizes
end-to-end — one documents scan, no materialization between stages —
with a bit-exact DuckDB oracle for the whole pipeline.

Scale: the only full-data shuffles are the dedup hash-partition and the
final (source, split) aggregation; mixture thresholds and split
assignment are narrow (broadcast/scalar).  Mixture and split hashing use
DIFFERENT salts — with a shared salt the mixture's survivors all have
small hash buckets and would land entirely in 'train'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_cudf_spark.functions import text as T
from my_cudf_spark.functions.stable import sql_dec2dbl
from my_cudf_spark.operators import sampling as S
from my_cudf_spark.operators.dedup import _persist
from my_cudf_spark.operators.sampling import _threshold_hex
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table

_SOURCES = [f"src{i}" for i in range(20)]
QUALITY_MIN = 0.88

# DuckDB twins of the per-stage expressions (kept adjacent to the Spark
# code path; same fragments the standalone queries use).
SQL_NORM = "trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))"
SQL_QUALITY = """ROUND(CASE WHEN n > 0 THEN (CAST(alpha AS DOUBLE)/n)*0.6
  + (CASE WHEN (CAST(n - spaces AS DOUBLE)/(spaces+1)) BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END)*0.3
  + LEAST(CAST(n AS DOUBLE)/100.0, 1.0)*0.1 ELSE 0.0 END, 6)"""

PIPELINE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, text,
         {SQL_QUALITY} AS quality,
         len(string_split(trim(text), ' ')) AS n_tokens
  FROM (SELECT doc_id, source, text, length(text) AS n,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '[^ ]', '', 'g')) AS spaces
        FROM documents)
  WHERE {SQL_QUALITY} >= {QUALITY_MIN}),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5({SQL_NORM})
                                 ORDER BY doc_id) AS rk
    FROM scored) WHERE rk = 1),
counts AS (SELECT source AS dom, COUNT(*) AS cnt FROM deduped
           WHERE source IN ({", ".join(f"'{s}'" for s in _SOURCES)})
           GROUP BY source),
c AS (SELECT MIN(cnt / CAST(0.05 AS DOUBLE)) AS c FROM counts),
thr AS (SELECT dom,
               lpad(printf('%x', CAST(floor(least(CAST(1.0 AS DOUBLE),
                    c * CAST(0.05 AS DOUBLE) / cnt) * 4294967296.0) AS BIGINT)),
                    9, '0') AS thr
        FROM counts, c),
mixed AS (
  SELECT d.* FROM deduped d JOIN thr ON d.source = thr.dom
  WHERE '0' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8) < thr),
labeled AS (
  SELECT *, CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < '{_threshold_hex(0.9)}' THEN 'train'
                 WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < '{_threshold_hex(0.95)}' THEN 'val'
                 ELSE 'test' END AS split
  FROM mixed)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       {sql_dec2dbl('SUM(CAST(quality AS DECIMAL(10,6)))')} / COUNT(*) AS avg_quality
FROM labeled GROUP BY source, split ORDER BY source, split
"""


@register("pipeline_curation", sql=PIPELINE_SQL)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline in one plan; see module docstring."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        T.quality_score("text").alias("quality"),
        T.count_tokens("text").cast("long").alias("n_tokens"),
    ).filter(F.col("quality") >= QUALITY_MIN)
    w = Window.partitionBy(F.md5(T.normalize_text("text"))).orderBy("doc_id")
    deduped = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    # mixture_sample reads its input twice (per-domain counts + membership
    # join).  The two embeddings prune different columns, so Catalyst/AQE
    # cannot canonicalize the scored+dedup subplans into one exchange —
    # persist the survivors (post-filter, far smaller than the corpus) so
    # documents is scanned and quality-scored exactly once; the LRU in
    # operators.dedup evicts it once the pipeline is done.
    deduped = _persist(deduped)
    mixed = S.mixture_sample(
        deduped, "source", ["doc_id"], {s: 1.0 for s in _SOURCES}, salt="mix"
    )
    labeled = S.assign_splits(
        mixed, ["doc_id"], {"train": 0.9, "val": 0.05, "test": 0.05}, salt="split"
    )
    return (
        labeled.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (
                F.sum(F.col("quality").cast("decimal(10,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )
        .orderBy("source", "split")
    )


_SW_EN = "'the','and','of','to','a','in','is','for','on','with'"

DATA_CARD_SQL = f"""
WITH t AS (
  SELECT source,
         {SQL_QUALITY} AS quality,
         len(string_split(trim(text), ' ')) AS n_tokens,
         sha256(substring({SQL_NORM}, 1, 60)) AS content_key,
         CASE WHEN len(toks) > 0
              THEN ROUND(CAST(len(list_filter(toks, x -> x IN ({_SW_EN}))) AS DOUBLE)
                         / len(toks), 6) ELSE 0.0 END AS sw_en
  FROM (SELECT source, text, length(text) AS n,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '[^ ]', '', 'g')) AS spaces,
               string_split({SQL_NORM}, ' ') AS toks
        FROM documents))
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) - COUNT(DISTINCT content_key) AS BIGINT) AS dup_docs,
       CAST(SUM(CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
       ROUND(MEDIAN(n_tokens), 6) AS p50_tokens,
       ROUND(QUANTILE_CONT(n_tokens, 0.95), 6) AS p95_tokens,
       {sql_dec2dbl('SUM(CAST(quality AS DECIMAL(10,6)))')} / COUNT(*) AS avg_quality,
       {sql_dec2dbl('SUM(CAST(sw_en AS DECIMAL(10,6)))')} / COUNT(*) AS avg_sw_en
FROM t GROUP BY source ORDER BY source
"""


@register("pipeline_data_card", sql=DATA_CARD_SQL)
def pipeline_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card (Gebru et al. 2021 "Datasheets for Datasets"; the
    per-source accounting block a release data card publishes): for each
    source — volume (docs, tokens), exact token-length distribution
    (p50/p95 via a shared exact-percentile buffer), exact-duplicate count
    (docs minus distinct content keys, the dedup_exact key), short-doc
    count, mean heuristic quality, and mean English-stopword ratio (the
    language-mix signal).

    Plan shape: ONE documents scan → one narrow projection (all doc-level
    stats are whole-stage-codegen Column arithmetic; the stopword ratio
    reads a materialized token array, the _with_tokens lesson) → one
    groupBy(source) with partial aggregation; COUNT(DISTINCT content_key)
    is the only expand (Spark plans it as a two-phase distinct aggregate
    on (source, key) — still bounded by corpus cardinality, never
    all-pairs).  At 100 TB this is the canonical one-pass map-side-combine
    report: no joins, no windows, output rows = |sources|."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(T.normalize_text("text"), " ")
    sw = F.array(*[F.lit(w) for w in
                   ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with")])
    doc = docs.select(
        "source",
        T.quality_score("text").alias("quality"),
        T.count_tokens("text").cast("long").alias("n_tokens"),
        F.sha2(F.substring(T.normalize_text("text"), 1, 60), 256).alias("content_key"),
        toks.alias("toks"),
    ).withColumn(
        "sw_en",
        F.when(
            F.size("toks") > 0,
            F.round(
                F.size(F.filter("toks", lambda x: F.array_contains(sw, x)))
                .cast("double") / F.size("toks"),
                6,
            ),
        ).otherwise(F.lit(0.0)),
    )
    agg = doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("content_key")).alias("dup_docs"),
        F.sum(F.when(F.col("n_tokens") < 10, 1).otherwise(0)).cast("long").alias("short_docs"),
        F.expr("percentile(n_tokens, array(0.5D, 0.95D))").alias("q"),
        (
            F.sum(F.col("quality").cast("decimal(10,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
        (
            F.sum(F.col("sw_en").cast("decimal(10,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_sw_en"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "dup_docs",
        "short_docs",
        F.round(F.element_at("q", 1), 6).alias("p50_tokens"),
        F.round(F.element_at("q", 2), 6).alias("p95_tokens"),
        "avg_quality",
        "avg_sw_en",
    ).orderBy("source")


def _model_pipeline_sql() -> str:
    """PIPELINE_SQL with the model-based quality stage (r7) spliced in
    between the heuristic filter and dedup — same fragments as the
    text_quality_model oracle."""
    from my_cudf_spark.queries.text_queries import (
        _QM_BIAS_MICRO,
        _QM_NBUCKETS,
        _QM_W_SQL,
    )

    return f"""
WITH scored AS (
  SELECT doc_id, source, text,
         {SQL_QUALITY} AS quality,
         len(string_split(trim(text), ' ')) AS n_tokens
  FROM (SELECT doc_id, source, text, length(text) AS n,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '[^ ]', '', 'g')) AS spaces
        FROM documents)
  WHERE {SQL_QUALITY} >= {QUALITY_MIN}),
feats AS (
  SELECT doc_id,
         list_concat(toks, list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1])) AS feats
  FROM (SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks FROM scored)),
modeled AS (
  SELECT s.* FROM scored s JOIN feats f USING (doc_id)
  WHERE len(f.feats) > 0
    AND list_sum(list_transform(f.feats,
          g -> ({_QM_W_SQL})[(('0x' || substr(md5(g), 1, 15))::BIGINT % {_QM_NBUCKETS}) + 1]))::DOUBLE
        / 1000000.0 / len(f.feats) + ({_QM_BIAS_MICRO}::DOUBLE / 1000000.0) > 0),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5({SQL_NORM})
                                 ORDER BY doc_id) AS rk
    FROM modeled) WHERE rk = 1)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       {sql_dec2dbl('SUM(CAST(quality AS DECIMAL(10,6)))')} / COUNT(*) AS avg_quality
FROM deduped GROUP BY source ORDER BY source
"""


@register("pipeline_curation_model", sql=_model_pipeline_sql())
def pipeline_curation_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline with the TRAINED-classifier stage (r7 north
    star): heuristic quality filter → model-based quality filter
    (text.classifier_logit over hashed unigram+bigram features, logit > 0
    — the CCNet/Gopher/Llama stage order: cheap heuristics first, the
    model on the survivors) → exact dedup (keep-first) → per-source
    corpus accounting.  One lazy DAG, one documents scan; the classifier
    is pure whole-stage-codegen Column arithmetic, so the added stage
    costs one projection, no shuffle, no UDF."""
    from my_cudf_spark.queries.text_queries import (
        _QM_BIAS_MICRO,
        _QM_WEIGHTS,
        _norm_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        T.quality_score("text").alias("quality"),
        T.count_tokens("text").cast("long").alias("n_tokens"),
    ).filter(F.col("quality") >= QUALITY_MIN)
    feat = scored.withColumn("toks", _norm_tokens()).withColumn(
        "feats", T.classifier_features(F.col("toks"), max_n=2)
    )
    from my_cudf_spark.operators.dedup import md5_hash60

    # Persist the logit-scored survivors before filtering: a bare filter
    # predicate gets pushed THROUGH the toks/feats projections by
    # substitution, inlining the normalize+split chain into the ngram
    # lambda (per-element re-eval — measured 17 s vs 3 s at sf0.1).  The
    # cache boundary keeps the classifier a one-pass projection; the
    # frame is the heuristic survivors only, and the LRU releases it.
    scored_logit = _persist(
        feat.withColumn(
            "__logit",
            T.classifier_logit(
                F.col("feats"), _QM_WEIGHTS, _QM_BIAS_MICRO, hash_expr=md5_hash60
            ),
        ).drop("toks", "feats")
    )
    modeled = scored_logit.filter(F.col("__logit") > 0).drop("__logit")
    w = Window.partitionBy(F.md5(T.normalize_text("text"))).orderBy("doc_id")
    deduped = (
        modeled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (
                F.sum(F.col("quality").cast("decimal(10,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


def _pretrain_prefix_sql() -> str:
    """The shared curation-prefix CTE chain (through ``tok``) of the
    pipeline_pretrain / pipeline_pretrain_bestfit oracles."""
    from my_cudf_spark.queries.text_queries import (
        _QM_BIAS_MICRO,
        _QM_NBUCKETS,
        _QM_W_SQL,
        VOCAB,
    )

    return f"""
WITH scored AS (
  SELECT doc_id, source, text,
         {SQL_QUALITY} AS quality,
         len(string_split(trim(text), ' ')) AS n_tokens
  FROM (SELECT doc_id, source, text, length(text) AS n,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               length(regexp_replace(text, '[^ ]', '', 'g')) AS spaces
        FROM documents)
  WHERE {SQL_QUALITY} >= {QUALITY_MIN}),
feats AS (
  SELECT doc_id,
         list_concat(toks, list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1])) AS feats
  FROM (SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks FROM scored)),
modeled AS (
  SELECT s.* FROM scored s JOIN feats f USING (doc_id)
  WHERE len(f.feats) > 0
    AND list_sum(list_transform(f.feats,
          g -> ({_QM_W_SQL})[(('0x' || substr(md5(g), 1, 15))::BIGINT % {_QM_NBUCKETS}) + 1]))::DOUBLE
        / 1000000.0 / len(f.feats) + ({_QM_BIAS_MICRO}::DOUBLE / 1000000.0) > 0),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5({SQL_NORM})
                                 ORDER BY doc_id) AS rk
    FROM modeled) WHERE rk = 1),
tok AS (
  SELECT doc_id, source, n_tokens,
         array_to_string(list_transform(string_split({SQL_NORM}, ' '),
           x -> CAST(COALESCE(list_position({VOCAB!r}, x) - 1, -1) AS VARCHAR)),
           ',') AS ids,
         substr(md5('epoch1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS ek
  FROM deduped)"""


def _pretrain_sql() -> str:
    """Whole-pipeline DuckDB twin of pipeline_pretrain: the shared
    curation prefix, then windowed global offsets in shuffle order and
    512-token pack assignment — per-document output so every stage's
    arithmetic is value-checked end to end."""
    return _pretrain_prefix_sql() + """,
ordered AS (
  SELECT doc_id, source, n_tokens, ids,
         CAST(ROW_NUMBER() OVER (ORDER BY ek, doc_id) - 1 AS BIGINT) AS pos,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY ek, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM tok)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, ids, pos,
       start_offset,
       CAST(start_offset // 512 AS BIGINT) AS pack_id,
       CAST((start_offset + n_tokens - 1) // 512 AS BIGINT) AS end_pack_id,
       (start_offset + n_tokens - 1) // 512 > start_offset // 512 AS straddle
FROM ordered ORDER BY doc_id
"""


def _curated_tok_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining curation prefix (heuristic quality → trained-model
    filter → exact keep-first dedup → vocabulary tokenization → epoch-1
    shuffle key), ending at the persisted doc-level METADATA frame both
    packing variants consume — factored out so pipeline_pretrain and
    pipeline_pretrain_bestfit share the identical curation plan."""
    from my_cudf_spark.operators.dedup import md5_hash60
    from my_cudf_spark.queries.text_queries import (
        _QM_BIAS_MICRO,
        _QM_WEIGHTS,
        _norm_tokens,
        VOCAB,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        T.quality_score("text").alias("quality"),
        T.count_tokens("text").cast("long").alias("n_tokens"),
    ).filter(F.col("quality") >= QUALITY_MIN)
    feat = scored.withColumn("toks", _norm_tokens()).withColumn(
        "feats", T.classifier_features(F.col("toks"), max_n=2)
    )
    # Persist boundary before the logit filter (the pipeline_curation_model
    # lesson): keeps the classifier a one-pass projection instead of
    # inlining the normalize+split chain into the ngram lambda.  ``toks``
    # survives the boundary — the tokenizer stage reads it after dedup.
    scored_logit = _persist(
        feat.withColumn(
            "__logit",
            T.classifier_logit(
                F.col("feats"), _QM_WEIGHTS, _QM_BIAS_MICRO, hash_expr=md5_hash60
            ),
        ).drop("feats")
    )
    modeled = scored_logit.filter(F.col("__logit") > 0).drop("__logit")
    w = Window.partitionBy(F.md5(T.normalize_text("text"))).orderBy("doc_id")
    deduped = (
        modeled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    ids = T.tokens_to_vocab_ids(F.col("toks"), VOCAB)
    # Persist the doc-level METADATA frame (no text, no toks) before the
    # cumsums: global_cumsum reads its input three times (bounds, bucket
    # totals, output join) and runs twice here — without this boundary the
    # classifier+dedup text shuffle would re-execute per reference instead
    # of once (the same call-owned persist convention as the logit stage).
    tok = _persist(deduped.select(
        "doc_id",
        "source",
        "n_tokens",
        F.array_join(F.transform(ids, lambda i: i.cast("string")), ",").alias("ids"),
        # epoch-1 deterministic shuffle key (sampling.epoch_shuffle
        # convention): 60-bit md5 prefix as a numeric order key — hex
        # lexicographic order == numeric order, so the DuckDB twin orders
        # by the hex string.
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("epoch1"), F.col("doc_id"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("__ek"),
    ))
    return tok


def _pretrain_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline_pretrain DAG up to (not including) the sized sink —
    factored out so tests/test_plans.py asserts the shuffle shape of the
    exact shipped plan."""
    from my_cudf_spark.operators.packing import global_cumsum

    tok = _curated_tok_frame(spark, sf_dir)
    # Global offsets in shuffle order: ONE deterministic-bucket cumsum
    # pass over doc-level metadata computing BOTH running sums
    # (rank-of-ones → pos, token cumsum → start_offset) over the same
    # order (r12, guide §7.2): the former chained form nested the first
    # cumsum's whole window+join tree inside the second call's three
    # plan branches — three full re-evaluations per consumer.  Values
    # bit-identical (same buckets, independent per-column sums).
    offs = global_cumsum(
        tok.withColumn("__one", F.lit(1)),
        ["__ek", "doc_id"],
        ["n_tokens", "__one"],
        out_col=["start_offset", "pos"],
    )
    end = F.col("start_offset") + F.col("n_tokens") - 1
    final = offs.select(
        "doc_id",
        "source",
        "n_tokens",
        "ids",
        F.col("pos").cast("long").alias("pos"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.floor(F.col("start_offset") / 512).cast("long").alias("pack_id"),
        F.floor(end / 512).cast("long").alias("end_pack_id"),
        (F.floor(end / 512) > F.floor(F.col("start_offset") / 512)).alias("straddle"),
    )
    return final


@register("pipeline_pretrain", sql=_pretrain_sql())
def pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-batch flagship (r7 verdict #1): curation
    (heuristic quality → trained-classifier filter → exact keep-first
    dedup) → vocabulary tokenization → deterministic epoch-1 shuffle →
    512-token sequence packing → SIZED parquet write, then read back for
    the whole-pipeline oracle compare.  Every stage is the operator its
    standalone query proves in isolation; the value proven here is the
    COMPOSITION: one lazy DAG from scan to sink that Catalyst optimizes
    end to end.

    Scale shape: ONE corpus-text-carrying shuffle total (the dedup hash
    partition — the model filter is pure codegen arithmetic and the
    tokenizer a literal-map projection, the 17s-vs-3s projection-barrier
    lesson applied via the same persist boundary as
    pipeline_curation_model); downstream of dedup only doc-level METADATA
    moves — the two global_cumsum passes (shuffle rank + token offsets)
    exchange (digest, doc_id, n_tokens) rows, never text, and the sized
    write repartitions the already-narrow output.  Plan-guarded in
    tests/test_plans.py::test_pipeline_pretrain_one_text_shuffle.

    Sized sink (sources/io.write_sized): the curation output lands as
    near-target-size files — the small-files guard a 100 TB pipeline
    needs at the write; read back so the oracle checks the full
    scan→sink→scan roundtrip."""
    from my_cudf_spark.queries.io_queries import _stage
    from my_cudf_spark.sources import io as IO

    final = _pretrain_frame(spark, sf_dir)
    path = _stage("pretrain", sf_dir)
    IO.write_sized(final, path, target_file_bytes=512 << 10)
    return spark.read.parquet(path).orderBy("doc_id")


@register(
    "pipeline_entity_resolution",
    sql="""
    WITH RECURSIVE
    recs AS (
        SELECT p_partkey AS id, 'src_a' AS source, lower(p_name) AS name FROM part
        UNION ALL
        SELECT p_partkey + 100000 AS id, 'src_b' AS source,
               substr(lower(p_name), 1, length(p_name) - 1) || 'x' AS name FROM part),
    reps AS (SELECT name, MIN(id) AS rep FROM recs GROUP BY name),
    star AS (SELECT r.rep AS src, t.id AS dst FROM recs t JOIN reps r USING (name)
             WHERE t.id <> r.rep),
    fz AS (SELECT x.rep AS src, y.rep AS dst
           FROM reps x JOIN reps y ON x.name <> y.name
           WHERE levenshtein(x.name, y.name) <= 1),
    e0 AS (SELECT src, dst FROM star UNION SELECT src, dst FROM fz),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    reach(id, r) AS (SELECT id, id FROM recs
                     UNION SELECT e.dst, reach.r FROM edges e
                           JOIN reach ON reach.id = e.src),
    lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    lf AS (SELECT recs.id, recs.source, recs.name, lab.cluster_id
           FROM recs JOIN lab USING (id))
    SELECT cluster_id, arg_min(name, id) AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT name) AS BIGINT) AS n_variants
    FROM lf GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution flagship (clustering.resolve_entities): two
    sources list the same entities — src_a the part vocabulary verbatim,
    src_b every name with its last character perturbed (the join_fuzzy
    planting) under offset record ids — and the pipeline reconciles them
    end-to-end in ONE lazy DAG: exact-name STAR edges (rep → member,
    linear in group size, never the n² clique) + pigeonhole-blocked fuzzy
    edges between name reps (edit distance ≤ 1) → min-label-propagation
    connected components → survivorship (min-id canonical name, record /
    source / variant counts per entity).  The DuckDB oracle replays the
    identical graph with a recursive CTE."""
    from my_cudf_spark.operators.clustering import resolve_entities

    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("rid"),
        F.lit("src_a").alias("source"),
        F.lower("p_name").alias("name"),
    )
    b = part.select(
        (F.col("p_partkey") + 100000).alias("rid"),
        F.lit("src_b").alias("source"),
        F.concat(
            F.expr("substr(lower(p_name), 1, length(p_name) - 1)"), F.lit("x")
        ).alias("name"),
    )
    out = resolve_entities(
        a.unionAll(b), id_col="rid", name_col="name", source_col="source"
    )
    return out.select(
        "cluster_id",
        "canonical_name",
        F.col("n_records").cast("long").alias("n_records"),
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("n_variants").cast("long").alias("n_variants"),
    ).orderBy("cluster_id")


def _pretrain_bestfit_sql() -> str:
    """Whole-pipeline twin of pipeline_pretrain_bestfit: the shared
    curation prefix, then harmonic size-class FFD pack assignment (the
    pack_documents_bestfit arithmetic) instead of offset chunking."""
    return _pretrain_prefix_sql() + """,
a AS (SELECT doc_id, source, n_tokens, ids,
             CAST(CASE WHEN n_tokens > 512 THEN 0
                       ELSE 512 // n_tokens END AS BIGINT) AS size_class,
             CAST(doc_id % 4 AS BIGINT) AS shard
      FROM tok WHERE n_tokens > 0),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY size_class, shard
                                   ORDER BY n_tokens DESC, doc_id) - 1 AS rn
      FROM a)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, ids,
       size_class, shard,
       CAST(rn // GREATEST(1, size_class) AS BIGINT) AS pack_idx,
       CAST(rn % GREATEST(1, size_class) AS INT) AS slot
FROM r ORDER BY doc_id
"""


@register("pipeline_pretrain_bestfit", sql=_pretrain_bestfit_sql())
def pipeline_pretrain_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining flagship composed with NO-SPLIT packing (r8
    verdict #5's optional composition): the identical curation prefix
    as pipeline_pretrain (heuristic quality → trained-classifier filter
    → exact keep-first dedup → vocabulary tokenization — the shared
    ``_curated_tok_frame`` plan), then packing.pack_bestfit assigns each
    surviving document WHOLE to a 512-token pack (harmonic size-class
    FFD) instead of chunking at global offsets — the variant a pipeline
    picks when truncating documents across sequence boundaries is not
    acceptable.  Packing adds one (class, shard) hash shuffle of
    doc-level metadata; text still moves exactly once (the dedup
    Exchange)."""
    from my_cudf_spark.operators.packing import pack_bestfit

    tok = _curated_tok_frame(spark, sf_dir)
    packed = pack_bestfit(
        tok.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 512, shards=4
    ).select("doc_id", "size_class", "shard", "pack_idx", "slot")
    return (
        tok.select("doc_id", "source", "n_tokens", "ids")
        .join(packed, "doc_id")
        .orderBy("doc_id")
    )
