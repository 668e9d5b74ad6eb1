"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across cluster sizes —
partition-seeded RNG changes membership when the partitioning changes.
Training pipelines need CONTENT-KEYED sampling: membership is a pure
function of the row's key, so the same corpus yields the same sample on
any cluster, resumes are consistent, and train/test splits never leak
when data is re-partitioned or re-ingested.  (The reference exposes only
partition-seeded `sample` — copying.hpp:30 `cudf::sample` — so this is a
capability superset in the spirit of SURVEY §2.3.)

Mechanism: md5 over the key columns (+ optional salt), compare a fixed
hex prefix against a precomputed threshold.  Lowercase fixed-width hex
compares lexicographically = numerically, and md5 is available in every
engine (the DuckDB oracles run the identical expression) — no float
rounding, no RNG, no engine-specific hash.

All three operators are narrow (no shuffle) except ``stratified_sample``,
which needs one hash-partitioned window per stratum — the exact per-group
top-n shape.  Nothing here touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "assign_splits",
    "stratified_sample",
    "mixture_sample",
    "epoch_shuffle",
    "grouped_topn",
    "token_budget_mixture",
    "es_priority",
    "weighted_sample",
    "negative_samples",
]

_PREFIX_LEN = 8  # 32 bits of the digest: plenty for sampling resolution


def hash_bucket(key_cols: Sequence[str | Column], salt: str = "") -> Column:
    """Deterministic hex bucket in [0, 16^8) as a fixed-width lowercase hex
    string — the comparable sampling key. Same formula the oracles use:
    ``substr(md5(concat_ws('|', salt, keys...)), 1, 8)``."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *[c.cast("string") for c in cols])),
        1,
        _PREFIX_LEN,
    )


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(int(fraction * (16**_PREFIX_LEN)), f"0{_PREFIX_LEN}x")


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the key
    (re-runs, re-partitions, and other engines agree exactly)."""
    return df.filter(hash_bucket(key_cols, salt) < F.lit(_threshold_hex(fraction)))


def assign_splits(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a deterministic split ('train'/'val'/'test'…)
    by cumulative hash-threshold — disjoint, exhaustive, leak-free under
    re-partitioning.  ``weights`` must sum to 1 (±1e-9)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(key_cols, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(_threshold_hex(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_cols: Sequence[str | Column],
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash rank
    (deterministic; one shuffle).  Equal per-stratum quotas are the usual
    balanced-corpus construction; for proportional quotas use
    ``hash_sample`` filtered per stratum."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    keys = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(key_cols, salt), *[k.cast("string") for k in keys]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_cols: Sequence[str | Column],
    target_weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Downsample each domain so the surviving corpus approaches the target
    mixture (the DoReMi/data-mixing reshape: domain reweighting by
    subsampling, never upsampling).

    With n_d rows in domain d and target share w_d, the largest achievable
    corpus keeps p_d = c*w_d/n_d of domain d where c = min_d(n_d/w_d) —
    the binding domain is kept whole, every other domain is thinned to
    match its share.  Membership stays a pure function of the row key:
    row kept iff hash_bucket < hex(floor(p_d*16^8)).  Plan shape: one tiny
    count-per-domain aggregate, a scalar min folded in a second tiny agg,
    a broadcast-sized join of per-domain thresholds back onto the corpus,
    then a narrow filter — no full-data shuffle at any scale.

    Domains absent from ``target_weights`` get weight 0 (dropped).
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    bad = [w for w in target_weights.values() if w <= 0]
    if bad:
        raise ValueError(f"target weights must be positive, got {bad}")
    total = sum(target_weights.values())
    weight = F.create_map(
        *[F.lit(x) for kv in target_weights.items() for x in (kv[0], kv[1] / total)]
    )
    counts = (
        df.groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", weight[F.col("__dom")])
        .filter(F.col("__w").isNotNull())
    )
    # c = min_d n_d/w_d, folded as a global window over the tiny counts
    # frame (<= |domains| rows) rather than a separate aggregate +
    # crossJoin: a second aggregate would embed the full input subplan a
    # third time, and on composed inputs (pipeline_curation's scored+dedup
    # chain) that is another corpus-wide recompute unless AQE happens to
    # reuse the exchange.  Two embeddings (counts + final join) is the
    # minimum, and AQE dedups those into one scan + one shuffle.
    w_all = Window.partitionBy()
    thresholds = (
        counts.withColumn("__c", F.min(F.col("__n") / F.col("__w")).over(w_all))
        .withColumn("__p", F.least(F.lit(1.0), F.col("__c") * F.col("__w") / F.col("__n")))
        .withColumn(
            "__thr",
            F.lower(
                F.lpad(
                    F.hex(F.floor(F.col("__p") * F.lit(float(16**_PREFIX_LEN))).cast("bigint")),
                    _PREFIX_LEN + 1,
                    "0",
                )
            ),
        )
        .select("__dom", "__thr")
    )
    # Thresholds are 9 hex digits (p=1 → 0x100000000); pad the 8-digit
    # bucket with a leading 0 so the lexicographic compare stays numeric.
    bucket = F.concat(F.lit("0"), hash_bucket(key_cols, salt))
    return (
        df.join(
            F.broadcast(thresholds), F.col(domain_col) == F.col("__dom"), "inner"
        )
        .filter(bucket < F.col("__thr"))
        .drop("__dom", "__thr")
    )


def epoch_shuffle(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    epoch: int,
    out_col: str = "pos",
    extra_cumsums: Sequence[tuple[str, str]] | None = None,
) -> DataFrame:
    """Deterministic per-epoch global shuffle for training order: position =
    rank of md5('epoch<e>|' || key) — a pure function of (key, epoch), so
    every epoch is a different but REPRODUCIBLE permutation on any cluster
    size, resumable mid-epoch (no RNG state to restore).

    The rank is a contiguous 0..n-1 index computed via
    ``packing.global_cumsum`` on the NUMERIC value of the digest prefix
    (15 hex chars = 60 bits: lexicographic hex order == numeric order),
    which keeps it on the deterministic-bucket path — one hash exchange,
    no single-task global window, no checkpoint.  Digest ties (≈2^-60) are
    broken by the key itself."""
    from my_cudf_spark.operators.packing import global_cumsum

    keys = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    digest = F.md5(F.concat_ws("|", F.lit(f"epoch{epoch}"), *keys))
    knum = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    d = df.withColumn("__ek", knum)
    # ``extra_cumsums`` [(value_col, out_col), ...] rides the SAME
    # multi-value cumsum pass (r12): the rank order (digest, keys) IS the
    # pos order, so an exclusive sum over pos equals one over the rank
    # key bit-for-bit — and chaining a second global_cumsum on pos would
    # re-evaluate this whole pass inside each of its three plan branches.
    vals, outs = ["__one"], [out_col]
    for v, o in extra_cumsums or ():
        vals.append(v)
        outs.append(o)
    return (
        global_cumsum(d.withColumn("__one", F.lit(1)), ["__ek", *key_cols], vals, out_col=outs)
        .drop("__one", "__ek")
    )


def es_priority(
    key_cols: Sequence[str | Column],
    weight_col: str | Column,
    salt: str = "wsample",
) -> Column:
    """Efraimidis–Spirakis exponential order key ``-ln(u)/w`` with a
    content-derived uniform u (md5 of the salted row key, 13 hex digits =
    52 bits → exact in double, +1 keeps u strictly > 0).  The k smallest
    keys are a weighted sample without replacement; a pure function of
    (key, weight) — no RNG — so it is reproducible across runs, cluster
    sizes AND batch/stream execution (streaming.reservoir relies on that:
    the reservoir merge is a set-k-smallest fold, order-independent
    because the priority rides with the row)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    parts: list[Column] = [F.lit(salt)]
    for c in cols:
        parts += [F.lit("|"), c.cast("string")]
    u = (F.conv(F.substring(F.md5(F.concat(*parts)), 1, 13), 16, 10).cast("long") + 1) / F.lit(
        float(16**13 + 1)
    )
    return -F.log(u) / w.cast("double")


def weighted_sample(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    weight_col: str | Column,
    k: int,
    salt: str = "wsample",
    key_out: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets the order key ``-ln(u)/w`` from a
    content-derived uniform u (md5 of the salted row key, 13 hex digits →
    (0,1]); the k smallest keys ARE a weighted sample without replacement
    — inclusion probability proportional to weight, reproducible across
    runs and cluster sizes because u is content-keyed, never an RNG (the
    same property every sampler in this module relies on).

    Rows with weight <= 0 or NULL are excluded (zero mass).  Returns the
    sampled rows with ``key_out`` attached.

    Scale: one narrow pass + ``orderBy().limit(k)`` —
    TakeOrderedAndProject, per-partition partial top-k then a k-row merge
    on the driver side of the exchange; nothing global materializes."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = es_priority(cols, w, salt)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn(key_out, key)
        .orderBy(key_out, *cols)
        .limit(k)
    )


def grouped_topn(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    n: int,
    rank_out: str = "rank",
) -> DataFrame:
    """Deterministic top-n rows per group, safe for GIANT groups.

    ``Window.partitionBy(group).orderBy(...)`` sorts each group inside ONE
    task — fine when groups are query-ids (bounded candidates), fatal when
    a handful of groups span terabytes (k-means cells, language buckets).
    Two phases instead:

    1. per-(group, input-partition) local top-n — every task keeps at most
       n rows per group it sees, so the survivor set is ≤ n × partitions
       per group (metadata-sized);
    2. the real per-group window over the survivors only.

    ``order_cols`` must be a total order within each group (ties would make
    both the pruning and the final rank nondeterministic).  Result is
    IDENTICAL to the one-window form: any row outside a partition-local
    top-n is outside the global top-n a fortiori."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    local = Window.partitionBy(*group_cols, "__pid").orderBy(*order)
    final = Window.partitionBy(*group_cols).orderBy(*order)
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(local))
        .filter(F.col("__lrn") <= n)
        .drop("__pid", "__lrn")
    )
    return (
        pruned.withColumn(rank_out, F.row_number().over(final))
        .filter(F.col(rank_out) <= n)
    )


def negative_samples(
    anchors: DataFrame,
    corpus: DataFrame,
    anchor_col: str,
    id_col: str,
    k: int,
    exclusions: DataFrame | None = None,
    pad: int = 4,
    bucket_chars: int = 2,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic consistent-hash negative sampling — the contrastive-
    training counterpart of ``hash_sample``: for every anchor, ``k``
    pseudo-random corpus ids, reproducible on any cluster and any
    partitioning because each draw is a pure function of (anchor, slot).

    Mechanism (consistent hashing): every corpus id gets a position
    ``h = md5(salt|id)`` on a 60-bit ring sharded into ``16^bucket_chars``
    buckets by digest prefix; each (anchor, slot) pair hashes to a probe
    point and draws the first corpus position at-or-after it within the
    point's bucket, wrapping to the bucket's minimum.  md5 uniformity
    makes the draw distribution uniform over the bucket's members and the
    buckets uniform over ids.  The anchor itself, any (anchor, id) pair in
    ``exclusions`` (first column = anchor id, second = excluded id), and
    repeat draws are discarded; ``k + pad`` slots are drawn so discards
    rarely under-fill.  Output: ``(anchor_col, rank 1..k, neg_<id_col>)``
    — fewer than ``k`` rows for an anchor only if discards exhaust the
    padding (deterministic either way; the oracle replicates exactly).

    Scale: the probe is ``asof_join`` (forward) keyed on the bucket — one
    sort-merge-shaped window pass per side, never an anchors × corpus
    expansion; the wraparound rides a ``16^bucket_chars``-row broadcast of
    per-bucket minima; dedup/rank windows partition by anchor over
    ≤ k+pad rows.  Size ``bucket_chars`` so one bucket's corpus slice fits
    a task (2 → 256 buckets; 100 TB corpora want 3-4); a bucket with no
    corpus member drops the slot, so keep ``16^bucket_chars`` well under
    corpus cardinality.
    """
    from my_cudf_spark.operators.joins import asof_join

    if not 1 <= bucket_chars <= 8:
        raise ValueError(f"bucket_chars must be in [1,8], got {bucket_chars}")
    m_c = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    corp = corpus.select(
        F.substring(m_c, 1, bucket_chars).alias("__bkt"),
        F.conv(F.substring(m_c, 1, 15), 16, 10).cast("long").alias("__pos"),
        F.col(id_col).alias("__neg"),
    )
    m_p = F.md5(
        F.concat(
            F.lit(salt + "q|"),
            F.col("__anchor").cast("string"),
            F.lit("|"),
            F.col("__s").cast("string"),
        )
    )
    points = (
        anchors.select(F.col(anchor_col).alias("__anchor"))
        .select("__anchor", F.explode(F.sequence(F.lit(0), F.lit(k + pad - 1))).alias("__s"))
        .select(
            "__anchor",
            "__s",
            F.substring(m_p, 1, bucket_chars).alias("__bkt"),
            F.conv(F.substring(m_p, 1, 15), 16, 10).cast("long").alias("__pos"),
        )
    )
    probed = asof_join(points, corp, on="__pos", by=["__bkt"], direction="forward")
    wrap = corp.groupBy("__bkt").agg(F.min(F.struct("__pos", "__neg")).alias("__w"))
    cand = (
        probed.join(F.broadcast(wrap), "__bkt", "left")
        .select(
            "__anchor",
            "__s",
            F.coalesce(F.col("__neg"), F.col("__w").getField("__neg")).alias("__neg"),
        )
        .filter(F.col("__neg").isNotNull() & (F.col("__neg") != F.col("__anchor")))
    )
    if exclusions is not None:
        ea, ee = exclusions.columns[:2]
        ex = exclusions.select(
            F.col(ea).alias("__anchor"), F.col(ee).alias("__neg")
        )
        cand = cand.join(ex, ["__anchor", "__neg"], "left_anti")
    w_dedup = Window.partitionBy("__anchor", "__neg").orderBy("__s")
    w_rank = Window.partitionBy("__anchor").orderBy("__s")
    return (
        cand.withColumn("__rd", F.row_number().over(w_dedup))
        .filter(F.col("__rd") == 1)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__anchor").alias(anchor_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("__neg").alias(f"neg_{id_col}"),
        )
    )


def token_budget_mixture(
    docs: DataFrame,
    id_col: str,
    source_col: str,
    tokens_col: str,
    quality_col: str,
    budget_frac: float = 0.4,
    max_epochs: float = 2.0,
    salt: str = "rep",
) -> tuple[DataFrame, DataFrame]:
    """Token-budget data mixing: greedy quality-ranked waterfill of a
    corpus-wide token budget across sources, each source capped at
    ``max_epochs`` repetitions, then DETERMINISTIC fractional-epoch
    replication per document — the allocation step a pretraining stack
    runs between curation and tokenization (cf. the epoch-capped source
    weights of the Llama / Gopher data recipes).

    Returns ``(allocation, replicated)``:

    - ``allocation`` — one row per source: total_tokens, mean_q (the
      DECIMAL(28,9) order-independent mean of per-doc quality),
      alloc_tokens = min(floor(max_epochs·total), max(0, budget −
      cum-cap of better-ranked sources)) with budget =
      floor(budget_frac·Σtotal) — greedy fill is a plain cumulative sum
      of caps because every source before the boundary fills fully —
      and epochs = alloc/total.
    - ``replicated`` — ``docs`` with ``n_rep`` copies per row materialized
      (floor(epochs) + one md5-hash-gated extra with probability
      frac(epochs)); membership is a pure function of (salt, id), so the
      realized mixture is reproducible and SQL-replicable.

    Scale: one corpus aggregation, a window over the per-SOURCE frame
    (bounded: one row per source), one 1-row budget broadcast, and one
    broadcast join back to docs — no corpus-sized shuffle beyond the
    per-source agg."""
    DEC = "decimal(28,9)"
    d = docs.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("__nt"),
        F.col(quality_col).alias("__q"),
    )
    per_src = d.groupBy("source").agg(
        F.sum("__nt").alias("total_tokens"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__q").cast(DEC)).alias("__qsum"),
    )
    budget = per_src.agg(
        F.floor(F.lit(budget_frac) * F.sum("total_tokens"))
        .cast("long")
        .alias("__budget")
    )
    w = Window.orderBy(F.col("mean_q").desc(), "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    alloc = (
        per_src.withColumn(
            "mean_q", F.col("__qsum").cast("double") / F.col("__n")
        )
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "__cap", F.floor(F.lit(max_epochs) * F.col("total_tokens")).cast("long")
        )
        # Window over the per-source frame: bounded by the source
        # vocabulary (one row per source), never corpus-sized.
        .withColumn("__cumcap", F.coalesce(F.sum("__cap").over(w), F.lit(0)))
        .withColumn(
            "alloc_tokens",
            F.least(
                F.col("__cap"),
                F.greatest(F.col("__budget") - F.col("__cumcap"), F.lit(0)),
            ),
        )
        .withColumn(
            "epochs", F.col("alloc_tokens").cast("double") / F.col("total_tokens")
        )
        .select("source", "total_tokens", "mean_q", "alloc_tokens", "epochs")
    )
    thr = F.floor(
        (F.col("epochs") - F.floor(F.col("epochs"))) * F.lit(4294967296.0)
    ).cast("long")
    rep = (
        d.join(F.broadcast(alloc.withColumn("__thr", thr)), "source")
        .withColumn(
            "n_rep",
            F.floor("epochs").cast("long")
            + F.when(
                F.conv(hash_bucket(["__id"], salt=salt), 16, 10).cast("long")
                < F.col("__thr"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .filter(F.col("n_rep") > 0)
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.col("n_rep"))))
        .select(
            F.col("__id").alias(id_col),
            "source",
            F.col("__nt").alias(tokens_col),
            "n_rep",
            "__copy",
        )
    )
    return alloc, rep
