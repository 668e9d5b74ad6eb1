"""Relational operators: the cudf_polars IR node set and the pandas-level
frame verbs, re-expressed over pyspark.sql.DataFrame (SURVEY.md §2.1).

Modules:
- ``frame``      : order-aware verbs (distinct keep-first/last, slice,
                   unique-consecutive, hconcat, merge-sorted, sample, shift).
- ``joins``      : join helpers (broadcast-aware equi/theta/mixed joins,
                   as-of join, salted skew join).
- ``windows``    : rolling / grouped-rolling / range windows, resample,
                   ffill/bfill, EWMA, interpolate, rank family.
- ``reshape``    : melt, pivot, pivot_table, crosstab, get_dummies, one-hot.
- ``dedup``      : exact, minhash-LSH, simhash, ngram-jaccard dedup.
- ``similarity`` : cosine top-k, LSH-bucketed ANN over embedding columns.
- ``multimodal`` : binary media columns + typed metadata plumbing.
"""
