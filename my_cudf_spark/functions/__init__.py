"""Function library: the reference's scalar/array expression surface
(SURVEY.md §2.8, §2.10) over ``pyspark.sql.functions``.

- ``compat``  : cudf/libcudf-named scalar ops (strings, datetime, math,
  lists, structs, hashing, json) as Column functions.
- ``stable``  : decimal-stable aggregate helpers for differential testing.
- ``text``    : nvtext-surface text ops (tokenize, ngrams, minhash, jaccard,
  language-id heuristic, quality scoring, fingerprinting).
- ``bpe``     : real byte-pair encoding + WordPiece tokenization against
  fixed merges/vocab model artifacts (byte_pair_encoding.hpp:97,
  wordpiece_tokenize.hpp:71).
- ``vectors`` : embedding-column helpers (cosine, dot, norms).
"""

from my_cudf_spark.functions import compat, stable  # noqa: F401
