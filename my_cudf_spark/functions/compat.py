"""cudf/libcudf-named scalar functions over pyspark.sql Columns.

Most reference kernels are literal 1:1 Spark builtins (SURVEY.md §2.8 maps
every header); this module implements the ones that are *not* single
builtins, and aliases a few commonly-used 1:1 names so a reference user
finds the same vocabulary. Reference file:line cited per function.

Everything here is JVM-side Column arithmetic — no Python UDFs — so it
stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "clamp",
    "zfill",
    "wrap",
    "swapcase",
    "normalize_spaces",
    "filter_characters",
    "partition_str",
    "rpartition_str",
    "find_multiple",
    "replace_nulls",
    "replace_nans",
    "nans_to_nulls",
    "normalize_nans_and_zeros",
    "copy_if_else",
    "label_bins",
    "is_leap_year",
    "days_in_month",
    "hash_values",
    "day_name",
    "pct_change",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- numeric -----------------------------------------------------------------

def clamp(col: Column | str, lo, hi) -> Column:
    """clamp (replace.hpp:219): greatest(least(x, hi), lo), null-preserving
    (Spark's greatest/least skip nulls; cudf clamp propagates them)."""
    c = _c(col)
    return F.when(c.isNotNull(), F.greatest(F.least(c, F.lit(hi)), F.lit(lo)))


def replace_nulls(col: Column | str, value) -> Column:
    """replace_nulls(value) (replace.hpp:55)."""
    return F.coalesce(_c(col), F.lit(value))


def replace_nans(col: Column | str, value) -> Column:
    """replace_nans (replace.hpp:121) → nanvl."""
    return F.nanvl(_c(col), F.lit(value))


def nans_to_nulls(col: Column | str) -> Column:
    """nans_to_nulls (transform.hpp:78)."""
    c = _c(col)
    return F.when(~F.isnan(c), c)


def normalize_nans_and_zeros(col: Column | str) -> Column:
    """normalize_nans_and_zeros (replace.hpp:289): -0.0 → +0.0, NaN →
    canonical NaN (Spark NaN is already canonical)."""
    c = _c(col)
    return F.when(c == 0.0, F.lit(0.0)).otherwise(c)


def copy_if_else(cond: Column, left: Column, right: Column) -> Column:
    """copy_if_else (copying.hpp:626) → when/otherwise."""
    return F.when(cond, left).otherwise(right)


def label_bins(col: Column | str, edges: list[float], right: bool = False) -> Column:
    """label_bins (labeling/label_bins.hpp:71) / cut (cudf/core/cut.py):
    0-based bin index, null outside range. Built as width_bucket-style
    chained comparisons (exact edge semantics, no UDF)."""
    c = _c(col)
    expr = F.lit(None).cast("int")
    for i in range(len(edges) - 1, 0, -1):
        lo, hi = edges[i - 1], edges[i]
        in_bin = ((c > lo) & (c <= hi)) if right else ((c >= lo) & (c < hi))
        expr = F.when(in_bin, F.lit(i - 1)).otherwise(expr)
    return expr


def pct_change(col: Column | str, prev: Column) -> Column:
    """GroupBy.pct_change (cudf groupby.py): (x - lag)/lag."""
    c = _c(col)
    return (c - prev) / prev


# --- strings -----------------------------------------------------------------

def zfill(col: Column | str, width: int) -> Column:
    """zfill (strings/padding.hpp:89): zero-pad preserving a leading sign."""
    c = _c(col)
    sign = F.when(c.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    digits = F.when(c.startswith("-"), F.substring(c, 2, 2**30)).otherwise(c)
    padded = F.concat(sign, F.lpad(digits, width - F.length(sign).cast("int"), "0"))
    # lpad truncates long inputs; zfill must leave them untouched
    return F.when(F.length(c) >= width, c).otherwise(padded)


def _name(c: Column) -> str:
    # Column SQL text for expr() composition (works for simple named columns)
    return c._jc.toString()  # noqa: SLF001


def wrap(col: Column | str, width: int) -> Column:
    """wrap (strings/wrap.hpp:65): greedy line-wrap at spaces to ``width`` —
    regex-based, no UDF."""
    return F.regexp_replace(_c(col), f"(.{{1,{width}}})( +|$)", "$1\n").cast("string")


def swapcase(col: Column | str) -> Column:
    """swapcase (strings/case.hpp:44-83): per-char case flip via translate
    over ASCII letters (non-ASCII passes through)."""
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    return F.translate(_c(col), lower + upper, upper + lower)


def normalize_spaces(col: Column | str) -> Column:
    """nvtext normalize_spaces (normalize.hpp:55): collapse whitespace runs,
    strip ends."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def filter_characters(col: Column | str, keep: str, *, is_class_body: bool = False) -> Column:
    """strings/translate.hpp:100 filter_characters: keep only the given
    characters.

    ``keep`` is a literal set of characters to retain — each is escaped
    before entering the negated character class, so ']', '^', '-' and '\\'
    are safe.  Pass ``is_class_body=True`` to supply a raw, already-valid
    character-class body instead (e.g. ``"a-z0-9"`` for ranges).
    """
    body = keep if is_class_body else "".join("\\" + ch for ch in keep)
    return F.regexp_replace(_c(col), f"[^{body}]", "")


def partition_str(col: Column | str, sep: str) -> Column:
    """strings/split/partition.hpp:60: (head, sep, tail) struct around the
    FIRST occurrence."""
    c = _c(col)
    idx = F.instr(c, sep)
    return F.struct(
        F.when(idx > 0, F.substring(c, F.lit(1), idx - 1)).otherwise(c).alias("head"),
        F.when(idx > 0, F.lit(sep)).otherwise(F.lit("")).alias("sep"),
        F.when(idx > 0, F.substring(c, idx + len(sep), F.length(c))).otherwise(F.lit("")).alias("tail"),
    )


def rpartition_str(col: Column | str, sep: str) -> Column:
    """partition.hpp:94: around the LAST occurrence."""
    c = _c(col)
    rev_idx = F.instr(F.reverse(c), sep[::-1])
    idx = F.when(rev_idx > 0, F.length(c) - rev_idx - len(sep) + 2).otherwise(F.lit(0))
    return F.struct(
        F.when(idx > 0, F.substring(c, F.lit(1), idx - 1)).otherwise(F.lit("")).alias("head"),
        F.when(idx > 0, F.lit(sep)).otherwise(F.lit("")).alias("sep"),
        F.when(idx > 0, F.substring(c, idx + len(sep), F.length(c))).otherwise(c).alias("tail"),
    )


def find_multiple(col: Column | str, targets: list[str]) -> Column:
    """strings/find_multiple.hpp:58: array of first-occurrence indexes
    (0-based; -1 if absent) for each target."""
    c = _c(col)
    return F.array(*[(F.instr(c, t) - 1).cast("int") for t in targets])


# --- datetime ----------------------------------------------------------------

def is_leap_year(col: Column | str) -> Column:
    """datetime.hpp:202."""
    y = F.year(_c(col))
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def days_in_month(col: Column | str) -> Column:
    """datetime.hpp:220."""
    return F.dayofmonth(F.last_day(_c(col)))


def day_name(col: Column | str) -> Column:
    """pandas .dt.day_name() equivalent (cudf datetime ops)."""
    return F.date_format(_c(col), "EEEE")


def url_encode(col: Column | str) -> Column:
    """strings/convert/convert_urls.hpp url_encode → Spark url_encode
    (3.4+): percent-encode for URLs."""
    return F.url_encode(_c(col))


def url_decode(col: Column | str) -> Column:
    """strings/convert/convert_urls.hpp url_decode → Spark url_decode."""
    return F.url_decode(_c(col))


# --- hashing -----------------------------------------------------------------

def hash_values(*cols: Column | str, method: str = "murmur3") -> Column:
    """hash_values (indexed_frame.py:2818) / hashing.hpp.

    murmur3 → Spark hash() (same murmurhash3_x86_32, hashing.hpp:60);
    xxhash64 → Spark xxhash64 (hashing.hpp:183); md5/sha1/sha2 on the
    concatenated string form (hashing.hpp:94-164).
    """
    cs = [_c(c) for c in cols]
    if method == "murmur3":
        return F.hash(*cs)
    if method == "xxhash64":
        return F.xxhash64(*cs)
    joined = F.concat_ws("\x1f", *[c.cast("string") for c in cs])
    if method == "md5":
        return F.md5(joined)
    if method == "sha1":
        return F.sha1(joined)
    if method in ("sha256", "sha2"):
        return F.sha2(joined, 256)
    raise ValueError(f"unknown hash method {method!r}")
