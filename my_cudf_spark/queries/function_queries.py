"""Scalar-function correctness queries (SURVEY.md §2.8).

One query per function family — strings, regex, datetime, math/bitwise,
hashing, JSON, lists — exercising the compat library
(``my_cudf_spark.functions.compat``) and the 1:1 builtin mappings.

Dialect notes baked in:
- DuckDB lacks ``initcap``/``sha1`` → covered by unit tests instead.
- DuckDB ``regexp_replace`` needs the 'g' flag to match Spark's
  replace-all; patterns restricted to the RE2∩Java common subset
  (SURVEY.md §7.4.6).
- Spark ``dayofweek`` is 1=Sunday; DuckDB's is 0=Sunday → +1 in SQL.
- Spark ``add_months``/``last_day`` return DATE → cast to timestamp_ntz on
  both sides for schema equality.
- libm differences (sin/atan2 may be 1 ulp apart) → trig rounded to 12dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_cudf_spark.functions import compat as C
from my_cudf_spark.queries import register
from my_cudf_spark.sources import load_table


@register(
    "fn_strings",
    sql="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substring(p_name, 2, 5) AS sub_name,
           concat_ws('-', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           length(p_name) AS name_len,
           reverse(p_name) AS rev_name,
           replace(p_name, ' ', '_') AS und_name,
           translate(p_name, 'aeiou', 'AEIOU') AS vow_name,
           strpos(p_name, 'widget') AS widget_pos,
           starts_with(p_name, 'small') AS is_small,
           contains(p_name, 'bolt') AS has_bolt,
           trim('  ' || p_name || ' ') AS trimmed,
           repeat(p_brand, 2) AS brand2,
           split_part(p_name, ' ', 2) AS second_word,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           levenshtein(p_name, p_type) AS lev_nt
    FROM part ORDER BY p_partkey
    """,
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernels (cpp/include/cudf/strings/: case.hpp, combine.hpp,
    padding.hpp, replace.hpp, translate.hpp, find.hpp, strip.hpp,
    repeat_strings.hpp, split/, slice.hpp, attributes.hpp; edit_distance
    nvtext/edit_distance.hpp:62)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 2, 5).alias("sub_name"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.length("p_name").cast("long").alias("name_len"),
        F.reverse(F.col("p_name")).alias("rev_name"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("und_name"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("vow_name"),
        F.instr(F.col("p_name"), "widget").cast("long").alias("widget_pos"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").contains("bolt").alias("has_bolt"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("r3"),
        F.levenshtein("p_name", "p_type").cast("long").alias("lev_nt"),
    ).orderBy("p_partkey")


@register(
    "fn_regex",
    sql="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           regexp_matches(c_name, '0{3}') AS has_000,
           regexp_extract(c_name, 'Customer#([0-9]{4})([0-9]+)', 2) AS tail_digits
    FROM customer ORDER BY c_custkey
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex kernels (strings/contains.hpp:58-201, extract.hpp:61,
    replace_re.hpp:55). Patterns kept in the Java∩RE2 subset."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").rlike("0{3}").alias("has_000"),
        F.regexp_extract("c_name", r"Customer#([0-9]{4})([0-9]+)", 2).alias("tail_digits"),
    ).orderBy("c_custkey")


@register(
    "fn_datetime",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
           date_trunc('month', o_orderdate) AS mon_start,
           dayname(o_orderdate) AS dname,
           (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0) OR year(o_orderdate) % 400 = 0 AS leap,
           CAST(day(last_day(o_orderdate)) AS INT) AS dim
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime kernels (cpp/include/cudf/datetime.hpp:44-302 —
    extract_datetime_component, last_day_of_month, day_of_year,
    add_calendrical_months, extract_quarter, is_leap_year, days_in_month,
    floor_datetimes)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.dayofyear(d).alias("doy"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("woy"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus3m"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("mon_start"),
        C.day_name(d).alias("dname"),
        C.is_leap_year(d).alias("leap"),
        C.days_in_month(d).alias("dim"),
    ).orderBy("o_orderkey")


@register(
    "fn_math",
    sql="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS absdev,
           ceil(p_retailprice) AS cl,
           floor(p_retailprice) AS fl,
           sqrt(p_retailprice) AS sq,
           round(ln(p_retailprice), 12) AS lg,
           round(log10(p_retailprice), 12) AS l10,
           pow(CAST(p_size AS DOUBLE), 2) AS size_sq,
           round(sin(p_retailprice / 1000.0), 12) AS sn,
           round(atan2(CAST(p_size AS DOUBLE), 10.0), 12) AS at2,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sgn,
           greatest(p_retailprice, 1000.0) AS hi,
           least(p_retailprice, 1000.0) AS lo,
           greatest(least(p_retailprice, 1500.0), 800.0) AS clamped,
           xor(p_partkey, 255) AS xkey,
           p_partkey & 255 AS andkey,
           p_partkey | 4096 AS orkey,
           p_size << 2 AS shl,
           p_size >> 1 AS shr,
           CAST(p_size % 7 AS INT) AS m7
    FROM part ORDER BY p_partkey
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unary/binary math kernels (unary.hpp:119-143, binaryop.hpp:38-100):
    trig/log/sqrt/abs/ceil/floor, NULL_MAX/NULL_MIN → greatest/least, clamp
    (replace.hpp:219), bitwise ops, modulo."""
    part = load_table(spark, sf_dir, "part")
    p = F.col("p_retailprice")
    sz = F.col("p_size")
    return part.select(
        "p_partkey",
        F.abs(p - 1000.0).alias("absdev"),
        F.ceil(p).cast("double").alias("cl"),
        F.floor(p).cast("double").alias("fl"),
        F.sqrt(p).alias("sq"),
        F.round(F.log(p), 12).alias("lg"),
        F.round(F.log10(p), 12).alias("l10"),
        F.pow(sz.cast("double"), 2).alias("size_sq"),
        F.round(F.sin(p / 1000.0), 12).alias("sn"),
        F.round(F.atan2(sz.cast("double"), F.lit(10.0)), 12).alias("at2"),
        F.signum(p - 1000.0).alias("sgn"),
        F.greatest(p, F.lit(1000.0)).alias("hi"),
        F.least(p, F.lit(1000.0)).alias("lo"),
        C.clamp(p, 800.0, 1500.0).alias("clamped"),
        F.col("p_partkey").bitwiseXOR(F.lit(255)).alias("xkey"),
        F.col("p_partkey").bitwiseAND(F.lit(255)).alias("andkey"),
        F.col("p_partkey").bitwiseOR(F.lit(4096)).alias("orkey"),
        F.shiftleft(sz, 2).alias("shl"),
        F.shiftright(sz, 1).alias("shr"),
        (sz % 7).alias("m7"),
    ).orderBy("p_partkey")


@register(
    "fn_hash",
    sql="""
    SELECT c_custkey,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha256
    FROM customer ORDER BY c_custkey
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash kernels (hashing.hpp:60-201). md5/sha256 oracle-checked here;
    murmur3/xxhash64/sha1 have no DuckDB twin → known-answer unit tests
    (tests/test_functions.py)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"),
    ).orderBy("c_custkey")


@register(
    "fn_json",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
    FROM events ORDER BY event_id
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object with JSONPath (cudf json/json.hpp:165 — same name &
    semantics in Spark); from_json → reader dtype mapping."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").cast("long").alias("k_missing"),
    ).orderBy("event_id")


@register(
    "fn_lists",
    sql="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
    SELECT p_partkey,
           CAST(len(toks) AS INT) AS n_toks,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           list_contains(toks, 'widget') AS has_widget,
           array_to_string(list_sort(toks), '|') AS sorted_joined,
           array_to_string(list_reverse(toks), '|') AS rev_joined,
           CAST(len(list_intersect(toks, ['blue','red','green','small','large'])) AS INT) AS n_known
    FROM t ORDER BY p_partkey
    """,
)
def fn_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List kernels (cpp/include/cudf/lists/: contains.hpp, count_elements.hpp,
    extract.hpp, reverse.hpp, sorting.hpp, set_operations.hpp:61-172,
    combine.hpp) over tokenized strings; scalar projections keep the oracle
    hashable."""
    part = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    known = F.array(*[F.lit(x) for x in ("blue", "red", "green", "small", "large")])
    return part.select(
        "p_partkey",
        F.size(toks).alias("n_toks"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "widget").alias("has_widget"),
        F.array_join(F.sort_array(toks), "|").alias("sorted_joined"),
        F.array_join(F.reverse(toks), "|").alias("rev_joined"),
        F.size(F.array_intersect(toks, known)).alias("n_known"),
    ).orderBy("p_partkey")


@register(
    "fn_conditional",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END AS urgent_price,
           IF(o_orderstatus = 'F', 1, 0) AS is_final
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """copy_if_else (copying.hpp:626) / Ternary expr (cudf_polars
    ternary.py:28) → when/otherwise; replace_nulls/nullif."""
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(p > 300000, "high").when(p > 100000, "mid").otherwise("low").alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_filled"),
        C.copy_if_else(F.col("o_orderpriority") == "1-URGENT", p, F.lit(0.0)).alias("urgent_price"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).cast("int").alias("is_final"),
    ).orderBy("o_orderkey")


@register(
    "fn_convert",
    sql="""
    SELECT c_custkey,
           upper(to_hex(c_custkey)) AS key_hex,
           CAST(c_custkey // 16777216 % 256 AS VARCHAR) || '.' ||
           CAST(c_custkey // 65536 % 256 AS VARCHAR) || '.' ||
           CAST(c_custkey // 256 % 256 AS VARCHAR) || '.' ||
           CAST(c_custkey % 256 AS VARCHAR) AS as_ipv4,
           CAST(c_custkey * 16777216 % 4294967296 + 1 AS BIGINT) AS ipv4_back
    FROM customer ORDER BY c_custkey
    """,
)
def fn_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/number converters (strings/convert/*.hpp): hex (conv base
    10→16 / convert_hex), integer↔dotted-quad ipv4 (convert_ipv4.hpp) —
    both pure arithmetic/bit expressions, no UDF."""
    customer = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    octet = lambda shift: F.shiftrightunsigned(k, shift).bitwiseAND(F.lit(255)).cast("string")
    return customer.select(
        "c_custkey",
        F.conv(k.cast("string"), 10, 16).alias("key_hex"),
        F.concat_ws(".", octet(24), octet(16), octet(8), octet(0)).alias("as_ipv4"),
        ((k * 16777216) % 4294967296 + 1).cast("long").alias("ipv4_back"),
    ).orderBy("c_custkey")


@register(
    "fn_month_sequence",
    sql="""
    SELECT o_orderkey,
           array_to_string(list_transform(
             generate_series(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
                             CAST(date_trunc('month', o_orderdate) + INTERVAL 2 MONTH AS TIMESTAMP),
                             INTERVAL 1 MONTH),
             t -> strftime(t, '%Y-%m-%d')), ',') AS months,
           array_to_string([o_orderpriority, o_orderpriority, o_orderpriority], '|') AS tiled
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_month_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fill/sequence/repeat/calendrical_month_sequence (filling.hpp:89/180/
    125/238): per-row date sequence via ``sequence(start, stop, interval)``
    and value repetition via ``array_repeat`` — narrow generates, no
    shuffle.  byte_cast (reshape.hpp:104) is intentionally out of scope:
    it exposes device-memory layout, which has no Spark-level meaning."""
    o = load_table(spark, sf_dir, "orders")
    start = F.trunc("o_orderdate", "MM")
    months = F.sequence(start, F.add_months(start, 2), F.expr("interval 1 month"))
    return o.select(
        "o_orderkey",
        F.array_join(
            F.transform(months, lambda d: F.date_format(d, "yyyy-MM-dd")), ","
        ).alias("months"),
        F.array_join(F.array_repeat(F.col("o_orderpriority"), 3), "|").alias("tiled"),
    ).orderBy("o_orderkey")


@register(
    "fn_regex_findall",
    sql="""
    SELECT c_custkey,
           array_to_string(regexp_extract_all(c_name, '[0-9]{3}'), '|') AS triplets,
           CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
           CAST(len(regexp_extract_all(c_name, '[1-9]')) AS INT) AS n_nonzero
    FROM customer ORDER BY c_custkey
    """,
)
def fn_regex_findall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """findall / match counting (strings/findall.hpp:61, contains.hpp
    count_re): all non-overlapping matches as an array plus per-pattern
    match counts.  Non-overlapping left-to-right semantics agree between
    Java regex and RE2; the match array is emitted joined (repo convention:
    scalar output columns only — same as fn_lists)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.array_join(
            F.regexp_extract_all("c_name", F.lit("[0-9]{3}"), 0), "|"
        ).alias("triplets"),
        F.size(F.regexp_extract_all("c_name", F.lit("0"), 0)).alias("n_zeros"),
        F.size(F.regexp_extract_all("c_name", F.lit("[1-9]"), 0)).alias("n_nonzero"),
    ).orderBy("c_custkey")


@register(
    "fn_interval",
    sql="""
    WITH iv AS (SELECT o_orderkey,
                       CAST(o_orderdate AS TIMESTAMP) AS lo,
                       CAST(o_orderdate AS TIMESTAMP)
                         + to_days(CAST(o_orderkey % 60 + 1 AS INT)) AS hi
                FROM orders)
    SELECT o_orderkey,
           {'left': lo, 'right': hi}.left AS iv_left,
           {'left': lo, 'right': hi}.right AS iv_right,
           CAST(date_diff('day', lo, hi) AS INT) AS width_days,
           (lo <= TIMESTAMP '1997-06-15 00:00:00'
              AND TIMESTAMP '1997-06-15 00:00:00' < hi) AS contains_mid97,
           (lo < TIMESTAMP '1997-07-01 00:00:00'
              AND TIMESTAMP '1997-06-01 00:00:00' < hi) AS overlaps_jun97
    FROM iv ORDER BY o_orderkey
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IntervalDtype parity (cudf dtypes.py:949 — interval stored as a
    struct of left/right bounds; the SURVEY §1.2 mapping): build
    [orderdate, orderdate + 1..60d) intervals as struct columns and run
    the interval algebra (width, point containment, half-open overlap) as
    plain field expressions — no custom type needed, exactly the
    reference's own struct encoding."""
    orders = load_table(spark, sf_dir, "orders")
    lo = F.col("o_orderdate")
    hi = F.col("o_orderdate") + F.make_dt_interval(days=F.col("o_orderkey") % 60 + 1)
    mid = F.lit("1997-06-15 00:00:00").cast("timestamp_ntz")
    ja = F.lit("1997-06-01 00:00:00").cast("timestamp_ntz")
    jb = F.lit("1997-07-01 00:00:00").cast("timestamp_ntz")
    iv = orders.select(
        "o_orderkey",
        F.struct(lo.alias("left"), hi.alias("right")).alias("iv"),
    )
    l, r = F.col("iv").getField("left"), F.col("iv").getField("right")
    return iv.select(
        "o_orderkey",
        l.alias("iv_left"),
        r.alias("iv_right"),
        F.datediff(r, l).cast("int").alias("width_days"),
        ((l <= mid) & (mid < r)).alias("contains_mid97"),
        ((l < jb) & (ja < r)).alias("overlaps_jun97"),
    ).orderBy("o_orderkey")


@register(
    "fn_parse",
    sql="""
    WITH s AS (SELECT o_orderkey,
                      strftime(o_orderdate, '%Y-%m-%d') AS dstr,
                      strftime(o_orderdate, '%d/%m/%Y') AS dstr_eu,
                      CAST(o_totalprice AS VARCHAR) AS pstr,
                      CASE WHEN o_orderkey % 7 = 0 THEN 'n/a'
                           ELSE CAST(o_custkey AS VARCHAR) END AS maybe_num
               FROM orders)
    SELECT o_orderkey,
           strptime(dstr, '%Y-%m-%d') AS parsed_iso,
           strptime(dstr_eu, '%d/%m/%Y') AS parsed_eu,
           CAST(TRY_CAST(pstr AS DOUBLE) AS DOUBLE) AS parsed_price,
           TRY_CAST(maybe_num AS BIGINT) AS parsed_or_null
    FROM s ORDER BY o_orderkey
    """,
)
def fn_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→typed parsing (cudf to_datetime / to_numeric,
    python/cudf/cudf/core/tools/datetimes.py:70 and tools/numeric.py:28;
    CSV-reader dtype inference is the same kernels): two datetime formats
    via to_timestamp, numeric parsing via cast, and to_numeric's
    errors='coerce' (invalid → NULL) via try_cast — all JVM expressions,
    one scan, no shuffle before the final order."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dstr"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("dstr_eu"),
        F.col("o_totalprice").cast("string").alias("pstr"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("n/a"))
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("maybe_num"),
    )
    return s.select(
        "o_orderkey",
        F.to_timestamp("dstr", "yyyy-MM-dd").cast("timestamp_ntz").alias("parsed_iso"),
        F.to_timestamp("dstr_eu", "dd/MM/yyyy").cast("timestamp_ntz").alias("parsed_eu"),
        F.col("pstr").cast("double").alias("parsed_price"),
        F.expr("try_cast(maybe_num AS BIGINT)").alias("parsed_or_null"),
    ).orderBy("o_orderkey")
