"""Randomized IO round-trip tests — the reference's fuzz strategy
(`python/cudf/cudf/_fuzz_testing/`: random frames through readers/writers
vs pandas) applied to our connectors: seeded random frames with hostile
values (nulls, NaN/Inf, delimiters, quotes, newlines, unicode, extreme
ints) written and read back through each format with an explicit schema;
parquet is the byte-exact baseline, CSV/JSON must match it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from my_cudf_spark.sources import io as IO

HOSTILE_STRINGS = [
    "plain",
    "comma,inside",
    'quote"inside',
    "newline\ninside",
    "tab\tinside",
    "unicode-ümläut-日本語",
    "",
    None,
    "null",
    " leading and trailing ",
    "semi;colon|pipe",
]


def _random_frame(seed: int, n: int = 200) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    ints = rng.randint(-(2**62), 2**62, size=n)
    doubles = rng.randn(n) * 10**6
    # inject special floats and nulls
    doubles[rng.choice(n, 5, replace=False)] = [np.nan, np.inf, -np.inf, 0.0, -0.0]
    int_nulls = pd.array(ints, dtype="Int64")
    int_nulls[rng.choice(n, 10, replace=False)] = pd.NA
    strings = [HOSTILE_STRINGS[i % len(HOSTILE_STRINGS)] for i in range(n)]
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "i64": int_nulls,
            "f64": doubles,
            "s": strings,
            "flag": rng.rand(n) > 0.5,
        }
    )


SCHEMA = "id long, i64 long, f64 double, s string, flag boolean"


def _collect(df):
    return [tuple(r) for r in df.orderBy("id").collect()]


@pytest.mark.parametrize("seed", [1, 7])
def test_csv_roundtrip_hostile_values(spark, tmp_path, seed):
    src = spark.createDataFrame(_random_frame(seed), schema=SCHEMA)
    path = str(tmp_path / "fuzz_csv")
    # CSV needs explicit choices to be lossless: a null sentinel distinct
    # from "" (they conflate otherwise), quoteAll+escape for embedded
    # quotes/commas/newlines, multiLine on read for quoted newlines, and
    # whitespace trimming off (univocity trims around quoted fields).
    IO.write_csv(
        src,
        path,
        quoteAll=True,
        escape='"',
        nullValue="\\N",
        # the WRITER trims by default too
        ignoreLeadingWhiteSpace=False,
        ignoreTrailingWhiteSpace=False,
    )
    back = IO.read_csv(
        spark,
        path,
        schema=SCHEMA,
        multiLine=True,
        escape='"',
        nanValue="NaN",
        null_value="\\N",
        emptyValue="",
        ignoreLeadingWhiteSpace=False,
        ignoreTrailingWhiteSpace=False,
    )
    assert _collect(back) == _collect(src)


@pytest.mark.parametrize("seed", [3, 11])
def test_json_roundtrip_hostile_values(spark, tmp_path, seed):
    src = spark.createDataFrame(_random_frame(seed), schema=SCHEMA)
    path = str(tmp_path / "fuzz_json")
    IO.write_json(src, path)
    back = IO.read_json(spark, path, schema=SCHEMA)
    assert _collect(back) == _collect(src)


@pytest.mark.parametrize("seed", [5])
def test_parquet_orc_roundtrip(spark, tmp_path, seed):
    src = spark.createDataFrame(_random_frame(seed), schema=SCHEMA)
    for fmt, write, read in (
        ("parquet", IO.write_parquet, IO.read_parquet),
        ("orc", IO.write_orc, IO.read_orc),
    ):
        path = str(tmp_path / f"fuzz_{fmt}")
        write(src, path)
        assert _collect(read(spark, path)) == _collect(src)
