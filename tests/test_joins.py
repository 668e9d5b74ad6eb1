"""asof_join row semantics: all payload columns of an output row must come
from the SINGLE matched right row — a NULL payload cell in the matched row
stays NULL, never back-filled from an older right row (ASOF JOIN semantics;
regression for the per-column last(ignorenulls) carry)."""

from __future__ import annotations

from my_cudf_spark.operators.joins import asof_join


def test_asof_null_payload_not_backfilled(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0, "a"), (1, 15, None, "b"), (1, 25, 300.0, None)],
        "k int, t int, price double, tag string",
    )
    out = {
        r["t"]: (r["price"], r["tag"])
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert out[10] == (100.0, "a")
    # matched right row (t=15) has NULL price — must NOT inherit 100.0
    assert out[20] == (None, "b")
    # matched right row (t=25) has NULL tag — must NOT inherit "b"
    assert out[30] == (300.0, None)


def test_asof_no_match_is_all_null(spark):
    left = spark.createDataFrame([(1, 1)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 9.0)], "k int, t int, v double")
    [row] = asof_join(left, right, on="t", by=["k"]).collect()
    assert row["v"] is None


def test_asof_forward_direction(spark):
    left = spark.createDataFrame([(1, 10), (1, 26)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 15, 1.5), (1, 25, 2.5)], "k int, t int, v double"
    )
    out = {
        r["t"]: r["v"]
        for r in asof_join(left, right, on="t", by=["k"], direction="forward").collect()
    }
    assert out[10] == 1.5  # next right row at t=15
    assert out[26] is None  # nothing after 26


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    left = spark.createDataFrame([(1, 10), (1, 25), (2, 7)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 24, "b"), (1, 26, "c"), (2, 100, "d")],
        "k int, t int, v string",
    )
    out = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(left, right, on="t", by=["k"], direction="nearest").collect()
    }
    assert out[(1, 10)] == "a"  # d=2 backward beats d=14 forward
    assert out[(1, 25)] == "b"  # equidistant (1 vs 1) → backward wins
    assert out[(2, 7)] == "d"  # only a forward candidate exists


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame([(1, 10), (2, 7)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 8, "a"), (2, 100, "d")], "k int, t int, v string"
    )
    out = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(
            left, right, on="t", by=["k"], direction="nearest", tolerance=50
        ).collect()
    }
    assert out[(1, 10)] == "a"  # within tolerance
    assert out[(2, 7)] is None  # d=93 > 50 → dropped, row kept

def test_asof_tolerance_backward_direction(spark):
    left = spark.createDataFrame([(1, 10), (1, 200)], "k int, t int")
    right = spark.createDataFrame([(1, 8, "a")], "k int, t int, v string")
    out = {
        r["t"]: r["v"]
        for r in asof_join(
            left, right, on="t", by=["k"], direction="backward", tolerance=50
        ).collect()
    }
    assert out[10] == "a"
    assert out[200] is None  # t=8 match is 192 away, over tolerance


def test_query_expr_preserves_string_literals(spark):
    from my_cudf_spark.operators.frame import query_expr

    df = spark.createDataFrame([("a&b", 1), ("c", 2)], "s string, v int")
    # '&' inside the string literal must NOT be rewritten to AND
    out = query_expr(df, "s == 'a&b' | v > 5").collect()
    assert [r["s"] for r in out] == ["a&b"]
    out2 = query_expr(df, "~(v == 1) & s != 'a&b'").collect()
    assert [r["s"] for r in out2] == ["c"]


def test_asof_nearest_matches_bruteforce_random(spark):
    """Seeded random frames: nearest+tolerance must equal the per-row
    brute-force argmin (ties to backward)."""
    import random

    rng = random.Random(7)
    left = [(rng.randrange(4), rng.randrange(1000)) for _ in range(120)]
    # unique (k, t) on the right — ties inside one side are undefined order
    right = list({(rng.randrange(4), rng.randrange(1000)) for _ in range(150)})
    right = [(k, t, f"v{k}_{t}") for k, t in right]
    tol = 60
    l = spark.createDataFrame(left, "k int, t int")
    r = spark.createDataFrame(right, "k int, t int, v string")
    got = {
        (row["k"], row["t"]): row["v"]
        for row in asof_join(l, r, on="t", by=["k"], direction="nearest", tolerance=tol).collect()
    }
    for k, t in set(left):
        cands = [(abs(rt - t), 0 if rt <= t else 1, rv) for rk, rt, rv in right if rk == k and abs(rt - t) <= tol]
        want = min(cands)[2] if cands else None
        assert got[(k, t)] == want, ((k, t), got[(k, t)], want)


def test_fuzzy_join_matches_bruteforce_random(spark):
    """Pigeonhole blocking must be COMPLETE: every edit-distance<=1 pair
    of random short strings appears; verify stage keeps it exact."""
    import random

    from my_cudf_spark.operators.joins import fuzzy_join

    rng = random.Random(11)
    alphabet = "abc"
    words = list({"".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 6))) for _ in range(80)})
    import itertools

    def ed(a, b):
        if len(a) < len(b): a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {(a, b) for a, b in itertools.product(words, words) if ed(a, b) <= 1}
    l = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        (r["left_value"], r["right_value"])
        for r in fuzzy_join(l, l, "s", "s").collect()
    }
    assert got == want


def test_query_expr_backslash_escaped_quote(spark):
    from my_cudf_spark.operators.frame import query_expr

    df = spark.createDataFrame([("it's", 1), ("a|b", 2), ("c", 9)], "s string, v int")
    # the escaped quote must not end the literal early: the '&' after it is
    # still inside the translation scope, the '|' inside the second literal
    # is not.
    out = query_expr(df, "(s == 'it\\'s') & (v == 1) | (s == 'a|b')").collect()
    assert sorted(r["s"] for r in out) == ["a|b", "it's"]


def test_asof_join_rejects_mixed_on_type_families(spark):
    import pytest
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("2020-01-02 03:04:05",)], "s string").select(
        F.to_timestamp("s").alias("t")
    )
    right = spark.createDataFrame([("2020-01-01",)], "d string").select(
        F.to_date("d").alias("t")
    )
    with pytest.raises(ValueError, match="type families differ"):
        asof_join(left, right, on="t")


# ---------------------------------------------------------------------------
# pit_join (multi-feature point-in-time)
# ---------------------------------------------------------------------------


def _pit_fixture(spark):
    from pyspark.sql import functions as F  # noqa: F811

    spine = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c"), (4, 5, "d")],
        "uid int, t int, tag string",
    ).repartition(4)
    f1 = spark.createDataFrame(
        [(1, 5, 1.0), (1, 10, 2.0), (2, 11, 3.0), (3, 1, 4.0)],
        "uid int, t int, x double",
    ).repartition(3)
    f2 = spark.createDataFrame(
        [(1, 9, 7), (3, 20, 8), (4, 6, 9)],
        "uid int, t int, y int",
    ).repartition(2)
    return spine, f1, f2


def test_pit_join_matches_chained_asof(spark):
    """One-pass pit_join == two chained asof_joins (the naive form)."""
    from my_cudf_spark.operators.joins import asof_join, pit_join

    spine, f1, f2 = _pit_fixture(spark)
    got = pit_join(spine, {"f1": f1, "f2": f2}, on="t", by=["uid"])

    want = asof_join(spine, f1.withColumnRenamed("x", "f1_x"), on="t", by=["uid"])
    want = asof_join(want, f2.withColumnRenamed("y", "f2_y"), on="t", by=["uid"])
    got_rows = sorted(map(tuple, got.select("uid", "t", "tag", "f1_x", "f2_y").collect()))
    want_rows = sorted(map(tuple, want.select("uid", "t", "tag", "f1_x", "f2_y").collect()))
    assert got_rows == want_rows
    # Equal-ts feature rows match (uid=1 t=10 → x=2.0; uid=3 t=20 → y=8),
    # and a spine row before every feature row keeps NULLs (uid=4: f1 has
    # nothing for uid 4, f2's only row is at t=6 > 5).
    by_uid = {r["uid"]: r for r in got.collect()}
    assert by_uid[1]["f1_x"] == 2.0 and by_uid[1]["f2_y"] == 7
    assert by_uid[3]["f2_y"] == 8
    assert by_uid[4]["f1_x"] is None and by_uid[4]["f2_y"] is None


def test_pit_join_single_exchange(spark):
    """N feature frames resolve over ONE hash Exchange + ONE Window."""
    from my_cudf_spark.operators.joins import pit_join

    spine, f1, f2 = _pit_fixture(spark)
    out = pit_join(spine, {"f1": f1, "f2": f2}, on="t", by=["uid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 1, plan


def test_pit_join_requires_payload(spark):
    import pytest as _pytest

    from my_cudf_spark.operators.joins import pit_join

    spine, f1, _ = _pit_fixture(spark)
    with _pytest.raises(ValueError):
        pit_join(spine, {"f1": f1.select("uid", "t")}, on="t", by=["uid"])
    with _pytest.raises(ValueError):
        pit_join(spine, {}, on="t", by=["uid"])
