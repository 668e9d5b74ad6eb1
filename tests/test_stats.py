"""Kendall tau-b: Knight's O(n log n) implementation vs brute-force pairs."""

from __future__ import annotations

import numpy as np

from my_cudf_spark.operators.stats import kendall_tau_b


def _brute_tau_b(x, y):
    n = len(x)
    c = d = xt = yt = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = np.sign(x[j] - x[i])
            sy = np.sign(y[j] - y[i])
            if sx == 0:
                xt += 1
            if sy == 0:
                yt += 1
            if sx != 0 and sy != 0:
                if sx == sy:
                    c += 1
                else:
                    d += 1
    tot = n * (n - 1) // 2
    if tot == xt or tot == yt:
        return None
    return (c - d) / np.sqrt(tot - xt) / np.sqrt(tot - yt)


def test_kendall_matches_brute_force():
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(2, 60)
        # heavy ties: draw from a small integer alphabet
        x = rng.randint(0, 6, size=n).astype(float)
        y = rng.randint(0, 6, size=n).astype(float)
        got = kendall_tau_b(x, y)
        want = _brute_tau_b(x, y)
        if want is None:
            assert got is None
        else:
            assert got is not None and abs(got - want) < 1e-12, (trial, got, want)


def test_kendall_perfect_orders():
    x = np.arange(50, dtype=float)
    assert abs(kendall_tau_b(x, x) - 1.0) < 1e-15
    assert abs(kendall_tau_b(x, -x) + 1.0) < 1e-15
    assert kendall_tau_b(np.ones(10), np.arange(10.0)) is None
    assert kendall_tau_b(np.array([1.0]), np.array([2.0])) is None


def test_exact_quantiles_matches_builtin_percentile(spark):
    """Distributed rank-bracketing quantiles must equal Spark's exact
    percentile() (same interpolation formula) on ties, skew, and
    non-integral positions."""
    from pyspark.sql import functions as F

    from my_cudf_spark.operators.stats import exact_quantiles

    vals = [1.0, 1.0, 1.0, 2.5, 3.0, 7.25, 7.25, 9.0, 100.0, -4.5, 0.0]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "x double")
    fracs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = exact_quantiles(df, "x", fracs).collect()[0]
    want = df.agg(
        F.expr(f"percentile(x, array({', '.join(f'{f}D' for f in fracs)}))").alias("p")
    ).collect()[0]["p"]
    for i, w in enumerate(want):
        assert abs(got[f"q{i}"] - w) < 1e-12, (i, got[f"q{i}"], w)


def test_exact_quantiles_empty_and_single(spark):
    from my_cudf_spark.operators.stats import exact_quantiles

    empty = spark.createDataFrame([], "x double")
    row = exact_quantiles(empty, "x", [0.5]).collect()[0]
    assert row["q0"] is None
    one = spark.createDataFrame([(42.0,)], "x double")
    row = exact_quantiles(one, "x", [0.25, 0.5, 1.0]).collect()[0]
    assert [row["q0"], row["q1"], row["q2"]] == [42.0, 42.0, 42.0]


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from my_cudf_spark.operators.stats import corr_matrix
    import pytest

    rng = np.random.RandomState(3)
    x = rng.rand(200).round(2)
    y = (2 * x + rng.rand(200)).round(2)
    z = rng.rand(200).round(2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    for a, b, va, vb in (("x", "y", x, y), ("x", "z", x, z), ("y", "z", y, z)):
        want = float(np.corrcoef(va, vb)[0, 1])
        assert abs(got[(a, b)] - want) < 1e-9, (a, b, got[(a, b)], want)
    with pytest.raises(ValueError, match="two columns"):
        corr_matrix(df, ["x"])


def test_market_basket_rules_mega_basket_cap(spark):
    """max_basket_size drops over-cap baskets from the WHOLE computation
    (pairs, supports, and the basket total), keeping confidence and lift
    internally consistent."""
    from my_cudf_spark.operators.stats import market_basket_rules

    rows = []
    # three small baskets {1,2}, plus one mega-basket of items 1..10
    for o in (100, 101, 102):
        rows += [(o, 1), (o, 2)]
    rows += [(999, i) for i in range(1, 11)]
    b = spark.createDataFrame(rows, "o long, p long")

    capped = market_basket_rules(b, "o", "p", min_support=2, max_basket_size=5)
    got = {(r["item_a"], r["item_b"]): r for r in capped.collect()}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # mega-basket excluded everywhere: support 3 of 3 baskets, conf 1.0
    assert r["support"] == 3
    assert r["conf_ab"] == 1.0 and r["conf_ba"] == 1.0
    assert abs(r["lift"] - 1.0) < 1e-12

    uncapped = market_basket_rules(b, "o", "p", min_support=1)
    got_u = {(r["item_a"], r["item_b"]): r for r in uncapped.collect()}
    # without the cap the mega-basket seeds all C(10,2) = 45 pairs — the
    # quadratic blowup the cap exists to bound
    assert len(got_u) == 45
    assert got_u[(1, 2)]["support"] == 4
