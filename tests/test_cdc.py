"""CDC operator semantics (operators/cdc.py): hand-computed MERGE /
changelog-compaction / SCD2 cases, including the edges the fixture queries
cannot reach (NULL keys, update-subset preservation, NULL-attr inserts,
no-op echoes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_cudf_spark.operators import cdc as C


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_apply_changelog_latest_wins_and_deletes(spark):
    ch = spark.createDataFrame(
        [
            (1, 10, "I", 100.0),
            (1, 20, "U", 150.0),
            (2, 5, "I", 50.0),
            (2, 9, "D", None),
            (3, 1, "D", None),
            (3, 2, "I", 30.0),
        ],
        "k long, seq long, op string, val double",
    )
    out = C.apply_changelog(ch, ["k"], "seq", "op")
    assert out.columns == ["k", "val"]
    assert _rows(out, "k") == [(1, 150.0), (3, 30.0)]


def test_merge_upsert_update_delete_insert_and_untouched(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(1, 11.0, False), (2, None, True), (9, 99.0, False), (8, 88.0, True)],
        "k long, bal double, del boolean",
    )
    out = C.merge_upsert(target, source, ["k"], delete_col="del")
    # 1 updated, 2 deleted, 3 untouched, 9 inserted (name NULL),
    # 8 delete-of-absent-key is a no-op
    assert _rows(out, "k") == [
        (1, "a", 11.0),
        (3, "c", 30.0),
        (9, None, 99.0),
    ]


def test_merge_upsert_update_subset_preserves_other_columns(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0, "x")], "k long, name string, bal double, seg string"
    )
    source = spark.createDataFrame(
        [(1, 11.0, "ignored")], "k long, bal double, seg string"
    )
    out = C.merge_upsert(target, source, ["k"], update_cols=["bal"])
    assert _rows(out, "k") == [(1, "a", 11.0, "x")]


def test_merge_upsert_validates_update_cols(spark):
    target = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    source = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="absent from source"):
        C.merge_upsert(target, source, ["k"], update_cols=["bal"])


def test_merge_upsert_null_key_matches_null_safe(spark):
    # eqNullSafe key match: a NULL-key source row updates the NULL-key
    # target row instead of silently inserting a duplicate
    target = spark.createDataFrame([(None, 1.0), (2, 2.0)], "k long, bal double")
    source = spark.createDataFrame([(None, 9.0)], "k long, bal double")
    out = C.merge_upsert(target, source, ["k"])
    assert _rows(out, F.col("k").asc_nulls_first()) == [(None, 9.0), (2, 2.0)]


def _scd2_frames(spark):
    dim = spark.createDataFrame(
        [
            (1, "A", 100, None, True),
            (1, "OLD", 50, 100, False),  # closed history row
            (2, "B", 100, None, True),
        ],
        "k long, seg string, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame(
        [(1, "A2", 200), (2, "B", 200), (3, None, 200)],
        "k long, seg string, eff long",
    )
    return dim, ch


def test_scd2_apply_close_noop_insert(spark):
    dim, ch = _scd2_frames(spark)
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    got = _rows(out, "k", "valid_from")
    assert got == [
        (1, "OLD", 50, 100, False),   # history untouched
        (1, "A", 100, 200, False),    # changed → closed at eff
        (1, "A2", 200, None, True),   # new open version
        (2, "B", 100, None, True),    # no-op echo: untouched
        (3, None, 200, None, True),   # new key, NULL attr still inserts
    ]


def test_scd2_apply_null_key_noop_echo_inserts_nothing(spark):
    dim = spark.createDataFrame(
        [(None, "A", 100, None, True)],
        "k long, seg string, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame([(None, "A", 200)], "k long, seg string, eff long")
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    assert _rows(out, "valid_from") == [(None, "A", 100, None, True)]


def test_scd2_apply_result_is_valid_scd2(spark):
    dim, ch = _scd2_frames(spark)
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    per_key = out.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.sum(F.col("valid_to").isNull().cast("int")).alias("n_unclosed"),
    )
    # exactly one open, unclosed version per key
    assert all(r["n_open"] == 1 and r["n_unclosed"] == 1 for r in per_key.collect())


def _merge_reference(target_rows, source_rows, update_cols):
    """Pure-python MERGE semantics (null-safe keys, single-key k)."""
    src = {r["k"]: r for r in source_rows}
    out = []
    for t in target_rows:
        s = src.get(t["k"])
        if s is None:
            out.append(dict(t))
        elif s["del"]:
            continue
        else:
            merged = dict(t)
            for c in update_cols:
                merged[c] = s[c]
            out.append(merged)
    tkeys = {t["k"] for t in target_rows}
    for s in source_rows:
        if s["k"] not in tkeys and not s["del"]:
            out.append({"k": s["k"], "name": None, "bal": s["bal"]})
    return out


def test_merge_upsert_randomized_vs_reference(spark):
    """Seeded randomized scenarios (overlapping keys, NULL key, NULL
    values, delete-of-absent) against a pure-python MERGE reference."""
    import random

    for seed in range(5):
        rng = random.Random(1000 + seed)
        tkeys = rng.sample(range(20), 12) + [None]
        target_rows = [
            {"k": k, "name": f"n{k}", "bal": rng.choice([None, float(rng.randint(0, 99))])}
            for k in tkeys
        ]
        skeys = rng.sample(range(30), 10) + [None]
        source_rows = [
            {
                "k": k,
                "bal": rng.choice([None, float(rng.randint(100, 199))]),
                "del": rng.random() < 0.3,
            }
            for k in skeys
        ]
        target = spark.createDataFrame(
            [(r["k"], r["name"], r["bal"]) for r in target_rows],
            "k long, name string, bal double",
        )
        source = spark.createDataFrame(
            [(r["k"], r["bal"], r["del"]) for r in source_rows],
            "k long, bal double, del boolean",
        )
        got = sorted(
            [tuple(r) for r in C.merge_upsert(target, source, ["k"], delete_col="del").collect()],
            key=lambda t: (t[0] is None, t[0]),
        )
        want = sorted(
            [(r["k"], r["name"], r["bal"]) for r in _merge_reference(target_rows, source_rows, ["bal"])],
            key=lambda t: (t[0] is None, t[0]),
        )
        assert got == want, f"seed {seed}"


def test_apply_changelog_randomized_vs_reference(spark):
    """Seeded randomized changelogs (key reuse, deletes, interleaved seqs)
    against a pure-python latest-wins reference."""
    import random

    for seed in range(5):
        rng = random.Random(2000 + seed)
        rows = []
        seqs = rng.sample(range(1000), 40)
        for i, s in enumerate(seqs):
            rows.append(
                (rng.randint(0, 9), s, "D" if rng.random() < 0.25 else "U",
                 float(rng.randint(0, 999)))
            )
        ch = spark.createDataFrame(rows, "k long, seq long, op string, v double")
        got = sorted(tuple(r) for r in C.apply_changelog(ch, ["k"], "seq", "op").collect())
        best = {}
        for k, s, op, v in rows:
            if k not in best or s > best[k][0]:
                best[k] = (s, op, v)
        want = sorted((k, v) for k, (s, op, v) in best.items() if op != "D")
        assert got == want, f"seed {seed}"


def test_scd2_apply_randomized_vs_reference(spark):
    """Seeded randomized dims/changes against a pure-python SCD2
    reference: per key — close+append on attr change, no-op on echo,
    append on new key; history always passes through untouched."""
    import random

    for seed in range(4):
        rng = random.Random(3000 + seed)
        dim_rows = []
        for k in rng.sample(range(15), 10):
            n_hist = rng.randint(0, 2)
            t = 10
            for _ in range(n_hist):
                dim_rows.append((k, rng.choice("WXYZ"), t, t + 10, False))
                t += 10
            dim_rows.append((k, rng.choice("ABC"), t, None, True))
        cur = {r[0]: r[1] for r in dim_rows if r[4]}
        ch_rows = [
            (k, rng.choice("ABCN"), 500)
            for k in rng.sample(range(25), 8)
        ]
        dim = spark.createDataFrame(
            dim_rows, "k long, seg string, valid_from long, valid_to long, is_current boolean"
        )
        ch = spark.createDataFrame(ch_rows, "k long, seg string, eff long")
        got = sorted(
            tuple(r)
            for r in C.scd2_apply(dim, ch, ["k"], ["seg"], "eff").collect()
        )
        want = [r for r in dim_rows if not r[4]]  # history untouched
        changes = dict((k, s) for k, s, _ in ch_rows)
        for k, s, vf, vt, _ in [r for r in dim_rows if r[4]]:
            if k in changes and changes[k] != s:
                want.append((k, s, vf, 500, False))
                want.append((k, changes[k], 500, None, True))
            else:
                want.append((k, s, vf, None, True))
        for k, s, eff in ch_rows:
            if k not in cur:
                want.append((k, s, eff, None, True))
        assert got == sorted(want), f"seed {seed}"


def test_scd2_apply_null_is_current_row_survives_in_history(spark):
    """A malformed dim row with NULL is_current must not vanish (filter(col)
    and filter(~col) both exclude NULL) — it routes to the history leg."""
    dim = spark.createDataFrame(
        [(1, "A", 100, None, True), (1, "GHOST", 10, 50, None)],
        "k long, seg string, valid_from long, valid_to long, is_current boolean",
    )
    ch = spark.createDataFrame([(1, "A2", 200)], "k long, seg string, eff long")
    out = C.scd2_apply(dim, ch, ["k"], ["seg"], "eff")
    got = _rows(out, "k", "valid_from")
    assert (1, "GHOST", 10, 50, None) in got           # survived, untouched
    assert (1, "A", 100, 200, False) in got            # old open closed
    assert (1, "A2", 200, None, True) in got           # new open version
    assert len(got) == 3


def test_incremental_agg_planted(spark):
    """Delta maintenance handles all four key fates: untouched key passes
    through, updated key adjusts sum only, a key whose every fact is
    deleted vanishes (count 0), and an insert creates a brand-new key."""
    from decimal import Decimal

    from my_cudf_spark.operators.cdc import incremental_agg

    base = spark.createDataFrame(
        [(1, Decimal("10.00"), 2), (2, Decimal("5.00"), 1), (3, Decimal("7.00"), 1)],
        "k long, total decimal(28,2), n long",
    )
    # k=1: update one fact 4.00 -> 6.50 ; k=2: delete its only fact ;
    # k=9: insert 3.25 ; k=3: untouched
    changes = spark.createDataFrame(
        [
            (1, Decimal("4.00"), Decimal("6.50")),
            (2, Decimal("5.00"), None),
            (9, None, Decimal("3.25")),
        ],
        "k long, old_v decimal(28,2), new_v decimal(28,2)",
    )
    out = {
        r["k"]: (str(r["total"]), r["n"])
        for r in incremental_agg(
            base, changes, ["k"], "old_v", "new_v", "total", "n"
        ).collect()
    }
    assert out == {
        1: ("12.50", 2),
        3: ("7.00", 1),
        9: ("3.25", 1),
    }


def test_table_diff_planted(spark):
    """All three statuses + multi-column change lists + null-safe compare
    (NULL->value is a change, NULL==NULL is not)."""
    from my_cudf_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 5.0, None), (3, 7.0, "c"), (4, 1.0, "d")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 11.0, "a2"), (2, 5.0, None), (3, 7.0, "c"), (5, 9.0, "e")],
        "k long, v double, s string",
    )
    out = {r["k"]: r for r in table_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert set(out) == {1, 4, 5}
    assert out[1]["status"] == "changed" and out[1]["changed_cols"] == "v,s"
    assert out[4]["status"] == "removed" and out[4]["changed_cols"] == ""
    assert out[5]["status"] == "added" and out[5]["new_v"] == 9.0


def test_incremental_agg_derives_decimal_scale(spark):
    """Scale-4 inputs maintain exactly (former hard-coded decimal(28,2)
    silently rounded them); an explicit narrower dec_type raises instead
    of rounding."""
    from decimal import Decimal

    import pytest

    from my_cudf_spark.operators import cdc as C

    base = spark.createDataFrame(
        [(1, Decimal("1.0000"), 1)], "k long, total decimal(18,4), n long"
    )
    changes = spark.createDataFrame(
        [(1, None, Decimal("0.0003"))],
        "k long, old decimal(18,4), new decimal(18,4)",
    )
    out = C.incremental_agg(
        base, changes, ["k"], "old", "new", sum_col="total", count_col="n"
    ).collect()
    assert out[0]["total"] == Decimal("1.0003")
    assert out[0]["n"] == 2
    with pytest.raises(ValueError, match="widen its scale"):
        C.incremental_agg(
            base, changes, ["k"], "old", "new",
            sum_col="total", count_col="n", dec_type="decimal(28,2)",
        )


def test_time_travel_planted(spark):
    """As-of reconstruction at several versions: literal pin, 1-row
    DataFrame pin, tombstone-at-v exclusion, and pre-history emptiness."""
    from my_cudf_spark.operators import cdc as C

    ch = spark.createDataFrame(
        [
            (1, 10, "U", 100),
            (1, 20, "U", 150),
            (1, 30, "D", 0),
            (2, 15, "U", 900),
            (3, 40, "U", 70),
        ],
        "k long, seq long, op string, val long",
    )

    def state(version):
        return {
            r["k"]: r["val"]
            for r in C.time_travel(ch, ["k"], "seq", "op", version).collect()
        }

    assert state(5) == {}                      # before any event
    assert state(12) == {1: 100}               # mid-history (k2 arrives at 15)
    assert state(25) == {1: 150, 2: 900}       # later version wins
    assert state(35) == {2: 900}               # key 1 tombstoned at 30
    assert state(99) == {2: 900, 3: 70}        # full history
    # data-derived pin rides a 1-row broadcast frame, same answer
    from pyspark.sql import functions as F

    vdf = ch.agg(F.lit(25).alias("v"))
    got = {
        r["k"]: r["val"]
        for r in C.time_travel(ch, ["k"], "seq", "op", vdf).collect()
    }
    assert got == {1: 150, 2: 900}


def test_scd2_asof_half_open_boundary(spark):
    """At exactly the close/effective instant the NEW version is current
    ([valid_from, valid_to) semantics); open versions match any later ts."""
    from my_cudf_spark.operators import cdc as C

    dim = spark.createDataFrame(
        [
            (1, "OLD", "1995-01-01 00:00:00", "2000-06-01 00:00:00", False),
            (1, "NEW", "2000-06-01 00:00:00", None, True),
            (2, "KEEP", "1995-01-01 00:00:00", None, True),
        ],
        "k long, seg string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )

    def at(ts):
        return {r["k"]: r["seg"] for r in C.scd2_asof(dim, ts).collect()}

    assert at("1999-12-31 23:59:59") == {1: "OLD", 2: "KEEP"}
    assert at("2000-06-01 00:00:00") == {1: "NEW", 2: "KEEP"}  # boundary
    assert at("2005-01-01 00:00:00") == {1: "NEW", 2: "KEEP"}
    assert at("1990-01-01 00:00:00") == {}


def test_time_travel_bad_version_frame_raises(spark):
    """The 1-row version-pin contract is enforced in-plan: an empty,
    multi-row, or NULL-pin frame raises at evaluation instead of
    silently reconstructing an empty (or fanned-out) table."""
    ch = spark.createDataFrame(
        [(1, 10, "U", 100), (1, 20, "U", 150), (2, 15, "U", 900)],
        "k long, seq long, op string, val long",
    )
    # empty pin frame (e.g. an empty drain) → loud failure
    empty = ch.filter(F.col("seq") < 0).agg(F.max("seq").alias("v")).filter(
        F.col("v").isNotNull()
    )
    with pytest.raises(Exception, match="exactly one"):
        C.time_travel(ch, ["k"], "seq", "op", empty).collect()
    # multi-row pin (a grouped max-per-run instead of a global scalar)
    multi = ch.groupBy("k").agg(F.max("seq").alias("v")).select("v")
    with pytest.raises(Exception, match="exactly one"):
        C.time_travel(ch, ["k"], "seq", "op", multi).collect()
    # 1-row NULL pin
    nullpin = ch.agg(F.max(F.when(F.col("seq") < 0, F.col("seq"))).alias("v"))
    with pytest.raises(Exception, match="exactly one"):
        C.time_travel(ch, ["k"], "seq", "op", nullpin).collect()
