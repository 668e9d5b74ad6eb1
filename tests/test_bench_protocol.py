"""bench.py cross-run-median protocol (round-4 verdict: whole-session host
contention inflates sub-second rows 1.5-2.5×; within-run medians cannot see
it, so the graded artifact medians across runs).  Pure-python — no Spark.
"""

from __future__ import annotations

import importlib.util
import time


def _load_bench(tmp_path):
    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.RUNS_DIR = str(tmp_path / "runs")
    return bench


def test_cross_run_median_resists_one_noisy_session(tmp_path):
    bench = _load_bench(tmp_path)
    m, n, bk, nm, cal = bench._cross_run_medians({"q1": 1.0, "q2": 0.5}, 0.1, 32)
    assert (m, n) == ({"q1": 1.0, "q2": 0.5}, 1)
    time.sleep(0.01)
    m, n, bk, nm, cal = bench._cross_run_medians({"q1": 1.2, "q2": 0.6}, 0.1, 32)
    assert n == 2
    time.sleep(0.01)
    # a 5× contention-inflated session moves the median only to the
    # middle honest value, not the outlier
    m, n, bk, nm, cal = bench._cross_run_medians({"q1": 5.0, "q2": 2.5}, 0.1, 32)
    assert n == 3 and bk == {"q1": 3, "q2": 3}
    assert m == {"q1": 1.2, "q2": 0.6}


def test_cross_run_median_segregates_sf_and_cpus(tmp_path):
    bench = _load_bench(tmp_path)
    bench._cross_run_medians({"q1": 1.0}, 0.1, 32)
    m, n, bk, nm, cal = bench._cross_run_medians({"q1": 9.0}, 0.01, 32)
    assert (m, n) == ({"q1": 9.0}, 1)
    m, n, bk, nm, cal = bench._cross_run_medians({"q1": 7.0}, 0.1, 8)
    assert (m, n) == ({"q1": 7.0}, 1)


def test_cross_run_median_new_query_and_history_cap(tmp_path):
    bench = _load_bench(tmp_path)
    for v in (1.0, 2.0, 3.0, 4.0, 5.0, 6.0):
        time.sleep(0.01)
        m, n, bk, nm, cal = bench._cross_run_medians({"q1": v}, 0.1, 32)
    # HISTORY=5: newest five runs are 2..6 → median 4
    assert n == 5 and m["q1"] == 4.0
    # a just-added query medians over the runs that have it (this one)
    time.sleep(0.01)
    m, n, bk, nm, cal = bench._cross_run_medians({"q1": 6.0, "q_new": 0.3}, 0.1, 32)
    assert m["q_new"] == 0.3 and bk["q_new"] == 1 and bk["q1"] == 5


def test_calibration_and_normalized_medians(tmp_path):
    """Host-epoch normalization (r6 verdict #2): a run on a 2x-slower host
    carries calibration 2.0 and its normalized times equal the fast run's."""
    bench = _load_bench(tmp_path)
    sent = {s: 1.0 for s in bench.SENTINELS}
    base = {s: (1.0, 1.0) for s in bench.SENTINELS}
    base["q1"] = (1.0, 1.0)
    bench.baseline_rows = lambda path=None: base
    fast = dict(sent, q1=1.0)
    slow = {k: v * 2 for k, v in fast.items()}
    m, n, bk, nm, cal = bench._cross_run_medians(fast, 0.1, 32)
    assert cal == 1.0 and nm["q1"] == 1.0
    time.sleep(0.01)
    m, n, bk, nm, cal = bench._cross_run_medians(slow, 0.1, 32)
    assert cal == 2.0
    # raw median moves with the host; normalized median does not
    assert m["q1"] == 1.5 and nm["q1"] == 1.0


def test_calibration_needs_sentinel_coverage(tmp_path):
    bench = _load_bench(tmp_path)
    assert bench.calibration_factor({"q1": 1.0}, {"q1": (1.0, 1.0)}) is None


def test_baseline_rows_parses_epoch_annotations(tmp_path):
    bench = _load_bench(tmp_path)
    md = tmp_path / "BASELINE.md"
    md.write_text(
        "| a | 1.5 | local[32], sf0.1, median of 3 after per-query warmup "
        "| re-recorded r2 (protocol v2) |\n"
        "| b | 2.0 | local[32], sf0.1, median of 3 after per-query warmup "
        "| recorded r5 (first green, median of 4 full runs) |\n"
        "| c | 0.7 | local[32], sf0.1, median of 3 after per-query warmup "
        "| recorded r7 (first green, cal=0.83) |\n"
    )
    rows = bench.baseline_rows(str(md))
    assert rows["a"] == (1.5, 1.0)
    assert rows["b"] == (2.0, bench.ROUND_EPOCH_CAL[5])
    assert rows["c"] == (0.7, 0.83)


def test_ratio_check_normalizes_per_snapshot(tmp_path, monkeypatch):
    """tools_ratio_check.run_medians divides each run by its own stored
    calibration: a run on a 2x-slower host contributes the same
    normalized value as a fast run, so the normalized median is
    host-weather free while the raw median moves."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location("trc_mod", "tools_ratio_check.py")
    trc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(trc)
    runs = tmp_path / "runs"
    runs.mkdir()
    for i, (cal, t) in enumerate([(1.0, 1.0), (2.0, 2.0), (2.0, 2.0)]):
        json.dump(
            {"ts": i, "sf": 0.1, "cpus": 32, "calibration": cal,
             "queries": {"q1": t}},
            open(runs / f"run-{i}.json", "w"),
        )
    raw, norm, n, cals = trc.run_medians(runs_dir=str(runs))
    assert n == 3 and sorted(cals) == [1.0, 2.0, 2.0]
    assert raw["q1"] == 2.0      # host-inflated
    assert norm["q1"] == 1.0     # weather removed


def test_ratio_check_recomputes_missing_calibration(tmp_path):
    """Pre-calibration snapshots (no stored factor) get a post-hoc
    sentinel calibration so old runs participate in normalization."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location("trc_mod2", "tools_ratio_check.py")
    trc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(trc)
    import bench

    sent = {s: 3.0 for s in bench.SENTINELS}  # 3x the baseline values below
    base = {s: (1.0, 1.0) for s in bench.SENTINELS}
    trc.baseline_rows = lambda path=None: base
    runs = tmp_path / "runs"
    runs.mkdir()
    json.dump(
        {"ts": 0, "sf": 0.1, "cpus": 32, "queries": dict(sent, q1=6.0)},
        open(runs / "run-0.json", "w"),
    )
    raw, norm, n, cals = trc.run_medians(runs_dir=str(runs))
    assert cals == [3.0]
    assert raw["q1"] == 6.0 and norm["q1"] == 2.0
