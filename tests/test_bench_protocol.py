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
    m, n, bk = bench._cross_run_medians({"q1": 1.0, "q2": 0.5}, 0.1, 32)
    assert (m, n) == ({"q1": 1.0, "q2": 0.5}, 1)
    time.sleep(0.01)
    m, n, bk = bench._cross_run_medians({"q1": 1.2, "q2": 0.6}, 0.1, 32)
    assert n == 2
    time.sleep(0.01)
    # a 5× contention-inflated session moves the median only to the
    # middle honest value, not the outlier
    m, n, bk = bench._cross_run_medians({"q1": 5.0, "q2": 2.5}, 0.1, 32)
    assert n == 3 and bk == {"q1": 3, "q2": 3}
    assert m == {"q1": 1.2, "q2": 0.6}


def test_cross_run_median_segregates_sf_and_cpus(tmp_path):
    bench = _load_bench(tmp_path)
    bench._cross_run_medians({"q1": 1.0}, 0.1, 32)
    m, n, bk = bench._cross_run_medians({"q1": 9.0}, 0.01, 32)
    assert (m, n) == ({"q1": 9.0}, 1)
    m, n, bk = bench._cross_run_medians({"q1": 7.0}, 0.1, 8)
    assert (m, n) == ({"q1": 7.0}, 1)


def test_cross_run_median_new_query_and_history_cap(tmp_path):
    bench = _load_bench(tmp_path)
    for v in (1.0, 2.0, 3.0, 4.0, 5.0, 6.0):
        time.sleep(0.01)
        m, n, bk = bench._cross_run_medians({"q1": v}, 0.1, 32)
    # HISTORY=5: newest five runs are 2..6 → median 4
    assert n == 5 and m["q1"] == 4.0
    # a just-added query medians over the runs that have it (this one)
    time.sleep(0.01)
    m, n, bk = bench._cross_run_medians({"q1": 6.0, "q_new": 0.3}, 0.1, 32)
    assert m["q_new"] == 0.3 and bk["q_new"] == 1 and bk["q1"] == 5
