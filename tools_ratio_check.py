#!/usr/bin/env python
"""Compare BENCH_RUNS cross-run medians against BASELINE.md rows.

Usage: python tools_ratio_check.py [threshold]
Prints per-query ratio (median / baseline) for every baseline row, sorted
worst-first, flags rows above the threshold (default 1.8), and lists
registry queries with no baseline row yet (candidates for first-green
recording)."""

from __future__ import annotations

import json
import os
import re
import statistics
import sys


def baseline_rows(path="BASELINE.md") -> dict[str, float]:
    rows = {}
    for line in open(path):
        m = re.match(r"\|\s*(\w+)\s*\|\s*([0-9.]+)\s*\|\s*local\[32\], sf0\.1", line)
        if m:
            rows[m.group(1)] = float(m.group(2))
    return rows


def run_medians(runs_dir="BENCH_RUNS", sf=0.1, cpus=32) -> tuple[dict[str, float], int]:
    """Same selection as bench._cross_run_medians: NEWEST <= HISTORY runs
    at (sf, cpus) — a divergent all-runs median here would hide a recent
    regression the graded artifact shows (or false-flag healthy rows)."""
    history = int(os.environ.get("SPARK_GRAFT_BENCH_HISTORY", "5"))
    snaps = []
    for fn in os.listdir(runs_dir):
        if fn.endswith(".json"):
            s = json.load(open(os.path.join(runs_dir, fn)))
            if s.get("sf") == sf and s.get("cpus") == cpus:
                snaps.append(s)
    snaps.sort(key=lambda s: s.get("ts", 0), reverse=True)
    runs = [s["queries"] for s in snaps[:history]]
    names = {q for r in runs for q in r}
    return {
        q: statistics.median([r[q] for r in runs if q in r]) for q in names
    }, len(runs)


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.8
    base = baseline_rows()
    med, n = run_medians()
    print(f"# {n} runs merged; {len(base)} baseline rows; {len(med)} measured")
    ratios = sorted(
        ((med[q] / v, q, med[q], v) for q, v in base.items() if q in med),
        reverse=True,
    )
    flagged = [r for r in ratios if r[0] >= threshold]
    for r, q, m, v in ratios[:15]:
        mark = " <-- FLAG" if r >= threshold else ""
        print(f"{r:6.2f}x  {q:32s} med={m:8.3f} base={v:8.3f}{mark}")
    print(f"# flagged >= {threshold}x: {len(flagged)}")
    missing = sorted(q for q in med if q not in base)
    if missing:
        print("# no baseline row yet (record first-green):")
        for q in missing:
            print(f"  {q}: median {med[q]:.4f}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped into head
        pass
