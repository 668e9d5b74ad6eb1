#!/usr/bin/env python
"""Compare BENCH_RUNS cross-run medians against BASELINE.md rows, RAW and
HOST-EPOCH-NORMALIZED.

Usage: python tools_ratio_check.py [threshold]

Raw ratio = cross-run median / baseline seconds — what the 2x bench gate
has always read, but it conflates plan changes with host weather (15-25%
drift between measurement windows on identical plans, r6 verdict).

Normalized ratio removes both epochs: each run's times are divided by
that run's sentinel calibration (bench.SENTINELS — queries whose plans
never changed since their r2 baselines; the median sentinel
ratio-to-baseline measures the HOST), and each baseline is mapped back to
the r2 scale by the calibration of its own recording epoch
(bench.ROUND_EPOCH_CAL / an explicit ``cal=`` annotation).  A normalized
ratio ≈ 1.0 means "this plan performs exactly as it did when its baseline
was recorded, host weather removed" — flags fire on the normalized
column.

Prints per-query both ratios sorted worst-normalized-first, flags rows
above the threshold (default 1.8), and lists registry queries with no
baseline row yet (candidates for first-green recording, to be annotated
``cal=<calibration_this_run>``)."""

from __future__ import annotations

import json
import os
import statistics
import sys

from bench import (
    ESTIMATED_EPOCH_ROUNDS,
    baseline_epoch_rounds,
    baseline_rows,
    calibration_factor,
)

# Rows recorded in ESTIMATED_EPOCH_ROUNDS (r3/r4) ride a FITTED epoch
# factor (cohort median anchored to 1.0) that would absorb a uniform
# cohort regression by construction — so they flag at this tighter
# normalized threshold (r7 advisor; validation note at bench.py
# ESTIMATED_EPOCH_ROUNDS).
ESTIMATED_THRESHOLD = 1.5


def run_medians(
    runs_dir="BENCH_RUNS", sf=0.1, cpus=32
) -> tuple[dict[str, float], dict[str, float], int, list[float]]:
    """Same selection as bench._cross_run_medians: NEWEST <= HISTORY runs
    at (sf, cpus) — a divergent all-runs median here would hide a recent
    regression the graded artifact shows (or false-flag healthy rows).
    Returns (raw medians, normalized medians, runs merged, calibrations)."""
    history = int(os.environ.get("SPARK_GRAFT_BENCH_HISTORY", "5"))
    base = baseline_rows()
    snaps = []
    for fn in os.listdir(runs_dir):
        if fn.endswith(".json"):
            s = json.load(open(os.path.join(runs_dir, fn)))
            if s.get("sf") == sf and s.get("cpus") == cpus:
                snaps.append(s)
    snaps.sort(key=lambda s: s.get("ts", 0), reverse=True)
    snaps = snaps[:history]
    # Recompute-first with the CURRENT sentinel basket (bench.py
    # _cross_run_medians convention): stored factors measure the basket
    # of their day; recomputing keeps history on one scale across basket
    # changes.  Stored value is the fallback for sparse protocol runs.
    cals = [
        calibration_factor(s.get("queries", {}), base) or s.get("calibration") or 1.0
        for s in snaps
    ]
    names = {q for s in snaps for q in s["queries"]}
    raw, norm = {}, {}
    for q in names:
        vals = [(s["queries"][q], c) for s, c in zip(snaps, cals) if q in s["queries"]]
        raw[q] = statistics.median(v for v, _ in vals)
        norm[q] = statistics.median(v / c for v, c in vals)
    return raw, norm, len(snaps), cals


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.8
    base = baseline_rows()
    rounds = baseline_epoch_rounds()
    raw, norm, n, cals = run_medians()
    print(
        f"# {n} runs merged; calibrations {[round(c, 3) for c in cals]}; "
        f"{len(base)} baseline rows; {len(raw)} measured"
    )

    def q_threshold(q: str) -> float:
        if rounds.get(q) in ESTIMATED_EPOCH_ROUNDS:
            return min(threshold, ESTIMATED_THRESHOLD)
        return threshold

    ratios = sorted(
        (
            (norm[q] / (sec / ecal), raw[q] / sec, q, raw[q], sec)
            for q, (sec, ecal) in base.items()
            if q in raw
        ),
        reverse=True,
    )
    flagged = [r for r in ratios if r[0] >= q_threshold(r[2])]
    print(f"{'norm':>6}  {'raw':>6}  query")
    for rn, rr, q, m, v in ratios[:15]:
        est = "*" if rounds.get(q) in ESTIMATED_EPOCH_ROUNDS else ""
        mark = " <-- FLAG" if rn >= q_threshold(q) else ""
        print(f"{rn:5.2f}x {rr:5.2f}x  {q:32s}{est} med={m:8.3f} base={v:8.3f}{mark}")
    print(
        f"# flagged >= {threshold}x normalized"
        f" (estimated-epoch rows * >= {min(threshold, ESTIMATED_THRESHOLD)}x):"
        f" {len(flagged)}"
    )
    missing = sorted(q for q in raw if q not in base)
    if missing:
        print("# no baseline row yet (record first-green with cal= annotation):")
        for q in missing:
            print(f"  {q}: median {raw[q]:.4f}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped into head
        pass
