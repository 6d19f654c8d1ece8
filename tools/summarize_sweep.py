#!/usr/bin/env python
"""Summarize per-seed results CSVs into the VALIDATION.md table.

Usage: python tools/summarize_sweep.py <glob-of-results-csvs> <env-name>
e.g.:  python tools/summarize_sweep.py \
          'policies/validation/DiscreteCarFlag-v0/*seed=*_results.csv' \
          DiscreteCarFlag-v0

Prints, per seed: final success (mean of last 50 evals), first step where
the trailing-10 mean >= 0.9, and the cross-seed mean +- spread — the
reference's seeds 1-5 protocol (README.md:124-125).
"""

import csv
import glob
import re
import statistics as st
import sys


def trailing_mean(xs, k):
    xs = xs[-k:] if len(xs) >= k else xs
    return st.mean(xs) if xs else float("nan")


def first_solved(steps, sr, thresh=0.9, window=10):
    for i in range(window, len(sr) + 1):
        if st.mean(sr[i - window:i]) >= thresh:
            return steps[i - 1]
    return None


def main():
    pattern, env = sys.argv[1], sys.argv[2]
    rowsets = {}
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"seed=(\d+)_results", path)
        if not m:
            continue
        seed = int(m.group(1))
        rows = list(csv.DictReader(open(path)))
        steps = [int(r["Step"]) for r in rows]
        sr = [float(r[f"{env}/SuccessRate"]) for r in rows]
        rowsets[seed] = (steps, sr)

    finals = []
    print(f"{'seed':>4} {'evals':>6} {'last step':>10} "
          f"{'final SR(50)':>12} {'solved@(.9x10)':>15}")
    for seed in sorted(rowsets):
        steps, sr = rowsets[seed]
        fin = trailing_mean(sr, 50)
        finals.append(fin)
        solved = first_solved(steps, sr)
        print(f"{seed:>4} {len(sr):>6} {steps[-1]:>10} {fin:>12.3f} "
              f"{str(solved):>15}")
    if finals:
        print(f"mean final SR: {st.mean(finals):.3f}"
              + (f" +- {st.stdev(finals):.3f}" if len(finals) > 1 else ""))
        # Cross-seed mean success by training quarter (trend evidence).
        all_steps = max((s for s, _ in rowsets.values()), key=len)
        horizon = all_steps[-1]
        quarters = []
        for q in range(4):
            lo, hi = q * horizon / 4, (q + 1) * horizon / 4
            vals = [
                x
                for steps, sr in rowsets.values()
                for s, x in zip(steps, sr)
                if lo < s <= hi
            ]
            quarters.append(st.mean(vals) if vals else float("nan"))
        print(
            "cross-seed mean SR by quarter: "
            + " -> ".join(f"{v:.2f}" for v in quarters)
        )
        # Trailing-20 per-seed mean (the 'still climbing?' check).
        t20 = [trailing_mean(sr, 20) for _, sr in rowsets.values()]
        print(f"mean SR last-20 evals: {st.mean(t20):.3f}")


if __name__ == "__main__":
    main()
