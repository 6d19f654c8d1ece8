#!/usr/bin/env python
"""Dead-head collapse frequency vs --tuf: the mitigation table.

Round-1/2 forensics: with the reference defaults (tuf=10k, sparse +-1
terminal rewards) CarFlag has a seed-dependent collapse where the Q-head
hidden ReLU dies before the first target swap (Q == bias, gradient-free,
permanent).  Diagnosis signal: maxQ - meanQ < 1e-3 in the losses CSV.
This tool compares collapse frequency between the tuf=10k 5-seed sweep
(policies/sweep) and the tuf=1000 5-seed sweep (policies/tuf1000),
emitting the VALIDATION.md table (VERDICT r2 item 8).

Usage: python tools/tuf_comparison.py
"""

import csv
import glob
import os
import re

import numpy as np

# Anchored to the repo root so the tool works from any cwd.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _p(*parts):
    return os.path.join(_REPO, "policies", *parts)


SETS = [
    ("10000 (reference default)",
     _p("sweep", "DiscreteCarFlag-v0", "model=DTQN_*losses.csv"),
     _p("sweep", "DiscreteCarFlag-v0", "model=DTQN_*results.csv")),
    ("1000",
     _p("tuf1000", "DiscreteCarFlag-v0", "model=DTQN_*losses.csv"),
     _p("tuf1000", "DiscreteCarFlag-v0", "model=DTQN_*results.csv")),
]


def seed_of(path):
    return int(re.search(r"seed=(\d+)_", path).group(1))


def main():
    print("| tuf | seed | evals | dead evals (spread<1e-3) | permanently dead | final SR (last 20 evals) |")
    print("|---|---|---|---|---|---|")
    for label, lpat, rpat in SETS:
        rows_out = []
        results = {seed_of(p): p for p in glob.glob(rpat)}
        for path in sorted(glob.glob(lpat), key=seed_of):
            seed = seed_of(path)
            rows = list(csv.DictReader(open(path)))
            spread = np.array(
                [float(r["Max Q Value"]) - float(r["Mean Q Value"]) for r in rows]
            )
            dead = spread < 1e-3
            # permanently dead: dead for the entire final quarter
            q = max(len(dead) // 4, 1)
            perm = bool(dead[-q:].all())
            sr = float("nan")
            if seed in results:
                rr = list(csv.DictReader(open(results[seed])))
                env = next(k for k in rr[0] if k.endswith("/SuccessRate"))
                sr = float(np.mean([float(r[env]) for r in rr[-20:]]))
            rows_out.append((seed, len(dead), int(dead.sum()), perm, sr))
            print(
                f"| {label} | {seed} | {len(dead)} | {int(dead.sum())} | "
                f"{'YES' if perm else 'no'} | {sr:.2f} |"
            )
        if rows_out:
            n_perm = sum(1 for r in rows_out if r[3])
            mean_sr = np.nanmean([r[4] for r in rows_out])
            print(
                f"| {label} | **all** |  |  | **{n_perm}/{len(rows_out)}** "
                f"| **{mean_sr:.2f}** |"
            )


if __name__ == "__main__":
    main()
