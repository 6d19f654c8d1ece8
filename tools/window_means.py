#!/usr/bin/env python
"""Per-seed mean SuccessRate (or any column) in fixed step windows.

Generic round-5 analysis helper for comparing runs on a common clock
(bagstore vs the round-3/4 bag records, the num_envs matrix, the
HeavenHell parity arms, the curriculum fine-tune).

Usage:
  python tools/window_means.py '<glob-of-results-csvs>' [--col SuccessRate]
      [--windows 0:500000,500000:1000000,...] [--last N]

Prints one row per seed (seed inferred from the filename) with the mean of
the chosen column inside each [lo, hi) step window, plus the mean of the
last N evals when --last is given, and a cross-seed mean +- spread row.
"""

import csv
import glob
import re
import statistics as st
import sys


def read_rows(path):
    with open(path) as f:
        r = csv.DictReader(f)
        col = next(
            (c for c in r.fieldnames if c.endswith("SuccessRate")), None
        )
        rows = [(int(row["Step"]), float(row[col])) for row in r]
    return sorted(rows)


def main():
    pattern = sys.argv[1]
    args = sys.argv[2:]

    def opt(flag, default):
        return args[args.index(flag) + 1] if flag in args else default

    windows = [
        tuple(int(x) for x in w.split(":"))
        for w in opt(
            "--windows",
            "0:500000,500000:1000000,1000000:1500000,1500000:2000000",
        ).split(",")
    ]
    last_n = int(opt("--last", "0"))

    header = ["seed"] + [f"{lo//1000}-{hi//1000}k" for lo, hi in windows]
    if last_n:
        header.append(f"last-{last_n}")
    print(" | ".join(header))

    per_window = [[] for _ in windows]
    lasts = []
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"seed=(\d+)_results", path)
        seed = m.group(1) if m else path
        rows = read_rows(path)
        cells = [seed]
        for i, (lo, hi) in enumerate(windows):
            vals = [v for s, v in rows if lo <= s < hi]
            if vals:
                mean = st.mean(vals)
                per_window[i].append(mean)
                cells.append(f"{mean:.3f}")
            else:
                cells.append("-")
        if last_n:
            tail = [v for _, v in rows[-last_n:]]
            if tail:
                lasts.append(st.mean(tail))
                cells.append(f"{st.mean(tail):.3f}")
            else:
                cells.append("-")
        print(" | ".join(cells))

    summary = ["mean±sd"]
    for vals in per_window:
        if len(vals) >= 2:
            summary.append(f"{st.mean(vals):.3f}±{st.stdev(vals):.3f}")
        elif vals:
            summary.append(f"{vals[0]:.3f}")
        else:
            summary.append("-")
    if last_n:
        if len(lasts) >= 2:
            summary.append(f"{st.mean(lasts):.3f}±{st.stdev(lasts):.3f}")
        elif lasts:
            summary.append(f"{lasts[0]:.3f}")
        else:
            summary.append("-")
    print(" | ".join(summary))


if __name__ == "__main__":
    main()
