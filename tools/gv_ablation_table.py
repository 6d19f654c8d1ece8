#!/usr/bin/env python
"""Round-4 gv_memory.7x7 reconstruction-ablation table (VERDICT r3 item 1).

Compares each ablation arm (policies/r4ablate/<env-variant>/) against the
round-3 baseline 5-seed record (policies/sweep/gv_memory.7x7.yaml/) on a
common clock: per-seed mean SuccessRate inside fixed step windows, so 1M
arms are comparable against the 2M baseline at the same training depth.

Usage: python tools/gv_ablation_table.py
"""

import csv
import glob
import os
import re
import statistics as st

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOWS = [(300_000, 500_000), (500_000, 750_000), (750_000, 1_000_000),
           (1_750_000, 2_000_000)]

ARMS = [
    ("baseline (r3, random spawn)", "sweep", "gv_memory.7x7.yaml",
     "*bag=0_seed=*_results.csv"),
    ("fspawn", "r4ablate", "gv_memory.7x7.yaml+fspawn", "*_results.csv"),
    ("walkbeacon", "r4ablate", "gv_memory.7x7.yaml+walkbeacon",
     "*_results.csv"),
    ("sumenc", "r4ablate", "gv_memory.7x7.yaml+sumenc", "*_results.csv"),
    ("oracle", "r4ablate", "gv_memory.7x7.yaml+oracle", "*_results.csv"),
]


def seed_of(path):
    return int(re.search(r"seed=(\d+)_", path).group(1))


def main():
    header = "| arm | seed | " + " | ".join(
        f"SR {a//1000}k-{b//1000}k" for a, b in WINDOWS
    ) + " |"
    print(header)
    print("|" + "---|" * (2 + len(WINDOWS)))
    for label, proj, envdir, pat in ARMS:
        files = sorted(
            glob.glob(os.path.join(_REPO, "policies", proj, envdir, pat)),
            key=seed_of,
        )
        if not files:
            continue
        env = envdir
        arm_means = [[] for _ in WINDOWS]
        for path in files:
            rows = list(csv.DictReader(open(path)))
            pts = [
                (int(float(r["Step"])), float(r[f"{env}/SuccessRate"]))
                for r in rows
            ]
            cells = []
            for w, (lo, hi) in enumerate(WINDOWS):
                vals = [sr for s, sr in pts if lo < s <= hi]
                if vals:
                    m = st.mean(vals)
                    arm_means[w].append(m)
                    cells.append(f"{m:.2f}")
                else:
                    cells.append("—")
            print(f"| {label} | {seed_of(path)} | " + " | ".join(cells) + " |")
        agg = []
        for w in range(len(WINDOWS)):
            if arm_means[w]:
                mu = st.mean(arm_means[w])
                sd = st.pstdev(arm_means[w]) if len(arm_means[w]) > 1 else 0.0
                agg.append(f"**{mu:.2f}±{sd:.2f}**")
            else:
                agg.append("—")
        print(f"| **{label} mean** | — | " + " | ".join(agg) + " |")


if __name__ == "__main__":
    main()
