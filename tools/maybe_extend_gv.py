#!/usr/bin/env python
"""Extend the gv_memory.7x7 5-seed sweep past 2M if still climbing.

VERDICT r2 item 1: run the 5-seed sweep, and 'if the mean curve is still
climbing at 2M, extend (the paper's asymptote is ~0.8)'.  The sweep ran
under pre-round-3 code that saved no completion checkpoint, so extension
goes through the policy-seeded continuation (tools/seed_sweep_checkpoint
mechanism): warm-restart the final policies with fresh buffers, pin the
counters, and resume to 3M.  Continuation caveat documented in
VALIDATION.md.

Decision rule: extend iff cross-seed mean of the last 20 evals < 0.75 (also
serves as crash recovery: if the 2M run died early, the continuation
resumes from the last policy snapshots toward 3M).
"""

import os as _os, sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)


import csv
import glob
import statistics as st

THRESH = 0.75
ENV = "gv_memory.7x7.yaml"
# Anchored to the repo root (like the sys.path shim) so the tool works
# from any cwd, not just the repo root.
PATTERN = _os.path.join(
    _REPO, "policies", "sweep", ENV, "*bag=0_seed=*_results.csv"
)


def main():
    last20, last_step = [], 0
    files = sorted(glob.glob(PATTERN))
    assert files, f"no sweep results under {PATTERN}"
    for path in files:
        rows = list(csv.DictReader(open(path)))
        sr = [float(r[f"{ENV}/SuccessRate"]) for r in rows]
        last20.extend(sr[-20:])
        last_step = max(last_step, int(float(rows[-1]["Step"])))
    mean20 = st.mean(last20)
    print(f"gv sweep: {len(files)} seeds, last step {last_step}, "
          f"mean SR last-20 evals {mean20:.3f}")
    if mean20 >= THRESH:
        print(f"≥ {THRESH}: at the paper's band, no extension needed")
        return
    print(f"< {THRESH}: building continuation checkpoint and extending to 3M")

    import sys

    base = [
        "--envs", ENV, "--seeds", "1", "2", "3", "4", "5",
        "--project-name", "sweep", "--save-policy", "--verbose",
        "--disable-wandb",
    ]
    sys.argv = ["seed_sweep_checkpoint", *base, "--at-step", str(last_step)]
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "seed_sweep_checkpoint", "tools/seed_sweep_checkpoint.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()

    from dtqn_tpu.config import get_args
    from dtqn_tpu.train.sweep import run_sweep

    cfg = get_args([*base, "--num-steps", "3000000", "--time-limit", "1.4"])
    run_sweep(cfg, [1, 2, 3, 4, 5])
    print("extension done")


if __name__ == "__main__":
    main()
