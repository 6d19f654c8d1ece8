#!/usr/bin/env python
"""Host-loop trainer on the REAL TPU chip with an in-repo host env.

Real MiniHack cannot be installed in this image (no network), so the
host-loop training path (train/host_loop.py — the runner for C-backed
host envs, dispatched for MH-* domains) had only CPU tests against an
injected fake env.  This smoke runs the same injected-env trick on the
default platform (the real chip): host-side env stepping + device-side
act/learn, a real TPU exercise of everything MiniHack training would use
except libnethack itself.

Usage: python tools/host_loop_tpu_smoke.py [num_steps]
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import numpy as np

from dtqn_tpu.config import get_args
from dtqn_tpu.envs.core import ObsKind
from dtqn_tpu.envs.host import HostEnvironment
from dtqn_tpu.train.host_loop import run_host_experiment


class CueHostEnv(HostEnvironment):
    """Same cue-memory task as tests/test_host_loop.py: observe a cue
    token at t=0, then blanks; acting `cue` terminates with +1."""

    name = "CueHost-v0"
    num_actions = 2
    max_episode_steps = 8
    obs_kind = ObsKind.DISCRETE
    obs_shape = (1,)
    obs_dtype = np.int32

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.cue = 0
        self.t = 0

    @property
    def obs_mask(self) -> float:
        return 3.0

    def seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)

    def reset(self):
        self.cue = int(self.rng.integers(0, 2))
        self.t = 0
        return np.array([self.cue], np.int32)

    def step(self, action):
        self.t += 1
        if action == self.cue:
            return (
                np.array([2], np.int32),
                1.0,
                True,
                {"is_success": True},
            )
        return np.array([2], np.int32), -0.1, False, {}


def main():
    num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cfg = get_args(
        [
            "--envs", "MH-CueHost-v0", "--in-embed", "32", "--context", "8",
            "--history", "8", "--num-steps", str(num_steps),
            "--prepop-steps", "1000", "--project-name", "validation",
            "--disable-wandb", "--verbose", "--save-policy",
        ]
    )
    out = run_host_experiment(cfg, env_factory=lambda name: CueHostEnv())
    sr = out.get("MH-CueHost-v0/SuccessRate")
    print(f"HOST-LOOP TPU SMOKE DONE: final SuccessRate={sr}")
    assert sr is not None and sr > 0.8, "cue task should be learned"


if __name__ == "__main__":
    main()
