#!/usr/bin/env python
"""CLI entry point: train a DTQN-family agent on TPU.

Flag-compatible with the reference CLI (`/root/reference/run.py:16-184`),
plus TPU execution knobs (--num-envs, --updates-per-iter, --attention,
--dp-devices).  Example:

    python run.py --envs DiscreteCarFlag-v0 --num-steps 50000 \
        --in-embed 64 --disable-wandb --verbose
"""

from dtqn_tpu.config import get_args
from dtqn_tpu.train.runner import run_experiment

if __name__ == "__main__":
    run_experiment(get_args())
