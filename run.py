#!/usr/bin/env python
"""CLI entry point: train a DTQN-family agent on TPU.

Flag-compatible with the reference CLI (`/root/reference/run.py:16-184`),
plus TPU execution knobs (--num-envs, --updates-per-iter, --attention,
--dp-devices, --seeds).  Examples:

    python run.py --envs DiscreteCarFlag-v0 --num-steps 50000 \
        --in-embed 64 --disable-wandb --verbose

    # The reference's 5-seed protocol (README.md:124-125), one chip:
    python run.py --envs DiscreteCarFlag-v0 --in-embed 64 \
        --seeds 1 2 3 4 5 --disable-wandb --verbose
"""

from dtqn_tpu.config import get_args

if __name__ == "__main__":
    config = get_args()
    if config.device == "cpu":
        # Honor --device cpu (reference run.py:84) even on hosts whose
        # sitecustomize force-registers an accelerator platform: the env
        # var JAX_PLATFORMS can be overridden there, but the config update
        # wins as long as no backend has initialized yet.
        import jax

        jax.config.update("jax_platforms", "cpu")
    if any(n.startswith("MH-") for n in config.envs):
        # MiniHack is C-backed host code: host-loop runner path.
        from dtqn_tpu.train.host_loop import run_host_experiment

        if config.seeds:
            config.seed = config.seeds[0]
        run_host_experiment(config)
    elif len(config.seeds) > 1:
        from dtqn_tpu.train.sweep import run_sweep

        run_sweep(config, config.seeds)
    else:
        from dtqn_tpu.train.runner import run_experiment

        if config.seeds:
            config.seed = config.seeds[0]
        run_experiment(config)
