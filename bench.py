#!/usr/bin/env python
"""Headline benchmark: Car Flag DTQN env-steps/s at the reference's 1:1
update ratio, on the default JAX platform (TPU when present).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches BASELINE.json's headline row: DiscreteCarFlag-v0, DTQN
in_embed 64, context 50, 8 heads, 2 layers, batch 32 — and keeps the
reference's data/update ratio of exactly 1 gradient step per env step
(run.py:290-298), so "env-steps/s" also equals learner updates/s.

Baseline: the reference PyTorch hot loop measured on this host's CPU by
tools/bench_reference.py (get_action forward + full DDQN train step per env
step): 0.68 env-steps/s.
"""

import json
import time

import jax
import numpy as np

REFERENCE_CPU_STEPS_PER_S = 0.68  # tools/bench_reference.py on this host


def sync(state):
    """Synchronize by transferring data-dependent scalars.

    On the axon TPU platform ``block_until_ready`` can return before the
    computation finishes (and pure counters like env_steps are hoistable),
    so timing must fetch values that depend on the full learn chain.
    """
    _ = int(state.train_steps)
    _ = float(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]
    )


def main():
    from dtqn_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from dtqn_tpu.agents import Agent, AgentConfig
    from dtqn_tpu.envs import make_env
    from dtqn_tpu.train.loop import make_prepopulate, make_train_chunk
    from dtqn_tpu.utils.epsilon import EpsilonSchedule

    num_envs = 64
    env = make_env("DiscreteCarFlag-v0")
    cfg = AgentConfig(
        model="DTQN",
        num_envs=num_envs,
        context_len=50,
        history=50,
        inner_embed=64,
        num_heads=8,
        num_layers=2,
        batch_size=32,
        buffer_size=500_000,
        target_update_frequency=10_000,
    )
    agent = Agent(cfg, env)
    state = agent.init_state(jax.random.key(0))

    # Enough prepopulation that learn() steps actually apply.
    prepop = make_prepopulate(agent, iters=max(40_000 // num_envs, 1))
    state = prepop(state)
    assert int(state.buffer.flushed_total) > cfg.batch_size

    iters = 50  # x num_envs env steps per chunk, 1 update per env step
    chunk = make_train_chunk(
        agent,
        EpsilonSchedule(1.0, 0.1, 200_000),
        updates_per_iter=num_envs,
        iters_per_chunk=iters,
    )
    state = chunk(state)  # compile + warmup
    sync(state)

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        state = chunk(state)
        sync(state)
        best = min(best, time.perf_counter() - t0)
    assert int(state.train_steps) > 0 and int(state.nonfinite_grads) == 0

    value = iters * num_envs / best
    print(
        json.dumps(
            {
                "metric": "carflag_dtqn_env_steps_per_s_1to1_updates",
                "value": round(value, 1),
                "unit": "env-steps/s (== learner updates/s)",
                "vs_baseline": round(value / REFERENCE_CPU_STEPS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
