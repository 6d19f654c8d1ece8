"""NaN-safety integration test (SURVEY.md §5: the jit-purity/debug-nans
analog of the reference's race detection slot).

Runs a short end-to-end train under ``jax_debug_nans`` so any NaN produced
anywhere in the rollout+learn graph fails loudly — complementing the
on-device non-finite-gradient counter (the error_if_nonfinite parity,
dqn.py:196-200)."""

import jax
import pytest

from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.train.loop import make_prepopulate, make_train_chunk
from dtqn_tpu.utils.epsilon import EpsilonSchedule


def test_short_train_is_nan_free():
    jax.config.update("jax_debug_nans", True)
    try:
        env = make_env("DiscreteCarFlag-v0")
        env.max_episode_steps = 20
        cfg = AgentConfig(
            model="DTQN", num_envs=4, context_len=8, history=8,
            inner_embed=16, num_heads=2, num_layers=1, buffer_size=800,
            batch_size=4, target_update_frequency=10,
        )
        agent = Agent(cfg, env)
        state = agent.init_state(jax.random.key(0))
        state = make_prepopulate(agent, 60)(state)
        state = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 100), 1, 5
        )(state)
        assert int(state.train_steps) == 5
        assert int(state.nonfinite_grads) == 0
    finally:
        jax.config.update("jax_debug_nans", False)
