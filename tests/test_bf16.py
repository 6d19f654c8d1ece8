"""bfloat16 compute-dtype tests: params stay f32, forward finite and close
to the f32 result, training step still applies with finite grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.models import build_network
from dtqn_tpu.models.init import compute_dtype, set_compute_dtype
from dtqn_tpu.train.loop import make_prepopulate, make_train_chunk
from dtqn_tpu.utils.epsilon import EpsilonSchedule


@pytest.fixture(autouse=True)
def restore_dtype():
    yield
    set_compute_dtype("float32")


def test_forward_close_to_f32():
    env = make_env("DiscreteCarFlag-v0")
    obss = jax.random.normal(jax.random.key(1), (4, 10, 3))
    net = build_network("DTQN", env, inner_embed=32, num_heads=4,
                        context_len=10)
    params = net.init(jax.random.key(0), obss)
    q32 = net.apply(params, obss)

    set_compute_dtype("bfloat16")
    q16 = net.apply(params, obss)
    # Params remain float32.
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    # Output tracks the f32 result within bf16 resolution.
    np.testing.assert_allclose(
        np.asarray(q32), np.asarray(q16, np.float32), atol=0.05, rtol=0.1
    )


def test_bf16_training_step():
    set_compute_dtype("bfloat16")
    env = make_env("DiscreteCarFlag-v0")
    env.max_episode_steps = 20
    cfg = AgentConfig(
        model="DTQN", num_envs=4, context_len=8, history=8, inner_embed=16,
        num_heads=2, num_layers=1, buffer_size=800, batch_size=4,
        target_update_frequency=10,
    )
    agent = Agent(cfg, env)
    state = agent.init_state(jax.random.key(0))
    state = make_prepopulate(agent, 60)(state)
    state = make_train_chunk(agent, EpsilonSchedule(1.0, 0.1, 100), 1, 5)(state)
    assert int(state.train_steps) == 5
    assert int(state.nonfinite_grads) == 0
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    # Diagnostics (f32 loss math) stay finite.
    for v in state.diagnostics.means().values():
        assert bool(jnp.isfinite(v))
