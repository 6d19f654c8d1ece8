"""Equivalence of the fused learn step with naive three-forward DDQN math.

The reference computes the DDQN update as three separate network calls —
loss forward, no-grad policy argmax selector, no-grad target value
(`/root/reference/dtqn/agents/dtqn.py:215-241`).  ``Agent.apply_update``
runs the two no-grad DDQN lanes (policy selector + target value) as one
2-lane stacked forward, plus a separate differentiated loss forward
(agents/base.py).  These tests pin the kept implementation to a naive
re-implementation: identical loss gradients, hence identical post-update
parameters under the same optimizer state.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.replay.buffer import Batch


def tiny_agent(model="DTQN", bag_size=0):
    env = make_env("DiscreteCarFlag-v0")
    cfg = AgentConfig(
        model=model,
        num_envs=2,
        batch_size=4,
        context_len=8,
        history=6,
        inner_embed=16,
        num_heads=2,
        num_layers=1,
        buffer_size=4_000,
        bag_size=bag_size,
    )
    return Agent(cfg, env)


def fake_batch(key, agent):
    cfg, env = agent.config, agent.env
    b, length = cfg.batch_size, cfg.context_len
    ks = jax.random.split(key, 8)
    mk = lambda k, shape, lo, hi: jax.random.uniform(
        k, shape, minval=lo, maxval=hi
    )
    batch = Batch(
        obs=mk(ks[0], (b, length, *env.obs_shape), -1.0, 1.0),
        action=jax.random.randint(ks[1], (b, length), 0, env.num_actions),
        reward=mk(ks[2], (b, length), -1.0, 1.0),
        next_obs=mk(ks[3], (b, length, *env.obs_shape), -1.0, 1.0),
        next_action=jax.random.randint(ks[4], (b, length), 0, env.num_actions),
        done=jax.random.uniform(ks[5], (b, length)) < 0.2,
        ep_len=jnp.full((b,), length, jnp.int32),
    )
    if agent.use_bag:
        batch = dataclasses.replace(
            batch,
            bag_obs=mk(
                ks[6], (b, cfg.bag_size, *env.obs_shape), -1.0, 1.0
            ),
            bag_action=jax.random.randint(
                ks[7], (b, cfg.bag_size), 0, env.num_actions
            ),
        )
    return batch


def naive_loss(agent, params, target_params, batch):
    """Three separate forwards, straight transcription of dtqn.py:215-241."""
    cfg = agent.config
    bag_in = (
        (batch.bag_obs, batch.bag_action) if agent.use_bag else None
    )
    q_all = agent._q_context(
        params, batch.obs, batch.action, bag_in, batch.ep_len
    )
    next_qp = agent._q_context(
        params, batch.next_obs, batch.next_action, bag_in, batch.ep_len
    )
    next_qt = agent._q_context(
        target_params, batch.next_obs, batch.next_action, bag_in, batch.ep_len
    )
    next_act = jnp.argmax(next_qp, axis=-1)
    next_q = jnp.take_along_axis(next_qt, next_act[..., None], axis=-1)[
        ..., 0
    ].astype(jnp.float32)
    dones = batch.done.astype(jnp.float32)
    targets = batch.reward + (1.0 - dones) * cfg.gamma * next_q
    q_taken = jnp.take_along_axis(q_all, batch.action[..., None], axis=-1)[
        ..., 0
    ].astype(jnp.float32)
    h = cfg.history
    err = q_taken[:, -h:] - jax.lax.stop_gradient(targets[:, -h:])
    return jnp.mean(jnp.square(err))


@pytest.mark.parametrize(
    "model,bag", [("DTQN", 0), ("DTQN", 3), ("DRQN", 0), ("DQN", 0)]
)
def test_apply_update_matches_naive_three_forward_ddqn(model, bag):
    agent = tiny_agent(model, bag_size=bag)
    state = agent.init_state(jax.random.key(0))
    # Make the gate pass so the update is applied (can_sample is the only
    # buffer dependency of apply_update).
    state = state.replace(
        buffer=state.buffer.replace(flushed_total=jnp.int32(100))
    )
    batch = fake_batch(jax.random.key(1), agent)
    if agent.config.kind == "recurrent":
        # Vary episode lengths to exercise the masking path too.
        batch = dataclasses.replace(
            batch,
            ep_len=jnp.asarray([3, 8, 5, 8], jnp.int32),
        )

    grads = jax.jit(
        jax.grad(
            lambda p: naive_loss(agent, p, state.target_params, batch)
        )
    )(state.params)
    updates, _ = agent.tx.update(grads, state.opt_state, state.params)
    expected = jax.jit(lambda p, u: jax.tree_util.tree_map(jnp.add, p, u))(
        state.params, updates
    )

    new_state = jax.jit(agent.apply_update)(state, batch, jax.random.key(2))

    assert int(new_state.train_steps) == 1
    flat_e = jax.tree_util.tree_leaves(expected)
    flat_g = jax.tree_util.tree_leaves(new_state.params)
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(g), rtol=2e-5, atol=2e-6
        )
