"""Integration tests for the agent + jitted train loop (SURVEY.md §4).

Covers: gradient steps gating on can_sample, target-network swap timing,
epsilon annealing, every model family end-to-end, bag agent path, and the
evaluation latch semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.train.loop import (
    make_evaluate,
    make_prepopulate,
    make_train_chunk,
)
from dtqn_tpu.utils.epsilon import EpsilonSchedule


def small_config(**kw):
    defaults = dict(
        model="DTQN",
        num_envs=4,
        context_len=8,
        history=8,
        inner_embed=16,
        num_heads=2,
        num_layers=1,
        buffer_size=4000,
        batch_size=4,
        target_update_frequency=10,
    )
    defaults.update(kw)
    return AgentConfig(**defaults)


def boot(cfg, env_name="DiscreteCarFlag-v0", prepop_iters=120):
    env = make_env(env_name)
    if env_name == "DiscreteCarFlag-v0":
        # Short episodes so prepopulation flushes enough episodes to sample
        # (CarFlag's native 200-step limit would need 10x the prepop budget).
        env.max_episode_steps = 25
    agent = Agent(cfg, env)
    state = agent.init_state(jax.random.key(0))
    if prepop_iters:
        state = make_prepopulate(agent, prepop_iters)(state)
    return env, agent, state


class TestTrainLoop:
    def test_learn_gated_until_can_sample(self):
        env, agent, state = boot(small_config(), prepop_iters=0)
        chunk = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 100), 1, iters_per_chunk=3
        )
        state = chunk(state)
        # 3 iters x 4 envs = 12 steps, zero flushed episodes -> no updates.
        assert int(state.train_steps) == 0
        assert int(state.env_steps) == 12

    def test_updates_apply_and_target_swaps(self):
        env, agent, state = boot(small_config())
        assert int(state.buffer.flushed_total) > 4
        # Host copies: chunk() donates the state's device buffers.
        p0 = jax.device_get(state.params)
        t0 = jax.device_get(state.target_params)
        chunk = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 1000), 1, iters_per_chunk=25
        )
        state = chunk(state)
        assert int(state.train_steps) == 25
        # Params moved.
        moved = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)), p0, state.params
        )
        assert any(jax.tree_util.tree_leaves(moved))
        # Target swapped at step 10 and 20 (tuf=10) => equals params at 20,
        # but 5 more updates since -> target != params but != original t0.
        tmoved = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)), t0, state.target_params
        )
        assert any(jax.tree_util.tree_leaves(tmoved))
        d = state.diagnostics.means()
        for v in d.values():
            assert bool(jnp.isfinite(v))
        assert int(state.nonfinite_grads) == 0

    def test_epsilon_anneal_closed_form(self):
        env, agent, state = boot(small_config(), prepop_iters=0)
        sched = EpsilonSchedule(1.0, 0.1, 100)
        chunk = make_train_chunk(agent, sched, 0, iters_per_chunk=5)
        state = chunk(state)
        # 5 iters x 4 envs = 20 anneal steps.
        expect = 0.1 + 0.9 * (1 - 1 / 100) ** 20
        assert abs(float(state.epsilon) - expect) < 1e-5

    @pytest.mark.parametrize(
        "model", ["DQN", "DRQN", "ADRQN", "DARQN", "DTQN-bag"]
    )
    def test_all_families_end_to_end(self, model):
        cfg = small_config(
            model=model,
            bag_size=3 if model == "DTQN-bag" else 0,
            action_dim=4 if model in ("ADRQN", "DTQN-bag") else 0,
        )
        env, agent, state = boot(cfg)
        chunk = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 1000), 1, iters_per_chunk=5
        )
        state = chunk(state)
        assert int(state.train_steps) == 5
        assert int(state.nonfinite_grads) == 0
        sr, ret, ln = make_evaluate(agent, env, 4)(
            state.params, jax.random.key(1)
        )
        assert 0.0 <= float(sr) <= 1.0
        assert 0 < float(ln) <= env.max_episode_steps

    def test_buffer_receives_transitions(self):
        env, agent, state = boot(small_config(), prepop_iters=50)
        # 50 iters x 4 envs = 200 env steps stored.
        stored = int(state.buffer.ep_len.sum())
        # All stored steps are accounted: completed rows + in-progress rows.
        assert stored >= 150
        # Prepopulation stores experience without consuming training
        # budget (the reference's 50k random steps precede the 2M loop,
        # run.py:290,380-405).
        assert int(state.env_steps) == 0

    def test_memory_env_discrete_pipeline(self):
        cfg = small_config(batch_size=4, context_len=8, history=4)
        env, agent, state = boot(cfg, env_name="Memory-5-v0", prepop_iters=100)
        assert state.buffer.obs.dtype == jnp.int32
        chunk = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 1000), 1, iters_per_chunk=5
        )
        state = chunk(state)
        assert int(state.train_steps) == 5
        assert int(state.nonfinite_grads) == 0


class TestEvaluate:
    def test_eval_latch_and_bounds(self):
        env, agent, state = boot(small_config(), prepop_iters=0)
        ev = make_evaluate(agent, env, eval_episodes=6)
        sr, ret, ln = ev(state.params, jax.random.key(3))
        assert 0.0 <= float(sr) <= 1.0
        # Return per episode is in [-1, 1] for CarFlag; mean too.
        assert -1.0 <= float(ret) <= 1.0
        assert 0 < float(ln) <= env.max_episode_steps

    def test_eval_deterministic_given_key(self):
        env, agent, state = boot(small_config(), prepop_iters=0)
        ev = make_evaluate(agent, env, eval_episodes=4)
        a = ev(state.params, jax.random.key(7))
        b = ev(state.params, jax.random.key(7))
        for x, y in zip(a, b):
            assert float(x) == float(y)


class TestUnroll:
    def test_unroll_matches_rolled_scan(self):
        """unroll=4 is the same computation as unroll=1 (same keys, same
        update sequence) — only the loop structure changes."""
        from dtqn_tpu.train.loop import make_train_chunk_fn
        from dtqn_tpu.utils.epsilon import EpsilonSchedule
        import numpy as np

        env, agent, state = boot(small_config(), prepop_iters=200)
        eps = EpsilonSchedule(1.0, 0.1, 1000)
        copy = lambda s: jax.tree_util.tree_map(lambda x: x.copy(), s)
        outs = []
        for unroll in (1, 4):
            chunk = jax.jit(
                make_train_chunk_fn(agent, eps, 4, 3, unroll=unroll),
                donate_argnums=(0,),
            )
            s2 = chunk(copy(state))
            outs.append(s2)
        a, b = outs
        assert int(a.train_steps) == int(b.train_steps) > 0
        pa = jax.tree_util.tree_leaves(a.params)
        pb = jax.tree_util.tree_leaves(b.params)
        for x, y in zip(pa, pb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6
            )

    def test_outer_unroll_matches_rolled_scan(self):
        """outer_unroll only unrolls the iteration scan; the computation
        (env steps, update sequence, key streams) is identical."""
        from dtqn_tpu.train.loop import make_train_chunk_fn
        from dtqn_tpu.utils.epsilon import EpsilonSchedule
        import numpy as np

        env, agent, state = boot(small_config(), prepop_iters=200)
        eps = EpsilonSchedule(1.0, 0.1, 1000)
        copy = lambda s: jax.tree_util.tree_map(lambda x: x.copy(), s)
        outs = []
        for outer in (1, 2):
            chunk = jax.jit(
                make_train_chunk_fn(agent, eps, 4, 4, outer_unroll=outer),
                donate_argnums=(0,),
            )
            outs.append(chunk(copy(state)))
        a, b = outs
        assert int(a.env_steps) == int(b.env_steps)
        assert int(a.train_steps) == int(b.train_steps) > 0
        for x, y in zip(
            jax.tree_util.tree_leaves(a.params),
            jax.tree_util.tree_leaves(b.params),
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6
            )
