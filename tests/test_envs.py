"""Golden-value unit tests for the pure-function environments.

Transition rules are checked against the reference envs' semantics:
CarFlag `/root/reference/envs/car_flag.py:76-133`, Memory cards
`/root/reference/envs/memory_cards.py:70-116`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.envs import make_env, registered_envs
from dtqn_tpu.envs.car_flag import CarFlag, CarFlagState
from dtqn_tpu.envs.memory_cards import MemoryCards, MemoryState


class TestCarFlag:
    def setup_method(self):
        self.env = CarFlag()

    def test_reset_ranges(self):
        obs, state = self.env.reset(jax.random.key(0))
        assert obs.shape == (3,)
        assert -0.2 <= float(state.position) <= 0.2
        assert float(state.velocity) == 0.0
        assert float(state.heaven) in (-1.0, 1.0)
        assert float(obs[2]) == 0.0  # no hint at spawn

    def test_heaven_randomized(self):
        sides = set()
        for seed in range(20):
            _, state = self.env.reset(jax.random.key(seed))
            sides.add(float(state.heaven))
        assert sides == {-1.0, 1.0}

    def test_dynamics_match_reference(self):
        # Hand-stepped: pos=0, vel=0, action 2 (force +1):
        # vel = 0.0015, pos = 0.0015 (car_flag.py:85-90)
        state = CarFlagState(
            position=jnp.float32(0.0),
            velocity=jnp.float32(0.0),
            heaven=jnp.float32(1.0),
            t=jnp.int32(0),
        )
        obs, st, r, term, info = self.env.step_env(
            jax.random.key(0), state, jnp.int32(2)
        )
        assert np.isclose(float(st.velocity), 0.0015)
        assert np.isclose(float(st.position), 0.0015)
        assert float(r) == 0.0 and not bool(term)

    def test_velocity_clamp(self):
        state = CarFlagState(
            position=jnp.float32(0.0),
            velocity=jnp.float32(0.0699),
            heaven=jnp.float32(1.0),
            t=jnp.int32(0),
        )
        _, st, *_ = self.env.step_env(jax.random.key(0), state, jnp.int32(2))
        assert float(st.velocity) <= 0.07 + 1e-7

    def test_heaven_reward_and_termination(self):
        # Crossing +1 with heaven at +1 => +1 reward, success, terminated.
        state = CarFlagState(
            position=jnp.float32(0.999),
            velocity=jnp.float32(0.07),
            heaven=jnp.float32(1.0),
            t=jnp.int32(10),
        )
        _, st, r, term, info = self.env.step_env(
            jax.random.key(0), state, jnp.int32(2)
        )
        assert bool(term) and float(r) == 1.0 and bool(info["is_success"])

    def test_hell_reward(self):
        state = CarFlagState(
            position=jnp.float32(-0.999),
            velocity=jnp.float32(-0.07),
            heaven=jnp.float32(1.0),
            t=jnp.int32(10),
        )
        _, st, r, term, info = self.env.step_env(
            jax.random.key(0), state, jnp.int32(0)
        )
        assert bool(term) and float(r) == -1.0 and not bool(info["is_success"])

    def test_priest_hint(self):
        for heaven, expect in [(1.0, 1.0), (-1.0, -1.0)]:
            state = CarFlagState(
                position=jnp.float32(0.5),
                velocity=jnp.float32(0.0),
                heaven=jnp.float32(heaven),
                t=jnp.int32(0),
            )
            obs, *_ = self.env.step_env(jax.random.key(0), state, jnp.int32(1))
            assert float(obs[2]) == expect
        # Outside the priest zone (car_flag.py:119-123): no hint.
        state = CarFlagState(
            position=jnp.float32(0.1),
            velocity=jnp.float32(0.0),
            heaven=jnp.float32(1.0),
            t=jnp.int32(0),
        )
        obs, *_ = self.env.step_env(jax.random.key(0), state, jnp.int32(1))
        assert float(obs[2]) == 0.0

    def test_time_limit_truncation(self):
        state = CarFlagState(
            position=jnp.float32(0.0),
            velocity=jnp.float32(0.0),
            heaven=jnp.float32(1.0),
            t=jnp.int32(199),
        )
        _, _, ts = self.env.step(jax.random.key(0), state, jnp.int32(1))
        assert bool(ts.truncated) and not bool(ts.terminated) and bool(ts.done)

    def test_autoreset(self):
        state = CarFlagState(
            position=jnp.float32(0.999),
            velocity=jnp.float32(0.07),
            heaven=jnp.float32(1.0),
            t=jnp.int32(5),
        )
        obs, st, ts = self.env.step_autoreset(
            jax.random.key(0), state, jnp.int32(2)
        )
        assert bool(ts.done) and float(ts.reward) == 1.0
        # State after autoreset is a fresh episode.
        assert int(st.t) == 0 and -0.2 <= float(st.position) <= 0.2

    def test_vectorized_rollout(self):
        env = self.env
        n = 64
        keys = jax.random.split(jax.random.key(0), n)
        obs, states = env.reset_vec(keys)
        assert obs.shape == (n, 3)

        @jax.jit
        def roll(states, key):
            def body(carry, key_t):
                states = carry
                keys = jax.random.split(key_t, n)
                actions = jnp.full((n,), 2, jnp.int32)
                obs, states, ts = env.step_vec(keys, states, actions)
                return states, (ts.reward, ts.done)

            return jax.lax.scan(
                body, states, jax.random.split(key, 300)
            )

        _, (rewards, dones) = roll(states, jax.random.key(1))
        # Driving right always terminates within 300 steps at +-1.
        assert bool(dones.any())
        assert set(np.unique(np.asarray(rewards))) <= {-1.0, 0.0, 1.0}


class TestMemoryCards:
    def setup_method(self):
        self.env = MemoryCards(num_pairs=5)

    def test_metadata_matches_reference(self):
        # MultiDiscrete([7]*10): tokens 0..6, mask 7, vocab 8
        assert self.env.num_actions == 10
        assert self.env.obs_shape == (10,)
        assert self.env.obs_mask == 7.0
        assert self.env.obs_vocab_size == 8

    def test_reset_reveals_one(self):
        obs, state = self.env.reset(jax.random.key(0))
        vals = np.asarray(state.values)
        assert sorted(vals.tolist()) == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
        shown = np.asarray(obs) != 0
        assert shown.sum() == 1
        idx = int(np.argmax(shown))
        assert int(obs[idx]) == vals[idx]

    def test_correct_pair_removes(self):
        _, state = self.env.reset(jax.random.key(0))
        cur = int(state.current_card)
        vals = np.asarray(state.values)
        mate = [i for i in range(10) if vals[i] == vals[cur] and i != cur][0]
        obs, st, r, term, info = self.env.step_env(
            jax.random.key(1), state, jnp.int32(mate)
        )
        assert float(r) == 0.0
        removed = np.asarray(st.removed)
        assert removed[cur] and removed[mate] and removed.sum() == 2
        # Removed cards shown as the removed token (6 for 5 pairs).
        assert int(obs[cur]) == 6 and int(obs[mate]) == 6

    def test_wrong_pick_penalty(self):
        _, state = self.env.reset(jax.random.key(0))
        cur = int(state.current_card)
        vals = np.asarray(state.values)
        wrong = [i for i in range(10) if vals[i] != vals[cur]][0]
        _, st, r, term, _ = self.env.step_env(
            jax.random.key(1), state, jnp.int32(wrong)
        )
        assert float(r) == -1.0 and not bool(term)
        assert np.asarray(st.removed).sum() == 0

    def test_pick_current_card_is_wrong(self):
        # memory_cards.py:89-91 — selecting the shown card is a wrong answer.
        _, state = self.env.reset(jax.random.key(0))
        cur = int(state.current_card)
        _, _, r, term, _ = self.env.step_env(
            jax.random.key(1), state, jnp.int32(cur)
        )
        assert float(r) == -1.0 and not bool(term)

    def test_full_episode_success(self):
        # Always answer with the true mate: 5 steps, all reward 0, done.
        _, state = self.env.reset(jax.random.key(0))
        total_r, done = 0.0, False
        for step in range(5):
            vals = np.asarray(state.values)
            cur = int(state.current_card)
            mate = [
                i
                for i in range(10)
                if vals[i] == vals[cur]
                and i != cur
                and not bool(state.removed[i])
            ][0]
            _, state, r, done, info = self.env.step_env(
                jax.random.key(step), state, jnp.int32(mate)
            )
            total_r += float(r)
        assert bool(done) and total_r == 0.0 and bool(info["is_success"])

    def test_revealed_card_never_removed(self):
        _, state = self.env.reset(jax.random.key(2))
        key = jax.random.key(3)
        for step in range(30):
            key, k_act, k_step = jax.random.split(key, 3)
            action = jax.random.randint(k_act, (), 0, 10)
            _, state, r, done, _ = self.env.step_env(k_step, state, action)
            if bool(done):
                break
            assert not bool(state.removed[state.current_card])


def test_registry():
    assert "DiscreteCarFlag-v0" in registered_envs()
    assert "Memory-5-v0" in registered_envs()
    env = make_env("DiscreteCarFlag-v0")
    assert env.num_actions == 3
    with pytest.raises(KeyError):
        make_env("nope-v0")


class TestContinuousCarFlag:
    """Box(1) force mode (reference car_flag.py:58-63,82-83)."""

    def test_fractional_force_matches_discrete_scaling(self):
        env = make_env("CarFlag-continuous-v0")
        assert env.num_actions == 0  # not usable by discrete Q agents
        _, st = env.reset(jax.random.key(0))
        # force 1.0 == discrete action 2
        _, st1, r, term, _ = env.step_env(
            jax.random.key(1), st, jnp.float32(1.0)
        )
        denv = make_env("DiscreteCarFlag-v0")
        _, dst = denv.reset(jax.random.key(0))
        _, dst1, _, _, _ = denv.step_env(jax.random.key(1), dst, jnp.int32(2))
        assert float(st1.velocity) == float(dst1.velocity)
        # fractional force scales velocity linearly
        _, st_half, _, _, _ = env.step_env(
            jax.random.key(1), st, jnp.float32(0.5)
        )
        assert float(st_half.velocity) == pytest.approx(
            0.5 * float(st1.velocity)
        )

    def test_action_clipped(self):
        env = make_env("CarFlag-continuous-v0")
        _, st = env.reset(jax.random.key(0))
        _, a, _, _, _ = env.step_env(jax.random.key(1), st, jnp.float32(10.0))
        _, b, _, _, _ = env.step_env(jax.random.key(1), st, jnp.float32(1.0))
        assert float(a.velocity) == float(b.velocity)

    def test_vectorized_rollout(self):
        env = make_env("CarFlag-continuous-v0")
        obs, st = env.reset_vec(jax.random.split(jax.random.key(0), 4))
        forces = jnp.full((4,), 0.7, jnp.float32)
        obs, st, ts = env.step_vec(
            jax.random.split(jax.random.key(1), 4), st, forces
        )
        assert obs.shape == (4, 3) and ts.reward.shape == (4,)
