"""Replay system invariants (SURVEY.md §4): ring store/sample semantics,
episode exclusion, window-start clipping, context roll/evict, bag add/reject.

Reference semantics being checked: replay_buffer.py:71-264,
utils/context.py:56-96, utils/bag.py:28-36.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dtqn_tpu import replay

E = 2  # envs
T = 10  # max episode steps
L = 4  # context len
OBS = (2,)


def fresh_buffer(buffer_size=4 * T * E):
    return replay.init_buffer(
        num_envs=E,
        buffer_size=buffer_size,
        max_episode_steps=T,
        context_len=L,
        obs_shape=OBS,
        obs_dtype=jnp.float32,
        obs_mask=-5.0,
    )


def obs_of(v):
    return jnp.full((E, *OBS), float(v), jnp.float32)


def run_episode(buf, ep_id, length, mask=None):
    """Store one episode of `length` steps for all envs; obs value encodes
    (ep_id, step)."""
    if mask is None:
        mask = jnp.ones((E,), bool)
    buf = replay.store_first_obs(buf, obs_of(ep_id * 100), mask, -5.0)
    for step in range(length):
        buf = replay.store_step(
            buf,
            obs_of(ep_id * 100 + step + 1),
            jnp.full((E,), step % 3, jnp.int32),
            jnp.full((E,), float(step), jnp.float32),
            jnp.zeros((E,), bool),
        )
    buf = replay.flush(buf, mask)
    return buf


class TestBuffer:
    def test_store_layout(self):
        buf = fresh_buffer()
        buf = run_episode(buf, ep_id=1, length=3)
        rows = np.asarray(buf.current_rows)  # advanced after flush
        # Episode was written to the PREVIOUS ring slot.
        prev = np.asarray(
            jnp.arange(E) * buf.rows_per_env + (buf.ep_count - 1) % buf.rows_per_env
        )
        obs = np.asarray(buf.obs)
        # s and s' share one array: slot 0 = first obs, slot k+1 = step k obs
        assert obs[prev[0], 0, 0] == 100.0
        assert obs[prev[0], 3, 0] == 103.0
        assert np.asarray(buf.ep_len)[prev[0]] == 3
        assert np.asarray(buf.ep_valid)[prev[0]]
        # Untouched tail keeps all-True dones (replay_buffer.py:65).
        assert np.asarray(buf.done)[prev[0], 3:].all()

    def test_can_sample_counts_flushed(self):
        buf = fresh_buffer()
        assert not bool(replay.can_sample(buf, 0))
        buf = run_episode(buf, 1, 3)
        # 2 envs flushed -> 2 completed episodes
        assert bool(replay.can_sample(buf, 1))
        assert not bool(replay.can_sample(buf, 2))

    def test_in_progress_episode_excluded(self):
        buf = fresh_buffer()
        buf = run_episode(buf, 1, T)
        # Start (but don't flush) a second episode per env.
        buf = replay.store_first_obs(buf, obs_of(900), jnp.ones((E,), bool), -5.0)
        buf = replay.store_step(
            buf, obs_of(901), jnp.zeros((E,), jnp.int32),
            jnp.zeros((E,)), jnp.zeros((E,), bool),
        )
        batch = replay.sample(buf, jax.random.key(0), 64, L)
        # No sampled window may contain in-progress obs values (900/901).
        assert not np.isin(np.asarray(batch.obs), [900.0, 901.0]).any()
        assert not np.isin(np.asarray(batch.next_obs), [900.0, 901.0]).any()

    def test_window_start_clipping(self):
        """Short episodes (len < L) always start at 0; long ones stay within
        [0, ep_len - L] (replay_buffer.py:149-156)."""
        buf = fresh_buffer()
        buf = run_episode(buf, 1, 2)  # shorter than L=4
        batch = replay.sample(buf, jax.random.key(0), 32, L)
        obs = np.asarray(batch.obs)
        # Window starts at 0: first obs is the episode's first obs.
        assert (obs[:, 0, 0] == 100.0).all()
        # Padded region beyond ep_len keeps mask obs and done=True.
        assert (obs[:, 3, 0] == -5.0).all()
        assert np.asarray(batch.done)[:, 3].all()
        assert (np.asarray(batch.ep_len) == 2).all()

        buf2 = fresh_buffer()
        buf2 = run_episode(buf2, 2, T)  # length 10 > L
        batch2 = replay.sample(buf2, jax.random.key(1), 256, L)
        # Every window lies fully inside the episode: no mask obs at all.
        assert not (np.asarray(batch2.obs) == -5.0).any()
        starts = np.asarray(batch2.obs)[:, 0, 0] - 200.0
        assert starts.min() >= 0 and starts.max() <= T - L

    def test_next_obs_is_shifted_by_one(self):
        buf = fresh_buffer()
        buf = run_episode(buf, 1, T)
        batch = replay.sample(buf, jax.random.key(0), 16, L)
        np.testing.assert_allclose(
            np.asarray(batch.obs)[:, 1:], np.asarray(batch.next_obs)[:, :-1]
        )
        np.testing.assert_allclose(
            np.asarray(batch.action)[:, 1:], np.asarray(batch.next_action)[:, :-1]
        )

    def test_ring_overwrite(self):
        buf = fresh_buffer(buffer_size=2 * T * E)  # 2 rows per env
        for ep in range(5):
            buf = run_episode(buf, ep + 1, 3)
        batch = replay.sample(buf, jax.random.key(0), 64, L)
        vals = np.asarray(batch.obs)[:, 0, 0]
        # Only the last two episodes per env survive in a 2-slot ring.
        assert set(np.unique(vals)) <= {400.0, 500.0}

    def test_sample_with_bag_small_start(self):
        buf = fresh_buffer()
        buf = run_episode(buf, 1, T)
        batch = replay.sample_with_bag(
            buf, jax.random.key(0), 128, L, bag_size=3, obs_mask=-5.0
        )
        assert batch.bag_obs.shape == (128, 3, *OBS)
        obs = np.asarray(batch.obs)
        bag = np.asarray(batch.bag_obs)
        starts = (obs[:, 0, 0] - 100.0).astype(int)
        for i in range(128):
            s = starts[i]
            bag_vals = bag[i, :, 0]
            real = bag_vals[bag_vals != -5.0]
            # Bag entries come strictly from pre-window slots (< start).
            assert ((real - 100.0) < s).all(), (s, bag_vals)
            if s <= 3:
                # Take-all case: exactly s real entries.
                assert (bag_vals != -5.0).sum() == s
            else:
                assert (bag_vals != -5.0).sum() == 3
                # Distinct picks (sampling without replacement).
                assert len(np.unique(real)) == 3


class TestContext:
    def setup_method(self):
        self.key = jax.random.key(0)
        self.ctx = replay.init_context(
            self.key, E, L, OBS, jnp.float32, -5.0, 3, obs_of(0)
        )

    def test_init(self):
        assert np.asarray(self.ctx.obs)[:, 0, 0].tolist() == [0.0, 0.0]
        assert (np.asarray(self.ctx.obs)[:, 1:, 0] == -5.0).all()
        # Actions random in range (context.py:50); dones True; rewards 0.
        acts = np.asarray(self.ctx.action)
        assert ((acts >= 0) & (acts < 3)).all()
        assert np.asarray(self.ctx.done).all()

    def test_add_until_full_then_evict(self):
        ctx = self.ctx
        evictions = []
        for step in range(L + 2):
            ctx, ev_obs, ev_act, was_full = replay.add_transition(
                ctx,
                obs_of(step + 1),
                jnp.full((E,), 1, jnp.int32),
                jnp.full((E,), 0.5, jnp.float32),
                jnp.zeros((E,), bool),
            )
            evictions.append((np.asarray(ev_obs)[0, 0], bool(was_full[0])))
        # timestep: first L-1 adds fill rows 1..L-1 without eviction.
        assert [f for _, f in evictions[: L - 1]] == [False] * (L - 1)
        # Adds L, L+1: full -> oldest evicted (obs 0 then obs 1... shifted).
        assert evictions[L - 1] == (0.0, True)
        assert evictions[L] == (1.0, True)
        # Context rows now hold the last L observations in order.
        np.testing.assert_allclose(
            np.asarray(ctx.obs)[0, :, 0], [3.0, 4.0, 5.0, 6.0]
        )
        assert int(ctx.timestep[0]) == L + 2

    def test_partial_reset(self):
        ctx = self.ctx
        for step in range(3):
            ctx, *_ = replay.add_transition(
                ctx, obs_of(step + 1), jnp.zeros((E,), jnp.int32),
                jnp.zeros((E,)), jnp.zeros((E,), bool),
            )
        mask = jnp.array([True, False])
        ctx2 = replay.reset_context(
            ctx, jax.random.key(1), obs_of(77), mask, -5.0, 3
        )
        assert int(ctx2.timestep[0]) == 0 and int(ctx2.timestep[1]) == 3
        assert float(ctx2.obs[0, 0, 0]) == 77.0
        assert float(ctx2.obs[1, 3, 0]) == 3.0


class TestBag:
    def test_add_and_reject(self):
        bag = replay.init_bag(E, 2, OBS, jnp.float32, -5.0)
        mask = jnp.ones((E,), bool)
        idx = jnp.ones((E,), jnp.int32)
        bag, acc = replay.bag_add(
            bag, obs_of(1), jnp.ones((E,), jnp.int32), idx, mask
        )
        assert np.asarray(acc).all()
        bag, acc = replay.bag_add(
            bag, obs_of(2), jnp.ones((E,), jnp.int32), 2 * idx, mask
        )
        assert np.asarray(acc).all()
        # Full: rejected (bag.py:28-36).
        bag, acc = replay.bag_add(
            bag, obs_of(3), jnp.ones((E,), jnp.int32), 3 * idx, mask
        )
        assert not np.asarray(acc).any()
        np.testing.assert_allclose(np.asarray(bag.obs)[0, :, 0], [1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(bag.obs_idx)[0], [1, 2])

    def test_partial_reset(self):
        bag = replay.init_bag(E, 2, OBS, jnp.float32, -5.0)
        bag, _ = replay.bag_add(
            bag, obs_of(1), jnp.ones((E,), jnp.int32),
            jnp.ones((E,), jnp.int32), jnp.ones((E,), bool),
        )
        bag2 = replay.reset_bag(bag, jnp.array([True, False]), -5.0)
        assert int(bag2.pos[0]) == 0 and int(bag2.pos[1]) == 1
        assert float(bag2.obs[0, 0, 0]) == -5.0
        assert float(bag2.obs[1, 0, 0]) == 1.0
        assert int(bag2.obs_idx[0, 0]) == -1 and int(bag2.obs_idx[1, 0]) == 1
