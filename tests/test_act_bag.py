"""--bag-store: act-time bag recording + stored-bag sampling.

Covers the round-5 ablation machinery that closes the reference's train/act
bag-distribution mismatch (training bags = uniform random pre-window subsets,
`/root/reference/dtqn/buffers/replay_buffer.py:171-264`; act-time bags =
greedy eviction policy, `/root/reference/dtqn/agents/dtqn.py:125-157`):
  - buffer-level: stored (obs-index, action) bags are gathered back for the
    sampled window's last acting step, mask-padded where empty, always
    pre-window
  - agent-level: a DTQN-bag agent with bag_store populates the storage with
    indices consistent with its own bag state, and training batches carry
    eviction-policy bags
  - checkpoint round-trip with the optional storage arrays present
"""

import jax
import jax.numpy as jnp
import numpy as np

from dtqn_tpu import replay
from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.replay.buffer import _draw_windows
from dtqn_tpu.train.loop import env_step


L = 4  # context_len
BAG = 3
T = 10  # max_episode_steps


def make_buf():
    return replay.init_buffer(
        num_envs=1,
        buffer_size=4 * T,
        max_episode_steps=T,
        context_len=L,
        obs_shape=(1,),
        obs_dtype=jnp.float32,
        obs_mask=-5.0,
        act_bag_size=BAG,
    )


def fill_episode(buf, ep_len=T):
    """One episode where obs index k has value k, action k has value k;
    the act-time bag stored at slot p holds obs indices
    [p-3, p-4, p-5] (clipped at -1 = empty; p+1-L is the newest index a
    real eviction could produce at L=4) with action = idx + 100."""
    one = jnp.ones((1,), jnp.int32)
    buf = replay.store_first_obs(
        buf, jnp.zeros((1, 1)), jnp.ones((1,), bool), -5.0
    )
    for k in range(1, ep_len + 1):
        buf = replay.store_step(
            buf,
            jnp.full((1, 1), float(k)),
            one * k,
            jnp.zeros((1,)),
            jnp.zeros((1,), bool).at[0].set(k == ep_len),
        )
        p = k - 1
        idx = jnp.array([[p - 3, p - 4, p - 5]], jnp.int32)
        idx = jnp.where(idx >= 0, idx, -1)
        buf = replay.store_act_bag(buf, idx, jnp.maximum(idx, 0) + 100)
    return replay.flush(buf, jnp.ones((1,), bool))


class TestStoredBagBuffer:
    def test_storage_allocated_only_when_requested(self):
        buf = replay.init_buffer(
            num_envs=1, buffer_size=40, max_episode_steps=T, context_len=L,
            obs_shape=(1,), obs_dtype=jnp.float32, obs_mask=-5.0,
        )
        assert buf.bag_idx is None and buf.bag_act is None
        buf2 = make_buf()
        assert buf2.bag_idx.shape == (buf2.obs.shape[0], T, BAG)

    def test_gather_matches_window_end(self):
        buf = fill_episode(fill_episode(make_buf()))  # two valid episodes
        key = jax.random.key(3)
        batch = replay.sample_with_stored_bag(buf, key, 16, L, -5.0)
        rows, starts = _draw_windows(buf, key, 16, L)
        starts = np.asarray(starts)
        for b in range(16):
            s = starts[b]
            slot = min(max(s + L - 2, 0), T - 1)
            want_idx = np.array([slot - 3, slot - 4, slot - 5])
            for j, w in enumerate(want_idx):
                if w >= 0:
                    # entry = episode obs w (value == w), action w + 100
                    assert float(batch.bag_obs[b, j, 0]) == float(w)
                    assert int(batch.bag_action[b, j]) == w + 100
                    assert w < s or s == 0  # pre-window support
                else:
                    assert float(batch.bag_obs[b, j, 0]) == -5.0
                    assert int(batch.bag_action[b, j]) == 0

    def test_cleanse_clears_bag_storage(self):
        buf = make_buf()
        rows_per_env = buf.rows_per_env
        # Fill every row so the ring wraps back to row 0.
        for _ in range(rows_per_env + 1):
            buf = fill_episode(buf)
        # Row 0 was cleansed on reuse: its first slots belong to the NEW
        # episode only (freshly stored), and pre-store slots are -1.
        assert int(buf.bag_idx[0, T - 1, 0]) == T - 4


class TestStoredBagAgent:
    def _agent(self):
        env = make_env("DiscreteCarFlag-v0")
        env.max_episode_steps = 16
        cfg = AgentConfig(
            model="DTQN",
            num_envs=2,
            context_len=6,
            history=6,
            inner_embed=16,
            num_heads=2,
            num_layers=1,
            batch_size=4,
            buffer_size=400,
            bag_size=BAG,
            bag_store=True,
        )
        return env, Agent(cfg, env)

    def test_agent_records_consistent_indices(self):
        env, agent = self._agent()
        state = agent.init_state(jax.random.key(0))
        assert state.buffer.bag_idx is not None
        step = jax.jit(lambda s, k: env_step(agent, s, k))
        for i in range(80):
            state = step(state, jax.random.key(i))
        bag_idx = np.asarray(state.buffer.bag_idx)
        valid = bag_idx >= 0
        assert valid.any(), "no act-bag entries recorded in 80 steps"
        # Indices are episode obs indices: < T and, at the slot where they
        # are stored, strictly pre-context (idx <= p + 1 - L).
        assert bag_idx.max() < env.max_episode_steps
        rows, slots, bags = np.nonzero(valid)
        assert (bag_idx[rows, slots, bags] <= slots + 1 - agent.config.context_len).all()
        # The LIVE bag state's indices mirror what gets stored.
        live_idx = np.asarray(state.bag.obs_idx)
        live_pos = np.asarray(state.bag.pos)
        for e in range(2):
            n = min(live_pos[e], BAG)
            assert (live_idx[e, :n] >= 0).all()

    def test_training_batch_carries_stored_bags(self):
        env, agent = self._agent()
        state = agent.init_state(jax.random.key(0))
        step = jax.jit(lambda s, k: env_step(agent, s, k))
        for i in range(200):
            state = step(state, jax.random.key(i))
        assert bool(replay.can_sample(state.buffer, agent.config.batch_size))
        key = jax.random.key(99)
        batch = agent.sample_batch(state.buffer, key)
        assert batch.bag_obs.shape == (4, BAG, *env.obs_shape)
        # Entries match the buffer contents at the recorded indices.
        rows, starts = _draw_windows(state.buffer, key, 4, 6)
        rows, starts = np.asarray(rows), np.asarray(starts)
        ep_len = np.asarray(state.buffer.ep_len)
        buf_obs = np.asarray(state.buffer.obs)
        buf_idx = np.asarray(state.buffer.bag_idx)
        for b in range(4):
            slot = np.clip(starts[b] + 6 - 2, 0, ep_len[rows[b]] - 1)
            for j in range(BAG):
                w = buf_idx[rows[b], slot, j]
                if w >= 0:
                    np.testing.assert_allclose(
                        np.asarray(batch.bag_obs)[b, j],
                        buf_obs[rows[b], w],
                    )
                else:
                    assert (np.asarray(batch.bag_obs)[b, j] == env.obs_mask).all()
        # And the learn step consumes them without error.
        state2 = agent.learn(state, jax.random.key(123))
        assert int(state2.train_steps) >= int(state.train_steps)

    def test_checkpoint_roundtrip_with_bag_store(self, tmp_path):
        from dtqn_tpu.utils import checkpoint as ckpt

        env, agent = self._agent()
        state = agent.init_state(jax.random.key(0))
        step = jax.jit(lambda s, k: env_step(agent, s, k))
        for i in range(40):
            state = step(state, jax.random.key(i))
        path = str(tmp_path / "run")
        ckpt.save_checkpoint(path, state)
        template = agent.init_state(jax.random.key(1))
        restored, _ = ckpt.load_checkpoint(path, template)
        np.testing.assert_array_equal(
            np.asarray(restored.buffer.bag_idx),
            np.asarray(state.buffer.bag_idx),
        )
        np.testing.assert_array_equal(
            np.asarray(restored.bag.obs_idx), np.asarray(state.bag.obs_idx)
        )
