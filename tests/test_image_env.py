"""Image-observation pipeline tests: ImageMaze env + CNN embedder + DTQN
end-to-end (the reference's MiniHack pixel-mode capability, CHW uint8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.envs.image_maze import ImageMaze
from dtqn_tpu.train.loop import make_evaluate, make_prepopulate, make_train_chunk
from dtqn_tpu.utils.epsilon import EpsilonSchedule


class TestImageMaze:
    def test_obs_is_chw_uint8(self):
        env = ImageMaze(size=9)
        obs, st = env.reset_env(jax.random.key(0))
        assert obs.shape == (3, 9, 9) and obs.dtype == jnp.uint8
        # Border walls lit within light radius appear in channel 0.
        assert int(obs[2].max()) == 255  # agent channel always drawn

    def test_goal_hidden_when_far(self):
        env = ImageMaze(size=9, light_radius=2)
        _, st = env.reset_env(jax.random.key(1))
        # Place agent far from goal: corner opposite.
        far = jnp.where(st.goal < 4, 7, 1).astype(jnp.int32)
        st = st.replace(pos=far)
        obs = env._render(st)
        assert int(obs[1].sum()) == 0  # goal channel dark
        near = st.goal + jnp.array([1, 0])
        st2 = st.replace(pos=jnp.clip(near, 1, 7))
        obs2 = env._render(st2)
        assert int(obs2[1].max()) == 255  # goal visible next to it

    def test_reach_goal_terminates(self):
        env = ImageMaze(size=9)
        _, st = env.reset_env(jax.random.key(2))
        # Teleport next to goal and step onto it (choose a free neighbor).
        for d, a in (((-1, 0), 2), ((1, 0), 0), ((0, -1), 1), ((0, 1), 3)):
            nb = st.goal + jnp.array(d)
            ok = (
                (0 < int(nb[0]) < 8)
                and (0 < int(nb[1]) < 8)
                and not bool(st.walls[nb[0], nb[1]])
            )
            if ok:
                st = st.replace(pos=nb.astype(jnp.int32))
                _, st2, r, term, info = env.step_env(
                    jax.random.key(3), st, jnp.int32(a)
                )
                assert bool(term) and float(r) == 1.0
                assert bool(info["is_success"])
                return
        pytest.fail("no free neighbor next to goal")

    def test_registry(self):
        env = make_env("ImageMaze-9-v0")
        assert env.obs_shape == (3, 9, 9)


class TestImageTraining:
    def test_dtqn_image_pipeline_end_to_end(self):
        env = ImageMaze(size=9, max_episode_steps=15)
        cfg = AgentConfig(
            model="DTQN", num_envs=4, context_len=6, history=6,
            inner_embed=32, num_heads=2, num_layers=1, buffer_size=600,
            batch_size=2, target_update_frequency=10,
        )
        agent = Agent(cfg, env)
        state = agent.init_state(jax.random.key(0))
        state = make_prepopulate(agent, 40)(state)
        chunk = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 100), 1, 3
        )
        state = chunk(state)
        assert int(state.train_steps) == 3
        assert int(state.nonfinite_grads) == 0
        sr, ret, ln = make_evaluate(agent, env, 2)(
            state.params, jax.random.key(1)
        )
        assert 0.0 <= float(sr) <= 1.0


def test_minihack_gated():
    from dtqn_tpu.envs.minihack import MH_SPECS, HostMiniHack, minihack_available

    # All 20 reference MH- registrations covered (18 standard variants +
    # the custom des-file maze pair, /root/reference/envs/__init__.py:55-211).
    assert len(MH_SPECS) == 20
    if not minihack_available():
        with pytest.raises(ImportError, match="minihack"):
            HostMiniHack("MH-Room-5-v0")
    with pytest.raises(KeyError):
        HostMiniHack("MH-Nope-v0")
