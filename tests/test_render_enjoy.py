"""Enjoy-mode rendering: CarFlag frame raster + episode strip artifact.

The reference's enjoy mode opens an interactive pyglet window
(`/root/reference/run.py:463-467`, `envs/car_flag.py:135-271`); here the
equivalent is a headless numpy raster per step saved as one PNG strip
next to the policy.
"""

import os

import jax
import numpy as np

from dtqn_tpu.config import get_args
from dtqn_tpu.envs import make_env


def test_render_frame_raster():
    env = make_env("DiscreteCarFlag-v0")
    obs, state = env.reset_env(jax.random.PRNGKey(0))
    img = env.render_frame(state)
    assert img.shape == (80, 400, 3) and img.dtype == np.uint8
    # car (near-black) and both flags (green + red) are drawn
    flat = img.reshape(-1, 3)
    assert (flat == (25, 25, 25)).all(axis=1).any()
    assert (flat == (40, 160, 60)).all(axis=1).any()
    assert (flat == (200, 50, 50)).all(axis=1).any()


def test_enjoy_saves_episode_strip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = get_args(
        [
            "--envs", "DiscreteCarFlag-v0", "--in-embed", "8", "--heads",
            "2", "--layers", "1", "--disable-wandb", "--render",
            "--save-policy",
        ]
    )
    from dtqn_tpu.agents import Agent
    from dtqn_tpu.utils import checkpoint as ckpt

    env = make_env("DiscreteCarFlag-v0")
    agent = Agent(cfg.agent_config(), env)
    state = agent.init_state(jax.random.PRNGKey(0))
    os.makedirs(cfg.policy_dir(), exist_ok=True)
    ckpt.save_policy(cfg.policy_path(), state.params)

    from dtqn_tpu.train.runner import run_experiment

    out = run_experiment(cfg)
    assert "success_rate" in out
    assert out.get("render_path") and os.path.exists(out["render_path"])
    from PIL import Image

    strip = np.asarray(Image.open(out["render_path"]))
    assert strip.shape[1] == 400 and strip.shape[0] % 80 == 0
