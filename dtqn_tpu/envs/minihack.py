"""MiniHack adapter (gated on the external ``minihack`` package).

The reference registers 18 MiniHack variants (`/root/reference/envs/
__init__.py:53-211`) through ``MiniHackWrapper`` (`envs/mini_hack.py`):
glyph mode flattens the ``glyphs_crop`` window into a MultiDiscrete vector,
pixel mode reshapes ``pixel_crop`` HWC -> CHW uint8.  MiniHack is a C-backed
external dependency (NetHack); it cannot be a pure JAX function, so this
adapter runs it host-side behind ``jax.pure_callback``-free stepping: the
training loop needs pure device functions, so MiniHack domains are exposed
through the HOST-LOOP runner path only (see ``HostEnvironment``), matching
the reference's single-env stepping for these domains.

When ``minihack`` is not installed, construction raises with the same
guidance the reference prints (envs/__init__.py:20-24).  The in-repo pixel
domain ``ImageMaze`` covers the image pipeline natively.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

MH_SPECS = {
    # name -> (minihack env id, obs_type, obs_crop, max_episode_steps)
    "MH-Room-5-v0": ("MiniHack-Room-5x5-v0", "glyphs_crop", 9, 100),
    "MH-Room-5-v1": ("MiniHack-Room-5x5-v0", "glyphs_crop", 3, 100),
    "MH-Room-5-v2": ("MiniHack-Room-5x5-v0", "pixel_crop", 9, 100),
    "MH-DarkRoom-5-v0": ("MiniHack-Room-Dark-5x5-v0", "glyphs_crop", 9, 100),
    "MH-DarkRoom-5-v1": ("MiniHack-Room-Dark-5x5-v0", "glyphs_crop", 3, 100),
    "MH-DarkRoom-5-v2": ("MiniHack-Room-Dark-5x5-v0", "pixel_crop", 9, 100),
    "MH-Room-15-v0": ("MiniHack-Room-15x15-v0", "glyphs_crop", 9, 300),
    "MH-Room-15-v1": ("MiniHack-Room-15x15-v0", "glyphs_crop", 3, 300),
    "MH-Room-15-v2": ("MiniHack-Room-15x15-v0", "pixel_crop", 9, 300),
    "MH-DarkRoom-15-v0": ("MiniHack-Room-Dark-15x15-v0", "glyphs_crop", 9, 300),
    "MH-DarkRoom-15-v1": ("MiniHack-Room-Dark-15x15-v0", "glyphs_crop", 3, 300),
    "MH-DarkRoom-15-v2": ("MiniHack-Room-Dark-15x15-v0", "pixel_crop", 9, 300),
    "MH-Maze-9-v0": ("MiniHack-MazeWalk-9x9-v0", "glyphs_crop", 9, 180),
    "MH-Maze-9-v1": ("MiniHack-MazeWalk-9x9-v0", "glyphs_crop", 3, 180),
    "MH-Maze-9-v2": ("MiniHack-MazeWalk-9x9-v0", "pixel_crop", 9, 180),
    "MH-MazeMap-9-v0": ("MiniHack-MazeWalk-Mapped-9x9-v0", "glyphs_crop", 9, 180),
    "MH-MazeMap-9-v1": ("MiniHack-MazeWalk-Mapped-9x9-v0", "glyphs_crop", 3, 180),
    "MH-MazeMap-9-v2": ("MiniHack-MazeWalk-9x9-v0", "pixel_crop", 9, 180),
}


def minihack_available() -> bool:
    try:
        import minihack  # noqa: F401

        return True
    except ImportError:
        return False


class HostMiniHack:
    """Host-side MiniHack env with the reference wrapper's obs conventions.

    Not a pure-function Environment: step/reset run NetHack C code on the
    host.  Usable for evaluation or host-loop data collection.
    """

    def __init__(self, name: str):
        if name not in MH_SPECS:
            raise KeyError(f"Unknown MiniHack domain {name!r}")
        if not minihack_available():
            raise ImportError(
                "``minihack`` is not installed. This means you cannot run "
                "an experiment with any of the MH- domains. "
                "(reference envs/__init__.py:20-24)"
            )
        import gym  # minihack requires gym
        import minihack  # noqa: F401

        env_id, obs_type, obs_crop, max_steps = MH_SPECS[name]
        self.env = gym.make(
            env_id,
            observation_keys=(obs_type,),
            obs_crop_h=obs_crop,
            obs_crop_w=obs_crop,
        )
        self.obs_type = obs_type
        self.max_episode_steps = max_steps
        self.name = name

    def _convert(self, obs) -> np.ndarray:
        o = obs[self.obs_type]
        if self.obs_type == "glyphs_crop":
            return o.flatten()
        return o.reshape(o.shape[2], o.shape[0], o.shape[1])  # HWC -> CHW

    def reset(self) -> np.ndarray:
        return self._convert(self.env.reset())

    def step(self, action) -> Tuple[np.ndarray, float, bool, dict]:
        obs, reward, done, info = self.env.step(int(action))
        return self._convert(obs), reward, done, info
