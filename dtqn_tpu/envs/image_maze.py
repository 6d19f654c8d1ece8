"""Image-observation grid maze: the in-repo pixel domain.

The reference's pixel-mode domains come from MiniHack (`MH-*-v2` variants,
`/root/reference/envs/__init__.py:53-211`, `envs/mini_hack.py:44-58`:
CHW uint8 Box observations through a 5-layer CNN).  MiniHack itself is an
external C-backed dependency that is not installable here, so dtqn_tpu
provides (a) the gated adapter in ``dtqn_tpu.envs.minihack`` for machines
that have it, and (b) this pure-JAX pixel maze exercising the identical
image pipeline: CHW uint8 obs -> CNN embedder -> DTQN.

Task: a dark NxN maze rendered as a C=3 channel image (walls / goal-when-
visible / agent); the goal is only drawn when the agent is within the
light radius, making the domain partially observable — remembering where
the goal was seen matters.  Reward +1 on reaching the goal, episode ends.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dtqn_tpu.envs.core import Environment, ObsKind

# numpy, not jnp: a module-level jnp constant initializes the XLA
# backend at import time, which breaks jax.distributed.initialize
# (must precede any backend use). Converted at the jit use sites.
DIRS = np.array([[-1, 0], [0, 1], [1, 0], [0, -1]], np.int32)  # N E S W


@struct.dataclass
class ImageMazeState:
    walls: jax.Array  # [N, N] bool
    goal: jax.Array  # [2] int32
    pos: jax.Array  # [2] int32
    t: jax.Array  # i32


class ImageMaze(Environment):
    """Pixel-observation maze (CHW uint8, like the MiniHack pixel mode)."""

    obs_kind = ObsKind.IMAGE
    obs_dtype = jnp.uint8
    num_actions = 4  # move N/E/S/W

    def __init__(self, size: int = 9, light_radius: int = 2,
                 max_episode_steps: int = 100):
        self.size = size
        self.light_radius = light_radius
        self.name = f"ImageMaze-{size}-v0"
        self.max_episode_steps = max_episode_steps
        self.obs_shape = (3, size, size)  # CHW like the reference wrapper

    @property
    def obs_mask(self) -> float:
        return 0.0  # image obs mask is 0 (env_processing.py:104-105)

    def _walls(self, key: jax.Array) -> jax.Array:
        n = self.size
        yy, xx = jnp.mgrid[0:n, 0:n]
        border = (yy == 0) | (xx == 0) | (yy == n - 1) | (xx == n - 1)
        # Sparse random pillars on even-even cells keep the maze connected.
        pillars = jnp.logical_and(yy % 2 == 0, xx % 2 == 0)
        keep = jax.random.bernoulli(key, 0.5, (n, n))
        return jnp.logical_or(border, jnp.logical_and(pillars, keep))

    def _render(self, state: ImageMazeState) -> jax.Array:
        n = self.size
        yy, xx = jnp.mgrid[0:n, 0:n]
        dist = jnp.maximum(
            jnp.abs(yy - state.pos[0]), jnp.abs(xx - state.pos[1])
        )
        lit = dist <= self.light_radius
        walls_ch = jnp.where(jnp.logical_and(state.walls, lit), 255, 0)
        goal_visible = lit[state.goal[0], state.goal[1]]
        goal_ch = jnp.zeros((n, n), jnp.int32).at[
            state.goal[0], state.goal[1]
        ].set(jnp.where(goal_visible, 255, 0))
        agent_ch = jnp.zeros((n, n), jnp.int32).at[
            state.pos[0], state.pos[1]
        ].set(255)
        return jnp.stack([walls_ch, goal_ch, agent_ch]).astype(jnp.uint8)

    def reset_env(self, key: jax.Array) -> Tuple[jax.Array, ImageMazeState]:
        k_walls, k_goal, k_pos = jax.random.split(key, 3)
        walls = self._walls(k_walls)
        free_logits = jnp.where(walls.reshape(-1), -jnp.inf, 0.0)
        goal_cell = jax.random.categorical(k_goal, free_logits)
        goal = jnp.stack([goal_cell // self.size, goal_cell % self.size])
        pos_logits = free_logits.at[goal_cell].set(-jnp.inf)
        pos_cell = jax.random.categorical(k_pos, pos_logits)
        pos = jnp.stack([pos_cell // self.size, pos_cell % self.size])
        state = ImageMazeState(
            walls=walls,
            goal=goal.astype(jnp.int32),
            pos=pos.astype(jnp.int32),
            t=jnp.int32(0),
        )
        return self._render(state), state

    def step_env(
        self, key: jax.Array, state: ImageMazeState, action: jax.Array
    ) -> Tuple[jax.Array, ImageMazeState, jax.Array, jax.Array, Dict[str, jax.Array]]:
        del key
        target = state.pos + jnp.asarray(DIRS)[jnp.asarray(action, jnp.int32)]
        ty = jnp.clip(target[0], 0, self.size - 1)
        tx = jnp.clip(target[1], 0, self.size - 1)
        blocked = state.walls[ty, tx]
        new_pos = jnp.where(blocked, state.pos, jnp.stack([ty, tx]))
        reached = jnp.all(new_pos == state.goal)
        reward = jnp.where(reached, 1.0, 0.0).astype(jnp.float32)
        new_state = state.replace(pos=new_pos, t=state.t + 1)
        info = {"is_success": reached}
        return self._render(new_state), new_state, reward, reached, info
