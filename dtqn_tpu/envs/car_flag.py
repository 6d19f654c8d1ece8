"""Car Flag: 1-D car must drive to heaven, avoiding hell.

Capability-parity reimplementation of the reference env
(`/root/reference/envs/car_flag.py:18-159`) as a pure JAX function.  Dynamics:
a car on [-1.1, 1.1] with velocity clamped to ±0.07 accelerates with force
±0.0015; heaven is randomly at +1 or -1 each episode (hell opposite); a priest
near x=0.5 (±0.2) reveals heaven's direction in the 3rd obs component.
Reward +1 at heaven, -1 at hell, episode ends at either (car_flag.py:98-117).

Obs = [position, velocity, priest_hint] (car_flag.py:119-131).
Discrete actions {0,1,2} -> force {-1,0,1} (car_flag.py:79-81); the
continuous variant takes a Box(1) force clipped to [-1, 1]
(car_flag.py:58-63,82-83).  The reference registers only the discrete env
(its Q agents need discrete actions); the continuous mode is provided for
capability parity and scripted/external policies.
Registered with a 200-step time limit (envs/__init__.py:42-47).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dtqn_tpu.envs.core import Environment, ObsKind


@struct.dataclass
class CarFlagState:
    position: jax.Array  # f32 scalar
    velocity: jax.Array  # f32 scalar
    heaven: jax.Array  # f32 scalar, +1.0 or -1.0
    t: jax.Array  # i32 scalar, steps taken this episode


class CarFlag(Environment):
    """Car Flag; ``discrete=False`` switches to Box(1) force actions."""

    name = "DiscreteCarFlag-v0"
    num_actions = 3
    max_episode_steps = 200
    obs_kind = ObsKind.CONTINUOUS
    obs_shape = (3,)
    obs_dtype = jnp.float32

    max_position = 1.1
    max_speed = 0.07
    power = 0.0015
    priest_position = 0.5
    priest_delta = 0.2
    goal_position = 1.0  # |heaven| = |hell| = 1.0

    def __init__(self, discrete: bool = True):
        self.discrete = discrete
        if not discrete:
            # Box(-1, 1, (1,)) actions (car_flag.py:58-63); num_actions=0
            # marks the env unusable by the (discrete) Q agents, like the
            # reference, which never registers this mode.
            self.name = "CarFlag-continuous-v0"
            self.num_actions = 0

    @property
    def obs_mask(self) -> float:
        # Continuous-obs padding sentinel (env_processing.py:110-116): below
        # the minimum possible observation (-1.1) so the net can tell padding.
        return -5.0

    def _observe(self, state: CarFlagState) -> jax.Array:
        near_priest = jnp.logical_and(
            state.position >= self.priest_position - self.priest_delta,
            state.position <= self.priest_position + self.priest_delta,
        )
        # Heaven at +1 => hint +1 (heaven right); at -1 => hint -1.
        hint = jnp.where(near_priest, state.heaven, 0.0)
        return jnp.stack(
            [state.position, state.velocity, hint]
        ).astype(jnp.float32)

    def render_frame(self, state: CarFlagState):
        """Headless RGB raster of the track — the reference's pyglet
        window (car_flag.py:135-271: car, heaven/hell flags, priest zone)
        replaced by a numpy image, composable into enjoy-mode episode
        strips without a display server.  Returns uint8 [80, 400, 3]."""
        import numpy as np

        H, W = 80, 400
        img = np.full((H, W, 3), 255, np.uint8)

        def x2px(x):
            span = 2 * self.max_position
            return int(
                np.clip((float(x) + self.max_position) / span, 0, 1)
                * (W - 1)
            )

        img[60:62, :] = 160  # track
        a = x2px(self.priest_position - self.priest_delta)
        b = x2px(self.priest_position + self.priest_delta)
        img[62:68, a:b] = (230, 210, 80)  # priest zone
        heaven = float(state.heaven)
        hx = x2px(heaven * self.goal_position)
        lx = x2px(-heaven * self.goal_position)
        img[16:60, hx - 2 : hx + 2] = (40, 160, 60)  # heaven flag
        img[16:60, lx - 2 : lx + 2] = (200, 50, 50)  # hell flag
        cx = x2px(state.position)
        img[46:60, max(cx - 5, 0) : cx + 5] = (25, 25, 25)  # car
        return img

    def reset_env(self, key: jax.Array) -> Tuple[jax.Array, CarFlagState]:
        key_side, key_pos = jax.random.split(key)
        heaven = jnp.where(
            jax.random.bernoulli(key_side), jnp.float32(-1.0), jnp.float32(1.0)
        )
        position = jax.random.uniform(
            key_pos, (), jnp.float32, minval=-0.2, maxval=0.2
        )
        state = CarFlagState(
            position=position,
            velocity=jnp.float32(0.0),
            heaven=heaven,
            t=jnp.int32(0),
        )
        # Initial hint is 0 in the reference (car_flag.py:158), and the start
        # position never reaches the priest zone, so _observe matches.
        return self._observe(state), state

    def step_env(
        self, key: jax.Array, state: CarFlagState, action: jax.Array
    ) -> Tuple[jax.Array, CarFlagState, jax.Array, jax.Array, Dict[str, jax.Array]]:
        del key  # dynamics are deterministic
        if self.discrete:
            # 0 is -1, 1 is 0, 2 is 1 (car_flag.py:79-81)
            force = jnp.asarray(action, jnp.float32) - 1.0
        else:
            # Box action clipped to [-1, 1] (car_flag.py:82-83)
            force = jnp.clip(
                jnp.asarray(action, jnp.float32).reshape(()), -1.0, 1.0
            )
        velocity = jnp.clip(
            state.velocity + force * self.power, -self.max_speed, self.max_speed
        )
        position = jnp.clip(
            state.position + velocity, -self.max_position, self.max_position
        )
        # Left wall is sticky: hitting the min position zeroes negative
        # velocity (car_flag.py:95-96).
        velocity = jnp.where(
            jnp.logical_and(position == -self.max_position, velocity < 0),
            0.0,
            velocity,
        )

        at_plus = position >= self.goal_position
        at_minus = position <= -self.goal_position
        terminated = jnp.logical_or(at_plus, at_minus)
        heaven_right = state.heaven > 0
        reward = jnp.where(
            at_plus,
            jnp.where(heaven_right, 1.0, -1.0),
            jnp.where(at_minus, jnp.where(heaven_right, -1.0, 1.0), 0.0),
        ).astype(jnp.float32)

        new_state = state.replace(
            position=position, velocity=velocity, t=state.t + 1
        )
        info = {"is_success": reward > 0}
        return self._observe(new_state), new_state, reward, terminated, info
