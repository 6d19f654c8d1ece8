"""Core environment API: pure-function POMDPs with fixed shapes.

The reference (kevslinger/DTQN) steps one stateful gym env per Python loop
iteration (`run.py:356-377`).  The TPU-native inversion is an environment as a
pure function over an explicit state pytree so thousands of instances can run
in lockstep under ``jax.vmap`` inside a jitted training step.

Reference API being replaced (capability parity, not a port):
  - gym ``Env.reset() -> obs`` / ``step(a) -> (obs, r, done, info)``
  - ``gym.wrappers.TimeLimit`` truncation, and run.py's truncation-vs-done
    distinction for the replay buffer (`run.py:371-374`)
  - env introspection: obs type/length/mask/max-steps
    (`utils/env_processing.py:59-131`)
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class ObsKind(enum.Enum):
    """Mirrors the reference's ObsType enum (utils/env_processing.py:59-62)."""

    DISCRETE = 0
    CONTINUOUS = 1
    IMAGE = 2


@struct.dataclass
class Timestep:
    """One environment transition, all fixed-shape device arrays.

    ``terminated`` is a true environment termination; ``truncated`` is a
    time-limit cut.  ``done = terminated | truncated`` drives episode resets,
    while only ``terminated`` is stored as `done` in the replay buffer —
    matching the reference's TimeLimit.truncated handling (run.py:371-374).
    """

    obs: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    info: Dict[str, jax.Array]

    @property
    def done(self) -> jax.Array:
        return jnp.logical_or(self.terminated, self.truncated)


class Environment:
    """Base class for pure-function environments.

    Subclasses implement ``reset_env`` and ``step_env`` as pure functions of
    (key, state[, action]).  Time-limit accounting is layered on here so every
    env gets gym-TimeLimit-equivalent truncation semantics for free.

    Static metadata (shapes, dtypes, masks) mirrors what the reference infers
    at runtime from gym spaces (utils/env_processing.py:65-131); here it is
    part of the environment definition because jit needs it statically.
    """

    # ---- static metadata (override in subclasses) ----
    name: str = "Environment"
    num_actions: int = 0
    max_episode_steps: int = 0
    obs_kind: ObsKind = ObsKind.DISCRETE
    obs_shape: Tuple[int, ...] = ()
    obs_dtype: Any = jnp.int32

    @property
    def obs_length(self) -> int:
        """Flat observation length (env_processing.get_env_obs_length:84-97)."""
        if self.obs_kind == ObsKind.IMAGE:
            raise ValueError("image obs use obs_shape, not obs_length")
        return int(self.obs_shape[0]) if self.obs_shape else 1

    @property
    def obs_mask(self) -> float:
        """Padding sentinel for unseen observations.

        Discrete: one past the largest legal token (env_processing.py:100-116
        uses Discrete.n or max(nvec)+1).  Continuous: -5.0 sentinel below any
        real observation.  Image: 0.
        """
        raise NotImplementedError

    @property
    def obs_vocab_size(self) -> int:
        """Discrete token vocabulary including the mask token (= mask + 1)."""
        if self.obs_kind != ObsKind.DISCRETE:
            raise ValueError("vocab size only defined for discrete obs")
        return int(self.obs_mask) + 1

    @property
    def is_discrete(self) -> bool:
        return self.obs_kind == ObsKind.DISCRETE

    # ---- pure-function dynamics (override in subclasses) ----
    def reset_env(self, key: jax.Array) -> Tuple[jax.Array, Any]:
        """Returns (obs, state) for a fresh episode."""
        raise NotImplementedError

    def step_env(
        self, key: jax.Array, state: Any, action: jax.Array
    ) -> Tuple[jax.Array, Any, jax.Array, jax.Array, Dict[str, jax.Array]]:
        """Returns (obs, state, reward, terminated, info) — no time limit."""
        raise NotImplementedError

    # ---- public API with time-limit + auto-reset ----
    def reset(self, key: jax.Array) -> Tuple[jax.Array, Any]:
        return self.reset_env(key)

    def step(
        self, key: jax.Array, state: Any, action: jax.Array
    ) -> Tuple[jax.Array, Any, Timestep]:
        """Steps the env, applying the time limit; no auto-reset.

        The state pytree must carry an integer ``t`` field counting steps
        taken this episode (subclasses include it in their state dataclass).
        """
        obs, new_state, reward, terminated, info = self.step_env(
            key, state, action
        )
        truncated = jnp.logical_and(
            new_state.t >= self.max_episode_steps, jnp.logical_not(terminated)
        )
        ts = Timestep(
            obs=obs,
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(terminated, bool),
            truncated=jnp.asarray(truncated, bool),
            info=info,
        )
        return obs, new_state, ts

    def step_autoreset(
        self, key: jax.Array, state: Any, action: jax.Array
    ) -> Tuple[jax.Array, Any, Timestep]:
        """Steps the env and resets in place when the episode ends.

        On done, the returned obs/state are the fresh episode's; the Timestep
        still reports the finished step's reward/flags, so the caller can
        record the transition before switching context — the vectorized analog
        of run.py:291-296.
        """
        key_step, key_reset = jax.random.split(key)
        obs, new_state, ts = self.step(key_step, state, action)
        reset_obs, reset_state = self.reset_env(key_reset)
        done = ts.done

        def pick(on_done, on_cont):
            cond = jnp.reshape(done, (1,) * jnp.ndim(on_cont))
            return jnp.where(cond, on_done, on_cont)

        out_obs = pick(reset_obs, obs)
        out_state = jax.tree_util.tree_map(pick, reset_state, new_state)
        return out_obs, out_state, ts

    # ---- convenience: vectorized entry points ----
    def reset_vec(self, keys: jax.Array) -> Tuple[jax.Array, Any]:
        return jax.vmap(self.reset)(keys)

    def step_vec(
        self, keys: jax.Array, states: Any, actions: jax.Array
    ) -> Tuple[jax.Array, Any, Timestep]:
        return jax.vmap(self.step_autoreset)(keys, states, actions)
