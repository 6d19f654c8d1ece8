"""Rolling per-episode history window (Context) as pure array ops.

Parity with `/root/reference/utils/context.py:8-111`, vectorized over env
instances and kept entirely on device:
  - obs padded with ``obs_mask``; **actions initialized to random ints**
    (context.py:50, a deliberate reference quirk), rewards 0, dones True
  - ``add_transition`` rolls left when full and surfaces the evicted
    (obs, action) pair for the persistent-memory bag (context.py:56-80)
  - ``timestep`` counts transitions; ``is_full`` when timestep >= length

All functions take/return a ``ContextState`` whose leading axis is the
vectorized env dimension.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ContextState:
    obs: jax.Array  # [E, L, *obs_shape]
    action: jax.Array  # [E, L] int32
    reward: jax.Array  # [E, L] float32
    done: jax.Array  # [E, L] bool
    timestep: jax.Array  # [E] int32

    @property
    def context_len(self) -> int:
        return self.obs.shape[1]

    @property
    def last_index(self) -> jax.Array:
        """Row holding the newest observation: min(timestep, L-1)."""
        return jnp.minimum(self.timestep, self.context_len - 1)


def init_context(
    key: jax.Array,
    num_envs: int,
    context_len: int,
    obs_shape: Tuple[int, ...],
    obs_dtype,
    obs_mask: float,
    num_actions: int,
    first_obs: jax.Array,
) -> ContextState:
    """Fresh contexts seeded with each env's first observation
    (context.py:36-54)."""
    obs = jnp.full((num_envs, context_len, *obs_shape), obs_mask, obs_dtype)
    obs = obs.at[:, 0].set(first_obs.astype(obs_dtype))
    action = jax.random.randint(
        key, (num_envs, context_len), 0, num_actions, jnp.int32
    )
    return ContextState(
        obs=obs,
        action=action,
        reward=jnp.zeros((num_envs, context_len), jnp.float32),
        done=jnp.ones((num_envs, context_len), bool),
        timestep=jnp.zeros((num_envs,), jnp.int32),
    )


def reset_context(
    ctx: ContextState,
    key: jax.Array,
    first_obs: jax.Array,
    reset_mask: jax.Array,
    obs_mask: float,
    num_actions: int,
) -> ContextState:
    """Reset the envs selected by ``reset_mask`` (bool [E]) in place."""
    fresh = init_context(
        key,
        ctx.obs.shape[0],
        ctx.context_len,
        ctx.obs.shape[2:],
        ctx.obs.dtype,
        obs_mask,
        num_actions,
        first_obs,
    )

    def pick(new, old):
        cond = reset_mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(cond, new, old)

    return jax.tree_util.tree_map(pick, fresh, ctx)


def add_transition(
    ctx: ContextState,
    obs: jax.Array,
    action: jax.Array,
    reward: jax.Array,
    done: jax.Array,
) -> Tuple[ContextState, jax.Array, jax.Array, jax.Array]:
    """Append one transition per env; returns (ctx, evicted_obs,
    evicted_action, was_full).

    Matches context.py:56-80: increment timestep, roll left when the (new)
    timestep has reached capacity, write at min(timestep, L-1); when full,
    the pre-overwrite slot content (the evicted oldest entry) is returned.
    """
    length = ctx.context_len
    timestep = ctx.timestep + 1
    full = timestep >= length  # roll condition (context.py:94-96)

    def roll_if_full(arr):
        cond = full.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(cond, jnp.roll(arr, -1, axis=1), arr)

    obs_arr = roll_if_full(ctx.obs)
    act_arr = roll_if_full(ctx.action)
    rew_arr = roll_if_full(ctx.reward)
    done_arr = roll_if_full(ctx.done)

    t = jnp.minimum(timestep, length - 1)  # [E]
    e_idx = jnp.arange(ctx.obs.shape[0])

    # After the roll, slot t holds the would-be-evicted oldest entry.
    evicted_obs = obs_arr[e_idx, t]
    evicted_action = act_arr[e_idx, t]

    new_ctx = ContextState(
        obs=obs_arr.at[e_idx, t].set(obs.astype(ctx.obs.dtype)),
        action=act_arr.at[e_idx, t].set(action.astype(jnp.int32)),
        reward=rew_arr.at[e_idx, t].set(reward.astype(jnp.float32)),
        done=done_arr.at[e_idx, t].set(done.astype(bool)),
        timestep=timestep,
    )
    return new_ctx, evicted_obs, evicted_action, full
