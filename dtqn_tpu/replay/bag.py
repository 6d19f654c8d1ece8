"""Persistent-memory Bag as pure array ops, vectorized over envs.

Parity with `/root/reference/utils/bag.py:6-55`: a fixed-size store of
(obs, action) pairs evicted from the context, mask-padded, with an ``add``
that rejects when full (the Q-driven eviction policy lives in the DTQN agent,
`dtqn/agents/dtqn.py:125-157`).

Beyond parity, each slot also tracks ``obs_idx`` — the episode observation
index its entry was evicted from (-1 = empty).  This costs one tiny int
array and is what lets ``--bag-store`` record the exact act-time bag into
replay as indices instead of duplicated observations (replay/buffer.py
``store_act_bag``), closing the reference's train/act bag-distribution
mismatch (training bags are uniform random pre-window subsets,
`replay_buffer.py:171-264`, while act-time bags come from the greedy
eviction policy, `dtqn/agents/dtqn.py:125-157`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BagState:
    obs: jax.Array  # [E, bag_size, *obs_shape]
    action: jax.Array  # [E, bag_size] int32
    obs_idx: jax.Array  # [E, bag_size] int32 — episode obs index, -1 empty
    pos: jax.Array  # [E] int32

    @property
    def size(self) -> int:
        return self.obs.shape[1]

    @property
    def is_full(self) -> jax.Array:
        return self.pos >= self.size


def init_bag(
    num_envs: int,
    bag_size: int,
    obs_shape: Tuple[int, ...],
    obs_dtype,
    obs_mask: float,
) -> BagState:
    return BagState(
        obs=jnp.full((num_envs, bag_size, *obs_shape), obs_mask, obs_dtype),
        action=jnp.zeros((num_envs, bag_size), jnp.int32),
        obs_idx=jnp.full((num_envs, bag_size), -1, jnp.int32),
        pos=jnp.zeros((num_envs,), jnp.int32),
    )


def reset_bag(bag: BagState, reset_mask: jax.Array, obs_mask: float) -> BagState:
    """Empty the bags of envs selected by ``reset_mask`` (bag.py:24-26)."""
    fresh = init_bag(
        bag.obs.shape[0], bag.size, bag.obs.shape[2:], bag.obs.dtype, obs_mask
    )

    def pick(new, old):
        cond = reset_mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(cond, new, old)

    return jax.tree_util.tree_map(pick, fresh, bag)


def bag_add(
    bag: BagState,
    obs: jax.Array,
    action: jax.Array,
    obs_idx: jax.Array,
    add_mask: jax.Array,
) -> Tuple[BagState, jax.Array]:
    """Try to append (obs, action) for envs where ``add_mask``; rejected when
    full (bag.py:28-36).  ``obs_idx`` is the evicted entry's episode
    observation index.  Returns (bag, accepted bool [E])."""
    accept = jnp.logical_and(add_mask, jnp.logical_not(bag.is_full))
    e_idx = jnp.arange(bag.obs.shape[0])
    slot = jnp.minimum(bag.pos, bag.size - 1)

    def put(arr, val):
        cur = arr[e_idx, slot]
        cond = accept.reshape((-1,) + (1,) * (cur.ndim - 1))
        return arr.at[e_idx, slot].set(
            jnp.where(cond, val.astype(arr.dtype), cur)
        )

    return (
        BagState(
            obs=put(bag.obs, obs),
            action=put(bag.action, action),
            obs_idx=put(bag.obs_idx, obs_idx),
            pos=bag.pos + accept.astype(jnp.int32),
        ),
        accept,
    )
