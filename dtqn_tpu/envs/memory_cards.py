"""Memory card (concentration) game as a pure JAX function.

Capability-parity reimplementation of the reference env
(`/root/reference/envs/memory_cards.py:8-116`).  N pairs of cards are dealt
face-down; each round one un-removed card is revealed at random and the agent
picks the card it believes is its pair-mate.  Correct pick removes the pair
(reward 0); wrong pick (including picking the revealed card itself or a
removed card) gives reward -1; the episode ends with success when all cards
are removed.

Token layout matches the reference's MultiDiscrete([num_pairs+2]*num_cards)
observation space (memory_cards.py:50-53): 0 = hidden, 1..num_pairs = card
value, num_pairs+1 = removed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dtqn_tpu.envs.core import Environment, ObsKind


@struct.dataclass
class MemoryState:
    values: jax.Array  # i32[num_cards], dealt card values (1..num_pairs)
    removed: jax.Array  # bool[num_cards]
    current_card: jax.Array  # i32 scalar, index of the revealed card
    t: jax.Array  # i32 scalar


class MemoryCards(Environment):
    """Memory-5-v0 style concentration game (num_pairs configurable)."""

    obs_kind = ObsKind.DISCRETE
    obs_dtype = jnp.int32

    def __init__(self, num_pairs: int = 5, max_episode_steps: int = 50):
        self.num_pairs = num_pairs
        self.num_cards = num_pairs * 2
        self.name = f"Memory-{num_pairs}-v0"
        self.num_actions = self.num_cards
        self.max_episode_steps = max_episode_steps
        self.obs_shape = (self.num_cards,)
        self.card_hidden = 0
        self.card_removed = num_pairs + 1

    @property
    def obs_mask(self) -> float:
        # MultiDiscrete mask = max(nvec) + 1 (env_processing.py:108-109);
        # nvec is uniformly num_pairs+2 so the mask token is num_pairs+2.
        return float(self.num_pairs + 2)

    def _observe(self, state: MemoryState) -> jax.Array:
        """obs[i] = removed if removed, value if revealed, else hidden."""
        idx = jnp.arange(self.num_cards)
        revealed = idx == state.current_card
        return jnp.where(
            state.removed,
            self.card_removed,
            jnp.where(revealed, state.values, self.card_hidden),
        ).astype(jnp.int32)

    def _reveal(self, key: jax.Array, removed: jax.Array) -> jax.Array:
        """Uniformly choose an un-removed card to reveal.

        The reference rejection-samples uniform card indices until one is not
        removed (memory_cards.py:110-113), which is exactly a uniform draw
        over un-removed cards — done here as one masked categorical.
        """
        logits = jnp.where(removed, -jnp.inf, 0.0)
        return jax.random.categorical(key, logits)

    def reset_env(self, key: jax.Array) -> Tuple[jax.Array, MemoryState]:
        key_shuffle, key_reveal = jax.random.split(key)
        values = jnp.repeat(jnp.arange(1, self.num_pairs + 1), 2)
        values = jax.random.permutation(key_shuffle, values).astype(jnp.int32)
        removed = jnp.zeros((self.num_cards,), bool)
        current = self._reveal(key_reveal, removed)
        state = MemoryState(
            values=values, removed=removed, current_card=current, t=jnp.int32(0)
        )
        return self._observe(state), state

    def step_env(
        self, key: jax.Array, state: MemoryState, action: jax.Array
    ) -> Tuple[jax.Array, MemoryState, jax.Array, jax.Array, Dict[str, jax.Array]]:
        action = jnp.asarray(action, jnp.int32)
        picked_current = action == state.current_card
        # A removed card keeps its dealt value in `values`, but pairs are
        # always removed together, so a removed card can never match the
        # revealed (un-removed) card's value — mirroring the reference where
        # state[action] of a removed card falls through to the wrong branch
        # (memory_cards.py:93-106).
        correct = jnp.logical_and(
            jnp.logical_not(picked_current),
            state.values[action] == state.values[state.current_card],
        )
        reward = jnp.where(correct, 0.0, -1.0).astype(jnp.float32)

        removed = jnp.where(
            correct,
            state.removed.at[action]
            .set(True)
            .at[state.current_card]
            .set(True),
            state.removed,
        )
        terminated = jnp.all(removed)
        # Reveal the next card only if the episode continues; keep the index
        # in range on the all-removed branch (it is masked out by `removed`).
        next_current = jnp.where(
            terminated,
            jnp.int32(0),
            self._reveal(key, jnp.where(terminated, jnp.zeros_like(removed), removed)),
        )
        new_state = MemoryState(
            values=state.values,
            removed=removed,
            current_card=next_current,
            t=state.t + 1,
        )
        obs = self._observe(
            new_state.replace(
                current_card=jnp.where(terminated, jnp.int32(-1), next_current)
            )
        )
        info = {"is_success": terminated}
        return obs, new_state, reward, terminated, info
