"""Epsilon-greedy exploration schedules.

Parity with `/root/reference/utils/epsilon_anneal.py`: ``Constant`` and the
multiplicative-decrement-to-min ``LinearAnneal`` (epsilon_anneal.py:33-34):
    val <- max(min, val - (val - min) / duration)
run.py uses LinearAnneal(1.0, 0.1, num_steps // 10) (run.py:420).

With E vectorized envs each iteration advances E env steps, so the schedule
exposes a closed-form k-step update:
    val_k = min + (val - min) * (1 - 1/duration)^k
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EpsilonSchedule:
    start: float = 1.0
    end: float = 0.1
    duration: int = 200_000  # number of single-step anneals

    def initial(self) -> jax.Array:
        return jnp.float32(self.start)

    def anneal(self, val: jax.Array, steps: int = 1) -> jax.Array:
        """Advance the schedule by ``steps`` env steps (closed form)."""
        if self.duration <= 0:
            return val
        decay = (1.0 - 1.0 / self.duration) ** steps
        return jnp.maximum(self.end, self.end + (val - self.end) * decay)


@dataclasses.dataclass(frozen=True)
class ConstantEpsilon(EpsilonSchedule):
    def anneal(self, val: jax.Array, steps: int = 1) -> jax.Array:
        return val
