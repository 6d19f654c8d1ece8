"""On-device windowed running averages.

Parity with `/root/reference/utils/logging_utils.py:10-24` (``RunningAverage``
over a deque of the last N values), kept as fixed-shape device arrays so the
training loop never syncs to host for diagnostics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningAverage:
    buf: jax.Array  # [window] float32
    idx: jax.Array  # i32 next write slot
    count: jax.Array  # i32 total values seen

    @classmethod
    def create(cls, window: int = 100) -> "RunningAverage":
        return cls(
            buf=jnp.zeros((window,), jnp.float32),
            idx=jnp.int32(0),
            count=jnp.int32(0),
        )

    def add(self, value: jax.Array) -> "RunningAverage":
        window = self.buf.shape[0]
        return self.replace(
            buf=self.buf.at[self.idx].set(jnp.asarray(value, jnp.float32)),
            idx=(self.idx + 1) % window,
            count=self.count + 1,
        )

    def add_if(self, pred: jax.Array, value: jax.Array) -> "RunningAverage":
        """Conditionally add (used when a train step was skipped)."""
        updated = self.add(value)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(pred, a, b), updated, self
        )

    def mean(self) -> jax.Array:
        window = self.buf.shape[0]
        n = jnp.minimum(self.count, window)
        return jnp.where(n > 0, self.buf.sum() / jnp.maximum(n, 1), 0.0)


@struct.dataclass
class TrainDiagnostics:
    """The 8 loss/Q diagnostics the reference logs (run.py:303-312)."""

    td_error: RunningAverage
    grad_norm: RunningAverage
    q_max: RunningAverage
    q_mean: RunningAverage
    q_min: RunningAverage
    target_max: RunningAverage
    target_mean: RunningAverage
    target_min: RunningAverage

    @classmethod
    def create(cls, window: int = 100) -> "TrainDiagnostics":
        return cls(*[RunningAverage.create(window) for _ in range(8)])

    def update(self, pred, *, td, gnorm, q, targets) -> "TrainDiagnostics":
        return TrainDiagnostics(
            td_error=self.td_error.add_if(pred, td),
            grad_norm=self.grad_norm.add_if(pred, gnorm),
            q_max=self.q_max.add_if(pred, q.max()),
            q_mean=self.q_mean.add_if(pred, q.mean()),
            q_min=self.q_min.add_if(pred, q.min()),
            target_max=self.target_max.add_if(pred, targets.max()),
            target_mean=self.target_mean.add_if(pred, targets.mean()),
            target_min=self.target_min.add_if(pred, targets.min()),
        )

    def means(self):
        return {
            "losses/TD_Error": self.td_error.mean(),
            "losses/Grad_Norm": self.grad_norm.mean(),
            "losses/Max_Q_Value": self.q_max.mean(),
            "losses/Mean_Q_Value": self.q_mean.mean(),
            "losses/Min_Q_Value": self.q_min.mean(),
            "losses/Max_Target_Value": self.target_max.mean(),
            "losses/Mean_Target_Value": self.target_mean.mean(),
            "losses/Min_Target_Value": self.target_min.mean(),
        }
