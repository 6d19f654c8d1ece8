"""Position encodings: learned / sinusoidal / none.

Parity with `/root/reference/dtqn/networks/position_encodings.py:8-51`:
learned = trainable zeros [1, L, D]; sin = standard fixed sinusoid; none =
frozen zeros.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PosKind(str, enum.Enum):
    LEARNED = "learned"
    SIN = "sin"
    NONE = "none"


def sinusoidal_table(context_len: int, embed_dim: int) -> np.ndarray:
    """Fixed sinusoid (position_encodings.py:22-35)."""
    position = np.arange(context_len)[:, None].astype(np.float32)
    div_term = np.exp(
        np.arange(0, embed_dim, 2).astype(np.float32)
        * (-np.log(10000.0) / embed_dim)
    )
    table = np.zeros((1, context_len, embed_dim), np.float32)
    table[0, :, 0::2] = np.sin(position * div_term)
    table[0, :, 1::2] = np.cos(position * div_term)
    return table


class PositionEncoding(nn.Module):
    kind: PosKind
    context_len: int
    embed_dim: int

    @nn.compact
    def __call__(self) -> jax.Array:
        shape = (1, self.context_len, self.embed_dim)
        if self.kind == PosKind.LEARNED:
            return self.param("embedding", nn.initializers.zeros_init(), shape)
        if self.kind == PosKind.SIN:
            return jnp.asarray(sinusoidal_table(self.context_len, self.embed_dim))
        return jnp.zeros(shape, jnp.float32)
