"""Combine gates after attention/FFN submodules.

Parity with `/root/reference/dtqn/networks/gates.py`: ``ResGate`` is a plain
residual add (gates.py:34-41); ``GRUGate`` is the GTrXL gating with the w_z
bias initialized to -2 (gates.py:5-31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dtqn_tpu.models.init import dense_init


class ResGate(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return x + y


class GRUGate(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        dense = lambda name, use_bias=False, b_init=None: nn.Dense(
            self.features,
            use_bias=use_bias,
            kernel_init=dense_init(),
            bias_init=b_init or nn.initializers.zeros_init(),
            param_dtype=jnp.float32,
            name=name,
        )
        w_z = dense(
            "w_z", use_bias=True, b_init=nn.initializers.constant(-2.0)
        )  # GTrXL bias (gates.py:22-24)
        z = nn.sigmoid(w_z(y) + dense("u_z")(x))
        r = nn.sigmoid(dense("w_r")(y) + dense("u_r")(x))
        h = nn.tanh(dense("w_g")(y) + dense("u_g")(r * x))
        return (1.0 - z) * x + z * h


def make_gate(kind: str, features: int) -> nn.Module:
    if kind == "gru":
        return GRUGate(features=features)
    if kind == "res":
        return ResGate()
    raise ValueError("Gate must be one of `gru`, `res`")
