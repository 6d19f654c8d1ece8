"""Weight initialization matching the reference.

The reference initializes every Linear/Embedding/MultiheadAttention weight
with N(0, 0.02), biases with zeros, and LayerNorm with (1, 0)
(`/root/reference/utils/torch_utils.py:4-15`).
"""

import jax.numpy as jnp
from flax import linen as nn

WEIGHT_INIT_STD = 0.02


def dense_init():
    return nn.initializers.normal(stddev=WEIGHT_INIT_STD)


def embed_init():
    return nn.initializers.normal(stddev=WEIGHT_INIT_STD)


def bias_init():
    return nn.initializers.zeros_init()


def make_dense(features: int, use_bias: bool = True, name=None, dtype=None):
    """Dense layer with the reference's N(0, 0.02)/zeros init."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=dense_init(),
        bias_init=bias_init(),
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )
