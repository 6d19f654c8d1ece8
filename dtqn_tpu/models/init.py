"""Weight initialization matching the reference.

The reference initializes every Linear/Embedding/MultiheadAttention weight
with N(0, 0.02), biases with zeros, and LayerNorm with (1, 0)
(`/root/reference/utils/torch_utils.py:4-15`).
"""

import jax.numpy as jnp
from flax import linen as nn

WEIGHT_INIT_STD = 0.02

# Global compute dtype: parameters always live in float32; activations and
# matmuls run in this dtype (bfloat16 halves HBM traffic and doubles MXU
# throughput on TPU).  Set ONCE at startup, before any jit trace — like the
# attention backend selector, changing it later does not retrace existing
# compiled functions.
_COMPUTE_DTYPE = None  # None => float32


def set_compute_dtype(dtype) -> None:
    """Select the activation/matmul dtype ("bfloat16" / "float32" / None)."""
    global _COMPUTE_DTYPE
    if isinstance(dtype, str):
        dtype = None if dtype == "float32" else jnp.dtype(dtype)
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def dense_init():
    return nn.initializers.normal(stddev=WEIGHT_INIT_STD)


def embed_init():
    return nn.initializers.normal(stddev=WEIGHT_INIT_STD)


def bias_init():
    return nn.initializers.zeros_init()


def make_dense(features: int, use_bias: bool = True, name=None, dtype=None):
    """Dense layer with the reference's N(0, 0.02)/zeros init.

    Computes in the global compute dtype unless ``dtype`` overrides it;
    parameters are always float32.
    """
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=dense_init(),
        bias_init=bias_init(),
        name=name,
        dtype=dtype if dtype is not None else _COMPUTE_DTYPE,
        param_dtype=jnp.float32,
    )
