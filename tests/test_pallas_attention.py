"""Pallas fused attention vs the XLA reference path (interpret mode on CPU):
forward parity, gradient parity, causal + cross (kv-masked) modes, and the
network-level backend swap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.ops.attention import _xla_attention
from dtqn_tpu.ops.pallas_attention import pallas_attention_packed

B, L, H, D = 3, 50, 4, 16
E = H * D


def rand(shape, seed):
    return jax.random.normal(jax.random.key(seed), shape, jnp.float32)


def xla_packed(q, k, v, causal):
    b, lq, e = q.shape
    lk = k.shape[1]
    out = _xla_attention(
        q.reshape(b, lq, H, D),
        k.reshape(b, lk, H, D),
        v.reshape(b, lk, H, D),
        causal=causal,
    )
    return out.reshape(b, lq, e)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_xla(causal):
    q, k, v = rand((B, L, E), 0), rand((B, L, E), 1), rand((B, L, E), 2)
    ours = pallas_attention_packed(q, k, v, H, causal)
    ref = xla_packed(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_cross_attention_kv_shorter():
    # Bag cross-attention shape: queries L=50, keys = bag of 10.
    q = rand((B, L, E), 0)
    k, v = rand((B, 10, E), 1), rand((B, 10, E), 2)
    ours = pallas_attention_packed(q, k, v, H, False)
    ref = xla_packed(q, k, v, False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_gradients_match_xla(causal):
    q, k, v = rand((B, 12, E), 0), rand((B, 12, E), 1), rand((B, 12, E), 2)

    def loss_pallas(q, k, v):
        return jnp.sum(pallas_attention_packed(q, k, v, H, causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_packed(q, k, v, causal) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_unaligned_seq_lengths():
    # 50 rows is not a sublane multiple; Mosaic masks the padding.
    for lq, lk in [(50, 50), (7, 3), (1, 50)]:
        q = rand((2, lq, E), 3)
        k, v = rand((2, lk, E), 4), rand((2, lk, E), 5)
        out = pallas_attention_packed(q, k, v, H, False)
        ref = xla_packed(q, k, v, False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


def test_network_level_swap():
    """DTQN forward agrees between attention backends."""
    from dtqn_tpu.envs import make_env
    from dtqn_tpu.models import build_network
    from dtqn_tpu.ops import attention

    env = make_env("DiscreteCarFlag-v0")
    net = build_network("DTQN", env, inner_embed=32, num_heads=4,
                        context_len=20)
    obss = rand((4, 20, 3), 7)
    actions = jnp.zeros((4, 20), jnp.int32)
    params = net.init(jax.random.key(0), obss, actions)
    attention.set_attention_impl("xla")
    q_xla = net.apply(params, obss, actions)
    try:
        attention.set_attention_impl("pallas")
        q_pal = net.apply(params, obss, actions)
    finally:
        attention.set_attention_impl("xla")
    np.testing.assert_allclose(
        np.asarray(q_xla), np.asarray(q_pal), atol=2e-5
    )
