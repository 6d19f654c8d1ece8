"""Attention primitives: XLA reference path + Pallas TPU kernel dispatch.

The reference uses ``nn.MultiheadAttention`` with a precomputed upper-
triangular -inf causal mask (`/root/reference/dtqn/networks/transformer.py:
49-68`) and an unmasked cross-attention over the persistent-memory bag
(`dtqn/networks/dtqn.py:137-147,201-214`).  Here both are explicit einsum
pipelines so the hot path can be swapped for the fused Pallas kernel in
``dtqn_tpu.ops.pallas_attention`` via ``set_attention_impl``.

Shapes use [batch, seq, heads, head_dim] throughout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = "xla"  # "xla" | "pallas"


def set_attention_impl(impl: str) -> None:
    """Select the attention backend globally ("xla" or "pallas")."""
    global _IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown attention impl {impl!r}")
    _IMPL = impl


def get_attention_impl() -> str:
    return _IMPL


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention on [B, L, H, D] tensors.

    ``kv_mask`` [B, Lk] bool hides key/value positions (False = masked) —
    used by the masked-bag-attention ablation (the reference always attends
    over the padded bag, dtqn/networks/dtqn.py:201-213).
    """
    dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dim, q.dtype))
    # [B, H, Lq, Lk]
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
    if causal:
        lq, lk = scores.shape[-2], scores.shape[-1]
        mask = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    if kv_mask is not None:
        scores = jnp.where(
            kv_mask[:, None, None, :], scores, jnp.finfo(scores.dtype).min
        )
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", weights, v)


def attention_probs(
    q: jax.Array,
    k: jax.Array,
    *,
    num_heads: int,
    causal: bool = False,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Softmax attention probabilities [B, H, Lq, Lk] on packed inputs.

    Visualization-only path (the reference's ``self.alpha``,
    `/root/reference/dtqn/networks/transformer.py:64-69`) — always XLA;
    the fused Pallas kernel never materializes the score matrix in HBM.
    """
    b, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    qh = q.reshape(b, lq, num_heads, d)
    kh = k.reshape(b, lk, num_heads, d)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    scores = jnp.einsum("blhd,bmhd->bhlm", qh, kh) * scale
    if causal:
        mask = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    if kv_mask is not None:
        scores = jnp.where(
            kv_mask[:, None, None, :], scores, jnp.finfo(scores.dtype).min
        )
    return jax.nn.softmax(scores, axis=-1)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    causal: bool = False,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head attention core with backend dispatch, packed layout.

    Args:
      q: [B, Lq, E] queries (E = num_heads * head_dim, the QKV Dense
        output layout — no head split/transpose needed around the call).
      k, v: [B, Lk, E] keys/values.
      causal: apply a lower-triangular mask (self-attention over time).
      kv_mask: optional [B, Lk] bool; False hides a key/value position
        (masked-bag-attention ablation). XLA path only.

    Returns [B, Lq, E].
    """
    if _IMPL == "pallas":
        if kv_mask is not None:
            raise NotImplementedError(
                "kv_mask is XLA-only (bag cross-attention never dispatches "
                "to the fused kernel at bag sizes worth fusing)"
            )
        from dtqn_tpu.ops.pallas_attention import pallas_attention_packed

        return pallas_attention_packed(q, k, v, num_heads, causal)
    b, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    out = _xla_attention(
        q.reshape(b, lq, num_heads, d),
        k.reshape(b, lk, num_heads, d),
        v.reshape(b, lk, num_heads, d),
        causal=causal,
        kv_mask=kv_mask,
    )
    return out.reshape(b, lq, e)
