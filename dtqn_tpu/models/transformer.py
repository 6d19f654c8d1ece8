"""Transformer blocks for DTQN.

Parity with `/root/reference/dtqn/networks/transformer.py`:
  - ``TransformerLayer`` (post-LN): MHA with causal mask -> **ReLU on the
    attention output** (transformer.py:72, a deliberate reference quirk) ->
    gate -> LayerNorm -> 4x ReLU FFN -> ReLU -> gate -> LayerNorm.
  - ``identity=True`` switches to the GTrXL identity-map reordering (pre-LN,
    no LN after the gates) (transformer.py:81-101).

The attention core dispatches to XLA or the fused Pallas TPU kernel via
``dtqn_tpu.ops.attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dtqn_tpu.models.gates import make_gate
from dtqn_tpu.models.init import make_dense
from dtqn_tpu.ops.attention import attention_probs, dot_product_attention


class MultiHeadAttention(nn.Module):
    """Projections + attention core (replaces nn.MultiheadAttention)."""

    features: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        q_in: jax.Array,
        k_in: jax.Array,
        v_in: jax.Array,
        *,
        causal: bool = False,
        deterministic: bool = True,
        kv_mask: jax.Array = None,
    ) -> jax.Array:
        """``kv_mask`` [B, Lk] bool hides key/value positions (False =
        masked) — the masked-bag-attention ablation."""
        if self.features % self.num_heads:
            raise ValueError("features must divide num_heads")

        # Packed layout: attention consumes the Dense outputs directly
        # ([B, L, H*D]); head slicing happens inside the attention backend.
        # Self-attention (q_in is k_in is v_in, detected statically at
        # trace time) fuses the three projections into ONE [F, 3F] matmul:
        # the train step is latency-bound on its sequential op chain at DTQN
        # shapes, and a fused kernel is mathematically identical to three
        # separate ones (concatenated columns, same N(0, 0.02) init).
        if q_in is k_in and k_in is v_in:
            qkv = make_dense(3 * self.features, name="qkv")(q_in)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = make_dense(self.features, name="query")(q_in)
            k = make_dense(self.features, name="key")(k_in)
            v = make_dense(self.features, name="value")(v_in)
        if self.dropout > 0.0 and not deterministic:
            # Parity: torch's nn.MultiheadAttention applies dropout to the
            # softmax attention PROBABILITIES (transformer.py:30-36), not to
            # the output.  This stochastic path materializes the probs; the
            # deterministic (acting/target/dropout=0) path below never does.
            b, lq, e = q.shape
            lk, d = k.shape[1], q.shape[-1] // self.num_heads
            probs = attention_probs(
                q, k, num_heads=self.num_heads, causal=causal,
                kv_mask=kv_mask,
            )
            probs = nn.Dropout(self.dropout)(probs, deterministic=False)
            out = jnp.einsum(
                "bhlm,bmhd->blhd", probs, v.reshape(b, lk, self.num_heads, d)
            ).reshape(b, lq, e)
        else:
            out = dot_product_attention(
                q, k, v, num_heads=self.num_heads, causal=causal,
                kv_mask=kv_mask,
            )
        if self.is_mutable_collection("intermediates"):
            # Head-averaged attention weights for visualization — the
            # reference's self.alpha (transformer.py:46,64-69,
            # average_attn_weights=True).  Only computed when the caller
            # requests mutable=["intermediates"]; costs nothing otherwise.
            self.sow(
                "intermediates",
                "attention_weights",
                attention_probs(
                    q, k, num_heads=self.num_heads, causal=causal,
                    kv_mask=kv_mask,
                ).mean(axis=1),
            )
        return make_dense(self.features, name="out")(out)


class FeedForward(nn.Module):
    """4x-wide ReLU MLP (transformer.py:37-42)."""

    features: int
    widening: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = make_dense(self.widening * self.features)(x)
        x = nn.relu(x)
        x = make_dense(self.features)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class TransformerLayer(nn.Module):
    features: int
    num_heads: int
    dropout: float = 0.0
    gate: str = "res"
    identity: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        attn = MultiHeadAttention(
            self.features, self.num_heads, self.dropout, name="attention"
        )
        ffn = FeedForward(self.features, dropout=self.dropout, name="ffn")
        attn_gate = make_gate(self.gate, self.features)
        mlp_gate = make_gate(self.gate, self.features)
        ln1 = nn.LayerNorm(name="layernorm1")
        ln2 = nn.LayerNorm(name="layernorm2")

        if self.identity:
            # GTrXL identity-map reordering (transformer.py:86-101).
            x_norm = ln1(x)
            att = attn(
                x_norm, x_norm, x_norm, causal=True, deterministic=deterministic
            )
            x = attn_gate(x, nn.relu(att))
            y = ffn(ln2(x), deterministic=deterministic)
            return mlp_gate(x, nn.relu(y))

        # Post-LN ordering (transformer.py:63-78).
        att = attn(x, x, x, causal=True, deterministic=deterministic)
        x = ln1(attn_gate(x, nn.relu(att)))
        y = ffn(x, deterministic=deterministic)
        return ln2(mlp_gate(x, nn.relu(y)))
