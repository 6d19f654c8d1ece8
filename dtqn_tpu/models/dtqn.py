"""DTQN: GPT-style causal transformer Q-network with persistent-memory bag.

Capability parity with `/root/reference/dtqn/networks/dtqn.py:15-218`:
  - obs embedding gets ``inner_embed - action_dim`` features; the previous-
    action embedding is right-shifted one step (first step zeroed) and
    concatenated in front (dtqn.py:63-64,184-192)
  - + position encoding, dropout, N stacked transformer layers
  - optional bag cross-attention: working memory queries attend over the
    embedded bag (query=ctx, kv=bag), concatenated then fed to a 2x-wide
    FFN Q head (dtqn.py:134-153,201-214); otherwise a plain FFN head
  - output Q is [batch, seq, num_actions] for every timestep (seq-to-seq)

The fixed-shape JAX version always runs the full ``context_len`` window;
causality guarantees Q at row t only sees rows <= t, so reading row t is
exactly the reference's variable-length truncated forward (dtqn/agents/
dtqn.py:81-107) without dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dtqn_tpu.envs.core import ObsKind
from dtqn_tpu.models.embeddings import ActionEmbedding, make_obs_embedding
from dtqn_tpu.models.init import make_dense
from dtqn_tpu.models.positions import PosKind, PositionEncoding
from dtqn_tpu.models.transformer import MultiHeadAttention, TransformerLayer


class DTQN(nn.Module):
    # Environment interface
    obs_kind: ObsKind
    obs_shape: Tuple[int, ...]
    num_actions: int
    vocab_size: int = 0
    # Architecture
    embed_per_obs_dim: int = 8
    action_dim: int = 0
    inner_embed: int = 128
    num_heads: int = 8
    num_layers: int = 2
    context_len: int = 50
    dropout: float = 0.0
    gate: str = "res"
    identity: bool = False
    pos: str = "learned"
    bag_size: int = 0
    # Masked-bag-attention ablation (round 4): hide mask-padded bag slots
    # from the cross-attention instead of attending over them as the
    # reference does (dtqn.py:201-213).  ``obs_mask_value`` is the env's
    # padding sentinel, used to detect empty slots — detection is only
    # sound when the sentinel is outside the observable range, which
    # ``build_network`` enforces (discrete-observation envs only).
    bag_mask: bool = False
    obs_mask_value: float = 0.0

    @nn.compact
    def __call__(
        self,
        obss: jax.Array,
        actions: Optional[jax.Array] = None,
        bag_obss: Optional[jax.Array] = None,
        bag_actions: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """obss: [B, L, *obs_shape]; actions: [B, L] int; bag_*: [B, bag, ...].

        Returns Q-values [B, L, num_actions].
        """
        seq_len = obss.shape[1]
        if seq_len > self.context_len:
            raise ValueError(
                f"history {seq_len} longer than context {self.context_len}"
            )

        obs_features = self.inner_embed - self.action_dim
        obs_embed = make_obs_embedding(
            features=obs_features,
            obs_kind=self.obs_kind,
            obs_shape=self.obs_shape,
            vocab_size=self.vocab_size,
            embed_per_obs_dim=self.embed_per_obs_dim,
        )
        tokens = obs_embed(obss)

        action_embed = None
        if self.action_dim > 0:
            if actions is None:
                raise ValueError("action_dim > 0 requires actions")
            action_embed = ActionEmbedding(
                self.num_actions, self.action_dim, name="action_embed"
            )
            act_tok = action_embed(actions)
            if seq_len > 1:
                # Right-shift: token t sees action t-1; first step has no
                # previous action (dtqn.py:188-192).
                act_tok = jnp.roll(act_tok, 1, axis=1).at[:, 0, :].set(0.0)
            tokens = jnp.concatenate([act_tok, tokens], axis=-1)

        pos_table = PositionEncoding(
            kind=PosKind(self.pos),
            context_len=self.context_len,
            embed_dim=self.inner_embed,
            name="position",
        )()
        x = tokens + pos_table[:, :seq_len, :]
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        for i in range(self.num_layers):
            x = TransformerLayer(
                features=self.inner_embed,
                num_heads=self.num_heads,
                dropout=self.dropout,
                gate=self.gate,
                identity=self.identity,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)

        if self.bag_size > 0:
            if bag_obss is None:
                raise ValueError("bag_size > 0 requires bag_obss")
            # The bag reuses the SAME obs/action embedders as the context
            # (dtqn.py:201-209 calls self.obs_embedding/self.action_embedding).
            bag_tokens = obs_embed(bag_obss)
            if action_embed is not None:
                bag_tokens = jnp.concatenate(
                    [action_embed(bag_actions), bag_tokens], axis=-1
                )
            # Cross-attention over the (possibly padded) bag.  Reference
            # behavior (bag_mask=False) always attends over the full bag
            # (dtqn.py:201-213); the bag_mask=True ablation hides padded
            # slots (slot invalid when every obs element equals the
            # padding sentinel) and zeroes the persistent features when
            # the bag is empty.
            kv_mask = None
            if self.bag_mask:
                slot_dims = tuple(range(2, bag_obss.ndim))
                pad = jnp.asarray(self.obs_mask_value, bag_obss.dtype)
                kv_mask = ~jnp.all(bag_obss == pad, axis=slot_dims)
            persistent = MultiHeadAttention(
                self.inner_embed,
                self.num_heads,
                self.dropout,
                name="bag_attention",
            )(
                x,
                bag_tokens,
                bag_tokens,
                deterministic=deterministic,
                kv_mask=kv_mask,
            )
            if kv_mask is not None:
                any_valid = jnp.any(kv_mask, axis=-1)
                persistent = jnp.where(
                    any_valid[:, None, None], persistent, 0.0
                )
            head_in = jnp.concatenate([x, persistent], axis=-1)
        else:
            head_in = x

        q = make_dense(self.inner_embed, name="head_hidden")(head_in)
        q = nn.relu(q)
        q = make_dense(self.num_actions, name="head_out")(q)
        return q
