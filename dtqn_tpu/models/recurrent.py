"""DQN / DRQN / ADRQN / DARQN Q-networks.

Parity targets:
  - DQN: obs embed -> 2-layer MLP head (`/root/reference/dtqn/networks/dqn.py:
    8-55`); no sequence semantics (context forced to 1 by the factory,
    utils/agent_utils.py:109-110).
  - DRQN: obs embed -> 1-layer LSTM (hidden = inner_embed) -> MLP head
    (`dtqn/networks/drqn.py:9-66`).  Two modes: stepwise with a supplied
    carry (acting), or batch over full sequences with per-episode lengths —
    the reference's pack/pad_packed dance (drqn.py:52-63) becomes "run the
    scan, zero outputs past the episode length", which matches
    ``pad_packed_sequence``'s zero padding bit-for-bit at the Q head.
  - ADRQN: DRQN + right-shifted previous-action embedding concatenated to
    the obs embedding before the LSTM (`dtqn/networks/adrqn.py:12-95`).
  - DARQN: DRQN + SoftAttention over obs features conditioned on the LSTM
    hidden state, stepped sequentially (`dtqn/networks/darqn.py:9-85`).
    The reference's DARQN act-path signature is incompatible with its own
    agent (darqn.py:59-62 vs agents/drqn.py:103-107); here all recurrent
    nets share one uniform signature and DARQN simply ignores ``actions``.

All recurrent nets return (q_values, carry) with carry = (c, h) each
[batch, inner_embed].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dtqn_tpu.envs.core import ObsKind
from dtqn_tpu.models.embeddings import ActionEmbedding, make_obs_embedding
from dtqn_tpu.models.init import make_dense


def zero_carry(batch_size: int, features: int):
    """Initial LSTM carry, matching the reference's zeros init
    (agents/drqn.py:54-62).  Two distinct arrays — aliasing one buffer for
    (c, h) breaks argument donation ("donate the same buffer twice")."""
    return (
        jnp.zeros((batch_size, features), jnp.float32),
        jnp.zeros((batch_size, features), jnp.float32),
    )


class QHead(nn.Module):
    """Dense -> ReLU -> Dense Q head (dqn.py:47-52)."""

    inner_embed: int
    num_actions: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return make_dense(self.num_actions)(
            nn.relu(make_dense(self.inner_embed)(x))
        )


class LSTM(nn.Module):
    """Single-layer LSTM scanned over the time axis."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, carry) -> Tuple[jax.Array, tuple]:
        # x: [B, L, E]; carry: ((B, E), (B, E))
        scan = nn.scan(
            nn.OptimizedLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, ys = scan(self.features, name="cell")(carry, x)
        return ys, carry


class DQN(nn.Module):
    obs_kind: ObsKind
    obs_shape: Tuple[int, ...]
    num_actions: int
    vocab_size: int = 0
    embed_per_obs_dim: int = 8
    inner_embed: int = 128

    @nn.compact
    def __call__(self, obss: jax.Array, actions=None, **_) -> jax.Array:
        del actions
        x = make_obs_embedding(
            features=self.inner_embed,
            obs_kind=self.obs_kind,
            obs_shape=self.obs_shape,
            vocab_size=self.vocab_size,
            embed_per_obs_dim=self.embed_per_obs_dim,
        )(obss)
        return QHead(self.inner_embed, self.num_actions)(x)


class _RecurrentBase(nn.Module):
    """Shared batch/stepwise plumbing for the LSTM family."""

    obs_kind: ObsKind
    obs_shape: Tuple[int, ...]
    num_actions: int
    vocab_size: int = 0
    embed_per_obs_dim: int = 8
    inner_embed: int = 128
    action_dim: int = 0

    def _tokens(self, obss, actions):
        obs_tok = make_obs_embedding(
            features=self.inner_embed - self.action_dim,
            obs_kind=self.obs_kind,
            obs_shape=self.obs_shape,
            vocab_size=self.vocab_size,
            embed_per_obs_dim=self.embed_per_obs_dim,
        )(obss)
        if self.action_dim > 0:
            act_tok = ActionEmbedding(
                self.num_actions, self.action_dim, name="action_embed"
            )(actions)
            if obss.shape[1] > 1:
                # Right-shift previous actions (adrqn.py:73-76).
                act_tok = jnp.roll(act_tok, 1, axis=1).at[:, 0, :].set(0.0)
            obs_tok = jnp.concatenate([act_tok, obs_tok], axis=-1)
        return obs_tok

    def _mask_padded(self, ys, episode_lengths, seq_len):
        if episode_lengths is None:
            return ys
        # pad_packed_sequence zero-pads beyond each episode's length
        # (drqn.py:58-63); replicate before the Q head.
        t = jnp.arange(seq_len)[None, :, None]
        valid = t < episode_lengths.reshape(-1, 1, 1)
        return jnp.where(valid, ys, 0.0)


class DRQN(_RecurrentBase):
    @nn.compact
    def __call__(
        self,
        obss: jax.Array,
        actions: Optional[jax.Array] = None,
        carry=None,
        episode_lengths: Optional[jax.Array] = None,
        **_,
    ):
        tokens = self._tokens(obss, actions)
        if carry is None:
            carry = zero_carry(obss.shape[0], self.inner_embed)
        ys, carry = LSTM(self.inner_embed, name="lstm")(tokens, carry)
        ys = self._mask_padded(ys, episode_lengths, obss.shape[1])
        return QHead(self.inner_embed, self.num_actions)(ys), carry


class ADRQN(DRQN):
    """DRQN + previous-action conditioning; set action_dim > 0."""


class SoftAttention(nn.Module):
    """g(v, h) = softmax(Linear(tanh(Linear(v) + W h))) (darqn.py:9-24)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        # x: [B, E]; h: [B, E]
        y = make_dense(self.features, use_bias=False, name="W")(h)
        z = nn.tanh(make_dense(self.features, name="linear")(x) + y)
        z = make_dense(self.features, name="linear2")(z)
        return nn.softmax(z, axis=-1)


class _DARQNCore(nn.Module):
    """One attend-then-LSTM step; scanned over time (darqn.py:72-83)."""

    features: int

    @nn.compact
    def __call__(self, carry, x_t):
        _, h = carry  # flax LSTM carry is (c, h); attention sees h
        attn = SoftAttention(self.features, name="attention")(x_t, h)
        carry, y = nn.OptimizedLSTMCell(self.features, name="cell")(carry, attn)
        return carry, y


class DARQN(_RecurrentBase):
    @nn.compact
    def __call__(
        self,
        obss: jax.Array,
        actions: Optional[jax.Array] = None,
        carry=None,
        episode_lengths: Optional[jax.Array] = None,
        **_,
    ):
        del actions  # DARQN does not condition on actions (darqn.py:59-85)
        tokens = self._tokens(obss, None)
        if carry is None:
            carry = zero_carry(obss.shape[0], self.inner_embed)

        # Sequential attend->step over time: the attention weights are a
        # function of the previous hidden state, so this is a true scan.
        scan = nn.scan(
            _DARQNCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, ys = scan(self.inner_embed, name="core")(carry, tokens)
        ys = self._mask_padded(ys, episode_lengths, obss.shape[1])
        return QHead(self.inner_embed, self.num_actions)(ys), carry
