"""Observation / action embedders.

Capability parity with `/root/reference/dtqn/networks/representations.py`:
  - discrete obs: token Embed(vocab, embed_per_obs_dim) -> flatten -> Dense
    (representations.py:26-52)
  - continuous obs: single Dense (representations.py:64-75)
  - image obs: 5-layer CNN 64-64-64-128-128, kernel 3, strides 2-1-2-1-2,
    padding 1, ReLU, flatten, Dense (representations.py:77-130)
  - actions: Embed(num_actions, action_dim) (representations.py:146-155)

All modules operate on a leading [batch, seq] prefix without materializing a
flatten/unflatten round-trip (the reference flattens batch*seq at
representations.py:17-23; XLA fuses this away so we keep natural shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dtqn_tpu.models.init import compute_dtype, embed_init, make_dense


class DiscreteObsEmbedding(nn.Module):
    """Per-dimension token embedding for (Multi)Discrete observations."""

    vocab_size: int
    obs_dim: int
    embed_per_obs_dim: int
    features: int

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        # obs: [..., obs_dim] int tokens (mask token == vocab_size - 1).
        tok = nn.Embed(
            self.vocab_size,
            self.embed_per_obs_dim,
            embedding_init=embed_init(),
            dtype=compute_dtype(),
            param_dtype=jnp.float32,
        )(obs)
        flat = tok.reshape(*obs.shape[:-1], self.obs_dim * self.embed_per_obs_dim)
        return make_dense(self.features)(flat)


class ContinuousObsEmbedding(nn.Module):
    """Linear projection for Box observations (representations.py:64-75)."""

    features: int

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        return make_dense(self.features)(obs.astype(jnp.float32))


class ImageObsEmbedding(nn.Module):
    """5-layer CNN for [C, H, W] uint8 images (representations.py:77-130).

    Input layout is the reference's CHW (with a [batch, seq] prefix); convs
    run in NHWC, the TPU-native layout.
    """

    obs_shape: Tuple[int, int, int]  # (C, H, W)
    features: int

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        prefix = obs.shape[: -len(self.obs_shape)]
        c, h, w = self.obs_shape
        x = obs.reshape((-1, c, h, w)).astype(jnp.float32)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        for out_ch, stride in zip((64, 64, 64, 128, 128), (2, 1, 2, 1, 2)):
            x = nn.Conv(
                out_ch,
                kernel_size=(3, 3),
                strides=(stride, stride),
                padding=1,
                kernel_init=embed_init(),
                dtype=compute_dtype(),
                param_dtype=jnp.float32,
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = make_dense(self.features)(x)
        return x.reshape(*prefix, self.features)


class ActionEmbedding(nn.Module):
    """Embed(num_actions, action_dim) (representations.py:146-155)."""

    num_actions: int
    action_dim: int

    @nn.compact
    def __call__(self, actions: jax.Array) -> jax.Array:
        # actions: [...] int -> [..., action_dim]
        return nn.Embed(
            self.num_actions,
            self.action_dim,
            embedding_init=embed_init(),
            dtype=compute_dtype(),
            param_dtype=jnp.float32,
        )(actions)


def make_obs_embedding(
    *,
    features: int,
    obs_kind,
    obs_shape: Sequence[int],
    vocab_size: int = 0,
    embed_per_obs_dim: int = 8,
) -> nn.Module:
    """Factory mirroring the reference's obs-embedder selection
    (dtqn/networks/dtqn.py:71-94)."""
    from dtqn_tpu.envs.core import ObsKind

    if obs_kind == ObsKind.IMAGE:
        return ImageObsEmbedding(obs_shape=tuple(obs_shape), features=features)
    if obs_kind == ObsKind.DISCRETE:
        return DiscreteObsEmbedding(
            vocab_size=vocab_size,
            obs_dim=int(obs_shape[0]),
            embed_per_obs_dim=embed_per_obs_dim,
            features=features,
        )
    return ContinuousObsEmbedding(features=features)
