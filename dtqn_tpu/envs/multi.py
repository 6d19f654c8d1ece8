"""Multi-domain environment: sample a domain per episode.

The reference accepts several ``--envs`` and draws a fresh env for every
episode reset (`/root/reference/run.py:287,295`), requiring identical
observation/action spaces across domains (run.py:47 help text).  The
vectorized analog: a wrapper whose state carries a per-instance domain
index; resets draw a new domain, and stepping dispatches through
``lax.switch``.  All member envs must share obs metadata AND state pytree
structure (for Gridverse, build members with a common ``pad_to``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dtqn_tpu.envs.core import Environment, ObsKind


@struct.dataclass
class MultiDomainState:
    domain: jax.Array  # i32 active domain index
    inner: object  # member env state (shared structure)

    @property
    def t(self):
        return self.inner.t


class MultiDomainEnv(Environment):
    """Per-episode domain sampling over structurally identical envs."""

    def __init__(self, envs: Sequence[Environment]):
        if not envs:
            raise ValueError("need at least one env")
        first = envs[0]
        for e in envs[1:]:
            if (
                tuple(e.obs_shape) != tuple(first.obs_shape)
                or e.num_actions != first.num_actions
                or e.obs_kind != first.obs_kind
                or e.obs_mask != first.obs_mask
            ):
                raise ValueError(
                    "multi-domain envs must share observation/action spaces "
                    f"({e.name} differs from {first.name})"
                )
        self.envs: List[Environment] = list(envs)
        self.name = "+".join(e.name for e in envs)
        self.num_actions = first.num_actions
        self.obs_kind = first.obs_kind
        self.obs_shape = tuple(first.obs_shape)
        self.obs_dtype = first.obs_dtype
        # One shared time limit: the max, mirroring TimeLimit-per-env as
        # closely as a shared state structure allows.
        self.max_episode_steps = max(e.max_episode_steps for e in envs)
        self._obs_mask = first.obs_mask

    @property
    def obs_mask(self) -> float:
        return self._obs_mask

    def reset_env(self, key: jax.Array):
        k_domain, k_reset = jax.random.split(key)
        domain = jax.random.randint(
            k_domain, (), 0, len(self.envs), jnp.int32
        )
        obs, inner = jax.lax.switch(
            domain, [e.reset_env for e in self.envs], k_reset
        )
        return obs, MultiDomainState(domain=domain, inner=inner)

    def step_env(
        self, key: jax.Array, state: MultiDomainState, action: jax.Array
    ):
        def branch(env):
            def fn(operand):
                k, inner, a = operand
                return env.step_env(k, inner, a)

            return fn

        obs, inner, reward, terminated, info = jax.lax.switch(
            state.domain,
            [branch(e) for e in self.envs],
            (key, state.inner, action),
        )
        return (
            obs,
            MultiDomainState(domain=state.domain, inner=inner),
            reward,
            terminated,
            info,
        )
